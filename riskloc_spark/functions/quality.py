"""Corpus-quality heuristics from the published LLM-pipeline literature —
Gopher repetition statistics and quality rules (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
App. A), C4 line-level cleaning (Raffel et al. 2020, §2.2), PII redaction,
and per-group tf-idf term scoring.

Scale design: every PER-DOCUMENT statistic here is a pure column
PROJECTION — the stats of one document never depend on another document,
so there is no groupBy, no explode, no shuffle, and no Python in the hot
path. Line/n-gram multiplicity is computed inside the row with
``array_sort`` + ``F.aggregate`` sorted-run folds (O(T log T) per doc,
JVM-side). At 100 TB these operators cost exactly one pass over the
corpus with zero exchange.

Evaluation-cost note (measured): higher-order array functions are not
whole-stage-codegen'd, so Catalyst applies no common-subexpression
elimination across output columns — a single projection that names nine
statistics re-tokenizes the document nine times (13.6s for 500 docs).
Every operator here therefore STAGES its projections: the token / line /
n-gram arrays are materialized once as named intermediate columns, and
the statistics reference those columns. CollapseProject keeps the stages
separate precisely because the intermediates are non-cheap and
multiply-referenced (0.83s for the same 500 docs, 16x; the plan test pins
one split per array). Still zero shuffles — stacked Project nodes, not
exchanges.

No reference counterpart (the reference engine is tabular-only); these
are pipeline extensions. Each operator has an exact ANSI-SQL twin in
``__spark_entry__.py`` (the twins are free to use unnest + GROUP BY —
only the VALUES must match), so the within-row folds are hash-verified
against an independent relational evaluation every round.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.text import WS_CLASS

# a line survives iff it contains a non-whitespace char (same class the
# paragraph splitter uses — explicit, because Java and RE2 disagree on \s)
_NON_BLANK = r"[^ \t\n\x0B\f\r]"

# Gopher's required-stopword list (App. A1.1): a document must contain at
# least two of these to pass the "stop word" rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def nonblank_lines(text: Column) -> Column:
    """Trimmed non-blank lines of a document as an array column.

    ``F.trim`` strips ASCII spaces only — identical to DuckDB's default
    ``trim`` — so the twin can reuse the key verbatim.
    """
    return F.transform(
        F.filter(F.split(text, "\n"), lambda l: l.rlike(_NON_BLANK)),
        lambda l: F.trim(l),
    )


def words(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (handles leading /
    trailing separators and all-whitespace documents uniformly)."""
    return F.filter(
        F.split(F.lower(text), WS_CLASS + "+"), lambda t: t != ""
    )


def word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty when the
    document has fewer than n tokens)."""
    if n == 1:
        return tokens
    return F.when(
        F.size(tokens) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
        )
    )


def sum_lengths(arr: Column) -> Column:
    """Total character count of an array of strings (JVM-side fold)."""
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def _dup_extra_chars(sorted_arr: Column) -> Column:
    """Characters in every occurrence BEYOND the first of each distinct
    value — the (count-1)-weighted duplicate mass. One sorted-run fold:
    equal values are adjacent after array_sort, so each repeat adds its
    length when it equals the previous element."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("extra"),
    )
    return F.aggregate(
        sorted_arr,
        init,
        lambda a, x: F.struct(
            x.alias("prev"),
            (
                a["extra"]
                + F.when(x == a["prev"], F.length(x)).otherwise(F.lit(0))
            ).alias("extra"),
        ),
        lambda a: a["extra"],
    )


def _dup_all_chars(sorted_arr: Column) -> Column:
    """Characters in ALL occurrences of values appearing more than once
    (the Gopher duplicate-line-character numerator). Sorted-run fold:
    when a run reaches its second element, both the first and second
    occurrence join the duplicate mass; later elements add one each."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def merge(a: Column, x: Column) -> Column:
        same = x == a["prev"]
        add = (
            F.when(same & (a["run"] == 1), F.length(x) * 2)
            .when(same, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (a["dup"] + add).alias("dup"),
        )

    return F.aggregate(sorted_arr, init, merge, lambda a: a["dup"])


def _top_run(sorted_arr: Column) -> Column:
    """struct(cnt int, item string): the highest occurrence count in the
    array and the value achieving it. Ties resolve to the
    lexicographically SMALLEST value: the fold keeps the first maximal
    run of the ascending-sorted array (strict ``>``), which the SQL twin
    reproduces with ORDER BY cnt DESC, gram ASC LIMIT 1."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
        F.lit(None).cast("string").alias("item"),
    )

    def merge(a: Column, x: Column) -> Column:
        run2 = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        better = run2 > a["best"]
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(a["best"]).alias("best"),
            F.when(better, x).otherwise(a["item"]).alias("item"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        merge,
        lambda a: F.struct(a["best"].alias("cnt"), a["item"].alias("item")),
    )


def _chained_gram(prev: Column, toks: Column, n: int) -> Column:
    """``G_n[i] = G_{n-1}[i] + ' ' + T[i+n-1]`` — build the n-gram array
    from the (n-1)-gram array with one ``zip_with`` concat per element.
    Measured 3x cheaper than the direct slice+array_join build (the
    per-element machinery, not the char copying, dominates interpreted
    higher-order functions); bit-identical output."""
    L = F.size(toks)
    return F.when(L < n, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(prev, 1, L - n + 1),
            F.slice(toks, n, L - n + 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )


def _staged_repetition(
    df: DataFrame,
    text_col: str,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
    gopher: bool = False,
) -> DataFrame:
    """Append the repetition statistics (plus, for the Gopher filter,
    the word-level statistics) to ``df`` through staged projections:
    (1) line/token arrays, (2) one chained-gram stage per n up to
    max(ns), (3) scalar folds, (4) the ratio columns. Each expensive
    array is named once and referenced by column, which is what keeps
    the whole thing one-pass (see the module docstring's
    evaluation-cost note)."""
    text = F.col(text_col)
    ns = sorted(set(top_ns) | set(dup_ns))
    s1 = df.select(
        "*", nonblank_lines(text).alias("__L"), words(text).alias("__T")
    )
    s2 = s1
    for n in range(2, max(ns) + 1 if ns else 2):
        prev = F.col("__T") if n == 2 else F.col(f"__G{n - 1}")
        s2 = s2.select(
            "*", _chained_gram(prev, F.col("__T"), n).alias(f"__G{n}")
        )

    def gram_col(n: int) -> Column:
        return F.col("__T") if n == 1 else F.col(f"__G{n}")

    L, T = F.col("__L"), F.col("__T")
    scalars = [
        F.size(L).alias("__nl"),
        F.size(F.array_distinct(L)).alias("__ndl"),
        sum_lengths(L).alias("__lchars"),
        _dup_all_chars(F.array_sort(L)).alias("__ldup"),
        F.size(T).alias("__nw"),
        F.length(F.array_join(T, " ")).alias("__norm"),
    ]
    if gopher:
        scalars += [
            sum_lengths(T).alias("__tchars"),
            F.size(
                F.filter(L, lambda l: l.endswith("...") | l.endswith("…"))
            ).alias("__ell"),
            F.size(F.filter(T, lambda w: w.rlike("[a-zA-Z]"))).alias(
                "__alpha"
            ),
            F.size(
                F.filter(
                    F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                    lambda s: F.array_contains(T, s),
                )
            ).alias("__stop"),
        ]
    for n in top_ns:
        scalars.append(
            _top_run(F.array_sort(gram_col(n))).alias(f"__top{n}")
        )
    for n in dup_ns:
        scalars.append(
            _dup_extra_chars(F.array_sort(gram_col(n))).alias(f"__ex{n}")
        )
    s3 = s2.select(*df.columns, *scalars)
    nl, nw, norm = F.col("__nl"), F.col("__nw"), F.col("__norm")
    stats = [
        nl.alias("n_lines"),
        nw.alias("n_words"),
        F.when(nl == 0, F.lit(0.0))
        .otherwise((nl - F.col("__ndl")).cast("double") / nl)
        .alias("dup_line_frac"),
        F.when(F.col("__lchars") == 0, F.lit(0.0))
        .otherwise(F.col("__ldup").cast("double") / F.col("__lchars"))
        .alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        tr = F.col(f"__top{n}")
        stats.append(
            F.when((norm == 0) | tr["item"].isNull(), F.lit(0.0))
            .otherwise(
                (tr["cnt"] * F.length(tr["item"])).cast("double") / norm
            )
            .alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ns:
        stats.append(
            F.when(norm == 0, F.lit(0.0))
            .otherwise(F.col(f"__ex{n}").cast("double") / norm)
            .alias(f"dup_{n}gram_char_frac")
        )
    if gopher:
        stats += [
            F.when(nw == 0, F.lit(0.0))
            .otherwise(F.col("__tchars").cast("double") / nw)
            .alias("mean_word_len"),
            F.when(nl == 0, F.lit(0.0))
            .otherwise(F.col("__ell").cast("double") / nl)
            .alias("ellipsis_line_frac"),
            F.when(nw == 0, F.lit(0.0))
            .otherwise(F.col("__alpha").cast("double") / nw)
            .alias("alpha_word_frac"),
            F.col("__stop").alias("stopword_hits"),
        ]
    return s3.select(*df.columns, *stats)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document Gopher repetition statistics (Rae et al. 2021 App. A)
    as a zero-shuffle staged projection:

    - ``n_lines`` / ``n_words``: non-blank trimmed lines; lowercased
      whitespace tokens.
    - ``dup_line_frac``: fraction of lines that are repeats of an
      earlier-seen line value ((L - distinct) / L).
    - ``dup_line_char_frac``: fraction of line characters inside lines
      whose value occurs more than once (all occurrences count — the
      Gopher definition).
    - ``top_{n}gram_char_frac``: characters covered by the most frequent
      word n-gram (count x its char length) over the joined-token char
      count; ties take the lexicographically smallest gram.
    - ``dup_{n}gram_char_frac``: (count-1)-weighted character mass of
      repeated n-grams over the joined-token char count. Gopher marks
      characters (overlapping repeats count once); the weighted form is
      an upper bound that keeps the statistic a shuffle-free fold — at
      the default thresholds both reject the same pathological repeaters.
    """
    base = df.select(id_col, text_col)
    return _staged_repetition(base, text_col, top_ns, dup_ns).drop(text_col)


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    top_ngram_limits: tuple[tuple[int, float], ...] = (
        (2, 0.20),
        (3, 0.18),
        (4, 0.16),
    ),
    dup_ngram_limits: tuple[tuple[int, float], ...] = (
        (5, 0.15),
        (6, 0.14),
        (7, 0.13),
        (8, 0.12),
        (9, 0.11),
        (10, 0.10),
    ),
) -> DataFrame:
    """The Gopher document-quality filter (Rae et al. 2021 App. A1):
    length / mean-word-length bands, ellipsis-line and alphabetic-word
    fractions, the required-stopword rule, and the repetition thresholds
    — all defaults are the paper's values.

    Returns every input column plus the statistics, ``reason`` (the FIRST
    failing rule in the documented order, null when none fail) and
    ``kept`` (reason is null). Staged projections, zero shuffles; filter
    on ``kept`` for the curation form.

    Rule order: n_words_low, n_words_high, mean_word_len_low,
    mean_word_len_high, ellipsis_lines, alpha_words, stopwords,
    dup_line_frac, dup_line_char_frac, top_{n}gram..., dup_{n}gram...
    """
    top_ns = tuple(n for n, _ in top_ngram_limits)
    dup_ns = tuple(n for n, _ in dup_ngram_limits)
    stats = _staged_repetition(df, text_col, top_ns, dup_ns, gopher=True)
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("n_words_low"))
        .when(F.col("n_words") > max_words, F.lit("n_words_high"))
        .when(F.col("mean_word_len") < min_mean_word_len, F.lit("mean_word_len_low"))
        .when(F.col("mean_word_len") > max_mean_word_len, F.lit("mean_word_len_high"))
        .when(
            F.col("ellipsis_line_frac") > max_ellipsis_line_frac,
            F.lit("ellipsis_lines"),
        )
        .when(F.col("alpha_word_frac") < min_alpha_word_frac, F.lit("alpha_words"))
        .when(F.col("stopword_hits") < min_stopword_hits, F.lit("stopwords"))
        .when(F.col("dup_line_frac") > max_dup_line_frac, F.lit("dup_line_frac"))
        .when(
            F.col("dup_line_char_frac") > max_dup_line_char_frac,
            F.lit("dup_line_char_frac"),
        )
    )
    for n, lim in top_ngram_limits:
        reason = reason.when(
            F.col(f"top_{n}gram_char_frac") > lim, F.lit(f"top_{n}gram")
        )
    for n, lim in dup_ngram_limits:
        reason = reason.when(
            F.col(f"dup_{n}gram_char_frac") > lim, F.lit(f"dup_{n}gram")
        )
    return stats.select(
        "*",
        reason.alias("reason"),
        reason.isNull().alias("kept"),
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

# terminal punctuation a retained line must end with (C4's rule) —
# explicit class, identical under Java and RE2
_TERMINAL_RE = "[.!?\"']$"


def c4_line_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_line_words: int = 3,
    min_kept_lines: int = 1,
    banned_line_words: tuple[str, ...] = ("javascript",),
    banned_page_phrases: tuple[str, ...] = ("lorem ipsum",),
    drop_brace_pages: bool = True,
) -> DataFrame:
    """C4's cleaning rules as an audit projection: per page, the cleaned
    text (lines kept iff they end in terminal punctuation, have at least
    ``min_line_words`` words, and contain none of ``banned_line_words``
    as a token) plus ``n_lines`` / ``n_kept_lines`` / ``page_kept``
    (pages drop when a banned phrase appears, when ``{`` appears, or
    when fewer than ``min_kept_lines`` lines survive — C4 uses 5
    sentences; lines stand in for sentences here).

    Zero shuffles; the kept-line array is staged as a named column so
    the three statistics that read it evaluate the line filter once.
    """
    text = F.col(text_col)

    def keep_line(l: Column) -> Column:
        t = F.trim(l)
        lw = F.filter(F.split(F.lower(t), WS_CLASS + "+"), lambda w: w != "")
        cond = (
            (t != "")
            & t.rlike(_TERMINAL_RE)
            & (F.size(lw) >= min_line_words)
        )
        for w in banned_line_words:
            cond = cond & ~F.exists(lw, lambda x: x == F.lit(w))
        return cond

    page_ok = F.size(F.col("__kept")) >= min_kept_lines
    for p in banned_page_phrases:
        page_ok = page_ok & ~F.lower(text).contains(p)
    if drop_brace_pages:
        page_ok = page_ok & ~text.contains("{")
    staged = df.select(
        F.col(id_col),
        text,
        F.filter(F.split(text, "\n"), keep_line).alias("__kept"),
    )
    return staged.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(text, "\n"), lambda l: l.rlike(_NON_BLANK))
        ).alias("n_lines"),
        F.size(F.col("__kept")).alias("n_kept_lines"),
        page_ok.alias("page_kept"),
        F.array_join(
            F.transform(F.col("__kept"), lambda l: F.trim(l)), "\n"
        ).alias("clean_text"),
    )


def c4_clean(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **kw) -> DataFrame:
    """The curation form of ``c4_line_audit``: surviving pages only,
    with the cleaned text under the original column name."""
    audit = c4_line_audit(df, text_col, id_col, **kw)
    return audit.filter(F.col("page_kept")).select(
        F.col(id_col), F.col("clean_text").alias(text_col)
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Lookaround-free, alternation-free patterns: Java (Spark) is
# leftmost-first backtracking and RE2 (DuckDB) is leftmost-longest — with
# greedy quantifiers and no alternation the two agree, so the oracle can
# run the SAME pattern strings. The gate hash-verifies that agreement.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
IPV4_RE = r"[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PHONE_RE = r"[0-9]{3}[-][0-9]{3}[-][0-9]{4}"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and dashed phone numbers, in that
    order, each counted on the text as it stood BEFORE its own pass (so
    an address inside an already-redacted email is not double-counted).
    Pure projection — zero shuffles, no Python. Each pass's output is a
    staged named column, so no regexp_replace runs more than once per
    document even though counts and the next pass both read it.

    Returns (id, text with <EMAIL>/<IP>/<PHONE> tokens, n_emails, n_ips,
    n_phones). Real pipelines extend the pattern set (SSNs, IBANs,
    secrets) the same way: counts first, then the chained replace.
    """
    text = F.col(text_col)
    s1 = df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>").alias("__t1"),
    )
    s2 = s1.select(
        F.col(id_col),
        "n_emails",
        F.size(F.regexp_extract_all(F.col("__t1"), F.lit(IPV4_RE), F.lit(0)))
        .cast("int")
        .alias("n_ips"),
        F.regexp_replace(F.col("__t1"), IPV4_RE, "<IP>").alias("__t2"),
    )
    return s2.select(
        F.col(id_col),
        F.regexp_replace(F.col("__t2"), PHONE_RE, "<PHONE>").alias(text_col),
        "n_emails",
        "n_ips",
        F.size(F.regexp_extract_all(F.col("__t2"), F.lit(PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# tf-idf term scoring (corpus-relative — the one operator here that shuffles)
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 10,
) -> DataFrame:
    """Top-k characteristic terms per group by smoothed tf-idf
    (sklearn's formula: idf = ln((1 + N) / (1 + df)) + 1 over groups as
    "documents"): the corpus-profiling operator (what vocabulary
    distinguishes each source / shard / domain).

    Shuffle budget: the corpus-sized work is ONE explode + groupBy
    (map-side combinable — token counts partial-aggregate before the
    exchange). Everything downstream (document frequency, the idf join,
    the per-group top-k window) runs on the vocabulary-sized tf frame,
    and the group count joins as a broadcast single row. Ranks
    tie-break deterministically by (score desc, term asc).
    """
    terms = df.select(
        F.col(group_col), F.explode(words(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_groups"))
    ng = df.select(group_col).distinct().agg(
        F.count(F.lit(1)).alias("n_groups")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ng))
        .withColumn(
            "idf",
            F.log((1 + F.col("n_groups")) / (1 + F.col("df_groups"))) + 1,
        )
        .withColumn("score", F.col("tf") * F.col("idf"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", "term", "tf", "df_groups", "score")
    )


# ---------------------------------------------------------------------------
# corpus datasheet (per-group profile with exact quantiles)
# ---------------------------------------------------------------------------


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group corpus datasheet: document count, token totals, mean,
    max, and EXACT token-count quantiles — the "datasheet for datasets"
    numbers a curation run reports per source / shard / dump.

    Quantiles are exact by construction, not sketched: token counts are
    small integers, so the corpus collapses to a per-(group, n_tokens)
    HISTOGRAM first (one groupBy, map-side combinable, output bounded by
    distinct lengths — thousands of rows regardless of corpus size), and
    quantile q is read off the histogram's cumulative counts as the
    smallest length whose running count reaches ceil(q * n_docs)
    (type-1 / inverse-CDF). Everything after the first aggregation is
    histogram-sized; ``approx_percentile`` would be cheaper by a
    constant but is sketch-order dependent and engine-specific, which
    would make the result unverifiable — and at a histogram this small,
    exactness is free.
    """
    from riskloc_spark.functions.text import token_count

    hist = (
        df.select(
            F.col(group_col),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .groupBy(group_col, "n_tokens")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy(group_col).agg(
        F.sum("c").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long") * F.col("c")).alias(
            "total_tokens"
        ),
    )
    j = cum.join(tot, group_col)
    aggs = [
        F.first("n_docs").alias("n_docs"),
        F.first("total_tokens").alias("total_tokens"),
        (F.first("total_tokens").cast("double") / F.first("n_docs")).alias(
            "mean_tokens"
        ),
        F.max("n_tokens").alias("max_tokens"),
    ]
    for q in quantiles:
        tag = f"p{round(q * 100)}"
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("n_docs")),
                    F.col("n_tokens"),
                )
            ).alias(f"{tag}_tokens")
        )
    return j.groupBy(group_col).agg(*aggs)


# ---------------------------------------------------------------------------
# web-corpus URL operators
# ---------------------------------------------------------------------------

# whitespace-delimited URL; explicit classes keep Java and RE2 identical.
# Deliberately greedy-simple (trailing punctuation sticks to the URL, as
# in most web-corpus pipelines) — deterministic in both engines.
URL_RE = r"https?://[^ \t\n\x0B\f\r]+"
_DOMAIN_RE = r"https?://([^/ \t\n\x0B\f\r]+)"


def extract_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per URL occurrence: (id, url, domain) with the domain
    lowercased — the exploded form the domain-level curation ops
    (blocklists, per-domain caps, domain mixing weights) consume.
    A projection + explode; no shuffle."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0))).alias(
            "url"
        ),
    ).select(
        F.col(id_col),
        "url",
        F.lower(F.regexp_extract(F.col("url"), _DOMAIN_RE, 1)).alias(
            "domain"
        ),
    )


def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus profile: URL occurrences and distinct documents
    — the table a per-domain cap or blocklist review reads. One
    map-side-combinable aggregation over the exploded URLs."""
    u = extract_urls(df, text_col, id_col)
    return u.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents containing a URL on a blocked domain — the
    C4/CommonCrawl blocklist rule. Zero shuffles: the URL scan and the
    domain test run inside the row; the blocklist is a literal array
    (swap in a broadcast join for blocklists beyond a few thousand
    entries)."""
    text = F.col(text_col)
    urls = F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0))
    hit = F.exists(
        urls,
        lambda u: F.lower(F.regexp_extract(u, _DOMAIN_RE, 1)).isin(
            list(blocked)
        ),
    )
    return df.filter(~hit)


# tracking parameters stripped by canonicalize_url: the C4/crawl-dedup
# convention (utm_* family + the big click-id params).  The replacement
# rules below are Java-regex-side only (the gate's oracle builds the
# expected canonical CLOSED-FORM, never replaying these), so $1-style
# group references are safe here — same carve-out as html._INVISIBLE.
_TRACKING_PARAM = r"(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-level dedup: fragment removed,
    scheme and host lowercased, default ports stripped (:80 for http,
    :443 for https — the anchored regexes only match their scheme, so
    no conditional wrapper is needed), tracking query parameters
    removed (with separator tidy-up), a dangling '?' and a bare
    trailing slash dropped.

    SINGLE-EXPRESSION form — tests and small frames only.  The
    when/otherwise stages reference their input several times and CASE
    branches get no common-subexpression elimination, so the nested
    regex chain multiplies out (~8s for 5k rows when the r10 gate ran
    it inline).  Corpus-volume paths use ``canonicalize_urls`` (the
    df-staged twin; equality is test-pinned)."""
    u = F.regexp_replace(url, r"#.*$", "")
    pre = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    u = F.when(pre == "", u).otherwise(
        F.concat(F.lower(pre), F.substring(u, F.length(pre) + 1, F.length(u)))
    )
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80(/|\?|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443(/|\?|$)", "$1$2")
    u = F.regexp_replace(u, r"&" + _TRACKING_PARAM + r"=[^&]*", "")
    u = F.regexp_replace(u, r"\?" + _TRACKING_PARAM + r"=[^&]*&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACKING_PARAM + r"=[^&]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    return F.when(
        u.endswith("/")
        & (
            F.length(u)
            > F.length(
                F.regexp_extract(
                    u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
                )
            )
            + 1
        ),
        F.substring(u, F.lit(1), F.length(u) - 1),
    ).otherwise(u)


def canonicalize_urls(
    df: DataFrame, uri_col: str, out_col: str = "canonical_url"
) -> DataFrame:
    """Staged (df-level) URL canonicalization — the corpus-volume form:
    each multi-referenced intermediate is a NAMED column, so every rule
    evaluates once per row instead of the single-expression form's
    multiplied CASE branches (the no-CSE discipline of
    langid._gram_rows / dedup.shingle_tokens, applied to CASE/when).
    Rules identical to ``canonicalize_url``; equality is test-pinned.
    NULL uris yield a NULL canonical."""
    u0 = F.regexp_replace(F.col(uri_col), r"#.*$", "")
    s1 = df.withColumns(
        {
            "__u0": u0,
            "__pre": F.regexp_extract(
                u0, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
            ),
        }
    )
    lowered = F.when(F.col("__pre") == "", F.col("__u0")).otherwise(
        F.concat(
            F.lower(F.col("__pre")),
            F.substring(
                F.col("__u0"),
                F.length(F.col("__pre")) + 1,
                F.length(F.col("__u0")),
            ),
        )
    )
    chain = F.regexp_replace(
        lowered, r"^(http://[^/:?#]*):80(/|\?|$)", "$1$2"
    )
    chain = F.regexp_replace(
        chain, r"^(https://[^/:?#]*):443(/|\?|$)", "$1$2"
    )
    chain = F.regexp_replace(chain, r"&" + _TRACKING_PARAM + r"=[^&]*", "")
    chain = F.regexp_replace(
        chain, r"\?" + _TRACKING_PARAM + r"=[^&]*&", "?"
    )
    chain = F.regexp_replace(
        chain, r"\?" + _TRACKING_PARAM + r"=[^&]*$", ""
    )
    chain = F.regexp_replace(chain, r"\?$", "")
    # The trailing-slash test must use the prefix of the PORT-STRIPPED
    # url (__u1), not __pre (extracted before :80/:443 removal) — with
    # the pre-strip prefix, 'http://site.org:80/a/' keeps its slash
    # while the expression form strips it, so url_dedup would miss
    # default-port/plain duplicate pairs.  Stage it once (no-CSE).
    s2 = s1.withColumn("__u1", chain).withColumn(
        "__pre2",
        F.regexp_extract(
            F.col("__u1"), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
        ),
    )
    final = F.when(
        F.col("__u1").endswith("/")
        & (
            F.length(F.col("__u1"))
            > F.length(F.col("__pre2")) + 1
        ),
        F.substring(
            F.col("__u1"), F.lit(1), F.length(F.col("__u1")) - 1
        ),
    ).otherwise(F.col("__u1"))
    return s2.withColumn(out_col, final).drop(
        "__u0", "__pre", "__pre2", "__u1"
    )
