"""Language identification by character n-gram rank-order profiles —
the Cavnar & Trenkle 1994 "N-Gram-Based Text Categorization" classifier
(the textcat method), trained on the corpus's own labels.

Why rank-order and not naive-Bayes log-probabilities: the distance is a
SUM OF INTEGERS (|rank difference| per shared n-gram, a fixed penalty
per unshared one), so classification is bit-exact across engines — the
DuckDB twin replays fit and predict verbatim and the gate hashes the
argmin itself, with no ln() seam and no summation-order float noise.

Scale shape: fitting explodes labeled text once into (lang, n-gram)
counts (map-side combinable) and ranks per language — output is
``n_langs x k`` rows, a broadcast table by construction. Classification
explodes each document into its OWN top-k profile (corpus-volume, but
capped at k rows per doc), joins the broadcast profile table, and
aggregates one (doc, lang) distance grid. Two corpus-volume exchanges
(the per-doc count and the distance aggregation); everything else is
profile-sized. The heuristic ``functions/text.lang_id`` remains the
zero-shuffle fast path; this is the real classifier behind it.

No reference counterpart (pipeline extension).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.text import WS_CLASS


def _char_ngrams(text, n: int):
    """Character n-grams of the whitespace-collapsed lowercased text as
    an array column (empty when shorter than n).

    NOTE: this single-expression form embeds the normalization in every
    n-gram access, so only use it on short strings / small frames —
    corpus-volume consumers go through ``_gram_rows``, which stages the
    char array as a named column first (higher-order functions get no
    common-subexpression elimination: an expression referenced inside a
    transform lambda is re-evaluated per element)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), WS_CLASS + "+", " ")
    return F.when(
        F.length(norm) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (n - 1)),
            lambda i: F.substring(norm, i, n),
        )
    )


def _gram_rows(df: DataFrame, keep, text_col: str, n: int) -> DataFrame:
    """Exploded (keep..., gram) rows — the corpus-volume path, staged
    for linear cost.  Two traps both bit a naive form (each measured at
    sf0.1, 5k docs):

    - substring(norm, i, n) per position walks the UTF-8 bytes from
      offset 0 each call (variable-width encoding), so the explode is
      O(len^2) per document — 17s where the rest of the classifier
      costs ~3s;
    - binding the split-per-character array inside the transform lambda
      re-evaluates the split PER ELEMENT ACCESS (no CSE inside
      higher-order functions) — 104s.

    Staging the char array as a named intermediate column and sliding
    over it with O(1) element_at is linear: CollapseProject keeps the
    stage because the array is non-cheap and multiply-referenced, the
    same discipline functions/quality.py documents.  split('') yields
    whole code points (surrogate pairs intact), matching substring's
    code-point semantics exactly — test_langid locks parity."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(text_col))), WS_CLASS + "+", " "
    )
    staged = df.select(*keep, F.split(norm, "").alias("__chars"))
    chars = F.col("__chars")
    grams = F.when(
        F.size(chars) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(chars) - (n - 1)),
            lambda i: F.concat(
                *[F.element_at(chars, i + j) for j in range(n)]
            ),
        )
    )
    return staged.select(*keep, F.explode(grams).alias("gram"))


def doc_gram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-(document, n-gram) counts — the ONE corpus-volume explode
    both the fit and the classify stages consume.  Compute this once
    (and localCheckpoint it) when running fit + classify over the same
    corpus: round 9's langid_pred derived it independently in each
    stage, making the classifier the most expensive headline query for
    no reason (VERDICT r9 Wrong #2).  Returns (id_col, gram, c)."""
    grams = _gram_rows(df, [F.col(id_col)], text_col, n)
    return grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))


def lang_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    k: int = 300,
    n: int = 3,
    id_col: str = "doc_id",
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-language rank-order profiles: the top-``k`` character
    n-grams of each language's labeled text, ranked 1..k by
    (count desc, n-gram asc) — the deterministic tie-break both engines
    share. Returns (lang, gram, rank); ``n_langs x k`` rows.

    ``doc_counts``: an optional precomputed ``doc_gram_counts`` frame
    to share with ``classify_language`` — per-language counts are the
    sum of per-document counts (exact integers, partitioned by doc),
    so the output is bit-identical to the direct explode."""
    if doc_counts is not None:
        counts = (
            doc_counts.join(
                df.select(F.col(id_col), F.col(lang_col).alias("lang")),
                id_col,
            )
            .groupBy("lang", "gram")
            .agg(F.sum("c").alias("c"))
        )
    else:
        grams = _gram_rows(
            df, [F.col(lang_col).alias("lang")], text_col, n
        )
        counts = grams.groupBy("lang", "gram").agg(
            F.count(F.lit(1)).alias("c")
        )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "gram", F.col("rank").cast("int").alias("rank"))
    )


def classify_language(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 300,
    n: int = 3,
    penalty: int | None = None,
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Cavnar-Trenkle out-of-place classification: each document's own
    top-``k`` n-gram profile is compared to every language profile —
    distance = sum over the document's grams of |doc rank - lang rank|,
    with ``penalty`` (default k) for grams absent from the language
    profile — and the language with the smallest (distance, lang)
    wins. Returns (id, pred_lang, distance, n_grams); all-integer
    arithmetic, so the argmin is engine-exact.

    ``doc_counts``: optional precomputed ``doc_gram_counts`` frame
    (shared with ``lang_profiles`` when fitting on the same corpus)."""
    if penalty is None:
        penalty = k
    if doc_counts is not None:
        counts = doc_counts
    else:
        grams = _gram_rows(df, [F.col(id_col)], text_col, n)
        counts = grams.groupBy(id_col, "gram").agg(
            F.count(F.lit(1)).alias("c")
        )
    from riskloc_spark.operators.dedup import reuse_checkpoint

    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("gram"))
    # profiles feeds TWO branches (the broadcast match + the language
    # list) and is bounded (n_langs x k rows) — checkpoint it so the
    # profile pipeline executes once instead of once per branch (no
    # cross-branch CSE).  doc_prof ALSO feeds two branches (doc_stats +
    # the match) but is CORPUS-volume: a checkpoint pins the whole
    # per-doc profile table as storage blocks, and the r15 interleaved
    # A/B at 300k docs measured that pinning SLOWER than recomputing
    # the rank window ({36.5, 36.5}s unpinned vs {52.2, 41.5}s pinned)
    # — the duplicate branch work is one window over (typically cached
    # or cheap) counts, while the pinned table is ~100-300 rows per doc
    doc_prof = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "gram", F.col("rank").cast("int").alias("r_doc"))
    )
    profiles = reuse_checkpoint(profiles)
    doc_stats = doc_prof.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    langs = profiles.select("lang").distinct()
    matched = (
        doc_prof.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.abs(F.col("r_doc") - F.col("rank"))).alias("m_dist"),
            F.count(F.lit(1)).alias("m_n"),
        )
    )
    grid = (
        doc_stats.crossJoin(F.broadcast(langs))
        .join(matched, [id_col, "lang"], "left")
        .select(
            F.col(id_col),
            "lang",
            "n_grams",
            (
                F.coalesce(F.col("m_dist"), F.lit(0))
                + F.lit(penalty)
                * (F.col("n_grams") - F.coalesce(F.col("m_n"), F.lit(0)))
            )
            .cast("long")
            .alias("distance"),
        )
    )
    best = grid.groupBy(id_col).agg(
        F.min(F.struct(F.col("distance"), F.col("lang"))).alias("b"),
        F.first("n_grams").alias("n_grams"),
    )
    return best.select(
        F.col(id_col),
        F.col("b.lang").alias("pred_lang"),
        F.col("b.distance").alias("distance"),
        F.col("n_grams").cast("int").alias("n_grams"),
    )
