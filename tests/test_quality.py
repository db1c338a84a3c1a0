"""Gopher repetition statistics, the Gopher quality filter, C4 line
cleaning, PII redaction, and tf-idf — hand-computed expectations, engine
parity of the shared regexes, and the zero-shuffle plan contract."""
import duckdb
import pytest
from pyspark.sql import functions as F

from riskloc_spark.functions.quality import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    c4_clean,
    c4_line_audit,
    gopher_quality,
    redact_pii,
    repetition_stats,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "a b c\na b c\nx y z"),
            (1, "the cat the cat the cat sat"),
            (2, ""),
            (3, "   \n\t\n "),
            (4, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )


def test_repetition_stats_hand_values(docs):
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(docs, top_ns=(2,), dup_ns=(2,)).collect()
    }
    # doc 0: 3 lines, one duplicated pair of 5-char lines (10 of 15 chars);
    # tokens a b c a b c x y z -> joined len 17; "a b"/"b c" each twice.
    r0 = rows[0]
    assert r0["n_lines"] == 3 and r0["n_words"] == 9
    assert r0["dup_line_frac"] == pytest.approx(1 / 3)
    assert r0["dup_line_char_frac"] == pytest.approx(10 / 15)
    assert r0["top_2gram_char_frac"] == pytest.approx(2 * 3 / 17)
    assert r0["dup_2gram_char_frac"] == pytest.approx((3 + 3) / 17)
    # doc 1: "the cat" x3 of 27 joined chars
    r1 = rows[1]
    assert r1["top_2gram_char_frac"] == pytest.approx(3 * 7 / 27)
    assert r1["dup_2gram_char_frac"] == pytest.approx((2 * 7 + 7) / 27)
    # empty / whitespace-only documents: all stats zero, no nulls
    for i in (2, 3):
        r = rows[i]
        assert r["n_lines"] == 0 and r["n_words"] == 0
        assert r["dup_line_frac"] == 0.0 == r["top_2gram_char_frac"]
    # doc 4: no repeats; top gram has count 1 and ties resolve to the
    # lexicographically smallest 2-gram ("five six", 8 chars of 33)
    assert rows[4]["top_2gram_char_frac"] == pytest.approx(8 / 33)
    assert rows[4]["dup_2gram_char_frac"] == 0.0


def test_repetition_stats_order_invariant(spark):
    """The stats fold sorts internally — shuffled word order with the
    same multiset of lines/grams gives the same duplicate mass."""
    a = spark.createDataFrame(
        [(0, "x y\nq r\nx y"), (1, "q r\nx y\nx y")],
        "doc_id long, text string",
    )
    out = repetition_stats(a, top_ns=(1,), dup_ns=(1,)).collect()
    by_id = {r["doc_id"]: r for r in out}
    for col in ("dup_line_frac", "dup_line_char_frac", "top_1gram_char_frac"):
        assert by_id[0][col] == by_id[1][col]


def test_gopher_quality_reasons(spark):
    # a passing document needs enough length that no single n-gram
    # dominates — exactly the regime the Gopher thresholds assume
    # every 2-gram contains an indexed word, so nothing repeats
    good = " ".join(
        f"the alpha{i:02d} of beta{i:02d} and gamma{i:02d}" for i in range(10)
    )
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality(docs, min_words=5, min_mean_word_len=2.0).collect()
    }
    assert out[0]["kept"] and out[0]["reason"] is None
    # pure repetition: fails the stopword rule first (rule order fixed)
    assert out[1]["reason"] == "stopwords"
    assert out[2]["reason"] == "n_words_low"


def test_c4_line_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, "This is a good sentence.\nshort\nFine line here!\nuses javascript here.\nno terminal punct"),
            (1, "lorem ipsum dolor sit amet.\nGood line here too."),
            (2, "var x = {a: 1};\nA fine sentence here."),
            (3, "  Padded line stays trimmed.  \nAnother keeper stays here."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_audit(docs).collect()}
    assert out[0]["n_kept_lines"] == 2 and out[0]["page_kept"]
    assert "javascript" not in out[0]["clean_text"]
    assert not out[1]["page_kept"]  # lorem ipsum
    assert not out[2]["page_kept"]  # curly brace
    assert out[3]["clean_text"] == (
        "Padded line stays trimmed.\nAnother keeper stays here."
    )
    survivors = {r["doc_id"] for r in c4_clean(docs).collect()}
    assert survivors == {0, 3}


def test_redact_pii_counts_and_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail a.b@c10.0.0.12.com then 10.0.0.1 and 555-123-4567"),
            (1, "no pii here at all"),
            (2, "two mails x@y.zz w@v.qq one ip 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    # the ip-looking domain is consumed by the email pass first — only
    # the standalone address counts as an IP
    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 1, 1)
    assert out[0]["text"] == "mail <EMAIL> then <IP> and <PHONE>"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (0, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ips"]) == (2, 1)


def test_pii_regex_engine_parity(spark):
    """The gate's real risk: Java regex (Spark) is leftmost-first, RE2
    (DuckDB) leftmost-longest. The patterns are alternation-free, so both
    engines must produce byte-identical redactions — checked here on
    adversarial near-matches and the gate hashes it per round."""
    cases = [
        "a@b.c",  # single-letter TLD: no match
        "x a@b.co extra dots a@b.c.d.ee",
        "1.2.3.4.5.6 and 999.999.999.999",
        "555-123-45678 and 12-345-6789 and 555-123-4567",
        "trailing dot a@b.com. and ip 1.2.3.4.",
        "e@mail.com@mail.com",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(cases):
        r = con.execute(
            """
            with a as (select regexp_replace(?, ?, '<EMAIL>', 'g') t),
                 b as (select regexp_replace(t, ?, '<IP>', 'g') t from a)
            select regexp_replace(t, ?, '<PHONE>', 'g') from b
            """,
            [t, EMAIL_RE, IPV4_RE, PHONE_RE],
        ).fetchone()[0]
        assert got[i]["text"] == r, (t, got[i]["text"], r)


def test_tfidf_formula_and_ranks(spark):
    import math

    docs = spark.createDataFrame(
        [
            (0, "s0", "alpha alpha beta shared"),
            (1, "s1", "gamma shared shared"),
        ],
        "doc_id long, source string, text string",
    )
    out = tfidf_top_terms(docs, k=10).collect()
    by = {(r["source"], r["term"]): r for r in out}
    # alpha: tf 2 in s0 only -> idf = ln(3/2)+1
    assert by[("s0", "alpha")]["score"] == pytest.approx(
        2 * (math.log(3 / 2) + 1)
    )
    assert by[("s0", "alpha")]["rank"] == 1
    # shared appears in both groups -> idf = ln(3/3)+1 = 1
    assert by[("s1", "shared")]["score"] == pytest.approx(2.0)
    assert by[("s0", "shared")]["df_groups"] == 2


def test_quality_projections_are_shuffle_free(spark, sf_dir):
    """The 100-TB contract: per-document quality stats are projections —
    zero exchanges in the executed plan."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for out in (
        repetition_stats(d),
        gopher_quality(d),
        c4_line_audit(d),
        redact_pii(d),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
    # the staging contract: higher-order functions are interpreted (no
    # cross-column CSE), so the token/line arrays must be named columns
    # evaluated ONCE — the optimized plan re-tokenizes at most twice
    # (lines + words), not once per statistic (measured 16x difference)
    opt = (
        repetition_stats(d)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert opt.count("split(") <= 2, opt


def test_quality_filters_compose_with_streaming(spark, tmp_path):
    """The quality verdicts are stateless projections, so they compose
    with Structured Streaming unchanged — a streaming gopher filter
    emits exactly the batch filter's survivors."""
    import pandas as pd

    path = str(tmp_path / "qdocs")
    good = " ".join(
        f"the alpha{i:02d} of beta{i:02d} and gamma{i:02d}" for i in range(10)
    )
    pdf = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": [good if i % 3 else "spam spam spam" for i in range(60)],
        }
    )
    spark.createDataFrame(pdf).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)
    out = gopher_quality(stream, min_words=5, min_mean_word_len=2.0).filter(
        "kept"
    )
    q = (
        out.select("doc_id")
        .writeStream.format("memory")
        .queryName("gopher_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT * FROM gopher_stream").collect()
    }
    want = {
        r["doc_id"]
        for r in gopher_quality(static, min_words=5, min_mean_word_len=2.0)
        .filter("kept")
        .select("doc_id")
        .collect()
    }
    assert got == want and len(got) == 40


def test_corpus_report_exact_quantiles(spark):
    """Type-1 quantile rule pinned by hand: smallest length whose
    cumulative count reaches ceil(q * n)."""
    from riskloc_spark.functions.quality import corpus_report

    # lengths 1..10, one doc each: p50 -> ceil(0.5*10)=5th -> 5;
    # p90 -> 9; p99 -> ceil(9.9)=10th -> 10
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "s") for i in range(1, 11)],
        "doc_id long, text string, source string",
    )
    r = corpus_report(docs).first()
    assert (r["n_docs"], r["total_tokens"], r["max_tokens"]) == (10, 55, 10)
    assert (r["p50_tokens"], r["p90_tokens"], r["p99_tokens"]) == (5, 9, 10)
    # heavy tie mass: 9 docs of length 2, one of 100 -> all low
    # quantiles sit on the tie, p99 on the outlier (ceil(9.9)=10th)
    docs2 = spark.createDataFrame(
        [(i, "a b", "s") for i in range(9)] + [(9, " ".join(["w"] * 100), "s")],
        "doc_id long, text string, source string",
    )
    r2 = corpus_report(docs2).first()
    assert (r2["p50_tokens"], r2["p90_tokens"], r2["p99_tokens"]) == (2, 2, 100)


def test_quality_dedup_chain_composes(spark):
    """The full curation chain the operators were built for: C4 line
    cleaning -> paragraph dedup -> span dedup -> gopher filter, each
    stage feeding the next as plain DataFrames."""
    from riskloc_spark.functions.quality import c4_clean, gopher_quality
    from riskloc_spark.operators.dedup import (
        remove_duplicate_paragraphs,
        remove_duplicate_spans,
    )

    slogan = "the shared slogan of this network appears right here today"
    body = " ".join(
        f"the alpha{i:02d} of beta{i:02d} and gamma{i:02d}" for i in range(10)
    )
    header = "Shared navigation header stays once."
    docs = spark.createDataFrame(
        [
            (0, f"{header}\n\n{body} {slogan}.\nnot a terminal line"),
            (1, f"{header}\n\n{body} extra words here {slogan}."),
            (2, "junk { page with a brace."),
        ],
        "doc_id long, text string",
    )
    cleaned = c4_clean(docs)                      # drops doc 2, bad lines
    stripped = remove_duplicate_paragraphs(cleaned)   # header kept once
    spanned = remove_duplicate_spans(stripped, n=8)   # slogan kept once
    final = gopher_quality(
        spanned, min_words=5, min_mean_word_len=2.0
    ).filter("kept")
    rows = {r["doc_id"]: r["text"] for r in spanned.collect()}
    assert set(rows) == {0, 1}
    assert sum(header.lower() in t.lower() for t in rows.values()) == 1
    assert sum(slogan in t for t in rows.values()) == 1
    assert {r["doc_id"] for r in final.collect()} <= {0, 1}


def test_url_extraction_and_blocklist(spark):
    from riskloc_spark.functions.quality import (
        domain_stats,
        extract_urls,
        filter_blocked_domains,
    )

    docs = spark.createDataFrame(
        [
            (0, "read https://Docs.Example.com/a and http://ads.net/x?id=1"),
            (1, "plain text with no links at all"),
            (2, "again https://docs.example.com/b here"),
        ],
        "doc_id long, text string",
    )
    rows = extract_urls(docs).collect()
    assert {(r["doc_id"], r["domain"]) for r in rows} == {
        (0, "docs.example.com"),
        (0, "ads.net"),
        (2, "docs.example.com"),
    }
    stats = {r["domain"]: r for r in domain_stats(docs).collect()}
    assert stats["docs.example.com"]["n_urls"] == 2
    assert stats["docs.example.com"]["n_docs"] == 2
    kept = {
        r["doc_id"]
        for r in filter_blocked_domains(docs, ("ads.net",)).collect()
    }
    assert kept == {1, 2}
    # the blocklist filter is a zero-shuffle projection
    plan = (
        filter_blocked_domains(docs, ("ads.net",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 0


def test_canonicalize_url_rules(spark):
    """Fragment, case, default ports, tracking params (first / middle /
    last / only), dangling '?', trailing slash; non-URLs pass through
    mostly untouched."""
    from pyspark.sql import functions as F

    from riskloc_spark.functions.quality import canonicalize_url

    cases = {
        "HTTPS://WWW.Ex.COM:443/P/3/?utm_source=f&q=en&utm_campaign=x#z":
            "https://www.ex.com/P/3/?q=en",
        "http://Site.org:80/a?gclid=123": "http://site.org/a",
        "http://site.org:8080/a": "http://site.org:8080/a",
        "http://site.org/a/": "http://site.org/a",
        "https://site.org/": "https://site.org/",
        "https://site.org/a?q=1&fbclid=zz&r=2":
            "https://site.org/a?q=1&r=2",
        "https://site.org/a?utm_a=1&utm_b=2": "https://site.org/a",
        "https://site.org/a?ref=keep&utm_x=1":
            "https://site.org/a?ref=keep",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select(
            "u", canonicalize_url(F.col("u")).alias("c")
        ).collect()
    }
    assert got == cases


def test_url_dedup_keep_first_and_nulls(spark):
    from pyspark.sql import functions as F

    from riskloc_spark.operators.dedup import url_dedup

    rows = [
        (0, "https://a.example/x"),
        (1, "HTTPS://A.Example:443/x#frag"),      # same canonical as 0
        (2, "https://a.example/x?utm_source=t"),  # same canonical as 0
        (3, "https://a.example/y"),
        (4, None),                                # no key -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, target_uri string")
    kept = {r["doc_id"]: r["canonical_url"]
            for r in url_dedup(df).collect()}
    assert set(kept) == {0, 3, 4}
    assert kept[0] == "https://a.example/x"
    assert kept[4] is None


def test_canonicalize_staged_equals_expression_form(spark):
    """canonicalize_urls (staged, corpus-volume) must equal
    canonicalize_url (single expression) on every rule case."""
    from pyspark.sql import functions as F

    from riskloc_spark.functions.quality import (
        canonicalize_url,
        canonicalize_urls,
    )

    cases = [
        "HTTPS://WWW.Ex.COM:443/P/3/?utm_source=f&q=en&utm_campaign=x#z",
        "http://Site.org:80/a?gclid=123",
        "http://site.org:8080/a",
        "http://site.org/a/",
        "https://site.org/",
        "https://site.org/a?q=1&fbclid=zz&r=2",
        "https://site.org/a?utm_a=1&utm_b=2",
        "https://site.org/a?ref=keep&utm_x=1",
        # default-port + trailing-slash interaction: the slash test
        # must run against the POST-port-strip prefix (r10 advisory —
        # the staged form used the pre-strip prefix and kept the slash)
        "http://site.org:80/a/",
        "https://site.org:443/ab/",
        "HTTP://Site.ORG:80/a/",
        "not a url at all/",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    expr = {r["u"]: r["c"] for r in df.select(
        "u", canonicalize_url(F.col("u")).alias("c")).collect()}
    staged = {r["u"]: r["canonical_url"] for r in
              canonicalize_urls(df, "u").collect()}
    assert expr == staged
    assert staged["http://site.org:80/a/"] == "http://site.org/a"
    assert staged["https://site.org:443/ab/"] == "https://site.org/ab"


def test_quality_percentile_filter_per_group_cutoffs(spark):
    """percentile-relative filtering: each group keeps exactly the
    docs clearing ITS OWN q-quantile (a global bar would empty the
    low-scoring group); evidence columns ride along; deterministic
    under repartitioning."""
    from riskloc_spark.operators.corpus import quality_percentile_filter

    good = ("the meeting of the board is in the room and "
            "it is set for the day. " * 3)
    rows = [(i, "hi", f"w{i}" if i < 8 else good) for i in range(16)]
    rows += [(100 + i, "lo", f"only w{i} here") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = quality_percentile_filter(df, q=0.6, k=64)
    got = out.collect()
    assert {"quality", "quality_cutoff"} <= set(out.columns)
    per_lang = {}
    for r in got:
        per_lang.setdefault(r["lang"], []).append(r)
        assert r["quality"] >= r["quality_cutoff"]
    # BOTH groups keep something: the 'lo' group's cutoff adapts to
    # its own (uniformly low) distribution instead of hi's bar
    assert per_lang.get("hi") and per_lang.get("lo")
    # 'hi' keeps only its good half (quality strictly above the short
    # junk docs' score)
    hi_ids = sorted(r["doc_id"] for r in per_lang["hi"])
    assert hi_ids == list(range(8, 16))
    again = quality_percentile_filter(df.repartition(5), q=0.6, k=64)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, got)
    )


def test_corpus_diff_statuses(spark):
    """snapshot diff: added/removed/changed/unchanged each detected;
    formatting-only edits (case, whitespace) read as unchanged."""
    from riskloc_spark.operators.corpus import (
        corpus_diff,
        corpus_diff_stats,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "kept  Text"),
         (4, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha beta EDITED"), (2, "gamma delta"),
         (3, "KEPT text"), (5, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "unchanged",
                   4: "removed", 5: "added"}
    stats = {r["status"]: r["n"]
             for r in corpus_diff_stats(old, new).collect()}
    assert stats == {"changed": 1, "unchanged": 2, "removed": 1,
                     "added": 1}
