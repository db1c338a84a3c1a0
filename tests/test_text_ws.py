"""Whitespace-class engine agreement (round 6, ADVICE): Java's \\s
includes vertical tab (U+000B), RE2's does not — both engines now use
the explicit WS_CLASS, so VT-bearing documents must tokenize identically
in Spark and DuckDB. These strings never appear in the test corpus; this
test manufactures them."""
import duckdb
import pytest
from pyspark.sql import functions as F

from riskloc_spark.functions.text import (
    WS_CLASS,
    bpe_token_count,
    token_count,
)

TRICKY = [
    "plain words here",
    "vertical\x0btab separated",        # VT: the divergent character
    "form\x0cfeed and\ttab and\nnewline",
    "mixed \x0b \x0c \r\n runs",
    "",
    "   ",
    "ends with vt\x0b",
]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)], "id long, text string"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(TRICKY)))
    return sdf, con


def test_token_count_agrees_on_vt(frames):
    sdf, con = frames
    got = {
        r["id"]: r["n"]
        for r in sdf.select("id", token_count(F.col("text")).alias("n")).collect()
    }
    want = dict(
        con.execute(
            "SELECT id, CAST(CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) "
            "END AS INT) FROM t"
        ).fetchall()
    )
    assert got == want
    # the VT row must actually split (2 tokens) — the old Java-\s-only
    # behavior in DuckDB would have returned 1
    assert got[1] == 3


def test_bpe_pieces_agree_on_vt(frames):
    sdf, con = frames
    got = {
        r["id"]: r["n"]
        for r in sdf.select(
            "id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    want = dict(
        con.execute(
            "SELECT id, CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+"
            "| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+')) AS INT) "
            "FROM t"
        ).fetchall()
    )
    assert got == want


def test_ws_class_is_engine_identical():
    """The class spells out exactly Java's \\s set, so neither engine's
    shorthand semantics are load-bearing."""
    assert WS_CLASS == r"[ \t\n\x0B\f\r]"


def test_token_count_null_text_is_zero(spark):
    # split(NULL) -> NULL, size(NULL) -> -1 under legacy sizeOfNull:
    # a null-text row must count 0 tokens, not poison cumulative token
    # budgets with -1 (ADVICE r9)
    sdf = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "a b")],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in sdf.select(
            "id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 2}


def test_token_count_null_matches_duckdb_twin(spark):
    """The NULL->0 fix must hold on BOTH sides of the oracle seam: the
    twins coalesce text before the trim, so a null-text row counts 0
    tokens in Spark AND DuckDB (review r10 — the first fix was
    Spark-only, a latent hash divergence)."""
    import duckdb

    rows = [(1, None), (2, ""), (3, "  "), (4, "a  b\tc")]
    sdf = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["n"]
        for r in sdf.select(
            "id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute(r"""
        SELECT id, CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
             ELSE len(string_split_regex(trim(text),
                      '[ \t\n\x0B\f\r]+')) END AS INT)
        FROM t
    """).fetchall())
    assert got == want == {1: 0, 2: 0, 3: 0, 4: 3}


def test_split_sentences_rules(spark):
    from riskloc_spark.functions.text import split_sentences

    df = spark.createDataFrame(
        [(1, 'One here. Two has 3! Three? "Quoted." And 3.5 stays. '
             'lowercase continuation stays too.'),
         (2, "   "),
         (3, "No terminal punctuation at all")],
        "doc_id long, text string",
    )
    rows = split_sentences(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["sent_idx"], r["sentence"])
        )
    s1 = [s for _, s in sorted(by_doc[1])]
    assert s1 == [
        "One here.",
        "Two has 3!",
        "Three?",
        # quote-FINAL sentences don't split (lookbehind sees the quote,
        # not the period — a stated seam), decimals and lower-case
        # continuations stay joined
        '"Quoted." And 3.5 stays. lowercase continuation stays too.',
    ]
    assert 2 not in by_doc  # whitespace-only: no sentences
    assert [s for _, s in sorted(by_doc[3])] == [
        "No terminal punctuation at all"
    ]
    assert all(r["n_chars"] == len(r["sentence"]) for r in rows)
