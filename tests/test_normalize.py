"""Unicode normalization operator: NFC composition (Python unicodedata
vs DuckDB's native nfc_normalize must agree), control stripping, and
the audit columns."""
import duckdb
import pandas as pd
import pytest

from riskloc_spark.functions.text import (
    CONTROL_CLASS,
    normalize_text,
    strip_control_chars,
)

CASES = [
    # (input, expected normalized) — explicit escapes only: composed
    # and decomposed forms are visually identical in source
    ("cafe\u0301", "caf\u00e9"),   # combining acute composes
    ("A\u030aB", "\u00c5B"),       # combining ring
    ("\u1100\u1161", "\uac00"),   # Hangul jamo -> syllable
    ("caf\u00e9", "caf\u00e9"),    # already NFC: unchanged
    ("ok\x01ay\x7f!", "okay!"),    # C0 + DEL stripped
    ("keep\ttabs\nand\x0bvt\x0cff\r",
     "keep\ttabs\nand\x0bvt\x0cff\r"),  # whitespace survives
    ("c\u00851range", "c1range"),   # C1 control stripped
    ("", ""),
]


def test_normalize_cases_and_audit_columns(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(CASES)), "text": [c[0] for c in CASES]}
        )
    )
    got = {r["doc_id"]: r for r in normalize_text(df).collect()}
    for i, (src, want) in enumerate(CASES):
        r = got[i]
        assert r["text"] == want, (i, src)
        assert r["n_chars_before"] == len(src)
        assert r["n_chars_after"] == len(want)
        assert r["changed"] == (src != want)


def test_duckdb_twin_agrees_on_cases(spark):
    """The gate's premise in miniature: DuckDB's nfc_normalize +
    RE2 control strip produce the identical strings."""
    con = duckdb.connect()
    for src, want in CASES:
        out = con.execute(
            "SELECT nfc_normalize(regexp_replace(?, "
            "'[\\x00-\\x08\\x0E-\\x1F\\x7F\\x{0080}-\\x{009F}]', '', 'g'))",
            [src],
        ).fetchone()[0]
        assert out == want, (src,)


def test_strip_control_preserves_whitespace(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["a\x00b\tc\nd\x0be\x0cf\rg\x1fh"]})
    )
    from pyspark.sql import functions as F

    out = df.select(strip_control_chars(F.col("text")).alias("t")).collect()
    assert out[0]["t"] == "ab\tc\nd\x0be\x0cf\rg" + "h"
    # the class is what the oracle uses — keep them in sync
    assert CONTROL_CLASS.startswith("[") and "0080" in CONTROL_CLASS


def test_normalize_null_text(spark):
    df = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    r = normalize_text(df).collect()[0]
    assert r["text"] is None and r["changed"] is None
