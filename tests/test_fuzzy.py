"""Fuzzy key join (operators/fuzzy.py): deletion-neighborhood
blocking completeness vs a brute-force Levenshtein join, id
carry-through, NULL keys, and the blocked-join plan shape."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from riskloc_spark.operators.fuzzy import fuzzy_join


def _lev(a, b):
    m = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = m.copy()
        m[0] = i
        for j, cb in enumerate(b, 1):
            m[j] = min(prev[j] + 1, m[j - 1] + 1,
                       prev[j - 1] + (ca != cb))
    return int(m[-1])


WORDS = [
    "spark", "spork", "sprk", "sparkk", "shark", "quark",
    "sparkle", "park", "spars", "xyz", "ab", "a", "",
    "table", "cable", "tables", "tbale",
]


@pytest.mark.parametrize("d", [1, 2])
def test_blocking_is_complete_vs_bruteforce(spark, d):
    """every pair within the distance is found and nothing else —
    substitutions, insertions, deletions, transposition-as-two-edits,
    empty and single-char strings included."""
    L = spark.createDataFrame([(w,) for w in WORDS], "k string")
    got = sorted(
        (r["left_key"], r["right_key"], r["distance"])
        for r in fuzzy_join(L, L, "k", max_distance=d).collect()
    )
    want = sorted(
        (a, b, _lev(a, b))
        for a in WORDS for b in WORDS if _lev(a, b) <= d
    )
    assert got == want


def test_ids_carry_through_and_nulls_never_match(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, None), (3, "zzz")],
        "lid long, k string",
    )
    right = spark.createDataFrame(
        [(10, "acme korp"), (11, None)], "rid long, k string"
    )
    out = fuzzy_join(
        left, right, "k", max_distance=1,
        left_id="lid", right_id="rid",
    ).collect()
    assert [(r["left_id"], r["right_id"], r["distance"])
            for r in out] == [(1, 10, 1)]


def test_fuzzy_join_plan_is_equi_join(spark):
    """the candidate join must be a hash/sort-merge EQUI-join on the
    variant column — never a BroadcastNestedLoopJoin theta join."""
    L = spark.createDataFrame([(w,) for w in WORDS], "k string")
    out = fuzzy_join(L, L, "k", max_distance=1)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan


def test_fuzzy_join_d2_length_guard(spark):
    """the d=2 boundary contract: a key longer than max_key_length is
    refused (O(len^2) variant explosion), the cap is adjustable, d=1
    is unguarded (linear variants)."""
    import pytest

    long_key = "x" * 100
    df = spark.createDataFrame(
        [("alpha",), (long_key,)], "k string"
    )
    with pytest.raises(ValueError, match="max_key_length"):
        fuzzy_join(df, df, "k", max_distance=2)
    # raising the cap (or disabling it) accepts the key
    out = fuzzy_join(
        df, df, "k", max_distance=2, max_key_length=128
    ).collect()
    assert {(r["left_key"], r["right_key"]) for r in out} >= {
        ("alpha", "alpha"), (long_key, long_key)
    }
    # d=1 never probes: linear variants need no guard
    out1 = fuzzy_join(df, df, "k", max_distance=1).collect()
    assert len(out1) == 2
