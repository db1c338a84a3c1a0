"""HyperLogLog register sketches (operators/sketches.py): register
math vs a pure-Python replay, merge == union property, estimate
accuracy within the standard error envelope."""
import hashlib
import math

from pyspark.sql import functions as F

from riskloc_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _py_registers(values, p):
    m = 1 << p
    wb = 60 - p
    regs = {}
    for v in set(values):
        h = _h60(v)
        b = h % m
        w = h >> p
        rank = (wb + 1) if w == 0 else wb - (w.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def test_hll_registers_match_python_replay(spark):
    vals = [f"user-{i % 700}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    got = {
        r["bucket"]: r["rank"]
        for r in hll_sketch(df, "u", p=8).collect()
    }
    assert got == _py_registers(vals, 8)


def test_hll_estimate_within_standard_error(spark):
    n = 20000
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(n)], "u string"
    )
    sk = hll_sketch(df, "u", p=12)
    est = hll_estimate(sk, p=12).collect()[0]["est"]
    # standard error 1.04/sqrt(4096) ~ 1.6%; allow 3 sigma
    assert abs(est - n) / n < 0.05, est


def test_hll_merge_equals_union_sketch(spark):
    a = spark.createDataFrame(
        [(f"x{i}",) for i in range(3000)], "u string"
    )
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(1500, 4500)], "u string"
    )
    merged = hll_merge(
        hll_sketch(a, "u", p=10), hll_sketch(b, "u", p=10)
    )
    union = hll_sketch(a.unionAll(b), "u", p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_hll_keyed_and_linear_counting_branch(spark):
    # tiny cardinalities: the zeros>0 branch must fire and stay exact
    rows = [("s1", f"a{i}") for i in range(10)] + [
        ("s2", f"b{i}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "src string, u string")
    out = {
        r["src"]: r
        for r in hll_estimate(
            hll_sketch(df, "u", key_cols=["src"], p=12),
            key_cols=["src"],
            p=12,
        ).collect()
    }
    m = 4096
    for src, n in (("s1", 10), ("s2", 300)):
        regs = _py_registers(
            [u for s, u in rows if s == src], 12
        )
        zeros = m - len(regs)
        expect = round(m * math.log(m / zeros), 4)
        assert out[src]["zeros"] == zeros
        assert abs(out[src]["est"] - expect) < 1e-6, (src, out[src])
        assert abs(out[src]["est"] - n) / n < 0.2


def test_hll_intersection_estimate(spark):
    """inclusion-exclusion overlap: two 3000-element sets sharing
    1500 estimate the overlap within the summed-error envelope; a
    disjoint pair estimates ~0 (clamped non-negative)."""
    from riskloc_spark.operators.sketches import (
        hll_intersection_estimate,
    )

    a = spark.createDataFrame(
        [(f"x{i}",) for i in range(3000)], "u string"
    )
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(1500, 4500)], "u string"
    )
    out = hll_intersection_estimate(
        hll_sketch(a, "u", p=12), hll_sketch(b, "u", p=12), p=12
    ).collect()[0]
    assert abs(out["est_union"] - 4500) / 4500 < 0.05
    assert abs(out["est_intersection"] - 1500) / 1500 < 0.15, out
    c = spark.createDataFrame(
        [(f"z{i}",) for i in range(3000)], "u string"
    )
    out2 = hll_intersection_estimate(
        hll_sketch(a, "u", p=12), hll_sketch(c, "u", p=12), p=12
    ).collect()[0]
    assert out2["est_intersection"] < 450, out2


def test_hll_xxhash64_and_null_handling(spark):
    """The r12 advisory fixes: (a) a SIGNED 64-bit hash (xxhash64)
    must yield sane estimates — the register slicer masks to the low
    60 non-negative bits, so negative hashes cannot produce negative
    buckets / sign-extended ranks; (b) NULLs are excluded, matching
    approx_count_distinct semantics."""
    from riskloc_spark.operators.dedup import xxhash64_fn

    n = 2000
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(n)], "u string"
    )
    sk = hll_sketch(df, "u", p=12, hash_fn=xxhash64_fn)
    rows = sk.collect()
    assert all(0 <= r["bucket"] < 4096 for r in rows)
    assert all(1 <= r["rank"] <= 49 for r in rows)
    out = hll_estimate(sk, p=12).collect()[0]
    assert out["zeros"] >= 0
    assert abs(out["est"] - n) / n < 0.1, out["est"]
    # NULLs contribute nothing: {a, NULL, b} estimates ~2, and the
    # sketch has no NULL register row
    df2 = spark.createDataFrame(
        [("a",), (None,), ("b",)], "u string"
    )
    sk2 = hll_sketch(df2, "u", p=12)
    assert sk2.filter(F.col("bucket").isNull()).count() == 0
    est2 = hll_estimate(sk2, p=12).collect()[0]["est"]
    assert abs(est2 - 2.0) < 0.01, est2
