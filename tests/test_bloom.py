"""Bloom membership sketches (operators/bloom.py): positions vs a
pure-Python replay, NO-false-negatives guarantee, measured
false-positive rate, merge == union, keyed anchoring."""
import hashlib

from riskloc_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)


def _h60(v, seed) -> int:
    return int(
        hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16
    )


def _py_positions(values, m, k):
    return {
        _h60(v, r) % m for v in values for r in range(k)
    }


def test_bloom_positions_match_python_replay(spark):
    vals = [f"u{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["pos"] for r in bloom_build(df, "v", m_bits=4096, k=3).collect()
    }
    assert got == _py_positions(vals, 4096, 3)


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = [f"id-{i}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in members], "v string")
    bloom = bloom_build(df, "v", m_bits=1 << 16, k=4)
    probes = members[:200] + [f"absent-{i}" for i in range(2000)]
    items = spark.createDataFrame([(v,) for v in probes], "v string")
    got = {
        r["item"]: r["maybe_present"]
        for r in bloom_probe(
            bloom, items, "v", m_bits=1 << 16, k=4
        ).collect()
    }
    # every member MUST be present-maybe
    for v in members[:200]:
        assert got[v], v
    # fp rate at n=2000, m=65536, k=4: ~(1-e^-0.122)^4 ~ 1.7e-4
    fps = sum(1 for i in range(2000) if got[f"absent-{i}"])
    assert fps <= 5, fps


def test_bloom_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"x{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"y{i}",) for i in range(300)], "v string")
    kw = dict(m_bits=8192, k=3)
    merged = bloom_merge(
        bloom_build(a, "v", **kw), bloom_build(b, "v", **kw)
    )
    union = bloom_build(a.unionAll(b), "v", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_bloom_keyed_anchoring(spark):
    rows = [("s1", "a"), ("s1", "b"), ("s2", "c")]
    df = spark.createDataFrame(rows, "src string, v string")
    bloom = bloom_build(df, "v", key_cols=["src"], m_bits=1024, k=3)
    items = spark.createDataFrame([("a",), ("c",), ("zz",)], "v string")
    got = {
        (r["src"], r["item"]): r["maybe_present"]
        for r in bloom_probe(
            bloom, items, "v", key_cols=["src"], m_bits=1024, k=3
        ).collect()
    }
    assert got[("s1", "a")] is True
    assert got[("s2", "c")] is True
    assert got[("s1", "zz")] is False and got[("s2", "zz")] is False
    # 'a' lives only in s1 (collision-improbable at this load)
    assert got[("s2", "a")] is False


def test_bloom_xxhash64_and_null_handling(spark):
    """r12 advisory: signed xxhash64 positions are masked
    non-negative, and NULLs set no bits / probe no rows."""
    from pyspark.sql import functions as F

    from riskloc_spark.operators.dedup import xxhash64_fn

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(300)] + [(None,)] * 3, "v string"
    )
    bl = bloom_build(df, "v", m_bits=4096, k=4, hash_fn=xxhash64_fn)
    rows = bl.collect()
    assert all(0 <= r["pos"] < 4096 for r in rows)
    items = spark.createDataFrame(
        [("k5",), ("absent-xyz",), (None,)], "v string"
    )
    out = {
        r["item"]: r["maybe_present"]
        for r in bloom_probe(
            bl, items, "v", m_bits=4096, k=4, hash_fn=xxhash64_fn
        ).collect()
    }
    assert out["k5"] is True
    assert None not in out and len(out) == 2


def test_streaming_bloom_equals_batch_filter(spark, tmp_path):
    """streaming Bloom positions (complete mode, availableNow) equal
    the batch filter bit-for-bit over the same rows — the saturating
    bounded-state membership stream."""
    from riskloc_spark.streaming.pipeline import bloom_positions_stream

    rows = [(f"t{i % 2}", f"u{i % 97}") for i in range(1500)]
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    path = str(tmp_path / "bloomev")
    df.write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    regs = bloom_positions_stream(src, m_bits=1 << 10, k=3)
    name = "tbloom_stream_regs"
    q = (
        regs.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = sorted(tuple(r) for r in spark.table(name).collect())
    want = sorted(
        tuple(r)
        for r in bloom_build(
            df, "user_id", key_cols=["event_type"],
            m_bits=1 << 10, k=3,
        ).collect()
    )
    assert got == want
