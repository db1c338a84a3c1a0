"""Bottom-k quantile sketch (operators/quantiles.py): exact
mergeability (merge == union), DKW error bound vs exact quantiles,
partitioning determinism, small-n exactness, and the WindowGroupLimit
map-side-limit plan shape."""
import math

import numpy as np
from pyspark.sql import functions as F

from riskloc_spark.operators.quantiles import (
    quantile_error_bound,
    quantile_estimate,
    quantile_sketch,
    quantile_sketch_merge,
)


def _rows(sk):
    return sorted(tuple(r) for r in sk.collect())


def test_sketch_merge_equals_union_sketch(spark):
    """sketch(A ∪ B ∪ C) == merge(sketch(A), sketch(B), sketch(C))
    row-for-row when ids are globally unique — the property that
    makes per-shard artifacts composable."""
    vals = [(i, float((i * 2654435761) % 10007)) for i in range(6000)]
    full = spark.createDataFrame(vals, "id long, v double")
    shards = [
        spark.createDataFrame(vals[i::3], "id long, v double")
        for i in range(3)
    ]
    whole = quantile_sketch(full, "v", "id", k=256)
    merged = quantile_sketch_merge(
        *[quantile_sketch(s, "v", "id", k=256) for s in shards],
        k=256,
    )
    assert _rows(whole) == _rows(merged)
    # re-merging an overlapping shard is idempotent
    remerged = quantile_sketch_merge(
        merged, quantile_sketch(shards[0], "v", "id", k=256), k=256
    )
    assert _rows(remerged) == _rows(whole)


def test_estimate_within_dkw_bound(spark):
    """every reported quantile's true rank sits inside the DKW
    envelope (delta=0.01) on a skewed continuous distribution."""
    n, k = 20000, 1024
    rng = np.random.default_rng(7)
    data = np.exp(rng.normal(size=n) * 2.0)  # heavy-tailed
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(data)],
        "id long, v double",
    )
    sk = quantile_sketch(df, "v", "id", k=k)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {
        r["q"]: r["value"]
        for r in quantile_estimate(sk, qs).collect()
    }
    eps = quantile_error_bound(k, delta=0.01)
    srt = np.sort(data)
    for q in qs:
        true_rank = q * n
        est_rank = np.searchsorted(srt, got[q], side="right")
        assert abs(est_rank - true_rank) <= eps * n + 1, (
            q, got[q], est_rank, true_rank, eps * n,
        )


def test_small_n_is_exact_and_partition_deterministic(spark):
    """n <= k keeps every row: quantiles are EXACT Type-1; and the
    sketch is identical under any repartitioning."""
    vals = [(i, float(v)) for i, v in enumerate(
        [5, 1, 9, 3, 7, 2, 8, 4, 6, 10])]
    df = spark.createDataFrame(vals, "id long, v double")
    sk = quantile_sketch(df, "v", "id", k=64)
    got = {
        r["q"]: r["value"]
        for r in quantile_estimate(sk, [0.1, 0.5, 1.0]).collect()
    }
    assert got == {0.1: 1.0, 0.5: 5.0, 1.0: 10.0}
    sk2 = quantile_sketch(df.repartition(7), "v", "id", k=64)
    assert _rows(sk) == _rows(sk2)


def test_estimate_rank_is_textbook_type1_on_exact_products(spark):
    """the r13 advisory case: q*s products that land a hair ABOVE an
    exact integer in IEEE doubles (0.9 * 10 = 9.000000000000002) must
    still pick the ceil(q*s)-th row, not one past it — the 1e-9
    epsilon in quantile_estimate absorbs the drift."""
    vals = [(i, float(i + 1)) for i in range(10)]  # 1..10
    df = spark.createDataFrame(vals, "id long, v double")
    sk = quantile_sketch(df, "v", "id", k=64)
    got = {
        r["q"]: r["value"]
        for r in quantile_estimate(
            sk, [0.1, 0.3, 0.7, 0.9]).collect()
    }
    # exact Type-1 picks on n=10: rank ceil(10q) = 1, 3, 7, 9
    assert got == {0.1: 1.0, 0.3: 3.0, 0.7: 7.0, 0.9: 9.0}


def test_keyed_sketch_and_null_exclusion(spark):
    """per-key sketches don't leak across keys; NULL values and NULL
    ids are excluded."""
    rows = [("a", i, float(i)) for i in range(100)]
    rows += [("b", 1000 + i, float(1000 + i)) for i in range(50)]
    rows += [("a", None, 1.0), ("a", 7777, None)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    sk = quantile_sketch(df, "v", "id", key_cols=["g"], k=512)
    cnt = {r["g"]: r["cnt"] for r in
           sk.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    assert cnt == {"a": 100, "b": 50}
    got = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_estimate(
            sk, [1.0], key_cols=["g"]).collect()
    }
    assert got[("a", 1.0)] == 99.0
    assert got[("b", 1.0)] == 1049.0


def test_sketch_plan_caps_map_side(spark):
    """the rank<=k filter must cap map output BEFORE the exchange:
    keyed sketches compile to WindowGroupLimit, unkeyed ones all the
    way down to TakeOrderedAndProject (a global top-k with map-side
    partial) — either way shuffle volume is independent of row
    count."""
    df = spark.range(10000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    keyed = quantile_sketch(df, "v", "id", key_cols=["g"], k=32)
    plan = keyed._sc._jvm.PythonSQLUtils.explainString(
        keyed._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan, plan
    unkeyed = quantile_sketch(df, "v", "id", k=32)
    plan2 = unkeyed._sc._jvm.PythonSQLUtils.explainString(
        unkeyed._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan2, plan2


def test_error_bound_function():
    assert abs(
        quantile_error_bound(1024, 0.01)
        - math.sqrt(math.log(200.0) / 2048.0)
    ) < 1e-12


def test_bucketed_min_sample_merge_and_bound(spark):
    """the bounded-state sibling: register tables merge by the SAME
    groupBy min (merge(sample(A), sample(B)) == sample(A ∪ B)), the
    sample feeds quantile_estimate with the same DKW-style envelope,
    and results are identical under repartitioning."""
    from riskloc_spark.operators.quantiles import bucketed_min_sample

    vals = [(i, float((i * 2654435761) % 9973)) for i in range(8000)]
    full = spark.createDataFrame(vals, "id long, v double")
    shards = [
        spark.createDataFrame(vals[i::2], "id long, v double")
        for i in range(2)
    ]
    whole = bucketed_min_sample(full, "v", "id", k=256)
    merged_rows = (
        bucketed_min_sample(shards[0], "v", "id", k=256)
        .unionByName(bucketed_min_sample(shards[1], "v", "id", k=256))
        .groupBy("bucket")
        .agg(
            F.min(F.struct(F.col("h"), F.col("value"))).alias("__m")
        )
        .select(
            "bucket",
            F.col("__m.h").alias("h"),
            F.col("__m.value").alias("value"),
        )
    )
    assert _rows(whole) == _rows(merged_rows)
    assert _rows(whole) == _rows(
        bucketed_min_sample(full.repartition(11), "v", "id", k=256)
    )
    # estimation: same Type-1 machinery, stratified-uniform sample
    import numpy as np

    got = {
        r["q"]: r["value"]
        for r in quantile_estimate(
            whole.select("h", "value"), [0.5, 0.9]
        ).collect()
    }
    data = np.sort([v for _, v in vals])
    eps = quantile_error_bound(256, delta=0.01)
    for q in (0.5, 0.9):
        est_rank = np.searchsorted(data, got[q], side="right")
        assert abs(est_rank - q * len(vals)) <= eps * len(vals) + 1


def test_streaming_registers_equal_batch_sample(spark, tmp_path):
    """streaming bucketed-min registers (complete mode, availableNow)
    equal the batch sample over the same rows — the bounded-state
    streaming-quantiles contract."""
    from riskloc_spark.operators.quantiles import bucketed_min_sample
    from riskloc_spark.streaming.pipeline import (
        quantile_registers_stream,
    )

    rows = [
        (i, f"t{i % 3}", float((i * 48271) % 1000))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    path = str(tmp_path / "ev")
    df.write.parquet(path)
    src = (
        spark.readStream.schema(df.schema).parquet(path)
    )
    regs = quantile_registers_stream(
        src, "value", "event_id", ("event_type",), k=64
    )
    name = "tq_stream_regs"
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
        for r in bucketed_min_sample(
            df, "value", "event_id", ["event_type"], k=64
        ).select("event_type", "bucket", "h", "value").collect()
    )
    assert got == want


def test_sketch_artifacts_persist_roundtrip(spark, tmp_path):
    """the per-shard artifact story end-to-end: a day-1 quantile
    sketch written to parquet, read back, merged with a day-2 sketch
    — identical to the sketch of the union (and the same for a Bloom
    position table re-used through bloom_probe)."""
    from riskloc_spark.operators.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    d1 = spark.createDataFrame(
        [(i, float(i % 503)) for i in range(0, 4000, 2)],
        "id long, v double",
    )
    d2 = spark.createDataFrame(
        [(i, float(i % 503)) for i in range(1, 4000, 2)],
        "id long, v double",
    )
    path = str(tmp_path / "day1_sketch")
    quantile_sketch(d1, "v", "id", k=128).write.parquet(path)
    day1 = spark.read.parquet(path)
    merged = quantile_sketch_merge(
        day1, quantile_sketch(d2, "v", "id", k=128), k=128
    )
    whole = quantile_sketch(d1.unionByName(d2), "v", "id", k=128)
    assert _rows(merged) == _rows(whole)

    bpath = str(tmp_path / "day1_bloom")
    bloom_build(d1, "id", m_bits=1 << 12, k=3).write.parquet(bpath)
    b1 = spark.read.parquet(bpath)
    bm = bloom_merge(b1, bloom_build(d2, "id", m_bits=1 << 12, k=3))
    items = spark.createDataFrame(
        [(7,), (999999,)], "id long"
    )
    got = {
        r["item"]: r["maybe_present"]
        for r in bloom_probe(
            bm, items, "id", m_bits=1 << 12, k=3
        ).collect()
    }
    assert got[7] is True  # present (odd id, day 2)
