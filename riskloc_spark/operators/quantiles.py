"""Mergeable quantile sketches: a deterministic bottom-k
(KMV-style) uniform-sample sketch — the quantile member of the
sketch tier (HLL operators/sketches.py, Count-Min operators/cms.py,
Bloom operators/bloom.py).

Unlike ``histogram_quantiles`` (functions/stats.py), which needs an
a-priori lattice (resolution x bounds) and is only exact on
integer-grid data, this sketch needs NO prior knowledge of the value
distribution: per key it keeps the rows whose pure row-id hash lands
in the global bottom-k — a uniform random sample without replacement
of the key's rows, fixed forever by (id, salt).

Why bottom-k and not KLL/GK: KLL's compactors (Karnin, Lang &
Liberty 2016, "Optimal quantile approximation in streams") decide
survivors from INSERTION ORDER, so two runs over different Spark
partitionings of the same data yield different sketches — not
replayable by an independent engine and not property-testable as
merge == union.  The bottom-k sketch (Cohen & Kaplan 2007,
"Summarizing data using bottom-k sketches"; the KMV estimator of
Bar-Yossef et al. 2002) makes membership a pure function of the row
id: sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY whenever
ids are globally unique (property-tested), bit-identical under any
partitioning, and the DuckDB twin replays every surviving row.  The
price is the error bound: rank error is the
Dvoretzky-Kiefer-Wolfowitz envelope eps = sqrt(ln(2/delta)/(2k))
(~2.7% of n at k=1024, delta=0.01) vs KLL's O(1/k) — the right trade
for a pipeline that persists per-shard artifacts and audits them.

The 100-TB shape: ONE scan; the rank<=k filter compiles to
WindowGroupLimit (plan-tested), so every map task keeps only its
local bottom-k per key BEFORE the exchange — shuffle volume is
bounded by k x input-partitions per key, never the row count.  Merge
is the same bottom-k over the unioned (tiny) sketch tables.
Estimation sorts <= k rows per key.

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from riskloc_spark.operators.dedup import md5_hash64

_HASH_MASK = (1 << 60) - 1  # fold ANY hash into [0, 2^60)


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_cols: list | None = None,
    k: int = 1024,
    salt: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., h, value): the quantile sketch — per key group, the
    k rows whose seeded row-id hash is smallest, carrying their
    values.  Membership is a pure function of (id, salt), so the same
    row survives in every shard/run that contains it: sketches built
    per day/source merge EXACTLY into the sketch of the union
    (``quantile_sketch_merge``).  Rows with NULL value or NULL id are
    excluded.  ``id_col`` must be unique per key group — duplicate
    ids collapse into correlated survivors and bias the sample."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(key_cols or [])
    staged = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(
            *keys,
            (
                hash_fn(F.col(id_col), seed=salt)
                .bitwiseAND(F.lit(_HASH_MASK))
            ).alias("h"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    # rank<=k over (h, value) compiles to WindowGroupLimit: each map
    # task emits at most k rows per key into the shuffle.  The value
    # tiebreak makes the survivor SET deterministic even under a
    # 60-bit hash collision (unique ids make h ties negligible, not
    # impossible).
    w = Window.partitionBy(*keys).orderBy("h", "value")
    return (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantile_sketch_merge(
    *sketches: DataFrame, k: int = 1024
) -> DataFrame:
    """Union sketch tables from any number of shards/windows and keep
    the bottom-k again: because membership is hash-threshold, this
    equals the sketch of the unioned raw data whenever row ids are
    globally unique (property-tested).  Overlapping shards (the same
    id in two sketches) are deduplicated by (key, h, value), so
    re-merging a shard is idempotent.  Columns must match."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("h", "value")]
    w = Window.partitionBy(*keys).orderBy("h", "value")
    return (
        out.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantile_estimate(
    sketch: DataFrame,
    qs: list,
    key_cols: list | None = None,
) -> DataFrame:
    """(key..., q, value): the Type-1 (inverse-CDF) quantile of the
    sampled values per key — the ceil(q*s)-th smallest of the s
    sketch rows.  The rank is ceil(q*s - 1e-9): the epsilon absorbs
    IEEE-double products that land a hair ABOVE an exact integer
    (0.9 * 10 = 9.000000000000002 would otherwise ceil to 10, one
    rank past the Type-1 pick) — the oracle twin applies the same
    epsilon, so both engines compute the textbook rank.  With prob
    1-delta over the hash choice, the reported value's TRUE rank is
    within n * sqrt(ln(2/delta)/(2k)) of q*n
    (Dvoretzky-Kiefer-Wolfowitz over a uniform sample; without
    replacement only tightens it).  q must be in (0, 1]."""
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("qs must be fractions in (0, 1]")
    keys = list(key_cols or [])
    w = Window.partitionBy(*keys).orderBy("value", "h")
    ranked = sketch.withColumns(
        {
            "__rn": F.row_number().over(w),
            "__s": F.count(F.lit(1)).over(
                Window.partitionBy(*keys).rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing,
                )
            ),
        }
    )
    qf = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    return (
        ranked.select(*keys, "value", "__rn", "__s", qf)
        .filter(
            F.col("__rn")
            == F.ceil(
                F.col("q") * F.col("__s") - F.lit(1e-9)
            ).cast("int")
        )
        .select(*keys, "q", "value")
    )


def quantile_error_bound(k: int, delta: float = 0.01) -> float:
    """The DKW rank-error envelope as a fraction of n: with prob
    1-delta, every reported quantile's true rank is within
    eps = sqrt(ln(2/delta)/(2k)) * n of its target."""
    if k < 1 or not 0 < delta < 1:
        raise ValueError("k >= 1 and delta in (0, 1) required")
    return math.sqrt(math.log(2.0 / delta) / (2.0 * k))


def quantile_register_rows(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_cols: list | None = None,
    k: int = 256,
    salt: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., bucket, h, value) PRE-aggregation rows for the
    BUCKETED-MIN sample — the bounded-state sibling of the bottom-k
    sketch: the hash space is split into k buckets (h % k) and each
    register keeps the lexicographic-min (h, value) of its bucket.
    Shared by the batch sketch (groupBy min below) and the streaming
    register aggregation (streaming/pipeline.quantile_registers_
    stream), exactly the hll_register_rows pattern."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(key_cols or [])
    return (
        df.filter(
            F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(
            *keys,
            (
                hash_fn(F.col(id_col), seed=salt)
                .bitwiseAND(F.lit(_HASH_MASK))
            ).alias("h"),
            F.col(value_col).cast("double").alias("value"),
        )
        .withColumn("bucket", (F.col("h") % k).cast("int"))
    )


def bucketed_min_sample(
    df: DataFrame,
    value_col: str,
    id_col: str,
    key_cols: list | None = None,
    k: int = 256,
    salt: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., bucket, h, value): the bucketed-min quantile sample —
    per key at most k register rows, register j holding the
    lexicographic-min (h, value) among rows whose id-hash lands in
    bucket j.  Each register is a uniform draw from its bucket's
    rows, so the k values are a stratified uniform sample: Type-1
    quantile estimates over them carry the same DKW-style
    sqrt(ln(2/d)/2k) rank envelope as the bottom-k sketch (strata
    only tighten it).  Why it exists alongside ``quantile_sketch``:
    min is a plain decomposable aggregate — this sketch runs as a
    STREAMING complete-mode aggregation with state bounded at k rows
    per key forever (the hll_registers_stream shape), and merges
    across shards/windows by the very same groupBy min.  Drop the
    sample into ``quantile_estimate`` unchanged."""
    keys = list(key_cols or [])
    rows = quantile_register_rows(
        df, value_col, id_col, keys, k, salt, hash_fn
    )
    m = F.min(F.struct(F.col("h"), F.col("value"))).alias("__m")
    return (
        rows.groupBy(*keys, "bucket")
        .agg(m)
        .select(
            *keys, "bucket",
            F.col("__m.h").alias("h"),
            F.col("__m.value").alias("value"),
        )
    )
