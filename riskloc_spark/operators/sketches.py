"""Mergeable cardinality sketches: a deterministic HyperLogLog built
from pure column algebra (Flajolet et al. 2007, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm").

Why not ``approx_count_distinct``: Spark's HLL++ is a black box — its
registers cannot be persisted per key, merged across ingestion
batches, or replayed by an independent engine.  This sketch is an
ordinary DataFrame of (key..., bucket, rank) rows:

* build once per shard/day/source (one map-combinable groupBy max),
* persist like any table,
* MERGE by the same groupBy max (max is idempotent/commutative —
  sketch(A ∪ B) == merge(sketch(A), sketch(B)), property-tested),
* estimate with one aggregation per key.

That is the 100-TB shape: distinct-user / distinct-token counts per
(day, source) computed incrementally, unioned over any time window
without rescanning the raw data.

Determinism discipline (the PageRank BIGINT lesson): the estimator's
register sum Z = sum_j 2^(-M_j) is NOT exact in doubles (4096 terms
spanning ~48 binades overflow a 53-bit mantissa, so reduction order
would leak into the result).  We sum the SCALED INTEGER
2^(rmax - M_j) instead — every term and the total fit a BIGINT
exactly, so the sum is bit-identical under any partitioning, and the
single final double division is IEEE-exact on identical inputs.  The
hash is the portable 60-bit md5 (operators/dedup.md5_hash64) so a
DuckDB twin replays every register; production swaps in xxhash64 via
``hash_fn`` (same algebra, ~5x cheaper, no SQL twin).  Any hash is
masked to the low ``_HASH_BITS`` non-negative bits before slicing —
a signed 64-bit hash (xxhash64) would otherwise yield negative
buckets and sign-extended rank words.  NULL values are excluded
before hashing (matching ``approx_count_distinct`` semantics — a
NULL register row would inflate small-set estimates).

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.operators.dedup import md5_hash64

_HASH_BITS = 60  # md5_hash64 yields 15 hex chars = 60 bits
_HASH_MASK = (1 << _HASH_BITS) - 1  # fold ANY hash into [0, 2^60)


def hll_register_rows(
    df: DataFrame,
    value_col: str,
    key_cols: list | None = None,
    p: int = 12,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., bucket, rank) PRE-aggregation rows — one per input
    row.  Shared by the batch sketch (groupBy max below) and the
    streaming register aggregation (streaming/pipeline.py), which
    needs the projection on a streaming frame before its own stateful
    max."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    keys = list(key_cols or [])
    m = 1 << p
    w_bits = _HASH_BITS - p
    # STAGE the hash as a column and slice it with integer ops only: a
    # 60-bit value does not fit a double mantissa, so `h / m` would
    # round and corrupt both the bucket and the rank word.  Mask to
    # the low 60 non-negative bits so a SIGNED hash (xxhash64) cannot
    # produce negative buckets / sign-extended rank words; a no-op
    # for md5_hash64.  NULLs are dropped (md5(NULL) is NULL and would
    # register a phantom (NULL, NULL) row).
    staged = df.filter(F.col(value_col).isNotNull()).select(
        *keys,
        (hash_fn(F.col(value_col)).bitwiseAND(F.lit(_HASH_MASK)))
        .alias("__h"),
    )
    bucket = (F.col("__h") % m).cast("int")
    w = F.expr(f"shiftright(__h, {p})")
    # floor(log2(w)) + 1 == length of the binary string (no leading
    # zeros) — integer-exact in both engines, unlike float log2
    rank = (
        F.when(w == F.lit(0), F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.conv(w, 10, 2)) + 1)
        .cast("int")
    )
    return staged.select(
        *keys, bucket.alias("bucket"), rank.alias("rank")
    )


def hll_sketch(
    df: DataFrame,
    value_col: str,
    key_cols: list | None = None,
    p: int = 12,
    hash_fn=md5_hash64,
) -> DataFrame:
    """(key..., bucket, rank): the HLL register table for the distinct
    values of ``value_col`` per key group.  bucket = low ``p`` hash
    bits; rank = leading-zero count of the remaining (60-p)-bit word
    plus one (the all-zeros word ranks 61-p).  One combinable
    aggregation — a mega-key contributes at most 2^p rows per input
    partition after partial aggregation."""
    keys = list(key_cols or [])
    return (
        hll_register_rows(df, value_col, keys, p, hash_fn)
        .groupBy(*keys, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables from any number of shards/windows into
    one sketch: the same groupBy max.  Columns must match."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("rank",)]
    return out.groupBy(*keys).agg(F.max("rank").alias("rank"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(
    sketch: DataFrame,
    key_cols: list | None = None,
    p: int = 12,
) -> DataFrame:
    """(key..., zeros, reg_sum, est): the cardinality estimate per
    key.  ``reg_sum`` is the exact BIGINT sum of 2^(rmax - rank) over
    PRESENT registers (absent register == rank 0 contributes the full
    2^rmax, folded in arithmetically via the zero count), ``zeros``
    the number of absent registers, ``est`` the bias-corrected
    estimate with the standard small-range linear-counting branch
    (E <= 2.5m and zeros > 0 -> m * ln(m / zeros))."""
    keys = list(key_cols or [])
    m = 1 << p
    rmax = _HASH_BITS - p + 1
    alpha = _alpha(m)
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(
            F.expr(f"shiftleft(1L, {rmax} - rank)")
        ).alias("__psum"),
    )
    zeros = (F.lit(m) - F.col("__present")).cast("long")
    reg_sum = (
        F.col("__psum") + zeros * F.lit(1 << rmax).cast("long")
    ).cast("long")
    # E = alpha * m^2 / Z where Z = reg_sum / 2^rmax: one IEEE-exact
    # division of exact integers
    raw = F.lit(alpha * m * m * float(1 << rmax)) / F.col("reg_sum")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return (
        agg.withColumns({"zeros": zeros, "reg_sum": reg_sum})
        .withColumn("est", F.round(est, 4))
        .select(*keys, "zeros", "reg_sum", "est")
    )


def hll_intersection_estimate(
    a: DataFrame,
    b: DataFrame,
    key_cols: list | None = None,
    p: int = 12,
) -> DataFrame:
    """(key..., est_a, est_b, est_union, est_intersection): the
    inclusion-exclusion overlap estimate |A ∩ B| ~ E(A) + E(B) -
    E(A ∪ B) from two register tables over the SAME (p, hash) family
    — the classic HLL set-op composition (union is exact in sketch
    space via ``hll_merge``; intersection inherits the summed error
    of three estimates, so small overlaps of large sets drown in
    noise — documented, test-pinned).  Keys must appear in both
    sketches; a key missing from one side estimates that side as 0.
    Composes three ``hll_estimate`` calls on gated machinery — no
    separate oracle by design."""
    keys = list(key_cols or [])
    ea = hll_estimate(a, keys, p).select(
        *keys, F.col("est").alias("est_a")
    )
    eb = hll_estimate(b, keys, p).select(
        *keys, F.col("est").alias("est_b")
    )
    eu = hll_estimate(hll_merge(a, b), keys, p).select(
        *keys, F.col("est").alias("est_union")
    )
    join = (
        eu.join(ea, keys, "left_outer").join(eb, keys, "left_outer")
        if keys
        else eu.crossJoin(ea).crossJoin(eb)
    )
    return join.select(
        *keys,
        F.coalesce("est_a", F.lit(0.0)).alias("est_a"),
        F.coalesce("est_b", F.lit(0.0)).alias("est_b"),
        "est_union",
        F.round(
            F.greatest(
                F.coalesce("est_a", F.lit(0.0))
                + F.coalesce("est_b", F.lit(0.0))
                - F.col("est_union"),
                F.lit(0.0),
            ),
            4,
        ).alias("est_intersection"),
    )
