"""Element scoring primitives (parity: reference utils/element_scores.py and
algorithms/riskloc.py:12-47), re-expressed as declarative Spark column algebra.

Global sums are computed with a single ``agg`` reduce and broadcast back via
``crossJoin(broadcast(...))`` — this keeps every step partition-parallel (a
``Window.partitionBy()`` with no keys would funnel 100 TB through one task).
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_scalars(df: DataFrame, scalars: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate frame to every row (broadcast nested loop —
    constant-size build side, no shuffle of ``df``)."""
    return df.crossJoin(F.broadcast(scalars))


def add_explanatory_power(df: DataFrame, derived: bool = False) -> DataFrame:
    """EP column (ref utils/element_scores.py:4-26).

    Plain: ep = (real - predict) / (A - F) with A=sum(real), F=sum(predict).
    Derived: ep via a/b measure split, normalized to sum to 1.
    """
    if derived:
        totals = df.agg(
            F.sum("predict_a").alias("__Fa"), F.sum("predict_b").alias("__Fb")
        )
        out = _with_scalars(df, totals)
        n = (F.col("real_a") - F.col("predict_a")) * F.col("__Fb") - (
            F.col("real_b") - F.col("predict_b")
        ) * F.col("__Fa")
        d = F.col("__Fb") * (F.col("__Fb") + F.col("real_b") - F.col("predict_b"))
        out = out.withColumn("ep", n / d).drop("__Fa", "__Fb")
        ep_sum = out.agg(F.sum("ep").alias("__eps"))
        out = _with_scalars(out, ep_sum)
        return out.withColumn("ep", F.col("ep") / F.col("__eps")).drop("__eps")

    totals = df.agg(F.sum("real").alias("__A"), F.sum("predict").alias("__F"))
    out = _with_scalars(df, totals)
    return out.withColumn(
        "ep", (F.col("real") - F.col("predict")) / (F.col("__A") - F.col("__F"))
    ).drop("__A", "__F")


def add_deviation_score(df: DataFrame) -> DataFrame:
    """deviation = 2*(predict-real)/(predict+real), 0 where denom is 0
    (ref utils/element_scores.py:58-65)."""
    denom = F.col("predict") + F.col("real")
    dev = F.when(denom == 0, F.lit(0.0)).otherwise(
        2.0 * (F.col("predict") - F.col("real")) / denom
    )
    return df.withColumn("deviation", dev)


def add_surprise(df: DataFrame, derived: bool = False, merged_divide: int = 1) -> DataFrame:
    """JS-divergence-style surprise (ref utils/element_scores.py:29-55).

    nan_to_num semantics of the reference (0*log(0) -> 0, p or q == 0 -> 0
    contribution) are reproduced with explicit WHEN guards.
    """

    def surprise_term(real_col: str, predict_col: str, F_tot, A_tot):
        p = F.col(predict_col) / (F_tot / merged_divide)
        q = F.col(real_col) / (A_tot / merged_divide)
        # p*log(2p/(p+q)): 0 when p==0; +/-inf -> nan_to_num -> large finite in
        # numpy, but p,q >= 0 here so 2p/(p+q) is finite unless p+q==0.
        p_term = F.when((p == 0) | (p + q == 0), F.lit(0.0)).otherwise(
            p * F.log(2.0 * p / (p + q))
        )
        q_term = F.when((q == 0) | (p + q == 0), F.lit(0.0)).otherwise(
            q * F.log(2.0 * q / (p + q))
        )
        return 0.5 * (p_term + q_term)

    if derived:
        totals = df.agg(
            F.sum("predict_a").alias("__Fa"),
            F.sum("real_a").alias("__Aa"),
            F.sum("predict_b").alias("__Fb"),
            F.sum("real_b").alias("__Ab"),
        )
        out = _with_scalars(df, totals)
        s = surprise_term("real_a", "predict_a", F.col("__Fa"), F.col("__Aa")) + surprise_term(
            "real_b", "predict_b", F.col("__Fb"), F.col("__Ab")
        )
        return out.withColumn("surprise", s).drop("__Fa", "__Aa", "__Fb", "__Ab")

    totals = df.agg(F.sum("predict").alias("__F"), F.sum("real").alias("__A"))
    out = _with_scalars(df, totals)
    s = surprise_term("real", "predict", F.col("__F"), F.col("__A"))
    return out.withColumn("surprise", s).drop("__F", "__A")


def get_cutoff(df: DataFrame, n_remove: int = 5, relative: bool = False) -> float:
    """Deviation cutoff (ref algorithms/riskloc.py:35-47).

    Needs the (n_remove+1)-th smallest/largest *distinct* deviation — a
    driver-side top-k over distinct values. k is tiny (or a percentage of
    distinct count), so two sorted ``limit`` collects are scale-safe: Spark
    executes limit-after-sort as a TakeOrdered (no full sort materialize).
    """
    devs = df.select("deviation").distinct()
    if relative:
        n_distinct = devs.count()
        n_remove = int(math.ceil(n_distinct * n_remove / 100))
    k = n_remove + 1
    # both ends in ONE action: union the two TakeOrdered subtrees
    # (limit-after-sort never materializes a full sort) and tag the side
    both = (
        devs.orderBy(F.col("deviation").asc())
        .limit(k)
        .select(F.lit(0).alias("side"), "deviation")
        .unionAll(
            devs.orderBy(F.col("deviation").desc())
            .limit(k)
            .select(F.lit(1).alias("side"), "deviation")
        )
        .collect()
    )
    smallest = [r["deviation"] for r in both if r["side"] == 0]
    largest = [r["deviation"] for r in both if r["side"] == 1]
    min_val = max(smallest)  # n_remove+1-th smallest
    max_val = min(largest)  # n_remove+1-th largest
    return -min(min_val, max_val, key=abs)


def add_partition(df: DataFrame, cutoff: float) -> DataFrame:
    """Anomaly partition flag (ref algorithms/riskloc.py:20-32)."""
    anomaly_right = math.copysign(1, cutoff) > 0 if cutoff == 0 else cutoff >= 0
    if anomaly_right:
        part = F.when(F.col("deviation") > cutoff, 1).otherwise(0)
    else:
        part = F.when(F.col("deviation") < cutoff, 1).otherwise(0)
    return df.withColumn("partition", part)


def add_weight(df: DataFrame, cutoff: float) -> DataFrame:
    """Leaf weight (ref algorithms/riskloc.py:12-17)."""
    w = F.abs(F.lit(cutoff) - F.col("deviation"))
    w = F.when((F.col("real") == 0) & (F.col("predict") == 0), F.lit(0.0)).otherwise(w)
    w = F.when(F.col("partition") == 1, F.abs(F.col("deviation"))).otherwise(w)
    w = F.when(w > 1.0, F.lit(1.0)).otherwise(w)
    return df.withColumn("weight", w)
