"""Cuboid enumeration + per-cuboid element statistics.

A "cuboid" is a subset of the attribute dimensions; an "element" is one
combination of values for those dimensions. The search algorithms
(riskloc / hotspot / autoroot / squeeze) all need per-element aggregates
over the leaf frame — computed here as ONE ``groupBy(cuboid)`` pass so the
whole cuboid costs a single shuffle regardless of element count.

The decomposition trick for hotspot (ref algorithms/hotspot.py:40-63):
gps / ps scores of a *set* of elements are exact functions of per-element
sums, because the ripple ratio V_e/F_e is per-element. So MCTS can run on
the driver over this compact stats frame — no leaf data leaves the
executors.
"""
from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuboids_of_layer(attributes: list[str], layer: int) -> list[list[str]]:
    """All dimension subsets of the given size, in reference order
    (itertools.combinations over the sorted attribute list)."""
    return [list(c) for c in combinations(attributes, layer)]


ELEM_SEP = "\x1f"


# Gate-surface accumulator type. Validity envelope: casting each per-row
# term to DECIMAL(38,9) quantizes at 1e-9, so (a) terms below 5e-10 round
# to zero and (b) accumulated per-row rounding error grows up to n*5e-10.
# The 6-decimal rounded gate surface therefore stays faithful to the
# double-sum reference semantics while n * 5e-10 << 5e-7, i.e. up to
# ~1e3 rows per aggregated element with same-sign worst-case rounding —
# and in expectation (errors are +/- uniform) far beyond; the RCA gate
# frames aggregate 10-1e3 rows/element with terms in [1e-3, 1e6], well
# inside. For frames with terms near or below 1e-9 (e.g. normalized
# shares on billion-row elements), scale the terms before the cast or
# widen the scale. The SEARCH paths use native doubles — this type only
# shapes the oracle-gate hash surface, where both engines apply the
# identical quantization.
DECIMAL_EXACT = "decimal(38,9)"


def elem_expr(cuboid: list[str], sep: str = ELEM_SEP):
    """Element-key expression for a cuboid: sep-joined string values with
    NULLs mapped to 'None' (matching the driver paths' str() rendering).
    concat_ws silently *drops* NULL parts, which would collapse distinct
    tuples and misalign elem.split against the cuboid's dimension list —
    every distributed elem construction must go through this."""
    return F.concat_ws(
        sep, *[F.coalesce(F.col(d).cast("string"), F.lit("None")) for d in cuboid]
    )


def element_stats_all(
    df: DataFrame, cuboids: list[list[str]], exact_sums: bool = False
) -> DataFrame:
    """element_stats for MANY cuboids in ONE shuffle.

    Each row explodes into one (cid, elem-key) pair per cuboid; a single
    window + groupBy on (cid, elem) then yields every cuboid's element
    statistics — the same fusion riskloc's layer search uses, so a whole
    hotspot stats sweep is one job instead of one per cuboid.

    ``exact_sums=True`` casts every per-row term to DECIMAL(38,9) before
    the SUMs, making the aggregates order-independent (decimal addition is
    exact and associative; double addition is not, so parallel partial-sum
    ordering can flip the last rounded digit between runs). Used by the
    oracle gate query; the search path keeps native doubles for speed."""
    from pyspark.sql import Window

    structs = [
        F.struct(F.lit(i).alias("cid"), elem_expr(cuboid).alias("elem"))
        for i, cuboid in enumerate(cuboids)
    ]
    ex = df.select(
        F.explode(F.array(*structs)).alias("ce"), "real", "predict"
    ).select(F.col("ce.cid").alias("cid"), F.col("ce.elem").alias("elem"), "real", "predict")

    w = Window.partitionBy("cid", "elem")
    if exact_sums:
        # exact (order-independent) window sums, then one deterministic
        # IEEE division — both engines see bit-identical V_e/F_e ratios.
        V = F.sum(F.col("real").cast(DECIMAL_EXACT)).over(w).cast("double")
        Fs = F.sum(F.col("predict").cast(DECIMAL_EXACT)).over(w).cast("double")
    else:
        V = F.sum("real").over(w)
        Fs = F.sum("predict").over(w)
    ratio = F.when(Fs != 0, V / Fs).otherwise(F.lit(0.0))
    a = F.col("predict") * ratio

    ex = ex.withColumn("__a", a)
    diff = F.col("real") - F.col("predict")
    diffa = F.col("real") - F.col("__a")

    def s(term):
        # x*x (exactly-rounded IEEE multiply, identical across engines)
        # instead of pow(x, 2) — libm pow may differ by 1 ulp per engine.
        return F.sum(term.cast(DECIMAL_EXACT) if exact_sums else term)

    return ex.groupBy("cid", "elem").agg(
        F.count(F.lit(1)).alias("n_e"),
        s(F.col("real")).alias("V_e"),
        s(F.col("predict")).alias("F_e"),
        s(F.abs(diff)).alias("B_e"),
        s(diff * diff).alias("Q_e"),
        s(F.abs(diffa)).alias("A_e"),
        s(diffa * diffa).alias("P_e"),
    )


def element_stats(df: DataFrame, cuboid: list[str]) -> DataFrame:
    """Per-element sufficient statistics for set-scoring (hotspot ps/gps).

    For element e: n_e, V_e=sum(real), F_e=sum(predict),
    B_e = sum|real-predict|,            Q_e = sum (real-predict)^2,
    A_e = sum|real - predict*V_e/F_e|,  P_e = sum (real - predict*V_e/F_e)^2.

    Window + groupBy share the same hash partitioning → one shuffle.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*cuboid)
    V = F.sum("real").over(w)
    Fs = F.sum("predict").over(w)
    ratio = F.when(Fs != 0, V / Fs).otherwise(F.lit(0.0))
    a = F.col("predict") * ratio

    df2 = df.withColumn("__a", a)
    return df2.groupBy(*cuboid).agg(
        F.count(F.lit(1)).alias("n_e"),
        F.sum("real").alias("V_e"),
        F.sum("predict").alias("F_e"),
        F.sum(F.abs(F.col("real") - F.col("predict"))).alias("B_e"),
        # x*x, not pow(x, 2): exactly-rounded IEEE multiply, matching
        # element_stats_all and the DuckDB twins bitwise
        F.sum(
            (F.col("real") - F.col("predict"))
            * (F.col("real") - F.col("predict"))
        ).alias("Q_e"),
        F.sum(F.abs(F.col("real") - F.col("__a"))).alias("A_e"),
        F.sum(
            (F.col("real") - F.col("__a")) * (F.col("real") - F.col("__a"))
        ).alias("P_e"),
    )
