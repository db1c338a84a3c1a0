"""Distribution statistics without a global sort: histogram-backed
quantiles for corpus profiling ("filter documents above the p95
length", "cut per-language score distributions") at 100-TB scale.

The classic trap is ``percentile`` / ``ntile`` over a per-key window:
every key funnels through ONE reducer and sorts there.  The shape
here is the perplexity-bucket discipline (functions/text.py)
generalized: values land on a fixed-resolution lattice, the lattice
histogram is ONE map-side-combinable aggregation bounded by the
lattice size (not the row count), and each requested quantile is
integer arithmetic over that tiny histogram — the smallest lattice
value whose cumulative count reaches ceil(q * n).  That is the
classic Type-1 (inverse-CDF) empirical quantile ON the lattice:
exact for integer-valued columns at resolution 1; otherwise the
reported value is the winning cell's LOWER bound, so it
underestimates the true Type-1 quantile by up to one full lattice
step (floor bias — choose ``resolution`` accordingly).  Deterministic
under any row order in any engine (the DuckDB twin replays the same
integer arithmetic).  For quantiles WITHOUT choosing a lattice a
priori, see the mergeable bottom-k quantile sketch
(operators/quantiles.py).

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list,
    key_cols: list | None = None,
    resolution: float = 1.0,
) -> DataFrame:
    """(key..., q, value): for each quantile fraction in ``qs``, the
    smallest lattice value v (value_col floored to ``resolution``
    steps) with at least ceil(q * n) values <= its lattice cell —
    Type-1 empirical quantiles on the lattice (the returned value is
    the cell's lower bound: a floor bias of up to one ``resolution``
    step for non-integer data).  NULL values are excluded from n.
    q must be in (0, 1]."""
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("qs must be fractions in (0, 1]")
    keys = list(key_cols or [])
    step = float(resolution)
    cell = (
        F.floor(F.col(value_col).cast("double") / step).cast("long")
    )
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, cell.alias("__cell"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumns(
        {
            "__cum": F.sum("__cnt").over(w),
            "__n": F.sum("__cnt").over(
                Window.partitionBy(*keys).rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing,
                )
            ),
        }
    )
    # one row per requested quantile: the FIRST cell whose cumulative
    # count reaches ceil(q*n) — a min over the tiny histogram, never
    # a corpus-volume operation
    qf = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    hit = (
        cum.select(*keys, "__cell", "__cum", "__n", qf)
        .filter(
            F.col("__cum")
            >= F.ceil(F.col("q") * F.col("__n")).cast("long")
        )
        .groupBy(*keys, "q")
        .agg(F.min("__cell").alias("__qcell"))
    )
    return hit.select(
        *keys,
        "q",
        (F.col("__qcell") * step).alias("value"),
    )
