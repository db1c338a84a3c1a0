"""Z-order (Morton) data clustering for multi-column range pruning —
the lakehouse layout primitive (Delta/Iceberg expose it as OPTIMIZE
ZORDER BY): rows sorted by the bit-interleaved key land min/max
ranges on EVERY participating column per file/row-group, so a scan
filtered on any of them prunes most of the data without choosing one
"primary" sort column.

Scale shapes
------------
* The per-column (min, max) normalization bounds are ONE tiny
  aggregation broadcast into the plan — never collected.
* The z-key itself is a static unroll of bits*ncols shift/mask terms:
  pure JVM column algebra inside whole-stage codegen, no UDF.
* ``write_zordered`` = repartitionByRange(z) + sortWithinPartitions(z)
  + parquet: one range exchange (sampled boundaries), files emerge
  tiled along the space-filling curve.  At 100 TB this is exactly the
  OPTIMIZE job: the exchange is the rewrite cost, reads repay it on
  every multi-column range query.

Determinism: quantization is floor(((v - min) * (2^bits - 1)) / span)
in IEEE doubles — the identical multiply/divide/floor sequence on the
identical inputs yields the identical lattice cell in any engine, and
the bit interleave after it is integer-only, so the DuckDB twin
replays the key verbatim.  NULL values sort first (quantize to 0).

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Linear map of a numeric column onto [0, 2^bits) as BIGINT:
    ((v - lo) * (2^bits - 1)) div (hi - lo), constant columns and
    NULLs landing on 0.  Integer-exact for integer inputs; doubles
    are floored onto the lattice first (documented: sub-lattice order
    within one cell is not preserved — irrelevant for pruning)."""
    span = (hi - lo).cast("double")
    maxq = (1 << bits) - 1
    v = F.col(col).cast("double")
    q = F.when(
        v.isNull() | (span <= 0), F.lit(0).cast("long")
    ).otherwise(
        F.floor(((v - lo.cast("double")) * maxq) / span).cast("long")
    )
    # guard fp round-up at the top edge
    return F.least(F.greatest(q, F.lit(0)), F.lit(maxq))


def zorder_key(
    df: DataFrame, cols: list, bits: int = 16
) -> DataFrame:
    """Adds ``__z``: the Morton interleave of ``cols`` quantized to
    ``bits`` bits each (bits * len(cols) <= 62).  Bounds come from one
    broadcast min/max aggregation over the input."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    staged = df.crossJoin(F.broadcast(bounds))
    qcols = {
        f"__q_{c}": _quantize(
            c, F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    }
    staged = staged.withColumns(qcols)
    # static unroll: bit b of column i lands at position
    # b * ncols + i — bits*ncols shift/mask terms, all codegen'd
    n = len(cols)
    terms = None
    for i, c in enumerate(cols):
        q = f"__q_{c}"
        for b in range(bits):
            t = F.expr(
                f"shiftleft(shiftright({q}, {b}) & 1, {b * n + i})"
            )
            terms = t if terms is None else terms + t
    out = staged.withColumn("__z", terms.cast("long"))
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    drop += list(qcols)
    return out.drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 16,
    partitions: int | None = None,
) -> None:
    """Rewrite ``df`` to parquet tiled along the Z-curve of ``cols``:
    range-partition + sort within partitions on the interleaved key,
    key dropped from the output files."""
    keyed = zorder_key(df, cols, bits)
    if partitions:
        keyed = keyed.repartitionByRange(partitions, "__z")
    else:
        keyed = keyed.repartitionByRange("__z")
    (
        keyed.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
