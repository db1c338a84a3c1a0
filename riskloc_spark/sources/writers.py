"""Scale-path writers: bucketed and partitioned parquet layouts.

At 100 TB the dominant costs are the shuffle before every big join and
the scan of partitions a query never needed. These writers persist the
two layouts that remove them:

* ``write_bucketed`` — hash-bucketed (+ sorted) external parquet table.
  Two tables bucketed on the same key with the same bucket count join
  WITHOUT an exchange on either side (Spark reads bucket i of A and
  bucket i of B directly); repeated joins/aggregations on the bucket
  key amortize the one-time shuffle paid at write. The plan guarantee
  is locked by tests/test_writers.py: a self-equi-join of two bucketed
  tables has ZERO Exchange operators.
* ``write_partitioned`` — directory-partitioned parquet. Equality /
  IN filters on partition columns prune entire directories at planning
  time (the scan's ``PartitionFilters``), so a day-slice query over a
  year of data reads 1/365th of the files. Also plan-locked.

Both emit standard parquet readable by any engine (the DuckDB oracle
included) — no engine lock-in, no custom metadata beyond the catalog
entry for the bucketed case (bucketing metadata lives in the Spark
catalog; ``read_bucketed`` goes through the table name, a plain path
read sees ordinary parquet and simply loses the no-shuffle property).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
    prepartition: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table. ``path`` makes it an EXTERNAL table at that location;
    without it the session warehouse dir is used. ``num_buckets``
    should be sized so one bucket of the largest co-located join side
    fits an executor core's working memory at target scale (buckets
    are the unit of join parallelism — too few limits cores, too many
    makes small files).

    ``prepartition`` repartitions on the bucket columns before writing.
    Without it, every write task emits a file for every bucket it sees
    — T tasks x B buckets small files, each bucket a concatenation of
    per-task sorted runs the reader cannot treat as sorted. With it,
    ``repartition(num_buckets, cols)`` uses the same Murmur3 hash as
    the bucket assignment, so each bucket is exactly ONE sorted file:
    minimum file count, and the scan preserves the sort order. This IS
    the pay-once shuffle; disable only when the input is already
    partitioned compatibly."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    if prepartition:
        from pyspark.sql import functions as F

        df = df.repartition(num_buckets, *[F.col(c) for c in cols])
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table BY NAME — the catalog carries the bucket
    spec, which is what lets the planner drop the join exchange. A
    plain ``spark.read.parquet(path)`` of the same files works but
    plans as an unbucketed scan."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as directory-partitioned parquet. Partition
    columns should be low-cardinality query-filter columns (day,
    source, event_type) — each distinct combination becomes a
    directory, and filters on them prune at planning time."""
    cols = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    df.write.mode(mode).partitionBy(*cols).parquet(path)
