"""RCA case readers.

Parity: reference utils/run_utils.py:60-92 (plain + derived a/b pairs)
and utils/robustspot_data_utils.py:6-64 (RobustSpot minute-grain format).

Spark-first notes:
* CSVs are read with header-only schema (all strings), then measures are
  cast explicitly — never ``inferSchema`` (a full extra pass at scale).
* The derived a/b merge is a join on the attribute columns; at scale both
  sides hash-partition on the same key so it is a single co-located
  shuffle each.
* The RobustSpot forecast (mean of the trailing ``predict_periods``
  minutes per leaf) is a groupBy + join — the reference iterates rows on
  the driver (robustspot_data_utils.py:34-40); here it is one aggregation
  regardless of leaf count.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEASURES = ("real", "predict")


def _attributes(df: DataFrame, drop: tuple[str, ...]) -> list[str]:
    return sorted(c for c in df.columns if c not in drop)


def read_rca_csv(spark: SparkSession, path: str) -> tuple[DataFrame, list[str]]:
    """Plain format: attribute columns + real + predict
    (ref run_utils.py:88-90). Returns (frame, attributes)."""
    df = spark.read.option("header", True).csv(path)
    attrs = _attributes(df, MEASURES)
    df = df.select(
        *attrs,
        F.col("real").cast("double").alias("real"),
        F.col("predict").cast("double").alias("predict"),
    )
    return df, attrs


def read_rca_csv_derived(
    spark: SparkSession, path_a: str, path_b: str
) -> tuple[DataFrame, list[str]]:
    """Derived format: '<file>.a.csv' + '<file>.b.csv' joined on the
    attributes; KPI = a/b with NaN->0 (ref run_utils.py:75-86)."""
    df_a = spark.read.option("header", True).csv(path_a)
    attrs = _attributes(df_a, MEASURES)
    df_a = df_a.select(
        *attrs,
        F.col("real").cast("double").alias("real_a"),
        F.col("predict").cast("double").alias("predict_a"),
    )
    df_b = spark.read.option("header", True).csv(path_b).select(
        *attrs,
        F.col("real").cast("double").alias("real_b"),
        F.col("predict").cast("double").alias("predict_b"),
    )
    df = df_a.join(df_b, on=attrs, how="inner")
    ratio = lambda a, b: F.when(  # noqa: E731
        F.col(b) != 0, F.col(a) / F.col(b)
    ).otherwise(F.lit(0.0))
    df = df.withColumn("real", ratio("real_a", "real_b")).withColumn(
        "predict", ratio("predict_a", "predict_b")
    )
    return df, attrs


def read_robustspot_csv(
    spark: SparkSession,
    path: str,
    timestamp: int,
    predict_periods: int = 4,
) -> tuple[DataFrame, list[str]]:
    """RobustSpot minute-grain format: columns
    ``min,<attrs...>,value,cnt`` (ref robustspot_data_utils.py:6-64).

    value is flipped to failures (cnt - value); the forecast for the
    anomalous ``timestamp`` is the per-leaf mean of the trailing
    ``predict_periods`` minutes. Output matches the derived format:
    attrs + real/predict (failure rate) + real_a/real_b/predict_a/
    predict_b."""
    raw = spark.read.option("header", True).csv(path)
    attrs = _attributes(raw, ("min", "value", "cnt"))
    base = raw.select(
        *attrs,
        F.col("min").cast("long").alias("min"),
        (F.col("cnt").cast("double") - F.col("value").cast("double")).alias("value"),
        F.col("cnt").cast("double").alias("cnt"),
    ).withColumn(
        "k_real",
        F.when(F.col("cnt") != 0, F.col("value") / F.col("cnt")).otherwise(F.lit(0.0)),
    )

    history_times = [timestamp - i * 60 for i in range(1, predict_periods + 1)]
    hist = (
        base.filter(F.col("min").isin(history_times))
        .groupBy(*attrs)
        .agg(
            F.avg("value").alias("predict_a"),
            F.avg("cnt").alias("predict_b"),
            F.avg("k_real").alias("predict"),
        )
    )
    cur = base.filter(F.col("min") == timestamp).select(
        *attrs,
        F.col("value").alias("real_a"),
        F.col("cnt").alias("real_b"),
        F.col("k_real").alias("real"),
    )
    df = cur.join(hist, on=attrs, how="left").na.fill(
        {"predict_a": 0.0, "predict_b": 0.0, "predict": 0.0}
    )
    return df.select(
        *attrs, "real", "predict", "real_a", "predict_a", "real_b", "predict_b"
    ), attrs


def read_jsonl(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Read newline-delimited JSON (the interchange format of LLM
    training pipelines). ``schema`` (DDL string or StructType) should
    be supplied in production: without it Spark runs a full inference
    pass over the data before the real scan — fine for exploration,
    a wasted corpus read at 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None, mode: str = "overwrite"
) -> None:
    """Write newline-delimited JSON shards (one file per partition —
    repartition first to control shard count/size). ``compression``:
    e.g. 'gzip' / 'zstd' for shipping; None for local interchange.
    JSON is a lossy container for some Spark types (timestamps
    stringify, binary base64s) — this sink is for TEXT corpus frames;
    columnar data stays in parquet."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
