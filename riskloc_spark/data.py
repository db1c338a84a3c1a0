"""Testdata loaders and deterministic RCA-frame derivations.

The driver's correctness harness hands us a scale-factor directory with
TPC-H-ish parquet tables. RCA algorithms need a frame with attribute
columns + ``real`` + ``predict``; we derive one deterministically from
``events`` (and a derived-measure variant) so the DuckDB oracle can build
the exact same frame in SQL.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Single-slice literal DataFrame.

    ``spark.createDataFrame(rows, schema)`` parallelizes the list into
    ``defaultParallelism`` pickled slices (32 on the bench box), so
    EVERY downstream action pays one Python-worker round trip per
    slice — a count of a 5-row probe frame measured 4.2s cold / 1.4s
    warm on local[32], and a ``coalesce(1)`` write pays the 32 round
    trips SERIALLY inside one task (~6s).  One slice makes any action
    on a literal frame a single Python task (~0.05-0.5s).  Semantics
    are identical — same rows, same schema, only the partitioning of
    a driver-local literal changes."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


# (sf_dir, name) -> inferred StructType.  Schema METADATA only — never
# rows, never results: footer inference costs a ~100 ms py4j/listing
# round trip per spark.read.parquet call (measured; an explicit-schema
# read is ~27 ms), and the bench pays it on every load_table of every
# query run.  The first call per table still infers from the parquet
# footer; later calls hand the recorded schema to the reader, which is
# exactly the explicit-schema discipline a production job uses.  Each
# call still returns a FRESH DataFrame (two load_table calls joined
# against each other keep distinct plan ids — no ambiguous-self-join
# hazard) and every action still scans the parquet input.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has been written both as TIMESTAMP(MICROS) (reads as a
        # timestamp type directly) and as TIMESTAMP(NANOS) (no Spark type —
        # read as long via nanosAsLong and downcast; sub-microsecond
        # resolution is never needed here). Handle both.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (sf_dir, name)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(f"{sf_dir}/{name}.parquet")
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCHEMA_CACHE[key] = df.schema
    if name == "events" and dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# --- RCA frame derivation -------------------------------------------------
#
# Leaf elements: (event_type, hr, ub) — event type x hour-of-day x a user
# bucket. real = observed sum(value); predict = a rate-based forecast
# (leaf row count x global mean value x 0.97), i.e. "every leaf behaves
# like the global average, minus a 3% bias". The bias keeps the global
# sums of real and predict apart — without it A == F by construction and
# the explanatory-power denominator (A-F) degenerates to float noise.
#
# Both this and the SQL twin in __spark_entry__.oracle_sql are pure
# aggregations: one shuffle on the 3 attribute keys; the global mean is a
# scalar agg broadcast back (no global window).

RCA_BIAS = 0.97

RCA_EVENTS_SQL = f"""
WITH base AS (
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
           CAST(user_id % 8 AS INT) AS ub,
           value
    FROM events
), stats AS (
    SELECT SUM(value) / COUNT(*) AS mean_value FROM base
)
SELECT event_type, hr, ub,
       SUM(value) AS "real",
       COUNT(*) * MAX(stats.mean_value) * {RCA_BIAS} AS predict
FROM base CROSS JOIN stats
GROUP BY event_type, hr, ub
"""


def rca_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RCA frame (attrs: event_type, hr, ub) from events.

    NOTE: no fan-out repartition here — reordering the float partial sums
    shifts the last bits of real/predict and breaks round-to-6-decimals
    parity with the DuckDB oracle (which sums in file order)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        (F.col("user_id") % 8).cast("int").alias("ub"),
        "value",
    )
    stats = base.agg((F.sum("value") / F.count(F.lit(1))).alias("mean_value"))
    return (
        base.crossJoin(F.broadcast(stats))
        .groupBy("event_type", "hr", "ub")
        .agg(
            F.sum("value").alias("real"),
            (F.count(F.lit(1)) * F.first("mean_value") * F.lit(RCA_BIAS)).alias(
                "predict"
            ),
        )
    )


RCA_ATTRIBUTES = ["event_type", "hr", "ub"]

# Derived-measure twin: KPI = a/b (value-per-event rate). predict_b gets
# a 2% inflation so the b-measure carries its own forecast error — the
# derived formulas degenerate otherwise.
RCA_DERIVED_BIAS_B = 1.02

RCA_EVENTS_DERIVED_SQL = f"""
WITH base AS (
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
           CAST(user_id % 8 AS INT) AS ub,
           value
    FROM events
), stats AS (
    SELECT SUM(value) / COUNT(*) AS mean_value FROM base
)
SELECT event_type, hr, ub,
       SUM(value) AS real_a,
       CAST(COUNT(*) AS DOUBLE) AS real_b,
       COUNT(*) * MAX(stats.mean_value) * {RCA_BIAS} AS predict_a,
       CAST(COUNT(*) AS DOUBLE) * {RCA_DERIVED_BIAS_B} AS predict_b,
       SUM(value) / CAST(COUNT(*) AS DOUBLE) AS "real",
       (COUNT(*) * MAX(stats.mean_value) * {RCA_BIAS})
           / (CAST(COUNT(*) AS DOUBLE) * {RCA_DERIVED_BIAS_B}) AS predict
FROM base CROSS JOIN stats
GROUP BY event_type, hr, ub
"""


def rca_events_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-measure RCA frame: a = value sum, b = event count; KPI =
    a/b. Same single-shuffle shape as rca_events (and the same no-fan-out
    note: float-sum order must match the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        (F.col("user_id") % 8).cast("int").alias("ub"),
        "value",
    )
    stats = base.agg((F.sum("value") / F.count(F.lit(1))).alias("mean_value"))
    agg = (
        base.crossJoin(F.broadcast(stats))
        .groupBy("event_type", "hr", "ub")
        .agg(
            F.sum("value").alias("real_a"),
            F.count(F.lit(1)).cast("double").alias("real_b"),
            (F.count(F.lit(1)) * F.first("mean_value") * F.lit(RCA_BIAS)).alias(
                "predict_a"
            ),
            (F.count(F.lit(1)).cast("double") * F.lit(RCA_DERIVED_BIAS_B)).alias(
                "predict_b"
            ),
        )
    )
    return agg.withColumn("real", F.col("real_a") / F.col("real_b")).withColumn(
        "predict", F.col("predict_a") / F.col("predict_b")
    )
