"""Declarative data-quality expectations: assert schema-level
invariants (non-null, unique, value domain, numeric range, regex
shape) over a table in ONE scan and publish the violations as an
audit table — the ingest-time gate a production pipeline runs before
promoting a snapshot (the "expectations" pattern popularized by the
Great Expectations / Deequ tools, re-expressed as plain column
algebra).

Rules are dicts:
    {"name": ..., "col": ..., "kind": "not_null"}
    {"kind": "unique"}                     # duplicate-row detector
    {"kind": "in_set", "values": [...]}    # categorical domain
    {"kind": "range", "min": x, "max": y}  # inclusive numeric bounds
    {"kind": "regex", "pattern": r"..."}   # string shape
``name`` defaults to "<col>_<kind>".  NULLs violate only
``not_null`` — domain/range/regex rules skip NULLs so each invariant
is reported once (the standard expectations convention).

Scale shape: every non-unique rule compiles to one
SUM(CASE WHEN violated) inside a SINGLE aggregation over one scan;
``unique`` rules add a COUNT(DISTINCT col) to the same aggregate
(Catalyst expands distinct aggregates into one extra exchange,
bounded by the distinct count).  Nothing collects; the audit is a
|rules|-row frame.

No reference counterpart (shaido987/riskloc is tabular RCA only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.data import local_rows_df

_KINDS = ("not_null", "unique", "in_set", "range", "regex")


def _violation(rule: dict):
    """Boolean column: this row violates the (non-unique) rule."""
    c = F.col(rule["col"])
    kind = rule["kind"]
    if kind == "not_null":
        return c.isNull()
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if kind == "range":
        cond = F.lit(False)
        if "min" in rule:
            cond = cond | (c < F.lit(rule["min"]))
        if "max" in rule:
            cond = cond | (c > F.lit(rule["max"]))
        return c.isNotNull() & cond
    if kind == "regex":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown expectation kind {kind!r}")


def _named(rule: dict) -> str:
    return rule.get("name") or f"{rule['col']}_{rule['kind']}"


def validate_expectations(
    df: DataFrame, rules: list[dict]
) -> DataFrame:
    """(rule, col, kind, n_rows, n_violations, violation_rate): the
    per-rule audit, every rule present (clean rules with 0 / 0.0) —
    gate a snapshot on ``n_violations == 0`` over the rules that
    must hold, keep the frame as the evidence.  For ``unique``,
    n_violations counts the EXTRA rows beyond one per value
    (n_rows_with_value - n_distinct; NULLs excluded — pair with
    not_null to forbid them)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    for r in rules:
        if r["kind"] not in _KINDS:
            raise ValueError(f"unknown expectation kind {r['kind']!r}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r["kind"] == "unique":
            c = F.col(r["col"])
            aggs.append(
                (
                    F.count(c) - F.countDistinct(c)
                ).alias(f"__v{i}")
            )
        else:
            aggs.append(
                F.sum(
                    F.when(_violation(r), 1).otherwise(0)
                ).alias(f"__v{i}")
            )
    row = df.agg(*aggs)
    spark = df.sparkSession
    meta = local_rows_df(spark, 
        [
            (i, _named(r), r["col"], r["kind"])
            for i, r in enumerate(rules)
        ],
        "idx int, rule string, col string, kind string",
    )
    long = row.select(
        F.col("__n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("idx"),
                        F.col(f"__v{i}").cast("long").alias("nv"),
                    )
                    for i in range(len(rules))
                ]
            )
        ).alias("v"),
    ).select(
        F.col("v.idx").alias("idx"),
        F.col("__n").cast("long").alias("n_rows"),
        F.coalesce(F.col("v.nv"), F.lit(0)).alias("n_violations"),
    )
    return meta.join(long, "idx").select(
        "rule",
        "col",
        "kind",
        "n_rows",
        "n_violations",
        F.when(F.col("n_rows") == 0, F.lit(0.0))
        .otherwise(F.col("n_violations") / F.col("n_rows"))
        .alias("violation_rate"),
    )


def expectation_failures(
    df: DataFrame,
    rules: list[dict],
    id_col: str,
    max_examples: int = 20,
) -> DataFrame:
    """(rule, id): up to ``max_examples`` DETERMINISTIC example rows
    per violated (non-unique) rule — the smallest ids, so two runs
    agree — for debugging what the audit counted.  Unique-rule
    examples are the duplicated values' extra ids."""
    from pyspark.sql.window import Window

    parts = []
    for r in rules:
        name = F.lit(_named(r)).alias("rule")
        if r["kind"] == "unique":
            c = F.col(r["col"])
            w = Window.partitionBy(r["col"]).orderBy(id_col)
            parts.append(
                df.filter(c.isNotNull())
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") > 1)
                .select(name, F.col(id_col).alias("id"))
            )
        else:
            parts.append(
                df.filter(_violation(r)).select(
                    name, F.col(id_col).alias("id")
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.partitionBy("rule").orderBy("id")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_examples)
        .drop("__rn")
    )
