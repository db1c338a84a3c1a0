"""RiskLoc: weighted-risk root cause localization.

Parity target: reference algorithms/riskloc.py:167-215 (search loop
:99-164, scores :50-72). Re-expressed Spark-first:

* The reference scores one element at a time with boolean masks — an
  O(#elements) sequence of full-frame passes. Here every element of a
  cuboid is scored in ONE ``groupBy(cuboid)`` pass: the low-risk group
  sums come from a window partitioned by the cuboid keys (same hash
  partitioning as the groupBy, so one shuffle total), and the element
  chosen is the max-EP row with risk >= threshold.
* The layer/iteration orchestration stays on the driver, but driver
  state is only O(#root-causes + #pruned-values) — never leaf data.
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.scores import (
    add_deviation_score,
    add_explanatory_power,
    add_partition,
    add_weight,
    get_cutoff,
)
from riskloc_spark.plans.cuboid import cuboids_of_layer


def _scalar(df: DataFrame, col) -> float:
    v = df.agg(col.alias("v")).first()["v"]
    return 0.0 if v is None else float(v)


def _score_cuboid(df_c: DataFrame, cuboid: list[str]) -> DataFrame:
    """Per-element riskloc scores for a whole cuboid in one shuffle.

    Returns one row per element with columns: cuboid attrs, ep, ep_z,
    part_sum, high, low, risk.
    """
    w = Window.partitionBy(*cuboid)
    valid = (F.col("real") != 0) & (F.col("predict") != 0)

    # low-risk needs a = predict * R/P with R,P sums over the element's
    # valid rows (ref riskloc.py:57-72); window gives them per-row.
    R = F.sum(F.when(valid, F.col("real"))).over(w)
    P = F.sum(F.when(valid, F.col("predict"))).over(w)
    a = F.col("predict") * R / P
    denom = a + F.col("real")
    d = F.when(denom == 0, F.lit(0.0)).otherwise(2.0 * (a - F.col("real")) / denom)

    df2 = df_c.withColumn("__absd", F.when(valid, F.abs(d))).withColumn(
        "__absdev", F.when(valid, F.abs(F.col("deviation")))
    )

    agg = df2.groupBy(*cuboid).agg(
        F.coalesce(F.sum(F.when(F.col("partition") == 1, F.col("weight"))), F.lit(0.0)).alias(
            "n_anom"
        ),
        F.coalesce(F.sum(F.when(F.col("partition") == 0, F.col("weight"))), F.lit(0.0)).alias(
            "n_norm"
        ),
        F.sum("ep").alias("ep"),
        F.sum("ep_z").alias("ep_z"),
        F.sum("partition").alias("part_sum"),
        F.avg("__absd").alias("w1"),
        F.avg("__absdev").alias("w2"),
    )

    high = F.col("n_anom") / (F.col("n_anom") + F.col("n_norm") + 1.0)
    low = F.when(
        F.col("w2").isNull() | (F.col("w2") == 0) | F.col("w1").isNull(), F.lit(0.0)
    ).otherwise(F.col("w1") / F.col("w2"))
    return agg.withColumn("high", high).withColumn("low", low).withColumn(
        "risk", F.col("high") - F.col("low")
    )


def _apply_pruning(
    df: DataFrame, cuboid: list[str], pruned: dict[tuple[str, ...], list] | None
) -> DataFrame:
    """Drop rows whose single-dim value was pruned (ref riskloc.py:75-86).

    Pruned sets only exist for layer-1 keys (max_layer=1), so exclusion is
    a per-dimension NOT IN — broadcast-friendly at scale (values list is
    bounded by the dimension's cardinality).
    """
    if pruned is None:
        return df
    for dim in cuboid:
        values = pruned.get((dim,))
        if values:
            df = df.filter(~F.col(dim).cast("string").isin(values))
    return df


_SEP = "\x1f"


def search_anomaly(
    df: DataFrame,
    attributes: list[str],
    pruned: dict | None,
    risk_threshold: float,
    adj_ep_threshold: float,
) -> tuple[dict[str, Any] | None, dict | None]:
    """One search pass (ref riskloc.py:99-164): first layer containing a
    root cause wins; within a layer the max-EP valid element wins (ties →
    earlier cuboid, matching the reference's strict-improvement scan).

    All cuboids of a layer are evaluated in ONE Spark job: each cuboid's
    per-element scores are reduced to its top candidate (window rank on
    EP) plus its prune rows, unioned, and collected together — the driver
    sees O(#cuboids + #pruned values) rows, never elements."""
    for layer in range(1, len(attributes) + 1):
        parts = []
        for idx, cuboid in enumerate(cuboids_of_layer(attributes, layer)):
            df_c = _apply_pruning(df, cuboid, pruned)
            scores = _score_cuboid(df_c, cuboid)
            elem = F.concat_ws(_SEP, *[F.col(d).cast("string") for d in cuboid])

            cand = (
                scores.filter(
                    (F.col("part_sum") > 0)
                    & (F.col("ep") > F.lit(adj_ep_threshold))
                    & (F.col("risk") >= F.lit(risk_threshold))
                )
                .withColumn(
                    "__rn",
                    F.row_number().over(
                        Window.partitionBy(F.lit(idx)).orderBy(F.col("ep").desc())
                    ),
                )
                .filter(F.col("__rn") == 1)
                .select(
                    F.lit(idx).alias("cuboid_idx"),
                    F.lit(False).alias("is_prune"),
                    elem.alias("element"),
                    "ep",
                    "high",
                    "low",
                    "risk",
                )
            )
            parts.append(cand)

            if pruned is not None and layer <= 1:
                # newly prunable values (ref riskloc.py:89-96)
                parts.append(
                    scores.filter(
                        (F.col("ep_z") < adj_ep_threshold) | (F.col("part_sum") == 0)
                    ).select(
                        F.lit(idx).alias("cuboid_idx"),
                        F.lit(True).alias("is_prune"),
                        elem.alias("element"),
                        F.lit(0.0).alias("ep"),
                        F.lit(0.0).alias("high"),
                        F.lit(0.0).alias("low"),
                        F.lit(0.0).alias("risk"),
                    )
                )

        from functools import reduce

        rows = reduce(lambda a, b: a.unionByName(b), parts).collect()
        cuboids = cuboids_of_layer(attributes, layer)

        if pruned is not None and layer <= 1:
            for r in rows:
                if r["is_prune"]:
                    pruned.setdefault(tuple(cuboids[r["cuboid_idx"]]), []).append(
                        r["element"]
                    )

        # reference scan order: cuboid order with strict EP improvement
        best: dict[str, Any] = {"ep_score": adj_ep_threshold}
        for r in sorted(
            (r for r in rows if not r["is_prune"]), key=lambda r: r["cuboid_idx"]
        ):
            if r["ep"] > best["ep_score"]:
                cuboid = cuboids[r["cuboid_idx"]]
                best = {
                    "elements": [tuple(r["element"].split(_SEP))],
                    "high risk score": r["high"],
                    "low risk score": r["low"],
                    "risk score": r["risk"],
                    "ep_score": r["ep"],
                    "layer": layer,
                    "cuboid": list(cuboid),
                }
        if "elements" in best:
            return best, pruned
    return None, pruned


def riskloc(
    df: DataFrame,
    attributes: list[str],
    risk_threshold: float = 0.5,
    pep_threshold: float = 0.02,
    n_remove: int = 5,
    remove_relative: bool = False,
    derived: bool = False,
    prune_elements: bool = True,
    max_iterations: int = 50,
) -> list[dict[str, Any]]:
    """Full RiskLoc (ref riskloc.py:167-215). Returns reference-shaped
    root-cause dicts."""
    df = add_explanatory_power(df, derived)
    df = add_deviation_score(df)

    cutoff = get_cutoff(df, n_remove, relative=remove_relative)
    df = add_partition(df, cutoff)
    df = add_weight(df, cutoff)

    anomaly_ep_sum = _scalar(
        df.filter(F.col("partition") == 1), F.sum("ep")
    )
    if anomaly_ep_sum < 0:
        df = df.withColumn("ep", -F.col("ep"))
        anomaly_ep_sum = -anomaly_ep_sum
    adj_ep_threshold = anomaly_ep_sum * pep_threshold

    df = df.withColumn("ep_z", F.when(F.col("ep") > 0, F.col("ep")).otherwise(F.lit(0.0)))
    base = df.persist()

    # found causes become an exclusion predicate over the ONE cached base
    # frame — lineage stays depth-1 across iterations (no cache churn)
    root_causes: list[dict[str, Any]] = []
    pruned: dict | None = {} if prune_elements else None
    current = base
    for it in range(max_iterations):
        # iteration 0 reuses the ep-sum computed above; later iterations
        # pay one scalar job (fused layer search follows immediately)
        if it > 0:
            anomaly_ep_sum = _scalar(
                current.filter(F.col("partition") == 1), F.sum("ep")
            )
        if anomaly_ep_sum < adj_ep_threshold:
            break

        root_cause, pruned = search_anomaly(
            current, attributes, pruned, risk_threshold, adj_ep_threshold
        )
        if root_cause is None:
            break
        root_causes.append(root_cause)

        cond = None
        for rc in root_causes:
            c = None
            for dim, val in zip(rc["cuboid"], rc["elements"][0]):
                eq = F.col(dim).cast("string") == F.lit(val)
                c = eq if c is None else (c & eq)
            cond = c if cond is None else (cond | c)
        current = base.filter(~cond)
    base.unpersist()
    return root_causes


def root_causes_to_df(
    spark: SparkSession, root_causes: list[dict[str, Any]]
) -> DataFrame:
    """Canonical string form ('d1=v1&d2=v2'), matching the reference's
    evaluation formatting (utils/evaluation.py:53-59)."""
    rows = []
    for rc in root_causes:
        for element in rc["elements"]:
            s = "&".join(
                sorted(f"{d}={v}" for d, v in zip(rc["cuboid"], element))
            )
            rows.append(
                (
                    s,
                    float(rc.get("risk score", 0.0)),
                    float(rc.get("ep_score", 0.0)),
                    int(rc["layer"]),
                )
            )
    return spark.createDataFrame(
        rows, "root_cause string, risk_score double, ep_score double, layer int"
    )


def riskloc_df(spark: SparkSession, df: DataFrame, attributes: list[str], **kwargs) -> DataFrame:
    return root_causes_to_df(spark, riskloc(df, attributes, **kwargs))
