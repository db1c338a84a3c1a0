"""Adtributor and recursive (reverse) Adtributor.

Parity: reference algorithms/adtributor.py:6-43 and
rev_rec_adtributor.py:6-74. Fully declarative: the per-dimension element
merge is a union of groupBy aggregates; candidate selection is a window
cumsum over surprise-ordered elements. No driver-side leaf data — only the
final (tiny) candidate sets are collected.
"""
from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.scores import add_explanatory_power, add_surprise


def merge_dimensions(df: DataFrame, dimensions: list[str], derived: bool) -> DataFrame:
    """Union of per-dimension element aggregates (ref adtributor.py:6-20).

    Output: element (string), dimension, and summed measures. Each groupBy
    is an independent shuffle on its own (low-cardinality) key — Spark runs
    the union branches in parallel stages.
    """
    measures = (
        ["real_a", "real_b", "predict_a", "predict_b"] if derived else ["real", "predict"]
    )
    parts = []
    for d in dimensions:
        agg = df.groupBy(F.col(d).cast("string").alias("element")).agg(
            *[F.sum(m).alias(m) for m in measures]
        )
        parts.append(agg.withColumn("dimension", F.lit(d)))
    elements = reduce(lambda a, b: a.unionByName(b), parts)
    if derived:
        elements = elements.withColumn(
            "predict", F.col("predict_a") / F.col("predict_b")
        ).withColumn("real", F.col("real_a") / F.col("real_b"))
    return elements


def _scored_elements(df: DataFrame, dimensions: list[str], derived: bool) -> DataFrame:
    elements = merge_dimensions(df, dimensions, derived)
    elements = add_explanatory_power(elements, derived)
    elements = add_surprise(elements, derived, merged_divide=len(dimensions))
    return elements


def adtributor_candidates(
    df: DataFrame,
    dimensions: list[str],
    teep: float = 0.1,
    tep: float = 0.1,
    derived: bool = False,
) -> DataFrame:
    """Declarative core of adtributor: the per-dimension candidate
    elements (surprise-ordered qualifying prefix until cum EP > tep), as a
    DataFrame — used directly by the oracle-checked query surface."""
    elements = _scored_elements(df, dimensions, derived)
    w_full = Window.partitionBy("dimension").orderBy(
        F.col("surprise").desc(), F.col("element").asc()
    )
    qual_ep = F.when(F.col("ep") > teep, F.col("ep")).otherwise(F.lit(0.0))
    ranked = (
        elements.withColumn("rn", F.row_number().over(w_full))
        .withColumn("cum_ep", F.sum(qual_ep).over(w_full))
    )
    w_dim = Window.partitionBy("dimension")
    ranked = ranked.withColumn(
        "stop_rn",
        F.min(
            F.when((F.col("ep") > teep) & (F.col("cum_ep") > tep), F.col("rn"))
        ).over(w_dim),
    )
    return ranked.filter(
        (F.col("rn") <= F.col("stop_rn")) & (F.col("ep") > teep)
    ).select("dimension", "element", "ep", "surprise")


def adtributor(
    df: DataFrame,
    dimensions: list[str],
    teep: float = 0.1,
    tep: float = 0.1,
    k: int = 3,
    derived: bool = False,
) -> list[dict[str, Any]]:
    """Reference adtributor.py:23-43. Per dimension: walk elements in
    surprise-desc order, accumulate EP of elements with ep > teep until the
    cumulative EP exceeds tep; that prefix is the candidate."""
    elements = _scored_elements(df, dimensions, derived)

    # Walk elements in surprise-desc order. Note the reference's asymmetry
    # (adtributor.py:32-37): cum_ep accumulates only qualifying (ep > teep)
    # elements, but the candidate's surprise is the cumsum over ALL
    # elements up to the stop row (label slice of the full sorted frame).
    w_full = Window.partitionBy("dimension").orderBy(
        F.col("surprise").desc(), F.col("element").asc()
    )
    qual_ep = F.when(F.col("ep") > teep, F.col("ep")).otherwise(F.lit(0.0))
    ranked = (
        elements.withColumn("rn", F.row_number().over(w_full))
        .withColumn("cum_ep", F.sum(qual_ep).over(w_full))
        .withColumn("cum_surprise", F.sum("surprise").over(w_full))
    )
    w_dim = Window.partitionBy("dimension")
    ranked = ranked.withColumn(
        "stop_rn",
        F.min(
            F.when((F.col("ep") > teep) & (F.col("cum_ep") > tep), F.col("rn"))
        ).over(w_dim),
    )
    picked = ranked.filter(F.col("rn") <= F.col("stop_rn"))

    cands = (
        picked.groupBy("dimension")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("ep") > teep, F.struct("rn", "element"))
                )
            ).alias("ordered"),
            F.max(
                F.when(F.col("rn") == F.col("stop_rn"), F.col("cum_ep"))
            ).alias("explanatory_power"),
            F.max(
                F.when(F.col("rn") == F.col("stop_rn"), F.col("cum_surprise"))
            ).alias("surprise"),
        )
        .orderBy(F.col("surprise").desc())
        .limit(k)
        .collect()
    )
    return [
        {
            "elements": [e["element"] for e in row["ordered"]],
            "explanatory_power": row["explanatory_power"],
            "surprise": row["surprise"],
            "dimension": row["dimension"],
        }
        for row in cands
    ]


def rev_adtributor_candidates(
    df: DataFrame,
    dimensions: list[str],
    teep: float = 0.1,
    k: int = 3,
    derived: bool = False,
) -> DataFrame:
    """Declarative core of rev_adtributor (ref rev_rec_adtributor.py:15-34)
    as a DataFrame: candidate elements (ep > teep) of the top-k dimensions
    whose candidates form a strict subset of the dimension's elements.

    Dimension stats aggregate to #dims rows (tiny), so the top-k pick is a
    sorted limit and the fan-back to elements is a broadcast join — no
    second shuffle of the element frame."""
    elements = _scored_elements(df, dimensions, derived)
    dim_stats = (
        elements.groupBy("dimension")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("ep") > teep, 1).otherwise(0)).alias("n_cand"),
            F.sum(F.when(F.col("ep") > teep, F.col("surprise"))).alias("dim_surprise"),
        )
        .filter((F.col("n_cand") > 0) & (F.col("n_cand") < F.col("n_total")))
        .orderBy(F.col("dim_surprise").desc(), F.col("dimension").asc())
        .limit(k)
    )
    return elements.filter(F.col("ep") > teep).join(
        F.broadcast(dim_stats.select("dimension")), "dimension"
    ).select("dimension", "element", "ep", "surprise")


def rev_adtributor(
    df: DataFrame,
    dimensions: list[str],
    teep: float = 0.1,
    k: int = 3,
    derived: bool = False,
) -> list[dict[str, Any]]:
    """Reference rev_rec_adtributor.py:15-34: all elements with ep > teep
    form the candidate set, kept only if a strict subset of the dimension's
    elements."""
    elements = _scored_elements(df, dimensions, derived)
    agg = (
        elements.groupBy("dimension")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("ep") > teep, 1).otherwise(0)).alias("n_cand"),
            F.sum(F.when(F.col("ep") > teep, F.col("ep"))).alias("explanatory_power"),
            F.sum(F.when(F.col("ep") > teep, F.col("surprise"))).alias("surprise"),
            F.sort_array(
                F.collect_list(F.when(F.col("ep") > teep, F.col("element")))
            ).alias("elements"),
        )
        .filter((F.col("n_cand") > 0) & (F.col("n_cand") < F.col("n_total")))
        .orderBy(F.col("surprise").desc())
        .limit(k)
        .collect()
    )
    return [
        {
            "elements": list(row["elements"]),
            "explanatory_power": row["explanatory_power"],
            "surprise": row["surprise"],
            "dimension": row["dimension"],
        }
        for row in agg
    ]


def rev_rec_adtributor(
    df: DataFrame,
    dimensions: list[str],
    teep: float = 0.1,
    k: int = 3,
    derived: bool = False,
) -> list[dict[str, Any]]:
    """Recursive refinement (ref rev_rec_adtributor.py:37-74): each
    candidate element is drilled into over the remaining dimensions; if
    every child yields a deeper explanation, the refined set replaces the
    parent. Driver recursion; each level's work is declarative."""
    explanatory_set = rev_adtributor(df, dimensions, teep, k, derived)

    new_explanatory_set: list[dict[str, Any]] = []
    for cand_set in explanatory_set:
        cand_set["elements"] = [[e] for e in cand_set["elements"]]
        cand_set["cuboid"] = [cand_set["dimension"]]
        remaining = sorted(set(dimensions) - {cand_set["dimension"]})

        refined: list[dict[str, Any]] = []
        if remaining:
            for element in cand_set["elements"]:
                sub = df.filter(
                    F.col(cand_set["dimension"]).cast("string") == element[0]
                )
                child = rev_rec_adtributor(sub, remaining, teep, k, derived)
                if not child:
                    refined = []
                    break
                for es in child:
                    es["elements"] = [sorted(e + element) for e in es["elements"]]
                    es["explanatory_power"] = (
                        es["explanatory_power"] * cand_set["explanatory_power"]
                    )
                    es["cuboid"] = sorted(cand_set["cuboid"] + es["cuboid"])
                refined.extend(child)

        if refined:
            new_explanatory_set.extend(refined)
        else:
            new_explanatory_set.append(cand_set)

    # dedupe (ref rev_rec_adtributor.py:6-12)
    seen: dict[str, dict[str, Any]] = {}
    for cs in new_explanatory_set:
        key = "".join(
            "".join(e) if isinstance(e, list) else e for e in cs["elements"]
        )
        seen.setdefault(key, cs)
    return list(seen.values())
