"""Adtributor and recursive (reverse) Adtributor.

Parity: reference algorithms/adtributor.py:6-43 and
rev_rec_adtributor.py:6-74. Fully declarative: the per-dimension element
merge is a union of groupBy aggregates; candidate selection is a window
cumsum over surprise-ordered elements. No driver-side leaf data — only the
final (tiny) candidate sets are collected.
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.scores import add_explanatory_power, add_surprise


def merge_dimensions(df: DataFrame, dimensions: list[str], derived: bool) -> DataFrame:
    """Per-dimension element aggregates (ref adtributor.py:6-20) as ONE
    explode + ONE groupBy: each row fans out to a (dimension, element)
    struct per dimension, so the base frame is scanned once — the former
    per-dimension union re-derived the whole upstream lineage (for the
    RCA frame: the events aggregation) once per dimension.

    Output: element (string), summed measures, dimension.
    """
    measures = (
        ["real_a", "real_b", "predict_a", "predict_b"] if derived else ["real", "predict"]
    )
    structs = [
        F.struct(
            F.lit(d).alias("dimension"),
            F.coalesce(F.col(d).cast("string"), F.lit("None")).alias("element"),
        )
        for d in dimensions
    ]
    elements = (
        df.select(F.explode(F.array(*structs)).alias("de"), *measures)
        .groupBy(
            F.col("de.dimension").alias("dimension"),
            F.col("de.element").alias("element"),
        )
        .agg(*[F.sum(m).alias(m) for m in measures])
        .select("element", *measures, "dimension")
    )
    if derived:
        elements = elements.withColumn(
            "predict", F.col("predict_a") / F.col("predict_b")
        ).withColumn("real", F.col("real_a") / F.col("real_b"))
    return elements


def _scored_elements(df: DataFrame, dimensions: list[str], derived: bool) -> DataFrame:
    # checkpoint: the EP and surprise scalar-total subqueries plus the
    # main frame would each re-derive the merge (and its whole upstream
    # lineage) otherwise — measured 24 base-table scans for the plain
    # adtributor element query before. The frame is one row per
    # (dimension, element).  Lazy localCheckpoint rather than persist
    # (r16): a lazy result frame has no unpersist hook, so a
    # CacheManager entry would leak for the session, and the truncated
    # lineage keeps every consumer's plan element-sized
    # (ContextCleaner reclaims the checkpoint once the frame is GC'd —
    # the evaluation.py / trigram_lm_scores pattern).
    from riskloc_spark.operators.dedup import reuse_checkpoint

    elements = reuse_checkpoint(merge_dimensions(df, dimensions, derived))
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
        .orderBy(F.col("surprise").desc(), F.col("dimension").asc())
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


def _refine_and_dedupe(explanatory_set, dimensions, make_child):
    """Shared recursion body of rev_rec_adtributor (ref
    rev_rec_adtributor.py:37-74): drill each candidate element into the
    remaining dimensions via ``make_child(cand_set, element, remaining)``;
    a refinement replaces its parent only if EVERY element refines."""
    new_explanatory_set: list[dict[str, Any]] = []
    for cand_set in explanatory_set:
        cand_set["elements"] = [[e] for e in cand_set["elements"]]
        cand_set["cuboid"] = [cand_set["dimension"]]
        remaining = sorted(set(dimensions) - {cand_set["dimension"]})

        refined: list[dict[str, Any]] = []
        if remaining:
            for element in cand_set["elements"]:
                child = make_child(cand_set, element, remaining)
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


# --------------------------------------------------------------------------
# pandas mirror of the recursive search (adaptive driver fast-path, same
# pattern as riskloc/autoroot/squeeze): the recursion launches a full
# element aggregation per candidate element per depth — dozens of tiny
# sequential Spark jobs. When the leaf frame is driver-sized, the whole
# recursion runs vectorized locally; parity-tested vs the distributed path.
# --------------------------------------------------------------------------

def _score_element_frame(el, n_dims: int, derived: bool):
    """EP + surprise (merged_divide=n_dims) over a merged element frame
    with summed measures — the scoring half of _scored_elements, shared
    by the pandas fast-path and the fused distributed recursion."""
    import numpy as np

    if derived:
        el["predict"] = el["predict_a"] / el["predict_b"]
        el["real"] = el["real_a"] / el["real_b"]
        Fa, Fb = el["predict_a"].sum(), el["predict_b"].sum()
        n = (el["real_a"] - el["predict_a"]) * Fb - (el["real_b"] - el["predict_b"]) * Fa
        d_ = Fb * (Fb + el["real_b"] - el["predict_b"])
        ep = n / d_
        el["ep"] = ep / ep.sum()
    else:
        A, Ff = el["real"].sum(), el["predict"].sum()
        el["ep"] = (el["real"] - el["predict"]) / (A - Ff)

    def surprise_term(real_col, predict_col, F_tot, A_tot):
        p = el[predict_col] / (F_tot / n_dims)
        q = el[real_col] / (A_tot / n_dims)
        with np.errstate(divide="ignore", invalid="ignore"):
            p_term = np.where(
                (p == 0) | (p + q == 0), 0.0, p * np.log(2.0 * p / (p + q))
            )
            q_term = np.where(
                (q == 0) | (p + q == 0), 0.0, q * np.log(2.0 * q / (p + q))
            )
        return 0.5 * (p_term + q_term)

    if derived:
        el["surprise"] = surprise_term(
            "real_a", "predict_a", el["predict_a"].sum(), el["real_a"].sum()
        ) + surprise_term(
            "real_b", "predict_b", el["predict_b"].sum(), el["real_b"].sum()
        )
    else:
        el["surprise"] = surprise_term("real", "predict", Ff, A)
    return el


def _scored_elements_pd(pdf, dimensions: list[str], derived: bool):
    """pandas mirror of _scored_elements (merge_dimensions + EP + surprise
    with merged_divide=len(dimensions)) — same formulas and guards."""
    import pandas as pd

    measures = (
        ["real_a", "real_b", "predict_a", "predict_b"] if derived else ["real", "predict"]
    )
    parts = []
    for d in dimensions:
        g = (
            pdf.groupby(pdf[d].astype(str), sort=False)[measures]
            .sum()
            .reset_index(names="element")
        )
        g["dimension"] = d
        parts.append(g)
    el = pd.concat(parts, ignore_index=True)
    return _score_element_frame(el, len(dimensions), derived)


def _rev_candidates_from_elements(el, dimensions, teep, k):
    """rev_adtributor candidate selection over a scored element frame:
    ep > teep, strict subset of the dimension's elements, top-k dims by
    candidate surprise (dimension-asc tiebreak)."""
    causes = []
    for dim in dimensions:
        g = el[el["dimension"] == dim]
        cand = g[g["ep"] > teep]
        if len(cand) == 0 or len(cand) >= len(g):
            continue
        causes.append(
            {
                "elements": sorted(cand["element"]),
                "explanatory_power": float(cand["ep"].sum()),
                "surprise": float(cand["surprise"].sum()),
                "dimension": dim,
            }
        )
    causes.sort(key=lambda c: (-c["surprise"], c["dimension"]))
    return causes[:k]


def _rev_adtributor_pd(pdf, dimensions, teep, k, derived):
    el = _scored_elements_pd(pdf, dimensions, derived)
    return _rev_candidates_from_elements(el, dimensions, teep, k)


def _rev_rec_adtributor_pd(pdf, dimensions, teep, k, derived):
    explanatory_set = _rev_adtributor_pd(pdf, dimensions, teep, k, derived)

    def make_child(cand_set, element, remaining):
        sub = pdf[pdf[cand_set["dimension"]].astype(str) == element[0]]
        return _rev_rec_adtributor_pd(sub, remaining, teep, k, derived)

    return _refine_and_dedupe(explanatory_set, dimensions, make_child)


def _rev_rec_distributed_fused(
    df, dimensions, teep, k, derived, max_candidates_per_dim: int = 10_000
):
    """Distributed rev_rec_adtributor with ONE explode job per recursion
    DEPTH (not per candidate element): every live branch's sub-frame
    element sums are computed together — each row fans out to one
    (branch, dim, value) struct per matching branch context. EP and
    surprise are scored DISTRIBUTED (window sums per branch, mirroring
    _score_element_frame), the ``ep > teep`` candidate filter applies
    before any exchange to the driver, and a rank window caps the
    collect at ``max_candidates_per_dim`` rows per (branch, dimension) —
    so a user-id-like attribute with millions of elements collects at
    most the cap, never the cardinality. Per-candidate-set EP/surprise
    sums and the strict-subset counts come from exact window aggregates
    over the FULL (pre-cap) candidate set, so the cap can only truncate
    a pathological candidate *list* (> cap elements above teep), never
    skew the scores; truncation drops the lowest-EP elements.

    The driver then replays the reference's refine/merge semantics over
    the collected tree. Jobs = recursion depth, versus
    O(k * elements^depth) sequential aggregations before."""
    import copy

    measures = (
        ["real_a", "real_b", "predict_a", "predict_b"] if derived else ["real", "predict"]
    )

    # node: (id, context [(dim, val), ...], dims list)
    nodes = {0: ([], sorted(dimensions))}
    computed: dict[int, list[dict[str, Any]]] = {}
    children: dict[tuple[int, str, str], int] = {}
    level = [0]
    next_id = 1

    while level:
        structs = []
        for nid in level:
            ctx, dims = nodes[nid]
            pred = None
            for d, v in ctx:
                eq = F.coalesce(
                    F.col(d).cast("string"), F.lit("None")
                ) == F.lit(v)
                pred = eq if pred is None else (pred & eq)
            for d in dims:
                s = F.struct(
                    F.lit(nid).alias("nid"),
                    F.lit(d).alias("dim"),
                    F.coalesce(
                        F.col(d).cast("string"), F.lit("None")
                    ).alias("element"),
                )
                structs.append(s if pred is None else F.when(pred, s))

        el = (
            df.select(
                F.explode(F.array(*structs)).alias("ce"),
                *[F.col(m).cast("double").alias(m) for m in measures],
            )
            .filter(F.col("ce").isNotNull())
            .groupBy("ce.nid", "ce.dim", "ce.element")
            .agg(*[F.sum(m).alias(m) for m in measures])
            .select(
                F.col("nid"), F.col("dim"), F.col("element"), *measures
            )
        )

        # distributed mirror of _score_element_frame: per-branch totals
        # via window sums (the old path collected the whole element frame
        # and scored in pandas — unbounded for high-cardinality dims)
        w_nid = Window.partitionBy("nid")
        w_nd = Window.partitionBy("nid", "dim")
        # n_dims varies per branch; known on the driver -> literal map
        nd_map = F.create_map(
            *[
                lit
                for nid in level
                for lit in (F.lit(nid), F.lit(float(len(nodes[nid][1]))))
            ]
        )
        nd = nd_map[F.col("nid")]

        def sterm(rc, pc, Ftot, Atot):
            p = F.col(pc) / (Ftot / nd)
            q = F.col(rc) / (Atot / nd)
            pt = F.when((p == 0) | (p + q == 0), F.lit(0.0)).otherwise(
                p * F.log(2.0 * p / (p + q))
            )
            qt = F.when((q == 0) | (p + q == 0), F.lit(0.0)).otherwise(
                q * F.log(2.0 * q / (p + q))
            )
            return 0.5 * (pt + qt)

        if derived:
            Fa = F.sum("predict_a").over(w_nid)
            Fb = F.sum("predict_b").over(w_nid)
            Aa = F.sum("real_a").over(w_nid)
            Ab = F.sum("real_b").over(w_nid)
            n_ = (F.col("real_a") - F.col("predict_a")) * Fb - (
                F.col("real_b") - F.col("predict_b")
            ) * Fa
            d_ = Fb * (Fb + F.col("real_b") - F.col("predict_b"))
            el = el.withColumn("__ept", n_ / d_)
            el = el.withColumn(
                "ep", F.col("__ept") / F.sum("__ept").over(w_nid)
            )
            surprise = sterm("real_a", "predict_a", Fa, Aa) + sterm(
                "real_b", "predict_b", Fb, Ab
            )
        else:
            A = F.sum("real").over(w_nid)
            Ff = F.sum("predict").over(w_nid)
            el = el.withColumn(
                "ep", (F.col("real") - F.col("predict")) / (A - Ff)
            )
            surprise = sterm("real", "predict", Ff, A)
        el = el.withColumn("surprise", surprise).withColumn(
            "__ng", F.count(F.lit(1)).over(w_nd)
        )

        cand = (
            el.filter(F.col("ep") > teep)
            .withColumn("__ncand", F.count(F.lit(1)).over(w_nd))
            .withColumn("__ep_sum", F.sum("ep").over(w_nd))
            .withColumn("__sur_sum", F.sum("surprise").over(w_nd))
        )
        w_rank = Window.partitionBy("nid", "dim").orderBy(
            F.col("ep").desc(), F.col("element").asc()
        )
        rows = (
            cand.withColumn("__rn", F.row_number().over(w_rank))
            .filter(F.col("__rn") <= max_candidates_per_dim)
            .select(
                "nid", "dim", "element", "__ng", "__ncand",
                "__ep_sum", "__sur_sum",
            )
            .collect()
        )

        by_nd: dict[tuple[int, str], list] = {}
        for r in rows:
            by_nd.setdefault((r["nid"], r["dim"]), []).append(r)
        new_level = []
        for nid in level:
            ctx, dims = nodes[nid]
            causes = []
            for dim in dims:
                rs = by_nd.get((nid, dim))
                if not rs:
                    continue
                r0 = rs[0]
                # candidate set must be a strict subset of the dimension's
                # elements (counts are exact pre-cap window aggregates)
                if r0["__ncand"] >= r0["__ng"]:
                    continue
                causes.append(
                    {
                        "elements": sorted(r["element"] for r in rs),
                        "explanatory_power": float(r0["__ep_sum"]),
                        "surprise": float(r0["__sur_sum"]),
                        "dimension": dim,
                    }
                )
            causes.sort(key=lambda c: (-c["surprise"], c["dimension"]))
            cands = causes[:k]
            computed[nid] = cands
            for cand_set in cands:
                remaining = sorted(set(dims) - {cand_set["dimension"]})
                if not remaining:
                    continue
                for element in cand_set["elements"]:
                    cid = next_id
                    next_id += 1
                    nodes[cid] = (
                        ctx + [(cand_set["dimension"], element)], remaining
                    )
                    children[(nid, cand_set["dimension"], element)] = cid
                    new_level.append(cid)
        level = new_level

    def build(nid: int) -> list[dict[str, Any]]:
        ctx, dims = nodes[nid]
        expl = copy.deepcopy(computed[nid])

        def make_child(cand_set, element, remaining):
            cid = children.get((nid, cand_set["dimension"], element[0]))
            return build(cid) if cid is not None else []

        return _refine_and_dedupe(expl, dims, make_child)

    return build(0)


def rev_rec_adtributor(
    df: DataFrame,
    dimensions: list[str],
    teep: float = 0.1,
    k: int = 3,
    derived: bool = False,
    driver_rows: int | None = 200_000,
    max_candidates_per_dim: int = 10_000,
) -> list[dict[str, Any]]:
    """Recursive refinement (ref rev_rec_adtributor.py:37-74): each
    candidate element is drilled into over the remaining dimensions; if
    every child yields a deeper explanation, the refined set replaces the
    parent.

    Adaptive like riskloc: when the leaf frame is driver-sized (cheap
    limit-probe fused with the collect), the whole recursion runs
    vectorized on pandas. ``driver_rows=None`` forces the distributed
    path, where each recursion DEPTH is one fused explode job across all
    live branches (_rev_rec_distributed_fused). Both paths share the
    recursion body (_refine_and_dedupe) and the candidate-selection /
    scoring code, and are parity-tested."""
    if driver_rows is not None:
        measures = (
            ["real_a", "real_b", "predict_a", "predict_b"]
            if derived
            else ["real", "predict"]
        )
        sel = df.select(
            *[F.coalesce(F.col(a).cast("string"), F.lit("None")).alias(a)
              for a in dimensions],
            *[F.col(m).cast("double").alias(m) for m in measures],
        )
        pdf = sel.limit(driver_rows + 1).toPandas()
        if len(pdf) <= driver_rows:
            return _rev_rec_adtributor_pd(pdf, dimensions, teep, k, derived)

    return _rev_rec_distributed_fused(
        df, dimensions, teep, k, derived,
        max_candidates_per_dim=max_candidates_per_dim,
    )
