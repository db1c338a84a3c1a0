"""AutoRoot: KDE deviation clustering + per-cluster cuboid search (NPS).

Parity: reference algorithms/autoroot.py. Spark-first split of labor:

* deviation scoring + relevance filter: distributed column algebra;
* 1-D KDE (scipy gaussian_kde, Silverman) is fitted on the driver from
  the (bounded, optionally sampled) deviation values of relevant leaves —
  the fit is O(sample), assignment back is a distributed WHEN-chain over
  the handful of cluster boundaries;
* NPS scoring: the reference loops splits and scans the full frame per
  split; here ALL elements of a cuboid are scored in one pass from
  per-element sums (the nan_to_num guards of the reference are explicit
  WHEN guards), and only per-cuboid winners reach the driver.
"""
from __future__ import annotations

import math
from typing import Any

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.scores import add_deviation_score
from riskloc_spark.plans.cuboid import cuboids_of_layer


def kde_boundaries(values: np.ndarray) -> list[float]:
    """Cluster boundaries: local minima of a Silverman-bandwidth gaussian
    KDE evaluated on 400 points of [-2,2] (ref autoroot.py:30-47).
    Returns the 'ends' list in descending order (inf first).

    Implemented in numpy (scipy is not available in this environment):
    Silverman factor for 1-D is (3n/4)^(-1/5), scaled by the sample std
    (ddof=1) — the same bandwidth scipy's gaussian_kde(bw='silverman')
    uses; minima are strict (e[i-1] > e[i] < e[i+1]), matching
    scipy.signal.argrelextrema(e, np.less)."""
    if len(np.unique(values)) == 1:
        return [float("inf")]
    n = len(values)
    sigma = values.std(ddof=1)
    h = sigma * (3.0 * n / 4.0) ** (-1.0 / 5.0)
    s = np.linspace(-2, 2, 400)
    # density at grid points: mean of gaussian kernels (vectorized n x 400)
    z = (s[None, :] - values[:, None]) / h
    e = np.exp(-0.5 * z * z).mean(axis=0) / (h * math.sqrt(2 * math.pi))
    interior = np.arange(1, len(s) - 1)
    mi = interior[(e[interior] < e[interior - 1]) & (e[interior] < e[interior + 1])]
    return sorted(np.concatenate((s[mi], [np.inf])).tolist(), reverse=True)


def assign_clusters(df: DataFrame, ends: list[float]) -> DataFrame:
    """cluster i = index of the last end (descending) with deviation <= end
    — i.e. the reference's repeated overwrite loop, as one expression."""
    # walk descending like the reference; later (smaller) ends overwrite,
    # so the FINAL value is the max i with deviation <= end
    expr = F.lit(None).cast("int")
    for i, end in enumerate(ends):
        expr = F.when(F.col("deviation") <= F.lit(end), F.lit(i)).otherwise(expr)
    return df.withColumn("cluster", expr)


def _nps_terms(df: DataFrame, cuboid: list[str]) -> DataFrame:
    """Per-element NPS building blocks over the FULL frame:
    n_full, Ap_e = sum nan0(|v - f*Ve/Fe| / v), Bp_e = sum nan0(|v-f| / v).
    """
    w = Window.partitionBy(*cuboid)
    Ve = F.sum("real").over(w)
    Fe = F.sum("predict").over(w)
    vhat = F.when(Fe != 0, F.col("predict") * Ve / Fe).otherwise(F.lit(0.0))
    v = F.col("real")
    a_term = F.when(v == 0, F.lit(0.0)).otherwise(F.abs(v - vhat) / v)
    b_term = F.when(v == 0, F.lit(0.0)).otherwise(
        F.abs(v - F.col("predict")) / v
    )
    return (
        df.withColumn("__a", a_term)
        .withColumn("__b", b_term)
        .groupBy(*cuboid)
        .agg(
            F.count(F.lit(1)).alias("n_full"),
            F.sum("__a").alias("Ap_e"),
            F.sum("__b").alias("Bp_e"),
        )
    )


def search_cluster(
    df: DataFrame,
    df_cluster: DataFrame,
    attributes: list[str],
    delta_threshold: float,
    z: int,
    totals: dict[str, float],
) -> dict[str, Any] | None:
    """Best candidate for one cluster (ref autoroot.py:94-144), with all
    per-element scoring pushed into Spark."""
    best_root_cause: dict[str, Any] = {"avg": -1.0}
    for layer in range(1, len(attributes) + 1):
        for cuboid in cuboids_of_layer(attributes, layer):
            if layer == len(attributes) and (1.0 / z) <= delta_threshold:
                continue

            xs = (
                df_cluster.groupBy(*cuboid)
                .agg(F.count(F.lit(1)).alias("x"))
                .filter((F.col("x") / z) > delta_threshold)
            )
            terms = _nps_terms(df, cuboid)
            joined = xs.join(terms, on=cuboid, how="inner").withColumn(
                "LF", F.col("x") / F.col("n_full")
            ).filter(F.col("LF") > delta_threshold)

            N, Bp_tot = totals["N"], totals["Bp_tot"]
            a = F.col("Ap_e") / F.col("n_full")
            b = F.col("Bp_e") / F.col("n_full")
            n_rest = F.lit(N) - F.col("n_full")
            c = F.when(n_rest > 0, (F.lit(Bp_tot) - F.col("Bp_e")) / n_rest).otherwise(
                F.lit(0.0)
            )
            nps = 1 - ((a + c) / (b + c))
            scored = joined.withColumn("NPS", nps)

            # reference iterates splits in key order keeping strict-> max:
            # first maximum in ascending key order wins
            top = (
                scored.orderBy(
                    F.col("NPS").desc(), *[F.col(d).asc() for d in cuboid]
                )
                .limit(1)
                .collect()
            )
            if not top:
                continue
            row = top[0].asDict()
            CF = row["x"] / z
            avg_score = (row["NPS"] + row["LF"] + CF) / 3
            if avg_score > best_root_cause["avg"]:
                best_root_cause = {
                    "elements": [[str(row[d]) for d in cuboid]],
                    "layer": layer,
                    "cuboid": list(cuboid),
                    "LF": row["LF"],
                    "CF": CF,
                    "NPS": row["NPS"],
                    "avg": avg_score,
                }
    return best_root_cause if "elements" in best_root_cause else None


def _is_subset(parent: list[set], child: list[set]) -> bool:
    return all(any(p.issubset(c) for p in parent) for c in child)


def merge_root_causes(
    cluster_root_causes: list[dict[str, Any]], max_layer: int
) -> list[dict[str, Any]]:
    """Same-layer dedupe + parent/child subset merge (ref autoroot.py:50-91)."""
    from itertools import combinations

    def elem_sets(crc):
        return [set(e) for e in crc["elements"]]

    # drop same-layer duplicates (parent side of a subset pair)
    drop = set()
    for (i, p), (j, c) in combinations(enumerate(cluster_root_causes), 2):
        if p["layer"] == c["layer"] and _is_subset(elem_sets(p), elem_sets(c)):
            drop.add(i)
    causes = [c for i, c in enumerate(cluster_root_causes) if i not in drop]

    for layer in range(max_layer - 1, 0, -1):
        parents = [elem_sets(c) for c in causes if c["layer"] == layer]
        children = [c for c in causes if c["layer"] > layer]
        for child in children:
            for parent in parents:
                if _is_subset(parent, elem_sets(child)):
                    causes = [c for c in causes if c is not child]
    return causes


def _search_cluster_driver(
    pdf, cluster_pdf, attributes: list[str], delta_threshold: float,
    z: int, totals: dict[str, float],
) -> dict[str, Any] | None:
    """pandas mirror of search_cluster — same formulas, same tie order;
    parity-tested against the distributed path."""
    best: dict[str, Any] = {"avg": -1.0}
    N, Bp_tot = totals["N"], totals["Bp_tot"]
    for layer in range(1, len(attributes) + 1):
        for cuboid in cuboids_of_layer(attributes, layer):
            if layer == len(attributes) and (1.0 / z) <= delta_threshold:
                continue
            xs = cluster_pdf.groupby(cuboid, sort=False).size().rename("x")
            xs = xs[(xs / z) > delta_threshold]
            if not len(xs):
                continue

            g = pdf.groupby(cuboid, sort=False)
            Ve = g["real"].transform("sum")
            Fe = g["predict"].transform("sum")
            vhat = np.where(Fe != 0, pdf["predict"] * Ve / Fe, 0.0)
            v = pdf["real"]
            a_term = np.where(v == 0, 0.0, np.abs(v - vhat) / v)
            b_term = np.where(v == 0, 0.0, np.abs(v - pdf["predict"]) / v)
            t = pdf.assign(__a=a_term, __b=b_term)
            terms = t.groupby(cuboid, sort=False).agg(
                n_full=("__a", "size"), Ap_e=("__a", "sum"), Bp_e=("__b", "sum")
            )
            joined = terms.join(xs, how="inner")
            joined = joined[(joined["x"] / joined["n_full"]) > delta_threshold]
            if not len(joined):
                continue
            a = joined["Ap_e"] / joined["n_full"]
            b = joined["Bp_e"] / joined["n_full"]
            n_rest = N - joined["n_full"]
            c = np.where(n_rest > 0, (Bp_tot - joined["Bp_e"]) / n_rest, 0.0)
            joined = joined.assign(
                NPS=1 - (a + c) / (b + c), LF=joined["x"] / joined["n_full"]
            )
            joined = joined.sort_index(kind="stable").sort_values(
                "NPS", ascending=False, kind="stable"
            )
            row = joined.iloc[0]
            key = row.name if layer > 1 else (row.name,)
            CF = row["x"] / z
            avg = (row["NPS"] + row["LF"] + CF) / 3
            if avg > best["avg"]:
                best = {
                    "elements": [[str(k) for k in key]],
                    "layer": layer,
                    "cuboid": list(cuboid),
                    "LF": float(row["LF"]),
                    "CF": float(CF),
                    "NPS": float(row["NPS"]),
                    "avg": float(avg),
                }
    return best if "elements" in best else None


def _autoroot_driver(
    pdf, attributes: list[str], delta_threshold: float
) -> list[dict[str, Any]]:
    """Driver-side mirror of the full autoroot loop on a collected leaf
    frame (attrs as string, real, predict, deviation)."""
    relevant = pdf[pdf["deviation"].abs() > 0.2]
    if not len(relevant):
        return []
    ends = kde_boundaries(relevant["deviation"].to_numpy())
    cl = np.full(len(relevant), -1)
    for i, end in enumerate(ends):
        cl = np.where(relevant["deviation"] <= end, i, cl)
    relevant = relevant.assign(cluster=cl)

    v = pdf["real"]
    bp = np.where(v == 0, 0.0, np.abs(v - pdf["predict"]) / v)
    totals = {"N": float(len(pdf)), "Bp_tot": float(bp.sum())}

    cluster_root_causes = []
    for cluster in sorted(relevant["cluster"].unique()):
        sub = relevant[relevant["cluster"] == cluster]
        z = len(sub)
        if z == 0:
            continue
        rc = _search_cluster_driver(
            pdf, sub, attributes, delta_threshold, z, totals
        )
        if rc is not None:
            rc["cluster"] = int(cluster)
            cluster_root_causes.append(rc)
    return merge_root_causes(cluster_root_causes, max_layer=len(attributes))


def autoroot(
    df: DataFrame,
    attributes: list[str],
    delta_threshold: float = 0.1,
    max_kde_sample: int | None = None,
    seed: int = 11,
    driver_rows: int | None = 200_000,
) -> list[dict[str, Any]]:
    """Reference autoroot.py:147-170.

    Adaptive like riskloc: deviation scoring is distributed; when the
    aggregated leaf frame is driver-sized (cheap limit-probe), the
    KDE-cluster + per-cluster cuboid search runs vectorized on pandas
    (the search launches dozens of tiny sequential jobs otherwise); both
    paths share formulas and are parity-tested. ``driver_rows=None``
    forces the distributed path."""
    df = add_deviation_score(df)
    for d in attributes:
        df = df.withColumn(d, F.col(d).cast("string"))

    if driver_rows is not None:
        # one action: limit-probe and collect fused (see riskloc)
        pdf = (
            df.select(*attributes, "real", "predict", "deviation")
            .limit(driver_rows + 1)
            .toPandas()
        )
        if len(pdf) <= driver_rows:
            return _autoroot_driver(pdf, attributes, delta_threshold)

    df = df.persist()

    relevant = df.filter(F.abs(F.col("deviation")) > 0.2)
    dev_df = relevant.select("deviation")
    if max_kde_sample is not None:
        dev_df = dev_df.sample(fraction=1.0, seed=seed).limit(max_kde_sample)
    values = np.array([r[0] for r in dev_df.collect()])
    if len(values) == 0:
        df.unpersist()
        return []

    ends = kde_boundaries(values)
    relevant = assign_clusters(relevant, ends).persist()
    clusters = [r[0] for r in relevant.select("cluster").distinct().collect()]

    totals_row = df.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum(
            F.when(F.col("real") == 0, F.lit(0.0)).otherwise(
                F.abs(F.col("real") - F.col("predict")) / F.col("real")
            )
        ).alias("Bp_tot"),
    ).first()
    totals = {"N": float(totals_row["N"]), "Bp_tot": float(totals_row["Bp_tot"])}

    cluster_root_causes = []
    for cluster in clusters:
        df_cluster = relevant.filter(F.col("cluster") == cluster)
        z = df_cluster.count()
        if z == 0:
            continue
        rc = search_cluster(df, df_cluster, attributes, delta_threshold, z, totals)
        if rc is not None:
            rc["cluster"] = cluster
            cluster_root_causes.append(rc)

    relevant.unpersist()
    df.unpersist()
    return merge_root_causes(cluster_root_causes, max_layer=len(attributes))
