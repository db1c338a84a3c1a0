"""AutoRoot: KDE deviation clustering + per-cluster cuboid search (NPS).

Parity: reference algorithms/autoroot.py. Spark-first split of labor:

* deviation scoring + relevance filter: distributed column algebra;
* 1-D KDE (Silverman bandwidth) is fitted on the driver from DISTINCT
  (deviation, count) pairs of relevant leaves — bounded, with a
  histogram fallback past the bound; assignment back is a distributed
  WHEN-chain over the handful of cluster boundaries;
* NPS scoring: the reference loops splits and scans the full frame per
  split; here ALL (cluster, cuboid, element) scores come from ONE
  explode + shuffle (_search_all_clusters — the riskloc _layer_scores
  pattern), and only the per-(cluster, cuboid) winners reach the driver.
"""
from __future__ import annotations

import math
from typing import Any

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from riskloc_spark.functions.scores import add_deviation_score
from riskloc_spark.plans.cuboid import cuboids_of_layer


def _boundaries_from_density(s: np.ndarray, e: np.ndarray) -> list[float]:
    """Ends from a density over the grid: strict interior minima
    (e[i-1] > e[i] < e[i+1], matching scipy.signal.argrelextrema with
    np.less) + inf, descending."""
    interior = np.arange(1, len(s) - 1)
    mi = interior[(e[interior] < e[interior - 1]) & (e[interior] < e[interior + 1])]
    return sorted(np.concatenate((s[mi], [np.inf])).tolist(), reverse=True)


def kde_boundaries(values: np.ndarray, density_fn=None) -> list[float]:
    """Cluster boundaries: local minima of a Silverman-bandwidth gaussian
    KDE evaluated on 400 points of [-2,2] (ref autoroot.py:30-47).
    Returns the 'ends' list in descending order (inf first).

    Implemented in numpy (scipy is not available in this environment):
    Silverman factor for 1-D is (3n/4)^(-1/5), scaled by the sample std
    (ddof=1) — the same bandwidth scipy's gaussian_kde(bw='silverman')
    uses; minima are strict (e[i-1] > e[i] < e[i+1]), matching
    scipy.signal.argrelextrema(e, np.less).

    ``density_fn`` (oracle-gate injection — the density-level analogue
    of ``cluster_ends``): (samples, values, counts|None) -> density
    array replacing only the non-bit-portable exp() kernel sum; the
    grid, minima detection, ends ordering, cluster assignment, and the
    whole downstream search stay REAL (autoroot_kde_fixed gate)."""
    if len(np.unique(values)) == 1:
        return [float("inf")]
    s = np.linspace(-2, 2, 400)
    if density_fn is not None:
        e = np.asarray(density_fn(s, values, None), float)
    else:
        n = len(values)
        sigma = values.std(ddof=1)
        h = sigma * (3.0 * n / 4.0) ** (-1.0 / 5.0)
        # density at grid points: mean of gaussian kernels (n x 400)
        z = (s[None, :] - values[:, None]) / h
        e = np.exp(-0.5 * z * z).mean(axis=0) / (h * math.sqrt(2 * math.pi))
    return _boundaries_from_density(s, e)


def kde_boundaries_weighted(
    values: np.ndarray, counts: np.ndarray, density_fn=None
) -> list[float]:
    """kde_boundaries over (distinct deviation, count) pairs — every
    kernel weighted by its count; exact for the expanded array. Lets the
    distributed path collect O(distinct) pairs instead of raw rows.
    ``density_fn`` as in kde_boundaries (counts forwarded)."""
    if len(values) == 1:
        return [float("inf")]
    s = np.linspace(-2, 2, 400)
    if density_fn is not None:
        e = np.asarray(density_fn(s, values, counts), float)
    else:
        n = int(counts.sum())
        mean = float((values * counts).sum() / n)
        sigma = float(np.sqrt((counts * (values - mean) ** 2).sum() / (n - 1)))
        h = sigma * (3.0 * n / 4.0) ** (-1.0 / 5.0)
        z = (s[None, :] - values[:, None]) / h
        e = (np.exp(-0.5 * z * z) * counts[:, None]).sum(axis=0) / (
            n * h * math.sqrt(2 * math.pi)
        )
    return _boundaries_from_density(s, e)


def assign_clusters(df: DataFrame, ends: list[float]) -> DataFrame:
    """cluster i = index of the last end (descending) with deviation <= end
    — i.e. the reference's repeated overwrite loop, as one expression."""
    # walk descending like the reference; later (smaller) ends overwrite,
    # so the FINAL value is the max i with deviation <= end
    expr = F.lit(None).cast("int")
    for i, end in enumerate(ends):
        expr = F.when(F.col("deviation") <= F.lit(end), F.lit(i)).otherwise(expr)
    return df.withColumn("cluster", expr)


def _nps_terms(
    df: DataFrame, cuboid: list[str], exact_sums: bool = False
) -> DataFrame:
    """Per-element NPS building blocks over the FULL frame:
    n_full, Ap_e = sum nan0(|v - f*Ve/Fe| / v), Bp_e = sum nan0(|v-f| / v).

    ``exact_sums=True`` routes the window sums and the term sums through
    DECIMAL(38,9) so aggregation is order-independent (used by the
    ``autoroot_nps`` oracle gate; the search path keeps doubles)."""
    w = Window.partitionBy(*cuboid)
    if exact_sums:
        Ve = F.sum(F.col("real").cast("decimal(38,9)")).over(w).cast("double")
        Fe = F.sum(F.col("predict").cast("decimal(38,9)")).over(w).cast("double")
    else:
        Ve = F.sum("real").over(w)
        Fe = F.sum("predict").over(w)
    vhat = F.when(Fe != 0, F.col("predict") * Ve / Fe).otherwise(F.lit(0.0))
    v = F.col("real")
    a_term = F.when(v == 0, F.lit(0.0)).otherwise(F.abs(v - vhat) / v)
    b_term = F.when(v == 0, F.lit(0.0)).otherwise(
        F.abs(v - F.col("predict")) / v
    )

    def s(name):
        c = F.col(name)
        if exact_sums:
            return F.sum(c.cast("decimal(38,9)")).cast("double")
        return F.sum(c)

    return (
        df.withColumn("__a", a_term)
        .withColumn("__b", b_term)
        .groupBy(*cuboid)
        .agg(
            F.count(F.lit(1)).alias("n_full"),
            s("__a").alias("Ap_e"),
            s("__b").alias("Bp_e"),
        )
    )


def _search_all_clusters(
    df: DataFrame,
    attributes: list[str],
    clusters: list[int],
    z_of: dict[int, int],
    delta_threshold: float,
    totals: dict[str, float],
) -> dict[int, dict[str, Any]]:
    """Best candidate of EVERY (cluster, layer, cuboid) in ONE Spark job
    (ref autoroot.py:94-144).

    The per-cuboid loop of the reference becomes the riskloc
    ``_layer_scores`` explode: each row fans out to one (cid, elem) pair
    per cuboid; a shared window + groupBy computes the NPS terms
    (cluster-independent) alongside one conditional cluster count per
    cluster. A second explode melts the cluster counts, per-cluster
    filters apply, and a rank window keeps only each (cluster, cuboid)
    winner — O(#clusters x #cuboids) rows reach the driver, and the
    whole search costs one shuffle of #cuboids x |df| rows instead of
    O(#clusters x #cuboids) sequential jobs."""
    from riskloc_spark.plans.cuboid import ELEM_SEP, elem_expr

    n_attrs = len(attributes)
    cuboids = [
        (layer, c)
        for layer in range(1, n_attrs + 1)
        for c in cuboids_of_layer(attributes, layer)
    ]
    structs = [
        F.struct(
            F.lit(i).alias("cid"),
            elem_expr(c).alias("elem"),
        )
        for i, (_, c) in enumerate(cuboids)
    ]
    ex = df.select(
        F.explode(F.array(*structs)).alias("ce"), "real", "predict", "cluster"
    ).select(
        F.col("ce.cid").alias("cid"),
        F.col("ce.elem").alias("elem"),
        "real",
        "predict",
        "cluster",
    )

    w = Window.partitionBy("cid", "elem")
    Ve = F.sum("real").over(w)
    Fe = F.sum("predict").over(w)
    vhat = F.when(Fe != 0, F.col("predict") * Ve / Fe).otherwise(F.lit(0.0))
    v = F.col("real")
    a_term = F.when(v == 0, F.lit(0.0)).otherwise(F.abs(v - vhat) / v)
    b_term = F.when(v == 0, F.lit(0.0)).otherwise(
        F.abs(v - F.col("predict")) / v
    )
    agg = (
        ex.withColumn("__a", a_term)
        .withColumn("__b", b_term)
        .groupBy("cid", "elem")
        .agg(
            F.count(F.lit(1)).alias("n_full"),
            F.sum("__a").alias("Ap_e"),
            F.sum("__b").alias("Bp_e"),
            *[
                F.sum(
                    F.when(F.col("cluster") == c, 1).otherwise(0)
                ).alias(f"__x_{c}")
                for c in clusters
            ],
        )
    )

    N, Bp_tot = totals["N"], totals["Bp_tot"]
    a = F.col("Ap_e") / F.col("n_full")
    b = F.col("Bp_e") / F.col("n_full")
    n_rest = F.lit(N) - F.col("n_full")
    c_t = F.when(n_rest > 0, (F.lit(Bp_tot) - F.col("Bp_e")) / n_rest).otherwise(
        F.lit(0.0)
    )
    scored = agg.withColumn("NPS", 1 - ((a + c_t) / (b + c_t)))

    # melt the per-cluster counts; z and the (x/z) filter vary by cluster
    z_expr = F.lit(None).cast("double")
    for c in clusters:
        z_expr = F.when(F.col("cluster") == c, F.lit(float(z_of[c]))).otherwise(
            z_expr
        )
    melted = (
        scored.select(
            "cid",
            "elem",
            "n_full",
            "NPS",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("cluster"),
                            F.col(f"__x_{c}").alias("x"),
                        )
                        for c in clusters
                    ]
                )
            ).alias("cx"),
        )
        .select("cid", "elem", "n_full", "NPS", "cx.cluster", "cx.x")
        .withColumn("z", z_expr)
        .filter((F.col("x") / F.col("z")) > delta_threshold)
        .withColumn("LF", F.col("x") / F.col("n_full"))
        .filter(F.col("LF") > delta_threshold)
    )

    # reference iterates splits in key order keeping strict-> max: first
    # maximum in ascending key order wins; \x1f-concat preserves tuple order
    rank_w = Window.partitionBy("cluster", "cid").orderBy(
        F.col("NPS").desc(), F.col("elem").asc()
    )
    winners = (
        melted.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .collect()
    )

    best_of: dict[int, dict[str, Any]] = {}
    for row in sorted(winners, key=lambda r: (r["cluster"], r["cid"])):
        cluster, cid = row["cluster"], row["cid"]
        layer, cuboid = cuboids[cid]
        z = z_of[cluster]
        if layer == n_attrs and (1.0 / z) <= delta_threshold:
            continue  # ref autoroot.py:99 — leaf cuboid skipped per cluster
        CF = row["x"] / z
        avg_score = (row["NPS"] + row["LF"] + CF) / 3
        best = best_of.get(cluster, {"avg": -1.0})
        if avg_score > best["avg"]:
            best_of[cluster] = {
                "elements": [row["elem"].split(ELEM_SEP)],
                "layer": layer,
                "cuboid": list(cuboid),
                "LF": row["LF"],
                "CF": CF,
                "NPS": row["NPS"],
                "avg": avg_score,
            }
    return best_of


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
    pdf, attributes: list[str], delta_threshold: float,
    cluster_ends: list[float] | None = None,
    kde_density_fn=None,
) -> list[dict[str, Any]]:
    """Driver-side mirror of the full autoroot loop on a collected leaf
    frame (attrs as string, real, predict, deviation)."""
    relevant = pdf[pdf["deviation"].abs() > 0.2]
    if not len(relevant):
        return []
    ends = (
        list(cluster_ends)
        if cluster_ends is not None
        else kde_boundaries(relevant["deviation"].to_numpy(), kde_density_fn)
    )
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
    cluster_ends: list[float] | None = None,
    kde_density_fn=None,
) -> list[dict[str, Any]]:
    """Reference autoroot.py:147-170.

    Adaptive like riskloc: deviation scoring is distributed; when the
    aggregated leaf frame is driver-sized (cheap limit-probe), the
    KDE-cluster + per-cluster cuboid search runs vectorized on pandas
    (the search launches dozens of tiny sequential jobs otherwise); both
    paths share formulas and are parity-tested. ``driver_rows=None``
    forces the distributed path, where the KDE fits on bounded distinct
    (deviation, count) pairs (``max_kde_sample`` overrides the 200k
    bound; ``seed`` is kept for API compatibility — the path is now
    deterministic) and the whole (cluster x cuboid) search is ONE
    explode job (_search_all_clusters)."""
    df = add_deviation_score(df)
    for d in attributes:
        df = df.withColumn(
            d, F.coalesce(F.col(d).cast("string"), F.lit("None"))
        )

    if driver_rows is not None:
        # one action: limit-probe and collect fused (see riskloc)
        pdf = (
            df.select(*attributes, "real", "predict", "deviation")
            .limit(driver_rows + 1)
            .toPandas()
        )
        if len(pdf) <= driver_rows:
            return _autoroot_driver(
                pdf, attributes, delta_threshold, cluster_ends,
                kde_density_fn,
            )

    df = df.persist()
    try:
        rel_pred = F.abs(F.col("deviation")) > 0.2

        # KDE input: distinct (deviation, count) pairs, bounded (same
        # pattern as squeeze); past the bound a B-bucket histogram of
        # centers stands in — raw rows never reach the driver.
        # ``cluster_ends`` (injectable boundaries, e.g. for the
        # autoroot_search_fixed oracle gate) skips the KDE fit entirely.
        B = max_kde_sample or 200_000
        rows = None if cluster_ends is not None else (
            df.filter(rel_pred)
            .groupBy("deviation")
            .agg(F.count(F.lit(1)).alias("c"))
            .limit(B + 1)
            .collect()
        )
        if cluster_ends is not None:
            ends = list(cluster_ends)
        elif not rows:
            return []
        elif len(rows) <= B:
            arr = np.array([(float(r[0]), float(r[1])) for r in rows])
        else:
            mn, mx = (
                df.filter(rel_pred).agg(F.min("deviation"), F.max("deviation")).first()
            )
            if mn == mx:
                n = df.filter(rel_pred).count()
                arr = np.array([(float(mn), float(n))])
            else:
                b = F.least(
                    F.floor((F.col("deviation") - F.lit(mn)) / F.lit(mx - mn) * B),
                    F.lit(B - 1),
                )
                width = (mx - mn) / B
                arr = np.array(
                    [
                        (mn + (r[0] + 0.5) * width, float(r[1]))
                        for r in df.filter(rel_pred)
                        .groupBy(b.alias("__b"))
                        .agg(F.count(F.lit(1)).alias("c"))
                        .collect()
                    ]
                )
        if cluster_ends is None:
            order = np.argsort(arr[:, 0], kind="stable")
            ends = kde_boundaries_weighted(
                arr[order, 0], arr[order, 1], kde_density_fn
            )

        df_cl = assign_clusters(df, ends).withColumn(
            "cluster", F.when(rel_pred, F.col("cluster"))
        )
        z_rows = (
            df_cl.filter(F.col("cluster").isNotNull())
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("z"))
            .collect()
        )
        z_of = {int(r["cluster"]): int(r["z"]) for r in z_rows if r["z"] > 0}
        clusters = sorted(z_of)
        if not clusters:
            return []

        totals_row = df.agg(
            F.count(F.lit(1)).alias("N"),
            F.sum(
                F.when(F.col("real") == 0, F.lit(0.0)).otherwise(
                    F.abs(F.col("real") - F.col("predict")) / F.col("real")
                )
            ).alias("Bp_tot"),
        ).first()
        totals = {
            "N": float(totals_row["N"]),
            "Bp_tot": float(totals_row["Bp_tot"]),
        }

        best_of = _search_all_clusters(
            df_cl, attributes, clusters, z_of, delta_threshold, totals
        )
        cluster_root_causes = []
        for cluster in clusters:
            rc = best_of.get(cluster)
            if rc is not None:
                rc["cluster"] = cluster
                cluster_root_causes.append(rc)
    finally:
        df.unpersist()
    return merge_root_causes(cluster_root_causes, max_layer=len(attributes))
