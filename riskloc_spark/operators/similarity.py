"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with the query side broadcast (exact,
O(n·q), the correctness oracle). Scale path: LSH-bucketed search via
random hyperplanes — candidates only within matching buckets, recall
traded via number of tables/bits.

All vector math is JVM-side (`zip_with` + `aggregate`); no Python UDFs.
"""
from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from riskloc_spark.data import local_rows_df

from riskloc_spark.operators.dedup import (
    reuse_checkpoint,
    spread_small_scan,
)


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float*float loses bits the DuckDB oracle
    # (double math) keeps
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = l2_norm(a) * l2_norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine() with PRECOMPUTED per-side norms: in pairwise joins the
    norms must be computed once per vector before the join, not once per
    pair (same IEEE ops as cosine(), so results are bit-identical)."""
    d = na * nb
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    The query side is broadcast (small by construction); ranking uses a
    window partitioned by query — the shuffle key is query_id, so work
    scales with corpus x queries/partitions, never a global sort.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    scored = spread_small_scan(
        corpus.select(
            F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__cn")
        )
    ).crossJoin(
        F.broadcast(q)
    ).select(
        query_id_col,
        id_col,
        cosine_with_norms(
            F.col(vec_col), F.col("__qv"), F.col("__cn"), F.col("__qn")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_near_dup_exact_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 50_000,
) -> DataFrame:
    """Exact all-pairs cosine near-dup — the deliberate O(n^2)
    correctness baseline for embedding_near_dup (the LSH-bucketed
    production path). Norms are computed once per vector before the
    self-join (bit-identical to inline cosine, 3x less per-pair work).

    GUARDED: refuses corpora above ``max_rows`` (cheap limit-probe, no
    full count) — at 10^5 rows this plan is already 5x10^9 pair
    comparisons, and pointing it at a real corpus is always a mistake;
    validate the LSH path on a sample instead. Pass ``max_rows=None``
    to override explicitly."""
    if max_rows is not None:
        n = df.select(id_col).limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup_exact_pairs: corpus exceeds max_rows="
                f"{max_rows} (O(n^2) exact baseline; use embedding_near_dup "
                f"for real corpora, or pass max_rows=None to override)"
            )
    emb = df.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("__n")
    )
    # norms feed both sides of the self-join; checkpoint so the scan
    # + norm pipeline runs once (no cross-branch CSE in Spark) —
    # conf-gated via spark.riskloc.localCheckpoint for clusters that
    # prefer lineage recoverability over the duplicate scan
    emb = reuse_checkpoint(emb)
    l, r = emb.alias("l"), emb.alias("r")
    return (
        l.join(r, F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine_with_norms(
                F.col(f"l.{vec_col}"),
                F.col(f"r.{vec_col}"),
                F.col("l.__n"),
                F.col("r.__n"),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (driver-side tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim)]


def lsh_bucket_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: sign-random-projection LSH buckets; candidates
    are corpus rows whose bucket matches the query's bucket, ranked by
    exact cosine. 100-TB path: the corpus is shuffled once on bucket
    (or bucketed at write time), the query side broadcasts.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = [_hyperplane(dim, seed + i) for i in range(num_bits)]

    def bucket_of(vec: Column) -> Column:
        bits = [
            F.when(
                dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i, plane in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out.bitwiseOR(b)
        return out

    c = spread_small_scan(corpus).select(
        F.col(id_col), F.col(vec_col), bucket_of(F.col(vec_col)).alias("__bkt")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        bucket_of(F.col(vec_col)).alias("__bkt"),
    )
    scored = c.join(F.broadcast(q), on="__bkt").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    num_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH buckets:
    pairs are only compared within a bucket (plus no global cross join)."""
    dim = len(df.select(vec_col).first()[0])
    planes = [_hyperplane(dim, seed + i) for i in range(num_bits)]

    def bucket_of(vec: Column) -> Column:
        bits = [
            F.when(
                dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i, plane in enumerate(planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out.bitwiseOR(b)
        return out

    b = spread_small_scan(df).select(
        F.col(id_col),
        F.col(vec_col),
        bucket_of(F.col(vec_col)).alias("__bkt"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    # the LSH bits + norms feed both self-join sides — checkpoint so
    # the hyperplane projections run once (no cross-branch CSE);
    # conf-gated via spark.riskloc.localCheckpoint
    b = reuse_checkpoint(b)
    pairs = (
        b.alias("l")
        .join(
            b.alias("r"),
            on=[
                F.col("l.__bkt") == F.col("r.__bkt"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine_with_norms(
                F.col(f"l.{vec_col}"),
                F.col(f"r.{vec_col}"),
                F.col("l.__n"),
                F.col("r.__n"),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return pairs


def _kmeans_fit(sample, n_clusters: int, n_iter: int, seed: int):
    """Tiny Lloyd's k-means on a driver sample (numpy). The coarse
    quantizer for IVF needs only rough centroids; the sample is bounded
    by the caller."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(n_iter):
        # chunked like ivfpq_assign_cells (identical per-element float
        # ops): the one-shot temporary is sample x K x dim doubles —
        # 655 MB per iteration at 5000 x 512 x 32
        d = np.empty((len(x), len(centroids)), dtype=np.float64)
        for k0 in range(0, len(centroids), 64):
            blk = centroids[k0:k0 + 64]
            d[:, k0:k0 + len(blk)] = (
                (x[:, None, :] - blk[None, :, :]) ** 2
            ).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_fit_centroids(
    corpus: DataFrame,
    n_clusters: int = 16,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    vec_col: str = "embedding",
    seed: int = 7,
    id_col: str = "vec_id",
) -> "np.ndarray":
    """Fit the IVF coarse quantizer once: driver k-means on a bounded
    DETERMINISTIC sample (first ``fit_sample`` rows by ``id_col`` — a
    TakeOrdered, no full sort; a bare limit would be partition-order
    dependent, making the quantizer unreproducible across runs and
    un-oracle-able). Returns the (n_clusters x dim) centroid array —
    pass it to ``ivf_knn(centroids=...)`` to serve queries without
    refitting (the fit is the whole cold-start cost: a collect +
    O(sample x clusters) numpy loop, ~10x one warm probe at sf0.1)."""
    sample = [
        r[0]
        for r in corpus.select(vec_col, id_col)
        .orderBy(id_col)
        .limit(fit_sample)
        .collect()
    ]
    return _kmeans_fit(sample, n_clusters, n_iter, seed)


def _coarse_assign_udfs(centroids, n_probe: int):
    """The IVF coarse-quantizer UDF pair shared by ivf_knn / knn_graph:
    centroid assignment as an Arrow-vectorized pandas UDF — a batch
    (b x dim) @ centroid matmul replaces 2*n_clusters interpreted
    higher-order-function lambdas per row (the sanctioned Pandas-UDF
    case: built-in column algebra can't express the matmul).  Returns
    (cell_of, probe_cells); the centroid matrix is closure-captured
    (tiny)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    C = centroids  # (n_clusters x dim)

    def _dists(series: "pd.Series") -> "np.ndarray":
        x = np.stack(series.to_numpy())
        # chunk over centroid blocks (the ivfpq_assign_cells / r9 fix,
        # measured again this round at 1M x 256 x 32: the one-shot
        # (batch, K, dim) temporary is ~1.3 GB per 10k-row Arrow batch
        # and 32 concurrent workers allocating it stall on host memory
        # compaction — 456 s for one assignment pass vs ~25 s chunked).
        # Per-element float ops are IDENTICAL (subtract, square, sum
        # over dim), so distances — and every argmin/argsort consumer —
        # are unchanged bit-for-bit.
        d = np.empty((len(x), len(C)), dtype=np.float64)
        for k0 in range(0, len(C), 64):
            blk = C[k0:k0 + 64]
            d[:, k0:k0 + len(blk)] = (
                (x[:, None, :] - blk[None, :, :]) ** 2
            ).sum(axis=2)
        return d

    @pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        return pd.Series(_dists(v).argmin(axis=1))

    @pandas_udf("array<int>")
    def probe_cells(v: pd.Series) -> pd.Series:
        idx = np.argsort(_dists(v), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.tolist()))

    return cell_of, probe_cells


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    centroids: "np.ndarray | None" = None,
    method: str = "expr",
) -> DataFrame:
    """Corpus kNN GRAPH: approximate top-``k`` cosine neighbors for
    EVERY vector — the primitive under SemDeDup-style clustering,
    duplicate-cluster audits, and graph-based corpus analytics (kNN
    graph construction is the first stage of HDBSCAN/Louvain corpus
    maps).

    Candidates come from IVF co-cell blocking: every vector is ASSIGNED
    to its nearest coarse cell and PROBES its ``n_probe`` nearest
    cells; vector b is a candidate neighbor of a iff cell(b) is among
    a's probed cells (each b has exactly one cell, so no candidate is
    generated twice).  Exact cosine ranks candidates; self-pairs are
    excluded.  Returns (id_col, nbr_id, cos_sim, rank).

    100-TB shape: unlike query serving (broadcast query side), BOTH
    sides are corpus-volume — the join shuffles on the cell id, so
    work per cell is |cell| x n_probe x |cell| and the corpus never
    cross-joins.  Cell-size balance is the k-means quantizer's job;
    a hot cell (skewed corpus) splits under AQE skew-join, the same
    story as the LSH band buckets.  The quantizer fits ONCE on a
    bounded driver sample (or arrives precomputed via ``centroids`` —
    an index-build pipeline persists it; the ivfpq serving rung's
    discipline applies).

    ``method``: 'expr' (default — pure column algebra, the hash-gated
    path) or 'gemm' (round 11 — the FAISS-style blocked scan: cells
    cogrouped into applyInPandas and scored as chunked float64 matrix
    products).  The expression path's interpreted zip_with/aggregate
    cosine tops out around 0.5-2M pairs/s on 16 cores, which caps the
    graph at ~100k vectors locally; the gemm path runs the identical
    candidate set through BLAS (~1 TFLOP of matmul for a 2M-vector
    graph) and returns the SAME edges — per-cell top-(k+slack)
    selection is a superset of any global top-k member, and the final
    exact window re-ranks with the same (cos DESC, nbr ASC) tie-break.
    Parity is test-pinned; divergence is possible only if more than
    ``slack``=8 members tie EXACTLY at a cell's selection boundary
    (synthesized and real float corpora don't)."""
    from pyspark.sql import Window

    if centroids is None:
        centroids = ivf_fit_centroids(
            corpus, n_clusters, fit_sample, n_iter, vec_col, seed, id_col
        )
    if method == "gemm":
        return _knn_graph_gemm(
            corpus, k, centroids, n_probe, id_col, vec_col
        )
    if method != "expr":
        raise ValueError(f"unknown method {method!r}")
    cell_of, probe_cells = _coarse_assign_udfs(centroids, n_probe)

    # ONE corpus pass computes the norm, the probe list AND the
    # assigned cell, checkpointed because the self-join reads it on
    # BOTH sides — lazily each side would re-scan the corpus and
    # re-run the Python quantizer (two scans + two Arrow boundary
    # crossings instead of one; no cross-branch CSE).  The cell is
    # probes[0] (argmin == first element of the STABLE distance
    # argsort — identical index, and n_probe >= 1 always), so the
    # whole quantizer is ONE pandas-UDF evaluation instead of two
    # computing the same distance matrix.
    base = reuse_checkpoint(
        spread_small_scan(corpus)
        .select(
            F.col(id_col),
            F.col(vec_col),
            l2_norm(F.col(vec_col)).alias("__n"),
            probe_cells(F.col(vec_col)).alias("__probes"),
        )
        .withColumn("__cell0", F.element_at("__probes", 1))
    )
    assigned = base.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("__bv"),
        F.col("__n").alias("__bn"),
        F.col("__cell0").alias("__cell"),
    )
    probing = base.select(
        F.col(id_col),
        F.col(vec_col).alias("__av"),
        F.col("__n").alias("__an"),
        F.explode(F.col("__probes")).alias("__cell"),
    )
    scored = (
        probing.join(assigned, "__cell")
        .filter(F.col(id_col) != F.col("nbr_id"))
        .select(
            F.col(id_col),
            "nbr_id",
            cosine_with_norms(
                F.col("__av"), F.col("__bv"),
                F.col("__an"), F.col("__bn"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "nbr_id", "cos_sim", "rank")
    )


def _knn_graph_gemm(
    corpus: DataFrame,
    k: int,
    centroids,
    n_probe: int,
    id_col: str,
    vec_col: str,
    chunk: int = 1024,
    slack: int = 8,
) -> DataFrame:
    """The blocked-GEMM kNN-graph scan (see ``knn_graph`` docstring):
    probers and members COGROUP on the coarse cell, each cell RANKS
    as float32 matrix-product tiles of ``chunk`` probers (bounded
    memory regardless of cell size), per-cell candidates are the
    top-(k+slack+1) per prober, their cosines are recomputed EXACTLY
    in float64 (identical values to the expression path), and ONE
    exact window ranks the ~n_probe*(k+slack) candidates per vector
    globally with the same (cos DESC, nbr ASC) tie-break.

    100-TB shape: the shuffle is the cogroup on cell id (each side one
    corpus-volume exchange); per-cell compute is BLAS, not interpreted
    lambdas.  A hot cell is one GROUP here (AQE cannot split a
    cogroup), so cell balance is the quantizer's job — the join-based
    'expr' path is the variant whose hot cells AQE skew-split, and the
    bench's graph rung demonstrates both."""
    import numpy as np

    from pyspark.sql import Window

    cell_of, probe_cells = _coarse_assign_udfs(centroids, n_probe)
    # ONE checkpointed quantizer pass shared by both cogroup sides
    # (the same shape as the expr path): members' cell is probes[0]
    # (argmin == first element of the STABLE distance argsort —
    # identical index), so the corpus crosses the Arrow boundary once
    # and the distance matrix is computed once, not once per side
    base = reuse_checkpoint(
        spread_small_scan(corpus)
        .select(
            F.col(id_col),
            F.col(vec_col),
            probe_cells(F.col(vec_col)).alias("__probes"),
        )
        .withColumn("__cell0", F.element_at("__probes", 1))
    )
    members = base.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("__bv"),
        F.col("__cell0").alias("__cell"),
    )
    probers = base.select(
        F.col(id_col),
        F.col(vec_col).alias("__av"),
        F.explode("__probes").alias("__cell"),
    )
    out_schema = f"{id_col} long, nbr_id long, cos_sim double"

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {id_col: [], "nbr_id": [], "cos_sim": []}
            ).astype({id_col: "int64", "nbr_id": "int64",
                      "cos_sim": "float64"})
        M = np.stack(right["__bv"].to_numpy()).astype(np.float64)
        mids = right["nbr_id"].to_numpy()
        mn = np.sqrt((M * M).sum(axis=1))
        # RANKING runs in float32 on members PRESCALED by 1/|m| (the
        # per-prober 1/|p| factor is rank-invariant): one sgemm tile +
        # one argpartition per chunk, no full-matrix divide or
        # self-mask pass — the passes that made the exact-f64 shape
        # memory-bound.  Selection takes k+slack+1 seats (+1 absorbs
        # the self pair), then the EXACT float64 cosine is recomputed
        # for the selected pairs only, so emitted values are identical
        # to the expression path; f32 ranking can mis-SELECT only if
        # >slack candidates sit within f32 noise of the boundary.
        Mn32 = np.divide(
            M, mn[:, None], out=np.zeros_like(M), where=mn[:, None] != 0
        ).astype(np.float32)
        pids = left[id_col].to_numpy()
        P_all = np.stack(left["__av"].to_numpy()).astype(np.float64)
        P32 = P_all.astype(np.float32)
        pn = np.sqrt((P_all * P_all).sum(axis=1))
        kk = min(k + slack + 1, M.shape[0])
        out_ids, out_nbrs, out_sims = [], [], []
        for s in range(0, len(pids), chunk):
            rank_sims = P32[s : s + chunk] @ Mn32.T
            if kk < M.shape[0]:
                sel = np.argpartition(-rank_sims, kk - 1, axis=1)[:, :kk]
            else:
                sel = np.broadcast_to(
                    np.arange(M.shape[0]), rank_sims.shape
                ).copy()
            dots = np.einsum(
                "rd,rkd->rk", P_all[s : s + chunk], M[sel],
                optimize=True,
            )
            den = pn[s : s + chunk, None] * mn[sel]
            cos = np.divide(
                dots, den, out=np.zeros_like(dots), where=den != 0
            )
            rows = np.repeat(pids[s : s + chunk], sel.shape[1]).reshape(
                sel.shape
            )
            nbrs = mids[sel]
            keep = rows != nbrs  # self pairs out
            out_ids.append(rows[keep])
            out_nbrs.append(nbrs[keep])
            out_sims.append(cos[keep])
        return pd.DataFrame(
            {
                id_col: np.concatenate(out_ids),
                "nbr_id": np.concatenate(out_nbrs),
                "cos_sim": np.concatenate(out_sims),
            }
        )

    cand = (
        probers.groupBy("__cell")
        .cogroup(members.groupBy("__cell"))
        .applyInPandas(score, out_schema)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col("nbr_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "nbr_id", "cos_sim", "rank")
    )


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 6,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer ->
    corpus partitioned by nearest centroid -> each query probes only its
    ``n_probe`` nearest cells, ranked by exact cosine inside them.

    100-TB shape: the quantizer is fit once on a bounded driver sample
    (or passed in precomputed via ``centroids`` — a query-serving path
    must NOT refit per call; use ivf_fit_centroids once and reuse);
    assignment is a broadcast argmin over n_clusters centroid literals
    (JVM-side, no shuffle); the probe is an equi-join on cell id — the
    corpus shuffles once on cell (or is bucketed by cell at write time),
    queries broadcast. Recall is tuned by n_probe/n_clusters without
    ever approaching the O(n*q) cross join. (On near-uniform synthetic
    vectors recall ~= probed fraction; real embedding corpora cluster,
    which is what makes IVF pruning effective.)
    """
    from pyspark.sql import Window
    import numpy as np

    if centroids is None:
        centroids = ivf_fit_centroids(
            corpus, n_clusters, fit_sample, n_iter, vec_col, seed, id_col
        )

    cell_of, probe_cells = _coarse_assign_udfs(centroids, n_probe)

    c = spread_small_scan(corpus).select(
        F.col(id_col),
        F.col(vec_col),
        cell_of(F.col(vec_col)).alias("__cell"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("__cell"),
    )
    scored = c.join(F.broadcast(q), on="__cell").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def pq_fit_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 256,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> "np.ndarray":
    """Fit product-quantization codebooks once: the vector is split into
    ``n_sub`` contiguous subspaces and each gets its own ``n_codes``-entry
    k-means codebook (driver numpy on the same bounded DETERMINISTIC
    sample discipline as ivf_fit_centroids). Returns (n_sub, n_codes,
    dim/n_sub) — pass to ``pq_knn(codebooks=...)``; a query-serving path
    must not refit per call."""
    import numpy as np

    sample = np.asarray(
        [
            r[0]
            for r in corpus.select(vec_col, id_col)
            .orderBy(id_col)
            .limit(fit_sample)
            .collect()
        ],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    ds = dim // n_sub
    return np.stack(
        [
            _kmeans_fit(
                sample[:, m * ds: (m + 1) * ds], n_codes, n_iter, seed + m
            )
            for m in range(n_sub)
        ]
    )


def _pq_encode_udf(codebooks: "np.ndarray"):
    """Build the PQ-encoding pandas UDF once so ``pq_encode`` and the
    fused ``ivfpq_index`` pass share identical arithmetic."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    CB = np.asarray(codebooks, dtype=np.float64)
    M, K, ds = CB.shape

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(v.to_numpy()).astype(np.float64)
        xs = x.reshape(len(x), M, ds)
        # per-subspace loop: identical float ops to the one-shot
        # broadcast (same subtract/square/sum-last-axis order per
        # element) but the temporary is (b, K, ds) instead of
        # (b, M, K, ds) — the one-shot form allocated ~650 MB per
        # 10k-row Arrow batch and was the ann bench's variance hotspot
        codes = np.empty((len(x), M), dtype=np.int64)
        for m in range(M):
            d = ((xs[:, m, None, :] - CB[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d.argmin(axis=1)
        return pd.Series(list(codes.tolist()))

    return encode


def pq_encode(
    corpus: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode a corpus against fitted PQ codebooks: (id, __code) where
    __code[m] is the nearest codebook entry of subspace m (np.argmin
    tie-break — first minimum). This IS the compressed corpus a
    production deployment stores (n_sub small ints per vector instead
    of the full float array); run once at ingest, serve many queries
    (pq_knn(coded=...)). Arrow-vectorized matmul-shaped assignment,
    same sanctioned Pandas-UDF case as IVF."""
    encode = _pq_encode_udf(codebooks)
    return spread_small_scan(corpus).select(
        F.col(id_col), encode(F.col(vec_col)).alias("__code")
    )


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    n_codes: int = 256,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    codebooks: "np.ndarray | None" = None,
    rerank: int = 0,
    coded: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization approximate top-k (ADC): each corpus vector
    compresses to ``n_sub`` code bytes (nearest sub-centroid per
    subspace); a query precomputes one (n_sub x n_codes) distance table
    and the approximate squared-L2 distance to ANY coded vector is a
    table-lookup sum — no full vector is touched at query time.

    100-TB shape: this is the MEMORY-side ANN path (the codes are
    dim/n_sub * 4-byte-float -> 1-byte compressions; a 3 KB float64
    embedding becomes n_sub bytes, so a petabyte-scale embedding corpus
    can keep its searchable form in cluster RAM). Encoding is one
    Arrow-vectorized pass (same sanctioned matmul-shaped Pandas-UDF
    case as IVF assignment); the scan is a broadcast join against the
    (tiny) query tables with the lookup sum in JVM expressions
    (zip_with + element_at + aggregate — no Python in the per-pair hot
    path); ranking is one partitioned window. Composes with IVF
    (IVF-PQ) by bucketing the coded corpus on the coarse cell.

    ``coded`` accepts a PRE-ENCODED corpus (``pq_encode`` output —
    (id, __code)): in production the codes are computed once at ingest
    and stored (they are the compressed corpus); encoding per query
    call is the cold-start cost, exactly like refitting IVF's
    quantizer. ``rerank=R`` adds the standard exact re-ranking stage: the ADC
    top-R candidates per query join back to their full vectors and the
    final top-k is exact squared L2 over that bounded candidate set —
    PQ's reconstruction error then only has to keep the true neighbors
    inside R, not rank them (the operating mode every production PQ
    system uses). rerank=0 ranks by raw ADC distance.

    Returns (query_id, vec_id, adc_dist, rank): adc_dist ASCENDING
    (approximate squared L2; the exact squared L2 when reranked), ties
    broken by vec_id (deterministic).
    """
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if codebooks is None:
        codebooks = pq_fit_codebooks(
            corpus, n_sub, n_codes, fit_sample, n_iter, vec_col, id_col, seed
        )
    CB = np.asarray(codebooks, dtype=np.float64)  # (M, K, ds)
    M, K, ds = CB.shape

    @pandas_udf("array<array<double>>")
    def dist_table(v: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(v.to_numpy()).astype(np.float64)
        xs = x.reshape(len(x), M, ds)
        d = np.empty((len(x), M, K), dtype=np.float64)
        for m in range(M):  # same per-subspace loop as pq_encode
            d[:, m, :] = (
                (xs[:, m, None, :] - CB[m][None, :, :]) ** 2
            ).sum(axis=2)
        return pd.Series(list(d.tolist()))

    if coded is None:
        coded = pq_encode(
            corpus, CB, id_col=id_col, vec_col=vec_col
        )
    q = queries.select(
        F.col(query_id_col), dist_table(F.col(vec_col)).alias("__qtab")
    )
    # ADC: sum of per-subspace table lookups — all JVM-side
    adc = F.aggregate(
        F.zip_with(
            F.col("__code"),
            F.col("__qtab"),
            lambda c, t: F.element_at(t, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = coded.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, adc.alias("adc_dist")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max(k, rerank))
        .select(query_id_col, id_col, "adc_dist", "rank")
    )
    if rerank <= 0:
        return top
    # exact re-rank of the bounded candidate set: candidates join back
    # to their vectors (broadcast — R x queries rows), queries join by
    # id, squared L2 in JVM expressions, one tiny window
    cand = top.select(query_id_col, id_col)
    qv = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    )
    exact = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.col("__qv"),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_dist"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def _cell_assign_udf(centroids: "np.ndarray"):
    """Build the coarse-cell-assignment pandas UDF once so
    ``ivfpq_assign_cells`` and the fused ``ivfpq_index`` pass share
    identical arithmetic."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(v.to_numpy())
        # chunk over centroid blocks (round 9, same fix as the r8 PQ
        # encode chunking): the one-shot (batch, K, dim) temporary is
        # ~1.3 GB per 10k-row Arrow batch at K=512 — the semantic-dedup
        # cell count. Per-element float ops are IDENTICAL (subtract,
        # square, sum over dim), so cell assignments — and the oracle
        # twins ordering by list_distance — are unchanged bit-for-bit.
        d = np.empty((len(x), len(C)), dtype=np.float64)
        for k0 in range(0, len(C), 64):
            blk = C[k0:k0 + 64]
            d[:, k0:k0 + len(blk)] = (
                (x[:, None, :] - blk[None, :, :]) ** 2
            ).sum(axis=2)
        return pd.Series(d.argmin(axis=1))

    return cell_of


def ivfpq_assign_cells(
    corpus: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-cell assignment for IVF-PQ: (id, __cell), computed once at
    ingest alongside pq_encode — persist/bucket the joined (id, cell,
    code) index and serve queries from it (ivfpq_knn(coded=, cells=))."""
    cell_of = _cell_assign_udf(centroids)
    return spread_small_scan(corpus).select(
        F.col(id_col), cell_of(F.col(vec_col)).alias("__cell")
    )


def ivfpq_index(
    corpus: DataFrame,
    codebooks: "np.ndarray",
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fused ingest pass for the (id, __cell, __code) IVF-PQ index:
    the SAME two UDFs as ``ivfpq_assign_cells`` + ``pq_encode`` (shared
    factories — values bit-identical), evaluated in ONE select so the
    plan carries a single ArrowEvalPython node: the corpus is scanned
    once and the embedding column crosses the Python boundary once,
    and the ``join(..., id_col)`` exchange of the two-pass build
    disappears (guide §4.1/§2.4).  Drop-in for the two-pass
    ``pq_encode(c).join(ivfpq_assign_cells(c), id)`` composition."""
    cell_of = _cell_assign_udf(centroids)
    encode = _pq_encode_udf(codebooks)
    return spread_small_scan(corpus).select(
        F.col(id_col),
        cell_of(F.col(vec_col)).alias("__cell"),
        encode(F.col(vec_col)).alias("__code"),
    )


def ivfpq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 6,
    n_sub: int = 8,
    n_codes: int = 256,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    centroids: "np.ndarray | None" = None,
    codebooks: "np.ndarray | None" = None,
    rerank: int = 0,
    coded: DataFrame | None = None,
    cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the composition production ANN systems actually deploy at
    corpus scales where neither a full scan nor full vectors in memory
    are affordable. IVF's coarse quantizer prunes the CANDIDATE SET
    (each query touches only its ``n_probe`` nearest cells); PQ's codes
    compress what remains to ``n_sub`` bytes per vector, scored by the
    same table-lookup ADC; ``rerank=R`` re-ranks the bounded survivors
    with exact squared L2.

    100-TB shape: cell + code are both computed ONCE at ingest (the
    coded corpus is tiny and can be bucketed/persisted on cell — see
    write_bucketed); a query broadcasts its probe-cell list and its
    (n_sub x n_codes) distance table, so the scan reads only the probed
    cells' code bytes and never a full vector until the (optional,
    bounded) re-rank join. Both quantizers fit on bounded driver
    samples, once.
    """
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    if centroids is None:
        centroids = ivf_fit_centroids(
            corpus, n_clusters, fit_sample, n_iter, vec_col, seed, id_col
        )
    if codebooks is None:
        codebooks = pq_fit_codebooks(
            corpus, n_sub, n_codes, fit_sample, n_iter, vec_col, id_col, seed
        )
    C = np.asarray(centroids, dtype=np.float64)
    CB = np.asarray(codebooks, dtype=np.float64)
    M, K, ds = CB.shape

    def _cdists(series: "pd.Series") -> "np.ndarray":
        import numpy as np

        x = np.stack(series.to_numpy())
        return ((x[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)

    @pandas_udf("array<int>")
    def probe_cells(v: pd.Series) -> pd.Series:
        import numpy as np

        idx = np.argsort(_cdists(v), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.tolist()))

    @pandas_udf("array<array<double>>")
    def dist_table(v: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(v.to_numpy()).astype(np.float64)
        xs = x.reshape(len(x), M, ds)
        d = np.empty((len(x), M, K), dtype=np.float64)
        for m in range(M):  # same per-subspace loop as pq_encode
            d[:, m, :] = (
                (xs[:, m, None, :] - CB[m][None, :, :]) ** 2
            ).sum(axis=2)
        return pd.Series(list(d.tolist()))

    if coded is not None and "__cell" in coded.columns:
        # pre-joined ingest index (id, __cell, __code) — the artifact a
        # deployment persists (bucketed by __cell): no per-query join
        indexed = coded
    elif coded is None and cells is None:
        # from-scratch build: ONE fused scan/Arrow pass, no id join
        indexed = ivfpq_index(
            corpus, CB, C, id_col=id_col, vec_col=vec_col
        )
    else:
        if coded is None:
            coded = pq_encode(corpus, CB, id_col=id_col, vec_col=vec_col)
        if cells is None:
            cells = ivfpq_assign_cells(
                corpus, C, id_col=id_col, vec_col=vec_col
            )
        indexed = coded.join(cells, id_col)
    q = queries.select(
        F.col(query_id_col),
        dist_table(F.col(vec_col)).alias("__qtab"),
        F.explode(probe_cells(F.col(vec_col))).alias("__cell"),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("__code"),
            F.col("__qtab"),
            lambda c, t: F.element_at(t, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = indexed.join(F.broadcast(q), on="__cell").select(
        query_id_col, id_col, adc.alias("adc_dist")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max(k, rerank))
        .select(query_id_col, id_col, "adc_dist", "rank")
    )
    if rerank <= 0:
        return top
    cand = top.select(query_id_col, id_col)
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    exact = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.col("__qv"),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_dist"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def l2_normalize(a: Column) -> Column:
    """Unit-normalize a vector column with JVM expressions (sequential
    fold for the norm — the summation order an ANSI-SQL twin's
    list_dot_product reproduces exactly). On the unit sphere squared L2
    is 2 - 2*cos, so cosine thresholds translate to the L2 geometry the
    PQ/IVF machinery quantizes."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def sdc_tables(codebooks) -> "np.ndarray":
    """Symmetric-distance (SDC) lookup tables from PQ codebooks: entry
    [m][i][j] is the squared L2 between codebook entries i and j of
    subspace m, so the approximate distance between two CODED vectors
    is a pure table-lookup sum — the code-to-code analogue of ADC (no
    float vector touched for either side). (n_sub, n_codes, n_codes),
    tiny (n_sub * n_codes^2 doubles)."""
    import numpy as np

    CB = np.asarray(codebooks, dtype=np.float64)
    return ((CB[:, :, None, :] - CB[:, None, :, :]) ** 2).sum(axis=3)


def semantic_dedup_pairs(
    emb: DataFrame,
    cos_threshold: float = 0.4,
    n_clusters: int = 16,
    n_sub: int = 8,
    n_codes: int = 256,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    centroids: "np.ndarray | None" = None,
    codebooks: "np.ndarray | None" = None,
    index: DataFrame | None = None,
    sdc_slack: float = 2.0,
) -> DataFrame:
    """Semantic near-duplicate pairs (SemDeDup, Abbas et al. 2023 —
    arXiv:2303.09540): the third classic LLM dedup tier after exact
    hashes and MinHash — pairs whose EMBEDDINGS are close, catching
    paraphrases and re-renderings no lexical signature sees. No
    reference counterpart (the reference is tabular-only).

    Shape (the 100-TB recipe, built on the IVF-PQ index):
    1. unit-normalize (squared L2 becomes 2 - 2*cos);
    2. coarse cells + PQ codes — the SAME (id, cell, code) ingest
       artifact ivfpq_knn serves from (pass ``index=`` to reuse a
       persisted/bucketed one; fits run once on a bounded sample);
    3. candidate pairs = self-join WITHIN a cell only (the SemDeDup
       trade: near-identical vectors co-locate in a cell with
       probability ~1, and cross-cell recall is surrendered for
       never comparing all pairs);
    4. SDC pre-filter: the pair distance is a code-to-code table
       lookup sum against one broadcast (n_sub, K, K) table — no
       float vector is read for EITHER side of the pair until
    5. the exact cosine re-check of the bounded survivors
       (>= cos_threshold), the only stage that touches floats.

    The SDC gate keeps pairs with approx-L2^2 <= sdc_slack *
    (2 - 2*cos_threshold): slack absorbs quantization error (recall
    guard), pruning absorbs the quadratic co-cell blowup. Returns
    (id_a, id_b, cos_sim), id_a < id_b — feed to dedup_groups for the
    transitive-closure representative choice.
    """
    import numpy as np

    normed = emb.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("__nv")
    )
    if centroids is None:
        centroids = ivf_fit_centroids(
            normed, n_clusters, fit_sample, n_iter, "__nv", seed, id_col
        )
    if codebooks is None:
        codebooks = pq_fit_codebooks(
            normed, n_sub, n_codes, fit_sample, n_iter, "__nv", id_col, seed
        )
    CB = np.asarray(codebooks, dtype=np.float64)
    M = CB.shape[0]
    if index is None:
        # fused single scan/Arrow pass for (id, cell, code) — same UDFs
        # as the old ivfpq_assign_cells + pq_encode + join build, minus
        # one corpus pass and the id-join exchange.
        # materialize the (id, cell, code) frame once: it IS the ingest
        # artifact a deployment stores, and lazily it would re-derive
        # the Arrow pass on EACH side of the self-join (measured
        # ~1.5x the whole pipeline at 100k vectors). localCheckpoint,
        # not persist — no unpersist hook exists for a lazy result, and
        # ContextCleaner reclaims the checkpoint once the result frame
        # is GC'd (same pattern as trigram_lm_scores).
        index = ivfpq_index(
            normed, CB, centroids, id_col=id_col, vec_col="__nv"
        ).localCheckpoint(eager=True)

    a = index.select(
        F.col(id_col).alias("id_a"),
        F.col("__cell").alias("__cell_a"),
        F.col("__code").alias("__code_a"),
    )
    b = index.select(
        F.col(id_col).alias("id_b"),
        F.col("__cell").alias("__cell_b"),
        F.col("__code").alias("__code_b"),
    )
    pairs = a.join(
        b,
        (F.col("__cell_a") == F.col("__cell_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    # one-row broadcast frame, not a literal: n_sub * n_codes^2 doubles
    # embedded as a CreateArray literal would blow up codegen at K=256
    sdf = local_rows_df(emb.sparkSession, 
        [(sdc_tables(CB).tolist(),)],
        "sdct array<array<array<double>>>",
    )
    sdc = F.aggregate(
        F.sequence(F.lit(0), F.lit(M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(
                F.element_at(F.col("sdct"), m + F.lit(1)),
                F.element_at(F.col("__code_a"), m + F.lit(1)) + F.lit(1),
            ),
            F.element_at(F.col("__code_b"), m + F.lit(1)) + F.lit(1),
        ),
    )
    cand = (
        pairs.crossJoin(F.broadcast(sdf))
        .filter(sdc <= F.lit(sdc_slack * (2.0 - 2.0 * cos_threshold)))
        .select("id_a", "id_b")
    )
    # exact re-check of the bounded survivors: cosine on the RAW
    # vectors (scale-invariant — same formula as
    # embedding_near_dup_exact_pairs, so the twin is shared)
    ea = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    eb = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine(F.col("__va"), F.col("__vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(cos_threshold))
    )


def save_ann_index(
    path: str,
    coded: DataFrame,
    centroids: "np.ndarray | None" = None,
    codebooks: "np.ndarray | None" = None,
) -> None:
    """Persist an ANN serving index as parquet artifacts — the
    ingest-artifact discipline (the classifier save/load precedent): a
    deployment fits the quantizers and encodes the corpus ONCE at
    ingest, then every query session loads the bounded tables instead
    of re-fitting.  ``coded`` is the (vec_id, code/cell...) index
    frame (pq_encode [+ ivfpq_assign_cells] output); ``centroids`` the
    IVF coarse quantizer (n_clusters x dim); ``codebooks`` the PQ
    codebooks (n_sub x n_codes x sub_dim).  Arrays ship as shape-tagged
    flat rows through the engine's writers (DFS-portable)."""
    import os

    import numpy as np

    spark = coded.sparkSession
    coded.write.mode("overwrite").parquet(os.path.join(path, "coded"))

    def _write_array(arr, name):
        flat = [
            (int(i), [float(v) for v in row])
            for i, row in enumerate(arr.reshape(arr.shape[0], -1))
        ]
        df = local_rows_df(spark, flat, "i int, vals array<double>")
        df.write.mode("overwrite").parquet(os.path.join(path, name))
        local_rows_df(spark, 
            [([int(d) for d in arr.shape],)], "shape array<int>"
        ).write.mode("overwrite").parquet(
            os.path.join(path, name + "_shape")
        )

    if centroids is not None:
        _write_array(np.asarray(centroids, dtype=np.float64), "centroids")
    if codebooks is not None:
        _write_array(np.asarray(codebooks, dtype=np.float64), "codebooks")


def load_ann_index(spark, path: str) -> dict:
    """Load an index persisted by ``save_ann_index``:
    {"coded": DataFrame, "centroids": ndarray|None,
    "codebooks": ndarray|None} — plugs straight into
    pq_knn / ivf_knn / ivfpq_knn / knn_graph."""
    import os

    import numpy as np

    out: dict = {
        "coded": spark.read.parquet(os.path.join(path, "coded")),
        "centroids": None,
        "codebooks": None,
    }
    for name in ("centroids", "codebooks"):
        p = os.path.join(path, name)
        try:
            rows = spark.read.parquet(p).orderBy("i").collect()
            shape = spark.read.parquet(p + "_shape").first()["shape"]
        except Exception:
            continue
        arr = np.array([r["vals"] for r in rows], dtype=np.float64)
        out[name] = arr.reshape(tuple(shape))
    return out
