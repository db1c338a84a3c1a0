"""IVF ANN: recall vs the exact brute-force baseline."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.data import load_table
from riskloc_spark.operators.similarity import ivf_knn, knn_bruteforce

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = knn_bruteforce(emb, queries, k=5).toPandas()
    ivf = ivf_knn(emb, queries, k=5).toPandas()
    assert set(ivf.columns) == {"query_id", "vec_id", "cos_sim", "rank"}
    bfset = set(map(tuple, bf[["query_id", "vec_id"]].values))
    ivset = set(map(tuple, ivf[["query_id", "vec_id"]].values))
    recall = len(bfset & ivset) / len(bfset)
    assert recall >= 0.5, f"recall {recall}"
    # every query must still return k results (cells are never empty
    # enough to starve a query at these sizes)
    assert ivf.groupby("query_id").size().min() >= 1


def test_lsh_recall_vs_bruteforce(spark):
    from riskloc_spark.operators.similarity import lsh_bucket_knn

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = knn_bruteforce(emb, queries, k=5).toPandas()
    lsh = lsh_bucket_knn(emb, queries, k=5, num_bits=4).toPandas()
    bfset = set(map(tuple, bf[["query_id", "vec_id"]].values))
    lset = set(map(tuple, lsh[["query_id", "vec_id"]].values))
    # the true nearest neighbor (rank 1 = the query itself, cos=1) is in
    # the query's own bucket by construction
    self_pairs = {(q, q) for q in bf["query_id"].unique()}
    assert self_pairs <= lset
    recall = len(bfset & lset) / len(bfset)
    # random (structure-free) vectors: sign-LSH recall tracks bucket
    # occupancy; 4 bits / 16 buckets gives a stable floor on this corpus
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_precomputed_centroids_match_cold(spark):
    """The query-serving path (centroids fit once via ivf_fit_centroids,
    reused across calls) must return exactly the per-call-fit results —
    same sample, same seed, same quantizer."""
    from riskloc_spark.operators.similarity import ivf_fit_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_fit_centroids(emb)
    cold = ivf_knn(emb, queries, k=5).collect()
    warm = ivf_knn(emb, queries, k=5, centroids=cents).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["vec_id"]) for r in cold]
    ) == sorted([(r["query_id"], r["rank"], r["vec_id"]) for r in warm])


def test_exact_pairs_guard_refuses_large_corpus(spark):
    """The O(n^2) exact baseline must refuse a corpus past max_rows (so
    nobody points it at a real corpus by accident) — and the probe is a
    limit(max_rows+1), not a full count."""
    import pandas as pd

    from riskloc_spark.operators.similarity import (
        embedding_near_dup_exact_pairs,
    )

    rows = pd.DataFrame(
        {"vec_id": range(20), "embedding": [[1.0, 0.0]] * 20}
    )
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="max_rows"):
        embedding_near_dup_exact_pairs(df, max_rows=10).count()
    # under the cap (or explicitly overridden) it runs
    assert embedding_near_dup_exact_pairs(df, max_rows=20).count() == 190
    assert embedding_near_dup_exact_pairs(df, max_rows=None).count() == 190


def test_ivf_multiprobe_recall_curve_on_clustered_corpus(spark):
    """Multi-probe recall curve on a CLUSTERED corpus (the IVF premise —
    real embedding corpora cluster; the near-uniform testdata embeddings
    are the worst case where recall ~= probed fraction): recall@5 must
    be monotone in n_probe and >= 0.95 at n_probe=4, with the quantizer
    fit ONCE and reused (equi-join probe path preserved)."""
    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.similarity import ivf_fit_centroids

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 16)) * 5.0
    vecs = []
    for i in range(800):
        c = centers[i % 8]
        vecs.append((c + rng.standard_normal(16) * 0.4).astype(np.float32))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(800), "embedding": [v.tolist() for v in vecs]}
        )
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": range(10),
                "embedding": [vecs[i * 37].tolist() for i in range(10)],
            }
        )
    )
    bf = knn_bruteforce(corpus, queries, k=5).toPandas()
    bfset = set(map(tuple, bf[["query_id", "vec_id"]].values))

    cents = ivf_fit_centroids(corpus, n_clusters=8, fit_sample=800)
    recalls = {}
    for n_probe in (1, 2, 4):
        ivf = ivf_knn(
            corpus, queries, k=5, n_clusters=8, n_probe=n_probe,
            centroids=cents,
        ).toPandas()
        ivset = set(map(tuple, ivf[["query_id", "vec_id"]].values))
        recalls[n_probe] = len(bfset & ivset) / len(bfset)
    assert recalls[1] <= recalls[2] + 1e-9 and recalls[2] <= recalls[4] + 1e-9, recalls
    assert recalls[4] >= 0.95, recalls


# ---------------------------------------------------------------------------
# Product quantization (round 8)


def test_pq_exact_when_codebooks_contain_subvectors(spark):
    """With codebooks whose entries include every corpus subvector, each
    vector's code reconstructs it exactly (its own subvector is at
    distance 0), so the ADC distance IS the true squared L2 and pq_knn
    must equal the exact L2 ranking."""
    import numpy as np

    from riskloc_spark.operators.similarity import pq_knn

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(24, 16)).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in vecs[i] + 0.01]) for i in range(3)],
        "query_id long, embedding array<float>",
    )
    # codebooks[m][j] = vector j's m-th subvector (4 subspaces x 4 dims)
    cb = np.stack(
        [vecs.astype(np.float32).astype(np.float64)[:, m * 4: (m + 1) * 4]
         for m in range(4)]
    )
    out = pq_knn(corpus, queries, k=3, n_sub=4, codebooks=cb)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"] for r in out.collect()
    }
    # exact L2 ranking on the float32-rounded values
    vf = vecs.astype(np.float32).astype(np.float64)
    for qi in range(3):
        qv = (vecs[qi] + 0.01).astype(np.float32).astype(np.float64)
        d = ((vf - qv) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(vecs)), d))
        for rank, vid in enumerate(order[:3], start=1):
            assert got[(100 + qi, rank)] == vid


def test_pq_fitted_codebooks_recall_on_clustered_data(spark):
    """End-to-end with the REAL k-means fit: on clustered vectors the
    true nearest neighbor (brute force) appears in PQ's top-5 for the
    overwhelming majority of queries."""
    import numpy as np

    from riskloc_spark.operators.similarity import (
        knn_bruteforce,
        pq_fit_codebooks,
        pq_knn,
    )

    rng = np.random.default_rng(9)
    centers = rng.normal(scale=4.0, size=(6, 32))
    vecs = np.concatenate(
        [c + rng.normal(scale=0.4, size=(40, 32)) for c in centers]
    )
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i * 17 % len(vecs)] + 0.05])
         for i in range(12)],
        "query_id long, embedding array<float>",
    )
    cb = pq_fit_codebooks(corpus, n_sub=4, n_codes=16, fit_sample=500)
    assert cb.shape == (4, 16, 8)
    pq = pq_knn(corpus, queries, k=5, n_sub=4, codebooks=cb)
    bf = knn_bruteforce(corpus, queries, k=1)
    top1 = {r["query_id"]: r["vec_id"] for r in bf.collect()}
    pq_sets: dict = {}
    for r in pq.collect():
        pq_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for qid, vid in top1.items() if vid in pq_sets[qid])
    assert hits >= 10, (hits, len(top1))


def test_ivfpq_recall_with_fitted_quantizers(spark):
    """IVF-PQ end-to-end with REAL fits (coarse k-means + per-subspace
    codebooks) and exact re-rank: perturbed-copy queries on a clustered
    corpus must recover their true neighbor in the top-5 for nearly all
    queries — pruning (probe) and compression (ADC) composing without
    destroying recall."""
    import numpy as np

    from riskloc_spark.operators.similarity import (
        ivf_fit_centroids,
        ivfpq_knn,
        pq_fit_codebooks,
    )

    rng = np.random.default_rng(21)
    centers = rng.normal(scale=4.0, size=(8, 32))
    vecs = np.concatenate(
        [c + rng.normal(scale=0.3, size=(50, 32)) for c in centers]
    )
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    qidx = [(i * 37) % len(vecs) for i in range(12)]
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[qidx[i]] + 0.02]) for i in range(12)],
        "query_id long, embedding array<float>",
    )
    cents = ivf_fit_centroids(corpus, n_clusters=8, fit_sample=400)
    cb = pq_fit_codebooks(corpus, n_sub=4, n_codes=32, fit_sample=400)
    out = ivfpq_knn(
        corpus, queries, k=5, n_probe=3, n_sub=4,
        centroids=cents, codebooks=cb, rerank=50,
    )
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for i in range(12) if qidx[i] in got.get(i, set()))
    assert hits >= 11, (hits, got)


def test_semantic_dedup_pairs_finds_planted_near_dups(spark):
    """Fitted quantizers on clustered vectors: every planted near-dup
    pair (a vector plus a tiny perturbation of it — cosine ~1) is
    recovered, no pair is reported between distinct cluster centers,
    and reported cosines match the exact pairwise values."""
    import numpy as np

    from riskloc_spark.operators.similarity import (
        pq_fit_codebooks,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(21)
    centers = rng.normal(scale=4.0, size=(8, 32))
    base = np.concatenate(
        [c + rng.normal(scale=0.3, size=(30, 32)) for c in centers]
    )  # 240 well-separated vectors
    dups = base[::12] + rng.normal(scale=0.01, size=(20, 32))  # 20 planted
    vecs = np.concatenate([base, dups])
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup_pairs(
        corpus, cos_threshold=0.95, n_clusters=8, n_sub=4, n_codes=16
    )
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out.collect()}
    planted = {(j * 12, 240 + j) for j in range(20)}
    assert planted <= set(got), planted - set(got)
    # no cross-center pair sneaks past the exact cosine re-check
    fv = vecs.astype(np.float32).astype(np.float64)  # storage is float32
    nv = fv / np.linalg.norm(fv, axis=1, keepdims=True)
    for (a, b), cs in got.items():
        assert abs(cs - float(nv[a] @ nv[b])) < 1e-9
        assert cs >= 0.95


def test_semantic_dedup_pairs_accepts_prebuilt_index(spark):
    """The serving path: a pre-built (id, cell, code) ingest index
    yields the same pairs as the cold path with the same quantizers."""
    import numpy as np

    from riskloc_spark.operators.similarity import (
        ivf_fit_centroids,
        ivfpq_assign_cells,
        l2_normalize,
        pq_encode,
        pq_fit_codebooks,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(22)
    centers = rng.normal(scale=4.0, size=(4, 16))
    base = np.concatenate(
        [c + rng.normal(scale=0.3, size=(25, 16)) for c in centers]
    )
    dups = base[::10] + rng.normal(scale=0.01, size=(10, 16))
    vecs = np.concatenate([base, dups])
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    normed = corpus.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("__nv")
    )
    cents = ivf_fit_centroids(normed, 4, vec_col="__nv")
    cb = pq_fit_codebooks(normed, n_sub=4, n_codes=16, vec_col="__nv")
    index = ivfpq_assign_cells(normed, cents, "vec_id", "__nv").join(
        pq_encode(normed, cb, id_col="vec_id", vec_col="__nv"), "vec_id"
    )
    cold = semantic_dedup_pairs(
        corpus, cos_threshold=0.95, n_clusters=4, n_sub=4, n_codes=16,
        centroids=cents, codebooks=cb,
    )
    warm = semantic_dedup_pairs(
        corpus, cos_threshold=0.95, codebooks=cb, index=index,
    )
    a = {(r["id_a"], r["id_b"]) for r in cold.collect()}
    b = {(r["id_a"], r["id_b"]) for r in warm.collect()}
    assert a == b and len(a) >= 10


def test_curate_corpus_semantic_composes(spark):
    """Pipeline: quality/lang filtering happens BEFORE the pair graph
    (a junk doc that is semantically identical to a kept one must not
    suppress it), then one representative (min id) per semantic
    group."""
    import numpy as np

    from riskloc_spark.operators.corpus import curate_corpus_semantic

    good = (
        "the quick brown fox jumps over the lazy dog and it is a fine "
        "day for all of the animals in the field."
    )
    rng = np.random.default_rng(23)
    v = rng.normal(size=(5, 16))
    v[1] = v[0] + 0.001  # doc 1 ~ doc 0 semantically
    v[3] = v[2] + 0.001  # doc 3 ~ doc 2, but doc 2 is junk
    docs = spark.createDataFrame(
        [
            (0, good, "s"),
            (1, good + " with a few extra words.", "s"),
            (2, "short", "s"),  # junk: filtered before the pair graph
            (3, good + " entirely different framing here.", "s"),
            (4, good + " and another unrelated document.", "s"),
        ],
        "doc_id long, text string, source string",
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v[i]]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    out = curate_corpus_semantic(
        docs, emb, min_quality=0.5, lang="en", cos_threshold=0.95,
        n_clusters=2, n_sub=4, n_codes=4,
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 0~1 collapse to 0; 2 junk; 3 survives (its twin was junk); 4 kept
    assert kept == [0, 3, 4]


def test_knn_graph_recall_on_clustered_corpus(spark):
    """kNN-graph recall vs the exact graph on a clustered corpus: with
    a fitted quantizer and n_probe=3 of 8 cells, the top-5 neighbor
    sets must overlap the exact ones >= 0.9 on average, self-pairs are
    absent, and every vector gets exactly k rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from riskloc_spark.operators.similarity import (
        cosine_with_norms,
        ivf_fit_centroids,
        knn_graph,
        l2_norm,
    )

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((8, 16)) * 5.0
    vecs = []
    for i in range(400):
        c = centers[i % 8]
        vecs.append((c + rng.standard_normal(16) * 0.4).astype(np.float32))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(400), "embedding": [v.tolist() for v in vecs]}
        )
    )
    cents = ivf_fit_centroids(corpus, 8, fit_sample=400, n_iter=10)
    approx = knn_graph(corpus, k=5, n_probe=3, centroids=cents)
    rows = approx.collect()
    assert all(r["vec_id"] != r["nbr_id"] for r in rows)
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    assert all(len(s) == 5 for s in per_vec.values())

    # exact graph via self cross-join (fine at 400 vectors)
    a = corpus.select(
        F.col("vec_id"), F.col("embedding").alias("av"),
        l2_norm(F.col("embedding")).alias("an"),
    )
    b = corpus.select(
        F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("bv"),
        l2_norm(F.col("embedding")).alias("bn"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cs").desc(), F.col("nbr_id").asc()
    )
    exact = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id", "nbr_id",
            cosine_with_norms(
                F.col("av"), F.col("bv"), F.col("an"), F.col("bn")
            ).alias("cs"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    )
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    recalls = [
        len(per_vec[v] & exact_sets[v]) / 5 for v in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9


def test_knn_graph_gemm_matches_expression_path(spark):
    """The blocked-GEMM scan must reproduce the expression path's
    edges EXACTLY — same neighbors, same ranks, cosines equal at the
    gate's 6-decimal rounding (and in practice bit-identical after
    the float64 recompute)."""
    import numpy as np
    from pyspark.sql import functions as F

    from riskloc_spark.operators.similarity import (
        ivf_fit_centroids,
        knn_graph,
    )

    # 3 planted clusters + noise, enough vectors for multi-vector cells
    corpus = spark.range(120).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    ((F.col("id") % 3) * 10
                     + (F.abs(F.xxhash64("id", F.lit(j))) % 100) / 50.0)
                ).cast("float")
                for j in range(8)
            ]
        ).alias("embedding"),
    )
    cents = ivf_fit_centroids(corpus, n_clusters=4, fit_sample=200)
    expr = {(r["vec_id"], r["rank"]): (r["nbr_id"],
                                       round(r["cos_sim"], 6))
            for r in knn_graph(corpus, k=4, n_probe=2,
                               centroids=cents).collect()}
    gemm = {(r["vec_id"], r["rank"]): (r["nbr_id"],
                                       round(r["cos_sim"], 6))
            for r in knn_graph(corpus, k=4, n_probe=2, centroids=cents,
                               method="gemm").collect()}
    assert expr == gemm and len(expr) > 0


def test_knn_graph_unknown_method_raises(spark):
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from riskloc_spark.operators.similarity import knn_graph

    corpus = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).cast("array<float>")
        .alias("embedding"),
    )
    with pytest.raises(ValueError):
        knn_graph(corpus, centroids=np.ones((2, 2)), method="nope")


def test_ann_index_save_load_round_trip(spark, tmp_path):
    """A persisted (coded, centroids, codebooks) index must serve the
    exact same neighbors as the in-memory one — fit at ingest, load
    forever."""
    import numpy as np
    from pyspark.sql import functions as F

    from riskloc_spark.operators.similarity import (
        ivf_fit_centroids,
        ivfpq_assign_cells,
        ivfpq_knn,
        load_ann_index,
        pq_encode,
        pq_fit_codebooks,
        save_ann_index,
    )

    corpus = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    ((F.col("id") % 4) * 8
                     + (F.abs(F.xxhash64("id", F.lit(j))) % 64) / 32.0)
                ).cast("float")
                for j in range(16)
            ]
        ).alias("embedding"),
    )
    cb = pq_fit_codebooks(corpus, n_sub=4, n_codes=16, fit_sample=300)
    cents = ivf_fit_centroids(corpus, n_clusters=4, fit_sample=300)
    coded = pq_encode(corpus, cb).join(
        ivfpq_assign_cells(corpus, cents), "vec_id"
    )
    queries = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def run(codebooks, centroids, index):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"],
             round(r["adc_dist"], 9))
            for r in ivfpq_knn(
                corpus, queries, k=3, n_clusters=4, n_probe=2,
                n_sub=4, centroids=centroids, codebooks=codebooks,
                rerank=20, coded=index,
            ).collect()
        )

    before = run(cb, cents, coded)
    path = str(tmp_path / "ann_index")
    save_ann_index(path, coded, centroids=cents, codebooks=cb)
    loaded = load_ann_index(spark, path)
    assert loaded["centroids"].shape == cents.shape
    assert loaded["codebooks"].shape == cb.shape
    assert np.allclose(loaded["centroids"], cents)
    assert np.allclose(loaded["codebooks"], cb)
    after = run(loaded["codebooks"], loaded["centroids"], loaded["coded"])
    assert before == after and len(before) > 0

    # centroids-only index (plain IVF) loads with codebooks None
    path2 = str(tmp_path / "ivf_only")
    save_ann_index(path2, coded.select("vec_id", "__cell"),
                   centroids=cents)
    l2 = load_ann_index(spark, path2)
    assert l2["codebooks"] is None and l2["centroids"] is not None


def test_coarse_assign_chunked_dists_bit_identical(spark):
    """The r15 chunked quantizer contract: blocking the (batch, K, dim)
    distance temporary over centroid blocks must not move a single bit
    (same subtract/square/sum-over-dim per element), and the derived
    cell (probes[0] of the STABLE argsort) must equal the plain argmin
    the pre-r15 cell_of computed."""
    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.similarity import _coarse_assign_udfs

    rng = np.random.default_rng(11)
    # 257 centroids: exercises a partial final 64-block
    C = rng.normal(size=(257, 32))
    x = rng.normal(size=(500, 32))
    # near-tie rows: two centroids at equal distance from the row, so a
    # reformulated (non-bit-identical) distance would flip the argmin
    x[:8] = (C[3] + C[200]) / 2.0

    one_shot = ((x[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    chunked = np.empty((len(x), len(C)), dtype=np.float64)
    for k0 in range(0, len(C), 64):
        blk = C[k0:k0 + 64]
        chunked[:, k0:k0 + len(blk)] = (
            (x[:, None, :] - blk[None, :, :]) ** 2
        ).sum(axis=2)
    assert np.array_equal(one_shot, chunked)  # bitwise, not allclose

    # probes[0] == argmin through the actual UDF pair
    cell_of, probe_cells = _coarse_assign_udfs(C, n_probe=3)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(x)),
                      "embedding": list(x.tolist())})
    )
    got = (
        df.select(
            "vec_id",
            cell_of(F.col("embedding")).alias("cell"),
            probe_cells(F.col("embedding")).alias("probes"),
        )
        .withColumn("cell_from_probes", F.element_at("probes", 1))
        .collect()
    )
    assert len(got) == len(x)
    for r in got:
        assert r["cell"] == r["cell_from_probes"]
        assert r["cell"] == int(one_shot[r["vec_id"]].argmin())


def test_ivfpq_index_fused_matches_two_pass_build(spark):
    """The r15 fused ingest pass: ivfpq_index (one scan, one
    ArrowEvalPython, no id join) must produce the EXACT rows of the
    two-pass pq_encode(c).join(ivfpq_assign_cells(c), id) build — same
    ids, same cells, same codes — and its plan must carry exactly one
    ArrowEvalPython node where the two-pass build carries two plus an
    id-join exchange."""
    from riskloc_spark.operators.similarity import (
        ivf_fit_centroids,
        ivfpq_assign_cells,
        ivfpq_index,
        pq_encode,
        pq_fit_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_fit_codebooks(emb, n_sub=8, n_codes=16, fit_sample=64)
    cents = ivf_fit_centroids(emb, n_clusters=4, fit_sample=64)

    fused = ivfpq_index(emb, cb, cents)
    two_pass = pq_encode(emb, cb).join(
        ivfpq_assign_cells(emb, cents), "vec_id"
    )

    def rows(df):
        return sorted(
            (r["vec_id"], r["__cell"], tuple(r["__code"]))
            for r in df.collect()
        )

    a, b = rows(fused), rows(two_pass)
    assert len(a) > 0 and a == b

    # executedPlan's AQE toString repeats the tree ("== Final Plan ==" +
    # "== Initial Plan =="); count nodes in the final section only
    plan = fused._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1
    assert "Join" not in final
