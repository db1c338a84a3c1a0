"""Benchmark decontamination: flag training documents that overlap an
evaluation set.

The published recipe (GPT-3 appendix C, Brown et al. 2020; Dodge et
al. 2021's C4 analysis): a training document is contaminated if it
shares word n-grams (8-13 grams in the literature) with any benchmark/
eval document — exact-substring overlap at n-gram granularity, the
check every serious LLM corpus runs before training so eval numbers
measure generalization, not memorization.

No reference counterpart (the reference is an RCA repo) — part of the
LLM-data-pipeline surface alongside dedup/curation.

Scale shape: the benchmark side is SMALL (eval sets are thousands of
documents against a 100-TB corpus), so its distinct n-gram set
BROADCASTS; the corpus side is one projection (shingle explode — the
same machinery as MinHash) + a broadcast LEFT SEMI-shaped join + one
doc-level aggregation with map-side combine. The corpus is scanned
once and never shuffled except for the per-doc counts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from riskloc_spark.operators.dedup import (
    reuse_checkpoint,
    shingle_rows,
    spread_small_scan,
    xxhash64_fn,
)


def _doc_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int, hash_fn
) -> DataFrame:
    """(id, __g) n-gram hash occurrence rows (NOT deduplicated — the
    per-doc aggregation counts distinct, so deduping here would buy a
    whole extra corpus shuffle). shingle_rows semantics: whitespace-
    normalized word n-grams; a document shorter than n words is ONE
    shingle of its whole text."""
    return shingle_rows(
        spread_small_scan(df), [F.col(id_col)], text_col, n
    ).select(F.col(id_col), hash_fn(F.col("__s")).alias("__g"))


def benchmark_gram_set(
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """(__g): the benchmark's distinct n-gram hash vocabulary — the
    broadcastable static artifact every contamination probe (batch
    ``contamination_stats``, streaming
    ``streaming.pipeline.contamination_stream``) joins against.
    Persist it per benchmark snapshot and skip the re-shingle."""
    return (
        shingle_rows(benchmark, [], text_col, n)
        .select(hash_fn(F.col("__s")).alias("__g"))
        .distinct()
    )


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """Per-document contamination counts: how many of each corpus
    document's distinct word n-grams appear anywhere in the benchmark.

    Returns (id_col, n_ngrams, n_matched, contamination) where
    contamination = n_matched / n_ngrams in [0, 1]. Every corpus
    document appears (clean docs with n_matched = 0), so the output is
    a complete audit table — filter it for the decision, keep it as
    the evidence.

    The benchmark's distinct n-gram set is broadcast (eval sets are
    tiny against a training corpus); pass ``md5_hash64`` as hash_fn
    for an ANSI-SQL-replayable run (production default xxhash64).
    """
    bench_grams = benchmark_gram_set(
        benchmark, n, bench_text_col or text_col, hash_fn
    )
    doc_grams = _doc_ngrams(corpus, text_col, id_col, n, hash_fn)
    # broadcast-probe the RAW occurrence rows (no exchange), then ONE
    # corpus-volume shuffle total: repartition by id, and BOTH
    # aggregations — the per-(id, gram) dedupe and the per-doc counts —
    # reuse that partitioning (hash(id) clusters every (id, gram)
    # group too, so neither groupBy adds an exchange; plan-asserted).
    # The alternatives each shuffle the gram set twice: .distinct()
    # then groupBy(id), or count_distinct (Catalyst's rewrite
    # exchanges on (id, gram, gid) and then on id). Skew is bounded by
    # document length — one partition never holds more than a doc's
    # own grams beyond the hash mix.
    hits = doc_grams.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))),
        "__g",
        "left",
    )
    per_gram = (
        hits.repartition(F.col(id_col))
        .groupBy(id_col, "__g")
        .agg(F.max(F.coalesce(F.col("__hit"), F.lit(0))).alias("__hit"))
    )
    return per_gram.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("__hit").alias("n_matched"),
    ).select(
        id_col,
        "n_ngrams",
        "n_matched",
        (F.col("n_matched") / F.col("n_ngrams")).alias("contamination"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_contamination: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """The clean corpus: documents whose contamination (distinct-n-gram
    overlap fraction vs the benchmark) is <= ``max_contamination``
    (default 0 — any shared n-gram rejects, the strict GPT-3-style
    rule). Keeps the corpus schema and rides the contamination columns
    along — a pipeline that discards its own evidence is unauditable
    (same contract as curate_corpus)."""
    stats = contamination_stats(
        corpus, benchmark, n, text_col, id_col, bench_text_col, hash_fn
    )
    kept = stats.filter(
        F.col("contamination") <= F.lit(float(max_contamination))
    )
    return corpus.join(kept, id_col)


def benchmark_exposure_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """The REVERSE audit: per BENCHMARK item, how exposed is it in
    the training corpus — the eval-side question ("is this benchmark
    still meaningful against this corpus?") that the per-corpus-doc
    audit (``contamination_stats``) answers only indirectly.

    Returns (bench_id, n_ngrams, n_exposed, exposure,
    n_corpus_docs): the item's distinct n-gram count, how many of
    those grams appear ANYWHERE in the corpus, the fraction, and how
    many distinct corpus documents share at least one gram with it.
    Every benchmark item appears (unexposed items with 0 / 0.0 / 0).

    Scale shape: the benchmark gram set broadcasts into ONE corpus
    scan (the same probe as contamination_stats); everything after
    the probe is matched-pair-sized (n>=8 grams shared across
    unrelated documents are rare), so the corpus itself never
    shuffles — the two aggregations run over the (gram, corpus_doc)
    match set and the bench-sized gram table."""
    bid = bench_id_col or id_col
    staged_bench = benchmark.select(
        F.col(bid).alias("__bench_id"),
        F.col(bench_text_col or text_col).alias("__btext"),
    )
    bench_grams = (
        shingle_rows(
            staged_bench, [F.col("__bench_id")], "__btext", n
        )
        .select("__bench_id", hash_fn(F.col("__s")).alias("__g"))
        .distinct()
    )
    # the bench gram table feeds THREE branches (probe, exposure
    # join, per-item totals) — checkpoint the bounded frame once
    bench_grams = reuse_checkpoint(bench_grams)
    corpus_grams = _doc_ngrams(corpus, text_col, id_col, n, hash_fn)
    # ONE corpus scan: keep only occurrences of benchmark grams, then
    # dedupe to (gram, corpus_doc) pairs — matched-set-sized
    matched = (
        corpus_grams.join(
            F.broadcast(bench_grams.select("__g").distinct()), "__g"
        )
        .select("__g", F.col(id_col).alias("__cdoc"))
        .distinct()
    )
    matched = reuse_checkpoint(matched)
    exposed_grams = matched.select("__g").distinct().withColumn(
        "__hit", F.lit(1)
    )
    per_item = (
        bench_grams.join(F.broadcast(exposed_grams), "__g", "left")
        .groupBy("__bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_exposed"),
        )
    )
    docs_per_item = (
        bench_grams.join(matched, "__g")
        .select("__bench_id", "__cdoc")
        .distinct()
        .groupBy("__bench_id")
        .agg(F.count(F.lit(1)).alias("n_corpus_docs"))
    )
    return (
        per_item.join(docs_per_item, "__bench_id", "left_outer")
        .select(
            F.col("__bench_id").alias("bench_id"),
            "n_ngrams",
            "n_exposed",
            (F.col("n_exposed") / F.col("n_ngrams")).alias("exposure"),
            F.coalesce("n_corpus_docs", F.lit(0))
            .cast("long")
            .alias("n_corpus_docs"),
        )
    )


def excise_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """SPAN-level decontamination: instead of dropping a whole
    document that shares n-grams with the benchmark
    (``decontaminate``), cut ONLY the contaminated token spans and
    keep the rest — the right tool when long, mostly-clean documents
    carry a quoted eval item (dropping them wastes the clean 99%).
    The sub-document tier of the decontamination suite, exactly as
    ``remove_duplicate_spans`` is the sub-document tier of dedup —
    and it shares that operator's span-merge + rebuild tail, so
    overlap merging and audit semantics are identical.

    Returns (id, rebuilt text over normalized tokens, n_tokens,
    n_tokens_removed, n_contaminated_grams, n_spans); a fully-covered
    document comes back empty (drop on n_tokens_removed == n_tokens).

    Scale shape: ONE corpus scan — each token position hashes its
    n-gram in-row and probes the BROADCAST benchmark vocabulary
    (benchmark_gram_set; eval-set-sized by contract), so removal
    positions are matched-set-sized and the only corpus-volume
    exchange is the rebuild join.  Corpus documents shorter than n
    tokens contain no n-gram and pass through untouched; benchmark
    items shorter than n contribute their whole-text shingle, which
    can never match a positional n-gram — the document-level tiers
    cover that edge."""
    from riskloc_spark.operators.dedup import (
        _rebuild_after_removals,
        shingle_tokens,
    )

    toks_df = spread_small_scan(corpus).select(
        F.col(id_col), shingle_tokens(F.col(text_col)).alias("__T")
    )
    T = F.col("__T")
    empty_occ = F.array().cast("array<struct<pos:int,h:bigint>>")
    gram_structs = F.when(F.size(T) < n, empty_occ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(T) - n),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                hash_fn(
                    F.concat_ws(" ", F.slice(T, i + 1, n))
                ).alias("h"),
            ),
        )
    )
    occ = toks_df.select(
        F.col(id_col), F.explode(gram_structs).alias("o")
    ).select(
        id_col, F.col("o.pos").alias("pos"), F.col("o.h").alias("h")
    )
    bench_grams = benchmark_gram_set(
        benchmark, n, bench_text_col or text_col, hash_fn
    )
    removed = occ.join(
        F.broadcast(bench_grams.withColumnRenamed("__g", "h")), "h"
    ).select(id_col, "pos")
    return _rebuild_after_removals(
        toks_df, removed, n, id_col, text_col
    ).withColumnRenamed("n_dup_grams", "n_contaminated_grams")


def near_dup_contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """FUZZY-level benchmark decontamination: per corpus document,
    whether it NEAR-DUPLICATES (MinHash-estimated Jaccard >=
    threshold) any benchmark/eval document — the contamination the
    exact n-gram audit (``contamination_stats``) misses when eval
    items are paraphrased, reformatted, or lightly edited into the
    training set (the failure mode Yang et al. 2023, "Rethinking
    benchmark and contamination" documents).

    Returns (id_col, n_bench_matches, max_est_jaccard, bench_id):
    every corpus document appears (clean docs with 0 / 0.0 / NULL),
    the same complete-audit contract as ``contamination_stats`` —
    filter for the decision, keep the evidence.  ``bench_id`` is the
    best-matching benchmark document (max est_jaccard, min id
    tiebreak — deterministic).

    Pure composition of the ingestion-dedup machinery pointed at a
    benchmark: ``build_near_dup_index`` over the (small) benchmark,
    ``incremental_near_dup`` probing it with the corpus as the
    "batch".  Scale shape: the benchmark index is eval-set-sized, so
    the (band, bucket) probe join broadcasts or shuffles only tiny
    rows; the corpus is shingled/signed ONCE (the same one-scan,
    one-groupBy plan as MinHash dedup) and the audit tail is one
    doc-keyed aggregation.  Same-family near-dup detection quality
    follows the LSH S-curve of (num_hashes, bands) — defaults catch
    Jaccard >= ~0.5 with the 32/8 gate-pinned configuration."""
    from riskloc_spark.operators.dedup import (
        build_near_dup_index,
        incremental_near_dup,
    )

    bid = bench_id_col or id_col
    bench = benchmark.select(
        F.col(bid).alias("__bench_id"),
        F.col(bench_text_col or text_col).alias("__btext"),
    )
    index = build_near_dup_index(
        bench, "__btext", "__bench_id",
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        hash_fn=hash_fn,
    )
    matches = incremental_near_dup(
        corpus.select(F.col(id_col), F.col(text_col)),
        # the benchmark index is eval-set-sized by this operator's
        # contract: hint the broadcast instead of waiting for AQE so
        # the corpus side never shuffles for candidate generation
        F.broadcast(index.withColumnRenamed("__bench_id", id_col)),
        text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold, hash_fn=hash_fn,
        # corpus and benchmark are DIFFERENT tables: an id collision
        # across them is coincidence, never a re-submission
        skip_same_id=False,
    )
    per_doc = (
        matches.groupBy(F.col("new_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bench_matches"),
            F.max("est_jaccard").alias("max_est_jaccard"),
            F.min_by(
                "base_id",
                F.struct(
                    (-F.col("est_jaccard")).alias("a"),
                    F.col("base_id").alias("b"),
                ),
            ).alias("bench_id"),
        )
    )
    return (
        corpus.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_bench_matches", F.lit(0))
            .cast("long")
            .alias("n_bench_matches"),
            F.coalesce("max_est_jaccard", F.lit(0.0)).alias(
                "max_est_jaccard"
            ),
            "bench_id",
        )
    )


def decontaminate_near_dup(
    corpus: DataFrame,
    benchmark: DataFrame,
    jaccard_threshold: float = 0.5,
    **kwargs,
) -> DataFrame:
    """The clean corpus under the FUZZY rule: documents that near-
    duplicate NO benchmark document at the threshold.  Rides the
    audit columns along (same evidence contract as ``decontaminate``
    / ``curate_corpus``)."""
    id_col = kwargs.get("id_col", "doc_id")
    stats = near_dup_contamination_stats(
        corpus, benchmark, jaccard_threshold, **kwargs
    )
    kept = stats.filter(F.col("n_bench_matches") == 0)
    return corpus.join(kept, id_col)


def semantic_contamination_stats(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    cos_threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding tier above
    exact n-grams (``contamination_stats``) and MinHash
    (``near_dup_contamination_stats``): a corpus item is contaminated
    if its embedding is within ``cos_threshold`` cosine of any
    benchmark item (the SemDeDup observation pointed at eval leakage:
    re-renderings and translations that share no lexical surface still
    co-locate in embedding space).

    Returns (id_col, n_bench_matches, max_cos, bench_id) — the
    complete per-item audit (clean items with 0 / 0.0 / NULL), max-cos
    / min-id deterministic tiebreak, the same evidence contract as the
    other two tiers.

    Scale shape: EXACT — the benchmark side must be broadcastable
    (eval sets are thousands of rows; norms are computed once per
    side, the corpus is scanned once, and the only exchange is the
    item-keyed audit aggregation).  Per-row cost is O(|bench| * dim)
    — the honest exhaustive audit.  For benchmark sources too big to
    broadcast or corpora where that product hurts, use
    ``semantic_contamination_stats_ivf`` (co-cell pruning, the
    SemDeDup recall trade)."""
    from riskloc_spark.operators.similarity import (
        cosine_with_norms,
        l2_norm,
    )

    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    c = corpus_emb.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    b = bench_emb.select(
        F.col(bid).alias("__bench_id"),
        F.col(bvec).alias("__bv"),
        l2_norm(F.col(bvec)).alias("__bn"),
    )
    pairs = (
        c.crossJoin(F.broadcast(b))
        .select(
            id_col,
            "__bench_id",
            cosine_with_norms(
                F.col("__cv"), F.col("__bv"),
                F.col("__cn"), F.col("__bn"),
            ).alias("__cos"),
        )
        .filter(F.col("__cos") >= F.lit(float(cos_threshold)))
    )
    per_item = pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("__cos").alias("max_cos"),
        F.min_by(
            "__bench_id",
            F.struct(
                (-F.col("__cos")).alias("a"),
                F.col("__bench_id").alias("b"),
            ),
        ).alias("bench_id"),
    )
    return (
        corpus_emb.select(id_col)
        .distinct()
        .join(per_item, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_bench_matches", F.lit(0))
            .cast("long")
            .alias("n_bench_matches"),
            F.coalesce("max_cos", F.lit(0.0)).alias("max_cos"),
            "bench_id",
        )
    )


def semantic_contamination_stats_ivf(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    cos_threshold: float = 0.8,
    n_clusters: int = 16,
    fit_sample: int = 10_000,
    n_iter: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    centroids=None,
) -> DataFrame:
    """The PRUNED semantic audit: both sides are coarse-assigned to
    shared IVF cells (fit on a bounded corpus sample — or pass a
    persisted ``centroids``), and only CO-CELL (corpus, bench) pairs
    pay the exact cosine — the semantic_dedup_pairs trade applied to
    decontamination.  Near-identical vectors co-locate with
    probability ~1, so recall loss is confined to borderline pairs
    near the threshold (property-tested against the exact audit on
    planted duplicates).  Same output columns as
    ``semantic_contamination_stats``; the candidate join is keyed on
    the cell, so neither side is ever cross-joined in full."""
    from riskloc_spark.operators.similarity import (
        cosine_with_norms,
        ivf_fit_centroids,
        ivfpq_assign_cells,
        l2_norm,
        l2_normalize,
    )

    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    cn = corpus_emb.select(
        F.col(id_col), l2_normalize(F.col(vec_col)).alias("__nv")
    )
    if centroids is None:
        centroids = ivf_fit_centroids(
            cn, n_clusters, fit_sample, n_iter, "__nv", seed, id_col
        )
    c_cells = ivfpq_assign_cells(cn, centroids, id_col, "__nv")
    bn = bench_emb.select(
        F.col(bid).alias("__bench_id"),
        l2_normalize(F.col(bvec)).alias("__nv"),
    )
    b_cells = ivfpq_assign_cells(
        bn, centroids, "__bench_id", "__nv"
    )
    c = corpus_emb.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    ).join(c_cells.select(id_col, "__cell"), id_col)
    b = bench_emb.select(
        F.col(bid).alias("__bench_id"),
        F.col(bvec).alias("__bv"),
        l2_norm(F.col(bvec)).alias("__bn"),
    ).join(
        b_cells.select("__bench_id", "__cell"), "__bench_id"
    )
    pairs = (
        c.join(F.broadcast(b), "__cell")
        .select(
            id_col,
            "__bench_id",
            cosine_with_norms(
                F.col("__cv"), F.col("__bv"),
                F.col("__cn"), F.col("__bn"),
            ).alias("__cos"),
        )
        .filter(F.col("__cos") >= F.lit(float(cos_threshold)))
    )
    per_item = pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("__cos").alias("max_cos"),
        F.min_by(
            "__bench_id",
            F.struct(
                (-F.col("__cos")).alias("a"),
                F.col("__bench_id").alias("b"),
            ),
        ).alias("bench_id"),
    )
    return (
        corpus_emb.select(id_col)
        .distinct()
        .join(per_item, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_bench_matches", F.lit(0))
            .cast("long")
            .alias("n_bench_matches"),
            F.coalesce("max_cos", F.lit(0.0)).alias("max_cos"),
            "bench_id",
        )
    )


_HASH_MASK = (1 << 60) - 1  # fold ANY hash into [0, 2^60)


def bloom_contamination_stats(
    corpus: DataFrame,
    archive: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    archive_text_col: str | None = None,
    hash_fn=xxhash64_fn,
) -> DataFrame:
    """``contamination_stats`` for an ARCHIVE-scale contamination
    source (decontaminating against a whole previous corpus, not a
    broadcast-sized eval set): same output, bit-identical — Bloom
    filters have no false negatives and every maybe-hit is exactly
    re-verified — but neither side ever broadcasts or shuffles its
    exact n-gram vocabulary.

    Phase 0: the archive's gram hashes build a Bloom bit table
    (operators/bloom.bloom_build — AT MOST ``m_bits`` rows, a
    KB-to-MB artifact regardless of archive size; persist it per
    archive snapshot and skip this scan on re-runs).
    Phase 1: each corpus gram occurrence probes the BROADCAST bit
    table through k left joins (one per seeded position — row count
    unchanged, zero exchanges); rows whose k positions are all set
    are maybe-contaminated.  The maybe gram set is FP-bounded small,
    so its distinct is a tiny shuffle.
    Phase 2: one more archive scan semi-joins the broadcast maybe
    set to split true matches from Bloom false positives; the
    verified vocabulary (exactly the truly shared grams) then drives
    the standard single-shuffle audit tail.

    Cost: 2 corpus scans + 2 archive scans + one corpus-volume
    exchange (the same per-doc aggregation exact audit pays) — vs
    the exact path's broadcast of the FULL archive vocabulary, which
    stops fitting long before 100 TB.  Equality with
    ``contamination_stats`` is property-tested and gate-pinned."""
    from riskloc_spark.operators.bloom import bloom_build

    arch_grams = shingle_rows(
        spread_small_scan(archive), [], archive_text_col or text_col, n
    ).select(hash_fn(F.col("__s")).alias("__g"))
    bloom = reuse_checkpoint(bloom_build(
        arch_grams, "__g", m_bits=m_bits, k=k, hash_fn=hash_fn
    ))  # bounded; reused k+1 times below

    doc_grams = _doc_ngrams(corpus, text_col, id_col, n, hash_fn)

    def _pos(col, seed):
        return (
            hash_fn(col, seed=seed)
            .bitwiseAND(F.lit(_HASH_MASK)) % m_bits
        ).cast("long")

    # phase 1: k broadcast joins — row identity preserved, no exchange
    probed = doc_grams
    flags = []
    for r in range(k):
        pcol, hcol = f"__p{r}", f"__h{r}"
        probed = probed.withColumn(pcol, _pos(F.col("__g"), r)).join(
            F.broadcast(
                bloom.select(
                    F.col("pos").alias(pcol), F.lit(1).alias(hcol)
                )
            ),
            pcol,
            "left",
        )
        flags.append(F.col(hcol).isNotNull())
    maybe_cond = flags[0]
    for f in flags[1:]:
        maybe_cond = maybe_cond & f
    maybe_grams = (
        probed.filter(maybe_cond).select("__g").distinct()
    )

    # phase 2: exact verification — the archive is scanned once more
    # but only SEMI-joined against the broadcast maybe set
    verified = (
        arch_grams.join(F.broadcast(maybe_grams), "__g", "left_semi")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )

    # audit tail: identical to contamination_stats, with the verified
    # vocabulary standing in for the benchmark broadcast
    hits = doc_grams.join(F.broadcast(verified), "__g", "left")
    per_gram = (
        hits.repartition(F.col(id_col))
        .groupBy(id_col, "__g")
        .agg(F.max(F.coalesce(F.col("__hit"), F.lit(0))).alias("__hit"))
    )
    return per_gram.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("__hit").alias("n_matched"),
    ).select(
        id_col,
        "n_ngrams",
        "n_matched",
        (F.col("n_matched") / F.col("n_ngrams")).alias("contamination"),
    )
