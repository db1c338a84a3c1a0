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
    bench_grams = (
        shingle_rows(benchmark, [], bench_text_col or text_col, n)
        .select(hash_fn(F.col("__s")).alias("__g"))
        .distinct()
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
    bloom = bloom_build(
        arch_grams, "__g", m_bits=m_bits, k=k, hash_fn=hash_fn
    ).localCheckpoint(eager=False)  # bounded; reused k+1 times below

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
