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
