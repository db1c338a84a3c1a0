"""End-to-end training-data pipeline integration: every stage is
individually oracle-gated; this test pins that they COMPOSE — the full
curate -> near-dup dedup -> decontaminate (exact + fuzzy) -> mixture
sample -> leakage-safe split -> pack -> shard chain runs on the real
sf0.001 documents table and every cross-stage invariant holds."""
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    from riskloc_spark.data import load_table

    return load_table(spark, SF_DIR, "documents")


def test_full_training_pipeline_composes(spark, documents, tmp_path):
    from riskloc_spark.functions.text import token_count
    from riskloc_spark.operators.corpus import curate_corpus_near_dup
    from riskloc_spark.operators.decontamination import (
        decontaminate,
        decontaminate_near_dup,
    )
    from riskloc_spark.operators.packing import (
        pack_documents,
        packing_stats,
    )
    from riskloc_spark.operators.sampling import (
        alpha_mixture_sample,
        group_split,
        read_training_shards,
        write_training_shards,
    )

    n_raw = documents.count()

    # 1. curate: quality/lang filter + near-dup dedup
    curated = curate_corpus_near_dup(
        documents, min_quality=0.3, lang=None, jaccard_threshold=0.5
    )
    n_curated = curated.count()
    assert 0 < n_curated <= n_raw
    # no exact-duplicate normalized text survives
    dups = (
        curated.groupBy(
            F.regexp_replace(
                F.lower(F.trim("text")), r"[ \t\n\x0B\f\r]+", " "
            ).alias("k")
        )
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0

    # 2. decontaminate: exact n-gram + fuzzy near-dup vs a benchmark
    bench = documents.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    clean = decontaminate(curated, bench, n=4)
    clean = decontaminate_near_dup(
        clean.select(*curated.columns), bench, jaccard_threshold=0.5
    ).select(*curated.columns)
    n_clean = clean.count()
    assert 0 < n_clean < n_curated  # the planted bench family left
    kept_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not any(i % 17 == 0 for i in kept_ids)

    # 3. temperature-mixture sample to a token budget per source
    staged = clean.withColumn(
        "n_tokens", token_count(F.col("text")).cast("long")
    )
    sampled = alpha_mixture_sample(staged, total_tokens=2000, alpha=0.5)
    assert 0 < sampled.count() <= n_clean
    from riskloc_spark.operators.sampling import alpha_mixture_budgets

    budgets = alpha_mixture_budgets(staged, 2000, alpha=0.5)
    per_src = (
        sampled.groupBy("source")
        .agg(F.max("cum_tokens").alias("mx"))
        .collect()
    )
    for r in per_src:
        assert r["mx"] <= budgets[r["source"]]

    # 4. leakage-safe split: whole sources to one side
    split = group_split(
        sampled, {"train": 0.7, "val": 0.3}, "source"
    )
    per_group = {}
    for r in split.select("source", "split").distinct().collect():
        per_group.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_group.values())

    # 5. pack the train split into fixed-token sequences
    train = split.filter(F.col("split") == "train")
    packed = pack_documents(train, max_tokens=128)
    st = packing_stats(packed, 128).collect()[0]
    assert st["n_docs"] == train.count()
    over = packed.filter(F.col("seq_tokens") > 128)
    # only single-doc sequences may exceed the cap (oversized docs)
    for r in over.collect():
        assert r["seq_tokens"] >= 128

    # 6. shard + read back: the permutation round-trips
    shards = str(tmp_path / "shards")
    manifest = write_training_shards(train, shards, n_shards=4)
    assert manifest.agg(F.sum("rows")).collect()[0][0] == train.count()
    back = read_training_shards(spark, shards)
    assert back.count() == train.count()
    assert set(
        r["doc_id"] for r in back.select("doc_id").collect()
    ) == set(r["doc_id"] for r in train.select("doc_id").collect())
