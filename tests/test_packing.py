"""Sequence packing: next-fit semantics, determinism across
partitionings, over-long documents, and the audit stats."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.operators.packing import pack_documents, packing_stats


def test_next_fit_hand_checked(spark):
    """One bucket, known token sizes: next-fit closes a sequence when
    the next doc would overflow; an over-long doc takes its own."""
    df = spark.createDataFrame(
        [(1, 40), (2, 50), (3, 30), (4, 250), (5, 10), (6, 95)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_tokens"])
        for r in pack_documents(df, max_tokens=100, n_buckets=1).collect()
    }
    # id order: 40+50=90 | 30 (would be 120) -> seq2; 250 over-long ->
    # seq3 alone; 10 -> seq4 (30+... wait 30 then 250 overflows: seq2
    # holds 30 only); 10+... 10 -> seq4, 95 overflows seq4 (105) ->
    # seq5
    assert out[1] == (1, 90) and out[2] == (1, 90)
    assert out[3] == (2, 30)
    assert out[4] == (3, 250)  # own sequence, overflow is the doc's
    assert out[5] == (4, 10)
    assert out[6] == (5, 95)


def test_packing_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i * 7) % 90) for i in range(300)],
        "doc_id long, n_tokens long",
    )
    a = {
        (r["doc_id"], r["bucket"], r["seq_id"])
        for r in pack_documents(df, 128, n_buckets=8).collect()
    }
    b = {
        (r["doc_id"], r["bucket"], r["seq_id"])
        for r in pack_documents(df.repartition(13), 128, n_buckets=8).collect()
    }
    assert a == b and len(a) == 300
    # every sequence respects the budget unless it is a single
    # over-long doc (none here)
    for r in pack_documents(df, 128, n_buckets=8).collect():
        assert r["seq_tokens"] <= 128


def test_packing_stats_audit(spark):
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 200)], "doc_id long, n_tokens long"
    )
    packed = pack_documents(df, max_tokens=100, n_buckets=1)
    row = packing_stats(packed, 100).first()
    # 60 | 60 | 200 -> 3 sequences; waste 40 + 40 + 0 (over-long is
    # not the packer's waste); fills 0.6, 0.6, 1.0 (capped)
    assert row["n_sequences"] == 3 and row["n_docs"] == 3
    assert row["waste_tokens"] == 80
    # mean_fill is rounded to 6 places by the operator
    assert abs(row["mean_fill"] - (0.6 + 0.6 + 1.0) / 3) < 1e-6


def test_packing_validates_args(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_documents(df, 0)
    with pytest.raises(ValueError):
        pack_documents(df, 10, n_buckets=0)


def test_packing_composes_with_token_counts(spark):
    """End of the pipeline: real token counts feed the packer."""
    from riskloc_spark.functions.bpe import bpe_token_counts

    docs = spark.createDataFrame(
        [(i, "the thing in the night " * (1 + i % 3)) for i in range(50)],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g")]
    counted = bpe_token_counts(docs, merges)
    packed = pack_documents(counted, max_tokens=64, n_buckets=4)
    assert packed.count() == 50
    stats = packing_stats(packed, 64).first()
    assert stats["n_docs"] == 50 and stats["mean_fill"] > 0.5


# ---------------------------------------------------------------------------
# chunking (the long-document complement of packing)
# ---------------------------------------------------------------------------

def _mkdocs(spark, sizes):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(sizes)),
                "text": [
                    " ".join(f"d{i}t{j}" for j in range(n))
                    for i, n in enumerate(sizes)
                ],
            }
        )
    )


def test_chunk_boundaries_and_reconstruction(spark):
    from riskloc_spark.operators.packing import chunk_documents

    sizes = [1, 39, 40, 41, 48, 49, 100, 0]
    df = _mkdocs(spark, sizes)
    out = chunk_documents(df, max_tokens=40, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 7 not in by_doc  # blank doc yields nothing
    for i, n in enumerate(sizes):
        if n == 0:
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # start rule: one start per step while past-overlap tokens remain
        assert len(chunks) == (max(n - 8, 1) + 31) // 32
        assert sum(c["n_tokens"] for c in chunks) == n + 8 * (len(chunks) - 1)
        # reconstruction: chunk 0 + the post-overlap tail of each later
        # chunk re-assembles the document exactly
        toks = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            toks += c["chunk_text"].split()[8:]
        assert toks == [f"d{i}t{j}" for j in range(n)]
        # every chunk except the last is full
        assert all(c["n_tokens"] == 40 for c in chunks[:-1])


def test_chunk_no_overlap_and_validation(spark):
    import pytest as _pytest

    from riskloc_spark.operators.packing import chunk_documents

    df = _mkdocs(spark, [70])
    out = sorted(
        chunk_documents(df, max_tokens=32, overlap=0).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_tokens"] for r in out] == [32, 32, 6]
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=32, overlap=32)
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=32, overlap=-1)
