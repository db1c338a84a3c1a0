"""Dedup operators on planted duplicates: exact, MinHash+LSH, SimHash,
n-gram Jaccard must all find the planted near-dup pair and nothing
between unrelated documents."""
import numpy as np
import pandas as pd
import pytest

from riskloc_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=80))
        rows.append((i, " ".join(words)))
    # 100: exact copy of 0 (modulo whitespace); 101: near-dup of 1 (two
    # word edits); 102: unrelated
    rows.append((100, rows[0][1].upper() + "  "))
    near = rows[1][1].split()
    near[10], near[50] = "changed", "words"
    rows.append((101, " ".join(near)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_exact_dedup_keeps_lowest_id(spark, docs):
    kept = {r[0] for r in exact_dedup(docs).select("doc_id").collect()}
    assert 0 in kept and 100 not in kept
    assert 1 in kept and 101 in kept  # near-dup is NOT exact


def test_minhash_finds_near_dup(spark, docs):
    pairs = minhash_lsh_dedup(docs, jaccard_threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found
    assert (1, 101) in found
    for a, b in found:
        assert {a, b} <= {0, 100} or {a, b} <= {1, 101}


def test_simhash_finds_near_dup(spark, docs):
    pairs = simhash_dedup(docs, max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found


def test_ngram_jaccard_values(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found[(0, 100)] == pytest.approx(1.0)  # normalization-exact copy
    assert 0.5 <= found[(1, 101)] < 1.0
