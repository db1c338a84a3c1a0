"""Cavnar-Trenkle rank-order language identification: real
discrimination on held-out synthetic languages, integer-exactness of
the distance, and edge behavior."""
import random

import pytest
from pyspark.sql import functions as F

from riskloc_spark.functions.langid import classify_language, lang_profiles


def _corpus(rng, lang, alphabet, n_docs, start_id=0):
    rows = []
    for i in range(n_docs):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 8)))
            for _ in range(25)
        ]
        rows.append((start_id + i, lang, " ".join(words)))
    return rows


def test_langid_holdout_discrimination(spark):
    """Three synthetic languages with disjoint alphabets: a classifier
    fit on train labels must recover every held-out label."""
    rng = random.Random(7)
    train = (
        _corpus(rng, "aa", "abcdefghijk", 40)
        + _corpus(rng, "bb", "nopqrstuvwx", 40, 40)
        + _corpus(rng, "cc", "0123456789", 40, 80)
    )
    test = (
        _corpus(rng, "aa", "abcdefghijk", 8, 200)
        + _corpus(rng, "bb", "nopqrstuvwx", 8, 208)
        + _corpus(rng, "cc", "0123456789", 8, 216)
    )
    tr = spark.createDataFrame(train, "doc_id long, lang string, text string")
    te = spark.createDataFrame(test, "doc_id long, lang string, text string")
    prof = lang_profiles(tr, k=200)
    pred = classify_language(te, prof, k=200)
    j = pred.join(
        te.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    )
    assert j.filter("pred_lang != true_lang").count() == 0


def test_langid_profile_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(0, "xx", "ab ab ab cd"), (1, "yy", "zz zz qq")],
        "doc_id long, lang string, text string",
    )
    p1 = lang_profiles(docs, k=5).collect()
    p2 = lang_profiles(docs, k=5).collect()
    assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))
    by = {(r["lang"], r["rank"]): r["gram"] for r in p1}
    # 'xx' trigrams: "ab " x3 tops; " ab" and "b a" tie at 2 and the
    # tie breaks to the lexicographically smaller (space sorts lowest)
    assert by[("xx", 1)] == "ab "
    assert by[("xx", 2)] == " ab" and by[("xx", 3)] == "b a"


def test_langid_own_language_wins_on_training_text(spark):
    """A document identical to one language's training text must be
    assigned that language with a smaller distance than any other."""
    docs = spark.createDataFrame(
        [
            (0, "aa", "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "bb", "uno dos tres cuatro cinco seis siete ocho nueve"),
        ],
        "doc_id long, lang string, text string",
    )
    prof = lang_profiles(docs, k=100)
    pred = {r["doc_id"]: r for r in classify_language(docs, prof, k=100).collect()}
    assert pred[0]["pred_lang"] == "aa" and pred[1]["pred_lang"] == "bb"
    # a perfect self-match has distance 0 iff the doc profile equals the
    # language profile (single doc per language here)
    assert pred[0]["distance"] == 0


def test_langid_short_document_edge(spark):
    """Documents shorter than the n-gram size produce no grams and are
    absent from the prediction frame (nothing to classify) — callers
    left-join and default."""
    docs = spark.createDataFrame(
        [(0, "aa", "hello there friend of mine"), (1, "aa", "hi")],
        "doc_id long, lang string, text string",
    )
    prof = lang_profiles(docs, k=50)
    out = classify_language(docs, prof, k=50)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {0}
