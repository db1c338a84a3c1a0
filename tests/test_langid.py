"""Cavnar-Trenkle rank-order language identification: real
discrimination on held-out synthetic languages, integer-exactness of
the distance, and edge behavior."""
import random

import pytest
from pyspark.sql import functions as F

from riskloc_spark.functions.langid import (
    classify_language,
    doc_gram_counts,
    lang_profiles,
)


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


def test_shared_doc_counts_bit_identical(spark):
    """The shared doc_gram_counts path (one corpus explode for fit +
    classify, VERDICT r9 #2) must be bit-identical to the independent
    explodes: per-language counts are sums of per-document counts."""
    rows = [
        (i, ["aa", "bb"][i % 2],
         ("alpha beta gamma delta " * (1 + i % 3))
         if i % 2 == 0 else ("nop qrs tuv wxy zzz " * (1 + i % 3)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    counts = doc_gram_counts(docs).localCheckpoint(eager=True)

    prof_direct = lang_profiles(docs, k=80)
    prof_shared = lang_profiles(docs, k=80, doc_counts=counts)
    assert sorted(map(tuple, prof_direct.collect())) == sorted(
        map(tuple, prof_shared.collect())
    )

    pred_direct = classify_language(docs, prof_direct, k=80)
    pred_shared = classify_language(docs, prof_shared, k=80,
                                    doc_counts=counts)
    assert sorted(map(tuple, pred_direct.collect())) == sorted(
        map(tuple, pred_shared.collect())
    )


def test_gram_rows_matches_char_ngrams_including_non_bmp(spark):
    """_gram_rows (staged element_at slide, the linear corpus path) must
    produce exactly the grams of the substring-based _char_ngrams form
    — including across surrogate pairs (split('') yields whole code
    points) and collapsed whitespace runs."""
    from riskloc_spark.functions.langid import _char_ngrams, _gram_rows

    rows = [
        (0, "Hello  World\t!"),
        (1, "ab"),                      # shorter than n -> no grams
        (2, ""),
        (3, None),
        (4, "a\U0001F600b\U0001F680c surrogate pairs"),
        (5, "  leading and trailing  "),
        (6, "éèê accents café"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    via_expr = docs.select(
        "doc_id", F.explode(_char_ngrams(F.col("text"), 3)).alias("gram")
    )
    via_staged = _gram_rows(docs, [F.col("doc_id")], "text", 3)
    assert sorted(map(tuple, via_expr.collect())) == sorted(
        map(tuple, via_staged.collect())
    )
