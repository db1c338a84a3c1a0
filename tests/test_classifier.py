"""Hashed char-n-gram NB classifier: holdout discrimination (the
langid_pred precedent), model shape bounds, multi-class argmax, and
the production xxhash64 path."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.data import load_table
from riskloc_spark.functions.classifier import (
    fit_text_classifier,
    hashed_gram_features,
    score_text_classifier,
)
from riskloc_spark.operators.dedup import md5_hash64


def _good_bad(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    good = d.select("doc_id", "text", F.lit("good").alias("label"))
    bad = d.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.reverse("text").alias("text"),
        F.lit("bad").alias("label"),
    )
    return good.unionByName(bad)


def test_holdout_discrimination(spark, sf_dir):
    """Fit on even ids, measure accuracy ONLY on the held-out odd ids:
    the curated-vs-garbled task must be essentially solved (reversed
    text occupies disjoint trigram buckets)."""
    labeled = _good_bad(spark, sf_dir)
    model = fit_text_classifier(
        labeled.filter(F.col("doc_id") % 2 == 0), n_buckets=1024
    )
    holdout = labeled.filter(F.col("doc_id") % 2 == 1)
    scored = score_text_classifier(holdout, model)
    row = (
        scored.join(holdout.select("doc_id", "label"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("pred_label") == F.col("label")).cast("int")
            ).alias("ok"),
        )
        .first()
    )
    assert row["n"] > 100
    assert row["ok"] / row["n"] >= 0.98


def test_model_shape_bounded(spark, sf_dir):
    labeled = _good_bad(spark, sf_dir).filter(
        (F.col("doc_id") % 10_000_000) < 100
    )
    model = fit_text_classifier(labeled, n_buckets=64)
    w = model["weights"]
    assert w.count() <= 2 * 64
    stats = {r["label"]: r for r in model["label_stats"].collect()}
    assert set(stats) == {"good", "bad"}
    # log-probabilities are negative micronats; priors sum to ~ln(1)
    assert all(r["w0"] < 0 for r in stats.values())
    assert all(r["prior"] < 0 for r in stats.values())


def test_three_class_argmax_and_tiebreak(spark):
    rows = []
    for i in range(60):
        rows.append((i, "alpha beta gamma delta " * 4, "aa"))
        rows.append((100 + i, "nop qrs tuv wxy zzz " * 4, "bb"))
        rows.append((200 + i, "111 222 333 444 555 " * 4, "cc"))
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    model = fit_text_classifier(labeled, n_buckets=256,
                                hash_fn=md5_hash64)
    scored = score_text_classifier(labeled, model)
    joined = scored.join(labeled.select("doc_id", "label"), "doc_id")
    n_bad = joined.filter(F.col("pred_label") != F.col("label")).count()
    assert n_bad == 0


def test_short_documents_absent(spark):
    labeled = spark.createDataFrame(
        [(0, "long enough text here", "a"), (1, "hi", "a"),
         (2, "also long enough text", "b")],
        "doc_id long, text string, label string",
    )
    model = fit_text_classifier(labeled, n_buckets=64)
    scored = score_text_classifier(labeled, model)
    assert {r["doc_id"] for r in scored.collect()} == {0, 2}


def test_features_bounded_per_doc(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghij " * 100)], "doc_id long, text string"
    )
    feats = hashed_gram_features(df, n_buckets=16)
    assert feats.count() <= 16
    total = feats.agg(F.sum("cnt")).first()[0]
    # n grams of the normalized text
    norm = "abcdefghij " * 100
    norm = " ".join(norm.split())
    assert total == len(norm) - 2


def test_empty_model_raises_clearly(spark):
    labeled = spark.createDataFrame(
        [(1, "long enough text", "a")],
        "doc_id long, text string, label string",
    )
    # train-mod filter that matches nothing -> empty model
    model = fit_text_classifier(labeled.filter("doc_id % 2 = 0"))
    with pytest.raises(ValueError, match="no labels"):
        score_text_classifier(labeled, model)


def test_null_labels_dropped_in_fit(spark):
    labeled = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 3, "aa"),
         (1, "nop qrs tuv wxy zzz " * 3, "bb"),
         (2, "alpha beta gamma delta " * 3, None),
         (3, "nop qrs tuv wxy zzz " * 3, None)],
        "doc_id long, text string, label string",
    )
    model = fit_text_classifier(labeled, n_buckets=64)
    stats = {r["label"] for r in model["label_stats"].collect()}
    assert stats == {"aa", "bb"}  # no None group, no scoring TypeError
    scored = score_text_classifier(labeled, model)
    assert scored.count() == 4


def test_save_load_round_trip(spark, tmp_path):
    """Persisted model artifacts (weights/label_stats/params parquet)
    must reproduce the in-memory model's predictions exactly — the
    ingest-artifact discipline: fit once, score from the loaded tables
    forever."""
    from pyspark.sql import functions as F

    from riskloc_spark.functions.classifier import (
        fit_text_classifier,
        load_text_classifier,
        save_text_classifier,
        score_text_classifier,
    )

    docs = spark.createDataFrame(
        [(i, ("alpha beta gamma " if i % 2 else "zzz yyy xxx ") * 4,
          "a" if i % 2 else "z") for i in range(40)],
        "doc_id long, text string, label string",
    )
    model = fit_text_classifier(docs, n_buckets=256)
    path = str(tmp_path / "nb_model")
    save_text_classifier(model, path)
    loaded = load_text_classifier(spark, path)
    assert loaded["n"] == model["n"]
    assert loaded["n_buckets"] == 256
    assert loaded["hash_fn"] is model["hash_fn"]
    a = {r["doc_id"]: (r["pred_label"], r["score"]) for r in
         score_text_classifier(docs, model).collect()}
    b = {r["doc_id"]: (r["pred_label"], r["score"]) for r in
         score_text_classifier(docs, loaded).collect()}
    assert a == b and len(a) == 40


def test_save_rejects_unserializable_hash(spark):
    import pytest
    from pyspark.sql import functions as F

    from riskloc_spark.functions.classifier import (
        fit_text_classifier,
        save_text_classifier,
    )

    docs = spark.createDataFrame(
        [(1, "some text here", "a"), (2, "other words now", "b")],
        "doc_id long, text string, label string",
    )
    model = fit_text_classifier(docs, hash_fn=lambda c: F.xxhash64(c))
    with pytest.raises(ValueError):
        save_text_classifier(model, "/tmp/never")
