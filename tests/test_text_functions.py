

def test_winnow_fingerprints_guarantee_and_overlap(spark):
    """The winnowing GUARANTEE: documents sharing a substring of
    length >= k + window - 1 share at least one fingerprint; the
    overlap report surfaces exactly those pairs."""
    from pyspark.sql import functions as F

    from riskloc_spark.functions.text import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    shared = "a very distinctive copied passage indeed"
    rows = [
        (0, f"alpha opening text {shared} closing words"),
        (1, f"totally different frame {shared} and a new tail"),
        (2, "unrelated document with its own content entirely"),
        (3, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=5, window=4)
    sets = {}
    for r in fp.collect():
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert len(sets[0] & sets[1]) >= 1          # the guarantee
    assert not (sets[0] & sets[2] & sets[1])
    # density ~ 2/(w+1): selections are a small fraction of grams
    n_grams0 = len(rows[0][1]) - 4
    assert len(sets[0]) < n_grams0 / 2
    # a 5-char doc has exactly one gram -> one fingerprint
    assert len(sets[3]) == 1

    pairs = {(r["id_a"], r["id_b"]): r["shared_fps"] for r in
             winnow_overlap_pairs(df, min_shared=2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert not any(2 in p or 3 in p for p in pairs)


def test_winnow_fingerprints_validation(spark):
    import pytest

    from riskloc_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, window=0)
