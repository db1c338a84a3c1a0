"""Count-Min sketches (operators/cms.py): registers vs a pure-Python
replay, overestimate-only guarantee, merge == union, absent-item
zero."""
import hashlib

from riskloc_spark.operators.cms import cms_lookup, cms_merge, cms_sketch


def _h60(v, seed) -> int:
    return int(
        hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16
    )


def _py_regs(values, width, depth):
    regs = {}
    for v in values:
        for r in range(depth):
            b = _h60(v, r) % width
            regs[(r, b)] = regs.get((r, b), 0) + 1
    return regs


def _py_est(v, regs, width, depth):
    return min(
        regs.get((r, _h60(v, r) % width), 0) for r in range(depth)
    )


def test_cms_registers_match_python_replay(spark):
    vals = [f"t{i % 40}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, "t", width=64, depth=3).collect()
    }
    assert got == _py_regs(vals, 64, 3)


def test_cms_lookup_overestimates_never_under(spark):
    vals = [f"w{i % 50}" for i in range(2000)] + ["rare"] * 3
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    sk = cms_sketch(df, "t", width=128, depth=4)
    items = spark.createDataFrame(
        [("w0",), ("w7",), ("rare",), ("absent",)], "t string"
    )
    got = {
        r["item"]: r["est"]
        for r in cms_lookup(sk, items, "t", width=128, depth=4).collect()
    }
    true = {"w0": 40, "w7": 40, "rare": 3, "absent": 0}
    regs = _py_regs(vals, 128, 4)
    for item, t in true.items():
        assert got[item] >= t, (item, got[item], t)
        assert got[item] == _py_est(item, regs, 128, 4), item
    assert got["absent"] == _py_est("absent", regs, 128, 4)


def test_cms_merge_equals_union_sketch(spark):
    a = spark.createDataFrame(
        [(f"x{i % 9}",) for i in range(300)], "t string"
    )
    b = spark.createDataFrame(
        [(f"x{i % 13}",) for i in range(500)], "t string"
    )
    kw = dict(width=32, depth=3)
    merged = cms_merge(cms_sketch(a, "t", **kw), cms_sketch(b, "t", **kw))
    union = cms_sketch(a.unionAll(b), "t", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_cms_keyed_and_weighted(spark):
    rows = [("s1", "a", 5), ("s1", "a", 2), ("s1", "b", 1),
            ("s2", "a", 10)]
    df = spark.createDataFrame(rows, "src string, t string, n long")
    sk = cms_sketch(
        df, "t", key_cols=["src"], width=64, depth=3, weight_col="n"
    )
    items = spark.createDataFrame([("a",), ("b",)], "t string")
    got = {
        (r["src"], r["item"]): r["est"]
        for r in cms_lookup(
            sk, items, "t", key_cols=["src"], width=64, depth=3
        ).collect()
    }
    # width 64 >> 2 distinct values: no collisions, estimates exact
    assert got == {("s1", "a"): 7, ("s1", "b"): 1,
                   ("s2", "a"): 10, ("s2", "b"): 0}


def test_cms_xxhash64_and_null_handling(spark):
    """r12 advisory: signed xxhash64 buckets are masked non-negative
    (effective width preserved), and NULLs add no phantom counts on
    either the build or lookup side."""
    from pyspark.sql import functions as F

    from riskloc_spark.operators.dedup import xxhash64_fn

    df = spark.createDataFrame(
        [(f"v{i % 50}",) for i in range(500)] + [(None,)] * 7,
        "t string",
    )
    sk = cms_sketch(df, "t", width=256, depth=4, hash_fn=xxhash64_fn)
    rows = sk.collect()
    assert all(0 <= r["bucket"] < 256 for r in rows)
    assert sum(r["cnt"] for r in rows) == 500 * 4  # NULLs excluded
    items = spark.createDataFrame(
        [("v0",), (None,)], "t string"
    )
    out = cms_lookup(
        sk, items, "t", width=256, depth=4, hash_fn=xxhash64_fn
    ).collect()
    assert len(out) == 1 and out[0]["item"] == "v0"
    assert out[0]["est"] >= 10


def _zipf_rows(n, n_items, seed=3):
    """Deterministic Zipf-ish multiset: item j appears ~ n/(j+1)."""
    rows, rid = [], 0
    for j in range(n_items):
        c = max(1, int(n / (j + 1)))
        for _ in range(c):
            rows.append((rid, f"item{j:03d}"))
            rid += 1
    return rows


def test_heavy_hitters_recover_exact_topk(spark):
    """On a Zipfian corpus with a wide (collision-light) CMS, the
    discovered top-10 equals the exact groupBy-count top-10, every
    estimate overestimates-or-equals its true count, and the result
    is identical under repartitioning."""
    from collections import Counter

    from riskloc_spark.operators.cms import heavy_hitters

    rows = _zipf_rows(2000, 120)
    true = Counter(v for _, v in rows)
    df = spark.createDataFrame(rows, "id long, v string")
    out = heavy_hitters(
        df, "v", "id", top_k=10, sample_k=512, width=2048, depth=4
    ).collect()
    got = [(r["rank"], r["item"], r["est"]) for r in out]
    exact = sorted(
        true.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert [(i, it) for i, it, _ in got] == [
        (i + 1, it) for i, (it, _) in enumerate(exact)
    ], (got, exact)
    for _, it, est in got:
        assert est >= true[it], (it, est, true[it])
    out2 = heavy_hitters(
        df.repartition(13), "v", "id",
        top_k=10, sample_k=512, width=2048, depth=4,
    ).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_heavy_hitter_candidates_recall_and_keys(spark):
    """every >=2%-frequency value lands in the candidate set at
    sample_k=512, and keyed discovery does not leak counts across
    keys (estimates are per-key; a key-b item probed in key a gets
    key a's collision floor, never key b's count)."""
    from riskloc_spark.operators.cms import (
        heavy_hitter_candidates,
        heavy_hitters,
    )

    rows = [("a", i, f"hot{i % 20}") for i in range(1000)]
    rows += [("b", 10000 + i, "bcold") for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, v string")
    cand = {
        (r["g"], r["item"])
        for r in heavy_hitter_candidates(
            df, "v", "id", key_cols=["g"], sample_k=512
        ).collect()
    }
    for j in range(20):  # each hot item is 5% of key a
        assert ("a", f"hot{j}") in cand
    out = heavy_hitters(
        df, "v", "id", key_cols=["g"],
        top_k=3, sample_k=512, width=2048, depth=4,
    ).collect()
    top_b = [r for r in out if r["g"] == "b" and r["rank"] == 1][0]
    assert top_b["item"] == "bcold" and top_b["est"] == 30


def test_cms_lookup_keyed_items_probe_only_their_key(spark):
    """r13 advisory: when the item frame CARRIES the key columns,
    each key is probed only with its own (key, item) pairs — a
    key-b-only item yields NO row for key a (instead of a pooled
    collision-floor estimate), and the output row count is exactly
    the distinct (key, item) pair count, not |keys| x |items|."""
    rows = [("a", f"v{i % 5}") for i in range(100)]
    rows += [("b", "bonly")] * 7
    df = spark.createDataFrame(rows, "g string, t string")
    sk = cms_sketch(df, "t", key_cols=["g"], width=256, depth=3)
    items = spark.createDataFrame(
        [("a", "v0"), ("a", "v1"), ("b", "bonly")], "g string, t string"
    )
    out = cms_lookup(
        sk, items, "t", key_cols=["g"], width=256, depth=3
    ).collect()
    got = {(r["g"], r["item"]): r["est"] for r in out}
    assert got == {("a", "v0"): 20, ("a", "v1"): 20, ("b", "bonly"): 7}
    # pooled fallback: an UNKEYED item frame still probes everywhere
    pooled = cms_lookup(
        sk,
        spark.createDataFrame([("bonly",)], "t string"),
        "t", key_cols=["g"], width=256, depth=3,
    ).collect()
    assert {(r["g"], r["item"]) for r in pooled} == {
        ("a", "bonly"), ("b", "bonly")
    }


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """streaming Count-Min registers (complete mode, availableNow)
    equal the batch sketch register-for-register over the same rows —
    counts are additive, so the streaming aggregation IS the
    sketch."""
    from riskloc_spark.streaming.pipeline import cms_registers_stream

    rows = [(f"t{i % 3}", f"u{i % 41}") for i in range(2000)]
    df = spark.createDataFrame(rows, "event_type string, user_id string")
    path = str(tmp_path / "cmsev")
    df.write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    regs = cms_registers_stream(src, width=128, depth=3)
    name = "tcms_stream_regs"
    q = (
        regs.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = sorted(tuple(r) for r in spark.table(name).collect())
    want = sorted(
        tuple(r)
        for r in cms_sketch(
            df, "user_id", key_cols=["event_type"],
            width=128, depth=3,
        ).select("event_type", "row", "bucket", "cnt").collect()
    )
    assert got == want


def test_cms_join_size_estimate(spark):
    """join-size estimation from registers alone: exact on
    collision-free sketches, NEVER an underestimate under heavy
    collision pressure, and keyed sketches estimate per group."""
    from collections import Counter

    from riskloc_spark.operators.cms import cms_join_size

    rows_a = [(f"v{i % 7}",) for i in range(200)]
    rows_b = [(f"v{i % 5}",) for i in range(150)]
    a = spark.createDataFrame(rows_a, "t string")
    b = spark.createDataFrame(rows_b, "t string")
    ca, cb = Counter(r[0] for r in rows_a), Counter(
        r[0] for r in rows_b
    )
    true = sum(ca[v] * cb[v] for v in ca)
    # wide sketch: 12 distinct values over 512 buckets -> collision-
    # free in every row, estimate EXACT
    kw = dict(width=512, depth=4)
    est = cms_join_size(
        cms_sketch(a, "t", **kw), cms_sketch(b, "t", **kw)
    ).collect()[0]["est"]
    assert est == true
    # tiny sketch: collisions everywhere -> still never UNDER
    kw2 = dict(width=4, depth=2)
    est2 = cms_join_size(
        cms_sketch(a, "t", **kw2), cms_sketch(b, "t", **kw2),
        depth=2,
    ).collect()[0]["est"]
    assert est2 >= true
    # keyed: per-group estimates
    ka = spark.createDataFrame(
        [("g1", "x")] * 10 + [("g2", "y")] * 3, "g string, t string"
    )
    kb = spark.createDataFrame(
        [("g1", "x")] * 7 + [("g2", "z")] * 9, "g string, t string"
    )
    got = {
        r["g"]: r["est"]
        for r in cms_join_size(
            cms_sketch(ka, "t", key_cols=["g"], **kw),
            cms_sketch(kb, "t", key_cols=["g"], **kw),
            key_cols=["g"], depth=4,
        ).collect()
    }
    # disjoint multisets in g2: true join size 0, estimated 0
    empty = cms_join_size(
        cms_sketch(ka.filter("g = 'zzz'"), "t", **kw),
        cms_sketch(kb, "t", **kw), depth=4,
    ).collect()
    assert len(empty) == 1 and empty[0]["est"] == 0
    assert got == {"g1": 70, "g2": 0}
