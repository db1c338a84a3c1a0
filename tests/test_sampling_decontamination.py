"""Deterministic sampling (mixture weights / splits) and benchmark
decontamination: reproducibility, disjointness, nesting, and the
overlap math on planted contamination."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.operators.decontamination import (
    contamination_stats,
    decontaminate,
)
from riskloc_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{(i * 31 + j) % 97}" for j in range(40)),
         f"s{i % 4}")
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_deterministic_sample_is_reproducible_and_near_rate(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "x").collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "x").collect()}
    assert a == b  # pure function of (id, salt)
    assert 0.2 <= len(a) / 400 <= 0.4  # near the rate
    # a different salt draws an effectively independent sample
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "y").collect()}
    assert c != a
    # repartitioning cannot change membership
    d = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(7), 0.3, "x").collect()
    }
    assert d == a


def test_deterministic_samples_are_nested_in_rate(spark, docs):
    """Raising the fraction only ADDS rows (same salt) — mixture
    re-weighting is monotone, not a reshuffle."""
    small = {r["doc_id"] for r in deterministic_sample(docs, 0.2, "m").collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "m").collect()}
    assert small <= big


def test_stratified_sample_rates_per_stratum(spark, docs):
    out = stratified_sample(
        docs, {"s0": 1.0, "s1": 0.5, "s2": 0.0}, "source", salt="st"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src.get("s0", set())) == 100   # rate 1.0: all of s0
    assert "s2" not in by_src                    # rate 0.0
    assert "s3" not in by_src                    # default_fraction 0.0
    assert 30 <= len(by_src["s1"]) <= 70         # rate 0.5 of 100
    # per-stratum membership equals the flat sample at the same rate
    flat = {
        r["doc_id"]
        for r in deterministic_sample(
            docs.filter(F.col("source") == "s1"), 0.5, "st"
        ).collect()
    }
    assert by_src["s1"] == flat


def test_hash_split_disjoint_exhaustive_reproducible(spark, docs):
    out = hash_split(
        docs, {"train": 0.7, "val": 0.2, "test": 0.1}, salt="sp"
    ).collect()
    assert len(out) == 400  # exhaustive: a projection, not a filter
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    tot = sum(len(v) for v in by_split.values())
    assert tot == 400  # disjoint + exhaustive
    assert len(by_split["train"]) > len(by_split["val"]) > len(by_split["test"])
    again = hash_split(
        docs, {"train": 0.7, "val": 0.2, "test": 0.1}, salt="sp"
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in again} == {
        (r["doc_id"], r["split"]) for r in out
    }


def test_sampling_validates_fractions(spark, docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"s0": -0.1}, "source")
    with pytest.raises(ValueError):
        hash_split(docs, {})


def test_contamination_stats_planted_overlap(spark):
    """A doc sharing exactly one 8-gram with the benchmark reports
    n_matched = 1; the benchmark doc itself (if present in the corpus)
    reports contamination 1.0; disjoint docs report 0."""
    bench_text = " ".join(f"b{j}" for j in range(20))  # 13 distinct 8-grams
    clean = " ".join(f"c{j}" for j in range(20))
    # one planted 8-gram from the middle of the benchmark text
    partial = "x0 x1 " + " ".join(f"b{j}" for j in range(5, 13)) + " x2 x3"
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, clean), (3, partial)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "bid long, text string")
    got = {
        r["doc_id"]: r
        for r in contamination_stats(corpus, bench, n=8).collect()
    }
    assert got[1]["n_ngrams"] == 13 and got[1]["contamination"] == 1.0
    assert got[2]["n_matched"] == 0 and got[2]["contamination"] == 0.0
    assert got[3]["n_matched"] == 1  # exactly the planted 8-gram
    assert got[3]["n_ngrams"] == 5   # 12 words -> 5 8-grams
    assert abs(got[3]["contamination"] - 0.2) < 1e-12


def test_decontaminate_strict_and_thresholded(spark):
    bench_text = " ".join(f"b{j}" for j in range(20))
    clean = " ".join(f"c{j}" for j in range(20))
    partial = "x0 x1 " + " ".join(f"b{j}" for j in range(5, 13)) + " x2 x3"
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, clean), (3, partial)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "bid long, text string")
    strict = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()
    )
    assert strict == [2]  # any shared 8-gram rejects
    loose = sorted(
        r["doc_id"]
        for r in decontaminate(
            corpus, bench, n=8, max_contamination=0.5
        ).collect()
    )
    assert loose == [2, 3]  # 20% overlap tolerated, the verbatim copy not
    # evidence columns ride along
    row = decontaminate(corpus, bench, n=8).collect()[0]
    assert {"n_ngrams", "n_matched", "contamination"} <= set(row.asDict())


def test_short_document_is_one_shingle(spark):
    """shingles() contract: a document shorter than n words is ONE
    n-gram of its whole text — a short benchmark question still
    contaminates its verbatim copy."""
    corpus = spark.createDataFrame(
        [(1, "what is the capital"), (2, "something else entirely")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "what is the capital")], "bid long, text string"
    )
    got = {
        r["doc_id"]: r for r in contamination_stats(corpus, bench, n=8).collect()
    }
    assert got[1]["n_ngrams"] == 1 and got[1]["contamination"] == 1.0
    assert got[2]["contamination"] == 0.0


def test_deterministic_sample_composes_with_streaming(spark, tmp_path):
    """The sample is a pure stateless filter, so it composes with
    Structured Streaming unchanged — and because membership is a pure
    function of (id, salt), the streaming sample equals the batch
    sample over the same rows (the property df.sample cannot give a
    stream)."""
    import pandas as pd

    path = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        {"doc_id": range(300), "text": [f"t{i}" for i in range(300)]}
    )
    spark.createDataFrame(pdf).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)
    q = (
        deterministic_sample(stream, 0.4, "sal")
        .writeStream.format("memory")
        .queryName("sampled_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT * FROM sampled_stream").collect()
    }
    want = {
        r["doc_id"] for r in deterministic_sample(static, 0.4, "sal").collect()
    }
    assert got == want and 60 <= len(got) <= 180


def test_token_budget_sample_semantics(spark):
    """Per-group budgets bite independently; kept totals never exceed
    the budget; undershoot is less than the first rejected doc; groups
    without a budget pass through (or take the default); membership is
    stable across partitionings and nested in the budget (a bigger
    budget keeps a superset)."""
    import pandas as pd

    from riskloc_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(30),
                "source": ["a"] * 10 + ["b"] * 10 + ["c"] * 10,
                "n_tokens": list(range(10, 110, 10)) * 3,
            }
        )
    )
    out = token_budget_sample(df, {"a": 120, "b": 300}).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r)
    assert sum(r["n_tokens"] for r in by["a"]) <= 120
    assert sum(r["n_tokens"] for r in by["b"]) <= 300
    assert len(by["c"]) == 10  # no budget, no default -> passthrough
    # audit column equals the running total in hash order
    for g in ("a", "b"):
        rows = sorted(by[g], key=lambda r: r["cum_tokens"])
        run = 0
        for r in rows:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
    # default budget applies to unlisted groups
    out2 = token_budget_sample(df, {"a": 120}, default_budget=150).collect()
    c2 = [r for r in out2 if r["source"] == "c"]
    assert 0 < len(c2) < 10 and sum(r["n_tokens"] for r in c2) <= 150
    # nested: doubling a budget keeps a superset
    small = {
        r["doc_id"] for r in token_budget_sample(df, {"a": 120}).collect()
        if r["source"] == "a"
    }
    big = {
        r["doc_id"] for r in token_budget_sample(df, {"a": 240}).collect()
        if r["source"] == "a"
    }
    assert small <= big
    # stable across partitionings
    again = {
        r["doc_id"]
        for r in token_budget_sample(
            df.repartition(7), {"a": 120, "b": 300}
        ).collect()
    }
    assert again == {r["doc_id"] for r in out}


def test_shuffle_and_shard_deterministic(spark):
    """(shard, pos) is a pure function of (id, salt): stable across
    partitionings; shards disjoint+exhaustive; pos dense per shard."""
    from pyspark.sql import functions as F

    from riskloc_spark.operators.sampling import shuffle_and_shard

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_and_shard(df, 4).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_and_shard(df.repartition(7), 4).collect()}
    assert a == b and len(a) == 500
    sizes = {}
    for s, p in a.values():
        sizes.setdefault(s, []).append(p)
    assert set(sizes) == {0, 1, 2, 3}
    for s, ps in sizes.items():
        assert sorted(ps) == list(range(len(ps)))
    # a different salt is an independent permutation
    c = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_and_shard(df, 4, salt="other").collect()}
    assert c != a
    import pytest
    with pytest.raises(ValueError):
        shuffle_and_shard(df, 0)


def test_write_training_shards_round_trip(spark, tmp_path):
    from pyspark.sql import functions as F

    from riskloc_spark.operators.sampling import (
        shuffle_and_shard,
        write_training_shards,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    out = str(tmp_path / "shards")
    manifest = {r["shard"]: r["rows"] for r in
                write_training_shards(df, out, 4).collect()}
    assert set(manifest) == {0, 1, 2, 3}
    assert sum(manifest.values()) == 200
    # shard directories exist for partition pruning
    import os
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) \
        == [f"shard={i}" for i in range(4)]
    # a reader restoring shard 2 in pos order sees the permutation
    back = spark.read.parquet(out).filter(F.col("shard") == 2) \
        .orderBy("pos").collect()
    expect = sorted(
        ((r["pos"], r["doc_id"]) for r in
         shuffle_and_shard(df, 4).collect() if r["shard"] == 2)
    )
    assert [(r["pos"], r["doc_id"]) for r in back] == expect


def test_read_training_shards_order_and_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from riskloc_spark.operators.sampling import (
        read_training_shards,
        shuffle_and_shard,
        write_training_shards,
    )

    df = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, 3).count()
    back = read_training_shards(spark, out, shard=1).collect()
    assert [r["pos"] for r in back] == list(range(len(back)))
    want = sorted(
        (r["pos"], r["doc_id"]) for r in shuffle_and_shard(df, 3).collect()
        if r["shard"] == 1
    )
    assert [(r["pos"], r["doc_id"]) for r in back] == want
    # pruning: the single-shard plan reads one partition directory
    plan = read_training_shards(spark, out, shard=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan
    allrows = read_training_shards(spark, out).collect()
    assert len(allrows) == 120


def test_cap_per_key_semantics_and_group_limit_plan(spark):
    """cap_per_key keeps exactly k rows per key by priority with the
    id tiebreak, and the rank filter compiles to WindowGroupLimit —
    the map-side partial limit that stops a mega-domain shipping its
    whole row set through the shuffle."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from riskloc_spark.operators.sampling import cap_per_key

    rows = [(i, f"d{i % 3}", i % 10) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, sz int")
    out = cap_per_key(
        df, ["domain"], 4, order_by=[F.col("sz").desc()], id_col="doc_id"
    )
    got = out.collect()
    assert len(got) == 12
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, grp in by_dom.items():
        assert len(grp) == 4
        # driver replay: sz-desc with the doc_id tiebreak
        want = sorted(
            ((i, s) for i, d, s in rows if d == dom),
            key=lambda t: (-t[1], t[0]),
        )[:4]
        assert sorted((r["doc_id"], r["sz"]) for r in grp) == sorted(want)

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_weighted_sample_topk_matches_python_replay(spark):
    """A-ES weighted sampling: the Spark selection equals a pure-
    Python replay of u=(pmod(md5)+1)/(grain+1), key=ln(u)/w, top-k
    with the id tiebreak; zero/null weights never qualify; heavier
    rows win the expected share across salts."""
    import hashlib
    import math

    from riskloc_spark.operators.dedup import md5_hash64
    from riskloc_spark.operators.sampling import weighted_sample_topk

    rows = [(i, "g1" if i % 2 == 0 else "g2",
             (10 if i % 17 == 0 else 1)) for i in range(400)]
    rows += [(1000, "g1", 0), (1001, "g2", None)]  # never sampled
    df = spark.createDataFrame(rows, "doc_id long, g string, w int")

    def py_sample(salt, k=15):
        out = {}
        for i, g, w in rows:
            if not w:
                continue
            h = int(hashlib.md5(
                (f"{i}:{salt}" if salt else str(i)).encode()
            ).hexdigest()[:15], 16) % 1_000_000
            u = (h + 1) / 1_000_001
            out.setdefault(g, []).append((math.log(u) / w, -i))
        keep = {}
        for g, lst in out.items():
            lst.sort(reverse=True)
            keep[g] = {-i for _, i in lst[:k]}
        return keep

    for salt in ("", "s1"):
        got = {}
        for r in weighted_sample_topk(
            df, 15, "w", key_cols=["g"], salt=salt,
            hash_fn=md5_hash64,
        ).collect():
            got.setdefault(r["g"], set()).add(r["doc_id"])
        assert got == py_sample(salt), salt
        assert 1000 not in got.get("g1", set())
        assert 1001 not in got.get("g2", set())
    # weight proportionality across many salts: 10x-weight ids
    # (24/400 rows) should take well over their uniform share
    heavy_hits = total = 0
    for s in range(20):
        sel = py_sample(f"m{s}")
        for g, ids in sel.items():
            for i in ids:
                total += 1
                if i % 17 == 0:
                    heavy_hits += 1
    assert heavy_hits / total > 0.25, (heavy_hits, total)


def test_weighted_sample_topk_window_group_limit_plan(spark):
    from riskloc_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, "g", 1 + i % 5) for i in range(100)],
        "doc_id long, g string, w int",
    )
    out = weighted_sample_topk(df, 5, "w", key_cols=["g"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_bloom_contamination_equals_exact(spark):
    """the archive-scale two-phase audit (bloom prefilter + exact
    re-verification) returns BIT-IDENTICAL output to the one-phase
    exact audit — including under a deliberately tiny filter that
    forces heavy false positives (phase 2 must verify them all
    away)."""
    from riskloc_spark.operators.decontamination import (
        bloom_contamination_stats,
        contamination_stats,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta w{i} x{i} y{i} z{i} "
                "common phrase here too")
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    arch = docs.filter("doc_id % 7 = 0")
    exact = sorted(
        tuple(r) for r in contamination_stats(docs, arch, n=4).collect()
    )
    two_phase = sorted(
        tuple(r)
        for r in bloom_contamination_stats(
            docs, arch, n=4, m_bits=1 << 14, k=4
        ).collect()
    )
    assert two_phase == exact
    fp_heavy = sorted(
        tuple(r)
        for r in bloom_contamination_stats(
            docs, arch, n=4, m_bits=64, k=2
        ).collect()
    )
    assert fp_heavy == exact


def test_bloom_contamination_plan_shape(spark):
    """the two-phase audit's shuffle budget, plan-asserted: exactly
    THREE shuffle exchanges (the bounded bloom-build distinct, the
    FP-bounded maybe-set distinct, and the one corpus-volume audit
    repartition) — every corpus-side probe join is a broadcast."""
    from riskloc_spark.operators.decontamination import (
        bloom_contamination_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"a b c d e{i} f{i}") for i in range(50)],
        "doc_id long, text string",
    )
    arch = docs.filter("doc_id % 5 = 0")
    out = bloom_contamination_stats(
        docs, arch, n=3, m_bits=1 << 12, k=4
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    lines = [
        ln.strip() for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Exchange" in ln
    ]
    shuffles = [ln for ln in lines if "BroadcastExchange" not in ln]
    broadcasts = [ln for ln in lines if "BroadcastExchange" in ln]
    assert len(shuffles) == 3, (shuffles, plan[:500])
    # k probe joins + the maybe and verified broadcasts
    assert len(broadcasts) >= 5, broadcasts


def test_near_dup_contamination_planted_paraphrase(spark):
    """fuzzy decontamination catches PARAPHRASED benchmark leakage the
    exact n-gram audit misses: a corpus doc that copies a benchmark
    item with every 7th word edited shares high Jaccard over 3-gram
    shingles but few exact 8-grams; the audit is complete (every
    corpus doc appears), evidence deterministic, and the filter
    removes exactly the planted docs."""
    from riskloc_spark.operators.decontamination import (
        decontaminate_near_dup,
        near_dup_contamination_stats,
    )

    bench_rows = [
        (100 + b, " ".join(f"b{b}t{j}" for j in range(60)))
        for b in range(5)
    ]
    benchmark = spark.createDataFrame(
        bench_rows, "doc_id long, text string"
    )
    # paraphrase: every 7th token replaced — exact 8-gram overlap ~0,
    # 3-gram shingle Jaccard still high
    def paraphrase(b):
        toks = [
            f"EDIT{j}" if j % 7 == 3 else f"b{b}t{j}"
            for j in range(60)
        ]
        return " ".join(toks)

    corpus_rows = [(b, paraphrase(b)) for b in range(3)]  # planted
    corpus_rows += [
        (10 + i, " ".join(f"c{i}w{j}" for j in range(60)))
        for i in range(20)
    ]  # clean
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, text string"
    )

    # the exact audit at n=8 sees (near) zero contamination
    exact = {
        r["doc_id"]: r["contamination"]
        for r in contamination_stats(corpus, benchmark, n=8).collect()
    }
    assert all(v < 0.05 for v in exact.values()), exact

    # bands=16 (rows_per_band=2) steepens the S-curve enough to
    # catch J ~ 0.4 paraphrases that the dedup-default 32/8 curve
    # (tuned for J >= ~0.5) would coin-flip on
    stats = near_dup_contamination_stats(
        corpus, benchmark, jaccard_threshold=0.3, bands=16
    )
    rows = {r["doc_id"]: r for r in stats.collect()}
    assert len(rows) == 23  # complete audit: every corpus doc
    for b in range(3):
        assert rows[b]["n_bench_matches"] >= 1, rows[b]
        assert rows[b]["bench_id"] == 100 + b
        assert rows[b]["max_est_jaccard"] >= 0.3
    for i in range(20):
        r = rows[10 + i]
        assert r["n_bench_matches"] == 0
        assert r["max_est_jaccard"] == 0.0 and r["bench_id"] is None

    clean = decontaminate_near_dup(
        corpus, benchmark, jaccard_threshold=0.3, bands=16
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [
        10 + i for i in range(20)
    ]
    # id collisions across tables still report (skip_same_id=False):
    # corpus doc 0 vs bench id 0 carrying the same text
    bench_clash = spark.createDataFrame(
        [(0, corpus_rows[0][1])], "doc_id long, text string"
    )
    clash = near_dup_contamination_stats(
        corpus, bench_clash, jaccard_threshold=0.9
    ).filter(F.col("doc_id") == 0).collect()
    assert clash[0]["n_bench_matches"] == 1
    assert clash[0]["bench_id"] == 0


def test_semantic_contamination_exact_and_ivf(spark):
    """the embedding decontamination tier: planted near-identical
    bench vectors (tiny perturbations of corpus rows) are flagged by
    the exact audit with the right evidence; the IVF-pruned path
    agrees with the exact audit on every planted (high-cos) item;
    audits are complete (every corpus vector appears)."""
    import numpy as np

    from riskloc_spark.operators.decontamination import (
        semantic_contamination_stats,
        semantic_contamination_stats_ivf,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((80, 16))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    # bench: perturbed copies of corpus rows 0..4 + 3 unrelated
    bench_rows = [
        (1000 + i,
         [float(x) for x in base[i] + 0.01 * rng.standard_normal(16)])
        for i in range(5)
    ]
    bench_rows += [
        (2000 + j, [float(x) for x in rng.standard_normal(16)])
        for j in range(3)
    ]
    bench = spark.createDataFrame(
        bench_rows, "vec_id long, embedding array<double>"
    )

    exact = {
        r["vec_id"]: r
        for r in semantic_contamination_stats(
            corpus, bench, cos_threshold=0.9
        ).collect()
    }
    assert len(exact) == 80
    for i in range(5):
        assert exact[i]["n_bench_matches"] >= 1
        assert exact[i]["bench_id"] == 1000 + i
        assert exact[i]["max_cos"] > 0.99
    clean = [i for i in range(5, 80) if exact[i]["n_bench_matches"]]
    assert not clean  # random 16-dim cosines never reach 0.9

    ivf = {
        r["vec_id"]: r
        for r in semantic_contamination_stats_ivf(
            corpus, bench, cos_threshold=0.9,
            n_clusters=4, fit_sample=80, seed=3,
        ).collect()
    }
    assert len(ivf) == 80
    # planted near-identical pairs co-locate in a cell w.p. ~1: the
    # pruned audit must agree with the exact one on every planted row
    for i in range(5):
        assert ivf[i]["n_bench_matches"] == exact[i]["n_bench_matches"]
        assert ivf[i]["bench_id"] == exact[i]["bench_id"]
        assert abs(ivf[i]["max_cos"] - exact[i]["max_cos"]) < 1e-12


def test_alpha_mixture_budgets_and_sample(spark):
    """temperature-mixture sampling: budgets follow n^alpha exactly
    (integer-quantized arithmetic, hand-replayed), alpha=1 recovers
    proportional shares, small groups gain share as alpha drops, and
    the sample itself respects every budget deterministically."""
    import math

    from riskloc_spark.operators.sampling import (
        alpha_mixture_budgets,
        alpha_mixture_sample,
    )

    rows = []
    for g, (n_docs, tok) in {
        "big": (90, 20), "mid": (30, 20), "small": (10, 20)
    }.items():
        rows += [(f"{g}-{i}", g, tok) for i in range(n_docs)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, n_tokens long"
    )
    total = 1000
    got = alpha_mixture_budgets(df, total, alpha=0.5)
    # hand replay: w_g = int(sqrt(tokens_g) * 2^20), exact int division
    nts = {"big": 1800, "mid": 600, "small": 200}
    ws = {g: int(math.sqrt(nt) * (1 << 20)) for g, nt in nts.items()}
    den = sum(ws.values())
    assert got == {g: total * w // den for g, w in ws.items()}
    # alpha = 1: proportional to token share
    got1 = alpha_mixture_budgets(df, total, alpha=1.0)
    assert got1["big"] > 3 * got1["mid"] - 5
    # tempering: small's share strictly grows as alpha drops
    share = lambda b: b["small"] / max(1, sum(b.values()))
    assert share(got) > share(got1)

    out = alpha_mixture_sample(df, total, alpha=0.5)
    kept = out.collect()
    per_g = {}
    for r in kept:
        per_g.setdefault(r["source"], []).append(r["cum_tokens"])
    for g, cums in per_g.items():
        assert max(cums) <= got[g], (g, max(cums), got[g])
    # deterministic under repartitioning
    again = alpha_mixture_sample(df.repartition(7), total, alpha=0.5)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, kept)
    )
    # degenerate: zero corpus -> zero budgets, empty sample
    empty = alpha_mixture_budgets(
        df.filter(F.col("n_tokens") < 0), total
    )
    assert empty == {}


def test_alpha_mixture_budgets_null_group_excluded(spark):
    """NULL group values are excluded from the mixture (documented
    contract): budgets are computed over the non-null groups only and
    no TypeError escapes from sorting a None/str key mix."""
    from riskloc_spark.operators.sampling import alpha_mixture_budgets

    df = spark.createDataFrame(
        [("a-1", "a", 100), ("a-2", "a", 100),
         ("b-1", "b", 100), ("x-1", None, 400)],
        "doc_id string, source string, n_tokens long",
    )
    got = alpha_mixture_budgets(df, 300, alpha=1.0)
    assert set(got) == {"a", "b"}
    # alpha=1 over the non-null groups only: 200 vs 100 tokens
    assert got["a"] == 200 and got["b"] == 100


def test_group_split_is_leakage_safe(spark, docs):
    """every group lands WHOLLY in one split (no doc-level leakage),
    splits are exhaustive/disjoint/reproducible, and per-doc
    hash_split would NOT have this property on the same data."""
    from riskloc_spark.operators.sampling import group_split

    out = group_split(
        docs, {"train": 0.5, "val": 0.25, "test": 0.25}, "source"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_group.values()), per_group
    again = group_split(
        docs.repartition(5),
        {"train": 0.5, "val": 0.25, "test": 0.25}, "source",
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, rows)
    )
    # contrast: the per-doc split scatters a group across splits
    doc_level = hash_split(
        docs, {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    scattered = {}
    for r in doc_level.collect():
        scattered.setdefault(r["source"], set()).add(r["split"])
    assert any(len(s) > 1 for s in scattered.values())


def test_near_dup_and_semantic_contamination_plan_shape(spark):
    """plan pins for the round-14 tiers: the MinHash probe joins the
    BROADCAST benchmark index (no corpus-side shuffle for candidate
    generation beyond the signature aggregation), and the exact
    semantic audit broadcasts the benchmark into its nested-loop
    pair scan — neither plan contains a non-broadcast cartesian."""
    from riskloc_spark.operators.decontamination import (
        near_dup_contamination_stats,
        semantic_contamination_stats,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(12)))
         for i in range(40)],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    nd = near_dup_contamination_stats(docs, bench)
    plan = nd._sc._jvm.PythonSQLUtils.explainString(
        nd._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    bemb = emb.filter("vec_id % 9 = 0").select(
        (F.col("vec_id") + 500).alias("vec_id"), "embedding"
    )
    se = semantic_contamination_stats(emb, bemb)
    plan2 = se._sc._jvm.PythonSQLUtils.explainString(
        se._jdf.queryExecution(), "formatted"
    )
    # the pair scan is the INTENDED broadcast nested loop (benchmark
    # side broadcast); a shuffle cartesian would be the bug
    assert "BroadcastNestedLoopJoin" in plan2
    assert "CartesianProduct" not in plan2


def test_benchmark_exposure_stats_planted(spark):
    """the reverse audit: a fully-copied bench item shows exposure
    1.0 and counts its carrier docs; a half-leaked item shows the
    exact gram fraction; an unleaked item shows 0 / 0.0 / 0 and
    still appears (complete audit)."""
    from riskloc_spark.operators.decontamination import (
        benchmark_exposure_stats,
    )

    leaked = " ".join(f"L{j}" for j in range(12))       # 9 4-grams
    half = " ".join(f"H{j}" for j in range(12))
    half_prefix = " ".join(f"H{j}" for j in range(7))   # grams 0..3
    corpus_rows = [
        (1, leaked + " tail one"),
        (2, "head two " + leaked),
        (3, half_prefix + " unrelated suffix words here"),
        (4, "totally unrelated corpus document text " * 3),
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, leaked), (200, half), (300, " ".join(
            f"U{j}" for j in range(12)))],
        "doc_id long, text string",
    )
    got = {
        r["bench_id"]: r
        for r in benchmark_exposure_stats(corpus, bench, n=4).collect()
    }
    assert len(got) == 3
    assert got[100]["n_ngrams"] == 9 and got[100]["n_exposed"] == 9
    assert got[100]["exposure"] == 1.0
    assert got[100]["n_corpus_docs"] == 2
    assert got[200]["n_ngrams"] == 9 and got[200]["n_exposed"] == 4
    assert abs(got[200]["exposure"] - 4 / 9) < 1e-12
    assert got[200]["n_corpus_docs"] == 1
    assert got[300]["n_exposed"] == 0
    assert got[300]["exposure"] == 0.0
    assert got[300]["n_corpus_docs"] == 0


def test_excise_contaminated_spans_planted(spark):
    """span-level decontamination: the quoted benchmark item is cut
    out of a long mostly-clean document (clean words survive), a
    clean doc passes untouched, a fully-contaminated doc comes back
    empty, and overlapping matched grams merge into one span."""
    from riskloc_spark.operators.decontamination import (
        excise_contaminated_spans,
    )

    bench_text = " ".join(f"B{j}" for j in range(10))
    clean_head = " ".join(f"c{j}" for j in range(12))
    clean_tail = " ".join(f"d{j}" for j in range(12))
    corpus = spark.createDataFrame(
        [
            (1, f"{clean_head} {bench_text} {clean_tail}"),
            (2, " ".join(f"x{j}" for j in range(20))),
            (3, bench_text),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in excise_contaminated_spans(corpus, bench, n=4).collect()
    }
    # doc 1: tokens 12..21 carry bench 4-grams at positions 12..18 —
    # ONE merged span covering [12, 22); head+tail survive
    r1 = got[1]
    assert r1["n_spans"] == 1
    assert r1["n_contaminated_grams"] == 7
    assert r1["n_tokens"] == 34 and r1["n_tokens_removed"] == 10
    assert r1["text"] == f"{clean_head} {clean_tail}"
    # doc 2: untouched
    assert got[2]["n_tokens_removed"] == 0
    assert got[2]["n_spans"] == 0
    assert got[2]["text"] == " ".join(f"x{j}" for j in range(20))
    # doc 3: fully covered -> empty rebuild
    assert got[3]["n_tokens_removed"] == got[3]["n_tokens"] == 10
    assert got[3]["text"] == ""


def test_excise_spans_plan_shape(spark):
    """span excision's shuffle budget: the benchmark vocabulary is
    BROADCAST into the position probe (no corpus-side exchange for
    matching); the only corpus-volume shuffles are the removal
    collection and the rebuild join."""
    from riskloc_spark.operators.decontamination import (
        excise_contaminated_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(20)))
         for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, " ".join(f"w3x{j}" for j in range(20)))],
        "doc_id long, text string",
    )
    out = excise_contaminated_spans(docs, bench, n=4)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    lines = [
        ln.strip() for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Exchange" in ln
        and "BroadcastExchange" not in ln
    ]
    # bench-gram distinct + removal groupBy + rebuild join (+AQE reads)
    assert len(lines) <= 4, (lines, plan[:400])
