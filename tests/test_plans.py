"""Physical-plan audits (SURVEY §5/§6): predicate pushdown, column
pruning, broadcast joins, and shuffle counts — the properties that make
the operators survive a 100x scale-up."""
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from riskloc_spark.data import load_table, rca_events
from riskloc_spark.functions.scores import add_explanatory_power

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_q6_pushdown_and_pruning(spark):
    df = entry_mod.queries()["q6_forecast_revenue"](spark, SF_DIR)
    plan = plan_str(df)
    assert "PushedFilters:" in plan
    # range filters on shipdate/discount/quantity reach the parquet scan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]
    # column pruning: a 4-column projection must not read the whole table
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema


def test_q5_broadcasts_small_dims(spark):
    df = entry_mod.queries()["q5_local_supplier_volume"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    # nation/region (tiny dims) must come in as broadcast joins, not
    # shuffle joins
    assert plan.count("BroadcastHashJoin") >= 2


def test_global_sums_are_broadcast_not_window(spark):
    """scores attach global sums via crossJoin(broadcast(agg)) — the plan
    must show a broadcast nested loop with a 1-row build side, never an
    Exchange SinglePartition window over the full frame."""
    df = add_explanatory_power(rca_events(spark, SF_DIR))
    plan = plan_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_knn_broadcasts_query_side(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    from riskloc_spark.operators.similarity import knn_bruteforce

    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = plan_str(knn_bruteforce(emb, queries, k=5), "simple")
    assert "BroadcastNestedLoopJoin" in plan


def test_riskloc_layer_scores_single_shuffle(spark):
    """All cuboids of a layer are scored through ONE exchange: the window
    and the groupBy share the (cid, elem) hash partitioning."""
    from riskloc_spark.operators.riskloc import _layer_scores

    df = spark.createDataFrame(
        [("a1", "b1", 1.0, 1.1, 0.1, 0.1, 1, 1.0, 0.1)],
        "a string, b string, real double, predict double, ep double,"
        " ep_z double, partition int, weight double, deviation double",
    )
    scores = _layer_scores(df, [["a"], ["b"]], None)
    plan = plan_str(scores, "simple")
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"


def test_minhash_signature_plan_shape(spark):
    """Signature build: exactly one shuffle (the groupBy on doc id after
    the shingle explode) plus the fan-out repartition of a small scan."""
    from riskloc_spark.operators.dedup import minhash_signatures

    d = load_table(spark, SF_DIR, "documents")
    # num_hashes differs from every other test so the logical plan can't
    # resolve to a frame another test persisted (cache lookup is by plan)
    plan = plan_str(minhash_signatures(d, num_hashes=16), "simple")
    # one round-robin fan-out + one hash exchange for the aggregation
    assert plan.count("Exchange hashpartitioning") == 1


def test_autoroot_distributed_job_count_is_constant(spark):
    """The fused distributed search costs a CONSTANT number of actions
    (pairs probe, cluster sizes, totals, fused winners) — the old path
    launched one orderBy().limit(1) job per (cluster x cuboid). AQE may
    split each action into a few stage-jobs, so assert a small constant
    bound rather than an exact count."""
    import itertools

    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.autoroot import autoroot

    rng = np.random.default_rng(7)
    rows = []
    for a, b in itertools.product(
        [f"a{i}" for i in range(4)], [f"b{i}" for i in range(5)]
    ):
        predict = float(rng.uniform(80, 120))
        real = predict * (1 + rng.uniform(-0.01, 0.01))
        if a == "a1":
            real = predict * 0.2
        if a == "a3":
            real = predict * 1.8  # second cluster on the other side
        rows.append((a, b, real, predict))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["a", "b", "real", "predict"])
    )

    sc = spark.sparkContext
    sc.setJobGroup("autoroot-jobcount", "distributed autoroot")
    causes = autoroot(df, ["a", "b"], driver_rows=None)
    job_ids = sc.statusTracker().getJobIdsForGroup("autoroot-jobcount")
    sc.setJobGroup("", "")
    assert causes, "no causes found"
    flat = [e for c in causes for el in c["elements"] for e in el]
    assert "a1" in flat and "a3" in flat
    # 4 actions; allow AQE stage-splitting headroom. The pre-fix path
    # needed > 30 jobs on this instance (2 clusters x 3 cuboids x several
    # jobs each plus per-cluster counts).
    assert len(job_ids) <= 16, f"{len(job_ids)} jobs: {job_ids}"


def test_semi_anti_join_plan_shapes(spark):
    """EXISTS / NOT EXISTS surfaces compile to semi/anti hash joins with
    the subquery filters pushed below the build side — not to distinct +
    inner join."""
    semi = plan_str(entry_mod.q4_priority_semi(spark, SF_DIR), "simple")
    assert "LeftSemi" in semi
    anti = plan_str(entry_mod.q_customers_without_orders(spark, SF_DIR), "simple")
    assert "LeftAnti" in anti
    # the 1997 filter sits below the anti join (pushed into the scan side)
    assert "PushedFilters" in plan_str(
        entry_mod.q_customers_without_orders(spark, SF_DIR), "formatted"
    )


def test_rollup_single_scan(spark):
    """ROLLUP expands grouping sets from ONE scan of events — the plan
    must contain a single parquet scan, not one per grouping set."""
    plan = plan_str(entry_mod.events_rollup(spark, SF_DIR), "simple")
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_squeeze_distributed_job_count_is_constant(spark):
    """The fused locate costs a constant number of actions (KPI pairs,
    deviation pairs, stats, per-cuboid totals, countDistinct weights,
    and one ps-score job per cluster) — the old path ran ~3 jobs per
    (cluster x cuboid)."""
    import itertools

    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.squeeze import squeeze

    rng = np.random.default_rng(21)
    rows = []
    for a, b, c in itertools.product(
        [f"a{i}" for i in range(4)], [f"b{i}" for i in range(4)],
        [f"c{i}" for i in range(6)],
    ):
        predict = float(rng.uniform(80, 120))
        real = predict * (1 + rng.uniform(-0.02, 0.02))
        if (a, b) == ("a1", "b2"):
            real = predict * (1 - 0.75 - rng.uniform(0, 0.05))
        rows.append((a, b, c, real, predict))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["a", "b", "c", "real", "predict"])
    )

    sc = spark.sparkContext
    sc.setJobGroup("squeeze-jobcount", "distributed squeeze")
    causes = squeeze(df, ["a", "b", "c"], driver_rows=None)
    job_ids = sc.statusTracker().getJobIdsForGroup("squeeze-jobcount")
    sc.setJobGroup("", "")
    assert causes and "a=a1" in ";".join(causes)
    # ~8 actions (+ AQE stage-splitting headroom); the pre-fix path ran
    # > 40 jobs on this 7-cuboid instance
    assert len(job_ids) <= 24, f"{len(job_ids)} jobs: {job_ids}"


def test_rev_rec_distributed_job_count_is_depth_bound(spark):
    """The fused recursion runs ONE explode job per depth across all
    branches — the old path ran a full element aggregation per candidate
    element per depth."""
    import numpy as np
    import pandas as pd

    from riskloc_spark.operators.adtributor import rev_rec_adtributor

    rng = np.random.default_rng(3)
    rows = []
    for a in range(5):
        for b in range(4):
            predict = float(rng.uniform(80, 120))
            real = predict
            if a == 2:
                real = predict * 0.3
            rows.append((f"a{a}", f"b{b}", real, predict))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["a", "b", "real", "predict"])
    )

    sc = spark.sparkContext
    sc.setJobGroup("revrec-jobcount", "distributed rev_rec")
    causes = rev_rec_adtributor(df, ["a", "b"], driver_rows=None)
    job_ids = sc.statusTracker().getJobIdsForGroup("revrec-jobcount")
    sc.setJobGroup("", "")
    flat = [e for cs in causes for el in cs["elements"] for e in el]
    assert "a2" in flat
    # 2 depths -> 2 actions (+ AQE stage-splitting headroom)
    assert len(job_ids) <= 8, f"{len(job_ids)} jobs: {job_ids}"


def test_rev_rec_collect_is_capped_per_dim(spark):
    """The fused recursion's driver transfer is bounded by
    max_candidates_per_dim regardless of dimension cardinality: with a
    small cap on a frame where MANY elements pass teep, the candidate
    list truncates to the cap (lowest-EP dropped) while the EP/surprise
    sums stay exact (pre-cap window aggregates)."""
    import pandas as pd

    from riskloc_spark.operators.adtributor import rev_rec_adtributor

    # 40 'u' elements, each with identical positive anomaly -> every one
    # passes teep on the u dimension
    rows = []
    for u in range(40):
        for b in range(2):
            rows.append((f"u{u:02d}", f"b{b}", 50.0, 100.0))
    # one normal element so the candidate set is a strict subset
    rows.append(("normal", "b0", 100.0, 100.0))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["u", "b", "real", "predict"])
    )

    causes = rev_rec_adtributor(
        df, ["u", "b"], teep=0.001, driver_rows=None,
        max_candidates_per_dim=5,
    )
    u_sets = [
        cs for cs in causes if any(e[0].startswith("u") for e in cs["elements"])
    ]
    assert u_sets, causes
    for cs in u_sets:
        assert len(cs["elements"]) <= 5, cs

    # uncapped parity check on the same frame: distributed == driver path
    drv = rev_rec_adtributor(df, ["u", "b"], teep=0.001, driver_rows=10**9)
    dist = rev_rec_adtributor(df, ["u", "b"], teep=0.001, driver_rows=None)
    key = lambda cs: (cs["dimension"], tuple(map(tuple, cs["elements"])))
    assert sorted(map(key, drv)) == sorted(map(key, dist))


def test_merge_dimensions_single_scan(spark):
    """merge_dimensions must scan its input once (explode + one groupBy),
    not once per dimension — for RCA queries the input is itself an
    aggregation, so per-dimension unions re-derived the whole lineage."""
    import pandas as pd

    from riskloc_spark.operators.adtributor import merge_dimensions

    pdf = pd.DataFrame(
        {"a": ["x", "y"], "b": ["u", "v"], "real": [1.0, 2.0], "predict": [1.0, 2.0]}
    )
    df = spark.createDataFrame(pdf)
    plan = (
        merge_dimensions(df, ["a", "b"], derived=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1, plan
    import re

    assert len(re.findall(r"Exchange", plan)) <= 2, plan


def test_text_stats_single_split_per_row(spark):
    """text_stats/lang_quality must not duplicate the token-split
    expression: the two-stage select keeps one split + one regex per row
    (quality/lang are CASE arithmetic over the stats columns)."""
    import __spark_entry__ as E

    df = E.queries()["text_stats"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # token count: 1 split; stopword_ratio: one lowered-split tree
    # referenced 3x in the plan STRING (hits / zero-guard / divisor —
    # codegen's subexpression elimination computes it once at runtime).
    # Before the two-stage restructure the plan carried ~8 independent
    # split trees (quality_score and lang_id each rebuilt the ratios).
    assert plan.count("split(") <= 4, plan.count("split(")


def test_connected_components_job_count_is_log_bound(spark):
    """connected_components costs O(log diameter) ROUNDS, each a fixed
    handful of actions (one localCheckpoint materialization + one scalar
    convergence agg) — never O(diameter) rounds and never per-vertex
    jobs. A 64-vertex path graph (worst-case diameter 63) must resolve
    within the log-bound round budget."""
    import pandas as pd

    from riskloc_spark.operators.dedup import connected_components

    n = 64
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    )
    sc = spark.sparkContext
    sc.setJobGroup("cc-jobcount", "connected components")
    out = connected_components(pairs, max_iterations=10).collect()
    job_ids = sc.statusTracker().getJobIdsForGroup("cc-jobcount")
    sc.setJobGroup("", "")
    assert {r["group_id"] for r in out} == {0}
    # The hard bound is max_iterations=10 above: the call RAISES if the
    # round count is not log-bounded on diameter 63. Jobs per round are
    # a small AQE-dependent constant (~6: one localCheckpoint
    # materialization across ~4 exchanges + the convergence agg); the
    # naive min-propagation would need 63 rounds (~400 jobs) here.
    assert len(job_ids) <= 80, f"{len(job_ids)} jobs: {job_ids}"


def test_get_cutoff_single_action(spark):
    """get_cutoff fetches BOTH deviation ends in one action (a union of
    the two TakeOrdered subtrees) — previously two sequential
    orderBy+limit collects (round-6 VERDICT item 7). AQE materializes
    the two independent union branches as separate stage-jobs submitted
    CONCURRENTLY, so the job group may contain up to 2 job ids; the old
    shape ran them strictly sequentially as two actions."""
    import pandas as pd

    from riskloc_spark.functions.scores import get_cutoff

    pdf = pd.DataFrame(
        {"deviation": [(-1) ** i * (i / 100.0) for i in range(60)]}
    )
    df = spark.createDataFrame(pdf)
    sc = spark.sparkContext
    sc.setJobGroup("cutoff-jobcount", "single-action cutoff")
    try:
        cutoff = get_cutoff(df, n_remove=5)
    finally:
        sc.setJobGroup(None, None)
    job_ids = sc.statusTracker().getJobIdsForGroup("cutoff-jobcount")
    assert len(job_ids) <= 2, f"{len(job_ids)} jobs: {job_ids}"
    # value parity with the straightforward pandas computation
    devs = sorted(pdf["deviation"].unique())
    min_val, max_val = max(devs[:6]), min(devs[-6:])
    assert cutoff == -min(min_val, max_val, key=abs)


def test_curate_corpus_plan_shape(spark):
    """The curation pipeline must stay a single-exchange plan: stat
    projection + both filters fuse into the scan side (no exchange
    before the dedup groupBy), and the dedup join broadcasts the small
    keep-set side."""
    from riskloc_spark.operators.corpus import curate_corpus

    d = load_table(spark, SF_DIR, "documents")
    out = curate_corpus(d, min_quality=0.5, lang="en")
    plan = plan_str(out)
    # one aggregation exchange (the dedup groupBy); the join back to the
    # surviving ids broadcasts, adding only broadcast exchanges
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles <= 1, plan
    assert "BroadcastHashJoin" in plan


def test_pq_knn_plan_shape(spark):
    """PQ ADC plan contract (round 8): the query side (codes tables)
    reaches the scan via a BROADCAST (no shuffle of the coded corpus
    for the join), and Python appears only in the Arrow encode/table
    UDFs — the per-pair ADC lookup sum is JVM expressions (no
    BatchEvalPython = no row-at-a-time UDF anywhere)."""
    import numpy as np

    from riskloc_spark.operators.similarity import pq_knn

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter("vec_id < 4").selectExpr(
        "vec_id as query_id", "embedding"
    )
    seeds = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").limit(8).collect()
        ]
    )
    cb = seeds.reshape(8, 8, 8).transpose(1, 0, 2)
    out = pq_knn(emb, q, k=3, n_sub=8, codebooks=cb)
    plan = plan_str(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan  # Arrow UDFs only
    assert "ArrowEvalPython" in plan


def test_ivfpq_serving_plan_shape(spark):
    """IVF-PQ serving from a pre-joined index: the probed-cell join
    broadcasts the (tiny) query side and the index side carries NO
    shuffle of its own before the join — the scan reads code bytes
    straight into the equi-join on cell."""
    import numpy as np

    from riskloc_spark.operators.similarity import (
        ivfpq_assign_cells,
        ivfpq_knn,
        pq_encode,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter("vec_id < 4").selectExpr(
        "vec_id as query_id", "embedding"
    )
    seeds = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").limit(16).collect()
        ]
    )
    cb = seeds[:8].reshape(8, 8, 8).transpose(1, 0, 2)
    index = pq_encode(emb, cb).join(
        ivfpq_assign_cells(emb, seeds), "vec_id"
    )
    out = ivfpq_knn(
        emb, q, k=3, n_sub=8, centroids=seeds, codebooks=cb, coded=index
    )
    plan = plan_str(out)
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # exactly one shuffle: the rank window's partitioning by query —
    # the probe join itself must not hash-exchange the corpus index
    # (broadcast side only); the index join (id) may add one when not
    # pre-materialized
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_semantic_dedup_plan_shape(spark):
    """semantic_dedup_pairs contract: Python appears ONLY in the two
    ingest-time Arrow passes (cell assignment + PQ encode — never
    row-at-a-time); the SDC pair distance is a JVM table-lookup fold
    against a BROADCAST one-row table; the exact-cosine re-check joins
    are plain column algebra."""
    import numpy as np

    from riskloc_spark.operators.similarity import semantic_dedup_pairs

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("embedding", "vec_id").orderBy("vec_id").limit(16).collect()
    seeds = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    seeds = seeds / np.sqrt((seeds * seeds).sum(axis=1, keepdims=True))
    out = semantic_dedup_pairs(
        emb, cos_threshold=0.4,
        centroids=seeds, codebooks=seeds[:8].reshape(8, 8, 8).transpose(1, 0, 2),
    )
    plan = plan_str(out, "simple")
    # the (id, cell, code) ingest index is materialized ONCE (round 9:
    # localCheckpoint — lazily, both Arrow ingest passes re-derived on
    # EACH self-join side, ~1.5x the whole pipeline at 100k vectors);
    # the SERVING plan contains no Python at all
    assert "ExistingRDD" in plan, plan
    assert "EvalPython" not in plan, plan
    # the 1-row SDC table comes in broadcast (nested-loop on a single
    # row), never a shuffle; the lookup sum is JVM expression algebra
    # with the m-sequence constant-folded to an array literal
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "element_at(element_at(element_at(sdct" in plan.replace(" ", ""), plan


def test_decontamination_plan_single_corpus_shuffle(spark):
    """contamination_stats contract: the corpus gram set crosses the
    wire ONCE — an explicit repartition(id) that BOTH aggregations
    (per-(id, gram) dedupe, per-doc counts) reuse. The only other hash
    exchange is the bench-side distinct feeding the broadcast
    (bench-volume, tiny by assumption); no Python anywhere."""
    df = entry_mod.queries()["decontamination_audit"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_paragraph_dedup_plan_shape(spark):
    """paragraph_dedup contract: split + posexplode are projections and
    the keep-first is ONE hash exchange (groupBy with map-side partial
    aggregation — boilerplate skew combines before the shuffle, which a
    row_number window could not), with no Python anywhere."""
    from riskloc_spark.operators.dedup import paragraph_dedup

    d = load_table(spark, SF_DIR, "documents")
    plan = plan_str(paragraph_dedup(d))
    # exactly one hash exchange (the keep-first groupBy); the only other
    # exchange allowed is spread_small_scan's round-robin on tiny files
    assert plan.count("hashpartitioning(") == 1, plan
    # partial aggregation runs before the exchange (skew absorption)
    assert "partial_min" in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan


def test_trigram_lm_plan_shape(spark):
    """trigram_lm_scores contract (round 9 shape): the probability
    table is materialized once (localCheckpoint — the corpus-scan
    cache is released before return, so repeated calls do not leak
    persisted RDDs), it BROADCASTS to the per-doc join under the vocab
    limit, and no Python appears anywhere (pure column expressions)."""
    from riskloc_spark.functions.text import trigram_lm_scores

    d = load_table(spark, SF_DIR, "documents")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = trigram_lm_scores(d)
    out.count()
    # the count-table persist must not outlive the call; the ONE
    # surviving entry is the checkpointed vocab table, which (unlike a
    # CacheManager persist) ContextCleaner reclaims once the result
    # frame is garbage-collected
    assert jsc.getPersistentRDDs().size() <= before + 1
    plan = plan_str(out)
    # the probability table is a checkpointed (materialized) RDD scan,
    # not a recomputation of the corpus explode
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan  # no Python UDFs of any kind


def test_trigram_lm_wide_vocab_shuffle_fallback(spark):
    """Past broadcast_vocab_limit distinct trigrams the probability
    join must fall back to a shuffle join (a multilingual/CJK 100-TB
    corpus can push distinct character trigrams beyond any broadcast
    budget) — and produce the same result as the broadcast path."""
    from riskloc_spark.functions.text import trigram_lm_scores

    docs = spark.createDataFrame(
        [(i, f"abcdefgh{i:04d}xyz") for i in range(40)],
        "doc_id long, text string",
    )
    # the guard's job is to stop FORCING broadcast past the vocab
    # budget — under the limit the explicit hint overrides any
    # threshold; past it Catalyst's own statistics decide. Disable
    # auto-broadcast to make the two regimes observable on a tiny
    # table (with it on, Catalyst rightly broadcasts the small side).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fast = trigram_lm_scores(docs)
        slow = trigram_lm_scores(docs, broadcast_vocab_limit=3)
        assert "BroadcastHashJoin" in plan_str(fast)  # hint still wins
        plan = plan_str(slow)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    a = {r["doc_id"]: r for r in fast.collect()}
    b = {r["doc_id"]: r for r in slow.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["n_trigrams"] == b[k]["n_trigrams"]
        assert abs(a[k]["avg_logprob"] - b[k]["avg_logprob"]) < 1e-12


def test_chunk_and_normalize_zero_shuffle(spark):
    """chunk_documents and normalize_text are pure projections — the
    physical plan must carry NO Exchange at all (whatever partitioning
    the input has survives)."""
    from riskloc_spark.functions.text import normalize_text
    from riskloc_spark.operators.packing import chunk_documents

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for df in (
        chunk_documents(d, max_tokens=40, overlap=8),
        normalize_text(d),
    ):
        plan = plan_str(df, "simple")
        assert "Exchange" not in plan, plan


def test_token_budget_sample_single_exchange(spark):
    """token_budget_sample is one per-group window: exactly ONE hash
    exchange (to the group partitioning) and one Window sort."""
    from riskloc_spark.functions.text import token_count
    from riskloc_spark.operators.sampling import token_budget_sample

    d = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .withColumn("n_tokens", token_count(F.col("text")).cast("long"))
        .drop("text")
    )
    out = token_budget_sample(d, {"src0": 400}, default_budget=600)
    plan = plan_str(out, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_frequent_ngrams_takeordered_no_full_sort(spark):
    """frequent_ngrams must end in TakeOrdered (global top-k), never a
    full Sort, and pre-aggregate per (gram, doc) map-side (two
    hash-aggregate pairs, two exchanges: gram+doc, then gram)."""
    from riskloc_spark.operators.dedup import frequent_ngrams

    d = load_table(spark, SF_DIR, "documents")
    plan = plan_str(frequent_ngrams(d, n=3, top_k=30), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_html_extract_zero_shuffle_single_projection(spark):
    """html_to_text is a regexp_replace chain — the extraction plan
    must carry NO Exchange and NO Python evaluation node."""
    from riskloc_spark.operators.html import (
        extract_html_docs,
        synthesize_html_corpus,
    )

    d = load_table(spark, SF_DIR, "documents")
    out = extract_html_docs(synthesize_html_corpus(d))
    plan = plan_str(out, "simple")
    assert "Exchange" not in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_classifier_scoring_broadcasts_model(spark):
    """NB scoring must broadcast both model frames (bounded
    n_labels x n_buckets) — the corpus side never shuffles for the
    model joins; the only hash exchanges are the feature folds and the
    final per-doc argmax."""
    from riskloc_spark.functions.classifier import (
        fit_text_classifier,
        score_text_classifier,
    )

    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", F.col("lang").alias("label")
    )
    model = fit_text_classifier(d, n_buckets=64)
    out = score_text_classifier(d.drop("label"), model)
    plan = plan_str(out, "simple")
    # ONE broadcast join (features x wide pivoted weights) and exactly
    # two corpus exchanges: the (doc, bucket) feature fold and the
    # per-doc aggregation — the model is never shuffle-joined
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_staged_shingles_single_split_per_doc(spark):
    """The staged shingle path must evaluate the normalize+split ONCE
    per document: exactly one split(...) in the explode stage's
    projection, none inside the transform lambda (the no-CSE
    pathology re-normalized per shingle)."""
    from riskloc_spark.operators.dedup import shingle_rows

    d = load_table(spark, SF_DIR, "documents")
    rows = shingle_rows(d, [F.col("doc_id")], "text", 3)
    plan = plan_str(rows, "formatted")
    assert plan.count("split(") == 1, plan


def test_bm25_corpus_side_broadcast_and_window_limit(spark):
    """bm25_topk's corpus side must see only BROADCAST joins (query
    terms, query-restricted df table, one-row stats) — the single
    exchange pair is the posting aggregation + score reduce — and the
    rank<=k filter must compile to WindowGroupLimit (map-side cap)."""
    from riskloc_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"term{i % 5} common text") for i in range(50)],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "term1 common")], "query_id long, query string"
    )
    df = bm25_topk(docs, qs, topk=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "WindowGroupLimit" in plan, plan
    # dl join is doc-keyed (corpus side) — allowed to shuffle; but no
    # cartesian product anywhere except the one-row stats broadcast
    assert "CartesianProduct" not in plan, plan


def test_hll_sketch_single_exchange(spark):
    """hll_sketch is ONE combinable aggregation: exactly one exchange
    (the groupBy bucket), partial agg before it."""
    from riskloc_spark.operators.sketches import hll_sketch

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(100)], "u string"
    )
    plan = (
        hll_sketch(df, "u", p=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange", plan)) == 1, plan
    assert "partial_max" in plan or "HashAggregate" in plan, plan


def test_cms_and_bloom_single_scan(spark):
    """cms_sketch / bloom_build must read the input ONCE: the k/depth
    seeded hashes explode from an in-row array, never a union of
    per-seed scans."""
    from riskloc_spark.operators.bloom import bloom_build
    from riskloc_spark.operators.cms import cms_sketch

    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(50)], "v string"
    )
    for frame in (
        cms_sketch(df, "v", width=64, depth=4),
        bloom_build(df, "v", m_bits=1024, k=4),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") <= 1, plan
        assert "Union" not in plan, plan
