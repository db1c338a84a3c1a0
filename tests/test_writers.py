"""Plan-level guarantees of the scale-path writers: bucketed tables
join without exchanges; partitioned layouts prune directories at
planning time. These are the two layout properties that decide whether
a 100-TB join/scan is feasible, so they are asserted on the PHYSICAL
plan, not just on results."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.data import load_table
from riskloc_spark.sources.writers import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the exchange-elimination is what's
    under test (tiny test tables would otherwise broadcast, which has
    no shuffle either way)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    try:
        write_bucketed(
            docs, "t_docs_b", "doc_id", 8, path=str(tmp_path / "docs")
        )
        write_bucketed(
            emb, "t_emb_b", "doc_id", 8, path=str(tmp_path / "emb")
        )
        a = read_bucketed(spark, "t_docs_b")
        b = read_bucketed(spark, "t_emb_b")
        joined = a.join(b, "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # the whole point: neither side reshuffles — bucket i joins
        # bucket i straight off disk
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
        # contrast: the same join over plain path reads DOES exchange
        plain = (
            spark.read.parquet(str(tmp_path / "docs"))
            .join(spark.read.parquet(str(tmp_path / "emb")), "doc_id")
        )
        assert "Exchange" in _plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_emb_b")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path, no_broadcast):
    docs = load_table(spark, SF_DIR, "documents")
    try:
        write_bucketed(
            docs, "t_docs_agg", "doc_id", 8, path=str(tmp_path / "d2")
        )
        agg = read_bucketed(spark, "t_docs_agg").groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert "Exchange" not in _plan(agg)
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_agg")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "bysource")
    write_partitioned(docs, out, "source")
    src = docs.select("source").first()["source"]
    n_sources = docs.select("source").distinct().count()
    assert n_sources > 1
    back = spark.read.parquet(out)
    one = back.filter(F.col("source") == src)
    plan = _plan(one)
    # the source predicate lands in the scan's PartitionFilters —
    # applied at planning time against directory names, so non-matching
    # partitions are never opened (no row-level Filter needed for it)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "source" in pf
    # round-trip fidelity on the partition slice + the full set
    assert one.count() == docs.filter(F.col("source") == src).count()
    assert back.count() == docs.count()


def test_bucketed_ivfpq_index_probe_join_no_index_exchange(spark, tmp_path):
    """The 100-TB ANN serving layout: the (id, cell, code) IVF-PQ index
    written bucketed on __cell joins the (broadcast) probe list with NO
    exchange of the index side — the scan reads each probed cell's code
    bytes straight off its bucket. Composes write_bucketed with
    ivfpq_knn's serving path."""
    import numpy as np
    from pyspark.sql import functions as F

    from riskloc_spark.data import load_table
    from riskloc_spark.operators.similarity import (
        ivfpq_assign_cells,
        ivfpq_knn,
        pq_encode,
    )
    from riskloc_spark.sources.writers import read_bucketed, write_bucketed

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seeds = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.orderBy("vec_id").limit(16).collect()
        ]
    )
    cb = seeds[:8].reshape(8, 8, 8).transpose(1, 0, 2)
    index = pq_encode(emb, cb).join(ivfpq_assign_cells(emb, seeds), "vec_id")
    write_bucketed(
        index, "t_ivfpq_index", "__cell", 8,
        path=str(tmp_path / "ivfpq_index"),
    )
    try:
        stored = read_bucketed(spark, "t_ivfpq_index")
        q = emb.filter("vec_id < 4").selectExpr(
            "vec_id as query_id", "embedding"
        )
        out = ivfpq_knn(
            emb, q, k=3, n_sub=8, centroids=seeds, codebooks=cb,
            coded=stored,
        )
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "simple"
        )
        # the probe equi-join on __cell must not exchange the index
        # side (only broadcasts of the query side appear); the one
        # hashpartitioning exchange allowed is the rank window's
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert "BroadcastHashJoin" in plan
        assert out.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivfpq_index")


def test_bucketed_near_dup_index_probe_no_index_exchange(
    spark, tmp_path, no_broadcast
):
    """The 100-TB ingestion-dedup layout: build_near_dup_index written
    bucketed on (band, bucket) probes an incoming batch with NO
    exchange of the index side — only the (small) batch shuffles to the
    bucket partitioning, plus the pair-dedup exchange. A plain-path
    read of the same index pays a third exchange (the index side)."""
    from riskloc_spark.operators.dedup import (
        build_near_dup_index,
        incremental_near_dup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    index = build_near_dup_index(docs.filter("doc_id % 3 != 0"))
    write_bucketed(
        index, "t_neardup_index", ["band", "bucket"], 8,
        path=str(tmp_path / "neardup_index"),
    )
    try:
        def simple(df):
            return df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )

        new = docs.filter("doc_id % 3 = 0")
        stored = read_bucketed(spark, "t_neardup_index")
        out = incremental_near_dup(new, stored, jaccard_threshold=0.5)
        # batch-side shuffles only: signature groupBy(doc_id), probe
        # repartition to the bucket layout, pair dedup — the index scan
        # reads its buckets directly
        p = simple(out)
        assert p.count("Exchange hashpartitioning") <= 3, p
        assert "Bucketed: true" in p
        plain = incremental_near_dup(
            new,
            spark.read.parquet(str(tmp_path / "neardup_index")),
            jaccard_threshold=0.5,
        )
        assert simple(plain).count("Exchange hashpartitioning") == 4
        assert out.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_neardup_index")
