"""IVF ANN: recall vs the exact brute-force baseline."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.data import load_table
from riskloc_spark.operators.similarity import ivf_knn, knn_bruteforce

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = knn_bruteforce(emb, queries, k=5).toPandas()
    ivf = ivf_knn(emb, queries, k=5).toPandas()
    assert set(ivf.columns) == {"query_id", "vec_id", "cos_sim", "rank"}
    bfset = set(map(tuple, bf[["query_id", "vec_id"]].values))
    ivset = set(map(tuple, ivf[["query_id", "vec_id"]].values))
    recall = len(bfset & ivset) / len(bfset)
    assert recall >= 0.5, f"recall {recall}"
    # every query must still return k results (cells are never empty
    # enough to starve a query at these sizes)
    assert ivf.groupby("query_id").size().min() >= 1
