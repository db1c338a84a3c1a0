"""local_rows_df (data.py): the single-slice literal-frame builder the
query paths use instead of bare createDataFrame (which splits a Python
list into defaultParallelism pickled slices — one Python-worker round
trip per slice per action).  Pins the contract: identical rows and
schema to createDataFrame, exactly one partition, and a working
empty-rows path."""
from riskloc_spark.data import local_rows_df

SCHEMA = "cause string, support double"
ROWS = [("a&b", 0.25), ("c", 0.5), (None, 0.0)]


def test_local_rows_df_matches_create_dataframe(spark):
    got = local_rows_df(spark, ROWS, SCHEMA)
    ref = spark.createDataFrame(ROWS, SCHEMA)
    assert got.schema == ref.schema
    key = lambda t: (t[0] is None, t[0] or "", t[1])
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, ref.collect()), key=key
    )


def test_local_rows_df_is_single_slice(spark):
    assert local_rows_df(spark, ROWS, SCHEMA).rdd.getNumPartitions() == 1


def test_local_rows_df_empty(spark):
    out = local_rows_df(spark, [], SCHEMA)
    assert out.count() == 0
    assert out.schema == spark.createDataFrame([], SCHEMA).schema
