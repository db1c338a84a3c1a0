"""Data-quality expectations (operators/expectations.py): per-rule
violation counts in one scan, NULL conventions, unique extras, and
deterministic failure examples."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.operators.expectations import (
    expectation_failures,
    validate_expectations,
)

RULES = [
    {"col": "id", "kind": "not_null"},
    {"col": "id", "kind": "unique"},
    {"col": "kind", "kind": "in_set", "values": ["a", "b"]},
    {"col": "v", "kind": "range", "min": 0, "max": 100},
    {"col": "code", "kind": "regex", "pattern": "^[A-Z]{2}[0-9]+$"},
]


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 5.0, "AB12"),
        (2, "b", 100.0, "ZZ9"),
        (2, "a", -1.0, "bad"),      # dup id, low v, bad code
        (None, "c", 150.0, None),   # null id, bad kind, high v
        (4, "a", None, "QQ1"),      # null v (not a range violation)
    ]
    return spark.createDataFrame(
        rows, "id long, kind string, v double, code string"
    )


def test_validate_expectations_counts(spark, frame):
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"],
                    round(r["violation_rate"], 6))
        for r in validate_expectations(frame, RULES).collect()
    }
    assert got == {
        "id_not_null": (5, 1, 0.2),
        "id_unique": (5, 1, 0.2),        # one EXTRA row for id 2
        "kind_in_set": (5, 1, 0.2),
        "v_range": (5, 2, 0.4),          # -1 and 150; NULL skipped
        "code_regex": (5, 2, 0.4),       # ZZ9 ok; 'bad' + ... wait
    } or got, got
    # exact expectations spelled out (ZZ9 matches ^[A-Z]{2}[0-9]+$)
    assert got["code_regex"] == (5, 1, 0.2)
    assert got["id_not_null"] == (5, 1, 0.2)
    assert got["id_unique"] == (5, 1, 0.2)
    assert got["kind_in_set"] == (5, 1, 0.2)
    assert got["v_range"] == (5, 2, 0.4)


def test_validate_expectations_clean_and_empty(spark):
    clean = spark.createDataFrame(
        [(1, "a", 1.0, "AA1")], "id long, kind string, v double, code string"
    )
    got = {
        r["rule"]: r["n_violations"]
        for r in validate_expectations(clean, RULES).collect()
    }
    assert set(got.values()) == {0}
    empty = clean.filter("id < 0")
    got0 = validate_expectations(empty, RULES).collect()
    assert all(r["n_violations"] == 0 and r["n_rows"] == 0
               and r["violation_rate"] == 0.0 for r in got0)
    with pytest.raises(ValueError):
        validate_expectations(clean, [])
    with pytest.raises(ValueError):
        validate_expectations(clean, [{"col": "id", "kind": "nope"}])


def test_expectation_failures_examples(spark, frame):
    got = {}
    for r in expectation_failures(frame, RULES, "id").collect():
        got.setdefault(r["rule"], []).append(r["id"])
    assert got["id_unique"] == [2]
    assert got["v_range"] == [2, None] or got["v_range"] == [None, 2]
    assert got["kind_in_set"] == [None]


def test_cli_pipeline_expect(spark, tmp_path):
    """the expect subcommand end-to-end through the subprocess
    entrypoint with every rule-spec form."""
    import subprocess
    import sys

    data = str(tmp_path / "d")
    spark.createDataFrame(
        [(1, "a", 5.0), (2, "c", 150.0), (2, "a", None)],
        "id long, kind string, v double",
    ).write.parquet(data)
    out = str(tmp_path / "audit")
    r = subprocess.run(
        [
            sys.executable, "-m", "riskloc_spark.cli", "pipeline",
            "expect", data, "--output", out,
            "--rule", "id:not_null", "--rule", "id:unique",
            "--rule", "kind:in_set:a|b",
            "--rule", "v:range:0:100",
            "--rule", "kind:regex:^[a-z]$",
            "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {
        r2["rule"]: r2["n_violations"]
        for r2 in spark.read.parquet(out).collect()
    }
    assert got == {"id_not_null": 0, "id_unique": 1,
                   "kind_in_set": 1, "v_range": 1, "kind_regex": 0}


def test_expectations_stream_equals_batch(spark, tmp_path, frame):
    """streaming expectations (complete mode, availableNow) equal the
    batch audit row-for-row over the same files; state is one row of
    counters; 'unique' is refused with a pointer at the bounded
    alternatives."""
    from riskloc_spark.streaming.pipeline import expectations_stream

    rules = [r for r in RULES if r["kind"] != "unique"]
    path = str(tmp_path / "rows")
    frame.write.parquet(path)
    stream = spark.readStream.schema(frame.schema).parquet(path)
    out = expectations_stream(stream, rules)
    q = (
        out.writeStream.format("memory")
        .queryName("expect_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = sorted(
        map(tuple, spark.table("expect_stream").collect())
    )
    want = sorted(
        map(tuple, validate_expectations(frame, rules).collect())
    )
    assert got == want
    with pytest.raises(ValueError, match="unique"):
        expectations_stream(stream, RULES)


def test_expectations_stream_mirrors_batch_validation(spark, tmp_path, frame):
    """the streaming twin fails fast exactly like the batch contract:
    empty rule lists and unknown kinds raise ValueError up front
    instead of silently emitting zero rows."""
    from riskloc_spark.streaming.pipeline import expectations_stream

    path = str(tmp_path / "rows_v")
    frame.write.parquet(path)
    stream = spark.readStream.schema(frame.schema).parquet(path)
    with pytest.raises(ValueError, match="non-empty"):
        expectations_stream(stream, [])
    with pytest.raises(ValueError, match="unknown expectation kind"):
        expectations_stream(stream, [{"col": "id", "kind": "bogus"}])
    # batch twin behaves identically on the same inputs
    with pytest.raises(ValueError):
        validate_expectations(frame, [])
    with pytest.raises(ValueError):
        validate_expectations(frame, [{"col": "id", "kind": "bogus"}])
