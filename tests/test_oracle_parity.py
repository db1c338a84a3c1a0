"""Mimics the driver's correctness gate: every queries() entry with an
oracle_sql() twin must match DuckDB on row count, column names, and values
(order-insensitive)."""
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, columns):
    """Sort columns by name, then rows; stringify floats at 1e-9."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def _family(dtype):
    return {"i": "int", "u": "int", "f": "float"}.get(dtype.kind)


def test_oracle_output_dtype_families(spark, duck):
    """Registry-wide pin of the r12/r13 driver-red class: for every
    oracled gate, each numeric output column must land in the same
    int-vs-float family on BOTH sides of the driver's comparator —
    the Spark result through `toPandas()` vs the oracle through
    DuckDB's pandas bridge (`.df()`).  Both pandas conversions, NOT
    `df.dtypes` vs `fetchall()`, because pandas is where the seams
    live: DuckDB 1.0 widens an integer SUM to HUGEINT -> float64
    (the q12-r12 / q11+q12-r13 reds: Spark int64 '3' hashed against
    '3.0'), while an int column WITH NULLs promotes to float64 on
    BOTH bridges and cancels out (events_rollup.hr under ROLLUP —
    driver-green, and this test must agree).  Discipline: wrap
    integer-SUM oracle outputs in `CAST(... AS BIGINT)`
    (q9/q11/q12 style)."""
    from concurrent.futures import ThreadPoolExecutor

    def check(name):
        # Spark schedules concurrent actions from driver threads fine
        # (FIFO back-fill — guide §2.6); DuckDB connections are not
        # thread-safe, so each worker takes its own cursor.  The gates
        # are independent, and serial execution made this single test
        # 227s of the suite's 36 min (it re-runs all 191 gates the
        # parametrized parity tests already ran once).
        errs = []
        spdf = QUERIES[name](spark, SF_DIR).toPandas()
        pdf = duck.cursor().execute(ORACLES[name]).df()
        for col in pdf.columns:
            pfam = _family(pdf[col].dtype)
            sfam = (
                _family(spdf[col].dtype)
                if col in spdf.columns else None
            )
            if sfam and pfam and sfam != pfam:
                errs.append(
                    f"{name}.{col}: spark-pandas {spdf[col].dtype} "
                    f"vs oracle-pandas {pdf[col].dtype}"
                )
        return errs

    with ThreadPoolExecutor(max_workers=6) as pool:
        bad = [e for errs in pool.map(check, sorted(ORACLES)) for e in errs]
    assert not bad, f"dtype-family mismatches: {bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name", ["q12_late_priority", "q21_waiting_supplier"]
)
def test_date_hardened_gates_tz_stable(spark, duck, name):
    """The r12 q12 driver red motivated DATE-granularity predicates:
    verify the hardened queries match their oracles even when the
    Spark session timezone is NOT the driver default — dates have no
    zone, so a non-UTC harness cannot flip boundary rows."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("Asia/Tokyo", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            sdf = QUERIES[name](spark, SF_DIR)
            a = normalize(
                [tuple(r) for r in sdf.collect()], sdf.columns
            )
            res = duck.execute(ORACLES[name])
            b = normalize(
                res.fetchall(), [d[0] for d in res.description]
            )
            assert a == b, f"{name} diverges under {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_all_tpch_gates_tz_stable(spark, duck):
    """The whole seam class, not just q12/q21: EVERY TPC-H gate must
    match its oracle under a non-UTC session timezone.  The remaining
    timestamp-literal predicates are safe because the
    string->timestamp->ntz coercion round-trips through the SAME
    session timezone (identity) — this pins that analysis against
    engine upgrades."""
    qkeys = sorted(
        k for k in ORACLES if k.startswith("q") and k[1].isdigit()
    )
    assert len(qkeys) == 22  # the full sweep
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        bad = []
        for name in qkeys:
            sdf = QUERIES[name](spark, SF_DIR)
            a = normalize(
                [tuple(r) for r in sdf.collect()], sdf.columns
            )
            res = duck.execute(ORACLES[name])
            b = normalize(
                res.fetchall(), [d[0] for d in res.description]
            )
            if a != b:
                bad.append(name)
        assert not bad, f"TZ-divergent gates: {bad}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
