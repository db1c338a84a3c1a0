"""As-of join and sessionization (operators/temporal.py): semantics
pinned against hand-computed frames and DuckDB's native ASOF JOIN (an
independent implementation), the session_window boundary rule pinned
stream-vs-batch, and the single-exchange plan shapes asserted."""
import datetime as dt
import os
import tempfile
import uuid

import duckdb
import pytest
from pyspark.sql import functions as F

from riskloc_spark.operators.temporal import (
    asof_join,
    session_stats,
    session_stats_stream,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)


def ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts(5)),
            (2, "u1", ts(10)),   # exact tie with a right row
            (3, "u1", ts(25)),
            (4, "u2", ts(7)),    # no right rows for this key
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts(0), 100.0),
            ("u1", ts(10), 200.0),
            ("u1", ts(20), 300.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    return left, right


def test_asof_backward(spark, asof_frames):
    left, right = asof_frames
    rows = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert rows[1] == (ts(0), 100.0)
    assert rows[2] == (ts(10), 200.0)  # at-the-instant right row matches
    assert rows[3] == (ts(20), 300.0)
    assert rows[4] == (None, None)     # left row kept, nulls


def test_asof_tolerance(spark, asof_frames):
    left, right = asof_frames
    tol = 6 * 60 * 1_000_000
    rows = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, on="user_id", tolerance_us=tol).collect()
    }
    # event 1 is 5 min after its match (within 6 min), event 3 is 5 min too
    assert rows[1] == 100.0 and rows[3] == 300.0 and rows[2] == 200.0
    rows = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right, on="user_id", tolerance_us=60 * 1_000_000
        ).collect()
    }
    assert rows[1] is None and rows[3] is None and rows[2] == 200.0


def test_asof_forward(spark, asof_frames):
    left, right = asof_frames
    rows = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, on="user_id", direction="forward").collect()
    }
    assert rows[1] == (ts(10), 200.0)
    assert rows[2] == (ts(10), 200.0)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)


def test_asof_matches_duckdb_on_real_events(spark, sf_dir):
    """Parity against DuckDB's native ASOF JOIN — a fully independent
    implementation — on the real events table (purchases as the right
    side)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    got = sorted(
        (r["event_id"], r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, on="user_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        con.execute(
            """
            SELECT l.event_id, r.ts, r.value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type <> 'purchase') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            """
        ).fetchall()
    )
    assert got == want


def test_asof_plan_single_exchange(spark, asof_frames):
    """The union-marker formulation pays ONE hash exchange on the key
    (plus the window sort) — no range join, no per-row probe."""
    from tests.test_plans import plan_str

    left, right = asof_frames
    plan = plan_str(asof_join(left, right, on="user_id"), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_sessionize_boundary_and_multiuser(spark):
    ev = spark.createDataFrame(
        [
            (1, "u", ts(0), 1.0),
            (2, "u", ts(30), 1.0),      # exactly gap -> SAME session
            (3, "u", ts(60), 1.0),      # exactly gap again -> same
            (4, "u", ts(90, 1), 1.0),   # gap exceeded by 1 us -> new
            (5, "v", ts(0), 1.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    rows = {
        r["event_id"]: (r["session_idx"], r["session_id"])
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert rows[1] == (1, "u-1") and rows[2] == (1, "u-1")
    assert rows[3] == (1, "u-1")
    assert rows[4] == (2, "u-2")
    assert rows[5] == (1, "v-1")


def test_session_stats(spark):
    ev = spark.createDataFrame(
        [
            (1, "u", ts(0), 2.0),
            (2, "u", ts(10), 3.0),
            (3, "u", ts(90), 5.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = {
        r["session_idx"]: r
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert out[1]["n_events"] == 2 and out[1]["sum_value"] == 5.0
    assert out[1]["session_start"] == ts(0) and out[1]["session_end"] == ts(10)
    assert out[1]["duration_us"] == 10 * 60 * 1_000_000
    assert out[2]["n_events"] == 1 and out[2]["duration_us"] == 0


def test_session_stats_stream_matches_batch(spark):
    """The pinned property: the streaming session_window rollup equals
    the batch gap-rule rollup over the same rows — including an event
    at EXACTLY the gap boundary (session_window merges touching
    windows; the batch rule is strictly-greater for that reason)."""
    ev = spark.createDataFrame(
        [
            (1, "u", ts(0), 1.0),
            (2, "u", ts(30), 2.0),      # touching boundary
            (3, "u", ts(75), 4.0),      # new session
            (4, "v", ts(5), 8.0),
            (5, "v", ts(20), 16.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    batch = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["duration_us"], r["n_events"], r["sum_value"])
        for r in session_stats(ev, gap_minutes=30).collect()
    )
    stage = tempfile.mkdtemp(prefix="sess_")
    ev.write.parquet(os.path.join(stage, "p"))
    st = spark.readStream.schema(ev.schema).parquet(os.path.join(stage, "p"))
    name = "sess_" + uuid.uuid4().hex[:8]
    q = (
        # 30.0 (float) on purpose: a float-formatted interval string is
        # silently invalid for session_window — the gap must be built
        # from integer microseconds (regression pin)
        session_stats_stream(st, gap_minutes=30.0)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming sessions did not finish"
    q.stop()
    stream = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["duration_us"], r["n_events"], r["sum_value"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    assert stream == batch


def test_sessionize_plan_single_exchange(spark):
    from tests.test_plans import plan_str

    ev = spark.createDataFrame(
        [(1, "u", ts(0), 1.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    plan = plan_str(sessionize(ev), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rolling_window_features_vs_reference(spark):
    """Trailing-hour frame vs a brute-force pandas reference: counts and
    sums per event, boundary inclusive, equal-timestamp peers included."""
    import pandas as pd

    from riskloc_spark.operators.temporal import rolling_window_features

    rows = []
    t0 = pd.Timestamp("2024-01-10 12:00:00")
    # user 1: events at 0, 30m, 60m (boundary!), 61m, 200m; duplicate ts
    offs = [0, 30, 60, 60, 61, 200]
    for i, m in enumerate(offs):
        rows.append((i, 1, t0 + pd.Timedelta(minutes=m), float(i + 1)))
    rows.append((9, 2, t0, 5.0))  # other key: independent
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    )
    got = {
        r["event_id"]: (r["n_events_window"], r["sum_value_window"])
        for r in rolling_window_features(df, window_minutes=60.0).collect()
    }
    for i, m in enumerate(offs):
        in_win = [
            j for j, m2 in enumerate(offs) if 0 <= (m - m2) <= 60
        ]
        # equal timestamps are peers: both rows at 60m see each other
        peers = [j for j, m2 in enumerate(offs) if m2 == m]
        want = set(in_win) | set(peers)
        assert got[i][0] == len(want), (i, got[i], want)
        assert got[i][1] == sum(j + 1 for j in want)
    assert got[9] == (1, 5.0)


def test_funnel_strict_ordering_and_null_propagation(spark):
    """Step k must be STRICTLY after step k-1: a click at the exact
    view instant does not count; a user with no qualifying click gets
    NULL for t2 AND t3 even when a purchase exists."""
    from datetime import datetime

    from riskloc_spark.operators.temporal import funnel, funnel_counts

    T = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: full clean funnel
        (1, "view", T(10)), (1, "click", T(20)), (1, "purchase", T(30)),
        # u2: click AT the view instant (not after) + later purchase
        (2, "view", T(10)), (2, "click", T(10)), (2, "purchase", T(40)),
        # u3: purchase BEFORE the first qualifying click
        (3, "view", T(10)), (3, "purchase", T(15)), (3, "click", T(20)),
        # u4: never viewed -> absent entirely
        (4, "click", T(5)), (4, "purchase", T(6)),
        # u5: earliest view counts, click between the two views
        (5, "view", T(30)), (5, "view", T(10)), (5, "click", T(20)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1] == (T(10), T(20), T(30))
    assert out[2] == (T(10), None, None)
    assert out[3] == (T(10), T(20), None)  # purchase at 15 precedes t2
    assert out[5] == (T(10), T(20), None)
    counts = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            funnel(df, ["view", "click", "purchase"]),
            ["view", "click", "purchase"],
        ).collect()
    }
    assert counts == {"view": 4, "click": 3, "purchase": 1}


def test_scd2_history_versions_and_collapse(spark):
    """scd2_history: consecutive no-change updates open no version,
    intervals chain valid_from -> next valid_from, last is current,
    same-instant conflicting updates resolve by the struct tiebreak."""
    from riskloc_spark.operators.temporal import scd2_history

    rows = [
        ("k1", "2024-01-01 00:00:00", "a", 1),
        ("k1", "2024-01-02 00:00:00", "a", 1),   # no change: collapsed
        ("k1", "2024-01-03 00:00:00", "b", 1),   # attr change
        ("k1", "2024-01-04 00:00:00", "b", 2),   # attr change
        ("k2", "2024-01-01 00:00:00", "x", 9),
        ("k2", "2024-01-01 00:00:00", "y", 9),   # same-instant tie
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, c string, n int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_history(df, ["k"], "ts", ["c", "n"])
    got = sorted(
        (r["k"], str(r["valid_from"]), str(r["valid_to"]),
         r["c"], r["n"], r["is_current"])
        for r in out.collect()
    )
    assert got == [
        ("k1", "2024-01-01 00:00:00", "2024-01-03 00:00:00", "a", 1, False),
        ("k1", "2024-01-03 00:00:00", "2024-01-04 00:00:00", "b", 1, False),
        ("k1", "2024-01-04 00:00:00", "None", "b", 2, True),
        # struct max picks ('y', 9) over ('x', 9)
        ("k2", "2024-01-01 00:00:00", "None", "y", 9, True),
    ]


def test_interval_join_containment_and_plan(spark):
    """interval_join: exact [start, end) containment incl. boundary
    rows, degenerate intervals match nothing, long intervals span
    buckets — and the plan is an EQUI join, never
    BroadcastNestedLoop."""
    from riskloc_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(i, f"2024-01-01 0{h}:{m:02d}:00") for i, (h, m) in enumerate(
            [(0, 30), (1, 0), (1, 59), (2, 0), (5, 15)]
        )],
        "pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivs = spark.createDataFrame(
        [
            (100, "2024-01-01 01:00:00", "2024-01-01 02:00:00"),
            (101, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),
            (102, "2024-01-01 03:00:00", "2024-01-01 03:00:00"),
        ],
        "iid long, s string, e string",
    ).withColumns({"s": F.col("s").cast("timestamp"),
                   "e": F.col("e").cast("timestamp")})
    out = interval_join(pts, ivs, "ts", "s", "e")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # iv 100 = [01:00, 02:00): catches 01:00 and 01:59, NOT 02:00
    # iv 101 = [00:00, 06:00): catches all five points
    # iv 102 degenerate: nothing
    assert got == [(0, 101), (1, 100), (1, 101), (2, 100),
                   (2, 101), (3, 101), (4, 101)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan, plan
    assert "Join" in plan


def test_cdc_apply_semantics(spark):
    """MERGE cases: untouched key keeps its snapshot row; latest
    upsert wins over earlier ones; latest delete removes the key even
    after earlier upserts; a delete then later upsert re-inserts; a
    brand-new key inserts; same-instant ties pin deterministically;
    the winner-pick plan is WindowGroupLimit."""
    from riskloc_spark.operators.temporal import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, name string, v long",
    )
    ch = spark.createDataFrame(
        [
            (2, 5, "upsert", "b2", 21),
            (2, 7, "upsert", "b3", 22),   # latest for k=2
            (3, 5, "upsert", "c2", 31),
            (3, 9, "delete", None, None),  # k=3 removed
            (4, 5, "delete", None, None),
            (4, 8, "upsert", "d2", 41),   # re-inserted
            (5, 6, "upsert", "e", 50),    # new key
        ],
        "k long, ts long, op string, name string, v long",
    )
    out = cdc_apply(snap, ch, ["k"], "ts", ["name", "v"])
    got = {r["k"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {
        1: ("a", 10),
        2: ("b3", 22),
        4: ("d2", 41),
        5: ("e", 50),
    }
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan, plan
    # same-instant tie: deterministic struct-max winner, stable
    # under repartitioning
    tie = spark.createDataFrame(
        [(9, 1, "upsert", "x", 1), (9, 1, "upsert", "y", 2)],
        "k long, ts long, op string, name string, v long",
    )
    r1 = cdc_apply(snap, tie, ["k"], "ts", ["name", "v"]).collect()
    r2 = cdc_apply(
        snap, tie.repartition(5), ["k"], "ts", ["name", "v"]
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert {r["k"]: r["name"] for r in r1}[9] == "y"  # struct max


def test_interval_join_hierarchical_equals_plain(spark):
    """the multi-resolution rewrite returns exactly the plain
    inequality join's pairs — mixed second-scale to month-scale
    intervals, boundary exclusivity, degenerate intervals, keyed —
    while exploding long intervals to at most two rows at their
    level (fan-out asserted)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from riskloc_spark.operators.temporal import (
        interval_join,
        interval_join_hierarchical,
    )

    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [
            ("u1", i, t0 + dt.timedelta(minutes=17 * i))
            for i in range(200)
        ],
        "k string, pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            # seconds-scale, hour-scale, day-scale, month-scale
            ("u1", 0, t0, t0 + dt.timedelta(seconds=30)),
            ("u1", 1, t0 + dt.timedelta(hours=2),
             t0 + dt.timedelta(hours=3)),
            ("u1", 2, t0 + dt.timedelta(days=1),
             t0 + dt.timedelta(days=2, hours=5)),
            ("u1", 3, t0, t0 + dt.timedelta(days=31)),
            ("u1", 4, t0 + dt.timedelta(days=3),
             t0 + dt.timedelta(days=3)),  # degenerate
            ("u2", 5, t0, t0 + dt.timedelta(days=31)),  # other key
        ],
        "k string, iid long, s timestamp, e timestamp",
    )
    plain = interval_join(
        pts, ivs, "ts", "s", "e", keys=["k"], bucket_seconds=3600
    ).select("pid", "iid")
    hier = interval_join_hierarchical(
        pts, ivs, "ts", "s", "e", keys=["k"],
        base_bucket_seconds=3600, levels=12,
    ).select("pid", "iid")
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in hier.collect())
    assert a == b and len(a) > 0
    # fan-out: the 31-day interval explodes <= 2 rows at its level
    # (plain would explode 744); count the exploded interval rows
    from riskloc_spark.operators.temporal import _micros  # noqa: F401

    base_us = 3600 * 1_000_000
    lvl = F.when(
        (F.unix_micros(F.col("e")) - F.unix_micros(F.col("s")))
        <= base_us, F.lit(0)
    ).otherwise(
        F.least(
            F.lit(11),
            F.ceil(F.log2(
                (F.unix_micros(F.col("e")) - F.unix_micros(F.col("s")))
                / F.lit(float(base_us))
            )).cast("int"),
        )
    )
    w = F.lit(base_us).cast("long") * F.pow(F.lit(2.0), lvl).cast("long")
    n_expl = (
        ivs.filter(F.col("e") > F.col("s"))
        .select(
            (
                F.floor((F.unix_micros("e") - 1) / w)
                - F.floor(F.unix_micros("s") / w) + 1
            ).alias("n")
        )
        .agg(F.max("n")).collect()[0][0]
    )
    assert n_expl <= 2, n_expl


def test_retention_cohorts_semantics(spark):
    """cohort = first-seen period; period-0 retention is 1.0; later
    periods count distinct returning users over the cohort size;
    multiple events in one period count once; NULL users/ts drop."""
    import datetime as dt

    from riskloc_spark.operators.temporal import retention_cohorts

    d0 = dt.datetime(2024, 1, 1, 9)
    rows = []
    # cohort A (week 0): u1, u2, u3; u1 returns wk1+wk2, u2 wk1 twice
    for u, weeks in ((1, [0, 1, 2]), (2, [0, 1, 1]), (3, [0])):
        for w in weeks:
            rows.append((u, d0 + dt.timedelta(days=7 * w)))
    # cohort B (week 1): u4 returns week 2
    rows += [(4, d0 + dt.timedelta(days=7)),
             (4, d0 + dt.timedelta(days=14))]
    rows += [(None, d0), (5, None)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort"], r["period"]): (
            r["active_users"], r["cohort_size"], r["retention"]
        )
        for r in retention_cohorts(df, period_days=7).collect()
    }
    cohorts = sorted({c for c, _ in out})
    a, b = cohorts
    assert out[(a, 0)] == (3, 3, 1.0)
    assert out[(a, 1)] == (2, 3, round(2 / 3, 6))
    assert out[(a, 2)] == (1, 3, round(1 / 3, 6))
    assert out[(b, 0)] == (1, 1, 1.0)
    assert out[(b, 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_attribution_first_last_touch(spark):
    """attribution: first/last preceding touch inside the lookback,
    window boundaries (exclusive end, inclusive start), unattributed
    conversions with NULLs and n_touches 0, deterministic id
    tiebreaks on equal timestamps."""
    from datetime import datetime

    from riskloc_spark.operators.temporal import attribution

    T = datetime
    rows = [
        # user 1: click -> view -> purchase (both inside 7d)
        (10, T(2024, 5, 1, 10), 1, "click", 0.0, ""),
        (11, T(2024, 5, 3, 10), 1, "view", 0.0, ""),
        (12, T(2024, 5, 5, 10), 1, "purchase", 9.0, ""),
        # user 2: touch EXACTLY at conversion ts (excluded: end is
        # exclusive) and one 8 days before (outside window)
        (20, T(2024, 5, 5, 10), 2, "click", 0.0, ""),
        (21, T(2024, 4, 27, 9), 2, "view", 0.0, ""),
        (22, T(2024, 5, 5, 10), 2, "purchase", 5.0, ""),
        # user 3: two touches at the SAME instant -> id tiebreak
        (30, T(2024, 5, 4, 10), 3, "click", 0.0, ""),
        (31, T(2024, 5, 4, 10), 3, "view", 0.0, ""),
        (32, T(2024, 5, 5, 10), 3, "purchase", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    got = {
        r["conversion_id"]: r
        for r in attribution(ev, "purchase", window_days=7.0).collect()
    }
    assert len(got) == 3
    r1 = got[12]
    assert (r1["first_touch_type"], r1["last_touch_type"]) == (
        "click", "view",
    )
    assert r1["n_touches"] == 2
    r2 = got[22]
    assert r2["n_touches"] == 0
    assert r2["first_touch_type"] is None and r2["last_touch_ts"] is None
    r3 = got[32]
    # equal ts: first -> smaller event id (click 30), last -> larger
    # (view 31)
    assert r3["first_touch_type"] == "click"
    assert r3["last_touch_type"] == "view"
    assert r3["n_touches"] == 2
