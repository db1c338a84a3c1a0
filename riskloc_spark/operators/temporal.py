"""Time-series relational operators: as-of join and sessionization.

Two operators every event/KPI pipeline needs that vanilla Spark SQL
lacks as primitives (the reference consumes pre-aligned KPI frames —
run_utils.py assumes real/predict already joined; these operators are
the alignment step that PRODUCES such frames from raw event streams):

- ``asof_join``: for each left row, the single most recent right row
  (per key) at or before the left timestamp — the canonical way to
  attach a slowly-changing attribute, the latest forecast, or the last
  prior action to an event.  Implemented with the union-marker trick:
  ONE hash shuffle of |L|+|R| rows on the join keys and one
  partition-local sort, never a range-join explosion and never a
  per-left-row probe.  At 100 TB this is the shape that survives: the
  only exchange is the same one an equi-join would pay, and AQE's
  skew-split handles a hot key because the window is
  running-prefix (rows UNBOUNDED PRECEDING .. CURRENT) rather than a
  whole-partition frame.
- ``sessionize`` / ``session_stats``: gap-based session assignment
  (a new session starts when the inter-event gap EXCEEDS ``gap``) and
  the per-session rollup.  Batch twin of Structured Streaming's
  ``session_window`` — ``session_stats_stream`` IS that built-in, and
  the two are pinned equal by tests and by the ``streaming_sessions``
  hash gate (same boundary rule: an event exactly ``gap`` after its
  predecessor still extends the session — session_window merges
  touching windows, verified empirically).

All timestamp arithmetic is integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``) so the oracle replay is engine-exact.
"""
from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "asof_join",
    "sessionize",
    "session_stats",
    "session_stats_stream",
    "rolling_window_features",
    "funnel",
    "funnel_counts",
]


def _micros(col):
    """Integer-microsecond epoch of a timestamp column, NTZ-safe:
    parquet written with isAdjustedToUTC=false reads as TIMESTAMP_NTZ,
    which ``unix_micros`` rejects — cast first.  Only DIFFERENCES of
    this value cross the oracle seam (gaps, durations), so the session
    timezone offset cancels and the arithmetic stays engine-exact."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Iterable[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: attach, per key, the latest right row at or
    before each left row's timestamp (``direction='backward'``) or the
    earliest at-or-after row (``'forward'``).

    Every left row is kept (unmatched rows carry NULLs).  The matched
    right timestamp is exposed as ``<prefix><right_ts>`` alongside the
    requested ``right_cols`` (each as ``<prefix><col>``).

    Semantics pinned by tests: a right row at EXACTLY the left
    timestamp matches (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
    agrees); with ``tolerance_us`` set, matches strictly older than
    ``left_ts - tolerance_us`` (backward) are nulled out.

    Plan shape (asserted in tests/test_temporal.py): one hash exchange
    on ``on`` over the union of both sides + one window sort — the
    union-marker formulation.  Rows are tagged with a side marker,
    unioned, and a running ``last(value, ignorenulls=True)`` over
    (key, ts, side) carries the most recent right payload onto each
    left row; right rows sort BEFORE left rows at equal timestamps so
    the at-the-instant match is visible.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    right_cols = list(right_cols)

    payload = [f"__r_{c}" for c in right_cols]
    rts_tag = "__r_ts"
    side = "__side"

    lhs = left.withColumn(side, F.lit(1))
    for tag in payload + [rts_tag]:
        lhs = lhs.withColumn(tag, F.lit(None).cast(
            dict(zip(payload, [right.schema[c].dataType for c in right_cols]),
                 **{rts_tag: right.schema[right_ts].dataType})[tag]
        ))
    rhs = right.select(
        *keys,
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(side),
        F.col(right_ts).alias(rts_tag),
        *[F.col(c).alias(t) for c, t in zip(right_cols, payload)],
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    ts_order = F.col(left_ts) if direction == "backward" else F.col(left_ts).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(side))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(rts_tag, ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(t, ignorenulls=True).over(w).alias(f"__m_{c}")
            for c, t in zip(right_cols, payload)
        ],
    )
    out = carried.filter(F.col(side) == 1)

    in_tol = F.lit(True)
    if tolerance_us is not None:
        gap = _micros(left_ts) - _micros("__m_ts")
        if direction == "forward":
            gap = -gap
        in_tol = gap <= F.lit(int(tolerance_us))
    out = out.select(
        *[c for c in left.columns],
        F.when(in_tol, F.col("__m_ts")).alias(f"{prefix}{right_ts}"),
        *[
            F.when(in_tol, F.col(f"__m_{c}")).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    return out


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign gap-based sessions: a new session opens on a row whose
    gap to the previous row of the same key is STRICTLY GREATER than
    ``gap_minutes`` — an event exactly ``gap`` after its predecessor
    still extends the session, matching Structured Streaming's
    ``session_window`` merge rule (touching windows merge; verified
    empirically and pinned by
    test_session_stats_stream_matches_batch).

    Adds ``session_idx`` (1-based per key, in time order) and a
    ``session_id`` string.  One hash exchange on the key + one
    partition-local sort; the running-prefix flag sum never buffers a
    whole partition.
    """
    gap_us = int(round(gap_minutes * 60.0 * 1_000_000))
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev_us = F.lag(_micros(ts_col)).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (_micros(ts_col) - prev_us > F.lit(gap_us)),
        1,
    ).otherwise(0)
    run = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = events.withColumn("session_idx", F.sum(is_new).over(run))
    return out.withColumn(
        "session_id",
        F.concat_ws("-", F.col(key_col).cast("string"), F.col("session_idx")),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: start / end timestamps, duration (micros),
    event count, and (optionally) the summed value column.

    Runs ``sessionize`` then ONE groupBy on (key, session_idx).  The
    groupBy's partial aggregation is map-side: after the sessionize
    window every (key, session) is contiguous within its partition, so
    the second exchange moves one combined row per session, not one
    per event.
    """
    sess = sessionize(events, key_col, ts_col, gap_minutes)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(_micros(ts_col)) - F.min(_micros(ts_col))).alias(
            "duration_us"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return sess.groupBy(key_col, "session_idx").agg(*aggs)


def session_stats_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``session_stats`` on Structured Streaming's
    built-in ``session_window``: watermark-bounded state, sessions
    close (and emit, in append mode) once the watermark passes their
    end.  Emits the same columns as the batch rollup — equality with
    the batch operator over the same rows is the pinned property
    (``streaming_sessions`` gate; session_window's window.end is
    last-event + gap, so session_end is recovered exactly as
    window.end - gap in integer microseconds).
    """
    gap_us = int(round(gap_minutes * 60.0 * 1_000_000))
    # watermarks require TIMESTAMP (NTZ parquet reads are rejected)
    ws = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    ws = ws.withWatermark(ts_col, watermark)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    # gap as integer microseconds: a float-formatted interval string
    # ("360.0 minutes") is NOT a valid gap duration and silently yields
    # an empty aggregation (no analysis error — found the hard way)
    grouped = ws.groupBy(
        F.col(key_col),
        F.session_window(F.col(ts_col), f"{gap_us} microseconds"),
    ).agg(*aggs)
    return grouped.select(
        key_col,
        "session_start",
        F.timestamp_micros(
            F.unix_micros(F.col("session_window.end")) - F.lit(gap_us)
        ).alias("session_end"),
        (
            F.unix_micros(F.col("session_window.end"))
            - F.lit(gap_us)
            - F.unix_micros(F.col("session_start"))
        ).alias("duration_us"),
        "n_events",
        *([F.col("sum_value")] if value_col is not None else []),
    )


def rolling_window_features(
    df: DataFrame,
    window_minutes: float = 60.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count
    (and sum of ``value_col``) of the SAME key's events in the
    preceding ``window_minutes`` INCLUDING the event itself — the
    classic sessionless activity feature (burst detection, rate
    features for fraud/abuse models, per-user context columns for
    training data).

    One RANGE window over integer microseconds (the engine-exact
    currency of this module): a single hash exchange on the key, then
    a range frame — no self-join, no explode. At 100 TB the shuffle is
    the cost; a per-key window is the minimal one (same shape as
    sessionize)."""
    mins_us = int(round(window_minutes * 60.0 * 1_000_000))
    w = (
        Window.partitionBy(key_col)
        .orderBy(_micros(ts_col))
        .rangeBetween(-mins_us, 0)
    )
    out = df.withColumn(
        "n_events_window", F.count(F.lit(1)).over(w).cast("long")
    )
    if value_col is not None:
        out = out.withColumn("sum_value_window", F.sum(value_col).over(w))
    return out


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the FIRST time each
    step completed, where step k must occur STRICTLY after the user's
    step k-1 time (the classic product-analytics conversion funnel:
    view -> click -> purchase).  Returns one row per user who reached
    step 1: (user_col, t1..tk) with NULL from the first unreached
    step; ``funnel_counts`` rolls this into per-step conversion
    counts.

    Scale shape: step k is a per-user MIN aggregation over the events
    of ONE type, joined to the (users x 1 row) times of step k-1 —
    each round shuffles only the single step's filtered events plus a
    users-sized frame, and every aggregation/join keys on the SAME
    column, so the exchanges reuse one partitioning. k-1 chained
    shuffles total, never a per-user sort or a collected event list
    (hot users cost nothing beyond their filtered row count: the min
    is combiner-absorbed map-side).  An applyInPandas per-user scan
    would pay one shuffle but materialize whole user histories;
    the chained form never does."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    t_names = [f"t{i + 1}" for i in range(len(steps))]
    out = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(t_names[0]))
    )
    for i in range(1, len(steps)):
        prev_t, cur_t = t_names[i - 1], t_names[i]
        nxt = (
            df.filter(F.col(type_col) == steps[i])
            .join(out.select(user_col, prev_t), user_col)
            .filter(F.col(ts_col) > F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(cur_t))
        )
        out = out.join(nxt, user_col, "left_outer")
    return out.select(user_col, *t_names)


def funnel_counts(
    funnel_df: DataFrame, steps: Sequence[str]
) -> DataFrame:
    """(funnel output) -> (step_idx, step, n_users): how many users
    reached each step.  One tiny aggregation over the per-user
    frame."""
    aggs = [
        F.count(f"t{i + 1}").cast("long").alias(f"n{i + 1}")
        for i in range(len(steps))
    ]
    wide = funnel_df.agg(*aggs)
    rows = None
    for i, s in enumerate(steps):
        one = wide.select(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"n{i + 1}").alias("n_users"),
        )
        rows = one if rows is None else rows.unionAll(one)
    return rows


def scd2_history(
    updates: DataFrame,
    key_cols: list,
    ts_col: str,
    attr_cols: list,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change feed:
    (key..., attr..., valid_from, valid_to, is_current) — one row per
    VERSION, consecutive no-change updates collapsed (an update whose
    attributes equal the previous version's opens no new interval),
    valid_to = the next version's valid_from (NULL while current).

    One window pass per step on the same (key, ts) ordering — the
    change-collapse lag and the interval lead reuse one sort; no
    self-joins, no collected histories.  Ties on ts within a key keep
    the last row by a deterministic struct-max (documented: a feed
    emitting two different updates at the same instant has no defined
    order — the struct tiebreak over the attributes pins one)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # ts ties: keep one deterministic winner per (key, ts)
    dedup = (
        updates.groupBy(*key_cols, ts_col)
        .agg(F.max(attrs).alias("__a"))
        .select(
            *key_cols,
            ts_col,
            *[F.col(f"__a.{c}").alias(c) for c in attr_cols],
        )
    )
    changed = dedup.withColumn("__prev", F.lag(attrs).over(w)).filter(
        F.col("__prev").isNull() | (F.col("__prev") != attrs)
    )
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(
            Window.partitionBy(*key_cols).orderBy(ts_col)
        ))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, *attr_cols,
            "valid_from", "valid_to", "is_current",
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: list | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Containment join: every (point, interval) pair with
    start <= ts < end (and equal ``keys`` when given).  Degenerate
    intervals (end <= start) match nothing.

    The Spark-first shape: a naive range join plans
    BroadcastNestedLoopJoin (O(points x intervals) comparisons).
    Instead each interval EXPLODES into the integer time buckets it
    covers (floor(epoch_us / bucket) from start through the last
    microsecond before the exclusive end — bounded by interval length
    / bucket width) and each point computes its single bucket; the
    join is an EQUI-join on (keys..., bucket) with exact containment
    as a cheap post-filter on the (few) co-bucket candidates.  Pick
    ``bucket_seconds`` near the typical interval length: shorter
    buckets explode long intervals wider, longer buckets put more
    non-overlapping candidates in each bucket.  A pathological
    months-long interval fans out linearly — cap upstream or split
    the dimension (documented seam)."""
    ks = list(keys or [])
    bus = int(bucket_seconds) * 1_000_000

    def bidx(c):
        return F.floor(_micros(c) / bus).cast("long")

    start = F.col(start_col)
    end = F.col(end_col)
    ivals = (
        intervals.filter(end > start)
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    bidx(start),
                    F.floor((_micros(end) - 1) / bus).cast("long"),
                )
            ),
        )
    )
    pts = points.withColumn("__b", bidx(F.col(ts_col)))
    out = pts.join(ivals, [*ks, "__b"]).filter(
        (F.col(ts_col) >= start) & (F.col(ts_col) < end)
    )
    return out.drop("__b")


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list,
    ts_col: str,
    attr_cols: list,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a change-data-capture feed to a snapshot — the MERGE
    INTO shape (upsert + delete) as plain DataFrame algebra:
    (key..., attr...) where each key carries its LATEST change's
    attributes (``op_col`` != ``delete_op``), disappears if the
    latest change is a delete, and keeps its snapshot row untouched
    when the feed never mentions it.  New keys in the feed insert.

    One rank window over the feed picks the winner per key (rank<=1
    compiles to WindowGroupLimit — map-side capped, the domain-caps
    shape), then ONE full-outer join against the snapshot resolves
    the three cases; the snapshot is never shuffled twice and no
    side is collected.  Ties on ts within a key are pinned by a
    deterministic struct-max over (op, attrs) — a feed emitting two
    ops at the same instant has no defined order (the SCD2 carve-out;
    same discipline as scd2_history).  Feed rows need op + the full
    attribute set; partial-column updates compose upstream with a
    coalesce against the prior version if needed."""
    keys = list(key_cols)
    payload = F.struct(
        F.col(op_col).alias("__op"),
        *[F.col(c) for c in attr_cols],
    )
    dedup = (
        changes.groupBy(*keys, ts_col)
        .agg(F.max(payload).alias("__p"))
        .select(*keys, ts_col, "__p")
    )
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
    latest = (
        dedup.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *keys,
            F.col(f"__p.__op").alias("__op"),
            *[F.col(f"__p.{c}").alias(f"__c_{c}") for c in attr_cols],
        )
    )
    snap = snapshot.select(
        *keys, *[F.col(c).alias(f"__s_{c}") for c in attr_cols]
    )
    joined = snap.join(latest, keys, "full_outer")
    # delete wins; change attrs win over snapshot attrs; snapshot
    # survives untouched keys
    kept = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != delete_op)
    )
    return kept.select(
        *keys,
        *[
            F.when(
                F.col("__op").isNotNull(), F.col(f"__c_{c}")
            ).otherwise(F.col(f"__s_{c}")).alias(c)
            for c in attr_cols
        ],
    )


def interval_join_hierarchical(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: list | None = None,
    base_bucket_seconds: int = 3600,
    levels: int = 12,
) -> DataFrame:
    """``interval_join`` without its months-long-interval seam: the
    multi-resolution grid (the segment-tree join shape).  Level l has
    bucket width base * 2^l; each interval registers at the ONE level
    whose width first covers its length, exploding at most TWO bucket
    rows there (an interval longer than every level still registers
    at the top level, fanning out only past base * 2^(levels-1) —
    ~170 days at the defaults); each point probes its bucket at EVERY
    level (``levels`` rows per point, a fixed constant).  The join is
    the same (keys..., level, bucket) equi-join with exact
    containment post-filtered.

    Fan-out: plain ``interval_join`` explodes len/bucket rows per
    interval (a 30-day interval at 1h buckets = 720 rows); here it is
    <= 2 per interval + ``levels`` per point.  Correctness does not
    depend on the level assignment (any level's bucket cover is
    exact; points probe all levels), so the float log2 picking the
    level is a pure fan-out heuristic — the oracle is still the plain
    inequality join.  Each interval lives at exactly one level, so no
    pair ever matches twice."""
    ks = list(keys or [])
    if levels < 1:
        raise ValueError("levels must be >= 1")
    base_us = int(base_bucket_seconds) * 1_000_000

    start = F.col(start_col)
    end = F.col(end_col)
    length = _micros(end) - _micros(start)
    lvl = F.when(length <= base_us, F.lit(0)).otherwise(
        F.least(
            F.lit(levels - 1),
            F.ceil(F.log2(length / F.lit(float(base_us)))).cast("int"),
        )
    )
    # SQL form: the python shiftleft wrapper takes only int numBits
    width = F.expr(f"shiftleft(CAST({base_us} AS BIGINT), __lvl)")
    ivals = (
        intervals.filter(end > start)
        .withColumn("__lvl", lvl.cast("int"))
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(_micros(start) / width).cast("long"),
                    F.floor((_micros(end) - 1) / width).cast("long"),
                )
            ),
        )
    )
    lvl_arr = F.explode(
        F.array(*[F.lit(i) for i in range(levels)])
    ).alias("__lvl")
    pts = points.select("*", lvl_arr).withColumn(
        "__b", F.floor(_micros(F.col(ts_col)) / width).cast("long")
    )
    out = pts.join(ivals, [*ks, "__lvl", "__b"]).filter(
        (F.col(ts_col) >= start) & (F.col(ts_col) < end)
    )
    return out.drop("__lvl", "__b")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """(cohort, period, active_users, cohort_size, retention): the
    classic cohort-retention matrix — users grouped by the period of
    their FIRST event (the cohort), counted distinct in every later
    period they return, as a fraction of the cohort.  Period 0 rows
    are the cohort definition (retention 1.0 by construction).

    Two aggregations: first-seen per user (map-combinable min), then
    distinct users per (cohort, period) — the (user, period) pair is
    deduped BEFORE the count so the heavy exchange carries one row
    per user-period, not one per event.  Periods are DATE-granularity
    buckets (days since epoch / period_days via to_date + datediff —
    timezone-free on both engines, the q12 discipline; an
    epoch-microsecond bucket would shift at non-UTC session
    timezones).  Retention is rounded to 6dp for stable engine
    comparison."""
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    day = F.floor(
        F.datediff(
            F.to_date(F.col(ts_col)),
            F.lit("1970-01-01").cast("date"),
        ) / period_days
    ).cast("long")
    ue = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .select(F.col(user_col).alias("__u"), day.alias("__p"))
        .distinct()
    )
    first = ue.groupBy("__u").agg(F.min("__p").alias("cohort"))
    per = (
        ue.join(first, "__u")
        .groupBy("cohort", (F.col("__p") - F.col("cohort")).alias("period"))
        .agg(F.countDistinct("__u").alias("active_users"))
    )
    size = per.filter(F.col("period") == 0).select(
        F.col("cohort").alias("__c"),
        F.col("active_users").alias("cohort_size"),
    )
    return (
        per.join(size, per["cohort"] == size["__c"])
        .select(
            "cohort",
            F.col("period").cast("long").alias("period"),
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    window_days: float = 7.0,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Marketing-style conversion ATTRIBUTION: for every conversion
    event (``type_col == conversion_type``), the user's FIRST and
    LAST preceding touch inside the lookback window — the
    first-touch / last-touch pair every attribution report starts
    from, plus the touch count (the denominator of linear
    attribution).

    Returns (conversion id, user, conversion ts, first_touch_type,
    first_touch_ts, last_touch_type, last_touch_ts, n_touches);
    conversions with NO touch in the window appear with NULL touches
    and n_touches 0 (the complete-audit contract — unattributed
    conversions are the number that catches instrumentation gaps).

    The Spark-first shape: each conversion opens a BACKWARD interval
    [ts - window, ts), touches probe it through the bucketed
    interval EQUI-join (``interval_join`` keyed on the user — never
    a theta/BNLJ pair scan), and first/last resolve as min/max
    structs in one aggregation.  Ties on touch ts break to the
    smaller/larger event id (deterministic).  Self-touches
    (conversion events as touches for LATER conversions) count —
    a repeat purchase is a real touch; exclude upstream if not."""
    win_us = int(window_days * 86400 * 1_000_000)
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col),
        F.col(ts_col).alias("conversion_ts"),
        F.timestamp_micros(
            _micros(F.col(ts_col)) - F.lit(win_us)
        ).alias("__w_start"),
        F.col(ts_col).alias("__w_end"),
    )
    touches = events.select(
        F.col(user_col),
        F.col(ts_col).alias("__touch_ts"),
        F.col(type_col).alias("__touch_type"),
        F.col(id_col).alias("__touch_id"),
    )
    pairs = interval_join(
        touches,
        conv,
        "__touch_ts",
        "__w_start",
        "__w_end",
        keys=[user_col],
        bucket_seconds=bucket_seconds,
    )
    first = F.min(
        F.struct(
            F.col("__touch_ts"),
            F.col("__touch_id"),
            F.col("__touch_type"),
        )
    ).alias("__first")
    last = F.max(
        F.struct(
            F.col("__touch_ts"),
            F.col("__touch_id"),
            F.col("__touch_type"),
        )
    ).alias("__last")
    agg = pairs.groupBy(
        "conversion_id", user_col, "conversion_ts"
    ).agg(first, last, F.count(F.lit(1)).alias("n_touches"))
    return (
        conv.select("conversion_id", user_col, "conversion_ts")
        .join(
            agg, ["conversion_id", user_col, "conversion_ts"],
            "left_outer",
        )
        .select(
            "conversion_id",
            user_col,
            "conversion_ts",
            F.col("__first.__touch_type").alias("first_touch_type"),
            F.col("__first.__touch_ts").alias("first_touch_ts"),
            F.col("__last.__touch_type").alias("last_touch_type"),
            F.col("__last.__touch_ts").alias("last_touch_ts"),
            F.coalesce("n_touches", F.lit(0))
            .cast("long")
            .alias("n_touches"),
        )
    )
