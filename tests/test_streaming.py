"""Structured Streaming pipeline: stream results must equal the batch
computation over the same files (availableNow trigger + memory sink)."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.data import load_table
from riskloc_spark.streaming import (
    events_stream,
    rca_foreach_batch,
    windowed_kpi_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def baseline(spark):
    ev = load_table(spark, SF_DIR, "events")
    return ev.groupBy("event_type").agg(F.avg("value").alias("mean_value"))


def test_windowed_kpi_stream_matches_batch(spark, baseline, tmp_path):
    stream = events_stream(spark, f"{SF_DIR}/events.parquet")
    scored = windowed_kpi_stream(stream, baseline, window="1 hour")

    q = (
        scored.writeStream.format("memory")
        .queryName("kpi_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    got = spark.table("kpi_stream").toPandas()
    assert len(got) > 0

    # batch twin over the same data
    ev = load_table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.sum("value").alias("real"), F.count(F.lit(1)).alias("n_events"))
        .join(F.broadcast(baseline), "event_type")
        .withColumn("predict", F.col("n_events") * F.col("mean_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "real",
            "predict",
        )
        .toPandas()
    )
    g = got.set_index(["window_start", "event_type"]).sort_index()
    b = batch.set_index(["window_start", "event_type"]).sort_index()
    # append mode emits a window once the watermark passes it; the tail
    # windows after the final watermark stay in state — all *emitted*
    # windows must match the batch twin exactly
    common = g.index.intersection(b.index)
    assert len(common) == len(g), "stream emitted a window batch doesn't have"
    assert len(g) >= len(b) - 2 * len(got["event_type"].unique()) - 4
    bb = b.loc[common]
    assert (g["real"] - bb["real"]).abs().max() < 1e-6
    assert (g["predict"] - bb["predict"]).abs().max() < 1e-6
    # deviation column is present and bounded
    assert got["deviation"].abs().max() <= 2.0


def test_rca_foreach_batch_trigger(spark, baseline, tmp_path):
    """Each micro-batch runs a batch RCA operator (adtributor candidates
    on the windowed frame) — batch/streaming unification."""
    from riskloc_spark.operators.adtributor import adtributor_candidates

    stream = events_stream(spark, f"{SF_DIR}/events.parquet")
    scored = windowed_kpi_stream(stream, baseline, window="6 hours")

    results: list = []

    def rca(batch_df):
        frame = batch_df.select(
            "event_type",
            F.hour("window_start").cast("string").alias("hr"),
            "real",
            "predict",
        )
        return adtributor_candidates(
            frame, ["event_type", "hr"], teep=0.01, tep=0.05
        ).collect()

    q = (
        scored.writeStream.foreachBatch(rca_foreach_batch(rca, results))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    assert results, "foreachBatch never fired"
    batch_ids = [bid for bid, _ in results]
    assert batch_ids == sorted(batch_ids)


def test_ewma_anomaly_stream_stateful(spark, tmp_path):
    """applyInPandasWithState: EWMA forecast state carried across the
    stream; outputs match an offline EWMA replay of the same windows."""
    import pandas as pd

    from riskloc_spark.streaming import ewma_anomaly_stream

    stream = events_stream(spark, f"{SF_DIR}/events.parquet")
    out = ewma_anomaly_stream(stream, alpha=0.3, threshold=0.5)

    q = (
        out.writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.table("ewma_stream").toPandas()
    assert len(got) > 0
    assert set(got.columns) == {
        "event_type", "window_start", "real", "predict", "deviation", "is_anomaly",
    }

    # offline replay: same windows through the same EWMA recurrence
    ev = load_table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.sum("value").alias("real"))
        .select("event_type", F.col("win.start").alias("window_start"), "real")
        .toPandas()
        .sort_values(["event_type", "window_start"])
    )
    for et, grp in got.groupby("event_type"):
        grp = grp.sort_values("window_start").reset_index(drop=True)
        replay = (
            batch[batch["event_type"] == et]
            .sort_values("window_start")
            .reset_index(drop=True)
        )
        # emit-on-close: every window except the final (still-open) one
        assert len(grp) == len(replay) - 1
        ewma, n = 0.0, 0
        for i, r in grp.iterrows():
            real_b = replay.loc[i, "real"]
            assert r["window_start"] == replay.loc[i, "window_start"]
            assert abs(r["real"] - real_b) < 1e-6
            predict = ewma if n > 0 else real_b
            assert abs(r["predict"] - predict) < 1e-6
            ewma = real_b if n == 0 else 0.3 * real_b + 0.7 * ewma
            n += 1


def test_events_stream_handles_all_ts_physical_layouts(spark, tmp_path):
    """Regression lock for the r3 streaming corruption: the events
    parquet has been written as TIMESTAMP(NANOS) (reads as bigint via
    nanosAsLong), TIMESTAMP(MICROS) NTZ, and plain TIMESTAMP across
    testdata generations. events_stream must yield identical wall-clock
    timestamps for all three — the old forced-LongType schema divided
    MICROS by 1000 and landed every event in January 1970."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-05-01 10:15:00", "2024-05-01 11:45:30", "2024-05-02 03:00:01"]
    )
    base = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": ts,
            "user_id": [10, 20, 30],
            "event_type": ["a", "b", "a"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    layouts = {
        "nanos": pa.timestamp("ns"),
        "micros_ntz": pa.timestamp("us"),
        "micros_utc": pa.timestamp("us", tz="UTC"),
    }
    got = {}
    for name, typ in layouts.items():
        d = tmp_path / name
        d.mkdir()
        table = pa.Table.from_pandas(base)
        idx = table.schema.get_field_index("ts")
        table = table.set_column(
            idx, pa.field("ts", typ), table.column("ts").cast(typ)
        )
        pq.write_table(table, d / "events.parquet")

        stream = events_stream(spark, str(d / "events.parquet"))
        q = (
            stream.writeStream.format("memory")
            .queryName(f"layout_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        rows = spark.table(f"layout_{name}").orderBy("event_id").collect()
        got[name] = [r["ts"].replace(tzinfo=None) for r in rows]
        assert all(t.year == 2024 for t in got[name]), (name, got[name])
    assert got["nanos"] == got["micros_ntz"] == got["micros_utc"], got


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics (append mode): an event older than
    (max seen ts - watermark) arriving in a later micro-batch is dropped
    — its already-closed window is emitted exactly once with the on-time
    count. Three files processed one per micro-batch (mtime-ordered via
    os.utime + maxFilesPerTrigger=1)."""
    import os

    import pandas as pd

    d = tmp_path / "events"
    d.mkdir()

    def write(name, ts_list, mtime):
        path = d / name
        pd.DataFrame(
            {
                "event_id": range(len(ts_list)),
                "ts": pd.to_datetime(ts_list),
                "user_id": [1] * len(ts_list),
                "event_type": ["a"] * len(ts_list),
                "value": [1.0] * len(ts_list),
            }
        ).to_parquet(path)
        os.utime(path, (mtime, mtime))

    # batch 1: window 10:00 gets 2 events; max ts 14:30 -> wm 12:30
    write("b1.parquet",
          ["2024-05-01 10:10:00", "2024-05-01 10:20:00",
           "2024-05-01 14:30:00"], 1_000_000)
    # batch 2: fresh event; window 10 (end 11:00 < wm 12:30) is emitted
    # and its state evicted during this batch
    write("b2.parquet", ["2024-05-01 15:00:00"], 1_000_100)
    # batch 3: LATE 10:40 (window already emitted+evicted) + fresh 18:00
    write("b3.parquet",
          ["2024-05-01 10:40:00", "2024-05-01 18:00:00"], 1_000_200)

    baseline = spark.createDataFrame(
        pd.DataFrame({"event_type": ["a"], "mean_value": [1.0]})
    )
    stream = events_stream(spark, str(d), options={"maxFilesPerTrigger": "1"})
    scored = windowed_kpi_stream(stream, baseline, window="1 hour",
                                 watermark="2 hours")
    q = (
        scored.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()

    rows = {}
    for r in spark.table("late_drop").collect():
        rows.setdefault(r["window_start"].hour, []).append(r["n_events"])
    # window 10 emitted ONCE with the 2 on-time events; the too-late
    # 10:40 row (arriving after emission + state eviction) is dropped —
    # no re-emission, no duplicate, no phantom 1-event window
    assert rows.get(10) == [2], rows


def test_events_stream_empty_dir_falls_back_to_static_schema(spark, tmp_path):
    """A stream directory with no files yet is a normal startup state:
    the batch schema probe cannot infer, so events_stream must fall back
    to the static EVENT_SCHEMA instead of throwing."""
    from riskloc_spark.streaming.pipeline import EVENT_SCHEMA

    d = tmp_path / "empty"
    d.mkdir()
    stream = events_stream(spark, str(d))
    assert stream.isStreaming
    assert stream.schema == EVENT_SCHEMA
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_events_stream_missing_path_fails_fast(spark, tmp_path):
    """Only UNABLE_TO_INFER_SCHEMA (empty dir) may fall back to the
    static schema. A nonexistent / mistyped path raises
    AnalysisException(PATH_NOT_FOUND) too, and silently streaming from a
    typo'd path with a guessed schema would be a data-loss bug — it must
    re-raise (round-6 ADVICE)."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as exc:
        events_stream(spark, str(tmp_path / "no_such_subdir"))
    assert "PATH_NOT_FOUND" in (exc.value.getErrorClass() or "")


def test_events_stream_ntz_independent_of_session_tz(spark, tmp_path):
    """The NTZ->timestamp conversion must treat the wall-clock as UTC via
    interval arithmetic — NOT by mutating spark.sql.session.timeZone, and
    NOT via a cast (which interprets the wall-clock in the session tz, so
    an offset tz like +05:30 would shift hourly window alignment)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ntz"
    d.mkdir()
    base = pd.DataFrame(
        {
            "event_id": [1],
            "ts": pd.to_datetime(["2024-05-01 10:15:00"]),
            "user_id": [10],
            "event_type": ["a"],
            "value": [1.0],
        }
    )
    table = pa.Table.from_pandas(base)
    idx = table.schema.get_field_index("ts")
    table = table.set_column(
        idx, pa.field("ts", pa.timestamp("us")), table.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(table, d / "events.parquet")

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        stream = events_stream(spark, str(d))
        # no hidden session mutation
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Kolkata"
        q = (
            stream.writeStream.format("memory")
            .queryName("ntz_tz_independent")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        got_us = (
            spark.table("ntz_tz_independent")
            .select(F.unix_micros("ts").alias("us"))
            .collect()[0]["us"]
        )
        expect_us = int(
            pd.Timestamp("2024-05-01 10:15:00", tz="UTC").value // 1_000
        )
        assert got_us == expect_us, (got_us, expect_us)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_streaming_dedup_state_eviction(spark, tmp_path):
    """Pins dropDuplicatesWithinWatermark's bounded-state trade, which
    the streaming_dedup gate cannot see (single batch): a duplicate
    arriving while its key is within the watermark horizon is DROPPED;
    a duplicate of a key that aged past the horizon is RE-EMITTED (the
    state was evicted — exact-once over unbounded time is impossible
    with bounded state). Staged as mtime-ordered files with
    maxFilesPerTrigger=1, late data >= two triggers after the
    watermark-advancing data (the one-trigger-lagging filter pinned in
    round 5)."""
    import os
    import shutil
    import uuid
    from datetime import datetime

    import pandas as pd

    from riskloc_spark.streaming.pipeline import (
        dedup_events_stream,
        events_stream,
    )

    T0 = datetime(2024, 1, 10, 12, 0, 0)

    def mk(event_id, hours_before):
        return {
            "event_id": event_id,
            "ts": pd.Timestamp(T0) - pd.Timedelta(hours=hours_before),
            "user_id": 1,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    # A: old event K (10h before max-ts), recent event R (0.5h), max row.
    # After A the watermark is T0 - 2h, so K's state (expires at its
    # event time + 2h = T0 - 8h) is evictable; R's is not.
    a = pd.DataFrame([mk(100, 10.0), mk(200, 0.5), mk(300, 0.0)])
    # B: a filler row above the watermark — its trigger carries out the
    # eviction of K (state eviction uses the CURRENT batch's watermark,
    # the round-5 finding; input FILTERING lags one trigger, which is
    # why the duplicates arrive in a third file)
    b = pd.DataFrame([mk(400, 0.2)])
    # C: duplicates with FRESH timestamps (same event_id, above the
    # watermark — an old-ts duplicate would be discarded as late INPUT
    # before ever consulting the dedup state): K's key was evicted ->
    # re-emitted; R's key is still in state -> dropped
    c = pd.DataFrame([mk(100, 0.3), mk(200, 0.25)])
    for i, (name, pdf) in enumerate([("a", a), ("b", b), ("c", c)]):
        tmp = tmp_path / f"{name}.dir"
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        dst = stream_dir / f"{name}.parquet"
        shutil.move(str(tmp / part), str(dst))
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = events_stream(
        spark, str(stream_dir), options={"maxFilesPerTrigger": "1"}
    )
    out = dedup_events_stream(stream, ["event_id"], watermark="2 hours")
    qname = "sded_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    ids = [
        r["event_id"] for r in spark.table(qname).select("event_id").collect()
    ]
    from collections import Counter

    counts = Counter(ids)
    assert counts[200] == 1, counts  # in-horizon duplicate dropped
    assert counts[100] == 2, counts  # evicted key re-emitted
    assert counts[300] == 1 and counts[400] == 1, counts


def test_streaming_near_dup_flags_planted_edits(spark, tmp_path):
    """Streaming NEAR-dup suppression (round 8): planted small-edit
    copies are flagged through the LSH-bucket stateful operator while
    distinct documents pass, in one availableNow batch; the earliest
    (ts, id) per cluster is retained (its verdict is False)."""
    import uuid
    from datetime import datetime

    import pandas as pd

    from riskloc_spark.streaming.pipeline import (
        near_dup_events_stream,
        near_dup_verdicts,
    )

    base = datetime(2024, 1, 10, 12, 0, 0)
    # DISJOINT 40-word vocabularies per original (overlapping windows
    # would make the originals near-dups of each other)
    words = [f"w{i}" for i in range(400)]

    def doc(doc_id, minutes, text):
        return {
            "doc_id": doc_id,
            "ts": pd.Timestamp(base) + pd.Timedelta(minutes=minutes),
            "text": text,
        }

    originals = {
        i: " ".join(words[(i // 2) * 40: (i // 2) * 40 + 40])
        for i in range(0, 12, 2)
    }
    rows = [doc(i, i, t) for i, t in originals.items()]
    # near-dup partner per original: 2 word edits, LATER timestamp
    for i, t in originals.items():
        toks = t.split()
        toks[5], toks[20] = "edited", "tokens"
        rows.append(doc(100 + i, 30 + i, " ".join(toks)))
    # distinct background docs
    for i in range(200, 205):
        rows.append(
            doc(i, 15, " ".join(f"u{i}x{j}" for j in range(40)))
        )

    src = tmp_path / "docs"
    spark.createDataFrame(pd.DataFrame(rows)).write.mode(
        "overwrite"
    ).parquet(str(src))
    schema = "doc_id long, ts timestamp, text string"
    stream = spark.readStream.schema(schema).parquet(str(src))
    # 16 bands x 2 rows: per-band collision probability j^2 makes a
    # missed bucket across all bands vanishingly rare at j ~ 0.7-0.9
    # (8x4 banding left pair 8 with zero shared bands — the standard
    # LSH recall/precision dial, exactly as in the batch pipeline)
    flags = near_dup_events_stream(
        stream, bands=16, jaccard_threshold=0.5
    )
    sink = f"near_dup_{uuid.uuid4().hex[:8]}"
    q = (
        flags.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"
    verdicts = {
        r["doc_id"]: r["is_near_dup"]
        for r in near_dup_verdicts(spark.table(sink)).collect()
    }
    for i in originals:
        assert verdicts[i] is False, f"original {i} wrongly flagged"
        assert verdicts[100 + i] is True, f"edit copy {100+i} missed"
    for i in range(200, 205):
        assert verdicts[i] is False, f"distinct doc {i} wrongly flagged"


def test_streaming_near_dup_state_eviction(spark, tmp_path):
    """The horizon trade, pinned for the NEAR-dup operator exactly as
    for exact dedup: a near-copy arriving while its bucket's
    representative is in state is flagged; after the representative's
    bucket aged past the TTL (event-time timeout), a fresh near-copy is
    re-admitted (is_near_dup False). Staged mtime-ordered files,
    maxFilesPerTrigger=1, late data two triggers after the
    watermark-advancing data."""
    import os
    import shutil
    import uuid
    from datetime import datetime

    import pandas as pd

    from riskloc_spark.streaming.pipeline import (
        near_dup_events_stream,
        near_dup_verdicts,
    )

    T0 = datetime(2024, 1, 10, 12, 0, 0)
    # K and R use DISJOINT vocabularies (an overlap would let R's
    # representative catch K's near-copy through a shared bucket)
    words = [f"v{i}" for i in range(120)]
    text = " ".join(words[:40])
    r_text = " ".join(words[40:80])
    near = text.split()
    near[3], near[17] = "edited", "tokens"
    near_text = " ".join(near)

    def doc(doc_id, hours_before, t):
        return {
            "doc_id": doc_id,
            "ts": pd.Timestamp(T0) - pd.Timedelta(hours=hours_before),
            "text": t,
        }

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    # A: old original K (10h before max), recent original R (0.5h), a
    # max-ts filler. Watermark after A = T0 - 2h; K's buckets (TTL =
    # its event time + 2h = T0 - 8h) are evictable, R's are not.
    a = pd.DataFrame(
        [
            doc(1, 10.0, text),
            doc(2, 0.5, r_text),
            doc(3, 0.0, " ".join(f"f{j}" for j in range(40))),
        ]
    )
    # B: filler above the watermark — its trigger evicts K's buckets
    b = pd.DataFrame([doc(4, 0.2, " ".join(f"g{j}" for j in range(40)))])
    # C: fresh-ts near-copies: K's buckets were evicted -> re-admitted
    # (False); R's representative is live -> flagged (True)
    r_near = " ".join(
        ["edited" if j == 2 else w for j, w in enumerate(words[40: 80])]
    )
    c = pd.DataFrame([doc(10, 0.3, near_text), doc(11, 0.25, r_near)])
    for i, (name, pdf) in enumerate([("a", a), ("b", b), ("c", c)]):
        tmp = tmp_path / f"{name}.dir"
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        dst = stream_dir / f"{name}.parquet"
        shutil.move(str(tmp / part), str(dst))
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    flags = near_dup_events_stream(
        stream, bands=16, jaccard_threshold=0.5
    )
    sink = f"near_dup_ev_{uuid.uuid4().hex[:8]}"
    q = (
        flags.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish"
    verdicts = {
        r["doc_id"]: r["is_near_dup"]
        for r in near_dup_verdicts(spark.table(sink)).collect()
    }
    assert verdicts[10] is False, "evicted bucket must re-admit"
    assert verdicts[11] is True, "live representative must flag the copy"


def test_ingest_dedup_stream_matches_batch_probe(spark, tmp_path):
    """The stream-static ingestion probe: stateless per-band output
    equals the batch incremental_near_dup pairs (collapsed over bands);
    the ts variant collapses in-stream via dropDuplicatesWithinWatermark
    and yields exactly the pair set."""
    import uuid

    import pandas as pd

    from riskloc_spark.operators.dedup import (
        build_near_dup_index,
        incremental_near_dup,
    )
    from riskloc_spark.streaming.pipeline import ingest_dedup_stream

    def body(i):
        return " ".join(f"w{i}x{j}" for j in range(40))

    base = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(30), "text": [body(i) for i in range(30)]}
        )
    )
    index = build_near_dup_index(base).persist()
    # batch: near-dups of base 4 and 9 (one edit), one fresh doc
    rows = [
        # tokens chosen so the substring replace edits exactly one word
        # ("w4x3" would also hit w4x30..w4x39)
        (100, body(4).replace("w4x11 ", "edita "), "2024-01-10 12:00:00"),
        (101, body(9).replace("w9x12 ", "editb "), "2024-01-10 12:01:00"),
        (102, body(777), "2024-01-10 12:02:00"),
    ]
    src = str(tmp_path / "batchdocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ts string"
    ).parquet(src)

    def run(out_df):
        name = "ingest_test_" + uuid.uuid4().hex[:8]
        q = (
            out_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        q.stop()
        return spark.table(name).collect()

    stateless = run(
        ingest_dedup_stream(stream, index, jaccard_threshold=0.5)
    )
    want = {
        (r["new_id"], r["base_id"])
        for r in incremental_near_dup(
            spark.read.parquet(src), index, jaccard_threshold=0.5
        ).collect()
    }
    assert want == {(100, 4), (101, 9)}
    assert {(r["new_id"], r["base_id"]) for r in stateless} == want
    # a high-agreement pair matches in >1 band -> per-band rows exceed
    # the pair count (the stateless contract the docstring records)
    assert len(stateless) > len(want)

    collapsed = run(
        ingest_dedup_stream(
            stream, index, jaccard_threshold=0.5, ts_col="ts",
            watermark="1 hour",
        )
    )
    assert {(r["new_id"], r["base_id"]) for r in collapsed} == want
    assert len(collapsed) == len(want)  # one row per pair
    index.unpersist()


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """hll_registers_stream in complete mode over availableNow files
    must produce EXACTLY the batch sketch's registers — the
    bounded-state streaming distinct-count contract."""
    from riskloc_spark.operators.sketches import hll_sketch
    from riskloc_spark.streaming.pipeline import hll_registers_stream

    src = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(f"t{i % 3}", i % 700) for i in range(4000)],
        "event_type string, user_id long",
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    regs = hll_registers_stream(stream, p=8)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    got = sorted(map(tuple, spark.table("hll_regs_t").collect()))
    want = sorted(
        map(
            tuple,
            hll_sketch(
                df, "user_id", key_cols=["event_type"], p=8
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_contamination_stream_equals_batch_audit(spark, tmp_path):
    """streaming decontamination (append + watermark) == the batch
    audit row-for-row: documents whose event time the watermark has
    passed emit exactly once with the batch n_ngrams / n_matched /
    contamination; carrier docs inside the horizon stay open (not
    emitted)."""
    import os

    import pandas as pd

    from riskloc_spark.operators.decontamination import (
        benchmark_gram_set,
        contamination_stats,
    )
    from riskloc_spark.streaming.pipeline import contamination_stream

    texts = []
    for i in range(10):
        if i < 3:  # planted: share the benchmark phrase verbatim
            texts.append(
                "alpha beta gamma delta epsilon zeta "
                + " ".join(f"d{i}w{j}" for j in range(10))
            )
        else:
            texts.append(" ".join(f"d{i}w{j}" for j in range(16)))
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )

    d = tmp_path / "docs"
    d.mkdir()

    def write(name, ids, ts_list, txts, mtime):
        path = d / name
        pd.DataFrame(
            {
                "doc_id": ids,
                # micros, not pandas-default nanos: the declared
                # stream schema is a plain timestamp
                "ts": pd.to_datetime(ts_list).astype("datetime64[us]"),
                "text": txts,
            }
        ).to_parquet(path)
        os.utime(path, (mtime, mtime))

    write(
        "b1.parquet",
        list(range(10)),
        [f"2024-05-01 10:{10 + i:02d}:00" for i in range(10)],
        texts,
        1_000_000,
    )
    # carriers: push the watermark past every real doc; their own
    # groups stay open and never emit
    write("b2.parquet", [900], ["2024-05-02 10:00:00"],
          ["carrier one text"], 1_000_100)
    # within the 2h horizon of carrier one, so NEITHER carrier's
    # group closes (wm after b3 = 09:00 < carrier one's 10:00)
    write("b3.parquet", [901], ["2024-05-02 11:00:00"],
          ["carrier two text"], 1_000_200)

    bg = benchmark_gram_set(bench, n=4)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    out = contamination_stream(
        stream, bg, n=4, watermark="2 hours"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("contam_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()

    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_matched"],
                      round(r["contamination"], 9))
        for r in spark.table("contam_stream").collect()
    }
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    want = {
        r["doc_id"]: (r["n_ngrams"], r["n_matched"],
                      round(r["contamination"], 9))
        for r in contamination_stats(corpus, bench, n=4).collect()
    }
    assert got == want  # every real doc, once, batch-equal; no carriers
    for i in range(3):
        assert got[i][1] >= 1  # planted overlap flagged
    assert got[5][1] == 0
