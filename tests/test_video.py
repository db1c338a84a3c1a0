"""Video (RIFF/AVI MJPEG) modality: demux round trips, chunk-walk
robustness, guards, and the Spark-side frame operators."""
import struct

import numpy as np
import pytest

from riskloc_spark.operators.jpeg import decode_jpeg, encode_jpeg
from riskloc_spark.operators.video import (
    MAX_FRAMES,
    MAX_VIDEO_BYTES,
    encode_avi_mjpeg,
    parse_avi,
    synthesize_avi_corpus,
    video_frame_stats,
    video_meta,
    _synth_params,
)


def _jpeg(v, tw=2, th=1):
    t = np.arange(tw * th, dtype=np.int64)
    tiles = ((v + t * 7) % 256).reshape(th, tw)
    return encode_jpeg(np.kron(tiles, np.ones((8, 8), dtype=np.int64)))


def test_roundtrip_demux():
    frames = [_jpeg(10), _jpeg(60), _jpeg(200)]
    raw = encode_avi_mjpeg(frames, 16, 8, 40000)
    dec = parse_avi(raw)
    assert dec["width"] == 16 and dec["height"] == 8
    assert dec["n_frames"] == 3 and dec["us_per_frame"] == 40000
    assert dec["duration_us"] == 120000
    assert dec["frames"] == frames
    for f in dec["frames"]:
        assert decode_jpeg(f) is not None


def test_unknown_chunk_and_list_skipped():
    raw = encode_avi_mjpeg([_jpeg(1)], 16, 8, 40000)
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    patched = raw[:12] + junk + raw[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec = parse_avi(patched)
    assert dec is not None and dec["n_frames"] == 1


def test_rejects_garbage_truncated_oversize_bomb():
    raw = encode_avi_mjpeg([_jpeg(1), _jpeg(2)], 16, 8, 40000)
    assert parse_avi(b"not an avi") is None
    assert parse_avi(raw[:50]) is None
    assert parse_avi(raw, budget=10) is None
    assert parse_avi(raw, max_frames=1) is None  # frame-count bomb guard
    assert MAX_VIDEO_BYTES >= 1 << 20 and MAX_FRAMES >= 256


def test_header_stream_disagreement_trusts_stream():
    raw = encode_avi_mjpeg([_jpeg(1), _jpeg(2)], 16, 8, 40000)
    # corrupt avih dwTotalFrames (offset 16 into the 40-byte body)
    p = raw.index(b"avih") + 8 + 16
    bad = raw[:p] + struct.pack("<I", 99) + raw[p + 4 :]
    dec = parse_avi(bad)
    assert dec["n_frames"] == 2 and dec["duration_us"] == 80000


@pytest.fixture(scope="module")
def avi_corpus(spark):
    ids = spark.range(0, 24).withColumnRenamed("id", "media_id")
    return synthesize_avi_corpus(ids).cache()


def test_video_meta_contract(spark, avi_corpus):
    rows = {r["media_id"]: r for r in video_meta(avi_corpus).collect()}
    assert len(rows) == 24
    for d in range(24):
        nf, tw, th, upf = _synth_params(d)
        r = rows[d]
        assert (r["width"], r["height"]) == (tw * 8, th * 8)
        assert (r["n_frames"], r["us_per_frame"]) == (nf, upf)
        assert r["duration_us"] == nf * upf


def test_video_meta_null_for_garbage(spark):
    df = spark.createDataFrame(
        [(9, bytearray(b"xx"))], "media_id long, payload binary"
    )
    r = video_meta(df).collect()[0]
    assert r["media_id"] == 9 and r["width"] is None


def test_video_frame_stats_and_stride(spark, avi_corpus):
    full = video_frame_stats(avi_corpus).collect()
    by_id = {}
    for r in full:
        by_id.setdefault(r["media_id"], []).append(r)
    for d in [0, 1, 5]:
        nf, tw, th, upf = _synth_params(d)
        frames = sorted(by_id[d], key=lambda r: r["frame_idx"])
        assert [f["frame_idx"] for f in frames] == list(range(nf))
        assert [f["ts_us"] for f in frames] == [k * upf for k in range(nf)]
        assert all(
            (f["width"], f["height"]) == (tw * 8, th * 8) for f in frames
        )
    # temporal stride keeps every other frame
    strided = video_frame_stats(avi_corpus, every=2).collect()
    assert {r["frame_idx"] for r in strided} <= {0, 2}
    want = {
        (r["media_id"], r["frame_idx"]): r["pix_sum"]
        for r in full
        if r["frame_idx"] % 2 == 0
    }
    got = {(r["media_id"], r["frame_idx"]): r["pix_sum"] for r in strided}
    assert got == want
    with pytest.raises(ValueError):
        video_frame_stats(avi_corpus, every=0)


def test_bad_frame_inside_good_container(spark):
    raw = encode_avi_mjpeg([_jpeg(1), b"\xff\xd8 not a jpeg"], 16, 8, 40000)
    df = spark.createDataFrame(
        [(1, bytearray(raw))], "media_id long, payload binary"
    )
    rows = sorted(
        video_frame_stats(df).collect(), key=lambda r: r["frame_idx"]
    )
    assert len(rows) == 2
    assert rows[0]["pix_sum"] is not None
    assert rows[1]["pix_sum"] is None  # accountable, not silently dropped


def test_nesting_bomb_rejected():
    # 40 levels of nested LISTs: must return None, not blow the stack
    inner = b""
    for _ in range(40):
        body = b"aaaa" + inner
        inner = b"LIST" + struct.pack("<I", len(body)) + body
    raw = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert parse_avi(raw) is None


def test_rec_list_wrapped_frames_collected():
    """Interleaved AVIs wrap frame chunks in 'rec ' LISTs inside movi
    (review finding): in_movi must propagate into sub-LISTs."""
    frames = [_jpeg(3), _jpeg(9)]
    raw = encode_avi_mjpeg(frames, 16, 8, 40000)
    # rebuild: wrap each 00dc chunk in its own 'rec ' LIST
    movi_body = b""
    for f in frames:
        chunk = b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) % 2:
            chunk += b"\x00"
        rec = b"rec " + chunk
        movi_body += b"LIST" + struct.pack("<I", len(rec)) + rec
    movi = b"movi" + movi_body
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + movi
    hdr_end = raw.index(b"LIST", raw.index(b"hdrl") - 8)  # original movi
    # splice: keep everything before the original movi LIST, swap it
    orig_movi_at = raw.index(b"movi") - 8
    (orig_size,) = struct.unpack("<I", raw[orig_movi_at + 4 : orig_movi_at + 8])
    after = raw[orig_movi_at + 8 + orig_size :]
    patched = raw[:orig_movi_at] + movi_list + after
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec = parse_avi(patched)
    assert dec is not None and dec["n_frames"] == 2
    assert dec["frames"] == frames


def test_null_payload_rows_survive(spark):
    df = spark.createDataFrame(
        [(1, None)], "media_id long, payload binary"
    )
    r = video_meta(df).collect()[0]
    assert r["media_id"] == 1 and r["width"] is None
    assert video_frame_stats(df).collect() == []


# ---------------------------------------------------------------------------
# per-frame dhash + video near-dup (round 11)
# ---------------------------------------------------------------------------

def test_video_dhash_and_near_dup(spark):
    """A re-encode-alike copy (same pixels) matches on every frame; a
    one-shared-frame video stays below the match threshold; an
    unrelated video matches nothing."""
    import numpy as np

    from riskloc_spark.operators.jpeg import encode_jpeg
    from riskloc_spark.operators.video import (
        encode_avi_mjpeg,
        video_dhash,
        video_near_dup,
    )

    rng = np.random.default_rng(31)
    frames_a = [
        encode_jpeg(rng.integers(0, 256, (16, 16, 3)).astype(np.int64))
        for _ in range(4)
    ]
    frames_c = [
        encode_jpeg(rng.integers(0, 256, (16, 16, 3)).astype(np.int64))
        for _ in range(4)
    ]
    # b: the same frame payloads re-containered; d: shares ONE frame
    frames_b = list(frames_a)
    frames_d = [frames_a[0]] + frames_c[1:]
    rows = [
        (0, bytearray(encode_avi_mjpeg(frames_a, 16, 16, 40_000))),
        (1, bytearray(encode_avi_mjpeg(frames_b, 16, 16, 40_000))),
        (2, bytearray(encode_avi_mjpeg(frames_c, 16, 16, 40_000))),
        (3, bytearray(encode_avi_mjpeg(frames_d, 16, 16, 40_000))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    h = video_dhash(df)
    assert h.count() == 16
    pairs = {(r["id_a"], r["id_b"]): r["matched_frames"]
             for r in video_near_dup(df, min_frame_matches=2).collect()}
    assert pairs.get((0, 1)) == 4
    assert (0, 2) not in pairs and (1, 2) not in pairs
    assert (0, 3) not in pairs  # one shared frame < threshold
    assert pairs.get((2, 3)) == 3  # d shares 3 frames with c
    single = {(r["id_a"], r["id_b"]): r["matched_frames"]
              for r in video_near_dup(df, min_frame_matches=1).collect()}
    assert single.get((0, 3)) == 1
