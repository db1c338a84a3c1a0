"""The dependency-free GIF pixel codec (operators/gif.py): LZW round
trips across width-growth and table-full regimes, cross-compatibility
against the canonical published sample stream, container round trips
(interlace, palettes, delays), bomb guards, and the real-pixel GIF
branches of media_features / resize_media / sample_frames."""
import struct

import numpy as np
import pytest

from riskloc_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_frames,
    encode_gif,
    expand_gif_palette,
)

RNG = np.random.default_rng(11)

# The 10x10 sample image from the public GIF-format walkthrough: its
# exact LZW bytes (min code size 2) and the pixel indices they decode
# to. This pins cross-compatibility with real-world encoders — the
# stream crosses the 3-bit -> 4-bit -> 5-bit width boundaries, so any
# width-growth sync error derails it.
CANONICAL_LZW = bytes([
    0x8C, 0x2D, 0x99, 0x87, 0x2A, 0x1C, 0xDC, 0x33, 0xA0, 0x02, 0x75,
    0xEC, 0x95, 0xFA, 0xA8, 0xDE, 0x60, 0x8C, 0x04, 0x91, 0x4C, 0x01,
])
CANONICAL_PIXELS = np.array([
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
])


def test_lzw_decodes_canonical_published_stream():
    out = _lzw_decode(CANONICAL_LZW, 2, 100)
    assert out is not None
    assert np.array_equal(out.reshape(10, 10), CANONICAL_PIXELS)


def test_decode_hand_assembled_container_with_canonical_stream():
    """Full container decode independent of our encoder: header, global
    palette, image descriptor, and sub-blocked canonical LZW data all
    hand-assembled."""
    pal = bytes([255, 255, 255, 255, 0, 0, 0, 0, 255, 0, 0, 0])
    gif = (
        b"GIF89a"
        + struct.pack("<HH", 10, 10)
        + bytes([0x81, 0, 0])          # global table, 4 entries
        + pal
        + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 10, 10) + bytes([0])
        + bytes([2])                    # LZW min code size
        + bytes([len(CANONICAL_LZW)]) + CANONICAL_LZW + bytes([0])
        + bytes([0x3B])
    )
    out = decode_gif_frames(gif)
    assert out is not None and (out["width"], out["height"]) == (10, 10)
    fr = out["frames"][0]
    assert np.array_equal(fr["indices"], CANONICAL_PIXELS)
    assert np.array_equal(fr["palette"].reshape(-1), np.frombuffer(pal, np.uint8))


@pytest.mark.parametrize(
    "n,hi,mcs",
    [(10, 4, 2), (100, 4, 2), (1000, 4, 2), (5000, 16, 4),
     (20000, 8, 3), (300, 2, 2), (60000, 4, 2), (100000, 256, 8)],
)
def test_lzw_round_trip(n, hi, mcs):
    idx = RNG.integers(0, hi, size=n)
    dec = _lzw_decode(_lzw_encode(idx, mcs), mcs, n)
    assert dec is not None and np.array_equal(dec, idx)


def test_lzw_round_trip_repetitive_and_table_full():
    # KwKwK stress + table saturation past 4096 entries
    idx = np.tile([0, 0, 1, 1], 30000)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, idx.size), idx)
    idx = np.zeros(50000, dtype=int)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, idx.size), idx)


def test_container_round_trip_with_delays_and_interlace():
    pal = RNG.integers(0, 256, size=(8, 3)).astype(np.uint8)
    frames = [RNG.integers(0, 8, size=(5, 7)) for _ in range(3)]
    for interlace in (False, True):
        out = decode_gif_frames(
            encode_gif(frames, pal, delay_ms=120, interlace=interlace)
        )
        assert len(out["frames"]) == 3
        for f, fr in zip(frames, out["frames"]):
            assert np.array_equal(fr["indices"], f)
            assert fr["interlaced"] == interlace
            assert fr["delay_ms"] == 120
            assert np.array_equal(
                expand_gif_palette(fr), pal.astype(np.int64)[f]
            )


@pytest.mark.parametrize("n_colors", [4, 16, 256])
def test_container_palette_sizes(n_colors):
    pal = RNG.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    frame = RNG.integers(0, n_colors, size=(4, 6))
    out = decode_gif_frames(encode_gif([frame], pal))
    assert np.array_equal(out["frames"][0]["indices"], frame)


def test_decode_rejections():
    pal = RNG.integers(0, 256, size=(4, 3)).astype(np.uint8)
    good = encode_gif([RNG.integers(0, 4, size=(3, 3))], pal)
    assert decode_gif_frames(b"junk") is None
    assert decode_gif_frames(good[:15]) is None  # truncated
    # declared dimensions bomb: rejected before allocation
    bomb = bytearray(good)
    struct.pack_into("<HH", bomb, 6, 65535, 65535)
    assert decode_gif_frames(bytes(bomb)) is None
    # no frames (header + trailer only)
    empty = good[:13 + 12] + bytes([0x3B])
    assert decode_gif_frames(empty) is None
    # corrupt LZW (flip data bytes): may decode to garbage indices or
    # fail, but must return None/dict — never raise (index-range and
    # expected-count checks bound the damage)
    corrupt = bytearray(good)
    corrupt[-6:-2] = b"\xff\xff\xff\xff"
    out = decode_gif_frames(bytes(corrupt))
    assert out is None or isinstance(out, dict)


def test_synth_gif_matches_formula():
    from riskloc_spark.operators.multimodal import _synth_gif

    for d in range(20):
        out = decode_gif_frames(_synth_gif(d))
        nf, w, h = 1 + d % 3, 3 + d % 5, 2 + d % 4
        assert len(out["frames"]) == nf, d
        for k, fr in enumerate(out["frames"]):
            assert fr["interlaced"] == bool(d % 2)
            assert fr["delay_ms"] == 10 * (1 + d % 5)
            p = np.arange(w * h, dtype=np.int64)
            expect = ((d + k * 11 + p * 3) % 8).reshape(h, w)
            assert np.array_equal(fr["indices"], expect), (d, k)
            j = fr["indices"]
            rgb = expand_gif_palette(fr)
            assert np.array_equal(rgb[:, :, 0], (j * 41 + d) % 256)


def test_header_parser_consistent_with_pixel_codec():
    from riskloc_spark.operators.multimodal import _synth_gif, parse_image_header

    for d in (0, 3, 7):
        data = _synth_gif(d)
        meta = parse_image_header(data)
        out = decode_gif_frames(data)
        assert meta["n_frames"] == len(out["frames"])
        assert meta["width"] == out["width"]
        assert meta["height"] == out["height"]
        assert meta["duration_ms"] == out["frames"][0]["delay_ms"] * len(
            out["frames"]
        )


def test_media_features_gif_branch():
    from riskloc_spark.operators.multimodal import _png_feature, _synth_gif, media_features

    # driver-level check of the kernel the Spark branch calls
    gif = decode_gif_frames(_synth_gif(4))
    samples = expand_gif_palette(gif["frames"][0])
    feat = _png_feature(samples, 16)
    assert np.isclose(feat[4:].sum(), 1.0, atol=1e-6)


def test_resize_and_sample_frames_gif_paths(spark):
    from riskloc_spark.operators.multimodal import (
        _synth_gif,
        resize_media,
        sample_frames,
    )
    from riskloc_spark.operators.png import resize_nearest

    rows = [(int(i), bytearray(_synth_gif(i))) for i in range(10)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    # resize: frame-0 index plane, nearest, same palette
    out = resize_media(df, width=4, height=3).collect()
    for r in out:
        dec = decode_gif_frames(bytes(r["payload"]))
        assert dec is not None and (dec["width"], dec["height"]) == (4, 3)
        src = decode_gif_frames(_synth_gif(r["media_id"]))["frames"][0]
        expect = resize_nearest(src["indices"][:, :, None], 4, 3)[:, :, 0]
        assert np.array_equal(dec["frames"][0]["indices"], expect)
    # sample_frames: real standalone single-frame GIFs at kept indices
    frames = sample_frames(df, every_n=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for d in range(10):
        nf = 1 + d % 3
        kept = sorted(r["frame_idx"] for r in by_media[d])
        assert kept == list(range(0, nf, 2)), d
        for r in by_media[d]:
            dec = decode_gif_frames(bytes(r["frame"]))
            src = decode_gif_frames(_synth_gif(d))["frames"][r["frame_idx"]]
            assert np.array_equal(dec["frames"][0]["indices"], src["indices"])


def test_decode_never_raises_on_adversarial_bytes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=120))
    def check(tail):
        for payload in (tail, b"GIF89a" + tail):
            out = decode_gif_frames(payload)
            assert out is None or isinstance(out, dict)

    check()


def test_lzw_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 500),
        st.sampled_from([2, 3, 4, 8]),
        st.integers(0, 2**32 - 1),
    )
    def check(n, mcs, seed):
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, 1 << mcs, size=n)
        dec = _lzw_decode(_lzw_encode(idx, mcs), mcs, n)
        assert dec is not None and np.array_equal(dec, idx)

    check()


def test_total_animation_bomb_rejected():
    """Per-frame bounds are not enough: many frames of a large canvas
    must trip the ANIMATION-total guard (round-7 review finding)."""
    from unittest.mock import patch

    import riskloc_spark.operators.gif as G

    pal = RNG.integers(0, 256, size=(4, 3)).astype(np.uint8)
    frame = np.zeros((64, 64), dtype=int)
    data = encode_gif([frame] * 5, pal)
    # 5 * 4096 samples; patch the bound below that total (but above a
    # single frame) and the decode must refuse
    with patch.object(G, "MAX_SAMPLES", 10000):
        assert G.decode_gif_frames(data) is None
    assert decode_gif_frames(data) is not None  # real bound: fine


def test_two_entry_palette_padded_by_encoder():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    frame = RNG.integers(0, 2, size=(4, 4))
    out = decode_gif_frames(encode_gif([frame], pal))
    assert np.array_equal(out["frames"][0]["indices"], frame)


def test_sample_frames_skips_transparency_optimized_gifs(spark):
    """A full-canvas frame with a transparency index means 'show the
    previous frame's pixel' — sample_frames must fall back to the stub
    rather than emit the uncomposited plane as real pixels."""
    import struct as _s

    from riskloc_spark.operators.multimodal import sample_frames

    pal = RNG.integers(0, 256, size=(4, 3)).astype(np.uint8)
    frames = [RNG.integers(0, 4, size=(3, 3)) for _ in range(2)]
    data = bytearray(encode_gif(frames, pal, delay_ms=100))
    # set the transparency flag + index in the first GCE
    i = data.find(bytes([0x21, 0xF9]))
    assert i > 0
    data[i + 3] |= 0x01  # transparent color flag
    data[i + 6] = 2      # transparent index
    out = decode_gif_frames(bytes(data))
    assert out["frames"][0]["transparent_idx"] == 2
    df = spark.createDataFrame(
        [(1, bytearray(bytes(data)))], "media_id long, payload binary"
    )
    rows = sample_frames(df, every_n=1).collect()
    # stub path: frames are byte slices of the payload, not valid GIFs
    assert all(decode_gif_frames(bytes(r["frame"])) is None for r in rows)
