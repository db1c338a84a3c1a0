"""The dependency-free PNG pixel codec (operators/png.py): round trips
across all color types / bit depths / filters, decoder independence via
hand-assembled PNG bytes (stored-deflate blocks, no shared encoder),
hand-computed unfilter math per filter type, resize kernels, and the
real-pixel branches of media_features / resize_media."""
import binascii
import struct
import zlib

import numpy as np
import pytest

from riskloc_spark.operators.png import (
    decode_png,
    decoded_samples,
    encode_png,
    expand_palette,
    resize_bilinear,
    resize_nearest,
)

RNG = np.random.default_rng(7)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", binascii.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _stored_idat(raw: bytes) -> bytes:
    """A zlib stream with a single STORED deflate block — hand-assembled,
    so decode tests do not depend on our encoder or zlib.compress."""
    return (
        b"\x78\x01"
        + b"\x01"
        + struct.pack("<HH", len(raw), 0xFFFF ^ len(raw))
        + raw
        + struct.pack(">I", zlib.adler32(raw))
    )


def _hand_png(width, height, bit_depth, color_type, raw, palette=None):
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0),
    )
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    out += _chunk(b"IDAT", _stored_idat(raw))
    out += _chunk(b"IEND", b"")
    return bytes(out)


CASES = [
    (0, 8, (5, 7)), (2, 8, (4, 6, 3)), (6, 8, (3, 5, 4)), (4, 8, (6, 4, 2)),
    (0, 16, (5, 3)), (2, 16, (3, 4, 3)), (4, 16, (2, 3, 2)), (6, 16, (2, 2, 4)),
    (0, 1, (7, 11)), (0, 2, (5, 9)), (0, 4, (4, 5)),
    (3, 8, (6, 5)), (3, 4, (5, 7)), (3, 2, (4, 9)), (3, 1, (3, 6)),
]


@pytest.mark.parametrize("color_type,bit_depth,shape", CASES)
@pytest.mark.parametrize("filter_mode", [0, 1, 2, 3, 4, "cycle"])
def test_round_trip(color_type, bit_depth, shape, filter_mode):
    hi = 1 << bit_depth
    arr = RNG.integers(0, min(hi, 16) if color_type == 3 else hi, size=shape)
    pal = (
        RNG.integers(0, 256, size=(16, 3)).astype(np.uint8)
        if color_type == 3
        else None
    )
    data = encode_png(arr, color_type, bit_depth, palette=pal, filter_mode=filter_mode)
    dec = decode_png(data)
    assert dec is not None
    got = dec["pixels"][:, :, 0] if arr.ndim == 2 else dec["pixels"]
    assert np.array_equal(got, arr)
    assert dec["bit_depth"] == bit_depth
    assert dec["color_type"] == color_type
    if color_type == 3:
        assert np.array_equal(dec["palette"], pal)
        assert np.array_equal(
            expand_palette(dec["pixels"], dec["palette"]),
            pal.astype(np.int64)[arr],
        )


def test_decode_external_stored_deflate_png():
    """Decoder correctness independent of our encoder: the IDAT stream is
    a hand-assembled STORED deflate block."""
    raw = bytes([0, 10, 20, 0, 30, 40])  # 2 rows, filter 0
    dec = decode_png(_hand_png(2, 2, 8, 0, raw))
    assert np.array_equal(dec["pixels"][:, :, 0], [[10, 20], [30, 40]])


def test_unfilter_sub_hand_computed():
    # bpp=1, row [1,2,3]: Sub-filtered bytes are deltas [1,1,1]
    raw = bytes([1, 1, 1, 1])
    dec = decode_png(_hand_png(3, 1, 8, 0, raw))
    assert np.array_equal(dec["pixels"][0, :, 0], [1, 2, 3])


def test_unfilter_up_hand_computed():
    # row0 [1,2,3] (None), row1 filtered Up [4,4,4] -> [5,6,7]
    raw = bytes([0, 1, 2, 3, 2, 4, 4, 4])
    dec = decode_png(_hand_png(3, 2, 8, 0, raw))
    assert np.array_equal(dec["pixels"][:, :, 0], [[1, 2, 3], [5, 6, 7]])


def test_unfilter_average_hand_computed():
    # row0 [4,6] (None); row1 Average-filtered [8,12]:
    #   x0 = 8 + ((0 + 4) >> 1) = 10;  x1 = 12 + ((10 + 6) >> 1) = 20
    raw = bytes([0, 4, 6, 3, 8, 12])
    dec = decode_png(_hand_png(2, 2, 8, 0, raw))
    assert np.array_equal(dec["pixels"][:, :, 0], [[4, 6], [10, 20]])


def test_unfilter_paeth_hand_computed():
    # row0 [3, 9] (None); row1 Paeth-filtered [1, 2]:
    #   x0: a=0,b=3,c=0 -> p=3, pa=3,pb=0 -> pred=b=3, x0=1+3=4
    #   x1: a=4,b=9,c=3 -> p=10, pa=6,pb=1,pc=7 -> pred=b=9, x1=2+9=11
    raw = bytes([0, 3, 9, 4, 1, 2])
    dec = decode_png(_hand_png(2, 2, 8, 0, raw))
    assert np.array_equal(dec["pixels"][:, :, 0], [[3, 9], [4, 11]])


def test_sub_byte_depths_padding_and_msb_order():
    # 1-bit, width 3 (needs padding): row bits 101x -> byte 0b1010_0000
    raw = bytes([0, 0b10100000])
    dec = decode_png(_hand_png(3, 1, 1, 0, raw))
    assert np.array_equal(dec["pixels"][0, :, 0], [1, 0, 1])
    # 2-bit, width 3: values 3,0,2 -> bits 11 00 10 xx -> 0b1100_1000
    raw = bytes([0, 0b11001000])
    dec = decode_png(_hand_png(3, 1, 2, 0, raw))
    assert np.array_equal(dec["pixels"][0, :, 0], [3, 0, 2])
    # 4-bit, width 3: values 15,1,9 -> 0xF1 0x90
    raw = bytes([0, 0xF1, 0x90])
    dec = decode_png(_hand_png(3, 1, 4, 0, raw))
    assert np.array_equal(dec["pixels"][0, :, 0], [15, 1, 9])


def test_sixteen_bit_big_endian():
    raw = bytes([0]) + struct.pack(">HH", 0x0102, 0xFFEE)
    dec = decode_png(_hand_png(2, 1, 16, 0, raw))
    assert np.array_equal(dec["pixels"][0, :, 0], [0x0102, 0xFFEE])


def test_decode_rejects_bad_inputs():
    good_raw = bytes([0, 10, 20, 0, 30, 40])
    good = _hand_png(2, 2, 8, 0, good_raw)
    assert decode_png(b"not a png") is None
    assert decode_png(good[:40]) is None  # truncated
    # an Adam7 flag over a NON-interlaced-layout stream: the per-pass
    # expected length no longer matches -> None, not garbage pixels
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    adam = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _stored_idat(good_raw)) + _chunk(b"IEND", b"")
    )
    assert decode_png(adam) is None
    # interlace byte outside (0, 1) is invalid
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2)
    bad2 = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr2)
        + _chunk(b"IDAT", _stored_idat(good_raw)) + _chunk(b"IEND", b"")
    )
    assert decode_png(bad2) is None
    # corrupt zlib stream
    assert decode_png(_hand_png(2, 2, 8, 0, b"")[:-12]) is None
    bad_idat = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", b"\x00garbage")
        + _chunk(b"IEND", b"")
    )
    assert decode_png(bad_idat) is None
    # raw length mismatch (3x3 header over 2x2 data)
    assert decode_png(_hand_png(3, 3, 8, 0, good_raw)) is None
    # palette image without PLTE
    assert decode_png(_hand_png(2, 2, 8, 3, good_raw)) is None
    # palette index out of range (index 5, 2-entry palette)
    raw = bytes([0, 5])
    pal = bytes([0, 0, 0, 255, 255, 255])
    assert decode_png(_hand_png(1, 1, 8, 3, raw, palette=pal)) is None
    # invalid filter byte
    raw = bytes([9, 10, 20, 0, 30, 40])
    assert decode_png(_hand_png(2, 2, 8, 0, raw)) is None


def test_apng_fctl_duration():
    """parse_image_header SUMS the per-fcTL delay fractions over the
    chunk walk (round-8 ADVICE: frame-0-times-n was wrong for
    variable-delay APNGs) — still no Pillow-present/absent flap."""
    from riskloc_spark.operators.multimodal import parse_image_header

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    actl = struct.pack(">II", 3, 0)  # 3 frames
    # VARIABLE delays: 1/4 s, 1/2 s, 3/4 s -> total 1500 ms
    fctls = [
        struct.pack(">IIIIIHHBB", k, 4, 4, 0, 0, 1 + k, 4, 0, 0)
        for k in range(3)
    ]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", actl)
        + _chunk(b"fcTL", fctls[0])
        + _chunk(b"IDAT", _stored_idat(b""))
        + _chunk(b"fcTL", fctls[1])
        + _chunk(b"fdAT", b"\x00\x00\x00\x01")
        + _chunk(b"fcTL", fctls[2])
        + _chunk(b"fdAT", b"\x00\x00\x00\x02")
        + _chunk(b"IEND", b"")
    )
    meta = parse_image_header(png)
    assert meta["n_frames"] == 3
    assert meta["duration_ms"] == 250 + 500 + 750
    # delay_den == 0 means 1/100 s per spec
    fctl0 = struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0, 7, 0, 0, 0)
    png0 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", actl)
        + _chunk(b"fcTL", fctl0)
        + _chunk(b"IDAT", _stored_idat(b""))
        + _chunk(b"IEND", b"")
    )
    assert parse_image_header(png0)["duration_ms"] == 70  # one fcTL seen


def test_resize_nearest_floor_mapping():
    a = np.arange(24).reshape(4, 6, 1)
    out = resize_nearest(a, 3, 2)
    # src = dst * src_extent // dst_extent
    assert np.array_equal(out[:, :, 0], [[0, 2, 4], [12, 14, 16]])
    # upsampling repeats
    up = resize_nearest(np.array([[1, 2]]).reshape(1, 2, 1), 4, 2)
    assert np.array_equal(up[:, :, 0], [[1, 1, 2, 2], [1, 1, 2, 2]])


def test_resize_bilinear_half_pixel_centers():
    a = np.array([[0.0, 10.0], [20.0, 30.0]]).reshape(2, 2, 1)
    out = resize_bilinear(a, 4, 4)
    # center sample grid: fx = (x+0.5)*0.5-0.5 in [-0.25, 1.25] clamped
    assert out.shape == (4, 4, 1)
    assert out[0, 0, 0] == 0.0 and out[3, 3, 0] == 30.0  # corners clamp
    # exact midpoint between columns: fx=0.5 -> (0+10)/2
    assert np.isclose(out[0, 1, 0], 2.5)  # fx=0.25: 0*0.75 + 10*0.25
    # identity when target == source
    same = resize_bilinear(a, 2, 2)
    assert np.allclose(same, a)


def test_media_features_png_branch_real_pixels():
    from riskloc_spark.operators.multimodal import _png_feature

    arr = RNG.integers(0, 256, size=(6, 5, 3))
    samples = arr.astype(np.int64)
    feat = _png_feature(samples, 16)
    maxv = samples.max()
    assert np.isclose(feat[0], samples[:, :, 0].mean() / maxv, atol=1e-6)
    assert np.isclose(feat[1], samples[:, :, 1].mean() / maxv, atol=1e-6)
    assert feat[3] == 0.0  # absent 4th channel
    hist = feat[4:]
    assert np.isclose(hist.sum(), 1.0, atol=1e-6)  # fractions over pixels


def test_synth_corpus_matches_formula():
    """The gate's generator really produces the closed-form samples the
    SQL twin recomputes (palette expansion included)."""
    from riskloc_spark.operators.multimodal import _synth_png

    for d in range(25):
        dec = decode_png(_synth_png(d))
        samples = decoded_samples(dec)
        h, w, c = samples.shape
        flat = samples.reshape(-1)
        case = d % 5
        s = np.arange(flat.size, dtype=np.int64)
        if case == 0:
            expect = (d * 31 + s * 7) % 256
        elif case == 1:
            expect = (d * 17 + s * 11) % 256
        elif case == 2:
            j = (d + s // 3) % 16
            expect = np.where(
                s % 3 == 0, (j * 37 + d) % 256,
                np.where(s % 3 == 1, (j * 59 + d) % 256, (j * 83 + d) % 256),
            )
        elif case == 3:
            expect = (d * 257 + s * 4099) % 65536
        else:
            expect = (d * 13 + s * 5) % 256
        assert np.array_equal(flat, expect), d


def test_resize_media_real_png_path(spark):
    """End-to-end Spark path: PNG payloads come back really resized and
    re-encoded (decodable, target dims, true resampled pixels)."""
    from riskloc_spark.operators.multimodal import _synth_png, resize_media

    rows = [(int(i), bytearray(_synth_png(i))) for i in range(10)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = resize_media(df, width=4, height=3, method="nearest").collect()
    assert len(out) == 10
    for r in out:
        dec = decode_png(bytes(r["payload"]))
        assert dec is not None
        assert dec["pixels"].shape[:2] == (3, 4)
        src = decode_png(_synth_png(r["media_id"]))
        expect = resize_nearest(src["pixels"], 4, 3)
        assert np.array_equal(dec["pixels"], expect)


def test_round_trip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 9), st.integers(1, 9),
        st.sampled_from([(0, 8), (2, 8), (6, 8), (0, 16), (0, 4), (0, 1)]),
        st.integers(0, 4),
        st.integers(0, 2**32 - 1),
    )
    def check(w, h, ct_bd, fm, seed):
        ct, bd = ct_bd
        rng = np.random.default_rng(seed)
        shape = (h, w) if ct == 0 else (h, w, {2: 3, 6: 4}[ct])
        arr = rng.integers(0, 1 << bd, size=shape)
        dec = decode_png(encode_png(arr, ct, bd, filter_mode=fm))
        got = dec["pixels"][:, :, 0] if ct == 0 else dec["pixels"]
        assert np.array_equal(got, arr)

    check()


def test_decode_never_raises_on_adversarial_bytes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    prefix = b"\x89PNG\r\n\x1a\n"

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=120))
    def check(tail):
        # must return a dict or None, never raise
        for payload in (tail, prefix + tail):
            out = decode_png(payload)
            assert out is None or isinstance(out, dict)

    check()


# ---------------------------------------------------------------------------
# APNG (round 7): full-frame animation codec + real frame sampling
# ---------------------------------------------------------------------------

def test_apng_round_trip_formats():
    from riskloc_spark.operators.png import decode_apng_frames, encode_apng

    rng = np.random.default_rng(3)
    for ct, bd, shape, pal_n in [
        (0, 8, (4, 5), None), (2, 8, (3, 4, 3), None),
        (3, 8, (3, 3), 8), (0, 16, (2, 3), None), (6, 8, (2, 2, 4), None),
    ]:
        hi = pal_n if pal_n else (1 << bd)
        frames = [rng.integers(0, hi, size=shape) for _ in range(3)]
        pal = (
            rng.integers(0, 256, size=(pal_n, 3)).astype(np.uint8)
            if pal_n
            else None
        )
        data = encode_apng(frames, ct, bd, palette=pal, delay=(2, 7))
        anim = decode_apng_frames(data)
        assert anim is not None and len(anim["frames"]) == 3, (ct, bd)
        assert anim["color_type"] == ct and anim["bit_depth"] == bd
        if pal_n:
            assert np.array_equal(anim["palette"], pal)
        for f, o in zip(frames, anim["frames"]):
            got = o["pixels"][:, :, 0] if np.ndim(f) == 2 else o["pixels"]
            assert np.array_equal(got, f), (ct, bd)
            assert (o["delay_num"], o["delay_den"]) == (2, 7)


def test_apng_rejections():
    from riskloc_spark.operators.png import decode_apng_frames, encode_apng

    # plain PNG (no acTL) is not an animation
    arr = np.arange(12).reshape(3, 4)
    assert decode_apng_frames(encode_png(arr, 0, 8)) is None
    assert decode_apng_frames(b"junk") is None
    # sub-region frame -> out of scope, None (never a wrong composite)
    good = encode_apng([arr, arr], 0, 8)
    idx = good.find(b"fcTL")
    bad = bytearray(good)
    # fcTL payload: seq(4) w(4) h(4) x(4) y(4)... shrink frame width
    struct.pack_into(">I", bad, idx + 4 + 4, 2)
    assert decode_apng_frames(bytes(bad)) is None


def test_apng_header_metadata_consistency():
    """parse_image_header's APNG n_frames/duration must agree with the
    actual frame list the pixel codec extracts."""
    from riskloc_spark.operators.multimodal import parse_image_header
    from riskloc_spark.operators.png import decode_apng_frames, encode_apng

    frames = [np.full((2, 2), k, dtype=np.int64) for k in range(4)]
    data = encode_apng(frames, 0, 8, delay=(3, 10))
    meta = parse_image_header(data)
    out = decode_apng_frames(data)["frames"]
    assert meta["n_frames"] == len(out) == 4
    assert meta["duration_ms"] == 300 * 4


def test_synth_apng_matches_formula():
    from riskloc_spark.operators.multimodal import _synth_apng
    from riskloc_spark.operators.png import decode_apng_frames

    for d in range(20):
        out = decode_apng_frames(_synth_apng(d))["frames"]
        nf, w, h = 2 + d % 3, 3 + d % 4, 2 + d % 3
        assert len(out) == nf
        for k, fr in enumerate(out):
            p = np.arange(w * h, dtype=np.int64)
            expect = ((d * 19 + k * 257 + p * 7) % 256).reshape(h, w)
            assert np.array_equal(fr["pixels"][:, :, 0], expect), (d, k)
            assert (fr["delay_num"], fr["delay_den"]) == (1 + d % 4, 10)


def test_sample_frames_real_apng_path(spark):
    """End-to-end Spark path: APNG payloads yield REAL standalone-PNG
    frames at the sampled indices."""
    from riskloc_spark.operators.multimodal import _synth_apng, sample_frames

    rows = [(int(i), bytearray(_synth_apng(i))) for i in range(12)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames(df, every_n=2).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for d in range(12):
        nf, w, h = 2 + d % 3, 3 + d % 4, 2 + d % 3
        kept = sorted(r["frame_idx"] for r in by_media[d])
        assert kept == list(range(0, nf, 2)), d
        for r in by_media[d]:
            dec = decode_png(bytes(r["frame"]))
            assert dec is not None
            p = np.arange(w * h, dtype=np.int64)
            expect = ((d * 19 + r["frame_idx"] * 257 + p * 7) % 256).reshape(h, w)
            assert np.array_equal(dec["pixels"][:, :, 0], expect)


def test_apng_fctl_after_idat_duration():
    """Legal APNG chunk order acTL, IDAT, fcTL, fdAT (default image
    excluded from the animation): the header parser must still find the
    fcTL delays instead of reporting duration 0 (round-7 review
    finding); round 8: duration is the SUM of the fcTLs present (the
    hand-built payload carries one fcTL, so 200 ms — a frame whose fcTL
    is absent contributes 0, never a fabricated copy)."""
    from riskloc_spark.operators.multimodal import parse_image_header

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    actl = struct.pack(">II", 2, 0)
    raw = bytes([0, 1, 2])  # one row, filter 0
    fctl = struct.pack(">IIIIIHHBB", 1, 2, 1, 0, 0, 1, 5, 0, 0)  # 200 ms
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", actl)
        + _chunk(b"IDAT", _stored_idat(raw))      # default image, no fcTL
        + _chunk(b"fcTL", fctl)                   # first animation frame
        + _chunk(b"fdAT", struct.pack(">I", 2) + _stored_idat(raw))
        + _chunk(b"IEND", b"")
    )
    meta = parse_image_header(png)
    assert meta["n_frames"] == 2
    assert meta["duration_ms"] == 200


def test_decode_rejects_dimension_bombs():
    """A small payload declaring enormous dimensions must be rejected
    before any allocation (decompression-bomb guard), and a stream
    producing more bytes than the header admits must not decode."""
    from riskloc_spark.operators.png import MAX_SAMPLES, decode_png

    # 100000 x 100000 gray8 header: > MAX_SAMPLES, rejected at header
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(bomb) is None
    assert 100_000 * 100_000 > MAX_SAMPLES
    # stream longer than the declared dims admit -> None (not a crash)
    over = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes([0, 1, 2]) * 50))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(over) is None


# ---------------------------------------------------------------------------
# Adam7 interlace (round 7): full decode support + encoder for round trips
# ---------------------------------------------------------------------------

ADAM7_CASES = [
    (0, 8, (5, 7)), (2, 8, (4, 6, 3)), (6, 8, (3, 5, 4)), (4, 8, (6, 4, 2)),
    (0, 16, (9, 11)), (0, 1, (7, 11)), (0, 4, (4, 5)), (3, 8, (6, 5)),
    (0, 8, (1, 1)), (0, 8, (2, 3)), (0, 8, (8, 8)), (0, 8, (16, 17)),
]


@pytest.mark.parametrize("color_type,bit_depth,shape", ADAM7_CASES)
@pytest.mark.parametrize("filter_mode", [0, "cycle"])
def test_adam7_round_trip(color_type, bit_depth, shape, filter_mode):
    hi = 1 << bit_depth
    arr = RNG.integers(0, min(hi, 16) if color_type == 3 else hi, size=shape)
    pal = (
        RNG.integers(0, 256, size=(16, 3)).astype(np.uint8)
        if color_type == 3
        else None
    )
    data = encode_png(
        arr, color_type, bit_depth, palette=pal, filter_mode=filter_mode,
        interlace=True,
    )
    dec = decode_png(data)
    assert dec is not None
    got = dec["pixels"][:, :, 0] if arr.ndim == 2 else dec["pixels"]
    assert np.array_equal(got, arr)


def test_adam7_hand_built_spec_layout():
    """The 7-pass pixel placement pinned against the spec: a 4x4 image
    hand-assembled pass by pass (stored-deflate, filter 0) must decode
    to the row-major original — independent of our encoder."""
    v = np.arange(16).reshape(4, 4)
    raw = bytes(
        [0, v[0, 0]]                                       # pass 1
        + [0, v[0, 2]]                                     # pass 4
        + [0, v[2, 0], v[2, 2]]                            # pass 5
        + [0, v[0, 1], v[0, 3], 0, v[2, 1], v[2, 3]]       # pass 6
        + [0, *v[1]] + [0, *v[3]]                          # pass 7
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", _stored_idat(raw))
        + _chunk(b"IEND", b"")
    )
    dec = decode_png(png)
    assert dec is not None
    assert np.array_equal(dec["pixels"][:, :, 0], v)


def test_synth_png_odd_ids_are_interlaced():
    from riskloc_spark.operators.multimodal import _synth_png

    # interlace byte sits at offset 28 of the IHDR chunk
    assert _synth_png(2)[28] == 0
    assert _synth_png(3)[28] == 1
    # and values still match the formula contract either way
    from riskloc_spark.operators.png import decoded_samples

    for d in (3, 7, 11):
        dec = decode_png(_synth_png(d))
        assert dec is not None
        flat = decoded_samples(dec).reshape(-1)
        assert flat.size > 0
