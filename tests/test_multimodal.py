"""Multimodal plumbing: schemas, mapInPandas batch shape, determinism.
Header parsing and PNG/APNG/GIF/JPEG pixel decode are REAL and
dependency-free (operators/png.py, gif.py, jpeg.py); unknown-magic
payloads (e.g. text-as-binary) take the deterministic stub path."""
import pytest
from pyspark.sql import functions as F

from riskloc_spark.data import load_table
from riskloc_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    media_features,
    resize_media,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SF_DIR, "documents"))


def test_decode_media_schema_and_determinism(spark, media):
    out = decode_media(media)
    assert out.schema["meta"].dataType.fieldNames() == [
        "width", "height", "n_channels", "duration_ms", "n_frames",
    ]
    n = media.count()
    assert out.count() == n  # decode is 1:1

    a = out.select("media_id", "meta.width", "meta.n_frames").toPandas()
    b = decode_media(media).select("media_id", "meta.width", "meta.n_frames").toPandas()
    assert a.sort_values("media_id").equals(b.sort_values("media_id"))


def test_media_features_dim_and_norm(spark, media):
    out = media_features(media, dim=16)
    rows = out.limit(5).collect()
    for r in rows:
        assert len(r["feature"]) == 16
        norm = sum(x * x for x in r["feature"]) ** 0.5
        assert abs(norm - 1.0) < 1e-3


def test_resize_media_contract(spark, media):
    out = resize_media(media.limit(20), width=64, height=64)
    pdf = out.toPandas()
    assert (pdf["meta"].apply(lambda m: m["width"]) == 64).all()
    target = 64 * 64 // 64
    assert pdf["payload"].apply(len).eq(target).all()


def test_sample_frames_explodes_inside_worker(spark, media):
    sub = media.limit(10)
    out = sample_frames(sub, every_n=10)
    pdf = out.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame"}
    assert len(pdf) >= 10  # at least frame 0 per media
    assert (pdf["frame_idx"] % 10 == 0).all()
    # no extra shuffle: mapInPandas keeps input partitioning
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan.split("MapInPandas")[0]


def test_decode_kernel_uses_real_pil_when_available(monkeypatch):
    """Guard-polarity lock: when Pillow IS importable, _decode_kernel
    must decode for real (true dimensions from Image.open) — the old
    guard raised NotImplementedError, turning the dependency appearing
    into an outage. Unidentifiable payloads still fall back to the
    deterministic stub. PIL is absent in this container, so the module
    surface is monkeypatched."""
    from riskloc_spark.operators import multimodal as mm

    class FakeImage:
        width, height = 640, 480
        n_frames = 2
        # variable per-frame delays: duration_ms must SUM them (40+60),
        # not multiply frame 0's by n_frames (would be 80)
        _durations = {0: 40, 1: 60}
        info = {"duration": 40}

        def seek(self, k):
            self.info = {"duration": self._durations[k]}

        def getbands(self):
            return ("R", "G", "B")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImageModule:
        @staticmethod
        def open(fp):
            head = fp.read(4)
            if head == b"TRNC":  # a real image that fails mid-decode
                raise OSError("broken data stream")
            if head != b"\x89PNG":
                raise mm.UnidentifiedImageError("cannot identify image file")
            return FakeImage()

    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    monkeypatch.setattr(mm, "Image", FakeImageModule, raising=False)

    meta = mm._decode_kernel(b"\x89PNG" + b"\x00" * 16)
    assert meta == {
        "width": 640, "height": 480, "n_channels": 3,
        "duration_ms": 100, "n_frames": 2,
    }
    # corrupt/truncated IMAGE: nulls, never fabricated dimensions
    assert mm._decode_kernel(b"TRNC" + b"\x00" * 16) == {
        "width": None, "height": None, "n_channels": None,
        "duration_ms": None, "n_frames": None,
    }
    # non-image payload: deterministic stub, not an exception
    stub = mm._decode_kernel(b"plain text payload")
    monkeypatch.setattr(mm, "_HAVE_PIL", False)
    assert stub == mm._decode_kernel(b"plain text payload")


# ---------------------------------------------------------------------------
# Dependency-free real header decode (round 6): hand-built payloads with
# known dimensions; parse_image_header must return exact metadata.

import binascii
import struct
import zlib


def _png_chunk(typ, payload):
    return (
        struct.pack(">I", len(payload)) + typ + payload
        + struct.pack(">I", binascii.crc32(typ + payload))
    )


def _make_png(width=1, height=1, color_type=2, actl_frames=None):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    body = _png_chunk(b"IHDR", ihdr)
    if actl_frames is not None:
        body += _png_chunk(b"acTL", struct.pack(">II", actl_frames, 0))
    row = b"\x00" + b"\x7f" * (3 * width)
    body += _png_chunk(b"IDAT", zlib.compress(row * height))
    body += _png_chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _make_gif(width=3, height=5, n_frames=2, delay_centisec=50):
    out = b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_centisec) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += b"\x02" + b"\x02\x44\x01" + b"\x00"  # LZW min + one sub-block
    return out + b"\x3b"


def _make_jpeg(width=9, height=7, n_channels=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 8 + 3 * n_channels)
        + b"\x08" + struct.pack(">HH", height, width)
        + bytes([n_channels]) + b"\x01\x11\x00" * n_channels
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_header_png():
    from riskloc_spark.operators.multimodal import parse_image_header

    meta = parse_image_header(_make_png(width=17, height=23, color_type=2))
    assert meta == {
        "width": 17, "height": 23, "n_channels": 3,
        "duration_ms": 0, "n_frames": 1,
    }
    # color types map to Pillow band counts
    assert parse_image_header(_make_png(color_type=0))["n_channels"] == 1
    assert parse_image_header(_make_png(color_type=6))["n_channels"] == 4
    # APNG: acTL chunk carries the frame count
    assert parse_image_header(_make_png(actl_frames=5))["n_frames"] == 5


def test_parse_image_header_gif():
    from riskloc_spark.operators.multimodal import parse_image_header

    meta = parse_image_header(_make_gif(width=3, height=5, n_frames=2))
    assert meta == {
        "width": 3, "height": 5, "n_channels": 1,
        "duration_ms": 1000,  # sum of per-frame GCE delays: 2 x 500 ms
        "n_frames": 2,
    }
    assert parse_image_header(_make_gif(n_frames=4))["n_frames"] == 4


def test_parse_image_header_jpeg():
    from riskloc_spark.operators.multimodal import parse_image_header

    meta = parse_image_header(_make_jpeg(width=9, height=7, n_channels=3))
    assert meta == {
        "width": 9, "height": 7, "n_channels": 3,
        "duration_ms": 0, "n_frames": 1,
    }
    assert parse_image_header(_make_jpeg(n_channels=1))["n_channels"] == 1


def test_parse_image_header_corrupt_and_unknown():
    from riskloc_spark.operators.multimodal import parse_image_header

    # known magic + truncated header: NULL meta, never fabricated dims
    null_meta = {
        "width": None, "height": None, "n_channels": None,
        "duration_ms": None, "n_frames": None,
    }
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") == null_meta
    assert parse_image_header(b"GIF89a\x03\x00") == null_meta
    assert parse_image_header(b"\xff\xd8\xff\xc0\x00\x02") == null_meta
    # unknown magic: None (caller falls back to the stub)
    assert parse_image_header(b"plain text payload") is None


def test_decode_kernel_real_headers_without_pil():
    """Without Pillow, PNG/GIF/JPEG payloads get REAL dimensions from the
    header parser — not stub metadata."""
    from riskloc_spark.operators import multimodal as mm

    assert not mm._HAVE_PIL  # this container
    meta = mm._decode_kernel(_make_png(width=640, height=480))
    assert (meta["width"], meta["height"]) == (640, 480)
    meta = mm._decode_kernel(_make_gif(width=12, height=34, n_frames=3))
    assert (meta["width"], meta["height"], meta["n_frames"]) == (12, 34, 3)
    meta = mm._decode_kernel(_make_jpeg(width=800, height=600))
    assert (meta["width"], meta["height"]) == (800, 600)


def test_decode_media_real_images_end_to_end(spark):
    """Mixed corpus through the distributed decode: real images yield
    true dimensions, non-image payloads keep the deterministic stub."""
    rows = [
        (1, _make_png(width=32, height=16)),
        (2, _make_gif(width=8, height=4, n_frames=2)),
        (3, _make_jpeg(width=20, height=10)),
        (4, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r["meta"] for r in decode_media(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (32, 16)
    assert (out[2]["width"], out[2]["height"], out[2]["n_frames"]) == (8, 4, 2)
    assert (out[3]["width"], out[3]["height"]) == (20, 10)
    assert out[4]["width"] is not None  # stub still fills plausible meta


def test_parse_gif_variable_delay_sums_per_frame():
    """duration_ms sums EVERY frame's GCE delay (variable-delay
    animations report their true total) — frame-0-times-n was wrong for
    them (round-8 ADVICE fix; same change in the APNG fcTL walk)."""
    from riskloc_spark.operators.multimodal import parse_image_header

    out = b"GIF89a" + struct.pack("<HH", 2, 2) + b"\x00\x00\x00"
    for delay in (0, 7):  # frame 0 delay 0, frame 1 delay 7cs
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        out += b"\x02" + b"\x01\x44" + b"\x00"
    out += b"\x3b"
    meta = parse_image_header(out)
    assert meta["n_frames"] == 2
    assert meta["duration_ms"] == 70  # 0 + 7 centiseconds


def test_parse_image_header_never_raises_on_arbitrary_bytes():
    """The header parser ingests arbitrary corpus payloads — it must
    classify or reject, never throw (fuzzed, plus adversarial prefixes
    that start like each format and go wrong)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from riskloc_spark.operators.multimodal import parse_image_header

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def run(payload):
        for prefix in (b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8"):
            out = parse_image_header(prefix + payload)
            assert out is None or isinstance(out, dict)

    run()


def test_decode_byte_budget_falls_back_to_stub(spark, monkeypatch):
    """GIF/JPEG payloads over MAX_DECODE_BYTES take the stub-feature
    path (their entropy decoders are per-symbol Python — a huge payload
    would stall an executor task); under budget they decode for real.
    The kernels capture the budget AT CALL TIME so the closure ships it
    to executors — which is also what lets this test shrink it instead
    of building a multi-megabyte payload."""
    import numpy as np

    from riskloc_spark.operators import multimodal as mm
    from riskloc_spark.operators.gif import decode_gif_frames, encode_gif

    idx = np.arange(64).reshape(8, 8) % 8
    pal = (np.arange(24).reshape(8, 3) * 10 % 256).astype(np.uint8)
    payload = encode_gif([idx], pal)
    assert decode_gif_frames(payload) is not None  # sanity: decodable

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    real = mm.media_features(df, dim=8).collect()[0]["feature"]
    monkeypatch.setattr(mm, "MAX_DECODE_BYTES", len(payload) - 1)
    stub = mm.media_features(df, dim=8).collect()[0]["feature"]
    # over budget: the content-hash stub vector (unit norm), not pixels
    assert real != stub
    assert abs(sum(x * x for x in stub) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# perceptual hashing + image near-dup (round 11)
# ---------------------------------------------------------------------------

def test_dhash_kernel_invariances():
    """dhash is stable under the edits that define a near-duplicate:
    tiny pixel noise and nearest-resampling; unrelated content is far."""
    import numpy as np

    from riskloc_spark.operators.multimodal import _dhash_kernel
    from riskloc_spark.operators.png import resize_nearest

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (24, 32, 3))
    h = _dhash_kernel(base)
    noisy = np.clip(base + rng.integers(-2, 3, base.shape), 0, 255)
    assert ham(h, _dhash_kernel(noisy)) <= 6
    up = resize_nearest(base, 64, 48)
    assert ham(h, _dhash_kernel(up)) == 0
    other = rng.integers(0, 256, (24, 32, 3))
    assert ham(h, _dhash_kernel(other)) > 12
    # grayscale input uses channel 0; signed 64-bit wrap is in range
    g = rng.integers(0, 256, (10, 10, 1))
    v = _dhash_kernel(g)
    assert -(1 << 63) <= v < (1 << 63)


def test_media_dhash_and_image_near_dup(spark):
    """Planted near-duplicate PNGs are found by banded matching with
    zero false pairs among unrelated images."""
    import numpy as np

    from riskloc_spark.operators.multimodal import (
        image_near_dup,
        media_dhash,
    )
    from riskloc_spark.operators.png import encode_png

    rng = np.random.default_rng(7)
    imgs = {}
    for i in range(6):
        imgs[i] = rng.integers(0, 256, (16, 16, 3))
    # 10/11: near-dups of 0 (tiny noise); 12: exact re-encode of 1
    imgs[10] = np.clip(imgs[0] + rng.integers(-1, 2, (16, 16, 3)), 0, 255)
    imgs[11] = np.clip(imgs[0] + rng.integers(-1, 2, (16, 16, 3)), 0, 255)
    imgs[12] = imgs[1].copy()
    rows = [
        (mid, bytearray(encode_png(px.astype(np.int64), 2, 8)))
        for mid, px in imgs.items()
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = media_dhash(df)
    assert hashes.count() == len(imgs)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup(df, max_hamming=6).collect()}
    assert (0, 10) in pairs and (0, 11) in pairs and (1, 12) in pairs
    assert pairs[(1, 12)] == 0
    # no pair between distinct random images
    base_ids = set(range(6))
    assert not any(a in base_ids and b in base_ids and not
                   ((a, b) == (1, 12)) for (a, b) in pairs
                   if a != 0 and b not in (10, 11, 12))


def test_image_near_dup_prebuilt_hashes_and_validation(spark):
    import numpy as np
    import pytest

    from riskloc_spark.operators.multimodal import (
        image_near_dup,
        media_dhash,
    )
    from riskloc_spark.operators.png import encode_png

    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (12, 12, 3))
    rows = [(0, bytearray(encode_png(a.astype(np.int64), 2, 8))),
            (1, bytearray(encode_png(a.astype(np.int64), 2, 8)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    h = media_dhash(df).persist()
    got = image_near_dup(df, max_hamming=0, hashes=h).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(0, 1, 0)]
    h.unpersist()
    with pytest.raises(ValueError):
        image_near_dup(df, max_hamming=-1)


def test_image_dedup_end_to_end(spark):
    """Transitive near-dups collapse to one representative; distinct
    images and undecodable payloads survive."""
    import numpy as np

    from riskloc_spark.operators.multimodal import image_dedup
    from riskloc_spark.operators.png import encode_png

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (16, 16, 3))
    other = rng.integers(0, 256, (16, 16, 3))
    # 0 ~ 1 ~ 2 (chain), 3 distinct, 4 undecodable bytes
    rows = [
        (0, bytearray(encode_png(base.astype(np.int64), 2, 8))),
        (1, bytearray(encode_png(
            np.clip(base + rng.integers(-1, 2, base.shape), 0, 255)
            .astype(np.int64), 2, 8))),
        (2, bytearray(encode_png(
            np.clip(base + rng.integers(-1, 2, base.shape), 0, 255)
            .astype(np.int64), 2, 8))),
        (3, bytearray(encode_png(other.astype(np.int64), 2, 8))),
        (4, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(r["media_id"]
                  for r in image_dedup(df, max_hamming=6).collect())
    assert kept == [0, 3, 4]


def test_incremental_image_dedup(spark):
    """A batch probes the persisted base index: near-dups of base
    images match, fresh images don't, and the base is never
    re-decoded (the index frame alone joins)."""
    import numpy as np

    from riskloc_spark.operators.multimodal import (
        build_image_index,
        incremental_image_dedup,
    )
    from riskloc_spark.operators.png import encode_png

    rng = np.random.default_rng(13)
    base_imgs = {i: rng.integers(0, 256, (16, 16, 3)) for i in range(5)}
    base = spark.createDataFrame(
        [(i, bytearray(encode_png(px.astype(np.int64), 2, 8)))
         for i, px in base_imgs.items()],
        "media_id long, payload binary",
    )
    index = build_image_index(base, max_hamming=6).persist()
    index.count()

    batch = spark.createDataFrame(
        [(100, bytearray(encode_png(
            np.clip(base_imgs[2] + rng.integers(-1, 2, (16, 16, 3)),
                    0, 255).astype(np.int64), 2, 8))),
         (101, bytearray(encode_png(
             rng.integers(0, 256, (16, 16, 3)).astype(np.int64), 2, 8)))],
        "media_id long, payload binary",
    )
    got = {(r["new_id"], r["base_id"]): r["hamming"] for r in
           incremental_image_dedup(batch, index, max_hamming=6).collect()}
    assert (100, 2) in got
    assert not any(n == 101 for n, _ in got)
    index.unpersist()
