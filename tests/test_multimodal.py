"""Multimodal plumbing: schemas, mapInPandas batch shape, determinism.
Decode kernels are stubbed (no image libs in container); the Spark-side
contracts are what's under test."""
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
        info = {"duration": 40}

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
        "duration_ms": 80, "n_frames": 2,
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
