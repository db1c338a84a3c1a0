"""Multimodal columns: binary media payloads + typed metadata, with
decode / feature-extract / resize / frame-sample plumbing.

No reference counterpart (the reference is tabular-only) — this is the
LLM-data-pipeline surface: media travel as opaque ``binary`` columns
with a typed metadata struct, and every kernel runs as an Arrow-batched
``mapInPandas`` over partitions, so the Spark side (schema, batching,
partition parallelism, no driver collects) is real and tested.

DECODE KERNELS ARE STUBBED: the container has no image/audio libs, so
``_decode_kernel``/``_resize_kernel``/``_frame_kernel`` fall back to a
clearly-marked deterministic fake (content-hash derived) when Pillow is
absent. The fake preserves every contract the pipeline relies on
(determinism, schema, per-row independence), so swapping in a real
decoder changes no Spark-side code.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image, UnidentifiedImageError  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

    class UnidentifiedImageError(Exception):
        """Placeholder for PIL.UnidentifiedImageError when PIL is absent."""


MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def _content_hash(data: bytes) -> np.random.Generator:
    """Deterministic per-payload RNG — the stub decoder's entropy source."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    return np.random.default_rng(seed)


def _decode_kernel(data: bytes) -> dict:
    """Decode media metadata for one payload.

    With Pillow available, a REAL decode: open the payload and read true
    width / height / channel count / frame count. Payloads Pillow cannot
    identify (non-image bytes — e.g. the text-as-binary test adapter)
    fall back to the deterministic stub, so the pipeline keeps working
    on mixed corpora and the dependency appearing is an upgrade, not an
    outage. Without Pillow (this container), always the stub:
    content-hash-derived plausible metadata, so tests can assert
    determinism end-to-end."""
    if _HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(data)) as im:
                n_frames = int(getattr(im, "n_frames", 1))
                n_channels = len(im.getbands())
                duration = int(im.info.get("duration", 0) or 0)
                return {
                    "width": int(im.width),
                    "height": int(im.height),
                    "n_channels": n_channels,
                    "duration_ms": duration * n_frames,
                    "n_frames": n_frames,
                }
        except UnidentifiedImageError:
            pass  # not an image payload -> deterministic stub below
        except Exception:
            # a REAL image that failed to decode (truncated/corrupt/
            # bomb-guard): surface nulls, never fabricate dimensions
            return {
                "width": None,
                "height": None,
                "n_channels": None,
                "duration_ms": None,
                "n_frames": None,
            }
    rng = _content_hash(data)
    w = int(rng.integers(64, 1920))
    h = int(rng.integers(64, 1080))
    frames = int(rng.integers(1, 120))
    return {
        "width": w,
        "height": h,
        "n_channels": 3,
        "duration_ms": frames * 40,
        "n_frames": frames,
    }


def decode_media(
    df: DataFrame, bytes_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Attach the typed metadata struct by decoding each payload.

    mapInPandas: one Python worker per partition, Arrow batches in/out;
    only (id, payload) is shipped — project before calling if the frame
    is wide."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("meta", MEDIA_META),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_kernel(b) for b in pdf[bytes_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "meta": metas})

    decoded = df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)
    return df.join(decoded, on=id_col, how="inner")


def media_features(
    df: DataFrame,
    dim: int = 32,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Fixed-dim feature vector per payload (STUB kernel: content-hash
    seeded unit vector; a real one embeds pixels). Output:
    (id, feature array<float>)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                v = _content_hash(b).standard_normal(dim)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                feats.append(v.tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize kernel plumbing (STUB: truncated/padded payload standing in
    for re-encoded pixels). Output: (id, payload, meta) at target size."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bytes_col, T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )
    target_len = width * height // 64  # deterministic stand-in size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for b in pdf[bytes_col]:
                b = bytes(b)
                resized = (b * (target_len // max(len(b), 1) + 1))[:target_len]
                payloads.append(resized)
                metas.append(
                    {
                        "width": width,
                        "height": height,
                        "n_channels": 3,
                        "duration_ms": 0,
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], bytes_col: payloads, "meta": metas}
            )

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling: one output row per kept frame (STUB frames: fixed
    byte slices of the payload). The row explosion happens inside the
    worker — output partitioning follows input partitioning, no extra
    shuffle."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(b)
                n_frames = _decode_kernel(b)["n_frames"]
                size = max(len(b) // max(n_frames, 1), 1)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * size: (i + 1) * size])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for the testdata documents table: text payload as binary —
    lets every media kernel be exercised on real distributed data.

    Fans out a small single-split scan first: a 1-partition input would
    serialize every Arrow-batched Python kernel on one core."""
    from riskloc_spark.operators.dedup import spread_small_scan

    return spread_small_scan(
        df.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("payload"),
        )
    )
