"""Multimodal columns: binary media payloads + typed metadata, with
decode / feature-extract / resize / frame-sample plumbing.

No reference counterpart (the reference is tabular-only) — this is the
LLM-data-pipeline surface: media travel as opaque ``binary`` columns
with a typed metadata struct, and every kernel runs as an Arrow-batched
``mapInPandas`` over partitions, so the Spark side (schema, batching,
partition parallelism, no driver collects) is real and tested.

DECODE: real header parsing for the three dominant image formats —
PNG (IHDR + APNG acTL/fcTL), GIF87a/89a (logical screen descriptor +
image block walk), JPEG (SOFn scan) — implemented with ``struct`` only,
no dependency (``parse_image_header``). The PIXEL path is real for all
four formats too, with zero dependencies (stdlib ``zlib`` +
pure-Python LZW/Huffman + numpy): ``operators/png.py`` decodes every
PNG (all five scanline filters, bit depths 1-16, all five color types,
none + Adam7 interlace) and extracts APNG full-canvas frames;
``operators/gif.py`` decodes GIF's complete LZW index stream
(interlace, local/global palettes); ``operators/jpeg.py`` decodes
baseline sequential JPEG (in-file Huffman tables, DC prediction,
restart markers, dequant + IDCT; progressive/arithmetic/12-bit return
None). So ``media_features``, ``resize_media`` and ``sample_frames``
operate on true pixels for PNG/APNG/GIF/JPEG payloads. Pillow, when
present, remains the preferred metadata branch. Payloads that match no
known magic fall back to a clearly-marked deterministic fake
(content-hash derived) so mixed corpora keep flowing; payloads whose
magic matches but whose header is truncated/corrupt surface NULL
metadata — dimensions are never fabricated for real images.

Throughput caveat (honest 100-TB envelope): the entropy stages (GIF
LZW, JPEG Huffman, PNG Paeth/Average rows) are per-symbol Python —
they parallelize per-partition with no driver involvement, but a
production multimodal corpus wants a native codec behind the same
mapInPandas plumbing. ``MAX_DECODE_BYTES`` bounds how large a payload
the pure-Python decoders will attempt (bigger payloads take the same
fallback as unknown formats), so one multi-megapixel image cannot
stall an executor task for minutes.
"""
from __future__ import annotations

import hashlib
import struct
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


_NULL_META = {
    "width": None,
    "height": None,
    "n_channels": None,
    "duration_ms": None,
    "n_frames": None,
}

# PNG color type -> band count (matches Pillow's len(im.getbands()):
# gray, RGB, palette ('P' = 1 band), gray+alpha, RGBA).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# JPEG SOFn markers carrying frame dimensions (C4=DHT, C8=JPG ext,
# CC=DAC are in the C0-CF range but are NOT frame headers).
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}

# Pixel-decode payload budget for the ENTROPY-coded formats (GIF LZW,
# JPEG Huffman) whose decoders are per-symbol pure Python: a real
# multi-megapixel payload would hold an executor task for minutes, so
# payloads above this take the same fallback path as unknown formats
# (stub feature / stub resize) instead of decoding. PNG is exempt — its
# hot path is stdlib-zlib + numpy and is separately bomb-guarded by
# png.MAX_SAMPLES. Raise this when a native codec backs the kernels.
MAX_DECODE_BYTES = 4 * 1024 * 1024


def _parse_png(data: bytes) -> dict | None:
    """PNG: 8-byte magic, then chunks of (len u32 BE, type, payload,
    crc). IHDR is first: width/height u32 BE, bit depth, color type.
    APNG stores the frame count in an acTL chunk before IDAT and the
    per-frame delay in each fcTL chunk (delay_num u16 / delay_den u16
    at payload offsets 20/22; den 0 means 1/100 s per spec).
    duration_ms SUMS the per-fcTL delays over the whole chunk walk, so
    variable-delay APNGs report their true total duration; frames whose
    fcTL is missing/truncated contribute 0 (never fabricated)."""
    if len(data) < 33:  # magic + IHDR chunk is 33 bytes minimum
        return None
    if data[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", data[16:24])
    color_type = data[25]
    n_channels = _PNG_CHANNELS.get(color_type)
    if width == 0 or height == 0 or n_channels is None:
        return None
    n_frames, delay_ms, pos = 1, 0, 8
    seen_actl = False
    while pos + 8 <= len(data):  # chunk walk, bounded by the payload
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        ctype = data[pos + 4: pos + 8]
        if ctype == b"acTL" and pos + 12 <= len(data):
            (n_frames,) = struct.unpack(">I", data[pos + 8: pos + 12])
            n_frames = max(int(n_frames), 1)
            seen_actl = True
        elif ctype == b"fcTL" and seen_actl and length >= 24:
            start = pos + 8
            if start + 24 <= len(data):
                num, den = struct.unpack(
                    ">HH", data[start + 20: start + 24]
                )
                den = den or 100  # spec: denominator 0 -> 1/100 s
                # sum EVERY frame's delay (variable-delay APNGs exist;
                # frame-0-times-n was wrong for them)
                delay_ms += (num * 1000) // den
        elif ctype == b"IDAT" and seen_actl:
            # legal APNG order acTL, IDAT, fcTL, ... (default image
            # excluded from the animation): fcTL chunks come after
            # IDAT — keep walking (chunk skip is cheap) or the delays
            # would silently read as 0 in that layout
            pass
        elif ctype == b"IDAT":
            # non-animated PNG: nothing after IDAT matters for metadata
            break
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + payload + crc
    return {
        "width": int(width),
        "height": int(height),
        "n_channels": n_channels,
        "duration_ms": delay_ms,
        "n_frames": n_frames,
    }


def _parse_gif(data: bytes) -> dict | None:
    """GIF: 6-byte magic, logical screen descriptor (width/height u16
    LE), optional global color table, then a block stream — 0x21
    extensions (sub-blocks until a 0 terminator), 0x2C image
    descriptors (one per frame), 0x3B trailer. duration_ms sums EVERY
    Graphic Control Extension's delay (1/100 s units), so
    variable-delay animations report their true total duration; frames
    without a GCE contribute 0."""
    if len(data) < 13:
        return None
    width, height = struct.unpack("<HH", data[6:10])
    if width == 0 or height == 0:
        return None
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (flags & 0x07))
    n_frames, delay_ms = 0, 0

    def skip_subblocks(p: int) -> int:
        while p < len(data):
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte, then sub-blocks
            if pos + 2 > len(data):
                return None
            label = data[pos + 1]
            # sum every GCE's delay (even 0) — the per-frame delays of
            # a variable-delay animation must all count
            if (
                label == 0xF9
                and pos + 6 <= len(data)
                and data[pos + 2] == 4
            ):
                (delay,) = struct.unpack("<H", data[pos + 4: pos + 6])
                delay_ms += int(delay) * 10
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor: 9 bytes + local table
            if pos + 10 > len(data):
                return None
            lflags = data[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
            n_frames += 1
        else:  # malformed block stream
            return None
    if n_frames == 0:
        return None
    return {
        "width": int(width),
        "height": int(height),
        "n_channels": 1,  # palette-based, Pillow mode 'P' = 1 band
        "duration_ms": delay_ms,
        "n_frames": n_frames,
    }


def _parse_jpeg(data: bytes) -> dict | None:
    """JPEG: marker walk from SOI to the first SOFn segment, which
    carries precision(1) height(2 BE) width(2 BE) components(1)."""
    pos = 2  # past SOI
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers, no length field
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2: pos + 4])
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if pos + 10 > len(data):
                return None
            height, width = struct.unpack(">HH", data[pos + 5: pos + 9])
            n_channels = data[pos + 9]
            if width == 0 or height == 0 or n_channels == 0:
                return None
            return {
                "width": int(width),
                "height": int(height),
                "n_channels": int(n_channels),
                "duration_ms": 0,
                "n_frames": 1,
            }
        pos += 2 + seg_len
    return None


def parse_image_header(data: bytes) -> dict | None:
    """Dependency-free metadata decode for PNG / GIF / JPEG payloads.

    Returns the MEDIA_META dict for a parseable image, the NULL-meta
    dict (all fields None) when the magic matches a known format but
    the header is truncated or malformed (a real image must never get
    fabricated dimensions), and None when the payload matches no known
    image magic (caller decides the fallback)."""
    data = bytes(data)
    fmt = None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        fmt = _parse_png
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        fmt = _parse_gif
    elif data[:2] == b"\xff\xd8":
        fmt = _parse_jpeg
    if fmt is None:
        return None
    try:
        meta = fmt(data)
    except (struct.error, IndexError):
        meta = None
    return meta if meta is not None else dict(_NULL_META)


def _content_hash(data: bytes) -> np.random.Generator:
    """Deterministic per-payload RNG — the stub decoder's entropy source."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    return np.random.default_rng(seed)


def _decode_kernel(data: bytes) -> dict:
    """Decode media metadata for one payload.

    With Pillow available, a REAL decode: open the payload and read true
    width / height / channel count / frame count. Without Pillow (this
    container), PNG / GIF / JPEG payloads still get a REAL header
    decode via ``parse_image_header`` (struct-only, no dependency).
    Payloads matching no known image magic (non-image bytes — e.g. the
    text-as-binary test adapter) fall back to the deterministic stub,
    so the pipeline keeps working on mixed corpora and a richer decoder
    appearing is an upgrade, not an outage."""
    if _HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(data)) as im:
                n_frames = int(getattr(im, "n_frames", 1))
                n_channels = len(im.getbands())
                duration = int(im.info.get("duration", 0) or 0)
                if n_frames > 1:
                    # sum the true per-frame delays (variable-delay
                    # animations) — mirrors the struct-parser semantics
                    try:
                        total = 0
                        for k in range(n_frames):
                            im.seek(k)
                            total += int(im.info.get("duration", 0) or 0)
                        duration_ms = total
                    except (EOFError, OSError):
                        duration_ms = duration * n_frames
                else:
                    duration_ms = duration
                return {
                    "width": int(im.width),
                    "height": int(im.height),
                    "n_channels": n_channels,
                    "duration_ms": duration_ms,
                    "n_frames": n_frames,
                }
        except UnidentifiedImageError:
            pass  # not an image payload -> header parse / stub below
        except Exception:
            # a REAL image that failed to decode (truncated/corrupt/
            # bomb-guard): surface nulls, never fabricate dimensions
            return dict(_NULL_META)
    parsed = parse_image_header(data)
    if parsed is not None:
        return parsed
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


def _png_feature(samples: "np.ndarray", dim: int) -> "np.ndarray":
    """REAL feature vector from decoded pixels: up to 4 normalized
    channel means, then a (dim-4)-bin gray histogram (pixel fraction).
    Deterministic pure-pixel math — the embedding a no-model pipeline
    can actually compute."""
    h, w, c = samples.shape
    maxv = float(samples.max()) or 1.0
    out = np.zeros(dim, dtype=np.float64)
    for ch in range(min(c, 4, dim)):  # dim may be < channel count
        out[ch] = samples[:, :, ch].mean() / maxv
    n_bins = dim - 4
    if n_bins > 0:
        gray = samples.mean(axis=2) / maxv  # [0, 1]
        hist, _ = np.histogram(gray, bins=n_bins, range=(0.0, 1.0))
        out[4:] = hist / (h * w)
    return out.astype(np.float32)


def media_features(
    df: DataFrame,
    dim: int = 32,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Fixed-dim feature vector per payload. PNG/APNG, GIF and baseline
    JPEG payloads get a REAL pixel-derived feature — channel means +
    gray histogram (``_png_feature``) over the dependency-free codecs
    in operators/png.py, gif.py and jpeg.py (GIF uses frame 0's
    palette-expanded RGB; JPEG the full Huffman+IDCT decode). Payloads
    matching no known magic — and GIF/JPEG payloads over
    ``MAX_DECODE_BYTES`` (their entropy decoders are per-symbol
    Python) — fall back to the content-hash-seeded stub vector.
    Output: (id, feature array<float>)."""
    from riskloc_spark.operators.png import decode_png, decoded_samples

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    from riskloc_spark.operators.gif import decode_gif_frames, expand_gif_palette
    from riskloc_spark.operators.jpeg import decode_jpeg

    # capture at call time: the closure ships the budget to executors
    # (a module-global read inside the worker would see the worker's own
    # import, not the driver's setting)
    budget = MAX_DECODE_BYTES

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                b = bytes(b)
                decoded = decode_png(b)
                if decoded is not None:
                    feats.append(
                        _png_feature(decoded_samples(decoded), dim).tolist()
                    )
                    continue
                if len(b) <= budget:
                    gif = decode_gif_frames(b)
                    if gif is not None:
                        # frame 0's expanded RGB — Pillow's mode-'P'
                        # frame-0 convention for animated inputs
                        feats.append(
                            _png_feature(
                                expand_gif_palette(gif["frames"][0]), dim
                            ).tolist()
                        )
                        continue
                    jpg = decode_jpeg(b)
                    if jpg is not None:
                        feats.append(_png_feature(jpg, dim).tolist())
                        continue
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
    method: str = "nearest",
) -> DataFrame:
    """Resize each payload to (width, height). PNG, baseline-JPEG and
    GIF payloads are REALLY resized — decode via the dependency-free
    codecs, nearest-neighbor or bilinear resample (``method``),
    re-encode in the source format (palette images resample their
    index plane with nearest regardless, the only palette-preserving
    choice; GIF resamples frame 0). Payloads matching no known magic —
    and GIF/JPEG payloads over ``MAX_DECODE_BYTES`` — keep the
    deterministic stub (truncated/padded bytes) so mixed corpora flow.
    Output: (id, payload, meta) at target size."""
    from riskloc_spark.operators.gif import decode_gif_frames, encode_gif
    from riskloc_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from riskloc_spark.operators.png import (
        decode_png,
        encode_png,
        resize_bilinear,
        resize_nearest,
    )

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bytes_col, T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )
    target_len = width * height // 64  # deterministic stand-in size
    budget = MAX_DECODE_BYTES  # call-time capture (see media_features)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for b in pdf[bytes_col]:
                b = bytes(b)
                decoded = decode_png(b)
                if decoded is not None:
                    px = decoded["pixels"]
                    if method == "bilinear" and decoded["color_type"] != 3:
                        rs = np.rint(
                            resize_bilinear(px, width, height)
                        ).astype(np.int64)
                    else:
                        rs = resize_nearest(px, width, height)
                    if rs.shape[2] == 1:
                        rs = rs[:, :, 0]
                    payloads.append(
                        encode_png(
                            rs,
                            decoded["color_type"],
                            decoded["bit_depth"],
                            palette=decoded["palette"],
                            filter_mode=0,
                        )
                    )
                    metas.append(
                        {
                            "width": width,
                            "height": height,
                            "n_channels": _PNG_CHANNELS[decoded["color_type"]],
                            "duration_ms": 0,
                            "n_frames": 1,
                        }
                    )
                    continue
                jpg = decode_jpeg(b) if len(b) <= budget else None
                if jpg is not None:
                    # real resample on true pixels, re-encoded as a
                    # baseline 4:4:4 JPEG
                    if method == "bilinear":
                        rs = np.rint(resize_bilinear(jpg, width, height))
                    else:
                        rs = resize_nearest(jpg, width, height)
                    rs = rs.astype(np.int64)
                    payloads.append(
                        encode_jpeg(rs[:, :, 0] if rs.shape[2] == 1 else rs)
                    )
                    metas.append(
                        {
                            "width": width,
                            "height": height,
                            "n_channels": jpg.shape[2],
                            "duration_ms": 0,
                            "n_frames": 1,
                        }
                    )
                    continue
                gif = (
                    decode_gif_frames(b) if len(b) <= budget else None
                )
                if gif is not None:
                    # nearest on the frame-0 index plane (the only
                    # palette-preserving resample), re-encoded as a
                    # single-frame GIF with the same palette
                    fr = gif["frames"][0]
                    rs = resize_nearest(
                        fr["indices"][:, :, None], width, height
                    )[:, :, 0]
                    payloads.append(encode_gif([rs], fr["palette"]))
                    metas.append(
                        {
                            "width": width,
                            "height": height,
                            "n_channels": 1,
                            "duration_ms": 0,
                            "n_frames": 1,
                        }
                    )
                    continue
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
    """Frame sampling: one output row per kept frame. APNG payloads get
    REAL frames — ``decode_apng_frames`` (operators/png.py) extracts and
    unfilters each full-canvas frame, and every kept frame is re-encoded
    as a standalone PNG (palette/bit depth preserved) — and so do
    full-canvas OPAQUE GIF animations (each kept frame re-encoded as a
    single-frame GIF). Sub-region/transparency-optimized GIFs,
    unknown-magic payloads, and GIF payloads over ``MAX_DECODE_BYTES``
    keep the deterministic stub (fixed byte slices). The row explosion
    happens inside the worker — output partitioning follows input
    partitioning, no extra shuffle."""
    from riskloc_spark.operators.gif import decode_gif_frames, encode_gif
    from riskloc_spark.operators.png import decode_apng_frames, encode_png

    budget = MAX_DECODE_BYTES  # call-time capture (see media_features)

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
                anim = decode_apng_frames(b)
                if anim is not None:
                    for i in range(0, len(anim["frames"]), every_n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(
                            encode_png(
                                anim["frames"][i]["pixels"],
                                anim["color_type"],
                                anim["bit_depth"],
                                palette=anim["palette"],
                                filter_mode=0,
                            )
                        )
                    continue
                gif = (
                    decode_gif_frames(b) if len(b) <= budget else None
                )
                if gif is not None and all(
                    (fr["x"], fr["y"], fr["w"], fr["h"])
                    == (0, 0, gif["width"], gif["height"])
                    and fr["transparent_idx"] is None
                    for fr in gif["frames"]
                ):
                    # full-canvas OPAQUE animation: REAL frames, each
                    # re-encoded as a standalone single-frame GIF.
                    # Sub-region frames AND transparency-optimized ones
                    # (a transparent index means "show the previous
                    # frame's pixel" — a full-canvas frame can still
                    # require compositing) fall through to the stub:
                    # emitting an uncomposited plane as "the frame"
                    # would be silently wrong pixels.
                    for i in range(0, len(gif["frames"]), every_n):
                        fr = gif["frames"][i]
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(encode_gif([fr["indices"]], fr["palette"]))
                    continue
                # None = corrupt real image (null meta): nothing to sample
                n_frames = _decode_kernel(b)["n_frames"] or 0
                size = max(len(b) // max(n_frames, 1), 1)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * size: (i + 1) * size])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)


# --------------------------------------------------------------------------
# Deterministic synthetic PNG corpus + pixel-stat surfaces.
#
# These put the REAL pixel codec under the DuckDB hash gate: payloads are
# synthesized from the row id by a closed-form formula (below), encoded
# with CYCLING row filters (so decode exercises all five unfilter
# branches), shipped through a binary column, decoded, and reduced to
# integer pixel statistics. The oracle replays the FORMULA in SQL —
# any bug in filtering, bit packing, palette expansion, sample order, or
# the resize mapping breaks the hash.
#
# Formula contract (d = media id, s = linear sample index over (y, x,
# channel) row-major, p = pixel index, all % on non-negative ints):
#   case d%5 == 0: gray8    W=4+d%5, H=3+d%4,  v = (d*31  + s*7)    % 256
#   case d%5 == 1: rgb8     W=3+d%4, H=2+d%3,  v = (d*17  + s*11)   % 256
#   case d%5 == 2: palette8 W=4+d%6, H=3+d%5,  idx(p) = (d+p) % 16,
#                  pal[j] = ((j*37+d)%256, (j*59+d)%256, (j*83+d)%256)
#   case d%5 == 3: gray16   W=3+d%3, H=2+d%3,  v = (d*257 + s*4099) % 65536
#   case d%5 == 4: rgba8    W=2+d%3, H=2+d%4,  v = (d*13  + s*5)    % 256
# --------------------------------------------------------------------------


def _synth_png(d: int) -> bytes:
    from riskloc_spark.operators.png import encode_png

    # odd ids encode ADAM7-interlaced: the pixel VALUES (and thus the
    # SQL twin) are unchanged, but decode must undo the 7-pass
    # interleave — putting the interlace path under the existing hash
    il = bool(d % 2)
    case = d % 5
    if case == 0:
        w, h = 4 + d % 5, 3 + d % 4
        v = (d * 31 + np.arange(w * h, dtype=np.int64) * 7) % 256
        return encode_png(v.reshape(h, w), 0, 8, filter_mode="cycle", interlace=il)
    if case == 1:
        w, h = 3 + d % 4, 2 + d % 3
        v = (d * 17 + np.arange(w * h * 3, dtype=np.int64) * 11) % 256
        return encode_png(
            v.reshape(h, w, 3), 2, 8, filter_mode="cycle", interlace=il
        )
    if case == 2:
        w, h = 4 + d % 6, 3 + d % 5
        idx = (d + np.arange(w * h, dtype=np.int64)) % 16
        j = np.arange(16, dtype=np.int64)
        pal = np.stack(
            [(j * 37 + d) % 256, (j * 59 + d) % 256, (j * 83 + d) % 256], axis=1
        ).astype(np.uint8)
        return encode_png(
            idx.reshape(h, w), 3, 8, palette=pal, filter_mode="cycle",
            interlace=il,
        )
    if case == 3:
        w, h = 3 + d % 3, 2 + d % 3
        v = (d * 257 + np.arange(w * h, dtype=np.int64) * 4099) % 65536
        return encode_png(v.reshape(h, w), 0, 16, filter_mode="cycle", interlace=il)
    w, h = 2 + d % 3, 2 + d % 4
    v = (d * 13 + np.arange(w * h * 4, dtype=np.int64) * 5) % 256
    return encode_png(v.reshape(h, w, 4), 6, 8, filter_mode="cycle", interlace=il)


def synthesize_png_corpus(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, payload): deterministic PNGs per the formula contract
    above, built inside an Arrow-batched mapInPandas (no driver loop)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [_synth_png(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def _synth_apng(d: int) -> bytes:
    """Deterministic APNG per the formula contract documented on
    ``synthesize_apng_corpus``."""
    from riskloc_spark.operators.png import encode_apng

    nf = 2 + d % 3
    w, h = 3 + d % 4, 2 + d % 3
    frames = [
        ((d * 19 + k * 257 + np.arange(w * h, dtype=np.int64) * 7) % 256)
        .reshape(h, w)
        for k in range(nf)
    ]
    return encode_apng(
        frames, 0, 8, delay=(1 + d % 4, 10), filter_mode="cycle"
    )


def _mix256(d, s, k=0):
    """Formula contract shared with the DuckDB twins (keep in sync):
    a 256-level xorshift-multiply mixer whose every intermediate fits
    a signed 64-bit integer (DuckDB BIGINT throws on overflow, so no
    wraparound tricks):
      a = d*2654435761 + s*97 + k*1013904223
      b = a XOR (a >> 15)
      c = (b % 2^31) * 1103515245
      v = (c XOR (c >> 13)) % 256
    The additive-generator corpora (synthesize_png_corpus etc.) are
    deliberately low-entropy — fine for codec gates, but their dhash
    signatures collide in mod-256 shift classes, which would make any
    near-dup PAIR gate quadratic-dense.  This mixer gives distinct
    ids near-uniform signatures, so pair gates stay linear in the
    planted duplicates.  Works on ints and int64 numpy arrays."""
    a = d * 2654435761 + s * 97 + k * 1013904223
    b = a ^ (a >> 15)
    c = (b % 2147483648) * 1103515245
    return (c ^ (c >> 13)) % 256


def _synth_neardup_png(d: int) -> bytes:
    from riskloc_spark.operators.png import encode_png

    s = np.arange(16 * 12, dtype=np.int64)
    v = _mix256(np.int64(d), s)
    return encode_png(v.reshape(12, 16), 0, 8, filter_mode="cycle")


def synthesize_neardup_png_corpus(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """(id) -> (id, payload): deterministic HIGH-ENTROPY grayscale
    PNGs for near-dup pair gates.  Contract (d = media id, p = sample
    index row-major): W = 16, H = 12, gray8, v(p) = _mix256(d, p),
    CYCLING row filters.  The >= 9x8 dimensions make every dhash
    gradient bit an independent sample of the mixer, so unrelated ids
    land ~32 hamming apart and banded matching output is exactly the
    planted duplicates."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [
                        _synth_neardup_png(int(i)) for i in pdf[id_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def synthesize_apng_corpus(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, payload): deterministic APNGs. Formula contract
    (d = media id, k = frame, p = sample index row-major):
      n_frames = 2 + d%3,  W = 3 + d%4,  H = 2 + d%3,  gray8,
      v(k, p) = (d*19 + k*257 + p*7) % 256,  per-frame delay (1+d%4)/10,
    encoded with CYCLING row filters per frame."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [_synth_apng(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def _synth_gif(d: int) -> bytes:
    """Deterministic GIF per the formula contract documented on
    ``synthesize_gif_corpus``."""
    from riskloc_spark.operators.gif import encode_gif

    nf = 1 + d % 3
    w, h = 3 + d % 5, 2 + d % 4
    j = np.arange(8, dtype=np.int64)
    pal = np.stack(
        [(j * 41 + d) % 256, (j * 67 + d) % 256, (j * 29 + d) % 256], axis=1
    ).astype(np.uint8)
    frames = [
        ((d + k * 11 + np.arange(w * h, dtype=np.int64) * 3) % 8).reshape(h, w)
        for k in range(nf)
    ]
    return encode_gif(
        frames, pal, delay_ms=10 * (1 + d % 5), interlace=bool(d % 2)
    )


def synthesize_gif_corpus(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, payload): deterministic GIFs. Formula contract
    (d = media id, k = frame, p = pixel index row-major):
      n_frames = 1 + d%3,  W = 3 + d%5,  H = 2 + d%4,  8-color palette
      pal[j] = ((j*41+d)%256, (j*67+d)%256, (j*29+d)%256),
      idx(k, p) = (d + k*11 + p*3) % 8,  delay 10*(1+d%5) ms,
      INTERLACED when d is odd (the decoder must undo the 4-pass row
      interleave to recover the formula)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [_synth_gif(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def synthesize_mixed_media_corpus(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """(id) -> (id, payload): round-robin of the three animated-capable
    synthetic corpora — PNG (d%3==0), APNG (d%3==1), GIF (d%3==2), each
    per its own formula contract — so one frame exercises every header
    parser in ``decode_media``."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    makers = {0: _synth_png, 1: _synth_apng, 2: _synth_gif}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [
                        makers[int(i) % 3](int(i)) for i in pdf[id_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def _gate_jpeg_qtable():
    """Annex K luminance table with DC quantizer 13: odd q00 keeps the
    encoder's float-DCT epsilon away from every rounding boundary (see
    operators/jpeg.py), making constant-block round trips EXACT."""
    from riskloc_spark.operators.jpeg import _QTABLE_LUM

    q = _QTABLE_LUM.reshape(8, 8).copy()
    q[0, 0] = 13
    return q


def _synth_jpeg(d: int) -> bytes:
    """Deterministic baseline JPEG per the formula contract documented
    on ``synthesize_jpeg_corpus``."""
    from riskloc_spark.operators.jpeg import encode_jpeg

    tw, th = 2 + d % 3, 1 + d % 2
    t = np.arange(tw * th, dtype=np.int64)
    tiles = ((d * 23 + t * 71) % 256).reshape(th, tw)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.int64))
    return encode_jpeg(img, qtable=_gate_jpeg_qtable())


def synthesize_jpeg_corpus(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, payload): deterministic grayscale baseline JPEGs of
    constant 8x8 tiles. Formula contract (d = media id, t = tile index
    row-major):
      tiles across = 2 + d%3,  tiles down = 1 + d%2,
      tile value v(t) = (d*23 + t*71) % 256,
      DC quantizer 13 (tie-free), Annex K AC quantizers, 4:4:4.
    Constant tiles make the lossy pipeline EXACTLY reproducible: each
    decoded tile equals constant_block_round_trip(v, 13), the closed
    form the oracle recomputes in SQL — so the Huffman tables, byte
    stuffing, DC prediction, zigzag, and quantization round trip are
    all under the hash."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [_synth_jpeg(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def jpeg_pixel_stats(
    df: DataFrame, bytes_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode baseline JPEG payloads (full Huffman + dequant + IDCT)
    and reduce to integer pixel statistics. Undecodable payloads
    surface NULL stats."""
    from riskloc_spark.operators.jpeg import decode_jpeg

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("pix_sum", T.LongType()),
            T.StructField("pix_wsum", T.LongType()),
            T.StructField("pix_min", T.LongType()),
            T.StructField("pix_max", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                px = decode_jpeg(bytes(b))
                if px is None:
                    rows.append(
                        {
                            "media_id": int(mid), "width": None,
                            "height": None, "n_channels": None,
                            "pix_sum": None, "pix_wsum": None,
                            "pix_min": None, "pix_max": None,
                        }
                    )
                    continue
                h, w, c = px.shape
                flat = px.reshape(-1)
                wts = (np.arange(flat.size, dtype=np.int64) % 97) + 1
                rows.append(
                    {
                        "media_id": int(mid), "width": w, "height": h,
                        "n_channels": c,
                        "pix_sum": int(flat.sum()),
                        "pix_wsum": int((flat * wts).sum()),
                        "pix_min": int(flat.min()),
                        "pix_max": int(flat.max()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.select(
        F.col(id_col).alias("media_id"), F.col(bytes_col).alias("payload")
    ).mapInPandas(run, schema=schema)


_GIF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("idx_sum", T.LongType()),
        T.StructField("idx_wsum", T.LongType()),
        T.StructField("rgb_sum", T.LongType()),
    ]
)


def gif_frame_stats(
    df: DataFrame, bytes_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode GIF payloads (full LZW + de-interlace) and reduce every
    frame to integer statistics over the index plane AND the
    palette-expanded RGB values. Undecodable payloads emit no rows."""
    from riskloc_spark.operators.gif import decode_gif_frames, expand_gif_palette

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                gif = decode_gif_frames(bytes(b))
                if gif is None:
                    continue
                for k, fr in enumerate(gif["frames"]):
                    idx = fr["indices"].reshape(-1)
                    wts = (np.arange(idx.size, dtype=np.int64) % 97) + 1
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": k,
                            "width": fr["w"],
                            "height": fr["h"],
                            "idx_sum": int(idx.sum()),
                            "idx_wsum": int((idx * wts).sum()),
                            "rgb_sum": int(expand_gif_palette(fr).sum()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _GIF_STATS_SCHEMA]
            )

    return df.select(
        F.col(id_col).alias("media_id"), F.col(bytes_col).alias("payload")
    ).mapInPandas(run, schema=_GIF_STATS_SCHEMA)


_PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("color_type", T.IntegerType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("pix_wsum", T.LongType()),
        T.StructField("pix_min", T.LongType()),
        T.StructField("pix_max", T.LongType()),
    ]
)


def _pixel_stats_row(mid: int, decoded: dict | None) -> dict:
    from riskloc_spark.operators.png import decoded_samples

    if decoded is None:
        return {
            "media_id": mid, "width": None, "height": None,
            "n_channels": None, "bit_depth": None, "color_type": None,
            "pix_sum": None, "pix_wsum": None, "pix_min": None,
            "pix_max": None,
        }
    samples = decoded_samples(decoded)
    h, w, c = samples.shape
    flat = samples.reshape(-1)
    weights = (np.arange(flat.size, dtype=np.int64) % 97) + 1
    return {
        "media_id": mid,
        "width": w,
        "height": h,
        "n_channels": c,
        "bit_depth": decoded["bit_depth"],
        "color_type": decoded["color_type"],
        "pix_sum": int(flat.sum()),
        "pix_wsum": int((flat * weights).sum()),
        "pix_min": int(flat.min()),
        "pix_max": int(flat.max()),
    }


def png_pixel_stats(
    df: DataFrame,
    bytes_col: str = "payload",
    id_col: str = "media_id",
    passthrough: tuple = (),
) -> DataFrame:
    """Decode PNG payloads and reduce to integer pixel statistics
    (position-weighted checksum catches sample-order bugs). Undecodable
    payloads surface NULL stats. ``passthrough`` columns (e.g. a
    frame index) are carried through unchanged."""
    from riskloc_spark.operators.png import decode_png

    pass_fields = [df.schema[c] for c in passthrough]
    schema = T.StructType(
        [_PNG_STATS_SCHEMA[0], *pass_fields, *_PNG_STATS_SCHEMA[1:]]
    )
    names = [f.name for f in schema]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, (mid, b) in enumerate(zip(pdf["media_id"], pdf["payload"])):
                row = _pixel_stats_row(int(mid), decode_png(bytes(b)))
                for c in passthrough:
                    row[c] = pdf[c].iloc[i]
                rows.append(row)
            yield pd.DataFrame(rows, columns=names)

    return df.select(
        F.col(id_col).alias("media_id"),
        *passthrough,
        F.col(bytes_col).alias("payload"),
    ).mapInPandas(run, schema=schema)


_PNG_BILINEAR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("b_mean", T.DoubleType()),
        T.StructField("b_wmean", T.DoubleType()),
    ]
)


def png_bilinear_stats(
    df: DataFrame,
    width: int,
    height: int,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Bilinear-resample stats per PNG payload: decode, resample to
    (width, height) with half-pixel-center bilinear (palette expanded
    to RGB first — index interpolation is meaningless), emit the plain
    and position-weighted means of the resampled samples. Means (not
    sums) keep the values at sample magnitude, so the oracle's
    different summation order stays far inside the 9-significant-digit
    gate compare."""
    from riskloc_spark.operators.png import (
        decode_png,
        decoded_samples,
        resize_bilinear,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_png(bytes(b))
                if decoded is None:
                    rows.append(
                        {
                            "media_id": int(mid), "n_samples": None,
                            "b_mean": None, "b_wmean": None,
                        }
                    )
                    continue
                rs = resize_bilinear(
                    decoded_samples(decoded), width, height
                ).reshape(-1)
                wts = (np.arange(rs.size) % 89) + 1
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": int(rs.size),
                        "b_mean": float(rs.mean()),
                        "b_wmean": float((rs * wts).sum() / wts.sum()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PNG_BILINEAR_SCHEMA]
            )

    return df.select(
        F.col(id_col).alias("media_id"), F.col(bytes_col).alias("payload")
    ).mapInPandas(run, schema=_PNG_BILINEAR_SCHEMA)


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


def _dhash_kernel(samples: "np.ndarray") -> int:
    """64-bit difference hash of a decoded sample array (H, W, C):
    integer luma (299R+587G+114B)//1000 for >=3 channels, channel 0
    otherwise; nearest-resize (the SQL-replayable floor mapping) to
    9x8; bit i*8+j set iff gray[i, j+1] > gray[i, j].  Returned as a
    SIGNED 64-bit value (bit 63 wraps, the xxhash64 convention)."""
    from riskloc_spark.operators.png import resize_nearest

    s = samples.astype(np.int64)
    if s.shape[2] >= 3:
        gray = (
            299 * s[:, :, 0] + 587 * s[:, :, 1] + 114 * s[:, :, 2]
        ) // 1000
    else:
        gray = s[:, :, 0]
    g = resize_nearest(gray[:, :, None], 9, 8)[:, :, 0]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)  # (8, 8)
    h = 0
    for k, b in enumerate(bits.reshape(-1)):
        if b:
            h |= 1 << k
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def media_dhash(
    df: DataFrame, bytes_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, width, height, dhash): perceptual difference-hash per image
    — the standard near-duplicate signature (two images within a few
    bits of hamming distance are crops/re-encodes/rescales of each
    other).  PNG (palette expanded via decoded_samples), baseline JPEG
    and GIF frame 0 decode through the dependency-free codecs;
    payloads matching no codec (or over MAX_DECODE_BYTES) are dropped
    — a signature of stub bytes would manufacture false duplicate
    groups.

    Scale shape: one corpus pass behind mapInPandas, zero shuffle —
    the downstream ``image_near_dup`` pays the only exchange."""
    from riskloc_spark.operators.gif import decode_gif_frames
    from riskloc_spark.operators.jpeg import decode_jpeg
    from riskloc_spark.operators.png import decode_png, decoded_samples

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
        ]
    )
    budget = MAX_DECODE_BYTES

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(b)
                samples = None
                decoded = decode_png(b)
                if decoded is not None:
                    samples = decoded_samples(decoded)
                elif len(b) <= budget:
                    samples = decode_jpeg(b)
                    if samples is None:
                        gif = decode_gif_frames(b)
                        if gif is not None and gif["frames"]:
                            samples = gif["frames"][0]
                if samples is None:
                    continue
                rows.append(
                    {
                        id_col: mid,
                        "width": int(samples.shape[1]),
                        "height": int(samples.shape[0]),
                        "dhash": _dhash_kernel(samples),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "dhash"]
            )

    return df.select(id_col, bytes_col).mapInPandas(run, out_schema)


def banded_hamming_pairs(
    hashes: DataFrame,
    max_hamming: int,
    hash_col: str,
    id_col: str,
    extra_keys: "list[str] | None" = None,
) -> DataFrame:
    """(id_a, id_b[, extra_keys...], hamming): pairs of rows whose
    64-bit ``hash_col`` values are within ``max_hamming`` bits, by the
    pigeonhole rule — two such hashes must agree EXACTLY on at least
    one of (max_hamming + 1) disjoint bit blocks, so candidates come
    from an equality join on (block_idx, block_bits [, extra_keys])
    and only candidates pay the popcount check.  Never an all-pairs
    comparison: the exchange is the block-bucket hash join (the
    minhash-LSH band shape), skewed buckets split under AQE.  Shared
    by image (dhash) and audio (energy fingerprint) near-dup.

    The input is lazily LOCAL-CHECKPOINTED before the self-join:
    Spark performs no common-subexpression elimination across join
    branches, so without it the entire upstream pipeline (decode +
    hash — the expensive part of every caller) executes TWICE, once
    per side (measured 2x on the video gate corpus, BENCH r13 video
    block).  Hash rows are tiny (id + 64-bit hash), so the
    checkpoint copy is noise next to the saved decode pass.  Skipped
    for streaming inputs (checkpointing a streaming frame is
    unsupported; the streaming callers pair against a persisted
    index, not themselves)."""
    from pyspark.sql import functions as _F

    from riskloc_spark.operators.dedup import reuse_checkpoint

    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    hashes = reuse_checkpoint(hashes)
    extra = list(extra_keys or [])
    n_blocks = max_hamming + 1
    width = (64 + n_blocks - 1) // n_blocks
    # signed all-ones when a block spans the full hash (max_hamming=0):
    # (1<<64)-1 doesn't fit a java long
    mask = -1 if width >= 64 else (1 << width) - 1
    block = _F.explode(
        _F.array(*[_F.lit(i) for i in range(n_blocks)])
    ).alias("__blk")
    keyed = hashes.select(id_col, hash_col, *extra, block).withColumn(
        "__bits",
        # unsigned view of the signed hash, sliced by block (expr form:
        # the python shiftrightunsigned wrapper takes only int numBits)
        _F.expr(f"shiftrightunsigned({hash_col}, __blk * {width})")
        .bitwiseAND(_F.lit(mask)),
    )
    a = keyed.select(
        _F.col(id_col).alias("id_a"),
        _F.col(hash_col).alias("__ha"),
        *extra, "__blk", "__bits",
    )
    b = keyed.select(
        _F.col(id_col).alias("id_b"),
        _F.col(hash_col).alias("__hb"),
        *extra, "__blk", "__bits",
    )
    return (
        a.join(b, ["__blk", "__bits", *extra])
        .filter(_F.col("id_a") < _F.col("id_b"))
        .select(
            "id_a", "id_b", *extra,
            _F.bit_count(
                _F.col("__ha").bitwiseXOR(_F.col("__hb"))
            ).alias("hamming"),
        )
        .filter(_F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_near_dup(
    df: DataFrame,
    max_hamming: int = 4,
    bytes_col: str = "payload",
    id_col: str = "media_id",
    hashes: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming): image near-duplicate pairs by banded
    dhash matching (see ``banded_hamming_pairs``).  ``hashes``: a
    precomputed ``media_dhash`` frame (the ingest-artifact
    discipline)."""
    h = hashes if hashes is not None else media_dhash(df, bytes_col, id_col)
    return banded_hamming_pairs(h, max_hamming, "dhash", id_col)


def image_dedup(
    df: DataFrame,
    max_hamming: int = 4,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Image near-duplicate DEDUP: dhash signatures -> banded pairs ->
    connected-components groups -> keep the min-id representative per
    group.  Payloads no codec can decode pass through unchanged (no
    signature means no dedup evidence — dropping them would delete
    data on a parser gap).  Returns the input rows that survive.

    Scale shape: the signature pass, the block-bucket pair join, and
    the pointer-jumping closure — all inherited from the hash-gated
    pieces (media_dhash, image_near_dup, dedup_groups); the final
    keep is one semi/anti join pair."""
    from riskloc_spark.operators.dedup import dedup_groups

    h = media_dhash(df, bytes_col, id_col)
    pairs = image_near_dup(
        df, max_hamming, bytes_col, id_col, hashes=h
    )
    groups = dedup_groups(
        pairs,
        documents=h.select(F.col(id_col)),
        id_col=id_col,
    )
    reps = groups.filter(F.col("is_representative")).select(id_col)
    undecodable = df.select(id_col).join(
        h.select(id_col), id_col, "left_anti"
    )
    keep = reps.unionByName(undecodable)
    return df.join(keep, id_col, "left_semi")


def build_image_index(
    df: DataFrame,
    max_hamming: int = 4,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Ingest-time image near-dup INDEX for a base corpus: one row per
    (image, block) carrying (id, dhash, block, bits) — exactly the
    frame incremental probes bucket on, exposed as a persistable
    artifact (the text-side ``build_near_dup_index`` discipline: hash
    the base corpus ONCE at ingest, write bucketed on (block, bits),
    and every later batch probes without re-decoding a single base
    image).  ``max_hamming`` fixes the block geometry — probe with the
    SAME value."""
    from pyspark.sql import functions as _F

    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    n_blocks = max_hamming + 1
    width = (64 + n_blocks - 1) // n_blocks
    mask = -1 if width >= 64 else (1 << width) - 1
    h = media_dhash(df, bytes_col, id_col)
    block = _F.explode(
        _F.array(*[_F.lit(i) for i in range(n_blocks)])
    ).alias("block")
    return h.select(id_col, "dhash", block).withColumn(
        "bits",
        _F.expr(f"shiftrightunsigned(dhash, block * {width})")
        .bitwiseAND(_F.lit(mask)),
    )


def incremental_image_dedup(
    new_df: DataFrame,
    index: DataFrame,
    max_hamming: int = 4,
    bytes_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(new_id, base_id, hamming): match an incoming image batch
    AGAINST a base-corpus index from ``build_image_index`` (same
    ``max_hamming``).  Only the batch is decoded and hashed; the base
    side contributes index rows alone.  The probe shuffles on
    (block, bits) — an index written bucketed on those keys reads
    exchange-free and only the (small) batch moves: the text-side
    ``incremental_near_dup`` shape, for images."""
    from pyspark.sql import functions as _F

    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    n_blocks = max_hamming + 1
    width = (64 + n_blocks - 1) // n_blocks
    mask = -1 if width >= 64 else (1 << width) - 1
    h = media_dhash(new_df, bytes_col, id_col)
    block = _F.explode(
        _F.array(*[_F.lit(i) for i in range(n_blocks)])
    ).alias("block")
    probe = h.select(
        _F.col(id_col).alias("new_id"),
        _F.col("dhash").alias("__hn"),
        block,
    ).withColumn(
        "bits",
        _F.expr(f"shiftrightunsigned(__hn, block * {width})")
        .bitwiseAND(_F.lit(mask)),
    )
    base = index.select(
        _F.col(id_col).alias("base_id"),
        _F.col("dhash").alias("__hb"),
        "block", "bits",
    )
    return (
        probe.join(base, ["block", "bits"])
        .select(
            "new_id", "base_id",
            _F.bit_count(
                _F.col("__hn").bitwiseXOR(_F.col("__hb"))
            ).alias("hamming"),
        )
        .filter(_F.col("hamming") <= max_hamming)
        .distinct()
    )
