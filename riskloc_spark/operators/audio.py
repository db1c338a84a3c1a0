"""Audio modality: a real RIFF/WAVE PCM codec plus Spark-side feature
operators, rounding out the image (PNG/GIF/JPEG) modality suite.

The codec is dependency-free (stdlib ``struct`` + numpy): ``encode_wav``
writes a canonical RIFF container (fmt chunk, an optional LIST metadata
chunk to keep the reader's chunk walk honest, word-aligned chunk
padding) and ``parse_wav`` walks chunks generically — unknown chunks
are skipped by their declared size, odd sizes consume the RIFF pad
byte, and PCM16/PCM8 payloads de-interleave into an (n_samples,
n_channels) int32 array.  ``MAX_AUDIO_BYTES`` bounds how much payload a
single row may decode so one hostile blob cannot stall a task.

Feature extraction mirrors the image-modality design: the Spark side
decodes the REAL bytes inside Arrow-batched ``mapInPandas`` (no driver
loop, no row UDF) and reduces each channel to INTEGER statistics —
energy, sum of absolute amplitude, peak, zero crossings — so the
DuckDB oracle can replay the synthesis contract in closed-form SQL
with bit-exact integer arithmetic (no float summation-order seam).

At 100 TB the shape is the same as the image path: payloads stream
through executors in Arrow record batches, features are one narrow
projection per blob, and nothing ever collects to the driver.  The
reference repo has no audio counterpart; this surface comes from the
training-data-pipeline brief (decode / feature-extract / resample /
frame-sample over opaque binary columns).
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "MAX_AUDIO_BYTES",
    "encode_wav",
    "parse_wav",
    "synthesize_wav_corpus",
    "decode_audio",
    "audio_features",
    "audio_frame_energy",
    "resample_audio_features",
]

MAX_AUDIO_BYTES = 4 * 1024 * 1024


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    *,
    bits: int = 16,
    list_info: bytes | None = None,
) -> bytes:
    """Encode an (n,) or (n, ch) integer sample array as a RIFF/WAVE
    PCM file.  16-bit samples are signed little-endian; 8-bit samples
    are stored unsigned with the conventional +128 bias.  When
    ``list_info`` is given, a LIST chunk is written BEFORE the data
    chunk (padded to word alignment when odd) so decoders must walk
    chunks rather than assume a fixed layout."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
    elif bits == 8:
        payload = (arr.astype(np.int64) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bits={bits}")
    block_align = ch * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if list_info is not None:
        body = b"INFO" + list_info
        chunks.append(b"LIST" + struct.pack("<I", len(body)) + body)
        if len(body) % 2:
            chunks.append(b"\x00")
    chunks.append(b"data" + struct.pack("<I", len(payload)) + payload)
    if len(payload) % 2:
        chunks.append(b"\x00")
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(data: bytes, budget: int = MAX_AUDIO_BYTES) -> dict | None:
    """Parse a RIFF/WAVE file: generic chunk walk (fmt before data not
    assumed; unknown chunks skipped by size; odd chunk sizes consume
    the pad byte), PCM 8/16-bit decode, channel de-interleave.

    Returns ``{sample_rate, n_channels, bits, n_samples, samples}``
    with ``samples`` an (n_samples, n_channels) int32 array (8-bit
    values re-centered to signed), or None for non-WAV / truncated /
    non-PCM / over-``budget`` payloads."""
    if data is None or len(data) < 12 or len(data) > budget:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    pos = 12
    fmt_info: tuple | None = None
    raw: bytes | None = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_at = pos + 8
        if body_at + size > end:
            return None  # chunk past the declared RIFF end (truncated
            # or size-lying container — same rule as parse_avi)
        if cid == b"fmt " and size >= 16:
            audio_format, ch, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[body_at : body_at + 16]
            )
            if audio_format != 1 or ch == 0 or bits not in (8, 16):
                return None  # non-PCM or malformed
            fmt_info = (ch, sr, bits)
        elif cid == b"data":
            raw = data[body_at : body_at + size]
        pos = body_at + size + (size % 2)  # word-aligned chunks
    if fmt_info is None or raw is None:
        return None
    ch, sr, bits = fmt_info
    width = bits // 8
    usable = len(raw) - (len(raw) % (ch * width))
    if bits == 16:
        flat = np.frombuffer(raw[:usable], dtype="<i2").astype(np.int32)
    else:
        flat = np.frombuffer(raw[:usable], dtype=np.uint8).astype(np.int32) - 128
    n = flat.size // ch
    return {
        "sample_rate": int(sr),
        "n_channels": int(ch),
        "bits": int(bits),
        "n_samples": int(n),
        "samples": flat.reshape(n, ch),
    }


# ---------------------------------------------------------------------------
# deterministic synthesis (formula contract shared with the SQL oracle)
# ---------------------------------------------------------------------------

def _synth_params(d: int) -> tuple[int, int, int, int]:
    """(sample_rate, n_samples, n_channels, half_period) for media id d.
    Contract (replayed by the DuckDB twins — keep in sync):
      sr = 8000 * (1 + d % 3)
      n  = 1600 + (d % 7) * 800
      ch = 1 + d % 2
      p  = 8 + d % 29
    """
    return 8000 * (1 + d % 3), 1600 + (d % 7) * 800, 1 + d % 2, 8 + d % 29


def _synth_samples(d: int) -> np.ndarray:
    """(n, ch) int64 waveform per the contract: channel c, index i ->
      sq(i)    = +6000 if (i // p) % 2 == 0 else -6000
      noise    = ((d % 4096)*2654435761 + c*97 + i*48271) % 4096 - 2048
      s(c, i)  = sq(i) + noise
    All integer, |s| <= 8047 (fits int16), every term non-negative
    before the %, so Spark/DuckDB/numpy modulo semantics agree.  The
    id is reduced mod 4096 BEFORE the multiply: d * 2654435761 wraps
    int64 negative past d ~ 3.5e9, where numpy's sign-of-divisor %
    silently diverges from DuckDB's sign-of-dividend % — and
    (d % 4096) * K is congruent to d * K mod 4096, so the reduction
    changes no value at any id."""
    _sr, n, ch, p = _synth_params(d)
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    sq = np.where((i // p) % 2 == 0, 6000, -6000)
    noise = ((d % 4096) * 2654435761 + c * 97 + i * 48271) % 4096 - 2048
    return sq + noise


def _synth_wav(d: int) -> bytes:
    sr, _n, _ch, _p = _synth_params(d)
    # a LIST chunk before data (odd body length every other id) keeps
    # the decoder's chunk walk + pad handling on the gated path
    info = b"ISFT" + (b"riskloc_spark" + (b"!" if d % 2 else b""))
    return encode_wav(_synth_samples(d), sr, list_info=info)


def synthesize_wav_corpus(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, payload): deterministic PCM16 WAVs per the formula
    contract on ``_synth_params`` / ``_synth_samples``, built inside an
    Arrow-batched mapInPandas (no driver loop)."""
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
                    "payload": [_synth_wav(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
    ]
)


def decode_audio(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, payload) -> container metadata via the real RIFF walk.
    duration_us = n_samples * 1_000_000 // sample_rate (integer, so the
    oracle seam is exact).  Undecodable payloads yield NULL fields."""
    budget = MAX_AUDIO_BYTES

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = parse_wav(
                    bytes(payload) if payload is not None else None,
                    budget,
                )
                if dec is None:
                    rows.append(
                        dict.fromkeys(
                            (f.name for f in _META_SCHEMA), None
                        )
                        | {"media_id": int(mid)}
                    )
                    continue
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": dec["sample_rate"],
                        "n_channels": dec["n_channels"],
                        "bits": dec["bits"],
                        "n_samples": dec["n_samples"],
                        "duration_us": dec["n_samples"] * 1_000_000
                        // dec["sample_rate"],
                    }
                )
            # object dtype: a mixed decoded/None batch must not infer
            # float64 (NaN breaks the Arrow cast to long)
            yield pd.DataFrame(
                rows, columns=[f.name for f in _META_SCHEMA], dtype=object
            )

    return media.mapInPandas(run, schema=_META_SCHEMA)


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def _channel_features(mid: int, s: np.ndarray, c: int, stride: int = 1) -> dict:
    """Integer per-channel stats of one decoded channel (optionally
    decimated by ``stride``).  int64 throughout: energy of a full-scale
    16-bit signal overflows int32 after ~2k samples."""
    v = s[::stride, c].astype(np.int64)
    nonneg = v >= 0
    return {
        "media_id": mid,
        "channel": c,
        "n_samples": int(v.size),
        "energy": int(np.dot(v, v)),
        "sum_abs": int(np.abs(v).sum()),
        "peak": int(np.abs(v).max()) if v.size else 0,
        "zero_crossings": int(np.count_nonzero(nonneg[1:] != nonneg[:-1])),
    }


def audio_features(
    media: DataFrame, id_col: str = "media_id", stride: int = 1
) -> DataFrame:
    """(id, payload) -> one row per (id, channel) of integer amplitude
    statistics from the REAL decoded PCM: energy = sum(s^2), sum|s|,
    peak |s|, and sign zero-crossings (s >= 0 flips between consecutive
    kept samples).  ``stride`` > 1 measures the decimated signal — the
    gateable half of resampling (kept indices i = 0, stride, 2*stride,
    ... of the original, so the oracle replays it by reindexing).
    Undecodable payloads are dropped (channel is per-payload)."""
    budget = MAX_AUDIO_BYTES
    k = int(stride)
    if k < 1:
        raise ValueError("stride must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = parse_wav(
                    bytes(payload) if payload is not None else None,
                    budget,
                )
                # n_samples == 0: a decodable WAV with an empty data
                # chunk has no signal to describe — the SQL oracle
                # (range over n samples) emits no row, so emitting a
                # zeros row here would diverge the contract
                if dec is None or dec["n_samples"] == 0:
                    continue
                s = dec["samples"]
                for c in range(dec["n_channels"]):
                    rows.append(_channel_features(int(mid), s, c, k))
            yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA])

    return media.mapInPandas(run, schema=_FEAT_SCHEMA)


def resample_audio_features(
    media: DataFrame, factor: int, id_col: str = "media_id"
) -> DataFrame:
    """Decimation resample (keep every ``factor``-th sample) measured
    through the same integer feature reduction.  Decimation is the
    exactly-replayable resampler; interpolating resamplers (linear,
    sinc) live on the float side of the seam and are deliberately not
    gated — the plumbing under test (decode -> per-channel kernel ->
    Arrow batches out) is identical."""
    return audio_features(media, id_col=id_col, stride=int(factor))


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_n", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_frame_energy(
    media: DataFrame, frame_len: int = 512, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sample the signal: fixed-length windows (frame f covers
    sample indices [f*frame_len, (f+1)*frame_len), final partial frame
    kept with its true length) reduced to integer energy + peak per
    (id, channel, frame).  The audio analogue of the image-side
    ``sample_frames``: one blob fans out to a bounded strip of rows,
    still entirely inside the Arrow batch."""
    budget = MAX_AUDIO_BYTES
    fl = int(frame_len)
    if fl < 1:
        raise ValueError("frame_len must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = parse_wav(
                    bytes(payload) if payload is not None else None,
                    budget,
                )
                if dec is None:
                    continue
                s = dec["samples"].astype(np.int64)
                n = dec["n_samples"]
                for c in range(dec["n_channels"]):
                    col = s[:, c]
                    for f in range((n + fl - 1) // fl):
                        v = col[f * fl : (f + 1) * fl]
                        rows.append(
                            {
                                "media_id": int(mid),
                                "channel": c,
                                "frame_idx": f,
                                "frame_n": int(v.size),
                                "energy": int(np.dot(v, v)),
                                "peak": int(np.abs(v).max()),
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA])

    return media.mapInPandas(run, schema=_FRAME_SCHEMA)


_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("fingerprint", T.LongType()),
        T.StructField("n_bits", T.IntegerType()),
    ]
)


def audio_fingerprint(
    media: DataFrame, frame_len: int = 512, id_col: str = "media_id"
) -> DataFrame:
    """(id, channel, fingerprint, n_bits): energy-gradient audio
    fingerprint — the Haitsma-Kalker shape reduced to its integer
    core: frame the signal (``frame_len`` samples), bit k set iff
    energy[k+1] > energy[k], packed into a signed 64-bit value (bit 63
    wraps, the dhash convention; at most 64 comparisons — longer
    signals fingerprint their first 65 frames, a windowed variant is
    the production extension).  Gain changes scale every frame energy
    by the same factor, so the comparisons — and the fingerprint —
    are invariant under them; small noise flips only near-tie bits.
    Channels with fewer than 2 frames yield no row.

    Near-dup matching composes with ``multimodal.banded_hamming_pairs``
    (see ``audio_near_dup``) — never an all-pairs comparison."""
    budget = MAX_AUDIO_BYTES
    fl = int(frame_len)
    if fl < 1:
        raise ValueError("frame_len must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                dec = parse_wav(
                    bytes(payload) if payload is not None else None,
                    budget,
                )
                if dec is None:
                    continue
                s = dec["samples"].astype(np.int64)
                n = dec["n_samples"]
                n_frames = (n + fl - 1) // fl
                for c in range(dec["n_channels"]):
                    col = s[:, c]
                    e = [
                        int(np.dot(col[f * fl: (f + 1) * fl],
                                   col[f * fl: (f + 1) * fl]))
                        for f in range(min(n_frames, 65))
                    ]
                    nb = min(len(e) - 1, 64)
                    if nb < 1:
                        continue
                    h = 0
                    for k in range(nb):
                        if e[k + 1] > e[k]:
                            h |= 1 << k
                    if h >= 1 << 63:
                        h -= 1 << 64
                    rows.append(
                        {
                            "media_id": int(mid),
                            "channel": c,
                            "fingerprint": h,
                            "n_bits": nb,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FP_SCHEMA]
            )

    return media.mapInPandas(run, schema=_FP_SCHEMA)


def audio_near_dup(
    media: DataFrame,
    max_hamming: int = 4,
    frame_len: int = 512,
    id_col: str = "media_id",
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, channel, hamming): audio near-duplicate pairs by
    banded fingerprint matching PER CHANNEL (the channel is an extra
    equality key of the block join, so stereo pairs must match on the
    same channel).  ``fingerprints``: a precomputed
    ``audio_fingerprint`` frame (the ingest-artifact discipline)."""
    from riskloc_spark.operators.multimodal import banded_hamming_pairs

    fp = (
        fingerprints
        if fingerprints is not None
        else audio_fingerprint(media, frame_len, id_col)
    )
    return banded_hamming_pairs(
        fp, max_hamming, "fingerprint", id_col, extra_keys=["channel"]
    )
