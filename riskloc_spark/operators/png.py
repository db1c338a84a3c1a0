"""Dependency-free PNG pixel codec: stdlib ``zlib``/``binascii`` + numpy.

This makes the multimodal pipeline's decode / resize / featurize kernels
REAL for the dominant image format without any external codec:

- ``decode_png``: full pixel decode of PNGs — bit depths 1/2/4/8/16,
  color types 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) /
  6 (RGBA), all five scanline filters (None/Sub/Up/Average/Paeth, PNG
  spec §9), and BOTH interlace methods (none + Adam7: each of the 7
  passes is an independently filtered sub-image scattered onto its
  (y0::dy, x0::dx) grid).
- ``encode_png``: the inverse (Adam7 included), with a selectable
  per-row filter strategy so round-trip tests exercise every unfilter
  branch.
- ``resize_nearest`` / ``resize_bilinear``: numpy resampling kernels.
- ``expand_palette``: palette index plane -> RGB.

Filter math notes: unfiltering is per-row sequential by spec. None/Up
are fully vectorized; Sub is a per-lane ``cumsum`` (mod-256 via uint8
wraparound); Average/Paeth carry an inherent byte-serial dependency and
run as per-byte loops over the row (fine for the small-image kernels
here; a production path would push these rows through numba/C).

GIF and baseline JPEG live in sibling modules (operators/gif.py,
operators/jpeg.py); progressive JPEG stays out of scope.
"""
from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# Decompression-bomb guard: a ~10 MB payload can declare 100000x100000
# and inflate to tens of GB per executor task. Reject images whose
# sample count exceeds this bound (2^26 samples = 512 MB as int64 —
# far above any thumbnail/feature pipeline, far below an OOM).
MAX_SAMPLES = 1 << 26


def _inflate_exact(data: bytes, expected: int) -> bytes | None:
    """zlib-decompress with a hard output bound: returns exactly
    ``expected`` bytes, or None if the stream yields more, fewer, or is
    corrupt. Never materializes more than ``expected`` + 1 bytes, so a
    crafted high-ratio stream cannot balloon executor memory."""
    d = zlib.decompressobj()
    out = d.decompress(data, expected + 1)
    if len(out) > expected:  # bomb: wants more than the header declares
        return None
    out += d.flush()
    if len(out) != expected:
        return None
    return out

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes: (x_start, y_start, x_step, y_step). Each pass
# is an independently filtered sub-image; the IDAT stream concatenates
# the passes' scanline streams (empty passes contribute nothing).
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_passes(width: int, height: int):
    """Non-empty passes as (x0, y0, dx, dy, pass_w, pass_h)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out

_VALID_DEPTHS = {
    0: {1, 2, 4, 8, 16},
    2: {8, 16},
    3: {1, 2, 4, 8},
    4: {8, 16},
    6: {8, 16},
}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", binascii.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _pack_row(samples: np.ndarray, bit_depth: int) -> bytes:
    """One row of integer samples -> the PNG byte layout (MSB-first
    bit packing below 8, big-endian u16 at 16)."""
    if bit_depth == 8:
        return samples.astype(np.uint8).tobytes()
    if bit_depth == 16:
        return samples.astype(">u2").tobytes()
    per_byte = 8 // bit_depth
    n = len(samples)
    padded = np.zeros(((n + per_byte - 1) // per_byte) * per_byte, dtype=np.uint8)
    padded[:n] = samples
    bits = np.unpackbits(padded.reshape(-1, 1), axis=1)[:, 8 - bit_depth:]
    return np.packbits(bits.reshape(-1, 8 // bit_depth * bit_depth)).tobytes()


def _unpack_row(row: np.ndarray, bit_depth: int, n_samples: int) -> np.ndarray:
    """Inverse of _pack_row: filtered-row bytes -> integer samples."""
    if bit_depth == 8:
        return row[:n_samples].astype(np.int64)
    if bit_depth == 16:
        return row.view(">u2")[:n_samples].astype(np.int64)
    bits = np.unpackbits(row)
    vals = bits.reshape(-1, bit_depth)
    weights = 1 << np.arange(bit_depth - 1, -1, -1)
    return (vals * weights).sum(axis=1)[:n_samples].astype(np.int64)


def _filter_stream(
    flat_rows: np.ndarray,
    width: int,
    height: int,
    channels: int,
    bit_depth: int,
    filter_mode: int | str,
) -> bytes:
    """Rows of samples -> the PNG filter stream (filter byte + filtered
    bytes per scanline), ready for zlib."""
    stride = (width * channels * bit_depth + 7) // 8
    bpp = max(1, channels * bit_depth // 8)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        line = np.frombuffer(
            _pack_row(flat_rows[y], bit_depth), dtype=np.uint8
        ).copy()
        if len(line) < stride:
            line = np.concatenate([line, np.zeros(stride - len(line), np.uint8)])
        ftype = (y % 5) if filter_mode == "cycle" else int(filter_mode)
        if ftype == 0:
            filt = line
        elif ftype == 1:  # Sub
            shifted = np.zeros_like(line)
            shifted[bpp:] = line[:-bpp]
            filt = line - shifted  # uint8 wraps mod 256
        elif ftype == 2:  # Up
            filt = line - prev
        elif ftype == 3:  # Average (list loop — see the decode twin)
            ln = line.tolist()
            pv = prev.tolist()
            out = [0] * stride
            for i in range(stride):
                a = ln[i - bpp] if i >= bpp else 0
                out[i] = (ln[i] - ((a + pv[i]) >> 1)) & 0xFF
            filt = np.array(out, dtype=np.uint8)
        elif ftype == 4:  # Paeth (list loop — see the decode twin)
            ln = line.tolist()
            pv = prev.tolist()
            out = [0] * stride
            for i in range(stride):
                a = ln[i - bpp] if i >= bpp else 0
                b = pv[i]
                c = pv[i - bpp] if i >= bpp else 0
                out[i] = (ln[i] - _paeth(a, b, c)) & 0xFF
            filt = np.array(out, dtype=np.uint8)
        else:
            raise ValueError(f"bad filter {ftype}")
        raw.append(ftype)
        raw.extend(filt.tobytes())
        prev = line
    return bytes(raw)


def _flat_rows(pixels: np.ndarray, color_type: int) -> tuple:
    """Pixel array -> (rows-of-samples, width, height, channels)."""
    channels = _CHANNELS[color_type]
    pixels = np.asarray(pixels)
    if channels == 1:
        if pixels.ndim == 3:
            pixels = pixels[:, :, 0]
        height, width = pixels.shape
        return pixels.reshape(height, width), width, height, channels
    height, width, c = pixels.shape
    if c != channels:
        raise ValueError(f"expected {channels} channels, got {c}")
    return pixels.reshape(height, width * channels), width, height, channels


def encode_png(
    pixels: np.ndarray,
    color_type: int,
    bit_depth: int = 8,
    palette: np.ndarray | None = None,
    filter_mode: int | str = "cycle",
    interlace: bool = False,
) -> bytes:
    """Encode a pixel array as a PNG (``interlace`` selects Adam7).

    ``pixels``: (H, W) for color types 0/3, (H, W, C) otherwise; integer
    sample values already in [0, 2^bit_depth). ``palette``: (N, 3) uint8
    for color type 3. ``filter_mode``: an int 0-4 applied to every row,
    or "cycle" (row y uses filter y % 5) so round trips cover all five
    unfilter branches.
    """
    if bit_depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(f"bit depth {bit_depth} invalid for color type {color_type}")
    flat_rows, width, height, channels = _flat_rows(pixels, color_type)
    if interlace:
        norm = np.asarray(pixels)
        if channels == 1 and norm.ndim == 3:
            norm = norm[:, :, 0]
        raw = b"".join(
            _filter_stream(
                _flat_rows(norm[y0::dy, x0::dx], color_type)[0],
                pw, ph, channels, bit_depth, filter_mode,
            )
            for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height)
        )
    else:
        raw = _filter_stream(
            flat_rows, width, height, channels, bit_depth, filter_mode
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    out = bytearray(_MAGIC)
    out += _chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette required for color type 3")
        out += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_png(data: bytes) -> dict | None:
    """Decode a PNG payload to pixels.

    Returns ``{"pixels": (H, W, C) int64 array, "bit_depth": int,
    "color_type": int, "palette": (N, 3) uint8 | None}`` — palette
    images keep their index plane in ``pixels`` (C=1) with the palette
    alongside, matching Pillow's mode-'P' single band. Both interlace
    methods decode (none + Adam7 — the 7-pass de-interleave in
    ``_decode_adam7``). Returns None for non-PNG payloads or corrupt
    streams.
    """
    data = bytes(data)
    if data[:8] != _MAGIC or len(data) < 33:
        return None
    try:
        if data[12:16] != b"IHDR":
            return None
        width, height = struct.unpack(">II", data[16:24])
        bit_depth, color_type, comp, filt, interlace = struct.unpack(
            ">BBBBB", data[24:29]
        )
        if (
            width == 0
            or height == 0
            or comp != 0
            or filt != 0
            or interlace not in (0, 1)  # 0 = none, 1 = Adam7
            or color_type not in _CHANNELS
            or bit_depth not in _VALID_DEPTHS[color_type]
            or width * height * _CHANNELS[color_type] > MAX_SAMPLES
        ):
            return None
        palette = None
        idat = bytearray()
        pos = 8
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos: pos + 4])
            ctype = data[pos + 4: pos + 8]
            payload = data[pos + 8: pos + 8 + length]
            if len(payload) < length:
                return None
            if ctype == b"PLTE":
                if length % 3 != 0 or length == 0:
                    return None
                palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat += payload
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if not idat or (color_type == 3 and palette is None):
            return None
        channels = _CHANNELS[color_type]
        if interlace:
            expected = sum(
                ph * (((pw * channels * bit_depth + 7) // 8) + 1)
                for _, _, _, _, pw, ph in _adam7_passes(width, height)
            )
        else:
            stride = (width * channels * bit_depth + 7) // 8
            expected = height * (stride + 1)
        raw = _inflate_exact(bytes(idat), expected)
        if raw is None:
            return None
    except (zlib.error, struct.error, ValueError, MemoryError):
        return None

    if interlace:
        pixels = _decode_adam7(raw, width, height, bit_depth, channels)
    else:
        pixels = _decode_raw(raw, width, height, bit_depth, channels)
    if pixels is None:
        return None
    if color_type == 3 and palette is not None and pixels.max() >= len(palette):
        return None  # index out of palette range
    return {
        "pixels": pixels,
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
        "palette": palette,
    }


def _decode_adam7(
    raw: bytes, width: int, height: int, bit_depth: int, channels: int
):
    """Adam7: decode each pass's independently-filtered sub-image and
    scatter it onto the (y0::dy, x0::dx) grid."""
    out = np.zeros((height, width, channels), dtype=np.int64)
    pos = 0
    for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
        stride = (pw * channels * bit_depth + 7) // 8
        n = ph * (stride + 1)
        sub = _decode_raw(raw[pos: pos + n], pw, ph, bit_depth, channels)
        if sub is None:
            return None
        pos += n
        out[y0::dy, x0::dx] = sub
    if pos != len(raw):
        return None
    return out


def _decode_raw(
    raw: bytes, width: int, height: int, bit_depth: int, channels: int
):
    """Decompressed filter stream -> (H, W, C) int64 sample array, or
    None for length mismatches / invalid filter bytes."""
    stride = (width * channels * bit_depth + 7) // 8
    if len(raw) != height * (stride + 1):
        return None
    bpp = max(1, channels * bit_depth // 8)

    lines = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: per-lane prefix sum, uint8 wrap
            for lane in range(bpp):
                line[lane::bpp] = np.cumsum(line[lane::bpp], dtype=np.int64) & 0xFF
        elif ftype == 2:  # Up
            line += prev
        elif ftype == 3:  # Average
            # plain-int list loop: ~4x over numpy scalar indexing (each
            # line[i] access was a boxed-scalar round trip) — the
            # recurrence is spec-serial, so the win is constant-factor
            f = line.tolist()
            pv = prev.tolist()
            x = [0] * stride
            for i in range(stride):
                a = x[i - bpp] if i >= bpp else 0
                x[i] = (f[i] + ((a + pv[i]) >> 1)) & 0xFF
            line = np.array(x, dtype=np.uint8)
        elif ftype == 4:  # Paeth (same list-loop rationale as Average)
            f = line.tolist()
            pv = prev.tolist()
            x = [0] * stride
            for i in range(stride):
                a = x[i - bpp] if i >= bpp else 0
                b = pv[i]
                c = pv[i - bpp] if i >= bpp else 0
                pp = a + b - c
                pa = pp - a if pp >= a else a - pp
                pb = pp - b if pp >= b else b - pp
                pc = pp - c if pp >= c else c - pp
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                x[i] = (f[i] + pred) & 0xFF
            line = np.array(x, dtype=np.uint8)
        else:
            return None
        lines[y] = line
        prev = line

    n_samples = width * channels
    out = np.empty((height, n_samples), dtype=np.int64)
    for y in range(height):
        out[y] = _unpack_row(lines[y], bit_depth, n_samples)
    return out.reshape(height, width, channels)


def expand_palette(pixels: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Palette index plane (H, W, 1) -> RGB (H, W, 3)."""
    return palette[pixels[:, :, 0]].astype(np.int64)


def decoded_samples(decoded: dict) -> np.ndarray:
    """Canonical sample array for stats/features: palette images expand
    to RGB; everything else passes through. Shape (H, W, C), int64."""
    if decoded["color_type"] == 3:
        return expand_palette(decoded["pixels"], decoded["palette"])
    return decoded["pixels"]


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample with the floor mapping
    src = dst * src_extent // dst_extent (pure integer math — the SQL
    oracle replays it exactly)."""
    sh, sw = pixels.shape[0], pixels.shape[1]
    ys = (np.arange(height, dtype=np.int64) * sh) // height
    xs = (np.arange(width, dtype=np.int64) * sw) // width
    return pixels[np.ix_(ys, xs)]


def resize_bilinear(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resample, half-pixel-center convention
    (src = (dst + 0.5) * scale - 0.5, edges clamped — PIL/OpenCV
    default). Returns float64; callers round/cast as needed."""
    sh, sw = pixels.shape[0], pixels.shape[1]
    arr = pixels.astype(np.float64)
    fy = (np.arange(height) + 0.5) * (sh / height) - 0.5
    fx = (np.arange(width) + 0.5) * (sw / width) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, sh - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, sw - 1)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = arr[np.ix_(y0, x0)] * (1 - wx) + arr[np.ix_(y0, x1)] * wx
    bot = arr[np.ix_(y1, x0)] * (1 - wx) + arr[np.ix_(y1, x1)] * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# APNG: full-frame animations (the screen-capture / synthetic shape).
#
# APNG stores frame 0 in IDAT and later frames in fdAT chunks (a 4-byte
# sequence number + IDAT-format data), each preceded by an fcTL control
# chunk (geometry + delay + dispose/blend ops). Scope here: every frame
# covers the full canvas at (0, 0) — sub-region frames with dispose/
# blend composition return None (compositing semantics need an actual
# renderer; full-frame is what the frame-sampling pipeline consumes).
# ---------------------------------------------------------------------------


def encode_apng(
    frames: list,
    color_type: int = 0,
    bit_depth: int = 8,
    palette: np.ndarray | None = None,
    delay: tuple = (1, 10),
    filter_mode: int | str = "cycle",
) -> bytes:
    """Encode same-size frames as an APNG (frame 0 in IDAT, the rest in
    fdAT; one fcTL per frame; sequence numbers per spec)."""
    if not frames:
        raise ValueError("at least one frame required")
    if bit_depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(f"bit depth {bit_depth} invalid for color type {color_type}")
    first, width, height, channels = _flat_rows(frames[0], color_type)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    out = bytearray(_MAGIC)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    if color_type == 3:
        if palette is None:
            raise ValueError("palette required for color type 3")
        out += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    seq = 0
    for k, frame in enumerate(frames):
        rows, w, h, _ = _flat_rows(frame, color_type)
        if (w, h) != (width, height):
            raise ValueError("all frames must match the canvas size")
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delay[0], delay[1], 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        data = zlib.compress(
            _filter_stream(rows, width, height, channels, bit_depth, filter_mode), 6
        )
        if k == 0:
            out += _chunk(b"IDAT", data)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng_frames(data: bytes) -> dict | None:
    """Decode an APNG into per-frame pixel arrays.

    Returns ``{"frames": [{"pixels": (H, W, C) int64, "delay_num": int,
    "delay_den": int}, ...], "color_type": int, "bit_depth": int,
    "palette": (N, 3) uint8 | None}`` for full-frame animations, or
    None when the payload is not an APNG (no acTL), is not a PNG at
    all, uses sub-region/composited frames, or is corrupt. Palette
    animations return index planes; pass each through
    ``expand_palette`` with the shared ``palette`` as needed."""
    data = bytes(data)
    if data[:8] != _MAGIC or len(data) < 33 or data[12:16] != b"IHDR":
        return None
    try:
        width, height = struct.unpack(">II", data[16:24])
        bit_depth, color_type, comp, filt, interlace = struct.unpack(
            ">BBBBB", data[24:29]
        )
        if (
            width == 0 or height == 0 or comp != 0 or filt != 0
            or interlace != 0 or color_type not in _CHANNELS
            or bit_depth not in _VALID_DEPTHS[color_type]
            or width * height * _CHANNELS[color_type] > MAX_SAMPLES
        ):
            return None
        n_frames = None
        palette = None
        frames: list[dict] = []
        current: dict | None = None
        pos = 8
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos: pos + 4])
            ctype = data[pos + 4: pos + 8]
            payload = data[pos + 8: pos + 8 + length]
            if len(payload) < length:
                return None
            if ctype == b"acTL":
                (n_frames,) = struct.unpack(">I", payload[:4])
            elif ctype == b"PLTE":
                if length % 3 != 0 or length == 0:
                    return None
                palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
            elif ctype == b"fcTL":
                if length < 26:
                    return None
                _seq, fw, fh, fx, fy, dnum, dden, dispose, blend = struct.unpack(
                    ">IIIIIHHBB", payload[:26]
                )
                if (fw, fh, fx, fy) != (width, height, 0, 0):
                    return None  # sub-region/composited: out of scope
                current = {"delay_num": int(dnum), "delay_den": int(dden),
                           "data": bytearray()}
                frames.append(current)
            elif ctype == b"IDAT":
                if current is not None:  # frame 0 participates
                    current["data"] += payload
            elif ctype == b"fdAT":
                if current is None or length < 4:
                    return None
                current["data"] += payload[4:]  # strip sequence number
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if n_frames is None or not frames or len(frames) != n_frames:
            return None
        if color_type == 3 and palette is None:
            return None
        channels = _CHANNELS[color_type]
        if n_frames * width * height * channels > MAX_SAMPLES:
            return None  # total animation size bomb guard
        stride = (width * channels * bit_depth + 7) // 8
        out = []
        for fr in frames:
            if not fr["data"]:
                return None
            raw = _inflate_exact(bytes(fr["data"]), height * (stride + 1))
            if raw is None:
                return None
            pixels = _decode_raw(raw, width, height, bit_depth, channels)
            if pixels is None:
                return None
            if color_type == 3 and pixels.max() >= len(palette):
                return None
            out.append(
                {
                    "pixels": pixels,
                    "delay_num": fr["delay_num"],
                    "delay_den": fr["delay_den"],
                }
            )
        return {
            "frames": out,
            "color_type": int(color_type),
            "bit_depth": int(bit_depth),
            "palette": palette,
        }
    except (zlib.error, struct.error, ValueError, MemoryError):
        return None
