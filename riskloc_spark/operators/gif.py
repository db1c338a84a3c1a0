"""Dependency-free GIF pixel codec: pure-Python LZW + numpy.

Completes the real-pixel story for the second animated format (PNG/APNG
live in operators/png.py): GIF's entropy stage is LZW with variable
code widths — ~80 lines of Python — so full pixel decode needs no
external codec either.

- ``decode_gif_frames``: logical screen descriptor, global/local color
  tables, per-frame Graphic Control Extensions (delay, transparency),
  image descriptors (sub-region geometry + interlace), and the LZW
  index stream. Frames are returned UNCOMPOSITED — each carries its
  geometry, index plane, effective palette, delay, and transparency
  index; disposal-method compositing belongs to a renderer, not a data
  pipeline. Returns None for non-GIF or corrupt payloads.
- ``encode_gif``: the inverse for full-canvas frames (what the
  synthetic gates and re-encode paths need) — LZW encoder, sub-block
  framing, GCE per frame.
- ``expand_gif_palette``: index plane -> RGB via the frame's palette.

Bomb guard mirrors png.MAX_SAMPLES: declared dimensions are checked
before any allocation, and the LZW decoder stops the moment it has
produced the expected number of indices.
"""
from __future__ import annotations

import struct

import numpy as np

from riskloc_spark.operators.png import MAX_SAMPLES

_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray | None:
    """GIF-variant LZW: variable code width starting min_code_size+1,
    LSB-first bit packing, clear/EOI codes. Stops after ``expected``
    indices (bomb guard); returns None on malformed streams."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as index arrays: entry -> (prefix entry | -1, last byte)
    prefix = [-1] * (clear + 2)
    last = list(range(clear)) + [0, 0]
    out = np.empty(expected, dtype=np.int64)
    n_out = 0
    prev_code = -1
    acc = 0
    acc_bits = 0
    pos = 0

    def entry_bytes(code: int) -> list[int]:
        chain = []
        while code != -1:
            chain.append(last[code])
            code = prefix[code]
        chain.reverse()
        return chain

    while True:
        while acc_bits < width:
            if pos >= len(data):
                # stream ended without EOI: accept iff output complete
                return out if n_out == expected else None
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        acc_bits -= width

        if code == clear:
            prefix = [-1] * (clear + 2)
            last = list(range(clear)) + [0, 0]
            width = min_code_size + 1
            prev_code = -1
            continue
        if code == eoi:
            return out if n_out == expected else None
        if prev_code == -1:
            if code >= clear:
                return None  # first code must be a literal
            if n_out >= expected:
                return None
            out[n_out] = code
            n_out += 1
            prev_code = code
            continue
        if code < len(prefix):
            seq = entry_bytes(code)
        elif code == len(prefix):
            seq = entry_bytes(prev_code)
            seq.append(seq[0])  # KwKwK case
        else:
            return None
        if n_out + len(seq) > expected:
            return None  # more indices than the frame admits
        out[n_out: n_out + len(seq)] = seq
        n_out += len(seq)
        if len(prefix) < (1 << _MAX_CODE_WIDTH):
            prefix.append(prev_code)
            last.append(seq[0])
            # width-growth sync (verified against the published sample
            # stream): the decoder grows when its next-free code hits
            # 2^width; the ENCODER — whose table runs one entry ahead
            # at every stream position — grows only when its next-free
            # EXCEEDS 2^width (see _lzw_encode). Same convention as the
            # classic giflib pair.
            if len(prefix) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev_code = code
        if n_out == expected:
            # drain: a well-formed stream ends with EOI; accept either way
            return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (clear at start, EOI at end)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, width: int):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run: tuple = ()
    for v in map(int, indices):
        cand = run + (v,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            # grow when next-free EXCEEDS 2^width — one entry later
            # than the decoder's rule, because our table runs one
            # entry ahead of the decoder's at every stream position
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        run = (v,)
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int):
    """Concatenate sub-blocks; returns (payload, next_pos) or None."""
    out = bytearray()
    while True:
        if pos >= len(data):
            return None
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > len(data):
            return None
        out += data[pos: pos + size]
        pos += size


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif_frames(data: bytes) -> dict | None:
    """Decode a GIF payload into uncomposited frames.

    Returns ``{"width": int, "height": int, "frames": [{"x", "y",
    "w", "h", "indices": (h, w) int64, "palette": (N, 3) uint8,
    "delay_ms": int, "transparent_idx": int | None,
    "interlaced": bool}, ...]}`` or None for non-GIF/corrupt payloads.
    ``palette`` is the frame's effective table (local when present,
    else global)."""
    data = bytes(data)
    if data[:6] not in _MAGICS or len(data) < 13:
        return None
    try:
        width, height = struct.unpack("<HH", data[6:10])
        if width == 0 or height == 0 or width * height > MAX_SAMPLES:
            return None
        flags = data[10]
        pos = 13
        global_pal = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            if pos + 3 * n > len(data):
                return None
            global_pal = np.frombuffer(
                data[pos: pos + 3 * n], np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        frames = []
        delay_ms = 0
        transparent = None
        total_samples = 0  # LZW expands ~1000x: bound the ANIMATION, not
        # just each frame, or a small multi-frame payload decodes to GBs
        while pos < len(data):
            block = data[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                if pos + 2 > len(data):
                    return None
                label = data[pos + 1]
                if label == 0xF9 and pos + 7 <= len(data) and data[pos + 2] == 4:
                    gflags = data[pos + 3]
                    (delay,) = struct.unpack("<H", data[pos + 4: pos + 6])
                    delay_ms = int(delay) * 10
                    transparent = (
                        int(data[pos + 6]) if gflags & 0x01 else None
                    )
                nxt = _read_sub_blocks(data, pos + 2)
                if nxt is None:
                    return None
                _, pos = nxt
            elif block == 0x2C:  # image descriptor
                if pos + 10 > len(data):
                    return None
                fx, fy, fw, fh = struct.unpack("<HHHH", data[pos + 1: pos + 9])
                lflags = data[pos + 9]
                pos += 10
                if fw == 0 or fh == 0 or fw * fh > MAX_SAMPLES:
                    return None
                total_samples += fw * fh
                if total_samples > MAX_SAMPLES:
                    return None
                pal = global_pal
                if lflags & 0x80:
                    n = 2 << (lflags & 0x07)
                    if pos + 3 * n > len(data):
                        return None
                    pal = np.frombuffer(
                        data[pos: pos + 3 * n], np.uint8
                    ).reshape(-1, 3)
                    pos += 3 * n
                if pal is None:
                    return None
                if pos >= len(data):
                    return None
                min_code_size = data[pos]
                pos += 1
                if not 2 <= min_code_size <= 11:
                    return None
                nxt = _read_sub_blocks(data, pos)
                if nxt is None:
                    return None
                lzw, pos = nxt
                indices = _lzw_decode(lzw, min_code_size, fw * fh)
                if indices is None or indices.max() >= len(pal):
                    return None
                rows = indices.reshape(fh, fw)
                interlaced = bool(lflags & 0x40)
                if interlaced:
                    rows = _deinterlace(rows)
                frames.append(
                    {
                        "x": int(fx), "y": int(fy), "w": int(fw),
                        "h": int(fh), "indices": rows, "palette": pal,
                        "delay_ms": delay_ms,
                        "transparent_idx": transparent,
                        "interlaced": interlaced,
                    }
                )
                delay_ms, transparent = 0, None  # GCE applies to ONE image
            else:
                return None
        if not frames:
            return None
        return {"width": int(width), "height": int(height), "frames": frames}
    except (struct.error, ValueError, MemoryError):
        return None


def encode_gif(
    frames: list,
    palette: np.ndarray,
    delay_ms: int = 0,
    interlace: bool = False,
) -> bytes:
    """Encode full-canvas index-plane frames as a GIF. ``palette`` is a
    (N, 3) uint8 global table; N must be a power of two (GIF table
    sizes are 2^(k+1)); 2-entry tables are padded to 4 internally
    (the LZW minimum code size is 2)."""
    if not frames:
        raise ValueError("at least one frame required")
    palette = np.asarray(palette, dtype=np.uint8)
    if len(palette) == 2:
        palette = np.vstack([palette, np.zeros((2, 3), np.uint8)])
    n = len(palette)
    if n < 4 or n & (n - 1):
        raise ValueError("palette size must be a power of two >= 2")
    k = n.bit_length() - 2  # 2 << k == n
    h, w = np.asarray(frames[0]).shape
    min_code_size = max(2, n.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | k, 0, 0])  # global table flag + size
    out += np.asarray(palette, dtype=np.uint8).tobytes()
    for frame in frames:
        arr = np.asarray(frame)
        if arr.shape != (h, w):
            raise ValueError("all frames must match the canvas size")
        if delay_ms:
            out += bytes([0x21, 0xF9, 4, 0])
            out += struct.pack("<H", delay_ms // 10)
            out += bytes([0, 0])
        out += bytes([0x2C])
        out += struct.pack("<HHHH", 0, 0, w, h)
        rows = arr
        if interlace:
            ordered = []
            for start, step in _INTERLACE_PASSES:
                ordered.extend(range(start, h, step))
            rows = arr[ordered]
            out += bytes([0x40])
        else:
            out += bytes([0])
        out += bytes([min_code_size])
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), min_code_size))
    out += bytes([0x3B])
    return bytes(out)


def expand_gif_palette(frame: dict) -> np.ndarray:
    """Frame index plane -> (h, w, 3) int64 RGB via its palette."""
    return frame["palette"][frame["indices"]].astype(np.int64)
