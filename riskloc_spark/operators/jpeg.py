"""Dependency-free baseline JPEG codec: pure numpy Huffman + DCT.

Completes the real-pixel story for all three dominant image formats
(PNG/APNG: operators/png.py; GIF: operators/gif.py). Baseline
sequential DCT JPEGs (SOF0, 8-bit, 1 or 3 components, 4:4:4 / 4:2:0 /
4:2:2 sampling, restart markers) decode to true pixels; progressive
(SOF2), arithmetic coding, and 12-bit precision return None — honestly
out of scope, stated.

- ``decode_jpeg``: marker walk (DQT/DHT/SOF0/DRI/SOS), Huffman decode
  of the entropy stream (byte-unstuffing, DC prediction per component,
  AC run-length with ZRL/EOB), dequantize + dezigzag, float IDCT,
  chroma upsample (nearest), YCbCr -> RGB (ITU-R BT.601, the JFIF
  convention). Tables always come from the FILE's own DQT/DHT segments,
  so decoding does not depend on this module's table constants.
- ``encode_jpeg``: the inverse for the synthetic gates and re-encode
  paths — 4:4:4 only, fixed example tables (ITU T.81 Annex K),
  deterministic half-up rounding at both quantize and sample stages
  (encoders legitimately differ here; ours is pinned so the DuckDB twin
  can replay constant-block round trips in closed form).

Rounding contract (the gate relies on it): quantize(x) =
floor(x / q + 0.5); final sample = clip(floor(idct + 128 + 0.5), 0,
255), where DC-only blocks take an exact-integer fast path
(dc*q00 + 1028) >> 3. For an 8x8 CONSTANT block of value v under an
ODD DC quantizer the whole pipeline collapses to the scalar
``constant_block_round_trip(v, q00)`` — replayed by the
media_jpeg_decode oracle and pinned codec-vs-formula for every v in
0..255 in the tests (odd q keeps the encoder's float-DCT epsilon away
from every floor boundary; the decode side is integer-exact).
"""
from __future__ import annotations

import struct

import numpy as np

from riskloc_spark.operators.png import MAX_SAMPLES

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU T.81 Annex K example luminance quantization table (quality ~50)
_QTABLE_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K example DC/AC Huffman tables (BITS, HUFFVAL). The decoder
# never uses these (it reads DHT from the file); the encoder writes the
# tables it uses into DHT, so even a transcription slip here cannot
# desynchronize our encode/decode pair or corrupt real-file decoding.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis (C @ block @ C.T = coefficients)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _huff_codes(bits: list, vals: list) -> dict:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical codes."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list, vals: list) -> dict:
    """(BITS, HUFFVAL) -> {(length, code): symbol} for the reader."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitStream:
    """MSB-first bit cursor over ONE unstuffed entropy segment. The
    constructor unstuffs bytes up to the next marker in a single pass
    (0xFF 0x00 -> 0xFF; markers are never consumed — ``end_pos`` points
    at the marker byte) and unpacks them to a flat bit buffer, so the
    hot path reads bits by plain bytes-indexing instead of the per-bit
    byte-refill state machine the round-7 reader ran (round 8: the
    Huffman walk was the JPEG throughput bottleneck). Restart alignment
    is a bit-index round-up; the next restart segment is a fresh
    stream at ``end_pos + 2``."""

    def __init__(self, data: bytes, pos: int):
        buf = bytearray()
        n = len(data)
        while pos < n:
            b = data[pos]
            if b == 0xFF:
                if pos + 1 < n and data[pos + 1] == 0x00:
                    buf.append(0xFF)
                    pos += 2
                    continue
                break  # marker (or truncated trailing 0xFF): stop
            buf.append(b)
            pos += 1
        self.end_pos = pos
        self.bits = (
            np.unpackbits(np.frombuffer(bytes(buf), dtype=np.uint8)).tobytes()
            if buf
            else b""
        )
        self.i = 0

    def read_bits(self, k: int) -> int | None:
        i, bits = self.i, self.bits
        if i + k > len(bits):
            return None
        v = 0
        for j in range(i, i + k):
            v = (v << 1) | bits[j]
        self.i = i + k
        return v

    def align_byte(self) -> None:
        """Drop the partial byte (restart-marker alignment): unstuffed
        byte boundaries coincide with entropy-stream byte boundaries."""
        self.i = (self.i + 7) & ~7

    def exhausted(self) -> bool:
        return self.i >= len(self.bits)


def _fast_huff_table(table: dict) -> list:
    """256-entry first-8-bits lookup for a {(length, code): symbol}
    Huffman table — codes <= 8 bits resolve in one indexed load
    (entries pack (symbol << 8) | code_length); longer codes fall back
    to the per-bit walk. The standard canonical-Huffman fast path."""
    fast: list = [None] * 256
    for (length, code), sym in table.items():
        if length <= 8:
            prefix = code << (8 - length)
            entry = (sym << 8) | length
            for t in range(1 << (8 - length)):
                fast[prefix | t] = entry
    return fast


def _receive_extend(reader: _BitStream, s: int) -> int | None:
    """JPEG RECEIVE/EXTEND: s magnitude bits -> signed value."""
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v is None:
        return None
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _decode_huff_symbol(
    reader: _BitStream, table: dict, fast: list
) -> int | None:
    bits = reader.bits
    i = reader.i
    nb = len(bits)
    if i + 8 <= nb:
        key = (
            (bits[i] << 7)
            | (bits[i + 1] << 6)
            | (bits[i + 2] << 5)
            | (bits[i + 3] << 4)
            | (bits[i + 4] << 3)
            | (bits[i + 5] << 2)
            | (bits[i + 6] << 1)
            | bits[i + 7]
        )
        entry = fast[key]
        if entry is not None:
            reader.i = i + (entry & 0xFF)
            return entry >> 8
        code = key
        for length in range(9, 17):
            if i + length > nb:
                return None
            code = (code << 1) | bits[i + length - 1]
            sym = table.get((length, code))
            if sym is not None:
                reader.i = i + length
                return sym
        return None
    code = 0
    for length in range(1, 17):
        if i + length > nb:
            return None
        code = (code << 1) | bits[i + length - 1]
        sym = table.get((length, code))
        if sym is not None:
            reader.i = i + length
            return sym
    return None


def decode_jpeg(data: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG to an (H, W, C) int64 array (C = 1 gray /
    3 RGB). Returns None for non-JPEG, progressive/arithmetic, 12-bit,
    dimension bombs, or corrupt streams."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        return None
    try:
        qtables: dict[int, np.ndarray] = {}
        htables: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        frame = None
        restart_interval = 0
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg_len,) = struct.unpack(">H", data[pos + 2: pos + 4])
            if seg_len < 2 or pos + 2 + seg_len > len(data):
                return None
            seg = data[pos + 4: pos + 2 + seg_len]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if pq != 0:
                        return None  # 16-bit tables: out of scope
                    if i + 64 > len(seg):
                        return None
                    zz = np.frombuffer(seg[i: i + 64], np.uint8).astype(np.int64)
                    q = np.zeros(64, dtype=np.int64)
                    q[_ZIGZAG] = zz
                    qtables[tq] = q.reshape(8, 8)
                    i += 64
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if i + 16 > len(seg):
                        return None
                    bits = list(seg[i: i + 16])
                    i += 16
                    nvals = sum(bits)
                    if i + nvals > len(seg):
                        return None
                    vals = list(seg[i: i + nvals])
                    i += nvals
                    htables[(tc, th)] = _huff_decode_table(bits, vals)
            elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
                precision = seg[0]
                if precision != 8:
                    return None
                height, width = struct.unpack(">HH", seg[1:5])
                nc = seg[5]
                if (
                    width == 0 or height == 0 or nc not in (1, 3)
                    or width * height * nc > MAX_SAMPLES
                ):
                    return None
                comps = []
                for c in range(nc):
                    cid = seg[6 + c * 3]
                    hv = seg[7 + c * 3]
                    comps.append(
                        {
                            "id": cid,
                            "h": hv >> 4,
                            "v": hv & 0x0F,
                            "tq": seg[8 + c * 3],
                        }
                    )
                frame = {"w": width, "h": height, "comps": comps}
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive / arithmetic: out of scope
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs = seg[1 + c * 2]
                    tt = seg[2 + c * 2]
                    comp = next(
                        (cc for cc in frame["comps"] if cc["id"] == cs), None
                    )
                    if comp is None:
                        return None
                    scan.append((comp, tt >> 4, tt & 0x0F))
                if len(scan) != len(frame["comps"]):
                    return None  # multi-scan baseline: out of scope
                return _decode_scan(
                    data, pos + 2 + seg_len, frame, scan, qtables,
                    htables, restart_interval,
                )
            pos += 2 + seg_len
        return None
    except (struct.error, IndexError, ValueError, MemoryError,
            ZeroDivisionError):
        return None


def _decode_scan(
    data, pos, frame, scan, qtables, htables, restart_interval
) -> np.ndarray | None:
    width, height, comps = frame["w"], frame["h"], frame["comps"]
    # EVERY component's sampling factors validated (a zero nibble on one
    # component would pass an hmax/vmax-only check and divide by zero)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # Padded-allocation invariant: with u16 dimensions MCU rounding
    # cannot actually push past MAX_SAMPLES when the nominal w*h*nc
    # bound held (verified at the extreme corner in the tests) — kept
    # as a cheap guard so a future format extension cannot silently
    # void the bomb bound.
    if mcux * 8 * hmax * mcuy * 8 * vmax > MAX_SAMPLES:
        return None
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
        if c["tq"] not in qtables:
            return None

    reader = _BitStream(data, pos)
    fast_tables = {key: _fast_huff_table(tbl) for key, tbl in htables.items()}
    preds = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_byte()
            if reader.exhausted():
                p = reader.end_pos
                if (
                    p + 1 < len(data)
                    and data[p] == 0xFF
                    and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    reader = _BitStream(data, p + 2)
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for k, (comp, td, ta) in enumerate(scan):
            dct = htables.get((0, td))
            act = htables.get((1, ta))
            if dct is None or act is None:
                return None
            dct_fast = fast_tables[(0, td)]
            act_fast = fast_tables[(1, ta)]
            q = qtables[comp["tq"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    s = _decode_huff_symbol(reader, dct, dct_fast)
                    if s is None or s > 11:
                        return None
                    diff = _receive_extend(reader, s)
                    if diff is None:
                        return None
                    preds[k] += diff
                    zz = np.zeros(64, dtype=np.int64)
                    zz[0] = preds[k]
                    i = 1
                    while i < 64:
                        rs = _decode_huff_symbol(reader, act, act_fast)
                        if rs is None:
                            return None
                        r, ssss = rs >> 4, rs & 0x0F
                        if ssss == 0:
                            if r == 15:  # ZRL
                                i += 16
                                continue
                            break  # EOB
                        i += r
                        if i > 63:
                            return None
                        v = _receive_extend(reader, ssss)
                        if v is None:
                            return None
                        zz[i] = v
                        i += 1
                    coeffs = np.zeros(64, dtype=np.int64)
                    coeffs[_ZIGZAG] = zz
                    if not np.any(zz[1:]):
                        # DC-only fast path (common in real JPEGs): the
                        # IDCT of a lone DC is a constant block, and
                        # integer arithmetic makes the half-up rounding
                        # EXACT — the float basis sits one ulp off on
                        # exact ties (dc*q = 4 mod 8), which would make
                        # the result machine-eps-dependent
                        val = (int(zz[0]) * int(q[0, 0]) + 1028) >> 3
                        out = np.full((8, 8), float(val))
                    else:
                        block = coeffs.reshape(8, 8) * q
                        px = _C.T @ block.astype(np.float64) @ _C
                        out = np.floor(px + 128.5)
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[k][y0: y0 + 8, x0: x0 + 8] = out

    full = []
    for k, c in enumerate(comps):
        p = np.clip(planes[k], 0, 255)
        # nearest upsample to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        return full[0].astype(np.int64)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.int64)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _encode_coef(v: int) -> tuple[int, int]:
    """value -> (size category s, s magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def encode_jpeg(
    pixels: np.ndarray,
    qtable: np.ndarray | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB as a
    baseline JPEG with the Annex K example tables (or a custom 8x8
    ``qtable`` used for every component). ``subsampling``: "444" or
    "420" (2x2 box-mean chroma, half-up rounded). Deterministic half-up
    quantization (see module docstring)."""
    pixels = np.asarray(pixels)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    height, width, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("grayscale or RGB input required")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be 444 or 420")
    q = (qtable if qtable is not None else _QTABLE_LUM.reshape(8, 8)).astype(
        np.int64
    )

    if nc == 3:
        r = pixels[:, :, 0].astype(np.float64)
        g = pixels[:, :, 1].astype(np.float64)
        b = pixels[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [pixels[:, :, 0].astype(np.float64)]

    sub = subsampling == "420" and nc == 3
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    hmax = max(h for h, _ in hv[:nc])
    vmax = max(v for _, v in hv[:nc])
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for k, p in enumerate(planes):
        h_k, v_k = hv[k]
        if sub and k > 0:
            # 2x2 box mean, half-up; pad odd dims by edge replication
            ph = (height + 1) // 2 * 2
            pw = (width + 1) // 2 * 2
            tmp = np.empty((ph, pw))
            tmp[:height, :width] = p
            tmp[:height, width:] = p[:, -1:]
            tmp[height:, :] = tmp[height - 1: height, :]
            p = np.floor(
                (tmp[0::2, 0::2] + tmp[0::2, 1::2]
                 + tmp[1::2, 0::2] + tmp[1::2, 1::2]) / 4 + 0.5
            )
        tw, th = mcux * 8 * h_k, mcuy * 8 * v_k
        pp = np.empty((th, tw))
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[:sh, sw:] = p[:, -1:]  # edge-replicate padding
        pp[sh:, :] = pp[sh - 1: sh, :]
        padded.append(pp)

    dc_codes = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    writer = _BitWriter()
    preds = [0] * nc

    def write_block(block, k):
        coefs = _C @ (block - 128.0) @ _C.T
        qq = np.floor(coefs / q + 0.5).astype(np.int64).reshape(-1)
        zz = qq[_ZIGZAG]  # natural order -> zigzag scan order
        diff = int(zz[0]) - preds[k]
        preds[k] = int(zz[0])
        s, bits = _encode_coef(diff)
        code, length = dc_codes[s]
        writer.write(code, length)
        if s:
            writer.write(bits, s)
        run = 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s, bits = _encode_coef(v)
            code, length = ac_codes[(run << 4) | s]
            writer.write(code, length)
            writer.write(bits, s)
            run = 0
        if run:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)

    for my in range(mcuy):
        for mx in range(mcux):
            for k in range(nc):
                h_k, v_k = hv[k]
                for by in range(v_k):
                    for bx in range(h_k):
                        y0 = (my * v_k + by) * 8
                        x0 = (mx * h_k + bx) * 8
                        write_block(
                            padded[k][y0: y0 + 8, x0: x0 + 8], k
                        )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz_q = q.reshape(-1)[_ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zz_q))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    for c in range(nc):
        h_c, v_c = hv[c]
        sof += bytes([c + 1, (h_c << 4) | v_c, 0])  # all on qtable 0
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def constant_block_round_trip(v: int, q00: int) -> int:
    """The closed-form scalar the whole pipeline collapses to for an
    8x8 constant block of value ``v`` under an ODD DC quantizer
    ``q00`` — the media_jpeg_decode oracle's formula, kept here so
    tests can pin codec == formula for every v in 0..255.

    Odd q00 matters: the encoder quantizes with floor(x/q + 0.5) over
    the FLOAT DCT coefficient, and for odd q the expression never
    lands on an exact integer for any v (2*(8v-1024) = -q mod 2q has
    no even=odd solution), so the DCT's one-ulp epsilon cannot flip
    the floor. The decode side is exact by construction (integer
    DC-only fast path)."""
    if q00 % 2 == 0:
        raise ValueError("q00 must be odd (rounding-tie-free contract)")
    dc = int(np.floor((8 * v - 1024) / q00 + 0.5))
    return int(min(max((dc * q00 + 1028) >> 3, 0), 255))
