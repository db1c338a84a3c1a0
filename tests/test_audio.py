"""Audio (RIFF/WAVE) modality: codec round trips, chunk-walk
robustness, and the Spark-side feature operators against direct numpy
on the synthesis contract."""
import numpy as np
import pytest

from riskloc_spark.operators.audio import (
    MAX_AUDIO_BYTES,
    audio_features,
    audio_frame_energy,
    decode_audio,
    encode_wav,
    parse_wav,
    resample_audio_features,
    synthesize_wav_corpus,
    _synth_params,
    _synth_samples,
    _synth_wav,
)


def rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# codec (pure python, no spark)
# ---------------------------------------------------------------------------

def test_roundtrip_mono16():
    s = rng(1).integers(-32768, 32768, size=333).astype(np.int16)
    dec = parse_wav(encode_wav(s, 8000))
    assert dec["sample_rate"] == 8000
    assert dec["n_channels"] == 1
    assert dec["bits"] == 16
    assert dec["n_samples"] == 333
    np.testing.assert_array_equal(dec["samples"][:, 0], s.astype(np.int32))


def test_roundtrip_stereo16_interleave():
    s = rng(2).integers(-32768, 32768, size=(100, 2)).astype(np.int16)
    dec = parse_wav(encode_wav(s, 44100))
    assert dec["n_channels"] == 2
    np.testing.assert_array_equal(dec["samples"], s.astype(np.int32))


def test_roundtrip_pcm8_bias():
    s = rng(3).integers(-128, 128, size=57)
    dec = parse_wav(encode_wav(s, 16000, bits=8))
    assert dec["bits"] == 8
    np.testing.assert_array_equal(dec["samples"][:, 0], s)


def test_odd_data_chunk_pad():
    # 8-bit mono with odd sample count -> odd data chunk, pad byte
    s = rng(4).integers(-128, 128, size=7)
    raw = encode_wav(s, 8000, bits=8)
    assert len(raw) % 2 == 0
    dec = parse_wav(raw)
    assert dec["n_samples"] == 7


def test_list_chunk_walk_and_odd_padding():
    s = np.arange(10, dtype=np.int16)
    # odd LIST body exercises the pad-byte skip before data
    raw = encode_wav(s, 8000, list_info=b"ISFTabc")
    dec = parse_wav(raw)
    assert dec is not None and dec["n_samples"] == 10
    np.testing.assert_array_equal(dec["samples"][:, 0], s.astype(np.int32))


def test_unknown_chunk_skipped():
    s = np.arange(5, dtype=np.int16)
    raw = encode_wav(s, 8000)
    # splice an unknown chunk between WAVE and fmt
    import struct
    junk = b"junk" + struct.pack("<I", 3) + b"xyz" + b"\x00"
    patched = raw[:12] + junk + raw[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec = parse_wav(patched)
    assert dec is not None and dec["n_samples"] == 5


def test_rejects_garbage_truncated_nonpcm_oversize():
    s = np.arange(20, dtype=np.int16)
    raw = encode_wav(s, 8000)
    assert parse_wav(b"not a wav at all") is None
    assert parse_wav(raw[:30]) is None  # truncated mid-chunk
    # flip the fmt audio_format field to 2 (ADPCM) -> rejected
    import struct
    fpos = raw.index(b"fmt ") + 8
    bad = raw[:fpos] + struct.pack("<H", 2) + raw[fpos + 2 :]
    assert parse_wav(bad) is None
    assert parse_wav(raw, budget=10) is None
    assert MAX_AUDIO_BYTES >= 1 << 20


def test_trailing_partial_sample_dropped():
    s = np.arange(4, dtype=np.int16)
    raw = encode_wav(s, 8000)
    import struct
    # declare one extra byte in the data chunk and append it
    dpos = raw.index(b"data")
    (size,) = struct.unpack("<I", raw[dpos + 4 : dpos + 8])
    patched = (
        raw[: dpos + 4]
        + struct.pack("<I", size + 1)
        + raw[dpos + 8 : dpos + 8 + size]
        + b"\x7f"
    )
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec = parse_wav(patched)
    assert dec["n_samples"] == 4


# ---------------------------------------------------------------------------
# synthesis contract
# ---------------------------------------------------------------------------

def test_synth_contract_matches_decode():
    for d in [0, 1, 2, 3, 6, 7, 13, 28, 29, 101, 1000003]:
        sr, n, ch, p = _synth_params(d)
        want = _synth_samples(d)
        assert want.shape == (n, ch)
        assert np.abs(want).max() < 32768
        dec = parse_wav(_synth_wav(d))
        assert dec["sample_rate"] == sr
        assert dec["n_channels"] == ch
        assert dec["n_samples"] == n
        np.testing.assert_array_equal(dec["samples"], want)


# ---------------------------------------------------------------------------
# spark operators
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wav_corpus(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "media_id")
    return synthesize_wav_corpus(ids).cache()


def test_decode_audio_meta(spark, wav_corpus):
    rows = {r["media_id"]: r for r in decode_audio(wav_corpus).collect()}
    assert len(rows) == 40
    for d in range(40):
        sr, n, ch, _ = _synth_params(d)
        r = rows[d]
        assert (r["sample_rate"], r["n_channels"], r["bits"]) == (sr, ch, 16)
        assert r["n_samples"] == n
        assert r["duration_us"] == n * 1_000_000 // sr


def test_decode_audio_null_row_for_garbage(spark):
    df = spark.createDataFrame(
        [(7, bytearray(b"nope"))], "media_id long, payload binary"
    )
    r = decode_audio(df).collect()[0]
    assert r["media_id"] == 7 and r["sample_rate"] is None


def _np_features(d, stride=1):
    s = _synth_samples(d)[::stride]
    out = {}
    for c in range(s.shape[1]):
        v = s[:, c]
        nonneg = v >= 0
        out[c] = (
            int(v.size),
            int((v * v).sum()),
            int(np.abs(v).sum()),
            int(np.abs(v).max()),
            int(np.count_nonzero(nonneg[1:] != nonneg[:-1])),
        )
    return out


@pytest.mark.parametrize("stride", [1, 3])
def test_audio_features_match_numpy(spark, wav_corpus, stride):
    got = {}
    res = (
        audio_features(wav_corpus, stride=stride)
        if stride == 1
        else resample_audio_features(wav_corpus, stride)
    )
    for r in res.collect():
        got[(r["media_id"], r["channel"])] = (
            r["n_samples"],
            r["energy"],
            r["sum_abs"],
            r["peak"],
            r["zero_crossings"],
        )
    n_rows = 0
    for d in range(40):
        for c, want in _np_features(d, stride).items():
            assert got[(d, c)] == want
            n_rows += 1
    assert len(got) == n_rows


def test_audio_frames(spark, wav_corpus):
    res = audio_frame_energy(wav_corpus, frame_len=512)
    by_id = {}
    for r in res.collect():
        by_id.setdefault((r["media_id"], r["channel"]), []).append(r)
    for d in [0, 5, 13]:
        _sr, n, ch, _ = _synth_params(d)
        s = _synth_samples(d)
        for c in range(ch):
            frames = sorted(by_id[(d, c)], key=lambda r: r["frame_idx"])
            assert len(frames) == (n + 511) // 512
            assert sum(f["frame_n"] for f in frames) == n
            # spot-check frame 1 and the partial tail
            for fr in (frames[1], frames[-1]):
                v = s[fr["frame_idx"] * 512 : (fr["frame_idx"] + 1) * 512, c]
                assert fr["frame_n"] == v.size
                assert fr["energy"] == int((v * v).sum())
                assert fr["peak"] == int(np.abs(v).max())


def test_null_payload_rows_survive(spark):
    df = spark.createDataFrame(
        [(3, None)], "media_id long, payload binary"
    )
    r = decode_audio(df).collect()[0]
    assert r["media_id"] == 3 and r["sample_rate"] is None
    assert audio_features(df).collect() == []


def test_chunk_past_declared_riff_end_rejected():
    import struct
    s = np.arange(8, dtype=np.int16)
    raw = encode_wav(s, 8000)
    # shrink the declared RIFF size so the data chunk straddles it
    bad = raw[:4] + struct.pack("<I", len(raw) - 8 - 6) + raw[8:]
    assert parse_wav(bad) is None


def test_synth_noise_no_int64_overflow_at_large_ids():
    # d * 2654435761 wraps int64 negative past d ~ 3.5e9, where numpy's
    # sign-of-divisor % diverges from DuckDB's sign-of-dividend %; the
    # (d % 4096) reduction is congruent mod 4096 so values are identical
    # to exact big-int arithmetic at ANY id
    for d in [3_500_000_000, 2**33 + 5, 2**62 // 2654435761 + 7]:
        s = _synth_samples(d)
        _sr, n, ch, p = _synth_params(d)
        # exact arbitrary-precision replay of the contract on a sample
        for i in [0, 1, p, n - 1]:
            for c in range(ch):
                sq = 6000 if (i // p) % 2 == 0 else -6000
                noise = (d * 2654435761 + c * 97 + i * 48271) % 4096 - 2048
                assert int(s[i, c]) == sq + noise, (d, i, c)


def test_audio_features_skips_empty_data_chunk(spark):
    # a decodable WAV whose data chunk is empty has no signal: the
    # operator must emit NO row (the SQL oracle's range over n samples
    # emits none), not a zeros row
    empty = encode_wav(np.zeros((0, 1), dtype=np.int16), 8000)
    dec = parse_wav(empty)
    assert dec is not None and dec["n_samples"] == 0
    df = spark.createDataFrame([(1, bytearray(empty))],
                               "media_id long, payload binary")
    assert audio_features(df).count() == 0
    assert resample_audio_features(df, 3).count() == 0


# ---------------------------------------------------------------------------
# energy-gradient fingerprint + audio near-dup (round 11)
# ---------------------------------------------------------------------------

def test_audio_fingerprint_gain_invariance_and_near_dup(spark):
    """The fingerprint is invariant under gain; a lightly-noised copy
    sits within a few bits; unrelated signals are far; pairs come from
    the banded matcher per channel."""
    import numpy as np

    from riskloc_spark.operators.audio import (
        audio_fingerprint,
        audio_near_dup,
        encode_wav,
    )

    rng = np.random.default_rng(21)
    n = 512 * 20
    base = (rng.standard_normal(n) * 3000).astype(np.int64)[:, None]
    half = (base * 0.5).astype(np.int64)          # gain change
    noisy = base + rng.integers(-30, 31, base.shape)
    other = (rng.standard_normal(n) * 3000).astype(np.int64)[:, None]
    rows = [
        (0, bytearray(encode_wav(np.clip(base, -32768, 32767), 8000))),
        (1, bytearray(encode_wav(np.clip(half, -32768, 32767), 8000))),
        (2, bytearray(encode_wav(np.clip(noisy, -32768, 32767), 8000))),
        (3, bytearray(encode_wav(np.clip(other, -32768, 32767), 8000))),
        (4, bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    fp = {r["media_id"]: (r["fingerprint"], r["n_bits"])
          for r in audio_fingerprint(df).collect()}
    assert set(fp) == {0, 1, 2, 3}
    assert all(v[1] == 19 for v in fp.values())

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(fp[0][0], fp[1][0]) == 0          # gain-invariant
    assert ham(fp[0][0], fp[2][0]) <= 3          # near-dup
    assert ham(fp[0][0], fp[3][0]) > 5           # unrelated
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in audio_near_dup(df, max_hamming=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_audio_fingerprint_short_signal_no_row(spark):
    import numpy as np

    from riskloc_spark.operators.audio import (
        audio_fingerprint,
        encode_wav,
    )

    one_frame = np.ones((100, 1), dtype=np.int64) * 5
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(one_frame, 8000)))],
        "media_id long, payload binary",
    )
    assert audio_fingerprint(df).count() == 0
