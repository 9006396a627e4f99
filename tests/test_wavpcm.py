"""WAV/PCM waveform decode (core/wavpcm.py): encode↔decode roundtrips,
defensive edges, and the audio_features operator over natively-built
payloads."""
from __future__ import annotations

from pyspark.sql import functions as F

from docext_spark.core import wavpcm


def _saw(n, seed=0):
    return [((i * 997 + seed * 11) % 4096) - 2048 for i in range(n)]


def test_roundtrip_16bit_mono():
    s = _saw(300)
    out = wavpcm.decode_wav(wavpcm.encode_wav(8000, 1, s))
    assert out == (8000, 1, 16, s)


def test_roundtrip_16bit_stereo_and_8bit():
    s = _saw(200, seed=3)
    assert wavpcm.decode_wav(wavpcm.encode_wav(44100, 2, s)) \
        == (44100, 2, 16, s)
    s8 = [v % 256 - 128 for v in s]
    assert wavpcm.decode_wav(wavpcm.encode_wav(16000, 1, s8, bits=8)) \
        == (16000, 1, 8, s8)


def test_defensive_returns_none():
    good = wavpcm.encode_wav(8000, 1, _saw(50))
    assert wavpcm.decode_wav(None) is None
    assert wavpcm.decode_wav(b"") is None
    assert wavpcm.decode_wav(b"RIFFjunkjunk") is None
    assert wavpcm.decode_wav(good[:20]) is None          # truncated
    # non-PCM format tag rejected (compressed audio is codec territory)
    bad = bytearray(good)
    bad[20] = 3                                          # fmt tag -> float
    assert wavpcm.decode_wav(bytes(bad)) is None
    # 24-bit rejected
    deep = bytearray(good)
    deep[34] = 24
    assert wavpcm.decode_wav(bytes(deep)) is None


def test_wav_features_analytic():
    s = _saw(100, seed=7)
    f = wavpcm.wav_features(wavpcm.encode_wav(8000, 1, s))
    rate, ch, n_frames, dur, peak, zc, cs = f
    assert (rate, ch, n_frames, dur) == (8000, 1, 100, 100 * 1000 // 8000)
    assert peak == max(abs(v) for v in s)
    assert zc == sum(1 for i in range(1, 100) if s[i - 1] * s[i] < 0) > 0
    assert cs == sum((v + 32768) * (i + 1) for i, v in enumerate(s))


def test_zero_crossings_are_per_channel():
    """Review r4: interleaved counting saw a bogus crossing at every L/R
    boundary of a stereo file. Constant L=+100 / R=-100 has ZERO physical
    crossings; a genuinely alternating mono signal keeps its count."""
    stereo = [100, -100] * 50
    f = wavpcm.wav_features(wavpcm.encode_wav(8000, 2, stereo))
    assert f[1] == 2 and f[5] == 0          # channels=2, zero_crossings=0
    mono_alt = [100 if i % 2 == 0 else -100 for i in range(100)]
    f2 = wavpcm.wav_features(wavpcm.encode_wav(8000, 1, mono_alt))
    assert f2[5] == 99
    # per-channel crossings in a stereo file are still counted
    stereo_x = [100, 7, -100, 7] * 25       # L alternates, R constant +7
    f3 = wavpcm.wav_features(wavpcm.encode_wav(8000, 2, stereo_x))
    assert f3[5] == 49


def test_audio_features_operator_native_fixture(spark):
    from docext_spark.operators.multimodal import (audio_features,
                                                   wav_pcm_fixture_hex)
    media = spark.range(6).select(
        F.col("id").alias("media_id"),
        F.unhex(wav_pcm_fixture_hex(
            F.col("id"), (F.lit(50) + F.col("id") % 200).cast("int")))
         .alias("payload"))
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    for seed in range(6):
        s = _saw(50 + seed % 200, seed)
        r = got[seed]
        assert (r["sample_rate"], r["n_channels"]) == (8000, 1)
        assert r["n_frames"] == len(s)
        assert r["peak"] == max(abs(v) for v in s)
        assert r["zero_crossings"] == sum(
            1 for i in range(1, len(s)) if s[i - 1] * s[i] < 0)
        assert r["amp_checksum"] == sum(
            (v + 32768) * (i + 1) for i, v in enumerate(s))


def test_audio_features_undecodable_yields_nulls(spark):
    import pandas as pd
    from docext_spark.operators.multimodal import audio_features
    media = spark.createDataFrame(
        pd.DataFrame([(0, b"not audio"), (1, None)],
                     columns=["media_id", "payload"]),
        "media_id long, payload binary")
    got = audio_features(media).collect()
    assert all(r["sample_rate"] is None and r["amp_checksum"] is None
               for r in got)


def test_zero_sample_rate_rejected():
    """A crafted fmt chunk with sample_rate=0 must decode to None, never
    reach duration math (ADVICE r4: ZeroDivisionError escaped the scan)."""
    import struct

    from docext_spark.core import wavpcm
    b = bytearray(wavpcm.encode_wav(8000, 1, [1, -1, 2]))
    # sample_rate lives at fmt-body offset 4 -> file offset 12+8+4 = 24
    b[24:28] = struct.pack("<I", 0)
    assert wavpcm.decode_wav(bytes(b)) is None
    assert wavpcm.wav_features(bytes(b)) is None
