"""FLAC decode (core/flacdec.py): CRC algorithms pinned to published
check vectors, encode/decode round-trips across the full surface matrix
(subframe strategies × stereo decorrelations × Rice/Rice2 × partition
orders × wasted bits × block sizes), LPC with explicit quantized
coefficients, defensive guards (truncation, bit flips, decode bombs),
and the analytic feature invariants the oracle pair replays.

Reference parity: the reference treats media as opaque library-decoded
payloads (reference docext/core/utils.py:13-15); this engine decodes
the real bytes itself.
"""
from __future__ import annotations

import math
import random

import pytest

from docext_spark.core import flacdec


def test_crc_published_check_vectors():
    """CRC-8 (poly 0x07, init 0) and CRC-16 (poly 0x8005, init 0,
    unreflected — aka CRC-16/UMTS) over the standard '123456789' check
    string: published check values 0xF4 and 0xFEE8. The FLAC spec
    mandates exactly these parameterizations for the frame-header and
    frame CRCs."""
    assert flacdec._crc8(b"123456789") == 0xF4
    assert flacdec._crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("strategy", ["verbatim", "constant-or-verbatim",
                                      "fixed", "lpc"])
def test_roundtrip_matrix(strategy):
    rng = random.Random(9)
    for stereo in ("independent", "left_side", "right_side", "mid_side"):
        for po, rice2, wasted in ((0, False, 0), (2, True, 0),
                                  (2, False, 2), (0, True, 1)):
            ch, n, lim = 2, 640, 1 << 13
            samples = [rng.randrange(-lim, lim) << wasted
                       for _ in range(n * ch)]
            p = flacdec.encode_flac(
                44100, ch, 16, samples, block_size=256, strategy=strategy,
                stereo=stereo, partition_order=po, rice2=rice2,
                wasted=wasted)
            assert flacdec.decode_flac(p) == (44100, ch, 16, samples)


def test_mono_and_8bit_and_odd_blocksize():
    rng = random.Random(3)
    for bps in (8, 16):
        lim = 1 << (bps - 1)
        samples = [rng.randrange(-lim, lim) for _ in range(777)]
        # 230 is not in the block-size code table: explicit 16-bit path;
        # the last frame is short (code 7 too)
        p = flacdec.encode_flac(22050, 1, bps, samples, block_size=230,
                                strategy="fixed")
        assert flacdec.decode_flac(p) == (22050, 1, bps, samples)


def test_lpc_explicit_coefficients_and_partitions():
    """LPC exactness never depends on coefficient choice — residuals are
    computed with the same arithmetic-shift formula the decoder replays;
    partition order 3 splits every block into 8 Rice partitions."""
    sm = [int(2000 * math.sin(i / 7) + 300 * math.cos(i / 3))
          for i in range(3000)]
    p = flacdec.encode_flac(22050, 1, 16, sm, block_size=1024,
                            strategy="lpc",
                            lpc_coeffs=([5, -4, 1], 5, 1),
                            partition_order=3)
    assert flacdec.decode_flac(p) == (22050, 1, 16, sm)


def test_fixed_prediction_actually_compresses():
    sm = [int(1000 * math.sin(i / 10)) for i in range(4000)]
    p = flacdec.encode_flac(16000, 1, 16, sm, block_size=1024,
                            strategy="fixed")
    assert len(p) < 2 * len(sm) * 0.45
    assert flacdec.decode_flac(p) == (16000, 1, 16, sm)


def test_constant_subframe_and_silence():
    samples = [0] * 500
    p = flacdec.encode_flac(8000, 1, 16, samples, block_size=192,
                            strategy="constant-or-verbatim")
    assert flacdec.decode_flac(p) == (8000, 1, 16, samples)
    f = flacdec.flac_features(p)
    assert f == (8000, 1, 500, 62, 0, 0,
                 sum(32768 * (i + 1) for i in range(500)))


def test_defensive_truncation_and_bitflips():
    rng = random.Random(17)
    good = flacdec.encode_flac(
        8000, 1, 8, [rng.randrange(-128, 128) for _ in range(300)],
        strategy="fixed")
    assert flacdec.decode_flac(good) is not None
    for cut in range(0, len(good), 3):
        r = flacdec.decode_flac(good[:cut])
        assert r is None or isinstance(r, tuple)
    rejected = 0
    for _ in range(200):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 0xFF
        r = flacdec.decode_flac(bytes(b))
        assert r is None or isinstance(r, tuple)
        rejected += r is None
    # CRC-8 + CRC-16 + structural checks catch the overwhelming majority
    assert rejected > 150


def test_decode_bomb_guard():
    """A STREAMINFO claiming a huge total-sample count is rejected
    before any frame allocates."""
    p = bytearray(flacdec.encode_flac(8000, 1, 16, [1] * 64))
    # total_samples lives in the low 36 bits of STREAMINFO[10:18]
    hi = int.from_bytes(p[18:26], "big")
    hi = (hi & ~((1 << 36) - 1)) | (flacdec.MAX_SAMPLES + 1)
    p[18:26] = hi.to_bytes(8, "big")
    assert flacdec.decode_flac(bytes(p)) is None


def test_features_match_wav_invariants():
    """flac_features computes the SAME invariants as wavpcm.wav_features
    — encode the same samples both ways and compare."""
    from docext_spark.core import wavpcm
    rng = random.Random(7)
    for ch in (1, 2):
        samples = [rng.randrange(-2048, 2048) for _ in range(ch * 400)]
        wavf = wavpcm.wav_features(
            wavpcm.encode_wav(8000, ch, samples, bits=16))
        flacf = flacdec.flac_features(
            flacdec.encode_flac(8000, ch, 16, samples, strategy="fixed"))
        assert wavf == flacf


def test_non_flac_payloads_yield_none():
    assert flacdec.decode_flac(None) is None
    assert flacdec.decode_flac(b"") is None
    assert flacdec.decode_flac(b"RIFF....WAVE" + bytes(64)) is None
    assert flacdec.decode_flac(b"fLaC" + bytes(10)) is None
