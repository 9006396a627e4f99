"""Pure-Python WAV/PCM waveform decode — stdlib only, no audio libraries.

The audio half of the multimodal decode story (PNG pixels: core/pngpix.py):
a RIFF/WAVE container with integer PCM needs no codec at all — the header
is fixed-offset little-endian fields and the data chunk IS the samples.
That covers the format a training-data pipeline actually emits for raw
audio; compressed codecs (mp3/aac/opus) remain honestly out of scope and
return None (route to a codec fleet; a 100TB scan must never die on one
blob).

Scope: format tag 1 (integer PCM), 8-bit unsigned or 16-bit signed,
any channel count / sample rate. Everything else → None.
"""
from __future__ import annotations

import struct


def decode_wav(payload: bytes | None):
    """(sample_rate, n_channels, bits, samples) with ``samples`` the
    interleaved integer samples (16-bit: signed, 8-bit: centered by -128
    so both widths yield zero-mean-style values), or None."""
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) < ln:
            return None
        if cid == b"fmt ":
            if ln < 16:
                return None
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits not in (8, 16):
                return None
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)        # RIFF chunks are word-aligned
    # `not rate` (not `rate is None`): a crafted fmt chunk with
    # sample_rate=0 must be rejected here, or downstream duration math
    # (n_frames * 1000 // rate) divides by zero inside a Spark task
    if not rate or data is None or not channels:
        return None
    if bits == 16:
        if len(data) % 2:
            return None
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    else:
        samples = [b - 128 for b in data]
    return (rate, channels, bits, samples)


def wav_features(payload: bytes | None, checksum_offset: int = 32768):
    """Analytic waveform features from a real decode, or None:
    (sample_rate, n_channels, n_frames, duration_ms, peak, zero_crossings,
    amp_checksum). All pure integer arithmetic so a SQL oracle can replay
    them from the sample generator without parsing a byte."""
    dec = decode_wav(payload)
    if dec is None:
        return None
    rate, channels, _, samples = dec
    n_frames = len(samples) // channels
    duration_ms = n_frames * 1000 // rate
    peak = max((abs(s) for s in samples), default=0)
    # zero crossings are a PER-CHANNEL physical signal: compare each
    # sample against the previous frame's sample of the SAME channel
    # (stride = channels), or a stereo file with constant L=+x / R=-x
    # would count a bogus crossing at every interleaved boundary
    zc = sum(1 for i in range(channels, len(samples))
             if samples[i - channels] * samples[i] < 0)
    # integrity checksum over the interleaved stream as stored (an exact
    # decode invariant, not a physical metric)
    checksum = sum((s + checksum_offset) * (i + 1)
                   for i, s in enumerate(samples))
    return (rate, channels, n_frames, duration_ms, peak, zc, checksum)


def encode_wav(rate: int, channels: int, samples: list[int],
               bits: int = 16) -> bytes:
    """Fixture/test builder: a fully valid RIFF/WAVE PCM file."""
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
