"""MPEG audio (MP3) frame-header walk — metadata only, stdlib only.

The honest scope for perceptual codecs in this engine (module docstring
of core/wavpcm.py): no filterbank/psychoacoustic DECODE — but an MP3's
STREAM STRUCTURE is plain header arithmetic (ISO/IEC 11172-3 §2.4.1.3 /
13818-3): 11-bit sync, version/layer ids, bitrate + sample-rate table
indices, and the closed-form frame size. That is everything a 100 TB
triage pass needs: duration, bitrate (CBR vs VBR), sample rate, channel
mode, frame count — so that layer is parsed for real here, and sample
decode stays codec-fleet territory.

Handles ID3v2 prefix (syncsafe size skip), ID3v1 trailer, optional CRC
flag, padding, all three versions (MPEG1 / MPEG2 / MPEG2.5) and all
three layers.

Reference parity: the reference's media handling is extension-predicate
plus library decode (reference docext/core/utils.py:56-70, 13-15).
"""
from __future__ import annotations

# kbps by [version-group][layer][index]; 0 = free format (unsupported)
_BITRATE = {
    # MPEG1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    # MPEG2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_RATES = {3: [44100, 48000, 32000],      # version bits 11 = MPEG1
          2: [22050, 24000, 16000],      # 10 = MPEG2
          0: [11025, 12000, 8000]}       # 00 = MPEG2.5

MAX_FRAMES = 1 << 20


def _frame_header(b0, b1, b2, b3):
    """Parsed header dict or None — pure arithmetic, no allocation."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vbits = (b1 >> 3) & 0x3
    if vbits == 1:
        return None                      # reserved version
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x3)
    if layer is None:
        return None
    bidx = (b2 >> 4) & 0xF
    ridx = (b2 >> 2) & 0x3
    if bidx in (0, 15) or ridx == 3:
        return None                      # free-format / bad indices
    vgroup = 1 if vbits == 3 else 2
    kbps = _BITRATE[(vgroup, layer)][bidx]
    rate = _RATES[vbits][ridx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 0x3
    if layer == 1:
        spf = 384
        size = (12000 * kbps // rate + padding) * 4
    else:
        spf = 1152 if (vgroup == 1 or layer == 2) else 576
        size = spf // 8 * 1000 * kbps // rate + padding
    return {"version": {3: "1", 2: "2", 0: "2.5"}[vbits],
            "layer": layer, "kbps": kbps, "rate": rate,
            "channels": 1 if mode == 3 else 2,
            "samples": spf, "size": size}


def parse_mp3(payload: bytes | None):
    """{n_frames, duration_ms, sample_rate, channels, layer, version,
    bitrate_kbps (mean, rounded), vbr} or None. Walks every frame header
    (skipping an ID3v2 prefix and tolerating an ID3v1 'TAG' trailer);
    rejects streams whose headers disagree on version/layer/rate or
    that desync mid-stream — truncation is corruption, not success."""
    if not payload or len(payload) < 4:
        return None
    pos, n = 0, len(payload)
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                return None              # non-syncsafe size: corrupt
            size = (size << 7) | b
        pos = 10 + size
    frames = 0
    samples = 0
    kbps_sum = 0
    first = None
    vbr = False
    while pos + 4 <= n:
        if payload[pos:pos + 3] == b"TAG" and n - pos == 128:
            break                        # ID3v1 trailer
        h = _frame_header(payload[pos], payload[pos + 1],
                          payload[pos + 2], payload[pos + 3])
        if h is None:
            return None
        if first is None:
            first = h
        elif (h["version"], h["layer"], h["rate"], h["channels"]) != \
                (first["version"], first["layer"], first["rate"],
                 first["channels"]):
            return None
        if h["kbps"] != first["kbps"]:
            vbr = True
        if pos + h["size"] > n:
            return None                  # truncated final frame
        frames += 1
        samples += h["samples"]
        kbps_sum += h["kbps"]
        pos += h["size"]
        if frames > MAX_FRAMES:
            return None
    if not frames:
        return None
    return {"n_frames": frames,
            "duration_ms": samples * 1000 // first["rate"],
            "sample_rate": first["rate"],
            "channels": first["channels"],
            "layer": first["layer"],
            "version": first["version"],
            "bitrate_kbps": (kbps_sum + frames // 2) // frames,
            "vbr": vbr}


def encode_mp3_frames(version: str, layer: int, rate_idx: int,
                      bitrate_indices: list[int], channels: int = 2,
                      id3v2: bytes | None = None,
                      id3v1: bool = False) -> bytes:
    """Structurally valid MPEG audio stream (fixture/test side): one
    frame per bitrate index, zeroed payloads, padding bit off. The
    header arithmetic is the same closed form the parser inverts —
    disagreement between the two IS the test."""
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    lbits = {1: 3, 2: 2, 3: 1}[layer]
    out = bytearray()
    if id3v2 is not None:
        size = len(id3v2)
        ss = bytes(((size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F))
        out += b"ID3\x04\x00\x00" + ss + id3v2
    for bidx in bitrate_indices:
        b1 = 0xE0 | (vbits << 3) | (lbits << 1) | 1
        b2 = (bidx << 4) | (rate_idx << 2)
        b3 = (0x00 if channels == 2 else 0xC0)
        h = _frame_header(0xFF, b1, b2, b3)
        if h is None:
            raise ValueError("invalid header parameters")
        out += bytes((0xFF, b1, b2, b3)) + bytes(h["size"] - 4)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
