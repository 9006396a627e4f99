"""Ogg container metadata walk (RFC 3533) with Vorbis/Opus ID headers —
stdlib only.

The last piece of the container-triage set (MP4: core/isobmff.py,
Matroska: core/ebml.py, MPEG audio: core/mpegaudio.py): an Ogg stream's
structure is fixed-layout pages — 'OggS' capture, 64-bit granule
position, serial, page sequence, a CRC over the whole page, and a
lacing-value segment table — and the first packet is a codec ID header
('\\x01vorbis' with channels+rate, or 'OpusHead' with channels+preskip).
Duration falls out of the LAST page's granule position (Vorbis: PCM
samples at the stream rate; Opus: 48 kHz units minus pre-skip). All of
that is parsed for real here; the audio DATA (Vorbis/Opus packets)
stays honest codec-fleet territory.

Every page CRC is verified — the Ogg CRC-32 (poly 0x04C11DB7, init 0,
unreflected, no final xor, per RFC 3533 A.2) computed with the CRC
field zeroed.

Reference parity: the reference's media handling is extension-predicate
plus library decode (reference docext/core/utils.py:56-70, 13-15).
"""
from __future__ import annotations

import struct

MAX_PAGES = 100_000

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    """RFC 3533 A.2 page CRC: poly 0x04C11DB7, init 0, unreflected,
    no final xor."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def parse_ogg(payload: bytes | None):
    """{codec ('vorbis'|'opus'|None), channels, sample_rate,
    duration_ms, n_pages, serial} or None. Single logical stream only
    (grouped/multiplexed streams return None); every page CRC must
    verify."""
    if not payload or len(payload) < 28 or payload[:4] != b"OggS":
        return None
    pos, n = 0, len(payload)
    serial = None
    codec = channels = rate = preskip = None
    last_granule = 0
    n_pages = 0
    saw_eos = False
    while pos + 27 <= n:
        if payload[pos:pos + 4] != b"OggS" or payload[pos + 4] != 0:
            return None
        htype = payload[pos + 5]
        granule, pserial = struct.unpack("<qI", payload[pos + 6:pos + 18])
        crc = struct.unpack("<I", payload[pos + 22:pos + 26])[0]
        nseg = payload[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > n:
            return None
        body_len = sum(payload[pos + 27:seg_end])
        page_end = seg_end + body_len
        if page_end > n:
            return None
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            return None
        if serial is None:
            serial = pserial
        elif pserial != serial:
            return None                  # multiplexed streams: fleet
        body = payload[seg_end:page_end]
        if n_pages == 0:
            if not (htype & 0x02):
                return None              # first page must be BOS
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack("<I", body[12:16])[0]
            elif body[:8] == b"OpusHead" and len(body) >= 12:
                codec = "opus"
                channels = body[9]
                preskip = struct.unpack("<H", body[10:12])[0]
                rate = 48000             # Opus granules run at 48 kHz
        if granule >= 0:
            last_granule = max(last_granule, granule)
        if htype & 0x04:
            saw_eos = True
        n_pages += 1
        if n_pages > MAX_PAGES:
            return None
        pos = page_end
    if n_pages == 0 or pos != n or codec is None or not rate:
        return None
    samples = last_granule - (preskip or 0)
    return {"codec": codec, "channels": channels, "sample_rate": rate,
            "duration_ms": max(0, samples) * 1000 // rate,
            "n_pages": n_pages, "serial": serial, "eos": saw_eos}


# -- fixture writer ----------------------------------------------------------

def _page(serial: int, seq: int, granule: int, body: bytes,
          htype: int) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)                    # final short (possibly 0) lace
    hdr = (b"OggS\x00" + bytes((htype,))
           + struct.pack("<qI", granule, serial)
           + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
           + bytes((len(segs),)) + bytes(segs))
    crc = ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def encode_ogg_meta(codec: str, channels: int, rate: int,
                    duration_samples: int, n_data_pages: int = 2,
                    serial: int = 0x1234, preskip: int = 312) -> bytes:
    """Minimal valid Ogg stream (fixture/test side): a BOS page with the
    Vorbis or Opus ID header, ``n_data_pages`` zero-filled data pages
    with increasing granules, and an EOS page carrying the final
    granule (for Opus: duration_samples + preskip, so the parsed
    duration is exact). Every page carries a real RFC 3533 CRC."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0)
                 + bytes((channels,)) + struct.pack("<I", rate)
                 + struct.pack("<iii", 0, 0, 0) + b"\xb8\x01")
        final_granule = duration_samples
    elif codec == "opus":
        ident = (b"OpusHead\x01" + bytes((channels,))
                 + struct.pack("<H", preskip) + struct.pack("<I", rate)
                 + struct.pack("<hB", 0, 0))
        final_granule = duration_samples + preskip
    else:
        raise ValueError("codec must be vorbis or opus")
    out = bytearray(_page(serial, 0, 0, ident, 0x02))
    for k in range(n_data_pages):
        g = final_granule * (k + 1) // (n_data_pages + 1)
        out += _page(serial, 1 + k, g, bytes(20 + 7 * k), 0x00)
    out += _page(serial, 1 + n_data_pages, final_granule, bytes(4),
                 0x04)
    return bytes(out)
