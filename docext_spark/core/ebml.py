"""EBML / Matroska / WebM metadata walk (RFC 8794 + the public Matroska
spec) — stdlib only.

The WebM/MKV half of the container-triage story (MP4: core/isobmff.py):
duration, muxing app, and per-track type/codec/dims/audio params live
in plain EBML elements — variable-length-integer IDs and sizes with a
nested element tree — no codec involved. That layer is parsed for real
here; sample DATA (VP8/VP9/AV1/Opus inside Clusters) stays honest
codec-fleet territory.

EBML varint: the number of leading 0 bits in the first byte gives the
width; the marker bit is stripped for SIZES but kept for IDs (the
Matroska convention). Element IDs used: EBML 0x1A45DFA3, DocType
0x4282, Segment 0x18538067, Info 0x1549A966, TimestampScale 0x2AD7B1,
Duration 0x4489 (float), MuxingApp 0x4D80, Tracks 0x1654AE6B,
TrackEntry 0xAE, TrackNumber 0xD7, TrackType 0x83 (1=video 2=audio),
CodecID 0x86, Video 0xE0 {PixelWidth 0xB0, PixelHeight 0xBA}, Audio
0xE1 {SamplingFrequency 0xB5 (float), Channels 0x9F}.

Reference parity: the reference's media handling is extension-predicate
plus library decode (reference docext/core/utils.py:56-70, 13-15).
"""
from __future__ import annotations

import struct

MAX_ELEMENTS = 10_000


def _read_vint(payload: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) or None. EBML variable-length integer."""
    if pos >= len(payload):
        return None
    first = payload[pos]
    if first == 0:
        return None                      # >8-byte vint: out of scope
    width = 8 - first.bit_length() + 1
    if pos + width > len(payload):
        return None
    v = first if keep_marker else first & ((1 << (8 - width)) - 1)
    for i in range(1, width):
        v = (v << 8) | payload[pos + i]
    return v, pos + width


def _walk(payload: bytes, start: int, end: int, budget: list[int]):
    """Yield (element_id, body_start, body_end)."""
    pos = start
    while pos < end:
        budget[0] -= 1
        if budget[0] < 0:
            return
        rid = _read_vint(payload, pos, keep_marker=True)
        if rid is None:
            return
        eid, pos = rid
        rsz = _read_vint(payload, pos, keep_marker=False)
        if rsz is None:
            return
        size, pos = rsz
        if pos + size > end:
            return
        yield eid, pos, pos + size
        pos += size


def _uint(payload, b0, b1):
    v = 0
    for i in range(b0, b1):
        v = (v << 8) | payload[i]
    return v


def _float(payload, b0, b1):
    if b1 - b0 == 4:
        return struct.unpack(">f", payload[b0:b1])[0]
    if b1 - b0 == 8:
        return struct.unpack(">d", payload[b0:b1])[0]
    return None


def parse_matroska(payload: bytes | None):
    """{doctype, muxing_app, duration_ms, tracks: [{track_id, kind
    ('video'|'audio'|other int), codec, width, height, sample_rate,
    channels}]} or None."""
    if not payload or len(payload) < 8:
        return None
    budget = [MAX_ELEMENTS]
    doctype = None
    muxer = None
    duration_ms = None
    tracks = []
    seen_segment = False
    for eid, b0, b1 in _walk(payload, 0, len(payload), budget):
        if eid == 0x1A45DFA3:            # EBML header
            for cid, c0, c1 in _walk(payload, b0, b1, budget):
                if cid == 0x4282:        # DocType
                    doctype = payload[c0:c1].decode("latin1")
        elif eid == 0x18538067:          # Segment
            seen_segment = True
            tscale = 1_000_000           # default: ns per timestamp unit
            dur = None
            for cid, c0, c1 in _walk(payload, b0, b1, budget):
                if cid == 0x1549A966:    # Info
                    for did, d0, d1 in _walk(payload, c0, c1, budget):
                        if did == 0x2AD7B1:
                            tscale = _uint(payload, d0, d1)
                        elif did == 0x4489:
                            dur = _float(payload, d0, d1)
                        elif did == 0x4D80:
                            muxer = payload[d0:d1].decode("latin1")
                elif cid == 0x1654AE6B:  # Tracks
                    for did, d0, d1 in _walk(payload, c0, c1, budget):
                        if did != 0xAE:
                            continue
                        t = _parse_track(payload, d0, d1, budget)
                        if t is None:
                            return None
                        tracks.append(t)
            if dur is not None and tscale:
                duration_ms = int(dur * tscale // 1_000_000)
    if doctype is None or not seen_segment:
        return None
    return {"doctype": doctype, "muxing_app": muxer,
            "duration_ms": duration_ms, "tracks": tracks}


def _parse_track(payload, start, end, budget):
    tid = kind = codec = width = height = rate = channels = None
    for eid, b0, b1 in _walk(payload, start, end, budget):
        if eid == 0xD7:
            tid = _uint(payload, b0, b1)
        elif eid == 0x83:
            kind = _uint(payload, b0, b1)
            # non-video/audio TrackTypes (17=subtitle, 16=logo, …) must
            # still be a STRING: the value lands in a StringType column,
            # and a raw int fails the Arrow conversion at runtime
            # (ADVICE r6: ArrowTypeError on real-world Matroska files)
            kind = {1: "video", 2: "audio"}.get(kind, str(kind))
        elif eid == 0x86:
            codec = payload[b0:b1].decode("latin1")
        elif eid == 0xE0:                # Video
            for cid, c0, c1 in _walk(payload, b0, b1, budget):
                if cid == 0xB0:
                    width = _uint(payload, c0, c1)
                elif cid == 0xBA:
                    height = _uint(payload, c0, c1)
        elif eid == 0xE1:                # Audio
            for cid, c0, c1 in _walk(payload, b0, b1, budget):
                if cid == 0xB5:
                    f = _float(payload, c0, c1)
                    rate = int(f) if f else None
                elif cid == 0x9F:
                    channels = _uint(payload, c0, c1)
    if tid is None or kind is None:
        return None
    return {"track_id": tid, "kind": kind, "codec": codec,
            "width": width, "height": height, "sample_rate": rate,
            "channels": channels}


# -- fixture writer ----------------------------------------------------------

def _vint_size(v: int) -> bytes:
    """Encode a SIZE as a minimal EBML varint."""
    for width in range(1, 9):
        if v < (1 << (7 * width)) - 1:
            out = v | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise ValueError("size too large")


def _elem(eid: int, body: bytes) -> bytes:
    nid = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nid, "big") + _vint_size(len(body)) + body


def _uint_body(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def encode_matroska_meta(doctype: str, muxing_app: str,
                         duration_units: float, timestamp_scale: int,
                         tracks: list[dict]) -> bytes:
    """Minimal valid Matroska/WebM metadata stream (fixture/test side):
    EBML header (DocType) + Segment (Info + Tracks). Track dicts:
    {track_id, kind ('video'|'audio'), codec, width/height or
    sample_rate/channels}. Duration is written as an 8-byte float in
    timestamp units (the Matroska convention)."""
    header = _elem(0x1A45DFA3, _elem(0x4282, doctype.encode("latin1")))
    info = _elem(0x1549A966,
                 _elem(0x2AD7B1, _uint_body(timestamp_scale))
                 + _elem(0x4489, struct.pack(">d", duration_units))
                 + _elem(0x4D80, muxing_app.encode("latin1")))
    entries = b""
    for t in tracks:
        body = (_elem(0xD7, _uint_body(t["track_id"]))
                + _elem(0x83, _uint_body(
                    t["kind"] if isinstance(t["kind"], int)
                    else (1 if t["kind"] == "video" else 2)))
                + _elem(0x86, t["codec"].encode("latin1")))
        if t["kind"] == "video":
            body += _elem(0xE0, _elem(0xB0, _uint_body(t["width"]))
                          + _elem(0xBA, _uint_body(t["height"])))
        else:
            body += _elem(0xE1,
                          _elem(0xB5, struct.pack(
                              ">f", float(t["sample_rate"])))
                          + _elem(0x9F, _uint_body(t["channels"])))
        entries += _elem(0xAE, body)
    segment = _elem(0x18538067, info + _elem(0x1654AE6B, entries))
    return header + segment
