"""ISO Base Media File Format (MP4/MOV, ISO/IEC 14496-12) metadata walk
— stdlib only.

A 100 TB perception pipeline triages video by CONTAINER METADATA before
any codec runs: duration, track kinds, codec fourccs, and display
dimensions all live in the plain big-endian box tree (ftyp / moov /
mvhd / trak / tkhd / mdia / mdhd / hdlr / stsd), no entropy decoding
involved — so that layer is decoded for real here, while the sample
DATA (H.26x/AAC inside mdat) stays honest codec-fleet territory.

Box grammar: 4-byte size + 4-byte type (+8-byte largesize when
size==1; size==0 = to-end-of-file), children nested in the payload.
Full boxes add version + 24-bit flags; mvhd/tkhd/mdhd carry 32-bit
fields in version 0 and 64-bit creation/modification/duration in
version 1 — both are parsed.

Reference parity: the reference's media handling is extension-predicate
plus library decode (reference docext/core/utils.py:56-70, 13-15); this
engine parses the real container bytes itself.
"""
from __future__ import annotations

import struct

MAX_BOXES = 10_000                       # walk bound: crafted nesting


def _walk(payload: bytes, start: int, end: int, budget: list[int]):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        budget[0] -= 1
        if budget[0] < 0:
            return
        size, btype = struct.unpack(">I4s", payload[pos:pos + 8])
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", payload[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _full_box(payload: bytes, start: int):
    """(version, flags, field_start) of a full box."""
    v = payload[start]
    return v, int.from_bytes(payload[start + 1:start + 4], "big"), start + 4


def parse_mp4(payload: bytes | None):
    """{brand, timescale, duration_ms, tracks: [{track_id, handler,
    codec, width, height, duration_ms}]} or None. Width/height are
    tkhd's 16.16 fixed-point display dims, truncated to ints."""
    if not payload or len(payload) < 16:
        return None
    budget = [MAX_BOXES]
    brand = None
    movie = None
    tracks = []
    seen_moov = False
    for btype, b0, b1 in _walk(payload, 0, len(payload), budget):
        if btype == b"ftyp":
            if b1 - b0 < 8:
                return None
            brand = payload[b0:b0 + 4].decode("latin1")
        elif btype == b"moov":
            seen_moov = True
            for ctype, c0, c1 in _walk(payload, b0, b1, budget):
                if ctype == b"mvhd":
                    ver, _, f = _full_box(payload, c0)
                    try:
                        if ver == 1:
                            ts, dur = struct.unpack(
                                ">IQ", payload[f + 16:f + 28])
                        else:
                            ts, dur = struct.unpack(
                                ">II", payload[f + 8:f + 16])
                    except struct.error:
                        return None
                    if not ts:
                        return None
                    movie = (ts, dur)
                elif ctype == b"trak":
                    t = _parse_trak(payload, c0, c1, budget)
                    if t is None:
                        return None
                    tracks.append(t)
    if brand is None or movie is None or not seen_moov:
        return None
    ts, dur = movie
    return {
        "brand": brand,
        "timescale": ts,
        "duration_ms": dur * 1000 // ts,
        "tracks": tracks,
    }


def _parse_trak(payload, start, end, budget):
    track_id = width = height = None
    handler = codec = None
    mdhd = None
    for btype, b0, b1 in _walk(payload, start, end, budget):
        if btype == b"tkhd":
            ver, _, f = _full_box(payload, b0)
            try:
                if ver == 1:
                    track_id = struct.unpack(">I",
                                             payload[f + 16:f + 20])[0]
                    geo = f + 32
                else:
                    track_id = struct.unpack(">I",
                                             payload[f + 8:f + 12])[0]
                    geo = f + 20
                # layer(2) volume... width/height are the LAST 8 bytes
                # of the box: 16.16 fixed point
                width, height = struct.unpack(">II", payload[b1 - 8:b1])
            except struct.error:
                return None
            width >>= 16
            height >>= 16
        elif btype == b"mdia":
            for ctype, c0, c1 in _walk(payload, b0, b1, budget):
                if ctype == b"mdhd":
                    ver, _, f = _full_box(payload, c0)
                    try:
                        if ver == 1:
                            ts, dur = struct.unpack(
                                ">IQ", payload[f + 16:f + 28])
                        else:
                            ts, dur = struct.unpack(
                                ">II", payload[f + 8:f + 16])
                    except struct.error:
                        return None
                    if not ts:
                        return None
                    mdhd = (ts, dur)
                elif ctype == b"hdlr":
                    _, _, f = _full_box(payload, c0)
                    handler = payload[f + 4:f + 8].decode("latin1")
                elif ctype == b"minf":
                    for dtype, d0, d1 in _walk(payload, c0, c1, budget):
                        if dtype != b"stbl":
                            continue
                        for etype, e0, e1 in _walk(payload, d0, d1,
                                                   budget):
                            if etype == b"stsd" and e1 - e0 >= 16:
                                codec = payload[e0 + 12:e0 + 16] \
                                    .decode("latin1")
    if track_id is None or mdhd is None:
        return None
    ts, dur = mdhd
    return {
        "track_id": track_id,
        "handler": handler,
        "codec": codec,
        "width": width,
        "height": height,
        "duration_ms": dur * 1000 // ts,
    }


# -- fixture writer ----------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes((version,))
                + flags.to_bytes(3, "big") + body)


def encode_mp4_meta(brand: str, timescale: int, duration: int,
                    tracks: list[dict], version: int = 0,
                    mdat: bytes = b"\x00" * 16) -> bytes:
    """Minimal valid ISO-BMFF file (fixture/test side): ftyp + moov
    (mvhd + one trak per dict: tkhd/mdia/mdhd/hdlr/minf/stbl/stsd) +
    mdat stub. ``version`` selects 32- or 64-bit mvhd/tkhd/mdhd
    layouts. Track dicts: {track_id, handler ('vide'|'soun'), codec
    (fourcc), width, height, timescale, duration}."""
    ftyp = _box(b"ftyp", brand.encode("latin1")[:4].ljust(4)
                + struct.pack(">I", 0) + b"isom")
    if version == 1:
        mvhd = _full(b"mvhd", 1, 0, struct.pack(
            ">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10) + _identity_matrix() + bytes(24)
            + struct.pack(">I", len(tracks) + 1))
    else:
        mvhd = _full(b"mvhd", 0, 0, struct.pack(
            ">IIII", 0, 0, timescale, duration)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10) + _identity_matrix() + bytes(24)
            + struct.pack(">I", len(tracks) + 1))
    traks = b""
    for t in tracks:
        if version == 1:
            tkhd = _full(b"tkhd", 1, 7, struct.pack(
                ">QQIIQ", 0, 0, t["track_id"], 0, t["duration"])
                + bytes(8) + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                + _identity_matrix()
                + struct.pack(">II", t.get("width", 0) << 16,
                              t.get("height", 0) << 16))
        else:
            tkhd = _full(b"tkhd", 0, 7, struct.pack(
                ">IIIII", 0, 0, t["track_id"], 0, t["duration"])
                + bytes(8) + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                + _identity_matrix()
                + struct.pack(">II", t.get("width", 0) << 16,
                              t.get("height", 0) << 16))
        if version == 1:
            mdhd = _full(b"mdhd", 1, 0, struct.pack(
                ">QQIQ", 0, 0, t["timescale"], t["duration"])
                + struct.pack(">HH", 0x55C4, 0))
        else:
            mdhd = _full(b"mdhd", 0, 0, struct.pack(
                ">IIII", 0, 0, t["timescale"], t["duration"])
                + struct.pack(">HH", 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0)
                     + t["handler"].encode("latin1")[:4].ljust(4)
                     + bytes(12) + b"h\x00")
        # stsd with one sample entry: size + fourcc + 6 reserved + index
        entry = struct.pack(">I4s", 16,
                            t.get("codec", "mp4v").encode("latin1")[:4]
                            .ljust(4)) + bytes(6) + struct.pack(">H", 1)
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", mdat)


def _identity_matrix() -> bytes:
    return struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                       0x40000000)
