"""Pure-Python PNG PIXEL decode — stdlib zlib, no PIL.

Closes the last honest stub in the multimodal family (rounds 1-3 decoded
only container headers; the pixel resample was stubbed because this
sandbox has no imaging libraries). A PNG needs none: IDAT is a zlib
stream (stdlib), scanline unfiltering is five fixed byte-level filters
(None/Sub/Up/Average/Paeth, PNG spec §9), and nearest-neighbor resampling
is index arithmetic. The reference resizes real images with PIL before
sending them to the VLM (reference core/utils.py:49-53, 84-96); this is
that step on real bytes.

Scope: 8-bit-depth, non-interlaced PNGs in grayscale (color 0), RGB (2),
gray+alpha (4), and RGBA (6) — the formats a data pipeline actually emits.
Anything else (16-bit, palette, interlaced, malformed) returns None: a
100TB scan must never die on one odd blob; filter on the null and route
exotic formats to a real codec fleet.

Chunk CRCs are deliberately NOT verified: the zlib stream carries its own
adler32 (which IS verified, by zlib itself), and a scan-time decoder that
hard-fails on a stale CRC turns one bit-rotted blob into a dead task. The
encoder side writes correct CRCs.
"""
from __future__ import annotations

import struct
import zlib

from docext_spark.core.imagehdr import PNG_SIG

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# decode-bomb guard: IHDR dims are attacker-controlled, and a ~100KB zlib
# stream can inflate to gigabytes — both the output allocation and the
# inflate itself must be bounded BEFORE trusting the header. A pure-Python
# decoder's honest scope is small fixture/thumbnail imagery; larger dims
# return None (route to a codec fleet).
MAX_PIXELS = 4_000_000


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_line(ftype: int, line: bytearray, prev: bytes, bpp: int) -> bool:
    """In-place PNG scanline unfilter (spec §9.2). Returns False on an
    unknown filter type."""
    n = len(line)
    if ftype == 0:
        return True
    if ftype == 1:                       # Sub
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
        return True
    if ftype == 2:                       # Up
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
        return True
    if ftype == 3:                       # Average
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        return True
    if ftype == 4:                       # Paeth
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        return True
    return False


def decode_png(payload: bytes | None):
    """(width, height, channels, pixels) with ``pixels`` the raw row-major
    interleaved 8-bit samples, or None if undecodable."""
    if not payload or len(payload) < 8 or payload[:8] != PNG_SIG:
        return None
    pos, idat = 8, []
    w = h = None
    channels = None
    n = len(payload)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            return None
        if typ == b"IHDR":
            if ln < 13:
                return None
            w, h = struct.unpack(">II", data[:8])
            depth, color = data[8], data[9]
            # compression 0, filter 0, interlace 0 only
            if depth != 8 or data[10:13] != b"\x00\x00\x00":
                return None
            channels = _COLOR_CHANNELS.get(color)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln                   # len + type + data + crc
    if not w or not h or not channels or not idat:
        return None
    if w * h > MAX_PIXELS:
        return None                      # decode-bomb guard (see above)
    stride = w * channels
    expected = h * (stride + 1)
    try:
        # max_length bounds the inflate so a crafted stream cannot expand
        # past the header-implied size + 1 sentinel byte; the zlib adler32
        # is still verified when the stream completes (eof)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected or not d.eof:
        return None
    out = bytearray(h * stride)
    prev: bytes = bytes(stride)
    for y in range(h):
        base = y * (stride + 1)
        line = bytearray(raw[base + 1:base + 1 + stride])
        if not _unfilter_line(raw[base], line, prev, channels):
            return None
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return (w, h, channels, bytes(out))


def resize_nearest(w: int, h: int, channels: int, pixels: bytes,
                   new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample with the floor index map
    src = (dst * src_dim) // dst_dim — pure integer arithmetic, so an
    analytic oracle can replay the exact mapping."""
    stride = w * channels
    out = bytearray(new_h * new_w * channels)
    o = 0
    for y in range(new_h):
        sy = (y * h) // new_h
        row = sy * stride
        for x in range(new_w):
            sx = row + ((x * w) // new_w) * channels
            out[o:o + channels] = pixels[sx:sx + channels]
            o += channels
    return bytes(out)


def bounded_dims(w: int, h: int, max_size: int) -> tuple[int, int]:
    """The resize-planning rule (operators/multimodal.resize_dims, from
    reference core/utils.py:49-53): bound the longest side to max_size,
    preserve aspect, never upscale. Same double math as the native
    expression so the three implementations agree bit-for-bit. The short
    side is clamped to ≥1: an extreme aspect ratio (a 1×4096 strip at
    max_size 2048 scales the short side to 0.5 → floor 0) must yield a
    1-pixel side, not an empty buffer that crashes the resample."""
    longest = max(w, h)
    if longest <= max_size:
        return (w, h)
    scale = max_size / longest
    return (max(1, int(w * scale)), max(1, int(h * scale)))


# -- encoder (fixture/test side) --------------------------------------------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


_COLOR_OF_CHANNELS = {1: 0, 3: 2, 2: 4, 4: 6}


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    n = len(line)
    if ftype == 0:
        return line
    out = bytearray(n)
    for i in range(n):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(w: int, h: int, channels: int, pixels: bytes,
               filter_of_row=None) -> bytes:
    """A fully valid PNG (real CRCs, real zlib-compressed IDAT).
    ``filter_of_row(y) -> 0..4`` selects the per-row filter — tests use
    y % 5 so every unfilter branch is exercised against the roundtrip."""
    color = _COLOR_OF_CHANNELS[channels]
    stride = w * channels
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer does not match dims")
    raw = bytearray()
    prev: bytes = bytes(stride)
    for y in range(h):
        line = pixels[y * stride:(y + 1) * stride]
        f = filter_of_row(y) if filter_of_row else 0
        raw.append(f)
        raw += _filter_line(f, line, prev, channels)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
