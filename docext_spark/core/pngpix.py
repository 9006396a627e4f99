"""Pure-Python PNG PIXEL decode — stdlib zlib, no PIL.

Closes the last honest stub in the multimodal family (rounds 1-3 decoded
only container headers; the pixel resample was stubbed because this
sandbox has no imaging libraries). A PNG needs none: IDAT is a zlib
stream (stdlib), scanline unfiltering is five fixed byte-level filters
(None/Sub/Up/Average/Paeth, PNG spec §9), and nearest-neighbor resampling
is index arithmetic. The reference resizes real images with PIL before
sending them to the VLM (reference core/utils.py:49-53, 84-96); this is
that step on real bytes.

Scope: grayscale (color 0), RGB (2), gray+alpha (4), and RGBA (6) at
bit depth 8 or 16 (16-bit samples downscale to their high byte — the
8-bit image a pipeline feeds a model anyway); PALETTE (color 3) at
depths 1/2/4/8 with PLTE lookup and optional tRNS alpha (the icon /
screenshot format the web actually serves); and ADAM7 INTERLACING for
all of those (seven sub-images, each filtered independently). Anything
else (sub-byte grayscale, malformed) returns None: a 100TB scan must
never die on one odd blob; filter on the null and route exotic formats
to a real codec fleet.

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


# Adam7 pass origins and spacings (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(payload: bytes | None):
    """(width, height, channels, pixels) with ``pixels`` the raw row-major
    interleaved 8-bit samples, or None if undecodable. Palette images
    come back expanded to RGB (RGBA when a tRNS chunk supplies alpha);
    16-bit samples downscale to their high byte; Adam7 interlaced images
    come back deinterlaced."""
    if not payload or len(payload) < 8 or payload[:8] != PNG_SIG:
        return None
    pos, idat = 8, []
    w = h = None
    depth = color = interlace = None
    plte = trns = None
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
            if data[10:12] != b"\x00\x00":   # compression 0, filter 0
                return None
            interlace = data[12]
            if interlace not in (0, 1):
                return None
        elif typ == b"PLTE":
            if ln % 3 or ln > 768:
                return None
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln                   # len + type + data + crc
    if not w or not h or depth is None or not idat:
        return None
    if color == 3:                       # palette
        if depth not in (1, 2, 4, 8) or not plte:
            return None
        src_channels = 1
        # tRNS alpha applies per palette entry; without it, opaque RGB
        out_channels = 4 if trns is not None else 3
    elif color in _COLOR_CHANNELS:
        if depth not in (8, 16):
            return None
        src_channels = out_channels = _COLOR_CHANNELS[color]
    else:
        return None
    if w * h > MAX_PIXELS:
        return None                      # decode-bomb guard (see above)
    bpp = max(1, src_channels * depth // 8)          # filter byte distance
    passes = [(0, 0, 1, 1)] if interlace == 0 else list(_ADAM7)
    dims = []
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        dims.append((pw, ph))
        if pw and ph:
            expected += ph * (1 + (pw * src_channels * depth + 7) // 8)
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
    ostride = w * out_channels
    out = bytearray(h * ostride)
    npal = len(plte) // 3 if plte else 0
    base = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(passes, dims):
        if not pw or not ph:
            continue                     # empty Adam7 pass: no scanlines
        stride = (pw * src_channels * depth + 7) // 8
        prev: bytes = bytes(stride)
        for j in range(ph):
            line = bytearray(raw[base + 1:base + 1 + stride])
            if not _unfilter_line(raw[base], line, prev, bpp):
                return None
            base += 1 + stride
            prev = line
            oy = y0 + j * dy
            if color == 3:
                if depth == 8:
                    idxs = line
                else:                    # MSB-first sub-byte unpack (§7.2)
                    per = 8 // depth
                    mask = (1 << depth) - 1
                    idxs = [(line[i // per]
                             >> (8 - depth * (i % per + 1))) & mask
                            for i in range(pw)]
                for i in range(pw):
                    idx = idxs[i]
                    if idx >= npal:
                        return None      # corrupt: index past the palette
                    o = oy * ostride + (x0 + i * dx) * out_channels
                    p = idx * 3
                    out[o:o + 3] = plte[p:p + 3]
                    if out_channels == 4:
                        # entries past the tRNS chunk are opaque (§11.3.2)
                        out[o + 3] = trns[idx] if idx < len(trns) else 255
            elif depth == 16:
                for i in range(pw):
                    o = oy * ostride + (x0 + i * dx) * out_channels
                    s = i * src_channels * 2
                    for c in range(src_channels):
                        out[o + c] = line[s + c * 2]     # high byte
            elif interlace == 0:
                out[oy * ostride:(oy + 1) * ostride] = line
            else:
                for i in range(pw):
                    o = oy * ostride + (x0 + i * dx) * out_channels
                    s = i * src_channels
                    out[o:o + src_channels] = line[s:s + src_channels]
    return (w, h, out_channels, bytes(out))


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


def _filtered_stream(rows: list[bytes], bpp: int, filter_of_row) -> bytearray:
    """Serialize scanlines with per-row filters; the previous-row state
    starts at zero (used per Adam7 pass — each pass filters
    independently, PNG spec §8.2)."""
    raw = bytearray()
    prev: bytes = bytes(len(rows[0])) if rows else b""
    for y, line in enumerate(rows):
        f = filter_of_row(y) if filter_of_row else 0
        raw.append(f)
        raw += _filter_line(f, line, prev, bpp)
        prev = line
    return raw


def _pass_rows(w: int, h: int, unit: int, pixels: bytes, interlace: bool):
    """Scanline rows grouped by pass: one full-image pass, or the seven
    Adam7 sub-images. ``unit`` is bytes per pixel in the given buffer."""
    if not interlace:
        stride = w * unit
        return [[pixels[y * stride:(y + 1) * stride] for y in range(h)]]
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        rows = []
        for j in range(ph):
            oy = y0 + j * dy
            row = bytearray()
            for i in range(pw):
                s = (oy * w + x0 + i * dx) * unit
                row += pixels[s:s + unit]
            rows.append(bytes(row))
        if pw and ph:
            out.append(rows)
    return out


def encode_png(w: int, h: int, channels: int, pixels: bytes,
               filter_of_row=None, interlace: bool = False) -> bytes:
    """A fully valid PNG (real CRCs, real zlib-compressed IDAT).
    ``filter_of_row(y) -> 0..4`` selects the per-row filter — tests use
    y % 5 so every unfilter branch is exercised against the roundtrip.
    ``interlace=True`` emits the Adam7 layout (seven sub-images, each
    filtered independently): a pixel-preserving re-arrangement, so
    decode(interlaced) == decode(plain) for every input."""
    color = _COLOR_OF_CHANNELS[channels]
    if len(pixels) != h * w * channels:
        raise ValueError("pixel buffer does not match dims")
    raw = bytearray()
    for rows in _pass_rows(w, h, channels, pixels, interlace):
        raw += _filtered_stream(rows, channels, filter_of_row)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def encode_png16(w: int, h: int, channels: int, pixels: bytes,
                 filter_of_row=None) -> bytes:
    """16-bit-depth PNG from 8-bit samples, each widened to v·257
    (high byte == low byte == v, the PNG sample-scaling convention) —
    so the decoder's high-byte downscale reproduces the input exactly."""
    color = _COLOR_OF_CHANNELS[channels]
    if len(pixels) != h * w * channels:
        raise ValueError("pixel buffer does not match dims")
    wide = bytearray()
    for v in pixels:
        wide += bytes((v, v))
    raw = _filtered_stream(
        _pass_rows(w, h, channels * 2, bytes(wide), False)[0],
        channels * 2, filter_of_row)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def encode_png_palette(w: int, h: int, indices: bytes, palette: bytes,
                       depth: int = 8, trns: bytes | None = None,
                       filter_of_row=None, interlace: bool = False) -> bytes:
    """Palette (color type 3) PNG: ``indices`` is one byte per pixel
    (each < len(palette)//3, and < 2^depth), ``palette`` the PLTE RGB
    triples, ``trns`` optional per-entry alpha. Depths 1/2/4 pack
    indices MSB-first per scanline (per Adam7 sub-image when
    interlaced), exactly the layout the decoder unpacks."""
    if depth not in (1, 2, 4, 8):
        raise ValueError("palette depth must be 1, 2, 4, or 8")
    if len(indices) != w * h or len(palette) % 3 or len(palette) > 768:
        raise ValueError("bad index buffer or palette")
    if any(i >= (1 << depth) or i * 3 >= len(palette) for i in indices):
        raise ValueError("index out of range for depth/palette")

    def pack(row: bytes) -> bytes:
        if depth == 8:
            return row
        per = 8 // depth
        out = bytearray((len(row) + per - 1) // per)
        for i, v in enumerate(row):
            out[i // per] |= v << (8 - depth * (i % per + 1))
        return bytes(out)

    raw = bytearray()
    for rows in _pass_rows(w, h, 1, indices, interlace):
        raw += _filtered_stream([pack(r) for r in rows], 1, filter_of_row)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace))
    out = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return (out + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
