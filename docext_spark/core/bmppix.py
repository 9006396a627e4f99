"""Pure-Python BMP PIXEL decode — stdlib struct only, no PIL.

The reference's accepted-extension predicate includes ``bmp``
(reference docext/core/utils.py:56-70) and PIL decodes it transparently
(core/utils.py:13-15, ds.py:135-136); this engine decodes the real bytes
itself. BMP is the easiest pixel container there is: no compression in
the common BI_RGB case, just a 14-byte file header, a BITMAPINFOHEADER
(or any later, longer DIB header — the fields we need sit at the same
offsets), an optional palette, and raw rows stored BOTTOM-UP (top-down
when biHeight < 0), each padded to a 4-byte boundary, pixels in BGR
order. Decoding = bounds-checked index arithmetic.

Scope (the formats a pipeline actually meets): 8-bit palette, 24bpp BGR,
and 32bpp BGRX, BI_RGB (uncompressed) only. RLE4/RLE8/bitfields and
sub-8-bit depths return None — a 100TB scan must never die on one odd
blob; filter on the null and route exotica to a codec fleet.

Output convention matches pngpix/gifpix: (width, height, channels,
samples) with samples row-major TOP-DOWN interleaved RGB — the decoder
undoes both the bottom-up row order and the BGR byte order, so every
consumer (resample, featurize) sees one layout regardless of container.
"""
from __future__ import annotations

import struct

# decode-bomb guard, same rationale and value as pngpix/gifpix: header
# dims are attacker-controlled and the output allocation must be bounded
# BEFORE trusting them
MAX_PIXELS = 4_000_000


def decode_bmp(payload: bytes | None):
    """(width, height, channels=3, samples top-down RGB) or None."""
    if not payload or len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40 or 14 + dib_size > len(payload):
        return None                       # BITMAPCOREHEADER etc.: skip
    (w, h_raw, planes, bpp, compression, _size_img, _xppm, _yppm,
     clr_used, _clr_imp) = struct.unpack_from("<iiHHIIiiII", payload, 18)
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or planes != 1 or compression != 0:
        return None                       # BI_RGB only (no RLE/bitfields)
    if bpp not in (8, 24, 32):
        return None
    if w * h > MAX_PIXELS:
        return None                       # decode-bomb guard (see above)

    palette = None
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + dib_size
        if n_colors > 256 or pal_off + 4 * n_colors > len(payload):
            return None
        palette = [payload[pal_off + 4 * i: pal_off + 4 * i + 3]
                   for i in range(n_colors)]          # stored B,G,R,x

    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3      # rows padded to 4 bytes
    if data_off + stride * h > len(payload):
        return None

    out = bytearray(w * h * 3)
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        row = data_off + src_y * stride
        o = y * w * 3
        if bpp == 8:
            for x in range(w):
                idx = payload[row + x]
                if idx >= len(palette):
                    return None
                b, g, r = palette[idx]
                out[o:o + 3] = (r, g, b)
                o += 3
        else:
            for x in range(w):
                p = row + x * bytes_pp
                out[o] = payload[p + 2]   # R  (stored B,G,R[,X])
                out[o + 1] = payload[p + 1]
                out[o + 2] = payload[p]
                o += 3
    return (w, h, 3, bytes(out))


def encode_bmp(width: int, height: int, rgb: bytes,
               bpp: int = 24, top_down: bool = False) -> bytes:
    """Valid BI_RGB BMP from top-down RGB samples (fixture/test side).
    bpp 24 writes BGR rows; bpp 32 writes BGRX. Rows are emitted
    bottom-up unless ``top_down`` (then biHeight is negative, per spec)."""
    if bpp not in (24, 32):
        raise ValueError(f"encode_bmp: bpp must be 24 or 32, got {bpp}")
    if len(rgb) != width * height * 3:
        raise ValueError("encode_bmp: samples length != w*h*3")
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    rows = []
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))
            if bytes_pp == 4:
                row += b"\x00"
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pix = b"".join(rows)
    h_field = -height if top_down else height
    dib = struct.pack("<IiiHHIIiiII", 40, width, h_field, 1, bpp, 0,
                      len(pix), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    return hdr + dib + pix


def encode_bmp8(width: int, height: int, indices: bytes,
                palette: list[tuple[int, int, int]]) -> bytes:
    """8-bit palette BMP from top-down palette indices (test side)."""
    if len(indices) != width * height:
        raise ValueError("encode_bmp8: indices length != w*h")
    if len(palette) > 256:
        raise ValueError("encode_bmp8: palette > 256 entries")
    stride = (width + 3) & ~3
    rows = []
    for y in range(height - 1, -1, -1):
        row = indices[y * width:(y + 1) * width]
        rows.append(row + b"\x00" * (stride - width))
    pix = b"".join(rows)
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                      len(pix), 2835, 2835, len(palette), 0)
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    return hdr + dib + pal + pix
