"""BMP pixel decode (core/bmppix.py): roundtrips over depth/row-order/
palette variants, hand-built header edges, defensive guards, and
integration with the shared image-resample operator.

Reference parity: the accepted-extension predicate includes ``bmp``
(reference docext/core/utils.py:56-70; PIL decodes it transparently at
core/utils.py:13-15) — this engine decodes the real bytes itself."""
from __future__ import annotations

import struct

import pytest

from docext_spark.core import bmppix, imagehdr


def _rgb(w, h, seed=0):
    return bytes((x * 5 + y * 11 + c * 17 + seed * 7) % 256
                 for y in range(h) for x in range(w) for c in range(3))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (7, 5), (16, 9)])
@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip_depths_and_row_orders(w, h, bpp, top_down):
    """Decode must undo the bottom-up row order, the BGR byte order, and
    the 4-byte row padding (w=3,7 exercise nonzero pad; 4,16 zero pad)."""
    rgb = _rgb(w, h, seed=w + h)
    enc = bmppix.encode_bmp(w, h, rgb, bpp=bpp, top_down=top_down)
    assert bmppix.decode_bmp(enc) == (w, h, 3, rgb)


def test_palette_8bit_roundtrip():
    palette = [((c * 3 + 1) % 256, (c * 5 + 2) % 256, (c * 7 + 3) % 256)
               for c in range(256)]
    w, h = 6, 5
    idx = bytes((x * 3 + y * 5) % 256 for y in range(h) for x in range(w))
    dec = bmppix.decode_bmp(bmppix.encode_bmp8(w, h, idx, palette))
    assert dec == (w, h, 3, b"".join(bytes(palette[i]) for i in idx))


def test_palette_clr_used_subset_and_oob_index():
    """clr_used < 256 shrinks the stored palette; an index beyond it must
    decode to None, not read past the palette."""
    palette = [(9, 8, 7), (1, 2, 3)]
    enc = bmppix.encode_bmp8(2, 1, bytes([1, 0]), palette)
    assert bmppix.decode_bmp(enc) == (2, 1, 3, bytes([1, 2, 3, 9, 8, 7]))
    bad = bytearray(enc)
    bad[-4] = 5                           # index 5 into a 2-entry palette
    assert bmppix.decode_bmp(bytes(bad)) is None


def test_longer_dib_header_accepted():
    """BITMAPV4/V5 headers are longer but keep the fields we read at the
    same offsets — decode must honor the header-declared data offset."""
    w, h = 3, 2
    rgb = _rgb(w, h)
    base = bmppix.encode_bmp(w, h, rgb)
    pix = base[54:]
    dib = bytearray(base[14:54])
    dib[0:4] = struct.pack("<I", 108)     # BITMAPV4HEADER size
    dib = bytes(dib) + b"\x00" * (108 - 40)
    off = 14 + 108
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    assert bmppix.decode_bmp(hdr + dib + pix) == (w, h, 3, rgb)


def test_defensive_returns_none():
    good = bmppix.encode_bmp(5, 4, _rgb(5, 4))
    assert bmppix.decode_bmp(None) is None
    assert bmppix.decode_bmp(b"") is None
    assert bmppix.decode_bmp(b"BM" + b"\x00" * 20) is None
    assert bmppix.decode_bmp(b"not a bmp at all, but long enough padding....."
                             ) is None
    # truncated pixel data
    assert bmppix.decode_bmp(good[:len(good) - 3]) is None
    # RLE8 compression rejected (BI_RGB only)
    rle = bytearray(good)
    rle[30] = 1
    assert bmppix.decode_bmp(bytes(rle)) is None
    # 16bpp rejected
    b16 = bytearray(good)
    b16[28] = 16
    assert bmppix.decode_bmp(bytes(b16)) is None
    # BITMAPCOREHEADER (dib_size 12) rejected
    core = bytearray(good)
    core[14] = 12
    assert bmppix.decode_bmp(bytes(core)) is None


def test_decode_bomb_guard():
    """A tiny file claiming 65535x65535 must bail before allocating the
    12 GB RGB buffer."""
    bomb = bytearray(bmppix.encode_bmp(2, 2, _rgb(2, 2)))
    bomb[18:26] = struct.pack("<ii", 65535, 65535)
    assert bmppix.decode_bmp(bytes(bomb)) is None
    assert bmppix.MAX_PIXELS >= 1_000_000


def test_imagehdr_sniff_and_dims():
    enc = bmppix.encode_bmp(9, 4, _rgb(9, 4))
    assert imagehdr.sniff_format(enc) == "bmp"
    assert imagehdr.parse_dims(enc) == ("bmp", 9, 4)
    td = bmppix.encode_bmp(9, 4, _rgb(9, 4), top_down=True)
    assert imagehdr.parse_dims(td) == ("bmp", 9, 4)


def test_native_fixture_matches_python_encoder(spark):
    """bmp_rgb_fixture_hex (pure native expressions) must byte-equal the
    Python encoder on the same rule — pinning the closed-form container
    (header fields, bottom-up rows, BGR, padding) against an independent
    construction."""
    from pyspark.sql import functions as F

    from docext_spark.operators.multimodal import bmp_rgb_fixture_hex
    rows = spark.range(6).select(
        F.col("id"),
        (F.lit(3) + F.col("id") % 5).cast("int").alias("w"),
        (F.lit(2) + F.col("id") * 3 % 7).cast("int").alias("h"),
        bmp_rgb_fixture_hex(
            F.col("id"),
            (F.lit(3) + F.col("id") % 5).cast("int"),
            (F.lit(2) + F.col("id") * 3 % 7).cast("int")).alias("hex"),
    ).collect()
    for r in rows:
        expect = bmppix.encode_bmp(r["w"], r["h"],
                                   _rgb(r["w"], r["h"], seed=r["id"]))
        assert bytes.fromhex(r["hex"]) == expect


def test_resample_operator_decodes_bmp(spark):
    import pandas as pd

    from docext_spark.core import pngpix
    from docext_spark.operators.multimodal import (extract_features,
                                                   resample_images)
    w, h = 13, 4
    rgb = _rgb(w, h, seed=3)
    media = spark.createDataFrame(
        pd.DataFrame([(0, "image", bmppix.encode_bmp(w, h, rgb))],
                     columns=["media_id", "kind", "payload"]),
        "media_id long, kind string, payload binary")
    r = resample_images(media, max_size=8).collect()[0]
    assert r["format"] == "bmp" and (r["width"], r["height"]) == (w, h)
    nw, nh = pngpix.bounded_dims(w, h, 8)
    out = pngpix.resize_nearest(w, h, 3, rgb, nw, nh)
    assert (r["new_width"], r["new_height"]) == (nw, nh)
    assert r["px_checksum"] == sum(b * (i + 1) for i, b in enumerate(out))
    f = extract_features(media).collect()[0]
    assert f["feature_src"] == "pixels"
    assert (f["width"], f["height"]) == (w, h)
