"""Baseline TIFF pixel decode (core/tiffpix.py): roundtrips over byte
order / compression / strip layout / photometric variants, PackBits
edges (incl. the 128-boundary literal clamp), defensive guards, and
integration with the shared image-resample operator.

Reference parity: the accepted-extension predicate includes ``tiff``
(reference docext/core/utils.py:56-70; PIL decodes it transparently at
core/utils.py:13-15) — this engine decodes the real bytes itself."""
from __future__ import annotations

import struct

import pytest

from docext_spark.core import imagehdr, tiffpix


def _samples(w, h, ch, seed=0):
    return bytes((x * 3 + y * 7 + c * 19 + seed * 5) % 256
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 32773])
@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("rps", [1, 2, None])
def test_roundtrip_matrix(bo, comp, ch, rps):
    """Both byte orders × none/PackBits × gray/RGB × strip layouts —
    every tag-value overflow shape (arrays beyond 4 bytes) included."""
    w, h = 7, 5
    data = _samples(w, h, ch, seed=ch)
    enc = tiffpix.encode_tiff(w, h, ch, data, byte_order=bo,
                              compression=comp, rows_per_strip=rps)
    assert tiffpix.decode_tiff(enc) == (w, h, ch, data)


def test_white_is_zero_normalized():
    """PhotometricInterpretation 0 stores inverted values; decode must
    hand every consumer black=0."""
    w, h = 4, 3
    gray = _samples(w, h, 1)
    enc = tiffpix.encode_tiff(w, h, 1, bytes(255 - b for b in gray),
                              photometric=0)
    assert tiffpix.decode_tiff(enc) == (w, h, 1, gray)


def test_packbits_edges():
    # -128 (0x80) is a spec no-op
    assert tiffpix.packbits_decode(b"\x80\x80", 8) == b""
    # replicate run: (257-n, byte)
    assert tiffpix.packbits_decode(bytes([257 - 5, 65]), 5) == b"AAAAA"
    # truncated literal header
    assert tiffpix.packbits_decode(b"\x02\x41", 8) is None
    # truncated replicate (no byte to repeat)
    assert tiffpix.packbits_decode(bytes([257 - 3]), 8) is None
    # expansion bomb: output capped at max_out
    assert tiffpix.packbits_decode(bytes([257 - 128, 0]) * 10, 64) is None


def test_packbits_literal_boundary_clamp():
    """A 2-byte repeat straddling the 128-byte literal cap must not emit a
    129-byte literal (header 128 is the no-op code — malformed stream).
    Caught by pre-commit fuzz; pinned here."""
    data = bytes(range(127)) + b"\xee\xee" + bytes(range(50))
    enc = tiffpix.packbits_encode(data)
    assert tiffpix.packbits_decode(enc, len(data)) == data


def test_packbits_roundtrip_fuzz():
    import random
    for trial in range(300):
        random.seed(trial)
        n = random.randint(0, 600)
        data = bytes(random.choice([0, 0, 0, random.randrange(256)])
                     for _ in range(n))
        enc = tiffpix.packbits_encode(data)
        assert tiffpix.packbits_decode(enc, n) == data, trial


def test_defensive_returns_none():
    good = tiffpix.encode_tiff(5, 4, 3, _samples(5, 4, 3))
    assert tiffpix.decode_tiff(None) is None
    assert tiffpix.decode_tiff(b"") is None
    assert tiffpix.decode_tiff(b"II*\x00") is None
    assert tiffpix.decode_tiff(b"not tiff") is None
    # truncated: IFD sits past the strips, so any truncation kills it
    assert tiffpix.decode_tiff(good[:len(good) // 2]) is None
    # LZW compression (5) rejected — baseline only
    lzw = tiffpix.encode_tiff(5, 4, 3, _samples(5, 4, 3))
    i = lzw.index(struct.pack("<HHI", 259, 3, 1))
    bad = bytearray(lzw)
    bad[i + 8] = 5
    assert tiffpix.decode_tiff(bytes(bad)) is None
    # planar configuration 2 rejected
    i = lzw.index(struct.pack("<HHI", 284, 3, 1))
    bad = bytearray(lzw)
    bad[i + 8] = 2
    assert tiffpix.decode_tiff(bytes(bad)) is None
    # 16-bit samples rejected
    i = lzw.index(struct.pack("<HHI", 258, 3, 3))
    bad = bytearray(lzw)
    bad_vals = struct.unpack_from("<I", bad, i + 8)[0]
    struct.pack_into("<H", bad, bad_vals, 16)
    assert tiffpix.decode_tiff(bytes(bad)) is None
    # strip byte count lying about its length
    i = good.index(struct.pack("<HHI", 279, 4, 1))
    bad = bytearray(good)
    struct.pack_into("<I", bad, i + 8, 7)
    assert tiffpix.decode_tiff(bytes(bad)) is None


def test_decode_bomb_guard():
    """IFD dims are attacker-controlled: a tiny payload claiming 65535² must
    bail before the output allocates, and PackBits expansion is bounded."""
    good = tiffpix.encode_tiff(2, 2, 1, _samples(2, 2, 1))
    i = good.index(struct.pack("<HHI", 256, 4, 1))
    bomb = bytearray(good)
    struct.pack_into("<I", bomb, i + 8, 65535)
    j = good.index(struct.pack("<HHI", 257, 4, 1))
    struct.pack_into("<I", bomb, j + 8, 65535)
    assert tiffpix.decode_tiff(bytes(bomb)) is None
    assert tiffpix.MAX_PIXELS >= 1_000_000


def test_imagehdr_sniff_and_dims():
    for bo in ("<", ">"):
        enc = tiffpix.encode_tiff(11, 6, 3, _samples(11, 6, 3),
                                  byte_order=bo)
        assert imagehdr.sniff_format(enc) == "tiff"
        assert imagehdr.parse_dims(enc) == ("tiff", 11, 6)


def test_resample_operator_decodes_tiff(spark):
    import pandas as pd

    from docext_spark.core import pngpix
    from docext_spark.operators.multimodal import (extract_features,
                                                   resample_images)
    w, h = 12, 5
    rgb = _samples(w, h, 3, seed=2)
    payload = tiffpix.encode_tiff(w, h, 3, rgb, byte_order=">",
                                  compression=32773, rows_per_strip=2)
    media = spark.createDataFrame(
        pd.DataFrame([(0, "image", payload)],
                     columns=["media_id", "kind", "payload"]),
        "media_id long, kind string, payload binary")
    r = resample_images(media, max_size=8).collect()[0]
    assert r["format"] == "tiff" and (r["width"], r["height"]) == (w, h)
    nw, nh = pngpix.bounded_dims(w, h, 8)
    out = pngpix.resize_nearest(w, h, 3, rgb, nw, nh)
    assert (r["new_width"], r["new_height"]) == (nw, nh)
    assert r["px_checksum"] == sum(b * (i + 1) for i, b in enumerate(out))
    f = extract_features(media).collect()[0]
    assert f["feature_src"] == "pixels"
