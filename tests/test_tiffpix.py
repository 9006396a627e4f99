"""Baseline TIFF pixel decode (core/tiffpix.py): roundtrips over byte
order / compression / strip layout / photometric variants, PackBits
edges (incl. the 128-boundary literal clamp), defensive guards, and
integration with the shared image-resample operator.

Reference parity: the accepted-extension predicate includes ``tiff``
(reference docext/core/utils.py:56-70; PIL decodes it transparently at
core/utils.py:13-15) — this engine decodes the real bytes itself."""
from __future__ import annotations

import struct
import zlib

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
    # JPEG-in-TIFF compression (7) rejected — out of scope
    lzw = tiffpix.encode_tiff(5, 4, 3, _samples(5, 4, 3))
    i = lzw.index(struct.pack("<HHI", 259, 3, 1))
    bad = bytearray(lzw)
    bad[i + 8] = 7
    assert tiffpix.decode_tiff(bytes(bad)) is None
    # ...and raw pixel bytes relabeled as LZW are a malformed stream
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


# ------------------------------------------------------------------ LZW


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("rps", [4, None])
def test_lzw_roundtrip_matrix(bo, pred, ch, rps):
    """LZW (compression 5) x predictor x byte order x strip layout."""
    w, h = 13, 9
    data = _samples(w, h, ch, seed=ch + pred)
    enc = tiffpix.encode_tiff(w, h, ch, data, byte_order=bo, compression=5,
                              rows_per_strip=rps, predictor=pred)
    assert tiffpix.decode_tiff(enc) == (w, h, ch, data)


def _lcg_bytes(n, seed=1):
    out, s = bytearray(), seed
    for _ in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out.append((s >> 16) & 0xFF)
    return bytes(out)


def test_lzw_width_bumps_and_table_reset():
    """High-entropy streams drive the code table past the 9->10->11->12
    bit boundaries and the 4094-entry Clear reset; runs and empty input
    cover the degenerate shapes."""
    for d in (b"", b"A", b"AAAAAAAA", bytes(range(256)) * 4,
              _lcg_bytes(2000), _lcg_bytes(20000, 7), b"\x00" * 9000,
              _lcg_bytes(60000, 42)):
        assert tiffpix.lzw_decode(tiffpix.lzw_encode(d), len(d)) == d


def test_lzw_defensive():
    good = tiffpix.lzw_encode(b"hello world")
    # output bound enforced
    assert tiffpix.lzw_decode(good, 5) is None
    def pack9(codes):
        acc = nbits = 0
        out = bytearray()
        for c in codes:
            acc = (acc << 9) | c
            nbits += 9
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    # a code beyond next_code is malformed (after Clear+'A', next is 258)
    assert tiffpix.lzw_decode(pack9([256, 65, 400]), 100) is None
    # first code after clear must be a literal
    assert tiffpix.lzw_decode(pack9([256, 300]), 100) is None
    # predictor 2 with no compression is rejected on both sides
    with pytest.raises(ValueError):
        tiffpix.encode_tiff(2, 2, 1, bytes(4), predictor=2)
    raw = tiffpix.encode_tiff(2, 2, 1, bytes(4))
    pred_tag = struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0)
    # splicing a predictor=2 tag into an uncompressed file -> None (spec
    # ties the predictor to a compressor); build via encode then check
    lzw = tiffpix.encode_tiff(3, 3, 1, _lcg_bytes(9), compression=5,
                              predictor=2)
    assert tiffpix.decode_tiff(lzw) == (3, 3, 1, _lcg_bytes(9))


def test_lzw_predictor_shrinks_smooth_gradients():
    grad = bytes((x * 2 + y) & 0xFF for y in range(64) for x in range(64))
    plain = tiffpix.encode_tiff(64, 64, 1, grad, compression=5)
    pred = tiffpix.encode_tiff(64, 64, 1, grad, compression=5, predictor=2)
    assert len(pred) < len(plain) // 2
    assert tiffpix.decode_tiff(plain) == tiffpix.decode_tiff(pred)


# A 40x40 grayscale LZW TIFF written by an INDEPENDENT implementation
# (Java 17 ImageIO's TIFF plugin, MODE_EXPLICIT + "LZW"), pixels from the
# LCG rule below — pins cross-ecosystem bit-compat of the width-change
# rule (the stream crosses the 511 and 1023 table boundaries).
_JAVA_LZW_TIFF_B64 = (
    "TU0AKgAAAAgADAEAAAMAAAABACgAAAEBAAMAAAABACgAAAECAAMAAAABAAgAAAEDAAMA"
    "AAABAAUAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEWAAMAAAAB"
    "ACgAAAEXAAQAAAABAAAIAwEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEoAAMAAAABAAEA"
    "AAAAAAAAAAAAAAEAAAABAAAAAQAAAAGAPhJm9PlZvI11CVsn08n8HPEVot5lhyokEMQF"
    "JpZp1clVtghlAojBVDNRZqsUGFbjMLoAsAdwm81pl7uJWmMVtNSJJ1A0aHIcnYAJg4h9"
    "DNFcg18s0kMVuossJkyoR0rVGJcduh6rcEDRBlZChRcJALo9nhhrAFLuNhKQLJZjuFsr"
    "A5FkOHc4rJPqRmiIhs5zLwzpcZH0CJhahVFA0fnc8kA0B9gLYmCZrBwDgdMvB3i90vBK"
    "EYCEM8EBQGhHiJlOI6pVAqA4iwIi4XHUYp4ZsFuDQTrN3tRjotDixRjAMKFNv8nPsOlZ"
    "SM8ON9irBnpxShUXLcvggWgdmpRbmJ0uw0qVzFsJoQHO93hItOVPg9ptOtKtMDFghoCL"
    "lBPojE2UYQgyQZ7kEVwXESAQsQCDh8hmSwZhgGRrl0IA5FuAxfkGPh3AGVoTBQJhVD+M"
    "ZYhIc4SGYeJuDCEoICYbwvjGTQlhIFQ5A0aIhiaERxBIYZ6g4ShKACPoWDoNJxkiTRQj"
    "8N4DmYe4aEuaoukiZInmoWImgafgbimQIRH0RxqhSQAFGWG4dlmKqjFCehIi6EhogGb5"
    "KE4LxCmqFA0hAVhhnsShiiuZ4rEAIQvFOP56g8Rx4CcYpLE2WwXCYVZ9AQO4eHUIIKlQ"
    "WYYA0SJ+kIdBXGIeBGise5KF8ZxphUS4pn4eoIHMMA1B+bRmE2KAPCUM4iCWIQxjYNom"
    "EOUhImsTAoAkPQsgwUgODiMYOmODZKAOIpIAOcxABoZQkk2QQOEmZ5clMQ4DiIPZKh2d"
    "RonMRpdD6FITFoGANmaG45myJgXjIcr+hcfQkA+JRIAKVw7haB46j0ORkHOSxwjqZhlD"
    "ebpVGaZpTHeZQ7DecZtjyVgoCOAgincPhaHcSJlk8IgInKDpWn6DItHYf4lk4Q4GzYbI"
    "qi2rRyisHYgg8YIAmeaw9mIPQoFIWqnGsGY5icEwOnMEJsmwHAznMD4NjsGBHDiKhAHY"
    "VRvCIHZwl2BJAlsAhdCqdJYksFBdmEeYsgKGJaHuCpNkWKYmFQd4mjwH5uC4eQ2CcLQ7"
    "gYPYKmOHxpksf5ElwF5bmafojG2dYQHIJQaCQfoYEkfo+hIPBUguABFmkZhCAaCoelUB"
    "xxFkY4onycwzH+VBMHIBxgmkZY3i6fB3n0KhICUDQ7mmTIcEoe5ZnQE4dFYaxwFcVo3G"
    "yY5IicSZTCANpbBGZgEEKTomigEZAj4apDk2CRYCAD43g5jqDsKkaQbBlDKAcPcKAiAS"
    "i+CwDIXYdQLAAGMIwFwqB+goACMAfw5hdDWCCE4C4URggZHwAYMgIxUCZBeC4d4mgVBc"
    "GoFsCgawZCTGOK4AItA0jPDEAwLARgzieGmJgVAvQ0hQEOG4EQvgfB7DeHIVoVxpB3HK"
    "LUJgUA6DnEWLQNw9xoAJCAIcUQoQaBoBoLYYY/RLgmE8E4T47w9jrEuGoUCyQkAxCgPo"
    "JoOQHjAGcHkAgxB1j0D+QcGwPgTAfDQIoaoCwKgQH4PsXQgBzjMAeOcJwUgMDNCCM8dQ"
    "DhogwB8Q0BotwVBmC8PMU4Jx/BTF6JgcQiwMAsAsOgUoIA9hkFQGsIQbBOBjBOGsZwLw"
    "3AeFwPATwlwPCuAAA4dQBBrBrGQIwLglBAgIEAHYDIVQwDVFOBARA1B7gFHQEQcIXBLC"
    "sDMIIJIHBIDYEiLIBAHhrjpDoJ4DIpRLgYDEP8EwcQFDQDWBoWQ/xOBBH8IsfAugIhXF"
    "OKwZQuQnj7GAMEOweR+hJE0MwPwwQJAdDOLcUQhgDApHCDgRwiwlhvEeJYEwFwcDXAqD"
    "sJo8w+gyg8JsRA7R5hiFaFUcQFgwAbEyKkbI/QBjYFyP0WQBRZCUDGNMewtwriDDCIsK"
    "IEQyjnDaA4XIjRTg8GCCgE46xeAFCcBYWAkhAg9AqJcXAAAhg2GKIAToowyB1D2KQBAD"
    "xsjIDAI4YIZxVigDwF0YIfg1iFG4MUa49wV01AEBUNYfx0BNB/OkTQXBSC8DIIMO4Dh/"
    "C/FMLwWohwBAPE4JUSIbQKiJHsFMEAPBPgQDGOUWIRx+juFmCIBYlB+BXHsEEbo3BBip"
    "EeGkTAphtixGeNQRgYReDsEoNUf44QACdAQL0ToshWg4DQHgNoHRbhzEEF0FAyRUDwCa"
    "HwWAbwKBjGGHMe47Q7irHSJUSYvx+AkFEOgaQqgdBMGUDoBQGhzBoFKGoPwhAIDSFMJM"
    "BgxwwARBILoQQaQ7juDMDAIYGwpglBqMUVw6Q5hZHAH8MoDADiCCOHMLgKA4DjDOPoL4"
    "hhyBQEUEIOYjhzhKAGCEG4gB+g5AqJEGARBhDPD+C0VozQmBZGKLwUYXg/iIBOIEUwsh"
    "ej2HMOwfQ1gLB2CaOAJIOx2DwEmiMH4mwqiPDAOUJgrR7DcBwGIGwogbDaBAJgPITw+C"
    "sE8DYS4ZRnAsF2LASwnw3hoEMDwOYpxFgcD0M8BgrhShWGOGIYgVQ1AbCWNAeIUgLDDG"
    "EAobo8RFB3DqGwaobRmDjDgIoUQrg/AiAQJsLg7xMh2BtXwLQZgbgVF0JATYjQXB+E8A"
    "kf4vAcChDiPMRgJhpgGGwJUI47gLhZCkFYOwRARD2D8EwUYrx9AFCAGsVo4g8izFqCsF"
    "IDRei9EqBscwhQaB0DmLsIIQQbDeACJgXwchqCYB8Hwf2aRdIRH6KMcgtRZghCYDYMgE"
    "AcjnE0HYTYcBmiAGcEQSAQRTjCD8CoIDvQjiDFcCgH5AQA=="
)


def test_lzw_decodes_java_imageio_output():
    import base64
    payload = base64.b64decode(_JAVA_LZW_TIFF_B64)
    expected = _lcg_bytes(1600, seed=9)
    assert tiffpix.decode_tiff(payload) == (40, 40, 1, expected)


@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("ch", [1, 3])
def test_deflate_roundtrip_and_legacy_tag(pred, ch):
    """Compression 8 (Adobe Deflate, stdlib zlib) round-trips with and
    without the predictor; legacy tag 32946 decodes the same streams."""
    w, h = 11, 7
    data = _samples(w, h, ch, seed=pred)
    enc = tiffpix.encode_tiff(w, h, ch, data, compression=8,
                              rows_per_strip=3, predictor=pred)
    assert tiffpix.decode_tiff(enc) == (w, h, ch, data)
    # rewrite the compression SHORT 8 -> 32946 in the IFD and re-decode
    legacy = enc.replace(struct.pack("<HHI", 259, 3, 1)
                         + struct.pack("<HH", 8, 0),
                         struct.pack("<HHI", 259, 3, 1)
                         + struct.pack("<HH", 32946, 0))
    assert legacy != enc
    assert tiffpix.decode_tiff(legacy) == (w, h, ch, data)


def test_deflate_defensive():
    # corrupt zlib stream -> None, not an exception
    enc = tiffpix.encode_tiff(4, 4, 1, _samples(4, 4, 1), compression=8)
    data_off = 8
    bad = enc[:data_off] + b"\xff\xff" + enc[data_off + 2:]
    assert tiffpix.decode_tiff(bad) is None
    # a stream inflating past the expected strip size is rejected
    big = zlib.compress(b"\x00" * 100000)
    w = h = 4
    raw = tiffpix.encode_tiff(w, h, 1, _samples(w, h, 1), compression=8)
    spliced = raw.replace(zlib.compress(_samples(w, h, 1), 6), big)
    assert tiffpix.decode_tiff(spliced) is None


def test_planar_two_equals_chunky():
    """PlanarConfiguration 2 stores each sample plane in its own strip
    sequence (all plane-0 strips first), predictor differencing within
    the plane: same pixels as chunky, different layout — across byte
    orders, compressions, strip heights."""
    import random as _r
    _r.seed(31)
    for _ in range(40):
        w, h = _r.randint(1, 15), _r.randint(1, 15)
        ch = _r.choice([1, 3])
        px = bytes(_r.randrange(256) for _ in range(w * h * ch))
        bo = _r.choice(["<", ">"])
        comp = _r.choice([1, 5, 8, 32773])
        pred = _r.choice([1, 2]) if comp != 1 else 1
        rps = _r.choice([None, 1, 3])
        chunky = tiffpix.decode_tiff(tiffpix.encode_tiff(
            w, h, ch, px, bo, comp, rps, predictor=pred, planar=1))
        planar = tiffpix.decode_tiff(tiffpix.encode_tiff(
            w, h, ch, px, bo, comp, rps, predictor=pred, planar=2))
        assert chunky == (w, h, ch, px)
        assert planar == chunky


def test_planar_defensive():
    import random as _r
    good = tiffpix.encode_tiff(6, 5, 3, bytes(range(90)), "<", 5,
                               2, predictor=2, planar=2)
    for cut in range(0, len(good), 4):
        r = tiffpix.decode_tiff(good[:cut])
        assert r is None or isinstance(r, tuple)
    _r.seed(13)
    for _ in range(60):
        b = bytearray(good)
        b[_r.randrange(len(b))] ^= 0xFF
        r = tiffpix.decode_tiff(bytes(b))
        assert r is None or isinstance(r, tuple)


def test_tiled_equals_strips():
    """Tiled layout (TIFF 6.0 §15, tags 322-325): same pixels as the
    strip layout across byte orders × compressions × predictor ×
    planar configs × tile geometries; edge tiles are stored padded to
    the full tile size and cropped on decode."""
    import random as _r
    _r.seed(47)
    for _ in range(60):
        w, h = _r.randint(1, 45), _r.randint(1, 45)
        ch = _r.choice([1, 3])
        px = bytes(_r.randrange(256) for _ in range(w * h * ch))
        bo = _r.choice(["<", ">"])
        comp = _r.choice([1, 5, 8, 32773])
        pred = _r.choice([1, 2]) if comp != 1 else 1
        planar = _r.choice([1, 2])
        ts = _r.choice([(16, 16), (32, 16), (16, 48)])
        tiled = tiffpix.decode_tiff(tiffpix.encode_tiff(
            w, h, ch, px, bo, comp, predictor=pred, planar=planar,
            tile_size=ts))
        assert tiled == (w, h, ch, px)


def test_tiled_white_is_zero_and_multi_tile_grid():
    """A 40x33 WhiteIsZero grayscale image spans a 3x3 grid of 16x16
    tiles (right/bottom padding cropped); decode normalizes to
    black=0."""
    w, h = 40, 33
    px = _samples(w, h, 1, seed=3)
    p = tiffpix.encode_tiff(w, h, 1, bytes(255 - b for b in px),
                            compression=32773, photometric=0,
                            tile_size=(16, 16))
    assert tiffpix.decode_tiff(p) == (w, h, 1, px)


def test_tiled_defensive():
    """Non-multiple-of-16 tile dims, strip+tile tag mix, truncation and
    bit flips: reject (None) or decode to a tuple — never raise."""
    import random as _r
    with pytest.raises(ValueError):
        tiffpix.encode_tiff(8, 8, 1, bytes(64), tile_size=(8, 8))
    good = tiffpix.encode_tiff(20, 20, 3, _samples(20, 20, 3), "<", 5,
                               predictor=2, planar=2, tile_size=(16, 16))
    assert tiffpix.decode_tiff(good) == (20, 20, 3, _samples(20, 20, 3))
    for cut in range(0, len(good), 7):
        r = tiffpix.decode_tiff(good[:cut])
        assert r is None or isinstance(r, tuple)
    _r.seed(17)
    for _ in range(60):
        b = bytearray(good)
        b[_r.randrange(len(b))] ^= 0xFF
        r = tiffpix.decode_tiff(bytes(b))
        assert r is None or isinstance(r, tuple)
    # tile dims patched to a non-multiple of 16 → None (find tag 322)
    bad = bytearray(good)
    ifd_off = struct.unpack("<I", bad[4:8])[0]
    n = struct.unpack("<H", bad[ifd_off:ifd_off + 2])[0]
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        if struct.unpack("<H", bad[e:e + 2])[0] == 322:
            bad[e + 8:e + 10] = struct.pack("<H", 12)
    assert tiffpix.decode_tiff(bytes(bad)) is None


def test_lzw_final_code_early_change_boundary():
    """The decoder adds a table entry while processing the FINAL data
    code; when that add lands exactly on the 511/1023/2047 early-change
    threshold, EOI must be written one bit wider (libtiff
    LZWPostEncode's phantom free_ent++). Random (incompressible) inputs
    reliably cross the 1023 boundary near ~770 emitted codes — fuzz a
    band of lengths around every threshold."""
    import random as _r
    _r.seed(53)
    for nlen in list(range(250, 262)) + list(range(760, 775)) + [1800]:
        for _ in range(20):
            v = bytes(_r.randrange(256) for _ in range(nlen))
            assert tiffpix.lzw_decode(tiffpix.lzw_encode(v), nlen) == v


# 37x29 16-bit grayscale TIFFs written by Java 17 ImageIO
# (TYPE_USHORT_GRAY, LZW / Deflate), pixels from the LCG64 rule below —
# pins cross-ecosystem bit-compat of the 16-bit decode path (predictor-
# free; 16-bit LZW streams + high-byte downscale)
_JAVA_T16_LZW = (
    "TU0AKgAAAAgADQEAAAMAAAABACUAAAEBAAMAAAABAB0AAAECAAMAAAABABAAAAEDAAMA"
    "AAABAAUAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAvAEVAAMAAAABAAEAAAEWAAMAAAAB"
    "AB0AAAEXAAQAAAABAAALGgEaAAUAAAABAAAArAEbAAUAAAABAAAAtAEoAAMAAAABAAEA"
    "AAFTAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAGAD0MLwHjsDLl/Dh6rd2jZ"
    "yLVtjRprNlDJhLFcjBYK9UC5Pq1LixHKtCio+qk6Cg2KcxiYtKUpCQkqMgiIcKEYCATp"
    "8PB4LJ0GhwCpp+Bl5ph1hdxJZtBVopRkBNgJJbhFXpBTA9Oo5Kg1GIxCAs9oo5Ak1Igw"
    "gcsoYoAUjoQfgMbIIXAESoAOP8KH4Fv0Bnt9Pp4nl0vhwHdsPZnnVjPRfHNavJWnFSPB"
    "OG9Ju5FG1BOw8ms4uo0GkvugrmcnOYjGUeuQaGMWOIRmENuAJF8Et4Alx8Nt4FpztlvF"
    "hrNdmlZitVeFRZtNVlJRNFNFBIs9EE5AM07kw3sszEouskqkgmMciEYdsUZEQVMMQkIM"
    "sEIEAEL5/j17Lx3DtyrpuhyahcGWG5hlsXQalkWhUhmUBZEwGJHlgQ4Xj8Vw6haNpWDI"
    "FYuFUKYUiUVAhBOHJTBiEoUFID4RguUQHBCAxPn6Dx6E6dgOHGTZtg0aRMmSDBgkuXAL"
    "FgSpTgoTxJksCRGkiQoID4R46AcNZGjEBgtEWKIFCSRL6BvCYDBMQoPAICpBgYAQCEAf"
    "Z/nmPx1H6cI+GyfZoD0ZB8l+PBbHuVw7FKepOjoSh5kWORBniPQ4Dkd40jcMB2iwNgnn"
    "WI41B8dIajQFpzhIMwOHKCYyAUcYBDCfJwHi0pvHALprm4ZwtmMbReiyWpsFYK5RmsTY"
    "qkkahFCmQJpDwKI4GgM4ni+ZwrCaJpmCKJYeGUGgkhWZARCODRjAiIoEmIAAhHuYJ3iA"
    "cxfm8Hxql6ZgeGIXZdh0WZclUm5bkyGxIFqRAaD+WY7BkNxYjKGAuleKgXCYVohhYHRV"
    "hkFQUlSEIUAwU4HhMA5SH8EZ7FEdoQnIUBuA+aZPGWDphE4XINliTRUAyUBMEuC5HEsQ"
    "wKj6Sg6gmNhJDGCItkgKQHiURwggaHBGBgBYTkUD4EgsRAGgOApCn4Ah6EGdYBHGQJtA"
    "AaI/mSfxgD6XB+FePZTH0Tw8kqfBGjuQh7D2Oo5noNQ5jEeQsjiKB4CQN4fncG42hcdg"
    "SjWDp1AoNIGHQAYzH0cp5DIdJxnCMRsHCZ4wGOb5fC8WxulaLhSG2TgtEmbJFiwQRrjy"
    "Kw4mqNAqDAaYrikJ5oiMKAemeGonBYZoSCYDZlgkJQFGSAIjnyYx4CKc5iG+IZrGEZwg"
    "mKYBeB+WhfFWHpRl4TQdkiXREhyQBcDwG43lsMwai8WgqhmJpZCIGIdlgGYLwVCuBEC0"
    "DIrAIArAQKkf4KB7inHcCYcopRugkGoKMZgIhhihF2CAWQnxUgeFCJ0TAHBICbEOBoPw"
    "mQ7AYDaJcMoFguCVCmBQJYkwhASB0JEGIEAUCPBAA4C4jQHgMAMIofoCR6iIHYAccghh"
    "tgFGkIQZQAxgiCFyAEWAgBTj/E+H4Sw/RHB8EKPsPgeg6D5DWHgMY9wtB2CiPUJIdAgD"
    "zBwHIF48QThwA8O8CobgGjtAIGsfg6h5hpHUOgcQZxsjmGiGUZA5BfhjFuOIVwYRTDgE"
    "6F8Sg3hGBdEGNwPYWw5DaDSFkMI2AsBXCgNYI4VQfDUBsFMFo0gShRA4NACYTwFjOAEE"
    "wfQyx4hKHQMkcASBrjHGeEYYwxRehEFqMMVgQhSDBE2EASYvxFA+ECL0PIPA4C7DQDoL"
    "4uQrA4CcLcIoNgei1BoDQFYswRgyA0LECQMAEivAAC0fArB3grHOKobwKRqioGaCcYgp"
    "heAlFmKQVQIxRCiEyCESIoBEAfD+J4O4HQ3CcDMBsLomgqAZCYJgIYFwdiWBkBUFIlAQ"
    "gTAwJICAEQDiPH+A4ewjR2gMHKIsbgChqCJGWAgYQhxdAGFiIUVIBBQCDEuAIR4gRDAA"
    "D8H8Oo/g2B9DIPwLYewpj6CUHkII+Ach3BgPYFAdQPj0AsHMBw8gChwH6O8egbh1jtHG"
    "GwbQ6xpBqGSOkYAaBcDnFeGYU45RPBkEqONKwhE5hgDmN8NYXgxDdCyFwKI2wkBaCANk"
    "G4WAXDXBMFYDo1QKhUAYNMAYUU7DyCeOoZw4QmjYGYNAJYxxlC/CSLYZArQjilGMJwIo"
    "lBiCLCGIIYQegghxGAGkH4YBfBXB6E8Xh6AfIHByCwXAJAbgbFsBMGoChaABBkPkWI8A"
    "YDoFeN+z4rRnAsGKKsXoKkFCsBQKMU4mgTCSFKIkEggRRh4BEG8UIZwQBeE+FYDwTROh"
    "EA4DwTYMwNArEyCIDAGRLgRAsAgSoAAJj3EkO4CI5hIDdAeNURwzAGjDEYLsBYshFCqA"
    "SKERAmADiQEMIcAofxCB2AGG4QQZTdiACoP8JYfghj9B0HwGI+wUh6BAPkDAeAHj3ANV"
    "Ueg9Q5jtHkOQOJvhphvGUO4YQbRcjsFgGsVA6hPhpEuOgRwZxCjmD6GUOg5A2BjDGOIL"
    "QYQpDgCSF8II3gcBdBeNwE4WwPDaAsFkBo2ACBWH4NUeYVB1jTHEFIbQ0RohQGQM8YE5"
    "xmivCYKYZYnQlCVGSIwJAhBjh7CMHIYoagiBhGGFkIQUBghHCAD8X4NgfAuF6CUHgHBd"
    "gUB0AsXIAwbj6FsPEGo6RaDgBmNgWQzwYjGFgL4F4tRXCtBaKQVgmwViTFUIoFIghUB5"
    "jyKYNAJQvikCuCMJwogjAhB6KAGgHwWCeBGB0DYnAJAbASJoAIGB8CXHgBYc4lRvAUGs"
    "JMZoEhiiRF4BAWYjxVgOFEI0TQDBIiLEQAoQAiQ7gIDeIcMwBguiFCqAQJggwiACB2IE"
    "GQAAVB/BCP4DIfQID8AOHof4+R7B4HcPccodhuD1GoHQZY8xhhyF0PEWQcBUjvFAG4TA"
    "7RHhsEOOsPwag6jpDaGgMg5wuBmCmOUJQZAhDjByGIGI4QUBgA+N8C4XgHDdAMFsfo2h"
    "6BZHYNgcYVxtjWGkFUZI1BghTFwNIWAURTjQE8E8SwzhGhNEKMwPgSw5jKDWEkMQyAtB"
    "HCiMYJARQgDEBuEMF4wgTBBA8MACoPwGC+AIDwfYux5g6HULkcIOBsi3GgDYZAtRfg0F"
    "sLMVwMhSixE6DASgrxFguEGK0PQLA5CrDSCoMAqQsAoCeKcI4JgfClBqCQFoowSAiA4K"
    "ECYIAFCfAEB0fInB4gbHQJob4GRriYGcAuGMEsF6AqFoEoFYAmFGEkE2AiEkEgEUAeEC"
    "EcDwAaDgEYDOAWC+EUCsASCaEQCKAOB4EMBoAKBWEIBEAGA0EEAiACASEAAAH8HuD6He"
    "H4HMD2G8H0GqDyGYHwGIDuF2HsFmDqFUHoFCDmEyHkEgDiEQHgD+DeDsHcDcDaDKHYC6"
    "DWCoHUCWDSCGHQB0DOBkHMBSDKBAHIAwDGAeHEAODAH8G+HsC8HaG6HIC4G4G2GmC0GW"
    "GyGECwFyGuFiCsFQGqFACoEuGmEcCkEMGiD6CgDqGeDYCcDGGaC2CYCkGWCUCUCCGSBw"
    "CQBgGOBOCMA+GKAsCIxSAKCCH4GAHoB+HWF8HEB6G0F4GiB2GSF0GAByFuFwFeBuFMFs"
    "E8BqEqFoEaBmEIFkD2BiDmFgDUBeDEFcCyBaCgFYCQBWB+FUBuBSBcFQBKBOA6FMAoBK"
    "AYFIAGBEH0FCHkBAHSE+HCA8GwE6GeA4GOE2F8A0FsEyFaAwFIEuE4AsEmEqEWAoEEEm"
    "DyAkDiEiDQAgDAEeCuAcCcEaCMAYB6EWu+BYESBGAQA2EOAkAMAUEKACAGHyEEHgACHO"
    "EAG+H+GsD8GcH6GKD4F4H2FoD0FWHyv+E0HuEiDsESHqEADoDwHmDeDkDMHiC8DgCqHe"
    "CaDcCIHaB2DYBmHWBUDUBEHSAyIC"
)

_JAVA_T16_ZIP = (
    "TU0AKgAAAAgADQEAAAMAAAABACUAAAEBAAMAAAABAB0AAAECAAMAAAABABAAAAEDAAMA"
    "AAABgLIAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAvAEVAAMAAAABAAEAAAEWAAMAAAAB"
    "AB0AAAEXAAQAAAABAAAIbQEaAAUAAAABAAAArAEbAAUAAAABAAAAtAEoAAMAAAABAAEA"
    "AAFTAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAF42gFiCJ33PRi8DzsGuf44"
    "9bftNuS12zTTs8oywrG5MLCvqC6frZcsjquFKn2pdChsp2MmWqVSJEmjQSI4oTAgJ58e"
    "HhadDRwFmvwZ85jrF+KW2hXRlMgTwJK3Ea+Qpg+djpUNjIyEC3uKcglqiGEHWYZQBUeE"
    "PwM2gi4BJYAc/xR+C/0De/r68Xnp+OB32PbPdcb0vnO18q1xpPCcb5Puim2C7Hlrcepo"
    "aV/oV2dO5kZlPeQ0YyziI2Eb4BJfCd4BXPjb8Frn2d5Y1tfNVsXVvFSz06tSotGaUJHP"
    "iE6AzXdMb8tmSl3JVUhMx0RGO8UyRCrDIUIZwRBACL7/Pfa87jvlut051LjLN8O2ujWy"
    "tKkzoLKYMY+why9+rnUtbaxkK1yqUylKqEInOaYxJSikHyMXog4hBp/9HvSd7Bzjm9sa"
    "0pnJGMGXuBawlacUnpOWEo2RhRB8j3QOa41iDFqLUQpJiUAIN4cvBiaFHgQVgwwCBID7"
    "//N+6v3hfNn70HrI+b94tveudqX1nXSU84tyg/F6cHLvaW5g7VhsT+tHaj7pNWgt5yRm"
    "HOUTZArjAmH54PFf6N7gXdfczlvG2r1ZtdisV6PWm1WS1IpTgdJ4UXDQZ09fzlZNTcxF"
    "SzzKNEkryCJHGsYRRQnEAEL3we9A5r/ePtW9zDzEu7s6s7mqOKG3mTaQtYg0f7N2Mm6x"
    "ZTBdr1QuTK1DLDqrMiopqSEoGKcPJgek/iP2ou0h5KDcH9Oeyx3CnLkbsZqoGaCYlxeO"
    "loYVfZR1E2ySYxFbkFIPSo5BDTiMMAsnih8JFogNBwWF/AT0g+sC44HaANF/yf7Afbj8"
    "r3um+p55lfiNd4T2e3Vz9GpzYvJZcVDwSG8/7jdtLuwlax3qFGkM6ANm+uXyZOnj4WLY"
    "4c9gx9++XrbdrVyk25xak9mLWILXeVZx1WhUYNNXUk/RRlA9zzVOLM0kTBvLEkoKyQFH"
    "+cbwRefE30PWws5BxcC8P7S+qz2jvJo7kbqJOYC4eDdvtmY1XrRVM02yRDE7sDMvKq4i"
    "LRmsECsIqf8o96fuJuWl3STUo8wiw6G7ILKfqR6hnZgckJuHGn6Zdhhtl2UWXJVTFEuT"
    "QhI6kTEQKI8gDheNDwwGiv0J9YjsB+SG2wXShMoDwYK5AbCAp/+ffpb9jnyF+3x6dPlr"
    "eGP3WnZR9Ul0QPM4ci/xJ3Ae7xVuDe0Ea/zq82nq6OJn2ebRZcjkv2O34q5hpuCdX5Te"
    "jF2D3HtbctppWWHYWFdQ1kdVPtQ2Uy3SJVEc0BNPC84CTPrL8UroyeBI18fPRsbFvUS1"
    "w6xCpMGbQJO/ij6BvXk8cLtoOl+5VjhOt0U2PbU0NCuzIzIasRIwCa8ALfis7yvnqt4p"
    "1ajNJ8SmvCWzpKojoqKZIZGgiB9/nncdbpxmG12aVBlMmEMXO5YyFSmUIRMYkhARB4//"
    "DvaN7Qzli9wK1InLCMKHugaxhakEoIOXAo+BhgB+f3X+bH1k/Ft7U/pKeUH4OXcw9ih1"
    "H/QWcw7yBXD97/Ru6+3jbNrr0mrJ6cBouOevZqflnmSV441ihOF8YHPfa15i3VlcUdtI"
    "WkDZN1gu1yZWHdUVVAzTA1H70PJP6s7hTdjM0EvHyr9JtsitR6XGnEWUxItDgsJ6QXHA"
    "aT9gvlc9T7xGOz66NTksuCQ3G7YTNQq0ATL5sfAw6K/fLtetzizFq70qtKmsKKOnmiaS"
    "pYkkgaN4Im+hZyBen1YeTZ1EHDybMxormSIYGZcRFgiVABP3ku4R5pDdD9WOzA3DjLsL"
    "soqqCaGImAeQhocFf4R2A26CZQFcgFT/S35D/Tp8MfspeiD5GHgP9wZ1/vT1c+3y5HHb"
    "8NNvyu7CbbnssGuo6p9pl+iOZ4XmfWV05GxjY+JaYVLgSV9B3jhdL9wnWx7aFlkN2ARW"
    "/NXzVOvT4lLa0dFQyM/ATrfNr0ymy51KlcmMSITHe0ZyxWpEYcNZQlDBR0A/vzY+Lr0l"
    "PBy7FDoLuQM3+rbxNem04DPYss8xxrC+L7WurS2krJsrk6qKKYKoeSdwpmglX6RXI06i"
    "RiE9oDQfLJ4jHRucEhsJmgEY+JfwFueV3hTWk80SxZG8ELOPqw6ijZoMkYuICoCJdwhv"
    "h2YGXYVVBEyDRAI7gTIAKn8h/hl9EPwHev/59nju9+V23PXUdMvzw3K68bJwqe+gbpjt"
    "j2yH635qdeltaGTnXGZT5UpkQuM5YjHhKGAf3xdeDt0GW/3a9Fns2ONX29bSVcnUwVO4"
    "0rBRp9CeT5bOjU2FzHxLc8prSWLIWkdRxkhFQMQ3Qy/CJkEewBU/DL4EPPu78zrqueE4"
    "2bfQNsi1vzS2s64ypbGdMJSviy6DrXoscqtpKmCpWChPp0cmPqU1JC2jJCIcoRMgCp8C"
    "Hfmc8Rvomt8Z15jOF8aWvRW0lKwTo5KbEZKQig+BjngNcIxnC1+KVglNiEUHPIY0BSuE"
    "IgMaghEBCYAA/vd97/zme9761XnM+MR3u/azdar0oXOZ8pBxiPB/b3bubm1l7F1rVOpL"
    "aUPoOmcy5illIOQYYw/iB2D+3/Ze7d3kXNzb01rL2cJYudexVqjVoFSX045ShtF9UHXP"
    "bE5jzVtMUstKSkHJOEgwxydGH8UWRA3DBUH8wPQ/677iPdq80TvJusA5t7ivN6a2njWV"
    "tI0zhLJ7MXOwai9irlktUKxIKz+qNykuqCUnHaYUJQykAyL6ofIg6Z/hHtidzxzHm74a"
    "tpmtGKSXnBaTlYsUgpN5EnGRaBBgj1cOTo1GDD2LNQosiSMIG4cSBgqFAQP5gvAB54Df"
    "/9Z+zv3FfLz7tHqr+aN4mveRdon1gHR4829yZvFecFXvTW5E7TtsM+sqaiLpGdYuKg0="
)


def _java16_high_bytes(seed, w, h):
    M = (1 << 64) - 1
    return bytes(((((seed * 6364136223846793005 + i * 1442695040888963407)
                    & M) >> 24) & 0xFFFF) >> 8 for i in range(w * h))


def test_java_imageio_16bit_fixtures_decode_exact():
    import base64
    exp = _java16_high_bytes(7, 37, 29)
    for b64 in (_JAVA_T16_LZW, _JAVA_T16_ZIP):
        assert tiffpix.decode_tiff(base64.b64decode(b64)) == (37, 29, 1, exp)


def test_16bit_roundtrip_matrix():
    """bits=16 across byte orders x compressions x predictor x planar x
    strips/tiles: fixtures store v*257 so the high-byte decode recovers
    the 8-bit input exactly; predictor 2 differences per 16-BIT VALUE
    (libtiff horAcc16), not per byte."""
    import random as _r
    _r.seed(59)
    for _ in range(50):
        w, h = _r.randint(1, 40), _r.randint(1, 40)
        ch = _r.choice([1, 3])
        px = bytes(_r.randrange(256) for _ in range(w * h * ch))
        bo = _r.choice(["<", ">"])
        comp = _r.choice([1, 5, 8, 32773])
        kw = dict(byte_order=bo, compression=comp,
                  predictor=_r.choice([1, 2]) if comp != 1 else 1,
                  planar=_r.choice([1, 2]), bits=16)
        if _r.random() < 0.5:
            kw["tile_size"] = (16, 16)
        else:
            kw["rows_per_strip"] = _r.choice([None, 1, 3])
        assert tiffpix.decode_tiff(
            tiffpix.encode_tiff(w, h, ch, px, **kw)) == (w, h, ch, px)


def test_16bit_predictor_is_value_wise_not_byte_wise():
    """A 16-bit gradient that increments by 1 per pixel has constant
    16-bit differences but NON-constant byte differences — value-wise
    predictor 2 makes LZW collapse it; byte-wise would corrupt it."""
    w, h = 64, 4
    px = bytes((i * 1) % 256 for i in range(w * h))
    plain = tiffpix.encode_tiff(w, h, 1, px, compression=5, bits=16)
    pred = tiffpix.encode_tiff(w, h, 1, px, compression=5, predictor=2,
                               bits=16)
    assert tiffpix.decode_tiff(pred) == tiffpix.decode_tiff(plain)         == (w, h, 1, px)
    assert len(pred) < len(plain)


def test_16bit_white_is_zero():
    px = _samples(9, 7, 1, seed=2)
    p = tiffpix.encode_tiff(9, 7, 1, bytes(255 - b for b in px),
                            compression=8, photometric=0, bits=16)
    assert tiffpix.decode_tiff(p) == (9, 7, 1, px)


def test_jpeg_in_tiff_exact_on_constant_blocks():
    """Compression 7 (TIFF Tech Note 2): strips and tiles each hold a
    standalone baseline JPEG; constant 8x8 blocks decode exactly, and
    8-aligned strip/tile splits preserve them — across byte orders and
    the JPEGTables (tag 347) abbreviated-stream convention. Dev-time
    cross-pin: Java 17 ImageIO read all four layouts of these files
    pixel-exact (raster samples)."""
    def rule_px(w, h, i):
        return bytes((((x // 8) * 3 + (y // 8) * 5 + i) % 128) * 2
                     for y in range(h) for x in range(w))
    for i in range(12):
        w, h = 8 + 8 * (i % 3), 8 + 8 * ((i * 2) % 3)
        px = rule_px(w, h, i)
        for kw in (dict(), dict(rows_per_strip=8),
                   dict(tile_size=(16, 16)),
                   dict(rows_per_strip=8, use_jpeg_tables=True),
                   dict(tile_size=(16, 16), use_jpeg_tables=True)):
            p = tiffpix.encode_tiff_jpeg(
                w, h, 1, px, byte_order="<" if i % 2 else ">", **kw)
            assert tiffpix.decode_tiff(p) == (w, h, 1, px), (i, kw)


def test_jpeg_in_tiff_color_matches_plain_jpeg():
    """A color (photometric 6 / YCbCr) compression-7 TIFF decodes to the
    same RGB as the equivalent standalone JPEG — strip splitting is
    invisible for 8-aligned constant blocks."""
    from docext_spark.core import jpegpix
    for i in range(4):
        w, h = 16, 16
        ycc = bytes(((x // 8) * 2 + (y // 8) * 7 + c * 31 + i) % 128 * 2
                    for y in range(h) for x in range(w) for c in range(3))
        jd = jpegpix.decode_jpeg(jpegpix.encode_jpeg_ycbcr(
            w, h, ycc[0::3], ycc[1::3], ycc[2::3]))
        for kw in (dict(rows_per_strip=8),
                   dict(tile_size=(16, 16), use_jpeg_tables=True)):
            assert tiffpix.decode_tiff(
                tiffpix.encode_tiff_jpeg(w, h, 3, ycc, **kw)) == jd


def test_jpeg_in_tiff_defensive():
    import random as _r
    def rule_px(w, h, i):
        return bytes((((x // 8) * 3 + (y // 8) * 5 + i) % 128) * 2
                     for y in range(h) for x in range(w))
    good = tiffpix.encode_tiff_jpeg(24, 16, 1, rule_px(24, 16, 5),
                                    tile_size=(16, 16),
                                    use_jpeg_tables=True)
    for cut in range(0, len(good), 11):
        r = tiffpix.decode_tiff(good[:cut])
        assert r is None or isinstance(r, tuple)
    _r.seed(23)
    for _ in range(120):
        b = bytearray(good)
        b[_r.randrange(len(b))] ^= 0xFF
        r = tiffpix.decode_tiff(bytes(b))
        assert r is None or isinstance(r, tuple)
