"""VP8L (WebP lossless) pixel decode (core/vp8lpix.py): encoder
round-trips, and hand-assembled bitstreams pinning each decoder feature
the fixture encoder does not emit — LZ77 backward references through both
distance branches, the color cache, palette packing at every width,
predictor modes incl. the TR wrap, the color transform, meta-Huffman tree
groups, and two-symbol simple codes. Every stream is built bit-by-bit
from the public spec's rules (RFC 9649 §4), so the decoder is pinned
against the spec text, not just against its own encoder.

Reference parity: the accepted-extension predicate includes ``webp``
(reference docext/core/utils.py:56-70; PIL decodes it at
core/utils.py:13-15). Lossy VP8 stays an honest None."""
from __future__ import annotations

import struct

import pytest

from docext_spark.core import imagehdr, vp8lpix
from docext_spark.core.vp8lpix import (GREEN_BASE, NUM_LENGTH_CODES,
                                       BitWriter, _write_simple1,
                                       encode_webp_lossless,
                                       write_code_from_lengths)


def _rgb(w, h, seed=0):
    return bytes((x * 7 + y * 13 + c * 23 + seed * 3) % 256
                 for y in range(h) for x in range(w) for c in range(3))


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: BitWriter, w: int, h: int):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


# ---- encoder round-trips -------------------------------------------------

@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 1), (1, 9), (13, 7)])
@pytest.mark.parametrize("sg", [False, True])
def test_roundtrip_literal_and_subtract_green(w, h, sg):
    rgb = _rgb(w, h, seed=w + h)
    dec = vp8lpix.decode_webp(encode_webp_lossless(w, h, rgb,
                                                   subtract_green=sg))
    assert dec == (w, h, 3, rgb)


def test_imagehdr_agreement():
    """The independently written webp_dims header parser (imagehdr.py,
    round 5) must agree with the full decoder on the same bytes — two
    separate transcriptions of the 14-bit dims layout."""
    enc = encode_webp_lossless(11, 6, _rgb(11, 6))
    assert imagehdr.sniff_format(enc) == "webp"
    assert imagehdr.parse_dims(enc) == ("webp", 11, 6)
    assert vp8lpix.decode_webp(enc)[:2] == (11, 6)


# ---- hand-built streams: LZ77 --------------------------------------------

def test_lz77_copy_left_and_above():
    """4x2: one literal, then a dist_code=1 run (map entry (1,0): copy
    left) fills row 0, then dist_code=2 ((0,1): copy above) fills row 1.
    Length prefix symbols 258/259 (values 3/4) ride the green tree."""
    bw = BitWriter()
    _header(bw, 4, 2)
    bw.write(0, 1)                       # no transforms
    bw.write(0, 1)                       # no cache
    bw.write(0, 1)                       # no meta
    glens = [0] * (GREEN_BASE + NUM_LENGTH_CODES)
    glens[50] = 1                        # literal green
    glens[GREEN_BASE + 2] = 2            # length prefix 2 -> length 3
    glens[GREEN_BASE + 3] = 2            # length prefix 3 -> length 4
    g = write_code_from_lengths(bw, glens)
    _write_simple1(bw, 60)               # red
    _write_simple1(bw, 70)               # blue
    _write_simple1(bw, 255)              # alpha
    dlens = [0] * 40
    dlens[0] = 1                         # prefix 0 -> dist_code 1 -> (0,1)
    dlens[1] = 1                         # prefix 1 -> dist_code 2 -> (1,0)
    d = write_code_from_lengths(bw, dlens)
    bw.write_code(*g[50])                # literal (a=255, r=60, g=50, b=70)
    bw.write_code(*g[GREEN_BASE + 2])    # copy 3
    bw.write_code(*d[1])                 # dist 1 (left)
    bw.write_code(*g[GREEN_BASE + 3])    # copy 4
    bw.write_code(*d[0])                 # dist w (above)
    dec = vp8lpix.decode_webp(_wrap(b"\x2f" + bw.bytes()))
    assert dec == (4, 2, 3, bytes([60, 50, 70]) * 8)


def test_lz77_linear_distance_branch():
    """dist_code > 120 takes the plain linear branch: a 3x1 image where
    pixel 2 copies pixel 0 (distance 2 = dist_code 122 via extra bits)."""
    bw = BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    glens = [0] * (GREEN_BASE + NUM_LENGTH_CODES)
    glens[10] = glens[20] = 2
    glens[GREEN_BASE + 0] = 1            # length prefix 0 -> length 1
    g = write_code_from_lengths(bw, glens)
    _write_simple1(bw, 0)                # red
    _write_simple1(bw, 0)                # blue
    _write_simple1(bw, 255)              # alpha
    dlens = [0] * 40
    # dist_code 122: prefix 13 -> extra_bits=5, offset=(2+1)<<5=96,
    # value = 96 + extra_val + 1 = 122 -> extra_val = 25
    dlens[13] = 1
    dlens[12] = 1                        # unused: completes the code
    d = write_code_from_lengths(bw, dlens)
    bw.write_code(*g[10])                # px0 g=10
    bw.write_code(*g[20])                # px1 g=20
    bw.write_code(*g[GREEN_BASE + 0])    # copy length 1
    bw.write_code(*d[13])
    bw.write(25, 5)                      # extra bits -> dist_code 122
    dec = vp8lpix.decode_webp(_wrap(b"\x2f" + bw.bytes()))
    assert dec == (3, 1, 3, bytes([0, 10, 0, 0, 20, 0, 0, 10, 0]))


# ---- hand-built stream: color cache --------------------------------------

def test_color_cache_hit():
    """2x1 with a 4-bit cache: pixel 1 is a cache reference to pixel 0's
    slot (hash 0x1e35a7bd * argb >> 28)."""
    px = (255 << 24) | (9 << 16) | (40 << 8) | 77
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 28
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)                       # no transforms
    bw.write(1, 1)                       # color cache
    bw.write(4, 4)                       # cache_bits = 4
    bw.write(0, 1)                       # no meta
    glens = [0] * (GREEN_BASE + NUM_LENGTH_CODES + 16)
    glens[40] = 1                        # literal green
    glens[GREEN_BASE + NUM_LENGTH_CODES + idx] = 1      # cache symbol
    g = write_code_from_lengths(bw, glens)
    _write_simple1(bw, 9)
    _write_simple1(bw, 77)
    _write_simple1(bw, 255)
    _write_simple1(bw, 0)                # distance (unused)
    bw.write_code(*g[40])
    bw.write_code(*g[GREEN_BASE + NUM_LENGTH_CODES + idx])
    dec = vp8lpix.decode_webp(_wrap(b"\x2f" + bw.bytes()))
    assert dec == (2, 1, 3, bytes([9, 40, 77] * 2))


# ---- hand-built streams: palette -----------------------------------------

def _palette_stream(w, indices, palette):
    """Color-indexing transform + packed main image, palette entries
    delta-coded with a two-symbol simple alpha code (255 then 0s)."""
    wb = vp8lpix._palette_width_bits(len(palette))
    bw = BitWriter()
    _header(bw, w, 1)
    bw.write(1, 1)                       # transform present
    bw.write(3, 2)                       # COLOR_INDEXING
    bw.write(len(palette) - 1, 8)
    # palette image (len x 1): literal ARGB deltas
    bw.write(0, 1)                       # no cache
    deltas = []
    prev = (0, 0, 0, 0)
    for (r, g, b) in palette:
        cur = (255, r, g, b)
        deltas.append(tuple((cur[i] - prev[i]) & 0xFF for i in range(4)))
        prev = cur
    gl = sorted({d[2] for d in deltas})
    rl = sorted({d[1] for d in deltas})
    bl = sorted({d[3] for d in deltas})

    def tree(bw, vals, alphabet):
        if len(vals) == 1:
            _write_simple1(bw, vals[0])
            return {vals[0]: None}
        lens = [0] * alphabet
        depth = max(1, (len(vals) - 1).bit_length())
        short = (1 << depth) - len(vals)
        for i, v in enumerate(vals):
            lens[v] = depth - 1 if i < short and depth > 1 else depth
        return write_code_from_lengths(bw, lens)

    gcodes = tree(bw, gl, GREEN_BASE + NUM_LENGTH_CODES)
    rcodes = tree(bw, rl, 256)
    bcodes = tree(bw, bl, 256)
    acodes = tree(bw, sorted({d[0] for d in deltas}), 256)
    _write_simple1(bw, 0)                # distance

    def emit(codes, v):
        if codes[v] is not None:
            bw.write_code(*codes[v])

    for (a, r, g, b) in deltas:
        emit(gcodes, g)
        emit(rcodes, r)
        emit(bcodes, b)
        emit(acodes, a)
    bw.write(0, 1)                       # no more transforms
    # packed main image
    ppp = 1 << wb
    bpp = 8 >> wb
    packed = []
    for p0 in range(0, len(indices), ppp):
        v = 0
        for j, ix in enumerate(indices[p0:p0 + ppp]):
            v |= ix << (bpp * j)
        packed.append(v)
    bw.write(0, 1)                       # no cache
    bw.write(0, 1)                       # no meta (main image reads it)
    vals = sorted(set(packed))
    pcodes = tree(bw, vals, GREEN_BASE + NUM_LENGTH_CODES)
    _write_simple1(bw, 0)                # red
    _write_simple1(bw, 0)                # blue
    _write_simple1(bw, 255)              # alpha
    _write_simple1(bw, 0)                # distance
    for v in packed:
        if pcodes[v] is not None:
            bw.write_code(*pcodes[v])
    return _wrap(b"\x2f" + bw.bytes())


@pytest.mark.parametrize("n_colors", [2, 4, 16, 20])
def test_palette_packing_every_width(n_colors):
    """Indices pack 8/4/2/1 per green byte depending on palette size; the
    inverse must unpack LSB-first sub-pixels and map through the
    delta-decoded palette."""
    w = 11
    palette = [((c * 37 + 5) % 256, (c * 11 + 1) % 256, (c * 53 + 9) % 256)
               for c in range(n_colors)]
    indices = [(x * 3 + 1) % n_colors for x in range(w)]
    dec = vp8lpix.decode_webp(_palette_stream(w, indices, palette))
    assert dec is not None
    expect = b"".join(bytes(palette[i]) for i in indices)
    assert dec == (w, 1, 3, expect)


# ---- hand-built streams: predictor + color transforms --------------------

def _predictor_stream(w, h, mode, residuals):
    """Predictor transform with one block (bits=3 covers 8x8): the 1x1
    sub-image carries the mode in its green channel; residuals are
    (a, r, g, b) tuples per pixel."""
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)                       # PREDICTOR
    bw.write(1, 3)                       # size_bits = 3 -> block 8
    # 1x1 sub-image: literal green=mode
    bw.write(0, 1)                       # no cache
    _write_simple1(bw, mode)             # green
    _write_simple1(bw, 0)                # red
    _write_simple1(bw, 0)                # blue
    _write_simple1(bw, 255)              # alpha
    _write_simple1(bw, 0)                # distance
    bw.write(0, 1)                       # no more transforms
    # main image: flat-8 literals for all four channels
    bw.write(0, 1)                       # no cache
    bw.write(0, 1)                       # no meta
    from docext_spark.core.vp8lpix import _write_flat8_code
    _write_flat8_code(bw, GREEN_BASE + NUM_LENGTH_CODES)
    _write_flat8_code(bw, 256)
    _write_flat8_code(bw, 256)
    _write_flat8_code(bw, 256)
    _write_simple1(bw, 0)                # distance
    for (a, r, g, b) in residuals:
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)
    return _wrap(b"\x2f" + bw.bytes())


def test_predictor_mode2_top():
    """2x2 mode 2 (T). Fold: (0,0) black+res; (1,0) L; (0,1) T; (1,1) T.
    Hand-computed reconstruction."""
    res = [(0, 10, 20, 30), (0, 5, 6, 7), (0, 1, 1, 1), (0, 2, 2, 2)]
    dec = vp8lpix.decode_webp(_predictor_stream(2, 2, 2, res))
    # (0,0) = (255,10,20,30); (1,0) = L+(0,5,6,7) = (255,15,26,37)
    # (0,1) = T+(0,1,1,1) = (255,11,21,31); (1,1) = T+(0,2,2,2) = (255,17,28,39)
    assert dec == (2, 2, 3, bytes([10, 20, 30, 15, 26, 37,
                                   11, 21, 31, 17, 28, 39]))


def test_predictor_mode3_tr_wraps_to_row_start():
    """Mode 3 (TR): at the last column TR addresses the linear index
    (y-1)*w + x + 1 — the first pixel of the CURRENT row, already
    reconstructed (the spec's pixel-addressing rule)."""
    res = [(0, 10, 20, 30), (0, 1, 1, 1),       # row 0: (10,20,30),(11,21,31)
           (0, 3, 3, 3), (0, 2, 2, 2)]          # row 1
    dec = vp8lpix.decode_webp(_predictor_stream(2, 2, 3, res))
    # (0,1): x=0 -> T = (10,20,30) + (3,3,3) = (13,23,33)
    # (1,1): TR wraps to row 1 col 0 = (13,23,33) + (2,2,2) = (15,25,35)
    assert dec == (2, 2, 3, bytes([10, 20, 30, 11, 21, 31,
                                   13, 23, 33, 15, 25, 35]))


def test_predictor_mode12_clamp_full():
    """Mode 12 ClampAddSubtractFull(L, T, TL) with a value that clamps."""
    res = [(0, 250, 0, 0), (0, 10, 0, 0),       # row 0: r=250, r=4 (mod 256)
           (0, 0, 0, 0), (0, 0, 0, 0)]
    dec = vp8lpix.decode_webp(_predictor_stream(2, 2, 12, res))
    w, h, ch, px = dec
    # (0,0) r=250; (1,0) r=(250+10)%256=4; (0,1) T -> r=250
    # (1,1): clamp(L + T - TL) = clamp(250 + 4 - 250) = 4; +0 = 4
    assert px[0] == 250 and px[3] == 4 and px[6] == 250 and px[9] == 4


def test_predictor_mode11_select():
    """Mode 11 Select: prediction is T when Σ|L-TL| <= Σ|T-TL| else L."""
    # TL=(100,..), T=(101,..), L=(180,..): |L-TL|=80 > |T-TL|=1 -> pick L
    res = [(0, 100, 0, 0), (0, 1, 0, 0),
           (0, 80, 0, 0), (0, 5, 0, 0)]
    dec = vp8lpix.decode_webp(_predictor_stream(2, 2, 11, res))
    px = dec[3]
    # (0,0)=100, (1,0)=101, (0,1)=180; (1,1) pred = L(180) + 5 = 185
    assert px[9] == 185


def test_color_transform_inverse():
    """2x1, one block, element g2r=16, g2b=8, r2b=4 (signed 3.5 fixed):
    red += (16*g)>>5; blue += (8*g)>>5 + (4*int8(red'))>>5."""
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)                       # COLOR transform
    bw.write(1, 3)                       # bits = 3
    bw.write(0, 1)                       # sub-image: no cache
    _write_simple1(bw, 8)                # green = green_to_blue
    _write_simple1(bw, 4)                # red = red_to_blue
    _write_simple1(bw, 16)               # blue = green_to_red
    _write_simple1(bw, 255)              # alpha
    _write_simple1(bw, 0)                # distance
    bw.write(0, 1)                       # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    from docext_spark.core.vp8lpix import _write_flat8_code
    _write_flat8_code(bw, GREEN_BASE + NUM_LENGTH_CODES)
    _write_flat8_code(bw, 256)
    _write_flat8_code(bw, 256)
    _write_simple1(bw, 255)              # alpha
    _write_simple1(bw, 0)
    for (r, g, b) in [(10, 64, 20), (200, 32, 100)]:
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
    dec = vp8lpix.decode_webp(_wrap(b"\x2f" + bw.bytes()))
    assert dec is not None

    def expect(r, g, b):
        red = (r + ((16 * (g if g < 128 else g - 256)) >> 5)) & 0xFF
        sred = red if red < 128 else red - 256
        blue = (b + ((8 * (g if g < 128 else g - 256)) >> 5)
                + ((4 * sred) >> 5)) & 0xFF
        return (red, g, blue)

    e0 = expect(10, 64, 20)
    e1 = expect(200, 32, 100)
    assert dec == (2, 1, 3, bytes(e0 + e1))


def test_meta_huffman_groups():
    """8x1 with meta bits=2 (block 4): two tree groups selected by the
    entropy image's (red<<8|green) meta codes — first 4 pixels from group
    0, next 4 from group 1."""
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)                       # no transforms
    bw.write(0, 1)                       # no cache
    bw.write(1, 1)                       # meta huffman
    bw.write(0, 3)                       # huffman_bits = 2 -> block 4
    # entropy image 2x1: greens 0 and 1 (meta codes 0, 1)
    bw.write(0, 1)                       # no cache
    glens = [0] * (GREEN_BASE + NUM_LENGTH_CODES)
    glens[0] = glens[1] = 1
    g = write_code_from_lengths(bw, glens)
    _write_simple1(bw, 0)
    _write_simple1(bw, 0)
    _write_simple1(bw, 255)
    _write_simple1(bw, 0)
    bw.write_code(*g[0])
    bw.write_code(*g[1])
    # group 0: solid (5, 6, 7); group 1: solid (50, 60, 70)
    for (r, gg, b) in [(5, 6, 7), (50, 60, 70)]:
        _write_simple1(bw, gg)
        _write_simple1(bw, r)
        _write_simple1(bw, b)
        _write_simple1(bw, 255)
        _write_simple1(bw, 0)
    dec = vp8lpix.decode_webp(_wrap(b"\x2f" + bw.bytes()))
    assert dec == (8, 1, 3, bytes([5, 6, 7]) * 4 + bytes([50, 60, 70]) * 4)


def test_two_symbol_simple_code_and_alpha_channel():
    """Two-symbol simple alpha code; a non-255 alpha flips the output to
    4-channel RGBA."""
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _write_simple1(bw, 30)               # green
    _write_simple1(bw, 10)               # red
    _write_simple1(bw, 20)               # blue
    bw.write(1, 1)                       # alpha: simple, two symbols
    bw.write(1, 1)
    bw.write(1, 1)                       # first symbol in 8 bits
    bw.write(255, 8)
    bw.write(128, 8)                     # second symbol
    _write_simple1(bw, 0)                # distance
    # alpha codes: canonical over {255: len1, 128: len1} -> 128 < 255 so
    # code(128)=0, code(255)=1
    bw.write_code(1, 1)                  # px0 alpha 255
    bw.write_code(0, 1)                  # px1 alpha 128
    dec = vp8lpix.decode_webp(_wrap(b"\x2f" + bw.bytes()))
    assert dec == (2, 1, 4, bytes([10, 30, 20, 255, 10, 30, 20, 128]))


# ---- defensive -----------------------------------------------------------

def test_defensive_returns_none():
    good = encode_webp_lossless(4, 3, _rgb(4, 3))
    assert vp8lpix.decode_webp(None) is None
    assert vp8lpix.decode_webp(b"") is None
    assert vp8lpix.decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8 ") is None
    assert vp8lpix.decode_webp(good[:len(good) - 2]) is None
    # bad version bits
    bad = bytearray(good)
    payload_off = good.index(b"VP8L") + 8
    bad[payload_off + 4] |= 0xE0         # version field = 7
    assert vp8lpix.decode_webp(bytes(bad)) is None
    # lossy VP8 chunk is an honest None
    lossy = good.replace(b"VP8L", b"VP8 ")
    assert vp8lpix.decode_webp(lossy) is None


def test_decode_bomb_guard():
    """16383x16383 claimed dims must bail before allocating 268M pixels."""
    bw = BitWriter()
    _header(bw, 16383, 16383)
    bomb = _wrap(b"\x2f" + bw.bytes() + b"\x00" * 64)
    assert vp8lpix.decode_webp(bomb) is None
    assert vp8lpix.MAX_PIXELS >= 1_000_000


def test_oversubscribed_code_rejected():
    """Three 1-bit code lengths over-subscribe the Kraft budget — the
    canonical builder must refuse, not mis-decode."""
    assert vp8lpix.canonical_codes([1, 1, 1]) is None
    assert vp8lpix.canonical_codes([1, 2]) is None      # under-subscribed
    assert vp8lpix.canonical_codes([1, 2, 2]) is not None


def test_resample_operator_decodes_webp(spark):
    import pandas as pd

    from docext_spark.core import pngpix
    from docext_spark.operators.multimodal import (extract_features,
                                                   resample_images)
    w, h = 12, 5
    rgb = _rgb(w, h, seed=4)
    media = spark.createDataFrame(
        pd.DataFrame([(0, "image",
                       encode_webp_lossless(w, h, rgb, subtract_green=True))],
                     columns=["media_id", "kind", "payload"]),
        "media_id long, kind string, payload binary")
    r = resample_images(media, max_size=8).collect()[0]
    assert r["format"] == "webp" and (r["width"], r["height"]) == (w, h)
    nw, nh = pngpix.bounded_dims(w, h, 8)
    out = pngpix.resize_nearest(w, h, 3, rgb, nw, nh)
    assert r["px_checksum"] == sum(b * (i + 1) for i, b in enumerate(out))
    f = extract_features(media).collect()[0]
    assert f["feature_src"] == "pixels"


def test_predictor_mode13_truncating_half():
    """Mode 13 ClampAddSubtractHalf: libwebp computes
    ave + (ave - TL) / 2 with C division TRUNCATING toward zero; a floor
    shift is off by one whenever (ave - TL) is negative and odd
    (code-review r6). TL=15, T=L=10: ave=10, d=-5, trunc(-5/2)=-2 -> 8
    (floor would give 7)."""
    res = [(0, 21, 0, 0), (0, 245, 0, 0),      # row 0: r = 21, 10 (mod 256)
           (0, 245, 0, 0), (0, 0, 0, 0)]       # row 1: r = 10, probe
    dec = vp8lpix.decode_webp(_predictor_stream(2, 2, 13, res))
    px = dec[3]
    # (0,0) r=21; (1,0) r=(21+245)%256=10; (0,1) T fold: (21+245)%256=10
    assert px[0] == 21 and px[3] == 10 and px[6] == 10
    # (1,1): L=10, T=10 -> ave=10; TL=21 -> d=-11; trunc(-11/2)=-5 -> 5
    # (a floor shift gives -6 -> 4: the off-by-one this test pins)
    assert px[9] == 5
