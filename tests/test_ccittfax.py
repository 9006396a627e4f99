"""CCITT Group 3/4 fax codecs (core/ccittfax.py) + bilevel TIFF
(bits=1, compressions 1/2/4): T.4 Table 2/3 codeword integrity via
prefix-tree construction, encode/decode round-trips across densities
and run lengths (incl. >2560 multi-makeup runs), defensive guards, and
CROSS-ECOSYSTEM bit-compat: fixtures written by Java 17 ImageIO's
independent CCITT implementations decode exactly, and (dev-time,
pinned here by the embedded fixtures) ImageIO read back our encoder's
streams pixel-exact.

Reference parity: the accepted-extension predicate includes ``tiff``
(reference docext/core/utils.py:56-70; PIL decodes fax TIFFs at
core/utils.py:13-15).
"""
from __future__ import annotations

import base64
import random

import pytest

from docext_spark.core import ccittfax, tiffpix


def _java_bits(seed, w, h):
    """The LCG ink rule the Java fixture writer used (WriteFax.java):
    bit(i) = ((seed*1103515245 + i*12345) >> 16) % 5 == 0."""
    return bytes(
        1 if (((seed * 1103515245 + i * 12345) % (1 << 64)) >> 16) % 5 == 0
        else 0 for i in range(w * h))


# 40x40 G4 (seed 9), 71x23 G4 (seed 5), 71x23 CCITT-RLE (seed 5) written
# by Java 17 ImageIO TIFF plugin, MODE_EXPLICIT "CCITT T.6"/"CCITT RLE"
_JAVA_G4_40 = (
    "TU0AKgAAAAgACwEAAAMAAAABACgAAAEBAAMAAAABACgAAAEDAAMAAAABAAQAAAEGAAMA"
    "AAABAAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABACgAAAEXAAQAAAAB"
    "AAAAnAEaAAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEA"
    "AAABAAAAAQAAAAEuZLlEzMZHITM4mZjI5iZnEzMZHMTMomZjJqQmZxPkMmpifKJmYyam"
    "JmcTMxUmpiZmxPkKk1YnyYmZiFJqxMzDEzMQpNYTMwxMzEKTWEzIMTMxBSawmZgxPkIK"
    "TXEzMGJmYgpNcTMwYmZiZsmuJmZIDcT5CZsmqE+RIDcTMxM2TVCZmQw3EzMTMxMzIYbm"
    "ZCZmJ8iGG5mYnyABABA="
)
_JAVA_G4_71 = (
    "TU0AKgAAAAgACwEAAAMAAAABAEcAAAEBAAMAAAABABcAAAEDAAMAAAABAAQAAAEGAAMA"
    "AAABAAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABABcAAAEXAAQAAAAB"
    "AAAAgwEaAAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEA"
    "AAABAAAAAQAAAAEjDJcpHMTZiYOJsxMGJs4mCE2YyakJgxMFEwYmzEwcTZiYMZNTEwQm"
    "ziYITBiYKJgxNmKk1YmzEwbE2YmCE2cTBCYMQpNWJgxMEGJgxNmJg4mzEwQhSawmCEwY"
    "YmCEwYmCiYMTZiCk1xNmJgwYmzEwQmziYITBiYZNcTBibM1BuACACA=="
)
_JAVA_RLE_71 = (
    "TU0AKgAAAAgACwEAAAMAAAABAEcAAAEBAAMAAAABABcAAAEDAAMAAAABAAIAAAEGAAMA"
    "AAABAAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABABcAAAEXAAQAAAAB"
    "AAAAawEaAAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEA"
    "AAABAAAAAQAAAAEYZchAHMGZcyA5lzBnAE5FzLg1IuZciKGDMudgTmXMGDUy5FzDmRcy"
    "5WCswZl0NWDMueiZlyLngKiLmXw1Zcy5aPMGZc+AqMuRfDWLkXPU4i5ly4DUwZl4NcGZ"
    "c6jjLkXPwNCLmXY1y5gzqA=="
)


def test_codeword_tables_are_prefix_free():
    """_prefix_tree raises on any clash; building the module proves the
    104+13 T.4 codewords per colour are mutually prefix-free. Re-assert
    the totals here so a dropped entry is loud."""
    assert len(ccittfax._WHITE_TERM) == 64
    assert len(ccittfax._BLACK_TERM) == 64
    assert len(ccittfax._WHITE_MAKEUP) == 27
    assert len(ccittfax._BLACK_MAKEUP) == 27
    assert len(ccittfax._EXT_MAKEUP) == 13
    assert max(ccittfax._EXT_MAKEUP) == 2560


@pytest.mark.parametrize("codec", ["g4", "rle"])
def test_roundtrip_densities(codec):
    enc = ccittfax.g4_encode if codec == "g4" else ccittfax.rle_encode
    dec = ccittfax.g4_decode if codec == "g4" else ccittfax.rle_decode
    rng = random.Random(11)
    for _ in range(120):
        w = rng.choice([1, 2, 5, 8, 63, 64, 65, 173, 711, 2700])
        h = rng.randrange(1, 10)
        density = rng.choice([0.0, 0.02, 0.2, 0.5, 0.9, 1.0])
        px = bytes(1 if rng.random() < density else 0
                   for _ in range(w * h))
        assert dec(enc(px, w, h), w, h) == px


def test_multi_makeup_runs():
    """A 6000-wide all-black row needs repeated 2560 make-ups; mixed
    long runs cross every make-up boundary class."""
    w = 6000
    row = bytes([1] * w)
    assert ccittfax.rle_decode(ccittfax.rle_encode(row, w, 1), w, 1) == row
    assert ccittfax.g4_decode(ccittfax.g4_encode(row, w, 1), w, 1) == row
    row = bytes([0] * 2560 + [1] * 2624 + [0] * 63 + [1] * 64
                + [0] * (w - 2560 - 2624 - 63 - 64))
    assert ccittfax.rle_decode(ccittfax.rle_encode(row, w, 1), w, 1) == row


def test_java_imageio_g4_fixtures_decode_exact():
    for b64, seed, w, h in ((_JAVA_G4_40, 9, 40, 40),
                            (_JAVA_G4_71, 5, 71, 23)):
        payload = base64.b64decode(b64)
        exp = bytes(255 * (1 - b) for b in _java_bits(seed, w, h))
        assert tiffpix.decode_tiff(payload) == (w, h, 1, exp)


def test_java_imageio_rle_fixture_decodes_exact():
    payload = base64.b64decode(_JAVA_RLE_71)
    exp = bytes(255 * (1 - b) for b in _java_bits(5, 71, 23))
    assert tiffpix.decode_tiff(payload) == (71, 23, 1, exp)


@pytest.mark.parametrize("comp", [1, 2, 4])
@pytest.mark.parametrize("photometric", [0, 1])
def test_bilevel_tiff_roundtrip(comp, photometric):
    rng = random.Random(29)
    for w, h, rps in [(1, 1, None), (9, 5, 1), (40, 33, 3), (173, 7, None)]:
        stored = bytes(255 if rng.random() < 0.3 else 0
                       for _ in range(w * h))
        p = tiffpix.encode_tiff(w, h, 1, stored, compression=comp,
                                rows_per_strip=rps,
                                photometric=photometric, bits=1)
        want = (bytes(255 - b for b in stored) if photometric == 0
                else stored)
        assert tiffpix.decode_tiff(p) == (w, h, 1, want)


def test_bilevel_defensive():
    """Truncation and bit flips on a G4 TIFF: None or a tuple, never an
    exception or a hang; encode_tiff rejects unsupported bilevel args."""
    good = tiffpix.encode_tiff(40, 20, 1, bytes(
        255 if (x * 3 + 7 * (x // 40)) % 11 < 3 else 0
        for x in range(800)), compression=4, rows_per_strip=7, bits=1)
    assert tiffpix.decode_tiff(good) is not None
    for cut in range(0, len(good), 5):
        r = tiffpix.decode_tiff(good[:cut])
        assert r is None or isinstance(r, tuple)
    rng = random.Random(41)
    for _ in range(80):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 0xFF
        r = tiffpix.decode_tiff(bytes(b))
        assert r is None or isinstance(r, tuple)
    with pytest.raises(ValueError):
        tiffpix.encode_tiff(4, 4, 3, bytes(48), compression=4, bits=1)
    with pytest.raises(ValueError):
        tiffpix.encode_tiff(4, 4, 1, bytes(16), compression=5, bits=1)
    with pytest.raises(ValueError):
        tiffpix.encode_tiff(4, 4, 1, bytes(16), compression=4, bits=1,
                            tile_size=(16, 16))


def test_g4_vertical_pass_horizontal_modes_exercised():
    """Shapes that force each T.6 mode: shifted edges (vertical ±1..3),
    short islands vanishing under a wide run (pass), and isolated
    far-apart islands (horizontal)."""
    w = 64
    rows = [
        [0] * 20 + [1] * 10 + [0] * 34,       # baseline
        [0] * 21 + [1] * 10 + [0] * 33,       # VR1
        [0] * 24 + [1] * 10 + [0] * 30,       # VR3
        [0] * 22 + [1] * 8 + [0] * 34,        # VL2-ish
        [0] * 5 + [1] * 3 + [0] * 20 + [1] * 3 + [0] * 33,  # horizontal
        [0] * w,                              # pass over both islands
        [1] * w,                              # full flip
    ]
    px = bytes(b for r in rows for b in r)
    h = len(rows)
    assert ccittfax.g4_decode(ccittfax.g4_encode(px, w, h), w, h) == px
