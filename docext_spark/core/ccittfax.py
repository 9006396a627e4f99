"""Pure-Python CCITT Group 3/4 fax codecs (ITU-T T.4 / T.6) — the
bilevel compressions of baseline TIFF (Compression 2 "CCITT RLE" =
Modified Huffman, one row per byte-aligned code sequence; Compression 4
= Group 4 MMR, every row 2-D coded against the previous row).

Published-spec sources: ITU-T Rec. T.4 (Tables 2/3: terminating +
make-up run-length codewords, §4.1 one-dimensional coding), ITU-T Rec.
T.6 (§2.2: vertical / horizontal / pass coding modes, EOFB). The
decoder is additionally pinned bit-compatible against Java 17 ImageIO's
independent CCITT implementations in tests/test_tiffpix.py.

Bit convention: fax codes run lengths of WHITE (bit 0) and BLACK
(bit 1) pixels, every row starting with a (possibly zero-length) white
run. ``decode``/``encode`` below exchange one byte per pixel, 0=white,
1=black — tiffpix scales and applies PhotometricInterpretation.

Reference parity: the reference accepts ``tiff`` payloads wholesale
(reference docext/core/utils.py:56-70) and PIL decodes fax TIFFs
transparently (core/utils.py:13-15); this engine decodes the bytes
itself.
"""
from __future__ import annotations

# ITU-T T.4 Table 2 — white run codewords: run -> (bits, width)
_WHITE_TERM = {
    0: ("00110101"), 1: ("000111"), 2: ("0111"), 3: ("1000"),
    4: ("1011"), 5: ("1100"), 6: ("1110"), 7: ("1111"),
    8: ("10011"), 9: ("10100"), 10: ("00111"), 11: ("01000"),
    12: ("001000"), 13: ("000011"), 14: ("110100"), 15: ("110101"),
    16: ("101010"), 17: ("101011"), 18: ("0100111"), 19: ("0001100"),
    20: ("0001000"), 21: ("0010111"), 22: ("0000011"), 23: ("0000100"),
    24: ("0101000"), 25: ("0101011"), 26: ("0010011"), 27: ("0100100"),
    28: ("0011000"), 29: ("00000010"), 30: ("00000011"),
    31: ("00011010"), 32: ("00011011"), 33: ("00010010"),
    34: ("00010011"), 35: ("00010100"), 36: ("00010101"),
    37: ("00010110"), 38: ("00010111"), 39: ("00101000"),
    40: ("00101001"), 41: ("00101010"), 42: ("00101011"),
    43: ("00101100"), 44: ("00101101"), 45: ("00000100"),
    46: ("00000101"), 47: ("00001010"), 48: ("00001011"),
    49: ("01010010"), 50: ("01010011"), 51: ("01010100"),
    52: ("01010101"), 53: ("00100100"), 54: ("00100101"),
    55: ("01011000"), 56: ("01011001"), 57: ("01011010"),
    58: ("01011011"), 59: ("01001010"), 60: ("01001011"),
    61: ("00110010"), 62: ("00110011"), 63: ("00110100"),
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
# ITU-T T.4 Table 3 — black run codewords
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# T.4 §4.1.2 extended make-ups, shared by both colours
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}
_EOL = "000000000001"


def _prefix_tree(*tables: dict[int, str]) -> dict:
    """(bit -> subtree | ('run', n)) decoding trie over codeword strings."""
    root: dict = {}
    for table in tables:
        for run, code in table.items():
            node = root
            for ch in code[:-1]:
                node = node.setdefault(int(ch), {})
            leaf = int(code[-1])
            if leaf in node:
                raise AssertionError(f"codeword clash at {code}")
            node[leaf] = run
    return root


_WHITE_TREE = _prefix_tree(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_TREE = _prefix_tree(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)

_MAKEUPS_W = sorted({**_WHITE_MAKEUP, **_EXT_MAKEUP}, reverse=True)
_MAKEUPS_B = sorted({**_BLACK_MAKEUP, **_EXT_MAKEUP}, reverse=True)


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit position
        self.n = len(data) * 8

    def bit(self) -> int | None:
        if self.pos >= self.n:
            return None
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = self.nbits = 0

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _read_run(r: _BitReader, tree: dict) -> int | None:
    """One complete run length: make-up codes (incl. repeated 2560s)
    accumulate until a terminating code (<64) closes the run."""
    total = 0
    for _ in range(64):                   # bound: no real run needs more
        node = tree
        while isinstance(node, dict):
            b = r.bit()
            if b is None or b not in node:
                return None
            node = node[b]
        total += node
        if node < 64:
            return total
    return None


def _emit_run(w: _BitWriter, run: int, term: dict,
              makeups: list[int]) -> None:
    while run >= 64:
        mk = next(m for m in makeups if m <= run)
        table = (_EXT_MAKEUP if mk in _EXT_MAKEUP else
                 (_WHITE_MAKEUP if term is _WHITE_TERM else _BLACK_MAKEUP))
        w.write(table[mk])
        run -= mk
    w.write(term[run])


def _transitions(row: bytes | bytearray, width: int) -> list[int]:
    """Positions where the colour changes (row starts white); sentinel
    ``width`` appended twice so b1/b2 lookups never run off the end."""
    t = []
    prev = 0
    for x in range(width):
        if row[x] != prev:
            t.append(x)
            prev = row[x]
    t.append(width)
    t.append(width)
    return t


def rle_encode(pixels: bytes, width: int, height: int) -> bytes:
    """TIFF Compression 2 ("CCITT RLE", T.4 one-dimensional Modified
    Huffman without EOLs): each row is an independent MH code sequence
    starting with a white run, padded to a byte boundary (TIFF 6.0 §10)."""
    out = bytearray()
    for y in range(height):
        row = pixels[y * width:(y + 1) * width]
        w = _BitWriter()
        color = 0
        x = 0
        while x <= width:
            run = 0
            while x + run < width and row[x + run] == color:
                run += 1
            if color == 0:
                _emit_run(w, run, _WHITE_TERM, _MAKEUPS_W)
            else:
                _emit_run(w, run, _BLACK_TERM, _MAKEUPS_B)
            x += run
            color ^= 1
            if x == width:
                break
        out += w.bytes()
    return bytes(out)


def rle_decode(data: bytes, width: int, height: int) -> bytes | None:
    """Inverse of rle_encode. Returns 0/1 bytes row-major, or None on
    malformed codes / run overflow."""
    if width <= 0 or height <= 0:
        return None
    out = bytearray(width * height)
    r = _BitReader(data)
    for y in range(height):
        x = 0
        color = 0
        base = y * width
        while x < width:
            run = _read_run(r, _WHITE_TREE if color == 0 else _BLACK_TREE)
            if run is None or x + run > width:
                return None
            if color:
                for i in range(x, x + run):
                    out[base + i] = 1
            x += run
            color ^= 1
        r.align()                         # rows are byte-aligned (§10)
    return bytes(out)


def g4_encode(pixels: bytes, width: int, height: int) -> bytes:
    """T.6 Group 4 (MMR): every row 2-D coded against the previous row
    (imaginary all-white line above row 0); vertical modes for |a1-b1|<=3,
    pass when b2 < a1, horizontal otherwise; EOFB terminator."""
    w = _BitWriter()
    ref = _transitions(bytes(width), width)      # all-white reference
    for y in range(height):
        row = pixels[y * width:(y + 1) * width]
        cur = _transitions(row, width)
        a0, color = -1, 0
        ci = 0                                    # index into cur
        while True:
            a1 = cur[ci] if ci < len(cur) else width
            # b1: first ref transition > a0 of colour opposite to the
            # running colour — even-index transitions turn white->black,
            # so the matching parity is (bi & 1) == color. The trailing
            # [width, width] sentinel pair covers both parities and
            # width > a0 while the row is live, so the scan is total.
            bi = 0
            while ref[bi] <= a0 or (bi & 1) != color:
                bi += 1
            b1 = ref[bi]
            b2 = ref[bi + 1] if bi + 1 < len(ref) else width
            if b2 < a1:                           # pass mode
                w.write("0001")
                a0 = b2
                continue
            if abs(a1 - b1) <= 3:                 # vertical mode
                w.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                         -1: "010", -2: "000010",
                         -3: "0000010"}[a1 - b1])
                a0 = a1
                color ^= 1
                ci += 1
            else:                                 # horizontal mode
                a2 = cur[ci + 1] if ci + 1 < len(cur) else width
                start = 0 if a0 < 0 else a0
                w.write("001")
                if color == 0:
                    _emit_run(w, a1 - start, _WHITE_TERM, _MAKEUPS_W)
                    _emit_run(w, a2 - a1, _BLACK_TERM, _MAKEUPS_B)
                else:
                    _emit_run(w, a1 - start, _BLACK_TERM, _MAKEUPS_B)
                    _emit_run(w, a2 - a1, _WHITE_TERM, _MAKEUPS_W)
                a0 = a2
                ci += 2
            if a0 >= width:
                break
        ref = cur
    w.write(_EOL + _EOL)                          # EOFB (T.6 §2.2.2)
    return w.bytes()


def g4_decode(data: bytes, width: int, height: int) -> bytes | None:
    """Inverse of g4_encode; tolerant of a missing EOFB (stops after
    ``height`` rows). Returns 0/1 bytes row-major or None on malformed
    input."""
    if width <= 0 or height <= 0:
        return None
    out = bytearray(width * height)
    r = _BitReader(data)
    ref = _transitions(bytes(width), width)
    for y in range(height):
        cur: list[int] = []
        a0, color = -1, 0
        while True:
            # b1/b2 against the running (a0, colour) — same sentinel
            # argument as the encoder makes the scan total
            bi = 0
            while bi < len(ref) and (ref[bi] <= a0 or (bi & 1) != color):
                bi += 1
            b1 = ref[bi] if bi < len(ref) else width
            b2 = ref[bi + 1] if bi + 1 < len(ref) else width

            # longest-match over the seven mode codes + pass + horizontal
            b = r.bit()
            if b is None:
                return None
            if b == 1:                            # V0
                a1 = b1
                mode = "v"
            else:
                b = r.bit()
                if b is None:
                    return None
                if b == 1:                        # 01x: VR1 / VL1
                    d = r.bit()
                    if d is None:
                        return None
                    a1 = b1 + 1 if d else b1 - 1
                    mode = "v"
                else:
                    b = r.bit()
                    if b is None:
                        return None
                    if b == 1:                    # 001: horizontal
                        mode = "h"
                    else:
                        b = r.bit()
                        if b is None:
                            return None
                        if b == 1:                # 0001: pass
                            mode = "p"
                        else:
                            # 00001x / 000001x / longer: VR2/VL2/VR3/VL3
                            b = r.bit()
                            if b is None:
                                return None
                            if b == 1:
                                d = r.bit()
                                if d is None:
                                    return None
                                a1 = b1 + 2 if d else b1 - 2
                                mode = "v"
                            else:
                                b = r.bit()
                                if b is None:
                                    return None
                                if b == 1:
                                    d = r.bit()
                                    if d is None:
                                        return None
                                    a1 = b1 + 3 if d else b1 - 3
                                    mode = "v"
                                else:
                                    return None   # EOL/garbage mid-image
            if mode == "p":
                a0 = b2
                continue
            if mode == "h":
                start = 0 if a0 < 0 else a0
                r1 = _read_run(r, _WHITE_TREE if color == 0
                               else _BLACK_TREE)
                r2 = _read_run(r, _BLACK_TREE if color == 0
                               else _WHITE_TREE)
                if r1 is None or r2 is None:
                    return None
                a1, a2 = start + r1, start + r1 + r2
                if a2 > width or a2 <= a0:
                    return None           # corrupt: no forward progress
                cur.append(a1)
                cur.append(a2)
                a0 = a2
            else:                                 # vertical
                if a1 < 0 or a1 > width or a1 <= a0:
                    return None           # corrupt: no forward progress
                cur.append(a1)
                a0 = a1
                color ^= 1
            if a0 >= width:
                break
        base = y * width
        c, prev = 0, 0
        for t in cur:
            if c:
                for i in range(prev, min(t, width)):
                    out[base + i] = 1
            prev, c = t, c ^ 1
        if c:
            for i in range(prev, width):
                out[base + i] = 1
        cur.append(width)
        cur.append(width)
        ref = cur
    return bytes(out)
