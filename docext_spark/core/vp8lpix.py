"""Pure-Python VP8L (WebP lossless) PIXEL decode — stdlib only, no PIL.

The reference's accepted-extension predicate includes ``webp``
(reference docext/core/utils.py:56-70; PIL decodes it at
core/utils.py:13-15). Lossy WebP (VP8) needs a boolean arithmetic
decoder + loop filter and stays an honest None (library territory), but
LOSSLESS WebP (VP8L, RFC 9649 §4) is a self-contained Huffman/LZ77
format in the PNG/GIF weight class, so this engine decodes it for real:

    container: RIFF .. WEBP .. 'VP8L' chunk, payload 0x2F + LSB-first bits
    header:    14-bit w-1, 14-bit h-1, alpha hint, 3-bit version (=0)
    transforms (each at most once, applied inverse in reverse read order):
               PREDICTOR(0), COLOR(1), SUBTRACT_GREEN(2), COLOR_INDEX(3)
    image:     optional color cache (hash 0x1e35a7bd, 1..11 bits),
               optional meta-Huffman entropy image (per-block tree groups),
               5 canonical Huffman codes per group (green+len+cache, red,
               blue, alpha, distance — DEFLATE-style code-length coding
               with 16/17/18 repeats, or 1-2 symbol "simple" codes),
               LZ77 backward references (prefix-coded lengths/distances,
               the 120-entry 2D near-distance map), color-cache hits

Conformance posture: the sandbox has no libwebp/PIL to differ against, so
the decoder is pinned the same way pngpix/jpegpix are — a spec-faithful
fixture ENCODER (flat 8-bit literal codes, optional subtract-green) plus
hand-assembled streams exercising each feature (LZ77 both distance
branches, cache, palette packing at every width, predictor modes, color
transform, meta groups), with every construction derived from the public
spec text (RFC 9649; libwebp vp8l semantics cited inline). Defensive
throughout: malformed input returns None, never raises — a 100TB scan
must outlive any corrupt blob. Decode-bomb guard as in the sibling
decoders.

Output convention matches pngpix/gifpix/bmppix/tiffpix: (width, height,
channels, samples) row-major top-down interleaved; channels=3 when every
alpha is 255, else 4 (RGBA).
"""
from __future__ import annotations

import struct

MAX_PIXELS = 4_000_000

ARGB_BLACK = 0xFF000000

# RFC 9649 §4.2.2.3 — code length code order
KCODE_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
               14, 15]

# RFC 9649 §4.4.2.2 — the 120-entry near-pixel distance map (dx, dy),
# dist_code 1..120; codes >120 are plain linear distances minus 120.
# Transcribed from the published table (ordered by 2D closeness).
KDIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (0, 8), (1, 8), (-1, 8), (3, 8), (-3, 8), (6, 7), (-6, 7), (8, 4),
]

GREEN_BASE = 256          # literal greens
NUM_LENGTH_CODES = 24     # LZ77 length prefix symbols
NUM_DIST_CODES = 40       # distance prefix symbols


class BitReader:
    """LSB-first bit reader (RFC 9649 §4.1). Reads past the end yield
    None, surfaced by every caller as a defensive decode failure."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self, nbits: int):
        if self.pos + nbits > self.n:
            return None
        v = 0
        p = self.pos
        d = self.data
        for i in range(nbits):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + nbits
        return v

    def read_bit(self):
        if self.pos >= self.n:
            return None
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class BitWriter:
    """LSB-first bit writer (fixture/test side)."""

    __slots__ = ("bits", "acc", "nacc")

    def __init__(self):
        self.bits = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.nacc
        self.nacc += nbits
        while self.nacc >= 8:
            self.bits.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def write_code(self, code: int, length: int):
        """Huffman codes enter the LSB-first stream MSB-of-code first
        (same convention as DEFLATE)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.bits)
        if self.nacc:
            out.append(self.acc & 0xFF)
        return bytes(out)


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]] | None:
    """symbol -> (code, length), canonical DEFLATE assignment (shorter
    first, same-length by symbol order). None if the lengths are not a
    complete prefix code (single-symbol codes use length 0 upstream)."""
    max_len = max(lengths, default=0)
    if max_len == 0:
        return None
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    kraft = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
        kraft += bl_count[ln] << (max_len - ln)
    if kraft != (1 << max_len):
        return None                      # over- or under-subscribed
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class HuffmanCode:
    """Decode table: walk the canonical code bit-by-bit (MSB-first code
    bits from the LSB-first stream)."""

    __slots__ = ("table", "single")

    def __init__(self, table: dict[tuple[int, int], int],
                 single: int | None = None):
        self.table = table
        self.single = single             # 0-bit code: always this symbol

    @staticmethod
    def from_lengths(lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l]
        if len(nz) == 1:
            return HuffmanCode({}, single=nz[0][0])
        codes = canonical_codes(lengths)
        if codes is None:
            return None
        return HuffmanCode({(ln, code): sym
                            for sym, (code, ln) in codes.items()})

    def read_symbol(self, br: BitReader):
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        for _ in range(16):              # max code length 15
            b = br.read_bit()
            if b is None:
                return None
            code = (code << 1) | b
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None


def _read_code_lengths(br: BitReader, cl_code: HuffmanCode,
                       num_symbols: int) -> list[int] | None:
    """RFC 9649 §4.2.2.3: symbol code lengths via the code-length code
    with 16 (repeat prev nonzero, default 8), 17/18 (zero runs)."""
    use_max = br.read_bit()
    if use_max is None:
        return None
    if use_max:
        nbits = br.read(3)
        if nbits is None:
            return None
        length_nbits = 2 + 2 * nbits
        v = br.read(length_nbits)
        if v is None:
            return None
        max_symbol = 2 + v
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    prev = 8                             # spec default repeat length
    sym = 0
    while sym < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read_symbol(br)
        if cl is None:
            return None
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            extra = br.read(2)
            if extra is None:
                return None
            rep = 3 + extra
            if sym + rep > num_symbols:
                return None
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif cl == 17:
            extra = br.read(3)
            if extra is None:
                return None
            sym += 3 + extra
        else:                            # 18
            extra = br.read(7)
            if extra is None:
                return None
            sym += 11 + extra
        if sym > num_symbols:
            return None
    return lengths


def _read_huffman_code(br: BitReader, alphabet_size: int):
    simple = br.read_bit()
    if simple is None:
        return None
    if simple:
        two = br.read_bit()
        if two is None:
            return None
        num_syms = two + 1
        first_8bit = br.read_bit()
        if first_8bit is None:
            return None
        s0 = br.read(8 if first_8bit else 1)
        if s0 is None or s0 >= alphabet_size:
            return None
        if num_syms == 1:
            return HuffmanCode({}, single=s0)
        s1 = br.read(8)
        if s1 is None or s1 >= alphabet_size or s1 == s0:
            return None
        lengths = [0] * alphabet_size
        lengths[s0] = lengths[s1] = 1
        return HuffmanCode.from_lengths(lengths)
    ncl = br.read(4)
    if ncl is None:
        return None
    num_cl = 4 + ncl
    cl_lengths = [0] * 19
    for i in range(num_cl):
        v = br.read(3)
        if v is None:
            return None
        cl_lengths[KCODE_ORDER[i]] = v
    cl_code = HuffmanCode.from_lengths(cl_lengths)
    if cl_code is None:
        return None
    lengths = _read_code_lengths(br, cl_code, alphabet_size)
    if lengths is None:
        return None
    return HuffmanCode.from_lengths(lengths)


def _prefix_value(br: BitReader, code: int):
    """LZ77 length/distance prefix decode (RFC 9649 §4.4.2.1)."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    v = br.read(extra_bits)
    if v is None:
        return None
    return offset + v + 1


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_image(br: BitReader, w: int, h: int, allow_meta: bool,
                  depth: int = 0):
    """One spatially-coded ARGB image (RFC 9649 §4.3): optional color
    cache, optional meta-Huffman (main image only), per-group 5 Huffman
    codes, LZ77 + cache pixel fold. Returns list[int] ARGB or None."""
    if depth > 2 or w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        return None
    has_cache = br.read_bit()
    if has_cache is None:
        return None
    cache_bits = 0
    cache = None
    if has_cache:
        cache_bits = br.read(4)
        if cache_bits is None or not (1 <= cache_bits <= 11):
            return None
        cache = [0] * (1 << cache_bits)
    cache_size = (1 << cache_bits) if has_cache else 0

    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta:
        has_meta = br.read_bit()
        if has_meta is None:
            return None
        if has_meta:
            mb = br.read(3)
            if mb is None:
                return None
            meta_bits = mb + 2
            mw = _div_round_up(w, meta_bits)
            mh = _div_round_up(h, meta_bits)
            meta = _decode_image(br, mw, mh, False, depth + 1)
            if meta is None:
                return None
            num_groups = 1 + max(((p >> 8) & 0xFFFF) for p in meta)

    groups = []
    green_size = GREEN_BASE + NUM_LENGTH_CODES + cache_size
    for _ in range(num_groups):
        g = _read_huffman_code(br, green_size)
        r = _read_huffman_code(br, 256)
        b = _read_huffman_code(br, 256)
        a = _read_huffman_code(br, 256)
        d = _read_huffman_code(br, NUM_DIST_CODES)
        if None in (g, r, b, a, d):
            return None
        groups.append((g, r, b, a, d))

    n = w * h
    out = [0] * n
    pos = 0
    group = groups[0]
    meta_w = _div_round_up(w, meta_bits) if meta is not None else 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            group = groups[(mp >> 8) & 0xFFFF]
        gcode, rcode, bcode, acode, dcode = group
        s = gcode.read_symbol(br)
        if s is None:
            return None
        if s < GREEN_BASE:
            red = rcode.read_symbol(br)
            blue = bcode.read_symbol(br)
            alpha = acode.read_symbol(br)
            if None in (red, blue, alpha):
                return None
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
        elif s < GREEN_BASE + NUM_LENGTH_CODES:
            length = _prefix_value(br, s - GREEN_BASE)
            dsym = dcode.read_symbol(br)
            if length is None or dsym is None:
                return None
            dist_code = _prefix_value(br, dsym)
            if dist_code is None:
                return None
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = KDIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                return None
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:
            idx = s - GREEN_BASE - NUM_LENGTH_CODES
            if cache is None or idx >= cache_size:
                return None
            out[pos] = cache[idx]
            pos += 1                     # cache hits are NOT re-inserted
    return out


# ---- inverse transforms (RFC 9649 §4.2) ----------------------------------

def _avg2(a: int, b: int) -> int:
    return (((a >> 24) + (b >> 24)) >> 1 << 24 |
            (((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1 << 16 |
            (((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1 << 8 |
            ((a & 0xFF) + (b & 0xFF)) >> 1)


def _add_px(a: int, b: int) -> int:
    """Per-channel modular sum."""
    return (((a >> 24) + (b >> 24)) & 0xFF) << 24 | \
        ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16 | \
        ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8 | \
        (((a & 0xFF) + (b & 0xFF)) & 0xFF)


def _select(t: int, l: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p_t += abs(lc - tlc)             # |p - T| summed per channel
        p_l += abs(tc - tlc)             # |p - L|
    return t if p_t <= p_l else l


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av = (ave >> sh) & 0xFF
        # libwebp ClampedAddSubtractHalf: a + (a - b) / 2 with C division
        # truncating toward zero — a floor shift would be off by one for
        # negative odd differences (code-review r6)
        d = av - ((c >> sh) & 0xFF)
        v = av + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, v)) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int):
    if mode == 0:
        return ARGB_BLACK
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    return None


def _inv_predictor(px: list[int], w: int, h: int, bits: int,
                   modes: list[int]) -> bool:
    mw = _div_round_up(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = ARGB_BLACK
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                # TR at the last column wraps to the current row's first
                # pixel (already reconstructed) via the linear index — the
                # spec's addressing rule
                pred = _predict(mode, px[i - 1], px[i - w], px[i - w + 1],
                                px[i - w - 1])
                if pred is None:
                    return False
            px[i] = _add_px(px[i], pred)
    return True


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 (RFC 9649 §4.2.1.2)."""
    return (_s8(t) * _s8(c & 0xFF)) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int,
                         elems: list[int]) -> None:
    mw = _div_round_up(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            e = elems[(y >> bits) * mw + (x >> bits)]
            g2r = (e >> 0) & 0xFF        # blue channel of the element px
            g2b = (e >> 8) & 0xFF        # green channel
            r2b = (e >> 16) & 0xFF       # red channel
            p = px[i]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green)
            blue = (p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)
            px[i] = (p & 0xFF00FF00) | ((red & 0xFF) << 16) | (blue & 0xFF)


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def _inv_color_index(packed: list[int], w: int, h: int,
                     palette: list[int]) -> list[int] | None:
    wb = _palette_width_bits(len(palette))
    if wb == 0:
        out = []
        for p in packed:
            idx = (p >> 8) & 0xFF
            if idx >= len(palette):
                return None
            out.append(palette[idx])
        return out
    ppp = 1 << wb                        # pixels per packed unit
    bpp = 8 >> wb
    mask = (1 << bpp) - 1
    pw = _div_round_up(w, wb)
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            g = (packed[y * pw + (x >> wb)] >> 8) & 0xFF
            idx = (g >> (bpp * (x % ppp))) & mask
            if idx >= len(palette):
                return None
            out[y * w + x] = palette[idx]
    return out


def decode_vp8l_stream(payload: bytes):
    """Raw VP8L chunk payload → (w, h, channels, samples) or None."""
    if not payload or payload[0] != 0x2F:
        return None
    br = BitReader(payload[1:])
    wm1 = br.read(14)
    hm1 = br.read(14)
    if wm1 is None or hm1 is None:
        return None
    w, h = wm1 + 1, hm1 + 1
    if br.read(1) is None:               # alpha-used hint
        return None
    version = br.read(3)
    if version != 0:
        return None
    if w * h > MAX_PIXELS:
        return None                      # decode-bomb guard

    transforms = []                      # (type, data...), in read order
    seen = set()
    xsize = w
    while True:
        more = br.read_bit()
        if more is None:
            return None
        if not more:
            break
        ttype = br.read(2)
        if ttype is None or ttype in seen:
            return None
        seen.add(ttype)
        if ttype in (0, 1):              # predictor / color transform
            sb = br.read(3)
            if sb is None:
                return None
            bits = sb + 2
            sub = _decode_image(br, _div_round_up(xsize, bits),
                                _div_round_up(h, bits), False, 1)
            if sub is None:
                return None
            transforms.append((ttype, bits, sub, xsize))
        elif ttype == 2:                 # subtract green
            transforms.append((2,))
        else:                            # color indexing
            ps = br.read(8)
            if ps is None:
                return None
            palette_size = ps + 1
            pal = _decode_image(br, palette_size, 1, False, 1)
            if pal is None:
                return None
            for i in range(1, palette_size):
                pal[i] = _add_px(pal[i], pal[i - 1])
            transforms.append((3, pal, xsize))
            xsize = _div_round_up(xsize, _palette_width_bits(palette_size))

    px = _decode_image(br, xsize, h, True)
    if px is None:
        return None

    for t in reversed(transforms):
        if t[0] == 3:
            _, pal, full_w = t
            px = _inv_color_index(px, full_w, h, pal)
            if px is None:
                return None
            xsize = full_w
        elif t[0] == 2:
            _inv_subtract_green(px)
        elif t[0] == 1:
            _, bits, sub, tw = t
            if tw != xsize:
                return None
            _inv_color_transform(px, xsize, h, bits, sub)
        else:
            _, bits, sub, tw = t
            if tw != xsize:
                return None
            if not _inv_predictor(px, xsize, h, bits, sub):
                return None

    opaque = all(p >> 24 == 0xFF for p in px)
    ch = 3 if opaque else 4
    out = bytearray(w * h * ch)
    o = 0
    for p in px:
        out[o] = (p >> 16) & 0xFF
        out[o + 1] = (p >> 8) & 0xFF
        out[o + 2] = p & 0xFF
        if ch == 4:
            out[o + 3] = p >> 24
        o += ch
    return (w, h, ch, bytes(out))


def decode_webp(payload: bytes | None):
    """RIFF container walk → VP8L chunk → pixels, or None (VP8/VP8X lossy
    payloads, truncation, anything malformed)."""
    if not payload or len(payload) < 20 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        return None
    i = 12
    n = len(payload)
    while i + 8 <= n:
        tag = payload[i:i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        if i + 8 + size > n:
            return None
        if tag == b"VP8L":
            return decode_vp8l_stream(payload[i + 8:i + 8 + size])
        i += 8 + size + (size & 1)       # RIFF even-byte padding
    return None


# ---- fixture/test encoder ------------------------------------------------

def write_code_from_lengths(bw: BitWriter,
                            lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a normal (code-length-coded) Huffman code with the given
    per-symbol lengths and return {symbol: (code, length)} for emitting
    data bits. Lengths must form a complete prefix code with ≥2 symbols.
    Zero lengths are emitted literally (no 17/18 runs — fixture-side
    simplicity; the DECODER's run handling is pinned by hand streams)."""
    codes = canonical_codes(lengths)
    assert codes is not None, "incomplete prefix code"
    # code-length code over the distinct length values actually emitted
    used = sorted(set(lengths))
    if len(used) == 1:
        cl_lengths = {used[0]: 1, (used[0] + 1) % 16: 1}  # pad to complete
    else:
        cl_lengths = {}
        n = len(used)
        depth = max(1, (n - 1).bit_length())
        # flat code over the used values: complete when n is a power of
        # two; otherwise give the FIRST 2^depth - n symbols one bit less
        short = (1 << depth) - n
        for i, v in enumerate(used):
            cl_lengths[v] = depth - 1 if i < short and depth > 1 else depth
    cl_codes = canonical_codes(
        [cl_lengths.get(v, 0) for v in range(19)])
    assert cl_codes is not None
    max_idx = max(i for i, sym in enumerate(KCODE_ORDER)
                  if sym in cl_lengths)
    num_cl = max(4, max_idx + 1)
    bw.write(0, 1)                       # not simple
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(KCODE_ORDER[i], 0), 3)
    bw.write(0, 1)                       # no max_symbol shortcut
    for ln in lengths:
        c, cl = cl_codes[ln]
        bw.write_code(c, cl)
    return {sym: codes[sym] for sym in codes}


def _write_flat8_code(bw: BitWriter, alphabet_size: int) -> None:
    """Emit a normal Huffman code assigning length 8 to symbols 0..255
    (complete: 256·2⁻⁸ = 1) and 0 to the rest — canonical code of symbol
    s is then the 8-bit value s. Exercises the full code-length-code
    reading path (the simple-code path is exercised by alpha/distance)."""
    lengths = [8] * 256 + [0] * (alphabet_size - 256)
    codes = write_code_from_lengths(bw, lengths)
    assert all(codes[s] == (s, 8) for s in (0, 128, 255))


def _write_simple1(bw: BitWriter, symbol: int) -> None:
    bw.write(1, 1)                       # simple
    bw.write(0, 1)                       # one symbol
    if symbol < 2:
        bw.write(0, 1)                   # 1-bit first symbol
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)                   # 8-bit first symbol
        bw.write(symbol, 8)


def encode_webp_lossless(width: int, height: int, rgb: bytes,
                         subtract_green: bool = False) -> bytes:
    """Valid VP8L file from top-down RGB samples: literal-only coding with
    flat 8-bit codes (green/red/blue through the full code-length-code
    path, alpha/distance as 1-symbol simple codes), optional
    subtract-green transform so the oracle pair exercises an inverse
    transform. Alpha is constant 255."""
    if len(rgb) != width * height * 3:
        raise ValueError("encode_webp_lossless: samples length != w*h*3")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("encode_webp_lossless: dims out of range")
    bw = BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)                       # alpha hint
    bw.write(0, 3)                       # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                   # SUBTRACT_GREEN
    bw.write(0, 1)                       # no (more) transforms
    bw.write(0, 1)                       # no color cache
    bw.write(0, 1)                       # no meta huffman
    _write_flat8_code(bw, GREEN_BASE + NUM_LENGTH_CODES)   # green
    _write_flat8_code(bw, 256)                             # red
    _write_flat8_code(bw, 256)                             # blue
    _write_simple1(bw, 255)                                # alpha
    _write_simple1(bw, 0)                                  # distance
    for i in range(0, len(rgb), 3):
        r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
        if subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        bw.write_code(g, 8)              # green first (spec decode order)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"                 # RIFF even padding
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
