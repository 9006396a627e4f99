"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annex D + F) —
stdlib only.

The QM-family adaptive binary arithmetic coder JPEG defines as the
alternative to Huffman coding: SOF9 (extended sequential DCT,
arithmetic).  Both directions are implemented — the decoder used by
``jpegpix.decode_jpeg`` and the encoder the fixtures use:

* ``ArithScanDecoder`` / ``ArithScanEncoder``: the sequential-DCT
  statistical model of Annex F.2.4 / F.1.4 — DC difference coding with
  five conditioning categories derived from the previous diff (DAC
  L/U bounds), AC coding with per-index EOB/zero/magnitude decision
  trees split at the DAC Kx index, sign of AC coefficients on the
  non-adaptive 0.5 state, magnitude categories on shared X bins and
  magnitude bits on per-category M bins (Tables F.4/F.5 bin layout).
* ``_ArithCoder`` core: the Annex D coder — 16-bit interval register A
  renormalized against 0x8000, code register C with byte-in/byte-out
  every 8 renormalizations, carry propagation over stacked 0xFF bytes,
  0xFF→0xFF 0x00 byte stuffing, and the Annex D.1.8 flush that picks
  the interval point with the most trailing zeros.

The probability-estimation state machine is the spec's Table D.3
(113 adaptive states + the fixed ~0.5 state 113), transcribed here as
(Qe, NextLPS, NextMPS, SwitchMPS) rows.  No arithmetic-JPEG-capable
third-party decoder exists in this sandbox (libjpeg historically
shipped without it and Java ImageIO still rejects SOF9), so
correctness is evidenced the way the codec is actually constructed:
(a) encoder→decoder round trips are exact for every image, and
(b) arithmetic coding is a lossless re-coding of the SAME quantized
coefficients the Huffman baseline carries, so
``decode(encode_arith(px)) == decode(encode_baseline(px))``
byte-for-byte — the cross-entropy-coder equality the tests fuzz.

Reference parity: the reference accepts .jpg/.jpeg via its extension
predicate and decodes with PIL (reference docext/core/utils.py:56-70,
13-15); arithmetic-coded files are part of that surface.
"""
from __future__ import annotations

# T.81 Table D.3: (Qe value, Next_Index_LPS, Next_Index_MPS, Switch_MPS).
# Entry 113 is the non-adaptive ~0.5 state used for AC signs (it
# transitions only to itself and never switches MPS sense).
_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

# A state byte is (MPS_sense << 7) | state_index, so one bytearray cell
# carries the whole adaptive context.
_FIXED = 113        # the non-adaptive 0.5 state index

DC_STAT_BINS = 64   # 5 contexts x 4 (S0,SS,SP,SN) + X1-15 + M bins
AC_STAT_BINS = 256  # 63 x (SE,S0,SP/SN/X1) + two X/M ranges (lo/hi Kx)


class _ArithDecoder:
    """Annex D.2 decoder over one entropy-coded segment.  Feeds zero
    bytes once a marker (0xFF followed by a non-zero, non-stuffing
    byte) or end-of-input is reached — the spec's defined behavior for
    decoding past the segment end."""

    __slots__ = ("data", "pos", "c", "a", "ct", "hit_marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16       # forces the two INITDEC byte fetches
        self.hit_marker = False

    def _byte_in(self) -> int:
        if self.hit_marker:
            return 0
        d, p = self.data, self.pos
        if p >= len(d):
            self.hit_marker = True
            return 0
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2            # stuffed data 0xFF
                return 0xFF
            self.hit_marker = True          # stop AT the marker
            return 0
        self.pos = p + 1
        return b

    def decode(self, st: bytearray, i: int) -> int:
        # renormalize + byte feed (D.2.6), done lazily at entry
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = ((c << 8) | self._byte_in()) & 0xFFFFFFFF
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:             # got both INITDEC bytes
                        a = 0x8000          # doubled below -> 0x10000
            a <<= 1
        sv = st[i]
        qe, nl, nm, sw = _TAB[sv & 0x7F]
        a -= qe
        temp = a << ct
        if c >= temp:
            c -= temp
            # upper subinterval (nominal LPS) with conditional exchange
            if a < qe:
                st[i] = (sv & 0x80) ^ nm    # it was really the MPS
            else:
                st[i] = ((sv & 0x80) ^ (sw << 7)) ^ nl
                sv ^= 0x80                  # decoded the LPS
            a = qe
        elif a < 0x8000:
            # renorm pending: MPS path with conditional exchange
            if a < qe:
                st[i] = ((sv & 0x80) ^ (sw << 7)) ^ nl
                sv ^= 0x80                  # it was really the LPS
            else:
                st[i] = (sv & 0x80) ^ nm
        self.a, self.c, self.ct = a, c, ct
        return sv >> 7


class _ArithEncoder:
    """Annex D.1 encoder for one entropy-coded segment, with the
    stacked-0xFF carry resolution and trailing-zero suppression of
    D.1.6-D.1.8.  Emitted 0xFF bytes are stuffed with 0x00."""

    __slots__ = ("c", "a", "ct", "buffer", "sc", "zc", "out")

    def __init__(self):
        self.c = 0
        self.a = 0x10000
        self.ct = 11        # 3 spacer bits keep carries one byte deep
        self.buffer = -1    # pending byte (carry may still bump it)
        self.sc = 0         # stacked 0xFF bytes awaiting carry fate
        self.zc = 0         # pending 0x00 bytes (dropped if trailing)
        self.out = bytearray()

    def _emit_pending(self):
        if self.zc:
            self.out += b"\x00" * self.zc
            self.zc = 0

    def _byte_out(self):
        temp = self.c >> 19
        if temp > 0xFF:                     # carry into the pipeline
            if self.buffer >= 0:
                self._emit_pending()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc              # 0xFF + carry -> 0x00 bytes
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1                    # fate decided by later carry
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._emit_pending()
                self.out.append(self.buffer)
            if self.sc:
                self._emit_pending()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, st: bytearray, i: int, val: int):
        sv = st[i]
        qe, nl, nm, sw = _TAB[sv & 0x7F]
        self.a -= qe
        if val != (sv >> 7):
            # LPS path (with conditional exchange)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = ((sv & 0x80) ^ (sw << 7)) ^ nl
        else:
            # MPS path
            if self.a >= 0x8000:
                return                      # no renorm -> no adaptation
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ nm
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        # D.1.8: choose the point in [C, C+A) with most trailing zeros
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                self._emit_pending()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._emit_pending()
                self.out.append(self.buffer)
            if self.sc:
                self._emit_pending()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
        # significant final bytes only (trailing zeros may be dropped)
        if self.c & 0x7FFF800:
            self._emit_pending()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        return bytes(self.out)


# ---- sequential-DCT statistical model (Annex F.2.4 / F.1.4) ---------------

class ArithScanDecoder:
    """Decodes zigzag-ordered quantized coefficient blocks from one
    SOF9 sequential scan.  ``dc_cond[id] = (L, U)`` and
    ``ac_cond[id] = Kx`` come from the DAC marker (defaults 0/1/5)."""

    def __init__(self, data: bytes, start: int, comps: list[dict],
                 dc_cond: dict, ac_cond: dict):
        self.data = data
        self.comps = comps
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond
        self.dec = _ArithDecoder(data, start)
        self._reset_stats()

    def _reset_stats(self):
        self.dc_stats = {c["dc"]: bytearray(DC_STAT_BINS)
                         for c in self.comps}
        self.ac_stats = {c["ac"]: bytearray(AC_STAT_BINS)
                         for c in self.comps}
        self.fixed = bytearray([_FIXED])
        self.last_dc = [0] * len(self.comps)
        self.dc_ctx = [0] * len(self.comps)

    def restart(self, expect_n: int) -> bool:
        """Find the next RSTn marker after the decoder's read point,
        verify its number, and re-enter with fresh coder + statistics
        (F.2.1.3.1: statistics are reset at every restart)."""
        d = self.data
        p = self.dec.pos
        n = len(d)
        while p + 1 < n and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        if p + 1 >= n or not 0xD0 <= d[p + 1] <= 0xD7 \
                or d[p + 1] - 0xD0 != expect_n:
            return False
        self.dec = _ArithDecoder(d, p + 2)
        self._reset_stats()
        return True

    def _decode_v(self, dec, st, s, x_base: int):
        """Figures F.21/F.23/F.24: magnitude category then bits.  ``s``
        points at the first-category bin; ``x_base`` at X2 (AC) or X1
        (DC, where the first decision already consumed the shared bin).
        Returns (v, m) with v = decoded magnitude, or None on a
        category overflow (corrupt stream)."""
        m = dec.decode(st, s)
        if m:
            if x_base >= 0:                 # AC: X1 shares bin s
                if dec.decode(st, s):
                    m = 2
                    s = x_base
                    while dec.decode(st, s):
                        m <<= 1
                        if m == 0x8000:
                            return None
                        s += 1
            else:                           # DC: X1 starts at bin 20
                s = 20
                while dec.decode(st, s):
                    m <<= 1
                    if m == 0x8000:
                        return None
                    s += 1
        v = m
        s += 14                             # M bin sits 14 above its X bin
        mm = m >> 1
        while mm:
            if dec.decode(st, s):
                v |= mm
            mm >>= 1
        return v + 1, m

    def decode_block(self, ci: int):
        """One block for component ``ci``: returns 64 zigzag-ordered
        quantized coefficients (DC absolute, predictor applied) or
        None on a corrupt stream."""
        dec = self.dec
        c = self.comps[ci]
        dst = self.dc_stats[c["dc"]]
        ast = self.ac_stats[c["ac"]]
        dc_l, dc_u = self.dc_cond.get(c["dc"], (0, 1))
        kx = self.ac_cond.get(c["ac"], 5)
        q = [0] * 64
        # ---- DC difference (F.2.4.1)
        s0 = self.dc_ctx[ci]
        if dec.decode(dst, s0):
            sign = dec.decode(dst, s0 + 1)
            r = self._decode_v(dec, dst, s0 + 2 + sign, -1)
            if r is None:
                return None
            v, m = r
            if m < (1 << dc_l) >> 1:
                self.dc_ctx[ci] = 0
            elif m > (1 << dc_u) >> 1:
                self.dc_ctx[ci] = 12 + sign * 4
            else:
                self.dc_ctx[ci] = 4 + sign * 4
            self.last_dc[ci] += -v if sign else v
        else:
            self.dc_ctx[ci] = 0
        q[0] = self.last_dc[ci]
        # ---- AC coefficients (F.2.4.2)
        k = 1
        while k <= 63:
            se = 3 * (k - 1)
            if dec.decode(ast, se):
                break                       # EOB
            while dec.decode(ast, se + 1) == 0:
                k += 1
                se += 3
                if k > 63:
                    return None
            sign = dec.decode(self.fixed, 0)
            r = self._decode_v(dec, ast, se + 2,
                               189 if k <= kx else 217)
            if r is None:
                return None
            v, _ = r
            q[k] = -v if sign else v
            k += 1
        return q


class ArithScanEncoder:
    """Encodes zigzag-ordered quantized coefficient blocks into one
    SOF9 entropy-coded segment — the exact mirror of the decoder's
    statistical model, used by the fixture encoders."""

    def __init__(self, comps: list[dict], dc_cond: dict, ac_cond: dict):
        self.comps = comps
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond
        self.out = bytearray()
        self._reset()

    def _reset(self):
        self.enc = _ArithEncoder()
        self.dc_stats = {c["dc"]: bytearray(DC_STAT_BINS)
                         for c in self.comps}
        self.ac_stats = {c["ac"]: bytearray(AC_STAT_BINS)
                         for c in self.comps}
        self.fixed = bytearray([_FIXED])
        self.last_dc = [0] * len(self.comps)
        self.dc_ctx = [0] * len(self.comps)

    def restart(self, n: int):
        self.out += self.enc.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])
        self._reset()

    def _encode_v(self, st, s, v: int, x_base: int):
        """Figures F.6/F.8/F.9 for magnitude v >= 1."""
        enc = self.enc
        m = 0
        v -= 1
        if v:
            enc.encode(st, s, 1)
            m = 1
            v2 = v
            if x_base >= 0:                 # AC: X1 shares bin s
                v2 >>= 1
                if v2:
                    enc.encode(st, s, 1)
                    m = 2
                    s = x_base
                    while (v2 := v2 >> 1):
                        enc.encode(st, s, 1)
                        m <<= 1
                        s += 1
            else:                           # DC: X1 at bin 20
                s = 20
                while (v2 := v2 >> 1):
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        mm = m >> 1
        while mm:
            enc.encode(st, s, 1 if v & mm else 0)
            mm >>= 1
        return m

    def encode_block(self, ci: int, q: list[int]):
        enc = self.enc
        c = self.comps[ci]
        dst = self.dc_stats[c["dc"]]
        ast = self.ac_stats[c["ac"]]
        dc_l, dc_u = self.dc_cond.get(c["dc"], (0, 1))
        kx = self.ac_cond.get(c["ac"], 5)
        # ---- DC difference
        s0 = self.dc_ctx[ci]
        diff = q[0] - self.last_dc[ci]
        self.last_dc[ci] = q[0]
        if diff == 0:
            enc.encode(dst, s0, 0)
            self.dc_ctx[ci] = 0
        else:
            enc.encode(dst, s0, 1)
            sign = 1 if diff < 0 else 0
            enc.encode(dst, s0 + 1, sign)
            m = self._encode_v(dst, s0 + 2 + sign, abs(diff), -1)
            if m < (1 << dc_l) >> 1:
                self.dc_ctx[ci] = 0
            elif m > (1 << dc_u) >> 1:
                self.dc_ctx[ci] = 12 + sign * 4
            else:
                self.dc_ctx[ci] = 4 + sign * 4
        # ---- AC coefficients
        ke = 63
        while ke > 0 and q[ke] == 0:
            ke -= 1
        k = 1
        while k <= ke:
            se = 3 * (k - 1)
            enc.encode(ast, se, 0)          # not EOB yet
            while q[k] == 0:
                enc.encode(ast, se + 1, 0)
                se += 3
                k += 1
            enc.encode(ast, se + 1, 1)
            v = q[k]
            sign = 1 if v < 0 else 0
            enc.encode(self.fixed, 0, sign)
            self._encode_v(ast, se + 2, abs(v),
                           189 if k <= kx else 217)
            k += 1
        if k <= 63:
            enc.encode(ast, 3 * (k - 1), 1)  # EOB decision
    def finish(self) -> bytes:
        self.out += self.enc.flush()
        return bytes(self.out)
