"""MPEG-1 video (ISO/IEC 11172-2, public spec) I/P/B-FRAME codec —
witness encoder + decoder, numpy only.

Closes the r10 VERDICT item 7 ("one compressed-video payload codec")
and extends it past intra coding (r10 "What's missing" #4): the video
surface now decodes a real inter-era codec's intra, forward-predicted
AND bidirectionally-predicted frames — sequence header → GOP → I/P/B
pictures → slices → macroblocks (address-increment VLC with
skip/stuffing/escape, P and B macroblock types, forward/backward
motion vectors with f_code residuals and the spec's complement/wrap
reconstruction, half-pel motion compensation, interpolated (averaged)
bidirectional prediction, coded-block-pattern VLC, intra DC
prediction + AC run/level coding, non-intra dct_coeff_first, integer
reconstruction with mismatch control) → IDCT → motion-compensated add
→ 4:2:0 YCbCr → RGB, with the classic one-anchor reorder buffer
mapping decode order back to display order. The DCT pair, zigzag, and
color transforms are shared with the from-scratch JPEG codec
(functions/jpeg.py).

Exactness notes (all public-spec content):
- the default intra quantizer matrix (§2.4.4.2; the default non-intra
  matrix is flat 16s), the DC-size VLCs (Table B.5a/b), the motion
  magnitude VLC (Table B.4), the P-picture macroblock_type VLC
  (Table B.2b) and the full 63-entry coded_block_pattern VLC
  (Table B.3) are transcribed in full. Table B.1
  (macroblock_address_increment) is DERIVED from Table B.4 — the two
  tables are the same prefix tree re-indexed (increment 1 = '1',
  increment 2n = mag(n)+'1', 2n+1 = mag(n)+'0'), so the code builds
  B.1 from B.4 programmatically; a transcription slip would break
  both tables' roundtrips at once (tests pin prefix-freeness, Kraft
  completeness and the spec's published anchor rows);
- the AC run/level table is the FULL Table B.5c (all 111 rows through
  the 16-bit codes, r12 — the r11 build gated the 10-16-bit rows)
  plus the fully general 6-bit ESCAPE coding; the transcription is
  expressed through the table's dense-block structure (one contiguous
  codeword range per code length) and the encoder emits table rows
  before escaping, so roundtrips exercise the deep rows;
- reconstruction uses the spec's integer arithmetic with "/" =
  integer division TRUNCATING TOWARD ZERO (§2.1.2): intra
  rec = (2·level·qscale·W)/16, non-intra
  rec = ((2·level+Sign(level))·qscale·16)/16, both with oddification
  (even values step toward zero) and [−2048, 2047] clamp; intra DC is
  level·8 exactly;
- half-pel prediction averages with the spec's "//" rounding (round
  half away from zero; operands are non-negative pels, so
  (a+b+1)>>1 / (a+b+c+d+2)>>2); chroma vectors are the luma
  reconstruction divided by two truncating toward zero (§2.4.4.3);
- skipped P macroblocks copy the co-located reference macroblock and
  reset both motion-vector predictors to zero; macroblocks coded
  without forward MC use a zero vector and also reset the predictors;
  DC predictors reset to 128 at slice start and after any non-intra
  macroblock.

B-picture semantics (§2.4.4.4): skipped macroblocks repeat the
PREVIOUS macroblock's prediction mode and vectors (predictors are not
reset, unlike P skips); a B picture displays before the most recent
anchor, so the decoder holds each anchor back one step and emits it
when the next anchor (or the sequence end) arrives.

D pictures (picture_coding_type 4, the DC-only fast-forward preview
type) decode to flat per-block means; every picture type the spec
defines now decodes, and stream-loaded custom quantizer matrices
(the 64 values ride in the sequence header, zigzag download order)
apply to reconstruction (r12 — previously gated). The witness
encoder emits I-only,
IPPP, IBB…P, or all-D streams with f_code 1..7,
optional full-pel vectors (I/P), a real (exhaustive, half-pel) motion
search against the encoder-side RECONSTRUCTED reference — identical
arithmetic to the decoder, so prediction drift is zero by
construction — per-macroblock forward/backward/interpolated mode
election in B pictures, and skip election for static macroblocks.

Reference behavior parity: the reference (/root/reference/main.py) has
no video path; this is engine frontier surface for video-corpus
curation (MPEG-1 elementary streams are the classic archival format).
"""

from __future__ import annotations

import numpy as np

from .jpeg import ZIGZAG, _C, _rgb_to_ycbcr, _ycbcr_to_rgb

# default intra quantizer matrix, ISO 11172-2 §2.4.4.2 (raster order)
INTRA_QUANT = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
).reshape(8, 8)

# DC size VLCs (Table B.5a luminance / B.5b chrominance): size -> code
_DC_LUMA = {0: "100", 1: "00", 2: "01", 3: "101", 4: "110", 5: "1110",
            6: "11110", 7: "111110", 8: "1111110"}
_DC_CHROMA = {0: "00", 1: "01", 2: "10", 3: "110", 4: "1110",
              5: "11110", 6: "111110", 7: "1111110", 8: "11111110"}

# FULL AC run/level VLC, Table B.5c (r12 — replaces the short-rows
# gate; a sign bit follows each code, '10' = EOB, '000001' = escape).
# Transcribed through the table's dense-block structure: at every code
# length the used codewords form ONE contiguous integer range (the
# all-zeros subtrees stay reserved against start-code emulation), so
# each length is written as (first_codeword, (run, level) per codeword
# ascending). Tests pin global prefix-freeness, the block contiguity
# itself, the overlap with the independently-verified short rows, and
# published anchor rows.
_AC_BLOCKS: dict[int, tuple[int, tuple[tuple[int, int], ...]]] = {
    2: (0x3, ((0, 1),)),                       # 0x2 = EOB
    3: (0x3, ((1, 1),)),
    4: (0x4, ((0, 2), (2, 1))),
    5: (0x5, ((0, 3), (4, 1), (3, 1))),
    6: (0x4, ((7, 1), (6, 1), (1, 2), (5, 1))),  # 0x1 = escape
    7: (0x4, ((2, 2), (9, 1), (0, 4), (8, 1))),
    8: (0x20, ((13, 1), (0, 6), (12, 1), (11, 1),
               (3, 2), (1, 3), (0, 5), (10, 1))),
    10: (0x8, ((16, 1), (5, 2), (0, 7), (2, 3),
               (1, 4), (15, 1), (14, 1), (4, 2))),
    12: (0x10, ((0, 11), (8, 2), (4, 3), (0, 10), (2, 4), (7, 2),
                (21, 1), (20, 1), (0, 9), (19, 1), (18, 1), (1, 5),
                (3, 3), (0, 8), (6, 2), (17, 1))),
    13: (0x10, ((10, 2), (9, 2), (5, 3), (3, 4), (2, 5), (1, 7),
                (1, 6), (0, 15), (0, 14), (0, 13), (0, 12), (26, 1),
                (25, 1), (24, 1), (23, 1), (22, 1))),
    14: (0x10, ((0, 31), (0, 30), (0, 29), (0, 28), (0, 27), (0, 26),
                (0, 25), (0, 24), (0, 23), (0, 22), (0, 21), (0, 20),
                (0, 19), (0, 18), (0, 17), (0, 16))),
    15: (0x10, ((0, 40), (0, 39), (0, 38), (0, 37), (0, 36), (0, 35),
                (0, 34), (0, 33), (0, 32), (1, 14), (1, 13), (1, 12),
                (1, 11), (1, 10), (1, 9), (1, 8))),
    16: (0x10, ((1, 18), (1, 17), (1, 16), (1, 15), (6, 3), (16, 2),
                (15, 2), (14, 2), (13, 2), (12, 2), (11, 2), (31, 1),
                (30, 1), (29, 1), (28, 1), (27, 1))),
}
_AC_TABLE: dict[str, tuple[int, int]] = {
    format(first + i, f"0{length}b"): rl
    for length, (first, rls) in _AC_BLOCKS.items()
    for i, rl in enumerate(rls)
}
_AC_INV = {rl: code for code, rl in _AC_TABLE.items()}
_AC_MAXLEN = max(len(c) for c in _AC_TABLE)
_DC_LUMA_INV = {v: k for k, v in _DC_LUMA.items()}
_DC_CHROMA_INV = {v: k for k, v in _DC_CHROMA.items()}

# motion_code magnitude VLC (Table B.4): |code| -> bits; every nonzero
# magnitude is followed by one sign bit (1 = negative) and, when
# forward_f_code > 1, by f_code-1 residual bits.
_MOTION_MAG = {
    0: "1", 1: "01", 2: "001", 3: "0001", 4: "000011", 5: "0000101",
    6: "0000100", 7: "0000011", 8: "000001011", 9: "000001010",
    10: "000001001", 11: "0000010001", 12: "0000010000",
    13: "0000001111", 14: "0000001110", 15: "0000001101",
    16: "0000001100",
}
_MOTION_MAG_INV = {v: k for k, v in _MOTION_MAG.items()}

# macroblock_address_increment VLC (Table B.1) is Table B.4's prefix
# tree re-indexed: 1 = '1'; increment 2n = mag(n)+'1', 2n+1 =
# mag(n)+'0' for n = 1..16 (so 2='011', 3='010', …, 33='00000011000'),
# plus the escape (+33) and stuffing (discard) codes.
_ADDR_INC: dict[int, str] = {1: "1"}
for _n in range(1, 17):
    _ADDR_INC[2 * _n] = _MOTION_MAG[_n] + "1"
    _ADDR_INC[2 * _n + 1] = _MOTION_MAG[_n] + "0"
_ADDR_INC_INV = {v: k for k, v in _ADDR_INC.items()}
_ADDR_ESCAPE = "00000001000"
_ADDR_STUFFING = "00000001111"

# macroblock_type VLCs: code -> (quant, motion_forward,
# motion_backward, coded, intra). Table B.2a (I pictures), B.2b (P)
# and B.2c (B pictures).
_I_MB_TYPE = {"1": (0, 0, 0, 0, 1), "01": (1, 0, 0, 0, 1)}
_P_MB_TYPE = {
    "1": (0, 1, 0, 1, 0), "01": (0, 0, 0, 1, 0), "001": (0, 1, 0, 0, 0),
    "00011": (0, 0, 0, 0, 1), "00010": (1, 1, 0, 1, 0),
    "00001": (1, 0, 0, 1, 0), "000001": (1, 0, 0, 0, 1),
}
_B_MB_TYPE = {
    "10": (0, 1, 1, 0, 0), "11": (0, 1, 1, 1, 0),
    "010": (0, 0, 1, 0, 0), "011": (0, 0, 1, 1, 0),
    "0010": (0, 1, 0, 0, 0), "0011": (0, 1, 0, 1, 0),
    "00011": (0, 0, 0, 0, 1), "00010": (1, 1, 1, 1, 0),
    "000011": (1, 1, 0, 1, 0), "000010": (1, 0, 1, 1, 0),
    "000001": (1, 0, 0, 0, 1),
}

# coded_block_pattern VLC (Table B.3), all 63 nonzero patterns
# (bit 5 = Y0 … bit 0 = Cr; cbp 0 means "macroblock not coded").
_CBP_CODES = {
    60: "111",
    4: "1101", 8: "1100", 16: "1011", 32: "1010",
    12: "10011", 48: "10010", 20: "10001", 40: "10000",
    28: "01111", 44: "01110", 52: "01101", 56: "01100",
    1: "01011", 61: "01010", 2: "01001", 62: "01000",
    24: "001111", 36: "001110", 3: "001101", 63: "001100",
    5: "0010111", 9: "0010110", 17: "0010101", 33: "0010100",
    6: "0010011", 10: "0010010", 18: "0010001", 34: "0010000",
    7: "00011111", 11: "00011110", 19: "00011101", 35: "00011100",
    13: "00011011", 49: "00011010", 21: "00011001", 41: "00011000",
    14: "00010111", 50: "00010110", 22: "00010101", 42: "00010100",
    15: "00010011", 51: "00010010", 23: "00010001", 43: "00010000",
    25: "00001111", 37: "00001110", 26: "00001101", 38: "00001100",
    29: "00001011", 45: "00001010", 53: "00001001", 57: "00001000",
    30: "00000111", 46: "00000110", 54: "00000101", 58: "00000100",
    31: "000000111", 47: "000000110", 55: "000000101", 59: "000000100",
    27: "000000011", 39: "000000010",
}
_CBP_INV = {v: k for k, v in _CBP_CODES.items()}

_PICTURE_RATES = {1: 23.976, 2: 24.0, 3: 25.0, 4: 29.97, 5: 30.0,
                  6: 50.0, 7: 59.94, 8: 60.0}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if value < 0 or (bits and value >> bits):
            raise ValueError(f"value {value} does not fit {bits} bits")
        self.acc = (self.acc << bits) | value
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_code(self, code: str) -> None:
        self.write(int(code, 2), len(code))

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def start_code(self, value: int) -> None:
        self.align()
        self.buf += b"\x00\x00\x01" + bytes([value])

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _vlc_lut(inv: dict[str, object]) -> tuple[list, int]:
    """Flat prefix-expanded lookup table for a code-string -> symbol
    VLC dict: lut[peeked_maxlen_bits] = (symbol, code_length) for every
    prefix of every code, None where no code matches. Built once per
    table (r16 optimization: replaces the per-bit string-building walk,
    which profiling showed dominated decode CPU — guide §1.2 step 2)."""
    maxlen = max(len(c) for c in inv)
    lut: list = [None] * (1 << maxlen)
    for code, sym in inv.items():
        ln = len(code)
        base = int(code, 2) << (maxlen - ln)
        entry = (sym, ln)
        for s in range(1 << (maxlen - ln)):
            lut[base + s] = entry
    return lut, maxlen


# id(table) -> (table, lut, maxlen); the table reference is kept in the
# value so the id can never be recycled by a GC'd dict
_VLC_LUTS: dict[int, tuple[dict, list, int]] = {}


def _lut_for(inv: dict[str, object]) -> tuple[list, int]:
    cached = _VLC_LUTS.get(id(inv))
    if cached is None or cached[0] is not inv:
        lut, maxlen = _vlc_lut(inv)
        _VLC_LUTS[id(inv)] = (inv, lut, maxlen)
        return lut, maxlen
    return cached[1], cached[2]


class _BitReader:
    """MSB-first bit reader over an accumulator refilled 8 bytes at a
    time — every read/peek is O(1) on small ints (the r16 rewrite of
    the per-bit byte-indexing loop; outputs are bit-identical)."""

    __slots__ = ("b", "pos", "_total", "_acc", "_accbits", "_bytepos")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.pos = 0
        self._total = len(b) * 8
        self._acc = 0
        self._accbits = 0
        self._bytepos = 0

    def read(self, bits: int) -> int:
        end = self.pos + bits
        if end > self._total:
            raise ValueError("truncated MPEG-1 stream")
        acc, n = self._acc, self._accbits
        while n < bits:
            chunk = self.b[self._bytepos : self._bytepos + 8]
            acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            n += 8 * len(chunk)
            self._bytepos += len(chunk)
        n -= bits
        v = acc >> n
        self._acc = acc & ((1 << n) - 1)
        self._accbits = n
        self.pos = end
        return v

    def peek(self, bits: int) -> int:
        """Next ``bits`` bits without consuming, zero-padded past the
        end of the stream (callers must bounds-check code lengths
        against ``pos``/``_total`` before consuming)."""
        acc, n, bp = self._acc, self._accbits, self._bytepos
        blen = len(self.b)
        while n < bits and bp < blen:
            chunk = self.b[bp : bp + 8]
            acc = (acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            n += 8 * len(chunk)
            bp += len(chunk)
        self._acc, self._accbits, self._bytepos = acc, n, bp
        if n >= bits:
            return acc >> (n - bits)
        return acc << (bits - n)

    def _read_vlc_slow(self, inv: dict[str, object], what: str,
                       maxlen: int) -> object:
        # original per-bit walk, kept for the malformed/truncated error
        # paths so messages stay byte-for-byte identical
        code = ""
        while len(code) <= maxlen:
            code += "1" if self.read(1) else "0"
            if code in inv:
                return inv[code]
        raise ValueError(f"bad MPEG-1 {what} code {code!r}")

    def read_vlc(self, inv: dict[str, object], what: str,
                 maxlen: int) -> object:
        lut, lml = _lut_for(inv)
        entry = lut[self.peek(lml)]
        if entry is not None and self.pos + entry[1] <= self._total:
            self.read(entry[1])
            return entry[0]
        return self._read_vlc_slow(inv, what, maxlen)

    def read_dc_size(self, inv: dict[str, int], maxlen: int = 8) -> int:
        # maxlen 8 covers MPEG-1's Tables B.5a/b; MPEG-2's extended
        # B-12/B-13 ladders reach 10-bit codes (size 11 chroma)
        lut, lml = _lut_for(inv)
        entry = lut[self.peek(lml)]
        if entry is not None and self.pos + entry[1] <= self._total:
            self.read(entry[1])
            return entry[0]
        code = ""
        while len(code) <= maxlen:
            code += "1" if self.read(1) else "0"
            if code in inv:
                return inv[code]
        raise ValueError(f"bad MPEG DC size code {code!r}")

    def rest_is_zero(self) -> bool:
        """True when every remaining bit is zero (slice padding)."""
        if self.pos >= self._total:
            return True
        # invariant: bits [pos, _bytepos*8) are exactly the low
        # _accbits bits of _acc; bits from _bytepos*8 on are unread
        if self._acc:
            return False
        return not any(self.b[self._bytepos :])


# ---------------------------------------------------------------------------
# integer reconstruction (§2.4.4.1/.2: "/" truncates toward zero,
# mismatch control oddifies even values toward zero, clamp ±2048/2047)
# ---------------------------------------------------------------------------


def _trunc_div(v: int, d: int) -> int:
    return v // d if v >= 0 else -((-v) // d)


def _oddify_clamp(v: int) -> int:
    if v and v % 2 == 0:
        v += -1 if v > 0 else 1
    return max(-2048, min(2047, v))


_WQ_ZZ = INTRA_QUANT.reshape(64)[ZIGZAG]
_WQ_NI_FLAT = np.full(64, 16, dtype=np.int64)  # default non-intra


def _dequant_intra(
    levels: np.ndarray, qscale: int, wq: np.ndarray = _WQ_ZZ
) -> np.ndarray:
    """Zigzag-order quantized levels (levels[0] = quantized DC) ->
    spatial 8x8 float block via the spec's integer reconstruction.
    ``wq`` is the (possibly stream-loaded) intra matrix in zigzag
    order."""
    rec = np.zeros(64, dtype=np.int64)
    rec[0] = max(-2048, min(2047, int(levels[0]) * 8))
    # vectorized over the (sparse) nonzero AC levels; integer
    # semantics identical to the scalar _trunc_div/_oddify_clamp pair
    nz = np.nonzero(levels[1:])[0] + 1
    if nz.size:
        lv = levels[nz]
        v = 2 * lv * qscale * wq[nz]
        sign = np.sign(v)
        t = np.abs(v) // 16 * sign  # "/" truncates toward zero
        even = (t != 0) & (t % 2 == 0)
        t[even] -= np.sign(t[even])  # mismatch control
        np.clip(t, -2048, 2047, out=t)
        rec[ZIGZAG[nz]] = t
    return _C.T @ rec.reshape(8, 8).astype(np.float64) @ _C


def _dequant_nonintra(
    levels: np.ndarray, qscale: int, wq: np.ndarray = _WQ_NI_FLAT
) -> np.ndarray:
    """Zigzag-order non-intra levels -> spatial residual. With the
    default flat-16 matrix the spec's (2·lv+sign)·qscale·W/16
    collapses to (2·lv+sign)·qscale; a stream-loaded matrix keeps the
    full form."""
    rec = np.zeros(64, dtype=np.int64)
    nz = np.nonzero(levels)[0]
    if nz.size:
        lv = levels[nz]
        v = (2 * lv + np.sign(lv)) * qscale * wq[nz]
        sign = np.sign(v)
        t = np.abs(v) // 16 * sign  # "/" truncates toward zero
        even = (t != 0) & (t % 2 == 0)
        t[even] -= np.sign(t[even])  # mismatch control
        np.clip(t, -2048, 2047, out=t)
        rec[ZIGZAG[nz]] = t
    return _C.T @ rec.reshape(8, 8).astype(np.float64) @ _C


# sparse dequant twins (r16): the decode loop produces a handful of
# nonzero (zigzag-index, level) pairs per block, and the dense numpy
# path pays ~8 small-array kernel launches to process them. Plain
# integer Python over the sparse pairs is 3-4x faster at typical
# sparsity and BIT-IDENTICAL by construction (same truncating
# division, mismatch control, clamp order); the dense functions above
# stay as the reference twins (encoder-side reconstruction and the
# differential test use them).
_ZIG_LIST: list[int] = [int(z) for z in ZIGZAG]
_WQ_ZZ_LIST: list[int] = [int(x) for x in _WQ_ZZ]
_WQ_NI_LIST: list[int] = [16] * 64
_WQ_LISTS: dict[int, tuple] = {}  # id(arr) -> (arr ref, list twin)


def _wq_list(wq: np.ndarray) -> list[int]:
    cached = _WQ_LISTS.get(id(wq))
    if cached is not None and cached[0] is wq:
        return cached[1]
    if len(_WQ_LISTS) > 4096:  # bound: entries pin their arrays alive
        _WQ_LISTS.clear()
    twin = [int(x) for x in wq]
    _WQ_LISTS[id(wq)] = (wq, twin)
    return twin


def _dequant_intra_sparse(
    qdc: int, pairs: list[tuple[int, int]], qscale: int, wql: list[int]
) -> np.ndarray:
    rec = [0.0] * 64
    rec[0] = float(max(-2048, min(2047, qdc * 8)))
    for i, lv in pairs:
        v = 2 * lv * qscale * wql[i]
        t = v >> 4 if v >= 0 else -((-v) >> 4)  # truncate toward zero
        if t and not (t & 1):
            t += -1 if t > 0 else 1  # mismatch control
        if t > 2047:
            t = 2047
        elif t < -2048:
            t = -2048
        rec[_ZIG_LIST[i]] = float(t)
    m = np.array(rec, dtype=np.float64).reshape(8, 8)
    return _C.T @ m @ _C


def _dequant_nonintra_sparse(
    pairs: list[tuple[int, int]], qscale: int, wql: list[int]
) -> np.ndarray:
    rec = [0.0] * 64
    for i, lv in pairs:
        if lv == 0:  # the dense twin's nonzero() filter
            continue
        s = 1 if lv > 0 else -1
        v = (2 * lv + s) * qscale * wql[i]
        t = v >> 4 if v >= 0 else -((-v) >> 4)
        if t and not (t & 1):
            t += -1 if t > 0 else 1
        if t > 2047:
            t = 2047
        elif t < -2048:
            t = -2048
        rec[_ZIG_LIST[i]] = float(t)
    m = np.array(rec, dtype=np.float64).reshape(8, 8)
    return _C.T @ m @ _C


# ---------------------------------------------------------------------------
# coefficient (run, level) coding
# ---------------------------------------------------------------------------


def _dc_diff_bits(diff: int) -> tuple[int, int]:
    """-> (size, offset-coded value) per §2.4.3.7."""
    size = abs(diff).bit_length()
    if diff >= 0:
        return size, diff
    return size, diff + (1 << size) - 1


def _write_escape(w: _BitWriter, run: int, level: int) -> None:
    w.write_code("000001")
    w.write(run, 6)
    if -127 <= level <= 127:
        w.write(level & 0xFF, 8)
    elif level > 127:
        w.write(0, 8)
        w.write(level, 8)
    else:
        w.write(0x80, 8)
        w.write(level + 256, 8)


def _read_escape1(r: _BitReader) -> tuple[int, int]:
    """MPEG-1 escape payload: 6-bit run + 8/16-bit level (§2.4.3.7)."""
    run = r.read(6)
    first = r.read(8)
    if first == 0:
        level = r.read(8)
        if level < 128:
            raise ValueError("non-canonical MPEG-1 escape level")
    elif first == 0x80:
        level = r.read(8) - 256
        if level > -128 or level == -256:
            raise ValueError("non-canonical MPEG-1 escape level")
    else:
        level = first - 256 if first & 0x80 else first
        if level == 0:
            raise ValueError("MPEG-1 escape level of zero")
    return run, level


_AC_ESC = object()  # escape sentinel in the tail LUT

# Table B.5c codes that start '0', leading bit stripped (the tail
# state after callers consumed the first '0'), plus the escape
_AC_TAIL_LUT, _AC_TAIL_MAXLEN = _vlc_lut(
    {c[1:]: rl for c, rl in _AC_TABLE.items() if c[0] == "0"}
    | {"00001": _AC_ESC}
)


def _read_run_level_tail(
    r: _BitReader, code: str, escape=None
) -> tuple[int, int]:
    """Finish a run/level code whose first bits are in ``code`` (never
    the '1x' prefix — EOB and (0,±1) are handled by callers). The
    Table B.5c prefix tree is shared with MPEG-2's Table B-14; only
    the escape payload differs, so MPEG-2 (functions/mpeg2.py) passes
    its 6+12-bit reader as ``escape``."""
    if code == "0":  # the only prefix live callers pass — LUT path
        entry = _AC_TAIL_LUT[r.peek(_AC_TAIL_MAXLEN)]
        if entry is not None and r.pos + entry[1] <= r._total:
            sym, ln = entry
            r.read(ln)
            if sym is _AC_ESC:
                return escape(r) if escape is not None else _read_escape1(r)
            run, level = sym
            if r.read(1):
                level = -level
            return run, level
        # malformed/truncated stream: the per-bit loop below raises
        # the original diagnostics
    while code not in _AC_TABLE and code != "000001":
        if len(code) > _AC_MAXLEN:
            raise ValueError(f"invalid MPEG-1 AC code {code!r}")
        code += str(r.read(1))
    if code == "000001":
        if escape is not None:
            return escape(r)
        return _read_escape1(r)
    run, level = _AC_TABLE[code]
    if r.read(1):
        level = -level
    return run, level


_AC_EOB = object()  # EOB sentinel in the fused dct_coeff LUT


def _dct_next_lut() -> tuple[list, int]:
    """Fused dct_coeff_next LUT: one peek resolves code AND sign
    ('10' = EOB, '11'+s = (0, ±1), Table B.5c rows with their sign
    bit; the escape prefix stays a sentinel — its payload follows)."""
    tbl: dict[str, object] = {"10": _AC_EOB, "000001": _AC_ESC}
    for code, (run, level) in _AC_TABLE.items():
        tbl[code + "0"] = (run, level)
        tbl[code + "1"] = (run, -level)
    return _vlc_lut(tbl)


_DCT_NEXT_LUT, _DCT_NEXT_MAXLEN = _dct_next_lut()


def _read_run_level(r: _BitReader) -> tuple[int, int] | None:
    """One dct_coeff_next -> (run, level), or None at EOB."""
    entry = _DCT_NEXT_LUT[r.peek(_DCT_NEXT_MAXLEN)]
    if entry is not None and r.pos + entry[1] <= r._total:
        sym = entry[0]
        r.read(entry[1])
        if type(sym) is tuple:
            return sym
        if sym is _AC_EOB:
            return None
        return _read_escape1(r)
    # malformed/truncated: original per-bit walk for diagnostics
    if r.read(1):
        if r.read(1):  # '11' = (0, ±1)
            return (0, -1) if r.read(1) else (0, 1)
        return None  # '10' = EOB
    return _read_run_level_tail(r, "0")


def _decode_block(
    r: _BitReader, qscale: int, dc_pred: int, dc_inv: dict[str, int],
    wq: np.ndarray = None,
) -> tuple[np.ndarray, int]:
    """One intra block -> (spatial 8x8 float, new DC predictor)."""
    size = r.read_dc_size(dc_inv)
    if size:
        offset = r.read(size)
        diff = offset if offset >= (1 << (size - 1)) else (
            offset - (1 << size) + 1
        )
    else:
        diff = 0
    qdc = dc_pred + diff
    pairs: list[tuple[int, int]] = []
    i = 0
    while (rl := _read_run_level(r)) is not None:
        run, level = rl
        i += run + 1
        if i > 63:
            raise ValueError("MPEG-1 AC coefficients overflow the block")
        pairs.append((i, level))
    return _dequant_intra_sparse(
        qdc, pairs, qscale, _WQ_ZZ_LIST if wq is None else _wq_list(wq)
    ), qdc


def _decode_block_nonintra(
    r: _BitReader, qscale: int, wq: np.ndarray = None
) -> np.ndarray:
    """One coded non-intra block -> spatial residual. dct_coeff_first:
    EOB cannot appear, so '1'+sign means (0, ±1) (§2.4.3.7)."""
    if r.read(1):
        i = 0
        run, level = 0, (-1 if r.read(1) else 1)
    else:
        run, level = _read_run_level_tail(r, "0")
        i = run
    if i > 63:
        raise ValueError("MPEG-1 AC coefficients overflow the block")
    pairs: list[tuple[int, int]] = [(i, level)]
    while (rl := _read_run_level(r)) is not None:
        run, level = rl
        i += run + 1
        if i > 63:
            raise ValueError("MPEG-1 AC coefficients overflow the block")
        pairs.append((i, level))
    return _dequant_nonintra_sparse(
        pairs, qscale, _WQ_NI_LIST if wq is None else _wq_list(wq)
    )


def _quant_intra(
    coeff: np.ndarray, qscale: int, dc_pred: int,
    wq: np.ndarray = _WQ_ZZ,
) -> np.ndarray:
    """DCT coefficients -> zigzag quantized levels (levels[0] = DC)."""
    zz = coeff.reshape(64)[ZIGZAG]
    qdc = int(np.rint(zz[0] / 8.0))
    qdc = max(-255 + dc_pred, min(255 + dc_pred, qdc))  # diff fits 8 sizes
    levels = np.zeros(64, dtype=np.int64)
    levels[0] = qdc
    for i in range(1, 64):
        lv = int(np.rint(16.0 * zz[i] / (2.0 * qscale * int(wq[i]))))
        levels[i] = max(-255, min(255, lv))
    return levels


def _quant_nonintra(
    coeff: np.ndarray, qscale: int, wq: np.ndarray = _WQ_NI_FLAT
) -> np.ndarray:
    """Residual DCT coefficients -> zigzag levels with the classic
    dead-zone (truncating) non-intra quantizer."""
    zz = coeff.reshape(64)[ZIGZAG]
    levels = np.zeros(64, dtype=np.int64)
    for i in range(64):
        # trunc toward zero: dead zone (W = 16 collapses to /2qscale)
        lv = int(16.0 * zz[i] / (2.0 * qscale * int(wq[i])))
        levels[i] = max(-255, min(255, lv))
    return levels


def _write_intra_levels(
    w: _BitWriter, levels: np.ndarray, dc_pred: int, dc_table: dict[int, str]
) -> None:
    diff = int(levels[0]) - dc_pred
    size, offset = _dc_diff_bits(diff)
    if size > 8:
        raise ValueError("MPEG-1 DC differential out of range")
    w.write_code(dc_table[size])
    if size:
        w.write(offset, size)
    run = 0
    for i in range(1, 64):
        level = int(levels[i])
        if level == 0:
            run += 1
            continue
        _write_run_level(w, run, level)
        run = 0
    w.write_code("10")  # EOB


def _write_run_level(
    w: _BitWriter, run: int, level: int, escape=None
) -> None:
    """dct_coeff_next: Table B.5c code + sign when the (run, |level|)
    row exists, the escape otherwise (r12 — the encoder now exercises
    the full table, so roundtrips cover the deep rows). MPEG-2 passes
    its 6+12-bit escape writer as ``escape``."""
    code = _AC_INV.get((run, abs(level)))
    if code is not None:
        w.write_code(code)
        w.write(0 if level > 0 else 1, 1)
    else:
        (escape or _write_escape)(w, run, level)


def _write_nonintra_levels(w: _BitWriter, levels: np.ndarray) -> None:
    first = True
    run = 0
    for i in range(64):
        level = int(levels[i])
        if level == 0:
            run += 1
            continue
        if first and run == 0 and level in (-1, 1):
            w.write(1, 1)  # dct_coeff_first (0, ±1) = '1' + sign
            w.write(0 if level > 0 else 1, 1)
        else:
            _write_run_level(w, run, level)
        first = False
        run = 0
    if first:
        raise ValueError("MPEG-1 coded block without coefficients")
    w.write_code("10")  # EOB


class _QuantHooks:
    """Quantizer-arithmetic hook bundle for the witness encoder's
    slice loops, so the MPEG-2 twin (functions/mpeg2.py) reuses the
    motion-search / skip-election / bit-layout machinery here with its
    own reconstruction rules (§7.4 of H.262 differs from §2.4.4.1/.2
    only in these six operations)."""

    quant_intra = staticmethod(_quant_intra)
    dequant_intra = staticmethod(_dequant_intra)
    quant_nonintra = staticmethod(_quant_nonintra)
    dequant_nonintra = staticmethod(_dequant_nonintra)
    write_nonintra_levels = staticmethod(_write_nonintra_levels)

    @staticmethod
    def write_intra_levels(w, levels, dc_pred, is_luma):
        _write_intra_levels(
            w, levels, dc_pred, _DC_LUMA if is_luma else _DC_CHROMA
        )

    # decode side
    dc_reset = 128
    decode_block_nonintra = staticmethod(_decode_block_nonintra)

    # macroblock_modes delta: MPEG-1 has no extra mode bits; MPEG-2
    # with frame_pred_frame_dct = 0 reads frame_motion_type and
    # dct_type here (mpeg2._M2Hooks overrides). Returns
    # (motion_format, dct_type): format 2 = frame-based prediction,
    # 1 = field-based (MPEG-2 frame pictures only).
    @staticmethod
    def read_mb_modes(sr, mf, mb, coded, intra):
        return 2, 0

    @staticmethod
    def write_mb_modes(w, mf, mb, coded, intra, dct_type):
        return None

    # one motion vector set for one direction. ``pred`` is the 4-slot
    # PMV list [x0, y0, x1, y1] (§7.6.3 shape; MPEG-1 only ever uses
    # the first pair and mirrors it). Returns (mv_spec, new_pred):
    # a frame spec is a plain (vx, vy); a field spec (MPEG-2) is
    # ("field", ((sel, vx, vy), (sel, vx, vy))).
    @staticmethod
    def read_mv(sr, pred, f_code, fmt):
        # f_code: one int (MPEG-1 — both axes share it) or an
        # (horizontal, vertical) pair (MPEG-2 f_code[s][0]/[s][1])
        fh, fv = (f_code, f_code) if isinstance(f_code, int) else f_code
        dx = _read_motion(sr, fh)
        dy = _read_motion(sr, fv)
        vx = _wrap_vector(pred[0] + dx, 1 << (fh - 1))
        vy = _wrap_vector(pred[1] + dy, 1 << (fv - 1))
        return (vx, vy), [vx, vy, vx, vy]

    @staticmethod
    def pick_dct_type(cur):
        return 0

    @staticmethod
    def luma_view(plane, oy, ox, blk, dct_type):
        """8x8 view of luma block ``blk`` inside the 16x16 macroblock
        at (oy, ox). dct_type 0 = frame DCT (quadrants); 1 = field
        DCT (blocks 0/1 = top-field rows, 2/3 = bottom-field rows —
        §6.3.17.1, luma only)."""
        bx = ox + (blk % 2) * 8
        if dct_type:
            return plane[oy + (blk // 2) : oy + 16 : 2, bx : bx + 8]
        by = oy + (blk // 2) * 8
        return plane[by : by + 8, bx : bx + 8]

    @staticmethod
    def map_qscale(code):
        return code

    @staticmethod
    def decode_block_intra(r, qscale, dc_pred, is_luma):
        return _decode_block(
            r, qscale, dc_pred, _DC_LUMA_INV if is_luma else _DC_CHROMA_INV
        )


_M1_HOOKS = _QuantHooks()


class _MatrixHooks(_QuantHooks):
    """MPEG-1 hooks bound to STREAM-LOADED quantizer matrices (r12 —
    closes the custom-matrix gate; the matrices arrive in the
    sequence header itself, so there is nothing to transcribe).
    ``wq``/``wq_ni`` are zigzag-order int64 arrays."""

    def __init__(self, wq: np.ndarray, wq_ni: np.ndarray) -> None:
        self.wq = wq
        self.wq_ni = wq_ni

    def quant_intra(self, coeff, qscale, dc_pred):
        return _quant_intra(coeff, qscale, dc_pred, self.wq)

    def dequant_intra(self, levels, qscale):
        return _dequant_intra(levels, qscale, self.wq)

    def quant_nonintra(self, coeff, qscale):
        return _quant_nonintra(coeff, qscale, self.wq_ni)

    def dequant_nonintra(self, levels, qscale):
        return _dequant_nonintra(levels, qscale, self.wq_ni)

    def decode_block_intra(self, r, qscale, dc_pred, is_luma):
        return _decode_block(
            r, qscale, dc_pred,
            _DC_LUMA_INV if is_luma else _DC_CHROMA_INV, self.wq,
        )

    def decode_block_nonintra(self, r, qscale):
        return _decode_block_nonintra(r, qscale, self.wq_ni)


def _read_quant_matrix(r: _BitReader, intra: bool) -> np.ndarray:
    """64 stream-carried 8-bit values in ZIGZAG download order
    (§2.4.2.3) -> zigzag-order int64 array. Zero entries are
    forbidden; the intra matrix's first value shall be 8."""
    vals = [r.read(8) for _ in range(64)]
    if any(v == 0 for v in vals):
        raise ValueError("MPEG quantizer matrix entry of zero")
    if intra and vals[0] != 8:
        raise ValueError("MPEG intra quantizer matrix must start at 8")
    return np.asarray(vals, dtype=np.int64)


# ---------------------------------------------------------------------------
# motion vectors (§2.4.4.3) and motion compensation (§2.4.4.2)
# ---------------------------------------------------------------------------


def _write_motion(w: _BitWriter, delta: int, f_code: int) -> None:
    """delta in coded units, already wrapped into [-16f, 16f-1]."""
    if delta == 0:
        w.write_code(_MOTION_MAG[0])
        return
    f = 1 << (f_code - 1)
    mag = abs(delta)
    code_m = (mag + f - 1) // f
    if code_m > 16:
        raise ValueError("MPEG-1 motion delta beyond Table B.4")
    w.write_code(_MOTION_MAG[code_m])
    w.write(1 if delta < 0 else 0, 1)
    if f_code > 1:
        w.write(mag - (code_m - 1) * f - 1, f_code - 1)


def _read_motion(r: _BitReader, f_code: int) -> int:
    """-> signed delta ("little" value) in coded units."""
    mag_code = r.read_vlc(_MOTION_MAG_INV, "motion code", 10)
    if mag_code == 0:
        return 0
    sign = r.read(1)
    mag = mag_code
    if f_code > 1:
        residual = r.read(f_code - 1)
        mag = ((mag - 1) << (f_code - 1)) + residual + 1
    return -mag if sign else mag


def _wrap_vector(v: int, f: int) -> int:
    """Fold into the representable range [-16f, 16f-1] (the spec's
    right_little/right_big selection)."""
    if v < -16 * f:
        v += 32 * f
    elif v > 16 * f - 1:
        v -= 32 * f
    return v


def _trunc_half(v: int) -> int:
    return v // 2 if v >= 0 else -((-v) // 2)


def _mc_rect(
    ref: np.ndarray, oy: int, ox: int, h: int, w: int,
    hvy: int, hvx: int,
) -> np.ndarray:
    """h×w forward prediction from ``ref`` (int64 plane, possibly a
    stride-2 FIELD view) at origin (oy, ox) displaced by (hvy, hvx)
    HALF-pel units; half-pel positions average with round-half-away
    (operands non-negative)."""
    iy, hy = hvy >> 1, hvy & 1
    ix, hx = hvx >> 1, hvx & 1
    y0, x0 = oy + iy, ox + ix
    hgt, wid = ref.shape
    if y0 < 0 or x0 < 0 or y0 + h + hy > hgt or x0 + w + hx > wid:
        raise ValueError("MPEG-1 motion vector outside the reference frame")
    a = ref[y0 : y0 + h, x0 : x0 + w]
    if not hy and not hx:
        return a.copy()
    if hy and not hx:
        return (a + ref[y0 + 1 : y0 + 1 + h, x0 : x0 + w] + 1) >> 1
    if hx and not hy:
        return (a + ref[y0 : y0 + h, x0 + 1 : x0 + 1 + w] + 1) >> 1
    return (
        a
        + ref[y0 + 1 : y0 + 1 + h, x0 : x0 + w]
        + ref[y0 : y0 + h, x0 + 1 : x0 + 1 + w]
        + ref[y0 + 1 : y0 + 1 + h, x0 + 1 : x0 + 1 + w]
        + 2
    ) >> 2


def _mc_block(
    ref: np.ndarray, oy: int, ox: int, size: int, hvy: int, hvx: int
) -> np.ndarray:
    """size×size square wrapper over _mc_rect (the MPEG-1 paths)."""
    return _mc_rect(ref, oy, ox, size, size, hvy, hvx)


def _mc_displacements(
    vx: int, vy: int, full_pel: int
) -> tuple[int, int, int, int]:
    """Coded vector -> (luma_hvy, luma_hvx, chroma_hvy, chroma_hvx) in
    half-pel units. §2.4.4.2: full_pel doubles the RECONSTRUCTED
    vector first; chroma then halves the luma displacement truncating
    toward zero (§2.4.4.3) — so full_pel with an odd coded vector
    yields an even luma displacement whose chroma half is exact."""
    unit = 2 if full_pel else 1
    lvy, lvx = vy * unit, vx * unit
    return lvy, lvx, _trunc_half(lvy), _trunc_half(lvx)


def _write_increment(w: _BitWriter, inc: int) -> None:
    if inc < 1:
        raise ValueError("macroblock_address_increment must be >= 1")
    while inc > 33:
        w.write_code(_ADDR_ESCAPE)
        inc -= 33
    w.write_code(_ADDR_INC[inc])


_ADDR_STUFF_SYM = object()
_ADDR_ESC_SYM = object()
_ADDR_LUT, _ADDR_MAXLEN = _vlc_lut(
    dict(_ADDR_INC_INV)
    | {_ADDR_STUFFING: _ADDR_STUFF_SYM, _ADDR_ESCAPE: _ADDR_ESC_SYM}
)


def _read_increment(r: _BitReader) -> int:
    inc = 0
    while True:
        entry = _ADDR_LUT[r.peek(_ADDR_MAXLEN)]
        if entry is None or r.pos + entry[1] > r._total:
            break  # malformed/truncated: per-bit loop for diagnostics
        sym, ln = entry
        r.read(ln)
        if sym is _ADDR_STUFF_SYM:
            continue
        if sym is _ADDR_ESC_SYM:
            inc += 33
            continue
        return inc + sym
    code = ""
    while len(code) <= 11:
        code += "1" if r.read(1) else "0"
        if code == _ADDR_STUFFING:
            code = ""
            continue
        if code == _ADDR_ESCAPE:
            inc += 33
            code = ""
            continue
        if code in _ADDR_INC_INV:
            return inc + _ADDR_INC_INV[code]
    raise ValueError(f"bad MPEG-1 macroblock_address_increment {code!r}")


# ---------------------------------------------------------------------------
# witness encoder
# ---------------------------------------------------------------------------


def _encode_intra_mb(
    w: _BitWriter,
    planes: tuple[np.ndarray, np.ndarray, np.ndarray],
    rec: tuple[np.ndarray, np.ndarray, np.ndarray],
    mbr: int, mbc: int, qscale: int, preds: list[int],
    hooks: _QuantHooks = None, dct_type: int = 0,
) -> None:
    """Encode one intra macroblock from float planes and mirror the
    decoder's reconstruction into the int64 ``rec`` planes.
    ``dct_type`` selects the luma block layout (field DCT — MPEG-2
    only; the caller writes the mode bits)."""
    hooks = hooks or _M1_HOOKS
    y, cb, cr = planes
    for blk in range(6):
        if blk < 4:
            block = hooks.luma_view(y, mbr * 16, mbc * 16, blk, dct_type)
            dst = hooks.luma_view(
                rec[0], mbr * 16, mbc * 16, blk, dct_type
            )
            ti = 0
        else:
            plane = cb if blk == 4 else cr
            by, bx = mbr * 8, mbc * 8
            block = plane[by : by + 8, bx : bx + 8]
            dst, ti = rec[blk - 3][by : by + 8, bx : bx + 8], blk - 3
        coeff = _C @ block @ _C.T
        levels = hooks.quant_intra(coeff, qscale, preds[ti])
        hooks.write_intra_levels(w, levels, preds[ti], blk < 4)
        preds[ti] = int(levels[0])
        dst[:, :] = np.clip(
            np.rint(hooks.dequant_intra(levels, qscale)), 0, 255
        ).astype(np.int64)


def _search_motion(
    cur: np.ndarray, ref: np.ndarray, oy: int, ox: int,
    search: int, full_pel: int,
) -> tuple[int, int]:
    """Exhaustive half-pel (or full-pel) SAD search -> coded (vy, vx).
    Candidates whose prediction window leaves the frame are skipped;
    (0, 0) is always valid."""
    step = 2 if full_pel else 1
    # align the candidate range to multiples of `step` so every
    # evaluated displacement is representable as a coded vector —
    # an odd `search` with full_pel would otherwise iterate half-pel
    # candidates and floor-divide them into a DIFFERENT prediction
    lim = (search // step) * step
    best, best_sad = (0, 0), None
    for hvy in range(-lim, lim + 1, step):
        for hvx in range(-lim, lim + 1, step):
            try:
                pred = _mc_block(ref, oy, ox, 16, hvy, hvx)
            except ValueError:
                continue
            sad = int(np.abs(cur - pred).sum())
            if best_sad is None or sad < best_sad or (
                sad == best_sad and (abs(hvy) + abs(hvx))
                < (abs(best[0]) + abs(best[1]))
            ):
                best, best_sad = (hvy, hvx), sad
    return best[0] // step, best[1] // step  # -> coded units


def _encode_p_slice(
    w: _BitWriter,
    planes: tuple[np.ndarray, np.ndarray, np.ndarray],
    rec: tuple[np.ndarray, np.ndarray, np.ndarray],
    ref: tuple[np.ndarray, np.ndarray, np.ndarray],
    row: int, mbw: int, qscale: int,
    f_code: int, full_pel: int, search: int,
    hooks: _QuantHooks = None,
) -> None:
    hooks = hooks or _M1_HOOKS
    y, cb, cr = planes
    f = 1 << (f_code - 1)
    mv_pred = [0, 0]  # (vx, vy) coded units
    pending = 0
    for col in range(mbw):
        cur = y[row * 16 : row * 16 + 16, col * 16 : col * 16 + 16]
        vy, vx = _search_motion(cur, ref[0], row * 16, col * 16,
                                search, full_pel)
        lhy, lhx, chy, chx = _mc_displacements(vx, vy, full_pel)
        pred_y = _mc_block(ref[0], row * 16, col * 16, 16, lhy, lhx)
        pred_cb = _mc_block(ref[1], row * 8, col * 8, 8, chy, chx)
        pred_cr = _mc_block(ref[2], row * 8, col * 8, 8, chy, chx)
        dct = hooks.pick_dct_type(cur - pred_y)
        levels, cbp = [], 0
        for blk in range(6):
            if blk < 4:
                block = hooks.luma_view(cur, 0, 0, blk, dct)
                pred = hooks.luma_view(pred_y, 0, 0, blk, dct)
            else:
                plane = cb if blk == 4 else cr
                block = plane[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8]
                pred = pred_cb if blk == 4 else pred_cr
            lv = hooks.quant_nonintra(_C @ (block - pred) @ _C.T, qscale)
            if lv.any():
                # code the residual only when reconstruction strictly
                # improves the block — ties prefer skip, which both
                # saves bits and makes static scenes converge to
                # all-skip instead of ±1 rounding limit cycles
                cand = np.clip(
                    pred + np.rint(
                        hooks.dequant_nonintra(lv, qscale)
                    ).astype(np.int64),
                    0, 255,
                )
                if ((cand - block) ** 2).sum() < ((pred - block) ** 2).sum():
                    cbp |= 1 << (5 - blk)
                else:
                    lv = np.zeros(64, dtype=np.int64)
            levels.append(lv)
        if (
            cbp == 0 and vx == 0 and vy == 0
            and 0 < col < mbw - 1
        ):
            # skipped macroblock: decoder keeps the co-located pels
            rec[0][row * 16 : row * 16 + 16,
                   col * 16 : col * 16 + 16] = pred_y
            rec[1][row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = pred_cb
            rec[2][row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = pred_cr
            mv_pred = [0, 0]
            pending += 1
            continue
        _write_increment(w, pending + 1)
        pending = 0
        w.write_code("1" if cbp else "001")  # pred-mc(+cbp), Table B.2b
        hooks.write_mb_modes(w, True, False, bool(cbp), False, dct)
        _write_motion(w, _wrap_vector(vx - mv_pred[0], f), f_code)
        _write_motion(w, _wrap_vector(vy - mv_pred[1], f), f_code)
        mv_pred = [vx, vy]
        if cbp:
            w.write_code(_CBP_CODES[cbp])
        for blk in range(6):
            if blk < 4:
                pred = hooks.luma_view(pred_y, 0, 0, blk, dct)
                dst = hooks.luma_view(
                    rec[0], row * 16, col * 16, blk, dct
                )
            else:
                by, bx = row * 8, col * 8
                pred = pred_cb if blk == 4 else pred_cr
                dst = rec[blk - 3][by : by + 8, bx : bx + 8]
            if cbp & (1 << (5 - blk)):
                hooks.write_nonintra_levels(w, levels[blk])
                dst[:, :] = np.clip(
                    pred + np.rint(
                        hooks.dequant_nonintra(levels[blk], qscale)
                    ).astype(np.int64),
                    0, 255,
                )
            else:
                dst[:, :] = pred


def _encode_b_slice(
    w: _BitWriter,
    planes: tuple[np.ndarray, np.ndarray, np.ndarray],
    fwd: tuple[np.ndarray, np.ndarray, np.ndarray],
    bwd: tuple[np.ndarray, np.ndarray, np.ndarray],
    row: int, mbw: int, qscale: int,
    f_code: int, search: int,
    hooks: _QuantHooks = None,
) -> None:
    """One B-picture slice: per macroblock, pick the best of forward /
    backward / interpolated prediction by luma SAD, code only
    residual blocks that strictly improve, and elect skip when the
    previous macroblock's prediction repeats exactly (B skip repeats
    mode AND vectors, §2.4.4.4). B pictures are not references, so no
    reconstruction is kept."""
    hooks = hooks or _M1_HOOKS
    y, cb, cr = planes
    f = 1 << (f_code - 1)
    pred_f = [0, 0]
    pred_b = [0, 0]
    last_spec: tuple | None = None
    pending = 0
    for col in range(mbw):
        cur = y[row * 16 : row * 16 + 16, col * 16 : col * 16 + 16]
        vfy, vfx = _search_motion(cur, fwd[0], row * 16, col * 16,
                                  search, 0)
        vby, vbx = _search_motion(cur, bwd[0], row * 16, col * 16,
                                  search, 0)
        cands = {
            (True, False): _inter_pred(fwd, bwd, row, col, True,
                                       (vfx, vfy), False, (0, 0), 0, 0),
            (False, True): _inter_pred(fwd, bwd, row, col, False,
                                       (0, 0), True, (vbx, vby), 0, 0),
            (True, True): _inter_pred(fwd, bwd, row, col, True,
                                      (vfx, vfy), True, (vbx, vby), 0, 0),
        }
        use_f, use_b = min(
            cands,
            key=lambda k: (int(np.abs(cur - cands[k][0]).sum()),
                           k != (True, True)),
        )
        pred_y, pred_cb, pred_cr = cands[(use_f, use_b)]
        dct = hooks.pick_dct_type(cur - pred_y)
        levels, cbp = [], 0
        for blk in range(6):
            if blk < 4:
                block = hooks.luma_view(cur, 0, 0, blk, dct)
                pred = hooks.luma_view(pred_y, 0, 0, blk, dct)
            else:
                plane = cb if blk == 4 else cr
                block = plane[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8]
                pred = pred_cb if blk == 4 else pred_cr
            lv = hooks.quant_nonintra(_C @ (block - pred) @ _C.T, qscale)
            if lv.any():
                cand = np.clip(
                    pred + np.rint(
                        hooks.dequant_nonintra(lv, qscale)
                    ).astype(np.int64),
                    0, 255,
                )
                if ((cand - block) ** 2).sum() < ((pred - block) ** 2).sum():
                    cbp |= 1 << (5 - blk)
                else:
                    lv = np.zeros(64, dtype=np.int64)
            levels.append(lv)
        spec = (use_f, (vfx, vfy) if use_f else None,
                use_b, (vbx, vby) if use_b else None)
        if (
            cbp == 0 and spec == last_spec and 0 < col < mbw - 1
            and (not use_f or [vfx, vfy] == pred_f)
            and (not use_b or [vbx, vby] == pred_b)
        ):
            pending += 1
            continue
        _write_increment(w, pending + 1)
        pending = 0
        w.write_code({
            (True, True, False): "10", (True, True, True): "11",
            (False, True, False): "010", (False, True, True): "011",
            (True, False, False): "0010", (True, False, True): "0011",
        }[(use_f, use_b, bool(cbp))])
        hooks.write_mb_modes(w, use_f, use_b, bool(cbp), False, dct)
        if use_f:
            _write_motion(w, _wrap_vector(vfx - pred_f[0], f), f_code)
            _write_motion(w, _wrap_vector(vfy - pred_f[1], f), f_code)
            pred_f = [vfx, vfy]
        if use_b:
            _write_motion(w, _wrap_vector(vbx - pred_b[0], f), f_code)
            _write_motion(w, _wrap_vector(vby - pred_b[1], f), f_code)
            pred_b = [vbx, vby]
        if cbp:
            w.write_code(_CBP_CODES[cbp])
            for blk in range(6):
                if cbp & (1 << (5 - blk)):
                    hooks.write_nonintra_levels(w, levels[blk])
        last_spec = spec


def encode_m1v(
    frames: list[np.ndarray], fps_code: int = 5, qscale: int = 4,
    p_frames: bool = False, f_code: int = 1, full_pel: bool = False,
    search: int = 4, b_frames: int = 0, d_pictures: bool = False,
    intra_matrix: np.ndarray = None, non_intra_matrix: np.ndarray = None,
) -> bytes:
    """Witness MPEG-1 elementary stream. Frames are (h, w, 3) RGB
    uint8 with h, w multiples of 16. With ``p_frames`` the first
    picture is intra and the rest are forward-predicted (exhaustive
    ±``search`` half-pel motion search against the encoder-side
    reconstruction, skip election for static macroblocks); otherwise
    every frame is an I-picture, one slice per macroblock row. With
    ``b_frames`` = k > 0 (requires ``p_frames``), anchors land every
    k+1 display frames (plus the final frame) and the frames between
    them are coded as B pictures — transmitted AFTER their future
    anchor in the spec's decode order, each macroblock choosing
    forward / backward / interpolated prediction by SAD. With
    ``d_pictures`` EVERY frame is a DC-only D picture (the spec's
    fast-forward preview type — sequences carry either D pictures or
    I/P/B, never both)."""
    if not frames:
        raise ValueError("MPEG-1 stream needs at least one frame")
    h, w_px, _ = frames[0].shape
    if h % 16 or w_px % 16:
        raise ValueError("MPEG-1 witness frames must be multiples of 16")
    if not 1 <= qscale <= 31:
        raise ValueError("quantizer_scale must be 1..31")
    if fps_code not in _PICTURE_RATES:
        raise ValueError(f"bad picture_rate code {fps_code}")
    if not 1 <= f_code <= 7:
        raise ValueError("forward_f_code must be 1..7")
    w = _BitWriter()
    w.start_code(0xB3)  # sequence header
    w.write(w_px, 12)
    w.write(h, 12)
    w.write(1, 4)   # pel aspect 1:1
    w.write(fps_code, 4)
    w.write(0x3FFFF, 18)  # bit_rate: variable
    w.write(1, 1)   # marker
    w.write(0, 10)  # vbv_buffer_size
    w.write(0, 1)   # constrained flag
    wq = wq_ni = None
    for flag, mat, intra in (
        (intra_matrix is not None, intra_matrix, True),
        (non_intra_matrix is not None, non_intra_matrix, False),
    ):
        w.write(1 if flag else 0, 1)
        if flag:
            zz = np.asarray(mat, dtype=np.int64).reshape(64)[ZIGZAG]
            if (zz <= 0).any() or (zz > 255).any():
                raise ValueError("quantizer matrix entries must be 1..255")
            if intra and zz[0] != 8:
                raise ValueError("intra quantizer matrix must start at 8")
            for v in zz:
                w.write(int(v), 8)
            if intra:
                wq = zz
            else:
                wq_ni = zz
    hooks = (
        _M1_HOOKS
        if wq is None and wq_ni is None
        else _MatrixHooks(
            _WQ_ZZ if wq is None else wq,
            _WQ_NI_FLAT if wq_ni is None else wq_ni,
        )
    )
    w.start_code(0xB8)  # GOP
    w.write(0, 25)  # time code
    w.write(1, 1)   # closed gop
    w.write(0, 1)   # broken link
    mbw, mbh = w_px // 16, h // 16
    for fr in frames:
        if fr.shape != frames[0].shape:
            raise ValueError("MPEG-1 frames must share one geometry")
    if b_frames and not p_frames:
        raise ValueError("b_frames requires p_frames")
    if b_frames and full_pel:
        raise ValueError("the witness codes B pictures half-pel only")
    if d_pictures and (p_frames or b_frames):
        raise ValueError("a sequence carries either D pictures or I/P/B")
    n = len(frames)

    def planes_of(t: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ycc = _rgb_to_ycbcr(frames[t]).astype(np.float64)
        return (ycc[:, :, 0], ycc[0::2, 0::2, 1], ycc[0::2, 0::2, 2])

    # decode-order schedule: anchors every b_frames+1 display frames
    # (plus the final frame), each followed by the B pictures that
    # display between it and the previous anchor
    if d_pictures:
        schedule: list[tuple[int, int]] = [(t, 4) for t in range(n)]
    elif p_frames:
        anchors = list(range(0, n, b_frames + 1))
        if anchors[-1] != n - 1:
            anchors.append(n - 1)
        schedule = [(anchors[0], 1)]
        for k in range(1, len(anchors)):
            schedule.append((anchors[k], 2))
            schedule.extend(
                (d, 3) for d in range(anchors[k - 1] + 1, anchors[k])
            )
    else:
        schedule = [(t, 1) for t in range(n)]

    ref: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
    prev_anchor: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
    for t, ptype in schedule:
        planes = planes_of(t)
        rec = (
            np.zeros((h, w_px), dtype=np.int64),
            np.zeros((h // 2, w_px // 2), dtype=np.int64),
            np.zeros((h // 2, w_px // 2), dtype=np.int64),
        )
        w.start_code(0x00)  # picture
        w.write(t & 0x3FF, 10)
        w.write(ptype, 3)
        w.write(0xFFFF, 16)  # vbv_delay
        if ptype in (2, 3):
            w.write(1 if full_pel else 0, 1)
            w.write(f_code, 3)
        if ptype == 3:
            w.write(0, 1)  # full_pel_backward_vector
            w.write(f_code, 3)
        w.write(0, 1)       # extra_bit_picture
        for row in range(mbh):
            w.start_code(0x01 + row)  # slice per MB row
            w.write(qscale, 5)
            w.write(0, 1)   # extra_bit_slice
            if ptype == 4:
                preds = [128, 128, 128]
                yp, cbp_, crp = planes
                for col in range(mbw):
                    w.write_code("1")   # mb_address_increment = 1
                    w.write_code("1")   # mb_type (Table B.2d: intra)
                    for blk in range(6):
                        if blk < 4:
                            by = row * 16 + (blk // 2) * 8
                            bx = col * 16 + (blk % 2) * 8
                            block, ti = yp[by : by + 8, bx : bx + 8], 0
                        else:
                            plane = cbp_ if blk == 4 else crp
                            block = plane[row * 8 : row * 8 + 8,
                                          col * 8 : col * 8 + 8]
                            ti = blk - 3
                        qdc = int(np.rint(float(block.mean())))
                        qdc = max(-255 + preds[ti],
                                  min(255 + preds[ti], qdc))
                        size, offset = _dc_diff_bits(qdc - preds[ti])
                        w.write_code(
                            (_DC_LUMA if blk < 4 else _DC_CHROMA)[size]
                        )
                        if size:
                            w.write(offset, size)
                        preds[ti] = qdc
                    w.write(1, 1)  # end_of_macroblock
            elif ptype == 3:
                _encode_b_slice(
                    w, planes, prev_anchor, ref, row, mbw, qscale,
                    f_code, search, hooks=hooks,
                )
            elif ptype == 2:
                _encode_p_slice(
                    w, planes, rec, ref, row, mbw, qscale,
                    f_code, 1 if full_pel else 0, search, hooks=hooks,
                )
            else:
                preds = [128, 128, 128]
                for col in range(mbw):
                    w.write_code("1")   # mb_address_increment = 1
                    w.write_code("1")   # mb_type: intra (Table B.2a)
                    _encode_intra_mb(
                        w, planes, rec, row, col, qscale, preds,
                        hooks=hooks,
                    )
        if ptype != 3:  # B pictures are not references
            prev_anchor, ref = ref, rec
    w.start_code(0xB7)  # sequence end
    return w.bytes()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _next_start_code(b: bytes, pos: int) -> tuple[int, int]:
    """-> (code_byte, offset just past the 4-byte start code)."""
    i = b.find(b"\x00\x00\x01", pos)
    if i < 0 or i + 3 >= len(b):
        raise ValueError("MPEG-1 start code expected")
    return b[i + 3], i + 4


def _field_pred(
    ref: tuple[np.ndarray, np.ndarray, np.ndarray],
    mbr: int, mbc: int,
    specs: tuple[tuple[int, int, int], tuple[int, int, int]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """§7.6.4 field prediction in a FRAME picture: the first
    (sel, vx, vy) predicts the macroblock's TOP-field rows, the second
    its BOTTOM-field rows, each from the selected field (sel 0 = top,
    1 = bottom) of the reference FRAME. Vertical vectors are in FIELD
    coordinates (half-pel within the field grid); chroma divides both
    components by two truncating toward zero."""
    pred_y = np.empty((16, 16), dtype=np.int64)
    pred_cb = np.empty((8, 8), dtype=np.int64)
    pred_cr = np.empty((8, 8), dtype=np.int64)
    for r, (sel, vx, vy) in enumerate(specs):
        cvy, cvx = _trunc_half(vy), _trunc_half(vx)
        pred_y[r::2] = _mc_rect(
            ref[0][sel::2], mbr * 8, mbc * 16, 8, 16, vy, vx
        )
        pred_cb[r::2] = _mc_rect(
            ref[1][sel::2], mbr * 4, mbc * 8, 4, 8, cvy, cvx
        )
        pred_cr[r::2] = _mc_rect(
            ref[2][sel::2], mbr * 4, mbc * 8, 4, 8, cvy, cvx
        )
    return pred_y, pred_cb, pred_cr


def _inter_pred(
    fwd: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    bwd: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    mbr: int, mbc: int,
    use_f: bool, vf: tuple[int, int],
    use_b: bool, vb: tuple[int, int],
    fp_f: int, fp_b: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Forward / backward / interpolated macroblock prediction ->
    (pred_y 16×16, pred_cb 8×8, pred_cr 8×8). Interpolation averages
    the two predictions with the spec's round-half-away '//' (§2.4.4.4;
    operands are non-negative pels). A vector spec may be a frame
    vector (vx, vy) or an MPEG-2 FIELD spec
    ("field", ((sel, vx, vy), (sel, vx, vy))) — §7.6.4's field
    prediction in frame pictures, assembled by row interleave."""
    parts = []
    for use, ref, spec, fp in (
        (use_f, fwd, vf, fp_f), (use_b, bwd, vb, fp_b),
    ):
        if not use:
            continue
        if spec and spec[0] == "field":
            parts.append(_field_pred(ref, mbr, mbc, spec[1]))
            continue
        vx, vy = spec
        lhy, lhx, chy, chx = _mc_displacements(vx, vy, fp)
        parts.append((
            _mc_block(ref[0], mbr * 16, mbc * 16, 16, lhy, lhx),
            _mc_block(ref[1], mbr * 8, mbc * 8, 8, chy, chx),
            _mc_block(ref[2], mbr * 8, mbc * 8, 8, chy, chx),
        ))
    if len(parts) == 1:
        return parts[0]
    return tuple(
        (a + b + 1) >> 1 for a, b in zip(parts[0], parts[1])
    )


def _write_inter_mb(
    planes: tuple[np.ndarray, np.ndarray, np.ndarray],
    pred: tuple[np.ndarray, np.ndarray, np.ndarray],
    mbr: int, mbc: int, cbp: int, qscale: int,
    sr: _BitReader | None,
    hooks: "_QuantHooks" = None,
    dct_type: int = 0,
) -> None:
    """Write prediction + decoded residuals (for set cbp bits) into
    the picture planes. ``dct_type`` selects the luma block layout
    (frame/field DCT — MPEG-2 only; chroma is always frame)."""
    hooks = hooks or _M1_HOOKS
    y, cb, cr = planes
    pred_y, pred_cb, pred_cr = pred
    for blk in range(6):
        if blk < 4:
            p = hooks.luma_view(pred_y, 0, 0, blk, dct_type)
            dst = hooks.luma_view(y, mbr * 16, mbc * 16, blk, dct_type)
        else:
            p = pred_cb if blk == 4 else pred_cr
            out = cb if blk == 4 else cr
            dst = out[mbr * 8 : mbr * 8 + 8, mbc * 8 : mbc * 8 + 8]
        if cbp & (1 << (5 - blk)):
            resid = hooks.decode_block_nonintra(sr, qscale)
            dst[:, :] = np.clip(
                p + np.rint(resid).astype(np.int64), 0, 255
            )
        else:
            dst[:, :] = p


def _decode_slice(
    sdata: bytes, row0: int,
    planes: tuple[np.ndarray, np.ndarray, np.ndarray],
    fwd_ref: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    bwd_ref: tuple[np.ndarray, np.ndarray, np.ndarray] | None,
    mbw: int, mbh: int, ptype: int,
    f_f: int, fp_f: int, f_b: int, fp_b: int,
    hooks: "_QuantHooks" = None,
) -> None:
    """Decode one slice's macroblocks into the int64 ``planes``.
    ``sdata`` is the slice payload up to (excluding) the next start
    code; macroblocks may span rows (addresses are absolute). For P
    pictures ``fwd_ref`` is the reference (the planes start as its
    copy, so skipped macroblocks are already co-located pels); for B
    pictures both anchors are live and skipped macroblocks repeat the
    previous macroblock's prediction (§2.4.4.4)."""
    hooks = hooks or _M1_HOOKS
    y, cb, cr = planes
    sr = _BitReader(sdata)
    code = sr.read(5)
    if not code:
        raise ValueError("MPEG-1 quantizer_scale of zero")
    qscale = hooks.map_qscale(code)
    while sr.read(1):  # extra_information_slice
        sr.read(8)
    addr = row0 * mbw - 1
    pred_f = [0, 0, 0, 0]  # PMV[r][s=fwd][t] flattened (§7.6.3)
    pred_b = [0, 0, 0, 0]
    dc_reset = hooks.dc_reset
    dc_preds = [dc_reset] * 3
    # B-picture skip state: the previous macroblock's prediction spec
    last_inter: tuple | None = None
    if ptype == 4:
        # D picture (§2.4.4.1): DC-only intra macroblocks, one-bit
        # macroblock_type '1', an end_of_macroblock marker, no AC
        while not sr.rest_is_zero():
            if _read_increment(sr) != 1:
                raise ValueError(
                    "MPEG-1 skipped macroblock in a D picture"
                )
            addr += 1
            mbr, mbc = divmod(addr, mbw)
            if mbr >= mbh:
                raise ValueError("MPEG-1 macroblock address beyond frame")
            if not sr.read(1):  # Table B.2d: the only type is intra
                raise ValueError("MPEG-1 D macroblock type")
            for blk in range(6):
                ti = 0 if blk < 4 else blk - 3
                size = sr.read_dc_size(
                    _DC_LUMA_INV if blk < 4 else _DC_CHROMA_INV
                )
                if size:
                    offset = sr.read(size)
                    diff = offset if offset >= (1 << (size - 1)) else (
                        offset - (1 << size) + 1
                    )
                else:
                    diff = 0
                qdc = dc_preds[ti] + diff
                dc_preds[ti] = qdc
                px = max(0, min(255, qdc))  # flat block at the DC mean
                if blk < 4:
                    by = mbr * 16 + (blk // 2) * 8
                    bx = mbc * 16 + (blk % 2) * 8
                    y[by : by + 8, bx : bx + 8] = px
                else:
                    out = cb if blk == 4 else cr
                    out[mbr * 8 : mbr * 8 + 8,
                        mbc * 8 : mbc * 8 + 8] = px
            if not sr.read(1):
                raise ValueError("MPEG-1 end_of_macroblock must be 1")
        return
    mb_type_inv = {1: _I_MB_TYPE, 2: _P_MB_TYPE, 3: _B_MB_TYPE}[ptype]
    while not sr.rest_is_zero():
        inc = _read_increment(sr)
        if ptype == 1 and inc != 1:
            raise ValueError("MPEG-1 skipped macroblock in an I picture")
        if inc > 1:
            dc_preds = [dc_reset] * 3
            if ptype == 2:
                # P skip: co-located pels (already in the planes copy);
                # both predictors reset
                pred_f = [0, 0, 0, 0]
            else:
                # B skip: repeat the previous macroblock's prediction
                # mode and vectors; predictors unchanged
                if last_inter is None:
                    raise ValueError(
                        "MPEG-1 B slice skips before any inter macroblock"
                    )
                use_f, vf, use_b, vb = last_inter
                # H.262 §7.6.6: a skipped macroblock in a B FRAME
                # picture predicts frame-based from PMV[0] even when
                # the previous macroblock used field prediction (the
                # PMVs hold the doubled, frame-coordinate verticals).
                # Replaying the field spec verbatim would re-apply
                # motion_vertical_field_select — silently wrong pixels
                # on conforming third-party fpfd=0 streams.
                if vf and vf[0] == "field":
                    vf = (pred_f[0], pred_f[1])
                if vb and vb[0] == "field":
                    vb = (pred_b[0], pred_b[1])
                for k in range(1, inc):
                    a2 = addr + k
                    mbr2, mbc2 = divmod(a2, mbw)
                    if mbr2 >= mbh:
                        raise ValueError(
                            "MPEG-1 macroblock address beyond frame"
                        )
                    _write_inter_mb(
                        planes,
                        _inter_pred(fwd_ref, bwd_ref, mbr2, mbc2,
                                    use_f, vf, use_b, vb, fp_f, fp_b),
                        mbr2, mbc2, 0, qscale, None, hooks,
                    )
        addr += inc
        mbr, mbc = divmod(addr, mbw)
        if mbr >= mbh:
            raise ValueError("MPEG-1 macroblock address beyond frame")
        quant, mf, mb, coded, intra = sr.read_vlc(
            mb_type_inv, "macroblock_type", 6
        )
        fmt, dct_type = hooks.read_mb_modes(sr, mf, mb, coded, intra)
        if quant:
            code = sr.read(5)
            if not code:
                raise ValueError("MPEG-1 quantizer_scale of zero")
            qscale = hooks.map_qscale(code)
        if mf:
            vf, pred_f = hooks.read_mv(sr, pred_f, f_f, fmt)
        elif ptype == 2 and not intra:
            # P macroblock without forward MC: zero vector AND reset
            vf = (0, 0)
            pred_f = [0, 0, 0, 0]
        else:
            vf = (0, 0)  # unused in B without mf (predictors persist)
        if mb:
            vb, pred_b = hooks.read_mv(sr, pred_b, f_b, fmt)
        else:
            vb = (0, 0)
        if intra:
            pred_f = [0, 0, 0, 0]
            pred_b = [0, 0, 0, 0]
            last_inter = None  # a B skip may not follow an intra MB
            for blk in range(6):
                ti = 0 if blk < 4 else blk - 3
                spatial, dc_preds[ti] = hooks.decode_block_intra(
                    sr, qscale, dc_preds[ti], blk < 4
                )
                px = np.clip(np.rint(spatial), 0, 255).astype(np.int64)
                if blk < 4:
                    hooks.luma_view(
                        y, mbr * 16, mbc * 16, blk, dct_type
                    )[:, :] = px
                else:
                    out = cb if blk == 4 else cr
                    out[mbr * 8 : mbr * 8 + 8,
                        mbc * 8 : mbc * 8 + 8] = px
            continue
        # non-intra macroblock: prediction + residual
        dc_preds = [dc_reset] * 3
        use_f = bool(mf) or ptype == 2  # P always predicts forward
        use_b = bool(mb)
        pred = _inter_pred(fwd_ref, bwd_ref, mbr, mbc,
                           use_f, vf, use_b, vb, fp_f, fp_b)
        cbp = 0
        if coded:
            cbp = sr.read_vlc(_CBP_INV, "coded_block_pattern", 9)
        _write_inter_mb(planes, pred, mbr, mbc, cbp, qscale, sr, hooks,
                        dct_type)
        last_inter = (use_f, vf, use_b, vb)


def decode_m1v(b: bytes) -> tuple[dict, list[np.ndarray]]:
    """Elementary-stream decode -> ({width, height, fps, n_frames,
    n_i, n_p, n_b, n_d}, [RGB frames in DISPLAY order]). Every spec
    picture type decodes (I/P/B with the one-anchor reorder buffer,
    DC-only D); reserved picture_coding_type values raise
    ValueError; stream-loaded custom quantizer matrices apply
    (r12)."""
    code, pos = _next_start_code(bytes(b), 0)
    if code != 0xB3:
        raise ValueError("not an MPEG-1 video stream (no sequence header)")
    r = _BitReader(b[pos:])
    w_px = r.read(12)
    h = r.read(12)
    _aspect = r.read(4)
    rate_code = r.read(4)
    if rate_code not in _PICTURE_RATES:
        raise ValueError(f"reserved MPEG-1 picture rate {rate_code}")
    _bitrate = r.read(18)
    if not r.read(1):
        raise ValueError("MPEG-1 sequence header marker bit missing")
    _vbv = r.read(10)
    _constrained = r.read(1)
    # custom quantizer matrices arrive IN the stream (64 bytes each,
    # zigzag download order, §2.4.2.3) — loaded, not gated (r12)
    wq = _WQ_ZZ
    wq_ni = _WQ_NI_FLAT
    if r.read(1):  # load_intra_quantizer_matrix
        wq = _read_quant_matrix(r, intra=True)
    if r.read(1):  # load_non_intra_quantizer_matrix
        wq_ni = _read_quant_matrix(r, intra=False)
    hooks = (
        _M1_HOOKS
        if wq is _WQ_ZZ and wq_ni is _WQ_NI_FLAT
        else _MatrixHooks(wq, wq_ni)
    )
    if not w_px or not h:
        raise ValueError("MPEG-1 zero frame dimensions")
    mbw, mbh = -(-w_px // 16), -(-h // 16)

    def to_rgb(planes: tuple[np.ndarray, ...]) -> np.ndarray:
        yp, cbp_, crp = planes
        up_cb = np.repeat(np.repeat(cbp_, 2, axis=0), 2, axis=1)
        up_cr = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)
        ycc = np.stack(
            [yp.astype(np.float64), up_cb.astype(np.float64),
             up_cr.astype(np.float64)],
            axis=-1,
        )
        return _ycbcr_to_rgb(ycc)[:h, :w_px]

    frames: list[np.ndarray] = []
    n_i = n_p = n_b = n_d = 0
    # stream order is decode order: B pictures display BEFORE the most
    # recent anchor, so anchors are held back one step (the classic
    # reorder buffer) — fwd_anchor is the older reference, held the
    # newer one, emitted when the next anchor (or sequence end) lands
    fwd_anchor: tuple[np.ndarray, ...] | None = None
    held: tuple[np.ndarray, ...] | None = None
    pos = 0
    data = bytes(b)
    while True:
        code, nxt = _next_start_code(data, pos)
        pos = nxt
        if code == 0xB7:
            break
        if code in (0xB3, 0xB8):  # repeated sequence header / GOP
            continue
        if code in (0xB2, 0xB5):  # user_data / extension: skip payload
            continue  # _next_start_code scans past it next iteration
        if code == 0x00:  # picture
            pr = _BitReader(data[pos:])
            _tref = pr.read(10)
            ptype = pr.read(3)
            if ptype not in (1, 2, 3, 4):
                raise ValueError(
                    f"forbidden MPEG-1 picture type {ptype}"
                )
            fp_f = fp_b = 0
            f_f = f_b = 1
            if ptype in (1, 4):
                planes = (
                    np.zeros((mbh * 16, mbw * 16), dtype=np.int64),
                    np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
                    np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
                )
                fwd_ref = bwd_ref = None
            else:
                if held is None:
                    raise ValueError(
                        "MPEG-1 P picture before any I picture"
                        if ptype == 2
                        else "MPEG-1 B picture without two anchors"
                    )
                pr.read(16)  # vbv_delay
                fp_f = pr.read(1)
                f_f = pr.read(3)
                if not 1 <= f_f <= 7:
                    raise ValueError("MPEG-1 forward_f_code of zero")
                if ptype == 2:
                    planes = tuple(p.copy() for p in held)
                    fwd_ref, bwd_ref = held, None
                else:
                    if fwd_anchor is None:
                        raise ValueError(
                            "MPEG-1 B picture without two anchors"
                        )
                    fp_b = pr.read(1)
                    f_b = pr.read(3)
                    if not 1 <= f_b <= 7:
                        raise ValueError("MPEG-1 backward_f_code of zero")
                    planes = (
                        np.zeros((mbh * 16, mbw * 16), dtype=np.int64),
                        np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
                        np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
                    )
                    fwd_ref, bwd_ref = fwd_anchor, held
            # slices follow until the next non-slice start code
            saw_slice = False
            while True:
                try:
                    scode, spos = _next_start_code(data, pos)
                except ValueError:
                    raise ValueError("MPEG-1 picture without terminator")
                if scode in (0xB2, 0xB5):
                    # encoder-signature user_data / extension between
                    # picture header and first slice: skip its payload
                    pos = spos
                    continue
                if not 0x01 <= scode <= 0xAF:
                    break
                saw_slice = True
                row = scode - 1
                if row >= mbh:
                    raise ValueError("MPEG-1 slice row beyond frame")
                send = data.find(b"\x00\x00\x01", spos)
                if send < 0:
                    raise ValueError("MPEG-1 picture without terminator")
                _decode_slice(
                    data[spos:send], row, planes, fwd_ref, bwd_ref,
                    mbw, mbh, ptype, f_f, fp_f, f_b, fp_b, hooks,
                )
                pos = send
            if not saw_slice:
                raise ValueError("MPEG-1 picture without slices")
            if ptype == 3:
                n_b += 1
                frames.append(to_rgb(planes))  # B displays immediately
            else:
                if ptype == 2:
                    n_p += 1
                elif ptype == 4:
                    n_d += 1
                else:
                    n_i += 1
                if held is not None:
                    frames.append(to_rgb(held))
                fwd_anchor, held = held, planes
            continue
        raise ValueError(f"unexpected MPEG-1 start code {code:#x}")
    if held is not None:
        frames.append(to_rgb(held))
    if not frames:
        raise ValueError("MPEG-1 stream has no pictures")
    return (
        {
            "width": w_px,
            "height": h,
            "fps": _PICTURE_RATES[rate_code],
            "n_frames": len(frames),
            "n_i": n_i,
            "n_p": n_p,
            "n_b": n_b,
            "n_d": n_d,
        },
        frames,
    )


def split_m1v_frames(stream: bytes) -> list[bytes]:
    """Split an elementary stream into per-picture payloads the way
    MPEG-1-in-AVI ('MPG1'/'PIM1' fourcc) and Matroska V_MPEG1 muxers
    chunk it: payload 0 carries the sequence header + GOP up to and
    including the first picture; each later payload is one picture;
    the sequence end code rides the last payload. Concatenating the
    payloads reproduces the stream byte-for-byte (start codes are
    byte-aligned and, per ISO 11172-2's VLC design, cannot be emulated
    inside slice data)."""
    data = bytes(stream)
    code, pos = _next_start_code(data, 0)
    if code != 0xB3:
        raise ValueError("not an MPEG-1 video stream (no sequence header)")
    cuts = []
    scan = pos
    while True:
        try:
            code, nxt = _next_start_code(data, scan)
        except ValueError:
            break
        if code == 0x00:  # picture start
            cuts.append(nxt - 4)
        scan = nxt
    if not cuts:
        raise ValueError("MPEG-1 stream has no pictures")
    bounds = cuts[1:] + [len(data)]
    out = [data[: bounds[0]]]
    out.extend(
        data[start:end] for start, end in zip(cuts[1:], bounds[1:])
    )
    return out


def split_m1v_header(stream: bytes) -> tuple[bytes, list[bytes]]:
    """Matroska V_MPEG1 muxing convention: -> (codec_private,
    [picture_payloads]) where codec_private is the sequence header +
    GOP (everything before the first picture start code) and each
    payload is one picture (the last keeps the sequence end code).
    ``codec_private + b"".join(payloads)`` reproduces the stream."""
    parts = split_m1v_frames(stream)
    cut = parts[0].find(b"\x00\x00\x01\x00")
    if cut <= 0:
        raise ValueError("MPEG-1 stream has no picture after the header")
    return parts[0][:cut], [parts[0][cut:], *parts[1:]]
