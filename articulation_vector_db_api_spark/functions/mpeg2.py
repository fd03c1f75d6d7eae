"""MPEG-2 video (ISO/IEC 13818-2 / ITU-T H.262, public spec) I/P/B
frame-picture codec — witness encoder + decoder, numpy only.

Closes the r11 VERDICT item 7 ("MPEG-2 video I/P/B decode behind the
landed MPEG-1 machinery"): DVDs and broadcast archives — the next
real-corpus tier after MPEG-1 elementary streams — are MPEG-2. The
module is a small delta over functions/mpeg1.py, exactly as H.262 is
over 11172-2: the slice/macroblock bit layout, motion VLCs (Table
B-10 ≡ MPEG-1 B.4), macroblock_type tables (B-2/B-3/B-4 ≡ MPEG-1
B.2a/b/c), coded_block_pattern (B-9 ≡ B.3), address increments (B-1)
and the dct_coefficient Table B-14 (≡ the full MPEG-1 B.5c landed in
r12) are all shared imports; what is NEW here is:

- the extension layer (§6.2): sequence_extension (progressive /
  chroma_format / size+rate extensions), picture_coding_extension
  (per-direction f_codes, intra_dc_precision, picture_structure,
  frame_pred_frame_dct, q_scale_type, intra_vlc_format,
  alternate_scan, progressive_frame);
- quantiser_scale mapping (Table 7-6): linear (2·code) and the
  NON-LINEAR ladder {1..8, 10..24 step 2, 28..56 step 4, 64..112
  step 8} — both decoded, both exercised by the witness;
- intra DC precision 8..11 (§7.4.1): dc_mult = 2^(11-precision),
  predictor reset 2^(precision-1) — the extended DC-size ladders of
  Tables B-12/B-13 reach size 11; both ladders are COMPLETE prefix
  codes (Kraft sum exactly 1, pinned by test — the termination rows
  derive from completeness, not transcription);
- inverse quantisation (§7.4.2.2): F'' = ((2·QF + k)·W·qscale)/32
  with k = 0 (intra) / Sign(QF) (non-intra), saturation to
  [-2048, 2047], and §7.4.4 MISMATCH CONTROL — sum all 64 saturated
  coefficients, toggle the LSB of F[7][7] when the sum is even
  (replacing MPEG-1's per-coefficient oddification);
- the MPEG-2 escape form (§7.2.2.3): 6-bit run + 12-bit two's-
  complement level (no MPEG-1 double-byte form), level ±2047;
- no full_pel mode (removed from the spec), f_code up to 9.

frame_pred_frame_dct = 0 decodes (r12, same round) with BOTH
interlaced coding tools frame pictures carry: per-macroblock dct_type
with §6.3.17.1's FIELD-DCT luma interleave, and §7.6.4 FIELD-BASED
PREDICTION — two motion vectors per direction with
motion_vertical_field_select, verticals coded in field coordinates
under §7.6.3.1's PMV halve/double discipline (mpeg1's shared slice
loop carries both through the hook seam; the witness encoder elects
frame vs field MC per macroblock by SAD, so interlaced scenes
exercise the path end to end). Honest gates (raise, not fake): field
PICTURES (picture_structure != frame), dual-prime prediction,
alternate_scan, the alternate intra VLC
(intra_vlc_format = 1, Table B-15), chroma 4:2:2/4:4:4 (including
separate chroma matrices), concealment motion vectors, and every
scalability extension. Custom LUMA quantizer matrices load from the
sequence header AND from quant_matrix_extensions mid-stream (r12 —
the values ride in the stream, so nothing is transcribed). The witness encoder emits Main-profile-shaped
streams — I-only, IPPP, or IBB…P, fpfd 1 or 0 — over the full
q_scale_type × precision grid.

Reference behavior parity: the reference (/root/reference/main.py)
has no video path; this is engine frontier surface for video-corpus
curation alongside functions/mpeg1.py.
"""

from __future__ import annotations

import numpy as np

from .jpeg import ZIGZAG, _C, _rgb_to_ycbcr, _ycbcr_to_rgb
from .mpeg1 import (
    INTRA_QUANT,
    _AC_EOB,
    _DCT_NEXT_LUT,
    _DCT_NEXT_MAXLEN,
    _WQ_NI_FLAT,
    _WQ_NI_LIST,
    _WQ_ZZ_LIST,
    _ZIG_LIST,
    _wq_list,
    _read_quant_matrix,
    _B_MB_TYPE,
    _BitReader,
    _BitWriter,
    _CBP_CODES,
    _CBP_INV,
    _DC_CHROMA,
    _DC_LUMA,
    _I_MB_TYPE,
    _P_MB_TYPE,
    _PICTURE_RATES,
    _QuantHooks,
    _dc_diff_bits,
    _decode_slice,
    _encode_b_slice,
    _encode_intra_mb,
    _encode_p_slice,
    _next_start_code,
    _read_run_level,
    _read_run_level_tail,
    _trunc_div,
    _write_increment,
    _write_run_level,
)

__all__ = ["encode_m2v", "decode_m2v"]

# silence the "imported but unused" reading of the shared-table
# imports: the tables are re-exported so container routers and tests
# address the MPEG-2 surface without reaching into mpeg1
_ = (_I_MB_TYPE, _P_MB_TYPE, _B_MB_TYPE, _CBP_CODES, _CBP_INV,
     _write_increment, _read_run_level, ZIGZAG, INTRA_QUANT)

# ------------------------------------------------------------- tables

# Tables B-12/B-13: the MPEG-1 DC-size ladders extended to size 11.
# The three new rows per ladder are DERIVED, not transcribed: each
# continues the "previous all-ones code + one bit" ladder and the
# final row is the all-ones terminator that makes the prefix code
# COMPLETE (Kraft sum exactly 1 — tests pin this; a wrong termination
# could not sum to 1).
_DC_LUMA2 = dict(_DC_LUMA)
_DC_LUMA2.update({9: "11111110", 10: "111111110", 11: "111111111"})
_DC_CHROMA2 = dict(_DC_CHROMA)
_DC_CHROMA2.update({9: "111111110", 10: "1111111110", 11: "1111111111"})
_DC_LUMA2_INV = {v: k for k, v in _DC_LUMA2.items()}
_DC_CHROMA2_INV = {v: k for k, v in _DC_CHROMA2.items()}

# Table 7-6: quantiser_scale_code -> quantiser_scale, non-linear
# column (q_scale_type = 1); index 0 is forbidden. Linear column is
# 2·code.
_Q_NONLINEAR = (
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112,
)

_WQ_ZZ = INTRA_QUANT.reshape(64)[ZIGZAG]

# extension_start_code_identifier values (§6.3.1)
_EXT_SEQUENCE = 0x1
_EXT_SEQ_DISPLAY = 0x2
_EXT_QUANT_MATRIX = 0x3
_EXT_COPYRIGHT = 0x4
_EXT_SEQ_SCALABLE = 0x5
_EXT_PIC_CODING = 0x8
_EXT_PIC_DISPLAY = 0x7
_EXT_PIC_SPATIAL_SCALABLE = 0x9
_EXT_PIC_TEMPORAL_SCALABLE = 0xA
_EXT_CAMERA_PARAMS = 0xB
_EXT_ITU_T = 0xC
# §6.2 tolerance policy (r13 audit): every extension id a legal
# stream can carry either DECODES (sequence, quant matrix, picture
# coding), SKIPS (pure display/info metadata), or raises a NAMED
# NotImplementedError (scalability — it changes reconstruction).
# Reserved ids raise ValueError: the stream is non-conforming.
_EXT_SKIPPABLE = frozenset({
    _EXT_SEQUENCE,       # repeated sequence header's extension
    _EXT_SEQ_DISPLAY,    # chromaticity/display size — §6.3.6
    _EXT_COPYRIGHT,      # copyright identifiers — §6.3.13
    _EXT_PIC_DISPLAY,    # pan-scan offsets — §6.3.12
    _EXT_CAMERA_PARAMS,  # camera metadata
    _EXT_ITU_T,          # ITU-T reserved-content extension
})
_EXT_SCALABLE = frozenset({
    _EXT_SEQ_SCALABLE,
    _EXT_PIC_SPATIAL_SCALABLE,
    _EXT_PIC_TEMPORAL_SCALABLE,
})


def _map_qscale(code: int, q_scale_type: int) -> int:
    if not 1 <= code <= 31:
        raise ValueError("MPEG-2 quantiser_scale_code out of range")
    return _Q_NONLINEAR[code] if q_scale_type else 2 * code


# ------------------------------------------- inverse quant + mismatch


def _saturate(v: int) -> int:
    return max(-2048, min(2047, v))


def _mismatch(rec: np.ndarray) -> None:
    """§7.4.4: over the SATURATED raster-order coefficients, toggle
    the LSB of F[7][7] when the total sum is even (v ^= 1 implements
    the spec's odd→−1 / even→+1 in two's complement)."""
    if int(rec.sum()) % 2 == 0:
        rec[7, 7] = int(rec[7, 7]) ^ 1


# sparse dequant twins (r16 — same pattern as mpeg1): plain integer
# Python over the decoder's nonzero (zigzag-index, level) pairs beats
# the small-array numpy kernels 3-4x at typical sparsity; the §7.4.4
# mismatch sum rides along as a running total. The dense functions
# below stay as the reference twins (encoder reconstruction + the
# differential test).
def _dequant_intra2_sparse(
    qdc: int, pairs: list, qscale: int, dc_mult: int, wql: list
) -> np.ndarray:
    rec = [0] * 64
    dc = max(-2048, min(2047, qdc * dc_mult))
    rec[0] = dc
    total = dc
    for i, lv in pairs:
        v = 2 * lv * wql[i] * qscale
        t = v >> 5 if v >= 0 else -((-v) >> 5)  # truncate toward zero
        if t > 2047:
            t = 2047
        elif t < -2048:
            t = -2048
        rec[_ZIG_LIST[i]] = t
        total += t
    if total % 2 == 0:
        rec[63] ^= 1  # §7.4.4 mismatch control on F[7][7]
    m = np.array(rec, dtype=np.float64).reshape(8, 8)
    return _C.T @ m @ _C


def _dequant_nonintra2_sparse(
    pairs: list, qscale: int, wql: list
) -> np.ndarray:
    rec = [0] * 64
    total = 0
    for i, lv in pairs:
        if lv == 0:
            continue
        s = 1 if lv > 0 else -1
        v = (2 * lv + s) * wql[i] * qscale
        t = v >> 5 if v >= 0 else -((-v) >> 5)
        if t > 2047:
            t = 2047
        elif t < -2048:
            t = -2048
        rec[_ZIG_LIST[i]] = t
        total += t
    if total % 2 == 0:
        rec[63] ^= 1
    m = np.array(rec, dtype=np.float64).reshape(8, 8)
    return _C.T @ m @ _C


def _dequant_intra2(
    levels: np.ndarray, qscale: int, dc_mult: int,
    wq: np.ndarray = _WQ_ZZ,
) -> np.ndarray:
    """Zigzag QFS (levels[0] = quantized DC) -> spatial 8x8 float via
    §7.4.2.2 (k = 0) + §7.4.4 mismatch control. ``wq`` may be a
    stream-loaded matrix (sequence header or quant_matrix_extension,
    r12)."""
    rec = np.zeros(64, dtype=np.int64)
    rec[0] = _saturate(int(levels[0]) * dc_mult)
    # vectorized over the (sparse) nonzero AC levels; integer
    # semantics identical to the scalar _trunc_div/_saturate pair
    nz = np.nonzero(levels[1:])[0] + 1
    if nz.size:
        lv = levels[nz]
        v = 2 * lv * wq[nz] * qscale
        t = np.abs(v) // 32 * np.sign(v)  # "/" truncates toward zero
        np.clip(t, -2048, 2047, out=t)
        rec[ZIGZAG[nz]] = t
    sq = rec.reshape(8, 8)
    _mismatch(sq)
    return _C.T @ sq.astype(np.float64) @ _C


def _dequant_nonintra2(
    levels: np.ndarray, qscale: int, wq: np.ndarray = _WQ_NI_FLAT
) -> np.ndarray:
    """§7.4.2.2 with k = Sign(QF); the default flat-16 matrix
    collapses (2·QF+k)·W·qscale/32 to (2·QF+k)·qscale/2."""
    rec = np.zeros(64, dtype=np.int64)
    nz = np.nonzero(levels)[0]
    if nz.size:
        lv = levels[nz]
        v = (2 * lv + np.sign(lv)) * wq[nz] * qscale
        t = np.abs(v) // 32 * np.sign(v)  # "/" truncates toward zero
        np.clip(t, -2048, 2047, out=t)
        rec[ZIGZAG[nz]] = t
    sq = rec.reshape(8, 8)
    _mismatch(sq)
    return _C.T @ sq.astype(np.float64) @ _C


# ---------------------------------------------------- witness quant


def _quant_intra2(
    coeff: np.ndarray, qscale: int, dc_pred: int, dc_mult: int,
    wq: np.ndarray = _WQ_ZZ,
) -> np.ndarray:
    """DCT coefficients -> zigzag QFS; inverse of §7.4.2.2 (k = 0)."""
    zz = coeff.reshape(64)[ZIGZAG]
    qdc = int(np.rint(zz[0] / dc_mult))
    # the DC differential must fit the size-11 ladder
    qdc = max(-2047 + dc_pred, min(2047 + dc_pred, qdc))
    qdc = max(0, min((1 << 11) - 1, qdc))
    levels = np.zeros(64, dtype=np.int64)
    levels[0] = qdc
    for i in range(1, 64):
        lv = int(np.rint(32.0 * zz[i] / (2.0 * qscale * int(wq[i]))))
        levels[i] = max(-2047, min(2047, lv))
    return levels


def _quant_nonintra2(
    coeff: np.ndarray, qscale: int, wq: np.ndarray = _WQ_NI_FLAT
) -> np.ndarray:
    """Dead-zone (truncating) quantizer inverting §7.4.2.2's
    non-intra reconstruction."""
    zz = coeff.reshape(64)[ZIGZAG]
    levels = np.zeros(64, dtype=np.int64)
    for i in range(64):
        # trunc toward zero: dead zone (W = 16 collapses to /qscale)
        lv = int(16.0 * zz[i] / (qscale * int(wq[i])))
        levels[i] = max(-2047, min(2047, lv))
    return levels


# ----------------------------------------------- coefficient coding


def _write_escape2(w: _BitWriter, run: int, level: int) -> None:
    """§7.2.2.3: escape = '000001' + run(6) + signed level(12)."""
    if not -2047 <= level <= 2047 or level == 0:
        raise ValueError("MPEG-2 escape level out of range")
    w.write_code("000001")
    w.write(run, 6)
    w.write(level & 0xFFF, 12)


def _write_run_level2(w: _BitWriter, run: int, level: int) -> None:
    _write_run_level(w, run, level, escape=_write_escape2)


def _read_escape2(r: _BitReader) -> tuple[int, int]:
    run = r.read(6)
    raw = r.read(12)
    level = raw - 4096 if raw & 0x800 else raw
    if level == 0 or level == -2048:
        raise ValueError("forbidden MPEG-2 escape level")
    return run, level


def _read_run_level2(r: _BitReader) -> tuple[int, int] | None:
    """One dct_coeff (next) under Table B-14 with the MPEG-2 escape.
    The fused code+sign LUT is shared with MPEG-1 (the escape entry
    is a sentinel — only the payload read differs, r16)."""
    entry = _DCT_NEXT_LUT[r.peek(_DCT_NEXT_MAXLEN)]
    if entry is not None and r.pos + entry[1] <= r._total:
        sym = entry[0]
        r.read(entry[1])
        if type(sym) is tuple:
            return sym
        if sym is _AC_EOB:
            return None
        return _read_escape2(r)
    if r.read(1):
        if r.read(1):  # '11' = (0, ±1)
            return (0, -1) if r.read(1) else (0, 1)
        return None  # '10' = EOB
    return _read_run_level_tail(r, "0", escape=_read_escape2)


def _decode_block_intra2(
    r: _BitReader, qscale: int, dc_pred: int, is_luma: bool,
    dc_mult: int, wq: np.ndarray = _WQ_ZZ,
) -> tuple[np.ndarray, int]:
    """One intra block -> (spatial 8x8 float, new DC predictor)."""
    size = r.read_dc_size(
        _DC_LUMA2_INV if is_luma else _DC_CHROMA2_INV, maxlen=10
    )
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
    while (rl := _read_run_level2(r)) is not None:
        run, level = rl
        i += run + 1
        if i > 63:
            raise ValueError("MPEG-2 AC coefficients overflow the block")
        pairs.append((i, level))
    return _dequant_intra2_sparse(
        qdc, pairs, qscale, dc_mult,
        _WQ_ZZ_LIST if wq is _WQ_ZZ else _wq_list(wq),
    ), qdc


def _decode_block_nonintra2(
    r: _BitReader, qscale: int, wq: np.ndarray = _WQ_NI_FLAT
) -> np.ndarray:
    """One coded non-intra block -> spatial residual (dct_coeff_first:
    '1'+sign means (0, ±1), EOB cannot appear first)."""
    if r.read(1):
        i = 0
        run, level = 0, (-1 if r.read(1) else 1)
    else:
        run, level = _read_run_level_tail(r, "0", escape=_read_escape2)
        i = run
    if i > 63:
        raise ValueError("MPEG-2 AC coefficients overflow the block")
    pairs: list[tuple[int, int]] = [(i, level)]
    while (rl := _read_run_level2(r)) is not None:
        run, level = rl
        i += run + 1
        if i > 63:
            raise ValueError("MPEG-2 AC coefficients overflow the block")
        pairs.append((i, level))
    return _dequant_nonintra2_sparse(
        pairs, qscale, _WQ_NI_LIST if wq is _WQ_NI_FLAT else _wq_list(wq)
    )


def _write_intra_levels2(
    w: _BitWriter, levels: np.ndarray, dc_pred: int, is_luma: bool
) -> None:
    diff = int(levels[0]) - dc_pred
    size, offset = _dc_diff_bits(diff)
    if size > 11:
        raise ValueError("MPEG-2 DC differential out of range")
    w.write_code((_DC_LUMA2 if is_luma else _DC_CHROMA2)[size])
    if size:
        w.write(offset, size)
    run = 0
    for i in range(1, 64):
        level = int(levels[i])
        if level == 0:
            run += 1
            continue
        _write_run_level2(w, run, level)
        run = 0
    w.write_code("10")  # EOB


def _write_nonintra_levels2(w: _BitWriter, levels: np.ndarray) -> None:
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
            _write_run_level2(w, run, level)
        first = False
        run = 0
    if first:
        raise ValueError("MPEG-2 coded block without coefficients")
    w.write_code("10")  # EOB


class _M2Hooks(_QuantHooks):
    """MPEG-2 quantizer arithmetic plugged into the shared MPEG-1
    slice machinery (mpeg1._encode_p_slice/_encode_b_slice/
    _decode_slice). One instance per picture — it carries the
    picture_coding_extension state the block layer needs.

    With frame_pred_frame_dct = 0 (``fpfd=0``), macroblock_modes
    carries frame_motion_type (only the frame-based value 2 is
    implemented — field MC and dual prime raise) and dct_type, and
    the luma block layout follows §6.3.17.1's field-DCT interleave
    (the shared hooks' luma_view)."""

    def __init__(
        self, q_scale_type: int, dc_precision: int, fpfd: int = 1,
        wq: np.ndarray = None, wq_ni: np.ndarray = None,
    ) -> None:
        self.q_scale_type = q_scale_type
        self.dc_mult = 1 << (11 - dc_precision)
        self.dc_reset = 1 << (dc_precision - 1)
        self.fpfd = fpfd
        self.wq = _WQ_ZZ if wq is None else wq
        self.wq_ni = _WQ_NI_FLAT if wq_ni is None else wq_ni

    def read_mb_modes(self, sr, mf, mb, coded, intra):
        if self.fpfd:
            return 2, 0
        fmt = 2
        if mf or mb:
            fmt = sr.read(2)
            if fmt == 0:
                raise ValueError("reserved MPEG-2 frame_motion_type")
            if fmt == 3:
                raise NotImplementedError(
                    "MPEG-2 dual-prime prediction (frame_motion_type 3)"
                )
        dct = sr.read(1) if (coded or intra) else 0
        return fmt, dct

    def write_mb_modes(self, w, mf, mb, coded, intra, dct_type, fmt=2):
        if self.fpfd:
            return
        if mf or mb:
            w.write(fmt, 2)  # frame_motion_type
        if coded or intra:
            w.write(dct_type, 1)

    def read_mv(self, sr, pred, f_code, fmt):
        """§7.6.3: frame-based uses the base rule (PMV pairs mirror);
        field-based (frame pictures) reads two
        (motion_vertical_field_select, vector) sets — vertical coded
        in FIELD coordinates, predicted from PMV/2 and stored back
        DOUBLED."""
        from .mpeg1 import _read_motion, _trunc_half, _wrap_vector

        if fmt == 2:
            return _QuantHooks.read_mv(sr, pred, f_code, fmt)
        fh, fv = (f_code, f_code) if isinstance(f_code, int) else f_code
        newp = list(pred)
        out = []
        for r in (0, 1):
            sel = sr.read(1)
            dx = _read_motion(sr, fh)
            dy = _read_motion(sr, fv)
            vx = _wrap_vector(newp[2 * r] + dx, 1 << (fh - 1))
            vy = _wrap_vector(
                _trunc_half(newp[2 * r + 1]) + dy, 1 << (fv - 1)
            )
            out.append((sel, vx, vy))
            newp[2 * r] = vx
            newp[2 * r + 1] = 2 * vy
        return ("field", tuple(out)), newp

    def pick_dct_type(self, res) -> int:
        """Field-vs-frame DCT election for one luma residual (or
        intra pixel) 16x16 macroblock: compare adjacent-row coupling
        against same-field coupling; interlaced content correlates
        within fields, not across them."""
        if self.fpfd:
            return 0
        frame_diff = float(np.abs(res[0:15] - res[1:16]).sum())
        field_diff = float(
            np.abs(res[0:14:2] - res[2:16:2]).sum()
            + np.abs(res[1:15:2] - res[3:16:2]).sum()
        )
        return 1 if frame_diff > 1.05 * field_diff else 0

    def map_qscale(self, code):
        return _map_qscale(code, self.q_scale_type)

    def quant_intra(self, coeff, qscale, dc_pred):
        return _quant_intra2(
            coeff, qscale, dc_pred, self.dc_mult, self.wq
        )

    def quant_nonintra(self, coeff, qscale):
        return _quant_nonintra2(coeff, qscale, self.wq_ni)

    def dequant_intra(self, levels, qscale):
        return _dequant_intra2(levels, qscale, self.dc_mult, self.wq)

    def dequant_nonintra(self, levels, qscale):
        return _dequant_nonintra2(levels, qscale, self.wq_ni)

    @staticmethod
    def write_intra_levels(w, levels, dc_pred, is_luma):
        _write_intra_levels2(w, levels, dc_pred, is_luma)

    @staticmethod
    def write_nonintra_levels(w, levels):
        _write_nonintra_levels2(w, levels)

    def decode_block_intra(self, r, qscale, dc_pred, is_luma):
        return _decode_block_intra2(
            r, qscale, dc_pred, is_luma, self.dc_mult, self.wq
        )

    def decode_block_nonintra(self, r, qscale):
        return _decode_block_nonintra2(r, qscale, self.wq_ni)


# ------------------------------------------------------------ encoder


def _search_field_motion(
    cur_field: np.ndarray, ref_field: np.ndarray,
    oy: int, ox: int, search: int,
) -> tuple[int, int, int]:
    """Exhaustive half-pel SAD search of one 8×16 FIELD block against
    one reference field view -> (sad, vy, vx) in field half-pel."""
    from .mpeg1 import _mc_rect

    best, best_sad = (0, 0), None
    for hvy in range(-search, search + 1):
        for hvx in range(-search, search + 1):
            try:
                pred = _mc_rect(ref_field, oy, ox, 8, 16, hvy, hvx)
            except ValueError:
                continue
            sad = int(np.abs(cur_field - pred).sum())
            if best_sad is None or sad < best_sad or (
                sad == best_sad and (abs(hvy) + abs(hvx))
                < (abs(best[0]) + abs(best[1]))
            ):
                best, best_sad = (hvy, hvx), sad
    return best_sad, best[0], best[1]


def _encode_p_slice_fld(
    w, planes, rec, ref, row: int, mbw: int, qscale: int,
    f_code: int, search: int, hooks: "_M2Hooks",
) -> None:
    """fpfd=0 P slice: per macroblock, elect FRAME-based vs
    FIELD-based prediction (§7.6.4) by luma SAD — two independent
    field vectors with reference-field selection when fields move
    apart — then the usual residual/skip machinery. Mirrors the
    decoder's §7.6.3 PMV discipline (field verticals stored
    doubled)."""
    from .mpeg1 import (
        _field_pred,
        _mc_block,
        _search_motion,
        _trunc_half,
        _wrap_vector,
        _write_increment,
        _write_motion,
    )

    y, cb, cr = planes
    f = 1 << (f_code - 1)
    pmv = [0, 0, 0, 0]
    pending = 0
    for col in range(mbw):
        cur = y[row * 16 : row * 16 + 16, col * 16 : col * 16 + 16]
        # frame-based candidate
        vy_f, vx_f = _search_motion(cur, ref[0], row * 16, col * 16,
                                    search, 0)
        pred_frame = _mc_block(ref[0], row * 16, col * 16, 16,
                               vy_f, vx_f)
        sad_frame = int(np.abs(cur - pred_frame).sum())
        # field-based candidate: best (sel, vx, vy) per target field
        field_specs = []
        sad_field = 0
        for r in (0, 1):
            cur_fld = cur[r::2]
            best = None
            for sel in (0, 1):
                sad, vy, vx = _search_field_motion(
                    cur_fld, ref[0][sel::2], row * 8, col * 16, search
                )
                if sad is not None and (best is None or sad < best[0]):
                    best = (sad, sel, vx, vy)
            sad_field += best[0]
            field_specs.append((best[1], best[2], best[3]))
        use_field = sad_field < sad_frame
        if use_field:
            pred_y, pred_cb, pred_cr = _field_pred(
                ref, row, col, tuple(field_specs)
            )
        else:
            pred_y = pred_frame
            cvy, cvx = _trunc_half(vy_f), _trunc_half(vx_f)
            pred_cb = _mc_block(ref[1], row * 8, col * 8, 8, cvy, cvx)
            pred_cr = _mc_block(ref[2], row * 8, col * 8, 8, cvy, cvx)
        dct = hooks.pick_dct_type(cur - pred_y)
        levels, cbp = [], 0
        for blk in range(6):
            if blk < 4:
                block = hooks.luma_view(cur, 0, 0, blk, dct)
                pred = hooks.luma_view(pred_y, 0, 0, blk, dct)
            else:
                plane = cb if blk == 4 else cr
                block = plane[row * 8 : row * 8 + 8,
                              col * 8 : col * 8 + 8]
                pred = pred_cb if blk == 4 else pred_cr
            lvq = hooks.quant_nonintra(_C @ (block - pred) @ _C.T,
                                       qscale)
            if lvq.any():
                cand = np.clip(
                    pred + np.rint(
                        hooks.dequant_nonintra(lvq, qscale)
                    ).astype(np.int64),
                    0, 255,
                )
                if ((cand - block) ** 2).sum() < (
                    (pred - block) ** 2
                ).sum():
                    cbp |= 1 << (5 - blk)
                else:
                    lvq = np.zeros(64, dtype=np.int64)
            levels.append(lvq)
        if (
            not use_field and cbp == 0 and vx_f == 0 and vy_f == 0
            and 0 < col < mbw - 1
        ):
            rec[0][row * 16 : row * 16 + 16,
                   col * 16 : col * 16 + 16] = pred_y
            rec[1][row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = pred_cb
            rec[2][row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = pred_cr
            pmv = [0, 0, 0, 0]
            pending += 1
            continue
        _write_increment(w, pending + 1)
        pending = 0
        w.write_code("1" if cbp else "001")  # pred-mc(+cbp), Table B-3
        hooks.write_mb_modes(w, True, False, bool(cbp), False, dct,
                             fmt=1 if use_field else 2)
        if use_field:
            for r, (sel, vx, vy) in enumerate(field_specs):
                w.write(sel, 1)
                _write_motion(
                    w, _wrap_vector(vx - pmv[2 * r], f), f_code
                )
                _write_motion(
                    w,
                    _wrap_vector(vy - _trunc_half(pmv[2 * r + 1]), f),
                    f_code,
                )
                pmv[2 * r] = vx
                pmv[2 * r + 1] = 2 * vy
        else:
            _write_motion(w, _wrap_vector(vx_f - pmv[0], f), f_code)
            _write_motion(w, _wrap_vector(vy_f - pmv[1], f), f_code)
            pmv = [vx_f, vy_f, vx_f, vy_f]
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


def encode_m2v(
    frames: list[np.ndarray], fps_code: int = 5, qscale_code: int = 4,
    p_frames: bool = False, f_code: int = 1, search: int = 4,
    b_frames: int = 0, q_scale_type: int = 0, dc_precision: int = 8,
    fpfd: int = 1, intra_matrix: np.ndarray = None,
    non_intra_matrix: np.ndarray = None,
) -> bytes:
    """Witness MPEG-2 elementary stream (progressive, Main-profile
    shape, frame pictures, frame_pred_frame_dct = 1, 4:2:0,
    intra_vlc_format = 0, zigzag scan). Frames are (h, w, 3) RGB uint8
    with h, w multiples of 16. With ``fpfd=0`` the stream signals
    frame_pred_frame_dct = 0 (progressive_sequence drops to 0 as the
    spec requires): every coded macroblock carries frame_motion_type
    (frame-based) and a dct_type elected per macroblock by the
    field/frame coupling heuristic — interlaced witness scenes code
    field DCT. Same scheduling surface as
    mpeg1.encode_m1v minus full_pel (removed from MPEG-2):
    ``p_frames`` -> IPPP, ``b_frames`` = k -> anchors every k+1
    display frames with B pictures between. ``q_scale_type`` selects
    the Table 7-6 column; ``dc_precision`` in 8..11 drives dc_mult,
    the predictor reset, and the extended DC-size ladders."""
    if not frames:
        raise ValueError("MPEG-2 stream needs at least one frame")
    h, w_px, _ = frames[0].shape
    if h % 16 or w_px % 16:
        raise ValueError("MPEG-2 witness frames must be multiples of 16")
    if h > 2800:
        raise NotImplementedError(
            "MPEG-2 pictures taller than 2800 lines "
            "(slice_vertical_position_extension)"
        )
    if not 1 <= qscale_code <= 31:
        raise ValueError("quantiser_scale_code must be 1..31")
    if fps_code not in _PICTURE_RATES:
        raise ValueError(f"bad frame_rate code {fps_code}")
    if not 1 <= f_code <= 9:
        raise ValueError("MPEG-2 f_code must be 1..9")
    if not 8 <= dc_precision <= 11:
        raise ValueError("intra_dc_precision must be 8..11")
    if q_scale_type not in (0, 1):
        raise ValueError("q_scale_type is one bit")
    if fpfd not in (0, 1):
        raise ValueError("frame_pred_frame_dct is one bit")
    for fr in frames:
        if fr.shape != frames[0].shape:
            raise ValueError("MPEG-2 frames must share one geometry")
    if b_frames and not p_frames:
        raise ValueError("b_frames requires p_frames")

    wq = wq_ni = None
    for mat, intra in ((intra_matrix, True), (non_intra_matrix, False)):
        if mat is None:
            continue
        zz = np.asarray(mat, dtype=np.int64).reshape(64)[ZIGZAG]
        if (zz <= 0).any() or (zz > 255).any():
            raise ValueError("quantizer matrix entries must be 1..255")
        if intra and zz[0] != 8:
            raise ValueError("intra quantizer matrix must start at 8")
        if intra:
            wq = zz
        else:
            wq_ni = zz
    hooks = _M2Hooks(q_scale_type, dc_precision, fpfd, wq, wq_ni)
    qscale = hooks.map_qscale(qscale_code)
    mbw, mbh = w_px // 16, h // 16
    n = len(frames)

    w = _BitWriter()
    w.start_code(0xB3)  # sequence header (11172-2-compatible layout)
    w.write(w_px, 12)
    w.write(h, 12)
    w.write(1, 4)        # aspect_ratio_information: square sample
    w.write(fps_code, 4)
    w.write(0x3FFFF, 18)  # bit_rate (low 18)
    w.write(1, 1)         # marker
    w.write(0, 10)        # vbv_buffer_size (low 10)
    w.write(0, 1)         # constrained_parameters_flag
    for loaded in (wq, wq_ni):
        w.write(1 if loaded is not None else 0, 1)
        if loaded is not None:
            for v in loaded:  # already zigzag download order
                w.write(int(v), 8)
    w.start_code(0xB5)    # sequence_extension — what MAKES it MPEG-2
    w.write(_EXT_SEQUENCE, 4)
    w.write(0x48, 8)      # profile_and_level: Main @ Main
    w.write(fpfd, 1)      # progressive_sequence (0 when fpfd=0)
    w.write(1, 2)         # chroma_format 4:2:0
    w.write(0, 2)         # horizontal_size_extension
    w.write(0, 2)         # vertical_size_extension
    w.write(0, 12)        # bit_rate_extension
    w.write(1, 1)         # marker
    w.write(0, 8)         # vbv_buffer_size_extension
    w.write(0, 1)         # low_delay
    w.write(0, 2)         # frame_rate_extension_n
    w.write(0, 5)         # frame_rate_extension_d
    w.start_code(0xB8)    # GOP
    w.write(0, 25)
    w.write(1, 1)         # closed_gop
    w.write(0, 1)         # broken_link

    def planes_of(t: int):
        ycc = _rgb_to_ycbcr(frames[t]).astype(np.float64)
        return (ycc[:, :, 0], ycc[0::2, 0::2, 1], ycc[0::2, 0::2, 2])

    if p_frames:
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

    ref = prev_anchor = None
    for t, ptype in schedule:
        planes = planes_of(t)
        rec = (
            np.zeros((h, w_px), dtype=np.int64),
            np.zeros((h // 2, w_px // 2), dtype=np.int64),
            np.zeros((h // 2, w_px // 2), dtype=np.int64),
        )
        w.start_code(0x00)  # picture header (11172-2 layout)
        w.write(t & 0x3FF, 10)
        w.write(ptype, 3)
        w.write(0xFFFF, 16)  # vbv_delay
        if ptype in (2, 3):
            w.write(0, 1)    # full_pel_forward_vector: shall be 0
            w.write(7, 3)    # forward_f_code: shall be '111'
        if ptype == 3:
            w.write(0, 1)
            w.write(7, 3)
        w.write(0, 1)        # extra_bit_picture
        w.start_code(0xB5)   # picture_coding_extension
        w.write(_EXT_PIC_CODING, 4)
        fc = f_code
        w.write(fc if ptype in (2, 3) else 15, 4)  # f_code[0][0]
        w.write(fc if ptype in (2, 3) else 15, 4)  # f_code[0][1]
        w.write(fc if ptype == 3 else 15, 4)       # f_code[1][0]
        w.write(fc if ptype == 3 else 15, 4)       # f_code[1][1]
        w.write(dc_precision - 8, 2)
        w.write(3, 2)        # picture_structure: frame
        w.write(0, 1)        # top_field_first
        w.write(fpfd, 1)     # frame_pred_frame_dct
        w.write(0, 1)        # concealment_motion_vectors
        w.write(q_scale_type, 1)
        w.write(0, 1)        # intra_vlc_format: Table B-14
        w.write(0, 1)        # alternate_scan: zigzag
        w.write(0, 1)        # repeat_first_field
        w.write(fpfd, 1)     # chroma_420_type (= progressive_frame)
        w.write(fpfd, 1)     # progressive_frame
        w.write(0, 1)        # composite_display_flag
        for row in range(mbh):
            w.start_code(0x01 + row)  # one slice per MB row
            w.write(qscale_code, 5)
            w.write(0, 1)    # extra_bit_slice
            if ptype == 3:
                _encode_b_slice(
                    w, planes, prev_anchor, ref, row, mbw, qscale,
                    f_code, search, hooks=hooks,
                )
            elif ptype == 2:
                if fpfd:
                    _encode_p_slice(
                        w, planes, rec, ref, row, mbw, qscale,
                        f_code, 0, search, hooks=hooks,
                    )
                else:
                    _encode_p_slice_fld(
                        w, planes, rec, ref, row, mbw, qscale,
                        f_code, search, hooks,
                    )
            else:
                preds = [hooks.dc_reset] * 3
                for col in range(mbw):
                    w.write_code("1")  # mb_address_increment = 1
                    w.write_code("1")  # mb_type: intra (Table B-2)
                    cur = planes[0][
                        row * 16 : row * 16 + 16, col * 16 : col * 16 + 16
                    ]
                    dct = hooks.pick_dct_type(cur)
                    hooks.write_mb_modes(w, False, False, False, True, dct)
                    _encode_intra_mb(
                        w, planes, rec, row, col, qscale, preds,
                        hooks=hooks, dct_type=dct,
                    )
        if ptype != 3:  # B pictures are not references
            prev_anchor, ref = ref, rec
    w.start_code(0xB7)  # sequence end
    return w.bytes()


# ------------------------------------------------------------ decoder


def _parse_picture_coding_ext(r: _BitReader) -> dict:
    """picture_coding_extension after the extension id (§6.2.3.1),
    gating every interlaced / alternate-table tool honestly."""
    out = {
        "f": [[r.read(4), r.read(4)], [r.read(4), r.read(4)]],
        "dc_precision": 8 + r.read(2),
    }
    structure = r.read(2)
    if structure != 3:
        raise NotImplementedError(
            "MPEG-2 field pictures (picture_structure != frame)"
        )
    r.read(1)  # top_field_first
    out["fpfd"] = r.read(1)
    if r.read(1):
        raise NotImplementedError("MPEG-2 concealment motion vectors")
    out["q_scale_type"] = r.read(1)
    if r.read(1):
        raise NotImplementedError(
            "MPEG-2 alternate intra VLC (Table B-15)"
        )
    if r.read(1):
        raise NotImplementedError("MPEG-2 alternate scan")
    # repeat_first_field is DISPLAY timing only (3:2 pulldown on
    # film-rate DVDs — §6.3.10): pixel reconstruction is unaffected,
    # so decode proceeds and the count surfaces in the stream meta
    # (r13 self-review: the pre-r13 gate rejected a huge class of
    # perfectly decodable real streams)
    out["rff"] = r.read(1)
    r.read(1)  # chroma_420_type
    out["progressive_frame"] = r.read(1)
    if r.read(1):  # composite_display_flag
        r.read(20)
    return out


def _parse_quant_matrix_ext(
    r: _BitReader,
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """quant_matrix_extension after its id nibble (§6.3.11): up to
    four load flags; for 4:2:0 the chroma matrices mirror the luma
    ones, so set chroma-load flags gate honestly."""
    wq = _read_quant_matrix(r, intra=True) if r.read(1) else None
    wq_ni = _read_quant_matrix(r, intra=False) if r.read(1) else None
    if r.read(1) or r.read(1):  # chroma intra / non-intra loads
        raise NotImplementedError(
            "MPEG-2 separate chroma quantizer matrices (4:2:2/4:4:4)"
        )
    return wq, wq_ni


def decode_m2v(b: bytes) -> tuple[dict, list[np.ndarray]]:
    """MPEG-2 elementary-stream decode -> ({width, height, fps,
    n_frames, n_i, n_p, n_b, progressive, chroma, dc_precision},
    [RGB frames in DISPLAY order]). A missing sequence_extension
    raises ValueError (the stream is MPEG-1 — route it to
    mpeg1.decode_m1v); interlaced / scalable / alternate-table tools
    raise NotImplementedError (module docstring)."""
    data = bytes(b)
    code, pos = _next_start_code(data, 0)
    if code != 0xB3:
        raise ValueError("not an MPEG video stream (no sequence header)")
    r = _BitReader(data[pos:])
    w_px = r.read(12)
    h = r.read(12)
    _aspect = r.read(4)
    rate_code = r.read(4)
    if rate_code not in _PICTURE_RATES:
        raise ValueError(f"reserved MPEG-2 frame rate {rate_code}")
    r.read(18)
    if not r.read(1):
        raise ValueError("MPEG-2 sequence header marker bit missing")
    r.read(10)
    r.read(1)
    # stream-loaded quantizer matrices (r12 — previously gated): the
    # 64 values arrive in the header itself, zigzag download order
    wq = _WQ_ZZ
    wq_ni = _WQ_NI_FLAT
    if r.read(1):
        wq = _read_quant_matrix(r, intra=True)
    if r.read(1):
        wq_ni = _read_quant_matrix(r, intra=False)
    if not w_px or not h:
        raise ValueError("MPEG-2 zero frame dimensions")
    if h > 2800:
        # §6.3.16: pictures taller than 2800 lines carry a 3-bit
        # slice_vertical_position_extension before the quantiser
        # scale — unparsed here, and slice start codes alone cannot
        # address rows past 0xAF (r13 self-review)
        raise NotImplementedError(
            "MPEG-2 pictures taller than 2800 lines "
            "(slice_vertical_position_extension)"
        )
    code, pos = _next_start_code(data, pos)
    if code != 0xB5:
        raise ValueError(
            "no sequence_extension after the sequence header "
            "(an MPEG-1 stream — use decode_m1v)"
        )
    er = _BitReader(data[pos:])
    if er.read(4) != _EXT_SEQUENCE:
        raise ValueError("first extension is not a sequence_extension")
    _profile = er.read(8)
    progressive_seq = er.read(1)
    chroma_format = er.read(2)
    if chroma_format != 1:
        raise NotImplementedError(
            f"MPEG-2 chroma_format {chroma_format} (4:2:2/4:4:4)"
        )
    if er.read(2) or er.read(2):
        raise NotImplementedError("MPEG-2 size extensions beyond 4095")
    mbw, mbh = -(-w_px // 16), -(-h // 16)

    def to_rgb(planes) -> np.ndarray:
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
    n_i = n_p = n_b = n_rff = 0
    dc_precision_seen = 8
    fwd_anchor = held = None
    while True:
        code, nxt = _next_start_code(data, pos)
        pos = nxt
        if code == 0xB7:
            break
        if code == 0xB3:
            # Repeated sequence header (§6.3.3): quantizer matrices
            # RESET to the defaults here and either load flag may
            # download new ones — a legal mechanism for changing
            # matrices mid-stream. Skipping it unparsed (pre-r13) left
            # stale matrices in force: silently wrong pixels on
            # conforming third-party streams (r12 ADVICE).
            hr = _BitReader(data[pos:])
            if hr.read(12) != w_px or hr.read(12) != h:
                raise ValueError("MPEG-2 frame size changes mid-stream")
            hr.read(4)   # aspect_ratio_information
            hr.read(4)   # frame_rate_code
            hr.read(18)  # bit_rate
            if not hr.read(1):
                raise ValueError(
                    "MPEG-2 sequence header marker bit missing"
                )
            hr.read(10)  # vbv_buffer_size
            hr.read(1)   # constrained_parameters_flag
            wq = _WQ_ZZ
            wq_ni = _WQ_NI_FLAT
            if hr.read(1):
                wq = _read_quant_matrix(hr, intra=True)
            if hr.read(1):
                wq_ni = _read_quant_matrix(hr, intra=False)
            continue
        if code in (0xB8, 0xB2):  # GOP / user data
            continue
        if code == 0xB5:  # non-picture extension at sequence level
            xid = data[pos] >> 4
            if xid == _EXT_QUANT_MATRIX:
                qr = _BitReader(data[pos:])
                qr.read(4)
                new_wq, new_wq_ni = _parse_quant_matrix_ext(qr)
                wq = new_wq if new_wq is not None else wq
                wq_ni = new_wq_ni if new_wq_ni is not None else wq_ni
                continue
            if xid in _EXT_SCALABLE:
                raise NotImplementedError(
                    f"MPEG-2 scalability extension id {xid}"
                )
            if xid not in _EXT_SKIPPABLE:
                raise ValueError(
                    f"reserved MPEG-2 extension id {xid}"
                )
            continue
        if code != 0x00:
            raise ValueError(f"unexpected MPEG-2 start code {code:#x}")
        pr = _BitReader(data[pos:])
        _tref = pr.read(10)
        ptype = pr.read(3)
        if ptype == 4:
            raise ValueError("D pictures are forbidden in MPEG-2")
        if ptype not in (1, 2, 3):
            raise ValueError(f"forbidden MPEG-2 picture type {ptype}")
        # the 11172-2-compatible picture-header MV fields are ignored
        # (the extension's f_codes rule); find the coding extension
        code, pos = _next_start_code(data, pos)
        while code == 0xB2:  # user data between header and extension
            code, pos = _next_start_code(data, pos)
        if code != 0xB5 or (data[pos] >> 4) != _EXT_PIC_CODING:
            raise ValueError("MPEG-2 picture without coding extension")
        xr = _BitReader(data[pos:])
        xr.read(4)
        ext = _parse_picture_coding_ext(xr)
        dc_precision_seen = ext["dc_precision"]
        n_rff += ext["rff"]
        hooks = _M2Hooks(
            ext["q_scale_type"], ext["dc_precision"], ext["fpfd"],
            wq, wq_ni,
        )
        f_f = tuple(ext["f"][0])  # (horizontal, vertical)
        f_b = tuple(ext["f"][1])
        if ptype in (2, 3) and not all(1 <= c <= 9 for c in f_f):
            raise ValueError("MPEG-2 forward f_code out of range")
        if ptype == 3 and not all(1 <= c <= 9 for c in f_b):
            raise ValueError("MPEG-2 backward f_code out of range")
        if ptype == 1:
            planes = (
                np.zeros((mbh * 16, mbw * 16), dtype=np.int64),
                np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
                np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
            )
            fwd_ref = bwd_ref = None
            f_f = f_b = (1, 1)
        elif ptype == 2:
            if held is None:
                raise ValueError("MPEG-2 P picture before any I picture")
            planes = tuple(p.copy() for p in held)
            fwd_ref, bwd_ref = held, None
            f_b = (1, 1)
        else:
            if held is None or fwd_anchor is None:
                raise ValueError("MPEG-2 B picture without two anchors")
            planes = (
                np.zeros((mbh * 16, mbw * 16), dtype=np.int64),
                np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
                np.full((mbh * 8, mbw * 8), 128, dtype=np.int64),
            )
            fwd_ref, bwd_ref = fwd_anchor, held
        saw_slice = False
        while True:
            try:
                scode, spos = _next_start_code(data, pos)
            except ValueError:
                raise ValueError("MPEG-2 picture without terminator")
            if scode == 0xB5:
                # between coding extension and slices: quant-matrix
                # extensions change reconstruction from THIS picture
                # on — load them and rebind the picture's hooks;
                # display/copyright extensions skip
                xid = data[spos] >> 4
                if xid == _EXT_QUANT_MATRIX:
                    qr = _BitReader(data[spos:])
                    qr.read(4)
                    new_wq, new_wq_ni = _parse_quant_matrix_ext(qr)
                    wq = new_wq if new_wq is not None else wq
                    wq_ni = new_wq_ni if new_wq_ni is not None else wq_ni
                    hooks = _M2Hooks(
                        ext["q_scale_type"], ext["dc_precision"],
                        ext["fpfd"], wq, wq_ni,
                    )
                elif xid in _EXT_SCALABLE:
                    # spatial/temporal scalable extensions CHANGE the
                    # picture's reconstruction — silently skipping
                    # them (pre-r13) decoded wrong pixels
                    raise NotImplementedError(
                        f"MPEG-2 scalability extension id {xid}"
                    )
                elif xid not in _EXT_SKIPPABLE:
                    raise ValueError(
                        f"reserved MPEG-2 extension id {xid}"
                    )
                pos = spos
                continue
            if scode == 0xB2:
                pos = spos
                continue
            if not 0x01 <= scode <= 0xAF:
                break
            saw_slice = True
            row = scode - 1
            if row >= mbh:
                raise ValueError("MPEG-2 slice row beyond frame")
            send = data.find(b"\x00\x00\x01", spos)
            if send < 0:
                raise ValueError("MPEG-2 picture without terminator")
            _decode_slice(
                data[spos:send], row, planes, fwd_ref, bwd_ref,
                mbw, mbh, ptype, f_f, 0, f_b, 0, hooks=hooks,
            )
            pos = send
        if not saw_slice:
            raise ValueError("MPEG-2 picture without slices")
        if ptype == 3:
            n_b += 1
            frames.append(to_rgb(planes))
        else:
            if ptype == 2:
                n_p += 1
            else:
                n_i += 1
            if held is not None:
                frames.append(to_rgb(held))
            fwd_anchor, held = held, planes
    if held is not None:
        frames.append(to_rgb(held))
    if not frames:
        raise ValueError("MPEG-2 stream has no pictures")
    return (
        {
            "width": w_px,
            "height": h,
            "fps": _PICTURE_RATES[rate_code],
            "n_frames": len(frames),
            "n_i": n_i,
            "n_p": n_p,
            "n_b": n_b,
            "progressive": int(progressive_seq),
            "chroma": "4:2:0",
            "dc_precision": dc_precision_seen,
            "repeat_first_field": n_rff,
        },
        frames,
    )
