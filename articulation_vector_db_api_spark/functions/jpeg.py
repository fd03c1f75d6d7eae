"""REAL JPEG codec with no imaging library — ITU-T T.81
(ISO/IEC 10918-1) baseline sequential AND progressive DCT, public
spec only.

The reference never decodes media (its corpus is PDFs read as text,
/root/reference/main.py:106-115); the engine's pixel stack
(functions/pixels.py) covered the stdlib-expressible lossless formats
(PNG/BMP/netpbm/GIF) and gated JPEG behind NotImplementedError. This
module removes that gate for the Huffman-coded JPEG family — which is
essentially every JPEG a web image corpus contains:

- decoder: full marker walk (DQT 8/16-bit, SOF0/1/2, DHT, DRI, SOS),
  Huffman entropy decode with byte-unstuffing and RSTn handling, and
  for progressive streams (Annex G) multi-scan accumulation into
  coefficient grids — spectral selection bands, successive
  approximation with EOBRUN and correction-bit refinement, interleaved
  DC / non-interleaved AC block orders; then dequantize + inverse
  zigzag, float64 8×8 IDCT (orthonormal DCT-III as a matrix product),
  chroma upsampling for (Hi, Vi) in {1, 2} (4:4:4 / 4:2:2 / 4:2:0),
  JFIF YCbCr→RGB.
- encoders: baseline (grayscale or RGB, all three subsamplings,
  restart intervals) and progressive (libjpeg-style scan script) with
  the spec's Annex K "typical" Huffman tables — the progressive
  encoder exists as the TEST-VECTOR GENERATOR: progressive and
  baseline encode identical quantized coefficients, so their decoded
  pixels must match bit-for-bit (tests/test_jpeg.py proves it over
  random images at every quality/subsampling), and images made of
  CONSTANT 8×8 blocks round-trip BIT-EXACTLY under the all-ones table
  (the hash-green oracle in suites/multimodal.py:
  multimodal_jpeg_roundtrip).

Arithmetic coding (SOF9+), lossless/hierarchical frames, 12-bit
precision, and sampling factors > 2 raise NotImplementedError and stay
gated — per-row fault isolation in operators/multimodal.py catches
them like any other codec gap.

EXCEPTION CONTRACT (same as functions/pixels.py): ValueError for
malformed/corrupt streams, NotImplementedError for unsupported
variants; internal IndexError/struct.error are converted so one bad
payload can never abort a Spark task.

Scale shape: both codecs run inside Arrow-batched ``mapInPandas``
where the payload bytes live — a narrow map, no shuffle; only stats
rows leave the executor.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — public standard tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 luminance quantization table (row-major), used by
# quant_table(quality) with the public libjpeg quality scaling curve.
QUANT_LUMA_K1 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 "typical" Huffman tables: (BITS counts per code length
# 1..16, HUFFVAL symbol list). The encoder emits these; the decoder
# always builds its tables from the file's own DHT segments.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: forward coeff = C @ X @ C.T,
# inverse X = C.T @ coeff @ C, with the JPEG 1/4·Cu·Cv scaling folded
# in (C is orthonormal so the pair is exactly inverse in float64).
_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def quant_table(quality: int) -> np.ndarray:
    """Annex K.1 luminance table scaled by the public libjpeg quality
    curve; quality=100 gives all-ones (the near-lossless table the
    roundtrip oracle uses)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QUANT_LUMA_K1 * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman coding machinery
# ---------------------------------------------------------------------------


# r16: both table builders are memoized on the (bits, vals) spec —
# encoders rebuild the standard K.3 tables per image and decoders
# rebuild per DHT segment, and real corpora carry the same handful of
# tables everywhere (guide §4.5: heavyweight init once per task).
# r17 (ADVICE r16): bounded like mpeg1._WQ_LISTS — an untrusted corpus
# with endlessly varied DHT specs must not grow worker memory without
# limit (each LUT below is ~0.5 MB).
_TABLE_CACHE: dict[tuple, dict] = {}
_TABLE_CACHE_MAX = 4096


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical code assignment (T.81 C.2)."""
    key = ("enc", tuple(bits), tuple(vals))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(_TABLE_CACHE) > _TABLE_CACHE_MAX:
        _TABLE_CACHE.clear()
    _TABLE_CACHE[key] = table
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the inverse mapping for the reader."""
    key = ("dec", tuple(bits), tuple(vals))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if len(_TABLE_CACHE) > _TABLE_CACHE_MAX:
        _TABLE_CACHE.clear()
    _TABLE_CACHE[key] = table
    return table


# decode table -> 16-bit-prefix LUT: lut[peeked] = (symbol, length);
# the table object is kept in the value so its id can't be recycled
_HUFF_LUTS: dict[int, tuple[dict, list]] = {}


def _huff_lut(table: dict[tuple[int, int], int]) -> list:
    cached = _HUFF_LUTS.get(id(table))
    if cached is not None and cached[0] is table:
        return cached[1]
    lut: list = [None] * (1 << 16)
    for (length, code), sym in table.items():
        base = code << (16 - length)
        entry = (sym, length)
        for s in range(1 << (16 - length)):
            lut[base + s] = entry
    if len(_HUFF_LUTS) > _TABLE_CACHE_MAX:  # r17 (ADVICE r16): bound
        _HUFF_LUTS.clear()
    _HUFF_LUTS[id(table)] = (table, lut)
    return lut


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("entropy segment exhausted mid-symbol")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        # bulk path (r16): one extraction once the accumulator holds n
        # bits; the per-bit loop remains the exhaustion error path
        while self.nbits < n:
            if not self._fill():
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.read_bit()
                return v
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        """Next 16 bits zero-padded past the segment end (for the
        Huffman LUT; consuming is the caller's job via ``nbits``)."""
        while self.nbits < 16 and self._fill():
            pass
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        return (self.acc << (16 - self.nbits)) & 0xFFFF

    def align_and_take_marker(self) -> int | None:
        """Drop partial-byte padding and consume the pending marker.
        The marker may not have been probed yet (a restart boundary is
        reached by MCU count, not by bit exhaustion), so peek ahead if
        no fill has hit it."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None and self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                self.marker = self.data[self.pos + 1]
        m = self.marker
        if m is not None:
            self.marker = None
            self.pos += 2
        return m


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    entry = _huff_lut(table)[r.peek16()]
    if entry is not None and entry[1] <= r.nbits:
        r.nbits -= entry[1]
        return entry[0]
    # slow path: segment ends mid-code or the code is invalid — the
    # per-bit walk reproduces the original diagnostics exactly
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _checked_category(t: int, limit: int, kind: str) -> int:
    """8-bit JPEG bounds magnitude categories (DC <= 11, AC <= 10);
    a corrupt stream can Huffman-decode to any DHT symbol, and an
    unchecked huge category would overflow the int64 coefficient
    store with the wrong exception type."""
    if t > limit:
        raise ValueError(f"invalid JPEG {kind} magnitude category {t}")
    return t


def _category(v: int) -> int:
    """Number of bits needed for magnitude coding (T.81 F.1.2.1.2)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder (baseline sequential; grayscale or RGB 4:4:4)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF color transform, float64, rounded to uint8."""
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    f = planes.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _encode_component_blocks(
    plane: np.ndarray,
    q: np.ndarray,
    bh: int | None = None,
    bw: int | None = None,
) -> tuple[list[np.ndarray], int, int]:
    """Pad a component plane to the (bh, bw) 8×8 block grid (edge
    replication, the standard choice; defaults to the plane's own
    ceil-div grid) and return quantized zigzag blocks in raster order
    plus the block grid shape."""
    h, w = plane.shape
    if bh is None:
        bh = (h + 7) // 8
    if bw is None:
        bw = (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeff = _C @ blk @ _C.T
            zz = np.round(coeff.reshape(64)[ZIGZAG] / q.reshape(64)[ZIGZAG])
            blocks.append(zz.astype(np.int64))
    return blocks, bh, bw


def _write_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    zz = zz.tolist()  # r16: one bulk conversion; the coefficient loop
    # below then runs on plain ints (no per-element numpy scalars)
    diff = zz[0] - pred
    t = _category(diff)
    code, length = dc_tab[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_tab[(run << 4) | t]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-mean chroma downsample (pad to factor multiples first)."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = ((h + fy - 1) // fy) * fy, ((w + fx - 1) // fx) * fx
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    return np.round(
        padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
    )


def encode_jpeg_baseline(
    px: np.ndarray,
    quality: int = 100,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JFIF JPEG (Annex K typical Huffman tables,
    quant_table(quality) for every component). ``subsample`` is one of
    "444" / "422" / "420" (color only); ``restart_interval`` > 0 emits
    a DRI segment and RSTn markers every that many MCUs — both exist
    so the decoder's MCU interleave, chroma upsample, and restart
    paths are provable by pure roundtrips (tests/test_jpeg.py)."""
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError(f"unencodable image shape {px.shape}")
    q = quant_table(quality)
    samplings = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsample not in samplings:
        raise ValueError(f"unknown subsampling {subsample!r}")
    ch, cv = samplings[subsample]  # luma-to-chroma factors (x, y)

    if gray:
        comps = [(1, 1, 1)]  # (cid, hi, vi)
        planes = [px.astype(np.float64)]
    else:
        hmax, vmax = ch, cv
        comps = [(1, hmax, vmax), (2, 1, 1), (3, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        planes = [
            ycc[..., 0].astype(np.float64),
            _box_downsample(ycc[..., 1].astype(np.float64), cv, ch),
            _box_downsample(ycc[..., 2].astype(np.float64), cv, ch),
        ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    # DQT (one table, id 0, 8-bit precision)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(v) for v in q.reshape(64)[ZIGZAG])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hi, vi in comps:
        out += struct.pack(">BBB", cid, (hi << 4) | vi, 0)
    # DHT — luma tables always; chroma tables only for color
    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _hi, _vi in comps:
        tabs = 0x00 if (gray or cid == 1) else 0x11
        out += struct.pack(">BB", cid, tabs)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_luma = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_luma = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_chroma = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_chroma = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # per-component quantized zigzag block grids, padded to MCU bounds
    grids = []
    for (cid, hi, vi), plane in zip(comps, planes):
        blocks, bh, bw = _encode_component_blocks(
            plane, q, mcuy * vi, mcux * hi
        )
        grids.append((blocks, bw))
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out_marker = 0xD0 + (rst % 8)
                writer.out += bytes([0xFF, out_marker])
                rst += 1
                preds = [0] * ncomp
            for ci, (cid, hi, vi) in enumerate(comps):
                blocks, bw = grids[ci]
                dc_t = dc_luma if ci == 0 else dc_chroma
                ac_t = ac_luma if ci == 0 else ac_chroma
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * bw + (mx * hi + bx)
                        preds[ci] = _write_block(
                            writer, blocks[bi], preds[ci], dc_t, ac_t
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (test-vector generator: spectral selection +
# successive approximation, T.81 Annex G) — exists so the progressive
# DECODER below is provable by pure roundtrips: progressive and
# baseline encode the SAME quantized coefficients, so their decoded
# pixels must be identical bit-for-bit.
# ---------------------------------------------------------------------------


def _emit_buffered(w: _BitWriter, br: list[int]) -> None:
    for bit in br:
        w.write(bit, 1)
    br.clear()


def encode_jpeg_progressive(
    px: np.ndarray, quality: int = 100, subsample: str = "444"
) -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2) with a libjpeg-style scan
    script: interleaved DC first pass at Al=1, per-component AC
    spectral-selection bands at Al=2, two AC successive-approximation
    refinement passes (Al 2→1→0), and a DC refinement pass. Exercises
    every decoder path: EOBRUN, ZRL-in-refinement, correction bits,
    non-interleaved component block order."""
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError(f"unencodable image shape {px.shape}")
    q = quant_table(quality)
    samplings = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsample not in samplings:
        raise ValueError(f"unknown subsampling {subsample!r}")
    ch, cv = samplings[subsample]

    if gray:
        comps = [(1, 1, 1)]
        planes = [px.astype(np.float64)]
    else:
        comps = [(1, ch, cv), (2, 1, 1), (3, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        planes = [
            ycc[..., 0].astype(np.float64),
            _box_downsample(ycc[..., 1].astype(np.float64), cv, ch),
            _box_downsample(ycc[..., 2].astype(np.float64), cv, ch),
        ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ncomp = len(comps)

    # per-component quantized zigzag grids, MCU-padded (DC scans) —
    # AC scans index the same grid but cover only the component's OWN
    # ceil-div block extent (T.81 non-interleaved rule)
    grids = []
    for (cid, hi, vi), plane in zip(comps, planes):
        blocks, bh, bw = _encode_component_blocks(
            plane, q, mcuy * vi, mcux * hi
        )
        ph, pw = plane.shape
        bh_c, bw_c = (ph + 7) // 8, (pw + 7) // 8
        grids.append({"blocks": blocks, "bw": bw, "bh": bh,
                      "bw_c": bw_c, "bh_c": bh_c})

    out = bytearray()
    out += b"\xff\xd8"
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(v) for v in q.reshape(64)[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hi, vi in comps:
        out += struct.pack(">BBB", cid, (hi << 4) | vi, 0)

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([tc_th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)

    dc_tabs = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
        if i == 0
        else _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
        for i in range(ncomp)
    ]
    ac_tabs = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
        if i == 0
        else _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
        for i in range(ncomp)
    ]

    def sos_header(scan_comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scan_comps), len(scan_comps))
        for ci in scan_comps:
            cid = comps[ci][0]
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            hdr += struct.pack(">BB", cid, (td << 4) | ta)
        return hdr + struct.pack(">BBB", ss, se, (ah << 4) | al)

    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (cid, hi, vi) in enumerate(comps):
                    g = grids[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            bi = (my * vi + by) * g["bw"] + (mx * hi + bx)
                            v = int(g["blocks"][bi][0]) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            t = _category(diff)
                            code, length = dc_tabs[ci][t]
                            wtr.write(code, length)
                            if t:
                                wtr.write(
                                    diff if diff >= 0 else diff + (1 << t) - 1, t
                                )
        wtr.flush()
        return bytes(wtr.out)

    def dc_refine_scan(al: int) -> bytes:
        wtr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (cid, hi, vi) in enumerate(comps):
                    g = grids[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            bi = (my * vi + by) * g["bw"] + (mx * hi + bx)
                            wtr.write((int(g["blocks"][bi][0]) >> al) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        g = grids[ci]
        tab = ac_tabs[ci]
        for by in range(g["bh_c"]):
            for bx in range(g["bw_c"]):
                zz = g["blocks"][by * g["bw"] + bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = (abs(v) >> al)
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, length = tab[0xF0]
                        wtr.write(code, length)
                        r -= 16
                    s = t.bit_length()
                    code, length = tab[(r << 4) | s]
                    wtr.write(code, length)
                    sv = t if v > 0 else -t
                    wtr.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
                    r = 0
                if r > 0:  # end-of-band (run of 1, no extra bits)
                    code, length = tab[0x00]
                    wtr.write(code, length)
        wtr.flush()
        return bytes(wtr.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        # T.81 G.1.2.3 / the classic encode_mcu_AC_refine shape: the
        # ZRL drain runs at EVERY nonzero position (history included)
        # while runs of >15 zero-history positions remain before the
        # last newly-significant coefficient — that invariant keeps
        # the buffered correction bits inside the <=15-zero window the
        # decoder's very next advance will traverse.
        wtr = _BitWriter()
        g = grids[ci]
        tab = ac_tabs[ci]
        for by in range(g["bh_c"]):
            for bx in range(g["bw_c"]):
                zz = g["blocks"][by * g["bw"] + bx]
                shifted = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob = ss - 1  # last newly-significant position
                for k in range(ss, se + 1):
                    if shifted[k - ss] == 1:
                        eob = k
                br: list[int] = []
                r = 0
                for k in range(ss, se + 1):
                    t = shifted[k - ss]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        code, length = tab[0xF0]
                        wtr.write(code, length)
                        _emit_buffered(wtr, br)
                        r -= 16
                    if t > 1:  # history: correction bit, not a symbol
                        br.append(t & 1)
                        continue
                    # newly significant at this precision
                    code, length = tab[(r << 4) | 1]
                    wtr.write(code, length)
                    wtr.write(1 if int(zz[k]) > 0 else 0, 1)
                    _emit_buffered(wtr, br)
                    r = 0
                if r > 0 or br:
                    code, length = tab[0x00]  # EOB (run of 1)
                    wtr.write(code, length)
                    _emit_buffered(wtr, br)
        wtr.flush()
        return bytes(wtr.out)

    # libjpeg-style script
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1) + dc_first_scan(1)
    for ci in range(ncomp):
        out += sos_header([ci], 1, 5, 0, 2) + ac_first_scan(ci, 1, 5, 2)
        out += sos_header([ci], 6, 63, 0, 2) + ac_first_scan(ci, 6, 63, 2)
    for ci in range(ncomp):
        out += sos_header([ci], 1, 63, 2, 1) + ac_refine_scan(ci, 1, 63, 1)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0) + dc_refine_scan(0)
    for ci in range(ncomp):
        out += sos_header([ci], 1, 63, 1, 0) + ac_refine_scan(ci, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder — baseline sequential AND progressive (T.81 Annex F/G).
# Architecture: every scan Huffman-decodes into per-component QUANTIZED
# COEFFICIENT grids (progressive scans accumulate successive
# approximation bits); one reconstruction pass at EOI dequantizes,
# IDCTs, upsamples, and color-converts. Baseline is the one-scan
# special case of the same machinery.
# ---------------------------------------------------------------------------


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline-sequential or progressive JPEG to
    (h, w, channels) uint8 (1 = grayscale, 3 = color). Raises
    NotImplementedError for arithmetic-coded / lossless / hierarchical
    / 12-bit variants and ValueError for malformed streams."""
    try:
        return _decode_jpeg(b)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"corrupt JPEG stream: {exc}") from exc


# the historical name (r7 baseline-only decoder) — same function now
decode_jpeg_baseline = decode_jpeg


def _decode_jpeg(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps=[(cid, hi, vi, tq)], progressive)
    state = None  # per-component coefficient grids + geometry
    got_scan = False
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > len(b):
            break
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(
                        np.int64
                    )
                    p += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                dq = np.zeros(64, dtype=np.int64)
                dq[ZIGZAG] = tbl  # stored zigzag → natural order
                qtables[tq] = dq
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG precision")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            frame = (h, w, comps, marker == 0xC2)
            state = _init_coeff_state(frame)
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(
                f"unsupported JPEG frame (marker 0xFF{marker:02X}: "
                "arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None or state is None:
                raise ValueError("SOS before SOF frame header")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                td_ta = seg[2 + 2 * c]
                scan.append((cid, td_ta >> 4, td_ta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            i = _decode_scan_entropy(
                b,
                i + 2 + seg_len,
                frame,
                state,
                scan,
                ss,
                se,
                ah,
                al,
                htables,
                restart_interval,
            )
            got_scan = True
            continue
        i += 2 + seg_len
    if not got_scan:
        raise ValueError("JPEG stream has no scan data")
    return _reconstruct(frame, state, qtables)


def _init_coeff_state(frame: tuple) -> dict:
    h, w, comps, _prog = frame
    if not comps or h == 0 or w == 0:
        raise ValueError("empty JPEG frame")
    if h * w > 1 << 26:  # 64 MP sanity cap for the curation path: a
        # corrupt SOF must fail as ValueError, never as a multi-GB
        # allocation attempt inside an executor
        raise ValueError(f"implausible JPEG dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or any(c[1] < 1 or c[2] < 1 for c in comps):
        raise NotImplementedError(
            f"sampling factors beyond 2 (hmax={hmax}, vmax={vmax})"
        )
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    state = {"mcux": mcux, "mcuy": mcuy, "hmax": hmax, "vmax": vmax, "c": {}}
    for cid, hi, vi, _tq in comps:
        bw = mcux * hi  # MCU-padded grid (interleaved scans)
        bh = mcuy * vi
        comp_w = (w * hi + hmax - 1) // hmax  # component's own extent
        comp_h = (h * vi + vmax - 1) // vmax
        state["c"][cid] = {
            "coef": np.zeros((bh * bw, 64), dtype=np.int64),
            "bw": bw,
            "bh": bh,
            "bw_c": (comp_w + 7) // 8,  # non-interleaved scan extent
            "bh_c": (comp_h + 7) // 8,
            "pred": 0,
        }
    return state


def _decode_scan_entropy(
    b: bytes,
    pos: int,
    frame: tuple,
    state: dict,
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    htables: dict,
    restart_interval: int,
) -> int:
    """Decode one scan's entropy segment into the coefficient grids;
    returns the stream position just past it (at the next marker)."""
    h, w, comps, progressive = frame
    comp_by_id = {c[0]: c for c in comps}
    if progressive:
        # T.81 G.1: a progressive scan is either DC (Ss=Se=0) or a
        # single-component AC band (0 < Ss <= Se <= 63)
        if not ((ss == 0 and se == 0) or (0 < ss <= se <= 63)):
            raise ValueError(f"invalid progressive scan band {ss}..{se}")
        if ss > 0 and len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
    else:
        ss, se, ah, al = 0, 63, 0, 0
    reader = _BitReader(b, pos)
    for cid, _td, _ta in scan:
        state["c"][cid]["pred"] = 0
    eobrun = 0

    # build the (component, block-index) visit order
    units: list[tuple[int, int, int]] = []  # (cid, bi, unit_boundary)
    if len(scan) > 1:
        for my in range(state["mcuy"]):
            for mx in range(state["mcux"]):
                for cid, _td, _ta in scan:
                    _c, hi, vi, _tq = comp_by_id[cid]
                    st = state["c"][cid]
                    for by in range(vi):
                        for bx in range(hi):
                            bi = (my * vi + by) * st["bw"] + (mx * hi + bx)
                            units.append((cid, bi, 0))
                if units:
                    units[-1] = (units[-1][0], units[-1][1], 1)
    else:
        cid = scan[0][0]
        st = state["c"][cid]
        for by in range(st["bh_c"]):
            for bx in range(st["bw_c"]):
                units.append((cid, by * st["bw"] + bx, 1))

    tabs = {cid: (td, ta) for cid, td, ta in scan}
    total_mcus = sum(1 for u in units if u[2])
    mcu_count = 0
    for cid, bi, boundary in units:
        st = state["c"][cid]
        coef = st["coef"][bi]
        td, ta = tabs[cid]
        if ss == 0 and (not progressive or ah == 0):
            # DC first pass / full sequential needs the DC table; a DC
            # REFINEMENT scan is raw bits and may cite an absent table
            dc_tab = htables.get((0, td))
            if dc_tab is None:
                raise ValueError("scan references undefined DC table")
        if se > 0:
            ac_tab = htables.get((1, ta))
            if ac_tab is None:
                raise ValueError("scan references undefined AC table")

        if not progressive:
            t = _checked_category(_decode_symbol(reader, dc_tab), 11, "DC")
            st["pred"] += _extend(reader.read_bits(t), t)
            coef[0] = st["pred"]
            k = 1
            while k < 64:
                rs = _decode_symbol(reader, ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                _checked_category(s, 10, "AC")
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                k += 1
        elif ss == 0:  # progressive DC
            if ah == 0:
                t = _checked_category(
                    _decode_symbol(reader, dc_tab), 11, "DC"
                )
                st["pred"] += _extend(reader.read_bits(t), t)
                coef[0] = st["pred"] << al
            else:
                coef[0] |= reader.read_bit() << al
        elif ah == 0:  # progressive AC, first pass for this band
            if eobrun > 0:
                eobrun -= 1
            else:
                k = ss
                while k <= se:
                    rs = _decode_symbol(reader, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    _checked_category(s, 10, "AC")
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
                    k += 1
        else:  # progressive AC refinement
            p1 = 1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_symbol(reader, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("bad refinement magnitude")
                        val = p1 if reader.read_bit() else -p1
                    while k <= se:
                        z = ZIGZAG[k]
                        c = int(coef[z])
                        if c != 0:
                            if reader.read_bit() and (abs(c) & p1) == 0:
                                coef[z] = c + (p1 if c >= 0 else -p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val != 0 and k <= se:
                        coef[ZIGZAG[k]] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    z = ZIGZAG[k]
                    c = int(coef[z])
                    if c != 0 and reader.read_bit() and (abs(c) & p1) == 0:
                        coef[z] = c + (p1 if c >= 0 else -p1)
                    k += 1
                eobrun -= 1

        if boundary:
            mcu_count += 1
            if (
                restart_interval
                and mcu_count % restart_interval == 0
                and mcu_count < total_mcus
            ):
                m = reader.align_and_take_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("missing JPEG restart marker")
                for scid, _td2, _ta2 in scan:
                    state["c"][scid]["pred"] = 0
                eobrun = 0

    # skip to the next marker (past padding bits / stuffed bytes)
    pos = reader.pos
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] not in (0x00,) and not (
            0xD0 <= b[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(b)


def _reconstruct(frame: tuple, state: dict, qtables: dict) -> np.ndarray:
    h, w, comps, _prog = frame
    hmax, vmax = state["hmax"], state["vmax"]
    chans = []
    for cid, hi, vi, tq in comps:
        st = state["c"][cid]
        q = qtables.get(tq)
        if q is None:
            raise ValueError("frame references undefined quant table")
        bh, bw = st["bh"], st["bw"]
        plane = np.empty((bh * 8, bw * 8), dtype=np.float64)
        coefs = st["coef"]
        for by in range(bh):
            for bx in range(bw):
                deq = (coefs[by * bw + bx] * q).astype(np.float64)
                blk = _C.T @ deq.reshape(8, 8) @ _C
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk + 128.0
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        chans.append(plane[:h, :w])
    stacked = np.stack(chans, axis=-1)
    if len(chans) == 1:
        return np.clip(np.round(stacked), 0, 255).astype(np.uint8)
    if len(chans) == 3:
        return _ycbcr_to_rgb(stacked)
    raise NotImplementedError(f"{len(chans)}-component JPEG (CMYK?)")
