"""REAL WebP-lossless (VP8L) codec with no imaging library — RFC 9649
(the WebP specification), public spec only.

Completes the engine's native image stack (functions/pixels.py PNG/BMP/
netpbm/GIF, functions/jpeg.py baseline+progressive JPEG): VP8L is the
lossless half of WebP — LZ77 + canonical prefix codes over ARGB with
four spatial transforms. Lossy WebP (VP8 chunk: boolean arithmetic
coder + loop filter) genuinely needs a video-codec stack and stays
gated in operators/multimodal.py.

- decoder: RIFF walk, LSB-first bit reader, deflate-convention
  canonical prefix codes read via the code-length-code machinery
  (simple and normal forms, repeats 16/17/18, optional max_symbol),
  color cache, LZ77 backward references with the 120-entry 2D
  distance map, meta-prefix (entropy image) group selection, and all
  four inverse transforms: PREDICTOR (14 modes, tiled), COLOR
  (signed 3.5 fixed-point cross-channel), SUBTRACT_GREEN,
  COLOR_INDEXING (palette, including sub-byte pixel bundling).
- encoder: literal-only test-vector generator (no transforms, no
  cache, single prefix group) with REAL canonical prefix codes built
  from per-channel histograms and emitted through the same
  code-length-code machinery the decoder reads. VP8L is lossless, so
  every roundtrip must reproduce the pixels BIT-EXACTLY
  (tests/test_vp8l.py) — there is no "close enough" for this codec.

Decoder paths the in-repo encoder cannot reach (backrefs, cache,
transforms, meta groups) are exercised by hand-built streams in the
tests; the distance-map table follows the RFC listing.

EXCEPTION CONTRACT (same as functions/pixels.py): ValueError for
malformed/unsupported streams; internal IndexError/struct.error are
converted so one bad payload can never abort a Spark task.

Scale shape: codec runs inside Arrow-batched ``mapInPandas`` — a
narrow map, no shuffle; only stats rows leave the executor.
"""

from __future__ import annotations

import numpy as np

# code-length-code symbol order (RFC 9649 §4.2.1.1)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D distance map for LZ77 distance codes 1..120 (RFC 9649 §4.2.2):
# (dx, dy) neighbor offsets; codes > 120 are linear distances - 120.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (7, 1), (-7, 1), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 5), (-5, 5), (8, 0), (4, 7), (-4, 7), (7, 4),
    (-7, 4), (8, 1), (8, 2), (6, 5), (-6, 5), (5, 6), (-5, 6), (8, 3),
    (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 6), (-6, 6), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7),
]


# ---------------------------------------------------------------------------
# LSB-first bit IO (VP8L convention; prefix-code BITS are nonetheless
# read code-MSB-first, the deflate convention)
# ---------------------------------------------------------------------------


class _LsbReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.byte >= len(self.data):
            raise ValueError("VP8L bitstream exhausted")
        b = (self.data[self.byte] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.byte += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i  # LSB-first value assembly
        return v


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.bit = 0

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) % 8


# ---------------------------------------------------------------------------
# Canonical prefix codes (deflate convention)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the deflate canonical rule:
    shorter codes first, ties by symbol index."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return table


class _PrefixCode:
    """Decoder-side prefix code: either a 0-bit single-symbol code or
    a (length, code) -> symbol map walked bit-by-bit (stream bits are
    the code's bits MSB-first, per deflate)."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self.single: int | None = nz[0][0]
            self.map: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.map = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }

    @classmethod
    def single_symbol(cls, sym: int) -> "_PrefixCode":
        pc = cls.__new__(cls)
        pc.single = sym
        pc.map = {}
        return pc

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code in stream")


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixCode:
    """RFC 9649 §4.2.1: simple (1-2 symbols) or normal (code-length-
    code encoded lengths with 16/17/18 repeats and optional
    max_symbol)."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read_bits(8)
        else:
            sym0 = br.read_bit()
        if num_symbols == 1:
            return _PrefixCode.single_symbol(sym0)
        sym1 = br.read_bits(8)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size or sym1 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal
    num_code_lengths = 4 + br.read_bits(4)
    clc_lengths = [0] * 19
    for i in range(num_code_lengths):
        clc_lengths[_CLC_ORDER[i]] = br.read_bits(3)
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():  # use length / max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            rep = 3 + br.read_bits(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[sym] = prev
                sym += 1
        elif code_len == 17:
            sym += 3 + br.read_bits(3)
        else:  # 18
            sym += 11 + br.read_bits(7)
    if sym > alphabet_size:
        raise ValueError("VP8L code-length repeat overflow")
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_vp8l(b: bytes) -> np.ndarray:
    """Decode a lossless WebP (RIFF/VP8L) to (h, w, 4) uint8 RGBA.
    Raises ValueError for malformed streams and NotImplementedError
    for lossy VP8 / animated payloads."""
    try:
        return _decode_container(bytes(b))
    except (IndexError, KeyError, OverflowError) as exc:
        raise ValueError(f"corrupt VP8L stream: {exc}") from exc


def _decode_container(b: bytes) -> np.ndarray:
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) container")
    i = 12
    while i + 8 <= len(b):
        fourcc = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        payload = b[i + 8 : i + 8 + size]
        if fourcc == b"VP8L":
            return _decode_vp8l_payload(payload)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a video-codec stack"
            )
        if fourcc == b"ANIM" or fourcc == b"ANMF":
            raise NotImplementedError("animated WebP")
        i += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L chunk")


def _decode_vp8l_payload(b: bytes) -> np.ndarray:
    if not b or b[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _LsbReader(b, 1)
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bit()  # alpha hint
    if br.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > 1 << 26:
        raise ValueError(f"implausible VP8L dimensions {w}x{h}")
    argb = _read_image(br, w, h, is_main=True)
    # ARGB uint32 -> RGBA uint8
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    out[..., 3] = (argb >> 24) & 0xFF
    return out


def _read_image(br: _LsbReader, w: int, h: int, is_main: bool) -> np.ndarray:
    """Returns (h, w) uint32 ARGB."""
    transforms = []  # applied inverse in reverse order
    xsize = w
    if is_main:
        seen = set()
        while br.read_bit():
            ttype = br.read_bits(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                size_bits = br.read_bits(3) + 2
                tw = (xsize + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                tiles = _read_image(br, tw, th, is_main=False)
                transforms.append((ttype, size_bits, tiles))
            elif ttype == 2:  # subtract-green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.read_bits(8) + 1
                palette = _read_image(br, pal_size, 1, is_main=False)[0]
                # palette entries are stored as deltas
                # entries are component-wise deltas vs the previous
                # entry (RFC 9649 §4.2.4.3): per-channel mod-256 adds,
                # carries must never cross channel boundaries
                pal = palette.astype(np.int64)
                for k in range(1, pal_size):
                    prev, cur = int(pal[k - 1]), int(pal[k])
                    acc = 0
                    for s in (0, 8, 16, 24):
                        acc |= ((((cur >> s) + (prev >> s)) & 0xFF) << s)
                    pal[k] = acc
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal.astype(np.uint32)))
                if width_bits:
                    xsize = (xsize + (1 << width_bits) - 1) >> width_bits

    argb = _read_entropy_image(br, xsize, h, allow_meta=is_main)

    for ttype, p1, p2 in reversed(transforms):
        if ttype == 2:
            argb = _inv_subtract_green(argb)
        elif ttype == 0:
            argb = _inv_predictor(argb, p1, p2)
        elif ttype == 1:
            argb = _inv_color_transform(argb, p1, p2)
        else:  # color indexing
            argb = _inv_color_index(argb, p1, p2, w)
    return argb


def _read_entropy_image(
    br: _LsbReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad VP8L color-cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read_bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _read_image(br, mw, mh, is_main=False)
        meta = (((meta_img >> 8) & 0xFFFF)).astype(np.int64)
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, green_alpha)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n = w * h
    pix = np.zeros(n, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g_idx = int(meta[y >> meta_bits, x >> meta_bits])
            green, red, blue, alpha, dist = groups[g_idx]
        else:
            green, red, blue, alpha, dist = groups[0]
        sym = green.read(br)
        if sym < 256:  # literal
            r = red.read(br)
            bch = blue.read(br)
            a = alpha.read(br)
            px = (a << 24) | (r << 16) | (sym << 8) | bch
            pix[pos] = px
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif sym < 256 + 24:  # LZ77 backref
            length = _lz77_value(br, sym - 256)
            dcode = _lz77_value(br, dist.read(br))
            if dcode > 120:
                d = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                d = dy * w + dx
                if d < 1:
                    d = 1
            if d > pos or pos + length > n:
                raise ValueError("VP8L backref out of range")
            for _ in range(length):
                px = int(pix[pos - d])
                pix[pos] = px
                if cache_size:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:  # color-cache hit
            idx = sym - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            pix[pos] = cache[idx]
            pos += 1
    return pix.reshape(h, w)


def _lz77_value(br: _LsbReader, prefix: int) -> int:
    """Length/distance prefix coding (RFC 9649 §4.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read_bits(extra) + 1


# ---- inverse transforms ---------------------------------------------------


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) + g
    bch = (argb & 0xFF) + g
    return (
        (argb & np.uint32(0xFF00FF00))
        | ((r & 0xFF) << np.uint32(16))
        | (bch & 0xFF)
    ).astype(np.uint32)


def _avg2(a: int, b: int) -> int:
    # per-channel average of two ARGB pixels
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(c0: int, c1: int, c2: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        v = ((c0 >> shift) & 0xFF) + ((c1 >> shift) & 0xFF) - ((c2 >> shift) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _clamp_add_sub_half(c0: int, c1: int, c2: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        ave = (((c0 >> shift) & 0xFF) + ((c1 >> shift) & 0xFF)) >> 1
        sub = (c2 >> shift) & 0xFF
        # (ave - sub) / 2 with C's truncation toward zero (the libwebp
        # AddSubtractComponentHalf), NOT a floor shift — they differ
        # for odd negative deltas and real files encode against C
        delta = ave - sub
        half = delta // 2 if delta >= 0 else -((-delta) // 2)
        v = ave + half
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    # Paeth-like predictor 11
    p_alpha = abs(((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)) - abs(
        ((l >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    )
    p_red = abs(((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)) - abs(
        ((l >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    )
    p_green = abs(((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)) - abs(
        ((l >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    )
    p_blue = abs((t & 0xFF) - (tl & 0xFF)) - abs((l & 0xFF) - (tl & 0xFF))
    # libwebp Select: the TOP pixel wins ties (p == 0), left only
    # when strictly closer — real files encode against that rule
    return l if (p_alpha + p_red + p_green + p_blue) < 0 else t


def _inv_predictor(
    argb: np.ndarray, size_bits: int, tiles: np.ndarray
) -> np.ndarray:
    h, w = argb.shape
    out = argb.astype(np.uint64).copy()

    def addp(a: int, b: int) -> int:
        # per-channel modular add of prediction + residual
        return (
            (((a & 0xFF) + (b & 0xFF)) & 0xFF)
            | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF) & 0xFF) << 8)
            | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF) & 0xFF) << 16)
            | ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF) & 0xFF) << 24)
        )

    for y in range(h):
        for x in range(w):
            res = int(out[y, x])
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # L
            elif x == 0:
                pred = int(out[y - 1, 0])  # T
            else:
                mode = (int(tiles[y >> size_bits, x >> size_bits]) >> 8) & 0xFF
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                # rightmost column: TR reads one past the previous
                # row's end, which in the contiguous scan order is the
                # CURRENT row's leftmost (already decoded) pixel —
                # the libwebp buffer-layout convention
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(left, top, tl)
                else:
                    raise ValueError(f"bad VP8L predictor mode {mode}")
            out[y, x] = addp(pred, res)
    return out.astype(np.uint32)


def _delta(t: int, c: int) -> int:
    # signed 3.5 fixed-point color-transform delta
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(
    argb: np.ndarray, size_bits: int, tiles: np.ndarray
) -> np.ndarray:
    h, w = argb.shape
    out = argb.copy()
    for y in range(h):
        for x in range(w):
            px = int(out[y, x])
            te = int(tiles[y >> size_bits, x >> size_bits])
            g2r = te & 0xFF
            g2b = (te >> 8) & 0xFF
            r2b = (te >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF) + _delta(g2r, g)
            r &= 0xFF
            bch = (px & 0xFF) + _delta(g2b, g) + _delta(r2b, r)
            bch &= 0xFF
            out[y, x] = (px & 0xFF00FF00) | (r << 16) | bch
    return out


def _inv_color_index(
    argb: np.ndarray, width_bits: int, palette: np.ndarray, out_w: int
) -> np.ndarray:
    h = argb.shape[0]
    pal_size = palette.shape[0]
    if width_bits == 0:
        idx = (argb >> 8) & 0xFF
        if int(idx.max(initial=0)) >= pal_size:
            raise ValueError("VP8L palette index out of range")
        return palette[idx.astype(np.int64)]
    per_byte = 1 << width_bits  # pixels packed per coded pixel
    bits = 8 >> width_bits  # bits per pixel index
    out = np.zeros((h, out_w), dtype=np.uint32)
    for y in range(h):
        for cx in range(argb.shape[1]):
            packed = (int(argb[y, cx]) >> 8) & 0xFF
            for k in range(per_byte):
                x = cx * per_byte + k
                if x >= out_w:
                    break
                idx = (packed >> (k * bits)) & ((1 << bits) - 1)
                if idx >= pal_size:
                    raise ValueError("VP8L palette index out of range")
                out[y, x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# Encoder (literal-only test-vector generator)
# ---------------------------------------------------------------------------


def _huff_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Huffman code lengths from frequencies, depth-capped by the
    classic clamp-and-retry; returns all-zero for empty input."""
    n = len(freqs)
    live = [(f, i) for i, f in enumerate(freqs) if f > 0]
    if not live:
        return [0] * n
    if len(live) == 1:
        out = [0] * n
        out[live[0][1]] = 1
        return out
    import heapq

    f = [x[0] for x in live]
    while True:
        heap = [(fi, [k]) for k, fi in enumerate(f)]
        heapq.heapify(heap)
        depth = [0] * len(live)
        while len(heap) > 1:
            f1, m1 = heapq.heappop(heap)
            f2, m2 = heapq.heappop(heap)
            for k in m1 + m2:
                depth[k] += 1
            heapq.heappush(heap, (f1 + f2, m1 + m2))
        if max(depth) <= max_len:
            out = [0] * n
            for k, (_, sym) in enumerate(live):
                out[sym] = depth[k]
            return out
        f = [max(1, fi >> 2) for fi in f]  # flatten and retry


def _write_prefix_code(bw: _LsbWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a code through the code-length-code machinery (normal
    form, no repeats — simple and correct for test vectors); returns
    the symbol -> (code, length) encode table."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if len(used) == 1 and used[0] < 256:
        sym = used[0]
        bw.write_bits(1, 1)  # simple
        bw.write_bits(0, 1)  # one symbol
        if sym <= 1:
            bw.write_bits(0, 1)  # 1-bit symbol
            bw.write_bits(sym, 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(sym, 8)
        return {sym: (0, 0)}
    if len(used) == 2 and max(used) < 256 and lengths[used[0]] == 1 and lengths[used[1]] == 1:
        bw.write_bits(1, 1)
        bw.write_bits(1, 1)  # two symbols
        bw.write_bits(1, 1)
        bw.write_bits(used[0], 8)
        bw.write_bits(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write_bits(0, 1)  # normal
    # no max_symbol shortcut -> the decoder reads one code-length
    # symbol per alphabet entry, so emit them ALL (0..15 only, no
    # repeat codes — simple and unambiguous for a test encoder)
    trimmed = lengths
    clc_freq = [0] * 19
    for ln in trimmed:
        clc_freq[ln] += 1
    clc_lengths = _huff_lengths(clc_freq, max_len=7)
    if sum(1 for x in clc_lengths if x) == 1:
        # complete the code: pair the lone symbol with an unused one
        lone = next(i for i, x in enumerate(clc_lengths) if x)
        clc_lengths[lone] = 1
        clc_lengths[(lone + 1) % 19] = 1
    # num_code_lengths must cover every used clc symbol in _CLC_ORDER
    order_pos = {s: i for i, s in enumerate(_CLC_ORDER)}
    need = max(order_pos[s] for s, ln in enumerate(clc_lengths) if ln) + 1
    need = max(need, 4)
    bw.write_bits(need - 4, 4)
    for i in range(need):
        bw.write_bits(clc_lengths[_CLC_ORDER[i]], 3)
    clc_codes = _canonical_codes(clc_lengths)
    bw.write_bits(0, 1)  # no max_symbol shortcut
    for ln in trimmed:
        code, nbits = clc_codes[ln]
        bw.write_bits(_revbits(code, nbits), nbits)
    return _canonical_codes(lengths)


def _revbits(v: int, n: int) -> int:
    out = 0
    for _ in range(n):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def encode_vp8l(px: np.ndarray) -> bytes:
    """Encode (h, w, 3|4) uint8 RGB(A) (or (h, w) gray) as a literal-
    only lossless WebP: no transforms, no color cache, one prefix
    group, real canonical prefix codes from per-channel histograms.
    Bit-exact by construction — VP8L literals ARE the pixels."""
    if px.ndim == 2:
        px = np.stack([px, px, px], axis=-1)
    if px.shape[2] == 3:
        alpha = np.full(px.shape[:2] + (1,), 255, dtype=np.uint8)
        px = np.concatenate([px, alpha], axis=2)
    h, w = px.shape[:2]
    if not (0 < h <= 1 << 14 and 0 < w <= 1 << 14):
        raise ValueError(f"unencodable VP8L shape {px.shape}")
    r = px[..., 0].astype(np.int64).ravel()
    g = px[..., 1].astype(np.int64).ravel()
    bch = px[..., 2].astype(np.int64).ravel()
    a = px[..., 3].astype(np.int64).ravel()

    bw = _LsbWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(1 if (a != 255).any() else 0, 1)
    bw.write_bits(0, 3)  # version
    bw.write_bits(0, 1)  # no transforms... (main image: transform loop ends)
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta prefix image

    def hist(vals: np.ndarray, size: int) -> list[int]:
        out = [0] * size
        for v, c in zip(*np.unique(vals, return_counts=True)):
            out[int(v)] = int(c)
        return out

    green_tab = _write_prefix_code(bw, _huff_lengths(hist(g, 256 + 24)))
    red_tab = _write_prefix_code(bw, _huff_lengths(hist(r, 256)))
    blue_tab = _write_prefix_code(bw, _huff_lengths(hist(bch, 256)))
    alpha_tab = _write_prefix_code(bw, _huff_lengths(hist(a, 256)))
    dist_lengths = [0] * 40
    dist_lengths[0] = 1
    bw.write_bits(1, 1)  # simple code, 1 symbol (distance code unused)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)  # symbol 0 via 1 bit

    for i in range(h * w):
        for tab, v in (
            (green_tab, int(g[i])),
            (red_tab, int(r[i])),
            (blue_tab, int(bch[i])),
            (alpha_tab, int(a[i])),
        ):
            code, nbits = tab[v]
            if nbits:
                bw.write_bits(_revbits(code, nbits), nbits)
    payload = bytes(bw.out)
    riff_size = 4 + 8 + len(payload) + (len(payload) & 1)
    out = bytearray()
    out += b"RIFF" + riff_size.to_bytes(4, "little") + b"WEBP"
    out += b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        out += b"\x00"
    return bytes(out)
