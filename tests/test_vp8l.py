"""VP8L (lossless WebP) codec: functions/vp8l.py.

The in-repo encoder is literal-only, so roundtrips prove header,
prefix-code machinery, and the literal pixel loop BIT-EXACTLY (VP8L is
lossless — equality, not tolerance). Every decoder path the encoder
cannot emit — LZ77 backrefs, the color cache, all four transforms,
meta prefix groups — is exercised here by hand-built streams composed
with the module's own bit/prefix primitives, with expected pixels
computed by an independent forward pass in the test."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.vp8l import (
    _huff_lengths,
    _LsbWriter,
    _revbits,
    _write_prefix_code,
    decode_vp8l,
    encode_vp8l,
)


def _rgba(img3):
    a = np.full(img3.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([img3, a], axis=2)


def test_literal_roundtrip_exact():
    rng = np.random.RandomState(5)
    for shape in [(7, 5, 3), (16, 16, 4), (1, 1, 3), (31, 2, 4)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        dec = decode_vp8l(encode_vp8l(img))
        exp = img if shape[2] == 4 else _rgba(img)
        assert np.array_equal(dec, exp), shape


def test_simple_codes_and_gray():
    rng = np.random.RandomState(6)
    const = np.full((9, 11, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_vp8l(encode_vp8l(const)), _rgba(const))
    twoval = (rng.randint(0, 2, size=(8, 8)) * 200 + 17).astype(np.uint8)
    dec = decode_vp8l(encode_vp8l(twoval))
    assert np.array_equal(dec[:, :, 0], twoval)


# ---------------------------------------------------------------------------
# hand-built streams: a minimal writer around the module primitives
# ---------------------------------------------------------------------------


class _B:
    """Builds a VP8L payload; pixels are written per-channel through
    real prefix codes built from the exact symbol histograms."""

    def __init__(self, w, h):
        self.bw = _LsbWriter()
        self.bw.write_bits(0x2F, 8)
        self.bw.write_bits(w - 1, 14)
        self.bw.write_bits(h - 1, 14)
        self.bw.write_bits(0, 1)
        self.bw.write_bits(0, 3)

    def entropy_image(self, tokens, cache_bits=0, sub=False):
        """tokens: list of ('lit', a, r, g, b) | ('ref', length, dist)
        | ('cache', idx). Emits cache header (+ meta=0 when not sub)
        and the five prefix codes sized to the token histograms."""
        bw = self.bw
        if cache_bits:
            bw.write_bits(1, 1)
            bw.write_bits(cache_bits, 4)
        else:
            bw.write_bits(0, 1)
        if not sub:
            bw.write_bits(0, 1)  # no meta prefix image
        cache_size = (1 << cache_bits) if cache_bits else 0
        gh = [0] * (256 + 24 + cache_size)
        rh, bh, ah, dh = [0] * 256, [0] * 256, [0] * 256, [0] * 40
        lz = []
        for t in tokens:
            if t[0] == "lit":
                _, a, r, g, b = t
                gh[g] += 1
                rh[r] += 1
                bh[b] += 1
                ah[a] += 1
            elif t[0] == "ref":
                _, length, dist = t
                lp, le, lb = _prefix_split(length)
                dp, de, db = _prefix_split(dist)
                gh[256 + lp] += 1
                dh[dp] += 1
                lz.append((le, lb, de, db))
            else:
                gh[256 + 24 + t[1]] += 1
        tabs = []
        for histo in (gh, rh, bh, ah, dh):
            if not any(histo):
                histo = histo[:]
                histo[0] = 1  # unused code: emit a 1-symbol simple code
            tabs.append(_write_prefix_code(bw, _huff_lengths(histo)))
        g_tab, r_tab, b_tab, a_tab, d_tab = tabs

        def emit(tab, sym):
            code, nbits = tab[sym]
            if nbits:
                bw.write_bits(_revbits(code, nbits), nbits)

        for t in tokens:
            if t[0] == "lit":
                _, a, r, g, b = t
                emit(g_tab, g)
                emit(r_tab, r)
                emit(b_tab, b)
                emit(a_tab, a)
            elif t[0] == "ref":
                _, length, dist = t
                lp, le, lb = _prefix_split(length)
                emit(g_tab, 256 + lp)
                if lb:
                    bw.write_bits(le, lb)
                dp, de, db = _prefix_split(dist)
                emit(d_tab, dp)
                if db:
                    bw.write_bits(de, db)
            else:
                emit(g_tab, 256 + 24 + t[1])

    def payload(self):
        p = bytes(self.bw.out)
        riff = 4 + 8 + len(p) + (len(p) & 1)
        out = b"RIFF" + riff.to_bytes(4, "little") + b"WEBP"
        out += b"VP8L" + len(p).to_bytes(4, "little") + p
        return out + (b"\x00" if len(p) & 1 else b"")


def _prefix_split(v):
    """value -> (prefix_code, extra_value, extra_bits): inverse of the
    decoder's _lz77_value."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1  # x >= 4
    n = x.bit_length() - 1
    extra = n - 1
    b = (x >> extra) & 1
    prefix = 2 * n + b
    offset = (2 + b) << extra
    return prefix, x - offset, extra


def test_prefix_split_inverts_lz77_value():
    from articulation_vector_db_api_spark.functions.vp8l import (
        _lz77_value,
        _LsbReader,
    )

    for v in list(range(1, 80)) + [120, 121, 500, 4096]:
        p, e, nb = _prefix_split(v)
        bw = _LsbWriter()
        bw.write_bits(e, nb) if nb else None
        br = _LsbReader(bytes(bw.out) + b"\x00")
        assert _lz77_value(br, p) == v, v


def test_lz77_backref_and_linear_distance():
    """ABAB… via a backref with linear distance (code = dist + 120):
    every copied pixel must also land in sequence order."""
    w, h = 6, 2
    A = (255, 10, 20, 30)
    Bp = (255, 40, 50, 60)
    b = _B(w, h)
    b.bw.write_bits(0, 1)  # no transforms
    tokens = [("lit", *A), ("lit", *Bp), ("ref", 10, 2 + 120)]
    b.entropy_image(tokens)
    dec = decode_vp8l(b.payload())
    exp = np.zeros((h, w, 4), np.uint8)
    flat = exp.reshape(-1, 4)
    seq = [A, Bp] * 6
    for i in range(12):
        a, r, g, bl = seq[i]
        flat[i] = (r, g, bl, a)
    assert np.array_equal(dec, exp)


def test_lz77_distance_map_code():
    """2D distance map: code 1 = (0, 1) = the pixel directly above —
    copying a whole second row from the first via one backref."""
    w, h = 4, 2
    rng = np.random.RandomState(2)
    row = [(255, *rng.randint(0, 256, 3)) for _ in range(w)]
    b = _B(w, h)
    b.bw.write_bits(0, 1)  # no transforms
    tokens = [("lit", *p) for p in row]
    # dist code value 1 maps to (dx, dy) = (0, 1) -> distance w
    tokens.append(("ref", w, 1))
    b.entropy_image(tokens)
    dec = decode_vp8l(b.payload())
    assert np.array_equal(dec[1], dec[0])
    assert tuple(dec[0, 0]) == (row[0][1], row[0][2], row[0][3], 255)


def test_color_cache():
    """Literal inserts into the cache; a later cache symbol must
    reproduce it exactly."""
    cache_bits = 4
    px = (255, 99, 3, 200)  # a, r, g, b
    argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    w, h = 3, 1
    b = _B(w, h)
    b.bw.write_bits(0, 1)  # no transforms
    b.entropy_image(
        [("lit", *px), ("lit", 255, 1, 2, 3), ("cache", idx)],
        cache_bits=cache_bits,
    )
    dec = decode_vp8l(b.payload())
    assert tuple(dec[0, 0]) == (99, 3, 200, 255)
    assert np.array_equal(dec[0, 2], dec[0, 0])


def _sub_image(b, tokens):
    b.entropy_image(tokens, sub=True)


def test_subtract_green_transform():
    rng = np.random.RandomState(7)
    w, h = 5, 3
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    b = _B(w, h)
    b.bw.write_bits(1, 1)  # transform present
    b.bw.write_bits(2, 2)  # SUBTRACT_GREEN
    b.bw.write_bits(0, 1)  # no more transforms
    tokens = []
    for y in range(h):
        for x in range(w):
            r, g, bl = (int(v) for v in img[y, x])
            tokens.append(("lit", 255, (r - g) & 0xFF, g, (bl - g) & 0xFF))
    b.entropy_image(tokens)
    dec = decode_vp8l(b.payload())
    assert np.array_equal(dec, _rgba(img))


@pytest.mark.parametrize("mode", [0, 1, 2, 5, 7, 11, 12, 13])
def test_predictor_transform(mode):
    """One predictor tile covering the image; residuals computed by a
    forward pass mirroring the spec's inverse."""
    from articulation_vector_db_api_spark.functions.vp8l import (
        _avg2,
        _clamp_add_sub_full,
        _clamp_add_sub_half,
        _select,
    )

    rng = np.random.RandomState(mode)
    w, h = 6, 4
    img = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)

    def pack(y, x):
        r, g, bl, a = (int(v) for v in img[y, x])
        return (a << 24) | (r << 16) | (g << 8) | bl

    def predict(y, x):
        if x == 0 and y == 0:
            return 0xFF000000
        if y == 0:
            return pack(0, x - 1)
        if x == 0:
            return pack(y - 1, 0)
        left, top, tl = pack(y, x - 1), pack(y - 1, x), pack(y - 1, x - 1)
        # rightmost-column TR = current row's leftmost pixel (the
        # libwebp contiguous-buffer convention the decoder mirrors)
        tr = pack(y - 1, x + 1) if x + 1 < w else pack(y, 0)
        return {
            0: 0xFF000000,
            1: left,
            2: top,
            5: _avg2(_avg2(left, tr), top),
            7: _avg2(left, top),
            11: _select(left, top, tl),
            12: _clamp_add_sub_full(left, top, tl),
            13: _clamp_add_sub_half(left, top, tl),
        }[mode]

    b = _B(w, h)
    b.bw.write_bits(1, 1)
    b.bw.write_bits(0, 2)  # PREDICTOR
    b.bw.write_bits(7, 3)  # size_bits = 9 -> one 512px tile
    _sub_image(b, [("lit", 255, 0, mode, 0)])  # mode in green channel
    b.bw.write_bits(0, 1)  # end of transforms
    tokens = []
    for y in range(h):
        for x in range(w):
            p = predict(y, x)
            c = pack(y, x)
            res = tuple(((c >> s) - (p >> s)) & 0xFF for s in (24, 16, 8, 0))
            tokens.append(("lit", *res))
    b.entropy_image(tokens)
    dec = decode_vp8l(b.payload())
    assert np.array_equal(dec, img), f"mode {mode}"


def test_color_transform():
    from articulation_vector_db_api_spark.functions.vp8l import _delta

    rng = np.random.RandomState(9)
    w, h = 5, 4
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    g2r, g2b, r2b = 0x40, 0xE8, 0x17  # mixed-sign 3.5 fixed multipliers
    b = _B(w, h)
    b.bw.write_bits(1, 1)
    b.bw.write_bits(1, 2)  # COLOR
    b.bw.write_bits(7, 3)  # one tile
    # tile element: g2r in blue channel, g2b in green, r2b in red
    _sub_image(b, [("lit", 255, r2b, g2b, g2r)])
    b.bw.write_bits(0, 1)
    tokens = []
    for y in range(h):
        for x in range(w):
            r, g, bl = (int(v) for v in img[y, x])
            r_res = (r - _delta(g2r, g)) & 0xFF
            b_res = (bl - _delta(g2b, g) - _delta(r2b, r)) & 0xFF
            tokens.append(("lit", 255, r_res, g, b_res))
    b.entropy_image(tokens)
    dec = decode_vp8l(b.payload())
    assert np.array_equal(dec, _rgba(img))


def test_color_indexing_with_bundling():
    """4-color palette -> 2-bit indices, 4 pixels bundled per coded
    byte; palette itself is delta-coded."""
    palette = [(255, 10, 20, 30), (255, 200, 0, 0), (255, 0, 200, 0),
               (255, 0, 0, 200)]
    w, h = 10, 2
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 4, size=(h, w))
    b = _B(w, h)
    b.bw.write_bits(1, 1)
    b.bw.write_bits(3, 2)  # COLOR_INDEXING
    b.bw.write_bits(len(palette) - 1, 8)
    # palette sub-image: entries delta-coded against the previous,
    # component-wise mod 256
    deltas = []
    prev = (0, 0, 0, 0)
    for entry in palette:
        deltas.append(
            ("lit", *((c - p) & 0xFF for c, p in zip(entry, prev)))
        )
        prev = entry
    _sub_image(b, deltas)
    b.bw.write_bits(0, 1)  # end of transforms
    # bundled image: ceil(10/4)=3 coded pixels per row, 2 bits each px
    tokens = []
    for y in range(h):
        for cx in range(3):
            packed = 0
            for k in range(4):
                x = cx * 4 + k
                if x < w:
                    packed |= int(idx[y, x]) << (2 * k)
            tokens.append(("lit", 255, 0, packed, 0))
    b.entropy_image(tokens)
    dec = decode_vp8l(b.payload())
    for y in range(h):
        for x in range(w):
            a, r, g, bl = palette[idx[y, x]]
            assert tuple(dec[y, x]) == (r, g, bl, a)


def test_meta_prefix_groups():
    """Entropy image splits the canvas into two tiles with different
    prefix groups; pixels must route to their tile's codes."""
    w, h = 8, 4  # meta_bits=2 -> 4px tiles -> 2 tiles across
    b = _B(w, h)
    b.bw.write_bits(0, 1)  # no transforms
    b.bw.write_bits(0, 1)  # no color cache
    b.bw.write_bits(1, 1)  # meta prefix image present
    b.bw.write_bits(0, 3)  # meta_bits = 2
    # entropy image 2x1: group ids in (red<<8)|green
    _sub_image(b, [("lit", 255, 0, 0, 0), ("lit", 255, 0, 1, 0)])
    # group 0 paints (255, 5, 6, 7), group 1 paints (255, 8, 9, 10):
    # five 1-symbol simple codes per group -> pixels cost ZERO bits,
    # so only correct per-tile group routing can reproduce the split
    def one_group(a, r, g, bl):
        for sym, size in ((g, 256 + 24), (r, 256), (bl, 256), (a, 256), (0, 40)):
            histo = [0] * size
            histo[sym] = 1
            _write_prefix_code(b.bw, _huff_lengths(histo))

    one_group(255, 5, 6, 7)
    one_group(255, 8, 9, 10)
    # all pixel symbols come from 1-symbol codes -> zero bits to emit
    dec = decode_vp8l(b.payload())
    assert np.array_equal(dec[:, :4], np.broadcast_to(
        np.array([5, 6, 7, 255], np.uint8), (4, 4, 4)))
    assert np.array_equal(dec[:, 4:], np.broadcast_to(
        np.array([8, 9, 10, 255], np.uint8), (4, 4, 4)))


def test_gates_and_corruption():
    with pytest.raises(ValueError):
        decode_vp8l(b"RIFFxxxxWEBP")  # no VP8L chunk
    with pytest.raises(ValueError):
        decode_vp8l(b"nonsense")
    lossy = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_vp8l(lossy)
    good = encode_vp8l(np.zeros((4, 4, 3), np.uint8))
    rng = np.random.RandomState(1)
    for _ in range(300):
        jp = bytearray(good)
        for _ in range(rng.randint(1, 5)):
            jp[rng.randint(0, len(jp))] = rng.randint(0, 256)
        if rng.rand() < 0.3:
            jp = jp[: rng.randint(1, len(jp))]
        try:
            out = decode_vp8l(bytes(jp))
            assert out.ndim == 3
        except (ValueError, NotImplementedError):
            pass
