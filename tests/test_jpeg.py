"""JPEG codec (functions/jpeg.py): the lossy paths that the
hash-exact multimodal_jpeg_roundtrip query cannot cover by design.

The query proves the DC/Huffman/zigzag/marker machinery bit-exactly on
constant-block images; these tests bound the AC path (full DCT both
directions), chroma subsampling, restart markers, and the gates — and
prove the PROGRESSIVE decoder by the strongest available equivalence:
progressive and baseline encode the same quantized coefficients, so
their decoded pixels must match bit-for-bit."""

from __future__ import annotations

import numpy as np
import pytest

from articulation_vector_db_api_spark.functions.jpeg import (
    decode_jpeg,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
    quant_table,
)


def _gray(rng, h, w):
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


def test_constant_blocks_exact_q100():
    """Constant 8x8 blocks have a single integer DC coefficient under
    the all-ones table -> the full encode+decode chain is bit-exact."""
    rng = np.random.RandomState(11)
    blocks = rng.randint(0, 256, size=(5, 7), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert dec.shape == (40, 56, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_arbitrary_gray_q100_within_rounding():
    """q=1 quantization only rounds DCT coefficients to integers; the
    reconstruction error of uint8 content is bounded by +-1."""
    rng = np.random.RandomState(3)
    img = _gray(rng, 25, 19)  # non-multiple-of-8 dims exercise padding
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert dec.shape == (25, 19, 1)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_rgb_444_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=100))
    assert dec.shape == (17, 23, 3)
    # +-1 DCT rounding per plane, ~x2 through the color transforms
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def _smooth_rgb(h=29, w=37):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    base = np.sin(x / 9) * 40 + np.cos(y / 11) * 40 + 128
    return np.stack([base, base * 0.8 + 20, 255 - base], axis=-1).astype(
        np.uint8
    )


@pytest.mark.parametrize("subsample", ["420", "422"])
def test_chroma_subsampled_decode(subsample):
    """4:2:0 / 4:2:2 exercise multi-block MCUs and the decoder's
    replicate-upsample; error is bounded by the chroma box filter on
    smooth content."""
    img = _smooth_rgb()
    dec = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quality=95, subsample=subsample)
    )
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_restart_markers():
    """DRI/RSTn: predictors reset and bits re-align at every interval;
    constant-block content must stay bit-exact across restarts."""
    rng = np.random.RandomState(7)
    blocks = rng.randint(0, 256, size=(4, 8), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quality=100, restart_interval=2)
    )
    assert np.array_equal(dec[:, :, 0], img)
    arb = _gray(rng, 25, 19)
    dec2 = decode_jpeg_baseline(
        encode_jpeg_baseline(arb, quality=100, restart_interval=3)
    )
    assert np.abs(dec2[:, :, 0].astype(int) - arb.astype(int)).max() <= 1


def test_quality_curve_monotone_size():
    """Lower quality -> coarser table -> smaller file, bounded error
    that shrinks as quality rises (sanity of the Annex K scaling)."""
    img = _smooth_rgb(32, 32)
    sizes, errs = [], []
    for q in (30, 60, 90):
        b = encode_jpeg_baseline(img, quality=q)
        dec = decode_jpeg_baseline(b)
        sizes.append(len(b))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).max())
    assert sizes[0] < sizes[2]
    assert errs[0] >= errs[2]
    assert quant_table(100).max() == 1  # the near-lossless table
    assert quant_table(50).tolist() == quant_table(50).tolist()


def test_progressive_equals_baseline_gray():
    """Progressive decode == baseline decode, bit for bit: both encode
    the SAME quantized coefficients, so any progressive-path bug (DC
    successive approximation, spectral bands, EOBRUN, refinement
    correction bits) breaks the equality."""
    rng = np.random.RandomState(13)
    for q in (100, 75, 30):
        img = _gray(rng, 25, 19)
        pb = decode_jpeg(encode_jpeg_baseline(img, quality=q))
        pp = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(pb, pp), f"gray q={q}"
    # constant blocks stay bit-exact through the progressive path too
    blocks = rng.randint(0, 256, size=(3, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg_progressive(img, quality=100))
    assert np.array_equal(dec[:, :, 0], img)


@pytest.mark.parametrize("subsample", ["444", "422", "420"])
def test_progressive_equals_baseline_color(subsample):
    """Color progressive: interleaved DC scan + non-interleaved
    per-component AC bands over subsampled grids."""
    rng = np.random.RandomState(17)
    for q in (90, 50):
        img = rng.randint(0, 256, size=(29, 37, 3), dtype=np.uint8)
        pb = decode_jpeg(encode_jpeg_baseline(img, q, subsample=subsample))
        pp = decode_jpeg(encode_jpeg_progressive(img, q, subsample=subsample))
        assert np.array_equal(pb, pp), f"{subsample} q={q}"


def test_arithmetic_coding_gated():
    """SOF9 (arithmetic) raises NotImplementedError (honest gate)."""
    img = _gray(np.random.RandomState(1), 16, 16)
    jp = bytearray(encode_jpeg_baseline(img, quality=100))
    idx = jp.find(b"\xff\xc0")
    jp[idx + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_baseline(bytes(jp))


def test_invalid_progressive_scan_band():
    """A baseline stream relabeled SOF2 carries an Ss=0,Se=63 scan —
    illegal in progressive (G.1) and rejected as malformed, never
    silently half-decoded."""
    img = _gray(np.random.RandomState(1), 16, 16)
    jp = bytearray(encode_jpeg_baseline(img, quality=100))
    idx = jp.find(b"\xff\xc0")
    jp[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="scan band"):
        decode_jpeg_baseline(bytes(jp))


def test_corrupt_stream_value_error():
    """Exception contract: malformed streams raise ValueError only."""
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\xff\xd8\xff\xdb\x00\x05abc")
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    img = _gray(np.random.RandomState(2), 16, 16)
    jp = bytearray(encode_jpeg_baseline(img, quality=100))
    truncated = bytes(jp[: len(jp) // 2])
    with pytest.raises(ValueError):
        decode_jpeg_baseline(truncated)


def test_dispatch_via_decode_pixels():
    """decode_pixels routes FFD8 payloads to the JPEG decoder, so the
    whole multimodal stats stack picks JPEG up with no other change."""
    from articulation_vector_db_api_spark.functions.pixels import (
        decode_pixels,
    )

    rng = np.random.RandomState(9)
    blocks = rng.randint(0, 256, size=(2, 2), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    px = decode_pixels(encode_jpeg_baseline(img, quality=100))
    assert np.array_equal(px[:, :, 0], img)


def test_fuzz_exception_contract():
    """Per-row fault isolation depends on decode raising ONLY
    ValueError / NotImplementedError on arbitrary corruption: mutate
    and truncate valid streams at random offsets and require every
    failure to stay inside the contract (success is fine — many flips
    only perturb pixel data)."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    streams = [
        encode_jpeg_baseline(img, quality=75, subsample="420"),
        encode_jpeg_progressive(img, quality=75),
    ]
    for base in streams:
        for _ in range(120):
            jp = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                jp[rng.randint(0, len(jp))] = rng.randint(0, 256)
            if rng.rand() < 0.3:
                jp = jp[: rng.randint(2, len(jp))]
            try:
                out = decode_jpeg(bytes(jp))
                assert isinstance(out, np.ndarray)
            except (ValueError, NotImplementedError):
                pass  # the contract: nothing else may escape
