"""Property-based tests (hypothesis): the SQL chunker, embedder and
fingerprint agree with their CPython reference implementations on
arbitrary inputs — not just the curated edge cases."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from articulation_vector_db_api_spark.functions.embedding import (
    EMBEDDING_DIM,
    hash_embedding_py,
)
from tests.test_chunker import reference_chunker

# printable-ish text incl. unicode, up to a few chunks long
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=3000
)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_chunker_invariants(t):
    chunks = reference_chunker(t)
    if not t:
        assert chunks == []
        return
    # chunk i is exactly the window t[800i : 800i+1000] — the identity
    # the SQL chunker (sequence + substring) reproduces index-for-index
    for i, c in enumerate(chunks):
        assert c == t[800 * i : 800 * i + 1000]
    # ordinal count matches the stride formula used by the SQL chunker
    assert len(chunks) == (len(t) - 1) // 800 + 1
    # full coverage: windows reach the end of the text
    assert 800 * (len(chunks) - 1) < len(t) <= 800 * (len(chunks) - 1) + 1000


@given(texts)
@settings(max_examples=100, deadline=None)
def test_embedding_invariants(t):
    v = hash_embedding_py(t)
    digest = hashlib.sha256(t.encode("utf-8")).digest()
    assert len(v) == EMBEDDING_DIM
    assert v == [digest[i % 32] / 255 * 2 - 1 for i in range(EMBEDDING_DIM)]
    assert all(-1.0 <= x <= 1.0 for x in v)
    assert v[:32] * 32 == v


@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=500))
@settings(max_examples=100, deadline=None)
def test_rolling_hash_python_twin(t):
    """The Rabin-Karp SQL expression's Python twin: base-31 fold mod
    2^31-1 over code points (matches suites/textops.py)."""
    acc = 0
    for ch in t:
        acc = (acc * 31 + ord(ch)) % 2147483647
    assert 0 <= acc < 2147483647
    # determinism + prefix sensitivity
    acc2 = 0
    for ch in t:
        acc2 = (acc2 * 31 + ord(ch)) % 2147483647
    assert acc == acc2


def _reference_token_windows(text: str, w: int = 128, s: int = 96):
    """CPython twin of chunk_tokens_window (suites/textops.py): split
    on runs of whitespace after trim, then overlapping w-token windows
    at stride s, tail windows short but never dropped."""
    import re

    t = text.strip()
    if not t:
        return []
    toks = re.split(r"\s+", t)
    out = []
    start = 0  # 0-based; the SQL twin is 1-based
    while start < len(toks):
        out.append(toks[start : start + w])
        start += s
    return out


@given(texts)
@settings(max_examples=150, deadline=None)
def test_token_window_invariants(t):
    wins = _reference_token_windows(t)
    if not t.strip():
        assert wins == []
        return
    import re

    toks = re.split(r"\s+", t.strip())
    # count matches the stride formula the SQL generate_series encodes
    assert len(wins) == (len(toks) - 1) // 96 + 1
    # every window is the exact slice; only the tail may be short
    for i, win in enumerate(wins):
        assert win == toks[96 * i : 96 * i + 128]
        if i < len(wins) - 1:
            assert len(win) == 128 or 96 * i + 128 > len(toks)
    # 32-token overlap: consecutive windows share exactly the suffix
    for a, b in zip(wins, wins[1:]):
        if len(a) == 128:
            assert a[96:] == b[: len(a) - 96]
    # coverage: every token index lands in at least one window
    covered = set()
    for i, win in enumerate(wins):
        covered.update(range(96 * i, 96 * i + len(win)))
    assert covered == set(range(len(toks)))


# --- r7 codec properties ---------------------------------------------------

import numpy as np
from hypothesis import strategies as _st


@given(
    _st.integers(1, 4), _st.integers(1, 4), _st.integers(0, 2 ** 32 - 1)
)
@settings(max_examples=60, deadline=None)
def test_jpeg_constant_blocks_always_exact(bh, bw, seed):
    """ANY constant-8x8-block image is bit-exact through baseline AND
    progressive JPEG under the all-ones table — the invariant the
    multimodal_jpeg_roundtrip oracle rests on."""
    from articulation_vector_db_api_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed % (2 ** 31))
    blocks = rng.randint(0, 256, size=(bh, bw), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    for enc in (encode_jpeg_baseline, encode_jpeg_progressive):
        dec = decode_jpeg(enc(img, quality=100))
        assert np.array_equal(dec[:, :, 0], img)


@given(
    _st.integers(1, 40),
    _st.integers(1, 40),
    _st.sampled_from([1, 3, 4]),
    _st.integers(0, 2 ** 32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_vp8l_lossless_any_image(h, w, ch, seed):
    """VP8L is lossless: EVERY image of every shape must roundtrip
    bit-exactly — no tolerance, no content restriction."""
    from articulation_vector_db_api_spark.functions.vp8l import (
        decode_vp8l,
        encode_vp8l,
    )

    rng = np.random.RandomState(seed % (2 ** 31))
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    dec = decode_vp8l(encode_vp8l(img))
    if ch == 1:
        assert np.array_equal(dec[:, :, 0], img)
        assert np.array_equal(dec[:, :, 1], img)  # gray replicates
    elif ch == 3:
        assert np.array_equal(dec[:, :, :3], img)
        assert (dec[:, :, 3] == 255).all()
    else:
        assert np.array_equal(dec, img)


@given(
    _st.lists(
        _st.tuples(
            _st.integers(-(2 ** 62), 2 ** 62),
            _st.one_of(_st.none(), _st.text(max_size=20)),
            _st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        max_size=60,
    ),
    _st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=60, deadline=None)
def test_avro_container_roundtrip_any_rows(rows, codec):
    """The Avro container must reproduce arbitrary (long, null|string,
    double) rows exactly through varints, unions, and both codecs."""
    import json
    import tempfile

    from articulation_vector_db_api_spark.sources.avro import (
        block_offsets,
        read_block,
        write_container,
    )

    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [
            {"name": "v", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
        ]}
    )
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/t.avro"
        write_container(p, schema, rows, codec=codec, records_per_block=16)
        got = [r for off, _ in block_offsets(p) for r in read_block(p, off)]
    assert got == rows


@given(
    rows=_st.lists(
        _st.binary(min_size=1, max_size=400), min_size=1, max_size=6
    )
)
@settings(max_examples=40, deadline=None)
def test_packbits_roundtrip_any_rows(rows):
    from articulation_vector_db_api_spark.functions.tiff import (
        _packbits_decode,
        _packbits_encode_row,
    )

    for row in rows:
        assert _packbits_decode(_packbits_encode_row(row), len(row)) == row


@given(data=_st.binary(min_size=0, max_size=3000))
@settings(max_examples=40, deadline=None)
def test_tiff_lzw_roundtrip_any_bytes(data):
    from articulation_vector_db_api_spark.functions.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data


@given(
    n=_st.integers(min_value=1, max_value=700),
    seed=_st.integers(min_value=0, max_value=2**31),
    stereo=_st.booleans(),
    mid_side=_st.booleans(),
    block=_st.sampled_from([16, 100, 192, 256, 4096]),
)
@settings(max_examples=25, deadline=None)
def test_flac_lossless_any_signal(n, seed, stereo, mid_side, block):
    from articulation_vector_db_api_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    s = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
    kw = {"stereo_mode": "mid-side"} if (stereo and mid_side) else {}
    rate, dec = decode_flac(encode_flac(s, block_size=block, **kw))
    want = s if s.ndim == 2 else s[:, None]
    assert np.array_equal(dec, want)


@given(v=_st.integers(min_value=0, max_value=2**36 - 1))
@settings(max_examples=60, deadline=None)
def test_flac_coded_number_roundtrip_any(v):
    from articulation_vector_db_api_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _coded_number_decode,
        _coded_number_encode,
    )

    w = _BitWriter()
    for byte in _coded_number_encode(v):
        w.write(byte, 8)
    assert _coded_number_decode(_BitReader(w.bytes())) == v
