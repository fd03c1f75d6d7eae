"""RFC 8878 zstd decoder: round-trips against the REFERENCE encoder
(pyarrow's bundled libzstd — guaranteed in-container — plus the zstd
CLI when present), the from-scratch raw-frame witness builder, XXH64
checksum vectors pinned from the reference encoder's own output,
RFC 8878 §5 dictionaries (trained and raw-content), and the honest
gates (legacy magics)."""

from __future__ import annotations

import hashlib
import os
import random
import shutil
import subprocess

import pytest

from articulation_vector_db_api_spark.functions.zstd import (
    build_zstd_frames,
    decompress_zstd,
    xxh64,
)

_HAS_CLI = shutil.which("zstd") is not None


def _ref_compress(payload: bytes, level: int = 3) -> bytes:
    import pyarrow as pa

    return pa.Codec("zstd", compression_level=level).compress(
        payload
    ).to_pybytes()


def _cli_compress(payload: bytes, *args: str) -> bytes:
    p = subprocess.run(
        ["zstd", "-c", *args], input=payload, capture_output=True
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_raw_frame_builder_roundtrip():
    for payload in [b"", b"a", b"hello" * 1000, os.urandom(200_000)]:
        frame = build_zstd_frames(payload)
        assert decompress_zstd(frame) == payload


@pytest.mark.skipif(not _HAS_CLI, reason="zstd CLI not installed")
def test_raw_frame_accepted_by_reference_decoder():
    payload = b"cross check payload " * 50
    p = subprocess.run(
        ["zstd", "-d", "-c"],
        input=build_zstd_frames(payload),
        capture_output=True,
    )
    assert p.returncode == 0 and p.stdout == payload, p.stderr


def test_reference_frames_decode():
    """pyarrow-libzstd frames across payload shapes and levels —
    exercises Huffman literals (1- and 4-stream), FSE-compressed and
    predefined sequence tables, RLE and raw blocks."""
    random.seed(11)
    payloads = [
        b"hello world " * 500,           # single seq, predefined tables
        bytes(range(256)) * 100,          # long match, large offset
        os.urandom(5000),                 # incompressible -> raw block
        b"a" * 100_000,                   # RLE-ish
        (b"lorem ipsum dolor sit amet " * 4000),
        bytes(random.randrange(8) for _ in range(60_000)),
    ]
    for level in (1, 3, 9, 19):
        for payload in payloads:
            comp = _ref_compress(payload, level)
            assert decompress_zstd(comp) == payload


@pytest.mark.skipif(not _HAS_CLI, reason="zstd CLI not installed")
def test_cli_frames_with_checksum_decode():
    texts = [
        b"the quick brown fox jumps over the lazy dog\n" * 2000,
        open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md"),
             "rb").read(),
    ]
    for lvl in ("-1", "-5", "-19"):
        for t in texts:
            assert decompress_zstd(_cli_compress(t, lvl)) == t
    # long-distance matching and ultra levels
    long = (b"ABCDEFGH" * 100_000) + os.urandom(1000) + (
        b"ABCDEFGH" * 100_000
    )
    for args in (("--ultra", "-22"), ("--long=27", "-12")):
        assert decompress_zstd(_cli_compress(long, *args)) == long


def test_multi_frame_and_skippable():
    a = _ref_compress(b"frame one ")
    b = _ref_compress(b"frame two")
    skip = (
        (0x184D2A50).to_bytes(4, "little")
        + (5).to_bytes(4, "little")
        + b"XXXXX"
    )
    assert decompress_zstd(a + skip + b) == b"frame one frame two"
    with pytest.raises(ValueError, match="only skippable"):
        decompress_zstd(skip)


def test_xxh64_reference_vectors():
    """Full-width digests pinned from the reference encoder's content
    checksums (low 32 bits ride in every checksummed frame)."""
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"zstd ingest witness") == 0xECD180CE5D243DD6
    assert xxh64(b"a" * 1000) == 0x56E43B712EDA4223


def test_checksum_verified():
    frame = bytearray(build_zstd_frames(b"checksummed payload"))
    assert decompress_zstd(bytes(frame)) == b"checksummed payload"
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum mismatch"):
        decompress_zstd(bytes(frame))


def test_honest_gates():
    # dictionary frame: descriptor with Dictionary_ID_flag=1 — needs
    # a dictionary= argument (r15: dictionaries supported, no longer
    # a NotImplementedError gate)
    magic = (0xFD2FB528).to_bytes(4, "little")
    # descriptor 0x21: single-segment, Dictionary_ID_flag=1; dict id
    # byte 0x01 (non-zero) then the 1-byte frame content size
    frame = magic + bytes([0x21, 0x01, 0x07]) + b"\x00\x00\x00"
    with pytest.raises(ValueError, match="requires dictionary 1"):
        decompress_zstd(frame)
    with pytest.raises(NotImplementedError, match="legacy"):
        decompress_zstd((0xFD2FB525).to_bytes(4, "little") + b"\x00" * 8)
    with pytest.raises(ValueError, match="not a zstd frame"):
        decompress_zstd(b"\x00\x11\x22\x33rest")
    with pytest.raises(ValueError, match="empty"):
        decompress_zstd(b"")


def test_output_bound_enforced():
    payload = b"x" * 100_000
    comp = _ref_compress(payload)
    with pytest.raises(ValueError, match="bound|exceeds"):
        decompress_zstd(comp, max_output=50_000)
    assert decompress_zstd(comp, max_output=100_000) == payload


def test_fuzz_contract():
    """Mutation fuzz mirrors tests/test_fuzz_contracts.py: the decoder
    must raise ONLY ValueError/NotImplementedError (or succeed) on
    corrupted input — never IndexError/KeyError/OverflowError/hangs."""
    base = _ref_compress(
        b"The zstd witness payload repeats. " * 300, 3
    )
    leaks = []
    for k in range(300):
        h = hashlib.sha256(f"zstd:{k}".encode()).digest()
        pos = int.from_bytes(h[:4], "big") % len(base)
        kind = h[4] % 5
        m = bytearray(base)
        if kind == 0:
            m[pos] ^= h[5] or 1
        elif kind == 1:
            m = m[:pos]
        elif kind == 2:
            m[pos:pos] = h[5 : 5 + (h[6] % 8) + 1]
        elif kind == 3:
            m[pos : pos + 4] = h[5:9]
        else:
            bomb = (b"\xff\xff\xff\xff", b"\x7f\xff\xff\xff",
                    b"\x00\xff\xff\xff")[h[5] % 3]
            m[pos : pos + 4] = bomb if h[6] & 1 else bomb[::-1]
        try:
            decompress_zstd(bytes(m), max_output=1 << 24)
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append((k, type(exc).__name__, str(exc)[:60]))
    assert not leaks, f"zstd contract leaks: {leaks[:5]}"


def test_randomized_roundtrips():
    random.seed(99)
    words = [b"spark", b"zstd", b"frame", b"the", b"query ", b"\n"]
    for trial in range(25):
        n = random.randrange(0, 40_000)
        kind = trial % 4
        if kind == 0:
            payload = os.urandom(n)
        elif kind == 1:
            payload = bytes(random.randrange(8) for _ in range(n))
        elif kind == 2:
            payload = (b"lorem ipsum dolor sit amet " * (n // 27 + 1))[:n]
        else:
            payload = b"".join(
                random.choice(words) for _ in range(n // 5)
            )
        level = random.choice([1, 3, 7, 19])
        assert decompress_zstd(_ref_compress(payload, level)) == payload


def test_ingest_dispatch_zst():
    """The .zst ingest seam: transparent member decompression with
    inner-extension re-dispatch, the .tar.zst exploder path, and the
    fault boundary (corrupt member -> error row, never an exception)."""
    import io
    import tarfile

    from articulation_vector_db_api_spark.operators.ingest import (
        _explode_one,
        _extract_one,
    )

    text = "zstd dispatch witness\nsecond line"
    comp = _ref_compress(text.encode())
    got, err = _extract_one("doc.txt.zst", comp)
    assert err is None and got == text
    # inner-extension re-dispatch: .html.zst strips boilerplate
    html = "<html><title>T</title><body><p>para</p></body></html>"
    got2, err2 = _extract_one("page.html.zst", _ref_compress(html.encode()))
    assert err2 is None and "para" in got2
    # fault boundary: truncated frame -> error row
    got3, err3 = _extract_one("doc.txt.zst", comp[:-2])
    assert got3 is None and err3
    # .tar.zst fans out through the exploder
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        info = tarfile.TarInfo("m.txt")
        data = text.encode()
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    rows = _explode_one("corpus.tar.zst", _ref_compress(buf.getvalue()))
    assert len(rows) == 1 and rows[0][1] == "m.txt" and rows[0][3] is None
    # corrupt .tar.zst isolates
    bad = _explode_one("corpus.tar.zst", b"\x28\xb5\x2f\xfd junk")
    assert len(bad) == 1 and bad[0][3] is not None


def test_fast_path_equals_reference():
    """decompress_zstd_fast (libzstd via pyarrow) must agree byte-
    for-byte with the from-scratch reference decoder on every fixture
    shape, enforce the same expansion bound, and fall back to the
    reference decoder's precise errors on rejects."""
    import random as _random

    from articulation_vector_db_api_spark.functions.zstd import (
        decompress_zstd_fast,
    )

    _random.seed(5)
    payloads = [
        b"",  # empty payload frame
        b"fast path witness " * 1000,
        os.urandom(20_000),
        bytes(_random.randrange(8) for _ in range(30_000)),
    ]
    for payload in payloads:
        comp = _ref_compress(payload)
        assert decompress_zstd_fast(comp) == decompress_zstd(comp) == payload
    # multi-frame + skippable through both paths
    skip = (
        (0x184D2A50).to_bytes(4, "little")
        + (4).to_bytes(4, "little") + b"meta"
    )
    two = _ref_compress(b"one ") + skip + build_zstd_frames(b"two")
    assert decompress_zstd_fast(two) == decompress_zstd(two) == b"one two"
    # bound enforced on the streaming read
    big = _ref_compress(b"x" * 100_000)
    with pytest.raises(ValueError, match="bound|exceeds"):
        decompress_zstd_fast(big, max_output=50_000)
    # rejects route through the reference decoder's named errors
    with pytest.raises(ValueError, match="not a zstd frame"):
        decompress_zstd_fast(b"\x00\x11\x22\x33rest")
    with pytest.raises(NotImplementedError, match="legacy"):
        decompress_zstd_fast(
            (0xFD2FB525).to_bytes(4, "little") + b"\x00" * 8
        )
    with pytest.raises(ValueError, match="only skippable"):
        decompress_zstd_fast(skip)


@pytest.mark.skipif(not _HAS_CLI, reason="zstd CLI not installed")
def test_trained_dictionary_roundtrip(tmp_path):
    """RFC 8878 §5 structured dictionaries, validated against the
    reference trainer: entropy tables preload Repeat mode, the three
    recent offsets seed the history, and the content is a virtual
    window prefix."""
    import random as _random

    from articulation_vector_db_api_spark.functions.zstd import (
        decompress_zstd_fast,
        parse_zstd_dictionary,
    )

    _random.seed(13)
    words = ["alpha", "beta", "gamma", "delta", "request", "response"]
    samples = []
    for i in range(120):
        body = '{"id": %d, "kind": "%s", "payload": "%s"}' % (
            i,
            _random.choice(words),
            " ".join(_random.choice(words) for _ in range(30)),
        )
        p = tmp_path / f"s{i}.json"
        p.write_text(body)
        samples.append(str(p))
    dict_path = tmp_path / "trained.dict"
    r = subprocess.run(
        ["zstd", "--train", *samples, "-o", str(dict_path),
         "--maxdict=4096"],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    blob = dict_path.read_bytes()
    d = parse_zstd_dictionary(blob)
    assert d.dict_id != 0 and len(d.content) > 0
    for i in (0, 7, 63):
        payload = open(samples[i], "rb").read()
        for lvl in ("-1", "-19"):
            comp = subprocess.run(
                ["zstd", lvl, "-D", str(dict_path), "-c"],
                input=payload, capture_output=True,
            ).stdout
            assert decompress_zstd(comp, dictionary=d) == payload
            # bytes accepted directly; fast path routes to reference
            assert decompress_zstd(comp, dictionary=blob) == payload
            assert decompress_zstd_fast(comp, dictionary=d) == payload
    # the frame names the dictionary it needs
    comp = subprocess.run(
        ["zstd", "-3", "-D", str(dict_path), "-c"],
        input=b"payload", capture_output=True,
    ).stdout
    with pytest.raises(ValueError, match="requires dictionary"):
        decompress_zstd(comp)
    # mismatched structured dictionary is rejected by id
    other = bytearray(blob)
    other[4] ^= 0xFF  # different dict_id, same tables
    with pytest.raises(ValueError, match="mismatch"):
        decompress_zstd(comp, dictionary=bytes(other))


@pytest.mark.skipif(not _HAS_CLI, reason="zstd CLI not installed")
def test_raw_content_dictionary(tmp_path):
    """A blob without the dictionary magic is a raw-content
    dictionary (§5 final paragraph): pure window prefix."""
    raw = b"the quick brown fox jumps over the lazy dog " * 20
    p = tmp_path / "raw.dict"
    p.write_bytes(raw)
    payload = b"the quick brown fox jumps over the lazy dog AND MORE"
    comp = subprocess.run(
        ["zstd", "-19", "-D", str(p), "-c"],
        input=payload, capture_output=True,
    ).stdout
    assert decompress_zstd(comp, dictionary=raw) == payload
    # without the dictionary the prefix matches dangle: clear error
    with pytest.raises(ValueError, match="window|dictionary"):
        decompress_zstd(comp)


def test_jsonl_zst_dispatch_extracts_text_fields():
    """The full Dolma-shape path: .jsonl.zst -> decompress -> JSONL
    record text extraction (one record per paragraph; 'text',
    RedPajama's 'raw_content', and 'content' fields recognized) —
    raw decode would ingest JSON syntax as document text."""
    import json

    from articulation_vector_db_api_spark.operators.ingest import (
        _extract_one,
    )

    recs = [
        {"id": 1, "text": "first document body", "meta": {"x": 1}},
        {"id": 2, "raw_content": "second via raw_content"},
        {"id": 3, "content": "third via content"},
    ]
    jsonl = "\n".join(json.dumps(r) for r in recs).encode()
    got, err = _extract_one("shard.jsonl.zst", _ref_compress(jsonl))
    assert err is None
    assert got == (
        "first document body\n\nsecond via raw_content\n\n"
        "third via content"
    )
    assert "{" not in got  # no JSON syntax leaked
    # a record without any text field is an error row, not raw text
    bad = json.dumps({"id": 4, "nothing": True}).encode()
    got2, err2 = _extract_one("shard.jsonl.zst", _ref_compress(bad))
    assert got2 is None and "no text" in err2
    # plain .jsonl (uncompressed) takes the same path
    got3, err3 = _extract_one("shard.jsonl", jsonl)
    assert err3 is None and got3 == got


def test_end_to_end_dolma_shard_ingest(spark, tmp_path):
    """Integration: a directory of .jsonl.zst shards (the Dolma/
    RedPajama distribution shape) through the REAL ingest pipeline —
    binaryFile scan -> zstd decompress -> JSONL text extraction ->
    chunk -> embed -> partitioned table -> search."""
    import json

    from articulation_vector_db_api_spark.operators.ingest import (
        ingest_corpus,
    )
    from articulation_vector_db_api_spark.operators.search import (
        topk_search_indexed,
    )

    corpus = tmp_path / "shards"
    corpus.mkdir()
    for s in range(3):
        recs = [
            {
                "id": f"{s}-{i}",
                "text": (
                    f"shard {s} document {i}: the articulated corpus "
                    "pipeline ingests compressed shards end to end. "
                ) * 8,
                "meta": {"source": "witness"},
            }
            for i in range(4)
        ]
        jsonl = "\n".join(json.dumps(r) for r in recs).encode()
        (corpus / f"shard-{s:04d}.jsonl.zst").write_bytes(
            _ref_compress(jsonl)
        )
    # one corrupt shard must isolate, not fail the batch
    (corpus / "shard-bad.jsonl.zst").write_bytes(b"\x28\xb5\x2f\xfdxx")

    table = str(tmp_path / "chunks")
    result = ingest_corpus(spark, str(corpus), table, "*.jsonl.zst")
    assert result["files_processed"] == 3
    assert result["files_failed"] == 1
    assert result["ingested_count"] > 0

    rows = topk_search_indexed(
        spark, table, "compressed shards pipeline", 3
    ).collect()
    assert len(rows) == 3
    assert all("shard" in r.text for r in rows)


@pytest.mark.skipif(not _HAS_CLI, reason="zstd CLI not installed")
def test_fuzz_contract_dictionary(tmp_path):
    """Mutations of a trained dictionary (and of a dictionary frame
    decoded WITH that dictionary) keep the ValueError-only contract."""
    import random as _random

    from articulation_vector_db_api_spark.functions.zstd import (
        parse_zstd_dictionary,
    )

    _random.seed(21)
    samples = []
    for i in range(80):
        p = tmp_path / f"s{i}.txt"
        p.write_text(
            " ".join(
                _random.choice(["status", "zstd", "request", "frame"])
                for _ in range(40)
            )
        )
        samples.append(str(p))
    dict_path = tmp_path / "d.dict"
    r = subprocess.run(
        ["zstd", "--train", *samples, "-o", str(dict_path),
         "--maxdict=2048"],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    blob = dict_path.read_bytes()
    payload = open(samples[0], "rb").read()
    frame = subprocess.run(
        ["zstd", "-3", "-D", str(dict_path), "-c"],
        input=payload, capture_output=True,
    ).stdout
    good_dict = parse_zstd_dictionary(blob)
    leaks = []
    for k in range(200):
        h = hashlib.sha256(f"zdict:{k}".encode()).digest()
        target = blob if k % 2 == 0 else frame
        pos = int.from_bytes(h[:4], "big") % len(target)
        m = bytearray(target)
        kind = h[4] % 4
        if kind == 0:
            m[pos] ^= h[5] or 1
        elif kind == 1:
            m = m[:pos]
        elif kind == 2:
            m[pos:pos] = h[5 : 5 + (h[6] % 8) + 1]
        else:
            m[pos : pos + 4] = h[5:9]
        try:
            if k % 2 == 0:
                d = parse_zstd_dictionary(bytes(m))
                decompress_zstd(frame, max_output=1 << 22, dictionary=d)
            else:
                decompress_zstd(
                    bytes(m), max_output=1 << 22, dictionary=good_dict
                )
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append((k, type(exc).__name__, str(exc)[:60]))
    assert not leaks, f"dictionary contract leaks: {leaks[:5]}"
