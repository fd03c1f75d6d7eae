"""7-Zip container (functions/sevenzip.py): own-writer round-trips
(Copy and LZMA1 folders), cross-validation BOTH directions against
libarchive/bsdtar when present (solid LZMA1 archives with encoded
headers, nested dirs, unicode names, empty files), honest gates,
bomb guard, and the mutation-fuzz contract."""

from __future__ import annotations

import hashlib
import os
import random
import shutil
import subprocess

import pytest

from articulation_vector_db_api_spark.functions.sevenzip import (
    _Coder,
    _decode_coder,
    build_7z,
    parse_7z,
)

_HAS_BSDTAR = shutil.which("bsdtar") is not None

FILES = [
    ("x/a.txt", b"alpha content"),
    ("b.bin", bytes(range(256)) * 3),
    ("ué.txt", "unicodé body".encode()),
    ("empty.txt", b""),
]


def test_writer_reader_roundtrip():
    for compress in (False, True):
        arc = build_7z(FILES, compress=compress)
        assert parse_7z(arc) == FILES
    with pytest.raises(ValueError, match="at least one"):
        build_7z([])


@pytest.mark.skipif(not _HAS_BSDTAR, reason="bsdtar not installed")
def test_own_archives_readable_by_libarchive(tmp_path):
    for compress in (False, True):
        p = tmp_path / f"own_{compress}.7z"
        p.write_bytes(build_7z(FILES, compress=compress))
        for name, body in FILES:
            r = subprocess.run(
                ["bsdtar", "-xf", str(p), "-O", name],
                capture_output=True,
            )
            assert r.returncode == 0, (name, r.stderr)
            assert r.stdout == body, name


@pytest.mark.skipif(not _HAS_BSDTAR, reason="bsdtar not installed")
def test_libarchive_archives_parse(tmp_path):
    """Solid LZMA1 archives with ENCODED headers — the default
    libarchive output and the common shape in the wild."""
    random.seed(3)
    src = tmp_path / "tree"
    (src / "deep").mkdir(parents=True)
    expected = {}
    for i in range(30):
        rel = f"tree/deep/f{i:02d}.txt" if i % 2 else f"tree/f{i:02d}.txt"
        data = (f"file {i} " * random.randrange(1, 150)).encode()
        (tmp_path / rel).write_bytes(data)
        expected[rel] = data
    (src / "empty.dat").write_bytes(b"")
    expected["tree/empty.dat"] = b""
    arc = tmp_path / "ref.7z"
    r = subprocess.run(
        ["bsdtar", "-cf", str(arc), "--format", "7zip", "tree"],
        cwd=tmp_path, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    got = dict(parse_7z(arc.read_bytes()))
    for rel, data in expected.items():
        assert got.get(rel) == data, rel
    # store (Copy) variant exercises the plain-header path
    arc2 = tmp_path / "store.7z"
    subprocess.run(
        ["bsdtar", "-cf", str(arc2), "--format", "7zip",
         "--options", "7zip:compression=store", "tree"],
        cwd=tmp_path, check=True,
    )
    got2 = dict(parse_7z(arc2.read_bytes()))
    for rel, data in expected.items():
        assert got2.get(rel) == data, rel
    # deflate and bzip2 folder coders
    for opt in ("deflate", "bzip2"):
        arc3 = tmp_path / f"{opt}.7z"
        r3 = subprocess.run(
            ["bsdtar", "-cf", str(arc3), "--format", "7zip",
             "--options", f"7zip:compression={opt}", "tree"],
            cwd=tmp_path, capture_output=True,
        )
        if r3.returncode != 0:
            continue  # build without that codec
        got3 = dict(parse_7z(arc3.read_bytes()))
        for rel, data in expected.items():
            assert got3.get(rel) == data, (opt, rel)


def test_honest_gates_and_errors():
    with pytest.raises(ValueError, match="signature"):
        parse_7z(b"PK\x03\x04 not seven zip")
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(build_7z(FILES))
        bad[8] ^= 0xFF  # start header CRC
        parse_7z(bytes(bad))
    # AES and BCJ coders gate by name
    with pytest.raises(NotImplementedError, match="AES"):
        _decode_coder(
            _Coder(b"\x06\xf1\x07\x01", 1, 1, b""), b"x", 1
        )
    with pytest.raises(NotImplementedError, match="BCJ|branch"):
        _decode_coder(_Coder(b"\x04", 1, 1, b""), b"x", 1)
    # member bomb guard: declared unpack size beyond the cap
    arc = build_7z([("big.txt", b"y" * 4096)])
    with pytest.raises(ValueError, match="bound"):
        parse_7z(arc, max_member=1024)


def test_crc_verified():
    arc = bytearray(build_7z([("a.txt", b"payload to corrupt")]))
    # flip a payload byte (packed data starts at offset 32)
    arc[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_7z(bytes(arc))


def test_fuzz_contract():
    base = build_7z(
        [("doc1.txt", b"fuzz witness one " * 30),
         ("doc2.txt", b"fuzz witness two " * 20)],
        compress=True,
    )
    leaks = []
    for k in range(300):
        h = hashlib.sha256(f"7z:{k}".encode()).digest()
        pos = int.from_bytes(h[:4], "big") % len(base)
        m = bytearray(base)
        kind = h[4] % 5
        if kind == 0:
            m[pos] ^= h[5] or 1
        elif kind == 1:
            m = m[:pos]
        elif kind == 2:
            m[pos:pos] = h[5 : 5 + (h[6] % 8) + 1]
        elif kind == 3:
            m[pos : pos + 4] = h[5:9]
        else:
            bomb = (b"\xff\xff\xff\xff", b"\x7f\xff\xff\xff")[h[5] % 2]
            m[pos : pos + 4] = bomb if h[6] & 1 else bomb[::-1]
        try:
            parse_7z(bytes(m), max_member=1 << 22)
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            leaks.append((k, type(exc).__name__, str(exc)[:60]))
    assert not leaks, f"7z contract leaks: {leaks[:5]}"


def test_exploder_and_dispatch():
    from articulation_vector_db_api_spark.operators.ingest import (
        _explode_one,
        _extract_one,
    )

    arc = build_7z(
        [("a.txt", b"member text"), ("b.rtf", b"{\\rtf1 rich body}")],
        compress=True,
    )
    rows = _explode_one("corpus.7z", arc)
    assert [(r[1], r[2]) for r in rows] == [
        ("a.txt", b"member text"),
        ("b.rtf", b"{\\rtf1 rich body}"),
    ]
    assert all(r[3] is None for r in rows)
    # member-name dispatch: the rtf member extracts as rich text
    text, err = _extract_one("b.rtf", rows[1][2])
    assert err is None and text == "rich body"
    # corrupt archive isolates
    bad = _explode_one("corpus.7z", b"7z\xbc\xaf\x27\x1cgarbage")
    assert len(bad) == 1 and bad[0][3] is not None
    # rar stays honestly gated
    _t, rerr = _extract_one("old.rar", b"Rar!\x1a\x07\x00")
    assert rerr and "NotImplementedError" in rerr


def test_os_error_never_escapes():
    # defensive: truncation mid-signature and random binary noise
    for blob in (b"", b"7z", os.urandom(64), b"7z\xbc\xaf\x27\x1c"):
        with pytest.raises(ValueError):
            parse_7z(blob)


def test_review_fixes_bzip2_bomb_and_lzma2_dict():
    """r15 code-review: (a) the BZip2 coder must cap materialization
    at out_size (a bomb inflates fully under bz2.decompress); (b) the
    LZMA2 dict-size property byte must be translated, not hardcoded
    to 16 MiB (large-dictionary archives failed to decode)."""
    import bz2 as _bz2
    import lzma as _lzma

    # (a) 10 MB of zeros -> ~50 bytes compressed; ask for 64 bytes
    bomb = _bz2.compress(b"\0" * (10 << 20))
    got = _decode_coder(_Coder(b"\x04\x02\x02", 1, 1, b""), bomb, 64)
    assert got == b"\0" * 64  # capped, not 10 MB materialized
    # (b) LZMA2 with a 64 MiB dictionary and a long-range match
    payload = (b"A" * (17 << 20)) + b"UNIQUE" + (b"A" * 100) + b"UNIQUE"
    comp = _lzma.compress(
        payload, format=_lzma.FORMAT_RAW,
        filters=[{"id": _lzma.FILTER_LZMA2, "dict_size": 1 << 26}],
    )
    # props byte for 64 MiB: (2|(p&1)) << (p//2+11) == 1<<26 -> p=28
    p = 28
    assert (2 | (p & 1)) << (p // 2 + 11) == 1 << 26
    got2 = _decode_coder(
        _Coder(b"\x21", 1, 1, bytes([p])), comp, len(payload)
    )
    assert got2 == payload


def test_review_fix_missing_unpack_sizes_is_valueerror():
    """r15 code-review: a header whose UnpackInfo lacks kSize must
    raise ValueError, not IndexError."""
    from articulation_vector_db_api_spark.functions.sevenzip import (
        _Folder,
    )

    f = _Folder()
    f.coders.append(_Coder(b"\x00", 1, 1, b""))
    with pytest.raises(ValueError, match="unpack sizes"):
        f.output_size()

def test_intermediate_unpack_size_bomb_guard():
    """ADVICE r15: in a multi-coder chain the INTERMEDIATE stream
    sizes are attacker-declared and materialize in full during folder
    decode, so the bomb guard must bound every unpack_sizes entry —
    a tiny archive declaring a small FINAL size but a huge
    intermediate one must be rejected at parse time."""
    import zlib as _zlib

    from articulation_vector_db_api_spark.functions import sevenzip as sz

    blob = b"z" * 64
    h = bytearray()
    h.append(sz._K_HEADER)
    h.append(sz._K_MAIN_STREAMS)
    h.append(sz._K_PACK_INFO)
    h += sz._write_number(0)  # pack pos
    h += sz._write_number(1)  # one pack stream
    h.append(sz._K_SIZE)
    h += sz._write_number(len(blob))
    h.append(sz._K_END)
    h.append(sz._K_UNPACK_INFO)
    h.append(sz._K_FOLDER)
    h += sz._write_number(1)  # one folder
    h.append(0)  # not external
    h += sz._write_number(2)  # two chained Copy coders
    h.append(0x01)
    h += b"\x00"  # coder 0: Copy
    h.append(0x01)
    h += b"\x00"  # coder 1: Copy
    h += sz._write_number(1)  # bind pair: coder1 input 1 ...
    h += sz._write_number(0)  # ... fed by coder0 output 0
    h.append(sz._K_UNPACK_SIZES)
    h += sz._write_number(1 << 40)  # intermediate output — the bomb
    h += sz._write_number(len(blob))  # final output: tiny
    h.append(sz._K_END)  # end UnpackInfo
    h.append(sz._K_END)  # end MainStreamsInfo
    h.append(sz._K_FILES_INFO)
    h += sz._write_number(1)
    h.append(sz._K_NAME)
    name = "bomb.bin\x00".encode("utf-16-le")
    h += sz._write_number(len(name) + 1)
    h.append(0)
    h += name
    h.append(sz._K_END)
    h.append(sz._K_END)  # end Header
    header = bytes(h)
    arc = bytearray()
    arc += sz._SIGNATURE
    arc += bytes([0, 4])
    start = (
        len(blob).to_bytes(8, "little")
        + len(header).to_bytes(8, "little")
        + _zlib.crc32(header).to_bytes(4, "little")
    )
    arc += _zlib.crc32(start).to_bytes(4, "little")
    arc += start
    arc += blob
    arc += header
    with pytest.raises(ValueError, match="member size bound"):
        parse_7z(bytes(arc), max_member=1 << 22)
