"""7-Zip archive reading — the .7z container format from the public
7zFormat.txt specification, with the codecs supplied by the stdlib
(lzma for LZMA1/LZMA2, bz2, zlib for Deflate and CRC-32). This closes
the ingest dispatch's former "7z not in the stdlib" gate: the stdlib
lacks the CONTAINER, not the codecs, and the container is a
well-specified property-tag tree.

Surface:
- signature + start header, encoded (LZMA-compressed) OR plain
  next-headers,
- streams info: PackInfo / UnpackInfo (folders with coder chains
  joined by bind pairs) / SubStreamsInfo (solid folders holding many
  files),
- coders: Copy (0x00), LZMA1 (0x030101), LZMA2 (0x21), BZip2
  (0x040202), Deflate (0x040108), Delta (0x03); chains are evaluated
  in bind order,
- FilesInfo: empty-stream/empty-file bits, UTF-16LE names,
  skip-with-size property blocks,
- CRC-32 verification of every unpacked substream that declares one.

Honest gates (named errors): AES-encrypted folders (coder
0x06F10701), BCJ/branch filters (x86 0x04 / 0x0303xxxx family — the
filter tables aren't in the stdlib), and external (out-of-archive)
streams.

A deterministic from-scratch WRITER (``build_7z``) emits one folder
per file with the Copy or LZMA1 coder — the witness side for
registered queries, with bsdtar/libarchive as the cross-validation
encoder in tests.

ValueError for malformed archives (the per-file fault boundary in
operators/ingest.py catches it).

Reference behavior parity: extends the reference's single-format
ingestion domain (/root/reference/main.py:258-296) at the archive
tier, beside tar/zip in ``explode_archives``.
"""

from __future__ import annotations

import bz2
import lzma
import zlib

__all__ = ["parse_7z", "build_7z"]

_SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_ANTI = 0x10
_K_NAME = 0x11
_K_WIN_ATTRS = 0x15
_K_ENCODED_HEADER = 0x17
_K_DUMMY = 0x19


class _Reader:
    __slots__ = ("d", "i")

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos

    def byte(self) -> int:
        if self.i >= len(self.d):
            raise ValueError("7z header truncated")
        b = self.d[self.i]
        self.i += 1
        return b

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.d):
            raise ValueError("7z header truncated")
        out = self.d[self.i : self.i + n]
        self.i += n
        return out

    def number(self) -> int:
        """7z variable-length number: the count of leading 1 bits in
        the first byte is the count of little-endian extra bytes; the
        first byte's remaining low bits are the HIGH part."""
        first = self.byte()
        mask = 0x80
        value = 0
        for k in range(8):
            if not first & mask:
                value |= (first & (mask - 1)) << (8 * k)
                return value
            value |= self.byte() << (8 * k)
            mask >>= 1
        return value

    def bits(self, n: int) -> list[bool]:
        out: list[bool] = []
        b = 0
        have = 0
        for _ in range(n):
            if not have:
                b = self.byte()
                have = 8
            out.append(bool(b & 0x80))
            b = (b << 1) & 0xFF
            have -= 1
        return out

    def bits_all_defined(self, n: int) -> list[bool]:
        if self.byte():  # allAreDefined
            return [True] * n
        return self.bits(n)


class _Coder:
    __slots__ = ("cid", "nin", "nout", "props")

    def __init__(self, cid: bytes, nin: int, nout: int, props: bytes):
        self.cid = cid
        self.nin = nin
        self.nout = nout
        self.props = props


class _Folder:
    __slots__ = ("coders", "bind_pairs", "packed_indices", "unpack_sizes",
                 "crc", "num_substreams", "sub_sizes", "sub_crcs")

    def __init__(self):
        self.coders: list[_Coder] = []
        self.bind_pairs: list[tuple[int, int]] = []
        self.packed_indices: list[int] = []
        self.unpack_sizes: list[int] = []
        self.crc: int | None = None
        self.num_substreams = 1
        self.sub_sizes: list[int] = []
        self.sub_crcs: list[int | None] = []

    def output_size(self) -> int:
        """The folder's final output = the out-stream no bind pair
        consumes."""
        total_out = sum(c.nout for c in self.coders)
        if len(self.unpack_sizes) != total_out:
            raise ValueError(
                "7z folder unpack sizes missing or mismatched"
            )
        bound = {out for _in, out in self.bind_pairs}
        at = 0
        for ci, c in enumerate(self.coders):
            for k in range(c.nout):
                if at + k not in bound:
                    return self.unpack_sizes[at + k]
            at += c.nout
        raise ValueError("7z folder with no unbound output")


def _decode_coder(coder: _Coder, data: bytes, out_size: int) -> bytes:
    cid = coder.cid
    if cid == b"\x00":  # Copy
        if len(data) < out_size:
            raise ValueError("7z Copy coder input too short")
        return data[:out_size]
    if cid == b"\x03\x01\x01":  # LZMA1
        if len(coder.props) != 5:
            raise ValueError("7z LZMA1 coder without 5-byte props")
        lclppb = coder.props[0]
        if lclppb >= 9 * 5 * 5:
            raise ValueError("7z LZMA1 properties byte out of range")
        lc = lclppb % 9
        lp = (lclppb // 9) % 5
        pb = lclppb // 45
        dict_size = int.from_bytes(coder.props[1:5], "little")
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{
                "id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
                "dict_size": max(1 << 12, min(dict_size, 1 << 30)),
            }],
        )
        try:
            return dec.decompress(data, out_size)
        except lzma.LZMAError as exc:
            raise ValueError(f"7z LZMA1 stream corrupt: {exc}") from exc
    if cid == b"\x21":  # LZMA2
        # props byte p -> dictionary size (LZMA2 spec):
        # p==40 -> 4 GiB-1, else (2 | (p & 1)) << (p // 2 + 11)
        p = coder.props[0] & 0x3F if coder.props else 24
        if p > 40:
            raise ValueError("7z LZMA2 dictionary property out of range")
        dict_size = (
            0xFFFFFFFF if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
        )
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2,
                      "dict_size": max(1 << 12, min(dict_size, 1 << 30))}],
        )
        try:
            return dec.decompress(data, out_size)
        except lzma.LZMAError as exc:
            raise ValueError(f"7z LZMA2 stream corrupt: {exc}") from exc
    if cid == b"\x04\x02\x02":  # BZip2
        try:
            # max_length caps materialization — bz2.decompress would
            # inflate a bomb fully before the size check (r15 review)
            return bz2.BZ2Decompressor().decompress(data, out_size)
        except (OSError, ValueError) as exc:
            raise ValueError(f"7z BZip2 stream corrupt: {exc}") from exc
    if cid == b"\x04\x01\x08":  # Deflate
        try:
            return zlib.decompressobj(wbits=-15).decompress(
                data, out_size
            )
        except zlib.error as exc:
            raise ValueError(f"7z Deflate stream corrupt: {exc}") from exc
    if cid == b"\x03":  # Delta
        if len(coder.props) != 1:
            raise ValueError("7z Delta coder without distance prop")
        dist = coder.props[0] + 1
        out = bytearray(data[:out_size])
        for k in range(dist, len(out)):
            out[k] = (out[k] + out[k - dist]) & 0xFF
        return bytes(out)
    if cid.startswith(b"\x06"):
        raise NotImplementedError(
            "7z AES-encrypted folder (coder 06...) — password-based "
            "archives are out of scope for corpus ingestion"
        )
    if cid == b"\x04" or cid.startswith(b"\x03\x03"):
        raise NotImplementedError(
            f"7z branch/BCJ filter coder {cid.hex()} — executable "
            "filter tables are not in the stdlib"
        )
    raise NotImplementedError(f"7z coder {cid.hex()} not supported")


def _decode_folder(folder: _Folder, packs: list[bytes]) -> bytes:
    """Evaluate the folder's coder chain. Coders form a DAG joined by
    bind pairs; archives in the wild are chains, which is what this
    evaluates (a genuinely branched graph raises)."""
    n = len(folder.coders)
    # map global in/out stream indices to coders
    in_of: list[tuple[int, int]] = []   # global in-index -> (coder, slot)
    out_of: list[tuple[int, int]] = []
    for ci, c in enumerate(folder.coders):
        for k in range(c.nin):
            in_of.append((ci, k))
        for k in range(c.nout):
            out_of.append((ci, k))
    bind_by_in = {i: o for i, o in folder.bind_pairs}
    # packed inputs feed in order of packed_indices
    packed_feed: dict[int, bytes] = {}
    if len(folder.packed_indices) != len(packs):
        raise ValueError("7z folder pack-stream count mismatch")
    for idx, blob in zip(folder.packed_indices, packs):
        packed_feed[idx] = blob

    out_cache: dict[int, bytes] = {}
    visiting: set[int] = set()

    def eval_out(out_idx: int) -> bytes:
        if out_idx in out_cache:
            return out_cache[out_idx]
        ci, _slot = out_of[out_idx]
        if ci in visiting:
            raise ValueError("7z folder bind graph has a cycle")
        visiting.add(ci)
        coder = folder.coders[ci]
        if coder.nin != 1 or coder.nout != 1:
            raise NotImplementedError(
                "7z multi-stream coder (complex bind graph)"
            )
        gin = sum(c.nin for c in folder.coders[:ci])
        if gin in bind_by_in:
            data = eval_out(bind_by_in[gin])
        elif gin in packed_feed:
            data = packed_feed[gin]
        else:
            raise ValueError("7z folder input stream unbound")
        got = _decode_coder(coder, data, folder.unpack_sizes[out_idx])
        visiting.discard(ci)
        out_cache[out_idx] = got
        return got

    bound_outs = {o for _i, o in folder.bind_pairs}
    final = next(
        (k for k in range(len(out_of)) if k not in bound_outs), None
    )
    if final is None:
        raise ValueError("7z folder with no unbound output")
    return eval_out(final)


def _parse_streams_info(r: _Reader) -> tuple[int, list[int], list[_Folder]]:
    """MainStreamsInfo -> (pack_pos, pack_sizes, folders)."""
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[_Folder] = []
    while True:
        t = r.byte()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            pack_pos = r.number()
            num_pack = r.number()
            if num_pack > 1 << 20:
                raise ValueError("7z pack stream count implausible")
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(num_pack)]
                elif t2 == _K_CRC:
                    defined = r.bits_all_defined(num_pack)
                    r.take(4 * sum(defined))
                else:
                    raise ValueError(f"7z PackInfo unknown tag {t2:#x}")
        elif t == _K_UNPACK_INFO:
            if r.byte() != _K_FOLDER:
                raise ValueError("7z UnpackInfo without kFolder")
            num_folders = r.number()
            if num_folders > 1 << 20:
                raise ValueError("7z folder count implausible")
            if r.byte() != 0:
                raise NotImplementedError(
                    "7z external folder definitions"
                )
            for _ in range(num_folders):
                f = _Folder()
                num_coders = r.number()
                if not 1 <= num_coders <= 64:
                    raise ValueError("7z coder count out of range")
                total_in = total_out = 0
                for _c in range(num_coders):
                    flag = r.byte()
                    id_size = flag & 0x0F
                    cid = bytes(r.take(id_size))
                    nin = nout = 1
                    if flag & 0x10:  # complex
                        nin = r.number()
                        nout = r.number()
                    props = b""
                    if flag & 0x20:
                        props = bytes(r.take(r.number()))
                    if flag & 0x80:
                        raise ValueError("7z coder flag reserved bit")
                    f.coders.append(_Coder(cid, nin, nout, props))
                    total_in += nin
                    total_out += nout
                for _b in range(total_out - 1):
                    f.bind_pairs.append((r.number(), r.number()))
                num_packed = total_in - len(f.bind_pairs)
                if num_packed == 1:
                    bound_ins = {i for i, _o in f.bind_pairs}
                    f.packed_indices = [
                        next(
                            k for k in range(total_in)
                            if k not in bound_ins
                        )
                    ]
                else:
                    f.packed_indices = [
                        r.number() for _ in range(num_packed)
                    ]
                folders.append(f)
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                if t2 == _K_UNPACK_SIZES:
                    for f in folders:
                        n_out = sum(c.nout for c in f.coders)
                        f.unpack_sizes = [
                            r.number() for _ in range(n_out)
                        ]
                elif t2 == _K_CRC:
                    defined = r.bits_all_defined(len(folders))
                    for f, dfn in zip(folders, defined):
                        f.crc = (
                            int.from_bytes(r.take(4), "little")
                            if dfn else None
                        )
                else:
                    raise ValueError(
                        f"7z UnpackInfo unknown tag {t2:#x}"
                    )
        elif t == _K_SUBSTREAMS:
            nums = [1] * len(folders)
            sizes_given = False
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                if t2 == _K_NUM_UNPACK_STREAM:
                    nums = [r.number() for _ in folders]
                elif t2 == _K_SIZE:
                    sizes_given = True
                    for f, n in zip(folders, nums):
                        f.num_substreams = n
                        got = [r.number() for _ in range(n - 1)]
                        f.sub_sizes = got + [
                            f.output_size() - sum(got)
                        ]
                elif t2 == _K_CRC:
                    # CRCs for substreams whose digest is not already
                    # known (folders with 1 substream + folder CRC
                    # are skipped)
                    need = []
                    for f, n in zip(folders, nums):
                        if n == 1 and f.crc is not None:
                            continue
                        need.extend((f, k) for k in range(n))
                    defined = r.bits_all_defined(len(need))
                    crcs = [
                        int.from_bytes(r.take(4), "little") if d else None
                        for d in defined
                    ]
                    at = 0
                    for f, n in zip(folders, nums):
                        if n == 1 and f.crc is not None:
                            f.sub_crcs = [f.crc]
                            continue
                        f.sub_crcs = crcs[at : at + n]
                        at += n
                else:
                    raise ValueError(
                        f"7z SubStreams unknown tag {t2:#x}"
                    )
            for f, n in zip(folders, nums):
                f.num_substreams = n
                if not sizes_given or not f.sub_sizes:
                    if n != 1:
                        raise ValueError(
                            "7z substream sizes missing"
                        )
                    f.sub_sizes = [f.output_size()]
                if not f.sub_crcs:
                    f.sub_crcs = [f.crc] if n == 1 else [None] * n
        else:
            raise ValueError(f"7z StreamsInfo unknown tag {t:#x}")
    for f in folders:
        if f.num_substreams == 1 and not f.sub_sizes:
            f.sub_sizes = [f.output_size()]
            f.sub_crcs = [f.crc]
    return pack_pos, pack_sizes, folders


def _parse_header(
    r: _Reader, data: bytes, max_member: int = 1 << 62
) -> list[tuple[str, bytes]]:
    t = r.byte()
    if t != _K_HEADER:
        raise ValueError(f"7z expected kHeader, got {t:#x}")
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[_Folder] = []
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    num_files = 0
    while True:
        t = r.byte()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders = _parse_streams_info(r)
            for f in folders:
                # declared-size bomb guard BEFORE any member decode.
                # EVERY unpack_sizes entry is checked, not just the
                # folder's final output: in a multi-coder chain (e.g.
                # LZMA1 -> Delta) the INTERMEDIATE stream sizes are
                # attacker-declared and materialize in full during
                # _decode_folder, so a tiny archive declaring a small
                # final size could still blow memory at an inner
                # stage (ADVICE r15).
                if f.output_size() > max_member or any(
                    s > max_member for s in f.unpack_sizes
                ):
                    raise ValueError(
                        "7z folder exceeds the member size bound"
                    )
        elif t == _K_FILES_INFO:
            num_files = r.number()
            if num_files > 1 << 24:
                raise ValueError("7z file count implausible")
            empty_stream = [False] * num_files
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                size = r.number()
                end = r.i + size
                if t2 == _K_EMPTY_STREAM:
                    empty_stream = r.bits(num_files)
                elif t2 == _K_EMPTY_FILE:
                    empty_file = r.bits(sum(empty_stream))
                elif t2 == _K_NAME:
                    if r.byte() != 0:
                        raise NotImplementedError("7z external names")
                    raw = bytes(r.take(end - r.i))
                    parts = raw.decode("utf-16-le").split("\x00")
                    if parts and parts[-1] == "":
                        parts.pop()
                    names = parts
                elif t2 == _K_ANTI:
                    raise NotImplementedError(
                        "7z anti-files (incremental backup archives)"
                    )
                else:
                    # times / attributes / dummy padding: skip by size
                    r.take(end - r.i)
                if r.i != end:
                    r.i = end
        else:
            raise ValueError(f"7z Header unknown tag {t:#x}")
    if num_files and len(names) != num_files:
        raise ValueError("7z name count does not match file count")

    # unpack every folder's substreams
    base = 32 + pack_pos
    offsets = []
    at = base
    for s in pack_sizes:
        offsets.append(at)
        at += s
    if at > len(data):
        raise ValueError("7z pack streams run past the archive")
    substreams: list[bytes] = []
    pack_at = 0
    for f in folders:
        n_packs = len(f.packed_indices)
        packs = [
            data[offsets[pack_at + k] : offsets[pack_at + k]
                 + pack_sizes[pack_at + k]]
            for k in range(n_packs)
        ]
        pack_at += n_packs
        out = _decode_folder(f, packs)
        if len(out) != f.output_size():
            raise ValueError("7z folder unpacked to the wrong size")
        at2 = 0
        for size, crc in zip(f.sub_sizes, f.sub_crcs):
            if size < 0 or at2 + size > len(out):
                raise ValueError("7z substream sizes overflow folder")
            blob = out[at2 : at2 + size]
            at2 += size
            if crc is not None and zlib.crc32(blob) != crc:
                raise ValueError("7z substream CRC mismatch")
            substreams.append(blob)

    # map files to substreams (empty-stream files have none)
    out_files: list[tuple[str, bytes]] = []
    sub_at = 0
    empty_at = 0
    for k in range(num_files):
        name = names[k].replace("\\", "/")
        if empty_stream[k]:
            is_file = (
                empty_file[empty_at] if empty_at < len(empty_file)
                else False
            )
            empty_at += 1
            if is_file:
                out_files.append((name, b""))
            # else: directory entry — skip
            continue
        if sub_at >= len(substreams):
            raise ValueError("7z more stream-files than substreams")
        out_files.append((name, substreams[sub_at]))
        sub_at += 1
    return out_files


def parse_7z(data: bytes, max_member: int = 1 << 28) -> list[tuple[str, bytes]]:
    """.7z bytes -> [(member_name, member_bytes)] for FILE members
    (directory entries are dropped). ``max_member`` bounds the
    declared unpack size per folder (decompression-bomb guard)."""
    b = bytes(data)
    if len(b) < 32 or b[:6] != _SIGNATURE:
        raise ValueError("not a 7z archive (bad signature)")
    start_crc = int.from_bytes(b[8:12], "little")
    if zlib.crc32(b[12:32]) != start_crc:
        raise ValueError("7z start header CRC mismatch")
    nh_off = int.from_bytes(b[12:20], "little")
    nh_size = int.from_bytes(b[20:28], "little")
    nh_crc = int.from_bytes(b[28:32], "little")
    if nh_size == 0:
        return []  # empty archive
    if 32 + nh_off + nh_size > len(b):
        raise ValueError("7z next header runs past the archive")
    header = b[32 + nh_off : 32 + nh_off + nh_size]
    if zlib.crc32(header) != nh_crc:
        raise ValueError("7z next header CRC mismatch")
    r = _Reader(header)
    t = header[0] if header else 0
    if t == _K_ENCODED_HEADER:
        r.byte()
        pack_pos, pack_sizes, folders = _parse_streams_info(r)
        if len(folders) != 1:
            raise ValueError("7z encoded header with multiple folders")
        f = folders[0]
        # bound every intermediate stream too, not only the final
        # output (ADVICE r15 — same gap as the main-streams guard)
        if f.output_size() > 1 << 26 or any(
            s > 1 << 26 for s in f.unpack_sizes
        ):
            raise ValueError("7z encoded header implausibly large")
        base = 32 + pack_pos
        packs = []
        at = base
        for s in pack_sizes:
            packs.append(b[at : at + s])
            at += s
        real = _decode_folder(f, packs)
        if f.crc is not None and zlib.crc32(real) != f.crc:
            raise ValueError("7z decoded header CRC mismatch")
        r = _Reader(bytes(real))
    return _parse_header(r, b, max_member)


def _write_number(v: int) -> bytes:
    """Writer twin of ``_Reader.number`` (small values)."""
    if v < 0x80:
        return bytes([v])
    if v < 1 << 16:
        return bytes([0xC0]) + v.to_bytes(2, "little")
    if v < 1 << 32:
        return bytes([0xF0]) + v.to_bytes(4, "little")
    return bytes([0xFF]) + v.to_bytes(8, "little")


def build_7z(files: list[tuple[str, bytes]], compress: bool = False) -> bytes:
    """[(name, bytes)] -> a minimal conformant .7z archive: one
    folder per file, Copy coder (or LZMA1 with ``compress=True`` —
    raw stream via the stdlib, 5-byte props), full CRC records, plain
    (non-encoded) header. Deterministic — the witness side of the
    registered queries; readable by any 7z implementation."""
    if not files:
        raise ValueError("7z archive needs at least one member")
    packs: list[bytes] = []
    coders: list[tuple[bytes, bytes]] = []  # (cid, props) per folder
    out_sizes: list[int] = []
    crcs: list[int] = []
    for _name, blob in files:
        blob = bytes(blob)
        out_sizes.append(len(blob))
        crcs.append(zlib.crc32(blob))
        if compress and blob:
            lc, lp, pb = 3, 0, 2
            props = bytes([lc + lp * 9 + pb * 45]) + (1 << 16).to_bytes(
                4, "little"
            )
            comp = lzma.compress(
                blob,
                format=lzma.FORMAT_RAW,
                filters=[{
                    "id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp,
                    "pb": pb, "dict_size": 1 << 16,
                }],
            )
            packs.append(comp)
            coders.append((b"\x03\x01\x01", props))
        else:
            packs.append(blob)
            coders.append((b"\x00", b""))

    body = b"".join(packs)
    n = len(files)
    h = bytearray()
    h.append(_K_HEADER)
    h.append(_K_MAIN_STREAMS)
    # PackInfo
    h.append(_K_PACK_INFO)
    h += _write_number(0)  # pack pos
    h += _write_number(n)
    h.append(_K_SIZE)
    for p in packs:
        h += _write_number(len(p))
    h.append(_K_END)
    # UnpackInfo
    h.append(_K_UNPACK_INFO)
    h.append(_K_FOLDER)
    h += _write_number(n)
    h.append(0)  # not external
    for cid, props in coders:
        h += _write_number(1)  # one coder in this folder
        flag = len(cid) | (0x20 if props else 0)
        h.append(flag)
        h += cid
        if props:
            h += _write_number(len(props))
            h += props
    h.append(_K_UNPACK_SIZES)
    for s in out_sizes:
        h += _write_number(s)
    h.append(_K_END)  # end UnpackInfo
    # digests ride in SubStreamsInfo (the shape libarchive accepts;
    # spec-legal either way — our reader handles both)
    h.append(_K_SUBSTREAMS)
    h.append(_K_CRC)
    h.append(1)  # all defined
    for c in crcs:
        h += c.to_bytes(4, "little")
    h.append(_K_END)
    h.append(_K_END)  # end MainStreamsInfo
    # FilesInfo
    h.append(_K_FILES_INFO)
    h += _write_number(n)
    h.append(_K_NAME)
    names_blob = b"".join(
        (name + "\x00").encode("utf-16-le") for name, _ in files
    )
    h += _write_number(len(names_blob) + 1)
    h.append(0)  # not external
    h += names_blob
    h.append(_K_END)
    h.append(_K_END)  # end Header
    header = bytes(h)

    out = bytearray()
    out += _SIGNATURE
    out += bytes([0, 4])  # format version 0.4
    start = (
        len(body).to_bytes(8, "little")
        + len(header).to_bytes(8, "little")
        + zlib.crc32(header).to_bytes(4, "little")
    )
    out += zlib.crc32(start).to_bytes(4, "little")
    out += start
    out += body
    out += header
    return bytes(out)
