"""Pure-Python Avro Object Container File reader + writer — Apache
Avro 1.11 specification (public), stdlib only.

Spark ships Avro as an EXTERNAL module (`spark-avro` JAR) that this
deployment does not carry, so `spark.read.format("avro")` is
unavailable. Rather than leaving a hole in the source matrix, this
module implements the container format from the public spec —
magic `Obj\\x01`, metadata map (schema JSON + codec), sync-marker
delimited blocks, zigzag-varint primitive encoding, null/deflate
codecs — and `sources/avro_pyds.py` exposes it through Spark 4's
Python DataSource API, so `spark.read.format(...)` works end-to-end
with per-BLOCK parallelism.

Supported schema subset (the tabular slice a lakehouse actually
lands): records of null/boolean/int/long/float/double/bytes/string
and their ["null", T] union (nullable) forms. Nested records, arrays,
maps, enums, and fixed raise NotImplementedError — honest gates, same
policy as the codec stack.

EXCEPTION CONTRACT: ValueError for malformed containers,
NotImplementedError for out-of-subset schemas; struct/zlib errors are
converted so a bad file costs its task one clean error.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# zigzag varints (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated Avro varint")
        byte = raw[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("overlong Avro varint")
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out += b


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative Avro byte length")
    b = buf.read(n)
    if len(b) != n:
        raise ValueError("truncated Avro bytes")
    return b


# ---------------------------------------------------------------------------
# schema handling (flat records over primitives, nullable unions)
# ---------------------------------------------------------------------------

_PRIMITIVES = ("null", "boolean", "int", "long", "float", "double",
               "bytes", "string")


def _field_type(t) -> tuple[str, bool]:
    """Avro field type -> (primitive_name, nullable). Only the flat
    subset; anything else raises NotImplementedError."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return t, t == "null"
        raise NotImplementedError(f"Avro type {t!r} outside the flat subset")
    if isinstance(t, list):  # union
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or not isinstance(non_null[0], str):
            raise NotImplementedError(f"Avro union {t!r} beyond [null, T]")
        prim, _ = _field_type(non_null[0])
        return prim, True
    raise NotImplementedError(f"complex Avro type {t!r} (record/array/map)")


def parse_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """schema JSON -> [(field_name, primitive, nullable)]."""
    sch = json.loads(schema_json)
    if not isinstance(sch, dict) or sch.get("type") != "record":
        raise NotImplementedError("top-level Avro schema must be a record")
    out = []
    for f in sch["fields"]:
        prim, nullable = _field_type(f["type"])
        out.append((f["name"], prim, nullable))
    return out


def _read_value(buf: io.BytesIO, prim: str):
    if prim == "null":
        return None
    if prim == "boolean":
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated Avro boolean")
        return raw[0] != 0
    if prim in ("int", "long"):
        return _read_long(buf)
    if prim == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if prim == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if prim == "bytes":
        return _read_bytes(buf)
    if prim == "string":
        return _read_bytes(buf).decode("utf-8")
    raise NotImplementedError(f"Avro primitive {prim!r}")


def _write_value(out: bytearray, prim: str, v) -> None:
    if prim == "null":
        return
    if prim == "boolean":
        out.append(1 if v else 0)
    elif prim in ("int", "long"):
        _write_long(out, int(v))
    elif prim == "float":
        out += struct.pack("<f", float(v))
    elif prim == "double":
        out += struct.pack("<d", float(v))
    elif prim == "bytes":
        _write_bytes(out, bytes(v))
    elif prim == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    else:
        raise NotImplementedError(f"Avro primitive {prim!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def read_header(path: str) -> tuple[list[tuple[str, str, bool]], str, bytes, int]:
    """-> (fields, codec, sync_marker, data_start_offset)."""
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro container (bad magic)")
        meta = {}
        buf = _Tail(f)
        n = _read_long(buf)
        while n != 0:
            if n < 0:  # negative count prefixes a block byte size
                n = -n
                _read_long(buf)
            for _ in range(n):
                key = _read_bytes(buf).decode("utf-8")
                meta[key] = _read_bytes(buf)
            n = _read_long(buf)
        sync = f.read(16)
        if len(sync) != 16:
            raise ValueError("truncated Avro sync marker")
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        if codec not in ("null", "deflate"):
            raise NotImplementedError(f"Avro codec {codec!r}")
        schema = meta.get("avro.schema")
        if schema is None:
            raise ValueError("Avro container missing schema")
        return parse_schema(schema.decode("utf-8")), codec, sync, f.tell()


class _Tail:
    """io adapter: _read_long/_read_bytes over an open file."""

    def __init__(self, f) -> None:
        self.f = f

    def read(self, n: int) -> bytes:
        return self.f.read(n)


def block_offsets(path: str) -> list[tuple[int, int]]:
    """[(offset, n_records)] per block — the split points a reader
    parallelizes over (each block is independently decodable)."""
    fields, codec, sync, pos = read_header(path)
    out = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(pos)
        while f.tell() < size:
            start = f.tell()
            buf = _Tail(f)
            n_rec = _read_long(buf)
            n_bytes = _read_long(buf)
            if n_bytes < 0 or n_rec < 0:
                raise ValueError("negative Avro block header")
            f.seek(n_bytes, 1)
            marker = f.read(16)
            if marker != sync:
                raise ValueError("Avro sync marker mismatch")
            out.append((start, n_rec))
    return out


def read_block(path: str, offset: int):
    """Decode ONE block at ``offset`` -> iterator of row tuples."""
    fields, codec, sync, _ = read_header(path)
    with open(path, "rb") as f:
        f.seek(offset)
        buf = _Tail(f)
        n_rec = _read_long(buf)
        n_bytes = _read_long(buf)
        payload = f.read(n_bytes)
    if len(payload) != n_bytes:
        raise ValueError("truncated Avro block")
    if codec == "deflate":
        try:
            payload = zlib.decompress(payload, wbits=-15)
        except zlib.error as exc:
            raise ValueError(f"corrupt Avro deflate block: {exc}") from exc
    bio = io.BytesIO(payload)
    for _ in range(n_rec):
        row = []
        for _name, prim, nullable in fields:
            p = prim
            if nullable:
                branch = _read_long(bio)
                if branch == 0:
                    row.append(None)
                    continue
                if branch != 1:
                    raise ValueError(f"bad Avro union branch {branch}")
            row.append(_read_value(bio, p))
        yield tuple(row)


def write_container(
    path: str,
    schema_json: str,
    rows,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    records_per_block: int = 1000,
) -> None:
    """Write an Avro Object Container File (spec-conformant; fixed
    sync marker keeps output deterministic for oracle hashing)."""
    fields = parse_schema(schema_json)
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r}")
    out = bytearray()
    out += _MAGIC
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out += sync

    block = bytearray()
    n_in_block = 0

    def flush() -> None:
        nonlocal out, block, n_in_block
        if not n_in_block:
            return
        payload = bytes(block)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, n_in_block)
        _write_long(out, len(payload))
        out += payload
        out += sync
        block = bytearray()
        n_in_block = 0

    for row in rows:
        for (name, prim, nullable), v in zip(fields, row):
            if nullable:
                if v is None:
                    _write_long(block, 0)
                    continue
                _write_long(block, 1)
            elif v is None:
                raise ValueError(f"null in non-nullable Avro field {name}")
            _write_value(block, prim, v)
        n_in_block += 1
        if n_in_block >= records_per_block:
            flush()
    flush()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
