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

Supported schema subset: records over the full recursive type algebra
real event logs use — primitives (null/boolean/int/long/float/double/
bytes/string), nested records, arrays, maps, enums, fixed, the
["null", T] union (nullable) form, MULTI-BRANCH unions (decoded with
spark-avro's public mapping: int/long promote to long, float/double
to double, anything else becomes a memberN struct), and named-type
REFERENCES (a string naming an earlier record/enum/fixed in the same
schema document, with the spec's namespace inheritance). Still gated
honestly: RECURSIVE named types (a record referencing itself has no
static relational schema) and non-null/deflate codecs raise
NotImplementedError; an undefined reference or duplicate definition
is a malformed schema (ValueError).

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
# schema handling — recursive type trees
#
# A type tree is a tuple tagged by kind:
#   ("prim", name)                       primitive
#   ("union_null", tree)                 ["null", T] nullable wrapper
#   ("record", ((field_name, tree),...)) nested record
#   ("array", item_tree)
#   ("map", value_tree)                  keys are always Avro strings
#   ("enum", (symbol, ...))
#   ("fixed", size)
#   ("union_n", (branches, mode))        multi-branch union: branches is a
#       tuple aligned with Avro branch indices, None marking the null
#       branch; mode is "promote_long" (all int/long), "promote_double"
#       (all int/long/float/double), "single" (one non-null branch, no
#       null), or "struct" (memberN struct, spark-avro's mapping)
# ---------------------------------------------------------------------------

_PRIMITIVES = ("null", "boolean", "int", "long", "float", "double",
               "bytes", "string")


_DEFINING = object()  # sentinel: named type currently being defined


def _fullname(t: dict, namespace) -> tuple[str, str | None]:
    """(fullname, child_namespace) per the spec's name rules: a dotted
    name IS the fullname; otherwise the ``namespace`` attribute, else
    the enclosing namespace, qualifies it."""
    name = t.get("name")
    if not name:
        raise ValueError(f"Avro named type missing name: {t!r}")
    if "." in name:
        return name, name.rsplit(".", 1)[0]
    ns = t.get("namespace", namespace)
    return (f"{ns}.{name}" if ns else name), ns


def _resolve_name(t: str, names: dict, namespace) -> tuple:
    for cand in ([t] if "." in t else
                 ([f"{namespace}.{t}"] if namespace else []) + [t]):
        if cand in names:
            tree = names[cand]
            if tree is _DEFINING:
                raise NotImplementedError(
                    f"recursive Avro named-type {t!r} has no static "
                    "relational schema"
                )
            return tree
    raise ValueError(f"undefined Avro named-type reference {t!r}")


def _register_name(full: str, names: dict, tree) -> None:
    if full in names and names[full] is not _DEFINING:
        raise ValueError(f"duplicate Avro named-type definition {full!r}")
    names[full] = tree


def _parse_type(t, names: dict | None = None, namespace=None) -> tuple:
    """Avro schema fragment -> type tree (recursive). ``names`` is the
    schema document's definition table (record/enum/fixed register
    their fullnames; string references resolve against it);
    out-of-subset shapes raise NotImplementedError."""
    if names is None:
        names = {}
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return ("prim", t)
        return _resolve_name(t, names, namespace)
    if isinstance(t, list):  # union
        if not t:
            raise ValueError("empty Avro union")
        branches: list = []
        non_null: list = []
        for x in t:
            if x == "null":
                if None in branches:
                    raise ValueError("duplicate null branch in Avro union")
                branches.append(None)
            else:
                tree = _parse_type(x, names, namespace)
                branches.append(tree)
                non_null.append(tree)
        if not non_null:
            return ("prim", "null")
        if len(non_null) == 1:
            if None in branches:
                return ("union_null", non_null[0])
            return ("union_n", (tuple(branches), "single"))
        prims = {tr[1] for tr in non_null if tr[0] == "prim"}
        if len(prims) == len(non_null):
            if prims <= {"int", "long"}:
                mode = "promote_long"
            elif prims <= {"int", "long", "float", "double"}:
                mode = "promote_double"
            else:
                mode = "struct"
        else:
            mode = "struct"
        return ("union_n", (tuple(branches), mode))
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "record":
            full, child_ns = _fullname(t, namespace)
            _register_name(full, names, _DEFINING)
            tree = (
                "record",
                tuple(
                    (f["name"], _parse_type(f["type"], names, child_ns))
                    for f in t["fields"]
                ),
            )
            names[full] = tree
            return tree
        if kind == "array":
            return ("array", _parse_type(t["items"], names, namespace))
        if kind == "map":
            return ("map", _parse_type(t["values"], names, namespace))
        if kind == "enum":
            symbols = tuple(t["symbols"])
            if not symbols:
                raise ValueError("Avro enum with no symbols")
            tree = ("enum", symbols)
            full, _ = _fullname(t, namespace)
            _register_name(full, names, tree)
            return tree
        if kind == "fixed":
            size = int(t["size"])
            if size < 0:
                raise ValueError("negative Avro fixed size")
            tree = ("fixed", size)
            full, _ = _fullname(t, namespace)
            _register_name(full, names, tree)
            return tree
        if isinstance(kind, str) and kind in _PRIMITIVES:
            return ("prim", kind)  # the {"type": "long"} wrapper form
        if isinstance(kind, (list, dict)):
            return _parse_type(kind, names, namespace)
        raise NotImplementedError(f"complex Avro type {t!r}")
    raise NotImplementedError(f"complex Avro type {t!r}")


def parse_schema(schema_json: str) -> list[tuple[str, tuple, bool]]:
    """schema JSON -> [(field_name, type_tree, nullable)]. The tree
    already includes the union_null wrapper when nullable. A schema
    document missing required keys (fields/name/type/items/...) is a
    MALFORMED schema: KeyError/TypeError from the walk convert to
    ValueError, keeping the module's exception contract."""
    try:
        return _parse_schema(schema_json)
    except (KeyError, TypeError, AttributeError) as exc:
        raise ValueError(
            f"malformed Avro schema document: {exc!r}"
        ) from exc


def _parse_schema(schema_json: str) -> list[tuple[str, tuple, bool]]:
    sch = json.loads(schema_json)
    if not isinstance(sch, dict) or sch.get("type") != "record":
        raise NotImplementedError("top-level Avro schema must be a record")
    names: dict = {}
    full, child_ns = _fullname(sch, None)
    _register_name(full, names, _DEFINING)
    out = []
    for f in sch["fields"]:
        tree = _parse_type(f["type"], names, child_ns)
        nullable = (
            tree[0] == "union_null"
            or tree == ("prim", "null")
            or (tree[0] == "union_n" and None in tree[1][0])
        )
        out.append((f["name"], tree, nullable))
    return out


def _read_value(buf: io.BytesIO, tree: tuple):
    kind, arg = tree
    if kind == "prim":
        if arg == "null":
            return None
        if arg == "boolean":
            raw = buf.read(1)
            if not raw:
                raise ValueError("truncated Avro boolean")
            return raw[0] != 0
        if arg in ("int", "long"):
            return _read_long(buf)
        if arg == "float":
            raw = buf.read(4)
            if len(raw) != 4:
                raise ValueError("truncated Avro float")
            return struct.unpack("<f", raw)[0]
        if arg == "double":
            raw = buf.read(8)
            if len(raw) != 8:
                raise ValueError("truncated Avro double")
            return struct.unpack("<d", raw)[0]
        if arg == "bytes":
            return _read_bytes(buf)
        if arg == "string":
            return _read_bytes(buf).decode("utf-8")
        raise NotImplementedError(f"Avro primitive {arg!r}")
    if kind == "union_null":
        branch = _read_long(buf)
        if branch == 0:
            return None
        if branch != 1:
            raise ValueError(f"bad Avro union branch {branch}")
        return _read_value(buf, arg)
    if kind == "union_n":
        branches, mode = arg
        i = _read_long(buf)
        if not 0 <= i < len(branches):
            raise ValueError(f"bad Avro union branch {i}")
        br = branches[i]
        if br is None:
            return None
        v = _read_value(buf, br)
        if mode == "promote_long":
            return int(v)
        if mode == "promote_double":
            return float(v)
        if mode == "single":
            return v
        # struct: one memberN slot per non-null branch, others null
        members = [b for b in branches if b is not None]
        j = sum(1 for b in branches[:i] if b is not None)
        out = [None] * len(members)
        out[j] = v
        return tuple(out)
    if kind == "record":
        return tuple(_read_value(buf, t) for _name, t in arg)
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count prefixes a block byte size
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_read_value(buf, arg))
    if kind == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                key = _read_bytes(buf).decode("utf-8")
                out[key] = _read_value(buf, arg)
    if kind == "enum":
        idx = _read_long(buf)
        if not 0 <= idx < len(arg):
            raise ValueError(f"Avro enum index {idx} out of range")
        return arg[idx]
    if kind == "fixed":
        raw = buf.read(arg)
        if len(raw) != arg:
            raise ValueError("truncated Avro fixed")
        return raw
    raise NotImplementedError(f"Avro type kind {kind!r}")


def _prim_accepts(prim: str, v) -> bool:
    """Shallow value/primitive compatibility check for union branch
    dispatch — keeps the module's ValueError-for-malformed contract
    (the bare primitive writers would otherwise leak TypeError /
    AttributeError, or silently coerce, e.g. bytes(int))."""
    if prim == "null":
        return v is None
    if prim == "boolean":
        return isinstance(v, bool)
    if prim in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if prim in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if prim == "bytes":
        return isinstance(v, (bytes, bytearray))
    if prim == "string":
        return isinstance(v, str)
    return True


def _write_value(out: bytearray, tree: tuple, v) -> None:
    kind, arg = tree
    if kind == "prim":
        if arg == "null":
            return
        if arg == "boolean":
            out.append(1 if v else 0)
        elif arg in ("int", "long"):
            _write_long(out, int(v))
        elif arg == "float":
            out += struct.pack("<f", float(v))
        elif arg == "double":
            out += struct.pack("<d", float(v))
        elif arg == "bytes":
            _write_bytes(out, bytes(v))
        elif arg == "string":
            _write_bytes(out, str(v).encode("utf-8"))
        else:
            raise NotImplementedError(f"Avro primitive {arg!r}")
        return
    if kind == "union_null":
        if v is None:
            _write_long(out, 0)
            return
        _write_long(out, 1)
        _write_value(out, arg, v)
        return
    if kind == "union_n":
        branches, mode = arg
        if v is None:
            if None not in branches:
                raise ValueError("null value in Avro union without null")
            _write_long(out, branches.index(None))
            return
        if mode == "struct":
            # value is the memberN tuple: exactly one slot non-null
            members = [
                (i, b) for i, b in enumerate(branches) if b is not None
            ]
            if isinstance(v, (str, bytes)) or not hasattr(v, "__iter__"):
                raise ValueError(
                    "union struct value must be a memberN sequence, got "
                    f"{type(v).__name__}"
                )
            vals = list(v)
            if len(vals) != len(members):
                raise ValueError(
                    f"union struct arity {len(vals)} != {len(members)}"
                )
            lit = [(j, x) for j, x in enumerate(vals) if x is not None]
            if len(lit) != 1:
                raise ValueError(
                    "union struct value must set exactly one member"
                )
            j, x = lit[0]
            i, br = members[j]
            _write_long(out, i)
            _write_value(out, br, x)
            return
        # promote modes: pick the widest matching NUMERIC primitive —
        # only for genuinely numeric values (bool is not a number)
        numeric = isinstance(v, (int, float)) and not isinstance(v, bool)
        if numeric:
            if isinstance(v, int):
                # minimal-branch writer: int when the value fits 32 bits
                if -(2 ** 31) <= v < 2 ** 31:
                    order = ("int", "long", "double", "float")
                else:
                    order = ("long", "double", "float")
            else:
                order = ("double", "float")
            prims = [b[1] for b in branches if b is not None]
            for want in order:
                if want in prims:
                    i = branches.index(("prim", want))
                    _write_long(out, i)
                    _write_value(out, ("prim", want), v)
                    return
        if mode == "single":
            i = next(
                i for i, b in enumerate(branches) if b is not None
            )
            br = branches[i]
            if br[0] == "prim" and not _prim_accepts(br[1], v):
                raise ValueError(
                    f"Avro union branch {br[1]!r} cannot encode "
                    f"{type(v).__name__} value {v!r}"
                )
            _write_long(out, i)
            try:
                _write_value(out, br, v)
            except (TypeError, AttributeError) as exc:
                raise ValueError(
                    f"Avro union branch {br!r} cannot encode "
                    f"{type(v).__name__} value {v!r}"
                ) from exc
            return
        raise ValueError(f"no Avro union branch accepts {v!r}")
    if kind == "record":
        vals = (
            [v.get(name) for name, _t in arg] if isinstance(v, dict) else v
        )
        if len(vals) != len(arg):
            raise ValueError(
                f"record value arity {len(vals)} != schema {len(arg)}"
            )
        for (name, t), item in zip(arg, vals):
            if item is None and t[0] not in ("union_null", "prim"):
                raise ValueError(f"null in non-nullable Avro field {name}")
            _write_value(out, t, item)
        return
    if kind == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _write_value(out, arg, item)
        _write_long(out, 0)
        return
    if kind == "map":
        items = sorted(v.items()) if isinstance(v, dict) else list(v)
        if items:
            _write_long(out, len(items))
            for key, item in items:
                _write_bytes(out, str(key).encode("utf-8"))
                _write_value(out, arg, item)
        _write_long(out, 0)
        return
    if kind == "enum":
        idx = arg.index(v) if v in arg else (-1 if isinstance(v, str) else int(v))
        if not 0 <= idx < len(arg):
            raise ValueError(f"Avro enum value {v!r} not in symbols")
        _write_long(out, idx)
        return
    if kind == "fixed":
        raw = bytes(v)
        if len(raw) != arg:
            raise ValueError(f"Avro fixed value length {len(raw)} != {arg}")
        out += raw
        return
    raise NotImplementedError(f"Avro type kind {kind!r}")


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
        yield tuple(_read_value(bio, tree) for _name, tree, _n in fields)


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
        for (name, tree, nullable), v in zip(fields, row):
            if v is None and not nullable:
                raise ValueError(f"null in non-nullable Avro field {name}")
            _write_value(block, tree, v)
        n_in_block += 1
        if n_in_block >= records_per_block:
            flush()
    flush()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
