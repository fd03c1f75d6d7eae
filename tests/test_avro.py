"""Pure-Python Avro container (sources/avro.py) + the ``avro_py``
Python Data Source (sources/avro_pyds.py)."""

from __future__ import annotations

import json
import os

import pytest

from articulation_vector_db_api_spark.sources.avro import (
    block_offsets,
    parse_schema,
    read_block,
    read_header,
    write_container,
)

_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "ok", "type": "boolean"},
        ],
    }
)


def _rows(n):
    return [
        (i, None if i % 5 == 0 else f"n{i}", i * 0.5, i % 2 == 0)
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_exact(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    rows = _rows(2500)
    write_container(p, _SCHEMA, rows, codec=codec, records_per_block=1000)
    fields, got_codec, _sync, _pos = read_header(p)
    assert got_codec == codec
    assert [f[0] for f in fields] == ["id", "name", "score", "ok"]
    blocks = block_offsets(p)
    assert [n for _, n in blocks] == [1000, 1000, 500]
    got = [r for off, _ in blocks for r in read_block(p, off)]
    assert got == rows  # byte-exact through varints/unions/deflate


def test_zigzag_extremes(tmp_path):
    p = str(tmp_path / "z.avro")
    schema = json.dumps(
        {"type": "record", "name": "z",
         "fields": [{"name": "v", "type": "long"}]}
    )
    vals = [(v,) for v in [0, -1, 1, 63, -64, -(2 ** 62), 2 ** 62]]
    write_container(p, schema, vals)
    got = [r for off, _ in block_offsets(p) for r in read_block(p, off)]
    assert got == vals


def test_schema_gates():
    with pytest.raises(NotImplementedError, match="record"):
        parse_schema(json.dumps({"type": "array", "items": "long"}))
    # an UNDEFINED named reference is a malformed schema
    with pytest.raises(ValueError, match="named-type"):
        parse_schema(
            json.dumps(
                {"type": "record", "name": "r", "fields": [
                    {"name": "x", "type": "SomeEarlierRecord"}
                ]}
            )
        )
    # recursive named types have no static relational schema
    with pytest.raises(NotImplementedError, match="recursive"):
        parse_schema(
            json.dumps(
                {"type": "record", "name": "node", "fields": [
                    {"name": "v", "type": "long"},
                    {"name": "next", "type": ["null", "node"]},
                ]}
            )
        )
    # duplicate definitions are malformed
    with pytest.raises(ValueError, match="duplicate"):
        parse_schema(
            json.dumps(
                {"type": "record", "name": "r", "fields": [
                    {"name": "a", "type": {
                        "type": "enum", "name": "e", "symbols": ["x"]}},
                    {"name": "b", "type": {
                        "type": "enum", "name": "e", "symbols": ["y"]}},
                ]}
            )
        )


def test_multi_branch_unions_roundtrip():
    """spark-avro's public union mapping: int/long -> long,
    float/double -> double, anything else -> memberN struct; the null
    branch makes the column nullable at any position."""
    schema = json.dumps(
        {"type": "record", "name": "ev", "fields": [
            {"name": "id", "type": "long"},
            {"name": "val", "type": ["null", "string", "long"]},
            {"name": "num", "type": ["int", "long"]},
            {"name": "ratio", "type": ["float", "null", "double"]},
        ]}
    )
    fields = parse_schema(schema)
    assert [t[0] for _n, t, _u in fields] == [
        "prim", "union_n", "union_n", "union_n"]
    assert fields[1][1][1][1] == "struct" and fields[1][2] is True
    assert fields[2][1][1][1] == "promote_long" and fields[2][2] is False
    assert fields[3][1][1][1] == "promote_double" and fields[3][2] is True
    rows = [
        (1, ("abc", None), 5, 1.5),
        (2, (None, 2 ** 40), 2 ** 40, None),
        (3, None, -7, 2.25),
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "u.avro")
        write_container(p, schema, rows)
        got = [r for off, _ in block_offsets(p)
               for r in read_block(p, off)]
    assert got == rows
    # struct-mode writer contract: exactly one member set
    with pytest.raises(ValueError, match="exactly one member"):
        buf = bytearray()
        from articulation_vector_db_api_spark.sources.avro import (
            _write_value,
        )
        _write_value(buf, fields[1][1], ("x", 1))


def test_named_type_references_resolve():
    """A string naming an earlier record/enum/fixed resolves within
    the schema document, honoring namespace inheritance."""
    schema = json.dumps(
        {"type": "record", "name": "ev", "namespace": "ns", "fields": [
            {"name": "a", "type": {
                "type": "record", "name": "Point", "fields": [
                    {"name": "x", "type": "double"},
                    {"name": "y", "type": "double"}]}},
            {"name": "b", "type": "Point"},
            {"name": "c", "type": ["null", "ns.Point"]},
            {"name": "d", "type": {
                "type": "array", "items": "Point"}},
        ]}
    )
    fields = parse_schema(schema)
    point = fields[0][1]
    assert point[0] == "record"
    assert fields[1][1] is point
    assert fields[2][1] == ("union_null", point)
    assert fields[3][1] == ("array", point)
    rows = [
        ((1.0, 2.0), (3.0, 4.0), (5.0, 6.0), [(7.0, 8.0), (9.0, 0.0)]),
        ((0.5, 0.5), (0.0, 0.0), None, []),
    ]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "n.avro")
        write_container(p, schema, rows)
        got = [r for off, _ in block_offsets(p)
               for r in read_block(p, off)]
    assert got == rows


_NESTED_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "meta",
                "type": {
                    "type": "record",
                    "name": "meta",
                    "fields": [
                        {"name": "lang", "type": {
                            "type": "enum", "name": "lang_e",
                            "symbols": ["de", "en", "fr"]}},
                        {"name": "score", "type": ["null", "double"]},
                    ],
                },
            },
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "fp", "type": {
                "type": "fixed", "name": "fp8", "size": 8}},
            {"name": "nested", "type": ["null", {
                "type": "array",
                "items": {"type": "array", "items": ["null", "long"]}}]},
        ],
    }
)


def _nested_rows(n):
    return [
        (
            i,
            (["de", "en", "fr"][i % 3], None if i % 4 == 0 else i * 0.5),
            [f"t{j}" for j in range(i % 3)],
            {f"k{j}": i * 10 + j for j in range(i % 2 + 1)},
            i.to_bytes(8, "big"),
            None if i % 5 == 0 else [[i, None], []],
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_nested_roundtrip_exact(tmp_path, codec):
    """record/array/map/enum/fixed and nullable unions at every depth
    survive the container byte-exactly (VERDICT r7 item 2)."""
    p = str(tmp_path / "n.avro")
    rows = _nested_rows(700)
    write_container(
        p, _NESTED_SCHEMA, rows, codec=codec, records_per_block=256
    )
    got = [r for off, _ in block_offsets(p) for r in read_block(p, off)]
    assert got == rows


def test_nested_spark_scan(spark, tmp_path):
    """The avro_py source maps the type tree to Spark nested types and
    the scanned values match the written ones."""
    from articulation_vector_db_api_spark.sources.avro_pyds import (
        register_avro_source,
    )

    p = str(tmp_path / "n.avro")
    rows = _nested_rows(40)
    write_container(p, _NESTED_SCHEMA, rows, records_per_block=16)
    register_avro_source(spark)
    df = spark.read.format("avro_py").option("path", p).load()
    assert dict(df.dtypes) == {
        "id": "bigint",
        "meta": "struct<lang:string,score:double>",
        "tags": "array<string>",
        "props": "map<string,bigint>",
        "fp": "binary",
        "nested": "array<array<bigint>>",
    }
    got = df.orderBy("id").collect()
    for r, (i, meta, tags, props, fp, nested) in zip(got, rows):
        assert (r.id, tuple(r.meta), r.tags, r.props) == (
            i, meta, tags, props,
        )
        assert bytes(r.fp) == fp
        assert r.nested == nested


def test_write_value_contract_errors(tmp_path):
    p = str(tmp_path / "bad.avro")
    with pytest.raises(ValueError, match="arity"):
        write_container(
            p, _NESTED_SCHEMA,
            [(1, ("en",), [], {}, b"\x00" * 8, None)],  # meta arity 1 != 2
        )
    with pytest.raises(ValueError, match="fixed value length"):
        write_container(
            p, _NESTED_SCHEMA,
            [(1, ("en", None), [], {}, b"\x00" * 3, None)],
        )
    with pytest.raises(ValueError, match="enum value"):
        write_container(
            p, _NESTED_SCHEMA,
            [(1, ("xx", None), [], {}, b"\x00" * 8, None)],
        )


def test_corruption_contract(tmp_path):
    p = str(tmp_path / "c.avro")
    write_container(p, _SCHEMA, _rows(50))
    good = open(p, "rb").read()
    with pytest.raises(ValueError, match="magic"):
        read_header(str(_write(tmp_path, "bad1.avro", b"XXXX" + good[4:])))
    # corrupt the sync marker of the first block
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        block_offsets(str(_write(tmp_path, "bad2.avro", bytes(bad))))
    # truncation inside a block
    with pytest.raises(ValueError):
        blocks = block_offsets(p)
        trunc = str(_write(tmp_path, "bad3.avro", good[: blocks[0][0] + 4]))
        list(read_block(trunc, blocks[0][0]))


def _write(tmp_path, name, data):
    q = tmp_path / name
    q.write_bytes(data)
    return q


def test_spark_scan_per_block_parallelism(spark, tmp_path):
    from articulation_vector_db_api_spark.sources.avro_pyds import (
        register_avro_source,
    )

    d = str(tmp_path)
    rows = _rows(3000)
    write_container(
        os.path.join(d, "a.avro"), _SCHEMA, rows, records_per_block=500
    )
    register_avro_source(spark)
    df = spark.read.format("avro_py").option("path", d).load()
    assert df.schema.simpleString() == (
        "struct<id:bigint,name:string,score:double,ok:boolean>"
    )
    # one task per container block
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 3000
    assert df.filter("name IS NULL").count() == 600
    total = df.agg({"id": "sum"}).first()[0]
    assert total == sum(r[0] for r in rows)


def test_union_n_writer_rejects_mismatched_values():
    """The union_n write path keeps the ValueError contract for value
    shapes the branch cannot encode (ADVICE r9: struct mode did
    list(v) on non-sequences, single/promote modes leaked
    TypeError/AttributeError from the primitive writers)."""
    import pytest

    from articulation_vector_db_api_spark.sources.avro import (
        _parse_type,
        _write_value,
    )

    # struct-mode union: non-sequence value
    tree = _parse_type(["int", "string"], {}, None)
    assert tree[1][1] == "struct"
    with pytest.raises(ValueError, match="memberN sequence"):
        _write_value(bytearray(), tree, 7)
    with pytest.raises(ValueError, match="memberN sequence"):
        _write_value(bytearray(), tree, "seven")

    # single-branch union: value the primitive cannot encode
    single = _parse_type(["string"], {}, None)
    assert single[1][1] == "single"
    with pytest.raises(ValueError, match="cannot encode"):
        _write_value(bytearray(), single, 7)
    out = bytearray()
    _write_value(out, single, "ok")  # happy path unchanged
    assert out

    single_bytes = _parse_type(["bytes"], {}, None)
    with pytest.raises(ValueError, match="cannot encode"):
        _write_value(bytearray(), single_bytes, 7)  # bytes(7) trap

    # promote union: non-numeric value has no branch
    promo = _parse_type(["int", "double"], {}, None)
    assert promo[1][1] == "promote_double"
    with pytest.raises(ValueError, match="no Avro union branch"):
        _write_value(bytearray(), promo, "3.5")
    with pytest.raises(ValueError, match="no Avro union branch"):
        _write_value(bytearray(), promo, True)
