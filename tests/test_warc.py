"""WARC reader/writer (sources/warc.py) + the ``warc_py`` Python Data
Source (sources/warc_pyds.py)."""

from __future__ import annotations

import os

import pytest

from articulation_vector_db_api_spark.sources.warc import (
    read_index,
    read_member,
    write_warc,
)


def _records(n):
    return [
        (
            "response",
            f"https://x.test/{i}",
            f"payload {i} with bytes é世".encode() * (i % 3 + 1),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_member_roundtrip_exact(tmp_path, gz):
    p = str(tmp_path / "a.warc.gz")
    recs = _records(20)
    write_warc(p, recs, per_record_gzip=gz)
    idx = read_index(p)
    assert len(idx) == 20
    for (rec_type, uri, payload), (off, length) in zip(recs, idx):
        got = read_member(p, off, length)
        assert got == {"rec_type": rec_type, "uri": uri, "payload": payload}


def test_members_are_independent(tmp_path):
    # any member can be read without touching its neighbors — the
    # property the per-member InputPartition split depends on
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, _records(5))
    idx = read_index(p)
    got = read_member(p, *idx[3])
    assert got["uri"] == "https://x.test/3"


def test_corruption_contract(tmp_path):
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, _records(2), per_record_gzip=False)
    idx = read_index(p)
    with open(p, "r+b") as f:
        f.seek(idx[0][0])
        f.write(b"HARC/1.0")
    with pytest.raises(ValueError, match="version line"):
        read_member(p, *idx[0])
    # truncated block: lie about the length in the index
    off, length = idx[1]
    with pytest.raises(ValueError, match="truncated|terminator"):
        read_member(p, off, length - 6)


def test_range_reader_streams_contiguous_members(tmp_path):
    from articulation_vector_db_api_spark.sources.warc import (
        read_members_range,
    )

    for gz in (True, False):
        p = str(tmp_path / f"r{int(gz)}.warc.gz")
        recs = _records(6)
        write_warc(p, recs, per_record_gzip=gz)
        idx = read_index(p)
        start = idx[1][0]
        end = idx[4][0] + idx[4][1]
        got = list(read_members_range(p, start, end, 4))
        assert [g["uri"] for g in got] == [u for _, u, _ in recs[1:5]]
        assert [g["payload"] for g in got] == [pl for _, _, pl in recs[1:5]]


def test_spark_scan_partitions_track_bytes_not_records(spark, tmp_path):
    from articulation_vector_db_api_spark.sources.warc_pyds import (
        register_warc_source,
    )

    d = str(tmp_path)
    write_warc(os.path.join(d, "a.warc.gz"),
               [("warcinfo", "x", b"crawler")] + _records(7))
    register_warc_source(spark)
    reader = (
        spark.read.format("warc_py")
        .option("path", os.path.join(d, "a.warc.gz"))
    )
    # default 4 MiB target: this tiny archive is ONE task — task count
    # must track archive bytes, never record count
    df = reader.load()
    assert df.schema.simpleString() == (
        "struct<rec_type:string,uri:string,payload:binary>"
    )
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 8
    # a small target forces multiple range partitions, same rows
    df2 = reader.option("target_bytes", 400).load()
    assert df2.rdd.getNumPartitions() > 1
    assert df2.count() == 8
    assert df2.filter("rec_type = 'response'").count() == 7
    total = df2.filter("rec_type = 'response'").selectExpr(
        "sum(length(payload)) v"
    ).first().v
    assert total == sum(len(p) for _, _, p in _records(7))


def test_folded_header_continuation():
    """ISO 28500 §4 permits folded named fields (continuation lines
    starting with SP/HT) — e.g. a long WARC-Target-URI split across
    lines must parse as one value, not reject the record (ADVICE r7)."""
    from articulation_vector_db_api_spark.sources.warc import _parse_record

    payload = b"hello folded world"
    record = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.test/very/\r\n"
        b"\tlong/path?q=1\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    got = _parse_record(record)
    assert got["uri"] == "https://x.test/very/ long/path?q=1"
    assert got["payload"] == payload
    # a continuation with no preceding header is still malformed
    import pytest as _pytest

    bad = (
        b"WARC/1.0\r\n"
        b" orphan continuation\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    with _pytest.raises(ValueError, match="continuation"):
        _parse_record(bad)
