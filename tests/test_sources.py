"""Source/sink format coverage (SURVEY §2.2 'Scans/sources' +
'Sinks'): csv / json / text / parquet / binaryFile, always with
explicit schemas."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from articulation_vector_db_api_spark.sources.readers import load_binary_corpus

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [(1, "alpha", 0.5), (2, "beta", 1.25), (3, "gamma", -2.0)]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(SCHEMA).option("header", True).csv(path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(SCHEMA).json(path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_text_source(spark, tmp_path):
    p = tmp_path / "txt"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    back = spark.read.text(str(p))
    assert sorted(r.value for r in back.collect()) == ["line one", "line two"]


def test_binary_file_source(spark, tmp_path):
    p = tmp_path / "bin"
    p.mkdir()
    (p / "x.pdf").write_bytes(b"%PDF-1.4 fake")
    (p / "skip.txt").write_text("nope")
    df = load_binary_corpus(spark, str(p), glob="*.pdf")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 1
    assert bytes(rows[0].content).startswith(b"%PDF")


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(30)], "id long, source string"
    )
    path = str(tmp_path / "part")
    df.write.mode("overwrite").partitionBy("source").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("source") == "src1")
    assert pruned.count() == 10
    # partition pruning must reach the scan (PartitionFilters)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "src1" in plan


def test_orc_roundtrip(spark, tmp_path):
    """ORC: the second columnar format Spark ships natively — same
    predicate-pushdown/column-pruning contract as parquet, so a
    warehouse can interop with Hive-era ORC data without converters."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.schema(SCHEMA).orc(path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)
    # pushdown reaches the ORC scan too
    plan = (
        spark.read.orc(path).filter(F.col("k") > 1)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(k,1" in plan


def test_compressed_json_source(spark, tmp_path):
    """Gzip-compressed JSON reads transparently (codec from extension)
    — the common crawl-dump shape; note gzip files are NOT splittable,
    so at 100 TB the decompress pass rewrites to parquet first."""
    import gzip, json as _json

    p = tmp_path / "jz"
    p.mkdir()
    with gzip.open(p / "part-0.json.gz", "wt") as f:
        for k, name, score in ROWS:
            f.write(_json.dumps({"k": k, "name": name, "score": score}) + "\n")
    back = spark.read.schema(SCHEMA).json(str(p))
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_build_once_contract(spark, tmp_path, monkeypatch):
    """similarity._build_once: builds exactly once per marker, wipes a
    partial (marker-less) build before retrying, and skips the build
    entirely when the marker is present."""
    import os

    from articulation_vector_db_api_spark.suites import similarity

    store_root = str(tmp_path / "stores")
    monkeypatch.setattr(
        similarity,
        "_app_scoped_store",
        lambda _spark, prefix, _sf: os.path.join(store_root, prefix),
    )
    calls = []

    def build(p):
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, "artifact"), "w") as f:
            f.write("v1")
        calls.append(p)

    s1 = similarity._build_once(spark, "bo", "sfX", build)
    assert calls == [s1] and os.path.exists(os.path.join(s1, "artifact"))
    assert os.path.exists(os.path.join(s1, "_STORE_COMPLETE"))

    # marker present: second touch must NOT rebuild
    similarity._build_once(spark, "bo", "sfX", build)
    assert len(calls) == 1

    # simulate a crash mid-build: artifact exists but marker is gone —
    # the next touch wipes the partial and rebuilds from scratch
    os.remove(os.path.join(s1, "_STORE_COMPLETE"))
    with open(os.path.join(s1, "stale"), "w") as f:
        f.write("leftover")
    similarity._build_once(spark, "bo", "sfX", build)
    assert len(calls) == 2
    assert not os.path.exists(os.path.join(s1, "stale"))  # partial wiped
    assert os.path.exists(os.path.join(s1, "_STORE_COMPLETE"))


def test_rf64_bw64_wav_decode():
    """RF64/BW64 (EBU Tech 3306): the >4 GB broadcast WAV form — the
    32-bit RIFF/data sizes hold 0xFFFFFFFF and a leading ds64 chunk
    carries the 64-bit truth. Decode must be bit-identical to the
    plain RIFF twin, and a ds64 in a plain RIFF stream raises."""
    import struct

    import numpy as np
    import pytest

    from articulation_vector_db_api_spark.functions.audio import (
        decode_wav,
        encode_wav,
    )

    pcm = np.arange(-300, 300, dtype=np.int16)
    riff = encode_wav(pcm, 22050)
    rate0, s0 = decode_wav(riff)

    # rewrite as RF64: magic, RIFF size -> -1, prepend ds64 after WAVE
    data_at = riff.find(b"data")
    (data_size,) = struct.unpack_from("<I", riff, data_at + 4)
    ds64 = (
        b"ds64"
        + struct.pack("<I", 28)
        + struct.pack("<QQQ", len(riff) - 8 + 36, data_size, len(pcm))
        + struct.pack("<I", 0)  # table length 0
    )
    body = bytearray(riff[12:])
    at = bytes(body).find(b"data")
    struct.pack_into("<I", body, at + 4, 0xFFFFFFFF)
    rf64 = (
        b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + ds64 + bytes(body)
    )
    for magic in (b"RF64", b"BW64"):
        rate1, s1 = decode_wav(magic + rf64[4:])
        assert rate1 == rate0
        assert np.array_equal(s1, s0)
    # ds64 in a plain RIFF stream is malformed
    bad = b"RIFF" + rf64[4:]
    with pytest.raises(ValueError, match="ds64"):
        decode_wav(bad)
