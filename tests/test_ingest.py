"""Ingest pipeline fixtures (FIXTURES.md B4/B5; reference
/root/reference/main.py:255-311 semantics): upsert idempotence and
per-file fault isolation."""

from __future__ import annotations

import pytest

from articulation_vector_db_api_spark.operators.ingest import ingest_corpus
from articulation_vector_db_api_spark.operators.stats import health, index_stats


@pytest.fixture
def corpus(tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "alpha.txt").write_text("alpha " * 300)  # > 1 chunk
    (docs / "beta.txt").write_text("beta content")
    return docs, tmp_path / "chunks"


def test_ingest_roundtrip(spark, corpus):
    docs, table = corpus
    result = ingest_corpus(spark, str(docs), str(table), glob="*.txt")
    assert result["files_processed"] == 2
    assert result["files_failed"] == 0
    df = spark.read.parquet(str(table))
    assert result["ingested_count"] == df.count() > 2
    stats = index_stats(df)
    assert stats["dimension"] == 1024
    assert set(stats["namespaces"]) == {"alpha", "beta"}
    assert health(spark, str(table))["status"] == "healthy"


def test_reingest_is_idempotent_upsert(spark, corpus):
    docs, table = corpus
    ingest_corpus(spark, str(docs), str(table), glob="*.txt")
    first = {(r.id, r.text) for r in spark.read.parquet(str(table)).collect()}

    # re-ingest unchanged → identical table (last-write-wins, main.py:163,172)
    ingest_corpus(spark, str(docs), str(table), glob="*.txt")
    second = {(r.id, r.text) for r in spark.read.parquet(str(table)).collect()}
    assert first == second

    # re-ingest with modified beta → only beta's partition replaced
    (docs / "beta.txt").write_text("totally new beta")
    ingest_corpus(spark, str(docs), str(table), glob="*.txt")
    df = spark.read.parquet(str(table))
    beta = df.filter("source = 'beta'").collect()
    assert [r.text for r in beta] == ["totally new beta"]
    alpha_before = {t for (i, t) in first if i.startswith("alpha")}
    alpha_after = {r.text for r in df.filter("source = 'alpha'").collect()}
    assert alpha_before == alpha_after


def test_fault_isolation(spark, corpus):
    docs, table = corpus
    (docs / "broken.txt").write_bytes(b"\xff\xfe invalid \xff utf8")
    result = ingest_corpus(spark, str(docs), str(table), glob="*.txt")
    assert result["files_processed"] == 2
    assert result["files_failed"] == 1  # loop continues past failures, main.py:291-296
    sources = {r.source for r in spark.read.parquet(str(table)).collect()}
    assert sources == {"alpha", "beta"}


def test_all_failed_raises(spark, tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "bad.txt").write_bytes(b"\xff\xfe\xff")
    with pytest.raises(RuntimeError, match="all 1 files failed"):
        # 500 only when zero succeed, main.py:298-302
        ingest_corpus(spark, str(docs), str(tmp_path / "chunks"), glob="*.txt")


def test_ingest_then_search_roundtrip(spark, corpus):
    """The reference's steady-state workflow end-to-end: ingest a
    corpus, then serve top-k searches from the written index."""
    from articulation_vector_db_api_spark.operators.search import topk_search_indexed

    docs, table = corpus
    ingest_corpus(spark, str(docs), str(table), glob="*.txt")
    hits = topk_search_indexed(spark, str(table), "alpha", top_k=3).collect()
    assert 0 < len(hits) <= 3
    assert hits[0].source in {"alpha", "beta"}
    scores = [h.score for h in hits]
    assert scores == sorted(scores, reverse=True)
    # identical text must score cosine 1.0 against itself: search for
    # the exact stored chunk text (hash embedding ⇒ exact-dup retrieval)
    probe_text = hits[0].text
    exact = topk_search_indexed(spark, str(table), probe_text, top_k=1).collect()
    assert exact[0].score == 1.0


def test_health_degraded_on_missing_table(spark, tmp_path):
    report = health(spark, str(tmp_path / "nope"))
    assert report["status"] == "degraded"
    assert "message" in report


def test_explode_archives_dataframe_operator(spark):
    """r14: archive rows fan out to one row per member inside the
    Arrow batch; flat rows pass through; a corrupt archive yields ONE
    isolated error row."""
    import io
    import tarfile
    import zipfile

    from articulation_vector_db_api_spark.operators.ingest import (
        explode_archives,
        extract_text,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in [(b"a.txt", b"alpha"), (b"d/b.txt", b"beta")]:
            info = tarfile.TarInfo(name.decode())
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w") as z:
        z.writestr("c.txt", "gamma")
    corpus = spark.createDataFrame(
        [
            ("corpus.tar.gz", bytearray(buf.getvalue())),
            ("more.zip", bytearray(zb.getvalue())),
            ("flat.txt", bytearray(b"delta")),
            ("broken.zip", bytearray(b"garbage")),
        ],
        "path string, content binary",
    )
    rows = {
        (r.path, r.member): (bytes(r.content) if r.content is not None
                             else None, r.error)
        for r in explode_archives(corpus).collect()
    }
    assert rows[("corpus.tar.gz", "a.txt")] == (b"alpha", None)
    assert rows[("corpus.tar.gz", "d/b.txt")] == (b"beta", None)
    assert rows[("more.zip", "c.txt")] == (b"gamma", None)
    assert rows[("flat.txt", None)] == (b"delta", None)
    content, err = rows[("broken.zip", None)]
    assert content is None and "BadZipFile" in err
    assert len(rows) == 5
    # exploded frame feeds extract_text via the member-name dispatch
    from pyspark.sql import functions as F

    exploded = explode_archives(corpus).filter("error IS NULL")
    fed = exploded.select(
        F.coalesce("member", "path").alias("path"), "content"
    )
    texts = {r.path: r.text for r in extract_text(fed).collect()}
    assert texts == {
        "a.txt": "alpha", "d/b.txt": "beta", "c.txt": "gamma",
        "flat.txt": "delta",
    }


def test_explode_tar_xz():
    """r14 self-review: .tar.xz / .txz are stdlib-covered (lzma) and
    common for corpus tarballs."""
    import io
    import tarfile

    from articulation_vector_db_api_spark.operators.ingest import (
        _explode_one,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:xz") as tf:
        info = tarfile.TarInfo("x.txt")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"xz"))
    for name in ("c.tar.xz", "c.txz"):
        rows = _explode_one(name, buf.getvalue())
        assert rows == [(name, "x.txt", b"xz", None)]


def test_single_file_compression_dispatch():
    """r14: .txt.gz / .json.bz2 / .rtf.xz corpus members decompress
    transparently and re-dispatch on the inner extension; 7z/rar get
    a NAMED gate instead of a misleading decode error; bombs bound."""
    import bz2
    import gzip
    import lzma

    from articulation_vector_db_api_spark.functions.rtftext import (
        build_rtf,
    )
    from articulation_vector_db_api_spark.operators.ingest import (
        _extract_one,
    )

    assert _extract_one("a.txt.gz", gzip.compress(b"hello gz")) == (
        "hello gz", None,
    )
    assert _extract_one("b.txt.bz2", bz2.compress(b"hello bz2")) == (
        "hello bz2", None,
    )
    text, err = _extract_one(
        "c.rtf.xz", lzma.compress(build_rtf(["inner rtf"]))
    )
    assert (text, err) == ("inner rtf", None)
    # tarballs still route to the archive path, not here
    text, err = _extract_one("d.tar.gz", gzip.compress(b"not a tar"))
    assert text is None and err  # archives aren't single-doc text
    # archives at the document tier get a NAMED routing error (7z is
    # a supported CONTAINER as of r15 — it explodes per member at the
    # explode_archives tier, not here); rar stays an honest codec gate
    text, err = _extract_one("e.7z", b"7z\xbc\xaf\x27\x1c")
    assert text is None and "explode_archives" in err
    text, err = _extract_one("e.rar", b"Rar!\x1a\x07\x00")
    assert text is None and "NotImplementedError" in err
    # bomb guard: 300 MB of zeros compresses to ~300 KB
    bomb = gzip.compress(b"\0" * (300 << 20), compresslevel=9)
    text, err = _extract_one("f.txt.gz", bomb)
    assert text is None and "too large" in err


def test_compressed_member_completeness_and_concat():
    """r14 review: a truncated .gz member must be an ERROR row, not
    silently-partial text; concatenated multi-member gzip (a legal,
    common corpus shape) yields ALL members' text."""
    import gzip

    from articulation_vector_db_api_spark.operators.ingest import (
        _extract_one,
    )

    full = gzip.compress(b"hello truncation world")
    text, err = _extract_one("t.txt.gz", full[: len(full) // 2])
    assert text is None and "truncated" in err
    two = gzip.compress(b"part one. ") + gzip.compress(b"part two.")
    text, err = _extract_one("c.txt.gz", two)
    assert (text, err) == ("part one. part two.", None)
