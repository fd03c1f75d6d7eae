"""Ingest pipeline (reference O1-O7, /root/reference/main.py:255-311).

Reference write path: glob PDFs → per-file Python loop → extract text →
chunk → embed → one unbatched Pinecone upsert per file, with per-file
fault isolation (failures collected, 500 only if ALL fail,
main.py:285-302).

Engine: ONE distributed job —
    binaryFile scan → extraction pandas_udf (per-row fault isolation)
    → SQL chunker → SQL hash embedder → parquet write partitioned by
    source with dynamic partition overwrite (= last-write-wins upsert
    at source granularity, the engine twin of chunk-id upsert
    main.py:163,172 since chunk ids are {title}_{i} within a source).

Scale: extraction is the only Python stage and it is Arrow-batched;
everything downstream is codegen. The write is append-free overwrite
of exactly the ingested sources' partitions — idempotent re-ingest,
no read-modify-write of the whole table. At 100 TB add bucketing
(``bucketBy(N, "id")``) so downstream joins on chunk id elide their
shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.chunking import chunk_documents
from ..functions.embedding import hash_embedding_from_hex

# Cap on the IngestResponse's per-title list (main.py:311 names every
# title; fine for a 40-PDF smoke corpus, unbounded for a 40M-file one).
# Responses list at most this many titles plus an overflow count.
MAX_RESPONSE_TITLES = 1000

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _extract_one(path: str, content: bytes) -> tuple[str | None, str | None]:
    """Extract text from one binary payload. PDF via pypdf when
    available (the reference's extractor, main.py:106-115), else the
    pure-Python fallback parser (functions/pdftext.py); plain text via
    UTF-8 decode. A valid but text-less PDF (image-only scan) returns
    "" with no error on both paths — the empty-text filter downstream
    drops it, exactly as it drops pypdf's empty extractions. Returns
    (text, error) — never raises, mirroring the reference's per-file
    try/except (main.py:291-296)."""
    try:
        low0 = path.lower()
        if low0.endswith(".rar"):
            raise NotImplementedError(
                "rar archives (proprietary format, no stdlib or "
                "from-scratch codec) — repack as tar/zip/7z"
            )
        if low0.endswith((".7z", ".tar", ".zip")):
            # archives are multi-document containers: they explode at
            # the explode_archives tier, one row per member — a named
            # error beats a misleading utf-8 decode failure here
            raise ValueError(
                "archive at the document tier — route the corpus "
                "through explode_archives for per-member rows"
            )
        if low0.endswith((".zst", ".zstd")) and not low0.endswith(
            (".tar.zst", ".tar.zstd")
        ):
            # Zstandard members (r15): the distribution format of
            # Dolma/RedPajama/SlimPajama-class public corpora
            # (.jsonl.zst). decompress_zstd_fast = libzstd-speed path
            # with the from-scratch RFC 8878 decoder
            # (functions/zstd.py) as reference + fallback; same bomb
            # bound and inner-extension re-dispatch as the .gz path.
            from ..functions.zstd import decompress_zstd_fast

            inner = decompress_zstd_fast(bytes(content), _MAX_MEMBER)
            return _extract_one(path[: path.rfind(".")], inner)
        if low0.endswith((".gz", ".bz2", ".xz")) and not low0.endswith(
            (".tar.gz", ".tar.bz2", ".tar.xz")
        ):
            # transparently decompress SINGLE-file compression and
            # re-dispatch on the inner extension (corpus members
            # commonly arrive as .txt.gz / .json.bz2 — raw decode
            # ingested binary garbage before r14)
            import bz2
            import lzma
            import zlib

            make = {
                ".gz": lambda: zlib.decompressobj(wbits=31),
                ".bz2": bz2.BZ2Decompressor,
                ".xz": lzma.LZMADecompressor,
            }[low0[low0.rfind(".") :]]
            # bound the EXPANDED size (a 10 KB bomb inflates to GBs),
            # require stream COMPLETENESS (a truncated member must be
            # an error row, not silently-partial text — r14 review),
            # and walk CONCATENATED members (multi-member gzip is a
            # legal and common corpus shape)
            data = bytes(content)
            parts: list[bytes] = []
            total = 0
            while data:
                dec = make()
                out = dec.decompress(data, _MAX_MEMBER + 1 - total)
                total += len(out)
                if total > _MAX_MEMBER:
                    raise ValueError(
                        f"decompressed member too large: {path}"
                    )
                if not dec.eof:
                    raise ValueError(
                        f"truncated compressed member: {path}"
                    )
                parts.append(out)
                data = dec.unused_data.lstrip(b"\x00")
            return _extract_one(path[: path.rfind(".")], b"".join(parts))
        if path.lower().endswith(".pdf"):
            try:
                import io

                from pypdf import PdfReader  # optional dependency
            except ImportError:
                from ..functions.pdftext import extract_pdf_text

                return extract_pdf_text(bytes(content)), None
            reader = PdfReader(io.BytesIO(content))
            return "\n".join((page.extract_text() or "") for page in reader.pages), None
        low = path.lower()
        if low.endswith((".docx", ".odt", ".pptx")):
            # office formats (r13): ZIP+XML, stdlib-only extractors
            from ..functions import officetext

            fn = {
                ".docx": officetext.extract_docx_text,
                ".odt": officetext.extract_odt_text,
                ".pptx": officetext.extract_pptx_text,
            }[low[low.rfind(".") :]]
            return fn(bytes(content)), None
        if low.endswith(".epub"):
            # e-books (r14): ZIP of spine-ordered XHTML
            from ..functions.epub import extract_epub_text

            return extract_epub_text(bytes(content)), None
        if low.endswith((".html", ".htm", ".xhtml")):
            # web pages (r14): boilerplate-stripped main text — raw
            # decode would ingest tag soup
            from ..functions.htmltext import extract_main_text

            return (
                extract_main_text(
                    bytes(content).decode("utf-8", "replace")
                )["text"],
                None,
            )
        if low.endswith(".rtf"):
            # legacy rich text (r14): control-word stream, stdlib-only
            from ..functions.rtftext import extract_rtf_text

            return extract_rtf_text(bytes(content)), None
        if low.endswith((".jsonl", ".ndjson")):
            # JSON-lines corpora (r15): the record shape of Dolma /
            # RedPajama / SlimPajama-class datasets. Extract the text
            # field per record ("text", or RedPajama's "raw_content",
            # or "content"), one record per paragraph — raw decode
            # would ingest JSON syntax as document text.
            import json

            docs: list[str] = []
            for ln in bytes(content).decode("utf-8").splitlines():
                if not ln.strip():
                    continue
                rec = json.loads(ln)
                if not isinstance(rec, dict):
                    raise ValueError(
                        "JSONL record is not an object"
                    )
                for field in ("text", "raw_content", "content"):
                    if isinstance(rec.get(field), str):
                        docs.append(rec[field])
                        break
                else:
                    raise ValueError(
                        "JSONL record has no text/raw_content/"
                        "content field"
                    )
            return "\n\n".join(docs), None
        if low.endswith((".eml", ".mbox")):
            # mail corpora (r14): RFC 5322 / mboxrd via stdlib email
            from ..functions.mailtext import (
                extract_eml_text,
                extract_mbox_text,
            )

            fn = (
                extract_eml_text
                if low.endswith(".eml")
                else extract_mbox_text
            )
            return fn(bytes(content)), None
        return bytes(content).decode("utf-8"), None
    except Exception as e:  # noqa: BLE001 - fault isolation boundary
        return None, f"{type(e).__name__}: {e}"


def extract_text(corpus: DataFrame) -> DataFrame:
    """Arrow-batched extraction with per-row fault isolation (O2+O7).

    Input: binaryFile frame (path, content, ...). Output: one row per
    file with (path, source, text, error); source = basename minus
    extension (main.py:287)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in it:
            texts, errors, sources = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                text, err = _extract_one(path, content)
                texts.append(text)
                errors.append(err)
                base = os.path.basename(path)
                sources.append(base.rsplit(".", 1)[0] if "." in base else base)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "source": sources,
                    "text": texts,
                    "error": errors,
                }
            )

    return corpus.select("path", "content").mapInPandas(batches, EXTRACT_SCHEMA)


def build_chunk_rows(extracted: DataFrame) -> DataFrame:
    """Chunk + embed successfully-extracted docs into upsertable rows:
    (id = {source}_{pos}, source, pos, text, embedding) — the
    reference's item shape (main.py:158-170)."""
    ok = extracted.filter(F.col("error").isNull() & (F.length("text") > 0))
    chunks = chunk_documents(ok, id_col="source", text_col="text")
    return (
        chunks.withColumn("_hex", F.sha2(F.col("chunk_text"), 256))
        .select(
            F.col("chunk_id").alias("id"),
            "source",
            "pos",
            F.col("chunk_text").alias("text"),
            hash_embedding_from_hex(F.col("_hex")).alias("embedding"),
        )
    )


def write_chunk_table(chunks: DataFrame, path: str) -> None:
    """Partitioned-overwrite upsert sink (O6). Dynamic mode rewrites
    ONLY the partitions present in this batch — re-ingesting a source
    replaces its chunks and touches nothing else.

    The batch is clustered on the partition column first: without it,
    every one of the N upstream tasks opens a writer per source it
    holds (N x |sources| small files per batch — measured 2.2x the
    whole ingest time at sf0.1). Clustered, each source is one file
    per batch; ``maxRecordsPerFile`` re-splits any oversized source so
    a hot partition can't produce an unsplittable giant file at scale.
    """
    spark = chunks.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        chunks.repartition("source").write.mode("overwrite").option(
            "maxRecordsPerFile", 5_000_000
        ).partitionBy("source").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def ingest_corpus(spark: SparkSession, corpus_dir: str, table_path: str, glob: str = "*") -> dict:
    """End-to-end ingest (O1-O7). Returns the reference's response
    shape {ingested_count, files_processed, files_failed}
    (main.py:304-311); raises only if EVERY file failed
    (main.py:298-302)."""
    from ..sources.readers import load_binary_corpus

    corpus = load_binary_corpus(spark, corpus_dir, glob)
    extracted = extract_text(corpus).cache()
    try:
        status = (
            extracted.groupBy(F.col("error").isNull().alias("ok"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n_ok = sum(r.n for r in status if r.ok)
        n_fail = sum(r.n for r in status if not r.ok)
        if n_ok == 0:
            # Slice in the plan, not after collect: only 3 sample
            # failure messages ever reach the driver.
            failures = [
                r.error
                for r in extracted.filter("error IS NOT NULL").limit(3).collect()
            ]
            raise RuntimeError(f"all {n_fail} files failed ingestion: {failures}")
        chunks = build_chunk_rows(extracted)
        write_chunk_table(chunks, table_path)
        n_chunks = spark.read.parquet(table_path).count()
        # The reference's IngestResponse carries the processed titles
        # (main.py:311). At smoke scale every title fits, but the
        # serving path must not collect an unbounded list for a 40M-file
        # corpus: list the first MAX_RESPONSE_TITLES (sorted in the
        # PLAN, so only the listed prefix reaches the driver) and report
        # the overflow as a count.
        listed = (
            extracted.filter("error IS NULL")
            .select("source")
            .orderBy("source")
            .limit(MAX_RESPONSE_TITLES)
            .collect()
        )
        sources = [r.source for r in listed]
        return {
            "ingested_count": n_chunks,
            "files_processed": n_ok,
            "files_failed": n_fail,
            "sources_processed": sources,
            "sources_truncated": max(0, n_ok - len(sources)),
        }
    finally:
        extracted.unpersist()


ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)

_ARCHIVE_EXTS = (
    ".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tar.xz", ".txz", ".zip",
    ".tar.zst", ".tar.zstd", ".7z",
)
_MAX_MEMBER = 1 << 28  # 256 MB per member: decompression-bomb guard
_MAX_ARCHIVE = 1 << 30  # 1 GB whole-archive cap (.tar.zst pre-decode)


def _explode_one(path: str, content: bytes) -> list[tuple]:
    """One archive -> [(path, member, bytes, None)] rows, or a single
    (path, None, None, error) row — the per-FILE fault isolation
    boundary of O7, at archive granularity. Non-archive paths pass
    through as their own single member (member = None)."""
    import io
    import tarfile
    import zipfile

    low = path.lower()
    try:
        rows: list[tuple] = []
        if low.endswith(".7z"):
            # 7-Zip archives (r15): from-scratch container parsing
            # (functions/sevenzip.py) with stdlib codecs; the member
            # bound rides through parse_7z's bomb guard
            from ..functions.sevenzip import parse_7z

            for name, blob in parse_7z(content, _MAX_MEMBER):
                rows.append((path, name, blob, None))
        elif low.endswith(".zip"):
            with zipfile.ZipFile(io.BytesIO(content)) as z:
                for info in z.infolist():
                    if info.is_dir():
                        continue
                    if info.file_size > _MAX_MEMBER:
                        raise ValueError(
                            f"archive member too large: {info.filename}"
                        )
                    rows.append(
                        (path, info.filename, z.read(info), None)
                    )
        elif low.endswith(_ARCHIVE_EXTS):
            if low.endswith((".tar.zst", ".tar.zstd")):
                # tarfile has no zstd mode pre-3.14: decode the frame
                # first (functions/zstd.py fast path). The bound here
                # covers the WHOLE tarball, so it is the archive cap,
                # not the per-member cap — a multi-member archive
                # larger than one member's limit is legitimate
                # (r15 review; members are still bounded individually
                # in the walk below)
                from ..functions.zstd import decompress_zstd_fast

                content = decompress_zstd_fast(
                    bytes(content), _MAX_ARCHIVE
                )
                mode = "r:"
            else:
                mode = (
                    "r:gz" if low.endswith((".tar.gz", ".tgz"))
                    else "r:bz2" if low.endswith(".tar.bz2")
                    else "r:xz" if low.endswith((".tar.xz", ".txz"))
                    else "r:"
                )
            with tarfile.open(
                fileobj=io.BytesIO(content), mode=mode
            ) as tf:
                for info in tf:
                    if not info.isfile():
                        continue
                    if info.size > _MAX_MEMBER:
                        raise ValueError(
                            f"archive member too large: {info.name}"
                        )
                    f = tf.extractfile(info)
                    rows.append(
                        (path, info.name, f.read() if f else b"", None)
                    )
        else:
            return [(path, None, bytes(content), None)]
        if not rows:
            raise ValueError("archive with no file members")
        return rows
    except Exception as e:  # noqa: BLE001 - fault isolation boundary
        return [(path, None, None, f"{type(e).__name__}: {e}")]


def explode_archives(corpus: DataFrame) -> DataFrame:
    """Archive-aware corpus expansion (r14): .tar/.tar.gz/.tgz/
    .tar.bz2/.zip rows fan out to one row per file member (the member
    name rides along for dispatch); other rows pass through. Rows
    multiply INSIDE the Arrow batch — no shuffle, no driver loop —
    so a 100 TB corpus of tarballs reads as one narrow map whose
    output is the per-document frame ``extract_text`` consumes (use
    ``F.concat(path, '!', member)`` as the extraction path so the
    member extension drives the format dispatch)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                out.extend(_explode_one(str(path), bytes(content)))
            yield pd.DataFrame(
                out, columns=[f.name for f in ARCHIVE_SCHEMA.fields]
            )

    return corpus.select("path", "content").mapInPandas(
        batches, ARCHIVE_SCHEMA
    )
