"""End-to-end ingest of the reference's real PDF corpus.

The closest analog of the reference's own smoke test
(/root/reference/test_api.sh): ingest every PDF in
/root/reference/pdfs, then run the test script's search query against
the built index. 7 of the 40 PDFs carry a text layer; the rest are
image-only scans that extract to "" (with pypdf and with the fallback
parser alike) and are dropped at the empty-text filter — processed,
not failed.

Golden values are pinned for the pure-Python fallback extractor
(functions/pdftext.py). With pypdf installed the extracted text —
hence chunk ids and scores — differs slightly, so the exact goldens
are gated on pypdf being absent; the structural contract is asserted
either way.
"""

from __future__ import annotations

import os

import pytest

from articulation_vector_db_api_spark.operators.ingest import ingest_corpus
from articulation_vector_db_api_spark.operators.search import topk_search_indexed

CORPUS = "/root/reference/pdfs"
SMOKE_QUERY = "What are the articulation agreements for University of Florida?"


def _has_pypdf() -> bool:
    try:
        import pypdf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(scope="module")
def corpus_index(spark, tmp_path_factory):
    if not os.path.isdir(CORPUS):
        pytest.skip("reference corpus not present")
    table = str(tmp_path_factory.mktemp("refcorpus") / "chunks")
    result = ingest_corpus(spark, CORPUS, table, "*.pdf")
    return table, result


def test_corpus_ingest_counts(corpus_index):
    _, result = corpus_index
    assert result["files_processed"] == 40
    assert result["files_failed"] == 0
    assert len(result["sources_processed"]) == 40
    assert result["sources_truncated"] == 0  # under MAX_RESPONSE_TITLES
    assert result["sources_processed"] == sorted(result["sources_processed"])
    assert result["ingested_count"] > 0


def test_corpus_ingest_chunk_golden(corpus_index):
    if _has_pypdf():
        pytest.skip("golden pinned for the fallback extractor")
    _, result = corpus_index
    # 7 text-bearing PDFs -> 63 chunks under the 1000/800 chunker.
    # History: 61 through r14. The r15 Type0/Identity-H tier
    # (functions/pdftext.py, VERDICT r14 item 5) revealed that THREE
    # of the seven carry composite fonts the legacy scrape was
    # mis-decoding: AA_Association_of_Jesuit_... gains ~1600 chars of
    # real CID-encoded text (+2 chunks), AA_FIU_business drops a
    # mojibake line, 07-08att decodes 'Accounting Technology'-class
    # headings that previously surfaced as \x00-interleaved bytes.
    # The four simple-font PDFs extract byte-identically
    # (tests/test_pdftext_type0.py pins tier-2-vs-legacy equality for
    # every reference PDF where tier 2 declines).
    assert result["ingested_count"] == 63


def test_corpus_smoke_search(spark, corpus_index):
    table, _ = corpus_index
    rows = topk_search_indexed(spark, table, SMOKE_QUERY, 3).collect()
    assert len(rows) == 3
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.text for r in rows)
    if not _has_pypdf():
        assert [r.id for r in rows] == [
            "AA_ICUF_0",
            "AA_Association_of_Jesuit_Colleges_and_Universitites_6",
            "07-08att_3",
        ]


def test_corpus_reingest_idempotent(spark, corpus_index):
    """Re-ingesting the same corpus must not duplicate chunks (dynamic
    partition overwrite = last-write-wins per source, main.py:163,172)."""
    table, result = corpus_index
    again = ingest_corpus(spark, CORPUS, table, "*.pdf")
    assert again["ingested_count"] == result["ingested_count"]
    assert spark.read.parquet(table).count() == result["ingested_count"]
