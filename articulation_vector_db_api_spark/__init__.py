"""articulation_vector_db_api_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference service ``jongan69/articulation-vector-db-api``
(a FastAPI → Pinecone RAG API: PDF ingest → chunk → hash-embedding →
cosine top-k search; see /root/reference/main.py), re-expressed Spark-first:

- storage: columnar Parquet tables instead of a managed vector index
- query: Catalyst logical plans (DataFrame/SQL) instead of remote ANN RPCs
- ingest: one distributed job (binaryFile scan -> extract -> chunk ->
  embed -> upsert-write) instead of a per-file Python loop
- beyond the reference: the full relational operator surface, streaming,
  and LLM-data-pipeline operators (dedup, similarity search, multimodal
  columns, text analysis), each designed for 100 TB scale.

Everything here derives from public knowledge only (Apache Spark APIs and
the public reference repo).
"""

__version__ = "0.1.0"
