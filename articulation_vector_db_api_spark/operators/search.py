"""Top-k vector similarity search (reference O8-O10).

Reference read path (/root/reference/main.py:176-216, 314-333): embed
the query, ANN-query Pinecone with top_k, project id/score/metadata,
drop empty-text matches, assemble an ordered context string.

Spark-first equivalent: the chunk table is a columnar DataFrame; the
query vector is a constant-foldable expression; scoring is a codegen'd
cosine fold; ``ORDER BY score DESC LIMIT k`` plans as
``TakeOrderedAndProject`` — per-partition top-k heaps merged on the
driver, no global sort and no shuffle of the full table. That is the
exact distributed analog of Pinecone's top_k pushdown (main.py:185) and
scales linearly with executor count at 100 TB.

Tie-breaking: Pinecone leaves tie order unspecified; the engine defines
the total order ``score DESC, id ASC`` (SURVEY §4.3.5) so results are
deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import math
import os

from ..functions.chunking import chunk_documents
from ..functions.embedding import hash_embedding_from_hex, hash_embedding_py
from ..functions.vector import dot, l2_norm
from ..sources.readers import load_table, spread_input

DEFAULT_TOP_K = 5  # main.py:89


def query_vector_literals(query: str, dim: int | None = None) -> tuple[list[float], float]:
    """Query embedding + its L2 norm as DRIVER-side literals.

    The query vector is a constant; evaluating its 1024-element
    expression tree per probe row would triple the scoring cost (Spark
    does not constant-fold through higher-order functions). CPython and
    SQL produce bit-identical doubles here (same IEEE ops in the same
    order — functions/embedding.py), so both the Spark plan and the
    DuckDB oracle inline the exact same literals."""
    qv = hash_embedding_py(query)[: (dim or None)]
    qnorm = math.sqrt(sum(x * x for x in qv))
    return qv, qnorm


def build_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → chunk rows with embeddings (the engine's 'index').

    Columns: chunk_id (``{doc_id}_{pos}``, main.py:163), source, pos,
    text, embedding. One narrow stage: scan → explode → project; at
    100 TB this is written out partitioned by ``source`` (see
    operators/ingest.py) so searches scoped to a source prune
    partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    # single-file fixture = one input split; spread the (expensive)
    # 1024-dim embedding projection across all cores — at scale the
    # scan's own splits make this a cheap rebalance
    docs = docs.transform(spread_input, sf_dir, "documents")
    chunks = chunk_documents(docs, id_col="doc_id", text_col="text")
    return (
        chunks.withColumn("_hex", F.sha2(F.col("chunk_text"), 256))
        .withColumn("embedding", hash_embedding_from_hex(F.col("_hex")))
        .select(
            F.col("chunk_id").alias("id"),
            "source",
            "pos",
            F.col("chunk_text").alias("text"),
            "embedding",
        )
    )


def topk_search(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Exact cosine top-k over the chunk index (O8 + O9).

    The query embedding and norm are driver-side literals
    (query_vector_literals) and scoring runs on the 32-dim digest
    pattern (chunk_patterns) — both mirrored exactly in the oracle.
    Empty-text matches are dropped before the limit (main.py:208), so
    total_results ≤ top_k.
    """
    if not query or not query.strip():
        # main.py:317-318 — empty query is a client error, not a plan
        raise ValueError("Query cannot be empty")
    scored = score_chunks(spark, sf_dir, query)
    return (
        scored.select(
            "id", "source", "text", F.round("raw", 6).alias("score"), "raw"
        )
        .orderBy(F.desc("raw"), F.asc("id"))
        .limit(top_k)
        .drop("raw")
    )


PATTERN_DIM = 32


def chunk_patterns(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """Chunk the corpus and attach the 32-dim scoring pattern:
    (id, source, text, pattern).

    Model-aware rewrite: the hash embedding is 32-periodic by
    construction (digest[i % 32], main.py:142), so cosine over dims
    1..32 is MATHEMATICALLY identical to cosine over all 1024
    (dot1024 = 32·dot32, norms scale by √32 on both sides). Scoring
    therefore never materializes the 1024-dim vector — a 32× cut in
    the scan's per-row work. hash_embedding_vectors still verifies
    full-dim parity; the oracles mirror this same 32-dim formula.

    ``spread`` rebalances the scan across all cores before the
    (expensive) chunk+hash projection — callers that EVALUATE the
    whole relation (the hybrid-RRF prune pass) want it; the
    single-file fixture otherwise runs the projection on one input
    split. Top-k callers skip it: TakeOrderedAndProject's per-
    partition heaps don't repay an extra shuffle of raw text."""
    docs = load_table(spark, sf_dir, "documents")
    if spread:
        docs = docs.transform(spread_input, sf_dir, "documents")
    chunks = chunk_documents(docs, id_col="doc_id", text_col="text")
    return (
        chunks.withColumn("_hex", F.sha2(F.col("chunk_text"), 256))
        .select(
            F.col("chunk_id").alias("id"),
            "source",
            F.col("chunk_text").alias("text"),
            hash_embedding_from_hex(F.col("_hex"), PATTERN_DIM).alias("pattern"),
        )
        .filter(F.length("text") > 0)
    )


def score_chunks(
    spark: SparkSession, sf_dir: str, query: str, spread: bool = False
) -> DataFrame:
    """Chunk + score the corpus against a query: (id, source, text,
    raw) with raw = cosine similarity. ``spread`` as in
    chunk_patterns."""
    index = chunk_patterns(spark, sf_dir, spread=spread)
    qv, qnorm = query_vector_literals(query, PATTERN_DIM)
    qvec = F.array(*[F.lit(v) for v in qv])  # constant-folded to one literal
    score = dot(F.col("pattern"), qvec) / (l2_norm(F.col("pattern")) * F.lit(qnorm))
    return index.withColumn("raw", score).select("id", "source", "text", "raw")


def _pattern_topk(indexed: DataFrame, query: str, top_k: int) -> DataFrame:
    """Top-k cosine over a (id, source, text, pattern) relation —
    the shared tail of every stored-index search path. Plans as
    ``TakeOrderedAndProject`` (per-partition heaps, bounded driver
    merge); the query vector is a 32-literal constant."""
    if not query or not query.strip():
        raise ValueError("Query cannot be empty")
    qv, qnorm = query_vector_literals(query, PATTERN_DIM)
    qvec = F.array(*[F.lit(v) for v in qv])
    score = dot(F.col("pattern"), qvec) / (
        l2_norm(F.col("pattern")) * F.lit(qnorm)
    )
    return (
        indexed.withColumn("raw", score)
        .select("id", "source", "text", F.round("raw", 6).alias("score"), "raw")
        .orderBy(F.desc("raw"), F.asc("id"))
        .limit(top_k)
        .drop("raw")
    )


def _indexed_patterns(chunks: DataFrame) -> DataFrame:
    """Stored chunk table -> the serving projection (id, source, text,
    pattern). Scoring slices the stored 1024-dim embedding down to its
    32-dim pattern (periodicity rewrite); column pruning means only
    the embedding + identity columns are read."""
    return chunks.filter(F.length("text") > 0).select(
        "id", "source", "text",
        F.slice(F.col("embedding"), 1, PATTERN_DIM).alias("pattern"),
    )


def topk_search_indexed(
    spark: SparkSession,
    table_path: str,
    query: str,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """Search over a WRITTEN chunk table (operators/ingest.py output) —
    the reference's steady-state: ingest once, query many
    (main.py:176-216 against the persisted index).

    A source-scoped search over the partitioned table prunes
    partitions entirely; serving tiers that issue many queries should
    ``open_serving_index`` once instead and search the cached
    projection."""
    chunks = spark.read.parquet(table_path)
    return _pattern_topk(_indexed_patterns(chunks), query, top_k)


def open_serving_index(
    spark: SparkSession, table_path: str, partition_bytes: int = 64 << 20
) -> DataFrame:
    """O15 bootstrap pre-warm: read the stored chunk table ONCE,
    project the serving columns, persist, and materialize — the
    steady-state read path then runs tiny top-k plans over in-memory
    columnar batches instead of re-opening parquet footers per request
    (the reference holds its Pinecone index handle open the same way,
    main.py:60-76).

    Partitioning is sized by DATA volume (~64 MB of source parquet per
    cached partition), not by the table's file count: a serving tier
    runs many concurrent top-k jobs, and per-task scheduling overhead
    on dozens of tiny cached partitions dominates latency long before
    compute does. At 100 TB the same rule yields thousands of
    partitions — still correct.

    MEMORY_AND_DISK: on a large cluster a 100 TB chunk table only
    partially fits executor memory — the overflow serves from local
    disk, never recomputed from source."""
    from pyspark import StorageLevel

    chunks = spark.read.parquet(table_path)
    n_parts = None
    try:
        bytes_total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(table_path)
            for f in files
            if not f.startswith(("_", "."))
        )
        n_parts = max(1, -(-bytes_total // partition_bytes))
    except OSError:
        pass  # non-local filesystem: keep the scan's own partitioning
    # the pattern norm is query-independent: compute it once at warm
    # time so every request's fold is dot-only (half the per-row work)
    df = _indexed_patterns(chunks).withColumn(
        "pnorm", l2_norm(F.col("pattern"))
    )
    if n_parts is not None and n_parts < df.rdd.getNumPartitions():
        df = df.coalesce(int(n_parts))
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()  # materialize now: the first request must not pay the scan
    return df


def topk_search_cached(
    index: DataFrame, query: str, top_k: int = DEFAULT_TOP_K
) -> DataFrame:
    """Top-k cosine over an ``open_serving_index`` relation.

    Latency-tuned twin of :func:`_pattern_topk` producing bit-identical
    scores: the scoring expression is ONE SQL string (a handful of py4j
    roundtrips instead of ~100 Column-API calls — measured ~0.3 s of
    per-request plan-build at p50 before this), the same left-to-right
    double-precision fold as functions/vector.py:dot, divided by the
    pre-computed ``pnorm`` times the query-norm literal."""
    if not query or not query.strip():
        raise ValueError("Query cannot be empty")
    qv, qnorm = query_vector_literals(query, PATTERN_DIM)
    qarr = "array(" + ", ".join(f"{v!r}D" for v in qv) + ")"
    raw_sql = (
        f"aggregate(zip_with(pattern, {qarr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v) / (pnorm * {qnorm!r}D)"
    )
    return (
        index.selectExpr("id", "source", "text", f"({raw_sql}) AS raw")
        .selectExpr("id", "source", "text", "round(raw, 6) AS score", "raw")
        .orderBy(F.desc("raw"), F.asc("id"))
        .limit(top_k)
        .drop("raw")
    )


def assemble_context(topk: DataFrame, query: str) -> DataFrame:
    """Ordered context-string aggregation (O10, main.py:324).

    ``[Source: {source}]\\n{text}`` joined by ``\\n\\n---\\n\\n`` in
    score-descending order. collect_list order is nondeterministic, so
    rank first and array_sort the (rank, fragment) structs — an ordered
    string agg without any driver-side loop.
    """
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    ranked = topk.withColumn("rnk", F.row_number().over(w)).withColumn(
        "fmt",
        F.concat(F.lit("[Source: "), F.col("source"), F.lit("]\n"), F.col("text")),
    )
    return ranked.agg(
        F.lit(query).alias("query"),
        F.count(F.lit(1)).alias("total_results"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "fmt"))),
                lambda s: s.getField("fmt"),
            ),
            "\n\n---\n\n",
        ).alias("context"),
    )


RRF_CONST = 60  # the standard Reciprocal Rank Fusion constant


def rrf_candidate_prune(kwdf: DataFrame, k_prime: int, shards: int) -> DataFrame:
    """Stage 1 of exact distributed RRF: per-shard top-k′ pruning.

    Input: a narrow scored relation ``(id, source, raw, kw_hits)`` —
    the text column must already be projected away so the one shuffle
    here ships only identity + two numbers per row. Rows are hashed
    into ``shards`` shards and ranked WITHIN each shard for both
    dimensions (one hash exchange, two window passes sharing it —
    never a partition-less window over the corpus). Any row in the
    GLOBAL top-k′ of a dimension is, a fortiori, in its shard's
    top-k′, so the ≤ ``2·shards·k_prime``-row output is a provable
    superset of both global top-k′ lists at any corpus size."""
    shard = F.pmod(F.xxhash64("id"), F.lit(shards))
    w_vec = Window.partitionBy("shard").orderBy(F.desc("raw"), F.asc("id"))
    w_kw = Window.partitionBy("shard").orderBy(F.desc("kw_hits"), F.asc("id"))
    return (
        kwdf.select("id", "source", "raw", "kw_hits")
        .withColumn("shard", shard)
        .withColumn("rv", F.row_number().over(w_vec))
        .withColumn("rk", F.row_number().over(w_kw))
        .filter((F.col("rv") <= k_prime) | (F.col("rk") <= k_prime))
        .drop("shard", "rv", "rk")
    )


def rrf_fuse_topk(
    spark: SparkSession,
    kwdf: DataFrame,
    k: int,
    k_prime: int = 128,
    shards: int = 32,
) -> DataFrame:
    """Exact top-k Reciprocal Rank Fusion without a corpus-sized
    partition-less window: ``rrf = 1/(60+rank_vec) + 1/(60+rank_kw)``
    over GLOBAL ranks, matching the naive double-global-row_number
    oracle bit-for-bit.

    Execution (the per-shard top-k′ + merge the RRF literature
    prescribes, extended so the REPORTED ranks stay globally exact):

    1. ``rrf_candidate_prune`` — one corpus scan, one narrow shuffle,
       shard-keyed windows. Collect the ≤ 2·shards·k′ survivors (the
       same bounded-driver-merge step ``TakeOrderedAndProject`` does
       internally for every top-k in this repo).
    2. Driver-side, on the bounded set: the global top-k′ lists per
       dimension (exact — the pruned set is a superset), hence exact
       global ranks for every row in either list. A row in NEITHER
       list has ``rrf < 2/(61+k′) < kth-best − 2·10⁻⁶`` and is
       provably outside the rounded top-k (the constructor asserts
       this inequality), so it is dropped.
    3. A candidate missing ONE dimension's rank (e.g. top keyword hits
       but vector rank > k′) is either (a) provably sub-threshold —
       its best-case rrf sits 2·10⁻⁶ (two rounding quanta) below the
       k-th best lower bound — and dropped, or (b) REFINED: one extra
       aggregation pass over the corpus computes its exact global rank
       as a predecessor count. The refinement set is provably small:
       a refined row's known-dimension rank r satisfies
       ``1/(60+r) ≥ 1/(60+k) − 2e-6 − 1/(61+k′)``, i.e. r ≲ 40 for
       (k=5, k′=128), so ≤ ~80 conditional sums in one scan — and the
       pass is skipped entirely when nothing needs refining.
    4. The fused tail (≤ 2k′ rows with exact ranks) computes rrf and
       takes the rounded top-k in a tiny Spark plan.

    At 100 TB: one full scan + one narrow shuffle (plus the rare
    bounded refinement scan), versus the naive plan's two corpus-sized
    Exchange SinglePartition sorts."""
    if 2.0 / (61 + k_prime) > 1.0 / (RRF_CONST + k) - 2e-6:
        raise ValueError(
            f"k_prime={k_prime} too shallow for exact top-{k} RRF: "
            f"need 2/(61+k') <= 1/(60+k) - 2e-6"
        )
    # the narrow projection is read twice (prune pass + the possible
    # refinement pass) — persist it so the expensive upstream lineage
    # (chunk + sha256 scoring) evaluates once; unpersisted before
    # returning (the fused tail is lineage-free)
    kwdf = kwdf.persist()
    try:
        return _rrf_fuse_topk_inner(spark, kwdf, k, k_prime, shards)
    finally:
        kwdf.unpersist()


def _rrf_fuse_topk_inner(
    spark: SparkSession,
    kwdf: DataFrame,
    k: int,
    k_prime: int,
    shards: int,
) -> DataFrame:
    pruned = rrf_candidate_prune(kwdf, k_prime, shards)
    rows = pruned.collect()  # bounded: ≤ 2·shards·k_prime narrow rows

    by_vec = sorted(rows, key=lambda r: (-r.raw, r.id))[:k_prime]
    by_kw = sorted(rows, key=lambda r: (-r.kw_hits, r.id))[:k_prime]
    rank_vec = {r.id: i + 1 for i, r in enumerate(by_vec)}
    rank_kw = {r.id: i + 1 for i, r in enumerate(by_kw)}
    cands = [r for r in rows if r.id in rank_vec or r.id in rank_kw]

    lb = 1.0 / (RRF_CONST + k_prime + 1)  # missing rank is > k_prime

    def _low(r):
        return (1.0 / (RRF_CONST + rank_vec[r.id]) if r.id in rank_vec else 0.0) + (
            1.0 / (RRF_CONST + rank_kw[r.id]) if r.id in rank_kw else 0.0
        )

    def _high(r):
        return (1.0 / (RRF_CONST + rank_vec[r.id]) if r.id in rank_vec else lb) + (
            1.0 / (RRF_CONST + rank_kw[r.id]) if r.id in rank_kw else lb
        )

    lows = sorted((_low(r) for r in cands), reverse=True)
    t = lows[k - 1] if len(lows) >= k else float("-inf")

    keep, need_vec, need_kw = [], [], []
    for r in cands:
        missing = r.id not in rank_vec or r.id not in rank_kw
        if missing and _high(r) < t - 2e-6:
            continue  # provably below the rounded k-th best
        keep.append(r)
        if r.id not in rank_vec:
            need_vec.append(r)
        if r.id not in rank_kw:
            need_kw.append(r)

    if need_vec or need_kw:
        # exact global rank = 1 + predecessor count, all candidates in
        # ONE corpus pass of conditional sums (provably ≤ ~2·40 columns)
        aggs = []
        for i, r in enumerate(need_vec):
            pred = (F.col("raw") > F.lit(r.raw)) | (
                (F.col("raw") == F.lit(r.raw)) & (F.col("id") < F.lit(r.id))
            )
            aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"v{i}"))
        for i, r in enumerate(need_kw):
            pred = (F.col("kw_hits") > F.lit(r.kw_hits)) | (
                (F.col("kw_hits") == F.lit(r.kw_hits)) & (F.col("id") < F.lit(r.id))
            )
            aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"k{i}"))
        counts = kwdf.agg(*aggs).collect()[0]
        for i, r in enumerate(need_vec):
            rank_vec[r.id] = counts[f"v{i}"] + 1
        for i, r in enumerate(need_kw):
            rank_kw[r.id] = counts[f"k{i}"] + 1

    fused = spark.createDataFrame(
        [(r.id, r.source, r.kw_hits, rank_vec[r.id], rank_kw[r.id]) for r in keep],
        schema="id string, source string, kw_hits bigint, rank_vec int, rank_kw int",
    )
    return (
        fused.withColumn(
            "rrf",
            F.round(
                1.0 / (RRF_CONST + F.col("rank_vec"))
                + 1.0 / (RRF_CONST + F.col("rank_kw")),
                6,
            ),
        )
        .orderBy(F.desc("rrf"), "id")
        .limit(k)
    )


class _NegStr(str):
    """Inverts string ordering so ``max(key=(score, _NegStr(id)))``
    breaks score ties toward the SMALLEST id — the engines' ``ORDER BY
    score DESC, id ASC`` tie rule."""

    def __lt__(self, other) -> bool:  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other) -> bool:  # type: ignore[override]
        return str.__lt__(self, other)


def mmr_rerank(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    k: int = 3,
    pool: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking for arbitrary k: each pick
    maximizes lam*relevance - (1-lam)*max-similarity-to-picked, so
    near-duplicate chunks don't crowd the context window (the RAG
    failure mode plain top-k inherits, main.py:184-189).

    Greedy MMR is inherently sequential in k, and every round needs
    only the ``pool`` candidates — so the distributed work is exactly
    ONE job (the corpus scan's top-``pool``, collected: ≤ pool rows of
    32 doubles), and the greedy selection itself runs driver-side in
    plain Python. The Python fold mirrors the engines' arithmetic
    bit-for-bit (left-to-right IEEE adds from a 0.0 accumulator —
    functions/vector.py), which the SQL oracle twin verifies; the
    final projection rounds in Spark so scores stay bit-identical with
    the oracle's round(). Previous shape (one .first() job per pick)
    launched k scheduler rounds to scan ≤ pool cached rows — strictly
    worse at any scale."""
    import math

    scored = score_chunks(spark, sf_dir, query)
    pats = chunk_patterns(spark, sf_dir).select("id", "pattern")
    cands = (
        scored.join(pats, "id")
        .orderBy(F.desc("raw"), "id")
        .limit(pool)
        .select("id", "raw", "pattern")
        .cache()
    )
    rows = cands.collect()  # the one distributed job

    def _dot(a: list, b: list) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def _cos(a: list, b: list) -> float:
        return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))

    picked: list = []
    remaining = list(rows)
    while remaining and len(picked) < k:
        if not picked:
            best = max(remaining, key=lambda r: (r.raw, _NegStr(r.id)))
        else:
            best = max(
                remaining,
                key=lambda r: (
                    lam * r.raw
                    - (1 - lam)
                    * max(_cos(r.pattern, p.pattern) for p in picked),
                    _NegStr(r.id),
                ),
            )
        picked.append(best)
        remaining = [r for r in remaining if r.id != best.id]
    picks = spark.createDataFrame(
        [(i + 1, p.id) for i, p in enumerate(picked)], "pick int, id string"
    )
    return (
        F.broadcast(picks)
        .join(cands, "id")
        .select("pick", "id", F.round("raw", 6).alias("score"))
        .orderBy("pick")
    )
