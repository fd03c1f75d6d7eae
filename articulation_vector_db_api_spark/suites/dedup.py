"""Deduplication suite (north star: LLM-data-pipeline operators).

The reference's only dedup is implicit: identical text hashes to an
identical vector (/root/reference/main.py:129-147) and chunk-id upsert
is last-write-wins (main.py:163,172). The engine makes dedup
first-class, in the four standard flavors for training-data pipelines:

1. exact         — sha256 group-by (one shuffle on the digest)
2. near (MinHash)— shingle → K minhashes → banded LSH bucket join →
                   exact-Jaccard verify of candidates only
3. near (SimHash)— per-doc bit-majority fingerprint, zero shuffle
4. near (n-gram) — exact Jaccard on shingle-sharing candidate pairs

Scale shape: every variant turns an O(n²) pair problem into
hash-partitioned equi-joins (bucket/band/shingle keys). Nothing here
collects to the driver; candidate sets stay proportional to true
near-duplicates, not to corpus size. Hashes go through sha256 (see
functions/hashing.py) so DuckDB reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from ..functions.hashing import hex_to_u32_sql, sha_hash32
from ..functions.vector import cosine_sql_duckdb
from ..registry import register
from ..sources.readers import load_table, spread_input

N_MINHASH = 12
BAND_ROWS = 3  # 4 bands of 3 rows
JACCARD_THRESHOLD = 0.3

_TOKENIZE = r"\s+"


def _shingle_arrays(df: DataFrame, sf_dir: str, n: int = 3) -> DataFrame:
    """doc_id → distinct word n-gram shingle ARRAY (whole text if < n
    words) — kept as an array so per-doc work (minhashing) can run as a
    zero-shuffle fold instead of explode+groupBy.

    The fixture corpus is one small parquet file → one input split, so
    the spread below round-robins it across cores; at 100 TB the scan
    yields thousands of splits and spread_input skips the shuffle
    (guide §2.4 — r17, was an unconditional repartition)."""
    df = spread_input(df, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), _TOKENIZE)
    grams = F.when(
        F.size(tokens) < n, F.array(F.col("text"))
    ).otherwise(
        F.array_distinct(
            F.transform(
                # gram i = tokens[i .. i+n-1] (1-based slice); slice()
                # keeps the whole expression in codegen — getItem with
                # a Column index falls back to interpreted evaluation,
                # measured ~50x slower on the shingle stage.
                F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
            )
        )
    )
    return df.select("doc_id", grams.alias("shingles"))


def _shingles(df: DataFrame, sf_dir: str, n: int = 3) -> DataFrame:
    """doc_id → one row per distinct shingle (exploded form).

    explode_outer, deliberately: plain explode adds an implicit
    `size(shingles) > 0` filter that Catalyst pushes below the
    repartition, re-evaluating the whole shingle expression serially
    in the single-split scan stage (measured 8x slowdown). The gram
    array is non-empty by construction (the < n branch yields
    [text]), so outer-explode is row-identical and skips the filter."""
    return _shingle_arrays(df, sf_dir, n).select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    )


_SHINGLES_SQL = """
    SELECT doc_id, unnest(
        CASE WHEN len(toks) < 3 THEN [text]
             ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                  j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2]))
        END) AS shingle
    FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents)
"""

# Document-frequency cap for the exact-pair family (dedup_ngram_jaccard /
# _containment, pipeline_dedup_keep_best, dedup_lsh_recall_eval's ground
# truth): a shingle present in f docs contributes f² candidate pairs, so
# without a cap pair volume grows quadratically with corpus size while a
# boilerplate shingle shared by thousands of docs carries no dedup signal
# (classic IR stop-word / document-frequency pruning). With the cap, pair
# volume is <= CAP x shingle rows — LINEAR in the corpus. 64 keeps every
# real near-dup cluster up to 64 members findable (the fixtures' twin
# clusters are ~10; nothing is pruned at sf0.01 where max df = 7, or at
# sf0.1 where max df = 25 — the cap bites exactly on the 10x replica's
# boilerplate shingles, SCALE.md "Measured scaling"). The similarity space
# is the KEPT shingles: per-doc sizes and intersections both count only
# surviving shingles, so Jaccard/containment stay consistent ratios.
SHINGLE_DF_CAP = 64

# DuckDB mirror of the pruning rule — compose as
#   WITH shingles AS ({_SHINGLES_SQL}), kept AS ({_KEPT_SHINGLES_SQL}), ...
_KEPT_SHINGLES_SQL = f"""
    SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS df
        FROM shingles)
    WHERE df <= {SHINGLE_DF_CAP}
"""


def _pruned_postings(sh: DataFrame, cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """shingle -> SORTED doc_id posting list, ultra-frequent shingles
    (df > cap) dropped. The df filter runs as a count-only aggregation
    BEFORE collect_list so a pathological shingle (df in the millions
    at 100 TB) never materializes its posting array on any reducer —
    count has map-side partials, collect does not. The filter join and
    the posting groupBy share the shingle hash-partitioning, so this
    whole stage is one shuffle of the shingle rows plus a vocab-sized
    count table."""
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= cap)
        .select("shingle")
    )
    return (
        sh.join(df_ok, "shingle")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
    )


def _posting_pair_counts(postings: DataFrame) -> DataFrame:
    """(a, b, inter) for every a < b sharing >= 1 kept shingle — the
    posting-list pair generator: pairs are emitted MAP-SIDE from each
    shingle's sorted doc array (<= cap²/2 per shingle by construction),
    so the only shuffle after the posting build is the (a, b) count
    aggregation. Replaces the shingle self-join shape (two scans + an
    extra shuffle) with strictly less work at identical semantics."""
    docs = F.col("docs")
    pair_arr = F.flatten(
        F.transform(
            docs,
            lambda x, i: F.transform(
                F.slice(docs, i + F.lit(2), F.size(docs)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        postings.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def _pruned_sizes(postings: DataFrame) -> DataFrame:
    """doc_id -> number of KEPT shingles (the denominators for Jaccard
    and containment over the pruned shingle space)."""
    return (
        postings.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT text_sha, count(*) AS n_copies, min(doc_id) AS keep_doc_id
    FROM (SELECT doc_id, sha256(text) AS text_sha FROM documents)
    GROUP BY text_sha
    HAVING count(*) >= 1
    ORDER BY text_sha
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on the content digest, keep min doc_id.
    One shuffle on a 64-char key; at 100 TB hash only the digest, never
    the full text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("text_sha")
    )


@register(
    "dedup_exact_normalized",
    oracle="""
    SELECT norm_sha, count(*) AS n_copies, min(doc_id) AS keep_doc_id
    FROM (SELECT doc_id,
                 sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS norm_sha
          FROM documents)
    GROUP BY norm_sha
    ORDER BY norm_sha
    """,
    tags=("dedup",),
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-insensitive exact dedup (lowercase, collapse
    whitespace) — catches trivially-reformatted duplicates before any
    expensive near-dup pass."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs.select("doc_id", F.sha2(norm, 256).alias("norm_sha"))
        .groupBy("norm_sha")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("norm_sha")
    )


def _minhash_cand_cte() -> str:
    """DuckDB CTE block: documents → shingle arrays → minhashes →
    banded candidate pairs (`cand`). Shared by the dedup_minhash_lsh
    twin and the LSH recall eval."""
    # 12 hash functions from TWO digests (8-char slices), not 12 sha256s;
    # each minhash is a per-row list fold — mirrors the Spark array_min
    hash_cols = ",\n               ".join(
        f"list_aggregate(list_transform(hexcats, h -> "
        f"{hex_to_u32_sql(f'substr(h, {k * 8 + 1}, 8)')}), 'min') AS mh{k}"
        for k in range(N_MINHASH)
    )
    bands = []
    for b in range(N_MINHASH // BAND_ROWS):
        cols = "||'-'||".join(
            f"CAST(mh{b * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        bands.append(f"SELECT doc_id, {b} AS band_idx, {cols} AS band_val FROM minhashes")
    bands_sql = "\n        UNION ALL\n        ".join(bands)
    return f"""
    WITH shingle_arrays AS (
        SELECT doc_id,
               CASE WHEN len(toks) < 3 THEN [text]
                    ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         j -> toks[j] || ' ' || toks[j+1] || ' ' || toks[j+2]))
               END AS shingles
        FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents)
    ),
    hexes AS (
        SELECT doc_id,
               list_transform(shingles,
                   s -> sha256('a:' || s) || sha256('b:' || s)) AS hexcats
        FROM shingle_arrays
    ),
    minhashes AS (
        SELECT doc_id, {hash_cols}
        FROM hexes
    ),
    bands AS ({bands_sql}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )"""


def _minhash_sql() -> str:
    """Full dedup_minhash_lsh twin: candidates + exact-Jaccard verify."""
    return f"""{_minhash_cand_cte()},
    verified AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(sa.shingles, sb.shingles)) AS inter,
               len(sa.shingles) + len(sb.shingles)
                 - len(list_intersect(sa.shingles, sb.shingles)) AS uni
        FROM cand c
        JOIN shingle_arrays sa ON sa.doc_id = c.doc_a
        JOIN shingle_arrays sb ON sb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / uni, 6) AS jaccard
    FROM verified
    WHERE CAST(inter AS DOUBLE) / uni >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """


def _lsh_candidate_pairs(arrays: DataFrame) -> DataFrame:
    """(doc_a, doc_b) distinct MinHash-band collision pairs from cached
    shingle arrays — the candidate generator shared by
    dedup_minhash_lsh and dedup_lsh_recall_eval.

    Per-doc minhashing is a pure array fold — NO explode, NO groupBy
    shuffle. 12 hash functions are 8-char slices of two digests per
    shingle (2 sha256s, not 12); the hexcat array materializes once.
    ONE projection + explode produces the 4 band keys (a 4-way union
    would re-evaluate the digest fold per branch AND per join side —
    measured 1.8 s -> 1.1 s at sf0.1)."""
    hexcats = F.transform(
        F.col("shingles"),
        lambda s: F.concat(
            F.sha2(F.concat(F.lit("a:"), s), 256),
            F.sha2(F.concat(F.lit("b:"), s), 256),
        ),
    )
    with_hex = arrays.select("doc_id", hexcats.alias("hexcats"))
    minhashes = with_hex.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    F.col("hexcats"),
                    lambda h: F.conv(h.substr(F.lit(k * 8 + 1), F.lit(8)), 16, 10).cast(
                        "long"
                    ),
                )
            ).alias(f"mh{k}")
            for k in range(N_MINHASH)
        ],
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "-",
                    *[
                        F.col(f"mh{b * BAND_ROWS + r}").cast("string")
                        for r in range(BAND_ROWS)
                    ],
                ).alias("band_val"),
            )
            for b in range(N_MINHASH // BAND_ROWS)
        ]
    )
    bands = (
        minhashes.select("doc_id", F.explode(band_structs).alias("s"))
        .select("doc_id", "s.band_idx", "s.band_val")
        .persist()  # tiny (4 rows x ~30 bytes per doc); both join
        # sides read it, so the digest fold runs exactly once
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register("dedup_minhash_lsh", oracle=_minhash_sql(), headline=True, tags=("dedup",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup: shingle → 12 minhashes → 4 bands
    of 3 → band-key equi-join proposes candidates → exact Jaccard
    (computed only on candidates) filters.

    Scale: the band join is hash-partitioned on (band_idx, band_val);
    no O(n²) stage exists. Verification joins shingle lists only for
    candidate pairs. At 100 TB, tune bands/rows for the target Jaccard
    threshold (P(candidate) = 1-(1-j^r)^b) and salt hot bands."""
    docs = load_table(spark, sf_dir, "documents")
    arrays = _shingle_arrays(docs, sf_dir).cache()  # reused: hashing + both verify sides
    cand = _lsh_candidate_pairs(arrays)

    # Exact-Jaccard verification on CANDIDATES ONLY, via array
    # intersection — shingle lists join to the (few) candidate pairs;
    # nothing explodes and nothing re-aggregates.
    sa = arrays.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = arrays.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                inter.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - inter)
            ).alias("j"),
        )
    )
    return (
        verified.filter(F.col("j") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("j", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# bit j of h via arithmetic (floor(h / 2^j) % 2): powers of two are
# exact in double, so the identical formula runs on any engine — no
# dependence on shift-operator semantics
_SIMHASH_EXPR = """
    aggregate(
        sequence(0, 31),
        0L,
        (acc, j) -> acc + IF(
            2 * size(filter(token_hashes,
                    h -> CAST(floor(h / pow(2, j)) AS BIGINT) % 2 = 1))
                >= size(token_hashes),
            CAST(pow(2, j) AS BIGINT), 0L))
"""

_SIMHASH_SQL = """
    list_reduce(list_prepend(CAST(0 AS BIGINT), generate_series(0, 31)),
        (acc, j) -> acc + CASE
            WHEN 2 * len(list_filter(token_hashes,
                     h -> CAST(floor(h / power(2, j)) AS BIGINT) % 2 = 1))
                 >= len(token_hashes)
            THEN CAST(power(2, j) AS BIGINT) ELSE 0 END)
"""


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS tokens
        FROM documents
    ),
    hexes AS (
        SELECT doc_id, list_transform(tokens, t -> sha256('0:' || t)) AS token_hexes
        FROM toks
    ),
    hashed AS (
        SELECT doc_id,
               list_transform(token_hexes, hx -> {hex_to_u32_sql("hx")}) AS token_hashes
        FROM hexes
    )
    SELECT doc_id, {_SIMHASH_SQL} AS simhash
    FROM hashed
    ORDER BY doc_id
    """,
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint: 32-bit bit-majority over distinct-token
    hashes, computed entirely inside one row (array fold — ZERO
    shuffle). Near-dups = fingerprints within small Hamming distance;
    exact-match grouping needs just one shuffle on the fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.array_distinct(F.split(F.trim(F.col("text")), _TOKENIZE))
    return (
        docs.select("doc_id", tokens.alias("tokens"))
        .withColumn(
            "token_hashes",
            F.transform(F.col("tokens"), lambda t: sha_hash32(t, 0)),
        )
        .select("doc_id", F.expr(_SIMHASH_EXPR).alias("simhash"))
        .orderBy("doc_id")
    )


_KGRAM = 5
_WINNOW_W = 4


@register(
    "dedup_winnowing",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - {_KGRAM - 1}),
                   i -> sha256(substr(text, CAST(i AS INT), {_KGRAM}))) AS ghex
        FROM documents
        WHERE length(text) >= {_KGRAM}
    ),
    hashes AS (
        SELECT doc_id,
               list_transform(ghex, h -> {hex_to_u32_sql("h")}) AS gh
        FROM grams
    ),
    fp AS (
        SELECT doc_id,
               list_sort(list_distinct(list_transform(
                   generate_series(1, len(gh) - {_WINNOW_W - 1}),
                   w -> list_aggregate(gh[w:w + {_WINNOW_W - 1}], 'min')))) AS fingerprints
        FROM hashes
    )
    SELECT doc_id, len(fingerprints) AS n_fp, fingerprints[1] AS min_fp
    FROM fp
    ORDER BY doc_id
    """,
    tags=("dedup",),
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS scheme): hash every k-gram
    (k=5), slide a window of w=4 hashes, keep each window's minimum —
    guaranteed-coverage fingerprints robust to insertions. Pure per-row
    array folds, zero shuffle; docs sharing fingerprints are plagiarism
    /boilerplate candidates (one explode+groupBy away)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _KGRAM
    )
    docs = docs.transform(spread_input, sf_dir, "documents")
    gh = F.transform(
        F.sequence(F.lit(1), F.length("text") - (_KGRAM - 1)),
        lambda i: F.conv(
            F.sha2(F.col("text").substr(i, F.lit(_KGRAM)), 256).substr(
                F.lit(1), F.lit(8)
            ),
            16,
            10,
        ).cast("long"),
    )
    with_gh = docs.select("doc_id", gh.alias("gh"))
    fingerprints = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("gh") - (_WINNOW_W - 1)),
                lambda w: F.array_min(F.slice(F.col("gh"), w, _WINNOW_W)),
            )
        )
    )
    return (
        with_gh.select("doc_id", fingerprints.alias("fingerprints"))
        .select(
            "doc_id",
            F.size("fingerprints").alias("n_fp"),
            F.element_at("fingerprints", 1).alias("min_fp"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {cosine_sql_duckdb("a.embedding", "b.embedding")} >= 0.3
    ),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b, a FROM edges
    ),
    r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM r JOIN sym s ON r.dst = s.src
    ),
    labels AS (
        SELECT e.vec_id AS node,
               least(e.vec_id,
                     coalesce((SELECT min(dst) FROM r WHERE src = e.vec_id),
                              e.vec_id)) AS component
        FROM embeddings e
    )
    SELECT node, component,
           count(*) OVER (PARTITION BY component) AS component_size
    FROM labels
    ORDER BY node
    """,
    tags=("dedup", "graph"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from near-dup PAIRS: iterative min-label
    propagation (operators/graph.py) over the cosine-similarity edge
    set — every vector labeled with its duplicate-group canonical id.
    The oracle computes the same closure with a recursive CTE; Spark
    runs the scalable fixpoint loop (one shuffle per round)."""
    from ..functions.vector import cosine
    from ..operators.graph import connected_components

    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cosine(F.col("a.embedding"), F.col("b.embedding")) >= 0.3)
        .select(F.col("a.vec_id").alias("a"), F.col("b.vec_id").alias("b"))
    )
    nodes = e.select(F.col("vec_id").alias("node"))
    labels = connected_components(nodes, edges)
    w = Window.partitionBy("component")
    return (
        labels.withColumn("component_size", F.count(F.lit(1)).over(w))
        .orderBy("node")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    kept AS ({_KEPT_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    pair_inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
        FROM kept x JOIN kept y
          ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
    FROM pair_inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 50
    """,
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over the document-frequency-pruned shingle
    space (df <= SHINGLE_DF_CAP — see the constant's comment): shared
    kept shingles ARE the candidate generator, emitted map-side from
    sorted posting lists, so pair volume is bounded at cap x shingle
    rows (linear in the corpus, never f² on a boilerplate shingle).
    Top-50 by similarity."""
    docs = load_table(spark, sf_dir, "documents")
    postings = _pruned_postings(_shingles(docs, sf_dir)).persist()
    # read twice (pairs + sizes); persisting skips a second shingle pass
    sizes = _pruned_sizes(postings)
    pair_inter = _posting_pair_counts(postings).withColumnsRenamed(
        {"a": "doc_a", "b": "doc_b"}
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pair_inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.05)
        .select("doc_a", "doc_b", F.round("j", 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(50)
    )


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    kept AS ({_KEPT_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    pair_inter AS (
        SELECT x.doc_id AS doc_sub, y.doc_id AS doc_super, count(*) AS inter
        FROM kept x JOIN kept y
          ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
        GROUP BY x.doc_id, y.doc_id
    )
    SELECT doc_sub, doc_super,
           round(CAST(inter AS DOUBLE) / s.n, 6) AS containment
    FROM pair_inter JOIN sizes s ON s.doc_id = doc_sub
    WHERE CAST(inter AS DOUBLE) / s.n >= 0.2
    ORDER BY containment DESC, doc_sub, doc_super
    LIMIT 50
    """,
    tags=("dedup",),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED n-gram containment |A∩B| / |A| over the df-pruned
    shingle space (df <= SHINGLE_DF_CAP): the asymmetric twin of
    dedup_ngram_jaccard, for quote / boilerplate / subset detection —
    a short doc pasted inside a long one scores near 1.0 here while
    its Jaccard stays tiny (the union is dominated by the long doc).
    Training-data curation keeps the superset and drops the contained
    copy, which Jaccard-threshold dedup alone would miss. Top-50
    directed pairs at containment >= 0.2.

    Same posting-list candidate generator as the Jaccard query —
    intersections are symmetric, so the undirected (a < b) counts are
    computed once and emitted in both directions, halving the pair
    aggregation; the per-doc size table joins in AFTER. Pruning makes
    pair volume linear in the corpus (cap x shingle rows), never f²
    on a boilerplate shingle."""
    docs = load_table(spark, sf_dir, "documents")
    postings = _pruned_postings(_shingles(docs, sf_dir)).persist()
    # read twice (pairs + sizes); persisting skips a second shingle pass
    sizes = _pruned_sizes(postings)
    und = _posting_pair_counts(postings)
    pair_inter = und.select(
        F.col("a").alias("doc_sub"), F.col("b").alias("doc_super"), "inter"
    ).unionAll(
        und.select(
            F.col("b").alias("doc_sub"), F.col("a").alias("doc_super"), "inter"
        )
    )
    s = sizes.alias("s")
    return (
        pair_inter.join(s, F.col("s.doc_id") == F.col("doc_sub"))
        .select(
            "doc_sub",
            "doc_super",
            (F.col("inter").cast("double") / F.col("s.n")).alias("c"),
        )
        .filter(F.col("c") >= 0.2)
        .select("doc_sub", "doc_super", F.round("c", 6).alias("containment"))
        .orderBy(F.desc("containment"), "doc_sub", "doc_super")
        .limit(50)
    )


@register(
    "dedup_lsh_recall_eval",
    oracle=f"""{_minhash_cand_cte()},
    shingles AS (SELECT doc_id, unnest(shingles) AS shingle
                 FROM shingle_arrays),
    kept AS ({_KEPT_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    pair_inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
        FROM kept x JOIN kept y
          ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    ),
    truth AS (
        SELECT doc_a, doc_b
        FROM pair_inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
              >= {JACCARD_THRESHOLD}
    ),
    hit AS (SELECT * FROM truth INTERSECT SELECT * FROM cand)
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM hit) AS n_hit,
           CASE WHEN (SELECT count(*) FROM truth) > 0
                THEN round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
                           / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6)
           END AS recall
    """,
    tags=("dedup", "eval"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality eval for the MinHash-LSH candidate generator
    (the dedup analog of ann_recall_eval): recall of band-collision
    pairs against the EXACT ground truth — every pair with true
    Jaccard >= the threshold, from the shingle equi-join (a pair above
    any positive threshold must share a shingle, so the equi-join
    finds all of them; no all-pairs stage). This is the number that
    decides the bands/rows configuration at deployment: tune until
    measured recall at the target threshold is acceptable, then scale
    — P(candidate) = 1-(1-j^r)^b is the theory, this query is the
    measurement.

    The truth side runs in the df-pruned shingle space (df <=
    SHINGLE_DF_CAP, posting-list pair generation) so the ground-truth
    join stays linear in the corpus; the MinHash side is deliberately
    UNPRUNED — LSH sketches the full shingle sets, and the eval
    measures the deployed generator as-is. At fixture scale nothing
    is pruned, so truth is the exact full-space truth.

    Scale shape: candidates from the band equi-join, truth from the
    kept-shingle posting lists, intersection by a pair-key join;
    counts roll up to a single row."""
    docs = load_table(spark, sf_dir, "documents")
    arrays = _shingle_arrays(docs, sf_dir).cache()  # feeds cand, truth, sizes
    cand = _lsh_candidate_pairs(arrays)

    sh = arrays.select("doc_id", F.explode_outer("shingles").alias("shingle"))
    postings = _pruned_postings(sh).persist()
    sizes = _pruned_sizes(postings)
    pair_inter = _posting_pair_counts(postings).withColumnsRenamed(
        {"a": "doc_a", "b": "doc_b"}
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    truth = (
        pair_inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(
            F.col("inter").cast("double")
            / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    hit = truth.join(cand, ["doc_a", "doc_b"])
    counts = (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
    )
    return counts.select(
        "n_truth",
        "n_candidates",
        "n_hit",
        F.when(
            F.col("n_truth") > 0,
            F.round(
                F.col("n_hit").cast("double") / F.col("n_truth").cast("double"), 6
            ),
        ).alias("recall"),
    )


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH names AS (SELECT DISTINCT lower(p_name) AS name FROM part),
    blocked AS (
        SELECT a.name AS name_a, b.name AS name_b,
               levenshtein(a.name, b.name) AS dist
        FROM names a JOIN names b
          ON split_part(a.name, ' ', 2) = split_part(b.name, ' ', 2)
         AND a.name < b.name
    )
    SELECT name_a, name_b, dist FROM blocked
    WHERE dist <= 4
    ORDER BY name_a, name_b
    """,
    tags=("dedup", "fuzzy"),
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate detection by edit distance with BLOCKING: the
    vocabulary is deduped first (names, not rows — the string-level
    dedup a catalog needs), candidate pairs must share a blocking key
    (the noun token — an equi-join, a hash shuffle, NOT a cross join),
    then exact Levenshtein <= 4 verifies. Blocking is what makes fuzzy
    matching scale: O(pairs-per-block), not O(n^2); at 100 TB use
    several redundant blocking keys (prefix, phonetic code,
    sorted-token signature) unioned, deduping candidates before the
    verify stage."""
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.lower(F.col("p_name")).alias("name"))
        .distinct()
        .withColumn("block", F.split(F.col("name"), " ").getItem(1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
        )
        .filter(F.col("dist") <= 4)
        .orderBy("name_a", "name_b")
    )


@register(
    "dedup_cc_star",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {cosine_sql_duckdb("a.embedding", "b.embedding")} >= 0.3
    ),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b, a FROM edges
    ),
    r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM r JOIN sym s ON r.dst = s.src
    ),
    labels AS (
        SELECT e.vec_id AS node,
               least(e.vec_id,
                     coalesce((SELECT min(dst) FROM r WHERE src = e.vec_id),
                              e.vec_id)) AS component
        FROM embeddings e
    )
    SELECT node, component,
           count(*) OVER (PARTITION BY component) AS component_size
    FROM labels
    ORDER BY node
    """,
    tags=("dedup", "graph"),
)
def dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as dedup_connected_components, computed by the
    alternating large-star/small-star contraction
    (operators/graph.py:connected_components_star) — the skew-bounded
    100 TB variant (no reducer ever holds a full component's
    adjacency). Checked against the identical recursive-CTE oracle, so
    both algorithms are proven to produce the same partition of the
    graph."""
    from ..functions.vector import cosine
    from ..operators.graph import connected_components_star

    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cosine(F.col("a.embedding"), F.col("b.embedding")) >= 0.3)
        .select(F.col("a.vec_id").alias("a"), F.col("b.vec_id").alias("b"))
    )
    nodes = e.select(F.col("vec_id").alias("node"))
    labels = connected_components_star(nodes, edges)
    w = Window.partitionBy("component")
    return (
        labels.withColumn("component_size", F.count(F.lit(1)).over(w))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Semantic dedup: cluster first, compare only within clusters (SemDeDup).
# ---------------------------------------------------------------------------

_KM_K = 10  # clusters; init centroids = embeddings of vec_id 0..K-1
_KM_DIM = 64
_KM_DUP_COS = 0.25  # fixture embeddings are isotropic; 0.25 ~ p99 tail


def _sqdist_duckdb(a: str, b: str) -> str:
    """DuckDB twin of the Spark zip_with/aggregate squared-L2 fold —
    identical IEEE op sequence (0.0-seeded left fold over dims)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {_KM_DIM}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, e) -> acc + e)"
    )


_KM_ASSIGN_SQL = """
    d{r} AS (
        SELECT vec_id, v, cid, {dist} AS d
        FROM vec CROSS JOIN cent{p}
    ),
    a{r} AS (
        SELECT vec_id, v, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, cid) AS rn
            FROM d{r}
        ) WHERE rn = 1
    )
"""


def _km_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v: array<double>) — the assignment input frame.

    Single-file fixture = one input split: spread the fold-heavy
    assignment across cores (at deployment the scan is many-split)."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .transform(spread_input, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )


def _km_sqdist(a, b):
    """Squared L2 as the 0.0-seeded fold the oracle's
    :func:`_sqdist_duckdb` mirrors op-for-op."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _km_assign(vec: DataFrame, centroids: DataFrame) -> DataFrame:
    """Shuffle-free argmin assignment: the K×D centroid frame collapses
    to ONE broadcast row (collect_list of structs) and each vector
    picks argmin via array_min over a transform — pure map-side
    codegen. The struct-lexicographic (d, cid) tie-break matches
    ``_KM_ASSIGN_SQL``'s ``row_number ... ORDER BY d, cid`` exactly;
    both Spark callers and the oracle must stay in lockstep through
    THESE helpers (this is the single implementation)."""
    codebook = centroids.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    best = F.array_min(
        F.transform(
            "cents",
            lambda s: F.struct(
                _km_sqdist(F.col("v"), s["c"]).alias("d"),
                s["cid"].alias("cid"),
            ),
        )
    )
    return vec.crossJoin(F.broadcast(codebook)).select(
        "vec_id", "v", best["cid"].alias("cid")
    )


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH vec AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    cent0 AS (SELECT vec_id AS cid, v AS c FROM vec WHERE vec_id < {_KM_K}),
    {_KM_ASSIGN_SQL.format(r=1, p=0, dist=_sqdist_duckdb("v", "c"))},
    m1 AS (
        SELECT cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val
        FROM a1
    ),
    cent1 AS (
        SELECT cid, list(cval ORDER BY dim) AS c
        FROM (
            SELECT cid, dim,
                   CAST(sum(CAST(val AS DECIMAL(30,8))) AS DOUBLE) / count(*)
                       AS cval
            FROM m1 GROUP BY cid, dim
        ) GROUP BY cid
    ),
    {_KM_ASSIGN_SQL.format(r=2, p=1, dist=_sqdist_duckdb("v", "c"))},
    members AS (
        SELECT cid, count(*) AS n_members, min(vec_id) AS representative
        FROM a2 GROUP BY cid
    ),
    pairs AS (
        SELECT x.cid AS cid, count(*) AS n_dup_pairs,
               count(DISTINCT y.vec_id) AS n_dup_docs
        FROM a2 x JOIN a2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
        WHERE round({cosine_sql_duckdb("x.v", "y.v")}, 6) >= {_KM_DUP_COS}
        GROUP BY x.cid
    )
    SELECT members.cid AS cluster_id, n_members, representative,
           COALESCE(n_dup_pairs, 0) AS n_dup_pairs,
           COALESCE(n_dup_docs, 0) AS n_dup_docs
    FROM members LEFT JOIN pairs ON members.cid = pairs.cid
    ORDER BY cluster_id
    """,
    headline=True,
    tags=("dedup", "similarity"),
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means partitions the corpus,
    then near-duplicate pairs are mined ONLY within clusters — the
    trick that turns O(n²) embedding dedup into Σ O(|cluster|²). The
    reference has no clustering at all (Pinecone is query-only,
    main.py:184-189); this is the scale path its users would need.

    Spark shape, built for 100 TB:
    - assignment is shuffle-free: the K×D centroid codebook collapses
      to ONE broadcast row (collect_list of structs) and each vector
      picks argmin via array_min over a transform — pure map-side
      codegen, no groupBy, no join shuffle;
    - Lloyd update shuffles (cid, dim) partial sums only — decimal
      sums make centroids bit-identical at any partition count, so the
      oracle's serial k-means reproduces the distributed run exactly;
    - the pairwise stage joins on cid, never all-pairs.
    Init = embeddings of vec_id 0..K-1 (k-means++ at deployment);
    2 assignment rounds unrolled so the DuckDB twin is plain SQL.
    """
    from ..functions.vector import dot, l2_norm

    vec = _km_vectors(spark, sf_dir)
    cent0 = vec.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    a1 = _km_assign(vec, cent0)
    cent1 = (
        a1.select("cid", F.posexplode("v").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(
            (F.sum(F.col("val").cast("decimal(30,8)")).cast("double")
             / F.count(F.lit(1))).alias("cval")
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                lambda s: s["cval"],
            ).alias("c")
        )
    )
    # norms once per vector (not twice per pair); persist the tiny
    # (vec_id, v, nv, cid) frame — members + both self-join sides read
    # it, and without the pin the whole assignment pipeline re-runs 3×
    # (at 100 TB: write the assignment to storage, it is the artifact)
    a2 = _km_assign(vec, cent1).withColumn("nv", l2_norm(F.col("v"))).persist()

    members = a2.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("vec_id").alias("representative"),
    )
    x, y = a2.alias("x"), a2.alias("y")
    # dot/(nx*ny) is op-for-op the cosine fold the oracle computes —
    # sqrt is exact, so hoisting the norms changes no bit
    pairs = (
        x.join(
            y,
            (F.col("x.cid") == F.col("y.cid"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .filter(
            F.round(
                dot(F.col("x.v"), F.col("y.v"))
                / (F.col("x.nv") * F.col("y.nv")),
                6,
            )
            >= _KM_DUP_COS
        )
        .groupBy(F.col("x.cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.countDistinct(F.col("y.vec_id")).alias("n_dup_docs"),
        )
    )
    return (
        members.join(pairs, "cluster_id", "left")
        .na.fill(0, ["n_dup_pairs", "n_dup_docs"])
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Exact substring (span) dedup — Lee et al., "Deduplicating Training
# Data Makes Language Models Better" (ACL 2022). The suffix-array
# algorithm in the paper is single-machine; the distributed equivalent
# is span hashing: every K-token window becomes a fixed-width digest,
# and a span repeated across >= 2 documents marks all its occurrences
# as duplicated training text.
# ---------------------------------------------------------------------------

_SPAN_K = 8  # tokens per span (the paper uses 50 BPE tokens; fixture docs average ~54 words)


@register(
    "dedup_substring_spans",
    headline=True,
    oracle=f"""
    WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ), sized AS (
        SELECT doc_id, t, len(t) AS n FROM d WHERE len(t) >= {_SPAN_K}
    ), grams AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(t, i, i + {_SPAN_K - 1}), ' ')) AS g
        FROM sized,
             LATERAL (SELECT unnest(generate_series(1, n - {_SPAN_K - 1})) AS i)
    ), dup AS (
        SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ), per_doc AS (
        SELECT doc_id, count(*) AS dup_spans
        FROM grams WHERE g IN (SELECT g FROM dup) GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n - {_SPAN_K - 1} AS n_spans,
           COALESCE(p.dup_spans, 0) AS dup_spans,
           round(CAST(COALESCE(p.dup_spans, 0) AS DOUBLE)
                 / (s.n - {_SPAN_K - 1}), 6) AS dup_frac
    FROM sized s LEFT JOIN per_doc p ON s.doc_id = p.doc_id
    ORDER BY s.doc_id
    """,
    tags=("dedup", "curation"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document substring dedup via span hashing: every
    K-token window is md5-digested; a digest seen in >= 2 distinct
    documents flags every occurrence, and each doc reports its
    duplicated-span fraction (the paper's dedup criterion).

    Scale shape: the text never shuffles — only 16-byte span digests
    do. One shuffle groups digests (count-distinct docs), one semi-join
    maps the duplicated set back onto span occurrences, one shuffle
    re-groups per doc. At 100 TB the digest table is ~tokens x 16 B and
    hash-partitions evenly (spans are near-unique keys, no skew); the
    explode fan-out runs after an explicit repartition so a single
    input split cannot serialize the span generation."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    docs = docs.transform(spread_input, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), _TOKENIZE)
    sized = (
        docs.select("doc_id", toks.alias("t"))
        .withColumn("n", F.size("t"))
        .filter(F.col("n") >= _SPAN_K)
    )
    # ONE corpus scan: every downstream branch (duplicated-digest set,
    # per-doc dup counts, per-doc totals) reads the persisted digest
    # frame — 24 bytes/span — instead of re-scanning + re-exploding text
    grams = sized.select(
        "doc_id",
        # outer-explode: n >= K guarantees a non-empty span array, and
        # plain explode's pushed size>0 filter would re-run the md5
        # transform serially at the scan before the cache fills
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - F.lit(_SPAN_K - 1)),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, _SPAN_K))),
            )
        ).alias("g"),
    ).persist()
    dup = (
        # r17 (guide §2.3, aggregate before you shuffle): the dup test
        # only needs "seen in >= 2 distinct docs", which is exactly
        # min(doc_id) != max(doc_id) — a single-pass partial aggregate
        # (two longs of map-side state per digest) instead of
        # countDistinct's extra dedup-aggregate level over (g, doc_id).
        # At 100 TB a hot span repeated across thousands of docs keeps
        # a doc-id set per key under countDistinct; min/max is O(1).
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("g")
    )
    per_doc = (
        grams.join(dup, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_spans"))
    )
    # explode emits exactly n-K+1 digests per doc, so the span totals
    # come from the same frame — no second pass over `sized`
    totals = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .na.fill(0, ["dup_spans"])
        .withColumn(
            "dup_frac",
            F.round(
                F.col("dup_spans").cast("double") / F.col("n_spans"), 6
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Composed curation pipeline: near-dup candidate pairs → connected
# components → keep the best representative per duplicate cluster.
# This is the shape real training-data dedup ships (e.g. RefinedWeb,
# SlimPajama): clustering alone is not actionable — the pipeline must
# decide WHICH copy survives.
# ---------------------------------------------------------------------------

_KEEP_JACCARD = 0.1


@register(
    "pipeline_dedup_keep_best",
    headline=True,
    oracle=f"""
    WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
    kept AS ({_KEPT_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    pair_inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        FROM kept x JOIN kept y
          ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    ),
    edges AS (
        SELECT a, b FROM pair_inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {_KEEP_JACCARD}
    ),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b, a FROM edges
    ),
    r(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM r JOIN sym s ON r.dst = s.src
    ),
    members AS (SELECT DISTINCT src AS node FROM sym),
    labels AS (
        SELECT m.node,
               least(m.node, (SELECT min(dst) FROM r WHERE src = m.node))
                   AS component
        FROM members m
    )
    SELECT l.node AS doc_id, l.component, d.n_chars,
           CAST(CASE WHEN row_number() OVER (
                    PARTITION BY l.component
                    ORDER BY d.n_chars DESC, l.node) = 1
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM labels l JOIN documents d ON d.doc_id = l.node
    ORDER BY doc_id
    """,
    tags=("dedup", "curation"),
)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal: trigram-shingle candidate pairs
    (exact Jaccard >= 0.1 over the df-pruned shingle space, df <=
    SHINGLE_DF_CAP), connected components over the pair graph, then
    one survivor per cluster — the longest document, ties to the
    smallest id (the keep-longest heuristic production dedup uses).

    Scale shape: candidate pairs are emitted map-side from df-capped
    posting lists (never all-pairs, and never f² on a boilerplate
    shingle — pair volume is linear in the corpus), clustering runs
    the skew-bounded alternating large-star/small-star variant
    (operators/graph.py: connected_components_star — no reducer ever
    materializes a whole component's adjacency, unlike min-label
    propagation's hot-label groupBy), and survivor election is a
    single per-component window. The `keep = 0` rows ARE the deletion
    list a 100 TB curation job writes back."""
    docs = load_table(spark, sf_dir, "documents")
    postings = _pruned_postings(_shingles(docs, sf_dir)).persist()
    sizes = _pruned_sizes(postings)
    pairs = _posting_pair_counts(postings)
    edges = (
        pairs.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .filter(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
            >= _KEEP_JACCARD
        )
        .select("a", "b")
        .persist()  # read 3x: symmetrized edge set, node set, and the
        # component loop's first materialization — without this the
        # shingle self-join reruns for each (measured 6.0 -> 2.4 s)
    )
    from ..operators.graph import connected_components_star

    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    labels = connected_components_star(nodes, edges)
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    return (
        labels.join(
            load_table(spark, sf_dir, "documents").select(
                F.col("doc_id").alias("node"), "n_chars"
            ),
            "node",
        )
        .withColumn(
            "keep", (F.row_number().over(w) == 1).cast("int")
        )
        .select(
            F.col("node").alias("doc_id"), "component", "n_chars", "keep"
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a NEW ingest batch checked against the EXISTING
# corpus. Production pipelines never re-pair the whole corpus per
# ingest — the batch's digests probe the corpus digest table
# one-directionally, so cost scales with the batch, not the corpus.
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_batch",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    batch AS (SELECT * FROM shingles WHERE doc_id % 10 = 0),
    corpus AS (SELECT * FROM shingles WHERE doc_id % 10 != 0),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    overlap AS (
        SELECT b.doc_id AS new_doc, c.doc_id AS corpus_doc, count(*) AS inter
        FROM batch b JOIN corpus c ON b.shingle = c.shingle
        GROUP BY b.doc_id, c.doc_id
    ),
    scored AS (
        SELECT new_doc, corpus_doc,
               round(CAST(inter AS DOUBLE)
                     / (sb.n + sc.n - inter), 6) AS jaccard
        FROM overlap
        JOIN sizes sb ON sb.doc_id = new_doc
        JOIN sizes sc ON sc.doc_id = corpus_doc
        WHERE CAST(inter AS DOUBLE) / (sb.n + sc.n - inter) >= {_KEEP_JACCARD}
    ),
    best AS (
        SELECT new_doc, corpus_doc, jaccard FROM (
            SELECT new_doc, corpus_doc, jaccard,
                   row_number() OVER (PARTITION BY new_doc
                                      ORDER BY jaccard DESC, corpus_doc) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT b.doc_id AS new_doc,
           best.corpus_doc AS dup_of,
           best.jaccard,
           CAST(CASE WHEN best.corpus_doc IS NULL THEN 1 ELSE 0 END AS INT)
               AS admit
    FROM (SELECT DISTINCT doc_id FROM batch) b
    LEFT JOIN best ON best.new_doc = b.doc_id
    ORDER BY new_doc
    """,
    tags=("dedup", "curation"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission control for an incoming batch (doc_id % 10 = 0 plays
    the new ingest; the rest is the standing corpus): each new doc is
    admitted unless its trigram-shingle Jaccard against some corpus doc
    reaches 0.1, in which case it reports its closest duplicate.

    Scale shape: the join is one-directional — batch shingles probe
    the corpus shingle table (at 100 TB a bucketed/sorted digest table,
    so the probe is a partition-local merge, and only batch-sized
    state shuffles). The argmax-duplicate is a window over the
    batch-sized overlap set, never over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    batch = sh.filter(F.col("doc_id") % 10 == 0)
    corpus = sh.filter(F.col("doc_id") % 10 != 0)
    overlap = (
        batch.alias("b")
        .join(corpus.alias("c"), F.col("b.shingle") == F.col("c.shingle"))
        .groupBy(
            F.col("b.doc_id").alias("new_doc"),
            F.col("c.doc_id").alias("corpus_doc"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    scored = (
        overlap.join(
            sizes.withColumnRenamed("doc_id", "new_doc").withColumnRenamed("n", "nb"),
            "new_doc",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "corpus_doc").withColumnRenamed(
                "n", "nc"
            ),
            "corpus_doc",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("nb") + F.col("nc") - F.col("inter")),
                6,
            ),
        )
        .filter(
            F.col("inter").cast("double")
            / (F.col("nb") + F.col("nc") - F.col("inter"))
            >= _KEEP_JACCARD
        )
    )
    w = Window.partitionBy("new_doc").orderBy(
        F.desc("jaccard"), F.col("corpus_doc")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_doc", "corpus_doc", "jaccard")
    )
    return (
        batch.select("doc_id").distinct()
        .withColumnRenamed("doc_id", "new_doc")
        .join(best, "new_doc", "left")
        .select(
            "new_doc",
            F.col("corpus_doc").alias("dup_of"),
            "jaccard",
            F.col("corpus_doc").isNull().cast("int").alias("admit"),
        )
        .orderBy("new_doc")
    )


_BLOOM_M = 262144  # bits
_BLOOM_K = 4       # hash functions


@register(
    "dedup_bloom_incremental",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, sha256('b:' || trim(lower(text))) AS hx
        FROM documents WHERE length(trim(text)) > 0
    ),
    pos AS (
        SELECT doc_id,
               unnest([{", ".join(
                   f"{hex_to_u32_sql(f'sha256({chr(39)}p{j}:{chr(39)} || hx)')} % {_BLOOM_M}"
                   for j in range(_BLOOM_K)
               )}]) AS bit
        FROM fp
    ),
    bits AS (
        SELECT DISTINCT bit FROM pos WHERE doc_id % 2 = 0
    ),
    probe AS (
        SELECT p.doc_id,
               CAST(count(*) AS BIGINT) AS n_probe,
               CAST(sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit
        FROM pos p LEFT JOIN bits b ON b.bit = p.bit
        WHERE p.doc_id % 2 = 1
        GROUP BY p.doc_id
    ),
    exact AS (
        SELECT n.doc_id,
               CAST(CASE WHEN EXISTS (
                   SELECT 1 FROM fp o
                   WHERE o.doc_id % 2 = 0 AND o.hx = n.hx
               ) THEN 1 ELSE 0 END AS INT) AS exact_dup
        FROM fp n WHERE n.doc_id % 2 = 1
    )
    SELECT p.doc_id,
           CAST(CASE WHEN n_hit = n_probe THEN 1 ELSE 0 END AS INT)
               AS bloom_hit,
           e.exact_dup
    FROM probe p JOIN exact e ON e.doc_id = p.doc_id
    ORDER BY p.doc_id
    """,
    tags=("dedup",),
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership for incremental exact dedup: the even
    half of the corpus is the already-ingested batch whose k=4 bit
    positions (over an m=2^18 space, deterministic sha-derived) form
    the filter; the odd half probes it. A doc is a bloom HIT iff every
    one of its bits is set — guaranteed to cover every exact duplicate
    (no false negatives), with hash-collision false positives the
    exact_dup column exposes. The engine form of what Spark's runtime
    bloom-pruned join / DataSketches do: membership travels as a SMALL
    bit set (32 KB here), not as the corpus. Scale: the bit set
    broadcast-joins the probe side; the corpus is never re-shuffled;
    rebuilding the filter per ingest batch is one distinct over
    positions — m and k size to the expected corpus cardinality."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    fp = docs.select(
        "doc_id",
        F.sha2(F.concat(F.lit("b:"), F.trim(F.lower(F.col("text")))), 256).alias(
            "hx"
        ),
    )
    pos = fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.sha2(F.concat(F.lit(f"p{j}:"), F.col("hx")), 256),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % _BLOOM_M
                    )
                    for j in range(_BLOOM_K)
                ]
            )
        ).alias("bit"),
    )
    bits = pos.filter(F.col("doc_id") % 2 == 0).select("bit").distinct()
    probe = (
        pos.filter(F.col("doc_id") % 2 == 1)
        .join(
            F.broadcast(bits.withColumn("set_", F.lit(1))), "bit", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum(F.when(F.col("set_").isNotNull(), 1).otherwise(0)).alias(
                "n_hit"
            ),
        )
    )
    # the exact-fingerprint table is CORPUS-growing (one digest per
    # standing doc) — unlike the bloom bit set it must never carry a
    # forced broadcast; the hx equi-join shuffles 16-byte digests and
    # AQE picks the strategy per actual size
    corpus_fp = fp.filter(F.col("doc_id") % 2 == 0).select("hx").distinct()
    exact = (
        fp.filter(F.col("doc_id") % 2 == 1)
        .join(corpus_fp.withColumn("dup_", F.lit(1)), "hx", "left")
        .select(
            "doc_id", F.col("dup_").isNotNull().cast("int").alias("exact_dup")
        )
    )
    return (
        probe.join(exact, "doc_id")
        .select(
            "doc_id",
            (F.col("n_hit") == F.col("n_probe")).cast("int").alias("bloom_hit"),
            "exact_dup",
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_url_normalize",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://' || upper(source) || '.Example.org:443/a//b/'
                   || CAST(doc_id % 100 AS VARCHAR)
                   || '/?utm_source=feed&lang=' || lang || '&utm_medium=x&v=1#frag'
                   AS url
        FROM documents
    ),
    norm AS (
        SELECT doc_id, url,
               -- rule order: port fold -> slash collapse PROTECTING the
               -- scheme's '//' (RE2 has no lookbehind: '([^:])//+') ->
               -- utm strip -> promote the first orphaned '&' to '?'
               -- (anchored, so first-match DuckDB == replace-all Spark)
               -- -> index-page '/?' fold
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(lower(url), '#.*$', ''),
                         ':443/', '/', 'g'),
                       '([^:])//+', '\\1/', 'g'),
                     '[?&]utm_[^&]*', '', 'g'),
                   '^([^?&]*)&', '\\1?'),
                 '/\\?', '?', 'g') AS canon
        FROM u
    )
    SELECT canon,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM norm
    GROUP BY canon HAVING count(*) > 1
    ORDER BY canon
    """,
    tags=("dedup",),
)
def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + exact dedup — the FIRST pass of every
    web-crawl pipeline (before any content hashing): lowercase, strip
    fragments, drop utm_* tracking params, fold default ports and
    duplicate slashes, then group identical canonical URLs. Each rule
    is one regexp_replace riding the scan (codegen, no Python); the
    dedup agg partial-combines. The deterministic synthetic URLs
    collide on doc_id % 100, so the oracle checks real collision
    groups. Scale: canonicalization is embarrassingly parallel; the
    group-by shuffles only distinct canonical URLs."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"),
        F.upper(F.col("source")),
        F.lit(".Example.org:443/a//b/"),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("/?utm_source=feed&lang="),
        F.col("lang"),
        F.lit("&utm_medium=x&v=1#frag"),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(F.lower(url), r"#.*$", ""),
                        r":443/",
                        "/",
                    ),
                    r"([^:])//+",  # protect the scheme's '//'
                    "$1/",
                ),
                r"[?&]utm_[^&]*",
                "",
            ),
            r"^([^?&]*)&",  # first orphaned '&' becomes the '?'
            "$1?",
        ),
        r"/\?",
        "?",
    )
    return (
        d.select("doc_id", canon.alias("canon"))
        .groupBy("canon")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_urls") > 1)
        .orderBy("canon")
    )


@register(
    "dedup_substring_span_scrub",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    sized AS (
        SELECT doc_id, t, len(t) AS n FROM d WHERE len(t) >= {_SPAN_K}
    ),
    grams AS (
        SELECT doc_id, i,
               md5(array_to_string(list_slice(t, i, i + {_SPAN_K - 1}), ' ')) AS g
        FROM sized,
             LATERAL (SELECT unnest(generate_series(1, n - {_SPAN_K - 1})) AS i)
    ),
    dup AS (
        SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    covered AS (
        SELECT DISTINCT doc_id, pos
        FROM grams,
             LATERAL (SELECT unnest(generate_series(i, i + {_SPAN_K - 1})) AS pos)
        WHERE g IN (SELECT g FROM dup)
    ),
    kept AS (
        SELECT s.doc_id, p.pos, s.t[p.pos] AS tok
        FROM sized s,
             LATERAL (SELECT unnest(generate_series(1, s.n)) AS pos) p
        WHERE NOT EXISTS (SELECT 1 FROM covered c
                          WHERE c.doc_id = s.doc_id AND c.pos = p.pos)
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS dg
        FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(s.n AS BIGINT) AS n_tokens,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           round(CAST(coalesce(a.n_kept, 0) AS DOUBLE) / s.n, 6) AS kept_frac,
           coalesce(a.dg, '<empty>') AS clean_digest
    FROM sized s LEFT JOIN agg a ON s.doc_id = a.doc_id
    ORDER BY s.doc_id
    """,
    tags=("dedup", "curation"),
)
def dedup_substring_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REWRITE half of exact substring dedup (Lee et al.):
    dedup_substring_spans finds cross-document duplicated K-token
    spans; this query REMOVES every token covered by one and emits the
    scrubbed document (as an md5 digest + kept-token accounting, so
    the full rewritten text is oracle-checkable without hashing
    megabytes through the comparator).

    Scale: span digests shuffle (16 B/span) to find duplicates;
    covered positions shuffle back as ints (4 B/duplicated token) and
    meet each doc's token array in ONE doc_id-keyed join — the
    irreducible cost of a rewrite pass, since the output itself is
    corpus-sized. Kept positions resolve via array_except +
    element_at (no per-token set probe), so the rewrite is a narrow
    map after the join."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    docs = docs.transform(spread_input, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), _TOKENIZE)
    sized = (
        docs.select("doc_id", toks.alias("t"))
        .withColumn("n", F.size("t"))
        .filter(F.col("n") >= _SPAN_K)
    )
    grams = sized.select(
        "doc_id",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - F.lit(_SPAN_K - 1)),
                lambda i: F.struct(
                    i.alias("i"),
                    F.md5(
                        F.concat_ws(" ", F.slice(F.col("t"), i, _SPAN_K))
                    ).alias("g"),
                ),
            )
        ).alias("sp"),
    ).select("doc_id", "sp.i", "sp.g").persist()
    dup = (
        # r17 (guide §2.3, aggregate before you shuffle): the dup test
        # only needs "seen in >= 2 distinct docs", which is exactly
        # min(doc_id) != max(doc_id) — a single-pass partial aggregate
        # (two longs of map-side state per digest) instead of
        # countDistinct's extra dedup-aggregate level over (g, doc_id).
        # At 100 TB a hot span repeated across thousands of docs keeps
        # a doc-id set per key under countDistinct; min/max is O(1).
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("g")
    )
    covered = (
        grams.join(dup, "g", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(_SPAN_K - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("cov"))
    )
    joined = sized.join(covered, "doc_id", "left").withColumn(
        "kept_pos",
        F.array_sort(
            F.array_except(
                F.sequence(F.lit(1), F.col("n")),
                F.coalesce(F.col("cov"), F.expr("CAST(array() AS ARRAY<INT>)")),
            )
        ),
    )
    kept_toks = F.transform(
        F.col("kept_pos"), lambda p: F.element_at(F.col("t"), p)
    )
    return (
        joined.select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.size("kept_pos").cast("long").alias("n_kept"),
            F.round(
                F.size("kept_pos").cast("double") / F.col("n"), 6
            ).alias("kept_frac"),
            F.when(
                F.size("kept_pos") > 0, F.md5(F.concat_ws(" ", kept_toks))
            )
            .otherwise(F.lit("<empty>"))
            .alias("clean_digest"),
        )
        .orderBy("doc_id")
    )


@register(
    "curation_topic_balance",
    oracle=f"""
    WITH vec AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    cent0 AS (SELECT vec_id AS cid, v AS c FROM vec WHERE vec_id < {_KM_K}),
    {_KM_ASSIGN_SQL.format(r=1, p=0, dist=_sqdist_duckdb("v", "c"))},
    counts AS (SELECT cid, count(*) AS n FROM a1 GROUP BY cid),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
    SELECT cid AS topic_id,
           CAST(n AS BIGINT) AS n_vecs,
           round(CAST(n AS DOUBLE) / t, 6) AS share,
           round(t / {_KM_K}.0 / n, 6) AS weight,
           CAST(least(n, CAST(ceil(t / {_KM_K}.0) AS BIGINT)) AS BIGINT)
               AS n_keep
    FROM counts, tot
    ORDER BY topic_id
    """,
    tags=("dedup", "curation", "similarity"),
)
def curation_topic_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balance audit for mixture curation: assign every embedding
    to its nearest of K topic centroids (the same broadcast-codebook
    map-side argmin as dedup_semantic_clusters — no shuffle to
    assign), then emit per-topic counts, corpus share, the uniform-
    target resampling weight w_t = (N/K)/n_t, and the capped keep
    count under an even per-topic budget. This is the cluster-
    proportion step a pretraining mixture runs between dedup and shard
    assignment: over-represented topics get down-weighted before
    sampling (cf. the temperature variant in
    curation_mixture_weights, which balances by SOURCE — this one
    balances by emergent semantic cluster).

    Scale: one map-side assignment pass over the corpus; everything
    after operates on the K-row counts table, and the corpus total
    joins as a single-row broadcast — never a collect."""
    vec = _km_vectors(spark, sf_dir)
    cent0 = vec.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    assigned = _km_assign(vec, cent0)
    counts = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("cid").alias("topic_id"),
            F.col("n").cast("long").alias("n_vecs"),
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
            F.round(
                F.col("t") / F.lit(float(_KM_K)) / F.col("n"), 6
            ).alias("weight"),
            F.least(
                F.col("n"),
                F.ceil(F.col("t") / F.lit(float(_KM_K))).cast("long"),
            )
            .cast("long")
            .alias("n_keep"),
        )
        .orderBy("topic_id")
    )
