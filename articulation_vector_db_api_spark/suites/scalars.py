"""Scalar-function suite (SURVEY §2.2 string/date/math/array/map/json).

The reference's scalar surface is tiny (concat/strip/basename for
context assembly and ids, /root/reference/main.py:287,317,324); the
engine exposes the full built-in families. Everything here is
whole-stage-codegen'd JVM expressions — the 100 TB rule is simply
"never leave the JVM for a scalar".

Cross-engine parity notes baked into the oracles:
- DuckDB ``dayofweek`` is 0-based Sunday, Spark is 1-based → +1.
- transcendentals (exp/ln/log10) are libm-dependent in the last ulp →
  rounded to 6 decimals on both sides. sqrt is IEEE-exact → unrounded.
- DuckDB map extraction returns a single-element list → ``[1]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


@register(
    "string_functions",
    headline=True,
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS seg_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           string_split(c_name, '#')[1] AS name_word,
           concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS name_key,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           strpos(c_name, '#') AS hash_pos,
           reverse(c_name) AS name_rev,
           replace(c_name, 'Customer', 'C') AS name_short,
           trim('  ' || c_name || ' ') AS name_trim,
           CAST(starts_with(c_name, 'Customer') AS INT) AS is_customer,
           CAST(contains(c_name, '42') AS INT) AS has_42,
           repeat(c_mktsegment, 2) AS seg_twice,
           ascii(c_name) AS first_code
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, slice, regex, split, pad, search, replace."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.split("c_name", "#").getItem(0).alias("name_word"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "name_key"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.reverse("c_name").alias("name_rev"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.startswith(F.col("c_name"), F.lit("Customer")).cast("int").alias(
            "is_customer"
        ),
        F.contains(F.col("c_name"), F.lit("42")).cast("int").alias("has_42"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.ascii("c_name").alias("first_code"),
    ).orderBy("c_custkey")


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,
           weekofyear(o_orderdate) AS iso_week,
           quarter(o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS date_str,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS plus_30,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS first_of_month
    FROM orders
    WHERE o_orderkey % 10 = 0
    ORDER BY o_orderkey
    """,
    tags=("scalar", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: parts, truncation, formatting, arithmetic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("iso_week"),
        F.quarter(d).alias("qtr"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_format(d, "yyyy-MM-dd").alias("date_str"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_add(d.cast("date"), 30).alias("plus_30"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("first_of_month"),
    ).orderBy("o_orderkey")


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS abs_disc_gap,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(l_extendedprice, 1) AS price_round1,
           sqrt(l_quantity) AS qty_sqrt,
           l_orderkey % 7 AS key_mod7,
           round(power(l_quantity, 2), 6) AS qty_sq,
           round(exp(l_discount), 6) AS disc_exp,
           round(ln(1 + l_tax), 6) AS tax_ln,
           round(log10(1 + l_extendedprice), 6) AS price_log10,
           round(greatest(l_tax, l_discount), 6) AS max_rate,
           round(least(l_tax, l_discount), 6) AS min_rate,
           CAST(sign(l_discount - 0.04) AS DOUBLE) AS disc_sign
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt/abs/ceil/floor/%/sign are IEEE-exact and left
    unrounded; libm-backed exp/ln/log10/power round to 6."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc_gap"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log(F.lit(1) + F.col("l_tax")), 6).alias("tax_ln"),
        F.round(F.log10(F.lit(1) + F.col("l_extendedprice")), 6).alias("price_log10"),
        F.round(F.greatest("l_tax", "l_discount"), 6).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 6).alias("min_rate"),
        F.signum(F.col("l_discount") - 0.04).alias("disc_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           array_to_string(list_transform(embedding[1:4],
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS first4,
           embedding[-1] AS last_elem,
           list_aggregate(embedding, 'max') AS vmax,
           list_aggregate(embedding, 'min') AS vmin,
           array_to_string(list_transform(list_sort(embedding)[1:3],
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',') AS bottom3,
           len(list_filter(embedding, x -> x > 0.1)) AS n_above,
           round(list_reduce(list_prepend(0.0, list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), (acc, v) -> acc + v), 6) AS vsum
    FROM embeddings
    WHERE vec_id % 10 = 0
    ORDER BY vec_id
    """,
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column — the workhorses of every
    vector op in this engine (slice/sort/filter/fold)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(emb, 1, 4),
                lambda x: F.round(x.cast("double") * 1e6).cast("long").cast("string"),
            ),
        ).alias("first4"),
        F.element_at(emb, -1).alias("last_elem"),
        F.array_max(emb).alias("vmax"),
        F.array_min(emb).alias("vmin"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(emb), 1, 3),
                lambda x: F.round(x.cast("double") * 1e6).cast("long").cast("string"),
            ),
        ).alias("bottom3"),
        F.size(F.filter(emb, lambda x: x > 0.1)).alias("n_above"),
        F.round(
            F.aggregate(
                emb, F.lit(0.0), lambda acc, v: acc + v.cast("double")
            ),
            6,
        ).alias("vsum"),
    ).orderBy("vec_id")


@register(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           array_to_string(json_keys(props), ',') AS keys,
           length(props) AS props_len
    FROM events
    WHERE event_id % 5 = 0
    ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family on the events.props payload column: path extraction
    (get_json_object) and schema-on-read (from_json) — at scale prefer
    from_json once into a struct over repeated path extraction."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        (parsed.getField("k") % 10).alias("k_bucket"),
        F.concat_ws(",", F.json_object_keys("props")).alias("keys"),
        F.length("props").alias("props_len"),
    ).orderBy("event_id")


@register(
    "null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
           CASE WHEN l_discount > 0.05 THEN 'high'
                WHEN l_discount > 0.0  THEN 'low'
                ELSE 'none' END AS disc_band,
           CAST(l_discount = 0.0 AS INT) AS is_zero,
           ifnull(nullif(l_returnflag, 'N'), 'neutral') AS flag_or_default,
           count(*) OVER (PARTITION BY nullif(l_returnflag, 'N')) AS band_n
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics family: nullif/coalesce/ifnull, CASE bands, and
    null-keyed window partitions (Spark and SQL both group NULL keys
    together)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    from pyspark.sql.window import Window

    nf = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_flag"
        ),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.0, "low")
        .otherwise("none")
        .alias("disc_band"),
        (F.col("l_discount") == 0.0).cast("int").alias("is_zero"),
        F.ifnull(nf, F.lit("neutral")).alias("flag_or_default"),
        F.count(F.lit(1)).over(Window.partitionBy(nf)).alias("band_n"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "struct_map_functions",
    oracle="""
    SELECT c_custkey,
           struct_pack(bal := c_acctbal, seg := c_mktsegment).bal AS bal,
           struct_pack(bal := c_acctbal, seg := c_mktsegment).seg AS seg,
           (MAP {'segment': c_mktsegment})['segment'][1] AS seg_from_map,
           to_json(struct_pack(k := c_custkey)) AS js
    FROM customer
    WHERE c_custkey % 20 = 0
    ORDER BY c_custkey
    """,
    tags=("scalar", "struct"),
)
def struct_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map family: nested construction + field access +
    to_json. The engine prefers structs over maps for fixed keys
    (reference metadata triple, main.py:165-169) — structs get
    columnar storage and nested-schema pruning."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    st = F.struct(F.col("c_acctbal").alias("bal"), F.col("c_mktsegment").alias("seg"))
    mp = F.create_map(F.lit("segment"), F.col("c_mktsegment"))
    return c.select(
        "c_custkey",
        st.getField("bal").alias("bal"),
        st.getField("seg").alias("seg"),
        F.element_at(mp, "segment").alias("seg_from_map"),
        F.to_json(F.struct(F.col("c_custkey").alias("k"))).alias("js"),
    ).orderBy("c_custkey")


@register(
    "map_higher_order_functions",
    oracle="""
    SELECT c_custkey,
           CAST(c_acctbal + 1.0 AS DOUBLE) AS bal_plus1,
           CAST(1 AS INTEGER) AS n_kept,
           CAST(1.0 AS DOUBLE) AS zip_diff
    FROM customer
    WHERE c_custkey % 20 = 0
    ORDER BY c_custkey
    """,
    tags=("scalar", "map"),
)
def map_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order map functions: transform_values, map_filter,
    map_zip_with — all JVM-side codegen'd lambdas, no Python. The oracle
    states the algebraically-equivalent flat values (DuckDB has no map
    lambdas); the Spark plan is what exercises the operators. Map
    columns themselves never cross the comparator — map serialization
    order is engine-specific, so results project to scalars."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    m1 = F.create_map(
        F.lit("bal"), F.col("c_acctbal"), F.lit("dbl"), F.col("c_acctbal") * 2
    )
    m2 = F.transform_values(m1, lambda k, v: v + 1)
    kept = F.map_filter(m1, lambda k, v: k == F.lit("bal"))
    zipped = F.map_zip_with(m1, m2, lambda k, v1, v2: v2 - v1)
    return c.select(
        "c_custkey",
        F.element_at(m2, "bal").alias("bal_plus1"),
        F.cardinality(kept).alias("n_kept"),
        F.element_at(zipped, "bal").alias("zip_diff"),
    ).orderBy("c_custkey")


@register(
    "scalar_variant_semistructured",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
           CAST(sum(CASE WHEN json_extract(props, '$.absent') IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalars", "json"),
)
def scalar_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4):
    props parses ONCE into a binary variant at scan time, then typed
    path extraction (`variant_get`) feeds ordinary aggregation, and
    `try_variant_get` gives NULL-safe access to absent paths. At
    100 TB this is the difference between re-parsing JSON text per
    expression and shredding it once into a columnar-friendly binary —
    the modern lakehouse answer to schemaless event payloads."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return (
        v.select(
            "event_type",
            F.variant_get("v", "$.k", "bigint").alias("k"),
            F.try_variant_get("v", "$.absent", "bigint").alias("absent"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0)).alias(
                "n_missing"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_bitwise_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, 1365) AS bxor,
           (o_orderkey & 15) << 3 AS shl,
           o_orderkey >> 4 AS shr,
           CAST(bit_count(o_orderkey) AS INT) AS popcount,
           ~o_orderkey AS bnot
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar",),
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, population count, complement
    — the primitives under bitmap indexes, bloom filters, and feature
    hashing. Pure map-side codegen expressions; nothing leaves the
    scan's partitioning."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(1365)).alias("bxor"),
        F.shiftleft(k.bitwiseAND(F.lit(15)), 3).cast("long").alias("shl"),
        F.shiftright(k, 4).cast("long").alias("shr"),
        F.bit_count(k).alias("popcount"),
        F.expr("~o_orderkey").alias("bnot"),
    ).orderBy("o_orderkey")


@register(
    "scalar_hash_digests",
    oracle="""
    SELECT n_nationkey,
           md5(n_name) AS name_md5,
           sha256(n_name) AS name_sha256,
           substr(sha256(n_name || ':' || CAST(n_nationkey AS VARCHAR)), 1, 16)
               AS keyed_prefix,
           length(md5(n_name)) AS md5_len
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("scalar",),
)
def scalar_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest family (md5 / sha-256): content
    fingerprints for exact dedup, cache keys, and deterministic
    sampling — every cross-engine pipeline needs digests that agree
    byte-for-byte, which is why these (not engine-private hashes like
    xxhash64) are the portable currency. Map-side only."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name")).alias("name_md5"),
        F.sha2(F.col("n_name"), 256).alias("name_sha256"),
        F.substring(
            F.sha2(
                F.concat(
                    F.col("n_name"), F.lit(":"), F.col("n_nationkey").cast("string")
                ),
                256,
            ),
            1,
            16,
        ).alias("keyed_prefix"),
        F.length(F.md5(F.col("n_name"))).alias("md5_len"),
    ).orderBy("n_nationkey")


@register(
    "scalar_url_functions",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.org/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2'
                   AS url
        FROM documents
    )
    SELECT doc_id,
           split_part(url, '://', 1) AS protocol,
           split_part(split_part(url, '//', 2), '/', 1) AS host,
           regexp_extract(url, '//[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           split_part(regexp_extract(url, '//[^/]+(/[^?#]*)', 1), '/', 3)
               AS doc_segment
    FROM u ORDER BY doc_id
    """,
    tags=("scalar",),
)
def scalar_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (parse_url): protocol, host, path, query
    string, one query parameter, one path segment — the per-record
    fields every web-crawl curation pipeline derives before domain
    filtering / URL dedup. Spark's parse_url is JVM codegen; the
    oracle rebuilds each part with splits/regex over the same
    deterministic URLs, which agree for well-formed absolute URLs.
    Map-side only; at 100 TB this is a projection riding the scan."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.element_at(
            F.split(F.parse_url(F.col("url"), F.lit("PATH")), "/"), 3
        ).alias("doc_segment"),
    ).orderBy("doc_id")


@register(
    "scalar_printf_format",
    oracle="""
    SELECT n_nationkey,
           printf('%05d|%s', n_nationkey, n_name) AS padded_row,
           printf('%x', n_nationkey * 2748) AS hex_key,
           printf('%.3f', n_nationkey / 8.0) AS fixed3,
           printf('%e', n_nationkey * 1234.5) AS sci,
           printf('[%-12s]', n_name) AS left_pad
    FROM nation ORDER BY n_nationkey
    """,
    tags=("scalar",),
)
def scalar_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (format_string): zero-padding, hex,
    fixed/scientific float rendering, left-justification — the
    deterministic string rendering export pipelines and log formatters
    need to agree on across engines. Java's Formatter and C printf
    agree for these conversions; the oracle proves it byte-for-byte."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.format_string("%05d|%s", F.col("n_nationkey"), F.col("n_name")).alias(
            "padded_row"
        ),
        F.format_string("%x", F.col("n_nationkey") * 2748).alias("hex_key"),
        F.format_string("%.3f", F.col("n_nationkey") / 8.0).alias("fixed3"),
        F.format_string("%e", F.col("n_nationkey") * 1234.5).alias("sci"),
        F.format_string("[%-12s]", F.col("n_name")).alias("left_pad"),
    ).orderBy("n_nationkey")


@register(
    "scalar_uuid_surrogate",
    oracle="""
    WITH h AS (
        SELECT o_orderkey, md5('orders:' || CAST(o_orderkey AS VARCHAR)) AS x
        FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderkey,
           substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-3'
             || substr(x, 14, 3) || '-8' || substr(x, 18, 3) || '-'
             || substr(x, 21, 12) AS surrogate_uuid
    FROM h
    ORDER BY o_orderkey
    """,
    tags=("scalar", "etl"),
)
def scalar_uuid_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based surrogate UUIDs (RFC 4122 v3 shape:
    md5 of a namespaced key formatted 8-4-4-4-12 with the version
    nibble pinned to 3 and the variant nibble to 8) — the stable-key
    generator ETL pipelines need where `uuid()` would mint a different
    key every run and every retry: the same (namespace, business key)
    always yields the same UUID, on every engine, so dimension loads
    are idempotent and cross-system joins on the surrogate work.
    Codegen'd md5 + substrings, zero shuffle.

    Scale: embarrassingly parallel map-side expression; at 100 TB the
    only design rule is to namespace the key ('orders:' here) so keys
    from different tables can never collide into one surrogate."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    x = F.md5(F.concat(F.lit("orders:"), F.col("o_orderkey").cast("string")))
    h = o.select("o_orderkey", x.alias("x"))
    return h.select(
        "o_orderkey",
        F.concat(
            F.substring("x", 1, 8), F.lit("-"),
            F.substring("x", 9, 4), F.lit("-3"),
            F.substring("x", 14, 3), F.lit("-8"),
            F.substring("x", 18, 3), F.lit("-"),
            F.substring("x", 21, 12),
        ).alias("surrogate_uuid"),
    ).orderBy("o_orderkey")
