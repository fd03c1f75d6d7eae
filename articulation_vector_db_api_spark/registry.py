"""Central query registry.

Every engine capability is declared once as a ``Query``: a PySpark
builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle SQL twin. ``__spark_entry__.queries()`` /
``oracle_sql()``, ``bench.py`` and the parity tests all read this one
table, so coverage claims, correctness checks and benchmarks can never
drift apart.

Column-name discipline: the driver's comparator sorts columns by name
before hashing, so every computed column is aliased identically in the
Spark builder and the oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkFn
    oracle: str | None = None  # DuckDB SQL twin; None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

_SUITES = (
    "core",
    "relational",
    "tpch_families",
    "windows",
    "scalars",
    "dedup",
    "similarity",
    "textops",
    "multimodal",
    "streaming",
    "udfs",
    "mllib",
)


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


# Queries a driver round already hash-verified (latest row wins across
# CORRECTNESS_r01 ∪ r02 ∪ r03) or recorded as justified rows-only with
# a driver row. The driver only emits CORRECTNESS rows for a bounded
# prefix of ``queries()`` in registration order, so these move to the
# back of the returned dict to let the still-unverified queries occupy
# the checked window. Their own parity coverage continues via
# tools/check_parity.py + pytest.
_VERIFIED = frozenset(
    {
        "agg_argmax_order", "agg_benford_first_digit",
        "agg_bit_aggregates", "agg_cms_portable", "agg_corr_moments",
        "agg_countif_family", "agg_distinct_counts",
        "agg_equidepth_histogram", "agg_grouping_id_sets",
        "agg_heavy_hitters", "agg_hll_portable_registers",
        "agg_hll_sketch_rollup", "agg_mad_robust", "agg_median_mode",
        "agg_ordered_collect", "agg_percentiles", "agg_price_histogram",
        "agg_revenue_concentration", "agg_stats_moments",
        "agg_trimmed_mean", "agg_weighted_median",
        "ann_binary_quantized_topk", "ann_bruteforce_topk",
        "ann_filtered_topk", "ann_int8_quantized_topk",
        "ann_ivf_delete_probe", "ann_ivf_exact",
        "ann_ivf_incremental_probe", "ann_ivf_nprobe_recall_curve",
        "ann_ivf_range_query", "ann_ivf_stored_probe",
        "ann_ivfpq_adc_topk", "ann_lsh_bucketed", "ann_pq_adc_topk",
        "ann_range_query", "ann_recall_eval", "approx_distinct_parts",
        "approx_percentile_prices", "array_functions",
        "cdc_snapshot_diff", "chunk_documents", "chunk_tokens_window",
        "cube_order_status", "curation_gopher_rules",
        "curation_importance_weights", "curation_mixture_weights",
        "curation_model_quality_score", "curation_pii_scrub",
        "curation_sample_quality_band",
        "curation_sample_weighted_priority",
        "curation_shard_assignment", "curation_topic_balance",
        "date_functions", "dedup_bloom_incremental", "dedup_cc_star",
        "dedup_connected_components", "dedup_exact",
        "dedup_exact_normalized", "dedup_fuzzy_levenshtein",
        "dedup_incremental_batch", "dedup_lsh_recall_eval",
        "dedup_minhash_lsh", "dedup_ngram_containment",
        "dedup_ngram_jaccard", "dedup_semantic_clusters",
        "dedup_simhash", "dedup_substring_span_scrub",
        "dedup_substring_spans", "dedup_url_normalize",
        "dedup_winnowing", "diag_key_skew", "dq_audit_orders",
        "dq_freshness_by_type", "embedding_dim_stats",
        "embedding_matryoshka_topk", "events_ab_test_lift",
        "events_anomaly_zscore", "events_cep_pattern",
        "events_cusum_changepoint", "events_decay_weighted_score",
        "events_ewma_daily", "events_funnel_time_bound",
        "events_gap_filled_daily", "events_interarrival_stats",
        "events_interval_coverage", "events_mann_kendall",
        "events_markov_transitions", "events_ohlc_bars",
        "events_peak_concurrency", "events_resample_interpolate",
        "events_seasonality_profile", "events_session_funnel",
        "events_theil_sen_trend", "events_threshold_debounce",
        "events_token_bucket", "events_weekly_retention",
        "filter_project_pushdown", "flagship_search", "graph_bfs_hops",
        "graph_common_neighbors", "graph_k_core",
        "graph_label_propagation", "graph_pagerank",
        "graph_triangle_count", "graph_weighted_sssp",
        "grouping_sets_revenue", "hash_embedding_vectors",
        "health_probe", "index_stats_by_source",
        "ingest_archive_explode", "ingest_epub_extract",
        "ingest_extract_status", "ingest_fault_isolation",
        "ingest_incremental_embed", "ingest_mail_extract",
        "ingest_office_extract", "ingest_rtf_html_extract",
        "join_anti_customers_no_urgent", "join_asof_event_order",
        "join_asof_forward_tolerance", "join_asof_nearest",
        "join_broadcast_snowflake", "join_bucketed_noshuffle",
        "join_dpp_partitioned_fact", "join_interval_overlap_pairs",
        "join_lateral_topn", "join_null_aware_anti",
        "join_range_calendar", "join_salted_skew", "join_scd2_temporal",
        "join_semi_customers_with_urgent", "join_sortmerge_fact",
        "join_theta_supplier_pairs", "json_functions",
        "layout_zorder_stats", "maintenance_compact_roundtrip",
        "maintenance_vacuum_retention", "map_higher_order_functions",
        "math_functions", "matview_incremental_rollup",
        "matview_join_incremental", "matview_rollup_time_travel",
        "merge_upsert_orders", "mllib_ann_neighbors",
        "mllib_count_vectorizer", "mllib_ivf_ann",
        "mllib_minhash_dedup", "mllib_similarity_join",
        "mllib_tfidf_pipeline", "multimodal_adts_probe",
        "multimodal_aiff_au_roundtrip",
        "multimodal_ass_subtitle_extract",
        "multimodal_audio_adpcm_roundtrip",
        "multimodal_audio_caption_align",
        "multimodal_audio_flac_roundtrip", "multimodal_audio_framing",
        "multimodal_audio_g711_roundtrip", "multimodal_audio_resample",
        "multimodal_audio_vad_trim", "multimodal_audio_wav_roundtrip",
        "multimodal_av_container_probe", "multimodal_avi_av_extract",
        "multimodal_avi_dib_roundtrip",
        "multimodal_avi_mjpeg_scene_cuts", "multimodal_binary_metadata",
        "multimodal_dash_timeline_roundtrip",
        "multimodal_decode_features", "multimodal_dhash_image_dedup",
        "multimodal_fmp4_dash_roundtrip", "multimodal_frame_sample",
        "multimodal_gif_animation_frames", "multimodal_gif_roundtrip",
        "multimodal_hls_encrypted_stitch",
        "multimodal_hls_master_variant", "multimodal_hls_ts_stitch",
        "multimodal_id3_cover_art", "multimodal_id3_metadata",
        "multimodal_jpeg_roundtrip", "multimodal_mkv_av_extract",
        "multimodal_mkv_mjpeg_decode", "multimodal_modality_router",
        "multimodal_mp1_decode", "multimodal_mp2_decode",
        "multimodal_mp3_probe", "multimodal_mp4_audio_extract",
        "multimodal_mp4_mjpeg_decode", "multimodal_mpeg1_bframe_decode",
        "multimodal_mpeg1_iframe_decode",
        "multimodal_mpeg1_in_containers",
        "multimodal_mpeg1_pframe_decode", "multimodal_mpeg2_decode",
        "multimodal_mpeg2_ps_roundtrip", "multimodal_mpeg_ps_roundtrip",
        "multimodal_mpeg_ts_roundtrip", "multimodal_ogg_flac_roundtrip",
        "multimodal_opus_packet_stats", "multimodal_phash_dct_dedup",
        "multimodal_pixel_histogram", "multimodal_pixel_roundtrip",
        "multimodal_qoi_roundtrip", "multimodal_resize_batch",
        "multimodal_resize_pixels", "multimodal_subtitle_normalize",
        "multimodal_tiff_roundtrip", "multimodal_ttml_subtitle_extract",
        "multimodal_video_caption_align", "multimodal_video_scene_cuts",
        "multimodal_vorbis_decode", "multimodal_webp_roundtrip",
        "nested_agg_big_spenders", "null_handling",
        "pack_sequences_token_budget", "pipeline_corpus_curation",
        "pipeline_dedup_keep_best", "pipeline_delivery_ingest",
        "pipeline_document_corpus_ingest", "pipeline_image_curation",
        "pipeline_training_export", "pipeline_video_curation",
        "pipeline_web_image_ingest", "pipeline_web_ingest",
        "pivot_priority_multi_agg", "pivot_status_revenue",
        "q10_returned_items", "q11_important_stock",
        "q12_late_shipment_priority", "q13_customer_order_distribution",
        "q14_promo_revenue", "q15_top_supplier",
        "q16_supplier_count_by_part", "q17_correlated_subquery",
        "q18_large_volume_customers", "q19_disjunctive_predicates",
        "q1_pricing_summary", "q20_promo_stock_suppliers",
        "q21_waiting_suppliers", "q22_dormant_customers",
        "q2_min_cost_supplier", "q3_shipping_priority",
        "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
        "q7_nation_volume", "q8_market_share",
        "q9_profit_by_nation_year", "rollup_hierarchical_time",
        "rollup_revenue", "sample_deterministic_hash",
        "sample_poisson_bootstrap", "sample_stratified_per_lang",
        "sample_stratified_sources", "sample_train_val_test_split",
        "sample_weighted_reservoir", "scalar_bitwise_ops",
        "scalar_hash_digests", "scalar_printf_format",
        "scalar_subquery_above_avg", "scalar_url_functions",
        "scalar_uuid_surrogate", "scalar_variant_semistructured",
        "scan_arrow_ipc_nested", "scan_arrow_ipc_roundtrip",
        "scan_arrow_ipc_tz", "scan_avro_nested_roundtrip",
        "scan_avro_roundtrip", "scan_avro_union_roundtrip",
        "scan_csv_malformed_tolerant", "scan_csv_typed",
        "scan_jsonl_gzip", "scan_jsonlines_nested",
        "scan_orc_roundtrip", "scan_partitioned_pruned",
        "scan_schema_evolution_log", "scan_text_roundtrip",
        "scan_warc_roundtrip", "scan_xml_roundtrip",
        "scd2_user_event_history", "search_batch_queries",
        "search_bm25", "search_context", "search_hybrid_rrf",
        "search_mmr_diversified", "search_mmr_diversified_k8",
        "search_phrase_adjacent", "search_pluggable_embedder",
        "search_scoped_source", "search_topk_per_source",
        "setop_except_all", "setop_nations_except",
        "setop_nations_intersect", "setop_union_all_counts",
        "similarity_join_lsh_bucket", "similarity_knn_batch",
        "similarity_near_dup_cosine", "sort_global_prices",
        "sql_interface_revenue", "sql_pipe_interface",
        "sql_recursive_cte_hierarchy", "stream_cdc_apply",
        "stream_curation_admission", "stream_dedup",
        "stream_dedup_within_watermark", "stream_ohlc_bars",
        "stream_session_window", "stream_sliding_distinct_users",
        "stream_sliding_window", "stream_snapshot_ingest",
        "stream_stateful_user_stats", "stream_static_join",
        "stream_stream_full_outer_join", "stream_stream_interval_join",
        "stream_stream_left_outer_join", "stream_threshold_debounce",
        "stream_topk_trending", "stream_transform_with_state",
        "stream_tumbling_window", "stream_watermark_append",
        "string_functions", "struct_map_functions",
        "text_bpe_encode_tokens", "text_bpe_learn_merges",
        "text_bpe_learn_merges_batched", "text_bpe_pair_counts",
        "text_char_bigram_lm", "text_char_entropy",
        "text_contamination_overlap", "text_fingerprint",
        "text_html_extract", "text_inverted_index",
        "text_kneser_ney_bigram", "text_langid",
        "text_ngram_coverage_curve", "text_perplexity_score",
        "text_pii_scrub", "text_quality_stats", "text_rake_keywords",
        "text_repetition_stats", "text_tfidf_top_terms",
        "text_token_counts", "text_topk_tokens_per_lang",
        "text_unicode_clean", "text_word_trigrams",
        "topk_orders_by_price", "topk_pagination",
        "udf_applyinpandas_order_gaps", "udf_grouped_agg_price_range",
        "udf_mapinarrow_bytelen", "udf_pandas_vector_norm",
        "udtf_char_trigrams", "unpivot_part_measures",
        "upsert_last_write_wins", "window_activity_islands",
        "window_cume_dist", "window_first_last", "window_lag_lead",
        "window_moving_avg", "window_nth_value", "window_ntile",
        "window_percent_change_wow", "window_range_frame",
        "window_rank_customers", "window_rank_ties",
        "window_rolling_median", "window_running_distinct",
        "window_running_sum", "window_time_range_frame",
    }
)

# Round-17 window (VERDICT r16 item 2 / "What's wrong" #1):
# 0. _WINDOW_ROUND stamps the round this window was seated FOR: the
#    policy tests recompute the expected window from CORRECTNESS files
#    of rounds STRICTLY BEFORE this round, so the driver landing
#    CORRECTNESS_r17.json mid-round cannot flip them red
#    (the r13 round-phase-coupling defect, fixed in r14).
# 1. _WINDOW_FIRST: the r15 defer queue (never driver-contacted —
#    scan_zstd_jsonl / Type0-PDF / 7z, each parity-proven at
#    sf0.001/0.01/0.1 before registration), then the r16 heavy
#    rewrites whose parity evidence was builder-run only (sparse
#    dequant mpeg trio, KN-bigram persist, office extract), then
#    text_bpe_learn_merges_batched (the r16 right-operand prefilter
#    changed its apply path and no driver row ever covered it) and
#    the two queries round 17 itself touched (fmp4-dash /
#    delivery-ingest witness memos).
# 2. _WINDOW_RESEAT: the stalest driver-contacted rows
#    ((latest_round, name) order, r8 rows leading) filling the
#    remaining seats -- rotate_window.py output pasted verbatim.
_WINDOW_ROUND = 17
_WINDOW_FIRST = (
    "scan_zstd_jsonl",
    "ingest_pdf_type0_extract",
    "ingest_sevenz_explode",
    "multimodal_mp1_decode",
    "multimodal_mpeg1_pframe_decode",
    "multimodal_mpeg2_decode",
    "text_kneser_ney_bigram",
    "ingest_office_extract",
    "text_bpe_learn_merges_batched",
    "multimodal_fmp4_dash_roundtrip",
    "pipeline_delivery_ingest",
)
_WINDOW_RESEAT = (
    "scalar_subquery_above_avg", "scan_arrow_ipc_nested",
    "scan_avro_nested_roundtrip", "search_batch_queries",
    "search_context", "search_mmr_diversified",
    "search_scoped_source", "search_topk_per_source",
    "setop_except_all", "setop_nations_except",
    "setop_nations_intersect", "setop_union_all_counts",
    "sort_global_prices", "sql_interface_revenue",
    "topk_orders_by_price", "topk_pagination",
    "upsert_last_write_wins", "agg_ordered_collect",
    "agg_price_histogram", "ann_bruteforce_topk", "array_functions",
    "cdc_snapshot_diff", "date_functions", "dedup_cc_star",
    "dedup_connected_components", "dedup_exact",
    "dedup_exact_normalized", "dedup_fuzzy_levenshtein",
    "dedup_incremental_batch", "dedup_minhash_lsh",
    "dedup_semantic_clusters", "dedup_simhash",
    "dedup_substring_spans", "dedup_winnowing",
    "events_anomaly_zscore", "events_decay_weighted_score",
    "events_gap_filled_daily", "events_ohlc_bars",
    "events_session_funnel",
)

# Suite order for the rest of the unverified front (round-5 additions):
# cheap scalar/relational families first, expensive similarity last.
_SUITE_WINDOW_ORDER = (
    "streaming", "tpch", "relational", "graph", "core", "textops",
    "scalar", "similarity", "window", "dedup", "mllib",
)

# Unverified queries DEFERRED past this round's window on purpose:
# r17 — empty: the r15 defer queue (zstd / Type0-PDF / 7z) now holds
# the front _WINDOW_FIRST seats, and no new queries were registered
# during the optimization rounds.
_WINDOW_DEFER: frozenset[str] = frozenset()


def load_all() -> dict[str, Query]:
    """Import every suite module (each registers its queries on import).

    The returned dict is ordered for the driver's bounded CORRECTNESS
    window: not-yet-verified queries first (grouped by suite, cheap
    suites leading), round-1-verified queries last.
    """
    for mod in _SUITES:
        importlib.import_module(f"articulation_vector_db_api_spark.suites.{mod}")

    reg_pos = {name: i for i, name in enumerate(REGISTRY)}
    suite_rank = {s: i for i, s in enumerate(_SUITE_WINDOW_ORDER)}
    reseat_pos = {name: i for i, name in enumerate(_WINDOW_RESEAT)}

    def sort_key(item: tuple[str, Query]) -> tuple:
        name, q = item
        if name in _WINDOW_FIRST:
            return (0, _WINDOW_FIRST.index(name), 0, 0)
        if name in reseat_pos:
            return (1, reseat_pos[name], 0, 0)
        if name in _WINDOW_DEFER:
            tier = 3  # after the unverified front, before the verified back
        elif name in _VERIFIED:
            tier = 4
        else:
            tier = 2
        suite = next((t for t in q.tags if t in suite_rank), None)
        rank = suite_rank.get(suite, len(suite_rank))
        return (tier, 0, rank, reg_pos[name])

    return dict(sorted(REGISTRY.items(), key=sort_key))
