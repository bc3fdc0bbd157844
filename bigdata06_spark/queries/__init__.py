"""Query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a `(spark, sf_dir) -> DataFrame` builder plus (where expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. `__spark_entry__.py` re-exports this registry.

Conventions (driver hash-compare is exact):
- Alias every computed column identically in Spark and oracle SQL.
- Round every *derived* double (sums/products of doubles) to a fixed
  number of decimals on both sides — float addition is not associative,
  so unrounded parallel sums can differ in the last ulp from DuckDB's
  sequential sums. Stored doubles projected unchanged are bit-exact and
  need no rounding.
- In oracle SQL, CAST integer SUMs to BIGINT (DuckDB widens to HUGEINT,
  Spark to LONG).
- Deterministic output: any ranking/top-k pins total order with a key
  tiebreak.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query builder to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return
    the full registry."""
    from bigdata06_spark.queries import (  # noqa: F401
        tpch,
        tpch2,
        tpch3,
        tpch4,
        refparity,
        analytics,
        scalars_q,
        llm,
        curation,
        streaming_q,
        sampling,
        udfs_q,
        lakehouse_q,
    )

    # Family-crossing head order (VERDICT r2 #8), rotated per round
    # (VERDICT r4 #7, r5 #8): external samplers take the FIRST 50
    # registry entries, so each round puts 50 never-yet-sampled
    # queries in that window — external validation accumulates across
    # rounds instead of re-checking the same flagships. Names only;
    # zero semantic change; everything stays in the registry.
    flagship_head = [
        # ---- round-11 head (VERDICT r10 #7 — keep the max-staleness
        # rotation): first the 7 queries ADDED in r11 (never sampled),
        # then the 11 whose code path CHANGED in r11 (pixel-feature
        # slot x2, co-supply halved join + session materialization x5,
        # filter_value typing x2, view-cache fingerprint keying x2),
        # then the 32 LONGEST-UNSAMPLED registry entries (last driver
        # sample r4 — computed from the ten CORRECTNESS files; the
        # remaining 10 r4-vintage entries overflow to the r12 head).
        # EXACTLY 50 names before the round-10 block.
        "knn_graph_greedy_sharded", "knn_sharded_recall",
        "stats_theil_sen", "agg_equidepth_histogram",
        "events_attribution_linear", "graph_personalized_pagerank",
        "lakehouse_check_constraints",
        "multimodal_features", "multimodal_feature_knn",
        "graph_triangle_census", "graph_label_propagation",
        "graph_community_components", "graph_kcore",
        "graph_link_prediction", "knn_filtered_ann",
        "knn_filtered_ivf_ann", "lakehouse_sql_time_travel",
        "lakehouse_sql_copy_into",
        "dedup_simhash", "dq_expectations", "embedding_kmeans",
        "events_hypertable_rollup", "graph_pagerank", "knn_bruteforce",
        "knn_ivfpq", "knn_label_vote_sampled", "lakehouse_mv_incremental",
        "lakehouse_row_cdf", "lakehouse_time_travel",
        "multimodal_checksum", "multimodal_decode", "sample_stratified",
        "scalar_array_hof_funcs", "scalar_date_funcs",
        "scalar_json_funcs", "scalar_string_funcs", "scalar_try_funcs",
        "sessionize_events", "setop_except_all", "setop_intersect",
        "source_avro_decimal_roundtrip", "sql_interface",
        "sql_recursive_cte", "stream_dedup_within_watermark",
        "stream_session_window", "stream_stream_join",
        "stream_transform_with_state", "stream_tumbling_agg",
        "supplier_affinity_graph_capped", "text_bm25_topk",
        # ---- round-10 head (VERDICT r9 #7 — max-staleness rotation):
        # first the 10 queries ADDED in r10 (never sampled), then the
        # 11 whose semantics or oracle CHANGED in r10 (co-supply
        # degree cap x5 + capped affinity headline, adaptive-bits
        # graph-ANN, content-derived multimodal features,
        # dollar-binned spearman, overflow-proofed heavy-hitter keys
        # x2, checkpoint-ordering-touched journey), then the
        # LONGEST-UNSAMPLED registry entries (last driver sample
        # r1/r2 for 22 of them — all predating the dtype-kind harness
        # — and early r4 for the rest), computed from the nine
        # CORRECTNESS files. EXACTLY 50 names before the round-9
        # block (review r10 counted 55 — the overflow now rotates
        # next round); names repeat below (dict insertion keeps the
        # FIRST position).
        "dedup_cdc_chunks", "graph_link_prediction", "stats_levene",
        "knn_filtered_ann", "events_match_recognize",
        "multimodal_feature_knn", "stream_match_recognize",
        "stats_mann_kendall", "dq_benford_test", "knn_filtered_ivf_ann",
        "supplier_affinity_graph", "graph_triangle_census",
        "graph_label_propagation", "graph_community_components",
        "graph_kcore", "knn_graph_greedy", "multimodal_features",
        "stats_spearman_corr", "agg_heavy_hitters",
        "stream_heavy_hitters", "lakehouse_checkpoint_journey",
        "agg_cube", "agg_rollup",
        "agg_count_distinct", "agg_group_stats", "join_cross",
        "join_full_outer", "join_left_outer", "join_nonequi",
        "join_semi", "q15_top_supplier", "q16_supplier_count",
        "q20_excess_suppliers", "ref_array_flatten",
        "ref_category_flatten", "ref_counts", "ref_derived_columns",
        "ref_filter_eq", "ref_pandas_api_on_spark",
        "ref_playlist_flatten", "ref_ragged_dates", "ref_sort_topk",
        "ref_union_ragged", "cdc_scd2_history", "corpus_pack_sequences",
        "corpus_split_assign", "dedup_embedding_cosine", "dedup_exact",
        "dedup_jaccard_stop_shingles", "dedup_minhash_lsh",
        # ---- round-9 head (VERDICT r8 #1): the 4 queries added AFTER
        # the r8 sample draw lead (closing the only driver-coverage
        # gap), then the 3 new r9 queries, then every query whose
        # semantics or oracle CHANGED in r9 (ANN hard-oracle
        # promotion, heavy-hitter Zipf key, anti-join/affinity
        # non-vacuity fixes, scene-cut recomposition, bloom probe
        # cast), then 35 r1/r2-era flagships whose only samples
        # predate the hardened dtype-kind harness — 50 names, filling
        # the external samplers' window exactly. Names may repeat
        # below (dict insertion keeps the FIRST position).
        "events_changepoint_cusum", "stats_ks_test",
        "text_textrank_keywords", "dedup_threshold_sweep",
        "stats_spearman_corr", "stats_kendall_tau",
        "graph_community_components", "stats_anova_oneway",
        "lakehouse_checkpoint_journey", "graph_kcore",
        "knn_graph_greedy", "events_funnel_time_to_convert",
        "knn_lsh_ann", "knn_ivf_ann", "agg_heavy_hitters",
        "stream_heavy_hitters", "join_anti", "supplier_affinity_graph",
        "multimodal_scene_cuts", "join_bloom_prune",
        "q1_pricing_summary", "q3_shipping_priority",
        "q6_forecast_revenue", "q18_large_volume_customers",
        "ref_dedup_first_wins", "ref_enrichment_join",
        "source_spotify_datasource", "join_inner", "join_asof",
        "agg_grouping_sets", "agg_percentiles", "agg_approx_distinct",
        "agg_pivot", "ref_flatten_json", "q5_revenue_by_nation",
        "q10_returned_revenue", "q4_order_priority",
        "q13_customer_distribution", "q14_promo_revenue",
        "q22_global_sales_opportunity", "unpivot_measures",
        "q7_volume_shipping", "q9_profit_by_nation", "q12_late_lines",
        "q17_small_quantity_revenue", "q19_disjunctive_revenue",
        "q21_waiting_supplier", "q2_min_cost_supplier", "q8_market_share",
        "q11_important_parts",
        # ---- round-8 head: the 28 never-yet-driver-sampled entries
        # (VERDICT r7 #3 — after this round every registry query has
        # been driver-sampled at least once), plus agg_approx_percentile
        # (its only r1 sample predates its oracle), scalar_math_funcs2
        # (the r7 hash-red row, re-sampled to prove the sgn type fix),
        # and 20 of the 22 queries ADDED in round 8 (never sampled by
        # definition) — 50 head names total, filling the external
        # samplers' window exactly; the r1-r7-validated flagships
        # follow. The four late additions (text_textrank_keywords,
        # events_changepoint_cusum, dedup_threshold_sweep,
        # stats_ks_test) overflow the window and lead the r9 rotation.
        # Names only; zero semantic change.
        "text_unigram_logprob", "text_bpe_tokenize",
        "text_bpe_train_tokenize", "text_c4_filters", "text_rake_keywords",
        "text_redact_pii", "corpus_curation_funnel", "corpus_chunk_windows",
        "corpus_ngram_novelty", "corpus_decontaminate",
        "corpus_mixture_report", "corpus_source_kl",
        "corpus_temperature_sample", "corpus_epoch_upsample",
        "corpus_diversity_metrics", "multimodal_resize",
        "multimodal_frame_sample", "multimodal_features",
        "stream_dedup_counts", "stream_static_join",
        "stream_watermark_append", "stream_stream_left_join",
        "sample_systematic", "sample_weighted", "sample_bernoulli_certified",
        "lakehouse_merge_current", "knn_lsh_ann", "knn_ivf_ann",
        "agg_approx_percentile", "scalar_math_funcs2",
        "dedup_lsh_probe", "text_zipf_fit",
        "corpus_split_leakage_safe", "agg_count_min_sketch",
        "multimodal_phash_probe", "stream_count_min_sketch",
        "join_bloom_prune", "agg_heavy_hitters", "stats_chi_square",
        "stats_mann_whitney", "dq_profile_columns",
        "text_wordpiece_tokenize", "join_skew_salted",
        "agg_quantile_twopass", "stream_heavy_hitters",
        "events_attribution_last_touch", "orders_basket_rules",
        "knn_ivf_nprobe_curve", "multimodal_scene_cuts",
        "dq_distribution_drift",
        # ---- then the r1-r7-validated flagships, per family
        "multimodal_phash_dedup", "lakehouse_sql_merge_composite",
        "lakehouse_sql_partition_ops", "knn_matryoshka_recall",
        "knn_bq_rerank", "lakehouse_reorg_purge", "agg_transpose_crosstab",
        "agg_boolean_argmax", "agg_grouping_id", "agg_pivot_multi",
        "mv_incremental_refresh", "scalar_generator_funcs",
        "scalar_math_funcs", "scalar_array_funcs", "scalar_conditional",
        "scalar_map_funcs", "scalar_bitwise_funcs", "scalar_explode_outer",
        "scalar_xml_funcs", "scalar_collation_funcs", "scalar_string_funcs2",
        "scalar_date_funcs2", "scalar_array_funcs2",
        "orders_dow_seasonality", "customer_cohort_ltv",
        "events_path_analysis", "orders_abc_pareto", "orders_forecast_ses",
        "orders_trend_ols", "stats_ab_welch_ttest", "stats_bootstrap_ci",
        "supplier_affinity_graph", "feature_quantile_bins",
        "encode_categoricals", "feature_bins_lookup", "orders_rfm_segments",
        "nest_order_documents", "dedup_ngram_jaccard", "dedup_components",
        "dedup_keep_canonical", "dedup_semantic_fixed_k",
        "rag_context_assembly", "embedding_pq_codes", "knn_pq_adc",
        "embedding_power_iteration", "tfidf_top_terms", "text_lang_id",
        "text_fingerprint", "text_vocabulary", "text_gopher_filters",
        "knn_sq8_rerank", "rag_mmr_rerank", "graph_label_propagation",
        "lakehouse_sql_merge", "lakehouse_sql_update_delete",
        "lakehouse_sql_time_travel", "lakehouse_sql_copy_into",
        "lakehouse_convert_insert", "lakehouse_zorder_incremental",
        "lakehouse_manifest_planning", "stream_lakehouse_sink",
        "text_bigram_logprob", "corpus_training_manifest",
        "agg_kmv_sketch_setops", "join_lateral_topk", "events_funnel_steps",
        "cdc_scd1_merge", "graph_triangle_census", "agg_skew_salted",
        "multimodal_audio_windows", "source_avro_roundtrip",
        "join_null_safe", "join_fuzzy_entity_resolution", "window_lag_lead",
        "window_running_sum", "window_distribution", "setop_union_distinct",
        "setop_intersect_all", "join_range_events", "join_asof_nearest",
        "session_window_dynamic_gap", "events_gapfill_locf",
        "events_zscore_outliers", "events_transition_matrix",
        "events_retention_daily", "events_trending_decay",
        "events_activity_heatmap", "events_lateness_profile",
        "events_anomaly_mad", "events_cumulative_distinct",
        "events_concurrency_profile", "agg_histogram",
        "agg_freq_items_sketch", "agg_median_mode", "agg_hll_sketch_rollup",
        "agg_corr_moments", "agg_percentile_disc",
        "agg_bitmap_exact_distinct", "agg_listagg", "forecast_exp_smoothing",
        "inventory_clamped_running_sum", "text_classifier_train",
        "text_classifier_eval", "sql_pipe_syntax", "dq_observed_metrics",
        "lakehouse_partition_pruned", "lakehouse_stats_skipping",
        "lakehouse_delete_vectors", "lakehouse_zorder_skipping",
        "lakehouse_update_where", "lakehouse_rename_drop",
        "lakehouse_bloom_skipping", "lakehouse_generated_partition",
        "lakehouse_replace_where", "lakehouse_identity_column",
        "lakehouse_datasource_read", "lakehouse_datasource_write_roundtrip",
        "knn_ivfpq_persisted", "knn_ivfpq_incremental",
        "dedup_simhash_adaptive", "dedup_semantic",
        "dedup_methods_agreement", "sql_scripting_block",
        "sql_parameterized", "sql_defined_functions",
        "sort_offset_pagination", "scalar_variant_funcs", "scalar_url_funcs",
        "scalar_map_hof_funcs", "scalar_hash_funcs",
        "lakehouse_mv_join_incremental", "stream_sliding_agg",
        "stream_stateful_running", "stream_stream_full_join",
        "stream_tws_list_state", "stream_tws_map_state", "udf_arrow_scalar",
        "udf_grouped_arrow", "dedup_containment", "dedup_substring_spans",
        "dedup_components_star", "dedup_incremental", "knn_pq_adc_rerank",
        "knn_filtered", "knn_label_vote", "rag_hybrid_rrf",
        "embedding_quantize_int8", "text_repetition_stats",
        "text_winnowing_fingerprints", "window_ranking",
        "window_range_frame", "window_ignore_nulls", "topk_per_group",
        "sessionize_events", "setop_intersect", "setop_except_all",
        "scalar_string_funcs", "scalar_date_funcs", "scalar_json_funcs",
        "scalar_array_hof_funcs", "scalar_try_funcs", "stream_tumbling_agg",
        "stream_session_window", "stream_stream_join",
        "stream_transform_with_state", "stream_dedup_within_watermark",
        "udf_pandas_scalar", "udf_grouped_map", "udf_table_function",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_jaccard_stop_shingles", "dedup_embedding_cosine",
        "knn_bruteforce", "embedding_kmeans", "text_quality_score",
        "text_pmi_collocations", "text_bm25_topk", "corpus_split_assign",
        "corpus_pack_sequences", "multimodal_decode", "multimodal_checksum",
        "sample_stratified", "graph_pagerank", "cdc_scd2_history",
        "events_hypertable_rollup", "sql_interface", "sql_recursive_cte",
        "lakehouse_time_travel", "knn_ivfpq", "dq_expectations",
        "text_bpe_train", "supplier_affinity_graph_capped",
        "knn_label_vote_sampled", "lakehouse_row_cdf",
        "source_avro_decimal_roundtrip", "lakehouse_mv_incremental",
        "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
        "q18_large_volume_customers", "ref_dedup_first_wins",
        "ref_enrichment_join", "source_spotify_datasource", "join_inner",
        "join_asof", "agg_grouping_sets", "agg_percentiles",
        "agg_approx_distinct", "agg_pivot", "ref_flatten_json",
        "q5_revenue_by_nation", "q10_returned_revenue", "q4_order_priority",
        "q13_customer_distribution", "q14_promo_revenue",
        "q22_global_sales_opportunity", "unpivot_measures",
        "q7_volume_shipping", "q9_profit_by_nation", "q12_late_lines",
        "q17_small_quantity_revenue", "q19_disjunctive_revenue",
        "q21_waiting_supplier", "q2_min_cost_supplier", "q8_market_share",
        "q11_important_parts", "q15_top_supplier", "q16_supplier_count",
        "q20_excess_suppliers", "ref_union_ragged", "ref_sort_topk",
        "ref_filter_eq", "ref_counts", "ref_ragged_dates",
        "ref_derived_columns", "ref_array_flatten", "ref_playlist_flatten",
        "ref_category_flatten", "ref_pandas_api_on_spark", "join_left_outer",
        "join_full_outer", "join_semi", "join_anti", "join_cross",
        "join_nonequi", "agg_group_stats", "agg_count_distinct",
        "agg_rollup", "agg_cube",
    ]
    missing = [n for n in flagship_head if n not in REGISTRY]
    if missing:
        raise ValueError(f"flagship_head names not in registry: {missing}")
    ordered = {n: REGISTRY[n] for n in flagship_head}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    return ordered
