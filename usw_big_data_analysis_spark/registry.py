"""Query registry — the driver correctness contract.

Every implemented operator from SURVEY.md §2 registers here under its
inventory "Query key": a Spark callable ``(spark, sf_dir) -> DataFrame`` and
(when SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.

The driver compares row-count + schema + order-insensitive value-hash, with
columns sorted by name — so every computed column is aliased identically on
both sides, and floating-point outputs follow the bit-stability conventions
in ``functions/numeric.py`` (decimal-summed aggregates, rounded derived
stats) so the two engines produce byte-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Keys that already have a driver correctness row (CORRECTNESS_r01 ∪ … ∪ r06).
# The driver's per-round gate samples queries() in iteration order, so
# all_queries() floats never-driver-checked keys to the front (within the
# deliberate family order set by queries/__init__.py ALL_MODULES) and sinks
# already-green keys to the back — each round's window lands on fresh keys
# until every family has a driver row. Regenerate after each round:
#   sorted(set(r01_keys) | set(r02_keys) | ...)
_DRIVER_CHECKED: frozenset[str] = frozenset({
    'ab_cuped_adjustment', 'ab_test_power', 'ab_test_ztest', 'align_inner', 'anomaly_zscore',
    'anova_f', 'argmax_threshold', 'attribution_last_touch', 'best_model_select', 'bloom_prune_join',
    'bm25_doc_ranking', 'chi2', 'class_distribution_check', 'cohort_retention', 'concat_cols',
    'corr_matrix', 'corr_target', 'corr_tests', 'crosstab_margins', 'cube_sales',
    'cumsum_curve', 'customer_rfm', 'cv_stratified_kfold', 'dau_mau_stickiness', 'decontam_ngram',
    'dedup_block_hash', 'dedup_bucket_stats', 'dedup_cluster_size_dist', 'dedup_clusters', 'dedup_containment',
    'dedup_cross_source_overlap', 'dedup_embed_cosine', 'dedup_exact', 'dedup_incremental_bands', 'dedup_keep_priority',
    'dedup_minhash_auto', 'dedup_minhash_band_sweep', 'dedup_minhash_lsh', 'dedup_minhash_salted', 'dedup_ngram_jaccard',
    'dedup_pair_evidence', 'dedup_rate_by_source', 'dedup_simhash', 'dedup_simhash_hamming', 'dedup_span_c4',
    'dedup_two_stage_funnel', 'describe', 'doc_chunk_fixed', 'doc_length_overflow', 'doc_sample_hash',
    'dq_audit', 'dq_referential', 'embed_ann_incremental', 'embed_ann_ivf', 'embed_ann_lsh',
    'embed_ann_multitable', 'embed_ann_recall', 'embed_cosine_topk', 'embed_cosine_topk_pandas', 'embed_dedup_threshold_sweep',
    'embed_ivf_cell_stats', 'embed_jl_projection_audit', 'embed_label_centroid_drift', 'embed_lsh_tuning_curve', 'embed_matryoshka_recall',
    'embed_norm_audit', 'embed_pq_assign', 'embed_pq_search', 'embed_quantize_int8', 'encode_cat_int',
    'encode_hash_trick', 'encode_label', 'event_transition_matrix', 'filter_class', 'filter_isin',
    'filter_mask_cols', 'filter_notnull', 'filter_range', 'forecast_backtest', 'forecast_holt_monthly',
    'forecast_hw_monthly', 'forecast_ses_monthly', 'funnel_steps', 'fuzzy_join_names', 'global_stats',
    'graph_bfs_layers', 'graph_degree_dist', 'graph_kcore', 'graph_link_jaccard', 'graph_modularity',
    'graph_triangles', 'groupby_agg', 'groupby_mean_multi', 'groupby_median', 'grouping_sets_sales',
    'impute_mean', 'impute_median', 'impute_mode', 'infer_categorical', 'intersect_names',
    'inverted_index', 'join_asof', 'join_asof_forward', 'join_asof_nearest', 'join_bucketed',
    'join_explosion_audit', 'join_interval_overlap', 'join_lateral_topn', 'join_null_safe', 'join_pred_truth',
    'join_range', 'join_salted_skew', 'join_xy', 'kmeans_spherical', 'knn_hard_negatives',
    'knn_lsh', 'kruskal', 'ks_2samp', 'lag_diff_user', 'lang_id_confusion',
    'latest_by_key', 'limit_head', 'linreg_ols_group', 'mannwhitney', 'merge_cow',
    'metric_accuracy', 'metric_auroc', 'metric_average_precision', 'metric_brier', 'metric_calibration',
    'metric_cohens_kappa', 'metric_confusion', 'metric_f1', 'metric_lift_gains', 'metric_logloss',
    'metric_mcc', 'metric_mcnemar', 'metric_multiclass_macro', 'metric_regression_suite', 'minhash_jaccard_estimate',
    'mixture_epochs_plan', 'mixture_quota', 'mixture_temperature', 'mixture_token_budget', 'monthly_revenue_growth',
    'multimodal_audio_downsample', 'multimodal_audio_segments', 'multimodal_decode', 'multimodal_decode_audio', 'multimodal_decode_image',
    'multimodal_frame_sample', 'multimodal_meta', 'multimodal_phash_groups', 'multimodal_resize_image', 'ntile_quartiles',
    'null_profile', 'observe_metrics_audit', 'order_gap_islands', 'pack_context_windows', 'pagerank_int',
    'percent_rank_cume', 'perplexity_bigram_backoff', 'pipeline_docs_clean', 'pipeline_filter_funnel', 'pipeline_training_mix',
    'pivot_table', 'privacy_column_mask', 'privacy_dp_count_release', 'privacy_dp_mean_release', 'privacy_generalization_ladder',
    'privacy_k_anonymity', 'privacy_l_diversity', 'privacy_qi_uniqueness', 'project_drop', 'project_dtype',
    'project_prefix', 'prune_corr', 'q10_returned_items', 'q11_important_stock', 'q12_priority_shipping',
    'q13_customer_distribution', 'q14_promo_effect', 'q15_top_supplier', 'q16_parts_suppliers', 'q17_small_qty_revenue',
    'q18_large_volume', 'q19_discounted_revenue', 'q1_pricing_summary', 'q20_potential_promotion', 'q21_suppliers_waiting',
    'q22_global_sales', 'q2_min_cost_supplier', 'q3_shipping_priority', 'q4_order_priority', 'q5_local_supplier_volume',
    'q6_forecast_revenue', 'q7_volume_shipping', 'q8_market_share', 'q9_product_profit', 'quality_gate_matrix',
    'quality_perplexity_proxy', 'quality_repetition', 'quantiles_iqr', 'rank_features', 'retrieval_ndcg',
    'retrieval_rank_fusion', 'rolling_mean_user', 'rolling_wau', 'rollup_sales', 'sample_per_class',
    'sample_weighted_priority', 'scale_power', 'scale_quantile', 'scale_robust', 'scale_standard',
    'scan_csv', 'scan_csv_badrecords', 'scan_excel', 'scan_jsonl', 'scan_sas',
    'scan_sas_pages', 'scan_text', 'scd2_history', 'score_combined', 'session_gap_sweep',
    'sink_compaction', 'sink_csv', 'sink_excel', 'sink_json', 'sink_manifest_stats',
    'sink_orc_roundtrip', 'sink_partitioned_scan', 'sink_sas_distributed', 'sink_schema_evolution', 'sink_sorted_scan',
    'sink_zorder_scan', 'snapshot_diff', 'sort_values', 'sorted_zip', 'source_distinctive_terms',
    'split_modk', 'split_stratified', 'sql_api_q6', 'sql_pipe_pricing', 'sql_recursive_capped_balance',
    'sql_scripting_outlier_gate', 'star_sales_by_region', 'str_strip', 'stream_dedup_exact', 'stream_dedup_within_watermark',
    'stream_join_outer', 'stream_join_range', 'stream_session', 'stream_sink_files', 'stream_sliding',
    'stream_stateful_profile', 'stream_topk_state', 'stream_tumbling', 'stream_upsert_foreachbatch', 'stream_watermark_late',
    'survival_kaplan_meier', 'text_bigram_pmi', 'text_char_trigram_profile', 'text_fingerprint', 'text_js_divergence',
    'text_lang_id', 'text_lexical_diversity', 'text_ngram_novelty', 'text_pii_scrub', 'text_quality_score',
    'text_template_prefix_rate', 'text_tfidf_topterms', 'text_token_count', 'text_token_count_arrow', 'text_zipf_fit',
    'tfidf_doc_similarity', 'threshold_sweep', 'tokenizer_bpe_apply', 'tokenizer_bpe_merges', 'top1_argmax',
    'topk_per_group', 'ttest_1samp', 'ttest_ind', 'ttest_rel', 'union_labeled',
    'union_rows', 'value_counts', 'vocab_coverage', 'vocab_growth_curve', 'wilcoxon',
    'window_range_7d', 'word_cooccurrence_clusters', 'wordcount',
})

# No red keys to re-attest: CORRECTNESS_r06 was 50/50 green, so the r07
# window is pure fresh-key attestation.
_PINNED_FIRST: tuple[str, ...] = ()

# Never-driver-checked keys the r07 window should land on, in priority order
# (VERDICT r6 item 1): the round-7 additions first (so the new reference-
# parity keys get an independent driver row immediately), then the largest
# zero-driver-row families — text/token extensions, embed audits, stats-test
# extensions, storage/incremental, and the approximate-sketch audits.
_PRIORITY_FRESH: tuple[str, ...] = (
    # round-7 additions (13)
    'preference_dpo_pairs', 'metric_pass_at_k', 'shard_rebalance_cost',
    'mixture_annealing_plan',
    'encode_onehot', 'cv_loo', 'cv_leave_p_out', 'cv_kfold_plain',
    'cv_multi_metric', 'preference_winrate_matrix',
    'preference_bradley_terry', 'preference_graph_connectivity',
    'quality_krippendorff_alpha',
    # text/token extensions (8, zero driver rows)
    'tokenizer_unigram_viterbi', 'tokenizer_wordpiece_apply',
    'tokenizer_char_coverage', 'retrieval_mrr_recall', 'metric_bleu_pairs',
    'text_watermark_greenlist', 'keywords_textrank', 'text_mattr_diversity',
    # embed audits / similarity extensions (10)
    'embed_bucket_outliers', 'embed_standardize_audit', 'embed_hard_negatives',
    'decontam_embedding_eval', 'embed_ann_ivfpq', 'embed_pq_train',
    'embed_binary_quantize_hamming', 'embed_ann_multiprobe',
    'embed_dim_variance_audit', 'rocchio_centroid_eval',
    # stats-test extensions (20)
    'anova_two_way', 'levene_brown_forsythe', 'normality_jarque_bera',
    'proportion_wilson_ci', 'effect_sizes_two_group', 'mann_kendall_trend',
    'theil_sen_slope', 'multiple_test_fdr_bh', 'anomaly_mad', 'linreg_ridge_2f',
    'trend_cochran_armitage', 'bartlett_test', 'mood_median_test',
    'ab_sequential_sprt', 'runs_test_daily', 'linreg_huber_irls',
    # storage / incremental (3)
    'nested_array_roundtrip', 'mview_incremental', 'mview_moments_merge',
    # remaining AB extensions (tail; spill to r08 if the window is full)
    'ab_diff_in_diff', 'ab_ratio_delta_method', 'ab_tost_equivalence',
    'ab_uplift_by_segment',
    # approximate-sketch / scale audits (8; the tail past 50 spills to r08)
    'approx_distinct_audit', 'approx_percentile_audit', 'heavy_hitters_mg',
    'heavy_hitters_cms', 'stratified_sample_neyman', 'freq_items_audit',
    'skew_salt_plan', 'approx_overlap_audit',
)


def _rotated(keys) -> list[str]:
    keyset = set(keys)
    pinned = [k for k in _PINNED_FIRST if k in keyset]
    priority = [
        k for k in _PRIORITY_FRESH
        if k in keyset and k not in _DRIVER_CHECKED
    ]
    head = set(pinned) | set(priority)
    fresh = [k for k in keys if k not in _DRIVER_CHECKED and k not in head]
    seen = [k for k in keys if k in _DRIVER_CHECKED and k not in head]
    return pinned + priority + fresh + seen


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {k: _QUERIES[k] for k in _rotated(_QUERIES)}


def all_oracles() -> dict[str, str]:
    _load()
    return {k: _ORACLES[k] for k in _rotated(_ORACLES)}


_LOADED = False


def _load() -> None:
    """Import every query module (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import ALL_MODULES  # noqa: F401

    _LOADED = True
