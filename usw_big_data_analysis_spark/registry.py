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


# Keys that already have a driver correctness row (CORRECTNESS_r01 ∪ r02).
# The driver's per-round gate samples queries() in iteration order, so
# all_queries() floats never-driver-checked keys to the front (within the
# deliberate family order set by queries/__init__.py ALL_MODULES) and sinks
# already-green keys to the back — each round's window lands on fresh keys
# until every family has a driver row. Regenerate after each round:
#   sorted(set(r01_keys) | set(r02_keys) | ...)
_DRIVER_CHECKED: frozenset[str] = frozenset({
    'align_inner', 'anomaly_zscore', 'anova_f', 'argmax_threshold', 'best_model_select',
    'chi2', 'class_distribution_check', 'concat_cols', 'corr_matrix', 'corr_target',
    'corr_tests', 'crosstab_margins', 'cumsum_curve', 'cv_stratified_kfold', 'dedup_clusters',
    'dedup_embed_cosine', 'dedup_exact', 'dedup_minhash_lsh', 'dedup_ngram_jaccard', 'dedup_simhash',
    'describe', 'embed_ann_lsh', 'embed_cosine_topk', 'embed_pq_assign', 'encode_cat_int',
    'encode_hash_trick', 'encode_label', 'filter_class', 'filter_isin', 'filter_mask_cols',
    'filter_notnull', 'filter_range', 'global_stats', 'groupby_agg', 'groupby_mean_multi',
    'groupby_median', 'impute_mean', 'impute_median', 'impute_mode', 'infer_categorical',
    'intersect_names', 'join_asof', 'join_bucketed', 'join_pred_truth', 'join_range',
    'join_salted_skew', 'join_xy', 'knn_lsh', 'kruskal', 'ks_2samp',
    'lag_diff_user', 'limit_head', 'linreg_ols_group', 'mannwhitney', 'metric_accuracy',
    'metric_auroc', 'metric_calibration', 'metric_cohens_kappa', 'metric_confusion', 'metric_f1',
    'metric_logloss', 'metric_mcnemar', 'null_profile', 'pipeline_docs_clean', 'pivot_table',
    'project_drop', 'project_dtype', 'project_prefix', 'prune_corr', 'q1_pricing_summary',
    'quantiles_iqr', 'rank_features', 'rolling_mean_user', 'sample_per_class', 'scale_power',
    'scale_quantile', 'scale_robust', 'scale_standard', 'scan_csv', 'scan_text',
    'score_combined', 'sink_csv', 'sink_json', 'sort_values', 'sorted_zip',
    'split_modk', 'split_stratified', 'str_strip', 'threshold_sweep', 'top1_argmax',
    'topk_per_group', 'ttest_1samp', 'ttest_ind', 'ttest_rel', 'union_labeled',
    'union_rows', 'value_counts', 'wilcoxon', 'wordcount',
})


def _rotated(keys) -> list[str]:
    fresh = [k for k in keys if k not in _DRIVER_CHECKED]
    seen = [k for k in keys if k in _DRIVER_CHECKED]
    return fresh + seen


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
