"""One-decade-up parity (VERDICT r5 #8): rebuild the fixture at N× the
sf0.1 facts with REFERENTIALLY CONSISTENT key shifts, then run the
bit-exact Spark-vs-DuckDB parity gate on the scale-sensitive families.

Why a separate builder from tools/scale_probe.py: the probe only times
Spark, so it shifts each table's keys independently — at 10× that breaks
lineitem↔orders↔customer joins (copies 1..9 dangle), which is fine for
wall-clock but would hollow out join-heavy money-sum parity. Here every
FK DOMAIN shifts by one shared span, so each copy is a self-contained
TPC-H-shaped world and join cardinalities scale with the data. Dimension
tables (region/nation/supplier/part) copy through at 1×, exactly like a
real scale-up. Document text is salted per copy (same transform as the
probe) so the near-dup structure is per-copy, not a 10×-collapsed
MinHash fixture artifact.

The r4 full-sf0.1 sweep caught a real DECIMAL double-rounding defect that
sf0.01 could not see (sums crossing 2^53); this pushes the same class of
checks one more decade: ~6M-row lineitem, money sums ~10× larger.

Usage:
    python tools/parity_at_scale.py [--factor 10] [--sf-dir .../sf0.1]
                                    [--json PARITY_SF10_r06.json]
                                    [--only k1,k2 | default: SCALE_KEYS]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the families the verdict names: money sums, forecast, rank/AUROC, dedup
SCALE_KEYS = [
    # money sums (exact decimal/bigint lanes under 10x magnitude)
    "q1_pricing_summary",
    "monthly_revenue",
    "monthly_revenue_growth",
    "region_revenue_share",
    "revenue_waterfall",
    "rollup_sales",
    "cube_sales",
    "grouping_sets_sales",
    "star_sales_by_region",
    "q18_large_volume",
    "supplier_hhi",
    # forecast ladder (fold-vs-recursive-CTE bit parity over a longer series
    # of 10x-larger monthly sums)
    "forecast_ses_monthly",
    "forecast_holt_monthly",
    "forecast_hw_monthly",
    "forecast_backtest",
    # rank / AUROC (order statistics whose integer-sum exactness claims
    # depend on N)
    "metric_auroc",
    "metric_average_precision",
    "metric_lift_gains",
    "topk_per_group",
    "rank_features",
    "ntile_quartiles",
    "percent_rank_cume",
    # dedup (bucket-join pair sets at 10x corpus). dedup_clusters is
    # deliberately absent: its DuckDB oracle (recursive-CTE min-label
    # propagation) is super-linear in the ~10M-pair edge list at this
    # factor — the ORACLE grinds, not the engine; the Spark CC plan is
    # scale-validated by the 16x probe (SCALE_PROBE_r06, pipeline_docs_clean
    # rides the same operator) and its numeric surface (pair hashing) is
    # covered here by the minhash keys.
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_salted",
    "dedup_minhash_auto",
    "dedup_bucket_stats",
    "dedup_simhash",
    # r6 training-pipeline additions whose exactness claims scale with N:
    # k-gram interval merge, 1e9-quantized ln sums, Hamming shortlist +
    # decimal-cosine rerank, stride coverage, decimal cosine decontam scan.
    # preference_pairs_cluster is absent for the dedup_clusters reason (its
    # oracle walks the LSH edge list with a recursive CTE — super-linear in
    # the ~50M-pair 10x edge list; the Spark plan shares CC's gate coverage).
    "dedup_substring_kgram",
    "select_dsir_importance",
    "embed_binary_quantize_hamming",
    "doc_chunk_sliding",
    "decontam_embedding_eval",
    # model-comparison stats: integer sufficient statistics with N- and
    # N²-growth terms (S², Tj², cross-multiplied ECDFs) — the exact class
    # the r4 sweep caught a defect in
    "cochran_q_models",
    "friedman_nemenyi_cv",
    "cv_corrected_ttest",
    "drift_emd_price",
    "metric_ece",
    # r6 fourth-continuation additions: the new exactness claims that carry
    # N/N^2 growth terms (money-sum moments, 2PN rank products, dyadic
    # folds, Cramer determinants, EB moments, DFT terms)
    "heavy_hitters_cms",
    "changepoint_binary_split",
    "linreg_huber_irls",
    "metric_ks_separation",
    "runs_test_daily",
    "ab_diff_in_diff",
    "ab_ratio_delta_method",
    "ab_tost_equivalence",
    "metric_platt_recalibration",
    "survival_cindex",
    "seasonal_periodogram",
    "ops_littles_law_audit",
    "feature_mutual_info",
    "rate_shrinkage_eb",
    "xyz_volatility_class",
    "metric_multilabel_suite",
    "metric_label_permutation_test",
    "rollup_count_distinct",
    "forecast_hierarchical_reconcile",
    # r7 widening (VERDICT r6 #8): the dedup/embed eval keys and OLAP
    # extensions — each runs in seconds-to-a-minute at 10x; the recursive-
    # CTE-oracle keys (dedup_clusters, preference_pairs_cluster,
    # word_cooccurrence_clusters) stay excluded for the documented
    # oracle-cost reason above.
    # dedup eval + extras. dedup_ari_eval / dedup_bcubed_eval /
    # dedup_cluster_size_dist are NOT here: their oracles walk the LSH edge
    # list with the same recursive min-label CTE as dedup_clusters —
    # super-linear in the ~10M-pair 10x edge list (measured: >15 min on one
    # key before the r7 sweep was restarted without them). The Spark side
    # of that family rides connected_components, which is gate-covered by
    # the 16x probe and the long-chain pytest goldens.
    "dedup_lsh_recall",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_pair_evidence",
    "dedup_keep_priority",
    "dedup_rate_by_source",
    "dedup_cross_source_overlap",
    "dedup_incremental_bands",
    "dedup_span_c4",
    "dedup_two_stage_funnel",
    "dedup_simhash_hamming",
    "dedup_block_hash",
    "minhash_bbit_estimate",
    "minhash_jaccard_estimate",
    "dedup_token_savings",
    # embed / ANN family at a 10x corpus
    "embed_cosine_topk",
    "embed_ann_lsh",
    "embed_ann_multiprobe",
    "embed_ann_multitable",
    "embed_ann_ivf",
    "embed_ann_ivfpq",
    "embed_ann_recall",
    "embed_lsh_tuning_curve",
    "embed_pq_train",
    "embed_pq_assign",
    "embed_pq_search",
    "embed_ivf_cell_stats",
    "embed_norm_audit",
    "embed_quantize_int8",
    "embed_jl_projection_audit",
    # OLAP extensions
    "semi_join_returned",
    "melt_unpivot",
    "first_last_order",
    "agg_filter_clause",
    "pivot_dynamic",
    "abc_classification",
    "trending_items",
    "orders_seasonal_index",
    "sla_breach_rate",
    "duplicate_order_detection",
    "orders_open_backlog_daily",
    "supplier_scorecard",
    # round-7 additions (cv_loo's O(N) closed form is exactly the claim a
    # decade-up run should exercise)
    "encode_onehot",
    "cv_loo",
    "cv_leave_p_out",
    "cv_kfold_plain",
    "cv_multi_metric",
    # preference/arena family (r7): the bounded-pair-matrix claim — MM
    # iteration cost set by the player domain, not the corpus — is exactly
    # what a decade-up run should exercise. The connectivity key stays out:
    # its oracle walks the pair graph with the recursive min-label CTE
    # (same exclusion reason as dedup_clusters).
    "preference_winrate_matrix",
    "preference_bradley_terry",
    # round-7 second wave: DPO pair mining (per-order window), pass@k
    # (one groupBy over 10x attempts), HRW reshard audit (explode x
    # shard-count over 10x docs) — all linear-shuffle claims worth a
    # decade-up check.
    "preference_dpo_pairs",
    "metric_pass_at_k",
    "shard_rebalance_cost",
    "mixture_annealing_plan",
]

# FK domain -> the (table, column) pairs that must shift by the SAME span
_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "vec_id": [("embeddings", "vec_id")],
    "doc_id": [("documents", "doc_id")],
}
_FACTS = sorted({t for pairs in _DOMAINS.values() for t, _ in pairs})


def build_consistent_dir(spark, sf_dir: str, factor: int) -> str:
    """Write a fixture-layout dir whose facts are `factor` key-shifted
    copies with one shared span per FK domain."""
    from pyspark.sql import functions as F

    spans: dict[str, int] = {}
    frames = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in _FACTS}
    for dom, pairs in _DOMAINS.items():
        spans[dom] = 1 + max(
            frames[t].agg(F.expr(f"max({c})")).collect()[0][0] for t, c in pairs
        )

    out = tempfile.mkdtemp(prefix=f"usw_parity_{factor}x_")
    for name in os.listdir(sf_dir):
        table = name.removesuffix(".parquet")
        if table in _FACTS:
            continue
        src, dst = os.path.join(sf_dir, name), os.path.join(out, name)
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)

    par = spark.sparkContext.defaultParallelism
    for t in _FACTS:
        shifts = [
            (c, spans[dom])
            for dom, pairs in _DOMAINS.items()
            for tt, c in pairs
            if tt == t
        ]
        copies = []
        for i in range(factor):
            c = frames[t]
            for col, span in shifts:
                c = c.withColumn(col, F.col(col) + F.lit(i * span))
            if t == "documents":
                # per-copy token salt (same transform as scale_probe): keeps
                # every 3-token shingle copy-local so MinHash buckets hold
                # one copy's members, not factor× collapsed duplicates
                c = c.withColumn(
                    "text", F.regexp_replace("text", " ", f" c{i} ")
                ).withColumn("n_chars", F.length("text"))
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(par).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--json", default=None)
    ap.add_argument("--only", default=None, help="comma list; default SCALE_KEYS")
    ap.add_argument("--keep", action="store_true", help="keep the built dir")
    args = ap.parse_args()

    from usw_big_data_analysis_spark.session import get_spark

    spark = get_spark("parity_at_scale")
    built = build_consistent_dir(spark, args.sf_dir, args.factor)
    spark.stop()  # parity.py runs its own session against the built dir
    try:
        cmd = [
            sys.executable,
            os.path.join(REPO, "tools", "parity.py"),
            "--sf-dir",
            built,
            "--only",
            args.only or ",".join(SCALE_KEYS),
        ]
        if args.json:
            cmd += ["--json", args.json]
        return subprocess.call(cmd)
    finally:
        if not args.keep:
            shutil.rmtree(built, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
