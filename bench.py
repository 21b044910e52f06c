"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are executed with a noop sink (full plan runs, rows never collected
to the driver — measures engine time, not toPandas serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q1_pricing_summary",
    "join_xy",
    "crosstab_margins",
    "describe",
    "corr_matrix",
    "topk_per_group",
    "wordcount",
    "metric_auroc",
    "threshold_sweep",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "stream_session",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from usw_big_data_analysis_spark.registry import all_queries
    from usw_big_data_analysis_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()

    # steady-state methodology: run every query once unmeasured (JVM warmup,
    # parquet footers, whole-stage-codegen JIT — first execution of each
    # generated stage costs 1-3s of compile that run-to-run noise would
    # otherwise dominate), then time the second execution of each
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-3 timed runs per query: the min is the standard noise-robust
    # estimator (this box shows multi-second co-tenant interference spikes)
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
