"""Scale-up probe — measures how the headline plans behave when the fact
grows and the scan becomes genuinely splittable.

The driver fixture writes each table as ONE parquet row group, so every
scan stage is a single task regardless of cores — bench numbers are
therefore single-core execution plus fixed overhead, and say nothing about
how the plans parallelize. This probe builds an N-fold lineitem (orderkeys
shifted per copy, written through a repartition so the output has many
files/row groups), re-runs the lineitem-only headline queries at 1x and
Nx, and prints per-query wall times plus the scale ratio.

Reading the output: a query whose plan parallelizes cleanly shows an Nx
time well BELOW N (fixed overhead amortizes, 32 tasks share the work); a
plan with a serialization point would show ~N or worse. This is the
empirical side of the plan-shape pins in tests/test_plan_quality.py.

Usage:
    python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1] [--factor 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# lineitem-only headline queries (the probe scales only the fact table)
QUERIES = ["q1_pricing_summary", "describe", "corr_matrix", "topk_per_group"]


def build_scaled_dir(spark, sf_dir: str, factor: int) -> str:
    """Write a fixture-layout dir whose lineitem is `factor` copies with
    shifted orderkeys, partitioned so scans split across cores."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="usw_scale_")
    for name in os.listdir(sf_dir):
        if name != "lineitem.parquet":
            src, dst = os.path.join(sf_dir, name), os.path.join(out, name)
            # a fixture table may be a parquet DIRECTORY (this probe itself
            # writes lineitem as one) — copy accordingly (ADVICE r3 #4)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    shift = li.agg(F.expr("max(l_orderkey) + 1 AS s")).collect()[0]["s"]
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(factor)
    ]
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    (
        scaled.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    return out


def time_queries(qs, spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=16)
    args = ap.parse_args()

    from usw_big_data_analysis_spark.registry import all_queries
    from usw_big_data_analysis_spark.session import get_spark

    spark = get_spark("scale_probe")
    qs = all_queries()

    scaled_dir = build_scaled_dir(spark, args.sf_dir, args.factor)
    try:
        base = time_queries(qs, spark, args.sf_dir)
        big = time_queries(qs, spark, scaled_dir)
        print(
            json.dumps(
                {
                    "factor": args.factor,
                    "base_s": base,
                    "scaled_s": big,
                    # how much slower Nx data ran; << factor = plan
                    # parallelizes and fixed overhead amortizes
                    "time_ratio": {
                        n: round(big[n] / base[n], 2) for n in base if base[n] > 0
                    },
                }
            )
        )
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
