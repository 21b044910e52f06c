"""One-off experiment: corr_matrix aggregate-strategy variants at sf0.1.

Variants:
  A. current: hi/lo bigint split sums, iscaled recomputed inline (61 aggs)
  B. decimal: single sum(CAST(expr AS DECIMAL(38,0))) per statistic (31 aggs)
  C. split+proj: hi/lo bigint split sums over a pre-projected scaled frame
     (iscaled computed once per column per row)

Result (sf0.1, fresh plan per iteration so AQE shuffle-stage reuse can't
contaminate the numbers — re-executing the SAME DataFrame only re-runs the
final stage): A 465ms, B 675ms, C 420ms. DECIMAL(38,0) sums (VERDICT r3 #3's
suggestion) are ~45% SLOWER than the bigint hi/lo split, consistent with the
functions/numeric.py measurement; corr_matrix adopted C.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from usw_big_data_analysis_spark.functions import numeric as N  # noqa: E402
from usw_big_data_analysis_spark.session import get_spark  # noqa: E402
from usw_big_data_analysis_spark.sources import load_table  # noqa: E402

COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
PAIRS = [(a, b) for i, a in enumerate(COLS) for b in COLS[i + 1:]]


def variant_a(li):
    aggs = ["count(*) AS n_raw"]
    for c in COLS:
        xi = N.spark_iscaled(c, 2)
        aggs += N.spark_isum_items(xi, f"s_{c}")
        aggs += N.spark_isum_items(f"({xi}) * ({xi})", f"ss_{c}")
    for a, b in PAIRS:
        aggs += N.spark_isum_items(
            f"({N.spark_iscaled(a, 2)}) * ({N.spark_iscaled(b, 2)})", f"sp_{a}_{b}"
        )
    return li.agg(F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]])


def variant_b(li):
    aggs = ["count(*) AS n_raw"]
    for c in COLS:
        xi = N.spark_iscaled(c, 2)
        aggs.append(f"sum(CAST(({xi}) AS DECIMAL(38,0))) AS s_{c}")
        aggs.append(f"sum(CAST(({xi}) * ({xi}) AS DECIMAL(38,0))) AS ss_{c}")
    for a, b in PAIRS:
        aggs.append(
            f"sum(CAST(({N.spark_iscaled(a, 2)}) * ({N.spark_iscaled(b, 2)}) "
            f"AS DECIMAL(38,0))) AS sp_{a}_{b}"
        )
    return li.agg(F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]])


def variant_c(li):
    proj = li.selectExpr(*[f"{N.spark_iscaled(c, 2)} AS i_{c}" for c in COLS])
    aggs = ["count(*) AS n_raw"]
    for c in COLS:
        aggs += N.spark_isum_items(f"i_{c}", f"s_{c}")
        aggs += N.spark_isum_items(f"i_{c} * i_{c}", f"ss_{c}")
    for a, b in PAIRS:
        aggs += N.spark_isum_items(f"i_{a} * i_{b}", f"sp_{a}_{b}")
    return proj.agg(F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]])


def main():
    spark = get_spark("bench_corr_variants")
    li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    li.count()  # warm cache/metadata
    for name, fn in [("A_split_inline", variant_a), ("B_decimal38", variant_b),
                     ("C_split_proj", variant_c)]:
        df = fn(li)
        df.collect()  # warm (plan compile + first run)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.collect()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times)*1000:.1f}ms median={sorted(times)[2]*1000:.1f}ms")


if __name__ == "__main__":
    main()
