"""Flagship query: scan → filter → groupBy multi-agg → sort.

Mirrors the reference's class-profile EDA pattern (group means of features
per class, `teamProject/eda.ipynb:1332`; multi-stat group aggregates,
`experiments/target_eda.py:72`) expressed as a TPC-H-Q1-shaped pricing
summary over the fixture `lineitem`.

Scale: single shuffle on the 2-key group; partial (map-side) aggregation
does most of the work; filter + column pruning push down to the parquet
scan. Sums use the integer-split exact representation
(functions/numeric.py) — bit-identical to the DuckDB oracle and ~3x faster
than decimal accumulators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_CUTOFF = "1998-09-02"

# (output name, value expression SQL, decimal digits of the value)
_SUMS = [
    ("qty", "l_quantity", 2),
    ("base", "l_extendedprice", 2),
    ("disc_price", "l_extendedprice * (1 - l_discount)", 4),
    ("charge", "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6),
    ("disc", "l_discount", 2),
]


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # string-built expressions (N.spark_*): JVM-parsed, one py4j call per
    # item — the Column-tree form cost ~0.25s of construction per cold call.
    # The scaled bigints are projected ONCE per measure before the agg (the
    # hi/lo split would otherwise embed — and evaluate — each iscaled
    # expression twice per row; measured ~12% off the map stage, same trick
    # as corr_matrix).
    proj = li.filter(
        F.expr(f"l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'")
    ).selectExpr(
        "l_returnflag",
        "l_linestatus",
        *[f"{N.spark_iscaled(expr, scale)} AS i_{name}" for name, expr, scale in _SUMS],
    )
    aggs = ["count(*) AS count_order"]
    for name, _, _ in _SUMS:
        aggs += N.spark_isum_items(f"i_{name}", name)
    g = proj.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(aggs[0]), *[F.expr(s) for s in aggs[1:]]
    )
    return g.selectExpr(
        "l_returnflag",
        "l_linestatus",
        f"{N.spark_isum_value('qty', 2)} AS sum_qty",
        f"{N.spark_isum_value('base', 2)} AS sum_base_price",
        f"{N.spark_isum_value('disc_price', 4)} AS sum_disc_price",
        f"{N.spark_isum_value('charge', 6)} AS sum_charge",
        f"{N.spark_isum_value('qty', 2)} / CAST(count_order AS DOUBLE) AS avg_qty",
        f"{N.spark_isum_value('base', 2)} / CAST(count_order AS DOUBLE) AS avg_price",
        f"{N.spark_isum_value('disc', 2)} / CAST(count_order AS DOUBLE) AS avg_disc",
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


_ORACLE = f"""
WITH g AS (
  SELECT l_returnflag, l_linestatus, count(*) AS count_order,
         {', '.join(N.sql_isum_items(N.sql_iscaled(expr, scale), name)
                    for name, expr, scale in _SUMS)}
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag,
       l_linestatus,
       {N.sql_isum_value('qty', 2)} AS sum_qty,
       {N.sql_isum_value('base', 2)} AS sum_base_price,
       {N.sql_isum_value('disc_price', 4)} AS sum_disc_price,
       {N.sql_isum_value('charge', 6)} AS sum_charge,
       {N.sql_isum_value('qty', 2)} / CAST(count_order AS DOUBLE) AS avg_qty,
       {N.sql_isum_value('base', 2)} / CAST(count_order AS DOUBLE) AS avg_price,
       {N.sql_isum_value('disc', 2)} / CAST(count_order AS DOUBLE) AS avg_disc,
       count_order
FROM g
ORDER BY l_returnflag, l_linestatus
"""

query("q1_pricing_summary", oracle=_ORACLE)(pricing_summary)
