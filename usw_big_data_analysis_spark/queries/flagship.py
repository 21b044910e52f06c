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
    exprs = {
        "qty": F.col("l_quantity"),
        "base": F.col("l_extendedprice"),
        "disc_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
        "charge": F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")),
        "disc": F.col("l_discount"),
    }
    aggs = [F.count("*").alias("count_order")]
    for name, _, scale in _SUMS:
        aggs += N.isum_aggs(N.iscaled(exprs[name], scale), name)
    g = (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*aggs)
    )
    n = F.col("count_order").cast("double")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        N.isum_value("qty", 2).alias("sum_qty"),
        N.isum_value("base", 2).alias("sum_base_price"),
        N.isum_value("disc_price", 4).alias("sum_disc_price"),
        N.isum_value("charge", 6).alias("sum_charge"),
        (N.isum_value("qty", 2) / n).alias("avg_qty"),
        (N.isum_value("base", 2) / n).alias("avg_price"),
        (N.isum_value("disc", 2) / n).alias("avg_disc"),
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
