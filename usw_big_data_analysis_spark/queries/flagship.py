"""Flagship query: scan → filter → groupBy multi-agg → sort.

Mirrors the reference's class-profile EDA pattern (group means of features
per class, `teamProject/eda.ipynb:1332`; multi-stat group aggregates,
`experiments/target_eda.py:72`) expressed as a TPC-H-Q1-shaped pricing
summary over the fixture `lineitem`.

Scale: single shuffle on the 2-key group; partial (map-side) aggregation
does most of the work; filter + column pruning push down to the parquet
scan. Decimal-cast sums keep results bit-identical to the DuckDB oracle
(see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_CUTOFF = "1998-09-02"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            N.dsum("l_quantity").alias("sum_qty"),
            N.dsum("l_extendedprice").alias("sum_base_price"),
            N.dsum(disc_price).alias("sum_disc_price"),
            N.dsum(charge).alias("sum_charge"),
            (N.dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (N.dsum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            (N.dsum("l_discount") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORACLE = f"""
SELECT l_returnflag,
       l_linestatus,
       {N.sql_dsum('l_quantity')} AS sum_qty,
       {N.sql_dsum('l_extendedprice')} AS sum_base_price,
       {N.sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {N.sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {N.sql_dsum('l_quantity')} / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
       {N.sql_dsum('l_extendedprice')} / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
       {N.sql_dsum('l_discount')} / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

query("q1_pricing_summary", oracle=_ORACLE)(pricing_summary)
