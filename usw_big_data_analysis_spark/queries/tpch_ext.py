"""TPC-H-shaped multi-join analytics over the fixture star schema —
recognizable Q3/Q5/Q6 adaptations (the fixture lacks shippriority /
supplycost, so grouping keys substitute o_orderpriority; filters are tuned
to the fixture's 1995–2001 date range). These complement the flagship Q1:
together they cover filter-agg (Q6), join-agg-topk (Q3), and the 6-table
same-nation cycle join (Q5).

Determinism: revenue flows through the integer-split exact sums
(functions/numeric.py); Q3's top-10 orders by the EXACT bigint cents
(ties broken by l_orderkey) so the limit set is engine-independent — the
double revenue is derived after the cut.

Scale notes (100 TB):
- q6_forecast_revenue: pure scan-filter-agg; every predicate pushes to
  parquet, one partial-agg shuffle of a single row.
- q3_shipping_priority: dims filter BEFORE the fact joins; top-10 is
  TakeOrderedAndProject on the exact cents (no global sort).
- q5_local_supplier_volume: nation/region broadcast; the same-nation
  equality (c_nationkey = s_nationkey) rides the lineitem⋈supplier join
  rather than a separate shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_REV = "l_extendedprice * (1 - l_discount)"


# --- Q6: forecast revenue change --------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
    WITH g AS (
      SELECT count(*) AS n_items,
             {N.sql_isum_items(N.sql_iscaled('l_extendedprice * l_discount', 4), 'rev')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    )
    SELECT n_items, {N.sql_isum_value('rev', 4)} AS revenue FROM g
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: revenue that would have been gained by eliminating discounts in
    a band — scan → fully-pushed-down filters → one-row aggregate. The
    discount BETWEEN bounds are exact two-decimal fixture values, safe as
    double comparisons on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    g = f.agg(
        F.count("*").alias("n_items"),
        *N.isum_aggs(
            N.iscaled(F.col("l_extendedprice") * F.col("l_discount"), 4), "rev"
        ),
    )
    return g.select("n_items", N.isum_value("rev", 4).alias("revenue"))


# --- Q3: unshipped orders with highest value --------------------------------
_Q3_DATE = "1998-06-30"
_SEG = "BUILDING"


@query(
    "q3_shipping_priority",
    oracle=f"""
    WITH g AS (
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'rev')}
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = '{_SEG}'
        AND o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
        AND l_shipdate  > TIMESTAMP '{_Q3_DATE} 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
    )
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {N.sql_isum_value('rev', 4)} AS revenue
    FROM g
    ORDER BY CAST(rev__hi AS DECIMAL(38,0)) * 1000000000
             + CAST(rev__lo AS DECIMAL(38,0)) DESC,
             l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: top-10 highest-value orders not yet shipped by the cutoff for
    one market segment. Both dim filters apply before the fact joins; the
    top-10 cut orders by the EXACT integer cents (l_orderkey tiebreak), so
    the selected set is identical on both engines; the double revenue is
    derived only for the 10 survivors. TakeOrderedAndProject — no global
    sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _SEG
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    ).select(
        "l_orderkey",
        N.iscaled(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "rev"
        ),
    )
    g = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(*N.isum_aggs(F.col("rev"), "rev"))
    )
    cents = (
        F.col("rev__hi").cast("decimal(38,0)") * 1_000_000_000
        + F.col("rev__lo").cast("decimal(38,0)")
    )
    return (
        g.orderBy(cents.desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            N.isum_value("rev", 4).alias("revenue"),
        )
    )


# --- Q5: local supplier volume ----------------------------------------------
_Q5_REGION = "ASIA"


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    WITH g AS (
      SELECT n_name, {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'rev')}
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = '{_Q5_REGION}'
      GROUP BY n_name
    )
    SELECT n_name, {N.sql_isum_value('rev', 4)} AS revenue FROM g
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue from orders where customer and supplier share a nation,
    per nation of one region — the 6-table cycle join. The same-nation
    equality rides the lineitem⋈supplier join condition (no extra
    shuffle); nation filtered through broadcast region before touching
    facts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        N.iscaled(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "rev"
        ),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == _Q5_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    g = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*N.isum_aggs(F.col("rev"), "rev"))
    )
    return g.select("n_name", N.isum_value("rev", 4).alias("revenue"))
