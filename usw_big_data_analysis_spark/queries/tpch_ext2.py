"""TPC-H coverage, second batch — Q4/Q7/Q8/Q9/Q10/Q13/Q14 (this half) plus
Q15/Q16/Q17/Q19/Q20/Q21/Q22 adaptations over the fixture star schema.

The fixture omits several TPC-H columns (l_commitdate/l_receiptdate,
l_shipmode/l_shipinstruct/l_container, partsupp entirely, c_phone/c_address,
p_mfgr/p_container); each query keeps the REFERENCE SHAPE (the join/subquery
pattern that makes the query interesting) and substitutes the nearest fixture
column, documented per query. Q2/Q11 need partsupp as the driving table and
are out of scope (no adaptation preserves their shape).

Determinism conventions (functions/numeric.py):
- revenue/amount sums flow through the scaled-integer hi/lo split (exact,
  order-independent, bit-equal to DuckDB);
- top-k cuts order by the EXACT bigint cents with a unique-key tiebreak so
  the selected set is engine-independent; the double value is derived only
  for survivors;
- correlated "x < frac * avg(y)" predicates are cleared of division:
  ``5 * n * x < sum`` on exact integers (Q17), ``cents * n > sum_cents``
  (Q22) — no float threshold ever crosses an engine boundary;
- shares/percentages are ONE IEEE division of two exact sums, rounded to 6.

Scale notes (100 TB):
- dims filter before facts everywhere; nation/region always broadcast.
- Q4/Q20 are semi-join chains (no fact-side duplication); Q21 aggregates
  lineitem per order BEFORE the per-supplier comparison join, so the big
  table is touched twice but shuffled on the same key (l_orderkey) both
  times — AQE coalesces the exchange reuse.
- Q13 is the classic skew case (one customer with many orders): the
  count-per-customer aggregate is a map-side-combinable sum, and the second
  aggregate (distribution of counts) is tiny.
- Q15/Q17/Q22's scalar thresholds (max revenue, per-part avg, global avg)
  are computed as one-row / per-key aggregates and broadcast back — no
  driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return N.iscaled(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)


def _cents(name: str) -> F.Column:
    """Exact integer total reconstructed from an isum hi/lo pair."""
    return (
        F.col(f"{name}__hi").cast("decimal(38,0)") * 1_000_000_000
        + F.col(f"{name}__lo").cast("decimal(38,0)")
    )


def _sql_cents(name: str) -> str:
    return (
        f"(CAST({name}__hi AS DECIMAL(38,0)) * 1000000000"
        f" + CAST({name}__lo AS DECIMAL(38,0)))"
    )


# --- Q4: order priority checking --------------------------------------------
# Adaptation: no l_commitdate/l_receiptdate -> an order is "late" when some
# lineitem shipped more than 90 days after the order date. Keeps the
# EXISTS-correlated-subquery shape (semi join, no fact duplication).
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (ref shape: EXISTS over lineitem per order): count orders per
    priority, in one quarter, having at least one lineitem shipped >90 days
    after order placement. LEFT SEMI join — each order counted once no
    matter how many late lines; the quarter filter prunes orders before the
    join."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- Q7: volume shipping between two nations --------------------------------
_Q7_N1, _Q7_N2 = "NATION_3", "NATION_7"


@query(
    "q7_volume_shipping",
    oracle=f"""
    WITH g AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'rev')}
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
          OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
      GROUP BY 1, 2, 3
    )
    SELECT supp_nation, cust_nation, l_year,
           {N.sql_isum_value('rev', 4)} AS revenue
    FROM g
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping revenue between two nations in both directions, by ship
    year. The two-nation filter lands on supplier and customer BEFORE the
    fact joins (broadcast nation into each dim), so lineitem only joins the
    ~2/25 surviving dim rows; the cross-pair condition is then a residual
    filter on two already-tiny columns."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q7_N1, _Q7_N2)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("int").alias("l_year"),
        _rev_col().alias("rev"),
    )
    g = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(*N.isum_aggs(F.col("rev"), "rev"))
    )
    return g.select(
        "supp_nation", "cust_nation", "l_year",
        N.isum_value("rev", 4).alias("revenue"),
    )


# --- Q8: national market share ----------------------------------------------
_Q8_REGION, _Q8_NATION, _Q8_TYPE = "ASIA", "NATION_3", "PROMO"


@query(
    "q8_market_share",
    oracle=f"""
    WITH g AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {N.sql_isum_items(
                 "CASE WHEN n1.n_name = '" + _Q8_NATION + "' THEN "
                 + N.sql_iscaled(_REV, 4) + " ELSE 0 END", 'nat')},
             {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'tot')}
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT o_year,
           round({N.sql_isum_value('nat', 4)} / {N.sql_isum_value('tot', 4)}, 6)
             AS mkt_share,
           {N.sql_isum_value('tot', 4)} AS total_revenue
    FROM g
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: share of one supplier-nation's revenue among PROMO-part orders
    from customers in one region, by order year. Numerator and denominator
    are both exact integer sums out of ONE grouped scan (the CASE keeps the
    national slice); the share is one IEEE division, rounded to 6. Part and
    customer-side region filters prune before the fact joins."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_col().alias("rev")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "o_orderkey", "o_custkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q8_REGION
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    g = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            *N.isum_aggs(
                F.when(F.col("supp_nation") == _Q8_NATION, F.col("rev")).otherwise(
                    F.lit(0).cast("bigint")
                ),
                "nat",
            ),
            *N.isum_aggs(F.col("rev"), "tot"),
        )
    )
    return g.select(
        "o_year",
        F.round(N.isum_value("nat", 4) / N.isum_value("tot", 4), 6).alias(
            "mkt_share"
        ),
        N.isum_value("tot", 4).alias("total_revenue"),
    )


# --- Q9: product type profit (proxy) ----------------------------------------
# Adaptation: no partsupp.ps_supplycost, so "profit" is discounted revenue
# for parts matching a name substring — the shape (part-name LIKE driving a
# 6-table join, grouped by supplier nation x year) is what Q9 exercises.
@query(
    "q9_product_profit",
    oracle=f"""
    WITH g AS (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'amt')}
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2
    )
    SELECT nation, o_year, {N.sql_isum_value('amt', 4)} AS sum_profit FROM g
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (profit proxy — fixture has no supplycost): discounted revenue on
    parts whose name contains 'widget', per supplier nation and order year.
    The LIKE filter prunes part before the fact join (broadcast); nation
    rides broadcast through supplier."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_col().alias("amt")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    g = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "o_year")
        .agg(*N.isum_aggs(F.col("amt"), "amt"))
    )
    return g.select("nation", "o_year", N.isum_value("amt", 4).alias("sum_profit"))


# --- Q10: returned item reporting -------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    WITH g AS (
      SELECT c_custkey, c_name, n_name,
             {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'rev')}
      FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, n_name, {N.sql_isum_value('rev', 4)} AS revenue
    FROM g
    ORDER BY {_sql_cents('rev')} DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by revenue lost to returned items in one
    quarter. Order filter prunes before the lineitem join; the cut orders
    by EXACT cents (c_custkey tiebreak) -> TakeOrderedAndProject; the
    double revenue is derived for the 20 survivors only."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", _rev_col().alias("rev"))
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(*N.isum_aggs(F.col("rev"), "rev"))
    )
    return (
        g.orderBy(_cents("rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name",
                N.isum_value("rev", 4).alias("revenue"))
    )


# --- Q13: customer order-count distribution ---------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts, excluding one
    priority class (the fixture's stand-in for the o_comment NOT LIKE
    filter), customers with zero orders included via LEFT join. Two
    aggregations: the first is the skew-sensitive one (hot customers), a
    map-side-combinable count; the second groups ~50 distinct counts —
    tiny."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q14: promotion effect --------------------------------------------------
@query(
    "q14_promo_effect",
    oracle=f"""
    WITH g AS (
      SELECT
        {N.sql_isum_items(
            "CASE WHEN p_type = 'PROMO' THEN " + N.sql_iscaled(_REV, 4)
            + " ELSE 0 END", 'promo')},
        {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'tot')}
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    )
    SELECT round(100.0 * {N.sql_isum_value('promo', 4)}
                 / {N.sql_isum_value('tot', 4)}, 6) AS promo_pct,
           {N.sql_isum_value('promo', 4)} AS promo_revenue,
           {N.sql_isum_value('tot', 4)} AS total_revenue
    FROM g
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: share of one month's revenue from PROMO-type parts. One scan,
    one broadcast join to part, conditional + total integer sums in the
    same aggregate, ONE division for the percentage (100.0 * promo / total
    — both operands exact, round 6)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    ).select("l_partkey", _rev_col().alias("rev"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    g = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            *N.isum_aggs(
                F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
                    F.lit(0).cast("bigint")
                ),
                "promo",
            ),
            *N.isum_aggs(F.col("rev"), "tot"),
        )
    )
    return g.select(
        F.round(
            100.0 * N.isum_value("promo", 4) / N.isum_value("tot", 4), 6
        ).alias("promo_pct"),
        N.isum_value("promo", 4).alias("promo_revenue"),
        N.isum_value("tot", 4).alias("total_revenue"),
    )


# --- Q15: top supplier ------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH g AS (
      SELECT l_suppkey, {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'rev')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    ),
    m AS (SELECT max({_sql_cents('rev')}) AS mx FROM g)
    SELECT s_suppkey, s_name, {N.sql_isum_value('rev', 4)} AS total_revenue
    FROM g JOIN supplier ON s_suppkey = l_suppkey, m
    WHERE {_sql_cents('rev')} = m.mx
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — the
    view-plus-scalar-max shape. Per-supplier exact cents; the max is a
    one-row aggregate broadcast back (no driver collect); equality on exact
    integers returns ALL tied suppliers identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_suppkey", _rev_col().alias("rev"))
    g = li.groupBy("l_suppkey").agg(*N.isum_aggs(F.col("rev"), "rev")).select(
        "l_suppkey", "rev__hi", "rev__lo", _cents("rev").alias("rev_cents")
    )
    mx = g.agg(F.max("rev_cents").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        g.join(F.broadcast(mx), F.col("rev_cents") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", N.isum_value("rev", 4).alias("total_revenue"))
    )


# --- Q16: part/supplier relationship ----------------------------------------
# Adaptation: no partsupp -> supplier counts come from observed lineitem
# (suppliers that actually shipped the part); same filters-and-count-distinct
# shape.
_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


@query(
    "q16_parts_suppliers",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN {_Q16_SIZES}
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (supplier counts from shipments — fixture has no partsupp):
    distinct suppliers per (brand, type, size) slice. Part filters prune
    broadcast-side before the fact join; COUNT(DISTINCT) expands to the
    two-level exact distinct aggregate (partial per (keys, suppkey), then
    count) — no driver-side set."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(*_Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17: small-quantity-order revenue --------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle=f"""
    WITH pl AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
    ),
    pa AS (
      SELECT l_partkey AS a_partkey, count(*) AS n_part,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM pl GROUP BY l_partkey
    ),
    q AS (
      SELECT {N.sql_isum_items(N.sql_iscaled('l_extendedprice', 2), 'ep')},
             count(*) AS n_small
      FROM pl JOIN pa ON a_partkey = l_partkey
      WHERE 5 * CAST(l_quantity AS BIGINT) * n_part < sum_qty
    )
    SELECT round({N.sql_isum_value('ep', 2)} / 7.0, 6) AS avg_yearly, n_small
    FROM q
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from lineitems whose quantity is below 20% of the
    per-part average (correlated-subquery shape). The fractional-average
    predicate is division-free: ``5*qty*n < sum_qty`` on exact bigints
    (fixture quantities are whole numbers), so the qualifying set is
    engine-independent. Per-part averages shuffle once on l_partkey and
    join back on the same key."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            N.iscaled(F.col("l_extendedprice"), 2).alias("ep"),
        )
    )
    pa = pl.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.count("*").alias("n_part"), F.sum("qty").alias("sum_qty")
    )
    q = (
        pl.join(pa, F.col("a_partkey") == F.col("l_partkey"))
        .filter(5 * F.col("qty") * F.col("n_part") < F.col("sum_qty"))
        .agg(*N.isum_aggs(F.col("ep"), "ep"), F.count("*").alias("n_small"))
    )
    return q.select(
        F.round(N.isum_value("ep", 2) / 7.0, 6).alias("avg_yearly"), "n_small"
    )


# --- Q19: discounted revenue (disjunctive bands) ----------------------------
_Q19_BANDS = (
    ("Brand#12", 5, 1, 11),
    ("Brand#15", 10, 10, 20),
    ("Brand#21", 15, 20, 30),
)


def _q19_sql_pred() -> str:
    return " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {sz}"
        f" AND l_quantity BETWEEN {lo} AND {hi})"
        for b, sz, lo, hi in _Q19_BANDS
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    WITH g AS (
      SELECT {N.sql_isum_items(N.sql_iscaled(_REV, 4), 'rev')},
             count(*) AS n_items
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE {_q19_sql_pred()}
    )
    SELECT {N.sql_isum_value('rev', 4)} AS revenue, n_items FROM g
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue matching a disjunction of (brand, size, quantity)
    bands. The brand/size half of each disjunct prunes part broadcast-side
    (part rows failing ALL brand+size combos never reach the join); the
    quantity residual applies post-join. One scan, one-row aggregate."""
    bands = F.lit(False)
    part_pre = F.lit(False)
    for b, sz, lo, hi in _Q19_BANDS:
        part_pre = part_pre | ((F.col("p_brand") == b) & (F.col("p_size") <= sz))
        bands = bands | (
            (F.col("p_brand") == b)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= sz)
            & (F.col("l_quantity") >= lo) & (F.col("l_quantity") <= hi)
        )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 1) & part_pre
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev_col().alias("rev")
    )
    g = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(*N.isum_aggs(F.col("rev"), "rev"), F.count("*").alias("n_items"))
    )
    return g.select(N.isum_value("rev", 4).alias("revenue"), "n_items")


# --- Q20: potential part promotion ------------------------------------------
_Q20_NATION, _Q20_QTY = "NATION_5", 200


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH sq AS (
      SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_1997
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > {_Q20_QTY}
    )
    SELECT s_suppkey, s_name, qty_1997
    FROM supplier
    JOIN sq ON l_suppkey = s_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = '{_Q20_NATION}'
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers in one nation who shipped more than a threshold
    quantity of 'small'-named parts in 1997 (the IN-subquery chain shape,
    fixture-adapted: shipped quantity stands in for partsupp availability).
    Quantity totals are exact bigints; the HAVING cut is integer-exact.
    Part prunes broadcast-side; the supplier/nation filter applies to the
    ~100-row aggregate output."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty"))
    sq = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("qty").alias("qty_1997"))
        .filter(F.col("qty_1997") > _Q20_QTY)
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q20_NATION
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return sq.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "qty_1997")


# --- Q21: suppliers who kept orders waiting ---------------------------------
@query(
    "q21_suppliers_waiting",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey AS g_orderkey, max(l_shipdate) AS o_max,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lo GROUP BY 1
    ),
    per_supp AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
      FROM lo GROUP BY 1, 2
    ),
    waits AS (
      SELECT l_suppkey, count(*) AS numwait
      FROM per_supp JOIN per_order ON g_orderkey = l_orderkey
      WHERE n_supp > 1 AND s_max = o_max
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, numwait
    FROM waits JOIN supplier ON s_suppkey = l_suppkey
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (ref shape: exists/not-exists over co-suppliers — fixture has no
    receipt/commit dates, so "kept the order waiting" = was the LAST
    supplier to ship a multi-supplier finalized order). Both aggregates
    shuffle lineitem on l_orderkey — the exchange is reused (same
    partitioning) — and the comparison join is aggregate-to-aggregate,
    never row-to-row. Top-20 on (numwait DESC, s_name): supplier names are
    unique, so the cut is total-ordered and engine-independent."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    lo = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.max("l_shipdate").alias("o_max"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    waits = (
        per_supp.join(per_order, F.col("g_orderkey") == F.col("l_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("s_max") == F.col("o_max")))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waits.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
        .select("s_suppkey", "s_name", "numwait")
    )


# --- Q22: global sales opportunity ------------------------------------------
@query(
    "q22_global_sales",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    stats AS (
      SELECT count(*) AS n_pos, sum(cents) AS sum_pos FROM c WHERE cents > 0
    ),
    q AS (
      SELECT c_custkey, c_nationkey, cents
      FROM c, stats
      WHERE cents * n_pos > sum_pos
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        )
    )
    SELECT n_name, count(*) AS numcust,
           CAST(sum(cents) AS DOUBLE) / 100.0 AS totacctbal
    FROM q JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: customers with above-average positive balance and no orders,
    totaled per nation (phone-prefix grouping replaced by nation — the
    fixture has no c_phone). The avg threshold is division-free:
    ``cents * n_pos > sum_pos`` on exact integers (balances keep <=2
    decimals after the deterministic cents rounding), so the qualifying
    set can't flip on an engine's avg rounding. The one-row stats
    aggregate broadcasts back; "no orders in the recent window" (the
    classic 7-year clause, fixture-scaled to 1999+) is a LEFT ANTI join
    against the date-pruned orders scan."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        N.fround_int(F.col("c_acctbal") * 100).alias("cents"),
    )
    stats = c.filter(F.col("cents") > 0).agg(
        F.count("*").alias("n_pos"), F.sum("cents").alias("sum_pos")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    q = (
        c.join(F.broadcast(stats))
        .filter(F.col("cents") * F.col("n_pos") > F.col("sum_pos"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        q.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("cents").cast("double") / 100.0).alias("totacctbal"),
        )
    )


# --- Q12: shipping modes and order priority ---------------------------------
# Adaptation: no l_shipmode/l_receiptdate -> group by l_returnflag, and a
# line is "late" when it shipped more than 60 days after the order date.
# Same shape: fact-fact join + conditional counts per class.
@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (fixture-adapted: returnflag for shipmode, ship-lag for
    receipt-lag): among lines shipped >60 days after order placement in one
    year, count high- vs low-priority orders per class. The year filter
    pushes to the lineitem scan; the lag predicate is a join residual;
    the conditional counts are one grouped scan (map-side combinable)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q2: minimum-cost supplier (decorrelated scalar subquery) -----------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    scoped AS (
      SELECT p.p_partkey, p.p_type, e.s_name, e.s_acctbal, e.n_name,
             s.supplycost
      FROM supply s
      JOIN euro e ON s.l_suppkey = e.s_suppkey
      JOIN part p ON s.l_partkey = p.p_partkey
      WHERE p.p_size % 10 = 3
    ),
    minc AS (
      SELECT p_partkey AS m_partkey, min(supplycost) AS min_cost
      FROM scoped GROUP BY p_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supplycost
    FROM scoped JOIN minc
      ON p_partkey = m_partkey AND supplycost = min_cost
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape — for each qualifying part, the supplier(s)
    offering the regional minimum supply cost. The fixture has no partsupp
    table, so supply costs derive from lineitem's (partkey, suppkey) pairs
    (min extended price — stored values, so the min and the equality join
    back are engine-exact). The signature relational pattern is the
    CORRELATED SCALAR SUBQUERY (cost = min cost for that part) DECORRELATED
    into a per-part min aggregate joined back on (part, cost) — one shuffle
    each side, no per-row subquery execution; dims (supplier x nation x
    region, part) broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") % 10 == 3)
        .select("p_partkey", "p_type")
    )
    scoped = (
        supply.join(F.broadcast(euro), supply["l_suppkey"] == euro["s_suppkey"])
        .join(F.broadcast(part), supply["l_partkey"] == part["p_partkey"])
        .select("p_partkey", "p_type", "s_name", "s_acctbal", "n_name", "supplycost")
    )
    minc = scoped.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return scoped.join(
        minc,
        (F.col("p_partkey") == F.col("m_partkey"))
        & (F.col("supplycost") == F.col("min_cost")),
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supplycost")


# --- Q11: important stock (HAVING against a global scalar) --------------------
_Q11_NATION = "NATION_7"


@query(
    "q11_important_stock",
    oracle=f"""
    WITH nsup AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{_Q11_NATION}'
    ),
    pv AS (
      SELECT l_partkey,
             {N.sql_isum_items(
                 N.sql_iscaled('l_extendedprice * (1 - l_discount)', 4), 'v')}
      FROM lineitem JOIN nsup ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    ),
    pvi AS (
      SELECT l_partkey,
             CAST(v__hi AS DECIMAL(38,0)) * 1000000000
               + CAST(v__lo AS DECIMAL(38,0)) AS vint
      FROM pv
    ),
    tot AS (SELECT sum(vint) AS tint FROM pvi)
    SELECT l_partkey AS p_partkey,
           CAST(vint AS DOUBLE) / 10000.0 AS part_value
    FROM pvi, tot
    WHERE vint * 1000 > tint
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape — parts whose stock value within one nation's
    suppliers exceeds a fraction (0.001 here) of the national total: the
    HAVING-against-a-GLOBAL-SCALAR-subquery pattern. Value derives from
    lineitem (extprice x (1-disc), no partsupp in the fixture) as exact
    scaled integers, the global total is a one-row aggregate broadcast
    back (never an unpartitioned window), and the threshold predicate is
    pure integer arithmetic (vint * 1000 > tint) — the qualifying set is
    bit-identical across engines with no epsilon."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q11_NATION
    )
    nsup = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.join(
        F.broadcast(nsup), li["l_suppkey"] == F.col("s_suppkey")
    ).selectExpr(
        "l_partkey",
        f"{N.spark_iscaled('l_extendedprice * (1 - l_discount)', 4)} AS iv",
    )
    pv = rows.groupBy("l_partkey").agg(
        *[F.expr(s) for s in N.spark_isum_items("iv", "v")]
    )
    pvi = pv.selectExpr(
        "l_partkey",
        "CAST(v__hi AS DECIMAL(38,0)) * 1000000000"
        " + CAST(v__lo AS DECIMAL(38,0)) AS vint",
    )
    tot = pvi.agg(F.expr("sum(vint) AS tint"))
    return (
        pvi.crossJoin(F.broadcast(tot))
        .filter(F.expr("vint * 1000 > tint"))
        .selectExpr(
            "l_partkey AS p_partkey",
            "CAST(vint AS DOUBLE) / 10000.0 AS part_value",
        )
    )
