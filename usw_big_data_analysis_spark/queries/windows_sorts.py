"""Window/rank/top-k + sorts/limits (SURVEY.md §2.6 W1-W4, §2.7 O1-O4).

Every ordering carries a full deterministic tiebreak (the fixture has value
ties) so LIMIT/row_number results are identical across engines and runs.

Scale notes: top-k per group is the row_number-over-window pattern (single
shuffle on the partition key, no global sort); global top-k (`limit_head`,
`top1_argmax`) compiles to TakeOrderedAndProject (per-partition heap + driver
merge, no full sort). Running sums use decimal casts so ordered accumulation
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table


# --- W1: rank within groups + mean rank (wine…11….ipynb:6190-6199) ----------
@query(
    "rank_features",
    oracle=f"""
    WITH cell AS (
      SELECT l_linestatus AS model, l_returnflag AS feature,
             {N.sql_davg('l_quantity')} AS v
      FROM lineitem GROUP BY l_linestatus, l_returnflag
    ), ranked AS (
      SELECT model, feature,
             row_number() OVER (PARTITION BY model ORDER BY v DESC, feature) AS rnk
      FROM cell
    )
    SELECT feature, CAST(sum(rnk) AS DOUBLE) / count(*) AS mean_rank
    FROM ranked GROUP BY feature
    """,
)
def rank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-model feature ranking then cross-model mean rank (the permutation-
    importance consensus table). Ranks are integers ⇒ mean is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = li.groupBy(
        F.col("l_linestatus").alias("model"), F.col("l_returnflag").alias("feature")
    ).agg(N.davg("l_quantity").alias("v"))
    w = Window.partitionBy("model").orderBy(F.desc("v"), F.asc("feature"))
    ranked = cell.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("feature").agg(
        (F.sum("rnk").cast("double") / F.count("*")).alias("mean_rank")
    )


# --- W2: top-k rows per group (wine…11….ipynb:5566-5571) --------------------
@query(
    "topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 10
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


# --- W3: cumulative-sum curve (teamProject/eda.ipynb:1543-1560) -------------
_CUM_ORACLE = """
WITH ordered AS (
  SELECT p_partkey, p_retailprice,
         row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS rnk,
         CAST(sum(CAST(p_retailprice AS DECIMAL(25,6))) OVER (
           ORDER BY p_retailprice DESC, p_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum,
         CAST(sum(CAST(p_retailprice AS DECIMAL(25,6))) OVER () AS DOUBLE) AS total
  FROM part
)
SELECT rnk, p_partkey, cum / total AS cum_frac FROM ordered
"""


@query("cumsum_curve", oracle=_CUM_ORACLE)
def cumsum_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explained-variance / importance-curve shape: ordered cumulative share.
    Decimal running sum ⇒ exact regardless of frame evaluation order."""
    part = load_table(spark, sf_dir, "part")
    order = [F.desc("p_retailprice"), F.asc("p_partkey")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = F.sum(F.col("p_retailprice").cast("decimal(25,6)")).over(
        Window.partitionBy()
    )
    return part.select(
        F.row_number().over(Window.orderBy(*order)).alias("rnk"),
        "p_partkey",
        (
            F.sum(F.col("p_retailprice").cast("decimal(25,6)")).over(w).cast("double")
            / total.cast("double")
        ).alias("cum_frac"),
    )


# --- W4: first index crossing a threshold (teamProject/eda.ipynb:1565-1570) -
@query(
    "argmax_threshold",
    oracle=f"""
    WITH curve AS ({_CUM_ORACLE})
    SELECT min(rnk) AS n_for_half FROM curve WHERE cum_frac >= 0.5
    """,
)
def argmax_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    curve = cumsum_curve(spark, sf_dir)
    return curve.filter(F.col("cum_frac") >= 0.5).agg(
        F.min("rnk").alias("n_for_half")
    )


# --- O1: multi-key sort (wine…11….ipynb:5560) -------------------------------
@query(
    "sort_values",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice, rn FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             row_number() OVER (
               ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 100
    """,
)
def sort_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key asc/desc sort; the rank column materializes the order (the
    driver's comparison is order-insensitive, so the position IS the value)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(
        F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
    )


# --- O2: head-N (experiments/target_eda.py:123) -----------------------------
@query(
    "limit_head",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
)
def limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )


# --- O3: arg-max row (cross-validation/wine_analysis.py:285-286) ------------
@query(
    "top1_argmax",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {N.sql_davg('l_quantity')} AS mean_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY mean_qty DESC, l_returnflag, l_linestatus LIMIT 1
    """,
)
def top1_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(N.davg("l_quantity").alias("mean_qty"))
        .orderBy(F.desc("mean_qty"), "l_returnflag", "l_linestatus")
        .limit(1)
    )


# --- O4: stratified per-class sample (teamProject/eda.ipynb:1588-1600) ------
@query(
    "sample_per_class",
    oracle="""
    SELECT l_returnflag, count(*) AS n_sampled,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem WHERE l_orderkey % 20 = 0
    GROUP BY l_returnflag
    """,
)
def sample_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic key-hash stratified sample (oracle-checkable stand-in
    for df.sampleBy, which is seeded-random; library path: ml_ops.sample_by)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_sampled"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
