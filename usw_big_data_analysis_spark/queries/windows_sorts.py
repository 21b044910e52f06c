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
from ..operators.bounded_seq import exclusive_prefix_sums, ordered_row_numbers
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
    """Sketch-and-refine grouped top-k — the fact is NEVER shuffled.

    A grouped window over l_returnflag (3 distinct values) shuffles the
    whole fact into 3 tasks; even a salted two-phase window still shuffles
    every row once. This plan moves only a histogram instead:

    1. Sketch: per (flag, price-bucket) counts — a partial-aggregated
       groupBy whose shuffle is the tiny bucket table (~#flags × #buckets
       rows), not the fact.
    2. Threshold: walking each flag's buckets from the top, the first
       bucket where the cumulative count reaches k lower-bounds the k-th
       max (≥ k rows are ≥ its floor). Flags with fewer than k rows never
       reach k and fall back to -inf (keep all).
    3. Refine: broadcast the 3-row threshold table back onto a second
       pruned scan; only the ~bucket-width survivors enter the ranking
       windows. A salted guard window bounds the degenerate all-ties case
       (a uniform-price corpus collapses into one bucket) before the final
       per-flag window ranks the ≤10·S survivors.

    At 100 TB this is the canonical distributed top-k: two column-pruned
    scans + a histogram shuffle, versus a full-fact exchange. The tie
    order (price desc, orderkey, linenumber) is total, so the result is
    deterministic and oracle-exact regardless of the threshold chosen."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"]
    order = [
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    ]
    k, bucket_w = 10, 64.0
    # decimal(12,2) -> double is exact (< 2^53); bucket floor is portable
    pd_ = F.col("l_extendedprice").cast("double")
    bucket_counts = (
        li.select("l_returnflag", F.floor(pd_ / F.lit(bucket_w)).alias("_b"))
        .groupBy("l_returnflag", "_b")
        .agg(F.count("*").alias("_c"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.desc("_b"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    thr = (
        bucket_counts.withColumn("_cum", F.sum("_c").over(w_cum))
        .filter(F.col("_cum") >= k)
        .groupBy("l_returnflag")
        .agg(F.max("_b").alias("_tb"))
        .select("l_returnflag", (F.col("_tb") * bucket_w).alias("_thr"))
    )
    cand = (
        li.join(F.broadcast(thr), "l_returnflag", "left")
        .filter(pd_ >= F.coalesce(F.col("_thr"), F.lit(float("-inf"))))
        .select(*cols)
    )
    w1 = Window.partitionBy(
        "l_returnflag",
        F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(32)),
    ).orderBy(*order)
    guarded = (
        cand.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .select(*cols)
    )
    w2 = Window.partitionBy("l_returnflag").orderBy(*order)
    return (
        guarded.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(*cols, "rn")
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

    Two-phase instead of a global ordered window (which single-partitions
    the whole table): range-bucket on the sort key, roll per-bucket
    count/sum subtotals into global offsets over the tiny histogram, then a
    bucket-PARTITIONED window finishes ranks and running sums. Ties share a
    price so they share a bucket; decimal arithmetic keeps every partial
    exact, so offsets + in-bucket sums ≡ the global running sum bit-for-bit
    (same pattern as ``operators/rank_ops.py``/``percentile_ops.py``)."""
    part = load_table(spark, sf_dir, "part")
    nb = 1024
    pr = part.select("p_partkey", "p_retailprice")
    mm = pr.agg(
        F.min("p_retailprice").cast("double").alias("mn"),
        F.max("p_retailprice").cast("double").alias("mx"),
    )
    width = (F.col("mx") - F.col("mn")) / float(nb)
    bounds = mm.select(
        "mx", F.when(width == 0.0, F.lit(1.0)).otherwise(width).alias("w")
    )
    dec = F.col("p_retailprice").cast("decimal(25,6)")
    # descending buckets: highest price -> bucket 0
    wb = pr.crossJoin(F.broadcast(bounds)).select(
        "p_partkey",
        "p_retailprice",
        F.least(
            F.floor(
                (F.col("mx") - F.col("p_retailprice").cast("double")) / F.col("w")
            ).cast("int"),
            F.lit(nb - 1),
        ).alias("b"),
    )
    hist = wb.groupBy("b").agg(F.count("*").alias("bc"), F.sum(dec).alias("bs"))
    offs = (
        exclusive_prefix_sums(hist, "b", ["bc", "bs"])
        .withColumnRenamed("prev_bc", "prev_cnt")
        .withColumnRenamed("prev_bs", "prev_sum")
    )
    tot = hist.agg(F.sum("bs").cast("double").alias("total"))
    order = [F.desc("p_retailprice"), F.asc("p_partkey")]
    wv = Window.partitionBy("b").orderBy(*order)
    wvs = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        wb.join(F.broadcast(offs), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("prev_cnt") + F.row_number().over(wv)).cast("int").alias("rnk"),
            "p_partkey",
            (
                (F.col("prev_sum") + F.sum(dec).over(wvs)).cast("double")
                / F.col("total")
            ).alias("cum_frac"),
        )
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
    driver's comparison is order-insensitive, so the position IS the value).
    limit-before-window: the top-100 comes from distributed top-k
    (TakeOrderedAndProject — each partition keeps 100, no global sort); the
    unpartitioned row_number then only ever sees 100 rows."""
    orders = load_table(spark, sf_dir, "orders")
    keys = [F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")]
    top = (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(*keys)
        .limit(100)
    )
    order = [("o_orderpriority", True), ("o_totalprice", False), ("o_orderkey", True)]
    return ordered_row_numbers(top, order, out="rn")


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


# --- per-key rolling (trailing-5) mean over event time -----------------------
@query(
    "rolling_mean_user",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(sum(CAST(value AS DECIMAL(38,10)))
                  OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS rolling_mean5
    FROM events
    """,
)
def rolling_mean_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-event mean per user. The windowed sum runs over DECIMAL —
    sliding double sums are accumulation-order dependent (running-subtract
    vs fresh-sum differ in the last ulp); the decimal sum is exact in any
    order, and the single final division is IEEE. Window is user-partitioned
    — parallel across users, no global anything. (user_id, ts) is unique in
    the fixture, so the frame is fully determined."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-4, 0)
    mean5 = F.sum(F.col("value").cast("decimal(38,10)")).over(w).cast(
        "double"
    ) / F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        mean5.alias("rolling_mean5"),
    )


# --- per-key lag/diff (event-over-event delta) -------------------------------
@query(
    "lag_diff_user",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS dv,
           CAST(epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS dt_us
    FROM events
    """,
)
def lag_diff_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-over-event value and time deltas per user (first event per
    user gets nulls). Single user-partitioned window; subtraction is one
    IEEE op — bit-exact cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    ts_us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
        (ts_us - F.lag(ts_us).over(w)).cast("bigint").alias("dt_us"),
    )


# --- 2-D skyline (Pareto frontier): cheapest-yet-largest parts ---------------
_SKY_NB = 1024


@query(
    "skyline_2d",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
         OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size)
    )
    """,
)
def skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) on (minimize price, maximize size): a part
    survives iff nothing is both at-most-as-expensive and at-least-as-big
    with one strict. The multi-objective shortlist op (cheapest viable
    supplier per capability point).

    The oracle's NOT EXISTS is O(n²); the 2-D identity makes it a prefix
    problem: with M(p) = max size over STRICTLY cheaper rows and E(p) =
    max size at-or-below p's price, p survives iff size > M(p) and
    size = E(p). So: distinct-price max-size table (map-side combined),
    range-bucket the prices, per-bucket maxima, exclusive prefix-MAX over
    the ≤{_SKY_NB}-row bucket table by triangular join (bounded_seq
    convention — no unpartitioned window), bucket-partitioned in-bucket
    running max, broadcast M back onto one fact scan. Every stage is a
    full-parallel aggregate; the fact is scanned twice and never
    shuffled."""
    pr = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    vp = pr.groupBy("p_retailprice").agg(F.expr("max(p_size) AS pmax"))
    mm = vp.agg(
        F.expr("min(p_retailprice) AS mn"), F.expr("max(p_retailprice) AS mx")
    )
    bounds = mm.selectExpr(
        "mn",
        f"CASE WHEN mx = mn THEN 1.0D ELSE (mx - mn) / {_SKY_NB}.0D END AS w",
    )
    vb = vp.crossJoin(F.broadcast(bounds)).selectExpr(
        "p_retailprice",
        "pmax",
        f"least(CAST(floor((p_retailprice - mn) / w) AS INT), {_SKY_NB - 1}) AS b",
    )
    hist = vb.groupBy("b").agg(F.expr("max(pmax) AS bmax"))
    prev = (
        hist.select("b")
        .join(
            F.broadcast(
                hist.selectExpr("b AS b2", "bmax AS bmax2")
            ),
            F.col("b2") < F.col("b"),
            "left",
        )
        .groupBy("b")
        .agg(F.expr("max(bmax2) AS bucket_prev_max"))
    )
    wv = Window.partitionBy("b").orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    m = (
        vb.join(F.broadcast(prev), "b")
        .withColumn("in_prev", F.max("pmax").over(wv))
        .selectExpr(
            "p_retailprice",
            "pmax",
            "greatest(coalesce(bucket_prev_max, -2147483648),"
            " coalesce(in_prev, -2147483648)) AS strict_max",
        )
    )
    return (
        pr.join(F.broadcast(m), "p_retailprice")
        .filter(F.expr("p_size = pmax AND p_size > strict_max"))
        .select("p_partkey", "p_retailprice", "p_size")
    )


# --- per-key rolling (trailing-7) exact median over event time ---------------
@query(
    "rolling_median_user",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             list_sort(list(value)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
      FROM events
    )
    SELECT event_id, user_id, ts_us,
           CASE WHEN len(l) % 2 = 1 THEN l[(len(l) + 1) // 2]
                ELSE (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2.0 END
             AS rolling_median7
    FROM w
    """,
)
def rolling_median_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-event exact median per user — the robust companion to
    rolling_mean_user. The frame's values are collected and sorted per row
    (bounded: 7 doubles), and the even-count interpolation is written as the
    same (a+b)/2 expression in both engines, so results are bit-exact.
    User-partitioned window only; parallel across users at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-6, 0)
    l = F.array_sort(F.collect_list("value").over(w))
    n = F.size(l)
    med = F.when(
        n % 2 == 1, F.element_at(l, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(l, (n / 2).cast("int"))
            + F.element_at(l, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        med.alias("rolling_median7"),
    )
