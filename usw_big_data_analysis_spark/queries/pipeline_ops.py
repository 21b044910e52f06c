"""Lakehouse / data-pipeline operators (extension family): the table-
maintenance and audit operations a production training-data pipeline runs
around the SURVEY §2 analytics — latest-record-wins compaction, CDC snapshot
diff, set-difference, ordered string aggregation, data-quality audit,
market-basket pair mining, batch sessionization, categorical split purity,
autocorrelation sufficient statistics, and a Benford first-digit audit.

All outputs are integers, strings, or raw passthrough columns — bit-stable
across engines with zero float conventions needed (money flows through the
exact cents form ``round(x*100)::bigint``; shares are ppm via bigint
integer division, identical under Spark ``div`` and DuckDB ``//``).

Scale notes (100 TB):
- latest_by_key / session_stats: the only windows are key-partitioned
  (o_custkey / user_id) — no global sort, no SinglePartition exchange.
- snapshot_diff: a single full-outer shuffle join on the snapshot key,
  then a 4-row hash aggregate; AQE coalesces the post-join partitions.
- basket_pairs: the classic frequent-pair self-join, with the singleton
  prune (parts in ≥2 baskets) applied BEFORE the join so the quadratic
  blowup only sees frequent items; top-k is TakeOrderedAndProject.
- dq_audit: one wide aggregate pass (count + count(col) + n_distinct per
  column) melted driver-free via ``stack`` — one scan however many columns.
- acf_daily_orders: the series is aggregated to one row per day BEFORE the
  7-lag equi-join, so the join touches |days|·7 rows, not raw orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

_US_DAY = 86_400_000_000
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
# Spark-side twin (primitive rounding, o_totalprice >= 0 — see olap_ext)
_CENTS_S = N.spark_fround_int("o_totalprice * 100")


# --- latest-record-wins compaction (SCD / upsert dedup) ---------------------
@query(
    "latest_by_key",
    oracle=f"""
    SELECT o_custkey, o_orderkey, {_CENTS} AS price_cents
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    WHERE rn = 1
    """,
)
def latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — the "latest record wins" compaction every
    incremental ingest needs (reference analog: pandas
    sort_values+drop_duplicates(keep='last') passes). Deterministic via the
    unique o_orderkey tiebreak; the window is key-partitioned, so at 100 TB
    this is one shuffle by customer and no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.expr(_CENTS_S).alias("price_cents"),
        )
    )


# --- CDC snapshot diff (insert / delete / update / same) --------------------
@query(
    "snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey AS k, {_CENTS} AS cents FROM orders
      WHERE o_orderkey % 10 <> 3
    ),
    new AS (
      SELECT o_orderkey AS k,
             {_CENTS} + CASE WHEN o_orderkey % 5 = 0 THEN 100 ELSE 0 END
               AS cents
      FROM orders WHERE o_orderkey % 10 <> 7
    )
    SELECT
      CASE WHEN old.k IS NULL THEN 'insert'
           WHEN new.k IS NULL THEN 'delete'
           WHEN old.cents <> new.cents THEN 'update'
           ELSE 'same' END AS change_type,
      count(*) AS n,
      CAST(sum(coalesce(new.cents, 0) - coalesce(old.cents, 0)) AS BIGINT) AS net_cents_delta
    FROM old FULL OUTER JOIN new ON old.k = new.k
    GROUP BY change_type
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture classification between two deterministic snapshot
    views of `orders` (old drops keys ≡3 mod 10; new drops ≡7 and bumps
    multiples of 5 by 100 cents): one full-outer join on the key, then a
    4-row rollup of insert/delete/update/same with the exact net cents
    delta. At scale this is the standard snapshot-reconciliation job —
    a single co-partitioned shuffle join, no windows."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"), F.expr(_CENTS_S).alias("cents")
    )
    old = base.filter(F.col("k") % 10 != 3)
    new = base.filter(F.col("k") % 10 != 7).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("k") % 5 == 0, F.lit(100)).otherwise(F.lit(0)),
    )
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    return (
        j.select(
            F.when(F.col("o.k").isNull(), "insert")
            .when(F.col("n.k").isNull(), "delete")
            .when(F.col("o.cents") != F.col("n.cents"), "update")
            .otherwise("same")
            .alias("change_type"),
            (
                F.coalesce(F.col("n.cents"), F.lit(0))
                - F.coalesce(F.col("o.cents"), F.lit(0))
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(F.count("*").alias("n"), F.sum("delta").alias("net_cents_delta"))
    )


# --- set difference (EXCEPT) ------------------------------------------------
@query(
    "except_customers",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no OPEN order, as a true EXCEPT set op (Spark
    ``subtract`` → left-anti under the hood; the status filter keeps the
    result non-empty at every SF so the check is non-vacuous). At scale
    both sides pre-aggregate to distinct keys before the anti shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.select("c_custkey").subtract(
        orders.filter(F.col("o_orderstatus") == "O").select(
            F.col("o_custkey").alias("c_custkey")
        )
    )


# --- ordered string aggregation ---------------------------------------------
@query(
    "string_agg_region",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def string_agg_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string_agg: nations per region as a sorted CSV
    (collect_list is unordered in a distributed engine, so the sort happens
    explicitly via array_sort before concat — the only way string_agg is
    reproducible at scale). Group cardinality bounds executor memory."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nations_csv"
            ),
            F.count("*").alias("n_nations"),
        )
    )


# --- data-quality audit (Deequ-style, one scan) -----------------------------
_DQ_COLS = ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")


@query(
    "dq_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
            count({c}) * 1000000 // count(*) AS completeness_ppm,
            count(DISTINCT {c}) AS n_distinct
        FROM orders"""
        for c in _DQ_COLS
    ),
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality summary over `orders`: completeness (ppm of
    non-null rows) and distinctness per column, melted to one row per
    column. Single wide aggregate scan; the melt is a ``stack`` projection
    over the 1-row aggregate, so adding columns never adds scans."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n")]
    for c in _DQ_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = orders.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _DQ_COLS)
    return wide.select(
        F.expr(
            f"stack({len(_DQ_COLS)}, {stack}) AS (col_name, nn, n_distinct)"
        ),
        "n",
    ).select(
        "col_name",
        F.expr("nn * 1000000 div n").alias("completeness_ppm"),
        "n_distinct",
    )


# --- market-basket frequent pairs -------------------------------------------
@query(
    "basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    freq AS (
      SELECT pk, count(*) AS cnt FROM items GROUP BY pk HAVING count(*) >= 2
    ),
    fitems AS (
      SELECT i.ok, i.pk FROM items i JOIN freq ON i.pk = freq.pk
    ),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS pair_cnt
      FROM fitems a JOIN fitems b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    )
    SELECT part_a, part_b, pair_cnt, fa.cnt AS cnt_a, fb.cnt AS cnt_b
    FROM pairs
    JOIN freq fa ON part_a = fa.pk
    JOIN freq fb ON part_b = fb.pk
    ORDER BY pair_cnt DESC, part_a, part_b
    LIMIT 50
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-ordered part pairs with per-part support counts — the
    frequent-pair core of market-basket / co-occurrence mining. The
    singleton prune (support ≥ 2) runs BEFORE the quadratic self-join, the
    A-priori trick that keeps the pair blowup proportional to frequent
    items only; the final top-k is TakeOrderedAndProject (no global sort
    materializes). Counts are raw bigints — no lift division, so the
    ranking is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    freq = items.groupBy("pk").agg(F.count("*").alias("cnt")).filter("cnt >= 2")
    fitems = items.join(freq.select("pk"), "pk")
    a = fitems.alias("a")
    b = fitems.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count("*").alias("pair_cnt"))
    )
    out = (
        pairs.join(
            freq.select(F.col("pk").alias("part_a"), F.col("cnt").alias("cnt_a")),
            "part_a",
        )
        .join(
            freq.select(F.col("pk").alias("part_b"), F.col("cnt").alias("cnt_b")),
            "part_b",
        )
        .select("part_a", "part_b", "pair_cnt", "cnt_a", "cnt_b")
    )
    return out.orderBy(
        F.col("pair_cnt").desc(), F.col("part_a"), F.col("part_b")
    ).limit(50)


# --- batch sessionization ---------------------------------------------------
@query(
    "session_stats",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
      SELECT user_id, us,
        CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {_SESSION_GAP_US}
             THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
      SELECT user_id, us,
        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           max(us) - min(us) AS dur_us
    FROM sess GROUP BY user_id, session_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) of the event log, batch
    twin of streaming/ops.py's session windows: per-user lag to flag
    session starts, running sum to number sessions, then per-session event
    count and duration. Every window is partitioned by user_id — the
    100 TB plan is one shuffle by user and zero global sorts. NOTE the
    running sum deliberately orders by `us` alone (ties within a user get
    the same running value only if new_s ties too — event_id makes the lag
    deterministic, and the cumulative frame is ROWS-based with the same
    (us, event_id) order on both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(ts)").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_id", F.sum("new_s").over(wc))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )


# --- categorical split purity (decision-stump feature quality) --------------
# (name, spark_expr, duckdb_expr) — STRING vs VARCHAR is the only dialect split
_PURITY_FEATURES = (
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
    (
        "order_year",
        "CAST(year(o_orderdate) AS STRING)",
        "CAST(year(o_orderdate) AS VARCHAR)",
    ),
    (
        "cust_bucket",
        "CAST(o_custkey % 100 AS STRING)",
        "CAST(o_custkey % 100 AS VARCHAR)",
    ),
)


def _purity_union_sql() -> str:
    parts = [
        f"SELECT '{name}' AS feature, {dexpr} AS val, o_orderstatus AS label FROM orders"
        for name, _sexpr, dexpr in _PURITY_FEATURES
    ]
    return "\nUNION ALL\n".join(parts)


@query(
    "feature_split_purity",
    oracle=f"""
    WITH melted AS ({_purity_union_sql()}),
    cell AS (
      SELECT feature, val, label, count(*) AS c
      FROM melted GROUP BY feature, val, label
    ),
    per_val AS (
      SELECT feature, val, sum(c) AS n_v, max(c) AS max_c
      FROM cell GROUP BY feature, val
    )
    SELECT feature, CAST(sum(n_v - max_c) AS BIGINT) AS n_misclassified, CAST(sum(n_v) AS BIGINT) AS n_total
    FROM per_val GROUP BY feature
    """,
)
def feature_split_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump quality per categorical feature against the
    o_orderstatus label: misclassification count if each feature value
    predicts its majority class (n_v − max class count, summed). The exact
    integer analog of gini/entropy feature ranking — no logs, no divisions,
    bit-stable. Melt → count cells → two hash rollups; one scan per
    feature via a union (Catalyst collapses the shared scan)."""
    orders = load_table(spark, sf_dir, "orders")
    melted = None
    for name, sexpr, _dexpr in _PURITY_FEATURES:
        part = orders.select(
            F.lit(name).alias("feature"),
            F.expr(sexpr).alias("val"),
            F.col("o_orderstatus").alias("label"),
        )
        melted = part if melted is None else melted.unionAll(part)
    cell = melted.groupBy("feature", "val", "label").agg(F.count("*").alias("c"))
    per_val = cell.groupBy("feature", "val").agg(
        F.sum("c").alias("n_v"), F.max("c").alias("max_c")
    )
    return per_val.groupBy("feature").agg(
        F.sum(F.col("n_v") - F.col("max_c")).alias("n_misclassified"),
        F.sum("n_v").alias("n_total"),
    )


# --- autocorrelation sufficient statistics ----------------------------------
@query(
    "acf_daily_orders",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // {_US_DAY} AS d, count(*) AS x
      FROM orders GROUP BY d
    ),
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag)
    SELECT CAST(lag AS BIGINT) AS lag, count(*) AS n,
           CAST(sum(a.x) AS BIGINT) AS sum_x, CAST(sum(b.x) AS BIGINT) AS sum_y,
           CAST(sum(a.x * b.x) AS BIGINT) AS sum_xy,
           CAST(sum(a.x * a.x) AS BIGINT) AS sum_xx, CAST(sum(b.x * b.x) AS BIGINT) AS sum_yy,
           CAST(count(*) * sum(a.x * b.x) - sum(a.x) * sum(b.x) AS BIGINT) AS cov_num
    FROM lags, daily a JOIN daily b ON b.d = a.d + lag
    GROUP BY lag
    """,
)
def acf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-count series at lags 1..7, as
    exact integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy², and the
    covariance numerator n·Σxy − Σx·Σy) — the caller derives float ACF;
    the engine ships only bit-exact parts. The series aggregates to one
    row per day BEFORE the lag joins, so the 7-way lag equi-join touches
    |days|·7 rows regardless of raw order volume."""
    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ in the fixture; the session runs UTC so
    # the cast to TIMESTAMP is an identity relabel before unix_micros.
    daily = orders.groupBy(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}").alias("d")
    ).agg(F.count("*").alias("x"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.alias("a")
    b = daily.alias("b")
    j = lags.crossJoin(a).join(b, F.col("b.d") == F.col("a.d") + F.col("lag"))
    return j.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("a.x").alias("sum_x"),
        F.sum("b.x").alias("sum_y"),
        F.sum(F.col("a.x") * F.col("b.x")).alias("sum_xy"),
        F.sum(F.col("a.x") * F.col("a.x")).alias("sum_xx"),
        F.sum(F.col("b.x") * F.col("b.x")).alias("sum_yy"),
        (
            F.count("*") * F.sum(F.col("a.x") * F.col("b.x"))
            - F.sum("a.x") * F.sum("b.x")
        ).alias("cov_num"),
    )


# --- Benford first-digit audit ----------------------------------------------
@query(
    "benford_digits",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    )
    SELECT digit, count(*) AS n,
           count(*) * 1000000 // (SELECT count(*) FROM orders) AS share_ppm
    FROM d GROUP BY digit
    """,
)
def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals (in exact
    cents) with ppm shares — the Benford's-law fraud/anomaly audit. Digit
    extraction goes through bigint→string (identical formatting on both
    engines; no log10 floats). One hash aggregate to ≤9 rows, then a
    broadcast of the scalar total."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(F.expr(_CENTS_S).cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n"))
    total = orders.agg(F.count("*").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit", "n", F.expr("n * 1000000 div total").alias("share_ppm")
    )


# --- SCD type-2 history build ------------------------------------------------
@query(
    "scd2_history",
    oracle="""
    SELECT user_id,
           epoch_us(ts) AS valid_from_us,
           coalesce(lead(epoch_us(ts)) OVER w, 9223372036854775807)
             AS valid_to_us,
           event_type AS state,
           CASE WHEN lead(epoch_us(ts)) OVER w IS NULL THEN TRUE
                ELSE FALSE END AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: each user's event stream becomes
    validity intervals [valid_from, valid_to) with an is_current flag —
    the warehouse history-table build. One key-partitioned lead window
    (unique (ts, event_id) order key), open intervals closed with
    bigint max — no sentinel-date timezone traps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(F.expr("unix_micros(ts)")).over(w)
    return ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(9223372036854775807)).alias("valid_to_us"),
        F.col("event_type").alias("state"),
        nxt.isNull().alias("is_current"),
    )


# --- calendar-spine gap filling ----------------------------------------------
@query(
    "resample_daily_fill",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // {_US_DAY} AS d, count(*) AS n
      FROM orders GROUP BY d
    ),
    bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM daily),
    spine AS (SELECT unnest(generate_series(mn, mx)) AS d FROM bounds)
    SELECT spine.d, coalesce(daily.n, 0) AS n
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def resample_daily_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with gap filling: aggregate to day counts, generate
    the full calendar spine between min and max day (sequence explode from
    the 1-row bounds aggregate — no driver loop), left-join and zero-fill.
    The spine is |days| rows however large the fact table is; the join is
    a broadcast of the aggregated series."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}").alias(
            "d"
        )
    ).agg(F.count("*").alias("n"))
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("d")
    )
    return spine.join(daily, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).alias("n")
    )


# --- per-group winsorization -------------------------------------------------
@query(
    "winsorize_values",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p5,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CAST(e.value < q.p5 AS BIGINT)) AS BIGINT) AS n_clip_lo,
           CAST(sum(CAST(e.value > q.p95 AS BIGINT)) AS BIGINT) AS n_clip_hi,
           round(CAST(sum(CAST(round(
             greatest(least(e.value, q.p95), q.p5) * 1000000
           ) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0, 6) AS wsum
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization of event values at the exact [p5, p95]
    percentiles: clip counts plus the exact decimal-summed winsorized
    total (values scaled to 6 decimals and summed as integers — a float
    sum of clipped doubles would be partition-order dependent). The
    percentile pass uses `percentile` (exact; `percentile_approx` is the
    documented 100 TB swap, same as `describe`); the clip join broadcasts
    the tiny per-type bounds."""
    ev = load_table(spark, sf_dir, "events")
    # one array-percentile buffer per group instead of two (r07, §2.3)
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.05D, 0.95D))").alias("qq")
    ).select(
        "event_type",
        F.col("qq")[0].alias("p5"),
        F.col("qq")[1].alias("p95"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    clipped = F.greatest(F.least(F.col("value"), F.col("p95")), F.col("p5"))
    return j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") < F.col("p5")).cast("bigint")).alias("n_clip_lo"),
        F.sum((F.col("value") > F.col("p95")).cast("bigint")).alias("n_clip_hi"),
        F.round(
            F.sum(N.fround_int(clipped * 1_000_000).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1_000_000.0,
            6,
        ).alias("wsum"),
    )


# --- MERGE INTO (copy-on-write) ----------------------------------------------
# Deterministic change feed derived from the base itself via the portable
# md5 hash: h%10==0 -> DELETE, h%10 in (1,2) -> UPDATE (+10.00 on the
# total), h%10==3 -> INSERT under a shifted key. One full-outer join on the
# key applies all three clauses in a single Catalyst plan — the
# copy-on-write shape Delta/Iceberg run per touched file group.
_MERGE_SHIFT = 10_000_000_000


def _mh_spark(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    ) % 10


def _mh_sql(expr: str) -> str:
    return (
        f"(CAST(concat('0x', substring(md5(CAST({expr} AS STRING)), 1, 15))"
        f" AS BIGINT) % 10)"
    )


@query(
    "merge_cow",
    oracle=f"""
    WITH h AS (SELECT o.*, {_mh_sql('o_orderkey')} AS hb FROM orders o),
    changes AS (
      SELECT o_orderkey AS key, 'D' AS op, NULL AS new_total
      FROM h WHERE hb = 0
      UNION ALL
      SELECT o_orderkey, 'U', round(o_totalprice + 10.0, 2) FROM h WHERE hb IN (1, 2)
      UNION ALL
      SELECT o_orderkey + {_MERGE_SHIFT}, 'I', round(o_totalprice, 2) FROM h WHERE hb = 3
    ),
    merged AS (
      SELECT coalesce(c.key, b.o_orderkey) AS key,
             CASE WHEN c.op = 'U' THEN c.new_total
                  WHEN c.op = 'I' THEN c.new_total
                  ELSE b.o_totalprice END AS total,
             CASE WHEN c.op = 'I' THEN 'O' ELSE b.o_orderstatus END AS status
      FROM h b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT status, count(*) AS n,
           CAST(sum(CAST(round(total * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM merged GROUP BY status
    """,
)
def merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO, copy-on-write: a change feed (delete / update / insert,
    hash-derived so both engines build the identical feed) applied to the
    base in ONE full-outer join — WHEN MATCHED AND op='D' THEN DELETE,
    WHEN MATCHED AND op='U' THEN UPDATE, WHEN NOT MATCHED THEN INSERT.
    Totals compare as exact integer cents (updates add a whole 10.00, so
    2-decimal exactness survives). At 100 TB the join is the per-file-group
    rewrite a lakehouse MERGE plans; broadcast the change feed when small."""
    base = load_table(spark, sf_dir, "orders").withColumn(
        "hb", _mh_spark(F.col("o_orderkey"))
    )
    deletes = base.filter(F.col("hb") == 0).select(
        F.col("o_orderkey").alias("key"), F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_total"),
    )
    updates = base.filter(F.col("hb").isin(1, 2)).select(
        F.col("o_orderkey").alias("key"), F.lit("U").alias("op"),
        N.fround(F.col("o_totalprice") + 10.0, 2).alias("new_total"),
    )
    inserts = base.filter(F.col("hb") == 3).select(
        (F.col("o_orderkey") + _MERGE_SHIFT).alias("key"),
        F.lit("I").alias("op"),
        N.fround(F.col("o_totalprice"), 2).alias("new_total"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    joined = base.join(changes, base.o_orderkey == changes.key, "full_outer")
    merged = joined.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        F.coalesce(F.col("key"), F.col("o_orderkey")).alias("mkey"),
        F.when(F.col("op").isin("U", "I"), F.col("new_total"))
        .otherwise(F.col("o_totalprice"))
        .alias("total"),
        F.when(F.col("op") == "I", F.lit("O"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    return merged.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum(N.fround_int(F.col("total") * 100)).alias(
            "total_cents"
        ),
    )


# --- referential-integrity audit ---------------------------------------------
@query(
    "dq_referential",
    oracle="""
    SELECT 'lineitem_orphan_order' AS violation, count(*) AS n FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem_orphan_part', count(*) FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
    UNION ALL
    SELECT 'lineitem_orphan_supplier', count(*) FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
    UNION ALL
    SELECT 'orders_orphan_customer', count(*) FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'customer_orphan_nation', count(*) FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
    """,
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema: each edge checked
    with a LEFT ANTI join (dimension side broadcast where small), one count
    per violation class. Runs as parallel anti-join aggregates unioned at
    the end — the scheduled-health-check companion to dq_audit's
    single-table scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    checks = [
        ("lineitem_orphan_order", li.select("l_orderkey"),
         orders.select("o_orderkey"), "l_orderkey", "o_orderkey", False),
        ("lineitem_orphan_part", li.select("l_partkey"),
         load_table(spark, sf_dir, "part").select("p_partkey"),
         "l_partkey", "p_partkey", True),
        ("lineitem_orphan_supplier", li.select("l_suppkey"),
         load_table(spark, sf_dir, "supplier").select("s_suppkey"),
         "l_suppkey", "s_suppkey", True),
        ("orders_orphan_customer", orders.select("o_custkey"),
         load_table(spark, sf_dir, "customer").select("c_custkey"),
         "o_custkey", "c_custkey", True),
        ("customer_orphan_nation",
         load_table(spark, sf_dir, "customer").select("c_nationkey"),
         load_table(spark, sf_dir, "nation").select("n_nationkey"),
         "c_nationkey", "n_nationkey", True),
    ]
    out = None
    for name, child, parent, ck, pk, bcast in checks:
        p = F.broadcast(parent) if bcast else parent
        orphans = child.join(p, F.col(ck) == F.col(pk), "left_anti").agg(
            F.count("*").alias("n")
        ).select(F.lit(name).alias("violation"), "n")
        out = orphans if out is None else out.unionByName(orphans)
    return out


# --- association rules: confidence + lift over basket pairs ------------------
_AR_MIN_PAIR = 3


@query(
    "basket_association_rules",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
    freq AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY pk
    ),
    pairs AS (
      SELECT a.pk AS ante, b.pk AS cons, CAST(count(*) AS BIGINT) AS pair_cnt
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY a.pk, b.pk
      HAVING count(*) >= {_AR_MIN_PAIR}
    )
    SELECT p.ante, p.cons, p.pair_cnt,
           round(CAST(p.pair_cnt AS DOUBLE) / fa.cnt, 6) AS confidence,
           round(CAST(p.pair_cnt AS DOUBLE) * nb.n_baskets
                 / (CAST(fa.cnt AS DOUBLE) * fb.cnt), 6) AS lift
    FROM pairs p
    JOIN freq fa ON p.ante = fa.pk
    JOIN freq fb ON p.cons = fb.pk
    CROSS JOIN nb
    ORDER BY lift DESC, p.ante, p.cons LIMIT 20
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules ante→cons over order baskets with the
    full metric triple — support (pair count), confidence
    (P(cons|ante)) and lift (observed / independence) — the
    market-basket output basket_pairs' raw counts feed; top-20 by lift.

    Scale shape: one distinct-items pass, the wedge self-join bounded by
    basket width, item frequencies and the basket count broadcast;
    minimum pair support prunes before the metric join; top-k is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
    nb = items.agg(F.expr("CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets"))
    freq = items.groupBy("pk").agg(F.expr("CAST(count(*) AS BIGINT) AS cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("ante"), F.col("b.pk").alias("cons"))
        .agg(F.expr("CAST(count(*) AS BIGINT) AS pair_cnt"))
        .filter(f"pair_cnt >= {_AR_MIN_PAIR}")
    )
    fa = freq.selectExpr("pk AS ante", "cnt AS cnt_a")
    fb = freq.selectExpr("pk AS cons", "cnt AS cnt_b")
    return (
        pairs.join(F.broadcast(fa), "ante")
        .join(F.broadcast(fb), "cons")
        .crossJoin(F.broadcast(nb))
        .selectExpr(
            "ante",
            "cons",
            "pair_cnt",
            N.spark_fround("CAST(pair_cnt AS DOUBLE) / cnt_a", 6) + " AS confidence",
            "round(CAST(pair_cnt AS DOUBLE) * n_baskets"
            " / (CAST(cnt_a AS DOUBLE) * cnt_b), 6) AS lift",
        )
        .orderBy(F.desc("lift"), F.asc("ante"), F.asc("cons"))
        .limit(20)
    )


# --- in-flight pipeline observability: Dataset.observe / CollectMetrics ------
@query(
    "observe_metrics_audit",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum({{_C}}) AS BIGINT) AS status_cents
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """.replace("{_C}", _CENTS),
)
def observe_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status revenue rollup with an ``observe()`` audit attached to
    the SCAN side: production pipelines hang row-count / null-count /
    checksum metrics off intermediate frames (a `CollectMetrics` node in
    the plan) and alert on them without a second pass over the data — the
    Spark-native form of the reference's ad-hoc `df.shape` / `isna().sum()`
    checkpoints between cleaning steps (teamProject/
    1-1.data_processing.ipynb). The observation computes during the SAME
    action that produces the result (zero extra scans at any scale); the
    returned rollup is oracle-checked, and tests pin both the
    CollectMetrics plan node and the observed values themselves."""
    from pyspark.sql import Observation

    # Isolated session: observe() lazily initializes the session-global
    # ObservationManager, which is NOT java-serializable — once created,
    # any later task closure that captures the session (e.g. a fitted
    # LogisticRegressionModel whose trainingSummary holds it, as in
    # pipeline_fit) fails with Task not serializable. A child session
    # shares the SparkContext and catalog but keeps its own manager, so
    # the observation never poisons the caller's session. (Found by the
    # full-suite ordering: this query runs before the ML family in the
    # rotation.)
    obs_spark = spark.newSession()
    orders = obs_spark.read.parquet(f"{sf_dir}/orders.parquet")
    obs = Observation("ingest_audit")
    audited = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.expr(_CENTS_S)).alias("cents_seen"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("null_custkeys"),
    )
    return (
        audited.groupBy("o_orderstatus")
        .agg(
            F.expr("count(*) AS n"),
            F.expr(f"CAST(sum({_CENTS_S}) AS BIGINT) AS status_cents"),
        )
        .orderBy("o_orderstatus")
    )


# --- MERGE, merge-on-read: base + delete file + upsert log -------------------
@query(
    "merge_mor",
    oracle=f"""
    WITH h AS (SELECT o.*, {_mh_sql('o_orderkey')} AS hb FROM orders o),
    changes AS (
      SELECT o_orderkey AS key, 'D' AS op, NULL AS new_total
      FROM h WHERE hb = 0
      UNION ALL
      SELECT o_orderkey, 'U', round(o_totalprice + 10.0, 2) FROM h WHERE hb IN (1, 2)
      UNION ALL
      SELECT o_orderkey + {_MERGE_SHIFT}, 'I', round(o_totalprice, 2) FROM h WHERE hb = 3
    ),
    merged AS (
      SELECT coalesce(c.key, b.o_orderkey) AS key,
             CASE WHEN c.op = 'U' THEN c.new_total
                  WHEN c.op = 'I' THEN c.new_total
                  ELSE b.o_totalprice END AS total,
             CASE WHEN c.op = 'I' THEN 'O' ELSE b.o_orderstatus END AS status
      FROM h b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT status, count(*) AS n,
           CAST(sum(CAST(round(total * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM merged GROUP BY status
    """,
)
def merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE, merge-on-READ — the same change feed and final state as
    merge_cow (identical oracle: mechanics must not change semantics), but
    through the Iceberg-v2-style file mechanics a CDC writer produces:
    the base stays IMMUTABLE on disk, the writer lands only (a) an
    equality-delete file (keys whose base row is dead — deleted keys AND
    updated keys' old versions) and (b) an upsert log (new row versions +
    inserts); the reader composes base ∖ deletes ∪ log at scan time.
    Write amplification: O(changes) files vs merge_cow's O(touched file
    groups) rewrite — the trade MOR exists for.

    Scale shape: the read path is one LEFT ANTI hash join of the base scan
    against the (broadcastable) delete-key file plus a union with the log
    — no full-outer join, no base rewrite. All three artifacts are REAL
    parquet round trips through the per-process staging dir."""
    import os as _os

    from ._shared import process_tmp

    root = _os.path.join(process_tmp(), "merge_mor")
    base_p, del_p, log_p = (
        f"{root}/base",
        f"{root}/deletes",
        f"{root}/log",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    orders.write.mode("overwrite").parquet(base_p)
    h = orders.withColumn("hb", _mh_spark(F.col("o_orderkey")))
    # dead base rows: deletes AND the old versions of updated keys
    h.filter(F.col("hb").isin(0, 1, 2)).select(
        F.col("o_orderkey").alias("key")
    ).write.mode("overwrite").parquet(del_p)
    upserts = h.filter(F.col("hb").isin(1, 2)).select(
        F.col("o_orderkey").alias("key"),
        N.fround(F.col("o_totalprice") + 10.0, 2).alias("total"),
        F.col("o_orderstatus").alias("status"),
    )
    inserts = h.filter(F.col("hb") == 3).select(
        (F.col("o_orderkey") + _MERGE_SHIFT).alias("key"),
        N.fround(F.col("o_totalprice"), 2).alias("total"),
        F.lit("O").alias("status"),
    )
    upserts.unionByName(inserts).write.mode("overwrite").parquet(log_p)

    base = spark.read.parquet(base_p)
    dels = spark.read.parquet(del_p)
    log = spark.read.parquet(log_p)
    # no broadcast hint: the delete log scales with the CDC batch, not a
    # fixed domain (ADVICE r6 class); AQE broadcasts while it fits.
    live_base = base.join(
        dels, base.o_orderkey == dels.key, "left_anti"
    ).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"),
    )
    merged = live_base.unionByName(log)
    return merged.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum(N.fround_int(F.col("total") * 100)).alias("total_cents"),
    )


# --- temporal AS OF lookup against the SCD2 history -----------------------------
@query(
    "scd2_asof_lookup",
    oracle="""
    WITH hist AS (
      SELECT user_id,
             epoch_us(ts) AS valid_from_us,
             coalesce(lead(epoch_us(ts)) OVER w, 9223372036854775807)
               AS valid_to_us,
             event_type AS state
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    probes AS (
      SELECT user_id,
             (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS asof_us
      FROM events GROUP BY user_id
    )
    SELECT p.user_id, p.asof_us, h.state,
           h.valid_from_us, h.valid_to_us
    FROM probes p JOIN hist h
      ON p.user_id = h.user_id
     AND h.valid_from_us <= p.asof_us AND p.asof_us < h.valid_to_us
    """,
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal AS OF lookup — the query an SCD2 history table exists to
    answer: for each user, the state that was valid at a probe instant
    (the midpoint of their activity). The interval-stabbing join is an
    equi-join on the key with the validity predicate applied WITHIN each
    key's bounded interval list — the scalable form; a raw interval range
    join without the key would explode. Exactly one row per probe by the
    SCD2 invariant (intervals partition the timeline), which the pytest
    golden pins.

    Everything is integer microseconds; no timezone or sentinel-date
    arithmetic anywhere (the open interval closes with bigint max)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(F.expr("unix_micros(ts)")).over(w)
    hist = ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(9223372036854775807)).alias("valid_to_us"),
        F.col("event_type").alias("state"),
    )
    probes = ev.groupBy("user_id").agg(
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
        ).alias("asof_us")
    )
    return (
        probes.join(hist, "user_id")
        .filter(
            (F.col("valid_from_us") <= F.col("asof_us"))
            & (F.col("asof_us") < F.col("valid_to_us"))
        )
        .select("user_id", "asof_us", "state", "valid_from_us", "valid_to_us")
    )
