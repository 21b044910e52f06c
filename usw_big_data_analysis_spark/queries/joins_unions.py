"""Joins + set operations (SURVEY.md §2.3 J1-J4, §2.4 U1-U4).

All reference joins are ID-keyed equi-joins (`legacy/modeling.py:77-79`,
`experiments/utils/test.py:31-33`); positional alignment patterns (J4) are
re-keyed on explicit keys — Spark guarantees no row order.

Scale notes: dimension sides (customer vs orders at TPC-H ratios) are
broadcast — verified in tests/test_plans.py that the plan shows
BroadcastHashJoin, not SortMergeJoin, so the big fact side never shuffles.
Unions are metadata-only (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


# --- J1: X ⋈ y on ID (legacy/modeling.py:77-79) -----------------------------
@query(
    "join_xy",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment,
           c.c_acctbal, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "c_acctbal", "o_totalprice")


# Derived truth/pred frames reused by J2/J4, metrics, and scalar_funcs —
# defined in _shared (non-registering) so importing them doesn't pin this
# module to the front of the driver's coverage window.
from ._shared import _PRED_SQL, _TRUTH_SQL, pred_frame, truth_frame  # noqa: E402


# --- J2: predictions ⋈ truth with suffixes (experiments/utils/test.py:31-33) -
@query(
    "join_pred_truth",
    oracle=f"""
    WITH t AS ({_TRUTH_SQL}), p AS ({_PRED_SQL})
    SELECT t.id, t.label AS label_true, p.pred AS label_pred, p.prob
    FROM t JOIN p ON t.id = p.id
    """,
)
def join_pred_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = truth_frame(spark, sf_dir).withColumnRenamed("label", "label_true")
    p = pred_frame(spark, sf_dir).withColumnRenamed("pred", "label_pred")
    return t.join(p, "id").select("id", "label_true", "label_pred", "prob")


# --- J3: row alignment via inner join + explicit order (legacy:211-212) -----
@query(
    "align_inner",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.n_orders
    FROM customer c
    JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """,
)
def align_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "inner")
        .select("c_custkey", "c_acctbal", "n_orders")
        .orderBy("c_custkey")
    )


# --- J4: sort-then-positional match, re-keyed (experiments/utils/test.py:25-29)
@query(
    "sorted_zip",
    oracle=f"""
    WITH t AS ({_TRUTH_SQL}), p AS ({_PRED_SQL})
    SELECT count(*) AS n_total,
           CAST(sum(CAST(t.label = p.pred AS BIGINT)) AS BIGINT) AS n_equal
    FROM t JOIN p ON t.id = p.id
    """,
)
def sorted_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference zips two ID-sorted frames positionally; keyed join here."""
    t = truth_frame(spark, sf_dir)
    p = pred_frame(spark, sf_dir)
    j = t.join(p, "id")
    return j.agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("label") == F.col("pred")).cast("bigint")).alias("n_equal"),
    )


# --- U1: union over schema intersection (1-1.data_processing.ipynb:1240-1249)
@query(
    "union_rows",
    oracle="""
    WITH y22 AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
             CAST(year(o_orderdate) AS INT) AS o_year
      FROM orders WHERE year(o_orderdate) <= 1998
    ), y23 AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
             CAST(year(o_orderdate) AS INT) AS o_year
      FROM orders WHERE year(o_orderdate) > 1998
    )
    SELECT * FROM y22 UNION ALL SELECT * FROM y23
    """,
)
def union_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two 'yearly extracts' with differing extra columns, unioned over the
    intersection of their schemas preserving the first side's column order."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    df22 = orders.filter(F.col("o_year") <= 1998).drop("o_orderpriority", "o_orderdate")
    df23 = orders.filter(F.col("o_year") > 1998).drop("o_orderdate").withColumn(
        "extra_col", F.lit(1)
    )
    common = [c for c in df22.columns if c in set(df23.columns)]
    return df22.select(*common).unionByName(df23.select(*common))


# --- U2: union with provenance column (legacy/modeling.py:77-82) ------------
@query(
    "union_labeled",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'train' AS split
    FROM orders WHERE o_orderkey % 5 <> 4
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'test' AS split
    FROM orders WHERE o_orderkey % 5 = 4
    """,
)
def union_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    train = orders.filter(F.col("o_orderkey") % 5 != 4).withColumn("split", F.lit("train"))
    test = orders.filter(F.col("o_orderkey") % 5 == 4).withColumn("split", F.lit("test"))
    return train.unionByName(test)


# --- U3: horizontal concat re-keyed as a join (src/ensemble/stacking.py:86-87)
@query(
    "concat_cols",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice, b.l_discount
    FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem) a
    JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    """,
)
def concat_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.column_stack semantics: meta-feature columns joined on the row key
    (never positional — Spark has no stable row order)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", "l_linenumber", "l_quantity")
    b = li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    return a.join(b, ["l_orderkey", "l_linenumber"])


# --- U4: column-name intersection (basecode.ipynb cell 1; legacy:89) --------
@query(
    "intersect_names",
    oracle="""
    SELECT col FROM (
      SELECT 'o_custkey' AS col UNION ALL SELECT 'o_orderkey'
      UNION ALL SELECT 'o_orderstatus' UNION ALL SELECT 'o_totalprice'
    ) ORDER BY col
    """,
)
def intersect_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-level set algebra: shared column names of two projections.

    Driver-side over df.columns (schemas are driver metadata); the oracle
    enumerates the deterministic expected set for the fixture schema.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders.drop("o_orderpriority", "o_orderdate")
    b = orders.drop("o_orderdate").withColumn("extra", F.lit(1)).drop("o_orderpriority")
    b = b.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "extra")
    common = sorted(set(a.columns) & set(b.columns))
    return spark.createDataFrame([(c,) for c in common], "col string").orderBy("col")


# --- skew-salted fact⋈dim join (operators/skew.py as a first-class query) ----
@query(
    "join_salted_skew",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): the fact side carries
    salt = pmod(hash(orderkey), 16), the dim side is exploded 16× — the
    join key (partkey, salt) spreads any hot partkey over 16 partitions.
    Salting is semantically invisible, so the oracle is the PLAIN join —
    hash-matching proves the salt introduced no duplication or loss.

    Oracle decimal scale is 6, mirroring dsum's decimal(25,6), NOT a higher
    scale: DuckDB's DECIMAL->DOUBLE cast double-rounds once the scaled
    integer exceeds 2^53, so a scale-10 sum of ~1e9 money values (1e19
    scaled) drifts a last ulp from Spark's correctly-rounded cast — caught
    by the full sf0.1 parity sweep (round 4). Scale 6 keeps per-brand sums
    ~1e15 < 2^53 and quantizes 2dp money identically in both engines."""
    from ..functions import numeric as N
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = salted_join(
        li.select("l_orderkey", "l_partkey", "l_extendedprice"),
        part.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
        on="l_partkey",
        salt_from="l_orderkey",
    )
    return (
        j.groupBy("p_brand")
        .agg(F.count("*").alias("n"), N.dsum("l_extendedprice").alias("sum_price"))
        .orderBy("p_brand")
    )


# --- bucketed co-located fact⋈fact join (operators/bucketing.py) -------------
@query(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join through BUCKETED layout (operators/bucketing.py):
    both sides are written hash-bucketed 8 ways on the order key, so the
    join itself plans with NO Exchange on either side — the shuffle was
    paid once at write time and amortizes across every later join/groupBy
    on that key (the Exchange elision is asserted in
    tests/test_bucketing.py). The oracle is the plain join: layout must
    not change results."""
    import tempfile
    import uuid

    from ..functions import numeric as N
    from ..operators.bucketing import colocated_join, write_bucketed

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"bucketed_{tag}_")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    lt, ot = f"li_b_{tag}", f"ord_b_{tag}"
    write_bucketed(li, lt, f"{base}/li", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, ot, f"{base}/ord", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"])
    j = colocated_join(spark, lt, ot, ["l_orderkey"])
    return (
        j.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), N.dsum("l_quantity").alias("sum_qty"))
        .orderBy("o_orderstatus")
    )


# --- temporal joins (operators/temporal.py; no reference site — extension) ---
@query(
    "join_asof",
    oracle="""
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           l.value AS click_value, r.event_id AS purchase_id,
           r.value AS purchase_value, epoch_us(r.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's LATEST purchase at or before it
    (null if none). Spark side is the union-and-carry asof_join
    (operators/temporal.py) — one key-partitioned window, no inequality
    join; the oracle is DuckDB's NATIVE ASOF JOIN, a genuinely independent
    implementation of the semantics."""
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(
        clicks, purchases, on=["user_id"], ts="ts", right_cols=["event_id", "value", "ts"]
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("click_value"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").alias("purchase_value"),
        F.unix_micros("ts_r").alias("purchase_ts_us"),
    )


@query(
    "join_range",
    oracle="""
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           l.value AS click_value, r.event_id AS purchase_id,
           r.value AS purchase_value, epoch_us(r.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 10 MINUTE
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (click, purchase) pairs per user within a 10-minute lookback.
    Spark side is the binned range join (operators/temporal.py): epoch
    bins turn the inequality into an equi-join on (user, bin) with a 2x
    probe fan-out — ordinary hash shuffles, never BroadcastNestedLoop.
    DuckDB plans the same predicate as an IEJoin — independent engine,
    same rows."""
    from ..operators.temporal import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = range_join_binned(
        clicks,
        purchases,
        on=["user_id"],
        ts="ts",
        horizon_s=600,
        right_cols=["event_id", "value", "ts"],
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("click_value"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").alias("purchase_value"),
        F.unix_micros("ts_r").alias("purchase_ts_us"),
    )


# --- forward as-of: each click's NEXT purchase -------------------------------
@query(
    "join_asof_forward",
    oracle="""
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           r.event_id AS purchase_id, epoch_us(r.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's EARLIEST purchase at or after it
    (the time-to-next-conversion primitive; join_asof's mirror). Forward
    direction reuses the union-and-carry asof operator on NEGATED
    epoch-microseconds — latest right with -ts_r <= -ts_l IS the earliest
    right with ts_r >= ts_l — so the plan stays one key-partitioned
    window, no inequality join. Oracle: DuckDB's native forward ASOF
    (ON l.ts <= r.ts), an independent implementation."""
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").selectExpr(
        "event_id", "user_id", "unix_micros(ts) AS us"
    ).withColumn("tsn", F.expr("-us"))
    purchases = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "event_id", "user_id", "unix_micros(ts) AS us"
    ).withColumn("tsn", F.expr("-us"))
    j = asof_join(
        clicks, purchases, on=["user_id"], ts="tsn",
        right_cols=["event_id", "us"],
    )
    return j.selectExpr(
        "event_id",
        "user_id",
        "us AS ts_us",
        "event_id_r AS purchase_id",
        "us_r AS purchase_ts_us",
    )


# --- nearest as-of: pandas merge_asof(direction='nearest') -------------------
@query(
    "join_asof_nearest",
    oracle="""
    WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
               FROM events WHERE event_type = 'click'),
    r AS (SELECT event_id, user_id, epoch_us(ts) AS pts
          FROM events WHERE event_type = 'purchase'),
    best AS (
      SELECT event_id, user_id, ts_us, pid, pts FROM (
        SELECT l.event_id, l.user_id, l.ts_us, r.event_id AS pid, r.pts,
               row_number() OVER (
                 PARTITION BY l.event_id
                 ORDER BY abs(r.pts - l.ts_us), r.pts, r.event_id) AS rn
        FROM l JOIN r ON l.user_id = r.user_id
      ) WHERE rn = 1
    )
    SELECT l.event_id, l.user_id, l.ts_us,
           b.pid AS purchase_id, b.pts AS purchase_ts_us
    FROM l LEFT JOIN best b ON l.event_id = b.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's NEAREST purchase in time — pandas
    ``merge_asof(direction='nearest')``, the third asof direction after
    join_asof (backward) and join_asof_forward. Spark side composes the two
    directional union-and-carry asof joins (each one key-partitioned
    window, no inequality join) and picks the closer side per row; a
    distance tie takes the earlier purchase (pts_b <= ts <= pts_f makes
    that the backward match, matching the oracle's ORDER BY abs, pts). The
    oracle is an independent brute-force per-user argmin, deliberately NOT
    two ASOF joins."""
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").selectExpr(
        "event_id", "user_id", "unix_micros(ts) AS us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "event_id", "user_id", "unix_micros(ts) AS us"
    )
    back = asof_join(
        clicks, purchases, on=["user_id"], ts="us", right_cols=["event_id", "us"]
    ).selectExpr("event_id", "user_id", "us", "event_id_r AS pid_b", "us_r AS pts_b")
    fwd = asof_join(
        clicks.withColumn("tsn", F.expr("-us")),
        purchases.withColumn("tsn", F.expr("-us")),
        on=["user_id"],
        ts="tsn",
        right_cols=["event_id", "us"],
    ).selectExpr("event_id", "event_id_r AS pid_f", "us_r AS pts_f")
    both = back.join(fwd, "event_id")
    pick_b = F.col("pts_f").isNull() | (
        F.col("pts_b").isNotNull()
        & (F.col("us") - F.col("pts_b") <= F.col("pts_f") - F.col("us"))
    )
    return both.select(
        "event_id",
        "user_id",
        F.col("us").alias("ts_us"),
        F.when(pick_b, F.col("pid_b")).otherwise(F.col("pid_f")).alias("purchase_id"),
        F.when(pick_b, F.col("pts_b")).otherwise(F.col("pts_f")).alias("purchase_ts_us"),
    )


# --- cogrouped-pandas as-of merge (API twin of join_asof) --------------------
@query(
    "cogroup_asof_pandas",
    oracle="""
    SELECT l.user_id,
           count(*) AS n_clicks,
           CAST(sum(CAST(r.event_id IS NOT NULL AS INT)) AS BIGINT)
             AS n_matched,
           CAST(sum(coalesce(r.event_id, 0)) AS BIGINT) AS sum_purchase_ids
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    GROUP BY l.user_id
    """,
)
def cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join executed through the COGROUPED Arrow interface —
    the per-key escape hatch for temporal logic the relational
    union-and-carry operator (join_asof) can't host (model scoring
    between the match and the emit, say). Same semantics, independently
    verified: the oracle is DuckDB's native ASOF JOIN, and the relational
    twin covers the plan-quality side. Output is a per-user match summary
    (counts + id checksum), so the comparison pins every matched row
    without hashing wide rows.

    Cogroup key is ``pmod(user_id, B)`` (B = shuffle partitions,
    scale-adaptive), NOT the raw user_id: cogrouped ``applyInPandas``
    pays per-GROUP Arrow framing + Python dispatch, so per-user groups
    put the whole query's cost in group overhead (~12s at sf0.1 with
    merge_asof per user; still ~7s after switching the inner merge to
    numpy). Bucketing users B-ways amortizes that overhead ~N_users/B
    times while keeping every user's rows in exactly one group — the
    per-user merge inside the kernel is the IDENTICAL stable-sort +
    ``searchsorted(right_ts, ts, 'right')-1`` backward as-of, run per
    user slice of the lexsorted bucket (optimization r07, guide §4.2).

    Scale shape: ONE hash shuffle of each side on the bucket key; each
    bucket pair is an Arrow batch; no global sort."""
    import numpy as np
    import pandas as pd

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter("event_type = 'click'")
        .select("user_id", "ts")
        .withColumn("b", F.pmod("user_id", F.lit(n_buckets)))
    )
    purchases = (
        ev.filter("event_type = 'purchase'")
        .select("user_id", "ts", "event_id")
        .withColumn("b", F.pmod("user_id", F.lit(n_buckets)))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(
                {"user_id": [], "n_clicks": [], "n_matched": [],
                 "sum_purchase_ids": []}
            )
        lu = left["user_id"].to_numpy()
        lts = left["ts"].to_numpy()
        lo = np.argsort(lu, kind="stable")
        lu, lts = lu[lo], lts[lo]
        users, lstarts = np.unique(lu, return_index=True)
        lends = np.append(lstarts[1:], len(lu))
        if not len(right):
            # a side absent from the whole bucket arrives as a
            # COLUMN-LESS empty frame — guard before touching columns
            return pd.DataFrame(
                {
                    "user_id": users.astype("int64"),
                    "n_clicks": (lends - lstarts).astype("int64"),
                    "n_matched": 0,
                    "sum_purchase_ids": 0,
                }
            )
        ru = right["user_id"].to_numpy()
        rts = right["ts"].to_numpy()
        rid = right["event_id"].to_numpy()
        # lexsort is stable: within (user, ts) ties the original row order
        # survives, exactly like the per-user stable argsort this replaces
        ro = np.lexsort((rts, ru))
        ru, rts, rid = ru[ro], rts[ro], rid[ro]
        rstarts = np.searchsorted(ru, users, side="left")
        rends = np.searchsorted(ru, users, side="right")
        out_n, out_m, out_s = [], [], []
        for i in range(len(users)):
            seg_ts = lts[lstarts[i]:lends[i]]
            r_ts = rts[rstarts[i]:rends[i]]
            if len(r_ts):
                idx = np.searchsorted(r_ts, seg_ts, side="right") - 1
                matched = idx >= 0
                out_m.append(int(matched.sum()))
                out_s.append(int(rid[rstarts[i]:rends[i]][idx[matched]].sum()))
            else:
                out_m.append(0)
                out_s.append(0)
            out_n.append(int(lends[i] - lstarts[i]))
        return pd.DataFrame(
            {
                "user_id": users.astype("int64"),
                "n_clicks": out_n,
                "n_matched": out_m,
                "sum_purchase_ids": out_s,
            }
        )

    return (
        clicks.groupBy("b")
        .cogroup(purchases.groupBy("b"))
        .applyInPandas(
            merge,
            "user_id long, n_clicks long, n_matched long,"
            " sum_purchase_ids long",
        )
    )


# --- J9 extension: interval-overlap join via bin equi-join -------------------
_IV_GAP_US = 30 * 60 * 1_000_000  # session inactivity gap (pipeline_ops twin)
_IV_HOUR_US = 3_600 * 1_000_000
_IV_TOP_BURSTS = 5


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    flagged AS (
      SELECT user_id, us,
        CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {_IV_GAP_US}
             THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
      SELECT user_id,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id,
             us
      FROM flagged
    ),
    iv AS (
      SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
      FROM sess GROUP BY user_id, session_id
    ),
    bursts AS (
      SELECT h FROM (
        SELECT us // {_IV_HOUR_US} AS h, count(*) AS cnt
        FROM e GROUP BY h
        ORDER BY cnt DESC, h LIMIT {_IV_TOP_BURSTS}
      )
    )
    SELECT iv.user_id, iv.session_id, b.h AS burst_hour,
           CAST(least(iv.e_us, (b.h + 1) * {_IV_HOUR_US})
                - greatest(iv.s_us, b.h * {_IV_HOUR_US}) AS BIGINT)
             AS overlap_us
    FROM iv JOIN bursts b
      ON b.h * {_IV_HOUR_US} <= iv.e_us
     AND iv.s_us < (b.h + 1) * {_IV_HOUR_US}
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval OVERLAP join — the shape join_asof (point to
    latest) and join_range (point in window) don't cover: per-user
    activity sessions matched to the corpus-wide burst hours they touch,
    with the overlap duration. The oracle states it as the natural
    inequality join (DuckDB plans an IEJoin); the Spark side turns it
    into an EQUI-join by exploding each session into the hour bins it
    covers (sequence(floor(s/H), floor(e/H)) — exactly the rows where
    h·H <= e AND s < (h+1)·H) and joining bins to the broadcast burst
    dim — hash joins only, no BroadcastNestedLoop over raw sessions.

    Scale: the session build is one shuffle by user; bin fan-out is
    |session| / 1h (bounded — pick the bin width at the interval scale);
    the burst dim is top-{_IV_TOP_BURSTS} by construction, so it always
    broadcasts. Overlap can be 0 us only when a session's closed end
    touches a burst's half-open start; both engines keep the row."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(ts)").alias("us")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > _IV_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_s").over(wc))
    iv = sess.groupBy("user_id", "session_id").agg(
        F.expr("min(us) AS s_us"), F.expr("max(us) AS e_us")
    )
    bursts = (
        ev.groupBy(F.expr(f"us div {_IV_HOUR_US}").alias("h"))
        .agg(F.expr("count(*) AS cnt"))
        .orderBy(F.desc("cnt"), F.asc("h"))
        .limit(_IV_TOP_BURSTS)
        .select("h")
    )
    binned = iv.select(
        "user_id",
        "session_id",
        "s_us",
        "e_us",
        F.explode(
            F.expr(f"sequence(s_us div {_IV_HOUR_US}, e_us div {_IV_HOUR_US})")
        ).alias("h"),
    )
    return binned.join(F.broadcast(bursts), "h").selectExpr(
        "user_id",
        "session_id",
        "h AS burst_hour",
        f"CAST(least(e_us, (h + 1) * {_IV_HOUR_US})"
        f" - greatest(s_us, h * {_IV_HOUR_US}) AS BIGINT) AS overlap_us",
    )


# --- spatial radius self-join via grid hashing --------------------------------
# No all-pairs distance join survives at scale; the standard shape is grid
# bucketing: hash each point to an r-sized cell, probe only the 3x3 cell
# neighborhood (which provably contains every pair within r), then apply the
# exact distance predicate. Coordinates are deterministic hash-uniforms per
# customer so the op is fixture-independent and oracle-checkable.
_SPJ_R = 0.02
_SPJ_M = 1_000_000


def _spj_points_sql() -> str:
    from .dedup import _h_sql

    hx = _h_sql("concat_ws('', 'sx:', CAST(c_custkey AS VARCHAR))")
    hy = _h_sql("concat_ws('', 'sy:', CAST(c_custkey AS VARCHAR))")
    return f"""
      SELECT c_custkey AS id,
             CAST({hx} % {_SPJ_M} AS DOUBLE) / {_SPJ_M}.0 AS x,
             CAST({hy} % {_SPJ_M} AS DOUBLE) / {_SPJ_M}.0 AS y
      FROM customer
    """


@query(
    "join_spatial_radius",
    oracle=f"""
    WITH pts AS ({_spj_points_sql()}),
    cells AS (
      SELECT id, x, y,
             CAST(floor(x / {_SPJ_R}) AS BIGINT) AS cx,
             CAST(floor(y / {_SPJ_R}) AS BIGINT) AS cy
      FROM pts
    ),
    probe AS (
      SELECT c.id, c.x, c.y, c.cx + dx.d AS cx, c.cy + dy.d AS cy
      FROM cells c,
           (SELECT unnest([-1, 0, 1]) AS d) dx,
           (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist
      FROM probe a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
      WHERE a.id < b.id
    ),
    hits AS (SELECT * FROM pairs WHERE dist <= {_SPJ_R})
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_candidates,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(round(dist, 9) AS DECIMAL(25,12))) AS DOUBLE)
                 / nullif(count(*), 0), 6) AS avg_dist
    FROM hits
    """,
)
def join_spatial_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join (r = {r}) on hash-uniform customer coordinates via
    grid hashing: points land in r-sized cells, each point probes only its
    3x3 cell neighborhood (a superset of all true within-r pairs by the
    triangle bound), and the exact distance predicate filters. Emits the
    candidate count next to the hit count — the grid's selectivity audit
    (candidates ~ 9·n·density vs the n² a naive cross join would scan).

    Scale shape: the probe is a pure equi-join on (cx, cy) — shuffle
    partitioned by cell, no cross join anywhere; skewed cells would salt
    exactly like any hot equi-join key (skew_salt_plan's contract). The
    only doubles are coordinate arithmetic identical in both engines;
    avg_dist sums 9dp-quantized decimals (order-free).""".format(r=_SPJ_R)
    from ..functions import numeric as N
    from .dedup import _h_spark

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (
            (
                _h_spark(
                    F.concat_ws("", F.lit("sx:"), F.col("c_custkey").cast("string"))
                )
                % _SPJ_M
            ).cast("double")
            / float(_SPJ_M)
        ).alias("x"),
        (
            (
                _h_spark(
                    F.concat_ws("", F.lit("sy:"), F.col("c_custkey").cast("string"))
                )
                % _SPJ_M
            ).cast("double")
            / float(_SPJ_M)
        ).alias("y"),
    )
    cells = pts.select(
        "id",
        "x",
        "y",
        F.floor(F.col("x") / _SPJ_R).cast("bigint").alias("cx"),
        F.floor(F.col("y") / _SPJ_R).cast("bigint").alias("cy"),
    )
    offs = spark.range(3).selectExpr("CAST(id - 1 AS BIGINT) AS d")
    probe = (
        cells.crossJoin(F.broadcast(offs.selectExpr("d AS dx")))
        .crossJoin(F.broadcast(offs.selectExpr("d AS dy")))
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    pairs = (
        probe.join(b, ["cx", "cy"])
        .filter(F.col("id") < F.col("id_b"))
        .select(
            F.sqrt(
                (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
                + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb"))
            ).alias("dist")
        )
    )
    n_pts = pts.agg(F.count("*").cast("bigint").alias("n_points"))
    n_cand = pairs.agg(F.count("*").cast("bigint").alias("n_candidates"))
    hits = pairs.filter(F.col("dist") <= _SPJ_R).agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(N.fround(F.col("dist"), 9).cast("decimal(25,12)")).cast("double")
            / F.nullif(F.count("*").cast("double"), F.lit(0.0)),
            6,
        ).alias("avg_dist"),
    )
    return (
        n_pts.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(hits))
        .select("n_points", "n_candidates", "n_pairs", "avg_dist")
    )
