"""Behavioral / product analytics over `events` (extension family: the
event-log analyses a training-data or product pipeline runs next to the
SURVEY §2 inventory): cohort retention, ordered funnels, key-skew audit.

All-integer outputs (day indexes, counts, ppm shares) — bit-stable across
engines with zero float conventions needed.

Scale notes (100 TB events):
- cohort_retention: (user, day) distinct map-side combines before its
  shuffle; the cohort min is a whole-partition window keyed by user_id (no
  global sort); the final rollup is a plain hash aggregate.
- funnel_steps: each stage filters to one event_type BEFORE its shuffle
  join, so every join input is a shrinking per-user aggregate keyed on
  user_id; AQE picks shuffle-hash vs broadcast per stage.
- key_skew_audit: per-key counts + TakeOrderedAndProject top-k (no global
  sort materializes); this is the diagnostic you run BEFORE choosing the
  salting factor in operators/skew.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..registry import query
from ..sources import load_table

# epoch-microseconds per day — day indexes stay pure bigint arithmetic
# (timezone- and date-type-free on both engines)
_US_DAY = 86_400_000_000


# --- weekly cohort retention matrix -----------------------------------------
@query(
    "cohort_retention",
    oracle=f"""
    WITH daily AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_US_DAY} AS d FROM events
    ),
    c AS (
      SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort_day
      FROM daily
    )
    SELECT cohort_day, CAST((d - cohort_day) // 7 AS INT) AS week,
           count(DISTINCT user_id) AS n_users
    FROM c GROUP BY cohort_day, week
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in week k after their first-seen day, per first-seen-day
    cohort. Day index = epoch_us div 86400e6 (integer, TZ-free)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.expr(f"unix_micros(ts) div {_US_DAY}").alias("d")
    ).distinct()
    per_user = Window.partitionBy("user_id")
    c = daily.withColumn("cohort_day", F.min("d").over(per_user))
    return c.select(
        "cohort_day",
        F.expr("cast((d - cohort_day) div 7 as int)").alias("week"),
        "user_id",
    ).groupBy("cohort_day", "week").agg(
        F.countDistinct("user_id").alias("n_users")
    )


# --- ordered funnel: signup -> view -> click -> purchase --------------------
_FUNNEL = ("signup", "view", "click", "purchase")


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s3 ON e.user_id = s3.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
    ),
    u AS (
      SELECT 1 AS stage, user_id FROM s1
      UNION ALL SELECT 2, user_id FROM s2
      UNION ALL SELECT 3, user_id FROM s3
      UNION ALL SELECT 4, user_id FROM s4
    )
    SELECT CAST(stage AS INT) AS stage, count(*) AS n_users
    FROM u GROUP BY stage
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users complete each prefix of signup->view->click->purchase
    with strictly increasing timestamps. Stage k+1 = min event time of the
    next type AFTER the user's stage-k completion time (sequential
    conditional-min joins; strict `>` on microsecond timestamps)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(prev: DataFrame, etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .where(F.col("ts") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )

    stages = [
        ev.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    ]
    for etype in _FUNNEL[1:]:
        stages.append(first_after(stages[-1], etype))
    labeled = [
        s.select(F.lit(i + 1).alias("stage"), "user_id")
        for i, s in enumerate(stages)
    ]
    return (
        reduce(DataFrame.unionByName, labeled)
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


# --- key-skew audit: the pre-flight check for salted joins ------------------
@query(
    "key_skew_audit",
    oracle="""
    WITH c AS (
      SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY l_suppkey
    ),
    t AS (SELECT count(*) AS total FROM lineitem)
    SELECT l_suppkey, n_rows, n_rows * 1000000 // total AS share_ppm
    FROM c, t
    ORDER BY n_rows DESC, l_suppkey LIMIT 10
    """,
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest join keys with their ppm share of the fact table —
    the measurement that decides broadcast vs salt (operators/skew.py).
    Integer ppm (`div`) keeps the share bit-stable; orderBy+limit compiles
    to TakeOrderedAndProject (per-partition heap + driver merge, no global
    sort). n_rows * 1e6 stays under 2^63 to ~9e12 fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_suppkey").agg(F.count("*").alias("n_rows"))
    tot = li.groupBy().agg(F.count("*").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "l_suppkey",
            "n_rows",
            F.expr("n_rows * 1000000 div total").alias("share_ppm"),
        )
        .orderBy(F.desc("n_rows"), "l_suppkey")
        .limit(10)
    )


# --- rolling 7-day active users (WAU per day) -------------------------------
@query(
    "rolling_wau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_US_DAY} AS d FROM events
    ),
    contrib AS (
      SELECT DISTINCT user_id, unnest(generate_series(d, d + 6)) AS d
      FROM ud
    ),
    bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM ud)
    SELECT c.d, count(DISTINCT c.user_id) AS wau
    FROM contrib c, bounds b
    WHERE c.d BETWEEN b.mn AND b.mx
    GROUP BY c.d
    """,
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users for every day — the WAU curve. COUNT
    DISTINCT over a sliding window isn't directly expressible, so each
    (user, day) pair CONTRIBUTES itself to the 7 days it keeps the user
    active in (a narrow ×7 sequence-explode — no windows at all), then one
    distinct count per day. Exact, shuffle-bounded by (day, user)
    distincts with map-side combine; days outside the observed range are
    clipped via the broadcast bounds row."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr(f"unix_micros(ts) div {_US_DAY}").alias("d")
    ).distinct()
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("d")
    ).distinct()
    bounds = ud.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("d").between(F.col("mn"), F.col("mx")))
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


# --- hour-of-day seasonality profile ----------------------------------------
@query(
    "hourly_seasonality",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
           count(*) AS n,
           count(*) * 1000000 // (SELECT count(*) FROM events) AS share_ppm
    FROM events GROUP BY hour_of_day, event_type
    """,
)
def hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type traffic profile with ppm shares — the
    seasonality diagnostic behind load-aware scheduling and anomaly
    baselines. Pure integer counts and integer-division shares (UTC
    session, so hour() agrees across engines); one hash aggregate to
    ≤ 24×|types| rows plus a broadcast scalar total."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
    ).agg(F.count("*").alias("n"))
    total = ev.agg(F.count("*").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "hour_of_day",
        "event_type",
        "n",
        F.expr("n * 1000000 div total").alias("share_ppm"),
    )


# --- time-weighted average (interval-weighted signal mean per user) ----------
@query(
    "time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t_next
      FROM events
    ),
    seg AS (
      SELECT user_id, value, t_next - t_us AS dur_us
      FROM seq WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           round(CAST(sum(CAST(CAST(round(value * 1000000) AS BIGINT)
                               AS DECIMAL(38,0)) * dur_us)
                      AS DOUBLE)
                 / 1000000.0 / sum(dur_us), 6) AS twa_value
    FROM seg GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value signal: every reading
    holds until the next one (step interpolation), so the mean weights each
    value by its holding duration — the correct average for irregularly
    sampled telemetry, where the arithmetic mean over-counts bursts. One
    lead() window per user partition (key-partitioned, no global sort) and
    one aggregation; the value x duration products are integer-scaled so
    the weighted sum is order-independent and bit-equal to the oracle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    )
    seg = seq.filter(F.col("t_next").isNotNull()).select(
        "user_id",
        "value",
        (F.col("t_next") - F.col("t_us")).alias("dur_us"),
    )
    return seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum("dur_us").alias("total_us"),
        F.round(
            F.sum(
                # decimal product: value-micros x duration-micros reaches
                # ~1e20 for long idle gaps, past bigint — exactness via
                # DECIMAL(38,0), still order-independent
                N.fround_int(F.col("value") * 1000000)
                .cast("decimal(38,0)")
                * F.col("dur_us")
            ).cast("double")
            / 1000000.0
            / F.sum("dur_us"),
            6,
        ).alias("twa_value"),
    )


# --- event-type transition matrix (first-order Markov behavior model) --------
@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS src, next_type AS dst, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY src), 6) AS p
    FROM trans
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of user behavior: per-user event sequences
    (key-partitioned lead() — no global sort) reduce to (src, dst)
    transition counts and row-normalized probabilities — the navigation /
    funnel diagnostic behind 'what do users do after X'. Two aggregations
    over the pair space (|event_types|^2 rows, tiny), both map-side
    partial; the row normalization windows over the src marginal, which is
    at most |event_types| groups."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return trans.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wsrc), 6).alias("p"),
    )


# --- seasonal decomposition of the daily order series ------------------------
@query(
    "seasonal_decompose_daily",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS d, count(*) AS x
      FROM orders GROUP BY d
    ),
    trend AS (
      SELECT d, x,
             sum(x) OVER (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s,
             count(x) OVER (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c
      FROM daily
    ),
    det AS (
      SELECT d % 7 AS dow,
             (x * c - s) * (420 // c) AS det420
      FROM trend
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(det420) AS BIGINT) AS sum_det420,
           round(CAST(sum(det420) AS DOUBLE) / (420.0 * count(*)), 6)
             AS seasonal
    FROM det GROUP BY dow
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend/seasonal decomposition of the daily order count: centered
    7-day moving-average trend (RANGE frame on the epoch-day key, so
    calendar gaps shrink the window instead of sliding past them), then
    day-of-week seasonal means of the detrended series. Exactness: the
    detrended value (x − s/c) is a rational with denominator c ∈ 1..7;
    scaling by 420/c (420 = lcm 1..7) makes every term an INTEGER, so
    the seasonal sums are order-independent and bit-equal across engines
    — one double division at the end. The centered frame is a broadcast
    band self-join over the daily table, whose size is bounded by the
    calendar span of the data (~2.4k rows here), not by row count — no
    unpartitioned window anywhere (bounded_seq convention)."""
    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate lands as TIMESTAMP_NTZ; session TZ is pinned UTC so the
    # TIMESTAMP cast is instant-preserving (same convention as tables.py)
    daily = orders.groupBy(
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}"
        ).alias("d")
    ).agg(F.count("*").alias("x"))
    # centered RANGE(-3, 3) frame as a broadcast band self-join over the
    # calendar-bounded daily table — no unpartitioned window (bounded_seq
    # convention); identical to sum/count OVER (ORDER BY d RANGE -3..3)
    nbr = daily.select(F.col("d").alias("d2"), F.col("x").alias("x2"))
    trend = (
        daily.join(
            F.broadcast(nbr),
            (F.col("d2") >= F.col("d") - 3) & (F.col("d2") <= F.col("d") + 3),
        )
        .groupBy("d", "x")
        .agg(F.sum("x2").alias("s"), F.count("x2").alias("c"))
    )
    det = trend.select(
        (F.col("d") % 7).alias("dow"),
        (
            (F.col("x") * F.col("c") - F.col("s"))
            * (F.lit(420) / F.col("c")).cast("bigint")
        ).alias("det420"),
    )
    return det.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum("det420").alias("sum_det420"),
        F.round(
            F.sum("det420").cast("double") / (420.0 * F.count("*")), 6
        ).alias("seasonal"),
    )


# --- per-user activity-burst detection ---------------------------------------
_US_HOUR = 3_600_000_000


@query(
    "events_burst_zscore",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, epoch_us(ts) // {_US_HOUR} AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY user_id, h
    ),
    stats AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss
      FROM hourly GROUP BY user_id
    ),
    z AS (
      SELECT h.user_id, h.x,
             CAST(s.s AS DOUBLE) / s.n_hours AS mean,
             sqrt((CAST(s.ss AS DOUBLE)
                   - CAST(s.s AS DOUBLE) * s.s / s.n_hours)
                  / (s.n_hours - 1.0)) AS std,
             s.n_hours
      FROM hourly h JOIN stats s ON h.user_id = s.user_id
      WHERE s.n_hours >= 3
    )
    SELECT user_id,
           CAST(max(n_hours) AS BIGINT) AS n_hours,
           CAST(sum(CAST(std > 0 AND (x - mean) / std > 3.0 AS BIGINT))
                AS BIGINT) AS n_burst_hours,
           round(max(CASE WHEN std > 0 THEN (x - mean) / std END), 6)
             AS max_z
    FROM z GROUP BY user_id
    """,
)
def events_burst_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-burst audit: per user, hours whose event count exceeds
    3 sigma of that user's own hourly baseline — the rate-anomaly pass a
    behavioral pipeline runs for abuse/bot detection. Two key-partitioned
    aggregations ((user, hour) counts, then per-user moments) and one
    equi-join back — all map-side combinable, nothing global. Mean/std
    derive from integer sufficient statistics, so the z comparisons are
    identical doubles in both engines; users with fewer than 3 active
    hours are excluded (no meaningful baseline)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_HOUR}").alias("h"),
    ).agg(F.count("*").alias("x"))
    stats = hourly.groupBy("user_id").agg(
        F.count("*").alias("n_hours"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    ).filter(F.col("n_hours") >= 3)
    mean = F.col("s").cast("double") / F.col("n_hours")
    std = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_hours"))
        / (F.col("n_hours") - 1.0)
    )
    z = hourly.join(stats, "user_id").select(
        "user_id",
        "x",
        mean.alias("mean"),
        std.alias("std"),
        "n_hours",
    )
    zexpr = (F.col("x") - F.col("mean")) / F.col("std")
    return z.groupBy("user_id").agg(
        F.max("n_hours").alias("n_hours"),
        F.sum(((F.col("std") > 0) & (zexpr > 3.0)).cast("bigint")).alias(
            "n_burst_hours"
        ),
        F.round(F.max(F.when(F.col("std") > 0, zexpr)), 6).alias("max_z"),
    )


# --- RFM customer segmentation ----------------------------------------------
_RFM_EPOCH = "1992-01-01"


@query(
    "customer_rfm",
    oracle=f"""
    WITH per_c AS (
      SELECT o_custkey,
             CAST(date_diff('day', DATE '{_RFM_EPOCH}',
                            CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS r,
             count(*) AS f,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS m
      FROM orders GROUP BY o_custkey
    ),
    med AS (
      SELECT quantile_cont(CAST(r AS DOUBLE), 0.5) AS mr,
             quantile_cont(CAST(f AS DOUBLE), 0.5) AS mf,
             quantile_cont(CAST(m AS DOUBLE), 0.5) AS mm
      FROM per_c
    )
    SELECT concat(CASE WHEN CAST(r AS DOUBLE) >= mr THEN 'R+' ELSE 'R-' END,
                  CASE WHEN CAST(f AS DOUBLE) >= mf THEN 'F+' ELSE 'F-' END,
                  CASE WHEN CAST(m AS DOUBLE) >= mm THEN 'M+' ELSE 'M-' END)
             AS segment,
           count(*) AS n_customers,
           CAST(sum(m) AS DOUBLE) / (100.0 * count(*)) AS avg_monetary
    FROM per_c, med
    GROUP BY 1
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since epoch of the
    last order), frequency (order count), monetary (exact cents), split
    at the EXACT interpolated median of each axis into 8 segments. The
    medians come from the bucketed two-phase percentile operator — no
    global sort of the customer table — then broadcast back as one tiny
    row; monetary sums are per-row-rounded cents so the aggregation is
    order-independent and bit-stable cross-engine."""
    from ..operators.percentile_ops import bucketed_exact_percentiles

    orders = load_table(spark, sf_dir, "orders")
    per_c = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.lit(_RFM_EPOCH).cast("date")
        )
        .cast("bigint")
        .alias("r"),
        F.count("*").alias("f"),
        F.sum(N.fround_int(F.col("o_totalprice") * 100))
        .cast("bigint")
        .alias("m"),
    )
    melted = per_c.selectExpr(
        "stack(3, 'r', CAST(r AS DOUBLE), 'f', CAST(f AS DOUBLE), "
        "'m', CAST(m AS DOUBLE)) AS (col_name, x)"
    )
    meds = (
        bucketed_exact_percentiles(melted, [0.5])
        .groupBy()
        .agg(
            F.max(F.when(F.col("col_name") == "r", F.col("p_0"))).alias("mr"),
            F.max(F.when(F.col("col_name") == "f", F.col("p_0"))).alias("mf"),
            F.max(F.when(F.col("col_name") == "m", F.col("p_0"))).alias("mm"),
        )
    )
    seg = F.concat(
        F.when(F.col("r").cast("double") >= F.col("mr"), F.lit("R+")).otherwise(
            F.lit("R-")
        ),
        F.when(F.col("f").cast("double") >= F.col("mf"), F.lit("F+")).otherwise(
            F.lit("F-")
        ),
        F.when(F.col("m").cast("double") >= F.col("mm"), F.lit("M+")).otherwise(
            F.lit("M-")
        ),
    )
    return (
        per_c.crossJoin(F.broadcast(meds))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count("*").alias("n_customers"),
            (
                F.sum("m").cast("double") / (100.0 * F.count("*"))
            ).alias("avg_monetary"),
        )
    )


# --- Kaplan-Meier survival of user activity ----------------------------------
_KM_CENSOR_DAYS = 7  # last seen within this tail window => censored


@query(
    "survival_kaplan_meier",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             min(epoch_us(ts) // {_US_DAY}) AS d0,
             max(epoch_us(ts) // {_US_DAY}) AS d1
      FROM events GROUP BY user_id
    ),
    g AS (SELECT max(d1) AS dmax FROM per_user),
    u AS (
      SELECT CAST(d1 - d0 AS BIGINT) AS t,
             CAST(d1 <= dmax - {_KM_CENSOR_DAYS} AS BIGINT) AS died
      FROM per_user CROSS JOIN g
    ),
    bytime AS (
      SELECT t, CAST(sum(died) AS BIGINT) AS d,
             CAST(count(*) - sum(died) AS BIGINT) AS c
      FROM u GROUP BY t
    ),
    risk AS (
      SELECT a.t, a.d, a.c,
             (SELECT CAST(sum(b.d + b.c) AS BIGINT)
              FROM bytime b WHERE b.t >= a.t) AS n_risk
      FROM bytime a
    ),
    logs AS (
      SELECT t, d, c, n_risk,
             CAST(round(ln(greatest(1.0 - CAST(d AS DOUBLE)
                                        / CAST(n_risk AS DOUBLE), 1e-15)), 8)
                  AS DECIMAL(20,8)) AS lt
      FROM risk
    ),
    km AS (
      SELECT t, d, c, n_risk,
             CAST(sum(lt) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ls
      FROM logs
    )
    SELECT t, d, c, n_risk, round(ls, 6) AS log_surv, round(exp(ls), 6) AS surv
    FROM km
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user activity lifetime: duration =
    days between a user's first and last event; users last seen more than
    {_KM_CENSOR_DAYS} days before the corpus end are churned (death), the
    rest right-censored. S(t) = prod over u<=t of (1 - d_u / n_u) with
    n_u = at-risk count (everyone whose duration >= u).

    Scale shape: one per-user agg (single shuffle of the fact), then every
    KM quantity lives on the per-duration table, whose cardinality is
    bounded by the calendar span — n_risk is total-minus-exclusive-prefix
    and the cumulative log is an inclusive prefix, both via the bounded_seq
    triangular join (no unpartitioned window). Exactness: the survival
    product is a log-sum with per-term round(ln(...), 8) decimal summation
    — the metric_logloss convention — with the 1e-15 clip absorbing the
    terminal d = n_risk point (ln 0); integer d/c/n_risk are exact.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(f"min(unix_micros(ts) div {_US_DAY}) AS d0"),
        F.expr(f"max(unix_micros(ts) div {_US_DAY}) AS d1"),
    )
    g = per_user.agg(F.expr("max(d1) AS dmax"))
    u = per_user.crossJoin(F.broadcast(g)).selectExpr(
        "CAST(d1 - d0 AS BIGINT) AS t",
        f"CAST(d1 <= dmax - {_KM_CENSOR_DAYS} AS BIGINT) AS died",
    )
    bytime = u.groupBy("t").agg(
        F.expr("CAST(sum(died) AS BIGINT) AS d"),
        F.expr("CAST(count(*) - sum(died) AS BIGINT) AS c"),
    )
    from ..operators.bounded_seq import exclusive_prefix_sums

    bytime = bytime.withColumn("dc", F.expr("d + c"))
    total = bytime.agg(F.expr("CAST(sum(dc) AS BIGINT) AS n_total"))
    prev = exclusive_prefix_sums(bytime.select("t", "dc"), "t", ["dc"])
    risk = (
        bytime.join(F.broadcast(prev), "t")
        .crossJoin(F.broadcast(total))
        .selectExpr("t", "d", "c", "n_total - prev_dc AS n_risk")
    )
    logs = risk.selectExpr(
        "t",
        "d",
        "c",
        "n_risk",
        "CAST(round(ln(greatest(1.0D - CAST(d AS DOUBLE)"
        " / CAST(n_risk AS DOUBLE), 1e-15)), 8) AS DECIMAL(20,8)) AS lt",
    )
    lprev = exclusive_prefix_sums(logs.select("t", "lt"), "t", ["lt"])
    return (
        logs.join(F.broadcast(lprev), "t")
        .withColumn("ls", F.expr("CAST(prev_lt + lt AS DOUBLE)"))
        .selectExpr(
            "t", "d", "c", "n_risk",
            "round(ls, 6) AS log_surv",
            "round(exp(ls), 6) AS surv",
        )
    )


# --- log-rank test between two survival cohorts -------------------------------
@query(
    "survival_logrank_test",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             min(epoch_us(ts) // {_US_DAY}) AS d0,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) // {_US_DAY} END) AS dp,
             max(epoch_us(ts) // {_US_DAY}) AS dl
      FROM events GROUP BY user_id
    ),
    u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(coalesce(dp, dl) - d0 AS BIGINT) AS t,
             CAST(dp IS NOT NULL AS BIGINT) AS died
      FROM per_user
    ),
    byg AS (
      SELECT grp, t, CAST(sum(died) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS dc
      FROM u GROUP BY grp, t
    ),
    grid AS (
      SELECT tt.t, gg.grp, coalesce(b.d, 0) AS d, coalesce(b.dc, 0) AS dc
      FROM (SELECT DISTINCT t FROM byg) tt
      CROSS JOIN (SELECT DISTINCT grp FROM byg) gg
      LEFT JOIN byg b ON b.t = tt.t AND b.grp = gg.grp
    ),
    risk AS (
      SELECT t, grp, d,
             sum(dc) OVER (PARTITION BY grp) - coalesce(sum(dc) OVER (
               PARTITION BY grp ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at
      FROM grid
    ),
    byt AS (
      SELECT t,
             CAST(sum(CASE WHEN grp = 0 THEN d END) AS BIGINT) AS d1t,
             CAST(sum(d) AS BIGINT) AS dt,
             CAST(sum(CASE WHEN grp = 0 THEN n_at END) AS BIGINT) AS n1t,
             CAST(sum(n_at) AS BIGINT) AS nt
      FROM risk GROUP BY t
    ),
    terms AS (
      SELECT CAST(round(CAST(d1t AS DOUBLE)
                        - CAST(dt AS DOUBLE) * n1t / nt, 8)
                  AS DECIMAL(20,8)) AS oe,
             CAST(round(CAST(dt AS DOUBLE) * (CAST(n1t AS DOUBLE) / nt)
                        * (CAST(nt - n1t AS DOUBLE) / nt)
                        * (CAST(nt - dt AS DOUBLE) / (nt - 1.0)), 8)
                  AS DECIMAL(20,8)) AS v
      FROM byt WHERE dt > 0 AND nt > 1
    ),
    s AS (
      SELECT CAST(sum(oe) AS DOUBLE) AS oe_sum, CAST(sum(v) AS DOUBLE) AS v_sum
      FROM terms
    )
    SELECT round(oe_sum, 6) AS oe_sum, round(v_sum, 6) AS v_sum,
           round(oe_sum * oe_sum / v_sum, 6) AS logrank_chi2,
           CAST(1 AS BIGINT) AS df
    FROM s WHERE v_sum > 0
    """,
)
def survival_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test (user_id parity as the A/B arm) on
    time-to-first-purchase: death = conversion, users who never purchase
    are right-censored at their last-seen day. At each conversion time,
    observed-minus-expected group-0 conversions under the hypergeometric
    null, chi2 = (sum O-E)^2 / sum V with df=1 — scipy/lifelines'
    logrank_test statistic.

    Scale shape: one per-user agg, then everything lives on the bounded
    (grp x duration) grid (~2 x calendar-span rows). At-risk counts come
    from a cumulative window PARTITIONED by group over that compressed
    grid (never an unpartitioned window over raw rows). Cross-time sums
    use the per-term round-to-8dp DECIMAL summation convention (exact and
    order-independent, like the KM log-product). Times with no deaths and
    the nt<=1 tail contribute exactly zero and are filtered identically in
    both engines (also keeps ANSI double/0 out of the degenerate corpus).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr(f"min(unix_micros(ts) div {_US_DAY}) AS d0"),
        F.expr(
            "min(CASE WHEN event_type = 'purchase'"
            f" THEN unix_micros(ts) div {_US_DAY} END) AS dp"
        ),
        F.expr(f"max(unix_micros(ts) div {_US_DAY}) AS dl"),
    )
    u = per_user.selectExpr(
        "CAST(user_id % 2 AS BIGINT) AS grp",
        "CAST(coalesce(dp, dl) - d0 AS BIGINT) AS t",
        "CAST(dp IS NOT NULL AS BIGINT) AS died",
    )
    byg = u.groupBy("grp", "t").agg(
        F.expr("CAST(sum(died) AS BIGINT) AS d"),
        F.expr("CAST(count(*) AS BIGINT) AS dc"),
    )
    grid = (
        byg.select("t").distinct()
        .crossJoin(F.broadcast(byg.select("grp").distinct()))
        .join(F.broadcast(byg), ["t", "grp"], "left")
        .selectExpr("t", "grp", "coalesce(d, 0) AS d", "coalesce(dc, 0) AS dc")
    )
    wtot = Window.partitionBy("grp")
    wcum = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = grid.select(
        "t",
        "grp",
        "d",
        (
            F.sum("dc").over(wtot)
            - F.coalesce(F.sum("dc").over(wcum), F.lit(0))
        ).alias("n_at"),
    )
    byt = risk.groupBy("t").agg(
        F.expr("CAST(sum(CASE WHEN grp = 0 THEN d END) AS BIGINT) AS d1t"),
        F.expr("CAST(sum(d) AS BIGINT) AS dt"),
        F.expr("CAST(sum(CASE WHEN grp = 0 THEN n_at END) AS BIGINT) AS n1t"),
        F.expr("CAST(sum(n_at) AS BIGINT) AS nt"),
    )
    terms = byt.filter("dt > 0 AND nt > 1").selectExpr(
        "CAST(round(CAST(d1t AS DOUBLE)"
        " - CAST(dt AS DOUBLE) * n1t / nt, 8) AS DECIMAL(20,8)) AS oe",
        "CAST(round(CAST(dt AS DOUBLE) * (CAST(n1t AS DOUBLE) / nt)"
        " * (CAST(nt - n1t AS DOUBLE) / nt)"
        " * (CAST(nt - dt AS DOUBLE) / (nt - 1.0)), 8)"
        " AS DECIMAL(20,8)) AS v",
    )
    s = terms.agg(
        F.expr("CAST(sum(oe) AS DOUBLE) AS oe_sum"),
        F.expr("CAST(sum(v) AS DOUBLE) AS v_sum"),
    )
    return s.filter("v_sum > 0").selectExpr(
        "round(oe_sum, 6) AS oe_sum",
        "round(v_sum, 6) AS v_sum",
        "round(oe_sum * oe_sum / v_sum, 6) AS logrank_chi2",
        "CAST(1 AS BIGINT) AS df",
    )


# --- conversion-latency quantiles per experiment arm -------------------------
_US_MIN = 60_000_000


@query(
    "funnel_time_to_convert",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             CASE WHEN e.user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
             CAST((epoch_us(min(e.ts)) - epoch_us(s1.t0)) // {_US_MIN}
                  AS DOUBLE) AS delay_min
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t0
      GROUP BY e.user_id, s1.t0
    )
    SELECT arm,
           count(*) AS n_converted,
           quantile_cont(delay_min, 0.25) AS p25_min,
           quantile_cont(delay_min, 0.5) AS median_min,
           quantile_cont(delay_min, 0.75) AS p75_min
    FROM conv GROUP BY arm
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency quartiles per experiment arm — the
    time-to-convert readout next to ab_test_ztest's rate readout. Delay is
    floored to integer minutes so the exact interpolated quartiles (dyadic
    p, halves/quarters fractions on integer-valued doubles) are bit-equal
    across engines with no float conventions.

    Scale shape: two per-user conditional-min aggregates (the funnel_steps
    join pattern), then all quantile work runs through the two-phase
    bucketed percentile operator on the per-user delay table — histogram
    shuffles only, no sort, no value buffer."""
    from ..operators.percentile_ops import bucketed_exact_percentiles

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("ts").alias("t1"))
        .selectExpr(
            "CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS col_name",
            f"CAST((unix_micros(t1) - unix_micros(t0)) div {_US_MIN}"
            " AS DOUBLE) AS x",
        )
    )
    qs = bucketed_exact_percentiles(conv, [0.25, 0.5, 0.75])
    n = conv.groupBy("col_name").agg(F.expr("count(*) AS n_converted"))
    return (
        n.join(qs, "col_name")
        .selectExpr(
            "col_name AS arm",
            "n_converted",
            "p_0 AS p25_min",
            "p_1 AS median_min",
            "p_2 AS p75_min",
        )
    )


# --- DAU/MAU stickiness ratio ------------------------------------------------
_MAU_W = 28


@query(
    "dau_mau_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_US_DAY} AS d FROM events
    ),
    dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM ud GROUP BY d),
    contrib AS (
      SELECT DISTINCT user_id, unnest(generate_series(d, d + {_MAU_W - 1})) AS d
      FROM ud
    ),
    bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM ud),
    mau AS (
      SELECT c.d, count(DISTINCT c.user_id) AS mau
      FROM contrib c, bounds b
      WHERE c.d BETWEEN b.mn AND b.mx
      GROUP BY c.d
    )
    SELECT dau.d, dau.dau, mau.mau,
           CAST(dau.dau * 1000000 // mau.mau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN mau ON dau.d = mau.d
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement ratio product teams
    track. Trailing-{_MAU_W}-day MAU uses the rolling_wau contribution
    trick (each (user, day) contributes itself to the {_MAU_W} days it
    keeps the user counted — a x{_MAU_W} narrow explode, no windows, no
    sort); DAU is a plain distinct count. Integer ppm output."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.selectExpr(
        "user_id", f"unix_micros(ts) div {_US_DAY} AS d"
    ).distinct()
    dau = ud.groupBy("d").agg(F.expr("count(DISTINCT user_id) AS dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + (_MAU_W - 1))).alias("d"),
    ).distinct()
    bounds = ud.agg(F.expr("min(d) AS mn"), F.expr("max(d) AS mx"))
    mau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter("d BETWEEN mn AND mx")
        .groupBy("d")
        .agg(F.expr("count(DISTINCT user_id) AS mau"))
    )
    return dau.join(mau, "d").selectExpr(
        "d", "dau", "mau", "CAST(dau * 1000000 div mau AS BIGINT) AS stickiness_ppm"
    )


# --- Gini coefficient of the join-key distribution ---------------------------
@query(
    "key_skew_gini",
    oracle="""
    WITH c AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS x
      FROM lineitem GROUP BY l_suppkey
    ),
    r AS (
      SELECT x,
             rank() OVER (ORDER BY x)
               + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS r_avg
      FROM c
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             sum(x * r_avg) AS t
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_keys,
           round(2.0 * t / (n * sx) - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
)
def key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-suppkey row distribution — the single
    skew number behind key_skew_audit's top-10 list (0 = uniform keys,
    →1 = one key owns the table; the pre-flight input to the salting
    factor). Gini = 2·Σ(rank·x)/(n·Σx) − (n+1)/n with tie-averaged
    ranks.

    Distribution: the rank moment Σ(rank·x) needs no sort — for a tied
    block, Σ ranks = cnt·r_avg, so Σ(rank·x) = Σ_values x·cnt·r_avg over
    the DISTINCT-count table from the bucketed mean_ranks operator. All
    terms are half-integers (exact in double, any order); the per-key
    count table is one map-side-combined shuffle of the fact."""
    from ..operators.rank_ops import mean_ranks

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_suppkey").agg(F.expr("CAST(count(*) AS BIGINT) AS x"))
    r = mean_ranks(c, "x")
    s = r.agg(
        F.expr("CAST(sum(cnt) AS DOUBLE) AS n"),
        F.expr("CAST(sum(x * cnt) AS DOUBLE) AS sx"),
        F.expr("sum(x * cnt * r_avg) AS t"),
    )
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_keys",
        "round(2.0D * t / (n * sx) - (n + 1.0D) / n, 6) AS gini",
    )


# --- last-touch marketing attribution ----------------------------------------
_ATTR_WINDOW_US = 7 * 86_400_000_000  # 7-day lookback


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts, event_type FROM events
          WHERE event_type IN ('click', 'view')),
    j AS (
      SELECT p.user_id, p.ts AS pts, p.value, t.ts AS tts, t.event_type
      FROM p ASOF LEFT JOIN t
        ON p.user_id = t.user_id AND p.ts >= t.ts
    )
    SELECT CASE WHEN tts IS NULL
                  OR epoch_us(pts) - epoch_us(tts) > {_ATTR_WINDOW_US}
                THEN 'direct' ELSE event_type END AS channel,
           count(*) AS n_purchases,
           round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2)
             AS revenue
    FROM j GROUP BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent click/view within a 7-day lookback (else 'direct'), with
    per-channel purchase counts and decimal-exact revenue.

    Spark side rides the union-and-carry asof_join operator (one
    user-partitioned window, no inequality join — operators/temporal.py);
    the lookback is a post-asof filter. The oracle is DuckDB's native
    ASOF JOIN — an independent implementation of the match semantics."""
    from ..operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_type"
    )
    j = asof_join(
        purchases, touches, on=["user_id"], ts="ts",
        right_cols=["ts", "event_type"],
    )
    return (
        j.selectExpr(
            f"CASE WHEN ts_r IS NULL"
            f" OR unix_micros(ts) - unix_micros(ts_r) > {_ATTR_WINDOW_US}"
            f" THEN 'direct' ELSE event_type_r END AS channel",
            "value",
        )
        .groupBy("channel")
        .agg(
            F.expr("count(*) AS n_purchases"),
            F.expr(
                "round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2)"
                " AS revenue"
            ),
        )
    )


# --- gaps-and-islands: runs of below-average order days ----------------------
@query(
    "order_gap_islands",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // {_US_DAY} AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY d
    ),
    m AS (
      SELECT CAST(sum(x) AS DOUBLE) / count(*) AS avg_x FROM daily
    ),
    low AS (
      SELECT d FROM daily CROSS JOIN m WHERE CAST(x AS DOUBLE) < avg_x
    ),
    isl AS (
      SELECT d, d - (row_number() OVER (ORDER BY d) - 1) AS island
      FROM low
    ),
    runs AS (
      SELECT island, CAST(count(*) AS BIGINT) AS run_len FROM isl
      GROUP BY island
    )
    SELECT count(*) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(sum(run_len) AS BIGINT) AS total_low_days
    FROM runs
    """,
)
def order_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the daily order series: maximal runs of
    consecutive below-average days (the demand-slump / stockout-run
    pattern). Island id = day − position-among-low-days, so consecutive
    low days share an id.

    Distribution: the classic formulation ranks low days with an
    unpartitioned row_number; here the position comes from bounded_seq's
    dense_codes triangular join — valid because the daily table is
    bounded by the CALENDAR SPAN, not the row count (the same bounded-
    domain argument as seasonal_decompose_daily). One fact shuffle for
    the daily counts; everything after runs on ≤ span-days rows."""
    from ..operators.bounded_seq import dense_codes

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}"
        ).alias("d")
    ).agg(F.expr("CAST(count(*) AS BIGINT) AS x"))
    m = daily.agg(F.expr("CAST(sum(x) AS DOUBLE) / count(*) AS avg_x"))
    low = (
        daily.crossJoin(F.broadcast(m))
        .filter("CAST(x AS DOUBLE) < avg_x")
        .select("d")
    )
    isl = dense_codes(low, "d", out="pos").selectExpr("d - pos AS island")
    runs = isl.groupBy("island").agg(F.expr("CAST(count(*) AS BIGINT) AS run_len"))
    return runs.agg(
        F.expr("count(*) AS n_runs"),
        F.expr("CAST(max(run_len) AS BIGINT) AS longest_run"),
        F.expr("CAST(sum(run_len) AS BIGINT) AS total_low_days"),
    )


# --- CUSUM change-point detection on the daily value series ------------------
@query(
    "events_value_cusum",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_US_DAY} AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY d
    ),
    tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS s_all,
             CAST(sum(n) AS BIGINT) AS n_all,
             CAST(count(*) AS BIGINT) AS n_days
      FROM daily
    ),
    dev AS (
      SELECT d.d,
             CAST(d.cents AS HUGEINT) * t.n_all
               - CAST(d.n AS HUGEINT) * t.s_all AS dv
      FROM daily d CROSS JOIN tot t
    ),
    cu AS (
      SELECT d, sum(dv) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      FROM dev
    )
    SELECT cu.d AS change_day,
           CAST(abs(cu.cusum) AS BIGINT) AS max_abs_cusum,
           t.n_days
    FROM cu CROSS JOIN tot t
    ORDER BY abs(cu.cusum) DESC, cu.d LIMIT 1
    """,
)
def events_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily event-value series: the
    day where the cumulative deviation from the global mean rate peaks —
    the standard ops-monitoring shift detector. Deviation is kept EXACT
    integer by cross-multiplying instead of dividing: dev_t = cents_t ·
    N_total − n_t · cents_total (128-bit), so the argmax needs no float
    conventions at all.

    Distribution: daily rollup is one map-side-combined shuffle; the
    cumulative sum runs over the calendar-bounded daily table via
    bounded_seq's triangular prefix (no unpartitioned window), and the
    argmax compiles to TakeOrderedAndProject."""
    from ..operators.bounded_seq import exclusive_prefix_sums

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(f"unix_micros(ts) div {_US_DAY}").alias("d")
    ).agg(
        F.expr(f"CAST(sum({N.spark_fround_int('value * 100')}) AS BIGINT) AS cents"),
        F.expr("CAST(count(*) AS BIGINT) AS n"),
    )
    tot = daily.agg(
        F.expr("CAST(sum(cents) AS BIGINT) AS s_all"),
        F.expr("CAST(sum(n) AS BIGINT) AS n_all"),
        F.expr("CAST(count(*) AS BIGINT) AS n_days"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "d",
        "CAST(cents AS DECIMAL(38,0)) * n_all - CAST(n AS DECIMAL(38,0)) * s_all"
        " AS dv",
        "n_days",
    )
    pref = exclusive_prefix_sums(dev.select("d", "dv"), "d", ["dv"])
    return (
        dev.join(F.broadcast(pref), "d")
        .selectExpr(
            "d AS change_day",
            "CAST(abs(prev_dv + dv) AS BIGINT) AS max_abs_cusum",
            "n_days",
        )
        .orderBy(F.desc("max_abs_cusum"), F.asc("change_day"))
        .limit(1)
    )


# --- LTV decile lift table ---------------------------------------------------
@query(
    "ltv_decile_table",
    oracle="""
    WITH ltv AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    d AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM ltv
          GROUP BY cents),
    c AS (
      SELECT cents, sum(cnt) OVER (ORDER BY cents
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_cust FROM d),
    bnd AS (
      SELECT k.k, min(c.cents) AS b
      FROM c CROSS JOIN n
      CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k) k
      WHERE c.cum >= (k.k * n.n_cust + 9) // 10
      GROUP BY k.k
    ),
    assigned AS (
      SELECT l.o_custkey, l.cents,
             1 + (SELECT count(*) FROM bnd WHERE bnd.b < l.cents) AS decile
      FROM ltv l
    )
    SELECT CAST(decile AS INT) AS decile,
           count(*) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS decile_cents
    FROM assigned GROUP BY decile
    """,
)
def ltv_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-LTV decile lift table: per-customer lifetime value in
    exact cents, decile boundaries as ORDER STATISTICS (smallest value
    with cum >= ceil(k·n/10) — pure integer arithmetic, no interpolation
    conventions), customers assigned by counting boundaries strictly
    below their value, then per-decile counts and revenue — the marketing
    lift-table primitive.

    Distribution: LTV is one map-side shuffle; cum lives on the
    distinct-value table via mean_ranks (cum = r_avg + (cnt-1)/2, exact
    half-integers, no global sort); the 9-boundary frame broadcasts onto
    one assignment scan."""
    from ..operators.rank_ops import mean_ranks

    orders = load_table(spark, sf_dir, "orders")
    ltv = orders.groupBy("o_custkey").agg(
        F.expr(
            f"CAST(sum({N.spark_fround_int('o_totalprice * 100')}) AS BIGINT)"
            " AS cents"
        )
    )
    r = mean_ranks(ltv, "cents")  # (cents, cnt, r_avg)
    n = r.agg(F.expr("CAST(sum(cnt) AS BIGINT) AS n_cust"))
    ks = spark.range(1, 10).selectExpr("CAST(id AS INT) AS k")
    bnd = (
        r.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ks))
        .filter(
            F.expr("r_avg + (cnt - 1) / 2.0D >= (k * n_cust + 9) div 10")
        )
        .groupBy("k")
        .agg(F.expr("min(cents) AS b"))
    )
    nb = bnd.select("b")
    assigned = ltv.join(F.broadcast(nb), F.expr("b < cents"), "left").groupBy(
        "o_custkey", "cents"
    ).agg(F.expr("CAST(1 + count(b) AS INT) AS decile"))
    return assigned.groupBy("decile").agg(
        F.expr("count(*) AS n_customers"),
        F.expr("CAST(sum(cents) AS BIGINT) AS decile_cents"),
    )


# --- churn label builder (week-over-week inactivity) -------------------------
@query(
    "churn_label_builder",
    oracle=f"""
    WITH uw AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {7 * _US_DAY} AS wk FROM events
    ),
    mx AS (SELECT max(wk) AS max_wk FROM uw)
    SELECT a.wk,
           count(*) AS n_active,
           CAST(sum(CAST(b.user_id IS NULL AS INT)) AS BIGINT) AS n_churned,
           CAST(sum(CAST(b.user_id IS NULL AS INT)) * 1000000 // count(*)
                AS BIGINT) AS churn_ppm
    FROM uw a
    LEFT JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 1
    CROSS JOIN mx
    WHERE a.wk < mx.max_wk
    GROUP BY a.wk
    """,
)
def churn_label_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn training labels: a user active in week w is churned iff they
    have no activity in week w+1 (the last observed week is excluded — it
    has no lookahead). The label-building join every churn model starts
    from, expressed as a (user, week) distinct self-join on (user, w+1) —
    an ordinary hash equi-join keyed on user, no windows, no sequential
    scan. Integer ppm churn rate per week."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.selectExpr(
        "user_id", f"unix_micros(ts) div {7 * _US_DAY} AS wk"
    ).distinct()
    mx = uw.agg(F.expr("max(wk) AS max_wk"))
    b = uw.selectExpr("user_id", "wk - 1 AS wk_prev").withColumn(
        "next_active", F.lit(1)
    )
    return (
        uw.join(
            b,
            (uw.user_id == b.user_id) & (uw.wk == b.wk_prev),
            "left",
        )
        .crossJoin(F.broadcast(mx))
        .filter(uw.wk < F.col("max_wk"))
        .groupBy(uw.wk.alias("wk"))
        .agg(
            F.expr("count(*) AS n_active"),
            F.expr(
                "CAST(sum(CAST(next_active IS NULL AS INT)) AS BIGINT)"
                " AS n_churned"
            ),
            F.expr(
                "CAST(sum(CAST(next_active IS NULL AS INT)) * 1000000"
                " div count(*) AS BIGINT) AS churn_ppm"
            ),
        )
    )


# --- per-user behavioral entropy ---------------------------------------------
@query(
    "user_behavior_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY user_id, event_type
    ),
    n AS (SELECT user_id, CAST(sum(k) AS BIGINT) AS n,
                 count(*) AS n_types
          FROM c GROUP BY user_id),
    ent AS (
      SELECT c.user_id, n.n_types,
             CAST(sum(CAST(c.k AS DECIMAL(38,0))
                      * CAST(round(ln(CAST(n.n AS DOUBLE) / c.k) * 100000000)
                             AS BIGINT)) AS DOUBLE) / (n.n * 1e8) AS h
      FROM c JOIN n ON c.user_id = n.user_id
      GROUP BY c.user_id, n.n_types, n.n
    )
    SELECT CAST(n_types AS INT) AS n_types,
           count(*) AS n_users,
           round(CAST(sum(CAST(round(h, 8) AS DECIMAL(20,8))) AS DOUBLE)
                 / count(*), 6) AS mean_entropy
    FROM ent GROUP BY n_types
    """,
)
def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix (H = Σ (k/n)·ln(n/k)
    nats — low entropy = single-behavior users, high = diverse), rolled
    up by how many distinct types the user touches — the behavioral-
    diversity feature of engagement models.

    Exactness: per-term logs in exact 1e-8 integer units weighted by
    integer counts (DECIMAL(38,0) sums), one double division per user,
    8dp-rounded decimal mean per group. Two map-side aggregates keyed by
    user; no windows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.expr("CAST(count(*) AS BIGINT) AS k")
    )
    n = c.groupBy("user_id").agg(
        F.expr("CAST(sum(k) AS BIGINT) AS n"), F.expr("count(*) AS n_types")
    )
    ent = (
        c.join(n, "user_id")
        .groupBy("user_id", "n_types", "n")
        .agg(
            F.expr(
                "CAST(sum(CAST(k AS DECIMAL(38,0)) * "
                f"{N.spark_fround_int('ln(CAST(n AS DOUBLE) / k) * 100000000')}"
                ") AS DOUBLE) AS hs"
            )
        )
        .selectExpr("n_types", "hs / (n * 1e8) AS h")
    )
    return ent.groupBy(F.expr("CAST(n_types AS INT)").alias("n_types")).agg(
        F.expr("count(*) AS n_users"),
        F.expr(
            f"round(CAST(sum(CAST({N.spark_fround('h', 8)} AS DECIMAL(20,8))) AS DOUBLE)"
            " / count(*), 6) AS mean_entropy"
        ),
    )


# --- repeat-purchase rate per first-order cohort -----------------------------
@query(
    "repeat_purchase_rate",
    oracle="""
    WITH per_c AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             epoch_us(date_trunc('month', min(o_orderdate))) AS cohort_us
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort_us,
           count(*) AS n_customers,
           CAST(sum(CAST(n_orders >= 2 AS INT)) AS BIGINT) AS n_repeat,
           CAST(sum(CAST(n_orders >= 2 AS INT)) * 1000000 // count(*)
                AS BIGINT) AS repeat_ppm
    FROM per_c GROUP BY cohort_us
    """,
)
def repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per acquisition cohort: customers grouped by
    the calendar month of their FIRST order; the share who ever ordered
    again — the retention-economics readout next to cohort_retention's
    activity matrix. One per-customer aggregate (min date + count in the
    same pass), one cohort rollup; integer ppm."""
    orders = load_table(spark, sf_dir, "orders")
    per_c = orders.groupBy("o_custkey").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_orders"),
        F.expr(
            "unix_micros(date_trunc('month',"
            " CAST(min(o_orderdate) AS TIMESTAMP))) AS cohort_us"
        ),
    )
    return per_c.groupBy("cohort_us").agg(
        F.expr("count(*) AS n_customers"),
        F.expr("CAST(sum(CAST(n_orders >= 2 AS INT)) AS BIGINT) AS n_repeat"),
        F.expr(
            "CAST(sum(CAST(n_orders >= 2 AS INT)) * 1000000 div count(*)"
            " AS BIGINT) AS repeat_ppm"
        ),
    )


# --- inter-arrival burstiness per event type ---------------------------------
@query(
    "events_interarrival_burstiness",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS gap_us
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(count(gap_us) AS DOUBLE) AS n,
             CAST(sum(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(gap_us AS DECIMAL(38,0)) * gap_us) AS DOUBLE)
               AS sxx
      FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           CAST(round(sx / n) AS BIGINT) AS mean_gap_us,
           round((sqrt((sxx - sx * sx / n) / n) - sx / n)
                 / (sqrt((sxx - sx * sx / n) / n) + sx / n), 6)
             AS burstiness
    FROM s
    """,
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per event type: B = (σ−μ)/(σ+μ) over the
    per-user gap distribution (−1 = metronome, 0 = Poisson, →1 = heavy
    bursts — the traffic-shape diagnostic behind rate limits and
    anomaly baselines; Goh & Barabási's measure).

    Scale shape: gaps come from a lag window PARTITIONED BY (user,
    event_type) — parallel across users, never a global sort; gap
    microseconds are exact bigints, moments decimal-summed, and the
    σ/μ combination is one shared double tree rounded 6dp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.expr("unix_micros(ts)")
            - F.lag(F.expr("unix_micros(ts)")).over(w)
        ).alias("gap_us"),
    ).filter("gap_us IS NOT NULL")
    s = g.groupBy("event_type").agg(
        F.expr("CAST(count(gap_us) AS DOUBLE) AS n"),
        F.expr("CAST(sum(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) AS sx"),
        F.expr(
            "CAST(sum(CAST(gap_us AS DECIMAL(38,0)) * gap_us) AS DOUBLE) AS sxx"
        ),
    )
    return s.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_gaps",
        "CAST(round(sx / n, 0) AS BIGINT) AS mean_gap_us",
        "round((sqrt((sxx - sx * sx / n) / n) - sx / n)"
        " / (sqrt((sxx - sx * sx / n) / n) + sx / n), 6) AS burstiness",
    )


# --- sessionization gap-threshold sweep --------------------------------------
_GAP_MINUTES = (15, 30, 60)


@query(
    "session_gap_sweep",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    u AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
    SELECT m.m AS gap_minutes,
           CAST(u.n_users + sum(CAST(g.gap_us > CAST(m.m AS BIGINT) * 60000000 AS INT))
                AS BIGINT) AS n_sessions
    FROM g CROSS JOIN (SELECT unnest([{', '.join(map(str, _GAP_MINUTES))}])
                       AS m) m
    CROSS JOIN u
    WHERE g.gap_us IS NOT NULL
    GROUP BY m.m, u.n_users
    """,
)
def session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization parameter sweep: total session count at every
    candidate inactivity gap ({', '.join(map(str, _GAP_MINUTES))} min) —
    the curve that picks the gap before stream_session is configured
    (sessions = users + session-breaking gaps, so ONE lag pass scores
    every threshold; no re-sessionization per candidate).

    Scale shape: the lag window partitions by user (parallel, no global
    sort); the threshold dimension broadcasts over the gap table and
    counts combine map-side — the threshold_sweep pattern applied to
    sessionization."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.expr("unix_micros(ts)") - F.lag(F.expr("unix_micros(ts)")).over(w)
        ).alias("gap_us"),
    ).filter("gap_us IS NOT NULL")
    u = ev.agg(F.expr("count(DISTINCT user_id) AS n_users"))
    m = spark.createDataFrame([(x,) for x in _GAP_MINUTES], "m int")
    return (
        g.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(u))
        .groupBy("m", "n_users")
        .agg(
            F.expr(
                "CAST(first(n_users) + sum(CAST(gap_us > CAST(m AS BIGINT) * 60000000"
                " AS INT)) AS BIGINT) AS n_sessions"
            )
        )
        .selectExpr("m AS gap_minutes", "n_sessions")
    )


# --- day-of-week x hour activity heatmap -------------------------------------
@query(
    "events_dow_hour_heatmap",
    oracle=f"""
    SELECT CAST((epoch_us(ts) // {_US_DAY} + 4) % 7 AS INT) AS dow,
           CAST((epoch_us(ts) % {_US_DAY}) // 3600000000 AS INT) AS hour,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY dow, hour
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap (epoch-day + 4 ≡ 0 on
    Monday — pure integer arithmetic, timezone-free on both engines) —
    the weekly rhythm grid capacity planning and anomaly baselines read.
    One projection + one map-side aggregate over ≤168 cells."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr(f"CAST((unix_micros(ts) div {_US_DAY} + 4) % 7 AS INT)").alias(
            "dow"
        ),
        F.expr(
            f"CAST((unix_micros(ts) % {_US_DAY}) div 3600000000 AS INT)"
        ).alias("hour"),
    ).agg(
        F.expr("count(*) AS n_events"),
        F.expr(
            f"CAST(sum({N.spark_fround_int('value * 100')}) AS BIGINT) AS cents"
        ),
    )


# --- weekly event-type mix shares --------------------------------------------
@query(
    "weekly_type_mix",
    oracle=f"""
    WITH c AS (
      SELECT epoch_us(ts) // {7 * _US_DAY} AS wk, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY wk, event_type
    ),
    t AS (SELECT wk, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY wk)
    SELECT c.wk, c.event_type, c.n,
           CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm
    FROM c JOIN t ON c.wk = t.wk
    """,
)
def weekly_type_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly event-type mix shares (ppm) — the composition-over-time
    drift view product and data-quality teams watch (a sudden error-share
    jump is the alert). Two map-side aggregates and a weekly-totals
    broadcast join; all-integer output."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.expr(f"unix_micros(ts) div {7 * _US_DAY}").alias("wk"), "event_type"
    ).agg(F.expr("CAST(count(*) AS BIGINT) AS n"))
    t = c.groupBy("wk").agg(F.expr("CAST(sum(n) AS BIGINT) AS total"))
    return c.join(F.broadcast(t), "wk").selectExpr(
        "wk", "event_type", "n", "CAST(n * 1000000 div total AS BIGINT) AS share_ppm"
    )


# --- integer-mass Markov stationary distribution over event types ------------
_MK_MASS = 10**12
_MK_ITERS = 4


def _markov_sql() -> str:
    ctes = [
        f"""bi AS (
      SELECT user_id, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS b
      FROM events
    ),
    tm AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM bi
      WHERE b IS NOT NULL GROUP BY a, b
    ),
    rowt AS (SELECT a, CAST(sum(c) AS BIGINT) AS tot FROM tm GROUP BY a),
    states AS (SELECT DISTINCT a AS s FROM tm),
    ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM states),
    p0 AS (SELECT s, CAST({_MK_MASS} AS BIGINT) AS mass FROM states)""",
    ]
    for k in range(_MK_ITERS):
        ctes.append(
            f"""p{k + 1} AS (
      SELECT t.b AS s,
             CAST(sum(p.mass * t.c // r.tot) AS BIGINT) AS mass
      FROM p{k} p
      JOIN tm t ON p.s = t.a
      JOIN rowt r ON t.a = r.a
      GROUP BY t.b
    )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT s AS state, mass FROM p{_MK_ITERS}"""
    )


@query("event_markov_stationary", oracle=_markov_sql())
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-stationary distribution of the per-user event-type Markov
    chain: {_MK_ITERS} integer-mass power iterations of the empirical
    transition matrix (the pagerank_int arithmetic — mass·count // rowsum
    floor division, bit-identical on any engine/layout; remainders are
    deliberately dropped). Where user traffic settles — the long-run mix
    the chain predicts, versus weekly_type_mix's observed shares.

    Scale shape: transitions come from a user-partitioned lead window;
    everything after runs on the |types|² matrix."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter("b IS NOT NULL")
    tm = bi.groupBy("a", "b").agg(F.expr("CAST(count(*) AS BIGINT) AS c"))
    rowt = tm.groupBy("a").agg(F.expr("CAST(sum(c) AS BIGINT) AS tot"))
    states = tm.select(F.col("a").alias("s")).distinct().localCheckpoint()
    tmr = tm.join(rowt, "a").localCheckpoint()
    p = states.select("s", F.lit(_MK_MASS).cast("bigint").alias("mass"))
    for _ in range(_MK_ITERS):
        p = (
            p.join(tmr, p["s"] == tmr["a"])
            .selectExpr("b AS s2", "mass * c div tot AS m")
            .groupBy(F.col("s2").alias("s"))
            .agg(F.expr("CAST(sum(m) AS BIGINT) AS mass"))
            .localCheckpoint()
        )
    return p.selectExpr("s AS state", "mass")


# --- UCB1 bandit allocation readout ------------------------------------------
@query(
    "bandit_ucb_allocation",
    oracle="""
    WITH arm AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pulls,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS reward_c
      FROM events GROUP BY event_type
    ),
    t AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS n_total FROM arm)
    SELECT arm.event_type AS arm, arm.n_pulls,
           round(arm.reward_c / (100.0 * arm.n_pulls), 6) AS mean_reward,
           round(arm.reward_c / (100.0 * arm.n_pulls)
                 + sqrt(2.0 * round(ln(CAST(t.n_total AS DOUBLE)), 8)
                        / arm.n_pulls), 6) AS ucb1
    FROM arm CROSS JOIN t
    """,
)
def bandit_ucb_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 scores per arm (event type as arm, value as reward): mean
    reward + sqrt(2 ln N / n) exploration bonus — the index an adaptive
    experiment allocator pulls next (the bandit view of the A/B data
    ab_test_ztest reads frequentist-ly). One counting aggregate + a
    scalar broadcast; ln rounds at 8dp (the repo convention) inside one
    shared double tree."""
    ev = load_table(spark, sf_dir, "events")
    arm = ev.groupBy("event_type").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_pulls"),
        F.expr(
            f"CAST(sum({N.spark_fround_int('value * 100')}) AS BIGINT)"
            " AS reward_c"
        ),
    )
    t = arm.agg(F.expr("CAST(sum(n_pulls) AS BIGINT) AS n_total"))
    return arm.crossJoin(F.broadcast(t)).selectExpr(
        "event_type AS arm",
        "n_pulls",
        "round(reward_c / (100.0D * n_pulls), 6) AS mean_reward",
        "round(reward_c / (100.0D * n_pulls)"
        " + sqrt(2.0D * round(ln(CAST(n_total AS DOUBLE)), 8)"
        " / n_pulls), 6) AS ucb1",
    )


# --- cumulative cohort LTV curve ---------------------------------------------
@query(
    "cohort_ltv_curve",
    oracle="""
    WITH fo AS (
      SELECT o_custkey,
             epoch_us(date_trunc('month', min(o_orderdate))) AS cohort_us
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT fo.cohort_us,
             CAST((date_diff('month',
                   CAST(to_timestamp(fo.cohort_us / 1000000.0) AS TIMESTAMP),
                   date_trunc('month', o.o_orderdate))) AS INT) AS age_m,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey
      GROUP BY fo.cohort_us, age_m
    )
    SELECT cohort_us, age_m, cents,
           CAST(sum(cents) OVER (PARTITION BY cohort_us ORDER BY age_m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents
    FROM rev
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV curve per acquisition cohort: revenue by months
    since first order, accumulated within each cohort — the curve whose
    plateau height is cohort lifetime value (repeat_purchase_rate's
    dollar-denominated sibling). Month age via calendar month_diff
    (year-boundary safe); the cumulative pass is a COHORT-partitioned
    window over the months-sized rollup (parallel across cohorts, never
    a global sort); cents exact."""
    orders = load_table(spark, sf_dir, "orders")
    fo = orders.groupBy("o_custkey").agg(
        F.expr(
            "unix_micros(date_trunc('month',"
            " CAST(min(o_orderdate) AS TIMESTAMP))) AS cohort_us"
        )
    )
    rev = (
        orders.join(fo, "o_custkey")
        .groupBy(
            "cohort_us",
            F.expr(
                "CAST(months_between(date_trunc('month',"
                " CAST(o_orderdate AS TIMESTAMP)),"
                " timestamp_micros(cohort_us)) AS INT)"
            ).alias("age_m"),
        )
        .agg(
            F.expr(
                f"CAST(sum({N.spark_fround_int('o_totalprice * 100')}) AS BIGINT)"
                " AS cents"
            )
        )
    )
    w = Window.partitionBy("cohort_us").orderBy("age_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return rev.withColumn(
        "cum_cents", F.sum("cents").over(w).cast("bigint")
    )


# --- error-vs-volume correlation over hourly buckets -------------------------
@query(
    "error_volume_correlation",
    oracle=f"""
    WITH h AS (
      SELECT epoch_us(ts) // {_US_HOUR} AS hr,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(event_type = 'error' AS INT)) AS BIGINT) AS y
      FROM events GROUP BY hr
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM h
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS pearson_r
    FROM s
    """,
)
def error_volume_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hourly traffic volume and hourly error
    count — the load-vs-failure diagnostic (r near 1 = errors scale with
    load, a capacity smell; r near 0 = load-independent faults). Both
    series are integer counts, so every sufficient statistic is an exact
    bigint sum — no decimal casts needed — and the correlation is one
    shared double tree over the hours-bounded rollup."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.expr(f"unix_micros(ts) div {_US_HOUR}").alias("hr")).agg(
        F.expr("CAST(count(*) AS BIGINT) AS x"),
        F.expr("CAST(sum(CAST(event_type = 'error' AS INT)) AS BIGINT) AS y"),
    )
    s = h.agg(
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
        F.expr("CAST(sum(x) AS DOUBLE) AS sx"),
        F.expr("CAST(sum(y) AS DOUBLE) AS sy"),
        F.expr("CAST(sum(x * x) AS DOUBLE) AS sxx"),
        F.expr("CAST(sum(y * y) AS DOUBLE) AS syy"),
        F.expr("CAST(sum(x * y) AS DOUBLE) AS sxy"),
    )
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_hours",
        "round((n * sxy - sx * sy)"
        " / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS pearson_r",
    )


# --- night-activity user segments --------------------------------------------
@query(
    "night_activity_segments",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST((epoch_us(ts) % {_US_DAY}) // 3600000000 < 6
                           AS INT)) AS BIGINT) AS n_night
      FROM events GROUP BY user_id
    ),
    seg AS (
      SELECT user_id, n_events,
             CAST(least(n_night * 4 // n_events, 3) AS INT) AS night_band
      FROM u
    )
    SELECT night_band, count(*) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM seg GROUP BY night_band
    """,
)
def night_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Night-owl segmentation: each user's share of activity in the
    00:00-06:00 UTC window, banded into quartile-width buckets (integer
    cross-multiplied — no float shares) — the temporal-behavior feature
    fraud and engagement models both consume. One per-user aggregate +
    a 4-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_events"),
        F.expr(
            f"CAST(sum(CAST((unix_micros(ts) % {_US_DAY}) div 3600000000 < 6"
            " AS INT)) AS BIGINT) AS n_night"
        ),
    )
    seg = u.selectExpr(
        "user_id",
        "n_events",
        "CAST(least(n_night * 4 div n_events, 3) AS INT) AS night_band",
    )
    return seg.groupBy("night_band").agg(
        F.expr("count(*) AS n_users"),
        F.expr("CAST(sum(n_events) AS BIGINT) AS n_events"),
    )


# --- single mean-shift changepoint on the daily revenue series ---------------
@query(
    "changepoint_binary_split",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // {_US_DAY} AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  * CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS vv
      FROM orders GROUP BY d
    ),
    cum AS (
      SELECT d, v, vv,
             coalesce(sum(v) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pv,
             coalesce(sum(vv) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(38,0))) AS pvv,
             row_number() OVER (ORDER BY d) AS rn
      FROM daily
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t, CAST(sum(v) AS BIGINT) AS s,
                   CAST(sum(vv) AS DECIMAL(38,0)) AS ss FROM daily),
    cand AS (
      SELECT d, rn AS n_l, t - rn AS n_r,
             pv + v AS s_l, s - (pv + v) AS s_r,
             (CAST(pvv + vv AS DOUBLE)
              - CAST(pv + v AS DOUBLE) * CAST(pv + v AS DOUBLE)
                / CAST(rn AS DOUBLE))
             + (CAST(ss - (pvv + vv) AS DOUBLE)
                - CAST(s - (pv + v) AS DOUBLE) * CAST(s - (pv + v) AS DOUBLE)
                  / CAST(t - rn AS DOUBLE)) AS cost
      FROM cum, tot
      WHERE rn < t
    ),
    m AS (SELECT min(cost) AS best_cost FROM cand),
    pick AS (SELECT min(d) AS split_d FROM cand, m WHERE cand.cost = m.best_cost)
    SELECT c.d AS split_day, c.n_l AS n_left, c.n_r AS n_right,
           round(CAST(c.s_l AS DOUBLE) / CAST(c.n_l AS DOUBLE) / 100.0, 6)
             AS mean_left,
           round(CAST(c.s_r AS DOUBLE) / CAST(c.n_r AS DOUBLE) / 100.0, 6)
             AS mean_right,
           round((CAST(tot.ss AS DOUBLE)
                  - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                    / CAST(tot.t AS DOUBLE)) / 10000.0, 6) AS sse_total,
           round(c.cost / 10000.0, 6) AS sse_split,
           round(1.0 - c.cost / nullif(CAST(tot.ss AS DOUBLE)
                  - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                    / CAST(tot.t AS DOUBLE), 0.0), 6) AS var_explained
    FROM cand c, pick, tot WHERE c.d = pick.split_d
    """,
)
def changepoint_binary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single mean-shift changepoint (the first step of binary-segmentation /
    PELT-style detection): the split day of the daily-revenue series that
    minimizes SSE_left + SSE_right, with the variance explained by the
    break. Exactness: daily revenue in integer cents, squared terms as
    DECIMAL(38,0), cumulative moments ride the broadcast triangular prefix
    over the calendar-bounded daily table (~2.4k rows — never the fact);
    each candidate's cost is the identical exact-int-to-double expression
    in both engines, so the argmin (tie-break: earliest day) matches
    bit-for-bit. One fact scan; everything downstream is bounded."""
    from ..operators.bounded_seq import exclusive_prefix_sums

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}").alias(
            "d"
        )
    ).agg(
        F.expr(
            f"CAST(sum({N.spark_fround_int('o_totalprice * 100')}) AS BIGINT)"
        ).alias("v"),
    )
    # materialize the bounded (~2.4k-row) daily table: it feeds the
    # triangular prefix, the totals, and both downstream cand
    # evaluations — without this every consumer re-ran the fact rollup.
    # Checkpointing HERE (not at cand) keeps the prefix-sum groupBy on
    # the scan→output path, so the per-row-round plan audit still sees
    # the final 6dp rounds as post-aggregate (optimization r07, §2.4)
    daily = daily.withColumn(
        "vv", F.expr("CAST(v AS DECIMAL(38,0)) * v").cast("decimal(38,0)")
    ).localCheckpoint()
    # one triangular join carries the prefix sums AND the 1-based rank
    # (count_as) — previously a second identical triangle + join built rn
    # separately (optimization r07, guide §2.4)
    cum = (
        exclusive_prefix_sums(daily, "d", ["v", "vv"], count_as="__pc")
        .join(daily, "d")
        .withColumn("rn", (F.col("__pc") + 1).cast("bigint"))
        .drop("__pc")
    )
    tot = daily.agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum("vv").cast("decimal(38,0)").alias("ss"),
    )
    sl = (F.col("prev_v") + F.col("v")).cast("double")
    sr = (F.col("s") - (F.col("prev_v") + F.col("v"))).cast("double")
    # nullif on both denominators: predicate pushdown substitutes this
    # expression into the cost == best_cost filter and CombineFilters
    # evaluates it BEFORE the rn < t guard, so under ANSI mode the rn = t
    # row would hard-error on the right-segment division. NULL cost on
    # those rows is filtered by rn < t anyway — semantics unchanged.
    cost = (
        (F.col("prev_vv") + F.col("vv")).cast("double")
        - sl * sl / F.nullif(F.col("rn").cast("double"), F.lit(0.0))
    ) + (
        (F.col("ss") - (F.col("prev_vv") + F.col("vv"))).cast("double")
        - sr * sr
        / F.nullif((F.col("t") - F.col("rn")).cast("double"), F.lit(0.0))
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("rn") < F.col("t"))
        .select(
            "d",
            F.col("rn").alias("n_l"),
            (F.col("t") - F.col("rn")).cast("bigint").alias("n_r"),
            (F.col("prev_v") + F.col("v")).cast("bigint").alias("s_l"),
            (F.col("s") - (F.col("prev_v") + F.col("v"))).cast("bigint").alias("s_r"),
            cost.alias("cost"),
        )
        # cand feeds the argmin pick AND the final projection; the
        # bounded calendar-day table materializes once (optimization
        # r07, guide §2.4)
        .localCheckpoint()
    )
    # argmin in ONE TakeOrdered pass (optimization r07, guide §2.4):
    # min(cost) → filter == best → min(d) re-derived cand twice; the
    # identical selection (cost asc, earliest day tie-break; cost is
    # never NULL on rn < t rows, nulls_last defends the degenerate
    # corpus) is orderBy + limit 1.
    pick = (
        cand.orderBy(F.asc_nulls_last("cost"), F.asc("d"))
        .limit(1)
        .select(F.col("d").alias("split_d"))
    )
    sse_tot = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("t").cast("double")
    )
    # the key-grouped aggregate below is a no-op on this ≤1-row frame
    # (d is unique) but re-establishes the scan→aggregate boundary the
    # per-row round audit walks: the checkpoints above truncate lineage,
    # and the 6dp BigDecimal rounds must stay post-aggregate (the float
    # fround twin overflows BIGINT at these SSE magnitudes)
    picked = (
        cand.join(F.broadcast(pick), F.col("d") == F.col("split_d"))
        .crossJoin(F.broadcast(tot))
        .groupBy("d", "n_l", "n_r", "s_l", "s_r", "cost", "s", "ss", "t")
        .agg(F.count(F.lit(1)).alias("__one"))
    )
    return (
        picked.select(
            F.col("d").alias("split_day"),
            F.col("n_l").alias("n_left"),
            F.col("n_r").alias("n_right"),
            F.round(
                F.col("s_l").cast("double") / F.col("n_l").cast("double") / 100.0, 6
            ).alias("mean_left"),
            F.round(
                F.col("s_r").cast("double") / F.col("n_r").cast("double") / 100.0, 6
            ).alias("mean_right"),
            F.round(sse_tot / 10000.0, 6).alias("sse_total"),
            F.round(F.col("cost") / 10000.0, 6).alias("sse_split"),
            F.round(
                1.0 - F.col("cost") / F.nullif(sse_tot, F.lit(0.0)), 6
            ).alias("var_explained"),
        )
    )


# --- seasonal-residual anomaly days (dow expectation + MAD robust z) ---------
_ASR_Z = 3.5  # Iglewicz-Hoban modified-z cutoff


@query(
    "anomaly_seasonal_residual",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // {_US_DAY} AS d, count(*) AS x
      FROM orders GROUP BY d
    ),
    dw AS (
      SELECT d % 7 AS dow, CAST(sum(x) AS BIGINT) AS sx,
             CAST(count(*) AS BIGINT) AS nd
      FROM daily GROUP BY d % 7
    ),
    res AS (
      SELECT d, daily.x, dw.dow, sx, nd,
             CAST(daily.x AS DOUBLE)
               - CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE) AS r
      FROM daily JOIN dw ON daily.d % 7 = dw.dow
    ),
    rk AS (
      SELECT a.d,
             coalesce(sum(CASE WHEN abs(b.r) < abs(a.r) THEN 1 ELSE 0 END), 0)
               AS n_less,
             coalesce(sum(CASE WHEN abs(b.r) = abs(a.r) THEN 1 ELSE 0 END), 0)
               AS n_eq
      FROM res a, res b GROUP BY a.d
    ),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM res),
    med AS (
      SELECT min(abs(res.r)) AS mad
      FROM res JOIN rk ON res.d = rk.d, tt
      WHERE rk.n_less < (t + 1) // 2 AND rk.n_less + rk.n_eq >= (t + 1) // 2
    )
    SELECT res.d AS day, CAST(res.dow AS BIGINT) AS dow,
           CAST(res.x AS BIGINT) AS n_orders,
           round(CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS expected,
           round(res.r, 6) AS resid,
           round(0.6745 * res.r / nullif(mad, 0.0), 6) AS z_mad
    FROM res, med
    WHERE abs(0.6745 * res.r / nullif(mad, 0.0)) > {_ASR_Z}
    """,
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Season-aware anomaly days: the day-of-week mean is the expected
    order count, the residual is robust-scored with the MAD
    (modified z = 0.6745·r/MAD, flag |z| > {z} — Iglewicz-Hoban), so a
    globally busy weekday is NOT an anomaly while the same count on a
    quiet Sunday is. Complements anomaly_zscore/anomaly_mad (global, no
    seasonal structure) and seasonal_decompose_daily (which estimates the
    component this query subtracts).

    Exactness: counts are integers, the expectation is one exact-int
    division, and the MAD is the DISCRETE lower median selected by a
    triangular less/eq count over the calendar-bounded residual table —
    no interpolated percentile, so both engines select the identical
    double. Scale shape: one fact scan to the daily table; everything
    after is bounded (7-row seasonal join, ~2.4k-row triangular pass).""".format(
        z=_ASR_Z
    )
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY}").alias(
            "d"
        )
    ).agg(F.count("*").alias("x"))
    dw = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        F.sum("x").cast("bigint").alias("sx"),
        F.count("*").cast("bigint").alias("nd"),
    )
    res = daily.join(
        F.broadcast(dw), daily["d"] % 7 == dw["dow"]
    ).select(
        "d",
        "x",
        "dow",
        "sx",
        "nd",
        (
            F.col("x").cast("double")
            - F.col("sx").cast("double") / F.col("nd").cast("double")
        ).alias("r"),
    )
    rb = res.select(F.col("d").alias("d2"), F.abs(F.col("r")).alias("ar2"))
    rk = (
        res.select("d", F.abs(F.col("r")).alias("ar"))
        .join(F.broadcast(rb), F.lit(True), "cross")
        .groupBy("d")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ar2") < F.col("ar"), 1).otherwise(0)), F.lit(0)
            ).alias("n_less"),
            F.coalesce(
                F.sum(F.when(F.col("ar2") == F.col("ar"), 1).otherwise(0)),
                F.lit(0),
            ).alias("n_eq"),
        )
    )
    tt = res.agg(F.count("*").cast("bigint").alias("t"))
    med = (
        res.join(rk, "d")
        .crossJoin(F.broadcast(tt))
        .filter(
            (F.col("n_less") < F.expr("(t + 1) div 2"))
            & (F.col("n_less") + F.col("n_eq") >= F.expr("(t + 1) div 2"))
        )
        .agg(F.min(F.abs(F.col("r"))).alias("mad"))
    )
    z = 0.6745 * F.col("r") / F.nullif(F.col("mad"), F.lit(0.0))
    return (
        res.crossJoin(F.broadcast(med))
        .filter(F.abs(z) > _ASR_Z)
        .select(
            F.col("d").alias("day"),
            F.col("dow").cast("bigint").alias("dow"),
            F.col("x").cast("bigint").alias("n_orders"),
            F.round(
                F.col("sx").cast("double") / F.col("nd").cast("double"), 6
            ).alias("expected"),
            F.round(F.col("r"), 6).alias("resid"),
            F.round(z, 6).alias("z_mad"),
        )
    )


# --- Harrell's concordance index for a churn-risk marker ---------------------
# Completes the survival family (KM curve, log-rank test) with the metric
# that evaluates a RISK MODEL against censored outcomes. Marker: first-week
# event count (clamped to 20 bins) — the "early engagement predicts
# retention" score every churn model starts from; concordant = the user who
# died earlier had LOWER early engagement. The synthetic event stream keeps
# every user active to within 2 days of the corpus end (KM's 7-day churn
# window censors EVERYONE — its curve is honestly flat), so the churn
# definition here is the tightest one the data supports: not seen on the
# final observed day.
_CIX_BINS = 20
_CIX_CENSOR_DAYS = 1


@query(
    "survival_cindex",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             min(epoch_us(ts) // {_US_DAY}) AS d0,
             max(epoch_us(ts) // {_US_DAY}) AS d1
      FROM events GROUP BY user_id
    ),
    fw AS (
      SELECT e.user_id,
             least(CAST(count(*) AS BIGINT), {_CIX_BINS - 1}) AS m
      FROM events e JOIN per_user p ON e.user_id = p.user_id
      WHERE epoch_us(e.ts) // {_US_DAY} < p.d0 + 7
      GROUP BY e.user_id
    ),
    g AS (SELECT max(d1) AS dmax FROM per_user),
    u AS (
      SELECT CAST(p.d1 - p.d0 AS BIGINT) AS t,
             CAST(p.d1 <= dmax - {_CIX_CENSOR_DAYS} AS BIGINT) AS died,
             fw.m
      FROM per_user p JOIN fw ON p.user_id = fw.user_id CROSS JOIN g
    ),
    cells AS (
      SELECT t, m, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(died) AS BIGINT) AS d
      FROM u GROUP BY t, m
    ),
    grid AS (
      SELECT ts.t, b.m, coalesce(c.cnt, 0) AS cnt, coalesce(c.d, 0) AS d
      FROM (SELECT DISTINCT t FROM cells) ts
      CROSS JOIN (SELECT unnest(generate_series(0, {_CIX_BINS - 1})) AS m) b
      LEFT JOIN cells c ON c.t = ts.t AND c.m = b.m
    ),
    suff AS (
      SELECT t, m, cnt, d,
             coalesce(sum(cnt) OVER (PARTITION BY m ORDER BY t
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS s
      FROM grid
    ),
    dom AS (
      SELECT t, m, cnt, d, s,
             coalesce(sum(s) OVER (PARTITION BY t ORDER BY m
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS conc,
             sum(s) OVER (PARTITION BY t) AS comp
      FROM suff
    ),
    agg AS (
      SELECT CAST(sum(d * conc) AS BIGINT) AS n_conc,
             CAST(sum(d * s) AS BIGINT) AS n_tie,
             CAST(sum(d * comp) AS BIGINT) AS n_comp
      FROM dom
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_users,
           n_comp AS n_comparable,
           n_conc AS n_concordant,
           n_tie AS n_tied_marker,
           round(CAST(2 * n_conc + n_tie AS DOUBLE)
                 / nullif(CAST(2 * n_comp AS DOUBLE), 0.0), 6) AS c_index
    FROM agg
    """,
)
def survival_cindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harrell's concordance index of the first-week-engagement marker
    against censored user lifetimes: over all comparable pairs (i died at
    t_i, j still observed past t_i), the fraction where the earlier death
    had the lower marker (ties count half). The survival-model twin of
    AUROC — and like the r5 AUROC re-plan, computed WITHOUT any pairwise
    join: user lifetimes compress to a dense (distinct-lifetime x
    {b}-bin) grid, a suffix window per bin counts later-observed users,
    a second window per lifetime accumulates the marker dominance, and
    three integer sums finish it. Both windows are PARTITIONED (bin /
    lifetime) with calendar- and constant-bounded partitions — nothing
    scales with user count after the per-user compression. All counting
    integer; one division, rounded 6dp.""".format(b=_CIX_BINS)
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_US_DAY}")
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    fw = (
        # plain shuffle equi-join: per_user has one row per user and grows
        # with data size, so a forced broadcast would OOM at large SF
        # (ADVICE r6); the planner may still broadcast when it fits.
        ev.join(per_user.select("user_id", "d0"), "user_id")
        .filter(day < F.col("d0") + 7)
        .groupBy("user_id")
        .agg(
            F.least(F.count("*").cast("bigint"), F.lit(_CIX_BINS - 1)).alias("m")
        )
    )
    g = per_user.agg(F.max("d1").alias("dmax"))
    u = (
        per_user.join(fw, "user_id")
        .crossJoin(F.broadcast(g))
        .select(
            (F.col("d1") - F.col("d0")).cast("bigint").alias("t"),
            (F.col("d1") <= F.col("dmax") - _CIX_CENSOR_DAYS)
            .cast("bigint")
            .alias("died"),
            "m",
        )
    )
    cells = u.groupBy("t", "m").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("died").cast("bigint").alias("d"),
    )
    bins = spark.range(_CIX_BINS).select(F.col("id").cast("bigint").alias("m"))
    grid = (
        cells.select("t")
        .distinct()
        .crossJoin(F.broadcast(bins))
        .join(cells, ["t", "m"], "left")
        .select(
            "t",
            "m",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
        )
    )
    w_suff = (
        Window.partitionBy("m")
        .orderBy("t")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    suff = grid.select(
        "t",
        "m",
        "cnt",
        "d",
        F.coalesce(F.sum("cnt").over(w_suff), F.lit(0)).alias("s"),
    )
    w_dom = (
        Window.partitionBy("t")
        .orderBy("m")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w_all = Window.partitionBy("t")
    dom = suff.select(
        "t",
        "m",
        "d",
        "s",
        F.coalesce(F.sum("s").over(w_dom), F.lit(0)).alias("conc"),
        F.sum("s").over(w_all).alias("comp"),
    )
    agg = dom.agg(
        F.sum(F.col("d") * F.col("conc")).cast("bigint").alias("n_conc"),
        F.sum(F.col("d") * F.col("s")).cast("bigint").alias("n_tie"),
        F.sum(F.col("d") * F.col("comp")).cast("bigint").alias("n_comp"),
    )
    nu = u.agg(F.count("*").cast("bigint").alias("n_users"))
    return agg.crossJoin(F.broadcast(nu)).select(
        "n_users",
        F.col("n_comp").alias("n_comparable"),
        F.col("n_conc").alias("n_concordant"),
        F.col("n_tie").alias("n_tied_marker"),
        F.round(
            (2 * F.col("n_conc") + F.col("n_tie")).cast("double")
            / F.nullif((2 * F.col("n_comp")).cast("double"), F.lit(0.0)),
            6,
        ).alias("c_index"),
    )


# --- MATCH_RECOGNIZE-style journey pattern matching --------------------------
# The funnel queries count step PRESENCE; this matches an ORDERED pattern
# with an exclusion: view -> click -> purchase with no error anywhere
# between the matched steps (the "clean conversion path" question
# MATCH_RECOGNIZE answers in engines that have it).
_EPM_PATTERN = "v[^e]*c[^e]*p"


@query(
    "events_pattern_match",
    oracle=f"""
    WITH j AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS journey
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(regexp_matches(journey, '{_EPM_PATTERN}') AS INT) AS matched
    FROM j
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence pattern matching over user journeys: each user's
    events collapse (ordered by timestamp, event_id as the deterministic
    tiebreak) into a first-letter journey string; the regex
    '{_EPM_PATTERN}' asks for a view→click→purchase path with no error
    between the matched steps — the MATCH_RECOGNIZE question expressed
    with the engines' common denominator (ordered per-key reduction +
    regex).

    Scale shape: one fact scan, one per-user shuffle; the collected
    journey is bounded by per-user activity (the sessionization
    assumption every per-user reduction here makes), and the regex is a
    linear scan of it. No cross-user state."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct("
            "unix_micros(CAST(ts AS TIMESTAMP)) AS t, event_id AS i,"
            " substring(event_type, 1, 1) AS c))), s -> s.c), '') AS journey"
        ),
    )
    return j.select(
        "user_id",
        "n_events",
        F.col("journey").rlike(_EPM_PATTERN).cast("int").alias("matched"),
    )


# --- Markov removal-effect attribution ----------------------------------------
# attribution_last_touch is position-based; the Markov model (Anderl et al.
# 2014) credits each channel by its REMOVAL EFFECT: how much the journey
# conversion probability drops if the channel vanishes (flows into it go to
# the null absorber — no renormalization). Channels: view/click/signup;
# purchase absorbs as conversion; error events are not touchpoints and are
# dropped. The absorbing-chain solve (I-Q)x = b is done in CLOSED FORM by
# Cramer's rule with Python-generated Leibniz determinants (the feature_vif
# technique), so there is no iteration and no driver-side linear algebra —
# the whole model is one expression tree over the 20-cell transition matrix.
_MKV_STATES = ("s", "v", "c", "g")  # transient: start, view, click, signup
_MKV_TO = ("v", "c", "g", "p", "n")  # targets: channels + purchase + null


def _mkv_det(entries, idx):
    """Leibniz determinant over the submatrix of `entries` (dict
    (i, j) -> SQL string) restricted to row/col positions in idx."""
    import itertools

    k = len(idx)
    terms = []
    for perm in itertools.permutations(range(k)):
        inv = sum(
            1
            for a in range(k)
            for b in range(a + 1, k)
            if perm[a] > perm[b]
        )
        sign = "-" if inv % 2 else "+"
        prod = " * ".join(entries[(idx[r], idx[perm[r]])] for r in range(k))
        terms.append(f"{sign} ({prod})")
    return "(" + " ".join(terms) + ")"


def _mkv_exprs():
    """(channel -> (p_full, p_removed) SQL strings) over the q_/b_ names."""
    S = _MKV_STATES
    a = {}
    for i, si in enumerate(S):
        for j, sj in enumerate(S):
            base = f"q_{si}{sj}"
            a[(i, j)] = (
                f"(1.0 - {base})" if i == j else f"(0.0 - {base})"
            )
    b = {i: f"b_{si}" for i, si in enumerate(S)}

    def cramer(idx):
        den = _mkv_det(a, idx)
        num_entries = dict(a)
        for r in idx:
            num_entries[(r, idx[0])] = b[r]  # replace the start column
        num = _mkv_det(num_entries, idx)
        return f"({num} / nullif({den}, 0.0))"

    full_idx = list(range(len(S)))
    p_full = cramer(full_idx)
    removed = {}
    for m, ch in enumerate(S):
        if ch == "s":
            continue
        removed[ch] = cramer([i for i in full_idx if i != m])
    return p_full, removed


def _mkv_stats_sql(pair_src: str) -> str:
    """Select list: n_ij counts, r_i totals, q_ij = n_ij/r_i, b_i."""
    # q entries: transient -> transient (s never a target => q_*s = 0)
    sel = []
    for si in _MKV_STATES:
        r = (
            "nullif(CAST("
            + " + ".join(
                f"sum(CASE WHEN f = '{si}' AND t = '{sj}' THEN 1 ELSE 0 END)"
                for sj in _MKV_TO
            )
            + " AS DOUBLE), 0.0)"
        )
        for sj in _MKV_STATES:
            if sj == "s":
                sel.append(f"0.0 AS q_{si}{sj}")
            else:
                n = (
                    f"CAST(sum(CASE WHEN f = '{si}' AND t = '{sj}'"
                    " THEN 1 ELSE 0 END) AS DOUBLE)"
                )
                sel.append(f"coalesce({n} / {r}, 0.0) AS q_{si}{sj}")
        np_ = (
            f"CAST(sum(CASE WHEN f = '{si}' AND t = 'p'"
            " THEN 1 ELSE 0 END) AS DOUBLE)"
        )
        sel.append(f"coalesce({np_} / {r}, 0.0) AS b_{si}")
    return f"SELECT {', '.join(sel)} FROM ({pair_src})"


_MKV_JOURNEY_SQL = """
  SELECT user_id,
         CASE WHEN strpos(j, 'p') > 0
              THEN 's' || substring(j, 1, strpos(j, 'p'))
              ELSE 's' || j || 'n' END AS path
  FROM (
    SELECT user_id,
           string_agg(CASE event_type WHEN 'view' THEN 'v'
                                      WHEN 'click' THEN 'c'
                                      WHEN 'signup' THEN 'g'
                                      ELSE 'p' END, ''
                      ORDER BY epoch_us(ts), event_id) AS j
    FROM events
    WHERE event_type IN ('view', 'click', 'signup', 'purchase')
    GROUP BY user_id
  )
"""

_MKV_PAIRS_SQL = f"""
  SELECT substring(path, i, 1) AS f, substring(path, i + 1, 1) AS t
  FROM ({_MKV_JOURNEY_SQL}) jj,
       unnest(generate_series(1, length(path) - 1)) u(i)
"""


def _mkv_oracle() -> str:
    p_full, removed = _mkv_exprs()
    return f"""
    WITH stats AS ({_mkv_stats_sql(_MKV_PAIRS_SQL)})
    SELECT channel, p_conversion, p_without, removal_effect,
           round(removal_effect
                 / nullif(sum(removal_effect) OVER (), 0.0), 6)
             AS attribution_share
    FROM (
      {" UNION ALL ".join(
        "SELECT '" + {"v": "view", "c": "click", "g": "signup"}[ch]
        + "' AS channel,"
        + " round(" + p_full + ", 6) AS p_conversion,"
        + " round(" + p_rm + ", 6) AS p_without,"
        + " round(1.0 - " + p_rm + " / nullif(" + p_full + ", 0.0), 6)"
        + " AS removal_effect FROM stats"
        for ch, p_rm in removed.items())}
    )
    """


@query("attribution_markov_removal", oracle=_mkv_oracle())
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution with removal effects: user journeys over
    the view/click/signup touchpoints (truncated at first purchase; error
    events are not touchpoints) become a first-order transition matrix;
    conversion probability is the absorbing-chain solve (I-Q)x = b
    evaluated in CLOSED FORM via Cramer's rule with generated Leibniz
    determinants (no iteration, no driver linear algebra); each channel's
    credit is its removal effect 1 - P(conv | channel deleted)/P(conv),
    normalized into attribution shares.

    Scale shape: one per-user ordered reduction (the journey string),
    one linear bigram explode, one 20-cell count matrix — the model fit
    is O(corpus) with a constant-size state. Every q entry is an exact
    integer ratio; the determinant expressions are identical literal
    trees in both engines."""
    ev = load_table(spark, sf_dir, "events")
    j = (
        ev.filter(
            F.col("event_type").isin("view", "click", "signup", "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct("
                "unix_micros(CAST(ts AS TIMESTAMP)) AS t, event_id AS i,"
                " CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'"
                " WHEN 'signup' THEN 'g' ELSE 'p' END AS c))), s -> s.c), '')"
                " AS j"
            )
        )
        .selectExpr(
            "CASE WHEN instr(j, 'p') > 0"
            " THEN concat('s', substring(j, 1, instr(j, 'p')))"
            " ELSE concat('s', j, 'n') END AS path"
        )
    )
    pairs = j.selectExpr(
        "explode(transform(sequence(1, length(path) - 1),"
        " i -> struct(substring(path, i, 1) AS f,"
        " substring(path, i + 1, 1) AS t))) AS pr"
    ).select("pr.f", "pr.t")
    stats_sql = _mkv_stats_sql("__SRC__")
    sel_list = stats_sql[len("SELECT ") : stats_sql.index(" FROM (")]
    from .metrics import _split_top_level_commas

    stats = pairs.agg(
        *[F.expr(e) for e in _split_top_level_commas(sel_list)]
    )
    p_full, removed = _mkv_exprs()
    names = {"v": "view", "c": "click", "g": "signup"}
    rows = None
    for ch, p_rm in removed.items():
        r = stats.selectExpr(
            f"'{names[ch]}' AS channel",
            f"round({p_full}, 6) AS p_conversion",
            f"round({p_rm}, 6) AS p_without",
            f"round(1.0 - {p_rm} / nullif({p_full}, 0.0), 6)"
            " AS removal_effect",
        )
        rows = r if rows is None else rows.unionByName(r)
    tot = rows.agg(F.sum("removal_effect").alias("re_tot"))
    return rows.crossJoin(F.broadcast(tot)).select(
        "channel",
        "p_conversion",
        "p_without",
        "removal_effect",
        F.round(
            F.col("removal_effect") / F.nullif(F.col("re_tot"), F.lit(0.0)), 6
        ).alias("attribution_share"),
    )


# --- entropy rate of the event-type chain --------------------------------------
@query(
    "events_entropy_rate",
    oracle="""
    WITH bi AS (
      SELECT a, b FROM (
        SELECT event_type AS a,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS b
        FROM events
      ) WHERE b IS NOT NULL
    ),
    tm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY a, b),
    rt AS (SELECT a, CAST(sum(c) AS BIGINT) AS r FROM tm GROUP BY a),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tm),
    hrate AS (
      SELECT CAST(sum(CAST(round(
               -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(r AS DOUBLE)), 9)
             AS DECIMAL(25,12))) AS DOUBLE) AS h_rate
      FROM tm JOIN rt USING (a), tot
    ),
    hmarg AS (
      SELECT CAST(sum(CAST(round(
               -(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(25,12))) AS DOUBLE) AS h_marg
      FROM rt, tot
    )
    SELECT n AS n_transitions,
           round(h_rate, 6) AS entropy_rate_nats,
           round(h_marg, 6) AS marginal_entropy_nats,
           round(1.0 - h_rate / nullif(h_marg, 0.0), 6) AS predictability
    FROM hrate, hmarg, tot
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type chain — how many nats the
    NEXT event carries given the current one — against the marginal
    entropy, with predictability = 1 − H_rate/H_marginal (0 = memoryless
    traffic, 1 = deterministic journeys). The information-theoretic
    companion to event_transition_matrix (raw probabilities) and
    user_behavior_entropy (per-user mix): it tells a sessionization or
    next-event-model effort how much signal sequence order even holds.

    Exactness: transition counts are integers from the user-partitioned
    lead window; each plogp term quantizes to 9dp DECIMAL before the
    order-free sum over the ≤ |types|² cells."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bi = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter("b IS NOT NULL")
    tm = bi.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("c"))
    rt = tm.groupBy("a").agg(F.sum("c").cast("bigint").alias("r"))
    tot = tm.agg(F.sum("c").cast("bigint").alias("n"))
    hrate = (
        tm.join(F.broadcast(rt), "a")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                N.fround(
                    -(F.col("c").cast("double") / F.col("n").cast("double"))
                    * F.log(F.col("c").cast("double") / F.col("r").cast("double")),
                    9,
                ).cast("decimal(25,12)")
            )
            .cast("double")
            .alias("h_rate")
        )
    )
    hmarg = rt.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            N.fround(
                -(F.col("r").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("r").cast("double") / F.col("n").cast("double")),
                9,
            ).cast("decimal(25,12)")
        )
        .cast("double")
        .alias("h_marg")
    )
    return (
        tot.crossJoin(F.broadcast(hrate))
        .crossJoin(F.broadcast(hmarg))
        .select(
            F.col("n").alias("n_transitions"),
            F.round("h_rate", 6).alias("entropy_rate_nats"),
            F.round("h_marg", 6).alias("marginal_entropy_nats"),
            F.round(
                1.0 - F.col("h_rate") / F.nullif(F.col("h_marg"), F.lit(0.0)), 6
            ).alias("predictability"),
        )
    )
