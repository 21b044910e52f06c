"""Evaluation metrics + splits/CV + model selection (SURVEY.md §2.10).

Exact-SQL implementations of the reference's sklearn metrics
(`src/utils/metrics.py:11-48`, `teamProject/utils/evaluation.py:26-92`,
`error_analysis.ipynb:454-470`) over a deterministic derived
prediction table (see joins_unions.truth_frame/pred_frame). Everything here
is integer-count arithmetic + single divisions, so results are exact;
compound formulas (F1, t-style) are rounded to 6dp against FMA contraction.

Scale notes: each metric is one aggregation over the scored table — a single
shuffle-free partial agg. AUROC's rank sum runs over the DISTINCT-prob
compression (groupBy prob before any window), so the only ordered window
sees one row per distinct score — same compression family as rank_ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..operators.bounded_seq import exclusive_prefix_sums
from ..registry import query
from ..sources import load_table
from ._shared import _PRED_SQL, _TRUTH_SQL

_SCORED_SQL = f"""
  SELECT t.id, t.label, p.prob, p.pred
  FROM ({_TRUTH_SQL}) t JOIN ({_PRED_SQL}) p ON t.id = p.id
"""


def scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label+prob+pred in ONE projection of orders. Semantically this is
    truth_frame ⋈ pred_frame on id — but both sides derive from the same
    orders row and o_orderkey is unique, so the join is an identity Spark
    cannot prove (no uniqueness constraints): writing it as a join costs
    two scans plus a sort-merge shuffle in EVERY metric query. The oracle
    keeps the explicit join form (DuckDB flattens it); J2's
    `join_pred_truth` still exercises the real join."""
    prob = "CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0D"
    return load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS id",
        "CAST(o_totalprice > 150000.0D AS INT) AS label",
        f"{prob} AS prob",
        f"CAST({prob} >= 0.5D AS INT) AS pred",
    )


# --- E8: accuracy (cross-validation/wine_analysis.py:109) -------------------
@query(
    "metric_accuracy",
    oracle=f"""
    SELECT CAST(sum(CAST(pred = label AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS accuracy,
           count(*) AS n
    FROM ({_SCORED_SQL})
    """,
)
def metric_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = scored_frame(spark, sf_dir)
    return s.agg(
        (
            F.sum((F.col("pred") == F.col("label")).cast("bigint")).cast("double")
            / F.count("*").cast("double")
        ).alias("accuracy"),
        F.count("*").alias("n"),
    )


# --- E9: F1 binary/per-class/macro (src/utils/metrics.py:15) ----------------
_CONF_SQL = f"""
  SELECT sum(CAST(label = 1 AND pred = 1 AS BIGINT)) AS tp,
         sum(CAST(label = 0 AND pred = 1 AS BIGINT)) AS fp,
         sum(CAST(label = 1 AND pred = 0 AS BIGINT)) AS fn,
         sum(CAST(label = 0 AND pred = 0 AS BIGINT)) AS tn
  FROM ({_SCORED_SQL})
"""


@query(
    "metric_f1",
    oracle=f"""
    WITH c AS ({_CONF_SQL})
    SELECT round(2.0 * tp / nullif(2.0 * tp + fp + fn, 0), 6) AS f1_pos,
           round(2.0 * tn / nullif(2.0 * tn + fn + fp, 0), 6) AS f1_neg,
           round((2.0 * tp / nullif(2.0 * tp + fp + fn, 0)
                + 2.0 * tn / nullif(2.0 * tn + fn + fp, 0)) / 2.0, 6) AS macro_f1
    FROM c
    """,
)
def metric_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sklearn-matching F1: per-class from confusion counts, macro = mean.
    (2TP/(2TP+FP+FN) form avoids the precision/recall intermediate and its
    division-by-zero conventions.)"""
    s = scored_frame(spark, sf_dir)
    c = s.agg(
        F.sum(((F.col("label") == 1) & (F.col("pred") == 1)).cast("bigint")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("pred") == 1)).cast("bigint")).alias("fp"),
        F.sum(((F.col("label") == 1) & (F.col("pred") == 0)).cast("bigint")).alias("fn"),
        F.sum(((F.col("label") == 0) & (F.col("pred") == 0)).cast("bigint")).alias("tn"),
    )
    f1_pos = 2.0 * F.col("tp") / F.nullif(2.0 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0))
    f1_neg = 2.0 * F.col("tn") / F.nullif(2.0 * F.col("tn") + F.col("fn") + F.col("fp"), F.lit(0))
    return c.select(
        F.round(f1_pos, 6).alias("f1_pos"),
        F.round(f1_neg, 6).alias("f1_neg"),
        F.round((f1_pos + f1_neg) / 2.0, 6).alias("macro_f1"),
    )


# --- E10: ROC-AUC via average ranks (src/utils/metrics.py:16) ---------------
# AUC = (Σ ranks of positives − n⁺(n⁺+1)/2) / (n⁺ n⁻), average ranks for
# ties — the exact Mann-Whitney identity sklearn uses. All rank arithmetic
# runs in DOUBLED half-units (2·rank, so ties average to integers) and
# accumulates in DECIMAL(38,0) Spark-side / int128 oracle-side, so the rank
# sum is exact for ANY npos·N < ~1e38 — no 2^53 double-mantissa bound
# (VERDICT r6 #2 removed the old half-integer double accumulation).
#
# Quantization contract (enforced in BOTH engines, not assumed): scores are
# ranked at _PROB_SCALE decimals. That bounds the distinct-prob table to
# ≤ 10^_PROB_SCALE + 1 rows by construction — with continuous probabilities
# an unquantized distinct table is ≈ n and any ordered pass over it becomes
# a single-partition sort of the fact (VERDICT r2 #2). 6dp is far below
# any model's meaningful score resolution (sklearn's roc_auc_score ties at
# float64, but AUC differences under 1e-6 in score space are noise).
_PROB_SCALE = 6
# oracle twin: r2 = 2·rank + (ties − 1) = doubled average rank, an integer;
# DuckDB sums bigints in int128, so the rank sum is exact at any scale.
_RANKED2_SQL = f"""
  SELECT label,
         2 * rank() OVER (ORDER BY round(prob, {_PROB_SCALE}))
           + count(*) OVER (PARTITION BY round(prob, {_PROB_SCALE})) - 1
           AS r2
  FROM ({_SCORED_SQL})
"""
# shared oracle tail: exact integer numerator, one double division — the
# identical expression Spark builds from (rank_sum2, npos, nneg)
_AUROC_FROM_R2_SQL = """
      SELECT sum(CASE WHEN label = 1 THEN r2 END) AS rs2,
             CAST(sum(CAST(label = 1 AS BIGINT)) AS BIGINT) AS npos,
             CAST(sum(CAST(label = 0 AS BIGINT)) AS BIGINT) AS nneg
      FROM r
"""

_RANK_BUCKETS = 1024


def _auroc_counts(s: DataFrame) -> DataFrame:
    """Stage 1 of the rank agg: per-distinct-quantized-score (t, tp) counts
    — the only fact-scale stage, fully parallel, map-side combined.

    Integer quantization key: q = floor(prob*10^s + 0.5) is exactly
    DuckDB's round(prob, s) for non-negative doubles (std::round is
    multiply-then-half-away there), maps 1:1 onto the oracle's distinct
    rounded probs (q/10^s are distinct doubles for distinct q), and keeps
    the group key a BIGINT — no per-row BigDecimal boxing (Spark's double
    round), cheaper group hashing, and bucket assignment becomes a pure
    integer DIV (any monotone function of q preserves the rank order)."""
    _Q = 10**_PROB_SCALE
    return s.groupBy(
        F.expr(f"CAST(FLOOR(prob * {_Q} + 0.5D) AS BIGINT)").alias("prob")
    ).agg(F.expr("count(*) AS t"), F.expr("CAST(sum(label) AS BIGINT) AS tp"))


def _auroc_rank_from_counts(vb: DataFrame) -> DataFrame:
    """Stages 2-3 of the rank agg, over a (prob, t, tp) distinct-score
    count table: one-row (rank_sum2, npos, nneg) where rank_sum2 is the
    EXACT doubled rank sum of positives (2·Σ r_avg), a DECIMAL(38,0).

      2. groupBy(bucket): probabilities live in [0,1] so the bucket is a
         literal expression (no min/max pass). Each bucket's IN-BUCKET
         doubled rank contribution is a sorted-array fold
         (array_sort(collect_list) + aggregate()) over its ≤
         ceil(10^_PROB_SCALE/_RANK_BUCKETS) distinct scores — bounded by
         the quantization contract, evaluated JVM-side per group.
      3. global: one fold over the ≤_RANK_BUCKETS bucket rows combines
         cross-bucket offsets (exclusive prefix of bucket totals) with
         the local terms.

    rank_sum2 = Σ_b (2·offset_b · tp_b + local2_b) with
    local2 = Σ_x tp_x · (2·cum_below + t_x + 1) — every term an INTEGER
    accumulated in DECIMAL(38,0), so the sum is exact and order-independent
    (bit-identical to row-level rank() in any engine) for any npos·N below
    ~10^38: the old npos·N < 2^53 half-integer-double bound is gone
    (VERDICT r6 #2; the >2^53 golden lives in tests/test_rank_ops.py).
    Cursor bounds: cum/off are row counts (< 2^63 always); the per-term
    products run in decimal.
    No window ever sees a table whose size grows with the fact, and the
    plan is one job of three stages with a single fact-scale shuffle."""
    _Q = 10**_PROB_SCALE
    _BW = _Q // _RANK_BUCKETS + 1  # ceil: q in [0, 10^s] -> b in [0, 1023]
    vb = vb.withColumn("b", F.expr(f"CAST(prob DIV {_BW} AS INT)"))
    # in-bucket doubled rank contribution: running cum of t over scores
    # ascending; each score adds tp · (2·cum_below + t + 1)
    bucket = vb.groupBy("b").agg(
        F.expr("sum(t) AS tb"),
        F.expr("CAST(sum(tp) AS BIGINT) AS tpb"),
        F.expr(
            """
            aggregate(
              array_sort(collect_list(struct(prob, t, tp))),
              struct(CAST(0 AS BIGINT) AS cum,
                     CAST(0 AS DECIMAL(38,0)) AS acc),
              (s, x) -> struct(
                s.cum + x.t,
                CAST(s.acc + CAST(x.tp AS DECIMAL(38,0))
                        * CAST(2 * s.cum + x.t + 1 AS DECIMAL(38,0))
                     AS DECIMAL(38,0))),
              s -> s.acc
            ) AS local2
            """
        ),
    )
    # cross-bucket: offset_b = Σ_{b'<b} tb' folded over the sorted
    # ≤_RANK_BUCKETS bucket rows; rank_sum2 = Σ_b 2·offset_b·tpb + local2_b
    z = bucket.agg(
        F.expr(
            """
            aggregate(
              array_sort(collect_list(struct(b, tb, tpb, local2))),
              struct(CAST(0 AS BIGINT) AS off,
                     CAST(0 AS DECIMAL(38,0)) AS rs2,
                     CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS nt),
              (s, x) -> struct(
                s.off + x.tb,
                CAST(s.rs2 + CAST(x.tpb AS DECIMAL(38,0))
                        * CAST(2 * s.off AS DECIMAL(38,0)) + x.local2
                     AS DECIMAL(38,0)),
                s.np + x.tpb, s.nt + x.tb),
              s -> s
            ) AS z
            """
        )
    )
    return z.select(
        F.col("z.rs2").alias("rank_sum2"),
        F.col("z.np").alias("npos"),
        (F.col("z.nt") - F.col("z.np")).alias("nneg"),
    )


def _auroc_rank_agg(s: DataFrame) -> DataFrame:
    """One-row (rank_sum2, npos, nneg) as a LINEAR chain of three
    aggregations — no window, no checkpoint, no branch reuse (VERDICT r4
    #2 fused the old two-phase prefix-sum's group/bucket stages; this
    goes further and removes the window exchange too). See
    _auroc_counts / _auroc_rank_from_counts for the stage contracts."""
    return _auroc_rank_from_counts(_auroc_counts(s))


def _auroc_expr() -> "F.Column":
    """AUC from (rank_sum2, npos, nneg): exact integer numerator
    rank_sum2 − npos(npos+1) in decimal, ONE double division — the
    bit-identical twin of the oracle's CAST(rs2 - npos*(npos+1) AS DOUBLE)
    / (2.0 * npos * nneg)."""
    num = F.col("rank_sum2") - F.col("npos").cast("decimal(38,0)") * (
        F.col("npos") + 1
    ).cast("decimal(38,0)")
    return num.cast("double") / (
        F.lit(2.0) * F.col("npos").cast("double") * F.col("nneg").cast("double")
    )


@query(
    "metric_auroc",
    oracle=f"""
    WITH r AS ({_RANKED2_SQL}),
    s AS (
      {_AUROC_FROM_R2_SQL}
    )
    SELECT round(CAST(rs2 - npos * (npos + 1) AS DOUBLE)
                 / (2.0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)), 6)
             AS auroc,
           npos, nneg
    FROM s
    """,
)
def metric_auroc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-compressed AUROC: quantize to _PROB_SCALE decimals (the contract
    is IN the plan, not a comment — round bounds the distinct table), group
    by distinct score, then the bucketed sorted-array folds in
    _auroc_rank_agg compute doubled mean ranks with no window at all. Each
    score's doubled mean rank = 2·(#rows below) + ties + 1; rank sums are
    exact integers in DECIMAL(38,0) (int128 in the oracle), so this is
    identical to ranking every row at ANY fact scale."""
    agg = _auroc_rank_agg(scored_frame(spark, sf_dir))
    return agg.select(F.round(_auroc_expr(), 6).alias("auroc"), "npos", "nneg")


# --- E11: confusion matrix (teamProject/utils/evaluation.py:83-92) ----------
@query(
    "metric_confusion",
    oracle=f"SELECT label, pred, count(*) AS n FROM ({_SCORED_SQL}) GROUP BY label, pred",
)
def metric_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        scored_frame(spark, sf_dir)
        .groupBy("label", "pred")
        .agg(F.count("*").alias("n"))
    )


# --- E12: log-loss (wine…11….ipynb:5543) ------------------------------------
@query(
    "metric_logloss",
    oracle=f"""
    WITH p AS (
      SELECT round(ln(greatest(least(CASE WHEN label = 1 THEN prob
                                          ELSE 1.0 - prob END,
                                     1.0 - 1e-15), 1e-15)), 8) AS lp
      FROM ({_SCORED_SQL})
    )
    SELECT round(-CAST(sum(CAST(lp AS DECIMAL(20,8))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS logloss,
           count(*) AS n
    FROM p
    """,
)
def metric_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-avg(log p_true) with sklearn's eps clipping; per-row log rounded to
    8dp (libm ulp) then decimal-summed (order independence)."""
    s = scored_frame(spark, sf_dir)
    p_true = F.when(F.col("label") == 1, F.col("prob")).otherwise(1.0 - F.col("prob"))
    lp = N.fround(
        F.log(F.greatest(F.least(p_true, F.lit(1.0 - 1e-15)), F.lit(1e-15))), 8
    )
    return s.select(lp.alias("lp")).agg(
        F.round(
            -F.sum(F.col("lp").cast("decimal(20,8)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("logloss"),
        F.count("*").alias("n"),
    )


# --- E14: threshold sweep (error_analysis.ipynb:454-470) --------------------
@query(
    "threshold_sweep",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    th AS (SELECT i / 20.0 AS threshold FROM generate_series(2, 18) t(i)),
    c AS (
      SELECT th.threshold,
             sum(CAST(s.label = 1 AND s.prob >= th.threshold AS BIGINT)) AS tp,
             sum(CAST(s.label = 0 AND s.prob >= th.threshold AS BIGINT)) AS fp,
             sum(CAST(s.label = 1 AND s.prob < th.threshold AS BIGINT)) AS fn,
             sum(CAST(s.label = 0 AND s.prob < th.threshold AS BIGINT)) AS tn
      FROM s CROSS JOIN th GROUP BY th.threshold
    )
    SELECT round(threshold, 6) AS threshold,
           round(CAST(tp + tn AS DOUBLE) / (tp + tn + fp + fn), 6) AS accuracy,
           round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_,
           round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_,
           round(2.0 * tp / nullif(2.0 * tp + fp + fn, 0), 6) AS f1
    FROM c
    """,
)
def threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over the fact to per-score counts, then the threshold cross
    join runs on the compressed (score → counts) table: 17 thresholds scored
    without 17 scans (reference loops) and without a 17x row blow-up."""
    s = scored_frame(spark, sf_dir)
    per = s.groupBy("prob").agg(
        F.expr("count(*) AS t"), F.expr("CAST(sum(label) AS BIGINT) AS pos")
    )
    th = spark.range(2, 19).selectExpr("id / 20.0D AS threshold")
    c = per.crossJoin(F.broadcast(th)).groupBy("threshold").agg(
        F.expr("sum(CASE WHEN prob >= threshold THEN pos ELSE 0 END) AS tp"),
        F.expr("sum(CASE WHEN prob >= threshold THEN t - pos ELSE 0 END) AS fp"),
        F.expr("sum(CASE WHEN NOT prob >= threshold THEN pos ELSE 0 END) AS fn"),
        F.expr("sum(CASE WHEN NOT prob >= threshold THEN t - pos ELSE 0 END) AS tn"),
    )
    return c.selectExpr(
        "round(threshold, 6) AS threshold",
        "round(CAST(tp + tn AS DOUBLE) / (tp + tn + fp + fn), 6) AS accuracy",
        "round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_",
        "round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_",
        "round(2.0D * tp / nullif(2.0D * tp + fp + fn, 0), 6) AS f1",
    )


# --- E13: composite score (src/utils/metrics.py:20-48) ----------------------
@query(
    "score_combined",
    oracle=f"""
    WITH c AS ({_CONF_SQL}),
    r AS ({_RANKED2_SQL}),
    a AS (
      {_AUROC_FROM_R2_SQL}
    )
    SELECT round(2.0 * c.tp / nullif(2.0 * c.tp + c.fp + c.fn, 0), 6) AS f1,
           round(CAST(a.rs2 - a.npos * (a.npos + 1) AS DOUBLE)
                 / (2.0 * CAST(a.npos AS DOUBLE) * CAST(a.nneg AS DOUBLE)), 6)
             AS auroc,
           round((2.0 * c.tp / nullif(2.0 * c.tp + c.fp + c.fn, 0)
                + CAST(a.rs2 - a.npos * (a.npos + 1) AS DOUBLE)
                  / (2.0 * CAST(a.npos AS DOUBLE) * CAST(a.nneg AS DOUBLE)))
                 / 2.0, 6) AS score
    FROM c CROSS JOIN a
    """,
)
def score_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(F1 + AUROC) / 2 — the reference's submission score."""
    s = scored_frame(spark, sf_dir)
    c = s.agg(
        F.sum(((F.col("label") == 1) & (F.col("pred") == 1)).cast("bigint")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("pred") == 1)).cast("bigint")).alias("fp"),
        F.sum(((F.col("label") == 1) & (F.col("pred") == 0)).cast("bigint")).alias("fn"),
    )
    a = _auroc_rank_agg(s)
    j = c.crossJoin(a)
    f1 = 2.0 * F.col("tp") / F.nullif(2.0 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0))
    auc = _auroc_expr()
    return j.select(
        F.round(f1, 6).alias("f1"),
        F.round(auc, 6).alias("auroc"),
        F.round((f1 + auc) / 2.0, 6).alias("score"),
    )


# --- E23: best-model selection window (src/ensemble/utils.py:26-92) ---------
@query(
    "best_model_select",
    oracle=f"""
    WITH results AS (
      SELECT l_returnflag AS model_type, l_linestatus AS config_name,
             {N.sql_davg('l_quantity')} AS test_score
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT model_type, config_name, test_score, rnk FROM (
      SELECT model_type, config_name, test_score,
             row_number() OVER (PARTITION BY model_type
                                ORDER BY test_score DESC, config_name) AS rnk
      FROM results
    ) WHERE rnk = 1
    """,
)
def best_model_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find_best_models over a results log: rank within model_type, keep #1."""
    li = load_table(spark, sf_dir, "lineitem")
    results = li.groupBy(
        F.col("l_returnflag").alias("model_type"),
        F.col("l_linestatus").alias("config_name"),
    ).agg(N.davg("l_quantity").alias("test_score"))
    w = Window.partitionBy("model_type").orderBy(
        F.desc("test_score"), F.asc("config_name")
    )
    return (
        results.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
    )


# --- E1: stratified split (1-2.labeling_XYdataset.ipynb:701-703) ------------
@query(
    "split_stratified",
    oracle="""
    WITH assigned AS (
      SELECT l_returnflag,
             CASE WHEN row_number() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_orderkey, l_linenumber) % 5 = 0
                  THEN 'test' ELSE 'train' END AS split
      FROM lineitem
    )
    SELECT l_returnflag, split, count(*) AS n
    FROM assigned GROUP BY l_returnflag, split
    """,
)
def split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 stratified split as a per-class row_number modulo — exact class
    proportions, deterministic under any partitioning (unlike seeded rand)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    split = F.when(F.row_number().over(w) % 5 == 0, "test").otherwise("train")
    return (
        li.select("l_returnflag", split.alias("split"))
        .groupBy("l_returnflag", "split")
        .agg(F.count("*").alias("n"))
    )


# --- E2: deterministic modulo split (iris_analysis split cell) --------------
@query(
    "split_modk",
    oracle=f"""
    SELECT CAST(o_orderkey % 5 AS INT) AS fold,
           CASE WHEN o_orderkey % 5 = 4 THEN 'test' ELSE 'train' END AS split,
           count(*) AS n, {N.sql_davg('o_totalprice')} AS mean_price
    FROM orders GROUP BY 1, 2
    """,
)
def split_modk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fold = (F.col("o_orderkey") % 5).cast("int")
    split = F.when(F.col("o_orderkey") % 5 == 4, "test").otherwise("train")
    return orders.groupBy(fold.alias("fold"), split.alias("split")).agg(
        F.count("*").alias("n"), N.davg("o_totalprice").alias("mean_price")
    )


# --- E3: stratified K-fold assignment (teamProject/sap.py:59-62) ------------
@query(
    "cv_stratified_kfold",
    oracle="""
    WITH assigned AS (
      SELECT l_returnflag,
             CAST(row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_orderkey, l_linenumber) % 5 AS INT) AS fold
      FROM lineitem
    )
    SELECT fold, l_returnflag, count(*) AS n_val
    FROM assigned GROUP BY fold, l_returnflag
    """,
)
def cv_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold column = per-class row_number % k: every fold has exact class
    balance, and the fold-tagged frame is reusable across all k fits
    (persist once; train = fold≠i, val = fold=i)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    fold = (F.row_number().over(w) % 5).cast("int")
    return (
        li.select("l_returnflag", fold.alias("fold"))
        .groupBy("fold", "l_returnflag")
        .agg(F.count("*").alias("n_val"))
    )


# --- E25†: calibration / reliability bins (threshold-tuning family) ----------
@query(
    "metric_calibration",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    binned AS (
      SELECT least(CAST(floor(prob * 10) AS INT), 9) AS bin, label, prob
      FROM s
    )
    SELECT bin, count(*) AS n,
           CAST(sum(CAST(prob AS DECIMAL(38,10))) AS DOUBLE) / count(*)
             AS mean_prob,
           CAST(sum(CAST(label AS BIGINT)) AS DOUBLE) / count(*)
             AS frac_positive
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def metric_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram bins: deciles of predicted probability vs the
    observed positive rate — the diagnostic behind the reference's
    threshold-tuning recommendation (`model_improvement_recommendations.md`
    §1 moves the threshold to 0.35 because the classifier is miscalibrated).
    One map-side-combined aggregate; the probability sum runs over DECIMAL
    so the per-bin mean is order-independent and bit-exact."""
    s = scored_frame(spark, sf_dir)
    binned = s.select(
        F.least(F.floor(F.col("prob") * 10).cast("int"), F.lit(9)).alias("bin"),
        "label",
        "prob",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("prob").cast("decimal(38,10)")).cast("double")
                / F.count("*")
            ).alias("mean_prob"),
            (F.sum(F.col("label").cast("bigint")).cast("double") / F.count("*")).alias(
                "frac_positive"
            ),
        )
        .orderBy("bin")
    )


# --- expected / maximum calibration error ------------------------------------
@query(
    "metric_ece",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    binned AS (
      SELECT least(CAST(floor(prob * 10) AS INT), 9) AS bin, label, prob
      FROM s
    ),
    b AS (
      SELECT bin, count(*) AS nb,
             CAST(sum(CAST(label AS BIGINT)) AS BIGINT) AS pos,
             sum(CAST(prob AS DECIMAL(38,10))) AS sprob
      FROM binned GROUP BY bin
    )
    SELECT CAST(sum(nb) AS BIGINT) AS n,
           count(*) AS n_bins,
           round(CAST(sum(abs(pos - sprob)) AS DOUBLE)
                 / CAST(sum(nb) AS DOUBLE), 6) AS ece,
           round(max(CAST(abs(pos - sprob) AS DOUBLE)
                     / CAST(nb AS DOUBLE)), 6) AS mce
    FROM b
    """,
)
def metric_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error — the scalar summary of the
    metric_calibration reliability diagram (same decile binning):
    ECE = Σ_b (n_b/N)·|acc_b − conf_b| = (1/N)·Σ_b |pos_b − Σprob_b|, and
    MCE is the worst single bin. The one-number calibration diagnostic
    behind the reference's threshold-move recommendation
    (`model_improvement_recommendations.md` §1).

    Scale shape: one map-side-combined aggregate into ≤10 bins, then a
    10-row reduction. Per-bin |pos − Σprob| stays in exact DECIMAL (the
    probability sum is decimal, the positive count integer), so the only
    IEEE ops are the two final divisions — bit-identical across engines
    and partition orders."""
    s = scored_frame(spark, sf_dir)
    b = (
        s.select(
            F.least(F.floor(F.col("prob") * 10).cast("int"), F.lit(9)).alias(
                "bin"
            ),
            "label",
            "prob",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("nb"),
            F.expr("CAST(sum(CAST(label AS BIGINT)) AS BIGINT) AS pos"),
            F.sum(F.col("prob").cast("decimal(38,10)")).alias("sprob"),
        )
    )
    return b.agg(
        F.expr("CAST(sum(nb) AS BIGINT) AS n"),
        F.expr("count(*) AS n_bins"),
        F.expr(
            "round(CAST(sum(abs(pos - sprob)) AS DOUBLE)"
            " / CAST(sum(nb) AS DOUBLE), 6) AS ece"
        ),
        F.expr(
            "round(max(CAST(abs(pos - sprob) AS DOUBLE)"
            " / CAST(nb AS DOUBLE)), 6) AS mce"
        ),
    )


# --- Cohen's kappa (inter-rater / chance-corrected accuracy) ----------------
@query(
    "metric_cohens_kappa",
    oracle=f"""
    WITH s AS (
      SELECT count(*) AS n,
             sum(CAST(pred = label AS BIGINT)) AS diag,
             sum(CAST(label = 1 AS BIGINT)) AS l1,
             sum(CAST(pred = 1 AS BIGINT)) AS p1
      FROM ({_SCORED_SQL})
    )
    SELECT CAST(n * diag - ((n - l1) * (n - p1) + l1 * p1) AS DOUBLE)
           / CAST(n * n - ((n - l1) * (n - p1) + l1 * p1) AS DOUBLE) AS kappa,
           n
    FROM s
    """,
)
def metric_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the binary pred-vs-label pair: chance-corrected
    agreement κ = (n·diag − Σ row·col) / (n² − Σ row·col), assembled from
    four exact integer counts in ONE aggregate pass and finished with a
    single IEEE division — bit-stable, no float accumulation. The
    sklearn.metrics.cohen_kappa_score analog of the reference's agreement
    checks."""
    s = scored_frame(spark, sf_dir)
    g = s.agg(
        F.count("*").alias("n"),
        F.sum((F.col("pred") == F.col("label")).cast("bigint")).alias("diag"),
        F.sum((F.col("label") == 1).cast("bigint")).alias("l1"),
        F.sum((F.col("pred") == 1).cast("bigint")).alias("p1"),
    )
    pe = (F.col("n") - F.col("l1")) * (F.col("n") - F.col("p1")) + F.col(
        "l1"
    ) * F.col("p1")
    return g.select(
        (
            (F.col("n") * F.col("diag") - pe).cast("double")
            / (F.col("n") * F.col("n") - pe).cast("double")
        ).alias("kappa"),
        "n",
    )


# --- McNemar's test (paired disagreement) -----------------------------------
@query(
    "metric_mcnemar",
    oracle=f"""
    WITH s AS (
      SELECT CAST(sum(CAST(label = 1 AND pred = 0 AS BIGINT)) AS BIGINT) AS b,
             CAST(sum(CAST(label = 0 AND pred = 1 AS BIGINT)) AS BIGINT) AS c
      FROM ({_SCORED_SQL})
    )
    SELECT b, c,
           CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
           / CAST(b + c AS DOUBLE) AS stat
    FROM s
    """,
)
def metric_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's χ² with continuity correction over the paired
    disagreement cells (false negatives b vs false positives c):
    (|b−c|−1)²/(b+c). Integer cells from one aggregate pass, one final
    division — the paired-classifier comparison from the reference's
    significance-testing family (scipy.stats.mcnemar analog)."""
    s = scored_frame(spark, sf_dir)
    g = s.agg(
        F.sum(((F.col("label") == 1) & (F.col("pred") == 0)).cast("bigint")).alias(
            "b"
        ),
        F.sum(((F.col("label") == 0) & (F.col("pred") == 1)).cast("bigint")).alias(
            "c"
        ),
    )
    d = F.abs(F.col("b") - F.col("c"))
    return g.select(
        "b",
        "c",
        (((d - 1) * (d - 1)).cast("double") / (F.col("b") + F.col("c")).cast("double")).alias(
            "stat"
        ),
    )


# --- time-series CV: rolling-origin (expanding-window) splits ----------------
_TSCV_SLICES = 5
_US_DAY_TS = 86_400_000_000


@query(
    "cv_rolling_origin",
    oracle=f"""
    WITH d AS (
      SELECT epoch_us(o_orderdate) // {_US_DAY_TS} AS day FROM orders
    ),
    b AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
    s AS (
      SELECT day,
             least(((day - mn) * {_TSCV_SLICES}) // (mx - mn + 1),
                   {_TSCV_SLICES - 1}) AS slice
      FROM d CROSS JOIN b
    ),
    f AS (SELECT unnest(generate_series(1, {_TSCV_SLICES - 1})) AS fold)
    SELECT CAST(f.fold AS INT) AS fold,
           CAST(sum(CAST(s.slice < f.fold AS INT)) AS BIGINT) AS n_train,
           CAST(sum(CAST(s.slice = f.fold AS INT)) AS BIGINT) AS n_test
    FROM s CROSS JOIN f
    GROUP BY f.fold
    """,
)
def cv_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) time-series CV — the split family
    member stratified/shuffle CV cannot replace when rows are ordered in
    time: fold k trains on time slices < k and tests on slice k, so no
    fold ever trains on the future. Slice = equal-width partition of the
    observed day range ({_TSCV_SLICES} slices → {_TSCV_SLICES - 1} folds).

    Scale shape: one min/max scalar agg broadcast onto a second scan;
    fold membership is pure integer arithmetic on the day index, and the
    fold dimension is a broadcast {_TSCV_SLICES - 1}-row frame — counts
    combine map-side. All-integer output."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.selectExpr(
        f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_US_DAY_TS} AS day"
    )
    b = d.agg(F.expr("min(day) AS mn"), F.expr("max(day) AS mx"))
    s = d.crossJoin(F.broadcast(b)).selectExpr(
        f"least(((day - mn) * {_TSCV_SLICES}) div (mx - mn + 1),"
        f" {_TSCV_SLICES - 1}) AS slice"
    )
    f = spark.range(1, _TSCV_SLICES).selectExpr("CAST(id AS INT) AS fold")
    return (
        s.crossJoin(F.broadcast(f))
        .groupBy("fold")
        .agg(
            F.expr("CAST(sum(CAST(slice < fold AS INT)) AS BIGINT) AS n_train"),
            F.expr("CAST(sum(CAST(slice = fold AS INT)) AS BIGINT) AS n_test"),
        )
    )


# --- split-conformal prediction interval + empirical coverage ----------------
_CONF_ALPHA = 0.1  # target 90% coverage

_CONF_BASE_SQL = """
  SELECT o_orderpriority AS grp, o_totalprice AS y,
         CAST(o_orderkey % 4 AS INT) AS part
  FROM orders
"""


@query(
    "conformal_interval",
    oracle=f"""
    WITH base AS ({_CONF_BASE_SQL}),
    fit AS (
      SELECT grp,
             CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS yhat
      FROM base WHERE part <= 1 GROUP BY grp
    ),
    cal AS (
      SELECT abs(b.y - f.yhat) AS x
      FROM base b JOIN fit f ON b.grp = f.grp WHERE b.part = 2
    ),
    d AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM cal GROUP BY x),
    c AS (
      SELECT x, sum(cnt) OVER (ORDER BY x
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
    qq AS (
      SELECT min(c.x) AS q
      FROM c CROSS JOIN nn
      WHERE c.cum >= CAST(ceil((nn.n_cal + 1) * {1 - _CONF_ALPHA}) AS BIGINT)
    ),
    tst AS (
      SELECT abs(b.y - f.yhat) AS r
      FROM base b JOIN fit f ON b.grp = f.grp WHERE b.part = 3
    )
    SELECT nn.n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           round(qq.q, 6) AS q90,
           CAST(sum(CAST(tst.r <= qq.q AS INT)) AS BIGINT) AS n_covered,
           CAST(sum(CAST(tst.r <= qq.q AS INT)) * 1000000 // count(*)
                AS BIGINT) AS coverage_ppm
    FROM tst CROSS JOIN qq CROSS JOIN nn
    GROUP BY nn.n_cal, qq.q
    """,
)
def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval: fit a per-priority mean model
    on the train split, take the ceil((n+1)(1-alpha))-th smallest absolute
    calibration residual as the interval half-width q, then measure the
    EMPIRICAL coverage of yhat ± q on the held-out test split — the
    distribution-free uncertainty wrapper modern eval stacks put around
    any point model.

    Distribution: the conformal quantile is an ORDER STATISTIC, selected
    with pure integer arithmetic on the distinct-residual rank table from
    the bucketed mean_ranks operator (cum = r_avg + (cnt-1)/2 is a
    half-integer — exact); no sort, no interpolation conventions. Model
    parameters and q broadcast; the fact is scanned per split with
    map-side aggregation."""
    from ..operators.rank_ops import mean_ranks

    orders = load_table(spark, sf_dir, "orders")
    base = orders.selectExpr(
        "o_orderpriority AS grp",
        "o_totalprice AS y",
        "CAST(o_orderkey % 4 AS INT) AS part",
    )
    fit = (
        base.filter("part <= 1")
        .groupBy("grp")
        .agg(
            F.expr(
                "CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE)"
                " / CAST(count(*) AS DOUBLE) AS yhat"
            )
        )
    )
    cal = (
        base.filter("part = 2")
        .join(F.broadcast(fit), "grp")
        .selectExpr("abs(y - yhat) AS x")
    )
    r = mean_ranks(cal, "x")
    nn = r.agg(F.expr("CAST(sum(cnt) AS BIGINT) AS n_cal"))
    qq = (
        r.crossJoin(F.broadcast(nn))
        .filter(
            F.expr(
                "r_avg + (cnt - 1) / 2.0D"
                f" >= CAST(ceil((n_cal + 1) * {1 - _CONF_ALPHA}) AS BIGINT)"
            )
        )
        .agg(F.expr("min(x) AS q"))
    )
    tst = (
        base.filter("part = 3")
        .join(F.broadcast(fit), "grp")
        .selectExpr("abs(y - yhat) AS r")
    )
    return (
        tst.crossJoin(F.broadcast(qq))
        .crossJoin(F.broadcast(nn))
        .groupBy("n_cal", "q")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_test"),
            F.expr("CAST(sum(CAST(r <= q AS INT)) AS BIGINT) AS n_covered"),
            F.expr(
                "CAST(sum(CAST(r <= q AS INT)) * 1000000 div count(*)"
                " AS BIGINT) AS coverage_ppm"
            ),
        )
        .selectExpr(
            "n_cal", "n_test", "round(q, 6) AS q90", "n_covered", "coverage_ppm"
        )
    )


# --- regression metric suite -------------------------------------------------
@query(
    "metric_regression_suite",
    oracle=f"""
    WITH base AS ({_CONF_BASE_SQL}),
    fit AS (
      SELECT grp,
             CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS yhat
      FROM base WHERE part <= 1 GROUP BY grp
    ),
    sc AS (
      SELECT b.y, f.yhat FROM base b JOIN fit f ON b.grp = f.grp
      WHERE b.part = 3
    ),
    ym AS (
      SELECT CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS ybar
      FROM sc
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(round(abs(y - yhat) * 100) AS BIGINT)) AS BIGINT)
               AS sae_c,
             CAST(sum(CAST(round((y - yhat) * (y - yhat)) AS BIGINT))
                  AS BIGINT) AS sse_u,
             CAST(sum(CAST(round(abs(y - yhat) / greatest(abs(y), 1e-9)
                                 * 1000000) AS BIGINT)) AS BIGINT) AS sape_m,
             CAST(sum(CAST(round((y - ym.ybar) * (y - ym.ybar)) AS BIGINT))
                  AS BIGINT) AS sst_u
      FROM sc CROSS JOIN ym
    )
    SELECT CAST(n AS BIGINT) AS n_test,
           round(sae_c / (100.0 * n), 6) AS mae,
           round(sqrt(sse_u / n), 6) AS rmse,
           round(sape_m / (10000.0 * n), 6) AS mape_pct,
           round(1.0 - CAST(sse_u AS DOUBLE) / sst_u, 6) AS r2
    FROM s
    """,
)
def metric_regression_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regression-eval counterpart of the classification metric family:
    MAE, RMSE, MAPE and R² of the per-priority-mean model on the held-out
    split. Exactness: every error term is rounded to a fixed integer unit
    BEFORE summation (cents for MAE, whole units for squared errors,
    micro-ratios for MAPE) so the sums are order-independent bigints —
    one double division + round at the end. One broadcast of the
    parameter frame, two scans (test metrics + test mean), map-side
    aggregation throughout."""
    base = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS grp",
        "o_totalprice AS y",
        "CAST(o_orderkey % 4 AS INT) AS part",
    )
    fit = (
        base.filter("part <= 1")
        .groupBy("grp")
        .agg(
            F.expr(
                "CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE)"
                " / CAST(count(*) AS DOUBLE) AS yhat"
            )
        )
    )
    sc = base.filter("part = 3").join(F.broadcast(fit), "grp").select("y", "yhat")
    ym = sc.agg(
        F.expr(
            "CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE)"
            " / CAST(count(*) AS DOUBLE) AS ybar"
        )
    )
    s = sc.crossJoin(F.broadcast(ym)).agg(
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
        F.expr(
            f"CAST(sum({N.spark_fround_int('abs(y - yhat) * 100')}) AS BIGINT)"
            " AS sae_c"
        ),
        F.expr(
            f"CAST(sum({N.spark_fround_int('(y - yhat) * (y - yhat)')})"
            " AS BIGINT) AS sse_u"
        ),
        F.expr(
            f"CAST(sum({N.spark_fround_int('abs(y - yhat) / greatest(abs(y), 1e-9) * 1000000')})"
            " AS BIGINT) AS sape_m"
        ),
        F.expr(
            f"CAST(sum({N.spark_fround_int('(y - ybar) * (y - ybar)')})"
            " AS BIGINT) AS sst_u"
        ),
    )
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_test",
        "round(sae_c / (100.0D * n), 6) AS mae",
        "round(sqrt(sse_u / n), 6) AS rmse",
        "round(sape_m / (10000.0D * n), 6) AS mape_pct",
        "round(1.0D - CAST(sse_u AS DOUBLE) / sst_u, 6) AS r2",
    )


# --- multiclass confusion + macro precision/recall/F1 ------------------------
_MC_SQL = """
  SELECT l_returnflag AS label,
         CASE WHEN l_quantity >= 34.0 THEN 'R'
              WHEN l_quantity >= 17.0 THEN 'N'
              ELSE 'A' END AS pred
  FROM lineitem
"""


@query(
    "metric_multiclass_macro",
    oracle=f"""
    WITH s AS ({_MC_SQL}),
    k AS (SELECT unnest(['A', 'N', 'R']) AS cls),
    pc AS (
      SELECT k.cls,
             CAST(sum(CAST(s.label = k.cls AND s.pred = k.cls AS INT))
                  AS BIGINT) AS tp,
             CAST(sum(CAST(s.label <> k.cls AND s.pred = k.cls AS INT))
                  AS BIGINT) AS fp,
             CAST(sum(CAST(s.label = k.cls AND s.pred <> k.cls AS INT))
                  AS BIGINT) AS fn
      FROM s CROSS JOIN k GROUP BY k.cls
    )
    SELECT cls, tp, fp, fn,
           round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_,
           round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_,
           round(2.0 * tp / nullif(2.0 * tp + fp + fn, 0), 6) AS f1
    FROM pc
    """,
)
def metric_multiclass_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass (one-vs-rest) confusion counts with per-class precision,
    recall and F1 — the 3-class extension of the binary metric family
    (sklearn's macro averaging is the mean of these rows; emitting the
    per-class table keeps every intermediate checkable). The class
    dimension broadcasts against ONE scan of the scored frame; counts
    combine map-side; ratios follow the binary family's nullif + 6dp
    conventions."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "l_returnflag AS label",
        "CASE WHEN l_quantity >= 34.0D THEN 'R'"
        " WHEN l_quantity >= 17.0D THEN 'N' ELSE 'A' END AS pred",
    )
    k = spark.createDataFrame([("A",), ("N",), ("R",)], "cls string")
    pc = s.crossJoin(F.broadcast(k)).groupBy("cls").agg(
        F.expr("CAST(sum(CAST(label = cls AND pred = cls AS INT)) AS BIGINT) AS tp"),
        F.expr("CAST(sum(CAST(label <> cls AND pred = cls AS INT)) AS BIGINT) AS fp"),
        F.expr("CAST(sum(CAST(label = cls AND pred <> cls AS INT)) AS BIGINT) AS fn"),
    )
    return pc.selectExpr(
        "cls",
        "tp",
        "fp",
        "fn",
        "round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_",
        "round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_",
        "round(2.0D * tp / nullif(2.0D * tp + fp + fn, 0), 6) AS f1",
    )


# --- group fairness audit: per-segment accuracy / TPR / FPR ------------------
@query(
    "fairness_group_metrics",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    seg AS (
      SELECT o_orderkey AS id, CAST(o_custkey % 2 AS INT) AS grp FROM orders
    ),
    j AS (SELECT seg.grp, s.label, s.pred FROM s JOIN seg ON s.id = seg.id),
    pc AS (
      SELECT grp,
             count(*) AS n,
             CAST(sum(CAST(pred = label AS INT)) AS BIGINT) AS n_correct,
             CAST(sum(CAST(label = 1 AND pred = 1 AS INT)) AS BIGINT) AS tp,
             CAST(sum(CAST(label = 1 AS INT)) AS BIGINT) AS pos,
             CAST(sum(CAST(label = 0 AND pred = 1 AS INT)) AS BIGINT) AS fp,
             CAST(sum(CAST(label = 0 AS INT)) AS BIGINT) AS neg,
             CAST(sum(CAST(pred = 1 AS INT)) AS BIGINT) AS pred_pos
      FROM j GROUP BY grp
    )
    SELECT grp, n,
           round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy,
           round(CAST(tp AS DOUBLE) / nullif(pos, 0), 6) AS tpr,
           round(CAST(fp AS DOUBLE) / nullif(neg, 0), 6) AS fpr,
           round(CAST(pred_pos AS DOUBLE) / n, 6) AS pred_pos_rate
    FROM pc
    """,
)
def fairness_group_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the scored model: accuracy, true-positive
    rate, false-positive rate, and predicted-positive rate per protected
    segment (customer-key parity arms) — the table whose row-wise gaps
    ARE demographic parity (pred_pos_rate) and equalized odds (tpr/fpr)
    differences. One segment join (both sides key-partitioned on id; the
    segment projection is narrow), one map-side counting aggregate, the
    binary family's nullif + 6dp conventions."""
    s = scored_frame(spark, sf_dir)
    seg = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS id", "CAST(o_custkey % 2 AS INT) AS grp"
    )
    pc = s.join(seg, "id").groupBy("grp").agg(
        F.expr("count(*) AS n"),
        F.expr("CAST(sum(CAST(pred = label AS INT)) AS BIGINT) AS n_correct"),
        F.expr("CAST(sum(CAST(label = 1 AND pred = 1 AS INT)) AS BIGINT) AS tp"),
        F.expr("CAST(sum(CAST(label = 1 AS INT)) AS BIGINT) AS pos"),
        F.expr("CAST(sum(CAST(label = 0 AND pred = 1 AS INT)) AS BIGINT) AS fp"),
        F.expr("CAST(sum(CAST(label = 0 AS INT)) AS BIGINT) AS neg"),
        F.expr("CAST(sum(CAST(pred = 1 AS INT)) AS BIGINT) AS pred_pos"),
    )
    return pc.selectExpr(
        "grp",
        "n",
        "round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy",
        "round(CAST(tp AS DOUBLE) / nullif(pos, 0), 6) AS tpr",
        "round(CAST(fp AS DOUBLE) / nullif(neg, 0), 6) AS fpr",
        "round(CAST(pred_pos AS DOUBLE) / n, 6) AS pred_pos_rate",
    )


# --- learning curve: accuracy vs training-set size ---------------------------
@query(
    "learning_curve_threshold",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS key, o_orderpriority AS grp, o_totalprice AS y,
             CAST(o_orderkey % 4 AS INT) AS part,
             CAST(o_totalprice > 150000.0 AS INT) AS label
      FROM orders
    ),
    nk AS (SELECT max(key) + 1 AS nk FROM base),
    chk AS (SELECT unnest([1, 2, 4, 8]) AS k),
    tr AS (
      SELECT chk.k, CAST(count(*) AS BIGINT) AS n_train
      FROM base b CROSS JOIN nk CROSS JOIN chk
      WHERE b.part <= 1 AND b.key * 8 < nk.nk * chk.k
      GROUP BY chk.k
    ),
    fit AS (
      SELECT chk.k, b.grp,
             CAST(sum(CAST(b.y AS DECIMAL(25,6))) AS DOUBLE) / count(*)
               AS yhat
      FROM base b CROSS JOIN nk CROSS JOIN chk
      WHERE b.part <= 1 AND b.key * 8 < nk.nk * chk.k
      GROUP BY chk.k, b.grp
    ),
    acc AS (
      SELECT f.k, count(*) AS n_test,
             round(CAST(sum(CAST(CAST(b.y > f.yhat AS INT) = b.label AS INT))
                        AS DOUBLE) / count(*), 6) AS accuracy
      FROM base b JOIN fit f ON b.grp = f.grp
      WHERE b.part = 3
      GROUP BY f.k
    )
    SELECT acc.k AS prefix_eighths, tr.n_train, acc.n_test, acc.accuracy
    FROM acc JOIN tr ON acc.k = tr.k
    """,
)
def learning_curve_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: fit the per-priority mean-price threshold model on
    nested training prefixes (1/8..1 of the train split by key) and score
    the SAME held-out test each time — the accuracy-vs-data-volume curve
    that says whether more data still buys model quality (the model-side
    sibling of mean_convergence_curve). One scan builds every prefix's
    parameters via the broadcast checkpoint dimension; the test scan
    scores all four models through one broadcast parameter frame."""
    base = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS key",
        "o_orderpriority AS grp",
        "o_totalprice AS y",
        "CAST(o_orderkey % 4 AS INT) AS part",
        "CAST(o_totalprice > 150000.0D AS INT) AS label",
    )
    nk = base.agg(F.expr("max(key) + 1 AS nk"))
    chk = spark.range(4).selectExpr("CAST(pow(2, id) AS INT) AS k")
    train = (
        base.filter("part <= 1")
        .crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(chk))
        .filter("key * 8 < nk * k")
    )
    tr = train.groupBy("k").agg(F.expr("CAST(count(*) AS BIGINT) AS n_train"))
    fit = train.groupBy("k", "grp").agg(
        F.expr(
            "CAST(sum(CAST(y AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS yhat"
        )
    )
    acc = (
        base.filter("part = 3")
        .join(F.broadcast(fit), "grp")
        .groupBy("k")
        .agg(
            F.expr("count(*) AS n_test"),
            F.expr(
                "round(CAST(sum(CAST(CAST(y > yhat AS INT) = label AS INT))"
                " AS DOUBLE) / count(*), 6) AS accuracy"
            ),
        )
    )
    return acc.join(F.broadcast(tr), "k").selectExpr(
        "k AS prefix_eighths", "n_train", "n_test", "accuracy"
    )


# --- average precision (area under the PR curve, sklearn step form) ----------
@query(
    "metric_average_precision",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    v AS (
      SELECT round(prob, {_PROB_SCALE}) AS p,
             CAST(count(*) AS BIGINT) AS t,
             CAST(sum(label) AS BIGINT) AS tp
      FROM s GROUP BY p
    ),
    tot AS (
      SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(tp) AS BIGINT) AS npos
      FROM v
    ),
    c AS (
      SELECT p, t, tp,
             coalesce(sum(t) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below_all,
             coalesce(sum(tp) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below_tp
      FROM v
    ),
    terms AS (
      SELECT round((CAST(c.tp AS DOUBLE) / tot.npos)
                   * (CAST(tot.npos - c.below_tp AS DOUBLE)
                      / (tot.n - c.below_all)), 8) AS term
      FROM c CROSS JOIN tot WHERE c.tp > 0
    )
    SELECT round(CAST(sum(CAST(term AS DECIMAL(20,8))) AS DOUBLE), 6)
             AS average_precision,
           CAST(max(tot.npos) AS BIGINT) AS npos
    FROM terms CROSS JOIN tot
    """,
)
def metric_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, sklearn's
    step interpolation): AP = Σ_t ΔR_t · P_t over DESCENDING distinct
    score thresholds, where ΔR is the positive mass AT the threshold and
    P the precision of everything at-or-above it — the ranking metric
    that, unlike AUROC, punishes false positives among the top scores.

    Distribution: scores quantize at {_PROB_SCALE}dp (the AUROC
    contract), so the distinct-score table is bounded; at-or-above
    cumulatives are total-minus-strict-below with the strict-below
    prefixes from the bounded_seq bucket machinery — no unpartitioned
    window ever runs. Each AP term rounds at 8dp and sums through
    DECIMAL(20,8) (order-independent)."""
    s = scored_frame(spark, sf_dir)
    vb = (
        s.groupBy(F.expr(N.spark_fround("prob", _PROB_SCALE)).alias("p"))
        .agg(F.expr("CAST(count(*) AS BIGINT) AS t"),
             F.expr("CAST(sum(label) AS BIGINT) AS tp"))
        .withColumn(
            "b",
            F.expr(
                f"greatest(least(CAST(floor(p * {_RANK_BUCKETS}) AS INT),"
                f" {_RANK_BUCKETS - 1}), 0)"
            ),
        )
    )
    hist = vb.groupBy("b").agg(
        F.expr("sum(t) AS bt"), F.expr("sum(tp) AS btp")
    )
    offs = (
        exclusive_prefix_sums(hist, "b", ["bt", "btp"])
        .withColumnRenamed("prev_bt", "bucket_all")
        .withColumnRenamed("prev_btp", "bucket_tp")
    )
    wv = Window.partitionBy("b").orderBy("p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = vb.agg(
        F.expr("CAST(sum(t) AS BIGINT) AS n"),
        F.expr("CAST(sum(tp) AS BIGINT) AS npos"),
    )
    c = (
        vb.join(F.broadcast(offs), "b")
        .withColumn("in_all", F.coalesce(F.sum("t").over(wv), F.lit(0)))
        .withColumn("in_tp", F.coalesce(F.sum("tp").over(wv), F.lit(0)))
        .selectExpr(
            "tp",
            "bucket_all + in_all AS below_all",
            "bucket_tp + in_tp AS below_tp",
        )
    )
    terms = (
        c.crossJoin(F.broadcast(tot))
        .filter("tp > 0")
        .selectExpr(
            "round((CAST(tp AS DOUBLE) / npos)"
            " * (CAST(npos - below_tp AS DOUBLE) / (n - below_all)), 8)"
            " AS term"
        )
    )
    return terms.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            "round(CAST(sum(CAST(term AS DECIMAL(20,8))) AS DOUBLE), 6)"
            " AS average_precision"
        ),
        F.expr("CAST(max(npos) AS BIGINT) AS npos"),
    )


# --- Brier score (exact integer form) ----------------------------------------
@query(
    "metric_brier",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    m AS (
      SELECT CAST(round(prob * 1000) AS BIGINT) - 1000 * label AS m
      FROM s
    )
    SELECT count(*) AS n,
           CAST(sum(m * m) AS BIGINT) AS sum_sq_milli,
           round(CAST(sum(m * m) AS DOUBLE) / (1000000.0 * count(*)), 6)
             AS brier
    FROM m
    """,
)
def metric_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the scored frame — the proper scoring rule that
    complements logloss (bounded, decomposable into
    reliability/resolution via metric_calibration's bins). The scored
    probabilities are exact milli-units by construction, so (prob −
    label)² = m²/10⁶ with m an integer: the whole score is ONE exact
    bigint sum and a final division — no float summation anywhere."""
    s = scored_frame(spark, sf_dir)
    m = s.selectExpr(f"{N.spark_fround_int('prob * 1000')} - 1000 * label AS m")
    return m.agg(
        F.expr("count(*) AS n"),
        F.expr("CAST(sum(m * m) AS BIGINT) AS sum_sq_milli"),
        F.expr(
            "round(CAST(sum(m * m) AS DOUBLE) / (1000000.0D * count(*)), 6)"
            " AS brier"
        ),
    )


# --- split-integrity audit: entity leakage across splits ---------------------
@query(
    "split_leakage_audit",
    oracle="""
    WITH row_split AS (
      SELECT o_custkey,
             CAST(max(CAST(o_orderkey % 5 = 4 AS INT)) AS INT) AS in_test,
             CAST(max(CAST(o_orderkey % 5 <> 4 AS INT)) AS INT) AS in_train
      FROM orders GROUP BY o_custkey
    ),
    grp_split AS (
      SELECT o_custkey,
             CAST(max(CAST(o_custkey % 5 = 4 AS INT)) AS INT) AS in_test,
             CAST(max(CAST(o_custkey % 5 <> 4 AS INT)) AS INT) AS in_train
      FROM orders GROUP BY o_custkey
    )
    SELECT 'row_split' AS scheme,
           count(*) AS n_entities,
           CAST(sum(CAST(in_test = 1 AND in_train = 1 AS INT)) AS BIGINT)
             AS n_leaked
    FROM row_split
    UNION ALL
    SELECT 'group_split', count(*),
           CAST(sum(CAST(in_test = 1 AND in_train = 1 AS INT)) AS BIGINT)
    FROM grp_split
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-integrity audit: how many ENTITIES (customers) appear on
    both sides of the train/test boundary under a row-keyed split versus
    a group-keyed split — the contamination check that motivates
    GroupKFold (a row split leaks nearly every multi-order customer; the
    group split must leak zero). One per-entity aggregate per scheme,
    unioned; all-integer."""
    orders = load_table(spark, sf_dir, "orders")

    def scheme(name: str, test_pred: str) -> DataFrame:
        per = orders.groupBy("o_custkey").agg(
            F.expr(f"CAST(max(CAST({test_pred} AS INT)) AS INT) AS in_test"),
            F.expr(
                f"CAST(max(CAST(NOT ({test_pred}) AS INT)) AS INT) AS in_train"
            ),
        )
        return per.agg(
            F.expr(f"'{name}' AS scheme"),
            F.expr("count(*) AS n_entities"),
            F.expr(
                "CAST(sum(CAST(in_test = 1 AND in_train = 1 AS INT))"
                " AS BIGINT) AS n_leaked"
            ),
        )

    return scheme("row_split", "o_orderkey % 5 = 4").unionByName(
        scheme("group_split", "o_custkey % 5 = 4")
    )


# --- Matthews correlation coefficient -----------------------------------------
@query(
    "metric_mcc",
    oracle=f"""
    WITH c AS ({_CONF_SQL})
    SELECT round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                  - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                 / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)),
                 6) AS mcc,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn
    FROM c
    """,
)
def metric_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient — the balanced single-number
    confusion summary sklearn reports as matthews_corrcoef; robust to class
    imbalance where accuracy and F1 mislead. One shuffle-free partial agg
    (the shared confusion counts), then pure expression arithmetic: the
    numerator and the four marginals are exact integers, converted to
    double in a fixed textual order so the product/sqrt/division sequence
    is the identical IEEE computation on both engines, rounded at 6dp."""
    s = scored_frame(spark, sf_dir)
    c = s.agg(
        F.sum(((F.col("label") == 1) & (F.col("pred") == 1)).cast("bigint")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("pred") == 1)).cast("bigint")).alias("fp"),
        F.sum(((F.col("label") == 1) & (F.col("pred") == 0)).cast("bigint")).alias("fn"),
        F.sum(((F.col("label") == 0) & (F.col("pred") == 0)).cast("bigint")).alias("tn"),
    )
    return c.selectExpr(
        "round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)"
        " - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))"
        " / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)"
        " * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6) AS mcc",
        "tp", "fp", "fn", "tn",
    )


# --- isotonic calibration (PAV as a closed-form minimax) ---------------------
@query(
    "calibration_isotonic",
    oracle=f"""
    WITH g AS (
      SELECT CAST(floor(prob * 20.0) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(label AS BIGINT)) AS BIGINT) AS pos
      FROM ({_SCORED_SQL}) GROUP BY 1
    ),
    seg AS (
      SELECT j.b AS jb, k.b AS kb,
             CAST(sum(m.pos) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE) AS seg_avg
      FROM g j JOIN g k ON j.b <= k.b
      JOIN g m ON m.b BETWEEN j.b AND k.b
      GROUP BY j.b, k.b
    ),
    lo AS (
      SELECT i.b, s.jb, min(s.seg_avg) AS mn
      FROM g i JOIN seg s ON s.jb <= i.b AND i.b <= s.kb
      GROUP BY i.b, s.jb
    ),
    fit AS (
      SELECT b, max(mn) AS iso FROM lo GROUP BY b
    )
    SELECT g.b AS bucket, g.n, g.pos,
           round(CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS raw_rate,
           round(f.iso, 6) AS iso_rate
    FROM g JOIN fit f ON g.b = f.b
    ORDER BY g.b
    """,
)
def calibration_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the scored frame, exactly — via the
    closed-form minimax identity fit(i) = max_{j<=i} min_{k>=i} avg[j..k],
    which equals the pool-adjacent-violators solution (sklearn's
    IsotonicRegression / CalibratedClassifierCV backbone the reference's
    model stack would call next).

    Scale shape: ONE map-side-combined groupBy compresses the corpus to
    <=20 (bucket, n, pos) rows; every minimax term is then a triangular
    join over that bounded frame (~20^3 rows), with min/max aggregation —
    order-independent, so the doubles are bit-stable on both engines. The
    driver never holds row-level data, and the heavy pass is the same
    single aggregation any reliability curve pays."""
    s = scored_frame(spark, sf_dir)
    g = s.groupBy(
        F.floor(F.col("prob") * 20.0).cast("bigint").alias("b")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("label").cast("bigint")).cast("bigint").alias("pos"),
    )
    j = g.select(F.col("b").alias("jb"))
    k = g.select(F.col("b").alias("kb"))
    m = g.select(F.col("b").alias("mb"), "n", "pos")
    seg = (
        F.broadcast(j)
        .join(F.broadcast(k), F.col("jb") <= F.col("kb"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("jb")) & (F.col("mb") <= F.col("kb")),
        )
        .groupBy("jb", "kb")
        .agg(
            (
                F.sum("pos").cast("double") / F.sum("n").cast("double")
            ).alias("seg_avg")
        )
    )
    lo = (
        g.select(F.col("b").alias("ib"))
        .join(
            F.broadcast(seg),
            (F.col("jb") <= F.col("ib")) & (F.col("ib") <= F.col("kb")),
        )
        .groupBy("ib", "jb")
        .agg(F.min("seg_avg").alias("mn"))
    )
    fit = lo.groupBy("ib").agg(F.max("mn").alias("iso"))
    return (
        g.join(F.broadcast(fit), g["b"] == fit["ib"])
        .select(
            F.col("b").alias("bucket"),
            "n",
            "pos",
            F.round(F.col("pos").cast("double") / F.col("n").cast("double"), 6).alias(
                "raw_rate"
            ),
            F.round("iso", 6).alias("iso_rate"),
        )
        .orderBy("bucket")
    )


# --- cumulative gains / lift table ------------------------------------------
# The marketing-facing view of the same ranking AUROC scores: sort by
# predicted probability descending, cut into ten deciles, report cumulative
# capture (gain) and lift per decile. Decile assignment is pinned at the
# DISTINCT-SCORE level so it is partitioning- and engine-independent: every
# row with the same prob lands in decile ceil(10 * inclusive_cum_n / N)
# computed over the <=1000-row score histogram (ntile() over raw rows would
# split tied scores arbitrarily). Gains/lift stay integer until the final
# two divisions.
@query(
    "metric_lift_gains",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    hist AS (
      SELECT prob, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(label AS BIGINT)) AS BIGINT) AS pos
      FROM s GROUP BY prob
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(pos) AS BIGINT) AS np FROM hist),
    dec AS (
      SELECT CAST(ceil(10.0 * (sum(n) OVER (ORDER BY prob DESC)) / nn) AS BIGINT) AS decile,
             n, pos
      FROM hist, tot
    ),
    d AS (
      SELECT decile, CAST(sum(n) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos
      FROM dec GROUP BY decile
    ),
    c AS (
      SELECT decile, n, pos,
             CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
             CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
      FROM d
    )
    SELECT decile, n, pos, cum_n, cum_pos,
           round(CAST(cum_pos AS DOUBLE) / np, 6) AS gain,
           round((CAST(cum_pos AS DOUBLE) / cum_n) / (CAST(np AS DOUBLE) / nn), 6) AS lift
    FROM c, tot
    """,
)
def metric_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile cumulative-gains/lift table of the scored frame."""
    s = scored_frame(spark, sf_dir)
    hist = s.groupBy("prob").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("label").cast("bigint")).cast("bigint").alias("pos"),
    )
    tot = hist.agg(
        F.sum("n").cast("bigint").alias("nn"), F.sum("pos").cast("bigint").alias("np")
    )
    # inclusive cum count from the TOP score down, on the bounded histogram
    keyed = hist.withColumn("negp", -F.col("prob"))
    cum = (
        exclusive_prefix_sums(keyed, "negp", ["n"])
        .join(keyed, "negp")
        .select("prob", "n", "pos", (F.col("prev_n") + F.col("n")).alias("cumn"))
    )
    dec = cum.crossJoin(F.broadcast(tot)).select(
        F.ceil(10.0 * F.col("cumn") / F.col("nn")).cast("bigint").alias("decile"),
        "n",
        "pos",
    )
    d = dec.groupBy("decile").agg(
        F.sum("n").cast("bigint").alias("n"), F.sum("pos").cast("bigint").alias("pos")
    )
    c = (
        exclusive_prefix_sums(d, "decile", ["n", "pos"])
        .join(d, "decile")
        .select(
            "decile", "n", "pos",
            (F.col("prev_n") + F.col("n")).cast("bigint").alias("cum_n"),
            (F.col("prev_pos") + F.col("pos")).cast("bigint").alias("cum_pos"),
        )
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "decile", "n", "pos", "cum_n", "cum_pos",
        F.round(F.col("cum_pos").cast("double") / F.col("np"), 6).alias("gain"),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("cum_n"))
            / (F.col("np").cast("double") / F.col("nn")),
            6,
        ).alias("lift"),
    )


# --- KS score separation + Gini (credit-scoring discrimination pair) --------
@query(
    "metric_ks_separation",
    oracle=f"""
    WITH d AS (
      SELECT prob, sum(CAST(label AS BIGINT)) AS np_,
             sum(CAST(1 - label AS BIGINT)) AS nn_
      FROM ({_SCORED_SQL}) GROUP BY prob
    ),
    c AS (
      SELECT prob, np_, nn_,
             coalesce(sum(np_) OVER (ORDER BY prob
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pnp,
             coalesce(sum(nn_) OVER (ORDER BY prob
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pnn
      FROM d
    ),
    tot AS (SELECT CAST(sum(np_) AS BIGINT) AS p,
                   CAST(sum(nn_) AS BIGINT) AS n FROM d),
    per AS (
      SELECT prob,
             abs(CAST(pnp + np_ AS DOUBLE) / nullif(CAST(p AS DOUBLE), 0.0)
               - CAST(pnn + nn_ AS DOUBLE) / nullif(CAST(n AS DOUBLE), 0.0))
               AS ks_at,
             CAST(np_ AS BIGINT) * CAST(2 * pnn + nn_ AS BIGINT) AS numer_i
      FROM c, tot
    ),
    m AS (SELECT max(ks_at) AS ks, CAST(sum(numer_i) AS BIGINT) AS numer
          FROM per),
    th AS (SELECT min(prob) AS ks_threshold FROM per, m
           WHERE per.ks_at = m.ks)
    SELECT round(m.ks, 6) AS ks,
           th.ks_threshold,
           round(CAST(m.numer AS DOUBLE)
                 / nullif(2.0 * CAST(tot.p AS DOUBLE) * CAST(tot.n AS DOUBLE),
                          0.0), 6) AS auc,
           round(2.0 * (CAST(m.numer AS DOUBLE)
                 / nullif(2.0 * CAST(tot.p AS DOUBLE) * CAST(tot.n AS DOUBLE),
                          0.0)) - 1.0, 6) AS gini,
           tot.p AS n_pos, tot.n AS n_neg
    FROM m, th, tot
    """,
)
def metric_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov score separation + Gini coefficient — the credit-
    scoring discrimination pair (KS = max CDF gap between positive and
    negative score distributions; Gini = 2·AUC − 1, tie-aware trapezoidal
    AUC from the same compression). One fact scan compresses to the ≤1000
    distinct-score histogram; cumulative counts ride the broadcast
    triangular prefix (no unpartitioned window); every accumulated term is
    integer (exact while 2·P·N < 2^63 — beyond that split-lane sums as in
    isum_aggs), the final divisions are single IEEE ops identical in both
    engines, and the KS threshold is the SMALLEST score attaining the max
    (deterministic tie-break via min over bit-equal doubles)."""
    sc = scored_frame(spark, sf_dir)
    d = sc.groupBy("prob").agg(
        F.sum("label").cast("bigint").alias("np_"),
        F.sum(1 - F.col("label")).cast("bigint").alias("nn_"),
    )
    c = exclusive_prefix_sums(d, "prob", ["np_", "nn_"]).join(d, "prob")
    tot = d.agg(
        F.sum("np_").cast("bigint").alias("p"),
        F.sum("nn_").cast("bigint").alias("n"),
    )
    per = c.crossJoin(F.broadcast(tot)).select(
        "prob",
        F.abs(
            (F.col("prev_np_") + F.col("np_")).cast("double")
            / F.nullif(F.col("p").cast("double"), F.lit(0.0))
            - (F.col("prev_nn_") + F.col("nn_")).cast("double")
            / F.nullif(F.col("n").cast("double"), F.lit(0.0))
        ).alias("ks_at"),
        (F.col("np_") * (2 * F.col("prev_nn_") + F.col("nn_")))
        .cast("bigint")
        .alias("numer_i"),
    )
    m = per.agg(
        F.max("ks_at").alias("ks"),
        F.sum("numer_i").cast("bigint").alias("numer"),
    )
    th = (
        per.crossJoin(F.broadcast(m))
        .filter(F.col("ks_at") == F.col("ks"))
        .agg(F.min("prob").alias("ks_threshold"))
    )
    auc = F.col("numer").cast("double") / F.nullif(
        2.0 * F.col("p").cast("double") * F.col("n").cast("double"),
        F.lit(0.0),
    )
    return (
        m.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("ks"), 6).alias("ks"),
            "ks_threshold",
            F.round(auc, 6).alias("auc"),
            F.round(2.0 * auc - 1.0, 6).alias("gini"),
            F.col("p").alias("n_pos"),
            F.col("n").alias("n_neg"),
        )
    )


# --- Platt-scaling recalibration (quantized Newton IRLS) ---------------------
# metric_calibration/calibration_isotonic MEASURE miscalibration; this op
# FITS the standard parametric fix: logistic recalibration
# P(y=1) = sigmoid(alpha + beta * logit(p)) (Platt 1999), by Newton-Raphson
# on the distinct-score histogram. Each iteration quantizes the per-bin
# sigmoid and its variance weight to 1e-9 integers so every gradient /
# Hessian entry is an exact integer/DECIMAL sum (order-free across engines);
# the 2x2 Newton solve is one identical double expression and the updated
# (alpha, beta) are re-rounded to 6dp before the next round. exp/ln
# cross-engine agreement is the same contract logloss/perplexity pin.
_PLATT_ROUNDS = 5
_PLATT_DAMP = 0.5  # half-step Newton: undamped steps oscillate off the |z|~14 clamp bins
_PLATT_E9 = 1_000_000_000
_PLATT_E6 = 1_000_000

_PLATT_PC = "least(greatest(prob, 0.000001), 0.999999)"


def _platt_hist_sql() -> str:
    return f"""
      SELECT prob,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(label AS BIGINT)) AS BIGINT) AS pos,
             CAST(round(ln(({_PLATT_PC}) / (1.0 - ({_PLATT_PC})))
                        * {_PLATT_E6}) AS BIGINT) AS z9
      FROM ({_SCORED_SQL}) GROUP BY prob
    """


def _platt_terms(a: str, b: str) -> dict[str, str]:
    t = f"({a} + {b} * CAST(z9 AS DOUBLE) / {_PLATT_E6}.0)"
    s = f"(1.0 / (1.0 + exp(-{t})))"
    w = f"({s} * (1.0 - {s}))"
    return {"s": s, "w": w}


def _platt_step_sql(round_fn) -> tuple[str, str]:
    """(aggregate select list, beta-update select list) with engine-specific
    integer rounding via round_fn(expr) -> bigint-rounded string."""
    terms = _platt_terms("a", "b")
    se9 = round_fn(f"{terms['s']} * {_PLATT_E9}.0")
    we9 = round_fn(f"{terms['w']} * {_PLATT_E9}.0")
    aggs = f"""
      CAST(sum(CAST(cnt * ({se9}) - pos * {_PLATT_E9} AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS g0i,
      CAST(sum(CAST(cnt * ({se9}) - pos * {_PLATT_E9} AS DECIMAL(38,0)) * z9)
           AS DECIMAL(38,0)) AS g1i,
      CAST(sum(CAST(cnt * ({we9}) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS h00i,
      CAST(sum(CAST(cnt * ({we9}) AS DECIMAL(38,0)) * z9) AS DECIMAL(38,0))
        AS h01i,
      CAST(sum(CAST(cnt * ({we9}) AS DECIMAL(38,0)) * z9 * z9)
           AS DECIMAL(38,0)) AS h11i,
      any_value(a) AS a, any_value(b) AS b
    """
    upd = f"""
      round(a - {_PLATT_DAMP} * (CAST(h11i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0 / {_PLATT_E6}.0
                   * (CAST(g0i AS DOUBLE) / {_PLATT_E9}.0)
                 - CAST(h01i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0
                   * (CAST(g1i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0))
                / nullif(CAST(h00i AS DOUBLE) / {_PLATT_E9}.0
                           * (CAST(h11i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0 / {_PLATT_E6}.0)
                         - (CAST(h01i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0)
                           * (CAST(h01i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0), 0.0), 6)
        AS a,
      round(b - {_PLATT_DAMP} * (CAST(h00i AS DOUBLE) / {_PLATT_E9}.0
                   * (CAST(g1i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0)
                 - CAST(h01i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0
                   * (CAST(g0i AS DOUBLE) / {_PLATT_E9}.0))
                / nullif(CAST(h00i AS DOUBLE) / {_PLATT_E9}.0
                           * (CAST(h11i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0 / {_PLATT_E6}.0)
                         - (CAST(h01i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0)
                           * (CAST(h01i AS DOUBLE) / {_PLATT_E9}.0 / {_PLATT_E6}.0), 0.0), 6)
        AS b
    """
    return aggs, upd


def _platt_oracle() -> str:
    aggs, upd = _platt_step_sql(
        lambda e: f"CAST(round({e}) AS BIGINT)"
    )
    ctes = [
        f"hist AS ({_platt_hist_sql()})",
        "p0 AS (SELECT 0.0 AS a, 1.0 AS b)",
    ]
    for i in range(1, _PLATT_ROUNDS + 1):
        ctes.append(f"s{i} AS (SELECT {aggs} FROM hist, p{i - 1})")
        ctes.append(f"p{i} AS (SELECT {upd} FROM s{i})")
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS iteration, round(a, 6) AS alpha, round(b, 6) AS beta"
        f" FROM p{i}"
        for i in range(_PLATT_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + sel


@query("metric_platt_recalibration", oracle=_platt_oracle())
def metric_platt_recalibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt-scaling recalibration of the scored table: fit
    sigmoid(alpha + beta * logit(p)) to the labels by {r} Newton rounds
    and emit the (alpha, beta) trajectory — beta != 1 / alpha != 0 is the
    actionable miscalibration verdict (cf. metric_calibration, which only
    bins the gap). One fact scan builds the <= 1000-row distinct-score
    histogram; every Newton round is one aggregation OVER THE HISTOGRAM
    (not the fact), with sigmoid/weight terms quantized to 1e-9 integers
    so the gradient and Hessian are exact sums in any partitioning.""".format(
        r=_PLATT_ROUNDS
    )
    aggs, upd = _platt_step_sql(N.spark_fround_int)
    sc = scored_frame(spark, sf_dir)
    hist = (
        sc.groupBy("prob")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .selectExpr(
            "prob",
            "cnt",
            "pos",
            f"CAST({N.spark_fround_int(f'ln(({_PLATT_PC}) / (1.0 - ({_PLATT_PC}))) * {_PLATT_E6}.0')} AS BIGINT) AS z9",
        )
        .localCheckpoint(eager=False)
    )
    p = spark.range(1).selectExpr("0.0D AS a", "1.0D AS b")
    out = [p.selectExpr("0 AS iteration", "round(a, 6) AS alpha", "round(b, 6) AS beta")]
    agg_exprs = [e.strip() for e in _split_top_level_commas(aggs)]
    for i in range(1, _PLATT_ROUNDS + 1):
        s = hist.crossJoin(F.broadcast(p)).agg(
            *[F.expr(e) for e in agg_exprs]
        )
        p = s.selectExpr(*[e.strip() for e in _split_top_level_commas(upd)])
        out.append(
            p.selectExpr(
                f"{i} AS iteration", "round(a, 6) AS alpha", "round(b, 6) AS beta"
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def _split_top_level_commas(s: str) -> list[str]:
    """Split a SQL select list on commas not nested in parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur))
    return parts


# --- multilabel classification metrics ----------------------------------------
# The binary/multiclass metric families above assume one label per row;
# multilabel (K parallel binary targets) has its own canon: Hamming loss,
# subset (exact-match) accuracy, micro- and macro-averaged F1. Labels and
# predictions are deterministic hash bits (prediction = label with a 25%
# hash-coin bit flip), so the whole suite is integer-exact.
_ML_K = 3


def _ml_bits_sql() -> str:
    from .dedup import _h_sql

    hy = _h_sql("concat_ws('', 'ml:', CAST(o_orderkey AS VARCHAR))")
    hf = _h_sql("concat_ws('', 'mf:', CAST(o_orderkey AS VARCHAR))")
    cols = []
    for k in range(_ML_K):
        cols.append(f"CAST(({hy} // {2 ** k}) % 2 AS INT) AS y{k}")
        cols.append(
            f"CAST((CAST(({hy} // {2 ** k}) % 2 AS INT)"
            f" + CAST(({hf} // {4 ** k}) % 4 = 0 AS INT)) % 2 AS INT) AS p{k}"
        )
    return "SELECT " + ", ".join(cols) + " FROM orders"


def _ml_metric_exprs() -> dict[str, str]:
    K = _ML_K
    mism = " + ".join(f"CAST(y{k} <> p{k} AS INT)" for k in range(K))
    tp = " + ".join(f"sum(CAST(y{k} = 1 AND p{k} = 1 AS BIGINT))" for k in range(K))
    fp = " + ".join(f"sum(CAST(y{k} = 0 AND p{k} = 1 AS BIGINT))" for k in range(K))
    fn = " + ".join(f"sum(CAST(y{k} = 1 AND p{k} = 0 AS BIGINT))" for k in range(K))
    f1s = []
    for k in range(K):
        tpk = f"CAST(sum(CAST(y{k} = 1 AND p{k} = 1 AS BIGINT)) AS DOUBLE)"
        fpk = f"CAST(sum(CAST(y{k} = 0 AND p{k} = 1 AS BIGINT)) AS DOUBLE)"
        fnk = f"CAST(sum(CAST(y{k} = 1 AND p{k} = 0 AS BIGINT)) AS DOUBLE)"
        f1s.append(f"(2.0 * {tpk} / nullif(2.0 * {tpk} + {fpk} + {fnk}, 0.0))")
    return {
        "n": "CAST(count(*) AS BIGINT) AS n",
        "hamming": (
            f"round(CAST(sum({mism}) AS DOUBLE)"
            f" / (CAST(count(*) AS DOUBLE) * {K}.0), 6) AS hamming_loss"
        ),
        "subset": (
            f"round(CAST(sum(CAST(({mism}) = 0 AS BIGINT)) AS DOUBLE)"
            " / CAST(count(*) AS DOUBLE), 6) AS subset_accuracy"
        ),
        "microp": (
            f"round(CAST({tp} AS DOUBLE)"
            f" / nullif(CAST(({tp}) + ({fp}) AS DOUBLE), 0.0), 6)"
            " AS micro_precision"
        ),
        "micror": (
            f"round(CAST({tp} AS DOUBLE)"
            f" / nullif(CAST(({tp}) + ({fn}) AS DOUBLE), 0.0), 6) AS micro_recall"
        ),
        "microf1": (
            f"round(2.0 * CAST({tp} AS DOUBLE)"
            f" / nullif(2.0 * CAST({tp} AS DOUBLE)"
            f" + CAST({fp} AS DOUBLE) + CAST({fn} AS DOUBLE), 0.0), 6)"
            " AS micro_f1"
        ),
        "macrof1": (
            f"round(({' + '.join(f1s)}) / {_ML_K}.0, 6) AS macro_f1"
        ),
    }


@query(
    "metric_multilabel_suite",
    oracle=(
        "SELECT "
        + ", ".join(_ml_metric_exprs().values())
        + f" FROM ({_ml_bits_sql()})"
    ),
)
def metric_multilabel_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilabel metric suite over {k} parallel hash-bit targets with
    hash-coin 25% flip predictions: Hamming loss, exact-match subset
    accuracy, micro-averaged precision/recall/F1 (counts pooled across
    labels), macro-F1 (per-label F1s averaged in fixed literal order).
    Everything but the final divisions is integer counting — one
    map-side-combined scan, engine- and partitioning-exact.""".format(k=_ML_K)
    from .dedup import _h_spark

    orders = load_table(spark, sf_dir, "orders")
    hy = _h_spark(
        F.concat_ws("", F.lit("ml:"), F.col("o_orderkey").cast("string"))
    )
    hf = _h_spark(
        F.concat_ws("", F.lit("mf:"), F.col("o_orderkey").cast("string"))
    )
    cols = []
    for k in range(_ML_K):
        # shiftright, not division: h is a 60-bit value, and double `/`
        # would destroy exactly the low bits these masks read
        yk = (F.shiftright(hy, k) % 2).cast("int")
        flip = ((F.shiftright(hf, 2 * k) % 4) == 0).cast("int")
        cols.append(yk.alias(f"y{k}"))
        cols.append(((yk + flip) % 2).cast("int").alias(f"p{k}"))
    bits = orders.select(*cols)
    exprs = _ml_metric_exprs()
    return bits.agg(
        F.expr(exprs["n"]),
        F.expr(exprs["hamming"]),
        F.expr(exprs["subset"]),
        F.expr(exprs["microp"]),
        F.expr(exprs["micror"]),
        F.expr(exprs["microf1"]),
        F.expr(exprs["macrof1"]),
    )


# --- label-permutation significance test ---------------------------------------
# "Is the model better than chance?" answered without distributional
# assumptions: re-score the predictions against K derangements of the label
# column; the p-value is the rank of the true accuracy among the permuted
# ones. Permutations are DETERMINISTIC label rotations within hash buckets
# (shift k inside each id%256 bucket) — state-free, partition-independent,
# and exactly reproducible in the oracle, unlike an RNG shuffle.
_LPT_K = 5
_LPT_B = 256


@query(
    "metric_label_permutation_test",
    oracle=f"""
    WITH sc AS (
      SELECT id, label, pred, CAST(id % {_LPT_B} AS BIGINT) AS b
      FROM ({_SCORED_SQL})
    ),
    rk AS (
      SELECT id, label, pred, b,
             row_number() OVER (PARTITION BY b ORDER BY id) AS r,
             count(*) OVER (PARTITION BY b) AS m
      FROM sc
    ),
    t AS (SELECT CAST(sum(CAST(pred = label AS BIGINT)) AS BIGINT) AS c_true,
                 CAST(count(*) AS BIGINT) AS n FROM sc),
    shifted AS (
      SELECT k.k, a.b, ((a.r - 1 + k.k) % a.m) + 1 AS r2, a.pred
      FROM rk a, (SELECT unnest(generate_series(1, {_LPT_K})) AS k) k
    ),
    perm AS (
      SELECT s.k,
             CAST(sum(CAST(s.pred = l.label AS BIGINT)) AS BIGINT) AS c_k
      FROM shifted s JOIN rk l ON s.b = l.b AND s.r2 = l.r
      GROUP BY s.k
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_perm,
             CAST(sum(CAST(c_k >= (SELECT c_true FROM t) AS BIGINT))
                  AS BIGINT) AS n_ge,
             CAST(sum(c_k) AS BIGINT) AS c_sum
      FROM perm
    )
    SELECT t.n,
           round(CAST(t.c_true AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS acc_true,
           round(CAST(a.c_sum AS DOUBLE)
                 / (CAST(a.n_perm AS DOUBLE) * CAST(t.n AS DOUBLE)), 6)
             AS acc_perm_mean,
           a.n_ge,
           round(CAST(1 + a.n_ge AS DOUBLE)
                 / CAST(a.n_perm + 1 AS DOUBLE), 6) AS p_value
    FROM t, agg a
    """,
)
def metric_label_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test of classifier accuracy: the true accuracy ranked
    against {k} deterministic within-bucket label rotations (the
    derangement family a distributed engine can replay exactly — each
    id%{b} bucket rotates its labels by k). p = (1 + #(perm >= true)) /
    (K + 1), the standard conservative permutation p-value. All counting
    integer; the accuracy comparison happens on raw correct-counts so no
    float enters the decision.

    Scale shape: ranks are windows PARTITIONED by the hash bucket
    (bounded partitions by construction); the shifted re-score is one
    equi-join on (bucket, rank) with a {k}x fan-out on the probe side
    only.""".format(k=_LPT_K, b=_LPT_B)
    sc = scored_frame(spark, sf_dir).select(
        "id", "label", "pred", (F.col("id") % _LPT_B).cast("bigint").alias("b")
    )
    wb = Window.partitionBy("b").orderBy("id")
    rk = sc.select(
        "id",
        "label",
        "pred",
        "b",
        F.row_number().over(wb).alias("r"),
        F.count("*").over(Window.partitionBy("b")).alias("m"),
    )
    t = sc.agg(
        F.sum((F.col("pred") == F.col("label")).cast("bigint"))
        .cast("bigint")
        .alias("c_true"),
        F.count("*").cast("bigint").alias("n"),
    )
    ks = spark.range(1, _LPT_K + 1).select(F.col("id").alias("k"))
    shifted = rk.crossJoin(F.broadcast(ks)).select(
        "k",
        "b",
        (((F.col("r") - 1 + F.col("k")) % F.col("m")) + 1).alias("r2"),
        "pred",
    )
    labels = rk.select("b", F.col("r").alias("r2"), F.col("label").alias("l2"))
    perm = (
        shifted.join(labels, ["b", "r2"])
        .groupBy("k")
        .agg(
            F.sum((F.col("pred") == F.col("l2")).cast("bigint"))
            .cast("bigint")
            .alias("c_k")
        )
    )
    agg = perm.crossJoin(F.broadcast(t)).agg(
        F.count("*").cast("bigint").alias("n_perm"),
        F.sum((F.col("c_k") >= F.col("c_true")).cast("bigint"))
        .cast("bigint")
        .alias("n_ge"),
        F.sum("c_k").cast("bigint").alias("c_sum"),
    )
    return t.crossJoin(F.broadcast(agg)).select(
        "n",
        F.round(F.col("c_true").cast("double") / F.col("n").cast("double"), 6)
        .alias("acc_true"),
        F.round(
            F.col("c_sum").cast("double")
            / (F.col("n_perm").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("acc_perm_mean"),
        "n_ge",
        F.round(
            (1 + F.col("n_ge")).cast("double")
            / (F.col("n_perm") + 1).cast("double"),
            6,
        ).alias("p_value"),
    )


# --- E26/E27: leave-one-out & leave-p-out CV --------------------------------
# Reference: iris_analysis/CV_iris_analysis.ipynb:329-331 (LeaveOneOut()) and
# :377-379 (LeavePOut(p=2)) — two of the five CV protocols its study
# compares. sklearn materializes n (resp. C(n,2)) train/test splits and
# refits per split; that is the one shape that cannot survive scale. Both
# keys instead exploit the closed form of the protocol under a
# nearest-centroid model on the account-balance feature (classes =
# c_mktsegment, x = acctbal in integer cents): removing the test point(s)
# from a class centroid is arithmetic on the class (count, sum) pair —
# n' = n − [y=c], S' = S − x·[y=c] — so EVERY fold's fit is recovered from
# ONE aggregation of the full table. cv_loo therefore runs true LOO over
# ALL rows in O(N) (no sampling, no per-fold refits: 150k folds at sf1.0
# cost one groupBy + one broadcast of a 5-row stats frame); cv_leave_p_out
# enumerates the C(n,2) pairwise splits the way the reference does —
# combinatorial by definition — on a deterministic bounded sample
# (c_custkey ≤ 100, TPC-H keys are dense from 1), keeping the key
# scale-invariant at any SF.
#
# Exactness: cents are integers (fround_int / round-cast twins), the
# adjusted distance |x·n' − S'| / n' has an exact-bigint numerator < 2^53
# (|x| < 1e6 cents, N ≤ ~1e7 rows within the documented envelope) and an
# exact-int denominator, so the IEEE division is correctly rounded and
# bit-identical in both engines; argmin ties break on class name asc via
# struct-min (Spark) / row_number (DuckDB) over the same (dist, class) key.
_CV_LOO_BASE_SQL = """
  SELECT c_custkey AS id, c_mktsegment AS y,
         CAST(round(c_acctbal * 100) AS BIGINT) AS x
  FROM customer
"""


def _cv_loo_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("y"),
        N.fround_int(F.col("c_acctbal") * 100).alias("x"),
    )


@query(
    "cv_loo",
    oracle=f"""
    WITH base AS ({_CV_LOO_BASE_SQL}),
    stats AS (
      SELECT y AS cls, CAST(count(*) AS BIGINT) AS n, sum(x) AS s
      FROM base GROUP BY y
    ),
    cand AS (
      SELECT b.id, b.y, st.cls,
             CAST(abs(b.x * (st.n - CAST(b.y = st.cls AS BIGINT))
                      - (st.s - b.x * CAST(b.y = st.cls AS BIGINT))) AS DOUBLE)
               / CAST(st.n - CAST(b.y = st.cls AS BIGINT) AS DOUBLE) AS dist
      FROM base b CROSS JOIN stats st
      WHERE st.n - CAST(b.y = st.cls AS BIGINT) > 0
    ),
    pred AS (
      SELECT id, y, cls AS pred,
             row_number() OVER (PARTITION BY id ORDER BY dist, cls) AS rn
      FROM cand
    )
    SELECT y, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(pred = y AS BIGINT)) AS BIGINT) AS n_correct,
           round(CAST(sum(CAST(pred = y AS BIGINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred WHERE rn = 1
    GROUP BY y
    """,
)
def cv_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact leave-one-out CV of a nearest-centroid classifier over the FULL
    table in one pass: per-class (n, Σx) fits every fold at once via the
    exclusion identity, candidate distances ride a 5-row broadcast, and the
    per-row argmin is a map-side-combinable struct-min groupBy (no window,
    no per-fold refit). Output = per-class LOO accuracy."""
    base = _cv_loo_base(spark, sf_dir)
    stats = base.groupBy(F.col("y").alias("cls")).agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").alias("s")
    )
    excl = (F.col("y") == F.col("cls")).cast("bigint")
    nn = F.col("n") - excl
    ss = F.col("s") - F.col("x") * excl
    cand = (
        base.crossJoin(F.broadcast(stats))
        .withColumn("nn", nn)
        .withColumn("dist", F.abs(F.col("x") * F.col("nn") - ss).cast("double") / F.col("nn").cast("double"))
        .filter(F.col("nn") > 0)
    )
    pred = cand.groupBy("id", "y").agg(
        F.min(F.struct(F.col("dist"), F.col("cls"))).getField("cls").alias("pred")
    )
    hit = (F.col("pred") == F.col("y")).cast("bigint")
    return pred.groupBy("y").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(hit).cast("bigint").alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count("*").cast("double"), 6
        ).alias("accuracy"),
    )


_LPO_N = 100  # deterministic sample: c_custkey <= 100 (dense keys from 1)


@query(
    "cv_leave_p_out",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey AS id, c_mktsegment AS y,
             CAST(round(c_acctbal * 100) AS BIGINT) AS x
      FROM customer WHERE c_custkey <= {_LPO_N}
    ),
    stats AS (
      SELECT y AS cls, CAST(count(*) AS BIGINT) AS n, sum(x) AS s
      FROM base GROUP BY y
    ),
    pairs AS (
      SELECT a.id AS ia, a.y AS ya, a.x AS xa,
             b.id AS ib, b.y AS yb, b.x AS xb
      FROM base a JOIN base b ON a.id < b.id
    ),
    cand AS (
      SELECT p.ia, p.ib, p.ya, p.yb, st.cls,
             st.n - CAST(p.ya = st.cls AS BIGINT)
                  - CAST(p.yb = st.cls AS BIGINT) AS nn,
             st.s - p.xa * CAST(p.ya = st.cls AS BIGINT)
                  - p.xb * CAST(p.yb = st.cls AS BIGINT) AS ss,
             p.xa, p.xb
      FROM pairs p CROSS JOIN stats st
    ),
    scored AS (
      SELECT ia, ib, ya, yb, cls,
             CAST(abs(xa * nn - ss) AS DOUBLE) / CAST(nn AS DOUBLE) AS da,
             CAST(abs(xb * nn - ss) AS DOUBLE) / CAST(nn AS DOUBLE) AS db
      FROM cand WHERE nn > 0
    ),
    pred AS (
      SELECT ia, ib, ya, yb,
             first(cls ORDER BY da, cls) AS pa,
             first(cls ORDER BY db, cls) AS pb
      FROM scored GROUP BY ia, ib, ya, yb
    ),
    evals AS (
      SELECT ya AS y, CAST(pa = ya AS BIGINT) AS hit FROM pred
      UNION ALL
      SELECT yb AS y, CAST(pb = yb AS BIGINT) AS hit FROM pred
    )
    SELECT y, CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(hit) AS BIGINT) AS n_correct,
           round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS accuracy
    FROM evals GROUP BY y
    """,
)
def cv_leave_p_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeavePOut(p=2) exactly as the reference's protocol defines it — every
    one of the C(n,2) test pairs is scored — via the same exclusion identity
    as cv_loo, so each split's 'refit' is two subtractions from the global
    class stats. The sample is a fixed deterministic prefix (c_custkey ≤
    {n}: pushdown-pruned scan, bounded at any SF) because LPO is
    combinatorial by definition; the pair join is a bounded broadcast
    nested loop, never data-sized. Output = per-class accuracy over all
    2·C(n,2) element evaluations.""".format(n=_LPO_N)
    base = _cv_loo_base(spark, sf_dir).filter(F.col("id") <= _LPO_N)
    stats = base.groupBy(F.col("y").alias("cls")).agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").alias("s")
    )
    a = base.select(
        F.col("id").alias("ia"), F.col("y").alias("ya"), F.col("x").alias("xa")
    )
    b = base.select(
        F.col("id").alias("ib"), F.col("y").alias("yb"), F.col("x").alias("xb")
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
    ea = (F.col("ya") == F.col("cls")).cast("bigint")
    eb = (F.col("yb") == F.col("cls")).cast("bigint")
    cand = (
        pairs.crossJoin(F.broadcast(stats))
        .withColumn("nn", F.col("n") - ea - eb)
        .withColumn("ss", F.col("s") - F.col("xa") * ea - F.col("xb") * eb)
        .filter(F.col("nn") > 0)
    )
    scored = cand.select(
        "ia", "ib", "ya", "yb", "cls",
        (F.abs(F.col("xa") * F.col("nn") - F.col("ss")).cast("double")
         / F.col("nn").cast("double")).alias("da"),
        (F.abs(F.col("xb") * F.col("nn") - F.col("ss")).cast("double")
         / F.col("nn").cast("double")).alias("db"),
    )
    pred = scored.groupBy("ia", "ib", "ya", "yb").agg(
        F.min(F.struct(F.col("da"), F.col("cls"))).getField("cls").alias("pa"),
        F.min(F.struct(F.col("db"), F.col("cls"))).getField("cls").alias("pb"),
    )
    evals = pred.select(
        F.col("ya").alias("y"), (F.col("pa") == F.col("ya")).cast("bigint").alias("hit")
    ).unionAll(
        pred.select(
            F.col("yb").alias("y"),
            (F.col("pb") == F.col("yb")).cast("bigint").alias("hit"),
        )
    )
    return evals.groupBy("y").agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.sum("hit").cast("bigint").alias("n_correct"),
        F.round(
            F.sum("hit").cast("double") / F.count("*").cast("double"), 6
        ).alias("accuracy"),
    )


# --- E28: plain (unstratified) K-fold cross_val_score ------------------------
# Reference: iris_analysis/CV_iris_analysis.ipynb (KFold cell) and
# teamProject/models.ipynb (`cross_val_score`) — the unstratified variant of
# E3 plus the per-fold score vector cross_val_score returns. Folds are the
# deterministic key-modulo assignment (seeded shuffles don't reproduce
# across engines; split_modk precedent), and the k per-fold nearest-centroid
# fits reuse the cv_loo exclusion algebra at fold granularity: train stats
# for fold f = per-class totals minus that class's fold-f cell, so ALL k
# fits come out of ONE (class x fold) aggregation — 25 rows — instead of k
# passes over the data. The CTE chain through pred(id, y, fold, p) is shared
# with cv_multi_metric (the cross_validate multi-scorer return, E29).
_CV_KFOLD_PRED_CTES = """
    WITH base AS (
      SELECT c_custkey AS id, c_mktsegment AS y,
             CAST(round(c_acctbal * 100) AS BIGINT) AS x,
             CAST(c_custkey % 5 AS INT) AS fold
      FROM customer
    ),
    cells AS (
      SELECT y AS cls, fold, CAST(count(*) AS BIGINT) AS n, sum(x) AS s
      FROM base GROUP BY y, fold
    ),
    totals AS (
      SELECT cls, CAST(sum(n) AS BIGINT) AS n_tot, sum(s) AS s_tot
      FROM cells GROUP BY cls
    ),
    tstats AS (
      SELECT c.fold, c.cls, t.n_tot - c.n AS nn, t.s_tot - c.s AS ss
      FROM cells c JOIN totals t ON c.cls = t.cls
    ),
    cand AS (
      SELECT b.id, b.y, b.fold, ts.cls,
             CAST(abs(b.x * ts.nn - ts.ss) AS DOUBLE) / CAST(ts.nn AS DOUBLE)
               AS dist
      FROM base b JOIN tstats ts ON b.fold = ts.fold
      WHERE ts.nn > 0
    ),
    pred AS (
      SELECT id, y, fold,
             first(cls ORDER BY dist, cls) AS p
      FROM cand GROUP BY id, y, fold
    )
"""


def _cv_kfold_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _CV_KFOLD_PRED_CTES: per-fold nearest-centroid
    predictions pred(id, y, fold, p) from ONE (class, fold) aggregation."""
    base = _cv_loo_base(spark, sf_dir).withColumn(
        "fold", (F.col("id") % 5).cast("int")
    )
    cells = base.groupBy(F.col("y").alias("cls"), "fold").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").alias("s")
    )
    totals = cells.groupBy("cls").agg(
        F.sum("n").cast("bigint").alias("n_tot"), F.sum("s").alias("s_tot")
    )
    tstats = cells.join(totals, "cls").select(
        "fold", "cls",
        (F.col("n_tot") - F.col("n")).alias("nn"),
        (F.col("s_tot") - F.col("s")).alias("ss"),
    )
    cand = (
        base.join(F.broadcast(tstats), "fold")
        .filter(F.col("nn") > 0)
        .select(
            "id", "y", "fold", "cls",
            (F.abs(F.col("x") * F.col("nn") - F.col("ss")).cast("double")
             / F.col("nn").cast("double")).alias("dist"),
        )
    )
    return cand.groupBy("id", "y", "fold").agg(
        F.min(F.struct(F.col("dist"), F.col("cls"))).getField("cls").alias("p")
    )


@query(
    "cv_kfold_plain",
    oracle=f"""
    {_CV_KFOLD_PRED_CTES}
    SELECT fold, CAST(count(*) AS BIGINT) AS n_val,
           CAST(sum(CAST(p = y AS BIGINT)) AS BIGINT) AS n_correct,
           round(CAST(sum(CAST(p = y AS BIGINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred GROUP BY fold
    """,
)
def cv_kfold_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross_val_score(cv=KFold(5)): per-fold validation accuracy of the
    nearest-centroid model, all five fits recovered from one (class, fold)
    aggregation via complement subtraction — one fact scan, a 25-row
    broadcast, a per-row argmin groupBy; nothing refits per fold."""
    pred = _cv_kfold_pred(spark, sf_dir)
    hit = (F.col("p") == F.col("y")).cast("bigint")
    return pred.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n_val"),
        F.sum(hit).cast("bigint").alias("n_correct"),
        F.round(
            F.sum(hit).cast("double") / F.count("*").cast("double"), 6
        ).alias("accuracy"),
    )


# --- E29: cross_validate with multiple scorers --------------------------------
# Reference: CV_iris_analysis.ipynb compares CV protocols with
# cross_validate(scoring=[...]) returning a per-fold score table per metric;
# teamProject/models.ipynb reports accuracy + macro F1 per fold. Per-class
# precision/recall come from two bounded groupBys of pred (by predicted and
# by true class — no 5x row blowup, no cross join against the fact), outer-
# joined on the (fold, class) scaffold; macro averages quantize each
# per-class metric to an e9 bigint first (fround_int both engines) so the
# 5-term sum is order-free and the division back is one correctly-rounded
# IEEE op — bit-identical across engines.
@query(
    "cv_multi_metric",
    oracle=f"""
    {_CV_KFOLD_PRED_CTES},
    ppred AS (
      SELECT fold, p AS cls, CAST(count(*) AS BIGINT) AS pcnt,
             CAST(sum(CAST(p = y AS BIGINT)) AS BIGINT) AS tp
      FROM pred GROUP BY fold, p
    ),
    ptrue AS (
      SELECT fold, y AS cls, CAST(count(*) AS BIGINT) AS tcnt
      FROM pred GROUP BY fold, y
    ),
    conf AS (
      SELECT coalesce(a.fold, b.fold) AS fold,
             coalesce(a.cls, b.cls) AS cls,
             coalesce(a.pcnt, 0) AS pcnt, coalesce(a.tp, 0) AS tp,
             coalesce(b.tcnt, 0) AS tcnt
      FROM ppred a FULL OUTER JOIN ptrue b
        ON a.fold = b.fold AND a.cls = b.cls
    ),
    percls AS (
      SELECT fold,
             CASE WHEN pcnt > 0
                  THEN CAST(tp AS DOUBLE) / CAST(pcnt AS DOUBLE)
                  ELSE 0.0 END AS prec,
             CASE WHEN tcnt > 0
                  THEN CAST(tp AS DOUBLE) / CAST(tcnt AS DOUBLE)
                  ELSE 0.0 END AS rec
      FROM conf
    ),
    q AS (
      SELECT fold,
             CAST(round(prec * 1000000000) AS BIGINT) AS p9,
             CAST(round(rec * 1000000000) AS BIGINT) AS r9,
             CAST(round(CASE WHEN prec + rec > 0
                             THEN 2.0 * prec * rec / (prec + rec)
                             ELSE 0.0 END * 1000000000) AS BIGINT) AS f9
      FROM percls
    ),
    acc AS (
      SELECT fold, CAST(count(*) AS BIGINT) AS n_val,
             round(CAST(sum(CAST(p = y AS BIGINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS accuracy
      FROM pred GROUP BY fold
    ),
    mac AS (
      SELECT fold,
             round(CAST(sum(p9) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1000000000.0), 6)
               AS precision_macro,
             round(CAST(sum(r9) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1000000000.0), 6)
               AS recall_macro,
             round(CAST(sum(f9) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1000000000.0), 6)
               AS f1_macro
      FROM q GROUP BY fold
    )
    SELECT a.fold, a.n_val, a.accuracy,
           m.precision_macro, m.recall_macro, m.f1_macro
    FROM acc a JOIN mac m ON a.fold = m.fold
    """,
)
def cv_multi_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross_validate(cv=KFold(5), scoring=[accuracy, precision_macro,
    recall_macro, f1_macro]): the multi-scorer per-fold table. One fold-pred
    pass (shared with cv_kfold_plain), then two bounded groupBys (by
    predicted / by true class) outer-joined on (fold, class) — the macro
    averages never rescan the fact."""
    pred = _cv_kfold_pred(spark, sf_dir)
    ppred = pred.groupBy("fold", F.col("p").alias("cls")).agg(
        F.count("*").cast("bigint").alias("pcnt"),
        F.sum((F.col("p") == F.col("y")).cast("bigint"))
        .cast("bigint")
        .alias("tp"),
    )
    ptrue = pred.groupBy("fold", F.col("y").alias("cls")).agg(
        F.count("*").cast("bigint").alias("tcnt")
    )
    conf = (
        ppred.join(ptrue, ["fold", "cls"], "full_outer")
        .select(
            "fold", "cls",
            F.coalesce("pcnt", F.lit(0)).alias("pcnt"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("tcnt", F.lit(0)).alias("tcnt"),
        )
    )
    prec = F.when(
        F.col("pcnt") > 0,
        F.col("tp").cast("double") / F.col("pcnt").cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tcnt") > 0,
        F.col("tp").cast("double") / F.col("tcnt").cast("double"),
    ).otherwise(F.lit(0.0))
    percls = conf.select("fold", prec.alias("prec"), rec.alias("rec"))
    f1 = F.when(
        F.col("prec") + F.col("rec") > 0,
        F.lit(2.0) * F.col("prec") * F.col("rec")
        / (F.col("prec") + F.col("rec")),
    ).otherwise(F.lit(0.0))
    e9 = 1_000_000_000
    q = percls.select(
        "fold",
        N.fround_int(F.col("prec") * e9).alias("p9"),
        N.fround_int(F.col("rec") * e9).alias("r9"),
        N.fround_int(f1 * e9).alias("f9"),
    )
    mac = q.groupBy("fold").agg(
        *[
            F.round(
                F.sum(c).cast("double")
                / (F.count("*").cast("double") * F.lit(float(e9))),
                6,
            ).alias(n)
            for c, n in [
                ("p9", "precision_macro"),
                ("r9", "recall_macro"),
                ("f9", "f1_macro"),
            ]
        ]
    )
    hit = (F.col("p") == F.col("y")).cast("bigint")
    acc = pred.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n_val"),
        F.round(
            F.sum(hit).cast("double") / F.count("*").cast("double"), 6
        ).alias("accuracy"),
    )
    return acc.join(mac, "fold").select(
        "fold", "n_val", "accuracy",
        "precision_macro", "recall_macro", "f1_macro",
    )


# --- pass@k estimator (code-eval style) --------------------------------------
# Unbiased pass@k (Chen et al., HumanEval): per problem with n attempts and
# c successes, pass@k = 1 - C(n-c,k)/C(n,k), computed as the fixed-order
# product prod_{i<k} (n-c-i)/(n-i). The product is <= 10 IEEE double
# operations in literal order, identical in both engines; each per-problem
# value is quantized to e9 BEFORE the cross-problem mean so the aggregate is
# order-free integer arithmetic.
_PAK_KS = (1, 5, 10)
_PAK_MIN_N = 10  # estimator needs n >= k for every reported k


def _pak_p9(k: int) -> str:
    """e9-quantized pass@k over columns (n, c) — valid Spark SQL + DuckDB."""
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
        for i in range(k)
    )
    return (
        f"CAST(floor((CASE WHEN n - c < {k} THEN CAST(1.0 AS DOUBLE)"
        f" ELSE CAST(1.0 AS DOUBLE) - ({prod}) END) * 1e9 + 0.5) AS BIGINT)"
    )


@query(
    "metric_pass_at_k",
    oracle=f"""
    WITH p AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value > 60.0 AS INT)) AS BIGINT) AS c
      FROM events GROUP BY user_id HAVING count(*) >= {_PAK_MIN_N}
    ),
    s AS (
      SELECT {_pak_p9(1)} AS p1, {_pak_p9(5)} AS p5, {_pak_p9(10)} AS p10
      FROM p
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_problems,
             CAST(sum(p1) AS BIGINT) AS s1,
             CAST(sum(p5) AS BIGINT) AS s5,
             CAST(sum(p10) AS BIGINT) AS s10
      FROM s
    )
    SELECT 1 AS k, n_problems, s1 AS sum_p9,
           CAST(floor(s1 * 1.0 / n_problems + 0.5) AS BIGINT) AS mean_p9
    FROM t
    UNION ALL
    SELECT 5, n_problems, s5,
           CAST(floor(s5 * 1.0 / n_problems + 0.5) AS BIGINT) FROM t
    UNION ALL
    SELECT 10, n_problems, s10,
           CAST(floor(s10 * 1.0 / n_problems + 0.5) AS BIGINT) FROM t
    """,
)
def metric_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over a problems-x-attempts table (problem = user, attempt =
    event, success = value > 60) for k in {_PAK_KS} — THE functional-
    correctness metric for code-generation eval sets (HumanEval/MBPP),
    using the unbiased estimator 1 - C(n-c,k)/C(n,k) rather than the
    biased empirical mean of min(1, c/k-ish) resamples. Problems with
    fewer than {_PAK_MIN_N} attempts are excluded so the estimator is
    defined for every reported k.

    Scale shape: ONE map-side-combined groupBy(problem) over the attempt
    facts, then a <= |problems|-row projection computing all three k's in
    one pass and a single scalar aggregate — no window, no join, no
    second fact scan; the 3-row readout is a stack over one aggregate
    row. Cross-engine exactness: the estimator product is a fixed-order
    chain of <= 10 double ops (bit-identical in both engines); per-problem
    values are e9-quantized before summation so the mean is order-free
    integer arithmetic — the same convention as cv_multi_metric."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.groupBy("user_id")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n"),
            F.expr("CAST(sum(CAST(value > 60.0 AS INT)) AS BIGINT) AS c"),
        )
        .filter(f"n >= {_PAK_MIN_N}")
    )
    s = p.selectExpr(
        f"{_pak_p9(1)} AS p1", f"{_pak_p9(5)} AS p5", f"{_pak_p9(10)} AS p10"
    )
    t = s.agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_problems"),
        F.expr("CAST(sum(p1) AS BIGINT) AS s1"),
        F.expr("CAST(sum(p5) AS BIGINT) AS s5"),
        F.expr("CAST(sum(p10) AS BIGINT) AS s10"),
    )
    return t.selectExpr(
        "stack(3, 1, s1, 5, s5, 10, s10) AS (k, sum_p9)", "n_problems"
    ).selectExpr(
        "k",
        "n_problems",
        "sum_p9",
        "CAST(floor(sum_p9 * 1.0 / n_problems + 0.5) AS BIGINT) AS mean_p9",
    )
