"""Model-selection machinery (SURVEY.md §2.9-2.10): PCA, permutation
importance, shuffle-split CV, bootstrap, OOF stacking, grid/random HPO —
the *deterministic, oracle-checked* forms.

The reference's versions are seeded-RNG sklearn loops; seeded RNG cannot be
reproduced across two engines, so each operator is re-derived with a
portable determinism source (md5-based hashing, cyclic-shift permutations,
modulo folds) that both Spark and DuckDB compute identically. The spark.ml
estimator forms (real RF importances, real ml.PCA, trained models) live in
``mlmodels.py`` under rows-only checks.

Reference parity:
- pca                      → teamProject/eda.ipynb:1488-1500 (M12)
- feature_importance_perm  → wine…11….ipynb:5539-5552 (M15)
- cv_shuffle_split         → cross-validation/wine_analysis.py:122 (E4)
- bootstrap_resample       → src/ensemble/alternative.py:130-139 (E5)
- ensemble_stacking_oof    → src/ensemble/stacking.py:15-129 (E17)
- hpo_grid                 → experiments/overfitting_experiment.py:28-195 (E19)
- hpo_random               → best_score_random_search.py:62-167 (E20)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import numeric as N
from ..operators.bounded_seq import ordered_row_numbers
from ..operators.shift_ops import cyclic_lead
from ..registry import query
from ..sources import load_table
from .dedup import _h_spark, _h_sql

# --- shared scored base over orders (same derivation as joins_unions) -------
_SCORED_SQL = """
  SELECT o_orderkey AS id,
         CAST(o_totalprice > 150000.0 AS INT) AS label,
         CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS prob,
         o_totalprice
  FROM orders
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    prob = ((F.col("o_orderkey") * F.lit(2654435761)) % 1000).cast("double") / 1000.0
    return o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("label"),
        prob.alias("prob"),
        "o_totalprice",
    )


# =============================================================================
# M12: PCA — explained variance from exact sufficient statistics
# =============================================================================
# Distributed part: one pass of decimal sums building the 2x2 covariance
# matrix; eigen-solve is closed-form expression arithmetic (identical IEEE
# op sequence in both engines). The n-feature spark.ml PCA (covariance →
# breeze eigh) is `pca_ml` in mlmodels.py — same design, driver eigen-solve
# over distributed sufficient stats, which is how PCA scales to 100 TB.
_PCA_STATS_SQL = f"""
  SELECT CAST(count(*) AS DOUBLE) AS n,
         {N.sql_dsum('l_quantity')} AS sx,
         {N.sql_dsum('l_extendedprice')} AS sy,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6)) * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10))) AS DOUBLE) AS syy,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6)) * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
  FROM lineitem
"""


@query(
    "pca",
    oracle=f"""
    WITH s AS ({_PCA_STATS_SQL}),
    cov AS (
      SELECT (sxx - sx * sx / n) / (n - 1.0) AS vx,
             (syy - sy * sy / n) / (n - 1.0) AS vy,
             (sxy - sx * sy / n) / (n - 1.0) AS cxy
      FROM s
    ),
    eig AS (
      SELECT (vx + vy + sqrt((vx - vy) * (vx - vy) + 4.0 * cxy * cxy)) / 2.0 AS l1,
             (vx + vy - sqrt((vx - vy) * (vx - vy) + 4.0 * cxy * cxy)) / 2.0 AS l2,
             vx + vy AS tr
      FROM cov
    )
    SELECT 'pc1' AS component, round(l1, 4) AS eigenvalue,
           round(l1 / tr, 6) AS explained_variance_ratio FROM eig
    UNION ALL
    SELECT 'pc2', round(l2, 4), round(l2 / tr, 6) FROM eig
    """,
)
def pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(25,6)")
    y = F.col("l_extendedprice").cast("decimal(25,6)")
    s = li.agg(
        F.count("*").cast("double").alias("n"),
        N.dsum("l_quantity").alias("sx"),
        N.dsum("l_extendedprice").alias("sy"),
        F.sum((x * x).cast("decimal(38,10)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,10)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(38,10)")).cast("double").alias("sxy"),
    )
    cov = s.select(
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1.0)).alias("vx"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (F.col("n") - 1.0)).alias("vy"),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (F.col("n") - 1.0)).alias("cxy"),
    )
    disc = F.sqrt(
        (F.col("vx") - F.col("vy")) * (F.col("vx") - F.col("vy"))
        + 4.0 * F.col("cxy") * F.col("cxy")
    )
    eig = cov.select(
        ((F.col("vx") + F.col("vy") + disc) / 2.0).alias("l1"),
        ((F.col("vx") + F.col("vy") - disc) / 2.0).alias("l2"),
        (F.col("vx") + F.col("vy")).alias("tr"),
    )
    pc1 = eig.select(
        F.lit("pc1").alias("component"),
        F.round("l1", 4).alias("eigenvalue"),
        F.round(F.col("l1") / F.col("tr"), 6).alias("explained_variance_ratio"),
    )
    pc2 = eig.select(
        F.lit("pc2").alias("component"),
        F.round("l2", 4).alias("eigenvalue"),
        F.round(F.col("l2") / F.col("tr"), 6).alias("explained_variance_ratio"),
    )
    return pc1.unionByName(pc2)


# =============================================================================
# M15: permutation importance with a deterministic permutation
# =============================================================================
# sklearn shuffles a column n_repeats times; a seeded shuffle is not portable,
# so the permutation here is the cyclic shift (row i gets row i+1's value,
# last wraps to first) — a genuine derangement, identical in both engines.
# Model = fixed rule pred := (l_quantity >= 25) scored against
# label := (l_extendedprice > 30000); permuting l_quantity destroys the
# signal, permuting l_discount (unused by the model) must yield ~0 importance.
_PERM_SQL = """
  WITH base AS (
    SELECT CAST(l_extendedprice > 30000.0 AS INT) AS label,
           l_quantity AS q, l_discount AS d,
           lead(l_quantity) OVER w AS q_next0,
           first_value(l_quantity) OVER w AS q_first,
           lead(l_discount) OVER w AS d_next0,
           first_value(l_discount) OVER w AS d_first
    FROM lineitem
    -- (l_orderkey, l_linenumber) alone is NOT unique in the synthetic
    -- fixture; quantity+extendedprice complete a unique key so the
    -- cyclic shift is fully determined (no engine-dependent tie order)
    WINDOW w AS (ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
  ),
  scored AS (
    SELECT label,
           CAST(q >= 25.0 AS INT) AS pred_base,
           CAST(coalesce(q_next0, q_first) >= 25.0 AS INT) AS pred_perm_q,
           CAST(q >= 25.0 AS INT) AS pred_perm_d
    FROM base
  ),
  accs AS (
    SELECT CAST(sum(CAST(pred_base = label AS BIGINT)) AS DOUBLE) / count(*) AS acc_base,
           CAST(sum(CAST(pred_perm_q = label AS BIGINT)) AS DOUBLE) / count(*) AS acc_q,
           CAST(sum(CAST(pred_perm_d = label AS BIGINT)) AS DOUBLE) / count(*) AS acc_d
    FROM scored
  )
  SELECT 'l_quantity' AS feature, round(acc_base, 6) AS baseline_acc,
         round(acc_q, 6) AS permuted_acc, round(acc_base - acc_q, 6) AS importance
  FROM accs
  UNION ALL
  SELECT 'l_discount', round(acc_base, 6), round(acc_d, 6), round(acc_base - acc_d, 6)
  FROM accs
"""


@query("feature_importance_perm", oracle=_PERM_SQL)
def feature_importance_perm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cyclic shift runs through ``cyclic_lead`` — range-bucketed
    per-bucket lead with next-bucket wrap stitching, so no unpartitioned
    window ever sees raw rows (bit-identical to the oracle's global
    ``lead``; see operators/shift_ops.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    sh = cyclic_lead(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        ["l_quantity"],
    )
    base = sh.select(
        (F.col("l_extendedprice") > 30000.0).cast("int").alias("label"),
        F.col("l_quantity").alias("q"),
        F.col("l_quantity_next").alias("q_perm"),
    )
    scored = base.select(
        "label",
        (F.col("q") >= 25.0).cast("int").alias("pred_base"),
        (F.col("q_perm") >= 25.0).cast("int").alias("pred_perm_q"),
    )
    accs = scored.agg(
        (F.sum((F.col("pred_base") == F.col("label")).cast("bigint")).cast("double") / F.count("*")).alias("acc_base"),
        (F.sum((F.col("pred_perm_q") == F.col("label")).cast("bigint")).cast("double") / F.count("*")).alias("acc_q"),
    )
    row_q = accs.select(
        F.lit("l_quantity").alias("feature"),
        F.round("acc_base", 6).alias("baseline_acc"),
        F.round("acc_q", 6).alias("permuted_acc"),
        F.round(F.col("acc_base") - F.col("acc_q"), 6).alias("importance"),
    )
    # l_discount is not used by the rule — permuting it provably changes
    # nothing, so its row is the baseline twice with importance 0
    row_d = accs.select(
        F.lit("l_discount").alias("feature"),
        F.round("acc_base", 6).alias("baseline_acc"),
        F.round("acc_base", 6).alias("permuted_acc"),
        F.round(F.lit(0.0), 6).alias("importance"),
    )
    return row_q.unionByName(row_d)


# =============================================================================
# E4: stratified shuffle-split CV with a portable hash "shuffle"
# =============================================================================
_N_ITERS = 10


@query(
    "cv_shuffle_split",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    assigned AS (
      SELECT t.iter, s.label, CAST(s.prob >= 0.5 AS INT) AS pred
      FROM s CROSS JOIN range({_N_ITERS}) t(iter)
      WHERE {_h_sql("concat(CAST(s.id AS VARCHAR), ':', CAST(t.iter AS VARCHAR))")} % 2 = 0
    ),
    per_iter AS (
      SELECT iter,
             CAST(sum(CAST(pred = label AS BIGINT)) AS DOUBLE) / count(*) AS acc,
             count(*) AS n_test
      FROM assigned GROUP BY iter
    )
    SELECT count(*) AS n_iters,
           round(avg(acc), 6) AS mean_acc,
           round(stddev_samp(acc), 6) AS std_acc,
           min(n_test) AS min_test_n, max(n_test) AS max_test_n
    FROM per_iter
    """,
)
def cv_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each iteration's test half = rows where md5(id:iter) is even — the
    portable stand-in for StratifiedShuffleSplit's seeded shuffle. One fused
    pass: rows x iters expanded, filtered, aggregated (no 10 separate scans;
    the reference loops). acc mean/std over iterations, ddof=1 like pandas."""
    s = _scored(spark, sf_dir)
    iters = spark.range(_N_ITERS).select(F.col("id").alias("iter"))
    h = _h_spark(
        F.concat(F.col("id").cast("string"), F.lit(":"), F.col("iter").cast("string"))
    )
    assigned = (
        s.crossJoin(F.broadcast(iters))
        .filter(h % 2 == 0)
        .select("iter", "label", (F.col("prob") >= 0.5).cast("int").alias("pred"))
    )
    per_iter = assigned.groupBy("iter").agg(
        (F.sum((F.col("pred") == F.col("label")).cast("bigint")).cast("double") / F.count("*")).alias("acc"),
        F.count("*").alias("n_test"),
    )
    return per_iter.agg(
        F.count("*").alias("n_iters"),
        F.round(F.avg("acc"), 6).alias("mean_acc"),
        F.round(F.stddev_samp("acc"), 6).alias("std_acc"),
        F.min("n_test").alias("min_test_n"),
        F.max("n_test").alias("max_test_n"),
    )


# =============================================================================
# E5: bootstrap resampling — the Poisson bootstrap (scale-correct form)
# =============================================================================
# The classic bootstrap draws n times WITH replacement — a multinomial that
# needs global n and a shared RNG, neither of which distributes. The Poisson
# bootstrap (each row appears Poisson(rate) times per replica) is the
# standard scale substitute AND is portable: the per-(row, replica) count
# comes from an md5-derived uniform pushed through the Poisson(0.8) inverse
# CDF. No shuffle at all — counts are weights in the aggregation.
_N_REPLICAS = 5
# Poisson(0.8) CDF breakpoints, 6dp (rate 0.8 = the reference's ratio)
_P_CDF = [0.449329, 0.808792, 0.952577, 0.990920, 0.998589]


def _poisson_count_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {p} THEN {i}" for i, p in enumerate(_P_CDF)
    )
    return f"CASE {cases} ELSE {len(_P_CDF)} END"


@query(
    "bootstrap_resample",
    oracle=f"""
    WITH s AS ({_SCORED_SQL}),
    drawn AS (
      SELECT t.replica, s.o_totalprice,
             {_poisson_count_sql(
                 "(" + _h_sql("concat(CAST(s.id AS VARCHAR), '#', CAST(t.replica AS VARCHAR))") + " % 1000000) / 1000000.0"
             )} AS c
      FROM s CROSS JOIN range({_N_REPLICAS}) t(replica)
    )
    SELECT replica,
           CAST(sum(c) AS BIGINT) AS n_draws,
           CAST(sum(CAST(c > 0 AS BIGINT)) AS BIGINT) AS n_unique_rows,
           round(CAST(sum(CAST(c * o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 / sum(c), 6) AS mean_price
    FROM drawn GROUP BY replica
    """,
)
def bootstrap_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir)
    reps = spark.range(_N_REPLICAS).select(F.col("id").alias("replica"))
    u = (
        _h_spark(
            F.concat(
                F.col("id").cast("string"), F.lit("#"), F.col("replica").cast("string")
            )
        )
        % 1000000
    ) / 1000000.0
    c = F.when(u < _P_CDF[0], 0)
    for i, p in enumerate(_P_CDF[1:], start=1):
        c = c.when(u < p, i)
    c = c.otherwise(len(_P_CDF))
    drawn = s.crossJoin(F.broadcast(reps)).select(
        "replica", "o_totalprice", c.alias("c")
    )
    return drawn.groupBy("replica").agg(
        F.sum("c").alias("n_draws"),
        F.sum((F.col("c") > 0).cast("bigint")).alias("n_unique_rows"),
        F.round(
            F.sum((F.col("c") * F.col("o_totalprice")).cast("decimal(25,6)")).cast("double")
            / F.sum("c"),
            6,
        ).alias("mean_price"),
    )


# =============================================================================
# E17: OOF stacking with closed-form meta model
# =============================================================================
# The OOF pattern with everything SQL-expressible: two deterministic base
# scorers; per fold, meta weights = each scorer's accuracy on the TRAIN side
# (fit-on-train), applied to the fold's validation rows (transform-val).
# This checks exactly the hard distributed part — the fold-union-join OOF
# assembly replacing positional scatter writes. The spark.ml meta-LR version
# is operators/ml_ops.py:stacking_oof, exercised rows-only in mlmodels.py.
_STACK_BASE_SQL = """
  SELECT o_orderkey AS id,
         CAST(o_orderkey % 5 AS INT) AS fold,
         CAST(o_totalprice > 150000.0 AS INT) AS label,
         CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS s1,
         CAST((o_orderkey * 1103515245 + 12345) % 1000 AS DOUBLE) / 1000.0 AS s2
  FROM orders
"""


@query(
    "ensemble_stacking_oof",
    oracle=f"""
    WITH base AS ({_STACK_BASE_SQL}),
    per_fold AS (
      SELECT fold, count(*) AS n,
             sum(CAST((s1 >= 0.5) = (label = 1) AS BIGINT)) AS c1,
             sum(CAST((s2 >= 0.5) = (label = 1) AS BIGINT)) AS c2
      FROM base GROUP BY fold
    ),
    weights AS (
      SELECT fold,
             CAST(sum(c1) OVER () - c1 AS DOUBLE) / CAST(sum(n) OVER () - n AS DOUBLE) AS w1,
             CAST(sum(c2) OVER () - c2 AS DOUBLE) / CAST(sum(n) OVER () - n AS DOUBLE) AS w2
      FROM per_fold
    ),
    meta AS (
      SELECT b.fold, b.label,
             CAST((w.w1 * b.s1 + w.w2 * b.s2) / (w.w1 + w.w2) >= 0.5 AS INT) AS meta_pred
      FROM base b JOIN weights w ON b.fold = w.fold
    )
    SELECT m.fold, round(w.w1, 6) AS w1, round(w.w2, 6) AS w2,
           round(CAST(sum(CAST(m.meta_pred = m.label AS BIGINT)) AS DOUBLE)
                 / count(*), 6) AS val_acc,
           count(*) AS n_val
    FROM meta m JOIN weights w ON m.fold = w.fold
    GROUP BY m.fold, w.w1, w.w2
    """,
)
def ensemble_stacking_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 5).cast("int").alias("fold"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("label"),
        (((F.col("o_orderkey") * F.lit(2654435761)) % 1000).cast("double") / 1000.0).alias("s1"),
        (((F.col("o_orderkey") * 1103515245 + 12345) % 1000).cast("double") / 1000.0).alias("s2"),
    )
    per_fold = base.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.sum(((F.col("s1") >= 0.5) == (F.col("label") == 1)).cast("bigint")).alias("c1"),
        F.sum(((F.col("s2") >= 0.5) == (F.col("label") == 1)).cast("bigint")).alias("c2"),
    )
    # leave-one-fold-out totals via broadcast crossJoin, not an unpartitioned
    # window — per_fold is 5 rows so the window was bounded, but the repo
    # invariant is ZERO WindowExec-without-partition anywhere (this was the
    # last one; bounded_seq.py explains why the invariant is absolute)
    totals = per_fold.agg(
        F.sum("c1").alias("tc1"), F.sum("c2").alias("tc2"), F.sum("n").alias("tn")
    )
    weights = per_fold.crossJoin(F.broadcast(totals)).select(
        "fold",
        ((F.col("tc1") - F.col("c1")).cast("double") / (F.col("tn") - F.col("n")).cast("double")).alias("w1"),
        ((F.col("tc2") - F.col("c2")).cast("double") / (F.col("tn") - F.col("n")).cast("double")).alias("w2"),
    )
    meta = base.join(F.broadcast(weights), "fold").select(
        "fold",
        "label",
        "w1",
        "w2",
        (
            (F.col("w1") * F.col("s1") + F.col("w2") * F.col("s2"))
            / (F.col("w1") + F.col("w2"))
            >= 0.5
        ).cast("int").alias("meta_pred"),
    )
    return meta.groupBy("fold", "w1", "w2").agg(
        F.round(
            F.sum((F.col("meta_pred") == F.col("label")).cast("bigint")).cast("double") / F.count("*"),
            6,
        ).alias("val_acc"),
        F.count("*").alias("n_val"),
    ).select(
        "fold",
        F.round("w1", 6).alias("w1"),
        F.round("w2", 6).alias("w2"),
        "val_acc",
        "n_val",
    )


# =============================================================================
# E19/E20: grid + random hyperparameter search over a CV'd threshold model
# =============================================================================
# The search loop fused into one plan: per-(fold, score, label) counts first
# (the rank-compression trick — the fact table is touched once), then the
# config dim cross-joins against the tiny compressed table.
def _hpo_eval_sql(cfg_sql: str) -> str:
    return f"""
    WITH s AS ({_SCORED_SQL}),
    per AS (
      SELECT CAST(id % 5 AS INT) AS fold, prob, label, count(*) AS cnt
      FROM s GROUP BY 1, 2, 3
    ),
    cfg AS ({cfg_sql}),
    scored AS (
      SELECT cfg.config_id, cfg.tau, per.fold,
             CAST(sum(CAST((per.prob >= cfg.tau) = (per.label = 1) AS BIGINT) * per.cnt) AS DOUBLE)
               / sum(per.cnt) AS acc
      FROM per CROSS JOIN cfg
      GROUP BY cfg.config_id, cfg.tau, per.fold
    ),
    summary AS (
      SELECT config_id, tau,
             round(avg(acc), 6) AS mean_acc,
             round(stddev_samp(acc), 6) AS std_acc
      FROM scored GROUP BY config_id, tau
    )
    SELECT config_id, round(tau, 2) AS tau, mean_acc, std_acc,
           CAST(row_number() OVER (ORDER BY mean_acc DESC, config_id) AS INT) AS rnk
    FROM summary
    """


def _hpo_eval_spark(spark: SparkSession, sf_dir: str, cfg: DataFrame) -> DataFrame:
    s = _scored(spark, sf_dir)
    per = s.groupBy(
        (F.col("id") % 5).cast("int").alias("fold"), "prob", "label"
    ).agg(F.count("*").alias("cnt"))
    scored = (
        per.crossJoin(F.broadcast(cfg))
        .groupBy("config_id", "tau", "fold")
        .agg(
            (
                F.sum(
                    ((F.col("prob") >= F.col("tau")) == (F.col("label") == 1)).cast("bigint")
                    * F.col("cnt")
                ).cast("double")
                / F.sum("cnt")
            ).alias("acc")
        )
    )
    summary = scored.groupBy("config_id", "tau").agg(
        F.round(F.avg("acc"), 6).alias("mean_acc"),
        F.round(F.stddev_samp("acc"), 6).alias("std_acc"),
    )
    picked = summary.select(
        "config_id", F.round("tau", 2).alias("tau"), "mean_acc", "std_acc"
    )
    return ordered_row_numbers(
        picked, [("mean_acc", False), ("config_id", True)], out="rnk"
    )


# tau built as integer arithmetic + ONE double division: DuckDB evaluates
# decimal literals exactly (0.30 + 0.05*g) while Spark uses doubles — the
# integer form produces bit-identical doubles in both engines.
_GRID_CFG_SQL = """
  SELECT CAST(g AS INT) AS config_id, CAST(30 + 5 * g AS DOUBLE) / 100.0 AS tau
  FROM range(9) t(g)
"""


@query("hpo_grid", oracle=_hpo_eval_sql(_GRID_CFG_SQL))
def hpo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit config ladder (the reference's 25-level C ladders) over 5-fold
    CV, evaluated in ONE Spark job: configs are a broadcast dim against
    rank-compressed per-fold counts — not a driver loop of 45 fits."""
    cfg = spark.range(9).select(
        F.col("id").cast("int").alias("config_id"),
        ((30 + 5 * F.col("id")).cast("double") / 100.0).alias("tau"),
    )
    return _hpo_eval_spark(spark, sf_dir, cfg)


_RAND_CFG_SQL = f"""
  SELECT CAST(g AS INT) AS config_id,
         CAST(25 + {_h_sql("concat('cfg:', CAST(g AS VARCHAR))")} % 50 AS DOUBLE) / 100.0 AS tau
  FROM range(10) t(g)
"""


@query("hpo_random", oracle=_hpo_eval_sql(_RAND_CFG_SQL))
def hpo_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random search: configs sampled from U(0.25, 0.74) via the portable
    md5 hash (the engine-agnostic seeded RNG). Same fused evaluation plan."""
    cfg = spark.range(10).select(
        F.col("id").cast("int").alias("config_id"),
        (
            (
                25 + _h_spark(F.concat(F.lit("cfg:"), F.col("id").cast("string"))) % 50
            ).cast("double")
            / 100.0
        ).alias("tau"),
    )
    return _hpo_eval_spark(spark, sf_dir, cfg)


# --- grouped applyInPandas OLS (Arrow cogroup path, oracle-exact) ------------
@query(
    "pandas_group_ols",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS grp, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
                           * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,10)))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT grp, CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM s
    """,
)
def pandas_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fitted INSIDE a grouped Arrow UDF (applyInPandas) —
    the escape hatch for per-group logic the built-in operators can't
    express, exercised here on semantics the relational linreg_ols_group
    also covers so the UDF path itself is oracle-checked bit-exact.

    Exactness inside Python: values scale to int64 centi-units and the
    sufficient statistics accumulate as PYTHON INTS (arbitrary precision
    — no float summation order anywhere); the closed-form solve then
    replays the oracle's exact double tree (float(K)/100 is the same
    IEEE rounding as DECIMAL(·,2)→DOUBLE). Scale: one shuffle on the
    group key; each group is one Arrow batch stream."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), "l_quantity", "l_extendedprice"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xi = (pdf["l_quantity"] * 100).round().astype("int64")
        yi = (pdf["l_extendedprice"] * 100).round().astype("int64")
        n_i = len(pdf)
        sx_i = int(xi.sum())
        sy_i = int(yi.sum())
        sxx_i = int((xi.astype(object) * xi.astype(object)).sum())
        sxy_i = int((xi.astype(object) * yi.astype(object)).sum())
        n = float(n_i)
        sx = float(sx_i) / 100.0
        sy = float(sy_i) / 100.0
        sxx = float(sxx_i) / 10000.0
        sxy = float(sxy_i) / 10000.0
        denom = n * sxx - sx * sx
        from decimal import ROUND_HALF_UP, Decimal

        r6 = lambda v: float(  # noqa: E731 — mirrors round(double, 6)
            Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        # degenerate group (single row / constant x): the oracle's double
        # division by zero is NULL in DuckDB — mirror it instead of
        # raising ZeroDivisionError out of the Arrow kernel
        if denom == 0.0:
            slope_v = intercept_v = None
        else:
            slope = (n * sxy - sx * sy) / denom
            slope_v = r6(slope)
            intercept_v = r6((sy - slope * sx) / n)
        return pd.DataFrame(
            {
                "grp": [pdf["grp"].iloc[0]],
                "n_rows": [n_i],
                "slope": [slope_v],
                "intercept": [intercept_v],
            }
        )

    return li.groupBy("grp").applyInPandas(
        fit, "grp string, n_rows long, slope double, intercept double"
    )
