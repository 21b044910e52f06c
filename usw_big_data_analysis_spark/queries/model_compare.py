"""Multi-model CV comparison tests (reference: the cross-validation study).

The reference compares a 12-model zoo fold-by-fold and tests significance
pairwise with Wilcoxon over StratifiedKFold / 40x StratifiedShuffleSplit
scores (`cross-validation/wine_analysis.py:98,122,151`). The canonical
statistics for that exact design — comparing k classifiers over the SAME
folds/splits — are Cochran's Q (k paired binary classifiers), the Friedman
rank test with the Nemenyi critical difference (k models x K folds,
Demšar 2006), and the Nadeau-Bengio corrected resampled t-test (repeated
random splits share training rows, so the naive paired t-test is
anti-conservative). This module adds all three over the deterministic
scored frame, each as one or two linear aggregation passes.

Scale notes: every key aggregates the fact table ONCE per logical pass
with map-side partial aggregation; the models / repetition dimensions are
broadcast literal frames (4 and 10 rows), so the fact is never shuffled
on a data-dependent key. Rank / variance arithmetic runs on tiny
aggregated frames (k x K rows) in exact integer or half-integer space so
both engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# Deterministic k=4 "model zoo": thresholds over the shared pseudo-score
# (same hash arithmetic as _shared.pred_frame). Each model m predicts
# positive iff prob >= theta_m; correctness is an integer per (row, model).
_THETAS = (0.30, 0.45, 0.50, 0.62)
_K = len(_THETAS)

_BASE_SQL = """
  SELECT o_orderkey AS id,
         CAST(o_totalprice > 150000.0 AS INT) AS label,
         CAST((o_orderkey * 2654435761) % 1000 AS DOUBLE) / 1000.0 AS prob
  FROM orders
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    prob = ((F.col("o_orderkey") * F.lit(2654435761)) % 1000).cast(
        "double"
    ) / 1000.0
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice") > 150000.0).cast("int").alias("label"),
        prob.alias("prob"),
    )


def _correct_expr(theta: float) -> str:
    """Integer correctness of the theta-threshold model (identical SQL
    fragment on both engines)."""
    return f"CAST(CAST(prob >= {theta!r} AS INT) = label AS BIGINT)"


# --- Cochran's Q over k paired binary classifiers ---------------------------
_COCHRAN_TJ = ", ".join(
    f"CAST(sum({_correct_expr(t)}) AS BIGINT) AS t{i + 1}"
    for i, t in enumerate(_THETAS)
)
_COCHRAN_R = " + ".join(_correct_expr(t) for t in _THETAS)


@query(
    "cochran_q_models",
    oracle=f"""
    WITH s AS ({_BASE_SQL}),
    a AS (
      SELECT count(*) AS n,
             {_COCHRAN_TJ},
             CAST(sum({_COCHRAN_R}) AS BIGINT) AS s1,
             CAST(sum(({_COCHRAN_R}) * ({_COCHRAN_R})) AS BIGINT) AS s2
      FROM s
    )
    SELECT n, t1, t2, t3, t4,
           round(CAST(({_K} - 1) * ({_K} * (t1*t1 + t2*t2 + t3*t3 + t4*t4)
                                     - s1*s1) AS DOUBLE)
                 / CAST(nullif({_K} * s1 - s2, 0) AS DOUBLE), 6) AS q_stat
    FROM a
    """,
)
def cochran_q_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q: do the k={_K} threshold models have equal error rates
    on the SAME examples? Q = (k-1)(k ΣTj² − S²)/(kS − Σrᵢ²) with Tj the
    per-model success totals and rᵢ the per-row success counts — the
    k-model generalization of McNemar that the reference's pairwise
    Wilcoxon sweep approximates (`cross-validation/wine_analysis.py:151`).

    Scale shape: ONE aggregation pass — every sufficient statistic
    (n, T1..Tk, Σr, Σr²) is an integer sum computed map-side in the same
    partial agg; the fact table is never shuffled on a key. The only
    float op is the final division (NULLIF-guarded identically in both
    engines for the degenerate all-models-agree-everywhere corpus)."""
    s = _base(spark, sf_dir)
    r = " + ".join(_correct_expr(t) for t in _THETAS)
    a = s.agg(
        F.expr("count(*) AS n"),
        *[
            F.expr(f"CAST(sum({_correct_expr(t)}) AS BIGINT) AS t{i + 1}")
            for i, t in enumerate(_THETAS)
        ],
        F.expr(f"CAST(sum({r}) AS BIGINT) AS s1"),
        F.expr(f"CAST(sum(({r}) * ({r})) AS BIGINT) AS s2"),
    )
    return a.selectExpr(
        "n",
        "t1",
        "t2",
        "t3",
        "t4",
        f"round(CAST(({_K} - 1) * ({_K} * (t1*t1 + t2*t2 + t3*t3 + t4*t4)"
        f" - s1*s1) AS DOUBLE)"
        f" / CAST(nullif({_K} * s1 - s2, 0) AS DOUBLE), 6) AS q_stat",
    )


# --- Friedman rank test + Nemenyi critical difference -----------------------
_FOLDS = 6
# Studentized-range critical value q_{0.05} for k=4 models, infinite df
# (Demšar 2006, Table 5); CD = q * sqrt(k(k+1)/(6K)).
_NEMENYI_Q4 = 2.569

_MODELS_SQL = " UNION ALL ".join(
    f"SELECT {i + 1} AS model, CAST({t!r} AS DOUBLE) AS theta"
    for i, t in enumerate(_THETAS)
)


@query(
    "friedman_nemenyi_cv",
    oracle=f"""
    WITH s AS ({_BASE_SQL}),
    m AS ({_MODELS_SQL}),
    cell AS (
      SELECT CAST(s.id % {_FOLDS} AS BIGINT) AS fold, m.model,
             CAST(sum(CAST(CAST(s.prob >= m.theta AS INT) = s.label
                           AS BIGINT)) AS BIGINT) AS n_correct,
             count(*) AS n_rows
      FROM s CROSS JOIN m
      GROUP BY 1, 2
    ),
    acc AS (
      SELECT fold, model,
             CAST(n_correct AS DOUBLE) / CAST(n_rows AS DOUBLE) AS acc,
             n_correct
      FROM cell
    ),
    ranked AS (
      SELECT a.fold, a.model, a.n_correct,
             CAST(sum(CAST(b.acc > a.acc AS INT)) AS DOUBLE)
               + (CAST(sum(CAST(b.acc = a.acc AS INT)) AS DOUBLE) + 1.0) / 2.0
               AS r
      FROM acc a JOIN acc b ON a.fold = b.fold
      GROUP BY a.fold, a.model, a.n_correct
    ),
    per_model AS (
      SELECT model,
             CAST(sum(n_correct) AS BIGINT) AS n_correct,
             CAST(sum(CAST(r * 2 AS BIGINT)) AS BIGINT) AS rsum2
      FROM ranked GROUP BY model
    ),
    chi AS (
      SELECT round(12.0 / ({_FOLDS} * {_K} * ({_K} + 1))
                   * sum(CAST(rsum2 * rsum2 AS DOUBLE) / 4.0)
                   - 3.0 * {_FOLDS} * ({_K} + 1), 6) AS friedman_chi2
      FROM per_model
    )
    SELECT p.model, p.n_correct,
           CAST(p.rsum2 AS DOUBLE) / 2.0 / {_FOLDS} AS mean_rank,
           c.friedman_chi2,
           round({_NEMENYI_Q4} * sqrt({_K} * ({_K} + 1.0)
                                      / (6.0 * {_FOLDS})), 6) AS nemenyi_cd
    FROM per_model p CROSS JOIN chi c
    """,
)
def friedman_nemenyi_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test over a k={_K} models x K={_FOLDS} folds accuracy
    matrix, with the Nemenyi critical difference — THE recommended
    procedure (Demšar 2006) for the reference's model-zoo-over-folds
    comparison (`cross-validation/wine_analysis.py:98-151`). Folds are the
    deterministic id % K partition; per-fold model accuracy gets average
    ranks (ties share (cnt_lt + (cnt_eq+1)/2)), and
    χ²_F = 12/(Kk(k+1)) Σⱼ Rsumⱼ² − 3K(k+1).

    Scale shape: the fact table is aggregated ONCE into the k x K cell
    matrix (broadcast 4-row model dim, map-side combine on (fold, model));
    ranking and the chi-square run on the 24-row aggregate via a tiny
    self-join. Doubled rank sums (2r is always an integer) keep every
    accumulated quantity integral, so cross-engine doubles are
    bit-identical without decimal scaffolding."""
    s = _base(spark, sf_dir)
    m = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(_THETAS)], "model INT, theta DOUBLE"
    )
    cell = (
        s.crossJoin(F.broadcast(m))
        .groupBy((F.col("id") % _FOLDS).cast("bigint").alias("fold"), "model")
        .agg(
            F.expr(
                "CAST(sum(CAST(CAST(prob >= theta AS INT) = label AS BIGINT))"
                " AS BIGINT) AS n_correct"
            ),
            F.expr("count(*) AS n_rows"),
        )
    )
    acc = cell.select(
        "fold",
        "model",
        (F.col("n_correct").cast("double") / F.col("n_rows").cast("double")).alias(
            "acc"
        ),
        "n_correct",
    )
    a, b = acc.alias("a"), acc.alias("b")
    ranked = (
        a.join(F.broadcast(b), F.col("a.fold") == F.col("b.fold"))
        .groupBy(F.col("a.fold"), F.col("a.model"), F.col("a.n_correct"))
        .agg(
            (
                F.sum((F.col("b.acc") > F.col("a.acc")).cast("int")).cast("double")
                + (
                    F.sum((F.col("b.acc") == F.col("a.acc")).cast("int")).cast(
                        "double"
                    )
                    + 1.0
                )
                / 2.0
            ).alias("r")
        )
        .select(
            F.col("a.model").alias("model"),
            F.col("a.n_correct").alias("n_correct"),
            "r",
        )
    )
    per_model = ranked.groupBy("model").agg(
        F.expr("CAST(sum(n_correct) AS BIGINT) AS n_correct"),
        F.expr("CAST(sum(CAST(r * 2 AS BIGINT)) AS BIGINT) AS rsum2"),
    )
    chi = per_model.agg(
        F.expr(
            f"round(12.0D / ({_FOLDS} * {_K} * ({_K} + 1))"
            f" * sum(CAST(rsum2 * rsum2 AS DOUBLE) / 4.0D)"
            f" - 3.0D * {_FOLDS} * ({_K} + 1), 6) AS friedman_chi2"
        )
    )
    return per_model.crossJoin(F.broadcast(chi)).selectExpr(
        "model",
        "n_correct",
        f"CAST(rsum2 AS DOUBLE) / 2.0D / {_FOLDS} AS mean_rank",
        "friedman_chi2",
        f"round({_NEMENYI_Q4} * sqrt({_K} * ({_K} + 1.0D)"
        f" / (6.0D * {_FOLDS})), 6) AS nemenyi_cd",
    )


# --- Nadeau-Bengio corrected resampled t-test -------------------------------
_REPS = 10
_THETA_A, _THETA_B = 0.50, 0.45
# Per-repetition membership: a deterministic 20% test split keyed on
# (id, rep) — the same-hash-both-engines idiom used by the split family.
_TEST_PRED = "((id + 131 * rep) * 2654435761) % 5 = 0"


@query(
    "cv_corrected_ttest",
    oracle=f"""
    WITH s AS ({_BASE_SQL}),
    reps AS (SELECT unnest(generate_series(0, {_REPS - 1})) AS rep),
    r AS (
      SELECT rep,
             CAST(sum(CAST({_TEST_PRED} AS BIGINT)) AS BIGINT) AS n_test,
             CAST(sum(CAST(NOT ({_TEST_PRED}) AS BIGINT)) AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN {_TEST_PRED}
                           THEN {_correct_expr(_THETA_A)} ELSE 0 END)
                  AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN {_TEST_PRED}
                           THEN {_correct_expr(_THETA_B)} ELSE 0 END)
                  AS BIGINT) AS c_b
      FROM s CROSS JOIN reps
      GROUP BY rep
    ),
    d AS (
      SELECT rep, n_test, n_train,
             CAST(round(CAST(c_a - c_b AS DOUBLE) / CAST(n_test AS DOUBLE)
                        * 1000000000, 0) AS BIGINT) AS d9
      FROM r
    ),
    a AS (
      SELECT CAST(sum(d9) AS BIGINT) AS sd,
             CAST(sum(CAST(d9 AS DECIMAL(18,0))
                      * CAST(d9 AS DECIMAL(18,0))) AS DOUBLE) AS sdd,
             CAST(sum(n_test) AS BIGINT) AS st,
             CAST(sum(n_train) AS BIGINT) AS str
      FROM d
    )
    SELECT {_REPS} AS n_reps,
           round(CAST(sd AS DOUBLE) / 1e9 / {_REPS}, 9) AS mean_d,
           round((sdd / 1e18 - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                  / 1e18 / {_REPS}) / ({_REPS} - 1), 12) AS var_d,
           round(CAST(sd AS DOUBLE) / 1e9 / {_REPS}
                 / nullif(sqrt((1.0 / {_REPS}
                                + CAST(st AS DOUBLE) / CAST(str AS DOUBLE))
                               * ((sdd / 1e18
                                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                                     / 1e18 / {_REPS}) / ({_REPS} - 1))),
                        0), 6) AS t_corrected
    FROM a
    """,
)
def cv_corrected_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nadeau-Bengio corrected resampled t-test comparing two threshold
    models over J={_REPS} repeated deterministic 80/20 splits — the
    statistically sound replacement for a naive paired t-test on the
    reference's 40x StratifiedShuffleSplit scores
    (`cross-validation/wine_analysis.py:122-151`): repeated splits share
    training rows, so Var(d̄) is inflated by (1/J + n_test/n_train).

    Scale shape: the fact table crossJoins a broadcast {_REPS}-row
    repetition dim and aggregates ONCE on rep (map-side combine; at 100 TB
    this is {_REPS} logical passes fused into one shuffle-free scan).
    Per-rep accuracy deltas are quantized to 1e-9 and summed as integers
    (squares in DECIMAL(38,0)), so the J-row variance is order-independent
    and bit-identical across engines; the final t composes exact sums with
    deterministic IEEE ops, NULLIF-guarded for the zero-variance corpus."""
    s = _base(spark, sf_dir)
    reps = spark.range(_REPS).selectExpr("CAST(id AS BIGINT) AS rep")
    r = (
        s.crossJoin(F.broadcast(reps))
        .groupBy("rep")
        .agg(
            F.expr(f"CAST(sum(CAST({_TEST_PRED} AS BIGINT)) AS BIGINT) AS n_test"),
            F.expr(
                f"CAST(sum(CAST(NOT ({_TEST_PRED}) AS BIGINT)) AS BIGINT)"
                " AS n_train"
            ),
            F.expr(
                f"CAST(sum(CASE WHEN {_TEST_PRED}"
                f" THEN {_correct_expr(_THETA_A)} ELSE 0 END) AS BIGINT) AS c_a"
            ),
            F.expr(
                f"CAST(sum(CASE WHEN {_TEST_PRED}"
                f" THEN {_correct_expr(_THETA_B)} ELSE 0 END) AS BIGINT) AS c_b"
            ),
        )
    )
    d = r.selectExpr(
        "n_test",
        "n_train",
        "CAST(round(CAST(c_a - c_b AS DOUBLE) / CAST(n_test AS DOUBLE)"
        " * 1000000000, 0) AS BIGINT) AS d9",
    )
    a = d.agg(
        F.expr("CAST(sum(d9) AS BIGINT) AS sd"),
        F.expr(
            "CAST(sum(CAST(d9 AS DECIMAL(18,0)) * CAST(d9 AS DECIMAL(18,0)))"
            " AS DOUBLE) AS sdd"
        ),
        F.expr("CAST(sum(n_test) AS BIGINT) AS st"),
        F.expr("CAST(sum(n_train) AS BIGINT) AS str"),
    )
    return a.selectExpr(
        f"{_REPS} AS n_reps",
        f"round(CAST(sd AS DOUBLE) / 1e9 / {_REPS}, 9) AS mean_d",
        f"round((sdd / 1e18 - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)"
        f" / 1e18 / {_REPS}) / ({_REPS} - 1), 12) AS var_d",
        f"round(CAST(sd AS DOUBLE) / 1e9 / {_REPS}"
        f" / nullif(sqrt((1.0D / {_REPS}"
        f" + CAST(st AS DOUBLE) / CAST(str AS DOUBLE))"
        f" * ((sdd / 1e18 - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)"
        f" / 1e18 / {_REPS}) / ({_REPS} - 1))), 0), 6) AS t_corrected",
    )
