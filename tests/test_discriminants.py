"""LDA / QDA sampled discriminants (VERDICT r5 #5): the driver-side fit is
closed-form, so the golden is a from-scratch numpy implementation of the
same textbook formulas — the Spark-expression scoring must agree with it
prediction-for-prediction, and the confusion output must be run-to-run
deterministic under any partitioning."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.queries.mlmodels import (
    _FEATURES,
    _QDA_REG,
    _delta_expr,
    _discriminant_frame,
    _fit_discriminants,
    lda_sampled,
    qda_sampled,
)


def _numpy_predict(X: np.ndarray, fitted: list[dict]) -> np.ndarray:
    """Hand QDA/LDA scorer: argmax_k log π_k − ½log|Σ_k| − ½(x−μ)'P(x−μ)."""
    deltas = []
    for p in fitted:
        diff = X - p["mu"]
        quad = np.einsum("ni,ij,nj->n", diff, p["prec"], diff)
        deltas.append(math.log(p["prior"]) - 0.5 * p["logdet"] - 0.5 * quad)
    return (deltas[1] > deltas[0]).astype(int)


@pytest.mark.parametrize("shared_cov", [True, False])
def test_spark_scoring_matches_hand_numpy(spark, sf_dir, shared_cov):
    base = _discriminant_frame(spark, sf_dir)
    fitted = _fit_discriminants(base, shared_cov)
    scored = base.select(
        "label",
        *_FEATURES,
        (_delta_expr(fitted[1]) > _delta_expr(fitted[0]))
        .cast("int")
        .alias("pred"),
    ).toPandas()
    X = scored[_FEATURES].to_numpy(dtype=np.float64)
    expect = _numpy_predict(X, fitted)
    # double arithmetic differs in association between the unrolled
    # Catalyst expression and einsum — compare decisions, allowing only
    # genuinely boundary-ambiguous rows (|δ1-δ0| below float noise) to
    # differ; on this data none are.
    assert (scored["pred"].to_numpy() == expect).all()


def test_lda_discriminant_is_linear(spark, sf_dir):
    """Shared covariance ⇒ the quadratic terms cancel: δ1−δ0 must equal the
    closed-form linear rule w·x + b with w = P(μ1−μ0)."""
    base = _discriminant_frame(spark, sf_dir)
    f0, f1 = _fit_discriminants(base, shared_cov=True)
    P = f0["prec"]  # same matrix for both classes
    w = P @ (f1["mu"] - f0["mu"])
    b = (
        math.log(f1["prior"])
        - math.log(f0["prior"])
        - 0.5 * (f1["mu"] @ P @ f1["mu"] - f0["mu"] @ P @ f0["mu"])
    )
    rows = base.limit(50).toPandas()
    X = rows[_FEATURES].to_numpy(dtype=np.float64)
    lin = X @ w + b
    d0 = np.array(
        [
            math.log(f0["prior"])
            - 0.5 * f0["logdet"]
            - 0.5 * ((x - f0["mu"]) @ P @ (x - f0["mu"]))
            for x in X
        ]
    )
    d1 = np.array(
        [
            math.log(f1["prior"])
            - 0.5 * f1["logdet"]
            - 0.5 * ((x - f1["mu"]) @ P @ (x - f1["mu"]))
            for x in X
        ]
    )
    assert np.allclose(d1 - d0, lin, rtol=1e-9, atol=1e-9)


def test_confusion_deterministic_and_complete(spark, sf_dir):
    for fn in (lda_sampled, qda_sampled):
        a = fn(spark, sf_dir).collect()
        b = fn(spark, sf_dir).collect()
        assert a == b  # bit-identical across runs
        total = sum(r["n"] for r in a)
        assert total == _discriminant_frame(spark, sf_dir).count()
        assert {(r["label"], r["pred"]) for r in a} <= {
            (i, j) for i in (0, 1) for j in (0, 1)
        }


def test_qda_separates_synthetic_gaussians(spark):
    """Sanity: on two well-separated Gaussians with different covariances
    the fitted QDA rule must recover the clusters (>95% accuracy)."""
    rng = np.random.RandomState(7)
    n = 400
    X0 = rng.randn(n, 4) * 0.5 + np.array([0.0, 0.0, 0.0, 0.0])
    X1 = rng.randn(n, 4) * 1.5 + np.array([4.0, 4.0, 4.0, 4.0])
    rows = []
    for i in range(n):
        rows.append((10 * i, 1, 0, *[float(v) for v in X0[i]]))
        rows.append((10 * i, 2, 1, *[float(v) for v in X1[i]]))
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_linenumber int, label int, "
        + ", ".join(f"{f} double" for f in _FEATURES),
    )
    fitted = _fit_discriminants(df, shared_cov=False)
    assert abs(fitted[0]["prior"] + fitted[1]["prior"] - 1.0) < 1e-12
    acc_row = (
        df.select(
            (
                (_delta_expr(fitted[1]) > _delta_expr(fitted[0])).cast("int")
                == F.col("label")
            )
            .cast("int")
            .alias("ok")
        )
        .agg((F.sum("ok") / F.count("*")).alias("acc"))
        .first()
    )
    assert acc_row["acc"] > 0.95
    # the regularizer is the sklearn form: (1-r)·Σ + r·I
    assert _QDA_REG < 1e-3
