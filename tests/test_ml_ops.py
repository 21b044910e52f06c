"""operators/ml_ops.py: pipeline persistence (SURVEY §2.1 S8 — the binary
model sink, `best_model_pipeline.py:414-428` → MLWriter) and OOF stacking
shape guarantees."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from usw_big_data_analysis_spark.operators import ml_ops
from usw_big_data_analysis_spark.queries.mlmodels import _FEATURES, _task_frame


def test_pipeline_model_save_load_roundtrip(spark, sf_dir):
    base = _task_frame(spark, sf_dir)
    train = base.filter(~F.col("is_test"))
    pipe = ml_ops.preprocessing_pipeline(_FEATURES)
    fitted = pipe.fit(train)
    path = os.path.join(tempfile.gettempdir(), "usw_test_pipeline_model")
    fitted.write().overwrite().save(path)

    from pyspark.ml import PipelineModel

    back = PipelineModel.load(path)
    a = fitted.transform(train).select("features").limit(5).collect()
    b = back.transform(train).select("features").limit(5).collect()
    assert [r["features"] for r in a] == [r["features"] for r in b]


def test_stratified_fold_column_balance(spark, sf_dir):
    base = _task_frame(spark, sf_dir)
    tagged = ml_ops.stratified_fold_column(base, "label", k=5, order_cols=["row_id"])
    counts = (
        tagged.groupBy("label", "fold").count().groupBy("label")
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
        .collect()
    )
    for r in counts:
        assert r["mx"] - r["mn"] <= 1  # exact per-class balance


def test_stacking_oof_covers_every_row(spark, sf_dir):
    from pyspark.ml.classification import LogisticRegression

    base = (
        _task_frame(spark, sf_dir, keep_mod=40)
        .select("row_id", "label", *_FEATURES)
    )
    df = ml_ops.assemble(base, _FEATURES)
    models = {"lr": LogisticRegression(maxIter=10)}
    _, meta = ml_ops.stacking_oof(df, models, id_col="row_id", k=3)
    # every input row appears exactly once in the OOF meta-feature table
    assert meta.count() == base.count()
    assert meta.select("row_id").distinct().count() == base.count()


def test_zoo_has_multiclass_gbm_member():
    zoo = ml_ops.classifier_zoo()
    base = {
        "logistic_regression", "decision_tree", "random_forest", "gbt",
        "naive_bayes", "linear_svc", "fm", "mlp", "gbt_ovr",
    }
    assert base <= set(zoo)
    # gated boosters appear IFF their package imports (VERDICT r4 #3)
    extras = set(zoo) - base
    assert extras <= {"xgboost", "lightgbm", "catboost"}
    assert extras == set(ml_ops.optional_boosters())


def _has_module(name):
    import importlib.util

    return importlib.util.find_spec(name) is not None


@pytest.mark.skipif(
    not _has_module("xgboost"), reason="xgboost.spark not installed here"
)
def test_xgboost_binding_trains(spark, sf_dir):
    """Integration seam: when xgboost.spark is installed the zoo member
    must fit/transform like any estimator (never runs in this container)."""
    from usw_big_data_analysis_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    base = li.select(
        F.monotonically_increasing_id().alias("row_id"),
        (F.col("l_returnflag") == "A").cast("double").alias("label"),
        *_FEATURES,
    )
    df = ml_ops.assemble(base, _FEATURES)
    model = ml_ops.classifier_zoo()["xgboost"]
    _, pred = ml_ops.fit_predict(model, df, df)
    assert pred.count() == base.count()


@pytest.mark.skipif(
    not _has_module("synapse"), reason="synapse.ml not installed here"
)
def test_lightgbm_binding_trains(spark, sf_dir):
    from usw_big_data_analysis_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    base = li.select(
        F.monotonically_increasing_id().alias("row_id"),
        (F.col("l_returnflag") == "A").cast("double").alias("label"),
        *_FEATURES,
    )
    df = ml_ops.assemble(base, _FEATURES)
    model = ml_ops.classifier_zoo()["lightgbm"]
    _, pred = ml_ops.fit_predict(model, df, df)
    assert pred.count() == base.count()


def test_gbt_ovr_multiclass_deterministic(spark, sf_dir):
    # 3-class task (l_returnflag A/N/R) — GBTClassifier alone is binary-only;
    # the OneVsRest wrapper is the zoo's multiclass GBM shape.
    from usw_big_data_analysis_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    base = li.select(
        F.monotonically_increasing_id().alias("row_id"),
        (
            F.when(F.col("l_returnflag") == "A", 0.0)
            .when(F.col("l_returnflag") == "N", 1.0)
            .otherwise(2.0)
        ).alias("label"),
        *_FEATURES,
    )
    df = ml_ops.assemble(base, _FEATURES)
    preds = []
    for _ in range(2):
        model = ml_ops.classifier_zoo()["gbt_ovr"]
        _, pred = ml_ops.fit_predict(model, df, df)
        preds.append(
            sorted(
                (r["row_id"], r["prediction"])
                for r in pred.select("row_id", "prediction").collect()
            )
        )
    assert preds[0] == preds[1]
    classes = {p for _, p in preds[0]}
    assert classes <= {0.0, 1.0, 2.0} and len(classes) >= 2


@pytest.mark.skipif(
    not _has_module("catboost_spark"),
    reason="catboost-spark not installed here",
)
def test_catboost_binding_trains(spark, sf_dir):
    """Integration seam (VERDICT r5 #4): when catboost-spark is installed
    the zoo member must fit/transform like any estimator — catboost_spark
    follows spark.ml camelCase conventions, so fit_predict's setLabelCol
    path applies (never runs in this container)."""
    from usw_big_data_analysis_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    base = li.select(
        F.monotonically_increasing_id().alias("row_id"),
        (F.col("l_returnflag") == "A").cast("double").alias("label"),
        *_FEATURES,
    )
    df = ml_ops.assemble(base, _FEATURES)
    model = ml_ops.classifier_zoo()["catboost"]
    _, pred = ml_ops.fit_predict(model, df, df)
    assert pred.count() == base.count()
