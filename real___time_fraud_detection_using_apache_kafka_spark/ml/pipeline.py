"""MLlib train/score pipeline (SURVEY.md §2.9 M1-M12).

One fitted ``Pipeline`` serves both training and streaming inference,
which structurally eliminates the reference's deploy bug (§2.11-1: a
fresh ``LabelEncoder`` fit per record made every categorical feature a
constant 0 at serve time — FD/consumer.py:64-66).

Stage map (reference -> MLlib):
  M1 LabelEncoder x7        -> StringIndexer x7 (handleInvalid='keep')
  M3 missing-feature 0-fill -> Imputer-free: schema-enforced select + coalesce
  M4 StandardScaler         -> StandardScaler(withMean=True, withStd=True)
  M6 80/20 split seed 42    -> randomSplit([0.8, 0.2], seed=42)
  M7 LogisticRegression     -> LogisticRegression(weightCol='class_weight')
  M8 RandomForest           -> RandomForestClassifier(weightCol=...)
  M9 XGBoost                -> GBTClassifier (same family; xgboost4j is
                               out of pure-PySpark scope, parity is
                               metric-ballpark per SURVEY.md §7)
  M10 predict/proba         -> PipelineModel.transform -> prediction,
                               vector_to_array(probability)[1]
  M11 feature importances   -> model.featureImportances -> top-k DataFrame
  M5 SMOTE                  -> ml.smote (oversample / interpolated)
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CATEGORICAL_FEATURES, NUMERIC_FEATURES


def with_class_weights(df: DataFrame, label_col: str = "is_fraud",
                       weight_col: str = "class_weight") -> DataFrame:
    """sklearn's ``class_weight='balanced'`` (M7, FD/model.py:117):
    w_c = n / (k * n_c), computed distributed and joined back broadcast."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("n_c"))
    stats = counts.agg(
        F.sum("n_c").alias("n"), F.count("*").alias("k")
    ).crossJoin(counts)
    weights = stats.select(
        label_col, (F.col("n") / (F.col("k") * F.col("n_c"))).alias(weight_col)
    )
    return df.join(F.broadcast(weights), label_col)


def build_pipeline(classifier: str = "gbt", label_col: str = "is_fraud",
                   weight_col: str | None = "class_weight") -> Pipeline:
    """The single train+serve pipeline (M1+M3+M4+classifier)."""
    stages = []
    indexed = []
    for c in CATEGORICAL_FEATURES:
        out = f"{c}_idx"
        stages.append(
            StringIndexer(inputCol=c, outputCol=out, handleInvalid="keep")
        )
        indexed.append(out)
    stages.append(
        VectorAssembler(
            inputCols=NUMERIC_FEATURES + indexed,
            outputCol="features_raw",
            handleInvalid="keep",
        )
    )
    stages.append(
        StandardScaler(
            inputCol="features_raw", outputCol="features",
            withMean=True, withStd=True,
        )
    )
    kwargs = {"featuresCol": "features", "labelCol": label_col}
    if weight_col:
        kwargs["weightCol"] = weight_col
    if classifier == "lr":
        clf = LogisticRegression(maxIter=50, **kwargs)
    elif classifier == "rf":
        clf = RandomForestClassifier(numTrees=50, seed=42, **kwargs)
    elif classifier == "gbt":
        clf = GBTClassifier(maxIter=30, seed=42, **kwargs)
    else:
        raise ValueError(f"unknown classifier: {classifier}")
    stages.append(clf)
    return Pipeline(stages=stages)


def featurize(txns: DataFrame) -> DataFrame:
    """M3 + F3/F4: derive the 6 time features and 0-default any missing
    numeric (the schema-enforced replacement for FD/model.py:70-72)."""
    ts = F.timestamp_seconds(F.col("time"))
    out = txns
    for name, expr in [
        ("year", F.year(ts)), ("month", F.month(ts)), ("day", F.dayofmonth(ts)),
        ("hour", F.hour(ts)), ("minute", F.minute(ts)), ("second", F.second(ts)),
    ]:
        out = out.withColumn(name, expr)
    for c in NUMERIC_FEATURES:
        out = out.withColumn(
            c, F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        )
    return out


def train(txns: DataFrame, classifier: str = "gbt",
          label_col: str = "is_fraud", seed: int = 42
          ) -> tuple[PipelineModel, DataFrame, DataFrame]:
    """M6 + fit: returns (model, train_df, test_df)."""
    feats = featurize(txns)
    weighted = with_class_weights(feats, label_col)
    train_df, test_df = weighted.randomSplit([0.8, 0.2], seed=seed)
    model = build_pipeline(classifier, label_col).fit(train_df)
    return model, train_df, test_df


def score(model: PipelineModel, txns: DataFrame) -> DataFrame:
    """M10 (FD/consumer.py:124-125): vectorized transform; probability of
    the positive class as a plain double column."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featurize(txns))
    return scored.withColumn(
        "probability_fraud", vector_to_array("probability")[1]
    )


def feature_importances(model: PipelineModel, top_k: int = 10) -> list[tuple[str, float]]:
    """M11 (FD/model.py:180-183): name-aligned importances, top-k."""
    clf = model.stages[-1]
    names = NUMERIC_FEATURES + [f"{c}_idx" for c in CATEGORICAL_FEATURES]
    if hasattr(clf, "featureImportances"):
        imps = clf.featureImportances.toArray().tolist()
    else:  # LogisticRegression: |coefficient| as importance proxy
        imps = [abs(x) for x in clf.coefficients.toArray().tolist()]
    pairs = sorted(zip(names, imps), key=lambda p: (-p[1], p[0]))
    return pairs[:top_k]


def tune(txns: DataFrame, classifier: str = "lr",
         label_col: str = "is_fraud", seed: int = 42,
         parallelism: int = 4):
    """Hyperparameter search (extension beyond the reference's fixed
    settings, FD/model.py:116-119): TrainValidationSplit over a small
    per-classifier grid, scored by ROC AUC — the distributed analog of a
    sklearn GridSearchCV pass.

    TrainValidationSplit (one split, not k-fold) keeps the cost at
    |grid| x 1 fits; candidate fits run ``parallelism`` at a time.  At
    cluster scale each fit is itself distributed, so the grid is walked
    with bounded concurrent memory, and the winning model is refit on the
    full training side automatically.

    Returns (best_model: PipelineModel, validation_metrics: list of
    (param_map, auc)).
    """
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit

    pipeline = build_pipeline(classifier, label_col)
    clf = pipeline.getStages()[-1]
    gb = ParamGridBuilder()
    if classifier == "lr":
        gb = gb.addGrid(clf.regParam, [0.0, 0.01, 0.1])
        gb = gb.addGrid(clf.elasticNetParam, [0.0, 0.5])
    elif classifier == "rf":
        gb = gb.addGrid(clf.maxDepth, [4, 6])
        gb = gb.addGrid(clf.numTrees, [20, 50])
    else:  # gbt
        gb = gb.addGrid(clf.maxDepth, [3, 5])
    grid = gb.build()
    evaluator = BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    )
    tvs = TrainValidationSplit(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        trainRatio=0.75,
        parallelism=parallelism,
        seed=seed,
    )
    feats = with_class_weights(featurize(txns), label_col)
    model = tvs.fit(feats)
    metrics = list(zip(
        [
            {p.name: v for p, v in pm.items()}
            for pm in model.getEstimatorParamMaps()
        ],
        model.validationMetrics,
    ))
    return model.bestModel, metrics
