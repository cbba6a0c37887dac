"""MLlib pipeline (M1-M12): train/score end-to-end on the synthetic
generator, single-pipeline train/serve consistency (kills reference bug
SURVEY.md §2.11-1), metric parity between evaluator and expression paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.ml.pipeline import (
    feature_importances,
    score,
    train,
    with_class_weights,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.aggregates import (
    confusion_cells,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import roc_auc
from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import (
    batch_transactions,
)


@pytest.fixture(scope="module")
def trained(spark):
    txns = batch_transactions(spark, 2000)
    model, train_df, test_df = train(txns, classifier="lr")
    return model, train_df, test_df


def test_class_weights_balanced(spark):
    txns = batch_transactions(spark, 400)
    w = with_class_weights(txns.withColumn("is_fraud", (F.col("amount") > 3000).cast("int")))
    agg = w.groupBy("is_fraud").agg(
        F.round(F.sum("class_weight"), 4).alias("total_w")
    ).collect()
    totals = [r["total_w"] for r in agg]
    # balanced weights equalize total weight per class: n/k each
    assert totals[0] == pytest.approx(totals[1], rel=1e-6)


def test_train_score_schema_and_range(spark, trained):
    model, _, test_df = trained
    scored = score(model, test_df.drop("class_weight"))
    rows = scored.select("prediction", "probability_fraud").collect()
    assert all(r["prediction"] in (0.0, 1.0) for r in rows)
    assert all(0.0 <= r["probability_fraud"] <= 1.0 for r in rows)


def test_model_beats_chance_on_separable_signal(spark, trained):
    """Fraud rows skew to high amounts + LOC99 (FD/producer.py:81-93), so a
    trained model must beat AUC 0.5 on held-out data."""
    model, _, test_df = trained
    scored = score(model, test_df.drop("class_weight"))
    auc = roc_auc(
        scored, F.col("is_fraud"), F.col("probability_fraud")
    ).collect()[0]["roc_auc"]
    assert auc > 0.55


def test_single_pipeline_serve_consistency(spark, trained):
    """§2.11-1 regression: scoring the same rows twice through the fitted
    pipeline gives identical predictions (no per-record refitting)."""
    model, _, test_df = trained
    sample = test_df.drop("class_weight").limit(50)
    a = score(model, sample).select("transaction_id", "prediction").collect()
    b = score(model, sample).select("transaction_id", "prediction").collect()
    assert sorted(a) == sorted(b)


def test_feature_importances_topk(spark, trained):
    model, _, _ = trained
    pairs = feature_importances(model, top_k=5)
    assert len(pairs) == 5
    assert all(imp >= 0 for _, imp in pairs)
    # sorted descending
    imps = [imp for _, imp in pairs]
    assert imps == sorted(imps, reverse=True)


def test_confusion_cells_sum_to_total(spark, trained):
    model, _, test_df = trained
    scored = score(model, test_df.drop("class_weight"))
    c = confusion_cells(scored, F.col("is_fraud"), F.col("prediction")).collect()[0]
    assert c["tp"] + c["fp"] + c["fn"] + c["tn"] == scored.count()


def test_metric_battery_agrees_with_mllib_evaluators(spark, trained):
    """SURVEY §5.5: the expression-based metric battery and MLlib's
    evaluators must compute the same numbers on the same predictions —
    the two implementations cross-check each other."""
    from pyspark.ml.evaluation import (
        BinaryClassificationEvaluator,
        MulticlassClassificationEvaluator,
    )

    from real___time_fraud_detection_using_apache_kafka_spark.operators.aggregates import (
        classification_metrics,
    )

    model, _train_df, test_df = trained
    scored = score(model, test_df)

    ours = classification_metrics(
        confusion_cells(
            scored, F.col("is_fraud"), F.col("prediction").cast("int")
        )
    ).first()
    acc_eval = MulticlassClassificationEvaluator(
        labelCol="is_fraud", predictionCol="prediction", metricName="accuracy"
    ).evaluate(scored)
    f1_eval = MulticlassClassificationEvaluator(
        labelCol="is_fraud", predictionCol="prediction", metricName="f1"
    ).evaluate(scored)
    assert abs(ours["accuracy"] - acc_eval) < 1e-5
    # our f1 is the positive-class f1; MLlib's default is weighted — they
    # only coincide when classes are balanced, so compare positive-class
    # f1 via (beta=1, label=1) metric instead
    f1_pos = MulticlassClassificationEvaluator(
        labelCol="is_fraud", predictionCol="prediction",
        metricName="fMeasureByLabel", metricLabel=1.0,
    ).evaluate(scored)
    assert abs(ours["f1"] - f1_pos) < 1e-5
    assert f1_eval > 0  # weighted f1 computes without error

    auc_eval = BinaryClassificationEvaluator(
        labelCol="is_fraud", rawPredictionCol="probability",
        metricName="areaUnderROC",
    ).evaluate(scored)
    ours_auc = roc_auc(
        scored, F.col("is_fraud"), F.col("probability_fraud")
    ).first()["roc_auc"]
    assert abs(ours_auc - auc_eval) < 1e-3


def test_tune_returns_best_model_and_grid_metrics(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.ml.pipeline import score, tune
    from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import (
        batch_transactions,
    )

    txns = batch_transactions(spark, 600, seed=11)
    best, metrics = tune(txns, classifier="lr", parallelism=2)
    assert len(metrics) == 6  # 3 regParam x 2 elasticNetParam
    for params, auc in metrics:
        assert set(params) <= {"regParam", "elasticNetParam"}
        assert 0.0 <= auc <= 1.0
    scored = score(best, txns)
    assert {"prediction", "probability_fraud"} <= set(scored.columns)
    assert scored.count() == 600
