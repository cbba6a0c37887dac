"""SMOTE-equivalent oversampling (M5): balance ratios, determinism, and
interpolation geometry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.ml.smote import (
    class_counts,
    oversample_minority,
    smote_interpolated,
)


@pytest.fixture(scope="module")
def imbalanced(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    majority = [(float(x), float(y), 0) for x, y in rng.normal(0, 1, (400, 2))]
    minority = [(float(x), float(y), 1) for x, y in rng.normal(5, 1, (40, 2))]
    return spark.createDataFrame(majority + minority, ["x", "y", "is_fraud"])


def test_oversample_reaches_target_ratio(imbalanced):
    out = oversample_minority(imbalanced, "is_fraud", target_ratio=1.0, seed=42)
    counts = class_counts(out, "is_fraud")
    # sample() is Bernoulli per row, so the ratio is approximate
    assert counts[1] == pytest.approx(counts[0], rel=0.25)
    assert counts[0] == 400  # majority untouched


def test_oversample_deterministic(imbalanced):
    a = oversample_minority(imbalanced, seed=42).count()
    b = oversample_minority(imbalanced, seed=42).count()
    assert a == b


def test_oversample_noop_when_balanced(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 1)], ["x", "is_fraud"])
    assert oversample_minority(df, "is_fraud").count() == 2


def test_smote_interpolated_synthesizes_in_minority_region(imbalanced):
    out = smote_interpolated(
        imbalanced, ["x", "y"], "is_fraud", n_synthetic_per_row=2, seed=42
    )
    n_orig = imbalanced.count()
    n_out = out.count()
    assert n_out > n_orig  # synthetic rows added
    synth_stats = (
        out.filter(F.col("is_fraud") == 1)
        .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
        .collect()[0]
    )
    # interpolation is convex: synthetic minority points stay inside the
    # minority cluster's bounding box (centered at (5, 5))
    assert synth_stats[0] > 1.0 and synth_stats[2] > 1.0
    assert synth_stats[1] < 9.0 and synth_stats[3] < 9.0
    # label integrity: all added rows are minority-labeled
    counts = class_counts(out, "is_fraud")
    assert counts[0] == 400
    assert counts[1] > 40
