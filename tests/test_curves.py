"""ROC-AUC / PR-curve operators vs straight numpy reimplementations
(the reference used sklearn — FD/model.py:140, FD/evaluation.py:91-95;
sklearn is not in this container, so the expectation is computed from the
same published formulas)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
    pr_curve_best_threshold,
    roc_auc,
)


def np_roc_auc(y: np.ndarray, p: np.ndarray) -> float:
    """Mann-Whitney with average ranks for ties == sklearn roc_auc_score."""
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty(len(p), dtype=float)
    sp = p[order]
    i = 0
    while i < len(sp):
        j = i
        while j + 1 < len(sp) and sp[j + 1] == sp[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    npos = y.sum()
    nneg = len(y) - npos
    return float((ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg))


@pytest.mark.parametrize("seed", [0, 7])
def test_roc_auc_matches_numpy(spark, seed):
    rng = np.random.default_rng(seed)
    n = 500
    y = (rng.random(n) < 0.3).astype(int)
    # correlated score with heavy ties (2-decimal quantization)
    p = np.round(np.clip(0.3 * y + rng.random(n) * 0.7, 0, 1), 2)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, p)], ["y", "p"]
    )
    got = roc_auc(df, F.col("y"), F.col("p")).collect()[0]["roc_auc"]
    assert got == pytest.approx(np_roc_auc(y, p), abs=1e-6)


def test_roc_auc_perfect_and_random(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], ["y", "p"]
    )
    assert roc_auc(df, F.col("y"), F.col("p")).collect()[0]["roc_auc"] == 1.0
    df2 = spark.createDataFrame([(1, 0.5), (0, 0.5)], ["y", "p"])
    assert roc_auc(df2, F.col("y"), F.col("p")).collect()[0]["roc_auc"] == 0.5


def test_pr_curve_best_threshold_matches_numpy(spark):
    rng = np.random.default_rng(3)
    n = 400
    y = (rng.random(n) < 0.25).astype(int)
    p = np.round(np.clip(0.4 * y + rng.random(n) * 0.6, 0, 1), 2)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, p)], ["y", "p"]
    )
    got = pr_curve_best_threshold(df, F.col("y"), F.col("p")).collect()[0]

    # numpy reference: one candidate threshold per distinct score desc,
    # cumulative tp / predicted-positives, F1-argmax (ties -> higher thr)
    uniq = np.unique(p)[::-1]
    npos = y.sum()
    best = None
    for t in uniq:
        mask = p >= t
        tp = int(y[mask].sum())
        prec = tp / mask.sum()
        rec = tp / npos
        f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
        if best is None or f1 > best[1] + 1e-12:
            best = (t, f1, prec, rec)
    assert got["threshold"] == pytest.approx(best[0], abs=1e-9)
    assert got["f1"] == pytest.approx(best[1], abs=1e-6)
    assert got["precision"] == pytest.approx(best[2], abs=1e-6)
    assert got["recall"] == pytest.approx(best[3], abs=1e-6)


def test_calibration_from_bins_matches_batch_curve(spark):
    """The streaming-state reader must agree with the batch
    calibration_curve query on both bucket populations and observed
    positive rates (decile edges are bit-identical by the nested-floor
    identity)."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_metrics import (
        calibration_curve,
        scored_events,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.streaming.pipeline import (
        binned_score_counts,
        calibration_from_bins,
    )

    sf = "/root/testdata/sf0.001"
    batch = {
        r["bin"]: (r["n"], r["frac_actual"])
        for r in calibration_curve(spark, sf).collect()
    }
    s = scored_events(spark, sf)
    bins = binned_score_counts(s, n_bins=1000, proba_col="score",
                               label_col="actual")
    stream_state = {
        r["bin"]: (r["n"], r["frac_actual"])
        for r in calibration_from_bins(bins, n_bins=1000).collect()
    }
    assert stream_state == batch


def test_psi_from_bins_matches_batch_psi(spark):
    """Splitting the scored corpus at the same event-id midpoint the batch
    query uses and feeding the two halves' binned states to psi_from_bins
    must reproduce psi_score_drift's value."""
    from pyspark.sql import functions as F

    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_metrics import (
        psi_score_drift,
        scored_events,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.streaming.pipeline import (
        binned_score_counts,
        psi_from_bins,
    )

    sf = "/root/testdata/sf0.001"
    want = psi_score_drift(spark, sf).first()["psi"]

    s = scored_events(spark, sf)
    mid = s.agg(
        F.try_divide(F.min("event_id") + F.max("event_id"), F.lit(2))
        .cast("long")
        .alias("m")
    ).first()["m"]
    # 10 deciles directly: n_bins=10 exercises the coarsen-to-identity path
    ref = binned_score_counts(
        s.filter(F.col("event_id") < mid), n_bins=10,
        proba_col="score", label_col="actual",
    )
    cur = binned_score_counts(
        s.filter(F.col("event_id") >= mid), n_bins=10,
        proba_col="score", label_col="actual",
    )
    got = psi_from_bins(ref, cur, n_bins=10, deciles=10).first()["psi"]
    assert got == want


def test_psi_identical_populations_is_zero(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_metrics import (
        scored_events,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.streaming.pipeline import (
        binned_score_counts,
        psi_from_bins,
    )

    s = scored_events(spark, "/root/testdata/sf0.001")
    bins = binned_score_counts(s, n_bins=1000, proba_col="score",
                               label_col="actual")
    assert psi_from_bins(bins, bins).first()["psi"] == 0.0


def test_dashboard_snapshot_reconciles(spark, sf_dir):
    """One-query dashboard: counters sum to total, rates live in [0,1],
    and the metric set is exactly the reference panel's."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES

    rows = {r["metric"]: r["value"]
            for r in QUERIES["dashboard_snapshot"].fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "total_transactions", "fraud_count", "non_fraud_count",
        "actual_fraud_count", "avg_probability", "fraud_avg_amount",
        "accuracy", "precision", "recall", "f1",
    }
    assert rows["fraud_count"] + rows["non_fraud_count"] == rows["total_transactions"]
    for m in ("accuracy", "precision", "recall", "f1", "avg_probability"):
        assert 0.0 <= rows[m] <= 1.0, m
    assert rows["fraud_avg_amount"] > 0


def test_categorical_drift_flags_planted_new_and_dropped(spark, tmp_path):
    """A category present only in the current half must flag 'new', one
    present only in the reference half 'dropped' — the reference's
    69-skipped-transactions failure class (FD/consumer_error.log),
    surfaced BEFORE scoring."""
    from pyspark.sql import functions as F

    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_metrics import (
        categorical_drift_audit,
    )

    rows = (
        [(i, "legacy") for i in range(0, 40)]          # ref-only
        + [(i, "stable") for i in range(0, 200)]
        + [(i, "Macbook") for i in range(160, 200)]    # cur-only
    )
    (
        spark.createDataFrame(rows, "event_id long, event_type string")
        .select(
            "event_id",
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/events.parquet")
    )
    got = {
        r.category: (r.status, r.n_ref, r.n_cur)
        for r in categorical_drift_audit(spark, str(tmp_path)).collect()
    }
    assert got["Macbook"][0] == "new" and got["Macbook"][1] == 0
    assert got["legacy"][0] == "dropped" and got["legacy"][2] == 0
    assert got["stable"][0] == "stable"
    # psi terms are finite and non-negative even on the empty cells
    for r in categorical_drift_audit(spark, str(tmp_path)).collect():
        assert r.psi_term is not None and r.psi_term >= 0.0
