"""Incremental materialized-view maintenance (operators/matview.py):
incremental == full recompute, replay safety, time travel, derived
measures, non-mergeable rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.matview import (
    IncrementalAggView,
)
from real___time_fraud_detection_using_apache_kafka_spark.sources.txn_table import (
    TxnTable,
)

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture()
def view(tmp_path):
    return IncrementalAggView(TxnTable(str(tmp_path / "mv")), ["k"], MEASURES)


def delta(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def full_recompute(spark, all_rows):
    return (
        delta(spark, all_rows)
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


def as_map(df):
    return {r["k"]: (r["n"], r["total"], r["lo"], r["hi"]) for r in df.collect()}


def test_incremental_equals_full_recompute(spark, view):
    d1 = [("a", 1), ("a", 3), ("b", 10)]
    d2 = [("a", 5), ("c", 7)]
    d3 = [("b", -2), ("c", 0), ("c", 100)]
    view.refresh(spark, delta(spark, d1))
    view.refresh(spark, delta(spark, d2))
    view.refresh(spark, delta(spark, d3))
    assert as_map(view.read(spark)) == as_map(
        full_recompute(spark, d1 + d2 + d3)
    )


def test_replayed_batch_is_skipped(spark, view):
    d1 = [("a", 1)]
    view.refresh(spark, delta(spark, d1), app_id="job", batch_id=0)
    v = view.refresh(spark, delta(spark, d1), app_id="job", batch_id=0)  # replay
    assert as_map(view.read(spark))["a"] == (1, 1, 1, 1)  # not double-counted
    # and the no-op returned the current version without a new commit
    assert view.table.versions()[-1] == v


def test_time_travel_reads_old_view_states(spark, view):
    view.refresh(spark, delta(spark, [("a", 1)]))
    view.refresh(spark, delta(spark, [("a", 2)]))
    assert as_map(view.read(spark, version=0))["a"] == (1, 1, 1, 1)
    assert as_map(view.read(spark))["a"] == (2, 3, 1, 2)


def test_derived_ratio_measures_at_read_time(spark, view):
    view.refresh(spark, delta(spark, [("a", 2), ("a", 4)]))
    out = view.read(spark, derived={"mean_v": ("total", "n")}).collect()
    assert out[0]["mean_v"] == 3.0


def test_non_mergeable_aggregate_rejected(tmp_path):
    with pytest.raises(ValueError, match="sketch"):
        IncrementalAggView(
            TxnTable(str(tmp_path / "bad")), ["k"],
            {"d": ("count_distinct", "v")},
        )


def test_new_keys_insert_and_old_keys_persist(spark, view):
    view.refresh(spark, delta(spark, [("a", 1)]))
    view.refresh(spark, delta(spark, [("b", 9)]))
    m = as_map(view.read(spark))
    assert m["a"] == (1, 1, 1, 1) and m["b"] == (1, 9, 9, 9)
