"""Unit tests for relational / aggregation / window operators over small
in-memory frames with hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.aggregates import (
    classification_metrics,
    confusion_cells,
    deterministic_mode,
    log_loss,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import exact_dedup
from real___time_fraud_detection_using_apache_kafka_spark.operators.relational import (
    anti_join,
    semi_join,
    with_default,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
    latest_per_group,
    topk,
    topk_per_group,
)


def test_exact_dedup_removes_dups_and_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (2, "b"), (3, "c")], ["k", "v"]
    )
    once = exact_dedup(df)
    assert once.count() == 3
    assert exact_dedup(once).count() == 3  # D1 idempotence (SURVEY.md §5.3)


def test_exact_dedup_subset(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    assert exact_dedup(df, subset=["k"]).count() == 2


def test_deterministic_mode_breaks_ties_to_smaller_value(spark):
    # group g: 'a' x2, 'b' x2 -> tie -> 'a'  |  group h: 'z' x2, 'y' x1 -> 'z'
    rows = [("g", "b"), ("g", "a"), ("g", "a"), ("g", "b"),
            ("h", "z"), ("h", "y"), ("h", "z")]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r["m"] for r in deterministic_mode(df, ["g"], "v", "m").collect()}
    assert got == {"g": "a", "h": "z"}


def test_confusion_cells_and_metrics(spark):
    # 10 rows: tp=3 fp=2 fn=1 tn=4 (hand-checkable battery, A8-A12)
    rows = [(1, 1)] * 3 + [(0, 1)] * 2 + [(1, 0)] * 1 + [(0, 0)] * 4
    df = spark.createDataFrame(rows, ["y", "p"])
    cells = confusion_cells(df, F.col("y"), F.col("p"))
    c = cells.collect()[0]
    assert (c["tp"], c["fp"], c["fn"], c["tn"]) == (3, 2, 1, 4)
    m = classification_metrics(cells).collect()[0]
    assert m["accuracy"] == round(7 / 10, 6)
    assert m["precision"] == round(3 / 5, 6)
    assert m["recall"] == round(3 / 4, 6)
    assert m["f1"] == round(2 * 0.6 * 0.75 / (0.6 + 0.75), 6)
    assert m["specificity"] == round(4 / 6, 6)
    assert m["fpr"] == round(2 / 6, 6)
    assert m["fnr"] == round(1 / 4, 6)
    import math

    mcc = (3 * 4 - 2 * 1) / math.sqrt(5 * 4 * 6 * 5)
    assert m["mcc"] == round(mcc, 6)


def test_log_loss_matches_numpy(spark):
    import numpy as np

    y = np.array([1, 0, 1, 1, 0])
    p = np.array([0.9, 0.2, 0.6, 0.51, 0.05])
    eps = 1e-7
    pc = np.clip(p, eps, 1 - eps)
    expected = float(np.mean(-(y * np.log(pc) + (1 - y) * np.log1p(-pc))))
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, p)], ["y", "p"]
    )
    got = log_loss(df, F.col("y"), F.col("p")).collect()[0]["log_loss"]
    assert got == round(expected, 6)


def test_topk_global_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("a", 9), ("b", 7), ("b", 1)], ["g", "v"]
    )
    top2 = topk(df, [F.desc("v")], 2).collect()
    assert [r["v"] for r in top2] == [9, 7]
    per = topk_per_group(df, ["g"], [F.desc("v")], 1)
    got = {r["g"]: r["v"] for r in per.collect()}
    assert got == {"a": 9, "b": 7}
    latest = latest_per_group(df, ["g"], [F.desc("v")])
    assert "rnk" not in latest.columns
    assert latest.count() == 2


def test_semi_anti_join_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    s = semi_join(left, right, left["k"] == right["k"])
    a = anti_join(left, right, left["k"] == right["k"])
    assert sorted(r["k"] for r in s.collect()) == [2, 3]
    assert sorted(r["k"] for r in a.collect()) == [1]
    # semi + anti partition the left side exactly
    assert s.count() + a.count() == left.count()


def test_with_default_coalesce(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], ["k", "v"])
    out = df.select(with_default(F.col("v"), 0.0).alias("v")).collect()
    assert sorted(r["v"] for r in out) == [0.0, 5.0]

def test_salted_skew_join_matches_plain_join(spark):
    """Salting redistributes hot keys without changing join results."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.relational import (
        salted_skew_join,
    )

    # one pathologically hot key (80% of rows) + a long tail
    left = spark.range(1000).select(
        F.when(F.col("id") < 800, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (900, "cold"), (999, "cold2"), (12345, "nomatch")],
        ["k", "rv"],
    )
    plain = left.join(right, ["k"], "inner")
    salted = salted_skew_join(left, right, ["k"], salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    l_plain = left.join(right, ["k"], "left")
    l_salted = salted_skew_join(left, right, ["k"], salt=4, how="left")
    assert sorted(map(tuple, l_plain.collect())) == sorted(map(tuple, l_salted.collect()))


def test_merge_latest_upsert_insert_delete(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.operators.relational import merge_latest

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k long, v string, ver int"
    )
    upd = spark.createDataFrame(
        [
            (2, "b2", 2, False),   # update
            (4, "d", 2, False),    # insert
            (3, None, 2, True),    # tombstone existing key
            (9, None, 2, True),    # tombstone never-seen key -> no-op
        ],
        "k long, v string, ver int, deleted boolean",
    )
    out = merge_latest(base, upd, ["k"], "ver", delete_col="deleted")
    rows = {r.k: (r.v, r.ver) for r in out.collect()}
    assert rows == {1: ("a", 1), 2: ("b2", 2), 4: ("d", 2)}
    assert out.columns == ["k", "v", "ver"]


def test_merge_latest_same_version_resubmit_is_idempotent(spark):
    """A re-submitted update with an unchanged version must win the tie
    against the already-merged row (updates-side preference), so applying
    the same batch twice yields the same table."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.relational import merge_latest

    base = spark.createDataFrame([(1, "old", 1)], "k long, v string, ver int")
    upd = spark.createDataFrame([(1, "new", 2)], "k long, v string, ver int")
    once = merge_latest(base, upd, ["k"], "ver")
    twice = merge_latest(once, upd, ["k"], "ver")
    assert once.collect() == twice.collect() == [(1, "new", 2)]


def test_merge_latest_single_exchange(spark):
    """The merge must cost ONE hash exchange on the key (union is
    shuffle-free; row_number and filter ride the same partitioning)."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.relational import merge_latest

    base = spark.range(100).withColumn("ver", F.lit(1))
    upd = spark.range(0, 100, 2).withColumn("ver", F.lit(2))
    plan = (
        merge_latest(base, upd, ["id"], "ver")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
