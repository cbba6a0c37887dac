"""As-of join and sessionization operators: hand-checkable fixtures."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def ts(m, s=0):
    return datetime(2024, 1, 1, 10, m, s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "A"), (1, ts(30), "B"), (2, ts(5), "C")],
        ["k", "lts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, ts(0), 100.0), (1, ts(10), 110.0), (1, ts(20), 120.0),
         (2, ts(50), 999.0)],
        ["k", "rts", "v"],
    )
    out = asof_join(left, right, ["k"], "lts", "rts", ["v"])
    got = {(r["k"], r["tag"]): r["asof_v"] for r in out.collect()}
    assert got[(1, "A")] == 110.0   # equal timestamp included
    assert got[(1, "B")] == 120.0   # latest before
    assert got[(2, "C")] is None    # right side only later -> null


def test_asof_join_preserves_left_rows_and_columns(spark):
    left = spark.createDataFrame([(1, ts(1), "x")], ["k", "lts", "payload"])
    right = spark.createDataFrame([(1, ts(0), 5.0)], ["k", "rts", "v"])
    out = asof_join(left, right, ["k"], "lts", "rts", ["v"])
    assert out.count() == 1
    assert set(out.columns) == {"k", "lts", "payload", "asof_v"}


def test_sessionize_gap_splits(spark):
    rows = [
        (1, ts(0)), (1, ts(10)), (1, ts(50)), (1, ts(55)),  # 2 sessions
        (2, ts(0)),                                          # 1 session
    ]
    df = spark.createDataFrame(rows, ["user_id", "t"])
    out = sessionize(df, ["user_id"], "t", gap="30 minutes").collect()
    sess = {(r["user_id"], r["t"].minute): r["session_id"] for r in out}
    assert sess[(1, 0)] == 0 and sess[(1, 10)] == 0
    assert sess[(1, 50)] == 1 and sess[(1, 55)] == 1
    assert sess[(2, 0)] == 0


def test_session_stats_bounds_and_duration(spark):
    rows = [(1, ts(0)), (1, ts(10)), (1, ts(50))]
    df = spark.createDataFrame(rows, ["user_id", "t"])
    out = {
        r["session_id"]: r
        for r in session_stats(df, ["user_id"], "t", gap="30 minutes").collect()
    }
    assert out[0]["n_events"] == 2
    assert out[0]["duration_sec"] == 600
    assert out[1]["n_events"] == 1
    assert out[1]["duration_sec"] == 0

def test_interval_join_matches_naive_range_join(spark):
    """The bucketed equi-join strategy returns exactly the rows the naive
    range predicate defines — including matches that straddle a bucket
    boundary."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.temporal import (
        interval_join,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    right = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    got = interval_join(left, right, ["user_id"], "pts", "cts", "30 minutes")
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.cts") > F.col("l.pts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("r.cts") <= F.col("l.pts")),
    )
    g = {(r["pid"], r["cid"]) for r in got.collect()}
    n = {(r["pid"], r["cid"]) for r in naive.collect()}
    assert g == n and len(g) > 0


def test_sequence_pattern_and_pmi_invariants(spark, sf_dir):
    """EEP pattern matches recount independently for one user; PMI rows
    cover the full bigram grid and weight toward independence ~0."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    out = QUERIES["error_retry_purchase_pattern"].fn(spark, sf_dir).collect()
    if out:  # sf0.001 may or may not contain a match; recount when it does
        uid = out[0]["user_id"]
        evs = [
            r["event_type"]
            for r in load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") == uid)
            .orderBy("ts", "event_id")
            .collect()
        ]
        n = sum(
            1
            for i in range(2, len(evs))
            if evs[i - 2] == "error" and evs[i - 1] == "error"
            and evs[i] == "purchase"
        )
        assert n == next(r["n_matches"] for r in out if r["user_id"] == uid)

    pmi = QUERIES["event_transition_pmi"].fn(spark, sf_dir).collect()
    assert len(pmi) == 25  # full 5x5 transition grid occurs in the data
    total = sum(r["n"] for r in pmi)
    # random-ish synthetic stream: joint ~ product of marginals -> PMI ~ 0
    mean_abs = sum(abs(r["pmi"]) * r["n"] for r in pmi) / total
    assert mean_abs < 0.2


def test_asof_join_carries_right_row_atomically(spark):
    """A right row with a NULL in one value column must NOT produce a
    frankenstein match (value from an older row, timestamp from a newer
    one): the as-of carry is one struct per right ROW — DuckDB ASOF JOIN
    semantics, null fields included (caught by the round-4 null sweep)."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, 100, "q")], "k int, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 5.0, "old"), (1, 50, None, "new")],
        "k int, rts int, v double, label string",
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["v", "label", "rts"],
    ).collect()[0]
    # the latest right row (rts=50) wins ATOMICALLY: its null v rides
    # along with its label/ts — never v=5.0 from the older row
    assert row["asof_rts"] == 50
    assert row["asof_label"] == "new"
    assert row["asof_v"] is None


def test_asof_join_no_prior_right_row_is_all_null(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame([(1, 5, "q")], "k int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 50, 1.0)], "k int, rts int, v double"
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["v", "rts"],
    ).collect()[0]
    assert row["asof_v"] is None and row["asof_rts"] is None
