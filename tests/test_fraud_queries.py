"""Invariant tests for the fraud-forensics catalog (queries_fraud.py):
velocity-rule gap algebra, robust-outlier bounds, target-encoding
shrinkage direction, Benford accounting, RFM quartile balance, path
sessionization, FPGrowth support floor.

Oracle parity (exact values vs DuckDB) is covered by
tools/check_oracle.py / the driver gate; these tests pin structural
properties that a hash match alone wouldn't explain — plus planted-data
checks for the rows-only FPGrowth surface.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table


def run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_rapid_repeat_flags_are_consistent(spark, sf_dir):
    rows = run("rapid_repeat_purchases", spark, sf_dir).collect()
    assert rows, "sf0.001 has dense enough purchases to trip the rule"
    for r in rows:
        assert r["n_rapid"] >= 1
        assert r["n_rapid"] < r["n_purchases"]  # first purchase has no gap
        assert r["min_gap_sec"] <= 3600  # a rapid gap exists, so min is rapid


def test_rapid_repeat_threshold_matches_recount(spark, sf_dir):
    # independent recount of one flagged user via a driver-side sort
    out = run("rapid_repeat_purchases", spark, sf_dir).collect()
    uid = out[0]["user_id"]
    ts = [
        r["ts"]
        for r in load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") == uid))
        .select("ts")
        .collect()
    ]
    ts.sort()
    rapid = sum(
        1 for a, b in zip(ts, ts[1:]) if (b - a).total_seconds() // 1 <= 3600
    )
    assert rapid == next(r["n_rapid"] for r in out if r["user_id"] == uid)


def test_robust_outliers_bounded_and_mad_sane(spark, sf_dir):
    rows = run("value_outliers_robust", spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == {
        "click", "view", "purchase", "signup", "error"
    }
    for r in rows:
        assert 0 <= r["n_outliers"] < r["n_events"] * 0.5  # breakdown point
        assert r["mad"] >= 0 and r["med"] >= 0


def test_target_encoding_shrinks_toward_global(spark, sf_dir):
    rows = run("priority_target_encoding", spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    grate = sum(r["n"] * r["raw_rate"] for r in rows) / total
    for r in rows:
        lo, hi = sorted((r["raw_rate"], grate))
        # smoothed rate lies strictly between the raw rate and the prior
        assert lo - 1e-6 <= r["smoothed_rate"] <= hi + 1e-6
        # shrinkage weight is n/(n+100) exactly
        expect = (r["n"] * r["raw_rate"] + 100 * grate) / (r["n"] + 100)
        assert abs(r["smoothed_rate"] - expect) < 1e-4


def test_benford_shares_account_for_every_order(spark, sf_dir):
    rows = run("benford_first_digit", spark, sf_dir).collect()
    assert sorted(r["digit"] for r in rows) == [str(d) for d in range(1, 10)]
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        expect = math.log10(1 + 1 / int(r["digit"]))
        assert abs(r["exp_share"] - expect) < 1e-5
        assert r["chi2_term"] >= 0
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["observed"] for r in rows) == n_orders


def test_rfm_quartiles_balanced_and_ordered(spark, sf_dir):
    rows = run("user_rfm_segments", spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            assert 1 <= r[col] <= 4
            counts[r[col]] = counts.get(r[col], 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1  # ntile balance
    # monetary quartiles are value-ordered: every q4 user outspends every q1
    q1 = [r["monetary"] for r in rows if r["m_score"] == 1]
    q4 = [r["monetary"] for r in rows if r["m_score"] == 4]
    assert max(q1) <= min(q4)
    assert all(r["recency_days"] >= 0 for r in rows)


def test_session_paths_top15_convert_iff_purchase_in_path(spark, sf_dir):
    rows = run("session_conversion_paths", spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    # ordered by support, descending
    supports = [r["n_sessions"] for r in rows]
    assert supports == sorted(supports, reverse=True)
    for r in rows:
        assert 0 <= r["n_converted"] <= r["n_sessions"]
        if "purchase" not in r["path"].split(">"):
            assert r["n_converted"] == 0, r["path"]
        else:
            assert r["n_converted"] == r["n_sessions"], r["path"]
        assert abs(r["conv_rate"] - r["n_converted"] / r["n_sessions"]) < 1e-3


def test_fpgrowth_respects_support_floor_and_monotonicity(spark, sf_dir):
    rows = run("frequent_event_itemsets", spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id").distinct().count()
    )
    freqs = {r["itemset"]: r["freq"] for r in rows}
    assert freqs, "minSupport=0.3 must keep the frequent singletons"
    for itemset, freq in freqs.items():
        assert freq >= 0.3 * n_users
        items = itemset.split(",")
        assert items == sorted(items)
        # anti-monotone: every subset itemset at least as frequent
        for drop in range(len(items)):
            sub = ",".join(items[:drop] + items[drop + 1 :])
            if sub:
                assert freqs.get(sub, 0) >= freq, (sub, itemset)


def test_fpgrowth_planted_baskets(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b"] if i < 8 else ["c"]) for i in range(10)],
        "user_id long, items array<string>",
    )
    from pyspark.ml.fpm import FPGrowth

    model = FPGrowth(itemsCol="items", minSupport=0.5).fit(df)
    got = {
        ",".join(sorted(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
    }
    assert got == {"a": 8, "b": 8, "a,b": 8}


def test_outlier_approx_tier_tracks_exact_tier(spark, sf_dir):
    """The sketch-based scale tier must agree with the exact tier within
    the sketch's rank-error envelope — same plan, cheaper state."""
    exact = {r["event_type"]: r for r in run("value_outliers_robust", spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in run("value_outliers_approx", spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for t in exact:
        e, a = exact[t], approx[t]
        assert a["n_events"] == e["n_events"]
        # medians within 2% relative (accuracy=1000 => <=0.1% rank error)
        assert abs(a["med"] - e["med"]) <= 0.02 * e["med"] + 1e-9, t
        assert abs(a["mad"] - e["mad"]) <= 0.05 * e["mad"] + 1e-9, t
        # outlier census moves by at most the mass near the threshold
        assert abs(a["n_outliers"] - e["n_outliers"]) <= max(3, 0.2 * e["n_outliers"]), t
