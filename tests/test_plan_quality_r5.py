"""Physical-plan pins for the round-5 catalog batch: the scale
properties the docstrings promise — distributed ranks instead of
single-partition windows (spearman, gini, RFM default), zero-exchange
narrow minhash signatures, Expand-based grouping sets, equi-join-only
wedge enumeration in the link-prediction pair, and partitioned windows
for the sequence queries."""

from __future__ import annotations

import contextlib
import io
import re

from real___time_fraud_detection_using_apache_kafka_spark import plans

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = plans.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _unpartitioned_windows(plan: str) -> list[str]:
    # formatted-plan Window details: "Arguments: [..], [part spec], [order]"
    return [
        m
        for m in re.findall(r"\(\d+\) Window\n[^(]*", plan)
        if ", [], " in m.replace("\n", " ") or "[] ," in m
    ]


def test_spearman_uses_bucketed_prefix_not_global_window(spark):
    plan = plan_of(spark, "spearman_corr_value_qty")
    assert "_bucket" in plan
    assert _unpartitioned_windows(plan) == []


def test_gini_uses_bucketed_rank_not_global_window(spark):
    plan = plan_of(spark, "gini_customer_revenue")
    assert "_bkt" in plan
    assert _unpartitioned_windows(plan) == []


def test_rfm_default_is_bucketed_rank(spark):
    """VERDICT r4 item 7: the catalog default must carry the
    distributed-rank machinery — no data-sized unpartitioned ntile."""
    plan = plan_of(spark, "user_rfm_segments")
    assert "_bkt" in plan
    assert "ntile" not in plan.lower()
    assert _unpartitioned_windows(plan) == []


def test_minhash_signatures_is_narrow(spark):
    """Shingle -> hash -> K permutation minima all ride higher-order
    array expressions on the row: the plan must contain NO exchange at
    all (and no Python UDF — the hash is a codegen expression)."""
    plan = plan_of(spark, "minhash_signatures")
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_grouping_sets_is_expand_single_scan(spark):
    plan = plan_of(spark, "grouping_sets_revenue")
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_link_prediction_wedges_are_equi_joins(spark):
    for name in ("adamic_adar_parts", "common_neighbors_parts"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_sequence_windows_are_partitioned(spark):
    """Per-entity sequence queries: every window partitions by the
    entity key (custkey / priority / year)."""
    for name in (
        "inter_purchase_gaps",
        "purchase_streaks",
        "cume_dist_order_values",
        "lead_lag_revenue_delta",
    ):
        plan = plan_of(spark, name)
        assert _unpartitioned_windows(plan) == [], name


def test_mad_outliers_broadcasts_group_medians(spark):
    """The per-priority median/MAD tables are <=5 rows — they must come
    back as broadcasts, never a shuffle join of the fact side."""
    plan = plan_of(spark, "mad_outlier_orders")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_attribution_join_is_equi_on_user(spark):
    """The touch-to-purchase match must be an equi-join on user_id with
    the 7-day range as a residual filter — a cross product would mean
    the self-join aliases regressed; both ranking windows partition by
    the purchase id."""
    plan = plan_of(spark, "purchase_attribution")
    assert "CartesianProduct" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert _unpartitioned_windows(plan) == []


def test_adamic_adar_has_no_wedge_blowup(spark):
    """Triangle-plan pin: candidates come from ONE endpoint's adjacency
    (sum-of-degrees rows) and a LeftSemi adjacency probe — the plan
    must carry a LeftSemi join; the wedge self-join shape (all neighbor
    pairs, sum-of-degrees-SQUARED) would show none."""
    plan = plan_of(spark, "adamic_adar_parts")
    assert "LeftSemi" in plan, "adjacency probe must be a semi join"


def test_backtest_and_seasonality_are_single_scan_jvm(spark):
    """Both collapse the fact table once and stay in JVM expressions —
    one parquet scan, no Python evaluation anywhere."""
    for name in ("holt_backtest_accuracy", "dow_seasonality"):
        plan = plan_of(spark, name)
        scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        assert scans == 1, (name, scans)
        assert "EvalPython" not in plan, name


def test_elasticity_is_broadcast_join_single_agg(spark):
    """Part is a dim — the fact-dim match must broadcast; the grouped
    regression is windows-free (all sums ride one brand-keyed hash
    aggregate)."""
    plan = plan_of(spark, "price_elasticity_by_brand")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_rolling_active_users_has_no_window_or_rescan(spark):
    """Sliding count-distinct rides the bounded day expansion — no
    window operator, no cartesian, and exactly one events scan."""
    plan = plan_of(spark, "rolling_7d_active_users")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 2, scans  # ud + days branches of one dedup tree


def test_zipf_window_sits_above_the_top1000_cut(spark):
    """The ranking window must see only the TakeOrdered 1000-row head —
    never the vocab-sized frequency table."""
    plan = plan_of(spark, "zipf_fit_tokens")
    w = re.search(r"\((\d+)\) Window", plan)
    t = re.search(r"\((\d+)\) TakeOrderedAndProject", plan)
    assert w and t
    # formatted-plan node ids grow bottom-up: the cut must be the
    # window's CHILD (lower id), i.e. the window sees 1000 rows
    assert int(t.group(1)) < int(w.group(1))
    assert "CartesianProduct" not in plan
