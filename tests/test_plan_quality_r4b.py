"""Physical-plan pins for the round-4 batch-2/3 queries: the scale
properties their docstrings promise (equi-joins only in the graph
family, no eager pivot pre-job, Expand-based unpivot/rollup, the
SymSpell join staying an equi-join with broadcast vocab)."""

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


def test_graph_queries_use_equi_joins_only(spark):
    """Triangle census / BFS / degree stats: every DATA-sized join must
    be hash or sort-merge on keys — a cartesian product means the
    degree orientation or blocking silently regressed.  The triangle
    query legitimately carries two BroadcastNestedLoopJoin-Cross nodes:
    the broadcast combination of its 1-row aggregates (edge count +
    triangle count), the engine-wide scalar-totals pattern."""
    for name, bnlj_budget in (("copurchase_triangles", 2),
                              ("copurchase_khop_reach", 0),
                              ("copurchase_degree_stats", 0)):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        got = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
        assert got <= bnlj_budget, (name, got)


def test_triangle_wedges_join_is_equi(spark):
    """The closing-edge probe joins on the id-canonical pair — the plan
    must show a join keyed on both wedge endpoints, not a filtered
    cross product."""
    plan = plan_of(spark, "copurchase_triangles")
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)


def test_pivot_has_no_distinct_collect_pre_job(spark):
    """pivot() with the explicit value list compiles to conditional
    aggregation — exactly two aggregate exchanges (pivot + totals),
    and no extra scan beyond the two aggregate branches."""
    plan = plan_of(spark, "user_event_pivot")
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 2, f"expected <=2 events scans, got {scans}"


def test_unpivot_is_expand_not_union(spark):
    """DataFrame.unpivot -> one Expand over one aggregate: a UNION ALL
    formulation would show 3 scans."""
    plan = plan_of(spark, "priority_metrics_unpivot")
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_rollup_is_expand_single_scan(spark):
    plan = plan_of(spark, "revenue_time_rollup")
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_fuzzy_join_is_equi_on_variant_key(spark):
    """The SymSpell candidate join must be an equi-join on the
    deletion-variant key (hash/sort-merge, unhinted — AQE broadcasts at
    runtime when the vocab side is actually small); levenshtein appears
    only as a post-join filter, never as a join condition (which would
    force nested-loop)."""
    plan = plan_of(spark, "fuzzy_vocab_correction")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)


def test_ewma_has_no_window_exec(spark):
    """The EWMA recurrence is an aggregate fold — no WindowExec should
    appear (a window formulation would re-introduce per-row state)."""
    plan = plan_of(spark, "ewma_user_value")
    assert "Window" not in plan


def test_timeseries_windows_are_day_bounded(spark):
    """autocorr/cusum windows run AFTER the per-day collapse: the
    aggregate must appear below the window in the plan (scan ->
    aggregate -> window order)."""
    for name in ("autocorr_daily_revenue", "cusum_changepoint"):
        plan = plan_of(spark, name)
        win_pos = plan.find("Window")
        assert win_pos != -1, name
        # the tree prints root-first, so the per-day collapse aggregate
        # (the window's INPUT) must appear after the window node, i.e.
        # some HashAggregate sits below the window in the tree
        assert plan.rfind("HashAggregate") > win_pos, name


def test_kmv_topk_uses_window_group_limit(spark):
    """The per-group k-smallest-hash cut must plan WindowGroupLimit
    (per-partition heaps), not a full per-group sort."""
    plan = plan_of(spark, "kmv_distinct_users")
    assert "WindowGroupLimit" in plan
