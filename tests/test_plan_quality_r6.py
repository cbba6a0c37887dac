"""Physical-plan pins for the round-6 additions: the degree-capped
link-prediction tier must carry the hub anti-join (no quadratic wedge
surface), and the ALS half-step must stay a JVM-side join+aggregate
with a single scalar broadcast for YᵀY."""

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


def _nodes(plan: str, kind: str) -> int:
    # node HEADERS only — the formatted details section repeats names
    return len(re.findall(rf"\(\d+\) \w*{kind}", plan))


def test_common_neighbors_capped_carries_hub_anti_join(spark):
    """The scale tier's whole point: vertices above the degree cap are
    removed from the wedge self-join by an anti-join BEFORE wedges are
    enumerated — the plan must carry a LeftAnti join beyond the final
    non-edge filter (i.e. two anti-join nodes total), and no cartesian
    anywhere."""
    plan = plan_of(spark, "common_neighbors_capped")
    assert plan.count("Join type: LeftAnti") >= 2
    assert "CartesianProduct" not in plan


def test_common_neighbors_exact_remains_default_oracle_tier(spark):
    """The exact tier keeps its wedge plan (one LeftAnti node: the
    non-edge filter) — the cap must not leak into the oracled
    default."""
    plan = plan_of(spark, "common_neighbors_parts")
    assert plan.count("Join type: LeftAnti") == 1


def test_als_half_step_is_jvm_joins_and_one_scalar_broadcast(spark):
    """The half-step is pure column algebra: no Python evaluation, the
    YᵀY 1-row frame arrives via a broadcast nested-loop (scalar cross),
    and the ratings join is an equi-join."""
    plan = plan_of(spark, "als_half_step_factors")
    assert "EvalPython" not in plan
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 1
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert "Window" not in plan


def test_hll_is_two_hash_aggregates_no_window(spark):
    """The HLL register build must be map-side-combinable hash
    aggregation over a narrow projection — no window, no Python, no
    cartesian; register state is (type x 256) mergeable rows."""
    plan = plan_of(spark, "hll_distinct_users")
    assert "Window" not in plan
    # r11: the portable hash is a vectorized Arrow UDF (one
    # ArrowEvalPython projection); row-at-a-time Python stays banned,
    # and the Arrow node count is pinned (ADVICE r11) so an accidental
    # extra Python stage — or optimizer duplication of the hash (guide
    # §4.4) — fails loudly instead of hiding behind the allowance
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "CartesianProduct" not in plan
    assert _nodes(plan, "HashAggregate") >= 4  # partial+final x (regs, agg)


def test_cms_probe_broadcasts_the_sketch(spark):
    """The (d x w)-cell sketch must arrive at the top-k probe via a
    broadcast hash join — never a shuffle of the probe side against the
    sketch — and the whole query stays JVM-side."""
    plan = plan_of(spark, "cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # Arrow-vectorized hash allowed (r11)
    # exactly the two hash sites (sketch build + probe) — ADVICE r11
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 2
    assert "CartesianProduct" not in plan


def test_bloom_probe_is_single_scan_with_broadcast_bits(spark):
    """The probe side reads events ONCE for flagging (build/bits/m ride
    broadcasts); the bit set joins as a broadcast nested loop of
    single-row frames, and membership flagging must not shuffle probe
    rows before the final scalar aggregate (one final-agg exchange is
    the only post-scan shuffle on the probe path)."""
    plan = plan_of(spark, "bloom_semijoin_prune")
    assert "BatchEvalPython" not in plan  # Arrow-vectorized hash allowed (r11)
    # exactly the two hash sites (bit build + probe flagging) — ADVICE r11
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 2
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan


def test_attribution_join_is_banded_equi_join(spark):
    """The touch-purchase match must be an EQUI-join on (user, bucket)
    — the formatted plan carries a hash-partitioned join with the range
    as residual, never a BroadcastNestedLoopJoin/cartesian over per-user
    frames — and the fold to credits is windowless hash aggregation."""
    plan = plan_of(spark, "purchase_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_hll_rollup_merges_cells_not_rescans(spark):
    """The rollup's whole point: per-type and global estimates must
    derive from the FINEST register cells (aggregations over cells),
    not from re-reading the fact — the estimate path adds no events
    scan beyond the one cell build (the second scan in the plan is the
    exact-count audit side), and the whole query is windowless
    hash aggregation."""
    plan = plan_of(spark, "hll_rollup_merge")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan  # Arrow-vectorized hash allowed (r11)
    # one hash site (the register build; the audit reuses it) — ADVICE r11
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
