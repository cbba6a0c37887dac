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
