"""Round-7 pins: the span-adaptive attribution tier must (a) produce
identical results under both join strategies, (b) auto-select the
unbanded join on the short/dense synthetic history and the banded join
when forced, and (c) keep both physical plans on the equi-join path —
no cartesian, no window, no Python evaluation."""

from __future__ import annotations

import contextlib
import io
import re

from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_temporal import (
    purchase_attribution,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )


def test_als_half_step_items_mirrors_the_user_plan(spark):
    """The item half-step (the transposed solve) must carry the same
    physical shape the r6 pin holds for the user side: pure column
    algebra, ONE scalar broadcast nested-loop for XᵀX, an equi-join on
    the rating fact, no window."""
    from real___time_fraud_detection_using_apache_kafka_spark import plans

    plan = _plan(
        plans.queries()["als_half_step_items"](spark, "/root/testdata/sf0.01")
    )
    assert "EvalPython" not in plan
    assert len(re.findall(r"\(\d+\) \w*BroadcastNestedLoopJoin", plan)) == 1
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert "Window" not in plan


def test_half_steps_agree_with_each_other_on_transpose(spark):
    """Solving items on ratings R must equal solving users on Rᵀ with
    the same fixed factors — the symmetry the implementation relies on,
    checked end-to-end on real tables."""
    from real___time_fraud_detection_using_apache_kafka_spark.ml.recommend import (
        als_half_step_items,
        als_half_step_users,
        deterministic_item_factors,
        purchase_counts,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    ratings = purchase_counts(
        load_table(spark, SF, "lineitem"), load_table(spark, SF, "orders")
    )
    users = deterministic_item_factors(
        load_table(spark, SF, "customer").select("c_custkey"), key="c_custkey"
    )
    via_items = _rows(als_half_step_items(ratings, users))
    via_transpose = _rows(
        als_half_step_users(
            ratings.select(
                F.col("partkey").alias("custkey"),
                F.col("custkey").alias("partkey"),
                "n",
            ),
            users,
        ).select(
            F.col("custkey").alias("partkey"),
            F.col("n_items").alias("n_users"),
            F.col("x1").alias("y1_new"),
            F.col("x2").alias("y2_new"),
        )
    )
    assert via_items == via_transpose and len(via_items) > 0


def test_attribution_strategies_are_parity_identical(spark):
    """banded and unbanded are two physical forms of ONE query — every
    published number must match exactly (decimal credits, rounded
    linear shares, counts)."""
    banded = _rows(purchase_attribution(spark, SF, strategy="banded"))
    unbanded = _rows(purchase_attribution(spark, SF, strategy="unbanded"))
    assert banded == unbanded
    assert len(banded) > 0


def test_attribution_auto_selects_by_span(spark):
    """The synthetic history spans ~30 days < ATTRIBUTION_DENSE_SPAN_DAYS,
    so auto must take the unbanded join (no bucket explode => no
    Generate node); forcing banded must show the explode."""
    auto_plan = _plan(purchase_attribution(spark, SF, strategy="auto"))
    banded_plan = _plan(purchase_attribution(spark, SF, strategy="banded"))
    assert "Generate" not in auto_plan, "auto picked banded on a dense span"
    assert "Generate" in banded_plan


def test_attribution_auto_picks_banded_on_long_span(spark, tmp_path):
    """On a multi-year history (the 100 TB regime) auto must take the
    banded join — and both strategies must still agree on the result."""
    from pyspark.sql import functions as F

    ev = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("event_id"),
            # ~2-year span, touches and purchases interleaved per user
            (
                F.to_timestamp(F.lit("2023-01-01 00:00:00"))
                + F.make_interval(hours=(F.col("id") * 9) % 17000)
            ).alias("ts"),
            (F.col("id") % 37).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 97 + 0.5).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    sf = str(tmp_path)
    auto_plan = _plan(purchase_attribution(spark, sf, strategy="auto"))
    assert "Generate" in auto_plan, "auto must band a 2-year span"
    assert _rows(purchase_attribution(spark, sf, strategy="banded")) == _rows(
        purchase_attribution(spark, sf, strategy="unbanded")
    )


def test_attribution_both_strategies_stay_on_equi_join_path(spark):
    """Neither form may regress to a cartesian/BNLJ pair enumeration or
    reintroduce the windowed ranking; the match must be a
    hash-partitionable equi-join with the range as residual."""
    for strategy in ("banded", "unbanded"):
        plan = _plan(purchase_attribution(spark, SF, strategy=strategy))
        assert "CartesianProduct" not in plan, strategy
        assert "BroadcastNestedLoopJoin" not in plan, strategy
        assert "Window" not in plan, strategy
        assert "EvalPython" not in plan, strategy
        assert re.search(
            r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan
        ), strategy
