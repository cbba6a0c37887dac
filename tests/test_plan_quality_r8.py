"""Round-8 pins: the ADVICE/VERDICT r7 plan fixes must be visible in
the physical plans — attribution_time_decay's direct channel reuses
the single shared purchase branch (no second events scan lineage from
a second helper call), the drift midpoints stay on integer arithmetic,
and the new round-8 queries keep the catalog's standing shape rules
(no Python eval in batch paths, no unpartitioned window over
data-sized frames, broadcasts on small sides)."""

from __future__ import annotations

import contextlib
import io
import re

from real___time_fraud_detection_using_apache_kafka_spark import plans

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_attribution_time_decay_single_purchase_lineage(spark, monkeypatch):
    """The direct-channel anti-join must consume the SAME purchase
    branch as the decay credit — ONE _attribution_matched call total
    (ADVICE r7; the old shape invoked the helper a second time with
    strategy='unbanded' solely to rebuild `pur`, duplicating the
    events scan/filter lineage and risking strategy divergence)."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans import (
        queries_temporal as QT,
    )

    calls = []
    real = QT._attribution_matched

    def counting(sp, sf_dir, strategy):
        calls.append(strategy)
        return real(sp, sf_dir, strategy)

    monkeypatch.setattr(QT, "_attribution_matched", counting)
    df = QT.attribution_time_decay(spark, SF)
    assert calls == ["auto"], f"helper called with {calls}"
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_drift_midpoints_are_integer_division(spark):
    """psi_score_drift / categorical_drift_audit midpoint must be the
    exact integer `div`, not a double try_divide (ADVICE r7): past
    2^53 the double path can shift the window split vs the oracle's
    integer `//`."""
    for name in ("psi_score_drift", "categorical_drift_audit"):
        df = plans.QUERIES[name].fn(spark, SF)
        opt = _optimized(df)
        assert re.search(r"\bdiv\b|_div\(", opt.replace("try_divide", "")), (
            f"{name}: no integer div in optimized plan"
        )
        assert "try_divide" not in opt, f"{name}: still on try_divide"


def test_rfm_has_no_unpartitioned_window(spark):
    """rfm_segmentation's exact quartiles must come from the bucketed
    distributed rank — every Window in the plan is PARTITIONED (by the
    rank bucket); an empty partition spec would be the
    whole-customer-dimension funnel the helper exists to avoid."""
    df = plans.QUERIES["rfm_segmentation"].fn(spark, SF)
    plan = _plan(df)
    # formatted explain prints window group specs; reject any window
    # whose partition spec is empty
    for m in re.finditer(r"partitionBy=\[\]", plan):
        raise AssertionError("unpartitioned Window in rfm plan")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_market_basket_broadcasts_small_sides(spark):
    """market_basket_rules: the part dim, brand marginals and the
    1-row total must ride broadcasts; the only data-sized shuffles are
    the basket distinct and the pair self-join on l_orderkey."""
    df = plans.QUERIES["market_basket_rules"].fn(spark, SF)
    plan = _plan(df)
    assert len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin",
                          plan)) >= 3
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_new_r8_queries_stay_jvm_side(spark):
    """bigram_perplexity / feature_info_gain / seasonal_trend_decompose:
    pure built-in-function plans — no Python evaluation anywhere."""
    for name in ("bigram_perplexity", "feature_info_gain",
                 "seasonal_trend_decompose"):
        df = plans.QUERIES[name].fn(spark, SF)
        plan = _plan(df)
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_lsh_multiprobe_recall_vs_exact_tier(spark):
    """The r8 multi-probe defaults must keep every emitted pair exact
    (verify stage) and reach >= 0.95 recall on the sf0.001 corpus —
    the operator-level mirror of the sf0.1 measurement in SCALE.md."""
    import real___time_fraud_detection_using_apache_kafka_spark.operators.similarity as SIM
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in SIM.cosine_neardup_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in SIM.hyperplane_lsh_pairs(emb, threshold=0.45).collect()
    }
    assert lsh <= exact
    assert exact
    assert len(lsh & exact) / len(exact) >= 0.95


def test_r8_batch2_queries_stay_jvm_side(spark):
    """welch_ttest_value / user_burstiness / stratified_kfold /
    brier_decomposition / session_bounce_stats: pure built-in-function
    plans — no Python evaluation, no cartesian, and no unpartitioned
    window over a data-sized frame (session windows partition by
    user_id; the burstiness top-20 is a TakeOrdered, not a window)."""
    for name in (
        "welch_ttest_value",
        "user_burstiness",
        "stratified_kfold",
        "brier_decomposition",
        "session_bounce_stats",
    ):
        df = plans.QUERIES[name].fn(spark, SF)
        plan = _plan(df)
        # r11: stratified_kfold's portable hash is a vectorized Arrow
        # UDF; row-at-a-time Python stays banned.  ADVICE r11: pin the
        # Arrow node count too — one sanctioned hash projection in
        # stratified_kfold, zero Python anywhere else — so an
        # accidental future Python stage fails instead of riding the
        # blanket allowance.
        assert "BatchEvalPython" not in plan, name
        n_arrow = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
        assert n_arrow == (1 if name == "stratified_kfold" else 0), name
        assert "CartesianProduct" not in plan, name
        assert "partitionBy=[]" not in plan, name


def test_burstiness_topk_is_take_ordered(spark):
    """user_burstiness's top-20 must compile to TakeOrderedAndProject
    (distributed partial top-k), never a global sort of the per-user
    frame."""
    df = plans.QUERIES["user_burstiness"].fn(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_rfm_single_rank_pass(spark):
    """The melted RFM plan ranks all three metrics in ONE
    bucketed_global_rank: exactly one data-sized Window (partitioned
    by the metric bucket) in the whole plan — three separate rank
    subtrees would show three."""
    df = plans.QUERIES["rfm_segmentation"].fn(spark, SF)
    plan = _plan(df)
    n_windows = len(re.findall(r"\(\d+\) Window", plan))
    assert n_windows == 1, f"expected 1 Window, saw {n_windows}"
