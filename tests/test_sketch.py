"""Quantile / histogram / sketch aggregates (plans/queries_sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_sketch import (
    approx_event_sketches,
    event_value_histogram,
    order_value_percentiles,
)
from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table


def test_percentiles_ordered_and_bounded(spark, sf_dir):
    rows = order_value_percentiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"]
        assert r["n_orders"] > 0


def test_histogram_partitions_all_rows(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    total = events.filter(F.col("value").isNotNull()).count()
    hist = event_value_histogram(spark, sf_dir).collect()
    assert sum(r["n"] for r in hist) == total
    # buckets are disjoint by construction; each row's sum stays in-bucket
    for r in hist:
        assert r["bucket_sum"] <= (r["bucket"] + 1) * 100.0 * r["n"] + 1e-6


def test_sketch_estimates_near_exact(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["nd"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    for r in approx_event_sketches(spark, sf_dir).collect():
        nd = exact[r["event_type"]]
        # rsd=0.02 HLL++ and Datasketches HLL: allow 5% relative error
        assert abs(r["approx_users"] - nd) <= max(2, 0.05 * nd)
        assert abs(r["hll_users"] - nd) <= max(2, 0.05 * nd)
        assert r["approx_p50"] <= r["approx_p95"]


def test_heavy_hitter_tokens_recall_vs_exact(spark, sf_dir):
    """Local-pruning top-20 must recover the exact top-20 (with tolerance
    for approximation at the tail: recall >= 0.9)."""
    from real___time_fraud_detection_using_apache_kafka_spark import plans

    approx = plans.QUERIES["heavy_hitter_tokens"].fn(spark, sf_dir).collect()
    exact = plans.QUERIES["corpus_top_tokens"].fn(spark, sf_dir).collect()
    approx_set = {r.tok for r in approx}
    exact_set = {r.tok for r in exact}
    assert len(approx_set & exact_set) >= 0.9 * len(exact_set)
    # counts of recovered heads must not exceed the true counts
    exact_counts = {r.tok: r.cnt for r in exact}
    for r in approx:
        if r.tok in exact_counts:
            assert r.cnt <= exact_counts[r.tok]


def test_hll_registers_estimate_within_sketch_error(spark, sf_dir):
    """HLL m=256 has ~6.5% standard error; every per-type estimate must
    land within 4 sigma of exact, and rel_err must agree with the
    published columns."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_sketch import (
        hll_distinct_users,
    )

    rows = hll_distinct_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 4 * 1.04 / (256 ** 0.5), r


def test_cms_never_underestimates_and_hits_exact_on_top(spark, sf_dir):
    """The count-min invariant: estimate >= exact for every probed key
    (min over d rows of a counter that always includes the key's own
    contribution)."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_sketch import (
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.cms_estimate == r.exact_cnt + r.overestimate


def test_bloom_no_false_negatives_and_sane_fp(spark, sf_dir):
    """Bloom invariant: every member passes (bloom_pass >= exact_pass,
    false_pos = bloom_pass - exact_pass); the realized FP rate must stay
    an order of magnitude under the 3.9%-of-users design point applied
    to rows (loose bound: < 50% of non-member rows)."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_sketch import (
        bloom_semijoin_prune,
    )

    r = bloom_semijoin_prune(spark, sf_dir).collect()[0]
    assert r.bloom_pass >= r.exact_pass
    assert r.false_pos == r.bloom_pass - r.exact_pass
    non_member = r.n_probe - r.exact_pass
    if non_member:
        assert r.false_pos <= 0.5 * non_member


def test_grid_quantile_sketch_accuracy_and_merge_exactness(spark, sf_dir):
    """(a) the sketch p50 must sit within one bucket width of the exact
    p50 (interpolation error bound); (b) MERGE EXACTNESS: cells built
    on two disjoint shards and summed cell-wise must reproduce the
    whole-corpus estimate bit-for-bit — the algebra that lets
    day-partitioned histogram tables roll up without rescanning."""
    from real___time_fraud_detection_using_apache_kafka_spark.plans.queries_sketch import (
        GRID_QUANTILE_W,
        grid_quantile_sketch,
    )

    rows = grid_quantile_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_abs_err"] <= GRID_QUANTILE_W
        assert r["p50_sketch"] <= r["p95_sketch"]

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def cells(df):
        return df.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(GRID_QUANTILE_W))
            .cast("long")
            .alias("b"),
        ).agg(F.count("*").alias("cnt"))

    whole = {(r.event_type, r.b): r.cnt for r in cells(e).collect()}
    merged = (
        cells(e.filter(F.col("event_id") % 2 == 0))
        .unionByName(cells(e.filter(F.col("event_id") % 2 == 1)))
        .groupBy("event_type", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert {(r.event_type, r.b): r.cnt for r in merged.collect()} == whole
