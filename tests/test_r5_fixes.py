"""Regression tests for the round-5 ADVICE/VERDICT fixes:

- NULL bucket totals must not poison downstream prefix offsets
  (``_plan_side_offsets`` coalesces each "sum" element to the identity).
- ``pagerank_fixed`` keeps zero-in-degree vertices alive at the
  ``(1-d)/n`` baseline instead of dropping them after iteration 1.
- ``khop_min_dist`` dedups seed rows.
- ``TxnTable.last_batch`` skips app-tagged entries that carry no
  ``batch_id`` instead of returning -1 and disabling replay dedup.
- the session-scoped tracked-persist registry bounds operator-internal
  caches to one catalog query in a long-lived build→collect loop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import (
    release_tracked,
    tracked_persist,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.graph import (
    khop_min_dist,
    pagerank_fixed,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
    exclusive_prefix_sum,
)

SF = "/root/testdata/sf0.001"


class TestNullBucketOffsets:
    def test_all_null_bucket_does_not_poison_later_offsets(self, spark):
        # bucket 0 (order values near 0.0) holds only NULL v rows; every
        # later bucket's exclusive prefix must still be the finite sum of
        # preceding non-NULL values, not NULL
        rows = [(0.01, None), (0.02, None), (0.5, 10.0), (0.6, 20.0), (0.9, 5.0)]
        df = spark.createDataFrame(rows, "s double, v double")
        out = exclusive_prefix_sum(df, "s", ["v"], n_buckets=4).collect()
        by_s = {r["s"]: r["v_before"] for r in out}
        assert by_s[0.5] == 0
        assert by_s[0.6] == 10.0
        assert by_s[0.9] == 30.0

    def test_grand_total_skips_null_buckets(self, spark):
        rows = [(0.01, None), (0.9, 7.0)]
        df = spark.createDataFrame(rows, "s double, v double")
        out = exclusive_prefix_sum(
            df, "s", ["v"], n_buckets=4, grand_cols=["v"]
        ).collect()
        assert all(r["v_grand"] == 7.0 for r in out)


class TestPagerankZeroInDegree:
    @pytest.mark.parametrize("strategy", ["broadcast", "copartition"])
    def test_pure_source_vertex_survives_with_baseline(self, spark, strategy):
        # directed: a feeds b, b<->c cycle; a has NO in-edges
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "b")], "src string, dst string"
        )
        ranks = {
            r["node"]: r["rank"]
            for r in pagerank_fixed(
                edges, iterations=3, strategy=strategy
            ).collect()
        }
        release_tracked(spark)
        assert set(ranks) == {"a", "b", "c"}
        assert ranks["a"] == pytest.approx(0.15 / 3)

    def test_symmetric_graph_unchanged_and_sums_to_one(self, spark):
        sym = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
        edges = spark.createDataFrame(sym, "src string, dst string")
        ranks = pagerank_fixed(edges, iterations=3).collect()
        release_tracked(spark)
        assert sum(r["rank"] for r in ranks) == pytest.approx(1.0)


class TestKhopSeedDedup:
    def test_duplicate_seeds_yield_one_row(self, spark):
        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        seeds = spark.createDataFrame([("a",), ("a",)], "node string")
        out = khop_min_dist(edges, seeds, max_hops=1).collect()
        release_tracked(spark)
        got = sorted((r["node"], r["dist"]) for r in out)
        assert got == [("a", 0), ("b", 1)]


class TestLastBatchSkipsUnstampedEntries:
    def test_maintenance_entry_without_batch_id_is_skipped(self, spark, tmp_path):
        from real___time_fraud_detection_using_apache_kafka_spark.sources.txn_table import (
            TxnTable,
        )

        t = TxnTable(str(tmp_path / "tbl"))
        df = spark.range(3).select(F.col("id").cast("long"))
        t.append(df, meta={"app_id": "app1", "batch_id": 7})
        # maintenance overwrite tagged with the app but no batch_id
        t.overwrite(df, meta={"app_id": "app1"})
        assert t.last_batch("app1") == 7
        assert t.last_batch("other") == -1


class TestTrackedCacheLifecycle:
    def test_next_query_build_releases_previous_caches(self, spark):
        spark.catalog.clearCache()
        q = plans.queries()
        # a graph query persists internal state (edge list, degree cache)
        assert q["copurchase_degree_stats"](spark, SF).count() >= 0
        # building ANY next catalog query must free those tracked caches
        q["order_value_percentiles"](spark, SF)
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
        release_tracked(spark)

    def test_release_tracked_is_idempotent(self, spark):
        df = tracked_persist(spark.range(5))
        assert df.count() == 5
        assert release_tracked(spark) == 1
        assert release_tracked(spark) == 0
