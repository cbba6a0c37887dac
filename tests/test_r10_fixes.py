"""Round-10 regression tests for the ADVICE r9 lifecycle fixes:

- the FINAL connected_components checkpoint is covered by the session
  cache tracker (it used to linger until nondeterministic JVM GC),
- release_frame handles both persist kinds and only warns on a genuine
  Spark-internal accessor failure,
- the table memo drops frames bound to stopped SparkContexts when a new
  applicationId is observed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestFinalCheckpointTracked:
    def test_release_tracked_frees_final_cc_checkpoint(self, spark):
        """ADVICE r9 (dedup.py:397): after the caller's action, one
        release_tracked() must leave ZERO extra persistent RDDs — the
        final round's localCheckpoint included, which plain
        DataFrame.unpersist cannot reach."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import (
            release_tracked,
        )
        from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
            connected_components,
        )

        sc = spark.sparkContext
        # leave no stale state from other tests
        release_tracked(spark)
        spark.catalog.clearCache()
        before = sc._jsc.sc().getPersistentRDDs().size()
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 60)], ["doc_a", "doc_b"]
        )
        cc = connected_components(pairs, driver_edge_threshold=0)
        assert cc.count() == 60
        # the final checkpoint is still alive here (the frame reads it)
        release_tracked(spark)
        after = sc._jsc.sc().getPersistentRDDs().size()
        assert after - before == 0, (before, after)
        # NOTE: cc is checkpoint-backed, so after release it cannot
        # recompute (documented track_frame caveat) — a fresh build is
        # the supported path and must be unaffected
        cc2 = connected_components(
            spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"]),
            driver_edge_threshold=0,
        )
        assert cc2.count() == 3
        release_tracked(spark)

    def test_release_frame_is_idempotent_and_quiet(self, spark, caplog):
        """Ordinary persisted frames (not LogicalRDD scans) must release
        without touching the RDD accessor path or logging the fallback
        warning; double release is a no-op."""
        import logging

        from real___time_fraud_detection_using_apache_kafka_spark.operators import cache

        df = spark.range(10).persist()
        df.count()
        with caplog.at_level(logging.WARNING, logger=cache.__name__):
            cache.release_frame(df)
            cache.release_frame(df)
        assert not caplog.records
        assert df.storageLevel.useMemory is False

    def test_release_frame_frees_checkpoint_rdd(self, spark):
        from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import (
            release_frame,
        )

        sc = spark.sparkContext
        before = sc._jsc.sc().getPersistentRDDs().size()
        df = spark.range(100).select((F.col("id") * 2).alias("x")).localCheckpoint(
            eager=True
        )
        assert sc._jsc.sc().getPersistentRDDs().size() == before + 1
        release_frame(df)
        assert sc._jsc.sc().getPersistentRDDs().size() == before


class TestConnectedComponentsTiers:
    def _random_pairs(self, spark, n, v):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(v)).alias("doc_a"),
            F.pmod(F.xxhash64(F.col("id") * 7919), F.lit(v)).alias("doc_b"),
        ).filter(F.col("doc_a") != F.col("doc_b"))

    def test_driver_tier_matches_distributed(self, spark):
        """r10: the driver union-find tier must be value-identical to
        the distributed fixpoint on the same graph (chain + random +
        isolated-pair shapes in one input)."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
            connected_components,
        )

        pairs = self._random_pairs(spark, 400, 120).union(
            spark.createDataFrame(
                [(1000, 1001), (1001, 1002), (2000, 2001)],
                ["doc_a", "doc_b"],
            )
        )
        s_drv, s_dist = {}, {}
        drv = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(pairs, stats=s_drv).collect()
        }
        dist = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(
                pairs, stats=s_dist, driver_edge_threshold=0
            ).collect()
        }
        assert s_drv["tier"] == "driver-unionfind" and s_drv["rounds"] == 0
        assert s_dist["tier"] == "distributed"
        assert drv == dist and len(drv) > 100

    def test_driver_tier_string_ids(self, spark):
        """The tier must preserve the id type — string doc ids get
        string cluster ids (min is lexicographic, same as the
        distributed least())."""
        from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], ["doc_a", "doc_b"]
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_threshold_selects_tier(self, spark):
        from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame([(1, 2), (3, 4)], ["doc_a", "doc_b"])
        s = {}
        connected_components(pairs, stats=s, driver_edge_threshold=3).collect()
        # 4 symmetrized edges > 3 -> distributed
        assert s["tier"] == "distributed"
        s = {}
        connected_components(pairs, stats=s, driver_edge_threshold=4).collect()
        assert s["tier"] == "driver-unionfind"


class TestTableMemoEviction:
    def test_stale_app_entries_evicted_on_new_context_id(self, spark):
        """ADVICE r9 (tables.py:30): entries keyed by a dead
        applicationId must be dropped the first time a different
        context loads a table, so py4j references to stopped JVMs never
        accumulate across restarts in one process."""
        from real___time_fraud_detection_using_apache_kafka_spark.sources import tables

        # prime the memo under the live context
        tables.load_table(spark, "/root/testdata/sf0.001", "region")
        live_app = spark.sparkContext.applicationId
        assert any(k[0] == live_app for k in tables._TABLE_MEMO)
        # simulate a prior context's leftovers + observation of a restart
        tables._TABLE_MEMO[("dead-app-123", "/root/testdata/sf0.001", "region")] = (
            object()
        )
        tables._MEMO_APP_ID[0] = "dead-app-123"
        tables.load_table(spark, "/root/testdata/sf0.001", "nation")
        assert not any(k[0] == "dead-app-123" for k in tables._TABLE_MEMO)
        assert tables._MEMO_APP_ID[0] == live_app
        # live entries re-memoize normally
        d1 = tables.load_table(spark, "/root/testdata/sf0.001", "nation")
        d2 = tables.load_table(spark, "/root/testdata/sf0.001", "nation")
        assert d1 is d2
