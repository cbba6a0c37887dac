"""ALS recommender: factorization quality on a PLANTED low-rank
preference structure (ground truth known by construction), plus the
purchase-matrix build and the flattened recommendation shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.ml.recommend import (
    fit_als,
    purchase_counts,
    recommend_parts,
)


@pytest.fixture(scope="module")
def planted(spark):
    """Two disjoint taste clusters: users 0-19 buy items 0-9 heavily,
    users 20-39 buy items 10-19; two cross-cluster purchases of noise.
    A rank-2 structure any working factorizer must recover."""
    rows = []
    for u in range(20):
        for i in range(10):
            if (u + i) % 3 != 0:  # sparsity: ~2/3 of cells observed
                rows.append((u, i, 3))
    for u in range(20, 40):
        for i in range(10, 20):
            if (u + i) % 3 != 0:
                rows.append((u, i, 3))
    rows += [(0, 15, 1), (25, 3, 1)]  # noise
    return spark.createDataFrame(rows, "custkey int, partkey int, n int")


class TestAlsRecommender:
    def test_recovers_planted_clusters(self, spark, planted):
        model = fit_als(planted, rank=4, max_iter=10, seed=7)
        recs = recommend_parts(model, k=3)
        by_user = {
            r.custkey: r.partkey
            for r in recs.filter(F.col("rank") == 1).collect()
        }
        # every user's TOP recommendation must come from their own
        # cluster's item block
        wrong = [
            (u, i) for u, i in by_user.items()
            if (u < 20) != (i < 10)
        ]
        assert not wrong, f"cross-cluster top recs: {wrong}"

    def test_unseen_in_cluster_items_rank_above_cross_cluster(
        self, spark, planted
    ):
        """The point of CF: items a user never touched but their cluster
        loves must outscore the other cluster's items."""
        model = fit_als(planted, rank=4, max_iter=10, seed=7)
        uf = model.userFactors
        itf = model.itemFactors
        # user 1 never bought item 2 ((1+2)%3==0 -> unobserved cell)
        scores = (
            uf.filter(F.col("id") == 1).crossJoin(
                itf.select(F.col("id").alias("item"),
                           F.col("features").alias("ifeat"))
            )
            .select(
                "item",
                F.aggregate(
                    F.zip_with("features", "ifeat", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("s"),
            )
        )
        got = {r.item: r.s for r in scores.collect()}
        assert got[2] > max(got[i] for i in range(10, 20))

    def test_determinism_same_seed(self, spark, planted):
        a = recommend_parts(fit_als(planted, seed=7), k=2)
        b = recommend_parts(fit_als(planted, seed=7), k=2)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_purchase_counts_shape(self, spark, sf_dir):
        from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

        pc = purchase_counts(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "orders"),
        )
        assert pc.columns == ["custkey", "partkey", "n"]
        row = pc.agg(F.min("n").alias("lo"), F.count("*").alias("k")).first()
        assert row.lo >= 1 and row.k > 0


class TestAlsHalfStep:
    """Exact HKV half-step vs an independent numpy solve of the same
    normal equations — the closed form the ``als_half_step_factors``
    oracle pins cross-engine must also agree with plain linear algebra."""

    def test_matches_numpy_solve(self, spark):
        import numpy as np

        from real___time_fraud_detection_using_apache_kafka_spark.ml.recommend import (
            als_half_step_users,
            deterministic_item_factors,
        )

        items = spark.createDataFrame(
            [(k,) for k in range(1, 21)], "p_partkey long"
        )
        ratings = spark.createDataFrame(
            [(1, 2, 3), (1, 5, 1), (2, 7, 2), (2, 2, 4), (3, 19, 1)],
            "custkey long, partkey long, n long",
        )
        yf = deterministic_item_factors(items)
        got = {
            r.custkey: (r.x1, r.x2, r.n_items)
            for r in als_half_step_users(ratings, yf, alpha=10).collect()
        }
        y = {
            r.partkey: np.array([float(r.y1), float(r.y2)])
            for r in yf.collect()
        }
        yty = sum(np.outer(v, v) for v in y.values())
        obs = {}
        for u, i, n in [(1, 2, 3), (1, 5, 1), (2, 7, 2), (2, 2, 4), (3, 19, 1)]:
            obs.setdefault(u, []).append((i, n))
        for u, pairs in obs.items():
            a = yty + 0.1 * np.eye(2)
            b = np.zeros(2)
            for i, n in pairs:
                a += 10 * n * np.outer(y[i], y[i])
                b += (1 + 10 * n) * y[i]
            x = np.linalg.solve(a, b)
            assert got[u][2] == len(pairs)
            assert abs(got[u][0] - x[0]) < 1e-5, (u, got[u], x)
            assert abs(got[u][1] - x[1]) < 1e-5, (u, got[u], x)

    def test_item_factors_in_unit_interval(self, spark):
        from real___time_fraud_detection_using_apache_kafka_spark.ml.recommend import (
            deterministic_item_factors,
        )

        yf = deterministic_item_factors(
            spark.range(1, 1000).withColumnRenamed("id", "p_partkey")
        )
        row = yf.agg(
            F.min(F.least("y1", "y2")).alias("lo"),
            F.max(F.greatest("y1", "y2")).alias("hi"),
            F.countDistinct("y1").alias("d1"),
        ).first()
        assert float(row.lo) > 0.0 and float(row.hi) <= 1.0
        assert row.d1 > 900  # hash spread: factors are not degenerate

    def test_half_step_survives_many_parts(self, spark):
        """Regression (round-7 ADVICE): with the old DECIMAL(18,12)
        accumulators, sum(y*y) over >~3e6 parts overflowed the 6
        integer digits — Spark (non-ANSI) yields NULL, det goes NULL,
        and ``filter(det != 0.0)`` silently emptied the result.  The
        (32,12) layout must keep the solve finite at 4M parts."""
        from real___time_fraud_detection_using_apache_kafka_spark.ml.recommend import (
            als_half_step_users,
            deterministic_item_factors,
        )

        items = spark.range(1, 4_000_001).withColumnRenamed(
            "id", "p_partkey"
        )
        ratings = spark.createDataFrame(
            [(1, 2, 3), (1, 5, 1), (2, 7, 2)],
            "custkey long, partkey long, n long",
        )
        yf = deterministic_item_factors(items)
        rows = als_half_step_users(ratings, yf, alpha=10).collect()
        assert len(rows) == 2  # nothing silently dropped
        for r in rows:
            assert r.x1 is not None and r.x2 is not None
            assert abs(r.x1) < 1.0 and abs(r.x2) < 1.0  # ridge-bounded
