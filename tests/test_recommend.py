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
