"""Collaborative-filtering recommendations (MLlib ALS) over the
co-purchase signal — the "customers who bought X also bought" surface
the reference's dashboard hints at but never computes
(FD/dashboard.py top-fraud panels are frequency rankings only).

Scale design: ALS is the canonical distributed factorizer — ratings
shuffle into (user-block × item-block) pairs, each least-squares solve
touches one block row, and factors are O((|users| + |items|) × rank).
The implicit-feedback variant (Hu-Koren-Volinsky) fits purchase counts
— no explicit ratings exist in a transaction log.  Everything below is
deterministic for a fixed ``seed``/``rank``/``maxIter`` on the same
data, which the tests rely on; recommendations themselves are
rows-only checkable (factorization has no SQL oracle).
"""

from __future__ import annotations

from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_counts(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Implicit-feedback matrix: (customer, part, n_purchases) from the
    order log — one join to attach custkey, one hash aggregate."""
    return (
        lineitem.select("l_orderkey", "l_partkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.count("*").alias("n"))
    )


def fit_als(ratings: DataFrame, rank: int = 8, max_iter: int = 8,
            reg: float = 0.1, alpha: float = 10.0, seed: int = 42) -> ALSModel:
    """Implicit-preference ALS on (custkey, partkey, n) counts.

    ``coldStartStrategy="drop"`` keeps scoring NaN-free under splits —
    the standard eval-safe setting."""
    als = ALS(
        userCol="custkey", itemCol="partkey", ratingCol="n",
        implicitPrefs=True, rank=rank, maxIter=max_iter, regParam=reg,
        alpha=alpha, seed=seed, coldStartStrategy="drop",
        numUserBlocks=8, numItemBlocks=8,
    )
    return als.fit(ratings)


def recommend_parts(model: ALSModel, k: int = 5) -> DataFrame:
    """Top-k part recommendations per customer, flattened to
    (custkey, rank, partkey, score) rows — ``recommendForAllUsers`` is
    the blocked factor-product MLlib distributes; never a cross join."""
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "custkey",
        F.posexplode("recommendations").alias("rank0", "rec"),
    ).select(
        "custkey",
        (F.col("rank0") + 1).alias("rank"),
        F.col("rec.partkey").alias("partkey"),
        F.col("rec.rating").cast("double").alias("score"),
    )
