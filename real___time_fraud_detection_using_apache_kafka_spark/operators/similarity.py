"""Similarity search over embedding columns (driver-mandated extension).

- Brute-force cosine top-k: the correctness baseline.  The dot product is
  a higher-order-function fold over the zipped arrays — pure JVM, and the
  accumulation order is the array order, so the DuckDB oracle (same fold)
  matches bit-for-bit.
- LSH-bucketed variant: random-hyperplane signs as the blocking key; at
  scale the candidate join is an equi-join on the bucket, not a cartesian.

Scale notes: brute-force is O(Q x N) — fine when Q (probe set) is small
and broadcastable; the LSH path is the 100 TB strategy (bucket key caps
pair count; recall tuned by number of hyperplanes/tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (IEEE-stable
    and oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is broadcast (small probe set); the candidate scan is
    never shuffled — each partition scores its local candidates and the
    per-query top-k reduces via a window on the (small) scored result.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    from .windows import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k,
        rank_col="rank",
    )


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.45,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Local-scale implementation is the exact all-pairs join; the scale path
    is :func:`hyperplane_lsh_pairs` which blocks by sign-bucket first.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def ivf_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k: the 100 TB scale path for
    similarity search.

    Index build: seeded MLlib KMeans partitions the candidate set into
    ``n_centroids`` cells; each candidate is stored under its nearest
    centroid (one narrow transform — the "inverted file").
    Probe: each query scores only candidates in its ``n_probe`` nearest
    cells, so the scored fraction is ~n_probe/n_centroids of the corpus
    instead of all of it; the cell match is an EQUI-join on centroid id
    that shuffles by cell.  ``n_probe = n_centroids`` degrades gracefully
    to exact brute force (the property the tests pin).

    Centroids are tiny (n_centroids x dim floats) — they ride along as a
    broadcast literal, never a shuffle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    cand_vec = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features",
                predictionCol="cell")
    model = km.fit(cand_vec)
    indexed = model.transform(cand_vec).select("neighbor_id", "cv", "cell")

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = candidates.sparkSession
    cent_df = spark.createDataFrame(centroids, ["cell", "centroid"])

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # rank the (tiny, broadcast) centroid table per query; keep n_probe cells
    q_cells = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("dist", -cosine(F.col("qv"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cell"))
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = q_cells.join(indexed, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    from .windows import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k,
        rank_col="rank",
    )


def hyperplane_lsh_pairs(embeddings: DataFrame, threshold: float = 0.45,
                         n_planes: int = 8, seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH near-dup: bucket by the sign pattern of
    ``n_planes`` fixed random projections, equi-join on bucket, verify
    exact cosine.  Deterministic: hyperplanes come from a seeded NumPy RNG
    broadcast as literal arrays."""
    import numpy as np

    dim_row = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def sign_bits(vec: Column) -> Column:
        bits = []
        for p in planes:
            plane = F.array(*[F.lit(float(x)) for x in p])
            bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    tagged = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        sign_bits(F.col(vec_col)).alias("bucket"),
    )
    a = tagged.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = tagged.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    cand = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return cand.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
