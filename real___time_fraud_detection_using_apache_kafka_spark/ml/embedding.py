"""Embedding dimensionality reduction (training-data extension; the
reference has no embedding surface — this extends the driver-mandated
similarity-search tier in operators/similarity.py).

``pca_reduce`` fits MLlib PCA over an ``array<float>`` embedding column;
``pca_ivf_topk`` composes the standard large-scale ANN recipe:

    PCA-reduce -> IVF cell probe in the cheap reduced space
               -> exact cosine re-rank of the shortlist in full space

At 100 TB the win is twofold: KMeans Lloyd iterations and cell-probe
scoring run on ``pca_k`` dims instead of the full width (a ~dim/pca_k
FLOP cut on the corpus-sized stages), while final scores stay
full-precision because only the oversampled shortlist (O(queries ×
k·oversample), corpus-independent) touches the original vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import _cosine_pre, ivf_topk, norm
from ..operators.windows import topk_per_group

__all__ = ["pca_reduce", "pca_ivf_topk"]


def pca_reduce(df: DataFrame, k: int = 16, id_col: str = "vec_id",
               vec_col: str = "embedding", model=None):
    """Project an embedding column to its top-``k`` principal components.

    Returns ``(reduced_df, fitted_model)``; pass ``model`` to transform a
    second frame (queries) with the components fitted on the first
    (candidates) — both sides must live in the SAME reduced basis.
    PCA is deterministic (no seed): repeated fits give identical
    components up to sign, and a shared fitted model makes even the sign
    consistent across sides.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(
        id_col,
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        ),
    )
    if model is None:
        model = PCA(k=k, inputCol="features", outputCol="pca").fit(feats)
    reduced = model.transform(feats).select(
        id_col, vector_to_array(F.col("pca")).alias(vec_col)
    )
    return reduced, model


def pca_ivf_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
                 pca_k: int = 16, oversample: int = 3,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_rows: int | None = None, **ivf_kwargs) -> DataFrame:
    """Approximate top-k with exact final scores: IVF shortlist in PCA
    space, cosine re-rank in the original space.

    Output schema matches ``brute_force_topk``/``ivf_topk``
    (query_id, neighbor_id, cosine, rank) so callers can swap tiers.
    """
    from ..operators.similarity import empty_topk

    # a caller-provided row count replaces the isEmpty() guard job
    # (PCA cannot fit zero rows)
    if n_rows == 0 or (n_rows is None and candidates.isEmpty()):
        return empty_topk(candidates, id_col)
    red_c, model = pca_reduce(candidates, pca_k, id_col, vec_col)
    red_q, _ = pca_reduce(queries, pca_k, id_col, vec_col, model=model)
    shortlist = ivf_topk(
        red_q, red_c, k=k * oversample, id_col=id_col, vec_col=vec_col,
        n_rows=n_rows, **ivf_kwargs,
    ).select("query_id", "neighbor_id")

    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    cv = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    exact = (
        shortlist.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cosine_pre(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    return topk_per_group(
        exact, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k,
        rank_col="rank",
    )
