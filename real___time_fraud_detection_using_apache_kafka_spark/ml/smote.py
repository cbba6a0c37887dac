"""Distributed SMOTE-equivalent oversampling (M5, FD/model.py:102-104).

sklearn/imblearn SMOTE interpolates each minority sample toward one of its
k nearest minority neighbors.  A faithful distributed version (SURVEY.md
§7 hard-part 1) in two fidelity tiers:

- :func:`oversample_minority` — replicate-with-jitter-free duplication to
  an exact target ratio.  Cheap (one count + one union of a resampled
  scan), preserves the class-balance effect of SMOTE, which is what the
  downstream ``scale_pos_weight``/class-weight models actually consume.
- :func:`smote_interpolated` — true synthetic interpolation: minority
  rows are bucketed by hyperplane LSH over the numeric features, paired
  with a bucket-mate (approximate nearest neighbor), and new rows are
  drawn at seeded-uniform points on the connecting segment.  All joins
  are equi-joins on the bucket key — no cross join, no driver collect.

Both are deterministic given ``seed`` (Spark ``rand(seed)`` streams are
task-stable under AQE-fixed partitioning of a cached input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def class_counts(df: DataFrame, label_col: str) -> dict[int, int]:
    rows = df.groupBy(label_col).agg(F.count("*").alias("n")).collect()
    return {int(r[label_col]): int(r["n"]) for r in rows}


def oversample_minority(df: DataFrame, label_col: str = "is_fraud",
                        target_ratio: float = 1.0, seed: int = 42) -> DataFrame:
    """Duplicate minority rows (sampling with replacement) until
    minority/majority ~= ``target_ratio``.  The balanced-table analog of
    SMOTE without synthesis — appropriate when the model consumes weights
    or tree splits (duplicates are equivalent to weights there)."""
    counts = class_counts(df, label_col)
    if len(counts) < 2:
        return df
    minority = min(counts, key=counts.get)
    majority = max(counts, key=counts.get)
    need = counts[majority] * target_ratio - counts[minority]
    if need <= 0:
        return df
    frac = need / counts[minority]
    extra = df.filter(F.col(label_col) == minority).sample(
        withReplacement=True, fraction=float(frac), seed=seed
    )
    return df.unionByName(extra)


def smote_interpolated(df: DataFrame, numeric_cols: list[str],
                       label_col: str = "is_fraud", minority_label: int = 1,
                       n_synthetic_per_row: int = 1, n_planes: int = 6,
                       seed: int = 42) -> DataFrame:
    """Synthesize minority rows by interpolating toward an approximate
    nearest minority neighbor (hyperplane-LSH bucket mate).

    new = x + u * (neighbor - x),  u ~ Uniform(0, 1) seeded

    Non-numeric columns are copied from the seed row (imblearn's
    SMOTE-NC behavior for categoricals).  Output = input rows + synthetic
    rows (synthetic rows carry the minority label).
    """
    import numpy as np

    minority = df.filter(F.col(label_col) == minority_label)
    # seeded random hyperplanes over standardized features -> sign bucket
    stats = minority.select(
        *[F.avg(c).alias(f"m_{c}") for c in numeric_cols],
        *[F.coalesce(F.stddev(c), F.lit(1.0)).alias(f"s_{c}") for c in numeric_cols],
    ).collect()[0]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, len(numeric_cols)))
    std = [
        (F.col(c) - F.lit(float(stats[f"m_{c}"])))
        / F.lit(float(stats[f"s_{c}"]) or 1.0)
        for c in numeric_cols
    ]
    bucket_bits = [
        F.when(
            sum(F.lit(float(p[i])) * std[i] for i in range(len(numeric_cols))) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    tagged = minority.withColumn("_bucket", F.concat(*bucket_bits))
    # neighbor = next row in a stable in-bucket ordering (ring within the
    # bucket) — an equi-self-join on the bucket key, never a cross join
    w = Window.partitionBy("_bucket").orderBy(F.xxhash64(*numeric_cols))
    pos = tagged.withColumn("_pos", F.row_number().over(w))
    sizes = tagged.groupBy("_bucket").agg(F.count("*").alias("_bn"))
    pos = pos.join(F.broadcast(sizes), "_bucket").filter(F.col("_bn") >= 2)
    nbr = pos.select(
        "_bucket",
        (F.col("_pos") % F.col("_bn") + 1).alias("_pos"),
        *[F.col(c).alias(f"_nb_{c}") for c in numeric_cols],
    )
    paired = pos.join(nbr, ["_bucket", "_pos"])
    synth = paired
    for _ in range(n_synthetic_per_row - 1):
        synth = synth.unionByName(paired)
    u = F.rand(seed)
    out_cols = []
    for c in df.columns:
        if c in numeric_cols:
            out_cols.append(
                (F.col(c) + u * (F.col(f"_nb_{c}") - F.col(c))).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    synthetic = synth.select(*out_cols)
    return df.unionByName(synthetic)
