"""Window / sort / top-k operators (SURVEY.md §2.6: W1-W4) and the
rank-based curve metrics (A11 ROC-AUC, A14 PR-curve threshold).

Scale notes
-----------
- ``topk`` uses ``orderBy().limit(k)``: Catalyst plans TakeOrderedAndProject,
  a per-partition heap + driver merge — no global sort shuffle.
- ``topk_per_group`` is a single window over one shuffle by the group key;
  AQE skew-split handles hot groups.
- The curve metrics first aggregate to one row **per distinct score** before
  any window — the window input is O(|distinct scores|), not O(rows), so a
  100 TB scored stream with bounded score cardinality windows cheaply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """W1/W3: global top-k (FD/dashboard.py:24, FD/model.py:183)."""
    return df.orderBy(*order_cols).limit(k)


def topk_per_group(df: DataFrame, part_cols: Sequence[str],
                   order_cols: Sequence[Column], k: int,
                   rank_col: str = "rnk") -> DataFrame:
    """Per-group top-k via row_number (dense alternative to W1 tail-N)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def latest_per_group(df: DataFrame, part_cols: Sequence[str],
                     order_cols: Sequence[Column]) -> DataFrame:
    """W2: most-recent row per group (FD/dashboard.py:156-162)."""
    return topk_per_group(df, part_cols, order_cols, 1).drop("rnk")


def roc_auc(df: DataFrame, label: Column, proba: Column) -> DataFrame:
    """A11 (FD/model.py:140): ROC AUC via the Mann-Whitney rank statistic
    with average ranks for ties — exactly sklearn's trapezoidal AUC.

    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), where R_pos is the
    sum of average ranks of positive examples under ascending score order.
    """
    scored = df.select(label.cast("long").alias("y"), proba.alias("p"))
    # One row per distinct score -> tiny window input.
    by_p = scored.groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_p.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    # average rank of every row tied at this score
    ranked = ranked.withColumn("avg_rank", F.col("below") + (F.col("cnt") + 1) / 2.0)
    return ranked.agg(
        F.round(
            (F.sum(F.col("avg_rank") * F.col("pos"))
             - F.sum("pos") * (F.sum("pos") + 1) / 2.0)
            / (F.sum("pos") * (F.sum("cnt") - F.sum("pos"))),
            6,
        ).alias("roc_auc")
    )


def pr_curve_best_threshold(df: DataFrame, label: Column, proba: Column) -> DataFrame:
    """A14 (FD/evaluation.py:91-95,139-140): precision/recall over descending
    score thresholds; returns the F1-argmax threshold row.

    Cumulative TP/FP come from a running sum over scores sorted descending —
    the same computation sklearn's ``precision_recall_curve`` does, on one
    row per distinct score.  Ties in F1 break toward the higher threshold
    (deterministic for the oracle comparison).
    """
    scored = df.select(label.cast("long").alias("y"), proba.alias("p"))
    by_p = scored.groupBy("p").agg(F.count("*").alias("cnt"), F.sum("y").alias("pos"))
    w = Window.orderBy(F.desc("p")).rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        by_p.withColumn("tp", F.sum("pos").over(w))
        .withColumn("predicted_pos", F.sum("cnt").over(w))
    )
    totals = scored.agg(F.sum("y").cast("double").alias("npos"))
    curve = cum.crossJoin(F.broadcast(totals)).select(
        F.col("p").alias("threshold"),
        (F.col("tp") / F.col("predicted_pos")).alias("precision"),
        (F.col("tp") / F.col("npos")).alias("recall"),
    ).withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )
    best = curve.orderBy(F.desc("f1"), F.desc("threshold")).limit(1)
    return best.select(
        F.col("threshold"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )
