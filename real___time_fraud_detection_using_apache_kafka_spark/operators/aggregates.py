"""Aggregation operators (SURVEY.md §2.5: A1-A13).

The reference computed all of these with in-memory pandas/sklearn over the
full dataset on every dashboard tick (FD/evaluation.py:97-179).  Here each
is a distributed aggregation: map-side partial aggregation runs before the
shuffle, so at 100 TB the shuffled data volume is O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def deterministic_mode(df: DataFrame, group_cols: list[str], value_col: str,
                       out_col: str = "mode_value") -> DataFrame:
    """Most frequent ``value_col`` per group (A6, FD/evaluation.py:170,172).

    Spark 3.4's ``mode()`` breaks ties arbitrarily; for oracle-comparable
    results ties break on the smaller value.  Two-stage aggregation: the
    (group, value) count is a partial-aggregable groupBy, then a size-
    |groups x values| window picks the winner — skew-safe because the
    heavy first stage combines map-side.
    """
    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("_cnt"))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("_cnt"), F.asc(value_col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, F.col(value_col).alias(out_col))
    )


def confusion_cells(df: DataFrame, actual: Column, predicted: Column) -> DataFrame:
    """2x2 confusion counts (A8, FD/model.py:132-133) as a 1-row frame.

    ``sum(when(...))`` keeps it a single full aggregation — no shuffle of
    raw rows, only one partial-agg per partition.
    """
    a = actual.cast("int")
    p = predicted.cast("int")
    return df.agg(
        F.sum(((a == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((a == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((a == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((a == 0) & (p == 0)).cast("long")).alias("tn"),
    )


def classification_metrics(cells: DataFrame, decimals: int = 6) -> DataFrame:
    """Metric battery from confusion cells (A9/A10/A12, FD/model.py:131-144).

    Pure column arithmetic over the 1-row cells frame — accuracy, weighted
    precision/recall are derivable, plus the metrics MLlib has no evaluator
    for: specificity, FPR, FNR, Matthews correlation coefficient.
    """
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    total = tp + fp + fn + tn
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    mcc_den = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    r = lambda c: F.round(c, decimals)  # noqa: E731
    return cells.select(
        F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn"),
        r((tp + tn) / total).alias("accuracy"),
        r(precision).alias("precision"),
        r(recall).alias("recall"),
        r(2 * precision * recall / (precision + recall)).alias("f1"),
        r(tn / (tn + fp)).alias("specificity"),
        r(fp / (fp + tn)).alias("fpr"),
        r(fn / (fn + tp)).alias("fnr"),
        r((tp * tn - fp * fn) / mcc_den).alias("mcc"),
    )


def log_loss(df: DataFrame, label: Column, proba: Column, eps: float = 1e-7) -> DataFrame:
    """Mean negative log-likelihood (A13, FD/model.py:145), clamped like
    sklearn's ``log_loss`` to avoid log(0)."""
    p = F.least(F.greatest(proba, F.lit(eps)), F.lit(1.0 - eps))
    y = label.cast("double")
    return df.agg(
        F.round(F.avg(-(y * F.log(p) + (1 - y) * F.log1p(-p))), 6).alias("log_loss")
    )
