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


def exclusive_prefix_sum(by_p: DataFrame, order_col: str, sum_cols: Sequence[str],
                         descending: bool = False, n_buckets: int = 1024,
                         bounds: tuple[float, float] = (0.0, 1.0)) -> DataFrame:
    """Distributed exclusive prefix sums over ``by_p`` ordered by
    ``order_col`` — each ``c`` in ``sum_cols`` gains a ``{c}_before`` column
    holding the sum of ``c`` over all STRICTLY-preceding rows.

    Scale design: an unpartitioned ``Window.orderBy`` collapses the whole
    input to one partition.  Instead the order column is quantized into
    ``n_buckets`` deterministic buckets (driver-known ``bounds``, no data
    sampling -> reproducible under task retry, unlike repartitionByRange):

      1. in-bucket running sums  — window PARTITIONED by bucket,
      2. per-bucket totals       — one row per bucket (<= n_buckets rows),
         prefix-summed with a cheap single-partition window,
      3. exclusive prefix = bucket offset + in-bucket running sum.

    Shuffle cost: one hash shuffle on the bucket key + one n_buckets-row
    window — O(distinct values) data, never a single-partition sort of the
    full input.
    """
    lo, hi = bounds
    span = hi - lo
    raw = (F.col(order_col) - F.lit(lo)) / F.lit(span) * n_buckets
    bucket = F.least(
        F.greatest(F.floor(raw), F.lit(0)), F.lit(n_buckets - 1)
    ).alias("_bucket")
    df = by_p.select("*", bucket)
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    bucket_order = F.col("_bucket").desc() if descending else F.col("_bucket").asc()
    in_bucket = (
        Window.partitionBy("_bucket").orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for c in sum_cols:
        df = df.withColumn(
            f"_local_{c}", F.coalesce(F.sum(c).over(in_bucket), F.lit(0))
        )
    totals = df.groupBy("_bucket").agg(
        *[F.sum(c).alias(f"_tot_{c}") for c in sum_cols]
    )
    across = (
        Window.orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        *[
            F.coalesce(F.sum(f"_tot_{c}").over(across), F.lit(0)).alias(f"_off_{c}")
            for c in sum_cols
        ],
    )
    joined = df.join(F.broadcast(offsets), "_bucket")
    for c in sum_cols:
        joined = joined.withColumn(
            f"{c}_before", F.col(f"_off_{c}") + F.col(f"_local_{c}")
        )
    drop = ["_bucket"] + [f"_local_{c}" for c in sum_cols] + [f"_off_{c}" for c in sum_cols]
    return joined.drop(*drop)


def roc_auc(df: DataFrame, label: Column, proba: Column) -> DataFrame:
    """A11 (FD/model.py:140): ROC AUC via the Mann-Whitney rank statistic
    with average ranks for ties — exactly sklearn's trapezoidal AUC.

    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), where R_pos is the
    sum of average ranks of positive examples under ascending score order.
    Runs on one row per distinct score with a bucketed distributed prefix
    sum — no single-partition window at any input size.
    """
    scored = df.select(label.cast("long").alias("y"), proba.alias("p"))
    # one row per DISTINCT score; persisted because the bucketed prefix
    # sum consumes it twice (local sums + bucket offsets) — without the
    # persist the full input scan+aggregate runs twice (plan-pinned)
    by_p = scored.groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    ).persist()
    ranked = exclusive_prefix_sum(by_p, "p", ["cnt"]).withColumnRenamed(
        "cnt_before", "below"
    )
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
    # persisted for the same two-consumer reason as roc_auc, plus the
    # positives total derives from it via an unpartitioned window over
    # the distinct-score rows — never a second scan of the input
    by_p = scored.groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    ).persist()
    # inclusive descending cumulative = exclusive prefix (bucketed,
    # distributed — no single-partition window) + the row's own value
    pre = exclusive_prefix_sum(by_p, "p", ["cnt", "pos"], descending=True)
    cum = (
        pre.withColumn("tp", F.col("pos_before") + F.col("pos"))
        .withColumn("predicted_pos", F.col("cnt_before") + F.col("cnt"))
    )
    npos = F.sum("pos").over(Window.partitionBy()).cast("double")
    curve = cum.select(
        F.col("p").alias("threshold"),
        (F.col("tp") / F.col("predicted_pos")).alias("precision"),
        (F.col("tp") / npos).alias("recall"),
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
