"""Rank-machinery scaling smoke: times the round-4 distributed-rank /
prefix-sum operators on synthetic inputs of increasing size — the local
stand-in for "does the global-order machinery survive 10×?", and the
direct A/B against the single-partition-window plans they replaced.

Usage: python tools/scaling_smoke_rank.py [sizes...]
Prints a markdown table for SCALE.md (per-op seconds, median of 3).

Three ops per size n:
- ``global_rank``     — exact total order of n rows via
  ``bucketed_global_rank`` (256 md5-prefix buckets), the
  shuffle_training_order shape;
- ``rank_1part``      — the same total order via one unpartitioned
  ``row_number`` window (the replaced plan), for contrast;
- ``prefix_sum``      — ``exclusive_prefix_sum`` over n DISTINCT keys
  (the roc_auc/ks shape at adversarial cardinality: every row its own
  score — the case the single-partition window cannot survive).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
    bucketed_global_rank,
    exclusive_prefix_sum,
)
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def keyed(spark, n: int):
    return spark.range(n).select(
        F.col("id"),
        F.md5(F.concat(F.col("id").cast("string"), F.lit(":42"))).alias("k"),
    )


def scored(spark, n: int):
    # every row a distinct score in [0, 1): worst case for any
    # "window over distinct scores" plan
    return spark.range(n).select(
        (F.pmod(F.hash(F.col("id")), F.lit(1_000_000_007)).cast("double")
         / 1_000_000_007).alias("p"),
        F.pmod(F.col("id"), F.lit(2)).cast("long").alias("y"),
    )


def global_rank(spark, n: int) -> int:
    df = keyed(spark, n)
    bucket = F.conv(F.substring("k", 1, 2), 16, 10).cast("int")
    out = bucketed_global_rank(df, bucket, [F.asc("k"), F.asc("id")],
                               rank_col="rnk")
    return out.agg(F.max("rnk")).collect()[0][0]


def rank_1part(spark, n: int) -> int:
    df = keyed(spark, n)
    out = df.withColumn("rnk", F.row_number().over(Window.orderBy("k", "id")))
    return out.agg(F.max("rnk")).collect()[0][0]


def prefix_sum(spark, n: int) -> int:
    by_p = scored(spark, n).groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    pre = exclusive_prefix_sum(by_p, "p", ["cnt"], grand_cols=["cnt"])
    return pre.agg(F.max(F.col("cnt_before") + F.col("cnt"))).collect()[0][0]


OPS = [("global_rank", global_rank), ("rank_1part", rank_1part),
       ("prefix_sum", prefix_sum)]


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000,
                                               100_000_000]
    spark = get_spark("scaling-smoke-rank")
    rows = []
    for n in sizes:
        timings = {}
        for name, fn in OPS:
            if name == "rank_1part" and n > 20_000_000:
                # the contrast plan funnels every row through ONE task;
                # past ~20M that is minutes of single-threaded sort —
                # which is the point, so skip rather than wait it out
                timings[name] = None
                continue
            fn(spark, n)  # codegen warm-up
            ts = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.time()
                got = fn(spark, n)
                ts.append(time.time() - t0)
            assert got == n, (name, n, got)
            ts.sort()
            timings[name] = ts[1]
            print(f"# n={n:>11,} {name}: {ts[1]:.2f}s {ts}", file=sys.stderr)
        rows.append((n, timings))
    print("| rows | " + " | ".join(name for name, _ in OPS) + " |")
    print("|---" * (len(OPS) + 1) + "|")
    for n, t in rows:
        cells = " | ".join(
            "skipped" if t[name] is None else f"{t[name]:.2f} s"
            for name, _ in OPS
        )
        print(f"| {n/1e6:g}M | {cells} |")


if __name__ == "__main__":
    main()
