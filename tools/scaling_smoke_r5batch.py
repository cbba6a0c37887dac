"""Scaling smoke for the round-5 batch-2 families (VERDICT r5 item 6):
times `purchase_attribution`, `rolling_7d_active_users` (events tables
of 1M/10M/100M rows) and `price_elasticity_by_brand` (lineitem tables
of the same sizes) — confirming the SCALE.md claims: linear with one
key-partitioned shuffle for attribution, linear ×7 day-expansion for
the sliding distinct, and a single broadcast-join + hash-agg for the
grouped OLS.

Usage: python tools/scaling_smoke_r5batch.py [sizes...]
Prints a markdown table for SCALE.md; per-query progress on stderr.
The synthetic tables are written to a temp dir so the REGISTERED
catalog queries run against them unchanged.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark
from tools.scaling_smoke_events import synth_events

EVENT_OPS = ["purchase_attribution", "rolling_7d_active_users"]
LINEITEM_OPS = ["price_elasticity_by_brand"]


def synth_lineitem_part(spark, n: int, seed: int = 23):
    """(lineitem, part) pair: n lineitem rows over n/50 parts, 25
    brands, positive prices/quantities (the elasticity domain)."""
    n_parts = max(200, n // 50)
    li = spark.range(n).select(
        F.col("id").alias("l_orderkey"),
        F.pmod(F.hash(F.col("id"), F.lit(seed)).cast("long"),
               F.lit(n_parts)).alias("l_partkey"),
        (F.pmod(F.hash(F.col("id"), F.lit(seed + 1)).cast("long"),
                F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(
            (F.pmod(F.hash(F.col("id"), F.lit(seed + 2)).cast("long"),
                    F.lit(90_000)) + 1000).cast("double") / 100.0
            * (F.pmod(F.hash(F.col("id"), F.lit(seed + 1)).cast("long"),
                      F.lit(50)) + 1).cast("double"),
            2,
        ).alias("l_extendedprice"),
    )
    part = spark.range(n_parts).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.lit("Brand#"),
            (F.pmod(F.hash(F.col("id"), F.lit(seed + 3)), F.lit(5)) + 1),
            (F.pmod(F.hash(F.col("id"), F.lit(seed + 4)), F.lit(5)) + 1),
        ).alias("p_brand"),
    )
    return li, part


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000, 100_000_000]
    spark = get_spark("scaling-smoke-r5batch")
    ops = EVENT_OPS + LINEITEM_OPS
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="r5b_smoke_")
        try:
            t0 = time.time()
            synth_events(spark, n).write.mode("overwrite").parquet(
                f"{d}/events.parquet"
            )
            li, part = synth_lineitem_part(spark, n)
            li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
            part.write.mode("overwrite").parquet(f"{d}/part.parquet")
            gen_s = time.time() - t0
            timings = {}
            for op in ops:
                spark.catalog.clearCache()
                t0 = time.time()
                cnt = QUERIES[op].fn(spark, d).count()
                timings[op] = time.time() - t0
                print(f"# n={n:>11,} {op}: {cnt} rows in {timings[op]:.2f}s",
                      file=sys.stderr)
            rows.append((n, gen_s, timings))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print("| rows | gen+write | " + " | ".join(o.replace("_", " ") for o in ops)
          + " |")
    print("|---" * (len(ops) + 2) + "|")
    for n, gen_s, t in rows:
        cells = " | ".join(f"{t[o]:.2f} s" for o in ops)
        print(f"| {n/1e6:g}M | {gen_s:.1f} s | {cells} |")


if __name__ == "__main__":
    main()
