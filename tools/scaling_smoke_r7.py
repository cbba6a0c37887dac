"""Scaling smoke for the round-7 additions: `hll_set_algebra` over
synthetic event streams, and the two ALS half-steps over synthetic
rating matrices.

Claims under test:

- `hll_set_algebra` is two hash aggregates whose state is O(cells)
  (segment cells + union cells) — linear with the scan, like the rest
  of the round-6 sketch suite.
- `als_half_step_{factors,items}` are one fact join + one keyed hash
  aggregate + a 1-row Gram broadcast — linear with the rating count,
  no per-user/item rescans, and the DECIMAL(32,12) accumulators hold
  far beyond the old (18,12) overflow point (~3e6 parts, TPC-H SF 15),
  which this smoke crosses deliberately at the 30M rung (6M parts).

Usage: python tools/scaling_smoke_r7.py [sizes...]
Prints a markdown table for SCALE.md; per-query progress on stderr.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import release_tracked
from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark
from tools.scaling_smoke_events import synth_events


def synth_ratings(spark, n: int, seed: int = 23):
    """lineitem/orders/part/customer shells sized so parts = n/5 and
    customers = n/20 — at n=30M that is 6M parts, past the old
    DECIMAL(18,12) overflow point."""
    n_orders = max(1000, n // 4)
    n_parts = max(2000, n // 5)
    n_cust = max(1500, n // 20)
    li = spark.range(n).select(
        F.pmod(F.hash("id", F.lit(seed)), F.lit(n_orders)).alias("l_orderkey"),
        F.pmod(F.hash("id", F.lit(seed + 1)), F.lit(n_parts)).alias("l_partkey"),
    )
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.hash("id", F.lit(seed + 2)), F.lit(n_cust)).alias("o_custkey"),
    )
    part = spark.range(n_parts).withColumnRenamed("id", "p_partkey")
    cust = spark.range(n_cust).withColumnRenamed("id", "c_custkey")
    return {"lineitem": li, "orders": orders, "part": part, "customer": cust}


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000, 30_000_000]
    spark = get_spark("scaling-smoke-r7")
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="r7_smoke_")
        try:
            t0 = time.time()
            synth_events(spark, n).write.mode("overwrite").parquet(
                f"{d}/events.parquet"
            )
            for name, df in synth_ratings(spark, n).items():
                df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
            gen_s = time.time() - t0
            timings = {}
            for op in ("hll_set_algebra", "als_half_step_factors",
                       "als_half_step_items"):
                spark.catalog.clearCache()
                t0 = time.time()
                cnt = QUERIES[op].fn(spark, d).count()
                timings[op] = time.time() - t0
                release_tracked(spark)
                print(f"# n={n:>11,} {op}: {cnt} rows in {timings[op]:.2f}s",
                      file=sys.stderr)
            rows.append((n, gen_s, timings))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    ops = ["hll_set_algebra", "als_half_step_factors", "als_half_step_items"]
    print("| rows | gen+write | " + " | ".join(o.replace("_", " ") for o in ops)
          + " |")
    print("|---" * (len(ops) + 2) + "|")
    for n, gen_s, t in rows:
        cells = " | ".join(f"{t[o]:.2f} s" for o in ops)
        print(f"| {n/1e6:g}M | {gen_s:.1f} s | {cells} |")


if __name__ == "__main__":
    main()
