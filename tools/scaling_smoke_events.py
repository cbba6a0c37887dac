"""Fraud-forensics scaling smoke: times the behavioral/event operators on
synthetic event streams of increasing size (default 1M / 10M / 100M rows)
— the local stand-in for "does the fraud family survive 10×?".

Usage: python tools/scaling_smoke_events.py [sizes...]
Appends nothing; prints a markdown table for SCALE.md.

Synthesis is all JVM column expressions (seeded, reproducible): 100k
users at 100M rows (~1k events/user), timestamps spread over 90 days,
the 5 reference event types, values log-normal-ish via hash-uniforms.
The synthetic table is written as ``events.parquet`` in a temp dir so
the REGISTERED catalog queries run against it unchanged — the smoke
times the exact plans the driver checks, not a rewrite.
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

TYPES = "array('click','view','purchase','signup','error')"

OPS = [
    "rapid_repeat_purchases",
    "value_outliers_robust",
    "user_rfm_segments",
    "session_conversion_paths",
]


def synth_events(spark, n: int, seed: int = 11, n_users: int | None = None):
    n_users = n_users or max(150, n // 1000)
    span_us = 90 * 86_400_000_000  # 90 days
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.hash(F.col("id"), F.lit(seed)).cast("long") * 1_000_003,
                         F.lit(span_us))
            ).alias("ts"),
            F.pmod(F.hash(F.col("id"), F.lit(seed + 1)).cast("long"),
                   F.lit(n_users)).alias("user_id"),
            F.expr(f"{TYPES}[pmod(hash(id, {seed + 2}), 5)]").alias("event_type"),
            F.round(
                F.exp(F.pmod(F.hash(F.col("id"), F.lit(seed + 3)).cast("double"),
                             F.lit(1000.0)) / F.lit(250.0)) * 5.0, 2
            ).alias("value"),
            F.to_json(F.struct(F.pmod(F.hash("id"), F.lit(100)).alias("k")))
            .alias("props"),
        )
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000, 100_000_000]
    spark = get_spark("scaling-smoke-events")
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="ev_smoke_")
        try:
            t0 = time.time()
            synth_events(spark, n).write.mode("overwrite").parquet(
                f"{d}/events.parquet"
            )
            gen_s = time.time() - t0
            timings = {}
            for op in OPS:
                spark.catalog.clearCache()
                t0 = time.time()
                cnt = QUERIES[op].fn(spark, d).count()
                timings[op] = time.time() - t0
                print(f"# n={n:>11,} {op}: {cnt} rows in {timings[op]:.2f}s",
                      file=sys.stderr)
            rows.append((n, gen_s, timings))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print("| rows | gen+write | " + " | ".join(o.replace("_", " ") for o in OPS)
          + " |")
    print("|---" * (len(OPS) + 2) + "|")
    for n, gen_s, t in rows:
        cells = " | ".join(f"{t[o]:.2f} s" for o in OPS)
        print(f"| {n/1e6:g}M | {gen_s:.1f} s | {cells} |")


if __name__ == "__main__":
    main()
