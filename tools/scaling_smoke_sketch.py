"""Scaling smoke for the round-6 mergeable-sketch queries: times
`hll_distinct_users`, `cms_heavy_hitters` and `bloom_semijoin_prune`
on synthetic event streams of 1M/10M/100M rows — all three are
one-or-two hash-aggregate plans whose state is O(registers), so the
claim under test is plain linearity with the scan.

Usage: python tools/scaling_smoke_sketch.py [sizes...]
Prints a markdown table for SCALE.md; per-query progress on stderr.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark
from tools.scaling_smoke_events import synth_events

OPS = ["hll_distinct_users", "cms_heavy_hitters", "bloom_semijoin_prune"]


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000, 100_000_000]
    spark = get_spark("scaling-smoke-sketch")
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="sk_smoke_")
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
