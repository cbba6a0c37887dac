"""Scaling smoke for the round-8 text-tail claims (VERDICT r7 items 3
and 7): `bpe_merge_table`, `tfidf_top_terms` and the vectorized
`heavy_hitter_tokens` kernel over synthetic corpora 10-100× the
round-7 document smokes.

Claims under test:

- `bpe_merge_table`'s r7 persist-lifecycle fix holds at 10× corpus:
  O(rounds) token passes, one bounded pair shuffle per merge round —
  time per rung grows ~linearly with rows, not quadratically.
- `tfidf_top_terms` stays on one doc_id partitioning: tokenize ->
  (doc, term) hash agg -> df join -> per-doc top-k, all map-side-
  partial hash aggregates; linear.
- `heavy_hitter_tokens`' vectorized per-partition top-k (pandas
  split/explode/value_counts, r8 rewrite of the per-row Counter loop)
  is scan-bound: the shuffle carries O(partitions × k) rows at any
  vocabulary size.

Usage: python tools/scaling_smoke_r8.py [sizes...]
Prints a markdown table for SCALE.md; per-op progress on stderr.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import (
    release_tracked,
)
from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark
from tools.scaling_smoke_docs import synth_docs

OPS = ["heavy_hitter_tokens", "tfidf_top_terms", "bpe_merge_table"]


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("scaling-smoke-r8")
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="r8_smoke_")
        try:
            t0 = time.time()
            synth_docs(spark, n).write.mode("overwrite").parquet(
                f"{d}/documents.parquet"
            )
            gen_s = time.time() - t0
            timings = {}
            for op in OPS:
                spark.catalog.clearCache()
                t0 = time.time()
                cnt = QUERIES[op].fn(spark, d).count()
                timings[op] = time.time() - t0
                release_tracked(spark)
                print(
                    f"# n={n:>11,} {op}: {cnt} rows in {timings[op]:.2f}s",
                    file=sys.stderr,
                )
            rows.append((n, gen_s, timings))
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print("| docs | gen+write | "
          + " | ".join(o.replace("_", " ") for o in OPS) + " |")
    print("|---" * (len(OPS) + 2) + "|")
    for n, gen_s, t in rows:
        cells = " | ".join(f"{t[o]:.2f} s" for o in OPS)
        print(f"| {n/1e6:g}M | {gen_s:.1f} s | {cells} |")


if __name__ == "__main__":
    main()
