"""Scaling smoke for the round-10 explode-width extension (VERDICT r9
item 4): the volume-scaled fan-out is now wired into the remaining
explode-heavy text plans — `unigram_logprob`, `corpus_segment_dedup`,
`bigram_perplexity`, `simhash_fingerprints` — and this smoke shows the
1M/10M-doc rungs completing at the DEFAULT 8g heap (the r8 evidence
shape: before the width change the 10M-doc BPE shuffle OOMed).

Claims under test:

- `unigram_logprob`: one token explode feeding a vocab agg + broadcast
  scoring join; the width keeps per-task hash-agg state heap-bounded.
- `corpus_segment_dedup`: the 10-token segment explode (~n_tokens/10
  row multiplier) plus a segment-string groupBy; width-scaled fan-out.
- `bigram_perplexity`: the bigram explode (~n_tokens multiplier)
  feeding three hash aggregates off one tracked persist.
- `simhash_fingerprints`: token explode + 24 vote aggregates per doc;
  partial aggregation keeps shuffle at O(docs), the width bounds the
  per-task vote-map.

Usage: python tools/scaling_smoke_r10.py [sizes...] (default 1M 10M)
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

OPS = [
    "unigram_logprob",
    "corpus_segment_dedup",
    "simhash_fingerprints",
    "bigram_perplexity",
]


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("scaling-smoke-r10")
    rows = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="r10_smoke_")
        try:
            t0 = time.time()
            synth_docs(spark, n).write.mode("overwrite").parquet(
                f"{d}/documents.parquet"
            )
            gen_s = time.time() - t0
            timings = {}
            for op in OPS:
                release_tracked(spark)
                spark.catalog.clearCache()
                t0 = time.time()
                cnt = QUERIES[op].fn(spark, d).count()
                timings[op] = time.time() - t0
                print(
                    f"# {n:,} docs {op}: {timings[op]:.1f}s ({cnt} rows)",
                    file=sys.stderr,
                )
            rows.append((n, gen_s, timings))
        finally:
            release_tracked(spark)
            spark.catalog.clearCache()
            shutil.rmtree(d, ignore_errors=True)
    print("| docs | gen | " + " | ".join(OPS) + " |")
    print("|---" * (len(OPS) + 2) + "|")
    for n, gen_s, t in rows:
        cells = " | ".join(f"{t[op]:.1f} s" for op in OPS)
        print(f"| {n // 1_000_000}M | {gen_s:.1f} s | {cells} |")


if __name__ == "__main__":
    main()
