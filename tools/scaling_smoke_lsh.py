"""Scaling smoke for the r8 auto-sized hyperplane LSH (the fix for the
fixed-bucket-count flaw: with planes_per_band frozen at 4 the band
hash has 16 buckets FOREVER, so per-band candidate volume is O(N²/16)
— quadratic at any corpus size.  The auto sizing picks r by fixed
point so each band's expected random-pair candidate volume
N²(1+r)/2^(r+1) stays ~128·N, and derives the band count from the
analytic collision model so recall stays at the configured target).

Claims under test, per rung:

- the chosen (r, bands) follow the model (printed),
- planted-pair recall >= 0.95 at cosine 0.45 (ground truth known by
  construction: pairs planted at controlled angles),
- per-band RANDOM candidate volume stays ~linear in N.  NOTE the
  verify stage and the output itself are still corpus-density-bound:
  random 64-dim cosines have sd 1/8, so at threshold 0.45 (3.6 sd) a
  random tail emits ~1.6e-4 of all pairs — a REAL Θ(N²) output term
  at this deliberately low threshold (the found-pairs column makes
  it visible).  LSH tunes the candidate constant; it cannot make a
  dense-output query linear.  True near-dup thresholds (0.8+) keep
  the tail silent and the output O(planted).

Synthetic corpus: seeded numpy; P planted pairs (a, a') with
cos(a, a') in [0.55, 0.85] via slerp-style mixing, N - 2P random tail
vectors.  Vectors land in a throwaway parquet so the operator runs
its real scan path.

Usage: python tools/scaling_smoke_lsh.py [sizes...]   # default 2000 20000 60000
Prints a markdown table for SCALE.md; progress on stderr.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import real___time_fraud_detection_using_apache_kafka_spark.operators.similarity as SIM
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark

DIM = 64
THRESHOLD = 0.45


def build_corpus(spark, n: int, out_dir: str, planted: int = 200):
    rng = np.random.default_rng(7)
    tail = rng.standard_normal((n - 2 * planted, DIM))
    tail /= np.linalg.norm(tail, axis=1, keepdims=True)
    a = rng.standard_normal((planted, DIM))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    noise = rng.standard_normal((planted, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    # mix so cos(a, b) lands in [0.55, 0.85]: b = cos_t*a + sin_t*orth
    pairs = []
    bs = []
    for i in range(planted):
        c = 0.55 + 0.30 * rng.random()
        orth = noise[i] - np.dot(noise[i], a[i]) * a[i]
        orth /= np.linalg.norm(orth)
        b = c * a[i] + math.sqrt(1 - c * c) * orth
        bs.append(b)
        pairs.append((i, planted + i))
    vecs = np.vstack([a, np.asarray(bs), tail])
    rows = [
        (int(i), [float(x) for x in vecs[i]], 0) for i in range(len(vecs))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.repartition(32).write.mode("overwrite").parquet(out_dir)
    return {(x, y) for x, y in pairs}


def main() -> int:
    sizes = [int(s) for s in sys.argv[1:]] or [2000, 20000, 60000]
    spark = get_spark("lsh-smoke")
    work = tempfile.mkdtemp(prefix="lsh_smoke_")
    print("| N | r (planes) | bands | pairs found | planted recall | sec |")
    print("|---|---|---|---|---|---|")
    try:
        for n in sizes:
            out = f"{work}/emb_{n}"
            truth = build_corpus(spark, n, out)
            emb = spark.read.parquet(out)
            r = 4
            for _ in range(3):
                r = min(24, max(4, int(math.ceil(
                    math.log2(max(n, 2) * (1 + r) / 128.0)))))
            p = 1.0 - math.acos(THRESHOLD) / math.pi
            eta = p ** r + r * p ** (r - 1) * (1.0 - p)
            b = min(64, max(2, int(math.ceil(
                math.log(1.0 - 0.98) / math.log(1.0 - eta)))))
            print(f"# N={n}: expect r={r} bands={b}", file=sys.stderr)
            spark.catalog.clearCache()
            t0 = time.time()
            found = {
                (min(row.id_a, row.id_b), max(row.id_a, row.id_b))
                for row in SIM.hyperplane_lsh_pairs(
                    emb, threshold=THRESHOLD
                ).collect()
            }
            dt = time.time() - t0
            hit = len(found & truth)
            recall = hit / len(truth)
            print(
                f"| {n:,} | {r} | {b} | {len(found):,} "
                f"| {recall:.3f} | {dt:.2f} |"
            )
            shutil.rmtree(out, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
