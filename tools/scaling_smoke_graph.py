"""Graph / kNN-kernel scaling smoke: times the round-4 operators on
synthetic inputs of increasing size — the local stand-in for "do the
iterative-graph and block-kernel plans survive 10×?".

Usage: python tools/scaling_smoke_graph.py [edge_sizes...]
Prints markdown tables for SCALE.md (seconds, median of 3).

- ``pagerank``: 3 power iterations of ``pagerank_fixed`` over E random
  edges on V = E/10 vertices (edge list persisted, as the catalog query
  does).  Cost model: one-time edge materialization + per-iteration
  {broadcast |V| message vector, scan cached E, sum-by-dst shuffle}.
- ``knn_graph``: exact all-pairs top-5 over N dim-64 vectors via the
  block-matmul kernel (``knn_graph_topk``, 16 blocks).  Cost model:
  O(N²·d) FLOPs as numpy matmul + O(N·B·k) shuffle rows — quadratic by
  definition (sized separately from the edge counts).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.graph import pagerank_fixed
from real___time_fraud_detection_using_apache_kafka_spark.operators.similarity import knn_graph_topk
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def edges_of(spark, n_edges: int):
    v = max(n_edges // 10, 10)
    base = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(v)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") * 2654435761), F.lit(v)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # symmetric closure so every node with an in-edge also has out-edges
    return base.union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def run_pagerank(spark, n_edges: int, strategy: str = "broadcast") -> float:
    edges = edges_of(spark, n_edges).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        t0 = time.time()
        pagerank_fixed(edges, iterations=3, strategy=strategy).agg(
            F.sum("rank")
        ).collect()
        return time.time() - t0
    finally:
        edges.unpersist()
        spark.catalog.clearCache()  # drop the strategy-internal persists


def run_pagerank_cp(spark, n_edges: int) -> float:
    return run_pagerank(spark, n_edges, strategy="copartition")


def vectors_of(spark, n: int):
    cols = [
        (F.pmod(F.xxhash64(F.col("id") * (i + 3)), F.lit(2001)).cast("float")
         / 1000.0 - 1.0).alias(f"x{i}")
        for i in range(64)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*cols).alias("embedding"),
    )


def run_knn(spark, n: int) -> float:
    vecs = vectors_of(spark, n).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        vecs.count()
        t0 = time.time()
        knn_graph_topk(vecs, k=5, n_blocks=16).count()
        return time.time() - t0
    finally:
        vecs.unpersist()


def measure(fn, spark, n, big: int) -> float:
    """Median of 3 (after a warm-up run) for cheap sizes; one single
    cold-ish run for sizes past ``big`` — a multi-minute op run four
    times is a stalled smoke, and at that scale JIT noise is a rounding
    error anyway."""
    if n > big:
        return fn(spark, n)
    fn(spark, n)  # codegen / JIT warm-up
    ts = sorted(fn(spark, n) for _ in range(3))
    return ts[1]


def main() -> None:
    edge_sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 10_000_000,
                                                    100_000_000]
    knn_sizes = [5_000, 20_000, 50_000]
    spark = get_spark("scaling-smoke-graph")
    print("| edges (pre-closure) | pagerank broadcast | pagerank copartition |")
    print("|---|---|---|")
    for n in edge_sizes:
        t = measure(run_pagerank, spark, n, big=20_000_000)
        tc = measure(run_pagerank_cp, spark, n, big=20_000_000)
        print(f"| {n/1e6:g}M | {t:.2f} s | {tc:.2f} s |")
        sys.stdout.flush()
    print()
    print("| vectors (dim 64) | knn_graph top-5 |")
    print("|---|---|")
    for n in knn_sizes:
        t = measure(run_knn, spark, n, big=20_000)
        print(f"| {n/1e3:g}k | {t:.2f} s |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
