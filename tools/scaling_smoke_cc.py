"""Connected-components scaling smoke (round-9, VERDICT r8 item 4):
does the pointer-jumped min-label fixpoint hold its round bound and
near-linear cost as the pair graph grows — and does the worst-case
topology (a deep chain) converge at all?

Two topologies per rung:

- ``random``: E edges over V = E/10 vertices (xxhash-derived, the
  near-dup-graph shape: dense shallow components).  Expect 2-4 rounds
  at ANY size — component diameter, not corpus size, drives rounds.
- ``chain``: a single path of L nodes — diameter L-1, the adversarial
  case.  Plain propagation needs L-1 rounds (hopeless past ~20);
  pointer jumping needs ~log2(L), so a 100k chain must converge inside
  the default max_iter=20.

Prints a markdown table for SCALE.md: edges, rounds, seconds (the
random rungs past 50k edges exercise the AQE-on wide path; the small
chain rungs exercise the AQE-off small-graph path).

Usage: python tools/scaling_smoke_cc.py [random_edge_sizes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import release_tracked
from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
    connected_components,
)
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def random_pairs(spark, n_edges: int):
    v = max(n_edges // 10, 10)
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(v)).alias("doc_a"),
        F.pmod(F.xxhash64(F.col("id") * 2654435761), F.lit(v)).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b"))


def chain_pairs(spark, length: int):
    return spark.range(1, length).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )


def star_pairs(spark, n_spokes: int):
    """One hub, n spokes — the maximal hot-key topology (r11, VERDICT
    r10 item 5): after symmetrization the hub appears in EVERY edge, so
    the per-round join hits one skewed src partition and the dst-group
    min-aggregate one hot key.  Diameter 2 -> rounds must stay at the
    floor regardless of size; the hot key is absorbed by map-side
    partial aggregation (hash-agg partial min), and the skewed join
    task is a narrow scan of the hub's cached partition."""
    return spark.range(1, n_spokes + 1).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b")
    )


def powerlaw_pairs(spark, n_edges: int):
    """Zipf-ish degree distribution — the realistic dup-graph skew
    (a boilerplate/template document matching a large fraction of the
    corpus).  dst ids concentrate near 0 via a u^4 power transform of a
    hash-derived uniform, so the top node's degree is ~n^(3/4)-heavy
    while the tail stays sparse."""
    v = max(n_edges // 10, 10)
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    dst = F.floor(F.lit(v) * F.pow(u, F.lit(4.0))).cast("long")
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64(F.col("id") * 2654435761), F.lit(v)).alias("doc_a"),
        dst.alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b"))


def main() -> None:
    random_sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000]
    chain_sizes = [10_000, 100_000]
    skew_sizes = random_sizes
    spark = get_spark("scaling-smoke-cc")
    rows = []
    for kind, sizes, gen in (
        ("random", random_sizes, random_pairs),
        ("chain", chain_sizes, chain_pairs),
        ("star", skew_sizes, star_pairs),
        ("powerlaw", skew_sizes, powerlaw_pairs),
    ):
        for n in sizes:
            release_tracked(spark)
            pairs = gen(spark, n)
            stats: dict = {}
            t0 = time.time()
            # driver_edge_threshold=0: this smoke measures the
            # DISTRIBUTED loop's scaling (the driver union-find tier
            # would swallow the small rungs)
            cc = connected_components(
                pairs, max_iter=25, stats=stats, driver_edge_threshold=0
            )
            n_nodes = cc.count()
            # sanity: a chain is ONE component labeled by its min node
            n_clusters = cc.select("cluster_id").distinct().count()
            sec = time.time() - t0
            rows.append((kind, n, n_nodes, n_clusters, stats["rounds"], sec))
            print(
                f"# {kind} n={n:>9,}: nodes={n_nodes} clusters={n_clusters} "
                f"rounds={stats['rounds']} in {sec:.2f}s",
                file=sys.stderr,
            )
            if kind in ("chain", "star"):
                assert n_clusters == 1, f"{kind} must converge to one component"
    print("| topology | edges | nodes | clusters | rounds | sec |")
    print("|---|---|---|---|---|---|")
    for kind, n, nodes, cl, rounds, sec in rows:
        print(f"| {kind} | {n:,} | {nodes:,} | {cl:,} | {rounds} | {sec:.2f} |")


if __name__ == "__main__":
    main()
