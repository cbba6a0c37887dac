"""Link-prediction scaling smoke: triangle plan vs wedge plan for
Adamic-Adar edge scoring on synthetic graphs of increasing size.

The round-5 rewrite of ``adamic_adar_parts`` replaced wedge enumeration
(all neighbor pairs per center vertex, Σ deg² rows, then filter to
edges) with triangle enumeration through each scored edge (candidates
from one endpoint's adjacency, Σ deg rows, LeftSemi closing-edge
probe).  This smoke times both shapes on the same random graph so the
crossover is measured, not asserted.

Usage: python tools/scaling_smoke_linkpred.py [edge_sizes...]
Prints a markdown table for SCALE.md (seconds, median of 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def canonical_edges(spark, n_edges: int):
    v = max(n_edges // 10, 10)
    e = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(v)).alias("a"),
            F.pmod(F.xxhash64(F.col("id") * 2654435761), F.lit(v)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    return e


def score_triangle(edges, sym, deg):
    cand = edges.join(sym, edges.a == sym.src).select(
        "a", "b", F.col("dst").alias("z")
    )
    tri = cand.join(
        sym.select(F.col("src").alias("z"), F.col("dst").alias("b")),
        ["z", "b"],
        "left_semi",
    )
    return (
        tri.join(F.broadcast(deg), tri.z == deg.node)
        .groupBy("a", "b")
        .agg(F.round(F.sum(1.0 / F.log(F.col("d").cast("double"))), 6).alias("s"))
    )


def score_wedge(edges, sym, deg):
    s1 = sym.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    s2 = sym.select(F.col("src").alias("z"), F.col("dst").alias("y"))
    wedge = s1.join(s2, "z").filter(F.col("x") < F.col("y"))
    scored = (
        wedge.join(F.broadcast(deg), wedge.z == deg.node)
        .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
        .agg(F.round(F.sum(1.0 / F.log(F.col("d").cast("double"))), 6).alias("s"))
    )
    return scored.join(edges, ["a", "b"])


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = get_spark("linkpred-smoke")
    print("| edges | triangle plan s | wedge plan s |")
    print("|---|---|---|")
    for n in sizes:
        edges = canonical_edges(spark, n).persist()
        edges.count()
        sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
        row = [f"| {n:,} "]
        for fn in (score_triangle, score_wedge):
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn(edges, sym, deg).orderBy(F.desc("s"), "a", "b").limit(20).collect()
                ts.append(time.time() - t0)
            ts.sort()
            row.append(f"| {ts[1]:.2f} ")
        print("".join(row) + "|", flush=True)
        edges.unpersist()


if __name__ == "__main__":
    main()
