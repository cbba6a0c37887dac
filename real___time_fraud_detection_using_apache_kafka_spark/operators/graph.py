"""Graph operators over edge DataFrames (driver-mandated extension
surface, next to the connected-components labeler in ``dedup.py``).

PageRank here is the FIXED-ITERATION variant: the iteration count is a
plan parameter, so the whole computation is one deterministic logical
plan (unrolled joins) that a SQL oracle can replay with chained CTEs —
no convergence test, no driver-side loop state beyond plan construction.
That is the right shape for a relational engine: each iteration is
exactly one shuffle-by-src join plus one shuffle-by-dst aggregate, and
Catalyst/AQE still get to pick join strategies per stage.

Scale notes
-----------
- The edge list is consumed once per iteration plus once each for the
  degree and node extracts; callers pass a PERSISTED edges frame (the
  catalog query does) so iterations scan memory, not the upstream join.
- Rank state between iterations is O(|V|) rows — never persisted; each
  iteration's plan is a narrow extension of the previous one.
- The total-node-count denominator rides a broadcast crossJoin of a
  1-row aggregate (metadata-sized), keeping the plan fully lazy — no
  driver collect, so zero-row inputs degrade to a zero-row result
  instead of a ZeroDivisionError.
- Hot vertices (skew) hit the by-dst aggregate, where AQE skew-split
  and map-side partial aggregation already apply; no salting needed
  because the combine is a plain sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(edges: DataFrame, iterations: int = 3,
                   damping: float = 0.85,
                   src: str = "src", dst: str = "dst") -> DataFrame:
    """PageRank with ``iterations`` synchronous power-method steps over a
    directed edge list (one row per edge, no duplicates).

    Every node must appear as a source at least once (true for symmetric
    edge lists, e.g. co-occurrence graphs) — dangling-mass redistribution
    is deliberately out of scope for the relational tier.  Returns
    ``(node, rank)`` with ranks summing to ~1.

    Plan, per iteration: the |V|-sized rank state is pre-divided by
    out-degree into a per-source message vector (a |V| ⋈ |V| join), then
    BROADCAST into the cached |E|-sized edge list — so the big side is
    never shuffled or sorted per iteration; the only data-sized exchange
    is the sum-by-``dst`` hash aggregate (map-side partial).  Rank state
    is one double per vertex: for co-occurrence graphs |V| ≪ |E| and the
    state broadcasts at any realistic vocabulary (a billion-vertex graph
    would instead repartition BOTH sides by ``src`` once and reuse that
    co-partitioning across iterations — same recurrence, swap the join
    strategy).
    """
    # deg is the ONLY |E|-sized aggregate; it is persisted because the
    # node set, the node count, and every iteration's message vector all
    # derive from it — without the cache each broadcast subtree would
    # re-shuffle the full edge list per iteration (measured: ~6 extra
    # |E|-row exchanges for 3 iterations at sf0.1)
    deg = edges.groupBy(src).agg(F.count("*").alias("_outdeg")).persist()
    nodes = deg.select(F.col(src).alias("node"))  # distinct by grouping
    n = deg.agg(F.count("*").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(iterations):
        # fresh column names per hop: ranks/deg/edges share lineage, so
        # joining back on a same-named column would be ambiguous
        msg = ranks.join(F.broadcast(deg), ranks["node"] == deg[src]).select(
            F.col("node").alias("_msrc"),
            (F.col("rank") / F.col("_outdeg")).alias("_m"),
        )
        contribs = (
            edges.join(F.broadcast(msg), F.col(src) == F.col("_msrc"))
            .groupBy(dst)
            .agg(F.sum("_m").alias("_in"))
        )
        ranks = contribs.crossJoin(F.broadcast(n)).select(
            F.col(dst).alias("node"),
            (
                (1.0 - damping) / F.col("_n") + F.lit(damping) * F.col("_in")
            ).alias("rank"),
        )
    return ranks
