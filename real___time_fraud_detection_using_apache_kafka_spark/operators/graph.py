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

from .cache import tracked_persist


def basket_pairs(df: DataFrame, basket: str, item: str,
                 a: str = "a", b: str = "b") -> DataFrame:
    """All unordered co-occurring item pairs per basket — one output row
    per (basket, pair), items deduped within the basket, pair canonical
    ``a < b``.  The shared first stage of every co-occurrence graph.

    Plan: ONE hash shuffle on the basket key with ``collect_set`` doing
    the within-basket dedup inside the aggregate (map-side partial), then
    a NARROW array expansion (`array_sort` + nested `transform`/`slice` +
    `explode`) emitting each i<j pair once — already canonical because
    the array is sorted.  Compared to the classic self-equi-join this
    removes two exchanges: the pre-join dedup shuffle and the second
    join-side shuffle (a self-join needs both sides hashed by basket;
    the aggregate needs one pass).  Pair fan-out is k(k-1)/2 per basket
    of k distinct items, generated inside the scan stage — fine for
    bounded baskets (orders, sessions); a heavy-tailed basket domain
    should cap k or fall back to the join formulation so one mega-basket
    cannot produce a single giant row."""
    baskets = df.groupBy(basket).agg(
        F.array_sort(F.collect_set(item)).alias("_items")
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(_items, (x, i) -> "
            "transform(slice(_items, i + 2, size(_items) - i - 1), "
            "y -> struct(x AS a, y AS b))))"
        )
    ).alias("_p")
    return baskets.select(pair).select(
        F.col("_p.a").alias(a), F.col("_p.b").alias(b)
    )


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact triangle census of an undirected graph given as CANONICAL
    unique edges (one row per edge, ``a < b`` by id): returns one row
    ``(n_nodes, n_edges, n_wedges, n_triangles, global_clustering)``
    where ``global_clustering = 3*triangles / wedges`` (the transitivity
    ratio) and wedges = Σ_v d(v)(d(v)-1)/2.

    Scale design — degree orientation (the standard O(|E|^1.5) bound):
    a naive triangle join enumerates Σ d(v)² wedges, which a single hub
    vertex turns quadratic.  Instead every edge is oriented from its
    lower endpoint to its higher endpoint under the TOTAL order
    (degree, id) — so every vertex's OUT-degree is O(sqrt(|E|)) no
    matter how skewed the in-degrees — wedges are enumerated only
    between out-edges of the orientation (o1.src = o2.src, one
    self-join on the oriented source), and each wedge probes the
    canonical edge set once (equi-join on the id-ordered pair).  Every
    triangle is counted exactly once, at its (degree, id)-minimal
    vertex.  Plan: two |E|-sized hash joins against the broadcastable
    degree table, one oriented self-join, one closing equi-join — all
    equi-joins, no cross product, AQE skew-split applies to the hub
    side.  The orientation needs no global rank: (degree, id) tuple
    comparisons are computed per-edge from a degree lookup.
    """
    e = edges.select(F.col(a).alias("ea"), F.col(b).alias("eb"))
    # deg is consumed three times (two orientation broadcasts + the
    # wedge/node counts); it is |V|-sized, so cache it rather than
    # re-aggregating the edge list per consumer (callers pass a
    # persisted edge list for the same reason — e itself is read by the
    # orientation join, the closing join and the edge count)
    deg = tracked_persist(
        e.select(F.col("ea").alias("node"))
        .union(e.select(F.col("eb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orientation key: lexicographic (deg, id); struct comparison gives
    # the total order directly in codegen
    da = deg.select(F.col("node").alias("ea"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("eb"), F.col("deg").alias("degb"))
    keyed = (
        e.join(F.broadcast(da), "ea")
        .join(F.broadcast(db), "eb")
        .select(
            "ea", "eb",
            F.struct(F.col("dega").alias("d"), F.col("ea").alias("i")).alias("ka"),
            F.struct(F.col("degb").alias("d"), F.col("eb").alias("i")).alias("kb"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("ea")).otherwise(F.col("eb")).alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("eb")).otherwise(F.col("ea")).alias("dst"),
    )
    o1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    o2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    # each unordered out-pair once: id order on (v, w) — the closing
    # edge key is the id-canonical pair, matching the input edge form
    wedges = o1.join(o2, "u").filter(F.col("v") < F.col("w"))
    tri = wedges.join(
        e, (F.col("v") == F.col("ea")) & (F.col("w") == F.col("eb"))
    ).agg(F.count("*").alias("n_triangles"))
    counts = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    n_e = e.agg(F.count("*").alias("n_edges"))
    return (
        counts.crossJoin(F.broadcast(n_e))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
                    / F.col("n_wedges"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("global_clustering"),
        )
    )


def khop_min_dist(edges: DataFrame, seeds: DataFrame, max_hops: int,
                  src: str = "src", dst: str = "dst",
                  node: str = "node") -> DataFrame:
    """Minimum hop distance (BFS level) from a seed set over a DIRECTED
    edge list, bounded at ``max_hops``: returns ``(node, dist)`` for
    every node reachable within the bound, ``dist`` = fewest edges from
    any seed (seeds themselves at 0).  Symmetrize the edge list first
    for undirected reachability.

    Frontier BFS as a fixed unrolled plan (same doctrine as
    :func:`pagerank_fixed` — ``max_hops`` is a plan parameter, no
    convergence test): per level, one equi-join frontier⋈edges, one
    distinct, one left-anti against the visited set.  The frontier and
    visited state are O(|V|) id+dist rows; each level's FRONTIER is
    persisted because the anti-join makes each level's lineage
    reference every earlier level — unpersisted, level h would
    recompute level h-1's whole subtree twice (2^h total scans).  The
    visited set is a LAZY union of those per-level caches (r11): every
    union branch is already persisted, so the recursion is cut without
    materializing a redundant copy of the union per level.  The per-level
    caches are session-tracked (``operators/cache.py``): the registry
    releases them when the next catalog query is built, and direct
    callers free them with ``release_tracked(spark)`` after their
    action.  At billion-vertex scale the same loop holds with the
    frontier broadcast while small (expansion phase) and checkpointing
    every few levels to truncate lineage; early exit on an empty
    frontier is a driver-side count on metadata-sized state.

    Duplicate seed rows are deduped up front (``distinct``) so each
    reachable node appears exactly once in the output.
    """
    visited = tracked_persist(
        seeds.select(F.col(node).alias("node")).distinct()
        .select("node", F.lit(0).alias("dist"))
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = tracked_persist(
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .select("node", F.lit(h).alias("dist"))
        )
        # r11: the union stays LAZY — every branch is itself persisted,
        # so the anti-join recursion is already cut at each level, and
        # persisting the union too just materialized a redundant copy
        # of the visited set per level (one extra full cache-write pass
        # × max_hops, measured as pure overhead at sf0.1).
        visited = visited.union(nxt)
        frontier = nxt
    return visited


def pagerank_fixed(edges: DataFrame, iterations: int = 3,
                   damping: float = 0.85,
                   src: str = "src", dst: str = "dst",
                   strategy: str = "broadcast") -> DataFrame:
    """PageRank with ``iterations`` synchronous power-method steps over a
    directed edge list (one row per edge, no duplicates).

    Every node must appear as a source at least once (true for symmetric
    edge lists, e.g. co-occurrence graphs) — dangling-node (no out-edge)
    mass redistribution is deliberately out of scope for the relational
    tier.  Nodes with no IN-edges are handled: each iteration rebuilds
    the rank vector over the full node set with the ``(1-d)/n`` baseline
    (left join against the by-dst contributions), so a pure-source
    vertex keeps its baseline rank and keeps emitting mass instead of
    silently vanishing after iteration 1 (ADVICE r4).  Returns
    ``(node, rank)`` with ranks summing to ~1.

    Two physical strategies, same recurrence and identical output:

    - ``strategy="broadcast"`` (default): the |V|-sized rank state is
      pre-divided by out-degree into a per-source message vector (a
      |V| ⋈ |V| join), then BROADCAST into the cached |E|-sized edge
      list — the big side is never shuffled or sorted per iteration;
      the only data-sized exchange is the sum-by-``dst`` hash aggregate
      (map-side partial).  Right whenever the one-double-per-vertex
      state fits a broadcast — co-occurrence graphs with |V| ≪ |E|.
    - ``strategy="copartition"``: the edge list is hash-partitioned by
      ``src`` ONCE (caller persists the returned layout via the edges
      frame it passed); each iteration shuffles only the |V|-row
      message vector to the same partitioning and joins shuffle-hash,
      with the edge side's cached partitioning reused — per-iteration
      cost is one |V|-row exchange + the sum-by-dst aggregate, with NO
      per-vertex broadcast.  This is the big-|V| tier by PLAN SHAPE:
      a broadcast of 10M+ rank rows per iteration serializes through
      one driver and every executor's memory, which a cluster cannot
      amortize — copartition replaces it with an ordinary shuffle.  On
      single-JVM local[32] the two tiers measure EQUAL up to 100M
      synthetic edges (SCALE.md table — local mode makes a broadcast a
      memory copy, hiding exactly the cost that dominates on a real
      cluster), so the smoke validates correctness and non-regression,
      not the cluster crossover.
    """
    if strategy not in ("broadcast", "copartition"):
        raise ValueError(f"unknown strategy: {strategy}")
    if strategy == "copartition":
        return _pagerank_copartition(edges, iterations, damping, src, dst)
    # deg is the ONLY |E|-sized aggregate; it is persisted because the
    # node set, the node count, and every iteration's message vector all
    # derive from it — without the cache each broadcast subtree would
    # re-shuffle the full edge list per iteration (measured: ~6 extra
    # |E|-row exchanges for 3 iterations at sf0.1)
    deg = tracked_persist(
        edges.groupBy(src).agg(F.count("*").alias("_outdeg"))
    )
    return _pagerank_iterate(edges, deg, iterations, damping, src, dst,
                             broadcast_msg=True)


def _pagerank_copartition(edges: DataFrame, iterations: int,
                          damping: float, src: str, dst: str) -> DataFrame:
    n_part = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # one-time layout: edges hash-partitioned by src and cached — the
    # cached InMemoryRelation advertises this partitioning, so the
    # per-iteration message join shuffles ONLY the |V|-row message side
    # to match; the |E| side is never exchanged again
    e = tracked_persist(edges.repartition(n_part, F.col(src)))
    deg = tracked_persist(e.groupBy(src).agg(F.count("*").alias("_outdeg")))
    return _pagerank_iterate(e, deg, iterations, damping, src, dst,
                             broadcast_msg=False)


def _pagerank_iterate(edges: DataFrame, deg: DataFrame, iterations: int,
                      damping: float, src: str, dst: str,
                      broadcast_msg: bool) -> DataFrame:
    nodes = deg.select(F.col(src).alias("node"))  # distinct by grouping
    n = deg.agg(F.count("*").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(iterations):
        # fresh column names per hop: ranks/deg/edges share lineage, so
        # joining back on a same-named column would be ambiguous
        deg_side = F.broadcast(deg) if broadcast_msg else deg
        msg = ranks.join(deg_side, ranks["node"] == deg[src]).select(
            F.col("node").alias("_msrc"),
            (F.col("rank") / F.col("_outdeg")).alias("_m"),
        )
        if broadcast_msg:
            msg_side = F.broadcast(msg)
        else:
            # shuffle-hash, not sort-merge: SMJ would re-SORT the cached
            # |E| partitions every iteration; SHJ builds a hash map from
            # the small |V|-row message partition instead
            msg_side = msg.hint("shuffle_hash")
        contribs = (
            edges.join(msg_side, F.col(src) == F.col("_msrc"))
            .groupBy(dst)
            .agg(F.sum("_m").alias("_in"))
            .select(F.col(dst).alias("_cdst"), "_in")
        )
        # rebuild over the FULL node set, not just nodes that received
        # mass: a vertex with no in-edges keeps the (1-d)/n baseline and
        # keeps emitting, instead of vanishing after iteration 1
        # (ADVICE r4).  |V| ⋈ |V| hash join — never data-sized.
        ranks = (
            nodes.join(contribs, nodes["node"] == F.col("_cdst"), "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
