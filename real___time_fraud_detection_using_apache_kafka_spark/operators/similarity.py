"""Similarity search over embedding columns (driver-mandated extension).

- Brute-force cosine top-k: the correctness baseline.  The dot product is
  a higher-order-function fold over the zipped arrays — pure JVM, and the
  accumulation order is the array order, so the DuckDB oracle (same fold)
  matches bit-for-bit.  Row norms are computed ONCE per row before the
  join, so each candidate pair evaluates a single fold (the dot), not
  three.
- All-pairs near-dup: two-phase.  Phase 1 generates candidates with a
  block nested-loop join whose kernel is one vectorized float64 matmul
  per block pair (numpy via cogrouped applyInPandas) — the scan cost is
  O(N^2 / B) matrix ops instead of N^2 interpreted array folds.  Phase 2
  re-verifies the (few) survivors JVM-side with the exact sequential
  fold, so the output is bit-identical to the naive plan and the SQL
  oracle.
- Hyperplane-LSH and IVF variants: the 100 TB strategies (bucket key /
  cell id caps the candidate count; equi-join instead of cartesian).

Scale notes: brute-force is O(Q x N) — fine when Q (probe set) is small
and broadcastable.  The block kernel shuffles each row to ~B/2 partner
blocks (replication factor B/2, tunable); at 100 TB you bound B so a
block pair fits executor memory and let LSH/IVF prune block pairs first.
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Probe-side slice height for the cogrouped LSH bucket kernel (r12,
# VERDICT r11 item 1): the similarity matrix one task holds is at most
# _LSH_PROBE_CHUNK × |bucket| float64 (e.g. 4096 × 10k ≈ 330 MB for a
# pathologically hot bucket) instead of |bucket|², so a duplicate-heavy
# pattern bucket degrades to more matmul slices, not a worker OOM.
_LSH_PROBE_CHUNK = 4096


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (IEEE-stable
    and oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with precomputed norms: identical doubles to :func:`cosine`
    (same fold produces the norm, same op order) at a third of the fold
    evaluations per pair."""
    return dot(a, b) / (na * nb)


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is broadcast (small probe set); the candidate scan is
    never shuffled — each partition scores its local candidates and the
    per-query top-k reduces via a window on the (small) scored result.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6
        ).alias("cosine"),
    )
    from .windows import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k,
        rank_col="rank",
    )


def _block_pair_candidates(embeddings: DataFrame, threshold: float,
                           id_col: str, vec_col: str,
                           n_blocks: int) -> DataFrame:
    """Phase-1 candidate pairs for all-pairs cosine: block nested loop
    with a vectorized kernel.

    Rows are hashed into ``n_blocks`` blocks.  The left side replicates
    each row to every partner block >= its own; the right side keys rows
    by their own block; cogrouped ``applyInPandas`` then sees exactly one
    (block_i, block_j) pair per key j (i <= j) and scores the full cosine
    matrix with one float64 matmul.  Cross-block pairs surface exactly
    once; same-block pairs are deduped by the id order mask.  The kernel
    emits ids only (no vectors) at ``threshold - 1e-6`` — wide enough to
    cover both float reassociation and the round-to-6 boundary — and the
    caller re-verifies exactly.
    """
    tagged = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    partners = F.array(*[F.lit(j) for j in range(n_blocks)])
    left = tagged.withColumn(
        "pblk", F.explode(F.filter(partners, lambda j: j >= F.col("blk")))
    )
    margin = threshold - 1e-6

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        # np.stack, not .tolist(): see knn_graph_topk's kernel
        va = np.stack(lpdf["v"].to_numpy()).astype(np.float64, copy=False)
        vb = np.stack(rpdf["v"].to_numpy()).astype(np.float64, copy=False)
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        sim = (va / na[:, None]) @ (vb / nb[:, None]).T
        ia = lpdf["id"].to_numpy()
        ib = rpdf["id"].to_numpy()
        ba = lpdf["blk"].to_numpy()
        bb = rpdf["blk"].to_numpy()
        cross = ba[:, None] < bb[None, :]
        same_lower = (ba[:, None] == bb[None, :]) & (ia[:, None] < ib[None, :])
        ii, jj = np.nonzero((sim >= margin) & (cross | same_lower))
        return pd.DataFrame({
            "id_a": np.minimum(ia[ii], ib[jj]),
            "id_b": np.maximum(ia[ii], ib[jj]),
        })

    return (
        left.groupBy("pblk")
        .cogroup(tagged.groupBy("blk"))
        .applyInPandas(kernel, "id_a long, id_b long")
    )


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.45,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_blocks: int = 8) -> DataFrame:
    """All pairs with round(cosine, 6) >= threshold (embedding near-dup).

    Candidates from the vectorized block kernel; exact JVM fold re-verify
    on the survivors keeps the result bit-identical to the naive
    all-pairs plan (and the DuckDB oracle).  ``hyperplane_lsh_pairs``
    additionally prunes candidate generation by sign-bucket when recall
    < 1 is acceptable.
    """
    cand = _block_pair_candidates(embeddings, threshold, id_col, vec_col, n_blocks)
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def knn_graph_topk(embeddings: DataFrame, k: int = 5, n_blocks: int = 8,
                   local_margin: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs k-nearest-neighbor GRAPH (every vector is a query):
    per-vector cosine top-k over the whole corpus — the kNN-graph builder
    behind dedup clustering, label propagation, and graph-based retrieval
    indexes (HNSW ground truth).

    ``brute_force_topk`` broadcasts the probe side, which is impossible
    when the probe side IS the corpus.  Instead the candidate matrix is
    block-decomposed like ``cosine_neardup_pairs``, with per-block LOCAL
    top-k replacing the threshold:

      1. rows hash into ``n_blocks`` blocks; the query side replicates to
         every block (replication factor B), the candidate side stays put;
      2. one cogrouped kernel per (query-replica, candidate-block) pair
         scores a float64 matmul and emits each query's local
         top-``(k + local_margin)`` candidates WITH the approx cosine —
         so the shuffle output is O(N * B * k) slim rows, never O(N^2);
      3. a window narrows to the global top-``(k + local_margin)`` per
         query by the APPROX score (no vectors, no folds — cheap), the
         exact JVM fold re-scores only those O(N * (k+m)) survivors, and
         a final window keeps the top-k — output values and ordering are
         bit-identical to the naive all-pairs plan (and the SQL oracle)
         because every RETURNED cosine comes from the same sequential
         fold.  (Folding all O(N*B*k) candidates instead measured ~2x
         slower end-to-end at 20k vectors: the interpreted fold, not the
         matmul, dominates past small corpora.)

    ``local_margin`` absorbs the matmul-vs-fold last-ulp reordering risk
    at both approx cuts: a true global top-k member can only be lost if
    > ``local_margin`` candidates sit within float reassociation
    distance (~1e-14) of it — vanishingly unlikely for real-valued
    embeddings, and the margin is a constant-factor knob.

    Scale: the kernel's cost is O(N^2 / B) multiply-adds as BLAS matmul
    flops (not interpreted folds); memory per task is two block slices.
    An exact kNN graph is inherently quadratic — at 100 TB prune block
    pairs first (IVF cells / LSH buckets, see ``ivf_topk``), then build
    the exact graph inside each pruned cell with this same kernel.
    """
    tagged = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    partners = F.array(*[F.lit(j) for j in range(n_blocks)])
    left = tagged.withColumn("pblk", F.explode(partners))
    n_keep = k + local_margin

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                              "neighbor_id": pd.Series(dtype="int64"),
                              "acos": pd.Series(dtype="float64")})
        if lpdf.empty or rpdf.empty:
            return empty
        # np.stack over the per-row ndarrays Arrow hands us — .tolist()
        # would box every float through Python (measured 20x slower at
        # replication-factor row counts)
        va = np.stack(lpdf["v"].to_numpy()).astype(np.float64, copy=False)
        vb = np.stack(rpdf["v"].to_numpy()).astype(np.float64, copy=False)
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        sim = (va / na[:, None]) @ (vb / nb[:, None]).T
        ia = lpdf["id"].to_numpy()
        ib = rpdf["id"].to_numpy()
        sim[ia[:, None] == ib[None, :]] = -np.inf  # never self
        m = min(n_keep, sim.shape[1])
        # argpartition: local top-m per query row, no full sort
        top = np.argpartition(-sim, m - 1, axis=1)[:, :m]
        qs = np.repeat(ia, m)
        ns = ib[top.ravel()]
        vals = sim[np.repeat(np.arange(sim.shape[0]), m), top.ravel()]
        keep = vals > -np.inf
        return pd.DataFrame({"query_id": qs[keep], "neighbor_id": ns[keep],
                             "acos": vals[keep]})

    from .windows import topk_per_group

    cand = (
        left.groupBy("pblk")
        .cogroup(tagged.groupBy("blk"))
        .applyInPandas(kernel, "query_id long, neighbor_id long, acos double")
    )
    # approx global cut: one slim-row window narrows B*(k+m) candidates
    # per query to (k+m) BEFORE any vector join or fold
    shortlist = topk_per_group(
        cand, ["query_id"], [F.desc("acos"), F.asc("neighbor_id")], n_keep
    ).drop("rnk", "acos")
    q = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    scored = shortlist.join(q, "query_id").join(c, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6
        ).alias("cosine"),
    )
    from .windows import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k,
        rank_col="rank",
    )


def empty_topk(candidates: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Zero-row result with the (query_id, neighbor_id, cosine, rank)
    top-k schema, id-typed from ``candidates`` — the graceful output of
    the model-fitting ANN tiers when the corpus is empty (MLlib
    KMeans/PCA cannot fit on zero rows, and an empty index has no
    neighbors to return anyway)."""
    return candidates.limit(0).select(
        F.col(id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.lit(0.0).alias("cosine"),
        F.lit(0).alias("rank"),
    )


def ivf_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_rows: int | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the 100 TB scale path for
    similarity search.

    Index build: seeded MLlib KMeans partitions the candidate set into
    ``n_centroids`` cells; each candidate is stored under its nearest
    centroid (one narrow transform — the "inverted file").  The assembled
    feature frame is persisted for the duration of the fit so Lloyd
    iterations scan memory, not parquet.
    Probe: each query scores only candidates in its ``n_probe`` nearest
    cells, so the scored fraction is ~n_probe/n_centroids of the corpus
    instead of all of it; the cell match is an EQUI-join on centroid id
    that shuffles by cell.  ``n_probe = n_centroids`` degrades gracefully
    to exact brute force (the property the tests pin).

    Centroids are tiny (n_centroids x dim floats) — they ride along as a
    broadcast literal, never a shuffle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cand_vec = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    from .cache import tracked_persist

    cand_vec = tracked_persist(cand_vec)
    # a caller-provided row count replaces the isEmpty() guard job
    # (KMeans cannot fit zero rows)
    if n_rows == 0 or (n_rows is None and cand_vec.isEmpty()):
        cand_vec.unpersist()
        return empty_topk(candidates, id_col)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features",
                predictionCol="cell")
    model = km.fit(cand_vec)
    indexed = model.transform(cand_vec).select("neighbor_id", "cv", "cn", "cell")

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = candidates.sparkSession
    cent_df = spark.createDataFrame(centroids, ["cell", "centroid"])

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    # rank the (tiny, broadcast) centroid table per query; keep n_probe cells
    q_cells = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("dist", -cosine(F.col("qv"), F.col("centroid")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cell"))
            ),
        )
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    scored = q_cells.join(indexed, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6
        ).alias("cosine"),
    )
    from .windows import topk_per_group

    return topk_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k,
        rank_col="rank",
    )


def hyperplane_lsh_pairs(embeddings: DataFrame, threshold: float = 0.45,
                         bands: int | None = None,
                         planes_per_band: int | None = None,
                         seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         probe_bits: int = 1,
                         recall_target: float = 0.98,
                         n_rows: int | None = None,
                         dim: int | None = None) -> DataFrame:
    """Banded random-hyperplane LSH near-dup: each band hashes a vector to
    the sign pattern of ``planes_per_band`` fixed random projections; two
    vectors become candidates if they collide in ANY band
    (OR-amplification, the cosine mirror of MinHash banding:
    P[candidate] = 1 - (1 - p^r)^b with p = 1 - angle/pi).  Candidates
    verify with exact cosine, so the output has no false positives;
    recall at cosine c is tunable via (bands, planes_per_band,
    probe_bits).  At the sf0.1 corpus the sizing below resolves to
    15 bands × 7 planes with 1-bit multi-probe (analytic recall 0.981
    at c = 0.45; the fixed 6×4 r8 config measured 0.986, the old 8×3
    no-probe 0.931) — recall-vs-cost sweeps are in SCALE.md round-8.

    AUTO-SIZED (r8 batch 2): with fixed ``planes_per_band`` the band
    hash has a CONSTANT 2^r bucket count, so per-band candidates are
    O(N²/2^r) — quadratic at any fixed r, which degenerates toward
    all-pairs as the corpus grows (the old 6×4 defaults give 16
    buckets per band forever).  When bands/planes are not given they
    are derived from the corpus: r grows with log2(N) so that each
    band's expected RANDOM-pair candidate volume N²(1+r)/2^(r+1) stays
    ~128·N (linear in N — the probing fan-out (1+r) is inside the
    fixed point), and the band count comes from the analytic collision
    model — p = 1 − acos(threshold)/π per plane, per-band hit rate
    with 1-bit multi-probe η = p^r + r·p^(r−1)(1−p), bands =
    ceil(ln(1−recall_target)/ln(1−η)) — so the configured recall
    holds as the corpus grows while signature cost grows
    O(bands·r) = O(polylog N) per vector.  Explicit bands/planes
    switch the sizing off (sweeps and ablation tests pin them).
    bands is capped at 64: an aggressively LOW threshold (0.45 ⇒
    plane agreement p ≈ 0.65) needs hundreds of bands for 0.98 recall
    past ~10^6 vectors — at that shape prefer the IVF tier
    (``ivf_topk``) or a higher threshold (true near-dup at 0.9
    has p ≈ 0.86 and sizes to ~9 bands at r = 14); the cap keeps the
    signature cost sane and the recall degradation monotone/loud
    rather than the candidate volume quadratic/silent.

    Deterministic: hyperplanes come from a seeded NumPy RNG, carried as
    a bands·planes-row BROADCAST DataFrame (r7 re-plan — the first cut
    inlined bands*planes*dim literal expressions into both sides of the
    self-join, and Catalyst re-analyzed the thousands-of-nodes tree on
    every run: 8.6 s at sf0.1 for 2,000 vectors; the data-not-literals
    plan measures 2.0 s, identical output).  Shape: one broadcast
    cross join computes every (vector, plane) sign once, one bounded
    groupBy folds signs into an integer band pattern, the self-join
    equi-joins on (band, pattern) carrying IDS ONLY (the pair-dedup
    shuffle moves two longs, not two vectors), and candidates re-attach
    vectors by id-join for the exact-cosine verify — no false
    positives; no cartesian anywhere."""
    import math

    import numpy as np

    from .cache import tracked_persist

    # corpus stats: callers that know them (e.g. via the memoized
    # sources.tables.corpus_stats) pass n_rows/dim and this function
    # plans with ZERO driver-side jobs (r9, VERDICT r8 item 5)
    if dim is None:
        # first NON-NULL vector's size: size(NULL) is -1 under the
        # default legacy sizeOfNull, so filter nulls out explicitly
        dim_row = (
            embeddings.where(F.col(vec_col).isNotNull())
            .select(F.size(vec_col).alias("d"))
            .first()
        )
        dim = None if dim_row is None else dim_row["d"]
    if dim is None or dim < 1:
        # empty corpus (or an all-null vector column): no hyperplanes to
        # draw and no pairs to emit — return the empty pair schema
        return embeddings.limit(0).select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cosine"),
        )
    if planes_per_band is None or bands is None:
        n = n_rows if n_rows is not None else embeddings.count()
        if planes_per_band is None:
            # Random (dissimilar) pairs agree with a plane w.p. 1/2, so
            # a band's RANDOM collision rate with 1-bit probing is
            # (1+r)/2^r and expected junk candidates per band are
            # ~N²(1+r)/2^(r+1).  Pick r by fixed point so that volume
            # is ~128·N per band (linear in N, occupancy-style
            # constant); the 24-bit cap keeps the pattern in int range
            # with room for the probe flips.
            r = 4
            for _ in range(3):
                r = min(24, max(4, int(math.ceil(
                    math.log2(max(n, 2) * (1 + r) / 128.0)))))
            planes_per_band = r
        if bands is None:
            p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
            eta = p ** planes_per_band
            if probe_bits == 1:
                eta += planes_per_band * p ** (planes_per_band - 1) * (1.0 - p)
            # pairs AT the threshold hit this bound; closer pairs only
            # exceed it.  Clamp BOTH ends: threshold >= 1.0 makes p = 1
            # and eta = 1.0 exactly (log(0) below — every band collides,
            # 2 bands trivially meet any target); threshold <= -1.0
            # makes p = 0 and eta = 0.0 (log(1) = 0 divisor).
            eta = min(max(eta, 1e-12), 1.0 - 1e-12)
            rt = min(recall_target, 1.0 - 1e-12)  # same log(0) hazard
            wanted = max(2, int(math.ceil(
                math.log(1.0 - rt) / math.log(1.0 - eta)
            )))
            bands = min(64, wanted)
            if wanted > bands:
                achieved = 1.0 - (1.0 - eta) ** bands
                warnings.warn(
                    f"hyperplane_lsh_pairs: band cap binds ({wanted} bands "
                    f"needed for recall {recall_target:.3f} at threshold "
                    f"{threshold}, capped at {bands}; analytic recall at the "
                    f"threshold is ~{achieved:.3f}).  At low thresholds or "
                    f"large corpora prefer ivf_topk or raise threshold.",
                    stacklevel=2,
                )
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bands * planes_per_band, dim))

    # r11 REWRITE (guide §4.2 + §1.2) — same bands/planes/seed/probing,
    # so the candidate set and the verified output are unchanged; what
    # changed is WHO does the arithmetic:
    #
    # - Signatures: the r7-r10 plan computed every (vector, plane) sign
    #   via a broadcast crossJoin + a (id, band) hash aggregate — one
    #   exchange plus bands·planes interpreted higher-order dot folds
    #   per vector (HigherOrderFunction is CodegenFallback; measured
    #   2.8 s of the 6.5 s bench row at sf0.1).  Now ONE vectorized
    #   pandas_udf computes all band patterns per batch with a single
    #   (batch × dim)·(dim × bands·planes) float64 matmul — a narrow
    #   projection, no exchange, no per-plane fold.  Sign parity with
    #   the JVM fold holds everywhere except a dot of EXACTLY 0.0
    #   flipped by reassociation (measure-zero under Gaussian planes;
    #   an all-zero or NULL vector still patterns identically, and a
    #   flipped sign could only perturb the CANDIDATE set — the exact
    #   verify below re-filters, so no false positive can surface).
    # - Candidates + margin filter: the old plan self-joined id-only
    #   buckets, deduped ~1.2M candidate pairs (sf0.1) and re-attached
    #   vectors to run ~1.2M MORE interpreted dot folds.  Now the
    #   bucket join is a cogrouped applyInPandas on (band, pattern)
    #   whose kernel scores each bucket's probe×index cosine matrix
    #   with one matmul and emits ONLY near-threshold id pairs
    #   (threshold − 1e-6 margin — the same reassociation-safe margin
    #   discipline as ``_block_pair_candidates``).  Survivors are
    #   deduped (hundreds of rows, not 1.2M) and re-verified with the
    #   exact sequential JVM fold, so the reported cosines are
    #   bit-identical to the old plan and the exact tier.
    # Scale: shuffled bytes are probe rows × dim = (1+r)·bands·N
    # vectors, the same order as the old plan's candidate re-attach
    # (~128·N pairs each dragging a vector through the verify join),
    # and the per-bucket matmul replaces per-pair interpreted folds.
    margin = threshold - 1e-6
    n_bands, n_planes = bands, planes_per_band
    do_probe = probe_bits == 1
    # read the module global HERE (driver side) so the kernel closes
    # over a plain int — tests can monkeypatch the module constant and
    # be certain the executor-side kernel sees the patched value
    probe_chunk = _LSH_PROBE_CHUNK

    @F.pandas_udf("array<int>")
    def _patterns(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np  # noqa: PLC0415 — executor-side import

        pt = planes.T  # (dim, bands*planes)
        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype=object)
                continue
            rows = [
                np.zeros(dim) if v is None else np.asarray(v, dtype=np.float64)
                for v in s
            ]
            m = np.stack(rows)
            # NULL vector: the JVM fold yields a NULL dot -> bit 0 per
            # plane -> pattern 0; zeros @ planes = 0.0 >= 0 would set
            # every bit, so null rows are forced to all-zero patterns.
            nulls = np.array([v is None for v in s])
            bits = (m @ pt) >= 0  # NaN >= 0 is False, matching the JVM
            pats = np.zeros((m.shape[0], n_bands), dtype=np.int32)
            for b in range(n_bands):
                for j in range(n_planes):
                    pats[:, b] |= bits[:, b * n_planes + j].astype(
                        np.int32
                    ) << j
            pats[nulls, :] = 0
            yield pd.Series(list(pats))

    embp = tracked_persist(
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _patterns(F.col(vec_col)).alias("pats"),
        )
    )
    sig = embp.select(
        "id", "v", F.posexplode("pats").alias("band", "pattern")
    )
    if do_probe:
        # Multi-probe (r8, VERDICT r7 item 6): the PROBE side also
        # visits each pattern at Hamming distance 1 (one sign bit
        # flipped), raising per-band collision probability from p^r to
        # p^r + r·p^(r-1)(1-p).  Hamming-1 is symmetric, so probing ONE
        # side of the a<b bucket join covers every such pair exactly
        # once before the dedup.
        probe = sig.select(
            "id",
            "v",
            "band",
            F.explode(
                F.expr(
                    "array_union(array(pattern), transform("
                    f"sequence(0, {planes_per_band - 1}),"
                    " i -> pattern ^ shiftleft(1, i)))"
                )
            ).alias("pattern"),
        )
    else:
        probe = sig

    def _bucket_kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np  # noqa: PLC0415 — executor-side import

        # empty frames slice the INPUT id column so the output dtype
        # always follows the caller's id type (ADVICE r11: the old
        # hard-coded int64 empties broke non-bigint ids)
        empty = pd.DataFrame(
            {"id_a": lpdf["id"].iloc[:0], "id_b": rpdf["id"].iloc[:0]}
        )
        if lpdf.empty or rpdf.empty:
            return empty
        la = [v for v in lpdf["v"]]
        rb = [v for v in rpdf["v"]]
        lmask = np.array([v is not None for v in la])
        rmask = np.array([v is not None for v in rb])
        if not lmask.any() or not rmask.any():
            return empty
        va = np.stack(
            [np.asarray(v, dtype=np.float64) for v, m in zip(la, lmask) if m]
        )
        vb = np.stack(
            [np.asarray(v, dtype=np.float64) for v, m in zip(rb, rmask) if m]
        )
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0.0] = 1.0
        nb[nb == 0.0] = 1.0
        ia = lpdf["id"].to_numpy()[lmask]
        ib = rpdf["id"].to_numpy()[rmask]
        # r12 (VERDICT r11 item 1): chunk the probe side so one
        # degenerate hot bucket (many near-identical vectors sharing a
        # pattern) costs O(chunk × |bucket|) floats per matmul instead
        # of O(|bucket|²) — the old single matmul OOMed the Python
        # worker exactly where the corpus is most duplicated.  Same
        # arithmetic per pair (each probe row still meets each index
        # row once, the normalized index matrix is built once), so the
        # emitted pair set is identical.
        vbn = vb / nb[:, None]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s in range(0, va.shape[0], probe_chunk):
            sl = slice(s, s + probe_chunk)
            sim = (va[sl] / na[sl][:, None]) @ vbn.T
            ii, jj = np.nonzero((sim >= margin) & (ia[sl][:, None] < ib[None, :]))
            if len(ii):
                out_a.append(ia[sl][ii])
                out_b.append(ib[jj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    # output ids keep the caller's id type (ADVICE r11 — the kernel is
    # generic over id_col; bigint was hard-coded before)
    id_dt = embeddings.schema[id_col].dataType.simpleString()
    cand = (
        probe.groupBy("band", "pattern")
        .cogroup(sig.groupBy("band", "pattern"))
        .applyInPandas(_bucket_kernel, f"id_a {id_dt}, id_b {id_dt}")
        .dropDuplicates(["id_a", "id_b"])
    )
    av = embp.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        norm(F.col("v")).alias("na"),
    )
    bv = embp.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        norm(F.col("v")).alias("nb"),
    )
    return (
        cand.join(av, "id_a")
        .join(bv, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                _cosine_pre(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
