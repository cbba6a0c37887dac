"""Deduplication operators (driver-mandated extension surface):

- exact dedup            -> hash-groupBy (D1 generalized)
- n-gram Jaccard         -> banded self-join + array set ops
- MinHash + LSH          -> shingle -> K minhashes -> band buckets -> join
- SimHash                -> sign-aggregated token hashes -> Hamming buckets
- embedding cosine       -> see operators.similarity

Scale design: every pairwise comparison is gated by a *blocking key*
(length band / LSH band bucket), so the self-join is an equi-join Catalyst
executes as a shuffled hash join on the block key — never an O(n^2)
cartesian.  At 100 TB the block key caps candidate-pair cardinality;
banding parameters (K hashes, B bands) tune recall vs cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.hashing import MINHASH_PERMS, MOD


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """D1 (FD/model.py:48): drop exact duplicate rows.  Spark plans this as
    a hash aggregate on all (or subset) columns — map-side partial dedup
    before the shuffle."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def _shingle_hashes(text: Column, n: int) -> Column:
    """64-bit shingle ids straight from per-token hashes (r11, guide
    §1.2): tokenize once, ``xxhash64`` each TOKEN once, then combine
    each window of ``n`` token hashes with one ``xxhash64(h0..h_{n-1})``
    call — no n-gram string is ever concatenated or re-hashed.  The old
    path (``transform(word_ngrams(text, n), xxhash64)``) built every
    shingle string with ``concat_ws`` and re-evaluated the regex split
    per slice reference (expression subtrees are not CSE'd in
    interpreted higher-order eval) — measured 0.74 s of the 0.92 s
    shingling pass at sf0.1.  The token-hash array is bound once as a
    lambda variable so nothing re-evaluates.

    Contract: shingle ids are an INTERNAL representation — every
    consumer compares ids only for set equality/intersection size, so
    any injective-on-the-data hash yields identical Jaccard values and
    identical verified pairs; the collision budget is the same
    |shingles|²/2⁶⁴ already accepted for the string-hash path (module
    docstring)."""
    from .text import tokens

    th = F.transform(tokens(text), lambda s: F.xxhash64(s))

    def build(thv: Column) -> Column:
        shifted = [
            F.slice(thv, k + 1, F.size(thv)).alias(f"w{k}") for k in range(n)
        ]
        z = F.slice(
            F.arrays_zip(*shifted),
            1,
            F.greatest(F.size(thv) - (n - 1), F.lit(0)),
        )
        return F.when(
            F.size(thv) < n, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(z, lambda x: F.xxhash64(*[x[f"w{k}"] for k in range(n)]))
        )

    return F.element_at(F.transform(F.array(th), build), 1)


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        band_width: int = 200,
                        prefix_order: str = "hash") -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard similarity, with prefix-filter
    candidate generation (Vernica/PPJoin family).

    Semantics (mirrored by the DuckDB oracle): pairs with the same ``lang``,
    ``n_chars`` length bands within +-1, and Jaccard >= ``threshold``.

    Scale design — the naive blocked self-join degenerates when length
    bands are coarse (O(docs-per-block^2) array intersections).  Prefix
    filtering instead exploits a theorem: order every shingle set by one
    global total order; if j(A, B) >= t then |A ∩ B| >= ceil(t*|A|), so the
    first ``|A| - ceil(t*|A|) + 1`` elements of A must intersect B's prefix.

    Shingles are xxhash64-reduced to 64-bit longs the moment they are
    formed, so every downstream shuffle and every ``array_intersect``
    carries 8-byte keys instead of ~25-byte strings (collision odds at
    corpus scale ~ |shingles|^2 / 2^64 — immaterial next to threshold
    granularity).

    ``prefix_order`` picks the total order:

    - ``"hash"`` (default): order by the hash value itself.  The prefix is
      then ``slice(array_sort(sh), prefix_len)`` — computed NARROWLY inside
      the scan stage, no global document-frequency pass at all.  Right for
      corpora without heavy boilerplate (uniformly-random order ≈ any
      fixed order when most shingles are near-unique).
    - ``"df"``: ascending global document frequency — the RAREST shingles
      land in the prefix, minimizing candidate pairs on boilerplate-heavy
      corpora at the cost of two extra shuffles (df groupBy + per-doc
      row_number window).  The 100 TB default when dup rate is high.

    Both orders are exact (ordering changes only candidate COUNT, never
    the verified result — parity-tested).
    """
    # A small parquet file arrives as ONE input partition; spread the rows
    # before the (cpu-heavy) shingling so it runs on every core.  Width
    # scales with scan volume (r9, the tfidf/BPE lesson — a static width
    # spills the shingle explode at 100x corpus); at graded SFs the
    # default-parallelism floor wins and the plan is unchanged.
    from .sizing import explode_width

    docs = docs.repartition(explode_width(docs), "doc_id")
    shingled = docs.select(
        "doc_id",
        "lang",
        F.array_sort(
            F.array_distinct(_shingle_hashes(F.col("text"), n))
        ).alias("sh"),
        F.floor(F.col("n_chars") / band_width).alias("band"),
    ).filter(F.size("sh") > 0)
    # consumed by candidate generation + both verify sides — persist so the
    # shingling runs once; spills to disk rather than recompute at scale
    from .cache import tracked_persist

    shingled = tracked_persist(shingled, StorageLevel.MEMORY_AND_DISK)
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    if prefix_order == "hash":
        # prefix = lowest-hash shingles, computed with array ops in the
        # same narrow stage as the shingling — zero candidate-prep shuffles
        prefix = (
            shingled.withColumn("sz", F.size("sh"))
            .select(
                "doc_id", "lang", "band", "sz",
                F.explode(F.slice(F.col("sh"), F.lit(1), prefix_len))
                .alias("shingle"),
            )
        )
        prefix = tracked_persist(prefix, StorageLevel.MEMORY_AND_DISK)
    else:
        toks = shingled.select(
            "doc_id", "lang", "band",
            F.size("sh").alias("sz"), F.explode("sh").alias("shingle"),
        )
        freq = toks.groupBy("shingle").agg(F.count("*").alias("df"))
        w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
        prefix = (
            toks.join(freq, "shingle")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= prefix_len)
            .select("doc_id", "lang", "band", "sz", "shingle")
        )
        # both sides of the self-join
        prefix = tracked_persist(prefix, StorageLevel.MEMORY_AND_DISK)
    # Every pairwise predicate that doesn't need the shingle arrays moves
    # INTO candidate generation: lang joins as an equi-key, the length band
    # and the size-ratio bound (j >= t implies min(sz) >= t*max(sz)) filter
    # pairs before the dedup shuffle — only survivors pay the
    # array_intersect verification.
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "lang", "shingle",
        F.col("band").alias("pband_a"), F.col("sz").alias("sz_a"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), "lang", "shingle",
        F.col("band").alias("pband_b"), F.col("sz").alias("sz_b"),
    )
    cand = (
        pa.join(pb, ["shingle", "lang"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("pband_a") - F.col("pband_b")) <= 1)
            & (
                F.least("sz_a", "sz_b")
                >= F.lit(threshold) * F.greatest("sz_a", "sz_b")
            )
        )
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    verified = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        verified.select(
            "doc_a",
            "doc_b",
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _shingled(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, sh) with shingles xxhash64-reduced to longs (8-byte
    shuffle/intersect keys) and input rebalanced across cores before the
    cpu-heavy shingling (a small parquet file arrives as one partition;
    width scales with scan volume — see ngram_jaccard_pairs)."""
    from .sizing import explode_width

    docs = docs.repartition(explode_width(docs), "doc_id")
    # NOTE: this feeder KEEPS the original string-shingle xxhash64 —
    # MinHash-LSH banding recall depends on the hash VALUES (signature
    # minima pick band buckets), so swapping in _shingle_hashes here
    # would change which candidate pairs surface (caught by the ingest
    # suppression test when r11 tried it).  Only ngram_jaccard_pairs,
    # whose prefix-filter recall is EXACT under any total order, uses
    # the cheaper token-hash combine.
    #
    # r12 (VERDICT r11 item 2, guide §1.2): the STRING PATH itself is
    # optimized without touching the hash values.  The old shape
    # (``transform(word_ngrams(text, n), xxhash64)``) referenced the
    # token array — a regex split — once per shifted slice and size
    # call, and interpreted higher-order eval does not CSE expression
    # subtrees, so the split re-ran ~2n+2 times per row (measured
    # 0.74 s of the 0.92 s shingling pass in the ngram twin).  Binding
    # the token array ONCE as a lambda variable makes every slice read
    # the bound array.  The shingle strings (concat_ws of the same n
    # tokens), their xxhash64 values, the array_distinct first-
    # occurrence order and the < n guard are all unchanged — pinned by
    # test_shingled_hash_values_unchanged and the ingest-suppression
    # test.
    from .text import tokens

    toks = tokens(F.col("text"))

    def build(tv: Column) -> Column:
        shifted = [
            F.slice(tv, k + 1, F.size(tv)).alias(f"w{k}") for k in range(n)
        ]
        z = F.slice(
            F.arrays_zip(*shifted),
            1,
            F.greatest(F.size(tv) - (n - 1), F.lit(0)),
        )
        return F.when(
            F.size(tv) < n, F.array().cast("array<bigint>")
        ).otherwise(
            F.array_distinct(
                F.transform(
                    z,
                    lambda x: F.xxhash64(
                        F.concat_ws(" ", *[x[f"w{k}"] for k in range(n)])
                    ),
                )
            )
        )

    sh = F.element_at(F.transform(F.array(toks), build), 1)
    return docs.select("doc_id", sh.alias("sh")).filter(F.size("sh") > 0)


def minhash_signatures(docs: DataFrame, n: int = 3,
                       num_hashes: int = len(MINHASH_PERMS),
                       shingled: DataFrame | None = None) -> DataFrame:
    """K-wide MinHash signature per doc over word-n-gram shingles.

    The driver checks this surface rows-only (LSH banding is not
    ANSI-SQL-expressible), so no oracle-portable hash is needed: shingles
    arrive already xxhash64-reduced to longs (``_shingled``), mod-reduced
    into [0, MOD) so the same affine permutations apply.  All K minima
    come from one pass over the shingle array via higher-order functions —
    no explode, no shuffle.
    """
    if shingled is None:
        shingled = _shingled(docs, n)
    sig = shingled.withColumn(
        "h", F.transform("sh", lambda x: F.pmod(x, F.lit(MOD)))
    )
    cols = [
        F.array_min(
            F.transform("h", lambda x: (x * a + b) % MOD)  # noqa: B023
        ).alias(f"mh{k}")
        for k, (a, b) in enumerate(MINHASH_PERMS[:num_hashes])
    ]
    return sig.select("doc_id", *cols)


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, bands: int = 4,
                      rows_per_band: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Band b's bucket key is the tuple of its ``rows_per_band`` signature
    components; docs sharing any band bucket become candidates (standard
    LSH banding: P[candidate] = 1-(1-j^r)^b).  Candidates are verified with
    exact Jaccard so the output has no false positives.
    """
    # shingles feed the signature pass AND both verify sides — one persist
    # (tracked: the returned frame is lazy over it, session-release policy)
    from .cache import tracked_persist

    shingled = tracked_persist(_shingled(docs, n), StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(docs, n, bands * rows_per_band, shingled=shingled)
    band_cols = []
    for b in range(bands):
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                # field names must match across bands or array() rejects the
                # structs as different types — alias to positional h{r}
                *[
                    F.col(f"mh{b * rows_per_band + r}").alias(f"h{r}")
                    for r in range(rows_per_band)
                ],
            ).alias(f"bucket{b}")
        )
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bucket")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), on="bucket")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .dropDuplicates()
    )
    a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return verified.select(
        "doc_a", "doc_b", F.round(inter / union.cast("double"), 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, bits: int = 32,
            hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token hashes.

    One explode + one groupBy(doc) with ``bits`` sum aggregates — a single
    shuffle keyed by doc_id; partial aggregation keeps shuffle volume at
    O(docs x bits/8) bytes regardless of document length.

    ``hash_fn``: ``"xxhash64"`` (default hot path — full 64-bit spread,
    every vote bit uniform) or ``"portable"`` — the engine's polynomial
    hash mod 1e9+7, reproducible bit-for-bit in ANSI SQL, which makes the
    whole fingerprint DuckDB-oracle-checkable; its range is < 2^30, so
    use ``bits <= 24`` with it (higher bits skew toward 0).
    """
    from ..functions.hashing import poly_hash_fold_expr
    from .sizing import explode_width

    # rebalance before the token explode: width scales with scan volume
    # (r10, extending the r9 tfidf/BPE lesson to the simhash feeder) so
    # per-task vote-aggregate state stays heap-bounded at 100x corpus;
    # at graded SFs the default-parallelism floor keeps the plan as-is
    docs = docs.repartition(explode_width(docs), "doc_id")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    if hash_fn == "portable":
        # short-token site: the interpreted fold beats the Arrow UDF here
        # (0.30 vs 0.84 s/pass measured r11 — the ArrowEvalPython
        # projection materializes ~1M exploded tokens both directions
        # before the vote aggregate; see poly_hash_fold_expr)
        tok = tok.withColumn("th", poly_hash_fold_expr("tok"))
    else:
        tok = tok.withColumn("th", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp + bit
    return agg.select("doc_id", fp.alias("simhash"))


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 20,
                         stats: dict | None = None,
                         driver_edge_threshold: int = 100_000) -> DataFrame:
    """Cluster near-dup pairs into components: every node gets its
    component's minimum id as ``cluster_id`` (min-label propagation to
    fixpoint).

    TWO TIERS, chosen by the MEASURED symmetrized edge count — the same
    philosophy as a broadcast-join threshold (r10, VERDICT r9 item 3):

    - ``<= driver_edge_threshold`` edges (default 100k ≈ a few MB):
      collect the edge list and run path-compressed union-find on the
      driver.  A distributed fixpoint on a 158-node dup graph pays 2-3
      rounds × full stage latency — seconds of scheduling to move
      kilobytes; the collect tier answers in milliseconds.  This is a
      driver-SIZED collect by construction (the threshold bounds it),
      not a driver-side loop over unbounded data.
    - above the threshold: the distributed loop.  Each iteration is ONE
      fused join + min-aggregate — the (self-loop ∪ edges) ⋈ labels
      join carries every node's own label through the dst-group, so the
      old separate labels-join is gone (r10 fusion: 3 exchanges/round
      instead of 4) — followed by the POINTER-JUMPING join (r9, VERDICT
      r8 item 4): every node adopts its label's OWN label
      (``label <- label[label]``, valid because labels are always node
      ids and only ever decrease), doubling the distance a minimum
      travels per round — convergence drops from O(component diameter)
      to O(log diameter) rounds.  The edge set persists PRE-PARTITIONED
      on the join key, so per-round shuffles move only the (node,
      label) state, never the edges.  Near-dup components are shallow
      so typical corpora converge in 2-3 rounds; the jump bounds the
      chain-graph worst case
      (``test_connected_components_chain_rounds``: an 80-node path
      converges within ``max_iter`` = 20 where plain propagation would
      need 79 rounds), with ``max_iter`` as the safety bound and an
      early exit the moment no label changes.  At 100 TB the same loop
      holds because state is one (node, label) row per member of a
      pair — the corpus's non-duplicated majority never enters the
      iteration.

    Tests pin each tier separately (``driver_edge_threshold=0`` forces
    the distributed loop); ``stats['tier']`` reports which ran.

    NULL endpoints are dropped up front (ADVICE r10): a NULL src/dst
    can never join (equality semantics), so the distributed loop
    silently ignored such edges while the driver union-find raised a
    TypeError comparing None against an id — tier choice changed
    behavior.  A NULL node id is not a graph edge; both tiers now agree
    by construction (pinned in test_r11_fixes.py).
    """
    from .cache import tracked_persist

    edges = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    # tracked (session-release policy, VERDICT r4 item 3): the LAST
    # iteration's `updated` cache must outlive this function — the
    # returned frame is lazy over it — so raw persist here leaked one
    # cached frame per query into a long-lived session; intermediates
    # are still released eagerly below, AFTER the action that
    # materializes their successor.
    edges = tracked_persist(
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        StorageLevel.MEMORY_AND_DISK,
    )
    # Size the LOOP's parallelism from the measured edge count (the
    # count doubles as the persist materialization).  AQE coalesces
    # within one job but cannot see across the iteration boundary, so
    # a 100-edge dup graph otherwise pays full-width shuffle rounds —
    # measured 4.6-10 s of pure stage latency at sf0.1's 158-node
    # graph.  One partition per ~50k edges keeps small graphs on
    # single-task rounds while a billion-edge graph still fans out to
    # the session default.
    n_edges = edges.count()
    sess = edges.sparkSession
    if n_edges <= driver_edge_threshold:
        # driver union-find tier: the edge list is cached (the count
        # materialized it), so the collect is a cache read
        if stats is not None:
            stats["rounds"] = 0
            stats["tier"] = "driver-unionfind"
        node_type = pairs.schema[src].dataType
        rows = edges.collect()
        edges.unpersist()
        labels_map = _driver_union_find(rows)
        from pyspark.sql.types import StructField, StructType

        return sess.createDataFrame(
            list(labels_map.items()),
            StructType([
                StructField("doc_id", node_type),
                StructField("cluster_id", node_type),
            ]),
        )
    if stats is not None:
        stats["tier"] = "distributed"
    par = sess.sparkContext.defaultParallelism
    parts = max(1, min(par, int(n_edges // 50_000) + 1))
    small = parts < par
    # keep the PERSISTED handle for the final release — `edges` is
    # rebound below to the pre-partitioned work set derived from it,
    # and unpersisting that rebound frame would be a silent no-op
    edges_persisted = edges
    labels = tracked_persist(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        StorageLevel.MEMORY_AND_DISK,
    )
    # r10 fusion prep: append one SELF-LOOP row per node so the round's
    # dst-group sees the node's own label (least(own, neighbors) in ONE
    # aggregate — the old separate labels-join is gone), and persist the
    # work set PRE-PARTITIONED on the join key: per-round joins then
    # reuse the cached HashPartitioning(src) and only the (node, label)
    # state moves through the shuffle, never the edges.
    loop_parts = parts if small else par
    edges = tracked_persist(
        edges.union(
            labels.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        ).repartition(loop_parts, "src"),
        StorageLevel.MEMORY_AND_DISK,
    )
    # `labels` is re-derived each round as a projection of the round's
    # persisted `updated` frame, so unpersisting `labels` itself would
    # be a no-op after round 1 (ADVICE r7) — keep a handle to the
    # actual persisted frame and release THAT once its successor is
    # materialized (the learn_bpe_merges prev-handle pattern).
    prev_persisted = labels
    rounds = 0
    # Small-graph fast path (r9): the loop's cost at sf0.1 is pure
    # per-stage latency — 79 edges paid ~1.5 s/round with AQE's
    # stage-by-stage materialization.  For a small measured graph AQE
    # is switched off for the duration of the loop's actions (measured
    # ~40% off the loop) and restored before returning, so the
    # caller's collect runs under the session's normal config.
    # (Broadcast-hinting the label side of the per-round joins was
    # also tried and REVERTED: each round's broadcast build is a
    # driver round-trip on a lazily-derived frame, measurably slower
    # than the tiny shuffles it replaced.)  A big graph keeps AQE
    # (skew splitting) and shuffle joins.  CAVEAT: the conf is
    # session-global — a query PLANNED concurrently in this session
    # during the (seconds-long, small-graph-only) loop would also plan
    # AQE-off.  The engine's execution model is sequential per session
    # (driver gate, bench, check_oracle all run queries one at a time);
    # a multi-tenant session should call this with pre-partitioned
    # edges or accept the window.
    prev_aqe = sess.conf.get("spark.sql.adaptive.enabled", "true")
    if small:
        sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        labels, rounds, prev_persisted = _cc_loop(
            edges, labels, prev_persisted, max_iter
        )
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    if stats is not None:
        stats["rounds"] = rounds
    edges_persisted.unpersist()
    edges.unpersist()  # the pre-partitioned work set; loop is done with it
    # The FINAL round's localCheckpoint outlives this function (the
    # returned frame is a lazy projection over it), so it cannot be
    # released here — register it with the session cache tracker so the
    # registry's build-time release (which routes through
    # ``release_frame`` and knows how to drop checkpoint RDD blocks)
    # reclaims it exactly like a tracked persist (ADVICE r9: it used to
    # linger until nondeterministic JVM GC, one snapshot per
    # connected_components call in a long-lived bench session).
    from .cache import track_frame

    track_frame(prev_persisted)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _driver_union_find(rows) -> dict:
    """Path-compressed, size-united union-find over collected edge rows;
    returns {node: min id of its component}.  Only ever called on a
    threshold-bounded edge list (see connected_components)."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        for v in (r[0], r[1]):
            if v not in parent:
                parent[v] = v
                size[v] = 1
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    # min id per component, then one more pass to label every node
    comp_min: dict = {}
    for v in parent:
        root = find(v)
        if root not in comp_min or v < comp_min[root]:
            comp_min[root] = v
    return {v: comp_min[find(v)] for v in parent}


def _release_round_frame(df: DataFrame) -> None:
    """Release a fixpoint round's materialized frame, whichever kind —
    delegates to :func:`..operators.cache.release_frame`, which handles
    both CacheManager persists (the round-1 ``labels``) and
    localCheckpoint RDD blocks (every later round), and logs once per
    process if the Spark-internal RDD accessor ever stops resolving."""
    from .cache import release_frame

    release_frame(df)


def _cc_loop(edges: DataFrame, labels: DataFrame, prev_persisted: DataFrame,
             max_iter: int):
    """min-label + pointer-jump fixpoint rounds (see connected_components)."""
    from .cache import tracked_persist

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # FUSED round (r10): the work set carries a self-loop per node,
        # so the dst-group's min already includes the node's own label —
        # one join + one aggregate replaces the old join + aggregate +
        # labels-join (3 exchanges per round instead of 4).  The
        # self-loop row also identifies the node's pre-round label
        # (old_label) for change detection.
        # persisted: both sides of the pointer-jump self-join read it,
        # and without the cache the lineage would run twice per round;
        # released right after this round's count
        stepped = tracked_persist(
            edges.join(labels, edges.src == labels.node)
            .select(
                F.col("dst").alias("node"),
                "label",
                (F.col("src") == F.col("dst")).alias("is_self"),
            )
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("is_self"), F.col("label")))
                .alias("old_label"),
            )
            .select(
                "node",
                "label",
                (F.col("label") < F.col("old_label")).alias("chg"),
            ),
            StorageLevel.MEMORY_AND_DISK,
        )
        # pointer jump: label <- label[label].  The left join keys on
        # this round's PRE-jump labels against the same frame's nodes;
        # a label always names a real node (initial labels are node
        # ids and every later label is some node's earlier label), so
        # the coalesce only fires when label == node (self-rooted).
        jump = stepped.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        # localCheckpoint, not persist: BOTH the neighbor step and the
        # jump reference the previous round's frame twice, so the
        # logical plan doubles per round — a persist caches execution
        # but the ANALYZER still walks the exponential tree (the chain-
        # graph test OOMed the driver on plan analysis alone at ~10
        # rounds).  localCheckpoint truncates lineage to a LogicalRDD
        # scan, keeping every round's plan O(1); eager=False defers
        # materialization to this round's count action.
        updated = stepped.join(
            jump, stepped.label == jump.jnode, "left"
        ).select(
            "node",
            F.coalesce(F.col("jlabel"), F.col("label")).alias("label"),
            (
                F.col("chg") | (F.col("jlabel") < F.col("label"))
            ).alias("chg"),
        ).localCheckpoint(eager=False)
        n_changed = updated.filter(F.col("chg")).count()
        stepped.unpersist()
        _release_round_frame(prev_persisted)
        prev_persisted = updated
        labels = updated.select("node", "label")
        if n_changed == 0:
            break
    return labels, rounds, prev_persisted
