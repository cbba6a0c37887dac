"""SparkSession factory.

Local testing runs on ``local[N]``; the configs below are chosen so the
same logical plans scale to a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong, AQE re-plans from map output stats.
- ``spark.sql.shuffle.partitions`` sized for the local test harness; on a
  real cluster AQE's coalesce makes the initial number a ceiling, not a fix.
- Arrow enabled for any pandas-interop path (Pandas UDFs batch via Arrow).
- Session timezone pinned to UTC so event-time functions are deterministic
  across engines (the DuckDB oracle also runs wall-clock/UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "fraud-engine", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r11 (guide §2.4): let AQE re-plan the output partitioning of
        # CACHED plans.  The iterative operators (BFS frontiers, edge
        # lists, rank state) persist intermediates; with the default
        # (false) every cached exchange materializes at the static
        # pre-AQE partition count and every downstream stage inherits it
        # — measured 2869 tasks for a 4-row BFS result at sf0.1, and the
        # same static-count hazard inverted at 100 TB (cached state
        # pinned to TOO FEW partitions).  With AQE sizing cached
        # exchanges from map-output stats the layout adapts to the data
        # at any scale (khop 2869→823 tasks, adamic_adar 4.5→2.2 s,
        # pagerank_copart 5.5→2.6 s; full A/B in OPTIMIZATION_r11.md).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        # r11 (guide §3.1/§9): allow shuffled-hash join where the
        # planner's size conditions hold instead of always sort-merge —
        # skips the per-partition sorts.  Two distinct gates (ADVICE r11
        # correction): the AQE maxShuffledHashJoinLocalMapThreshold only
        # governs AQE's runtime SMJ→SHJ rewrite, by ACTUAL map-output
        # size (64 MB per partition, same bound as the broadcast
        # threshold below); the STATIC planner's SHJ pick under
        # preferSortMergeJoin=false is gated by its own estimate-based
        # conditions (build side < advisoryPartitionSize × shuffle
        # partitions AND 3× smaller than the probe side), and an SHJ
        # build side does not spill — a bad estimate there can still
        # OOM a task.  Accepted here because every catalog join under
        # this flag builds from either a persisted frame (stats are
        # actual sizes, not guesses) or a scan with parquet size stats;
        # a cluster deployment with unstatted inputs should prefer
        # leaving preferSortMergeJoin=true and relying on the AQE
        # threshold alone.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local[32] puts all 32 task threads in the ONE driver JVM.  8g is
        # the measured sweet spot on this box: bigger heaps make the
        # allocation-heavy near-dup self-joins 4-6x SLOWER (G1 prefers
        # churning a big heap to spilling; disk spill of the shingle
        # arrays is cheaper than the extra GC).  On a real cluster this
        # maps to executor sizing: many modest executors over few huge ones.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The default whole-stage-codegen class cache holds 100 entries; a
        # session that runs a catalog of 100+ distinct plans (this engine's
        # bench, any BI workload) evicts constantly and pays Janino
        # recompilation on EVERY re-run — measured 19.4 s vs 1.8 s for the
        # expression-heavy near-dup plans (16 minhash lambdas compile to
        # ~MB of generated code).  Static conf, so it must be set before
        # the first session starts.
        .config("spark.sql.codegen.cache.maxEntries", "3000")
    )
    return builder.getOrCreate()
