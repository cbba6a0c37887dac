"""Batch sources and sinks beyond parquet (SURVEY.md §2.1).

S1  CSV scan          — the reference's training-table load
                        (FD/model.py:85-86) with an ENFORCED schema
                        instead of pandas inference.
S3  Kafka sink        — wire-format writer (FD/producer.py:14-17,133).
S8  JSON sink/scan    — metrics artifacts (FD/model.py:194-197,
                        FD/dashboard.py:39-44).
S10 JDBC sink         — the reference declared a PostgreSQL connection
                        and never used it (FD/consumer.py:28-35); here it
                        is a real ``foreachBatch`` sink factory.

Scale notes: CSV/JSON scans parallelize per file split; the JDBC sink
writes per partition with controlled fan-in (``numPartitions``) so a
1000-executor job doesn't open 32k connections against one database.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TXN_SCHEMA


def read_transactions_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: schema-enforced CSV scan of the training table.

    ``mode=PERMISSIVE`` nulls malformed fields instead of aborting the
    scan (the reference's pandas read would throw); the explicit schema
    means no inference pass — ONE read of the data, predicate pushdown
    still applies to the projected columns.
    """
    return spark.read.csv(path, header=True, schema=TXN_SCHEMA, mode="PERMISSIVE")


def write_transactions_csv(df: DataFrame, path: str) -> None:
    """CSV writer (round-trip partner of :func:`read_transactions_csv`)."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_metrics_json(df: DataFrame, path: str) -> None:
    """S8 (FD/model.py:194-197): metrics table -> JSON-lines artifact.
    Coalesced to one file — metrics frames are tiny by construction."""
    df.coalesce(1).write.mode("overwrite").json(path)


def read_metrics_json(spark: SparkSession, path: str) -> DataFrame:
    """S8 (FD/dashboard.py:39-44): JSON artifact scan."""
    return spark.read.json(path)


def kafka_batch_sink(df: DataFrame, brokers: str, topic: str = "fraud_topic"):
    """S3 (FD/producer.py:14-17): serialize every row to the JSON wire
    format and publish.  Returns the configured writer (caller ``.save()``s
    so tests can inspect without a live broker)."""
    wire = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        wire.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )


def jdbc_batch_sink(df: DataFrame, url: str, table: str,
                    num_partitions: int = 8, **properties):
    """S10: batch JDBC writer with bounded connection fan-in."""
    writer = (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("numPartitions", str(num_partitions))
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    return writer


def foreach_batch_jdbc(url: str, table: str, num_partitions: int = 8,
                       **properties):
    """S10 streaming: ``writeStream.foreachBatch(foreach_batch_jdbc(...))``
    upserts each micro-batch over JDBC — the pattern the reference's dead
    psycopg2 code was reaching for."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_batch_sink(
            batch_df.withColumn("batch_id", F.lit(batch_id)),
            url, table, num_partitions, **properties,
        ).mode("append").save()

    return sink


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_cols: list[str],
                              sort_cols: list[str] | None = None) -> None:
    """Hive-style partitioned parquet layout — the storage shape that
    makes partition PRUNING (not just row-group skipping) possible: a
    filter on a partition column eliminates whole directories before any
    file is opened.

    ``sort_cols`` sorts within each output file so range predicates on
    those columns skip row groups via min/max stats — the cheap stand-in
    for clustered storage.  At 100 TB this is how the events table should
    land: partitioned by day, sorted by (user_id, ts)."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_orc(df: DataFrame, path: str,
              partition_cols: list[str] | None = None) -> None:
    """ORC sink (source-format complement to parquet): same columnar,
    predicate-pushdown-capable layout from Spark's second built-in
    columnar format — kept at full parity so a warehouse standardized on
    ORC can adopt the engine without a storage migration."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — filters and column pruning push down exactly as with
    parquet (vectorized reader, min/max row-group skipping)."""
    return spark.read.orc(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str,
                         n_buckets: int = 8,
                         sort_col: str | None = None) -> None:
    """Bucketed managed table: pre-shuffles rows into ``n_buckets`` by
    hash(bucket_col) at WRITE time, so every later equi-join or groupBy
    on that column skips its shuffle entirely (Catalyst sees the
    bucketing as a satisfied distribution requirement).

    This is the co-located-join strategy for repeatedly-joined 100 TB
    fact tables: pay the shuffle once at ingest, never per query."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_training_shards(df: DataFrame, path: str, shard_key: str,
                          records_per_file: int = 100_000,
                          n_shards: int | None = None) -> None:
    """Size-balanced training-shard writer: the layout a dataloader wants —
    many similar-sized files, rows spread evenly, order decorrelated from
    ingest order.

    ``repartitionByRange`` on the shard key gives near-equal partitions
    (range boundaries come from reservoir sampling the key), and
    ``maxRecordsPerFile`` caps file size so a skewed partition splits
    rather than producing one giant straggler file.  At 100 TB this is
    the difference between 10k x 10 GB files and one task writing a 1 TB
    file."""
    n = n_shards or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, shard_key)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .parquet(path)
    )


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of k non-negative integer columns:
    output bit ``i*k + j`` is bit ``i`` of column ``j``.

    Pure JVM bit arithmetic via an ``aggregate`` fold over bit indexes —
    no UDF, runs inside codegen.  Callers bucketize doubles/strings to
    ints first; values must fit in ``bits`` bits (the fold masks higher
    bits away, so out-of-range values degrade to collisions, never
    errors)."""
    k = len(cols)
    terms = " | ".join(
        f"shiftleft((cast({c} as bigint) >> i) & 1, i * {k} + {j})"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc | {terms})"
    )


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = 16) -> None:
    """Z-order clustered parquet writer: range-partition + sort on the
    Morton interleave of ``cols`` so file/row-group min-max stats become
    selective in EVERY interleaved dimension at once.

    A single-key sort clusters only its leading column — a predicate on
    the second key touches every file.  The Z-curve keeps multi-dim
    locality, so a box predicate on any subset of ``cols`` skips most
    row groups via plain parquet stats pushdown: the same mechanism
    Delta/Iceberg OPTIMIZE ZORDER relies on, built from
    ``repartitionByRange`` + ``sortWithinPartitions``.  At 100 TB this
    is the difference between scanning the fleet and scanning ~1/sqrt(N)
    of it for 2-D boxes.

    Each column is min-max scaled to the full ``bits`` range before
    interleaving — otherwise the widest key monopolizes the high Z bits
    and narrow keys get no clustering (Delta's OPTIMIZE ZORDER does the
    same with per-column range ids).  The min/max pass is one metadata
    aggregate; at scale it would come from table statistics."""
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = df
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = max(int(mx) - int(mn), 1)
        scaled = scaled.withColumn(
            f"__s_{c}",
            ((F.col(c) - F.lit(int(mn))).cast("double") * (top / span))
            .cast("bigint"),
        )
    z = zorder_key([f"__s_{c}" for c in cols], bits)
    (
        scaled.withColumn("__z", z)
        .drop(*[f"__s_{c}" for c in cols])
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: int = 256) -> tuple[int, int]:
    """Compact a parquet directory's small files into ~``target_file_mb``
    files, preserving rows and any hive-style partition layout.

    Streaming sinks (streaming/ingest.py, foreachBatch writers) commit
    one file set per micro-batch; after thousands of batches a 100 TB
    table becomes millions of KB-sized files and scan planning (listing,
    footer reads, task scheduling) dominates query time.  Compaction is
    the maintenance pass every table format schedules (Delta OPTIMIZE /
    Iceberg rewrite_data_files); here it is plain Spark:

    - file census is driver-side METADATA only (os.walk over the
      directory — never reads data);
    - rows are rewritten once through ``repartition(n)`` sized from the
      on-disk byte total, so output files land near the target size;
    - partition columns are re-derived from the directory layout by the
      parquet reader and re-applied with ``partitionBy`` on write, so
      downstream partition pruning is unchanged;
    - the rewrite goes to a sibling temp dir, then an atomic rename
      swap — readers see the old file set or the new one, never a mix.

    Returns (files_before, files_after).
    """
    import math
    import os
    import shutil
    import uuid

    def census(root: str) -> tuple[int, int]:
        n, total = 0, 0
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.endswith(".parquet"):
                    n += 1
                    total += os.path.getsize(os.path.join(dirpath, fn))
        return n, total

    files_before, total_bytes = census(path)
    df = spark.read.parquet(path)
    # hive-layout columns at any nesting level (lang=en/source=web/...)
    dir_keys = set()
    for dirpath, dirnames, _fn in os.walk(path):
        dir_keys.update(d.split("=", 1)[0] for d in dirnames if "=" in d)
    part_cols = [f for f in df.schema.names if f in dir_keys]
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = f"{path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    writer = df.repartition(n_out).write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    old = f"{path.rstrip('/')}_old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    # invalidate any cached file listings for the path — a pre-swap
    # DataFrame's snapshot would otherwise point at deleted files
    spark.catalog.refreshByPath(path)
    files_after, _ = census(path)
    return files_before, files_after


def observed_quality(df: DataFrame, cols: list[str], name: str = "quality"):
    """Attach zero-cost data-quality metrics to a DataFrame via
    ``df.observe``: row count plus per-column null counts, computed
    DURING whatever action consumes the frame — no second scan, no
    separate QA job.  At 100 TB a dedicated quality pass costs as much
    as the pipeline itself; observation metrics ride the existing one.

    Returns (observed_df, Observation); read ``observation.get`` after
    an action on the returned frame.  (The reference's only QA was
    counting skipped records in an error log — FD/consumer_error.log.)
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    return df.observe(obs, *metrics), obs
