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
