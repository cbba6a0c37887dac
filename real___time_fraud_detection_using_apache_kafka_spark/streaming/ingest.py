"""Incremental file-stream ingestion — the catch-up pattern a growing
training corpus needs (driver-mandated extension surface; no analog in
the reference, whose only unbounded source is Kafka — FD/consumer.py:
104-114).

A landing directory accumulates parquet files (from upstream crawls /
dumps).  ``stream_documents`` treats that directory as an unbounded
source; ``ingest_documents_available_now`` runs one catch-up pass per
invocation (``Trigger.AvailableNow``): it processes exactly the files
the checkpoint has not seen, applies the same quality gate the batch
curation pipeline uses, and appends survivors to a curated parquet sink.
Re-running after new files land processes ONLY the new files — O(delta)
per pass, never a recompute of the corpus, which is the property that
matters at 100 TB (the batch alternative re-reads everything each run).

Scale notes:
- file discovery is driver-side metadata only; ``maxFilesPerTrigger``
  bounds micro-batch size so executor memory is independent of backlog;
- the quality gate is the same codegen'd narrow projection as the batch
  path (operators/text.py) — no shuffle anywhere in the query, so each
  micro-batch is a single file-parallel stage;
- the sink is append-mode parquet partitioned by ``lang``: downstream
  per-language training mixes prune at the directory level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import text as TX
from ..schemas import DOCUMENTS_SCHEMA

__all__ = [
    "stream_documents",
    "ingest_documents_available_now",
    "ingest_documents_neardup_suppressed",
]


def stream_documents(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Unbounded view over a landing directory of document parquet files.

    File sources need an explicit schema (there may be zero files at
    start); ``maxFilesPerTrigger`` is the file-source backpressure knob
    (the analog of Kafka's ``maxOffsetsPerTrigger``).
    """
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def ingest_documents_available_now(
    spark: SparkSession,
    landing_dir: str,
    curated_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
) -> StreamingQuery:
    """One incremental catch-up pass: gate new files on quality, append
    survivors to the curated sink, stop when the backlog is drained.

    The returned query terminates on its own (``Trigger.AvailableNow``);
    callers ``awaitTermination()`` it.  Exactly-once per file: the
    checkpoint's file log owns progress, and the parquet sink commits
    atomically per micro-batch.
    """
    docs = stream_documents(spark, landing_dir)
    curated = (
        TX.quality_score(docs)
        .filter(f"quality_score >= {min_quality}")
        .select("doc_id", "text", "lang", "source", "quality_score")
    )
    return (
        curated.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .format("parquet")
        .option("path", curated_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("lang")
        .start()
    )


def _band_buckets(docs: DataFrame, n: int, bands: int,
                  rows_per_band: int) -> DataFrame:
    """(doc_id, band, pattern) LSH bucket keys for each document — the
    compact membership token the suppression state stores (signatures
    only, never shingle sets: state size is O(docs x bands), independent
    of document length)."""
    from ..operators.dedup import minhash_signatures

    sigs = minhash_signatures(docs, n=n, num_hashes=bands * rows_per_band)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            ).alias("pattern"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.pattern").alias("pattern"))


def ingest_documents_neardup_suppressed(
    spark: SparkSession,
    landing_dir: str,
    curated_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    min_quality: float = 0.5,
    n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    txn: bool = False,
) -> StreamingQuery:
    """The 100 TB ingestion shape: quality gate + NEAR-dup suppression
    against everything already accepted, incrementally.

    Per micro-batch (``foreachBatch``):

    1. quality-gate the new files (same codegen'd expressions as batch);
    2. MinHash-LSH band buckets for survivors (one narrow pass);
    3. drop any doc sharing a bucket with the accumulated STATE (a crawl
       re-serving yesterday's page never re-enters the corpus), or with a
       lower-id doc in the same batch — the batch curation pipeline's
       greedy lowest-id rule, so backfill and live ingest agree;
    4. append survivors to the curated sink and their buckets to the
       state.

    Bucket collision without exact verification is the deliberate
    trade: for dissimilar docs P[all ``rows_per_band`` minhashes match]
    ~ j^r ≈ 0, so false suppression is negligible while the state stays
    signature-sized — the exact-verify tier (curate_documents) remains
    the batch backfill path.  State reads/writes are parquet appends
    keyed by (band, pattern): the join is an equi-join a 1000-executor
    cluster shuffles on the bucket key, never a cartesian.  Sink +
    state appends are at-least-once on batch replay, but the state
    doubles as an idempotence ledger: a replayed doc collides with its
    OWN buckets and is suppressed, so the curated corpus never grows on
    replay — even after total checkpoint loss (tested).

    ``txn=True`` lands survivors in a :class:`~..sources.txn_table.TxnTable`
    at ``curated_dir`` instead of a plain parquet append: each batch
    becomes ONE atomic multi-file commit carrying the (app, batch) ledger,
    so readers never observe a half-written batch and same-checkpoint
    replays are skipped before staging (read it back with
    ``TxnTable(curated_dir).read(spark)``; the lang-partitioned directory
    layout is traded for commit atomicity).
    """
    from ..sources.txn_table import TxnTable

    table = TxnTable(curated_dir) if txn else None
    app_id = "neardup_ingest"
    gated_stream = (
        TX.quality_score(stream_documents(spark, landing_dir))
        .filter(f"quality_score >= {min_quality}")
        .select("doc_id", "text", "lang", "source", "quality_score")
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if table is not None and batch_id <= table.last_batch(app_id):
            return  # replayed batch already committed atomically
        batch = batch.persist()
        buckets = survivors = None
        try:
            if batch.isEmpty():
                return
            buckets = _band_buckets(batch, n, bands, rows_per_band).persist()
            drops = buckets.alias("b").join(
                buckets.alias("lo"),
                ["band", "pattern"],
            ).filter(
                F.col("lo.doc_id") < F.col("b.doc_id")
            ).select(F.col("b.doc_id").alias("doc_id"))
            if os.path.isdir(state_dir) and any(
                f.endswith(".parquet") for f in os.listdir(state_dir)
            ):
                seen = spark.read.parquet(state_dir).select("band", "pattern")
                drops = drops.union(
                    buckets.join(seen, ["band", "pattern"], "left_semi")
                    .select("doc_id")
                )
            survivors = batch.join(
                drops.distinct(), "doc_id", "left_anti"
            ).persist()
            if table is not None:
                table.append(
                    survivors, meta={"app_id": app_id, "batch_id": batch_id}
                )
            else:
                survivors.write.mode("append").partitionBy("lang").parquet(
                    curated_dir
                )
            buckets.join(
                survivors.select("doc_id"), "doc_id", "left_semi"
            ).write.mode("append").parquet(state_dir)
        finally:
            # every per-batch persist releases here — a long-running
            # ingest must not accumulate one cached frame per micro-batch
            for df in (buckets, survivors, batch):
                if df is not None:
                    df.unpersist()

    return (
        gated_stream.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
