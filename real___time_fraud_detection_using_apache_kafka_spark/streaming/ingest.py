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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators import text as TX
from ..schemas import DOCUMENTS_SCHEMA

__all__ = ["stream_documents", "ingest_documents_available_now"]


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
