"""Streaming-path throughput smoke: rate source -> synthetic transaction
columns -> broadcast-model scoring -> running class counts, measured as
rows/s actually processed over a fixed wall window.

The reference's stream path is architecturally capped at 0.5 txn/s (one
record per 2 s sleep, single process, 1-row pandas frame per message —
SURVEY.md §6); this measures the same logical pipeline (generate ->
score -> count) as Structured Streaming micro-batches.

Usage: python tools/streaming_throughput.py [rows_per_second] [seconds]
Prints one markdown row for SCALE.md / BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark
from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import stream_transactions
from real___time_fraud_detection_using_apache_kafka_spark.streaming.pipeline import (
    running_counts,
    score_stream,
)


def main() -> None:
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    window_s = float(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("streaming-throughput")
    txns = stream_transactions(spark, rows_per_second=target)
    counts = running_counts(score_stream(txns))
    ckpt = tempfile.mkdtemp(prefix="throughput_ckpt_")
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("throughput_counts")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.time()
    time.sleep(window_s)
    rows = 0
    for p in q.recentProgress:
        rows += p["numInputRows"]
    elapsed = time.time() - t0
    final = spark.sql("SELECT sum(n) FROM throughput_counts").first()[0]
    q.stop()
    q.awaitTermination(30)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    rate = rows / elapsed if elapsed else 0.0
    print(
        f"| rate source @ {int(target):,} rows/s target | {window_s:.0f} s window | "
        f"{rows:,} rows | {rate:,.0f} rows/s sustained | "
        f"counted {final or 0:,} | x{rate / 0.5:,.0f} the reference |"
    )


if __name__ == "__main__":
    main()
