"""Pluggable fraudlog DataSource (sources/log_datasource.py): the
reference's `=`-delimited log format as a registered Spark source."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from real___time_fraud_detection_using_apache_kafka_spark.sources.log_datasource import (
    HAVE_DATASOURCE_API,
    FraudLogDataSource,
    parse_log_text,
)

RECORD = """\
New Transaction Processed:
Transaction ID: TXN123456
Amount: $1,234.56
Status: Fraud
Actual Fraud Status: Not Fraud
Fraud Probability: 0.8731
{}
Transaction ID: TXN777
Amount: $10.00
Status: Not Fraud
{}
garbage line without colon separator at all
""".format("=" * 68, "=" * 60)  # both delimiter widths the reference uses


@pytest.fixture()
def log_dir():
    d = tempfile.mkdtemp(prefix="fraudlog_")
    with open(f"{d}/consumer.log", "w") as f:
        f.write(RECORD)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_parse_log_text_normalizes_keys_and_tolerates_drift():
    recs = list(parse_log_text(RECORD))
    assert len(recs) == 2  # trailing garbage chunk has no k:v lines
    assert recs[0]["transaction_id"] == "TXN123456"
    assert recs[0]["actual_fraud_status"] == "Not Fraud"  # old-format drift line
    assert recs[1]["transaction_id"] == "TXN777"


@pytest.mark.skipif(not HAVE_DATASOURCE_API, reason="needs pyspark >= 4.0")
def test_fraudlog_datasource_reads_records(spark, log_dir):
    spark.dataSource.register(FraudLogDataSource)
    df = spark.read.format("fraudlog").load(log_dir)
    rows = {r["transaction_id"]: r for r in df.collect()}
    assert set(rows) == {"TXN123456", "TXN777"}
    r = rows["TXN123456"]
    assert r["amount"] == pytest.approx(1234.56)
    assert r["status"] == "Fraud"
    assert r["actual_fraud_status"] == "Not Fraud"
    assert r["fraud_probability"] == pytest.approx(0.8731)
    assert r["fields"]["new_transaction_processed"] == ""
    assert r["source_file"] == "consumer.log"
    assert rows["TXN777"]["actual_fraud_status"] is None


@pytest.mark.skipif(not HAVE_DATASOURCE_API, reason="needs pyspark >= 4.0")
def test_fraudlog_stream_tails_appends_and_skips_torn_record(spark, log_dir, tmp_path):
    """Streaming read: each micro-batch consumes only appended bytes, and a
    half-written record (no trailing delimiter yet) waits for completion."""
    path = f"{log_dir}/consumer.log"
    spark.dataSource.register(FraudLogDataSource)
    q = (
        spark.readStream.format("fraudlog").load(path)
        .writeStream.format("memory").queryName("taillog")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql(
            "SELECT count(*) FROM taillog"
        ).first()[0] == 2  # both initial complete records

        # torn append: record without its closing delimiter must NOT appear
        with open(path, "a") as f:
            f.write("Transaction ID: TXN999\nAmount: $5.00\nStatus: Fraud\n")
        q.processAllAvailable()
        got = {r[0] for r in spark.sql("SELECT transaction_id FROM taillog").collect()}
        assert "TXN999" not in got

        # completing the record (delimiter line) makes it visible
        with open(path, "a") as f:
            f.write("=" * 68 + "\n")
        q.processAllAvailable()
        got = {r[0] for r in spark.sql("SELECT transaction_id FROM taillog").collect()}
        assert got == {"TXN123456", "TXN777", "TXN999"}
    finally:
        q.stop()


def test_fraudlog_writer_roundtrip_and_modes(spark, tmp_path):
    """S5 as a DataSource writer: write -> read round-trips the typed
    columns; overwrite replaces prior files; append accretes."""
    spark.dataSource.register(FraudLogDataSource)
    out = str(tmp_path / "sink")
    rows = [
        ("TXN1", 12.5, "Fraud", "Fraud", 0.9876),
        ("TXN2", 3.0, "Not Fraud", None, 0.0123),
    ]
    cols = ["transaction_id", "amount", "status", "actual_fraud_status",
            "fraud_probability"]
    df = spark.createDataFrame(rows, cols)
    df.write.format("fraudlog").mode("overwrite").save(out)

    back = spark.read.format("fraudlog").load(out).select(*cols)
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)

    # append accretes; a second overwrite replaces everything
    df.write.format("fraudlog").mode("append").save(out)
    assert spark.read.format("fraudlog").load(out).count() == 4
    df.limit(1).write.format("fraudlog").mode("overwrite").save(out)
    assert spark.read.format("fraudlog").load(out).count() == 1

    # no half-written temporaries survive a successful commit
    import os
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]


def test_generate_write_read_count_lifecycle(spark, tmp_path):
    """The reference's full persistence loop on engine components:
    synthesize transactions (F15-F18) -> render to the reference's log
    format via the DataSource writer (S5) -> re-scan with the DataSource
    reader (S6/S7) -> aggregate class counts (A1).  Counts must match the
    pre-serialization DataFrame exactly."""
    from pyspark.sql import functions as F

    from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import (
        batch_transactions,
    )

    spark.dataSource.register(FraudLogDataSource)
    out = str(tmp_path / "lifecycle_log")
    txns = batch_transactions(spark, n=200, seed=7).select(
        F.col("transaction_id"),
        F.col("amount"),
        F.when(F.col("is_fraud") == 1, "Fraud").otherwise("Not Fraud")
        .alias("status"),
    )
    want = {
        r["status"]: r["n"]
        for r in txns.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    txns.write.format("fraudlog").mode("overwrite").save(out)
    back = spark.read.format("fraudlog").load(out)
    got = {
        r["status"]: r["n"]
        for r in back.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    assert back.count() == 200
    # amounts survive the $%.2f render -> parse round trip to the cent
    joined = txns.alias("a").join(
        back.alias("b"), F.col("a.transaction_id") == F.col("b.transaction_id")
    ).select(
        (F.round("a.amount", 2) - F.col("b.amount")).alias("delta")
    )
    assert joined.agg(F.max(F.abs("delta"))).first()[0] == 0.0
