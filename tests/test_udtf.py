"""Python UDTF: blob -> rows log-record expansion (SURVEY §2.1 S6/S7's
third shape — a log archive already in a column)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.functions.udtfs import (
    ParseLogRecords,
    register_udtfs,
)

BLOB = "\n".join(
    [
        "=" * 68,
        "New Transaction Published:",
        "Transaction ID: TXN100001",
        "Amount: $123.45",
        "Status: Fraud",
        "Actual Fraud Status: Fraud",
        "=" * 68,
        "noise chunk without the id line",
        "=" * 60,  # drift: fewer '=' (§2.11-5)
        "Transaction ID: TXN100002",
        "Amount: $not-a-number",
        "Status: Not Fraud",
        "=" * 68,
    ]
)


def test_parse_log_records_direct_call(spark):
    rows = sorted(
        ParseLogRecords(F.lit(BLOB)).collect(), key=lambda r: r["txn_id"]
    )
    assert [r["txn_id"] for r in rows] == ["TXN100001", "TXN100002"]
    assert rows[0]["amount"] == 123.45
    assert rows[0]["status"] == "Fraud"
    assert rows[0]["actual_status"] == "Fraud"
    # lenient numeric cast (F13): junk amount -> null, record still emitted
    assert rows[1]["amount"] is None
    assert rows[1]["actual_status"] is None


def test_parse_log_records_lateral_sql(spark):
    register_udtfs(spark)
    blobs = spark.createDataFrame([(1, BLOB), (2, None)], ["blob_id", "blob"])
    blobs.createOrReplaceTempView("log_blobs")
    got = spark.sql(
        "SELECT blob_id, r.txn_id, r.amount FROM log_blobs, "
        "LATERAL parse_log_records(blob) r ORDER BY blob_id, r.txn_id"
    ).collect()
    # the null blob expands to zero rows; blob 1 to its two parseable records
    assert [(r["blob_id"], r["txn_id"]) for r in got] == [
        (1, "TXN100001"),
        (1, "TXN100002"),
    ]
