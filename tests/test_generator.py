"""Synthetic transaction generator (S4, F15-F18): determinism, schema
contract, and reference-faithful distributions (FD/producer.py:52-124)."""

from __future__ import annotations

from real___time_fraud_detection_using_apache_kafka_spark.schemas import TXN_SCHEMA
from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import (
    ACCOUNT_TYPES,
    DEVICES,
    TXN_TYPES,
    batch_transactions,
    to_kafka_json,
)


def test_schema_matches_contract(spark):
    df = batch_transactions(spark, 100)
    assert [f.name for f in df.schema.fields] == [f.name for f in TXN_SCHEMA.fields]


def test_deterministic_given_seed(spark):
    a = batch_transactions(spark, 200, seed=42, partitions=4).collect()
    b = batch_transactions(spark, 200, seed=42, partitions=4).collect()
    assert a == b
    c = batch_transactions(spark, 200, seed=7, partitions=4).collect()
    assert a != c


def test_reference_distributions(spark):
    rows = batch_transactions(spark, 1000, partitions=4).collect()
    # F17: fraud alternates every other record -> exactly 50%
    assert sum(r["is_fraud"] for r in rows) == 500
    assert all(r["account_type"] in ACCOUNT_TYPES for r in rows)
    assert all(r["transaction_device"] in DEVICES for r in rows)
    assert all(r["transaction_type"] in TXN_TYPES for r in rows)
    assert all(10 <= r["amount"] <= 10000 for r in rows)
    assert all(r["transaction_id"].startswith("TXN") for r in rows)
    # F16: some (not all) fraud rows carry the suspicious-location marker
    fraud_locs = [r["location"] for r in rows if r["is_fraud"] == 1]
    assert 0 < sum(loc == "LOC99" for loc in fraud_locs) < len(fraud_locs)


def test_kafka_wire_roundtrip(spark):
    """S3/F19: to_json -> from_json recovers the record exactly."""
    from pyspark.sql import functions as F

    df = batch_transactions(spark, 50)
    wire = to_kafka_json(df)
    assert wire.columns == ["key", "value"]
    back = wire.select(
        F.from_json(F.col("value"), TXN_SCHEMA).alias("txn")
    ).select("txn.*")
    assert sorted(df.collect()) == sorted(back.collect())


def test_stream_transactions_rate_source_runs(spark, tmp_path):
    """T2: the rate-source generator must actually start — the rate source
    rejects fractional rowsPerSecond, so the default 0.5 rows/s runs at
    1 row/s with a modulo keep-filter (regression: NumberFormatException)."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import stream_transactions

    for rate in (0.5, 5):
        stream = stream_transactions(spark, rows_per_second=rate)
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(f"rate_txn_{str(rate).replace('.', '_')}")
            .option("checkpointLocation", str(tmp_path / f"ckpt{rate}"))
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        try:
            import time as _t

            deadline = _t.time() + 15
            n = 0
            while _t.time() < deadline and n == 0:
                _t.sleep(0.5)
                n = spark.sql(
                    f"SELECT count(*) FROM rate_txn_{str(rate).replace('.', '_')}"
                ).first()[0]
            assert n > 0, f"rate={rate} produced no rows"
        finally:
            q.stop()
