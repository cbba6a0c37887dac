"""Sources/sinks (sources/io.py): CSV and JSON round-trips with enforced
schemas; model artifact save/load (S9); sink factories construct without
external services."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.ml.pipeline import score, train
from real___time_fraud_detection_using_apache_kafka_spark.schemas import TXN_SCHEMA
from real___time_fraud_detection_using_apache_kafka_spark.sources.generator import (
    batch_transactions,
)
from real___time_fraud_detection_using_apache_kafka_spark.sources.io import (
    foreach_batch_jdbc,
    jdbc_batch_sink,
    kafka_batch_sink,
    read_metrics_json,
    read_transactions_csv,
    write_metrics_json,
    write_transactions_csv,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="io_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip_schema_enforced(spark, tmpdir):
    txns = batch_transactions(spark, 50)
    write_transactions_csv(txns, f"{tmpdir}/txns")
    back = read_transactions_csv(spark, f"{tmpdir}/txns")
    assert back.schema == TXN_SCHEMA
    assert back.count() == 50
    # value fidelity through the text round trip
    a = txns.agg(F.round(F.sum("amount"), 2)).first()[0]
    b = back.agg(F.round(F.sum("amount"), 2)).first()[0]
    assert a == b


def test_csv_malformed_rows_null_not_abort(spark, tmpdir):
    with open(f"{tmpdir}/bad.csv", "w") as f:
        f.write("time,customer_id,transaction_id,transaction_date,"
                "transaction_time,amount,account_type,merchant_id,"
                "account_balance,transaction_device,device_id,location,"
                "transaction_type,transaction_currency,is_fraud\n")
        f.write("notanumber,C1,T1,2024-01-01,00:00:00,xx,Savings,M1,yy,"
                "Mobile,D1,LOC1,Purchase,USD,zz\n")
    df = read_transactions_csv(spark, f"{tmpdir}/bad.csv")
    row = df.first()
    assert row["time"] is None and row["amount"] is None
    assert row["customer_id"] == "C1"  # valid fields survive


def test_metrics_json_roundtrip(spark, tmpdir):
    m = spark.createDataFrame(
        [("gbt", 0.91, 0.88)], ["model", "accuracy", "roc_auc"]
    )
    write_metrics_json(m, f"{tmpdir}/metrics")
    back = read_metrics_json(spark, f"{tmpdir}/metrics")
    assert back.count() == 1
    r = back.first()
    assert r["model"] == "gbt" and abs(r["accuracy"] - 0.91) < 1e-12


def test_model_save_load_scores_identically(spark, tmpdir):
    """S9: MLlib persistence replaces joblib pickles — a reloaded model
    must score byte-identically."""
    txns = batch_transactions(spark, 400)
    model, _, test_df = train(txns, classifier="lr")
    model.save(f"{tmpdir}/model")
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(f"{tmpdir}/model")
    a = score(model, txns.limit(50)).select("transaction_id", "probability_fraud")
    b = score(reloaded, txns.limit(50)).select("transaction_id", "probability_fraud")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sink_factories_construct(spark):
    """Kafka/JDBC writers configure without a live service (save() would
    need one); the foreachBatch JDBC closure is a 2-arg callable."""
    df = batch_transactions(spark, 5)
    assert kafka_batch_sink(df, "localhost:9092") is not None
    assert jdbc_batch_sink(df, "jdbc:postgresql://h/db", "t") is not None
    sink = foreach_batch_jdbc("jdbc:postgresql://h/db", "t")
    assert callable(sink) and sink.__code__.co_argcount == 2


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from real___time_fraud_detection_using_apache_kafka_spark.sources.io import read_orc, write_orc
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
    # predicate + projection reach the ORC scan
    q = back.filter(back.o_orderstatus == "F").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan
