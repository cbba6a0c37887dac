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


def _derby_url(tmp_path, name):
    # Spark bundles Apache Derby (hive-metastore dependency), so the
    # JDBC sink gets a REAL in-process database round-trip — no external
    # service needed (the reference's psycopg2 path was dead code with
    # no DB either: FD/consumer.py).
    return (
        f"jdbc:derby:{tmp_path}/{name};create=true",
        {"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )


def test_jdbc_batch_sink_roundtrip_embedded_derby(spark, tmp_path):
    """S10 end-to-end: write transactions over JDBC, read them back,
    value-compare. Bounded connection fan-in (numPartitions) must hold
    on the writer."""
    df = batch_transactions(spark, 200).select(
        "transaction_id", "customer_id", "amount"
    )
    url, props = _derby_url(tmp_path, "batchdb")
    jdbc_batch_sink(df, url, "txns", num_partitions=4, **props).mode(
        "overwrite"
    ).save()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "txns")
        .option("driver", props["driver"])
        .load()
    )
    assert back.count() == 200
    a = {r.transaction_id: (r.customer_id, r.amount) for r in df.collect()}
    b = {r.transaction_id: (r.customer_id, r.amount) for r in back.collect()}
    assert a == b


def test_foreach_batch_jdbc_streams_microbatches(spark, tmp_path):
    """S10 streaming: every micro-batch lands in the JDBC table tagged
    with its batch_id — the foreachBatch upsert pattern the reference's
    dead psycopg2 code was reaching for."""
    from pyspark.sql import functions as SF

    url, props = _derby_url(tmp_path, "streamdb")
    src = f"{tmp_path}/src"
    spark.range(0, 10).selectExpr("id", "id * 2 as v").coalesce(1).write.json(src)
    sink = foreach_batch_jdbc(url, "scored", num_partitions=2, **props)
    q = (
        spark.readStream.schema("id long, v long").json(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "scored")
        .option("driver", props["driver"])
        .load()
    )
    rows = back.collect()
    assert len(rows) == 10
    assert {r.id for r in rows} == set(range(10))
    assert all(r.v == r.id * 2 for r in rows)
    assert {r.batch_id for r in rows} == {0}


def _decode_png(path):
    """Return (w, h, rows) from our minimal PNG (filter-0 RGB8)."""
    import struct as st
    import zlib as zl

    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", None
    while pos < len(blob):
        (ln,) = st.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = st.unpack(">IIBB", payload[:10])
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = zl.decompress(idat)
    stride = 1 + 3 * w
    rows = [raw[i * stride + 1:(i + 1) * stride] for i in range(h)]
    assert all(raw[i * stride] == 0 for i in range(h))  # filter 0
    return w, h, rows


def test_png_reports_render_and_decode(spark, tmp_path):
    """S11: the three reference report charts (FD/model.py:157-198)
    render as valid, deterministic PNGs from driver-side aggregates."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.report import (
        classification_report_txt,
        confusion_matrix_png,
        feature_importance_png,
        metrics_bar_png,
    )

    cm = f"{tmp_path}/cm.png"
    confusion_matrix_png({(0, 0): 90, (0, 1): 10, (1, 0): 5, (1, 1): 95}, cm)
    w, h, rows = _decode_png(cm)
    assert (w, h) == (360, 360)
    # the (1,1)=95 cell must be darker (smaller channel values) than the
    # (1,0)=5 cell: sample the two cell centers on the bottom row
    cell = (360 - 40) // 2
    y = 20 + cell + cell // 2
    dark = rows[y][3 * (20 + cell + cell // 2):][:3]
    light = rows[y][3 * (20 + cell // 2):][:3]
    assert sum(dark) < sum(light)

    mb = f"{tmp_path}/metrics.png"
    metrics_bar_png({"accuracy": 0.9, "recall": 0.3}, mb)
    w, h, rows = _decode_png(mb)
    # accuracy bar (left, 0.9) extends above mid-height; recall (0.3)
    # must not reach it
    probe_y = h // 2
    left_x, right_x = 20 + (w - 40) // 4, 20 + 3 * (w - 40) // 4
    assert bytes(rows[probe_y][3 * left_x:3 * left_x + 3]) != b"\xff\xff\xff"
    assert bytes(rows[probe_y][3 * right_x:3 * right_x + 3]) == b"\xff\xff\xff"

    fi = f"{tmp_path}/fi.png"
    feature_importance_png([("amount", 0.7), ("hour", 0.2)], fi)
    w, h, rows = _decode_png(fi)
    # top bar spans full width minus padding; second bar is ~2/7 of it
    top_y, second_y = 20 + (h - 40) // 4, 20 + 3 * (h - 40) // 4
    top_len = sum(
        1 for x in range(w) if bytes(rows[top_y][3 * x:3 * x + 3]) != b"\xff\xff\xff"
    )
    sec_len = sum(
        1 for x in range(w) if bytes(rows[second_y][3 * x:3 * x + 3]) != b"\xff\xff\xff"
    )
    assert top_len > 2.5 * sec_len > 0

    # determinism: same inputs -> identical bytes
    cm2 = f"{tmp_path}/cm2.png"
    confusion_matrix_png({(0, 0): 90, (0, 1): 10, (1, 0): 5, (1, 1): 95}, cm2)
    assert open(cm, "rb").read() == open(cm2, "rb").read()

    rpt = f"{tmp_path}/report.txt"
    classification_report_txt(
        [{"label": 0, "precision": 0.9, "recall": 0.85, "f1": 0.874,
          "support": 100},
         {"label": 1, "precision": 0.8, "recall": 0.9, "f1": 0.847,
          "support": 95}],
        rpt,
    )
    text = open(rpt).read()
    assert "precision" in text and "0.8740" in text and text.count("\n") == 3
