"""Incremental file-stream ingestion (streaming/ingest.py): each
Trigger.AvailableNow pass must process exactly the landing files the
checkpoint has not seen (O(delta), never a corpus recompute), apply the
batch-identical quality gate, and append atomically."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.text import quality_score
from real___time_fraud_detection_using_apache_kafka_spark.streaming.ingest import (
    ingest_documents_available_now,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="ingest_test_")
    d = {k: os.path.join(root, k) for k in ("landing", "curated", "ckpt")}
    os.makedirs(d["landing"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _land(spark, lo: int, hi: int, landing: str) -> int:
    """Write documents with doc_id in [lo, hi) as one new landing file set."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .coalesce(1)
    )
    docs.write.mode("append").parquet(landing)
    return docs.count()


def _expected_kept(spark, lo: int, hi: int) -> int:
    base = spark.read.parquet(f"{SF}/documents.parquet").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    return quality_score(base).filter("quality_score >= 0.5").count()


def test_available_now_ingest_is_incremental(spark, dirs):
    _land(spark, 0, 200, dirs["landing"])
    q1 = ingest_documents_available_now(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"]
    )
    q1.awaitTermination(120)
    first = spark.read.parquet(dirs["curated"])
    n1 = first.count()
    assert n1 == _expected_kept(spark, 0, 200)
    assert first.filter(F.col("quality_score") < 0.5).count() == 0

    # second landing batch: 100 real docs plus a junk file that must be
    # gated out (the sf0.001 corpus is uniformly quality 1.0, so the
    # drop path needs synthetic low-quality rows)
    _land(spark, 200, 300, dirs["landing"])
    junk_text = "spam, spam, spam, spam, spam, spam,"
    junk = spark.createDataFrame(
        [(10_000 + i, junk_text, "en", "junk", len(junk_text)) for i in range(25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1)
    junk.write.mode("append").parquet(dirs["landing"])
    q2 = ingest_documents_available_now(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"]
    )
    q2.awaitTermination(120)
    processed = sum(p["numInputRows"] for p in q2.recentProgress)
    assert processed == 125, processed  # delta only, not 325
    curated = spark.read.parquet(dirs["curated"])
    total = curated.count()
    # every junk row (high punct ratio + short + repetitive -> score 0.0)
    # was dropped; every real row kept
    assert curated.filter(F.col("source") == "junk").count() == 0
    assert total == _expected_kept(spark, 0, 300)

    # idempotent catch-up: nothing new -> nothing processed, sink unchanged
    q3 = ingest_documents_available_now(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"]
    )
    q3.awaitTermination(120)
    assert sum(p["numInputRows"] for p in q3.recentProgress) == 0
    assert spark.read.parquet(dirs["curated"]).count() == total


def test_curated_sink_partitioned_by_lang(spark, dirs):
    _land(spark, 0, 150, dirs["landing"])
    q = ingest_documents_available_now(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"]
    )
    q.awaitTermination(120)
    parts = [p for p in os.listdir(dirs["curated"]) if p.startswith("lang=")]
    assert len(parts) >= 2, parts
    # partition pruning: a per-language read touches one directory
    en = spark.read.parquet(dirs["curated"]).filter(F.col("lang") == "en")
    assert en.count() > 0
    assert en.filter(F.col("lang") != "en").count() == 0


def test_neardup_suppressed_ingest(spark, dirs):
    """Near-dup suppression across catch-up passes: a doc near-duplicating
    an already-accepted doc never enters the corpus; within-batch dups
    resolve to the lowest id; fresh docs pass."""
    from real___time_fraud_detection_using_apache_kafka_spark.streaming.ingest import (
        ingest_documents_neardup_suppressed,
    )

    state = os.path.join(os.path.dirname(dirs["curated"]), "state")
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "today with plenty of extra distinct words to pass quality")
    other = ("completely different text about spark distributed query "
             "engines and large scale data processing pipelines running")
    third = ("numerical linear algebra with vectors matrices tensors and "
             "assorted decompositions applied to streaming state stores")

    def land(rows):
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("append").parquet(dirs["landing"])

    # pass 1: base, a within-batch near-dup of base, and one distinct doc
    land([(1, base), (2, base.replace("today", "tomorrow")), (3, other)])
    q = ingest_documents_neardup_suppressed(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"], state
    )
    q.awaitTermination(180)
    kept1 = {r["doc_id"] for r in spark.read.parquet(dirs["curated"]).collect()}
    assert kept1 == {1, 3}  # 2 suppressed within batch (lowest id wins)

    # pass 2: a near-dup of ALREADY-ACCEPTED doc 1, plus a fresh doc
    land([(10, base.replace("dog", "cat")), (11, third)])
    q2 = ingest_documents_neardup_suppressed(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"], state
    )
    q2.awaitTermination(180)
    kept2 = {r["doc_id"] for r in spark.read.parquet(dirs["curated"]).collect()}
    assert kept2 == {1, 3, 11}  # 10 suppressed against state, 11 accepted


def test_neardup_ingest_is_replay_tolerant(spark, dirs):
    """Checkpoint loss forces a full at-least-once replay of the landing
    dir — but replayed docs collide with their OWN band buckets in the
    signature state and are suppressed, so the curated corpus does not
    grow: the LSH state doubles as a replay idempotence ledger."""
    from real___time_fraud_detection_using_apache_kafka_spark.streaming.ingest import (
        ingest_documents_neardup_suppressed,
    )

    state = os.path.join(os.path.dirname(dirs["curated"]), "state")
    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again "
            "today with plenty of extra distinct words to pass quality"),
        (2, "completely different text about spark distributed query "
            "engines and large scale data processing pipelines running"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(dirs["landing"])

    q = ingest_documents_neardup_suppressed(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"], state
    )
    q.awaitTermination(180)
    n1 = spark.read.parquet(dirs["curated"]).count()
    assert n1 == 2

    # lose the checkpoint -> next pass replays EVERYTHING
    shutil.rmtree(dirs["ckpt"])
    q2 = ingest_documents_neardup_suppressed(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"], state
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(dirs["curated"]).count() == n1  # no growth


def test_neardup_ingest_txn_sink(spark, dirs):
    """txn=True lands each batch as ONE atomic TxnTable commit carrying
    the batch ledger; suppression semantics are unchanged."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.txn_table import (
        TxnTable,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.streaming.ingest import (
        ingest_documents_neardup_suppressed,
    )

    state = os.path.join(os.path.dirname(dirs["curated"]), "state")
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "today with plenty of extra distinct words to pass quality")
    other = ("completely different text about spark distributed query "
             "engines and large scale data processing pipelines running")
    spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, base.replace("today", "tomorrow"), "en", "s", len(base)),
         (3, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("append").parquet(dirs["landing"])

    q = ingest_documents_neardup_suppressed(
        spark, dirs["landing"], dirs["curated"], dirs["ckpt"], state, txn=True
    )
    q.awaitTermination(180)
    t = TxnTable(dirs["curated"])
    assert {r["doc_id"] for r in t.read(spark).collect()} == {1, 3}
    # every commit carries the ledger meta
    metas = [t._entry(v).get("meta") for v in t.versions()]
    assert all(m and m["app_id"] == "neardup_ingest" for m in metas)
