"""Transactional parquet table (sources/txn_table.py): atomic visibility,
snapshot isolation, time travel, optimistic-concurrency conflicts, vacuum."""

from __future__ import annotations

import os

import pytest

from real___time_fraud_detection_using_apache_kafka_spark.sources.txn_table import (
    CommitConflict,
    TxnTable,
)


@pytest.fixture()
def table(tmp_path):
    return TxnTable(str(tmp_path / "tbl"))


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_overwrite_and_time_travel(spark, table):
    v1 = table.append(spark.range(0, 3))
    v2 = table.append(spark.range(10, 12))
    assert (v1, v2) == (0, 1)
    assert _ids(table.read(spark)) == [0, 1, 2, 10, 11]
    # snapshot isolation: v1's file list is immutable
    assert _ids(table.read(spark, version=v1)) == [0, 1, 2]
    v3 = table.overwrite(spark.range(100, 102))
    assert _ids(table.read(spark)) == [100, 101]
    # time travel still resolves every older version
    assert _ids(table.read(spark, version=v2)) == [0, 1, 2, 10, 11]
    assert table.versions() == [v1, v2, v3]


def test_unreferenced_stage_files_are_invisible(spark, table):
    """A crashed writer = staged files with no log entry: readers never
    see them."""
    table.append(spark.range(0, 2))
    # simulate a crash after staging, before commit
    table._stage(spark.range(500, 600))
    assert _ids(table.read(spark)) == [0, 1]
    # vacuum removes the orphans (keep all committed versions' files)
    deleted = table.vacuum(keep_versions=len(table.versions()))
    assert deleted and all("stage-" in p for p in deleted)
    assert _ids(table.read(spark)) == [0, 1]


def test_commit_conflict_retries_and_both_appends_land(spark, table):
    """A lost O_EXCL race retries against the new snapshot: simulate by
    pre-creating the version file a writer will want."""
    table.append(spark.range(0, 2))  # v0
    # adversary takes v1 with an empty commit
    assert table._try_commit(1, table._entry(0)["files"], "append")
    v = table.append(spark.range(5, 7))  # must land as v2
    assert v == 2
    assert _ids(table.read(spark)) == [0, 1, 5, 6]


def test_conflict_exhaustion_raises(spark, table, monkeypatch):
    table.append(spark.range(0, 1))
    monkeypatch.setattr(table, "_try_commit", lambda *a, **k: False)
    with pytest.raises(CommitConflict):
        table.append(spark.range(1, 2))


def test_vacuum_drops_old_versions_but_keeps_current(spark, table):
    table.append(spark.range(0, 3))
    table.overwrite(spark.range(10, 13))
    deleted = table.vacuum(keep_versions=1)
    assert deleted  # v0's files are gone
    assert table.versions() == [1]
    assert _ids(table.read(spark)) == [10, 11, 12]
    with pytest.raises(ValueError):
        table.read(spark, version=0)


def test_empty_table_read_raises(spark, table):
    with pytest.raises(ValueError):
        table.read(spark)


def test_txn_batch_sink_is_exactly_once(spark, table):
    """Replaying a batch (same batch_id — the foreachBatch at-least-once
    window) must not re-append: the commit meta is the ledger."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.txn_table import (
        txn_batch_sink,
    )

    sink = txn_batch_sink(table, "scores")
    sink(spark.range(0, 3), 0)
    sink(spark.range(0, 3), 0)   # replay -> skipped
    sink(spark.range(10, 12), 1)
    sink(spark.range(10, 12), 1)  # replay -> skipped
    assert _ids(table.read(spark)) == [0, 1, 2, 10, 11]
    assert table.last_batch("scores") == 1
    assert table.last_batch("other-app") == -1
    # a real end-to-end stream through the sink
    import tempfile

    src = spark.readStream.format("rate").option("rowsPerSecond", 1000).load()
    q = (
        src.selectExpr("value as id")
        .writeStream.foreachBatch(txn_batch_sink(table, "stream"))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="txn_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert table.last_batch("stream") >= 0


def test_table_cli_history_read_vacuum(spark, table, capsys):
    import json as _json

    from real___time_fraud_detection_using_apache_kafka_spark.__main__ import main

    table.append(spark.range(0, 2))
    table.overwrite(spark.range(5, 8))
    assert main(["table", "history", "--path", table.path]) == 0
    hist = [_json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["action"] == "overwrite"

    assert main(["table", "read", "--path", table.path, "--version", "0"]) == 0
    rows = [_json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert sorted(r["id"] for r in rows) == [0, 1]

    assert main(["table", "vacuum", "--path", table.path]) == 0
    assert "versions now [1]" in capsys.readouterr().out


def test_schema_evolution_merge_read(spark, table):
    """Appending a commit with an extra column evolves the table:
    merge_schema reads old rows with nulls in the new column, and time
    travel to the pre-evolution version still sees the old schema."""
    from pyspark.sql import functions as F

    table.append(spark.range(0, 2))
    table.append(spark.range(10, 12).withColumn("score", F.lit(0.5)))
    df = table.read(spark, merge_schema=True)
    assert set(df.columns) == {"id", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {0: None, 1: None, 10: 0.5, 11: 0.5}
    assert table.read(spark, version=0).columns == ["id"]
