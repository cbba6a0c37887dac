"""Storage-layout scale strategies (sources/io.py): partition pruning on
hive-layout writes, and shuffle-free joins on bucketed tables — the two
write-side levers SCALE.md leans on, verified at the plan level."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.sources.io import (
    write_bucketed_table,
    write_partitioned_parquet,
)
from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must show up as PartitionFilters
    (directory-level pruning), not a post-scan Filter."""
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned_parquet(
        events, path, ["event_type"], sort_cols=["user_id", "ts"]
    )
    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = _plan(back)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert back.count() == events.filter(F.col("event_type") == "purchase").count()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with ZERO Exchange
    operators — the write-time shuffle satisfies the join's distribution
    requirement forever after."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        customers = load_table(spark, SF, "customer")
        write_bucketed_table(orders, "orders_b", "o_custkey", 8)
        write_bucketed_table(customers, "cust_b", "c_custkey", 8)
        joined = spark.table("orders_b").join(
            spark.table("cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_training_shards_balanced_and_capped(spark, sf_dir, tmp_path):
    import glob

    from real___time_fraud_detection_using_apache_kafka_spark.sources.io import (
        write_training_shards,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", records_per_file=100, n_shards=4)
    files = glob.glob(f"{out}/part-*.parquet")
    # 4 range partitions x ceil(rows/4/100) files each; every file <= cap
    assert len(files) >= 4
    total = 0
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 100
        total += n
    assert total == docs.count()


def test_zorder_key_interleaves_bits(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.sources.io import zorder_key

    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()}
    # interleave(x=0b11, y=0b101): x bits at even positions, y at odd
    #   x: 1->bit0, 1->bit2 ; y: 1->bit1, 0->bit3, 1->bit5  => 0b100111 = 39
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2
    assert got[(3, 5)] == 39


def test_zorder_layout_prunes_second_dimension(spark, sf_dir, tmp_path):
    """For a predicate on the NON-leading key, a z-ordered layout
    concentrates matches in far fewer files than a single-key-sorted
    layout — the file/row-group pruning win the writer exists for."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.io import write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    pred = F.col("l_suppkey") < 4
    n_z = (
        spark.read.parquet(zpath).filter(pred)
        .select(F.input_file_name()).distinct().count()
    )
    n_lin = (
        spark.read.parquet(lpath).filter(pred)
        .select(F.input_file_name()).distinct().count()
    )
    # matches exist, and the z-layout touches at most half the files the
    # leading-key layout does
    assert spark.read.parquet(zpath).filter(pred).count() > 0
    assert n_z * 2 <= n_lin, (n_z, n_lin)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Micro-batch sinks leave one file set per commit; compaction must
    collapse them near the target size without changing a row or
    breaking the hive partition layout (pruning survives)."""
    import os

    from real___time_fraud_detection_using_apache_kafka_spark.sources.io import compact_parquet

    d = str(tmp_path / "tbl")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for i in range(6):  # six tiny "micro-batch" commits, 4 files each
        docs.filter((F.col("doc_id") % 6) == i).repartition(4).write.mode(
            "append"
        ).partitionBy("lang").parquet(d)
    before = spark.read.parquet(d)
    before_rows = before.count()
    before_en = before.filter(F.col("lang") == "en").count()
    fb, fa = compact_parquet(spark, d, target_file_mb=256)
    after = spark.read.parquet(d)
    assert fa < fb
    assert after.count() == before_rows
    # layout intact: same partition dirs, pruning still directory-level
    assert sorted(p for p in os.listdir(d) if p.startswith("lang=")) == sorted(
        {f"lang={r.lang}" for r in docs.select("lang").distinct().collect()}
    )
    assert after.filter(F.col("lang") == "en").count() == before_en


def test_observed_quality_metrics_ride_the_action(spark, tmp_path):
    """df.observe metrics must match a direct computation without a
    second scan: one write action yields count + per-column null counts."""
    from real___time_fraud_detection_using_apache_kafka_spark.sources.io import observed_quality

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with_nulls = docs.withColumn(
        "maybe", F.when(F.col("doc_id") % 3 == 0, F.col("text"))
    )
    odf, obs = observed_quality(with_nulls, ["maybe", "text"])
    odf.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    n = docs.count()
    expected_nulls = docs.filter(F.col("doc_id") % 3 != 0).count()
    assert got == {"n_rows": n, "null_maybe": expected_nulls, "null_text": 0}


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Joining a hive-partitioned fact to a FILTERED dim must inject a
    runtime subquery filter on the partition column (DPP) — at 100 TB
    this skips whole partition directories the static planner cannot
    prune because the qualifying keys are only known at runtime."""
    events = load_table(spark, SF, "events")
    fact_path = str(tmp_path / "events_part")
    write_partitioned_parquet(events, fact_path, ["event_type"])
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("error", 2), ("click", 3)], "event_type string, w int"
    )
    # defeat the broadcast fast path so DPP (not BHJ pushdown) does the work
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = fact.join(dim.filter(F.col("w") == 1), "event_type")
        plan = _plan(joined)
        assert "dynamicpruning" in plan.lower(), plan
        n = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    want = events.filter(F.col("event_type") == "purchase").count()
    assert n == want


def test_corrupt_file_handling_modes(spark, tmp_path):
    """A 100 TB lake always contains a torn file eventually: the default
    read must FAIL LOUDLY on a corrupted footer, and the explicit
    `ignoreCorruptFiles` opt-in must skip it and return every readable
    row — silent data loss is a choice, never a default."""
    import glob

    d = str(tmp_path / "lake")
    load_table(spark, SF, "orders").limit(200).repartition(4).write.parquet(d)
    victim = sorted(glob.glob(f"{d}/part-*.parquet"))[0]
    good_rows = (
        spark.read.parquet(d).count()
        - spark.read.parquet(victim).count()
    )
    schema = spark.read.parquet(d).schema
    with open(victim, "r+b") as f:  # tear the footer
        f.seek(-8, 2)
        f.write(b"XXXXXXXX")
    import glob as _glob
    import os

    # drop Hadoop's local-FS .crc sidecar for the victim: object stores
    # have no such sidecar, and the ChecksumException it raises would
    # mask the parquet-level corruption this test is about
    for crc in _glob.glob(f"{d}/.part-*.crc"):
        if os.path.basename(victim) in crc:
            os.remove(crc)
    import pytest as _pytest

    spark.catalog.clearCache()
    with _pytest.raises(Exception, match="(?i)parquet|corrupt|footer"):
        spark.read.schema(schema).parquet(d).count()
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        spark.catalog.clearCache()
        assert spark.read.schema(schema).parquet(d).count() == good_rows
    finally:
        spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
