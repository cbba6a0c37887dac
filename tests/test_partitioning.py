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
