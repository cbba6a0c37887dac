"""Round-10 plan pins.

The catalog-wide unpartitioned-window sweep (VERDICT r9 item 6): every
ordered single-partition window goes through ``bounded_seq_window``,
which since r10 partitions by a non-foldable constant key — so the
physical plan of EVERY catalog query must contain ZERO window operators
with an empty partition spec.  The pin replaces warning-log greps: an
unpartitioned window in any new plan is an un-audited whole-dataset
funnel by definition (the audited-bounded ones no longer look like
this), and if a Spark upgrade ever folds the constant key, this test —
not a human reading WindowExec warnings — catches it.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

_WINDOW_NODES = {"WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"}


def _iter_nodes(jplan):
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _iter_nodes(children.apply(i))


def _unpartitioned_windows(df):
    """Class names of window operators with an empty partitionSpec in
    df's physical plan (AQE must be off so executedPlan is the full
    tree, not an AdaptiveSparkPlan wrapper)."""
    hits = []
    for node in _iter_nodes(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in _WINDOW_NODES and node.partitionSpec().isEmpty():
            hits.append(cls)
    return hits


def test_constant_key_survives_catalyst(spark):
    """The mechanism itself: pmod(xxhash64(col), 1) must still be in
    the partition spec after optimization (a foldable key would be
    eliminated and the window silently reverts to unpartitioned)."""
    from pyspark.sql import functions as F

    from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
        bounded_seq_window,
    )

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = spark.range(10).withColumn(
            "s", F.sum("id").over(bounded_seq_window(F.col("id")))
        )
        assert _unpartitioned_windows(df) == []
        # and the semantics are the plain global ordered window
        rows = {r["id"]: r["s"] for r in df.collect()}
        assert rows[0] == 0 and rows[9] == 45
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_sort_order_only_call_requires_anchor(spark):
    from pyspark.sql import functions as F

    from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
        bounded_seq_window,
    )

    with pytest.raises(ValueError, match="anchor"):
        bounded_seq_window(F.desc("x"))
    # anchor unblocks it
    bounded_seq_window(F.desc("x"), anchor=F.col("x"))


def test_no_unpartitioned_window_in_any_catalog_plan(spark):
    """Catalog-wide sweep: build every query at sf0.001 with AQE off and
    walk the physical plan — zero unpartitioned window operators
    anywhere (VERDICT r9 item 6's 'assert zero WindowExec warnings',
    pinned at the plan level where it is deterministic)."""
    from real___time_fraud_detection_using_apache_kafka_spark import plans

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    offenders = {}
    try:
        for name, fn in plans.queries().items():
            df = fn(spark, SF_DIR)
            hits = _unpartitioned_windows(df)
            if hits:
                offenders[name] = hits
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert offenders == {}, offenders
