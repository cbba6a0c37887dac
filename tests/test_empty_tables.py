"""Degenerate-input sweep: EVERY catalog query must execute against
empty (zero-row, full-schema) tables without raising.

Empty inputs are not an edge case at 100 TB — they are what a partition
filter that matches nothing, a cold bootstrap, or a gap day produces.
This sweep is the catalog-wide generalization of the round-3 advisor
find (null text turning ``F.size`` = -1 into phantom segments): it
caught, in round 4, two ANSI divide-by-zero crashes
(dq_constraint_report, dashboard_snapshot — the latter also reachable
on NON-empty data with no predicted positives) and three ANN tiers
whose MLlib fits crash on zero rows (ivf/pca/lsh).

Row counts are NOT asserted — a global aggregate legitimately emits one
row of nulls/zeros on empty input; the contract here is "no crash,
stable schema".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.schemas import (
    TESTDATA_TABLES,
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TESTDATA_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    return str(d)


def test_every_catalog_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in plans.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — we want the full census
            failures.append((name, str(e).split("\n", 1)[0][:120]))
    assert failures == [], failures
