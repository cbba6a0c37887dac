"""Data-quality audit queries: structural invariants (value parity vs
DuckDB is the oracle gate's job)."""

from __future__ import annotations

from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES


def test_constraint_report_covers_suite_and_flags_consistently(spark, sf_dir):
    rows = QUERIES["dq_constraint_report"].fn(spark, sf_dir).collect()
    by_name = {r["constraint_name"]: r for r in rows}
    assert set(by_name) == {
        "row_count_nonzero",
        "o_orderkey_unique",
        "o_custkey_complete",
        "o_totalprice_nonnegative",
        "o_orderstatus_in_domain",
        "o_orderdate_in_range",
        "fk_orders_customer",
    }
    for r in rows:
        assert (r["passed"] == 1) == (r["violations"] == 0)
        if r["constraint_name"] != "row_count_nonzero":
            assert 0.0 <= r["metric"] <= 1.0, r
    # the driver testdata is clean: the whole suite passes on it
    assert all(r["passed"] == 1 for r in rows)


def test_profile_rows_are_internally_consistent(spark, sf_dir):
    rows = QUERIES["profile_orders_columns"].fn(spark, sf_dir).collect()
    assert {r["column_name"] for r in rows} == {
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
    }
    n = rows[0]["n_rows"]
    for r in rows:
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n
        assert r["min_value"] is not None and r["max_value"] is not None
    key = next(r for r in rows if r["column_name"] == "o_orderkey")
    assert key["n_distinct"] == n and key["n_null"] == 0
