"""Semantic invariants for the batch-2 TPC-H analogs (queries_tpch.py).

The DuckDB hash-compare (tools/check_oracle.py, driver gate) is the
ground-truth check; these tests pin the invariants that survive scale
factor changes, at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

Q = plans.QUERIES


def run(name, spark, sf_dir):
    return Q[name].fn(spark, sf_dir)


def test_q7_pair_symmetry_schema(spark, sf_dir):
    df = run("q7_volume_shipping", spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["supp_nation", "cust_nation", "ship_year", "revenue"]
    for r in rows:
        assert {r.supp_nation, r.cust_nation} <= {"NATION_3", "NATION_8"}
        assert r.ship_year in (1996, 1997)
        assert r.revenue > 0


def test_q8_share_bounded(spark, sf_dir):
    for r in run("q8_market_share", spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_q9_profit_positive_and_grouped(spark, sf_dir):
    df = run("q9_product_profit", spark, sf_dir)
    rows = df.collect()
    assert len(rows) == df.select("nation", "o_year").distinct().count()
    assert all(r.profit > 0 for r in rows)


def test_q10_topk_ordered_desc(spark, sf_dir):
    revs = [r.revenue for r in run("q10_returned_items", spark, sf_dir).collect()]
    assert len(revs) <= 20
    assert revs == sorted(revs, reverse=True)


def test_q13_distribution_accounts_for_every_customer(spark, sf_dir):
    df = run("q13_customer_distribution", spark, sf_dir)
    total = df.agg(F.sum("custdist")).first()[0]
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert total == n_cust


def test_q15_equals_max_of_revenue(spark, sf_dir):
    rows = run("q15_top_supplier", spark, sf_dir).collect()
    assert len(rows) >= 1
    # every returned supplier carries the same (maximum) revenue
    assert len({r.total_revenue for r in rows}) == 1


def test_q17_single_scalar(spark, sf_dir):
    rows = run("q17_small_quantity_revenue", spark, sf_dir).collect()
    assert len(rows) == 1


def test_q18_all_orders_exceed_threshold(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    qty = {
        r.l_orderkey: r.q
        for r in li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).collect()
    }
    for r in run("q18_large_volume_customers", spark, sf_dir).collect():
        assert qty[r.orderkey] > 300
        assert r.total_qty == pytest.approx(qty[r.orderkey], abs=0.01)


def test_q19_disjunctive_agg_matches_manual(spark, sf_dir):
    row = run("q19_disjunctive_revenue", spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    manual = j.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#18") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    ).count()
    assert row.n_lines == manual


def test_q22_dormant_excludes_recent_orderers(spark, sf_dir):
    df = run("q22_dormant_customers", spark, sf_dir)
    assert df.columns == ["cntrycode", "numcust", "totacctbal"]
    for r in df.collect():
        assert r.cntrycode in (1, 3, 5, 7, 9)
        assert r.numcust > 0


def test_tpch_batch2_plans_broadcast_dims(spark, sf_dir):
    """Dimension sides must broadcast: no shuffle exchange keyed on a
    dim join in q9 (part+supplier both broadcast, single fact shuffle)."""
    plan = (
        run("q9_product_profit", spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
