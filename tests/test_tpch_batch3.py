"""Semantic invariants + plan-shape pins for the batch-3 TPC-H analogs
(queries_tpch3.py: Q2, Q11, Q12, Q16, Q20, Q21).

The DuckDB hash-compare (tools/check_oracle.py, driver gate) is the
ground-truth value check; these pin the invariants and physical-plan
properties that must survive scale-factor changes, at sf0.001.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.sources.tables import load_table

Q = plans.QUERIES


def run(name, spark, sf_dir):
    return Q[name].fn(spark, sf_dir)


def plan_of(spark, name: str) -> str:
    df = Q[name].fn(spark, "/root/testdata/sf0.01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q2_one_min_cost_row_set_per_part(spark, sf_dir):
    df = run("q2_min_cost_supplier", spark, sf_dir)
    rows = df.collect()
    assert df.columns == [
        "partkey", "part_name", "supp_name", "nation", "acctbal", "min_cost"
    ]
    # every surviving row carries its part's minimum cost: grouping by
    # partkey, min_cost must be single-valued
    per_part = {}
    for r in rows:
        per_part.setdefault(r.partkey, set()).add(r.min_cost)
    assert all(len(v) == 1 for v in per_part.values())
    assert all(r.min_cost > 0 for r in rows)


def test_q2_broadcast_only_no_fact_shuffle_join(spark):
    """Part and the ASIA supplier chain prune lineitem via broadcast;
    the correlated min is a window over the aggregate's own partkey
    partitioning — no sort-merge join anywhere."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") >= 1
    assert "TakeOrderedAndProject" in plan


def test_q11_threshold_filters_to_strict_subset(spark, sf_dir):
    kept = run("q11_important_parts", spark, sf_dir)
    n_kept = kept.count()
    assert n_kept > 0
    assert kept.filter(F.col("part_value") <= 0).count() == 0
    # the fraction-of-total filter must actually drop something: total
    # distinct parts supplied by region-2 suppliers exceeds the kept set
    li = load_table(spark, sf_dir, "lineitem")
    assert n_kept < li.select("l_partkey").distinct().count()


def test_q12_partitions_every_lineitem_exactly_once(spark, sf_dir):
    df = run("q12_shipping_lateness", spark, sf_dir)
    total = df.agg((F.sum("high_line_count") + F.sum("low_line_count"))).first()[0]
    assert total == load_table(spark, sf_dir, "lineitem").count()
    assert set(r.ship_bucket for r in df.collect()) <= {"ON_TIME", "LATE"}


def test_q12_prunes_lineitem_to_two_columns(spark):
    plan = plan_of(spark, "q12_shipping_lateness")
    assert "ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp_ntz>" in plan


def test_q16_excludes_negative_balance_suppliers(spark, sf_dir):
    df = run("q16_part_supplier_counts", spark, sf_dir)
    rows = df.collect()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert all(0 < r.supplier_cnt <= n_supp for r in rows)
    assert all(r.psize in (1, 9, 14, 19, 23, 36, 45, 49) for r in rows)
    assert all(r.brand != "Brand#1" and r.ptype != "PROMO" for r in rows)


def test_q16_anti_join_is_broadcast(spark):
    plan = plan_of(spark, "q16_part_supplier_counts")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # size-IN reaches the part scan
    assert "In(p_size, [1,14,19,23,36,45,49,9])" in plan


def test_q20_surplus_condition_holds(spark, sf_dir):
    # recompute the qualifying set directly and compare supplier names
    names = {r.supp_name for r in run("q20_promotion_suppliers", spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    pairs = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("q_all"),
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= "1997-01-01")
                    & (F.col("l_shipdate") < "1998-01-01"),
                    F.col("l_quantity"),
                )
            ).alias("q_97"),
        )
        .filter(F.col("q_97").isNotNull() & (F.col("q_all") > 2 * F.col("q_97")))
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    expect = {
        r.s_name
        for r in supp.join(
            pairs, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        ).collect()
    }
    assert names == expect


def test_q21_sole_late_supplier_semantics(spark, sf_dir):
    df = run("q21_waiting_suppliers", spark, sf_dir)
    rows = df.collect()
    assert all(r.numwait >= 1 for r in rows)
    # recount one supplier's orders the slow way
    if rows:
        pick = rows[0].supp_name
        o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
        li = load_table(spark, sf_dir, "lineitem").join(
            o, F.col("l_orderkey") == F.col("o_orderkey")
        ).select(
            "l_orderkey",
            "l_suppkey",
            (F.datediff("l_shipdate", "o_orderdate") > 180).alias("late"),
        )
        per = li.groupBy("l_orderkey").agg(
            F.count_distinct("l_suppkey").alias("ns"),
            F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nl"),
        )
        sk = (
            load_table(spark, sf_dir, "supplier")
            .filter(F.col("s_name") == pick)
            .first()
            .s_suppkey
        )
        n = (
            li.filter(F.col("late") & (F.col("l_suppkey") == sk))
            .select("l_orderkey")
            .distinct()
            .join(per.filter((F.col("ns") >= 2) & (F.col("nl") == 1)), "l_orderkey")
            .count()
        )
        assert n == rows[0].numwait


def test_q21_scans_lineitem_once(spark):
    """The EXISTS/NOT-EXISTS rewrite must not re-scan the fact: one
    lineitem scan feeds the per-order aggregate and the late-row side."""
    import re

    plan = plan_of(spark, "q21_waiting_suppliers")
    li_scans = len(re.findall(r"\(\d+\) Scan parquet[^\n]*lineitem", plan))
    assert li_scans <= 2, plan
