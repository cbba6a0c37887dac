"""Relational query catalog: scans, projections/filters, dedup, joins,
aggregations, windows, set ops (SURVEY.md §2.1-2.8) over the TPC-H-ish
driver testdata.

Every query aliases computed columns identically in the Spark plan and the
DuckDB oracle, and rounds double aggregates explicitly on both sides so
accumulation-order last-bit differences cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import relational as R
from ..operators.aggregates import deterministic_mode
from ..operators.dedup import exact_dedup as _exact_dedup
from ..operators.windows import latest_per_group, topk, topk_per_group
from ..sources.tables import load_table
from .registry import register


# ---------------------------------------------------------------------------
# TPC-H-style composite queries (scan -> filter -> join -> agg -> sort)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: the full scan->filter->agg pipeline (S1, P4, A3-A5).

    Shipdate predicate and 7-column projection both push to the parquet
    scan; the groupBy has 6 groups so partial aggregation collapses nearly
    all rows map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective dim filter -> fact joins -> agg -> top-k.

    customer(BUILDING) is small -> broadcast into orders; orders->lineitem
    is the only shuffle join (both sides shuffled by orderkey).  The final
    top-10 is TakeOrderedAndProject, not a global sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    joined = R.broadcast_dim_join(o, c, F.col("c_custkey") == F.col("o_custkey"))
    joined = l.join(joined, F.col("l_orderkey") == F.col("o_orderkey"))
    agg = joined.groupBy(
        F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return topk(agg, [F.desc("revenue"), F.asc("orderkey")], 10).select(
        "orderkey", "revenue", "orderdate"
    )


@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r JOIN nation n   ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o   ON o.o_custkey  = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey  = l.l_suppkey
                                 AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join with broadcast dims (S1, joins §2.4).

    region/nation/customer/supplier are broadcast; only orders-lineitem
    shuffles.  The local-supplier condition (s_nationkey = c_nationkey)
    rides on the broadcast join, no extra shuffle.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    fact = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    joined = fact.join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
    joined = joined.join(
        F.broadcast(s),
        (joined["l_suppkey"] == s["s_suppkey"])
        & (joined["c_nationkey"] == s["s_nationkey"]),
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Projections / filters / null handling (P1-P11)
# ---------------------------------------------------------------------------

@register(
    "projection_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           round(o_totalprice * 110) / 100 AS taxed_price,
           CASE WHEN o_totalprice >= 30000 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice BETWEEN 1000 AND 100000
    """,
)
def projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3/P4 + F12: projection with computed + conditional columns
    under a pushed-down filter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & F.col("o_totalprice").between(1000, 100000)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            # round(x*110)/100, not round(x*1.1, 2): a 2-decimal price times
            # 1.1 lands on third-decimal .005 ties where Spark (BigDecimal
            # HALF_UP) and C-library rounding (DuckDB) disagree; integer
            # rounding ties at .5 round identically in both.
            (F.round(F.col("o_totalprice") * 110) / 100).alias("taxed_price"),
            F.when(F.col("o_totalprice") >= 30000, "big")
            .otherwise("small")
            .alias("size_class"),
        )
    )


@register(
    "null_handling",
    oracle="""
    SELECT c_mktsegment,
           count(*)                                    AS n_customers,
           count(CASE WHEN c_acctbal >= 0 THEN 1 END)  AS n_nonneg,
           round(sum(coalesce(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0)), 2)
                                                       AS sum_filled
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9/P10: nulls are introduced (negative balances -> null), then
    counted and coalesce-filled — fillna/dropna/get-with-default."""
    c = load_table(spark, sf_dir, "customer")
    nn = F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))  # else NULL
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.count(nn).alias("n_nonneg"),
        F.round(F.sum(R.with_default(nn, 0.0)), 2).alias("sum_filled"),
    )


# ---------------------------------------------------------------------------
# Dedup (D1)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 (FD/model.py:48): exact dedup = hash aggregate over the projected
    columns; map-side partial dedup bounds shuffle volume by the distinct
    count, not the row count."""
    li = load_table(spark, sf_dir, "lineitem")
    return _exact_dedup(
        li.select("l_returnflag", "l_linestatus", "l_quantity")
    )


# ---------------------------------------------------------------------------
# Aggregations (A2-A7) / grouping extensions
# ---------------------------------------------------------------------------

@register(
    "agg_stats_orders",
    oracle="""
    SELECT o_orderpriority,
           count(*)                          AS n_orders,
           count(DISTINCT o_custkey)         AS n_customers,
           round(sum(o_totalprice), 2)       AS sum_price,
           round(avg(o_totalprice), 4)       AS avg_price,
           round(min(o_totalprice), 2)       AS min_price,
           round(max(o_totalprice), 2)       AS max_price,
           min(o_orderdate)                  AS first_order,
           max(o_orderdate)                  AS last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-A5, A7: grouped count / distinct-count / sum / avg / min / max."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "stats_moments_lineitem",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                 AS sd_qty,
           round(var_samp(l_quantity), 4)                    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 2)  AS covar_pop_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-moment aggregates (extension family beyond A2-A5):
    sample stddev/variance and correlation/covariance per return flag.
    All five are single-pass mergeable aggregates (Welford-style partial
    states combined at the reduce), so they partial-aggregate map-side
    exactly like sum/avg — O(groups) reduce state at any SF.  Both
    engines use the same n-1 / n definitions; rounding absorbs partial-
    merge accumulation-order ulps."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
        .alias("covar_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2)
        .alias("covar_pop_qty_price"),
    )


@register(
    "customer_order_digest",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           string_agg(cast(o_orderkey AS VARCHAR), ','
                      ORDER BY o_orderkey) AS orderkeys_csv,
           string_agg(DISTINCT o_orderpriority, '|'
                      ORDER BY o_orderpriority) AS priorities
    FROM orders
    WHERE o_custkey <= 200
    GROUP BY o_custkey
    """,
)
def customer_order_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-aggregation family (collect_list / collect_set — extension):
    per-customer ordered order-key digest and distinct priority set,
    rendered as delimited strings so the result is engine-portable.
    ``sort_array`` pins element order (collect_list order is otherwise
    partition-arrival-dependent — never hashable as-is); the per-group
    array is bounded by orders-per-customer, not SF, so collect state
    stays small at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey") <= 200)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("o_orderkey"))
            ).alias("orderkeys_csv"),
            # nullif: with every priority NULL in the group, collect_set
            # is empty and concat_ws yields '' while string_agg yields
            # NULL — emit NULL on both engines ('' is unreachable
            # otherwise: priorities are non-empty literals)
            F.nullif(
                F.concat_ws(
                    "|", F.sort_array(F.collect_set("o_orderpriority"))
                ),
                F.lit(""),
            ).alias("priorities"),
        )
    )


@register(
    "mode_source_per_lang",
    oracle="""
    WITH counts AS (
        SELECT lang, source, count(*) AS _cnt FROM documents GROUP BY lang, source
    ), ranked AS (
        SELECT lang, source,
               row_number() OVER (PARTITION BY lang ORDER BY _cnt DESC, source ASC) AS rn
        FROM counts
    )
    SELECT lang, source AS mode_source FROM ranked WHERE rn = 1
    """,
)
def mode_source_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (FD/evaluation.py:170,172): deterministic mode per group (ties ->
    smaller value), as count-then-rank so the oracle can mirror it."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_mode(docs, ["lang"], "source", out_col="mode_source")


@register(
    "rollup_region_nation",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets extension (§2.5 note): ROLLUP region->nation with
    subtotal rows labeled 'ALL'."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = R.broadcast_dim_join(
        c, n, c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "n_customers",
            "sum_acctbal",
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets extension (§2.5 note): CUBE over (status, priority) —
    all four grouping sets in one pass (Catalyst expands the cube before
    the single partial-agg shuffle; no per-set re-scan)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "pivot_event_type_daily",
    oracle="""
    SELECT cast(date_trunc('day', ts) AS DATE) AS day,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS error
    FROM events
    GROUP BY 1
    """,
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot extension: daily counts per event type as wide columns."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


# ---------------------------------------------------------------------------
# Windows / top-k (W1-W4)
# ---------------------------------------------------------------------------

@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 (FD/model.py:183): global top-k by value — TakeOrderedAndProject,
    per-partition heaps, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return topk(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 10).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
    )


@register(
    "topk_orders_per_customer",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        FROM orders
    )
    SELECT o_custkey, o_orderkey, totalprice, rnk FROM ranked WHERE rnk <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-style per-group top-k via row_number window (single shuffle on
    the partition key)."""
    o = load_table(spark, sf_dir, "orders")
    ranked = topk_per_group(
        o, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )
    return ranked.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rnk"
    )


@register(
    "latest_event_per_user",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id, ts, event_type FROM ranked WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (FD/dashboard.py:156-162): most-recent record per key."""
    e = load_table(spark, sf_dir, "events")
    return latest_per_group(
        e, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "ts", "event_type")


# ---------------------------------------------------------------------------
# Joins: semi / anti (§2.4 complement)
# ---------------------------------------------------------------------------

@register(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_active
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having >=1 order, counted per segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    active = R.semi_join(c, o, c["c_custkey"] == o["o_custkey"])
    return active.groupBy("c_mktsegment").agg(F.count("*").alias("n_active"))


@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return R.anti_join(c, o, c["c_custkey"] == o["o_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------

@register(
    "set_ops_nations",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'both' AS side, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
    UNION ALL
    SELECT 'customer_only' AS side, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
    UNION ALL
    SELECT 'supplier_only' AS side, nationkey FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: INTERSECT / EXCEPT / UNION ALL over nation-key sets."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    both = R.intersect(c, s).select(F.lit("both").alias("side"), "nationkey")
    c_only = c.exceptAll(s).select(F.lit("customer_only").alias("side"), "nationkey")
    s_only = s.exceptAll(c).select(F.lit("supplier_only").alias("side"), "nationkey")
    return both.unionByName(c_only).unionByName(s_only)


@register(
    "bag_set_ops_nations",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey FROM customer
                WHERE c_custkey <= 500),
         sn AS (SELECT s_nationkey AS nationkey FROM supplier)
    SELECT 'intersect_all' AS op, nationkey, count(*) AS n FROM (
        SELECT nationkey FROM cn INTERSECT ALL SELECT nationkey FROM sn
    ) GROUP BY nationkey
    UNION ALL
    SELECT 'except_all' AS op, nationkey, count(*) AS n FROM (
        SELECT nationkey FROM cn EXCEPT ALL SELECT nationkey FROM sn
    ) GROUP BY nationkey
    """,
)
def bag_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 complement, BAG semantics: ``intersectAll`` keeps min(m, n)
    copies of each duplicated row and ``exceptAll`` subtracts
    per-occurrence — distinct SQL semantics from the set forms (both are
    one aggregate-count-per-side plan under the hood, not a join blowup).
    Rolled up per key so the result is order-insensitively hashable."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 500
    ).select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    ia = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionByName(ea)


# ---------------------------------------------------------------------------
# Scalar-function queries (F1-F14, F19-F21)
# ---------------------------------------------------------------------------

@register(
    "scalar_datetime_parts",
    oracle="""
    SELECT cast(extract(year  FROM ts) AS INT) AS year,
           cast(extract(month FROM ts) AS INT) AS month,
           cast(extract(day   FROM ts) AS INT) AS day,
           cast(extract(hour  FROM ts) AS INT) AS hour,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def scalar_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4 (FD/model.py:53-58): timestamp decomposition exactly as the
    feature pipeline derives its 6 time features."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(trim(c_name))                           AS name_norm,
           replace(lower(trim(c_mktsegment)), ' ', '_')  AS segment_key,
           printf('$%.2f', c_acctbal)                    AS acctbal_usd,
           substr(c_name, 1, 8)                          AS name_prefix,
           -- || not concat(): DuckDB's concat SKIPS null args while
           -- Spark's propagates; || null-propagates on both engines
           c_mktsegment || '#' || cast(c_nationkey AS VARCHAR) AS seg_nation
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F9/F10/F14/F18: currency render, key normalization, substring,
    concat — the reference's log-formatting functions as columns."""
    from ..functions.scalar import currency_format, normalize_key

    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.lower(F.trim("c_name")).alias("name_norm"),
        normalize_key(F.col("c_mktsegment")).alias("segment_key"),
        currency_format(F.col("c_acctbal")).alias("acctbal_usd"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
    )


@register("generator_profile", oracle=None)
def generator_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15-F18 (FD/producer.py:52-124) as a driver-visible surface: a
    seeded 5,000-row synthetic batch profiled per transaction type —
    counts, amount moments, fraud-label rate, distinct locations.  Pure
    JVM ``rand(seed)`` column expressions (no Python loop, no driver
    generation); rows-only check because Spark's and DuckDB's PRNG
    streams differ by design (SURVEY §7 hard-part 6 — tests assert
    distributional properties instead)."""
    from ..sources.generator import batch_transactions

    txns = batch_transactions(spark, n=5000, seed=42)
    return (
        txns.groupBy("transaction_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("amount"), 2).alias("avg_amount"),
            F.round(F.stddev_samp("amount"), 2).alias("sd_amount"),
            F.round(F.avg(F.col("is_fraud").cast("double")), 4)
            .alias("fraud_rate"),
            F.countDistinct("location").alias("n_locations"),
        )
        .orderBy("transaction_type")
    )


@register(
    "generator_profile_audit",
    # The generator cannot run in DuckDB, but its INVARIANTS are exact
    # constants for ANY partitioning/PRNG draw, so the oracle is the
    # literal expected table: every value below is either structural
    # (n_rows, the alternating fraud label, the 2 s timestamp lattice)
    # or a for-all-u∈[0,1) range/domain guarantee whose violation count
    # must be 0; the one distributional metric (the F16 LOC99 gate at
    # p=0.3 over 2,500 fraud rows) is expressed as an off-band
    # indicator with a ±10.9σ band, so it is 0 for every partition
    # layout.  A generator bug flips a value -> hash mismatch.
    oracle="""
    SELECT * FROM (VALUES
        ('bad_amount_range',               0),
        ('bad_balance_range',              0),
        ('bad_category_domain',            0),
        ('bad_id_format',                  0),
        ('bad_location_domain',            0),
        ('loc99_on_nonfraud',              0),
        ('loc99_share_off_band',           0),
        ('max_time',              1700009998),
        ('min_time',              1700000000),
        ('n_fraud',                     2500),
        ('n_rows',                      5000)
    ) t(metric, value)
    """,
)
def generator_profile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLED audit twin of ``generator_profile`` (VERDICT r10 item 2):
    the rows-only profile's generator (F15-F18, FD/producer.py:52-124)
    is hash-graded through its deterministic invariants.

    Structural facts (exact for any seed): 5,000 rows; ``is_fraud``
    alternates per index (F17) so exactly 2,500 fraud rows; timestamps
    sit on the 2 s lattice from 1700000000.  Range/domain facts (hold
    for every PRNG draw by construction of the column expressions):
    amount in [10,5000] ∪ [8000,10000] (the F16 fraud bump), balance in
    [1000,100000], categorical columns inside their declared domains,
    tagged-id wire formats (F18), LOC99 only ever on a fraud row.
    Distributional fact: the F16 gate marks ~30% of fraud rows — the
    audit asserts the share sits in [0.2, 0.4], a ±10.9σ band at
    n=2,500, so only a broken gate (not sampling noise or partition
    count) can trip it.
    """
    from ..sources.generator import (
        ACCOUNT_TYPES,
        CURRENCIES,
        DEVICES,
        TXN_TYPES,
        batch_transactions,
    )

    t = batch_transactions(spark, n=5000, seed=42)
    amount_ok = (
        (F.col("amount") >= 10) & (F.col("amount") <= 5000)
    ) | ((F.col("amount") >= 8000) & (F.col("amount") <= 10000))
    ids_ok = (
        F.col("customer_id").rlike("^CUST[0-9]{4}$")
        & F.col("merchant_id").rlike("^MERCH[0-9]{3}$")
        & F.col("device_id").rlike("^DEV[0-9]{4}$")
        & F.col("transaction_id").rlike("^TXN[0-9]{6,7}$")
    )
    domain_ok = (
        F.col("transaction_type").isin(TXN_TYPES)
        & F.col("transaction_currency").isin(CURRENCIES)
        & F.col("transaction_device").isin(DEVICES)
        & F.col("account_type").isin(ACCOUNT_TYPES)
    )
    loc99_share = F.avg(
        F.when(F.col("is_fraud") == 1, (F.col("location") == "LOC99").cast("double"))
    )
    agg = t.agg(
        F.count("*").alias("n_rows"),
        F.sum("is_fraud").cast("long").alias("n_fraud"),
        F.min("time").alias("min_time"),
        F.max("time").alias("max_time"),
        F.count_if(~amount_ok).alias("bad_amount_range"),
        F.count_if(
            (F.col("account_balance") < 1000) | (F.col("account_balance") > 100000)
        ).alias("bad_balance_range"),
        F.count_if(
            ~F.col("location").rlike("^LOC([1-9]|1[0-9]|20|99)$")
        ).alias("bad_location_domain"),
        F.count_if(
            (F.col("location") == "LOC99") & (F.col("is_fraud") == 0)
        ).alias("loc99_on_nonfraud"),
        F.count_if(~domain_ok).alias("bad_category_domain"),
        F.count_if(~ids_ok).alias("bad_id_format"),
        ((loc99_share < 0.2) | (loc99_share > 0.4))
        .cast("long")
        .alias("loc99_share_off_band"),
    )
    metrics = [
        "bad_amount_range", "bad_balance_range", "bad_category_domain",
        "bad_id_format", "bad_location_domain", "loc99_on_nonfraud",
        "loc99_share_off_band", "max_time", "min_time", "n_fraud", "n_rows",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return agg.selectExpr(
        f"stack({len(metrics)}, {stack}) AS (metric, value)"
    )


@register(
    "fuzzy_category_recovery",
    oracle="""
    WITH canon AS (
        SELECT DISTINCT event_type AS canonical FROM events
        WHERE event_type IS NOT NULL
    ), drifted AS (
        SELECT DISTINCT upper(substr(event_type, 1, 1)) || substr(event_type, 2)
                   AS drifted
        FROM events WHERE event_type IS NOT NULL
        UNION
        SELECT DISTINCT upper(event_type) FROM events
        WHERE event_type IS NOT NULL
    ), scored AS (
        SELECT d.drifted, c.canonical,
               levenshtein(d.drifted, c.canonical) AS dist
        FROM drifted d CROSS JOIN canon c
    )
    SELECT drifted, canonical, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY drifted
                                     ORDER BY dist, canonical) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def fuzzy_category_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-domain drift repair (the defect class of SURVEY
    §1.3/§2.11-1: the reference's training CSV and live producer used
    DIFFERENT categorical domains and the skew silently broke serving):
    map each drifted label to its nearest canonical label by edit
    distance (``levenshtein``), with a deterministic (distance, label)
    tie-break via ``min_by``.

    Engine caveat: DuckDB's ``levenshtein`` counts BYTES while Spark's
    counts codepoints — identical only over single-byte (ASCII) label
    domains like this one.  A multibyte label domain would need the
    positional delete-variant predicate ``fuzzy_vocab_correction`` uses
    (that query publishes no raw distance, so it eliminated levenshtein
    entirely after the pathological-text sweep caught the divergence).

    Scale shape: both sides first collapse to DISTINCT labels —
    categorical domains are tiny regardless of corpus size, so the cross
    join is |domains|² on aggregated rows, never a row-level product.
    Null labels are excluded on both sides — a missing category is
    null-handling's job (P8-P10), not fuzzy matching's."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    cap = F.concat(
        F.upper(F.substring("event_type", 1, 1)),
        F.expr("substr(event_type, 2)"),
    )
    drifted = (
        e.select(cap.alias("drifted"))
        .union(e.select(F.upper("event_type").alias("drifted")))
        .distinct()
    )
    canon = e.select(F.col("event_type").alias("canonical")).distinct()
    return (
        drifted.crossJoin(canon)
        .withColumn("dist", F.levenshtein("drifted", "canonical"))
        .groupBy("drifted")
        .agg(
            F.min_by("canonical", F.struct("dist", "canonical"))
            .alias("canonical"),
            F.min("dist").alias("dist"),
        )
    )


@register(
    "bool_agg_events",
    oracle="""
    SELECT event_type,
           cast(count_if(value > 50) AS BIGINT) AS n_high,
           bool_or(value > 99)  AS any_extreme,
           bool_and(value >= 0) AS all_nonneg,
           round(count_if(value > 50) / cast(count(*) AS DOUBLE), 6)
               AS high_share
    FROM events GROUP BY event_type
    """,
)
def bool_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family (extension): ``count_if``
    folds the predicate into the aggregate (no pre-filter subquery),
    ``bool_or``/``bool_and`` are the any/every quantifiers — all
    single-pass mergeable partials like sum, and ``bool_and`` notably
    short-circuits per partition.  The guard pattern the reference codes
    imperatively (P5's zero-class check, FD/model.py:98-100) collapses
    to one such aggregate."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.bool_or(F.col("value") > 99).alias("any_extreme"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.round(F.count_if(F.col("value") > 50) / F.count("*"), 6)
        .alias("high_share"),
    )


@register(
    "scalar_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           cast(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
           last_day(cast(o_orderdate AS DATE)) AS eom,
           cast(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           dayofweek(o_orderdate) + 1 AS dow
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-arithmetic complement of F1-F5 (the parts decomposition
    family): offset (+30 days), month-end, month-truncation, and
    day-of-week.  Cross-engine nuance the oracle encodes: Spark's
    ``dayofweek`` is 1-based Sunday-first, DuckDB's 0-based — the oracle
    shifts by one so the VALUES, not just the semantics, match."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).alias("due"),
        F.last_day("o_orderdate").alias("eom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@register(
    "kv_map_roundtrip",
    oracle="""
    SELECT event_id,
           -- a record with any null field renders a null kv line, so the
           -- whole parsed map is null (mirrored in the Spark guard)
           CASE WHEN event_type IS NULL OR value IS NULL OR user_id IS NULL
                THEN NULL ELSE event_type END AS type_rt,
           CASE WHEN event_type IS NULL OR value IS NULL OR user_id IS NULL
                THEN NULL
                ELSE cast(printf('%.2f', value) AS DOUBLE) END AS value_rt,
           CASE WHEN event_type IS NULL OR value IS NULL OR user_id IS NULL
                THEN NULL ELSE true END AS has_user,
           CASE WHEN event_type IS NULL OR value IS NULL OR user_id IS NULL
                THEN NULL ELSE 2 END AS n_other
    FROM events WHERE event_id <= 2000
    """,
)
def kv_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7's named Spark primitives (SURVEY §2.1: the `key: value` log parse
    as `str_to_map` + `transform_keys`): render a log-style kv line from
    each event, parse it back into a MapType, normalize keys, and probe it
    with element_at / map_contains_key / map_filter.  The oracle computes
    the same values straight from the raw columns, so the test is
    render→parse = identity (the same contract as currency_roundtrip).
    Entirely narrow map/array expressions — zero shuffles."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    # null-guard the render: format_string would print a null field as
    # the literal "null" (then "value: nu..." crashes the double cast);
    # a record with a missing field renders NO line, parsing to nulls
    any_null = (
        F.col("event_type").isNull()
        | F.col("value").isNull()
        | F.col("user_id").isNull()
    )
    s = F.when(any_null, F.lit(None).cast("string")).otherwise(
        F.format_string(
            "type: %s, value: %.2f, user: %d",
            F.col("event_type"), F.col("value"), F.col("user_id"),
        )
    )
    m = F.str_to_map(s, F.lit(", "), F.lit(": "))
    mk = F.transform_keys(m, lambda k, _: F.upper(k))
    return e.select(
        "event_id",
        F.element_at(mk, "TYPE").alias("type_rt"),
        F.element_at(mk, "VALUE").cast("double").alias("value_rt"),
        F.map_contains_key(mk, "USER").alias("has_user"),
        F.size(F.map_filter(mk, lambda k, _: k != F.lit("USER"))).alias("n_other"),
    )


@register(
    "wire_formats_roundtrip",
    oracle="""
    SELECT event_id,
           event_type AS csv_et,
           value      AS csv_value,
           event_type AS xml_et,
           -- the XML snippet is built with null-propagating concat, so a
           -- null event_type nulls the WHOLE snippet and therefore every
           -- field parsed from it (the CSV side has per-field nulls:
           -- to_csv renders a null field as an empty cell)
           CASE WHEN event_type IS NULL THEN NULL ELSE user_id END AS xml_user
    FROM events WHERE event_id <= 2000
    """,
)
def wire_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-format function families beyond JSON (F19's siblings): each
    event renders to a CSV line (``to_csv``) and an XML snippet, then both
    parse back with ``from_csv`` / ``from_xml`` (Spark 4 native XML) under
    explicit schemas.  The oracle reads the same values off the raw
    columns, so the check is render→parse = identity — including the
    double round trip (Java's shortest-distinguishing float rendering
    re-parses to the identical IEEE value).  All narrow expressions."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    csv_line = F.to_csv(F.struct("event_id", "event_type", "value"))
    csv = F.from_csv(
        csv_line, F.lit("event_id BIGINT, event_type STRING, value DOUBLE")
    )
    xml_snip = F.concat(
        F.lit("<e><et>"), F.col("event_type"),
        F.lit("</et><user>"), F.col("user_id"), F.lit("</user></e>"),
    )
    xml = F.from_xml(xml_snip, F.lit("et STRING, user BIGINT"))
    return e.select(
        "event_id",
        csv.getField("event_type").alias("csv_et"),
        csv.getField("value").alias("csv_value"),
        xml.getField("et").alias("xml_et"),
        xml.getField("user").alias("xml_user"),
    )


@register(
    "currency_roundtrip",
    oracle="""
    SELECT o_orderkey,
           printf('$%.2f', o_totalprice) AS rendered,
           cast(replace(printf('$%.2f', o_totalprice), '$', '') AS DOUBLE) AS parsed
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def currency_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F8+F13 (FD/evaluation.py:83-87): render '$%.2f' then strip-and-
    cast back — the evaluation module's money parser, as a round trip."""
    from ..functions.scalar import currency_format, currency_parse

    o = load_table(spark, sf_dir, "orders")
    rendered = currency_format(F.col("o_totalprice"))
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        rendered.alias("rendered"),
        currency_parse(rendered).alias("parsed"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT cast(cast(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INT) // 10 AS BIGINT) AS k_decile,
           count(*) AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 (FD/consumer.py:106): JSON field extraction from the props
    payload — the stream's from_json path in batch form."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy(
        F.floor(k / 10).cast("long").alias("k_decile")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(avg(cast(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INT)), 4) AS avg_k,
           cast(max(cast(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INT)) AS BIGINT) AS max_k,
           sum(CASE WHEN json_extract(CASE WHEN json_valid(props) THEN props END, '$.missing') IS NULL
                    THEN 1 ELSE 0 END) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (extends F19, FD/consumer.py:106):
    ``parse_json`` decodes each props payload ONCE into Spark's binary
    VARIANT encoding; every subsequent ``variant_get`` path extraction
    reads the decoded tree instead of re-parsing the JSON string — the
    100 TB answer to schemaless columns probed by many paths (the
    reference re-deserializes the whole record per field access).
    ``try_variant_get`` on an absent path yields null (the engine's
    typed mirror of the consumer's defensive ``.get(key, default)``,
    FD/consumer.py:37-38).  ``try_parse_json``, not ``parse_json``: a
    malformed payload must dead-letter to null (T6), never kill the
    job — mirrored in the oracle's ``json_valid`` guard."""
    e = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return (
        e.select("event_type", v.alias("v"))
        .select(
            "event_type",
            F.variant_get("v", "$.k", "int").alias("k"),
            F.try_variant_get("v", "$.missing", "int").alias("m"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
    )


@register(
    "customer_order_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number()   OVER w AS rn,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2) AS delta_prev,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING), 2) AS run_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full analytic-window complement (extends SURVEY.md §2.6, where the
    reference only needs top-k/argmax rewrites): row_number, ntile,
    percent_rank, lag, and a running sum per customer order history.

    All five windows share one (partition, order) spec, so Catalyst plans
    a single shuffle on o_custkey and a single sort — the frame variants
    differ only in the running-buffer logic.  The orderkey tiebreak makes
    every function deterministic (dates repeat within a customer)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2
        ).alias("delta_prev"),
        F.round(F.sum("o_totalprice").over(wr), 2).alias("run_spend"),
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (§2.5 extension complement to cube/rollup):
    status totals, priority totals, and the grand total in one pass —
    Catalyst expands the sets before a single partial-agg shuffle, vs
    three scans for the UNION ALL equivalent.  Decimal sum keeps the
    totals accumulation-order-independent."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("decimal(18,2)").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
                   * cast(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
               AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + aggregate, zero shuffles beyond the
    final single-group reduce.  All four predicates push to the parquet
    scan (row-group pruning via min/max stats on l_shipdate/l_discount/
    l_quantity) and only 4 of 11 columns are read — the plan's
    ``PushedFilters``/``ReadSchema`` are pinned in test_plan_quality.
    Decimal multiply-sum keeps the revenue order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ).cast("decimal(18,4)").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * cast(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN cast(l_extendedprice AS DECIMAL(18,2))
                          * cast(1 - l_discount AS DECIMAL(18,2))
                     ELSE cast(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
                          * cast(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE),
                6) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: promotion revenue share for one ship month.

    Fact-dim join with the dimension (part) broadcast — the lineitem scan
    keeps its partitioning, no shuffle at all; the month predicate prunes
    row groups at the scan.  Both sums run in DECIMAL (exact,
    order-independent); only the final ratio drops to double, rounded on
    both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), net).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(net).cast("double"),
                6,
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "unpivot_order_stats",
    oracle="""
    WITH wide AS (
        SELECT o_orderstatus AS status,
               cast(count(*) AS DOUBLE)                     AS n_orders,
               round(sum(o_totalprice), 2)                  AS total_price,
               round(avg(o_totalprice), 4)                  AS avg_price
        FROM orders GROUP BY o_orderstatus
    )
    SELECT status, metric, value
    FROM wide UNPIVOT (value FOR metric IN (n_orders, total_price, avg_price))
    """,
)
def unpivot_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (§2.5 extension complement, inverse of pivot): wide
    per-status aggregates reshaped to (status, metric, value) long form —
    one agg shuffle, then a narrow generate (no extra shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
    return wide.unpivot(
        ids=["status"],
        values=["n_orders", "total_price", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog, expressed through the engine's SQL surface: the
    EXISTS correlated subquery (orders with a lineitem shipped >90 days
    after order date).  Catalyst rewrites EXISTS to a LEFT SEMI join on
    l_orderkey — same plan the DataFrame semi-join entry produces; the
    date predicates push to both scans.  Registered temp views make
    every testdata table addressable from ``spark.sql``."""
    from ..sources.tables import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    _lt(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders_v o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """)


@register(
    "corpus_upsert_refresh",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, lang, source, n_chars,
               1 AS version, FALSE AS deleted, 0 AS _src
        FROM documents
    ), upd AS (
        SELECT doc_id,
               'v2 ' || text AS text, lang, source,
               n_chars + 3 AS n_chars,
               2 AS version,
               (doc_id % 17 = 0) AS deleted, 1 AS _src
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1000000, text, lang, 'recrawl', n_chars,
               2, FALSE, 1
        FROM documents WHERE doc_id % 50 = 0
    ), merged AS (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY version DESC, _src DESC) AS _rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)
    )
    SELECT doc_id, lang, source, version, n_chars
    FROM merged WHERE _rn = 1 AND NOT deleted
    """,
)
def corpus_upsert_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins MERGE (extension; the reference only ever appends —
    FD/producer.py:96-115): a re-crawl batch updates every 5th document
    (higher version wins), tombstones every 85th (doc_id % 5 and % 17),
    and inserts brand-new ids — one ``merge_latest`` call, one shuffle
    on doc_id, no join.  The refresh pattern an incrementally-maintained
    training corpus runs on every crawl cycle."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.withColumn("version", F.lit(1))
    upd = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("text", F.concat(F.lit("v2 "), F.col("text")))
        .withColumn("n_chars", F.col("n_chars") + 3)
        .withColumn("version", F.lit(2))
        .withColumn("deleted", F.col("doc_id") % 17 == 0)
    )
    ins = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("source", F.lit("recrawl"))
        .withColumn("version", F.lit(2))
        .withColumn("deleted", F.lit(False))
    )
    merged = R.merge_latest(
        base, upd.unionByName(ins), ["doc_id"], "version", delete_col="deleted"
    )
    return merged.select("doc_id", "lang", "source", "version", "n_chars")


@register(
    "null_safe_join_status",
    oracle="""
    WITH l AS (
        SELECT o_orderpriority,
               nullif(o_orderstatus, 'O') AS k,
               count(*) AS n_l
        FROM orders GROUP BY 1, 2
    ), r AS (
        SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_r
        FROM orders GROUP BY 1
    )
    SELECT l.o_orderpriority, l.k, l.n_l, r.n_r
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def null_safe_join_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    NULL-keyed group — here 'O' rows nulled via ``nullif`` — must MATCH
    across sides instead of silently vanishing the way a plain equi-join
    drops NULL keys.  The standard trap in dimension joins where the
    key is legitimately absent.

    Catalyst plans ``eqNullSafe`` as a hash-join key (internally a
    coalesce-to-sentinel struct), so this stays a real equi-join — no
    nested-loop fallback — and both grouped sides reduce before joining.
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    left = o.groupBy("o_orderpriority", k.alias("k")).agg(F.count("*").alias("n_l"))
    right = o.groupBy(k.alias("k")).agg(F.count("*").alias("n_r"))
    return (
        left.alias("l")
        .join(right.alias("r"), F.col("l.k").eqNullSafe(F.col("r.k")))
        .select("l.o_orderpriority", "l.k", "l.n_l", "r.n_r")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "user_event_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*)                                  AS total
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
    """,
)
def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: the per-user event-type count matrix (long → wide), the
    feature-table shape every per-entity model consumes.

    ``pivot`` is called WITH the explicit value list — without it Spark
    runs an eager distinct-collect job over the pivot column before it
    can even resolve the schema (a full extra scan, and a failure mode
    when the column has unbounded cardinality).  With the list, the
    pivot compiles to one hash aggregate with a conditional-count
    expression per value — exactly the manual FILTER formulation the
    oracle states, one shuffle, map-side partials.  Missing cells are
    0, not null (count semantics on both engines).
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside pivot
    )
    totals = e.groupBy("user_id").agg(F.count("*").alias("total"))
    out = wide.join(totals, "user_id")
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
        "total",
    )


@register(
    "priority_metrics_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(count(*) AS DOUBLE)       AS n_orders,
               round(sum(o_totalprice), 2)    AS revenue,
               round(avg(o_totalprice), 2)    AS avg_value
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, metric, value FROM (
        SELECT o_orderpriority, 'n_orders'  AS metric, n_orders  AS value FROM wide
        UNION ALL
        SELECT o_orderpriority, 'revenue',  revenue   FROM wide
        UNION ALL
        SELECT o_orderpriority, 'avg_value', avg_value FROM wide
    )
    """,
)
def priority_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/MELT: per-priority KPI columns flipped to tidy
    (priority, metric, value) rows — the wide→long inverse of the pivot
    above and the shape every generic metrics sink/dashboard ingests.

    ``DataFrame.unpivot`` compiles to an Expand node: each input row is
    replicated once per value column INSIDE the stage — no shuffle, no
    union-of-scans (the oracle's UNION ALL formulation would rescan the
    aggregate 3×; Expand reads it once).  The upstream is one grouped
    aggregate over 5 groups, so the whole query is one exchange.
    Values are cast to a common DOUBLE before melting, as unpivot
    requires a single value type.
    """
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("double").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_value"),
        )
    )
    return wide.unpivot(
        ["o_orderpriority"], ["n_orders", "revenue", "avg_value"],
        "metric", "value",
    )


@register(
    "revenue_time_rollup",
    oracle="""
    SELECT year(o_orderdate)                          AS yr,
           quarter(o_orderdate)                       AS qtr,
           CASE WHEN year(o_orderdate) IS NULL THEN 2
                WHEN quarter(o_orderdate) IS NULL THEN 1
                ELSE 0 END                            AS lvl,
           count(*)                                   AS n_orders,
           round(sum(o_totalprice), 2)                AS revenue
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
    """,
)
def revenue_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy ROLLUP: revenue at quarter, year, and grand-total
    granularity in ONE aggregate — the continuous-aggregate /
    hypertable-rollup shape (coarser grains derive from finer ones
    inside the same Expand, no re-scan per level, complementing the
    full-lattice ``cube_status_priority``).

    Spark compiles rollup to Expand(3 projections) + one hash
    aggregate: a single shuffle whose key count is Σ levels, with
    map-side partials — at 100 TB this beats three separate
    aggregations by reading the fact table once.  The level indicator
    is derived from the rolled-up NULLs with an identical CASE on both
    engines (calendar fields are never natively null here, so NULL
    unambiguously marks aggregation level).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        "o_totalprice",
    )
    lvl = (
        F.when(F.col("yr").isNull(), 2)
        .when(F.col("qtr").isNull(), 1)
        .otherwise(0)
    )
    return (
        o.rollup("yr", "qtr")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select("yr", "qtr", lvl.alias("lvl"), "n_orders", "revenue")
    )
