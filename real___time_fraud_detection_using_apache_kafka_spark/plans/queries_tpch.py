"""TPC-H analog batch 2: Q7-Q10, Q13, Q15, Q17-Q19, Q22 adapted to the
driver testdata's reduced schemas (no partsupp / shipmode / phone columns;
nations are NATION_0..24, part types ECONOMY..STANDARD).

These widen the relational surface beyond the batch-1 queries
(q1/q3/q4/q5/q6/q14 in ``queries_relational``) with the operator shapes the
reference's normalized-schema complement still lacked (SURVEY.md §2.4/§2.5
extension surface): multi-dim volume joins (Q7-Q9), outer-join
count-distribution (Q13), scalar-subquery selection against a derived
aggregate (Q15, Q22), correlated per-group threshold (Q17), IN + HAVING
group filter (Q18), and disjunctive join predicates (Q19).

Scale posture: every dimension side is filtered *before* joining and
broadcast explicitly; the only shuffles left are fact-fact joins keyed on
orderkey/partkey and the final aggregations.  At 100 TB the filtered
customer side of Q7/Q10 would exceed broadcast size — those joins degrade
gracefully to shuffle joins when AQE sees the real sizes (the hint is on
the genuinely-small sides only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders   o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation  cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
        OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bilateral trade volume between two nations by year.

    Supplier and customer are each pre-joined to nation and filtered to the
    two nations of interest BEFORE touching the facts, so the fact side
    only broadcast-probes two tiny hash relations; the pair-direction
    disjunction runs after both nation names are attached.  lineitem->
    orders is the lone shuffle join.
    """
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS nation
      FROM lineitem l
      JOIN part     p ON p.p_partkey   = l.l_partkey
      JOIN supplier s ON s.s_suppkey   = l.l_suppkey
      JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
      JOIN orders   o ON o.o_orderkey  = l.l_orderkey
      JOIN customer c ON c.c_custkey   = o.o_custkey
      JOIN nation  cn ON cn.n_nationkey = c.c_nationkey
      JOIN region   r ON r.r_regionkey = cn.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) t
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: NATION_3's share of PROMO-part volume sold into
    ASIA, by order year.

    part(PROMO) prunes lineitem first (broadcast); customers are
    pre-reduced to the ASIA region through nation->region broadcasts; the
    supplier nation rides along to feed the conditional numerator.  The
    share division happens once per year group, after a single aggregation.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    asia_nat = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
           -- DECIMAL accumulation: 2dp x 2dp terms are exact at 4dp, so
           -- the sum is order-independent (the raw double sum flipped a
           -- 2-dp round at a x.xx5 boundary in the one_in=3 nulled sweep)
           round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
               AS profit
    FROM lineitem l
    JOIN part     p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders   o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (no partsupp/supplycost in the testdata, so profit =
    discounted revenue): per supplier-nation, per order-year, over parts
    whose name contains 'red'.

    The LIKE filter reduces part to ~13% before the broadcast; supplier and
    its nation fold into one 100-row broadcast; lineitem->orders stays the
    single shuffle join.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            # DECIMAL accumulation (see oracle comment): exact 4dp terms
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            ).alias("profit")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders   o ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation   n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY custkey, name, acctbal, nation
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by lost revenue on returned
    lineitems in a quarter.

    Both fact filters (quarter on orders, returnflag on lineitem) push to
    the scans; the orderkey join shuffles only the filtered facts; customer
    and nation attach afterwards at agg-output cardinality (<=customers),
    and the final top-20 is TakeOrderedAndProject, never a full sort.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # Exact decimal accumulation: the 2-dp rounded revenue must not depend
    # on float summation order (a .xx5-boundary sum flips the last digit
    # between engines otherwise).
    dec_rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum(dec_rev), 2).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: distribution of per-customer order counts,
    customers with zero qualifying orders included via the outer join
    (priority filter stands in for the reference schema's comment filter).

    The orders side is pre-aggregated to (custkey, count) BEFORE the outer
    join, so the join carries one row per customer per side instead of one
    per order — at 100 TB that collapses the shuffle by the average order
    fan-out (~4x here, much more in practice).
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        c.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: supplier(s) achieving the maximum quarterly
    revenue — a scalar subquery over a derived aggregate.

    The revenue aggregate is computed once and reused for both the scalar
    max and the equality filter (Spark caches nothing here, but the
    broadcast of the 1-row max means no second scan of lineitem: the max
    side aggregates the already-aggregated 100-row revenue table).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .select("suppkey", F.col("s_name").alias("name"), "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: revenue from abnormally-small-quantity orders of
    one brand — a correlated per-part average threshold.

    Decorrelated Spark-first: the brand filter broadcasts into lineitem
    FIRST, the per-part average is computed only over that reduced fact
    slice (the correlation is only ever evaluated at those partkeys), and
    the threshold joins back on partkey at aggregate cardinality.  The
    naive plan — per-part avg over ALL of lineitem — would shuffle the
    full fact table at 100 TB for a 3.6% slice.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate, round(o.o_totalprice, 2) AS totalprice,
           round(t.total_qty, 2) AS total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) t ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: customers who placed orders totalling >300 units
    (IN + HAVING group filter in the spec, expressed as an aggregate join).

    The HAVING aggregate reduces lineitem to a handful of hot orderkeys;
    joining that small result INTO orders (broadcast) replaces the spec's
    IN-subquery with zero extra shuffles, and carries total_qty along so no
    re-aggregation of lineitem is needed.
    """
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("total_qty"), 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#18' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: revenue under three OR'd brand/size/quantity
    clauses spanning both join sides.

    The part side is pre-filtered with the union of the part-only
    conjuncts (brand+size) so the broadcast build stays small, while the
    full disjunction — which references lineitem.l_quantity and so cannot
    move into either scan alone — evaluates on the joined rows.  Catalyst
    additionally pushes the derivable l_quantity range [1,30] to the
    lineitem scan.
    """
    part_pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#18") & F.col("p_size").between(1, 35))
    )
    p = load_table(spark, sf_dir, "part").filter(part_pred).select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem")
    full_pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#18") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(full_pred)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT cntrycode, count(*) AS numcust, round(sum(acctbal), 2) AS totacctbal
    FROM (
      SELECT c.c_custkey % 10 AS cntrycode, c.c_acctbal AS acctbal
      FROM customer c
      WHERE c.c_custkey % 10 IN (1, 3, 5, 7, 9)
        AND c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer c2
          WHERE c2.c_acctbal > 0 AND c2.c_custkey % 10 IN (1, 3, 5, 7, 9)
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
        )
    ) t
    GROUP BY cntrycode
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: well-funded customers with no RECENT orders
    (dormant since 2000), grouped by a synthetic country code (custkey
    mod 10 — the testdata has no phone column).  Combines a scalar AVG
    subquery, NOT EXISTS (left-anti join), and a final rollup by code.

    The scalar average broadcasts as a 1-row cross join (never collected
    to the driver); the anti join is the only shuffle against orders, and
    it only carries the ~half of customers that survive the balance gate.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 10).isin(1, 3, 5, 7, 9)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(
            (F.col("c_custkey") % 10).alias("cntrycode"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "supplier_revenue_windows",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    )
    SELECT nationkey, suppkey, revenue,
           dense_rank() OVER w AS rnk,
           round(cume_dist() OVER (PARTITION BY nationkey ORDER BY revenue), 6)
               AS cume_frac,
           round(first_value(revenue) OVER w - revenue, 2) AS gap_to_top,
           round(avg(revenue) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
               AS ma3
    FROM rev
    WINDOW w AS (PARTITION BY nationkey ORDER BY revenue DESC, suppkey ASC)
    """,
)
def supplier_revenue_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window complement (SURVEY.md §2.6 extension): dense_rank,
    cume_dist, first_value gap, and a 3-row moving average over supplier
    revenue, PARTITIONED BY NATION — every window shares one
    (nationkey, revenue desc) sort, so Catalyst plans a single Exchange +
    Sort for all four functions.  Partitioning by nation is the
    scale-honest choice: a global ORDER BY window would serialize 100 TB
    through one task; per-nation windows parallelize across the key.
    Ties break on suppkey so ranks and frames are deterministic.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("nationkey").orderBy(F.desc("revenue"), F.asc("suppkey"))
    w_asc = Window.partitionBy("nationkey").orderBy(F.asc("revenue"))
    return rev.select(
        "nationkey",
        "suppkey",
        "revenue",
        F.dense_rank().over(w).alias("rnk"),
        F.round(F.cume_dist().over(w_asc), 6).alias("cume_frac"),
        F.round(F.first("revenue").over(w) - F.col("revenue"), 2).alias("gap_to_top"),
        F.round(F.avg("revenue").over(w.rowsBetween(-2, 0)), 2).alias("ma3"),
    )
