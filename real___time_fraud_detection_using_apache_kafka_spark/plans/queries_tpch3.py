"""TPC-H analog batch 3: Q2, Q11, Q12, Q16, Q20, Q21 — completing the
full 22-query analog suite over the driver testdata's reduced schemas.

The testdata has no ``partsupp`` table, so the four queries that need one
(Q2/Q11/Q16/Q20) derive the part-supplier relation from ``lineitem``:
``GROUP BY (l_partkey, l_suppkey)`` with ``min(l_extendedprice /
l_quantity)`` standing in for ``ps_supplycost`` and ``sum(l_quantity)``
for ``ps_availqty``.  That derivation is itself the scale-interesting
part: at 100 TB it is one partkey-keyed shuffle producing a relation
~1000x smaller than the fact, and every query here prunes lineitem with
broadcast dimension filters BEFORE paying for it.  Q12 has no
``l_shipmode``/``l_receiptdate`` columns, so its lateness class derives
from ``datediff(l_shipdate, o_orderdate)`` — preserving the
CASE-sum-over-a-fact-fact-join shape.  Q21's EXISTS / NOT-EXISTS double
self-correlation is re-expressed as a single per-order aggregate
(distinct suppliers vs distinct late suppliers), which turns two
correlated self-joins into one reusable orderkey partitioning.

Operator shapes covered (SURVEY.md §2.4/§2.5 extension surface):
correlated per-group MIN selection (Q2), scalar-subquery fraction-of-
total filter (Q11), conditional CASE-sum pivot (Q12), NOT-IN anti-join
under a distinct-count aggregate (Q16), nested IN-chains as semi-join
reductions (Q20), and anti-correlated existence counting (Q21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# DuckDB CTE for the derived part-supplier relation (lineitem stand-in
# for the missing partsupp table); mirrored by _derived_psupp below.
_PSUPP_CTE = """
    psupp AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS supplycost,
             sum(l_quantity) AS availqty
      FROM lineitem
      WHERE l_quantity > 0
      GROUP BY 1, 2
    )
"""


def _derived_psupp(li: DataFrame) -> DataFrame:
    """lineitem -> (partkey, suppkey, supplycost, availqty).

    ``min`` and IEEE division are order-insensitive and quantities are
    integral, so every column is bit-stable across engines — safe to
    equality-join and threshold-compare against the DuckDB oracle.
    Filter lineitem BEFORE calling this: the groupBy is the dominant
    shuffle and prunes with its input.

    A line with zero (or NULL) quantity has no unit cost — the guard is
    a semantic requirement, not defensive noise: under ANSI mode the
    unguarded division is a job-killing DIVIDE_BY_ZERO on dirty data
    (the tie-injection sweep crashed exactly there).
    """
    return li.filter(F.col("l_quantity") > 0).groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"),
        F.sum("l_quantity").alias("availqty"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PSUPP_CTE},
    asia_supp AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    cand AS (
      SELECT p.p_partkey, p.p_name, a.s_name, a.s_acctbal, a.n_name,
             ps.supplycost,
             min(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS best_cost
      FROM psupp ps
      JOIN part p ON p.p_partkey = ps.partkey
      JOIN asia_supp a ON a.s_suppkey = ps.suppkey
      WHERE p.p_size <= 15 AND p.p_type = 'PROMO'
    )
    SELECT p_partkey AS partkey, p_name AS part_name, s_name AS supp_name,
           n_name AS nation, round(s_acctbal, 2) AS acctbal,
           -- floor-based half-up: supplycost is a derived rational
           -- (price/qty), and engine round() disagrees on doubles whose
           -- shortest repr sits on the x.xxx5 boundary (DuckDB rounds
           -- the repr, Spark the binary value); floor(x*1e4 + 0.5)/1e4
           -- is pure shared-IEEE arithmetic on the identical double
           floor(supplycost * 10000 + 0.5) / 10000.0 AS min_cost
    FROM cand WHERE supplycost = best_cost
    ORDER BY acctbal DESC, supp_name ASC, partkey ASC LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: for each small PROMO part, the ASIA supplier
    offering the minimum derived supply cost (correlated-MIN selection).

    Scale shape: part (p_size<=15 AND p_type='PROMO', ~0.5% of parts)
    and the ASIA supplier->nation->region chain are both broadcast into
    the lineitem scan, so the psupp aggregation only ever sees the
    pruned fact slice.  The correlated ``cost = min(cost) OVER part``
    subquery is a window over the partkey partitioning the aggregate
    just produced — no second shuffle of the full relation — and the
    final top-100 is a TakeOrderedAndProject with a unique
    (acctbal, supp_name, partkey) sort key, not a global sort.
    """
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(reg.join(nat, F.col("r_regionkey") == F.col("n_regionkey"))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    cand = (
        _derived_psupp(li)
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(asia_supp), F.col("suppkey") == F.col("s_suppkey"))
        .withColumn(
            "best_cost", F.min("supplycost").over(Window.partitionBy("partkey"))
        )
    )
    return (
        cand.filter(F.col("supplycost") == F.col("best_cost"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.round("s_acctbal", 2).alias("acctbal"),
            # floor-based half-up (see oracle comment): shared-IEEE
            # rounding of the derived rational, repr-independent
            (F.floor(F.col("supplycost") * 10000 + 0.5) / 10000.0).alias(
                "min_cost"
            ),
        )
        .orderBy(F.desc("acctbal"), F.asc("supp_name"), F.asc("partkey"))
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH {_PSUPP_CTE},
    val AS (
      -- micro-unit quantization: supplycost is a derived RATIONAL
      -- double (price/qty), so summing the raw products is
      -- order-dependent; each term quantizes to integer micro-units
      -- via shared-IEEE floor, then the sums and the 0.1% threshold
      -- comparison are exact integer arithmetic
      SELECT ps.partkey,
             sum(CAST(floor(ps.supplycost * ps.availqty * 1000000 + 0.5)
                      AS BIGINT)) AS value_micros
      FROM psupp ps
      JOIN supplier s ON s.s_suppkey = ps.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_regionkey = 2
      GROUP BY ps.partkey
    )
    SELECT partkey,
           ((CAST(value_micros AS BIGINT) + 5000) // 10000) / 100.0
               AS part_value
    FROM val
    WHERE 1000 * value_micros > (SELECT sum(value_micros) FROM val)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose ASIA-supplied inventory value
    exceeds 0.1% of the region's total (scalar-subquery fraction filter).

    The per-part value relation is computed ONCE and consumed twice
    (per-part rows + grand total) — Spark caches nothing here because
    the second consumer is a single-row broadcast: the grand total is a
    global agg of the tiny post-groupBy relation, then cross-joined back
    as a literal-like broadcast row.  At 100 TB the only big shuffle is
    the psupp derivation, already pruned to ASIA suppliers (broadcast
    before the groupBy).
    """
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    # micro-unit quantization (see oracle comment): exact integer sums,
    # exact threshold compare; DECIMAL(38,0) accumulator so the grand
    # total cannot overflow a long at extreme scale
    term = F.floor(
        F.col("supplycost") * F.col("availqty") * 1000000 + F.lit(0.5)
    ).cast("decimal(38,0)")
    val = _derived_psupp(li).groupBy("partkey").agg(
        F.sum(term).alias("value_micros")
    )
    total = val.agg(F.sum("value_micros").alias("total_micros"))
    return (
        val.join(F.broadcast(total))
        .filter(1000 * F.col("value_micros") > F.col("total_micros"))
        .select(
            "partkey",
            F.expr(
                "((CAST(value_micros AS BIGINT) + 5000) DIV 10000) / 100.0"
            ).alias("part_value"),
        )
    )


@register(
    "q12_shipping_lateness",
    oracle="""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 90
                THEN 'ON_TIME' ELSE 'LATE' END AS ship_bucket,
           year(o.o_orderdate) AS order_year,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY ship_bucket, order_year
    """,
)
def q12_shipping_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: priority mix by shipping-lateness class.

    The testdata carries no ``l_shipmode``/``l_receiptdate`` (SURVEY.md
    batch-2 header), so the class derives from ship delay vs order date
    — same CASE-sum-over-fact-fact-join shape as the original.  Scale:
    the orderkey join is the one shuffle; the conditional sums are
    map-side partial aggregates over four result groups per year, so the
    final exchange carries only group cells.  Both join inputs project
    to 2-3 columns before the exchange (check ReadSchema in the plan).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # NOT-IN three-valued logic: a NULL priority is in NEITHER bucket
    # (matches the oracle's `NOT IN` CASE, which yields NULL -> ELSE 0);
    # a bare `1 - is_high` would silently count unknowns as low
    low = F.when(F.col("o_orderpriority").isNotNull() & ~high, 1).otherwise(0)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 90,
                F.lit("ON_TIME"),
            ).otherwise(F.lit("LATE")).alias("ship_bucket"),
            F.year("o_orderdate").alias("order_year"),
            F.when(high, 1).otherwise(0).alias("is_high"),
            low.alias("is_low"),
        )
        .groupBy("ship_bucket", "order_year")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum("is_low").alias("low_line_count"),
        )
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    )
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           count(DISTINCT pr.suppkey) AS supplier_cnt
    FROM pairs pr JOIN part p ON p.p_partkey = pr.partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND pr.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY brand, ptype, psize
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct supplier counts per (brand, type, size),
    excluding blacklisted suppliers (NOT IN -> broadcast anti-join).

    The original's "customer complaints" supplier exclusion becomes the
    negative-balance supplier set — a tiny relation, broadcast as an
    anti-join BEFORE the distinct, so excluded suppliers never enter the
    shuffle.  Part predicates (brand/type/size-IN) are all pushed to the
    part scan and the filtered part is broadcast into the pair relation,
    pruning lineitem's distinct-pairs shuffle to the 8 selected sizes.
    count(DISTINCT) plans as the standard two-phase expand aggregate.
    """
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .select("l_suppkey", "p_brand", "p_type", "p_size")
    )
    return pairs.groupBy(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
    ).agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))


@register(
    "q20_promotion_suppliers",
    oracle=f"""
    WITH {_PSUPP_CTE},
    shipped AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             sum(l_quantity) AS qty_1997
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT s.s_name AS supp_name, round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 0
      AND s.s_suppkey IN (
        SELECT ps.suppkey FROM psupp ps
        JOIN shipped sh ON sh.partkey = ps.partkey AND sh.suppkey = ps.suppkey
        WHERE ps.partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps.availqty > 2 * sh.qty_1997)
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: AFRICA suppliers holding excess stock of red
    parts relative to their 1997 shipments (nested IN-chain).

    Both IN subqueries become semi-join reductions: the red-part set
    prunes lineitem via broadcast BEFORE the two aggregations, and the
    qualifying-supplier set (at most |supplier| rows) broadcasts into
    the supplier scan as a left-semi.  availqty aggregates all-time
    quantity while qty_1997 aggregates the window slice, so the
    ``availqty > 2 x qty_1997`` surplus test compares two integral sums
    — bit-stable across engines.  The two aggregates share the same
    (partkey, suppkey) grouping; AQE reuses the partitioning for their
    equi-join, leaving ONE fact shuffle in the whole plan.
    """
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(red), F.col("l_partkey") == F.col("p_partkey")
    )
    ps = _derived_psupp(li).drop("supplycost")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.sum("l_quantity").alias("qty_1997"))
    )
    qualifying = (
        ps.join(shipped, ["partkey", "suppkey"])
        .filter(F.col("availqty") > 2 * F.col("qty_1997"))
        .select("suppkey")
        .distinct()
    )
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .select(
            F.col("s_name").alias("supp_name"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey AS orderkey, l.l_suppkey AS suppkey,
             CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 180
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT orderkey, count(DISTINCT suppkey) AS n_supps,
             count(DISTINCT CASE WHEN is_late = 1 THEN suppkey END) AS n_late
      FROM late GROUP BY orderkey
    )
    SELECT s.s_name AS supp_name, count(*) AS numwait
    FROM (SELECT DISTINCT orderkey, suppkey FROM late WHERE is_late = 1) ll
    JOIN per_order po ON po.orderkey = ll.orderkey
    JOIN supplier s ON s.s_suppkey = ll.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE po.n_supps >= 2 AND po.n_late = 1 AND n.n_regionkey = 3
    GROUP BY supp_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: EUROPE suppliers who were the SOLE late shipper
    on a finished multi-supplier order.

    The original's EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier) double self-correlation collapses into one
    per-order aggregate — distinct suppliers vs distinct late suppliers
    — then a filter ``n_supps >= 2 AND n_late = 1``.  That turns two
    correlated lineitem self-joins into a single reusable orderkey
    partitioning: fact-fact join on orderkey, groupBy orderkey, and the
    late-rows-to-verdict join are all co-partitioned, so AQE plans ONE
    exchange of lineitem for the entire query.  Supplier/nation attach
    by broadcast at the end, after the data is already supplier-grained.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_suppkey").alias("suppkey"),
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 180
            ).cast("int").alias("is_late"),
        )
    )
    per_order = late.groupBy("orderkey").agg(
        F.count_distinct("suppkey").alias("n_supps"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("suppkey"))
        ).alias("n_late"),
    )
    sole_late = (
        late.filter(F.col("is_late") == 1)
        .select("orderkey", "suppkey")
        .distinct()
        .join(per_order, "orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_late") == 1))
    )
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count("*").alias("numwait"))
    )
