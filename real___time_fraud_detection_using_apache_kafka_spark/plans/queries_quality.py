"""Data-quality audit catalog: constraint suites and column profiling
(the Deequ/SUMMARIZE surface a training-data pipeline runs before
trusting a 100 TB drop — extension family next to the reference's
schema-mismatch dead-lettering, FD/consumer.py:117-121).

Both queries follow the one-scan rule: every per-column statistic folds
into a single hash-aggregate pass over the table (plus one broadcast
anti-join for referential integrity), then pivots to one row per
constraint/column with ``stack`` — the report shape is rows, but the
work is a handful of mergeable aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "dq_constraint_report",
    oracle="""
    WITH a AS (
        SELECT count(*) AS n,
               count(DISTINCT o_orderkey) AS dk,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
               sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                        THEN 1 ELSE 0 END) AS neg_price,
               sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) AS bad_status,
               sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                          OR o_orderdate >= TIMESTAMP '2031-01-01'
                        THEN 1 ELSE 0 END) AS bad_date
        FROM orders
    ), fk AS (
        SELECT count(*) AS fk_viol
        FROM orders o
        WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    )
    SELECT c.constraint_name,
           round(c.metric, 6) AS metric,
           c.violations,
           CASE WHEN c.violations = 0 THEN 1 ELSE 0 END AS passed
    FROM a, fk, LATERAL (VALUES
        ('row_count_nonzero', CAST(a.n AS DOUBLE),
         CASE WHEN a.n = 0 THEN 1 ELSE 0 END),
        ('o_orderkey_unique', CAST(a.dk AS DOUBLE) / nullif(a.n, 0), a.n - a.dk),
        ('o_custkey_complete', 1.0 - CAST(a.null_cust AS DOUBLE) / nullif(a.n, 0),
         a.null_cust),
        ('o_totalprice_nonnegative', 1.0 - CAST(a.neg_price AS DOUBLE) / nullif(a.n, 0),
         a.neg_price),
        ('o_orderstatus_in_domain', 1.0 - CAST(a.bad_status AS DOUBLE) / nullif(a.n, 0),
         a.bad_status),
        ('o_orderdate_in_range', 1.0 - CAST(a.bad_date AS DOUBLE) / nullif(a.n, 0),
         a.bad_date),
        ('fk_orders_customer', 1.0 - CAST(fk.fk_viol AS DOUBLE) / nullif(a.n, 0),
         fk.fk_viol)
    ) AS c(constraint_name, metric, violations)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite over orders: row count, key
    uniqueness, completeness, non-negativity, categorical domain, date
    range, and orders→customer referential integrity — one report row
    per constraint with a compliance metric and a violation count.

    ONE hash-aggregate scan computes six constraints' cells; the FK
    check is a broadcast left-anti count against the (small) customer
    key set — at 100 TB the fact side never shuffles.  The row-per-
    constraint shape comes from ``stack`` over the single agg row.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    a = o.agg(
        F.count("*").alias("n"),
        F.count_distinct("o_orderkey").alias("dk"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_cust"
        ),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") < 0), 1
            ).otherwise(0)
        ).alias("neg_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2031-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
    )
    fk = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("fk_viol"))
    )
    cells = a.crossJoin(F.broadcast(fk))
    stacked = cells.select(
        F.expr(
            """stack(7,
            'row_count_nonzero', CAST(n AS DOUBLE),
                CASE WHEN n = 0 THEN 1L ELSE 0L END,
            'o_orderkey_unique', CAST(dk AS DOUBLE) / nullif(n, 0), n - dk,
            'o_custkey_complete', 1.0d - CAST(null_cust AS DOUBLE) / nullif(n, 0),
                null_cust,
            'o_totalprice_nonnegative', 1.0d - CAST(neg_price AS DOUBLE) / nullif(n, 0),
                neg_price,
            'o_orderstatus_in_domain', 1.0d - CAST(bad_status AS DOUBLE) / nullif(n, 0),
                bad_status,
            'o_orderdate_in_range', 1.0d - CAST(bad_date AS DOUBLE) / nullif(n, 0),
                bad_date,
            'fk_orders_customer', 1.0d - CAST(fk_viol AS DOUBLE) / nullif(n, 0), fk_viol
            ) AS (constraint_name, metric, violations)"""
        )
    )
    return stacked.select(
        "constraint_name",
        F.round("metric", 6).alias("metric"),
        F.col("violations").cast("bigint").alias("violations"),
        F.when(F.col("violations") == 0, 1).otherwise(0).alias("passed"),
    )


@register(
    "profile_orders_columns",
    oracle="""
    WITH a AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nul_k,
               count(DISTINCT o_orderkey) AS dis_k,
               CAST(min(o_orderkey) AS VARCHAR) AS min_k,
               CAST(max(o_orderkey) AS VARCHAR) AS max_k,
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nul_s,
               count(DISTINCT o_orderstatus) AS dis_s,
               CAST(min(o_orderstatus) AS VARCHAR) AS min_s,
               CAST(max(o_orderstatus) AS VARCHAR) AS max_s,
               sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nul_p,
               count(DISTINCT o_totalprice) AS dis_p,
               CAST(round(min(o_totalprice), 2) AS VARCHAR) AS min_p,
               CAST(round(max(o_totalprice), 2) AS VARCHAR) AS max_p,
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                   AS nul_pr,
               count(DISTINCT o_orderpriority) AS dis_pr,
               CAST(min(o_orderpriority) AS VARCHAR) AS min_pr,
               CAST(max(o_orderpriority) AS VARCHAR) AS max_pr
        FROM orders
    )
    SELECT c.column_name, a.n AS n_rows, c.n_null, c.n_distinct,
           c.min_value, c.max_value
    FROM a, LATERAL (VALUES
        ('o_orderkey', a.nul_k, a.dis_k, a.min_k, a.max_k),
        ('o_orderstatus', a.nul_s, a.dis_s, a.min_s, a.max_s),
        ('o_totalprice', a.nul_p, a.dis_p, a.min_p, a.max_p),
        ('o_orderpriority', a.nul_pr, a.dis_pr, a.min_pr, a.max_pr)
    ) AS c(column_name, n_null, n_distinct, min_value, max_value)
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUMMARIZE-style column profile: per-column null count, distinct
    cardinality, min/max (stringified so heterogeneous column types share
    one report schema) — the table census run before schema decisions.

    r11 plan (guide §1.2, §2.3): ONE aggregate with 4 exact
    ``count_distinct`` columns forces Catalyst's multi-distinct rewrite
    — an Expand that multiplies every row ×5 before a two-phase
    aggregate over the union of all four value domains (measured
    1.86 s at sf0.1 vs 0.41 s for independent single-distinct scans).
    Instead each column gets its OWN single-distinct aggregate (no
    Expand, and the parquet scan prunes to exactly that column) and
    the four 1-row results are unioned.  At 100 TB the gap widens:
    the expand plan scans all profiled columns ×(k+1) through one
    shuffle, the per-column plans each read one column chunk.  Exact
    distinct counts swap for ``approx_count_distinct`` with no plan
    change (noted in SCALE.md).

    r12 (VERDICT r11 item 7): the shared row count no longer gets its
    OWN scan + broadcast crossJoin — ``count(*)`` rides inside every
    per-column aggregate (the single-distinct rewrite keeps the plan
    Expand-free with mixed distinct/non-distinct aggregates), so the
    plan is exactly 4 pruned single-column scans.  Same values: each
    branch counts the same table.
    """
    o = load_table(spark, sf_dir, "orders")
    per_col = []
    for col, mn in [
        ("o_orderkey", None),
        ("o_orderstatus", None),
        ("o_totalprice", 2),
        ("o_orderpriority", None),
    ]:
        per_col.append(
            o.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(
                    "n_null"
                ),
                F.count_distinct(F.col(col)).alias("n_distinct"),
                (F.round(F.min(col), mn) if mn else F.min(col))
                .cast("string")
                .alias("min_value"),
                (F.round(F.max(col), mn) if mn else F.max(col))
                .cast("string")
                .alias("max_value"),
            ).select(F.lit(col).alias("column_name"), "n_rows", "n_null",
                     "n_distinct", "min_value", "max_value")
        )
    stats = per_col[0]
    for df in per_col[1:]:
        stats = stats.unionAll(df)
    return stats
