"""Round-5 statistics / BI catalog batch: cohort retention, rank and
OLS correlation, Benford digit audit, Gini concentration, HHI,
chi-square independence, robust MAD outliers, week-over-week growth,
lead/lag deltas, grouping sets, inter-purchase gaps, cume_dist ranks.

Each query follows the engine's cross-engine determinism doctrine:
exact integer/DECIMAL accumulation wherever a sum feeds a published
number (order-independent under any partitioning), doubles only in the
final closed-form arithmetic with the SAME op sequence in the oracle
SQL, and every rank/top-k cut ordered by a rounded value plus an id
tie-break so a last-ulp divergence cannot flip membership.

Scale notes are per-query; the common rules: aggregate the fact table
FIRST (per-day / per-customer / per-cell), so windows and joins run on
calendar- or domain-bounded frames; global ranks ride
``bucketed_global_rank`` / ``exclusive_prefix_sum`` (no unpartitioned
data-sized window anywhere); grand totals ride the offsets broadcast or
a ``bounded_seq_window`` over metadata-sized aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import (
    bounded_seq_window,
    bucketed_global_rank,
    exclusive_prefix_sum,
)
from ..sources.tables import load_table
from .registry import register


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


# ------------------------------------------------------ purchase streaks --
@register(
    "purchase_streaks",
    oracle="""
    WITH om AS (
        SELECT DISTINCT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), isl AS (
        SELECT o_custkey,
               mi - row_number() OVER (
                   PARTITION BY o_custkey ORDER BY mi
               ) AS island
        FROM om
    ), streaks AS (
        SELECT o_custkey, count(*) AS streak_len
        FROM isl GROUP BY o_custkey, island
    ), best AS (
        SELECT o_custkey, max(streak_len) AS best_streak
        FROM streaks GROUP BY o_custkey
    )
    SELECT best_streak, count(*) AS n_customers
    FROM best GROUP BY best_streak
    """,
)
def purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE active months per customer, reported
    as a distribution (how many customers peak at an n-month streak) —
    the classic gaps-and-islands pattern: on each customer's distinct
    month indices, ``mi - row_number()`` is constant exactly along a
    consecutive run, so one partitioned window + two aggregates find
    every streak with no self-join.

    Scale: the window partitions by custkey (data-parallel, no global
    ordering); months are integer indices (identical arithmetic on
    both engines); output is bounded by the calendar span.
    """
    om = (
        _orders(spark, sf_dir)
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("mi"),
        )
        .distinct()
    )
    isl = om.select(
        "o_custkey",
        (
            F.col("mi")
            - F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("mi")
            )
        ).alias("island"),
    )
    best = (
        isl.groupBy("o_custkey", "island")
        .agg(F.count("*").alias("streak_len"))
        .groupBy("o_custkey")
        .agg(F.max("streak_len").alias("best_streak"))
    )
    return best.groupBy("best_streak").agg(F.count("*").alias("n_customers"))


# ------------------------------------------------------------- spearman --
@register(
    "spearman_corr_value_qty",
    oracle="""
    WITH base AS (
        SELECT l_extendedprice AS x, l_quantity AS y FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ), r AS (
        SELECT x, y,
               rank() OVER (ORDER BY x)
                 + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
               rank() OVER (ORDER BY y)
                 + (count(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
        FROM base
    )
    SELECT count(*) AS n,
           round(corr(rx, ry), 6) AS spearman_rho,
           round(corr(x, y), 6)   AS pearson_r
    FROM r
    """,
)
def spearman_corr_value_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line-item price and quantity
    (plus Pearson on the raw values for contrast) — the tie-aware
    fractional-rank formulation: avg_rank(v) = (# rows < v) + (#ties+1)/2.

    Scale design: ranks come from the DISTINCT-VALUE table, not the
    rows — per-value counts feed ``exclusive_prefix_sum`` (bucketed, no
    single-partition window), avg ranks are closed-form per distinct
    value, and two value-keyed equi-joins paint them back onto the
    fact rows.  The oracle's whole-table window formulation is the
    single-node semantics; this plan is the distributed one.
    """
    base = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .select(F.col("l_extendedprice").alias("x"), F.col("l_quantity").alias("y"))
    )

    def avg_ranks(col: str, bounds: tuple[float, float]) -> DataFrame:
        counts = base.groupBy(col).agg(F.count("*").alias("cnt"))
        pre = exclusive_prefix_sum(
            counts, col, ["cnt"], n_buckets=256, bounds=bounds
        )
        return pre.select(
            col,
            (
                F.col("cnt_before").cast("double")
                + (F.col("cnt") + 1) / 2.0
            ).alias(f"r{col}"),
        )

    rx = avg_ranks("x", (0.0, 120000.0))
    ry = avg_ranks("y", (0.0, 60.0))
    ranked = base.join(rx, "x").join(ry, "y")
    return ranked.agg(
        F.count("*").alias("n"),
        F.round(F.corr("rx", "ry"), 6).alias("spearman_rho"),
        F.round(F.corr("x", "y"), 6).alias("pearson_r"),
    )


# --------------------------------------------------------------- linreg --
@register(
    "linreg_daily_revenue",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               round(sum(o_totalprice), 2) AS rev
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY day
    ), xy AS (
        SELECT CAST(date_diff('day', (SELECT min(day) FROM per_day), day)
                    AS DECIMAL(10,0)) AS x,
               CAST(rev AS DECIMAL(18,2)) AS y
        FROM per_day
    ), s AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS DOUBLE)     AS sx,
               CAST(sum(y) AS DOUBLE)     AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM xy
    )
    SELECT n AS n_days,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def linreg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS of daily revenue against the day index: slope,
    intercept, R² from the five classic sums — one aggregate over the
    calendar-bounded per-day table, no ML library, no iteration.

    Determinism: the sums accumulate in DECIMAL (exact, order-
    independent under any partitioning); only the final closed-form
    arithmetic runs in double, with the oracle spelling out the SAME
    expression tree so both engines execute the identical IEEE op
    sequence.  Scale: the fact table collapses to per-day rows first;
    everything after is metadata-sized.
    """
    per_day = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    xy = per_day.crossJoin(
        F.broadcast(per_day.agg(F.min("day").alias("d0")))
    ).select(
        F.datediff("day", "d0").cast("decimal(10,0)").alias("x"),
        F.col("rev").cast("decimal(18,2)").alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ----------------------------------------------------------------- gini --
@register(
    "gini_customer_revenue",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                               AS DECIMAL(18,2)) AS rev
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY o_custkey
    ), ranked AS (
        SELECT rev, row_number() OVER (ORDER BY rev, o_custkey) AS i
        FROM per_cust
    ), s AS (
        SELECT count(*) AS n,
               CAST(sum(rev) AS DOUBLE) AS tot,
               CAST(sum(i * rev) AS DOUBLE) AS s1
        FROM ranked
    )
    SELECT n AS n_customers,
           round(tot, 2) AS total_revenue,
           round((2.0 * s1 - (n + 1.0) * tot) / (n * tot), 6) AS gini
    FROM s
    """,
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the closed-form over ascending-ranked revenues:
    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx).

    Scale design: per-customer revenue accumulates in DECIMAL (exact),
    and the ascending rank is ``bucketed_global_rank`` — one hash
    shuffle on a revenue bucket plus per-bucket local sort, never a
    single-partition global window.  Σ i·x_i is exact (bigint ×
    decimal), so the published gini is bit-stable under any
    partitioning; ties in revenue are broken by custkey, and equal
    revenues make the rank assignment irrelevant to Σ i·x_i anyway.
    """
    per_cust = (
        _orders(spark, sf_dir)
        .filter(F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    bucket = F.least(
        F.greatest(F.floor(F.col("rev").cast("double") / 25000.0), F.lit(0)),
        F.lit(255),
    )
    ranked = bucketed_global_rank(
        per_cust,
        bucket,
        [F.col("rev").asc(), F.col("o_custkey").asc()],
        rank_col="i",
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rev").cast("double").alias("tot"),
        F.sum(F.col("i") * F.col("rev")).cast("double").alias("s1"),
    )
    n, tot, s1 = F.col("n"), F.col("tot"), F.col("s1")
    return s.select(
        n.alias("n_customers"),
        F.round(tot, 2).alias("total_revenue"),
        F.round((2.0 * s1 - (n + 1.0) * tot) / (n * tot), 6).alias("gini"),
    )


# ------------------------------------------------------------------ hhi --
@register(
    "mktsegment_hhi",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_mktsegment, o.o_custkey,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice IS NOT NULL AND c.c_mktsegment IS NOT NULL
        GROUP BY 1, 2
    ), seg AS (
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(rev) AS DOUBLE) AS tot,
               CAST(sum(CAST(rev * rev AS DECIMAL(38,4))) AS DOUBLE) AS sq
        FROM per_cust GROUP BY 1
    )
    SELECT c_mktsegment, n_customers,
           round(tot, 2) AS segment_revenue,
           round(sq / (tot * tot), 6) AS hhi
    FROM seg
    """,
)
def mktsegment_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market segment:
    Σ (customer share)² of segment revenue — the antitrust-style
    concentration screen (1/n for perfectly even, →1 for monopolized).

    Determinism: both Σrev and Σrev² accumulate in DECIMAL, so
    hhi = Σrev²/ (Σrev)² is computed from two exact numbers — no
    order-dependent float sum over thousands of tiny shares.  Scale:
    custkey-keyed join + aggregate, then a segment-bounded rollup.
    """
    orders = _orders(spark, sf_dir).filter(F.col("o_totalprice").isNotNull())
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isNotNull()
    )
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    seg = per_cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum("rev").cast("double").alias("tot"),
        F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sq"),
    )
    return seg.select(
        "c_mktsegment",
        "n_customers",
        F.round(F.col("tot"), 2).alias("segment_revenue"),
        F.round(F.col("sq") / (F.col("tot") * F.col("tot")), 6).alias("hhi"),
    )


# ------------------------------------------------------------------ chi2 --
@register(
    "chi2_priority_status",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               count(*) AS n
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        GROUP BY 1, 2
    ), t AS (
        SELECT pri, st, n,
               sum(n) OVER (PARTITION BY pri) AS row_tot,
               sum(n) OVER (PARTITION BY st)  AS col_tot,
               sum(n) OVER ()                 AS total
        FROM cells
    )
    SELECT CAST(max(total) AS BIGINT) AS n_total,
           CAST((count(DISTINCT pri) - 1) * (count(DISTINCT st) - 1)
                AS BIGINT) AS dof,
           round(sum(
               (n - row_tot * col_tot / CAST(total AS DOUBLE))
               * (n - row_tot * col_tot / CAST(total AS DOUBLE))
               / (row_tot * col_tot / CAST(total AS DOUBLE))
           ), 6) AS chi2
    FROM t
    """,
)
def chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order priority
    and order status: contingency counts, expected cell counts from the
    marginals, Σ(O−E)²/E and the degrees of freedom.

    Scale: the fact scan collapses to the |priorities|×|statuses|
    contingency table first (≤ ~15 rows at any data size); every window
    below runs on that metadata-sized frame, partitioned by the margin
    key (the one full-frame total is over the same bounded cells).
    """
    cells = (
        _orders(spark, sf_dir)
        .filter(
            F.col("o_orderpriority").isNotNull()
            & F.col("o_orderstatus").isNotNull()
        )
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count("*").alias("n"))
    )
    t = (
        cells.withColumn("row_tot", F.sum("n").over(Window.partitionBy("pri")))
        .withColumn("col_tot", F.sum("n").over(Window.partitionBy("st")))
        .withColumn(
            "total",
            F.sum("n").over(
                bounded_seq_window(F.col("pri"), F.col("st")).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("total").cast("double")
    return t.agg(
        F.max("total").cast("bigint").alias("n_total"),
        (
            (F.countDistinct("pri") - 1) * (F.countDistinct("st") - 1)
        ).cast("bigint").alias("dof"),
        F.round(F.sum((F.col("n") - e) * (F.col("n") - e) / e), 6).alias("chi2"),
    )


# ------------------------------------------------------------- mad/outlier --
@register(
    "mad_outlier_orders",
    oracle="""
    WITH base AS (
        -- integer CENTS: interpolated medians of ints land on the
        -- .5/.25 grid, exactly representable in binary, so the two
        -- engines' different interpolation op orders cannot diverge
        SELECT o_orderpriority AS pri,
               CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    ), med AS (
        SELECT pri, quantile_cont(pc, 0.5) AS med FROM base GROUP BY pri
    ), dev AS (
        SELECT b.pri, b.pc, m.med, abs(b.pc - m.med) AS ad
        FROM base b JOIN med m ON b.pri = m.pri
    ), mad AS (
        SELECT pri, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY pri
    )
    SELECT d.pri AS o_orderpriority,
           count(*) AS n,
           round(max(d.med) / 100.0, 2) AS median_price,
           round(max(m.mad) / 100.0, 2) AS mad,
           CAST(sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.pri = m.pri
    GROUP BY 1
    """,
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per order priority: median price, median
    absolute deviation (MAD), and how many orders sit beyond 3·MAD —
    the estimator that (unlike mean±3σ) a few mega-orders cannot drag.

    Cross-engine exactness: prices quantize to integer CENTS before
    the percentiles, so every interpolated midpoint lands on the
    .5-cent grid (exactly representable in binary) and every deviation
    / MAD stays on a .25-cent grid — median, MAD, and each
    ``|p−med| > 3·MAD`` comparison are bit-identical BY EXACTNESS,
    not by hoping the engines share an interpolation op order (they
    don't: the sf0.01 null-injection sweep caught the raw-double
    formulation flipping a 2-dp round on a midpoint).

    Scale: exact within-group percentiles merge each group into one
    aggregation buffer — fine for the bounded priority domain; an
    unbounded group key would switch to ``approx_percentile`` (the
    documented trade, as in ``order_value_percentiles``).  Everything
    else is priority-keyed joins against ≤5-row broadcasts.
    """
    base = (
        _orders(spark, sf_dir)
        .filter(
            F.col("o_orderpriority").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("pc"),
        )
    )
    med = base.groupBy("pri").agg(F.percentile("pc", F.lit(0.5)).alias("med"))
    dev = base.join(F.broadcast(med), "pri").withColumn(
        "ad", F.abs(F.col("pc") - F.col("med"))
    )
    mad = dev.groupBy("pri").agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "pri")
        .groupBy(F.col("pri").alias("o_orderpriority"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("med") / 100.0, 2).alias("median_price"),
            F.round(F.max("mad") / 100.0, 2).alias("mad"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------- wow growth --
@register(
    "wow_revenue_growth",
    oracle="""
    WITH weekly AS (
        SELECT CAST(floor(date_diff('day', DATE '1992-01-01', o_orderdate)
                          / 7.0) AS BIGINT) AS week_idx,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY 1
    )
    SELECT week_idx, revenue,
           lag(revenue) OVER (ORDER BY week_idx) AS prev_revenue,
           round((revenue - lag(revenue) OVER (ORDER BY week_idx))
                 / lag(revenue) OVER (ORDER BY week_idx) * 100, 4)
               AS growth_pct
    FROM weekly
    """,
)
def wow_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: weekly totals keyed by an
    integer epoch-week index (days since 1992-01-01, div 7) — an
    arithmetic week that both engines compute identically, immune to
    ISO-week / week-start semantics differences.

    Scale: fact scan -> calendar-bounded weekly aggregate; the lag
    runs on that metadata-sized series (``bounded_seq_window``).
    """
    weekly = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.floor(
                F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) / 7.0
            ).cast("bigint").alias("week_idx")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = bounded_seq_window(F.col("week_idx"))
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "week_idx",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("growth_pct"),
    )


# ------------------------------------------------------------ lead/lag --
@register(
    "lead_lag_revenue_delta",
    oracle="""
    WITH per_day AS (
        SELECT year(o_orderdate) AS yr, CAST(o_orderdate AS DATE) AS day,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT yr, day, revenue,
           lag(revenue)  OVER (PARTITION BY yr ORDER BY day) AS prev_revenue,
           lead(revenue) OVER (PARTITION BY yr ORDER BY day) AS next_revenue,
           round(revenue - lag(revenue) OVER (PARTITION BY yr ORDER BY day),
                 2) AS delta_prev
    FROM per_day
    """,
)
def lead_lag_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with lag/lead neighbors and day-over-day delta,
    windowed WITHIN each year — the canonical partitioned
    lag/lead/delta triple.  Partitioning by year keeps every window
    data-parallel (no cross-partition ordering), and the first day of
    each year showing a NULL delta is the honest boundary semantics.

    Scale: per-day aggregate first; the windows run on the calendar-
    bounded series, hash-partitioned by year.
    """
    per_day = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("yr").orderBy("day")
    return per_day.select(
        "yr",
        "day",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        F.lead("revenue").over(w).alias("next_revenue"),
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias(
            "delta_prev"
        ),
    )


# -------------------------------------------------------- grouping sets --
@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT year(o_orderdate) AS yr,
           o_orderpriority,
           CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_year,
           CAST(grouping(o_orderpriority) AS BIGINT)   AS g_pri,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
      AND o_totalprice IS NOT NULL
    GROUP BY GROUPING SETS ((yr, o_orderpriority), (yr),
                            (o_orderpriority), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity revenue report in ONE pass: (year, priority),
    per-year, per-priority, and grand-total rows via GROUPING SETS,
    with per-column grouping indicators distinguishing an aggregated-
    away column from a genuinely NULL key.

    Plan: Catalyst compiles grouping sets to a single Expand over one
    scan (each input row fans out to its 4 grouping combinations,
    map-side) feeding one hash aggregate — never a UNION of 4 scans.
    """
    base = (
        _orders(spark, sf_dir)
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.year("o_orderdate").alias("yr"),
            "o_orderpriority",
            "o_totalprice",
        )
    )
    return base.groupingSets(
        [["yr", "o_orderpriority"], ["yr"], ["o_orderpriority"], []],
        "yr",
        "o_orderpriority",
    ).agg(
        F.grouping("yr").cast("bigint").alias("g_year"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_pri"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------- inter-purchase gaps --
@register(
    "inter_purchase_gaps",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, o_orderkey,
               lag(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE), o_orderkey
               ) AS prev_day
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), gaps AS (
        SELECT date_diff('day', prev_day, day) AS gap
        FROM seq WHERE prev_day IS NOT NULL
    )
    SELECT CAST(floor(gap / 30.0) AS BIGINT) AS gap_month_bucket,
           count(*) AS n,
           round(sum(gap) / CAST(count(*) AS DOUBLE), 4) AS avg_gap_days
    FROM gaps
    GROUP BY 1
    """,
)
def inter_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of days between a customer's consecutive orders,
    bucketed by ~month (30-day bins): the repeat-purchase cadence
    histogram.  Gap days are exact integers (lag over the per-customer
    sequence), so counts and the Σgap/n averages are deterministic.

    Scale: ONE window partitioned by custkey (ordered by day, orderkey
    for tie-stability) — data-parallel across customers; the histogram
    aggregate collapses to a handful of bucket rows.
    """
    seq = (
        _orders(spark, sf_dir)
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            F.to_date("o_orderdate").alias("day"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        seq.withColumn("prev_day", F.lag("day").over(w))
        .filter(F.col("prev_day").isNotNull())
        .select(F.datediff("day", "prev_day").alias("gap"))
    )
    return gaps.groupBy(
        F.floor(F.col("gap") / 30.0).cast("bigint").alias("gap_month_bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("gap") / F.count("*").cast("double"), 4).alias(
            "avg_gap_days"
        ),
    )


# ------------------------------------------------------------ cume_dist --
@register(
    "cume_dist_order_values",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               percent_rank() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
               ) AS pct_rank,
               cume_dist() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
               ) AS cume,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           round(pct_rank, 6) AS pct_rank,
           round(cume, 6) AS cume
    FROM ranked WHERE rn <= 3
    """,
)
def cume_dist_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of order values within each priority
    class, reported for each class's top-3 orders — the distributional
    rank functions over a partitioned (data-parallel) window, with the
    top-k cut on (value DESC, orderkey) so float ties cannot flip
    membership across engines.

    Scale: both rank windows and the top-k filter share ONE
    priority-partitioned sort; Catalyst's WindowGroupLimit pushes the
    rn<=3 cut below the full-window materialization.
    """
    wv = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wtop = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = (
        _orders(spark, sf_dir)
        .filter(
            F.col("o_orderpriority").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.percent_rank().over(wv).alias("pr"),
            F.cume_dist().over(wv).alias("cd"),
            F.row_number().over(wtop).alias("rn"),
        )
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.round("pr", 6).alias("pct_rank"),
        F.round("cd", 6).alias("cume"),
    )


# ------------------------------------------------- grouped price elasticity --
@register(
    "price_elasticity_by_brand",
    oracle="""
    WITH pts AS (
        SELECT p.p_brand AS brand,
               CAST(round(ln(l.l_extendedprice / l.l_quantity), 9)
                    AS DECIMAL(18, 9)) AS x,
               CAST(round(ln(l.l_quantity), 9)
                    AS DECIMAL(18, 9)) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ), sums AS (
        SELECT brand, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts GROUP BY brand
    )
    SELECT brand, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS elasticity
    FROM sums
    WHERE n >= 30
      AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
    """,
)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: the grouped-OLS slope of
    ln(quantity) on ln(unit price) — one regression per brand in a
    single aggregate pass, the canonical retail-analytics estimate of
    how demand responds to price.

    Determinism pattern for IRRATIONAL features (new in the catalog):
    the regression sums Σx, Σy, Σxy, Σx² over ln() values cannot ride
    float sums (order-dependent merge) and cannot stay exact as raw
    doubles — so each ln() is computed once (shared-libm bit parity,
    the ``copurchase_degree_stats`` assumption), rounded to 9 dp, and
    CAST to DECIMAL(18,9): from there every sum and product is exact
    decimal arithmetic, order-independent under any partitioning, and
    only the final closed-form slope returns to double (same
    expression tree in the oracle).  Scale: one fact-dim equi-join
    (part broadcastable), one hash aggregate keyed by brand with
    map-side partials — no window, no self-join; |brands| output rows.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.round(
        F.log(F.col("l_extendedprice") / F.col("l_quantity")), 9
    ).cast("decimal(18,9)")
    y = F.round(F.log("l_quantity"), 9).cast("decimal(18,9)")
    sums = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("p_brand").alias("brand"), x.alias("x"), y.alias("y"))
        .groupBy("brand")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    return sums.filter((n >= 30) & (denom != 0.0)).select(
        "brand",
        "n",
        F.round((n * sxy - sx * sy) / denom, 6).alias("elasticity"),
    )


# ------------------------------------------------ rolling 7d active users --
@register(
    "rolling_7d_active_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), days AS (
        SELECT DISTINCT day FROM ud
    )
    SELECT d.day, count(DISTINCT u.user_id) AS active_7d
    FROM days d JOIN ud u
      ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the DAU/WAU
    denominator every growth dashboard carries, and the textbook case
    where a naive window fails: COUNT(DISTINCT) over a sliding RANGE
    frame is unsupported, and a per-day self-join against raw events
    rescans the fact 7x.

    Plan: dedup to (user, day) once (hash aggregate), then each
    activity day EXPANDS to the <=7 report days it is visible from
    (``sequence`` + ``explode`` — bounded x7 blowup of the already
    tiny per-user-day table), a semi-join keeps report days that
    exist in the data, and one count-distinct aggregate per report
    day finishes.  Every step is a key-partitioned hash operation —
    no window at all, no fact rescan; the same shape handles any
    window length W at xW cost.  The DuckDB oracle states the
    semantics as the range join it is.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    return (
        expanded.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )


# ---------------------------------------------------- Welch t-test --
@register(
    "welch_ttest_value",
    oracle="""
    WITH cents AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
    ), cells AS (
        SELECT
            sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_a,
            sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS n_b,
            sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS s_a,
            sum(CASE WHEN event_type = 'click'    THEN c ELSE 0 END) AS s_b,
            sum(CASE WHEN event_type = 'purchase' THEN c * c ELSE 0 END) AS ss_a,
            sum(CASE WHEN event_type = 'click'    THEN c * c ELSE 0 END) AS ss_b
        FROM cents
    ), stats AS (
        SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(s_a AS DOUBLE) / n_a AS m_a,
               CAST(s_b AS DOUBLE) / n_b AS m_b,
               (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)) / (n_a - 1) AS v_a,
               (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)) / (n_b - 1) AS v_b
        FROM cells
    )
    SELECT n_a, n_b,
           round(m_a / 100.0, 6) AS mean_a,
           round(m_b / 100.0, 6) AS mean_b,
           round(sqrt(v_a) / 100.0, 6) AS sd_a,
           round(sqrt(v_b) / 100.0, 6) AS sd_b,
           round((m_a - m_b) / nullif(sqrt(v_a / n_a + v_b / n_b), 0), 6)
               AS t_stat,
           round((v_a / n_a + v_b / n_b) * (v_a / n_a + v_b / n_b)
                 / nullif((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                          + (v_b / n_b) * (v_b / n_b) / (n_b - 1), 0), 6)
               AS df_welch
    FROM stats
    """,
)
def welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the purchase-value and
    click-value populations (the hypothesis-testing complement to
    ``ab_test_zstat``'s proportion test: means instead of rates, with
    the Welch-Satterthwaite degrees of freedom for unequal variances).

    Determinism: values are exact cents, so per-group count / sum /
    sum-of-squares are pure integer cells (DECIMAL/HUGEINT
    accumulation — order-independent under any partitioning; cents² is
    ~2.4e9 per row, far past int64 at 100 TB row counts, hence the
    DECIMAL(38,0) casts on the Spark side).  Every published double
    derives from those cells through the IDENTICAL closed-form op
    sequence in both engines, rounded at 6; NULLIF guards the
    degenerate zero-variance case on both sides.

    Scale shape: ONE conditional-sum aggregate over the filtered scan
    (map-side partials, O(1) reduce state) — no grouping, no shuffle
    beyond the single global reduce; the same cells are mergeable
    across days, so the test statistic rolls up incrementally."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    )
    c = F.round(F.col("value") * 100).cast("long")
    is_a = F.col("event_type") == "purchase"
    dec = "decimal(38,0)"
    cells = e.select(c.alias("c"), is_a.alias("is_a")).agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("c")).otherwise(0)).alias("s_a"),
        F.sum(F.when(~F.col("is_a"), F.col("c")).otherwise(0)).alias("s_b"),
        F.sum(
            F.when(F.col("is_a"), (F.col("c") * F.col("c")).cast(dec))
            .otherwise(F.lit(0).cast(dec))
        ).alias("ss_a"),
        F.sum(
            F.when(~F.col("is_a"), (F.col("c") * F.col("c")).cast(dec))
            .otherwise(F.lit(0).cast(dec))
        ).alias("ss_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    ma, mb = sa / na, sb / nb
    va = (F.col("ss_a").cast("double") - sa * (sa / na)) / (na - 1)
    vb = (F.col("ss_b").cast("double") - sb * (sb / nb)) / (nb - 1)
    se2 = va / na + vb / nb
    return cells.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(ma / 100.0, 6).alias("mean_a"),
        F.round(mb / 100.0, 6).alias("mean_b"),
        F.round(F.sqrt(va) / 100.0, 6).alias("sd_a"),
        F.round(F.sqrt(vb) / 100.0, 6).alias("sd_b"),
        F.round((ma - mb) / F.nullif(F.sqrt(se2), F.lit(0.0)), 6)
        .alias("t_stat"),
        F.round(
            se2 * se2
            / F.nullif(
                (va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1),
                F.lit(0.0),
            ),
            6,
        ).alias("df_welch"),
    )


# ------------------------------------------------- user burstiness --
@register(
    "user_burstiness",
    oracle="""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS c
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    ), per_user AS (
        SELECT user_id,
               count(*) AS n_days,
               sum(c) AS sc,
               sum(c * c) AS ssc,
               max(c) AS peak_day
        FROM ud GROUP BY user_id HAVING count(*) >= 10
    ), scored AS (
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(n_days AS BIGINT) AS n_days,
               CAST(sc AS BIGINT) AS n_events,
               CAST(peak_day AS BIGINT) AS peak_day,
               round(CAST(sc AS DOUBLE) / n_days, 6) AS mean_daily,
               round(((CAST(ssc AS DOUBLE)
                       - CAST(sc AS DOUBLE) * (CAST(sc AS DOUBLE) / n_days))
                      / (n_days - 1))
                     / (CAST(sc AS DOUBLE) / n_days), 6) AS fano
        FROM per_user
    )
    SELECT * FROM scored
    ORDER BY fano DESC, user_id
    LIMIT 20
    """,
)
def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness audit: the Fano factor (index of dispersion,
    sample-variance / mean of per-ACTIVE-day event counts) per user,
    top-20 most bursty.  Fano >> 1 marks users whose activity arrives
    in bursts rather than uniformly — a classic fraud-velocity signal
    (the per-day twin of ``rolling_user_velocity``'s within-hour rate)
    and a standard overdispersion diagnostic vs the Poisson null.

    Determinism: daily counts are exact integers, so per-user
    (n_days, Σc, Σc²) cells are exact under any partitioning; the
    variance/mean closed form is the IDENTICAL double op sequence both
    engines, rounded at 6 BEFORE the top-20 cut, with user_id as the
    tie-break — a last-ulp divergence cannot flip membership.

    Scale shape: two hash aggregates (events → user×day, → user) —
    both map-side combinable, both key-bounded (users × ≤span days);
    the top-20 is a distributed take-ordered over the per-user frame,
    NOT an unpartitioned window."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    ud = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("c")
    )
    per_user = (
        ud.groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c") * F.col("c")).alias("ssc"),
            F.max("c").alias("peak_day"),
        )
        .filter(F.col("n_days") >= 10)
    )
    nd = F.col("n_days")
    sc, ssc = F.col("sc").cast("double"), F.col("ssc").cast("double")
    mean = sc / nd
    fano = ((ssc - sc * (sc / nd)) / (nd - 1)) / (sc / nd)
    return (
        per_user.select(
            "user_id",
            "n_days",
            F.col("sc").alias("n_events"),
            "peak_day",
            F.round(mean, 6).alias("mean_daily"),
            F.round(fano, 6).alias("fano"),
        )
        .orderBy(F.desc("fano"), "user_id")
        .limit(20)
    )
