"""Time-series / sequential-statistics catalog queries (engine
extension surface — the reference's dashboard plots raw counters over
time (FD/dashboard.py:150-246) but computes no sequential statistics;
a monitoring-grade engine needs the recurrence/lag/changepoint basics).

Three cost tiers, each with the scale story stated where it runs:

- per-entity recurrences (EWMA)      — state bounded per key;
- calendar-collapsed series (autocorrelation, CUSUM) — windows run
  over per-DAY rows, so the ordered windows are metadata-sized by
  construction (``bounded_seq_window`` doctrine from operators/windows)
  no matter how many raw rows fed them;
- everything upstream of a window is a plain hash aggregate with
  map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import bounded_seq_window
from ..sources.tables import load_table
from .registry import register

EWMA_ALPHA = 0.3


@register(
    "ewma_user_value",
    oracle=f"""
    WITH hist AS (
        SELECT user_id,
               count(*) AS n_events,
               list(value ORDER BY ts, event_id) AS h
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n_events,
           round(list_reduce(h, (acc, x) ->
                     acc * {1 - EWMA_ALPHA} + {EWMA_ALPHA} * x), 6) AS ewma
    FROM hist
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (final state, α=0.3, seeded with the first observation) — the
    classic drift-tracking recurrence a fraud profile keeps per entity
    (the streaming dual of the running counters in T4).

    A recurrence is sequential by definition, so it runs as ONE
    JVM-side fold per user: ``collect_list`` the user's (ts, id, value)
    history into the aggregate buffer, ``array_sort`` (total order —
    ties pinned by event_id), then ``aggregate`` folds the EWMA with
    the first element as seed.  No Python, no window, one user-keyed
    exchange; per-key state is the user's own history, bounded by
    per-entity activity (the same bound every sessionization makes).
    For unbounded per-key histories the recurrence is still
    distributable because an affine map x ↦ (1-α)x + αv composes
    associatively — a segmented scan over (mult, add) pairs replaces
    the single fold; documented here, not needed at catalog scale.
    The identical left-fold runs on DuckDB via ``list_reduce``, so
    every IEEE multiply-add happens in the same order on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    hist = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("h"),
    )
    fold = F.aggregate(
        F.slice(F.col("h"), 2, F.size("h") - 1),
        F.element_at("h", 1)["value"],
        lambda acc, s: acc * F.lit(1 - EWMA_ALPHA) + F.lit(EWMA_ALPHA) * s["value"],
    )
    return hist.select(
        "user_id", "n_events", F.round(fold, 6).alias("ewma")
    )


@register(
    "autocorr_daily_revenue",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(o_totalprice)         AS rev
        FROM orders GROUP BY day
    ), lagged AS (
        SELECT day, rev,
               lag(rev, 1) OVER (ORDER BY day) AS rev_lag1,
               lag(rev, 7) OVER (ORDER BY day) AS rev_lag7
        FROM per_day
    )
    SELECT count(*)                          AS n_days,
           round(corr(rev, rev_lag1), 6)     AS autocorr_lag1,
           round(corr(rev, rev_lag7), 6)     AS autocorr_lag7
    FROM lagged
    """,
)
def autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily revenue series — the
    seasonality probe (is tomorrow like today? is next week like this
    week?) that decides smoothing windows and anomaly baselines.

    The raw fact table collapses to per-DAY rows in one hash aggregate;
    the lag windows and the correlation then run over a
    calendar-bounded series (``bounded_seq_window`` — days, not
    orders), so nothing data-sized ever passes through an ordered
    window.  ``corr`` is scale-invariant, so the n vs n-1 variance
    convention cancels; the 6-decimal round absorbs last-ulp
    accumulation skew.
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = bounded_seq_window(F.col("day"))
    lagged = per_day.select(
        "rev",
        F.lag("rev", 1).over(w).alias("rev_lag1"),
        F.lag("rev", 7).over(w).alias("rev_lag7"),
    )
    return lagged.agg(
        F.count("*").alias("n_days"),
        F.round(F.corr("rev", "rev_lag1"), 6).alias("autocorr_lag1"),
        F.round(F.corr("rev", "rev_lag7"), 6).alias("autocorr_lag7"),
    )


@register(
    "cusum_changepoint",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        FROM orders GROUP BY day
    ), stats AS (
        SELECT day, n,
               avg(n)   OVER () AS m,
               count(*) OVER () AS n_days
        FROM per_day
    ), c AS (
        SELECT day, n_days, m,
               sum(n - m) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
        FROM stats
    )
    SELECT day                AS changepoint_day,
           n_days,
           round(m, 6)        AS daily_mean,
           round(abs(s), 6)   AS max_abs_cusum
    FROM c
    ORDER BY abs(s) DESC, day ASC
    LIMIT 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator over the daily order-count series: the
    day where the cumulative sum of (count − mean) attains its maximum
    magnitude — the point a single level shift most plausibly occurred
    (the screening statistic behind binary-segmentation changepoint
    detection).  Ties break to the earliest day.

    Plan: raw orders collapse to per-day counts in one hash aggregate;
    the mean, the running CUSUM and the argmax all run over
    calendar-bounded per-day rows (``bounded_seq_window``), with the
    argmax a TakeOrderedAndProject limit-1, not a sort.  The running
    sum is evaluated strictly in day order on both engines, so the
    double accumulation sequence — and therefore the 6-decimal hash —
    is identical.
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w_all = bounded_seq_window(F.col("day")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = bounded_seq_window(F.col("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stats = per_day.select(
        "day", "n",
        F.avg("n").over(w_all).alias("m"),
        F.count("*").over(w_all).alias("n_days"),
    )
    c = stats.select(
        "day", "n_days", "m",
        F.sum(F.col("n") - F.col("m")).over(w_run).alias("s"),
    )
    return (
        c.orderBy(F.abs("s").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            "n_days",
            F.round("m", 6).alias("daily_mean"),
            F.round(F.abs("s"), 6).alias("max_abs_cusum"),
        )
    )


@register(
    "daily_anomaly_zscore",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY day
    ), scored AS (
        SELECT day, rev,
               avg(rev) OVER w AS mu,
               stddev_samp(rev) OVER w AS sigma,
               count(*) OVER w AS n_window
        FROM per_day
        WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, rev, n_window,
           round((rev - mu) / sigma, 4) AS zscore
    FROM scored
    WHERE n_window >= 7 AND sigma > 0
      AND abs((rev - mu) / sigma) > 2
    """,
)
def daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection on the daily revenue series:
    each day is z-scored against the mean/stddev of the PRECEDING 7
    observed days (strictly trailing — the day never scores against
    itself, the causal form a live monitor needs), and days beyond
    |z| > 2 are flagged.  The alerting companion to
    ``cusum_changepoint`` (retrospective level shift) and
    ``value_outliers_robust`` (population outliers).

    Plan: facts collapse to per-day rows first, so the trailing frame
    runs over the calendar-bounded series (``bounded_seq_window``);
    warm-up rows (fewer than 7 predecessors) are excluded explicitly
    via the frame row count rather than left to NULL-propagation
    differences.  Both engines evaluate the same frame in the same day
    order; the 4-dp round absorbs stddev accumulation ulps.
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = bounded_seq_window(F.col("day")).rowsBetween(-7, -1)
    scored = per_day.select(
        "day", "rev",
        F.avg("rev").over(w).alias("mu"),
        F.stddev_samp("rev").over(w).alias("sigma"),
        F.count("*").over(w).alias("n_window"),
    )
    z = (F.col("rev") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(
            (F.col("n_window") >= 7) & (F.col("sigma") > 0) & (F.abs(z) > 2)
        )
        .select("day", "rev", "n_window", F.round(z, 4).alias("zscore"))
    )


@register(
    "holt_revenue_forecast",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY day
    ), series AS (
        SELECT list(CAST(rev AS DOUBLE) ORDER BY day) AS xs,
               count(*) AS n_days
        FROM per_day
    ), fitted AS (
        SELECT n_days,
               CASE WHEN n_days >= 2 THEN
                   list_reduce(
                       list_prepend([xs[2], xs[2] - xs[1]],
                                    list_transform(xs[3:len(xs)],
                                                   v -> [v, 0.0])),
                       (acc, x) -> [
                           0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                           0.3 * (0.5 * x[1] + 0.5 * (acc[1] + acc[2])
                                  - acc[1]) + 0.7 * acc[2]
                       ])
               END AS lb
        FROM series
    )
    SELECT n_days,
           round(lb[1], 6)               AS level,
           round(lb[2], 6)               AS trend,
           round(lb[1] + 1 * lb[2], 6)   AS forecast_1d,
           round(lb[1] + 7 * lb[2], 6)   AS forecast_7d
    FROM fitted
    """,
)
def holt_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α=0.5, β=0.3)
    over the daily revenue series, with 1-day and 7-day linear
    forecasts — the next step up from EWMA when the series trends, and
    the classical baseline every forecasting stack is judged against.

    The two-state recurrence folds as ONE ``aggregate`` expression with
    an array<double> [level, trend] accumulator (init: level=x₂,
    trend=x₂−x₁, folding from the 3rd observation — the standard Holt
    initialization), over the calendar-bounded day series collected in
    order.  The IDENTICAL fold — same literals, same op order — runs on
    DuckDB via ``list_reduce`` with a list accumulator, so the fitted
    state matches bit-for-bit before the 6-dp round.  Scale: the fact
    table collapses to per-day rows first; the fold touches only the
    bounded series (same doctrine as the other sequential queries).
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    series = per_day.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, rev))), "
            "s -> cast(s.rev as double))"
        ).alias("xs"),
        F.count("*").alias("n_days"),
    )
    fold = F.expr(
        "CASE WHEN size(xs) >= 2 THEN "
        "aggregate(slice(xs, 3, greatest(size(xs) - 2, 0)), "
        "array(xs[1], xs[1] - xs[0]), "
        "(acc, x) -> array("
        "0.5 * x + 0.5 * (acc[0] + acc[1]), "
        "0.3 * (0.5 * x + 0.5 * (acc[0] + acc[1]) - acc[0]) + 0.7 * acc[1]"
        ")) END"
    )
    fitted = series.select("n_days", fold.alias("lb"))
    return fitted.select(
        "n_days",
        F.round(F.expr("lb[0]"), 6).alias("level"),
        F.round(F.expr("lb[1]"), 6).alias("trend"),
        F.round(F.expr("lb[0] + 1 * lb[1]"), 6).alias("forecast_1d"),
        F.round(F.expr("lb[0] + 7 * lb[1]"), 6).alias("forecast_7d"),
    )
