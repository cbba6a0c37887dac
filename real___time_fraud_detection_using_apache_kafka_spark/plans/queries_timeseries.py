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


@register(
    "session_survival_km",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, epoch_us(ts) AS us
        FROM events WHERE user_id IS NOT NULL
    ), horizon AS (
        SELECT max(us) AS h_us FROM e
    ), flagged AS (
        SELECT user_id, us,
               CASE WHEN us - lag(us) OVER (
                        PARTITION BY user_id ORDER BY us, event_id)
                      > 30 * 60 * 1000000
                      OR lag(us) OVER (
                        PARTITION BY user_id ORDER BY us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM e
    ), sess AS (
        SELECT user_id, us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), durs AS (
        SELECT user_id, sid,
               CAST((max(us) - min(us)) // 60000000 AS BIGINT) AS dur_min,
               CASE WHEN (SELECT h_us FROM horizon) - max(us)
                         < 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS censored
        FROM sess GROUP BY user_id, sid
    ), deaths AS (
        SELECT dur_min, count(*) FILTER (censored = 0) AS d,
               count(*) AS total_at
        FROM durs GROUP BY dur_min
    ), km AS (
        SELECT dur_min, d,
               sum(total_at) OVER (ORDER BY dur_min DESC
                                   ROWS UNBOUNDED PRECEDING) AS n_at_risk
        FROM deaths
    )
    SELECT dur_min AS duration_min, d AS n_ended, n_at_risk,
           -- the final factor can be exactly 0 (everyone at risk dies):
           -- ln() is guarded and the zero flag pins S = 0 from there on
           round(CASE WHEN max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
                          OVER (ORDER BY dur_min ROWS UNBOUNDED PRECEDING) = 1
                 THEN 0.0
                 ELSE exp(sum(CASE WHEN d < n_at_risk
                              THEN ln(1.0 - d / CAST(n_at_risk AS DOUBLE)) END)
                          OVER (ORDER BY dur_min ROWS UNBOUNDED PRECEDING))
                 END, 6) AS survival
    FROM km WHERE d > 0
    """,
)
def session_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of SESSION durations: how long do
    user sessions (30-minute inactivity gap) live, with each user's
    possibly-still-open trailing session right-CENSORED (its last event
    lies within one gap of the corpus horizon, so its true duration is
    unknown) — the censoring correction that separates survival
    analysis from a naive duration histogram.  S(t) = Π_{dᵢ≤t}
    (1 − dᵢ/nᵢ) over durations with at least one completed session.

    Plan: sessionization is the engine's standard gap/island sweep on
    ONE user-keyed exchange; after the per-session collapse everything
    runs on per-DISTINCT-duration rows — at-risk counts are a
    descending cumulative, the product telescopes to exp(Σ ln(·)) on
    the ascending pass, both ``bounded_seq_window`` (durations are
    wall-clock-bounded).  Both engines evaluate the identical ordered
    sequence; the 6-dp round absorbs exp/ln last-ulp skew.  The
    horizon rides a broadcast 1-row aggregate.
    """
    from ..operators.temporal import _micros

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", _micros(F.col("ts")).alias("us"))
    )
    gap = 30 * 60 * 1_000_000
    horizon = e.agg(F.max("us").alias("h_us"))
    w_lag = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w_lag)
    flagged = e.select(
        "user_id", "us",
        F.when(prev.isNull() | (F.col("us") - prev > gap), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "us", F.sum("is_new").over(w_run).alias("sid")
    )
    durs = (
        sess.groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.floor((F.col("e_us") - F.col("s_us")) / 60_000_000)
            .cast("long")
            .alias("dur_min"),
            F.when(F.col("h_us") - F.col("e_us") < gap, 1)
            .otherwise(0)
            .alias("censored"),
        )
    )
    deaths = durs.groupBy("dur_min").agg(
        F.count(F.when(F.col("censored") == 0, 1)).alias("d"),
        F.count("*").alias("total_at"),
    )
    w_desc = bounded_seq_window(
        F.desc("dur_min"), anchor=F.col("dur_min")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km = deaths.select(
        "dur_min", "d", F.sum("total_at").over(w_desc).alias("n_at_risk")
    )
    w_asc = bounded_seq_window(
        F.asc("dur_min"), anchor=F.col("dur_min")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ln_term = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.log(1.0 - F.col("d") / F.col("n_at_risk").cast("double")),
    )
    hit_zero = F.max(
        F.when(F.col("d") == F.col("n_at_risk"), 1).otherwise(0)
    ).over(w_asc)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(ln_term).over(w_asc))
    )
    return (
        km.withColumn("survival", F.round(surv, 6))
        .filter(F.col("d") > 0)
        .select(
            F.col("dur_min").alias("duration_min"),
            F.col("d").alias("n_ended"),
            "n_at_risk",
            "survival",
        )
    )


@register(
    "theil_sen_revenue_trend",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY day
    ), base AS (
        SELECT day, rev,
               date_diff('day', (SELECT min(day) FROM per_day), day) AS x
        FROM per_day
    ), slopes AS (
        SELECT (b.rev - a.rev) / CAST(b.x - a.x AS DOUBLE) AS s
        FROM base a JOIN base b ON a.x < b.x
    ), fit AS (
        SELECT quantile_cont(s, 0.5) AS slope,
               count(*) AS n_pairs
        FROM slopes
    )
    SELECT (SELECT count(*) FROM base)        AS n_days,
           n_pairs,
           round(slope, 6)                    AS slope_per_day,
           round((SELECT quantile_cont(rev - fit.slope * x, 0.5)
                  FROM base), 6)              AS intercept
    FROM fit
    """,
)
def theil_sen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: slope = MEDIAN of all
    pairwise day-to-day slopes, intercept = median residual at x=0 —
    the estimator that shrugs off the outlier days that drag the OLS
    fit (``revenue_trend_regression``) around; up to ~29% contamination
    tolerated by construction.

    Plan: the fact table collapses to per-day rows first, so the O(n²)
    pairwise-slope join runs on the CALENDAR-bounded series (~10⁵ pairs
    per decade of days — metadata next to the fact scan), joined on
    the day index, never a fact-to-fact product.  The medians use the
    shared linear-interpolation percentile semantics
    (``percentile`` / ``quantile_cont``), and both engines interpolate
    the same sorted doubles, so the 6-dp round holds the hash.
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    base = per_day.crossJoin(
        F.broadcast(per_day.agg(F.min("day").alias("d0")))
    ).select(
        "rev", F.datediff("day", "d0").alias("x")
    )
    # the day table collapses to ~1 partition after its aggregate; spread
    # the O(days²) pair generation across tasks before the theta-join
    # (the broadcast NLJ parallelizes over left-side partitions only)
    a = base.repartition(32).select(
        F.col("x").alias("xa"), F.col("rev").alias("ra")
    )
    b = base.select(F.col("x").alias("xb"), F.col("rev").alias("rb"))
    slopes = a.join(F.broadcast(b), F.col("xa") < F.col("xb")).select(
        ((F.col("rb") - F.col("ra")) / (F.col("xb") - F.col("xa")).cast("double")
         ).alias("s")
    )
    fit = slopes.agg(
        F.percentile("s", F.lit(0.5)).alias("slope"),
        F.count("*").alias("n_pairs"),
    )
    # ONE pass carries slope/n_pairs through the residual aggregate —
    # a second crossJoin(fit) would re-evaluate the whole pairwise
    # subtree (measured ~2x)
    resid = base.crossJoin(F.broadcast(fit)).agg(
        F.percentile(
            F.col("rev") - F.col("slope") * F.col("x"), F.lit(0.5)
        ).alias("intercept"),
        F.count("*").alias("n_days"),
        F.max("slope").alias("slope"),
        F.max("n_pairs").alias("n_pairs"),
    )
    return resid.select(
        "n_days", "n_pairs",
        F.round("slope", 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"),
    )


@register(
    "holt_backtest_accuracy",
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
               CASE WHEN n_days >= 3 THEN
                   list_reduce(
                       list_prepend(
                           [xs[2], xs[2] - xs[1], 0.0, 0.0, 0.0, 0.0],
                           list_transform(xs[3:len(xs)],
                                          v -> [v, 0.0, 0.0, 0.0, 0.0, 0.0])),
                       (acc, x) -> [
                           0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                           0.3 * (0.5 * x[1] + 0.5 * (acc[1] + acc[2])
                                  - acc[1]) + 0.7 * acc[2],
                           acc[3] + abs(x[1] - (acc[1] + acc[2])),
                           acc[4] + (x[1] - (acc[1] + acc[2]))
                                  * (x[1] - (acc[1] + acc[2])),
                           acc[5] + CASE WHEN x[1] <> 0.0
                                    THEN abs(x[1] - (acc[1] + acc[2]))
                                         / abs(x[1]) ELSE 0.0 END,
                           acc[6] + CASE WHEN x[1] <> 0.0
                                    THEN 1.0 ELSE 0.0 END
                       ])
               END AS a
        FROM series
    )
    SELECT n_days,
           n_days - 2                                        AS n_forecasts,
           round(a[3] / (n_days - 2), 6)                     AS mae,
           round(sqrt(a[4] / (n_days - 2)), 6)               AS rmse,
           round(CASE WHEN a[6] > 0.0
                 THEN 100.0 * a[5] / a[6] END, 6)            AS mape_pct
    FROM fitted
    WHERE n_days >= 3
    """,
)
def holt_backtest_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (one-step-ahead) backtest of the Holt forecaster:
    at every day t >= 3 the model state fitted through day t-1 issues
    the forecast ``level + trend``, scored against the realized revenue
    BEFORE the state folds that day in — the walk-forward evaluation a
    forecast monitor runs, reported as MAE / RMSE / MAPE.

    Because one-step-ahead backtesting over an expanding window is
    exactly the intermediate states of the single Holt fold, the whole
    backtest is ONE pass: the `holt_revenue_forecast` accumulator grows
    four error cells ([level, trend, sum|e|, sum e^2, sum |e|/|x|,
    n_pct]) and the IDENTICAL fold runs on DuckDB ``list_reduce`` (list
    elements lifted to the 6-wide shape), so every error term matches
    bit-for-bit before the 6-dp round.  Scale: fact table collapses to
    per-day rows first; the fold touches only the calendar-bounded
    series.
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
        "CASE WHEN size(xs) >= 3 THEN "
        "aggregate(slice(xs, 3, greatest(size(xs) - 2, 0)), "
        "array(xs[1], xs[1] - xs[0], 0.0D, 0.0D, 0.0D, 0.0D), "
        "(acc, x) -> array("
        "0.5 * x + 0.5 * (acc[0] + acc[1]), "
        "0.3 * (0.5 * x + 0.5 * (acc[0] + acc[1]) - acc[0]) + 0.7 * acc[1], "
        "acc[2] + abs(x - (acc[0] + acc[1])), "
        "acc[3] + (x - (acc[0] + acc[1])) * (x - (acc[0] + acc[1])), "
        "acc[4] + CASE WHEN x <> 0.0D THEN abs(x - (acc[0] + acc[1])) / abs(x) "
        "ELSE 0.0D END, "
        "acc[5] + CASE WHEN x <> 0.0D THEN 1.0D ELSE 0.0D END"
        ")) END"
    )
    fitted = series.select("n_days", fold.alias("a")).filter(
        F.col("n_days") >= 3
    )
    n_fc = F.col("n_days") - F.lit(2)
    return fitted.select(
        "n_days",
        n_fc.alias("n_forecasts"),
        F.round(F.expr("a[2]") / n_fc, 6).alias("mae"),
        F.round(F.sqrt(F.expr("a[3]") / n_fc), 6).alias("rmse"),
        F.round(
            F.when(F.expr("a[5]") > 0.0, F.lit(100.0) * F.expr("a[4]") / F.expr("a[5]")),
            6,
        ).alias("mape_pct"),
    )


@register(
    "dow_seasonality",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS rev
        FROM orders GROUP BY day
    ), keyed AS (
        -- engine-neutral weekday: days since epoch Monday 1970-01-05,
        -- mod 7 (0 = Monday) — no dayofweek() convention mismatch
        SELECT ((date_diff('day', DATE '1970-01-05', day) % 7) + 7) % 7
                   AS dow,
               rev
        FROM per_day
    ), by_dow AS (
        SELECT dow, count(*) AS n_days, sum(rev) AS tot
        FROM keyed GROUP BY dow
    ), grand AS (
        SELECT sum(n_days) AS g_days, sum(tot) AS g_tot FROM by_dow
    )
    SELECT dow, n_days,
           round(CAST(tot AS DOUBLE) / n_days, 2)     AS avg_daily_rev,
           round((CAST(tot AS DOUBLE) / n_days)
                 / (CAST(g_tot AS DOUBLE) / g_days), 6) AS seasonal_index
    FROM by_dow, grand
    """,
)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices of revenue: the mean daily revenue
    of each weekday relative to the overall mean daily revenue — the
    multiplicative seasonal profile a naive seasonal forecaster or a
    staffing dashboard starts from.

    Determinism: daily revenue accumulates in DECIMAL (exact under any
    partitioning); the weekday key is computed arithmetically (days
    since an epoch Monday, mod 7) so no engine dayofweek() convention
    is involved; the only doubles are the final two divisions, spelled
    identically in the oracle.  Scale: fact scan -> per-day hash
    aggregate -> 7-row aggregate; the grand totals ride an audited
    ``bounded_seq_window`` full-frame sum over the 7-row table
    (plan-pinned single scan — a crossJoin of the grand aggregate
    would recompute the fact aggregate from a second scan).
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    by_dow = (
        per_day.select(
            F.pmod(
                F.datediff("day", F.lit("1970-01-05").cast("date")), F.lit(7)
            ).alias("dow"),
            "rev",
        )
        .groupBy("dow")
        .agg(F.count("*").alias("n_days"), F.sum("rev").alias("tot"))
    )
    across = bounded_seq_window(F.col("dow")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    grand = by_dow.select(
        "dow",
        "n_days",
        "tot",
        F.sum("n_days").over(across).alias("g_days"),
        F.sum("tot").over(across).alias("g_tot"),
    )
    return grand.select(
        "dow",
        "n_days",
        F.round(F.col("tot").cast("double") / F.col("n_days"), 2).alias(
            "avg_daily_rev"
        ),
        F.round(
            (F.col("tot").cast("double") / F.col("n_days"))
            / (F.col("g_tot").cast("double") / F.col("g_days")),
            6,
        ).alias("seasonal_index"),
    )


# Kalman local-level constants: process var Q, observation var R, prior
# var P0.  The gain sequence depends only on (P0, Q, R) — data enters
# through the innovation — so the filter is a principled time-varying
# EWMA whose weight self-anneals from ~1 (trust the first observations
# while the prior is vague) to the steady state k* ~= 0.146.
_KAL_Q, _KAL_R, _KAL_P0 = "0.5", "20.0", "1000.0"
_KAL_GAIN_DUCK = f"((acc[2] + {_KAL_Q}) / (acc[2] + {_KAL_Q} + {_KAL_R}))"


@register(
    "kalman_revenue_smooth",
    oracle=f"""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY day
    ), series AS (
        SELECT list(day ORDER BY day) AS days,
               list(CAST(rev AS DOUBLE) ORDER BY day) AS xs
        FROM per_day
    ), folded AS (
        SELECT days, xs,
               CASE WHEN len(xs) >= 1 THEN
                   list_reduce(
                       list_prepend([xs[1], {_KAL_P0}, xs[1]],
                                    list_transform(xs[2:len(xs)],
                                                   v -> [v, 0.0])),
                       (acc, x) -> list_concat(list_concat(
                           [acc[1] + {_KAL_GAIN_DUCK} * (x[1] - acc[1]),
                            (1.0 - {_KAL_GAIN_DUCK}) * (acc[2] + {_KAL_Q})],
                           acc[3:len(acc)]),
                           [acc[1] + {_KAL_GAIN_DUCK} * (x[1] - acc[1])]))
               END AS st
        FROM series
    )
    SELECT unnest(days) AS day,
           unnest(list_transform(xs, v -> round(v, 2))) AS rev,
           unnest(list_transform(st[3:len(st)],
                                 v -> round(v, 6))) AS smoothed
    FROM folded
    """,
)
def kalman_revenue_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kalman filter (local-level model) over the daily revenue series:
    per day, the observed revenue next to the filtered level.  The
    predict/update recurrence (p+Q -> gain -> innovation correction)
    folds as ONE ``aggregate`` expression whose array<double>
    accumulator carries [level, variance, history...]; the IDENTICAL
    fold — same literals, same op order, gain written out at each use
    site — runs on DuckDB via ``list_reduce`` with list-lifted
    elements, so every smoothed value matches bit-for-bit before the
    6-dp round (the ``holt_revenue_forecast`` doctrine, extended from
    final-state to full-trajectory parity).

    This is the state-space primitive under every streaming anomaly
    detector: the same recurrence runs incrementally per micro-batch
    (state = [level, variance], O(1) per key), which is why the batch
    fold is worth oracling — it is the replayable ground truth for a
    streaming dual.

    Scale: the fact collapses to per-day rows first (map-side partial
    hash aggregate); the fold touches only the calendar-bounded series
    — same doctrine as Holt/EWMA/CUSUM.  Cites the reference's per-tick
    recompute loop (FD/evaluation.py) as the anti-pattern this
    replaces.
    """
    per_day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    series = per_day.agg(
        F.expr(
            "array_sort(collect_list(struct(day, rev)))"
        ).alias("s")
    ).select(
        F.expr("transform(s, x -> x.day)").alias("days"),
        F.expr("transform(s, x -> cast(x.rev as double))").alias("xs"),
    )
    fold = F.expr(
        "CASE WHEN size(xs) >= 1 THEN "
        "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)), "
        f"array(xs[0], cast({_KAL_P0} as double), xs[0]), "
        "(acc, x) -> concat(array("
        f"acc[0] + ((acc[1] + {_KAL_Q}) / (acc[1] + {_KAL_Q} + {_KAL_R})) * (x - acc[0]), "
        f"(1.0 - ((acc[1] + {_KAL_Q}) / (acc[1] + {_KAL_Q} + {_KAL_R}))) * (acc[1] + {_KAL_Q})"
        "), slice(acc, 3, size(acc) - 2), array("
        f"acc[0] + ((acc[1] + {_KAL_Q}) / (acc[1] + {_KAL_Q} + {_KAL_R})) * (x - acc[0])"
        "))) END"
    )
    folded = series.select("days", "xs", fold.alias("st"))
    return folded.select(
        F.explode(
            F.arrays_zip(
                F.col("days").alias("day"),
                F.expr("transform(xs, v -> round(v, 2))").alias("rev"),
                F.expr(
                    "transform(slice(st, 3, size(st) - 2), v -> round(v, 6))"
                ).alias("smoothed"),
            )
        ).alias("z")
    ).select("z.day", "z.rev", "z.smoothed")


@register(
    "seasonal_trend_decompose",
    oracle="""
    WITH per_day AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) * 100
                    AS BIGINT) AS rev_cents
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY day
    ), trended AS (
        SELECT day, rev_cents,
               sum(rev_cents) OVER w AS w_sum,
               count(*) OVER w AS w_cnt
        FROM per_day
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                                           AND 3 FOLLOWING)
    ), scaled AS (
        -- 420 = lcm(1..7): scaled detrended value is an EXACT BIGINT
        -- for every partial-edge window width, so the per-DOW sums
        -- below are order-independent integer arithmetic
        SELECT ((date_diff('day', DATE '1970-01-05', day) % 7) + 7) % 7
                   AS dow,
               rev_cents,
               rev_cents * 420 - w_sum * (420 // w_cnt) AS d420
        FROM trended
    )
    SELECT dow, count(*) AS n_days,
           floor((CAST(sum(rev_cents) AS DOUBLE) / count(*)) / 100.0
                 * 1000000.0 + 0.5) / 1000000.0 AS avg_revenue,
           floor(((CAST(sum(d420) AS DOUBLE) / 420.0) / count(*)) / 100.0
                 * 1000000.0 + 0.5) / 1000000.0 AS seasonal
    FROM scaled
    GROUP BY dow
    """,
)
def seasonal_trend_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition of daily revenue (an
    STL-lite): trend = centered 7-day moving average, seasonal = per-
    weekday mean of the detrended series — the decomposition a demand
    forecaster runs before modeling residuals (the multiplicative
    cousin of ``dow_seasonality``).

    Determinism — the lcm trick: daily revenue is EXACT integer cents;
    the centered window yields (sum w_sum, count w_cnt) with w_cnt ≤ 7,
    and 420 = lcm(1..7) makes ``rev·420 − w_sum·(420/w_cnt)`` an exact
    BIGINT for every edge-partial width — so the detrended per-DOW
    sums are pure integer arithmetic under any partitioning, and the
    only doubles are the final shared-recipe divisions.  The weekday
    key is days-since-epoch-Monday mod 7 (no dayofweek() convention).

    Scale: fact scan -> per-day hash aggregate; the ±3-row window runs
    over PER-DAY rows (metadata-sized by construction —
    ``bounded_seq_window`` doctrine) and the final aggregate is 7
    rows.
    """
    from ..operators.windows import bounded_seq_window

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    per_day = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = bounded_seq_window(F.col("day")).rowsBetween(-3, 3)
    trended = per_day.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("w_sum"),
        F.count("*").over(w).alias("w_cnt"),
    )
    scaled = trended.select(
        (
            (
                (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date"))
                 % 7) + 7
            ) % 7
        ).alias("dow"),
        "rev_cents",
        (
            F.col("rev_cents") * 420
            - F.col("w_sum") * F.expr("420 div w_cnt")
        ).alias("d420"),
    )

    def r6(col: F.Column) -> F.Column:
        return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return scaled.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        r6(
            (F.sum("rev_cents").cast("double") / F.count("*")) / F.lit(100.0)
        ).alias("avg_revenue"),
        r6(
            (F.sum("d420").cast("double") / F.lit(420.0) / F.count("*"))
            / F.lit(100.0)
        ).alias("seasonal"),
    )
