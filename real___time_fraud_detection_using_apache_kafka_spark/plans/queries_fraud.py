"""Fraud-forensics / feature-engineering catalog.

The reference's whole purpose is scoring transactions for fraud
(FD/consumer.py:114-131) and surfacing "fraud patterns" as dashboard
aggregates (FD/evaluation.py:166-173).  This module is the engine-side
generalization of that analytics surface: the detection rules and model
features a fraud team would actually run at warehouse scale — velocity
rules, robust outlier flags, leakage-safe target encoding, Benford
first-digit forensics, RFM segmentation, and session conversion paths —
each as one declarative plan with a DuckDB oracle.

Scale notes (SCALE.md "Fraud forensics"): every window partitions on
``user_id`` (150 at sf0.01, millions at 100 TB — perfectly parallel);
the only global sorts are over *bounded* domains (9 Benford digits,
distinct-user RFM rank, top-15 paths).  Group medians ride one
aggregate + a broadcast join back (5-row dimension), never a per-row
subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import _micros
from ..sources.tables import load_table
from .registry import register


@register(
    "rapid_repeat_purchases",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, event_id,
               (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap_sec
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*)                                   AS n_purchases,
           count(*) FILTER (gap_sec <= 3600)           AS n_rapid,
           min(gap_sec)                               AS min_gap_sec
    FROM p
    GROUP BY user_id
    HAVING count(*) FILTER (gap_sec <= 3600) >= 1
    """,
)
def rapid_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity rule: users with purchases ≤ 1 h apart — the classic
    card-testing / rapid-repeat fraud signal the reference's per-record
    consumer loop (FD/consumer.py:114-131) cannot express because it
    never sees two records at once.

    One ``lag`` window partitioned by ``user_id`` (ties pinned by
    ``event_id``), then a per-user aggregate — a single shuffle on the
    natural key, no self-join.  Gap arithmetic in integral epoch-seconds
    so the 3600 s threshold compare is exact on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        ((_micros(F.col("ts")) - _micros(F.lag("ts").over(w))) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_sec"),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count_if(F.col("gap_sec") <= 3600).alias("n_rapid"),
            F.min("gap_sec").alias("min_gap_sec"),
        )
        .filter(F.col("n_rapid") >= 1)
    )


@register(
    "value_outliers_robust",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(any_value(d.med), 6)                        AS med,
           round(any_value(m.mad), 6)                        AS mad,
           count(*)                                          AS n_events,
           count(*) FILTER (d.adev > 3 * 1.4826 * m.mad)     AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def value_outliers_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier census per event type — the
    anomaly-flagging complement to the reference's model-based score
    (mean/stddev rules break under the exact skew fraud induces; the
    median/MAD pair has a 50 % breakdown point).

    Two grouped exact medians (``percentile``), each collapsing to a
    5-row dimension that broadcasts back onto the fact — never a
    correlated per-row subquery.  The deviation intermediate feeds both
    the MAD aggregate and the final census, and is deliberately
    RECOMPUTED, not persisted: it is a narrow 2-column scan + broadcast
    join, and at 100M rows caching it measured 52 s vs 22 s recomputed
    (materializing a wide 100M-row cache costs more than two cheap
    columnar scans — the near-dup pipelines persist their shingles for
    the opposite reason: there the recompute is the dominant CPU).
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count("*").alias("n_events"),
            F.count_if(F.col("adev") > 3 * 1.4826 * F.col("mad")).alias("n_outliers"),
        )
    )


@register(
    "priority_target_encoding",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END)
                 / count(*), 6) AS raw_rate,
           round((sum(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END)
                  + 100 * (sum(sum(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END)) OVER ()
                           / sum(count(*)) OVER ()))
                 / (count(*) + 100), 6)
               AS smoothed_rate
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def priority_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes smoothed target encoding of a categorical against
    the fraud-ish label (``o_orderstatus = 'F'``) — the leakage-aware
    replacement for the reference's per-record ``LabelEncoder`` bug
    (SURVEY.md §2.11-1): category → shrunk event rate, pulled toward the
    global prior by pseudo-count m=100 so rare categories don't memorize
    their few labels.

    The global prior is NOT a second scan: it derives from the grouped
    result itself (unpartitioned window sums over the |categories|-row
    aggregate) — one scan, one shuffle on the encoded key, and the
    window runs over a handful of rows.
    """
    o = load_table(spark, sf_dir, "orders")
    is_f = F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    grp = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum(is_f).alias("s")
    )
    # audited bounded window: runs over the |priorities|-row aggregate,
    # metadata-sized by construction
    from ..operators.windows import bounded_total_window

    w_all = bounded_total_window(F.col("o_orderpriority"))
    grate = F.sum("s").over(w_all) / F.sum("n").over(w_all)
    return grp.select(
        "o_orderpriority",
        "n",
        F.round(F.col("s") / F.col("n"), 6).alias("raw_rate"),
        F.round((F.col("s") + 100 * grate) / (F.col("n") + 100), 6)
        .alias("smoothed_rate"),
    )


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                   AS digit
        FROM orders
        WHERE o_totalprice > 0
    )
    SELECT digit,
           count(*) AS observed,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 6)    AS obs_share,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)  AS exp_share,
           round(power(count(*) * 1.0 / sum(count(*)) OVER ()
                       - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
                 / log10(1.0 + 1.0 / CAST(digit AS DOUBLE))
                 * sum(count(*)) OVER (), 4)                   AS chi2_term
    FROM d
    GROUP BY digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the standard
    forensic-accounting screen for fabricated transaction values (a
    synthetic generator like FD/producer.py:65 draws uniform amounts,
    which this flags instantly: uniform first digits vs the log curve).

    The digit is extracted arithmetically (cents as BIGINT → first
    char), not by formatting the double — ``CAST(double AS VARCHAR)``
    renders differently across engines, integer rendering doesn't.  One
    aggregate to 9 rows; the corpus total is an unpartitioned window sum
    over those 9 rows (not a second scan), and chi-square terms are
    plain column arithmetic on the result.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        ).alias("digit")
    )
    grp = d.groupBy("digit").agg(F.count("*").alias("observed"))
    # audited bounded window: runs over the 9 first-digit rows
    from ..operators.windows import bounded_total_window

    w_all = bounded_total_window(F.col("digit"))
    total = F.sum("observed").over(w_all)
    exp_share = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    obs_share = F.col("observed") * F.lit(1.0) / total
    return grp.select(
        "digit",
        "observed",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("exp_share"),
        F.round(F.pow(obs_share - exp_share, 2) / exp_share * total, 4)
        .alias("chi2_term"),
    )


@register(
    "user_rfm_segments",
    oracle="""
    WITH p AS (
        SELECT user_id,
               max(ts)            AS last_ts,
               count(*)           AS frequency,
               round(sum(value), 2) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), g AS (SELECT max(last_ts) AS now FROM p)
    SELECT user_id,
           (epoch_us(g.now) - epoch_us(last_ts)) // 86400000000 AS recency_days,
           frequency,
           monetary,
           ntile(4) OVER (ORDER BY last_ts DESC, user_id)  AS r_score,
           -- the user_id % 16 term after the capped value is the
           -- BALANCE sub-bucket of the distributed-rank tier (ADVICE
           -- r5): on a low-cardinality count domain it splits each hot
           -- value across 16 bounded buckets; stated here so the ntile
           -- order is identical on both engines
           ntile(4) OVER (ORDER BY least(frequency, 255), user_id % 16,
                          frequency, user_id)              AS f_score,
           -- coalesce: a user whose every purchase value is NULL has
           -- unknown spend and ranks as zero on BOTH engines (raw NULL
           -- ordering diverges: Spark ranks NULLS FIRST, this window
           -- NULLS LAST)
           ntile(4) OVER (ORDER BY
                          least(greatest(floor(coalesce(monetary, 0) / 100),
                                         0), 255),
                          user_id % 16, coalesce(monetary, 0), user_id)
               AS m_score
    FROM p CROSS JOIN g
    """,
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation over
    purchase events — the canonical behavioral feature block for a fraud
    or churn model, replacing the reference's single-transaction feature
    view (FD/features.py) with per-entity history features.

    The heavy fact collapses to one row per user FIRST (one shuffle);
    the quartiles then rank the *entity* table, which is |users| rows,
    not |events| — with user_id tie-breaks so quartile assignment is
    total-order deterministic.  The DEFAULT tier is the distributed
    rank (VERDICT r4 item 7): each metric rides
    ``bucketed_global_rank`` + closed-form ``ntile_from_rank`` — one
    bucket-keyed hash shuffle and a per-bucket local sort per metric,
    NO single-partition window even over the entity table (at 100 TB
    that table is still ~1e8 rows).  Bit-identical to the entity-ntile
    formulation (pinned by
    ``test_rfm_bucketed_default_matches_entity_ntile``), which the
    oracle still states declaratively.  The entity table is
    session-tracked-persisted: three rank subtrees and the global-now
    broadcast all read the cached |users|-row collapse, keeping exactly
    ONE fact scan in the plan.
    """
    from ..operators.cache import tracked_persist
    from ..operators.windows import bucketed_global_rank, ntile_from_rank

    p = tracked_persist(
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    day_us = F.lit(86_400_000_000)

    def quartile(bucket, order, name):
        ranked = bucketed_global_rank(p, bucket, order, rank_col="_r",
                                      total_col="_n")
        return ranked.select(
            "user_id", ntile_from_rank(F.col("_r"), F.col("_n"), 4).alias(name)
        )

    r = quartile(
        # last_ts DESC total order -> negated day number is a monotone
        # ASC bucket (negative bucket values sort fine)
        -F.floor(_micros(F.col("last_ts")) / day_us),
        [F.desc("last_ts"), F.asc("user_id")],
        "r_score",
    )
    # Balance sub-bucket (ADVICE r5): least(frequency, 255) alone has
    # only as many buckets as distinct counts — on a small-integer
    # purchase-count domain most entities land in 2-3 buckets and the
    # per-bucket row_number degenerates toward a single-task sort.  The
    # bucket is therefore the struct (capped value, user_id % 16): a
    # bounded 16-way split of every hot value that stays a monotone
    # prefix of the (capped value, h, raw value, user_id) total order
    # the oracle states.
    h16 = F.pmod(F.col("user_id"), F.lit(16))
    fcap = F.least(F.col("frequency"), F.lit(255))
    f = quartile(
        F.struct(fcap.alias("v"), h16.alias("h")),
        [fcap.asc(), h16.asc(), F.asc("frequency"), F.asc("user_id")],
        "f_score",
    )
    mon0 = F.coalesce(F.col("monetary"), F.lit(0.0))  # see oracle comment
    mcap = F.least(F.greatest(F.floor(mon0 / 100), F.lit(0)), F.lit(255))
    m = quartile(
        F.struct(mcap.alias("v"), h16.alias("h")),
        [mcap.asc(), h16.asc(), mon0.asc(), F.asc("user_id")],
        "m_score",
    )
    now = p.agg(F.max("last_ts").alias("_now"))
    base = p.crossJoin(F.broadcast(now)).select(
        "user_id",
        ((_micros(F.col("_now")) - _micros(F.col("last_ts"))) / day_us)
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    return base.join(r, "user_id").join(f, "user_id").join(m, "user_id")


@register(
    "session_conversion_paths",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ), paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path,
           count(*)            AS n_sessions,
           sum(converted)      AS n_converted,
           round(sum(converted) * 1.0 / count(*), 4) AS conv_rate
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 15
    """,
)
def session_conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top sessionized event paths with conversion rate — the behavioral
    sequence mining behind the reference's "fraud patterns" panel
    (FD/evaluation.py:166-173), upgraded from per-field modes to ordered
    within-session journeys.

    Gaps-and-islands sessionization (same 30-min rule as
    ``operators.temporal.sessionize``) shares ONE user-partitioned sort
    across both windows; the ordered path string is built by sorting the
    collected (ts, event_id, type) structs inside each session group —
    deterministic without a second window.  Output is the top-15 paths:
    a bounded global sort on the already-aggregated path table.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            prev.isNull() | (_micros(F.col("ts")) - _micros(prev) > 1_800_000_000), 1
        ).otherwise(0).alias("is_new"),
    )
    sessions = flagged.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            # nullif '': array_join SKIPS null elements, so a session of
            # only null-typed events renders '' while the oracle's
            # string_agg (which also skips nulls) yields NULL — fold the
            # empty path to NULL to match
            F.nullif(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    ">",
                ),
                F.lit(""),
            ).alias("path"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("converted"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("converted").alias("n_converted"),
            F.round(F.sum("converted") * F.lit(1.0) / F.count("*"), 4)
            .alias("conv_rate"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(15)
    )


@register(
    "frequent_event_itemsets",
    oracle="""
    WITH RECURSIVE baskets AS (
        SELECT user_id,
               coalesce(list_sort(list(DISTINCT event_type)
                                  FILTER (event_type IS NOT NULL)),
                        []) AS items
        FROM events GROUP BY user_id
    ), n AS (
        SELECT count(*) AS total FROM baskets
    ), ordered AS (
        SELECT event_type AS it,
               row_number() OVER (ORDER BY event_type) AS idx
        FROM (SELECT DISTINCT event_type FROM events
              WHERE event_type IS NOT NULL)
    ), subsets(sub, last_idx) AS (
        SELECT [it], idx FROM ordered
        UNION ALL
        SELECT list_append(s.sub, o.it), o.idx
        FROM subsets s JOIN ordered o ON o.idx > s.last_idx
    ), counts AS (
        SELECT array_to_string(s.sub, ',') AS itemset, count(*) AS freq
        FROM subsets s JOIN baskets b ON list_has_all(b.items, s.sub)
        GROUP BY 1
    )
    SELECT itemset, freq
    FROM counts, n
    WHERE freq >= ceil(0.3 * total)
    ORDER BY freq DESC, itemset
    """,
)
def frequent_event_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type itemsets per user via MLlib FPGrowth — market-
    basket mining of which behaviors co-occur in the same account, the
    unsupervised cousin of the reference's fraud-pattern panel.

    Baskets are per-user DISTINCT event-type sets (one shuffle to build);
    FPGrowth's distributed FP-tree (PFP, Li et al. 2008) partitions
    conditional trees by item so no single worker holds the global tree.

    ORACLE-ABLE SINCE ROUND 5: FP-Growth is an algorithm, not a
    semantics — over a BOUNDED item domain (|event types| = 5, so 31
    candidate itemsets) the frequent-itemset RESULT is plain SQL: a
    recursive-CTE enumeration of the non-empty item subsets, a
    containment join against the baskets, and the ceil(minSupport·N)
    cut MLlib applies (`minCount = ceil(minSupport * count)`).  The
    declared rows-only status was a conflation of the two; the driver
    now hash-checks the exact counts.  (This oracle strategy is
    domain-bounded by construction — a 10⁴-item vocabulary would be
    2^10⁴ subsets; there the rows-only check would genuinely be the
    ceiling.)
    """
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("items"))
    )
    model = FPGrowth(itemsCol="items", minSupport=0.3, minConfidence=0.5).fit(baskets)
    return (
        model.freqItemsets.select(
            F.array_join(F.array_sort("items"), ",").alias("itemset"),
            F.col("freq"),
        )
        .orderBy(F.desc("freq"), F.asc("itemset"))
    )


@register("value_outliers_approx")  # rows-only: sketch medians are engine-specific
def value_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB tier of ``value_outliers_robust``: same two-level
    median/MAD plan with ``approx_percentile`` (KLL-style mergeable
    sketch, rank error ≤ 0.1 %) replacing the exact grouped sort —
    the swap SCALE.md documents, as runnable code.

    Plan shape is IDENTICAL to the exact tier (two grouped aggregates,
    two broadcast-back joins); only the aggregate's state changes from
    "all values" to a fixed-size sketch, which is what removes the
    per-group sort measured at 20.9 s / 100M rows.  Parity with the
    exact tier is tolerance-tested (tests/test_fraud_queries.py).
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("approx_percentile(adev, 0.5, 1000)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.count("*").alias("n_events"),
            F.count_if(F.col("adev") > 3 * 1.4826 * F.col("mad")).alias("n_outliers"),
        )
    )


@register(
    "value_outliers_audit",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        FROM events WHERE value IS NOT NULL
    ), med AS (
        SELECT event_type, quantile_cont(v_c, 0.5) AS med_c
        FROM e GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, abs(e.v_c - m.med_c) AS adev_c, m.med_c
        FROM e JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, quantile_cont(adev_c, 0.5) AS mad_c
        FROM dev GROUP BY event_type
    )
    SELECT 'stats' AS kind, d.event_type,
           any_value(d.med_c) AS med_cents,
           any_value(m.mad_c) AS mad_cents,
           count(*) AS n_events,
           count(*) FILTER (d.adev_c > 3 * 1.4826 * m.mad_c) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def value_outliers_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLED audit twin of ``value_outliers_approx`` (VERDICT r10
    item 2) — the same exact-bracket treatment ``percentile_sketch_audit``
    gives the median sketch, extended to the FULL approx-tier pipeline:
    both sketch estimates (the median AND the MAD of deviations about
    it) must land inside the exact [p45, p55] rank bracket of their own
    input — a 5% rank margin against ``approx_percentile``'s 0.1%
    rank-error guarantee, valid for ANY partitioning (Greenwald-Khanna
    merges preserve the bound), so only an estimator break trips it.

    A ``bound_violation`` row changes the row count -> the hash gate
    fails loudly; the DuckDB-reproducible content is the exact tier's
    per-type census (median, MAD, outlier count) computed ON the
    integer-cents grid: medians interpolate to exact .5s, deviation
    MADs to exact .25s, and the outlier cut ``adev > 3*1.4826*mad`` is
    the same IEEE double product on both engines over exactly-
    representable inputs, so no divide-then-round step exists to
    diverge (the percentile_sketch_audit lesson).

    Plan shape mirrors ``value_outliers_robust``: two grouped exact
    percentiles, each collapsing to a 5-row dimension broadcast back
    onto the fact — the sketch columns ride the SAME two aggregates, so
    the audit costs one extra pass over nothing.
    """
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        )
    )
    med = e.groupBy("event_type").agg(
        F.expr("percentile(v_c, 0.5)").alias("med_c"),
        F.expr("percentile(v_c, 0.45)").alias("med_lo"),
        F.expr("percentile(v_c, 0.55)").alias("med_hi"),
        F.expr("approx_percentile(v_c, 0.5, 1000)").alias("approx_med_c"),
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med_c", "med_lo", "med_hi", "approx_med_c",
        F.abs(F.col("v_c") - F.col("med_c")).alias("adev_c"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev_c, 0.5)").alias("mad_c"),
        F.expr("percentile(adev_c, 0.45)").alias("mad_lo"),
        F.expr("percentile(adev_c, 0.55)").alias("mad_hi"),
        F.expr("approx_percentile(adev_c, 0.5, 1000)").alias("approx_mad_c"),
    )
    census = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med_c").alias("med_cents"),
            F.any_value("mad_c").alias("mad_cents"),
            F.count("*").alias("n_events"),
            F.count_if(
                F.col("adev_c") > 3 * 1.4826 * F.col("mad_c")
            ).alias("n_outliers"),
            F.any_value("approx_med_c").alias("approx_med_c"),
            F.any_value("med_lo").alias("med_lo"),
            F.any_value("med_hi").alias("med_hi"),
            F.any_value("approx_mad_c").alias("approx_mad_c"),
            F.any_value("mad_lo").alias("mad_lo"),
            F.any_value("mad_hi").alias("mad_hi"),
        )
    )
    out_cols = ["event_type", "med_cents", "mad_cents", "n_events", "n_outliers"]
    violations = census.filter(
        (F.col("approx_med_c") < F.col("med_lo"))
        | (F.col("approx_med_c") > F.col("med_hi"))
        | (F.col("approx_mad_c") < F.col("mad_lo"))
        | (F.col("approx_mad_c") > F.col("mad_hi"))
    ).select(F.lit("bound_violation").alias("kind"), *out_cols)
    content = census.select(F.lit("stats").alias("kind"), *out_cols)
    return violations.unionAll(content)


@register(
    "percentile_sketch_audit",
    oracle="""
    SELECT 'exact_p50' AS kind, event_type,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)
               AS exact_p50_cents
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def percentile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gradable audit for the ``approx_percentile`` tier
    (``value_outliers_approx``'s estimator): the sketch median must land
    inside the exact rank bracket [p45, p55] — a 5% rank margin against
    the sketch's 0.1% rank-error guarantee at accuracy 1000, so only a
    genuine estimator break can trip it, never designed error.  The
    guarantee holds for ANY partitioning (Greenwald-Khanna merges keep
    the rank bound even though the point estimate itself is
    partitioning-sensitive — exactly why the base query is rows-only
    and this bound IS checkable).  A ``bound_violation`` row changes
    the row count and fails the hash gate; the per-type exact medians
    are the DuckDB-reproducible content, surfaced ON the integer-cents
    grid (interpolated midpoints land on .5 cents — exactly
    representable, so no divide-then-round step exists to diverge: the
    sf0.01 nulled sweep caught ``round(3553.5/100, 2)`` splitting
    35.53/35.54 across engines on the 35.535 repr-vs-binary midpoint).
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per_type = e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_med"),
        F.expr("percentile(value, 0.45)").alias("lo"),
        F.expr("percentile(value, 0.55)").alias("hi"),
        F.expr(
            "percentile(cast(round(value * 100) as bigint), 0.5)"
        ).alias("exact_p50_cents"),
    )
    violations = per_type.filter(
        (F.col("approx_med") < F.col("lo")) | (F.col("approx_med") > F.col("hi"))
    ).select(
        F.lit("bound_violation").alias("kind"), "event_type", "exact_p50_cents"
    )
    content = per_type.select(
        F.lit("exact_p50").alias("kind"), "event_type", "exact_p50_cents"
    )
    return violations.unionAll(content)


@register(
    "market_basket_rules",
    oracle="""
    WITH b AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand IS NOT NULL
    ), n AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM b
    ), marg AS (
        SELECT p_brand, count(*) AS c FROM b GROUP BY p_brand
    ), pairs AS (
        SELECT a.p_brand AS x, c.p_brand AS y, count(*) AS c_ab
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.p_brand < c.p_brand
        GROUP BY a.p_brand, c.p_brand
    ), rules AS (
        SELECT x AS antecedent, y AS consequent, c_ab FROM pairs
        UNION ALL
        SELECT y AS antecedent, x AS consequent, c_ab FROM pairs
    )
    SELECT r.antecedent, r.consequent, r.c_ab AS n_both,
           floor(r.c_ab * 1000000.0 / n.n_orders + 0.5) / 1000000.0
               AS support,
           floor(r.c_ab * 1000000.0 / ma.c + 0.5) / 1000000.0
               AS confidence,
           floor((CAST(n.n_orders AS DOUBLE) * CAST(r.c_ab AS DOUBLE))
                 / (CAST(ma.c AS DOUBLE) * CAST(mc.c AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS lift
    FROM rules r
    JOIN marg ma ON ma.p_brand = r.antecedent
    JOIN marg mc ON mc.p_brand = r.consequent
    CROSS JOIN n
    WHERE 50 * r.c_ab >= n.n_orders
    """,
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-order brand baskets — the
    confidence/lift stage downstream of frequent-itemset mining
    (``frequent_event_itemsets`` finds the sets; this scores the
    directed rules a recommender or fraud-collusion screen consumes).

    Support cut is EXACT integer arithmetic (``50·c_ab ≥ n`` ⇔
    support ≥ 2 %); confidence and lift divide exact counts in one
    IEEE-double op sequence shared with the oracle, then round via the
    floor(x·1e6+0.5) recipe.  NULL brands (nulled sweep) are excluded
    from baskets on both sides.

    Scale: baskets are (order, brand) pairs — bounded by ~25 brands per
    order; the pair self-join shuffles on l_orderkey once and the
    brand-pair aggregate is domain-bounded (≤ |brands|²/2 cells).
    Brand marginals and the 1-row total ride broadcasts; nothing here
    is corpus-sized after the first distinct.
    """
    from ..operators.cache import tracked_persist

    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isNotNull()
    )
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    baskets = tracked_persist(baskets)
    n = baskets.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    marg = baskets.groupBy("p_brand").agg(F.count("*").alias("c"))
    a, c = baskets.alias("a"), baskets.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.p_brand") < F.col("c.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("x"), F.col("c.p_brand").alias("y")
        )
        .agg(F.count("*").alias("c_ab"))
    )
    rules = pairs.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"), "c_ab"
    ).unionByName(
        pairs.select(
            F.col("y").alias("antecedent"),
            F.col("x").alias("consequent"),
            "c_ab",
        )
    )

    ma = marg.select(
        F.col("p_brand").alias("antecedent"), F.col("c").alias("c_a")
    )
    mc = marg.select(
        F.col("p_brand").alias("consequent"), F.col("c").alias("c_c")
    )
    # each rounded column repeats the oracle's exact IEEE op ORDER
    # ((count · 1e6) / denom, then +0.5/floor/÷1e6) — a mathematically
    # equal but differently-associated sequence can differ in the last
    # ulp and flip the floor
    support = (
        F.floor(
            F.col("c_ab") * F.lit(1000000.0) / F.col("n_orders") + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    confidence = (
        F.floor(
            F.col("c_ab") * F.lit(1000000.0) / F.col("c_a") + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    lift = (
        F.floor(
            F.col("n_orders").cast("double")
            * F.col("c_ab").cast("double")
            / (F.col("c_a").cast("double") * F.col("c_c").cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    return (
        rules.join(F.broadcast(ma), "antecedent")
        .join(F.broadcast(mc), "consequent")
        .crossJoin(F.broadcast(n))
        .filter(F.lit(50) * F.col("c_ab") >= F.col("n_orders"))
        .select(
            "antecedent",
            "consequent",
            F.col("c_ab").alias("n_both"),
            support.alias("support"),
            confidence.alias("confidence"),
            lift.alias("lift"),
        )
    )
