"""bucketed_global_rank / ntile_from_rank: the distributed exact-rank
machinery that replaced the global-sort windows in lift_gain_deciles and
shuffle_training_order (VERDICT r3 items 2-3).  Verified against the
single-partition window implementations they replaced."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
    bucketed_global_rank,
    ntile_from_rank,
    pr_curve_best_threshold,
    roc_auc,
)


def _random_df(spark, n=500, seed=11):
    rng = np.random.default_rng(seed)
    v = np.round(rng.random(n), 3)  # heavy ties at 3 decimals
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(v)], ["id", "v"]
    )


def test_bucketed_global_rank_matches_window_rank(spark):
    df = _random_df(spark)
    bucket = F.least(F.greatest(F.floor(F.col("v") * 16), F.lit(0)), F.lit(15))
    got = {
        r["id"]: r["rnk"]
        for r in bucketed_global_rank(
            df, bucket, [F.asc("v"), F.asc("id")], rank_col="rnk"
        ).collect()
    }
    want = {
        r["id"]: r["rnk"]
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_bucketed_global_rank_descending_order(spark):
    df = _random_df(spark, seed=13)
    # descending total order -> bucket must be monotone DESC in v
    bucket = F.least(
        F.greatest(F.floor((F.lit(1.0) - F.col("v")) * 16), F.lit(0)), F.lit(15)
    )
    got = {
        r["id"]: r["rnk"]
        for r in bucketed_global_rank(
            df, bucket, [F.desc("v"), F.asc("id")], rank_col="rnk"
        ).collect()
    }
    want = {
        r["id"]: r["rnk"]
        for r in df.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("id")))
        ).collect()
    }
    assert got == want


def test_bucketed_global_rank_total_rides_offsets_broadcast(spark):
    df = _random_df(spark, n=123)
    bucket = F.floor(F.col("v") * 4)
    out = bucketed_global_rank(
        df, bucket, [F.asc("v"), F.asc("id")], rank_col="rnk", total_col="n"
    )
    rows = out.collect()
    assert all(r["n"] == 123 for r in rows)
    assert sorted(r["rnk"] for r in rows) == list(range(1, 124))
    # the total rides the offsets broadcast — never a crossJoin of a
    # second aggregate subtree or a nested-loop join
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


@pytest.mark.parametrize("n", [7, 10, 40, 97, 1000])
def test_ntile_from_rank_matches_sql_ntile(spark, n):
    """Closed-form ntile == Spark's ntile window for remainder and
    degenerate (n < tiles) cases alike."""
    df = spark.range(n).select(F.col("id").alias("v"))
    want = {
        r["v"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(10).over(Window.orderBy("v"))
        ).collect()
    }
    got = {
        r["v"]: r["t"]
        for r in df.select(
            "v",
            ntile_from_rank((F.col("v") + 1).cast("long"), F.lit(n), 10).alias("t"),
        ).collect()
    }
    assert got == want


def test_rfm_bucketed_default_matches_entity_ntile(spark, sf_dir):
    """user_rfm_segments now DEFAULTS to the distributed-rank tier
    (bucketed_global_rank + ntile_from_rank, VERDICT r4 item 7); the
    entity-table ntile formulation — which the DuckDB oracle still
    states — is reproduced here as the reference, and the quartile
    features must match bit-for-bit, so the tier swap never changes
    feature values."""
    from pyspark.sql import Window

    from real___time_fraud_detection_using_apache_kafka_spark.operators.cache import (
        release_tracked,
    )
    from real___time_fraud_detection_using_apache_kafka_spark.plans import QUERIES

    got = {
        r["user_id"]: (r["r_score"], r["f_score"], r["m_score"])
        for r in QUERIES["user_rfm_segments"].fn(spark, sf_dir).collect()
    }
    release_tracked(spark)

    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    want = {
        row["user_id"]: (row["r_score"], row["f_score"], row["m_score"])
        for row in e.select(
            "user_id",
            F.ntile(4)
            .over(Window.orderBy(F.desc("last_ts"), F.asc("user_id")))
            .alias("r_score"),
            F.ntile(4)
            .over(
                Window.orderBy(
                    F.least(F.col("frequency"), F.lit(255)).asc(),
                    F.pmod(F.col("user_id"), F.lit(16)).asc(),
                    F.asc("frequency"),
                    F.asc("user_id"),
                )
            )
            .alias("f_score"),
            F.ntile(4)
            .over(
                Window.orderBy(
                    F.least(
                        F.greatest(
                            F.floor(
                                F.coalesce(F.col("monetary"), F.lit(0.0)) / 100
                            ),
                            F.lit(0),
                        ),
                        F.lit(255),
                    ).asc(),
                    F.pmod(F.col("user_id"), F.lit(16)).asc(),
                    F.coalesce(F.col("monetary"), F.lit(0.0)).asc(),
                    F.asc("user_id"),
                )
            )
            .alias("m_score"),
        ).collect()
    }
    assert got == want


def test_curve_metrics_release_their_cache(spark):
    """roc_auc / pr_curve_best_threshold must not leave anything in the
    cache manager — repeated metric calls in a long-lived scoring
    session must not accumulate cached partitions (the operators are
    deliberately persist-free; this pins that)."""
    rng = np.random.default_rng(5)
    y = (rng.random(300) < 0.3).astype(int)
    p = np.round(rng.random(300), 2)
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, p)], ["y", "p"]
    )
    spark.catalog.clearCache()
    roc_auc(df, F.col("y"), F.col("p")).collect()
    pr_curve_best_threshold(df, F.col("y"), F.col("p")).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.mark.parametrize("combine", ["min", "max"])
@pytest.mark.parametrize("descending", [False, True])
def test_exclusive_prefix_minmax_matches_window(spark, combine, descending):
    """The monoid-generalized prefix machinery (combine='min'/'max',
    added for skyline_orders) must agree with the single-partition
    window it replaces, including NULL for empty prefixes."""
    from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
        exclusive_prefix_sum,
    )

    rng = np.random.default_rng(29)
    vals = {round(float(p), 4): int(v) for p, v in
            zip(rng.random(400), rng.integers(-50, 50, 400))}
    df = spark.createDataFrame(list(vals.items()), ["p", "v"])
    got = exclusive_prefix_sum(
        df, "p", ["v"], descending=descending, combine=combine, n_buckets=16
    )
    order = F.col("p").desc() if descending else F.col("p").asc()
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    agg = F.min("v") if combine == "min" else F.max("v")
    exp = df.withColumn("e", agg.over(w))
    mism = (
        got.join(exp, ["p", "v"])
        .filter(~F.col("v_before").eqNullSafe(F.col("e")))
        .count()
    )
    assert mism == 0
    # the first row in order has an empty prefix -> NULL identity
    first = got.orderBy(F.col("p").desc() if descending else F.col("p").asc()).first()
    assert first["v_before"] is None


def test_exclusive_prefix_sum_rejects_unknown_combine(spark):
    from real___time_fraud_detection_using_apache_kafka_spark.operators.windows import (
        exclusive_prefix_sum,
    )

    df = spark.createDataFrame([(0.5, 1)], ["p", "v"])
    with pytest.raises(ValueError, match="combine"):
        exclusive_prefix_sum(df, "p", ["v"], combine="avg")
