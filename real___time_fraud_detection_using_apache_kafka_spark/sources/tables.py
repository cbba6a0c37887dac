"""Parquet table loaders (scan S1-analog on the driver testdata).

Columnar parquet + declarative DataFrame reads give predicate pushdown and
column pruning for free: a query touching 2 of lineitem's 11 columns reads
2 column chunks, and a filter on ``l_shipdate`` prunes row groups via
parquet min/max stats.  At 100 TB the same code path applies unchanged —
partition pruning and pushed filters show up in ``.explain`` as
``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (app_id, sf_dir, table) -> DataFrame.  spark.read.parquet runs one
# schema-inference job per call (footer reads), so every catalog query
# paid one job per table it touched; the driver testdata is immutable,
# so the lazy frame is reusable for the life of the SparkContext.
# ONLY /root/testdata paths are memoized: tool-generated tmp dirs can
# be overwritten in place, and a memoized frame would serve the stale
# file listing its relation cached.
# Keys carry the applicationId so a RESTARTED context never serves a
# frame bound to a dead one, and the whole memo is dropped the moment a
# new applicationId is observed (ADVICE r9): frames hold py4j
# references into their originating JVM-side session, so entries for
# stopped contexts would otherwise accumulate across context restarts
# in one process (pytest sessions spanning several SparkSessions).
# _STATS_MEMO below is exempt — it stores plain ints keyed by path, no
# session references, and is deliberately reusable across sessions.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}
_MEMO_APP_ID: list[str | None] = [None]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    memo_key = None
    if os.path.abspath(sf_dir).startswith("/root/testdata/"):
        app_id = spark.sparkContext.applicationId
        if app_id != _MEMO_APP_ID[0]:
            _TABLE_MEMO.clear()
            _MEMO_APP_ID[0] = app_id
        memo_key = (app_id, os.path.abspath(sf_dir), name)
        cached = _TABLE_MEMO.get(memo_key)
        if cached is not None:
            return cached
    df = _load_table_uncached(spark, sf_dir, name, path)
    if memo_key is not None:
        _TABLE_MEMO[memo_key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str,
                         path: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
        # rejects.  Read nanos as long (runtime conf, so it also works inside
        # a driver-created session) and truncate to microseconds with integer
        # division — float division would lose precision at ~1.7e18 ns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


# (sf_dir, table) -> (n_rows, embedding_dim | None); the testdata tables
# are immutable for a session, so the one planning job each ANN query
# used to pay (a count for LSH auto-sizing, a first() for the plane
# dimension, an isEmpty() guard before KMeans/PCA fits) is paid once per
# process and shared by the whole embedding family (r9, VERDICT r8
# item 5).  Keyed by path, not session — a new session over the same
# files reuses the numbers.
_STATS_MEMO: dict[tuple[str, str], tuple[int, int | None]] = {}


def corpus_stats(spark: SparkSession, sf_dir: str,
                 name: str = "embeddings",
                 vec_col: str | None = "embedding") -> tuple[int, int | None]:
    """Memoized (row_count, vector_dim) for a testdata table.

    One combined aggregate job on first use (count + first non-null
    vector size in a single pass); every later call — including from a
    DIFFERENT query in the same catalog run — is a dict hit.
    """
    key = (os.path.abspath(sf_dir), name)
    # same immutability rule as the table memo: tool-generated dirs can
    # be rewritten in place, so only driver testdata stats are reusable
    memoizable = key[0].startswith("/root/testdata/")
    if not memoizable or key not in _STATS_MEMO:
        df = load_table(spark, sf_dir, name)
        if vec_col is not None and vec_col in df.columns:
            # size(NULL) is -1 under the default legacy sizeOfNull, so a
            # bare first(size(...), ignorenulls) would never skip null
            # vectors — guard with WHEN so nulls genuinely pass through
            row = df.agg(
                F.count("*").alias("n"),
                F.first(
                    F.when(
                        F.col(vec_col).isNotNull(), F.size(vec_col)
                    ),
                    ignorenulls=True,
                ).alias("d"),
            ).first()
            stats = (int(row["n"]), row["d"])
        else:
            stats = (df.count(), None)
        if not memoizable:
            return stats
        _STATS_MEMO[key] = stats
    return _STATS_MEMO[key]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the testdata tables to ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
