"""Named-query registry: the driver-facing catalog of every implemented
operator (SURVEY.md §2), each paired with DuckDB oracle SQL where the
semantics are ANSI-SQL-expressible.

Contract (``/root/repo/__spark_entry__.py``): the driver runs the Spark
callable and the oracle SQL side-by-side at sf0.01 and hash-compares
row sets with columns sorted by name — so every computed column is
aliased identically on both sides, and double-typed outputs are rounded
explicitly in BOTH plans so last-bit accumulation-order differences
can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _stable_types(fn: QueryFn) -> QueryFn:
    """Normalize hash-unstable output types as the final plan step.

    The driver hash-compares stringified values, so two cross-engine
    formatting hazards are neutralized here (with the mirror rewrite
    applied to the oracle SQL in :func:`oracle_sql`):

    - DECIMAL -> DOUBLE: a ``Decimal`` and a ``float`` of the *same
      exact value* format differently (``1251869314.00`` vs
      ``1251869314.0``).  Queries accumulate in DECIMAL for
      order-independence, then surface DOUBLE.
    - DOUBLE/FLOAT ``+ 0.0``: IEEE negative zero.  A value like -1e-17
      rounds to ``-0.0`` on one engine and ``0.0`` on the other
      depending on accumulation order; ``x + 0.0`` is the identity for
      every double EXCEPT -0.0 (which folds to +0.0), so adding it on
      BOTH sides erases the whole divergence class without touching any
      real value (first seen in event_transition_pmi at sf0.001).
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import DecimalType, DoubleType, FloatType

        from ..operators.cache import release_tracked

        # One cache-lifecycle policy (VERDICT r4 item 3): building a
        # catalog query releases the PREVIOUS query's operator-internal
        # tracked persists, so a long-lived build→collect→build loop
        # (the driver, bench.py) caches at most one query's state.
        release_tracked(spark)
        df = fn(spark, sf_dir)
        if any(
            isinstance(f.dataType, (DecimalType, DoubleType, FloatType))
            for f in df.schema.fields
        ):
            def fix(f):
                if isinstance(f.dataType, DecimalType):
                    return (F.col(f.name).cast("double") + F.lit(0.0)).alias(f.name)
                if isinstance(f.dataType, (DoubleType, FloatType)):
                    return (
                        F.col(f.name).cast("double") + F.lit(0.0)
                    ).alias(f.name)
                return F.col(f.name)

            df = df.select(*[fix(f) for f in df.schema.fields])
        return df

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


# The driver's correctness gate checks the FIRST 50 catalog entries, so
# the head is COMPOSED each round, not left to registration order.
# Round-9 composition (executes VERDICT r8 item 3 — the rotation plan
# written during round 8): after the r8 gate the cumulative driver-
# graded set is 209 of 218 names (the 9 never-graded are all
# rows-only-by-necessity); this head is (a) the round-9 changed plans,
# (b) the 16 oracled queries whose latest grade is r4, (c) the oldest
# 29 of the 47-query r5 family.  After this gate no oracled query's
# latest driver grade is older than r5.
# Everything rotated out stays in the catalog right after the head and
# is hash-green in an earlier driver round AND in every local
# full-catalog oracle run (tools/check_oracle.py).
_GRADED_FIRST = [
    # ROUND-9 head (executes the r9 plan written during round 8, with
    # round-9 changed plans prepended per the standing q12 lesson:
    # a changed lineage is ungraded until the driver says otherwise).
    # --- (a) round-9 CHANGED oracled plans ---
    "rfm_segmentation",      # r9 monotone frequency-cap bucket (ADVICE r8)
    "neardup_clusters",      # r9 pointer-jumping in connected_components
    "session_bounce_stats",  # r9 shared bounce_report rollup (streaming twin)
    "tfidf_top_terms",       # r9 volume-scaled explode width
    "bm25_top_terms",        # r9 volume-scaled explode width
    "ngram_jaccard_neardup",  # r9 volume-scaled shingle width
    "curate_documents",       # r9 volume-scaled shingle width
    "minhash_est_error",      # r9 volume-scaled shingle width
    # --- (b) the r4 family: every query whose latest driver grade is
    #     r4 (16 oracled; minhash_neardup is rows-only and rides the
    #     catalog tail) ---
    "multimodal_decode_meta", "order_value_percentiles",
    "pack_training_sequences", "per_class_report", "pr_curve_threshold",
    "pr_threshold_binned", "profile_orders_columns", "purchase_funnel",
    "sample_documents_stratified", "sample_per_group",
    "scalar_date_arithmetic", "shuffle_training_order",
    "simhash_fingerprints", "tumbling_event_windows", "unigram_logprob",
    "wire_formats_roundtrip",
    # --- (c) the r5 family, alphabetical (first 26 of 47; the rest
    #     lead the r10 rotation) ---
    "ab_test_zstat", "adamic_adar_parts", "autocorr_daily_revenue",
    "bigram_collocations_pmi", "chi2_priority_status",
    "common_neighbors_parts", "copurchase_degree_stats",
    "copurchase_khop_reach", "copurchase_lift", "copurchase_triangles",
    "cume_dist_order_values", "cusum_changepoint", "daily_anomaly_zscore",
    "ewma_user_value", "fuzzy_vocab_correction", "gini_customer_revenue",
    "grouping_sets_revenue", "holt_revenue_forecast",
    "inter_purchase_gaps", "interval_union_coverage",
    "kmv_distinct_users", "knn_graph", "label_centroid_similarity",
    "lead_lag_revenue_delta", "linreg_daily_revenue", "mad_outlier_orders",
]

# ROUND-10 HEAD PLAN (written during round 9): lead with any round-10
# additions/changed plans, then the r5-family remainder, alphabetical
# (minhash_signatures, mktsegment_hhi, order_value_equidepth_hist,
# orders_trimmed_stats, part_copurchase_pagerank,
# part_copurchase_pagerank_copart, part_revenue_abc,
# priority_metrics_unpivot, purchase_streaks, quality_weighted_sample,
# revenue_time_rollup, session_survival_km, skyline_orders,
# source_lang_entropy, source_vocab_overlap, spearman_corr_value_qty,
# theil_sen_revenue_trend, user_event_pivot, user_growth_curve,
# weighted_reservoir_sample, wow_revenue_growth — the 21 r5 hash grades
# not refreshed in r9), then the r6 family oldest-first.  Keep the
# standing rule: every new query passes the adversarial sweeps before
# entering the head.


def _ordered() -> list[str]:
    listed = [n for n in _GRADED_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(listed)]
    return listed + rest


def queries() -> dict[str, QueryFn]:
    return {name: _stable_types(QUERIES[name].fn) for name in _ordered()}


_ORACLE_TYPE_SF = "/root/testdata/sf0.001"
_TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _stable_oracle(sql: str) -> str:
    """Wrap oracle SQL so its output types are hash-stable vs Spark.

    DuckDB's ``sum(INTEGER)`` yields HUGEINT (int128), which pandas/arrow
    fetch paths surface as float64/decimal128 — stringifying as ``2612.0``
    against Spark's bigint ``2612``.  DECIMAL columns mirror the Spark-side
    double cast (see :func:`_stable_types`).  Column types are introspected
    with ``DESCRIBE`` (plans without executing) against the smallest
    testdata; on any failure the SQL is returned unchanged.
    """
    try:
        import duckdb

        con = duckdb.connect()
        for t in _TESTDATA_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{_ORACLE_TYPE_SF}/{t}.parquet')"
            )
        desc = con.sql("DESCRIBE " + sql).fetchall()
        casts = []
        for name, typ, *_ in desc:
            q = '"' + name.replace('"', '""') + '"'
            if typ.startswith("DECIMAL"):
                # + 0.0 mirrors the Spark-side IEEE -0.0 normalization
                casts.append(f"(CAST({q} AS DOUBLE) + 0.0) AS {q}")
            elif typ in ("DOUBLE", "FLOAT", "REAL"):
                casts.append(f"(CAST({q} AS DOUBLE) + 0.0) AS {q}")
            elif typ in ("HUGEINT", "UHUGEINT", "INTEGER", "SMALLINT", "TINYINT",
                         "UINTEGER", "USMALLINT", "UTINYINT", "UBIGINT"):
                casts.append(f"CAST({q} AS BIGINT) AS {q}")
        if not casts:
            return sql
        replace = ", ".join(casts)
        return f"SELECT * REPLACE ({replace}) FROM (\n{sql}\n) _stable"
    except Exception:
        return sql


def oracle_sql() -> dict[str, str]:
    return {
        name: _stable_oracle(QUERIES[name].oracle)
        for name in _ordered()
        if QUERIES[name].oracle is not None
    }
