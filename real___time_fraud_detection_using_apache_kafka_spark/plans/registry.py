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
# Round-6 composition (executes the plan written mid-round-5 and
# confirmed by VERDICT.md r5 item 1): after the r5 gate the cumulative
# driver-graded set is 179 names; this head is
#   (a) the 7 oracle-able queries that have NEVER been driver-graded —
#       the round-5 batch-2/3 additions (frequent_event_itemsets was
#       rows-only until its round-5 oracle upgrade, so hash-grading it
#       is fresh signal),
#   (b) new round-6 queries (each a changed-or-new plan, ungraded until
#       the driver says otherwise — the q12 lesson).  NOTE (r7 ADVICE
#       correction): als_part_recommendations is STILL rows-only — the
#       oracled tier that resolved VERDICT r5 item 2 is
#       als_half_step_factors; the MLlib entry's r6 head slot was a
#       rows-only grade, not a hash grade,
#   (c) re-verification slots: first the four r1/r2 FAILURES fixed in
#       r3 (confusion_matrix, classification_metrics,
#       grouping_sets_orders, q12_shipping_lateness — their green is
#       the oldest *post-fix* signal in the catalog), then the 35
#       queries whose latest driver grade is r1/r2, oldest families
#       first.
# Everything rotated out stays in the catalog right after the head and
# is hash-green in an earlier driver round AND in every local
# full-catalog oracle run (tools/check_oracle.py).
_GRADED_FIRST = [
    # ROUND-7 head (executes the r6-close plan + VERDICT r6 item 1).
    # Every entry below passed all SIX adversarial variants this round
    # (nulled sf0.001 + sf0.01, ties, text, skew, ties+nulls combined)
    # before entering the head.
    # --- (a) round-7 NEW oracle-able queries (never driver-graded) ---
    "als_half_step_items",   # the Y-given-X half-step (VERDICT item 6)
    "hll_set_algebra",       # register union/intersection algebra
    # --- (b) round-7 CHANGED plans (re-grade: the q12 lesson) ---
    "purchase_attribution",   # now span-adaptive (auto picked per run)
    "als_half_step_factors",  # (32,12) sums + IEEE-double Cramer solve
    "hll_distinct_users",     # rho via shared hll_bucket_rank helper
    "hll_rollup_merge",       # same helper
    "bloom_semijoin_prune",   # build side tracked_persist'ed
    # --- (c) the 5 rotated-out r2 greens (first in line per r6 plan) ---
    "supplier_revenue_windows", "pivot_event_type_daily",
    "unpivot_order_stats", "rollup_region_nation",
    "corpus_upsert_refresh",
    # --- (d) oldest remaining grades: the r3 block (41 names; the 38
    #     that fit — month_spine_recursive, benford_first_digit and
    #     session_conversion_paths are first in line for round 8),
    #     VERDICT-named metrics/curve family first ---
    "fraud_patterns", "class_counts", "roc_auc", "log_loss",
    "psi_score_drift", "dashboard_snapshot", "fraud_time_heatmap",
    "priority_target_encoding", "value_outliers_robust",
    "rapid_repeat_purchases", "order_gini_concentration",
    "revenue_trend_regression", "cohort_retention",
    "q1_pricing_summary", "q2_min_cost_supplier", "q5_regional_revenue",
    "q9_product_profit", "q21_waiting_suppliers",
    "dedup_exact", "stats_moments_lineitem", "cube_status_priority",
    "topk_orders_per_customer", "variant_props_stats",
    "null_safe_join_status",
    "lang_id", "ngram_jaccard_neardup", "embedding_knn",
    "embedding_cosine_neardup", "tfidf_top_terms", "curate_documents",
    "pii_scrub_stats", "simhash_neardup_pairs",
    "asof_last_error_before_purchase", "user_sessions",
    "rolling_user_velocity", "error_retry_purchase_pattern",
    "event_transition_pmi", "scd2_user_state",
]

# ROUND-8 HEAD PLAN (written at round-7 close): after the r7 gate the
# never-driver-graded oracle-able set is grid_quantile_sketch,
# categorical_drift_audit and attribution_time_decay (added post-head
# this round, all six adversarial variants green each) — lead with
# them; then (a) any round-8 additions, (b) the 3 r3
# stragglers named above (month_spine_recursive, benford_first_digit,
# session_conversion_paths), (c) the r4 family, oldest first.  Keep
# the standing rule: every new query passes the SIX adversarial
# variants before entering the head.


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
