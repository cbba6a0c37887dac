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
# Round-11 composition (executes the r11 plan written during round 10,
# plus VERDICT r10 item 2 — the three never-driver-graded rows-only
# queries take head slots so union coverage reaches 223/223):
# (a) the two NEW r11 oracled audit twins, (b) every plan whose
# LINEAGE changed in r11 (the connected-components NULL-endpoint
# filter, the sampled LSH recall audit), (c) the two queries whose
# ORACLE text changed in r11 (the explicit [ \t\r\n\f\v]+ tokenizer
# class, ADVICE r10 — behavior-neutral on \v-free driver testdata,
# re-graded anyway per the changed-plan rule; doc_token_stats and
# bpe_token_stats carry the same TOKS constant and represent it),
# (d) the three never-driver-graded rows-only queries, (e) the two r5
# grades displaced from the r10 head, (f) the r6 family, alphabetical
# from agg_stats_orders — 36 of its 43 names fit; the remaining 7
# (rolling_7d_active_users .. user_rfm_segments) lead the r12 plan.
# After this gate every catalog query has at least one driver row and
# no oracled query's latest grade is older than r6.  Everything rotated
# out stays in the catalog right after the head and is hash-green in an
# earlier driver round AND in every local full-catalog oracle run
# (tools/check_oracle.py).
_GRADED_FIRST = [
    # --- (a) NEW r11 oracled audit twins (sweep-gated) ---
    "generator_profile_audit",   # VALUES-literal invariant audit (F15-F18)
    "value_outliers_audit",      # sketch-vs-exact rank brackets, cents grid
    "knn_ivf_recall_audit",      # IVF tier: exact top-5 content + score
                                 # fidelity + 0.3 recall floor
    # --- (b) r11 CHANGED lineage ---
    "embedding_lsh_recall_audit",   # deterministic id-sample cap (item 4)
    "neardup_clusters",             # CC NULL-endpoint filter (ADVICE r10)
    "embedding_neardup_clusters",   # ... same operator change
    # --- (c) r11 CHANGED oracle text (tokenizer class, ADVICE r10) ---
    "heavy_hitter_containment",
    "source_vocab_overlap",
    "doc_token_stats",
    "bpe_token_stats",
    # --- (d) never-driver-graded rows-only (VERDICT r10 item 2) ---
    "approx_event_sketches",     # functionally graded via sketch_accuracy_audit
    "generator_profile",         # functionally graded via generator_profile_audit
    "value_outliers_approx",     # functionally graded via value_outliers_audit
    # --- (e) the two r5 grades displaced from the r10 head ---
    "user_event_pivot", "weighted_reservoir_sample",
    # --- (f) r6 family, alphabetical (36 of 43 fit this head) ---
    "agg_stats_orders", "als_part_recommendations",
    "anti_join_customers_without_orders", "classification_metrics",
    "cms_heavy_hitters", "common_neighbors_capped", "confusion_matrix",
    "currency_roundtrip", "customer_order_analytics",
    "frequent_event_itemsets", "grouping_sets_orders",
    "holt_backtest_accuracy", "json_extract_props",
    "kalman_revenue_smooth", "latest_event_per_user",
    "mode_source_per_lang", "null_handling", "price_elasticity_by_brand",
    "projection_filter", "q10_returned_items", "q11_important_parts",
    "q12_shipping_lateness", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_revenue", "q20_promotion_suppliers",
    "q22_dormant_customers", "q3_shipping_priority", "q4_order_priority",
    "q6_forecast_revenue", "q7_volume_shipping",
    # (q8_market_share displaced to the r12 remainder by the late r11
    #  knn_ivf_recall_audit addition — new lineage outranks a refresh)
]

# ROUND-12 HEAD PLAN (written during round 11): lead with any round-12
# additions/changed plans, then the r6-family remainder
# (q8_market_share, rolling_7d_active_users, scalar_datetime_parts,
# scalar_string_funcs, semi_join_customers_with_orders, set_ops_nations,
# top_orders, user_rfm_segments), then the r7 family (43 names,
# alphabetical from als_half_step_factors).  Keep the standing rules: every new query
# passes the adversarial sweeps before entering the head, and changed
# plans — rows-only included — are ungraded until the driver says
# otherwise.


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
