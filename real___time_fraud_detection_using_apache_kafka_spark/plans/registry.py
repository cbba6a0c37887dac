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
# Round-11 composition, FINAL (recomposed during the r11 OPTIMIZATION
# phase): the optimization rewrites changed the physical lineage of
# ~30 queries (vectorized portable hash -> every sampling/sketch
# consumer; token-hash shingles -> the near-dup family; cogrouped LSH;
# per-column profile aggregates; lazy BFS unions; session-wide cached-
# plan AQE + shuffled-hash-join prefs), and the standing rule is that
# CHANGED plans take head slots so the driver re-grades them.  Order:
# (a) changed-lineage ORACLED queries (r11-opt rewrites; source_vocab_
# overlap / heavy_hitter_containment also carry the build-phase ADVICE
# r10 tokenizer-class oracle change), (b) changed-lineage rows-only
# queries + the three never-driver-graded rows (VERDICT r10 item 2 —
# union coverage reaches 223/223 at this gate), (c) the three NEW r11
# oracled audit twins (sweep-gated), (d) the two TOKS-constant
# representatives of the oracle-text change, (e) the r5 grade displaced
# from the r10 head, (f) r6 family, alphabetical — 11 fit; the
# remainder moves to the r12 plan below.  Everything rotated out stays
# in the catalog right after the head and is hash-green in an earlier
# driver round AND in every local full-catalog oracle run
# (tools/check_oracle.py — 9 full-catalog green runs this round:
# plain, nulled x2 SFs, tie, text, skew, vanilla, plus sf0.01 spots).
_GRADED_FIRST = [
    # --- (a) r11-opt CHANGED lineage, oracled ---
    "profile_orders_columns",       # per-column aggregates (no Expand)
    "mix_sources_token_budget",     # vectorized portable hash
    "ngram_jaccard_neardup",        # token-hash shingles
    "curate_documents",             # ... same shingle operator
    "neardup_clusters",             # shingles + CC NULL-endpoint (build)
    "embedding_neardup_clusters",   # cogrouped LSH + CC
    "minhash_est_error",            # shingles + vectorized hash
    "kmv_distinct_users",           # vectorized portable hash
    "simhash_fingerprints",         # portable token hash
    "simhash_neardup_pairs",        # portable token hash
    "sample_documents_stratified",  # vectorized portable hash
    "sample_per_group",             # vectorized portable hash
    "quality_weighted_sample",      # vectorized portable hash
    "weighted_reservoir_sample",    # vectorized portable hash (+ r5 slot)
    "stratified_kfold",             # vectorized portable hash
    "ab_test_zstat",                # vectorized portable hash
    "hll_distinct_users",           # mixed hash -> vectorized poly
    "hll_rollup_merge",
    "hll_set_algebra",
    "cms_heavy_hitters",
    "bloom_semijoin_prune",
    "sketch_accuracy_audit",        # HLL audit over the same mixer
    "source_vocab_overlap",         # vectorized hash + tokenizer oracle
    "heavy_hitter_containment",     # tokenizer-class oracle (ADVICE r10)
    "copurchase_khop_reach",        # lazy BFS visited union
    "embedding_lsh_recall_audit",   # cogrouped LSH + sampled cap (build)
    # --- (b) CHANGED lineage rows-only + never-driver-graded rows ---
    "embedding_lsh_neardup",        # cogrouped LSH rewrite
    "bpe_merge_table",              # linear greedy rewrite
    "minhash_neardup",              # token-hash shingles
    "curate_documents_lsh",         # ... same
    "approx_event_sketches",        # HLL mixer lineage; first driver row
    "generator_profile",            # first driver row (VERDICT r10 item 2)
    "value_outliers_approx",        # first driver row (VERDICT r10 item 2)
    # --- (c) NEW r11 oracled audit twins (sweep-gated) ---
    "generator_profile_audit",   # VALUES-literal invariant audit (F15-F18)
    "value_outliers_audit",      # sketch-vs-exact rank brackets, cents grid
    "knn_ivf_recall_audit",      # IVF tier: exact top-5 content + score
                                 # fidelity + 0.3 recall floor
    # --- (d) TOKS-constant representatives (oracle-text change) ---
    "doc_token_stats",
    "bpe_token_stats",
    # --- (e) r5 grade displaced from the r10 head ---
    "user_event_pivot",
    # --- (f) r6 family, alphabetical (11 of 43 fit this head) ---
    "agg_stats_orders", "als_part_recommendations",
    "anti_join_customers_without_orders", "classification_metrics",
    "common_neighbors_capped", "confusion_matrix",
    "currency_roundtrip", "customer_order_analytics",
    "frequent_event_itemsets", "grouping_sets_orders",
    "holt_backtest_accuracy",
]

# ROUND-12 HEAD PLAN (written during round 11): lead with any round-12
# additions/changed plans, then the r6-family remainder in alphabetical
# order (json_extract_props, kalman_revenue_smooth,
# latest_event_per_user, mode_source_per_lang, null_handling,
# price_elasticity_by_brand, projection_filter, q10_returned_items,
# q11_important_parts, q12_shipping_lateness, q13_customer_distribution,
# q14_promo_revenue, q15_top_supplier, q16_part_supplier_counts,
# q17_small_quantity_revenue, q18_large_volume_customers,
# q19_disjunctive_revenue, q20_promotion_suppliers, q22_dormant_customers,
# q3_shipping_priority, q4_order_priority, q6_forecast_revenue,
# q7_volume_shipping, q8_market_share, rolling_7d_active_users,
# scalar_datetime_parts, scalar_string_funcs,
# semi_join_customers_with_orders, set_ops_nations, top_orders,
# user_rfm_segments), then the r7 family (43 names, alphabetical from
# als_half_step_factors).  Keep the standing rules: every new query
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
