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
# Round-4 composition rule (VERDICT.md r3 item 1): maximize cumulative
# driver coverage — 86 of 140 names already recorded hash-true in
# r01/r02/r03, so this head is (a) the 43 never-driver-graded queries
# that have oracles, (b) q12_shipping_lateness (its round-2 hash fix was
# rotated out before the driver ever re-confirmed it), (c) minhash_neardup
# (rows-only probabilistic check — the one LLM-dedup family member with
# zero driver signal), and (d) the 5 queries whose plans or oracle SQL
# were REWRITTEN this round (scale-safe distributed-rank defaults in
# lift_gain_deciles / shuffle_training_order, bucketed prefix sum in
# ks_drift_stat, broadcast-total npos in pr_curve_threshold, null-text
# guard in corpus_segment_dedup) — same lesson as q12: a changed plan is
# ungraded until the driver says otherwise.  44/50 entries have never
# been driver-graded.  Everything rotated out stays in the catalog right
# after the head and is green in r3's driver gate and in every local
# full-catalog oracle run (tools/check_oracle.py, 140/140).
#
# Round-5 head plan (do NOT reshuffle mid-round-4 — the 23 queries ADDED
# during round 4 (graph census / BFS / time-series / KMV / fuzzy-join /
# pivot / unpivot / rollup / interval-union / weighted-reservoir ...)
# are local-oracle + nulled-sweep + vanilla green but deliberately NOT
# in this head; displacing the r3-item-1 never-graded set or the
# rewritten-plan confirmations would trade one coverage debt for
# another): compose round 5 from those 23 + the remaining never-graded
# tail, completing cumulative driver coverage of the whole catalog.
_GRADED_FIRST = [
    # round-2 fix needing driver confirmation + this round's rewrites
    "q12_shipping_lateness",
    "lift_gain_deciles", "ks_drift_stat", "shuffle_training_order",
    "pr_curve_threshold", "corpus_segment_dedup",
    # ML metric battery members never graded (incl. the streaming dual)
    "per_class_report", "pr_threshold_binned", "calibration_curve",
    # relational / scalar / semi-structured never graded
    "customer_order_digest", "bag_set_ops_nations",
    "fuzzy_category_recovery", "bool_agg_events", "scalar_date_arithmetic",
    "kv_map_roundtrip", "wire_formats_roundtrip",
    "log_parse_roundtrip", "log_line_filters",
    # text-analysis family never graded
    "doc_token_stats", "bpe_token_stats", "doc_quality", "doc_fingerprint",
    "simhash_fingerprints", "doc_repetition", "corpus_top_tokens",
    "unigram_logprob", "corpus_mix_report",
    # curation / sampling / packing never graded
    "sample_documents_stratified", "sample_per_group",
    "embedding_gated_curation", "benchmark_contamination",
    "pack_training_sequences", "doc_chunks_overlap",
    "mix_sources_token_budget", "dq_constraint_report",
    "profile_orders_columns",
    # embedding / multimodal never graded
    "embedding_array_stats", "embedding_quantize_stats",
    "embedding_salient_dims", "multimodal_binary", "multimodal_decode_meta",
    "blob_dedup_md5",
    # dedup clustering + the rows-only LSH tier
    "neardup_clusters", "minhash_neardup",
    # temporal / funnel / distribution never graded
    "tumbling_event_windows", "clicks_before_purchase", "purchase_funnel",
    "order_value_percentiles", "event_value_histogram",
    "daily_gapfill_forward",
]


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
