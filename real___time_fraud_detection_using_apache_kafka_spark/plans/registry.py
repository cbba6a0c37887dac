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
    """Cast DECIMAL outputs to DOUBLE as the final plan step.

    The driver hash-compares stringified values, and a ``Decimal`` and a
    ``float`` of the *same exact value* can format differently
    (``1251869314.00`` vs ``1251869314.0``).  Queries accumulate in
    DECIMAL for order-independence, then surface DOUBLE; the oracle SQL
    gets the mirror cast in :func:`oracle_sql`, so both engines emit the
    identical IEEE double of the identical exact decimal.
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import DecimalType

        df = fn(spark, sf_dir)
        if any(isinstance(f.dataType, DecimalType) for f in df.schema.fields):
            df = df.select(
                *[
                    F.col(f.name).cast("double").alias(f.name)
                    if isinstance(f.dataType, DecimalType)
                    else F.col(f.name)
                    for f in df.schema.fields
                ]
            )
        return df

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _stable_types(spec.fn) for name, spec in QUERIES.items()}


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
                casts.append(f"CAST({q} AS DOUBLE) AS {q}")
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
        name: _stable_oracle(spec.oracle)
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
