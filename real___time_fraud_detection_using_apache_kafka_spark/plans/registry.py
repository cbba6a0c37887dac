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


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
