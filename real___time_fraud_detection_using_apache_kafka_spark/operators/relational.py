"""Relational operators (SURVEY.md §2.2 projections/filters, §2.3 dedup,
§2.4 joins, §2.7 set ops).

Nearly everything here is a thin, documented composition of DataFrame
primitives — which is the point: express the logical plan declaratively
and Catalyst supplies pushdown, pruning, join selection, and AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1 (FD/model.py:35-38): drop id/contact columns."""
    return df.drop(*cols)


def select_ordered(df: DataFrame, order: Sequence[str]) -> DataFrame:
    """P2 (FD/model.py:95): positional projection to a fixed column order."""
    return df.select(*order)


def with_default(col: Column, default) -> Column:
    """P10 (FD/consumer.py:37-38): ``.get(key, default)`` as coalesce."""
    return F.coalesce(col, F.lit(default))


def fill_nulls(df: DataFrame, value=0) -> DataFrame:
    """P8 (FD/model.py:49): ``fillna``."""
    return df.na.fill(value)


def drop_null_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """P9 (FD/evaluation.py:125,129): ``dropna(subset=...)``."""
    return df.na.drop(subset=list(subset))


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Dimension join with an explicit broadcast hint — at 100 TB the fact
    side must never shuffle for a small dim; AQE would usually choose this,
    the hint makes it a guarantee."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — no right-side columns, no duplication of left rows."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on, "left_anti")


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
