"""Relational operators (SURVEY.md §2.2 projections/filters, §2.3 dedup,
§2.4 joins, §2.7 set ops).

Nearly everything here is a thin, documented composition of DataFrame
primitives — which is the point: express the logical plan declaratively
and Catalyst supplies pushdown, pruning, join selection, and AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


def salted_skew_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                     salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join that survives pathological key skew: the left (skewed)
    side gets a random salt in [0, salt), the right side is replicated
    ``salt`` times, and the join runs on (keys..., salt) — a hot key's
    rows spread over ``salt`` reducers instead of melting one.

    AQE's skew-join split (enabled in session.py) handles MOST skew by
    splitting oversized partitions at runtime; this explicit variant is
    for the residual case AQE can't fix — a single key too hot for any
    partition-level split (e.g. one user with 1% of a 100 TB stream) —
    at the cost of a ``salt``-times replication of the right side, so
    keep the right side the smaller one.

    Results are identical to ``left.join(right, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_skew_join supports inner/left joins")
    on = list(on)
    l_salted = left.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = l_salted.join(r_salted, [*on, "_salt"], how)
    return joined.drop("_salt")


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


def merge_latest(base: DataFrame, updates: DataFrame, keys: Sequence[str],
                 version_col: str, delete_col: str | None = None) -> DataFrame:
    """Latest-wins MERGE/upsert: apply ``updates`` onto ``base`` so each
    key keeps only its highest-``version_col`` row (update existing keys,
    insert new ones, and — when ``delete_col`` names a boolean tombstone
    column in ``updates`` — remove deleted keys entirely).

    The MERGE the reference never needed (its log sinks are append-only)
    but an incrementally-refreshed corpus does: re-crawled documents
    replace stale versions by doc_id.  Implemented as union →
    row_number over (key, version desc) → keep first — ONE shuffle on
    the key, no join, no driver state; at 100 TB both sides shard by the
    same key and AQE sizes the reducers.  Ties on version break toward
    the updates side so a same-version re-submit is idempotent.
    """
    keys = list(keys)
    tomb = delete_col or "_deleted"
    # base rows are never tombstones; updates carry the real flag (or a
    # constant False when the caller has no delete channel)
    b = base.withColumn(tomb, F.lit(False)).withColumn("_src", F.lit(0))
    u = updates if delete_col is not None else updates.withColumn(
        tomb, F.lit(False)
    )
    u = u.withColumn("_src", F.lit(1))
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    return (
        b.unionByName(u)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col(tomb)))
        .drop("_rn", "_src", tomb)
    )
