"""Incrementally-maintained materialized aggregate views.

The reference recomputes its dashboard aggregates from a FULL log
re-parse every 2 s tick (FD/evaluation.py:97-116 — O(stream) per
refresh).  The engine's streaming counters already fix that online; this
module is the BATCH dual: a materialized aggregate table that a new
data delta updates in O(delta + view) work, never O(history), with the
view's visibility handled atomically by :class:`TxnTable`.

Design: the view stores MERGEABLE partial states (count / sum / min /
max — the same partial-aggregation contract Spark's own hash aggregate
uses map-side), keyed by the group columns.  A refresh partial-aggregates
only the delta, unions it with the current view, and combines states
with one hash aggregate on the group key — the exact merge Spark would
run between map and reduce, lifted across commits.  Derived measures
(avg = sum/count) materialize only at read time, so they are always
consistent with the merged states.

Non-mergeable aggregates (exact count_distinct, exact percentiles) are
deliberately unsupported: at 100 TB those become sketches (HLL,
t-digest — see queries_sketch.py), whose states ARE mergeable and slot
into the same refresh.

Replay safety: a refresh tagged with (app_id, batch_id) is skipped when
the view's commit ledger already covers it — the same exactly-once
contract as txn_batch_sink, so a crashed-and-replayed orchestrator
cannot double-count a delta.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txn_table import TxnTable

_MERGE = {
    "count": F.sum,   # counts combine by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


class IncrementalAggView:
    """A TxnTable-backed materialized ``GROUP BY`` view.

    ``measures`` maps output column -> (agg, source column), with agg in
    {'count', 'sum', 'min', 'max'}; ``('count', '*')`` counts rows.
    """

    def __init__(self, table: TxnTable, keys: Sequence[str],
                 measures: dict[str, tuple[str, str]]):
        for name, (agg, _src) in measures.items():
            if agg not in _MERGE:
                raise ValueError(
                    f"{name}: '{agg}' is not a mergeable state; use a "
                    "sketch column (HLL/t-digest) for distincts/percentiles"
                )
        self.table = table
        self.keys = list(keys)
        self.measures = dict(measures)

    # ----------------------------------------------------------- build --
    def _partial(self, delta: DataFrame) -> DataFrame:
        aggs = []
        for name, (agg, src) in self.measures.items():
            if agg == "count":
                aggs.append(F.count(F.lit(1) if src == "*" else F.col(src))
                            .alias(name))
            else:
                aggs.append(getattr(F, agg)(src).alias(name))
        return delta.groupBy(*self.keys).agg(*aggs)

    def _combine(self, states: DataFrame) -> DataFrame:
        aggs = [
            _MERGE[agg](name).alias(name)
            for name, (agg, _src) in self.measures.items()
        ]
        return states.groupBy(*self.keys).agg(*aggs)

    # --------------------------------------------------------- refresh --
    def refresh(self, spark: SparkSession, delta: DataFrame,
                app_id: str | None = None, batch_id: int | None = None) -> int:
        """Fold one delta into the view; returns the committed version
        (or the current version unchanged when (app_id, batch_id) was
        already applied — replay-safe).

        Cost: one hash aggregate over the delta, one over
        (view ∪ delta-partial) keyed on the group columns — O(delta +
        view), independent of total history.  The overwrite commit is
        atomic, so readers see the old or the new view, never a mix.
        """
        meta = None
        if app_id is not None and batch_id is not None:
            if batch_id <= self.table.last_batch(app_id):
                return self.table.versions()[-1]
            meta = {"app_id": app_id, "batch_id": batch_id}
        partial = self._partial(delta)
        if not self.table.versions():
            return self.table.overwrite(partial, meta)
        current = self.table.read(spark).select(partial.columns)
        merged = self._combine(current.unionByName(partial))
        return self.table.overwrite(merged, meta)

    # ------------------------------------------------------------ read --
    def read(self, spark: SparkSession, version: int | None = None,
             derived: dict[str, tuple[str, str]] | None = None) -> DataFrame:
        """Read the view (optionally time-traveled).  ``derived`` adds
        ratio measures at read time: out -> (numerator, denominator)."""
        df = self.table.read(spark, version)
        for name, (num, den) in (derived or {}).items():
            df = df.withColumn(name, F.col(num) / F.col(den))
        return df
