"""Z-order (Morton-curve) write layout for multi-dimensional data
skipping — the Delta ``OPTIMIZE ZORDER BY`` primitive, built from plain
column expressions.

Why it matters at 100 TB: parquet skipping works off per-file (and
per-row-group) min/max stats.  Sorting by ONE column makes that column's
ranges tight and every other column's ranges full-width — a filter on a
second column scans the whole table.  Interleaving the bits of several
rank-normalized columns into one sort key (the Morton/Z curve) makes
EVERY participating column's per-file range narrow (~N^(1/d) of the
domain per file for d dimensions), so selective filters on ANY of them
prune most files before opening.

Everything is JVM-side expression code (shift/mask/or unrolled per bit —
whole-stage-codegen friendly, no UDFs); the only non-distributed step is
one tiny min/max agg per z-column to rank-normalize (at 100 TB: reuse
catalog/file-footer stats or pass known domains via ``domains=``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(norm_cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already 0..2^bits-1
    normalized) column into one Morton key: column j contributes bit i
    to output bit ``i * n + j``."""
    n = len(norm_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(norm_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale [lo, hi] to the integer grid [0, 2^bits); constant columns
    map to 0."""
    span = (hi - lo) or 1.0
    cells = (1 << bits) - 1
    scaled = ((col.cast("double") - F.lit(lo)) / F.lit(span)) * cells
    return F.least(
        F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)),
        F.lit(cells),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    n_files: int,
    bits: int = 16,
    domains: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``zcols``.

    ``repartitionByRange`` on the Morton key gives each file a disjoint
    key range (range exchange = one shuffle, sampled boundaries — the
    same mechanism as a global sort but only boundary-deep), and the
    within-file sort tightens row-group stats.  ``domains`` supplies
    known column ranges; absent ones are measured with one aggregate.
    """
    need = [c for c in zcols if c not in (domains or {})]
    measured: dict[str, tuple[float, float]] = dict(domains or {})
    if need:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in need],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in need],
        ).collect()[0]
        for c in need:
            measured[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    norm = [
        _normalize(F.col(c), measured[c][0], measured[c][1], bits)
        for c in zcols
    ]
    keyed = df.withColumn("_z", zorder_key(norm, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skipping_fraction(
    spark, path: str, col: str, lo: float, hi: float
) -> float:
    """Fraction of the layout's files a ``col BETWEEN lo AND hi`` scan
    can SKIP from per-file min/max stats alone (1.0 = skips everything).

    Test/diagnostic helper: reads each file's one-row min/max — the same
    decision parquet row-group skipping and format-level file pruning
    make from footer stats.
    """
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    skipped = 0
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min(col).alias("mn"), F.max(col).alias("mx")
        ).collect()[0]
        if r["mx"] < lo or r["mn"] > hi:
            skipped += 1
    return skipped / max(len(files), 1)
