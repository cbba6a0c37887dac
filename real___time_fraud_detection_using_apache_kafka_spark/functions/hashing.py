"""Deterministic, engine-portable hashing.

The near-dup operators (MinHash, SimHash, fingerprints) need a hash that
the DuckDB oracle can reproduce bit-for-bit.  Spark's ``xxhash64`` and
DuckDB's ``hash`` are different functions, so we define a polynomial
rolling hash over Unicode code points using only arithmetic both engines
share: ``h_{i+1} = (h_i * 31 + codepoint) mod 1_000_000_007``.

On the Spark side this is a higher-order-function expression (no Python
UDF): it runs inside codegen, vectorized per batch.  ``xxhash64`` remains
available via :func:`fast_token_hash` for Spark-only paths where oracle
parity is not needed (it is ~3x cheaper).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
MULT = 31

# Seeded affine permutations for MinHash: (a, b) pairs, h'(x) = (a*x + b) mod MOD.
# Constants are arbitrary-but-fixed odd multipliers (shared with the oracle SQL).
MINHASH_PERMS: list[tuple[int, int]] = [
    (1000003, 12345),
    (999983, 54321),
    (756839, 192837),
    (524287, 918273),
    (130021, 777777),
    (2147483587, 31337),
    (98765431, 2468),
    (22801763, 13579),
    (104729, 86420),
    (15485863, 97531),
    (32452843, 11111),
    (49979687, 22222),
    (67867967, 33333),
    (86028121, 44444),
    (122949823, 55555),
    (141650939, 66666),
]


def poly_hash_expr(col_sql: str) -> Column:
    """Portable polynomial hash over Unicode code points:
    ``h = (Σ_i cp_i · 31^(n-1-i)) mod 1_000_000_007`` — the Horner fold
    ``(h*31 + cp) % MOD`` in closed form, hash(NULL) = NULL,
    hash('') = 0.

    r11 (guide §1.2 "per-task work"): the original expression was an
    interpreted higher-order fold with a per-character
    ``substring(s, i, 1)`` — each call re-seeks the UTF-8 string from
    the front, so one hash costs O(len²) byte scans on top of the
    per-character lambda dispatch (HigherOrderFunction is
    CodegenFallback).  Hashing the 5k-document corpus this way
    dominated whole bench rows (mix_sources_token_budget 2.2 s).  Now a
    vectorized Arrow UDF: each batch's strings flatten into ONE
    code-point array (UTF-32 encode = exact code points, matching both
    engines' ``ascii``), terms ``cp·31^exp mod p`` vectorize across the
    whole batch, and per-string sums come from one ``add.reduceat`` —
    O(total_chars) with no per-character Python or JVM dispatch.
    Integer math throughout (int64 bounds: cp < 2^21, 31^k mod p < 2^30,
    per-term product < 2^51, segment sums < len·p), so the value is
    BIT-IDENTICAL to the old fold and to the DuckDB oracle's
    list_reduce — every oracled consumer re-verified by the full
    differential battery.
    """
    @F.pandas_udf("long")
    def _poly(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np  # noqa: PLC0415 — executor-side import

        pow_cache = [np.array([1], dtype=np.int64)]

        def powers(n: int):
            p = pow_cache[0]
            if len(p) < n:
                ext = np.empty(n, dtype=np.int64)
                ext[: len(p)] = p
                for k in range(len(p), n):
                    ext[k] = ext[k - 1] * MULT % MOD
                pow_cache[0] = ext
            return pow_cache[0]

        for s in it:
            vals = s.to_numpy(dtype=object)
            nulls = pd.isna(vals)
            strs = ["" if n else v for v, n in zip(vals, nulls)]
            lens = np.fromiter((len(v) for v in strs), dtype=np.int64,
                               count=len(strs))
            total = int(lens.sum())
            out = np.zeros(len(strs), dtype=np.int64)
            if total:
                codes = np.frombuffer(
                    "".join(strs).encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                ends = np.cumsum(lens)
                starts = ends - lens
                # exponent of 31 for global position j in string i is
                # (end_i - 1 - j): descending within each string
                exp = np.repeat(ends - 1, lens) - np.arange(total)
                pw = powers(int(lens.max()))
                terms = codes * pw[exp] % MOD
                nonempty = lens > 0
                seg = np.add.reduceat(terms, starts[nonempty]) % MOD
                out[nonempty] = seg
            res = pd.Series(out, dtype="object")
            res[nulls] = None
            yield res

    return _poly(F.expr(col_sql))


def poly_hash_fold_expr(col_sql: str) -> Column:
    """The same polynomial hash as :func:`poly_hash_expr`, as the
    original in-JVM interpreted fold.  Identical values; different cost
    profile: the fold is O(len²) per string but has ZERO per-batch
    Python round-trip, so for SHORT KEYS on small row counts (id-gated
    sampling: ~20-char keys, thousands of rows) it beats the Arrow UDF's
    ~0.1 s fixed worker cost (measured r11:
    sample_documents_stratified 0.097 s fold vs 0.209 s Arrow).  Use
    :func:`poly_hash_expr` for document text or token columns; use this
    for short per-row keys in sub-second queries."""
    return F.expr(
        f"aggregate(sequence(1, length({col_sql})), cast(0 as bigint), "
        f"(h, i) -> (h * {MULT} + ascii(substring({col_sql}, i, 1))) % {MOD})"
    )


def poly_hash_duckdb(col_sql: str) -> str:
    """The identical hash as DuckDB SQL (list_reduce over code points).

    Null-guarded: Spark's ``sequence(1, length(NULL))`` is NULL, so the
    Spark hash of a null string is NULL — but DuckDB's ``range(1, NULL)``
    is an EMPTY list, which would reduce to hash 0 and count as a real
    distinct fingerprint.  The CASE pins hash(NULL) = NULL on both."""
    return (
        f"CASE WHEN {col_sql} IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(cast(0 as bigint), "
        f"list_transform(range(1, length({col_sql}) + 1), "
        f"i -> cast(ascii({col_sql}[i]) as bigint))), "
        f"(h, c) -> (h * {MULT} + c) % {MOD}) END"
    )


def fast_token_hash(c: Column) -> Column:
    """Spark-only 64-bit hash (xxhash64) for hot paths without an oracle."""
    return F.xxhash64(c)
