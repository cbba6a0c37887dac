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
    """Portable polynomial hash, built via expr for lambda clarity.

    ``aggregate(sequence(1, length(s)), 0L, (h, i) -> (h*31 + ascii(substring(s, i, 1))) % MOD)``
    """
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
