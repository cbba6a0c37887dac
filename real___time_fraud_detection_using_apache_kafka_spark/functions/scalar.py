"""Scalar expression library (SURVEY.md §2.8: F1-F21).

Every function here returns a ``Column`` built from JVM-side built-ins —
no Python UDFs — so each stays inside whole-stage codegen and costs the
same as hand-written SQL at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_txn_timestamp(date_col: Column, time_col: Column) -> Column:
    """F1+F2 (FD/model.py:42): concat 'date' + ' ' + 'time' then parse."""
    return F.to_timestamp(F.concat_ws(" ", date_col, time_col), "yyyy-MM-dd HH:mm:ss")


def timestamp_parts(ts: Column) -> list[Column]:
    """F3/F4 (FD/model.py:53-58): decompose a timestamp into the 6 time
    features of the model's FEATURE_ORDER."""
    return [
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
        F.second(ts).alias("second"),
    ]


def epoch_to_parts(epoch_seconds: Column) -> list[Column]:
    """F4 (FD/producer.py:24,37-42): epoch seconds -> time-part features."""
    return timestamp_parts(F.timestamp_seconds(epoch_seconds))


def currency_format(amount: Column) -> Column:
    """F7 (FD/producer.py:103): ``$%.2f`` rendering.

    Null-preserving: Spark's ``format_string`` renders a null argument as
    the literal string "null" (Java Formatter behavior), yielding garbage
    like ``$nu`` that later crashes the lenient parse path; printf-of-null
    is null here (matching DuckDB/C printf semantics, and what a sink
    should emit for a missing amount)."""
    return F.when(
        amount.isNull(), F.lit(None).cast("string")
    ).otherwise(F.format_string("$%.2f", amount))


def currency_parse(s: Column) -> Column:
    """F8 (FD/evaluation.py:83-87): strip leading ``$`` and cast, nulling
    on failure like ``pd.to_numeric(errors='coerce')`` (F13).  Must be
    ``try_cast``: Spark 4 runs ANSI mode, where a plain cast of a
    malformed string THROWS mid-job instead of nulling — the lenient
    contract only holds with the try_ form."""
    return F.regexp_replace(s, r"^\$", "").try_cast("double")


def normalize_key(s: Column) -> Column:
    """F10 (FD/evaluation.py:68-69): ``trim().lower().replace(' ', '_')``."""
    return F.regexp_replace(F.lower(F.trim(s)), " ", "_")


def fraud_flag(status: Column) -> Column:
    """F11+F12 (FD/evaluation.py:73-74): case-insensitive 'FRAUD' -> 1/0."""
    return F.when(F.upper(status) == "FRAUD", F.lit(1)).otherwise(F.lit(0))


def pick_random(choices: list[str], seed_col: Column) -> Column:
    """F15 ``random.choice`` analog, seeded by a numeric column so results
    are reproducible across retries (unlike per-row ``rand()`` which
    changes under task re-execution)."""
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(arr, (F.pmod(seed_col, F.lit(len(choices))) + 1).cast("int"))


def gated_mutation(col: Column, gate: Column, replacement: Column, p: float) -> Column:
    """F16 (FD/producer.py:85-87): with probability ``p`` replace value."""
    return F.when(gate < F.lit(p), replacement).otherwise(col)


def tagged_id(prefix: str, n: Column) -> Column:
    """F18 (FD/producer.py:59-76): ``CUST{n}`` / ``TXN{n}`` style ids."""
    return F.concat(F.lit(prefix), n.cast("string"))
