"""Synthetic transaction generator (SURVEY.md S4 + F15-F18).

The reference's producer (FD/producer.py:52-134) builds one random
transaction dict every 2 s in a Python loop.  Here the same record
distribution is declared as column expressions over either:

- ``spark.range(n)``            (batch: deterministic given a seed), or
- the ``rate`` streaming source (streaming: 0.5 rows/s reproduces the
  reference cadence; crank ``rowsPerSecond`` for load tests).

Everything is JVM-side ``rand(seed)`` / arithmetic — generating 10^9
rows/day of synthetic load is a narrow map with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import gated_mutation, tagged_id

ACCOUNT_TYPES = ["Savings", "Checking", "Business"]
DEVICES = ["Mobile", "Desktop", "ATM", "POS Terminal"]  # FD/producer.py:72
LOCATIONS = [f"LOC{i}" for i in range(1, 21)]
TXN_TYPES = ["Purchase", "Withdrawal", "Transfer", "Deposit"]
CURRENCIES = ["USD", "EUR", "GBP"]


def _choice(options: list[str], u: Column) -> Column:
    """Uniform pick via a [0,1) random column (F15 random.choice)."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.floor(u * len(options)) + 1).cast("int"))


def txn_columns(idx: Column, ts: Column, seed: int = 42) -> list[Column]:
    """The 15 wire-schema columns (FD/producer.py:57-77) as expressions.

    ``rand(seed + i)`` streams are independent per field; the fraud label
    alternates every other record (F17, FD/producer.py:20,81-93) and a 30%%
    "suspicious pattern" gate rewrites location/amount for fraud rows
    (F16, FD/producer.py:85-87).
    """
    r = [F.rand(seed + i) for i in range(10)]
    is_fraud = (idx % 2 == 0).cast("int")  # F17: every 2nd record
    amount = F.round(r[0] * 4990 + 10, 2)
    amount = F.when(
        (is_fraud == 1) & (r[8] > 0.7), F.round(r[9] * 2000 + 8000, 2)
    ).otherwise(amount)
    location = _choice(LOCATIONS, r[5])
    # F16: 30% of fraud rows get the suspicious-location marker
    location = F.when(is_fraud == 1, gated_mutation(location, r[8], F.lit("LOC99"), 0.3)
                      ).otherwise(location)
    return [
        F.unix_timestamp(ts).alias("time"),
        tagged_id("CUST", (F.floor(r[1] * 9000) + 1000).cast("long")).alias(
            "customer_id"
        ),
        tagged_id("TXN", (F.floor(r[2] * 900000) + 100000).cast("long") + idx).alias(
            "transaction_id"
        ),
        F.date_format(ts, "yyyy-MM-dd").alias("transaction_date"),
        F.date_format(ts, "HH:mm:ss").alias("transaction_time"),
        amount.alias("amount"),
        _choice(ACCOUNT_TYPES, r[3]).alias("account_type"),
        tagged_id("MERCH", (F.floor(r[4] * 900) + 100).cast("long")).alias(
            "merchant_id"
        ),
        F.round(r[6] * 99000 + 1000, 2).alias("account_balance"),
        _choice(DEVICES, r[7]).alias("transaction_device"),
        tagged_id("DEV", (F.floor(r[7] * 9000) + 1000).cast("long")).alias("device_id"),
        location.alias("location"),
        _choice(TXN_TYPES, r[2]).alias("transaction_type"),
        _choice(CURRENCIES, r[1]).alias("transaction_currency"),
        is_fraud.alias("is_fraud"),
    ]


def batch_transactions(spark: SparkSession, n: int, seed: int = 42,
                       partitions: int | None = None) -> DataFrame:
    """Deterministic batch of n synthetic transactions."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    ts = F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 2)  # 2 s cadence
    return base.select(*txn_columns(F.col("id"), ts, seed))


def stream_transactions(spark: SparkSession, rows_per_second: float = 0.5,
                        seed: int = 42) -> DataFrame:
    """Streaming generator on the ``rate`` source (T2: the reference's 2 s
    cadence at the default 0.5 rows/s).

    The rate source only accepts integer rows/s, so fractional rates run
    it at 1 row/s and keep every ``round(1/rate)``-th row — same average
    cadence, still a single narrow source (no state, no shuffle).
    """
    if rows_per_second >= 1:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(int(rows_per_second)))
            .load()
        )
    else:
        period = max(1, round(1.0 / rows_per_second))
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "1")
            .load()
            .filter(F.col("value") % period == 0)
        )
    return rate.select(*txn_columns(F.col("value"), F.col("timestamp"), seed))


def to_kafka_json(df: DataFrame) -> DataFrame:
    """S3 (FD/producer.py:14-17): serialize to the Kafka wire format —
    value = JSON of the whole record."""
    return df.select(
        F.col("transaction_id").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
