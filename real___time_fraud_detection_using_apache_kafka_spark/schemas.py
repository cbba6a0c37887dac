"""Explicit schema contracts.

The reference kept its stream schema implicit (JSON dicts, defensive
``.get()`` — FD/consumer.py:37-38,82-93) and its ML schema positional
(``FEATURE_ORDER`` — FD/features.py:2-18).  Here both are explicit Spark
``StructType``s: the single biggest schema-drift failure mode of the
reference (SURVEY.md §2.11-1) cannot happen when the same StructType
drives serialization, deserialization, and the feature pipeline.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire schema of one synthetic transaction (FD/producer.py:57-77).
TXN_SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType()),            # epoch seconds
        T.StructField("customer_id", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("transaction_date", T.StringType()),
        T.StructField("transaction_time", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("account_type", T.StringType()),
        T.StructField("merchant_id", T.StringType()),
        T.StructField("account_balance", T.DoubleType()),
        T.StructField("transaction_device", T.StringType()),
        T.StructField("device_id", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("transaction_type", T.StringType()),
        T.StructField("transaction_currency", T.StringType()),
        T.StructField("is_fraud", T.IntegerType()),     # producer-side label
    ]
)

# Feature contract (FD/features.py:2-18): 9 derived/raw numeric features +
# 6 categorical features -> 15-wide model input.
FEATURE_ORDER = [
    "amount",
    "account_balance",
    "year",
    "month",
    "day",
    "hour",
    "minute",
    "second",
    "account_type",
    "transaction_device",
    "location",
    "transaction_type",
    "transaction_currency",
    "merchant_id",
    "device_id",
]

CATEGORICAL_FEATURES = [
    "account_type",
    "transaction_device",
    "location",
    "transaction_type",
    "transaction_currency",
    "merchant_id",
    "device_id",
]

NUMERIC_FEATURES = [f for f in FEATURE_ORDER if f not in CATEGORICAL_FEATURES]

# Documents table (TESTDATA.md) — also the landing-file schema for the
# incremental ingest stream (file sources require an explicit schema).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# Testdata tables (TESTDATA.md) available to every query.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
