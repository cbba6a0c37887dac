"""Python UDTFs (table functions) — the one API family where a blob
genuinely expands into a variable number of structured rows.

The reference persists scored transactions as multi-line text records
separated by a row of ``=`` characters (written at FD/producer.py:96-115 /
FD/consumer.py:134-154, re-parsed at FD/evaluation.py:60-89 and
FD/dashboard.py:15-25).  The engine's hot path for log analytics is the
JVM-side regexp scan (``log_parse_roundtrip``) and the ``fraudlog``
Python DataSource for file dirs; this UDTF covers the third shape — a
log BLOB already sitting in a column (e.g. ingested from an archive
table), where one input row must yield N output rows with a schema.

UDTFs run in the Python worker (Arrow-batched input), so they belong off
the hot path — but unlike a scalar UDF returning an array-of-structs to
explode, a UDTF streams rows out without materializing the whole
expansion per input row, which is the right shape for multi-MB blobs.

Tolerates the reference's format drift (§2.11-2/5): any number of ``=``
in the delimiter line (>= 20), optional ``Actual Fraud Status`` line,
``$``-prefixed amounts.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_DELIM = re.compile(r"\n?={20,}\n?")


@udtf(returnType=(
    "record_no int, txn_id string, amount double, status string, "
    "actual_status string"
))
class ParseLogRecords:
    """One output row per ``=``-delimited log record in the input blob.

    ``key: value`` lines are parsed with the same normalization the
    reference applies (lower-case, spaces to underscores —
    FD/evaluation.py:68-69); unparseable amounts yield null (the lenient
    numeric cast F13), and records with no ``Transaction ID`` line are
    skipped exactly like the dashboard's chunk filter (P6,
    FD/dashboard.py:20-23).
    """

    def eval(self, blob: str):  # noqa: ANN001 - UDTF contract
        if not blob:
            return
        for i, rec in enumerate(
            r for r in _DELIM.split(blob) if r.strip()
        ):
            fields: dict[str, str] = {}
            for line in rec.splitlines():
                if ":" in line:
                    k, v = line.split(":", 1)
                    fields[k.strip().lower().replace(" ", "_")] = v.strip()
            if "transaction_id" not in fields:
                continue
            raw_amount = fields.get("amount", "").lstrip("$").replace(",", "")
            try:
                amount = float(raw_amount)
            except ValueError:
                amount = None
            yield (
                i,
                fields["transaction_id"],
                amount,
                fields.get("status"),
                fields.get("actual_fraud_status"),
            )


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL:
    ``SELECT r.* FROM blobs, LATERAL parse_log_records(blob) r``."""
    spark.udtf.register("parse_log_records", ParseLogRecords)
