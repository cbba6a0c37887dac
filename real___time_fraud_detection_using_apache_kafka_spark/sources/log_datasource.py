"""Pluggable Python DataSource for the reference's log-file "tables".

The reference persists its state as `=`-delimited multi-line text records
(FD/producer.py:96-115 writes them; FD/dashboard.py:15-25 and
FD/evaluation.py:60-89 re-parse them into DataFrames).  This module makes
that format a first-class Spark source via the PySpark 4 DataSource API:

    spark.dataSource.register(FraudLogDataSource)
    df = spark.read.format("fraudlog").load("/path/to/consumer.log")

Semantics mirror the reference parser (FD/evaluation.py:60-89): records
split on a run of >= 60 '=' chars (tolerating the reference's own 60-vs-68
delimiter drift, SURVEY.md §2.11-5), `key: value` lines parsed with keys
normalized ``lower().replace(' ', '_')``, currency values stripped of `$`.

Scale design: one InputPartition per file — the natural split for
append-only logs (a 100 TB log directory is many files; each reads
independently).  This Python reader is the *pluggable-connector* surface;
the hot path for log analytics remains the JVM text scan + regexp
extraction (`log_parse_roundtrip`), which this source intentionally does
not replace.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class WriterCommitMessage:  # type: ignore[no-redef]
        pass


DELIMITER_RE = re.compile(r"^={60,}\s*$", re.MULTILINE)
KV_RE = re.compile(r"^([^:\n]+):\s*(.*)$")

# Typed projection of the reference's consumer.log record
# (FD/consumer.py:134-154; old-format drift fields included, §2.11-2).
LOG_SCHEMA = (
    "transaction_id string, amount double, status string, "
    "actual_fraud_status string, fraud_probability double, "
    "fields map<string,string>, source_file string"
)


def parse_log_text(text: str) -> Iterator[dict[str, str]]:
    """Split a log file's text into per-record normalized key->value dicts
    (the reference's parse_log_entry, FD/evaluation.py:60-89, as a pure
    function)."""
    for chunk in DELIMITER_RE.split(text):
        fields: dict[str, str] = {}
        for line in chunk.splitlines():
            m = KV_RE.match(line.strip())
            if not m:
                continue
            key = m.group(1).strip().lower().replace(" ", "_")
            fields[key] = m.group(2).strip()
        if fields:
            yield fields


def _money(v: str | None) -> float | None:
    if v is None:
        return None
    try:
        return float(v.lstrip("$").replace(",", ""))
    except ValueError:
        return None


def _record_to_row(fields: dict[str, str], path: str) -> tuple:
    return (
        fields.get("transaction_id"),
        _money(fields.get("amount")),
        fields.get("status") or fields.get("fraud_status"),
        fields.get("actual_fraud_status"),
        _money(fields.get("fraud_probability")),
        fields,
        os.path.basename(path),
    )


class FraudLogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fraudlog source requires a path")

    def partitions(self):
        # one split per file: append-only logs scale by file count
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".log") or f.endswith(".txt")
            )
        else:
            files = [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition) -> Iterator[tuple]:
        path = partition.value
        with open(path, encoding="utf-8", errors="replace") as fh:
            text = fh.read()
        for fields in parse_log_text(text):
            yield _record_to_row(fields, path)


BYTES_DELIM_RE = re.compile(rb"^={60,}[ \t\r]*$", re.MULTILINE)


class FraudLogStreamReader(SimpleDataSourceStreamReader):
    """Tail-follow streaming reader for a reference-format log file — the
    structured replacement for the reference's poll-and-reparse dashboard
    loop (FD/dashboard.py:15-25 re-reads the WHOLE file every 2 s tick;
    this reader reads only the bytes appended since the last offset).

    Offsets are byte positions.  A batch consumes up to the last COMPLETE
    record delimiter so a half-written record (torn append) is never
    parsed; the remainder carries into the next micro-batch.  Offset
    arithmetic is on raw bytes — decoding happens after the cut, so
    multi-byte characters can't skew positions.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path or os.path.isdir(self.path):
            raise ValueError("fraudlog streaming requires a single log file path")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _consume(self, start_pos: int, end_pos: int | None) -> tuple[list[tuple], int]:
        size = os.path.getsize(self.path)
        limit = size if end_pos is None else min(end_pos, size)
        if limit <= start_pos:
            return [], start_pos
        with open(self.path, "rb") as fh:
            fh.seek(start_pos)
            raw = fh.read(limit - start_pos)
        if end_pos is None:
            # open-ended batch: stop at the last complete delimiter
            last = None
            for m in BYTES_DELIM_RE.finditer(raw):
                last = m
            if last is None:
                return [], start_pos
            raw = raw[: last.end()]
        text = raw.decode("utf-8", errors="replace")
        rows = [_record_to_row(f, self.path) for f in parse_log_text(text)]
        return rows, start_pos + len(raw)

    def read(self, start: dict):
        rows, next_pos = self._consume(int(start["pos"]), None)
        return iter(rows), {"pos": next_pos}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: both endpoints are committed,
        # so the byte range is exact — no delimiter search needed
        rows, _ = self._consume(int(start["pos"]), int(end["pos"]))
        return iter(rows)


# Render order + formatting mirror the reference's writer
# (FD/consumer.py:134-154): Title Case keys, $-prefixed 2-dp amounts,
# 4-dp probabilities.  The reader's key normalization inverts the casing,
# so write -> read round-trips the typed columns exactly.
_RENDER_FIELDS = (
    ("transaction_id", "Transaction ID", "{}"),
    ("amount", "Amount", "${:.2f}"),
    ("status", "Status", "{}"),
    ("actual_fraud_status", "Actual Fraud Status", "{}"),
    ("fraud_probability", "Fraud Probability", "{:.4f}"),
)


def render_log_record(d: dict) -> str:
    lines = ["=" * 68, "New Transaction Recorded:"]
    for col, title, fmt in _RENDER_FIELDS:
        v = d.get(col)
        if v is not None:
            lines.append(f"{title}: {fmt.format(v)}")
    return "\n".join(lines) + "\n"


class _LogCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str | None, final_path: str | None):
        self.tmp_path = tmp_path
        self.final_path = final_path


class FraudLogWriter(DataSourceWriter):
    """``df.write.format("fraudlog").save(dir)`` — the reference's append
    text-log sink (S5, FD/producer.py:96-115) as a proper DataSource
    writer with a two-phase commit: each task streams its partition into a
    hidden ``.inprogress`` file, and only the driver-side ``commit()``
    renames completed files into place — a failed/speculative task leaves
    nothing visible, ``abort()`` removes the temporaries.  One file per
    non-empty partition (uuid-suffixed, so ``append`` mode never
    collides); ``overwrite`` clears prior part files inside ``commit()``,
    after every task has succeeded."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fraudlog writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _LogCommit:
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.log"
        tmp = os.path.join(self.path, f".{name}.inprogress")
        fh = None
        try:
            for row in iterator:
                if fh is None:  # lazily: empty partitions emit no file
                    fh = open(tmp, "w", encoding="utf-8")  # noqa: SIM115
                fh.write(render_log_record(row.asDict()))
        finally:
            if fh is not None:
                fh.close()
        if fh is None:
            return _LogCommit(None, None)
        return _LogCommit(tmp, os.path.join(self.path, name))

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".log"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            if m is not None and m.tmp_path:
                os.rename(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class FraudLogDataSource(DataSource):
    """``spark.read.format("fraudlog").load(path)`` (batch),
    ``spark.readStream.format("fraudlog").load(path)`` (tail-follow
    micro-batches), and ``df.write.format("fraudlog").save(dir)``
    (two-phase-commit record sink) for reference-format logs."""

    @classmethod
    def name(cls) -> str:
        return "fraudlog"

    def schema(self) -> str:
        return LOG_SCHEMA

    def reader(self, schema) -> FraudLogReader:
        return FraudLogReader(self.options)

    def simpleStreamReader(self, schema) -> FraudLogStreamReader:
        return FraudLogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> FraudLogWriter:
        return FraudLogWriter(self.options, overwrite)
