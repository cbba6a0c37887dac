"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
DuckDB SQL on the same parquet tables; compares row count + order-
insensitive value multiset with columns sorted by name.  Doubles are
compared to 9 significant decimals after the queries' own explicit
rounding; timestamps are normalized to ISO strings.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from real___time_fraud_detection_using_apache_kafka_spark import plans
from real___time_fraud_detection_using_apache_kafka_spark.schemas import TESTDATA_TABLES
from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact shortest-roundtrip repr — the driver stringifies values, so
        # a 1-ULP accumulation difference fails there; fail here first.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(normalize(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = plans.queries()
    oracles = plans.oracle_sql()
    failures = []
    n_ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {t_spark:.1f}s)")
            if not srows:
                print(f"WARN  {name}: zero rows")
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t1
        sc, oc = canon(srows, scols), canon(orows, ocols)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures.append(name)
        elif sc != oc:
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            extra_s = [r for r in sc if r not in set(oc)][:3]
            extra_o = [r for r in oc if r not in set(sc)][:3]
            print(f"FAIL  {name}: {len(sc)} vs {len(oc)} rows; "
                  f"first diffs {diff or (extra_s, extra_o)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sc)} rows "
                  f"(spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
    print(f"\n{n_ran - len(failures)}/{n_ran} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
