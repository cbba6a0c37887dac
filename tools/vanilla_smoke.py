"""Run catalog queries under a VANILLA SparkSession — the driver's
environment, not the engine's tuned one (`session.get_spark`).

Catches config dependencies that engine-session tests mask: e.g. the
events table is parquet TIMESTAMP(NANOS), which only scans correctly
because `load_table` sets the read-side conf at runtime — a regression
there passes every engine-session test and still crashes the driver
(that exact failure produced round 2's bench rc=1).

Usage: python tools/vanilla_smoke.py [sf_dir] [n_queries]
Default: first 50 catalog entries (the correctness-gate sample) at
sf0.001.  Exit 0 iff every query executes and returns a schema + rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    failures = []
    ran = 0
    for i, (name, fn) in enumerate(qs.items()):
        if i >= n:
            break
        ran += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()
            _ = df.schema.simpleString()
            print(f"ok    {name}: {len(rows)} rows {time.time() - t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            failures.append(name)
    print(f"\n{ran - len(failures)}/{ran} ok under vanilla session")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
