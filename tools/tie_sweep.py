"""Tie-injection differential sweep: the catalog's tie-break gate.

Builds a variant of the testdata with value columns quantized onto
coarse grids (money to $100 steps, quantities to 10s, discounts/taxes
to 0.1, event values to 10s, event timestamps to the HOUR), then runs
the full Spark-vs-DuckDB oracle differential against it.  Massive ties
stress every ordering in the catalog: any top-k cut, argmax, rank, or
mode whose tie-break is not a total order flips between engines here.

Round-5 first run: 193/195 — every tie-break held (the id-tie-break
doctrine works); the two failures were a DIVIDE_BY_ZERO crash in the
derived part-supplier relation when quantization produced zero
quantities (now guarded: zero-quantity lines have no unit cost).

Usage: python tools/tie_sweep.py [src_sf_dir] [query ...]
Exit code is check_oracle's (0 iff all queries match).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# column -> grid-quantization expression, per table
TIES = {
    "orders": {"o_totalprice": lambda c: F.round(c / 100, 0) * 100},
    "lineitem": {
        "l_extendedprice": lambda c: F.round(c / 100, 0) * 100,
        "l_quantity": lambda c: F.round(c / 10, 0) * 10,
        "l_discount": lambda c: F.round(c, 1),
        "l_tax": lambda c: F.round(c, 1),
    },
    "events": {
        "value": lambda c: F.round(c / 10, 0) * 10,
        "ts": lambda c: F.date_trunc("hour", c),
    },
    "customer": {"c_acctbal": lambda c: F.round(c / 100, 0) * 100},
    "supplier": {"s_acctbal": lambda c: F.round(c / 100, 0) * 100},
    "part": {"p_retailprice": lambda c: F.round(c / 100, 0) * 100},
}


def build_ties(src: str, dst: str) -> None:
    spark = get_spark("tie-sweep-build")
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        fixes = TIES.get(t, {})
        types = dict(df.dtypes)
        out = df.select(*[
            fixes[c](F.col(c)).cast(types[c]).alias(c) if c in fixes
            else F.col(c)
            for c in df.columns
        ])
        tmpd = f"{dst}/_tmp_{t}"
        out.coalesce(1).write.mode("overwrite").parquet(tmpd)
        shutil.move(glob.glob(f"{tmpd}/part-*.parquet")[0],
                    f"{dst}/{t}.parquet")
        shutil.rmtree(tmpd)
    spark.stop()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    queries = sys.argv[2:]
    dst = tempfile.mkdtemp(prefix="tie_sweep_")
    try:
        build_ties(src, dst)
        here = os.path.dirname(os.path.abspath(__file__))
        return subprocess.call(
            [sys.executable, os.path.join(here, "check_oracle.py"), dst,
             *queries]
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
