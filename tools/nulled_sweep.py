"""Null-injection differential sweep: the catalog's cross-engine
null-semantics gate.

Builds a variant of the sf0.001 testdata with deterministic NULLs
injected into the value-ish nullable columns (~1 in 7 rows per column;
keys and join columns stay solid so the relational semantics remain
well-posed), then runs the full Spark-vs-DuckDB oracle differential
(tools/check_oracle.py) against it.

This is the generalization of the round-3 advisor find (null text
diverging through ``F.size`` = -1): its first full run in round 4
surfaced TWENTY latent divergences — printf-of-null garbage, DuckDB
``concat`` skipping nulls vs Spark propagating, NOT-IN three-valued
logic, non-atomic as-of carries, NaN-poisoned pandas UDAFs, null-state
run fracturing in SCD2, repr-vs-value double rounding — every one now
fixed on both engines and held green by this sweep.

Usage: python tools/nulled_sweep.py [src_sf_dir] [query ...]
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

# value-ish nullable columns per table; keys/join columns excluded
NULLABLE = {
    "documents": ["text", "lang", "source"],
    "events": ["value", "props", "event_type"],
    "orders": ["o_totalprice", "o_orderpriority", "o_orderstatus"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag"],
    "customer": ["c_acctbal", "c_mktsegment", "c_name"],
    "supplier": ["s_acctbal", "s_name"],
    "part": ["p_retailprice", "p_type", "p_brand"],
    "embeddings": ["label"],
    "nation": [],
    "region": [],
}


def build_nulled(src: str, dst: str, one_in: int = 7) -> None:
    spark = get_spark("nulled-sweep-build")
    for t, cols in NULLABLE.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        key = df.columns[0]
        out = df.select(*[
            F.when(
                F.pmod(F.hash(F.col(key), F.lit(c)), F.lit(one_in)) == 0,
                F.lit(None),
            ).otherwise(F.col(c)).alias(c)
            if c in cols else F.col(c)
            for c in df.columns
        ])
        # single parquet FILE per table (DuckDB reads the same path)
        tmpd = f"{dst}/_tmp_{t}"
        out.coalesce(1).write.mode("overwrite").parquet(tmpd)
        shutil.move(glob.glob(f"{tmpd}/part-*.parquet")[0],
                    f"{dst}/{t}.parquet")
        shutil.rmtree(tmpd)
    spark.stop()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    queries = sys.argv[2:]
    dst = tempfile.mkdtemp(prefix="nulled_sf_")
    try:
        build_nulled(src, dst)
        tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "check_oracle.py")
        return subprocess.call([sys.executable, tool, dst, *queries])
    finally:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
