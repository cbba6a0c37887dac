"""Hub-skew differential sweep: the degree/frequency-concentration gate.

Collapses 40% of events onto ONE user and 40% of lineitems onto ONE
(part, supplier) pair — power-law hubs — then runs the full
Spark-vs-DuckDB oracle differential.  Stresses the graph family
(degree orientation, wedge caps), per-entity modes/top-ks, and any
aggregation whose determinism could depend on group size.

Round-5 first run: 195/195 clean — hub concentration flips nothing
(the degree-oriented triangle census, support-pruned edges, and
id-tie-break cuts all hold).  Kept as a standing gate because new graph
operators are exactly where hub bugs would land.

Usage: python tools/skew_sweep.py [src_sf_dir] [query ...]
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


def build_skew(src: str, dst: str) -> None:
    spark = get_spark("skew-sweep-build")
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        types = dict(df.dtypes)
        if t == "events":
            df = df.withColumn(
                "user_id",
                F.when(F.pmod(F.col("event_id"), F.lit(5)) < 2, F.lit(1))
                .otherwise(F.col("user_id")).cast(types["user_id"]),
            )
        if t == "lineitem":
            m = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"),
                       F.lit(5))
            df = df.withColumn(
                "l_partkey",
                F.when(m < 2, F.lit(1)).otherwise(F.col("l_partkey"))
                .cast(types["l_partkey"]),
            ).withColumn(
                "l_suppkey",
                F.when(m < 2, F.lit(1)).otherwise(F.col("l_suppkey"))
                .cast(types["l_suppkey"]),
            )
        tmpd = f"{dst}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmpd)
        shutil.move(glob.glob(f"{tmpd}/part-*.parquet")[0],
                    f"{dst}/{t}.parquet")
        shutil.rmtree(tmpd)
    spark.stop()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    queries = sys.argv[2:]
    dst = tempfile.mkdtemp(prefix="skew_sweep_")
    try:
        build_skew(src, dst)
        here = os.path.dirname(os.path.abspath(__file__))
        return subprocess.call(
            [sys.executable, os.path.join(here, "check_oracle.py"), dst,
             *queries]
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
