"""Parquet table loaders (scan S1-analog on the driver testdata).

Columnar parquet + declarative DataFrame reads give predicate pushdown and
column pruning for free: a query touching 2 of lineitem's 11 columns reads
2 column chunks, and a filter on ``l_shipdate`` prunes row groups via
parquet min/max stats.  At 100 TB the same code path applies unchanged —
partition pruning and pushed filters show up in ``.explain`` as
``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
        # rejects.  Read nanos as long (runtime conf, so it also works inside
        # a driver-created session) and truncate to microseconds with integer
        # division — float division would lose precision at ~1.7e18 ns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the testdata tables to ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
