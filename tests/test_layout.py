"""Z-order layout (sources/layout.py): Morton key algebra and the data-
skipping property the layout exists for — a filter on EITHER dimension
prunes most files, where a single-column sort only serves one."""

from __future__ import annotations

from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.sources.layout import (
    file_skipping_fraction,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3), (2, 1)], ["x", "y"])
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    # Morton: x -> even bits, y -> odd bits
    assert got[(1, 0)] == 0b0001
    assert got[(0, 1)] == 0b0010
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b0110


def _grid(spark, n=64):
    # n x n grid: two independent uniform dimensions
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("a"),
            (F.col("id") / n).cast("long").alias("b"),
        )
    )


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "z")
    apath = str(tmp_path / "a_sorted")
    write_zordered(df, zpath, ["a", "b"], n_files=16, bits=6)
    # baseline: single-column range layout on a
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(apath)
    )
    # a narrow slice in each dimension (1/8 of the domain)
    za = file_skipping_fraction(spark, zpath, "a", 0, 7)
    zb = file_skipping_fraction(spark, zpath, "b", 0, 7)
    aa = file_skipping_fraction(spark, apath, "a", 0, 7)
    ab = file_skipping_fraction(spark, apath, "b", 0, 7)
    # the a-sorted layout serves a well and b not at all
    assert aa >= 0.75 and ab == 0.0
    # the z-order serves BOTH dimensions
    assert za >= 0.5 and zb >= 0.5


def test_zordered_write_preserves_rows(spark, tmp_path):
    df = _grid(spark, n=16)
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["a", "b"], n_files=4, bits=4)
    back = spark.read.parquet(path)
    assert back.count() == 256
    assert back.columns == ["a", "b"]
    assert (
        back.agg(F.sum("a").alias("s")).collect()[0]["s"]
        == df.agg(F.sum("a").alias("s")).collect()[0]["s"]
    )


def test_known_domains_skip_the_measure_pass(spark, tmp_path):
    df = _grid(spark, n=8)
    path = str(tmp_path / "z3")
    write_zordered(
        df, path, ["a", "b"], n_files=2, bits=3,
        domains={"a": (0, 7), "b": (0, 7)},
    )
    assert spark.read.parquet(path).count() == 64
