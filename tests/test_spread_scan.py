"""sources/read.spread_scan: the scan-width guard for unsplittable
single-row-group fixture files (no-op at production scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s2geometry_spark.sources.read import spread_scan


def test_noop_when_wide_enough(spark, sf_dir):
    df = spark.range(1000).repartition(8)  # session parallelism is 4
    assert spread_scan(df) is df


def test_spreads_single_partition_scan(spark, sf_dir, tmp_path):
    p = str(tmp_path / "one.parquet")
    spark.range(5000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_hash_spread_preserves_rows(spark, sf_dir, tmp_path):
    p = str(tmp_path / "keyed.parquet")
    spark.range(3000).select(
        F.col("id").alias("key"), (F.col("id") * 7 % 13).alias("v")
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_scan(df, key="key")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # exact multiset of rows survives the spread
    assert out.exceptAll(df).count() == 0
    assert df.exceptAll(out).count() == 0
    # hash form balances: no partition holds more than half the rows
    sizes = (
        out.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert max(r["count"] for r in sizes) < 1500


def test_min_parallelism_override(spark, sf_dir, tmp_path):
    p = str(tmp_path / "ovr.parquet")
    spark.range(100).coalesce(1).write.parquet(p)
    out = spread_scan(spark.read.parquet(p), min_parallelism=3)
    assert out.rdd.getNumPartitions() == 3
