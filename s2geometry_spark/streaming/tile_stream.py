"""Structured Streaming tile pipeline.

The reference is batch-only (SURVEY.md §2.10) — this is the engine's
own streaming surface for continuously-arriving geotagged events:

    file/parquet stream -> derive direction vector -> Arrow pUDF leaf
    cell encode -> JVM tile parent -> watermarked event-time window ->
    per-(window, tile) counts

The aggregation is the streaming twin of operators.tile.tile_counts;
with trigger=availableNow over a static directory it produces exactly
the batch result (asserted in tests), which is the replayability
property a backfill at 100 TB relies on.  State size is bounded by
(windows in watermark horizon) x (active tiles), not event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sparkfns as S
from ..functions import udfs as U
from ..sources import points as P


def _event_points(df: DataFrame) -> DataFrame:
    """Derive the deterministic direction vector from user_id (same
    integer scheme as sources.points — oracle-compatible)."""
    # parquet TIMESTAMP_NTZ is not a valid watermark type; pin to TIMESTAMP
    return P.with_xyz(
        df.select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("user_id").alias("key"),
        )
    )


def event_tiles(df: DataFrame, tile_level: int) -> DataFrame:
    pts = _event_points(df)
    cells = pts.withColumn(
        "cell_id", U.xyz_to_cellid(F.col("x"), F.col("y"), F.col("z"))
    )
    return cells.withColumn(
        "tile_id", S.cell_parent(F.col("cell_id"), tile_level)
    )


def streaming_tile_counts(
    spark: SparkSession,
    events_path: str,
    tile_level: int = 6,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream -> windowed per-tile counts (append-capable with
    watermark; late rows beyond the horizon are dropped)."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    tiled = event_tiles(stream, tile_level)
    return (
        tiled.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "tile_id",
            "n",
        )
    )


def batch_tile_counts(
    spark: SparkSession,
    events_path: str,
    tile_level: int = 6,
    window: str = "1 hour",
) -> DataFrame:
    """Batch twin of streaming_tile_counts (replay oracle)."""
    tiled = event_tiles(spark.read.parquet(events_path), tile_level)
    return (
        tiled.groupBy(F.window("ts", window).alias("win"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "tile_id",
            "n",
        )
    )


def run_available_now(query_df: DataFrame, name: str, checkpoint: str):
    """Drain all available input with availableNow and return the
    in-memory sink table name."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name
