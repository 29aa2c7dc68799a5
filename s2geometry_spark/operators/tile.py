"""Tile assignment: the point -> leaf cell -> tile pipeline.

Spark plan shape (SURVEY.md §3.1): one Arrow-batched pandas UDF for the
leaf encode (the only step that needs numpy), then pure-JVM bit
arithmetic for the tile ancestor — Catalyst keeps the parent/groupBy
inside whole-stage codegen, and partial aggregation makes the per-tile
counts map-side combined (no raw-row shuffle).

At 100 TB: the UDF is embarrassingly parallel per input split; the only
shuffle is the (tile_id -> partial count) exchange whose width is the
number of distinct tiles, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sparkfns as S
from ..functions import udfs as U


def assign_cellids(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    out: str = "cell_id",
) -> DataFrame:
    """Append the leaf cell id of direction-vector columns."""
    return df.withColumn(out, U.xyz_to_cellid(F.col(x), F.col(y), F.col(z)))


def assign_cellids_ll(
    df: DataFrame, lat: str = "lat", lon: str = "lon", out: str = "cell_id"
) -> DataFrame:
    return df.withColumn(out, U.ll_to_cellid(F.col(lat), F.col(lon)))


def assign_tiles(
    df: DataFrame, level: int, cell_col: str = "cell_id", out: str = "tile_id"
) -> DataFrame:
    """Tile = ancestor cell at `level`; pure-JVM bit arithmetic."""
    return df.withColumn(out, S.cell_parent(F.col(cell_col), level))


def tile_counts(df: DataFrame, level: int, cell_col: str = "cell_id") -> DataFrame:
    """Images per tile (hash agg: partial map-side combine + final)."""
    return (
        assign_tiles(df, level, cell_col)
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
