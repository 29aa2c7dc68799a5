"""Stream-static route proximity: continuously-arriving geotagged
points matched against static polyline routes ("which route is this
image within d of") — the streaming twin of
operators/spatial_join.point_near_polyline_join.

Production shape at 100 TB ingestion: the routes' buffered coverings
(kernels.buffered_region distance-callback coverer) are a slim
precomputed broadcast index (line_id, cov_cell, level); each
micro-batch Arrow-encodes its points to leaf cells, explodes ancestor
terms at the covering levels, equi-joins the broadcast index, and
refines with the exact vectorized min-edge-distance predicate.  The
stream never shuffles, every batch does O(batch x matching-cells)
work, and the output is append-mode — no unbounded state.

Batch twin ``batch_route_matches`` replays the same plan over the
directory; trigger=availableNow equality is asserted in
tests/test_route_stream.py.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import udfs as U
from ..operators import tile as T
from ..operators.spatial_join import (
    explode_ancestors,
    near_chord2,
    normalized_cols,
    polyline_covering_rows,
)


def route_cover_index(
    spark: SparkSession, polylines: list, radius_rad: float, options=None
) -> tuple[DataFrame, list[int]]:
    """Precompute the static side once: the slim broadcastable
    (line_id, cov_cell) index plus the covering levels the probe side
    must explode."""
    cov_pdf = polyline_covering_rows(polylines, radius_rad, options)
    levels = sorted(cov_pdf["level"].unique().tolist())
    return spark.createDataFrame(cov_pdf), levels


def _matches(
    points: DataFrame,
    cov: DataFrame,
    levels: list[int],
    lines_by_id: dict,
    radius_chord2: float,
) -> DataFrame:
    """Shared stream/batch plan: leaf encode -> ancestor terms ->
    broadcast covering equi-join -> exact min-edge-distance refine."""
    pts = T.assign_cellids(points)
    probe = explode_ancestors(normalized_cols(pts), levels)
    joined = probe.join(
        F.broadcast(cov), probe["anc_cell"] == cov["cov_cell"], "inner"
    )
    near = U.polyline_near_udf(lines_by_id, radius_chord2)
    return joined.where(
        near(F.col("line_id"), F.col("ux"), F.col("uy"), F.col("uz"))
    ).select("key", "line_id")


def streaming_route_matches(
    spark: SparkSession,
    pts_path: str,
    polylines: list,
    radius_rad: float,
) -> DataFrame:
    """Streaming DataFrame of (key, line_id) route-proximity matches
    for incoming points (append mode, stateless).  ``pts_path`` holds
    parquet batches of (key, x, y, z) direction rows."""
    schema = spark.read.parquet(pts_path).schema
    stream = spark.readStream.schema(schema).parquet(pts_path)
    cov, levels = route_cover_index(spark, polylines, radius_rad)
    cov = cov.localCheckpoint()
    lines_by_id = {
        lid: np.asarray(v, dtype=float) for lid, v in polylines
    }
    return _matches(
        stream, cov, levels, lines_by_id, near_chord2(radius_rad)
    )


def batch_route_matches(
    spark: SparkSession,
    pts_path: str,
    polylines: list,
    radius_rad: float,
) -> DataFrame:
    """Batch replay twin of streaming_route_matches."""
    pts = spark.read.parquet(pts_path)
    cov, levels = route_cover_index(spark, polylines, radius_rad)
    lines_by_id = {
        lid: np.asarray(v, dtype=float) for lid, v in polylines
    }
    return _matches(
        pts, cov, levels, lines_by_id, near_chord2(radius_rad)
    )
