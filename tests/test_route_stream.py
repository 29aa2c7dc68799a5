"""Stream-static route proximity: the availableNow drain must equal
the batch replay twin AND the batch operator
(spatial_join.point_near_polyline_join) row-for-row; incremental
batches must carry no state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.sources import regions_src as R
from s2geometry_spark.streaming import route_stream as RS

RADIUS = 0.08


@pytest.fixture(scope="module")
def routes():
    return [(k, R.polyline_vertices(k)) for k in range(25)]


@pytest.fixture(scope="module")
def pts_dir(spark, sf_dir, tmp_path_factory):
    from s2geometry_spark.sources import points as P

    d = tmp_path_factory.mktemp("incoming_pts")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = P.with_xyz(
        orders.select(F.col("o_orderkey").alias("key")).limit(3000)
    ).select("key", "x", "y", "z")
    pts.coalesce(2).write.parquet(str(d / "pts"))
    return str(d / "pts")


def _drain_append(df, name, ck):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def test_stream_equals_batch_and_join_operator(
    spark, sf_dir, routes, pts_dir, tmp_path
):
    stream = RS.streaming_route_matches(spark, pts_dir, routes, RADIUS)
    name = _drain_append(stream, "route_matches", str(tmp_path / "ck"))
    got = {
        (r["key"], r["line_id"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        (r["key"], r["line_id"])
        for r in RS.batch_route_matches(
            spark, pts_dir, routes, RADIUS
        ).collect()
    }
    assert got == batch
    assert got, "expected non-empty matches at this radius"

    # the batch OPERATOR on the same rows must agree exactly
    from s2geometry_spark.operators import spatial_join as SJ
    from s2geometry_spark.operators import tile as T

    pts = T.assign_cellids(spark.read.parquet(pts_dir))
    want = {
        (r["key"], r["line_id"])
        for r in SJ.point_near_polyline_join(
            spark, pts, routes, RADIUS
        ).collect()
    }
    assert got == want


def test_incremental_batches_keep_no_state(
    spark, routes, pts_dir, tmp_path
):
    """Each micro-batch's matches depend only on that batch (stateless
    append): draining to a file sink after adding a second input file
    emits exactly the new file's matches, and a re-drain with the same
    checkpoint emits nothing (resume idempotence)."""
    import shutil

    d2 = tmp_path / "pts2"
    shutil.copytree(pts_dir, d2)
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def drain():
        q = (
            RS.streaming_route_matches(spark, str(d2), routes, RADIUS)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = {
        (r["key"], r["line_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert first

    # append a shifted copy of the points as a new file; only its
    # matches may appear in the second drain
    from s2geometry_spark.sources import points as P

    extra = P.with_xyz(
        spark.range(9_000_000, 9_000_500).select(
            F.col("id").alias("key")
        )
    ).select("key", "x", "y", "z")
    extra.coalesce(1).write.mode("append").parquet(str(d2))
    drain()
    second = {
        (r["key"], r["line_id"])
        for r in spark.read.parquet(out).collect()
    }
    new_rows = second - first
    assert {k for k, _ in new_rows} <= set(range(9_000_000, 9_000_500))

    # re-drain with no new input: nothing added (resume idempotence)
    drain()
    third = {
        (r["key"], r["line_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert third == second
