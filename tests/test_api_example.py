"""The API.md worked example must keep running verbatim (module paths,
signatures, and argument shapes it quotes are public contract)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_api_md_worked_example(spark):
    from s2geometry_spark.kernels.geom import Cap
    from s2geometry_spark.operators import spatial_join as SJ
    from s2geometry_spark.operators import tile as T
    from s2geometry_spark.sources import points as P

    imgs = spark.range(1000).selectExpr("id as image_id")
    pts = T.assign_cellids(P.with_xyz(imgs.selectExpr("image_id as key")))
    tiles = T.tile_counts(pts, level=8)
    caps = [
        (i, Cap.from_center_radians((1.0, 0.0, 0.0), 0.1 + 0.01 * i))
        for i in range(4)
    ]
    pairs = SJ.point_in_cap_join(spark, pts, caps)

    assert tiles.columns == ["tile_id", "n"]
    assert set(pairs.columns) == {"key", "region_id"}
    n_tiles = tiles.count()
    assert 0 < n_tiles <= 1000
    # nested caps: every key in cap i is also in every larger cap j > i,
    # so per-key region sets must be suffixes of range(4)
    rows = pairs.groupBy("key").agg(
        F.sort_array(F.collect_list("region_id")).alias("rs")
    )
    for r in rows.collect():
        rs = r["rs"]
        assert rs == list(range(4 - len(rs), 4))
