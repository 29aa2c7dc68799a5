"""Distributed closest-edge kNN (closest_edge_join): row-equality
against the broadcast arm (closest_polyline) on the same fixture, and
the plan properties that make it the fact-scale path — the edge table
is never broadcast and never collected (Query/S2ClosestEdgeQueryBase.cs
:211-363 generality over indexed edges)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import knn as KNN

INDEX_LEVEL = 7


def _edges_df(spark, keys, variant=0):
    from s2geometry_spark.sources import regions_src as R

    rows = [
        (lid, eid, a[0], a[1], a[2], b[0], b[1], b[2])
        for lid, eid, a, b in R.polyline_edges(keys, variant)
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["line_id", "edge_idx", "ax", "ay", "az", "bx", "by", "bz"],
        )
    )


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    from pyspark.sql import functions as F

    from s2geometry_spark.operators import tile as T
    from s2geometry_spark.sources import points as P

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return T.assign_cellids(
        P.with_xyz(orders.select(F.col("o_orderkey").alias("key")))
    ).localCheckpoint()


def test_distributed_equals_broadcast(spark, sf_dir, pts):
    from s2geometry_spark.sources import regions_src as R

    keys = range(25)
    by_line = {}
    for lid, eid, a, b in R.polyline_edges(keys):
        by_line.setdefault(lid, []).append((a, b))
    want = {
        (r["key"], r["line_id"], r["dist2"])
        for r in KNN.closest_polyline(pts, sorted(by_line.items())).collect()
    }

    idx = KNN.edge_covering_index(_edges_df(spark, keys), INDEX_LEVEL)
    got_df = KNN.closest_edge_join(
        spark, pts, idx, index_level=INDEX_LEVEL, k=1
    )
    got = {
        (r["key"], r["line_id"], r["dist2"])
        for r in got_df.where(F.col("rn") == 1).collect()
    }
    # bit-identical distances AND identical (dist2, line_id) tie-breaks
    assert got == want


def test_k3_matches_bruteforce(spark, sf_dir, pts):
    """k>1: the ring loop's top-3 lines equal an exact per-line
    min-distance brute force with the same (dist2, line_id) order."""
    keys = range(12)
    sub = pts.limit(300).localCheckpoint()
    idx = KNN.edge_covering_index(_edges_df(spark, keys), INDEX_LEVEL)
    got = sorted(
        tuple(r)
        for r in KNN.closest_edge_join(
            spark, sub, idx, index_level=INDEX_LEVEL, k=3
        ).collect()
    )

    from s2geometry_spark.sources import regions_src as R
    from s2geometry_spark.kernels import polyline as PL
    import numpy as np

    rows = sub.select("key", "x", "y", "z").collect()
    P = np.array([[r["x"], r["y"], r["z"]] for r in rows])
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    ks = [r["key"] for r in rows]
    by_line = {}
    for lid, eid, a, b in R.polyline_edges(keys):
        by_line.setdefault(lid, []).append((a, b))
    want = []
    for i, key in enumerate(ks):
        ds = []
        for lid, edges in sorted(by_line.items()):
            d2 = min(
                PL.edge_distance2_batch(
                    P[i : i + 1, 0], P[i : i + 1, 1], P[i : i + 1, 2], a, b
                )[0]
                for a, b in edges
            )
            ds.append((d2, lid))
        ds.sort()
        for rn, (d2, lid) in enumerate(ds[:3], 1):
            want.append((key, lid, d2, rn))
    assert got == sorted(want)


def test_edge_table_never_broadcast(spark, sf_dir, pts):
    """Plan evidence: with auto-broadcast disabled, a round's candidate
    join is a shuffle equi-join on the ring cell — no broadcast of the
    edge table, no cartesian product (the property that lets a
    100M-edge index scale; the broadcast closest_polyline form caps at
    dim size)."""
    keys = range(25)
    idx = KNN.edge_covering_index(_edges_df(spark, keys), INDEX_LEVEL).select(
        "line_id", "edge_idx",
        F.col("ax").alias("iax"), F.col("ay").alias("iay"),
        F.col("az").alias("iaz"), F.col("bx").alias("ibx"),
        F.col("by").alias("iby"), F.col("bz").alias("ibz"),
        "cov_cell",
    )
    from s2geometry_spark.operators.spatial_join import normalized_cols

    q = normalized_cols(pts).select(
        F.col("key").alias("qk"),
        F.col("ux").alias("qux"), F.col("uy").alias("quy"),
        F.col("uz").alias("quz"), F.col("cell_id").alias("qcell"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = KNN.ranked_edge_lines(q, idx, level=INDEX_LEVEL, k=1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_empty_query_side_returns_typed_empty(spark, pts):
    from s2geometry_spark.operators import knn as KNN

    edges = _edges_df(spark, range(6))
    idx = KNN.edge_covering_index(edges, 7)
    out = KNN.closest_edge_join(
        spark, pts.limit(0), idx, index_level=7, k=2
    )
    assert out.columns == ["key", "line_id", "dist2", "rn"]
    assert out.count() == 0
