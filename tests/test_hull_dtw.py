"""Convex hull (monotone chain) + DTW alignment kernels and their
grouped distributed forms."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import alignment as AL
from s2geometry_spark.kernels import edges as E
from s2geometry_spark.kernels import hull as H


def _cluster(rng, n, spread=0.3):
    c = rng.normal(size=3)
    c /= np.linalg.norm(c)
    u = np.array(E.ortho(tuple(c)))
    v = np.cross(c, u)
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(0, spread, n)
    pts = (
        np.cos(rad)[:, None] * c
        + np.sin(rad)[:, None] * (np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v)
    )
    return pts / np.linalg.norm(pts, axis=1)[:, None]


class TestConvexHull:
    def test_hull_contains_all_points(self):
        rng = np.random.default_rng(5)
        for _ in range(8):
            pts = _cluster(rng, int(rng.integers(5, 80)))
            hull = H.convex_hull(pts)
            assert len(hull) >= 3
            hv = set(map(tuple, hull))
            m = len(hull)
            for p in map(tuple, pts):
                if p in hv:
                    continue
                assert all(
                    E.sign(tuple(hull[k]), tuple(hull[(k + 1) % m]), p) > 0
                    for k in range(m)
                )

    def test_hull_vertices_are_inputs(self):
        rng = np.random.default_rng(6)
        pts = _cluster(rng, 40)
        hull = H.convex_hull(pts)
        inputs = set(map(tuple, pts))
        assert all(tuple(h) in inputs for h in hull)

    def test_degenerate_sizes(self):
        p = np.array([[1.0, 0.0, 0.0]])
        assert len(H.convex_hull(p)) == 1
        two = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        assert len(H.convex_hull(two)) == 2

    def test_spanning_set_raises(self):
        pts = np.array(
            [[1.0, 0, 0], [-1.0, 0.001, 0], [0, 1.0, 0], [0, -1.0, 0.001],
             [0, 0, 1.0], [0.001, 0, -1.0]]
        )
        pts = pts / np.linalg.norm(pts, axis=1)[:, None]
        with pytest.raises(ValueError):
            H.convex_hull(pts)

    def test_grouped_operator(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from s2geometry_spark.functions import sparkfns as S
        from s2geometry_spark.operators import measures_op as MO
        from s2geometry_spark.operators import tile as T
        from s2geometry_spark.sources import points as P

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        pts = T.assign_cellids(
            P.with_xyz(cust.select(F.col("c_custkey").alias("key")))
        ).withColumn("grp", S.cell_parent(F.col("cell_id"), 1))
        hulls = MO.group_convex_hull(pts).collect()
        groups = {r["grp"] for r in hulls}
        assert len(groups) > 5
        # spot-check one group against the driver kernel
        pdf = pts.select("grp", "x", "y", "z").toPandas()
        g = sorted(groups)[0]
        gp = pdf[pdf["grp"] == g][["x", "y", "z"]].to_numpy()
        gp = gp / np.sqrt((gp * gp).sum(axis=1))[:, None]  # same expr as operator
        want = H.convex_hull(gp)
        got = sorted(
            (r["vtx_idx"], r["x"], r["y"], r["z"])
            for r in hulls
            if r["grp"] == g
        )
        assert len(got) == len(want)
        for (i, x, y, z), w in zip(got, want):
            assert (x, y, z) == tuple(w)


class TestDtw:
    def test_identical_polylines_zero_cost(self):
        a = _cluster(np.random.default_rng(7), 6)
        cost = AL.alignment_cost(a, a)
        assert cost == 0.0

    def test_cost_equals_path_sum(self):
        rng = np.random.default_rng(8)
        a = _cluster(rng, 7)
        b = _cluster(rng, 5)
        cost, path = AL.alignment(a, b)
        cost2 = AL.alignment_cost(a, b)
        assert abs(cost - cost2) < 1e-15
        s = sum(float(((a[i] - b[j]) ** 2).sum()) for i, j in path)
        assert abs(s - cost) < 1e-12
        # monotone path from (0,0) to (n-1,m-1)
        assert path[0] == (0, 0) and path[-1] == (6, 4)
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}

    def test_brute_force_small(self):
        # exhaustive over all monotone paths for tiny inputs
        import itertools

        rng = np.random.default_rng(9)
        a = _cluster(rng, 3)
        b = _cluster(rng, 3)
        cost_mat = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)

        def all_paths(i, j):
            if (i, j) == (2, 2):
                yield [(2, 2)]
                return
            for di, dj in ((0, 1), (1, 0), (1, 1)):
                ni, nj = i + di, j + dj
                if ni < 3 and nj < 3:
                    for rest in all_paths(ni, nj):
                        yield [(i, j)] + rest

        best = min(
            sum(cost_mat[i, j] for i, j in p) for p in all_paths(0, 0)
        )
        assert abs(AL.alignment_cost(a, b) - best) < 1e-14
