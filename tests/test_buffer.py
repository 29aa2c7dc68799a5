"""Buffered geometry emission (offset-curve ring, convex scope):
agreement with the within-distance predicate and the growth
inequalities of the spherical buffer."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import buffer as BUF
from s2geometry_spark.kernels import measures as M
from s2geometry_spark.kernels.loop import Loop
from s2geometry_spark.kernels.polyline import edge_distance2_batch
from s2geometry_spark.sources import regions_src as R


@pytest.mark.parametrize("key", range(8))
def test_convex_buffer_matches_predicate(key):
    lp = Loop(R.loop_vertices(key))
    r, tol = 0.03, 1e-3
    ring = BUF.buffer_loop(lp.verts, r, tolerance=tol)  # check=True inside
    bl = Loop(ring)
    rng = np.random.default_rng(key)
    c = np.asarray(lp.verts).mean(axis=0)
    c /= np.linalg.norm(c)
    P = c[None, :] + 0.3 * rng.standard_normal((3000, 3))
    P /= np.linalg.norm(P, axis=1)[:, None]
    want = BUF.buffered_contains(lp.verts, r, P, lp.origin_inside)
    got = bl.contains_points(P)
    bad = np.flatnonzero(want != got)
    if len(bad):
        # every disagreement must be within the tolerance band of the
        # true buffered boundary
        n = len(lp.verts)
        min_d2 = np.full(len(P), np.inf)
        for k in range(n):
            a = tuple(map(float, lp.verts[k]))
            b = tuple(map(float, lp.verts[(k + 1) % n]))
            min_d2 = np.minimum(
                min_d2, edge_distance2_batch(P[:, 0], P[:, 1], P[:, 2], a, b)
            )
        d = 2 * np.arcsin(np.sqrt(np.clip(min_d2, 0, 4)) / 2)
        assert np.all(np.abs(d[bad] - r) <= 4 * tol)


def test_buffer_grows_area_and_contains_base(key=2):
    lp = Loop(R.loop_vertices(key))
    ring = BUF.buffer_loop(lp.verts, 0.05)
    bl = Loop(ring)
    assert M.loop_area(ring) > M.loop_area(lp.verts)
    # every base vertex strictly inside the buffered ring
    assert bl.contains_points(np.asarray(lp.verts)).all()


def test_out_of_scope_concave_raises():
    with pytest.raises(ValueError):
        BUF.buffer_loop(R.fractal_loop_vertices(3, 48), 0.02, 5e-4)


def test_bitwise_deterministic_across_layouts():
    import pandas as pd

    lp = Loop(R.loop_vertices(1))
    rows = [
        (1, k, float(v[0]), float(v[1]), float(v[2]))
        for k, v in enumerate(np.asarray(lp.verts))
    ]
    pdf = pd.DataFrame(rows, columns=["rid", "vtx", "x", "y", "z"])
    strided = pdf[["x", "y", "z"]].to_numpy()
    direct = np.asarray(lp.verts, dtype=np.float64)
    r1 = BUF.buffer_loop(direct, 0.03)
    r2 = BUF.buffer_loop(strided, 0.03)
    assert np.array_equal(r1, r2)
