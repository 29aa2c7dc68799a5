"""Buffered geometry emission: the convex parameter-ordered path and
the concave winding-arrangement path (S2BufferOperation semantics),
validated against the within-distance predicate."""

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


@pytest.mark.parametrize("key", range(5))
def test_concave_fractal_buffer(key):
    """Concave star loops route through the winding walk; check=True
    Monte-Carlo-validates against the within-distance predicate."""
    rings = BUF.buffer_loop_rings(
        R.fractal_loop_vertices(key, 48), 0.03, 1e-3
    )
    assert len(rings) >= 1
    base = M.loop_area(R.fractal_loop_vertices(key, 48))
    assert sum(M.loop_signed_area(r) for r in rings) > base


def _ll_poly(lls):
    from s2geometry_spark.kernels.textformat import ll_to_point

    v = np.asarray([ll_to_point(a, b) for a, b in lls])
    if M.loop_signed_area(v) < 0:
        v = v[::-1]
    return v


def test_concave_courtyard_pinches_hole():
    """A courtyard reachable only through a narrow mouth: buffering
    beyond the mouth half-width seals it, leaving a CW hole ring."""
    cy = _ll_poly(
        [(0, 0), (0, 4), (1.95, 4), (1.95, 3), (1, 3), (1, 1),
         (3, 1), (3, 3), (2.05, 3), (2.05, 4), (4, 4), (4, 0)]
    )
    rings = BUF.buffer_loop_rings(cy, 0.002, 2e-4)
    areas = sorted(M.loop_signed_area(r) for r in rings)
    assert len(rings) == 2
    assert areas[0] < 0 < areas[1]  # CW hole + CCW shell
    # buffer_loop (single-ring API) refuses the multi-ring result
    with pytest.raises(ValueError):
        BUF.buffer_loop(cy, 0.002, 2e-4)


def test_concave_dumbbell_merges():
    """Dumbbell whose neck is thinner than the radius: the two bulb
    buffers merge across the neck into one ring."""
    db = _ll_poly(
        [(0, 0), (0, 1), (0.45, 1), (0.45, 3), (0, 3), (0, 4),
         (1, 4), (1, 3), (0.55, 3), (0.55, 1), (1, 1), (1, 0)]
    )
    rings = BUF.buffer_loop_rings(db, 0.003, 2e-4)
    assert len(rings) == 1
    assert M.loop_signed_area(rings[0]) > M.loop_area(db)


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
