"""Distance-callback buffered-region coverer
(S2ShapeIndexBufferedRegion): correctness of the callbacks and
covering tightness vs the unbuffered coverer."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark import constants as C
from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import cellunion as CU
from s2geometry_spark.kernels import measures as M
from s2geometry_spark.kernels.buffered_region import (
    BufferedLoopRegion,
    buffered_loop_covering,
)
from s2geometry_spark.kernels.coverer import RegionCoverer
from s2geometry_spark.kernels.loop import Loop
from s2geometry_spark.kernels.polyline import edge_distance2_batch
from s2geometry_spark.sources import regions_src as R

RADIUS = 0.08


def covering_area(ids) -> float:
    return sum(
        C.KAVG_AREA.get_value(
            int(CI.level(np.asarray([c], np.uint64))[0])
        )
        for c in ids
    )


def true_buffered_area(verts, r) -> float:
    """area + perimeter*r + pi*r^2 (planar approximation, adequate for
    ratio comparisons at these sizes)."""
    return (
        M.loop_area(verts)
        + M.loop_perimeter(verts) * r
        + math.pi * r * r
    )


@pytest.mark.parametrize("key", [0, 1, 3])
def test_covering_contains_buffered_region(key):
    """Every probe within RADIUS of the loop lies in the covering."""
    verts = R.fractal_loop_vertices(key, 128)
    lp = Loop(verts)
    cov = np.asarray(
        CU.normalize(buffered_loop_covering(lp, RADIUS)), np.uint64
    )
    rng = np.random.default_rng(key)
    c = verts.mean(axis=0)
    c /= np.linalg.norm(c)
    P = c[None, :] + 0.5 * rng.standard_normal((4000, 3))
    P /= np.linalg.norm(P, axis=1)[:, None]
    # within-distance predicate
    inside = lp.contains_points(P)
    mind2 = np.full(len(P), np.inf)
    for a, b in lp.edges:
        mind2 = np.minimum(
            mind2,
            edge_distance2_batch(
                P[:, 0], P[:, 1], P[:, 2],
                tuple(map(float, a)), tuple(map(float, b)),
            ),
        )
    s = math.sin(0.5 * RADIUS)
    want = inside | (mind2 <= 4 * s * s)
    # covering membership: leaf in any covering cell range
    leafs = CI.as_u64(CI.xyz_to_cellid(P[:, 0], P[:, 1], P[:, 2]))
    lo = CI.as_u64(CI.range_min(cov))
    hi = CI.as_u64(CI.range_max(cov))
    covered = np.zeros(len(P), dtype=bool)
    for a, b in zip(lo, hi):
        covered |= (leafs >= a) & (leafs <= b)
    assert not (want & ~covered).any()


@pytest.mark.parametrize("key", [0, 1, 3])
def test_tightness_vs_unbuffered_ratio(key):
    """Covering-area ratio of the buffered region stays within 1.5x of
    the unbuffered coverer's ratio at equal max_cells (the
    S2ShapeIndexBufferedRegion tightness criterion), and beats
    expand_radius."""
    verts = R.fractal_loop_vertices(key, 128)
    lp = Loop(verts)
    rc = RegionCoverer()
    base_cov = rc.get_covering(lp)
    base_ratio = covering_area(base_cov) / M.loop_area(verts)

    buf_cov = buffered_loop_covering(lp, RADIUS)
    buf_ratio = covering_area(buf_cov) / true_buffered_area(verts, RADIUS)
    assert buf_ratio <= 1.5 * base_ratio

    old_cov = CU.expand_radius(
        CU.normalize(rc.get_covering(lp)), RADIUS, max_level_diff=3
    )
    assert covering_area(buf_cov) < covering_area(old_cov)


def test_contains_cell_conservative():
    """contains_cell never claims a cell that sticks out of the
    buffered region."""
    verts = R.loop_vertices(2)
    lp = Loop(verts)
    region = BufferedLoopRegion(lp, RADIUS)
    from s2geometry_spark.kernels.geom import Cell

    for cid in CU.normalize(buffered_loop_covering(lp, RADIUS)):
        cell = Cell(int(cid))
        if not region.contains_cell(cell):
            continue
        for k in range(4):
            v = tuple(map(float, cell.vertex(k)))
            assert region.contains_point(v)
