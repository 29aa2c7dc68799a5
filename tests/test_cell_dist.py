"""Cell distance kernels vs brute-force sampling (the
S2CellTests.cs GetDistance* methodology: compare against dense
point/edge samples of the cell)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cell_dist as CD
from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels.geom import Cell, _face_uv_to_xyz, chord2, normalize


def cell_samples(cell: Cell, n: int = 12):
    """Grid of points covering the cell (interior + boundary)."""
    us = np.linspace(cell.u_lo, cell.u_hi, n)
    vs = np.linspace(cell.v_lo, cell.v_hi, n)
    return [
        normalize(_face_uv_to_xyz(cell.face, u, v)) for u in us for v in vs
    ]


def edge_samples(a, b, n: int = 64):
    a, b = np.asarray(a), np.asarray(b)
    return [
        normalize(tuple((1 - t) * a + t * b)) for t in np.linspace(0, 1, n)
    ]


def rand_cell(rng, level=None) -> Cell:
    level = int(rng.integers(2, 12)) if level is None else level
    face = int(rng.integers(6))
    pos = int(rng.integers(1 << (2 * level))) << (2 * (30 - level))
    return Cell(int(np.atleast_1d(CI.from_face_pos_level(face, pos, level))[0]))


TOL = 1e-3  # sampling resolution tolerance (chord^2)


class TestPointDistance:
    def test_inside_is_zero_and_boundary_positive(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            cell = rand_cell(rng)
            center = cell.center()
            assert CD.cell_distance_to_point(cell, center) == 0.0
            assert CD.cell_boundary_distance(cell, center) > 0.0

    def test_matches_sampled_min_and_max(self):
        rng = np.random.default_rng(2)
        for _ in range(30):
            cell = rand_cell(rng)
            p = normalize(tuple(rng.standard_normal(3)))
            samples = cell_samples(cell)
            brute_min = min(chord2(p, s) for s in samples)
            brute_max = max(chord2(p, s) for s in samples)
            got_min = CD.cell_distance_to_point(cell, p)
            got_max = CD.cell_max_distance_to_point(cell, p)
            assert got_min <= brute_min + 1e-12
            assert got_min >= brute_min - TOL
            assert got_max >= brute_max - 1e-12
            assert got_max <= brute_max + TOL


class TestEdgeDistance:
    def test_crossing_edge_is_zero(self):
        rng = np.random.default_rng(3)
        for _ in range(15):
            cell = rand_cell(rng, level=6)
            c = np.asarray(cell.center())
            t = rng.standard_normal(3)
            t -= t.dot(c) * c
            t /= np.linalg.norm(t)
            a = normalize(tuple(c + 0.5 * t))
            b = normalize(tuple(c - 0.5 * t))
            assert CD.cell_distance_to_edge(cell, a, b) == 0.0

    def test_matches_sampled(self):
        rng = np.random.default_rng(4)
        checked = 0
        for _ in range(30):
            cell = rand_cell(rng)
            p = normalize(tuple(rng.standard_normal(3)))
            q = normalize(tuple(np.asarray(p) + 0.2 * rng.standard_normal(3)))
            got = CD.cell_distance_to_edge(cell, p, q)
            gmax = CD.cell_max_distance_to_edge(cell, p, q)
            cs = cell_samples(cell)
            es = edge_samples(p, q)
            brute = min(chord2(c, e) for c in cs for e in es)
            brute_max = max(chord2(c, e) for c in cs for e in es)
            if got == 0.0:
                assert brute <= 4 * TOL
            else:
                assert got <= brute + 1e-12
                assert got >= brute - TOL
                checked += 1
            assert gmax >= brute_max - 1e-12
            assert gmax <= brute_max + TOL
        assert checked > 10


class TestCellDistance:
    def test_self_and_children_zero(self):
        rng = np.random.default_rng(5)
        for _ in range(10):
            cell = rand_cell(rng, level=5)
            assert CD.cell_distance_to_cell(cell, cell) == 0.0
            child = Cell(int(C_child(cell.id)))
            assert CD.cell_distance_to_cell(cell, child) == 0.0

    def test_matches_sampled(self):
        rng = np.random.default_rng(6)
        checked = 0
        for _ in range(25):
            a = rand_cell(rng)
            b = rand_cell(rng)
            got = CD.cell_distance_to_cell(a, b)
            gmax = CD.cell_max_distance_to_cell(a, b)
            sa = cell_samples(a, 10)
            sb = cell_samples(b, 10)
            brute = min(chord2(x, y) for x in sa for y in sb)
            brute_max = max(chord2(x, y) for x in sa for y in sb)
            if got == 0.0:
                assert brute <= 4 * TOL
            else:
                assert got <= brute + 1e-12
                assert got >= brute - TOL
                checked += 1
            assert gmax >= brute_max - 1e-12
            assert gmax <= brute_max + TOL
        assert checked > 5

    def test_antipodal_cells_max_is_straight(self):
        rng = np.random.default_rng(7)
        cell = rand_cell(rng, level=4)
        # build the antipodal cell: opposite face, transposed uv
        anti_center = tuple(-x for x in cell.center())
        leaf = CI.xyz_to_cellid(
            np.array([anti_center[0]]),
            np.array([anti_center[1]]),
            np.array([anti_center[2]]),
        )
        anti = Cell(int(CI.parent(leaf, 4)[0]))
        assert CD.cell_max_distance_to_cell(cell, anti) == CD.CHORD2_STRAIGHT


def C_child(cid: int) -> int:
    return int(
        CI.child(np.array([cid], dtype=np.uint64), 1)[0]
    )
