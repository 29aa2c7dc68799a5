"""Measure kernels vs reference golden values
(S2MeasuresTests.cs:31-86, S2LoopMeasuresTests.cs:112-242) and the
distributed grouped-kernel path vs the driver-side kernels."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import measures as M
from s2geometry_spark.sources import regions_src as R

PZ = (0.0, 0.0, 1.0)
P000 = (1.0, 0.0, 0.0)
P045 = tuple(np.array([1.0, 1.0, 0.0]) / math.sqrt(2))
P090 = (0.0, 1.0, 0.0)
P180 = (-1.0, 0.0, 0.0)


def _unit(v):
    a = np.asarray(v, float)
    return tuple(a / np.linalg.norm(a))


class TestTriangleMeasures:
    def test_area_golden(self):
        # S2MeasuresTests.cs:39-40
        assert abs(M.triangle_area(P000, P090, PZ) - math.pi / 2) < 1e-14
        assert abs(M.triangle_area(P045, PZ, P180) - 3 * math.pi / 4) < 1e-14

    def test_small_triangle_relative_accuracy(self):
        # S2MeasuresTests.cs:44-47
        eps = 1e-10
        pex = _unit((eps, 0, 1))
        pey = _unit((0, eps, 1))
        got = M.triangle_area(pex, pey, PZ)
        expected = 0.5 * eps * eps
        assert abs(got - expected) <= 1e-9 * expected

    def test_skinny_triangle_mathematica_value(self):
        # S2MeasuresTests.cs:75-77
        p045eps = _unit((1, 1, 1e-10))
        expected = 5.8578643762690495119753e-11
        assert abs(M.triangle_area(P000, p045eps, P090) - expected) < 1e-9 * expected

    def test_quarter_sphere_sum(self):
        # S2MeasuresTests.cs:80-86
        eps2 = 1e-14
        p = _unit((1, 0.1 * eps2, eps2))
        total = (
            M.triangle_area(p, P000, P045)
            + M.triangle_area(p, P045, P180)
            + M.triangle_area(p, P180, PZ)
            + M.triangle_area(p, PZ, P000)
        )
        assert abs(total - math.pi) < 1e-14

    def test_girard_degenerate_near_zero(self):
        # S2MeasuresTests.cs:69-72 spirit: nearly-identical points
        a = _unit((1, 1e-15, 0))
        b = _unit((1, 0, 1e-15))
        assert M.girard_area(a, b, a) <= 1e-14

    def test_turn_angle_antisymmetry(self):
        assert M.turn_angle(P000, P045, P090) == -M.turn_angle(P090, P045, P000)


class TestLoopMeasures:
    def _equator_loop(self, n=64):
        return np.array(
            [
                (math.cos(2 * math.pi * k / n), math.sin(2 * math.pi * k / n), 0.0)
                for k in range(n)
            ]
        )

    def test_north_hemisphere(self):
        nh = self._equator_loop()
        assert abs(M.loop_area(nh) - 2 * math.pi) < 1e-10
        assert abs(M.loop_curvature(nh)) < 1e-10
        assert abs(M.loop_perimeter(nh) - 2 * math.pi) < 1e-10

    def test_cw_loop_negative_signed_area(self):
        # hemisphere loops are the ambiguous +-2pi case (the reference
        # maps -2pi -> +2pi, S2LoopMeasures GetSignedArea); use a small
        # CW loop where the sign is unambiguous
        small = R.loop_vertices(3)[::-1].copy()
        sa = M.loop_signed_area(small)
        ccw = M.loop_area(R.loop_vertices(3))
        assert sa < 0
        assert abs(-sa - ccw) < 1e-14
        # area() of the CW loop is the complement
        assert abs(M.loop_area(small) - (4 * math.pi - ccw)) < 1e-12

    def test_area_consistent_with_curvature(self):
        # Gauss-Bonnet: area = 2*pi - curvature (within per-vertex error)
        for rid in range(8):
            verts = R.loop_vertices(rid)
            area = M.loop_area(verts)
            curv = M.loop_curvature(verts)
            tol = 11.25 * M.DBL_EPS * len(verts) * 10 + 1e-12
            assert abs(area - (2 * math.pi - curv)) < max(tol, 1e-10 * area)

    def test_small_loop_area_vs_cap(self):
        # regular n-gon inscribed in a spherical circle: area ratio to
        # the cap approaches (n/(2pi)) * sin(2pi/n) for small radii
        for rid in range(6):
            verts = R.loop_vertices(rid)
            radius = 0.05 + (rid % 9) * 0.02
            nv = 4 + (rid % 5)
            cap_area = 2 * math.pi * (1 - math.cos(radius))
            expect_ratio = nv / (2 * math.pi) * math.sin(2 * math.pi / nv)
            got_ratio = M.loop_area(verts) / cap_area
            assert abs(got_ratio - expect_ratio) < 0.02

    def test_centroid_direction(self):
        for rid in range(6):
            verts = R.loop_vertices(rid)
            cen = np.array(M.loop_centroid(verts))
            cen /= np.linalg.norm(cen)
            cx, cy, cz, _ = R.cap_params(rid)
            assert float(cen @ (cx, cy, cz)) > 0.9999

    def test_polygon_area_with_hole(self):
        outer = R.loop_vertices(2)
        # shrink toward centroid for an inner (hole) ring, same orientation
        cen = np.array(M.loop_centroid(outer))
        cen /= np.linalg.norm(cen)
        inner = outer * 0.3 + cen[None, :] * 0.7
        inner /= np.linalg.norm(inner, axis=1)[:, None]
        a_out = M.loop_area(outer)
        a_in = M.loop_area(inner)
        total = M.polygon_area([(0, outer), (1, inner)])
        assert abs(total - (a_out - a_in)) < 1e-15
        assert 0 < total < a_out


class TestDistributedMeasures:
    def test_grouped_kernel_matches_driver(self, spark):
        from s2geometry_spark.operators import measures_op as MO

        loops = R.synthetic_loops(range(12))
        got = {
            r["region_id"]: r
            for r in MO.loop_measures(MO.loops_vertex_df(spark, loops)).collect()
        }
        assert len(got) == 12
        for rid, lp in loops:
            r = got[rid]
            assert r["area"] == M.loop_area(lp.verts)
            assert r["perimeter"] == M.loop_perimeter(lp.verts)
            assert r["curvature"] == M.loop_curvature(lp.verts)
            cen = M.loop_centroid(lp.verts)
            assert (r["centroid_x"], r["centroid_y"], r["centroid_z"]) == cen


class TestCurvatureDegeneracies:
    """GetCurvature conventions (S2LoopMeasures.cs:70-110): no
    vertices -> -2pi (full-sphere convention); a loop that PRUNES to
    empty (duplicates, ABA pairs) -> +2pi; otherwise the curvature of
    the pruned loop."""

    A = (1.0, 0.0, 0.0)
    B = (0.0, 1.0, 0.0)
    C = (0.0, 0.0, 1.0)

    def test_conventions(self):
        assert M.loop_curvature([]) == -2 * math.pi
        assert M.loop_curvature([self.A]) == 2 * math.pi
        assert M.loop_curvature([self.A, self.B]) == 2 * math.pi
        assert M.loop_curvature([self.A, self.B, self.A]) == 2 * math.pi

    def test_pruning_matches_clean_loop(self):
        clean = M.loop_curvature([self.A, self.B, self.C])
        dup = M.loop_curvature(
            [self.A, self.A, self.B, self.B, self.C, self.C]
        )
        aba = M.loop_curvature(
            [self.A, self.B, self.C, self.B, self.C]
        )
        assert dup == clean
        assert aba == clean

    def test_prune_degeneracies(self):
        # B->A->B->C closes as edges BA, AB, BC, CB — every edge has
        # its sibling, so the loop is fully degenerate
        assert M.prune_degeneracies(
            [self.B, self.A, self.B, self.C]
        ) == []
        # an ABA spur hanging off a real triangle prunes to the core
        assert M.prune_degeneracies(
            [self.A, self.B, (0.0, -1.0, 0.0), self.B, self.C]
        ) == [self.A, self.B, self.C]
        # wrapping pair: closing vertex equal to the first
        assert M.prune_degeneracies(
            [self.A, self.B, self.C, self.A]
        ) == [self.A, self.B, self.C]
