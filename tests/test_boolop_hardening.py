"""Boolean-op hardening: symmetric difference + shared-vertex /
shared-edge tangencies (the S2BooleanOperationTests degeneracy
families expressible without snap rounding)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import boolop as B
from s2geometry_spark.kernels import measures as M
from s2geometry_spark.kernels.loop import Loop


def ll(lat, lng):
    phi, th = math.radians(lat), math.radians(lng)
    return (
        math.cos(th) * math.cos(phi),
        math.sin(th) * math.cos(phi),
        math.sin(phi),
    )


def mkloop(*lls):
    lp = Loop(np.asarray([ll(*p) for p in lls]))
    assert M.loop_signed_area(lp.verts) > 0  # CCW
    return lp


def sarea(rings):
    return sum(M.loop_signed_area(r) for r in rings)


A = mkloop((0, 0), (0, 2), (2, 2), (2, 0))
A_AREA = M.loop_area(A.verts)


class TestSharedVertex:
    def test_kissing_squares(self):
        """One shared corner, disjoint interiors: tangency without
        crossing."""
        b = mkloop((2, 2), (2, 4), (4, 4), (4, 2))
        b_area = M.loop_area(b.verts)
        assert B.loop_boolean(A, b, "intersection") == []
        u = B.loop_boolean(A, b, "union")
        assert len(u) == 2
        assert abs(sarea(u) - (A_AREA + b_area)) < 1e-14
        d = B.loop_boolean(A, b, "difference")
        assert abs(sarea(d) - A_AREA) < 1e-14
        s = B.loop_boolean(A, b, "symmetric_difference")
        assert abs(sarea(s) - (A_AREA + b_area)) < 1e-14

    def test_bowtie_crossing_vertex(self):
        """Boundaries CROSS at the shared vertex: the wedge test must
        split the arc walk there."""
        b = mkloop((2, 2), (1, 1), (0, 2), (1, 3))
        b_area = M.loop_area(b.verts)
        ai = sarea(B.loop_boolean(A, b, "intersection"))
        au = sarea(B.loop_boolean(A, b, "union"))
        assert ai > 1e-6  # genuinely overlapping
        assert abs((A_AREA + b_area) - (ai + au)) < 1e-14
        d = sarea(B.loop_boolean(A, b, "difference"))
        assert abs(d - (A_AREA - ai)) < 1e-14
        s = sarea(B.loop_boolean(A, b, "symmetric_difference"))
        assert abs(s - (A_AREA + b_area - 2 * ai)) < 1e-14


class TestSharedEdge:
    def test_adjacent_rectangles_union_merges(self):
        """Admin-border case: rectangles sharing a whole edge.  The
        symbolic-perturbation predicates assign the shared border to
        one side consistently: union = one merged ring, exact area
        sum; intersection is empty."""
        d = mkloop((0, 2), (0, 4), (2, 4), (2, 2))
        d_area = M.loop_area(d.verts)
        u = B.loop_boolean(A, d, "union")
        assert len(u) == 1
        assert abs(sarea(u) - (A_AREA + d_area)) < 1e-13
        assert B.loop_boolean(A, d, "intersection") == []
        s = B.loop_boolean(A, d, "symmetric_difference")
        assert abs(sarea(s) - (A_AREA + d_area)) < 1e-13


class TestSymmetricDifference:
    def test_general_position_identity(self):
        c = mkloop((1, 1), (1, 3), (3, 3), (3, 1))
        c_area = M.loop_area(c.verts)
        ai = sarea(B.loop_boolean(A, c, "intersection"))
        s = B.loop_boolean(A, c, "symmetric_difference")
        assert len(s) == 2
        assert abs(sarea(s) - (A_AREA + c_area - 2 * ai)) < 1e-14

    def test_nested_gives_annulus(self):
        inner = mkloop((0.5, 0.5), (0.5, 1.5), (1.5, 1.5), (1.5, 0.5))
        s = B.loop_boolean(A, inner, "symmetric_difference")
        # shell + CCW hole (winding parity convention)
        assert len(s) == 2
        want = A_AREA - M.loop_area(inner.verts)
        # signed-area sum counts the hole positively; compute shell - hole
        areas = sorted(M.loop_area(r) for r in s)
        assert abs((areas[1] - areas[0]) - want) < 1e-14

    def test_disjoint(self):
        far = mkloop((10, 10), (10, 12), (12, 12), (12, 10))
        s = B.loop_boolean(A, far, "symmetric_difference")
        assert len(s) == 2
        assert abs(
            sarea(s) - (A_AREA + M.loop_area(far.verts))
        ) < 1e-14


class TestMutualContainment:
    """No crossings, each boundary inside the other's interior: the
    union covers the sphere (the configuration loop_contains_loop
    guards at loop.py's union-is-sphere branch)."""

    def setup_method(self):
        # everything north of lat -20 (interior-on-left; area > 2*pi,
        # so the signed area is negative by the (-2pi, 2pi] convention
        # and mkloop's CCW assert does not apply)
        self.a = Loop(np.asarray(
            [ll(-20, 0), ll(-20, 90), ll(-20, 180), ll(-20, -90)]
        ))
        # everything south of lat +20
        self.b = Loop(np.asarray(
            [ll(20, 0), ll(20, -90), ll(20, 180), ll(20, 90)]
        ))
        self.a_area = M.loop_area(self.a.verts)
        self.b_area = M.loop_area(self.b.verts)
        assert self.a_area > 2 * math.pi and self.b_area > 2 * math.pi
        assert self.a_area + self.b_area > 4 * math.pi  # overlapping band

    def test_intersection_is_band(self):
        rings = B.loop_boolean(self.a, self.b, "intersection")
        assert len(rings) == 2
        want = self.a_area + self.b_area - 4 * math.pi
        assert abs(B.rings_area(rings) - want) < 1e-12

    def test_union_raises(self):
        with pytest.raises(ValueError, match="full sphere"):
            B.loop_boolean(self.a, self.b, "union")

    def test_difference_is_complement_of_b(self):
        rings = B.loop_boolean(self.a, self.b, "difference")
        assert len(rings) == 1
        want = 4 * math.pi - self.b_area
        assert abs(B.rings_area(rings) - want) < 1e-12


def test_compare_edges_total_order():
    """CompareEdges must weigh BOTH endpoints: edges sharing their min
    vertex order by max vertex, and exactly one of (a,b), (b,a) is
    True for distinct edges (S2EdgeCrossings.CompareEdges)."""
    p0, p1, p2 = ll(0, 0), ll(0, 1), ll(0, 2)
    assert B._compare_edges(p0, p1, p0, p2) != B._compare_edges(
        p0, p2, p0, p1
    )
    # reversal invariance
    assert B._compare_edges(p1, p0, p2, p0) == B._compare_edges(
        p0, p1, p0, p2
    )
    # irreflexive on the same edge either way round
    assert not B._compare_edges(p0, p1, p1, p0)
    assert not B._compare_edges(p0, p1, p0, p1)
