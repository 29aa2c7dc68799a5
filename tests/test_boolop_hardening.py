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
