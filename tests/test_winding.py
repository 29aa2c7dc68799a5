"""Winding-number operation (S2WindingOperation semantics, general
position): N-way booleans via winding rules must agree with the
pairwise arc-walk boolean ops and with Monte-Carlo membership."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import boolop as B
from s2geometry_spark.kernels import measures as M
from s2geometry_spark.kernels import winding as W
from s2geometry_spark.kernels.loop import Loop


def ll(lat, lng):
    phi, th = math.radians(lat), math.radians(lng)
    return (
        math.cos(th) * math.cos(phi),
        math.sin(th) * math.cos(phi),
        math.sin(phi),
    )


def mkverts(*lls):
    return np.asarray([ll(*p) for p in lls])


def sarea(rings):
    return sum(M.loop_signed_area(r) for r in rings)


A = mkverts((0, 0), (0, 2), (2, 2), (2, 0))
Bv = mkverts((1, 1), (1, 3), (3, 3), (3, 1))


class TestWindingNumber:
    def test_inside_outside(self):
        assert W.winding_number([A], ll(1, 1)) == 1
        assert W.winding_number([A], ll(10, 10)) == 0
        assert W.winding_number([A, Bv], ll(1.5, 1.5)) == 2
        assert W.winding_number([A, Bv], ll(0.5, 0.5)) == 1


class TestWindingOperation:
    def test_single_loop_identity(self):
        rings = W.winding_operation([A], "positive")
        assert len(rings) == 1
        assert abs(sarea(rings) - M.loop_area(A)) < 1e-14

    @pytest.mark.parametrize(
        "rule,op",
        [("positive", "union"), (2, "intersection"),
         ("odd", "symmetric_difference")],
    )
    def test_two_loops_match_boolop(self, rule, op):
        got = sarea(W.winding_operation([A, Bv], rule))
        want = sarea(B.loop_boolean(Loop(A), Loop(Bv), op))
        assert abs(got - want) < 1e-12

    def test_three_way_union_monte_carlo(self):
        C = mkverts((0.5, -1), (0.5, 1.5), (2.5, 1.5), (2.5, -1))
        loops = [A, Bv, C]
        rings = W.winding_operation(loops, "positive")
        rng = np.random.default_rng(0)
        P = np.stack(
            [
                np.asarray(ll(la, lo))
                for la, lo in zip(
                    rng.uniform(-2, 4, 3000), rng.uniform(-3, 5, 3000)
                )
            ]
        )
        want = np.zeros(len(P), bool)
        for V in loops:
            want |= Loop(V).contains_points(P)
        got = np.zeros(len(P), bool)
        for r in rings:
            got ^= Loop(r).contains_points(P)
        assert (want != got).sum() == 0

    def test_three_way_majority_rule(self):
        """w >= 2 = points covered by at least two loops — a rule the
        pairwise boolean ops cannot express directly."""
        C = mkverts((0.5, -1), (0.5, 1.5), (2.5, 1.5), (2.5, -1))
        loops = [A, Bv, C]
        rings = W.winding_operation(loops, 2)
        rng = np.random.default_rng(1)
        P = np.stack(
            [
                np.asarray(ll(la, lo))
                for la, lo in zip(
                    rng.uniform(-2, 4, 3000), rng.uniform(-3, 5, 3000)
                )
            ]
        )
        cover = np.zeros(len(P), dtype=int)
        for V in loops:
            cover += Loop(V).contains_points(P).astype(int)
        want = cover >= 2
        got = np.zeros(len(P), bool)
        for r in rings:
            got ^= Loop(r).contains_points(P)
        assert (want != got).sum() == 0

    def test_disjoint_loops_union(self):
        far = mkverts((30, 30), (30, 32), (32, 32), (32, 30))
        rings = W.winding_operation([A, far], "positive")
        assert len(rings) == 2
        assert abs(
            sarea(rings) - (M.loop_area(A) + M.loop_area(far))
        ) < 1e-14


def _annulus():
    big = mkverts((0, 0), (0, 10), (10, 10), (10, 0))
    hole = mkverts((3, 3), (7, 3), (7, 7), (3, 7))  # clockwise: a hole
    assert M.loop_signed_area(hole) < 0
    return big, hole


class TestSignedWinding:
    def test_cw_hole_subtracts(self):
        big, hole = _annulus()
        rings = W.winding_operation([big, hole], "positive")
        want = M.loop_area(big) - M.loop_area(hole[::-1])
        got = sum(
            M.loop_signed_area(r) if M.loop_signed_area(r) > 0
            else -M.loop_signed_area(r[::-1])
            for r in rings
        )
        # winding-positive region of {CCW shell, CW hole} is the annulus
        assert abs(sum(M.loop_signed_area(r) for r in rings) - want) < 1e-12


class TestPolygonRelations:
    def setup_method(self):
        self.big, self.hole = _annulus()
        self.A = [self.big, self.hole]
        self.small_in = mkverts((1, 1), (1, 2), (2, 2), (2, 1))
        self.in_hole = mkverts((4, 4), (4, 6), (6, 6), (6, 4))
        self.outside = mkverts((20, 20), (20, 22), (22, 22), (22, 20))
        self.crossing = mkverts((-1, -1), (-1, 4), (4, 4), (4, -1))

    def test_contains(self):
        assert W.polygon_contains(self.A, [self.small_in])
        assert not W.polygon_contains(self.A, [self.in_hole])
        assert not W.polygon_contains(self.A, [self.outside])
        assert not W.polygon_contains(self.A, [self.crossing])
        assert W.polygon_contains(self.A, self.A)
        assert W.polygon_contains([self.big], self.A)
        assert not W.polygon_contains(self.A, [self.big])

    def test_intersects(self):
        assert W.polygon_intersects(self.A, [self.small_in])
        assert not W.polygon_intersects(self.A, [self.in_hole])
        assert not W.polygon_intersects(self.A, [self.outside])
        assert W.polygon_intersects(self.A, [self.crossing])
