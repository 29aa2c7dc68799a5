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
