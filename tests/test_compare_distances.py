"""Exact distance-comparison predicates
(S2Predicates.CompareDistances/CompareDistance): triage with rigorous
error bounds, exact rational fallback, symbolic pedestal ties."""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pytest

from s2geometry_spark.kernels import edges as E


def N(p):
    n = math.sqrt(sum(v * v for v in p))
    return (p[0] / n, p[1] / n, p[2] / n)


def exact_sign_of_true_difference(x, a, b):
    """Reference check: sign of |AX| - |BX| with all points projected
    exactly onto the sphere (rational arithmetic)."""
    fx = tuple(Fraction(v) for v in x)
    fa = tuple(Fraction(v) for v in a)
    fb = tuple(Fraction(v) for v in b)
    dot = lambda u, v: u[0] * v[0] + u[1] * v[1] + u[2] * v[2]
    cos_ax, cos_bx = dot(fx, fa), dot(fx, fb)
    sa = (cos_ax > 0) - (cos_ax < 0)
    sb = (cos_bx > 0) - (cos_bx < 0)
    if sa != sb:
        return -1 if sa > sb else 1
    cmp = cos_bx * cos_bx * dot(fa, fa) - cos_ax * cos_ax * dot(fb, fb)
    return sa * ((cmp > 0) - (cmp < 0))


class TestCompareDistances:
    def test_basic_orderings(self):
        x = N((1, 0, 0))
        a, b = N((1, 0.1, 0)), N((1, 0.2, 0))
        assert E.compare_distances(x, a, b) == -1
        assert E.compare_distances(x, b, a) == 1
        assert E.compare_distances(x, a, a) == 0
        far = N((-1, 0.001, 0))
        assert E.compare_distances(x, far, a) == 1

    def test_exact_tie_resolved_symbolically(self):
        """Mirror-symmetric points are exactly equidistant: the
        pedestal model makes the lexicographically smaller point
        farther — never 0 for distinct points."""
        x = N((1, 0, 0))
        a, b = N((1, 0.1, 0)), N((1, -0.1, 0))
        s = E.compare_distances(x, a, b)
        assert s == (1 if a < b else -1)
        assert s == -E.compare_distances(x, b, a)

    def test_one_ulp_resolved_exactly(self):
        x = N((1, 0, 0))
        for base in (1e-9, 1e-12, 0.3):
            a = N((1, base, 0))
            b = N((1, np.nextafter(base, 1), 0))
            if a == b:
                continue
            assert E.compare_distances(x, a, b) == -1
            assert E.compare_distances(x, b, a) == 1

    def test_matches_exact_rational_on_random_near_ties(self):
        rng = np.random.default_rng(23)
        checked = 0
        for _ in range(300):
            x = N(tuple(rng.standard_normal(3)))
            a = N(tuple(rng.standard_normal(3)))
            # b = a rotated a tiny amount around x (nearly equidistant)
            eps = 10.0 ** rng.uniform(-17, -9)
            t = rng.standard_normal(3)
            b = N(tuple(np.asarray(a) + eps * t))
            if a == b:
                continue
            want = exact_sign_of_true_difference(x, a, b)
            if want == 0:
                continue
            assert E.compare_distances(x, a, b) == want
            checked += 1
        assert checked > 200

    def test_large_angle_branch(self):
        """cos < -sqrt(1/2): the sin^2 comparison reverses."""
        x = N((1, 0, 0))
        a = N((-1, 0.01, 0))
        b = N((-1, 0.0100001, 0))
        want = exact_sign_of_true_difference(x, a, b)
        assert E.compare_distances(x, a, b) == want


class TestCompareDistance:
    def test_against_limit(self):
        x = N((1, 0, 0))
        y = N((1, 0.25, 0))
        r2 = sum((x[i] - y[i]) ** 2 for i in range(3))
        assert E.compare_distance(x, y, r2 * (1 + 1e-9)) == -1
        assert E.compare_distance(x, y, r2 * (1 - 1e-9)) == 1
        # the float chord itself resolves deterministically (never
        # crashes, and agrees with the exact projected comparison)
        assert E.compare_distance(x, y, r2) in (-1, 0, 1)
        assert E.compare_distance(x, x, 0.0) == 0

    def test_sin2_branch_small_distances(self):
        x = N((1, 0, 0))
        y = N((1, 1e-8, 0))
        r2_small = 1e-17
        r2_big = 1e-15
        assert E.compare_distance(x, y, r2_small) == 1
        assert E.compare_distance(x, y, r2_big) == -1
