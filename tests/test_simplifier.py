"""S2PolylineSimplifier goldens ported from
S2GeometryTests/S2PolylineSimplifierTests.cs (deterministic cases
verbatim; the randomized Precision sweep re-created with numpy
randomness since it depends only on the construction, not the PRNG).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.simplifier import (
    PolylineSimplifier,
    chord2_from_radians,
)


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    return tuple(v / np.linalg.norm(v))


def check_simplify(src, dst, target, avoid, disc_on_left, radius_deg, want):
    r2 = chord2_from_radians(math.radians(radius_deg))
    s = PolylineSimplifier(TF.make_point(src))
    for p in (TF.parse_points(target) if target else []):
        s.target_disc(tuple(p), r2)
    for p, on_left in zip(
        (TF.parse_points(avoid) if avoid else []), disc_on_left
    ):
        s.avoid_disc(tuple(p), r2, on_left)
    assert s.extend(TF.make_point(dst)) == want, (
        f"src={src} dst={dst} target={target!r} avoid={avoid!r}"
    )


class TestSimplifierGoldens:
    def test_reuse_constraints_accumulate(self):
        # S2PolylineSimplifierTests.cs Test_S2PolylineSimplifier_Reuse
        r2 = chord2_from_radians(math.radians(10))
        s = PolylineSimplifier((1, 0, 0))
        assert s.target_disc(_norm((1, 1, 0)), r2)
        assert s.target_disc(_norm((1, 1, 0.1)), r2)
        assert not s.extend(_norm((1, 1, 0.4)))
        # fresh simplifier is independent
        s = PolylineSimplifier((1, 0, 0))
        assert s.target_disc(_norm((1, 1, 0.3)), r2)
        assert s.target_disc(_norm((1, 1, 0.2)), r2)
        assert not s.extend(_norm((1, 1, 0)))

    def test_no_constraints(self):
        check_simplify("0:1", "0:1", "", "", [], 0, True)
        check_simplify("0:1", "1:0", "", "", [], 0, True)
        # edges > 90 degrees unsupported
        check_simplify("0:0", "0:91", "", "", [], 0, False)

    def test_target_one_point(self):
        check_simplify("0:0", "0:2", "0:1", "", [], 1e-10, True)
        check_simplify("0:0", "0:2", "1:1", "", [], 0.9, False)
        # disc containing src / dst
        check_simplify("0:0", "0:2", "0:0.1", "", [], 1.0, True)
        check_simplify("0:0", "0:2", "0:2.1", "", [], 1.0, True)

    def test_avoid_one_point(self):
        check_simplify("0:0", "0:2", "", "0:1", [True], 1e-10, False)
        check_simplify("0:0", "0:2", "", "1:1", [True], 0.9, True)
        # point on the left but required on the right
        check_simplify("0:0", "0:2", "", "1:1", [False], 1e-10, False)
        # disc behind src: disc_on_left must not matter
        check_simplify("0:0", "0:2", "", "1:-1", [False], 1.4, True)
        check_simplify("0:0", "0:2", "", "1:-1", [True], 1.4, True)
        check_simplify("0:0", "0:2", "", "-1:-1", [False], 1.4, True)
        check_simplify("0:0", "0:2", "", "-1:-1", [True], 1.4, True)

    def test_avoid_several_points(self):
        # three tiny discs 120 deg apart, disc_on_left all true leaves
        # three ~30 deg gaps; all-false blocks every direction
        for dst in ("0:2", "1.732:-1", "-1.732:-1"):
            check_simplify(
                "0:0", dst, "", "0.01:2, 1.732:-1.01, -1.732:-0.99",
                [True, True, True], 0.00001, True,
            )
            check_simplify(
                "0:0", dst, "", "0.01:2, 1.732:-1.01, -1.732:-0.99",
                [False, False, False], 0.00001, False,
            )

    def test_target_and_avoid(self):
        check_simplify(
            "0:0", "10:10", "2:3, 4:3, 7:8", "4:2, 7:5, 7:9",
            [True, True, False], 1.0, True,
        )
        check_simplify(
            "0:0", "10:10", "2:3, 4:6, 7:8", "4:2, 7:5, 7:9",
            [True, True, False], 1.0, False,
        )
        check_simplify(
            "0:0", "10:10", "2:3, 4:3, 7:8", "4:2, 6:5, 7:9",
            [True, True, False], 1.0, False,
        )


def _point_on_line(a, b, radius_rad):
    """Point at angular distance radius_rad from a toward b."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    t = b - a * np.dot(a, b)
    n = np.linalg.norm(t)
    if n == 0:
        raise ValueError("degenerate direction")
    t /= n
    return tuple(a * math.cos(radius_rad) + t * math.sin(radius_rad))


class TestSimplifierPrecision:
    """Randomized conservative-margin sweep mirroring the reference
    Precision test: target discs that barely overlap a random edge and
    avoid discs that barely miss it; with margins wider than the
    documented 25*eps error bound the simplifier must accept, and must
    reject when exactly one disc is made infeasible."""

    # the reference uses 25*eps because its disc construction is exact
    # (S2.GetPointOnLine + S1Angle); this numpy re-creation has ~1e-10
    # construction error, so the margin must dominate that instead —
    # still 6 orders below the disc radii, so the sweep remains sharp
    MAX_ERR = 1e-9

    def test_precision_sweep(self):
        rng = np.random.default_rng(20260817)
        n_discs = 5
        iters = 300
        for _ in range(iters):
            src = rng.standard_normal(3)
            src /= np.linalg.norm(src)
            tgt = rng.standard_normal(3)
            tgt /= np.linalg.norm(tgt)
            dst = _point_on_line(src, tgt, rng.uniform(0.05, 1.0))
            n = np.cross(src, dst)
            n /= np.linalg.norm(n)
            s = PolylineSimplifier(src)
            bad_disc = int(rng.integers(0, 2 * n_discs)) - n_discs
            for i in range(n_discs):
                f = rng.uniform(-0.5, 1.0)
                a = (1 - f) * np.asarray(src) + f * np.asarray(dst)
                a /= np.linalg.norm(a)
                r = rng.uniform(1e-6, 1.0)
                on_left = bool(rng.integers(0, 2))
                x = _point_on_line(a, a + (n if on_left else -n), r)
                if f < 0:
                    r = math.acos(
                        np.clip(np.dot(src, np.asarray(x)), -1, 1)
                    )
                avoid = bool(rng.integers(0, 2))
                grow = avoid == (i == bad_disc)
                rr = r + self.MAX_ERR if grow else max(0.0, r - self.MAX_ERR)
                r2 = chord2_from_radians(rr)
                if avoid:
                    s.avoid_disc(tuple(x), r2, on_left)
                else:
                    s.target_disc(tuple(x), r2)
            assert s.extend(dst) == (bad_disc < 0)


class TestSimplifyPolyline:
    def test_straight_line_collapses(self):
        from s2geometry_spark.kernels.simplifier import simplify_polyline

        verts = TF.parse_points(
            "0:0, 0:0.5, 0:1, 0:1.5, 0:2, 0:2.5, 0:3"
        )
        idx = simplify_polyline(verts, math.radians(0.01))
        assert idx[0] == 0 and idx[-1] == len(verts) - 1
        assert len(idx) <= 3  # interior collinear vertices dropped

    def test_zigzag_above_tolerance_kept(self):
        from s2geometry_spark.kernels.simplifier import simplify_polyline

        verts = TF.parse_points("0:0, 1:1, 0:2, 1:3, 0:4")
        idx = simplify_polyline(verts, math.radians(0.1))
        assert idx == [0, 1, 2, 3, 4]  # every bend exceeds tolerance

    def test_simplified_stays_within_tolerance(self):
        from s2geometry_spark.kernels.polyline_ops import (
            is_edge_b_near_edge_a,
        )
        from s2geometry_spark.kernels.simplifier import simplify_polyline

        rng = np.random.default_rng(5)
        lats = np.cumsum(rng.uniform(-0.02, 0.02, 40))
        lngs = np.arange(40) * 0.05
        txt = ", ".join(f"{a:.6f}:{b:.6f}" for a, b in zip(lats, lngs))
        verts = TF.parse_points(txt)
        tol = math.radians(0.05)
        idx = simplify_polyline(verts, tol)
        assert idx[0] == 0 and idx[-1] == 39 and len(idx) < 40
        # every dropped vertex lies within tolerance of the kept edge
        # spanning it (the simplifier's guarantee is conservative)
        V = [tuple(float(x) for x in v) for v in verts]
        for a, b in zip(idx, idx[1:]):
            for m in range(a + 1, b):
                assert is_edge_b_near_edge_a(V[a], V[b], V[m], V[m], tol)
