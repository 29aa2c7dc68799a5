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


class TestSimplifyAvoiding:
    """simplify_polyline_avoiding: the S2Builder simplify_edge_chains
    discipline — output edges pass every obstacle on the same side as
    the original polyline (no obstacle is enclosed between the
    original path and the simplified path)."""

    def _enclosed(self, verts, idx, x):
        """True if x is enclosed by original-path + reversed
        simplified-path (winding != 0 around x)."""
        from s2geometry_spark.kernels.winding import winding_number

        V = [tuple(float(v) for v in p) for p in verts]
        simp = [V[i] for i in idx]
        ring = V + simp[::-1][1:-1]  # closed: fwd original, back simp
        if len(ring) < 3:
            return False
        from s2geometry_spark.kernels.edges import ORIGIN
        return winding_number(
            [np.asarray(ring)], tuple(x), ref_point=ORIGIN, ref_winding=0
        ) != 0

    def test_obstacle_blocks_shortcut(self):
        from s2geometry_spark.kernels.simplifier import (
            simplify_polyline,
            simplify_polyline_avoiding,
        )

        # a detour around an obstacle sitting inside the shortcut
        verts = TF.parse_points("0:0, 0.35:1, 0:2")
        tol = math.radians(1.0)  # large enough to cut the corner
        obstacle = TF.parse_points("0.15:1")[0]
        plain = simplify_polyline(verts, tol)
        assert plain == [0, 2]  # without topology: straight shortcut
        assert self._enclosed(verts, plain, obstacle)  # and it's wrong
        kept = simplify_polyline_avoiding(verts, tol, [obstacle])
        assert not self._enclosed(verts, kept, obstacle)

    def test_far_obstacles_do_not_block(self):
        from s2geometry_spark.kernels.simplifier import (
            simplify_polyline_avoiding,
        )

        verts = TF.parse_points(
            "0:0, 0.01:0.5, -0.01:1.0, 0.01:1.5, 0:2"
        )
        tol = math.radians(0.1)
        far = TF.parse_points("5:1, -5:1")
        idx = simplify_polyline_avoiding(verts, tol, far)
        assert idx == [0, 4]  # wiggles collapse; far points irrelevant

    def test_random_walks_never_enclose_obstacles(self):
        from s2geometry_spark.kernels.simplifier import (
            simplify_polyline_avoiding,
        )
        from s2geometry_spark.kernels.polyline import edge_distance

        rng = np.random.default_rng(17)
        tol = math.radians(0.08)
        for trial in range(20):
            lats = np.cumsum(rng.uniform(-0.05, 0.05, 30))
            lngs = np.arange(30) * 0.1
            txt = ", ".join(
                f"{a:.6f}:{b:.6f}" for a, b in zip(lats, lngs)
            )
            verts = TF.parse_points(txt)
            # obstacles sprinkled near (but > tol from) the polyline
            obs = []
            V = [tuple(float(x) for x in v) for v in verts]
            for _ in range(10):
                j = int(rng.integers(0, 29))
                side = 1 if rng.integers(0, 2) else -1
                la = (lats[j] + lats[j + 1]) / 2 + side * rng.uniform(
                    0.1, 0.3
                )
                ln = (lngs[j] + lngs[j + 1]) / 2
                p = TF.parse_points(f"{la:.6f}:{ln:.6f}")[0]
                pt = tuple(float(x) for x in p)
                d = min(
                    edge_distance(pt, V[k], V[k + 1])
                    for k in range(len(V) - 1)
                )
                if d > tol * 1.2:
                    obs.append(pt)
            idx = simplify_polyline_avoiding(verts, tol, obs)
            assert idx[0] == 0 and idx[-1] == 29
            for x in obs:
                assert not self._enclosed(verts, idx, x), (
                    f"trial {trial}: obstacle enclosed"
                )


class TestUsageLoopHardening:
    """Regression coverage for the module-level usage loops (found in
    review): restart must re-check extend's >90-degree precondition,
    never emit duplicate adjacent indices, and the avoid-point
    relevance filter must compare |AX| against |AC| / |AD|."""

    def test_near_antipodal_edge_does_not_crash(self):
        from s2geometry_spark.kernels.simplifier import simplify_polyline

        v = [
            (1.0, 0.0, 0.0),
            (math.cos(math.pi - 0.01), math.sin(math.pi - 0.01), 0.0),
        ]
        assert simplify_polyline(v, 0.1) == [0, 1]

    def test_no_duplicate_indices_on_long_first_edge(self):
        from s2geometry_spark.kernels.simplifier import simplify_polyline

        a = (1.0, 0.0, 0.0)
        b = (math.cos(2.0), math.sin(2.0), 0.0)
        c = (math.cos(2.2), math.sin(2.2), 0.0)
        out = simplify_polyline([a, b, c], 1e-3)
        assert out == [0, 1, 2]
        assert all(x != y for x, y in zip(out, out[1:]))

    def test_avoid_points_constrain_the_edge(self):
        import s2geometry_spark.kernels.simplifier as SS
        from s2geometry_spark.kernels.simplifier import (
            simplify_polyline_avoiding,
        )

        def ll(lat, lng):
            return (
                math.cos(lng) * math.cos(lat),
                math.sin(lng) * math.cos(lat),
                math.sin(lat),
            )

        chain = [
            ll(0, 0), ll(0.05, 0.2), ll(0, 0.4),
            ll(0.05, 0.6), ll(0, 0.8),
        ]
        obstacle = [ll(-0.25, 0.15)]  # |AC| < |AX| < |AE|
        calls = []
        orig = SS.PolylineSimplifier.avoid_disc

        def spy(self, p, r2, on_left):
            calls.append(on_left)
            return orig(self, p, r2, on_left)

        SS.PolylineSimplifier.avoid_disc = spy
        try:
            out = simplify_polyline_avoiding(chain, 0.12, obstacle)
        finally:
            SS.PolylineSimplifier.avoid_disc = orig
        # the buggy |XA|-vs-|XC| relevance filter never called
        # avoid_disc for this obstacle
        assert len(calls) >= 1
        # obstacle is south (right) of the west-to-east chain
        assert calls[0] is False
        assert out[0] == 0 and out[-1] == len(chain) - 1

    def test_avoided_simplification_preserves_side(self):
        from s2geometry_spark.kernels import edges as E
        from s2geometry_spark.kernels.simplifier import (
            simplify_polyline_avoiding,
        )

        def ll(lat, lng):
            return (
                math.cos(lng) * math.cos(lat),
                math.sin(lng) * math.cos(lat),
                math.sin(lat),
            )

        rng = np.random.default_rng(17)
        for _ in range(40):
            lats = rng.uniform(-0.03, 0.03, size=6)
            chain = [
                ll(float(lats[k]), 0.15 * k) for k in range(6)
            ]
            # obstacle safely below the chain but within the corridor
            obstacle = ll(-0.3, float(rng.uniform(0.1, 0.65)))
            out = simplify_polyline_avoiding(chain, 0.1, [obstacle])
            # every output edge must keep the obstacle on the right
            for u, v in zip(out, out[1:]):
                assert (
                    E.sign(obstacle, chain[u], chain[v]) < 0
                ), (out, u, v)
