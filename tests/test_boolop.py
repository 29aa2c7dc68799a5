"""Boolean loop operations vs point-sampling + area-identity oracles
(general position; S2BooleanOperation semantics for the snap-free
case)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernels import boolop as B
from s2geometry_spark.kernels import edges as E
from s2geometry_spark.kernels import measures as M
from s2geometry_spark.kernels.loop import Loop
from s2geometry_spark.sources import regions_src as R


def _shifted(key, du):
    cx, cy, cz, _ = R.cap_params(key)
    u = E.ortho((cx, cy, cz))
    base = R.loop_vertices(key)
    out = base + np.array(u)[None, :] * du
    return Loop(out / np.linalg.norm(out, axis=1)[:, None])


def _membership(rings, pts):
    if not rings:
        return np.zeros(len(pts), bool)
    edges = []
    for r in rings:
        n = len(r)
        edges.extend((r[k], r[(k + 1) % n]) for k in range(n))
    return E.crossing_parity_fast_edges(
        edges, pts[:, 0], pts[:, 1], pts[:, 2]
    ).astype(bool)


def _sample(key, n, rng):
    cx, cy, cz, _ = R.cap_params(key)
    c = np.array([cx, cy, cz])
    u = np.array(E.ortho(tuple(c)))
    v = np.cross(c, u)
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(0, 0.3, n)
    pts = (
        np.cos(rad)[:, None] * c
        + np.sin(rad)[:, None] * (np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v)
    )
    return pts / np.linalg.norm(pts, axis=1)[:, None]


OPS = ("intersection", "union", "difference")


class TestLoopBoolean:
    @pytest.mark.parametrize("key", range(8))
    def test_point_sampling_oracle(self, key):
        rng = np.random.default_rng(100 + key)
        a = Loop(R.loop_vertices(key))
        b = _shifted(key, 0.04 + 0.01 * (key % 3))
        pts = _sample(key, 2500, rng)
        in_a = a.contains_points(pts)
        in_b = b.contains_points(pts)
        want = {
            "intersection": in_a & in_b,
            "union": in_a | in_b,
            "difference": in_a & ~in_b,
        }
        for op in OPS:
            rings = B.loop_boolean(a, b, op)
            got = _membership(rings, pts)
            np.testing.assert_array_equal(got, want[op])

    def test_area_identity(self):
        # area(A) + area(B) == area(A|B) + area(A&B)
        for key in range(4):
            a = Loop(R.loop_vertices(key))
            b = _shifted(key, 0.05)
            ar = M.loop_area(a.verts)
            br = M.loop_area(b.verts)

            def rings_area(rings):
                return sum(M.loop_area(r) for r in rings)

            ua = rings_area(B.loop_boolean(a, b, "union"))
            ia = rings_area(B.loop_boolean(a, b, "intersection"))
            assert abs((ar + br) - (ua + ia)) < 1e-10

    def test_disjoint_and_nested(self):
        a = Loop(R.loop_vertices(0))
        far = Loop(R.loop_vertices(9))  # different center: disjoint
        assert B.loop_boolean(a, far, "intersection") == []
        assert len(B.loop_boolean(a, far, "union")) == 2
        got = B.loop_boolean(a, far, "difference")
        assert len(got) == 1 and np.array_equal(got[0], a.verts)

        # nested: shrink a toward its centroid
        cen = np.array(M.loop_centroid(a.verts))
        cen /= np.linalg.norm(cen)
        inner_v = a.verts * 0.4 + cen[None, :] * 0.6
        inner = Loop(inner_v / np.linalg.norm(inner_v, axis=1)[:, None])
        assert len(B.loop_boolean(inner, a, "intersection")) == 1
        assert len(B.loop_boolean(inner, a, "difference")) == 0
        ann = B.loop_boolean(a, inner, "difference")
        assert len(ann) == 2  # shell + hole


def _ll(lat, lng):
    import math

    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(la) * math.cos(lo),
        math.cos(la) * math.sin(lo),
        math.sin(la),
    )


class TestRingsArea:
    """Nesting-parity area over boolean result rings — the multi-ring
    cases the old shell-minus-hole heuristic got wrong."""

    SQUARE = np.array(
        [_ll(-10, -10), _ll(-10, 10), _ll(10, 10), _ll(10, -10)]
    )
    INNER = np.array([_ll(-3, -3), _ll(-3, 3), _ll(3, 3), _ll(3, -3)])
    BAND = np.array([_ll(-20, -2), _ll(-20, 2), _ll(20, 2), _ll(20, -2)])

    def test_annulus_difference(self):
        rings = B.loop_boolean(
            Loop(self.SQUARE), Loop(self.INNER), "difference"
        )
        assert len(rings) == 2
        want = M.loop_area(self.SQUARE) - M.loop_area(self.INNER)
        assert abs(B.rings_area(rings) - want) < 1e-12

    def test_split_difference_two_shells(self):
        # BAND cuts SQUARE into two disjoint shells: the area is the
        # SUM of the two rings, not shell-minus-hole.
        a, b = Loop(self.SQUARE), Loop(self.BAND)
        rings = B.loop_boolean(a, b, "difference")
        assert len(rings) == 2
        inter = B.loop_boolean(a, b, "intersection")
        want = M.loop_area(self.SQUARE) - sum(
            M.loop_area(r) for r in inter
        )
        got = B.rings_area(rings)
        assert abs(got - want) < 1e-10
        # each ring is a shell (depth 0): the parity sum equals the sum
        assert abs(got - sum(M.loop_area(r) for r in rings)) < 1e-15

    def test_nested_symmetric_difference(self):
        rings = B.loop_boolean(
            Loop(self.SQUARE), Loop(self.INNER), "symmetric_difference"
        )
        assert len(rings) == 2
        want = M.loop_area(self.SQUARE) - M.loop_area(self.INNER)
        assert abs(B.rings_area(rings) - want) < 1e-12

    @pytest.mark.parametrize("key", range(4))
    def test_monte_carlo_parity(self, key):
        # independent oracle: rings_area vs winding-parity membership of
        # uniform samples over the enclosing cap region
        rng = np.random.default_rng(500 + key)
        a = Loop(R.loop_vertices(key))
        b = _shifted(key, 0.05)
        cx, cy, cz, cap_rad = R.cap_params(key)
        samp_rad = min(np.pi, cap_rad + 0.3)  # covers A ∪ B
        cap_area = 2.0 * np.pi * (1.0 - np.cos(samp_rad))
        # uniform-AREA cap sampling: cos(r) uniform on [cos R, 1]
        c = np.array([cx, cy, cz])
        u = np.array(E.ortho(tuple(c)))
        v = np.cross(c, u)
        n = 40000
        cosr = rng.uniform(np.cos(samp_rad), 1.0, n)
        sinr = np.sqrt(1.0 - cosr**2)
        ang = rng.uniform(0, 2 * np.pi, n)
        pts = (
            cosr[:, None] * c
            + sinr[:, None]
            * (np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v)
        )
        pts /= np.linalg.norm(pts, axis=1)[:, None]
        for op in OPS + ("symmetric_difference",):
            rings = B.loop_boolean(a, b, op)
            frac = float(np.mean(_membership(rings, pts)))
            mc = frac * cap_area
            got = B.rings_area(rings)
            # MC standard error ~ sqrt(p(1-p)/n)*cap_area
            se = np.sqrt(max(frac * (1 - frac), 1e-6) / 40000) * cap_area
            assert abs(got - mc) < 5 * se + 1e-6, (op, got, mc, se)
