"""Polyline + edge-distance kernels vs brute-force/analytic oracles
(S2EdgeDistancesTests / S2PolylineTests strategy)."""

from __future__ import annotations

import math

import numpy as np

from s2geometry_spark.kernels import polyline as PL


def _unit(v):
    a = np.asarray(v, float)
    return tuple(a / np.linalg.norm(a))


def _chord2_of_angle(r):
    return 4 * math.sin(r / 2) ** 2


class TestEdgeDistance:
    def test_endpoint_and_perpendicular(self):
        a, b = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)
        # point on the edge: distance 0
        m = _unit((1, 1, 0))
        assert PL.edge_distance(m, a, b) < 1e-15
        # pole is 90 degrees from every point of the equator edge
        assert abs(PL.edge_distance((0.0, 0.0, 1.0), a, b) - math.pi / 2) < 1e-15
        # beyond endpoint: distance to endpoint
        q = _unit((1, -0.5, 0))
        expect = math.atan2(0.5, 1)
        assert abs(PL.edge_distance(q, a, b) - expect) < 1e-12

    def test_interior_closed_form(self):
        a, b = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)
        # 30 degrees above the midpoint of the edge
        lat = math.radians(30)
        p = _unit((math.cos(lat) / math.sqrt(2), math.cos(lat) / math.sqrt(2), math.sin(lat)))
        assert abs(PL.edge_distance(p, a, b) - lat) < 1e-12

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(11)
        pts = rng.normal(size=(300, 3))
        pts /= np.linalg.norm(pts, axis=1)[:, None]
        a = _unit((1, 0.2, -0.1))
        b = _unit((0.3, 1, 0.2))
        batch = PL.edge_distance2_batch(pts[:, 0], pts[:, 1], pts[:, 2], a, b)
        for i in range(300):
            scalar = PL.edge_distance2(tuple(pts[i]), a, b)
            assert batch[i] == scalar

    def test_project_on_edge(self):
        a, b = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)
        p = _unit((1, 1, 0.5))
        proj = PL.project_to_edge(p, a, b)
        # projection is on the edge great circle, equidistant sanity
        assert abs(proj[2]) < 1e-15
        d = PL.edge_distance(p, a, b)
        assert abs(PL.vec_angle(p, proj) - d) < 1e-12


class TestPolyline:
    def _pl(self):
        return PL.Polyline(
            [
                (1.0, 0.0, 0.0),
                _unit((1, 1, 0)),
                (0.0, 1.0, 0.0),
                _unit((0, 1, 1)),
            ]
        )

    def test_length(self):
        pl = self._pl()
        assert abs(pl.length() - 3 * math.pi / 4) < 1e-12

    def test_interpolate_uninterpolate_round_trip(self):
        pl = self._pl()
        for frac in (0.0, 0.1, 1 / 3, 0.5, 0.75, 0.99):
            p, nv = pl.interpolate(frac)
            assert abs(np.linalg.norm(p) - 1) < 1e-14
            back = pl.uninterpolate(p, nv)
            assert abs(back - frac) < 1e-12
        # endpoint clamp
        p, nv = pl.interpolate(1.5)
        assert p == pl.verts[-1]

    def test_interpolate_midpoint(self):
        pl = PL.Polyline([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)])
        p, _ = pl.interpolate(0.5)
        assert abs(p[0] - p[1]) < 1e-15 and abs(p[2]) < 1e-15

    def test_project_onto_polyline(self):
        pl = self._pl()
        # a point near the second segment projects onto it
        p = _unit((0.5, 1, 0.05))
        proj, nv = pl.project(p)
        assert PL.edge_distance2(proj, pl.verts[1], pl.verts[2]) < 1e-20
        assert nv in (2, 3)

    def test_is_on_right(self):
        pl = PL.Polyline([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)])
        assert pl.is_on_right(_unit((1, 1, -0.2)))  # south of equator edge
        assert not pl.is_on_right(_unit((1, 1, 0.2)))


class TestPolylineCentroid:
    def test_straight_arc_centroid(self):
        import math

        import numpy as np

        from s2geometry_spark.kernels.polyline import polyline_centroid

        verts = [
            (math.cos(t), math.sin(t), 0.0) for t in np.linspace(0, 0.4, 5)
        ]
        c = polyline_centroid(verts)
        n = math.sqrt(sum(v * v for v in c))
        mid = (math.cos(0.2), math.sin(0.2), 0.0)
        assert max(abs(c[i] / n - mid[i]) for i in range(3)) < 1e-9
        # |sum of edge centroids| == 2*sin(L/2) for a single great-circle arc
        assert abs(n - 2 * math.sin(0.2)) < 1e-12

    def test_symmetric_chain_cancels(self):
        from s2geometry_spark.kernels.polyline import polyline_centroid

        verts = [(0.0, -1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
        c = polyline_centroid(verts)
        assert abs(c[1]) < 1e-15  # y components cancel by symmetry
        assert c[0] > 0


class TestIsOnRightInteriorVertex:
    """S2Polyline.cs:351-360: when the closest point is an INTERIOR
    vertex, sidedness is OrderedCCW(prev, P, next, C) — testing one
    adjacent edge's great circle gives the wrong answer at reflex
    corners (found in review by fuzzing against the reference rule)."""

    @staticmethod
    def _reference_is_on_right(pl, p):
        from s2geometry_spark.kernels import edges as E

        closest, nv = pl.project(p)
        v = pl.verts
        if closest == v[nv - 1] and 1 < nv < len(v):
            if p == v[nv - 1]:
                return False
            return E.ordered_ccw(v[nv - 2], p, v[nv], v[nv - 1])
        i = min(max(nv, 1), len(v) - 1)
        return E.sign(p, v[i - 1], v[i]) < 0

    def test_fuzz_matches_reference_rule(self):
        rng = np.random.default_rng(3)
        for _ in range(400):
            n = int(rng.integers(3, 7))
            raw = rng.normal(size=(n, 3))
            raw /= np.linalg.norm(raw, axis=1, keepdims=True)
            pl = PL.Polyline(raw)
            q = rng.normal(size=3)
            q /= np.linalg.norm(q)
            q = tuple(float(x) for x in q)
            assert pl.is_on_right(q) == self._reference_is_on_right(
                pl, q
            )

    def test_reflex_corner(self):
        # right-angle corner at B: A=(1,0,0) -> B=(0,1,0) -> C=(0,1,1)/n
        a = (1.0, 0.0, 0.0)
        b = (0.0, 1.0, 0.0)
        c = _unit((0.0, 1.0, 1.0))
        pl = PL.Polyline([a, b, c])
        # polyline vertices are never on the right
        assert not pl.is_on_right(b)
