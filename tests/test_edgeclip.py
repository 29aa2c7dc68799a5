"""S2EdgeClipping goldens/properties ported from
S2EdgeClippingTests.cs: face-segment continuity and error bounds,
ClipToPaddedFace angle coverage, 2D edge clipping, and the
edge->level-L cell covering used by the shape index."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import edgeclip as EC
from s2geometry_spark.kernels.geom import S1Interval, _face_uv_to_xyz, normalize


def N(p):
    n = math.sqrt(sum(v * v for v in p))
    return (p[0] / n, p[1] / n, p[2] / n)


def ang(a, b):
    c = np.cross(a, b)
    return math.atan2(math.sqrt(float(np.dot(c, c))), float(np.dot(a, b)))


def check_face_clipping(a_raw, b_raw):
    a, b = N(a_raw), N(b_raw)
    segs = EC.get_face_segments(a, b)
    assert len(segs) >= 1
    err = EC.FACE_CLIP_ERROR_RADIANS

    f0, a0_uv, _ = segs[0]
    fn, _, bn_uv = segs[-1]
    assert ang(a, normalize(_face_uv_to_xyz(f0, *a0_uv))) <= err
    assert ang(b, normalize(_face_uv_to_xyz(fn, *bn_uv))) <= err

    norm = N(EC._robust_cross_prod(a, b))
    a_tan = np.cross(norm, a)
    b_tan = np.cross(b, norm)
    for i, (face, sa, sb) in enumerate(segs):
        for uv in (sa, sb):
            assert -1 <= uv[0] <= 1 and -1 <= uv[1] <= 1
        if i == 0:
            continue
        pf, _, pb = segs[i - 1]
        assert pf != face
        # adjacent-face representations of the same interior vertex
        assert _face_uv_to_xyz(pf, *pb) == _face_uv_to_xyz(face, *sa)
        p = normalize(_face_uv_to_xyz(face, *sa))
        assert abs(float(np.dot(p, norm))) <= err
        assert float(np.dot(p, a_tan)) >= -err
        assert float(np.dot(p, b_tan)) >= -err

    # ClipToPaddedFace: union of per-face angle intervals covers AB
    padding = 0.0
    x_axis, y_axis = np.asarray(a), a_tan
    expected = S1Interval(0.0, ang(a, b))
    maxa = expected.expanded(err)
    actual = S1Interval.empty()
    for face in range(6):
        res = EC.clip_to_padded_face(a, b, face, padding)
        if res is None:
            continue
        a_uv, b_uv = res
        a_clip = normalize(_face_uv_to_xyz(face, *a_uv))
        b_clip = normalize(_face_uv_to_xyz(face, *b_uv))
        assert abs(float(np.dot(a_clip, norm))) <= err
        assert abs(float(np.dot(b_clip, norm))) <= err
        if ang(a_clip, a) > err:
            assert abs(max(abs(a_uv[0]), abs(a_uv[1])) - (1 + padding)) < 1e-12
        if ang(b_clip, b) > err:
            assert abs(max(abs(b_uv[0]), abs(b_uv[1])) - (1 + padding)) < 1e-12
        aa = math.atan2(float(np.dot(a_clip, y_axis)), float(np.dot(a_clip, x_axis)))
        ba = math.atan2(float(np.dot(b_clip, y_axis)), float(np.dot(b_clip, x_axis)))
        fa = S1Interval.from_point_pair(aa, ba)
        assert maxa.contains_interval(fa)
        actual = actual.union(fa)
    assert actual.expanded(err).contains_interval(expected)


SIMPLE_CASES = [
    ((1, -0.5, -0.5), (1, 0.5, 0.5)),      # within one face
    ((1, 0, 0), (0, 1, 0)),                # crosses one cube edge
    ((0.75, 0, -1), (0.75, 0, 1)),         # opposite edges of face 0
    ((1, 0.2, 0.4), (-1, -0.2, 0.7)),      # nearly antipodal-ish span
    ((1, 1, 1), (-1, -1, -1e-5)),          # long edge near a corner
    ((0.1, 1, 0.1), (0.1, -1, 0.15)),      # crosses faces 1 -> 0? -> 4
]


@pytest.mark.parametrize("case", SIMPLE_CASES)
def test_face_clipping_simple(case):
    a, b = case
    check_face_clipping(a, b)
    check_face_clipping(b, a)


def test_face_clipping_perturbed_corners():
    """Deterministic version of the reference's
    PerturbedCornerOrMidpoint stress cases."""
    rng = np.random.default_rng(1234)
    corners = [np.array(v, dtype=float) for v in
               [(1, 1, 1), (1, 1, -1), (1, -1, 1), (-1, 1, 1)]]
    for _ in range(120):
        p, q = corners[rng.integers(4)], corners[rng.integers(4)]
        a = (rng.integers(3) - 1) * p + (rng.integers(3) - 1) * q
        b = (rng.integers(3) - 1) * p + (rng.integers(3) - 1) * q
        a = a + 1e-10 * rng.uniform(1e-10, 1) * rng.standard_normal(3)
        b = b + 1e-10 * rng.uniform(1e-10, 1) * rng.standard_normal(3)
        if np.dot(a, a) < 1e-300 or np.dot(b, b) < 1e-300:
            continue
        an, bn = N(tuple(a)), N(tuple(b))
        if an == bn or an == tuple(-x for x in bn):
            continue
        check_face_clipping(an, bn)


class TestClipEdge2D:
    def test_basic(self):
        clip = ((0.0, 1.0), (0.0, 1.0))
        got = EC.clip_edge((-1.0, 0.5), (2.0, 0.5), clip)
        assert got == ((0.0, 0.5), (1.0, 0.5))
        assert EC.clip_edge((-1.0, -1.0), (-0.5, 2.0), clip) is None
        # diagonal through the unit square
        got = EC.clip_edge((-1.0, -1.0), (2.0, 2.0), clip)
        assert got is not None
        (ax, ay), (bx, by) = got
        assert abs(ax - ay) < 1e-12 and abs(bx - by) < 1e-12
        assert 0 <= ax <= 1 and 0 <= bx <= 1

    def test_consistent_with_intersects_rect(self):
        rng = np.random.default_rng(9)
        clip = ((-0.3, 0.4), (-0.2, 0.5))
        hits = 0
        for _ in range(500):
            a = tuple(rng.uniform(-1, 1, 2))
            b = tuple(rng.uniform(-1, 1, 2))
            got = EC.clip_edge(a, b, clip)
            inter = EC.intersects_rect(a, b, clip)
            # clip_edge success implies intersection (within error)
            if got is not None:
                assert inter
                hits += 1
                for p in got:
                    assert clip[0][0] - 1e-12 <= p[0] <= clip[0][1] + 1e-12
                    assert clip[1][0] - 1e-12 <= p[1] <= clip[1][1] + 1e-12
        assert hits > 50


class TestEdgeCoveringCells:
    @pytest.mark.parametrize("level", [4, 8, 11])
    def test_covers_all_sample_points(self, level):
        """Every point of the geodesic must land in a covered cell —
        the conservativeness the shape index depends on."""
        rng = np.random.default_rng(5)
        for _ in range(30):
            a = N(tuple(rng.standard_normal(3)))
            b_dir = rng.standard_normal(3)
            t = rng.uniform(0.001, 0.5)
            b = N(tuple(np.asarray(a) + t * b_dir))
            cells = set(EC.edge_covering_cells(a, b, level))
            assert cells
            # sample along the geodesic
            for s in np.linspace(0, 1, 64):
                p = normalize(tuple((1 - s) * np.asarray(a) + s * np.asarray(b)))
                leaf = CI.xyz_to_cellid(
                    np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
                )
                anc = int(CI.parent(leaf, level)[0])
                assert anc in cells, (a, b, level, s)

    def test_cross_face_edge(self):
        a, b = N((1, 0.01, 0.01)), N((0.01, 1, 0.01))
        cells = set(EC.edge_covering_cells(a, b, 6))
        faces = {CI.face(np.array([c], dtype=np.uint64))[0] for c in cells}
        assert {0, 1} <= set(int(f) for f in faces)
        for s in np.linspace(0, 1, 128):
            p = normalize(tuple((1 - s) * np.asarray(a) + s * np.asarray(b)))
            leaf = CI.xyz_to_cellid(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )
            assert int(CI.parent(leaf, 6)[0]) in cells
