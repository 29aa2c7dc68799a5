"""Round-4 S2BufferOperation surface: point / polyline inputs,
negative radius (contraction), polygons with holes, and multi-layer
union — golden cases ported from S2GeometryTests/S2BufferOperationTests.cs
(TestSignedBuffer / PointsAndPolylinesAreRemoved /
NegativeBufferRadiusMultipleLayers / BufferedPointsAreSymmetric /
SetCircleSegments / ZigZagPolyline).  Every constructive call runs
with check=True, so each case is additionally Monte-Carlo-validated
against the within-distance predicate inside the kernel itself."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import buffer as B
from s2geometry_spark.kernels import measures as M

DEG = math.pi / 180.0


def ll(lat: float, lng: float) -> np.ndarray:
    """Reference test notation 'lat:lng' in degrees -> unit vector."""
    phi, th = lat * DEG, lng * DEG
    return np.array(
        [
            math.cos(phi) * math.cos(th),
            math.cos(phi) * math.sin(th),
            math.sin(phi),
        ]
    )


def loop_of(*latlngs) -> np.ndarray:
    return np.stack([ll(*p) for p in latlngs])


SQUARE = loop_of((-3, -3), (-3, 3), (3, 3), (3, -3))
# hole ring of the reference HollowSquare case, given CW so the polygon
# interior (between the squares) is on its left
HOLE_CW = loop_of((2, 2), (-2, 2), (-2, -2), (2, -2))
ZIGZAG_LOOP = loop_of(
    (0, 0), (0, 7), (5, 3), (5, 10), (6, 10), (6, 1), (1, 5), (1, 0)
)
ZIGZAG_LINE = loop_of((0, 0), (0, 7), (5, 3), (5, 10))


# --- points -----------------------------------------------------------

def test_buffered_points_are_symmetric():
    """S2BufferOperationTests.BufferedPointsAreSymmetric: points buffer
    into regular polygons (all edge lengths equal)."""
    ring = B.circle_ring(np.array([1.0, 0.0, 0.0]), 5 * DEG, 0.001234567)
    nxt = np.roll(ring, -1, axis=0)
    edge_len = 2 * np.arcsin(np.linalg.norm(nxt - ring, axis=1) / 2)
    assert np.abs(edge_len - edge_len[0]).max() <= 1e-14


@pytest.mark.parametrize("segments", range(3, 21))
def test_set_circle_segments(segments):
    """S2BufferOperationTests.SetCircleSegments: a buffered point has
    exactly circle_segments edges (tiny radius)."""
    ring = B.circle_ring(
        np.array([1.0, 0.0, 0.0]), 1e-12, num_segments=segments
    )
    assert len(ring) == segments


def test_point_shell_signed():
    """S2BufferOperationTests.PointShell (TestSignedBuffer at pi/2):
    positive radius gives the hemisphere disc, negative removes the
    point.  At exactly pi/2 the ring is a great circle, whose signed
    area is orientation-ambiguous (+-2*pi) — assert the magnitude, and
    check the exact disc-area formula at 80 deg where it is not."""
    p = ll(0, 0)
    rings = B.buffer_point_rings(p, math.pi / 2, tolerance=5e-3)
    assert len(rings) == 1
    assert abs(abs(M.loop_signed_area(rings[0])) - 2 * math.pi) < 0.05
    (r80,) = B.buffer_point_rings(p, 80 * DEG, tolerance=5e-3)
    want = 2 * math.pi * (1 - math.cos(80 * DEG))
    assert abs(M.loop_signed_area(r80) - want) < 0.01
    assert B.buffer_point_rings(p, -1 * DEG) == []


# --- polylines --------------------------------------------------------

@pytest.mark.parametrize("end_cap", ["round", "flat"])
def test_zigzag_polyline(end_cap):
    """S2BufferOperationTests.ZigZagPolyline (two-sided, round + flat
    caps) — internal Monte-Carlo validation is the assertion."""
    rings = B.buffer_polyline_rings(
        ZIGZAG_LINE, 1 * DEG, end_cap=end_cap, check=True
    )
    assert len(rings) >= 1
    area = sum(M.loop_signed_area(r) for r in rings)
    # stadium area ~ 2*r*len + pi*r^2 (round); flat is strictly smaller
    assert area > 0
    if end_cap == "flat":
        round_area = sum(
            M.loop_signed_area(r)
            for r in B.buffer_polyline_rings(
                ZIGZAG_LINE, 1 * DEG, end_cap="round", check=False
            )
        )
        assert area < round_area


def test_polyline_second_reference_case():
    """Second ZigZagPolyline fixture ('10:0, 0:0, 5:1') — a sharp
    reversal angle at 0:0."""
    line = loop_of((10, 0), (0, 0), (5, 1))
    for end_cap in ("round", "flat"):
        rings = B.buffer_polyline_rings(line, 1 * DEG, end_cap=end_cap)
        assert len(rings) >= 1


def test_polyline_negative_radius_removed():
    """S2BufferOperationTests.PointsAndPolylinesAreRemoved."""
    assert B.buffer_polyline_rings(ZIGZAG_LINE, -1 * DEG) == []


# --- polygons: signed buffering --------------------------------------

def test_square_signed():
    """S2BufferOperationTests.Square (TestSignedBuffer at 1 deg):
    expansion grows the area, contraction shrinks it, both validated
    against the exact predicate inside the kernel."""
    base = M.loop_signed_area(SQUARE)
    grown = B.buffer_polygon_rings([SQUARE], 1 * DEG)
    shrunk = B.buffer_polygon_rings([SQUARE], -1 * DEG)
    assert sum(M.loop_signed_area(r) for r in grown) > base
    assert 0 < sum(M.loop_signed_area(r) for r in shrunk) < base


def test_hollow_square_signed():
    """S2BufferOperationTests.HollowSquare: shell + hole, both signs.
    Expanding by 1 deg swallows the 1-deg-wide annulus hole; the
    contraction keeps both rings."""
    rings_in = [SQUARE, HOLE_CW]
    base = sum(M.loop_signed_area(r) for r in rings_in)
    grown = B.buffer_polygon_rings(rings_in, 1 * DEG)
    shrunk = B.buffer_polygon_rings(rings_in, -0.2 * DEG)
    assert sum(M.loop_signed_area(r) for r in grown) > base
    a_shrunk = sum(M.loop_signed_area(r) for r in shrunk)
    assert 0 < a_shrunk < base
    assert len(shrunk) == 2  # annulus survives a small contraction


def test_zigzag_loop_signed():
    """S2BufferOperationTests.ZigZagLoop (TestSignedBuffer at 0.2 deg)."""
    base = M.loop_signed_area(ZIGZAG_LOOP)
    grown = B.buffer_polygon_rings([ZIGZAG_LOOP], 0.2 * DEG)
    shrunk = B.buffer_polygon_rings([ZIGZAG_LOOP], -0.2 * DEG)
    assert sum(M.loop_signed_area(r) for r in grown) > base
    assert 0 <= sum(M.loop_signed_area(r) for r in shrunk) < base


def test_contraction_to_empty():
    """Contracting past the inradius empties the polygon (reference
    TestRadiiAndErrorFractions covers radii beyond the shape size)."""
    assert B.buffer_polygon_rings([SQUARE], -10 * DEG) == []


def test_zero_radius_identity():
    rings = B.buffer_polygon_rings([SQUARE], 0.0)
    assert len(rings) == 1
    assert np.allclose(rings[0], SQUARE)


# --- multi-layer union ------------------------------------------------

def test_union_two_overlapping_loops():
    """Two overlapping squares buffered in one winding operation merge
    into a single shell (S2BufferOperation multi-layer union)."""
    sq2 = loop_of((-3, 2), (-3, 8), (3, 8), (3, 2))
    rings = B.buffer_shapes_union_rings(
        [("loop", SQUARE), ("loop", sq2)], 0.5 * DEG
    )
    assert len(rings) == 1
    a = sum(M.loop_signed_area(r) for r in rings)
    assert a < (
        sum(M.loop_signed_area(r)
            for r in B.buffer_polygon_rings([SQUARE], 0.5 * DEG))
        + sum(M.loop_signed_area(r)
              for r in B.buffer_polygon_rings([sq2], 0.5 * DEG))
    )


def test_union_disjoint_shapes_stay_separate():
    far = loop_of((20, 20), (20, 26), (26, 26), (26, 20))
    rings = B.buffer_shapes_union_rings(
        [("loop", SQUARE), ("loop", far)], 0.5 * DEG
    )
    assert len(rings) == 2


def test_union_mixed_modalities():
    """Point + polyline + polygon layers in one union."""
    rings = B.buffer_shapes_union_rings(
        [
            ("point", ll(10, 10)),
            ("polyline", loop_of((8, 0), (8, 5))),
            ("loop", SQUARE),
        ],
        0.8 * DEG,
    )
    assert len(rings) >= 2  # the far point stays its own disc
    a = sum(M.loop_signed_area(r) for r in rings)
    assert a > 0


def test_union_zero_radius_polygon_union():
    """Radius 0 computes the polygon union (S2BufferOperation.cs:18-19)."""
    sq2 = loop_of((-3, 2), (-3, 8), (3, 8), (3, 2))
    rings = B.buffer_shapes_union_rings(
        [("loop", SQUARE), ("loop", sq2)], 0.0
    )
    assert len(rings) == 1
    a = sum(M.loop_signed_area(r) for r in rings)
    a1, a2 = M.loop_signed_area(SQUARE), M.loop_signed_area(sq2)
    assert max(a1, a2) < a < a1 + a2


def test_negative_radius_multiple_layers_rejected():
    """S2BufferOperationTests.NegativeBufferRadiusMultipleLayers:
    FAILED_PRECONDITION with more than one polygon layer."""
    sq2 = loop_of((20, 20), (20, 26), (26, 26), (26, 20))
    with pytest.raises(ValueError, match="FAILED_PRECONDITION"):
        B.buffer_shapes_union_rings(
            [("loop", SQUARE), ("loop", sq2)], -1 * DEG
        )


def test_negative_radius_points_and_lines_removed():
    """Negative radius with only points/polylines -> empty output."""
    out = B.buffer_shapes_union_rings(
        [("point", ll(0, 0)), ("polyline", loop_of((2, 2), (2, 3)))],
        -1 * DEG,
    )
    assert out == []


def test_anchor_precondition_raises_for_huge_radius():
    """The winding walk anchors ref_winding at the geometry's
    antipode; a radius that reaches it must raise loudly (the
    reference's sweep-edge bookkeeping has no such limit — documented
    divergence), not return a wrong region."""
    with pytest.raises(ValueError, match="anchor"):
        B.buffer_polyline_rings(ZIGZAG_LINE, 178 * DEG)
    with pytest.raises(ValueError, match="anchor"):
        B.buffer_shapes_union_rings([("loop", SQUARE)], 178 * DEG)


# --- one-sided polyline buffering (PolylineSide LEFT/RIGHT) ------------

def _mc_probes(verts, radius, n=2500):
    rng = np.random.default_rng(1)
    center = np.asarray(verts).mean(axis=0)
    center = center / np.linalg.norm(center)
    spread = 4 * (radius + float(
        np.linalg.norm(np.asarray(verts) - center, axis=1).max()
    ))
    P = center[None, :] + spread * rng.standard_normal((n, 3))
    return P / np.linalg.norm(P, axis=1)[:, None]


@pytest.mark.parametrize("end_cap", ["round", "flat"])
@pytest.mark.parametrize(
    "line", [ZIGZAG_LINE, loop_of((10, 0), (0, 0), (5, 1))],
    ids=["zigzag", "reversal"],
)
def test_one_sided_split_is_exact(line, end_cap):
    """S2BufferOperationTests.ZigZagPolyline LEFT/RIGHT cases: the two
    one-sided regions partition the two-sided region — left ∪ right ==
    both (band-exempt) and left ∩ right == ∅ (the polyline itself is
    the shared measure-zero boundary)."""
    r = 1 * DEG
    both = B.buffer_polyline_rings(line, r, end_cap=end_cap, check=False)
    left = B.buffer_polyline_rings(
        line, r, end_cap=end_cap, side="left"
    )
    right = B.buffer_polyline_rings(
        line, r, end_cap=end_cap, side="right"
    )
    P = _mc_probes(line, r)
    in_both = B._rings_contain(both, P)
    in_l = B._rings_contain(left, P)
    in_r = B._rings_contain(right, P)
    d2 = B._polyline_min_dist2(np.asarray(line), P)
    d = 2 * np.arcsin(np.sqrt(np.clip(d2, 0, 4)) / 2)
    # exempt the boundary bands: the r-offset circle AND the polyline
    # itself (the one-sided boundary runs along it)
    tol = 4e-3
    band = (np.abs(d - r) <= 4 * tol) | (d <= 4 * tol)
    if end_cap == "flat":
        for endp in (np.asarray(line)[0], np.asarray(line)[-1]):
            band |= np.abs(
                2 * np.arcsin(np.linalg.norm(P - endp[None, :], axis=1) / 2)
                - r
            ) <= 4 * tol
            t_cap = B._cap_tangent(np.asarray(line), endp)
            band |= (np.abs(P @ t_cap) <= 4 * tol) & (d <= r + 4 * tol)
    union_bad = ((in_l | in_r) != in_both) & ~band
    inter_bad = (in_l & in_r) & ~band
    assert not union_bad.any(), int(union_bad.sum())
    assert not inter_bad.any(), int(inter_bad.sum())


def test_one_sided_side_orientation():
    """A probe just left of a west-to-east equatorial segment (i.e. to
    the north) is in the LEFT buffer only; its mirror in the RIGHT."""
    line = loop_of((0, 0), (0, 10))
    r = 2 * DEG
    left = B.buffer_polyline_rings(line, r, side="left")
    right = B.buffer_polyline_rings(line, r, side="right")
    north = ll(1, 5)[None, :]   # left of west->east travel
    south = ll(-1, 5)[None, :]
    assert B._rings_contain(left, north)[0]
    assert not B._rings_contain(left, south)[0]
    assert B._rings_contain(right, south)[0]
    assert not B._rings_contain(right, north)[0]


# --- randomized sweeps (every constructive call self-validates) --------

@pytest.mark.parametrize("seed", range(6))
def test_fuzz_contraction_random_polygons(seed):
    """Random star-ish polygons contracted by random radii: the
    complement walk must either empty the polygon or pass the exact
    Monte-Carlo predicate (check=True raises otherwise)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal(3)
    c = c / np.linalg.norm(c)
    import s2geometry_spark.kernels.edges as KE

    u = np.array(KE.ortho(tuple(c)))
    v = np.cross(c, u)
    n = int(rng.integers(5, 11))
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.05, 0.15, n)
    verts = (
        np.cos(rad)[:, None] * c[None, :]
        + np.sin(rad)[:, None]
        * (np.cos(th)[:, None] * u[None, :] + np.sin(th)[:, None] * v[None, :])
    )
    verts = verts / np.linalg.norm(verts, axis=1)[:, None]
    shrink = float(rng.uniform(0.005, 0.04))
    rings = B.buffer_polygon_rings([verts], -shrink, check=True)
    base = M.loop_area(verts)
    got = sum(M.loop_signed_area(r) for r in rings)
    assert got < base + 1e-9


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_one_sided_random_polylines(seed):
    """Random polylines, random side/cap: the one-sided region must be
    a subset of the within-distance set (kernel check) and the two
    sides must partition the two-sided region."""
    rng = np.random.default_rng(100 + seed)
    c = rng.standard_normal(3)
    c = c / np.linalg.norm(c)
    import s2geometry_spark.kernels.edges as KE

    u = np.array(KE.ortho(tuple(c)))
    v = np.cross(c, u)
    n = int(rng.integers(3, 7))
    walk = np.cumsum(rng.uniform(-0.06, 0.06, (n, 2)), axis=0)
    verts = (
        c[None, :]
        + walk[:, 0:1] * u[None, :]
        + walk[:, 1:2] * v[None, :]
    )
    verts = verts / np.linalg.norm(verts, axis=1)[:, None]
    r = float(rng.uniform(0.01, 0.05))
    cap = "round" if seed % 2 == 0 else "flat"
    both = B.buffer_polyline_rings(verts, r, end_cap=cap, check=False)
    left = B.buffer_polyline_rings(verts, r, end_cap=cap, side="left")
    right = B.buffer_polyline_rings(verts, r, end_cap=cap, side="right")
    P = _mc_probes(verts, r, n=1200)
    in_b = B._rings_contain(both, P)
    in_l = B._rings_contain(left, P)
    in_r = B._rings_contain(right, P)
    d2 = B._polyline_min_dist2(verts, P)
    d = 2 * np.arcsin(np.sqrt(np.clip(d2, 0, 4)) / 2)
    tol = 4e-3
    band = (np.abs(d - r) <= 4 * tol) | (d <= 4 * tol)
    if cap == "flat":
        for endp in (verts[0], verts[-1]):
            band |= np.abs(
                2 * np.arcsin(np.linalg.norm(P - endp[None, :], axis=1) / 2)
                - r
            ) <= 4 * tol
            t_cap = B._cap_tangent(verts, endp)
            band |= (np.abs(P @ t_cap) <= 4 * tol) & (d <= r + 4 * tol)
    assert not (((in_l | in_r) != in_b) & ~band).any(), seed
    assert not ((in_l & in_r) & ~band).any(), seed


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_union_random_layers(seed):
    """Random multi-layer unions (2-4 shapes of mixed kinds): the
    single winding walk must pass the exact union predicate
    (check=True raises otherwise)."""
    rng = np.random.default_rng(200 + seed)
    import s2geometry_spark.kernels.edges as KE

    shapes = []
    for j in range(int(rng.integers(2, 5))):
        c = rng.standard_normal(3)
        c = c / np.linalg.norm(c)
        # keep layers in one neighborhood so the anchor margin holds
        c = (ll(10, 10) * 4 + c) / np.linalg.norm(ll(10, 10) * 4 + c)
        kind = ["point", "polyline", "loop"][int(rng.integers(0, 3))]
        if kind == "point":
            shapes.append(("point", c))
            continue
        u = np.array(KE.ortho(tuple(c)))
        v = np.cross(c, u)
        if kind == "polyline":
            walk = np.cumsum(rng.uniform(-0.05, 0.05, (4, 2)), axis=0)
            verts = c[None, :] + walk[:, 0:1] * u + walk[:, 1:2] * v
        else:
            n = int(rng.integers(4, 8))
            th = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(0.03, 0.1, n)
            verts = (
                np.cos(rad)[:, None] * c[None, :]
                + np.sin(rad)[:, None]
                * (np.cos(th)[:, None] * u + np.sin(th)[:, None] * v)
            )
        verts = verts / np.linalg.norm(verts, axis=1)[:, None]
        shapes.append((kind, verts))
    r = float(rng.uniform(0.01, 0.05))
    rings = B.buffer_shapes_union_rings(shapes, r, check=True)
    assert sum(M.loop_signed_area(rg) for rg in rings) > 0


@pytest.mark.parametrize("radius_deg", [0.01, 0.1, 1.0, 5.0, 20.0])
@pytest.mark.parametrize("tolerance", [1e-2, 1e-3])
def test_radii_and_error_fractions(radius_deg, tolerance):
    """S2BufferOperationTests.TestRadiiAndErrorFractions analog: a
    representative shape across four decades of radius and two
    tolerance (error-fraction) settings, expansion AND contraction,
    every case Monte-Carlo-validated inside the kernel."""
    r = radius_deg * DEG
    grown = B.buffer_polygon_rings([SQUARE], r, tolerance=tolerance)
    assert sum(M.loop_signed_area(rg) for rg in grown) > M.loop_signed_area(
        SQUARE
    )
    shrunk = B.buffer_polygon_rings([SQUARE], -r, tolerance=tolerance)
    if radius_deg >= 5.0:
        assert shrunk == []  # contraction past the ~3-deg inradius
    else:
        assert 0 < sum(
            M.loop_signed_area(rg) for rg in shrunk
        ) < M.loop_signed_area(SQUARE)


@pytest.mark.parametrize("rid", range(4))
def test_fractal_buffering(rid):
    """S2BufferOperationTests.Fractals analog: highly concave fractal
    coastlines (the repo's deterministic Koch-style fixtures) buffered
    at 0.4 deg, expansion and contraction, Monte-Carlo-validated
    inside the kernel."""
    from s2geometry_spark.sources import regions_src as R

    loops = R.fractal_loops(range(4), 96)
    verts = np.asarray(loops[rid][1].verts)
    r = 0.4 * DEG
    grown = B.buffer_polygon_rings([verts], r, check=True)
    base = M.loop_area(verts)
    assert sum(M.loop_signed_area(rg) for rg in grown) > base
    shrunk = B.buffer_polygon_rings([verts], -r, check=True)
    assert 0 <= sum(M.loop_signed_area(rg) for rg in shrunk) < base
