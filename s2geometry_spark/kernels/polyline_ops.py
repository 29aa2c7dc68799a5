"""Polyline relations + simplification kernels:

- ``polyline_intersects``      S2Polyline.Intersects (S2Polyline.cs:378-403)
- ``subsample_vertices``       S2Polyline.SubsampleVertices + FindEndVertex
                               (S2Polyline.cs:432-534) — the pie-wedge
                               parametric simplifier (also the algorithm
                               inside S2PolylineSimplifier)
- ``nearly_covers``            S2Polyline.NearlyCovers (S2Polyline.cs:567-680)
                               incl. IsEdgeBNearEdgeA
                               (S2EdgeDistances.cs:407-490)
- ``approx_equals``            S2Polyline.ApproxEquals (S2Polyline.cs:540-553)

Driver-side / grouped-Arrow-kernel scalar implementations (polylines
are dim-sized; the distributed axis is the number of polylines —
operators/measures_op.py style).
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as E
from .geom import PI, S1Interval
from .loop import edge_chain_bound
from .measures import stable_cross_prod
from .polyline import project_to_edge


def _norm(v):
    return math.sqrt(E.dot(v, v))


def _normalize(v):
    n = _norm(v)
    return (v[0] / n, v[1] / n, v[2] / n)


def _angle(a, b) -> float:
    """Vector angle atan2(|a x b|, a.b) (S1Angle two-point ctor)."""
    return math.atan2(_norm(E.cross(a, b)), E.dot(a, b))


def robust_cross_prod(a, b):
    """S2.RobustCrossProd minus the long-double tier: stable cross
    product, exact + ortho fallbacks for (anti)parallel inputs."""
    r = stable_cross_prod(a, b)
    if r != (0.0, 0.0, 0.0):
        return r
    if a == b:
        return E.ortho(a)
    from fractions import Fraction

    fa = tuple(Fraction(v) for v in a)
    fb = tuple(Fraction(v) for v in b)
    x = E.cross(fa, fb)
    if all(v == 0 for v in x):
        return E.ortho(a)  # exactly collinear: arbitrary orthogonal
    m = max(abs(v) for v in x)
    return tuple(float(v / m) for v in x)


def polyline_intersects(a_verts, b_verts) -> bool:
    """True iff the two vertex chains cross or touch
    (CrossingSign >= 0 for any edge pair), with the rect-bound
    prefilter of the reference."""
    a_verts = np.asarray(a_verts, dtype=np.float64)
    b_verts = np.asarray(b_verts, dtype=np.float64)
    if len(a_verts) < 2 or len(b_verts) < 2:
        return False
    if not edge_chain_bound(a_verts, closed=False).intersects_rect(
        edge_chain_bound(b_verts, closed=False)
    ):
        return False
    at = [tuple(float(x) for x in v) for v in a_verts]
    bt = [tuple(float(x) for x in v) for v in b_verts]
    for i in range(len(at) - 1):
        for j in range(len(bt) - 1):
            if E.crossing_sign(at[i], at[i + 1], bt[j], bt[j + 1]) >= 0:
                return True
    return False


def _get_frame(z):
    """Right-handed orthonormal frame with +Z = z
    (S2PointUtil.GetFrame): columns (ortho x z, ortho, z)."""
    ortho = E.ortho(z)
    x_axis = E.cross(ortho, z)
    return x_axis, ortho, z


def find_end_vertex(verts, tolerance_rad: float, index: int) -> int:
    """Maximal end index such that the segment [index, end] passes
    within tolerance of all interior vertices, in order
    (S2Polyline.FindEndVertex pie-wedge algorithm)."""
    origin = verts[index]
    x_axis, y_axis, _z = _get_frame(origin)
    current_wedge = S1Interval.full()
    last_distance = 0.0
    index += 1
    while index < len(verts):
        candidate = verts[index]
        distance = _angle(origin, candidate)
        if distance > PI / 2 and last_distance > 0:
            break
        if distance < last_distance and last_distance > tolerance_rad:
            break
        last_distance = distance
        if distance <= tolerance_rad:
            index += 1
            continue
        center = math.atan2(
            E.dot(candidate, y_axis), E.dot(candidate, x_axis)
        )
        if not current_wedge.contains(center):
            break
        half_angle = math.asin(
            math.sin(tolerance_rad) / math.sin(distance)
        )
        target = S1Interval.from_point(center).expanded(half_angle)
        current_wedge = current_wedge.intersection(target)
        index += 1
    return index - 1


def subsample_vertices(verts, tolerance_rad: float) -> list[int]:
    """Indices of a subsequence whose connecting polyline stays within
    tolerance of the original, parametrically
    (S2Polyline.SubsampleVertices)."""
    verts = [tuple(float(x) for x in v) for v in np.asarray(verts, float)]
    if not verts:
        return []
    out = [0]
    tol = max(tolerance_rad, 0.0)
    index = 0
    while index + 1 < len(verts):
        next_index = find_end_vertex(verts, tol, index)
        if verts[next_index] != verts[index]:
            out.append(next_index)
        index = next_index
    return out


def approx_equals(a_verts, b_verts, max_error_rad: float = 1e-15) -> bool:
    a_verts = np.asarray(a_verts, float)
    b_verts = np.asarray(b_verts, float)
    if len(a_verts) != len(b_verts):
        return False
    return all(
        _angle(tuple(a), tuple(b)) <= max_error_rad
        for a, b in zip(a_verts, b_verts)
    )


def is_edge_b_near_edge_a(a0, a1, b0, b1, tolerance_rad: float) -> bool:
    """All points of edge B within tolerance of edge A
    (S2EdgeDistances.IsEdgeBNearEdgeA)."""
    a_ortho = _normalize(robust_cross_prod(a0, a1))
    a_nearest_b0 = project_to_edge(b0, a0, a1)
    a_nearest_b1 = project_to_edge(b1, a0, a1)
    if E.sign(a_ortho, a_nearest_b0, a_nearest_b1) < 0:
        a_ortho = (-a_ortho[0], -a_ortho[1], -a_ortho[2])
    if (
        _angle(b0, a_nearest_b0) > tolerance_rad
        or _angle(b1, a_nearest_b1) > tolerance_rad
    ):
        return False
    b_ortho = _normalize(robust_cross_prod(b0, b1))
    planar_angle = _angle(a_ortho, b_ortho)
    if planar_angle <= tolerance_rad:
        return True
    if planar_angle >= PI / 2:
        return (_angle(b0, a0) < _angle(b0, a1)) == (
            _angle(b1, a0) < _angle(b1, a1)
        )
    furthest = _normalize(
        E.cross(b_ortho, robust_cross_prod(a_ortho, b_ortho))
    )
    furthest_inv = (-furthest[0], -furthest[1], -furthest[2])
    return not (
        (
            E.sign(b_ortho, b0, furthest) > 0
            and E.sign(furthest, b1, b_ortho) > 0
        )
        or (
            E.sign(b_ortho, b0, furthest_inv) > 0
            and E.sign(furthest_inv, b1, b_ortho) > 0
        )
    )


def _next_distinct(verts, index: int) -> int:
    initial = verts[index]
    index += 1
    while index < len(verts) and verts[index] == initial:
        index += 1
    return index


def nearly_covers(a_verts, b_verts, max_error_rad: float) -> bool:
    """True iff ``b`` is within max_error of a contiguous subpath of
    ``a`` over b's entire length (S2Polyline.NearlyCovers stack
    search with visited-state set)."""
    av = [tuple(float(x) for x in v) for v in np.asarray(a_verts, float)]
    bv = [tuple(float(x) for x in v) for v in np.asarray(b_verts, float)]
    if not bv:
        return True
    if not av:
        return False
    pending: list[tuple[int, int, bool]] = []
    done: set[tuple[int, int, bool]] = set()

    i = 0
    next_i = _next_distinct(av, 0)
    while next_i < len(av):
        next_next_i = _next_distinct(av, next_i)
        closest = project_to_edge(bv[0], av[i], av[next_i])
        if (
            next_next_i == len(av) or closest != av[next_i]
        ) and _angle(closest, bv[0]) <= max_error_rad:
            pending.append((i, 0, True))
        i, next_i = next_i, next_next_i

    while pending:
        state = pending.pop()
        if state in done:
            continue
        done.add(state)
        si, sj, i_in_progress = state
        next_i = _next_distinct(av, si)
        next_j = _next_distinct(bv, sj)
        if next_j == len(bv):
            return True
        if next_i == len(av):
            continue
        if i_in_progress:
            j_begin = bv[sj]
            i_begin = project_to_edge(j_begin, av[si], av[next_i])
        else:
            i_begin = av[si]
            j_begin = project_to_edge(i_begin, bv[sj], bv[next_j])
        if is_edge_b_near_edge_a(
            j_begin, bv[next_j], i_begin, av[next_i], max_error_rad
        ):
            pending.append((next_i, sj, False))
        if is_edge_b_near_edge_a(
            i_begin, av[next_i], j_begin, bv[next_j], max_error_rad
        ):
            pending.append((si, next_j, True))
    return False
