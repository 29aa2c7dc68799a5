"""Spherical measures: angles, triangle/loop/polygon areas, curvature,
perimeter, centroids.

Reference semantics (re-derived, not ported line-by-line):
- triangle Angle/TurnAngle/Area/GirardArea/SignedArea: S2Measures.cs:15-140
  (L'Huilier main path, Girard for long skinny triangles, stable
  cross products via (a-b)x(a+b))
- loop GetPerimeter/GetArea/GetSignedArea/GetCurvature/GetCentroid:
  S2LoopMeasures.cs:14-284 (surface integral from vertex 0 with
  far-vertex origin shifting; canonical loop order + Kahan summation
  for curvature; signed-area consistency correction via curvature)
- centroids: S2Centroid.cs:39-108 (triangle TrueCentroid)
- polygon area: sum of loop areas signed by depth (S2Polygon.cs:471-502)

These run per-loop (driver-side or inside grouped pandas UDFs on
exploded vertex tables); vertex counts are small, the distributed axis
is the number of loops.
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as E

M_2_PI = 2 * math.pi
M_4_PI = 4 * math.pi
DBL_EPS = E.DBL_EPS
MIN_NORM = 2.2250738585072014e-308  # double min normal


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _norm(a):
    return math.sqrt(E.dot(a, a))


def stable_cross_prod(a, b):
    """(a-b) x (a+b) = 2 a x b, numerically stable for nearby points
    (the GetStableCrossProd core of S2.RobustCrossProd)."""
    return E.cross(_sub(a, b), _add(a, b))


def vec_angle(a, b):
    """Angle between vectors: atan2(|a x b|, a.b) (Vector3.Angle)."""
    return math.atan2(_norm(E.cross(a, b)), E.dot(a, b))


def angle(a, b, c) -> float:
    """Interior angle at vertex B of triangle ABC (S2Measures.cs:15-20)."""
    return vec_angle(stable_cross_prod(a, b), stable_cross_prod(c, b))


def turn_angle(a, b, c) -> float:
    """Exterior (turn) angle at B; positive if ABC is CCW
    (S2Measures.cs:32-45)."""
    ang = vec_angle(stable_cross_prod(a, b), stable_cross_prod(b, c))
    return ang if E.sign(a, b, c) > 0 else -ang


def girard_area(a, b, c) -> float:
    """Girard's formula via stable cross products (S2Measures.cs:120-133)."""
    ab = stable_cross_prod(a, b)
    bc = stable_cross_prod(b, c)
    ac = stable_cross_prod(a, c)
    return max(0.0, vec_angle(ab, ac) - vec_angle(ab, bc) + vec_angle(bc, ac))


def triangle_area(a, b, c) -> float:
    """Combined L'Huilier/Girard area (S2Measures.cs:57-117)."""
    sa = vec_angle(b, c)
    sb = vec_angle(c, a)
    sc = vec_angle(a, b)
    s = 0.5 * (sa + sb + sc)
    if s >= 3e-4:
        s2 = s * s
        dmin = s - max(sa, sb, sc)
        if dmin < 1e-2 * s * s2 * s2:
            area = girard_area(a, b, c)
            if dmin < s * (0.1 * (area + 5e-15)):
                return area
    return 4 * math.atan(
        math.sqrt(
            max(
                0.0,
                math.tan(0.5 * s)
                * math.tan(0.5 * (s - sa))
                * math.tan(0.5 * (s - sb))
                * math.tan(0.5 * (s - sc)),
            )
        )
    )


def signed_triangle_area(a, b, c) -> float:
    return E.sign(a, b, c) * triangle_area(a, b, c)


def true_centroid(a, b, c):
    """Area-weighted triangle centroid (S2Centroid.cs TrueCentroid)."""
    angle_a = vec_angle(b, c)
    angle_b = vec_angle(c, a)
    angle_c = vec_angle(a, b)
    ra = 1.0 if angle_a == 0 else angle_a / math.sin(angle_a)
    rb = 1.0 if angle_b == 0 else angle_b / math.sin(angle_b)
    rc = 1.0 if angle_c == 0 else angle_c / math.sin(angle_c)
    x = (a[0], b[0] - a[0], c[0] - a[0])
    y = (a[1], b[1] - a[1], c[1] - a[1])
    z = (a[2], b[2] - a[2], c[2] - a[2])
    r = (ra, rb - ra, rc - ra)
    return (
        0.5 * E.dot(E.cross(y, z), r),
        0.5 * E.dot(E.cross(z, x), r),
        0.5 * E.dot(E.cross(x, y), r),
    )


# ---------------------------------------------------------------------
# Loop measures
# ---------------------------------------------------------------------

def _vt(verts):
    return [tuple(float(x) for x in v) for v in np.asarray(verts)]


def loop_perimeter(verts) -> float:
    vt = _vt(verts)
    n = len(vt)
    if n <= 1:
        return 0.0
    return sum(vec_angle(vt[i], vt[(i + 1) % n]) for i in range(n))


def surface_integral(verts, f_tri):
    """Sum of f(origin, v_i, v_{i+1}) over a triangle fan from
    vertex 0, shifting origin for far vertices
    (S2LoopMeasures.GetSurfaceIntegral)."""
    vt = _vt(verts)
    k_max_length = math.pi - 1e-5
    if len(vt) < 3:
        return None
    origin = vt[0]
    total = None
    def acc(t, v):
        return v if t is None else tuple(a + b for a, b in zip(t, v)) if isinstance(v, tuple) else t + v
    for i in range(1, len(vt) - 1):
        if vec_angle(vt[i + 1], origin) > k_max_length:
            old_origin = origin
            if origin == vt[0]:
                n = stable_cross_prod(vt[0], vt[i])
                nn = _norm(n)
                origin = (n[0] / nn, n[1] / nn, n[2] / nn)
            elif vec_angle(vt[i], vt[0]) < k_max_length:
                origin = vt[0]
            else:
                origin = E.cross(vt[0], old_origin)
                total = acc(total, f_tri(vt[0], old_origin, origin))
            total = acc(total, f_tri(old_origin, vt[i], origin))
        total = acc(total, f_tri(origin, vt[i], vt[i + 1]))
    if origin != vt[0]:
        total = acc(total, f_tri(origin, vt[-1], vt[0]))
    return total


def canonical_loop_order(verts) -> tuple[int, int]:
    """(first, dir): rotation/reflection-invariant traversal order
    (S2LoopMeasures.GetCanonicalLoopOrder)."""
    vt = _vt(verts)
    n = len(vt)
    if n == 0:
        return 0, 1
    min_vtx = min(vt)
    min_indices = [i for i, v in enumerate(vt) if v == min_vtx]
    def key(order):
        first, direction = order
        return [vt[(first + direction * k) % n] for k in range(n)]
    best = (min_indices[0], 1)
    for mi in min_indices:
        for cand in ((mi, 1), (mi + n, -1)):
            if key(cand) < key(best):
                best = cand
    return best


def prune_degeneracies(vt: list) -> list:
    """Remove duplicate vertices and ABA edge pairs; returns [] for a
    completely degenerate loop (S2LoopMeasures.PruneDegeneracies)."""
    vertices: list = []
    for v in vt:
        if not vertices or v != vertices[-1]:
            if len(vertices) >= 2 and v == vertices[-2]:
                vertices.pop()
            else:
                vertices.append(v)
    if len(vertices) < 3:
        return []
    if vertices[0] == vertices[-1]:
        vertices.pop()
    # ABA pairs wrapping the end/start of the loop
    k = 0
    while vertices[k + 1] == vertices[-(k + 1)]:
        k += 1
    return vertices[k:len(vertices) - k]


def loop_curvature(verts) -> float:
    """Sum of turn angles in canonical order, Kahan-compensated
    (S2LoopMeasures.GetCurvature)."""
    vt = _vt(verts)
    if len(vt) == 0:
        # a loop with no vertices contains the whole sphere
        return -M_2_PI
    vt = prune_degeneracies(vt)
    n = len(vt)
    if n == 0:
        # fully-degenerate loops prune to empty -> +2pi
        return M_2_PI
    first, direction = canonical_loop_order(vt)
    i = first
    total = turn_angle(
        vt[(i + n - direction) % n], vt[i % n], vt[(i + direction) % n]
    )
    compensation = 0.0
    remaining = n
    while remaining - 1 > 0:
        remaining -= 1
        i += direction
        ang = turn_angle(
            vt[(i - direction) % n], vt[i % n], vt[(i + direction) % n]
        )
        old_total = total
        ang += compensation
        total += ang
        compensation = old_total - total + ang
    k_max = M_2_PI - 4 * DBL_EPS
    total += compensation
    return max(-k_max, min(k_max, direction * total))


def loop_signed_area(verts) -> float:
    """Signed area in [-2pi, 2pi] (S2LoopMeasures.GetSignedArea):
    surface integral of signed triangle areas, with curvature-based
    correction for near-degenerate loops."""
    vt = _vt(verts)
    if len(vt) < 3:
        return 0.0
    area = surface_integral(vt, signed_triangle_area) or 0.0
    max_error = 11.25 * DBL_EPS * len(vt)
    area = math.remainder(area, M_4_PI)
    if area == -M_2_PI:
        area = M_2_PI
    if abs(area) <= max_error:
        curvature = loop_curvature(vt)
        if curvature == M_2_PI:
            return 0.0
        if area <= 0 and curvature > 0:
            return MIN_NORM
        if area >= 0 and curvature < 0:
            return -MIN_NORM
    return area


def loop_area(verts) -> float:
    """Area of the region left of the loop, [0, 4pi]."""
    area = loop_signed_area(verts)
    return area + M_4_PI if area < 0.0 else area


def loop_centroid(verts):
    """True (area-weighted, unnormalized) loop centroid."""
    c = surface_integral(verts, true_centroid)
    return (0.0, 0.0, 0.0) if c is None else c


def polygon_area(loops_with_depth) -> float:
    """Sum of loop areas signed by nesting depth
    (S2Polygon.cs:471-487): shells (even depth) add, holes subtract."""
    total = 0.0
    for depth, verts in loops_with_depth:
        a = loop_area(verts)
        total += a if depth % 2 == 0 else -a
    return total
