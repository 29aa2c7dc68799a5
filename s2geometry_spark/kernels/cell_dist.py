"""Cell <-> point / edge / cell distances (S2Region/S2Cell.cs:215-530).

All distances are squared chord lengths (the S1ChordAngle length2
representation; chord2(pi - theta) = 4 - chord2(theta) exactly, which
the max-distance identities rely on).  These are the distance kernels
S2ClosestCellQuery-style cell-level pruning needs; the ring-expansion
kNN currently prunes with the kMinWidth metric bound, and these give
the exact per-cell alternative.
"""

from __future__ import annotations

import math

from . import edges as E
from .edgeclip import face_xyz_to_uvw
from .geom import Cell, chord2, normalize
from .polyline import edge_distance2

CHORD2_RIGHT = 2.0     # chord^2(90 degrees)
CHORD2_STRAIGHT = 4.0  # chord^2(180 degrees)


def _vertex_chord_dist(cell: Cell, p_uvw, i: int, j: int) -> float:
    u = cell.u_hi if i else cell.u_lo
    v = cell.v_hi if j else cell.v_lo
    vertex = normalize((u, v, 1.0))
    return chord2(p_uvw, vertex)


def _u_edge_is_closest(cell: Cell, t, v_end: int) -> bool:
    u0, u1 = cell.u_lo, cell.u_hi
    v = cell.v_hi if v_end else cell.v_lo
    dir0 = (v * v + 1, -u0 * v, -u0)
    dir1 = (v * v + 1, -u1 * v, -u1)
    return E.dot(t, dir0) > 0 and E.dot(t, dir1) < 0


def _v_edge_is_closest(cell: Cell, t, u_end: int) -> bool:
    v0, v1 = cell.v_lo, cell.v_hi
    u = cell.u_hi if u_end else cell.u_lo
    dir0 = (-u * v0, u * u + 1, -v0)
    dir1 = (-u * v1, u * u + 1, -v1)
    return E.dot(t, dir0) > 0 and E.dot(t, dir1) < 0


def _edge_distance(dir_ij: float, uv: float) -> float:
    pq2 = dir_ij * dir_ij / (1 + uv * uv)
    qr = 1 - math.sqrt(max(0.0, 1 - pq2))
    return pq2 + qr * qr


def _distance_internal(cell: Cell, target_xyz, to_interior: bool) -> float:
    t = face_xyz_to_uvw(cell.face, tuple(float(x) for x in target_xyz))
    dir00 = t[0] - t[2] * cell.u_lo
    dir01 = t[0] - t[2] * cell.u_hi
    dir10 = t[1] - t[2] * cell.v_lo
    dir11 = t[1] - t[2] * cell.v_hi
    inside = True
    if dir00 < 0:
        inside = False
        if _v_edge_is_closest(cell, t, 0):
            return _edge_distance(-dir00, cell.u_lo)
    if dir01 > 0:
        inside = False
        if _v_edge_is_closest(cell, t, 1):
            return _edge_distance(dir01, cell.u_hi)
    if dir10 < 0:
        inside = False
        if _u_edge_is_closest(cell, t, 0):
            return _edge_distance(-dir10, cell.v_lo)
    if dir11 > 0:
        inside = False
        if _u_edge_is_closest(cell, t, 1):
            return _edge_distance(dir11, cell.v_hi)
    if inside:
        if to_interior:
            return 0.0
        return min(
            _edge_distance(-dir00, cell.u_lo),
            _edge_distance(dir01, cell.u_hi),
            _edge_distance(-dir10, cell.v_lo),
            _edge_distance(dir11, cell.v_hi),
        )
    return min(
        _vertex_chord_dist(cell, t, 0, 0),
        _vertex_chord_dist(cell, t, 1, 0),
        _vertex_chord_dist(cell, t, 0, 1),
        _vertex_chord_dist(cell, t, 1, 1),
    )


def cell_distance_to_point(cell: Cell, p) -> float:
    """Min squared-chord distance from the cell (incl. interior) to p."""
    return _distance_internal(cell, p, True)


def cell_boundary_distance(cell: Cell, p) -> float:
    """Min squared-chord distance from the cell BOUNDARY to p."""
    return _distance_internal(cell, p, False)


def cell_max_distance_to_point(cell: Cell, p) -> float:
    """Max squared-chord distance from the cell to p."""
    p = tuple(float(x) for x in p)
    t = face_xyz_to_uvw(cell.face, p)
    max_dist = max(
        _vertex_chord_dist(cell, t, 0, 0),
        _vertex_chord_dist(cell, t, 1, 0),
        _vertex_chord_dist(cell, t, 0, 1),
        _vertex_chord_dist(cell, t, 1, 1),
    )
    if max_dist <= CHORD2_RIGHT:
        return max_dist
    anti = (-p[0], -p[1], -p[2])
    return CHORD2_STRAIGHT - cell_distance_to_point(cell, anti)


def cell_distance_to_edge(cell: Cell, a, b) -> float:
    """Min squared-chord distance from the cell to edge AB; zero if the
    edge intersects the cell interior."""
    a = tuple(float(x) for x in a)
    b = tuple(float(x) for x in b)
    min_dist = min(
        cell_distance_to_point(cell, a), cell_distance_to_point(cell, b)
    )
    if min_dist == 0.0:
        return 0.0
    v = [tuple(float(x) for x in cell.vertex(k)) for k in range(4)]
    for i in range(4):
        if E.crossing_sign(a, b, v[i - 1], v[i]) >= 0:
            return 0.0
    for i in range(4):
        min_dist = min(min_dist, edge_distance2(v[i], a, b))
    return min_dist


def cell_max_distance_to_edge(cell: Cell, a, b) -> float:
    a = tuple(float(x) for x in a)
    b = tuple(float(x) for x in b)
    max_dist = max(
        cell_max_distance_to_point(cell, a),
        cell_max_distance_to_point(cell, b),
    )
    if max_dist <= CHORD2_RIGHT:
        return max_dist
    anti_a = (-a[0], -a[1], -a[2])
    anti_b = (-b[0], -b[1], -b[2])
    return CHORD2_STRAIGHT - cell_distance_to_edge(cell, anti_a, anti_b)


def _uv_intersects(a: Cell, u_lo, u_hi, v_lo, v_hi) -> bool:
    return (
        a.u_lo <= u_hi and u_lo <= a.u_hi
        and a.v_lo <= v_hi and v_lo <= a.v_hi
    )


def cell_distance_to_cell(cell: Cell, target: Cell) -> float:
    """Min squared-chord distance between two cells; zero if they
    touch or overlap (uv-range test, so shared corners count)."""
    if cell.face == target.face and _uv_intersects(
        cell, target.u_lo, target.u_hi, target.v_lo, target.v_hi
    ):
        return 0.0
    va = [tuple(float(x) for x in cell.vertex(k)) for k in range(4)]
    vb = [tuple(float(x) for x in target.vertex(k)) for k in range(4)]
    min_dist = math.inf
    for i in range(4):
        for j in range(4):
            min_dist = min(
                min_dist,
                edge_distance2(va[i], vb[j], vb[(j + 1) & 3]),
                edge_distance2(vb[i], va[j], va[(j + 1) & 3]),
            )
    return min_dist


def _opposite_face(face: int) -> int:
    return face - 3 if face >= 3 else face + 3


def cell_max_distance_to_cell(cell: Cell, target: Cell) -> float:
    """Max squared-chord distance between two cells (4.0 when the
    antipodal reflection of the target touches the cell)."""
    if cell.face == _opposite_face(target.face) and _uv_intersects(
        cell, target.v_lo, target.v_hi, target.u_lo, target.u_hi
    ):
        return CHORD2_STRAIGHT
    va = [tuple(float(x) for x in cell.vertex(k)) for k in range(4)]
    vb = [tuple(float(x) for x in target.vertex(k)) for k in range(4)]
    max_dist = -1.0
    for i in range(4):
        for j in range(4):
            max_dist = max(
                max_dist,
                _max_dist_point_edge(va[i], vb[j], vb[(j + 1) & 3]),
                _max_dist_point_edge(vb[i], va[j], va[(j + 1) & 3]),
            )
    return max_dist


def _max_dist_point_edge(x, a, b) -> float:
    """Max squared-chord distance from x to edge AB = 4 - min distance
    of the antipode (S2EdgeDistances.UpdateMaxDistance)."""
    anti = (-x[0], -x[1], -x[2])
    return CHORD2_STRAIGHT - edge_distance2(anti, a, b)


# ---------------------------------------------------------------------
# Vectorized forms (the buffered-region coverer's hot path)
# ---------------------------------------------------------------------

def cell_distance_to_points(cell: Cell, pts, to_interior: bool = True):
    """Vectorized cell_distance_to_point over ``pts`` [N,3]: the same
    branch selection as _distance_internal via priority masks, so each
    row is bit-identical to the scalar call."""
    import numpy as np

    pts = np.asarray(pts, dtype=float)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    f = cell.face
    if f == 0:
        t0, t1, t2 = y, z, x
    elif f == 1:
        t0, t1, t2 = -x, z, y
    elif f == 2:
        t0, t1, t2 = -x, -y, z
    elif f == 3:
        t0, t1, t2 = -z, -y, -x
    elif f == 4:
        t0, t1, t2 = -z, x, -y
    else:
        t0, t1, t2 = y, x, -z
    u_lo, u_hi, v_lo, v_hi = cell.u_lo, cell.u_hi, cell.v_lo, cell.v_hi
    d00 = t0 - t2 * u_lo
    d01 = t0 - t2 * u_hi
    d10 = t1 - t2 * v_lo
    d11 = t1 - t2 * v_hi

    def vdot(d):
        return t0 * d[0] + t1 * d[1] + t2 * d[2]

    def v_edge_closest(u):
        return (vdot((-u * v_lo, u * u + 1, -v_lo)) > 0) & (
            vdot((-u * v_hi, u * u + 1, -v_hi)) < 0
        )

    def u_edge_closest(v):
        return (vdot((v * v + 1, -u_lo * v, -u_lo)) > 0) & (
            vdot((v * v + 1, -u_hi * v, -u_hi)) < 0
        )

    def edge_dist(dir_ij, uv):
        pq2 = dir_ij * dir_ij / (1 + uv * uv)
        qr = 1 - np.sqrt(np.maximum(0.0, 1 - pq2))
        return pq2 + qr * qr

    def vert_dist(u, v):
        vx, vy, vz = normalize((u, v, 1.0))
        return np.minimum(
            4.0, (t0 - vx) ** 2 + (t1 - vy) ** 2 + (t2 - vz) ** 2
        )

    vmin = np.minimum(
        np.minimum(vert_dist(u_lo, v_lo), vert_dist(u_hi, v_lo)),
        np.minimum(vert_dist(u_lo, v_hi), vert_dist(u_hi, v_hi)),
    )
    inside = (d00 >= 0) & (d01 <= 0) & (d10 >= 0) & (d11 <= 0)
    out = vmin
    # apply in reverse priority so the scalar's first-match-wins holds
    out = np.where((d11 > 0) & u_edge_closest(v_hi),
                   edge_dist(d11, v_hi), out)
    out = np.where((d10 < 0) & u_edge_closest(v_lo),
                   edge_dist(-d10, v_lo), out)
    out = np.where((d01 > 0) & v_edge_closest(u_hi),
                   edge_dist(d01, u_hi), out)
    out = np.where((d00 < 0) & v_edge_closest(u_lo),
                   edge_dist(-d00, u_lo), out)
    if to_interior:
        return np.where(inside, 0.0, out)
    emin = np.minimum(
        np.minimum(edge_dist(-d00, u_lo), edge_dist(d01, u_hi)),
        np.minimum(edge_dist(-d10, v_lo), edge_dist(d11, v_hi)),
    )
    return np.where(inside, emin, out)


def point_to_edges_distance2(x, av, bv):
    """Vectorized edge_distance2(x, a_k, b_k) over edge endpoint arrays
    av/bv [N,3]; per-row bit-identical to the scalar."""
    import numpy as np

    DBL_EPS = 2.220446049250313e-16
    av = np.asarray(av, float)
    bv = np.asarray(bv, float)
    px, py, pz = float(x[0]), float(x[1]), float(x[2])

    def norm2_3(q0, q1, q2):
        # left-to-right component sum, matching the scalar _norm2
        return q0 * q0 + q1 * q1 + q2 * q2

    ax, ay, az = av[:, 0], av[:, 1], av[:, 2]
    bx, by, bz = bv[:, 0], bv[:, 1], bv[:, 2]
    xa0, xa1, xa2_ = px - ax, py - ay, pz - az
    xb0, xb1, xb2_ = px - bx, py - by, pz - bz
    xa2 = norm2_3(xa0, xa1, xa2_)
    xb2 = norm2_3(xb0, xb1, xb2_)
    ab0, ab1, ab2_ = ax - bx, ay - by, az - bz
    ab2 = norm2_3(ab0, ab1, ab2_)
    max_error = 4.75 * DBL_EPS * (xa2 + xb2 + ab2) + 8 * DBL_EPS * DBL_EPS
    near = np.abs(xa2 - xb2) < ab2 + max_error
    # stable cross product c = (a-b) x (a+b)
    s0, s1, s2 = ax + bx, ay + by, az + bz
    c0 = ab1 * s2 - ab2_ * s1
    c1 = ab2_ * s0 - ab0 * s2
    c2c = ab0 * s1 - ab1 * s0
    c2 = norm2_3(c0, c1, c2c)
    x_dot_c = px * c0 + py * c1 + pz * c2c
    # cx = c x x
    cx0 = c1 * pz - c2c * py
    cx1 = c2c * px - c0 * pz
    cx2 = c0 * py - c1 * px
    # scalar: not (dot(a-x, cx) >= 0 or dot(b-x, cx) <= 0)
    dot_a = (ax - px) * cx0 + (ay - py) * cx1 + (az - pz) * cx2
    dot_b = (bx - px) * cx0 + (by - py) * cx1 + (bz - pz) * cx2
    use = near & (dot_a < 0) & (dot_b > 0)
    safe_c2 = np.where(use, c2, 1.0)
    qr = 1 - np.sqrt(norm2_3(cx0, cx1, cx2) / safe_c2)
    d_int = (x_dot_c * x_dot_c / safe_c2) + qr * qr
    return np.where(use, d_int, np.minimum(xa2, xb2))


def cell_distance_to_edges_min(cell: Cell, verts) -> float:
    """Min over a closed loop's edges of cell_distance_to_edge.

    REQUIRES that no loop edge intersects the (closed) cell — the
    buffered-region coverer establishes this via the loop's exact
    may-intersect callback before calling, which makes the scalar
    path's crossing tests vacuously negative and its endpoint
    containment distances nonzero; the result then equals the min of
    the scalar calls exactly (same value multiset)."""
    import numpy as np

    pts = np.asarray(verts, dtype=float)
    # each vertex is an endpoint of some edge of the closed loop, so
    # min over edges of endpoint distances = min over vertices
    best = float(cell_distance_to_points(cell, pts).min())
    if best == 0.0:
        return 0.0
    bv = np.roll(pts, -1, axis=0)
    corners = np.asarray(
        [tuple(float(c) for c in cell.vertex(k)) for k in range(4)]
    )
    return min(best, points_to_edges_min(corners, pts, bv))


def points_to_edges_min(xs, av, bv) -> float:
    """Min over all (point, edge) pairs of edge_distance2, broadcast
    [M,1] x [N] — per-pair bit-identical to the scalar."""
    import numpy as np

    DBL_EPS = 2.220446049250313e-16
    xs = np.asarray(xs, float)
    av = np.asarray(av, float)
    bv = np.asarray(bv, float)
    px = xs[:, 0:1]
    py = xs[:, 1:2]
    pz = xs[:, 2:3]
    ax, ay, az = av[:, 0], av[:, 1], av[:, 2]
    bx, by, bz = bv[:, 0], bv[:, 1], bv[:, 2]
    xa0, xa1, xa2_ = px - ax, py - ay, pz - az
    xb0, xb1, xb2_ = px - bx, py - by, pz - bz
    xa2 = xa0 * xa0 + xa1 * xa1 + xa2_ * xa2_
    xb2 = xb0 * xb0 + xb1 * xb1 + xb2_ * xb2_
    ab0, ab1, ab2_ = ax - bx, ay - by, az - bz
    ab2 = ab0 * ab0 + ab1 * ab1 + ab2_ * ab2_
    max_error = 4.75 * DBL_EPS * (xa2 + xb2 + ab2) + 8 * DBL_EPS * DBL_EPS
    near = np.abs(xa2 - xb2) < ab2 + max_error
    s0, s1, s2 = ax + bx, ay + by, az + bz
    c0 = ab1 * s2 - ab2_ * s1
    c1 = ab2_ * s0 - ab0 * s2
    c2c = ab0 * s1 - ab1 * s0
    c2 = c0 * c0 + c1 * c1 + c2c * c2c
    x_dot_c = px * c0 + py * c1 + pz * c2c
    cx0 = c1 * pz - c2c * py
    cx1 = c2c * px - c0 * pz
    cx2 = c0 * py - c1 * px
    dot_a = -xa0 * cx0 + -xa1 * cx1 + -xa2_ * cx2
    dot_b = -xb0 * cx0 + -xb1 * cx1 + -xb2_ * cx2
    use = near & (dot_a < 0) & (dot_b > 0)
    safe_c2 = np.where(use, c2, 1.0)
    qr = 1 - np.sqrt((cx0 * cx0 + cx1 * cx1 + cx2 * cx2) / safe_c2)
    d_int = (x_dot_c * x_dot_c / safe_c2) + qr * qr
    return float(np.where(use, d_int, np.minimum(xa2, xb2)).min())
