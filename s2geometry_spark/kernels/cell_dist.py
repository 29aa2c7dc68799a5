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
