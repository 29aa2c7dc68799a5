"""Robust geodesic-edge <-> cube-face clipping (S2EdgeClipping.cs).

Port of the reference's face-clipping machinery:
- ``get_face_segments``   GetFaceSegments (S2EdgeClipping.cs:29-84):
  subdivide edge AB at every cube-face boundary crossing; the segments
  form a continuous path with every vertex within kFaceClipErrorUVDist
  of the line AB.
- ``clip_to_padded_face`` ClipToPaddedFace (:98-141): the (u, v)
  coordinates of the portion of AB intersecting face [-R,R]^2,
  R = 1 + padding.
- ``clip_edge`` / ``clip_edge_bound`` ClipEdge/ClipEdgeBound
  (:194-268): robust 2D interval clipping of a segment to a rect.
- ``intersects_rect`` IntersectsRect (:165-182).
- ``edge_covering_cells``: the consumer pattern — cells at a fixed
  level whose padded uv-rect the edge passes through (supercover grid
  walk over the clipped segment), used for tight shape-index edge
  assignment (S2CrossingEdgeQuery's descent, flattened to one level).
"""

from __future__ import annotations

import math

import numpy as np

from . import coords
from .edges import DBL_EPS, cross, dot, ortho
from .geom import R1Interval, _face_uv_to_xyz, _valid_face_xyz_to_uv

FACE_CLIP_ERROR_RADIANS = 3 * DBL_EPS
FACE_CLIP_ERROR_UV_DIST = 9 * DBL_EPS
FACE_CLIP_ERROR_UV_COORD = 9 * (0.5 ** 0.5) * DBL_EPS
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPS
INTERSECTS_RECT_ERROR_UV_DIST = 3 * math.sqrt(2.0) * DBL_EPS

# kFaceUVWFaces[face][axis][direction] (S2Coords.cs:481-512)
_UVW_FACES = (
    ((4, 1), (5, 2), (3, 0)),
    ((0, 3), (5, 2), (4, 1)),
    ((0, 3), (1, 4), (5, 2)),
    ((2, 5), (1, 4), (0, 3)),
    ((2, 5), (3, 0), (1, 4)),
    ((4, 1), (3, 0), (2, 5)),
)


def get_uvw_face(face: int, axis: int, direction: int) -> int:
    return _UVW_FACES[face][axis][direction]


def face_xyz_to_uvw(face: int, p) -> tuple:
    """(x,y,z) -> the (u,v,w) coordinates of `face` (S2Coords.cs:286)."""
    x, y, z = p
    if face == 0:
        return (y, z, x)
    if face == 1:
        return (-x, z, y)
    if face == 2:
        return (-x, -y, z)
    if face == 3:
        return (-z, -y, -x)
    if face == 4:
        return (-z, x, -y)
    return (y, x, -z)


def get_face(p) -> int:
    """Scalar largest-abs-component face (matches coords.get_face)."""
    x, y, z = p
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        axis = 0 if ax > az else 2
    else:
        axis = 1 if ay > az else 2
    if (x, y, z)[axis] < 0:
        axis += 3
    return axis


def _robust_cross_prod(a, b):
    from .polyline_ops import robust_cross_prod

    return robust_cross_prod(a, b)


def _sum_equals(u: float, v: float, w: float) -> bool:
    return (u + v == w) and (u == w - v) and (v == w - u)


def _intersects_face(n) -> bool:
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def _intersects_opposite_edges(n) -> bool:
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    return (u - w >= v) if u >= v else (v - w >= u)


def _get_exit_axis(n) -> int:
    if _intersects_opposite_edges(n):
        return 1 if abs(n[0]) >= abs(n[1]) else 0
    sb = lambda a: 1 if a < 0 else 0  # noqa: E731
    return 1 if (sb(n[0]) ^ sb(n[1]) ^ sb(n[2])) == 0 else 0


def _get_exit_point(n, axis: int) -> tuple:
    if axis == 0:
        u = 1.0 if n[1] > 0 else -1.0
        return (u, (-u * n[0] - n[2]) / n[1])
    v = 1.0 if n[0] < 0 else -1.0
    return ((-v * n[1] - n[2]) / n[0], v)


def _move_origin_to_valid_face(face: int, a, ab, a_uv):
    """S2EdgeClipping.MoveOriginToValidFace — returns (face, a_uv)."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv[0]), abs(a_uv[1])) <= max_safe:
        return face, a_uv
    n = face_xyz_to_uvw(face, ab)
    if _intersects_face(n):
        exit_xyz = _face_uv_to_xyz(
            face, *_get_exit_point(n, _get_exit_axis(n))
        )
        nrm = math.sqrt(dot(ab, ab))
        abn = (ab[0] / nrm, ab[1] / nrm, ab[2] / nrm)
        a_tangent = cross(abn, a)
        d = (exit_xyz[0] - a[0], exit_xyz[1] - a[1], exit_xyz[2] - a[2])
        if dot(d, a_tangent) >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv
    if abs(a_uv[0]) >= abs(a_uv[1]):
        face = get_uvw_face(face, 0, 1 if a_uv[0] > 0 else 0)
    else:
        face = get_uvw_face(face, 1, 1 if a_uv[1] > 0 else 0)
    u, v = _valid_face_xyz_to_uv(face, a)
    return face, (max(-1.0, min(1.0, u)), max(-1.0, min(1.0, v)))


def _get_next_face(face, exit_uv, axis, n, target_face) -> int:
    if (
        abs(exit_uv[1 - axis]) == 1
        and get_uvw_face(face, 1 - axis, 1 if exit_uv[1 - axis] > 0 else 0)
        == target_face
        and _sum_equals(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])
    ):
        return target_face
    return get_uvw_face(face, axis, 1 if exit_uv[axis] > 0 else 0)


def get_face_segments(a, b) -> list[tuple[int, tuple, tuple]]:
    """[(face, a_uv, b_uv), ...] in order from A toward B."""
    a = tuple(float(x) for x in a)
    b = tuple(float(x) for x in b)
    a_face = get_face(a)
    b_face = get_face(b)
    a_uv = _valid_face_xyz_to_uv(a_face, a)
    b_uv = _valid_face_xyz_to_uv(b_face, b)
    if a_face == b_face:
        return [(a_face, a_uv, b_uv)]
    ab = _robust_cross_prod(a, b)
    ab_neg = (-ab[0], -ab[1], -ab[2])
    a_face, a_uv = _move_origin_to_valid_face(a_face, a, ab, a_uv)
    b_face, b_uv = _move_origin_to_valid_face(b_face, b, ab_neg, b_uv)
    segments = []
    seg_face = a_face
    seg_a = a_uv
    b_saved = b_uv
    face = a_face
    while face != b_face:
        n = face_xyz_to_uvw(face, ab)
        exit_axis = _get_exit_axis(n)
        exit_uv = _get_exit_point(n, exit_axis)
        segments.append((seg_face, seg_a, exit_uv))
        exit_xyz = _face_uv_to_xyz(face, *exit_uv)
        face = _get_next_face(face, exit_uv, exit_axis, n, b_face)
        exit_uvw = face_xyz_to_uvw(face, exit_xyz)
        seg_face = face
        seg_a = (exit_uvw[0], exit_uvw[1])
    segments.append((seg_face, seg_a, b_saved))
    return segments


def _clip_destination(a, b, scaled_n, a_tangent, b_tangent, scale_uv):
    """ClipDestination — returns (score, uv)."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    uv = (0.0, 0.0)
    if b[2] > 0:
        uv = (b[0] / b[2], b[1] / b[2])
        if max(abs(uv[0]), abs(uv[1])) <= max_safe:
            return 0, uv
    ep = _get_exit_point(scaled_n, _get_exit_axis(scaled_n))
    uv = (scale_uv * ep[0], scale_uv * ep[1])
    p = (uv[0], uv[1], 1.0)
    score = 0
    pa = (p[0] - a[0], p[1] - a[1], p[2] - a[2])
    pb = (p[0] - b[0], p[1] - b[1], p[2] - b[2])
    if dot(pa, a_tangent) < 0:
        score = 2
    elif dot(pb, b_tangent) < 0:
        score = 1
    if score > 0:
        if b[2] <= 0:
            score = 3
        else:
            uv = (b[0] / b[2], b[1] / b[2])
    return score, uv


def clip_to_padded_face(a, b, face: int, padding: float = 0.0):
    """(a_uv, b_uv) of the portion of AB intersecting face
    [-R,R]x[-R,R], R = 1+padding; None if AB misses the face."""
    a = tuple(float(x) for x in a)
    b = tuple(float(x) for x in b)
    if get_face(a) == face and get_face(b) == face:
        return _valid_face_xyz_to_uv(face, a), _valid_face_xyz_to_uv(face, b)
    n = face_xyz_to_uvw(face, _robust_cross_prod(a, b))
    a2 = face_xyz_to_uvw(face, a)
    b2 = face_xyz_to_uvw(face, b)
    scale_uv = 1 + padding
    scaled_n = (scale_uv * n[0], scale_uv * n[1], n[2])
    if not _intersects_face(scaled_n):
        return None
    nn = math.sqrt(dot(n, n))
    n = (n[0] / nn, n[1] / nn, n[2] / nn)
    a_tangent = cross(n, a2)
    b_tangent = cross(b2, n)
    neg_scaled_n = (-scaled_n[0], -scaled_n[1], -scaled_n[2])
    a_score, a_uv = _clip_destination(
        b2, a2, neg_scaled_n, b_tangent, a_tangent, scale_uv
    )
    b_score, b_uv = _clip_destination(
        a2, b2, scaled_n, a_tangent, b_tangent, scale_uv
    )
    if a_score + b_score >= 3:
        return None
    return a_uv, b_uv


# ---------------------------------------------------------------------
# 2D clipping
# ---------------------------------------------------------------------

def _interpolate_double(x, a, b, a1, b1) -> float:
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * (x - a) / (b - a)
    return b1 + (a1 - b1) * (x - b) / (a - b)


def _update_endpoint(bound: list, end: int, value: float) -> bool:
    if end == 0:
        if bound[1] < value:
            return False
        if bound[0] < value:
            bound[0] = value
    else:
        if bound[0] > value:
            return False
        if bound[1] > value:
            bound[1] = value
    return True


def _clip_bound_axis(a0, b0, bound0, a1, b1, bound1, diag, clip0) -> bool:
    if bound0[0] < clip0[0]:
        if bound0[1] < clip0[0]:
            return False
        bound0[0] = clip0[0]
        if not _update_endpoint(
            bound1, diag, _interpolate_double(clip0[0], a0, b0, a1, b1)
        ):
            return False
    if bound0[1] > clip0[1]:
        if bound0[0] > clip0[1]:
            return False
        bound0[1] = clip0[1]
        if not _update_endpoint(
            bound1, 1 - diag, _interpolate_double(clip0[1], a0, b0, a1, b1)
        ):
            return False
    return True


def clip_edge_bound(a, b, clip, bound) -> bool:
    """ClipEdgeBound: bound = [[x_lo,x_hi],[y_lo,y_hi]] updated in
    place; clip = ((x_lo,x_hi),(y_lo,y_hi))."""
    diag = 1 if (a[0] > b[0]) != (a[1] > b[1]) else 0
    return _clip_bound_axis(
        a[0], b[0], bound[0], a[1], b[1], bound[1], diag, clip[0]
    ) and _clip_bound_axis(
        a[1], b[1], bound[1], a[0], b[0], bound[0], diag, clip[1]
    )


def clip_edge(a, b, clip):
    """Portion of segment AB inside rect `clip`; None if disjoint."""
    bound = [
        [min(a[0], b[0]), max(a[0], b[0])],
        [min(a[1], b[1]), max(a[1], b[1])],
    ]
    if not clip_edge_bound(a, b, clip, bound):
        return None
    ai = 1 if a[0] > b[0] else 0
    aj = 1 if a[1] > b[1] else 0
    av = (bound[0][ai], bound[1][aj])
    bv = (bound[0][1 - ai], bound[1][1 - aj])
    return av, bv


def intersects_rect(a, b, rect) -> bool:
    """Closed-rect intersection test (S2EdgeClipping.IntersectsRect);
    rect = ((x_lo,x_hi),(y_lo,y_hi))."""
    (xlo, xhi), (ylo, yhi) = rect
    if max(a[0], b[0]) < xlo or min(a[0], b[0]) > xhi:
        return False
    if max(a[1], b[1]) < ylo or min(a[1], b[1]) > yhi:
        return False
    nx = -(b[1] - a[1])
    ny = b[0] - a[0]
    i = 1 if nx >= 0 else 0
    j = 1 if ny >= 0 else 0
    vx = (xlo, xhi)
    vy = (ylo, yhi)
    mx = nx * (vx[i] - a[0]) + ny * (vy[j] - a[1])
    mn = nx * (vx[1 - i] - a[0]) + ny * (vy[1 - j] - a[1])
    return mx >= 0 and mn <= 0


# ---------------------------------------------------------------------
# Level-L edge covering (the shape-index consumer)
# ---------------------------------------------------------------------

def edge_covering_cells(a, b, level: int, padding: float | None = None) -> list[int]:
    """Cell ids at `level` whose padded uv-rect the edge AB passes
    through — a conservative, tight cover via supercover traversal of
    each face segment's clipped st-grid (the per-level slice of
    S2CrossingEdgeQuery's cell descent).  Returns uint64-valued ints."""
    from . import cellid as CI
    from . import hilbert as H

    if padding is None:
        padding = FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST
    size = 1 << (30 - level)
    n_cells = 1 << level
    out: list[int] = []

    def st_of(u: float) -> float:
        return float(coords.uv_to_st(np.array([u]))[0])

    def uv_of(grid: int) -> float:
        return float(coords.st_to_uv(np.array([grid / n_cells]))[0])

    for face, a_uv, b_uv in get_face_segments(a, b):
        # the geodesic is STRAIGHT in (u, v) (gnomonic projection), so
        # the rect tests run in uv space; the candidate index window
        # comes from the monotone uv -> st map of the padded uv bound
        u_lo = min(a_uv[0], b_uv[0]) - padding
        u_hi = max(a_uv[0], b_uv[0]) + padding
        v_lo = min(a_uv[1], b_uv[1]) - padding
        v_hi = max(a_uv[1], b_uv[1]) + padding
        i_lo = max(0, int(math.floor(st_of(u_lo) * n_cells)))
        i_hi = min(n_cells - 1, int(math.floor(st_of(u_hi) * n_cells)))
        j_lo = max(0, int(math.floor(st_of(v_lo) * n_cells)))
        j_hi = min(n_cells - 1, int(math.floor(st_of(v_hi) * n_cells)))
        for i in range(i_lo, i_hi + 1):
            cell_u = (uv_of(i) - padding, uv_of(i + 1) + padding)
            for j in range(j_lo, j_hi + 1):
                cell_v = (uv_of(j) - padding, uv_of(j + 1) + padding)
                if intersects_rect(a_uv, b_uv, (cell_u, cell_v)):
                    cid = H.from_face_ij(
                        np.array([face], dtype=np.int64),
                        np.array([i * size], dtype=np.int64),
                        np.array([j * size], dtype=np.int64),
                    )[0]
                    out.append(int(CI.parent(
                        np.array([cid], dtype=np.uint64), level
                    )[0]))
    # dedup, deterministic order
    return sorted(set(out))
