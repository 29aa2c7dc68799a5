"""Closest-cell query over a labeled cell index
(Query/S2ClosestCellQuery.cs semantics): the k closest (cell, label)
entries to a target point by min squared-chord distance, result order
(distance, cell_id, label).

``cell_distance_to_points_batch`` is the vectorized form of
kernels.cell_dist._distance_internal (branch analysis as masks) — one
cell against an Arrow batch of points, which is the distributed
orientation: the index is the dim side, the point table is the 10^12
side."""

from __future__ import annotations

import math

import numpy as np

from .cell_dist import cell_distance_to_point
from .edgeclip import face_xyz_to_uvw
from .geom import Cell, normalize


def _face_xyz_to_uvw_batch(face: int, px, py, pz):
    if face == 0:
        return py, pz, px
    if face == 1:
        return -px, pz, py
    if face == 2:
        return -px, -py, pz
    if face == 3:
        return -pz, -py, -px
    if face == 4:
        return -pz, px, -py
    return py, px, -pz


def cell_distance_to_points_batch(cell: Cell, px, py, pz) -> np.ndarray:
    """Min squared-chord distance from `cell` (incl. interior) to each
    unit point — vectorized mirror of cell_dist.cell_distance_to_point."""
    tx, ty, tz = _face_xyz_to_uvw_batch(cell.face, px, py, pz)
    u_lo, u_hi, v_lo, v_hi = cell.u_lo, cell.u_hi, cell.v_lo, cell.v_hi
    dir00 = tx - tz * u_lo
    dir01 = tx - tz * u_hi
    dir10 = ty - tz * v_lo
    dir11 = ty - tz * v_hi

    def edge_dist(dir_ij, uv):
        pq2 = dir_ij * dir_ij / (1 + uv * uv)
        qr = 1 - np.sqrt(np.clip(1 - pq2, 0, None))
        return pq2 + qr * qr

    def v_edge_closest(u_end):
        u = u_hi if u_end else u_lo
        d0 = (-u * v_lo) * tx + (u * u + 1) * ty + (-v_lo) * tz
        d1 = (-u * v_hi) * tx + (u * u + 1) * ty + (-v_hi) * tz
        return (d0 > 0) & (d1 < 0)

    def u_edge_closest(v_end):
        v = v_hi if v_end else v_lo
        d0 = (v * v + 1) * tx + (-u_lo * v) * ty + (-u_lo) * tz
        d1 = (v * v + 1) * tx + (-u_hi * v) * ty + (-u_hi) * tz
        return (d0 > 0) & (d1 < 0)

    def vertex_dist(i, j):
        u = u_hi if i else u_lo
        v = v_hi if j else v_lo
        vx, vy, vz = normalize((u, v, 1.0))
        return (
            (tx - vx) ** 2 + (ty - vy) ** 2 + (tz - vz) ** 2
        )

    out = np.full(len(np.atleast_1d(tx)), np.nan)
    decided = np.zeros_like(out, dtype=bool)
    inside = np.ones_like(out, dtype=bool)
    for cond, mask_fn, dval, uv in (
        (dir00 < 0, lambda: v_edge_closest(0), -dir00, u_lo),
        (dir01 > 0, lambda: v_edge_closest(1), dir01, u_hi),
        (dir10 < 0, lambda: u_edge_closest(0), -dir10, v_lo),
        (dir11 > 0, lambda: u_edge_closest(1), dir11, v_hi),
    ):
        inside &= ~cond
        take = cond & ~decided & mask_fn()
        if take.any():
            out[take] = edge_dist(dval, uv)[take]
            decided |= take
    res = np.where(inside, 0.0, np.nan)
    decided |= inside
    rest = ~decided
    if rest.any():
        vmin = np.minimum.reduce(
            [vertex_dist(0, 0), vertex_dist(1, 0),
             vertex_dist(0, 1), vertex_dist(1, 1)]
        )
        out[rest] = vmin[rest]
    out = np.where(inside, 0.0, out)
    return out


def closest_cells(entries, target, k: int = 1, max_dist2: float = math.inf):
    """Brute closest-k over (cell_id, label) entries for one target
    unit point; returns [(dist2, cell_id, label)] sorted by
    (dist2, cell_id, label) — the reference result order."""
    target = tuple(float(x) for x in target)
    scored = []
    for cid, lab in entries:
        d2 = cell_distance_to_point(Cell(int(cid)), target)
        if d2 <= max_dist2:
            scored.append((d2, int(cid), int(lab)))
    scored.sort()
    return scored[:k]
