"""Candidate-completeness properties of the padded level-L edge
covering, ported from S2GeometryTests/S2CrossingEdgeQueryTests.cs.

The reference checks that its index descent (S2CrossingEdgeQuery over
a padded cell tree) never misses a crossing edge, using edge families
engineered to sit exactly on cube-face boundaries, face axes, cell
vertices, and cell-boundary lines — the configurations that fail when
cell padding is dropped.  This engine's candidate generator is the
padded level-L edge covering (kernels.edgeclip.edge_covering_cells)
behind the covering-cell equi-join of operators/crossing.py; the
ported property is: for every edge pair with CrossingSign >= 0, the
two coverings share at least one cell.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import coords
from s2geometry_spark.kernels import edgeclip as EC
from s2geometry_spark.kernels import edges as E
from s2geometry_spark.constants import KMIN_WIDTH

DBL_ERR = np.finfo(float).eps / 2


def _face_norm(face: int):
    x, y, z = coords.face_uv_to_xyz(
        np.array([face]), np.array([0.0]), np.array([0.0]))
    return np.array([x[0], y[0], z[0]])


def _face_axis(face: int, k: int):
    u = 1.0 if k == 0 else 0.0
    v = 1.0 if k == 1 else 0.0
    x, y, z = coords.face_uv_to_xyz(
        np.array([face]), np.array([u]), np.array([v]))
    return np.array([x[0], y[0], z[0]]) - _face_norm(face)


def _norm(p):
    return p / np.linalg.norm(p)


def _point_on_line(a, b, dist_rad: float):
    """Point at angular distance ``dist_rad`` from A along AB."""
    perp = b - np.dot(a, b) * a
    n = np.linalg.norm(perp)
    if n == 0:
        return a.copy()
    return _norm(math.cos(dist_rad) * a + math.sin(dist_rad) * perp / n)


def _perturb_at_distance(rng, dist_rad, a0, b0):
    x = _point_on_line(a0, b0, dist_rad)
    if rng.integers(2):
        for i in range(3):
            x[i] = np.nextafter(x[i], 1.0 if rng.integers(2) else -1.0)
        x = _norm(x)
    return x


def _perturbed_sub_edges(rng, a0, b0, count):
    """Sub-edges with exponentially-distributed lengths, endpoints
    perturbed off the line (S2CrossingEdgeQueryTests.cs:205-221)."""
    a0, b0 = _norm(a0), _norm(b0)
    length0 = math.acos(np.clip(np.dot(a0, b0), -1, 1))
    edges = []
    for _ in range(count):
        length = length0 * DBL_ERR ** rng.random()
        offset = (length0 - length) * rng.random()
        edges.append(
            (_perturb_at_distance(rng, offset, a0, b0),
             _perturb_at_distance(rng, offset + length, a0, b0))
        )
    return edges


def _level_for(edges) -> int:
    longest = max(
        math.acos(np.clip(np.dot(a, b), -1, 1)) for a, b in edges
    )
    return max(1, KMIN_WIDTH.get_level_for_min_value(max(longest, 1e-15)))


def _check_candidate_completeness(edges, level=None):
    if level is None:
        level = _level_for(edges)
    covers = [
        set(EC.edge_covering_cells(tuple(a), tuple(b), level))
        for a, b in edges
    ]
    for cov in covers:
        assert cov, "covering must be non-empty"
    n = len(edges)
    checked = 0
    for i in range(n):
        a, b = tuple(edges[i][0]), tuple(edges[i][1])
        for j in range(i + 1, n):
            c, d = tuple(edges[j][0]), tuple(edges[j][1])
            if E.crossing_sign(a, b, c, d) >= 0:
                checked += 1
                assert covers[i] & covers[j], (
                    f"crossing pair ({i},{j}) shares no covering cell "
                    f"at level {level}"
                )
    return checked


def test_candidates_perturbed_cube_edges():
    # edges in the plane of cube edges: face boundaries, cube
    # vertices, 45-degree face diagonals
    rng = np.random.default_rng(20260817)
    total = 0
    for _ in range(4):
        face = int(rng.integers(6))
        scale = DBL_ERR ** rng.random()
        uv = (2.0 * rng.integers(2) - 1, 2.0 * rng.integers(2) - 1)
        x, y, z = coords.face_uv_to_xyz(
            np.array([face]),
            np.array([scale * uv[0]]), np.array([scale * uv[1]]))
        a0 = np.array([x[0], y[0], z[0]])
        b0 = a0 - 2 * _face_norm(face)
        edges = _perturbed_sub_edges(rng, a0, b0, 20)
        total += _check_candidate_completeness(edges)
    assert total > 0


def test_candidates_perturbed_cube_face_axes():
    # edges in the plane of face axes: one coordinate is zero, lying
    # on the boundary between a face's immediate child cells
    rng = np.random.default_rng(7)
    for _ in range(3):
        face = int(rng.integers(6))
        scale = DBL_ERR ** rng.random()
        axis = _face_axis(face, int(rng.integers(2)))
        a0 = scale * axis + _face_norm(face)
        b0 = scale * axis - _face_norm(face)
        edges = _perturbed_sub_edges(rng, a0, b0, 20)
        _check_candidate_completeness(edges)


def test_candidates_cap_edges_near_cube_vertex():
    # random short edges near the cube vertex where the Hilbert curve
    # starts and ends
    rng = np.random.default_rng(11)
    center = _norm(np.array([-1.0, -1.0, 1.0]))
    # orthonormal frame at the cap center
    u = _norm(np.cross(center, [0.0, 0.0, 1.0]))
    v = np.cross(center, u)
    edges = []
    for _ in range(120):
        t = rng.random() * 2 * math.pi
        r = 1e-3 * math.sqrt(rng.random())
        mid = _norm(center + r * (math.cos(t) * u + math.sin(t) * v))
        t2 = rng.random() * 2 * math.pi
        half = 0.5e-4 * rng.random()
        d = math.cos(t2) * u + math.sin(t2) * v
        edges.append(
            (_point_on_line(mid, _norm(mid + d), half),
             _point_on_line(mid, _norm(mid - d), half))
        )
    checked = _check_candidate_completeness(edges)
    assert checked > 0


@pytest.mark.parametrize("level", [0, 4, 11, 19, 26, 30])
def test_candidates_degenerate_edge_on_cell_vertex(level):
    # a degenerate edge sitting exactly on a cell corner must be its
    # own candidate at that cell's level
    rng = np.random.default_rng(level + 1)
    for _ in range(10):
        f = int(rng.integers(6))
        i = int(rng.integers(1 << 30)) & ~((1 << (30 - level)) - 1)
        j = int(rng.integers(1 << 30)) & ~((1 << (30 - level)) - 1)
        from s2geometry_spark.kernels import hilbert as H

        cid = CI.parent(
            H.from_face_ij(
                np.array([f]), np.array([i]), np.array([j])
            ).astype(np.uint64),
            level,
        )[0]
        # cell corner = min-uv vertex of the cell
        u = float(coords.st_to_uv(np.array([i / (1 << 30)]))[0])
        v = float(coords.st_to_uv(np.array([j / (1 << 30)]))[0])
        x, y, z = coords.face_uv_to_xyz(
            np.array([f]), np.array([u]), np.array([v]))
        p = _norm(np.array([x[0], y[0], z[0]]))
        cov = set(EC.edge_covering_cells(tuple(p), tuple(p), level))
        # the degenerate edge must be its own candidate: its covering
        # is non-empty and includes the cell owning the corner point
        # (the padded rect test must not lose a point on the boundary)
        assert cov
        own = int(CI.parent(
            CI.xyz_to_cellid(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            ),
            level,
        )[0])
        assert own in cov


@pytest.mark.parametrize("level", [0, 5, 12, 21, 30])
def test_candidates_collinear_edges_on_cell_boundaries(level):
    # overlapping collinear edges along one cell edge
    rng = np.random.default_rng(level + 101)
    k_intervals = 6
    f = int(rng.integers(6))
    size = 1 << (30 - level)
    i0 = (int(rng.integers(1 << 30)) // size) * size
    j0 = (int(rng.integers(1 << 30)) // size) * size
    # cell corner points (min-uv corner toward +u)
    def corner(ii, jj):
        u = float(coords.st_to_uv(np.array([ii / (1 << 30)]))[0])
        v = float(coords.st_to_uv(np.array([jj / (1 << 30)]))[0])
        x, y, z = coords.face_uv_to_xyz(
            np.array([f]), np.array([u]), np.array([v]))
        return np.array([x[0], y[0], z[0]])

    p1 = corner(i0, j0)
    p2 = corner(min(i0 + size, 1 << 30), j0)
    delta = (p2 - p1) / k_intervals
    edges = []
    for i in range(k_intervals + 1):
        for j in range(i):
            edges.append(
                (_norm(p1 + i * delta), _norm(p1 + j * delta))
            )
    _check_candidate_completeness(edges, level=min(level, 30))
