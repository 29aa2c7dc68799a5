"""S2Cap golden cases ported from S2CapTests.cs
(Test_S2Cap_GetRectBound :147-197, Test_S2Cap_S2CellMethods :199-264)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels.geom import (
    Cap,
    Cell,
    _face_uv_to_xyz,
    chord_from_radians,
    normalize,
)

EPS = 1e-15
DEGREE_EPS = 1e-13
FACE_RADIUS = math.atan(math.sqrt(2.0))  # center-to-corner angle of a face


def ll_point(lat_deg, lng_deg):
    phi, th = math.radians(lat_deg), math.radians(lng_deg)
    return (
        math.cos(th) * math.cos(phi),
        math.sin(th) * math.cos(phi),
        math.sin(phi),
    )


def cap_deg(center, deg):
    return Cap.from_center_radians(center, math.radians(deg))


def leaf_cell(p):
    return Cell(
        int(
            CI.xyz_to_cellid(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )[0]
        )
    )


class TestCapRectBound:
    def test_south_pole_cap(self):
        rect = cap_deg(ll_point(-45, 57), 50).get_rect_bound()
        assert abs(math.degrees(rect.lat.lo) - (-90)) < DEGREE_EPS
        assert abs(math.degrees(rect.lat.hi) - 5) < DEGREE_EPS
        assert rect.lng.is_full()

    def test_north_pole_tangent(self):
        rect = Cap.from_center_radians(
            normalize((1, 0, 1)), math.pi / 4 + 1e-16
        ).get_rect_bound()
        assert abs(rect.lat.lo - 0) < EPS
        assert abs(rect.lat.hi - math.pi / 2) < EPS
        assert rect.lng.is_full()

    def test_just_past_45(self):
        rect = cap_deg(normalize((1, 0, 1)), 45 + 5e-15).get_rect_bound()
        assert abs(math.degrees(rect.lat.lo) - 0) < DEGREE_EPS
        assert abs(math.degrees(rect.lat.hi) - 90) < DEGREE_EPS
        assert rect.lng.is_full()

    def test_eastern_hemisphere(self):
        rect = Cap.from_center_radians(
            (0.0, 1.0, 0.0), math.pi / 2 + 2e-16
        ).get_rect_bound()
        assert abs(math.degrees(rect.lat.lo) - (-90)) < DEGREE_EPS
        assert abs(math.degrees(rect.lat.hi) - 90) < DEGREE_EPS
        assert rect.lng.is_full()

    def test_equator_centered(self):
        rect = cap_deg(ll_point(0, 50), 20).get_rect_bound()
        assert abs(math.degrees(rect.lat.lo) - (-20)) < DEGREE_EPS
        assert abs(math.degrees(rect.lat.hi) - 20) < DEGREE_EPS
        assert abs(math.degrees(rect.lng.lo) - 30) < DEGREE_EPS
        assert abs(math.degrees(rect.lng.hi) - 70) < DEGREE_EPS

    def test_north_pole_centered(self):
        rect = cap_deg(ll_point(90, 123), 10).get_rect_bound()
        assert abs(math.degrees(rect.lat.lo) - 80) < DEGREE_EPS
        assert abs(math.degrees(rect.lat.hi) - 90) < DEGREE_EPS
        assert rect.lng.is_full()


class TestCapCellMethods:
    @pytest.mark.parametrize("face", range(6))
    def test_cell_relations(self, face):
        root_cell = Cell(int(np.atleast_1d(CI.from_face(face))[0]))
        edge_cell = leaf_cell(_face_uv_to_xyz(face, 0, 1 - EPS))
        corner_cell = leaf_cell(_face_uv_to_xyz(face, 1 - EPS, 1 - EPS))

        # Hilbert-adjacent leaf caps around the corner cell
        first = CI.advance(np.array([corner_cell.id], np.uint64), -3)
        for step in range(7):
            cid = int(CI.advance(first, step)[0])
            cell = Cell(cid)
            assert (cid == corner_cell.id) == cell.get_cap_bound().contains_cell(
                corner_cell
            )
            parent_contains = bool(
                CI.contains(
                    CI.parent(np.array([cid], np.uint64)),
                    np.array([corner_cell.id], np.uint64),
                )[0]
            )
            assert parent_contains == cell.get_cap_bound().may_intersect_cell(
                corner_cell
            )

        anti_face = (face + 3) % 6
        for cap_face in range(6):
            center = normalize(_face_uv_to_xyz(cap_face, 0, 0))
            covering = Cap.from_center_radians(center, FACE_RADIUS + EPS)
            assert (cap_face == face) == covering.contains_cell(root_cell)
            assert (cap_face != anti_face) == covering.may_intersect_cell(
                root_cell
            )
            ec = np.asarray(edge_cell.center())
            assert (float(np.dot(center, ec)) > 0.1) == covering.contains_cell(
                edge_cell
            )
            assert covering.may_intersect_cell(edge_cell) == covering.contains_cell(
                edge_cell
            )
            assert (cap_face == face) == covering.contains_cell(corner_cell)
            cc = np.asarray(corner_cell.center())
            assert (
                float(np.dot(center, cc)) > 0
            ) == covering.may_intersect_cell(corner_cell)

            bulging = Cap.from_center_radians(center, math.pi / 4 + EPS)
            assert not bulging.contains_cell(root_cell)
            assert (cap_face != anti_face) == bulging.may_intersect_cell(
                root_cell
            )
            assert (cap_face == face) == bulging.contains_cell(edge_cell)
            assert (
                float(np.dot(center, ec)) > 0.1
            ) == bulging.may_intersect_cell(edge_cell)
            assert not bulging.contains_cell(corner_cell)
            assert not bulging.may_intersect_cell(corner_cell)

            singleton = Cap(center, 0.0)
            assert (cap_face == face) == singleton.may_intersect_cell(root_cell)
            assert not singleton.may_intersect_cell(edge_cell)
            assert not singleton.may_intersect_cell(corner_cell)


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    from s2geometry_spark.kernels.geom import LatLngRect

    return LatLngRect.from_degrees(lat_lo, lng_lo, lat_hi, lng_hi)


def cell_fpl(face, pos, level):
    return Cell(int(np.atleast_1d(CI.from_face_pos_level(face, pos, level))[0]))


def check_cell_ops(r, cell, level):
    """S2LatLngRectTests.TestCellOps: 0 none, 1 MayIntersect,
    2 Intersects, 3 vertex containment, 4 Contains."""
    vertex_contained = False
    for i in range(4):
        v = cell.vertex_raw(i)
        if r.contains_ll(
            math.atan2(v[2], math.hypot(v[0], v[1])), math.atan2(v[1], v[0])
        ):
            vertex_contained = True
        if not r.is_empty() and cell.contains_point(r.get_vertex(i)):
            vertex_contained = True
    assert r.may_intersect_cell(cell) == (level >= 1), "may_intersect"
    assert r.intersects_cell(cell) == (level >= 2), "intersects"
    assert vertex_contained == (level >= 3), "vertex"
    assert r.contains_cell(cell) == (level >= 4), "contains"


class TestRectCellOps:
    """S2LatLngRectTests.cs Test_S2LatLngRect_CellOps (:485-538)."""

    def test_quadrant_rect(self):
        r4 = rect_deg(-45.1, -45.1, 0.1, 0.1)
        check_cell_ops(r4, cell_fpl(0, 0, 0), 3)
        check_cell_ops(r4, cell_fpl(0, 0, 1), 4)
        check_cell_ops(r4, cell_fpl(1, 0, 1), 0)

    def test_intersecting_rect(self):
        r5 = rect_deg(-10, -45, 10, 0)
        check_cell_ops(r5, cell_fpl(0, 0, 0), 3)
        check_cell_ops(r5, cell_fpl(0, 0, 1), 3)
        check_cell_ops(r5, cell_fpl(1, 0, 1), 0)

    def test_point_rect(self):
        check_cell_ops(
            rect_deg(4, 4, 4, 4), Cell(int(np.atleast_1d(CI.from_face(0))[0])), 3
        )

    def test_face_bound_but_not_face(self):
        check_cell_ops(
            rect_deg(41, -87, 42, -79),
            Cell(int(np.atleast_1d(CI.from_face(2))[0])),
            1,
        )
        check_cell_ops(
            rect_deg(-41, 160, -40, -160),
            Cell(int(np.atleast_1d(CI.from_face(5))[0])),
            1,
        )

    def test_corner_leaf_cell(self):
        cell0tr = leaf_cell(normalize((1 + 1e-12, 1.0, 1.0)))
        v0 = cell0tr.vertex_raw(0)
        lat0 = math.degrees(math.atan2(v0[2], math.hypot(v0[0], v0[1])))
        lng0 = math.degrees(math.atan2(v0[1], v0[0]))
        check_cell_ops(
            rect_deg(lat0 - 1e-8, lng0 - 1e-8, lat0 - 2e-10, lng0 + 1e-10),
            cell0tr,
            1,
        )

    def test_corner_crossing_rect(self):
        check_cell_ops(
            rect_deg(-37, -70, -36, -20),
            Cell(int(np.atleast_1d(CI.from_face(5))[0])),
            2,
        )

    def test_diamond_and_square(self):
        cell202 = cell_fpl(2, 0, 2)
        b = cell202.get_rect_bound()
        check_cell_ops(
            rect_deg(
                math.degrees(b.lat.lo) + 3,
                math.degrees(b.lng.lo) + 3,
                math.degrees(b.lat.hi) - 3,
                math.degrees(b.lng.hi) - 3,
            ),
            cell202,
            2,
        )


class TestCapIntersectsCell:
    """Cap.intersects_cell must be the exact cap test (an alias of
    S2Cap.MayIntersect, which is exact — S2Cap.cs:467-478), not the
    rectangle boundary-crossing algorithm; the old copy-pasted rect
    body crashed on Cap's slots."""

    def test_no_crash_and_matches_may_intersect(self):
        cell = Cell(int(np.atleast_1d(CI.from_face(0))[0]))
        for radians, center in [
            (0.01, (0.0, 0.0, 1.0)),
            (0.5, normalize((1.0, 1.0, 1.0))),
            (1.2, (1.0, 0.0, 0.0)),
            (0.2, (-1.0, 0.0, 0.0)),
        ]:
            cap = Cap.from_center_radians(center, radians)
            assert cap.intersects_cell(cell) == cap.may_intersect_cell(
                cell
            )

    def test_disjoint_and_overlapping(self):
        cell = Cell(int(np.atleast_1d(CI.from_face(0))[0]))  # +x face
        far = Cap.from_center_radians((-1.0, 0.0, 0.0), 0.05)
        assert not far.intersects_cell(cell)
        near = Cap.from_center_radians((1.0, 0.0, 0.0), 0.05)
        assert near.intersects_cell(cell)
