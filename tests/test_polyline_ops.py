"""Polyline Intersects / SubsampleVertices / NearlyCovers goldens
ported from S2PolylineTests.cs (:266-316, :332-390, :574-655)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import polyline_ops as PO


def pl(text: str) -> np.ndarray:
    """MakePolyline-style parser: "lat:lng, lat:lng, ..." degrees."""
    pts = []
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        lat_s, lng_s = tok.split(":")
        phi = math.radians(float(lat_s))
        theta = math.radians(float(lng_s))
        pts.append(
            (
                math.cos(theta) * math.cos(phi),
                math.sin(theta) * math.cos(phi),
                math.sin(phi),
            )
        )
    return np.asarray(pts, dtype=np.float64).reshape(-1, 3)


class TestIntersects:
    def test_empty_and_single_point(self):
        line1 = pl("1:1, 4:4")
        assert not PO.polyline_intersects(pl(""), line1)
        assert not PO.polyline_intersects(line1, pl("1:1"))

    def test_basic(self):
        line1 = pl("1:1, 4:4")
        assert PO.polyline_intersects(line1, pl("1:2, 2:1"))
        assert not PO.polyline_intersects(line1, pl("1:2, 2:3"))
        assert PO.polyline_intersects(line1, pl("1:2, 2:3, 4:3"))

    def test_at_vertex(self):
        line1 = pl("1:1, 4:4, 4:6")
        assert PO.polyline_intersects(line1, pl("1:1, 1:2"))
        assert PO.polyline_intersects(line1, pl("5:1, 4:4, 2:2"))

    def test_vertex_on_edge(self):
        h_lr = pl("0:1, 0:3")
        v_bt = pl("-1:2, 0:2, 1:2")
        h_rl = pl("0:3, 0:1")
        v_tb = pl("1:2, 0:2, -1:2")
        assert PO.polyline_intersects(h_lr, v_bt)
        assert PO.polyline_intersects(h_lr, v_tb)
        assert PO.polyline_intersects(h_rl, v_bt)
        assert PO.polyline_intersects(h_rl, v_tb)


def check_subsample(text: str, tol_deg: float, expected: str):
    verts = pl(text)
    got = PO.subsample_vertices(verts, math.radians(tol_deg))
    want = [int(t) for t in expected.split(",")] if expected else []
    assert got == want, (text, tol_deg, got, want)


class TestSubsample:
    def test_trivial(self):
        check_subsample("", 1.0, "")
        check_subsample("0:1", 1.0, "0")
        check_subsample("10:10, 11:11", 5.0, "0,1")
        check_subsample("-1:0, 0:0, 1:0", 1e-15, "0,2")
        check_subsample("-1:0, 0:0, 1:1", 0.0, "0,1,2")
        check_subsample("-1:0, 0:0, 1:1", -1.0, "0,1,2")
        check_subsample("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, "0,4")
        check_subsample("0:1, 0:1, 0:1, 0:2", 0.0, "0,3")

    def test_simple_example(self):
        s = "0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4"
        check_subsample(s, 3.0, "0,9")
        check_subsample(s, 2.0, "0,6,9")
        check_subsample(s, 0.9, "0,2,6,9")
        check_subsample(s, 0.4, "0,1,2,3,4,6,9")
        check_subsample(s, 0, "0,1,2,3,4,5,6,7,8,9")

    def test_guarantees(self):
        check_subsample("10:10, 12:12, 10:10", 5.0, "0")
        check_subsample("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, "0,3,4")
        check_subsample(
            "90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0",
            5.0,
            "0,2,4,5,6,7",
        )
        check_subsample("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, "0,2,3,4")
        check_subsample(
            "10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, "0,2,3,5"
        )
        check_subsample("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, "0,4")


def check_covers(a: str, b: str, err_deg: float, b_covers_a: bool, a_covers_b: bool):
    """Arg order matches the reference helper
    (S2PolylineTests.cs:724): expectations are (b covers a, a covers b)."""
    av, bv = pl(a), pl(b)
    tol = math.radians(err_deg)
    assert PO.nearly_covers(bv, av, tol) == b_covers_a, ("b covers a", a, b)
    assert PO.nearly_covers(av, bv, tol) == a_covers_b, ("a covers b", a, b)


class TestNearlyCovers:
    def test_overlaps_self(self):
        check_covers("1:1, 2:2, -1:10", "1:1, 2:2, -1:10", 1e-10, True, True)

    def test_does_not_overlap_reverse(self):
        check_covers("1:1, 2:2, -1:10", "-1:10, 2:2, 1:1", 1e-10, False, False)

    def test_overlaps_equivalent(self):
        check_covers("1:1, 2:1", "1:1, 1.5:1, 2:1", 1e-10, True, True)

    def test_short_covered_by_long(self):
        check_covers(
            "-5:1, 10:1, 10:5, 5:10", "9:1, 9.9995:1, 10.0005:5",
            1e-3, False, True,
        )

    def test_partial_overlap_only(self):
        check_covers("-5:1, 10:1", "0:1, 20:1", 1.0, False, False)

    def test_short_backtracking(self):
        t1 = "0:0, 0:2, 0:1, 0:4, 0:5"
        t2 = "0:0, 0:2, 0:4, 0:3, 0:5"
        check_covers(t1, t2, 1.5, True, True)
        check_covers(t1, t2, 0.5, False, False)

    def test_long_backtracking(self):
        check_covers("5:1, -5:1", "1:1, 3:1", 1.0, False, False)
        check_covers("5:1, -5:1", "1:1, 3:1", 2.5, False, True)

    def test_resilient_to_duplicate_points(self):
        check_covers("0:1, 0:2, 0:2, 0:3", "0:1, 0:1, 0:1, 0:3",
                     1e-10, True, True)

    def test_two_potential_starting_points(self):
        check_covers("0:11, 0:0, 0:9, 0:20", "0:10, 0:15", 1.5, False, True)

    def test_empty_cases(self):
        assert PO.nearly_covers(pl("1:1, 2:2"), pl(""), 1e-10)
        assert not PO.nearly_covers(pl(""), pl("1:1, 2:2"), 1e-10)


class TestApproxEquals:
    def test_basic(self):
        a = pl("0:0, 0:1, 0:2")
        assert PO.approx_equals(a, a)
        assert not PO.approx_equals(a, pl("0:0, 0:1"))
        b = pl("0:0, 0:1.0000001, 0:2")
        assert PO.approx_equals(a, b, math.radians(1e-5))
        assert not PO.approx_equals(a, b, 1e-12)
