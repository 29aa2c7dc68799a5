"""Wedge relations (S2WedgeRelationsTests.cs goldens), the contains-
vertex query, Advance/AdvanceWrap (S2CellIdTests.cs:Advance), flood-
fill simple coverings, and the S2TextFormat codec."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as C
from s2geometry_spark.kernels import coverer as COV
from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels import wedge as W
from s2geometry_spark.kernels.geom import Cap


def N(p):
    n = math.sqrt(sum(v * v for v in p))
    return (p[0] / n, p[1] / n, p[2] / n)


WEDGE_CASES = [
    # (a0, ab1, a2, b0, b2, contains, intersects, relation)
    ((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10),
     False, True, W.WEDGE_PROPERLY_OVERLAPS),
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
     False, True, W.WEDGE_PROPERLY_OVERLAPS),
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
     True, True, W.WEDGE_PROPERLY_CONTAINS),
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
     True, True, W.WEDGE_PROPERLY_CONTAINS),
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
     True, True, W.WEDGE_PROPERLY_CONTAINS),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
     True, True, W.WEDGE_EQUALS),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
     False, False, W.WEDGE_IS_DISJOINT),
    ((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, W.WEDGE_IS_DISJOINT),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, W.WEDGE_IS_DISJOINT),
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
     False, True, W.WEDGE_IS_PROPERLY_CONTAINED),
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
     False, True, W.WEDGE_IS_PROPERLY_CONTAINED),
]


@pytest.mark.parametrize("case", WEDGE_CASES)
def test_wedge_golden(case):
    a0, ab1, a2, b0, b2, contains, intersects, rel = case
    a0, ab1, a2, b0, b2 = N(a0), N(ab1), N(a2), N(b0), N(b2)
    assert W.wedge_contains(a0, ab1, a2, b0, b2) == contains
    assert W.wedge_intersects(a0, ab1, a2, b0, b2) == intersects
    assert W.wedge_relation(a0, ab1, a2, b0, b2) == rel


class TestContainsVertexQuery:
    def test_loop_vertex(self):
        """For loop (A, B, C), vertex B is contained iff RefDir(B) is in
        the wedge ABC — cross-check against angle_contains_vertex."""
        from s2geometry_spark.kernels import edges as E

        rng = np.random.default_rng(3)
        for _ in range(50):
            a, b, c = (N(tuple(rng.standard_normal(3))) for _ in range(3))
            q = W.ContainsVertexQuery(b)
            q.add_edge(a, -1)  # incoming a->b
            q.add_edge(c, +1)  # outgoing b->c
            want = E.angle_contains_vertex(a, b, c)
            assert (q.contains_sign() > 0) == want

    def test_matched_siblings(self):
        b = N((1, 2, 3))
        q = W.ContainsVertexQuery(b)
        v = N((0, 1, 0))
        q.add_edge(v, +1)
        q.add_edge(v, -1)
        assert q.contains_sign() == 0


class TestAdvance:
    def test_advance_golden(self):
        S = lambda v: np.atleast_1d(np.asarray(v, dtype=np.uint64))
        eq = lambda a, b: int(np.atleast_1d(a)[0]) == int(np.atleast_1d(b)[0])
        id_ = S(C.from_face_pos_level(3, 0x12345678, 30 - 4))
        assert eq(C.advance(S(C.begin(0)), 7), C.end(0))
        assert eq(C.advance(S(C.begin(0)), 12), C.end(0))
        assert eq(C.advance(S(C.end(0)), -7), C.begin(0))
        assert eq(C.advance(S(C.end(0)), -12000000), C.begin(0))
        n5 = 6 << (2 * 5)
        assert eq(
            C.advance(S(C.end(5)), 500 - n5), C.advance(S(C.begin(5)), 500)
        )
        assert eq(
            C.child_begin(C.next_id(id_), 30),
            C.advance(S(C.child_begin(id_, 30)), 256),
        )
        assert eq(
            C.from_face_pos_level(5, 0, 30),
            C.advance(S(C.from_face_pos_level(1, 0, 30)), 4 << 60),
        )

    def test_advance_wrap_golden(self):
        S = lambda v: np.atleast_1d(np.asarray(v, dtype=np.uint64))
        eq = lambda a, b: int(np.atleast_1d(a)[0]) == int(np.atleast_1d(b)[0])
        id_ = S(C.from_face_pos_level(3, 0x12345678, 30 - 4))
        assert eq(C.advance_wrap(S(C.begin(0)), 7), C.from_face(1))
        assert eq(C.advance_wrap(S(C.begin(0)), 12), C.begin(0))
        assert eq(C.advance_wrap(S(C.from_face(5)), -7), C.from_face(4))
        assert eq(C.advance_wrap(S(C.begin(0)), -12000000), C.begin(0))
        assert eq(
            C.advance_wrap(S(C.begin(5)), 6644),
            C.advance_wrap(S(C.begin(5)), -11788),
        )
        assert eq(
            C.advance_wrap(S(C.child_begin(id_, 30)), 256),
            C.child_begin(C.next_id(id_), 30),
        )
        assert eq(
            C.advance_wrap(S(C.from_face_pos_level(5, 0, 30)), 2 << 60),
            C.from_face_pos_level(1, 0, 30),
        )


class TestSimpleCovering:
    def test_flood_fill_covers_cap(self):
        center = N((0.3, 0.2, 0.9))
        cap = Cap(center, 0.005)  # squared chord
        level = 8
        cells = COV.get_simple_covering(cap, center, level)
        assert cells
        lv = C.level(np.asarray(cells, dtype=np.uint64))
        assert all(int(v) == level for v in lv)
        # every cell intersects the cap, and the union covers it:
        # sample points in the cap, each must be in some cell
        rng = np.random.default_rng(11)
        cells_set = set(cells)
        for _ in range(200):
            p = np.asarray(center) + 0.03 * rng.standard_normal(3)
            p = p / np.linalg.norm(p)
            if not cap.contains_point(tuple(p)):
                continue
            leaf = C.xyz_to_cellid(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
            )
            assert int(C.parent(leaf, level)[0]) in cells_set


class TestTextFormat:
    def test_point_round_trip(self):
        p = TF.make_point("10.5:-30.25")
        assert TF.point_to_string(p) == "10.5:-30.25"

    def test_polyline_and_loop(self):
        pl = TF.make_polyline("0:0, 0:10, 10:10")
        assert pl.shape == (3, 3)
        lp = TF.make_loop("1:1, 1:2, 2:2, 2:1")
        assert len(lp.verts) == 4
        assert TF.loop_to_string(lp) == "1:1, 1:2, 2:2, 2:1"

    def test_polygon(self):
        pg = TF.make_polygon("0:0, 0:4, 4:4, 4:0; 1:1, 1:2, 2:2, 2:1")
        assert len(pg.loops) == 2
        assert (
            TF.polygon_to_string(pg)
            == "0:0, 0:4, 4:4, 4:0; 1:1, 1:2, 2:2, 2:1"
        )

    def test_interop_with_reference_style_strings(self):
        # the strings used across the ported reference tests parse
        verts = TF.parse_points("-5:1, 10:1, 10:5, 5:10")
        assert verts.shape == (4, 3)
        assert np.allclose(np.linalg.norm(verts, axis=1), 1.0)
