"""FindPolygonDegeneracies goldens ported from
S2GeometryTests/S2BuilderUtil_FindPolygonDegeneraciesTests.cs (all 10
cases).  The graph is built directly from the lax-polygon loop strings
("full" = full loop contributing no edges, with is_full_polygon
resolving the fully-degenerate case, as the reference's
IsFullPolygonPredicate does)."""

from __future__ import annotations

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.nesting import find_polygon_degeneracies


def build_graph(polygon_str):
    verts: list[tuple] = []
    vid: dict[tuple, int] = {}
    edges: list[tuple[int, int]] = []
    is_full = False

    def vv(p):
        p = tuple(float(x) for x in p)
        if p not in vid:
            vid[p] = len(verts)
            verts.append(p)
        return vid[p]

    for loop_str in polygon_str.split(";"):
        loop_str = loop_str.strip()
        if not loop_str:
            continue
        if loop_str == "full":
            is_full = True
            continue
        pts = [vv(p) for p in TF.parse_points(loop_str)]
        for i in range(len(pts)):
            edges.append((pts[i], pts[(i + 1) % len(pts)]))
    return verts, edges, is_full


def expect_degeneracies(polygon_str, expected):
    verts, edges, is_full = build_graph(polygon_str)
    got = find_polygon_degeneracies(verts, edges, is_full)
    def fmt(v):
        return TF.point_to_string(verts[v])
    actual = sorted(
        {(f"{fmt(edges[e][0])}, {fmt(edges[e][1])}", h) for e, h in got}
    )
    assert actual == sorted(set(expected)), f"{actual}"
    # IsFullyDegenerate consistency (reference layer assertion)
    assert (len(got) == len(edges)) == all(
        a == b or (b, a) in set(edges) for a, b in edges
    ) or len(edges) == 0


class TestFindPolygonDegeneracies:
    def test_empty_polygon(self):
        expect_degeneracies("", [])

    def test_no_degeneracies(self):
        expect_degeneracies("0:0, 0:1, 1:0", [])

    def test_point_shell(self):
        expect_degeneracies("0:0", [("0:0, 0:0", False)])

    def test_sibling_pair_shells(self):
        expect_degeneracies(
            "0:0, 0:1, 1:0; 1:0, 0:1, 0:0",
            [
                ("0:0, 0:1", False), ("0:1, 0:0", False),
                ("0:1, 1:0", False), ("1:0, 0:1", False),
                ("0:0, 1:0", False), ("1:0, 0:0", False),
            ],
        )

    def test_attached_sibling_pair_shells(self):
        expect_degeneracies(
            "0:0, 0:1, 1:0; 1:0, 2:0",
            [("1:0, 2:0", False), ("2:0, 1:0", False)],
        )

    def test_attached_sibling_pair_holes(self):
        expect_degeneracies(
            "0:0, 0:3, 3:0; 0:0, 1:1",
            [("0:0, 1:1", True), ("1:1, 0:0", True)],
        )

    def test_attached_sibling_pair_shells_and_holes(self):
        expect_degeneracies(
            "0:0, 0:3, 3:0; 3:0, 1:1; 3:0, 5:5",
            [
                ("3:0, 1:1", True), ("1:1, 3:0", True),
                ("3:0, 5:5", False), ("5:5, 3:0", False),
            ],
        )

    def test_degenerate_shells_outside_loop(self):
        expect_degeneracies(
            "0:0, 0:3, 3:3, 3:0; 4:4, 5:5; 6:6",
            [
                ("4:4, 5:5", False), ("5:5, 4:4", False),
                ("6:6, 6:6", False),
            ],
        )

    def test_degenerate_holes_within_loop(self):
        expect_degeneracies(
            "0:0, 0:5, 5:5, 5:0; 1:1, 2:2; 3:3",
            [
                ("1:1, 2:2", True), ("2:2, 1:1", True),
                ("3:3, 3:3", True),
            ],
        )

    def test_point_hole_within_full(self):
        expect_degeneracies("full; 0:0", [("0:0, 0:0", True)])

    def test_sibling_pair_holes_within_full(self):
        expect_degeneracies(
            "full; 0:0, 0:1, 1:0; 1:0, 0:1, 0:0",
            [
                ("0:0, 0:1", True), ("0:1, 0:0", True),
                ("0:1, 1:0", True), ("1:0, 0:1", True),
                ("0:0, 1:0", True), ("1:0, 0:0", True),
            ],
        )


class TestLaxPolygonLayer:
    """Degenerate-boundary modes of LaxPolygonLayer over isolated
    degeneracies (S2BuilderUtil_LaxPolygonLayerTests.cs All/Some
    Degenerate Shells/Holes families)."""

    def _run(self, polygon_str, mode):
        from s2geometry_spark.kernels.nesting import lax_polygon_layer

        verts, edges, is_full = build_graph(polygon_str)
        loops, full = lax_polygon_layer(
            verts, edges, mode, is_full_polygon=is_full
        )
        def canon(ring):
            pts = tuple(
                TF.point_to_string(verts[v]) for v in ring
            )
            k = min(range(len(pts)), key=lambda i: pts[i:] + pts[:i])
            return pts[k:] + pts[:k]
        return sorted(canon(r) for r in loops), full

    def _expect(self, input_str, expected_str, mode):
        got = self._run(input_str, mode)
        verts, _, is_full = build_graph(expected_str)
        want_loops = []
        for ls in expected_str.split(";"):
            ls = ls.strip()
            if not ls or ls == "full":
                continue
            pts = tuple(
                TF.point_to_string(tuple(map(float, p)))
                for p in TF.parse_points(ls)
            )
            k = min(range(len(pts)), key=lambda i: pts[i:] + pts[:i])
            want_loops.append(pts[k:] + pts[:k])
        assert got == (sorted(want_loops), is_full), f"{got}"

    def test_all_degenerate_shells(self):
        for mode in ("keep", "discard_holes"):
            self._expect("1:1; 2:2, 3:3", "1:1; 2:2, 3:3", mode)
        for mode in ("discard", "discard_shells"):
            self._expect("1:1; 2:2, 3:3", "", mode)

    def test_all_degenerate_holes(self):
        for mode in ("keep", "discard_shells"):
            self._expect(
                "full; 1:1; 2:2, 3:3", "full; 1:1; 2:2, 3:3", mode
            )
        for mode in ("discard", "discard_holes"):
            self._expect("full; 1:1; 2:2, 3:3", "full", mode)

    def test_some_degenerate_shells(self):
        normal = "0:0, 0:9, 9:0; 1:1, 7:1, 1:7"
        inp = normal + "; 3:2; 2:2, 2:3"
        for mode in ("keep", "discard_holes"):
            self._expect(inp, inp, mode)
        for mode in ("discard", "discard_shells"):
            self._expect(inp, normal, mode)

    def test_some_degenerate_holes(self):
        inp = "0:0, 0:9, 9:0; 1:1; 2:2, 3:3"
        for mode in ("keep", "discard_shells"):
            self._expect(inp, inp, mode)
        for mode in ("discard", "discard_holes"):
            self._expect(inp, "0:0, 0:9, 9:0", mode)
