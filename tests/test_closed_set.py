"""ClosedSetNormalizer goldens ported from
S2BuilderUtil_ClosedSetNormalizerTests.cs (all Run-based cases).
Graphs use the reference index-string format "points # polylines #
polygons"; the polyline dimension compares as undirected edge
multisets (the reference's polyline layer default)."""

from __future__ import annotations

from collections import Counter

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.nesting import normalize_closed_set


def parse_index(s):
    """-> (vertices, points, line_edges, poly_edges, is_full)"""
    verts: list[tuple] = []
    vid: dict[tuple, int] = {}

    def vv(p):
        p = tuple(float(x) for x in p)
        if p not in vid:
            vid[p] = len(verts)
            verts.append(p)
        return vid[p]

    parts = [p.strip() for p in s.split("#")]
    assert len(parts) == 3
    points = []
    if parts[0]:
        for tok in parts[0].split("|"):
            points.append(vv(TF.parse_points(tok.strip())[0]))
    line_edges = []
    if parts[1]:
        for tok in parts[1].split("|"):
            pts = [vv(p) for p in TF.parse_points(tok.strip())]
            line_edges.extend(zip(pts, pts[1:]))
    poly_edges = []
    is_full = False
    if parts[2]:
        for tok in parts[2].replace("|", ";").split(";"):
            tok = tok.strip()
            if tok == "full":
                is_full = True
                continue
            pts = [vv(p) for p in TF.parse_points(tok)]
            for i in range(len(pts)):
                poly_edges.append((pts[i], pts[(i + 1) % len(pts)]))
    return verts, points, line_edges, poly_edges, is_full


def undirected(edges):
    """Directed edges -> undirected multiset: each (a,b)/(b,a) pair
    collapses to one undirected edge (the reference's undirected-layer
    representation stores both directions per edge); unpaired directed
    edges count singly."""
    c = Counter(edges)
    out: Counter = Counter()
    for (a, b), n in sorted(c.items()):
        if a == b:
            out[(a, b)] += n
            continue
        m = c.get((b, a), 0)
        if (b, a) < (a, b) and m:
            continue  # counted from the other direction
        paired = min(n, m)
        out[frozenset((a, b))] += paired + (n - paired) + (m - paired)
    return out


def check(input_str, expected_str, suppress=True, merge=False):
    verts, pts, lines, polys, is_full = parse_index(input_str)
    got = normalize_closed_set(
        verts, pts, lines, polys,
        suppress_lower_dimensions=suppress,
        is_full_polygon=is_full,
        merge_duplicates=merge,
    )
    ev, ep, el, eo, _ = parse_index(expected_str)
    # expected ids are in a different vertex numbering; compare points
    key = lambda i, V: V[i]
    assert sorted(key(i, verts) for i in got[0]) == sorted(
        key(i, ev) for i in ep
    ), f"points {got[0]}"
    assert undirected(
        [(verts[a], verts[b]) for a, b in got[1]]
    ) == undirected([(ev[a], ev[b]) for a, b in el]), f"lines {got[1]}"
    assert Counter(
        (verts[a], verts[b]) for a, b in got[2]
    ) == Counter((ev[a], ev[b]) for a, b in eo), f"polys {got[2]}"


class TestClosedSetNormalizer:
    def test_empty_graphs(self):
        check("# #", "# #")

    def test_non_degenerate_inputs(self):
        s = "0:0 # 1:0, 1:1 | 1:2, 1:3 # 2:2, 2:3, 3:2"
        check(s, s)

    def test_point_shell(self):
        check("# # 0:0", "0:0 # #")

    def test_point_hole(self):
        check("# # 0:0, 0:3, 3:0 | 1:1", "# # 0:0, 0:3, 3:0")

    def test_point_polyline(self):
        check("# 0:0, 0:0 #", "0:0 # #")

    def test_sibling_pair_shell(self):
        check("# # 0:0, 1:0 ", "# 0:0, 1:0 #")

    def test_sibling_pair_hole(self):
        check("# # 0:0, 0:3, 3:0; 0:0, 1:1", "# # 0:0, 0:3, 3:0")

    def test_point_suppressed_by_polygon_vertex(self):
        check("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
        check(
            "0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0",
            "0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0",
            suppress=False,
        )

    def test_point_suppressed_by_polyline_vertex(self):
        check("0:0 | 0:1 # 0:0, 0:1 #", "# 0:0, 0:1 #")
        check(
            "0:0 | 0:1 # 0:0, 0:1 #",
            "0:0 | 0:1 # 0:0, 0:1 #",
            suppress=False,
        )

    def test_point_shell_suppressed_by_polyline_edge(self):
        check("# 0:0, 1:0 # 0:0; 1:0", "# 0:0, 1:0 #")
        check(
            "# 0:0, 1:0 # 0:0; 1:0",
            "0:0 | 1:0 # 0:0, 1:0 #",
            suppress=False,
        )

    def test_polyline_edge_suppressed_by_polygon_edge(self):
        check("# 0:0, 0:1 # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
        check(
            "# 0:0, 0:1 # 0:0, 0:1, 1:0",
            "# 0:0, 0:1 # 0:0, 0:1, 1:0",
            suppress=False,
        )

    def test_polyline_edge_suppressed_by_reverse_polygon_edge(self):
        check("# 1:0, 0:0 # 0:0, 0:1, 1:0", "# # 0:0, 0:1, 1:0")
        check(
            "# 1:0, 0:0 # 0:0, 0:1, 1:0",
            "# 1:0, 0:0 # 0:0, 0:1, 1:0",
            suppress=False,
        )

    def test_duplicate_edge_merging(self):
        check(
            "0:0 | 0:0 # 0:0, 0:0 | 0:1, 0:2 # 0:0; 0:1, 0:2",
            "0:0 | 0:0 | 0:0 | 0:0 # 0:1, 0:2 | 0:1, 0:2 #",
        )
        check(
            "0:0 | 0:0 # 0:0, 0:0 | 0:1, 0:2 # 0:0; 0:1, 0:2",
            "0:0 # 0:1, 0:2 #",
            merge=True,
        )
