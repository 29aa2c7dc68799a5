"""BuildPolygonBoundaries goldens ported from
S2GeometryTests/S2ShapeUtilBuildPolygonBoundariesTests.cs (all 8
cases; faces compared as unordered id sets)."""

from __future__ import annotations

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.nesting import build_polygon_boundaries


def lax(s):
    return TF.parse_points(s)


def faces_of(components):
    out = build_polygon_boundaries(components)
    return sorted(tuple(sorted(f)) for f in out)


class TestBuildPolygonBoundaries:
    def test_no_components(self):
        assert build_polygon_boundaries([]) == []

    def test_one_loop(self):
        a0 = lax("0:0, 1:0, 0:1")  # outer face
        a1 = lax("0:0, 0:1, 1:0")
        assert len(build_polygon_boundaries([[a0, a1]])) == 2

    def test_two_loops_same_component(self):
        a0 = lax("0:0, 1:0, 0:1")  # outer face
        a1 = lax("0:0, 0:1, 1:0")
        a2 = lax("1:0, 0:1, 1:1")
        assert len(build_polygon_boundaries([[a0, a1, a2]])) == 3

    def test_two_nested_loops(self):
        a0 = lax("0:0, 3:0, 0:3")  # outer face
        a1 = lax("0:0, 0:3, 3:0")
        b0 = lax("1:1, 2:0, 0:2")  # outer face
        b1 = lax("1:1, 0:2, 2:0")
        faces = build_polygon_boundaries([[a0, a1], [b0, b1]])
        assert len(faces) == 3
        # the b-component outer loop nests inside a1
        assert sorted(faces[0]) == [(0, 1), (1, 0)]

    def test_two_loops_different_components(self):
        a0 = lax("0:0, 1:0, 0:1")  # outer face
        a1 = lax("0:0, 0:1, 1:0")
        b0 = lax("0:2, 1:2, 0:3")  # outer face
        b1 = lax("0:2, 0:3, 1:2")
        faces = build_polygon_boundaries([[a0, a1], [b0, b1]])
        assert len(faces) == 3
        # both outer loops share the depth-0 face
        assert sorted(faces[2]) == [(0, 0), (1, 0)]

    def test_one_degenerate_loop(self):
        a0 = lax("0:0, 1:0, 0:0")
        assert len(build_polygon_boundaries([[a0]])) == 1

    def test_two_degenerate_loops(self):
        a0 = lax("0:0, 1:0, 0:0")
        b0 = lax("2:0, 3:0, 2:0")
        faces = build_polygon_boundaries([[a0], [b0]])
        assert len(faces) == 1
        assert len(faces[0]) == 2

    def test_complex(self):
        # component "a": 4 adjacent squares forming a larger square
        comp = {}
        comp["a"] = [
            lax("0:0, 25:0, 50:0, 50:25, 50:50, 25:50, 0:50, 0:50"),
            lax("0:0, 0:25, 25:25, 25:0"),
            lax("0:25, 0:50, 25:50, 25:25"),
            lax("25:0, 25:25, 50:25, 50:0"),
            lax("25:25, 25:50, 50:50, 50:25"),
        ]
        comp["b"] = [lax("0:-10, 10:-10")]
        comp["a1_a"] = [
            lax("5:5, 20:5, 20:10, 5:10"),
            lax("5:5, 5:10, 10:10, 10:5"),
            lax("10:5, 10:10, 15:10, 15:5"),
            lax("15:5, 15:10, 20:10, 20:5"),
        ]
        comp["a1_b"] = [
            lax("5:15, 20:15, 20:20, 5:20"),
            lax("5:15, 5:20, 20:20, 20:15"),
        ]
        comp["a1_c"] = [lax("2:5, 2:10, 2:5")]
        comp["a1_a2_a"] = [
            lax("11:6, 14:6, 14:9, 11:9"),
            lax("11:6, 11:9, 14:9, 14:6"),
        ]
        comp["a1_a3_a"] = [lax("16:6, 19:9, 16:6")]
        comp["a3_a"] = [
            lax("30:5, 45:5, 45:20, 30:20"),
            lax("30:5, 30:20, 45:20, 45:5"),
        ]
        comp["a4_a"] = [lax("30:30, 40:30, 30:30")]
        comp["a4_b"] = [lax("30:35, 40:35, 30:35")]
        comp["a4_c"] = [lax("30:40, 40:40, 30:40")]
        comp["a4_d"] = [lax("30:45, 40:45, 30:45")]
        order = [
            "a", "b", "a1_a", "a1_b", "a1_c", "a1_a2_a", "a1_a3_a",
            "a3_a", "a4_a", "a4_b", "a4_c", "a4_d",
        ]
        components = [comp[k] for k in order]
        ix = {k: i for i, k in enumerate(order)}
        # expected faces in (component, loop) ids per the reference
        expected = sorted(
            tuple(sorted(f))
            for f in [
                [(ix["a"], 0), (ix["b"], 0)],
                [(ix["a"], 1), (ix["a1_a"], 0), (ix["a1_b"], 0),
                 (ix["a1_c"], 0)],
                [(ix["a1_a"], 1)],
                [(ix["a1_a"], 2), (ix["a1_a2_a"], 0)],
                [(ix["a1_a2_a"], 1)],
                [(ix["a1_a"], 3), (ix["a1_a3_a"], 0)],
                [(ix["a1_b"], 1)],
                [(ix["a"], 2)],
                [(ix["a"], 3), (ix["a3_a"], 0)],
                [(ix["a3_a"], 1)],
                [(ix["a"], 4), (ix["a4_a"], 0), (ix["a4_b"], 0),
                 (ix["a4_c"], 0), (ix["a4_d"], 0)],
            ]
        )
        assert faces_of(components) == expected
