"""GetSnappedWindingDelta goldens ported from
S2GeometryTests/S2BuilderUtil_GetSnappedWindingDeltaTest.cs (all
deterministic cases; loops given as lax-polygon strings, reference
edge 0 is the degenerate loop that defines the reference vertex)."""

from __future__ import annotations

import math

import pytest

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.snap import (
    Builder,
    IdentitySnapFunction,
    find_first_site,
    get_snapped_winding_delta,
)


def expect_winding_delta(
    loops_str, forced_str, snap_radius_deg, ref_edge_id, expected
):
    b = Builder(IdentitySnapFunction(math.radians(snap_radius_deg)))
    for p in (TF.parse_points(forced_str) if forced_str else []):
        b.force_vertex(tuple(p))
    for loop_str in loops_str.split(";"):
        loop_str = loop_str.strip()
        verts = TF.parse_points(loop_str)
        b.add_loop([tuple(v) for v in verts])
    va, _ = b.input_edges[ref_edge_id]
    ref_in = b.input_vertices[va]
    b.build()
    ref_v = find_first_site(b, ref_edge_id)
    got = get_snapped_winding_delta(b, ref_in, ref_v)
    assert got == expected, f"delta {got} != {expected}"


class TestSnappedWindingDelta:
    def test_no_other_edges(self):
        expect_winding_delta("0:0", "0:0", 10.0, 0, 0)

    def test_degenerate_input_loops(self):
        expect_winding_delta("0:0; 1:1; 2:2", "0:0", 10.0, 0, 0)

    def test_duplicate_degenerate_input_loops(self):
        expect_winding_delta("0:0; 0:0; 1:1; 1:1", "0:0", 10.0, 0, 0)

    def test_collapsing_shell(self):
        expect_winding_delta("0:0; 1:1, 1:-2, -2:1", "0:0", 10.0, 0, -1)

    def test_collapsing_hole(self):
        expect_winding_delta("0:0; 1:1, -2:1, 1:-2", "0:0", 10.0, 0, +1)

    def test_collapsing_double_shell(self):
        expect_winding_delta(
            "0:0; 1:1, 1:-2, -2:1, 2:2, 2:-3, -3:2", "0:0", 10.0, 0, -2
        )

    def test_external_loop_ref_vertex_stays_outside(self):
        expect_winding_delta("0:0; 20:0, 0:0, 0:20", "0:0", 10.0, 0, 0)

    def test_external_loop_ref_vertex_stays_inside(self):
        expect_winding_delta("0:0; 0:-20, 0:0, 20:0", "0:0", 10.0, 0, 0)

    def test_external_loop_ref_vertex_moves_inside(self):
        expect_winding_delta("1:1; 0:-20, 1:-1, 20:0", "0:0", 10.0, 0, +1)

    def test_crossing_edge_ref_vertex_stays_outside(self):
        expect_winding_delta(
            "-1:-1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0, 0
        )

    def test_crossing_edge_ref_vertex_moves_outside(self):
        expect_winding_delta(
            "1:1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0, -1
        )

    def test_external_loop_double_hole_to_single_hole(self):
        expect_winding_delta(
            "4:4; 0:20, 3:3, 6:3, 2:7, 2:2, 2:20", "0:0", 10.0, 0, +1
        )

    def test_external_loop_double_hole_to_single_shell(self):
        expect_winding_delta(
            "4:4; 0:-20, 6:2, 2:6, 2:2, 6:2, 2:6, 2:2, 20:0",
            "0:0", 10.0, 0, +3,
        )

    def test_external_edges_cross_snap_to_same_vertex(self):
        expect_winding_delta(
            "1:1; -5:30, 7:-3, -7:-3, 5:30", "0:0, 0:15", 10.0, 0, -1
        )

    def test_external_edges_cross_snap_to_different_vertices(self):
        expect_winding_delta(
            "1:1; -5:40, 7:-3, -7:-3, 5:40",
            "0:0, 6:10, -6:10", 10.0, 0, -1,
        )

    def test_reference_point_winding_numbers_change(self):
        expect_winding_delta(
            "1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
            "0:0, 1:90", 10.0, 0, 0,
        )
        expect_winding_delta(
            "1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
            "0:0, 89:90", 10.0, 0, 0,
        )
        expect_winding_delta(
            "1:1; 70:-179.99, 5:0, 0:5, -0.01:110",
            "0:0, 1:90, 89:90", 10.0, 0, 0,
        )
        expect_winding_delta(
            "1:1; 70:179.99, 5:0, 0:5, 0:110",
            "0:0, -1:20, 1:90", 10.0, 0, 0,
        )

    def test_reference_loops_topologically_consistent(self):
        expect_winding_delta(
            "-45:24; 0:148, 0:0, -31:-48, 44:-39, -59:0",
            "-31:-48, 44:-39", 60.0, 0, -1,
        )
        expect_winding_delta(
            "-45:24;  -59:0, 44:-39, -31:-48, 0:0, 0:148",
            "-31:-48, 44:-39", 60.0, 0, 1,
        )

    def test_complex_example(self):
        expect_winding_delta(
            "1:1; "
            "70:179.99, 5:0, 0:5, 0:110; "
            "70:179.99, 0:0, 0:3, 3:0, 0:-1, 0:110; "
            "10:-10, -10:10, 10:10; "
            "2:2, 1:-2, -1:2, 2:2, 1:-2, -1:2 ",
            "0:0, -1:90, 1:90, 45:-5", 10.0, 0, -5,
        )

    def test_ensure_za_zb_not_in_voronoi_region(self):
        expect_winding_delta(
            "30:42, 30:42; -27:52, 66:131, 30:-93", "", 67.0, 0, -1
        )

    def test_ensure_chain_diff_loop_is_closed(self):
        expect_winding_delta(
            "8:26, 8:26; -36:70, -64:-35, -41:48", "", 66, 0, 0
        )
