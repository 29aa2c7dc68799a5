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


class TestRandomLoopsIdentity:
    """Scaled-down RandomLoops validation (the reference runs 10M
    iterations of this identity): for random simple loops snapped with
    a random radius, the winding number of the snapped reference
    vertex w.r.t. the snapped loops must equal the winding number of
    the original reference vertex w.r.t. the input loops plus the
    computed delta.  Trials where the snapped reference vertex lands
    on another snapped loop's boundary (ambiguous containment) are
    skipped deterministically."""

    def test_identity(self):
        import numpy as np

        from s2geometry_spark.kernels.edges import (
            loop_contains_points,
        )
        from s2geometry_spark.kernels.polyline import edge_distance

        rng = np.random.default_rng(20260818)
        checked = 0
        for trial in range(120):
            n_loops = int(rng.integers(1, 4))
            snap_deg = float(rng.uniform(1.0, 12.0))
            b = Builder(IdentitySnapFunction(math.radians(snap_deg)))
            loops = []
            for _ in range(n_loops):
                c = rng.standard_normal(3)
                c /= np.linalg.norm(c)
                u = np.cross(c, [0.0, 0.0, 1.0])
                if np.linalg.norm(u) < 1e-6:
                    u = np.cross(c, [0.0, 1.0, 0.0])
                u /= np.linalg.norm(u)
                v = np.cross(c, u)
                r = rng.uniform(0.1, 0.5)
                k = int(rng.integers(3, 8))
                ang = np.sort(rng.uniform(0, 2 * np.pi, k))
                verts = [
                    tuple(
                        (c * np.cos(r) + (u * np.cos(a) + v * np.sin(a))
                         * np.sin(r))
                    )
                    for a in ang
                ]
                loops.append(verts)
            # reference vertex: a degenerate loop at loop 0's centroid
            ref_in = tuple(
                np.asarray(loops[0]).mean(axis=0)
                / np.linalg.norm(np.asarray(loops[0]).mean(axis=0))
            )
            b.add_loop([ref_in])
            for lp in loops:
                b.add_loop(lp)
            b.build()
            ref_v = find_first_site(b, 0)
            ref_out = tuple(map(float, b.sites[ref_v]))
            delta = get_snapped_winding_delta(b, ref_in, ref_v)

            # winding before: containment count over input loops
            p_in = np.asarray([ref_in])
            w_in = sum(
                int(loop_contains_points(np.asarray(lp), p_in)[0])
                for lp in loops
            )
            # winding after: containment count over snapped rings
            # (degenerate edges and sibling pairs cancel in layer_loops)
            rings = b.layer_loops()
            skip = False
            for ring in rings:
                V = [tuple(map(float, q)) for q in ring]
                if any(q == ref_out for q in V):
                    skip = True
                    break
                d = min(
                    edge_distance(ref_out, V[i], V[(i + 1) % len(V)])
                    for i in range(len(V))
                )
                if d < 1e-9:
                    skip = True
                    break
            if skip:
                continue
            p_out = np.asarray([ref_out])
            w_out = sum(
                int(loop_contains_points(np.asarray(r), p_out)[0])
                for r in rings
            )
            assert w_out - w_in == delta, (
                f"trial {trial}: w_in={w_in} w_out={w_out} delta={delta}"
            )
            checked += 1
        assert checked >= 60  # most trials must actually be validated
