"""S2Builder simplify_edge_chains golden tests, ported from
S2GeometryTests/S2BuilderTests.cs (the Simplify* battery)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import builder_layers as BL
from s2geometry_spark.kernels import graph as G
from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.loop import Loop, loop_contains_nested
from s2geometry_spark.kernels.snap import (
    Builder,
    IdentitySnapFunction,
    IntLatLngSnapFunction,
)

from test_snap_builder import regular_loop

EDGE_TYPES = (G.DIRECTED, G.UNDIRECTED)


def _polyline_graph_options(edge_type):
    # S2PolylineLayer graph options
    return G.GraphOptions(
        edge_type, G.DEGENERATE_DISCARD, G.DUPLICATE_KEEP, G.SIBLING_KEEP
    )


def run_polyline_layers(input_strs, edge_type, snap, *, split=False,
                        simplify=True):
    b = Builder(
        snap,
        split_crossing_edges=split,
        simplify_edge_chains=simplify,
    )
    lays = []
    for s in input_strs:
        lays.append(b.start_layer(_polyline_graph_options(edge_type)))
        b.add_polyline(TF.parse_points(s))
    b.build()
    outs = [
        BL.polyline_layer(b, lay, edge_type=edge_type) for lay in lays
    ]
    return "; ".join(o.to_debug_string() for o in outs)


def check_polylines_both(input_strs, expected_strs, snap, *, split=False):
    for et in EDGE_TYPES:
        got = run_polyline_layers(input_strs, et, snap, split=split)
        assert got == "; ".join(expected_strs), et


def test_simplify_one_edge():
    # perturbed edge chain simplifies to a single edge
    check_polylines_both(
        ["0:0, 1:0.5, 2:-0.5, 3:0.5, 4:-0.5, 5:0"],
        ["0:0, 5:0"],
        IdentitySnapFunction(math.radians(1)),
    )


def test_simplify_nearly_antipodal():
    check_polylines_both(
        ["0:180, 0:1e-09, 32:32"],
        ["0:180, 0:1e-09, 32:32"],
        IdentitySnapFunction(math.radians(1)),
    )


def test_simplify_two_layers():
    # two polylines that cross: the intersection vertex must survive
    check_polylines_both(
        ["-2:-1, -1:0, 1:0, 2:1", "1:-2, 0:-1, 0:1, -1:2"],
        ["-2:-1, 0:0, 2:1", "1:-2, 0:0, -1:2"],
        IdentitySnapFunction(math.radians(0.5)),
        split=True,
    )


def test_simplify_opposite_directions():
    # same arc followed in opposite directions snaps identically
    check_polylines_both(
        [
            "-4:0.83, -3:0.46, -2:0.2, -1:0.05, 0:0, 1:0.5, 2:0.2, "
            "3:0.46, 4:0.83",
            "4:.83, 3:.46, 2:.2, 1:.05, 0:0, -1:.5, -2:.2, -3:.46, -4:.83",
        ],
        ["-4:0.83, -2:0.2, 4:0.83", "4:0.83, -2:0.2, -4:0.83"],
        IdentitySnapFunction(math.radians(0.5)),
    )


def test_simplify_keeps_edge_vertex_separation():
    # simplifying the first polyline to a straight line would approach
    # the second polyline too closely
    check_polylines_both(
        ["0:-10, 0.99:0, 0:10", "-5:-5, -0.2:0, -5:5"],
        ["0:-10, 0.99:0, 0:10", "-5:-5, -0.2:0, -5:5"],
        IdentitySnapFunction(math.radians(1.0)),
    )


def test_simplify_backtracking_edge_chain():
    # backtracking prevents simplification (parametric approximation)
    check_polylines_both(
        [
            "0:0, 1:0, 2:0, 3:0, 4:0, 5:0, 4:0, 3:0, "
            "2:0, 3:0, 4:0, 5:0, 6:0, 7:0"
        ],
        ["0:0, 2:0, 5:0, 2:0, 5:0, 7:0"],
        IdentitySnapFunction(math.radians(0.5)),
    )


def test_simplify_avoids_backtracking_vertices():
    # extending a chain can require avoiding a vertex closer than the
    # previous chain endpoint
    snap = IdentitySnapFunction(math.radians(1.0))
    from s2geometry_spark.kernels.polyline import edge_distance

    assert edge_distance(
        TF.make_point("0:1.05"), TF.make_point("0:0"),
        TF.make_point("1:2"),
    ) < snap.min_edge_vertex_separation()
    check_polylines_both(
        ["0:0, 1:0.1, 1:2", "0:1.05, -10:1.05"],
        ["0:0, 1:0.1, 1:2", "0:1.05, -10:1.05"],
        snap,
    )


def test_simplify_limits_edge_deviation():
    # an extra site added at the midpoint of an over-deviating edge
    # must NOT be simplified away
    check_polylines_both(
        ["-30.49:-29.51, 29.51:30.49"],
        ["-30:-30, -1:1, 30:30"],
        IntLatLngSnapFunction(0),
    )


@pytest.mark.parametrize("edge_type", EDGE_TYPES)
def test_simplify_one_loop(edge_type):
    # a 1000-vertex regular loop of radius 20 degrees simplifies to
    # 10-12 vertices (vs ~95 with snapping alone)
    snap_radius = math.radians(1)
    b = Builder(
        IdentitySnapFunction(snap_radius), simplify_edge_chains=True
    )
    lay = b.start_layer(G.GraphOptions(
        edge_type, G.DEGENERATE_DISCARD, G.DUPLICATE_KEEP,
        G.SIBLING_DISCARD,
    ))
    loop = regular_loop((1, 0, 0), math.radians(20), 1000)
    b.add_loop(loop)
    b.build()
    out = BL.polygon_layer(b, lay, edge_type=edge_type)
    assert len(out.loops) == 1
    assert 10 <= len(out.loops[0]) <= 12
    # boundary stays within snap_radius of the input: sample input
    # vertices against the output edges
    from s2geometry_spark.kernels.cell_dist import points_to_edges_min

    ov = np.asarray(out.loops[0])
    for v in loop[::37]:
        d2 = points_to_edges_min(
            v[None, :], ov, np.roll(ov, -1, axis=0))
        assert 2 * math.asin(0.5 * math.sqrt(d2)) <= snap_radius * 1.01


def test_simplify_preserves_topology():
    # nested concentric loops stay nested after simplification
    # (reduced from the reference's 20 x 1000 to keep the brute-force
    # driver-side site scans fast; same nesting assertion)
    k_num_loops = 6
    k_verts = 200
    base_radius = math.radians(5)
    snap_radius = math.radians(0.1)
    b = Builder(
        IdentitySnapFunction(snap_radius), simplify_edge_chains=True
    )
    lays = []
    for j in range(k_num_loops):
        radius = base_radius + 0.7 * j * j / k_num_loops * snap_radius
        lays.append(b.start_layer(G.GraphOptions(
            G.DIRECTED, G.DEGENERATE_DISCARD, G.DUPLICATE_KEEP,
            G.SIBLING_DISCARD,
        )))
        b.add_loop(regular_loop((1, 0, 0), radius, k_verts))
    b.build()
    outs = [BL.polygon_layer(b, lay) for lay in lays]
    loops = []
    for o in outs:
        assert len(o.loops) == 1
        loops.append(Loop(o.loops[0]))
    for j in range(1, k_num_loops):
        assert loop_contains_nested(loops[j], loops[j - 1]), j


def test_simplify_removes_sibling_pairs():
    def run(simplify):
        b = Builder(
            IntLatLngSnapFunction(0), simplify_edge_chains=simplify
        )
        opts = G.GraphOptions(
            G.DIRECTED, G.DEGENERATE_DISCARD, G.DUPLICATE_KEEP,
            G.SIBLING_DISCARD,
        )
        lay = b.start_layer(opts)
        b.add_polyline(TF.parse_points("0:0, 0:10"))
        b.add_polyline(TF.parse_points("0:10, 0.6:5, 0:0"))
        b.build()
        out = BL.polyline_vector_layer(
            b, lay, sibling_pairs=G.SIBLING_DISCARD)
        return out.to_debug_string()

    # without simplification there is no sibling pair
    assert run(False) == "0:0, 0:10, 1:5, 0:0"
    # simplification produces a sibling pair, which is then discarded
    assert run(True) == ""
