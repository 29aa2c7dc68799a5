"""Reference golden tests for the crossing-pair validity machinery.

Cases ported from
S2GeometryTests/S2ShapeUtilVisitCrossingEdgePairsTests.cs:
FindSelfIntersection_Basic (with the full cyclic-permutation sweep the
reference runs) and the EdgeGrid brute-force-vs-indexed parity, which
here checks the distributed covering-cell crossing join against the
brute-force kernel enumeration.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels import validity as V


def _loops(polygon_str: str):
    return [
        TF.parse_points(part)
        for part in polygon_str.split(";")
        if part.strip()
    ]


def _rotations(lv: np.ndarray):
    return [np.roll(lv, -k, axis=0) for k in range(len(lv))]


def _check_permutations(loops, i, expected):
    if i == len(loops):
        assert V.has_self_intersection(loops) == expected, [
            TF.points_to_string(lv) for lv in loops
        ]
        return
    orig = loops[i]
    for rolled in _rotations(orig):
        loops[i] = rolled
        _check_permutations(loops, i + 1, expected)
    loops[i] = orig


@pytest.mark.parametrize(
    "polygon_str,has_crossing",
    [
        ("0:0, 0:1, 0:2, 1:2, 1:1, 1:0", False),
        ("0:0, 0:1, 0:2, 1:2, 0:1, 1:0", True),   # duplicate vertex
        ("0:0, 0:1, 1:0, 1:1", True),             # edge crossing
        ("0:0, 1:1, 0:1; 0:0, 1:1, 1:0", True),   # duplicate edge
        ("0:0, 1:1, 0:1; 1:1, 0:0, 1:0", True),   # reversed edge
        ("0:0, 0:2, 2:2, 2:0; 1:1, 0:2, 3:1, 2:0", True),  # vertex cross
    ],
)
def test_find_self_intersection_basic(polygon_str, has_crossing):
    # all cyclic permutations of every loop, as the reference does
    _check_permutations(_loops(polygon_str), 0, has_crossing)


def test_error_codes_by_family():
    assert V.find_self_intersection(
        _loops("0:0, 0:1, 0:2, 1:2, 1:1, 1:0")) is None
    cases = [
        ("0:0, 0:1, 0:2, 1:2, 0:1, 1:0", "DUPLICATE_VERTICES"),
        ("0:0, 0:1, 1:0, 1:1", "LOOP_SELF_INTERSECTION"),
        ("0:0, 1:1, 0:1; 0:0, 1:1, 1:0", "POLYGON_LOOPS_SHARE_EDGE"),
        ("0:0, 1:1, 0:1; 1:1, 0:0, 1:0", "POLYGON_LOOPS_SHARE_EDGE"),
        ("0:0, 0:2, 2:2, 2:0; 1:1, 0:2, 3:1, 2:0",
         "POLYGON_LOOPS_CROSS"),
        # interior crossing between two separate loops
        ("0:0, 0:3, 3:3, 3:0; 1:-1, 1:1, 2:1, 2:-1",
         "POLYGON_LOOPS_CROSS"),
    ]
    for polygon_str, code in cases:
        err = V.find_self_intersection(_loops(polygon_str))
        assert err is not None and err.startswith(code), (
            polygon_str, err)


def _grid_edges(grid_size: int = 10):
    """The EdgeGrid shape: (grid+1) meridian segments and (grid+1)
    near-parallel segments (the reference's S2EdgeVectorShape)."""
    edges = []
    eid = 0
    for i in range(grid_size + 1):
        edges.append(
            (0, eid, TF.make_point(f"0:{i}"),
             TF.make_point(f"{grid_size}:{i}"))
        )
        eid += 1
        edges.append(
            (0, eid, TF.make_point(f"{i}:0"),
             TF.make_point(f"{i}:{grid_size}"))
        )
        eid += 1
    return edges


def test_edge_grid_kernel_counts():
    edges = _grid_edges()
    pts = [(e[2], e[3]) for e in edges]
    all_pairs = V.crossing_pairs(pts)
    interior = V.crossing_pairs(pts, interior_only=True)
    assert len(all_pairs) > len(interior) > 0
    assert set(interior) <= set(all_pairs)
    # every returned interior pair is flagged interior
    assert all(flag for _, _, flag in interior)


def test_edge_grid_distributed_parity(spark):
    """Distributed covering-cell crossing join == brute-force kernel
    enumeration on the EdgeGrid (the reference's indexed-vs-brute
    parity, re-expressed against this engine's indexing strategy)."""
    from s2geometry_spark.operators import crossing as CR

    edges = _grid_edges()
    pts = [(e[2], e[3]) for e in edges]
    expected = sorted(
        (i, j)
        for i, j, _ in V.crossing_pairs(pts, interior_only=True)
    )
    df = CR.edges_df(spark, edges)
    out = CR.crossing_edges_join(
        spark, df, df, CR.max_edge_radians(edges)
    ).collect()
    got = sorted(
        {
            (min(r.a_edge, r.b_edge), max(r.a_edge, r.b_edge))
            for r in out
            if r.a_edge != r.b_edge
        }
    )
    assert got == expected


def test_validate_chains_summary():
    n_chains, n_edges, n_pairs, code = V.validate_chains(
        _loops("0:0, 0:1, 0:2, 1:2, 1:1, 1:0"))
    assert (n_chains, n_edges, code) == (1, 6, "OK")
    assert n_pairs > 0  # adjacent edges share vertices (sign 0)


def test_long_edges_use_level_zero_cover(spark):
    """Edges longer than the level-1 min width (~0.4714 rad) must join
    at level 0 — the old max(1, ...) clamp narrowed the candidate
    cover for them.  Two 30-degree (~0.52 rad) edges crossing mid-span."""
    from s2geometry_spark.operators import crossing as CR

    edges = [
        (0, 0, TF.make_point("0:-15"), TF.make_point("0:15")),
        (1, 0, TF.make_point("-15:0"), TF.make_point("15:0")),
        # a control pair far away that does NOT cross
        (2, 0, TF.make_point("50:100"), TF.make_point("50:140")),
        (3, 0, TF.make_point("60:100"), TF.make_point("60:140")),
    ]
    max_rad = CR.max_edge_radians(edges)
    assert max_rad > 0.47  # long enough to force level 0
    df = CR.edges_df(spark, edges)
    out = CR.crossing_edges_join(spark, df, df, max_rad).collect()
    pairs = sorted(
        {(min(r.a_line, r.b_line), max(r.a_line, r.b_line))
         for r in out if r.a_line != r.b_line}
    )
    assert pairs == [(0, 1)]


def test_crossing_join_rejects_uncoverable_edge_length(spark):
    """Past the level-0 min width no join level is provably complete —
    the operator must fail loudly, not silently drop pairs."""
    import pytest as _pytest

    from s2geometry_spark.constants import KMIN_WIDTH
    from s2geometry_spark.operators import crossing as CR

    edges = [(0, 0, TF.make_point("0:0"), TF.make_point("0:1"))]
    df = CR.edges_df(spark, edges)
    with _pytest.raises(ValueError, match="level-0 min cell width"):
        CR.crossing_edges_join(
            spark, df, df, KMIN_WIDTH.get_value(0) * 1.01
        )
