"""S2Polygon.InitOriented property tests (S2Polygon.cs:228-321).

No reference goldens exist for InitOriented (the C# tests drive it only
through round-trip equivalences), so the contract is property-based:

1. For loops oriented interior-on-left (CCW shells, CW holes),
   InitOriented builds the SAME REGION as InitNested given the loops
   in canonical orientation — checked by winding parity over a
   deterministic probe grid.
2. Orientation of the inputs does not matter beyond interior-side
   consistency: reversing a hole's CW orientation to CCW (making the
   set inconsistent) raises the inconsistent-orientation flag.
3. A complement-oriented input (interior on the left = everything
   OUTSIDE the shell) yields the complementary region.
"""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernels.builder_layers import init_oriented
from s2geometry_spark.kernels.loop import Polygon
from s2geometry_spark.kernels.measures import loop_signed_area
from s2geometry_spark.sources import regions_src as R


def _probe_points(n: int = 400) -> np.ndarray:
    rng = np.random.RandomState(17)
    p = rng.randn(n, 3)
    return p / np.linalg.norm(p, axis=1)[:, None]


def _region_contains(loops, pts) -> np.ndarray:
    poly = Polygon([np.asarray(lv) for lv in loops])
    return np.asarray(poly.contains_points(pts), dtype=bool)


def _ccw(verts: np.ndarray) -> np.ndarray:
    return verts if loop_signed_area(verts) > 0 else verts[::-1].copy()


def _cw(verts: np.ndarray) -> np.ndarray:
    return verts if loop_signed_area(verts) < 0 else verts[::-1].copy()


def _shell_hole(key: int):
    """CCW shell + concentric CW hole, interior-on-left oriented."""
    outer = R.loop_vertices(key)
    cx, cy, cz, _ = R.cap_params(key)
    c = np.array([cx, cy, cz])
    inner = outer * 0.4 + c[None, :] * 0.6
    inner /= np.linalg.norm(inner, axis=1)[:, None]
    return _ccw(outer), _cw(inner)


@pytest.mark.parametrize("key", [0, 3, 7, 11, 19])
def test_oriented_equals_nested_region(key):
    shell, hole = _shell_hole(key)
    pts = _probe_points()
    # scrambled input order and hole given CW (interior-on-left)
    built = init_oriented([hole, shell])
    assert built.error is None
    want = _region_contains([shell, hole[::-1]], pts)
    got = _region_contains(built.loops, pts)
    assert (got == want).all()
    # depths follow nesting preorder: shell 0, hole 1
    assert sorted(built.depths) == [0, 1]


@pytest.mark.parametrize("key", [1, 5, 13])
def test_inconsistent_orientations_flagged(key):
    shell, hole = _shell_hole(key)
    # both CCW: the region between them is on the left of one loop and
    # the right of the other — no consistent interior exists
    built = init_oriented([shell, hole[::-1].copy()])
    assert built.error == "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"


@pytest.mark.parametrize("key", [2, 9])
def test_complement_orientation_inverts(key):
    shell, _hole = _shell_hole(key)
    pts = _probe_points()
    inside_shell = _region_contains([shell], pts)
    built = init_oriented([shell[::-1].copy()])  # interior = outside
    assert built.error is None
    got = _region_contains(built.loops, pts)
    assert (got == ~inside_shell).all()


def test_multi_shell_preorder():
    keys = [0, 4, 8]
    loops = []
    want_sets = []
    for k in keys:
        shell, hole = _shell_hole(k)
        loops.extend([hole, shell])
        # expected region built from canonical CCW rings (the Polygon
        # origin bit is orientation-aware)
        want_sets.extend([shell, hole[::-1].copy()])
    pts = _probe_points()
    built = init_oriented(loops)
    assert built.error is None
    want = _region_contains(want_sets, pts)
    got = _region_contains(built.loops, pts)
    assert (got == want).all()
    assert sorted(built.depths) == [0, 0, 0, 1, 1, 1]
