"""Loop <-> loop relation goldens from S2LoopTests.cs
(Test_S2LoopTestBase_LoopRelations + the shared-boundary
pieces-sticking-out cases :494-608).  Flags: CONTAINS (A contains B),
CONTAINED (B contains A), DISJOINT; unset containment flags with no
DISJOINT means the loops properly overlap."""

from __future__ import annotations

import pytest

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.loop import (
    loop_contains_loop,
    loop_intersects_loop,
)

L = {
    "north_hemi": "0:-180, 0:-90, 0:0, 0:90",
    "north_hemi3": "0:-180, 0:-60, 0:60",
    "south_hemi": "0:90, 0:0, 0:-90, 0:-180",
    "west_hemi": "0:-180, -90:0, 0:0, 90:0",
    "east_hemi": "90:0, 0:0, -90:0, 0:-180",
    "near_hemi": "0:-90, -90:0, 0:90, 90:0",
    "far_hemi": "90:0, 0:90, -90:0, 0:-90",
    "candy_cane": "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",
    "small_ne_cw": "35:20, 45:20, 40:25",
    "arctic_80": "80:-150, 80:-30, 80:90",
    "antarctic_80": "-80:120, -80:0, -80:-120",
    "loop_a": "0:178, -1:180, 0:-179, 1:-180",
    "loop_b": "0:179, -1:180, 0:-178, 1:-180",
    "a_intersect_b": "0:179, -1:180, 0:-179, 1:-180",
    "a_union_b": "0:178, -1:180, 0:-178, 1:-180",
    "a_minus_b": "0:178, -1:180, 0:179, 1:-180",
    "b_minus_a": "0:-179, -1:180, 0:-178, 1:-180",
    "loop_c": "0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180",
    "loop_d": "0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180",
    "loop_e": "0:30, 0:34, 0:36, 0:39, 0:41, 0:44, 30:44, 30:30",
    "loop_f": "0:30, -30:30, -30:44, 0:44, 0:41, 0:39, 0:36, 0:34",
    "loop_g": "0:30, 0:34, 10:34, 10:36, 0:36, 0:39, 10:39, 10:41, 0:41, "
              "0:44, 30:44, 30:30",
    "loop_h": "0:30, 0:34, -10:34, -10:36, 0:36, 0:39, 10:39, 10:41, 0:41, "
              "0:44, 30:44, 30:30",
    "loop_i": "10:34, 0:34, -10:34, -10:36, 0:36, 10:36",
}

LOOPS = {name: TF.make_loop(text) for name, text in L.items()}

CONTAINS, CONTAINED, DISJOINT, COVERS = 1, 2, 4, 8

# (a, b, flags) — ported rows (empty/full sentinels excluded; our Loop
# has no empty/full representation)
CASES = [
    ("north_hemi", "north_hemi", CONTAINS | CONTAINED),
    ("north_hemi", "south_hemi", DISJOINT | COVERS),
    ("north_hemi", "east_hemi", 0),
    ("north_hemi", "arctic_80", CONTAINS),
    ("north_hemi", "antarctic_80", DISJOINT),
    ("north_hemi", "candy_cane", 0),
    ("north_hemi3", "north_hemi3", CONTAINS | CONTAINED),
    ("north_hemi3", "east_hemi", 0),
    ("north_hemi3", "arctic_80", CONTAINS),
    ("north_hemi3", "antarctic_80", DISJOINT),
    ("north_hemi3", "candy_cane", 0),
    ("south_hemi", "north_hemi", DISJOINT | COVERS),
    ("south_hemi", "south_hemi", CONTAINS | CONTAINED),
    ("south_hemi", "far_hemi", 0),
    ("south_hemi", "arctic_80", DISJOINT),
    ("south_hemi", "antarctic_80", CONTAINS),
    ("south_hemi", "candy_cane", 0),
    ("candy_cane", "north_hemi", 0),
    ("candy_cane", "south_hemi", 0),
    ("candy_cane", "arctic_80", DISJOINT),
    ("candy_cane", "antarctic_80", DISJOINT),
    ("candy_cane", "candy_cane", CONTAINS | CONTAINED),
    ("near_hemi", "west_hemi", 0),
    ("small_ne_cw", "south_hemi", CONTAINS),
    ("small_ne_cw", "west_hemi", CONTAINS),
    ("small_ne_cw", "north_hemi", COVERS),
    ("small_ne_cw", "east_hemi", COVERS),
    ("loop_a", "loop_a", CONTAINS | CONTAINED),
    ("loop_a", "loop_b", 0),
    ("loop_a", "a_intersect_b", CONTAINS),
    ("loop_a", "a_union_b", CONTAINED),
    ("loop_a", "a_minus_b", CONTAINS),
    ("loop_a", "b_minus_a", DISJOINT),
    ("loop_b", "loop_a", 0),
    ("loop_b", "a_intersect_b", CONTAINS),
    ("loop_b", "a_union_b", CONTAINED),
    ("loop_b", "a_minus_b", DISJOINT),
    ("loop_b", "b_minus_a", CONTAINS),
    ("a_intersect_b", "loop_a", CONTAINED),
    ("a_intersect_b", "loop_b", CONTAINED),
    ("a_intersect_b", "a_union_b", CONTAINED),
    ("a_intersect_b", "a_minus_b", DISJOINT),
    ("a_intersect_b", "b_minus_a", DISJOINT),
    ("a_union_b", "loop_a", CONTAINS),
    ("a_union_b", "loop_b", CONTAINS),
    ("a_union_b", "a_intersect_b", CONTAINS),
    ("a_union_b", "a_minus_b", CONTAINS),
    ("a_union_b", "b_minus_a", CONTAINS),
    ("a_minus_b", "loop_a", CONTAINED),
    ("a_minus_b", "loop_b", DISJOINT),
    ("a_minus_b", "a_intersect_b", DISJOINT),
    ("a_minus_b", "a_union_b", CONTAINED),
    ("a_minus_b", "b_minus_a", DISJOINT),
    ("b_minus_a", "loop_a", DISJOINT),
    ("b_minus_a", "loop_b", CONTAINED),
    ("b_minus_a", "a_intersect_b", DISJOINT),
    ("b_minus_a", "a_union_b", CONTAINED),
    ("b_minus_a", "a_minus_b", DISJOINT),
    # shared-boundary pieces sticking out / in (:587-608)
    ("loop_a", "loop_c", 0),
    ("loop_c", "loop_a", 0),
    ("loop_a", "loop_d", CONTAINED),
    ("loop_d", "loop_a", CONTAINS),
    ("loop_e", "loop_f", DISJOINT),
    ("loop_e", "loop_g", CONTAINS),
    ("loop_e", "loop_h", 0),
    ("loop_e", "loop_i", 0),
    ("loop_f", "loop_g", DISJOINT),
    ("loop_f", "loop_h", 0),
    ("loop_f", "loop_i", 0),
    ("loop_g", "loop_h", CONTAINED),
    ("loop_h", "loop_g", CONTAINS),
    ("loop_g", "loop_i", DISJOINT),
    ("loop_h", "loop_i", CONTAINS),
]


SHARED_EDGE = {('a_intersect_b', 'loop_b'), ('a_minus_b', 'a_union_b'), ('loop_b', 'b_minus_a'), ('loop_a', 'a_minus_b'), ('a_union_b', 'a_minus_b'), ('loop_e', 'loop_f'), ('loop_f', 'loop_h'), ('loop_h', 'loop_g'), ('b_minus_a', 'a_intersect_b'), ('a_intersect_b', 'b_minus_a'), ('north_hemi', 'north_hemi'), ('b_minus_a', 'loop_b'), ('loop_f', 'loop_g'), ('north_hemi', 'south_hemi'), ('a_minus_b', 'loop_a'), ('loop_a', 'a_intersect_b'), ('south_hemi', 'north_hemi'), ('a_intersect_b', 'loop_a'), ('loop_b', 'a_minus_b'), ('b_minus_a', 'a_union_b'), ('north_hemi3', 'north_hemi3'), ('a_union_b', 'loop_b'), ('south_hemi', 'south_hemi'), ('a_minus_b', 'a_minus_b'), ('loop_d', 'loop_a'), ('b_minus_a', 'b_minus_a'), ('loop_a', 'a_union_b'), ('loop_g', 'loop_i'), ('a_union_b', 'a_union_b'), ('a_intersect_b', 'a_minus_b'), ('a_union_b', 'b_minus_a'), ('loop_a', 'loop_c'), ('loop_a', 'b_minus_a'), ('loop_h', 'loop_i'), ('loop_b', 'a_intersect_b'), ('b_minus_a', 'loop_a'), ('loop_b', 'loop_b'), ('loop_c', 'loop_a'), ('a_minus_b', 'a_intersect_b'), ('loop_e', 'loop_h'), ('loop_a', 'loop_a'), ('loop_g', 'loop_h'), ('a_union_b', 'loop_a'), ('a_minus_b', 'loop_b'), ('loop_a', 'loop_d'), ('loop_b', 'a_union_b'), ('a_intersect_b', 'a_intersect_b'), ('candy_cane', 'candy_cane'), ('loop_e', 'loop_g')}


@pytest.mark.parametrize("case", CASES, ids=[f"{a}-vs-{b}" for a, b, _ in CASES])
def test_loop_relation(case):
    from s2geometry_spark.kernels.loop import (
        loop_compare_boundary,
        loop_contains_nested,
    )

    a_name, b_name, flags = case
    a, b = LOOPS[a_name], LOOPS[b_name]
    shared = (a_name, b_name) in SHARED_EDGE
    assert loop_contains_loop(a, b) == bool(flags & CONTAINS), "contains"
    assert loop_contains_loop(b, a) == bool(flags & CONTAINED), "contained"
    assert loop_intersects_loop(a, b) == (not flags & DISJOINT), "intersects"
    # intersects is symmetric
    assert loop_intersects_loop(b, a) == (not flags & DISJOINT)
    # CompareBoundary expectations (TestRelationWithDesc:1208-1227)
    comparison = 0
    if (flags & CONTAINS) or ((flags & COVERS) and not shared):
        comparison = 1
    if (flags & DISJOINT) or ((flags & CONTAINED) and not shared):
        comparison = -1
    assert loop_compare_boundary(a, b) == comparison, "compare_boundary"
    # ContainsNested agrees with Contains when the loops do not cross
    if not shared and (flags & (CONTAINS | CONTAINED | DISJOINT)):
        assert loop_contains_nested(a, b) == loop_contains_loop(a, b)


class TestLoopValidation:
    """S2LoopTests.cs Test_S2Loop_IsValidDetectsInvalidLoops."""

    def _invalid(self, text_or_pts, snippet):
        from s2geometry_spark.kernels.loop import find_validation_error

        if isinstance(text_or_pts, str):
            pts = TF.parse_points(text_or_pts)
        else:
            pts = text_or_pts
        err = find_validation_error(pts)
        assert err is not None and snippet in err, (err, snippet)

    def test_reference_invalid_cases(self):
        import numpy as np

        self._invalid("", "at least 3 vertices")
        self._invalid("20:20, 21:21", "at least 3 vertices")
        self._invalid("20:20, 20:20, 20:21", "degenerate")
        self._invalid("20:20, 20:21, 20:20", "degenerate")
        self._invalid("20:20, 21:21, 21:20, 20:20, 20:21", "duplicate vertex")
        self._invalid("20:20, 21:21, 21:20.5, 21:20, 20:21", "cross")
        self._invalid(
            np.array([(1.0, 0, 0), (-1.0, 0, 0), (0, 0, 1.0)]), "antipodal"
        )
        self._invalid(
            np.array([(2.0, 0, 0), (0, 1.0, 0), (0, 0, 1.0)]), "unit length"
        )

    def test_valid_loops(self):
        from s2geometry_spark.kernels.loop import loop_is_valid

        for name in ("north_hemi", "candy_cane", "loop_a", "loop_g"):
            assert loop_is_valid(LOOPS[name].verts), name
