"""RegionCoverer golden + invariant tests.

Canonicalization cases verbatim from the reference suite
(S2RegionCovererTests.cs:446-536); covering validity via a port of
CheckCovering (S2GeometryTests/Utils/S2Testing.cs:455-487).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.constants import MAX_LEVEL
from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import cellunion as CU
from s2geometry_spark.kernels.coverer import CovererOptions, RegionCoverer
from s2geometry_spark.kernels.geom import Cap, Cell, LatLngRect, ll_to_point, normalize


def cell_from_path(path: str) -> int:
    """Parse 'face/childdigits' debug notation (S2CellId.cs:1108-1127)."""
    face_str, _, digits = path.partition("/")
    cid = int(CI.from_face(np.array([int(face_str)]))[0])
    for c in digits:
        cid = int(CI.child(np.array([cid], np.uint64), int(c))[0])
    return cid


def path_of(cid: int) -> str:
    lv = CU._level(cid)
    f = cid >> 61
    digits = []
    for level in range(1, lv + 1):
        digits.append(str((cid >> (2 * (MAX_LEVEL - level) + 1)) & 3))
    return f"{f}/{''.join(digits)}"


def canonicalize(paths, **opts) -> list[str]:
    cov = [cell_from_path(p) for p in paths]
    rc = RegionCoverer(CovererOptions(**opts))
    rc.canonicalize_covering(cov)
    return [path_of(c) for c in cov]


class TestCanonicalizeGolden:
    # S2RegionCovererTests.cs:446-536
    def test_unsorted_duplicates(self):
        got = canonicalize(["1/200", "1/13122", "1/20", "1/131", "1/13100"])
        assert got == ["1/131", "1/20"]

    def test_max_level(self):
        got = canonicalize(
            ["0/3001", "0/3002", "4/012301230123"], max_level=2
        )
        assert got == ["0/30", "4/01"]

    def test_min_level_and_level_mod(self):
        got = canonicalize(
            ["0/0", "1/11", "2/222", "3/3333"], min_level=1, level_mod=3
        )
        assert got == ["0/0", "1/1", "2/2", "3/3333"]

    def test_level_mod_2_grandchildren_merge(self):
        # 16 grandchildren of one face cell -> face cell
        paths = []
        for i in range(4):
            for j in range(4):
                paths.append(f"0/{i}{j}")
        got = canonicalize(paths, level_mod=2)
        assert got == ["0/"]

    def test_min_level1_level_mod2_denormalize(self):
        got = canonicalize(
            ["0/", "1/130", "1/131", "1/132", "1/133"], min_level=1, level_mod=2
        )
        assert got == [
            "0/0", "0/1", "0/2", "0/3", "1/130", "1/131", "1/132", "1/133"
        ]

    def test_max_cells_merges_smallest(self):
        got = canonicalize(
            ["0/", "1/0", "1/1", "2/01300", "2/0131313"], max_cells=3
        )
        assert got == ["0/", "1/", "2/013"]

    def test_repeated_merge_to_parent(self):
        got = canonicalize(
            ["0/0121", "0/0123", "1/0111", "1/0112", "1/0113",
             "1/0121", "1/0122", "1/0123"],
            max_cells=8 - 1,  # force a merge
        )
        # merging happens bottom-up toward common ancestors
        rc = RegionCoverer(CovererOptions(max_cells=7))
        assert rc.is_canonical([cell_from_path(p) for p in got])


# ---------------------------------------------------------------------
# CheckCovering invariant (S2Testing.cs:455-487)
# ---------------------------------------------------------------------

def check_covering(region, covering: list[int], check_tight: bool, cid: int = 0):
    if cid == 0:
        for face in range(6):
            check_covering(
                region, covering, check_tight, int(CI.from_face(np.array([face]))[0])
            )
        return
    cell = Cell(cid)
    if not region.may_intersect_cell(cell):
        if check_tight:
            assert not CU.intersects_id(covering, cid), path_of(cid)
    elif not CU.contains_id(covering, cid):
        assert not region.contains_cell(cell), path_of(cid)
        assert CU._level(cid) < MAX_LEVEL, "leaf not covered"
        for k in range(4):
            check_covering(
                region, covering, check_tight,
                int(CI.child(np.array([cid], np.uint64), k)[0]),
            )


def make_cap(seed: int) -> Cap:
    rng = np.random.default_rng(seed)
    v = rng.normal(size=3)
    center = normalize(tuple(v))
    radius = float(rng.uniform(0.001, 0.5))
    return Cap.from_center_radians(center, radius)


class TestCapCoverings:
    @pytest.mark.parametrize("seed", range(25))
    def test_covering_valid(self, seed):
        cap = make_cap(seed)
        rc = RegionCoverer(CovererOptions(max_cells=8))
        cov = rc.get_covering(cap)
        assert 0 < len(cov)
        assert rc.is_canonical(cov) or len(cov) <= 8
        check_covering(cap, CU.normalize(cov), False)

    @pytest.mark.parametrize("seed", range(10))
    def test_interior_covering_contained(self, seed):
        cap = make_cap(seed + 100)
        rc = RegionCoverer(CovererOptions(max_cells=8, max_level=12))
        interior = rc.get_interior_covering(cap)
        for cid in interior:
            assert cap.contains_cell(Cell(cid)), path_of(cid)

    def test_max_cells_respected(self):
        for seed in range(10):
            cap = make_cap(seed + 200)
            for max_cells in (4, 8, 16):
                rc = RegionCoverer(CovererOptions(max_cells=max_cells))
                cov = rc.get_covering(cap)
                # min_level=0 default: result must respect max_cells
                assert len(cov) <= max_cells + 3  # reference guarantee slack
                assert len(cov) <= max(max_cells, 6)


class TestRectCoverings:
    @pytest.mark.parametrize("seed", range(15))
    def test_covering_valid(self, seed):
        rng = np.random.default_rng(seed + 300)
        lat0, lat1 = sorted(rng.uniform(-85, 85, 2))
        lng0 = rng.uniform(-180, 180)
        span = rng.uniform(0.5, 90)
        rect = LatLngRect.from_degrees(lat0, lng0, lat1, min(180.0, lng0 + span))
        rc = RegionCoverer(CovererOptions(max_cells=8))
        cov = rc.get_covering(rect)
        assert cov
        check_covering(rect, CU.normalize(cov), False)

    def test_point_membership_consistency(self):
        # every contained point's leaf must be inside the covering
        rect = LatLngRect.from_degrees(10, 20, 30, 50)
        rc = RegionCoverer(CovererOptions(max_cells=20))
        cov = rc.get_covering(rect)
        rng = np.random.default_rng(7)
        lats = rng.uniform(10, 30, 2000)
        lngs = rng.uniform(20, 50, 2000)
        leafs = CI.ll_to_cellid(lats, lngs)
        for leaf in leafs.tolist():
            assert CU.contains_id(CU.normalize(cov), int(leaf))


class TestCellUnionOps:
    def test_normalize_siblings(self):
        parent = cell_from_path("3/12")
        kids = [int(CI.child(np.array([parent], np.uint64), k)[0]) for k in range(4)]
        assert CU.normalize(kids) == [parent]

    def test_union_intersection_difference(self):
        a = CU.normalize([cell_from_path("1/1"), cell_from_path("1/2")])
        b = CU.normalize([cell_from_path("1/12"), cell_from_path("1/3")])
        u = CU.union(a, b)
        assert CU.contains_id(u, cell_from_path("1/12"))
        assert CU.contains_id(u, cell_from_path("1/3"))
        inter = CU.intersection(a, b)
        assert inter == [cell_from_path("1/12")]
        diff = CU.difference(a, b)
        # 1/12 removed from 1/1
        assert not CU.intersects_id(diff, cell_from_path("1/12"))
        assert CU.contains_id(diff, cell_from_path("1/11"))
        assert CU.contains_id(diff, cell_from_path("1/2"))

    def test_expand_level_covers_neighbors(self):
        cid = cell_from_path("2/11")
        expanded = CU.expand_level([cid], 2)
        nbrs = CI.all_neighbors(np.array([cid], np.uint64), 2)[0]
        for n in nbrs.tolist():
            assert CU.contains_id(expanded, int(n))
