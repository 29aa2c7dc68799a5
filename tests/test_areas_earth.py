"""Cell/cell-union area functions + Earth conversions
(S2Cell.cs:171-213, S2CellUnion.cs:486-534, S2Earth.cs)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import cellunion as CU
from s2geometry_spark.kernels import earth as EA
from s2geometry_spark.kernels.geom import (
    Cell,
    cell_approx_area,
    cell_average_area,
    cell_exact_area,
)


class TestCellAreas:
    def test_face_cells_cover_sphere_exactly(self):
        faces = [int(CI.from_face(np.array([f]))[0]) for f in range(6)]
        total = sum(cell_exact_area(Cell(c)) for c in faces)
        assert abs(total - 4 * math.pi) < 1e-9

    def test_average_area_is_exact_partition(self):
        # 6*4^level cells x average area == 4pi exactly
        for level in (0, 3, 10, 30):
            assert abs(
                cell_average_area(level) * 6 * 4**level - 4 * math.pi
            ) < 1e-9

    def test_approx_vs_exact(self):
        rng = np.random.default_rng(2)
        x, y, z = rng.normal(size=(3, 50))
        leafs = CI.xyz_to_cellid(x, y, z)
        for lv in (4, 8, 12):
            for cid in CI.parent(leafs, lv)[:10]:
                cell = Cell(int(cid))
                exact = cell_exact_area(cell)
                approx = cell_approx_area(cell)
                assert abs(approx - exact) / exact < 0.03
                avg = cell_average_area(lv)
                assert 0.4 < exact / avg < 2.2  # within metric bounds

    def test_union_area_consistency(self):
        rng = np.random.default_rng(3)
        x, y, z = rng.normal(size=(3, 20))
        ids = CU.normalize(
            [int(c) for c in CI.parent(CI.xyz_to_cellid(x, y, z), 6)]
        )
        exact = CU.exact_area(ids)
        avg = CU.average_based_area(ids)
        assert abs(avg - exact) / exact < 0.5
        assert CU.leaf_cells_covered(ids) == sum(
            1 << (2 * (30 - CU._level(c))) for c in ids
        )


class TestEarth:
    def test_round_trips(self):
        assert abs(EA.radians_to_meters(EA.meters_to_radians(123456.0)) - 123456.0) < 1e-6
        assert abs(EA.chord2_to_meters(EA.meters_to_chord2(5000.0)) - 5000.0) < 1e-6
        assert EA.RADIUS_METERS == 6371010.0  # S2Earth.cs:115

    def test_circumference(self):
        # half circumference = pi radians
        half = EA.radians_to_km(math.pi)
        assert abs(half - math.pi * 6371.010) < 1e-9

    def test_level_pick_from_ground_distance(self):
        from s2geometry_spark.constants import KMIN_WIDTH

        # a 1km feature needs roughly level 13-14 cells
        level = KMIN_WIDTH.get_level_for_min_value(EA.km_to_radians(1.0))
        assert 12 <= level <= 14


class TestRegionCombinators:
    """RegionUnion / RegionIntersection coverer contract
    (S2RegionUnion.cs / S2RegionIntersection.cs semantics)."""

    def _caps(self):
        import math

        from s2geometry_spark.kernels.geom import Cap, normalize

        c1 = Cap(normalize((1, 0.02, 0.02)), 0.004)
        c2 = Cap(normalize((1, -0.02, 0.01)), 0.004)
        return c1, c2

    def test_union_and_intersection_coverings(self):
        import numpy as np

        from s2geometry_spark.kernels import cellid as C
        from s2geometry_spark.kernels.coverer import (
            CovererOptions,
            RegionCoverer,
        )
        from s2geometry_spark.kernels.geom import (
            RegionIntersection,
            RegionUnion,
            normalize,
        )

        c1, c2 = self._caps()
        u = RegionUnion([c1, c2])
        x = RegionIntersection([c1, c2])
        rc = RegionCoverer(CovererOptions(max_cells=32))
        cov_u = rc.get_covering(u)
        cov_x = rc.get_covering(x)
        assert cov_u and cov_x
        rng = np.random.default_rng(0)

        def check(cov, region):
            cov_set = set(int(c) for c in cov)
            levels = sorted(
                {int(C.level(np.array([c], np.uint64))[0]) for c in cov}
            )
            for _ in range(1500):
                p = normalize(
                    tuple(np.asarray(c1.center) + 0.1 * rng.standard_normal(3))
                )
                if not region.contains_point(p):
                    continue
                leaf = C.xyz_to_cellid(
                    np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
                )
                assert any(
                    int(C.parent(leaf, lv)[0]) in cov_set for lv in levels
                )

        check(cov_u, u)
        check(cov_x, x)

    def test_membership_semantics(self):
        from s2geometry_spark.kernels.geom import (
            RegionIntersection,
            RegionUnion,
            normalize,
        )

        c1, c2 = self._caps()
        u = RegionUnion([c1, c2])
        x = RegionIntersection([c1, c2])
        mid = normalize(
            tuple((a + b) / 2 for a, b in zip(c1.center, c2.center))
        )
        assert u.contains_point(c1.center) and u.contains_point(c2.center)
        assert x.contains_point(mid) == (
            c1.contains_point(mid) and c2.contains_point(mid)
        )
