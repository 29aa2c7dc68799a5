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
