"""Shape-measure dispatch goldens ported from
S2GeometryTests/S2ShapeMeasuresTests.cs (all 13 cases)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels import textformat as TF
from s2geometry_spark.kernels.shape_measures import (
    MultiShape,
    shape_approx_area,
    shape_area,
    shape_centroid,
    shape_length,
    shape_perimeter,
)

EMPTY_POLY = MultiShape(2, [])
FULL_POLY = MultiShape(2, [np.zeros((0, 3))])


def pts(s):
    return TF.parse_points(s)


def lax_polygon(*loops):
    return MultiShape(2, [pts(s) for s in loops])


class TestShapeMeasures:
    def test_length_wrong_dimension(self):
        assert shape_length(MultiShape(0, [pts("0:0")])) == 0.0
        assert shape_length(lax_polygon("0:0, 0:1, 1:0")) == 0.0

    def test_length_no_polylines(self):
        assert shape_length(MultiShape(1, [])) == 0.0

    def test_length_three_polylines_in_one_shape(self):
        p = pts("0:0, 1:0, 2:0, 3:0")
        shape = MultiShape(
            1, [np.stack([p[0], p[1]]), np.stack([p[0], p[2]]),
                np.stack([p[0], p[3]])]
        )
        assert shape_length(shape) == pytest.approx(
            math.radians(6), abs=1e-14
        )

    def test_perimeter_wrong_dimension(self):
        assert shape_perimeter(MultiShape(0, [pts("0:0")])) == 0.0
        assert shape_perimeter(
            MultiShape(1, [pts("0:0, 0:1, 1:0")])
        ) == 0.0

    def test_perimeter_empty_and_full_polygon(self):
        assert shape_perimeter(EMPTY_POLY) == 0.0
        assert shape_perimeter(FULL_POLY) == 0.0

    def test_perimeter_two_loop_polygon(self):
        # degenerate loops so every edge is 1 degree
        assert shape_perimeter(
            lax_polygon("0:0, 1:0", "0:1, 0:2, 0:3")
        ) == pytest.approx(math.radians(6), abs=1e-14)

    def test_area_wrong_dimension(self):
        assert shape_area(MultiShape(0, [pts("0:0")])) == 0.0
        assert shape_area(MultiShape(1, [pts("0:0, 0:1, 1:0")])) == 0.0

    def test_area_empty_polygon(self):
        assert shape_area(EMPTY_POLY) == 0.0

    def test_area_full_polygon(self):
        assert shape_area(FULL_POLY) == 4 * math.pi

    def test_area_two_tiny_shells(self):
        side = math.radians(1e-10)
        got = shape_area(
            lax_polygon(
                "0:0, 0:1e-10, 1e-10:1e-10, 1e-10:0",
                "0:0, 0:-1e-10, -1e-10:-1e-10, -1e-10:0",
            )
        )
        assert got == pytest.approx(2 * side * side, rel=1e-12)

    def test_area_tiny_shell_and_hole(self):
        side = math.radians(1e-10)
        got = shape_area(
            lax_polygon(
                "0:0, 0:2e-10, 2e-10:2e-10, 2e-10:0",
                "0.5e-10:0.5e-10, 1.5e-10:0.5e-10, "
                "1.5e-10:1.5e-10, 0.5e-10:1.5e-10",
            )
        )
        assert got == pytest.approx(3 * side * side, rel=1e-12)

    def test_approx_area_large_shell_and_hole(self):
        got = shape_approx_area(
            lax_polygon("0:0, 0:90, 90:0", "0:22.5, 90:0, 0:67.5")
        )
        assert got == pytest.approx(math.pi / 4, abs=1e-12)

    def test_centroid_points(self):
        shape = MultiShape(0, [pts("0:0"), pts("0:90")])
        assert shape_centroid(shape) == pytest.approx((1, 1, 0))

    def test_centroid_polyline(self):
        got = shape_centroid(MultiShape(1, [pts("0:0, 0:90")]))
        assert got == pytest.approx((1, 1, 0), abs=1e-14)

    def test_centroid_polygon(self):
        got = shape_centroid(lax_polygon("0:0, 0:90, 90:0"))
        assert got == pytest.approx(
            (math.pi / 4, math.pi / 4, math.pi / 4), abs=1e-14
        )


class TestCollectionMeasures:
    """S2ShapeIndexMeasures parity: collection sums, max-dimension
    centroid dispatch."""

    def _shapes(self):
        return [
            MultiShape(0, [pts("0:0"), pts("0:90")]),
            MultiShape(1, [pts("0:0, 0:90")]),
            lax_polygon("0:0, 0:90, 90:0"),
        ]

    def test_dimension_and_counts(self):
        from s2geometry_spark.kernels.shape_measures import (
            collection_dimension,
            collection_num_points,
        )

        assert collection_dimension([]) == -1
        shapes = self._shapes()
        assert collection_dimension(shapes) == 2
        assert collection_num_points(shapes) == 2

    def test_sums(self):
        from s2geometry_spark.kernels.shape_measures import (
            collection_area,
            collection_length,
            collection_perimeter,
        )

        shapes = self._shapes()
        assert collection_length(shapes) == pytest.approx(
            math.pi / 2, abs=1e-14
        )
        assert collection_perimeter(shapes) == pytest.approx(
            3 * math.pi / 2, abs=1e-13
        )
        assert collection_area(shapes) == pytest.approx(
            math.pi / 2, abs=1e-13
        )

    def test_centroid_max_dimension_only(self):
        from s2geometry_spark.kernels.shape_measures import (
            collection_centroid,
        )

        shapes = self._shapes()
        # only the polygon (dim 2) contributes
        assert collection_centroid(shapes) == pytest.approx(
            (math.pi / 4, math.pi / 4, math.pi / 4), abs=1e-14
        )
        assert collection_centroid([]) == (0.0, 0.0, 0.0)
