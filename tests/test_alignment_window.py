"""Windowed / approximate DTW alignment goldens, ported from
S2GeometryTests/S2PolylineAlignmentTests.cs (file:line cited)."""

from __future__ import annotations

import time

import numpy as np
import pytest

from s2geometry_spark.kernels import alignment as AL


class TestWindow:
    def test_from_strides(self):
        # S2PolylineAlignmentTests.cs:10-23
        w = AL.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
        assert w.strides[0] == (0, 3)
        assert w.strides[4] == (4, 6)

    def test_from_warp_path(self):
        # S2PolylineAlignmentTests.cs:26-49
        path = [
            (0, 0), (1, 0), (1, 1), (2, 1), (3, 1),
            (3, 2), (3, 3), (4, 4), (4, 5),
        ]
        w = AL.Window.from_warp_path(path)
        assert w.strides == [(0, 1), (0, 2), (1, 2), (1, 4), (4, 6)]

    def test_upsample_factor_of_two(self):
        # S2PolylineAlignmentTests.cs:65-89
        w = AL.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
        up = w.upsample(10, 12)
        assert up.strides == [
            (0, 6), (0, 6), (2, 8), (2, 8), (4, 8),
            (4, 8), (6, 12), (6, 12), (8, 12), (8, 12),
        ]

    def test_upsample_x_by_three(self):
        # S2PolylineAlignmentTests.cs:92-110
        w = AL.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
        up = w.upsample(5, 18)
        assert up.strides == [
            (0, 9), (3, 12), (6, 12), (9, 18), (12, 18),
        ]

    def test_upsample_y_by_three(self):
        # S2PolylineAlignmentTests.cs:113-142
        w = AL.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
        up = w.upsample(15, 6)
        assert up.strides == (
            [(0, 3)] * 3 + [(1, 4)] * 3 + [(2, 4)] * 3
            + [(3, 6)] * 3 + [(4, 6)] * 3
        )

    def test_upsample_non_integer(self):
        # S2PolylineAlignmentTests.cs:145-179
        w = AL.Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
        up = w.upsample(19, 23)
        assert up.strides == (
            [(0, 12)] * 4 + [(4, 15)] * 4 + [(8, 15)] * 3
            + [(12, 23)] * 4 + [(15, 23)] * 4
        )

    def test_dilate_radius_zero(self):
        # S2PolylineAlignmentTests.cs:182-201
        w = AL.Window([(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)])
        assert w.dilate(0).strides == w.strides

    def test_dilate_radius_one(self):
        # S2PolylineAlignmentTests.cs:204-223
        w = AL.Window([(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)])
        assert w.dilate(1).strides == [
            (0, 4), (0, 4), (1, 5), (1, 6), (1, 6),
        ]

    def test_dilate_radius_two(self):
        # S2PolylineAlignmentTests.cs:226-245
        w = AL.Window([(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)])
        assert w.dilate(2).strides == [
            (0, 5), (0, 6), (0, 6), (0, 6), (0, 6),
        ]

    def test_dilate_very_large_radius(self):
        # S2PolylineAlignmentTests.cs:248-263
        w = AL.Window([(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)])
        assert w.dilate(100).strides == [(0, 6)] * 5


def wiggle_line(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    th = np.cumsum(0.001 + 0.0005 * rng.standard_normal(n))
    pts = np.stack(
        [np.cos(th), np.sin(th), 0.1 * np.sin(3 * th)], axis=1
    )
    return pts / np.linalg.norm(pts, axis=1)[:, None]


class TestApproxAlignment:
    def test_small_inputs_fall_back_to_exact(self):
        # size switchover (S2PolylineAlignment.cs:143-156)
        a, b = wiggle_line(20, 1), wiggle_line(25, 2)
        assert AL.approx_alignment(a, b) == AL.alignment(a, b)

    def test_full_window_equals_exact(self):
        """A full window makes windowed DTW identical to the exact
        DP (the reference reuses one DynamicTimewarp for both)."""
        a, b = wiggle_line(40, 3), wiggle_line(37, 4)
        w = AL.Window([(0, len(b))] * len(a))
        cw, pw = AL.windowed_alignment(a, b, w)
        ce, pe = AL.alignment(a, b)
        assert cw == pytest.approx(ce, rel=1e-12)
        assert pw == pe

    @pytest.mark.parametrize("seed", [5, 6, 7])
    def test_approx_cost_close_to_exact(self, seed):
        """FastDTW cost is an upper bound, close to exact for smooth
        curves (the Salvador-Chan bound)."""
        a = wiggle_line(300, seed)
        b = wiggle_line(280, seed + 100)
        ce, _ = AL.alignment(a, b)
        ca, _ = AL.approx_alignment(a, b)
        # >= holds mathematically; the dense and windowed DPs use
        # min-prefix rows whose cumsums start at different columns, so
        # allow fp-association noise of a few ulps per row length
        assert ca >= ce * (1 - 1e-10)
        assert ca <= 1.1 * ce

    def test_path_endpoints_and_monotone(self):
        a, b = wiggle_line(400, 8), wiggle_line(380, 9)
        _, path = AL.approx_alignment(a, b)
        assert path[0] == (0, 0)
        assert path[-1] == (len(a) - 1, len(b) - 1)
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            assert (i1 - i0, j1 - j0) in ((1, 0), (0, 1), (1, 1))

    def test_long_polylines_linear_time(self):
        """4096x4096: approx is O(n*radius) — orders faster than the
        exact O(n^2) DP (the reference's headline use case)."""
        a, b = wiggle_line(4096, 10), wiggle_line(4096, 11)
        t0 = time.perf_counter()
        cost, path = AL.approx_alignment(a, b)
        elapsed = time.perf_counter() - t0
        assert cost > 0 and len(path) >= 4096
        assert elapsed < 5.0
