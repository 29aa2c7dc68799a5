"""Dynamic-timewarp polyline alignment (S2PolylineAlignment.cs).

Cost = sum of squared chordal distances |a_i - b_j|^2 along a monotone
warp path; table recurrence
    table[i][j] = cost(i,j) + min(table[i-1][j-1], table[i][j-1],
                                  table[i-1][j])
(S2PolylineAlignment.cs:29-51).  Vectorized per DP row in numpy —
O(n*m) work per pair, run inside grouped Arrow kernels for polyline
collections (the distributed axis is the number of pairs).
"""

from __future__ import annotations

import math

import numpy as np


def _cost_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    diff = a[:, None, :] - b[None, :, :]
    return (diff * diff).sum(axis=2)


def _dp_row(cost_row: np.ndarray, prev_row: np.ndarray) -> np.ndarray:
    """One DTW row without a Python inner loop.

    The recurrence cur[j] = c[j] + min(seed[j], cur[j-1]) with
    seed[j] = min(prev[j-1], prev[j]) (prev[-1] = inf, so seed[0]
    degenerates to prev[0]) unrolls to

        cur[j] = min over k <= j of (seed[k] + c[k] + ... + c[j])
               = S[j] + min-prefix of (seed[k] - S[k-1]),

    with S the cost prefix sum — one cumsum plus one
    minimum.accumulate."""
    seed = np.minimum(
        np.concatenate(([np.inf], prev_row[:-1])), prev_row
    )
    s = np.cumsum(cost_row)
    return s + np.minimum.accumulate(seed - (s - cost_row))


def alignment_cost(a: np.ndarray, b: np.ndarray) -> float:
    """GetExactVertexAlignmentCost: two-row rolling DP (vectorized
    column-scan per row; min-prefix forms keep it O(n*m))."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert len(a) and len(b)
    cost_mat = _cost_matrix(a, b)
    # row 0: cumulative (only left moves possible)
    prev = np.cumsum(cost_mat[0])
    for i in range(1, len(a)):
        prev = _dp_row(cost_mat[i], prev)
    return float(prev[-1])


def alignment(a: np.ndarray, b: np.ndarray) -> tuple[float, list[tuple[int, int]]]:
    """GetExactVertexAlignment: cost + warp path [(i, j) ...]."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    cost_mat = _cost_matrix(a, b)
    table = np.full((n, m), np.inf)
    table[0] = np.cumsum(cost_mat[0])
    for i in range(1, n):
        table[i] = _dp_row(cost_mat[i], table[i - 1])
    # backtrack (prefer diagonal, then up, then left — deterministic)
    path = [(n - 1, m - 1)]
    i, j = n - 1, m - 1
    while (i, j) != (0, 0):
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            options = (
                (table[i - 1, j - 1], (i - 1, j - 1)),
                (table[i - 1, j], (i - 1, j)),
                (table[i, j - 1], (i, j - 1)),
            )
            _, (i, j) = min(options, key=lambda t: t[0])
        path.append((i, j))
    path.reverse()
    return float(table[-1, -1]), path


# ---------------------------------------------------------------------------
# Windowed / approximate alignment (FastDTW)
# ---------------------------------------------------------------------------

# Switchover constants from the reference, determined there by
# benchmark (S2PolylineAlignment.cs:140-163)
SIZE_SWITCHOVER = 32
DENSITY_SWITCHOVER = 0.85


class Window:
    """Sparse DP search window: one contiguous [start, end) column
    stride per row, monotone in both endpoints
    (S2PolylineAlignment.cs:585-743)."""

    def __init__(self, strides: list[tuple[int, int]]):
        assert strides and strides[0][0] == 0
        self.strides = strides
        self.rows = len(strides)
        self.cols = strides[-1][1]

    @classmethod
    def from_warp_path(cls, path: list[tuple[int, int]]) -> "Window":
        # (S2PolylineAlignment.cs:599-627)
        assert path and path[0] == (0, 0)
        rows = path[-1][0] + 1
        strides: list = [None] * rows
        prev_row = 0
        stride_start = 0
        stride_stop = 0
        for i, j in path:
            if i > prev_row:
                strides[prev_row] = (stride_start, stride_stop)
                stride_start = j
                prev_row = i
            stride_stop = j + 1
        strides[rows - 1] = (stride_start, stride_stop)
        return cls(strides)

    def upsample(self, new_rows: int, new_cols: int) -> "Window":
        # (S2PolylineAlignment.cs:644-659)
        assert new_rows >= self.rows and new_cols >= self.cols
        row_scale = new_rows / self.rows
        col_scale = new_cols / self.cols
        return Window(
            [
                (
                    int(col_scale * s + 0.5),
                    int(col_scale * e + 0.5),
                )
                for row in range(new_rows)
                for s, e in (self.strides[int((row + 0.5) / row_scale)],)
            ]
        )

    def dilate(self, radius: int) -> "Window":
        # square structuring element (S2PolylineAlignment.cs:665-687)
        assert radius >= 0
        out = []
        for row in range(self.rows):
            prev_row = max(0, row - radius)
            next_row = min(row + radius, self.rows - 1)
            out.append(
                (
                    max(0, self.strides[prev_row][0] - radius),
                    min(self.strides[next_row][1] + radius, self.cols),
                )
            )
        return Window(out)


def windowed_alignment(
    a: np.ndarray, b: np.ndarray, window: Window
) -> tuple[float, list[tuple[int, int]]]:
    """DTW restricted to the window's cells
    (S2PolylineAlignment.DynamicTimewarp with a sparse window):
    O(window cells) time and space; per-row storage covers only the
    stride."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    assert window.rows == n and window.cols == m
    INF = math.inf
    vals: list[np.ndarray] = [None] * n  # row -> stride values
    starts = [s for s, _ in window.strides]

    def tc(i: int, j: int) -> float:
        # bounds-checked table cost (S2PolylineAlignment.cs:294-308)
        if i < 0 and j < 0:
            return 0.0
        if i < 0 or j < 0:
            return INF
        s, e = window.strides[i]
        if not (s <= j < e):
            return INF
        return float(vals[i][j - s])

    for i in range(n):
        s, e = window.strides[i]
        diff = a[i][None, :] - b[s:e]
        cost_row = (diff * diff).sum(axis=1)
        # previous row's values aligned to this stride (INF outside),
        # then the same min-prefix row form as the dense DP
        if i == 0:
            seed = np.full(e - s, INF)
            seed[0] = 0.0  # tc(-1, -1) == 0: the DP origin
        else:
            ps, pe = window.strides[i - 1]
            up = np.full(e - s + 1, INF)  # tc(i-1, j-1..j) for j in [s,e)
            lo = max(s - 1, ps)
            hi = min(e, pe)
            if lo < hi:
                up[lo - (s - 1):hi - (s - 1)] = vals[i - 1][
                    lo - ps:hi - ps
                ]
            seed = np.minimum(up[:-1], up[1:])
        csum = np.cumsum(cost_row)
        vals[i] = csum + np.minimum.accumulate(
            seed - (csum - cost_row)
        )
    # backtrack, diagonal-preferred (same tie order as the reference)
    path = []
    i, j = n - 1, m - 1
    while i >= 0 and j >= 0:
        path.append((i, j))
        d = tc(i - 1, j - 1)
        u = tc(i - 1, j)
        left = tc(i, j - 1)
        if d <= u and d <= left:
            i -= 1
            j -= 1
        elif u <= left:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return float(vals[n - 1][m - 1 - starts[n - 1]]), path


def _half_resolution(x: np.ndarray) -> np.ndarray:
    # even-index vertices (S2PolylineAlignment.cs:317-326)
    return x[::2]


def approx_alignment(
    a: np.ndarray, b: np.ndarray, radius: int | None = None
) -> tuple[float, list[tuple[int, int]]]:
    """GetApproxVertexAlignment (S2PolylineAlignment.cs:124-182), the
    FastDTW scheme (Salvador & Chan): recursively align half-resolution
    polylines, project the coarse warp path up, dilate by `radius`,
    and solve the windowed DP — O(max(n, m) * radius) instead of
    O(n * m).  Default radius = max(n, m)**0.25."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if radius is None:
        radius = int(max(n, m) ** 0.25)
    assert radius >= 0
    if n - radius < SIZE_SWITCHOVER or m - radius < SIZE_SWITCHOVER:
        return alignment(a, b)
    if max(n, m) * (2 * radius + 1) > n * m * DENSITY_SWITCHOVER:
        return alignment(a, b)
    _, proj_path = approx_alignment(
        _half_resolution(a), _half_resolution(b), radius
    )
    w = Window.from_warp_path(proj_path).upsample(n, m).dilate(radius)
    return windowed_alignment(a, b, w)
