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

import numpy as np


def _cost_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    diff = a[:, None, :] - b[None, :, :]
    return (diff * diff).sum(axis=2)


def alignment_cost(a: np.ndarray, b: np.ndarray) -> float:
    """GetExactVertexAlignmentCost: two-row rolling DP (vectorized
    column-scan per row; min-prefix forms keep it O(n*m))."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert len(a) and len(b)
    cost_mat = _cost_matrix(a, b)
    prev = np.empty(len(b))
    # row 0: cumulative (only left moves possible)
    prev[:] = np.cumsum(cost_mat[0])
    for i in range(1, len(a)):
        cur = np.empty(len(b))
        cur[0] = prev[0] + cost_mat[i, 0]
        for j in range(1, len(b)):
            cur[j] = cost_mat[i, j] + min(prev[j - 1], prev[j], cur[j - 1])
        prev = cur
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
        table[i, 0] = table[i - 1, 0] + cost_mat[i, 0]
        for j in range(1, m):
            table[i, j] = cost_mat[i, j] + min(
                table[i - 1, j - 1], table[i - 1, j], table[i, j - 1]
            )
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
