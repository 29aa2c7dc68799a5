"""The driver-side kernels (snap builder, winding arrangement, mixed
boolean) are quadratic BY DESIGN for dim-sized geometry; each must
fail fast with an actionable message above its edge budget instead of
silently burning an hour on a 10M-vertex coastline."""

from __future__ import annotations

import numpy as np
import pytest


def _big_ring(n: int) -> np.ndarray:
    th = 2 * np.pi * np.arange(n) / n
    r = 0.2
    ring = np.stack(
        [
            np.full(n, np.cos(r)),
            np.sin(r) * np.cos(th),
            np.sin(r) * np.sin(th),
        ],
        axis=1,
    )
    return ring / np.linalg.norm(ring, axis=1)[:, None]


def test_snap_builder_edge_budget():
    from s2geometry_spark.kernels.snap import Builder

    b = Builder(edge_budget=100)
    b.start_layer()
    b.add_loop(_big_ring(101))
    with pytest.raises(ValueError, match="budget"):
        b.build()


def test_snap_builder_budget_overridable():
    from s2geometry_spark.kernels.snap import Builder

    b = Builder(edge_budget=200)
    la = b.start_layer()
    b.add_loop(_big_ring(101))
    b.build()
    assert b.layer_loops(la)


def test_winding_operation_edge_budget():
    from s2geometry_spark.kernels.winding import winding_operation

    with pytest.raises(ValueError, match="budget"):
        winding_operation([_big_ring(200)], edge_budget=100)


def test_mixed_boolean_edge_budget():
    from s2geometry_spark.kernels import mixed_boolop as MB

    a = MB.parse_index("# # 0:0, 0:1, 1:1, 1:0")
    b = MB.parse_index("# # 0.5:0.5, 0.5:1.5, 1.5:1.5, 1.5:0.5")
    with pytest.raises(ValueError, match="budget"):
        MB.boolean_operation(a, b, "union", edge_budget=3)
    # same call passes with the default budget
    MB.boolean_operation(a, b, "union")
