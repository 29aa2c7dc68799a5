"""Shape-nesting goldens ported from
S2GeometryTests/S2ShapeNestingQueryTests.cs (file:line cited)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from s2geometry_spark.kernels.nesting import shape_nesting
from s2geometry_spark.kernels.textformat import ll_to_point

CENTER = (0.0, 0.0)


def ring_shape(n_edges: int, specs) -> list[np.ndarray]:
    """specs: (center_latlng_deg, radius_deg, reverse) — CCW ring of
    n_edges vertices in lat/lng offset space
    (S2ShapeNestingQueryTests.RingShape)."""
    out = []
    for (clat, clng), radius, reverse in specs:
        radius = abs(radius)
        assert clat + radius < 90 and clat - radius > -90
        step = 2 * math.pi / n_edges
        verts = [
            ll_to_point(
                clat + radius * math.sin(i * step),
                clng + radius * math.cos(i * step),
            )
            for i in range(n_edges)
        ]
        if reverse:
            verts.reverse()
        out.append(np.asarray(verts))
    return out


def arc_shape(n_verts: int, specs) -> list[np.ndarray]:
    """specs: (center, radius_deg, thickness, start_deg, end_deg,
    offset, reverse) — a C-shaped thick arc with butt caps
    (S2ShapeNestingQueryTests.ArcShape)."""
    out = []
    for (clat, clng), radius, thick, start, end, offset, reverse in specs:
        assert start < end and radius > 0 and thick > 0
        assert n_verts % 2 == 0
        r_in, r_out = radius - thick, radius + thick
        step = math.radians(end - start) / (n_verts // 2 - 1)
        verts: list = [None] * n_verts
        for i in range(n_verts // 2):
            ang = math.radians(start) + i * step
            sa, ca = math.sin(ang), math.cos(ang)
            verts[i] = ll_to_point(clat + r_out * sa, clng + r_out * ca)
            verts[n_verts - i - 1] = ll_to_point(
                clat + r_in * sa, clng + r_in * ca
            )
        if offset:
            k = offset % n_verts
            verts = verts[k:] + verts[:k]
        if reverse:
            verts.reverse()
        out.append(np.asarray(verts))
    return out


class TestShapeNesting:
    def test_one_chain_always_shell(self):
        # S2ShapeNestingQueryTests.cs:141-156
        rel = shape_nesting(ring_shape(100, [(CENTER, 1.0, False)]))
        assert len(rel) == 1
        assert rel[0].is_shell() and not rel[0].is_hole()
        assert rel[0].parent < 0 and rel[0].holes == []

    def test_two_chains_form_pair(self):
        # S2ShapeNestingQueryTests.cs:158-236 (donut, both orders)
        rel = shape_nesting(
            ring_shape(100, [(CENTER, 1.0, False), (CENTER, 0.5, True)])
        )
        assert rel[0].is_shell() and rel[1].is_hole()
        assert rel[0].parent < 0 and rel[0].holes == [1]
        assert rel[1].parent == 0 and rel[1].holes == []

        rel = shape_nesting(
            ring_shape(100, [(CENTER, 0.5, True), (CENTER, 1.0, False)])
        )
        assert rel[0].is_shell() and rel[1].is_hole()
        assert rel[0].holes == [1]
        assert rel[1].parent == 0

        # reversed orientations: shells facing away -> two shells
        rel = shape_nesting(
            ring_shape(100, [(CENTER, 1.0, True), (CENTER, 0.5, False)])
        )
        for r in rel:
            assert r.is_shell() and r.parent < 0 and r.holes == []

    def test_can_set_datum_shell(self):
        # S2ShapeNestingQueryTests.cs:238-264
        rel = shape_nesting(
            ring_shape(100, [(CENTER, 1.0, False), (CENTER, 0.5, True)]),
            datum=1,
        )
        assert rel[1].is_shell() and rel[0].is_hole()

    def test_shell_can_have_multiple_holes(self):
        # S2ShapeNestingQueryTests.cs:266-303 (button with 4 holes)
        rel = shape_nesting(
            ring_shape(
                16,
                [
                    ((0.5, 0.5), 2.0, False),
                    ((1.0, 0.5), 0.25, True),
                    ((0.0, 0.5), 0.25, True),
                    ((0.5, 1.0), 0.25, True),
                    ((0.5, 0.0), 0.25, True),
                ],
            )
        )
        assert len(rel) == 5
        assert rel[0].is_shell() and rel[0].holes == [1, 2, 3, 4]
        for i in range(1, 5):
            assert rel[i].is_hole()
            assert rel[i].parent == 0 and rel[i].holes == []

    @pytest.mark.parametrize("offset0", [0, 5, 13, 27])
    @pytest.mark.parametrize("offset1", [0, 7, 19, 31])
    def test_exact_path_is_irrelevant(self, offset0, offset1):
        # S2ShapeNestingQueryTests.cs:305-358 (sampled offsets; the
        # reference sweeps all 32x32)
        rel = shape_nesting(
            arc_shape(
                32,
                [
                    (CENTER, 0.3, 0.15, -240.0, 60.0, offset0, False),
                    (CENTER, 0.3, 0.05, -230.0, 50.0, offset1, True),
                    (CENTER, 1.0, 0.15, -85.0, 265.0, offset1, False),
                    (CENTER, 1.0, 0.05, -80.0, 260.0, offset1, True),
                ],
            )
        )
        assert len(rel) == 4
        assert rel[0].is_shell()
        assert rel[1].is_hole() and rel[1].parent == 0
        assert rel[2].is_shell()
        assert rel[3].is_hole() and rel[3].parent == 2

    @pytest.mark.parametrize(
        "depth,first_chain",
        [(31, 0), (32, 0), (31, 30), (32, 31), (31, 31 // 13),
         (32, 32 // 13), (31, 31 // 3), (32, 32 // 3)],
    )
    def test_nested_chains_partition_correctly(self, depth, first_chain):
        # S2ShapeNestingQueryTests.cs:361-451
        specs = [
            (CENTER, 2.0 / (first_chain + 1), first_chain % 2 == 1)
        ]
        for i in range(depth):
            if i == first_chain:
                continue
            specs.append((CENTER, 2.0 / (i + 1), i % 2 == 1))
        rel = shape_nesting(ring_shape(16, specs))
        assert len(rel) == depth

        if first_chain == 0:
            assert rel[0].is_shell() and rel[0].holes == [1]
            for chain in range(1, depth):
                if chain % 2 == 1:
                    assert rel[chain].is_hole()
                    assert rel[chain].parent == chain - 1
                else:
                    assert rel[chain].is_shell()
                    assert rel[chain].parent == -1

        num_shells = num_holes = 0
        for chain in range(depth):
            if rel[chain].is_shell():
                num_shells += 1
                for child in rel[chain].holes:
                    assert rel[child].parent == chain
            if rel[chain].is_hole():
                num_holes += 1
                assert chain in rel[rel[chain].parent].holes
        assert num_holes + num_shells == depth
