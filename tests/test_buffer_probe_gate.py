"""The buffer driver-gate's independent probe-containment columns
(round-4 advice): the oracle's verdicts come from the pure
within-distance predicate, the query's from parity over the emitted
rings.  These tests prove (a) the two agree for every gated case and
(b) the check has TEETH — geometry constructed at the wrong radius
fails it, which the recomputed n_ring/area columns could not detect
if the same kernel bug ran on both sides."""

import numpy as np
import pytest

from s2geometry_spark.functions import literal_oracle as LO
from s2geometry_spark.kernels import buffer as BUF


def _cases():
    by_case = {}
    for cid, mode, which, _i, x, y, z in LO.buffer_case_vertices():
        by_case.setdefault((cid, mode), {}).setdefault(which, []).append(
            (x, y, z)
        )
    for (cid, mode), groups in sorted(by_case.items()):
        yield cid, mode, [
            np.asarray(groups[w], dtype=np.float64) for w in sorted(groups)
        ]


def _rings(parts, mode, radius, shrink_radius):
    if mode == "grow":
        return BUF.buffer_loop_rings(parts[0], radius, check=False)
    if mode == "shrink":
        return BUF.buffer_polygon_rings(
            [parts[0]], -shrink_radius, check=False
        )
    if mode == "polyline":
        return BUF.buffer_polyline_rings(parts[0], radius, check=False)
    if mode == "point":
        return BUF.buffer_point_rings(parts[0][0], radius, check=False)
    return BUF.buffer_shapes_union_rings(
        [("loop", g) for g in parts], radius, check=False
    )


def test_probe_gate_agrees_for_every_gated_case():
    n_checked = 0
    for _cid, mode, parts in _cases():
        rings = _rings(parts, mode, LO.BUFFER_RADIUS, LO.BUFFER_SHRINK_RADIUS)
        P, expected = BUF.probe_gate(
            parts, mode, LO.BUFFER_RADIUS, LO.BUFFER_SHRINK_RADIUS
        )
        # the band filter must leave real discrimination power
        assert len(P) >= 150
        got = BUF._rings_contain(rings, P)
        assert np.array_equal(got, expected), (_cid, mode)
        n_checked += 1
    assert n_checked == 132


@pytest.mark.parametrize("mode", ["grow", "shrink", "polyline", "point",
                                  "union"])
def test_probe_gate_catches_wrong_radius(mode):
    """Rings built at 2x the radius (a plausible shared-kernel bug)
    must disagree with the predicate verdicts for most cases of the
    mode — i.e. a constructive bug cannot slip through the gate."""
    caught = total = 0
    for _cid, m, parts in _cases():
        if m != mode:
            continue
        total += 1
        rings = _rings(
            parts, mode, 2 * LO.BUFFER_RADIUS, 2 * LO.BUFFER_SHRINK_RADIUS
        )
        P, expected = BUF.probe_gate(
            parts, mode, LO.BUFFER_RADIUS, LO.BUFFER_SHRINK_RADIUS
        )
        got = BUF._rings_contain(rings, P)
        if not np.array_equal(got, expected):
            caught += 1
    assert total > 0
    assert caught >= 0.9 * total, (caught, total)


def test_probe_gate_is_deterministic():
    for _cid, mode, parts in list(_cases())[:6]:
        P1, e1 = BUF.probe_gate(
            parts, mode, LO.BUFFER_RADIUS, LO.BUFFER_SHRINK_RADIUS
        )
        P2, e2 = BUF.probe_gate(
            parts, mode, LO.BUFFER_RADIUS, LO.BUFFER_SHRINK_RADIUS
        )
        assert np.array_equal(P1, P2) and np.array_equal(e1, e2)
