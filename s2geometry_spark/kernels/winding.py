"""Winding-number operation: partition the sphere by the relative
winding number of a set of (possibly overlapping, possibly
self-intersecting) closed loops and emit the boundary of the region
selected by a winding rule (S2WindingOperation.cs semantics for
general-position input — the reference additionally snap-rounds via
S2Builder, which handles degenerate/coincident geometry).

Winding model (S2WindingOperation.cs:28-42): the winding number is
relative to a reference point R (we use the fixed S2 ORIGIN, whose
winding is the number of input loops containing it); w(P) - w(R) is
the signed count of crossings of the geodesic R->P with the directed
curves (+1 when the curve passes left-to-right across R->P as seen
from P's side, i.e. P ends on the curve's left).

This implements N-way boolean operations directly:
    union:                rule = w > 0
    intersection (of n):  rule = w >= n
    symmetric difference: rule = w odd
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as E
from .boolop import (
    _edge_param,
    _longest_segment,
    _normalize,
    _split_arcs,
    edge_intersection,
    stitch_arcs,
)

RULE_POSITIVE = "positive"
RULE_NONZERO = "nonzero"
RULE_ODD = "odd"


def _rule_fn(rule):
    if callable(rule):
        return rule
    if rule == RULE_POSITIVE:
        return lambda w: w > 0
    if rule == RULE_NONZERO:
        return lambda w: w != 0
    if rule == RULE_ODD:
        return lambda w: (w % 2) == 1
    if isinstance(rule, int):
        return lambda w: w >= rule
    raise ValueError(f"unknown winding rule {rule!r}")


def winding_number(
    loops: list, p, ref_point=None, ref_winding: int | None = None
) -> int:
    """Winding number of point p (off every curve).

    Winding on the sphere is relative (S2WindingOperation.cs:28-42):
    pass (ref_point, ref_winding) for a point whose winding is KNOWN —
    required for self-intersecting curves, where the default anchor
    below is undefined.  Without them, each loop anchors at the S2
    ORIGIN via the simple-loop convention: a CCW ring contributes +1
    over its enclosed region, a CW ring -1 over its enclosed region, 0
    outside (origin_inside for CCW rings, origin_inside - 1 for CW —
    the parity bit tests the LEFT region, which for a CW ring is the
    unbounded complement).  Only valid for SIMPLE loops."""
    from .edges import ORIGIN
    from .measures import loop_signed_area

    w = 0
    if ref_point is not None:
        assert ref_winding is not None
        r = tuple(map(float, ref_point))
        w = ref_winding
    else:
        r = ORIGIN
        for verts in loops:
            oi = int(E.loop_origin_inside(np.asarray(verts)))
            ccw = loop_signed_area(np.asarray(verts, dtype=np.float64)) > 0
            w += oi if ccw else oi - 1
    for verts in loops:
        vt = [tuple(map(float, v)) for v in np.asarray(verts)]
        n = len(vt)
        for k in range(n):
            c, d = vt[k], vt[(k + 1) % n]
            if E.crossing_sign(r, tuple(p), c, d) > 0:
                # P ends on the left of (c, d) -> +1, right -> -1
                w += E.sign(c, d, tuple(p))
    return w


def winding_operation(
    loops: list, rule="positive", ref_point=None, ref_winding=None,
    edge_budget: int = 8_000,
) -> list[np.ndarray]:
    """Boundary rings of the region {P : rule(w(P))} for general-
    position loops (every crossing interior, no coincident geometry).
    Rings are oriented with the selected region on their left.
    Self-intersecting input curves REQUIRE (ref_point, ref_winding) —
    see winding_number."""
    loop_list = [
        [tuple(map(float, v)) for v in np.asarray(verts)] for verts in loops
    ]
    total_edges = sum(len(vt) for vt in loop_list)
    if total_edges > edge_budget:
        raise ValueError(
            f"winding_operation: {total_edges} curve edges exceed the "
            f"driver-side budget of {edge_budget} (crossing detection "
            "is O(edges^2) by design for dim-sized arrangements; run "
            "the operation per group inside the distributed kernels, "
            "or raise edge_budget explicitly if you accept the cost)"
        )
    rule_f = _rule_fn(rule)

    # 1. all crossings: between loops and within each loop
    xid = 0
    by_edge: list[dict[int, list]] = [dict() for _ in loop_list]
    flat_edges = []  # (loop_idx, edge_idx, c, d)
    for li, vt in enumerate(loop_list):
        n = len(vt)
        for k in range(n):
            flat_edges.append((li, k, vt[k], vt[(k + 1) % n]))
    for i in range(len(flat_edges)):
        li, ki, c1, d1 = flat_edges[i]
        for j in range(i + 1, len(flat_edges)):
            lj, kj, c2, d2 = flat_edges[j]
            if li == lj:
                n = len(loop_list[li])
                if kj == (ki + 1) % n or ki == (kj + 1) % n:
                    continue  # adjacent edges share a vertex
            if E.crossing_sign(c1, d1, c2, d2) > 0:
                p = edge_intersection(c1, d1, c2, d2)
                by_edge[li].setdefault(ki, []).append((p, xid))
                by_edge[lj].setdefault(kj, []).append((p, xid))
                xid += 1

    # 2. split into arcs; 3. keep boundary arcs by the rule
    kept = []
    for li, vt in enumerate(loop_list):
        for points, s, e in _split_arcs(vt, by_edge[li]):
            # probe at the midpoint of the arc's longest segment,
            # displaced slightly off the curve to each side (left of
            # the local edge direction) — one segment scan gives both
            a, b = _longest_segment(points)
            mid = _normalize((a[0] + b[0], a[1] + b[1], a[2] + b[2]))
            u = _normalize(E.cross(a, b))  # left side of the arc
            eps = 1e-9
            m_left = _normalize(
                (mid[0] + eps * u[0], mid[1] + eps * u[1], mid[2] + eps * u[2])
            )
            w_left = winding_number(
                loop_list, m_left, ref_point, ref_winding
            )
            w_right = w_left - 1
            in_l, in_r = rule_f(w_left), rule_f(w_right)
            if in_l and not in_r:
                kept.append((points, s, e))
            elif in_r and not in_l:
                kept.append((list(reversed(points)), e, s))

    if not kept:
        return []
    if any(s is None for _, s, _ in kept):
        # whole uncrossed loops kept intact (their walk has no closure
        # point, so keep every vertex; drop a duplicated endpoint only)
        rings = []
        for pts, s, _ in kept:
            if s is None:
                if len(pts) > 1 and pts[0] == pts[-1]:
                    pts = pts[:-1]
                rings.append(np.asarray(pts))
        kept = [a for a in kept if a[1] is not None]
        return rings + stitch_arcs(kept)
    return stitch_arcs(kept)


def polygon_contains(a_rings: list, b_rings: list) -> bool:
    """Polygon containment for general-position multi-ring polygons
    (each a union of CCW shells and CCW-hole rings with winding 0/1):
    A contains B iff B \\ A is empty, evaluated as the winding
    operation over B's rings plus A's rings reversed (w = wB - wA; the
    positive region is exactly B minus A) producing no boundary."""
    loops = [np.asarray(r) for r in b_rings] + [
        np.asarray(r)[::-1] for r in a_rings
    ]
    return not winding_operation(loops, RULE_POSITIVE)


def polygon_intersects(a_rings: list, b_rings: list) -> bool:
    """Interior intersection for general-position polygons:
    w = wA + wB >= 2 is exactly the common interior."""
    loops = [np.asarray(r) for r in a_rings] + [
        np.asarray(r) for r in b_rings
    ]
    if winding_operation(loops, 2):
        return True
    # boundary-free containment of one inside the other still means a
    # non-empty ring set for rule >= 2 unless they are disjoint; an
    # empty result with one polygon's probe inside the other covers the
    # identical-region edge case
    probe = _probe_of(b_rings)
    if probe is not None and _polygon_contains_point(a_rings, probe):
        return True
    probe = _probe_of(a_rings)
    return probe is not None and _polygon_contains_point(b_rings, probe)


def _probe_of(rings):
    from .boolop import _probe_point

    if not rings:
        return None
    return _probe_point([tuple(map(float, v)) for v in np.asarray(rings[0])])


def _polygon_contains_point(rings, p) -> bool:
    # signed-coverage winding (CW holes subtract), consistent with the
    # 0/1-winding polygon model the relations above assume
    return winding_number(list(rings), p) >= 1
