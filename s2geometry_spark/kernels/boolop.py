"""Boolean operations on spherical loops (general position).

Re-expresses S2BooleanOperation's semantics (S2Builder/S2BooleanOperation.cs)
for loops in general position — no shared vertices, no tangencies, no
degeneracies — via the classic arc-walk construction:

1. find every crossing (edge_a x edge_b) and its intersection point
   (S2EdgeCrossings.GetIntersection simplified: the normalized cross
   product of the two edge great-circle normals, sign-picked to the
   wedge of both segments);
2. split each loop's boundary at its crossings into arcs;
3. keep arcs by op (midpoint membership test against the other loop):
     intersection: A-arcs inside B  + B-arcs inside A
     union:        A-arcs outside B + B-arcs outside A
     difference:   A-arcs outside B + B-arcs inside A (reversed)
4. stitch kept arcs end-to-end into closed CCW rings.

No-crossing cases reduce to containment/disjoint tests.  The reference
additionally snap-rounds and handles all degeneracies via S2Builder
(3000+ LoC) — out of scope here and unnecessary for general-position
dim-table regions.  Driver-side: regions are the small side
(SURVEY.md §2.7b).
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as E
from .loop import Loop


def _normalize(v):
    n = math.sqrt(E.dot(v, v))
    return (v[0] / n, v[1] / n, v[2] / n)


def edge_intersection(a0, a1, b0, b1):
    """Intersection point of two crossing geodesic segments (requires
    CrossingSign > 0).

    Stable interpolation form (the GetIntersectionStable idea of
    S2EdgeCrossings.GetIntersection): the zero-crossing of edge A
    against the plane of B, x = a0*dot(nb, a1) - a1*dot(nb, a0), which
    is far better conditioned than cross(na, nb) when the two great
    circles are nearly parallel.  nb uses the stable cross product."""
    from .measures import stable_cross_prod

    nb = stable_cross_prod(b0, b1)
    da0 = E.dot(nb, a0)
    da1 = E.dot(nb, a1)
    x = (
        a0[0] * da1 - a1[0] * da0,
        a0[1] * da1 - a1[1] * da0,
        a0[2] * da1 - a1[2] * da0,
    )
    x = _normalize(x)
    # orient into the wedge of both segments
    mid = (
        a0[0] + a1[0] + b0[0] + b1[0],
        a0[1] + a1[1] + b0[1] + b1[1],
        a0[2] + a1[2] + b0[2] + b1[2],
    )
    if E.dot(x, mid) < 0:
        x = (-x[0], -x[1], -x[2])
    return x


def _edge_param(a0, a1, p) -> float:
    """Monotone position of p along segment (a0, a1) for ordering
    crossings on one edge."""
    return E.dot(p, _normalize((a1[0] - a0[0], a1[1] - a0[1], a1[2] - a0[2])))


def _split_arcs(verts, crossings_by_edge):
    """Loop vertices + {edge_index: [(pt, xid), ...]} -> list of arcs;
    each arc is (points list, start_xid, end_xid) where xid is None at
    loop vertices that are not crossings (arcs always start/end at
    crossings once stitched; a loop with no crossings yields one closed
    arc)."""
    n = len(verts)
    # build the augmented boundary walk: vertex, crossings on edge, ...
    walk: list[tuple[tuple, object]] = []  # (point, xid or None)
    for i in range(n):
        a0 = tuple(verts[i])
        a1 = tuple(verts[(i + 1) % n])
        walk.append((a0, None))
        xs = crossings_by_edge.get(i, [])
        xs = sorted(xs, key=lambda t: _edge_param(a0, a1, t[0]))
        walk.extend((p, xid) for p, xid in xs)
    # rotate so the walk starts at a crossing (if any)
    start = next((k for k, (_, xid) in enumerate(walk) if xid is not None), None)
    if start is None:
        return [([p for p, _ in walk], None, None)]
    walk = walk[start:] + walk[:start]
    arcs = []
    cur = [walk[0][0]]
    cur_start = walk[0][1]
    for p, xid in walk[1:]:
        cur.append(p)
        if xid is not None:
            arcs.append((cur, cur_start, xid))
            cur = [p]
            cur_start = xid
    # close the final arc back to the first crossing
    cur.append(walk[0][0])
    arcs.append((cur, cur_start, walk[0][1]))
    return arcs


def _arc_midpoint(points):
    # a point strictly inside the arc: midpoint of its longest segment
    best, best_len = None, -1.0
    for a, b in zip(points, points[1:]):
        d = sum((a[i] - b[i]) ** 2 for i in range(3))
        if d > best_len:
            best_len = d
            best = _normalize(
                (a[0] + b[0], a[1] + b[1], a[2] + b[2])
            )
    return best


def loop_boolean(a: Loop, b: Loop, op: str) -> list[np.ndarray]:
    """Boolean combination of two loops -> list of CCW result rings.

    op in {"intersection", "union", "difference"} (difference = a - b).
    REQUIRES general position (use on synthetic/real-world dim regions;
    coincident geometry needs the snap-rounding path, not implemented).
    """
    assert op in ("intersection", "union", "difference")
    averts = [tuple(map(float, v)) for v in a.verts]
    bverts = [tuple(map(float, v)) for v in b.verts]
    na, nb = len(averts), len(bverts)

    # 1. crossings
    crossings = []  # (xid, a_edge, b_edge, point)
    a_by_edge: dict[int, list] = {}
    b_by_edge: dict[int, list] = {}
    xid = 0
    for i in range(na):
        for j in range(nb):
            a0, a1 = averts[i], averts[(i + 1) % na]
            b0, b1 = bverts[j], bverts[(j + 1) % nb]
            if E.crossing_sign(a0, a1, b0, b1) > 0:
                p = edge_intersection(a0, a1, b0, b1)
                crossings.append((xid, i, j, p))
                a_by_edge.setdefault(i, []).append((p, xid))
                b_by_edge.setdefault(j, []).append((p, xid))
                xid += 1

    if not crossings:
        a_in_b = b.contains_point(averts[0])
        b_in_a = a.contains_point(bverts[0])
        if op == "intersection":
            if a_in_b:
                return [np.asarray(averts)]
            if b_in_a:
                return [np.asarray(bverts)]
            return []
        if op == "union":
            if a_in_b:
                return [np.asarray(bverts)]
            if b_in_a:
                return [np.asarray(averts)]
            return [np.asarray(averts), np.asarray(bverts)]
        # difference
        if a_in_b:
            return []
        if b_in_a:
            # annulus: shell + hole (hole keeps its CCW orientation;
            # consumers treat multi-ring results by winding parity)
            return [np.asarray(averts), np.asarray(bverts)]
        return [np.asarray(averts)]

    # 2. arcs
    a_arcs = _split_arcs(averts, a_by_edge)
    b_arcs = _split_arcs(bverts, b_by_edge)

    # 3. keep arcs by op
    def keep(arcs, other: Loop, want_inside: bool, reverse: bool):
        out = []
        for points, s, e in arcs:
            mid = _arc_midpoint(points)
            if other.contains_point(mid) == want_inside:
                if reverse:
                    out.append((list(reversed(points)), e, s))
                else:
                    out.append((points, s, e))
        return out

    if op == "intersection":
        kept = keep(a_arcs, b, True, False) + keep(b_arcs, a, True, False)
    elif op == "union":
        kept = keep(a_arcs, b, False, False) + keep(b_arcs, a, False, False)
    else:  # difference: A outside B, plus B-arcs inside A reversed
        kept = keep(a_arcs, b, False, False) + keep(b_arcs, a, True, True)

    # 4. stitch arcs: start xid -> arc
    by_start: dict[object, list] = {}
    for arc in kept:
        by_start.setdefault(arc[1], []).append(arc)
    rings = []
    used = set()
    for arc in kept:
        if id(arc) in used:
            continue
        ring_pts: list = []
        cur = arc
        while True:
            used.add(id(cur))
            ring_pts.extend(cur[0][:-1])
            nxt_candidates = [
                c for c in by_start.get(cur[2], []) if id(c) not in used
            ]
            if not nxt_candidates:
                break
            cur = nxt_candidates[0]
        # dedup consecutive duplicates (arc endpoints repeat)
        dedup = [ring_pts[0]]
        for p in ring_pts[1:]:
            if p != dedup[-1]:
                dedup.append(p)
        if len(dedup) >= 3:
            rings.append(np.asarray(dedup))
    return rings
