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


# S2EdgeCrossings.cs:16-50 error model (this port sets DBL_ERR = eps)
DBL_ERR = E.DBL_EPS
TT_ERR = DBL_ERR
_SQRT3 = 1.7320508075688772935274463415058
INTERSECTION_ERROR = 8 * DBL_ERR
_DBL_MIN_NORM = 2.2250738585072014e-308  # smallest normalized double


def _get_projection(x, a_norm, a_norm_len, a0, a1):
    """Signed distance of x to the plane of (a0, a1), scaled by
    |a_norm|, with a rigorous error bound
    (S2EdgeCrossings.GetProjection)."""
    x0 = (x[0] - a0[0], x[1] - a0[1], x[2] - a0[2])
    x1 = (x[0] - a1[0], x[1] - a1[1], x[2] - a1[2])
    x0_d2 = E.dot(x0, x0)
    x1_d2 = E.dot(x1, x1)
    if x0_d2 < x1_d2 or (x0_d2 == x1_d2 and x0 < x1):
        dist = math.sqrt(x0_d2)
        result = E.dot(x0, a_norm)
    else:
        dist = math.sqrt(x1_d2)
        result = E.dot(x1, a_norm)
    error = (
        ((3.5 + 2 * _SQRT3) * a_norm_len + 32 * _SQRT3 * DBL_ERR) * dist
        + 1.5 * abs(result)
    ) * TT_ERR
    return result, error


def _intersection_stable_sorted(a0, a1, b0, b1):
    """GetIntersectionStableSorted: requires |a1-a0| >= |b1-b0|.
    Returns the intersection point or None if the error bound exceeds
    kIntersectionError."""
    a_norm = E.cross(
        (a0[0] - a1[0], a0[1] - a1[1], a0[2] - a1[2]),
        (a0[0] + a1[0], a0[1] + a1[1], a0[2] + a1[2]),
    )
    a_norm_len = math.sqrt(E.dot(a_norm, a_norm))
    bd = (b1[0] - b0[0], b1[1] - b0[1], b1[2] - b0[2])
    b_len = math.sqrt(E.dot(bd, bd))
    b0_dist, b0_error = _get_projection(b0, a_norm, a_norm_len, a0, a1)
    b1_dist, b1_error = _get_projection(b1, a_norm, a_norm_len, a0, a1)
    if b0_dist < b1_dist:
        b0_dist, b1_dist = -b0_dist, -b1_dist
    dist_sum = b0_dist - b1_dist
    error_sum = b0_error + b1_error
    if dist_sum <= error_sum:
        return None  # error unbounded
    x = (
        b0_dist * b1[0] - b1_dist * b0[0],
        b0_dist * b1[1] - b1_dist * b0[1],
        b0_dist * b1[2] - b1_dist * b0[2],
    )
    error = (
        b_len * abs(b0_dist * b1_error - b1_dist * b0_error)
        / (dist_sum - error_sum)
        + 2 * TT_ERR * dist_sum
    )
    x_len2 = E.dot(x, x)
    if x_len2 < _DBL_MIN_NORM:
        return None
    x_len = math.sqrt(x_len2)
    if error > (INTERSECTION_ERROR - TT_ERR) * x_len:
        return None
    return (x[0] / x_len, x[1] / x_len, x[2] / x_len)


def _compare_edges(a0, a1, b0, b1) -> bool:
    """Reversal-invariant total order on edges
    (S2EdgeCrossings.CompareEdges): sort each edge's endpoints, then
    compare (min, max) lexicographically — both endpoints participate,
    so edges sharing their min vertex still order consistently in
    either argument order."""
    if a0 >= a1:
        a0, a1 = a1, a0
    if b0 >= b1:
        b0, b1 = b1, b0
    return a0 < b0 or (a0 == b0 and a1 < b1)


def _normalize_exact(xf):
    """Exact Fraction vector -> unit float64 tuple (scale into the
    normalizable range, then one double-precision Normalize — total
    directional error <= 2 * DBL_ERR)."""
    m = max(abs(v) for v in xf)
    if m == 0:
        return (0.0, 0.0, 0.0)
    return _normalize(tuple(float(v / m) for v in xf))


def edge_intersection_exact(a0, a1, b0, b1):
    """GetIntersectionExact: exact-arithmetic cross products, one final
    double-precision normalization (S2EdgeCrossings.cs:433-474)."""
    from fractions import Fraction

    fa0 = tuple(Fraction(v) for v in a0)
    fa1 = tuple(Fraction(v) for v in a1)
    fb0 = tuple(Fraction(v) for v in b0)
    fb1 = tuple(Fraction(v) for v in b1)
    a_norm_xf = E.cross(fa0, fa1)
    b_norm_xf = E.cross(fb0, fb1)
    x_xf = E.cross(a_norm_xf, b_norm_xf)
    if any(v != 0 for v in x_xf):
        x = _normalize_exact(x_xf)
        if E.sign(a0, a1, b1) < 0:
            x = (-x[0], -x[1], -x[2])
        return x
    # exactly-collinear edges ("crossing" by simulation of simplicity):
    # return the lexicographically smallest endpoint interior to the
    # other edge (the reference's heuristic)
    a_norm = _normalize_exact(a_norm_xf)
    b_norm = _normalize_exact(b_norm_xf)
    if a_norm == (0.0, 0.0, 0.0):
        a_norm = E.ortho(a0)
    if b_norm == (0.0, 0.0, 0.0):
        b_norm = E.ortho(b0)
    x = None
    if E.ordered_ccw(b0, a0, b1, b_norm) and (x is None or a0 < x):
        x = a0
    if E.ordered_ccw(b0, a1, b1, b_norm) and (x is None or a1 < x):
        x = a1
    if E.ordered_ccw(a0, b0, a1, a_norm) and (x is None or b0 < x):
        x = b0
    if E.ordered_ccw(a0, b1, a1, a_norm) and (x is None or b1 < x):
        x = b1
    if x is None:
        # no endpoint lies interior to the other edge: the collinear
        # configuration has no well-defined intersection point (the
        # reference DCHECKs here) — raise rather than hand a non-unit
        # sentinel to downstream ring construction
        raise ValueError(
            "edge_intersection_exact: exactly-collinear edges with no "
            "interior endpoint (degenerate crossing configuration)"
        )
    return x


def edge_intersection(a0, a1, b0, b1):
    """Intersection point of two crossing geodesic segments, within
    kIntersectionError of the true intersection (requires
    CrossingSign >= 0): GetIntersectionStable in double precision
    first, exact arithmetic whenever the stable error bound is blown
    (S2EdgeCrossings.GetIntersection's method ladder, minus the
    long-double tier this runtime lacks)."""
    a_len2 = sum((a1[i] - a0[i]) ** 2 for i in range(3))
    b_len2 = sum((b1[i] - b0[i]) ** 2 for i in range(3))
    if a_len2 < b_len2 or (a_len2 == b_len2 and _compare_edges(a0, a1, b0, b1)):
        result = _intersection_stable_sorted(b0, b1, a0, a1)
    else:
        result = _intersection_stable_sorted(a0, a1, b0, b1)
    if result is None:
        return edge_intersection_exact(a0, a1, b0, b1)
    # (the sorted stable method already returns the intersection, not
    # its antipode: it forces dist_sum = b0_dist - b1_dist >= 0)
    return result


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


def _longest_segment(points):
    """Endpoints of the arc's longest segment — its midpoint is a
    point strictly inside the arc, and the segment direction gives the
    arc's local left side (shared with kernels.winding)."""
    best, best_len = None, -1.0
    for a, b in zip(points, points[1:]):
        d = sum((a[i] - b[i]) ** 2 for i in range(3))
        if d > best_len:
            best_len = d
            best = (a, b)
    return best


def _arc_midpoint(points):
    # a point strictly inside the arc: midpoint of its longest segment
    a, b = _longest_segment(points)
    return _normalize((a[0] + b[0], a[1] + b[1], a[2] + b[2]))


def stitch_arcs(kept) -> list[np.ndarray]:
    """Stitch kept arcs (points, start_xid, end_xid) end-to-end into
    closed rings: follow end_xid -> next arc's start_xid, drop each
    arc's duplicated endpoint, then consecutive duplicates and the
    closure vertex.  Shared by loop_boolean step 4 and
    kernels.winding's boundary assembly (one walk, no drift)."""
    by_start: dict[object, list] = {}
    for arc in kept:
        by_start.setdefault(arc[1], []).append(arc)
    rings = []
    used: set[int] = set()
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
        # dedup consecutive duplicates (arc endpoints repeat), and the
        # closure vertex when the walk ends where it started
        dedup = [ring_pts[0]]
        for p in ring_pts[1:]:
            if p != dedup[-1]:
                dedup.append(p)
        if len(dedup) > 1 and dedup[-1] == dedup[0]:
            dedup.pop()
        if len(dedup) >= 3:
            rings.append(np.asarray(dedup))
    return rings


def _probe_point(verts):
    """Strictly-boundary-interior membership probe: midpoint of the
    longest edge (never a vertex, so shared-vertex tangencies cannot
    put the probe on the other loop's boundary)."""
    best, best_len = None, -1.0
    n = len(verts)
    for k in range(n):
        p, q = verts[k], verts[(k + 1) % n]
        d = sum((p[i] - q[i]) ** 2 for i in range(3))
        if d > best_len:
            best_len = d
            best = _normalize((p[0] + q[0], p[1] + q[1], p[2] + q[2]))
    return best


def loop_boolean(a: Loop, b: Loop, op: str) -> list[np.ndarray]:
    """Boolean combination of two loops -> list of CCW result rings.

    op in {"intersection", "union", "difference",
    "symmetric_difference"} (difference = a - b).

    Handles interior crossings and shared-VERTEX tangencies (the
    admin-boundary corner case): at a coincident vertex the robust
    wedge test (OrderedCCW on the interior sector, the VertexCrossing
    machinery of S2EdgeCrossings.cs:120-141) decides whether the
    boundaries actually cross there, and crossing vertices split the
    arc walk exactly like interior crossings.  Exactly-collinear
    overlapping EDGES still need the snap-rounding path (S2Builder) —
    out of scope; vertex-on-edge tangencies resolve deterministically
    via the symbolic-perturbation sign.
    """
    if op == "symmetric_difference":
        # (A - B) u (B - A); the two parts stitch independently (their
        # boundaries only meet at crossing points), so the ring lists
        # concatenate.
        return loop_boolean(a, b, "difference") + loop_boolean(
            b, a, "difference"
        )
    assert op in ("intersection", "union", "difference")
    averts = [tuple(map(float, v)) for v in a.verts]
    bverts = [tuple(map(float, v)) for v in b.verts]
    na, nb = len(averts), len(bverts)

    # 1. interior crossings
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

    # 1b. shared-vertex tangencies: split both walks at a coincident
    # vertex iff B's boundary passes through A's interior wedge there
    # (in-sector parity of B's incoming/outgoing directions).
    for i in range(na):
        for j in range(nb):
            if averts[i] != bverts[j]:
                continue
            v = averts[i]
            ap, an = averts[(i - 1) % na], averts[(i + 1) % na]
            bp, bn = bverts[(j - 1) % nb], bverts[(j + 1) % nb]

            def in_sector(p):
                # direction v->p inside A's interior wedge at v: the
                # CCW sweep from v->a_next to v->a_prev
                return E.ordered_ccw(an, p, ap, v)

            if in_sector(bp) != in_sector(bn):
                crossings.append((xid, i, j, v))
                # v is the START of edge i / edge j: _edge_param sorts
                # it before any interior crossing of the same edge
                a_by_edge.setdefault(i, []).append((v, xid))
                b_by_edge.setdefault(j, []).append((v, xid))
                xid += 1

    if not crossings:
        a_in_b = b.contains_point(_probe_point(averts))
        b_in_a = a.contains_point(_probe_point(bverts))
        if a_in_b and b_in_a:
            # each boundary lies inside the other's interior with no
            # crossings: A u B covers the sphere (the configuration
            # loop_contains_loop guards the same way).  Intersection
            # is the band bounded by BOTH boundaries (a mutually-
            # containing ring pair — rings_area recognizes it);
            # difference A - B is the complement of B (B's ring
            # reversed so its interior-on-the-left is the kept
            # region); union has no ring-set representation.
            if op == "intersection":
                return [np.asarray(averts), np.asarray(bverts)]
            if op == "union":
                raise ValueError(
                    "loop_boolean: union covers the full sphere "
                    "(area 4*pi, empty boundary) — no ring-set "
                    "representation"
                )
            return [np.asarray(list(reversed(bverts)))]
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
    return stitch_arcs(kept)


def rings_area(rings) -> float:
    """Total area of a loop_boolean / snapped_loop_boolean result.

    Result rings are all CCW-oriented but follow winding-PARITY
    semantics (see the annulus branch above): a ring nested inside
    another result ring is a hole, not a second shell.  The nesting
    depth of each ring is recovered by containment probes (rings of a
    boolean result never cross, so one strictly-interior boundary
    probe per ring decides), then shells (even depth) add and holes
    (odd depth) subtract — S2Polygon.GetArea semantics
    (S2Polygon.cs:471-487) over an implicitly-nested ring set.
    """
    from .loop import Loop
    from . import measures as M

    rings = list(rings)
    if not rings:
        return 0.0
    if len(rings) == 1:
        return M.loop_area(rings[0])
    loops = [Loop(np.asarray(r)) for r in rings]
    probes = [_probe_point([tuple(map(float, v)) for v in r])
              for r in rings]
    contains = [
        [j != i and loops[j].contains_point(probes[i])
         for j in range(len(rings))]
        for i in range(len(rings))
    ]
    # mutually-containing ring pair (each boundary inside the other's
    # interior): the no-crossing intersection of two loops whose union
    # covers the sphere — a band, not a nest.  Its area is
    # area(A) + area(B) - 4*pi; the depth-parity model below assumes a
    # containment FOREST and would subtract both rings.
    if len(rings) == 2 and contains[0][1] and contains[1][0]:
        return (
            M.loop_area(rings[0]) + M.loop_area(rings[1]) - M.M_4_PI
        )
    with_depth = []
    for i, r in enumerate(rings):
        depth = sum(contains[i])
        with_depth.append((depth, r))
    return M.polygon_area(with_depth)
