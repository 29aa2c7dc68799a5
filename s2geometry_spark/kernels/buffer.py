"""Buffered geometry: expand a loop's boundary outward by a radius and
EMIT the buffered ring (S2BufferOperation.cs semantics at a stated
tolerance — the covering-based within-distance join in
operators/spatial_join.py answers "is x within r" without geometry;
this kernel produces the geometry itself).

Construction (offset-curve sampling + trim):
1. each edge contributes its offset small-circle arc at distance r on
   the exterior side: q(t) = cos(r)*p(t) - sin(r)*u, u = unit edge
   normal (interior is left of CCW edges, so -u points outward);
2. each vertex contributes the round join: the circle of radius r
   around the vertex, swept between the adjacent edge normals;
3. candidate points whose true distance to the boundary is < r - tol
   are trimmed (they dip into the r-neighborhood of ANOTHER part of
   the boundary — the concave-join case the reference resolves with
   winding numbers);
4. survivors are ordered by their projection's position along the
   boundary (edge index + in-edge parameter), producing one CCW ring.

CONVEX loops take the parameter-ordered fast path above.  CONCAVE
loops route through the winding-arrangement walk
(S2BufferOperation.cs:28-57 / Chen & McMains, "Polygon Offsetting by
Computing Winding Numbers"): the offset curve is kept CLOSED by
splicing each concave vertex into the curve itself
(S2BufferOperation.BufferEdgeAndVertex, :582-613) — radial edges
connect the two adjacent edge offsets through the vertex — and the
buffered region is extracted as the winding-positive region of the
(self-intersecting) curve via kernels.winding.  ``check=True``
(default) Monte-Carlo-validates either path against the
within-distance predicate.
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as E
from .polyline import edge_distance2_batch


def _unit(v):
    return v / np.linalg.norm(v)


def _is_convex(verts: np.ndarray) -> bool:
    n = len(verts)
    vt = [tuple(map(float, v)) for v in verts]
    return all(
        E.sign(vt[k], vt[(k + 1) % n], vt[(k + 2) % n]) >= 0
        for k in range(n)
    )


def offset_curve(
    verts: np.ndarray, radius: float, tolerance: float = 1e-3
) -> np.ndarray:
    """Closed offset curve of a CCW loop at distance `radius`, with
    concave vertices spliced into the curve (radial edges through the
    vertex) so winding numbers stay correct —
    S2BufferOperation.BufferEdgeAndVertex / AddEdgeArc / AddVertexArc
    (S2BufferOperation.cs:517-613).  May self-intersect; feed to the
    winding walk."""
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    n = len(verts)
    cr, sr = math.cos(radius), math.sin(radius)
    step = 2 * math.sqrt(2 * tolerance / max(radius, tolerance))
    pts: list[np.ndarray] = []
    for k in range(n):
        a, b = verts[k], verts[(k + 1) % n]
        c = verts[(k + 2) % n]
        axis_ab = _unit(np.cross(b, a))  # outward normal of a CCW edge
        ang = math.atan2(
            np.linalg.norm(np.cross(a, b)), float(np.dot(a, b))
        )
        m = max(1, int(math.ceil(ang / step)))
        for t in np.arange(m) / m:  # semi-open [a, b)
            if ang < 1e-12:
                p = a
            else:
                p = (
                    math.sin((1 - t) * ang) * a + math.sin(t * ang) * b
                ) / math.sin(ang)
            pts.append(_unit(cr * p + sr * axis_ab))
        axis_bc = _unit(np.cross(c, b))
        turn = E.sign(
            tuple(map(float, a)), tuple(map(float, b)), tuple(map(float, c))
        )
        if turn >= 0:
            # convex turn: round join sweeping CCW from axis_ab to
            # axis_bc around b, semi-open (next edge arc closes it)
            w = math.acos(
                float(np.clip(np.dot(axis_ab, axis_bc), -1, 1))
            )
            if w > 1e-12:
                rot = _unit(np.cross(b, axis_ab))
                m2 = max(1, int(math.ceil(w / step)))
                for s in np.arange(m2) / m2:
                    d = math.cos(s * w) * axis_ab + math.sin(s * w) * rot
                    pts.append(_unit(cr * b + sr * d))
        else:
            # concave turn: close this edge's arc at b, then splice the
            # input vertex itself into the offset curve; the next edge
            # arc reopens at b's offset w.r.t. its own axis
            pts.append(_unit(cr * b + sr * axis_ab))
            pts.append(b.copy())
    out = np.stack(pts)
    keep = (
        np.linalg.norm(np.diff(out, axis=0, append=out[:1]), axis=1)
        > 1e-14
    )
    return out[keep]


def buffer_loop_rings(
    verts: np.ndarray,
    radius: float,
    tolerance: float = 1e-3,
    check: bool = True,
) -> list[np.ndarray]:
    """CCW loop -> buffered boundary rings (region on the left: CCW
    shells, CW holes).  Convex loops produce one parameter-ordered
    ring; concave loops run the spliced offset curve through the
    winding-positive arrangement walk."""
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    if _is_convex(verts):
        return [buffer_loop(verts, radius, tolerance, check)]
    from .winding import RULE_POSITIVE, winding_operation

    curve = offset_curve(verts, radius, tolerance)
    # winding on the sphere is relative: anchor at the antipode of the
    # loop's center, which the buffered region cannot reach for the
    # supported radii (S2BufferOperation tracks the same information
    # with its sweep-edge ref_winding bookkeeping)
    center = verts.mean(axis=0)
    ref = tuple(-center / np.linalg.norm(center))
    rings = winding_operation(
        [curve], RULE_POSITIVE, ref_point=ref, ref_winding=0
    )
    if check:
        _validate_rings(verts, radius, tolerance, rings)
    return rings


def buffer_loop(
    verts: np.ndarray,
    radius: float,
    tolerance: float = 1e-3,
    check: bool = True,
) -> np.ndarray:
    """CCW loop vertices -> buffered exterior ring ((m, 3) unit
    vectors), expanded by `radius` radians with round joins.  Concave
    inputs route through ``buffer_loop_rings``; a multi-ring result
    (a concavity pinching off a hole) raises — call
    ``buffer_loop_rings`` directly for those."""
    # contiguity matters for bitwise determinism: np.dot/np.cross on a
    # strided pandas column view can take a different BLAS path with
    # different rounding than the contiguous case
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    if not _is_convex(verts):
        rings = buffer_loop_rings(verts, radius, tolerance, check)
        if len(rings) != 1:
            raise ValueError(
                "buffer_loop: concave input buffered to "
                f"{len(rings)} rings (a hole pinched off); use "
                "buffer_loop_rings for the full ring set"
            )
        return rings[0]
    n = len(verts)
    cr, sr = math.cos(radius), math.sin(radius)
    # sample spacing along offset arcs so chord error <= tolerance
    step = 2 * math.sqrt(2 * tolerance / max(radius, tolerance))
    cand: list[tuple[int, float, np.ndarray]] = []  # (edge_idx, t, point)
    for k in range(n):
        a, b = verts[k], verts[(k + 1) % n]
        u = _unit(np.cross(a, b))  # interior side for CCW loops
        ang = math.atan2(
            np.linalg.norm(np.cross(a, b)), float(np.dot(a, b))
        )
        m = max(2, int(math.ceil(ang / step)) + 1)
        for t in np.linspace(0.0, 1.0, m):
            # slerp along the edge; sort key maps edge samples into
            # [k, k + 0.9] so the vertex join slots strictly after
            if ang < 1e-12:
                p = a
            else:
                p = (
                    math.sin((1 - t) * ang) * a + math.sin(t * ang) * b
                ) / math.sin(ang)
            q = cr * p - sr * u
            cand.append((k, 0.9 * float(t), _unit(q)))
        # round join at vertex b: sweep the normal from this edge's to
        # the next edge's outward direction
        c = verts[(k + 2) % n]
        u2 = _unit(np.cross(b, c))
        cosw = float(np.clip(np.dot(u, u2), -1, 1))
        w = math.acos(cosw)
        if w > 1e-9:
            m2 = max(2, int(math.ceil(w / step)) + 1)
            for s in np.linspace(0.0, 1.0, m2)[1:-1]:
                un = _unit(
                    (math.sin((1 - s) * w) * u + math.sin(s * w) * u2)
                    / math.sin(w)
                )
                q = cr * b - sr * un
                # joins sort into (k + 0.9, k + 1): after this edge's
                # samples, before the next edge's first sample
                cand.append((k, 0.9 + 0.0999 * float(s), _unit(q)))
    pts = np.stack([p for _, _, p in cand])
    # trim: drop candidates closer than (r - tol) to any boundary edge
    min_d2 = np.full(len(pts), np.inf)
    for k in range(n):
        a = tuple(float(x) for x in verts[k])
        b = tuple(float(x) for x in verts[(k + 1) % n])
        d2 = edge_distance2_batch(pts[:, 0], pts[:, 1], pts[:, 2], a, b)
        min_d2 = np.minimum(min_d2, d2)
    s_lim = math.sin(0.5 * max(radius - tolerance, 0.0))
    keep = min_d2 >= 4 * s_lim * s_lim - 1e-15
    order = sorted(
        (cand[i][0] + cand[i][1], i) for i in np.flatnonzero(keep)
    )
    ring = pts[[i for _, i in order]]
    # dedup consecutive near-identical samples
    d = np.linalg.norm(np.diff(ring, axis=0, append=ring[:1]), axis=1)
    ring = ring[d > 1e-12]
    if check:
        _validate_ring(verts, radius, tolerance, ring)
    return ring


def _validate_ring(verts, radius, tolerance, ring) -> None:
    """Monte-Carlo agreement check between the emitted ring and the
    within-distance predicate, ignoring a band of 4*tol around the
    true buffered boundary."""
    from .loop import Loop

    rng = np.random.default_rng(0)
    center = _unit(np.asarray(verts).mean(axis=0))
    spread = 4 * (radius + float(
        np.linalg.norm(np.asarray(verts) - center, axis=1).max()
    ))
    P = center[None, :] + spread * rng.standard_normal((1500, 3))
    P = P / np.linalg.norm(P, axis=1)[:, None]
    lp = Loop(np.asarray(verts))
    want = buffered_contains(lp.verts, radius, P, lp.origin_inside)
    got = Loop(ring).contains_points(P)
    bad = want != got
    if not bad.any():
        return
    # tolerance band: |dist(x, boundary) - r| <= 4*tol is acceptable
    n = len(verts)
    min_d2 = np.full(len(P), np.inf)
    for k in range(n):
        a = tuple(float(x) for x in verts[k])
        b = tuple(float(x) for x in verts[(k + 1) % n])
        min_d2 = np.minimum(
            min_d2, edge_distance2_batch(P[:, 0], P[:, 1], P[:, 2], a, b)
        )
    d = 2 * np.arcsin(np.sqrt(np.clip(min_d2, 0, 4)) / 2)
    out_of_band = bad & (np.abs(d - radius) > 4 * tolerance)
    if out_of_band.any():
        raise ValueError(
            "buffer_loop: offset-curve construction failed validation "
            f"({int(out_of_band.sum())} probes disagree beyond 4*tol); "
            "the loop's concave features are below the buffer radius — "
            "use the within-distance join, or reduce the radius"
        )


def _validate_rings(verts, radius, tolerance, rings) -> None:
    """Monte-Carlo agreement check for the multi-ring (concave) path:
    the winding-positive region from the emitted rings (XOR of ring
    parities — rings are disjoint simple curves bounding a 0/1-winding
    region) must match the within-distance predicate outside a band of
    4*tol around the true buffered boundary."""
    from .loop import Loop

    rng = np.random.default_rng(0)
    center = _unit(np.asarray(verts).mean(axis=0))
    spread = 4 * (radius + float(
        np.linalg.norm(np.asarray(verts) - center, axis=1).max()
    ))
    P = center[None, :] + spread * rng.standard_normal((1500, 3))
    P = P / np.linalg.norm(P, axis=1)[:, None]
    lp = Loop(np.asarray(verts))
    want = buffered_contains(lp.verts, radius, P, lp.origin_inside)
    got = np.zeros(len(P), dtype=bool)
    for ring in rings:
        arr = np.asarray(ring)
        from .measures import loop_signed_area

        if loop_signed_area(arr) < 0:
            # CW hole ring: the S2 left-interior is the unbounded side;
            # parity containment needs the CCW orientation
            arr = arr[::-1]
        got ^= Loop(arr).contains_points(P)
    bad = want != got
    if not bad.any():
        return
    n = len(verts)
    min_d2 = np.full(len(P), np.inf)
    for k in range(n):
        a = tuple(float(x) for x in verts[k])
        b = tuple(float(x) for x in verts[(k + 1) % n])
        min_d2 = np.minimum(
            min_d2, edge_distance2_batch(P[:, 0], P[:, 1], P[:, 2], a, b)
        )
    d = 2 * np.arcsin(np.sqrt(np.clip(min_d2, 0, 4)) / 2)
    out_of_band = bad & (np.abs(d - radius) > 4 * tolerance)
    if out_of_band.any():
        raise ValueError(
            "buffer_loop_rings: winding-walk construction failed "
            f"validation ({int(out_of_band.sum())} probes disagree "
            "beyond 4*tol)"
        )


def buffered_contains(verts: np.ndarray, radius: float, points: np.ndarray,
                      origin_inside: bool) -> np.ndarray:
    """Reference predicate for tests: inside loop OR within radius of
    its boundary (unit points)."""
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    inside = (
        E.crossing_parity_fast(verts, px, py, pz) ^ int(origin_inside)
    ).astype(bool)
    n = len(verts)
    min_d2 = np.full(len(points), np.inf)
    for k in range(n):
        a = tuple(float(x) for x in verts[k])
        b = tuple(float(x) for x in verts[(k + 1) % n])
        min_d2 = np.minimum(
            min_d2, edge_distance2_batch(px, py, pz, a, b)
        )
    s = math.sin(0.5 * radius)
    return inside | (min_d2 <= 4 * s * s)
