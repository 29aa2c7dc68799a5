"""Mixed-dimension boolean operations with full degeneracy support.

Re-expresses S2BooleanOperation (S2Builder/S2BooleanOperation.cs:1-260
semantic contract, CrossingProcessor clipping rules) for geometry
collections of points + polylines + polygons:

- polyline boundaries per PolylineModel OPEN / SEMI_OPEN / CLOSED
  (S2BooleanOperation.cs:125-148), including
  ``polyline_loops_have_boundaries`` and the single-degenerate-edge
  special case;
- polygon boundaries per PolygonModel OPEN / SEMI_OPEN / CLOSED
  (S2BooleanOperation.cs:149-166), SEMI_OPEN vertex containment via
  S2ContainsVertexQuery (kernels.wedge);
- dimension priority (S2BooleanOperation.cs:169-190): union keeps the
  higher dimension, intersection the lower, difference is unaffected
  by subtracting strictly lower dimensions;
- multiset semantics for points and polyline edges
  (S2BooleanOperation.cs:96-106);
- degeneracy preservation: point shells, sibling-pair shells/holes,
  degenerate polylines, and isolated clipped vertices emitted as
  degenerate edges (per vertex occurrence, matching
  CrossingProcessor); degenerate polygon features are closed point
  sets in every model.

Unlike the reference (an output-sensitive shape-index walk), inputs
here are dim-sized kernel geometry: both regions are snapped, then
every edge is split at robust crossings with the other region
(kernels.boolop.edge_intersection, snapped) and at exact T-junction
vertices (kernels.edges.exact_sign), materializing "effective"
chains/loops — the same arrangement S2Builder's snap pass would
produce for these inputs.  Every effective edge and vertex occurrence
is then classified against the other region.  Collinear partial
overlaps without shared endpoints are out of scope (the reference
resolves those by snap rounding; snap inputs first via kernels.snap).

Output is per-dimension directed-edge multisets — the representation
the reference's own test harness compares
(S2BooleanOperationTests.cs:2349-2366 IndexMatchingLayer), with
dimension-2 degenerate-edge / sibling-pair multiplicity relaxed.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from . import edges as E
from .boolop import edge_intersection
from .loop import Loop
from .wedge import ContainsVertexQuery

UNION = "union"
INTERSECTION = "intersection"
DIFFERENCE = "difference"
SYMMETRIC_DIFFERENCE = "symmetric_difference"

OPEN = "open"
SEMI_OPEN = "semi_open"
CLOSED = "closed"


@dataclass
class Options:
    """S2BooleanOperation.Options (defaults match the reference:
    polygon_model SEMI_OPEN, polyline_model CLOSED)."""

    polygon_model: str = SEMI_OPEN
    polyline_model: str = CLOSED
    polyline_loops_have_boundaries: bool = True
    split_all_crossing_polyline_edges: bool = False
    snap_exponent: int | None = None  # IntLatLngSnapFunction exponent

    def snap_point(self, p):
        if self.snap_exponent is None:
            return tuple(float(v) for v in p)
        from .snap import IntLatLngSnapFunction

        return tuple(
            float(v)
            for v in IntLatLngSnapFunction(self.snap_exponent).snap_point(p)
        )


@dataclass
class Geometry:
    """One boolean-operation region: points | polyline chains |
    polygons (each a list of loops; loops may be degenerate; the
    token "full" marks a full loop)."""

    points: list = field(default_factory=list)
    chains: list = field(default_factory=list)
    polygons: list = field(default_factory=list)


def parse_index(text: str) -> Geometry:
    """MakeIndexOrDie format: "p1 | p2 # line1 | line2 # poly1 | poly2"
    with polygon loops separated by ';' (S2TextFormat.MakeIndex)."""
    from .textformat import parse_points

    parts = text.split("#")
    assert len(parts) == 3, text
    g = Geometry()
    if parts[0].strip():
        for tok in parts[0].split("|"):
            g.points.append(tuple(map(float, parse_points(tok)[0])))
    if parts[1].strip():
        for tok in parts[1].split("|"):
            g.chains.append(
                [tuple(map(float, p)) for p in parse_points(tok)]
            )
    if parts[2].strip():
        for tok in parts[2].split("|"):
            loops = []
            for ltok in tok.split(";"):
                if ltok.strip() == "full":
                    loops.append("full")
                else:
                    loops.append(
                        [tuple(map(float, p)) for p in parse_points(ltok)]
                    )
            g.polygons.append(loops)
    return g


# ---------------------------------------------------------------------
# geometry predicates
# ---------------------------------------------------------------------


def _strictly_on_edge(u, v, w) -> bool:
    """w lies in the open interior of geodesic edge (u, v): exactly
    collinear (triage then exact sign, no symbolic perturbation) and
    strictly between the endpoints."""
    if w == u or w == v or u == v:
        return False
    if E.triage_sign(u, v, w) != 0:
        return False  # definitely off the great circle
    if E.exact_sign(u, v, w, perturb=False) != 0:
        return False
    # minor-arc betweenness by rotation sign: with z = u x v the edge's
    # great-circle normal, a collinear w = cos(t) u + sin(t) n lies
    # strictly between u and v (0 < t < arc(u, v) < pi) iff
    # (u x w) . z > 0 and (w x v) . z > 0.  A dot-threshold test
    # (dot(u, w) > dot(u, v) and dot(v, w) > dot(u, v)) wrongly accepts
    # points on the COMPLEMENTARY arc once arc(u, v) > 2*pi/3 — e.g.
    # edge 0:0 -> 0:170 with w = 0:-80.
    z = E.cross(u, v)
    return (
        E.dot(E.cross(u, w), z) > 0.0 and E.dot(E.cross(w, v), z) > 0.0
    )


def _arc_param(u, w) -> float:
    return math.acos(max(-1.0, min(1.0, E.dot(u, w))))


def _loop_edges(loop):
    if len(loop) == 1:
        return [(loop[0], loop[0])]
    return [
        (loop[i], loop[(i + 1) % len(loop)]) for i in range(len(loop))
    ]


def _loop_is_degenerate(loop) -> bool:
    """True when the loop's directed edges cancel to no net boundary
    (single vertices, sibling chains, fully-collapsed rings) —
    FindPolygonDegeneracies' degeneracy condition applied loop-wide."""
    net = Counter()
    for a, b in _loop_edges(loop):
        if a == b:
            continue
        if net[(b, a)] > 0:
            net[(b, a)] -= 1
        else:
            net[(a, b)] += 1
    return not any(net.values())


# ---------------------------------------------------------------------
# snapping + arrangement (effective chains / loops)
# ---------------------------------------------------------------------


def _snap_geometry(g: Geometry, options: Options) -> Geometry:
    sp = options.snap_point
    out = Geometry()
    out.points = [sp(p) for p in g.points]
    out.chains = [[sp(p) for p in chain] for chain in g.chains]
    for poly in g.polygons:
        loops = []
        for loop in poly:
            if loop == "full":
                loops.append("full")
                continue
            snapped = [sp(p) for p in loop]
            # collapse consecutive duplicates created by snapping,
            # keeping genuinely degenerate 1- and 2-vertex loops
            if len(snapped) > 2:
                dedup = [snapped[0]]
                for p in snapped[1:]:
                    if p != dedup[-1]:
                        dedup.append(p)
                if len(dedup) > 1 and dedup[0] == dedup[-1]:
                    dedup.pop()
                snapped = dedup
            loops.append(snapped)
        out.polygons.append(loops)
    return out


def _all_edges_and_vertices(g: Geometry):
    edges = []
    vertices = set(g.points)
    for chain in g.chains:
        vertices.update(chain)
        edges.extend(
            (u, v) for u, v in zip(chain, chain[1:]) if u != v
        )
    for poly in g.polygons:
        for loop in poly:
            if loop == "full":
                continue
            vertices.update(loop)
            edges.extend((u, v) for u, v in _loop_edges(loop) if u != v)
    return edges, vertices


def _split_edge(u, v, cross_edges, t_vertices, options):
    """Interior points to materialize on edge (u, v): snapped robust
    crossings with cross_edges plus exact T-junction vertices."""
    if u == v:
        return []
    cuts = set()
    for (p, q) in cross_edges:
        if p == q or (p, q) == (u, v) or (q, p) == (u, v):
            continue
        # exact T-junction: a cross-edge endpoint lying in the open
        # interior of (u, v) IS the cut.  The perturbed crossing_sign
        # below would otherwise also fire for the piercing edge and
        # edge_intersection would add a SECOND cut within ~1 ulp of the
        # vertex (the two points need not be bit-identical), leaving a
        # sliver sub-edge in the arrangement.  Registered here rather
        # than skipped so self-split polyline edges — whose endpoints
        # are not in t_vertices — still cut at the junction.
        ts = [w for w in (p, q) if _strictly_on_edge(u, v, w)]
        if ts:
            cuts.update(ts)
            continue
        if E.crossing_sign(u, v, p, q) > 0:
            cuts.add(options.snap_point(edge_intersection(u, v, p, q)))
    for w in t_vertices:
        if _strictly_on_edge(u, v, w):
            cuts.add(w)
    cuts.discard(u)
    cuts.discard(v)
    return sorted(cuts, key=lambda w: _arc_param(u, w))


def _effective(g: Geometry, other_ev, own_edges, options) -> Geometry:
    """Materialize the arrangement: insert split points into every
    chain and loop (the zero-radius analogue of S2Builder's
    split_crossing_edges snap pass)."""
    other_edges, other_vertices = other_ev
    self_split = options.split_all_crossing_polyline_edges

    def expand(seq, closed):
        pairs = list(zip(seq, seq[1:] + ([seq[0]] if closed else [])))
        out = []
        for u, v in pairs:
            out.append(u)
            cross = list(other_edges)
            if self_split:
                cross += [e for e in own_edges if e != (u, v)]
            out.extend(_split_edge(u, v, cross, other_vertices, options))
        if not closed:
            out.append(seq[-1])
        return out

    eff = Geometry()
    eff.points = list(g.points)
    for chain in g.chains:
        eff.chains.append(expand(chain, closed=False))
    for poly in g.polygons:
        loops = []
        for loop in poly:
            if loop == "full" or len(loop) == 1:
                loops.append(loop)
            else:
                loops.append(expand(loop, closed=True))
        eff.polygons.append(loops)
    return eff


# ---------------------------------------------------------------------
# region containment queries (over effective geometry)
# ---------------------------------------------------------------------


class Region:
    """One side's effective geometry prepared for containment queries
    and coincident-edge classification."""

    def __init__(self, geom: Geometry, options: Options):
        self.options = options
        self.points = Counter(geom.points)
        self.chains = geom.chains
        self.polygons = geom.polygons
        self.line_subedges = Counter()
        self.line_degens = Counter()
        for chain in geom.chains:
            for u, v in zip(chain, chain[1:]):
                if u == v:
                    self.line_degens[u] += 1
                else:
                    self.line_subedges[(u, v)] += 1
        self.poly_subedges = Counter()
        self.poly_degen_vertices = set()
        self.poly_degen_edges = set()
        self.full = False
        # per-polygon parity units: (full_base, [Loop, ...]) — a "full"
        # loop inverts that POLYGON's parity base (its other loops are
        # holes), it does not short-circuit the whole region: a
        # full-with-holes polygon ("## full; 0:0, ...") contains
        # everything EXCEPT the hole interiors.
        self.pip_polys = []
        self.vertex_wedges: dict = {}  # v -> list[(neighbor, dir)]
        for poly in geom.polygons:
            loops = []
            poly_full = False
            for loop in poly:
                if loop == "full":
                    self.full = True
                    poly_full = True
                    continue
                degen = _loop_is_degenerate(loop)
                if degen:
                    self.poly_degen_vertices.update(loop)
                for u, v in _loop_edges(loop):
                    self.poly_subedges[(u, v)] += 1
                    if u == v:
                        self.poly_degen_vertices.add(u)
                        continue
                    if degen:
                        self.poly_degen_edges.add((u, v))
                    self.vertex_wedges.setdefault(u, []).append((v, 1))
                    self.vertex_wedges.setdefault(v, []).append((u, -1))
                if not degen and len(loop) >= 3:
                    loops.append(np.asarray(loop, dtype=np.float64))
            if loops or poly_full:
                self.pip_polys.append(
                    (poly_full, [Loop(l) for l in loops])
                )

    # -- polygon interior / boundary ----------------------------------

    def strictly_inside(self, p) -> bool:
        """p in the open interior of this region's polygons (parity
        over each polygon's non-degenerate loops; a "full" loop flips
        the polygon's parity base, so full-with-holes polygons exclude
        their hole interiors)."""
        if self._on_poly_boundary(p):
            return False
        pa = np.asarray(p)
        for full_base, loops in self.pip_polys:
            inside = full_base
            for lp in loops:
                if lp.contains_point(pa):
                    inside = not inside
            if inside:
                return True
        return False

    def _on_poly_boundary(self, p) -> bool:
        if p in self.vertex_wedges or p in self.poly_degen_vertices:
            return True
        return any(
            _strictly_on_edge(u, v, p) for (u, v) in self.poly_subedges
        )

    def _on_degen_poly_feature(self, p) -> bool:
        if p in self.poly_degen_vertices:
            return True
        return any(
            _strictly_on_edge(u, v, p) for (u, v) in self.poly_degen_edges
        )

    def polygon_contains_point(self, p) -> bool:
        """Point containment per PolygonModel; degenerate features are
        closed point sets in every model.  Full-base polygons flow
        through the same boundary/parity ladder (a bare "full" polygon
        has no boundary features, so strictly_inside answers True)."""
        model = self.options.polygon_model
        if self._on_degen_poly_feature(p):
            return True
        if p in self.vertex_wedges:
            if model == OPEN:
                return False
            if model == CLOSED:
                return True
            q = ContainsVertexQuery(p)
            for nbr, d in self.vertex_wedges[p]:
                q.add_edge(nbr, d)
            return q.contains_sign() > 0
        for (u, v) in self.poly_subedges:
            if u != v and _strictly_on_edge(u, v, p):
                # interior point of an edge: SEMI_OPEN/CLOSED polygons
                # contain their edges
                return model in (SEMI_OPEN, CLOSED)
        return self.strictly_inside(p)

    def classify_edge(self, u, v) -> str:
        """'same' / 'rev' (coincident with a polygon sub-edge) or
        'in' / 'out' by arc-midpoint parity."""
        if (u, v) in self.poly_subedges:
            return "same"
        if (v, u) in self.poly_subedges:
            return "rev"
        mid = np.asarray(u) + np.asarray(v)
        mid = tuple(mid / np.linalg.norm(mid))
        return "in" if self.strictly_inside(mid) else "out"

    def edge_in_polygons(self, u, v) -> bool:
        cls = self.classify_edge(u, v)
        model = self.options.polygon_model
        if cls == "in":
            return True
        if cls == "same":
            return (u, v) in self.poly_degen_edges or model in (
                SEMI_OPEN, CLOSED)
        if cls == "rev":
            return (v, u) in self.poly_degen_edges or model == CLOSED
        return False

    # -- polyline point sets ------------------------------------------

    def chain_occurrence_contained(self, chain, idx) -> bool:
        """Vertex occurrence membership in the chain's OWN point set
        per PolylineModel (S2BooleanOperation.cs:125-148)."""
        model = self.options.polyline_model
        if len(chain) == 2 and chain[0] == chain[1]:
            return model == CLOSED  # single degenerate edge
        is_loop = len(chain) > 2 and chain[0] == chain[-1]
        if is_loop and not self.options.polyline_loops_have_boundaries:
            return True
        if idx == 0:
            return model in (SEMI_OPEN, CLOSED)
        if idx == len(chain) - 1:
            return model == CLOSED
        return True

    def polyline_contains_point(self, p) -> bool:
        for chain in self.chains:
            for i, v in enumerate(chain):
                if v == p and self.chain_occurrence_contained(chain, i):
                    return True
            for u, v in zip(chain, chain[1:]):
                if u != v and _strictly_on_edge(u, v, p):
                    return True
        return False

    def contains_point(self, p, dims) -> bool:
        if 0 in dims and self.points.get(p, 0) > 0:
            return True
        if 1 in dims and self.polyline_contains_point(p):
            return True
        if 2 in dims and (self.polygons or self.full) and \
                self.polygon_contains_point(p):
            return True
        return False

    def edge_in_polylines(self, u, v) -> bool:
        """Polyline edges between the same vertices intersect in either
        direction (S2BooleanOperation.cs:108-112)."""
        return (u, v) in self.line_subedges or (v, u) in self.line_subedges

    def degen_edge_in_polylines(self, v) -> bool:
        return self.line_degens.get(v, 0) > 0


# ---------------------------------------------------------------------
# the operation
# ---------------------------------------------------------------------


def boolean_operation(a: Geometry, b: Geometry, op: str,
                      options: Options | None = None,
                      edge_budget: int = 10_000) -> dict:
    """S2BooleanOperation over two mixed-dimension regions; returns
    {0: [points], 1: [directed edges], 2: [directed edges]} multisets
    (IndexMatchingLayer's comparison representation)."""
    options = options or Options()
    n_edges = sum(
        len(lp)
        for g in (a, b)
        for poly in g.polygons
        for lp in poly
        if lp != "full"
    ) + sum(
        max(len(ch) - 1, 1) for g in (a, b) for ch in g.chains
    ) + sum(len(g.points) for g in (a, b))
    if n_edges > edge_budget:
        raise ValueError(
            f"boolean_operation: {n_edges} input edges/points exceed "
            f"the driver-side budget of {edge_budget} (the mixed-"
            "dimension kernel is O(edges^2) by design for dim-sized "
            "geometry; distribute per case via measures_op."
            "mixed_boolean_rows, or raise edge_budget explicitly)"
        )
    a = _snap_geometry(a, options)
    b = _snap_geometry(b, options)
    a_ev = _all_edges_and_vertices(a)
    b_ev = _all_edges_and_vertices(b)
    ea = _effective(a, b_ev, a_ev[0], options)
    eb = _effective(b, a_ev, b_ev[0], options)
    ra = Region(ea, options)
    rb = Region(eb, options)

    if op == SYMMETRIC_DIFFERENCE:
        out = {0: [], 1: [], 2: []}
        _clip_side(ra, rb, DIFFERENCE, primary=True, out=out)
        _clip_side(rb, ra, DIFFERENCE, primary=False, out=out)
        _clip_side(rb, ra, DIFFERENCE, primary=True, out=out)
        _clip_side(ra, rb, DIFFERENCE, primary=False, out=out)
        return out

    out = {0: [], 1: [], 2: []}
    _clip_side(ra, rb, op, primary=True, out=out)
    _clip_side(rb, ra, op, primary=False, out=out)
    return out


def _clip_side(src: Region, other: Region, op: str,
               primary: bool, out: dict) -> None:
    """Emit src's portions per op against `other`
    (CrossingProcessor's keep/discard rules + the dimension rules of
    S2BooleanOperation.cs:169-190)."""
    want_inside = op == INTERSECTION
    subtrahend = op == DIFFERENCE and not primary

    # -- dim 0: points -------------------------------------------------
    if not subtrahend:
        if op == UNION:
            dims = (1, 2)  # equal points never absorb each other
        else:
            dims = (0, 1, 2)
        for p, n in src.points.items():
            if other.contains_point(p, dims) == want_inside:
                out[0].extend([p] * n)

    # -- dim 1: polyline chains ---------------------------------------
    if not subtrahend:
        dims = (2,) if op == UNION else (1, 2)
        for chain in src.chains:
            _clip_chain(src, other, chain, dims, want_inside, out)

    # -- dim 2: polygons ----------------------------------------------
    for poly in src.polygons:
        kept_at: set = set()
        emitted = []
        for loop in poly:
            if loop == "full":
                continue
            for u, v in _loop_edges(loop):
                if u == v:
                    if _keep_degen_poly_edge(other, u, op, primary):
                        emitted.append((u, u))
                        kept_at.add(u)
                    continue
                keep, reverse = _keep_poly_edge(
                    src, other, u, v, op, primary)
                if keep:
                    emitted.append((v, u) if reverse else (u, v))
                    kept_at.add(u)
                    kept_at.add(v)
        out[2].extend(emitted)
        if op == INTERSECTION:
            # isolated boundary vertices (vertex-touch / collapsed
            # geometry) become degenerate point shells
            for loop in poly:
                if loop == "full":
                    continue
                for v in loop:
                    if v in kept_at:
                        continue
                    kept_at.add(v)  # emit once per polygon
                    if _own_poly_vertex_contained(src, v) and \
                            other.contains_point(v, (2,)):
                        out[2].append((v, v))


def _own_poly_vertex_contained(src: Region, v) -> bool:
    model = src.options.polygon_model
    if v in src.poly_degen_vertices:
        return True
    if model == OPEN:
        return False
    if model == CLOSED:
        return True
    q = ContainsVertexQuery(v)
    for nbr, d in src.vertex_wedges.get(v, []):
        q.add_edge(nbr, d)
    return q.contains_sign() > 0


def _keep_poly_edge(src: Region, other: Region, s, t, op: str,
                    primary: bool):
    """(keep, reverse) for a non-degenerate polygon sub-edge
    (coincident-boundary direction rules per PolygonModel)."""
    model = src.options.polygon_model
    if not other.polygons and not other.full:
        cls = "out"
    else:
        # classify_edge's midpoint parity handles full-base polygons
        # (including full-with-holes, where an edge in the hole is
        # genuinely "out") — no full fix-up here
        cls = other.classify_edge(s, t)
    if op == UNION:
        if cls == "same":
            return primary, False  # secondary copy deduplicated
        return (cls == "out" or (cls == "rev" and model == OPEN)), False
    if op == INTERSECTION:
        if cls == "same":
            return primary, False
        return (cls == "in" or (cls == "rev" and model == CLOSED)), False
    # DIFFERENCE
    if primary:
        # NOTE: cls == "rev" is kept even inside the symmetric-
        # difference composition — the reference's symdiff of adjacent
        # polygons emits BOTH sides of the shared edge (two separate
        # result polygons, sibling pair retained; golden
        # PolygonEdgeSemiOpenPolygonEdgeOverlap expects it).
        return (cls == "out" or cls == "rev"), False
    return cls == "in", True  # subtrahend boundary reversed inside A


def _keep_degen_poly_edge(other: Region, v, op: str,
                          primary: bool) -> bool:
    """Degenerate polygon edge (v, v): point shell/hole survival."""
    if op == UNION:
        return not other.strictly_inside(v)
    if op == INTERSECTION:
        return other.contains_point(v, (2,))
    if primary:
        return not other.strictly_inside(v)
    return other.strictly_inside(v)  # degenerate hole in A - B


def _clip_chain(src: Region, other: Region, chain, dims,
                want_inside: bool, out: dict) -> None:
    """Clip one effective polyline chain; kept edges plus isolated
    contained vertex occurrences as degenerate edges
    (CrossingProcessor polyline handling,
    S2BooleanOperationTests.cs:300-736)."""
    kept_adjacent = [False] * len(chain)
    for ei in range(len(chain) - 1):
        u, v = chain[ei], chain[ei + 1]
        if u == v:
            contained = (
                (1 in dims and (other.degen_edge_in_polylines(u)
                                or other.polyline_contains_point(u)))
                or (2 in dims and (other.polygons or other.full)
                    and other.polygon_contains_point(u))
            )
        else:
            contained = (
                (1 in dims and other.edge_in_polylines(u, v))
                or (2 in dims and bool(other.polygons)
                    and other.edge_in_polygons(u, v))
            )
        if contained == want_inside:
            out[1].append((u, v))
            kept_adjacent[ei] = True
            kept_adjacent[ei + 1] = True

    merged_loop = (
        len(chain) > 2 and chain[0] == chain[-1]
        and not src.options.polyline_loops_have_boundaries
    )
    last = len(chain) - 1 if not merged_loop else len(chain) - 2
    for idx in range(last + 1):
        incident = kept_adjacent[idx]
        if merged_loop and idx == 0:
            incident = incident or kept_adjacent[len(chain) - 1]
        if incident:
            continue
        if not src.chain_occurrence_contained(chain, idx):
            continue
        v = chain[idx]
        if other.contains_point(v, dims) == want_inside:
            out[1].append((v, v))


# ---------------------------------------------------------------------
# comparison (IndexMatchingLayer, S2BooleanOperationTests.cs:2349-2366)
# ---------------------------------------------------------------------


def normalize_result(result: dict) -> tuple:
    """Canonical comparable form: dim-0/1 exact multisets; dim-2
    degenerate edges and sibling pairs compared without multiplicity
    (DegenerateEdges/SiblingPairs DISCARD_EXCESS in the reference's
    comparison layer)."""
    d0 = Counter(result[0])
    d1 = Counter(result[1])
    d2 = Counter(result[2])
    degen = set()
    sib = set()
    rest = Counter()
    for (u, v), n in d2.items():
        if u == v:
            degen.add((u, v))
        elif d2.get((v, u), 0) > 0:
            sib.add((u, v))
        else:
            rest[(u, v)] += n
    return (d0, d1, degen, sib, rest)


def expected_from_text(text: str, options: Options | None = None) -> dict:
    """Parse an expected-result index into the output representation."""
    options = options or Options()
    g = _snap_geometry(parse_index(text), options)
    out = {0: [], 1: [], 2: []}
    out[0].extend(g.points)
    for chain in g.chains:
        out[1].extend(zip(chain, chain[1:]))
    for poly in g.polygons:
        for loop in poly:
            if loop == "full":
                continue
            out[2].extend(_loop_edges(loop))
    return out


def signature_rows(result: dict) -> list[tuple[int, int, str]]:
    """Canonical per-dimension (dim, count, signature) rows for the
    distributed operator and its oracle: the normalized comparison
    form rendered as sorted latlng-text multisets."""
    from .textformat import point_to_string as pts

    def e(u, v):
        return f"{pts(u)}>{pts(v)}"

    d0, d1, degen, sib, rest = normalize_result(result)
    rows = []
    s0 = ";".join(sorted(f"{pts(p)}*{n}" for p, n in d0.items()))
    rows.append((0, sum(d0.values()), s0))
    s1 = ";".join(sorted(f"{e(u, v)}*{n}" for (u, v), n in d1.items()))
    rows.append((1, sum(d1.values()), s1))
    s2 = ";".join(
        sorted(
            [f"D{e(u, v)}" for (u, v) in degen]
            + [f"S{e(u, v)}" for (u, v) in sib]
            + [f"{e(u, v)}*{n}" for (u, v), n in rest.items()]
        )
    )
    rows.append((2, len(degen) + len(sib) + sum(rest.values()), s2))
    return rows
