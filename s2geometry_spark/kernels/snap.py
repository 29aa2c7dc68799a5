"""S2Builder snap rounding: snap functions + the site-based edge
snapping core.

Re-expresses the reference's S2Builder pipeline
(S2Builder/S2Builder.cs:183-300 construction, :700-1045 site
selection, :1046-1356 extra-site passes, :1358-1450 edge snapping)
and the three standard snap functions
(S2BuilderUtil/SnapFunctions.cs:14,65,264) as a driver-side kernel:
region geometry is the dim side of every spatial join in this engine
(SURVEY.md SS2.7), so snapping runs once on the driver and the snapped
loops broadcast; the per-row fact side never touches this code.

Differences from the reference, by design:
- Most distances compare in double-precision squared chord length
  instead of exact predicates; the two order-critical comparisons keep
  the reference's exactness: candidate sites sort with the
  triage->exact->symbolic CompareDistances (kernels.edges), and the
  Voronoi site-exclusion predicate (S2Predicates.cs:1395-1594
  |rb - ra| > d on coverage-interval half-widths) takes its
  closer-to-both-endpoints early-out through the same symbolic
  CompareDistances, which is what makes snapping independent of edge
  direction at exact ties.
- Site lookup is brute force over the site list: geometry here is
  dim-sized (tens..thousands of vertices), not indexed millions
  (the reference builds S2PointIndex/MutableS2ShapeIndex).
"""

from __future__ import annotations

import math
from functools import cmp_to_key

import numpy as np

from .. import constants as C
from . import cellid as CI
from . import edges as E
from .polyline import edge_distance2, project_to_edge
from .polyline_ops import is_edge_b_near_edge_a, robust_cross_prod

DBL_EPS = E.DBL_EPS
# S2EdgeCrossings.kIntersectionError (see boolop.INTERSECTION_ERROR)
INTERSECTION_ERROR = 8 * DBL_EPS
# snap radius that guarantees computed intersection points can be
# merged with nearby vertices (S2EdgeCrossings.kIntersectionSnapRadius
# = 2 * kIntersectionError)
INTERSECTION_SNAP_RADIUS = 2 * INTERSECTION_ERROR
MAX_SNAP_RADIUS = math.radians(70.0)  # SnapFunction.kMaxSnapRadius


def chord2(radians: float) -> float:
    """Angle -> squared chord length (S1ChordAngle.FromS1Angle)."""
    if radians < 0:
        return -1.0
    s = math.sin(0.5 * min(radians, math.pi))
    return min(4.0, 4.0 * s * s)


def _norm(v):
    n = math.sqrt(E.dot(v, v))
    return (v[0] / n, v[1] / n, v[2] / n)


def _pt_chord2(a, b) -> float:
    return (
        (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
    )


# ---------------------------------------------------------------------------
# Snap functions (S2BuilderUtil/SnapFunctions.cs)
# ---------------------------------------------------------------------------


class SnapFunction:
    """Restricts output vertex locations (SnapFunctions.cs:532-573).

    snap_radius is the maximum distance a vertex moves when snapped;
    min_vertex_separation / min_edge_vertex_separation are the output
    spacing guarantees (fractions of snap_radius that depend on the
    concrete function).
    """

    snap_radius: float  # radians

    def min_vertex_separation(self) -> float:
        raise NotImplementedError

    def min_edge_vertex_separation(self) -> float:
        raise NotImplementedError

    def snap_point(self, p):
        raise NotImplementedError


class IdentitySnapFunction(SnapFunction):
    """Snaps every vertex to itself (SnapFunctions.cs:14-51); nearby
    vertices merge when snap_radius > 0."""

    def __init__(self, snap_radius: float = 0.0):
        assert snap_radius <= MAX_SNAP_RADIUS
        self.snap_radius = snap_radius

    def min_vertex_separation(self) -> float:
        return self.snap_radius

    def min_edge_vertex_separation(self) -> float:
        return 0.5 * self.snap_radius

    def snap_point(self, p):
        return p


class S2CellIdSnapFunction(SnapFunction):
    """Snaps vertices to S2 cell centers at a level
    (SnapFunctions.cs:65-245)."""

    def __init__(self, level: int = C.MAX_LEVEL):
        assert 0 <= level <= C.MAX_LEVEL
        self.level = level
        self.snap_radius = self.min_snap_radius_for_level(level)

    @staticmethod
    def min_snap_radius_for_level(level: int) -> float:
        # half the max cell diagonal + conversion error
        # (SnapFunctions.cs:127-137)
        return 0.5 * C.KMAX_DIAG.get_value(level) + 4 * DBL_EPS

    @staticmethod
    def level_for_max_snap_radius(snap_radius: float) -> int:
        # (SnapFunctions.cs:149-155)
        return C.KMAX_DIAG.get_level_for_max_value(
            2 * (snap_radius - 4 * DBL_EPS)
        )

    def min_vertex_separation(self) -> float:
        # max of constant / proportional / asymptotic bounds
        # (SnapFunctions.cs:160-186)
        min_edge = C.KMIN_EDGE.get_value(self.level)
        max_diag = C.KMAX_DIAG.get_value(self.level)
        return max(
            min_edge,
            0.548 * self.snap_radius,
            self.snap_radius - 0.5 * max_diag,
        )

    def min_edge_vertex_separation(self) -> float:
        # (SnapFunctions.cs:192-240)
        min_diag = C.KMIN_DIAG.get_value(self.level)
        if self.snap_radius == self.min_snap_radius_for_level(self.level):
            return 0.565 * min_diag
        vertex_sep = self.min_vertex_separation()
        return max(
            0.397 * min_diag,
            0.219 * self.snap_radius,
            0.5 * (vertex_sep / self.snap_radius) * vertex_sep,
        )

    def snap_point(self, p):
        leaf = CI.xyz_to_cellid(
            np.asarray([p[0]]), np.asarray([p[1]]), np.asarray([p[2]])
        )
        cid = CI.parent(leaf, self.level)
        x, y, z = CI.cellid_to_xyz(cid)
        return (float(x[0]), float(y[0]), float(z[0]))


class IntLatLngSnapFunction(SnapFunction):
    """Snaps vertices to E5/E6/E7... lat/lng coordinates
    (SnapFunctions.cs:264-470)."""

    MIN_EXPONENT = 0
    MAX_EXPONENT = 10

    def __init__(self, exponent: int):
        assert self.MIN_EXPONENT <= exponent <= self.MAX_EXPONENT
        self.exponent = exponent
        power = 1.0
        for _ in range(exponent):
            power *= 10
        # exactly match the reference's scale-factor computation
        # (SnapFunctions.cs:316-320)
        self._from_degrees = power
        self._to_degrees = 1 / power
        self.snap_radius = self.min_snap_radius_for_exponent(exponent)

    @staticmethod
    def min_snap_radius_for_exponent(exponent: int) -> float:
        # (SnapFunctions.cs:343-373)
        power = 1.0
        for _ in range(exponent):
            power *= 10
        return math.radians(math.sqrt(0.5) / power) + (
            9 * math.sqrt(2) + 1.5
        ) * DBL_EPS

    @staticmethod
    def exponent_for_max_snap_radius(snap_radius: float) -> int:
        # (SnapFunctions.cs:385-399)
        snap_radius -= (9 * math.sqrt(2) + 1.5) * DBL_EPS
        snap_radius = max(snap_radius, 1e-30)
        exponent = math.log10(math.sqrt(0.5) / math.degrees(snap_radius))
        return max(
            IntLatLngSnapFunction.MIN_EXPONENT,
            min(
                IntLatLngSnapFunction.MAX_EXPONENT,
                math.ceil(exponent - 2 * DBL_EPS),
            ),
        )

    def min_vertex_separation(self) -> float:
        # (SnapFunctions.cs:404-423)
        return max(
            0.471 * self.snap_radius,
            self.snap_radius - math.radians(math.sqrt(0.5) * self._to_degrees),
        )

    def min_edge_vertex_separation(self) -> float:
        # (SnapFunctions.cs:429-458)
        vertex_sep = self.min_vertex_separation()
        return max(
            0.277 * math.radians(self._to_degrees),
            0.222 * self.snap_radius,
            0.5 * (vertex_sep / self.snap_radius) * vertex_sep,
        )

    def snap_point(self, p):
        # lat/lng in degrees, rounded at the exponent
        # (SnapFunctions.cs:459-466); banker's-vs-half-away rounding:
        # .NET Math.Round(x) rounds half to even, matching Python's
        # round() on floats
        lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
        lng = math.degrees(math.atan2(p[1], p[0]))
        lat = _round_half_even(lat * self._from_degrees) * self._to_degrees
        lng = _round_half_even(lng * self._from_degrees) * self._to_degrees
        phi, theta = math.radians(lat), math.radians(lng)
        cosphi = math.cos(phi)
        return (
            math.cos(theta) * cosphi,
            math.sin(theta) * cosphi,
            math.sin(phi),
        )


def _round_half_even(x: float) -> float:
    f = math.floor(x)
    d = x - f
    if d > 0.5:
        return f + 1.0
    if d < 0.5:
        return f
    return f + 1.0 if f % 2 else f


# ---------------------------------------------------------------------------
# Coverage intervals (the Voronoi site-exclusion geometry)
# ---------------------------------------------------------------------------


def _edge_frame(x, y):
    """Orthonormal frame for measuring angles along geodesic edge XY:
    returns (e1=x, e2 perpendicular in the XY plane, n normal, theta_xy
    total edge angle)."""
    n = _norm(robust_cross_prod(x, y))
    e2 = _norm(E.cross(n, x))
    theta_xy = math.atan2(E.dot(y, e2), E.dot(y, x))
    if theta_xy < 0:
        theta_xy += 2 * math.pi
    return x, e2, n, theta_xy


def _circumcenter(a, b, c):
    """Circumcenter of spherical triangle ABC, oriented so it lies on
    the positive side when Sign(a,b,c) > 0 (the double-precision core
    of S2Pred.EdgeCircumcenterSign)."""
    z = E.cross(
        (b[0] - a[0], b[1] - a[1], b[2] - a[2]),
        (c[0] - a[0], c[1] - a[1], c[2] - a[2]),
    )
    n2 = E.dot(z, z)
    if n2 == 0:
        return None
    return _norm(z)


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------


class Builder:
    """Driver-side S2Builder: snaps input edges to a shared Voronoi
    site set (S2Builder.cs pipeline; see the module docstring for the
    double-precision deviations).

    Usage::

        b = Builder(IntLatLngSnapFunction(7), split_crossing_edges=True)
        la = b.start_layer(); b.add_loop(loop_a_verts)
        lb = b.start_layer(); b.add_loop(loop_b_verts)
        b.build()
        rings_a = b.layer_loops(la)   # snapped, sibling pairs removed
        lines_b = b.layer_polylines(lb)
    """

    def __init__(
        self,
        snap_function: SnapFunction | None = None,
        *,
        split_crossing_edges: bool = False,
        intersection_tolerance: float = 0.0,
        idempotent: bool = True,
        simplify_edge_chains: bool = False,
        edge_budget: int = 20_000,
    ):
        # Driver-side contract: site lookup is brute-force O(sites)
        # per vertex and crossing detection O(edges^2) — the right
        # trade for DIM-SIZED geometry (snapping is a per-group kernel
        # in the distributed plans).  The budget fails fast with an
        # actionable message instead of a silent quadratic hour when
        # someone feeds a 10M-vertex coastline.
        self.edge_budget = int(edge_budget)
        self.snap_function = snap_function or IdentitySnapFunction(0.0)
        self.split_crossing_edges = split_crossing_edges
        # simplify_edge_chains implies idempotent=False
        # (S2Builder.Options.SimplifyEdgeChains docs)
        self.simplify_requested = simplify_edge_chains
        if simplify_edge_chains:
            idempotent = False
        if split_crossing_edges:
            intersection_tolerance = max(
                intersection_tolerance, INTERSECTION_ERROR
            )
        self.intersection_tolerance = intersection_tolerance
        self.idempotent = idempotent

        snap_radius = self.snap_function.snap_radius
        assert snap_radius <= MAX_SNAP_RADIUS
        # derived radii (S2Builder.cs:183-287)
        self.site_snap_radius_ca = chord2(snap_radius)
        edge_snap_radius = snap_radius + intersection_tolerance
        self.edge_snap_radius = edge_snap_radius
        self.edge_snap_radius_ca = chord2(edge_snap_radius)
        self.snapping_requested = edge_snap_radius > 0
        self.max_edge_deviation = 1.1 * edge_snap_radius
        self.edge_site_query_radius_ca = chord2(
            self.max_edge_deviation
            + self.snap_function.min_edge_vertex_separation()
        )
        if not self.snapping_requested:
            self.min_edge_length_to_split_ca = math.inf
        else:
            self.min_edge_length_to_split_ca = chord2(
                2
                * math.acos(
                    min(
                        1.0,
                        math.sin(edge_snap_radius)
                        / math.sin(self.max_edge_deviation),
                    )
                )
            )
        # check topology around EVERY site (not just forced ones) when
        # a snapped edge can deviate further than the edge-vertex
        # separation guarantee covers; per the reference this only
        # happens when intersection_tolerance > 0 AND snap_radius is
        # tiny (≤ kIntersectionError/1.19) — almost never
        # (S2Builder.cs:252-254 and the comment block above it)
        self.check_all_site_crossings = self.max_edge_deviation > (
            edge_snap_radius
            + self.snap_function.min_edge_vertex_separation()
        )
        self.min_site_separation = self.snap_function.min_vertex_separation()
        self.min_site_separation_ca = chord2(self.min_site_separation)
        self.min_edge_site_separation_ca = chord2(
            self.snap_function.min_edge_vertex_separation()
        )
        self.max_adjacent_site_separation_ca = chord2(2 * edge_snap_radius)
        d = math.sin(edge_snap_radius)
        # sin^2 + worst-case computation error (S2Builder.cs:285-287)
        self.edge_snap_radius_sin2 = d * d + (
            (9.5 * d + 2.5 + 2 * math.sqrt(3)) * d + 9 * DBL_EPS
        ) * DBL_EPS

        self.input_vertices: list[tuple] = []
        self.input_edges: list[tuple[int, int]] = []  # vertex-id pairs
        self.edge_layers: list[int] = []
        self.num_layers = 0
        self.forced: list[tuple] = []
        self.sites: list[tuple] = []
        self.num_forced_sites = 0
        self.snapping_needed = not idempotent and self.snapping_requested
        self._built = False
        # per-input-edge label sets (S2Builder.SetLabel/PushLabel):
        # edge_label_ids[e] indexes label_lexicon
        from .graph import IdSetLexicon as _IdSetLexicon, EMPTY_SET_ID

        self.label_lexicon = _IdSetLexicon()
        self.edge_label_ids: list[int] = []
        self._label_stack: list[int] = []
        self._label_set_id = EMPTY_SET_ID
        self._is_full_polygon = False
        self.layer_options: list = []
        # populated by _simplify_edge_chains (layer -> (edges, set_ids))
        self._simplified_layers: dict[int, tuple[list, list]] | None = None
        self._input_lexicon = None

    # -- input ----------------------------------------------------------

    def start_layer(self, graph_options=None) -> int:
        """Begin a new layer; ``graph_options`` (the layer's
        GraphOptions) is only required when simplify_edge_chains is on,
        where the builder must materialize per-layer edge lists before
        the joint simplification pass."""
        self.num_layers += 1
        self.layer_options.append(graph_options)
        return self.num_layers - 1

    def _add_vertex(self, v) -> int:
        v = tuple(map(float, v))
        # dedup immediate repeats only, like S2Builder.AddVertex
        if self.input_vertices and v == self.input_vertices[-1]:
            return len(self.input_vertices) - 1
        self.input_vertices.append(v)
        return len(self.input_vertices) - 1

    def add_edge(self, v0, v1) -> None:
        if self.num_layers == 0:
            self.start_layer()
        self.input_edges.append((self._add_vertex(v0), self._add_vertex(v1)))
        self.edge_layers.append(self.num_layers - 1)
        self.edge_label_ids.append(self._label_set_id)

    def add_point(self, p) -> None:
        """A degenerate edge (S2Builder.AddPoint)."""
        self.add_edge(p, p)

    # -- labels (S2Builder.cs SetLabel/PushLabel/PopLabel/ClearLabels) --

    def set_label(self, label: int) -> None:
        self._label_stack = [int(label)]
        self._label_set_id = self.label_lexicon.add(self._label_stack)

    def push_label(self, label: int) -> None:
        self._label_stack.append(int(label))
        self._label_set_id = self.label_lexicon.add(self._label_stack)

    def pop_label(self) -> None:
        self._label_stack.pop()
        self._label_set_id = self.label_lexicon.add(self._label_stack)

    def clear_labels(self) -> None:
        from .graph import EMPTY_SET_ID

        self._label_stack = []
        self._label_set_id = EMPTY_SET_ID

    def add_is_full_polygon_predicate(self, is_full: bool) -> None:
        """Whether an all-degenerate / empty polygon graph represents
        the full polygon (S2Builder.AddIsFullPolygonPredicate; the
        constant-result form used throughout the reference tests)."""
        self._is_full_polygon = bool(is_full)

    def is_full_polygon(self) -> bool:
        return self._is_full_polygon

    def add_polyline(self, points) -> None:
        pts = [tuple(map(float, p)) for p in points]
        for a, b in zip(pts, pts[1:]):
            self.add_edge(a, b)

    def add_loop(self, verts) -> None:
        pts = [tuple(map(float, p)) for p in verts]
        for i in range(len(pts)):
            self.add_edge(pts[i], pts[(i + 1) % len(pts)])

    def force_vertex(self, p) -> None:
        # ForceVertex only records the site (S2Builder.cs:559-563);
        # it overrides idempotency indirectly: ChooseInitialSites sets
        # snapping_needed when any input vertex falls within
        # min_site_separation of a forced site.  With a zero snap
        # radius (snapping never requested) forced sites are dropped
        # by ChooseAllVerticesAsSites, exactly as in the reference.
        self.forced.append(tuple(map(float, p)))

    # -- site selection -------------------------------------------------

    def _sorted_vertex_ids(self) -> list[int]:
        """Input vertex ids in (leaf cell id, point) order — the
        candidate-site consideration order (S2Builder.SortInputVertices,
        chosen for spatial locality and deterministic output)."""
        if not self.input_vertices:
            return []
        arr = np.asarray(self.input_vertices)
        cids = CI.as_u64(
            CI.xyz_to_cellid(arr[:, 0], arr[:, 1], arr[:, 2])
        )
        return sorted(
            range(len(self.input_vertices)),
            key=lambda i: (cids[i], self.input_vertices[i]),
        )

    def _snap_site(self, p):
        if not self.snapping_requested:
            return p
        site = self.snap_function.snap_point(p)
        if _pt_chord2(site, p) > self.site_snap_radius_ca * (1 + 1e-14):
            raise ValueError(
                "snap function moved vertex by more than snap_radius"
            )
        return site

    def _add_edge_crossings(self) -> None:
        """Add pairwise interior-crossing intersection points as input
        vertices (S2Builder.AddEdgeCrossings); brute force — dim-side
        geometry."""
        from .boolop import edge_intersection

        new_pts = []
        n = len(self.input_edges)
        for i in range(n):
            a0 = self.input_vertices[self.input_edges[i][0]]
            a1 = self.input_vertices[self.input_edges[i][1]]
            for j in range(i + 1, n):
                b0 = self.input_vertices[self.input_edges[j][0]]
                b1 = self.input_vertices[self.input_edges[j][1]]
                if E.crossing_sign(a0, a1, b0, b1) > 0:
                    new_pts.append(edge_intersection(a0, a1, b0, b1))
        if new_pts:
            self.snapping_needed = True
            for p in new_pts:
                self.input_vertices.append(tuple(p))

    def _choose_initial_sites(self) -> None:
        """Snap-first greedy site selection
        (S2Builder.ChooseInitialSites)."""
        for vid in self._sorted_vertex_ids():
            vertex = self.input_vertices[vid]
            site = self._snap_site(vertex)
            if site != vertex:
                self.snapping_needed = True
            if self.site_snap_radius_ca == 0.0:
                add_site = site not in self._site_set
            else:
                add_site = True
                for other in self.sites:
                    if (
                        _pt_chord2(site, other)
                        <= self.min_site_separation_ca
                    ):
                        add_site = False
                        if site != other:
                            self.snapping_needed = True
            if add_site:
                self.sites.append(site)
                self._site_set.add(site)

    def _collect_site_edges(self) -> None:
        """For each edge, candidate sites within
        edge_site_query_radius sorted by distance to the edge start
        (S2Builder.CollectSiteEdges)."""
        self.edge_sites: list[list[int]] = []
        for e, (i0, i1) in enumerate(self.input_edges):
            v0 = self.input_vertices[i0]
            v1 = self.input_vertices[i1]
            near: list[int] = []
            for sid, s in enumerate(self.sites):
                d2 = edge_distance2(s, v0, v1)
                if d2 <= self.edge_site_query_radius_ca:
                    near.append(sid)
                    if (
                        not self.snapping_needed
                        and d2 < self.min_edge_site_separation_ca
                        and s != v0
                        and s != v1
                    ):
                        self.snapping_needed = True
            # exact comparator, matching the exclusion predicate's
            # d(b, x) < d(c, x) precondition at symbolic ties
            # (S2Builder.SiteIdsComp uses S2Pred.CompareDistances)
            near.sort(key=cmp_to_key(self._site_cmp(v0)))
            self.edge_sites.append(near)

    def _site_cmp(self, v0):
        def cmp(i: int, j: int) -> int:
            r = E.compare_distances(v0, self.sites[i], self.sites[j])
            return r if r != 0 else (i > j) - (i < j)

        return cmp

    # -- edge snapping --------------------------------------------------

    def _voronoi_exclusion(self, b, c, x, y, frame) -> int:
        """Which of sites b / c is excluded from snapping edge XY
        (S2Pred.GetVoronoiSiteExclusion semantics,
        S2Predicates.cs:315-377,1395-1594): intersect each site's
        Voronoi region with its coverage disc; a site whose
        intersection misses X is excluded.  One interval excludes the
        other iff |rb - ra| > d where ra/rb are the coverage-interval
        semi-widths along the great circle of XY and d is the angle
        between the interval centers.  Requires d(b, x) < d(c, x)
        (candidates arrive sorted by distance to x).  Returns 1 if b
        excluded, 2 if c excluded, 0 if neither."""
        # If b is closer to both endpoints it is closer to every point
        # of X (symbolic perturbation makes this consistent for
        # equidistant sites — the direction-independence guarantee).
        if E.compare_distances(y, b, c) < 0:
            return 2
        e1, e2, n, theta_xy = frame

        def center_and_halfwidth(s):
            sin_perp = E.dot(s, n)
            cos_perp = math.sqrt(max(0.0, 1.0 - sin_perp * sin_perp))
            if cos_perp <= 0.0:
                return None
            cos_w = math.cos(self.edge_snap_radius) / cos_perp
            if cos_w > 1.0:
                return None
            theta = math.atan2(E.dot(s, e2), E.dot(s, e1))
            return theta, math.acos(max(-1.0, cos_w))

        ib = center_and_halfwidth(b)
        ic = center_and_halfwidth(c)
        if ib is None:
            return 1
        if ic is None:
            return 2
        d = ic[0] - ib[0]
        if d < 0:
            # b/c straddle the edge endpoints the long way around
            # (S2Predicates.cs:1536-1569): keep b iff d(b, x) < 90deg,
            # keep c iff d(c, y) < 90deg
            keep_b = _pt_chord2(b, x) < 2.0
            keep_c = _pt_chord2(c, y) < 2.0
            if keep_b and keep_c:
                return 0
            return 1 if not keep_b else 2
        dw = ic[1] - ib[1]
        if dw > d:
            return 1  # c's coverage interval contains b's
        if -dw > d:
            return 2  # b's coverage interval contains c's
        return 0

    def _snap_edge(self, e: int) -> list[int]:
        """Snap input edge e to a chain of site ids
        (S2Builder.SnapEdge)."""
        edge = self.input_edges[e]
        if not self.snapping_needed:
            # vertices were renumbered so vertex id == site id
            return [edge[0], edge[1]]
        x = self.input_vertices[edge[0]]
        y = self.input_vertices[edge[1]]
        frame = _edge_frame(x, y)
        chain: list[int] = []
        for site_id in self.edge_sites[e]:
            c = self.sites[site_id]
            if edge_distance2(c, x, y) > self.edge_snap_radius_ca:
                continue  # a tracked "site to avoid", not snappable
            add_site_c = True
            while chain:
                b_id = chain[-1]
                b = self.sites[b_id]
                bc = _pt_chord2(b, c)
                if bc >= self.max_adjacent_site_separation_ca:
                    break
                result = self._voronoi_exclusion(b, c, x, y, frame)
                if result == 1:  # b excluded by c
                    chain.pop()
                    continue
                if result == 2:  # c excluded by b
                    add_site_c = False
                    break
                # neither excluded alone: check whether the previous
                # site a and c together clip away b via the
                # circumcenter test (S2Builder.cs:1420-1440)
                if len(chain) < 2:
                    break
                a = self.sites[chain[-2]]
                if _pt_chord2(a, c) >= self.max_adjacent_site_separation_ca:
                    break
                xyb = E.sign(x, y, b)
                if E.sign(a, b, c) == xyb:
                    break
                z = _circumcenter(a, b, c)
                if z is None:
                    break
                if E.sign(a, b, c) < 0:
                    z = (-z[0], -z[1], -z[2])
                if E.sign(x, y, z) != xyb:
                    break
                chain.pop()
            if add_site_c:
                chain.append(site_id)
        assert chain, "snapped edge chain must be non-empty"
        return chain

    # -- extra sites ----------------------------------------------------

    def _get_coverage_endpoint(self, p, n):
        """Far endpoint (toward the +n x p direction) of edge coverage
        by site p (port of S2Builder.GetCoverageEndpoint math)."""
        n2 = E.dot(n, n)
        n_dot_p = E.dot(n, p)
        n_x_p = E.cross(n, p)
        n_x_p_x_n = (
            n2 * p[0] - n_dot_p * n[0],
            n2 * p[1] - n_dot_p * n[1],
            n2 * p[2] - n_dot_p * n[2],
        )
        om_scale = math.sqrt(1 - self.edge_snap_radius_sin2)
        om = tuple(om_scale * v for v in n_x_p_x_n)
        mr2 = self.edge_snap_radius_sin2 * n2 - n_dot_p * n_dot_p
        mr_scale = math.sqrt(max(0.0, mr2))
        mr = tuple(mr_scale * v for v in n_x_p)
        return _norm((om[0] + mr[0], om[1] + mr[1], om[2] + mr[2]))

    def _get_separation_site(self, site_to_avoid, v0, v1, edge_id):
        """New site in the coverage gap of input edge `edge_id`, as
        close as possible to site_to_avoid
        (S2Builder.GetSeparationSite)."""
        edge = self.input_edges[edge_id]
        x = self.input_vertices[edge[0]]
        y = self.input_vertices[edge[1]]
        xy_dir = (y[0] - x[0], y[1] - x[1], y[2] - x[2])
        n = robust_cross_prod(x, y)
        new_site = project_to_edge(site_to_avoid, x, y)
        gap_min = self._get_coverage_endpoint(v0, n)
        gap_max = self._get_coverage_endpoint(
            v1, (-n[0], -n[1], -n[2])
        )
        if (
            E.dot(
                (
                    new_site[0] - gap_min[0],
                    new_site[1] - gap_min[1],
                    new_site[2] - gap_min[2],
                ),
                xy_dir,
            )
            < 0
        ):
            new_site = gap_min
        elif (
            E.dot(
                (
                    gap_max[0] - new_site[0],
                    gap_max[1] - new_site[1],
                    gap_max[2] - new_site[2],
                ),
                xy_dir,
            )
            < 0
        ):
            new_site = gap_max
        return self._snap_site(new_site)

    def _add_extra_site(self, new_site, edges_to_resnap: set) -> None:
        """Register a new site and mark nearby edges for re-snapping
        (S2Builder.AddExtraSite)."""
        new_id = len(self.sites)
        self.sites.append(new_site)
        self._site_set.add(new_site)
        for e, (i0, i1) in enumerate(self.input_edges):
            v0 = self.input_vertices[i0]
            v1 = self.input_vertices[i1]
            if (
                edge_distance2(new_site, v0, v1)
                <= self.edge_site_query_radius_ca
            ):
                sites = self.edge_sites[e]
                cmp = self._site_cmp(v0)
                lo = 0
                while lo < len(sites) and cmp(sites[lo], new_id) < 0:
                    lo += 1
                sites.insert(lo, new_id)
                edges_to_resnap.add(e)

    def _maybe_add_extra_sites(
        self, edge_id: int, chain: list[int], edges_to_resnap: set
    ) -> None:
        """Split over-deviating snapped edges and add separation sites
        for too-close non-chain sites (S2Builder.MaybeAddExtraSites)."""
        if not chain:
            return
        edge = self.input_edges[edge_id]
        a0 = self.input_vertices[edge[0]]
        a1 = self.input_vertices[edge[1]]
        nearby = self.edge_sites[edge_id]
        i = 0
        j = 0
        while j < len(nearby):
            sid = nearby[j]
            if sid == chain[i]:
                i += 1
                if i == len(chain):
                    return
                v0 = self.sites[chain[i - 1]]
                v1 = self.sites[chain[i]]
                if (
                    _pt_chord2(v0, v1)
                    >= self.min_edge_length_to_split_ca
                    and not is_edge_b_near_edge_a(
                        a0, a1, v0, v1, self.max_edge_deviation
                    )
                ):
                    # wrap-around / over-deviation: split near the
                    # middle of the snapped edge
                    p0 = project_to_edge(v0, a0, a1)
                    p1 = project_to_edge(v1, a0, a1)
                    mid = _norm(
                        (
                            p0[0] + p1[0],
                            p0[1] + p1[1],
                            p0[2] + p1[2],
                        )
                    )
                    new_site = self._get_separation_site(
                        mid, v0, v1, edge_id
                    )
                    self._add_extra_site(new_site, edges_to_resnap)
                    return
            else:
                if i == 0:
                    j += 1
                    continue
                site_to_avoid = self.sites[sid]
                v0 = self.sites[chain[i - 1]]
                v1 = self.sites[chain[i]]
                add_separation = (
                    sid >= self.num_forced_sites
                    and self.min_edge_site_separation_ca > 0
                    and edge_distance2(site_to_avoid, v0, v1)
                    < self.min_edge_site_separation_ca
                )
                if not add_separation and (
                    sid < self.num_forced_sites
                    or self.check_all_site_crossings
                ):
                    # a snapped edge passing on the WRONG SIDE of a
                    # site to avoid changes the input topology even
                    # when it is not too close; projected onto the
                    # great circle of (a0, a1) this only matters when
                    # the site lies between a0 and a1 and between v0
                    # and v1 (S2Builder.cs:1205-1230)
                    ta0, ta1 = tuple(a0), tuple(a1)
                    ts = tuple(site_to_avoid)
                    add_separation = (
                        E.sign(ta0, ta1, ts)
                        != E.sign(tuple(v0), tuple(v1), ts)
                        and _compare_edge_directions(ta0, ta1, ta0, ts) > 0
                        and _compare_edge_directions(ta0, ta1, ts, ta1) > 0
                        and _compare_edge_directions(
                            ta0, ta1, tuple(v0), ts
                        ) > 0
                        and _compare_edge_directions(
                            ta0, ta1, ts, tuple(v1)
                        ) > 0
                    )
                if add_separation:
                    new_site = self._get_separation_site(
                        site_to_avoid, v0, v1, edge_id
                    )
                    if new_site != site_to_avoid:
                        self._add_extra_site(new_site, edges_to_resnap)
                        # skip remaining sites near this chain edge
                        while (
                            j + 1 < len(nearby)
                            and nearby[j + 1] != chain[i]
                        ):
                            j += 1
            j += 1

    # -- build ----------------------------------------------------------

    def build(self) -> None:
        assert not self._built
        if len(self.input_edges) > self.edge_budget:
            raise ValueError(
                f"S2Builder: {len(self.input_edges)} input edges exceed "
                f"the driver-side budget of {self.edge_budget} (site "
                "lookup is O(sites) per vertex by design — this kernel "
                "is for dim-sized geometry; split the input per group "
                "and snap inside the distributed per-group kernels, or "
                "raise edge_budget explicitly if you accept the cost)"
            )
        self._built = True
        self._site_set: set = set()
        if self.split_crossing_edges:
            self._add_edge_crossings()
        if self.snapping_requested:
            # forced sites first, sorted & deduped
            # (S2Builder.AddForcedSites)
            for p in sorted(set(self.forced)):
                self.sites.append(p)
                self._site_set.add(p)
            self.num_forced_sites = len(self.sites)
            self._choose_initial_sites()
            self._collect_site_edges()
        if not self.snapping_needed:
            # renumber vertices so vertex id == site id
            # (S2Builder.ChooseAllVerticesAsSites)
            order = self._sorted_vertex_ids()
            self.sites = []
            vmap = [0] * len(self.input_vertices)
            for vid in order:
                v = self.input_vertices[vid]
                if not self.sites or self.sites[-1] != v:
                    self.sites.append(v)
                vmap[vid] = len(self.sites) - 1
            self.input_edges = [
                (vmap[a], vmap[b]) for a, b in self.input_edges
            ]
            # the reference also rebinds input_vertices_ = sites_ so
            # that InputVertexId == SiteId afterwards
            # (S2Builder.cs:765); get_snapped_winding_delta relies on
            # input_vertices[va] being valid for renumbered edge ids.
            self.input_vertices = list(self.sites)
            self._chains = [
                [a, b] if a != b else [a] for a, b in self.input_edges
            ]
            return
        # extra-site fixed point (S2Builder.AddExtraSites)
        edges_to_resnap: set[int] = set()
        chains: dict[int, list[int]] = {}
        for e in range(len(self.input_edges)):
            chain = self._snap_edge(e)
            chains[e] = chain
            edges_to_resnap.discard(e)
            self._maybe_add_extra_sites(e, chain, edges_to_resnap)
        while edges_to_resnap:
            batch = sorted(edges_to_resnap)
            edges_to_resnap.clear()
            for e in batch:
                chain = self._snap_edge(e)
                chains[e] = chain
                edges_to_resnap.discard(e)
                self._maybe_add_extra_sites(e, chain, edges_to_resnap)
        self._chains = [chains[e] for e in range(len(self.input_edges))]
        if self.simplify_requested:
            self._simplify_edge_chains()

    # -- edge chain simplification (S2Builder.cs:1674-2757) --------------

    def _simplify_edge_chains(self) -> None:
        """SimplifyEdgeChains: materialize per-layer snapped edges
        (AddSnappedEdges semantics, using the GraphOptions declared at
        start_layer), then jointly simplify chains across all layers
        so shared chains stay consistent, rewriting the per-layer edge
        lists consumed by layer_graph."""
        from .graph import (
            DEGENERATE_DISCARD,
            DEGENERATE_KEEP,
            DIRECTED,
            DUPLICATE_KEEP,
            EMPTY_SET_ID,
            Graph,
            GraphOptions,
            IdSetLexicon as _IdSetLexicon,
            SIBLING_KEEP,
            UNDIRECTED,
        )

        if self.num_layers == 0:
            return
        lexicon = _IdSetLexicon()
        # site_vertices: input vertex ids snapped to each site (edge
        # endpoints only, as in MaybeAddInputVertex)
        site_vertices: list[list[int]] = [[] for _ in self.sites]

        def maybe_add_input_vertex(v, sid):
            lst = site_vertices[sid]
            if not lst or lst[-1] != v:
                lst.append(v)

        layer_edges: list[list[tuple[int, int]]] = [
            [] for _ in range(self.num_layers)
        ]
        layer_ids: list[list[int]] = [[] for _ in range(self.num_layers)]
        for e, (chain, lay) in enumerate(
                zip(self._chains, self.edge_layers)):
            opts = self.layer_options[lay]
            assert opts is not None, (
                "simplify_edge_chains requires graph_options at "
                "start_layer"
            )
            discard_degenerate = (
                opts.degenerate_edges == DEGENERATE_DISCARD
            )
            undirected = opts.edge_type == UNDIRECTED
            sid = lexicon.add([e])
            maybe_add_input_vertex(self.input_edges[e][0], chain[0])
            if len(chain) == 1:
                if discard_degenerate:
                    continue
                pairs = [(chain[0], chain[0])]
            else:
                maybe_add_input_vertex(self.input_edges[e][1], chain[-1])
                pairs = list(zip(chain, chain[1:]))
            for a, b in pairs:
                layer_edges[lay].append((a, b))
                layer_ids[lay].append(sid)
                if undirected:
                    layer_edges[lay].append((b, a))
                    layer_ids[lay].append(EMPTY_SET_ID)
        # merge all layers into one lexicographically-sorted edge list
        # (stable in (layer, position) so per-layer duplicates stay in
        # layer order — MergeLayerEdges)
        order = sorted(
            (
                (lay, k)
                for lay in range(self.num_layers)
                for k in range(len(layer_edges[lay]))
            ),
            key=lambda lk: (layer_edges[lk[0]][lk[1]], lk),
        )
        merged_edges = [layer_edges[lay][k] for lay, k in order]
        merged_ids = [layer_ids[lay][k] for lay, k in order]
        merged_layers = [lay for lay, _ in order]
        graph = Graph(
            GraphOptions(DIRECTED, DEGENERATE_KEEP, DUPLICATE_KEEP,
                         SIBLING_KEEP),
            [tuple(s) for s in self.sites],
            merged_edges,
            merged_ids,
            lexicon,
        )
        # layer_begins: first input edge id of each layer (+ end);
        # input edges are added in layer order
        layer_begins = [0] * (self.num_layers + 1)
        for e, lay in enumerate(self.edge_layers):
            layer_begins[lay + 1] = e + 1
        for k in range(1, self.num_layers + 1):
            layer_begins[k] = max(layer_begins[k], layer_begins[k - 1])
        simp = EdgeChainSimplifier(
            self, graph, merged_layers, site_vertices, layer_begins,
            lexicon, self.num_layers,
        )
        new_layer_edges, new_layer_ids = simp.run()
        self._simplified_layers = {
            lay: (new_layer_edges[lay], new_layer_ids[lay])
            for lay in range(self.num_layers)
        }
        self._input_lexicon = lexicon

    def is_forced(self, site_id: int) -> bool:
        """Forced sites occupy the first ids (AddForcedSites)."""
        return site_id < self.num_forced_sites

    # -- output assembly -------------------------------------------------

    def layer_graph(self, layer: int, options):
        """Build one layer's processed Graph from the snapped edge
        chains (S2Builder.BuildLayerEdges + AddSnappedEdges,
        S2Builder.cs:1597-1671): chains become consecutive site-id
        edges (a length-1 chain is a degenerate edge unless the layer
        discards degeneracies); UNDIRECTED layers double each edge
        with a reverse carrying no input ids; then Graph.ProcessEdges
        applies the layer's GraphOptions."""
        assert self._built
        from dataclasses import replace as _dc_replace

        from .graph import (
            DEGENERATE_DISCARD,
            EMPTY_SET_ID,
            Graph,
            GraphError,
            IdSetLexicon as _IdSetLexicon,
            UNDIRECTED,
            process_edges,
        )

        opts = _dc_replace(options)  # process_edges mutates edge_type
        if (self._simplified_layers is not None
                and layer in self._simplified_layers):
            # simplified layer edges (already degenerate-filtered and
            # direction-doubled per the layer options declared at
            # start_layer); the shared lexicon holds the merged id sets
            s_edges, s_ids = self._simplified_layers[layer]
            new_edges, new_ids, error = process_edges(
                opts, list(s_edges), list(s_ids), self._input_lexicon)
            if error is not None:
                raise GraphError(error)
            return Graph(
                opts,
                [tuple(s) for s in self.sites],
                new_edges,
                new_ids,
                self._input_lexicon,
                label_set_ids=self.edge_label_ids,
                label_lexicon=self.label_lexicon,
            )
        discard_degenerate = (
            options.degenerate_edges == DEGENERATE_DISCARD
        )
        undirected = options.edge_type == UNDIRECTED
        lexicon = _IdSetLexicon()
        edges: list[tuple[int, int]] = []
        input_ids: list[int] = []

        def add_snapped(src, dst, sid):
            edges.append((src, dst))
            input_ids.append(sid)
            if undirected:
                # auto-created reverse edges carry no input edge ids
                edges.append((dst, src))
                input_ids.append(EMPTY_SET_ID)

        for e, (chain, lay) in enumerate(
                zip(self._chains, self.edge_layers)):
            if lay != layer:
                continue
            sid = lexicon.add([e])
            if len(chain) == 1:
                if discard_degenerate:
                    continue
                add_snapped(chain[0], chain[0], sid)
            else:
                for a, b in zip(chain, chain[1:]):
                    add_snapped(a, b, sid)
        new_edges, new_ids, error = process_edges(
            opts, edges, input_ids, lexicon)
        if error is not None:
            raise GraphError(error)
        return Graph(
            opts,
            [tuple(s) for s in self.sites],
            new_edges,
            new_ids,
            lexicon,
            label_set_ids=self.edge_label_ids,
            label_lexicon=self.label_lexicon,
        )

    def snapped_chains(self, layer: int = 0) -> list[list[tuple]]:
        """Per-input-edge snapped site chains (as points)."""
        assert self._built
        return [
            [self.sites[sid] for sid in chain]
            for chain, lay in zip(self._chains, self.edge_layers)
            if lay == layer
        ]

    def _layer_directed_edges(self, layer: int) -> list[tuple[int, int]]:
        out = []
        for chain, lay in zip(self._chains, self.edge_layers):
            if lay != layer:
                continue
            for a, b in zip(chain, chain[1:]):
                if a != b:
                    out.append((a, b))
        return out

    def layer_polylines(self, layer: int = 0) -> list[list[tuple]]:
        """Snapped polylines: consecutive chains concatenate while they
        connect; degenerate edges drop (S2PolylineLayer semantics with
        duplicate-edge merge)."""
        edges = self._layer_directed_edges(layer)
        seen = set()
        merged = []
        for e in edges:  # DuplicateEdges.MERGE
            if e not in seen:
                seen.add(e)
                merged.append(e)
        lines: list[list[int]] = []
        for a, b in merged:
            if lines and lines[-1][-1] == a:
                lines[-1].append(b)
            else:
                lines.append([a, b])
        return [[self.sites[s] for s in line] for line in lines]

    def layer_loops(
        self, layer: int = 0, *, undirected: bool = False
    ) -> list[np.ndarray]:
        """Snapped loops: degenerate edges discarded, sibling pairs
        cancelled, remaining directed edges stitched into rings
        (S2PolygonLayer's DegenerateEdges.DISCARD +
        SiblingPairs.DISCARD graph options).  With ``undirected`` each
        ring is re-oriented CCW (EdgeType.UNDIRECTED polygon-validity
        normalization) — only valid when no ring is a hole."""
        from .graph import cancel_and_stitch

        edges = self._layer_directed_edges(layer)
        # at fan-out vertices prefer the edge making the sharpest
        # left turn (Graph.GetLeftTurnMap simplified — golden inputs
        # are simple loops)
        ring_ids = cancel_and_stitch(
            edges,
            turn_key=lambda vin, vat, vout: _turn_angle(
                self.sites[vin], self.sites[vat], self.sites[vout]
            ),
        )
        rings = []
        for ring in ring_ids:
            arr = np.asarray([self.sites[s] for s in ring])
            if undirected:
                from . import measures as M

                if M.loop_signed_area(arr) < 0:
                    arr = arr[::-1]
            rings.append(arr)
        return rings


class _InteriorVertexMatcher:
    """Can v0 be an interior vertex of a simplified edge chain
    (S2Builder.cs:2280-2341): adjacent to exactly two vertices across
    all layers, balanced in/out per layer per direction, and no
    degenerate edges in a layer without a non-degenerate one."""

    def __init__(self, v0: int):
        self.v0 = v0
        self.v1 = -1
        self.v2 = -1
        self.n0 = self.n1 = self.n2 = 0
        self.excess_out = 0
        self.too_many = False

    def start_layer(self):
        self.excess_out = self.n0 = self.n1 = self.n2 = 0

    def tally(self, v: int, outgoing: bool):
        self.excess_out += 1 if outgoing else -1
        if v == self.v0:
            self.n0 += 1
        elif self.v1 < 0 or self.v1 == v:
            self.v1 = v
            self.n1 += 1
        elif self.v2 < 0 or self.v2 == v:
            self.v2 = v
            self.n2 += 1
        else:
            self.too_many = True

    def matches(self) -> bool:
        return (
            not self.too_many
            and self.excess_out == 0
            and self.n1 == self.n2
            and (self.n0 == 0 or self.n1 > 0)
        )


class EdgeChainSimplifier:
    """Joint edge-chain simplification over the merged multi-layer
    snapped-edge graph (S2Builder.cs:2167-2757 EdgeChainSimplifier):
    replaces chains of edges through interior vertices by single
    edges, while staying within edge_snap_radius of every input vertex
    that snapped to a chain vertex (TargetInputVertices) and keeping
    min_edge_vertex_separation from all nearby sites on the correct
    side (AvoidSites + PolylineSimplifier windows)."""

    def __init__(self, builder, g, edge_layers, site_vertices,
                 layer_begins, lexicon, num_layers):
        from .graph import _VertexMaps

        self.builder = builder
        self.g = g
        self.edge_layers = edge_layers
        self.site_vertices = site_vertices
        self.layer_begins = layer_begins
        self.lexicon = lexicon
        self.num_layers = num_layers
        self.maps = _VertexMaps(g)
        self.is_interior = [False] * g.num_vertices
        self.used = [False] * g.num_edges
        self.new_edges: list[tuple[int, int]] = []
        self.new_input_ids: list[int] = []
        self.new_layers: list[int] = []

    # -- graph access -----------------------------------------------

    def _out_edge_range(self, v0: int, v1: int):
        """Graph edge ids equal to (v0, v1) (VertexOutMap.EdgeIds);
        edges are lexicographically sorted."""
        import bisect

        lo = self.maps.out_begins[v0]
        hi = self.maps.out_begins[v0 + 1]
        edges = self.g.edges
        return range(
            bisect.bisect_left(edges, (v0, v1), lo, hi),
            bisect.bisect_right(edges, (v0, v1), lo, hi),
        )

    # -- driver -------------------------------------------------------

    def run(self):
        g = self.g
        for v in range(g.num_vertices):
            self.is_interior[v] = self._vertex_is_interior(v)
        # chains starting from non-interior vertices (all but loops)
        for e in range(g.num_edges):
            if self.used[e]:
                continue
            src, dst = g.edges[e]
            if self.is_interior[src]:
                continue
            if not self.is_interior[dst]:
                self._output_edge(e)
            else:
                self._simplify_chain(src, dst)
        # remaining edges form loops of interior vertices
        for e in range(g.num_edges):
            if self.used[e]:
                continue
            src, dst = g.edges[e]
            if src == dst:
                self._output_edge(e)
            else:
                self._simplify_chain(src, dst)
        layer_edges = [[] for _ in range(self.num_layers)]
        layer_ids = [[] for _ in range(self.num_layers)]
        for k, edge in enumerate(self.new_edges):
            lay = self.new_layers[k]
            layer_edges[lay].append(edge)
            layer_ids[lay].append(self.new_input_ids[k])
        return layer_edges, layer_ids

    def _output_edge(self, e: int):
        self.new_edges.append(self.g.edges[e])
        self.new_input_ids.append(self.g.input_id_set_ids[e])
        self.new_layers.append(self.edge_layers[e])
        self.used[e] = True

    def _input_edge_layer(self, input_id: int) -> int:
        import bisect

        return bisect.bisect_right(self.layer_begins, input_id) - 1

    def _vertex_is_interior(self, v: int) -> bool:
        if self.maps.out_degree(v) == 0:
            return False
        if self.maps.out_degree(v) != self.maps.in_degree(v):
            return False
        if self.builder.is_forced(v):
            return False
        edges = list(self.maps.out_edge_ids(v)) + list(
            self.maps.in_edge_ids_of(v))
        edges.sort(key=lambda e: self.edge_layers[e])
        matcher = _InteriorVertexMatcher(v)
        k = 0
        while k < len(edges):
            layer = self.edge_layers[edges[k]]
            matcher.start_layer()
            while k < len(edges) and self.edge_layers[edges[k]] == layer:
                src, dst = self.g.edges[edges[k]]
                if src == v:
                    matcher.tally(dst, True)
                if dst == v:
                    matcher.tally(src, False)
                k += 1
            if not matcher.matches():
                return False
        return True

    def _follow_chain(self, v0: int, v1: int) -> int:
        assert self.is_interior[v1]
        for e in self.maps.out_edge_ids(v1):
            v = self.g.edges[e][1]
            if v != v0 and v != v1:
                return v
        raise AssertionError("could not find next edge in edge chain")

    def _output_all_edges(self, v0: int, v1: int):
        for e in self._out_edge_range(v0, v1):
            self._output_edge(e)
        for e in self._out_edge_range(v1, v0):
            self._output_edge(e)

    def _target_input_vertices(self, v: int, simplifier) -> bool:
        for i in self.site_vertices[v]:
            if not simplifier.target_disc(
                self.builder.input_vertices[i],
                self.builder.edge_snap_radius_ca,
            ):
                return False
        return True

    def _avoid_sites(self, v0, v1, v2, used_vertices, simplifier) -> bool:
        """Restrict the simplifier so all sites near edge (v1, v2) are
        avoided by min_edge_vertex_separation; chains must move
        monotonically away from v0 (S2Builder.cs:2490-2567)."""
        verts = self.g.vertices
        p0, p1, p2 = verts[v0], verts[v1], verts[v2]
        r1 = _pt_chord2(p0, p1)
        r2 = _pt_chord2(p0, p2)
        if r2 < r1:
            return False
        if r2 >= self.builder.min_edge_length_to_split_ca:
            return False
        # choose the input edge that snapped to (v1,v2)/(v2,v1) with
        # the shortest nearby-site list
        best = -1
        edge_sites = self.builder.edge_sites
        for e in self._out_edge_range(v1, v2):
            for iid in self.g.input_edge_ids(e):
                if best < 0 or len(edge_sites[iid]) < len(edge_sites[best]):
                    best = iid
        for e in self._out_edge_range(v2, v1):
            for iid in self.g.input_edge_ids(e):
                if best < 0 or len(edge_sites[iid]) < len(edge_sites[best]):
                    best = iid
        assert best >= 0
        for v in edge_sites[best]:
            p = verts[v]
            if _pt_chord2(p0, p) >= r2:
                continue
            if v in used_vertices:
                continue
            used_vertices.add(v)
            if v1 == v0:
                disc_on_left = E.sign(p1, p2, p) > 0
            else:
                disc_on_left = E.ordered_ccw(p0, p2, p, p1)
            if not simplifier.avoid_disc(
                p, self.builder.min_edge_site_separation_ca, disc_on_left
            ):
                return False
        return True

    def _simplify_chain(self, v0: int, v1: int):
        from .simplifier import PolylineSimplifier

        verts = self.g.vertices
        vstart = v0
        done = False
        while not done:
            chain = [v0]
            used_vertices = {v0}
            simplifier = PolylineSimplifier(verts[v0])
            simplify = self._avoid_sites(
                v0, v0, v1, used_vertices, simplifier)
            while True:
                chain.append(v1)
                used_vertices.add(v1)
                done = (not self.is_interior[v1]) or v1 == vstart
                if done:
                    break
                vprev, v0 = v0, v1
                v1 = self._follow_chain(vprev, v0)
                if not (
                    simplify
                    and self._target_input_vertices(v0, simplifier)
                    and self._avoid_sites(
                        chain[0], v0, v1, used_vertices, simplifier)
                    and simplifier.extend(verts[v1])
                ):
                    break
            if len(chain) == 2:
                self._output_all_edges(chain[0], chain[1])
            else:
                self._merge_chain(chain)

    def _merge_chain(self, vertices: list[int]):
        """Replace each parallel copy of the chain (either direction,
        any layer) by a single edge (S2Builder.cs:2574-2659)."""
        merged_input_ids: list[list[int]] = []
        degenerate_ids: list[int] = []
        for i in range(1, len(vertices)):
            v0, v1 = vertices[i - 1], vertices[i]
            out_edges = list(self._out_edge_range(v0, v1))
            in_edges = list(self._out_edge_range(v1, v0))
            if i == 1:
                merged_input_ids = [
                    [] for _ in range(len(out_edges) + len(in_edges))
                ]
            else:
                # degenerate edges at interior vertices get assigned to
                # one of the output edges below
                for e in self._out_edge_range(v0, v0):
                    degenerate_ids.extend(self.g.input_edge_ids(e))
                    self.used[e] = True
            j = 0
            for e in out_edges:
                merged_input_ids[j].extend(self.g.input_edge_ids(e))
                self.used[e] = True
                j += 1
            for e in in_edges:
                merged_input_ids[j].extend(self.g.input_edge_ids(e))
                self.used[e] = True
                j += 1
            assert j == len(merged_input_ids)
        if degenerate_ids:
            degenerate_ids.sort()
            self._assign_degenerate_edges(
                degenerate_ids, merged_input_ids)
        v0, v1, vb = vertices[0], vertices[1], vertices[-1]
        for e in self._out_edge_range(v0, v1):
            self.new_edges.append((v0, vb))
            self.new_layers.append(self.edge_layers[e])
        for e in self._out_edge_range(v1, v0):
            self.new_edges.append((vb, v0))
            self.new_layers.append(self.edge_layers[e])
        for ids in merged_input_ids:
            self.new_input_ids.append(self.lexicon.add(ids))

    def _assign_degenerate_edges(self, degenerate_ids, merged_ids):
        """Assign interior degenerate edges' input ids to output edges
        in the right layer, preferring the edge whose input-id range
        surrounds them (S2Builder.cs:2664-2714)."""
        import bisect

        for ids in merged_ids:
            ids.sort()
        order = [i for i in range(len(merged_ids)) if merged_ids[i]]
        order.sort(key=lambda i: merged_ids[i][0])
        firsts = [merged_ids[i][0] for i in order]
        for degenerate_id in degenerate_ids:
            layer = self._input_edge_layer(degenerate_id)
            index = bisect.bisect_right(firsts, degenerate_id)
            if index > 0 and (
                merged_ids[order[index - 1]][0]
                >= self.layer_begins[layer]
            ):
                index -= 1
            assert layer == self._input_edge_layer(
                merged_ids[order[index]][0])
            merged_ids[order[index]].append(degenerate_id)


def _compare_edge_directions(a, b, c, d) -> int:
    """+1 / -1 / 0 as edges AB and CD point in similar / opposite /
    perpendicular directions (S2Pred.CompareEdgeDirections, double
    precision: sign of the dot product of the edge normals)."""
    na = robust_cross_prod(a, b)
    nb = robust_cross_prod(c, d)
    dp = E.dot(na, nb)
    return (dp > 0) - (dp < 0)


def _turn_angle(a, b, c) -> float:
    """CCW turn angle at b coming from a heading to c (smaller =
    sharper left turn), for deterministic fan-out resolution."""
    n = robust_cross_prod(a, b)
    ta = E.cross(n, b)  # forward direction at b
    cb = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    angle = math.atan2(E.dot(cb, n), E.dot(cb, ta))
    return -angle  # most-CCW first


# ---------------------------------------------------------------------------
# Snap-rounded boolean operations
# ---------------------------------------------------------------------------


def snap_loops(
    loops, snap_function: SnapFunction, *, split_crossing_edges: bool = False
) -> list[list[np.ndarray]]:
    """Snap several loops against one shared site set; returns the
    snapped rings per input loop (possibly empty when a loop
    collapses)."""
    b = Builder(
        snap_function, split_crossing_edges=split_crossing_edges
    )
    layers = []
    for lp in loops:
        layers.append(b.start_layer())
        b.add_loop(np.asarray(lp))
    b.build()
    return [b.layer_loops(lay) for lay in layers]


def snapped_loop_boolean(
    a_verts,
    b_verts,
    op: str,
    snap_function: SnapFunction | None = None,
) -> list[np.ndarray]:
    """Boolean combination of two loops with snap rounding: both inputs
    snap to one shared site set (nearly-coincident boundaries become
    exactly coincident, crossings become shared vertices), then the
    arc-walk boolean runs on the snapped arrangement
    (S2BooleanOperation semantics for coincident real-world geometry;
    the general-position path is kernels.boolop.loop_boolean).
    """
    from .boolop import loop_boolean
    from .loop import Loop
    from . import measures as M

    snap_function = snap_function or IdentitySnapFunction(
        INTERSECTION_SNAP_RADIUS
    )
    snapped = snap_loops(
        [a_verts, b_verts], snap_function, split_crossing_edges=True
    )
    a_rings, b_rings = snapped

    def first_ring(rings):
        # a loop may snap to shell + slivers; keep the largest-area
        # ring (golden inputs produce at most one)
        if not rings:
            return None
        return max(rings, key=lambda r: abs(M.loop_signed_area(r)))

    ra, rb = first_ring(a_rings), first_ring(b_rings)
    if ra is not None and M.loop_signed_area(ra) <= 0:
        ra = None  # collapsed to a degenerate sliver
    if rb is not None and M.loop_signed_area(rb) <= 0:
        rb = None
    if ra is None and rb is None:
        return []
    if ra is None:
        return [rb] if op in ("union", "symmetric_difference") else []
    if rb is None:
        if op == "intersection":
            return []
        return [ra]
    if _rings_cyclic_equal(ra, rb):
        # snap rounding canonicalized the two boundaries to the same
        # ring: resolve set-theoretically (identical regions)
        if op in ("union", "intersection"):
            return [ra]
        return []
    return loop_boolean(Loop(ra), Loop(rb), op)


def _rings_cyclic_equal(a: np.ndarray, b: np.ndarray) -> bool:
    if len(a) != len(b):
        return False
    av = [tuple(p) for p in a]
    bv = [tuple(p) for p in b]
    try:
        off = bv.index(av[0])
    except ValueError:
        return False
    n = len(av)
    return all(av[i] == bv[(i + off) % n] for i in range(n))


# ---------------------------------------------------------------------
# GetSnappedWindingDelta (S2BuilderUtil/GetSnappedWindingDelta.cs)
# ---------------------------------------------------------------------

class _EdgeSnap:
    __slots__ = ("v0", "v1", "v_in", "v_out")

    def __init__(self, v0, v1):
        self.v0 = v0      # input edge endpoints (points)
        self.v1 = v1
        self.v_in = -1    # site id of incoming snapped edge, or -1
        self.v_out = -1   # site id of outgoing snapped edge, or -1


def find_first_site(builder: Builder, input_edge_id: int) -> int:
    """Site the source vertex of the given input edge snapped to
    (FindFirstVertexId, GetSnappedWindingDelta.cs:510-546) — trivial
    here because the builder keeps per-edge snapped chains."""
    return builder._chains[input_edge_id][0]


def _edge_winding_delta(a, b, chain) -> int:
    """Signed crossings of AB vs the chain (GetEdgeWindingDelta)."""
    total = 0
    for c, d in zip(chain, chain[1:]):
        total += E.signed_edge_or_vertex_crossing(a, b, c, d)
    return total


def _connector(b0, b1, b1_snapped):
    """Connecting vertex Bc for an edge whose snapped chain bends more
    than 90 degrees (GetSnappedWindingDelta.cs:493-508)."""
    if E.dot(b1_snapped, b1) >= 0:
        return b1
    x = _norm(E.cross(robust_cross_prod(b0, b1), b1_snapped))
    mid = _norm((b0[0] + b1[0], b0[1] + b1[1], b0[2] + b1[2]))
    if E.dot(x, mid) >= 0:
        return tuple(x)
    return (-x[0], -x[1], -x[2])


def get_snapped_winding_delta(
    builder: Builder,
    ref_in,
    ref_v: int,
    input_edge_filter=None,
) -> int:
    """Change in winding number of the reference vertex due to snap
    rounding (GetSnappedWindingDelta.cs:152-386).

    ``ref_in`` is the reference vertex before snapping (must be an
    input vertex); ``ref_v`` the site id it snapped to.  Input edges
    (after ``input_edge_filter(edge_id)`` drops ignored ones) must
    form closed loops.  Adding the result to the winding number of
    ``ref_in`` w.r.t. the input loops gives the winding number of
    site ``ref_v`` w.r.t. the snapped edges — the bridge that lets
    S2WindingOperation semantics survive snap rounding.
    """
    assert builder._built
    ref_in = tuple(map(float, ref_in))
    ref_out = tuple(map(float, builder.sites[ref_v]))

    # Group incident snapped edges by input edge, recording the
    # neighbor sites before/after ref_v in each edge's snapped chain
    # (the v_in/v_out of the reference's EdgeSnap).
    snaps: list[_EdgeSnap] = []
    for e, chain in enumerate(builder._chains):
        if input_edge_filter is not None and input_edge_filter(e):
            continue
        if ref_v not in chain:
            continue
        k = chain.index(ref_v)
        va, vb = builder.input_edges[e]
        snap = _EdgeSnap(
            builder.input_vertices[va], builder.input_vertices[vb]
        )
        if k > 0:
            snap.v_in = chain[k - 1]
        if k + 1 < len(chain):
            snap.v_out = chain[k + 1]
        snaps.append(snap)

    # multimap: input source vertex -> pending edge snaps
    by_v0: dict[tuple, list[_EdgeSnap]] = {}
    for snap in snaps:
        by_v0.setdefault(snap.v0, []).append(snap)

    def take(v0) -> _EdgeSnap | None:
        lst = by_v0.get(v0)
        if not lst:
            return None
        snap = lst.pop(0)
        if not lst:
            del by_v0[v0]
        return snap

    winding_delta = 0
    while by_v0:
        # ---- BuildChain (GetSnappedWindingDelta.cs:408-470) ----
        chain_in: list[tuple] = []
        chain_out: list[tuple] = []
        start = None
        for lst in by_v0.values():
            for snap in lst:
                if snap.v_in >= 0:
                    start = snap
                    break
            if start is not None:
                break
        if start is None:
            start = next(iter(by_v0.values()))[0]
        else:
            chain_out.append(tuple(builder.sites[start.v_in]))
        by_v0[start.v0].remove(start)
        if not by_v0[start.v0]:
            del by_v0[start.v0]
        chain_in.append(start.v0)
        chain_in.append(start.v1)
        chain_out.append(ref_out)
        done = False
        if start.v_out >= 0:
            chain_out.append(tuple(builder.sites[start.v_out]))
            done = True
        while not done and chain_in[-1] != chain_in[0]:
            snap = take(chain_in[-1])
            if snap is None:
                raise ValueError(
                    "input edges (after filtering) do not form loops"
                )
            chain_in.append(snap.v1)
            if snap.v_out >= 0:
                chain_out.append(tuple(builder.sites[snap.v_out]))
                break

        if len(chain_out) == 1:
            # Closed chain entirely inside the Voronoi region of R':
            # winding of R' relative to a point Z 90 degrees away is 0;
            # subtract the winding of R (:257-275).
            assert chain_in[0] == chain_in[-1]
            z = tuple(E.ortho(ref_out))
            winding_delta += 0 - _edge_winding_delta(z, ref_in, chain_in)
        else:
            # Open chain (A0, ..., B1) snapping to (A0', R', B1')
            # (:277-384): reference points Za/Zb are the edge normals
            # pointed away from R'.
            assert len(chain_out) == 3
            assert chain_out[1] == ref_out
            za = _norm(robust_cross_prod(chain_in[0], chain_in[1]))
            zb = _norm(robust_cross_prod(chain_in[-2], chain_in[-1]))
            za = tuple(za)
            zb = tuple(zb)
            if E.dot(za, ref_out) > 0:
                za = (-za[0], -za[1], -za[2])
            if E.dot(zb, ref_out) > 0:
                zb = (-zb[0], -zb[1], -zb[2])
            a0_connector = _connector(
                chain_in[1], chain_in[0], chain_out[0]
            )
            b1_connector = _connector(
                chain_in[-2], chain_in[-1], chain_out[2]
            )
            # winding change of Zb due to A0A1 snapping to A0'R'
            chain_z = [
                chain_out[0], chain_out[1], chain_in[1], chain_in[0],
                a0_connector, chain_out[0],
            ]
            winding_delta += _edge_winding_delta(za, zb, chain_z)
            # winding change of ZbR due to C snapping to C'
            chain_diff = list(chain_out)
            chain_diff.append(b1_connector)
            chain_diff.extend(reversed(chain_in))
            chain_diff.append(a0_connector)
            chain_diff.append(chain_out[0])
            winding_delta += _edge_winding_delta(zb, ref_in, chain_diff)
            # winding change of RR' w.r.t. C' only
            winding_delta += _edge_winding_delta(
                ref_in, ref_out, chain_out
            )
    return winding_delta
