"""S2Builder output layers: assemble a built layer's graph into
polylines, polyline vectors, polygons, and point vectors.

Re-expresses the reference's S2BuilderUtil layer family on top of
``kernels.graph`` + ``kernels.snap.Builder``:

- ``polyline_layer``    — S2BuilderUtil/S2PolylineLayer.cs:21-141
- ``lax_polyline_layer``— S2BuilderUtil/LaxPolylineLayer.cs:33-106
  (same assembly, but degenerate edges are kept, lax-shape style)
- ``polyline_vector_layer`` — S2BuilderUtil/S2PolylineVectorLayer.cs:19-216
- ``polygon_layer``     — S2BuilderUtil/S2PolygonLayer.cs:44-262,
  including the S2Polygon.InitNested loop ordering + the undirected
  loop normalization and the label reordering across inversions
- ``point_vector_layer``— S2BuilderUtil/S2PointVectorLayer.cs:14-59

Labels are returned as sorted tuples per output edge (the reference
returns lexicon ids; the sets are what its tests compare).

Errors follow the repo convention: assembly failures raise
``graph.GraphError`` with an ``S2ErrorCode``-prefixed message;
validation problems are *returned* on the result (S2Builder.Build
returns false + error while still producing output, e.g. the
DuplicateInputEdges polygon test).

Driver-side kernel code: layers run per-geometry on dim-sized inputs
(snapped geometry assembly), never per fact row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import graph as G
from .loop import Loop, find_validation_error, loop_contains_nested
from .textformat import points_to_string


# ---------------------------------------------------------------------
# validation (S2Polyline/S2Polygon.FindValidationError subsets used by
# the layer tests, mapped to the reference's S2ErrorCode names)
# ---------------------------------------------------------------------


def polyline_validation_error(verts) -> str | None:
    """S2Polyline.FindValidationError (S2Polyline.cs): unit-length
    vertices, no identical or antipodal adjacent vertices."""
    verts = np.asarray(verts, dtype=np.float64).reshape(-1, 3)
    norms = np.einsum("ij,ij->i", verts, verts)
    bad = np.flatnonzero(np.abs(norms - 1.0) > 5e-14)
    if len(bad):
        return f"NOT_UNIT_LENGTH: vertex {int(bad[0])} is not unit length"
    for i in range(len(verts) - 1):
        if np.array_equal(verts[i], verts[i + 1]):
            return (
                f"DUPLICATE_VERTICES: vertices {i} and {i + 1} are "
                "identical"
            )
        if np.array_equal(verts[i], -verts[i + 1]):
            return (
                f"ANTIPODAL_VERTICES: vertices {i} and {i + 1} are "
                "antipodal"
            )
    return None


def _loop_error_code(msg: str) -> str:
    """Map kernels.loop.find_validation_error messages onto the
    reference's S2ErrorCode names (S2Loop.FindValidationError)."""
    if "not unit length" in msg:
        return "NOT_UNIT_LENGTH"
    if "at least 3 vertices" in msg:
        return "LOOP_NOT_ENOUGH_VERTICES"
    if "antipodal" in msg:
        return "ANTIPODAL_VERTICES"
    if "duplicate vertex" in msg or "degenerate" in msg:
        return "DUPLICATE_VERTICES"
    return "LOOP_SELF_INTERSECTION"


def polygon_validation_error(loops) -> str | None:
    """Per-loop validity, then pairwise shared edges
    (S2Polygon.FindValidationError: loop errors first, then
    POLYGON_LOOPS_SHARE_EDGE via the index-based edge check)."""
    edge_owner: dict[tuple, int] = {}
    for k, verts in enumerate(loops):
        msg = find_validation_error(verts)
        if msg is not None:
            return f"{_loop_error_code(msg)}: loop {k}: {msg}"
        vt = [tuple(float(x) for x in v) for v in np.asarray(verts)]
        n = len(vt)
        for i in range(n):
            for key in ((vt[i], vt[(i + 1) % n]),
                        (vt[(i + 1) % n], vt[i])):
                other = edge_owner.get(key)
                if other is not None and other != k:
                    return (
                        f"POLYGON_LOOPS_SHARE_EDGE: loops {other} and "
                        f"{k} share an edge"
                    )
        for i in range(n):
            edge_owner[(vt[i], vt[(i + 1) % n])] = k
    return None


# ---------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------


def _chain_vertices(g: G.Graph, edge_polyline) -> list[tuple]:
    verts = [g.vertices[g.edges[edge_polyline[0]][0]]]
    for e in edge_polyline:
        verts.append(g.vertices[g.edges[e][1]])
    return verts


def _fetch_labels(g: G.Graph, edge_type: str, edge_ids):
    fetcher = G.LabelFetcher(g, edge_type)
    return [fetcher.fetch(e) for e in edge_ids]


# ---------------------------------------------------------------------
# polyline layers
# ---------------------------------------------------------------------


@dataclass
class BuiltPolyline:
    vertices: list[tuple]
    labels: list[tuple] | None = None
    error: str | None = None

    def to_debug_string(self) -> str:
        return points_to_string(self.vertices) if self.vertices else ""


def polyline_layer(
    builder,
    layer: int = 0,
    *,
    edge_type: str = G.DIRECTED,
    validate: bool = False,
    with_labels: bool = False,
    keep_degenerate: bool = False,
) -> BuiltPolyline:
    """Assemble one layer into a single unbroken polyline
    (S2PolylineLayer.Build; ``keep_degenerate=True`` gives
    LaxPolylineLayer's graph options).  Raises GraphError
    (BUILDER_EDGES_DO_NOT_FORM_POLYLINE) when more than one walk is
    needed."""
    opts = G.GraphOptions(
        edge_type,
        G.DEGENERATE_KEEP if keep_degenerate else G.DEGENERATE_DISCARD,
        G.DUPLICATE_KEEP,
        G.SIBLING_KEEP,
    )
    g = builder.layer_graph(layer, opts)
    if g.num_edges == 0:
        return BuiltPolyline([], [] if with_labels else None)
    edge_polylines = g.get_polylines(G.POLYLINE_WALK)
    if len(edge_polylines) != 1:
        raise G.GraphError(
            "BUILDER_EDGES_DO_NOT_FORM_POLYLINE: input edges cannot "
            "be assembled into polyline"
        )
    [edge_polyline] = edge_polylines
    vertices = _chain_vertices(g, edge_polyline)
    labels = (
        _fetch_labels(g, edge_type, edge_polyline) if with_labels else None
    )
    error = polyline_validation_error(vertices) if validate else None
    return BuiltPolyline(vertices, labels, error)


def lax_polyline_layer(builder, layer: int = 0, **kwargs) -> BuiltPolyline:
    """LaxPolylineLayer.Build: identical assembly but degenerate
    edges are kept (LaxPolylineLayer.cs:52-56)."""
    return polyline_layer(builder, layer, keep_degenerate=True, **kwargs)


@dataclass
class BuiltPolylineVector:
    polylines: list[list[tuple]]
    labels: list[list[tuple]] | None = None
    error: str | None = None

    def to_debug_string(self) -> str:
        return "; ".join(points_to_string(p) for p in self.polylines)


def polyline_vector_layer(
    builder,
    layer: int = 0,
    *,
    edge_type: str = G.DIRECTED,
    polyline_type: str = G.POLYLINE_PATH,
    duplicate_edges: str = G.DUPLICATE_KEEP,
    sibling_pairs: str = G.SIBLING_KEEP,
    validate: bool = False,
    with_labels: bool = False,
) -> BuiltPolylineVector:
    """S2PolylineVectorLayer.Build: assemble into multiple polylines
    (PATH splits at every branching vertex, WALK maximizes length)."""
    assert sibling_pairs in (G.SIBLING_KEEP, G.SIBLING_DISCARD)
    opts = G.GraphOptions(
        edge_type, G.DEGENERATE_DISCARD, duplicate_edges, sibling_pairs
    )
    g = builder.layer_graph(layer, opts)
    polylines: list[list[tuple]] = []
    labels: list[list[tuple]] | None = [] if with_labels else None
    error: str | None = None
    for edge_polyline in g.get_polylines(polyline_type):
        vertices = _chain_vertices(g, edge_polyline)
        if validate and error is None:
            error = polyline_validation_error(vertices)
        polylines.append(vertices)
        if with_labels:
            labels.append(_fetch_labels(g, edge_type, edge_polyline))
    return BuiltPolylineVector(polylines, labels, error)


# ---------------------------------------------------------------------
# point vector layer
# ---------------------------------------------------------------------


@dataclass
class BuiltPointVector:
    points: list[tuple]
    labels: list[tuple] | None = None
    error: str | None = None


def point_vector_layer(
    builder,
    layer: int = 0,
    *,
    duplicate_edges: str = G.DUPLICATE_MERGE,
    with_labels: bool = False,
) -> BuiltPointVector:
    """S2PointVectorLayer.Build: collect degenerate edges as points;
    non-degenerate edges set INVALID_ARGUMENT but the degenerate ones
    are still returned (S2PointVectorLayer.cs:32-53)."""
    opts = G.GraphOptions(
        G.DIRECTED, G.DEGENERATE_KEEP, duplicate_edges, G.SIBLING_KEEP
    )
    g = builder.layer_graph(layer, opts)
    fetcher = G.LabelFetcher(g, G.DIRECTED) if with_labels else None
    points: list[tuple] = []
    labels: list[tuple] | None = [] if with_labels else None
    error: str | None = None
    for e in range(g.num_edges):
        src, dst = g.edges[e]
        if src != dst:
            error = "INVALID_ARGUMENT: Found non-degenerate edges"
            continue
        points.append(g.vertices[src])
        if with_labels:
            labels.append(fetcher.fetch(e))
    return BuiltPointVector(points, labels, error)


# ---------------------------------------------------------------------
# polygon layer
# ---------------------------------------------------------------------


def loop_is_normalized(verts) -> bool:
    """S2Loop.IsNormalized: the loop encloses at most half the sphere
    (curvature >= 0, with the reference's slop)."""
    from .measures import loop_curvature

    return loop_curvature(np.asarray(verts)) >= -1e-14 * len(verts)


def init_nested(loops) -> tuple[list[int], list[int]]:
    """S2Polygon.InitNested loop ordering: insert each loop into the
    nesting tree (S2Polygon.InsertLoop), then emit loops in preorder
    with their depths (S2Polygon.InitLoops).  Returns (order, depths)
    where ``order`` holds original indices."""
    n = len(loops)
    if n <= 1:
        return list(range(n)), [0] * n
    objs = [Loop(np.asarray(lv)) for lv in loops]
    bounds = [o.get_rect_bound() for o in objs]
    # slightly-expanded bound stands in for the reference's subregion
    # bound prefilter (S2Loop.ContainsNested first checks
    # subregion_bound.Contains(b.bound)); semantic for inverted loops,
    # whose full bound can never fit inside a proper loop's bound
    sub_bounds = [b.expanded_latlng(1e-15, 1e-15) for b in bounds]

    def contains_nested(a: int, b: int) -> bool:
        return sub_bounds[a].contains_rect(bounds[b]) and (
            loop_contains_nested(objs[a], objs[b])
        )

    children: dict[int | None, list[int]] = {None: []}
    for i in range(n):
        parent: int | None = None
        while True:
            for c in children.get(parent, []):
                if contains_nested(c, i):
                    parent = c
                    break
            else:
                break
        kids = children.setdefault(parent, [])
        mine = children.setdefault(i, [])
        remaining = []
        for c in kids:
            if contains_nested(i, c):
                mine.append(c)
            else:
                remaining.append(c)
        remaining.append(i)
        children[parent] = remaining
    order: list[int] = []
    depths: list[int] = []
    stack: list[tuple[int, int]] = [
        (c, 0) for c in reversed(children[None])
    ]
    while stack:
        i, d = stack.pop()
        order.append(i)
        depths.append(d)
        for c in reversed(children.get(i, [])):
            stack.append((c, d + 1))
    return order, depths


@dataclass
class BuiltPolygon:
    loops: list[np.ndarray]
    depths: list[int] = field(default_factory=list)
    is_full: bool = False
    labels: list[list[tuple]] | None = None
    error: str | None = None

    def to_debug_string(self) -> str:
        if self.is_full:
            return "full"
        if not self.loops:
            return "empty"
        return "; ".join(points_to_string(lv) for lv in self.loops)


def make_nested_polygon(loop_vertex_lists) -> BuiltPolygon:
    """Loops (vertex arrays, arbitrary order) -> InitNested-ordered
    polygon; the layer tests' MakePolygonOrDie normalization."""
    loops = [np.asarray(lv, dtype=np.float64) for lv in loop_vertex_lists]
    order, depths = init_nested(loops)
    return BuiltPolygon([loops[i] for i in order], depths)


def polygon_layer(
    builder,
    layer: int = 0,
    *,
    edge_type: str = G.DIRECTED,
    validate: bool = False,
    with_labels: bool = False,
) -> BuiltPolygon:
    """S2PolygonLayer.Build: sibling pairs removed, loops assembled
    (directed: left-turn SIMPLE loops; undirected: complement 0 of
    each component, then each loop normalized), then S2Polygon
    InitNested ordering.  Label rows are reordered/reversed to track
    loop reordering and inversion (S2PolygonLayer.ReorderEdgeLabels)."""
    opts = G.GraphOptions(
        edge_type, G.DEGENERATE_DISCARD, G.DUPLICATE_KEEP,
        G.SIBLING_DISCARD,
    )
    g = builder.layer_graph(layer, opts)
    if g.num_edges == 0:
        full = builder.is_full_polygon()
        return BuiltPolygon(
            [], [], is_full=full, labels=[] if with_labels else None
        )
    if edge_type == G.DIRECTED:
        edge_loops = g.get_directed_loops(G.LOOP_SIMPLE)
        inverted = [False] * len(edge_loops)
    else:
        edge_loops = [
            el
            for comp in g.get_undirected_components(G.LOOP_SIMPLE)
            for el in comp[0]
        ]
        inverted = [False] * len(edge_loops)
    loops = [
        np.asarray([g.vertices[g.edges[e][0]] for e in el])
        for el in edge_loops
    ]
    label_rows = (
        [_fetch_labels(g, edge_type, el) for el in edge_loops]
        if with_labels
        else None
    )
    if edge_type == G.UNDIRECTED:
        # normalize each loop to enclose at most half the sphere
        # (S2PolygonLayer.Build undirected path); S2Loop.Invert
        # reverses the vertex order, leaving the last edge unchanged
        for i, lv in enumerate(loops):
            if not loop_is_normalized(lv):
                loops[i] = lv[::-1].copy()
                inverted[i] = True
    order, depths = init_nested(loops)
    out_loops = [loops[i] for i in order]
    out_labels = None
    if with_labels:
        out_labels = []
        for i in order:
            row = label_rows[i]
            if inverted[i]:
                row = row[-2::-1] + [row[-1]] if row else row
            out_labels.append(list(row))
    error = polygon_validation_error(out_loops) if validate else None
    return BuiltPolygon(out_loops, depths, False, out_labels, error)


# ---------------------------------------------------------------------
# S2Polygon.InitOriented (S2Polygon.cs:228-321): loops given with the
# polygon interior on the LEFT of every loop (CCW shells, CW holes) are
# normalized, nested, and the polygon inverted if needed so that the
# origin-adjacency of the input is preserved.  No reference goldens
# exist for this path (its tests go through InitNested equivalences),
# so the contract here is property-based: region equality with the
# explicitly-nested construction, and the inconsistent-orientation
# detection.  One documented deviation: after a whole-polygon
# inversion we re-derive the canonical order with init_nested rather
# than replaying the reference's loops-vector rebuild, so loop ORDER
# may differ; region, depths and the error flag agree.
# ---------------------------------------------------------------------

_CURVATURE_MAX_ERROR_PER_VERTEX = 11.25 * 2.220446049250313e-16


def init_oriented(loop_vertex_lists) -> "BuiltPolygon":
    """Orientation-driven polygon construction (S2Polygon.InitOriented).

    Returns a BuiltPolygon in nesting preorder; ``error`` is set to
    'POLYGON_INCONSISTENT_LOOP_ORIENTATIONS' when no interior-on-left
    assignment exists for the given loops."""
    from . import measures as M

    loops = [np.asarray(lv, dtype=np.float64) for lv in loop_vertex_lists]
    n = len(loops)
    contained_origin = [False] * n
    for i in range(n):
        contained_origin[i] = bool(Loop(loops[i]).origin_inside)
        angle = M.loop_curvature(loops[i])
        if abs(angle) > _CURVATURE_MAX_ERROR_PER_VERTEX * len(loops[i]):
            if angle < 0:
                loops[i] = loops[i][::-1].copy()  # S2Loop.Invert
        else:
            if contained_origin[i]:
                loops[i] = loops[i][::-1].copy()

    def build(ls):
        order, depths = init_nested(ls)
        return [ls[i] for i in order], depths, order

    ordered, depths, order = build(loops)
    if n > 0:
        objs = [Loop(lv) for lv in ordered]
        polygon_contains_origin = False
        origin_pos = 0  # position in preorder; loop(0) default
        for p in range(len(ordered)):
            if objs[p].origin_inside:
                polygon_contains_origin ^= True
                origin_pos = p
        origin_orig_idx = order[origin_pos]
        if contained_origin[origin_orig_idx] != polygon_contains_origin:
            # Invert the polygon: invert the top-level shell with the
            # smallest curvature (largest area), then re-derive nesting
            # (S2Polygon.Invert)
            tops = [p for p in range(len(ordered)) if depths[p] == 0]
            best = min(
                tops,
                key=lambda p: (
                    M.loop_curvature(ordered[p]),
                    len(ordered[p]),
                    ordered[p].tobytes(),
                ),
            )
            loops = list(ordered)
            loops[best] = loops[best][::-1].copy()
            # remember origin containment against the new loop list:
            # the original flags travel with the loops via `order`
            reorder = [contained_origin[i] for i in order]
            contained_origin = reorder
            ordered, depths, order = build(loops)
            contained_origin = [contained_origin[i] for i in order]
        else:
            contained_origin = [contained_origin[i] for i in order]
    error = None
    for p in range(len(ordered)):
        is_hole = depths[p] % 2 == 1
        now_contains = bool(Loop(ordered[p]).origin_inside)
        # C#'s chained != is left-assoc ((a != b) != c), i.e. a^b^c:
        # a loop must have been inverted (orig^now) exactly when it
        # ended up a hole
        if contained_origin[p] ^ now_contains ^ is_hole:
            error = "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"
            break
    return BuiltPolygon(list(ordered), list(depths), error=error)
