"""Shape nesting: classify a shape's rings into shells and holes
(S2ShapeNestingQuery.cs).

Polygon hierarchy on a sphere is ambiguous (either of two concentric
rings can be "the shell"), so classification is relative to a datum
chain chosen by strategy (default: chain 0).  For every other chain,
the parity of crossings along a geodesic from the datum to the chain —
seeded by whether the segment leaves through the datum's interior
wedge and arrives from the target's interior wedge (OrderedCCW tests)
— determines candidate parents; a transitive-reduction pass leaves
each chain its immediate parent, and even-depth chains detach to
become shells (the even/odd rule).

Driver-side kernel: ring sets are dim-sized geometry.  The reference
finds crossing edges through MutableS2ShapeIndex; here the crossing
scan is brute force over the shape's edges.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import edges as E


@dataclass
class ChainRelation:
    """Nesting relation of one chain (S2ShapeNestingQuery.ChainRelation):
    shells have parent < 0 and may own holes; holes point at their
    parent shell."""

    parent: int = -1
    holes: list[int] = field(default_factory=list)

    def is_shell(self) -> bool:
        return self.parent < 0

    def is_hole(self) -> bool:
        return self.parent >= 0


def _closest_of_n_points(target, verts: np.ndarray, n: int = 4) -> int:
    """Index of the closest of n equally spaced chain vertices
    (S2ShapeNestingQuery.ClosestOfNPoints)."""
    chain_len = len(verts)
    step = max(1, chain_len // n)
    best_idx, best_d2 = 0, float("inf")
    for i in range(n):
        idx = (i * step) % chain_len
        d2 = float(((verts[idx] - target) ** 2).sum())
        if d2 < best_d2:
            best_d2, best_idx = d2, idx
    return best_idx


def shape_nesting(
    chains: list[np.ndarray], datum: int = 0
) -> list[ChainRelation]:
    """Relations for each ring of a 2D shape, 1:1 with `chains`
    (S2ShapeNestingQuery.ComputeShapeNesting; `datum` is the
    datum-shell strategy, default FIRST_CHAIN)."""
    num_chains = len(chains)
    if num_chains == 0:
        return []
    if num_chains == 1:
        return [ChainRelation()]
    vt = [
        [tuple(map(float, v)) for v in np.asarray(c)] for c in chains
    ]
    arrs = [np.asarray(c, dtype=np.float64) for c in chains]

    parents: list[set[int]] = [set() for _ in range(num_chains)]
    children: list[set[int]] = [set() for _ in range(num_chains)]

    d0, d1, d2 = vt[datum][0], vt[datum][1], vt[datum][2]
    start_point = d1

    for chain in range(num_chains):
        if chain == datum:
            continue
        end_idx = _closest_of_n_points(
            np.asarray(start_point), arrs[chain]
        )
        n = len(vt[chain])
        end_point = vt[chain][end_idx]

        # does the segment leave through the datum shell's interior?
        if E.ordered_ccw(d2, end_point, d0, start_point):
            parents[chain].add(datum)
            children[datum].add(chain)
        # ... and arrive from the target chain's interior?
        nxt = vt[chain][(end_idx + 1) % n]
        prv = vt[chain][(end_idx - 1) % n]
        if E.ordered_ccw(nxt, start_point, prv, end_point):
            parents[chain].add(chain)

        # toggle per interior crossing of (start, end) with any edge
        # of the shape (CrossingType.INTERIOR skips the two
        # endpoint-incident edges via crossing_sign == 0 there)
        for other in range(num_chains):
            overts = vt[other]
            m = len(overts)
            for k in range(m):
                if (
                    E.crossing_sign(
                        start_point, end_point, overts[k],
                        overts[(k + 1) % m],
                    )
                    > 0
                ):
                    parents[chain].symmetric_difference_update({other})
                    if other != chain:
                        children[other].symmetric_difference_update(
                            {chain}
                        )

        # final state: the datum is a candidate parent only when both
        # the datum and self bits survived; drop self
        if not (datum in parents[chain] and chain in parents[chain]):
            parents[chain].discard(datum)
        parents[chain].discard(chain)

    # transitive reduction: a chain with exactly one parent P removes
    # P from all its children (S2ShapeNestingQuery.cs:181-226)
    current = 0
    while current < num_chains:
        if len(parents[current]) != 1:
            current += 1
            continue
        (parent_chain,) = parents[current]
        next_chain = current
        for child in sorted(children[current]):
            if parent_chain in parents[child]:
                parents[child].discard(parent_chain)
                if len(parents[child]) == 1 and child < next_chain:
                    next_chain = child
        current = next_chain if next_chain != current else current + 1

    relations = [ChainRelation() for _ in range(num_chains)]
    for chain in range(num_chains):
        assert len(parents[chain]) <= 1
        if parents[chain]:
            (parent,) = parents[chain]
            relations[chain].parent = parent
            relations[parent].holes.append(chain)

    # even/odd rule: even-depth chains detach and become shells
    for chain in range(num_chains):
        depth, cur = -1, chain
        while cur >= 0 and depth < num_chains:
            depth += 1
            cur = relations[cur].parent
        if depth != 0 and depth % 2 == 0:
            old_parent = relations[chain].parent
            relations[chain].parent = -1
            if old_parent >= 0:
                relations[old_parent].holes.remove(chain)
    return relations


# ---------------------------------------------------------------------
# BuildPolygonBoundaries (S2ShapeUtil/BuildPolygonBoundaries.cs:37-140)
# ---------------------------------------------------------------------

def _clean_chain(verts: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices (incl. the wrap pair)."""
    V = np.asarray(verts, dtype=np.float64)
    keep = [0]
    for i in range(1, len(V)):
        if not np.array_equal(V[i], V[keep[-1]]):
            keep.append(i)
    while len(keep) > 1 and np.array_equal(V[keep[-1]], V[keep[0]]):
        keep.pop()
    return V[keep]


def _lax_degenerate(verts: np.ndarray) -> bool:
    """True iff the closed chain has an empty interior: every directed
    edge is cancelled by its reverse (the lax-loop degenerate case,
    e.g. a 2-vertex loop or a back-and-forth spike)."""
    V = _clean_chain(verts)
    n = len(V)
    if n < 3:
        return True
    edges: dict[tuple, int] = {}
    for i in range(n):
        a = tuple(V[i])
        b = tuple(V[(i + 1) % n])
        edges[(a, b)] = edges.get((a, b), 0) + 1
    return all(
        edges.get((b, a), 0) == c for (a, b), c in edges.items()
    )


def _lax_contains(verts: np.ndarray, point) -> bool:
    """Point containment for a lax loop (interior on the left of the
    vertex order; degenerate loops contain nothing) — the brute-force
    twin of S2Shape.ContainsBruteForce for S2LaxLoopShape."""
    if _lax_degenerate(verts):
        return False
    V = _clean_chain(verts)
    p = np.asarray(point, dtype=np.float64)[None, :]
    return bool(E.loop_contains_points(V, p)[0])


def build_polygon_boundaries(components):
    """Group non-crossing loops into polygons whose interiors do not
    intersect (S2ShapeUtil.BuildPolygonBoundaries).

    ``components``: list of connected components, each a list of loop
    vertex arrays; each component must subdivide the sphere (or be a
    single degenerate loop).  Returns faces as lists of (component,
    loop) index pairs: one face per indexed (origin-free) loop
    carrying its child outer loops, plus one face of all depth-0
    outer loops.

    Driver-side: component sets are dim-scale geometry; the
    containment scans are the brute-force S2ContainsPointQuery
    equivalent over the indexed loops.
    """
    if not components:
        return []
    indexed: list[tuple[int, int]] = []   # (component, loop)
    component_of_indexed: list[int] = []
    outer: list[tuple[int, int]] = []     # one per component
    from .edges import ORIGIN

    for ci, comp in enumerate(components):
        before = len(outer)
        for li, verts in enumerate(comp):
            if len(comp) > 1 and not _lax_contains(verts, ORIGIN):
                indexed.append((ci, li))
                component_of_indexed.append(ci)
            else:
                outer.append((ci, li))
        if len(outer) != before + 1:
            raise ValueError(f"component {ci} is not a subdivision")
    # ancestors[i]: indexed loops containing the outer loop of comp i
    ancestors: list[list[int]] = []
    for ci, li in outer:
        v0 = _clean_chain(components[ci][li])[0]
        anc = [
            k
            for k, (cj, lj) in enumerate(indexed)
            if _lax_contains(components[cj][lj], v0)
        ]
        ancestors.append(anc)
    # each outer loop attaches to the ancestor whose component depth is
    # one less; depth-0 outers form the final face
    children: dict[int | None, list[tuple[int, int]]] = {}
    for i, (ci, li) in enumerate(outer):
        ancestor: int | None = None
        depth = len(ancestors[i])
        if depth > 0:
            for k in ancestors[i]:
                if len(ancestors[component_of_indexed[k]]) == depth - 1:
                    ancestor = k
        children.setdefault(ancestor, []).append((ci, li))
    faces = []
    for k, (ci, li) in enumerate(indexed):
        faces.append(children.get(k, []) + [(ci, li)])
    faces.append(children.get(None, []))
    return faces


# ---------------------------------------------------------------------
# FindPolygonDegeneracies (S2BuilderUtil/PolygonDegeneracies.cs:49-453)
# ---------------------------------------------------------------------

def find_polygon_degeneracies(
    vertices, edges, is_full_polygon: bool = False
):
    """Classify each degenerate edge (v -> v) and sibling-pair edge of
    a directed polygon graph as a shell (False) or hole (True).

    ``vertices``: list of points; ``edges``: directed (v0, v1) vertex
    id pairs whose non-degenerate part forms valid polygon boundaries
    (interior on the left).  ``is_full_polygon`` resolves the
    fully-degenerate case (the reference's IsFullPolygon predicate).
    Returns [(edge_index, is_hole)] sorted by edge index.

    Port of DegeneracyFinder: flood-fill connected components from
    each unvisited degeneracy, tracking boundary-crossing parity of
    every traversed edge (CrossingParity over the incident-edge wedge)
    so each degeneracy's side is known relative to the component root;
    root containment comes from S2ContainsVertexQuery at an unbalanced
    vertex, or signed crossings from a vertex of known containment.
    """
    from .wedge import ContainsVertexQuery

    V = [tuple(map(float, v)) for v in vertices]
    n_e = len(edges)
    edge_set = set(edges)
    is_degen = [False] * n_e
    unbalanced = [False] * len(V)
    num_degen = 0
    for e, (a, b) in enumerate(edges):
        if a == b or (b, a) in edge_set:
            is_degen[e] = True
            num_degen += 1
        else:
            unbalanced[a] = True
    if num_degen == 0:
        return []
    if num_degen == n_e:
        return [(e, bool(is_full_polygon)) for e in range(n_e)]

    out_edges: dict[int, list[tuple[int, int]]] = {}
    in_edges: dict[int, list[tuple[int, int]]] = {}
    for e, (a, b) in enumerate(edges):
        out_edges.setdefault(a, []).append((e, b))
        in_edges.setdefault(b, []).append((e, a))

    def contains_vertex_sign(v0: int) -> int:
        q = ContainsVertexQuery(V[v0])
        for _, b in out_edges.get(v0, []):
            q.add_edge(V[b], 1)
        for _, a in in_edges.get(v0, []):
            q.add_edge(V[a], -1)
        return q.contains_sign()

    def crossing_parity(v0: int, v1: int, include_same: bool) -> bool:
        crossings = 0
        p0, p1 = V[v0], V[v1]
        p0_ref = E.ref_dir(p0)
        for _, b in out_edges.get(v0, []):
            if b == v1:
                if include_same:
                    crossings += 1
            elif E.ordered_ccw(p0_ref, V[b], p1, p0):
                crossings += 1
        for _, a in in_edges.get(v0, []):
            if a == v1:
                if include_same:
                    crossings += 1
            elif E.ordered_ccw(p0_ref, V[a], p1, p0):
                crossings += 1
        return (crossings & 1) != 0

    used = [False] * len(V)
    components = []  # (root, root_sign, [(edge, is_hole_rel_root)])
    known_vertex, known_sign = -1, 0
    for e in range(n_e):
        if not is_degen[e]:
            continue
        root = edges[e][0]
        if used[root]:
            continue
        frontier = [(root, True)]
        used[root] = True
        root_sign = 0
        degens: list[tuple[int, bool]] = []
        while frontier:
            v0, v0_same = frontier.pop()
            if root_sign == 0 and unbalanced[v0]:
                s = contains_vertex_sign(v0)
                assert s != 0
                root_sign = s if v0_same else -s
            for ee, v1 in out_edges.get(v0, []):
                same = v0_same ^ crossing_parity(v0, v1, False)
                if is_degen[ee]:
                    degens.append((ee, same))
                if used[v1]:
                    continue
                same ^= crossing_parity(v1, v0, True)
                frontier.append((v1, same))
                used[v1] = True
        if root_sign != 0:
            known_vertex, known_sign = root, root_sign
        components.append([root, root_sign, degens])

    if any(c[1] == 0 for c in components):
        if known_sign == 0:
            known_vertex = next(
                v for v in range(len(V)) if unbalanced[v]
            )
            known_sign = contains_vertex_sign(known_vertex)
        for c in components:
            if c[1] != 0:
                continue
            inside = known_sign > 0
            kp, rp = V[known_vertex], V[c[0]]
            for e, (a, b) in enumerate(edges):
                if is_degen[e]:
                    continue
                inside ^= E.edge_or_vertex_crossing(kp, rp, V[a], V[b])
            c[1] = 1 if inside else -1

    result = []
    for root, root_sign, degens in components:
        assert root_sign != 0
        invert = root_sign < 0
        result.extend((e, h ^ invert) for e, h in degens)
    return sorted(result)


def normalize_closed_set(
    vertices,
    points,
    line_edges,
    poly_edges,
    suppress_lower_dimensions: bool = True,
    is_full_polygon: bool = False,
    merge_duplicates: bool = False,
):
    """ClosedSetNormalizer (S2BuilderUtil/ClosedSetNormalizer.cs):
    convert polygon/polyline degeneracies to lower-dimensional objects
    under the closed model.

    - polygon sibling pairs: holes discarded, shells demoted to
      polyline edges (keeping coincident polyline copies);
    - degenerate polygon edges: holes discarded, shells demoted to
      points (unless the vertex also belongs to a real edge);
    - degenerate polyline edges: demoted to points (same caveat);
    - with ``suppress_lower_dimensions``: polyline edges coinciding
      with polygon edges (either direction) are discarded, and points
      coinciding with any polyline/polygon vertex are discarded.

    Inputs: ``points`` = vertex ids, ``line_edges`` / ``poly_edges`` =
    directed (v0, v1) id pairs over shared ``vertices`` (duplicates
    preserved; ``merge_duplicates`` dedups each output, the
    DuplicateEdges.MERGE analogue).  Returns (points, line_edges,
    poly_edges).
    """
    degens = dict(
        find_polygon_degeneracies(vertices, poly_edges, is_full_polygon)
    )
    suppressed: set[int] = set()
    if suppress_lower_dimensions:
        for a, b in list(line_edges) + list(poly_edges):
            if a != b:
                suppressed.add(a)
                suppressed.add(b)

    out_points: list[int] = []
    out_lines: list[tuple[int, int]] = []
    out_polys: list[tuple[int, int]] = []

    normal_poly: set[tuple[int, int]] = set()
    shell_sibling: set[tuple[int, int]] = set()
    poly_reverse: set[tuple[int, int]] = {(b, a) for a, b in poly_edges}
    for e2, (a, b) in enumerate(poly_edges):
        if e2 not in degens:
            out_polys.append((a, b))
            normal_poly.add((a, b))
        elif not degens[e2]:  # degenerate shell
            if a != b:
                out_lines.append((a, b))
                shell_sibling.add((a, b))
            elif a not in suppressed:
                out_points.append(a)
        # holes: discarded

    for a, b in line_edges:
        if a != b:
            if suppress_lower_dimensions and (a, b) in normal_poly:
                continue  # duplicate of a polygon edge
            if (a, b) in shell_sibling:
                out_lines.append((a, b))  # kept beside the demoted edge
                continue
            if suppress_lower_dimensions and (a, b) in poly_reverse:
                continue  # matches a polygon edge in reverse
            out_lines.append((a, b))
        elif a not in suppressed:
            out_points.append(a)

    for v in points:
        if v not in suppressed:
            out_points.append(v)

    if merge_duplicates:
        out_points = sorted(set(out_points))
        out_lines = sorted(set(out_lines))
        out_polys = sorted(set(out_polys))
    return out_points, out_lines, out_polys


DEGEN_KEEP = "keep"
DEGEN_DISCARD = "discard"
DEGEN_DISCARD_HOLES = "discard_holes"
DEGEN_DISCARD_SHELLS = "discard_shells"


def lax_polygon_layer(
    vertices,
    edges,
    degenerate_boundaries: str = DEGEN_KEEP,
    is_full_polygon: bool = False,
):
    """LaxPolygonLayer-style loop assembly with degenerate-boundary
    control (S2BuilderUtil/LaxPolygonLayer.cs DegenerateBoundaries):
    degenerate edges and sibling pairs are classified as shells or
    holes (find_polygon_degeneracies) and kept or discarded per mode;
    the non-degenerate part assembles into loops.

    Scope: degeneracies are emitted as separate degenerate loops
    (single-vertex or two-vertex); filament degeneracies attached
    inside normal loops are supported only in DISCARD /
    DISCARD_HOLES modes (where they are removed by sibling-pair
    cancellation) — the KEEP-mode inline-filament chain assembly of
    the reference is out of scope.

    Returns (loops, is_full): loops as lists of vertex ids.
    """
    degens = dict(
        find_polygon_degeneracies(vertices, edges, is_full_polygon)
    )
    keep_shells = degenerate_boundaries in (DEGEN_KEEP, DEGEN_DISCARD_HOLES)
    keep_holes = degenerate_boundaries in (DEGEN_KEEP, DEGEN_DISCARD_SHELLS)

    normal_edges = [
        e for i, e in enumerate(edges) if i not in degens
    ]
    kept_degen = [
        edges[i]
        for i, is_hole in degens.items()
        if (keep_holes if is_hole else keep_shells)
    ]
    # assemble degenerate loops: point loops from self-edges, chains
    # from sibling pairs (each unordered pair once)
    degen_loops: list[list[int]] = []
    seen_pairs: set[frozenset] = set()
    for a, b in kept_degen:
        if a == b:
            degen_loops.append([a])
        else:
            key = frozenset((a, b))
            if key not in seen_pairs:
                seen_pairs.add(key)
                degen_loops.append([a, b])

    # cancel sibling pairs within the normal part (filament removal),
    # then stitch the remaining directed edges into loops; LaxPolygon
    # assembly resolves fan-out vertices in input-edge order, so no
    # turn_key (unlike the builder's polygon layer)
    from .graph import cancel_and_stitch

    loops = cancel_and_stitch(normal_edges, drop_self_edges=True)
    return loops + degen_loops, is_full_polygon
