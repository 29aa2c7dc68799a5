"""S2Builder graph machinery: edge processing + chain assembly.

Re-expresses the reference's S2Builder.Graph (S2Builder/Graph.cs):

- ``IdSetLexicon``: compact ids for sets of input-edge ids
  (singleton sets encode as the id itself, like the reference).
- ``process_edges``: the EdgeProcessor merge-join
  (Graph.cs:1248-1479) applying GraphOptions — DegenerateEdges
  KEEP/DISCARD/DISCARD_EXCESS, DuplicateEdges KEEP/MERGE,
  SiblingPairs KEEP/DISCARD/DISCARD_EXCESS/REQUIRE/CREATE — to an
  unsorted edge multiset.
- ``Graph``: left-turn map construction (Graph.cs:312-448), directed
  loop/component assembly (Graph.cs:518-669), undirected two-
  complement components (Graph.cs:707-805), and polyline assembly in
  PATH and WALK modes with filament/loop maximization
  (Graph.cs:1481-1723 PolylineBuilder).
- ``build_graph``: a zero-snap mini-builder that turns vertex chains
  into a processed Graph (vertex ids by first occurrence, undirected
  inputs doubled into sibling pairs whose reverse edge carries no
  input id — S2Builder semantics for EdgeType.UNDIRECTED).

This is driver-side kernel code: in this engine, chain assembly runs
per-geometry inside Arrow batches or on dim-sized snapped geometry
(see operators/measures_op.py), never per-fact-row.

Degenerate edges (v, v) are treated as single-edge loops throughout,
matching the reference's convention (Graph.cs:301-304).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cmp_to_key

import numpy as np

from . import edges as E

# edge types
DIRECTED = "directed"
UNDIRECTED = "undirected"
# DegenerateEdges
DEGENERATE_KEEP = "keep"
DEGENERATE_DISCARD = "discard"
DEGENERATE_DISCARD_EXCESS = "discard_excess"
# DuplicateEdges
DUPLICATE_KEEP = "keep"
DUPLICATE_MERGE = "merge"
# SiblingPairs
SIBLING_KEEP = "keep"
SIBLING_DISCARD = "discard"
SIBLING_DISCARD_EXCESS = "discard_excess"
SIBLING_REQUIRE = "require"
SIBLING_CREATE = "create"
# loop / polyline assembly modes
LOOP_SIMPLE = "simple"
LOOP_CIRCUIT = "circuit"
POLYLINE_PATH = "path"
POLYLINE_WALK = "walk"
# DegenerateBoundaries (GetDirectedComponents)
BOUNDARIES_DISCARD = "discard"
BOUNDARIES_KEEP = "keep"

# Graph.cs:62-66: sentinel for "no input edges snapped to this edge".
NO_INPUT_EDGE_ID = 2**31 - 2
EMPTY_SET_ID = -1


class GraphError(ValueError):
    """BUILDER_* error codes surfaced by graph assembly."""


class IdSetLexicon:
    """Ids for sets of int32 ids (IdSetLexicon.cs): the empty set is
    ``EMPTY_SET_ID``, a singleton {id} is ``id`` itself, and larger
    sets get ids -2, -3, ... indexing an interned sorted-tuple list."""

    def __init__(self):
        self._sets: list[tuple[int, ...]] = []
        self._index: dict[tuple[int, ...], int] = {}

    def add(self, ids) -> int:
        s = tuple(sorted(set(int(i) for i in ids)))
        if not s:
            return EMPTY_SET_ID
        if len(s) == 1:
            return s[0]
        got = self._index.get(s)
        if got is not None:
            return got
        self._sets.append(s)
        sid = -2 - (len(self._sets) - 1)
        self._index[s] = sid
        return sid

    def id_set(self, sid: int) -> tuple[int, ...]:
        if sid == EMPTY_SET_ID:
            return ()
        if sid >= 0:
            return (sid,)
        return self._sets[-2 - sid]


@dataclass
class GraphOptions:
    """S2Builder.GraphOptions (S2Builder/GraphOptions.cs). Note that
    ``process_edges`` mutates ``edge_type`` to DIRECTED when
    sibling_pairs is REQUIRE/CREATE, exactly as the reference does."""

    edge_type: str = DIRECTED
    degenerate_edges: str = DEGENERATE_KEEP
    duplicate_edges: str = DUPLICATE_KEEP
    sibling_pairs: str = SIBLING_KEEP


def _stable_order(edges, key):
    """Edge ids sorted lexicographically by key(edge) with ties broken
    by edge id (Graph.cs:965-974 StableLessThan)."""
    return sorted(range(len(edges)), key=lambda i: (*key(edges[i]), i))


def process_edges(options: GraphOptions, edges, input_ids, lexicon):
    """Graph.ProcessEdges (Graph.cs:870-912 + EdgeProcessor
    :1248-1479): returns (new_edges, new_input_ids); raises
    GraphError for SiblingPairs.REQUIRE violations AFTER producing
    the same output the reference produces alongside the error.

    ``edges``: list of (src, dst) vertex-id pairs.
    ``input_ids``: per-edge set ids into ``lexicon`` (may be shorter
    than ``edges``; missing entries read as the empty set)."""
    n = len(edges)
    input_ids = list(input_ids) + [EMPTY_SET_ID] * (n - len(input_ids))
    out_order = _stable_order(edges, lambda e: e)
    in_order = _stable_order(edges, lambda e: (e[1], e[0]))

    new_edges: list[tuple[int, int]] = []
    new_ids: list[int] = []
    error: str | None = None

    def add(edge, sid, count=1):
        for _ in range(count):
            new_edges.append(edge)
            new_ids.append(sid)

    def copy(out_begin, out_end):
        for i in range(out_begin, out_end):
            add(edges[out_order[i]], input_ids[out_order[i]])

    def merged(out_begin, out_end):
        if out_end - out_begin == 1:
            return input_ids[out_order[out_begin]]
        ids = []
        for i in range(out_begin, out_end):
            ids.extend(lexicon.id_set(input_ids[out_order[i]]))
        return lexicon.add(ids)

    o = i = 0
    while o < n or i < n:
        out_edge = edges[out_order[o]] if o < n else None
        in_edge = (
            (edges[in_order[i]][1], edges[in_order[i]][0]) if i < n else None
        )
        if out_edge is None:
            edge = in_edge
        elif in_edge is None:
            edge = out_edge
        else:
            edge = min(out_edge, in_edge)
        out_begin, in_begin = o, i
        while o < n and edges[out_order[o]] == edge:
            o += 1
        while i < n and (edges[in_order[i]][1], edges[in_order[i]][0]) == edge:
            i += 1
        n_out, n_in = o - out_begin, i - in_begin
        opt = options
        if edge[0] == edge[1]:
            # Degenerate edge (EdgeProcessor.Run, Graph.cs:1300-1347).
            if opt.degenerate_edges == DEGENERATE_DISCARD:
                continue
            if opt.degenerate_edges == DEGENERATE_DISCARD_EXCESS and (
                (out_begin > 0
                 and edges[out_order[out_begin - 1]][0] == edge[0])
                or (o < n and edges[out_order[o]][0] == edge[0])
                or (in_begin > 0
                    and edges[in_order[in_begin - 1]][1] == edge[0])
                or (i < n and edges[in_order[i]][1] == edge[0])
            ):
                continue  # non-degenerate incident edges exist
            merge = (
                opt.duplicate_edges == DUPLICATE_MERGE
                or opt.degenerate_edges == DEGENERATE_DISCARD_EXCESS
            )
            if opt.edge_type == UNDIRECTED and opt.sibling_pairs in (
                SIBLING_REQUIRE, SIBLING_CREATE,
            ):
                add(edge, merged(out_begin, o), 1 if merge else n_out // 2)
            elif merge:
                add(edge, merged(out_begin, o),
                    2 if opt.edge_type == UNDIRECTED else 1)
            elif opt.sibling_pairs in (
                SIBLING_DISCARD, SIBLING_DISCARD_EXCESS,
            ):
                add(edge, merged(out_begin, o), n_out)
            else:
                copy(out_begin, o)
        elif opt.sibling_pairs == SIBLING_KEEP:
            if n_out > 1 and opt.duplicate_edges == DUPLICATE_MERGE:
                add(edge, merged(out_begin, o))
            else:
                copy(out_begin, o)
        elif opt.sibling_pairs == SIBLING_DISCARD:
            if opt.edge_type == DIRECTED:
                if n_out <= n_in:
                    continue
                add(edge, merged(out_begin, o),
                    1 if opt.duplicate_edges == DUPLICATE_MERGE
                    else n_out - n_in)
            else:
                if n_out % 2 == 0:
                    continue
                add(edge, merged(out_begin, o))
        elif opt.sibling_pairs == SIBLING_DISCARD_EXCESS:
            if opt.edge_type == DIRECTED:
                if n_out < n_in:
                    continue
                add(edge, merged(out_begin, o),
                    1 if opt.duplicate_edges == DUPLICATE_MERGE
                    else max(1, n_out - n_in))
            else:
                add(edge, merged(out_begin, o), 1 if n_out % 2 else 2)
        else:  # REQUIRE or CREATE
            if (
                error is None
                and opt.sibling_pairs == SIBLING_REQUIRE
                and (n_out != n_in if opt.edge_type == DIRECTED
                     else n_out % 2 != 0)
            ):
                error = (
                    "BUILDER_MISSING_EXPECTED_SIBLING_EDGES: expected "
                    "all input edges to have siblings"
                )
            if opt.duplicate_edges == DUPLICATE_MERGE:
                add(edge, merged(out_begin, o))
            elif opt.edge_type == UNDIRECTED:
                # convert to directed (half the edges per direction)
                add(edge, merged(out_begin, o), (n_out + 1) // 2)
            else:
                copy(out_begin, o)
                if n_in > n_out:
                    # created sibling edges carry no input ids
                    add(edge, EMPTY_SET_ID, n_in - n_out)
    if options.sibling_pairs in (SIBLING_REQUIRE, SIBLING_CREATE):
        options.edge_type = DIRECTED
    if error is not None:
        return new_edges, new_ids, error
    return new_edges, new_ids, None


class Graph:
    """An assembled edge graph (Graph.cs:29). ``edges`` must be
    lexicographically sorted (process_edges output is)."""

    def __init__(self, options, vertices, edges, input_id_set_ids,
                 lexicon, label_set_ids=None, label_lexicon=None):
        self.options = options
        self.vertices = vertices  # list of unit (x, y, z) tuples
        self.edges = list(edges)
        self.input_id_set_ids = list(input_id_set_ids)
        self.lexicon = lexicon
        # labels attached to INPUT edges (Graph.cs:262-270): indexed by
        # input edge id; missing/short lists read as the empty set
        self.label_set_ids = label_set_ids or []
        self.label_lexicon = label_lexicon
        assert self.edges == sorted(self.edges)

    @property
    def num_edges(self) -> int:
        return len(self.edges)

    @property
    def num_vertices(self) -> int:
        return len(self.vertices)

    # -- orderings (Graph.cs:140-258) ---------------------------------

    def get_in_edge_ids(self):
        return _stable_order(self.edges, lambda e: (e[1], e[0]))

    def make_sibling_map(self, in_edge_ids):
        """Graph.cs:171-198: pair up undirected degenerate edges so
        every edge has a distinct sibling."""
        if self.options.edge_type == DIRECTED:
            return
        if self.options.degenerate_edges == DEGENERATE_DISCARD:
            return
        e = 0
        while e < self.num_edges:
            v = self.edges[e][0]
            if self.edges[e][1] == v:
                in_edge_ids[e] = e + 1
                in_edge_ids[e + 1] = e
                e += 1
            e += 1

    def get_sibling_map(self):
        ids = self.get_in_edge_ids()
        self.make_sibling_map(ids)
        return ids

    def input_edge_ids(self, e: int):
        return self.lexicon.id_set(self.input_id_set_ids[e])

    def labels(self, input_edge_id: int):
        """Labels attached to one INPUT edge (Graph.Labels)."""
        if (self.label_lexicon is None
                or input_edge_id >= len(self.label_set_ids)):
            return ()
        return self.label_lexicon.id_set(self.label_set_ids[input_edge_id])

    def min_input_edge_id(self, e: int) -> int:
        ids = self.input_edge_ids(e)
        return ids[0] if ids else NO_INPUT_EDGE_ID

    def get_min_input_edge_ids(self):
        return [self.min_input_edge_id(e) for e in range(self.num_edges)]

    @staticmethod
    def get_input_edge_order(min_input_ids):
        return sorted(range(len(min_input_ids)),
                      key=lambda e: (min_input_ids[e], e))

    # -- left turn map (Graph.cs:312-448) -----------------------------

    def get_left_turn_map(self, in_edge_ids):
        """Map each edge e=(v0,v1) to the next outgoing edge around v1
        in clockwise order ("left turn"). Returns (map, error)."""
        n = self.num_edges
        left_turn_map = [-1] * n
        if n == 0:
            return left_turn_map, None
        error = None
        edges = self.edges
        SENTINEL = (self.num_vertices, self.num_vertices)

        def out_at(o):
            return edges[o] if o < n else SENTINEL

        def in_at(i):
            if i >= n:
                return SENTINEL
            e = edges[in_edge_ids[i]]
            return (e[1], e[0])

        o = i = 0
        out_edge, in_edge = out_at(0), in_at(0)
        min_edge = min(out_edge, in_edge)
        while min_edge != SENTINEL:
            v0 = min_edge[0]
            v0_edges = []  # (incoming, index, endpoint, rank)
            e_in: list[int] = []
            e_out: list[int] = []
            while min_edge[0] == v0:
                v1 = min_edge[1]
                out_begin, in_begin = o, i
                while out_edge == min_edge:
                    o += 1
                    out_edge = out_at(o)
                while in_edge == min_edge:
                    i += 1
                    in_edge = in_at(i)
                if v0 != v1:
                    _add_vertex_edges(
                        out_begin, o, in_begin, i, v1, v0_edges)
                else:
                    # each degenerate edge is its own loop
                    for j in range(in_begin, i):
                        left_turn_map[in_edge_ids[j]] = in_edge_ids[j]
                min_edge = min(out_edge, in_edge)
            if not v0_edges:
                continue
            # sort edges clockwise around v0, keeping the first edge
            # (whose endpoint is the minimum) fixed as the anchor
            min_endpoint = v0_edges[0][2]
            verts = self.vertices

            def ccw_cmp(a, b):
                # a sorts before b when: equal endpoints -> lower rank;
                # the anchor endpoint group stays at the front; else b
                # is NOT hit before the anchor when sweeping CCW from a
                # (upstream GetLeftTurnMap comparator semantics; the
                # C# port at Graph.cs:1235-1246 negates this, which
                # would U-turn every balanced corner).
                if a[2] == b[2]:
                    return -1 if a[3] < b[3] else 1
                if a[2] == min_endpoint:
                    return -1
                if b[2] == min_endpoint:
                    return 1
                ordered = E.ordered_ccw(
                    verts[a[2]], verts[b[2]], verts[min_endpoint],
                    verts[v0])
                return 1 if ordered else -1

            v0_edges[1:] = sorted(v0_edges[1:], key=cmp_to_key(ccw_cmp))
            # parenthesis-match incoming with outgoing edges
            for incoming, index, _, _ in v0_edges:
                if incoming:
                    e_in.append(in_edge_ids[index])
                elif e_in:
                    left_turn_map[e_in.pop()] = index
                else:
                    e_out.append(index)
            # wrap around circularly
            e_out.reverse()
            while e_out and e_in:
                left_turn_map[e_in.pop()] = e_out.pop()
            if e_in and error is None:
                error = (
                    "BUILDER_EDGES_DO_NOT_FORM_LOOPS: given edges do "
                    "not form loops (indegree != outdegree)"
                )
        return left_turn_map, error

    # -- canonicalization (Graph.cs:454-498) --------------------------

    @staticmethod
    def canonicalize_loop_order(min_input_ids, loop):
        if not loop:
            return
        pos, saw_gap = 0, False
        for k in range(1, len(loop)):
            cmp = min_input_ids[loop[k]] - min_input_ids[loop[pos]]
            if cmp < 0:
                saw_gap = True
            elif cmp > 0 or not saw_gap:
                pos, saw_gap = k, False
        pos += 1
        if pos == len(loop):
            pos = 0
        loop[:] = loop[pos:] + loop[:pos]

    @staticmethod
    def canonicalize_vector_order(min_input_ids, chains):
        chains.sort(key=lambda c: (min_input_ids[c[0]], c[0]))

    # -- loop assembly (Graph.cs:518-805) -----------------------------

    def get_directed_loops(self, loop_type):
        assert self.options.degenerate_edges in (
            DEGENERATE_DISCARD, DEGENERATE_DISCARD_EXCESS)
        assert self.options.edge_type == DIRECTED
        left_turn_map, error = self.get_left_turn_map(
            self.get_in_edge_ids())
        if error:
            raise GraphError(error)
        min_input_ids = self.get_min_input_edge_ids()
        loops: list[list[int]] = []
        path_index = (
            [-1] * self.num_vertices if loop_type == LOOP_SIMPLE else None
        )
        path: list[int] = []
        for start in range(self.num_edges):
            if left_turn_map[start] < 0:
                continue
            e = start
            while left_turn_map[e] >= 0:
                path.append(e)
                nxt = left_turn_map[e]
                left_turn_map[e] = -1
                if loop_type == LOOP_SIMPLE:
                    path_index[self.edges[e][0]] = len(path) - 1
                    loop_start = path_index[self.edges[e][1]]
                    if loop_start >= 0:
                        loop = path[loop_start:]
                        del path[loop_start:]
                        for e2 in loop:
                            path_index[self.edges[e2][0]] = -1
                        self.canonicalize_loop_order(min_input_ids, loop)
                        loops.append(loop)
                e = nxt
            if loop_type != LOOP_SIMPLE:
                self.canonicalize_loop_order(min_input_ids, path)
                loops.append(path[:])
                path.clear()
        self.canonicalize_vector_order(min_input_ids, loops)
        return loops

    def get_directed_components(self, degenerate_boundaries):
        opt = self.options
        assert opt.degenerate_edges == DEGENERATE_DISCARD or (
            opt.degenerate_edges == DEGENERATE_DISCARD_EXCESS
            and degenerate_boundaries == BOUNDARIES_KEEP)
        assert opt.sibling_pairs in (SIBLING_REQUIRE, SIBLING_CREATE)
        assert opt.edge_type == DIRECTED
        sibling_map = self.get_sibling_map()
        left_turn_map, error = self.get_left_turn_map(sibling_map)
        if error:
            raise GraphError(error)
        min_input_ids = self.get_min_input_edge_ids()
        discard = degenerate_boundaries == BOUNDARIES_DISCARD
        path_index = [-1] * self.num_edges if discard else None
        components = []
        frontier: list[int] = []
        for start in range(self.num_edges):
            if left_turn_map[start] < 0:
                continue
            component: list[list[int]] = []
            frontier.append(start)
            while frontier:
                e = frontier.pop()
                if left_turn_map[e] < 0:
                    continue
                path: list[int] = []
                while left_turn_map[e] >= 0:
                    path.append(e)
                    nxt = left_turn_map[e]
                    left_turn_map[e] = -1
                    sibling = sibling_map[e]
                    if left_turn_map[sibling] >= 0:
                        frontier.append(sibling)
                    if discard:
                        path_index[e] = len(path) - 1
                        sibling_index = path_index[sibling]
                        if sibling_index >= 0:
                            if sibling_index == len(path) - 2:
                                # adjacent sibling pair: drop both
                                del path[sibling_index:]
                            else:
                                loop = path[sibling_index + 1:-1]
                                del path[sibling_index:]
                                for e2 in loop:
                                    path_index[e2] = -1
                                self.canonicalize_loop_order(
                                    min_input_ids, loop)
                                component.append(loop)
                    e = nxt
                if discard:
                    for e2 in path:
                        path_index[e2] = -1
                self.canonicalize_loop_order(min_input_ids, path)
                component.append(path)
            self.canonicalize_vector_order(min_input_ids, component)
            components.append(component)
        components.sort(key=lambda c: min_input_ids[c[0][0]])
        return components

    def get_undirected_components(self, loop_type):
        opt = self.options
        assert opt.degenerate_edges in (
            DEGENERATE_DISCARD, DEGENERATE_DISCARD_EXCESS)
        assert opt.edge_type == UNDIRECTED
        sibling_map = self.get_in_edge_ids()
        left_turn_map, error = self.get_left_turn_map(sibling_map)
        if error:
            raise GraphError(error)
        self.make_sibling_map(sibling_map)
        min_input_ids = self.get_min_input_edge_ids()

        def mark_used(slot):
            return -1 - slot

        frontier: list[tuple[int, int]] = []
        path_index = (
            [-1] * self.num_vertices if loop_type == LOOP_SIMPLE else None
        )
        components = []
        for min_start in range(self.num_edges):
            if left_turn_map[min_start] < 0:
                continue
            component = ([], [])
            frontier.append((min_start, 0))
            while frontier:
                start, slot = frontier.pop()
                if left_turn_map[start] < 0:
                    continue
                path: list[int] = []
                e = start
                while left_turn_map[e] >= 0:
                    path.append(e)
                    nxt = left_turn_map[e]
                    left_turn_map[e] = mark_used(slot)
                    sibling = sibling_map[e]
                    if left_turn_map[sibling] >= 0:
                        frontier.append((sibling, 1 - slot))
                    elif left_turn_map[sibling] != mark_used(1 - slot):
                        raise GraphError(
                            "BUILDER_EDGES_DO_NOT_FORM_LOOPS: given "
                            "undirected edges do not form loops")
                    if loop_type == LOOP_SIMPLE:
                        path_index[self.edges[e][0]] = len(path) - 1
                        loop_start = path_index[self.edges[e][1]]
                        if loop_start >= 0:
                            loop = path[loop_start:]
                            del path[loop_start:]
                            for e2 in loop:
                                path_index[self.edges[e2][0]] = -1
                            self.canonicalize_loop_order(
                                min_input_ids, loop)
                            component[slot].append(loop)
                    e = nxt
                if loop_type != LOOP_SIMPLE:
                    self.canonicalize_loop_order(min_input_ids, path)
                    component[slot].append(path[:])
            comp = [component[0], component[1]]
            self.canonicalize_vector_order(min_input_ids, comp[0])
            self.canonicalize_vector_order(min_input_ids, comp[1])
            if (min_input_ids[comp[0][0][0]]
                    > min_input_ids[comp[1][0][0]]):
                comp[0], comp[1] = comp[1], comp[0]
            components.append(comp)
        components.sort(key=lambda c: min_input_ids[c[0][0][0]])
        return components

    def make_subgraph(self, new_options, new_edges, new_input_ids,
                      new_lexicon):
        """Graph.MakeSubgraph (Graph.cs:1005-1041): re-process this
        graph's edges under different options, sharing vertices. A
        directed graph viewed undirected doubles each edge with a
        reverse carrying no input ids."""
        if (self.options.edge_type == DIRECTED
                and new_options.edge_type == UNDIRECTED):
            n = len(new_edges)
            for k in range(n):
                new_edges.append((new_edges[k][1], new_edges[k][0]))
                new_input_ids.append(EMPTY_SET_ID)
        edges2, ids2, error = process_edges(
            new_options, new_edges, new_input_ids, new_lexicon)
        if error is not None:
            raise GraphError(error)
        return Graph(new_options, self.vertices, edges2, ids2,
                     new_lexicon)

    # -- polyline assembly (Graph.cs:827-841, 1481-1723) --------------

    def get_polylines(self, polyline_type):
        assert self.options.sibling_pairs in (
            SIBLING_DISCARD, SIBLING_DISCARD_EXCESS, SIBLING_KEEP)
        builder = _PolylineBuilder(self)
        if polyline_type == POLYLINE_PATH:
            return builder.build_paths()
        return builder.build_walks()


class LabelFetcher:
    """Labels for a given GRAPH edge (Graph.cs:1188-1233): the sorted
    union of labels over every input edge snapped to it, plus — for
    UNDIRECTED — the labels of its sibling edge."""

    def __init__(self, g: Graph, edge_type: str):
        self.g = g
        self.edge_type = edge_type
        self.sibling_map = (
            g.get_sibling_map() if edge_type == UNDIRECTED else None
        )

    def fetch(self, e: int) -> tuple[int, ...]:
        labels: set[int] = set()
        for input_edge_id in self.g.input_edge_ids(e):
            labels.update(self.g.labels(input_edge_id))
        if self.edge_type == UNDIRECTED:
            for input_edge_id in self.g.input_edge_ids(
                    self.sibling_map[e]):
                labels.update(self.g.labels(input_edge_id))
        return tuple(sorted(labels))


def _add_vertex_edges(out_begin, out_end, in_begin, in_end, v1,
                      v0_edges):
    """Rank duplicate out/in edges consistently around both endpoints
    (Graph.cs:428-448): extra incoming first, then interleave, then
    extra outgoing."""
    rank = 0
    while in_end - in_begin > out_end - out_begin:
        in_end -= 1
        v0_edges.append((True, in_end, v1, rank))
        rank += 1
    while in_end > in_begin:
        v0_edges.append((False, out_begin, v1, rank))
        out_begin += 1
        rank += 1
        in_end -= 1
        v0_edges.append((True, in_end, v1, rank))
        rank += 1
    while out_end > out_begin:
        v0_edges.append((False, out_begin, v1, rank))
        out_begin += 1
        rank += 1


class _VertexMaps:
    """Contiguous out-edge ranges per vertex (VertexOutMap) and sorted
    in-edge id ranges per vertex (VertexInMap), Graph.cs:1106-1186."""

    def __init__(self, g: Graph):
        n_v = g.num_vertices
        vs = np.arange(n_v + 1)
        srcs = np.fromiter(
            (e[0] for e in g.edges), dtype=np.int64, count=len(g.edges)
        )
        self.out_begins = np.searchsorted(srcs, vs, side="left").tolist()
        self.in_edge_ids = g.get_in_edge_ids()
        dsts = np.fromiter(
            (g.edges[e][1] for e in self.in_edge_ids),
            dtype=np.int64,
            count=len(self.in_edge_ids),
        )
        self.in_begins = np.searchsorted(dsts, vs, side="left").tolist()

    def out_edge_ids(self, v):
        return range(self.out_begins[v], self.out_begins[v + 1])

    def out_degree(self, v):
        return self.out_begins[v + 1] - self.out_begins[v]

    def in_edge_ids_of(self, v):
        return self.in_edge_ids[self.in_begins[v]:self.in_begins[v + 1]]

    def in_degree(self, v):
        return self.in_begins[v + 1] - self.in_begins[v]


class _PolylineBuilder:
    """Graph.PolylineBuilder (Graph.cs:1481-1723)."""

    def __init__(self, g: Graph):
        self.g = g
        self.maps = _VertexMaps(g)
        self.min_input_ids = g.get_min_input_edge_ids()
        self.directed = g.options.edge_type == DIRECTED
        self.edges_left = g.num_edges // (1 if self.directed else 2)
        self.used = [False] * g.num_edges
        self.excess_used: dict[int, int] = {}
        if not self.directed:
            self.sibling_map = list(self.maps.in_edge_ids)
            g.make_sibling_map(self.sibling_map)
        else:
            self.sibling_map = None

    def _is_interior(self, v):
        if self.directed:
            return (self.maps.in_degree(v) == 1
                    and self.maps.out_degree(v) == 1)
        return self.maps.out_degree(v) == 2

    def _excess_degree(self, v):
        if self.directed:
            return self.maps.out_degree(v) - self.maps.in_degree(v)
        return self.maps.out_degree(v) % 2

    def build_paths(self):
        polylines = []
        edges = Graph.get_input_edge_order(self.min_input_ids)
        for e in edges:
            if not self.used[e] and not self._is_interior(
                    self.g.edges[e][0]):
                polylines.append(self._build_path(e))
        # remaining edges form non-intersecting loops
        for e in edges:
            if self.edges_left == 0:
                break
            if self.used[e]:
                continue
            polyline = self._build_path(e)
            Graph.canonicalize_loop_order(self.min_input_ids, polyline)
            polylines.append(polyline)
        assert self.edges_left == 0
        Graph.canonicalize_vector_order(self.min_input_ids, polylines)
        return polylines

    def build_walks(self):
        polylines = []
        edges = Graph.get_input_edge_order(self.min_input_ids)
        for e in edges:
            if self.used[e]:
                continue
            v = self.g.edges[e][0]
            excess = self._excess_degree(v)
            if excess <= 0:
                continue
            excess -= self.excess_used.get(v, 0)
            if (excess <= 0) if self.directed else (excess % 2 == 0):
                continue
            self.excess_used[v] = self.excess_used.get(v, 0) + 1
            polylines.append(self._build_walk(v))
            end_v = self.g.edges[polylines[-1][-1]][1]
            self.excess_used[end_v] = self.excess_used.get(end_v, 0) - 1
        if self.edges_left > 0:
            for polyline in polylines:
                self._maximize_walk(polyline)
        k = 0
        while k < len(edges) and self.edges_left > 0:
            e = edges[k]
            if self.used[e]:
                k += 1
                continue
            # start a loop only at the head of an edge chain with the
            # minimal input id (idempotency for split input edges)
            v = self.g.edges[e][0]
            eid = self.min_input_ids[e]
            excess = 0
            j = k
            while j < len(edges) and self.min_input_ids[edges[j]] == eid:
                e2 = edges[j]
                if not self.used[e2]:
                    if self.g.edges[e2][0] == v:
                        excess += 1
                    if self.g.edges[e2][1] == v:
                        excess -= 1
                j += 1
            if excess == 1 or self.g.edges[e][1] == v:
                polyline = self._build_walk(v)
                self._maximize_walk(polyline)
                polylines.append(polyline)
            k += 1
        assert self.edges_left == 0
        Graph.canonicalize_vector_order(self.min_input_ids, polylines)
        return polylines

    def _build_path(self, e):
        polyline = []
        start = self.g.edges[e][0]
        while True:
            polyline.append(e)
            self.used[e] = True
            if not self.directed:
                self.used[self.sibling_map[e]] = True
            self.edges_left -= 1
            v = self.g.edges[e][1]
            if not self._is_interior(v) or v == start:
                break
            if self.directed:
                e = self.maps.out_edge_ids(v)[0]
            else:
                for e2 in self.maps.out_edge_ids(v):
                    if not self.used[e2]:
                        e = e2
        return polyline

    def _build_walk(self, v):
        polyline = []
        while True:
            # follow the unused edge with the smallest input edge id
            best_edge, best_out_id = -1, NO_INPUT_EDGE_ID + 1
            for e in self.maps.out_edge_ids(v):
                if self.used[e] or self.min_input_ids[e] >= best_out_id:
                    continue
                best_out_id = self.min_input_ids[e]
                best_edge = e
            if best_edge < 0:
                return polyline
            # stop early if best_edge might continue a different
            # incoming walk (idempotency with shared vertices)
            excess = self._excess_degree(v) - self.excess_used.get(v, 0)
            if (excess < 0) if self.directed else (excess % 2 == 1):
                for e in self.maps.in_edge_ids_of(v):
                    if (not self.used[e]
                            and self.min_input_ids[e] <= best_out_id):
                        return polyline
            polyline.append(best_edge)
            self.used[best_edge] = True
            if not self.directed:
                self.used[self.sibling_map[best_edge]] = True
            self.edges_left -= 1
            v = self.g.edges[best_edge][1]

    def _maximize_walk(self, polyline):
        i = 0
        while i <= len(polyline):
            v = (self.g.edges[polyline[0]][0] if i == 0
                 else self.g.edges[polyline[i - 1]][1])
            for e in self.maps.out_edge_ids(v):
                if not self.used[e]:
                    loop = self._build_walk(v)
                    polyline[i:i] = loop
                    break
            i += 1


def build_graph(chains, options: GraphOptions, lexicon=None):
    """Zero-snap mini-builder: assemble vertex chains into a processed
    Graph (S2Builder.Build with the identity snap function at radius 0,
    which is what the reference's graph tests exercise).

    ``chains``: list of chains; each chain is a sequence of points
    (unit (x, y, z) tuples). Consecutive points become input edges
    numbered sequentially across chains. For UNDIRECTED options each
    input edge adds its reverse with no input edge id.

    Returns the Graph. Raises GraphError if process_edges reports a
    REQUIRE violation."""
    if lexicon is None:
        lexicon = IdSetLexicon()
    vert_ids: dict[tuple, int] = {}
    vertices: list[tuple] = []

    def vid(p):
        p = tuple(float(c) for c in p)
        got = vert_ids.get(p)
        if got is None:
            got = len(vertices)
            vert_ids[p] = got
            vertices.append(p)
        return got

    edges: list[tuple[int, int]] = []
    input_ids: list[int] = []
    next_input = 0
    undirected = options.edge_type == UNDIRECTED
    for chain in chains:
        ids = [vid(p) for p in chain]
        for a, b in zip(ids, ids[1:]):
            edges.append((a, b))
            input_ids.append(lexicon.add([next_input]))
            next_input += 1
            if undirected:
                edges.append((b, a))
                input_ids.append(EMPTY_SET_ID)
    new_edges, new_ids, error = process_edges(
        options, edges, input_ids, lexicon)
    if error is not None:
        raise GraphError(error)
    return Graph(options, vertices, new_edges, new_ids, lexicon)


# ---------------------------------------------------------------------
# Assembly-mode dispatch (shared by the distributed operator and the
# driver-side oracle; see operators/measures_op.graph_assembly_rows)
# ---------------------------------------------------------------------

ASSEMBLY_MODES = ("loops", "components", "undirected", "paths", "walks")


def assembly_options(mode: str) -> GraphOptions:
    """Fresh GraphOptions for one assembly mode (fresh because
    process_edges normalizes options in place, Graph.cs:1272-1278)."""
    if mode == "loops":
        return GraphOptions(DIRECTED, DEGENERATE_DISCARD_EXCESS,
                            DUPLICATE_KEEP, SIBLING_KEEP)
    if mode == "components":
        return GraphOptions(DIRECTED, DEGENERATE_DISCARD_EXCESS,
                            DUPLICATE_KEEP, SIBLING_CREATE)
    if mode == "undirected":
        return GraphOptions(UNDIRECTED, DEGENERATE_DISCARD_EXCESS,
                            DUPLICATE_KEEP, SIBLING_DISCARD_EXCESS)
    if mode in (POLYLINE_PATH, POLYLINE_WALK, "paths", "walks"):
        return GraphOptions(UNDIRECTED, DEGENERATE_KEEP,
                            DUPLICATE_KEEP, SIBLING_KEEP)
    raise ValueError(f"unknown assembly mode {mode}")


def _loop_sig(g: Graph, loop) -> str:
    return "-".join(str(g.edges[e][0]) for e in loop)


def _path_sig(g: Graph, path) -> str:
    verts = [g.edges[e][0] for e in path] + [g.edges[path[-1]][1]]
    return "-".join(str(v) for v in verts)


def assemble_chains(mode: str, chains) -> list[tuple[str, int]]:
    """Run one edge-soup case through process_edges + the mode's
    assembly pass; returns canonical (chain_sig, n_edges) rows.

    Signatures use graph vertex ids (first occurrence across ``chains``),
    so the result is deterministic for a deterministic chain order.
    Component rows are prefixed with their component / complement-slot
    index so nested structure survives the flat schema."""
    g = build_graph(chains, assembly_options(mode))
    out: list[tuple[str, int]] = []
    if mode == "loops":
        for loop in g.get_directed_loops(LOOP_SIMPLE):
            out.append((_loop_sig(g, loop), len(loop)))
    elif mode == "components":
        for ci, comp in enumerate(g.get_directed_components(
                BOUNDARIES_KEEP)):
            for loop in comp:
                out.append((f"c{ci}:" + _loop_sig(g, loop), len(loop)))
    elif mode == "undirected":
        for ci, comp in enumerate(g.get_undirected_components(
                LOOP_CIRCUIT)):
            for slot in (0, 1):
                for loop in comp[slot]:
                    out.append((f"c{ci}s{slot}:" + _loop_sig(g, loop),
                                len(loop)))
    elif mode == "paths":
        for path in g.get_polylines(POLYLINE_PATH):
            out.append((_path_sig(g, path), len(path)))
    elif mode == "walks":
        for path in g.get_polylines(POLYLINE_WALK):
            out.append((_path_sig(g, path), len(path)))
    else:
        raise ValueError(f"unknown assembly mode {mode}")
    return out


def cancel_and_stitch(
    edges,
    *,
    turn_key=None,
    drop_self_edges: bool = False,
) -> list[list[int]]:
    """Cancel sibling pairs among directed edges, then stitch the
    remainder into rings — the shared SiblingPairs.DISCARD assembly
    used by both the builder's polygon layer (snap.Builder.layer_loops,
    S2PolygonLayer) and the lax-polygon layer (nesting.lax_polygon_layer,
    LaxPolygonLayer.cs DISCARD modes).

    ``edges``: directed (src, dst) vertex-id pairs.  Each (a, b)
    cancels one (b, a).  ``drop_self_edges`` removes degenerate
    (a, a) edges from the stitch (the lax layer handles those as
    separate degenerate loops).  ``turn_key``: optional callable
    (vin_id, vat_id, vout_id) -> sort key applied at fan-out vertices
    (the builder stitcher passes the sharpest-left-turn angle on site
    coordinates; without it the first unused edge in input order
    wins, which is LaxPolygonLayer's deterministic behavior).

    Returns rings as vertex-id lists with >= 3 vertices.
    """
    from collections import Counter

    count = Counter(edges)
    for (a, b) in list(count):
        if a < b and (b, a) in count:
            k = min(count[(a, b)], count[(b, a)])
            count[(a, b)] -= k
            count[(b, a)] -= k
    remaining: list[tuple[int, int]] = []
    for e, k in count.items():
        if drop_self_edges and e[0] == e[1]:
            continue
        remaining.extend([e] * k)
    by_src: dict[int, list[int]] = {}
    for idx, (a, _b) in enumerate(remaining):
        by_src.setdefault(a, []).append(idx)
    used = [False] * len(remaining)
    rings: list[list[int]] = []
    for start in range(len(remaining)):
        if used[start]:
            continue
        ring = [remaining[start][0]]
        cur = start
        used[start] = True
        while True:
            nxt_v = remaining[cur][1]
            if nxt_v == ring[0]:
                break
            ring.append(nxt_v)
            cands = [k for k in by_src.get(nxt_v, []) if not used[k]]
            if not cands:
                break
            if turn_key is not None and len(cands) > 1:
                vin = remaining[cur][0]
                cands.sort(
                    key=lambda k: turn_key(vin, nxt_v, remaining[k][1])
                )
            cur = cands[0]
            used[cur] = True
        if len(ring) >= 3:
            rings.append(ring)
    return rings
