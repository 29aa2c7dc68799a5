"""Polygon validity via crossing-pair inspection: the
S2ShapeUtil.EdgePairs machinery (S2ShapeUtil/VisitCrossingEdgePairs.cs).

- ``crossing_pairs``: all pairs of edges that cross (CrossingType.ALL
  includes shared-vertex crossings; INTERIOR keeps proper crossings
  only) — the brute-force enumeration the reference tests use as their
  own oracle (S2ShapeUtilVisitCrossingEdgePairsTests.cs:118-137).  The
  reference's cell-bucketed visitor is an indexing strategy; the
  distributed analogue in this engine is the covering-cell equi-join of
  operators/crossing.py, which is row-equal-tested against this.
- ``find_crossing_error``: classify one crossing pair of a polygonal
  shape into the reference's error taxonomy
  (VisitCrossingEdgePairs.cs:404-471 FindCrossingError):
  LOOP_SELF_INTERSECTION / POLYGON_LOOPS_CROSS (interior crossings),
  DUPLICATE_VERTICES (same chain revisits a vertex),
  POLYGON_LOOPS_SHARE_EDGE (duplicate or reversed edges between
  chains), POLYGON_LOOPS_CROSS (wedge-overlap vertex crossings).
- ``find_self_intersection``: the FindSelfIntersection entry point
  (VisitCrossingEdgePairs.cs:486-506) over a polygon given as a list
  of vertex chains; drives S2Loop/S2Polygon.FindValidationError.

Driver/batch-side kernel code: validation runs per-geometry inside
Arrow batches (see operators.measures_op.polygon_validate), never per
fact row.
"""

from __future__ import annotations

import numpy as np

from . import edges as E
from . import wedge as W


def _as_chains(chains) -> list[list[tuple]]:
    out = []
    for chain in chains:
        out.append(
            [tuple(float(c) for c in p) for p in np.asarray(chain)]
        )
    return out


def chain_edges(chains):
    """Flattened closed-chain edges: (chain_id, offset, v0, v1)."""
    edges = []
    for ci, verts in enumerate(chains):
        n = len(verts)
        for off in range(n):
            edges.append((ci, off, verts[off], verts[(off + 1) % n]))
    return edges


def crossing_pairs(edges, *, interior_only: bool = False):
    """All crossing pairs among ``edges`` (list of (v0, v1) tuples),
    as (i, j, is_interior) with i < j.  CrossingType.ALL keeps
    shared-vertex crossings (sign 0); INTERIOR keeps sign +1 only."""
    min_sign = 1 if interior_only else 0
    out = []
    n = len(edges)
    for i in range(n):
        a0, a1 = edges[i][0], edges[i][1]
        for j in range(i + 1, n):
            sign = E.crossing_sign(a0, a1, edges[j][0], edges[j][1])
            if sign >= min_sign:
                out.append((i, j, sign == 1))
    return out


def _loop_error(code: str, msg: str, chain_id: int,
                is_polygon: bool) -> str:
    if is_polygon:
        return f"{code}: Loop {chain_id}: {msg}"
    return f"{code}: {msg}"


def find_crossing_error(chains, a, b, is_interior: bool) -> str | None:
    """Classify one crossing pair; ``a``/``b`` are (chain_id, offset)
    into ``chains`` (closed vertex chains).  Returns an
    S2ErrorCode-prefixed message, or None if this pair is fine."""
    is_polygon = len(chains) > 1
    a_chain, a_off = a
    b_chain, b_off = b
    av = chains[a_chain]
    bv = chains[b_chain]
    a1 = av[(a_off + 1) % len(av)]
    b1 = bv[(b_off + 1) % len(bv)]
    if is_interior:
        if a_chain != b_chain:
            return (
                f"POLYGON_LOOPS_CROSS: Loop {a_chain} edge {a_off} "
                f"crosses loop {b_chain} edge {b_off}"
            )
        return _loop_error(
            "LOOP_SELF_INTERSECTION",
            f"Edge {a_off} crosses edge {b_off}", a_chain, is_polygon,
        )
    # Loops may not have duplicate vertices, and separate loops may not
    # share edges or cross at vertices.  Each vertex is checked once by
    # requiring the two edges to share their END vertex.
    if a1 != b1:
        return None
    if a_chain == b_chain:
        return _loop_error(
            "DUPLICATE_VERTICES",
            f"Edge {a_off} has duplicate vertex with edge {b_off}",
            a_chain, is_polygon,
        )
    a0, b0 = av[a_off], bv[b_off]
    a2 = av[(a_off + 2) % len(av)]
    b2 = bv[(b_off + 2) % len(bv)]
    if a0 == b0 or a0 == b2:
        # the second edge index is sometimes off by one, hence "near"
        return (
            f"POLYGON_LOOPS_SHARE_EDGE: Loop {a_chain} edge {a_off} "
            f"has duplicate near loop {b_chain} edge {b_off}"
        )
    # Index loops keep the interior on the left, so also catch the case
    # where one wedge contains the complement of the other
    # (VisitCrossingEdgePairs.cs:454-468).
    if (
        W.wedge_relation(a0, a1, a2, b0, b2)
        == W.WEDGE_PROPERLY_OVERLAPS
        and W.wedge_relation(a0, a1, a2, b2, b0)
        == W.WEDGE_PROPERLY_OVERLAPS
    ):
        return (
            f"POLYGON_LOOPS_CROSS: Loop {a_chain} edge {a_off} "
            f"crosses loop {b_chain} edge {b_off}"
        )
    return None


def find_self_intersection(chains) -> str | None:
    """First crossing error of a polygonal shape given as closed
    vertex chains, or None if the chains form a valid arrangement.

    Brute-force over edge pairs (the pair count is per-geometry
    small); pairs of the form (AB, BC) contribute nothing to
    FindCrossingError, which only inspects pairs sharing their end
    vertex, so no adjacency skip is needed for correctness."""
    chains = _as_chains(chains)
    edges = chain_edges(chains)
    for i, j, is_interior in crossing_pairs(
            [(e[2], e[3]) for e in edges]):
        err = find_crossing_error(
            chains,
            (edges[i][0], edges[i][1]),
            (edges[j][0], edges[j][1]),
            is_interior,
        )
        if err is not None:
            return err
    return None


def has_self_intersection(chains) -> bool:
    return find_self_intersection(chains) is not None


def validate_chains(chains) -> tuple[int, int, int, str]:
    """One polygon's validation summary: (n_chains, n_edges,
    n_crossing_pairs, error_code) where error_code is the first
    crossing error's S2ErrorCode or "OK"."""
    chains = _as_chains(chains)
    edges = chain_edges(chains)
    pairs = crossing_pairs([(e[2], e[3]) for e in edges])
    code = "OK"
    for i, j, is_interior in pairs:
        err = find_crossing_error(
            chains, (edges[i][0], edges[i][1]),
            (edges[j][0], edges[j][1]), is_interior,
        )
        if err is not None:
            code = err.split(":", 1)[0]
            break
    return len(chains), len(edges), len(pairs), code
