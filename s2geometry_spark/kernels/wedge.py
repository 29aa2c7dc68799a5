"""Wedge relations + contains-vertex query.

- wedge relations between two angles sharing a middle vertex
  (S2WedgeRelations.cs): the loop-relation primitives S2Loop /
  S2BooleanOperation use at shared vertices.
- S2ContainsVertexQuery (Query/S2ContainsVertexQuery.cs): +1/-1/0
  containment sign of a polygon at one of its own vertices from the
  incident edge multiset.

All predicates are the robust OrderedCCW (triage -> exact ->
symbolic), so results are exact."""

from __future__ import annotations

from . import edges as E

WEDGE_EQUALS = "equals"
WEDGE_PROPERLY_CONTAINS = "properly_contains"
WEDGE_IS_PROPERLY_CONTAINED = "is_properly_contained"
WEDGE_PROPERLY_OVERLAPS = "properly_overlaps"
WEDGE_IS_DISJOINT = "is_disjoint"


def wedge_relation(a0, ab1, a2, b0, b2) -> str:
    """Relation from wedge A = (a0, ab1, a2) to B = (b0, ab1, b2)
    (S2WedgeRelations.GetWedgeRelation)."""
    if a0 == b0 and a2 == b2:
        return WEDGE_EQUALS
    if E.ordered_ccw(a0, a2, b2, ab1):
        if E.ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return (
            WEDGE_IS_PROPERLY_CONTAINED if a2 == b2 else WEDGE_PROPERLY_OVERLAPS
        )
    if E.ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return (
        WEDGE_IS_DISJOINT if E.ordered_ccw(a0, b0, a2, ab1)
        else WEDGE_PROPERLY_OVERLAPS
    )


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """A contains B (S2WedgeRelations.WedgeContains)."""
    return E.ordered_ccw(a2, b2, b0, ab1) and E.ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """A intersects B (S2WedgeRelations.WedgeIntersects)."""
    return not (
        E.ordered_ccw(a0, b2, b0, ab1) and E.ordered_ccw(b0, a2, a0, ab1)
    )


class ContainsVertexQuery:
    """S2ContainsVertexQuery: accumulate incident edges at `target`
    (+1 outgoing / -1 incoming), then ContainsSign() is +1 if the
    polygon contains the vertex, -1 if not, 0 for matched sibling
    pairs — the convention compatible with VertexCrossing."""

    def __init__(self, target):
        self._target = tuple(float(x) for x in target)
        self._edges: dict[tuple, int] = {}

    def add_edge(self, v, direction: int) -> None:
        v = tuple(float(x) for x in v)
        self._edges[v] = self._edges.get(v, 0) + direction

    def contains_sign(self) -> int:
        ref = E.ref_dir(self._target)
        best_v, best_dir = ref, 0
        for v, d in sorted(self._edges.items()):
            assert abs(d) <= 1
            if d == 0:
                continue  # matched sibling pair
            if E.ordered_ccw(ref, best_v, v, self._target):
                best_v, best_dir = v, d
        return best_dir
