"""General (cell_id, label) index: the S2CellIndex data structure
(Index/S2CellIndex.cs) re-expressed as a leaf-range sweep.

The index decomposes an arbitrary multiset of (cell_id, label) pairs
into non-overlapping leaf-cell ranges, each carrying the set of
(cell_id, label) pairs whose cells intersect it.  Queries:

- ``contents_of_leaf``       the labels whose cells contain a leaf
- ``intersecting_labels``    labels whose cells intersect a target
                             cell union (GetIntersectingLabels)
- ``range_rows``             the (lo_leaf, hi_leaf, labels) table —
                             the broadcastable form the distributed
                             range join consumes
                             (operators/spatial_join.label_range_join)

Build is a classic boundary sweep over [range_min, range_max+1)
events — O(n log n) driver-side for dim-scale label sets; the
10^12-row fact side only ever meets the emitted range table.
"""

from __future__ import annotations

import numpy as np

from . import cellid as CI


def _rmin(cid: int) -> int:
    return int(CI.range_min(np.array([cid], dtype=np.uint64))[0])


def _rmax(cid: int) -> int:
    return int(CI.range_max(np.array([cid], dtype=np.uint64))[0])


class CellIndex:
    def __init__(self, entries: list[tuple[int, int]]):
        """entries: (cell_id uint64-valued int, label) pairs; cells may
        overlap, nest, and repeat (duplicates are kept, like the
        reference's multiset semantics — dedup happens per query)."""
        self.entries = [(int(c), int(lab)) for c, lab in entries]
        events: list[tuple[int, int, int]] = []  # (leaf, +1/-1, entry_idx)
        for idx, (cid, _lab) in enumerate(self.entries):
            events.append((_rmin(cid), 1, idx))
            events.append((_rmax(cid) + 1, -1, idx))
        events.sort()
        # sweep into ranges [start, end) with active entry sets
        self.ranges: list[tuple[int, int, frozenset[int]]] = []
        active: set[int] = set()
        prev: int | None = None
        k = 0
        n = len(events)
        while k < n:
            leaf = events[k][0]
            if prev is not None and active and leaf > prev:
                self.ranges.append((prev, leaf, frozenset(active)))
            while k < n and events[k][0] == leaf:
                _, delta, idx = events[k]
                if delta > 0:
                    active.add(idx)
                else:
                    active.discard(idx)
                k += 1
            prev = leaf
        # ranges are sorted, non-overlapping, non-empty by construction

    def contents_of_leaf(self, leaf: int) -> list[int]:
        """Sorted distinct labels whose cells contain the given leaf."""
        import bisect

        leaf = int(leaf)
        pos = bisect.bisect_right(self.ranges, (leaf, float("inf"))) - 1
        if pos < 0:
            return []
        lo, hi, idxs = self.ranges[pos]
        if not (lo <= leaf < hi):
            return []
        return sorted({self.entries[i][1] for i in idxs})

    def intersecting_labels(self, target_cells) -> list[int]:
        """Sorted distinct labels whose cells intersect any cell of
        `target_cells` (GetIntersectingLabels)."""
        out: set[int] = set()
        for cid in target_cells:
            lo, hi = _rmin(int(cid)), _rmax(int(cid)) + 1
            import bisect

            pos = bisect.bisect_right(self.ranges, (lo, float("inf"))) - 1
            pos = max(pos, 0)
            for rlo, rhi, idxs in self.ranges[pos:]:
                if rlo >= hi:
                    break
                if rhi <= lo:
                    continue
                out.update(self.entries[i][1] for i in idxs)
        return sorted(out)

    def range_rows(self) -> list[tuple[int, int, tuple[int, ...]]]:
        """[(lo_leaf, hi_leaf_inclusive, sorted distinct labels)] —
        the broadcast table for a distributed range join."""
        return [
            (lo, hi - 1, tuple(sorted({self.entries[i][1] for i in idxs})))
            for lo, hi, idxs in self.ranges
        ]
