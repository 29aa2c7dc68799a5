"""S2CellUnion algebra on plain-int cell-id lists (driver-side).

Cell unions are per-region and small; Python ints give natural unsigned
semantics.  Reference behavior: S2Region/S2CellUnion.cs — Normalize
:546-583, Denormalize :585-627, AreSiblings :685-702, Contains
/Intersects :262-364, Intersection :629+, Expand :421-487.
Distributed variants operate on exploded (region_id, cell_id) rows in
operators/coverings.py.
"""

from __future__ import annotations

import numpy as np

from ..constants import KMIN_WIDTH, MAX_LEVEL
from . import cellid as CI

U64_MASK = (1 << 64) - 1


def _lsb(cid: int) -> int:
    return cid & (-cid & U64_MASK)


def _level(cid: int) -> int:
    return MAX_LEVEL - (_lsb(cid).bit_length() - 1) // 2


def _parent(cid: int, level: int | None = None) -> int:
    if level is None:
        new_lsb = _lsb(cid) << 2
    else:
        new_lsb = 1 << (2 * (MAX_LEVEL - level))
    return (cid & (-new_lsb & U64_MASK)) | new_lsb


def _range_min(cid: int) -> int:
    return cid - (_lsb(cid) - 1)


def _range_max(cid: int) -> int:
    return cid + (_lsb(cid) - 1)


def _contains(a: int, b: int) -> bool:
    return _range_min(a) <= b <= _range_max(a)


def _is_face(cid: int) -> bool:
    return _lsb(cid) == 1 << 60


def _are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """True if a,b,c,d are the four children of one parent
    (S2CellUnion.cs:685-702)."""
    if (a ^ b ^ c) != d:
        return False
    mask = _lsb(d) << 1
    mask = ~(mask + (mask << 1)) & U64_MASK
    d_masked = d & mask
    return (
        (a & mask) == d_masked
        and (b & mask) == d_masked
        and (c & mask) == d_masked
        and not _is_face(d)
    )


def normalize(ids: list[int]) -> list[int]:
    """Sort unsigned, drop contained, merge sibling quartets."""
    ids = sorted(ids)
    out: list[int] = []
    for cid in ids:
        if out and _contains(out[-1], cid):
            continue
        while out and _contains(cid, out[-1]):
            out.pop()
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], cid):
            cid = _parent(cid)
            del out[-3:]
        out.append(cid)
    return out


def denormalize(ids: list[int], min_level: int, level_mod: int) -> list[int]:
    """Split cells to satisfy min_level / level_mod
    (S2CellUnion.cs:585-627)."""
    out: list[int] = []
    for cid in ids:
        level = _level(cid)
        new_level = max(min_level, level)
        if level_mod > 1:
            new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(MAX_LEVEL, new_level)
        if new_level == level:
            out.append(cid)
        else:
            # iterate children at new_level
            step = 1 << (2 * (MAX_LEVEL - new_level) + 1)
            begin = cid - _lsb(cid) + (step >> 1)
            end = cid + _lsb(cid) + (step >> 1)
            out.extend(range(begin, end, step))
    return out


def contains_id(ids: list[int], target: int) -> bool:
    """Binary search containment: `ids` must be normalized (sorted,
    disjoint)."""
    import bisect

    i = bisect.bisect_left(ids, target)
    if i < len(ids) and _range_min(ids[i]) <= target:
        return True
    return i > 0 and _range_max(ids[i - 1]) >= target


def intersects_id(ids: list[int], target: int) -> bool:
    import bisect

    lo, hi = _range_min(target), _range_max(target)
    i = bisect.bisect_left(ids, lo)
    if i < len(ids) and _range_min(ids[i]) <= hi:
        return True
    return i > 0 and _range_max(ids[i - 1]) >= lo


def union(x: list[int], y: list[int]) -> list[int]:
    return normalize(list(x) + list(y))


def intersection(x: list[int], y: list[int]) -> list[int]:
    """Linear merge of two normalized unions (S2CellUnion.cs:629-683)."""
    out: list[int] = []
    i = j = 0
    while i < len(x) and j < len(y):
        imin = _range_min(x[i])
        jmin = _range_min(y[j])
        if imin > jmin:
            # either y[j] contains x[i], or they are disjoint (y[j] first)
            if x[i] <= _range_max(y[j]):
                out.append(x[i])
                i += 1
            else:
                j += 1
        elif jmin > imin:
            if y[j] <= _range_max(x[i]):
                out.append(y[j])
                j += 1
            else:
                i += 1
        else:
            if x[i] < y[j]:
                out.append(x[i])
                i += 1
            else:
                out.append(y[j])
                j += 1
    return normalize(out)


def difference(x: list[int], y: list[int]) -> list[int]:
    """x minus y via recursive subdivision (S2CellUnion.cs:406-419,
    704-724)."""
    out: list[int] = []

    def walk(cid: int):
        if not intersects_id(y, cid):
            out.append(cid)
        elif not contains_id(y, cid):
            # children: spacing 2*lsb_child = lsb>>1
            step = _lsb(cid) >> 1
            begin = cid - _lsb(cid) + (step >> 1)
            for k in range(4):
                walk(begin + k * step)

    for cid in x:
        walk(cid)
    return normalize(out)


def expand_level(ids: list[int], expand_level: int) -> list[int]:
    """Add a ring of level-`expand_level` neighbors around the union
    boundary (S2CellUnion.cs:435-453)."""
    output: list[int] = []
    level_lsb = 1 << (2 * (MAX_LEVEL - expand_level))
    i = len(ids) - 1
    while i >= 0:
        cid = ids[i]
        if _lsb(cid) < level_lsb:
            cid = _parent(cid, expand_level)
            while i > 0 and _contains(cid, ids[i - 1]):
                i -= 1
        output.append(cid)
        nbrs = CI.all_neighbors(np.array([cid], np.uint64), expand_level)[0]
        output.extend(int(v) for v in nbrs)
        i -= 1
    return normalize(output)


def expand_radius(ids: list[int], min_radius_radians: float, max_level_diff: int) -> list[int]:
    """Expand so all points within min_radius are covered
    (S2CellUnion.cs:455-487) — the buffer operator for within-distance
    joins."""
    result = list(ids)
    min_level = MAX_LEVEL
    for cid in result:
        min_level = min(min_level, _level(cid))
    radius_level = KMIN_WIDTH.get_level_for_min_value(min_radius_radians)
    if radius_level == 0 and min_radius_radians > KMIN_WIDTH.get_value(0):
        result = expand_level(result, 0)
    return expand_level(result, min(min_level + max_level_diff, radius_level))


def leaf_ranges(ids: list[int]) -> list[tuple[int, int]]:
    """Non-overlapping inclusive leaf ranges [(range_min, range_max)] of
    a normalized union — drives Spark range joins (S2CellIndex style)."""
    return [(_range_min(c), _range_max(c)) for c in ids]


def leaf_cells_covered(ids: list[int]) -> int:
    """Number of leaf cells spanned (S2CellUnion.cs:486-500)."""
    total = 0
    for cid in ids:
        total += 1 << (2 * (MAX_LEVEL - _level(cid)))
    return total


def average_based_area(ids: list[int]) -> float:
    """AverageArea(leaf) * leaf count — exact closed form, safe for
    distributed sums (S2CellUnion.cs:504-510)."""
    from ..constants import KAVG_AREA

    return KAVG_AREA.get_value(MAX_LEVEL) * leaf_cells_covered(ids)


def exact_area(ids: list[int]) -> float:
    """Sum of exact cell areas (S2CellUnion.cs:527-534)."""
    from .geom import Cell, cell_exact_area

    return sum(cell_exact_area(Cell(cid)) for cid in ids)
