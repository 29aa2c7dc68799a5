"""RegionTermIndexer: regions/points -> ancestor + covering string
terms for inverted-index equi-lookup.

Semantics follow Index/S2RegionTermIndexer.cs:
- GetIndexTerms(point):       ancestor terms at every (min..max,
  level_mod) level                               (:304-316)
- GetQueryTerms(point):       one ancestor term at true-max-level +
  covering terms up the ancestor chain           (:324-341)
- GetIndexTermsForCanonicalCovering: covering term per cell (below
  true-max-level), ancestor terms for the cell + its ancestors with
  the prev-cell dedup walk                       (:353-402)
- GetQueryTermsForCanonicalCovering: ancestor term per cell + covering
  terms for its ancestors                        (:404-453)
- term format: prefix + ['$' marker for covering] + cell token (:459-461)

Property (comment :74-78): docs(index terms) ∩ query terms ⊇ all
intersecting (document, query) pairs — the candidate superset of the
covering-term equi-join; exact refinement follows.

Our spatial joins equi-join on raw cell ids directly (cheaper than
strings); this module provides the string-term surface for API parity
and for exporting to text inverted indexes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import MAX_LEVEL
from . import cellid as CI
from .coverer import CovererOptions, RegionCoverer

MARKER = "$"


@dataclass
class TermOptions:
    min_level: int = 4
    max_level: int = 16
    level_mod: int = 1
    max_cells: int = 8
    index_contains_points_only: bool = False
    optimize_for_space: bool = False
    marker: str = MARKER

    @property
    def true_max_level(self) -> int:
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) % self.level_mod

    def coverer_options(self) -> CovererOptions:
        return CovererOptions(
            max_cells=self.max_cells,
            min_level=self.min_level,
            max_level=self.max_level,
            level_mod=self.level_mod,
        )


def _token(cid: int) -> str:
    return str(CI.to_token(np.array([cid], np.uint64))[0])


def _term(opts: TermOptions, covering: bool, cid: int, prefix: str) -> str:
    if covering:
        return prefix + opts.marker + _token(cid)
    return prefix + _token(cid)


def _parent(cid: int, level: int) -> int:
    return int(CI.parent(np.array([cid], np.uint64), level)[0])


def _level(cid: int) -> int:
    return int(CI.level(np.array([cid], np.uint64))[0])


def point_index_terms(opts: TermOptions, leaf: int, prefix: str = "") -> list[str]:
    """Ancestor terms at every configured level (GetIndexTerms(point))."""
    return [
        _term(opts, False, _parent(leaf, lv), prefix)
        for lv in range(opts.min_level, opts.max_level + 1, opts.level_mod)
    ]


def point_query_terms(opts: TermOptions, leaf: int, prefix: str = "") -> list[str]:
    """GetQueryTerms(point): true-max ancestor term + covering terms up
    the chain."""
    level = opts.true_max_level
    terms = [_term(opts, False, _parent(leaf, level), prefix)]
    if opts.index_contains_points_only:
        return terms
    while level >= opts.min_level:
        terms.append(_term(opts, True, _parent(leaf, level), prefix))
        level -= opts.level_mod
    return terms


def region_index_terms(opts: TermOptions, region, prefix: str = "") -> list[str]:
    covering = RegionCoverer(opts.coverer_options()).get_covering(region)
    return covering_index_terms(opts, covering, prefix)


def region_query_terms(opts: TermOptions, region, prefix: str = "") -> list[str]:
    covering = RegionCoverer(opts.coverer_options()).get_covering(region)
    return covering_query_terms(opts, covering, prefix)


def covering_index_terms(
    opts: TermOptions, covering: list[int], prefix: str = ""
) -> list[str]:
    """GetIndexTermsForCanonicalCovering."""
    terms: list[str] = []
    prev_id = None
    tml = opts.true_max_level
    for cid in covering:
        level = _level(cid)
        if level < tml:
            terms.append(_term(opts, True, cid, prefix))
        if level == tml or not opts.optimize_for_space:
            terms.append(_term(opts, False, _parent(cid, level), prefix))
        level -= opts.level_mod
        while level >= opts.min_level:
            ancestor = _parent(cid, level)
            if (
                prev_id is not None
                and _level(prev_id) > level
                and _parent(prev_id, level) == ancestor
            ):
                break
            terms.append(_term(opts, False, ancestor, prefix))
            level -= opts.level_mod
        prev_id = cid
    return terms


def covering_query_terms(
    opts: TermOptions, covering: list[int], prefix: str = ""
) -> list[str]:
    """GetQueryTermsForCanonicalCovering."""
    terms: list[str] = []
    prev_id = None
    tml = opts.true_max_level
    for cid in covering:
        level = _level(cid)
        terms.append(_term(opts, False, cid, prefix))
        if opts.index_contains_points_only:
            prev_id = cid
            continue
        if opts.optimize_for_space and level < tml:
            terms.append(_term(opts, True, cid, prefix))
        level -= opts.level_mod
        while level >= opts.min_level:
            ancestor = _parent(cid, level)
            if (
                prev_id is not None
                and _level(prev_id) > level
                and _parent(prev_id, level) == ancestor
            ):
                break
            terms.append(_term(opts, True, ancestor, prefix))
            level -= opts.level_mod
        prev_id = cid
    return terms
