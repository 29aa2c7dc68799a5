"""RegionTermIndexer: the candidate-superset property the reference
documents (Index/S2RegionTermIndexer.cs:74-78) — if a point (or
region) intersects an indexed region, their term sets intersect."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import term_indexer as TI
from s2geometry_spark.sources import regions_src as R


@pytest.fixture(scope="module")
def opts():
    return TI.TermOptions(min_level=2, max_level=16, max_cells=8)


def _points(n=400):
    rng = np.random.default_rng(17)
    p = rng.normal(size=(n, 3))
    p /= np.linalg.norm(p, axis=1)[:, None]
    leafs = CI.xyz_to_cellid(p[:, 0], p[:, 1], p[:, 2])
    return p, leafs


class TestTermIndexer:
    def test_point_in_region_terms_intersect(self, opts):
        """Index regions, query points: containment => term match."""
        pts, leafs = _points()
        for rid, cap in R.synthetic_caps(range(12)):
            index_terms = set(TI.region_index_terms(opts, cap))
            for p, leaf in zip(pts, leafs):
                contained = cap.contains_point(tuple(p))
                q = set(TI.point_query_terms(opts, int(leaf)))
                if contained:
                    assert q & index_terms
                # no assertion when not contained: false positives are
                # expected (candidate superset), refined downstream

    def test_index_points_query_regions(self, opts):
        """Index points, query regions: containment => term match."""
        pts, leafs = _points()
        for rid, cap in R.synthetic_caps(range(12)):
            query_terms = set(TI.region_query_terms(opts, cap))
            for p, leaf in zip(pts, leafs):
                if cap.contains_point(tuple(p)):
                    idx = set(TI.point_index_terms(opts, int(leaf)))
                    assert idx & query_terms

    def test_points_only_mode_smaller(self, opts):
        _, leafs = _points(10)
        po = TI.TermOptions(
            min_level=2, max_level=16, index_contains_points_only=True
        )
        for leaf in leafs:
            assert len(TI.point_query_terms(po, int(leaf))) == 1
            full = TI.point_query_terms(opts, int(leaf))
            assert len(full) > 1

    def test_term_format(self, opts):
        _, leafs = _points(2)
        leaf = int(leafs[0])
        anc = TI.point_index_terms(opts, leaf, prefix="geo:")
        assert all(t.startswith("geo:") and "$" not in t for t in anc)
        cov = [
            t for t in TI.point_query_terms(opts, leaf, prefix="geo:")
            if "$" in t
        ]
        assert cov and all(t.startswith("geo:$") for t in cov)

    def test_loop_regions_too(self, opts):
        pts, leafs = _points(200)
        for rid, lp in R.synthetic_loops(range(6)):
            index_terms = set(TI.region_index_terms(opts, lp))
            inside = lp.contains_points(pts)
            for ok, leaf in zip(inside.tolist(), leafs.tolist()):
                if ok:
                    q = set(TI.point_query_terms(opts, int(leaf)))
                    assert q & index_terms


def test_vectorized_index_terms_match_scalar():
    """The per-level vectorized UDF body must emit exactly
    point_index_terms(opts, leaf) for every row."""
    import numpy as np

    from s2geometry_spark.kernels import cellid as C
    from s2geometry_spark.kernels.term_indexer import (
        TermOptions, point_index_terms,
    )

    opts = TermOptions()
    rng = np.random.RandomState(11)
    xyz = rng.randn(3, 500)
    ids = C.xyz_to_cellid(*xyz)
    levels = list(range(opts.min_level, opts.max_level + 1, opts.level_mod))
    cols = [C.to_token(C.parent(ids, lv)) for lv in levels]
    vec = [list(row) for row in zip(*cols)]
    for i in range(len(ids)):
        assert vec[i] == point_index_terms(opts, int(ids[i]))
