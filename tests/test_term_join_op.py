"""Operator-level tests for term_index_cap_join (the inverted-index
twin of the covering cap join, Index/S2RegionTermIndexer.cs)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels.geom import Cap
from s2geometry_spark.kernels.term_indexer import (
    TermOptions,
    region_query_terms,
)
from s2geometry_spark.operators import term_join as TJ


def _pts(n=400, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _points_df(spark, pts):
    cid = CI.xyz_to_cellid(pts[:, 0], pts[:, 1], pts[:, 2])
    pdf = pd.DataFrame(
        {
            "key": np.arange(len(pts), dtype=np.int64),
            "x": pts[:, 0],
            "y": pts[:, 1],
            "z": pts[:, 2],
            "cell_id": CI.as_i64(cid),
        }
    )
    return spark.createDataFrame(pdf)


def _caps(k=5, seed=11, radius_deg=12.0):
    rng = np.random.default_rng(seed)
    out = []
    for rid in range(k):
        c = rng.standard_normal(3)
        c /= np.linalg.norm(c)
        out.append(
            (rid, Cap.from_center_radians(tuple(c), math.radians(radius_deg)))
        )
    return out


def test_matches_brute_force(spark):
    pts = _pts()
    caps = _caps()
    got = sorted(
        (r.key, r.region_id)
        for r in TJ.term_index_cap_join(spark, _points_df(spark, pts), caps).collect()
    )
    expected = []
    for rid, cap in caps:
        inside = np.flatnonzero(
            [cap.contains_point(tuple(p)) for p in pts]
        )
        expected.extend((int(i), rid) for i in inside)
    assert got == sorted(expected)
    assert got  # non-vacuous


def test_empty_caps_returns_empty(spark):
    """caps=[] must yield an empty result, not a schema-inference
    error on the zero-row query-terms frame."""
    out = TJ.term_index_cap_join(spark, _points_df(spark, _pts(50)), [])
    assert out.count() == 0
    assert set(out.columns) == {"key", "region_id"}


def test_query_terms_are_points_only():
    """The operator's index side holds points only, so its query-term
    expansion must use index_contains_points_only: no '$'-marked
    covering terms (dead broadcast weight that can never equi-match an
    unmarked point index term)."""
    opts = TermOptions()
    (rid, cap) = _caps(1)[0]
    full = set(region_query_terms(opts, cap))
    slim = set(
        region_query_terms(
            TermOptions(index_contains_points_only=True), cap
        )
    )
    assert any(t.startswith(opts.marker) for t in full)
    assert not any(t.startswith(opts.marker) for t in slim)
    # slim is exactly the unmarked subset -> identical candidates
    assert slim == {t for t in full if not t.startswith(opts.marker)}
