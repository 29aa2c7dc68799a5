"""Distributed shape-index point-in-polygon: the O(edges-in-cell)
refine must reproduce the brute-force O(all-edges) answer exactly,
including on many-edge fractal loops (MutableS2ShapeIndexTests /
S2Loop.cs:1442-1483 indexed-contains parity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernels import cellid as CI
from s2geometry_spark.kernels import edges as E
from s2geometry_spark.operators import shape_index as SI
from s2geometry_spark.sources import points as P
from s2geometry_spark.sources import regions_src as R


def _probe_points(key: int, n: int, spread: float = 0.999):
    """Deterministic probes biased toward the loop's cap center so a
    sizeable fraction is inside."""
    keys = np.arange(1, n + 1)
    comps = {
        a: ((keys * P.MUL[a]) % P.MOD[a]).astype(np.float64) / (P.MOD[a] / 2.0)
        - 1.0
        for a in "xyz"
    }
    cx, cy, cz, _ = R.cap_params(key)
    t = (keys % 100) / 100.0 * spread
    px = comps["x"] * (1 - t) + cx * t
    py = comps["y"] * (1 - t) + cy * t
    pz = comps["z"] * (1 - t) + cz * t
    return keys, px, py, pz


def _index_contains(entries, cov, rid, px, py, pz):
    cid = CI.xyz_to_cellid(px, py, pz)
    got = np.zeros(len(px), dtype=bool)
    matched = np.zeros(len(px), dtype=bool)
    for lv in sorted(set(cov["level"].tolist())):
        anc = CI.as_i64(CI.parent(cid, lv))
        for i in range(len(px)):
            k = (rid, int(anc[i]))
            if k in entries:
                assert not matched[i], "index cells must be disjoint"
                matched[i] = True
                _eidx, cd, center, cc = entries[k]
                if cd is None:
                    got[i] = cc
                else:
                    edges = [(cd[j, 0], cd[j, 1]) for j in range(len(cd))]
                    par = E.crossing_parity_fast_edges(
                        edges, px[i : i + 1], py[i : i + 1], pz[i : i + 1],
                        origin=center,
                    )
                    got[i] = bool(par[0] ^ int(cc))
    return got, matched


class TestDriverSideIndex:
    def test_fractal_4k_matches_brute(self):
        loops = R.fractal_loops([3], n_vertices=4096)
        rid, loop = loops[0]
        entries, cov = SI.build_loop_index_entries(loops)
        _, px, py, pz = _probe_points(3, 2000)
        brute = (
            E.crossing_parity_fast(loop.verts, px, py, pz)
            ^ int(loop.origin_inside)
        ).astype(bool)
        got, matched = _index_contains(entries, cov, rid, px, py, pz)
        assert (brute & ~matched).sum() == 0  # covering misses nothing
        assert np.array_equal(got, brute)
        assert brute.sum() > 100  # non-trivial both ways
        assert (~brute).sum() > 100

    def test_fractal_10k_matches_brute(self):
        """The VERDICT big-polygon gate: >=10k-edge loop, indexed
        containment == brute force."""
        loops = R.fractal_loops([5], n_vertices=10240)
        rid, loop = loops[0]
        entries, cov = SI.build_loop_index_entries(loops)
        # refine now touches only a small slice of the boundary
        ne = [len(v[1]) for v in entries.values() if v[1] is not None]
        assert max(ne) < 2000 and sum(ne) / len(ne) < 100
        _, px, py, pz = _probe_points(5, 1000)
        brute = (
            E.crossing_parity_fast(loop.verts, px, py, pz)
            ^ int(loop.origin_inside)
        ).astype(bool)
        got, matched = _index_contains(entries, cov, rid, px, py, pz)
        assert (brute & ~matched).sum() == 0
        assert np.array_equal(got, brute)
        assert brute.sum() > 50

    def test_index_agrees_with_robust_contains(self):
        """Cell-center-anchored parity must agree with the robust
        (triage->exact->symbolic) containment, not just the fast
        mirror."""
        loops = R.fractal_loops([7], n_vertices=1024)
        rid, loop = loops[0]
        entries, cov = SI.build_loop_index_entries(loops)
        _, px, py, pz = _probe_points(7, 400)
        norm = np.sqrt(px * px + py * py + pz * pz)
        upts = np.stack([px / norm, py / norm, pz / norm], axis=1)
        robust = loop.contains_points(upts)
        got, _ = _index_contains(entries, cov, rid, px / norm, py / norm, pz / norm)
        assert np.array_equal(got, robust)


class TestSparkIndexJoin:
    @pytest.fixture(scope="class")
    def loops(self):
        return R.fractal_loops(range(4), n_vertices=256)

    def test_join_matches_all_edges_join(self, spark, sf_dir, loops):
        from s2geometry_spark.operators import spatial_join as SJ
        from s2geometry_spark.operators import tile as T

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        pts = T.assign_cellids(
            P.with_xyz(cust.select(F.col("c_custkey").alias("key")))
        )
        got = sorted(
            (r["key"], r["region_id"])
            for r in SI.point_in_loop_index_join(spark, pts, loops).collect()
        )
        want = sorted(
            (r["key"], r["region_id"])
            for r in SJ.point_in_loop_join(spark, pts, loops).collect()
        )
        assert got == want
        assert len(got) > 0

    def test_distributed_build_matches_driver(self, spark, loops):
        rid, loop = loops[1]
        rows = []
        for i, v in enumerate(np.asarray(loop.verts)):
            rows.append((rid, i, float(v[0]), float(v[1]), float(v[2])))
        vdf = spark.createDataFrame(
            pd.DataFrame(rows, columns=["region_id", "vtx_idx", "x", "y", "z"])
        )
        got = {
            (r["region_id"], r["cell_id"]): (
                r["contains_center"],
                r["n_edges"],
                tuple(r["edge_idx"]),
            )
            for r in SI.build_index_df(vdf).collect()
        }
        entries, _cov = SI.build_loop_index_entries([(rid, loop)])
        want = {
            k: (
                cc,
                0 if eidx is None else len(eidx),
                () if eidx is None else tuple(int(i) for i in eidx),
            )
            for k, (eidx, _cd, _center, cc) in entries.items()
        }
        assert got == want


class TestDistributedIndexDF:
    def test_df_refine_matches_broadcast_path(self, spark, sf_dir):
        """The all-JVM shuffle-join refine over the materialized index
        edge table must equal the broadcast-dict path row for row."""
        from s2geometry_spark.operators import tile as T

        loops = R.fractal_loops(range(3), n_vertices=192)
        rows = []
        for rid, loop in loops:
            for i, v in enumerate(np.asarray(loop.verts)):
                rows.append((rid, i, float(v[0]), float(v[1]), float(v[2])))
        vdf = spark.createDataFrame(
            pd.DataFrame(rows, columns=["region_id", "vtx_idx", "x", "y", "z"])
        )
        idx_df = SI.build_index_df(vdf)
        index_edges = SI.index_edges_df(idx_df, vdf)

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        pts = T.assign_cellids(
            P.with_xyz(cust.select(F.col("c_custkey").alias("key")))
        )
        got = sorted(
            (r["key"], r["region_id"])
            for r in SI.point_in_polygon_index_df_join(
                spark, pts, index_edges
            ).collect()
        )
        want = sorted(
            (r["key"], r["region_id"])
            for r in SI.point_in_loop_index_join(spark, pts, loops).collect()
        )
        assert got == want
        assert len(got) > 0
