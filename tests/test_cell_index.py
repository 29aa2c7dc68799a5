"""S2CellIndex behaviors (S2CellIndexTests.cs families: one face
cell, leaf cells, duplicates, disjoint, nested) + the distributed
label range join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.kernels import cellid as C
from s2geometry_spark.kernels.cell_index import CellIndex


def cid_of(face, pos, level):
    return int(np.atleast_1d(C.from_face_pos_level(face, pos, level))[0])


class TestCellIndex:
    def test_empty(self):
        idx = CellIndex([])
        assert idx.range_rows() == []
        assert idx.contents_of_leaf(cid_of(0, 1, 30)) == []

    def test_one_face_cell(self):
        f0 = int(np.atleast_1d(C.from_face(0))[0])
        idx = CellIndex([(f0, 7)])
        rows = idx.range_rows()
        assert len(rows) == 1
        lo, hi, labels = rows[0]
        assert labels == (7,)
        # every face-0 leaf is inside, face-1 leaves are not
        assert idx.contents_of_leaf(lo) == [7]
        assert idx.contents_of_leaf(hi) == [7]
        f1_leaf = cid_of(1, 123, 30)
        assert idx.contents_of_leaf(f1_leaf) == []

    def test_duplicate_values(self):
        f0 = int(np.atleast_1d(C.from_face(0))[0])
        idx = CellIndex([(f0, 1), (f0, 1), (f0, 2)])
        assert idx.contents_of_leaf(cid_of(0, 99, 30)) == [1, 2]

    def test_nested_cells(self):
        outer = cid_of(2, 0, 4)
        inner = int(C.child_begin(np.array([outer], np.uint64), 10)[0])
        idx = CellIndex([(outer, 1), (inner, 2)])
        # a leaf inside `inner` sees both labels; one outside only 1
        leaf_in = int(C.range_min(np.array([inner], np.uint64))[0])
        assert idx.contents_of_leaf(leaf_in) == [1, 2]
        leaf_out = int(C.range_max(np.array([outer], np.uint64))[0])
        assert idx.contents_of_leaf(leaf_out) == [1]

    def test_disjoint_cells_and_intersecting_labels(self):
        a = cid_of(0, 5, 6)
        b = cid_of(3, 9, 6)
        idx = CellIndex([(a, 10), (b, 20)])
        assert idx.intersecting_labels([a]) == [10]
        assert idx.intersecting_labels([b]) == [20]
        assert idx.intersecting_labels([a, b]) == [10, 20]
        parent_a = int(C.parent(np.array([a], np.uint64), 2)[0])
        assert idx.intersecting_labels([parent_a]) == [10]

    def test_matches_brute_force(self):
        rng = np.random.default_rng(17)
        entries = []
        for lab in range(30):
            face = int(rng.integers(6))
            level = int(rng.integers(2, 12))
            pos = int(rng.integers(1 << (2 * level)))
            entries.append((cid_of(face, pos << (2 * (30 - level)), level), lab % 9))
        idx = CellIndex(entries)
        arr = np.array([c for c, _ in entries], dtype=np.uint64)
        for _ in range(200):
            leaf = cid_of(int(rng.integers(6)), int(rng.integers(1 << 40)), 30)
            want = sorted(
                {lab for (c, lab), cc in zip(entries, arr)
                 if int(C.range_min(np.array([cc]))[0]) <= leaf
                 <= int(C.range_max(np.array([cc]))[0])}
            )
            assert idx.contents_of_leaf(leaf) == want


class TestLabelRangeJoin:
    def test_matches_driver_index(self, spark, sf_dir):
        from s2geometry_spark.operators import spatial_join as SJ
        from s2geometry_spark.operators import tile as T
        from s2geometry_spark.sources import points as P
        from s2geometry_spark.sources import regions_src as R
        from s2geometry_spark.kernels.coverer import RegionCoverer

        rc = RegionCoverer()
        entries = []
        for rid, cap in R.synthetic_caps(range(10)):
            for cid in rc.get_covering(cap):
                entries.append((cid, rid))
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        pts = T.assign_cellids(
            P.with_xyz(cust.select(F.col("c_custkey").alias("key")))
        )
        got = sorted(
            (r["key"], r["label"])
            for r in SJ.label_range_join(spark, pts, entries).collect()
        )
        idx = CellIndex(entries)
        pdf = pts.select("key", "cell_id").toPandas()
        want = sorted(
            (int(k), lab)
            for k, cid in zip(pdf["key"], pdf["cell_id"])
            for lab in idx.contents_of_leaf(int(np.uint64(np.int64(cid))))
        )
        assert got == want
        assert len(got) > 0


class TestClosestCellJoin:
    def test_matches_driver_brute(self, spark, sf_dir):
        from s2geometry_spark.kernels.closest_cell import closest_cells
        from s2geometry_spark.operators import knn as KNN
        from s2geometry_spark.operators import tile as T
        from s2geometry_spark.sources import points as P
        from s2geometry_spark.sources import regions_src as R
        from s2geometry_spark.kernels.coverer import RegionCoverer

        rc = RegionCoverer()
        entries = []
        for rid, cap in R.synthetic_caps(range(8)):
            for cid in rc.get_covering(cap):
                entries.append((cid, rid))
        sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        pts = T.assign_cellids(
            P.with_xyz(sup.select(F.col("s_suppkey").alias("key")))
        )
        got = sorted(
            (r["key"], r["rn"], r["cell_id"], r["label"], r["dist2"])
            for r in KNN.closest_cell_join(pts, entries, k=2).collect()
        )
        pdf = pts.selectExpr(
            "key",
            "x / sqrt(x*x + y*y + z*z) AS ux",
            "y / sqrt(x*x + y*y + z*z) AS uy",
            "z / sqrt(x*x + y*y + z*z) AS uz",
        ).toPandas()
        want = []
        for _, row in pdf.iterrows():
            res = closest_cells(
                entries, (row["ux"], row["uy"], row["uz"]), k=2
            )
            for rn, (d2, cid, lab) in enumerate(res, start=1):
                want.append(
                    (int(row["key"]), rn, int(np.int64(np.uint64(cid))), lab, d2)
                )
        assert got == sorted(want)
        assert len(got) > 0
