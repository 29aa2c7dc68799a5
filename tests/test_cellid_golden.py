"""Golden unit tests ported from the reference suite (values verbatim;
cited file:line are in /root/reference/S2GeometryTests)."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernels import cellid as C
from s2geometry_spark.kernels import coords
from s2geometry_spark.kernels import hilbert as H


def arr(*vals, dtype=np.uint64):
    return np.array(vals, dtype=dtype)


class TestFaceDefinitions:
    # S2CellIdTests.cs:26-34 (via GetCellId(lat,lng).Face())
    def test_faces(self):
        lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        assert C.face(C.ll_to_cellid(lat, lon)).tolist() == [0, 1, 2, 3, 4, 5]


class TestParentChild:
    # S2CellIdTests.cs:46-70
    def test_bit_level(self):
        cid = C.from_face_pos_level(arr(3), arr(0x12345678), 26)
        assert C.is_valid(cid).all()
        assert C.face(cid)[0] == 3
        assert C.pos(cid)[0] == 0x12345700
        assert C.level(cid)[0] == 26
        assert not C.is_leaf(cid)[0]
        assert C.pos(C.child_begin(cid, 28))[0] == 0x12345610
        assert C.pos(C.child_begin(cid))[0] == 0x12345640
        assert C.pos(C.parent(cid))[0] == 0x12345400
        assert C.pos(C.parent(cid, 24))[0] == 0x12345000

    def test_child_ordering(self):
        cid = C.from_face_pos_level(arr(3), arr(0x12345678), 26)
        assert C.child_begin(cid)[0] < cid[0]
        assert C.child_end(cid)[0] > cid[0]
        nxt = C.next_id(C.next_id(C.next_id(C.next_id(C.child_begin(cid)))))
        assert nxt[0] == C.child_end(cid)[0]
        assert C.range_min(cid)[0] == C.child_begin(cid, 30)[0]
        assert C.next_id(C.range_max(cid))[0] == C.child_end(cid, 30)[0]

    def test_center_identity(self):
        # RangeMin + RangeMax == 2 * id (S2CellIdTests.cs:69)
        rng = np.random.default_rng(7)
        f = rng.integers(0, 6, 1000)
        i = rng.integers(0, 2**30, 1000)
        j = rng.integers(0, 2**30, 1000)
        leaf = H.from_face_ij(f, i, j)
        ids = C.parent(leaf, rng.integers(0, 31, 1000))
        assert (
            C.range_min(ids).astype(object) + C.range_max(ids).astype(object)
            == 2 * ids.astype(object)
        ).all()


class TestCenterSiTi:
    # S2CellIdTests.cs:80-116: si/ti of a level-k center end in 1
    # followed by (30-k) zeros.
    def test_siti_bits(self):
        cid = C.from_face_pos_level(arr(3), arr(0x12345678), 30)
        for lvl in [30, 29, 28, 20, 10, 0]:
            p = C.parent(cid, lvl)
            _, si, ti = C.center_siti(p)
            low = 1 << (30 - lvl)
            mask = (low << 1) - 1
            assert int(si[0]) & mask == low, lvl
            assert int(ti[0]) & mask == low, lvl


class TestInverses:
    # S2CellIdTests.cs:250-261, 200k random leaf round trips
    def test_leaf_latlng_roundtrip(self):
        rng = np.random.default_rng(42)
        n = 200_000
        f = rng.integers(0, 6, n)
        i = rng.integers(0, 2**30, n)
        j = rng.integers(0, 2**30, n)
        leaf = H.from_face_ij(f, i, j)
        assert C.is_leaf(leaf).all()
        assert (C.level(leaf) == 30).all()
        lat, lon = C.cellid_to_ll(leaf)
        assert (C.ll_to_cellid(lat, lon) == leaf).all()

    def test_face_ij_roundtrip(self):
        rng = np.random.default_rng(43)
        n = 100_000
        f = rng.integers(0, 6, n)
        i = rng.integers(0, 2**30, n)
        j = rng.integers(0, 2**30, n)
        leaf = H.from_face_ij(f, i, j)
        f2, i2, j2 = H.to_face_ij(leaf)
        assert (f2 == f).all() and (i2 == i).all() and (j2 == j).all()


class TestTokens:
    # S2CellIdTests.cs:264-299
    def test_roundtrip(self):
        rng = np.random.default_rng(44)
        n = 10_000
        leaf = H.from_face_ij(
            rng.integers(0, 6, n), rng.integers(0, 2**30, n), rng.integers(0, 2**30, n)
        )
        ids = C.parent(leaf, rng.integers(0, 31, n))
        toks = C.to_token(ids)
        assert max(len(t) for t in toks) <= 16
        assert (C.from_token(list(toks)) == ids).all()

    def test_none_and_invalid(self):
        assert C.to_token(arr(0))[0] == "X"
        assert C.from_token(["X"])[0] == 0
        sentinel = arr(C.SENTINEL_ID)
        assert C.from_token(list(C.to_token(sentinel)))[0] == C.SENTINEL_ID
        bad = C.from_token(["876b e99", "876bee99\n", "876[ee99", " 876bee99"])
        assert (bad == 0).all()


class TestOrdering:
    def test_biased_order_isomorphic(self):
        # FIXTURES.md §5: a face-5 cell must sort after a face-0 cell
        # under the biased signed key.
        f0 = C.from_face(np.array([0]))
        f5 = C.from_face(np.array([5]))
        assert C.bias(f5)[0] > C.bias(f0)[0]
        # raw signed comparison would be wrong:
        assert C.as_i64(f5)[0] < C.as_i64(f0)[0]

    def test_semi_open_range_pitfall(self):
        # leaf ids are 2 apart: range_max+1 can be a *valid* id of a
        # larger cell never contained by this one (S2CellId.cs:359-369)
        cid = C.from_face_pos_level(arr(1), arr(0x12345678), 10)
        limit = C.range_max(cid) + np.uint64(1)
        if C.is_valid(limit)[0]:
            assert C.level(limit)[0] < 30
            assert not C.contains(cid, limit)[0]


class TestCommonAncestor:
    def test_basic(self):
        a = C.from_face(np.array([0]))
        b = C.from_face(np.array([5]))
        assert C.common_ancestor_level(a, b)[0] == -1
        assert C.common_ancestor_level(a, a)[0] == 0
        cid = C.from_face_pos_level(arr(3), arr(0x12345678), 26)
        ch0 = C.child(cid, 0)
        ch3 = C.child(cid, 3)
        assert C.common_ancestor_level(ch0, ch3)[0] == 26
        assert C.common_ancestor_level(ch0, ch0)[0] == 27


class TestNeighbors:
    def test_edge_neighbors_level1(self):
        # Check the four neighbors of a face-1 level-1 center cell wrap
        # consistently: all distinct, all valid, all level 1.
        cid = C.parent(C.ll_to_cellid(np.array([0.0]), np.array([90.0])), 1)
        nbrs = C.edge_neighbors(cid)[0]
        assert len(set(nbrs.tolist())) == 4
        assert (C.level(nbrs) == 1).all()
        assert C.is_valid(nbrs).all()

    def test_all_neighbors_contract(self):
        # neighbors touch but do not contain the cell; counts >= 8
        rng = np.random.default_rng(45)
        leaf = H.from_face_ij(
            rng.integers(0, 6, 50),
            rng.integers(1, 2**30 - 1, 50),
            rng.integers(1, 2**30 - 1, 50),
        )
        ids = C.parent(leaf, 10)
        for cid, nbrs in zip(ids, C.all_neighbors(ids, 10)):
            uniq = np.unique(nbrs)
            assert len(uniq) >= 8
            one = np.full(uniq.shape, cid, np.uint64)
            assert not C.contains(uniq, one).any()
            assert not C.contains(one, uniq).any()

    def test_vertex_neighbors(self):
        cid = C.ll_to_cellid(np.array([12.0]), np.array([34.0]))
        vn = C.vertex_neighbors(cid, 5)[0]
        assert len(vn) in (3, 4)
        assert (C.level(vn) == 5).all()
        # the parent of the cell itself is among them
        assert C.parent(cid, 5)[0] in vn.tolist()


class TestSTtoIJRounding:
    # FIXTURES.md §5: STtoIJ uses round-half-to-even
    def test_banker_rounding_boundary(self):
        limit = 1 << 30
        # s chosen so limit*s - 0.5 is exactly k + 0.5 for k even and odd
        for k in [2, 3, 100, 101]:
            s = (k + 1.0) / limit  # limit*s - 0.5 == k + 0.5 exactly
            got = coords.st_to_ij(np.array([s]))[0]
            import math

            # .NET Math.Round / np.rint: half-to-even
            want = k if (k + 1) % 2 == 1 and k % 2 == 0 else k + 1
            expect = int(np.rint(limit * s - 0.5))
            assert got == min(max(expect, 0), limit - 1)
            # explicit: k+0.5 rounds to k when k even, k+1 when k odd
            assert got == (k if k % 2 == 0 else k + 1)
