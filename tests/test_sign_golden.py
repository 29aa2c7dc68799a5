"""Reference golden cases for the robust Sign predicate
(S2PredicatesTests.cs:26-60 Test_Sign_CollinearPoints): exactly
collinear / exactly proportional triples must get a consistent nonzero
orientation via the symbolic-perturbation fallback."""

from __future__ import annotations

import math

from s2geometry_spark.kernels import edges as E


class TestSignCollinearGolden:
    def test_exactly_collinear_tangent_points(self):
        # S2PredicatesTests.cs:32-38 — c is the exact midpoint of ab
        a = (0.72571927877036835, 0.46058825605889098, 0.51106749730504852)
        b = (0.7257192746638208, 0.46058826573818168, 0.51106749441312738)
        c = (0.72571927671709457, 0.46058826089853633, 0.51106749585908795)
        assert tuple(ci - ai for ai, ci in zip(a, c)) == tuple(
            bi - ci for bi, ci in zip(b, c)
        )
        s = E.sign(a, b, c)
        assert s != 0
        assert E.sign(b, c, a) == s
        assert E.sign(c, b, a) == -s

    def test_exactly_proportional_points(self):
        # S2PredicatesTests.cs:45-51
        x1 = (0.99999999999999989, 1.4901161193847655e-08, 0.0)
        x2 = (1.0, 1.4901161193847656e-08, 0.0)
        nx1 = (-x1[0], -x1[1], -x1[2])
        s = E.sign(x1, x2, nx1)
        assert s != 0
        assert E.sign(x2, nx1, x1) == s
        assert E.sign(nx1, x2, x1) == -s

    def test_proportional_diagonal(self):
        # S2PredicatesTests.cs:55-60 analogue
        n = 1 / math.sqrt(3)
        x3 = (n, n, n)
        x4 = tuple(0.99999999999999989 * v for v in x3)
        nx3 = (-x3[0], -x3[1], -x3[2])
        s = E.sign(x3, x4, nx3)
        assert s != 0
        assert E.sign(x4, nx3, x3) == s
        assert E.sign(nx3, x4, x3) == -s


class TestOrthoTieBreak:
    """ortho/ref_dir must break |component| ties like the reference's
    LargestAbsComponent (Vector3.cs:71-90: strict >, so ties prefer
    the LATER axis) — np.argmax prefers the earlier axis and produced
    a different RefDir for cube-corner points."""

    def test_largest_abs_component_ties(self):
        from s2geometry_spark.kernels.edges import largest_abs_component

        assert largest_abs_component((1.0, 1.0, 1.0)) == 2
        assert largest_abs_component((1.0, 1.0, 0.5)) == 1
        assert largest_abs_component((1.0, 0.5, 1.0)) == 2
        assert largest_abs_component((2.0, 1.0, 1.0)) == 0
        assert largest_abs_component((1.0, 2.0, 2.0)) == 2
        assert largest_abs_component((-3.0, 2.0, 2.0)) == 0

    def test_ortho_cube_corner_matches_reference(self):
        import math

        from s2geometry_spark.kernels.edges import dot, ortho

        a = tuple(v / math.sqrt(3.0) for v in (1.0, 1.0, 1.0))
        got = ortho(a)
        # reference value computed by S2PointUtil.Ortho with
        # LargestAbsComponent == 2 (temp = [0.012, 1, 0.00457])
        assert abs(dot(got, a)) < 1e-15
        assert got[0] < 0 < got[2]  # later-axis tie-break orientation
        # Ortho(-a) == -Ortho(a) invariant
        na = tuple(-v for v in a)
        neg_got = ortho(na)
        for g, n in zip(got, neg_got):
            assert abs(g + n) < 1e-15
