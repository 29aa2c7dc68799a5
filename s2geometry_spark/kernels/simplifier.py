"""S2PolylineSimplifier: maximal-edge simplification with target /
avoid disc constraints (reference S2PolylineSimplifier.cs:43-334).

The machine maintains a window of acceptable output-edge bearings from
the source vertex; TargetDisc intersects the window with the angle
range subtended by a disc the edge must pass through, AvoidDisc cuts
out the range blocked by a disc the edge must miss on a required side
(the topology-preservation primitive under S2Builder's
simplify_edge_chains).  Semiwidths are rounded conservatively with the
reference's exact error budget (S2PolylineSimplifier.cs:240-320), so
accepted edges are guaranteed correct.

Driver-side kernel: runs per polyline inside Arrow batches (the
per-group shape is identical to kernels/polyline_ops.subsample_vertices,
which covers the unconstrained case).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .geom import S1Interval

_DBL_ERR = 0.5 * math.ulp(1.0)
_M_PI_2 = math.pi / 2


def _chord2(a, b) -> float:
    dx = a[0] - b[0]
    dy = a[1] - b[1]
    dz = a[2] - b[2]
    return dx * dx + dy * dy + dz * dz


def chord2_from_radians(radians: float) -> float:
    s = 2.0 * math.sin(0.5 * min(math.pi, max(0.0, radians)))
    return s * s


@dataclass
class _RangeToAvoid:
    interval: S1Interval
    on_left: bool


def _make_interval(lo: float, hi: float) -> S1Interval:
    """S1Interval(lo, hi) with the reference ctor's -pi normalization
    (S1Interval.cs: lo/hi of -pi map to pi unless the other end pins
    the orientation)."""
    if lo == -math.pi and hi != math.pi:
        lo = math.pi
    if hi == -math.pi and lo != math.pi:
        hi = math.pi
    return S1Interval(lo, hi)


def _complement(iv: S1Interval) -> S1Interval:
    if iv.lo == iv.hi:
        return S1Interval.full()
    return _make_interval(iv.hi, iv.lo)


class PolylineSimplifier:
    """Port of S2PolylineSimplifier (S2PolylineSimplifier.cs:43)."""

    def __init__(self, src) -> None:
        self.src = tuple(float(x) for x in src)
        self.window = S1Interval.full()
        self._ranges_to_avoid: list[_RangeToAvoid] = []
        # unnormalized tangent-space basis (reference ctor:68-93):
        # y = src x e_i for the smallest component i, x = y x src
        # written out component-wise so zero-products stay exact
        s = self.src
        t = (abs(s[0]), abs(s[1]), abs(s[2]))
        i = (0 if t[0] < t[2] else 2) if t[0] < t[1] else (
            1 if t[1] < t[2] else 2
        )
        j = 0 if i == 2 else i + 1
        k = 2 if i == 0 else i - 1
        y = [0.0, 0.0, 0.0]
        y[i] = 0.0
        y[j] = s[k]
        y[k] = -s[j]
        self._y_dir = tuple(y)
        x = [0.0, 0.0, 0.0]
        x[i] = s[j] * s[j] + s[k] * s[k]
        x[j] = -s[j] * s[i]
        x[k] = -s[k] * s[i]
        self._x_dir = tuple(x)

    def _direction(self, p) -> float:
        py = p[0] * self._y_dir[0] + p[1] * self._y_dir[1] + p[2] * self._y_dir[2]
        px = p[0] * self._x_dir[0] + p[1] * self._x_dir[1] + p[2] * self._x_dir[2]
        return math.atan2(py, px)

    def _semiwidth(self, p, r2: float, round_direction: int) -> float:
        """Half-angle subtended from src by a disc of chord2 radius r2
        at p, rounded conservatively (reference GetSemiwidth:240)."""
        a2 = _chord2(self.src, p)
        a2 -= 64.0 * _DBL_ERR * _DBL_ERR * round_direction
        if a2 <= r2:
            return math.pi  # disc contains src
        sin2_r = r2 * (1.0 - 0.25 * r2)
        sin2_a = a2 * (1.0 - 0.25 * a2)
        semiwidth = math.asin(math.sqrt(sin2_r / sin2_a))
        error = (2 * 10 + 4) * _DBL_ERR + 17 * _DBL_ERR * semiwidth
        return semiwidth + round_direction * error

    def extend(self, dst) -> bool:
        """True iff edge (src, dst) satisfies every constraint so far;
        edges longer than 90 degrees are unsupported."""
        if _chord2(self.src, dst) > 2.0:  # S1ChordAngle.Right
            return False
        d = self._direction(dst)
        if not self.window.contains(d):
            return False
        return all(
            not r.interval.contains(d) for r in self._ranges_to_avoid
        )

    def target_disc(self, p, r2: float) -> bool:
        """Require the output edge to pass through the disc (center p,
        squared-chord radius r2)."""
        semiwidth = self._semiwidth(p, r2, -1)
        if semiwidth >= math.pi:
            return True
        if semiwidth < 0:
            self.window = S1Interval.empty()
            return False
        center = self._direction(p)
        target = S1Interval.from_point(center).expanded(semiwidth)
        self.window = self.window.intersection(target)
        for r in self._ranges_to_avoid:
            self._avoid_range(r.interval, r.on_left)
        self._ranges_to_avoid.clear()
        return not self.window.is_empty()

    def avoid_disc(self, p, r2: float, disc_on_left: bool) -> bool:
        """Require the output edge to miss the disc, passing it on the
        given side (topology preservation)."""
        semiwidth = self._semiwidth(p, r2, 1)
        if semiwidth >= math.pi:
            self.window = S1Interval.empty()
            return False
        center = self._direction(p)
        dleft = _M_PI_2 if disc_on_left else semiwidth
        dright = semiwidth if disc_on_left else _M_PI_2
        avoid = _make_interval(
            math.remainder(center - dright, 2 * math.pi),
            math.remainder(center + dleft, 2 * math.pi),
        )
        if self.window.is_full():
            # cannot process until a TargetDisc narrows the window
            self._ranges_to_avoid.append(_RangeToAvoid(avoid, disc_on_left))
            return True
        self._avoid_range(avoid, disc_on_left)
        return not self.window.is_empty()

    def _avoid_range(self, avoid: S1Interval, disc_on_left: bool) -> None:
        # when avoid is a proper subset of the window only the interval
        # pointing toward the correct side survives (reference
        # AvoidRange:204-232 explains why the other is never usable)
        if self.window.contains_interval(avoid):
            if disc_on_left:
                self.window = _make_interval(self.window.lo, avoid.lo)
            else:
                self.window = _make_interval(avoid.hi, self.window.hi)
        else:
            self.window = self.window.intersection(_complement(avoid))


def simplify_polyline(verts, tolerance_rad: float) -> list[int]:
    """Greedy maximal-edge simplification: indices of a subsequence
    whose edges each pass within tolerance of every skipped vertex
    (the reference header's canonical usage loop,
    S2PolylineSimplifier.cs:11-24)."""
    import numpy as np

    V = [tuple(float(x) for x in v) for v in np.asarray(verts, float)]
    if len(V) <= 1:
        return list(range(len(V)))
    r2 = chord2_from_radians(tolerance_rad)
    out = [0]
    s = PolylineSimplifier(V[0])
    i = 1
    while i < len(V):
        if not s.extend(V[i]):
            if out[-1] != i - 1:
                out.append(i - 1)
            s = PolylineSimplifier(V[i - 1])
            if not s.extend(V[i]):
                # the single original edge is unsupported (> 90 deg,
                # extend's precondition): emit its endpoint and
                # restart from it — target_disc on such an edge would
                # leave asin's domain in _semiwidth
                if out[-1] != i:
                    out.append(i)
                s = PolylineSimplifier(V[i])
                i += 1
                continue
        s.target_disc(V[i], r2)
        i += 1
    if out[-1] != len(V) - 1:
        out.append(len(V) - 1)
    return out


def simplify_polyline_avoiding(
    verts, tolerance_rad: float, avoid_points
) -> list[int]:
    """Topology-preserving simplification: like simplify_polyline, but
    every output edge must also pass each nearby avoid-point on the
    SAME side the original polyline does — the S2Builder
    simplify_edge_chains discipline, using the disc_on_left recipe
    documented at S2PolylineSimplifier.cs AvoidDisc:163-175: a point X
    relevant to extending the chain A..C by D (i.e. with
    |AC| < |AX| < |AD|) is to the left of the polyline iff
    OrderedCCW(A, D, X, C).

    REQUIRES every avoid point to be farther than ``tolerance_rad``
    from the original polyline (as in the builder, where sites are
    separated from non-incident edges by min_edge_vertex_separation).
    """
    import numpy as np

    from .edges import compare_distances, ordered_ccw

    V = [tuple(float(x) for x in v) for v in np.asarray(verts, float)]
    X = [tuple(float(x) for x in p) for p in np.asarray(
        avoid_points, float
    ).reshape(-1, 3)]
    if len(V) <= 1:
        return list(range(len(V)))
    r2 = chord2_from_radians(tolerance_rad)

    def add_avoids(s, src, c_vert, d_vert):
        """Constrain the next Extend(d_vert) by the avoid points that
        become relevant along edge (c_vert, d_vert)."""
        ok = True
        for x in X:
            # compare_distances(a, x, b) == sign(|AX| - |AB|)
            if compare_distances(src, x, c_vert) <= 0:
                continue  # |AX| <= |AC|: already considered
            if compare_distances(src, x, d_vert) >= 0:
                continue  # |AX| >= |AD|: not relevant yet
            on_left = ordered_ccw(src, d_vert, x, c_vert)
            ok = s.avoid_disc(x, r2, on_left) and ok
        return ok

    out = [0]
    s = PolylineSimplifier(V[0])
    src = V[0]
    i = 1
    while i < len(V):
        add_avoids(s, src, V[i - 1], V[i])
        if not s.extend(V[i]):
            if out[-1] != i - 1:
                out.append(i - 1)
            src = V[i - 1]
            s = PolylineSimplifier(src)
            add_avoids(s, src, src, V[i])
            if not s.extend(V[i]):
                # the single original edge violates a constraint only
                # when an avoid point is within tolerance of it, which
                # the precondition excludes; keep the vertex and move on
                if out[-1] != i:
                    out.append(i)
                src = V[i]
                s = PolylineSimplifier(src)
                i += 1
                continue
        s.target_disc(V[i], r2)
        i += 1
    if out[-1] != len(V) - 1:
        out.append(len(V) - 1)
    return out
