"""Spherical convex hull: Andrew's monotone chain around a CCW-sort
origin (Query/S2ConvexHullQuery.cs:131-199 semantics).

Driver-side / grouped-kernel use: the hull of a group's points (e.g.
all images in a tile) — the distributed axis is the number of groups.
"""

from __future__ import annotations

import functools

import numpy as np

from . import edges as E
from .geom import Cap, normalize


def _cap_bound(points) -> Cap:
    cap = Cap((1.0, 0.0, 0.0), -1.0)
    for p in points:
        cap = cap.add_point(p)
    # grow to a conservative bound (AddPoint chain underestimates the
    # union slightly; expand like S2ConvexHullQuery.GetCapBound does via
    # cap union semantics — a small epsilon suffices for the origin
    # choice, which only needs "all points in one hemisphere around O")
    return Cap(cap.center, min(4.0, cap.radius2 * (1 + 1e-12) + 1e-15))


def convex_hull(points: np.ndarray) -> np.ndarray:
    """CCW hull loop vertices of unit points ((n,3) -> (h,3)).

    Requires the points to fit in a convex cap (hemisphere-ish); the
    reference returns the full loop otherwise — we raise instead, since
    our group hulls are always local.
    """
    pts = [tuple(float(x) for x in p) for p in np.asarray(points)]
    pts = list(dict.fromkeys(pts))  # dedup preserving order
    if len(pts) < 3:
        return np.asarray(pts, dtype=np.float64)
    cap = _cap_bound(pts)
    if 0.5 * cap.radius2 >= 1 - 10 * E.DBL_EPS:
        raise ValueError("point set spans more than a hemisphere")
    origin = E.ortho(normalize(cap.center))

    def cmp(a, b):
        if a == b:
            return 0
        s = E.sign(origin, a, b)
        return -1 if s > 0 else 1

    pts.sort(key=functools.cmp_to_key(cmp))

    def chain(seq):
        out: list = []
        for p in seq:
            while len(out) >= 2 and E.sign(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = chain(pts)
    upper = chain(list(reversed(pts)))
    hull = lower[:-1] + upper[:-1]
    return np.asarray(hull, dtype=np.float64)
