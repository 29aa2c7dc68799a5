"""Deterministic synthetic region dim tables.

Same cross-engine-exact arithmetic discipline as sources/points.py: cap
centers come from the key-derived direction vectors (normalized with
the identical op order), radii from plain integer/double arithmetic, so
the DuckDB brute-force oracle reproduces the Spark join bit-for-bit.
"""

from __future__ import annotations

import math

from ..kernels.geom import Cap, LatLngRect
from . import points as P


def _component(key: int, axis: str) -> float:
    # non-negative keys only: Python % is floor-mod (sign of divisor)
    # while the Spark/DuckDB twins use C-style remainder (sign of
    # dividend), so a negative key would silently describe a different
    # point than the engines join against
    if key < 0:
        raise ValueError(f"region key must be non-negative, got {key}")
    m, p = P.MUL[axis], P.MOD[axis]
    # same mod-before-multiply order as points.component_col (int64
    # overflow safety there; kept identical here for the op-order
    # contract, and exact for all non-negative keys)
    return (key % p * m % p) / (p / 2.0) - 1.0


def _dlit(v: float) -> str:
    """Exact double literal: shortest repr parsed as DOUBLE (not
    DECIMAL) round-trips bit-exactly — load-bearing for the
    cross-engine identity contract, so there is exactly ONE copy."""
    return f"CAST('{v!r}' AS DOUBLE)"


def cap_params(key: int) -> tuple[float, float, float, float]:
    """(cx, cy, cz, r2) for the deterministic cap of integer `key`."""
    x0 = _component(key, "x")
    y0 = _component(key, "y")
    z0 = _component(key, "z")
    n = math.sqrt(x0 * x0 + y0 * y0 + z0 * z0)
    r2 = 0.0004 + (key % 7) * 0.003  # squared chord radius
    return x0 / n, y0 / n, z0 / n, r2


def synthetic_caps(keys) -> list[tuple[int, Cap]]:
    out = []
    for key in keys:
        cx, cy, cz, r2 = cap_params(int(key))
        out.append((int(key), Cap((cx, cy, cz), r2)))
    return out


def caps_sql_cte(table: str, key_expr: str, name: str = "ucaps") -> str:
    """DuckDB CTE producing identical normalized cap rows
    (region_id, cx, cy, cz, r2)."""
    xs = P.component_sql(key_expr, "x")
    ys = P.component_sql(key_expr, "y")
    zs = P.component_sql(key_expr, "z")
    return (
        f"{name} AS (SELECT region_id, x0/n AS cx, y0/n AS cy, z0/n AS cz, r2 "
        f"FROM (SELECT {key_expr} AS region_id, {xs} AS x0, {ys} AS y0, "
        f"{zs} AS z0, sqrt(({xs})*({xs}) + ({ys})*({ys}) + ({zs})*({zs})) AS n, "
        f"0.0004 + (({key_expr}) % 7) * 0.003 AS r2 FROM {table}))"
    )


def loop_vertices(key: int):
    """Deterministic regular-polygon loop around the key's direction.

    Trig runs ONCE here on the driver; the resulting float64 vertices are
    shared verbatim by the Spark side (broadcast) and the DuckDB oracle
    (literal VALUES via repr round-trip), so no cross-engine libm skew
    can enter the crossing tests.
    """
    import numpy as np

    from ..kernels import edges as E

    cx, cy, cz, _ = cap_params(key)
    c = (cx, cy, cz)
    u = E.ortho(c)
    v = E.cross(c, u)  # right-handed: theta goes CCW seen from outside
    radius = 0.05 + (key % 9) * 0.02  # radians, ~3..13 degrees
    nv = 4 + (key % 5)
    cr, sr = math.cos(radius), math.sin(radius)
    verts = []
    for k in range(nv):
        th = 2 * math.pi * k / nv
        ct, st = math.cos(th), math.sin(th)
        p = tuple(
            cr * c[i] + sr * (ct * u[i] + st * v[i]) for i in range(3)
        )
        n = math.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])
        verts.append((p[0] / n, p[1] / n, p[2] / n))
    return np.asarray(verts, dtype=np.float64)


def synthetic_loops(keys) -> list[tuple[int, "object"]]:
    """(key, Loop) pairs; CCW rings containing their center."""
    from ..kernels.loop import Loop

    return [(int(k), Loop(loop_vertices(int(k)))) for k in keys]


def loop_edges_sql_values(regions, name: str = "loop_edges") -> str:
    """DuckDB inline edge table with literal (bit round-trip) vertices:
    (region_id, cx.., dx.., origin_inside) one row per directed edge.
    Accepts Loop or multi-ring Polygon regions (any object with
    ``.edges`` and ``.origin_inside``)."""
    dlit = _dlit
    rows = []
    for rid, rg in regions:
        oi = 1 if rg.origin_inside else 0
        for c, d in rg.edges:
            rows.append(
                f"({rid}, {dlit(c[0])}, {dlit(c[1])}, {dlit(c[2])}, "
                f"{dlit(d[0])}, {dlit(d[1])}, {dlit(d[2])}, {oi})"
            )
    return (
        f"{name}(region_id, cx, cy, cz, dx, dy, dz, origin_inside) AS "
        f"(VALUES {', '.join(rows)})"
    )


def fractal_loop_vertices(key: int, n_vertices: int = 512):
    """Deterministic high-vertex-count simple loop: a star-shaped
    (radial-function) ring around the key's cap center whose radius
    wiggles with several harmonics — the synthetic stand-in for
    S2Testing.MakeFractal (Utils/S2Testing.cs:506) used to exercise the
    shape-index refine on many-edge polygons.  Radial polygons are
    always simple (no self-intersection) at any vertex count."""
    import numpy as np

    from ..kernels import edges as E

    cx, cy, cz, _ = cap_params(key)
    c = np.array([cx, cy, cz])
    u = np.array(E.ortho((cx, cy, cz)))
    v = np.cross(c, u)
    base = 0.05 + (key % 9) * 0.02
    th = 2 * np.pi * np.arange(n_vertices) / n_vertices
    r = base * (
        1.0
        + 0.35 * np.sin(7 * th + key)
        + 0.2 * np.sin(13 * th + 2 * key)
        + 0.1 * np.sin(29 * th + 3 * key)
    )
    pts = (
        np.cos(r)[:, None] * c[None, :]
        + np.sin(r)[:, None]
        * (np.cos(th)[:, None] * u[None, :] + np.sin(th)[:, None] * v[None, :])
    )
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    return pts.astype(np.float64)


CONCAVE_REGION_BASE = 100  # region_id >= this: concave buffer family


def concave_loop_fixtures() -> list[tuple[int, "np.ndarray"]]:
    """(region_id >= CONCAVE_REGION_BASE, CCW verts) concave loops for
    the winding-walk buffer path: five fractal stars, a courtyard
    whose mouth seals at BUFFER_RADIUS (pinching a hole ring), and a
    dumbbell whose bulb buffers merge across the neck."""
    import numpy as np

    from ..kernels import measures as M
    from ..kernels.textformat import ll_to_point

    def poly(lls):
        v = np.asarray([ll_to_point(a, b) for a, b in lls])
        if M.loop_signed_area(v) < 0:
            v = v[::-1]
        return v

    out = [
        (CONCAVE_REGION_BASE + k, fractal_loop_vertices(k, 48))
        for k in range(5)
    ]
    out.append(
        (
            CONCAVE_REGION_BASE + 5,
            poly(
                [(0, 0), (0, 40), (19.5, 40), (19.5, 30), (10, 30),
                 (10, 10), (30, 10), (30, 30), (20.5, 30), (20.5, 40),
                 (40, 40), (40, 0)]
            ),
        )
    )
    out.append(
        (
            CONCAVE_REGION_BASE + 6,
            poly(
                [(0, 0), (0, 10), (4.5, 10), (4.5, 30), (0, 30),
                 (0, 40), (10, 40), (10, 30), (5.5, 30), (5.5, 10),
                 (10, 10), (10, 0)]
            ),
        )
    )
    return out


def fractal_loops(keys, n_vertices: int = 512) -> list[tuple[int, "object"]]:
    """(key, Loop) pairs with `n_vertices` vertices each (CCW,
    center-containing)."""
    from ..kernels.loop import Loop

    return [
        (int(k), Loop(fractal_loop_vertices(int(k), n_vertices))) for k in keys
    ]


def synthetic_polygons(keys) -> list[tuple[int, "object"]]:
    """(key, Polygon) pairs: the key's loop as shell + a concentric
    ring at 40% radius as a hole (proper nesting; containment is the
    winding parity over both rings)."""
    import numpy as np

    from ..kernels.loop import Polygon

    out = []
    for k in keys:
        k = int(k)
        outer = loop_vertices(k)
        cx, cy, cz, _ = cap_params(k)
        c = np.array([cx, cy, cz])
        inner = outer * 0.4 + c[None, :] * 0.6
        inner /= np.linalg.norm(inner, axis=1)[:, None]
        out.append((k, Polygon([outer, inner])))
    return out


def polyline_vertices(key: int, variant: int = 0):
    """Deterministic 4-vertex zig-zag chain near the key's direction
    (driver trig once; float64 vertices shared verbatim by Spark and
    the SQL oracle, like loop_vertices).  variant=1 swaps the tangent
    basis, producing a perpendicular chain through the same center —
    guaranteed crossings with variant 0."""
    import numpy as np

    from ..kernels import edges as E

    cx, cy, cz, _ = cap_params(key)
    c = (cx, cy, cz)
    u = E.ortho(c)
    v = E.cross(c, u)
    if variant:
        u, v = v, u
    step = 0.03 + (key % 5) * 0.01
    # variant 2: perpendicular like variant 1 but skewed off the shared
    # center so every crossing with variant 0 is strictly interior
    # (general position) — variants 0/1 are mirror-symmetric through the
    # center, which puts vertices exactly on the other chain's edges
    du_off = 0.0137 * step if variant == 2 else 0.0
    dv_hi, dv_lo = (0.48, -0.52) if variant == 2 else (0.5, -0.5)
    verts = []
    for k in range(4):
        du = (k - 1.5) * step + du_off
        dv = (dv_hi if k % 2 else dv_lo) * step
        p = tuple(c[i] + du * u[i] + dv * v[i] for i in range(3))
        n = math.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])
        verts.append((p[0] / n, p[1] / n, p[2] / n))
    return np.asarray(verts, dtype=np.float64)


def polyline_edges(keys, variant: int = 0) -> list[tuple[int, int, tuple, tuple]]:
    """Flat directed-edge list [(line_id, edge_id, a, b)] for the
    deterministic polylines."""
    out = []
    for key in keys:
        verts = polyline_vertices(int(key), variant)
        for e in range(len(verts) - 1):
            out.append(
                (int(key), e, tuple(map(float, verts[e])), tuple(map(float, verts[e + 1])))
            )
    return out


def polyline_edges_sql_values(edges, name: str) -> str:
    """DuckDB inline table (line_id, edge_id, ax..az, bx..bz)."""
    dlit = _dlit
    rows = [
        f"({lid}, {eid}, {dlit(a[0])}, {dlit(a[1])}, {dlit(a[2])}, "
        f"{dlit(b[0])}, {dlit(b[1])}, {dlit(b[2])})"
        for lid, eid, a, b in edges
    ]
    return (
        f"{name}(line_id, edge_id, ax, ay, az, bx, by, bz) AS "
        f"(VALUES {', '.join(rows)})"
    )


def synthetic_rects(keys) -> list[tuple[int, LatLngRect]]:
    """Deterministic lat/lng rectangles (for pytest oracles)."""
    out = []
    for key in keys:
        k = int(key)
        lat0 = (k * 7919 % 140) - 70.0
        lat1 = lat0 + 2.0 + (k % 11)
        lng0 = (k * 104729 % 340) - 170.0
        lng1 = lng0 + 3.0 + (k % 17)
        out.append((k, LatLngRect.from_degrees(lat0, lng0, min(lat1, 89.0), min(lng1, 179.0))))
    return out
