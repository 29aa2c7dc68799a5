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
    m, p = P.MUL[axis], P.MOD[axis]
    return (key * m % p) / (p / 2.0) - 1.0


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
