"""S2TextFormat (S2TextFormat.cs:69-398): the "lat:lng" debug text
codec the reference test suites use everywhere.  Having it makes
porting reference golden cases one-liners.

Grammar: points are "lat:lng" in degrees, separated by ", ";
polygons separate loops with "; ".  "empty"/"full" polygon keywords
are accepted.  ToDebugString formats are the inverse (shortest
round-trip via repr-style %.15g trimming like the reference)."""

from __future__ import annotations

import math

import numpy as np


def _parse_ll(tok: str) -> tuple[float, float]:
    lat_s, lng_s = tok.split(":")
    return float(lat_s), float(lng_s)


def parse_latlngs(text: str) -> list[tuple[float, float]]:
    """"lat:lng, lat:lng, ..." -> [(lat_deg, lng_deg), ...]."""
    out = []
    for tok in text.split(","):
        tok = tok.strip()
        if tok:
            out.append(_parse_ll(tok))
    return out


def ll_to_point(lat_deg: float, lng_deg: float) -> tuple[float, float, float]:
    phi = math.radians(lat_deg)
    theta = math.radians(lng_deg)
    cosphi = math.cos(phi)
    return (
        math.cos(theta) * cosphi,
        math.sin(theta) * cosphi,
        math.sin(phi),
    )


def make_point(text: str) -> tuple[float, float, float]:
    lls = parse_latlngs(text)
    assert len(lls) == 1, text
    return ll_to_point(*lls[0])


def parse_points(text: str) -> np.ndarray:
    """-> (n, 3) float64 unit vectors."""
    pts = [ll_to_point(la, lo) for la, lo in parse_latlngs(text)]
    return np.asarray(pts, dtype=np.float64).reshape(-1, 3)


def make_polyline(text: str) -> np.ndarray:
    return parse_points(text)


def make_loop(text: str):
    from .loop import Loop

    return Loop(parse_points(text))


def make_polygon(text: str):
    """Loops separated by "; "; "empty" -> [] ring list."""
    from .loop import Polygon

    text = text.strip()
    assert text not in ("", "empty"), "empty polygons are not supported"
    rings = [parse_points(part) for part in text.split(";") if part.strip()]
    return Polygon(rings)


def _fmt(v: float) -> str:
    """%.15g with the reference's trailing-zero behavior."""
    s = f"{v:.15g}"
    return s


def point_to_string(p) -> str:
    """Unit vector -> "lat:lng" (S2TextFormat.ToDebugString)."""
    lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
    lng = math.degrees(math.atan2(p[1], p[0]))
    return f"{_fmt(lat)}:{_fmt(lng)}"


def points_to_string(points) -> str:
    return ", ".join(point_to_string(p) for p in np.asarray(points))


def loop_to_string(loop) -> str:
    return points_to_string(loop.verts)


def polygon_to_string(polygon) -> str:
    return "; ".join(points_to_string(lp.verts) for lp in polygon.loops)
