"""Driver-precomputed literal-table oracles for queries whose kernels
are not directly SQL-expressible (order-dependent trig sums, codecs,
tessellation, exact-predicate hulls).

The correctness contract these provide: the *distributed* Spark result
must match, bit for bit, the same deterministic computation run once on
the driver (plus — where cheap — an independent SQL recomputation, e.g.
the image tile oracles re-derive every cell id through the DuckDB
recursive-CTE Hilbert pipeline of functions/duckdb_oracle.py and only
take the raw (x, y, z) / integer pixel sums as literals).  Float
literals are emitted with repr() (shortest round-trip) and CAST from
string, so DuckDB reconstructs the exact IEEE-754 bits.

Kernels referenced: S2LoopMeasures.cs, S2Polyline.cs,
S2PolylineAlignment.cs, S2ConvexHullQuery.cs, S2EdgeTessellator.cs (see
the individual kernel modules for file:line citations).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import pandas as pd

DEFAULT_ORACLE_SF = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    """The sf dir the driver's correctness gate reads (sf0.01 per the
    driver contract); tests override via SPARK_GRAFT_ORACLE_SF."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF") or DEFAULT_ORACLE_SF


# ---------------------------------------------------------------------
# VALUES emission
# ---------------------------------------------------------------------

def fmt_value(v, typ: str) -> str:
    if typ == "DOUBLE":
        return f"CAST('{float(v)!r}' AS DOUBLE)"
    if typ == "BIGINT":
        return f"CAST({int(v)} AS BIGINT)"
    if typ == "INT":
        return f"CAST({int(v)} AS INT)"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    raise ValueError(f"unsupported literal type {typ}")


def values_sql(rows, cols) -> str:
    """rows: iterable of tuples; cols: [(name, TYPE)] -> full SELECT."""
    cols = list(cols)
    body = ",\n".join(
        "(" + ",".join(fmt_value(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({names})"


def values_cte(rows, cols, name: str) -> str:
    cols = list(cols)
    body = ",".join(
        "(" + ",".join(fmt_value(v, t) for v, (_, t) in zip(r, cols)) + ")"
        for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    return f"{name}({names}) AS (SELECT * FROM (VALUES {body}))"


# ---------------------------------------------------------------------
# Shared input builders (single source of truth for the Spark queries
# in __spark_entry__ and the driver-side expected computations here)
# ---------------------------------------------------------------------

def boolean_pair_vertices() -> list[tuple]:
    """(pair_id, which, vtx_idx, x, y, z) rows: each loop paired with a
    tangent-shifted copy of itself."""
    from ..kernels import edges as KE
    from ..sources import regions_src as R

    rows = []
    for key in range(25):
        base = R.loop_vertices(key)
        cx, cy, cz, _ = R.cap_params(key)
        u = np.array(KE.ortho((cx, cy, cz)))
        shifted = base + u[None, :] * (0.04 + 0.01 * (key % 3))
        shifted = shifted / np.linalg.norm(shifted, axis=1)[:, None]
        for which, verts in ((0, base), (1, shifted)):
            for i, v in enumerate(verts):
                rows.append((key, which, i, float(v[0]), float(v[1]), float(v[2])))
    rows.extend(coincident_pair_vertices())
    return rows


SNAP_PAIR_BASE = 100  # pair_id >= this: snap-rounded boolean path


def _ll_square(lat0, lng0, lat1, lng1, jitter: float = 0.0):
    """CCW lat/lng-aligned square, optionally jittered per-vertex by
    ~jitter radians (deterministic pattern) — coincident-boundary
    inputs for the snap-rounding path."""
    from ..kernels import measures as M
    from ..kernels.textformat import ll_to_point

    corners = [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)]
    out = np.asarray([ll_to_point(la, ln) for la, ln in corners])
    if jitter:
        pat = np.asarray(
            [[1, -1, 1], [-1, 1, 1], [1, 1, -1], [-1, -1, -1]], float
        )
        out = out + jitter * pat
        out = out / np.linalg.norm(out, axis=1)[:, None]
    if M.loop_signed_area(out) < 0:
        out = out[::-1]
    return out


def coincident_pair_vertices() -> list[tuple]:
    """(pair_id, which, vtx_idx, x, y, z) rows for the coincident-
    boundary boolean family (pair_id >= SNAP_PAIR_BASE): loop pairs
    whose boundaries coincide only after snap rounding —
    identical-after-snap copies, rectangles sharing a jittered border,
    and partial-overlap T-vertex borders (the
    S2BooleanOperationTests.cs degeneracy families that require
    S2Builder)."""
    pairs = []
    for k in range(5):  # nearly identical loops
        base = _ll_square(3 * k, 10, 3 * k + 2, 12)
        jit = _ll_square(3 * k, 10, 3 * k + 2, 12, jitter=2e-10)
        pairs.append((SNAP_PAIR_BASE + k, base, jit))
    for k in range(5):  # adjacent squares sharing a full border
        a = _ll_square(3 * k, 20, 3 * k + 2, 22)
        b = _ll_square(3 * k, 22, 3 * k + 2, 24, jitter=3e-10)
        pairs.append((SNAP_PAIR_BASE + 5 + k, a, b))
    for k in range(2):  # partial shared border (T-vertices after snap)
        a = _ll_square(0, 30 + 8 * k, 4, 34 + 8 * k)
        b = _ll_square(1, 34 + 8 * k, 3, 36 + 8 * k, jitter=2e-10)
        pairs.append((SNAP_PAIR_BASE + 10 + k, a, b))
    rows = []
    for pid, a, b in pairs:
        for which, verts in ((0, a), (1, b)):
            for i, v in enumerate(verts):
                rows.append(
                    (pid, which, i, float(v[0]), float(v[1]), float(v[2]))
                )
    return rows


def dtw_pair_vertices() -> list[tuple]:
    """(line_id, which, vtx_idx, x, y, z) rows for the DTW query."""
    from ..sources import regions_src as R

    rows = []
    for variant in (0, 1):
        for key in range(25):
            for i, v in enumerate(R.polyline_vertices(key, variant)):
                rows.append((key, variant, i, float(v[0]), float(v[1]), float(v[2])))
    return rows


def polyline_measure_vertices() -> list[tuple]:
    """(line_id, vtx_idx, x, y, z) rows for the polyline-measures query."""
    from ..sources import regions_src as R

    rows = []
    for key in range(25):
        for i, v in enumerate(R.polyline_vertices(key)):
            rows.append((key, i, float(v[0]), float(v[1]), float(v[2])))
    return rows


# ---------------------------------------------------------------------
# Expected-row computations (driver-side mirrors of the grouped Arrow
# kernels in operators/measures_op.py)
# ---------------------------------------------------------------------

@lru_cache(maxsize=1)
def loop_measures_sql() -> str:
    from ..kernels import measures as M
    from ..sources import regions_src as R

    out = []
    for rid, lp in R.synthetic_loops(range(25)):
        verts = np.array(
            [[float(v[0]), float(v[1]), float(v[2])] for v in np.asarray(lp.verts)]
        )
        cen = M.loop_centroid(verts)
        out.append(
            (
                rid,
                M.loop_area(verts),
                M.loop_signed_area(verts),
                M.loop_perimeter(verts),
                M.loop_curvature(verts),
                cen[0],
                cen[1],
                cen[2],
            )
        )
    return values_sql(
        out,
        [
            ("region_id", "BIGINT"),
            ("area", "DOUBLE"),
            ("signed_area", "DOUBLE"),
            ("perimeter", "DOUBLE"),
            ("curvature", "DOUBLE"),
            ("centroid_x", "DOUBLE"),
            ("centroid_y", "DOUBLE"),
            ("centroid_z", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=1)
def polyline_measures_sql(probe=(0.0, 0.0, 1.0)) -> str:
    from ..kernels import polyline as PL

    byline: dict[int, list] = {}
    for lid, _idx, x, y, z in polyline_measure_vertices():
        byline.setdefault(lid, []).append((x, y, z))
    out = []
    for lid in sorted(byline):
        pl = PL.Polyline(np.asarray(byline[lid], dtype=np.float64))
        mid, nv = pl.interpolate(0.5)
        closest, _ = pl.project(probe)
        d = tuple(probe[i] - closest[i] for i in range(3))
        out.append(
            (
                lid,
                pl.length(),
                mid[0],
                mid[1],
                mid[2],
                pl.uninterpolate(mid, nv),
                (d[0] * d[0] + d[1] * d[1]) + d[2] * d[2],
            )
        )
    return values_sql(
        out,
        [
            ("line_id", "BIGINT"),
            ("length", "DOUBLE"),
            ("mid_x", "DOUBLE"),
            ("mid_y", "DOUBLE"),
            ("mid_z", "DOUBLE"),
            ("mid_frac_back", "DOUBLE"),
            ("proj_dist2", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=1)
def region_boolean_sql() -> str:
    from ..kernels import boolop as B
    from ..kernels.loop import Loop

    from ..kernels import snap as SN

    pdf = pd.DataFrame(
        boolean_pair_vertices(),
        columns=["pair_id", "which", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for pid, grp in pdf.groupby("pair_id"):
        grp = grp.sort_values(["which", "vtx_idx"])
        av = grp[grp["which"] == 0][["x", "y", "z"]].to_numpy()
        bv = grp[grp["which"] == 1][["x", "y", "z"]].to_numpy()
        a, b = Loop(av), Loop(bv)
        for op in (
            "intersection", "union", "difference", "symmetric_difference"
        ):
            if pid >= SNAP_PAIR_BASE:
                rings = SN.snapped_loop_boolean(
                    av, bv, op, SN.IntLatLngSnapFunction(7)
                )
            else:
                rings = B.loop_boolean(a, b, op)
            area = B.rings_area(rings)
            out.append((int(pid), op, len(rings), area))
    return values_sql(
        out,
        [
            ("pair_id", "BIGINT"),
            ("op", "VARCHAR"),
            ("n_rings", "INT"),
            ("area", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=1)
def dtw_alignment_sql() -> str:
    from ..kernels import alignment as AL

    pdf = pd.DataFrame(
        dtw_pair_vertices(),
        columns=["line_id", "which", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for lid, grp in pdf.groupby("line_id"):
        grp = grp.sort_values(["which", "vtx_idx"])
        a = grp[grp["which"] == 0][["x", "y", "z"]].to_numpy()
        b = grp[grp["which"] == 1][["x", "y", "z"]].to_numpy()
        cost, path = AL.alignment(a, b)
        acost, apath = AL.approx_alignment(a, b)
        out.append((int(lid), cost, len(path), acost, len(apath)))
    return values_sql(
        out,
        [
            ("line_id", "BIGINT"),
            ("cost", "DOUBLE"),
            ("path_len", "INT"),
            ("approx_cost", "DOUBLE"),
            ("approx_path_len", "INT"),
        ],
    )


@lru_cache(maxsize=4)
def convex_hull_sql(sf_dir: str, level: int = 1) -> str:
    """Expected per-tile customer hulls — mirrors q_convex_hull_tile +
    operators.measures_op.group_convex_hull on the driver."""
    import pyarrow.parquet as pq

    from ..kernels import cellid as C
    from ..kernels import hull as H
    from ..sources import points as P

    keys = (
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .column("c_custkey")
        .to_numpy()
        .astype(np.int64)
    )
    comps = {}
    for axis in ("x", "y", "z"):
        m, p = P.MUL[axis], P.MOD[axis]
        comps[axis] = ((keys * m) % p).astype(np.float64) / (p / 2.0) - 1.0
    cid = C.xyz_to_cellid(comps["x"], comps["y"], comps["z"])
    grp = C.as_i64(C.parent(cid, level))
    pdf = pd.DataFrame(
        {"grp": grp, "x": comps["x"], "y": comps["y"], "z": comps["z"]}
    )
    out = []
    for g, sub in pdf.groupby("grp"):
        sub = sub.sort_values(["x", "y", "z"], kind="mergesort")
        pts = sub[["x", "y", "z"]].to_numpy()
        pts = pts / np.sqrt((pts * pts).sum(axis=1))[:, None]
        hull = H.convex_hull(pts)
        for i, v in enumerate(hull):
            out.append((int(g), i, float(v[0]), float(v[1]), float(v[2])))
    return values_sql(
        out,
        [
            ("grp", "BIGINT"),
            ("vtx_idx", "INT"),
            ("x", "DOUBLE"),
            ("y", "DOUBLE"),
            ("z", "DOUBLE"),
        ],
    )


# ---------------------------------------------------------------------
# Image-table oracles: geotag (x, y, z) + integer pixel sums as
# literals, cell ids re-derived through the independent DuckDB Hilbert
# pipeline, float stats re-expressed as exact-integer divisions.
# ---------------------------------------------------------------------

@lru_cache(maxsize=2)
def _image_rows(n: int):
    from ..kernels import cellid as C
    from ..kernels import coords
    from ..sources import images as IMG

    lat, lon = IMG.geotags(n)
    x, y, z = coords.ll_to_xyz(lat, lon)
    cid = C.as_i64(C.ll_to_cellid(lat, lon))  # driver-side leaf cells
    sums = [IMG.pixel_sums(i) for i in range(n)]
    return x, y, z, cid, sums


def _image_pts_cte(n: int, with_sums: bool) -> str:
    x, y, z, _cid, sums = _image_rows(n)
    if with_sums:
        rows = [
            (
                i,
                x[i],
                y[i],
                z[i],
                sums[i]["sr"],
                sums[i]["sg"],
                sums[i]["sb"],
                sums[i]["w"] * sums[i]["h"],
            )
            for i in range(n)
        ]
        cols = [
            ("key", "BIGINT"),
            ("x", "DOUBLE"),
            ("y", "DOUBLE"),
            ("z", "DOUBLE"),
            ("sr", "BIGINT"),
            ("sg", "BIGINT"),
            ("sb", "BIGINT"),
            ("npx", "BIGINT"),
        ]
    else:
        rows = [(i, x[i], y[i], z[i]) for i in range(n)]
        cols = [
            ("key", "BIGINT"),
            ("x", "DOUBLE"),
            ("y", "DOUBLE"),
            ("z", "DOUBLE"),
        ]
    return values_cte(rows, cols, "pts")


def image_tile_counts_sql(n: int, level: int) -> str:
    """Tile histogram of the synthetic image table, with every cell id
    re-derived via the independent recursive-CTE Hilbert pipeline."""
    from . import duckdb_oracle as O

    return (
        "WITH RECURSIVE "
        + O.lookup_values_sql()
        + ", "
        + _image_pts_cte(n, with_sums=False)
        + ", "
        + O.cellid_pipeline_ctes()
        + f"\nSELECT {O.parent_sql('cell_id', level)} AS tile_id,"
        " COUNT(*) AS n FROM cells GROUP BY 1"
    )


def tile_mosaic_sql(n: int, level: int, max_images_per_tile: int = 256) -> str:
    """Per-tile image counts + exact per-channel pixel means (the
    scalar columns of tile_mosaics; the PNG raster itself is gated by
    pytest round-trip/PSNR tests)."""
    from . import duckdb_oracle as O

    # mirror the compose() cap: only the first `max_images_per_tile`
    # images by image_id contribute (image_id order == index order)
    x, y, z, cid, _sums = _image_rows(n)
    from ..kernels import cellid as C

    tiles = C.as_i64(C.parent(cid, level))
    seen: dict[int, int] = {}
    keep = np.zeros(n, dtype=bool)
    for i in range(n):  # index order == image_id lexicographic order
        t = int(tiles[i])
        c = seen.get(t, 0)
        if c < max_images_per_tile:
            keep[i] = True
            seen[t] = c + 1
    cap_filter = ""
    if not keep.all():
        kept_keys = ",".join(str(i) for i in range(n) if keep[i])
        cap_filter = f" WHERE p.key IN ({kept_keys})"
    return (
        "WITH RECURSIVE "
        + O.lookup_values_sql()
        + ", "
        + _image_pts_cte(n, with_sums=True)
        + ", "
        + O.cellid_pipeline_ctes()
        + f"""
SELECT {O.parent_sql('c.cell_id', level)} AS tile_id,
       COUNT(*) AS n_images,
       CAST(SUM(p.sr) AS DOUBLE) / CAST(SUM(p.npx) AS DOUBLE) AS mean_r,
       CAST(SUM(p.sg) AS DOUBLE) / CAST(SUM(p.npx) AS DOUBLE) AS mean_g,
       CAST(SUM(p.sb) AS DOUBLE) / CAST(SUM(p.npx) AS DOUBLE) AS mean_b
FROM cells c JOIN pts p ON p.key = c.key{cap_filter}
GROUP BY 1"""
    )


def img_features_sql(n: int) -> str:
    """Per-image feature stats from exact integer pixel sums computed
    straight off the generation formula (codec-independent), with the
    operator's float expressions mirrored term-for-term in SQL."""
    from ..sources import images as IMG

    rows = []
    for i in range(n):
        s = IMG.pixel_sums(i)
        rows.append(
            (
                s["image_id"],
                s["w"],
                s["h"],
                s["sr"],
                s["sg"],
                s["sb"],
                s["s1"],
                s["s2"],
                s["eh"],
                s["ev"],
                s["phash_check"],
            )
        )
    cols = [
        ("image_id", "VARCHAR"),
        ("w", "INT"),
        ("h", "INT"),
        ("sr", "BIGINT"),
        ("sg", "BIGINT"),
        ("sb", "BIGINT"),
        ("s1", "BIGINT"),
        ("s2", "BIGINT"),
        ("eh", "BIGINT"),
        ("ev", "BIGINT"),
        ("phash_check", "BOOLEAN"),
    ]
    base = values_cte(rows, cols, "raw")
    return f"""WITH {base},
m AS (
  SELECT *, w * h AS n, s1 / (3.0 * (w * h)) AS mean_gray FROM raw
)
SELECT image_id, w, h,
       sr / CAST(n AS DOUBLE) AS mean_r,
       sg / CAST(n AS DOUBLE) AS mean_g,
       sb / CAST(n AS DOUBLE) AS mean_b,
       mean_gray,
       CASE WHEN s2 / (9.0 * n) - mean_gray * mean_gray > 0
            THEN sqrt(s2 / (9.0 * n) - mean_gray * mean_gray)
            ELSE 0.0 END AS std_gray,
       (CASE WHEN w > 1 THEN eh / (3.0 * (w - 1) * h) ELSE 0.0 END)
     + (CASE WHEN h > 1 THEN ev / (3.0 * (h - 1) * w) ELSE 0.0 END)
       AS edge_energy,
       phash_check
FROM m"""


@lru_cache(maxsize=2)
def tile_extents_sql(n: int, level: int) -> str:
    """Expected exploded extent rings for every distinct tile of the
    image table — same scalar tessellation kernel run on the driver."""
    from ..kernels import cellid as C
    from ..operators.mosaic import tile_extent_ring

    _x, _y, _z, cid, _sums = _image_rows(n)
    tiles = sorted(set(int(t) for t in C.as_i64(C.parent(cid, level))))
    out = []
    for t in tiles:
        for i, (px, py) in enumerate(tile_extent_ring(t)):
            out.append((t, i, px, py))
    return values_sql(
        out,
        [
            ("tile_id", "BIGINT"),
            ("ring_idx", "INT"),
            ("x", "DOUBLE"),
            ("y", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=1)
def polyline_relations_sql() -> str:
    from ..kernels import polyline_ops as PO
    from ..operators.measures_op import POLY_REL_TOL

    pdf = pd.DataFrame(
        dtw_pair_vertices(),
        columns=["line_id", "which", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for lid, grp in pdf.groupby("line_id"):
        grp = grp.sort_values(["which", "vtx_idx"])
        base = grp[grp["which"] == 0][["x", "y", "z"]].to_numpy()
        other = grp[grp["which"] == 1][["x", "y", "z"]].to_numpy()
        idx = PO.subsample_vertices(base, POLY_REL_TOL)
        out.append(
            (
                int(lid),
                PO.polyline_intersects(base, other),
                PO.nearly_covers(base, base[idx], POLY_REL_TOL),
                len(idx),
            )
        )
    return values_sql(
        out,
        [
            ("line_id", "BIGINT"),
            ("intersects", "BOOLEAN"),
            ("covers_sub", "BOOLEAN"),
            ("n_sub", "INT"),
        ],
    )


BUFFER_RADIUS = 0.03
# contraction radius, kept below the smallest fixture inradius
# (key 0: square of circumradius 0.05 -> inradius ~0.035) so every
# shrink case leaves a validatable region
BUFFER_SHRINK_RADIUS = 0.02


@lru_cache(maxsize=1)
def buffer_case_vertices() -> list[tuple]:
    """(case_id, mode, which, vtx_idx, x, y, z) rows covering the full
    S2BufferOperation surface: grow (25 loops + the concave fixtures),
    shrink (contraction), polyline (stadium), point (disc) and union
    (loop + tangent-shifted copy through one winding walk)."""
    from ..kernels import edges as KE
    from ..sources import regions_src as R

    rows = []

    def add(cid, mode, which, verts):
        for i, v in enumerate(np.asarray(verts, dtype=np.float64)):
            rows.append(
                (int(cid), mode, int(which), i,
                 float(v[0]), float(v[1]), float(v[2]))
            )

    loops = [
        (rid, np.asarray(lp.verts))
        for rid, lp in R.synthetic_loops(range(25))
    ] + R.concave_loop_fixtures()
    for rid, verts in loops:
        add(rid, "grow", 0, verts)
    for rid, lp in R.synthetic_loops(range(25)):
        add(rid, "shrink", 0, np.asarray(lp.verts))
    for key in range(25):
        add(key, "polyline", 0, R.polyline_vertices(key))
        cx, cy, cz, _ = R.cap_params(key)
        add(key, "point", 0, np.array([[cx, cy, cz]]))
        base = R.loop_vertices(key)
        u = np.array(KE.ortho((cx, cy, cz)))
        shifted = base + u[None, :] * (0.04 + 0.01 * (key % 3))
        shifted = shifted / np.linalg.norm(shifted, axis=1)[:, None]
        add(key, "union", 0, base)
        add(key, "union", 1, shifted)
    return rows


@lru_cache(maxsize=1)
def buffer_cases_sql() -> str:
    """Driver recompute of every buffer case through the same golden-
    and Monte-Carlo-validated kernels (literal table)."""
    from ..kernels import buffer as BUF
    from ..kernels import measures as M

    by_case: dict[tuple[int, str], dict[int, list]] = {}
    for cid, mode, which, _i, x, y, z in buffer_case_vertices():
        by_case.setdefault((cid, mode), {}).setdefault(which, []).append(
            (x, y, z)
        )
    out = []
    for (cid, mode), groups in by_case.items():
        parts = [
            np.asarray(groups[w], dtype=np.float64)
            for w in sorted(groups)
        ]
        if mode == "grow":
            rings = BUF.buffer_loop_rings(parts[0], BUFFER_RADIUS, check=False)
            base = M.loop_area(parts[0])
        elif mode == "shrink":
            rings = BUF.buffer_polygon_rings(
                [parts[0]], -BUFFER_SHRINK_RADIUS, check=False
            )
            base = M.loop_area(parts[0])
        elif mode == "polyline":
            rings = BUF.buffer_polyline_rings(parts[0], BUFFER_RADIUS, check=False)
            base = 0.0
        elif mode == "point":
            rings = BUF.buffer_point_rings(parts[0][0], BUFFER_RADIUS, check=False)
            base = 0.0
        else:
            rings = BUF.buffer_shapes_union_rings(
                [("loop", g) for g in parts], BUFFER_RADIUS, check=False
            )
            base = sum(M.loop_area(g) for g in parts)
        # independent gate columns (r4 advice): the probe verdicts come
        # from the within-distance predicate alone (crossing parity +
        # point-to-edge distance), NOT from the constructed rings —
        # the distributed query must reproduce them by parity over the
        # rings it emits, so these columns catch shared constructive-
        # kernel bugs the recomputed n_ring/area columns cannot.
        P, expected = BUF.probe_gate(
            parts, mode, BUFFER_RADIUS, BUFFER_SHRINK_RADIUS
        )
        out.append(
            (
                cid,
                mode,
                sum(len(r) for r in rings),
                base,
                sum(M.loop_signed_area(r) for r in rings),
                len(P),
                int(expected.sum()),
            )
        )
    return values_sql(
        out,
        [
            ("case_id", "BIGINT"),
            ("mode", "VARCHAR"),
            ("n_ring", "INT"),
            ("area_base", "DOUBLE"),
            ("area_buffered", "DOUBLE"),
            ("n_probe", "INT"),
            ("n_probe_in", "INT"),
        ],
    )


def winding_group_vertices() -> list[tuple]:
    """(group_id, which, vtx_idx, x, y, z): each group's loop plus two
    tangent-shifted copies — three overlapping loops per group."""
    from ..kernels import edges as KE
    from ..sources import regions_src as R

    rows = []
    for key in range(25):
        base = R.loop_vertices(key)
        cx, cy, cz, _ = R.cap_params(key)
        u = np.array(KE.ortho((cx, cy, cz)))
        v = np.cross(np.array([cx, cy, cz]), u)
        for which, shift in enumerate(
            (0.0 * u, 0.035 * u, 0.02 * u + 0.03 * v)
        ):
            verts = base + shift[None, :]
            verts = verts / np.linalg.norm(verts, axis=1)[:, None]
            for i, p in enumerate(verts):
                rows.append(
                    (key, which, i, float(p[0]), float(p[1]), float(p[2]))
                )
    return rows


@lru_cache(maxsize=1)
def winding_groups_sql() -> str:
    from ..kernels import measures as M
    from ..kernels import winding as W

    pdf = pd.DataFrame(
        winding_group_vertices(),
        columns=["group_id", "which", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for gid, grp in pdf.groupby("group_id"):
        grp = grp.sort_values(["which", "vtx_idx"])
        loops = [
            g[["x", "y", "z"]].to_numpy() for _, g in grp.groupby("which")
        ]
        for name, rule in (
            ("union", "positive"), ("majority", 2), ("odd", "odd")
        ):
            rings = W.winding_operation(loops, rule)
            out.append(
                (
                    int(gid),
                    name,
                    len(rings),
                    sum(M.loop_signed_area(r) for r in rings),
                )
            )
    return values_sql(
        out,
        [
            ("group_id", "BIGINT"),
            ("rule", "VARCHAR"),
            ("n_rings", "INT"),
            ("area", "DOUBLE"),
        ],
    )


def _nest_ring(clat, clng, radius, n, reverse=False):
    import math

    from ..kernels.textformat import ll_to_point

    step = 2 * math.pi / n
    verts = [
        ll_to_point(
            clat + radius * math.sin(i * step),
            clng + radius * math.cos(i * step),
        )
        for i in range(n)
    ]
    if reverse:
        verts.reverse()
    return verts


def nesting_shape_vertices() -> list[tuple]:
    """(shape_id, which, vtx_idx, x, y, z) rows: 25 deterministic
    multi-ring shapes cycling through donut / button / deep-nest /
    twin-shell families for the shape-nesting query."""
    rows = []
    for sid in range(25):
        clat = 3.0 * (sid % 5) - 6.0
        clng = 7.0 * (sid // 5) - 14.0
        kind = sid % 4
        if kind == 0:  # donut
            rings = [
                _nest_ring(clat, clng, 1.0, 16),
                _nest_ring(clat, clng, 0.5, 16, reverse=True),
            ]
        elif kind == 1:  # button: shell + 3 holes
            rings = [_nest_ring(clat, clng, 2.0, 16)] + [
                _nest_ring(clat + dla, clng + dln, 0.3, 12, reverse=True)
                for dla, dln in ((0.8, 0), (-0.8, 0.4), (0, -0.9))
            ]
        elif kind == 2:  # nested, alternating orientation
            depth = 3 + (sid // 4) % 3
            rings = [
                _nest_ring(clat, clng, 2.0 / (i + 1), 16, reverse=i % 2 == 1)
                for i in range(depth)
            ]
        else:  # two independent shells facing away
            rings = [
                _nest_ring(clat, clng, 1.0, 16, reverse=True),
                _nest_ring(clat, clng, 0.5, 16),
            ]
        for which, verts in enumerate(rings):
            for i, v in enumerate(verts):
                rows.append(
                    (sid, which, i, float(v[0]), float(v[1]), float(v[2]))
                )
    return rows


@lru_cache(maxsize=1)
def shape_nesting_sql() -> str:
    from ..kernels.nesting import shape_nesting

    pdf = pd.DataFrame(
        nesting_shape_vertices(),
        columns=["shape_id", "which", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for sid, grp in pdf.groupby("shape_id"):
        grp = grp.sort_values(["which", "vtx_idx"])
        chains = [
            g[["x", "y", "z"]].to_numpy() for _, g in grp.groupby("which")
        ]
        rel = shape_nesting(chains)
        for i, r in enumerate(rel):
            out.append(
                (int(sid), i, r.parent, len(r.holes), r.is_shell())
            )
    return values_sql(
        out,
        [
            ("shape_id", "BIGINT"),
            ("chain_id", "INT"),
            ("parent", "INT"),
            ("n_holes", "INT"),
            ("is_shell", "BOOLEAN"),
        ],
    )


N_AUDIO = 400
N_VIDEO = 200


@lru_cache(maxsize=1)
def audio_features_sql() -> str:
    from ..kernels import wav as WAV
    from ..sources.media import audio_row_record

    out = []
    for i in range(N_AUDIO):
        rec = audio_row_record(i)
        samples, sr = WAV.decode_wav(rec["bytes"])
        f = WAV.audio_features(samples, sr)
        out.append(
            (
                rec["audio_id"], sr, f["n_samples"], f["duration_ms"],
                f["sum_sq"], f["sum_abs"], f["peak"],
                f["zero_crossings"], f["dom_freq_bin"],
                f["dom_freq_bin"] * sr / f["n_samples"],
            )
        )
    return values_sql(
        out,
        [
            ("audio_id", "VARCHAR"),
            ("sample_rate", "INT"),
            ("n_samples", "INT"),
            ("duration_ms", "BIGINT"),
            ("sum_sq", "BIGINT"),
            ("sum_abs", "BIGINT"),
            ("peak", "INT"),
            ("zero_crossings", "INT"),
            ("dom_freq_bin", "INT"),
            ("dom_freq_hz", "DOUBLE"),
        ],
    )


FRAME_SAMPLE_EVERY = 2


@lru_cache(maxsize=1)
def video_frame_stats_sql() -> str:
    from ..kernels import png as PNG
    from ..kernels import video as VID
    from ..sources.media import video_row_record

    out = []
    for i in range(N_VIDEO):
        rec = video_row_record(i)
        data = rec["bytes"]
        fps, n_frames, offsets, start = VID.video_header(data)
        for k in range(0, n_frames, FRAME_SAMPLE_EVERY):
            payload = data[start + offsets[k] : start + offsets[k + 1]]
            rgb = PNG.decode_png(payload)
            out.append(
                (
                    rec["video_id"], k, (k * 1000) // fps,
                    rgb.shape[1], rgb.shape[0],
                    int(rgb[:, :, 0].sum()), int(rgb[:, :, 1].sum()),
                    int(rgb[:, :, 2].sum()), PNG.fnv1a64(payload),
                )
            )
    return values_sql(
        out,
        [
            ("video_id", "VARCHAR"),
            ("frame_idx", "INT"),
            ("ts_ms", "BIGINT"),
            ("w", "INT"),
            ("h", "INT"),
            ("sum_r", "BIGINT"),
            ("sum_g", "BIGINT"),
            ("sum_b", "BIGINT"),
            ("frame_fnv", "BIGINT"),
        ],
    )


def simplify_vertices() -> list[tuple]:
    """(line_id, which, vtx_idx, x, y, z) rows for the
    polyline-simplify query: which=0 is a 10-vertex wiggly chain whose
    amplitude varies per line (some collapse at the fixed tolerance,
    some keep every bend), which=1 is a set of 3 obstacle points
    placed off the chain (topology constraints)."""
    import math

    import numpy as np

    from ..kernels import edges as E
    from ..sources.regions_src import cap_params

    tol = SIMPLIFY_TOL
    rows = []
    for key in range(25):
        cx, cy, cz, _ = cap_params(key)
        c = np.array((cx, cy, cz))
        u = np.asarray(E.ortho(tuple(c)))
        v = np.asarray(E.cross(tuple(c), tuple(u)))
        step = 0.02 + (key % 3) * 0.005
        amp = 0.002 + (key % 5) * 0.004
        for k in range(10):
            a_k = amp * (0.3 + 0.6 * (k % 3))
            d = c + u * ((k - 4.5) * step) + v * (a_k * (-1.0) ** k)
            d = d / np.linalg.norm(d)
            rows.append(
                (key, 0, k, float(d[0]), float(d[1]), float(d[2]))
            )
        off = tol + amp + 0.005
        for j in range(3):
            side = 1.0 if (key + j) % 2 == 0 else -1.0
            d = c + u * ((j - 1) * 2.0 * step) + v * (side * off)
            d = d / np.linalg.norm(d)
            rows.append(
                (key, 1, j, float(d[0]), float(d[1]), float(d[2]))
            )
    return rows


SIMPLIFY_TOL = 0.01  # radians


def polyline_simplify_sql() -> str:
    """Driver-precomputed mirror of operators.measures_op
    .simplify_lines over simplify_vertices()."""
    from ..kernels.simplifier import simplify_polyline_avoiding

    pdf = pd.DataFrame(
        simplify_vertices(),
        columns=["line_id", "which", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for lid, grp in pdf.groupby("line_id"):
        grp = grp.sort_values(["which", "vtx_idx"])
        verts = grp[grp["which"] == 0][["x", "y", "z"]].to_numpy()
        obs = grp[grp["which"] == 1][["x", "y", "z"]].to_numpy()
        idx = simplify_polyline_avoiding(verts, SIMPLIFY_TOL, obs)
        out.append(
            (
                int(lid),
                len(verts),
                len(idx),
                ",".join(str(i) for i in idx),
            )
        )
    return values_sql(
        out,
        [
            ("line_id", "BIGINT"),
            ("n_in", "INT"),
            ("n_kept", "INT"),
            ("kept_csv", "VARCHAR"),
        ],
    )


def shape_measure_chains() -> list[tuple]:
    """(shape_id, dimension, chain_id, vtx_idx, x, y, z) rows for the
    shape-measures query: 24 deterministic multi-chain shapes cycling
    through dimensions (points / polyline sets / multi-loop polygons)
    built from the cap directions."""
    import numpy as np

    from ..kernels import edges as E
    from ..sources.regions_src import cap_params

    rows = []
    for sid in range(24):
        dim = sid % 3
        cx, cy, cz, _ = cap_params(sid)
        c = np.array((cx, cy, cz))
        u = np.asarray(E.ortho(tuple(c)))
        v = np.asarray(E.cross(tuple(c), tuple(u)))
        n_chains = 1 + sid % 3
        size = 0.01 + (sid % 5) * 0.01
        for ch in range(n_chains):
            off = u * (ch * 3.0 * size)
            if dim == 0:
                pts = [c + off]
            elif dim == 1:
                pts = [
                    c + off + v * (k * size) for k in range(3 + ch)
                ]
            else:
                pts = [
                    c + off,
                    c + off + u * size,
                    c + off + u * size + v * size,
                    c + off + v * size,
                ]
                if ch % 2 == 1:
                    pts = pts[::-1]  # odd chains wind CW (holes)
            for k, p in enumerate(pts):
                p = p / np.linalg.norm(p)
                rows.append(
                    (sid, dim, ch, k, float(p[0]), float(p[1]), float(p[2]))
                )
    return rows


def shape_measures_sql() -> str:
    """Driver-precomputed mirror of operators.measures_op
    .shape_measures_rows over shape_measure_chains()."""
    from ..kernels import shape_measures as SM

    pdf = pd.DataFrame(
        shape_measure_chains(),
        columns=["shape_id", "dim", "chain_id", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for sid, grp in pdf.groupby("shape_id"):
        dim = int(grp["dim"].iloc[0])
        chains = [
            g.sort_values("vtx_idx")[["x", "y", "z"]].to_numpy()
            for _, g in grp.groupby("chain_id")
        ]
        sh = SM.MultiShape(dim, chains)
        cx, cy, cz = SM.shape_centroid(sh)
        out.append(
            (
                int(sid),
                dim,
                SM.shape_length(sh),
                SM.shape_perimeter(sh),
                SM.shape_area(sh),
                SM.shape_approx_area(sh),
                cx, cy, cz,
            )
        )
    return values_sql(
        out,
        [
            ("shape_id", "BIGINT"),
            ("dim", "INT"),
            ("length", "DOUBLE"),
            ("perimeter", "DOUBLE"),
            ("area", "DOUBLE"),
            ("approx_area", "DOUBLE"),
            ("cx", "DOUBLE"),
            ("cy", "DOUBLE"),
            ("cz", "DOUBLE"),
        ],
    )


def polygon_boundary_components() -> list[tuple]:
    """(group_id, comp_id, loop_id, vtx_idx, x, y, z) rows for the
    polygon-boundaries query: per group a two-sided outer square
    component, a nested two-sided inner square, and (odd groups) a
    degenerate single-loop component beside them."""
    import numpy as np

    from ..kernels import edges as E
    from ..sources.regions_src import cap_params

    rows = []
    for g in range(12):
        cx, cy, cz, _ = cap_params(g)
        c = np.array((cx, cy, cz))
        u = np.asarray(E.ortho(tuple(c)))
        v = np.asarray(E.cross(tuple(c), tuple(u)))
        s = 0.02 + (g % 4) * 0.01

        def square(center, half):
            pts = [
                center - u * half - v * half,
                center + u * half - v * half,
                center + u * half + v * half,
                center - u * half + v * half,
            ]
            return [p / np.linalg.norm(p) for p in pts]

        comps = []
        outer = square(c, s)
        comps.append([outer, outer[::-1]])
        inner = square(c, s * 0.4)
        comps.append([inner, inner[::-1]])
        if g % 2:
            spike = [
                (c + u * (3 * s)) / np.linalg.norm(c + u * (3 * s)),
                (c + u * (3.5 * s)) / np.linalg.norm(c + u * (3.5 * s)),
            ]
            comps.append([spike])
        for ci, comp in enumerate(comps):
            for li, loop in enumerate(comp):
                for k, p in enumerate(loop):
                    rows.append(
                        (g, ci, li, k, float(p[0]), float(p[1]), float(p[2]))
                    )
    return rows


def _boundary_faces(grp) -> list[str]:
    from ..kernels.nesting import build_polygon_boundaries

    comps = []
    for _, comp in sorted(grp.groupby("comp_id")):
        loops = [
            lg.sort_values("vtx_idx")[["x", "y", "z"]].to_numpy()
            for _, lg in sorted(comp.groupby("loop_id"))
        ]
        comps.append(loops)
    faces = build_polygon_boundaries(comps)
    return sorted(
        "|".join(f"{ci}.{li}" for ci, li in sorted(face))
        for face in faces
    )


def polygon_boundaries_sql() -> str:
    """Driver-precomputed mirror of operators.measures_op
    .polygon_boundary_faces over polygon_boundary_components()."""
    pdf = pd.DataFrame(
        polygon_boundary_components(),
        columns=["group_id", "comp_id", "loop_id", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for gid, grp in pdf.groupby("group_id"):
        for fi, face in enumerate(_boundary_faces(grp)):
            out.append((int(gid), fi, face))
    return values_sql(
        out,
        [
            ("group_id", "BIGINT"),
            ("face_idx", "INT"),
            ("face_loops", "VARCHAR"),
        ],
    )


# ---------------------------------------------------------------------
# S2Builder graph assembly (kernels/graph.py; Graph.cs loop/component/
# polyline assembly exposed as a per-case grouped operator)
# ---------------------------------------------------------------------

def graph_assembly_chains() -> list[tuple]:
    """(case_id, mode, [chain texts]) — deterministic edge-soup cases.

    Each case is an unordered multiset of chain fragments (rings split
    and interleaved, degenerate point edges, duplicated fragments, open
    filaments) whose assembly exercises one Graph output mode:
    directed loops, directed components (sibling CREATE), undirected
    complement pairs, and PATH / WALK polylines (Graph.cs:518-805,
    1481-1723)."""
    cases = []
    cid = 0
    for v in range(4):
        b = 8 * v  # shift each variant to distinct geometry
        dg = f"{b + 1}:{b + 1}, {b + 1}:{b + 1}"
        ring3 = [
            f"{b}:{b}, {b}:{b + 2}",
            f"{b}:{b + 2}, {b + 2}:{b + 2}, {b + 2}:{b}",
            f"{b + 2}:{b}, {b}:{b}",
        ]
        tri = f"{b + 3}:{b + 3}, {b + 3}:{b + 4}, {b + 4}:{b + 4}, {b + 3}:{b + 3}"
        nested = [
            f"{b}:{b}, {b}:{b + 6}, {b + 6}:{b + 6}",
            f"{b + 6}:{b + 6}, {b + 6}:{b}, {b}:{b}",
            f"{b + 1}:{b + 1}, {b + 1}:{b + 5}, {b + 5}:{b + 5}",
            f"{b + 5}:{b + 5}, {b + 5}:{b + 1}, {b + 1}:{b + 1}",
        ]
        star = [
            dg,
            f"{b}:{b}, {b}:{b}, {b}:{b + 1}, {b}:{b + 1}, {b}:{b + 2}, {b}:{b + 2}",
            dg,
        ]
        tree = [
            f"{b + 5}:{b + 5}, {b + 5}:{b + 6}, {b + 6}:{b + 6}",
            f"{b + 5}:{b + 6}, {b + 4}:{b + 6}",
        ]
        # interleave ring fragments so assembly must reorder
        loops_chains = [ring3[1], dg, ring3[2], tri, ring3[0]]
        if v == 3:
            loops_chains += [tri]  # duplicate ring: two identical loops
        cases.append((cid, "loops", loops_chains)); cid += 1
        open_chain = f"{b}:{b + 3}, {b + 1}:{b + 3}, {b + 1}:{b + 4}"
        cases.append(
            (cid, "components", [ring3[2], open_chain, dg, ring3[0],
                                 ring3[1]])); cid += 1
        cases.append((cid, "undirected", [nested[2], dg, nested[0],
                                          nested[3], nested[1]])); cid += 1
        cases.append((cid, "paths", star + tree)); cid += 1
        cases.append((cid, "walks", star + tree)); cid += 1
    return cases


def graph_assembly_vertex_rows() -> list[tuple]:
    """Flattened (case_id, mode, chain_id, vtx_idx, x, y, z) rows for
    the distributed operator's input DataFrame."""
    from ..kernels.textformat import parse_points

    rows = []
    for cid, mode, texts in graph_assembly_chains():
        for chain_id, text in enumerate(texts):
            for vi, p in enumerate(parse_points(text)):
                rows.append((cid, mode, chain_id, vi,
                             float(p[0]), float(p[1]), float(p[2])))
    return rows


def graph_assembly_sql() -> str:
    """Driver-precomputed mirror of operators.measures_op
    .graph_assembly_rows over graph_assembly_chains()."""
    from ..kernels import graph as G
    from ..kernels.textformat import parse_points

    out = []
    for cid, mode, texts in graph_assembly_chains():
        chains = [[tuple(p) for p in parse_points(t)] for t in texts]
        for idx, (sig, n) in enumerate(G.assemble_chains(mode, chains)):
            out.append((cid, mode, idx, sig, n))
    return values_sql(
        out,
        [
            ("case_id", "BIGINT"),
            ("mode", "VARCHAR"),
            ("chain_idx", "INT"),
            ("chain_sig", "VARCHAR"),
            ("n_edges", "INT"),
        ],
    )


# ---------------------------------------------------------------------
# Mixed-dimension boolean operations (kernels/mixed_boolop.py)
# ---------------------------------------------------------------------

MIXED_BOOL_OPS = (
    "union", "intersection", "difference", "symmetric_difference"
)


def mixed_boolean_cases() -> list[tuple]:
    """(case_id, a, b, polygon_model, polyline_model,
    loops_have_boundaries, split_all, snap_e) — a deterministic slice
    of the reference's S2BooleanOperation model battery
    (S2BooleanOperationTests.cs:57-1055)."""
    vp = ("0:0, 0:1, 0:2, 0:3, 0:4, 0:5, "
          "5:5, 5:4, 5:3, 5:2, 5:1, 5:0")
    pvp_a = ("# 1:1, 0:1 | 0:2, 1:2 | -1:3, 0:3 | 0:4, -1:4 "
             "| 6:1, 5:1 | 5:2, 6:2 | 4:3, 5:3 | 5:4, 4:4 #")
    pts_a = "0:0 | 1:0 | 2:0 | 3:0 | 4:0 | 5:0 # #"
    lines_b = "# 0:0, 1:0, 2:0 | 3:0, 3:0 | 4:0, 5:0, 4:0 #"
    loop_a = "# 0:0, 0:1, 1:0, 0:0 | 2:2, 2:3, 3:2, 2:2 #"
    loop_b = "# 0:0, 0:0 | 0:0, 0:1 | 2:2, 2:2 | 2:2, 3:2 #"
    rows = []
    cid = 0

    def add(a, b, pm="semi_open", lm="closed", lb=True, split=False,
            snap=None):
        nonlocal cid
        rows.append((cid, a, b, pm, lm, lb, split, snap))
        cid += 1

    add("0:0 | 1:0 # #", "0:0 | 2:0 # #")
    add("# # 0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 3:3; 6:6; 7:7, 8:8", "# #")
    for lm in ("open", "semi_open", "closed"):
        add(pts_a, lines_b, lm=lm)
        add(loop_a, loop_b, lm=lm)
    add(pts_a, lines_b, lm="open", lb=False)
    add(loop_a, loop_b, lm="closed", lb=False)
    add("1:1 | 4:4 # #", "# # 0:0, 0:3, 3:0")
    for pm in ("open", "semi_open", "closed"):
        add("0:1 | 1:0 # #", "# # 0:0, 0:1, 1:0", pm=pm)
        add(pvp_a, "# # " + vp, pm=pm)
        add("# 1:1, 1:3, 3:3 | 3:3, 1:3 # ",
            "# # 1:1, 1:3, 3:3, 3:1", pm=pm)
        add("# # 0:0, 0:4, 2:4, 2:0",
            "# # 0:0, 1:1, 2:0; 0:4, 1:5, 2:4", pm=pm)
        add("# # 0:0, 0:5, 1:5, 0:0, 2:5, 3:5",
            "# # 0:0, 5:3, 5:2", pm=pm)
    add("# 0:0, 2:2 #", "# 2:0, 0:2 #", snap=1)
    add("# # 0:0, 0:2, 2:2, 2:0", "# # 1:1, 1:3, 3:3, 3:1", snap=2)
    add("# # 0:-1, 0:1, 0.1:1, 0.1:-1",
        "# # -1:0.1, 1:0.1, 1:0, -1:0", snap=0)
    add("# 0:2, 4:2, 2:0, 2:5 #", "# 0:4, 5:4, 3:6, 3:3 #",
        snap=1, split=True)
    add("# # 0:0, 0:4, 4:4, 4:0",
        "# # 1:1, 1:2, 2:2, 2:1; 5:5, 5:6, 6:6, 6:5")
    add("# 0:0, 0:10, 0:4 # ", "# # 0:0, -5:5, 5:5", snap=1)
    return rows


def mixed_boolean_input_rows() -> list[tuple]:
    """One input row per (case, op) for the distributed operator."""
    out = []
    for row in mixed_boolean_cases():
        for op in MIXED_BOOL_OPS:
            out.append(row[:1] + (op,) + row[1:])
    return out


def mixed_boolean_sql() -> str:
    """Driver-precomputed mirror of operators.measures_op
    .mixed_boolean_rows over mixed_boolean_cases()."""
    from ..kernels import mixed_boolop as MBK

    out = []
    for (cid, a, b, pm, lm, lb, split, snap) in mixed_boolean_cases():
        options = MBK.Options(
            polygon_model=pm, polyline_model=lm,
            polyline_loops_have_boundaries=lb,
            split_all_crossing_polyline_edges=split,
            snap_exponent=snap,
        )
        ga, gb = MBK.parse_index(a), MBK.parse_index(b)
        for op in MIXED_BOOL_OPS:
            result = MBK.boolean_operation(ga, gb, op, options)
            for dim, n, sig in MBK.signature_rows(result):
                out.append((cid, op, dim, n, sig))
    return values_sql(
        out,
        [
            ("case_id", "BIGINT"),
            ("op", "VARCHAR"),
            ("dim", "INT"),
            ("n_items", "INT"),
            ("sig", "VARCHAR"),
        ],
    )


VALIDITY_CASES = (
    # FindSelfIntersection_Basic battery
    # (S2ShapeUtilVisitCrossingEdgePairsTests.cs:36-45)
    "0:0, 0:1, 0:2, 1:2, 1:1, 1:0",                  # valid
    "0:0, 0:1, 0:2, 1:2, 0:1, 1:0",                  # duplicate vertex
    "0:0, 0:1, 1:0, 1:1",                            # edge crossing
    "0:0, 1:1, 0:1; 0:0, 1:1, 1:0",                  # duplicate edge
    "0:0, 1:1, 0:1; 1:1, 0:0, 1:0",                  # reversed edge
    "0:0, 0:2, 2:2, 2:0; 1:1, 0:2, 3:1, 2:0",        # vertex crossing
    # valid multi-loop nesting (shell; shell; hole-side shell)
    "0:1, 1:1, 0:0; 3:3, 3:6, 6:6, 6:3; 4:4, 4:5, 5:5, 5:4",
)


def validity_polygon_vertices() -> list[tuple]:
    """(poly_id, chain_id, vtx_idx, x, y, z) rows: the ported
    FindSelfIntersection_Basic polygon family, each under several
    cyclic vertex rotations (the reference test checks every rotation;
    three per case keep the driver table small while still exercising
    rotation-dependent classification)."""
    from ..kernels.textformat import parse_points

    rows = []
    pid = 0
    for s in VALIDITY_CASES:
        loops = [parse_points(p) for p in s.split(";") if p.strip()]
        for rot in range(3):
            for ci, lv in enumerate(loops):
                k = rot % len(lv)
                rolled = np.roll(lv, -k, axis=0)
                for i, v in enumerate(rolled):
                    rows.append(
                        (pid, ci, i,
                         float(v[0]), float(v[1]), float(v[2]))
                    )
            pid += 1
    return rows


@lru_cache(maxsize=1)
def polygon_validate_sql() -> str:
    from ..kernels import validity as V

    pdf = pd.DataFrame(
        validity_polygon_vertices(),
        columns=["poly_id", "chain_id", "vtx_idx", "x", "y", "z"],
    )
    out = []
    for pid, grp in pdf.groupby("poly_id"):
        chains = [
            cg.sort_values("vtx_idx")[["x", "y", "z"]].to_numpy()
            for _, cg in sorted(grp.groupby("chain_id"))
        ]
        n_chains, n_edges, n_pairs, code = V.validate_chains(chains)
        out.append((int(pid), n_chains, n_edges, n_pairs, code))
    return values_sql(
        out,
        [
            ("poly_id", "BIGINT"),
            ("n_chains", "INT"),
            ("n_edges", "INT"),
            ("n_crossing_pairs", "INT"),
            ("error_code", "VARCHAR"),
        ],
    )


BUILDER_SIMPLIFY_CASES = (
    # (snap_deg, intlatlng_e, split, simplify, chains) — the reference
    # Simplify* golden inputs (S2BuilderTests.cs:690-886), plus
    # snap-ONLY cases (simplify=False) that gate the snap-rounding
    # pipeline itself through the driver oracle.  Snap function
    # encoding: intlatlng_e >= 0 -> IntLatLngSnapFunction(e);
    # snap_deg < 0 -> S2CellIdSnapFunction(level=-snap_deg);
    # else IdentitySnapFunction(radians(snap_deg)).
    (1.0, -1, False, True, ("0:0, 1:0.5, 2:-0.5, 3:0.5, 4:-0.5, 5:0",)),
    (1.0, -1, False, True, ("0:180, 0:1e-09, 32:32",)),
    (0.5, -1, True, True,
     ("-2:-1, -1:0, 1:0, 2:1", "1:-2, 0:-1, 0:1, -1:2")),
    (0.5, -1, False, True,
     ("-4:0.83, -3:0.46, -2:0.2, -1:0.05, 0:0, 1:0.5, 2:0.2, 3:0.46, "
      "4:0.83",
      "4:.83, 3:.46, 2:.2, 1:.05, 0:0, -1:.5, -2:.2, -3:.46, -4:.83")),
    (1.0, -1, False, True, ("0:-10, 0.99:0, 0:10", "-5:-5, -0.2:0, -5:5")),
    (0.5, -1, False, True,
     ("0:0, 1:0, 2:0, 3:0, 4:0, 5:0, 4:0, 3:0, 2:0, 3:0, 4:0, 5:0, "
      "6:0, 7:0",)),
    (1.0, -1, False, True, ("0:0, 1:0.1, 1:2", "0:1.05, -10:1.05")),
    (0.0, 0, False, True, ("-30.49:-29.51, 29.51:30.49",)),
    # --- snap-only (round 4): site merging within the snap radius ---
    (1.0, -1, False, False, ("0:0, 0:0.4, 0:1.1, 0:2.3",)),
    # S2CellId snap at level 10: vertices snap to cell centers
    (-10.0, -1, False, False, ("1:1, 1.3:1.7, 2:2, 3:1.2",)),
    # IntLatLng exponent-2 grid rounding
    (0.0, 2, False, False, ("0.004:0.004, 0.126:0.504, 0.496:0.874",)),
    # crossing edges with split_crossing_edges: intersection sites
    (0.1, -1, True, False, ("-1:0, 1:0", "0:-1, 0:1")),
)


def builder_simplify_vertices() -> list[tuple]:
    """(case_id, chain_id, vtx_idx, x, y, z, snap_deg, intlatlng_e,
    split, simplify) rows for the snap(+simplify) builder query."""
    from ..kernels.textformat import parse_points

    rows = []
    for cid, (snap_deg, e, split, simplify, chains) in enumerate(
            BUILDER_SIMPLIFY_CASES):
        for ci, s in enumerate(chains):
            for i, v in enumerate(parse_points(s)):
                rows.append(
                    (cid, ci, i, float(v[0]), float(v[1]), float(v[2]),
                     snap_deg, e, split, simplify)
                )
    return rows


@lru_cache(maxsize=1)
def builder_simplify_sql() -> str:
    import math

    from ..kernels import builder_layers as BLK
    from ..kernels import graph as GK
    from ..kernels import snap as SNK
    from ..kernels.textformat import parse_points

    out = []
    for cid, (snap_deg, e, split, simplify, chains) in enumerate(
            BUILDER_SIMPLIFY_CASES):
        if e >= 0:
            snap_fn = SNK.IntLatLngSnapFunction(e)
        elif snap_deg < 0:
            snap_fn = SNK.S2CellIdSnapFunction(int(-snap_deg))
        else:
            snap_fn = SNK.IdentitySnapFunction(math.radians(snap_deg))
        b = SNK.Builder(
            snap_fn, split_crossing_edges=split,
            simplify_edge_chains=simplify,
        )
        opts = GK.GraphOptions(
            GK.DIRECTED, GK.DEGENERATE_DISCARD, GK.DUPLICATE_KEEP,
            GK.SIBLING_KEEP,
        )
        lays = []
        for s in chains:
            lays.append(b.start_layer(opts))
            b.add_polyline(parse_points(s))
        b.build()
        for lay in lays:
            res = BLK.polyline_layer(b, lay)
            out.append(
                (cid, lay, len(res.vertices), res.to_debug_string())
            )
    return values_sql(
        out,
        [
            ("case_id", "BIGINT"),
            ("layer_id", "INT"),
            ("n_vertices", "INT"),
            ("verts", "VARCHAR"),
        ],
    )


@lru_cache(maxsize=2)
def cap_coverings_sql(sf_dir: str, modulus: int = 150, max_cells: int = 8) -> str:
    """Expected coverings for q_s2_covering — the driver recomputes the
    same deterministic caps through the SAME shared row generator
    (operators.coverings.covering_kind_rows; S2RegionCoverer.cs
    semantics, golden-matched in tests/test_coverer_golden.py) and
    emits them as literal rows; the correctness contract is
    distributed == single-node, in the exact reference refinement
    order (`ord`)."""
    import pyarrow.parquet as pq

    from ..kernels.coverer import CovererOptions, RegionCoverer
    from ..operators.coverings import covering_kind_rows

    keys = (
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .column("c_custkey")
        .to_numpy()
        .astype(np.int64)
    )
    keys = sorted(int(k) for k in keys if k % modulus == 0)
    rc = RegionCoverer(CovererOptions(max_cells=max_cells))
    rc_canon = RegionCoverer(
        CovererOptions(max_cells=6, min_level=2, level_mod=2)
    )

    def i64(c):
        return int(np.int64(np.uint64(c)))

    rows = []
    for key in keys:
        rows.extend(covering_kind_rows(key, rc, rc_canon, i64))
    
    return values_sql(
        rows,
        [
            ("key", "BIGINT"),
            ("kind", "VARCHAR"),
            ("ord", "INT"),
            ("cell_id", "BIGINT"),
        ],
    )


def _sampled_leaf_cells(sf_dir: str, table: str, col: str, modulus: int):
    """Sorted sampled keys and their leaf cell ids, derived exactly as
    sources.points.with_xyz + the encode kernel do distributed."""
    import pyarrow.parquet as pq

    from ..kernels import cellid as C
    from ..sources import points as P

    keys = (
        pq.read_table(f"{sf_dir}/{table}.parquet", columns=[col])
        .column(col)
        .to_numpy()
        .astype(np.int64)
    )
    keys = np.sort(keys[keys % modulus == 0])
    comps = {}
    for axis in ("x", "y", "z"):
        m, p = P.MUL[axis], P.MOD[axis]
        comps[axis] = ((keys * m) % p).astype(np.float64) / (p / 2.0) - 1.0
    leaf = C.xyz_to_cellid(comps["x"], comps["y"], comps["z"])
    return keys, leaf, comps


def _sampled_unit_points(sf_dir: str, table: str, col: str, modulus: int):
    """(keys, ux, uy, uz): sampled keys with UNIT direction vectors in
    the exact association order of operators.spatial_join.normalized_cols
    ((x*x + y*y) + z*z) — the single definition every literal oracle
    shares so no copy can drift off the bit-exact normalization."""
    keys, leaf, comps = _sampled_leaf_cells(sf_dir, table, col, modulus)
    n = np.sqrt(
        comps["x"] * comps["x"] + comps["y"] * comps["y"]
        + comps["z"] * comps["z"]
    )
    return keys, comps["x"] / n, comps["y"] / n, comps["z"] / n


@lru_cache(maxsize=2)
def cell_pair_distances_sql(sf_dir: str, modulus: int = 25, level: int = 8) -> str:
    """Expected min/max cell↔cell squared-chord distances for
    q_s2_cell_distance (S2Region/S2Cell.cs Distance/MaxDistance),
    recomputed on the driver through the same golden-tested kernels."""
    from ..kernels import cellid as C
    from ..kernels.cell_dist import (
        cell_distance_to_cell,
        cell_max_distance_to_cell,
    )
    from ..kernels.geom import Cell

    keys, leaf, _ = _sampled_leaf_cells(sf_dir, "orders", "o_orderkey", modulus)
    par = C.parent(leaf, level)
    rows = []
    for i in range(len(keys) - 1):
        ca, cb = Cell(par[i].item()), Cell(par[i + 1].item())
        rows.append(
            (
                int(keys[i]),
                int(np.int64(par[i])),
                int(np.int64(par[i + 1])),
                cell_distance_to_cell(ca, cb),
                cell_max_distance_to_cell(ca, cb),
            )
        )
    return values_sql(
        rows,
        [
            ("key", "BIGINT"),
            ("cell_a", "BIGINT"),
            ("cell_b", "BIGINT"),
            ("min_d2", "DOUBLE"),
            ("max_d2", "DOUBLE"),
        ],
    )


def cell_union_areas_sql(sf_dir: str, modulus: int = 25, level: int = 8) -> str:
    """Expected cell / cell-union area columns for the areas arm of
    q_cell_distance_geometry (S2Cell Average/Approx/ExactArea +
    S2CellUnion LeafCellsCovered / ExactArea), recomputed on the
    driver through the same golden-tested kernels and sampling."""
    from ..kernels import cellid as C
    from ..kernels import cellunion as CU
    from ..kernels.geom import (
        Cell, cell_approx_area, cell_average_area, cell_exact_area,
    )

    keys, leaf, _ = _sampled_leaf_cells(sf_dir, "orders", "o_orderkey", modulus)
    par = C.parent(leaf, level)
    rows = []
    for i in range(len(keys) - 1):
        ca = Cell(par[i].item())
        un = CU.normalize([par[i].item(), par[i + 1].item()])
        rows.append(
            (
                int(keys[i]),
                cell_average_area(ca.level),
                cell_approx_area(ca),
                cell_exact_area(ca),
                float(CU.leaf_cells_covered(un)),
                sum(cell_exact_area(Cell(c)) for c in un),
            )
        )
    return values_sql(
        rows,
        [
            ("key", "BIGINT"),
            ("avg_area", "DOUBLE"),
            ("approx_area", "DOUBLE"),
            ("exact_area", "DOUBLE"),
            ("un_leaves", "DOUBLE"),
            ("un_exact_area", "DOUBLE"),
        ],
    )


def closest_cell_entries(sf_dir: str, modulus: int = 10, level: int = 6):
    """(cell_id uint, label) index entries for q_s2_closest_cell,
    derived from sampled supplier keys."""
    from ..kernels import cellid as C

    keys, leaf, _ = _sampled_leaf_cells(sf_dir, "supplier", "s_suppkey", modulus)
    par = C.parent(leaf, level)
    return [(int(par[i]), int(keys[i]) % 97) for i in range(len(keys))]


@lru_cache(maxsize=2)
def closest_cell_sql(sf_dir: str, k: int = 2, modulus: int = 25) -> str:
    """Expected k-closest labeled index cells per sampled point
    (Query/S2ClosestCellQuery.cs), recomputed on the driver with the
    same vectorized batch kernel the operator uses."""
    from ..kernels.closest_cell import cell_distance_to_points_batch
    from ..kernels.geom import Cell

    ents = closest_cell_entries(sf_dir)
    keys, px, py, pz = _sampled_unit_points(
        sf_dir, "orders", "o_orderkey", modulus
    )
    dists = np.empty((len(ents), len(keys)))
    for i, (cid, _lab) in enumerate(ents):
        dists[i] = cell_distance_to_points_batch(
            Cell(np.uint64(cid).item()), px, py, pz
        )
    rows = []
    for j in range(len(keys)):
        scored = sorted(
            (float(dists[i, j]), ents[i][0], ents[i][1])
            for i in range(len(ents))
        )[:k]
        for pos, (d, c, lab) in enumerate(scored):
            rows.append(
                (int(keys[j]), int(np.int64(np.uint64(c))), lab, d, pos + 1)
            )
    return values_sql(
        rows,
        [
            ("key", "BIGINT"),
            ("cell_id", "BIGINT"),
            ("label", "BIGINT"),
            ("dist2", "DOUBLE"),
            ("rn", "BIGINT"),
        ],
    )


@lru_cache(maxsize=2)
def predicates_sql(sf_dir: str, modulus: int = 10) -> str:
    """Expected robust-predicate outcomes for q_s2_predicates
    (S2Predicates.cs / S2WedgeRelations.cs), recomputed on the driver
    through the same exact-arithmetic kernels.  All outcomes are ints/
    bools/enum strings — exact equality, no float tolerance anywhere."""
    from ..operators.predicates_op import predicate_rows

    keys, ux, uy, uz = _sampled_unit_points(
        sf_dir, "orders", "o_orderkey", modulus
    )
    rows = []
    for i in range(len(keys) - 4):
        pts = [
            (float(ux[i + j]), float(uy[i + j]), float(uz[i + j]))
            for j in range(5)
        ]
        sgn, occw, cmpd, vc, wr = predicate_rows(pts)
        rows.append((int(keys[i]), sgn, occw, cmpd, vc, wr))
    return values_sql(
        rows,
        [
            ("key", "BIGINT"),
            ("sgn", "INT"),
            ("occw", "BOOLEAN"),
            ("cmpd", "INT"),
            ("vcross", "INT"),
            ("wedge", "VARCHAR"),
        ],
    )


@lru_cache(maxsize=1)
def poly_relation_cases() -> list[tuple]:
    """(a_id, case_id, a_rings, b_rings) polygon-with-holes relation
    fixtures: each region's annulus A = [outer CCW, half-shrunk CW
    hole] against (case 0) a disc strictly inside the hole — disjoint
    despite being inside A's outer ring, (case 1) a ring inside A's
    flesh — contained, (case 2) a tangent-shifted copy of the outer
    ring — crossing.  Drives kernels/winding.polygon_contains/
    polygon_intersects (S2Polygon.Contains/Intersects semantics) from
    the driver gate."""
    from ..kernels import edges as KE
    from ..sources import regions_src as R

    cases = []
    for key in range(25):
        outer = np.asarray(R.loop_vertices(key))
        cx, cy, cz, _r = R.cap_params(key)
        c = np.array([cx, cy, cz])

        def shrink(f):
            v = c[None, :] + f * (outer - c[None, :])
            return v / np.linalg.norm(v, axis=1)[:, None]

        a_rings = (outer, shrink(0.5)[::-1])  # CCW shell + CW hole
        in_hole = (shrink(0.25),)
        flesh = (shrink(0.85), shrink(0.65)[::-1])
        u = np.array(KE.ortho((cx, cy, cz)))
        shifted = outer + u[None, :] * 0.04
        shifted = shifted / np.linalg.norm(shifted, axis=1)[:, None]
        cases.append((key, 0, a_rings, in_hole))
        cases.append((key, 1, a_rings, flesh))
        cases.append((key, 2, a_rings, (shifted,)))
    return cases


@lru_cache(maxsize=1)
def loop_relations_sql() -> str:
    """Expected relation rows for q_s2_loop_relations, recomputed on
    the driver: family='loop' — S2Loop Contains/Intersects/
    CompareBoundary/ContainsNested over the 25×25 synthetic-loop pairs
    (self-pairs exercise every shared-vertex wedge branch); family=
    'poly' — polygon-with-holes Contains/Intersects via signed winding
    over the annulus fixtures (cmp_boundary/nested are 0/False
    placeholders for that family).  All outcomes are bools/ints —
    exact equality."""
    from ..operators.loop_relations_op import poly_relation_row, relation_row
    from ..sources import regions_src as R

    loops = dict(R.synthetic_loops(range(25)))
    rows = []
    for a_id in range(25):
        for b_id in range(25):
            c, x, cb, n = relation_row(loops[a_id], loops[b_id])
            rows.append(("loop", a_id, b_id, c, x, cb, n))
    for a_id, case_id, a_rings, b_rings in poly_relation_cases():
        c, x = poly_relation_row(a_rings, b_rings)
        rows.append(("poly", a_id, case_id, c, x, 0, False))
    return values_sql(
        rows,
        [
            ("family", "VARCHAR"),
            ("a_id", "BIGINT"),
            ("b_id", "BIGINT"),
            ("contains", "BOOLEAN"),
            ("intersects", "BOOLEAN"),
            ("cmp_boundary", "INT"),
            ("nested", "BOOLEAN"),
        ],
    )


@lru_cache(maxsize=2)
def edgeclip_sql(sf_dir: str, modulus: int = 25) -> str:
    """Expected per-face uv clips for q_s2_edgeclip
    (S2EdgeClipping.ClipToPaddedFace), recomputed on the driver through
    the same kernel over the same consecutive sampled unit-point edges."""
    from ..operators.edgeclip_op import clip_rows

    keys, ux, uy, uz = _sampled_unit_points(
        sf_dir, "orders", "o_orderkey", modulus
    )
    rows = []
    for i in range(len(keys) - 1):
        a = (float(ux[i]), float(uy[i]), float(uz[i]))
        b = (float(ux[i + 1]), float(uy[i + 1]), float(uz[i + 1]))
        for f, au, av, bu, bv in clip_rows(a, b):
            rows.append((int(keys[i]), f, au, av, bu, bv))
    return values_sql(
        rows,
        [
            ("key", "BIGINT"),
            ("face", "INT"),
            ("au", "DOUBLE"),
            ("av", "DOUBLE"),
            ("bu", "DOUBLE"),
            ("bv", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=1)
def rect_bounds_sql() -> str:
    """Expected polyline lat/lng bounds for q_s2_rect_bounder
    (S2LatLngRectBounder.cs), recomputed on the driver over the same 25
    synthetic polylines."""
    from ..kernels.loop import RectBounder
    from ..sources import regions_src as R

    rows = []
    for key in range(25):
        rb = RectBounder()
        for v in R.polyline_vertices(key):
            rb.add_point((float(v[0]), float(v[1]), float(v[2])))
        b = rb.bound
        rows.append((key, b.lat.lo, b.lat.hi, b.lng.lo, b.lng.hi))
    return values_sql(
        rows,
        [
            ("line_id", "BIGINT"),
            ("lat_lo", "DOUBLE"),
            ("lat_hi", "DOUBLE"),
            ("lng_lo", "DOUBLE"),
            ("lng_hi", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=2)
def textformat_sql(sf_dir: str, modulus: int = 25) -> str:
    """Expected S2TextFormat debug strings + MakePoint round-trip leaf
    cells for q_s2_textformat, recomputed on the driver through the
    same kernels (S2TextFormat.cs ToDebugString/MakePoint)."""
    from ..kernels import cellid as C
    from ..kernels import textformat as TF

    keys, ux, uy, uz = _sampled_unit_points(
        sf_dir, "orders", "o_orderkey", modulus
    )
    rows = []
    for i in range(len(keys)):
        s = TF.point_to_string((float(ux[i]), float(uy[i]), float(uz[i])))
        p = np.array([TF.make_point(s)])
        cid = int(C.as_i64(C.xyz_to_cellid(p[:, 0], p[:, 1], p[:, 2]))[0])
        rows.append((int(keys[i]), s, cid))
    return values_sql(
        rows,
        [("key", "BIGINT"), ("debug", "VARCHAR"), ("cell_rt", "BIGINT")],
    )


def polygon_vertex_rows() -> list[tuple]:
    """(region_id, loop_idx, depth, vtx_idx, x, y, z) rows of the 25
    synthetic shell+hole polygons (shared by the Spark query and the
    expected computation)."""
    from ..sources import regions_src as R

    rows = []
    for rid, poly in R.synthetic_polygons(range(25)):
        for li, lp in enumerate(poly.loops):
            depth = li  # shell then concentric hole
            for vi, v in enumerate(np.asarray(lp.verts)):
                rows.append(
                    (rid, li, depth, vi,
                     float(v[0]), float(v[1]), float(v[2]))
                )
    return rows


@lru_cache(maxsize=1)
def polygon_areas_sql() -> str:
    """Expected hole-subtracted polygon areas for q_s2_polygon_area
    (S2Polygon.cs GetArea), recomputed on the driver."""
    from ..kernels import measures as M

    pdf = pd.DataFrame(
        polygon_vertex_rows(),
        columns=["region_id", "loop_idx", "depth", "vtx_idx", "x", "y", "z"],
    )
    rows = []
    for rid, sub in sorted(pdf.groupby("region_id")):
        loops = []
        for _li, lsub in sorted(sub.groupby("loop_idx")):
            lsub = lsub.sort_values("vtx_idx")
            loops.append(
                (int(lsub["depth"].iloc[0]),
                 lsub[["x", "y", "z"]].to_numpy())
            )
        rows.append((int(rid), M.polygon_area(loops)))
    return values_sql(rows, [("region_id", "BIGINT"), ("parea", "DOUBLE")])


@lru_cache(maxsize=2)
def triangle_measures_sql(sf_dir: str, modulus: int = 25) -> str:
    """Expected per-triple spherical triangle measures for
    q_s2_triangle_measures (S2Measures.cs / S2Centroid.cs), recomputed
    on the driver through the same kernels."""
    from ..kernels import measures as M

    keys, ux, uy, uz = _sampled_unit_points(
        sf_dir, "orders", "o_orderkey", modulus
    )
    rows = []
    for i in range(len(keys) - 2):
        a = (float(ux[i]), float(uy[i]), float(uz[i]))
        b = (float(ux[i + 1]), float(uy[i + 1]), float(uz[i + 1]))
        c = (float(ux[i + 2]), float(uy[i + 2]), float(uz[i + 2]))
        tc = M.true_centroid(a, b, c)
        rows.append(
            (int(keys[i]), M.angle(a, b, c), M.turn_angle(a, b, c),
             M.girard_area(a, b, c), M.triangle_area(a, b, c),
             M.signed_triangle_area(a, b, c), tc[0], tc[1], tc[2])
        )
    return values_sql(
        rows,
        [
            ("key", "BIGINT"), ("ang", "DOUBLE"), ("turn", "DOUBLE"),
            ("girard", "DOUBLE"), ("area", "DOUBLE"), ("sarea", "DOUBLE"),
            ("cx", "DOUBLE"), ("cy", "DOUBLE"), ("cz", "DOUBLE"),
        ],
    )


@lru_cache(maxsize=2)
def cell_geometry_sql(sf_dir: str, modulus: int = 25, level: int = 12) -> str:
    """Expected uv bounds / distance-expanded rects / maximum tiles for
    q_s2_cell_geometry (S2CellId.IJLevelToBoundUV /
    ExpandedByDistanceUV / MaximumTile), recomputed on the driver."""
    from ..kernels import cellid as C
    from ..operators.cell_geometry_op import geometry_row

    keys, leaf, _ = _sampled_leaf_cells(sf_dir, "orders", "o_orderkey", modulus)
    par = C.parent(leaf, level)
    rows = []
    for i in range(len(keys) - 1):
        dist = 0.01 + (int(keys[i]) % 5) * 0.005
        g = geometry_row(int(par[i]), int(par[i + 1]), dist)
        rows.append((int(keys[i]),) + g)
    return values_sql(
        rows,
        [("key", "BIGINT")]
        + [(n, "DOUBLE")
           for n in ("u0", "u1", "v0", "v1", "eu0", "eu1", "ev0", "ev1")]
        + [("maxtile", "BIGINT")],
    )


@lru_cache(maxsize=2)
def img_near_dup_sql(n: int) -> str:
    """Independent brute-force oracle for img_near_dup: literal
    (idx, phash) rows (driver recompute of the deterministic image
    phashes) + the planted perturbed copies derived IN SQL, then an
    all-pairs xor/bit_count Hamming join — candidate generation
    (banding) exists only on the Spark side, so a missed pair fails
    the gate."""
    from ..sources.images import phash_of_index

    rows = [(i, phash_of_index(i)) for i in range(n)]
    base = values_cte(rows, [("idx", "BIGINT"), ("phash", "BIGINT")], "ph0")
    return f"""WITH {base},
phall AS (
  SELECT idx, phash FROM ph0
  UNION ALL
  SELECT idx + {n},
         xor(phash,
             (CAST(1 AS BIGINT) << CAST(idx % 62 AS INT))
             | (CAST(1 AS BIGINT) << CAST((idx * 31 + 7) % 62 AS INT)))
  FROM ph0
)
SELECT a.idx AS a_id, b.idx AS b_id,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM phall a JOIN phall b ON a.idx < b.idx
WHERE bit_count(xor(a.phash, b.phash)) <= 3"""
