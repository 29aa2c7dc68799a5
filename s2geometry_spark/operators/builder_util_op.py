"""Distributed driver-gate arms for the S2Builder utility families
that were previously pytest-only: output layers
(S2BuilderUtil_S2PolylineLayer / LaxPolylineLayer /
S2PolylineVectorLayer / S2PointVectorLayer / S2PolygonLayer),
S2Polygon.InitOriented, GetSnappedWindingDelta
(S2BuilderUtil_GetSnappedWindingDeltaTest.cs), ClosedSetNormalizer
(S2BuilderUtil_ClosedSetNormalizerTests.cs), FindPolygonDegeneracies
(S2BuilderUtil_FindPolygonDegeneraciesTests.cs) and the LaxPolygonLayer
degenerate-boundary modes.

Shape: a literal case table (family, case_id, payload-JSON) is
evaluated per case by ``applyInPandas`` — the distributed axis is the
case count, exactly how builder work shards per geometry group at
scale — emitting uniform (family, case_id, sub_id, mode, sig, n)
rows.  The DuckDB oracle is the driver-side recompute of the same
kernels (the documented literal-oracle determinism contract: the gate
proves distributed == driver; geometric truth lives in the ported
reference goldens in tests/test_builder_layers.py,
test_winding_delta.py, test_closed_set.py, test_degeneracies.py,
test_nesting.py, test_init_oriented.py).
"""

from __future__ import annotations

import json
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

# ---------------------------------------------------------------------
# case tables (all literal / deterministic)
# ---------------------------------------------------------------------

def _j(**kw) -> str:
    return json.dumps(kw, sort_keys=True)


# output layers + InitOriented: (kind, payload) — payload carries the
# text-encoded inputs and the layer options
LAYER_CASES: tuple[tuple[str, str], ...] = (
    # S2PolylineLayer / LaxPolylineLayer
    ("polyline", _j(et="directed", lines=["3:4, 1:1"])),
    ("polyline", _j(et="undirected", lines=["1:1, 3:4"])),
    ("polyline", _j(
        et="directed",
        lines=["0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0, 4:0"])),
    ("polyline", _j(et="undirected",
                    lines=["0:0, 0:1, 0:2, 0:3, 0:2, 0:1, 0:2"])),
    ("polyline", _j(et="directed", lines=["1:1, 2:2", "4:4, 3:3"])),
    ("lax_polyline", _j(et="directed", lines=["3:4, 1:1"])),
    ("lax_polyline", _j(
        et="undirected",
        lines=["0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0, 4:0"])),
    ("polyline", _j(
        et="undirected", with_labels=True,
        lines=["0:0, 0:1, 0:2", "0:3, 0:2", "0:3, 0:4, 0:5", "0:6, 0:5"],
        labels=[[5], [5, 7], [], [11]])),
    # S2PolylineVectorLayer
    ("pl_vector", _j(et="directed",
                     lines=["0:0, 0:1, 0:2", "0:1, 0:2, 0:3"])),
    ("pl_vector", _j(et="directed", ptype="walk",
                     lines=["0:0, 0:1, 0:2", "0:2, 0:3, 0:4"])),
    ("pl_vector", _j(et="undirected",
                     lines=["0:0, 0:1", "0:2, 0:1", "0:2, 0:3"])),
    ("pl_vector", _j(et="directed", dup="merge",
                     lines=["0:0, 0:1", "0:0, 0:1", "0:1, 0:2"])),
    # S2PointVectorLayer
    ("pt_vector", _j(points=["0:1", "0:1", "0:2"], dup="merge")),
    ("pt_vector", _j(points=["0:1", "0:1", "0:2"], dup="keep")),
    ("pt_vector", _j(points=["0:1", "0:5"],
                     edges=[["0:3", "0:4"]], dup="keep")),
    # S2PolygonLayer
    ("polygon", _j(et="directed", loops=["0:0, 0:1, 1:1"])),
    ("polygon", _j(et="undirected", loops=["0:0, 0:1, 1:1"])),
    ("polygon", _j(et="directed",
                   loops=["0:0, 0:10, 10:10, 10:0",
                          "1:1, 1:9, 9:9, 9:1",
                          "2:2, 2:8, 8:8, 8:2"])),
    ("polygon", _j(et="directed", loops=[], full=True)),
    # InitOriented (CCW shell + CW hole; inconsistent pair)
    ("oriented", _j(loops=["0:0, 0:10, 10:10, 10:0",
                           "1:1, 9:1, 9:9, 1:9"])),
    ("oriented", _j(loops=["0:0, 0:3, 3:3, 3:0"])),
    ("oriented", _j(loops=["0:0, 0:10, 10:10, 10:0",
                           "1:1, 1:9, 9:9, 9:1",
                           "2:2, 8:2, 8:8, 2:8"])),
)

# GetSnappedWindingDelta: the reference goldens
# (S2BuilderUtil_GetSnappedWindingDeltaTest.cs), minus the random
# identity sweeps which stay in pytest
WDELTA_CASES: tuple[str, ...] = tuple(
    _j(loops=lp, forced=fv, snap_deg=sd, ref=re)
    for lp, fv, sd, re in (
        ("0:0", "0:0", 10.0, 0),
        ("0:0; 1:1; 2:2", "0:0", 10.0, 0),
        ("0:0; 0:0; 1:1; 1:1", "0:0", 10.0, 0),
        ("0:0; 1:1, 1:-2, -2:1", "0:0", 10.0, 0),
        ("0:0; 1:1, -2:1, 1:-2", "0:0", 10.0, 0),
        ("0:0; 1:1, 1:-2, -2:1, 2:2, 2:-3, -3:2", "0:0", 10.0, 0),
        ("0:0; 20:0, 0:0, 0:20", "0:0", 10.0, 0),
        ("0:0; 0:-20, 0:0, 20:0", "0:0", 10.0, 0),
        ("1:1; 0:-20, 1:-1, 20:0", "0:0", 10.0, 0),
        ("-1:-1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0),
        ("1:1; 20:-20, -20:20, 20:20", "0:0", 10.0, 0),
        ("4:4; 0:20, 3:3, 6:3, 2:7, 2:2, 2:20", "0:0", 10.0, 0),
        ("4:4; 0:-20, 6:2, 2:6, 2:2, 6:2, 2:6, 2:2, 20:0",
         "0:0", 10.0, 0),
        ("1:1; -5:30, 7:-3, -7:-3, 5:30", "0:0, 0:15", 10.0, 0),
        ("1:1; -5:40, 7:-3, -7:-3, 5:40", "0:0, 6:10, -6:10", 10.0, 0),
        ("1:1; 70:-179.99, 5:0, 0:5, -0.01:110", "0:0, 1:90", 10.0, 0),
        ("1:1; 70:179.99, 5:0, 0:5, 0:110", "0:0, -1:20, 1:90", 10.0, 0),
        ("-45:24; 0:148, 0:0, -31:-48, 44:-39, -59:0",
         "-31:-48, 44:-39", 60.0, 0),
        ("-45:24;  -59:0, 44:-39, -31:-48, 0:0, 0:148",
         "-31:-48, 44:-39", 60.0, 0),
        ("1:1; "
         "70:179.99, 5:0, 0:5, 0:110; "
         "70:179.99, 0:0, 0:3, 3:0, 0:-1, 0:110; "
         "10:-10, -10:10, 10:10; "
         "2:2, 1:-2, -1:2, 2:2, 1:-2, -1:2 ",
         "0:0, -1:90, 1:90, 45:-5", 10.0, 0),
        ("30:42, 30:42; -27:52, 66:131, 30:-93", "", 67.0, 0),
        ("8:26, 8:26; -36:70, -64:-35, -41:48", "", 66.0, 0),
    )
)

# ClosedSetNormalizer (index strings "points # polylines # polygons")
CLOSED_CASES: tuple[str, ...] = tuple(
    _j(index=s, suppress=sup, merge=mg)
    for s, sup, mg in (
        ("# #", True, False),
        ("0:0 # 1:0, 1:1 | 1:2, 1:3 # 2:2, 2:3, 3:2", True, False),
        ("# # 0:0", True, False),
        ("# # 0:0, 0:3, 3:0 | 1:1", True, False),
        ("# 0:0, 0:0 #", True, False),
        ("# # 0:0, 1:0", True, False),
        ("# # 0:0, 0:3, 3:0; 0:0, 1:1", True, False),
        ("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0", True, False),
        ("0:0 | 0:1 | 1:0 # # 0:0, 0:1, 1:0", False, False),
        ("0:0 | 0:1 # 0:0, 0:1 #", True, False),
        ("# 0:0, 1:0 # 0:0; 1:0", False, False),
        ("0:0 | 0:0 # 1:0, 1:1 | 1:0, 1:1 #", True, True),
    )
)

# FindPolygonDegeneracies (lax polygon strings)
DEGEN_CASES: tuple[str, ...] = (
    "",
    "0:0, 0:1, 1:0",
    "0:0",
    "0:0, 0:1, 1:0; 1:0, 0:1, 0:0",
    "0:0; 0:0, 0:1, 1:0",
    "full; 0:0",
    "0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 3:3",
)

# LaxPolygonLayer degenerate-boundary modes over one degenerate-rich
# polygon
_LAX_POLY = "0:0, 0:5, 5:5, 5:0; 1:1; 2:2, 3:3; 6:6, 6:7, 7:7; 8:8"
LAX_CASES: tuple[str, ...] = tuple(
    _j(polygon=_LAX_POLY, mode=m)
    for m in ("keep", "discard", "discard_holes", "discard_shells")
) + (
    _j(polygon="full; 0:0", mode="keep"),
    _j(polygon="full; 0:0", mode="discard"),
)


def builder_util_cases() -> list[tuple[str, int, str]]:
    """(family, case_id, payload) rows — the literal input table."""
    rows: list[tuple[str, int, str]] = []
    for i, (kind, payload) in enumerate(LAYER_CASES):
        rows.append(("layers", i, _j(kind=kind, **json.loads(payload))))
    rows += [("wdelta", i, p) for i, p in enumerate(WDELTA_CASES)]
    rows += [("closed", i, p) for i, p in enumerate(CLOSED_CASES)]
    rows += [
        ("degen", i, _j(polygon=p)) for i, p in enumerate(DEGEN_CASES)
    ]
    rows += [("lax", i, p) for i, p in enumerate(LAX_CASES)]
    return rows


# ---------------------------------------------------------------------
# shared per-case compute (runs identically on executors and in the
# driver-side oracle recompute)
# ---------------------------------------------------------------------

def _parse_index_graph(s: str):
    """Reference index-string "points # polylines # polygons" ->
    (vertices, point_ids, line_edges, poly_edges, is_full)."""
    from ..kernels import textformat as TF

    verts: list[tuple] = []
    vid: dict[tuple, int] = {}

    def vv(p):
        p = tuple(float(x) for x in p)
        if p not in vid:
            vid[p] = len(verts)
            verts.append(p)
        return vid[p]

    parts = [p.strip() for p in s.split("#")]
    points = []
    if parts[0]:
        for tok in parts[0].split("|"):
            points.append(vv(TF.parse_points(tok.strip())[0]))
    line_edges = []
    if parts[1]:
        for tok in parts[1].split("|"):
            pts = [vv(p) for p in TF.parse_points(tok.strip())]
            line_edges.extend(zip(pts, pts[1:]))
    poly_edges = []
    is_full = False
    if parts[2]:
        for tok in parts[2].replace("|", ";").split(";"):
            tok = tok.strip()
            if not tok:
                continue
            if tok == "full":
                is_full = True
                continue
            pts = [vv(p) for p in TF.parse_points(tok)]
            for i in range(len(pts)):
                poly_edges.append((pts[i], pts[(i + 1) % len(pts)]))
    return verts, points, line_edges, poly_edges, is_full


def _lax_graph(polygon_str: str):
    from ..kernels import textformat as TF

    verts: list[tuple] = []
    vid: dict[tuple, int] = {}
    edges: list[tuple[int, int]] = []
    is_full = False

    def vv(p):
        p = tuple(float(x) for x in p)
        if p not in vid:
            vid[p] = len(verts)
            verts.append(p)
        return vid[p]

    for loop_str in polygon_str.split(";"):
        loop_str = loop_str.strip()
        if not loop_str:
            continue
        if loop_str == "full":
            is_full = True
            continue
        pts = [vv(p) for p in TF.parse_points(loop_str)]
        for i in range(len(pts)):
            edges.append((pts[i], pts[(i + 1) % len(pts)]))
    return verts, edges, is_full


def _undirected_sig(verts, edges) -> str:
    """Canonical undirected edge-multiset string (the reference's
    undirected polyline-layer representation)."""
    from ..kernels import textformat as TF

    c = Counter(edges)
    out: Counter = Counter()
    for (a, b), n in sorted(c.items()):
        if a == b:
            out[(a, b)] += n
            continue
        m = c.get((b, a), 0)
        if (b, a) < (a, b) and m:
            continue
        paired = min(n, m)
        key = (min(a, b), max(a, b))
        out[key] += paired + (n - paired) + (m - paired)
    return " | ".join(
        f"{TF.point_to_string(verts[a])}-{TF.point_to_string(verts[b])}x{n}"
        for (a, b), n in sorted(out.items())
    )


def _directed_sig(verts, edges) -> str:
    from ..kernels import textformat as TF

    c = Counter(edges)
    return " | ".join(
        f"{TF.point_to_string(verts[a])}>{TF.point_to_string(verts[b])}x{n}"
        for (a, b), n in sorted(c.items())
    )


def _layers_case(p: dict) -> list[tuple[int, str, str, int]]:
    from ..kernels import builder_layers as BL
    from ..kernels import graph as G
    from ..kernels import textformat as TF
    from ..kernels.graph import GraphError
    from ..kernels.snap import Builder

    kind = p["kind"]
    if kind == "oriented":
        loops = [TF.parse_points(s) for s in p["loops"]]
        out = BL.init_oriented(loops)
        sig = out.to_debug_string()
        if out.error:
            sig = "ERR:" + out.error
        return [(0, "oriented", sig + " /" + ",".join(
            str(d) for d in out.depths), len(out.loops))]

    b = Builder()
    lay = b.start_layer()
    et = p.get("et", "directed")
    if kind in ("polyline", "lax_polyline"):
        labels = p.get("labels")
        for i, s in enumerate(p["lines"]):
            if labels is not None:
                b.clear_labels()
                for lb in labels[i]:
                    b.push_label(lb)
            b.add_polyline(TF.parse_points(s))
        b.build()
        fn = BL.lax_polyline_layer if kind == "lax_polyline" else BL.polyline_layer
        try:
            out = fn(b, lay, edge_type=et,
                     with_labels=labels is not None)
        except GraphError as e:
            return [(0, f"{kind}/{et}", "ERR:" + str(e).split(":")[0], 0)]
        sig = out.to_debug_string()
        if labels is not None:
            sig += " |L " + ";".join(
                ",".join(str(x) for x in row) for row in out.labels
            )
        return [(0, f"{kind}/{et}", sig, len(out.vertices))]
    if kind == "pl_vector":
        for s in p["lines"]:
            b.add_polyline(TF.parse_points(s))
        b.build()
        out = BL.polyline_vector_layer(
            b, lay, edge_type=et,
            polyline_type=p.get("ptype", G.POLYLINE_PATH),
            duplicate_edges=p.get("dup", G.DUPLICATE_KEEP),
        )
        return [(0, f"{kind}/{et}", out.to_debug_string(),
                 len(out.polylines))]
    if kind == "pt_vector":
        for s in p.get("points", ()):
            b.add_point(TF.make_point(s))
        for a, c in p.get("edges", ()):
            b.add_edge(TF.make_point(a), TF.make_point(c))
        b.build()
        out = BL.point_vector_layer(
            b, lay, duplicate_edges=p.get("dup", G.DUPLICATE_MERGE)
        )
        sig = TF.points_to_string(out.points)
        if out.error:
            sig += " ERR:" + out.error.split(":")[0]
        return [(0, kind, sig, len(out.points))]
    if kind == "polygon":
        for s in p.get("loops", ()):
            b.add_loop(TF.parse_points(s))
        b.add_is_full_polygon_predicate(bool(p.get("full", False)))
        b.build()
        try:
            out = BL.polygon_layer(b, lay, edge_type=et)
        except GraphError as e:
            return [(0, f"{kind}/{et}", "ERR:" + str(e).split(":")[0], 0)]
        sig = out.to_debug_string()
        if out.error:
            sig = "ERR:" + out.error
        return [(0, f"{kind}/{et}", sig + " /" + ",".join(
            str(d) for d in out.depths), len(out.loops))]
    raise ValueError(f"unknown layers kind {kind!r}")


def _wdelta_case(p: dict) -> list[tuple[int, str, str, int]]:
    import math

    from ..kernels import textformat as TF
    from ..kernels.snap import (
        Builder, IdentitySnapFunction, find_first_site,
        get_snapped_winding_delta,
    )

    b = Builder(IdentitySnapFunction(math.radians(p["snap_deg"])))
    for v in (TF.parse_points(p["forced"]) if p["forced"] else []):
        b.force_vertex(tuple(v))
    for loop_str in p["loops"].split(";"):
        verts = TF.parse_points(loop_str.strip())
        b.add_loop([tuple(v) for v in verts])
    ref_edge = int(p["ref"])
    va, _ = b.input_edges[ref_edge]
    ref_in = b.input_vertices[va]
    b.build()
    ref_v = find_first_site(b, ref_edge)
    delta = get_snapped_winding_delta(b, ref_in, ref_v)
    return [(0, "delta", str(delta), int(delta))]


def _closed_case(p: dict) -> list[tuple[int, str, str, int]]:
    from ..kernels import textformat as TF
    from ..kernels.nesting import normalize_closed_set

    verts, pts, lines, polys, is_full = _parse_index_graph(p["index"])
    got_pts, got_lines, got_polys = normalize_closed_set(
        verts, pts, lines, polys,
        suppress_lower_dimensions=bool(p["suppress"]),
        is_full_polygon=is_full,
        merge_duplicates=bool(p["merge"]),
    )
    psig = " | ".join(
        sorted(TF.point_to_string(verts[i]) for i in got_pts)
    )
    lsig = _undirected_sig(verts, got_lines)
    osig = _directed_sig(verts, got_polys)
    return [
        (0, "points", psig, len(got_pts)),
        (1, "lines", lsig, len(got_lines)),
        (2, "polys", osig, len(got_polys)),
    ]


def _degen_case(p: dict) -> list[tuple[int, str, str, int]]:
    from ..kernels import textformat as TF
    from ..kernels.nesting import find_polygon_degeneracies

    verts, edges, is_full = _lax_graph(p["polygon"])
    got = find_polygon_degeneracies(verts, edges, is_full)
    items = sorted(
        {
            (
                f"{TF.point_to_string(verts[edges[e][0]])}, "
                f"{TF.point_to_string(verts[edges[e][1]])}",
                bool(h),
            )
            for e, h in got
        }
    )
    sig = " | ".join(f"{s} hole={h}" for s, h in items)
    return [(0, "degen", sig, len(got))]


def _lax_case(p: dict) -> list[tuple[int, str, str, int]]:
    from ..kernels import textformat as TF
    from ..kernels.nesting import lax_polygon_layer

    verts, edges, is_full = _lax_graph(p["polygon"])
    loops, full = lax_polygon_layer(
        verts, edges, degenerate_boundaries=p["mode"],
        is_full_polygon=is_full,
    )
    loop_sigs = sorted(
        TF.points_to_string([verts[i] for i in lp]) for lp in loops
    )
    sig = ("FULL; " if full else "") + " ; ".join(loop_sigs)
    return [(0, p["mode"], sig, len(loops))]


_FAMILY_FNS = {
    "layers": _layers_case,
    "wdelta": _wdelta_case,
    "closed": _closed_case,
    "degen": _degen_case,
    "lax": _lax_case,
}


def builder_util_case_result(
    family: str, payload: str
) -> list[tuple[int, str, str, int]]:
    return _FAMILY_FNS[family](json.loads(payload))


# ---------------------------------------------------------------------
# distributed operator + oracle
# ---------------------------------------------------------------------

RESULT_SCHEMA = StructType(
    [
        StructField("family", StringType(), False),
        StructField("case_id", LongType(), False),
        StructField("sub_id", IntegerType(), False),
        StructField("mode", StringType(), False),
        StructField("sig", StringType(), False),
        StructField("n", LongType(), False),
    ]
)


def builder_util_rows(case_df: DataFrame) -> DataFrame:
    """Evaluate every builder-util case distributed (one applyInPandas
    group per (family, case_id))."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        fam, cid = key
        rows = builder_util_case_result(str(fam), pdf.iloc[0]["payload"])
        return pd.DataFrame(
            [(fam, int(cid), s, m, g, int(n)) for s, m, g, n in rows],
            columns=["family", "case_id", "sub_id", "mode", "sig", "n"],
        )

    return case_df.groupBy("family", "case_id").applyInPandas(
        compute, schema=RESULT_SCHEMA
    )


def builder_util_sql() -> str:
    """DuckDB oracle: the driver-side recompute as a literal table."""
    from ..functions.literal_oracle import values_sql

    rows = []
    for family, cid, payload in builder_util_cases():
        for s, m, g, n in builder_util_case_result(family, payload):
            rows.append((family, cid, s, m, g, n))
    return values_sql(
        rows,
        [
            ("family", "VARCHAR"),
            ("case_id", "BIGINT"),
            ("sub_id", "INT"),
            ("mode", "VARCHAR"),
            ("sig", "VARCHAR"),
            ("n", "BIGINT"),
        ],
    )
