"""Distributed per-loop measures: exploded vertex table -> grouped
Arrow kernel.

The vertex-order-dependent sums (surface integral, Kahan curvature,
S2LoopMeasures.cs:14-284) cannot be a plain F.sum — each loop's
vertices are gathered in order inside one applyInPandas group
(SURVEY.md §2.5), so results are bit-identical to the driver-side
kernels while the work distributes across loops."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEASURES_SCHEMA = T.StructType(
    [
        T.StructField("region_id", T.LongType(), False),
        T.StructField("area", T.DoubleType(), False),
        T.StructField("signed_area", T.DoubleType(), False),
        T.StructField("perimeter", T.DoubleType(), False),
        T.StructField("curvature", T.DoubleType(), False),
        T.StructField("centroid_x", T.DoubleType(), False),
        T.StructField("centroid_y", T.DoubleType(), False),
        T.StructField("centroid_z", T.DoubleType(), False),
    ]
)


def loops_vertex_df(spark: SparkSession, loops) -> DataFrame:
    """Explode (region_id, Loop) pairs into ordered vertex rows."""
    rows = []
    for rid, lp in loops:
        for k, v in enumerate(np.asarray(lp.verts)):
            rows.append((int(rid), k, float(v[0]), float(v[1]), float(v[2])))
    pdf = pd.DataFrame(rows, columns=["region_id", "vtx_idx", "x", "y", "z"])
    return spark.createDataFrame(pdf)


def loop_measures(vertex_df: DataFrame) -> DataFrame:
    """(region_id, area, signed_area, perimeter, curvature, centroid)."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import measures as M

        (rid,) = key
        pdf = pdf.sort_values("vtx_idx")
        verts = pdf[["x", "y", "z"]].to_numpy()
        cen = M.loop_centroid(verts)
        return pd.DataFrame(
            [
                {
                    "region_id": int(rid),
                    "area": M.loop_area(verts),
                    "signed_area": M.loop_signed_area(verts),
                    "perimeter": M.loop_perimeter(verts),
                    "curvature": M.loop_curvature(verts),
                    "centroid_x": cen[0],
                    "centroid_y": cen[1],
                    "centroid_z": cen[2],
                }
            ]
        )

    return vertex_df.groupBy("region_id").applyInPandas(
        compute, schema=MEASURES_SCHEMA
    )


POLYLINE_SCHEMA = T.StructType(
    [
        T.StructField("line_id", T.LongType(), False),
        T.StructField("length", T.DoubleType(), False),
        T.StructField("mid_x", T.DoubleType(), False),
        T.StructField("mid_y", T.DoubleType(), False),
        T.StructField("mid_z", T.DoubleType(), False),
        T.StructField("mid_frac_back", T.DoubleType(), False),
        T.StructField("proj_dist2", T.DoubleType(), False),
    ]
)


def polyline_measures(vertex_df: DataFrame, probe=(0.0, 0.0, 1.0)) -> DataFrame:
    """Per-polyline length / arc-midpoint (interpolate 0.5) /
    uninterpolate round trip / squared-chord distance of the projection
    of a fixed probe point (kernels.polyline; S2Polyline.cs:211-340)."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import polyline as PL

        (lid,) = key
        pdf = pdf.sort_values("vtx_idx")
        pl = PL.Polyline(pdf[["x", "y", "z"]].to_numpy())
        mid, nv = pl.interpolate(0.5)
        closest, _ = pl.project(probe)
        d = tuple(probe[i] - closest[i] for i in range(3))
        return pd.DataFrame(
            [
                {
                    "line_id": int(lid),
                    "length": pl.length(),
                    "mid_x": mid[0], "mid_y": mid[1], "mid_z": mid[2],
                    "mid_frac_back": pl.uninterpolate(mid, nv),
                    "proj_dist2": (d[0] * d[0] + d[1] * d[1]) + d[2] * d[2],
                }
            ]
        )

    return vertex_df.groupBy("line_id").applyInPandas(
        compute, schema=POLYLINE_SCHEMA
    )


BOOL_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("n_rings", T.IntegerType(), False),
        T.StructField("area", T.DoubleType(), False),
    ]
)


def boolean_pairs(vertex_df: DataFrame) -> DataFrame:
    """Per-pair boolean ops (intersection/union/difference) between two
    tagged loops (columns: pair_id, which in {0,1}, vtx_idx, x, y, z),
    distributed over pairs; outputs ring counts + total area
    (general-position arc-walk kernel, kernels.boolop)."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.literal_oracle import SNAP_PAIR_BASE
        from ..kernels import boolop as B
        from ..kernels import snap as SN
        from ..kernels.loop import Loop

        (pid,) = key
        pdf = pdf.sort_values(["which", "vtx_idx"])
        av = pdf[pdf["which"] == 0][["x", "y", "z"]].to_numpy()
        bv = pdf[pdf["which"] == 1][["x", "y", "z"]].to_numpy()
        a, b = Loop(av), Loop(bv)
        rows = []
        for op in (
            "intersection", "union", "difference", "symmetric_difference"
        ):
            if pid >= SNAP_PAIR_BASE:
                # coincident-boundary family: snap-rounded boolean
                # (kernels.snap, S2Builder semantics) at E7
                rings = SN.snapped_loop_boolean(
                    av, bv, op, SN.IntLatLngSnapFunction(7)
                )
            else:
                rings = B.loop_boolean(a, b, op)
            # nesting-parity area: shells add, nested (hole) rings
            # subtract — handles the annulus (shell+CCW hole), a
            # difference split into two shells, and nested
            # symmetric-difference results uniformly.
            area = B.rings_area(rings)
            rows.append(
                {"pair_id": int(pid), "op": op, "n_rings": len(rings),
                 "area": area}
            )
        return pd.DataFrame(rows)

    return vertex_df.groupBy("pair_id").applyInPandas(
        compute, schema=BOOL_SCHEMA
    )


DTW_SCHEMA = T.StructType(
    [
        T.StructField("line_id", T.LongType(), False),
        T.StructField("cost", T.DoubleType(), False),
        T.StructField("path_len", T.IntegerType(), False),
        T.StructField("approx_cost", T.DoubleType(), False),
        T.StructField("approx_path_len", T.IntegerType(), False),
    ]
)


def dtw_align_pairs(vertex_df: DataFrame) -> DataFrame:
    """Per-line DTW alignment between the two tagged vertex chains of
    each line_id (columns: line_id, which in {0,1}, vtx_idx, x, y, z) —
    S2PolylineAlignment exact vertex alignment plus the FastDTW
    windowed approximation (GetApproxVertexAlignment) in a grouped
    Arrow kernel (the distributed axis is the number of pairs)."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import alignment as AL

        (lid,) = key
        pdf = pdf.sort_values(["which", "vtx_idx"])
        a = pdf[pdf["which"] == 0][["x", "y", "z"]].to_numpy()
        b = pdf[pdf["which"] == 1][["x", "y", "z"]].to_numpy()
        cost, path = AL.alignment(a, b)
        acost, apath = AL.approx_alignment(a, b)
        return pd.DataFrame(
            [{
                "line_id": int(lid), "cost": cost,
                "path_len": len(path), "approx_cost": acost,
                "approx_path_len": len(apath),
            }]
        )

    return vertex_df.groupBy("line_id").applyInPandas(
        compute, schema=DTW_SCHEMA
    )


HULL_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.LongType(), False),
        T.StructField("vtx_idx", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("z", T.DoubleType(), False),
    ]
)


def group_convex_hull(points: DataFrame, group_col: str = "grp") -> DataFrame:
    """Per-group spherical convex hull (Andrew's monotone chain,
    Query/S2ConvexHullQuery.cs) — exploded CCW hull vertices
    (grp, vtx_idx, x, y, z).  Input needs unit (x, y, z) + group."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import hull as H

        (g,) = key
        # canonical point order: shuffle arrival order is arbitrary, and
        # the hull's starting vertex (cap-bound -> origin choice) depends
        # on it — sort so output vtx_idx labels are deterministic
        pdf = pdf.sort_values(["x", "y", "z"], kind="mergesort")
        pts = pdf[["x", "y", "z"]].to_numpy()
        pts = pts / np.sqrt((pts * pts).sum(axis=1))[:, None]
        hull = H.convex_hull(pts)
        return pd.DataFrame(
            {
                "grp": int(g),
                "vtx_idx": range(len(hull)),
                "x": hull[:, 0] if len(hull) else [],
                "y": hull[:, 1] if len(hull) else [],
                "z": hull[:, 2] if len(hull) else [],
            }
        )

    return (
        points.withColumnRenamed(group_col, "grp")
        .groupBy("grp")
        .applyInPandas(compute, schema=HULL_SCHEMA)
    )


POLY_REL_SCHEMA = T.StructType(
    [
        T.StructField("line_id", T.LongType(), False),
        T.StructField("intersects", T.BooleanType(), False),
        T.StructField("covers_sub", T.BooleanType(), False),
        T.StructField("n_sub", T.IntegerType(), False),
    ]
)

POLY_REL_TOL = 0.01  # radians


def polyline_relations(vertex_df: DataFrame) -> DataFrame:
    """Per-line polyline relations (kernels.polyline_ops): does chain 0
    intersect its perpendicular twin (chain 1); does chain 0 nearly
    cover its own subsampled simplification; simplified vertex count.
    Input columns: (line_id, which in {0,1}, vtx_idx, x, y, z)."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import polyline_ops as PO

        (lid,) = key
        pdf = pdf.sort_values(["which", "vtx_idx"])
        base = pdf[pdf["which"] == 0][["x", "y", "z"]].to_numpy()
        other = pdf[pdf["which"] == 1][["x", "y", "z"]].to_numpy()
        idx = PO.subsample_vertices(base, POLY_REL_TOL)
        sub = base[idx]
        return pd.DataFrame(
            [
                {
                    "line_id": int(lid),
                    "intersects": PO.polyline_intersects(base, other),
                    "covers_sub": PO.nearly_covers(base, sub, POLY_REL_TOL),
                    "n_sub": len(idx),
                }
            ]
        )

    return vertex_df.groupBy("line_id").applyInPandas(
        compute, schema=POLY_REL_SCHEMA
    )


BUFFER_CASE_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.LongType(), False),
        T.StructField("mode", T.StringType(), False),
        T.StructField("n_ring", T.IntegerType(), False),
        T.StructField("area_base", T.DoubleType(), False),
        T.StructField("area_buffered", T.DoubleType(), False),
        T.StructField("n_probe", T.IntegerType(), False),
        T.StructField("n_probe_in", T.IntegerType(), False),
    ]
)


def buffer_shapes(vertex_df: DataFrame, radius: float,
                  shrink_radius: float, check: bool = False) -> DataFrame:
    """Full S2BufferOperation surface, distributed per (case_id, mode):
    input rows (case_id, mode, which, vtx_idx, x, y, z) where mode
    selects the path —

      grow      loop expanded by +radius (convex fast path or the
                spliced-offset winding walk)
      shrink    polygon CONTRACTED by shrink_radius (complement walk,
                S2BufferOperation.cs:7-9; may empty)
      polyline  two-sided round-cap stadium of the vertex chain
      point     disc around the single vertex
      union     multi-layer union: every `which` loop's offset curve
                through ONE winding-positive walk
                (S2BufferOperation.cs:11-19)

    Emits ring vertex counts and base/buffered signed-area sums per
    case; area_base is the input region area (0 for the measure-zero
    point/polyline inputs, the sum of member areas for union).

    ``check=True`` additionally Monte-Carlo-validates every case
    against the exact within-distance predicate inside the worker
    (~4x cost); the golden tests run with it on, the product query
    relies on the oracle gate + goldens instead."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import buffer as BUF
        from ..kernels import measures as M

        cid, mode = int(key[0]), str(key[1])
        pdf = pdf.sort_values(["which", "vtx_idx"])
        groups = [
            grp[["x", "y", "z"]].to_numpy()
            for _, grp in pdf.groupby("which")
        ]
        if mode == "grow":
            (verts,) = groups
            rings = BUF.buffer_loop_rings(verts, radius, check=check)
            base = M.loop_area(verts)
        elif mode == "shrink":
            (verts,) = groups
            rings = BUF.buffer_polygon_rings(
                [verts], -shrink_radius, check=check
            )
            base = M.loop_area(verts)
        elif mode == "polyline":
            (verts,) = groups
            rings = BUF.buffer_polyline_rings(verts, radius, check=check)
            base = 0.0
        elif mode == "point":
            (verts,) = groups
            rings = BUF.buffer_point_rings(verts[0], radius, check=check)
            base = 0.0
        elif mode == "union":
            shapes = [("loop", g) for g in groups]
            rings = BUF.buffer_shapes_union_rings(
                shapes, radius, check=check
            )
            base = sum(M.loop_area(g) for g in groups)
        else:
            raise ValueError(f"unknown buffer mode {mode!r}")
        # independent-containment gate columns: classify deterministic
        # probes by parity over the rings THIS WORKER EMITTED; the
        # oracle's twin columns come from the pure within-distance
        # predicate (BUF.probe_gate docstring), so a construction bug
        # here cannot agree with the oracle by recomputation
        P, _expected = BUF.probe_gate(groups, mode, radius, shrink_radius)
        got = BUF._rings_contain(rings, P)
        return pd.DataFrame(
            [
                {
                    "case_id": cid,
                    "mode": mode,
                    "n_ring": sum(len(r) for r in rings),
                    "area_base": base,
                    "area_buffered": sum(
                        M.loop_signed_area(r) for r in rings
                    ),
                    "n_probe": len(P),
                    "n_probe_in": int(got.sum()),
                }
            ]
        )

    return vertex_df.groupBy("case_id", "mode").applyInPandas(
        compute, schema=BUFFER_CASE_SCHEMA
    )


WINDING_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.LongType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("n_rings", T.IntegerType(), False),
        T.StructField("area", T.DoubleType(), False),
    ]
)


def winding_groups(vertex_df: DataFrame) -> DataFrame:
    """Per-group N-way winding operation (kernels.winding): input rows
    (group_id, which, vtx_idx, x, y, z) carry several possibly
    overlapping loops per group; emits ring count + signed-area sum for
    the union (w>0), majority (w>=2) and odd (symmetric-difference)
    winding rules — the N-way booleans pairwise ops cannot express."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import measures as M
        from ..kernels import winding as W

        (gid,) = key
        pdf = pdf.sort_values(["which", "vtx_idx"])
        loops = [
            grp[["x", "y", "z"]].to_numpy()
            for _, grp in pdf.groupby("which")
        ]
        rows = []
        for name, rule in (
            ("union", "positive"), ("majority", 2), ("odd", "odd")
        ):
            rings = W.winding_operation(loops, rule)
            rows.append(
                {
                    "group_id": int(gid),
                    "rule": name,
                    "n_rings": len(rings),
                    "area": sum(M.loop_signed_area(r) for r in rings),
                }
            )
        return pd.DataFrame(rows)

    return vertex_df.groupBy("group_id").applyInPandas(
        compute, schema=WINDING_SCHEMA
    )


NESTING_SCHEMA = T.StructType(
    [
        T.StructField("shape_id", T.LongType(), False),
        T.StructField("chain_id", T.IntegerType(), False),
        T.StructField("parent", T.IntegerType(), False),
        T.StructField("n_holes", T.IntegerType(), False),
        T.StructField("is_shell", T.BooleanType(), False),
    ]
)


def shape_nesting_groups(vertex_df: DataFrame) -> DataFrame:
    """Per-shape ring nesting (kernels.nesting, S2ShapeNestingQuery):
    input rows (shape_id, which = chain id, vtx_idx, x, y, z) carry a
    multi-ring shape per group; emits each chain's parent (-1 for
    shells) and hole count.  The distributed axis is the number of
    shapes."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.nesting import shape_nesting

        (sid,) = key
        pdf = pdf.sort_values(["which", "vtx_idx"])
        chains = [
            grp[["x", "y", "z"]].to_numpy()
            for _, grp in pdf.groupby("which")
        ]
        rel = shape_nesting(chains)
        return pd.DataFrame(
            [
                {
                    "shape_id": int(sid),
                    "chain_id": i,
                    "parent": r.parent,
                    "n_holes": len(r.holes),
                    "is_shell": r.is_shell(),
                }
                for i, r in enumerate(rel)
            ]
        )

    return vertex_df.groupBy("shape_id").applyInPandas(
        compute, schema=NESTING_SCHEMA
    )


SIMPLIFY_SCHEMA = T.StructType(
    [
        T.StructField("line_id", T.LongType(), False),
        T.StructField("n_in", T.IntegerType(), False),
        T.StructField("n_kept", T.IntegerType(), False),
        T.StructField("kept_csv", T.StringType(), False),
    ]
)


def simplify_lines(vertex_df: DataFrame, tolerance_rad: float) -> DataFrame:
    """Topology-preserving polyline simplification per line_id
    (columns: line_id, which in {0=chain, 1=obstacles}, vtx_idx,
    x, y, z) — the S2Builder simplify_edge_chains discipline
    (kernels/simplifier.simplify_polyline_avoiding) in a grouped Arrow
    kernel; the distributed axis is the number of polylines."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.simplifier import simplify_polyline_avoiding

        (lid,) = key
        pdf = pdf.sort_values(["which", "vtx_idx"])
        verts = pdf[pdf["which"] == 0][["x", "y", "z"]].to_numpy()
        obs = pdf[pdf["which"] == 1][["x", "y", "z"]].to_numpy()
        idx = simplify_polyline_avoiding(verts, tolerance_rad, obs)
        return pd.DataFrame(
            [{
                "line_id": int(lid),
                "n_in": len(verts),
                "n_kept": len(idx),
                "kept_csv": ",".join(str(i) for i in idx),
            }]
        )

    return vertex_df.groupBy("line_id").applyInPandas(
        compute, schema=SIMPLIFY_SCHEMA
    )


SHAPE_MEASURES_SCHEMA = T.StructType(
    [
        T.StructField("shape_id", T.LongType(), False),
        T.StructField("dim", T.IntegerType(), False),
        T.StructField("length", T.DoubleType(), False),
        T.StructField("perimeter", T.DoubleType(), False),
        T.StructField("area", T.DoubleType(), False),
        T.StructField("approx_area", T.DoubleType(), False),
        T.StructField("cx", T.DoubleType(), False),
        T.StructField("cy", T.DoubleType(), False),
        T.StructField("cz", T.DoubleType(), False),
    ]
)


def shape_measures_rows(vertex_df: DataFrame) -> DataFrame:
    """Dimension-dispatched shape measures per shape_id (columns:
    shape_id, dim, chain_id, vtx_idx, x, y, z) — S2ShapeMeasures in a
    grouped Arrow kernel; the distributed axis is the shape count."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import shape_measures as SM

        (sid,) = key
        dim = int(pdf["dim"].iloc[0])
        chains = [
            g.sort_values("vtx_idx")[["x", "y", "z"]].to_numpy()
            for _, g in pdf.groupby("chain_id")
        ]
        sh = SM.MultiShape(dim, chains)
        cx, cy, cz = SM.shape_centroid(sh)
        return pd.DataFrame(
            [{
                "shape_id": int(sid),
                "dim": dim,
                "length": SM.shape_length(sh),
                "perimeter": SM.shape_perimeter(sh),
                "area": SM.shape_area(sh),
                "approx_area": SM.shape_approx_area(sh),
                "cx": cx, "cy": cy, "cz": cz,
            }]
        )

    return vertex_df.groupBy("shape_id").applyInPandas(
        compute, schema=SHAPE_MEASURES_SCHEMA
    )


BOUNDARY_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.LongType(), False),
        T.StructField("face_idx", T.IntegerType(), False),
        T.StructField("face_loops", T.StringType(), False),
    ]
)


def polygon_boundary_faces(vertex_df: DataFrame) -> DataFrame:
    """BuildPolygonBoundaries per group (columns: group_id, comp_id,
    loop_id, vtx_idx, x, y, z): groups of non-crossing loop components
    assembled into interior-disjoint polygons, one row per face with a
    canonical 'comp.loop|...' signature — grouped Arrow kernel; the
    distributed axis is the group count."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.literal_oracle import _boundary_faces

        (gid,) = key
        faces = _boundary_faces(pdf)
        return pd.DataFrame(
            [
                {"group_id": int(gid), "face_idx": fi, "face_loops": f}
                for fi, f in enumerate(faces)
            ]
        )

    return vertex_df.groupBy("group_id").applyInPandas(
        compute, schema=BOUNDARY_SCHEMA
    )


GRAPH_ASSEMBLY_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.LongType(), False),
        T.StructField("mode", T.StringType(), False),
        T.StructField("chain_idx", T.IntegerType(), False),
        T.StructField("chain_sig", T.StringType(), False),
        T.StructField("n_edges", T.IntegerType(), False),
    ]
)


def graph_assembly_rows(vertex_df: DataFrame) -> DataFrame:
    """S2Builder graph assembly per case (columns: case_id, mode,
    chain_id, vtx_idx, x, y, z): each case's edge-soup fragments run
    through the EdgeProcessor + the mode's chain assembly
    (Graph.cs:518-805 loops/components, 1481-1723 polylines) inside one
    Arrow group — the distributed axis is the case count, the same way
    snapped-geometry assembly shards per geometry at scale."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import graph as G

        cid, mode = int(key[0]), str(key[1])
        chains = [
            [tuple(r) for r in cg.sort_values("vtx_idx")[["x", "y", "z"]]
             .to_numpy()]
            for _, cg in sorted(pdf.groupby("chain_id"))
        ]
        return pd.DataFrame(
            [
                {"case_id": cid, "mode": mode, "chain_idx": idx,
                 "chain_sig": sig, "n_edges": int(n)}
                for idx, (sig, n) in enumerate(
                    G.assemble_chains(mode, chains))
            ],
            columns=[f.name for f in GRAPH_ASSEMBLY_SCHEMA.fields],
        )

    return vertex_df.groupBy("case_id", "mode").applyInPandas(
        compute, schema=GRAPH_ASSEMBLY_SCHEMA
    )


MIXED_BOOL_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("dim", T.IntegerType(), False),
        T.StructField("n_items", T.IntegerType(), False),
        T.StructField("sig", T.StringType(), False),
    ]
)


def mixed_boolean_rows(case_df: DataFrame) -> DataFrame:
    """Mixed-dimension boolean operations per (case, op) row (columns:
    case_id, op, a, b, polygon_model, polyline_model, lb, split,
    snap_e): each group runs the full S2BooleanOperation kernel
    (kernels.mixed_boolop) inside one Arrow batch and emits the
    per-dimension normalized signatures — the distributed axis is the
    (case x op) count, the way region-pair booleans shard at scale."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import mixed_boolop as MBK

        cid, op = int(key[0]), str(key[1])
        r = pdf.iloc[0]
        options = MBK.Options(
            polygon_model=str(r["polygon_model"]),
            polyline_model=str(r["polyline_model"]),
            polyline_loops_have_boundaries=bool(r["lb"]),
            split_all_crossing_polyline_edges=bool(r["split"]),
            snap_exponent=None if pd.isna(r["snap_e"]) else int(r["snap_e"]),
        )
        result = MBK.boolean_operation(
            MBK.parse_index(str(r["a"])), MBK.parse_index(str(r["b"])),
            op, options,
        )
        return pd.DataFrame(
            [
                {"case_id": cid, "op": op, "dim": dim, "n_items": n,
                 "sig": sig}
                for dim, n, sig in MBK.signature_rows(result)
            ],
            columns=[f.name for f in MIXED_BOOL_SCHEMA.fields],
        )

    return case_df.groupBy("case_id", "op").applyInPandas(
        compute, schema=MIXED_BOOL_SCHEMA
    )


POLYGON_VALIDATE_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType(), False),
        T.StructField("n_chains", T.IntegerType(), False),
        T.StructField("n_edges", T.IntegerType(), False),
        T.StructField("n_crossing_pairs", T.IntegerType(), False),
        T.StructField("error_code", T.StringType(), False),
    ]
)


def polygon_validate(vertex_df: DataFrame) -> DataFrame:
    """Polygon validity per geometry (columns: poly_id, chain_id,
    vtx_idx, x, y, z): each polygon's closed chains run the
    FindSelfIntersection crossing-pair scan
    (S2ShapeUtil/VisitCrossingEdgePairs.cs:404-506) inside one Arrow
    group, emitting the first error's S2ErrorCode (or OK) plus the
    CrossingType.ALL pair count — the distributed axis is the polygon
    count, the way validation shards over a geometry table at scale."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import validity as V

        (pid,) = key
        chains = [
            cg.sort_values("vtx_idx")[["x", "y", "z"]].to_numpy()
            for _, cg in sorted(pdf.groupby("chain_id"))
        ]
        n_chains, n_edges, n_pairs, code = V.validate_chains(chains)
        return pd.DataFrame(
            [
                {"poly_id": int(pid), "n_chains": n_chains,
                 "n_edges": n_edges, "n_crossing_pairs": n_pairs,
                 "error_code": code}
            ],
            columns=[f.name for f in POLYGON_VALIDATE_SCHEMA.fields],
        )

    return vertex_df.groupBy("poly_id").applyInPandas(
        compute, schema=POLYGON_VALIDATE_SCHEMA
    )


BUILDER_SIMPLIFY_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.LongType(), False),
        T.StructField("layer_id", T.IntegerType(), False),
        T.StructField("n_vertices", T.IntegerType(), False),
        T.StructField("verts", T.StringType(), False),
    ]
)


def builder_simplify_rows(case_df: DataFrame) -> DataFrame:
    """Full snap + simplify_edge_chains builder run per case (columns:
    case_id, chain_id, vtx_idx, x, y, z, snap_deg, intlatlng_e, split,
    simplify):
    each case's polylines become one builder layer each; the snapped,
    jointly-simplified polylines come back as debug strings
    (S2Builder.cs SimplifyEdgeChains; kernels.snap.EdgeChainSimplifier).
    The distributed axis is the case count — the way snap+simplify
    shards per geometry group at scale."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        from ..kernels import builder_layers as BLK
        from ..kernels import graph as GK
        from ..kernels import snap as SNK

        (cid,) = key
        r = pdf.iloc[0]
        if int(r["intlatlng_e"]) >= 0:
            snap_fn = SNK.IntLatLngSnapFunction(int(r["intlatlng_e"]))
        elif float(r["snap_deg"]) < 0:
            # snap_deg < 0 encodes S2CellIdSnapFunction(level)
            snap_fn = SNK.S2CellIdSnapFunction(int(-float(r["snap_deg"])))
        else:
            snap_fn = SNK.IdentitySnapFunction(
                math.radians(float(r["snap_deg"])))
        b = SNK.Builder(
            snap_fn,
            split_crossing_edges=bool(r["split"]),
            simplify_edge_chains=bool(r["simplify"]),
        )
        opts = GK.GraphOptions(
            GK.DIRECTED, GK.DEGENERATE_DISCARD, GK.DUPLICATE_KEEP,
            GK.SIBLING_KEEP,
        )
        lays = []
        for _, cg in sorted(pdf.groupby("chain_id")):
            lays.append(b.start_layer(opts))
            b.add_polyline(
                cg.sort_values("vtx_idx")[["x", "y", "z"]].to_numpy())
        b.build()
        rows = []
        for lay in lays:
            out = BLK.polyline_layer(b, lay)
            rows.append(
                {"case_id": int(cid), "layer_id": int(lay),
                 "n_vertices": len(out.vertices),
                 "verts": out.to_debug_string()}
            )
        return pd.DataFrame(
            rows, columns=[f.name for f in BUILDER_SIMPLIFY_SCHEMA.fields]
        )

    return case_df.groupBy("case_id").applyInPandas(
        compute, schema=BUILDER_SIMPLIFY_SCHEMA
    )


RECT_BOUND_SCHEMA = (
    "line_id long, lat_lo double, lat_hi double, "
    "lng_lo double, lng_hi double"
)


def rect_bounds(vertex_df: DataFrame) -> DataFrame:
    """Per-chain conservative lat/lng bound
    (S2LatLngRectBounder.cs:140-260 via kernels.loop.RectBounder):
    vertices gathered in order inside one applyInPandas group, exactly
    like the other chain measures — chain-level parallelism scales,
    the per-chain pass is O(vertices)."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.loop import RectBounder

        (lid,) = key
        pdf = pdf.sort_values("vtx_idx")
        rb = RectBounder()
        for v in pdf[["x", "y", "z"]].to_numpy():
            rb.add_point((float(v[0]), float(v[1]), float(v[2])))
        b = rb.bound
        return pd.DataFrame(
            [
                {
                    "line_id": int(lid),
                    "lat_lo": b.lat.lo, "lat_hi": b.lat.hi,
                    "lng_lo": b.lng.lo, "lng_hi": b.lng.hi,
                }
            ]
        )

    return vertex_df.groupBy("line_id").applyInPandas(
        compute, schema=RECT_BOUND_SCHEMA
    )


TRIANGLE_SCHEMA = (
    "key long, ang double, turn double, girard double, "
    "area double, sarea double, cx double, cy double, cz double"
)


def triangle_measures(triples: DataFrame) -> DataFrame:
    """Per-row spherical triangle measures (S2Measures.cs Angle/
    TurnAngle/GirardArea/Area/SignedArea + S2Centroid.TrueCentroid)
    over (ax..cz) unit-point triples — one Arrow batch, rows
    independent, partition-parallel."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<ang: double, turn: double, girard: double, area: double,"
        " sarea: double, cx: double, cy: double, cz: double>"
    )
    def _tri(ax, ay, az, bx, by, bz, cx, cy, cz):
        from ..kernels import measures as M

        out = {k: [] for k in
               ("ang", "turn", "girard", "area", "sarea", "cx", "cy", "cz")}
        for i in range(len(ax)):
            a = (float(ax[i]), float(ay[i]), float(az[i]))
            b = (float(bx[i]), float(by[i]), float(bz[i]))
            c = (float(cx[i]), float(cy[i]), float(cz[i]))
            out["ang"].append(M.angle(a, b, c))
            out["turn"].append(M.turn_angle(a, b, c))
            out["girard"].append(M.girard_area(a, b, c))
            out["area"].append(M.triangle_area(a, b, c))
            out["sarea"].append(M.signed_triangle_area(a, b, c))
            tc = M.true_centroid(a, b, c)
            out["cx"].append(tc[0])
            out["cy"].append(tc[1])
            out["cz"].append(tc[2])
        return pd.DataFrame(out)

    s = _tri(*[F.col(f"{p}{ax}") for p in ("a", "b", "c")
               for ax in ("x", "y", "z")])
    return triples.select(
        "key",
        *[s.getField(f).alias(f)
          for f in ("ang", "turn", "girard", "area", "sarea",
                    "cx", "cy", "cz")],
    )


POLYGON_AREA_SCHEMA = "region_id long, parea double"


def polygon_areas(vertex_df: DataFrame) -> DataFrame:
    """Per-polygon area with holes subtracted by nesting depth
    (S2Polygon.cs:471-487 via kernels.measures.polygon_area): vertex
    rows (region_id, depth, loop_idx, vtx_idx, x, y, z) gathered per
    polygon in one applyInPandas group."""

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import measures as M

        (rid,) = key
        loops = []
        for _li, sub in sorted(pdf.groupby("loop_idx")):
            sub = sub.sort_values("vtx_idx")
            loops.append(
                (int(sub["depth"].iloc[0]), sub[["x", "y", "z"]].to_numpy())
            )
        return pd.DataFrame(
            [{"region_id": int(rid), "parea": M.polygon_area(loops)}]
        )

    return vertex_df.groupBy("region_id").applyInPandas(
        compute, schema=POLYGON_AREA_SCHEMA
    )
