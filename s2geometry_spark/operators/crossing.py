"""Crossing-edges join: all pairs of geodesic edges (one from each
side) that cross at an interior point.

Pattern (SURVEY.md §2.4 crossing-edges row, Query/S2CrossingEdgeQuery.cs):
each edge emits the 3x3 cell neighborhoods of BOTH endpoints at a level
whose min cell width >= the longest edge — any interior crossing point
then provably lands in a cell emitted by both sides, so a hash
equi-join on the cell id yields a complete candidate set; an exact
crossing-sign predicate (pure JVM column arithmetic — no Python in the
refine) keeps true crossings.

The refine expression text is shared verbatim with the DuckDB oracle
(crossing_pairs_sql), so both engines evaluate the identical IEEE
expression tree.

This join is also the distributed equivalent of
S2ShapeUtil/VisitCrossingEdgePairs.cs (VisitCrossings over one or two
shape indexes): where the reference walks index cells and tests the
edge pairs sharing a cell, the covering-cell equi-join materializes
exactly those same co-located pairs as candidates.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import KMIN_WIDTH

EDGE_COLS = ["line_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz"]


def crossing_condition_sql(a: str, b: str, c: str, d: str) -> str:
    """Engine-neutral SQL boolean: edges ({a},{b}) x ({c},{d}) cross
    interiorly.  `a`..`d` are column prefixes (e.g. 'a' -> ax, ay, az).
    Mirrors kernels.edges.crossing_fast_batch term-for-term."""
    nx = f"({a}y*{b}z - {a}z*{b}y)"
    ny = f"({a}z*{b}x - {a}x*{b}z)"
    nz = f"({a}x*{b}y - {a}y*{b}x)"
    det_c = f"(({nx}*{c}x + {ny}*{c}y) + {nz}*{c}z)"
    det_d = f"(({nx}*{d}x + {ny}*{d}y) + {nz}*{d}z)"
    cdx = f"({c}y*{d}z - {c}z*{d}y)"
    cdy = f"({c}z*{d}x - {c}x*{d}z)"
    cdz = f"({c}x*{d}y - {c}y*{d}x)"
    det_b = f"(({cdx}*{b}x + {cdy}*{b}y) + {cdz}*{b}z)"
    det_a = f"(({cdx}*{a}x + {cdy}*{a}y) + {cdz}*{a}z)"
    sgn = "CASE WHEN {0} > 0 THEN 1 WHEN {0} < 0 THEN -1 ELSE 0 END"
    s_c = sgn.format(det_c)
    s_d = sgn.format(det_d)
    return (
        f"(({s_c}) <> ({s_d}) AND ({s_c}) <> 0 AND ({s_d}) <> 0 "
        f"AND ({sgn.format(det_b)}) = ({s_c}) "
        f"AND ({sgn.format(det_a)}) = -({s_c}))"
    )


def _edge_cells_udf(level: int):
    """pUDF: distinct 3x3 ring cells of both edge endpoints at `level`
    (complete cover of any point within one cell min-width of either
    endpoint — hence of the whole edge when it is shorter than that)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    import numpy as np

    from ..kernels import cellid as CI

    @pandas_udf(ArrayType(LongType()))
    def _cells(
        ax: pd.Series, ay: pd.Series, az: pd.Series,
        bx: pd.Series, by: pd.Series, bz: pd.Series,
    ) -> pd.Series:
        la = CI.xyz_to_cellid(ax.to_numpy(), ay.to_numpy(), az.to_numpy())
        lb = CI.xyz_to_cellid(bx.to_numpy(), by.to_numpy(), bz.to_numpy())
        ra = CI.as_i64(CI.ring_neighbors(la, level))
        rb = CI.as_i64(CI.ring_neighbors(lb, level))
        mat = np.concatenate([ra, rb], axis=1)
        mat.sort(axis=1)
        keep = np.ones(mat.shape, dtype=bool)
        keep[:, 1:] = mat[:, 1:] != mat[:, :-1]
        return pd.Series([row[k].tolist() for row, k in zip(mat, keep)])

    return _cells


def edges_df(spark: SparkSession, edges: list) -> DataFrame:
    """[(line_id, edge_id, a, b)] -> Spark edge table."""
    rows = [
        (lid, eid, a[0], a[1], a[2], b[0], b[1], b[2])
        for lid, eid, a, b in edges
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=EDGE_COLS))


def max_edge_radians(edges: list) -> float:
    out = 0.0
    for _, _, a, b in edges:
        chord = math.sqrt(sum((a[i] - b[i]) ** 2 for i in range(3)))
        out = max(out, 2 * math.asin(min(1.0, 0.5 * chord)))
    return out


def robust_crossing_udf():
    """pUDF refine: interior-crossing decision with the reference's
    triage -> exact -> symbolic ladder (S2EdgeCrosser.cs:262-296).

    Vectorized fast path mirrors crossing_condition_sql term-for-term;
    rows where any of the four determinants is within kMaxDetError of
    zero (or edges share a vertex) fall back to the scalar robust
    ``kernels.edges.crossing_sign``.  Inputs must be unit length (the
    triage error bound assumes it)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    from ..kernels import edges as E

    @pandas_udf(BooleanType())
    def _cross(
        ax: pd.Series, ay: pd.Series, az: pd.Series,
        bx: pd.Series, by: pd.Series, bz: pd.Series,
        cx: pd.Series, cy: pd.Series, cz: pd.Series,
        dx: pd.Series, dy: pd.Series, dz: pd.Series,
    ) -> pd.Series:
        cols = [
            s.to_numpy()
            for s in (ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz)
        ]
        Ax, Ay, Az, Bx, By, Bz, Cx, Cy, Cz, Dx, Dy, Dz = cols
        nx = Ay * Bz - Az * By
        ny = Az * Bx - Ax * Bz
        nz = Ax * By - Ay * Bx
        det_c = (nx * Cx + ny * Cy) + nz * Cz
        det_d = (nx * Dx + ny * Dy) + nz * Dz
        cdx = Cy * Dz - Cz * Dy
        cdy = Cz * Dx - Cx * Dz
        cdz = Cx * Dy - Cy * Dx
        det_b = (cdx * Bx + cdy * By) + cdz * Bz
        det_a = (cdx * Ax + cdy * Ay) + cdz * Az
        err = E.MAX_DET_ERROR
        ok_c = np.abs(det_c) > err
        ok_d = np.abs(det_d) > err
        s_c = np.sign(det_c)
        s_d = np.sign(det_d)
        decided_no = ok_c & ok_d & (s_c == s_d)
        decided_all = (
            ok_c & ok_d & (np.abs(det_b) > err) & (np.abs(det_a) > err)
        )
        fast = (
            (s_c != s_d)
            & (np.sign(det_b) == s_c)
            & (np.sign(det_a) == -s_c)
        )
        out = np.where(decided_no, False, fast)
        for i in np.flatnonzero(~(decided_no | decided_all)):
            a = (Ax[i], Ay[i], Az[i])
            b = (Bx[i], By[i], Bz[i])
            c = (Cx[i], Cy[i], Cz[i])
            d = (Dx[i], Dy[i], Dz[i])
            out[i] = E.crossing_sign(a, b, c, d) > 0
        return pd.Series(out)

    return _cross


def crossing_edges_join(
    spark: SparkSession,
    edges_a: DataFrame,
    edges_b: DataFrame,
    max_edge_rad: float,
    broadcast_b: bool = True,
    robust: bool = True,
) -> DataFrame:
    """All interiorly-crossing pairs: (a_line, a_edge, b_line, b_edge).

    REQUIRES every edge shorter than `max_edge_rad` (subdivide longer
    edges upstream); the join level is chosen so the candidate cover is
    complete at that length.

    Plan shape: the cell explosion and candidate equi-join carry only
    (line_id, edge_id, cell) — coordinates re-attach AFTER the pair
    dedup via joins on the edge ids (the a side by shuffle hash join —
    it may be fact-scale; the b side broadcast when ``broadcast_b``),
    so the shuffle payload is three longs per row.  ``robust=True``
    routes triage-uncertain candidate rows through the exact predicate
    (rare); ``robust=False`` keeps the all-JVM plain-sign refine (the
    DuckDB-oracle mirror).
    """
    # Completeness needs min cell width at the join level >= the edge
    # length bound (the 3x3 endpoint rings then cover every interior
    # crossing point).  get_level_for_min_value already returns the
    # DEEPEST such level — clamping it away from 0 silently narrowed
    # the cover for edges longer than the level-1 width (~0.471 rad)
    # and dropped crossing pairs; past the level-0 width no level can
    # guarantee completeness, so fail loudly instead.
    if max_edge_rad > KMIN_WIDTH.get_value(0):
        raise ValueError(
            "crossing_edges_join: max_edge_rad "
            f"{max_edge_rad!r} exceeds the level-0 min cell width "
            f"{KMIN_WIDTH.get_value(0)!r}; subdivide edges upstream — "
            "no join level gives a complete candidate cover"
        )
    level = KMIN_WIDTH.get_level_for_min_value(max_edge_rad)
    cells = _edge_cells_udf(level)

    def cell_rows(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col("line_id").alias(f"{prefix}_line"),
            F.col("edge_id").alias(f"{prefix}_edge"),
            F.explode(
                cells(
                    F.col("ax"), F.col("ay"), F.col("az"),
                    F.col("bx"), F.col("by"), F.col("bz"),
                )
            ).alias("cell"),
        )

    a = cell_rows(edges_a, "a")
    b = cell_rows(edges_b, "b")
    if broadcast_b:
        b = F.broadcast(b)
    cand = a.join(b, on="cell", how="inner").dropDuplicates(
        ["a_line", "a_edge", "b_line", "b_edge"]
    )
    # re-attach coordinates: the a side may be fact-scale (broadcast_b
    # exists precisely for an asymmetric big-a/small-b call), so its
    # coordinates come back via a plain shuffle hash join on
    # (a_line, a_edge) — AQE still broadcasts it when it IS small;
    # only the b side honors the explicit broadcast hint.
    ea = edges_a.select(
        F.col("line_id").alias("a_line"), F.col("edge_id").alias("a_edge"),
        "ax", "ay", "az", "bx", "by", "bz",
    )
    eb = edges_b.select(
        F.col("line_id").alias("b_line"), F.col("edge_id").alias("b_edge"),
        F.col("ax").alias("cx"), F.col("ay").alias("cy"),
        F.col("az").alias("cz"), F.col("bx").alias("dx"),
        F.col("by").alias("dy"), F.col("bz").alias("dz"),
    )
    if broadcast_b:
        eb = F.broadcast(eb)
    cand = cand.join(ea, on=["a_line", "a_edge"]).join(
        eb, on=["b_line", "b_edge"]
    )
    if robust:
        pred = robust_crossing_udf()(
            F.col("ax"), F.col("ay"), F.col("az"),
            F.col("bx"), F.col("by"), F.col("bz"),
            F.col("cx"), F.col("cy"), F.col("cz"),
            F.col("dx"), F.col("dy"), F.col("dz"),
        )
    else:
        pred = F.expr(crossing_condition_sql("a", "b", "c", "d"))
    crossed = cand.where(pred)
    return crossed.select("a_line", "a_edge", "b_line", "b_edge")


def crossing_pairs_sql(a_values_cte: str, b_values_cte: str) -> str:
    """DuckDB brute-force mirror: cross join all edge pairs with the
    identical crossing-condition expression text."""
    cond = crossing_condition_sql("a.a", "a.b", "b.a", "b.b")
    return f"""WITH {a_values_cte},
{b_values_cte}
SELECT a.line_id AS a_line, a.edge_id AS a_edge,
       b.line_id AS b_line, b.edge_id AS b_edge
FROM ea a CROSS JOIN eb b
WHERE {cond}"""
