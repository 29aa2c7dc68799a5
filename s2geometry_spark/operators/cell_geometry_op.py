"""Distributed cell uv-geometry columns.

Reference semantics: S2CellId.IJLevelToBoundUV (the cell's (u,v) rect
from its (i,j,level)), S2CellId.ExpandedByDistanceUV (expand a uv rect
so it contains everything within a geodesic distance), and
S2CellId.MaximumTile (largest cell starting at a position that stays
inside a Hilbert-range limit — the range-tiling primitive).

Rows are independent (one Arrow batch in, one row out) — partition-
parallel, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..kernels import cellid as C

_SCHEMA = StructType(
    [StructField(n, DoubleType(), False)
     for n in ("u0", "u1", "v0", "v1", "eu0", "eu1", "ev0", "ev1")]
    + [StructField("maxtile", LongType(), False)]
)


def geometry_row(cid: int, nxt: int, dist_rad: float) -> tuple:
    """(u0,u1,v0,v1, expanded…, maximum_tile) for one cell, with the
    Hilbert limit taken from the next cell's range_min."""
    one = np.array([cid], np.uint64)
    _f, i, j = C.to_face_ij(one)
    lv = int(C.level(one)[0])
    (u0, u1), (v0, v1) = C.ij_level_to_bound_uv(int(i[0]), int(j[0]), lv)
    (eu0, eu1), (ev0, ev1) = C.expanded_by_distance_uv(
        ((u0, u1), (v0, v1)), dist_rad
    )
    lim = int(C.range_min(np.array([nxt], np.uint64))[0])
    mt = C.maximum_tile(cid, lim)
    return (u0, u1, v0, v1, eu0, eu1, ev0, ev1,
            int(np.array([mt], np.uint64).view(np.int64)[0]))


@pandas_udf(_SCHEMA)
def _geom(cid: pd.Series, nxt: pd.Series, dist: pd.Series) -> pd.DataFrame:
    cv = cid.to_numpy().astype(np.int64).view(np.uint64)
    nv = nxt.to_numpy().astype(np.int64).view(np.uint64)
    dv = dist.to_numpy()
    rows = [
        geometry_row(int(cv[i]), int(nv[i]), float(dv[i]))
        for i in range(len(cv))
    ]
    return pd.DataFrame(
        rows,
        columns=["u0", "u1", "v0", "v1", "eu0", "eu1", "ev0", "ev1",
                 "maxtile"],
    )


def cell_geometry(cells: DataFrame) -> DataFrame:
    """cells(key, cell, nxt, dist) -> + uv bound / expanded / maxtile."""
    s = _geom(F.col("cell"), F.col("nxt"), F.col("dist"))
    return cells.select(
        "key",
        *[s.getField(f.name).alias(f.name) for f in _SCHEMA.fields],
    )
