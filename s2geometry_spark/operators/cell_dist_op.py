"""Distributed cell↔cell distance columns.

Reference semantics: S2Cell.Distance / MaxDistance(S2Cell)
(S2Region/S2Cell.cs) — min squared-chord distance is zero on uv
overlap, else the min over the 4×4 vertex↔edge combinations; max
distance reflects through the antipode.

The scalar kernels (kernels.cell_dist, golden-tested against the
reference) run inside an Arrow batch; rows are independent, so the
operator scales by partitioning alone — no shuffle, no driver state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

from ..kernels.cell_dist import (
    cell_distance_to_cell,
    cell_max_distance_to_cell,
)
from ..kernels.geom import Cell

_PAIR_SCHEMA = StructType(
    [
        StructField("min_d2", DoubleType(), False),
        StructField("max_d2", DoubleType(), False),
    ]
)


@pandas_udf(_PAIR_SCHEMA)
def _pair_dist(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    av = a.to_numpy().astype(np.int64).view(np.uint64)
    bv = b.to_numpy().astype(np.int64).view(np.uint64)
    mn = np.empty(len(av))
    mx = np.empty(len(av))
    for i in range(len(av)):
        ca, cb = Cell(av[i].item()), Cell(bv[i].item())
        mn[i] = cell_distance_to_cell(ca, cb)
        mx[i] = cell_max_distance_to_cell(ca, cb)
    return pd.DataFrame({"min_d2": mn, "max_d2": mx})


def cell_pair_distances(pairs: DataFrame) -> DataFrame:
    """pairs(key, cell_a, cell_b) -> + (min_d2, max_d2)."""
    d = _pair_dist(F.col("cell_a"), F.col("cell_b"))
    return pairs.select(
        "key",
        "cell_a",
        "cell_b",
        d.getField("min_d2").alias("min_d2"),
        d.getField("max_d2").alias("max_d2"),
    )


_AREA_SCHEMA = StructType(
    [
        StructField("avg_area", DoubleType(), False),
        StructField("approx_area", DoubleType(), False),
        StructField("exact_area", DoubleType(), False),
        StructField("un_leaves", DoubleType(), False),
        StructField("un_exact_area", DoubleType(), False),
    ]
)


@pandas_udf(_AREA_SCHEMA)
def _pair_areas(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """Cell areas (S2Cell.AverageArea/ApproxArea/ExactArea,
    S2Region/S2Cell.cs:158-204) of cell_a plus cell-union measures of
    Normalize({cell_a, cell_b}): leaf count (S2CellUnion
    LeafCellsCovered) and summed exact area (ExactArea,
    S2CellUnion.cs:270-297)."""
    from ..kernels import cellunion as CU
    from ..kernels.geom import (
        cell_approx_area, cell_average_area, cell_exact_area,
    )

    av = a.to_numpy().astype(np.int64).view(np.uint64)
    bv = b.to_numpy().astype(np.int64).view(np.uint64)
    n = len(av)
    out = {k: np.empty(n) for k in (
        "avg_area", "approx_area", "exact_area", "un_leaves",
        "un_exact_area",
    )}
    for i in range(n):
        ca = Cell(av[i].item())
        out["avg_area"][i] = cell_average_area(ca.level)
        out["approx_area"][i] = cell_approx_area(ca)
        out["exact_area"][i] = cell_exact_area(ca)
        un = CU.normalize([av[i].item(), bv[i].item()])
        out["un_leaves"][i] = float(CU.leaf_cells_covered(un))
        out["un_exact_area"][i] = CU.exact_area(un)
    return pd.DataFrame(out)


def cell_pair_areas(pairs: DataFrame) -> DataFrame:
    """pairs(key, cell_a, cell_b) -> (key, avg_area, approx_area,
    exact_area, un_leaves, un_exact_area) — the cell / cell-union area
    surface as a distributed per-row arm."""
    d = _pair_areas(F.col("cell_a"), F.col("cell_b"))
    return pairs.select(
        "key",
        d.getField("avg_area").alias("avg_area"),
        d.getField("approx_area").alias("approx_area"),
        d.getField("exact_area").alias("exact_area"),
        d.getField("un_leaves").alias("un_leaves"),
        d.getField("un_exact_area").alias("un_exact_area"),
    )
