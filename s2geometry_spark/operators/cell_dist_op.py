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
