"""Distributed S2Earth conversions + S2Metrics level pickers.

Reference semantics: S2Earth.cs (radius 6,371,010 m conversions) and
S2Metrics.cs level pickers (GetLevelForMaxValue / GetLevelForMinValue /
GetClosestLevel), which operate on the *exponent* of the ratio
value/deriv (frexp), not on a rounded log — so levels are exact at
power-of-two boundaries.

Fully vectorized numpy in one Arrow batch (np.frexp / np.ldexp).  The
DuckDB oracle re-implements the exponent arithmetic independently with
a corrected floor(log2) (duckdb_oracle.earth_metrics_sql), making this
a two-implementation check of the boundary behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from ..constants import (
    KAVG_AREA_DERIV,
    KAVG_EDGE_DERIV,
    KMIN_WIDTH_DERIV,
    MAX_LEVEL,
)
from ..kernels.earth import RADIUS_KM, RADIUS_METERS

_SCHEMA = StructType(
    [
        StructField("rad", DoubleType(), False),
        StructField("km", DoubleType(), False),
        StructField("lvl_minw_max", IntegerType(), False),
        StructField("lvl_avge_min", IntegerType(), False),
        StructField("lvl_avga_max", IntegerType(), False),
        StructField("lvl_closest", IntegerType(), False),
        StructField("val_minw", DoubleType(), False),
        StructField("val_avga", DoubleType(), False),
    ]
)

_SQRT2 = np.sqrt(2.0)


def _flog2(v: np.ndarray) -> np.ndarray:
    """frexp exponent minus one == floor(log2(v)), exact."""
    _m, x = np.frexp(v)
    return x.astype(np.int64) - 1


def _clamp(lv: np.ndarray) -> np.ndarray:
    return np.clip(lv, 0, MAX_LEVEL)


@pandas_udf(_SCHEMA)
def _earth_metrics(meters: pd.Series) -> pd.DataFrame:
    m = meters.to_numpy()
    rad = m / RADIUS_METERS
    km = rad * RADIUS_KM
    # S2Metrics GetLevelForMaxValue / GetLevelForMinValue short-circuit
    # to kMaxLevel for value <= 0 (S2Metrics.cs); mirror that instead
    # of dividing (rad=0 would raise divide warnings and clamp to 0/1)
    nonpos = rad <= 0
    safe = np.where(nonpos, 1.0, rad)
    # LengthMetric.GetLevelForMaxValue(rad): -(frexp(v/deriv).x - 1)
    lvl_minw_max = np.where(nonpos, MAX_LEVEL, _clamp(-_flog2(safe / KMIN_WIDTH_DERIV)))
    # LengthMetric.GetLevelForMinValue(rad): frexp(deriv/v).x - 1
    lvl_avge_min = np.where(nonpos, MAX_LEVEL, _clamp(_flog2(KAVG_EDGE_DERIV / safe)))
    # AreaMetric.GetLevelForMaxValue(rad as area): -((x-1) >> 1)
    lvl_avga_max = np.where(nonpos, MAX_LEVEL, _clamp(-(_flog2(safe / KAVG_AREA_DERIV) >> 1)))
    # LengthMetric.GetClosestLevel = GetLevelForMaxValue(sqrt2 * v)
    lvl_closest = np.where(nonpos, MAX_LEVEL, _clamp(-_flog2(_SQRT2 * safe / KAVG_EDGE_DERIV)))
    val_minw = np.ldexp(KMIN_WIDTH_DERIV, -lvl_minw_max)
    val_avga = np.ldexp(KAVG_AREA_DERIV, -2 * lvl_avga_max)
    return pd.DataFrame(
        {
            "rad": rad,
            "km": km,
            "lvl_minw_max": lvl_minw_max.astype(np.int32),
            "lvl_avge_min": lvl_avge_min.astype(np.int32),
            "lvl_avga_max": lvl_avga_max.astype(np.int32),
            "lvl_closest": lvl_closest.astype(np.int32),
            "val_minw": val_minw,
            "val_avga": val_avga,
        }
    )


def earth_metric_columns(df: DataFrame) -> DataFrame:
    """df(key, meters) -> + conversion and level-picker columns."""
    s = _earth_metrics(F.col("meters"))
    return df.select(
        "key",
        *[
            s.getField(f.name).alias(f.name)
            for f in _SCHEMA.fields
        ],
    )
