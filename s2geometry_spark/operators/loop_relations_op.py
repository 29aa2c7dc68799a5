"""Distributed loop↔loop relation columns.

Reference semantics: S2Loop.Contains(S2Loop) / Intersects /
CompareBoundary / ContainsNested (S2Region/S2Loop.cs), including the
shared-vertex wedge branches (self-pairs share every vertex).

The loop dim set is broadcast in the UDF closure (same pattern as the
PIP refine); the pair table is the distributed axis — relation rows
are independent, so an N×M pair matrix fans out over executors with
no shuffle beyond the pair join itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("contains", BooleanType(), False),
        StructField("intersects", BooleanType(), False),
        StructField("cmp_boundary", IntegerType(), False),
        StructField("nested", BooleanType(), False),
    ]
)


def relation_row(a, b) -> tuple:
    """(contains, intersects, cmp_boundary, nested) for Loop pair;
    `nested` is ContainsNested where the boundaries do not cross
    (its precondition), else False."""
    from ..kernels.loop import (
        loop_compare_boundary,
        loop_contains_loop,
        loop_contains_nested,
        loop_intersects_loop,
    )

    cmp_b = loop_compare_boundary(a, b)
    nested = bool(cmp_b != 0 and loop_contains_nested(a, b))
    return (
        bool(loop_contains_loop(a, b)),
        bool(loop_intersects_loop(a, b)),
        int(cmp_b),
        nested,
    )


def loop_relations(pairs: DataFrame, loops_by_id: dict) -> DataFrame:
    """pairs(a_id, b_id) -> + relation columns, loops broadcast via
    closure."""

    @pandas_udf(_SCHEMA)
    def _rel(a_id: pd.Series, b_id: pd.Series) -> pd.DataFrame:
        out = {"contains": [], "intersects": [], "cmp_boundary": [],
               "nested": []}
        for ai, bi in zip(a_id.tolist(), b_id.tolist()):
            c, x, cb, n = relation_row(loops_by_id[ai], loops_by_id[bi])
            out["contains"].append(c)
            out["intersects"].append(x)
            out["cmp_boundary"].append(cb)
            out["nested"].append(n)
        return pd.DataFrame(out)

    r = _rel(F.col("a_id"), F.col("b_id"))
    return pairs.select(
        "a_id",
        "b_id",
        r.getField("contains").alias("contains"),
        r.getField("intersects").alias("intersects"),
        r.getField("cmp_boundary").alias("cmp_boundary"),
        r.getField("nested").alias("nested"),
    )


_POLY_SCHEMA = StructType(
    [
        StructField("contains", BooleanType(), False),
        StructField("intersects", BooleanType(), False),
    ]
)


def poly_relation_row(a_rings, b_rings) -> tuple:
    """(contains, intersects) for multi-ring polygons via signed
    winding (kernels/winding.polygon_contains/polygon_intersects —
    S2Polygon.Contains/Intersects semantics)."""
    from ..kernels.winding import polygon_contains, polygon_intersects

    a = [r for r in a_rings]
    b = [r for r in b_rings]
    return (
        bool(polygon_contains(a, b)),
        bool(polygon_intersects(a, b)),
    )


def poly_relations(pairs: DataFrame, cases_by_key: dict) -> DataFrame:
    """pairs(a_id, b_id) -> + polygon relation columns; the fixture
    polygons are broadcast via the UDF closure keyed by (a_id, b_id)."""

    @pandas_udf(_POLY_SCHEMA)
    def _rel(a_id: pd.Series, b_id: pd.Series) -> pd.DataFrame:
        out = {"contains": [], "intersects": []}
        for ai, bi in zip(a_id.tolist(), b_id.tolist()):
            a_rings, b_rings = cases_by_key[(ai, bi)]
            c, x = poly_relation_row(a_rings, b_rings)
            out["contains"].append(c)
            out["intersects"].append(x)
        return pd.DataFrame(out)

    r = _rel(F.col("a_id"), F.col("b_id"))
    return pairs.select(
        "a_id",
        "b_id",
        r.getField("contains").alias("contains"),
        r.getField("intersects").alias("intersects"),
    )
