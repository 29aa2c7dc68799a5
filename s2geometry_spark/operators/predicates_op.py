"""Distributed robust-predicate columns.

Reference semantics: S2Predicates.cs Sign (triage→exact ladder),
OrderedCCW, CompareDistances (incl. the symbolic pedestal
perturbation), S2EdgeCrossings VertexCrossing, and
S2WedgeRelations.GetWedgeRelation — evaluated per row over tuples of
neighboring points.

The kernels are scalar (the exact ladder branches per input); rows are
independent, so the operator scales by partitioning alone.  The int /
bool / enum outcomes are exact, which makes the driver-literal oracle
a bit-for-bit distributed==single-node check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..kernels.edges import (
    compare_distances,
    ordered_ccw,
    sign,
    signed_vertex_crossing,
)
from ..kernels.wedge import wedge_relation

_SCHEMA = StructType(
    [
        StructField("sgn", IntegerType(), False),
        StructField("occw", BooleanType(), False),
        StructField("cmpd", IntegerType(), False),
        StructField("vcross", IntegerType(), False),
        StructField("wedge", StringType(), False),
    ]
)


def predicate_rows(points_5: list[tuple]) -> tuple:
    """One row of predicate outcomes from 5 unit points (a..e):
    Sign(a,b,c); OrderedCCW(a,b,c around d); CompareDistances(x=a;b,c);
    VertexCrossing of edges (a,b),(b,d) sharing b; WedgeRelation of
    wedges (a,c,b) and (d,c,e) sharing center c."""
    a, b, c, d, e = points_5
    return (
        sign(a, b, c),
        ordered_ccw(a, b, c, d),
        compare_distances(a, b, c),
        signed_vertex_crossing(a, b, b, d),
        wedge_relation(a, c, b, d, e),
    )


@pandas_udf(_SCHEMA)
def _preds(*cols: pd.Series) -> pd.DataFrame:
    arrs = [s.to_numpy() for s in cols]
    out = {"sgn": [], "occw": [], "cmpd": [], "vcross": [], "wedge": []}
    for i in range(len(arrs[0])):
        pts = [
            (float(arrs[3 * j][i]), float(arrs[3 * j + 1][i]),
             float(arrs[3 * j + 2][i]))
            for j in range(5)
        ]
        sgn, occw, cmpd, vc, wr = predicate_rows(pts)
        out["sgn"].append(sgn)
        out["occw"].append(occw)
        out["cmpd"].append(cmpd)
        out["vcross"].append(vc)
        out["wedge"].append(wr)
    return pd.DataFrame(out)


def predicate_columns(quint: DataFrame) -> DataFrame:
    """quint(key, ax..ez: 15 unit-vector columns) -> predicate row."""
    cols = [
        F.col(f"{p}{ax}") for p in ("a", "b", "c", "d", "e")
        for ax in ("x", "y", "z")
    ]
    s = _preds(*cols)
    return quint.select(
        "key",
        s.getField("sgn").alias("sgn"),
        s.getField("occw").alias("occw"),
        s.getField("cmpd").alias("cmpd"),
        s.getField("vcross").alias("vcross"),
        s.getField("wedge").alias("wedge"),
    )
