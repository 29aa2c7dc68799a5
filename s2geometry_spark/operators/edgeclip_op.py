"""Distributed edge→face uv clipping.

Reference semantics: S2EdgeClipping.ClipToPaddedFace
(S2EdgeClipping.cs) — each great-circle edge is clipped to every cube
face it touches, yielding the (u,v) segment on that face.

One Arrow batch in, one row out per (edge, touched face): the same
fan-out the shape-index insertion path uses, exposed as a first-class
operator.  Edges are independent — partition-parallel, no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from ..kernels.edgeclip import clip_to_padded_face

_CLIP_SCHEMA = ArrayType(
    StructType(
        [
            StructField("face", IntegerType(), False),
            StructField("au", DoubleType(), False),
            StructField("av", DoubleType(), False),
            StructField("bu", DoubleType(), False),
            StructField("bv", DoubleType(), False),
        ]
    )
)


def clip_rows(a: tuple, b: tuple, padding: float = 0.0) -> list[tuple]:
    """(face, au, av, bu, bv) for every face the edge AB touches."""
    out = []
    for face in range(6):
        r = clip_to_padded_face(a, b, face, padding)
        if r is not None:
            (au, av), (bu, bv) = r
            out.append((face, au, av, bu, bv))
    return out


def edge_face_clips(edges: DataFrame, padding: float = 0.0) -> DataFrame:
    """edges(key, ax..bz) -> (key, face, au, av, bu, bv) rows."""

    @pandas_udf(_CLIP_SCHEMA)
    def _clip(ax, ay, az, bx, by, bz):
        out = []
        for i in range(len(ax)):
            a = (float(ax[i]), float(ay[i]), float(az[i]))
            b = (float(bx[i]), float(by[i]), float(bz[i]))
            out.append(
                [
                    {"face": f, "au": au, "av": av, "bu": bu, "bv": bv}
                    for f, au, av, bu, bv in clip_rows(a, b, padding)
                ]
            )
        return pd.Series(out)

    clipped = edges.select(
        "key",
        F.explode(
            _clip(
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
            )
        ).alias("c"),
    )
    return clipped.select(
        "key",
        F.col("c.face").alias("face"),
        F.col("c.au").alias("au"),
        F.col("c.av").alias("av"),
        F.col("c.bu").alias("bu"),
        F.col("c.bv").alias("bv"),
    )
