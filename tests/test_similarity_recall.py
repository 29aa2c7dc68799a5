"""ANN quality gate: banded OR-amplified sign-LSH must reach high
recall on clustered (realistic-embedding) corpora, and its measured
recall on the structure-free uniform table must match the analytic
collision probability — documenting the honest limit (no hash family
can beat brute force on data with no neighborhood structure)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from s2geometry_spark.operators import similarity as SIM

K = 5


def _emb_df(spark, V):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(V), dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in V],
            "label": ["x"] * len(V),
        }
    )
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.StringType()),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)


def _recall(spark, V, **ann_kw):
    df = _emb_df(spark, V)
    exact = {}
    for r in SIM.cosine_topk(df, K).collect():
        exact.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in SIM.ann_lsh_topk(df, K, **ann_kw).collect():
        got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    hits = sum(
        len(exact[q] & got.get(q, set())) for q in exact
    )
    return hits / (len(exact) * K)


def test_clustered_recall_floor(spark):
    rng = np.random.default_rng(42)
    centroids = rng.standard_normal((40, SIM.DIM))
    V = np.repeat(centroids, 10, axis=0) + 0.15 * rng.standard_normal(
        (400, SIM.DIM)
    )
    rec = _recall(spark, V)
    print(f"clustered recall@{K}: {rec:.3f}")
    assert rec >= 0.9


def test_uniform_recall_matches_analytic(spark):
    """Uniform-random vectors: measured recall ~= the OR-amplified
    collision probability 1 - (1 - s^bits)^bands at the observed
    top-k angles."""
    rng = np.random.default_rng(7)
    V = rng.standard_normal((400, SIM.DIM))
    Vn = V / np.linalg.norm(V, axis=1)[:, None]
    S = Vn @ Vn.T
    np.fill_diagonal(S, -2)
    top = np.sort(S, axis=1)[:, -K:]
    s = 1 - np.arccos(np.clip(top, -1, 1)) / math.pi
    expect = float(
        np.mean(1 - (1 - s**SIM.BAND_BITS) ** SIM.N_BANDS)
    )
    rec = _recall(spark, V)
    print(f"uniform recall@{K}: {rec:.3f} (analytic {expect:.3f})")
    assert abs(rec - expect) < 0.15
