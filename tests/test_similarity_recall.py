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


class TestEmbedNearDup:
    """Embedding-cosine near-dup grouping: planted near-duplicates
    (vector + tiny noise) must fold to their originals' roots, and
    far-apart vectors must survive untouched."""

    def test_planted_duplicates_fold_to_root(self, spark):
        rng = np.random.default_rng(7)
        base = rng.standard_normal((60, SIM.DIM))
        # vectors 60..89 are near-copies of 0..29 (cosine ~0.999)
        dups = base[:30] + 0.01 * rng.standard_normal((30, SIM.DIM))
        V = np.vstack([base, dups])
        df = _emb_df(spark, V)
        out = {
            r["vec_id"]: (r["dup_root"], r["is_dup"], r["n_nbrs"])
            for r in SIM.embed_near_dup(df, threshold=0.95).collect()
        }
        assert len(out) == 90
        for i in range(30):
            # the copy folds onto its original
            root, is_dup, n = out[60 + i]
            assert root == i and is_dup and n >= 1
            # the original keeps itself as root (copy id is larger)
            root0, is_dup0, n0 = out[i]
            assert root0 == i and not is_dup0 and n0 >= 1
        for i in range(30, 60):
            root, is_dup, n = out[i]
            assert root == i and not is_dup

    def test_matches_mirrored_duckdb_oracle(self, spark):
        import duckdb

        rng = np.random.default_rng(11)
        base = rng.standard_normal((40, SIM.DIM))
        V = np.vstack([base, base[:10] + 0.02 * rng.standard_normal((10, SIM.DIM))])
        df = _emb_df(spark, V)
        got = sorted(
            tuple(r) for r in SIM.embed_near_dup(df, threshold=0.9).collect()
        )
        con = duckdb.connect()
        pdf = df.toPandas()
        con.register("embeddings", pdf)
        want = sorted(
            tuple(r)
            for r in con.sql(SIM.embed_near_dup_sql(threshold=0.9)).fetchall()
        )
        assert got == want


class TestIvfAnn:
    """IVF coarse-quantizer path: high recall on clustered corpora
    when lists align with the cluster structure; deterministic
    training."""

    N_LISTS = 8

    def _train(self, V):
        Xn = V / np.linalg.norm(V, axis=1, keepdims=True)
        cents = Xn[: self.N_LISTS].copy()
        for _ in range(SIM.IVF_ITERS):
            assign = np.argmax(Xn @ cents.T, axis=1)
            for c in range(self.N_LISTS):
                m = Xn[assign == c]
                if len(m):
                    s = m.sum(axis=0)
                    n = np.linalg.norm(s)
                    if n > 0:
                        cents[c] = s / n
        return cents

    def test_clustered_recall(self, spark):
        rng = np.random.default_rng(3)
        centroids = rng.standard_normal((self.N_LISTS, SIM.DIM))
        V = np.repeat(centroids, 40, axis=0) + 0.12 * rng.standard_normal(
            (self.N_LISTS * 40, SIM.DIM)
        )
        df = _emb_df(spark, V)
        cents = self._train(V)
        exact = {}
        for r in SIM.cosine_topk(df, K).collect():
            exact.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        got = {}
        for r in SIM.ann_ivf_topk(df, K, centroids=cents).collect():
            got.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        rec = hits / (len(exact) * K)
        print(f"ivf clustered recall@{K}: {rec:.3f}")
        assert rec >= 0.9

    def test_training_is_deterministic(self):
        c1 = SIM.ivf_centroids("/root/testdata/sf0.001")
        c2 = SIM.ivf_centroids("/root/testdata/sf0.001")
        assert np.array_equal(c1, c2)
        n = SIM.ivf_num_centroids("/root/testdata/sf0.001")
        assert c1.shape == (n, SIM.DIM)

    def test_list_count_scales_with_table(self):
        small = SIM.ivf_num_centroids("/root/testdata/sf0.001")
        large = SIM.ivf_num_centroids("/root/testdata/sf0.1")
        assert SIM.IVF_C_MIN <= small <= large <= SIM.IVF_C_MAX
