"""Hot-bucket LSH skew for the embedding paths: a boilerplate corpus
(hundreds of identical embeddings sharing every sign band) must engage
the partner-group salting, spread the hot bucket's pair volume over
``salt_g`` reducer keys, and produce the exact same pair set as the
unsalted join.  Ports the textops skew guarantees (near_dup_pairs,
textops.py:409-449) to ``similarity._salted_band_candidates``."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import similarity as SIM


def _emb_df(spark, n_same: int, n_rand: int):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(SIM.DIM)
    rows = [(i, (base / np.linalg.norm(base)).tolist()) for i in range(n_same)]
    R = rng.standard_normal((n_rand, SIM.DIM))
    R /= np.linalg.norm(R, axis=1, keepdims=True)
    rows += [(n_same + i, R[i].tolist()) for i in range(n_rand)]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(pdf).select(
        F.col("vec_id").cast("long"),
        F.col("embedding").cast("array<float>"),
    )


def test_hot_bucket_salting_preserves_pair_set(spark):
    """Salted (salt_g=8) and unsalted (threshold so high nothing is
    hot) candidate generation produce identical directed pair sets on
    a corpus with one planted hot bucket."""
    emb = _emb_df(spark, n_same=120, n_rand=40)
    bands = SIM._band_planes(SIM.N_BANDS, SIM.BAND_BITS)
    slim = SIM._band_rows(emb, bands)
    salted = SIM._salted_band_candidates(
        slim, hot_bucket_threshold=16, salt_g=8
    )
    unsalted = SIM._salted_band_candidates(
        slim, hot_bucket_threshold=10**9, salt_g=8
    )
    got = sorted(tuple(r) for r in salted.collect())
    want = sorted(tuple(r) for r in unsalted.collect())
    assert got == want
    # the planted clone block collides in every band -> 120*119 pairs
    n_same_pairs = sum(1 for a, b in got if a < 120 and b < 120)
    assert n_same_pairs == 120 * 119


def test_hot_bucket_pairs_spread_over_salt_groups(spark):
    """The skew property itself: in the salted plan, a hot bucket's
    directed pairs carry >1 distinct shuffle key (b, bk, p==g match),
    i.e. the pair volume lands on salt_g reducer keys instead of one.
    Verified from the data side: partner-group keys g of the nid side
    cover all salt_g groups for the hot block."""
    salt_g = 8
    emb = _emb_df(spark, n_same=120, n_rand=10)
    bands = SIM._band_planes(SIM.N_BANDS, SIM.BAND_BITS)
    slim = SIM._band_rows(emb, bands).withColumn(
        "g", F.pmod(F.xxhash64("vec_id"), F.lit(salt_g))
    )
    hot_groups = (
        slim.where(F.col("vec_id") < 120)
        .select("g")
        .distinct()
        .count()
    )
    # 120 xxhash64 ids spread over 8 groups: all groups occupied, so
    # the hot bucket's pairs shuffle under 8 distinct (b, bk, p) keys
    assert hot_groups == salt_g


def test_ann_and_near_dup_complete_on_boilerplate(spark):
    """End-to-end: both gated queries complete on the skewed corpus and
    agree between salt_g=1 and salt_g=8."""
    emb = _emb_df(spark, n_same=150, n_rand=30)
    for fn, kw in (
        (SIM.ann_lsh_topk, dict(k=3)),
        (SIM.embed_near_dup, dict(threshold=0.92)),
    ):
        got1 = sorted(
            tuple(r) for r in fn(emb, salt_g=1, **kw).collect()
        )
        got8 = sorted(
            tuple(r) for r in fn(emb, hot_bucket_threshold=16, salt_g=8, **kw).collect()
        )
        assert got1 == got8
    # the clone block folds to one root under near-dup
    nd = SIM.embed_near_dup(emb, 0.92, hot_bucket_threshold=16).collect()
    roots = {r["dup_root"] for r in nd if r["vec_id"] < 150}
    assert roots == {0}


def test_uniform_buckets_stay_unsalted(spark):
    """The relative engagement rule: a table where EVERY bucket is
    moderately sized (uniform 10x-duplication, the sf1 soak shape) has
    no straggler reducer, so no bucket may salt — replication there is
    pure overhead (measured 3-4x slower at sf1).  A single dominant
    boilerplate block must still salt."""
    rng = np.random.default_rng(11)
    # 40 clone blocks of 30: every band bucket holds >= 30 rows
    # (> threshold 16) but none dominates the total pair work
    rows = []
    for blk in range(40):
        v = rng.standard_normal(SIM.DIM)
        v /= np.linalg.norm(v)
        for i in range(30):
            rows.append((blk * 30 + i, v.tolist()))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf).select(
        F.col("vec_id").cast("long"),
        F.col("embedding").cast("array<float>"),
    )
    bands = SIM._band_planes(SIM.N_BANDS, SIM.BAND_BITS)
    slim = SIM._band_rows(emb, bands)
    assert SIM.hot_buckets(slim, hot_bucket_threshold=16).count() == 0

    # planted dominant block: one bucket holds most of the pair work
    hot_emb = _emb_df(spark, n_same=300, n_rand=40)
    hot_slim = SIM._band_rows(hot_emb, bands)
    assert SIM.hot_buckets(hot_slim, hot_bucket_threshold=16).count() > 0


def test_unskewed_corpus_compiles_one_branch_plan(spark):
    """With zero hot buckets the eager emptiness check must return the
    plain one-branch join — no partner-group explode, no hot+cold
    union — so whole-stage codegen never compiles the salted half of
    the plan (the sf1 soak measured that compile at ~25s of a 37s cold
    run).  A planted boilerplate block must still produce the salted
    two-branch plan."""
    emb = _emb_df(spark, n_same=1, n_rand=60)
    bands = SIM._band_planes(SIM.N_BANDS, SIM.BAND_BITS)
    slim = SIM._band_rows(emb, bands)
    cand = SIM._salted_band_candidates(slim, hot_bucket_threshold=16)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "explode" not in plan and "Union" not in plan

    hot_emb = _emb_df(spark, n_same=120, n_rand=10)
    hot_slim = SIM._band_rows(hot_emb, bands)
    hot_cand = SIM._salted_band_candidates(hot_slim, hot_bucket_threshold=16)
    hot_plan = hot_cand._jdf.queryExecution().executedPlan().toString()
    assert "explode" in hot_plan and "Union" in hot_plan
