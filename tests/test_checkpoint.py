"""Checkpointed-pipeline semantics: resume-skip on identical
fingerprints, recompute on changed params/inputs, lineage metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import tile as T
from s2geometry_spark.plans.checkpoint import CheckpointedPipeline
from s2geometry_spark.sources import points as P


@pytest.fixture()
def pipe(spark, tmp_path):
    return CheckpointedPipeline(spark, str(tmp_path / "ckpt"))


def _pts(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return P.with_xyz(orders.select(F.col("o_orderkey").alias("key")))


class TestCheckpoint:
    def test_stage_runs_then_resumes(self, spark, sf_dir, pipe):
        src = pipe.source("orders_pts", _pts(spark, sf_dir), version="sf0.001")
        r1 = pipe.stage(
            "cellids", lambda df: T.assign_cellids(df), inputs=(src,),
            params={"level": "leaf"},
        )
        assert not r1.resumed and r1.rows > 0
        r2 = pipe.stage(
            "cellids", lambda df: T.assign_cellids(df), inputs=(src,),
            params={"level": "leaf"},
        )
        assert r2.resumed
        assert r2.fingerprint == r1.fingerprint
        assert r2.df.count() == r1.rows
        # resumed output identical
        a = sorted(r["cell_id"] for r in r1.df.select("cell_id").collect())
        b = sorted(r["cell_id"] for r in r2.df.select("cell_id").collect())
        assert a == b

    def test_param_change_recomputes(self, spark, sf_dir, pipe):
        src = pipe.source("orders_pts", _pts(spark, sf_dir), version="sf0.001")
        r1 = pipe.stage(
            "tiles", lambda df: T.tile_counts(T.assign_cellids(df), 6),
            inputs=(src,), params={"level": 6},
        )
        r2 = pipe.stage(
            "tiles", lambda df: T.tile_counts(T.assign_cellids(df), 8),
            inputs=(src,), params={"level": 8},
        )
        assert not r2.resumed
        assert r1.fingerprint != r2.fingerprint

    def test_upstream_change_invalidates_downstream(self, spark, sf_dir, pipe):
        src1 = pipe.source("pts", _pts(spark, sf_dir), version="v1")
        r1 = pipe.stage("c", lambda df: T.assign_cellids(df), inputs=(src1,))
        src2 = pipe.source("pts", _pts(spark, sf_dir), version="v2")
        r2 = pipe.stage("c", lambda df: T.assign_cellids(df), inputs=(src2,))
        assert not r2.resumed  # upstream fingerprint changed

    def test_lineage_metrics(self, spark, sf_dir, pipe):
        src = pipe.source("pts", _pts(spark, sf_dir), version="v1")
        r = pipe.stage("cells", lambda df: T.assign_cellids(df), inputs=(src,))
        lin = pipe.lineage("cells")
        rows = lin.agg(F.sum("rows_out")).collect()[0][0]
        assert rows == r.rows
        cols = set(lin.columns)
        assert {
            "stage", "partition_id", "file", "rows_out", "bytes",
            "wall_ms", "fingerprint",
        } <= cols
