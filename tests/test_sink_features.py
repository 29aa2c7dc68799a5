"""Clustered sink layout + per-image feature extraction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.functions import sparkfns as S
from s2geometry_spark.kernels import png as PNG
from s2geometry_spark.operators import image_features as IF
from s2geometry_spark.operators import tile as T
from s2geometry_spark.sources import images as IMG
from s2geometry_spark.sources import points as P
from s2geometry_spark.sources import sink as SK


class TestClusteredSink:
    def test_round_trip_and_range_scan(self, spark, sf_dir, tmp_path):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        df = T.assign_cellids(
            P.with_xyz(orders.select(F.col("o_orderkey").alias("key")))
        ).select("key", "cell_id")
        path = str(tmp_path / "clustered")
        SK.write_clustered(df, path, n_buckets=4)
        back = SK.read_clustered(spark, path)
        assert back.count() == df.count()
        # within a file, rows are sorted by biased id
        one = back.where(F.col("tile_bucket") == 0)
        vals = [
            r[0]
            for r in one.select(
                S.cell_bias(F.col("cell_id")).alias("b")
            ).collect()
        ]
        # per-partition sorted; collect preserves partition order chunks,
        # so verify global sortedness per input file instead:
        files = one.select(F.input_file_name().alias("f"),
                           S.cell_bias(F.col("cell_id")).alias("b"))
        pdf = files.toPandas()
        for _, grp in pdf.groupby("f"):
            b = grp["b"].to_numpy()
            assert (b[:-1] <= b[1:]).all()
        # range scan equals filtered full scan
        lo, hi = sorted(vals)[len(vals) // 4], sorted(vals)[len(vals) // 2]
        got = SK.scan_cell_range(spark, path, lo, hi).count()
        want = back.where(
            (S.cell_bias(F.col("cell_id")) >= lo)
            & (S.cell_bias(F.col("cell_id")) <= hi)
        ).count()
        assert got == want and got > 0


class TestImageFeatures:
    def test_features_match_oracle(self, spark):
        n = 60
        feats = {
            r["image_id"]: r
            for r in IF.extract_features(IMG.image_table(spark, n)).collect()
        }
        assert len(feats) == n
        for i in range(n):
            rec = IMG.row_record(i)
            r = feats[rec["image_id"]]
            rgb = PNG.decode_image(rec["bytes"], rec["fmt"])
            assert (r["h"], r["w"]) == rgb.shape[:2]
            flat = rgb.reshape(-1, 3).astype(np.float64)
            assert r["mean_r"] == flat.mean(axis=0)[0]
            # phash stored on ORIGINAL pixels: equal for lossless only
            if rec["fmt"] == "png":
                assert r["phash_check"]
            else:
                assert not r["phash_check"]  # fake-jpeg is lossy
            thumb = PNG.decode_png(bytes(r["thumb"]))
            assert thumb.shape == (8, 8, 3)


class TestBucketedJoin:
    """bucketBy co-location: identically-bucketed tables join with no
    Exchange in the plan (the repeated-big-join layout at scale)."""

    def test_cobucketed_join_has_no_exchange(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from s2geometry_spark.operators import tile as T
        from s2geometry_spark.sources import points as P
        from s2geometry_spark.sources import sink as SK

        import shutil

        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")
        # a fresh per-session metastore orphans managed-table dirs from
        # previous runs; clear the locations so saveAsTable can create
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir"
        ).removeprefix("file:")
        for t in ("t_bleft", "t_bright"):
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        pts = T.assign_cellids(
            P.with_xyz(orders.select(F.col("o_orderkey").alias("key")))
        ).select("key", "cell_id")
        SK.write_bucketed(pts, "t_bleft", "key", n_buckets=8)
        SK.write_bucketed(
            pts.withColumn("extra", F.col("key") % 7),
            "t_bright", "key", n_buckets=8,
        )
        # small sf inputs fit under the broadcast threshold, which would
        # hide the co-location; disable broadcast so the plan shows the
        # bucket-aligned SortMergeJoin a big-big join would use
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            joined = SK.cobucketed_join(spark, "t_bleft", "t_bright", "key")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle
            n = joined.count()
            assert n == pts.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    def test_unbucketed_join_needs_exchange(self, spark, sf_dir):
        """Control: the same join on raw parquet shuffles both sides."""
        from pyspark.sql import functions as F

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("key")
        )
        with_extra = orders.withColumn("extra", F.col("key") % 7)
        joined = orders.join(with_extra.hint("merge"), on="key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
