"""Regression tests for the synthetic-source and sink hardening:
int64-safe point derivation, pushdown-able range scans, tile-coherent
bucketing, and curation-grade tolerance in feature extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.functions import sparkfns as S
from s2geometry_spark.sources import points as P
from s2geometry_spark.sources import regions_src as R
from s2geometry_spark.sources import sink as SK


BIG_KEYS = [0, 1, 2823634015, 10**12, 2**62, 2**63 - 1]


def _py_component(key: int, axis: str) -> float:
    m, p = P.MUL[axis], P.MOD[axis]
    return (key % p * m % p) / (p / 2.0) - 1.0


class TestComponentOverflow:
    """key * MUL overflows int64 past ~2.8e9; the mod-before-multiply
    form must agree bit-exactly across Spark, DuckDB, and Python over
    the full non-negative int64 key domain."""

    def test_spark_matches_python_for_huge_keys(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"key": np.array(BIG_KEYS, dtype=np.int64)})
        )
        rows = {r.key: r for r in P.with_xyz(df).collect()}
        for k in BIG_KEYS:
            for axis, col in (("x", "x"), ("y", "y"), ("z", "z")):
                assert rows[k][col] == _py_component(k, axis), (k, axis)

    def test_duckdb_matches_python_for_huge_keys(self):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"({k})" for k in BIG_KEYS)
            + ") v(key)"
        )
        sql = (
            f"SELECT key, {P.component_sql('key', 'x')} AS x, "
            f"{P.component_sql('key', 'y')} AS y, "
            f"{P.component_sql('key', 'z')} AS z FROM t"
        )
        for row in con.execute(sql).fetchall():
            k = row[0]
            assert row[1] == _py_component(k, "x")
            assert row[2] == _py_component(k, "y")
            assert row[3] == _py_component(k, "z")

    def test_small_key_values_unchanged(self):
        # the reassociated form is the SAME residue — historical
        # fixture values for in-range keys must not move
        for k in (0, 1, 7, 12345, 999983):
            for axis in "xyz":
                m, p = P.MUL[axis], P.MOD[axis]
                assert _py_component(k, axis) == (k * m % p) / (p / 2.0) - 1.0

    def test_negative_region_key_rejected(self):
        with pytest.raises(ValueError, match="non-negative"):
            R.cap_params(-5)


class TestSinkLayout:
    def test_range_scan_pushes_down_and_matches(self, spark, tmp_path):
        from s2geometry_spark.operators import tile as TI

        df = TI.assign_cellids(
            P.with_xyz(spark.range(4000).select(F.col("id").alias("key")))
        ).select("key", "cell_id")
        path = str(tmp_path / "clust")
        SK.write_clustered(df, path, n_buckets=4)
        back = SK.read_clustered(spark, path)
        vals = sorted(
            r[0]
            for r in back.select(
                S.cell_bias(F.col("cell_id")).alias("b")
            ).collect()
        )
        lo, hi = vals[len(vals) // 4], vals[3 * len(vals) // 4]
        scan = SK.scan_cell_range(spark, path, lo, hi)
        want = back.where(
            (S.cell_bias(F.col("cell_id")) >= lo)
            & (S.cell_bias(F.col("cell_id")) <= hi)
        ).count()
        assert scan.count() == want and want > 0
        # the filter must reach the parquet scan as pushed filters on
        # the RAW column (the old XOR-expression predicate produced an
        # empty PushedFilters and read every row group)
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        assert "cell_id" in pushed and pushed.strip() != ""

    def test_range_scan_straddling_sign_boundary(self, spark, tmp_path):
        # raw ids on both sides of the int64 sign boundary (faces 0-2
        # positive, 3-5 negative); a biased window spanning the flip
        # must union two raw ranges and lose no rows
        ids = np.array(
            [(f << 61) | (1 << 20) for f in range(6)], dtype=np.uint64
        ).view(np.int64)
        df = spark.createDataFrame(
            pd.DataFrame({"key": np.arange(6), "cell_id": ids})
        )
        path = str(tmp_path / "signs")
        SK.write_clustered(df, path, n_buckets=2)
        biased = sorted(int(i) ^ -(2**63) for i in ids.tolist())
        got = SK.scan_cell_range(
            spark, path, biased[0], biased[-1]
        ).count()
        assert got == 6

    def test_bucket_is_tile_coherent(self, spark, tmp_path):
        from s2geometry_spark.operators import tile as TI

        df = TI.assign_cellids(
            P.with_xyz(spark.range(2000).select(F.col("id").alias("key")))
        ).select("key", "cell_id")
        path = str(tmp_path / "coherent")
        SK.write_clustered(df, path, n_buckets=4, tile_level=5)
        back = SK.read_clustered(spark, path).withColumn(
            "tile", S.cell_parent(F.col("cell_id"), 5)
        )
        n_violations = (
            back.groupBy("tile")
            .agg(F.countDistinct("tile_bucket").alias("nb"))
            .where(F.col("nb") > 1)
            .count()
        )
        assert n_violations == 0  # every tile lives in exactly one dir


class TestFeatureTolerance:
    def test_strict_false_survives_degenerate_rows(self, spark):
        from s2geometry_spark.kernels import png as PNG
        from s2geometry_spark.operators import image_features as IF

        good = PNG.encode_png(np.full((4, 4, 3), 9, dtype=np.uint8))
        zero_px = PNG.encode_png(np.zeros((0, 4, 3), dtype=np.uint8))
        rows = [
            ("ok", bytearray(good), "png", PNG.phash64(
                PNG.decode_png(good).tobytes())),
            ("zpx", bytearray(zero_px), "png", 0),     # zero pixels
            ("nph", bytearray(good), "png", None),     # null phash
            ("bad", bytearray(b"notanimage"), "png", 0),
        ]
        df = spark.createDataFrame(
            rows, "image_id string, bytes binary, fmt string, phash long"
        )
        got = {
            r.image_id: r for r in IF.extract_features(df, strict=False).collect()
        }
        assert got["ok"].ok and got["ok"].phash_check
        assert not got["zpx"].ok
        assert not got["nph"].ok
        assert not got["bad"].ok

    def test_strict_true_still_raises(self, spark):
        from s2geometry_spark.operators import image_features as IF

        df = spark.createDataFrame(
            [("bad", bytearray(b"junk"), "png", 0)],
            "image_id string, bytes binary, fmt string, phash long",
        )
        with pytest.raises(Exception):
            IF.extract_features(df, strict=True).collect()
