"""The image-curation pipeline must drop planted exact phash
duplicates, near-duplicates (<= max_hamming bits apart), degenerate
captions, and tiny images; report stored-phash mismatches; and resume
stage-for-stage."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


def _run(images_path: str, root: str) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            "jobs/curate_images.py",
            "--images-path",
            images_path,
            "--checkpoint-root",
            root,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stderr[-3000:]
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    import numpy as np
    from pyspark.sql import functions as F

    from s2geometry_spark.kernels import png as PNG
    from s2geometry_spark.sources import images as IMG

    base = IMG.image_table(spark, 150)
    # 10 exact duplicates: same bytes + phash, new id
    exact = (
        base.orderBy("image_id")
        .limit(10)
        .select(
            F.concat(F.lit("zdup_"), F.col("image_id")).alias("image_id"),
            "bytes", "w", "h", "fmt", "caption", "phash", "lat", "lon",
        )
    )
    # 10 near duplicates: same bytes, stored phash perturbed by 2 bits
    # (stale/re-ingested perceptual hash); also counted as mismatches
    near = (
        base.orderBy("image_id")
        .limit(10)
        .select(
            F.concat(F.lit("znear_"), F.col("image_id")).alias("image_id"),
            "bytes", "w", "h", "fmt", "caption",
            F.col("phash").bitwiseXOR(F.lit(3)).alias("phash"),
            "lat", "lon",
        )
    )
    # 5 degenerate captions
    badcap = (
        base.orderBy(F.desc("image_id"))
        .limit(5)
        .select(
            F.concat(F.lit("zcap_"), F.col("image_id")).alias("image_id"),
            "bytes", "w", "h", "fmt",
            F.lit("x").alias("caption"),
            F.col("phash").bitwiseXOR(F.lit(1 << 40)).alias("phash"),
            "lat", "lon",
        )
    )
    # 5 tiny images (below the 64-pixel floor)
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    tiny_bytes = PNG.encode_png(rgb)
    tiny_hash = PNG.phash64(rgb.tobytes())
    import pandas as pd

    tiny = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "image_id": f"ztiny_{j}",
                    "bytes": tiny_bytes,
                    "w": 4,
                    "h": 4,
                    "fmt": "png",
                    "caption": "a tiny test image caption",
                    "phash": tiny_hash + j + 1,
                    "lat": 0.0,
                    "lon": 0.0,
                }
                for j in range(5)
            ]
        )
    )
    d = tmp_path_factory.mktemp("img_corpus")
    (
        base.unionByName(exact)
        .unionByName(near)
        .unionByName(badcap.select(*base.columns))
        .unionByName(tiny.select(*base.columns))
        .coalesce(2)
        .write.parquet(str(d / "images"))
    )
    return str(d / "images")


def test_image_curation_and_resume(planted_dir, tmp_path):
    root = str(tmp_path / "ck")
    rep = _run(planted_dir, root)
    assert rep["images"]["rows"] == 180
    assert rep["integrity"]["rows"] == 175        # 5 tiny dropped
    assert rep["captions"]["rows"] == 170         # 5 bad captions dropped
    assert rep["dedup_exact"]["rows"] == 160      # 10 exact dups dropped
    assert rep["near_dedup"]["rows"] == 150       # 10 near dups dropped
    # the 10 perturbed-phash rows + 5 badcap rows mismatch their decode
    assert rep["phash_mismatches"] >= 10
    assert rep["kept_fraction"] == round(150 / 180, 4)

    rep2 = _run(planted_dir, root)
    for stage in ("images", "features", "integrity", "captions",
                  "dedup_exact", "near_dedup"):
        assert rep2[stage]["resumed"], stage
        assert rep2[stage]["rows"] == rep[stage]["rows"], stage
