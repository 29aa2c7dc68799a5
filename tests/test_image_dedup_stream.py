"""Stream-static image near-dup (streaming/image_dedup_stream): the
availableNow stream must equal the batch replay row for row, flag every
planted perturbed image, and flag nothing else (random phashes sit ~32
bits apart)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.streaming import image_dedup_stream as IDS

N_STATIC = 150
N_DUPS = 25


@pytest.fixture(scope="module")
def static_imgs(spark):
    from s2geometry_spark.sources import images as IMG

    return (
        IMG.phash_table(spark, N_STATIC)
        .select(
            F.concat(F.lit("img"), F.col("idx")).alias("image_id"), "phash"
        )
        .localCheckpoint()
    )


@pytest.fixture(scope="module")
def incoming_dir(spark, static_imgs, tmp_path_factory):
    d = tmp_path_factory.mktemp("incoming_imgs")
    mask = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(CAST(SUBSTR(image_id, 4) AS BIGINT) % 62 AS INT))"
    )
    dups = static_imgs.limit(N_DUPS).select(
        F.concat(F.lit("new"), F.col("image_id")).alias("image_id"),
        F.col("phash").bitwiseXOR(mask).alias("phash"),
    )
    novel = spark.range(40).select(
        F.concat(F.lit("novel"), F.col("id")).alias("image_id"),
        F.xxhash64(F.col("id").cast("string")).alias("phash"),
    )
    dups.unionByName(novel).coalesce(1).write.parquet(str(d / "imgs"))
    return str(d / "imgs")


def _rows(df):
    return sorted(
        (r["image_id"], r["sid"], r["hamming"]) for r in df.collect()
    )


def test_stream_equals_batch_and_flags_planted_dups(
    spark, static_imgs, incoming_dir, tmp_path
):
    stream_df = IDS.streaming_image_dup_matches(
        spark, incoming_dir, static_imgs
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("img_dups")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _rows(spark.table("img_dups"))
    want = _rows(
        IDS.batch_image_dup_matches(spark, incoming_dir, static_imgs)
    )
    assert got == want
    # every planted dup found against its source, hamming <= 1
    planted = {r[0] for r in got if r[0].startswith("newimg")}
    assert len(planted) == N_DUPS
    for new_id, sid, ham in got:
        if new_id.startswith("newimg"):
            assert ham <= 1
    # nothing novel flagged
    assert not any(r[0].startswith("novel") for r in got)
