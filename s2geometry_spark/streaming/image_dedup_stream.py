"""Stream-static near-duplicate IMAGE detection: continuously-arriving
images checked against a static corpus's perceptual-hash band index.

The multimodal twin of streaming/dedup_stream.py for an image
ingestion pipeline: the corpus side precomputes slim
(sid, band, val, phash) rows from the 64-bit perceptual hashes
(operators.image_dedup banding — lossless by pigeonhole for
Hamming < n_bands); each micro-batch derives the SAME band rows for
its incoming images, equi-joins (band, val) against the broadcast
index, and verifies candidates with the exact popcount.  All JVM bit
arithmetic, stream side never shuffles, append-mode output (no
unbounded state).

Batch twin ``batch_image_dup_matches`` replays the same plan over the
whole directory; trigger=availableNow equality + planted-duplicate
recall are asserted in tests/test_image_dedup_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_HAMMING = 3
N_BANDS = 4


def _band_rows(imgs: DataFrame, id_alias: str) -> DataFrame:
    width = 64 // N_BANDS
    mask = (1 << width) - 1
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("phash"), b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for b in range(N_BANDS)
            ]
        )
    ).alias("bv")
    return imgs.select(
        F.col("image_id").alias(id_alias),
        F.col("phash").alias(f"{id_alias}_hash"),
        bands,
    ).select(id_alias, f"{id_alias}_hash", "bv.band", "bv.val")


def static_phash_index(static_imgs: DataFrame) -> DataFrame:
    """Precompute the corpus side once: slim (sid, band, val, hash)."""
    return _band_rows(static_imgs, "sid")


def _matches(
    imgs: DataFrame, band_index: DataFrame, max_hamming: int
) -> DataFrame:
    bands = _band_rows(imgs, "image_id")
    ham = F.bit_count(
        F.col("image_id_hash").bitwiseXOR(F.col("sid_hash"))
    ).cast("int")
    return (
        bands.join(F.broadcast(band_index), ["band", "val"])
        .where(F.col("image_id") != F.col("sid"))
        .select("image_id", "sid", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["image_id", "sid"])
    )


def streaming_image_dup_matches(
    spark: SparkSession,
    imgs_path: str,
    static_imgs: DataFrame,
    max_hamming: int = MAX_HAMMING,
) -> DataFrame:
    """Streaming DataFrame of (image_id, sid, hamming) matches of
    incoming images against the static corpus (append mode)."""
    schema = spark.read.parquet(imgs_path).schema
    stream = spark.readStream.schema(schema).parquet(imgs_path)
    bidx = static_phash_index(static_imgs).localCheckpoint()
    return _matches(stream.select("image_id", "phash"), bidx, max_hamming)


def batch_image_dup_matches(
    spark: SparkSession,
    imgs_path: str,
    static_imgs: DataFrame,
    max_hamming: int = MAX_HAMMING,
) -> DataFrame:
    """Batch replay twin of streaming_image_dup_matches."""
    imgs = spark.read.parquet(imgs_path).select("image_id", "phash")
    return _matches(imgs, static_phash_index(static_imgs), max_hamming)
