"""Stream-static near-duplicate detection: continuously-arriving
documents checked against a static corpus's LSH band index.

The production shape for training-data ingestion at 100 TB: the
corpus's slim (doc_id, band, key) rows are a precomputed broadcast
index (or a bucketed table at larger corpus sizes); each micro-batch
computes the SAME band rows for its incoming documents (shared plan
fragment ``textops.doc_band_rows``), equi-joins on (band, key), and
verifies candidates with exact shingle Jaccard — so the stream never
shuffles, every batch does O(batch x matching-buckets) work, and the
output is append-mode (no unbounded state).

Batch twin ``batch_near_dup_matches`` replays the same plan over the
whole directory; trigger=availableNow equality is asserted in
tests/test_dedup_stream.py (the replayability property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops as TX

NEAR_DUP_TAU = 0.5


def static_band_index(static_docs: DataFrame) -> DataFrame:
    """Precompute the corpus side once: slim (sid, b, bk) band rows."""
    return (
        TX.doc_band_rows(static_docs)
        .select(F.col("doc_id").alias("sid"), "b", "bk")
    )


def static_shingles(static_docs: DataFrame) -> DataFrame:
    return TX.doc_shingles(static_docs).select(
        F.col("doc_id").alias("sid"), F.col("shingles").alias("sh_s")
    )


def _matches(
    docs: DataFrame,
    band_index: DataFrame,
    shingle_index: DataFrame,
    tau: float,
) -> DataFrame:
    """Shared stream/batch plan: band rows -> (b, bk) equi-join against
    the static index -> exact Jaccard refine."""
    bands = TX.doc_band_rows(docs)
    cand = (
        bands.join(F.broadcast(band_index), ["b", "bk"])
        .where(F.col("doc_id") != F.col("sid"))
        .select("doc_id", "sid")
    )
    sh_new = TX.doc_shingles(docs).select("doc_id", "shingles")
    pairs = cand.join(sh_new, on="doc_id").join(
        F.broadcast(shingle_index), on="sid"
    )
    inter = F.size(
        F.array_intersect(F.col("shingles"), F.col("sh_s"))
    ).cast("double")
    union = F.size(
        F.array_union(F.col("shingles"), F.col("sh_s"))
    ).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= F.lit(tau))
        .select("doc_id", F.col("sid").alias("dup_of"), "jaccard")
    )


def streaming_near_dup_matches(
    spark: SparkSession,
    docs_path: str,
    static_docs: DataFrame,
    tau: float = NEAR_DUP_TAU,
) -> DataFrame:
    """Streaming DataFrame of (doc_id, dup_of, jaccard) matches of
    incoming documents against the static corpus (append mode — an
    inner stream-static join keeps no state)."""
    schema = spark.read.parquet(docs_path).schema
    stream = spark.readStream.schema(schema).parquet(docs_path)
    bidx = static_band_index(static_docs).localCheckpoint()
    sidx = static_shingles(static_docs).localCheckpoint()
    return _matches(
        stream.select("doc_id", "text"), bidx, sidx, tau
    )


def batch_near_dup_matches(
    spark: SparkSession,
    docs_path: str,
    static_docs: DataFrame,
    tau: float = NEAR_DUP_TAU,
) -> DataFrame:
    """Batch replay twin of streaming_near_dup_matches."""
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    return _matches(
        docs,
        static_band_index(static_docs),
        static_shingles(static_docs),
        tau,
    )
