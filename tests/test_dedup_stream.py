"""Stream-static near-dup detection: availableNow drain must equal
the batch replay twin, planted near-duplicates of corpus docs must be
flagged, and novel docs must pass clean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.streaming import dedup_stream as DS


@pytest.fixture(scope="module")
def static_docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )


@pytest.fixture(scope="module")
def incoming_dir(spark, static_docs, tmp_path_factory):
    d = tmp_path_factory.mktemp("incoming_docs")
    # 20 near-duplicates of corpus docs (tiny suffix keeps Jaccard
    # high) + 20 novel docs that share no shingles with the corpus
    dups = (
        static_docs.orderBy("doc_id")
        .limit(20)
        .select(
            (F.col("doc_id") + F.lit(5_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    novel = spark.range(20).select(
        (F.col("id") + F.lit(6_000_000)).alias("doc_id"),
        F.concat(
            F.lit("QQXXQQ"),
            F.col("id").cast("string"),
            F.lit("ZZYYZZWWVV"),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    )
    dups.unionByName(novel).coalesce(1).write.parquet(str(d / "docs"))
    return str(d / "docs")


def _drain_append(df, name, ck):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def _rows(df):
    return sorted(
        (r["doc_id"], r["dup_of"], round(r["jaccard"], 12))
        for r in df.collect()
    )


class TestDedupStream:
    def test_stream_equals_batch_and_flags_planted_dups(
        self, spark, incoming_dir, static_docs, tmp_path
    ):
        stream_df = DS.streaming_near_dup_matches(
            spark, incoming_dir, static_docs
        )
        _drain_append(stream_df, "dedup_stream", str(tmp_path / "ck"))
        got = _rows(spark.sql("SELECT * FROM dedup_stream"))
        want = _rows(
            DS.batch_near_dup_matches(spark, incoming_dir, static_docs)
        )
        assert got == want
        flagged = {doc_id for doc_id, _, _ in got}
        dup_ids = {
            r["doc_id"] + 5_000_000
            for r in static_docs.orderBy("doc_id").limit(20).collect()
        }
        # every planted near-duplicate is caught, pointing at its source
        assert dup_ids <= flagged
        matched_sources = {
            dup_of for doc_id, dup_of, _ in got if doc_id in dup_ids
        }
        assert matched_sources  # sources are real corpus ids
        # novel docs never flagged
        assert all(doc_id < 6_000_000 for doc_id in flagged)

    def test_incremental_batches_keep_no_state(
        self, spark, incoming_dir, static_docs, tmp_path
    ):
        # drain to a file sink, then resume from the same checkpoint
        # with no new input: the stateless append join emits nothing
        # new (no double-processing on resume)
        ck = str(tmp_path / "ck2")
        out = str(tmp_path / "out")

        def drain():
            q = (
                DS.streaming_near_dup_matches(
                    spark, incoming_dir, static_docs
                )
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        first = _rows(spark.read.parquet(out))
        drain()
        second = _rows(spark.read.parquet(out))
        assert len(first) > 0
        assert second == first  # resume added nothing
