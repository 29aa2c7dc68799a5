"""spark-submit entry: end-to-end training-data curation over the
documents table — the composition a 100 TB corpus pipeline runs:

    profile      one wide row per doc (token/quality stats, lang id,
                 fingerprints, simhash) — one pass over the text
    filter       keep docs passing language + quality thresholds
                 (stopword ratio, distinct-token ratio, length window)
    dedup_exact  drop exact duplicates, keeping the smallest doc_id
                 of each md5 group
    near_dup     MinHash-LSH banded candidates + exact-Jaccard refine;
                 drop the larger id of each matched pair (canonical
                 survivor = smallest id in the dup cluster's pair
                 chain)
    clean        the surviving corpus + a metrics report

Every stage writes parquet + per-partition lineage through
CheckpointedPipeline and is skipped on re-run when its fingerprint is
unchanged (resume mid-pipeline).  Scale notes: profile is ONE
projection over the text (zero joins); the filters are JVM predicates
pushed to the scan on re-read; the keep/drop-list joins are left to
AQE (the lists are corpus-proportional — most docs survive each stage
— so force-broadcasting them would hit the broadcast limit at scale).

    spark-submit --py-files $(python -c 'from s2geometry_spark.plans.session import package_zip; print(package_zip())') \
        jobs/curate_corpus.py --sf-dir /root/testdata/sf0.1 \
        --checkpoint-root /tmp/s2_curate
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _source_version(path: str) -> str:
    """Content-version fingerprint of a parquet file or directory
    (per-file name+mtime+size) — threaded into pipe.source so an
    in-place regeneration of the input invalidates downstream
    checkpoints."""
    if os.path.isdir(path):
        parts = []
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            parts.append(f"{f}:{st.st_mtime_ns}:{st.st_size}")
        return "|".join(parts)
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def _parquet_rows(path: str) -> int:
    """Row count from footers only (file or Spark output directory)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--checkpoint-root", default="/tmp/s2_curate")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--min-stop-ratio", type=float, default=0.0)
    ap.add_argument("--min-distinct-ratio", type=float, default=0.05)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if here not in sys.path:
        sys.path.insert(0, here)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from s2geometry_spark.plans.session import build_session

        spark = build_session(app_name="s2_curate")

    from s2geometry_spark.operators import textops as TX
    from s2geometry_spark.sources.read import spread_scan
    from s2geometry_spark.plans.checkpoint import CheckpointedPipeline

    pipe = CheckpointedPipeline(spark, args.checkpoint_root)

    # source() — NOT a copying stage: its fingerprint carries a data
    # version (per-file mtime+size), so regenerating documents.parquet
    # in place invalidates every downstream checkpoint instead of
    # silently resuming a stale copy of the old corpus
    src_path = f"{args.sf_dir}/documents.parquet"
    docs = pipe.source(
        "docs",
        spread_scan(spark.read.parquet(src_path), key="doc_id"),
        version=_source_version(src_path),
    )
    n_docs = _parquet_rows(src_path)

    def profile(df):
        return TX.doc_profile(df)

    prof = pipe.stage("profile", profile, inputs=(docs,))

    def quality_filter(df, pr):
        keep = pr.where(
            (F.col("n_tokens") >= args.min_tokens)
            & (F.col("n_tokens") <= args.max_tokens)
            & (F.col("stop_ratio") >= args.min_stop_ratio)
            & (F.col("distinct_ratio") >= args.min_distinct_ratio)
        ).select("doc_id")
        return df.join(keep, "doc_id")

    filtered = pipe.stage(
        "quality_filter",
        quality_filter,
        inputs=(docs, prof),
        params={
            "min_tokens": args.min_tokens,
            "max_tokens": args.max_tokens,
            "min_stop_ratio": args.min_stop_ratio,
            "min_distinct_ratio": args.min_distinct_ratio,
        },
    )

    def dedup_exact(df):
        keep = TX.dedup_exact(df).select(
            F.col("keep_id").alias("doc_id")
        )
        return df.join(keep, "doc_id")

    exact = pipe.stage("dedup_exact", dedup_exact, inputs=(filtered,))

    def near_dedup(df):
        # no planted mutants here: curate the corpus as-is (the LSH
        # verify threshold is the operator's exact-Jaccard >= 0.5)
        pairs = TX.near_dup_pairs(df, with_mutants=False)
        # drop the larger id of each flagged pair (id_a < id_b by
        # construction) — chained dups collapse to the smallest id
        drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        return df.join(drops, "doc_id", "left_anti")

    clean = pipe.stage("near_dedup", near_dedup, inputs=(exact,))

    # publish the surviving corpus as an atomically-committed snapshot
    # (sources.snapshots): a consumer reading the published table sees
    # the previous complete version until this run's manifest lands,
    # and each curation run adds a time-travelable version
    from s2geometry_spark.sources import snapshots as SN

    publish_dir = os.path.join(args.checkpoint_root, "published")
    version = SN.write_snapshot(clean.df, publish_dir, mode="overwrite")

    report = {
        "published": {
            "version": version,
            "rows": SN.read_manifest(publish_dir, version)["total_rows"],
        },
        "docs": {"rows": n_docs, "resumed": docs.resumed},
        "profile": {"rows": prof.rows, "resumed": prof.resumed},
        "quality_filter": {
            "rows": filtered.rows,
            "resumed": filtered.resumed,
        },
        "dedup_exact": {"rows": exact.rows, "resumed": exact.resumed},
        "near_dedup": {"rows": clean.rows, "resumed": clean.resumed},
        "kept_fraction": round(clean.rows / max(n_docs, 1), 4),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
