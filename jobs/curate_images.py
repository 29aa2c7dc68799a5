"""spark-submit entry: end-to-end image+caption curation — the
training-data pipeline for the BASELINE input table
(image_id, bytes, w, h, fmt, caption, phash):

    features     one Arrow decode pass per batch: stats, edge energy,
                 phash_check (decode fingerprint == stored phash)
    integrity    keep decodable images inside a resolution window;
                 stored-phash mismatches are REPORTED (stale ingest
                 metadata) but only undecodable/degenerate rows drop
    captions     token/quality stats over the caption text (same
                 textops kernels as the document pipeline); captions
                 below the token floor drop
    dedup_exact  one survivor (smallest image_id) per exact phash
    near_dedup   banded phash LSH + popcount refine (pigeonhole-
                 lossless for hamming < n_bands); drop the larger id
                 of each matched pair

Stages checkpoint parquet + per-partition lineage and resume by
fingerprint.  Scale notes: the decode pass is embarrassingly parallel
mapInPandas run strict=False (a corrupt payload yields ok=False and is
dropped at integrity instead of failing the task); the keep/drop-list
joins are left to AQE (the lists are corpus-proportional — most rows
survive each stage — so force-broadcasting them would hit the
broadcast limit at scale); the LSH self-join shuffles only slim
(band, val) rows.

    spark-submit --py-files $(python -c 'from s2geometry_spark.plans.session import package_zip; print(package_zip())') \
        jobs/curate_images.py --n-images 100000 --checkpoint-root /tmp/s2_curate_img
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
    ap.add_argument("--n-images", type=int, default=2000)
    ap.add_argument("--images-path", default="",
                    help="parquet dir of image rows; default: the "
                         "deterministic synthetic table of --n-images")
    ap.add_argument("--checkpoint-root", default="/tmp/s2_curate_img")
    ap.add_argument("--min-pixels", type=int, default=64)
    ap.add_argument("--min-caption-tokens", type=int, default=3)
    ap.add_argument("--max-hamming", type=int, default=2)
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

        spark = build_session(app_name="s2_curate_images")

    from s2geometry_spark.operators import image_dedup as ID
    from s2geometry_spark.sources.read import spread_scan
    from s2geometry_spark.operators import image_features as IF
    from s2geometry_spark.operators import textops as TX
    from s2geometry_spark.plans.checkpoint import CheckpointedPipeline
    from s2geometry_spark.sources import images as IMG

    pipe = CheckpointedPipeline(spark, args.checkpoint_root)

    if args.images_path:
        # source(), not a copying stage: the fingerprint carries a
        # data version (per-file mtime+size) so regenerating the input
        # in place invalidates downstream checkpoints instead of
        # silently resuming a stale copy
        imgs = pipe.source(
            "images",
            spread_scan(spark.read.parquet(args.images_path), key="image_id"),
            version=_source_version(args.images_path),
        )
        n_images = _parquet_rows(args.images_path)
    else:
        imgs = pipe.stage(
            "images",
            lambda: IMG.image_table(spark, args.n_images),
            params={"n": args.n_images},
        )
        n_images = imgs.rows

    feats = pipe.stage(
        "features",
        lambda df: IF.extract_features(df, strict=False).select(
            "image_id", "w", "h", "mean_gray", "std_gray",
            "edge_energy", "phash_check", "ok",
        ),
        inputs=(imgs,),
    )

    def integrity(df, ft):
        keep = ft.where(
            F.col("ok") & (F.col("w") * F.col("h") >= args.min_pixels)
        ).select("image_id")
        return df.join(keep, "image_id")

    ok = pipe.stage(
        "integrity",
        integrity,
        inputs=(imgs, feats),
        params={"min_pixels": args.min_pixels},
    )

    def caption_filter(df):
        # image_id rides through token_stats as the opaque doc_id —
        # keying by xxhash64(image_id) risked 64-bit collisions that
        # would duplicate rows through the join, for zero benefit
        caps = df.select(
            F.col("image_id").alias("doc_id"),
            F.col("caption").alias("text"),
        )
        keep = (
            TX.token_stats(caps)
            .where(F.col("n_tokens") >= args.min_caption_tokens)
            .select(F.col("doc_id").alias("image_id"))
        )
        return df.join(keep, "image_id")

    capped = pipe.stage(
        "captions",
        caption_filter,
        inputs=(ok,),
        params={"min_tokens": args.min_caption_tokens},
    )

    def dedup_exact(df):
        keep = (
            df.groupBy("phash")
            .agg(F.min("image_id").alias("image_id"))
            .select("image_id")
        )
        return df.join(keep, "image_id")

    exact = pipe.stage("dedup_exact", dedup_exact, inputs=(capped,))

    def near_dedup(df):
        pairs = ID.phash_near_dup(
            df.select("image_id", "phash"),
            max_hamming=args.max_hamming,
            id_col="image_id",
        )
        drops = pairs.select(F.col("b_id").alias("image_id")).distinct()
        return df.join(drops, "image_id", "left_anti")

    clean = pipe.stage(
        "near_dedup",
        near_dedup,
        inputs=(exact,),
        params={"max_hamming": args.max_hamming},
    )

    n_mismatch = (
        feats.df.where(F.col("ok") & ~F.col("phash_check")).count()
    )
    n_bad = feats.df.where(~F.col("ok")).count()
    report = {
        "images": {"rows": n_images, "resumed": imgs.resumed},
        "features": {"rows": feats.rows, "resumed": feats.resumed},
        "integrity": {"rows": ok.rows, "resumed": ok.resumed},
        "captions": {"rows": capped.rows, "resumed": capped.resumed},
        "dedup_exact": {"rows": exact.rows, "resumed": exact.resumed},
        "near_dedup": {"rows": clean.rows, "resumed": clean.resumed},
        "phash_mismatches": n_mismatch,
        "undecodable": n_bad,
        "kept_fraction": round(clean.rows / max(n_images, 1), 4),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
