"""Spatially-clustered parquet sink.

The write layout that makes tile-range scans cheap at 100 TB
(SURVEY.md §2.1 result-sink row, §2.6 Hilbert-order iteration):

- partition directories by a coarse bucket of the tile id (bounded
  partition count; Iceberg's `bucket(tile_id)` analogue in plain
  parquet),
- rows within each file sorted by the *biased* cell id — unsigned
  Hilbert order — so range predicates map to contiguous row-group
  ranges and parquet min/max stats prune aggressively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sparkfns as S


def write_clustered(
    df: DataFrame,
    path: str,
    cell_col: str = "cell_id",
    n_buckets: int = 16,
    mode: str = "overwrite",
    tile_level: int = 5,
) -> None:
    """Write df partitioned by tile bucket, Hilbert-sorted within
    partitions.

    The bucket hashes the level-``tile_level`` ANCESTOR of the cell id
    — the tile — not the leaf id: hashing leaves would smear every
    tile's rows across all ``n_buckets`` directories, so a tile scan
    could never prune a directory (the whole point of the
    ``bucket(tile_id)`` layout)."""
    out = df.withColumn(
        "tile_bucket",
        F.pmod(
            F.hash(S.cell_parent(F.col(cell_col), tile_level)),
            F.lit(n_buckets),
        ),
    )
    # sort by (bucket, biased id): the dynamic-partition writer requires
    # an ordering on the partition column and would otherwise insert its
    # own (unstable) sort, destroying the Hilbert order within files.
    (
        out.repartition(n_buckets, "tile_bucket")
        .sortWithinPartitions(
            F.col("tile_bucket"), S.cell_bias(F.col(cell_col))
        )
        .write.mode(mode)
        .partitionBy("tile_bucket")
        .parquet(path)
    )


def read_clustered(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_clustered_snapshot(
    df: DataFrame,
    table_dir: str,
    cell_col: str = "cell_id",
    n_buckets: int = 16,
    mode: str = "append",
) -> int:
    """The clustered layout committed through the snapshot protocol
    (sources.snapshots): RANGE-partitioned on the Hilbert-biased key
    and sorted within each file (deliberately NOT ``write_clustered``'s
    hash buckets — see the comment below), with files landing in an
    isolated staging dir that becomes visible only at the atomic
    manifest commit — plus
    the manifest records per-file min/max of the biased key, so
    ``snapshots.scan_stats_range`` prunes whole files from manifest
    bytes before Spark lists anything.  Returns the committed
    version."""
    from . import snapshots as SN

    # RANGE partition on the biased key (not hash buckets): each file
    # then covers a disjoint contiguous Hilbert range, so the recorded
    # min/max are tight and a range scan keeps ~(range/total) of the
    # files; hash bucketing would smear every range across all files
    # and make the manifest stats useless
    out = df.withColumn(
        "cell_biased", S.cell_bias(F.col(cell_col))
    ).repartitionByRange(n_buckets, "cell_biased")
    return SN.write_snapshot(
        out, table_dir, mode=mode,
        stats_col="cell_biased", sort_col="cell_biased",
    )


def scan_cell_range(
    spark: SparkSession, path: str, lo_biased: int, hi_biased: int,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Range scan on the biased (unsigned Hilbert) order, pushed to
    parquet row-group stats.

    Pushdown requires plain attribute comparisons: a predicate on the
    computed ``cell_id XOR bias`` expression is not translatable to a
    data-source filter (PushedFilters stays empty and every row group
    is read).  The bias is just a sign-bit flip, so the biased window
    maps back to at most TWO raw signed cell-id ranges — one
    non-negative, one negative — and the filter runs on the raw
    column, which parquet min/max stats prune."""
    df = spark.read.parquet(path)
    if lo_biased > hi_biased:
        return df.where(F.lit(False))
    flip, two64 = 1 << 63, 1 << 64
    ulo = (int(lo_biased) % two64) ^ flip  # biased signed -> raw unsigned
    uhi = (int(hi_biased) % two64) ^ flip
    col = F.col(cell_col)

    def signed_range(a_u: int, b_u: int):
        a = a_u - two64 if a_u >= flip else a_u
        b = b_u - two64 if b_u >= flip else b_u
        return (col >= F.lit(a)) & (col <= F.lit(b))

    if uhi < flip or ulo >= flip:
        cond = signed_range(ulo, uhi)
    else:
        # window straddles the sign boundary of the raw encoding
        cond = signed_range(ulo, flip - 1) | signed_range(flip, uhi)
    return df.where(cond)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (Spark bucketBy + sortBy on the join
    key): two tables bucketed the same way join WITHOUT a shuffle —
    each task zips bucket i with bucket i.  This is the co-located
    join layout for repeated big-big joins at the 100 TB tier, where
    re-shuffling the fact table per query is the dominant cost."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.  The
    plan must contain no Exchange on either side (asserted in
    tests/test_sink_features.py) — bucket-pruned SortMergeJoin."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=key, how=how)
