"""Snapshot-committed tables (sources.snapshots): isolation (staged
but uncommitted data is invisible), append lineage, rollback / time
travel, optimistic version claiming, and manifest-level file pruning
over the Hilbert-biased sort key."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from s2geometry_spark.sources import snapshots as SN


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_overwrite_then_append_and_time_travel(spark, tdir):
    v1 = SN.write_snapshot(_df(spark, 0, 100), tdir, mode="overwrite")
    assert v1 == 1
    assert SN.read_snapshot(spark, tdir).count() == 100

    v2 = SN.write_snapshot(_df(spark, 100, 50), tdir, mode="append")
    assert v2 == 2
    assert SN.read_snapshot(spark, tdir).count() == 150
    # time travel: v1 still reads the pre-append state
    assert SN.read_snapshot(spark, tdir, version=1).count() == 100

    v3 = SN.write_snapshot(_df(spark, 0, 7), tdir, mode="overwrite")
    assert SN.read_snapshot(spark, tdir).count() == 7
    m = SN.read_manifest(tdir, v3)
    assert m["parent"] == 2 and m["operation"] == "overwrite"
    assert m["total_rows"] == 7

    # rollback restores v2's file list as a NEW commit (Iceberg's
    # model): metadata-only, and v3 stays on the committed chain so it
    # remains time-travel-readable after the rollback
    v4 = SN.rollback(tdir, 2)
    assert v4 == 4
    assert SN.current_version(tdir) == 4
    assert SN.read_snapshot(spark, tdir).count() == 150
    m4 = SN.read_manifest(tdir, 4)
    assert m4["operation"] == "rollback" and m4["rollback_of"] == 2
    assert SN.read_snapshot(spark, tdir, version=3).count() == 7
    with pytest.raises(ValueError, match="not a committed version"):
        SN.rollback(tdir, 99)


def test_uncommitted_staging_is_invisible(spark, tdir):
    SN.write_snapshot(_df(spark, 0, 10), tdir, mode="overwrite")
    # simulate a writer dying after its data files land but before the
    # manifest commit: files exist under data/, no manifest points at
    # them — readers must not see them
    _df(spark, 1000, 99).write.parquet(
        os.path.join(tdir, "data", "orphan-job")
    )
    assert SN.read_snapshot(spark, tdir).count() == 10
    got = {r["k"] for r in SN.read_snapshot(spark, tdir).collect()}
    assert got == set(range(10))


def test_version_claim_is_exclusive(spark, tdir):
    """A manifest path already claimed by a racing writer forces the
    loser to retry at the next version (commit loop observes the
    winner's files on append)."""
    SN.write_snapshot(_df(spark, 0, 10), tdir, mode="overwrite")
    # squat version 2 the way a concurrent winner would
    with open(SN._version_path(tdir, 2), "w") as fh:
        json.dump(
            {
                "version": 2,
                "parent": 1,
                "operation": "append",
                "schema": {},
                "stats_col": None,
                "total_rows": 0,
                "files": [],
            },
            fh,
        )
    v = SN.write_snapshot(_df(spark, 10, 5), tdir, mode="append")
    assert v == 3  # not 2
    # the loser's append chained onto v1's pointer state (current was
    # still 1 when it committed), so its manifest parents v1
    assert SN.read_manifest(tdir, 3)["parent"] == 1
    assert SN.read_snapshot(spark, tdir, version=3).count() == 15
    # the squatted manifest was never pointed at: it is NOT committed,
    # and time travel refuses to serve it
    with pytest.raises(ValueError, match="never committed"):
        SN.read_snapshot(spark, tdir, version=2)


def test_manifest_pruning_drops_files(spark, tdir):
    """Files sorted+split by key record tight min/max; a narrow range
    scan keeps a strict subset of files and returns exact rows."""
    df = (
        spark.range(0, 4000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(8, "k")
    )
    SN.write_snapshot(
        df, tdir, mode="overwrite", stats_col="k", sort_col="k"
    )
    kept, total = SN.pruned_file_count(tdir, 100, 120)
    assert total >= 8 and kept < total
    got = sorted(
        r["k"] for r in SN.scan_stats_range(spark, tdir, 100, 120).collect()
    )
    assert got == list(range(100, 121))
    # empty range below all data: zero files, empty result
    kept0, _ = SN.pruned_file_count(tdir, -50, -10)
    assert kept0 == 0
    assert SN.scan_stats_range(spark, tdir, -50, -10).count() == 0


def test_stats_range_requires_stats_col(spark, tdir):
    SN.write_snapshot(_df(spark, 0, 10), tdir, mode="overwrite")
    with pytest.raises(ValueError, match="stats_col"):
        SN.scan_stats_range(spark, tdir, 0, 5)


def test_clustered_snapshot_prunes_hilbert_ranges(spark, sf_dir, tdir):
    """write_clustered_snapshot: range-partitioned Hilbert layout ->
    a cell-range scan keeps a strict file subset and returns exactly
    the rows a full-scan filter returns."""
    from pyspark.sql import functions as F2

    from s2geometry_spark.operators import tile as T
    from s2geometry_spark.sources import points as P
    from s2geometry_spark.sources import sink as SK

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = T.assign_cellids(
        P.with_xyz(orders.select(F2.col("o_orderkey").alias("key")))
    ).select("key", "cell_id")
    v = SK.write_clustered_snapshot(pts, tdir, n_buckets=8)
    assert v == 1

    full = SN.read_snapshot(spark, tdir)
    biased = [r["cell_biased"] for r in full.select("cell_biased").collect()]
    biased.sort()
    lo, hi = biased[len(biased) // 4], biased[len(biased) // 2]
    kept, total = SN.pruned_file_count(tdir, lo, hi)
    assert total == 8 and 0 < kept < total
    got = SN.scan_stats_range(spark, tdir, lo, hi).count()
    want = full.where(
        (F2.col("cell_biased") >= lo) & (F2.col("cell_biased") <= hi)
    ).count()
    assert got == want > 0


def test_float_stats_prune_is_sound(spark, tdir):
    """Fractional min/max must be recorded exactly — an int() coercion
    of 120.9 to 120 would prune the file out of a [120.5, 121] scan
    and silently drop its rows."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 0.1 + 0.9).alias("score")
    ).repartitionByRange(4, "score")
    SN.write_snapshot(
        df, tdir, mode="overwrite", stats_col="score", sort_col="score"
    )
    m = SN.read_manifest(tdir, 1)
    assert all(
        isinstance(b, float)
        for e in m["files"]
        for b in e["stats"]["score"]
    )
    got = sorted(
        r["k"]
        for r in SN.scan_stats_range(spark, tdir, 0.95, 1.25).collect()
    )
    # score = k/10 + 0.9 in [0.95, 1.25] -> k in [0.5, 3.5] -> {1,2,3}
    assert got == [1, 2, 3]
    # negative side: int(-0.05) = 0 would tighten the min past -0.05
    df2 = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 0.1 - 0.95).alias("score")
    )
    t2 = tdir + "_neg"
    SN.write_snapshot(df2, t2, mode="overwrite", stats_col="score")
    assert SN.scan_stats_range(spark, t2, -1.0, -0.9).count() == 1


def test_append_inherits_and_guards_stats_col(spark, tdir):
    """An append onto a stats-carrying chain inherits the parent's
    stats_col (so the new files stay prunable) and refuses a
    conflicting one (one chain cannot be pruned under two columns)."""
    SN.write_snapshot(
        _df(spark, 0, 100), tdir, mode="overwrite",
        stats_col="k", sort_col="k",
    )
    SN.write_snapshot(_df(spark, 100, 100), tdir, mode="append")
    m = SN.read_manifest(tdir, 2)
    assert m["stats_col"] == "k"
    # every entry (inherited + appended) carries stats under 'k'
    assert all("k" in e.get("stats", {}) for e in m["files"])
    got = SN.scan_stats_range(spark, tdir, 150, 160).count()
    assert got == 11
    with pytest.raises(ValueError, match="two different columns"):
        SN.write_snapshot(
            _df(spark, 200, 10), tdir, mode="append", stats_col="v"
        )


def test_manifest_paths_are_relative_and_table_is_relocatable(
    spark, tdir
):
    """Manifests store paths relative to the table dir, so moving the
    committed table (or reading it from a different cwd than it was
    written from) keeps every version readable."""
    SN.write_snapshot(_df(spark, 0, 50), tdir, mode="overwrite")
    SN.write_snapshot(_df(spark, 50, 25), tdir, mode="append")
    for v in (1, 2):
        for e in SN.read_manifest(tdir, v)["files"]:
            assert not os.path.isabs(e["path"]), e["path"]
    moved = tdir + "_moved"
    os.rename(tdir, moved)
    assert SN.read_snapshot(spark, moved).count() == 75
    assert SN.read_snapshot(spark, moved, version=1).count() == 50
