"""Snapshot-committed parquet tables: Iceberg's isolation model on a
plain filesystem (SURVEY.md §2.1 result-sink row; VERDICT r04
"What's missing #4" — the checkpoint tables' resume semantics were
hand-rolled without snapshot isolation).

Layout per table directory::

    <table>/data/<token>/part-*.parquet   immutable data files, one
                                          staging dir per write job
    <table>/snapshots/v<NNNNN>.json       manifest: file list with
                                          per-file row counts + min/max
                                          stats, schema, parent version
    <table>/_current                      pointer file, atomically
                                          renamed into place

Semantics (the subset of the Iceberg spec a resumable pipeline needs):

- **Snapshot isolation**: a writer stages parquet under a fresh
  ``data/<token>`` dir; nothing is visible until its manifest lands.
  The manifest file is created with ``O_CREAT|O_EXCL`` (optimistic
  concurrency: two racing writers can never claim the same version —
  the loser probes forward to the next free slot), then ``_current``
  is updated by write-temp + ``os.rename`` — atomic on POSIX, so a
  reader sees the old snapshot or the new one, never a partial file
  list.  A job that dies mid-write leaves only an orphaned staging
  dir: invisible, re-runnable, garbage-collectable.  Concurrent
  APPENDS each chain from the pointer committed at their claim time
  and the last pointer swap wins (Iceberg resolves this with a
  catalog CAS; here the contract is one appender per table, which is
  what the checkpointed pipelines guarantee).
- **Append or overwrite**: an append manifest carries the parent's
  files plus the new ones; overwrite starts a fresh list.  Data files
  are immutable either way.
- **Time travel + rollback**: every manifest is kept;
  ``read_snapshot(..., version=n)`` reads any committed version and
  ``rollback`` repoints ``_current`` without touching data.
- **Manifest-level pruning**: each manifest entry records per-file row
  count and min/max of a stats column (default: the Hilbert-biased
  cell id the clustered sink sorts by), read once from the parquet
  footers at commit time.  ``scan_stats_range`` drops whole files on
  the driver before Spark ever lists them — at 100 TB that is the
  difference between planning over a few manifest KB and opening 10^5
  footers (Iceberg's manifest pruning; the reference's
  S2CellIndex/S2CellUnion range logic plays this role for in-memory
  indexes).

Lineage/metrics: manifests carry the operation, the parent version,
total rows, and the per-file stats — the per-partition lineage record
the north rule asks the checkpoints to keep.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_current"
_SNAPDIR = "snapshots"
_DATADIR = "data"


def _version_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAPDIR, f"v{version:05d}.json")


def current_version(table_dir: str) -> int | None:
    """Committed current version, or None for an empty/uninitialized
    table (including one with orphaned staging dirs but no commit)."""
    try:
        with open(os.path.join(table_dir, _CURRENT)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def read_manifest(table_dir: str, version: int) -> dict:
    with open(_version_path(table_dir, version)) as fh:
        return json.load(fh)


def _file_stats(files: list[str], stats_col: str | None) -> list[dict]:
    """Per-file row counts and min/max of ``stats_col`` from the
    parquet footers — read ONCE at commit time, driver-side (the file
    list of one write job, not the table)."""
    import pyarrow.parquet as pq

    out = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        ent: dict = {"path": path, "rows": md.num_rows}
        if stats_col is not None:
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if stats_col in idx:
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[stats_col]).statistics
                    if st is None or not st.has_min_max:
                        lo, hi = None, None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    ent["stats"] = {stats_col: [int(lo), int(hi)]}
        out.append(ent)
    return out


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    stats_col: str | None = None,
    sort_col: str | None = None,
) -> int:
    """Commit ``df`` as a new snapshot of ``table_dir``; returns the
    committed version.

    ``stats_col``: record per-file min/max of this column in the
    manifest (enables ``scan_stats_range`` file pruning).
    ``sort_col``: sortWithinPartitions by this column before writing,
    so the recorded min/max ranges are tight (the clustered-sink
    Hilbert order; without a sort every file spans the full range and
    pruning is useless)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(os.path.join(table_dir, _SNAPDIR), exist_ok=True)

    token = uuid.uuid4().hex
    staging = os.path.join(table_dir, _DATADIR, token)
    out = df
    if sort_col is not None:
        out = out.sortWithinPartitions(sort_col)
    out.write.parquet(staging)  # fresh dir per job: no mode needed
    new_files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    entries = _file_stats(new_files, stats_col)

    # optimistic commit loop: claim version with O_CREAT|O_EXCL.  A
    # racing writer that claimed the slot first forces a retry at the
    # NEXT FREE version (probing forward — the pointer may lag behind
    # claimed manifests if the winner hasn't swapped it yet, so
    # re-reading current_version alone could spin on the same slot
    # forever); the append parent stays the last COMMITTED pointer.
    attempt = 0
    while True:
        parent = current_version(table_dir)
        version = (1 if parent is None else parent + 1) + attempt
        files = list(entries)
        total = sum(e["rows"] for e in entries)
        if mode == "append" and parent is not None:
            pm = read_manifest(table_dir, parent)
            files = pm["files"] + files
            total += pm["total_rows"]
        manifest = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "committed_at": time.time(),
            "schema": df.schema.jsonValue(),
            "stats_col": stats_col,
            "total_rows": total,
            "files": files,
        }
        try:
            fd = os.open(
                _version_path(table_dir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            attempt += 1  # slot taken — probe the next free version
            continue
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        break

    # atomic pointer swap: readers see the old or the new version,
    # never a torn state
    tmp = os.path.join(table_dir, f"{_CURRENT}.{token}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.rename(tmp, os.path.join(table_dir, _CURRENT))
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: current).  Reads exactly
    the manifest's file list — uncommitted staging dirs are invisible."""
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    m = read_manifest(table_dir, version)
    paths = [e["path"] for e in m["files"]]
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], schema=StructType.fromJson(m["schema"])
        )
    return spark.read.parquet(*paths)


def rollback(table_dir: str, version: int) -> None:
    """Repoint ``_current`` at an older committed version (data files
    are immutable, so this is metadata-only and atomic)."""
    read_manifest(table_dir, version)  # must exist
    tmp = os.path.join(table_dir, f"{_CURRENT}.rb.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.rename(tmp, os.path.join(table_dir, _CURRENT))


def scan_stats_range(
    spark: SparkSession,
    table_dir: str,
    lo: int,
    hi: int,
    version: int | None = None,
) -> DataFrame:
    """Range scan with MANIFEST-LEVEL file pruning: files whose
    recorded [min, max] of the manifest's ``stats_col`` misses
    [lo, hi] are dropped on the driver from manifest bytes alone; the
    surviving files still get the row-group predicate pushdown."""
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    m = read_manifest(table_dir, version)
    col = m.get("stats_col")
    if col is None:
        raise ValueError(
            f"snapshot v{version} of {table_dir} has no stats_col; "
            "write with stats_col= to enable manifest pruning"
        )
    keep = [
        e["path"]
        for e in m["files"]
        if "stats" not in e  # unknown range: cannot prune safely
        or not (e["stats"][col][1] < lo or e["stats"][col][0] > hi)
    ]
    if not keep:
        return (
            read_snapshot(spark, table_dir, version)
            .where(F.lit(False))
        )
    return (
        spark.read.parquet(*keep)
        .where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )


def pruned_file_count(
    table_dir: str, lo: int, hi: int, version: int | None = None
) -> tuple[int, int]:
    """(files kept, files total) for a stats range — the observability
    hook tests and jobs use to prove pruning engaged."""
    if version is None:
        version = current_version(table_dir)
    m = read_manifest(table_dir, version)
    col = m["stats_col"]
    keep = sum(
        1
        for e in m["files"]
        if "stats" not in e
        or not (e["stats"][col][1] < lo or e["stats"][col][0] > hi)
    )
    return keep, len(m["files"])
