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

Manifests store data-file paths RELATIVE to the table directory, so a
committed table can be relocated (or written via a relative path from
one cwd and read from another) without invalidating its history.

Semantics (the subset of the Iceberg spec a resumable pipeline needs):

- **Snapshot isolation**: a writer stages parquet under a fresh
  ``data/<token>`` dir; nothing is visible until its manifest lands
  AND the ``_current`` pointer advances over it.  The manifest file is
  created with ``O_CREAT|O_EXCL`` (optimistic concurrency: two racing
  writers can never claim the same version — the loser probes forward
  to the next free slot), then ``_current`` is updated by write-temp +
  ``os.rename`` — atomic on POSIX, so a reader sees the old snapshot
  or the new one, never a partial file list.  **Committed** means "on
  the parent chain of ``_current``": a job that dies mid-write leaves
  either an orphaned staging dir or an orphaned claimed-but-never-
  pointed-to manifest, and both stay invisible (``read_snapshot``
  refuses versions off the committed chain), re-runnable, and
  garbage-collectable.  Concurrent APPENDS each chain from the pointer
  committed at their claim time and the last pointer swap wins
  (Iceberg resolves this with a catalog CAS; here the contract is one
  appender per table, which is what the checkpointed pipelines
  guarantee).
- **Append or overwrite**: an append manifest carries the parent's
  files plus the new ones; overwrite starts a fresh list.  Data files
  are immutable either way.  An append inherits the parent manifest's
  ``stats_col`` unless the caller passes the same one explicitly — a
  CONFLICTING ``stats_col`` raises, because one chain pruned under two
  different columns is unanswerable.
- **Time travel + rollback**: every manifest is kept;
  ``read_snapshot(..., version=n)`` reads any committed version.
  ``rollback`` restores an older version's file list as a NEW commit
  (Iceberg's model) — metadata-only, data untouched — so every
  committed version remains on the ancestor chain of ``_current``
  forever and stays time-travel-readable even after the rollback.
- **Manifest-level pruning**: each manifest entry records per-file row
  count and min/max of a stats column (default: the Hilbert-biased
  cell id the clustered sink sorts by), read once from the parquet
  footers at commit time.  Stats keep their native parquet types
  (int64 stays int, double stays float, string stays string — all
  JSON-round-trippable; types that aren't, e.g. binary, record no
  stats and the file is conservatively kept).  ``scan_stats_range``
  drops whole files on the driver before Spark ever lists them — at
  100 TB that is the difference between planning over a few manifest
  KB and opening 10^5 footers (Iceberg's manifest pruning; the
  reference's S2CellIndex/S2CellUnion range logic plays this role for
  in-memory indexes).

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


def _is_committed(table_dir: str, version: int) -> bool:
    """True iff ``version`` is on the parent chain of ``_current`` —
    i.e. its pointer swap happened (directly or via a later commit).
    Versions grow strictly along the chain, so the walk stops early."""
    v = current_version(table_dir)
    while v is not None:
        if v == version:
            return True
        if v < version:
            return False
        v = read_manifest(table_dir, v).get("parent")
    return False


def _json_stat(v):
    """A stat value safe to put in a manifest: orderable and exactly
    JSON-round-trippable.  Parquet stats that decode to other types
    (binary, date, Decimal, bool) return None — recording a lossy
    coercion (e.g. int(120.9)) would make pruning UNSOUND, silently
    dropping files whose true range still overlaps the scan."""
    if isinstance(v, bool) or not isinstance(v, (int, float, str)):
        return None
    return v


def _file_stats(
    files: list[str], stats_col: str | None, table_dir: str
) -> list[dict]:
    """Per-file row counts and min/max of ``stats_col`` from the
    parquet footers — read ONCE at commit time, driver-side (the file
    list of one write job, not the table).  Paths are recorded
    relative to ``table_dir``."""
    import pyarrow.parquet as pq

    out = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        ent: dict = {
            "path": os.path.relpath(path, table_dir),
            "rows": md.num_rows,
        }
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
                lo, hi = _json_stat(lo), _json_stat(hi)
                if lo is not None and hi is not None:
                    ent["stats"] = {stats_col: [lo, hi]}
        out.append(ent)
    return out


def _entry_paths(table_dir: str, m: dict) -> list[str]:
    # join() leaves pre-relative-path (absolute) legacy entries intact
    return [os.path.join(table_dir, e["path"]) for e in m["files"]]


def _commit(
    table_dir: str,
    operation: str,
    entries: list[dict],
    total: int,
    schema_json: dict,
    stats_col: str | None,
    merge_parent: bool,
    extra: dict | None = None,
) -> int:
    """Optimistic commit loop: claim a version with ``O_CREAT|O_EXCL``.
    A racing writer that claimed the slot first forces a retry at the
    NEXT FREE version (probing forward — the pointer may lag behind
    claimed manifests if the winner hasn't swapped it yet, so
    re-reading current_version alone could spin on the same slot
    forever); the append parent stays the last COMMITTED pointer.
    Ends with the atomic pointer swap: readers see the old or the new
    version, never a torn state."""
    attempt = 0
    while True:
        parent = current_version(table_dir)
        version = (1 if parent is None else parent + 1) + attempt
        files = list(entries)
        tot = total
        if merge_parent and parent is not None:
            pm = read_manifest(table_dir, parent)
            pcol = pm.get("stats_col")
            if pcol is not None and stats_col is not None and pcol != stats_col:
                raise ValueError(
                    f"append with stats_col={stats_col!r} onto a chain "
                    f"pruned by {pcol!r} (v{parent}): one table cannot "
                    "be range-pruned under two different columns"
                )
            files = pm["files"] + files
            tot += pm["total_rows"]
        manifest = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "committed_at": time.time(),
            "schema": schema_json,
            "stats_col": stats_col,
            "total_rows": tot,
            "files": files,
        }
        if extra:
            manifest.update(extra)
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

    tmp = os.path.join(table_dir, f"{_CURRENT}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.rename(tmp, os.path.join(table_dir, _CURRENT))
    return version


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
    manifest (enables ``scan_stats_range`` file pruning).  An append
    onto a stats-carrying chain inherits the parent's column when this
    is None, and refuses a different one.
    ``sort_col``: sortWithinPartitions by this column before writing,
    so the recorded min/max ranges are tight (the clustered-sink
    Hilbert order; without a sort every file spans the full range and
    pruning is useless)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(os.path.join(table_dir, _SNAPDIR), exist_ok=True)

    # resolve the chain's stats column BEFORE reading footers, so
    # appended files record stats under the SAME key the manifest
    # declares (inherited entries under a different key would make
    # every later range scan KeyError or silently lose pruning)
    if mode == "append":
        parent0 = current_version(table_dir)
        if parent0 is not None:
            pcol = read_manifest(table_dir, parent0).get("stats_col")
            if stats_col is None:
                stats_col = pcol
            elif pcol is not None and pcol != stats_col:
                raise ValueError(
                    f"append with stats_col={stats_col!r} onto a chain "
                    f"pruned by {pcol!r} (v{parent0}): one table cannot "
                    "be range-pruned under two different columns"
                )

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
    entries = _file_stats(new_files, stats_col, table_dir)
    total = sum(e["rows"] for e in entries)
    return _commit(
        table_dir,
        mode,
        entries,
        total,
        df.schema.jsonValue(),
        stats_col,
        merge_parent=(mode == "append"),
    )


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table as of ``version`` (default: current).  Reads exactly
    the manifest's file list — uncommitted staging dirs and orphaned
    claimed-but-never-committed manifests are invisible."""
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    elif not _is_committed(table_dir, version):
        raise ValueError(
            f"version {version} of {table_dir} was never committed "
            "(claimed manifest without a pointer swap, or unknown)"
        )
    m = read_manifest(table_dir, version)
    paths = _entry_paths(table_dir, m)
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], schema=StructType.fromJson(m["schema"])
        )
    return spark.read.parquet(*paths)


def rollback(table_dir: str, version: int) -> int:
    """Restore an older committed version's state as a NEW commit
    (Iceberg's rollback model): metadata-only — data files are
    immutable and shared — and atomic via the same pointer swap.
    Because the restore is itself a commit parented on the current
    pointer, EVERY committed version stays on the ancestor chain of
    ``_current``, so time travel to versions newer than the rollback
    target keeps working.  Returns the new version."""
    if not _is_committed(table_dir, version):
        raise ValueError(
            f"cannot roll back {table_dir} to v{version}: not a "
            "committed version"
        )
    m = read_manifest(table_dir, version)
    return _commit(
        table_dir,
        "rollback",
        m["files"],
        m["total_rows"],
        m["schema"],
        m.get("stats_col"),
        merge_parent=False,
        extra={"rollback_of": version},
    )


def _keep_entry(e: dict, col: str, lo, hi) -> bool:
    """The manifest prune predicate, shared by the scan and the
    observability hook so the two cannot drift: keep a file unless its
    recorded [min, max] provably misses [lo, hi].  Entries with no
    recorded range under ``col`` (unstatable type, or files inherited
    from a pre-stats parent) are kept — pruning must stay sound."""
    if "stats" not in e or col not in e["stats"]:
        return True
    s_lo, s_hi = e["stats"][col]
    return not (s_hi < lo or s_lo > hi)


def _pruning_manifest(table_dir: str, version: int | None) -> dict:
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    m = read_manifest(table_dir, version)
    if m.get("stats_col") is None:
        raise ValueError(
            f"snapshot v{version} of {table_dir} has no stats_col; "
            "write with stats_col= to enable manifest pruning"
        )
    return m


def scan_stats_range(
    spark: SparkSession,
    table_dir: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Range scan with MANIFEST-LEVEL file pruning: files whose
    recorded [min, max] of the manifest's ``stats_col`` misses
    [lo, hi] are dropped on the driver from manifest bytes alone; the
    surviving files still get the row-group predicate pushdown."""
    m = _pruning_manifest(table_dir, version)
    col = m["stats_col"]
    keep = [
        os.path.join(table_dir, e["path"])
        for e in m["files"]
        if _keep_entry(e, col, lo, hi)
    ]
    if not keep:
        from pyspark.sql.types import StructType

        return (
            spark.createDataFrame([], schema=StructType.fromJson(m["schema"]))
            .where(F.lit(False))
        )
    return (
        spark.read.parquet(*keep)
        .where((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    )


def pruned_file_count(
    table_dir: str, lo, hi, version: int | None = None
) -> tuple[int, int]:
    """(files kept, files total) for a stats range — the observability
    hook tests and jobs use to prove pruning engaged.  Raises exactly
    like ``scan_stats_range`` on an uncommitted table or a chain with
    no stats_col."""
    m = _pruning_manifest(table_dir, version)
    col = m["stats_col"]
    keep = sum(1 for e in m["files"] if _keep_entry(e, col, lo, hi))
    return keep, len(m["files"])
