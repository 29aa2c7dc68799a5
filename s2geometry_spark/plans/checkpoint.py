"""Checkpointed batch stages with per-partition lineage + metrics.

The reference is a single-process library with no durability story; at
10^12-row scale every pipeline stage must be resumable (north_rule).
Design (SURVEY.md §2.10): each stage writes

    <root>/<stage>/data/            parquet output (task-idempotent via
                                    Spark's file commit protocol)
    <root>/<stage>/_lineage/        parquet rows, one per WRITTEN file
        (stage, partition_id, file, rows_out, bytes, wall_ms) — from
        the output footers, so skew in what the stage wrote is visible
    <root>/<stage>/_meta.json       {fingerprint, params, rows, wall_ms}

A stage's fingerprint hashes its name, parameters and every upstream
fingerprint, so a re-run skips any stage whose inputs are unchanged
(reads its parquet back instead) and recomputes everything downstream
of a changed stage.  Mid-stage task failures are covered by Spark's
own idempotent task commit; the lineage table records what each
partition produced for auditing/skew diagnosis.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _written_file_stats(data_dir: str) -> list[dict]:
    """(file, rows_out, bytes) per written parquet file, from footers
    only — includes partition_by subdirectories."""
    import pyarrow.parquet as pq

    entries = []
    for dirpath, _dirs, files in sorted(os.walk(data_dir)):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, f)
            md = pq.ParquetFile(path).metadata
            entries.append(
                {
                    "file": os.path.relpath(path, data_dir),
                    "rows_out": md.num_rows,
                    "bytes": os.path.getsize(path),
                }
            )
    return entries


class StageResult:
    def __init__(self, name: str, df: DataFrame, fingerprint: str, resumed: bool,
                 wall_ms: float, rows: int):
        self.name = name
        self.df = df
        self.fingerprint = fingerprint
        self.resumed = resumed
        self.wall_ms = wall_ms
        self.rows = rows


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str):
        base = os.path.join(self.root, name)
        return base, os.path.join(base, "data"), os.path.join(
            base, "_lineage"
        ), os.path.join(base, "_meta.json")

    @staticmethod
    def fingerprint(name: str, params: dict | None, inputs: tuple) -> str:
        h = hashlib.sha256()
        h.update(name.encode())
        h.update(json.dumps(params or {}, sort_keys=True, default=str).encode())
        for up in inputs:
            h.update(up.fingerprint.encode())
        return h.hexdigest()[:32]

    def stage(
        self,
        name: str,
        fn,
        inputs: tuple = (),
        params: dict | None = None,
        partition_by: str | None = None,
    ) -> StageResult:
        """Run (or resume) a stage.  ``fn(*input_dfs) -> DataFrame``."""
        fp = self.fingerprint(name, params, inputs)
        base, data_dir, lineage_dir, meta_path = self._paths(name)

        if os.path.exists(meta_path):
            try:
                with open(meta_path) as fh:
                    meta = json.load(fh)
            except (json.JSONDecodeError, OSError):
                # defense in depth: the write below is atomic, but a
                # half-written meta from an older layout must mean
                # "recompute", never "crash the resumable pipeline"
                meta = {}
            if meta.get("fingerprint") == fp and os.path.exists(
                os.path.join(data_dir, "_SUCCESS")
            ):
                df = self.spark.read.parquet(data_dir)
                return StageResult(name, df, fp, True, 0.0, meta.get("rows", -1))

        t0 = time.perf_counter()
        out = fn(*[r.df for r in inputs])
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(data_dir)
        wall_ms = (time.perf_counter() - t0) * 1000.0

        # lineage: what each WRITTEN partition (= output file) holds,
        # read from the parquet footers driver-side — O(files) metadata,
        # no second scan of the data, and the granularity actually
        # matches what the stage wrote (re-reading and grouping by
        # spark_partition_id would report Spark's input-size-based read
        # splits, hiding write skew)
        entries = _written_file_stats(data_dir)
        rows = sum(e["rows_out"] for e in entries)
        lineage = self.spark.createDataFrame(
            [
                (name, i, e["file"], e["rows_out"], e["bytes"], wall_ms, fp)
                for i, e in enumerate(entries)
            ],
            "stage STRING, partition_id INT, file STRING, rows_out LONG, "
            "bytes LONG, wall_ms DOUBLE, fingerprint STRING",
        )
        lineage.write.mode("overwrite").parquet(lineage_dir)
        back = self.spark.read.parquet(data_dir)
        # atomic meta commit (write-temp + rename): a crash mid-write
        # must leave "no checkpoint", not truncated JSON that fails
        # every later resume
        tmp = f"{meta_path}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "fingerprint": fp,
                    "params": params or {},
                    "rows": rows,
                    "wall_ms": wall_ms,
                    "inputs": [r.name for r in inputs],
                },
                fh,
            )
        os.rename(tmp, meta_path)
        return StageResult(name, back, fp, False, wall_ms, rows)

    def source(self, name: str, df: DataFrame, version: str = "v1") -> StageResult:
        """Wrap an external input as a pseudo-stage (fingerprint from
        name+version; pass a data hash/snapshot id as `version` to
        invalidate downstream on change)."""
        fp = self.fingerprint(f"source:{name}", {"version": version}, ())
        return StageResult(name, df, fp, True, 0.0, -1)

    def lineage(self, name: str) -> DataFrame:
        _, _, lineage_dir, _ = self._paths(name)
        return self.spark.read.parquet(lineage_dir)
