"""Scan-width guard for small or single-row-group parquet inputs.

Spark sizes file splits as ``min(maxPartitionBytes, max(openCostInBytes,
total_bytes / parallelism))``, and a parquet row group is assigned to
exactly one task (a byte-range split with no row-group midpoint inside
it produces an EMPTY task).  A production-scale table (many files, many
row groups) therefore always scans at least as wide as the session's
parallelism and :func:`spread_scan` is a no-op.  A small local fixture
file, however, often planarizes to ONE non-empty task — and every
downstream per-row kernel (cell-id encode, text profile, image decode)
then runs on one core no matter how many the session has.  Measured at
sf1 (50k docs, 0.9 MB, one row group, local[32]): ``doc_profile``
62 s -> 6.6 s from this guard alone.

The repair is an explicit round-robin repartition whose shuffle moves
exactly the file's bytes — bounded by the very condition that triggers
it (the scan was too small to split), so the guard never adds
meaningful cost at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(
    df: DataFrame,
    key: str | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Repartition *df* to the session's default parallelism when its
    current plan yields fewer partitions — i.e. when the scan cannot
    be split wide enough for the cluster.  No-op (returns *df*
    unchanged, no shuffle) whenever the scan already carries at least
    ``min_parallelism`` splits, which is every production-scale table.

    Pass the table's (near-)unique ``key`` column when known: a hash
    repartition on it balances as well as round-robin but skips the
    per-partition full-row sort that round-robin pays for retry
    determinism (``spark.sql.execution.sortBeforeRepartition``) —
    measured at sf0.1 the hash form is ~neutral on cheap scans where
    the round-robin form regressed them 2x, with the same 4-10x win
    on compute-heavy consumers."""
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        from pyspark.sql import functions as F

        return df.repartition(target, F.col(key))
    return df.repartition(target)
