"""Scale-safe global sliding windows (``lead`` over a total key order).

Several gated fixtures pair each sampled row with its next 1..n rows in
global key order.  The naive spelling — ``F.lead(c, j).over(
Window.orderBy(key))`` — makes Spark move the WHOLE table onto a single
reducer (``WindowExec: No Partition Defined for Window operation``),
which is the canonical does-not-survive-100x plan.  This helper computes
bit-identical lead values with bounded per-reducer work:

1. range-partition the rows by ``key`` (Spark samples the boundaries,
   so partitions are balanced and key-contiguous);
2. compute every lead inside each range partition — correct everywhere
   except the last ``max_lead`` rows of each partition, where the
   within-partition lead is NULL;
3. repair those boundary rows from a *slim* table holding only the
   first and last ``max_lead`` rows of every partition.  The slim table
   has O(num_partitions * max_lead) rows — independent of rows per
   partition — and preserves true global adjacency exactly where the
   repair is consulted: the j-th successor of a partition-tail row is
   either a later tail row of the same partition or a head row of one
   of the following partitions (a partition smaller than ``max_lead``
   contributes ALL its rows to both its head and its tail, so successor
   chains that span several partitions stay intact).  Only rows in a
   partition tail (``rn > cnt - j``) consult the repair, so the middle
   rows the slim table skips can never corrupt a result.

The repair itself does use an unpartitioned window, but over the slim
table only: its size is bounded by the partition count, not the data
volume, so the single-reducer sort stays O(P * max_lead) at any scale.

Requires ``key`` values to be globally unique (the repair is joined
back by key); the fixture keys here are primary keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gl_pid"
_RN = "__gl_rn"
_CNT = "__gl_cnt"


def lead_col(col: str, j: int) -> str:
    """Output column name for the j-th lead of ``col``."""
    return f"{col}_lead{j}"


def with_global_leads(
    df: DataFrame,
    key: str,
    cols: Sequence[str],
    max_lead: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``lead_col(c, j)`` for every ``c`` in *cols* and every
    ``j`` in ``1..max_lead``, equal to ``F.lead(c, j)`` over the global
    ``key`` order — without a single-partition sort of *df*.

    ``key`` must be unique per row.  Rows keep all original columns;
    a row's j-th lead is NULL iff fewer than j rows follow it globally
    (same contract as the naive window).
    """
    if max_lead < 1:
        raise ValueError(f"max_lead must be >= 1, got {max_lead}")
    cols = list(cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )

    ranged = df.repartitionByRange(num_partitions, F.col(key)).withColumn(
        _PID, F.spark_partition_id()
    )
    w = Window.partitionBy(_PID).orderBy(key)
    wp = Window.partitionBy(_PID)

    base = ranged.withColumn(_RN, F.row_number().over(w)).withColumn(
        _CNT, F.count(F.lit(1)).over(wp)
    )
    for c in cols:
        for j in range(1, max_lead + 1):
            base = base.withColumn(lead_col(c, j), F.lead(c, j).over(w))

    # Slim boundary table: first and last max_lead rows of each range
    # partition, in global key order.  O(P * max_lead) rows.
    slim = base.where(
        (F.col(_RN) <= max_lead) | (F.col(_RN) > F.col(_CNT) - max_lead)
    ).select(key, *cols)
    ws = Window.orderBy(key)  # bounded: slim rows only
    fix_cols = [F.col(key)]
    for c in cols:
        for j in range(1, max_lead + 1):
            fix_cols.append(
                F.lead(c, j).over(ws).alias(f"__gl_fix_{c}_{j}")
            )
    fixes = slim.select(*fix_cols)

    # Repair exactly the rows whose within-partition lead-j ran off the
    # end of the partition (rn > cnt - j) — never by NULL-coalescing,
    # so legitimately-NULL column values pass through untouched.
    out = base.join(F.broadcast(fixes), on=key, how="left")
    for c in cols:
        for j in range(1, max_lead + 1):
            name = lead_col(c, j)
            out = out.withColumn(
                name,
                F.when(
                    F.col(_RN) > F.col(_CNT) - j,
                    F.col(f"__gl_fix_{c}_{j}"),
                ).otherwise(F.col(name)),
            ).drop(f"__gl_fix_{c}_{j}")
    return out.drop(_PID, _RN, _CNT)
