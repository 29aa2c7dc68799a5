"""Scale-safe global sliding windows (``lead`` over a total key order).

Several gated fixtures pair each sampled row with its next 1..n rows in
global key order.  The naive spelling — ``F.lead(c, j).over(
Window.orderBy(key))`` — makes Spark move the WHOLE table onto a single
reducer (``WindowExec: No Partition Defined for Window operation``),
which is the canonical does-not-survive-100x plan.  This helper computes
bit-identical lead values with bounded per-reducer work:

1. bucket the rows by a DETERMINISTIC key-contiguous expression —
   ``width_bucket(key, min, max)`` over the key range (one column-pruned
   min/max scan).  Determinism matters: both consumers of the bucketed
   rows canonicalize to the same plan, so Catalyst reuses ONE shuffle
   (``ReusedExchange``) instead of recomputing the upstream per branch
   (``spark_partition_id()`` after ``repartitionByRange`` is the obvious
   alternative but is nondeterministic, which defeats exchange reuse);
2. compute every lead inside each bucket — correct everywhere except
   the last ``max_lead`` rows of each bucket, where the within-bucket
   lead is NULL;
3. repair those boundary rows from a *slim* table holding only the
   first and last ``max_lead`` rows of every bucket.  The slim table
   has O(num_buckets * max_lead) rows — independent of rows per
   bucket — and preserves true global adjacency exactly where the
   repair is consulted: the j-th successor of a bucket-tail row is
   either a later tail row of the same bucket or a head row of one of
   the following buckets (a bucket smaller than ``max_lead``
   contributes ALL its rows to both its head and its tail, and empty
   buckets contribute nothing, so successor chains that span several
   buckets stay intact).  Only rows in a bucket tail (``rn > cnt - j``)
   consult the repair, so the middle rows the slim table skips can
   never corrupt a result.

The repair itself does use an unpartitioned window, but over the slim
table only: its size is bounded by the bucket count, not the data
volume, so the single-reducer sort stays O(buckets * max_lead) at any
scale.

Buckets are uniform in key VALUE, so a heavily skewed key distribution
degrades toward fewer effective reducers — never below the naive
single-reducer plan it replaces.  Keys only need a monotonic cast to
double (order-preserving for every numeric type), and must be globally
unique (the repair is joined back by key); the fixture keys here are
primary keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__gl_bkt"
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

    # One column-pruned scan for the key range; the deterministic
    # bucket expression is what lets Catalyst reuse the bucket shuffle
    # across the fact and slim branches below.
    rng = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
    lo = None if rng["lo"] is None else float(rng["lo"])
    hi = None if rng["hi"] is None else float(rng["hi"])
    if lo is None or not hi > lo:  # empty, single key, or double-collapsed
        bucket = F.lit(1)
    else:
        bucket = F.width_bucket(
            F.col(key).cast("double"),
            F.lit(lo),
            # +one bucket width so the max key lands in the last bucket
            # (width_bucket maps v == upper bound to num_partitions + 1)
            F.lit(hi + (hi - lo) / num_partitions),
            F.lit(num_partitions),
        )
    bucketed = df.withColumn(_BKT, bucket)
    w = Window.partitionBy(_BKT).orderBy(key)
    wb = Window.partitionBy(_BKT)

    base = bucketed.withColumn(_RN, F.row_number().over(w)).withColumn(
        _CNT, F.count(F.lit(1)).over(wb)
    )
    for c in cols:
        for j in range(1, max_lead + 1):
            base = base.withColumn(lead_col(c, j), F.lead(c, j).over(w))

    # Slim boundary table: first and last max_lead rows of each bucket,
    # in global key order.  O(num_partitions * max_lead) rows.
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

    # Repair exactly the rows whose within-bucket lead-j ran off the
    # end of the bucket (rn > cnt - j) — never by NULL-coalescing, so
    # legitimately-NULL column values pass through untouched.
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
    return out.drop(_BKT, _RN, _CNT)
