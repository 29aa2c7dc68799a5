"""with_global_leads == the naive single-partition window, at scale-safe
plan shape.

The helper must reproduce ``F.lead(c, j).over(Window.orderBy(key))``
bit-for-bit while keeping the big window partitioned (the naive form
warns "No Partition Defined for Window operation" and funnels the whole
table through one reducer).
"""

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from s2geometry_spark.operators.sliding import lead_col, with_global_leads


def _naive(df, key, cols, max_lead):
    w = Window.orderBy(key)
    for c in cols:
        for j in range(1, max_lead + 1):
            df = df.withColumn(lead_col(c, j), F.lead(c, j).over(w))
    return df


def _rows(df, key, names):
    # collect() renders SQL NULL as None (None == None holds; pandas NaN
    # does not), so tuple equality is exact.
    return sorted(
        tuple(r) for r in df.select(key, *names).collect()
    )


@pytest.mark.parametrize(
    "n_rows,num_partitions,max_lead",
    [
        (100, 8, 1),  # routine: big partitions, single lead
        (100, 8, 4),  # multi-lead across boundaries
        (20, 50, 3),  # partitions smaller than max_lead: chains span
        # several partitions through the slim head/tail table
        (3, 16, 4),  # max_lead > total rows: all leads at the end NULL
        (1, 4, 2),  # single row
    ],
)
def test_matches_naive_window(spark, n_rows, num_partitions, max_lead):
    # Non-contiguous, shuffled unique keys with gaps (like sampled
    # o_orderkey), two payload columns.
    pdf = pd.DataFrame(
        {
            "key": [((i * 7919) % 104729) * 3 + 1 for i in range(n_rows)],
            "a": [float(i) * 0.5 - 7.0 for i in range(n_rows)],
            "b": [(i * 37) % 11 for i in range(n_rows)],
        }
    )
    assert pdf["key"].is_unique
    df = spark.createDataFrame(pdf).repartition(5)

    names = [
        lead_col(c, j)
        for c in ("a", "b")
        for j in range(1, max_lead + 1)
    ]
    got = with_global_leads(
        df, "key", ["a", "b"], max_lead, num_partitions=num_partitions
    )
    want = _naive(df, "key", ["a", "b"], max_lead)
    assert _rows(got, "key", names) == _rows(want, "key", names)


def test_null_values_pass_through(spark):
    # A legitimately-NULL payload value must surface as the lead value,
    # not trigger a (wrong) boundary repair.
    pdf = pd.DataFrame({"key": [1, 2, 3, 4, 5, 6]})
    pdf["a"] = [10.0, None, 30.0, None, 50.0, 60.0]
    df = spark.createDataFrame(pdf)
    got = with_global_leads(df, "key", ["a"], 2, num_partitions=3)
    want = _naive(df, "key", ["a"], 2)
    names = [lead_col("a", 1), lead_col("a", 2)]
    assert _rows(got, "key", names) == _rows(want, "key", names)


def test_plan_has_no_unpartitioned_fact_window(spark):
    """The window over the fact rows is partitioned (by the key-range
    bucket); the only unpartitioned window consumes the slim boundary
    table, bounded by O(partitions * max_lead); and the bucket shuffle
    is computed ONCE and reused by the slim branch (the deterministic
    bucket expression is what makes the two branches canonalize equal)."""
    pdf = pd.DataFrame({"key": list(range(0, 3000, 3))})
    pdf["a"] = pdf["key"] * 1.5
    df = spark.createDataFrame(pdf)
    out = with_global_leads(df, "key", ["a"], 2, num_partitions=16)
    out.collect()  # materialize THIS QueryExecution so AQE finalizes it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # The partitioned fact window carries the bucket in its spec.
    assert "__gl_bkt" in plan
    # The slim branch reuses the fact bucket shuffle instead of
    # recomputing the upstream.
    assert "ReusedExchange" in plan
    # The repair joins broadcast-side, never shuffling the fact rows
    # a second time by key.
    assert "BroadcastHashJoin" in plan
