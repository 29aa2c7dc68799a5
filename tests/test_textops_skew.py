"""Hot-band LSH skew: a boilerplate corpus (hundreds of identical
docs sharing every band) must complete with the partner-group salting
and produce the exact pair set."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.operators import textops as TX


def test_boilerplate_corpus_completes(spark):
    n_same, n_diff = 300, 50
    rows = [(i, "the same boilerplate paragraph repeated " * 4) for i in range(n_same)]
    rows += [
        (n_same + i, f"unique document number {i} with its own words {i*i}")
        for i in range(n_diff)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    pairs = TX.near_dup_pairs(docs, with_mutants=False).collect()
    same_pairs = [
        r for r in pairs if r["id_a"] < n_same and r["id_b"] < n_same
    ]
    # all C(300, 2) identical pairs found, jaccard exactly 1.0
    assert len(same_pairs) == n_same * (n_same - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in same_pairs)


def test_salting_preserves_output(spark):
    rows = [
        (i, f"document about topic {i % 7} with shared phrasing and filler {i}")
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    got1 = sorted(
        tuple(r) for r in TX.near_dup_pairs(docs, salt_g=1).collect()
    )
    got8 = sorted(
        tuple(r) for r in TX.near_dup_pairs(docs, salt_g=8).collect()
    )
    assert got1 == got8


def test_unskewed_corpus_compiles_one_branch_plan(spark):
    """Twin of the similarity test: with zero hot buckets the eager
    emptiness check returns the one-branch candidate plan (no
    partner-group explode of band rows), so codegen never compiles the
    salted half; a boilerplate block still takes the salted plan."""
    rows = [
        (i, f"unique document number {i} with its own words {i * i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    cand = TX.near_dup_pairs(docs, with_mutants=False)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "explode" not in plan

    hot_rows = [
        (i, "the same boilerplate paragraph repeated " * 4)
        for i in range(200)
    ]
    hot_docs = spark.createDataFrame(
        pd.DataFrame(hot_rows, columns=["doc_id", "text"])
    )
    hot_cand = TX.near_dup_pairs(hot_docs, with_mutants=False)
    hot_plan = hot_cand._jdf.queryExecution().executedPlan().toString()
    assert "explode" in hot_plan
