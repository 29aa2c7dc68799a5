"""Mimic the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() in DuckDB at small scale; compare row count,
schema width and order-insensitive values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # round floats to stabilize printing; values should be bit-equal anyway
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", list(E.queries().keys()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = E.queries()[name]
    spark_df = q(spark, sf_dir).toPandas()
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_df) > 0
        return
    duck_df = duck.execute(oracle).fetchdf()
    a, b = normalize(spark_df), normalize(duck_df)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), (len(a), len(b))
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f":
            assert (av == bv).all(), f"{name}.{col} float mismatch"
        else:
            assert (av == bv).all(), f"{name}.{col} mismatch"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 2
