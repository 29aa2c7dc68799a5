"""Driver-gate schema contract: the driver's comparator sorts columns
BY NAME before hashing values, so a Spark result and its DuckDB oracle
must expose identical column-name sets (the row-value parity test
compares tuples positionally and would miss a name mismatch that
reorders columns differently on the two sides)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_column_names_match(spark, sf_dir, con, name):
    spark_cols = list(E.queries()[name](spark, sf_dir).columns)
    oracle_cols = list(con.sql(E.oracle_sql()[name]).columns)
    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: spark {spark_cols} vs oracle {oracle_cols}"
    )
    # and no duplicate names on either side (sort-by-name would be
    # ambiguous)
    assert len(set(spark_cols)) == len(spark_cols)
    assert len(set(oracle_cols)) == len(oracle_cols)
