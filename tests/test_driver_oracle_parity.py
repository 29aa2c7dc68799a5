"""Every oracle'd driver-contract query must match its DuckDB oracle
exactly (rows + values) at the pytest scale — the local twin of the
driver's sf0.01 correctness gate."""

from __future__ import annotations

import math

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


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                # compare doubles bit-exactly but map -0.0 == 0.0
                vals.append(v + 0.0 if v == 0 else v)
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = E.queries()[name]
    sql = E.oracle_sql()[name]
    got = _norm(tuple(r) for r in q(spark, sf_dir).collect())
    want = _norm(con.sql(sql).fetchall())
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch"


def test_every_query_runs(spark, sf_dir):
    oracles = set(E.oracle_sql())
    for name, q in E.queries().items():
        df = q(spark, sf_dir)
        n = df.count()
        assert n >= 0
        if name not in oracles:
            # rows-only queries must at least be non-trivial
            assert n > 0, f"{name} returned no rows"
