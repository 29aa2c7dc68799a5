"""The earth-metrics oracle's corrected floor(log2) must equal numpy's
frexp exponent arithmetic EXACTLY — including at power-of-two
boundaries and one-ulp neighbors, where a naive floor(log2(v)) is off
by one (that is the whole reason the level pickers use exponent
arithmetic; S2Metrics.cs GetLevelForMaxValue)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest


def _flog2_sql(x: str) -> str:
    e0 = f"CAST(floor(log2({x})) AS BIGINT)"
    return (
        f"({e0} + CASE WHEN ({x}) >= power(2.0, {e0} + 1) THEN 1 ELSE 0 END"
        f" - CASE WHEN ({x}) < power(2.0, {e0}) THEN 1 ELSE 0 END)"
    )


def test_corrected_floor_log2_matches_frexp():
    vals = []
    for k in range(-60, 61):
        v = math.ldexp(1.0, k)
        vals.extend([v, math.nextafter(v, 0.0), math.nextafter(v, math.inf)])
    vals.extend([0.3, 0.7, 1.5, 3.9999999, 1e-300, 1e300])
    arr = np.array(vals)
    _m, x = np.frexp(arr)
    want = x.astype(np.int64) - 1

    con = duckdb.connect()
    con.register("vv", pd.DataFrame({"i": range(len(vals)), "v": vals}))
    got = (
        con.sql(f"SELECT i, {_flog2_sql('v')} AS f FROM vv ORDER BY i")
        .df()["f"]
        .to_numpy()
    )
    mism = (got != want).sum()
    assert mism == 0, f"{mism} mismatches, e.g. idx {int(np.argmax(got != want))}"


def test_naive_floor_log2_would_fail():
    """Sanity: the correction is actually load-bearing on this host's
    libm — at least one boundary neighbor differs from frexp under a
    plain floor(log2)."""
    con = duckdb.connect()
    bad_vals = []
    for k in (-37, -13, 13, 37):
        v = math.nextafter(math.ldexp(1.0, k), 0.0)
        naive = con.sql(
            f"SELECT CAST(floor(log2(CAST('{v!r}' AS DOUBLE))) AS BIGINT)"
        ).fetchone()[0]
        _m, x = np.frexp(v)
        if naive != x - 1:
            bad_vals.append(v)
    if not bad_vals:
        pytest.skip("this host's libm log2 is faithful at the probed "
                    "boundaries; the frexp correction is free insurance")
    # the corrected oracle expression must fix every bad boundary
    for v in bad_vals:
        lit = "CAST('{!r}' AS DOUBLE)".format(v)
        got = con.sql(f"SELECT {_flog2_sql(lit)}").fetchone()[0]
        _m, x = np.frexp(v)
        assert got == x - 1, f"corrected flog2 wrong at {v!r}"


def test_level_pickers_nonpositive_short_circuit(spark):
    """S2Metrics GetLevelFor{Max,Min}Value return kMaxLevel for
    value <= 0 (S2Metrics.cs); the vectorized kernel must mirror that
    instead of dividing (ADVICE r3)."""
    from s2geometry_spark.constants import MAX_LEVEL
    from s2geometry_spark.operators import earth_metrics_op as EM

    df = spark.createDataFrame(
        pd.DataFrame({"key": [1, 2, 3], "meters": [0.0, -5.0, 37.5]})
    )
    rows = {r["key"]: r for r in EM.earth_metric_columns(df).collect()}
    for k in (1, 2):
        for c in ("lvl_minw_max", "lvl_avge_min", "lvl_avga_max",
                  "lvl_closest"):
            assert rows[k][c] == MAX_LEVEL, (k, c, rows[k][c])
    assert rows[3]["lvl_minw_max"] != MAX_LEVEL
