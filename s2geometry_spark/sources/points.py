"""Deterministic synthetic geo-points derived from integer keys.

The derivation is pure integer + IEEE-double arithmetic (multiply, mod,
divide, subtract) — NO trig — so Spark (numpy kernels) and the DuckDB
oracle produce bit-identical direction vectors, and therefore
bit-identical cell ids, coverings and join rows.  This is the
correctness spine: the same formula is emitted as Spark Columns here
and as SQL text in functions/duckdb_oracle.py.

A point is the (unnormalized) direction vector
    c = ((key * MUL_c) % MOD_c) / (MOD_c / 2.0) - 1.0   for c in x,y,z
which is uniform-ish in the cube [-1,1)^3; the cell-id pipeline is
projective so no normalization is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth-style multiplicative-hash constants (public domain folklore).
MUL = {"x": 2654435761, "y": 2246822519, "z": 3266489917}
MOD = {"x": 1000003, "y": 1000033, "z": 1000037}


def component_col(key: Column, axis: str) -> Column:
    # reduce key mod p BEFORE multiplying: key*MUL overflows int64 for
    # keys past ~2.8e9 (Spark would silently wrap, DuckDB would error,
    # the driver-side Python would compute exactly — three different
    # answers).  ((key % p) * m) % p is the same residue with a product
    # bounded by p*m < 2^52, exact in int64 on every engine; values for
    # in-range keys are bit-identical to the old form.
    m, p = MUL[axis], MOD[axis]
    return (
        (key % F.lit(p) * F.lit(m) % F.lit(p)).cast("double")
        / F.lit(p / 2.0)
        - F.lit(1.0)
    )


def component_sql(key_expr: str, axis: str) -> str:
    m, p = MUL[axis], MOD[axis]
    return f"((({key_expr}) % {p}) * {m} % {p}) / {p / 2.0!r} - 1.0"


def with_xyz(df: DataFrame, key: str = "key") -> DataFrame:
    """Append x,y,z direction-vector columns derived from integer key."""
    k = F.col(key)
    return df.withColumns(
        {
            "x": component_col(k, "x"),
            "y": component_col(k, "y"),
            "z": component_col(k, "z"),
        }
    )


def xyz_sql_cte(table: str, key_expr: str, name: str = "pts") -> str:
    """DuckDB CTE producing the identical (key, x, y, z)."""
    return (
        f"{name} AS (SELECT {key_expr} AS key, "
        f"{component_sql(key_expr, 'x')} AS x, "
        f"{component_sql(key_expr, 'y')} AS y, "
        f"{component_sql(key_expr, 'z')} AS z FROM {table})"
    )


def xyz_grp_sql_cte(
    table: str, key_expr: str, grp_expr: str, name: str = "pts"
) -> str:
    """Like xyz_sql_cte plus a group column (for per-group queries)."""
    return (
        f"{name} AS (SELECT {key_expr} AS key, {grp_expr} AS grp, "
        f"{component_sql(key_expr, 'x')} AS x, "
        f"{component_sql(key_expr, 'y')} AS y, "
        f"{component_sql(key_expr, 'z')} AS z FROM {table})"
    )
