"""Scale the synthetic star schema up by an integer factor for soak
runs (sf0.1 x10 -> "sf1", ~6M lineitem rows).

Fact-table keys shift per copy so every copy derives NEW deterministic
points (sources/points.py hashes the key); dimension tables (region,
nation) stay fixed so query semantics (25 nation regions, 5 regions)
are unchanged.  Document ids shift by 50_000 per copy, staying clear
of the +1_000_000 near-dup mutant band; each copy's text is identical,
which deliberately makes every document a 10-way exact/near duplicate
— a worst-case skew soak for the LSH banding path.

Usage:  python jobs/gen_sf_scale.py [src_dir] [dst_dir] [factor]
Default: /root/testdata/sf0.1 -> <repo>/.soak/sf1 x10
"""

from __future__ import annotations

import os
import sys

import duckdb

# (table, key columns to shift, per-copy stride)
PLAN = [
    ("lineitem", ["l_orderkey"], 10_000_000),
    ("orders", ["o_orderkey"], 10_000_000),
    ("supplier", ["s_suppkey"], 100_000),
    ("customer", ["c_custkey"], 10_000_000),
    ("part", ["p_partkey"], 10_000_000),
    ("events", ["event_id"], 100_000_000),
    ("documents", ["doc_id"], 50_000),
    ("embeddings", ["vec_id"], 100_000),
    ("nation", [], 0),  # dims: copy as-is
    ("region", [], 0),
]


def scale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for table, keys, stride in PLAN:
        src_path = f"{src}/{table}.parquet"
        dst_path = f"{dst}/{table}.parquet"
        if not keys or factor == 1:
            duckdb.sql(
                f"COPY (SELECT * FROM '{src_path}') TO '{dst_path}' "
                "(FORMAT PARQUET)"
            )
            continue
        parts = []
        for c in range(factor):
            shifted = ", ".join(
                [
                    f"({k} + {c * stride}) AS {k}" if k in keys else k
                    for k in duckdb.sql(
                        f"SELECT * FROM '{src_path}' LIMIT 0"
                    ).columns
                ]
            )
            parts.append(f"SELECT {shifted} FROM '{src_path}'")
        union = " UNION ALL ".join(parts)
        duckdb.sql(
            f"COPY ({union}) TO '{dst_path}' (FORMAT PARQUET)"
        )
        n = duckdb.sql(f"SELECT count(*) FROM '{dst_path}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, ".soak", "sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, factor)
