"""Headline benchmark: S2 tile-assignment + spatial-join throughput.

Run:    python bench.py                       # one JSON line on stdout
        python bench.py --scaling             # local[8] vs local[32] evidence
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS   (default 32)

The flagship metric is end-to-end rows/sec of the point->leaf-cell->
tile pipeline (scan -> Arrow pUDF encode -> JVM bit-parent -> hash agg)
on the `lineitem` table, plus per-query wall seconds for the rest of
the suite.  Each timed run forces full execution with a `noop` sink
(no collect, no driver bottleneck) — the same shape a cluster job has.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Fully execute a DataFrame without collecting rows to the driver."""
    n = df.count()
    return n


def _points(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from s2geometry_spark.sources import points as P

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = (F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber")).alias("key")
    return P.with_xyz(li.select(key))


def run_suite(spark, sf_dir: str) -> tuple[dict, int]:
    """Returns ({query: sec}, flagship_row_count)."""
    import __spark_entry__ as E

    timings: dict[str, float] = {}

    # flagship: tile assignment + per-tile counts over lineitem
    from s2geometry_spark.operators import tile as T

    pts = _points(spark, sf_dir)
    n_rows = pts.count()  # warms scan/catalog; not part of timed region
    # Warm the Arrow/python-worker pool so the first timed query does
    # not pay daemon startup (a cluster amortizes this across the job).
    _force(T.assign_cellids(pts.limit(4096)))

    t0 = time.perf_counter()
    df = T.tile_counts(T.assign_cellids(pts), E.TILE_LEVEL)
    _force(df)
    timings["tile_assign"] = time.perf_counter() - t0

    # leaf encode only (kernel throughput: scan + pUDF, no shuffle)
    t0 = time.perf_counter()
    _force(T.assign_cellids(pts).select("key", "cell_id"))
    timings["cellid_leaf"] = time.perf_counter() - t0

    # the driver-contract suite at this SF
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = time.perf_counter() - t0

    return timings, n_rows


def bench_once(cores: int, sf_dir: str) -> dict:
    from s2geometry_spark.plans.session import build_session

    spark = build_session(app_name=f"s2bench[{cores}]", cores=cores)
    try:
        timings, n_rows = run_suite(spark, sf_dir)
        total = sum(timings.values())
        return {
            "metric": "s2_suite_wall_seconds",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": _sf_of(sf_dir),
            "rows": n_rows,
            "cores": cores,
            "tile_assign_rows_per_sec": round(n_rows / timings["tile_assign"], 1),
        }
    finally:
        spark.stop()


def bench_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """north_rule scaling evidence: same job, two parallelism levels.

    efficiency = (throughput_hi / throughput_lo) / (hi / lo)
    """
    out = {}
    for cores in (lo, hi):
        r = bench_once(cores, sf_dir)
        out[f"local[{cores}]"] = r
    tp_lo = out[f"local[{lo}]"]["tile_assign_rows_per_sec"]
    tp_hi = out[f"local[{hi}]"]["tile_assign_rows_per_sec"]
    out["scaling_efficiency"] = round((tp_hi / tp_lo) / (hi / lo), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)

    if "--scaling" in sys.argv:
        print(json.dumps(bench_scaling(sf_dir)))
        return

    print(json.dumps(bench_once(cores, sf_dir)))


if __name__ == "__main__":
    main()
