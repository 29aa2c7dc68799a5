"""Distributed cellunion Normalize/Intersection (operators.cellunion_ops)
must equal the exhaustive scalar kernel (kernels.cellunion, ported from
S2Region/S2CellUnion.cs with reference goldens) group for group —
including that the bounded merge unroll (3 rounds, floor level 7) IS
the fixed point at our data scales.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geometry_spark.functions import sparkfns as S
from s2geometry_spark.kernels import cellid as C
from s2geometry_spark.kernels import cellunion as CU
from s2geometry_spark.operators import cellunion_ops as CUO

N_GROUPS = 16


@pytest.fixture(scope="module")
def grouped(spark, sf_dir):
    from s2geometry_spark.operators import tile as T
    from s2geometry_spark.sources import points as P

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = P.with_xyz(orders.select(F.col("o_orderkey").alias("key")))
    df = T.assign_cellids(pts)
    cells = df.select(
        "key",
        (F.col("key") % N_GROUPS).alias("g"),
        F.when(F.col("key") % 3 == 0, S.cell_parent(F.col("cell_id"), 8))
        .when(F.col("key") % 3 == 1, S.cell_parent(F.col("cell_id"), 9))
        .otherwise(S.cell_parent(F.col("cell_id"), 10))
        .alias("cell"),
    )
    norm = CUO.normalize_unions_subtree(cells.select("g", "cell"))
    raw = {}
    for g, cell in cells.select("g", "cell").collect():
        raw.setdefault(g, []).append(int(np.uint64(np.int64(cell))))
    got = {}
    for g, cell in norm.collect():
        got.setdefault(g, set()).add(int(np.uint64(np.int64(cell))))
    return raw, got, norm


def test_normalize_matches_scalar_kernel(grouped):
    raw, got, _ = grouped
    assert set(raw) == set(range(N_GROUPS))
    for g, ids in raw.items():
        want = set(CU.normalize(ids))
        assert got[g] == want, f"group {g}: {len(got[g])} vs {len(want)}"


def test_round_chain_equals_subtree_path(grouped, spark, sf_dir):
    """The all-JVM groupBy-round Normalize must emit exactly the same
    rows as the one-shuffle per-subtree kernel path."""
    from pyspark.sql import functions as F
    from s2geometry_spark.operators import tile as T
    from s2geometry_spark.sources import points as P

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = P.with_xyz(orders.select(F.col("o_orderkey").alias("key")))
    df = T.assign_cellids(pts)
    cells = df.select(
        (F.col("key") % N_GROUPS).alias("g"),
        F.when(F.col("key") % 3 == 0, S.cell_parent(F.col("cell_id"), 8))
        .when(F.col("key") % 3 == 1, S.cell_parent(F.col("cell_id"), 9))
        .otherwise(S.cell_parent(F.col("cell_id"), 10))
        .alias("cell"),
    )
    rounds = sorted(
        map(tuple, CUO.normalize_unions(
            cells, levels=[8, 9, 10], merge_floor=7
        ).collect())
    )
    subtree = sorted(
        map(tuple, CUO.normalize_unions_subtree(cells).collect())
    )
    assert rounds == subtree


def test_bounded_unroll_reaches_fixed_point(grouped):
    """No normalized cell sits above the merge floor — i.e. the three
    unrolled rounds were enough (a level-6 cell would mean a missed
    fourth merge)."""
    _, got, _ = grouped
    for g, ids in got.items():
        levels = {int(C.level(np.array([i], dtype=np.uint64))[0]) for i in ids}
        assert min(levels) >= 7


def test_intersection_matches_scalar_kernel(grouped):
    raw, got, norm = grouped
    inter = CUO.union_intersection(norm, (F.col("g") + 1) % N_GROUPS)
    got_i = {g: set() for g in range(N_GROUPS)}
    for g, cell in inter.collect():
        got_i[g].add(int(np.uint64(np.int64(cell))))
    for g in range(N_GROUPS):
        a = CU.normalize(raw[g])
        b = CU.normalize(raw[(g + 1) % N_GROUPS])
        want = set(CU.intersection(a, b))
        assert got_i[g] == want, f"group {g}"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_round_chain_random_level_sets(spark, seed):
    """Fuzz the bounded round chain: random cells at random level sets
    (including adjacent and gappy levels) must normalize exactly like
    the exhaustive scalar kernel — stresses the containment-round
    ordering invariant and the _deeper_than mask on arbitrary inputs."""
    import pandas as pd

    rng = np.random.RandomState(seed)
    level_sets = [[6, 7, 8], [5, 8, 11], [9, 10], [4, 10]]
    levels = level_sets[seed % len(level_sets)]
    xyz = rng.randn(3, 4000)
    leaf = C.xyz_to_cellid(*xyz)
    lv_pick = rng.randint(0, len(levels), size=4000)
    cells_u = np.empty(4000, dtype=np.uint64)
    for j, lv in enumerate(levels):
        m = lv_pick == j
        cells_u[m] = C.parent(leaf[m], lv)
    g = (rng.randint(0, 4, size=4000)).astype(np.int64)
    pdf = pd.DataFrame({"g": g, "cell": cells_u.view(np.int64)})
    df = spark.createDataFrame(pdf)
    got = {}
    floor = min(levels) - 2
    for row in CUO.normalize_unions(df, levels=levels,
                                    merge_floor=floor).collect():
        got.setdefault(row["g"], set()).add(
            int(np.uint64(np.int64(row["cell"])))
        )
    for gi in range(4):
        ids = [int(v) for v in cells_u[g == gi]]
        want = set(CU.normalize(ids))
        assert got.get(gi, set()) == want, f"seed {seed} group {gi}"


def test_union_intersection_rejects_out_of_window_levels(spark):
    """A cell whose level is not among the ancestor-term levels must
    raise loudly in the operator (ADVICE r3: a level-6 merge would
    otherwise silently emit no intersection rows)."""
    import pandas as pd

    face = C.xyz_to_cellid(
        np.array([1.0]), np.array([0.1]), np.array([0.1])
    )
    lv6 = int(C.parent(face, 6)[0])
    lv8 = int(C.parent(face, 8)[0])
    pdf = pd.DataFrame(
        {"g": [0, 1], "cell": np.array([lv6, lv8], dtype=np.uint64).view(np.int64)}
    )
    norm = spark.createDataFrame(pdf)
    out = CUO.union_intersection(norm, (F.col("g") + 1) % 2)
    with pytest.raises(Exception, match="term levels"):
        out.collect()


def test_union_intersection_rejects_gap_levels(spark):
    """Exact membership, not a [min, max] window: a level-8 cell with
    levels (7, 9, 10) would silently miss overlaps (no term ever
    equals it), so it must raise (round-4 review finding)."""
    import pandas as pd

    face = C.xyz_to_cellid(
        np.array([1.0]), np.array([0.1]), np.array([0.1])
    )
    lv8 = int(C.parent(face, 8)[0])
    lv9 = int(C.parent(face, 9)[0])
    pdf = pd.DataFrame(
        {"g": [0, 1], "cell": np.array([lv8, lv9], dtype=np.uint64).view(np.int64)}
    )
    norm = spark.createDataFrame(pdf)
    out = CUO.union_intersection(
        norm, (F.col("g") + 1) % 2, levels=(7, 9, 10)
    )
    with pytest.raises(Exception, match="term levels"):
        out.collect()


def test_union_intersection_in_window_levels_pass_guard(spark):
    """The guard must not fire for in-window inputs (levels 7..10)."""
    import pandas as pd

    face = C.xyz_to_cellid(
        np.array([1.0, -0.5]), np.array([0.1, 1.0]), np.array([0.1, 0.3])
    )
    lv7 = int(C.parent(face, 7)[0])
    lv10 = int(C.parent(face, 10)[1])
    pdf = pd.DataFrame(
        {"g": [0, 1], "cell": np.array([lv7, lv10], dtype=np.uint64).view(np.int64)}
    )
    norm = spark.createDataFrame(pdf)
    out = CUO.union_intersection(norm, (F.col("g") + 1) % 2)
    out.collect()  # must not raise
