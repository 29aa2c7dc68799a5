"""Distributed S2CellUnion set operations over grouped cell sets.

Reference semantics: S2Region/S2CellUnion.cs Normalize (sort, discard
cells contained by others, merge complete sibling quadruples into the
parent, repeated until a fixed point) and Intersection (overlapping
pairs of disjoint normalized cells emit the deeper cell).

Spark-first shape: the scalar reference normalizes one union in one
sorted pass; distributed, a union is a *group of rows* (group_id,
cell_id), so Normalize becomes

  1. DISTINCT                               — exact duplicates
  2. one groupBy per input ancestor level   — containment dedup: deeper
     cells key to their ancestor id; if the ancestor itself is in the
     group, only the ancestor survives
  3. one groupBy per merge round            — sibling quadruples: cells
     at the round's child level key to their parent id; a group holding
     all four children collapses to the parent

Every round references its input exactly ONCE (groupBy + explode), so
the lineage stays linear — a chain of self-anti-joins would recompute
the upstream plan 2^rounds times.  Each round is pure JVM bit
arithmetic keyed on (group, parent): at 100 TB this is a handful of
hash aggregations, no Python in the row path.  The merge rounds are a
*bounded* unroll of the reference's fixed-point loop; callers pick the
round count from their input levels (tests assert parity with the
exhaustive scalar kernel at our data scales).

Round-safety invariant (why the groupBy form is exact): containment
rounds run shallowest-ancestor-first, so when a merge round at child
level L runs, no proper ancestor of any level-L cell remains in the
set — a parent key can therefore never collide with a non-child cell.

Intersection of two normalized unions is two ancestor-term equi-joins
on the 64-bit cell id (a cell overlaps the disjoint partner set iff
one of its ancestors-or-self IS a partner cell); the contained
(deeper) cell is the intersection cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import sparkfns as S


def _is_level(cell: Column, level: int) -> Column:
    """lsb(cell) == lsb_for_level(level), as one mask compare."""
    lsb = S.lsb_for_level(level)
    return cell.bitwiseAND(F.lit(2 * lsb - 1)) == F.lit(lsb)


def _deeper_than(cell: Column, level: int) -> Column:
    """lsb(cell) < lsb_for_level(level) (cell is at a finer level):
    some bit strictly below the level's lsb is set."""
    lsb = S.lsb_for_level(level)
    return cell.bitwiseAND(F.lit(lsb - 1)) != F.lit(0)


def drop_contained_round(cells: DataFrame, anc: int) -> DataFrame:
    """Remove cells whose level-`anc` ancestor is present in the group
    (single groupBy: deeper cells key to their ancestor id)."""
    cell = F.col("cell")
    key = F.when(_deeper_than(cell, anc), S.cell_parent(cell, anc)).otherwise(
        cell
    )
    grouped = (
        cells.groupBy("g", key.alias("k"))
        .agg(
            # a level-anc member keys to itself, so its presence in this
            # group means the group key IS the holder's id
            F.max(F.when(_is_level(cell, anc), 1).otherwise(0)).alias(
                "has_holder"
            ),
            F.collect_set("cell").alias("members"),
        )
    )
    survivors = F.when(
        F.col("has_holder") == 1, F.array(F.col("k"))
    ).otherwise(F.col("members"))
    return grouped.select("g", F.explode(survivors).alias("cell"))


def merge_round(cells: DataFrame, child_level: int) -> DataFrame:
    """One Normalize merge round: complete sibling quadruples at
    `child_level` collapse into their parent (single groupBy)."""
    cell = F.col("cell")
    at = _is_level(cell, child_level)
    key = F.when(at, S.cell_parent(cell, child_level - 1)).otherwise(cell)
    grouped = (
        cells.groupBy("g", key.alias("k"))
        .agg(
            F.count_distinct(F.when(at, cell)).alias("n_kids"),
            F.collect_set("cell").alias("members"),
        )
    )
    merged = F.when(F.col("n_kids") == 4, F.array(F.col("k"))).otherwise(
        F.col("members")
    )
    return grouped.select("g", F.explode(merged).alias("cell"))


def normalize_unions(
    cells: DataFrame, levels: list[int], merge_floor: int
) -> DataFrame:
    """Normalize grouped cell sets: cells(g, cell) at the given input
    `levels`, merging sibling quadruples down to parents at
    `merge_floor` (bounded unroll of the reference fixed point)."""
    out = cells.distinct()
    for anc in sorted(levels)[:-1]:
        out = drop_contained_round(out, anc)
    for lv in range(max(levels), merge_floor, -1):
        out = merge_round(out, lv)
    return out


def union_intersection(
    norm: DataFrame,
    pair_with: Column,
    levels: tuple[int, ...] = (7, 8, 9, 10),
) -> DataFrame:
    """Intersection of each group's union with its partner group's
    (partner = pair_with(g)): overlapping disjoint cells emit the
    deeper (contained) cell, keyed by the left group id.

    Join shape: a range-overlap join keyed only on the handful of
    group ids would be a per-group cartesian (9k x 9k pairs per
    group).  Since both sides are normalized (disjoint within a
    group) and levels are bounded, cell x overlaps the other set iff
    one of x's ancestors at a covering level — or x itself — IS a
    cell of the other set, so intersection is two ancestor-term
    EQUI-joins on the 64-bit cell id: output-sized, shuffle keyed on
    the cell id (not the group), and each input cell matches at most
    one partner cell (disjointness), so no dedup exchange is needed.
    """
    cell = F.col("cell")

    # Precondition (fails loudly, not via the oracle gate): the two
    # equi-joins only generate ancestor terms at EXACTLY the levels in
    # `levels`, so an overlapping pair is found iff the SHALLOWER
    # cell's level is a member of the tuple — a gap level (e.g. 8 with
    # levels (7, 9, 10)) or any level outside the window would
    # silently emit no intersection rows.  Require exact membership.
    import functools
    import operator

    is_member = functools.reduce(
        operator.or_,
        [
            cell.bitwiseAND(F.lit(2 * S.lsb_for_level(lv) - 1))
            == F.lit(S.lsb_for_level(lv))
            for lv in levels
        ],
    )
    checked = F.when(is_member, cell).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                        "union_intersection: input cell level not in "
                        f"the term levels {sorted(levels)}: cell_id="
                ),
                cell.cast("string"),
            )
        ).cast("long")
    )
    norm = norm.select("g", checked.alias("cell"))

    def at_or_deeper(lv: int) -> Column:
        # lsb(cell) <= lsb_for_level(lv): some bit below 2*lsb set
        return cell.bitwiseAND(F.lit(2 * S.lsb_for_level(lv) - 1)) != 0

    def strictly_deeper(lv: int) -> Column:
        return cell.bitwiseAND(F.lit(S.lsb_for_level(lv) - 1)) != 0

    def with_terms(df: DataFrame, cond) -> DataFrame:
        return df.select(
            "g",
            pair_with.alias("pg"),
            cell.alias("src_cell"),
            F.explode(
                F.array_compact(
                    F.array(
                        *[
                            F.when(cond(lv), S.cell_parent(cell, lv))
                            for lv in levels
                        ]
                    )
                )
            ).alias("term"),
        )

    # a deeper-or-equal: an ancestor of a (or a itself) is a b-cell
    a_terms = with_terms(norm, at_or_deeper)
    b_side = norm.select(F.col("g").alias("pg"), cell.alias("b_cell"))
    j1 = a_terms.join(
        b_side, (F.col("term") == F.col("b_cell")) & (a_terms["pg"] == b_side["pg"])
    ).select("g", F.col("src_cell").alias("cell"))
    # b strictly deeper: a proper ancestor of b is an a-cell; b's group
    # is the PARTNER of the emitting group, so invert the pairing by
    # joining b's own group id against pair_with(a.g)
    b_terms = with_terms(norm, strictly_deeper).select(
        F.col("g").alias("bg"), F.col("src_cell").alias("b_cell"), "term"
    )
    a_side = norm.select(
        "g", pair_with.alias("pg"), cell.alias("a_cell")
    )
    j2 = b_terms.join(
        a_side,
        (F.col("term") == F.col("a_cell")) & (F.col("bg") == F.col("pg")),
    ).select("g", F.col("b_cell").alias("cell"))
    return j1.unionByName(j2)


def normalize_unions_subtree(cells: DataFrame) -> DataFrame:
    """One-shuffle Normalize via the exhaustive scalar kernel
    (S2CellUnion.Normalize, golden-tested) inside a single exchange:
    each union normalizes as one group — one kernel call per union
    (15 ms per 10k cells), the right granularity when a union fits an
    Arrow partition.  (Keying the exchange on subtrees to split a huge
    union is NOT exact: a complete sibling cover at the subtree-root
    level merges into a parent OUTSIDE every subtree — unions too big
    for one task must use the bounded JVM round chain above, which
    handles exactly the level range it is given.)"""
    import numpy as np
    import pandas as pd

    from ..kernels import cellunion as CUK

    df = cells.repartition("g")
    grp_cols = ["g"]

    def gen(batches):
        # a group never spans partitions (hash repartition), but may
        # span Arrow batches within one — concat first
        batches = list(batches)
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        if len(pdf) == 0:
            yield pd.DataFrame({"g": pd.Series([], dtype="int64"),
                                "cell": pd.Series([], dtype="int64")})
            return
        gs, cs = [], []
        for key_vals, sub in pdf.groupby(grp_cols, sort=False):
            g = key_vals[0] if isinstance(key_vals, tuple) else key_vals
            out = CUK.normalize(
                [int(v) for v in
                 sub["cell"].to_numpy().astype(np.int64).view(np.uint64)]
            )
            gs.append(np.full(len(out), g, dtype=np.int64))
            cs.append(np.array(out, dtype=np.uint64).view(np.int64))
        yield pd.DataFrame(
            {"g": np.concatenate(gs), "cell": np.concatenate(cs)}
        )

    return df.mapInPandas(gen, schema="g long, cell long")
