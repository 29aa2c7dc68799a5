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

Intersection of two normalized unions joins on group pairing then
filters by unsigned range overlap; the contained (deeper) cell is the
intersection cell.  Range compares use the bias trick (xor with
Long.MIN) so signed BIGINT order equals unsigned cell-id order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import sparkfns as S

_MIN_LONG = -(1 << 63)


def _is_level(cell: Column, level: int) -> Column:
    """lsb(cell) == lsb_for_level(level), as one mask compare."""
    lsb = S.lsb_for_level(level)
    return cell.bitwiseAND(F.lit(2 * lsb - 1)) == F.lit(lsb)


def _deeper_than(cell: Column, level: int) -> Column:
    """lsb(cell) < lsb_for_level(level) (cell is at a finer level)."""
    lsb = S.lsb_for_level(level)
    return cell.bitwiseAND(F.lit(lsb | (lsb - 1))) != F.lit(lsb)


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


def _bias(c: Column) -> Column:
    return c.bitwiseXOR(F.lit(_MIN_LONG))


def union_intersection(norm: DataFrame, pair_with: Column) -> DataFrame:
    """Intersection of each group's union with its partner group's
    (partner = pair_with(g)): overlapping disjoint cells emit the
    deeper (contained) cell, keyed by the left group id."""
    lsb_a = F.col("a_cell").bitwiseAND(-F.col("a_cell"))
    lsb_b = F.col("b_cell").bitwiseAND(-F.col("b_cell"))
    a = norm.select(
        F.col("g").alias("g"), F.col("cell").alias("a_cell")
    ).withColumn("pg", pair_with)
    b = norm.select(F.col("g").alias("pg"), F.col("cell").alias("b_cell"))
    j = a.join(b, "pg")
    a_min, a_max = (
        _bias(F.col("a_cell") - (lsb_a - 1)),
        _bias(F.col("a_cell") + (lsb_a - 1)),
    )
    b_min, b_max = (
        _bias(F.col("b_cell") - (lsb_b - 1)),
        _bias(F.col("b_cell") + (lsb_b - 1)),
    )
    overlap = (b_min <= a_max) & (b_max >= a_min)
    deeper_b = (a_min <= b_min) & (b_max <= a_max)
    return (
        j.where(overlap)
        .select(
            "g",
            F.when(deeper_b, F.col("b_cell"))
            .otherwise(F.col("a_cell"))
            .alias("cell"),
        )
        .distinct()
    )
