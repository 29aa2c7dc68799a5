"""Near-duplicate image detection via perceptual-hash banding.

LLM-pipeline operator over the image axis: two images are near-dups
when their 64-bit perceptual hashes differ in at most `max_hamming`
bits.  Candidate generation is band-LSH by pigeonhole: split the hash
into `n_bands` disjoint bit bands — any pair within Hamming distance
d < n_bands agrees exactly on >= 1 band — and equi-join on
(band, band_value).  The refine is an exact popcount of the xor.

Everything is JVM bit arithmetic (shiftrightunsigned / xor /
bit_count): no Python in the row path, the only shuffles are the
band equi-join (keyed on 16-bit band values — fine-grained, no
group-id skew) and the pair dedup.  The oracle is a brute-force
all-pairs SQL Hamming join, so a candidate the banding misses fails
the correctness gate outright (banding with d < n_bands is lossless,
unlike probabilistic minhash LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phash_near_dup(
    hashes: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "idx",
    hash_col: str = "phash",
) -> DataFrame:
    """hashes(id, phash) -> (a_id, b_id, hamming) for all pairs with
    Hamming(phash_a, phash_b) <= max_hamming (a_id < b_id)."""
    assert max_hamming < n_bands, "pigeonhole needs d < n_bands"
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col(hash_col), b * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for b in range(n_bands)
            ]
        )
    ).alias("bv")
    left = hashes.select(
        F.col(id_col).alias("a_id"), F.col(hash_col).alias("a_hash"), bands
    ).select("a_id", "a_hash", "bv.band", "bv.val")
    right = hashes.select(
        F.col(id_col).alias("b_id"), F.col(hash_col).alias("b_hash"), bands
    ).select("b_id", "b_hash", "bv.band", "bv.val")
    cand = (
        left.join(right, ["band", "val"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_hash", "b_hash")
        .distinct()
    )
    ham = F.bit_count(
        F.col("a_hash").bitwiseXOR(F.col("b_hash"))
    ).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
