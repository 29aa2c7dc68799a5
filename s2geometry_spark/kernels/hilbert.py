"""Hilbert space-filling-curve lookup tables and (face,i,j) <-> cell-id.

Semantics match the public S2 cell-id scheme (reference behavior:
/root/reference/S2Geometry/S2CellId.cs:817-916 FromFaceIJ /
ToFaceIJOrientation, lookup-table construction S2CellId.cs:1004-1060,
traversal tables S2Coords.cs:441-478).  Implementation is freshly
written vectorized numpy: the per-row loop of the reference becomes a
loop over 8 Hilbert *rounds*, each a fancy-indexed gather over the
whole batch.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    INVERT_MASK,
    LOOKUP_BITS,
    MAX_LEVEL,
    POS_BITS,
    SWAP_MASK,
)

U = np.uint64  # numpy<2 promotes uint64+pyint to float64; wrap every const

# Hilbert traversal tables (S2Coords.cs:441-478).  The canonical order
# visits subcells (0,0),(0,1),(1,1),(1,0); the other rows are the
# swapped/inverted orientations.
KIJ_TO_POS = ((0, 1, 3, 2), (0, 3, 1, 2), (2, 3, 1, 0), (2, 1, 3, 0))
KPOS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
KPOS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)


def _build_lookup_tables() -> tuple[np.ndarray, np.ndarray]:
    """Build the two 1024-entry tables mapping 4 bits of i, 4 bits of j
    and 2 orientation bits to 8 Hilbert-position bits + 2 new orientation
    bits (and the inverse).  One-time cost; identical content to the
    reference's recursive InitLookupCell (S2CellId.cs:1004-1060), built
    here by directly walking 4 curve levels per entry.
    """
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    for orig_orientation in range(4):
        for pos in range(1 << (2 * LOOKUP_BITS)):
            i = j = 0
            orientation = orig_orientation
            for k in range(LOOKUP_BITS):  # high bit pair first
                p2 = (pos >> (2 * (LOOKUP_BITS - 1 - k))) & 3
                ij = KPOS_TO_IJ[orientation][p2]
                i = (i << 1) | (ij >> 1)
                j = (j << 1) | (ij & 1)
                orientation ^= KPOS_TO_ORIENTATION[p2]
            ij_key = (i << LOOKUP_BITS) | j
            lookup_pos[(ij_key << 2) | orig_orientation] = (pos << 2) | orientation
            lookup_ij[(pos << 2) | orig_orientation] = (ij_key << 2) | orientation
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()


def from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized leaf-cell-id encode from (face, i, j).

    face in [0,6), i/j in [0, 2^30).  Returns uint64 leaf cell ids.
    Mirrors S2CellId.FromFaceIJ (S2CellId.cs:817-853): 8 rounds, each
    folding 4 bits of i and j through the lookup table while tracking
    curve orientation.
    """
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    n = face << U(POS_BITS - 1)
    bits = face & U(SWAP_MASK)
    mask = U((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        bits = bits + (((i >> U(k * LOOKUP_BITS)) & mask) << U(LOOKUP_BITS + 2))
        bits = bits + (((j >> U(k * LOOKUP_BITS)) & mask) << U(2))
        bits = LOOKUP_POS[bits]
        n = n | ((bits >> U(2)) << U(k * 2 * LOOKUP_BITS))
        bits = bits & U(SWAP_MASK | INVERT_MASK)
    return n * U(2) + U(1)


def to_face_ij(
    cell_id: np.ndarray, want_orientation: bool = False
) -> tuple[np.ndarray, ...]:
    """Vectorized decode: cell id -> (face, i, j[, orientation]).

    For non-leaf cells (i,j) is a leaf cell adjacent to the cell center,
    exactly as S2CellId.ToFaceIJOrientation (S2CellId.cs:860-916).
    """
    cid = np.asarray(cell_id).astype(np.uint64)
    face = cid >> U(POS_BITS)
    bits = face & U(SWAP_MASK)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits = bits + (
            ((cid >> U(k * 2 * LOOKUP_BITS + 1)) & U((1 << (2 * nbits)) - 1)) << U(2)
        )
        bits = LOOKUP_IJ[bits]
        i = i + ((bits >> U(LOOKUP_BITS + 2)) << U(k * LOOKUP_BITS))
        j = j + (((bits >> U(2)) & U((1 << LOOKUP_BITS) - 1)) << U(k * LOOKUP_BITS))
        bits = bits & U(SWAP_MASK | INVERT_MASK)
    if not want_orientation:
        return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64)
    # Non-leaf cells: each "00" suffix pair flips the swap bit
    # (S2CellId.cs:900-910).
    lsb = cid & (~cid + U(1))
    flip = (lsb & U(0x1111111111111110)) != U(0)
    orientation = np.where(flip, bits ^ U(SWAP_MASK), bits)
    return (
        face.astype(np.int64),
        i.astype(np.int64),
        j.astype(np.int64),
        orientation.astype(np.int64),
    )
