"""Tile mosaics + raster<->vector extents.

The mosaic pipeline (north_star: "rasterizing tile mosaics back to
vector extents"):

  images (image_id, bytes, fmt, lat, lon, ...)
    -> leaf cell + tile assignment (Arrow pUDF + JVM bit parent)
    -> groupBy(tile_id).applyInPandas: decode payloads (kernels.png),
       compose a KxK mosaic raster per tile, re-encode as PNG
    -> per-tile vector extent: tile cell vertices projected
       (PlateCarree/Mercator) and tessellated back to geodesics

Scale notes: the only shuffle is the groupBy(tile_id) exchange, whose
key count is the tile count; mosaic composition is per-group local
work in Arrow batches.  Skewed tiles (hot spots) are bounded by
``max_images_per_tile`` sampling inside the group (deterministic by
image_id order), mirroring what a production mosaic job does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import sparkfns as S
from ..functions import udfs as U
from ..kernels import png as PNG

MOSAIC_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.LongType(), False),
        T.StructField("n_images", T.LongType(), False),
        T.StructField("mosaic", T.BinaryType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def with_tiles(images: DataFrame, level: int) -> DataFrame:
    """Geotagged image table -> + (cell_id, tile_id)."""
    df = images.withColumn(
        "cell_id", U.ll_to_cellid(F.col("lat"), F.col("lon"))
    )
    return df.withColumn("tile_id", S.cell_parent(F.col("cell_id"), level))


def tile_mosaics(
    images_tiled: DataFrame,
    grid: int = 4,
    patch: int = 16,
    max_images_per_tile: int = 256,
) -> DataFrame:
    """Per-tile mosaic: a (grid*patch)^2 RGB raster of per-image
    patches (decoded + box-downsampled), PNG-encoded."""

    def compose(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (tile_id,) = key
        pdf = pdf.sort_values("image_id").head(max_images_per_tile)
        n = len(pdf)
        side = grid * patch
        canvas = np.zeros((side, side, 3), dtype=np.float64)
        counts = np.zeros((side, side, 1), dtype=np.float64)
        tot = np.zeros(3, dtype=np.float64)
        npx = 0
        for slot, (_, row) in enumerate(pdf.iterrows()):
            rgb = PNG.decode_image(bytes(row["bytes"]), row["fmt"])
            tot += rgb.reshape(-1, 3).sum(axis=0)
            npx += rgb.shape[0] * rgb.shape[1]
            # box-downsample to patch x patch (vectorized bincount mean)
            h, w = rgb.shape[:2]
            yi = (np.arange(h) * patch // h)[:, None]
            xi = (np.arange(w) * patch // w)[None, :]
            flat = (yi * patch + xi).ravel()
            small = np.zeros((patch * patch, 3))
            cnt = np.bincount(flat, minlength=patch * patch)
            for ch in range(3):
                small[:, ch] = np.bincount(
                    flat, weights=rgb[:, :, ch].ravel(),
                    minlength=patch * patch,
                ) / np.maximum(cnt, 1)
            empty = cnt == 0
            if empty.any():
                # an image smaller than patch in either dimension maps
                # no source pixel into some bins; fill those by
                # nearest-neighbor upsample instead of leaving them
                # black stripes
                sy = np.minimum(np.arange(patch) * h // patch, h - 1)
                sx = np.minimum(np.arange(patch) * w // patch, w - 1)
                nn = rgb[sy][:, sx].reshape(patch * patch, 3)
                small[empty] = nn[empty]
            small = small.reshape(patch, patch, 3)
            gy, gx = divmod(slot % (grid * grid), grid)
            canvas[gy * patch:(gy + 1) * patch, gx * patch:(gx + 1) * patch] += small
            counts[gy * patch:(gy + 1) * patch, gx * patch:(gx + 1) * patch] += 1
        raster = (canvas / np.maximum(counts, 1)).astype(np.uint8)
        mean = tot / max(npx, 1)
        return pd.DataFrame(
            [
                {
                    "tile_id": int(tile_id),
                    "n_images": n,
                    "mosaic": PNG.encode_png(raster),
                    "mean_r": mean[0], "mean_g": mean[1], "mean_b": mean[2],
                }
            ]
        )

    return (
        images_tiled.select("tile_id", "image_id", "bytes", "fmt")
        .groupBy("tile_id")
        .applyInPandas(compose, schema=MOSAIC_SCHEMA)
    )


EXTENT_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.LongType(), False),
        T.StructField("ring_idx", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)


def tile_extent_ring(
    cid: int, projection_name: str = "plate_carree", tolerance: float = 1e-4
) -> list:
    """One tile cell -> projected + tessellated closed boundary ring
    [(x, y)...] — the raster->vector extent (pure kernel, shared by the
    distributed operator and the driver-side literal oracle)."""
    from ..kernels import projections as PR
    from ..kernels.geom import Cell

    proj = (
        PR.PlateCarree() if projection_name == "plate_carree"
        else PR.Mercator()
    )
    cell = Cell(int(cid))
    ring: list = []
    verts = [np.asarray(cell.vertex(k)) for k in range(4)]
    for k in range(4):
        seg = PR.tessellate_projected(
            verts[k], verts[(k + 1) % 4], proj, tolerance
        )
        ring.extend(seg[:-1] if k < 3 else seg)
    return ring


def tile_extents(
    tiles: DataFrame,
    projection_name: str = "plate_carree",
    tolerance: float = 1e-4,
) -> DataFrame:
    """Tile rows -> exploded extent vertices (tile_id, ring_idx, x, y),
    one row per tessellated ring vertex (scalar columns so results are
    hashable / SQL-comparable downstream)."""

    def run(batches):
        for pdf in batches:
            out_tid, out_idx, out_x, out_y = [], [], [], []
            for cid in pdf["tile_id"].tolist():
                ring = tile_extent_ring(cid, projection_name, tolerance)
                out_tid.extend([int(cid)] * len(ring))
                out_idx.extend(range(len(ring)))
                out_x.extend(p[0] for p in ring)
                out_y.extend(p[1] for p in ring)
            yield pd.DataFrame(
                {
                    "tile_id": pd.Series(out_tid, dtype="int64"),
                    "ring_idx": pd.Series(out_idx, dtype="int32"),
                    "x": pd.Series(out_x, dtype="float64"),
                    "y": pd.Series(out_y, dtype="float64"),
                }
            )

    return tiles.select("tile_id").mapInPandas(run, schema=EXTENT_SCHEMA)
