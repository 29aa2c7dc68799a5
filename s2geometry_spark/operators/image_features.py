"""Per-image multimodal feature extraction over binary payload columns.

The pattern a 100-TB training-data pipeline needs (task brief:
"decode / feature-extract / resize / frame-sample as Pandas UDFs over
mapInPandas"): binary column + typed metadata in, decoded features +
derived payloads out, Arrow batch at a time, no driver involvement.

The PNG/fake-jpeg codec is the sandbox stand-in (kernels.png — real
PNG; the jpeg path is a clearly-marked deterministic stub); swapping in
a real image library touches only kernels/png.py, not this plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels import png as PNG

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("std_gray", T.DoubleType(), False),
        T.StructField("edge_energy", T.DoubleType(), False),
        T.StructField("phash_check", T.BooleanType(), False),
        T.StructField("thumb", T.BinaryType(), False),
    ]
)


def extract_features(images: DataFrame, thumb_size: int = 8) -> DataFrame:
    """images(image_id, bytes, fmt, phash, ...) -> per-image features +
    a thumb_size x thumb_size PNG thumbnail.  mapInPandas: one decode
    pass per Arrow batch, fully distributed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                rgb = PNG.decode_image(bytes(row["bytes"]), row["fmt"])
                h, w = rgb.shape[:2]
                flat = rgb.reshape(-1, 3).astype(np.float64)
                mean = flat.mean(axis=0)
                gray = flat.mean(axis=1)
                gm = gray.reshape(h, w)
                # simple gradient magnitude (edge energy)
                gx = np.abs(np.diff(gm, axis=1)).mean() if w > 1 else 0.0
                gy = np.abs(np.diff(gm, axis=0)).mean() if h > 1 else 0.0
                # box-resample thumbnail
                yi = (np.arange(thumb_size) * h) // thumb_size
                xi = (np.arange(thumb_size) * w) // thumb_size
                thumb = rgb[yi[:, None], xi[None, :]]
                out.append(
                    {
                        "image_id": row["image_id"],
                        "w": w,
                        "h": h,
                        "mean_r": mean[0],
                        "mean_g": mean[1],
                        "mean_b": mean[2],
                        "std_gray": float(gray.std()),
                        "edge_energy": float(gx + gy),
                        "phash_check": PNG.phash64(rgb.tobytes())
                        == int(row["phash"]),
                        "thumb": PNG.encode_png(thumb.astype(np.uint8)),
                    }
                )
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )
