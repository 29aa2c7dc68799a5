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

import math
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
        T.StructField("mean_gray", T.DoubleType(), False),
        T.StructField("std_gray", T.DoubleType(), False),
        T.StructField("edge_energy", T.DoubleType(), False),
        T.StructField("phash_check", T.BooleanType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("thumb", T.BinaryType(), False),
    ]
)

_BAD_ROW = {
    "w": 0, "h": 0, "mean_r": 0.0, "mean_g": 0.0, "mean_b": 0.0,
    "mean_gray": 0.0, "std_gray": 0.0, "edge_energy": 0.0,
    "phash_check": False, "ok": False, "thumb": b"",
}


def extract_features(
    images: DataFrame, thumb_size: int = 8, strict: bool = True
) -> DataFrame:
    """images(image_id, bytes, fmt, phash, ...) -> per-image features +
    a thumb_size x thumb_size PNG thumbnail.  mapInPandas: one decode
    pass per Arrow batch, fully distributed.

    ``strict=False`` turns an undecodable payload / unknown format into
    a row with ok=False (zeroed stats) instead of failing the task —
    a curation job over a real corpus MUST survive corrupt rows and
    drop them at its integrity stage; with the default strict=True a
    decode error still raises (the correctness-gate behavior, where a
    failure means a codec bug, not dirty data)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                # the WHOLE per-row computation sits in the guard:
                # strict=False must survive degenerate-but-decodable
                # payloads too (a zero-pixel image divides by zero, a
                # null phash fails the int() cast), not just decode
                # errors — the curation job runs strict=False precisely
                # to drop such rows at its integrity stage
                try:
                    rgb = PNG.decode_image(bytes(row["bytes"]), row["fmt"])
                    h, w = rgb.shape[:2]
                    n = w * h
                    if n == 0:
                        raise ValueError("degenerate image: zero pixels")
                    rec = _row_features(
                        row, rgb, h, w, n, thumb_size
                    )
                except Exception:
                    if strict:
                        raise
                    out.append({"image_id": row["image_id"], **_BAD_ROW})
                    continue
                out.append(rec)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def _row_features(row, rgb, h, w, n, thumb_size):
    px = rgb.astype(np.int64)
    # all stats derive from exact integer sums so the same
    # float expressions are reproducible in the SQL oracle
    # (sums < 2^53: order-independent, bitwise-deterministic)
    s = px.sum(axis=2)  # per-pixel gray*3, integer
    s1 = int(s.sum())
    s2 = int((s * s).sum())
    eh = int(np.abs(np.diff(s, axis=1)).sum()) if w > 1 else 0
    ev = int(np.abs(np.diff(s, axis=0)).sum()) if h > 1 else 0
    mean_gray = s1 / (3.0 * n)
    var = s2 / (9.0 * n) - mean_gray * mean_gray
    edge = (eh / (3.0 * (w - 1) * h) if w > 1 else 0.0) + (
        ev / (3.0 * (h - 1) * w) if h > 1 else 0.0
    )
    # box-resample thumbnail
    yi = (np.arange(thumb_size) * h) // thumb_size
    xi = (np.arange(thumb_size) * w) // thumb_size
    thumb = rgb[yi[:, None], xi[None, :]]
    return {
        "image_id": row["image_id"],
        "w": w,
        "h": h,
        "mean_r": int(px[:, :, 0].sum()) / n,
        "mean_g": int(px[:, :, 1].sum()) / n,
        "mean_b": int(px[:, :, 2].sum()) / n,
        "mean_gray": mean_gray,
        "std_gray": math.sqrt(var) if var > 0 else 0.0,
        "edge_energy": edge,
        "phash_check": PNG.phash64(rgb.tobytes()) == int(row["phash"]),
        "ok": True,
        "thumb": PNG.encode_png(thumb.astype(np.uint8)),
    }
