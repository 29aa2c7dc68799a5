"""Deterministic synthetic audio + video tables (multimodal binary
columns with typed metadata, the BASELINE input_hint pattern extended
to the remaining modalities).

Audio rows: (audio_id string, bytes binary<RIFF/WAVE PCM16 mono>,
sample_rate int, n_samples int, label string).  Payloads are two
deterministic sinusoids + splitmix noise, so the dominant-frequency
feature has a known ground truth per row.

Video rows: (video_id string, bytes binary<S2V1 PNG container>,
fps int, n_frames int, w int, h int).  Frames are splitmix pixel
streams, seeded per (row, frame).

Both generate DISTRIBUTED (mapInPandas over spark.range): any scale
without driver memory; every byte is a pure function of the row
index, so driver-side re-generation is the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..kernels import video as VID
from ..kernels import wav as WAV
from .images import _mix64

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("fps", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
    ]
)

_LABELS = ("speech", "music", "ambient", "tone")
_RATES = (8000, 16000, 22050)


def audio_row_record(i: int) -> dict:
    """All audio columns for row i — shared by the distributed
    generator and the driver-side oracle."""
    seed = int(_mix64(np.array([i], dtype=np.uint64))[0])
    sr = _RATES[seed % 3]
    n = 512 + (seed >> 4) % 1537  # 512..2048 samples
    f1 = 50 + (seed >> 8) % 900
    f2 = 1000 + (seed >> 16) % 3000
    t = np.arange(n, dtype=np.float64) / sr
    noise_u = _mix64(
        np.arange(n, dtype=np.uint64) + np.uint64(seed)
    ).astype(np.float64)
    noise = noise_u / float(2**64) - 0.5
    wave = (
        0.55 * np.sin(2 * np.pi * f1 * t)
        + 0.25 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * noise
    )
    pcm = np.clip(np.rint(wave * 32000), -32768, 32767).astype(np.int16)
    return {
        "audio_id": f"aud{i:012d}",
        "bytes": WAV.encode_wav(pcm, sr),
        "sample_rate": sr,
        "n_samples": int(n),
        "label": _LABELS[(seed >> 24) % 4],
    }


def video_row_record(i: int) -> dict:
    """All video columns for row i."""
    seed = int(_mix64(np.array([i], dtype=np.uint64))[0])
    fps = (12, 24, 30)[seed % 3]
    n_frames = 4 + (seed >> 4) % 9  # 4..12 frames
    w = 8 + (seed >> 8) % 9
    h = 8 + (seed >> 12) % 9
    frames = []
    for k in range(n_frames):
        # mask BEFORE np.uint64(): seed spans the full uint64 range, so
        # seed + 7919*k can exceed 2^64-1 as a Python int and the bare
        # conversion raises OverflowError instead of wrapping
        stream = _mix64(
            np.arange(w * h * 3, dtype=np.uint64)
            + np.uint64((seed + 7919 * k) & 0xFFFFFFFFFFFFFFFF)
        )
        frames.append(
            (stream & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)
        )
    return {
        "video_id": f"vid{i:012d}",
        "bytes": VID.mux_video(frames, fps),
        "fps": fps,
        "n_frames": n_frames,
        "w": w,
        "h": h,
    }


def audio_table(spark: SparkSession, n: int) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [audio_row_record(int(i)) for i in pdf["id"]]
            )

    return spark.range(n).mapInPandas(gen, schema=AUDIO_SCHEMA)


def video_table(spark: SparkSession, n: int) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [video_row_record(int(i)) for i in pdf["id"]]
            )

    return spark.range(n).mapInPandas(gen, schema=VIDEO_SCHEMA)
