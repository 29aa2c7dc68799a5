"""Distributed audio / video operators over opaque binary columns.

The training-data-pipeline pattern for non-text modalities: payloads
stay opaque bytes until one Arrow-batched pass decodes them
(mapInPandas — one Python worker invocation per batch, never per
row), and the extracted features are exact-integer forms so the
distributed result hash-matches a driver oracle.

Scale shape: both operators are embarrassingly parallel maps with no
shuffle; video frame sampling exploits the container's byte-range
index (kernels.video) so a sample-every-k job touches ~1/k of the
frame bytes.  Output rows carry only scalar features — payloads never
ride through a shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("sum_sq", T.LongType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
        T.StructField("dom_freq_bin", T.IntegerType(), False),
        T.StructField("dom_freq_hz", T.DoubleType(), False),
    ]
)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Decode WAV payloads and emit exact-integer features plus the
    dominant frequency (bin -> Hz via the row's sample rate)."""

    def run(batches):
        from ..kernels import wav as WAV

        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                samples, sr = WAV.decode_wav(bytes(data))
                f = WAV.audio_features(samples, sr)
                f["audio_id"] = aid
                f["dom_freq_hz"] = (
                    f["dom_freq_bin"] * sr / f["n_samples"]
                    if f["n_samples"]
                    else 0.0
                )
                rows.append(f)
            yield pd.DataFrame(rows)[
                [fld.name for fld in AUDIO_FEATURES_SCHEMA.fields]
            ]

    return audio.select("audio_id", "bytes").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("frame_fnv", T.LongType(), False),
    ]
)


def sample_video_frames(video: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling + per-frame stats: decode every `every`-th frame
    of each clip by byte range (the other frames' bytes are never
    parsed) and emit exact channel sums + an FNV payload fingerprint.
    One output row per sampled frame."""

    def run(batches):
        from ..kernels import png as PNG
        from ..kernels import video as VID

        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                data = bytes(data)
                fps, n_frames, offsets, start = VID.video_header(data)
                for k in range(0, n_frames, every):
                    payload = data[
                        start + offsets[k] : start + offsets[k + 1]
                    ]
                    rgb = PNG.decode_png(payload)
                    rows.append(
                        {
                            "video_id": vid,
                            "frame_idx": k,
                            # fps is an unvalidated uint16 header field;
                            # clamp like audio_features does sample_rate
                            "ts_ms": (k * 1000) // max(fps, 1),
                            "w": rgb.shape[1],
                            "h": rgb.shape[0],
                            "sum_r": int(rgb[:, :, 0].sum()),
                            "sum_g": int(rgb[:, :, 1].sum()),
                            "sum_b": int(rgb[:, :, 2].sum()),
                            "frame_fnv": PNG.fnv1a64(payload),
                        }
                    )
            # explicit columns: a batch of zero-frame clips yields
            # rows == [] and a bare pd.DataFrame([]) has no columns
            yield pd.DataFrame(
                rows, columns=[fld.name for fld in FRAME_STATS_SCHEMA.fields]
            )

    return video.select("video_id", "bytes").mapInPandas(
        run, schema=FRAME_STATS_SCHEMA
    )
