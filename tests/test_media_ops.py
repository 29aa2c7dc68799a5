"""Audio/video multimodal plumbing: real codec round trips + the
distributed feature operators vs driver-side recomputation."""

from __future__ import annotations

import numpy as np
import pytest

from s2geometry_spark.kernels import png as PNG
from s2geometry_spark.kernels import video as VID
from s2geometry_spark.kernels import wav as WAV
from s2geometry_spark.sources.media import (
    audio_row_record,
    video_row_record,
)


class TestWavCodec:
    def test_round_trip(self):
        rng = np.random.default_rng(1)
        pcm = rng.integers(-32768, 32767, 777, dtype=np.int16)
        data = WAV.encode_wav(pcm, 16000)
        out, sr = WAV.decode_wav(data)
        assert sr == 16000
        assert np.array_equal(out, pcm)

    def test_header_is_canonical_riff(self):
        data = WAV.encode_wav(np.zeros(4, np.int16), 8000)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        assert len(data) == 44 + 8

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            WAV.decode_wav(b"not a wav at all....")

    def test_dominant_frequency_matches_synthesis(self):
        """The synthetic rows put most energy at f1; the rfft argmax
        bin must land within one bin of it."""
        for i in range(20):
            rec = audio_row_record(i)
            samples, sr = WAV.decode_wav(rec["bytes"])
            f = WAV.audio_features(samples, sr)
            hz = f["dom_freq_bin"] * sr / f["n_samples"]
            # reconstruct the row's f1 exactly as the generator does
            from s2geometry_spark.sources.images import _mix64

            seed = int(_mix64(np.array([i], dtype=np.uint64))[0])
            f1 = 50 + (seed >> 8) % 900
            bin_width = sr / f["n_samples"]
            assert abs(hz - f1) <= bin_width


class TestVideoContainer:
    def test_round_trip_all_frames(self):
        rec = video_row_record(3)
        data = rec["bytes"]
        fps, n_frames, offsets, start = VID.video_header(data)
        assert fps == rec["fps"] and n_frames == rec["n_frames"]
        for k in range(n_frames):
            frame = VID.extract_frame(data, k)
            assert frame.shape == (rec["h"], rec["w"], 3)

    def test_byte_range_extraction_is_local(self):
        """Extracting frame k must not need bytes of other frames:
        decode from a buffer where all other frame payloads are
        zeroed."""
        rec = video_row_record(5)
        data = bytearray(rec["bytes"])
        fps, n_frames, offsets, start = VID.video_header(bytes(data))
        k = 2
        want = VID.extract_frame(rec["bytes"], k)
        for j in range(n_frames):
            if j != k:
                for b in range(start + offsets[j], start + offsets[j + 1]):
                    data[b] = 0
        got = PNG.decode_png(
            bytes(data[start + offsets[k] : start + offsets[k + 1]])
        )
        assert np.array_equal(got, want)

    def test_frame_index_errors(self):
        rec = video_row_record(1)
        with pytest.raises(IndexError):
            VID.extract_frame(rec["bytes"], rec["n_frames"])
        with pytest.raises(ValueError):
            VID.video_header(b"XXXX" + rec["bytes"][4:])


class TestDistributedMediaOps:
    def test_audio_features_match_driver(self, spark):
        from s2geometry_spark.kernels import wav as WAV
        from s2geometry_spark.operators import media_ops as MED
        from s2geometry_spark.sources import media as M

        n = 60
        got = {
            r["audio_id"]: r.asDict()
            for r in MED.extract_audio_features(
                M.audio_table(spark, n)
            ).collect()
        }
        assert len(got) == n
        for i in range(n):
            rec = audio_row_record(i)
            samples, sr = WAV.decode_wav(rec["bytes"])
            want = WAV.audio_features(samples, sr)
            g = got[rec["audio_id"]]
            for k in (
                "n_samples", "sum_sq", "sum_abs", "peak",
                "zero_crossings", "dom_freq_bin",
            ):
                assert g[k] == want[k], (i, k)

    def test_video_frame_stats_match_driver(self, spark):
        from s2geometry_spark.operators import media_ops as MED
        from s2geometry_spark.sources import media as M

        n, every = 40, 2
        got = {
            (r["video_id"], r["frame_idx"]): r.asDict()
            for r in MED.sample_video_frames(
                M.video_table(spark, n), every
            ).collect()
        }
        total = 0
        for i in range(n):
            rec = video_row_record(i)
            data = rec["bytes"]
            fps, n_frames, offsets, start = VID.video_header(data)
            for k in range(0, n_frames, every):
                total += 1
                payload = data[
                    start + offsets[k] : start + offsets[k + 1]
                ]
                rgb = PNG.decode_png(payload)
                g = got[(rec["video_id"], k)]
                assert g["sum_r"] == int(rgb[:, :, 0].sum())
                assert g["frame_fnv"] == PNG.fnv1a64(payload)
                assert g["ts_ms"] == (k * 1000) // fps
        assert len(got) == total


class TestDegenerateMedia:
    def test_zero_frame_batch_yields_empty_frame(self, spark):
        """A batch whose clips all have zero frames must produce an
        empty result, not a KeyError on the column-less DataFrame."""
        from s2geometry_spark.operators import media_ops as MED

        empty_clip = VID.mux_video([], fps=4)
        df = spark.createDataFrame(
            [("v0", bytearray(empty_clip))], "video_id string, bytes binary"
        )
        assert MED.sample_video_frames(df).count() == 0

    def test_fps_zero_clamped_not_division_error(self, spark):
        from s2geometry_spark.operators import media_ops as MED

        frame = np.zeros((2, 2, 3), dtype=np.uint8)
        clip = VID.mux_video([frame, frame], fps=0)
        rows = (
            MED.sample_video_frames(df := spark.createDataFrame(
                [("v0", bytearray(clip))], "video_id string, bytes binary"
            ), every=1)
            .orderBy("frame_idx")
            .collect()
        )
        assert [r.frame_idx for r in rows] == [0, 1]
        assert all(r.ts_ms >= 0 for r in rows)
