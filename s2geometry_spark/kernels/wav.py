"""RIFF/WAVE PCM16 codec + audio feature kernels, pure numpy.

The engine treats audio as an opaque binary column with typed
metadata (BASELINE input_hint / multimodal pipeline pattern); this
module makes the decode REAL rather than stubbed: canonical 44-byte
RIFF/WAVE headers with little-endian PCM16 mono payloads are fully
parseable with numpy alone, so no external audio library is needed.

Feature kernels favor exact-integer forms (sum of squares,
zero-crossing counts, peak) so distributed results hash-match a
driver-side oracle bit for bit; the FFT-based dominant-frequency bin
is integer-valued as well (argmax index).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM16 WAV bytes (canonical 44-byte header)."""
    pcm = np.asarray(samples, dtype="<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * 2
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16),
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 sample array, sample_rate).  Walks RIFF
    chunks, so non-canonical extra chunks are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt, channels, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
            sample_rate = sr
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Exact-integer audio features of a PCM16 buffer.

    sum_sq / sum_abs / peak / zero_crossings are exact int64 sums;
    dom_freq_bin is the argmax rfft power bin (excluding DC), an
    integer that both sides compute identically."""
    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    sum_sq = int((s * s).sum())
    sum_abs = int(np.abs(s).sum())
    peak = int(np.abs(s).max()) if n else 0
    zc = int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if n > 1 else 0
    if n >= 8:
        spec = np.abs(np.fft.rfft(s.astype(np.float64)))
        dom = int(np.argmax(spec[1:]) + 1)
    else:
        dom = 0
    return {
        "n_samples": n,
        "sample_rate": sample_rate,
        "duration_ms": (n * 1000) // max(sample_rate, 1),
        "sum_sq": sum_sq,
        "sum_abs": sum_abs,
        "peak": peak,
        "zero_crossings": zc,
        "dom_freq_bin": dom,
    }
