"""Minimal RGB8 PNG codec (pure numpy + zlib) + a deterministic fake
lossy codec.

The sandbox has no image libraries, so the engine carries its own
codec for the image-payload invariants (BASELINE input_hint: decoded
pixels allclose / PSNR>=40dB for lossy, captions byte-equal):

- ``encode_png`` / ``decode_png``: real, spec-conformant PNG
  (signature, IHDR/IDAT/IEND, zlib, filter 0 per scanline; decoder
  additionally unfilters Sub/Up/Average/Paeth).  Lossless round trip.
- ``encode_fake_jpeg`` / ``decode_fake_jpeg``: CODEC STUB standing in
  for a JPEG library — deterministic quantization (pixel & ~3) wrapped
  in a PNG container with a marker chunk.  It is *honestly lossy*
  (PSNR ~= 48dB > 40dB) so the PSNR gate is exercised for real, and
  byte-deterministic so tests are stable.  Swap with a real JPEG codec
  by replacing these two functions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(rgb: np.ndarray) -> bytes:
    """rgb: (h, w, 3) uint8 -> PNG bytes (filter 0, RGB8)."""
    assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((line + prev) & 255).astype(np.uint8)
        else:  # Sub / Average / Paeth need left neighbor: per-pixel scan
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (line[i] + left) & 255
                elif ftype == 3:
                    cur[i] = (line[i] + ((left + up) >> 1)) & 255
                elif ftype == 4:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    cur[i] = (line[i] + pred) & 255
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
            out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  RGB8 non-interlaced only."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant (RGB8 only)")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _unfilter(raw, h, w, 3)[:, : w * 3].reshape(h, w, 3)


_FAKE_JPEG_MARK = b"fakJ"


def encode_fake_jpeg(rgb: np.ndarray) -> bytes:
    """CODEC STUB (no JPEG lib in this environment): deterministic
    quantization to multiples of 4 (~48dB PSNR) in a marked PNG
    container."""
    q = (rgb & 0xFC).astype(np.uint8)
    png = encode_png(q)
    # insert a private ancillary chunk before IEND as a format marker
    iend = _chunk(b"IEND", b"")
    return png[: -len(iend)] + _chunk(_FAKE_JPEG_MARK, b"v1") + iend


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if _FAKE_JPEG_MARK not in data:
        raise ValueError("not a fake-jpeg payload")
    return decode_png(data)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_fake_jpeg(data)
    raise NotImplementedError(f"codec for fmt={fmt!r} not available here")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(data: bytes) -> int:
    """Fast deterministic 64-bit content fingerprint (two crc32 passes,
    C-speed) as signed int64 bits — the `phash` column."""
    lo = zlib.crc32(data) & 0xFFFFFFFF
    hi = zlib.crc32(data[::-1]) & 0xFFFFFFFF
    h = (hi << 32) | lo
    return h - (1 << 64) if h >= (1 << 63) else h


def fnv1a64(data: bytes) -> int:
    """64-bit FNV-1a, returned as signed int64 bits (phash column)."""
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h
