"""Tiny stdlib PNG ENCODER — the vendored fixture generator for the
real-decode tests (VERDICT r9 #8: both decode branches must run in
this Pillow-less container). Forward-applies any of the five PNG
scanline filters so the decoder's unfiltering is testable per type."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_bytes(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode an (H, W, C) uint8 array (C in 1/2/3/4) as a PNG, using
    per-row filter types from ``filters`` (default all 0)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            else:
                raise ValueError(f"bad filter {f}")
            enc[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
