"""Minimal PNG encode/decode — pure stdlib (zlib + struct).

PNG here is NOT a stubbed codec: the format's only compression is
DEFLATE, which the standard library provides, so 8-bit grayscale
tiles can be written and read spec-correctly without any imaging
library. Used by the raster tile pyramid (operators/raster.py) to
emit real `tile_type=png` PMTiles. Scope: 8-bit grayscale ("L"),
filter type 0 on every row — enough for density rasters; anything
fancier belongs to a real imaging dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png_encode(arr: np.ndarray, color_type: int) -> bytes:
    """Shared writer (mirrors _png_decode): filter 0 rows, fixed zlib
    level 6 — byte-deterministic for a given array."""
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    idat = zlib.compress(raw, 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(
        b"IEND", b""
    )


def png_encode_gray(arr: np.ndarray) -> bytes:
    """8-bit grayscale PNG (color type 0)."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("expected a 2-D uint8 array")
    return _png_encode(arr, color_type=0)


def png_encode_rgb(arr: np.ndarray) -> bytes:
    """8-bit truecolor (RGB) PNG (color type 2)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected a (h, w, 3) uint8 array")
    return _png_encode(arr, color_type=2)


def _png_decode(data: bytes, want_color: int) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    i = 8
    w = h = None
    idat = b""
    while i < len(data):
        (ln,) = struct.unpack_from(">I", data, i)
        typ = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + ln]
        i += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color, *_ = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != want_color:
                raise ValueError(
                    f"only 8-bit color-type-{want_color} supported here"
                )
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
    raw = zlib.decompress(idat)
    ch = 3 if want_color == 2 else 1
    stride = w * ch + 1
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        if line[0] != 0:
            raise ValueError("only filter type 0 supported")
        rows.append(np.frombuffer(line[1:], dtype=np.uint8))
    out = np.stack(rows)
    return out.reshape(h, w, 3) if ch == 3 else out


def png_decode_gray(data: bytes) -> np.ndarray:
    """Inverse of png_encode_gray (filter-0 grayscale only)."""
    return _png_decode(data, want_color=0)


def png_decode_rgb(data: bytes) -> np.ndarray:
    """Inverse of png_encode_rgb (filter-0 truecolor only)."""
    return _png_decode(data, want_color=2)
