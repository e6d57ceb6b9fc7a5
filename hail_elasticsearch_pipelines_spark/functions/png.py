"""Pure-stdlib PNG codec (zlib + struct + numpy) for the multimodal
operators.

The container has no media libraries (PIL/av), but PNG's format is
simple enough to decode for real from the standard library: zlib
inflate + per-scanline unfiltering.  This turns the multimodal
``decode`` step from a declared stub into a real decoder for the most
common lossless web image format, while PIL (when present) remains the
preferred path and the deterministic fake stays as the last-resort
fallback (multimodal.py) so the driver's value oracles — whose
synthetic payloads are not PNGs — are untouched.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced, all five filter types.  Unsupported shapes
raise ValueError (palette, 16-bit, interlaced) — callers fall back.

Scale posture: decode is per-row work inside Arrow-batched
mapInPandas; rows are independent, so the operator scales with
partition count like any other UDF stage.  The unfilter loop is
per-scanline numpy (vectorized across the row's pixels); Paeth/Up/Sub
carry a scanline dependency by spec, so the loop is irreducible
without losing exactness.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _PNG_SIG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Raises ValueError on non-PNG or unsupported PNG shapes."""
    if not is_png(payload):
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int16)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = lines[y]
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: cur[x] = line[x] + cur[x-ch] → per-channel
            # prefix sum mod 256 (vectorized; no scanline loop)
            cur = (
                line.reshape(width, ch).cumsum(axis=0, dtype=np.int64) % 256
            ).reshape(stride).astype(np.int16)
        elif f == 2:  # Up
            cur = line + prev
        elif f == 3:  # Average — left term is sequential by spec
            cur = np.empty(stride, np.int16)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — left-dependent, per-pixel by spec
            cur = np.empty(stride, np.int16)
            upleft = np.zeros(stride, np.int16)
            upleft[ch:] = prev[:-ch]
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b, c = int(prev[x]), int(upleft[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = (cur & 0xFF).astype(np.uint8)
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, {1,2,3,4}) → PNG bytes (filter 0,
    one zlib stream).  Deterministic: fixed zlib level, no ancillary
    chunks — identical input arrays give identical bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize: source index =
    (dst * src) // dst_size (pure integer map, no float rounding
    drift)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[ys][:, xs]
