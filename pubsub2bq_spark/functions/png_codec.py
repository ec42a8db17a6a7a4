"""Pure-stdlib PNG codec (zlib + struct + numpy) for the multimodal verbs.

The container ships no image libraries, but PNG itself is decodable with
nothing beyond ``zlib`` (RFC 1950/1951 inflate) and ``struct`` — the
format is public (RFC 2083 / W3C PNG spec). This module implements the
minimal honest subset the engine needs:

* :func:`encode_png` — 8-bit grayscale/RGB/RGBA, filter 0 scanlines,
  one IDAT chunk. Used by fixtures and by the multimodal operators to
  synthesize *real* image payloads from the text tables.
* :func:`decode_png` — parses the signature, IHDR, concatenated IDAT,
  inflates, and reverses all five scanline filters (None/Sub/Up/
  Average/Paeth) per the spec. Rejects interlaced / non-8-bit /
  palette images loudly rather than mis-decoding them.
* :func:`resize_nearest` — aspect-agnostic nearest-neighbor resample
  (vectorized index gather), the standard cheap kernel for thumbnail
  plans.

Everything is numpy-vectorized per image; inside an Arrow batch the
per-row Python overhead is one function call, matching the engine's
"Python only in batched kernels" rule (SURVEY.md §6).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color_type -> samples per pixel (8-bit only)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, compress_level: int = 1) -> bytes:
    """Encode an 8-bit image to PNG bytes.

    ``pixels``: uint8 array of shape (h, w) [grayscale], (h, w, 3) [RGB]
    or (h, w, 4) [RGBA]. Scanlines use filter 0 (None) — simple and
    deterministic; zlib still removes the bulk of the redundancy.
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # Prepend the filter byte (0) to every scanline, then deflate.
    raw = np.empty((h, w * ch + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth_row(cur: np.ndarray, prev: np.ndarray, ch: int) -> None:
    """Reverse Paeth filter in place (sequential in x, vectorized in ch)."""
    w = cur.shape[0] // ch
    cur2 = cur.reshape(w, ch).astype(np.int32)
    prev2 = prev.reshape(w, ch).astype(np.int32)
    left = np.zeros(ch, dtype=np.int32)
    for x in range(w):
        up = prev2[x]
        ul = prev2[x - 1] if x else np.zeros(ch, dtype=np.int32)
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        left = (cur2[x] + pred) & 0xFF
        cur2[x] = left
    cur[:] = cur2.reshape(-1).astype(np.uint8)


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode PNG bytes → ``(width, height, channels, pixels)``.

    ``pixels`` is uint8 of shape (h, w, channels). Supports 8-bit
    grayscale / RGB / RGBA, non-interlaced, all five scanline filters.
    Raises ``ValueError`` for anything else (bad signature, palette,
    16-bit, Adam7) — mis-decoding silently would be worse than failing.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch + 1
    if raw.size != h * stride:
        raise ValueError("PNG pixel payload has wrong size")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].astype(np.int32).copy()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = out[y]
        if f == 0:
            pass
        elif f == 1:  # Sub: add reconstructed left neighbor
            cur2 = cur.reshape(w, ch)
            for x in range(1, w):
                cur2[x] = (cur2[x] + cur2[x - 1]) & 0xFF
        elif f == 2:  # Up
            cur += prev
            cur &= 0xFF
        elif f == 3:  # Average
            cur2 = cur.reshape(w, ch)
            prev2 = prev.reshape(w, ch).astype(np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                left = (cur2[x] + ((left + prev2[x]) >> 1)) & 0xFF
                cur2[x] = left
        elif f == 4:  # Paeth
            u8 = cur.astype(np.uint8)
            _paeth_row(u8, prev, ch)
            cur[:] = u8
        else:
            raise ValueError(f"bad PNG filter type {f}")
        prev = out[y].astype(np.uint8)
    return w, h, ch, out.astype(np.uint8).reshape(h, w, ch)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w[, ch]) uint8 pixels.

    Source index for output x is ``x * w // out_w`` (the exact floor
    mapping, so oracles can restate it in integer SQL when needed).
    """
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return pixels[ys][:, xs]
