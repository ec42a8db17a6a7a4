"""Pure-stdlib BMP (Windows DIB file) codec.

The uncompressed BMP file format is the on-disk twin of the DIB frames
the AVI codec already handles: BITMAPFILEHEADER + BITMAPINFOHEADER +
(for 8-bit) a palette + bottom-up 4-byte-aligned rows. Supports 8-bit
grayscale-palette and 24-bit BGR, both directions; rejects RLE and
other depths loudly (MS-RLE8 *video* lives in avi_codec)."""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode (h, w) uint8 grayscale (8-bit palette) or (h, w, 3) RGB
    (24-bit, stored BGR) as an uncompressed bottom-up BMP."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        bits = 8
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = px
        palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w = px.shape[:2]
        bits = 24
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB → BGR
        palette = b""
    else:
        raise ValueError("bmp: expected (h, w) gray or (h, w, 3) RGB")
    body = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40 + len(palette)
    bih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bits, 0, len(body), 0, 0,
        256 if bits == 8 else 0, 0,
    )
    bfh = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return bfh + bih + palette + body


def decode_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an uncompressed BMP → ``(width, height, channels,
    px[h, w, ch])``. 8-bit palettized resolves through the palette
    (returned as grayscale when the palette is gray, RGB otherwise);
    24-bit BGR returns RGB. Top-down (negative height) rows handled."""
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    (off,) = struct.unpack("<I", payload[10:14])
    size, w, h, _planes, bits, comp = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if comp != 0:
        raise NotImplementedError(f"bmp: compression {comp} unsupported")
    topdown = h < 0
    h = abs(h)
    if bits == 8:
        (clr_used,) = struct.unpack("<I", payload[46:50])
        n_pal = clr_used or 256
        pal_off = 14 + size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_pal], dtype=np.uint8
        ).reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            payload[off : off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        idx = rows if topdown else rows[::-1]
        if bool(np.all(pal[:, 0] == pal[:, 1]) and np.all(pal[:, 1] == pal[:, 2])):
            return w, h, 1, pal[idx][:, :, :1].copy()
        return w, h, 3, pal[idx].copy()
    if bits == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload[off : off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        return w, h, 3, (rows if topdown else rows[::-1]).copy()
    raise NotImplementedError(f"bmp: {bits}-bit depth unsupported")
