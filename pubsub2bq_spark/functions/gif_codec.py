"""Pure-stdlib GIF (87a/89a) codec for the multimodal image/video verbs.

GIF is fully algorithmic — variable-width LZW over palette indices,
no empirical tables — so an exact stdlib implementation is possible
and every claim is verifiable by round trip (the format is lossless):

* :func:`encode_gif` — GIF89a writer: logical screen descriptor with a
  global color table, per-frame Graphic Control Extensions, and each
  frame's indices LZW-compressed into an Image Descriptor. Animated
  streams use disposal method 1 (do not dispose) and encode only the
  DIRTY RECTANGLE that changed against the previous canvas — the
  standard GIF optimization, and genuine inter-frame coding: the
  decoder composites each sub-rectangle over its persistent canvas.
* :func:`decode_gif` — block-structured parser (header, LSD, GCE,
  image descriptors, trailer), LZW decompression with variable code
  width, CLEAR/EOI handling and 12-bit table growth, optional
  interlace reordering, and canvas compositing per frame.

The reference pipeline ships PNG screenshots only
(j-f-oleary-bigdata/pubsub2bq images/*.png); GIF belongs to the
engine's north-star multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIG = b"GIF89a"


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF variable-width LZW: code width starts at min_code_size+1,
    grows after the table fills a width, CLEAR resets at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    prefix = b""
    for v in indices.reshape(-1):
        nxt = prefix + bytes((int(v),))
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes((i,)): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
        prefix = bytes((int(v),))
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode` (also accepts streams from other
    conforming encoders: deferred clears, early EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    acc = 0
    nbits = 0
    pos = 0

    def read(w: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < w:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << w) - 1)
        acc >>= w
        nbits -= w
        return v

    out = np.empty(n_expected, dtype=np.uint8)
    n = 0
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes((i,)) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        if n + len(entry) > n_expected:
            raise ValueError("gif: LZW output exceeds frame size")
        out[n : n + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n != n_expected:
        raise ValueError("gif: LZW output short of frame size")
    return out


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes in GIF's 255-byte sub-block framing."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order of the GIF 4-pass interlace."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def encode_gif(frames: list[np.ndarray], interlace: bool = False) -> bytes:
    """Encode 8-bit grayscale frames as GIF89a with a 256-entry
    grayscale global color table (palette index == gray value, so
    oracles can sum indices). Frame 0 covers the full screen; each
    later frame encodes only the DIRTY RECTANGLE that changed against
    the previous canvas under disposal method 1 (do not dispose) —
    unchanged pixels are never re-coded, the decoder keeps them on its
    canvas."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    out = bytearray()
    out += GIF_SIG
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    prev: np.ndarray | None = None
    for f in frames:
        f = np.ascontiguousarray(f, dtype=np.uint8)
        if prev is None:
            x0 = y0 = 0
            rect = f
        else:
            diff = f != prev
            if not diff.any():
                x0 = y0 = 0
                rect = f[:1, :1]  # 1×1 no-op rect (frame must exist)
            else:
                rs = np.flatnonzero(diff.any(axis=1))
                cs = np.flatnonzero(diff.any(axis=0))
                y0, y1 = int(rs[0]), int(rs[-1]) + 1
                x0, x1 = int(cs[0]), int(cs[-1]) + 1
                rect = f[y0:y1, x0:x1]
        # Graphic Control Extension: disposal 1 (do not dispose)
        out += b"\x21\xf9\x04" + bytes((1 << 2,)) + struct.pack("<H", 4) + b"\x00\x00"
        rh, rw = rect.shape
        flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", x0, y0, rw, rh, flags)
        body = rect[_interlace_order(rh)] if interlace else rect
        out += bytes((8,))  # LZW minimum code size
        out += _sub_blocks(_lzw_encode(body, 8))
        prev = f
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode GIF bytes → ``(width, height, frames)``, each frame the
    full (h, w) canvas of palette indices after compositing that
    image's (possibly sub-rectangle, possibly interlaced) data per its
    disposal method. Supports disposal 0/1 (keep) and 2 (restore to
    background). Raises ``ValueError`` on malformed streams."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("gif: bad signature")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    canvas = np.zeros((h, w), dtype=np.uint8)
    frames: list[np.ndarray] = []
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # GCE
                disposal = (data[pos + 1] >> 2) & 0x07
            while data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            x0, y0, rw, rh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if x0 + rw > w or y0 + rh > h:
                raise ValueError("gif: image rect outside logical screen")
            if iflags & 0x80:  # local color table
                pos += 3 * (2 << (iflags & 0x07))
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            rect = _lzw_decode(bytes(lzw), mcs, rw * rh).reshape(rh, rw)
            if iflags & 0x40:  # interlaced: undo the 4-pass order
                de = np.empty_like(rect)
                de[_interlace_order(rh)] = rect
                rect = de
            canvas[y0 : y0 + rh, x0 : x0 + rw] = rect
            frames.append(canvas.copy())
            if disposal == 2:  # restore rect to background color
                canvas[y0 : y0 + rh, x0 : x0 + rw] = bg
            disposal = 0
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("gif: no image data")
    return w, h, frames
