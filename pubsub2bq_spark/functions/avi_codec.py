"""Pure-stdlib AVI (RIFF) codec for the multimodal video verbs.

AVI is a RIFF container (public spec: the MSDN "AVI RIFF File
Reference" / OpenDML AVI extensions), so — like WAV — a minimal honest
subset is decodable with ``struct`` alone:

* :func:`encode_avi` — grayscale frames written as uncompressed 8-bit
  DIB ('00db' chunks) inside the standard LIST hdrl (avih + strl with
  strh/strf BITMAPINFOHEADER) + LIST movi layout.
* :func:`decode_avi` — walks the RIFF chunk tree, reads the declared
  dimensions from strf, collects the '00db'/'00dc' movi chunks, and
  reconstructs each frame from its bottom-up, 4-byte-row-aligned DIB
  pixel data. Rejects compressed streams and non-8-bit formats loudly.

Together with png_codec (image) and wav_codec (audio) this completes a
real stdlib decode path for all three U8 media families; only formats
with genuinely unavailable codecs (JPEG/mp3/H.264) stay behind the
NotImplementedError gate.
"""

from __future__ import annotations

import struct

import numpy as np

FPS = 10  # nominal frame rate written into avih/strh


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def _dib_rows(frame: np.ndarray) -> bytes:
    """Bottom-up, 4-byte-aligned 8-bit rows (the DIB on-disk layout)."""
    h, w = frame.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = frame
    return rows[::-1].tobytes()  # DIBs store the BOTTOM row first


def encode_avi(frames: list[np.ndarray]) -> bytes:
    """Encode 8-bit grayscale frames (equal (h, w) uint8 arrays) into a
    minimal standard AVI: hdrl(avih, strl(strh, strf+palette)) +
    movi('00db' uncompressed DIB frames)."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    stride = (w + 3) & ~3
    frame_bytes = stride * h
    # avih: MainAVIHeader (microsec/frame, rates, flags, totalframes, ...)
    avih = struct.pack(
        "<10I",
        1_000_000 // FPS, frame_bytes * FPS, 0, 0x10,  # AVIF_HASINDEX unset; 0x10=WASCAPTUREFILE not needed but harmless
        len(frames), 0, 1, frame_bytes, w, h,
    ) + b"\x00" * 16  # dwReserved[4]
    # strh: AVIStreamHeader for a 'vids' stream, codec DIB (uncompressed)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, FPS, 0, len(frames),
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER (8-bit => a 256-entry grayscale palette follows)
    bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_bytes, 0, 0, 256, 0)
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", bih + palette))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"".join(_chunk(b"00db", _dib_rows(f)) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode AVI bytes → ``(width, height, frames)`` with each frame an
    (h, w) uint8 array. Supports the subset :func:`encode_avi` writes —
    single uncompressed 8-bit 'vids' stream — and raises ``ValueError``
    for anything else (compressed fourccs, multi-stream, non-8-bit)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + length > end:
                raise ValueError("truncated AVI chunk")
            yield tag, body_start, length
            pos = body_start + length + (length % 2)

    width = height = bits = None
    compression = None
    frames_raw: list[bytes] = []
    for tag, start, length in walk(data, 12, len(data)):
        if tag != b"LIST":
            continue
        kind = data[start : start + 4]
        if kind == b"hdrl":
            for t2, s2, l2 in walk(data, start + 4, start + length):
                if t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for t3, s3, l3 in walk(data, s2 + 4, s2 + l2):
                        if t3 == b"strf" and l3 >= 20:
                            # BITMAPINFOHEADER prefix: size, width,
                            # height, planes, bitcount, compression
                            (_sz, width, height, _planes, bits,
                             compression) = struct.unpack(
                                "<IiiHHI", data[s3 : s3 + 20]
                            )
        elif kind == b"movi":
            for t2, s2, l2 in walk(data, start + 4, start + length):
                if t2 in (b"00db", b"00dc"):
                    frames_raw.append(data[s2 : s2 + l2])
    if width is None or height is None:
        raise ValueError("AVI missing strf header")
    if bits != 8 or (compression not in (0, None)):
        raise ValueError(
            f"unsupported AVI variant (bits={bits}, compression={compression})"
        )
    stride = (width + 3) & ~3
    frames = []
    for raw in frames_raw:
        if len(raw) != stride * height:
            raise ValueError("AVI frame payload has wrong size")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
        frames.append(rows[::-1, :width].copy())  # bottom-up -> top-down
    return width, height, frames
