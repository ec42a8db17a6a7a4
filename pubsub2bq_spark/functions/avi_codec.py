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


# 'MJPG' as the little-endian biCompression DWORD (the registered
# Motion-JPEG fourcc).
MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi(frames: list[np.ndarray], mjpeg: bool = False) -> bytes:
    """Encode 8-bit grayscale frames (equal (h, w) uint8 arrays) into a
    minimal standard AVI: hdrl(avih, strl(strh, strf+palette)) +
    movi('00db' uncompressed DIB frames). With ``mjpeg=True`` the
    stream is Motion-JPEG instead: fourcc/biCompression 'MJPG' and each
    frame written as a self-contained baseline JPEG in a '00dc'
    (compressed) chunk — the standard MJPEG-in-AVI layout, every frame
    independently decodable (functions/jpeg_codec.py does the real
    entropy coding)."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    if mjpeg:
        from pubsub2bq_spark.functions.jpeg_codec import encode_jpeg_gray

        payloads = [encode_jpeg_gray(f, quant=8) for f in frames]
        return _assemble_avi(
            w, h, [(b"00dc", p) for p in payloads],
            fourcc=b"MJPG", compression=MJPG_FOURCC,
            frame_bytes=max(len(p) for p in payloads),
        )
    stride = (w + 3) & ~3
    return _assemble_avi(
        w, h, [(b"00db", _dib_rows(f)) for f in frames],
        fourcc=b"DIB ", compression=0, frame_bytes=stride * h,
    )


def _assemble_avi(w: int, h: int, chunks: list[tuple[bytes, bytes]],
                  fourcc: bytes, compression: int,
                  frame_bytes: int) -> bytes:
    """Wrap per-frame chunks in the standard AVI container layout:
    hdrl(avih, strl(strh, strf[+palette])) + movi. Shared by the
    uncompressed-DIB and MJPEG writers — only fourcc/biCompression,
    chunk tags and frame payloads differ."""
    n_frames = len(chunks)
    # avih: MainAVIHeader (microsec/frame, rates, flags, totalframes, ...)
    avih = struct.pack(
        "<10I",
        1_000_000 // FPS, frame_bytes * FPS, 0, 0x10,  # AVIF_HASINDEX unset; 0x10=WASCAPTUREFILE not needed but harmless
        n_frames, 0, 1, frame_bytes, w, h,
    ) + b"\x00" * 16  # dwReserved[4]
    # strh: AVIStreamHeader for a 'vids' stream
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", fourcc, 0, 0, 0, 0, 1, FPS, 0, n_frames,
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER (uncompressed 8-bit carries a 256-entry
    # grayscale palette; MJPEG streams carry none — biClrUsed 0)
    pal = compression == 0
    bih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, compression, frame_bytes,
        0, 0, 256 if pal else 0, 0,
    )
    palette = (
        b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
        if pal else b""
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", bih + palette))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi = _list(b"movi", b"".join(_chunk(tag, body) for tag, body in chunks))
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
    if compression == MJPG_FOURCC:
        # Motion-JPEG: every '00dc' chunk is a self-contained baseline
        # JPEG — decode each with the real stdlib codec and pin its
        # dimensions to the container header (a stream whose frames
        # disagree with strf is corrupt, not "close enough").
        from pubsub2bq_spark.functions.jpeg_codec import decode_jpeg

        frames = []
        for raw in frames_raw:
            fw, fh, _ch, px = decode_jpeg(bytes(raw))
            if (fw, fh) != (width, height):
                raise ValueError(
                    f"MJPEG frame dims {(fw, fh)} disagree with strf "
                    f"{(width, height)}"
                )
            frames.append(px[:, :, 0] if px.shape[2] == 1 else px)
        return width, height, frames
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
