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
    if compression == BI_RLE8:
        # Microsoft RLE8: opcodes mutate a PERSISTENT canvas — skipped
        # pixels keep the previous frame's contents (inter-frame
        # coding), so frames must decode in stream order.
        if bits != 8:
            raise ValueError("RLE8 streams must be 8-bit")
        canvas = np.zeros((height, width), dtype=np.uint8)
        frames = []
        for raw in frames_raw:
            _rle_decode_frame(bytes(raw), canvas)
            frames.append(canvas.copy())
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


# Microsoft RLE8 (BI_RLE8 = 1 in BITMAPINFOHEADER biCompression; public
# spec: the Windows GDI "Bitmap Compression" reference / MS-WMF §2.1.1.7).
# In AVI this is the classic 'MRLE' codec — the skip opcodes (end-of-line,
# delta) leave destination pixels UNTOUCHED, which in a video stream means
# "keep the previous frame's pixels": real inter-frame coding.
BI_RLE8 = 1
MRLE_FOURCC = b"MRLE"


def _rle_encode_literal(seg: np.ndarray) -> bytes:
    """Opcodes for a changed pixel segment: encoded runs (count, value)
    for repeats ≥ 3, absolute mode (00 count literals, word-padded) for
    literal stretches ≥ 3, count-1/2 runs for the remainder.

    Scalar run walk (r14): segments are row-bounded and usually short,
    where a plain loop over the bytes beats the three numpy calls the
    old run-boundary pass cost per segment."""
    data = np.ascontiguousarray(seg).tobytes()
    m = len(data)
    ops = bytearray()
    if m == 0:
        return bytes(ops)
    v0 = data[0]
    if m >= 3 and data.count(v0) == m:
        # constant segment (the synth frames' dominant shape, r15):
        # pure encoded runs, no per-byte walk
        run = m
        while run > 0:
            c = min(run, 255)
            ops.append(c)
            ops.append(v0)
            run -= c
        return bytes(ops)
    runs: list[tuple[int, int]] = []  # (value, length)
    prev_v = data[0]
    cnt = 1
    for b in data[1:]:
        if b == prev_v:
            cnt += 1
        else:
            runs.append((prev_v, cnt))
            prev_v = b
            cnt = 1
    runs.append((prev_v, cnt))
    i = 0
    pos = 0  # byte offset of runs[i] within data
    n = len(runs)
    while i < n:
        v, ln = runs[i]
        if ln >= 3:
            run = ln
            while run > 0:
                c = min(run, 255)
                ops += bytes((c, v))
                run -= c
            pos += ln
            i += 1
        else:
            j = i  # literal stretch: consecutive runs < 3
            end = pos
            while j < n and runs[j][1] < 3:
                end += runs[j][1]
                j += 1
            lit = data[pos:end]
            while len(lit) >= 3:
                c = min(len(lit), 255)
                ops += bytes((0, c)) + lit[:c]
                if c % 2:
                    ops += b"\x00"  # absolute runs are word-aligned
                lit = lit[c:]
            for v2 in lit:
                ops += bytes((1, v2))
            pos = end
            i = j
    return bytes(ops)


def _rle_encode_frame(prev: np.ndarray | None, frame: np.ndarray) -> bytes:
    """RLE8 opcodes for one frame against the previous canvas: unchanged
    rows collapse into delta (00 02 0 dy) skips, unchanged pixel gaps
    inside a row into delta (00 02 dx 0), changed segments into
    runs/absolute mode. Rows are emitted bottom-up (the DIB layout)."""
    h, w = frame.shape
    ops = bytearray()
    pending = 0
    if prev is not None:
        # ONE frame-wide nonzero finds every changed pixel (r14: the
        # per-row flatnonzero/diff calls were most of the encoder);
        # per-row segments then come from a plain walk over the (few)
        # changed columns.
        ys, xs = np.nonzero(frame != prev)
        bounds = np.searchsorted(ys, np.arange(h + 1)).tolist()
        xs_l = xs.tolist()
    for r in range(h):  # r = 0 is the BOTTOM row
        row = frame[h - 1 - r]
        if prev is None:
            segs = [(0, w)] if w else []
        else:
            actual = h - 1 - r
            lo, hi = bounds[actual], bounds[actual + 1]
            if lo == hi:
                pending += 1
                continue
            cols = xs_l[lo:hi]
            segs = []
            s = p = cols[0]
            for c in cols[1:]:
                if c > p + 1:
                    segs.append((s, p + 1))
                    s = c
                p = c
            segs.append((s, p + 1))
        while pending > 0:
            dy = min(pending, 255)
            ops += bytes((0, 2, 0, dy))
            pending -= dy
        x = 0
        for s, e in segs:
            dx = s - x
            while dx > 0:  # unchanged gap → delta skip
                step = min(dx, 255)
                ops += bytes((0, 2, step, 0))
                dx -= step
            ops += _rle_encode_literal(row[s:e])
            x = e
        ops += bytes((0, 0))  # end of line (rest of row unchanged)
    ops += bytes((0, 1))  # end of bitmap
    return bytes(ops)


def encode_avi_rle(frames: list[np.ndarray]) -> bytes:
    """Encode 8-bit grayscale frames as Microsoft-RLE8 AVI ('MRLE'
    fourcc, biCompression 1): frame 0 is a keyframe (every row coded),
    later frames code only pixels that changed — unchanged regions are
    skipped with EOL/delta opcodes and therefore RETAINED from the
    previous frame by the decoder. The first real inter-frame video
    codec in the family."""
    if not frames:
        raise ValueError("encode_avi_rle needs at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    chunks = []
    prev: np.ndarray | None = None
    for f in frames:
        f = np.ascontiguousarray(f, dtype=np.uint8)
        chunks.append((b"00dc", _rle_encode_frame(prev, f)))
        prev = f
    return _assemble_avi(
        w, h, chunks, fourcc=MRLE_FOURCC, compression=BI_RLE8,
        frame_bytes=max(len(body) for _tag, body in chunks),
    )


def _rle_decode_frame(data: bytes, canvas: np.ndarray) -> None:
    """Apply one RLE8 frame's opcodes to the persistent canvas in
    place. Position (x, y) starts at the bottom-left; skipped pixels
    keep their previous contents (the inter-frame semantics). Raises
    ``ValueError`` on truncated or out-of-bounds streams."""
    h, w = canvas.shape
    pos, x, y = 0, 0, 0
    n = len(data)
    while pos + 2 <= n:
        b0, b1 = data[pos], data[pos + 1]
        pos += 2
        if b0 > 0:  # encoded run
            if y >= h or x + b0 > w:
                raise ValueError("RLE8 run out of bounds")
            canvas[h - 1 - y, x : x + b0] = b1
            x += b0
        elif b1 == 0:  # end of line
            x, y = 0, y + 1
        elif b1 == 1:  # end of bitmap
            return
        elif b1 == 2:  # delta: skip (dx, dy) keeping canvas pixels
            if pos + 2 > n:
                raise ValueError("truncated RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta out of bounds")
        else:  # absolute mode: b1 literal pixels, word-aligned
            cnt = b1
            need = cnt + (cnt % 2)
            if pos + need > n:
                raise ValueError("truncated RLE8 absolute run")
            if y >= h or x + cnt > w:
                raise ValueError("RLE8 absolute run out of bounds")
            canvas[h - 1 - y, x : x + cnt] = np.frombuffer(
                data[pos : pos + cnt], dtype=np.uint8
            )
            x += cnt
            pos += need
    raise ValueError("RLE8 stream missing end-of-bitmap")
