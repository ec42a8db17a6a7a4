"""Pure-stdlib TIFF codec for the multimodal image verbs.

TIFF 6.0 (the public Adobe/Aldus spec) is the scanned-document and
scientific-imaging container: a tag-directory (IFD) over strip-chunked
sample data. Baseline grayscale TIFF is fully algorithmic, so an exact
stdlib implementation is possible:

* :func:`encode_tiff` — little-endian classic TIFF writer: IFD with
  the baseline tags, REAL multi-strip layout (RowsPerStrip 16 — the
  layout scanners emit), and a choice of uncompressed, PackBits
  (compression 32773) or LZW (compression 5) strips. TIFF LZW is the
  MSB-first variant with the "early change" (code width bumps one
  code before the table fills — the documented TIFF quirk).
* :func:`decode_tiff` — reads both byte orders (II/MM), walks the
  IFD, assembles strips, and inverts all three compressions. Loud
  rejection for tiled/multi-sample/16-bit variants.

Strips decompress independently — exactly the property that makes
TIFF splittable at strip granularity at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

ROWS_PER_STRIP = 16

COMP_NONE = 1
COMP_LZW = 5
COMP_PACKBITS = 32773


def _packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits (Apple RLE): [-127..-1] n → repeat next byte
    1-n times; [0..127] n → n+1 literal bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append((257 - run) & 0xFF)
            out.append(data[i])
            i = j + 1
            continue
        j = i  # literal stretch: until a run of >= 3 starts
        while (
            j + 1 < n
            and j - i < 127
            and not (j + 2 < n and data[j + 1] == data[j + 2] == data[j])
        ):
            j += 1
        # careful: stop literal BEFORE a 2-run that extends to 3
        lit = data[i : j + 1]
        out.append(len(lit) - 1)
        out += lit
        i = j + 1
    return bytes(out)


def _packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < n_expected:
        b = data[i]
        i += 1
        if b == 128:  # no-op
            continue
        if b > 128:
            if i >= n:
                raise ValueError("tiff: truncated PackBits run")
            out += bytes((data[i],)) * (257 - b)
            i += 1
        else:
            if i + b + 1 > n:
                raise ValueError("tiff: truncated PackBits literal")
            out += data[i : i + b + 1]
            i += b + 1
    if len(out) != n_expected:
        raise ValueError("tiff: PackBits output size mismatch")
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW: MSB-first packing, 9-bit start, ClearCode 256, EOI
    257, EARLY CHANGE (width grows at table size (1<<width) - 1).

    The string table is keyed ``(prefix_code << 8) | next_byte`` (r14:
    every dictionary state IS a code, so the bytes-concatenation keys
    were pure allocation overhead — same greedy longest-match, same
    emitted codes)."""
    CLEAR, EOI = 256, 257
    table: dict[int, int] = {}
    next_code = 258
    width = 9

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    emit(CLEAR, width)
    prefix = -1  # -1 = empty prefix
    for v in data:
        if prefix < 0:
            prefix = v
            continue
        key = (prefix << 8) | v
        nxt = table.get(key)
        if nxt is not None:
            prefix = nxt
            continue
        emit(prefix, width)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) - 1:  # early change
            if width < 12:
                width += 1
            else:
                emit(CLEAR, width)
                table = {}
                next_code = 258
                width = 9
        prefix = v
    if prefix >= 0:
        emit(prefix, width)
    emit(EOI, width)
    if nbits:
        emit(0, 8 - nbits)
    return bytes(out)


# Below this many stream bytes the scalar parse wins (r15 — same
# crossover measurement as the GIF decoder; strips here encode to a few
# hundred bytes).
_PARSE_SCALAR_MAX = 1024


def _tiff_lzw_parse_codes(data: bytes):
    """Code segments of the packed bitstream — scalar for small streams,
    numpy-chunked above _PARSE_SCALAR_MAX. Segments are plain int lists
    (scalar) or int64 ndarrays (numpy); the replay accepts both."""
    if len(data) < _PARSE_SCALAR_MAX:
        return _tiff_lzw_parse_codes_scalar(data)
    return _tiff_lzw_parse_codes_np(data)


def _tiff_lzw_parse_codes_scalar(data: bytes) -> tuple[list[list[int]], bool]:
    """Scalar twin of :func:`_tiff_lzw_parse_codes_np`: same early-change
    width schedule, same clear/EOI segmentation, same
    truncation-tolerant ``eoi_seen`` contract."""
    CLEAR, EOI = 256, 257
    segments: list[list[int]] = []
    cur: list[int] = []
    width = 9
    tsize = 258
    grown = False
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    eoi_seen = False
    while True:
        if width < 12:
            room = ((1 << width) - 2) - tsize
            c_max = room if grown else room + 1
            if c_max == 0:
                width += 1  # early change
                continue
        while nbits < width:
            if pos >= n:
                break
            acc = (acc << 8) | data[pos]  # MSB-first packing
            nbits += 8
            pos += 1
        if nbits < width:
            eoi_seen = False  # bits ran out before an EOI
            break
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == EOI:
            eoi_seen = True
            break
        if code == CLEAR:
            if cur:
                segments.append(cur)
                cur = []
            width = 9
            tsize = 258
            grown = False
            continue
        cur.append(code)
        if grown:
            tsize += 1
        grown = True
    if cur:
        segments.append(cur)
    return segments, eoi_seen


def _tiff_lzw_parse_codes_np(data: bytes) -> tuple[list[np.ndarray], bool]:
    """Extract the TIFF LZW code sequence, vectorized in chunks (r14 —
    the same technique as the GIF decoder's `_lzw_parse_codes`, adapted
    to MSB-first packing and the EARLY-CHANGE width schedule: the
    decoder-side table lags the encoder by one entry, so the width bumps
    at table size (1 << width) - 2).

    Returns one code array per clear-delimited segment. Truncation is
    NOT an error here: the scalar decoder stopped reading the moment its
    output was complete, so a stream that ends mid-code after enough
    output is legal — the replay in `_tiff_lzw_decode` raises the
    truncated-stream error only when the parsed codes run out before
    ``n_expected`` bytes exist."""
    CLEAR, EOI = 256, 257
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    nbits = bits.size

    segments: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    width = 9
    tsize = 258
    grown = False  # True once the NEXT code read will append an entry
    pos = 0
    while True:
        if width < 12:
            room = ((1 << width) - 2) - tsize
            c_max = room if grown else room + 1
            if c_max == 0:
                width += 1  # early change
                continue
        else:
            c_max = 1 << 30
        c = min(c_max, 4096, (nbits - pos) // width)
        if c <= 0:
            eoi_seen = False  # bits ran out before an EOI
            break
        offs = pos + np.arange(c, dtype=np.int64) * width
        vals = np.zeros(c, dtype=np.int64)
        for j in range(width):
            vals |= bits[offs + j].astype(np.int64) << (width - 1 - j)
        special = (vals == CLEAR) | (vals == EOI)
        k = int(np.argmax(special)) if special.any() else c
        if k:
            cur.append(vals[:k])
            tsize += k if grown else k - 1
            grown = True
            pos += width * k
            continue
        code = int(vals[0])
        pos += width
        if code == EOI:
            eoi_seen = True
            break
        # clear: flush the segment, reset table state
        if cur:
            segments.append(np.concatenate(cur))
            cur = []
        width = 9
        tsize = 258
        grown = False
    if cur:
        segments.append(np.concatenate(cur))
    return segments, eoi_seen


def _tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    """Inverse of :func:`_tiff_lzw_encode` (also accepts conforming
    foreign streams: deferred clears, missing EOI after full output).

    r14 rewrite on the GIF precedent: codes are extracted vectorized;
    the table replay exploits that every LZW entry (prev + first byte of
    current) is a CONTIGUOUS span of the already-decoded output, so the
    table is two int lists of (start, len) and each emission one
    bytearray span copy."""
    out = bytearray(n_expected)
    n = 0
    segments, eoi_seen = _tiff_lzw_parse_codes(data)
    for seg in segments:
        tb_start = [0] * 258
        tb_len = [0] * 258
        tsize = 258
        prev_start = -1
        prev_len = 0
        for code in (seg if type(seg) is list else seg.tolist()):
            if code < 256:  # root: one literal byte
                out[n] = code
                cur_start, cur_len = n, 1
                n += 1
            elif code < tsize:
                if code < 258:  # the clear/EOI placeholder slots
                    raise ValueError("tiff: LZW code out of range")
                s = tb_start[code]
                ln = tb_len[code]
                out[n : n + ln] = out[s : s + ln]
                cur_start, cur_len = n, ln
                n += ln
            elif code == tsize and prev_start >= 0:  # KwKwK
                ln = prev_len + 1
                out[n : n + prev_len] = out[prev_start : prev_start + prev_len]
                out[n + prev_len : n + ln] = out[prev_start : prev_start + 1]
                cur_start, cur_len = n, ln
                n += ln
            else:
                raise ValueError(
                    "tiff: first LZW code out of range"
                    if prev_start < 0
                    else "tiff: LZW code out of range"
                )
            if prev_start >= 0 and tsize < 4096:
                # entries past 4095 are unreachable by 12-bit codes —
                # the scalar decoder appended them unreferencably
                tb_start.append(prev_start)
                tb_len.append(prev_len + 1)
                tsize += 1
            prev_start, prev_len = cur_start, cur_len
            if n >= n_expected:
                break
        if n >= n_expected:
            break
    if n != n_expected:
        # mirror the scalar decoder's error split: running out of BITS
        # was a truncated-stream error from its bit reader; an early EOI
        # (or span overshoot) fell through to the final length check
        raise ValueError(
            "tiff: truncated LZW stream"
            if n < n_expected and not eoi_seen
            else "tiff: LZW output size mismatch"
        )
    return bytes(out)


def _entry(tag: int, typ: int, count: int, value: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value)


def encode_tiff(px: np.ndarray, compression: int = COMP_LZW) -> bytes:
    """Encode 8-bit grayscale as little-endian classic TIFF with REAL
    multi-strip layout (RowsPerStrip 16) and the chosen compression."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape
    strips = []
    for r0 in range(0, h, ROWS_PER_STRIP):
        raw = px[r0 : r0 + ROWS_PER_STRIP].tobytes()
        if compression == COMP_NONE:
            strips.append(raw)
        elif compression == COMP_PACKBITS:
            strips.append(_packbits_encode(raw))
        elif compression == COMP_LZW:
            strips.append(_tiff_lzw_encode(raw))
        else:
            raise ValueError(f"tiff: unsupported compression {compression}")
    n_strips = len(strips)

    # layout: header(8) | strip data | offset array | count array | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n_strips > 1:
        off_array_pos = pos
        pos += 4 * n_strips
        cnt_array_pos = pos
        pos += 4 * n_strips
    ifd_pos = pos

    entries = [
        _entry(256, 3, 1, w),                      # ImageWidth
        _entry(257, 3, 1, h),                      # ImageLength
        _entry(258, 3, 1, 8),                      # BitsPerSample
        _entry(259, 3, 1, compression),            # Compression
        _entry(262, 3, 1, 1),                      # Photometric: BlackIsZero
        _entry(273, 4, n_strips,
               offsets[0] if n_strips == 1 else off_array_pos),
        _entry(277, 3, 1, 1),                      # SamplesPerPixel
        _entry(278, 3, 1, ROWS_PER_STRIP),         # RowsPerStrip
        _entry(279, 4, n_strips,
               len(strips[0]) if n_strips == 1 else cnt_array_pos),
    ]
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_pos)
    for s in strips:
        out += s
    if n_strips > 1:
        for o in offsets:
            out += struct.pack("<I", o)
        for s in strips:
            out += struct.pack("<I", len(s))
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # next IFD
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline grayscale TIFF → ``(width, height, px[h, w])``.
    Handles both byte orders, multi-strip assembly and compressions
    1 / 5 / 32773; rejects tiled, multi-sample and non-8-bit variants."""
    if payload[:4] == b"II*\x00":
        end = "<"
    elif payload[:4] == b"MM\x00*":
        end = ">"
    else:
        raise ValueError("tiff: bad magic")
    (ifd_pos,) = struct.unpack(end + "I", payload[4:8])
    (n_entries,) = struct.unpack(end + "H", payload[ifd_pos : ifd_pos + 2])
    tags: dict[int, tuple[int, int, int]] = {}
    for k in range(n_entries):
        off = ifd_pos + 2 + 12 * k
        tag, typ, count = struct.unpack(end + "HHI", payload[off : off + 8])
        if typ == 3 and count == 1:
            (value,) = struct.unpack(end + "H", payload[off + 8 : off + 10])
        else:
            (value,) = struct.unpack(end + "I", payload[off + 8 : off + 12])
        tags[tag] = (typ, count, value)
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiff: tiled layout unsupported")
    w = tags[256][2]
    h = tags[257][2]
    if tags.get(258, (0, 0, 8))[2] != 8 or tags.get(277, (0, 0, 1))[2] != 1:
        raise NotImplementedError("tiff: only 8-bit single-sample supported")
    comp = tags.get(259, (0, 0, COMP_NONE))[2]
    rps = tags.get(278, (0, 0, h))[2] or h
    n_strips = tags[273][1]

    def _array(tag: int) -> list[int]:
        typ, count, value = tags[tag]
        if count == 1:
            return [value]
        # foreign writers may use SHORT (type 3, 2 bytes) arrays
        width, fmt = (2, "H") if typ == 3 else (4, "I")
        out = []
        for k in range(count):
            (v,) = struct.unpack(
                end + fmt, payload[value + width * k : value + width * (k + 1)]
            )
            out.append(v)
        return out

    offsets = _array(273)
    counts = _array(279)
    rows_done = 0
    px = np.empty((h, w), dtype=np.uint8)
    for si in range(n_strips):
        rows = min(rps, h - rows_done)
        raw = payload[offsets[si] : offsets[si] + counts[si]]
        need = rows * w
        if comp == COMP_NONE:
            if len(raw) < need:
                raise ValueError("tiff: truncated strip")
            data = raw[:need]
        elif comp == COMP_PACKBITS:
            data = _packbits_decode(raw, need)
        elif comp == COMP_LZW:
            data = _tiff_lzw_decode(raw, need)
        else:
            raise NotImplementedError(f"tiff: compression {comp} unsupported")
        px[rows_done : rows_done + rows] = np.frombuffer(
            data, dtype=np.uint8
        ).reshape(rows, w)
        rows_done += rows
    if rows_done != h:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")
    return w, h, px
