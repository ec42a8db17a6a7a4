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
    257, EARLY CHANGE (width grows at table size (1<<width) - 1)."""
    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
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
    prefix = b""
    for v in data:
        nxt = prefix + bytes((v,))
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1:  # early change
            if width < 12:
                width += 1
            else:
                emit(CLEAR, width)
                table = {bytes((i,)): i for i in range(256)}
                next_code = 258
                width = 9
        prefix = bytes((v,))
    if prefix:
        emit(table[prefix], width)
    emit(EOI, width)
    if nbits:
        emit(0, 8 - nbits)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    CLEAR, EOI = 256, 257
    acc = 0
    nbits = 0
    pos = 0

    def read(w: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < w:
            if pos >= len(data):
                raise ValueError("tiff: truncated LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= w
        v = (acc >> nbits) & ((1 << w) - 1)
        return v

    out = bytearray()
    table: list[bytes] = [bytes((i,)) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while len(out) < n_expected:
        code = read(width)
        if code == CLEAR:
            table = [bytes((i,)) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: LZW code out of range")
        out += entry
        prev = entry
        # early change: the decoder's table lags the encoder's by one
        # entry, so it bumps the width at (1 << width) - 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != n_expected:
        raise ValueError("tiff: LZW output size mismatch")
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
