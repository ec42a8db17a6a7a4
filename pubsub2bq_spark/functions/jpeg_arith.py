"""Arithmetic-coded JPEG (SOF9) — pure-stdlib QM-coder + Annex-F models.

ITU-T T.81 defines a second entropy coder besides Huffman: the adaptive
binary arithmetic QM-coder (Annex D) driving the DC/AC statistical
models of Annex F. This module implements both directions with nothing
beyond ``struct``/``numpy``:

* :class:`_QMDecoder` — the T.81 Annex D decoder exactly as specified:
  DECODE with conditional MPS/LPS exchange, RENORMD, BYTEIN with the
  stuffed-zero-bit rule after 0xFF bytes and the feed-1-bits marker
  path, over the published 113-state probability-estimation table
  (Table D.3) plus the fixed non-adaptive 0.5 state used for AC signs.
* :class:`_QMEncoder` — the mirror image. Instead of T.81's BYTEOUT
  carry/stack machinery it accumulates the code point in an unbounded
  integer (a renormalization carry simply ripples, which is what the
  flowcharts' stack emulates on 32-bit registers) and serializes one
  value from the final interval at flush time. T.81 D.1.8 explicitly
  allows any code point inside the final interval — the bitstream is
  valid for any conforming decoder; only the (unspecified) trailing
  padding differs from the flowcharts' choice.
* DC/AC per-block models per Annex F.1.4.4 (the same decision order
  as the public libjpeg jdarith/jcarith pairing): DC zero/sign/
  magnitude-category tree with the L/U conditioning categories, AC
  per-index EOB decisions, fixed-estimate signs, and the low/high
  spectral split of the magnitude bins at Kx.

Encoded streams carry SOF9 (extended sequential, arithmetic) and a DAC
segment stating the default conditioning (L=0, U=1, Kx=5).

Reference behavior: the reference pipeline ships screenshots/PNG only
(j-f-oleary-bigdata/pubsub2bq images/*.png); arithmetic JPEG belongs to
the engine's north-star multimodal surface, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

from pubsub2bq_spark.functions.jpeg_codec import (
    _pad_edge,
    _A,
    _UNZIGZAG,
    _ZIGZAG,
    _blocks_of,
    _planes_of,
)

# T.81 Table D.3 — the QM-coder probability estimation state machine:
# (Qe, NMPS, NLPS, switch). State 113 is the fixed (non-adaptive)
# near-0.5 estimate T.81 F.1.4.4.1.2 uses for AC sign decisions.
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed 0.5 estimate (never adapts)
]

FIXED_BIN = 113  # statistics-bin state index for non-adaptive decisions


def new_bins(n: int) -> list[list[int]]:
    """``n`` fresh statistics bins, each ``[state_index, mps]`` starting
    at state 0 / MPS 0 (T.81 F.1.4.4.1.4: all bins reset at scan start)."""
    return [[0, 0] for _ in range(n)]


class _QMEncoder:
    """QM arithmetic encoder over an unbounded code integer.

    Interval convention (mirrors :class:`_QMDecoder` / T.81 Figure
    D.17): the LPS subinterval sits at the BOTTOM ``[0, Qe)`` of the
    current interval and MPS above it, with conditional exchange when
    renormalization makes ``A - Qe < Qe``. Carries from ``c += qe``
    ripple through the big integer directly, so no byte-stuffing
    bookkeeping is needed until :meth:`flush` serializes the chosen
    code point (stuffed zero bit after every 0xFF byte, per B.1.1.5).
    """

    __slots__ = ("a", "c", "cbits")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.cbits = 0  # renormalization shifts applied to c

    def encode(self, bins: list[list[int]], i: int, bit: int) -> None:
        sv, mps = bins[i]
        qe, nmps, nlps, sw = _QE[sv]
        a_new = self.a - qe
        if a_new >= qe:  # nominal assignment: MPS on top, LPS bottom
            if bit == mps:
                self.c += qe
                self.a = a_new
                if a_new < 0x8000:
                    bins[i][0] = nmps
                    self._renorm()
            else:
                self.a = qe
                if sw:
                    bins[i][1] = 1 - mps
                bins[i][0] = nlps
                self._renorm()
        else:  # conditional exchange: MPS takes the (larger) bottom Qe
            if bit == mps:
                self.a = qe
                bins[i][0] = nmps
                self._renorm()
            else:
                self.c += qe
                self.a = a_new
                if sw:
                    bins[i][1] = 1 - mps
                bins[i][0] = nlps
                self._renorm()

    def _renorm(self) -> None:
        # a is always in (0, 0x8000) here; the loop is a single shift by
        # however many bits a is short of bit 15 (r14: closed form)
        s = 16 - self.a.bit_length()
        self.a <<= s
        self.c <<= s
        self.cbits += s

    def flush(self) -> bytes:
        """Serialize the midpoint of the final interval MSB-first with
        the stuffed-zero-bit rule: any code point in ``[c, c + a)``
        decodes identically (T.81 D.1.8), and the decoder's
        feed-1-bits tail after the terminating marker keeps the
        effective value strictly inside the interval."""
        total = self.cbits + 16
        v = self.c + (self.a >> 1)
        bits = [(v >> (total - 1 - k)) & 1 for k in range(total)]
        out = bytearray()
        acc, nacc = 0, 0
        pos = 0
        stuff = False
        while pos < len(bits) or nacc:
            if nacc == 0 and stuff:
                acc, nacc = 0, 1  # stuffed 0 bit after an 0xFF byte
                stuff = False
            acc = (acc << 1) | (bits[pos] if pos < len(bits) else 0)
            nacc += 1
            if pos < len(bits):
                pos += 1
            if nacc == 8:
                out.append(acc)
                stuff = acc == 0xFF
                acc, nacc = 0, 0
        if stuff:
            # A trailing 0xFF still needs its stuffed zero byte
            # (T.81 B.1.1.5) — otherwise it fuses with the following
            # marker's 0xFF and the scan walk misparses. (Latent until
            # r14: the fixture coefficient space never flushed to a
            # trailing 0xFF before the DCT refactor shifted one rint.)
            out.append(0x00)
        return bytes(out)


class _QMDecoder:
    """QM decoder, bit-level offset formulation.

    Maintains ``off`` = the first ``16 + shifts`` code bits minus the
    low end of the current interval — the exact integer the Annex D
    C-register pipeline windows (truncating the offset is exact for
    comparisons against integer Qe: ``floor(x) < q ⇔ x < q``).

    r14: the byte-at-a-time feeder (buffer/stuffing state machine per
    bit) is replaced by ONE upfront unstuffing pass that materializes
    the whole segment's bit list, with the B.1.1.5 semantics preserved
    exactly: the bit after a data 0xFF byte is a stuffed zero
    (dropped), a marker byte (> 0x8F after 0xFF) switches to the
    feed-1-bits tail, and a segment that exhausts WITHOUT a marker
    replays the old feeder's implicit 0xD9 padding bytes. The decision
    loop is inlined into :meth:`decode` (no per-renorm method calls)."""

    __slots__ = ("bits", "nbits", "bp", "ones_tail", "off", "a")

    _D9_BITS = [1, 1, 0, 1, 1, 0, 0, 1]

    def __init__(self, data: bytes) -> None:
        parts: list[np.ndarray] = []
        i, n = 0, len(data)
        ones_tail = False
        while True:
            j = data.find(b"\xff", i)
            if j < 0:
                if i < n:
                    parts.append(
                        np.unpackbits(np.frombuffer(data[i:], np.uint8))
                    )
                break
            # bytes up to AND INCLUDING the 0xFF feed as full bytes
            parts.append(
                np.unpackbits(np.frombuffer(data[i : j + 1], np.uint8))
            )
            if j + 1 >= n or data[j + 1] > 0x8F:
                ones_tail = True  # marker (or implicit 0xD9): 1-bits
                break
            # stuffed byte: its MSB is the stuffed zero — 7 bits count
            parts.append(
                np.unpackbits(np.frombuffer(data[j + 1 : j + 2], np.uint8))[1:]
            )
            i = j + 2
        bits = (
            np.concatenate(parts).tolist() if parts else []
        )
        self.bits = bits
        self.nbits = len(bits)
        self.ones_tail = ones_tail
        self.bp = 0
        off = 0
        for _ in range(16):
            off = (off << 1) | self._tail_safe_bit()
        self.off = off
        self.a = 0x10000

    def _tail_safe_bit(self) -> int:
        bp = self.bp
        self.bp = bp + 1
        if bp < self.nbits:
            return self.bits[bp]
        if self.ones_tail:
            return 1
        return self._D9_BITS[(bp - self.nbits) & 7]

    def decode(self, bins: list[list[int]], i: int) -> int:
        b = bins[i]
        qe, nmps, nlps, sw = _QE[b[0]]
        a = self.a - qe
        off = self.off
        if off < qe:  # bottom subinterval
            if a < qe:  # conditional exchange: decoded MPS
                d = b[1]
                b[0] = nmps
            else:
                d = 1 - b[1]
                if sw:
                    b[1] = d
                b[0] = nlps
            a = qe
        else:  # top subinterval
            off -= qe
            if a >= 0x8000:
                self.a = a
                self.off = off
                return b[1]
            if a < qe:
                d = 1 - b[1]
                if sw:
                    b[1] = d
                b[0] = nlps
            else:
                d = b[1]
                b[0] = nmps
        # inline renormalization (a in (0, 0x8000) here)
        bits = self.bits
        bp = self.bp
        nb = self.nbits
        if bp + 16 <= nb:  # fast path: no tail handling needed
            while a < 0x8000:
                a <<= 1
                off = (off << 1) | bits[bp]
                bp += 1
            self.bp = bp
        else:
            while a < 0x8000:
                a <<= 1
                off = (off << 1) | self._tail_safe_bit()
            self.a = a
            self.off = off
            return d
        self.a = a
        self.off = off
        return d


# Annex F conditioning defaults (T.81 F.1.4.4.1.2 / F.1.4.4.2.1): DC
# lower/upper thresholds L=0, U=1; AC high/low spectral split Kx=5.
DC_L_DEFAULT = 0
DC_U_DEFAULT = 1
AC_KX_DEFAULT = 5

_DC_BINS = 64   # 5 conditioning contexts x 4 decision bins + X/M trees
_AC_BINS = 256  # 63 x 3 per-index bins + two X/M trees (low/high bands)


class _DCModel:
    """DC difference model (T.81 F.1.4.4.1): per-table statistics bins,
    per-component conditioning context from the PREVIOUS difference's
    sign/size classification against the L/U thresholds."""

    # Base index of the shared X (magnitude-category) bin tree; the
    # M (magnitude-bit) tree sits 14 past it (Table F.4 layout). The
    # lossless model (H.1.2.2) subclasses with 25 conditioning contexts
    # occupying 0..99, so its trees start at 100.
    mag_base = 20

    def __init__(self, low: int = DC_L_DEFAULT, up: int = DC_U_DEFAULT):
        self.bins = new_bins(_DC_BINS)
        self.low = low
        self.up = up

    def classify(self, diff: int) -> int:
        """Conditioning category of a just-coded difference (T.81
        Figure F.21): classified on the magnitude CATEGORY (the leading
        bit of |diff|−1), which both sides know before the magnitude
        bits, against the L/U thresholds."""
        if diff == 0:
            return 0
        v = abs(diff) - 1
        m = 1 << (v.bit_length() - 1) if v else 0
        if m < ((1 << self.low) >> 1):
            return 0  # near-zero diff context
        if m > ((1 << self.up) >> 1):
            return 12 if diff > 0 else 16  # large diff
        return 4 if diff > 0 else 8  # small diff

    def decode(self, qm: _QMDecoder, ctx: int) -> int:
        st = ctx
        if qm.decode(self.bins, st) == 0:
            return 0
        sign = qm.decode(self.bins, st + 1)
        st2 = st + 2 + sign
        m = qm.decode(self.bins, st2)
        if m:
            st2 = self.mag_base  # X1 bin (Table F.4 layout)
            while qm.decode(self.bins, st2):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("jpeg arith: DC magnitude overflow")
                st2 += 1
        v = m
        st2 += 14  # M (magnitude-bit) bins sit 14 past the X position
        while m > 1:
            m >>= 1
            if qm.decode(self.bins, st2):
                v |= m
        v += 1
        return -v if sign else v

    def encode(self, qm: _QMEncoder, ctx: int, diff: int) -> None:
        st = ctx
        if diff == 0:
            qm.encode(self.bins, st, 0)
            return
        qm.encode(self.bins, st, 1)
        sign = 1 if diff < 0 else 0
        qm.encode(self.bins, st + 1, sign)
        v = abs(diff) - 1
        st2 = st + 2 + sign
        # magnitude category: number of bits of v
        if v == 0:
            qm.encode(self.bins, st2, 0)
            m = 0
        else:
            qm.encode(self.bins, st2, 1)
            m = 1
            st2 = self.mag_base
            while (m << 1) <= v:
                qm.encode(self.bins, st2, 1)
                m <<= 1
                if m == 0x8000:
                    raise ValueError("jpeg arith: DC diff out of range")
                st2 += 1
            qm.encode(self.bins, st2, 0)
        st2 += 14
        mm = m
        while mm > 1:
            mm >>= 1
            qm.encode(self.bins, st2, 1 if v & mm else 0)


class _ACModel:
    """AC coefficient model (T.81 F.1.4.4.2): per-index EOB and
    zero/nonzero decision bins, fixed-estimate signs, and a low/high
    spectral split of the magnitude-category/bit trees at Kx."""

    def __init__(self, kx: int = AC_KX_DEFAULT):
        self.bins = new_bins(_AC_BINS)
        self.fixed = [[FIXED_BIN, 0]]
        self.kx = kx

    def decode_block(self, qm: _QMDecoder, zz: np.ndarray) -> None:
        k = 1
        while k <= 63:
            st = 3 * (k - 1)
            if qm.decode(self.bins, st):  # EOB at this index
                return
            while qm.decode(self.bins, st + 1) == 0:
                st += 3
                k += 1
                if k > 63:
                    raise ValueError("jpeg arith: AC run past k=63")
            sign = qm.decode(self.fixed, 0)
            st += 2
            m = qm.decode(self.bins, st)
            if m:
                if qm.decode(self.bins, st):
                    m = 2
                    st = 189 if k <= self.kx else 217
                    while qm.decode(self.bins, st):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "jpeg arith: AC magnitude overflow"
                            )
                        st += 1
            v = m
            st += 14
            while m > 1:
                m >>= 1
                if qm.decode(self.bins, st):
                    v |= m
            v += 1
            zz[k] = -v if sign else v
            k += 1

    def encode_block(self, qm: _QMEncoder, zz: list[int]) -> None:
        eob = 1
        for k in range(63, 0, -1):
            if zz[k]:
                eob = k + 1
                break
        k = 1
        pos = 0
        while k < eob:
            st = 3 * (k - 1)
            qm.encode(self.bins, st, 0)  # not EOB yet
            while zz[k] == 0:
                qm.encode(self.bins, st + 1, 0)
                st += 3
                k += 1
            qm.encode(self.bins, st + 1, 1)
            val = int(zz[k])
            sign = 1 if val < 0 else 0
            qm.encode(self.fixed, 0, sign)
            v = abs(val) - 1
            st += 2
            if v == 0:
                qm.encode(self.bins, st, 0)
                m = 0
            else:
                qm.encode(self.bins, st, 1)
                if v == 1:
                    qm.encode(self.bins, st, 0)
                    m = 1
                else:
                    qm.encode(self.bins, st, 1)
                    m = 2
                    st = 189 if k <= self.kx else 217
                    while (m << 1) <= v:
                        qm.encode(self.bins, st, 1)
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "jpeg arith: AC coefficient out of range"
                            )
                        st += 1
                    qm.encode(self.bins, st, 0)
            st += 14
            mm = m
            while mm > 1:
                mm >>= 1
                qm.encode(self.bins, st, 1 if v & mm else 0)
            k += 1
            pos += 1
        if eob <= 63:
            qm.encode(self.bins, 3 * (eob - 1), 1)  # EOB decision


def _dac_segment() -> bytes:
    """DAC (0xFFCC) stating the default conditioning for stat tables
    0 and 1: DC (Tc=0) value = (U << 4) | L, AC (Tc=1) value = Kx."""
    dc_val = (DC_U_DEFAULT << 4) | DC_L_DEFAULT
    body = bytes((0x00, dc_val, 0x01, dc_val,
                  0x10, AC_KX_DEFAULT, 0x11, AC_KX_DEFAULT))
    return b"\xff\xcc" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_arith_gray(px: np.ndarray, quant: int = 8) -> bytes:
    """Encode an 8-bit grayscale image as ARITHMETIC-coded extended
    sequential JPEG (SOF9): the same flat-quant DCT front end as
    :func:`...jpeg_codec.encode_jpeg_gray`, entropy-coded by the
    QM-coder through the Annex F DC/AC models instead of Huffman."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    blocks, bw, bh = _blocks_of(px)
    coefs = ((_A @ blocks) @ _A.T)
    q = np.rint(coefs / float(quant)).astype(np.int64)

    enc = _QMEncoder()
    dcm, acm = _DCModel(), _ACModel()
    pred, ctx = 0, 0
    for zz in q.reshape(bh * bw, 64)[:, _ZIGZAG].tolist():
        diff = zz[0] - pred
        dcm.encode(enc, ctx, diff)
        ctx = dcm.classify(diff)
        pred = zz[0]
        acm.encode_block(enc, zz)

    qtab = bytes(np.full(64, quant, dtype=np.uint8))
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    out += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    out += _dac_segment()
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_420(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                          quant: int = 8) -> bytes:
    """Encode a YCbCr image as ARITHMETIC-coded (SOF9) 4:2:0 JPEG: the
    same MCU-interleaved 2×2-mean-subsampled front end as
    :func:`...jpeg_codec.encode_jpeg_420`, QM-coded with stat tables
    0 (luma) and 1 (chroma, shared by Cb/Cr) and per-component DC
    predictors/conditioning contexts."""
    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    if y.shape != cb.shape or y.shape != cr.shape:
        raise ValueError("jpeg: component planes must share dimensions")
    h, w = y.shape
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16

    ypad = _pad_edge(y.astype(np.float64) - 128.0,
                     mcuy * 16 - h, mcux * 16 - w)
    yblocks = ypad.reshape(mcuy * 2, 8, mcux * 2, 8).transpose(0, 2, 1, 3)
    qy = np.rint(((_A @ yblocks) @ _A.T)
                 / float(quant)).astype(np.int64)

    def _sub(plane: np.ndarray) -> np.ndarray:
        ph = _pad_edge(plane.astype(np.float64), h % 2, w % 2)
        s = ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean(axis=(1, 3))
        return _pad_edge(s - 128.0, mcuy * 8 - s.shape[0], mcux * 8 - s.shape[1])

    qcb = np.rint(((_A @ _sub(cb).reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3))
         @ _A.T) / float(quant)).astype(np.int64)
    qcr = np.rint(((_A @ _sub(cr).reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3))
         @ _A.T) / float(quant)).astype(np.int64)

    enc = _QMEncoder()
    dcms = [_DCModel(), _DCModel()]   # stat tables: 0 luma, 1 chroma
    acms = [_ACModel(), _ACModel()]
    preds = [0, 0, 0]
    ctxs = [0, 0, 0]

    def code_block(zz: list[int], ci: int, tbl: int) -> None:
        diff = zz[0] - preds[ci]
        dcms[tbl].encode(enc, ctxs[ci], diff)
        ctxs[ci] = dcms[tbl].classify(diff)
        preds[ci] = zz[0]
        acms[tbl].encode_block(enc, zz)

    zy = qy.reshape(mcuy * 2 * mcux * 2, 64)[:, _ZIGZAG].tolist()
    zcb = qcb.reshape(mcuy * mcux, 64)[:, _ZIGZAG].tolist()
    zcr = qcr.reshape(mcuy * mcux, 64)[:, _ZIGZAG].tolist()
    yw = 2 * mcux
    for my in range(mcuy):
        for mx in range(mcux):
            for dy in range(2):
                for dx in range(2):
                    code_block(zy[(2 * my + dy) * yw + 2 * mx + dx], 0, 0)
            code_block(zcb[my * mcux + mx], 1, 1)
            code_block(zcr[my * mcux + mx], 2, 1)

    qtab = bytes(np.full(64, quant, dtype=np.uint8))
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + qtab
    out += b"\xff\xc9" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    out += _dac_segment()
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
    out += b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00"
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arith_planes(payload: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode an arithmetic-coded extended sequential JPEG (SOF9) →
    ``(width, height, planes)``, full-resolution uint8 per component
    (replication chroma upsample) — the arithmetic twin of
    ``jpeg_codec.decode_jpeg_planes``. Grayscale and 3-component
    interleaved scans with sampling factors in {1, 2}; DAC segments
    override the default L/U/Kx conditioning. Loud rejection for
    progressive-arithmetic (SOF10), restart intervals and non-SOF9
    frames."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    w = h = -1
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    scan: list[tuple[int, int, int]] = []        # (comp index, dc tbl, ac tbl)
    dc_cond: dict[int, tuple[int, int]] = {}     # tbl -> (L, U)
    ac_cond: dict[int, int] = {}                 # tbl -> Kx
    scan_start = -1
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tab = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtables[tq] = tab.astype(np.int64)[_UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC9:  # SOF9: extended sequential, arithmetic
            h = struct.unpack(">H", body[1:3])[0]
            w = struct.unpack(">H", body[3:5])[0]
            if body[0] != 8:
                raise NotImplementedError("jpeg: non-8-bit precision")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "jpeg: only 1- or 3-component arithmetic supported"
                )
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                hs, vs = body[7 + 3 * ci] >> 4, body[7 + 3 * ci] & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        "jpeg: sampling factors beyond 2 unsupported"
                    )
                comps.append((cid, hs, vs, body[8 + 3 * ci]))
        elif marker == 0xCA:  # SOF10 (r14): forward to the prog decoder
            from pubsub2bq_spark.functions.jpeg_arith_prog import (
                decode_jpeg_arith_progressive_planes,
            )

            return decode_jpeg_arith_progressive_planes(payload)
        elif marker == 0xCB:  # SOF11 (r14): forward to the lossless twin
            from pubsub2bq_spark.functions.jpeg_arith_lossless import (
                decode_jpeg_arith_lossless,
            )

            return decode_jpeg_arith_lossless(payload)
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0x0F
                if tc == 0:
                    dc_cond[tb] = (body[i + 1] & 0x0F, body[i + 1] >> 4)
                else:
                    ac_cond[tb] = body[i + 1]
                i += 2
        elif marker == 0xDD:
            raise NotImplementedError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:
            if not comps:
                raise ValueError("jpeg: SOS before SOF9")
            if body[0] != len(comps):
                raise NotImplementedError("jpeg: partial-component scan")
            cids = [c[0] for c in comps]
            for ci in range(body[0]):
                cs = body[1 + 2 * ci]
                if cs not in cids:
                    raise ValueError("jpeg: scan names unknown component")
                tsel = body[2 + 2 * ci]
                scan.append((cids.index(cs), tsel >> 4, tsel & 0x0F))
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if w < 0 or not comps:
        raise ValueError("jpeg: missing SOF9")
    if scan_start < 0:
        raise ValueError("jpeg: missing SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    qm = _QMDecoder(payload[scan_start:])
    dcms: dict[int, _DCModel] = {}
    acms: dict[int, _ACModel] = {}
    for _ci, dc_t, ac_t in scan:
        if dc_t not in dcms:
            low, up = dc_cond.get(dc_t, (DC_L_DEFAULT, DC_U_DEFAULT))
            dcms[dc_t] = _DCModel(low, up)
        if ac_t not in acms:
            acms[ac_t] = _ACModel(ac_cond.get(ac_t, AC_KX_DEFAULT))
    zstores = [
        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        for _cid, hs, vs, _tq in comps
    ]
    preds = [0] * len(comps)
    ctxs = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, dc_t, ac_t in scan:
                _cid, hs, vs, tq = comps[ci]
                zs = zstores[ci]
                dcm = dcms[dc_t]
                acm = acms[ac_t]
                for dy in range(vs):
                    for dx in range(hs):
                        zz = [0] * 64
                        diff = dcm.decode(qm, ctxs[ci])
                        ctxs[ci] = dcm.classify(diff)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        acm.decode_block(qm, zz)
                        zs[my * vs + dy, mx * hs + dx] = zz
    coefs = [
        zs[:, :, _UNZIGZAG]
        .reshape(zs.shape[0], zs.shape[1], 8, 8)
        .astype(np.float64)
        * qtables[tq][None, None]
        for (_cid, _hs, _vs, tq), zs in zip(comps, zstores)
    ]
    return _planes_of(coefs, comps, w, h, hmax, vmax)


def synth_jpeg_arith_from_bytes(payload: bytes) -> bytes:
    """Synthesize a *real* ARITHMETIC-coded (SOF9) 4:2:0 color JPEG:
    dims from the shared byte-length rule, Y constant per 8×8 block
    (``(7·bx + 11·by + 5) mod 256``), Cb/Cr constant per 16×16
    macroblock (``(3·mx + 7·my + 96)`` / ``(7·mx + 5·my + 48) mod
    256``). The subsampled-exactness argument from the Huffman 4:2:0
    fixture carries over unchanged — the entropy coder (QM vs Huffman)
    is lossless either way — so the decoded planes equal the
    synthesized ones bit-for-bit and an oracle states all three plane
    sums in closed form, while the full QM machinery (adaptive bins,
    conditional exchange, renormalization, stuffing) genuinely runs."""
    n = len(payload)
    w = n % 64 + 16
    h = (n // 64) % 64 + 16
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    y = ((7 * bx[None, :] + 11 * by[:, None] + 5) % 256).astype(np.uint8)
    mx = np.arange(w) // 16
    my = np.arange(h) // 16
    cb = ((3 * mx[None, :] + 7 * my[:, None] + 96) % 256).astype(np.uint8)
    cr = ((7 * mx[None, :] + 5 * my[:, None] + 48) % 256).astype(np.uint8)
    return encode_jpeg_arith_420(y, cb, cr, quant=8)
