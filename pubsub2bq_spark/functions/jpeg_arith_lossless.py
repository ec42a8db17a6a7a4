"""Arithmetic-coded LOSSLESS JPEG (SOF11) — closing the T.81 process
matrix (r14; the scope note's "deferred, not hard" item, done).

T.81 Annex H defines the lossless process over the Table H.1
predictors; with arithmetic entropy coding (process SOF11 = 0xCB) the
prediction residuals are coded by the SAME statistical model as DC
differences (H.1.2.2: zero/sign/magnitude-category decision tree with
magnitude-bit refinement), conditioned on a 5x5 classification of the
two neighboring residuals — Da (left) and Db (above) — through the
L/U thresholds, giving 25 conditioning contexts instead of sequential
DC's 5. This module composes the existing halves:

* the QM-coder and the Annex F DC difference model
  (functions/jpeg_arith.py) — subclassed with the 25-context layout
  (contexts occupy bins 0..99; the shared X/M magnitude trees start
  at 100);
* the Table H.1 predictor arithmetic and modulo-2^16 reconstruction
  (functions/jpeg_codec.py's Huffman lossless twin).

Round trips are EXACT by construction (lossless, integer arithmetic);
all seven predictors are fuzz-pinned against the identity.
"""

from __future__ import annotations

import struct

import numpy as np

from pubsub2bq_spark.functions.jpeg_arith import (
    _DCModel,
    _QMDecoder,
    _QMEncoder,
    DC_L_DEFAULT,
    DC_U_DEFAULT,
    new_bins,
)
from pubsub2bq_spark.functions.jpeg_codec import _lossless_reconstruct

# Precomputed conditioning tables (r14: the per-pixel 5-way L/U
# classification of Da and Db was ~25% of the kernel): indexed by
# ``diff & 0xFFFF``; TA carries 20·cat5(Da), TB carries 4·cat5(Db), so
# the context base is one add of two list gathers. Keyed by the (L, U)
# thresholds from the DAC segment.
_CTX_CACHE: dict[tuple[int, int], tuple[list[int], list[int]]] = {}


def _ctx_tables(low: int, up: int) -> tuple[list[int], list[int]]:
    t = _CTX_CACHE.get((low, up))
    if t is None:
        d16 = np.arange(1 << 16, dtype=np.int64)
        diff = np.where(d16 >= 0x8000, d16 - 0x10000, d16)
        v = np.abs(diff) - 1
        m = np.zeros(1 << 16, dtype=np.int64)
        nz = v > 0
        _, e = np.frexp(v[nz].astype(np.float64))
        m[nz] = np.int64(1) << (e.astype(np.int64) - 1)  # highest set bit
        cat = np.where(
            (diff == 0) | (m < ((1 << low) >> 1)),
            0,
            np.where(
                m > ((1 << up) >> 1),
                np.where(diff > 0, 3, 4),
                np.where(diff > 0, 1, 2),
            ),
        )
        t = ((20 * cat).tolist(), (4 * cat).tolist())
        _CTX_CACHE[(low, up)] = t
    return t


class _LosslessModel(_DCModel):
    """The DC difference model with 25 (Da, Db) conditioning contexts.

    Context base = 4*(5*cat(Da) + cat(Db)) where cat() is the 5-way
    L/U classification (zero / small+ / small- / large+ / large-);
    the shared magnitude trees move to 100 (past the context bins)."""

    mag_base = 100

    def __init__(self, low: int = DC_L_DEFAULT, up: int = DC_U_DEFAULT):
        super().__init__(low, up)
        # 25 contexts * 4 decision bins + X tree (100..) + M tree (114..)
        self.bins = new_bins(100 + 16 + 16)

    def _cat5(self, diff: int) -> int:
        """0 zero · 1 small+ · 2 small- · 3 large+ · 4 large-."""
        c = self.classify(diff)  # {0, 4, 8, 12, 16} per the DC layout
        return {0: 0, 4: 1, 8: 2, 12: 3, 16: 4}[c]

    def context(self, da: int, db: int) -> int:
        return 4 * (5 * self._cat5(da) + self._cat5(db))


def encode_jpeg_arith_lossless(px: np.ndarray, predictor: int = 4) -> bytes:
    """Encode an 8-bit grayscale image as ARITHMETIC lossless JPEG
    (SOF11): Table H.1 prediction residuals in modulo-2^16 arithmetic,
    QM-coded under the 25-context conditioning. Exact by construction."""
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")
    x = np.asarray(px, dtype=np.int64)
    h, w = x.shape
    a = np.empty_like(x)
    b = np.empty_like(x)
    c = np.empty_like(x)
    a[:, 1:] = x[:, :-1]
    b[1:, :] = x[:-1, :]
    c[1:, 1:] = x[:-1, :-1]
    pred = {
        1: a, 2: b, 3: c, 4: a + b - c,
        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1), 7: (a + b) >> 1,
    }[predictor]
    pred[0, 1:] = x[0, :-1]
    if h > 1:
        pred[1:, 0] = x[:-1, 0]
    pred[0, 0] = 128  # 2^(P-1)
    d16 = (x - pred) & 0xFFFF
    diffs = np.where(d16 >= 0x8000, d16 - 0x10000, d16).astype(np.int64)

    enc = _QMEncoder()
    model = _LosslessModel()
    ta, tb = _ctx_tables(DC_L_DEFAULT, DC_U_DEFAULT)
    mencode = model.encode
    rows = diffs.tolist()
    above: list[int] | None = None
    for row in rows:
        da = 0
        if above is None:
            for j, diff in enumerate(row):
                mencode(enc, ta[da & 0xFFFF], diff)  # db = 0 → tb term 0
                da = diff
        else:
            for j, diff in enumerate(row):
                mencode(
                    enc, ta[da & 0xFFFF] + tb[above[j] & 0xFFFF], diff
                )
                da = diff
        above = row

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xcb" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    # DAC: DC-class conditioning for stat table 0 (value = (U<<4)|L)
    dac = bytes((0x00, (DC_U_DEFAULT << 4) | DC_L_DEFAULT))
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00"
    out += bytes((predictor, 0, 0))  # Ss=predictor, Se=0, Ah/Al=0
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arith_lossless(
    payload: bytes,
) -> tuple[int, int, list[np.ndarray]]:
    """Decode a grayscale arithmetic lossless JPEG (SOF11) →
    ``(width, height, [plane])`` with modulo-2^16 reconstruction.
    Rejects multi-component scans, non-8-bit precision, point
    transforms and out-of-range predictors loudly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    w = h = -1
    cond = (DC_L_DEFAULT, DC_U_DEFAULT)
    sel = pt = None
    scan_start = -1
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xCB:
            if body[0] != 8:
                raise NotImplementedError(
                    "jpeg arith lossless: only 8-bit precision"
                )
            h = struct.unpack(">H", body[1:3])[0]
            w = struct.unpack(">H", body[3:5])[0]
            if body[5] != 1:
                raise NotImplementedError(
                    "jpeg arith lossless: only single-component scans"
                )
        elif marker == 0xCC:
            i = 0
            while i + 1 < len(body):
                if body[i] >> 4 == 0:
                    cond = (body[i + 1] & 0x0F, body[i + 1] >> 4)
                i += 2
        elif marker == 0xDA:
            sel = body[1 + 2 * body[0]]
            pt = body[3 + 2 * body[0]] & 0x0F
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if w < 0:
        raise ValueError("jpeg arith lossless: missing SOF11")
    if scan_start < 0:
        raise ValueError("jpeg arith lossless: missing SOS")
    if not 1 <= sel <= 7:
        raise ValueError("jpeg arith lossless: predictor out of range")
    if pt != 0:
        raise NotImplementedError(
            "jpeg arith lossless: point transform unsupported"
        )

    # Two-phase decode (r14, mirroring the SOF3 twin): (1) the QM
    # residual pass — sequential by nature (adaptive coder), but with
    # the (Da, Db) conditioning served by precomputed tables and plain
    # list rows; (2) Table H.1 reconstruction row-vectorized via the
    # shared helper.
    qm = _QMDecoder(payload[scan_start:])
    model = _LosslessModel(*cond)
    ta, tb = _ctx_tables(*cond)
    mdecode = model.decode
    rows: list[list[int]] = []
    above: list[int] | None = None
    for _r in range(h):
        drow = [0] * w
        da = 0
        if above is None:
            for j in range(w):
                da = drow[j] = mdecode(qm, ta[da & 0xFFFF])  # db = 0
        else:
            for j in range(w):
                da = drow[j] = mdecode(
                    qm, ta[da & 0xFFFF] + tb[above[j] & 0xFFFF]
                )
        rows.append(drow)
        above = drow
    out = _lossless_reconstruct(np.array(rows, dtype=np.int64), sel)
    if out.max() > 255:
        raise ValueError("jpeg arith lossless: sample out of 8-bit range")
    return w, h, [out.astype(np.uint8)]
