"""Round-15 optimization equivalence tests.

Every r15 kernel rewrite is pinned here against an inline scalar
reference implementation (the pre-r15 code path, transcribed), the same
discipline as tests/test_r14_optimizations.py: the optimization must be
BYTE-IDENTICAL / bit-exact, not merely roundtrip-correct.
"""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------- GIF LZW
def _gif_lzw_encode_reference(indices: np.ndarray, min_code_size: int) -> bytes:
    """The pre-r15 per-pixel GIF LZW walk (transcribed verbatim)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[int, int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    prefix = -1
    for v in indices.reshape(-1).tolist():
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
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {}
                next_code = eoi + 1
                width = min_code_size + 1
        prefix = v
    if prefix >= 0:
        emit(prefix, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


class TestGifLzwRunChain:
    def _cases(self):
        rng = np.random.default_rng(42)
        cases = []
        for n in (0, 1, 2, 7, 63, 64, 400, 6241):
            cases.append(np.full(n, 77, dtype=np.uint8))  # constant rects
        cases.append(rng.integers(0, 256, 20000).astype(np.uint8))  # clears
        cases.append(rng.integers(0, 4, 30000).astype(np.uint8))
        cases.append(np.repeat(rng.integers(0, 256, 500), 8).astype(np.uint8))
        cases.append(
            np.tile(np.repeat(rng.integers(0, 256, 10), 8), 16).astype(np.uint8)
        )
        for _ in range(50):
            n = int(rng.integers(0, 3000))
            arr = rng.integers(0, 256, n).astype(np.uint8)
            if rng.random() < 0.5 and n > 10:
                arr = np.repeat(arr[: max(1, n // 8)], 8)[:n]
            cases.append(arr)
        return cases

    def test_run_chain_encoder_byte_identical(self):
        """The run-chain fast path (and its short-run fallback) must emit
        exactly the reference walk's bytes — including 12-bit width
        growth and CLEAR resets mid-run."""
        from pubsub2bq_spark.functions.gif_codec import _lzw_encode

        for arr in self._cases():
            assert _lzw_encode(arr, 8) == _gif_lzw_encode_reference(arr, 8)

    def test_both_paths_exercised(self):
        """Constant input takes the chain path, dense-noise the plain
        walk; both decode back exactly."""
        from pubsub2bq_spark.functions.gif_codec import _lzw_decode, _lzw_encode

        const = np.full(5000, 9, dtype=np.uint8)   # >= 4 bytes/run
        noise = np.arange(5000).astype(np.uint8)   # 1 byte/run
        for arr in (const, noise):
            assert np.array_equal(
                _lzw_decode(_lzw_encode(arr, 8), 8, arr.size), arr
            )


class TestLzwScalarParse:
    def test_gif_scalar_matches_numpy(self):
        from pubsub2bq_spark.functions.gif_codec import (
            _lzw_encode,
            _lzw_parse_codes_np,
            _lzw_parse_codes_scalar,
        )

        rng = np.random.default_rng(7)
        for _ in range(40):
            n = int(rng.integers(0, 6000))
            arr = rng.integers(0, 256, n).astype(np.uint8)
            if rng.random() < 0.5 and n > 10:
                arr = np.repeat(arr[: max(1, n // 8)], 8)[:n]
            data = _lzw_encode(arr, 8)
            a = [s.tolist() for s in _lzw_parse_codes_np(data, 8)]
            assert _lzw_parse_codes_scalar(data, 8) == a

    def test_gif_truncation_error_matches(self):
        from pubsub2bq_spark.functions.gif_codec import (
            _lzw_encode,
            _lzw_parse_codes_np,
            _lzw_parse_codes_scalar,
        )

        data = _lzw_encode(np.full(500, 9, np.uint8), 8)
        for cut in (1, 3, 7, len(data) // 2, len(data) - 1):
            try:
                a = ("ok", [s.tolist() for s in _lzw_parse_codes_np(data[:cut], 8)])
            except ValueError as ex:
                a = ("err", str(ex))
            try:
                b = ("ok", _lzw_parse_codes_scalar(data[:cut], 8))
            except ValueError as ex:
                b = ("err", str(ex))
            assert a == b

    def test_tiff_scalar_matches_numpy(self):
        from pubsub2bq_spark.functions.tiff_codec import (
            _tiff_lzw_encode,
            _tiff_lzw_parse_codes_np,
            _tiff_lzw_parse_codes_scalar,
        )

        rng = np.random.default_rng(8)
        streams = []
        for _ in range(40):
            n = int(rng.integers(0, 6000))
            arr = rng.integers(0, 256, n).astype(np.uint8)
            if rng.random() < 0.5 and n > 10:
                arr = np.repeat(arr[: max(1, n // 8)], 8)[:n]
            streams.append(_tiff_lzw_encode(arr.tobytes()))
        big = _tiff_lzw_encode(bytes(rng.integers(0, 256, 20000, dtype=np.uint8)))
        streams.append(big)
        for data in streams:
            for cut in (0, 1, 7, len(data) // 2, len(data) - 1, len(data)):
                sa, ea = _tiff_lzw_parse_codes_np(data[:cut])
                sb, eb = _tiff_lzw_parse_codes_scalar(data[:cut])
                assert [s.tolist() for s in sa] == sb and ea == eb


# ---------------------------------------------------------------- QOI
def _decode_qoi_reference(payload: bytes):
    """The pre-r15 per-op numpy-writing decoder (transcribed verbatim)."""
    import struct

    from pubsub2bq_spark.functions.qoi_codec import _END, QOI_MAGIC

    if payload[:4] != QOI_MAGIC:
        raise ValueError("qoi: bad magic")
    w, h, ch, _cs = struct.unpack(">IIBB", payload[4:14])
    if ch not in (3, 4):
        raise ValueError("qoi: bad channel count")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    data = payload
    end = len(data) - 8
    while i < n:
        if pos >= end:
            raise ValueError("qoi: truncated stream")
        op = data[pos]
        pos += 1
        if op == 0xFE:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        elif op >> 6 == 0b00:
            r, g, b, a = index[op]
        elif op >> 6 == 0b01:
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 0b10:
            dg = (op & 0x3F) - 32
            nxt = data[pos]
            pos += 1
            r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (nxt & 0xF) - 8) % 256
        else:
            run = (op & 0x3F) + 1
            if i + run > n:
                raise ValueError("qoi: run past image end")
            out[i : i + run] = (r, g, b, a)
            i += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[pos : pos + 8] != _END:
        raise ValueError("qoi: missing end marker")
    return w, h, ch, out[:, :ch].reshape(h, w, ch).copy()


class TestQoiDecodeRepeat:
    def test_matches_reference_decoder(self):
        from pubsub2bq_spark.functions.qoi_codec import decode_qoi, encode_qoi

        rng = np.random.default_rng(5)
        for _ in range(60):
            hh, ww = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            c = 4 if rng.random() < 0.5 else 3
            px = rng.integers(0, 256, (hh, ww, c)).astype(np.uint8)
            if rng.random() < 0.5:
                px[:, : ww // 2] = px[0, 0]
            s = encode_qoi(px)
            a = _decode_qoi_reference(s)
            b = decode_qoi(s)
            assert a[0:3] == b[0:3] and np.array_equal(a[3], b[3])

    def test_error_paths_match_reference(self):
        from pubsub2bq_spark.functions.qoi_codec import decode_qoi, encode_qoi

        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
        s = encode_qoi(px)
        for cut in (15, len(s) // 2, len(s) - 9, len(s) - 1):
            try:
                _decode_qoi_reference(s[:cut])
                a = "ok"
            except ValueError as ex:
                a = str(ex)
            try:
                decode_qoi(s[:cut])
                b = "ok"
            except ValueError as ex:
                b = str(ex)
            assert a == b


# ---------------------------------------------------------------- RLE8
class TestRleLiteralConstantPath:
    def test_constant_segment_matches_generic_walk(self):
        from pubsub2bq_spark.functions.avi_codec import _rle_encode_literal

        rng = np.random.default_rng(3)
        for m in (0, 1, 2, 3, 4, 8, 60, 79, 255, 256, 300, 511):
            seg = np.full(m, 7, np.uint8)
            got = _rle_encode_literal(seg)
            # reference: encoded runs of <=255 for any >=3 constant run
            want = bytearray()
            if m in (1, 2):
                want += bytes((1, 7)) * m
            else:
                run = m
                while run > 0:
                    c = min(run, 255)
                    want += bytes((c, 7))
                    run -= c
            assert got == bytes(want)
        # mixed segments keep the generic walk — roundtrip via frame codec
        from pubsub2bq_spark.functions.avi_codec import (
            _rle_decode_frame,
            _rle_encode_frame,
        )

        for _ in range(30):
            h, w = int(rng.integers(4, 40)), int(rng.integers(4, 40))
            f = rng.integers(0, 4, (h, w)).astype(np.uint8)
            canvas = np.zeros((h, w), np.uint8)
            _rle_decode_frame(_rle_encode_frame(None, f), canvas)
            assert np.array_equal(canvas, f)


# ---------------------------------------------------------------- JPEG
class TestJpegR15Internals:
    def test_pad_edge_matches_np_pad(self):
        from pubsub2bq_spark.functions.jpeg_codec import _pad_edge

        rng = np.random.default_rng(9)
        for _ in range(40):
            h, w = int(rng.integers(1, 30)), int(rng.integers(1, 30))
            pb, pr = int(rng.integers(0, 17)), int(rng.integers(0, 17))
            a = rng.normal(size=(h, w))
            assert np.array_equal(
                _pad_edge(a, pb, pr),
                np.pad(a, ((0, pb), (0, pr)), mode="edge"),
            )

    def test_pack_fields_small_matches_vectorized(self):
        from pubsub2bq_spark.functions.jpeg_codec import (
            _pack_fields,
            _pack_fields_small,
        )

        rng = np.random.default_rng(10)
        for _ in range(60):
            n = int(rng.integers(0, 700))
            lens = rng.integers(1, 17, n).astype(np.int64)
            vals = np.array(
                [int(rng.integers(0, 1 << int(l))) for l in lens], dtype=np.int64
            )
            if n and rng.random() < 0.3:
                lens[rng.integers(0, n)] = 0  # zero-length fields occur (size 0)
            assert _pack_fields_small(vals.tolist(), lens.tolist()) == _pack_fields(
                vals, lens
            )

    def test_mag_fields_matches_scalar_magnitude(self):
        from pubsub2bq_spark.functions.jpeg_codec import (
            _DC_BITS,
            _DC_VALS,
            _canonical_codes,
            _mag_fields,
            _magnitude,
        )

        codes = _canonical_codes(_DC_BITS, _DC_VALS)
        rng = np.random.default_rng(11)
        diffs = rng.integers(-2000, 2000, 500).astype(np.int64)
        diffs[:5] = (0, 1, -1, 2047, -2047)
        V, L = _mag_fields(diffs, codes)
        for d, (vc, vb), (lc, lb) in zip(diffs.tolist(), V.tolist(), L.tolist()):
            size, bits = _magnitude(d)
            code, length = codes[size]
            assert (vc, vb, lc, lb) == (code, bits, length, size)

    def test_dc_scan_vectorization_matches_bitwriter(self):
        """The vectorized DC-first/refine scans must byte-match a
        _BitWriter transcription of the pre-r15 per-DC loop."""
        from pubsub2bq_spark.functions.jpeg_codec import (
            _DC_BITS,
            _DC_VALS,
            _BitWriter,
            _canonical_codes,
            _mag_fields,
            _magnitude,
            _pack_hybrid,
        )

        dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
        rng = np.random.default_rng(12)
        for _ in range(20):
            dcv = rng.integers(-1000, 1000, int(rng.integers(1, 900))).astype(
                np.int64
            )
            for al in (0, 1, 2):
                # reference: scalar predictor loop
                bwr = _BitWriter()
                pred = 0
                for dc in dcv.tolist():
                    v = dc >> al
                    size, bits = _magnitude(v - pred)
                    pred = v
                    code, length = dc_codes[size]
                    bwr.write(code, length)
                    bwr.write(bits, size)
                want = bwr.flush()
                t = dcv >> al
                v2, l2 = _mag_fields(np.diff(t, prepend=np.int64(0)), dc_codes)
                assert _pack_hybrid(v2.reshape(-1), l2.reshape(-1)) == want
                # refine scan
                bwr = _BitWriter()
                for dc in dcv.tolist():
                    bwr.write((dc >> al) & 1, 1)
                want = bwr.flush()
                bits_arr = (dcv >> al) & 1
                assert _pack_hybrid(bits_arr, np.ones_like(bits_arr)) == want

    def test_huff_table_caches_are_shared_and_bounded(self):
        from pubsub2bq_spark.functions.jpeg_codec import (
            _AC_BITS,
            _AC_VALS,
            _LUT_CACHE_MAX,
            _TABLE_CACHE,
            _canonical_codes,
            _decode_table,
        )

        t1 = _decode_table(_AC_BITS, _AC_VALS)
        t2 = _decode_table(_AC_BITS, _AC_VALS)
        assert t1 is t2  # memoized instance
        c1 = _canonical_codes(_AC_BITS, _AC_VALS)
        assert _canonical_codes(_AC_BITS, _AC_VALS) is c1
        assert len(_TABLE_CACHE) <= _LUT_CACHE_MAX


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


# ------------------------------------------------------- pair kernels (r15)
class TestMyersVectorizedPrep:
    def test_matches_textbook_dp_and_old_prep(self):
        """The bincount-built Peq/tcodes must reproduce the per-char
        loop's tables bit-for-bit, and the lev scores must equal the
        textbook O(mn) DP — including empty heads and non-ASCII."""
        import random

        from pubsub2bq_spark.operators.llm_dedup import _myers_lev, _myers_prep

        def old_prep(heads):
            m = len(heads)
            lens = np.array([len(h) for h in heads], dtype=np.int64)
            maxlen = int(lens.max()) if m else 0
            cidx = {
                c: i for i, c in enumerate(sorted({c for h in heads for c in h}))
            }
            one = np.uint64(1)
            peq = np.zeros((m, max(len(cidx), 1)), dtype=np.uint64)
            tcodes = np.full((m, max(maxlen, 1)), -1, dtype=np.int64)
            for i, h in enumerate(heads):
                for p, ch in enumerate(h):
                    peq[i, cidx[ch]] |= one << np.uint64(p)
                    tcodes[i, p] = cidx[ch]
            return lens, peq, tcodes, maxlen

        def dp(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        random.seed(4)
        rng = np.random.default_rng(17)
        for trial in range(15):
            m = int(rng.integers(2, 40))
            heads = [
                "".join(
                    random.choice("abcdefgh é中") for _ in range(int(rng.integers(0, 65)))
                )
                for _ in range(m)
            ]
            if trial % 4 == 0:
                heads[0] = ""
            po, pn = old_prep(heads), _myers_prep(heads)
            assert np.array_equal(po[0], pn[0])
            assert np.array_equal(po[1], pn[1])
            # old tcodes width is max(maxlen, 1) — compare valid region
            assert np.array_equal(po[2][:, : po[3] or 1], pn[2][:, : pn[3] or 1])
            ii, jj = np.triu_indices(m, k=1)
            got = _myers_lev(pn, ii, jj)
            for k in rng.choice(len(ii), size=min(25, len(ii)), replace=False):
                a, b = heads[ii[k]], heads[jj[k]]
                assert got[k] == dp(a, b), (a, b)


class TestEmptyFrameMemo:
    def test_schema_and_sharing(self):
        import pandas as pd

        from pubsub2bq_spark.operators.llm_dedup import _empty_frame

        schema = (("doc_a", "int64"), ("doc_b", "int64"), ("jaccard", "float64"))
        e1 = _empty_frame(schema)
        e2 = _empty_frame(schema)
        assert e1 is e2
        want = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
        )
        assert list(e1.dtypes) == list(want.dtypes)
        assert list(e1.columns) == list(want.columns)
        assert len(e1) == 0
