"""Property fuzz for the late-r13 codecs (hypothesis).

Every lossless format must round-trip EXACTLY on arbitrary inputs —
dims/lengths the fixture rules never reach (sub-block, degenerate 1×1,
exact block-multiple edges); the lossy arithmetic-JPEG paths must
equal the same textbook models as their Huffman twins; and IMA ADPCM
decode is checked against an INDEPENDENT scalar reference implemented
here (not the production code path)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_jpeg_codec import _textbook, _textbook_420


class TestArithJpegFuzz:
    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        quant=st.sampled_from([4, 8, 16]), seed=st.integers(0, 2**31),
    )
    def test_gray(self, h, w, quant, seed):
        from pubsub2bq_spark.functions.jpeg_arith import (
            decode_jpeg_arith_planes,
            encode_jpeg_arith_gray,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        gw, gh, planes = decode_jpeg_arith_planes(
            encode_jpeg_arith_gray(img, quant=quant)
        )
        assert (gw, gh) == (w, h)
        assert np.array_equal(planes[0], _textbook(img, quant))

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(1, 36), w=st.integers(1, 36),
        quant=st.sampled_from([8, 16]), seed=st.integers(0, 2**31),
    )
    def test_color_420(self, h, w, quant, seed):
        from pubsub2bq_spark.functions.jpeg_arith import encode_jpeg_arith_420
        from pubsub2bq_spark.functions.jpeg_codec import decode_jpeg_planes

        rng = np.random.default_rng(seed)
        y, cb, cr = (
            rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            for _ in range(3)
        )
        gw, gh, planes = decode_jpeg_planes(
            encode_jpeg_arith_420(y, cb, cr, quant=quant)
        )
        assert (gw, gh) == (w, h)
        for got, exp in zip(planes, _textbook_420(y, cb, cr, quant)):
            assert np.array_equal(got, exp)


class TestLosslessJpegFuzz:
    @settings(max_examples=35, deadline=None)
    @given(
        h=st.integers(1, 50), w=st.integers(1, 50),
        sel=st.integers(1, 7), seed=st.integers(0, 2**31),
    )
    def test_exact(self, h, w, sel, seed):
        from pubsub2bq_spark.functions.jpeg_codec import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        gw, gh, planes = decode_jpeg_lossless(
            encode_jpeg_lossless(img, predictor=sel)
        )
        assert (gw, gh) == (w, h)
        assert np.array_equal(planes[0], img)


class TestRle8Fuzz:
    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        nf=st.integers(1, 5), seed=st.integers(0, 2**31),
    )
    def test_exact(self, h, w, nf, seed):
        from pubsub2bq_spark.functions.avi_codec import (
            decode_avi,
            encode_avi_rle,
        )

        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, size=(h, w)).astype(np.uint8)]
        for _ in range(nf - 1):
            f = frames[-1].copy()
            if h > 1 and w > 1:
                r0 = int(rng.integers(0, h))
                c0 = int(rng.integers(0, w))
                rh = int(rng.integers(1, h - r0 + 1))
                rw = int(rng.integers(1, w - c0 + 1))
                f[r0 : r0 + rh, c0 : c0 + rw] = rng.integers(
                    0, 256, size=(rh, rw)
                )
            frames.append(f)
        _, _, out = decode_avi(encode_avi_rle(frames))
        assert len(out) == nf
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))


class TestGifFuzz:
    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        nf=st.integers(1, 4), interlace=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def test_exact(self, h, w, nf, interlace, seed):
        from pubsub2bq_spark.functions.gif_codec import decode_gif, encode_gif

        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, size=(h, w)).astype(np.uint8)]
        for _ in range(nf - 1):
            f = frames[-1].copy()
            r0, c0 = int(rng.integers(0, h)), int(rng.integers(0, w))
            f[r0:, c0:] = rng.integers(0, 256, size=f[r0:, c0:].shape)
            frames.append(f)
        _, _, out = decode_gif(encode_gif(frames, interlace=interlace))
        assert len(out) == nf
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))


class TestFlacFuzz:
    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 13000),
        kind=st.sampled_from(["noise", "smooth", "constant", "small"]),
        seed=st.integers(0, 2**31),
    )
    def test_exact(self, n, kind, seed):
        from pubsub2bq_spark.functions.flac_codec import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(seed)
        if kind == "noise":
            x = rng.integers(-32768, 32768, size=n).astype(np.int16)
        elif kind == "smooth":
            x = (9000 * np.sin(np.arange(n) / 33.0)).astype(np.int16)
        elif kind == "constant":
            x = np.full(n, int(rng.integers(-32768, 32768)), np.int16)
        else:
            x = rng.integers(-4, 4, size=n).astype(np.int16)
        _, y = decode_flac(encode_flac(x))
        assert np.array_equal(y, x.astype(np.int64))


class TestTiffFuzz:
    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 60), w=st.integers(1, 60),
        comp=st.sampled_from([1, 5, 32773]), seed=st.integers(0, 2**31),
    )
    def test_exact(self, h, w, comp, seed):
        from pubsub2bq_spark.functions.tiff_codec import (
            decode_tiff,
            encode_tiff,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        gw, gh, out = decode_tiff(encode_tiff(img, compression=comp))
        assert (gw, gh) == (w, h)
        assert np.array_equal(out, img)


def _ima_reference(nibbles, pred, index):
    """Independent scalar IMA reference (pure-Python, no shared code
    with the production decoder's loop body shapes)."""
    step_table = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ]
    adjust = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = []
    for nib in nibbles:
        step = step_table[index]
        # the IMA magnitude ladder, written with floor divisions (the
        # spec's (2m+1)·step/8 closed form is NOT bit-equal — the
        # ladder truncates per term, which this restates explicitly)
        mag = step // 8
        if nib & 4:
            mag += step
        if nib & 2:
            mag += step // 2
        if nib & 1:
            mag += step // 4
        pred += -mag if nib & 8 else mag
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + adjust[nib & 7]))
        out.append(pred)
    return out


class TestAdpcmFuzz:
    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 2000), pred0=st.integers(-32768, 32767),
        idx0=st.integers(0, 88), seed=st.integers(0, 2**31),
    )
    def test_decode_matches_independent_reference(self, n, pred0, idx0, seed):
        """Decode arbitrary nibble streams from arbitrary header state
        and compare against a separately-written scalar reference
        (floor-division ladder, its own clamp/adapt bookkeeping) —
        catches state-update transcription bugs like the block-header
        one the roundtrip test caught at build time."""
        from pubsub2bq_spark.functions.wav_codec import _ima_decode_nibbles

        rng = np.random.default_rng(seed)
        nibbles = rng.integers(0, 16, size=n).astype(np.uint8)
        got = _ima_decode_nibbles(nibbles, pred0, idx0)
        assert list(got) == _ima_reference(list(nibbles), pred0, idx0)


class TestQoiFuzz:
    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 48), w=st.integers(1, 48),
        ch=st.sampled_from([3, 4]),
        kind=st.sampled_from(["noise", "gradient", "constant", "sparse"]),
        seed=st.integers(0, 2**31),
    )
    def test_exact(self, h, w, ch, kind, seed):
        from pubsub2bq_spark.functions.qoi_codec import decode_qoi, encode_qoi

        rng = np.random.default_rng(seed)
        if kind == "noise":
            px = rng.integers(0, 256, size=(h, w, ch))
        elif kind == "gradient":
            base = np.arange(h)[:, None] + np.arange(w)[None, :]
            px = np.stack([(base + 7 * k) % 256 for k in range(ch)], axis=2)
        elif kind == "constant":
            px = np.full((h, w, ch), int(rng.integers(0, 256)))
        else:  # sparse: long runs with occasional literals
            px = np.zeros((h, w, ch))
            px[rng.random((h, w)) < 0.05] = rng.integers(0, 256, size=ch)
        px = px.astype(np.uint8)
        gw, gh, gch, out = decode_qoi(encode_qoi(px))
        assert (gw, gh, gch) == (w, h, ch)
        assert np.array_equal(out, px)


class TestHierJpegFuzz:
    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        quant=st.sampled_from([4, 8, 16]), seed=st.integers(0, 2**31),
    )
    def test_pyramid_matches_model(self, h, w, quant, seed):
        """Hierarchical decode equals the replayed two-stage textbook
        model (stage-1 quantize/IDCT, the normative J.1.1.2 expansion,
        residual quantize/IDCT, clamp) for arbitrary dims and quant —
        including 1×1 and odd dims where the expansion crops."""
        from pubsub2bq_spark.functions.jpeg_hier import (
            _decode_frame_samples,
            _encode_frame_blocks,
            decode_jpeg_hier_planes,
            encode_jpeg_hier,
            expand_ref,
        )

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        gw, gh, planes = decode_jpeg_hier_planes(
            encode_jpeg_hier(px, quant=quant)
        )
        assert (gw, gh) == (w, h)
        w1, h1 = (w + 1) // 2, (h + 1) // 2
        padded = np.pad(
            px.astype(np.float64),
            ((0, 2 * h1 - h), (0, 2 * w1 - w)), mode="edge",
        )
        small = np.rint(
            padded.reshape(h1, 2, w1, 2).mean(axis=(1, 3))
        ).astype(np.int64)
        recon = np.clip(
            _decode_frame_samples(
                _encode_frame_blocks(small - 128, quant), w1, h1, quant
            ) + 128, 0, 255,
        )
        ref = expand_ref(recon, w, h)
        resid = _decode_frame_samples(
            _encode_frame_blocks(px.astype(np.int64) - ref, quant),
            w, h, quant,
        )
        assert np.array_equal(
            planes[0], np.clip(ref + resid, 0, 255).astype(np.uint8)
        )


class TestMalformedInputGates:
    """ADVICE r13: malformed payloads must fail with the DOCUMENTED
    exception — ValueError for truncated/corrupt streams, the
    NotImplementedError codec gate for recognized-but-unsupported
    formats — never bare IndexError/struct.error."""

    @settings(max_examples=40, deadline=None)
    @given(cut=st.integers(1, 200), seed=st.integers(0, 2**31))
    def test_gif_truncation_raises_valueerror(self, cut, seed):
        from pubsub2bq_spark.functions.gif_codec import decode_gif, encode_gif

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 16, size=(9, 7), dtype=np.uint8)
        payload = encode_gif([img])
        trunc = payload[: min(cut, len(payload) - 1)]
        with pytest.raises(ValueError):
            decode_gif(trunc)

    def test_wav_unsupported_format_tag_hits_codec_gate(self):
        import struct

        from pubsub2bq_spark.functions.multimodal import extract_audio_features

        for wtag in (0x02, 0x55):  # MS-ADPCM, MP3-in-WAV
            fmt = struct.pack("<HHIIHH", wtag, 1, 8000, 8000, 1, 0)
            riff = (
                b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
            )
            wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
            with pytest.raises(NotImplementedError):
                extract_audio_features(wav)

    def test_wav_malformed_still_valueerror(self):
        """A RIFF payload that is broken (no fmt chunk at all) keeps the
        malformed-input contract."""
        import struct

        from pubsub2bq_spark.functions.multimodal import extract_audio_features

        riff = b"WAVE" + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
        wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
        with pytest.raises(ValueError):
            extract_audio_features(wav)


class TestMp2Fuzz:
    """MPEG-1 Layer II (r14): the bitstream layer must round-trip
    EXACTLY (allocation / scale factors / requantization numerators are
    integers by construction); the synthesis filterbank must be linear
    and deterministic."""

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**31),
        n_frames=st.integers(1, 5),
        with_crc=st.booleans(),
        rate_kbps=st.sampled_from([48, 64, 96, 192]),
        sample_rate=st.sampled_from([32000, 44100, 48000]),
    )
    def test_bitstream_roundtrip_exact(
        self, seed, n_frames, with_crc, rate_kbps, sample_rate
    ):
        from pubsub2bq_spark.functions import mp2_codec as M

        rng = np.random.default_rng(seed)
        table = M.alloc_table(sample_rate, rate_kbps)
        frames = []
        for f in range(n_frames):
            frame = {}
            n_sb = int(rng.integers(1, 5))
            for sb in sorted(rng.choice(len(table), n_sb, replace=False)):
                sb = int(sb)
                nbal, steps = table[sb]
                v = int(rng.integers(1, len(steps) + 1))
                L = steps[v - 1]
                if L > 4095:  # keep frames under the fixed frame size
                    v = 1
                    L = steps[0]
                scfsi = int(rng.integers(0, 4))
                b = [int(x) for x in rng.integers(0, 63, 3)]
                if scfsi == 1:
                    scfs = [b[0], b[0], b[2]]
                elif scfsi == 2:
                    scfs = [b[0], b[0], b[0]]
                elif scfsi == 3:
                    scfs = [b[0], b[1], b[1]]
                else:
                    scfs = b
                codes = rng.integers(0, L, (12, 3))
                frame[sb] = (v, scfsi, scfs, codes)
            frames.append(frame)
        try:
            payload = M.encode_mp2_frames(
                frames, sample_rate, rate_kbps, with_crc=with_crc
            )
        except ValueError as ex:
            assert "exceeds frame size" in str(ex)
            return
        out = M.decode_mp2(payload)
        alloc = scf = q = 0
        for f in frames:
            for sb, (v, _si, scfs, codes) in f.items():
                L = M.alloc_table(sample_rate, rate_kbps)[sb][1][v - 1]
                alloc += v
                scf += sum(scfs)
                q += int(np.sum(2 * np.asarray(codes) + 1 - L))
        assert out["alloc_sum"] == alloc
        assert out["scf_sum"] == scf
        assert out["qsum"] == q
        assert out["n_frames"] == n_frames
        assert out["pcm"].size == 1152 * n_frames
        assert out["sample_rate"] == sample_rate
        assert out["bitrate_kbps"] == rate_kbps

    def test_crc_flip_and_truncation_and_gates(self):
        from pubsub2bq_spark.functions import mp2_codec as M
        from pubsub2bq_spark.functions.multimodal import synth_mp2_from_bytes

        payload = synth_mp2_from_bytes(b"y" * 23)
        flipped = bytearray(payload)
        flipped[10] ^= 1
        with pytest.raises(ValueError, match="CRC"):
            M.decode_mp2(bytes(flipped))
        with pytest.raises(ValueError):
            M.decode_mp2(payload[:100])
        stereo = bytearray(payload)
        stereo[3] = 0x00
        with pytest.raises((NotImplementedError, ValueError)):
            M.decode_mp2(bytes(stereo))
        layer3 = bytearray(payload)
        layer3[1] = (layer3[1] & ~0x06) | 0x02  # layer bits 01 = Layer III
        with pytest.raises(NotImplementedError, match="Layer"):
            M.decode_mp2(bytes(layer3))

    def test_synthesis_linear_deterministic(self):
        from pubsub2bq_spark.functions import mp2_codec as M

        rng = np.random.default_rng(0)
        S = rng.normal(0, 0.01, (36, 32))
        a = M.synthesize(S)
        b = M.synthesize(S)
        assert np.array_equal(a, b)
        assert np.array_equal(M.synthesize(np.zeros((36, 32))), np.zeros(1152))
        # exact linearity under power-of-two scaling (no clipping)
        assert np.array_equal(M.synthesize(S * 2.0), a * 2.0)

    def test_fixture_matches_duckdb_oracle(self):
        import duckdb
        import pandas as pd

        from pubsub2bq_spark.functions.multimodal import mp2_feature_batches
        from pubsub2bq_spark.registry import all_queries

        texts = ["a" * n for n in (0, 1, 5, 17, 33, 100, 257)]
        pdf = pd.DataFrame(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "payload": [t.encode() for t in texts],
            }
        )
        (res,) = list(mp2_feature_batches(iter([pdf])))
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
            ),
        )
        exp = (
            con.execute(all_queries()["audio_mp2"].oracle)
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        res = res.sort_values("doc_id").reset_index(drop=True)
        for col in exp.columns:
            assert (res[col].astype("int64") == exp[col].astype("int64")).all(), col

    def test_audio_features_dispatch_mp2(self):
        from pubsub2bq_spark.functions.multimodal import (
            extract_audio_features,
            synth_mp2_from_bytes,
        )

        out = extract_audio_features(synth_mp2_from_bytes(b"z" * 40))
        assert out["sample_rate"] == 48000
        assert out["n_samples"] == 1152 * (40 % 3 + 2)
        assert out["rms"] >= 0.0


class TestArithProgressiveFuzz:
    """SOF10 (r14): progressive arithmetic must equal the textbook DCT
    model exactly — the same bar as its Huffman (SOF2) and sequential
    arithmetic (SOF9) twins."""

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        quant=st.sampled_from([4, 8, 16]), seed=st.integers(0, 2**31),
    )
    def test_roundtrip_exact(self, h, w, quant, seed):
        from pubsub2bq_spark.functions.jpeg_arith_prog import (
            decode_jpeg_arith_progressive_planes,
            encode_jpeg_arith_progressive_gray,
        )

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        payload = encode_jpeg_arith_progressive_gray(px, quant)
        W, H, planes = decode_jpeg_arith_progressive_planes(payload)
        assert (W, H) == (w, h)
        assert np.array_equal(planes[0], _textbook(px, quant))

    def test_dispatcher_routes_sof10(self):
        from pubsub2bq_spark.functions.jpeg_arith_prog import (
            encode_jpeg_arith_progressive_gray,
        )
        from pubsub2bq_spark.functions.jpeg_codec import decode_jpeg

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (17, 23), dtype=np.uint8)
        w, h, ch, got = decode_jpeg(encode_jpeg_arith_progressive_gray(px, 8))
        assert (w, h, ch) == (23, 17, 1)
        assert np.array_equal(got[:, :, 0] if got.ndim == 3 else got,
                              _textbook(px, 8))

    def test_fixture_matches_duckdb_oracle(self):
        import duckdb
        import pandas as pd

        from pubsub2bq_spark.functions.multimodal import jpeg_arith_prog_batches
        from pubsub2bq_spark.registry import all_queries

        texts = ["b" * n for n in (0, 7, 64, 130, 999)]
        pdf = pd.DataFrame(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "payload": [t.encode() for t in texts],
            }
        )
        (res,) = list(jpeg_arith_prog_batches(iter([pdf])))
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
            ),
        )
        exp = (
            con.execute(all_queries()["jpeg_arith_progressive"].oracle)
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        res = res.sort_values("doc_id").reset_index(drop=True)
        for col in exp.columns:
            assert (res[col].astype("int64") == exp[col].astype("int64")).all(), col


class TestArithLosslessFuzz:
    """SOF11 (r14): the final T.81 process — must reproduce the input
    EXACTLY under every predictor."""

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 50), w=st.integers(1, 50),
        sel=st.integers(1, 7), seed=st.integers(0, 2**31),
    )
    def test_roundtrip_exact(self, h, w, sel, seed):
        from pubsub2bq_spark.functions.jpeg_arith_lossless import (
            decode_jpeg_arith_lossless,
            encode_jpeg_arith_lossless,
        )

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        W, H, planes = decode_jpeg_arith_lossless(
            encode_jpeg_arith_lossless(px, sel)
        )
        assert (W, H) == (w, h)
        assert np.array_equal(planes[0], px)

    def test_dispatcher_routes_sof11(self):
        from pubsub2bq_spark.functions.jpeg_arith_lossless import (
            encode_jpeg_arith_lossless,
        )
        from pubsub2bq_spark.functions.jpeg_codec import decode_jpeg

        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (19, 27), dtype=np.uint8)
        w, h, ch, got = decode_jpeg(encode_jpeg_arith_lossless(px, 5))
        assert (w, h, ch) == (27, 19, 1)
        assert np.array_equal(got[:, :, 0] if got.ndim == 3 else got, px)

    def test_conditioning_compresses_smooth_content(self):
        """The 25-context conditioning must actually adapt: a smooth
        gradient (residuals concentrated near zero with stable
        neighborhood classes) should compress far below 1 byte/px."""
        from pubsub2bq_spark.functions.jpeg_arith_lossless import (
            encode_jpeg_arith_lossless,
        )

        sm = (np.add.outer(np.arange(200), np.arange(200)) // 4 % 256).astype(
            np.uint8
        )
        payload = encode_jpeg_arith_lossless(sm, 4)
        assert len(payload) < 0.2 * sm.size

    def test_fixture_matches_duckdb_oracle(self):
        import duckdb
        import pandas as pd

        from pubsub2bq_spark.functions.multimodal import (
            jpeg_arith_lossless_batches,
        )
        from pubsub2bq_spark.registry import all_queries

        texts = ["c" * n for n in (0, 7, 64, 130, 999, 321)]
        pdf = pd.DataFrame(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "payload": [t.encode() for t in texts],
            }
        )
        (res,) = list(jpeg_arith_lossless_batches(iter([pdf])))
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
            ),
        )
        exp = (
            con.execute(all_queries()["jpeg_arith_lossless"].oracle)
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        res = res.sort_values("doc_id").reset_index(drop=True)
        for col in exp.columns:
            assert (res[col].astype("int64") == exp[col].astype("int64")).all(), col


def test_mp2_synthesis_vectorized_matches_spec_loop():
    """The r14 closed-form synthesis (16 shifted broadcast-multiplies)
    must match the straightforward spec-flow V-FIFO loop."""
    import numpy as np

    from pubsub2bq_spark.functions import mp2_codec as M

    N, D = M._filterbank_tables()

    def spec_loop(S):
        n_t = S.shape[0]
        V = np.zeros(1024)
        out = np.empty(n_t * 32)
        for t in range(n_t):
            V[64:] = V[:-64]
            V[:64] = N @ S[t]
            U = np.empty(512)
            for j in range(8):
                U[j * 64 : j * 64 + 32] = V[j * 128 : j * 128 + 32]
                U[j * 64 + 32 : j * 64 + 64] = V[j * 128 + 96 : j * 128 + 128]
            W = U * D
            out[t * 32 : (t + 1) * 32] = W.reshape(16, 32).sum(axis=0)
        return np.clip(out, -1.0, 1.0)

    rng = np.random.default_rng(21)
    for n_t in (1, 7, 36, 108):
        S = rng.normal(0, 0.02, (n_t, 32))
        assert np.allclose(M.synthesize(S), spec_loop(S), atol=1e-12)
