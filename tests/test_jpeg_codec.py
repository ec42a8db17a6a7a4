"""Unit tests for the stdlib baseline-JPEG codec (VERDICT r11 #7).

No Spark needed: the codec is plain numpy/struct. The exactness claims
the jpeg_decode oracle relies on are pinned here:
  * block-constant fixtures survive the lossy pipeline bit-for-bit;
  * the general encode→decode round trip equals the textbook
    DCT→quantize→dequantize→IDCT model exactly (this checks the
    Huffman/bitstream layers carry every coefficient faithfully);
  * unsupported subsets reject loudly instead of mis-decoding.
"""

from __future__ import annotations

import numpy as np
import pytest

from pubsub2bq_spark.functions.jpeg_codec import (
    _A,
    decode_jpeg,
    encode_jpeg_gray,
    synth_jpeg_from_bytes,
)


def _textbook(img: np.ndarray, quant: int) -> np.ndarray:
    """Reference model: pad → orthonormal DCT → round-to-quant →
    dequant → IDCT → shift → clip → crop, all in float64."""
    h, w = img.shape
    bw, bh = (w + 7) // 8, (h + 7) // 8
    pad = np.pad(
        img.astype(np.float64) - 128.0,
        ((0, bh * 8 - h), (0, bw * 8 - w)),
        mode="edge",
    )
    blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,byxz,vz->byuv", _A, blocks, _A)
    qc = np.rint(coef / quant) * quant
    spat = np.einsum("xu,byuv,vz->byxz", _A.T, qc, _A)
    full = spat.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
    return np.clip(np.rint(full), 0, 255).astype(np.uint8)[:h, :w]


class TestJpegCodec:
    def test_block_constant_fixture_is_exact(self):
        for payload_len in (0, 1, 63, 64, 1000, 4097):
            payload = b"x" * payload_len
            w = payload_len % 64 + 16
            h = (payload_len // 64) % 64 + 16
            gw, gh, ch, px = decode_jpeg(synth_jpeg_from_bytes(payload))
            assert (gw, gh, ch) == (w, h, 1)
            bx = np.arange(w) // 8
            by = np.arange(h) // 8
            want = ((11 * bx[None, :] + 7 * by[:, None]) % 256).astype(
                np.uint8
            )
            assert np.array_equal(px[:, :, 0], want)

    @pytest.mark.parametrize("seed,shape,quant", [
        (1, (8, 8), 8),
        (2, (16, 24), 16),
        (3, (37, 53), 16),   # non-multiple-of-8 dims (edge padding)
        (4, (100, 17), 32),  # tall/narrow, coarse quant
        (5, (9, 200), 4),    # fine quant → long AC runs + ZRL paths
    ])
    def test_roundtrip_equals_textbook_model(self, seed, shape, quant):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, ch, dec = decode_jpeg(encode_jpeg_gray(img, quant=quant))
        assert (w, h, ch) == (shape[1], shape[0], 1)
        assert np.array_equal(dec[:, :, 0], _textbook(img, quant))

    def test_flat_image_compresses_and_decodes(self):
        img = np.full((64, 64), 200, dtype=np.uint8)
        data = encode_jpeg_gray(img, quant=8)
        _, _, _, dec = decode_jpeg(data)
        assert np.array_equal(dec[:, :, 0], img)
        assert len(data) < 1000  # EOB-only blocks stay tiny

    def test_rejects_progressive_and_truncated(self):
        img = np.zeros((8, 8), dtype=np.uint8)
        data = bytearray(encode_jpeg_gray(img))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))
        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01not a jpeg")

    def test_decode_image_dispatches_jpeg(self):
        from pubsub2bq_spark.functions.multimodal import (
            decode_image,
            resize_image,
        )

        jp = synth_jpeg_from_bytes(b"q" * 500)
        w, h, ch, px = decode_image(jp)
        assert (w, h, ch) == (500 % 64 + 16, (500 // 64) % 64 + 16, 1)
        out = resize_image(jp)
        ow, oh, _, _ = decode_image(out)
        long_side = max(w, h)
        assert (ow, oh) == (
            max(1, w * 224 // long_side),
            max(1, h * 224 // long_side),
        )
