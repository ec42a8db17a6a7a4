"""Multimodal kernel contracts: the codec steps are stubs (no PIL /
audio libs in this container) and must say so loudly, while the fake
deterministic paths — what the oracles restate — stay stable."""

from __future__ import annotations

import pandas as pd
import pytest

from pubsub2bq_spark.functions import multimodal as mm


def test_real_codec_paths_raise_without_libraries():
    if mm._HAS_PIL:  # pragma: no cover - container has no PIL
        pytest.skip("PIL present; stub contract not applicable")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        mm.resize_image(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        mm.extract_audio_features(b"RIFF....")


def test_fake_resize_preserves_aspect_and_bounds():
    meta = mm.fake_resize_meta(b"x" * 1000)
    assert max(meta["out_w"], meta["out_h"]) <= mm.RESIZE_TARGET
    assert min(meta["out_w"], meta["out_h"]) >= 1
    # the longer input side maps to exactly the target
    if meta["width"] >= meta["height"]:
        assert meta["out_w"] == mm.RESIZE_TARGET
    else:
        assert meta["out_h"] == mm.RESIZE_TARGET


def test_fake_audio_features_deterministic_and_bounded():
    a = mm.fake_audio_features(b"payload-bytes")
    b = mm.fake_audio_features(b"payload-bytes")
    assert a == b
    assert 0.0 <= a["rms"] < 1.0
    assert a["n_windows"] == len(b"payload-bytes") // 256 + 1


def test_kernels_consume_and_emit_arrow_batch_shapes():
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [b"abc", b"x" * 300]}
    )
    (resized,) = list(mm.resize_meta_batches(iter([pdf])))
    assert list(resized.columns) == [
        "doc_id", "n_bytes", "width", "height", "out_w", "out_h"
    ]
    assert resized["n_bytes"].tolist() == [3, 300]
    (audio,) = list(mm.audio_feature_batches(iter([pdf])))
    assert list(audio.columns) == ["doc_id", "n_bytes", "n_windows", "rms"]
    assert audio["n_windows"].tolist() == [1, 2]
