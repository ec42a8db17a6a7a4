"""Multimodal column support: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.10 U8): image/audio/video travel as `binary`
columns beside typed metadata columns; decode / feature-extract /
resize / frame-sample are Arrow-batched pandas functions applied with
``mapInPandas`` so each Python batch handles thousands of payloads.

The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a real decoder import succeeds, and
``fake_decode_meta`` provides a deterministic stand-in so the
Spark-side plumbing (schema, batching, partitioning) is fully real
and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

# Real decoders are optional; plumb through if present.
try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes) -> "Image.Image":
    """Decode an image payload. STUB: requires PIL, absent here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; container has no codec libraries — "
            "use fake_decode_meta for plumbing tests"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for a decoder's metadata output.

    Derives pseudo-dimensions from the byte length only — reproducible
    on any engine, so oracle SQL can state the same arithmetic.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "header_hex": payload[:4].hex(),
        "width": n % 64 + 16,
        "height": (n // 64) % 64 + 16,
        "n_frames": n % 5 + 1,
    }


def decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary `payload` (+ passthrough `doc_id`) →
    typed metadata. One Arrow batch in, one out — no per-row Python calls
    into the JVM."""
    for pdf in batches:
        metas = pdf["payload"].map(fake_decode_meta)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": metas.map(lambda m: m["n_bytes"]).astype("int64"),
                "header_hex": metas.map(lambda m: m["header_hex"]),
                "width": metas.map(lambda m: m["width"]).astype("int32"),
                "height": metas.map(lambda m: m["height"]).astype("int32"),
                "n_frames": metas.map(lambda m: m["n_frames"]).astype("int32"),
            }
        )
        yield out


DECODE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, header_hex string, "
    "width int, height int, n_frames int"
)

RESIZE_TARGET = 224  # max output side (the ViT/CNN preprocessing default)


def resize_image(payload: bytes, target: int = RESIZE_TARGET) -> bytes:
    """Resize an image payload. STUB: requires PIL, absent here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resizing requires PIL; container has no codec libraries — "
            "use fake_resize_meta for plumbing tests"
        )
    import io  # pragma: no cover

    img = decode_image(payload)  # pragma: no cover
    img.thumbnail((target, target))  # pragma: no cover
    buf = io.BytesIO()  # pragma: no cover
    img.save(buf, format="PNG")  # pragma: no cover
    return buf.getvalue()  # pragma: no cover


def fake_resize_meta(payload: bytes, target: int = RESIZE_TARGET) -> dict:
    """Deterministic stand-in for the resize step's metadata: the
    aspect-preserving max-side-`target` output dimensions, in exact
    integer arithmetic (floor division) so oracle SQL states the same
    numbers."""
    m = fake_decode_meta(payload)
    w, h = m["width"], m["height"]
    long_side = max(w, h)
    out_w = max(1, (w * target) // long_side)
    out_h = max(1, (h * target) // long_side)
    return {
        "n_bytes": m["n_bytes"],
        "width": w,
        "height": h,
        "out_w": out_w,
        "out_h": out_h,
    }


def resize_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary `payload` → resize-plan metadata."""
    for pdf in batches:
        metas = pdf["payload"].map(fake_resize_meta)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": metas.map(lambda m: m["n_bytes"]).astype("int64"),
                "width": metas.map(lambda m: m["width"]).astype("int32"),
                "height": metas.map(lambda m: m["height"]).astype("int32"),
                "out_w": metas.map(lambda m: m["out_w"]).astype("int32"),
                "out_h": metas.map(lambda m: m["out_h"]).astype("int32"),
            }
        )


RESIZE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, out_w int, out_h int"
)


def extract_audio_features(payload: bytes) -> dict:
    """Feature-extract an audio payload. STUB: no audio codecs here."""
    raise NotImplementedError(
        "audio feature extraction requires an audio codec library, absent "
        "in this container — use fake_audio_features for plumbing tests"
    )


def fake_audio_features(payload: bytes) -> dict:
    """Deterministic stand-in for an audio feature extractor: a pseudo
    RMS level derived from the payload's md5 (first 8 hex digits as a
    32-bit fraction) plus a window count from the byte length. md5 is
    engine-portable and k/2^32 is EXACTLY representable as a double
    (k < 2^53), so the oracle restates the identical bits with no
    rounding — deliberately un-rounded, because Python's round() is
    half-to-even while SQL round() is half-away-from-zero and the two
    disagree on exact ties."""
    import hashlib

    n = len(payload)
    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": n,
        "n_windows": n // 256 + 1,
        "rms": int(h[:8], 16) / 4294967296.0,
    }


def audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary `payload` → fixed-width feature row."""
    for pdf in batches:
        feats = pdf["payload"].map(fake_audio_features)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": feats.map(lambda f: f["n_bytes"]).astype("int64"),
                "n_windows": feats.map(lambda f: f["n_windows"]).astype("int64"),
                "rms": feats.map(lambda f: f["rms"]).astype("float64"),
            }
        )


AUDIO_FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, n_windows bigint, rms double"
