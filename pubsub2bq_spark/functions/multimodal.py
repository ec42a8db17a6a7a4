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
