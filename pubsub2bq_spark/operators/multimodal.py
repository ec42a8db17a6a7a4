"""Multimodal-column operators: SURVEY.md §2.10 (U8) + U1/U2 pandas-UDF
surface.

`documents.text` seeds the payloads. The plumbing keys
(multimodal_meta / frame_sample) treat the UTF-8 bytes as an opaque
payload and decode with the deterministic byte-length fake; the codec
keys (image_resize / audio_feature / audio_resample) synthesize REAL
PNG / WAV files from engine-portable rules and run genuine stdlib
decode→transform→re-encode→re-decode loops (functions/png_codec.py,
functions/wav_codec.py). Either way the Spark shape — binary columns,
Arrow batches, mapInPandas schemas, projection-before-fan-out — is the
real 100 TB design.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pubsub2bq_spark.functions.multimodal import (
    AUDIO_FEATURE_SCHEMA,
    DECODE_META_SCHEMA,
    PNG_RESIZE_SCHEMA,
    RESIZE_TARGET,
    WAV_RESAMPLE_SCHEMA,
    decode_meta_batches,
    png_resize_batches,
    wav_feature_batches,
    wav_resample_batches,
)
from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT)          AS n_bytes,
               lower(substr(hex(encode(text)), 1, 8))              AS header_hex,
               CAST(octet_length(encode(text)) % 64 + 16 AS INTEGER)        AS width,
               CAST((octet_length(encode(text)) // 64) % 64 + 16 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 5 + 1 AS INTEGER)          AS n_frames
        FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload column → typed "
        "metadata via an Arrow-batched mapInPandas kernel (decode step is a "
        "deterministic stub; schema/batching/partitioning are real).",
    scale_notes="mapInPandas moves whole Arrow batches across the Python "
                "boundary once — payload bytes are not re-serialized per "
                "row. At 100 TB, payloads stay in object storage and the "
                "binary column holds references + byte ranges.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Project to (doc_id, payload) BEFORE the fan-out shuffle so the
    # exchange carries only the columns the kernel needs. (r2 fanned out
    # the full row first; an isolated min-of-3 at sf0.1 measured the
    # variants within noise locally, but projection-first is strictly
    # less shuffled data at scale.)
    d = fan_out(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        ),
        spark,
    )
    return d.mapInPandas(decode_meta_batches, DECODE_META_SCHEMA)


@register(
    "udf_scalar",
    oracle="""
        SELECT event_id, round((value - 50.0) / 25.0, 6) AS value_z
        FROM events
    """,
    doc="Scalar pandas UDF (Arrow-vectorized, series→series): normalized "
        "value z-score against broadcast constants. Oracle-checkable "
        "because (v-50)/25 is bit-exact IEEE arithmetic on both engines — "
        "the check proves the Arrow boundary round-trips doubles losslessly.",
    scale_notes="pandas_udf transfers columnar Arrow batches — the only "
                "acceptable Python hot path; a row-at-a-time F.udf here "
                "would be 10-100× slower.",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        return (v - 50.0) / 25.0

    e = load(spark, sf_dir, "events")
    return e.select("event_id", F.round(zscore(F.col("value")), 6).alias("value_z"))


@register(
    "frame_sample",
    oracle="""
        SELECT doc_id, CAST(f AS INTEGER) AS frame_idx
        FROM (
            SELECT doc_id, unnest(range(1, octet_length(encode(text)) % 5 + 2)) AS f
            FROM documents
        )
    """,
    doc="Frame sampling (UDTF-shaped): one output row per sampled frame of "
        "each media payload — explode of a generator over the decoded "
        "frame count.",
    scale_notes="Row expansion happens JVM-side via explode(sequence(...)); "
                "the Python decoder only reports counts per Arrow batch.",
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        ),
        spark,
    )
    meta = d.mapInPandas(decode_meta_batches, DECODE_META_SCHEMA)
    return meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n_frames"))).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("int").alias("frame_idx"))


@register(
    "image_resize",
    oracle=f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT)            AS n_bytes,
                   CAST(octet_length(encode(text)) % 64 + 16 AS INTEGER) AS width,
                   CAST((octet_length(encode(text)) // 64) % 64 + 16
                        AS INTEGER)                                      AS height
            FROM documents
        )
        SELECT doc_id, n_bytes, width, height,
               CAST(width AS BIGINT) * height * (width + height - 2) // 2 AS px_sum,
               CAST(greatest(1, (width * {RESIZE_TARGET})
                                // greatest(width, height)) AS INTEGER)  AS out_w,
               CAST(greatest(1, (height * {RESIZE_TARGET})
                                // greatest(width, height)) AS INTEGER)  AS out_h
        FROM m
    """,
    doc=f"Image resize (U8 'resize' verb), REAL end-to-end for PNG: the "
        "kernel synthesizes a real PNG per payload (dims from the "
        "byte-length rule, gray pixel (x,y) = x+y), then genuinely "
        "decodes it with the stdlib codec (zlib inflate + scanline "
        "defilter, functions/png_codec.py), pixel-sums the decoded "
        f"image, nearest-neighbor resizes to max side {RESIZE_TARGET}, "
        "re-encodes, and re-decodes the output to report its measured "
        "dimensions. The oracle restates the generation rule: dims from "
        "byte length, px_sum = w*h*(w+h-2)/2 (closed form of Σ(x+y)), "
        "resize dims by exact floor division. NotImplementedError now "
        "remains only for non-PNG codecs (PIL absent).",
    scale_notes="Identical envelope to multimodal_meta: project to "
                "(doc_id, payload) before the fan-out so the exchange "
                "carries only kernel inputs, then one mapInPandas pass — "
                "Arrow batches across the Python boundary, no per-row "
                "serialization, no shuffle after the kernel. The codec "
                "work is per-row numpy (vectorized defilter/resample); "
                "output size is bounded by target², so downstream "
                "partitions shrink rather than grow.",
)
def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        ),
        spark,
    )
    return d.mapInPandas(png_resize_batches, PNG_RESIZE_SCHEMA)


@register(
    "audio_feature",
    oracle="""
        WITH d AS (
            SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        )
        SELECT d.doc_id,
               CAST(d.n AS BIGINT)           AS n_bytes,
               CAST(d.n // 256 + 1 AS BIGINT) AS n_windows,
               sqrt(CAST(sum(((t.i * 2654435761 + d.n) % 65536 - 32768)
                             * ((t.i * 2654435761 + d.n) % 65536 - 32768))
                         AS DOUBLE)
                    / (d.n // 4 + 8)) / 32768.0 AS rms
        FROM d, LATERAL (SELECT unnest(range(d.n // 4 + 8)) AS i) t
        GROUP BY d.doc_id, d.n
    """,
    doc="Audio feature extraction (U8 'feature-extract' verb), REAL "
        "end-to-end for WAV: the kernel synthesizes a real RIFF/WAVE "
        "PCM16 file per payload (sample rule s_i = ((i*2654435761+n) % "
        "65536) - 32768 over the byte length n), genuinely parses the "
        "container + PCM frames with the stdlib wave reader "
        "(functions/wav_codec.py), and computes RMS from the DECODED "
        "samples. The sum of squares is exact int64 on both engines, so "
        "sqrt(sum_sq/n_samples)/32768 is bit-identical (IEEE division + "
        "correctly-rounded sqrt + exact power-of-two scale) — no "
        "rounding needed. NotImplementedError remains only for "
        "perceptual codecs (mp3/opus) with no in-container library.",
    scale_notes="One mapInPandas pass over projected (doc_id, payload) "
                "batches — the same no-shuffle scan-transform envelope as "
                "the other multimodal kernels. A real extractor emits a "
                "fixed-width vector per payload, so output bytes are "
                "per-row constant and the stage pipelines into whatever "
                "keyed aggregate consumes the features.",
)
def audio_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        ),
        spark,
    )
    return d.mapInPandas(wav_feature_batches, AUDIO_FEATURE_SCHEMA)


@register(
    "audio_resample",
    oracle="""
        WITH d AS (
            SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        )
        SELECT d.doc_id,
               CAST(d.n AS BIGINT)                         AS n_bytes,
               CAST(16000 AS INTEGER)                      AS sr_in,
               CAST(8000 AS INTEGER)                       AS sr_out,
               CAST(d.n // 4 + 8 AS BIGINT)                AS n_in,
               CAST((d.n // 4 + 8 + 1) // 2 AS BIGINT)     AS n_out,
               sqrt(CAST(sum(((t.i * 2654435761 + d.n) % 65536 - 32768)
                             * ((t.i * 2654435761 + d.n) % 65536 - 32768))
                         AS DOUBLE)
                    / ((d.n // 4 + 8 + 1) // 2)) / 32768.0 AS rms_out
        FROM d, LATERAL (
            SELECT unnest(range(0, d.n // 4 + 8, 2)) AS i
        ) t
        GROUP BY d.doc_id, d.n
    """,
    doc="Audio resampling (U8 'resample' verb), REAL end-to-end for "
        "WAV: the kernel synthesizes a real 16 kHz PCM16 file per "
        "payload, genuinely decodes it, decimates by 2 (every other "
        "frame — the exact-integer downsample), re-encodes at 8 kHz, "
        "and RE-DECODES the output — reported sample count, rate and "
        "RMS come out of the second container parse, not the "
        "generation rule. The oracle restates the even-index sample "
        "rule; the RMS is bit-identical (exact int64 sum of squares, "
        "IEEE division, correctly-rounded sqrt, power-of-two scale).",
    scale_notes="Same no-shuffle scan-transform envelope as the other "
                "multimodal kernels: project to (doc_id, payload), one "
                "Arrow-batched mapInPandas pass, numpy-vectorized "
                "decimation per payload. Output frames are half the "
                "input size, so downstream partitions shrink — the "
                "resample belongs BEFORE any shuffle that moves audio.",
)
def audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(
        load(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
        ),
        spark,
    )
    return d.mapInPandas(wav_resample_batches, WAV_RESAMPLE_SCHEMA)
