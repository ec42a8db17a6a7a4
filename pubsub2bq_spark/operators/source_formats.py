"""Source/sink format breadth (SURVEY.md §2.1, S7 family): CSV and JSON
round-trips through explicit schemas — the other load paths BigQuery's
LOAD DATA supports besides parquet. Each query writes a slice from the
canonical table, reads it back through the format, and aggregates;
the oracle states the same aggregate over the original table, so the
hash check proves the round-trip is lossless.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load

_SLICE_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
    ]
)

_ORACLE = """
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
"""


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty")
    )


@register(
    "csv_load",
    oracle=_ORACLE,
    doc="CSV source round-trip: write with header, read back with an "
        "explicit schema (never inferSchema in production — it double-scans).",
    scale_notes="CSV is the slowest columnar-less path: no pushdown, no "
                "pruning, full-row parse. Supported for ingest; convert to "
                "parquet at the staging boundary.",
)
def csv_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="csvq_")
    _slice(spark, sf_dir).write.mode("overwrite").option("header", True).csv(f"{tmp}/li")
    back = spark.read.schema(_SLICE_SCHEMA).option("header", True).csv(f"{tmp}/li")
    return _agg(back)


@register(
    "json_load",
    oracle=_ORACLE,
    doc="Newline-JSON source round-trip with an explicit schema (the "
        "format of the emulated CDC spool).",
    scale_notes="JSON parse is CPU-heavy but parallel; schema explicit so "
                "no inference scan. Staging converts to parquet.",
)
def json_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="jsonq_")
    _slice(spark, sf_dir).write.mode("overwrite").json(f"{tmp}/li")
    back = spark.read.schema(_SLICE_SCHEMA).json(f"{tmp}/li")
    return _agg(back)


@register(
    "orc_load",
    oracle=_ORACLE,
    doc="ORC source round-trip (columnar alternative to parquet; "
        "pushdown + pruning preserved).",
)
def orc_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="orcq_")
    _slice(spark, sf_dir).write.mode("overwrite").orc(f"{tmp}/li")
    back = spark.read.orc(f"{tmp}/li")
    return _agg(back)


@register(
    "binary_load",
    # rows-only by necessity: the oracle SQL runs against pre-registered
    # table VIEWS with no filesystem access, and the raw file bytes are
    # not derivable from the views. (DuckDB read_blob() could hash the
    # same files, but the oracle string is static while the sf dir
    # differs between the driver's run and local tests.) The content
    # check lives in tests/test_round2_ops.py instead.
    oracle=None,
    doc="Multimodal ingest path (SURVEY.md §2.10 U8): spark.read.format"
        "('binaryFile') over the dataset directory — one row per file with "
        "(path, length, content). Returns per-file name, size, and the md5 "
        "of the raw bytes: the pattern for loading opaque image/audio/video "
        "payloads as binary columns with metadata.",
    scale_notes="binaryFile reads are file-parallel (one task per file up "
                "to maxPartitionBytes); at 100 TB payloads stay in object "
                "storage and this scan carries references + bytes straight "
                "into mapInPandas decode kernels (see multimodal_meta).",
)
def binary_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )
