"""Table access layer over the driver-generated parquet testdata.

One parquet file per table (TESTDATA.md). Reads go through
``spark.read.parquet`` so Catalyst gets vectorized scans, predicate
pushdown, and column pruning for free. At 100 TB each logical table
would be a partitioned parquet/Delta directory; nothing in the query
layer assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are fixed-cardinality; supplier/part/customer grow with SF
# but stay broadcastable through sf0.1 — join code still guards with
# explicit F.broadcast only where the 100 TB plan wants it).
SMALL_DIMS = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_events(df: DataFrame) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark only reads as
    int64 (spark.sql.legacy.parquet.nanosAsLong). Convert ns → µs with
    exact integer division (same truncation DuckDB applies), yielding a
    proper TimestampType column."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one logical table as a DataFrame."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Session-level, runtime-settable; required to read ns timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events(spark.read.parquet(table_path(sf_dir, name)))
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
