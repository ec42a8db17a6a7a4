"""Table access layer over the driver-generated parquet testdata.

One parquet file per table (TESTDATA.md). Reads go through
``spark.read.parquet`` so Catalyst gets vectorized scans, predicate
pushdown, and column pruning for free. At 100 TB each logical table
would be a partitioned parquet/Delta directory; nothing in the query
layer assumes single-file inputs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

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


_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Temp dir for operator-local spools/sinks, rooted under ONE
    per-process directory that is removed at interpreter exit — so a
    bench/test run can execute hundreds of temp-writing operators without
    leaking data copies into /tmp across runs. Operators whose temp data
    is large relative to their input should still rmtree eagerly."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        root = tempfile.mkdtemp(prefix="pubsub2bq_scratch_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SCRATCH_ROOT = root
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize `ts` to TimestampType regardless of how the parquet was
    written. Generated data has shipped as TIMESTAMP(NANOS) — which Spark
    only reads as int64 (spark.sql.legacy.parquet.nanosAsLong) — and as
    TIMESTAMP(MICROS) without the UTC flag, which reads as TIMESTAMP_NTZ.
    ns → µs uses exact integer division (same truncation DuckDB applies);
    NTZ → LTZ is value-identical because the session timezone is pinned to
    UTC (session.py). Downstream epoch arithmetic (`unix_micros`) and
    watermarks then see one stable type everywhere."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def fan_out(df: DataFrame, spark: SparkSession, target: int | None = None) -> DataFrame:
    """Spread a CPU-dense per-row stage across all cores.

    Parquet can't be split finer than a row group, so a tiny single-row-group
    file scans as ONE task — serializing per-row-heavy stages (gram hashing,
    minhash shingles, cosine folds) on one core no matter the cluster size.
    When the incoming plan has fewer partitions than ``target`` (default:
    ``defaultParallelism``) insert a round-robin repartition; otherwise
    return the frame untouched. At 100 TB the scan already has thousands of
    splits, so this is a structural no-op there — the shuffle only ever
    moves a sub-core-count amount of data.
    """
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
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
