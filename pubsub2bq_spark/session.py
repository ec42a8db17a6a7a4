"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); production posture is a
multi-executor cluster — every config here is chosen to be correct in
both: AQE on (runtime partition coalescing, skew-join splitting,
join-strategy switching), Arrow on (vectorized Python interop), UTC
session timezone (parity with the DuckDB oracle and with parquet
instant semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "pubsub2bq_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Shuffle parallelism ~ cores for local runs; on a real cluster AQE
        # coalesces from a higher initial number, so this is the floor.
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        # AQE: runtime re-planning — partition coalescing, skew-join
        # handling, sort-merge→broadcast switching. Core of the 100 TB story.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Split size for file scans. The test tables are single ~1-40 MB
        # parquet files, which the 128 MB default turns into ONE scan task —
        # serializing every query on one core. 4 MB splits fan the scan out
        # across local cores (2-3x on the bench suite). On a real cluster
        # against 100 TB (thousands of files), raise via env to the 128 MB
        # default so task count stays sane: tasks ~= bytes / maxPartitionBytes.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.sql.files.openCostInBytes", "262144")
        # Arrow for any pandas_udf / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics (== DuckDB oracle).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark reads it only as
        # int64. Set at session construction so no operator has to mutate
        # session state mid-flight (tables.load / streaming readers still
        # set it defensively for vanilla driver-built sessions — always
        # the same value, so there is no cross-query behavior change).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # 8g measured strictly better than 16g on the bench suite (16.8s vs
        # 44.4s total): the larger heap traded frequent short GCs for
        # multi-second pauses that hit even trivial queries. Keep the heap
        # small enough that full collections stay cheap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
