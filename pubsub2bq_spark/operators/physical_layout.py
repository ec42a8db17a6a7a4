"""Physical-layout operators beyond clustered_write (SURVEY.md §2.11):
bucketed tables for shuffle-free co-located joins — the core 100 TB
join strategy (the reference's CLUSTER BY analog taken one step
further than row-group clustering).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load

N_BUCKETS = 8

# applicationId -> sf_dir currently materialized as bucketed.* tables.
# The bucket write is a one-time layout investment (like building an
# index); steady-state queries join the already-bucketed tables, so
# repeated calls in one session must not re-pay the write. A different
# sf_dir forces a rebuild (the table names are shared). Keyed on
# applicationId (unique per context — id() values can be recycled after
# GC) and double-checked against the catalog, since a new session in
# the same process starts with a fresh catalog.
_BUCKETED_READY: dict[str, str] = {}


@register(
    "bucketed_join",
    oracle="""
        SELECT c_nationkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    doc="Co-located join on bucketed tables: both sides written with "
        "bucketBy(custkey), so the join runs with ZERO exchanges (plan "
        "asserted shuffle-free in tests) — same result as join_inner.",
    scale_notes="THE fact-fact join strategy at 100 TB: pay the bucket "
                "shuffle once at write time, then every join/agg on the "
                "bucket key is exchange-free forever. Bucket count sized to "
                "target ~128-512 MB per bucket file.",
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = spark.sparkContext.applicationId
    if _BUCKETED_READY.get(ctx) != sf_dir or not spark.catalog.tableExists(
        "bucketed.orders_b"
    ):
        tmp = tempfile.mkdtemp(prefix="bucketq_")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{tmp}/db'")
        spark.sql("DROP TABLE IF EXISTS bucketed.orders_b")
        spark.sql("DROP TABLE IF EXISTS bucketed.customer_b")
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{tmp}/orders_b")
            .saveAsTable("bucketed.orders_b")
        )
        (
            load(spark, sf_dir, "customer")
            .write.bucketBy(N_BUCKETS, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{tmp}/customer_b")
            .saveAsTable("bucketed.customer_b")
        )
        _BUCKETED_READY[ctx] = sf_dir
    o = spark.table("bucketed.orders_b")
    c = spark.table("bucketed.customer_b")
    # MERGE hint: at test scale Catalyst would broadcast the small side,
    # which hides the point — force the sort-merge path to demonstrate the
    # exchange-free bucket join (at 100 TB fact-fact scale, SMJ is what
    # you'd get anyway and the broadcast wouldn't fit).
    return (
        o.hint("merge").join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


# applicationId -> (sf_dir, path) of the partitioned-orders layout.
_PARTITIONED_READY: dict[str, tuple[str, str]] = {}


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders laid out as a year-partitioned parquet table (written once
    per session+dataset, like the bucketed twins above — layout is an
    investment, not a per-query cost)."""
    import os

    ctx = spark.sparkContext.applicationId
    ready = _PARTITIONED_READY.get(ctx)
    if ready is None or ready[0] != sf_dir or not os.path.isdir(ready[1]):
        tmp = tempfile.mkdtemp(prefix="part_orders_")
        (
            load(spark, sf_dir, "orders")
            .withColumn("o_year", F.year("o_orderdate"))
            .write.partitionBy("o_year")
            .mode("overwrite")
            .parquet(tmp)
        )
        _PARTITIONED_READY[ctx] = (sf_dir, tmp)
    return spark.read.parquet(_PARTITIONED_READY[ctx][1])


@register(
    "partition_pruned_join",
    oracle="""
        SELECT fy, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total
        FROM (
            SELECT o_orderpriority, o_totalprice,
                   'fy' || CAST(year(o_orderdate) % 100 AS VARCHAR) AS fy
            FROM orders
        )
        WHERE fy = 'fy98'
        GROUP BY fy, o_orderpriority
    """,
    doc="Dynamic partition pruning: the fact table is year-partitioned "
        "parquet; the query filters a derived fiscal-year dimension and "
        "joins it on the partition column, so Spark prunes fact partitions "
        "at RUNTIME from the dim's surviving keys (plan shows "
        "dynamicpruning in PartitionFilters) — only the fy98 directory is "
        "ever scanned.",
    scale_notes="The other half of the layout story next to bucketing: "
                "partition on the dominant filter/join dimension (time), "
                "and dim-driven queries read only matching partitions. At "
                "100 TB this is the difference between scanning one year "
                "and scanning the table; DPP makes it work even when the "
                "partition keys only emerge from a dimension filter at "
                "runtime.",
)
def partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _partitioned_orders(spark, sf_dir)
    fy = (F.concat(F.lit("fy"), (F.col("o_year") % 100).cast("string"))).alias("fy")
    dim = o.select("o_year").distinct().select("o_year", fy).filter(F.col("fy") == "fy98")
    return (
        o.join(F.broadcast(dim), "o_year")
        .groupBy("fy", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )
