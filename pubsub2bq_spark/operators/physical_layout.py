"""Physical-layout operators beyond clustered_write (SURVEY.md §2.11):
bucketed tables for shuffle-free co-located joins — the core 100 TB
join strategy (the reference's CLUSTER BY analog taken one step
further than row-group clustering).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load, scratch_dir

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
        tmp = scratch_dir("bucketq_")
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
        tmp = scratch_dir("part_orders_")
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


Z_BITS = 8          # bits interleaved per dimension
Z_BUCKET_SHIFT = 12  # 16-bit z-value >> 12 → 16 deterministic buckets


def _zval_sql(a: str, b: str) -> str:
    """16-bit Morton code: interleave the low 8 bits of a (odd positions)
    and b (even positions). Unrolled shift-and-mask — identical integer
    arithmetic on both engines."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i)}")
    return " + ".join(terms)


def _zval_col(a, b):
    """Spark twin of ``_zval_sql``: ((x >> i) & 1) * 2^(2i+1 | 2i)."""
    out = F.lit(0).cast("long")
    for i in range(Z_BITS):
        out = out + F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("long") * (
            1 << (2 * i + 1)
        )
        out = out + F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long") * (1 << (2 * i))
    return out


@register(
    "zorder_layout",
    oracle=f"""
        WITH z AS (
            SELECT l_partkey % 256 AS pk, l_suppkey % 256 AS sk,
                   ({_zval_sql('(l_partkey % 256)', '(l_suppkey % 256)')})
                       AS zval
            FROM lineitem
        )
        SELECT CAST(zval >> {Z_BUCKET_SHIFT} AS INTEGER) AS z_bucket,
               count(*) AS n_rows,
               CAST(min(pk) AS INTEGER) AS pk_min, CAST(max(pk) AS INTEGER) AS pk_max,
               CAST(min(sk) AS INTEGER) AS sk_min, CAST(max(sk) AS INTEGER) AS sk_max
        FROM z
        GROUP BY z_bucket
        ORDER BY z_bucket
    """,
    doc="Z-order (Morton) multi-dimensional clustering: interleave the "
        "bits of two join/filter keys, bucket rows by the z-value prefix, "
        "and report per-bucket min/max ranges of BOTH keys — the layout "
        "that lets a scan prune files for predicates on either dimension "
        "(single-key clustering prunes only its own key).",
    scale_notes="The z-value is pure per-row bit math (codegen'd); "
                "bucketing by z-prefix is deterministic (no sampled range "
                "boundaries), so the write path is repartitionByRange-free."
                " Per-bucket min/max on both dims stay narrow — that "
                "narrowness IS the file-skipping guarantee; the aggregate "
                "output is bucket-cardinality.",
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pk = (F.col("l_partkey") % 256).cast("int")
    sk = (F.col("l_suppkey") % 256).cast("int")
    z = li.select(pk.alias("pk"), sk.alias("sk")).withColumn(
        "zval", _zval_col(F.col("pk"), F.col("sk"))
    )
    return (
        z.groupBy(
            F.shiftright(F.col("zval"), Z_BUCKET_SHIFT).cast("int").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pk").alias("pk_min"),
            F.max("pk").alias("pk_max"),
            F.min("sk").alias("sk_min"),
            F.max("sk").alias("sk_max"),
        )
        .orderBy("z_bucket")
    )


COMPACT_SMALL_FILES = 32
COMPACT_TARGET_FILES = 4


@register(
    "file_compaction",
    # The literal file counts are REAL assertions: the operator reports
    # os-listed parquet counts before/after, so a compaction that writes
    # the wrong number of files (or loses rows) hash-mismatches.
    oracle=f"""
        SELECT count(*) AS n_rows,
               {COMPACT_SMALL_FILES} AS files_before,
               {COMPACT_TARGET_FILES} AS files_after,
               round(sum(value), 4) AS total_value
        FROM events
    """,
    doc="Small-file compaction: the table-maintenance pass every "
        "streaming sink needs — a fragmented table (32 small files, the "
        "micro-batch residue) is rewritten into 4 right-sized files via "
        "coalesce, preserving rows and values exactly. Reports actual "
        "file counts from the filesystem, checked against the expected "
        "literals.",
    scale_notes="coalesce(N) merges partitions WITHOUT a shuffle — "
                "compaction is a read+write, never an exchange. At 100 TB "
                "this runs per partition-directory with target file size "
                "~512MB-1GB (files_target = partition_bytes/target), and "
                "only on partitions whose small-file count crosses a "
                "threshold; a transactional table format makes the swap "
                "atomic where plain parquet needs a directory rename.",
)
def file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    e = load(spark, sf_dir, "events")
    frag = os.path.join(scratch_dir("compactq_"), "frag")
    e.repartition(COMPACT_SMALL_FILES).write.parquet(frag)

    def n_parquet(path: str) -> int:
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))

    files_before = n_parquet(frag)
    compacted = os.path.join(os.path.dirname(frag), "compacted")
    spark.read.parquet(frag).coalesce(COMPACT_TARGET_FILES).write.parquet(compacted)
    files_after = n_parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(files_before).alias("files_before"),
        F.lit(files_after).alias("files_after"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
