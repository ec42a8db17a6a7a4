"""Composite analytical queries: TPC-H-shaped flagships that exercise
the whole optimizer path at once — multi-way joins with broadcast dims,
pushed-down date predicates, partial-aggregated group-bys, and top-k.

The reference's sink engine (BigQuery) runs exactly this query class
over the delivered tables (`/root/reference/README.md:199-214` treats
the sink as a general SQL engine); these keys prove the engine handles
the composed workload, not just the single-operator inventory.

Shapes follow TPC-H Q1 / Q3 / Q5 adapted to the driver's TPC-H-ish
schema (no comment/address columns; dates are timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load


@register(
    "tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4)                                   AS sum_qty,
               round(sum(l_extendedprice), 4)                              AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               round(avg(l_quantity), 4)                                   AS avg_qty,
               round(avg(l_extendedprice), 4)                              AS avg_price,
               round(avg(l_discount), 4)                                   AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: pricing summary report — single-pass scan with "
        "eight aggregates over two grouping columns.",
    scale_notes="The canonical map-heavy aggregation: every aggregate is "
                "partial-aggregated in the scan stage, the shuffle carries "
                "one row per (flag,status) pair per task. The 100 TB cost "
                "is the scan alone; date predicate + 7-column projection "
                "both reach the parquet reader.",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: shipping-priority top-10 — customer⋈orders⋈"
        "lineitem with selective predicates on all three tables, revenue "
        "aggregation, and TakeOrderedAndProject for the limit.",
    scale_notes="Filters push below the joins so only the BUILDING slice "
                "of customers and the pre-1998-03-15 orders shuffle; the "
                "filtered customer side is broadcast-size even at large SF "
                "(AQE switches join strategy at runtime). The final top-10 "
                "never materializes the full sorted result.",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    doc="TPC-H Q5 shape: local-supplier revenue by nation — six-way join "
        "(two fact tables, four dims) with a region filter and a one-year "
        "order-date window.",
    scale_notes="The dim chain (region→nation→supplier slice) broadcasts; "
                "the only real shuffles are the fact-fact orders⋈lineitem "
                "and the customer join. Join order matters at 100 TB — "
                "expressing it declaratively lets Catalyst/AQE reorder "
                "and pick broadcast strategies from runtime sizes.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )
