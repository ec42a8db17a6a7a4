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


@register(
    "tpch_q6",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: forecasting-revenue-change — a pure scan-filter-"
        "aggregate with three range predicates and no grouping.",
    scale_notes="The degenerate-but-important shape: at 100 TB this is a "
                "scan whose cost is decided entirely by pushdown. All three "
                "predicates reach the parquet reader (row-group min/max "
                "skipping on l_shipdate after a clustered write), the "
                "projection is 4 columns, and the aggregation is a single "
                "partial-combined scalar — the shuffle carries one row per "
                "task.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q10",
    oracle="""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               round(c_acctbal, 4) AS c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue report — customer⋈orders⋈"
        "lineitem⋈nation with a quarter-long order window and a returnflag "
        "filter, top-20 customers by lost revenue.",
    scale_notes="Both selective predicates sit on the fact side and push to "
                "the scans; nation broadcasts. The group-by key includes "
                "customer attributes so the aggregate shuffles once keyed "
                "on c_custkey — carrying the dims through the agg beats a "
                "second post-agg join at this dim cardinality. Top-20 is "
                "TakeOrderedAndProject: no global sort materializes.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 4).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q18",
    oracle="""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 150
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 4) AS o_totalprice,
               round(sum(l_quantity), 4) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 100
    """,
    doc="TPC-H Q18 shape: large-volume customers — a self-referential "
        "semi-join (orders whose lineitems sum past a quantity threshold) "
        "feeding a customer⋈orders⋈lineitem aggregate, top-100.",
    scale_notes="The HAVING subquery is a full lineitem aggregate, but it "
                "reduces to (orderkey, sum) — tiny relative to the fact — "
                "and joins back as a left-semi on the already-shuffled "
                "l_orderkey key, so AQE can reuse the exchange. The "
                "threshold makes `big` highly selective at any SF; the "
                "final agg only sees the surviving orders.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(
        F.col("q") > 150
    ).select("l_orderkey")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )
