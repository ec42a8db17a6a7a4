"""Extended relational surface: the BigQuery/MySQL SQL constructs the
reference's delegated engines support beyond the basic operator set —
full outer join, PIVOT/UNPIVOT, scalar + correlated subqueries,
explicit GROUPING SETS, and the stateful-streaming query key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load, register_views


@register(
    "join_full",
    oracle="""
        SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nk,
               c.c_custkey, s.s_suppkey
        FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal < -900) c
        FULL OUTER JOIN
             (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_acctbal < 0) s
          ON c.c_nationkey = s.s_nationkey
    """,
    doc="Full outer join: both sides' unmatched rows preserved with NULLs.",
    scale_notes="Full outer forces sort-merge (no broadcast possible); both "
                "filters push below the join so only the slices shuffle.",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900).select(
        "c_custkey", "c_nationkey"
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey", "s_nationkey"
    )
    j = c.join(s, c.c_nationkey == s.s_nationkey, "outer")
    return j.select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nk"),
        "c_custkey",
        "s_suppkey",
    )


@register(
    "pivot_agg",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="PIVOT: rotate l_linestatus values into columns with a sum measure.",
    scale_notes="With an explicit value list, pivot is a single-pass "
                "conditional aggregation — no extra shuffle over a plain "
                "groupBy. Never omit the value list at scale (it adds a "
                "distinct-values job).",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return out


@register(
    "unpivot_stack",
    oracle="""
        SELECT c_custkey, metric, round(val, 4) AS val
        FROM (
            SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
            UNION ALL
            SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
        )
    """,
    doc="UNPIVOT/stack: rotate columns into (metric, value) rows.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    ).select("c_custkey", "metric", F.round("val", 4).alias("val"))


@register(
    "scalar_subquery",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 4) AS total
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
    doc="Scalar subquery in a predicate (above-1.5x-average orders).",
    scale_notes="Catalyst executes the scalar subquery once and folds the "
                "result into the main scan's filter — one extra tiny job, "
                "no join.",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 4) AS total
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


@register(
    "correlated_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
    """,
    doc="Correlated scalar subquery: orders above their customer's own "
        "average order value.",
    scale_notes="Catalyst de-correlates into an aggregate + equi-join on "
                "the correlation key — the shuffle profile of a join_inner, "
                "not a per-row re-execution.",
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (disjoint from rollup/cube shapes).",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "stateful_running",
    # The update-mode memory sink appends one row per (user, batch); the
    # row with the highest total_events per user is that user's final
    # state, which must equal the batch group-by — SQL-expressible, so
    # the cross-batch state machinery gets a real value-hash check.
    oracle="""
        SELECT user_id, count(*) AS total_events,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY user_id
    """,
    doc="Arbitrary stateful streaming (T8): applyInPandasWithState keeps "
        "per-user running totals across micro-batches (see "
        "streaming/stateful.py; cross-batch carry asserted in tests). "
        "Returns each user's final state, checked against the batch twin.",
    scale_notes="State is O(1) per user key and lives in the state store; "
                "production pairs it with a processing-time timeout for "
                "idle-key eviction.",
)
def stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.streaming.stateful import running_user_stats
    from pubsub2bq_spark.tables import normalize_events, table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = normalize_events(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    import uuid

    sink = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Update mode appends one row per (user, batch); keep each user's
    # final state (total_events strictly increases across a user's
    # batches, so max/max_by is exact).
    snap = spark.table(sink)
    return snap.groupBy("user_id").agg(
        F.max("total_events").alias("total_events"),
        F.max_by("total_value", "total_events").alias("total_value"),
    )


@register(
    "pipe_syntax",
    oracle="""
        SELECT c_nationkey, n, bal
        FROM (
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(c_acctbal), 2) AS bal
            FROM customer
            WHERE c_acctbal > 0
            GROUP BY c_nationkey
        )
        WHERE n > 1
    """,
    doc="SQL pipe syntax (Spark 4.1 `|>` operators, the GoogleSQL/"
        "BigQuery pipe-query surface the reference's sink engine "
        "exposes): FROM |> WHERE |> AGGREGATE..GROUP BY |> WHERE |> "
        "SELECT, oracle-checked against the equivalent nested ANSI "
        "form — proving the pipe form compiles to the same relational "
        "semantics.",
    scale_notes="Pure frontend sugar: the parser lowers each pipe stage "
                "onto the same logical plan nodes the ANSI form "
                "produces, so Catalyst sees an identical plan (filter "
                "pushed into the scan, partial/final hash aggregate). "
                "Zero runtime surface of its own — the win is query "
                "maintainability at the BigQuery-user migration "
                "boundary.",
)
def pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("pipe_customer")
    return spark.sql("""
        FROM pipe_customer
        |> WHERE c_acctbal > 0
        |> AGGREGATE count(*) AS n, round(sum(c_acctbal), 2) AS bal
             GROUP BY c_nationkey
        |> WHERE n > 1
        |> SELECT c_nationkey, n, bal
    """)
