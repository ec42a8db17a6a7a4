"""Window functions: SURVEY.md §2.7 (W1-W4).

All window specs carry a deterministic total order (unique-key
tie-break) so results are reproducible and hash-comparable against
the oracle. A window over partitionBy(k) costs one hash shuffle on k
plus an in-partition sort — the same envelope as a groupBy, and AQE
coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load


@register(
    "window_rank",
    oracle="""
        SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal,
               row_number() OVER w AS rn,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4)     OVER w AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    doc="Ranking family: row_number, rank, dense_rank, ntile per nation by balance.",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 4).alias("acctbal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag",
    oracle="""
        SELECT event_id, user_id, ts,
               round(value, 4)                           AS value,
               round(lag(value)  OVER w, 4)              AS prev_value,
               round(lead(value) OVER w, 4)              AS next_value,
               round(first_value(value) OVER w, 4)       AS first_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="Analytic family: lag, lead, first_value over per-user event streams.",
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        F.round(F.first("value").over(w), 4).alias("first_value"),
    )


@register(
    "window_frame",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
               round(avg(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
        FROM orders
    """,
    doc="Frame specs: running total (unbounded preceding) + 3-row moving average.",
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(
            F.sum("o_totalprice").over(base.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(base.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@register(
    "topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS total, rn AS k
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    doc="Top-k per group: 3 largest orders per customer via row_number.",
    scale_notes="row_number + filter(rn<=k) lets Spark's WindowGroupLimit "
                "(rank-limit pushdown) drop rows before the full sort "
                "materializes — the scalable top-k-per-group idiom.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("total"),
            F.col("rn").alias("k"),
        )
    )


@register(
    "window_distribution",
    oracle="""
        SELECT c_custkey, c_nationkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6)    AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution window family: percent_rank + cume_dist of each "
        "customer's balance within their nation (the relative-standing "
        "analytics the ranking family doesn't cover).",
    scale_notes="Same single shuffle as the ranking window — both "
                "functions evaluate in one pass over the sorted "
                "partition. The (acctbal, custkey) tiebreak makes every "
                "rank unique, so peer-group semantics can't diverge "
                "between engines.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_range_frame",
    # RANGE frame over integer order keys: both engines define the frame
    # as all peers within [current-6, current] days — epoch-day ints keep
    # the bound arithmetic exact (no interval-type coercion differences).
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
               ), 4) AS total_7d,
               CAST(count(*) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_7d
        FROM orders
    """,
    doc="Value-bounded RANGE frame: each order's trailing-7-day spend per "
        "customer (sum + count over RANGE 6 PRECEDING on epoch days) — "
        "the time-sliding frame the ROWS family can't express when event "
        "spacing is irregular.",
    scale_notes="Same single shuffle as any customer-partitioned window; "
                "the RANGE frame is evaluated with a sliding aggregate "
                "over the sorted run, not a self-join — at 100 TB this "
                "replaces the classic O(n·k) 'join the last 7 days to "
                "itself' anti-pattern with one sort per partition.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    day = F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 4).alias("total_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


CORR_FRAME = 20  # rolling_corr: trailing observations per user


@register(
    "rolling_corr",
    # Pearson r from the five frame sums (the portable formula — engines'
    # built-in corr() differ in degenerate-case handling); nullif guards
    # zero variance to NULL identically on both sides.
    oracle=f"""
        SELECT event_id, user_id,
               round(
                   (n * sxy - sx * sy)
                   / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0),
                   6) AS corr_vk
        FROM (
            SELECT event_id, user_id,
                   count(*)       OVER w AS n,
                   sum(x)         OVER w AS sx,
                   sum(y)         OVER w AS sy,
                   sum(x * x)     OVER w AS sxx,
                   sum(y * y)     OVER w AS syy,
                   sum(x * y)     OVER w AS sxy
            FROM (
                SELECT event_id, user_id, ts, value AS x,
                       CAST(json_extract(props, '$.k') AS DOUBLE) AS y
                FROM events
            )
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {CORR_FRAME - 1} PRECEDING AND CURRENT ROW)
        )
        WHERE n = {CORR_FRAME}
    """,
    doc=f"Rolling correlation: Pearson r between event value and the "
        f"props.k payload over each user's trailing {CORR_FRAME} events "
        "(emitted only for full frames) — the drift detector that flags "
        "when two signals that should co-move stop doing so. Computed "
        "from the five frame sums so the formula is engine-portable.",
    scale_notes="One shuffle on user_id; all five sums ride the SAME "
                "sorted window frame in one pass (Spark evaluates the "
                "shared frame once), state per row bounded at "
                f"O({CORR_FRAME}). The streaming twin is this formula "
                "over applyInPandasWithState with a ring buffer.",
)
def rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("double").alias("y"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(CORR_FRAME - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    sx, sy = F.sum("x").over(w), F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    corr = (n * sxy - sx * sy) / F.nullif(
        F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), F.lit(0.0)
    )
    return (
        e.select("event_id", "user_id", n.alias("n"), F.round(corr, 6).alias("corr_vk"))
        .filter(F.col("n") == CORR_FRAME)
        .drop("n")
    )
