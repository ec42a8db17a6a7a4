"""Join operators: SURVEY.md §2.5 (J1-J7).

Catalyst picks broadcast vs sort-merge vs shuffled-hash from stats +
AQE; we force broadcast explicitly only where the 100 TB plan knows
one side is a dimension table. The as-of join (J7) — which Spark
lacks natively — is composed from a union + ordered-window
last(ignorenulls), a single-shuffle formulation that scales linearly
(no per-group Python, no nested-loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load, materialize


@register(
    "join_inner",
    oracle="""
        SELECT c_nationkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    doc="Inner equi-join orders⋈customer + group aggregate.",
    scale_notes="At 100 TB: orders shuffles on o_custkey, customer on "
                "c_custkey (sort-merge); AQE converts to broadcast when the "
                "filtered build side fits. Pre-bucketing both tables on "
                "custkey removes the shuffle entirely.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


@register(
    "join_outer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 4) AS total
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        WHERE c_acctbal < -900.0
    """,
    doc="Left outer join preserving customers with no orders (NULL rows).",
    scale_notes="Outer joins can't broadcast the preserved side; filter is "
                "pushed below the join so only the c_acctbal<-900 slice shuffles.",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900.0)
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", F.round("o_totalprice", 4).alias("total")
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    doc="Left semi join (EXISTS): customers having a large order.",
    scale_notes="Semi join shuffles only distinct keys of the probe side; "
                "Catalyst pushes the o_totalprice filter below the join.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 350000)
    """,
    doc="Left anti join (NOT EXISTS): customers with no large orders "
        "(> 350000). In this synthetic data every customer has at least "
        "one order, so the unqualified anti-join would be vacuously empty "
        "— the price predicate keeps the result set exercised.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle="""
        SELECT p_brand, count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 10
        GROUP BY p_brand
    """,
    doc="Explicit broadcast join: fact lineitem ⋈ broadcast(dim part).",
    scale_notes="The dimension side is broadcast (F.broadcast) so the 100 TB "
                "fact table never shuffles — plan shows BroadcastHashJoin with "
                "the fact scan in one stage.",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_range",
    oracle="""
        SELECT s_suppkey, count(*) AS n_richer
        FROM supplier JOIN customer
          ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
        GROUP BY s_suppkey
    """,
    doc="Theta/range join: equi component on nationkey + range predicate on acctbal.",
    scale_notes="The equi conjunct keeps this a hash join (range predicate "
                "evaluated post-match) — never a nested loop. A pure range "
                "join would bucketize the range key first.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer"))
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    doc="Cross join of two tiny dimensions (5 × 25 rows).",
    scale_notes="Guarded: cross joins are only ever issued dim×dim; Catalyst "
                "uses BroadcastNestedLoopJoin.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_asof",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join: for each purchase, the most recent signup of the same "
        "user at-or-before the purchase time. Spark lacks a native ASOF "
        "join (reference sink engine has none either); composed as "
        "union + last(ignorenulls) over an ordered window.",
    scale_notes="One shuffle on user_id, one within-partition sort — same "
                "cost envelope as a sort-merge join. No per-group Python "
                "(beats applyInPandas/merge_asof at scale); skewed users can "
                "be range-salted by time.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(0).alias("side"),
        F.col("ts").alias("signup_ts_src"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("signup_ts_src"),
        F.col("event_id"),
    )
    # Order signups before purchases at equal ts → inclusive (ts >= signup ts)
    # asof semantics, matching DuckDB's ASOF JOIN.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = signups.unionByName(purchases).withColumn(
        "signup_ts", F.last("signup_ts_src", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select("event_id", "user_id", "ts", "signup_ts")


BLOOM_BITS = 1 << 16  # 64K buckets — the broadcastable filter domain
N_JOIN_SALT = 8


@register(
    "bloom_semi_reduction",
    # The pre-filter is semantics-preserving (false positives are removed
    # by the exact join), so the oracle is the PLAIN join — what the
    # operator must equal, not how it prunes.
    oracle="""
        SELECT count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
    """,
    doc="Bloom-style semi-join reduction, expressed relationally: the "
        "selective build side collapses to its DISTINCT 16-bit hash "
        "buckets (<=64K rows no matter how large the build side), that "
        "bucket set broadcasts, and the fact pre-filters on bucket "
        "membership before the exact join removes hash false positives. "
        "The manual twin of Spark's runtime row-group bloom filters "
        "(spark.sql.optimizer.runtime.bloomFilter), with the filter "
        "relation visible in the plan.",
    scale_notes="The point at 100 TB: the pre-filter join is a broadcast "
                "of AT MOST 64K ints even when the build side has "
                "millions of keys — the fact rows that survive are "
                "~selectivity + collision-rate, so the expensive exact "
                "join shuffles a fraction of the fact. Bucket count "
                "trades broadcast size against false-positive rate; "
                "xxhash64 keeps membership computation codegen'd.",
)
def bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sel = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).transform(materialize)  # selective slice, read by bucket-build AND exact join
    buckets = sel.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(BLOOM_BITS)).alias("bk")
    ).distinct()
    pre = li.withColumn(
        "bk", F.pmod(F.xxhash64("l_orderkey"), F.lit(BLOOM_BITS))
    ).join(F.broadcast(buckets), "bk", "left_semi")
    return (
        pre.join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


@register(
    "skew_salted_join",
    # Salting is result-preserving: the oracle is the plain join+aggregate.
    oracle="""
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    doc="Skew-resistant join via explicit salting: the probe side gets a "
        "deterministic salt in [0,N), the build side replicates N ways "
        "with every salt value, and the join runs on (key, salt) — no "
        "single reducer ever receives a whole hot key. Companion to "
        "skew_salted_agg; result identical to the plain join (the "
        "oracle).",
    scale_notes="The manual form of AQE's skew-join splitting, for when "
                "skew is known ahead of time (a celebrity user, a null-"
                "heavy key): N_SALT bounds the per-task share of a hot "
                "key at 1/N. Replication multiplies the build side N× — "
                "cheap for dimensions; for fact-fact skew, salt ONLY the "
                "hot keys (split the relation) so the tax isn't global.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    salts = spark.range(N_JOIN_SALT).select(F.col("id").cast("int").alias("salt"))
    o_salted = o.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_JOIN_SALT)).cast("int")
    )
    c_rep = c.crossJoin(F.broadcast(salts))
    return (
        o_salted.join(
            c_rep,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (o_salted.salt == c_rep.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .orderBy("c_mktsegment")
    )


# interval_join_binned: 200 deterministic 43-minute "campaign" windows
# laid out every 211 minutes from the stream's first midnight.
N_INTERVALS = 200
INTERVAL_STEP_S = 211 * 60
INTERVAL_LEN_S = 43 * 60
INTERVAL_BIN_S = 3600  # bin width >= interval length → <= 2 bins/interval


@register(
    "interval_join_binned",
    oracle=f"""
        WITH t0 AS (
            SELECT CAST(floor(epoch(min(ts)) / 86400) * 86400 AS BIGINT) AS t0
            FROM events
        ),
        intervals AS (
            SELECT CAST(i AS INT) AS interval_id,
                   t0.t0 + i * {INTERVAL_STEP_S}                      AS s,
                   t0.t0 + i * {INTERVAL_STEP_S} + {INTERVAL_LEN_S}   AS e
            FROM t0, (SELECT unnest(generate_series(0, {N_INTERVALS - 1})) AS i)
        )
        SELECT i.interval_id,
               count(ev.ts)                      AS n_events,
               round(coalesce(sum(ev.value), 0), 4) AS total
        FROM intervals i
        LEFT JOIN events ev
          ON epoch(ev.ts) >= i.s AND epoch(ev.ts) < i.e
        GROUP BY i.interval_id
    """,
    doc="Point-in-interval join, binned: events matched to containing "
        "campaign windows via a time-bucket equi-join instead of the "
        "naive theta join — the range-join optimization warehouses ship "
        "as 'range join hints'.",
    scale_notes="The oracle's theta join is O(points x intervals) — a "
                "nested-loop that dies at scale. The plan here explodes "
                "each interval to the <= 2 hour-bins it covers and "
                "equi-joins points on their bin (one keyed shuffle), "
                "then applies containment as a cheap residual filter: "
                "cost O(points + intervals) with bin-hash parallelism. "
                "Hot bins (flash events) salt like any skewed key; bin "
                "width tracks the max interval length.",
)
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    t0 = e.agg(
        (F.floor(F.unix_timestamp(F.min("ts")) / 86400) * 86400)
        .cast("bigint")
        .alias("t0")
    )
    intervals = (
        t0.select(
            F.explode(F.sequence(F.lit(0), F.lit(N_INTERVALS - 1))).alias("i"),
            "t0",
        )
        .select(
            F.col("i").cast("int").alias("interval_id"),
            (F.col("t0") + F.col("i") * INTERVAL_STEP_S).alias("s"),
            (F.col("t0") + F.col("i") * INTERVAL_STEP_S + INTERVAL_LEN_S).alias("e"),
        )
    )
    # Explode each interval to the hour-bins it covers (<= 2 by
    # construction), points carry exactly one bin → equi-join, no dupes.
    ibins = intervals.select(
        "interval_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / INTERVAL_BIN_S).cast("bigint"),
                F.floor((F.col("e") - 1) / INTERVAL_BIN_S).cast("bigint"),
            )
        ).alias("bin"),
    )
    pts = e.select(
        F.unix_timestamp("ts").alias("ep"),
        "value",
    ).withColumn("bin", F.floor(F.col("ep") / INTERVAL_BIN_S).cast("bigint"))
    hits = (
        ibins.join(pts, "bin")
        .filter((F.col("ep") >= F.col("s")) & (F.col("ep") < F.col("e")))
        .groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sv"),
        )
    )
    return (
        intervals.select("interval_id")
        .join(hits, "interval_id", "left")
        .select(
            "interval_id",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round(F.coalesce("sv", F.lit(0.0)), 4).alias("total"),
        )
    )


@register(
    "join_lateral",
    oracle="""
        SELECT n.n_nationkey, n.n_name, c.c_custkey, c.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) c
    """,
    doc="LATERAL (dependent) join: for every nation, the correlated "
        "subquery returns its own top-2 customers by balance — the SQL "
        "surface for per-row dependent computations (the BigQuery/"
        "standard-SQL LATERAL the reference's sink engine exposes). "
        "Identical SQL text runs on both engines.",
    scale_notes="Catalyst decorrelates the lateral subquery into a "
                "window-over-partition plan (rank per n_nationkey, "
                "filter <= 2) rather than re-executing per outer row — "
                "the same physical shape as topk_per_group, so cost is "
                "one hash shuffle on the correlation key plus an "
                "in-partition sort. A lateral that correlates on a "
                "high-cardinality key keeps that property; one with a "
                "non-equi correlation degrades to a nested-loop and "
                "should be rewritten as a range/bin join (the "
                "interval_join_binned pattern).",
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql("""
        SELECT n.n_nationkey, n.n_name, c.c_custkey, c.c_acctbal
        FROM lat_nation n, LATERAL (
            SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
            FROM lat_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) c
    """)
