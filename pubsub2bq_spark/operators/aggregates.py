"""Aggregation operators: SURVEY.md §2.6 (A1-A7).

All hash aggregations get map-side partial aggregation for free from
Catalyst (partial_sum/partial_count before the shuffle). The
privacy-threshold aggregate (A6) re-implements the reference's
clean-room aggregation-threshold policy
(/root/reference/sql/sp_demo_cleanroom.sql:51-57) as a view wrapper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.functions.privacy import threshold_gated_agg
from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load, materialize


@register(
    "groupby_agg",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 4)                                   AS sum_qty,
            round(sum(l_extendedprice), 4)                              AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
            round(avg(l_quantity), 4)                                   AS avg_qty,
            round(avg(l_extendedprice), 4)                              AS avg_price,
            round(avg(l_discount), 4)                                   AS avg_disc,
            count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped hash aggregate: 2 group keys, 8 aggregates.",
    scale_notes="Partial (map-side) + final hash agg; group-key cardinality "
                "is tiny (≤6) so the shuffle moves only partial states. The "
                "canonical 100 TB-friendly aggregation.",
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "count_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS nd_part,
               count(DISTINCT l_suppkey) AS nd_supp,
               count(*)                  AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Exact distinct counting per group (two distinct aggregates + plain count).",
    scale_notes="Multiple distincts expand to Expand + two-phase agg; at "
                "100 TB prefer approx_count_distinct unless exactness is required.",
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_part"),
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "approx_distinct",
    # The HLL point estimate is engine-specific, so it can't be hash-
    # compared. What IS the portable contract is the error bound: the
    # approx count must land within 5×rsd of the exact count. The Spark
    # side computes that boolean; the oracle asserts it literally TRUE,
    # so the driver hash-checks the bound instead of skipping the key.
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_nd_part,
               count(*) AS n_rows,
               TRUE AS within_5rsd
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Approximate count-distinct (HyperLogLog++): the 100 TB-scale "
        "substitute for exact distinct. The sketch estimate is engine-"
        "specific, so the checked contract is |approx-exact| <= 5×rsd×exact.",
    scale_notes="Constant-memory sketch, single shuffle of fixed-size "
                "states; rsd=0.01 keeps error ~1%. (The exact countDistinct "
                "here exists only to verify the bound at test scale.)",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
            F.countDistinct("l_partkey").alias("exact_nd_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "exact_nd_part",
            "n_rows",
            (
                F.abs(F.col("approx") - F.col("exact_nd_part"))
                <= F.col("exact_nd_part") * F.lit(0.05)
            ).alias("within_5rsd"),
        )
    )


@register(
    "rollup_agg",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP: hierarchical subtotals incl. grand total (NULL group keys).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_agg",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all grouping-set combinations of two keys.",
    scale_notes="Expand multiplies input by #grouping-sets before the "
                "shuffle — acceptable for low-cardinality keys; for wide "
                "cubes at 100 TB, compute per-set aggs and union instead.",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@register(
    "having_filter",
    oracle="""
        SELECT o_custkey,
               count(*) AS n_orders,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4)
                   AS closed_total
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 10
    """,
    doc="Conditional aggregate (FILTER/CASE inside sum) + HAVING on the group.",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 4
            ).alias("closed_total"),
        )
        .filter(F.col("n_orders") >= 10)
    )


@register(
    "stats_agg",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4)            AS qty_stddev,
               round(var_samp(l_quantity), 4)               AS qty_var,
               round(median(l_quantity), 4)                 AS qty_median,
               round(quantile_cont(l_quantity, 0.9), 4)     AS qty_p90,
               round(min(l_quantity), 4)                    AS qty_min,
               round(max(l_quantity), 4)                    AS qty_max
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev, variance, exact median and "
        "interpolated percentile, min/max.",
    scale_notes="Exact percentile/median sort per group — fine for few "
                "groups; at 100 TB switch to percentile_approx (t-digest "
                "sketch, constant memory).",
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("qty_median"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("qty_p90"),
        F.round(F.min("l_quantity"), 4).alias("qty_min"),
        F.round(F.max("l_quantity"), 4).alias("qty_max"),
    )


@register(
    "privacy_threshold_agg",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY o_orderstatus
        HAVING count(DISTINCT o_custkey) >= 2
    """,
    doc="Aggregation-threshold (clean-room privacy) view: aggregates are "
        "answered only for groups with >= 2 distinct privacy units "
        "(reference policy: threshold=2 on customer_id, "
        "/root/reference/sql/sp_demo_cleanroom.sql:51-57).",
    scale_notes="Gate = one extra count(distinct unit) per group, folded "
                "into the same aggregation pass.",
)
def privacy_threshold_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return threshold_gated_agg(
        o,
        group_cols=["o_orderstatus"],
        agg_exprs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        ],
        privacy_unit_col="o_custkey",
        threshold=2,
    )


N_SALT = 16


@register(
    "skew_salted_agg",
    oracle="""
        SELECT l_suppkey,
               count(*) AS n_items,
               round(sum(l_extendedprice), 4) AS revenue
        FROM lineitem
        GROUP BY l_suppkey
    """,
    doc="Skew-resistant aggregation: a salted two-stage groupBy "
        "(key, salt) -> key that produces the identical result to the "
        "plain aggregate (the oracle IS the plain GROUP BY).",
    scale_notes="The hot-key defense when one key holds a double-digit "
                "percent of rows: stage 1 spreads each key over N_SALT "
                "reducers, so no task receives a whole hot key; stage 2 "
                "combines N_SALT partial states per key — tiny. Same "
                "technique AQE's skew handling applies to joins, expressed "
                "manually for aggregations. Associative aggregates only; "
                "round(4) on both sides absorbs float reassociation.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(N_SALT)))
    partial = salted.groupBy("l_suppkey", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("l_extendedprice").alias("prev")
    )
    return partial.groupBy("l_suppkey").agg(
        F.sum("pn").alias("n_items"), F.round(F.sum("prev"), 4).alias("revenue")
    )


@register(
    "approx_quantiles",
    # The oracle checks the EXACT quantiles value-for-value and pins the
    # approximation-error bounds as literal-true booleans: the Spark side
    # computes |approx - exact| against the tolerance, so a sketch whose
    # error exceeds the bound flips the boolean and fails the hash match
    # (same pattern as approx_distinct's rsd check).
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4)       AS qty_p50_exact,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95_exact,
               TRUE AS qty_within_tol,
               TRUE AS price_within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Approximate quantiles (percentile_approx, accuracy 10k) checked "
        "against the exact interpolated percentile per group: |approx p50 "
        "quantity| within ±1.0, approx p95 price within 1% relative.",
    scale_notes="percentile_approx aggregates a fixed-size KLL-style "
                "sketch — partial-combinable, memory-bounded per group — "
                "where exact percentile must buffer the group. At 100 TB "
                "the exact twin is the thing you drop; the bound check is "
                "exactly the monitoring query that justifies dropping it.",
)
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty_exact = F.expr("percentile(l_quantity, 0.5)")
    qty_approx = F.expr("percentile_approx(l_quantity, 0.5, 10000)")
    price_exact = F.expr("percentile(l_extendedprice, 0.95)")
    price_approx = F.expr("percentile_approx(l_extendedprice, 0.95, 10000)")
    return li.groupBy("l_returnflag").agg(
        F.round(qty_exact, 4).alias("qty_p50_exact"),
        F.round(price_exact, 4).alias("price_p95_exact"),
        (F.abs(qty_approx - qty_exact) <= 1.0).alias("qty_within_tol"),
        (F.abs(price_approx - price_exact) <= 0.01 * F.abs(price_exact)).alias(
            "price_within_tol"
        ),
    )


@register(
    "hll_mergeable_sketch",
    # Exact distinct counts are hash-checked; the HLL estimates are pinned
    # by literal-true tolerance booleans (approx_distinct pattern). The
    # merge property — union of per-day sketches == sketch of the union —
    # is what the 'total' row checks.
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS scope,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS within_5pct
        FROM events
        GROUP BY date_trunc('day', ts)
        UNION ALL
        SELECT 'total' AS scope,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS within_5pct
        FROM events
    """,
    doc="Mergeable distinct-count sketches: per-day HyperLogLog sketches "
        "of active users (hll_sketch_agg), merged with hll_union_agg into "
        "the all-time estimate — the pre-aggregation pattern that answers "
        "'distinct users over any date range' from day-sized sketches "
        "without rescanning the fact. Estimates checked within 5% of "
        "exact on every row.",
    scale_notes="THE 100 TB distinct-count architecture: the fact scans "
                "once into day-cardinality sketches (KB each, partial-"
                "combinable); any range query unions sketches instead of "
                "rescanning. The exact countDistinct twin here exists "
                "only to verify the bound — production drops it.",
)
def hll_mergeable_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # day-cardinality with KB sketches — materialized for its two
    # consumers (per-day rows, merged estimate); the exact-total twin
    # below is the only other fact scan and production drops it
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    ).transform(materialize)
    tol = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= F.greatest(0.05 * exact, F.lit(5.0))
    )
    per_day = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("scope"),
        "exact_users",
        tol(F.expr("hll_sketch_estimate(sk)").cast("double"),
            F.col("exact_users").cast("double")).alias("within_5pct"),
    )
    merged_est = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("double").alias("est")
    )
    exact_total = e.agg(F.countDistinct("user_id").alias("exact_users"))
    total = (
        exact_total.join(F.broadcast(merged_est))
        .select(
            F.lit("total").alias("scope"),
            "exact_users",
            tol(F.col("est"), F.col("exact_users").cast("double")).alias("within_5pct"),
        )
    )
    return per_day.unionByName(total)


@register(
    "feature_binning",
    oracle="""
        WITH binned AS (
            SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS q_bin,
                   CAST(floor(o_totalprice / 50000.0) AS INTEGER)     AS w_bin,
                   o_totalprice
            FROM orders
        )
        SELECT CAST(q_bin AS INTEGER) AS q_bin, w_bin,
               count(*) AS n,
               round(min(o_totalprice), 4) AS lo,
               round(max(o_totalprice), 4) AS hi
        FROM binned
        GROUP BY q_bin, w_bin
        ORDER BY q_bin, w_bin
    """,
    doc="ML feature binning: decile (equal-frequency, exact ntile "
        "semantics over the total order (o_totalprice, o_orderkey)) and "
        "equal-width buckets of order value in one pass, with "
        "per-(bin,bin) counts and value ranges — the discretization step "
        "of a feature-engineering pipeline.",
    scale_notes="Exact ntile WITHOUT a global single-partition sort: "
                "approx-percentile range boundaries (a KB-sized driver "
                "artifact, the QuantileDiscretizer pattern) split rows "
                "into value ranges that preserve the global order; each "
                "range ranks locally in parallel and a 32-row broadcast "
                "of cumulative range counts converts local ranks to "
                "exact global ranks — the negative_sample two-phase "
                "trick, here over a value range instead of a hash "
                "nibble so the concatenated order equals the oracle's "
                "ORDER BY. The ntile bucket is then closed-form "
                "arithmetic on the global rank. At 100 TB: widen the "
                "range count with the cluster; every stage is either "
                "map-side or a bounded-size aggregate.",
)
def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    N_RANGES = 32
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # Phase 0: approximate range boundaries (31 doubles — a bounded
    # artifact, not a data collect). Ties on a boundary value all land on
    # the same side, so range order composes to the exact global order.
    pct = F.percentile_approx(
        "o_totalprice", [i / N_RANGES for i in range(1, N_RANGES)], 10000
    ).alias("bs")
    cuts = o.agg(pct).first()["bs"]  # scalar probe on an aggregate
    gid = sum(
        (F.col("o_totalprice") >= F.lit(float(b))).cast("int") for b in cuts
    ).alias("gid")
    # Phase 1: rank within each value range (parallel windows).
    ranked = o.select("o_orderkey", "o_totalprice", gid).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("gid").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    # Phase 2: cumulative offsets over the N_RANGES-row count relation —
    # a broadcast triangular self-join instead of a global window, so the
    # plan carries no single-partition WindowExec at all.
    counts = ranked.groupBy("gid").agg(F.count(F.lit(1)).alias("cnt"))
    prior = counts.select(
        F.col("gid").alias("pgid"), F.col("cnt").alias("pcnt")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("pgid") < F.col("gid"), "left")
        .groupBy("gid")
        .agg(F.coalesce(F.sum("pcnt"), F.lit(0)).alias("offset"))
    )
    n_total = ranked.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    # Exact ntile(10) from the 0-based global rank: the first (N mod 10)
    # buckets hold ceil(N/10) rows, the rest floor(N/10). Integer `div`
    # keeps the bucket arithmetic exact (no double rounding).
    with_idx = (
        ranked.join(F.broadcast(offsets), "gid")
        .select("o_totalprice", (F.col("offset") + F.col("rn") - 1).alias("idx"))
        .crossJoin(F.broadcast(n_total))
    )
    binned = with_idx.selectExpr(
        """CAST(CASE WHEN idx < (n_total % 10) * (n_total div 10 + 1)
                     THEN idx div (n_total div 10 + 1)
                     ELSE (n_total % 10)
                          + (idx - (n_total % 10) * (n_total div 10 + 1))
                            div greatest(n_total div 10, 1L)
                END + 1 AS INT) AS q_bin""",
        "CAST(floor(o_totalprice / 50000.0) AS INT) AS w_bin",
        "o_totalprice",
    )
    return (
        binned.groupBy("q_bin", "w_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("q_bin", "w_bin")
    )


CM_DEPTH = 4    # independent hash rows
CM_WIDTH = 64   # buckets per row
_CM_HEX = "0123456789abcdef"


def _cm_bucket_spark(seed, item):
    """Portable md5-hex → count-min bucket (feature_hash's engine-portable
    hex-strpos trick, parameterized by width)."""
    h = F.md5(F.concat(F.lit("cm"), seed.cast("string"), F.lit(":"), item))

    def pos(i: int):
        return F.instr(F.lit(_CM_HEX), F.substring(h, i, 1)) - 1

    return ((pos(1) * 16 + pos(2)) % CM_WIDTH).cast("int")


def _cm_bucket_sql(seed_expr: str, item_expr: str) -> str:
    h = f"md5('cm' || CAST({seed_expr} AS VARCHAR) || ':' || {item_expr})"
    return (
        f"CAST((((strpos('{_CM_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('{_CM_HEX}', substr({h}, 2, 1)) - 1))"
        f" % {CM_WIDTH}) AS INT)"
    )


@register(
    "countmin_sketch",
    oracle=f"""
        WITH per_user_day AS (
            SELECT date_trunc('day', ts) AS d,
                   CAST(user_id AS VARCHAR) AS item,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        sketch AS (
            SELECT d, t.i AS i,
                   {_cm_bucket_sql("t.i", "item")} AS bucket,
                   sum(n) AS cnt
            FROM per_user_day, unnest(range(0, {CM_DEPTH})) AS t(i)
            GROUP BY 1, 2, 3
        ),
        merged AS (
            SELECT i, bucket, sum(cnt) AS cnt FROM sketch GROUP BY i, bucket
        ),
        users AS (
            SELECT item, sum(n) AS exact_n FROM per_user_day GROUP BY item
        )
        SELECT CAST(u.item AS BIGINT) AS user_id,
               CAST(u.exact_n AS BIGINT) AS exact_n,
               CAST(min(m.cnt) AS BIGINT) AS est_n,
               min(m.cnt) >= u.exact_n AS over_ok
        FROM users u,
             unnest(range(0, {CM_DEPTH})) AS t(i)
        JOIN merged m
          ON m.i = t.i AND m.bucket = {_cm_bucket_sql("t.i", "u.item")}
        GROUP BY u.item, u.exact_n
    """,
    doc=f"Mergeable count-min sketch: per-day {CM_DEPTH}x{CM_WIDTH} "
        "frequency sketches of user activity, summed across days into "
        "the all-time sketch (count-min merges by cell-wise addition), "
        "then every user's frequency estimated as the min over hash "
        "rows — with the exact count and the count-min guarantee "
        "(estimate never under-counts) checked per user. The frequency "
        "twin of hll_mergeable_sketch's distinct-count architecture; "
        "md5-based bucketing makes the whole sketch engine-portable and "
        "hash-checkable, not just bound-checkable.",
    scale_notes="The only data-sized shuffle is the (day,user) pre-"
                f"aggregation; the sketch itself is {CM_DEPTH}*{CM_WIDTH} "
                "cells per day — KBs regardless of corpus size — so "
                "merging any date range is a broadcast-scale sum. 'How "
                "often did X occur in range R' then answers from sketch "
                "cells without rescanning the fact; width tunes the "
                "eps*N overestimate, depth the failure probability. The "
                "exact twin here exists only to verify the bound and is "
                "what production drops.",
)
def countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    per_user_day = (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.col("user_id").cast("string").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(materialize)  # one fact scan feeds sketch build AND exact twin
    )
    seeds = F.array(*[F.lit(i) for i in range(CM_DEPTH)])
    with_bucket = per_user_day.select(
        "d", "item", "n", F.explode(seeds).alias("i")
    ).withColumn("bucket", _cm_bucket_spark(F.col("i"), F.col("item")))
    # Per-day sketches (the mergeable artifact), then the cell-wise merge.
    sketch = with_bucket.groupBy("d", "i", "bucket").agg(F.sum("n").alias("cnt"))
    merged = sketch.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))
    users = per_user_day.groupBy("item").agg(F.sum("n").alias("exact_n"))
    probes = users.select(
        "item", "exact_n", F.explode(seeds).alias("i")
    ).withColumn("bucket", _cm_bucket_spark(F.col("i"), F.col("item")))
    return (
        probes.join(F.broadcast(merged), ["i", "bucket"])
        .groupBy("item", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
        .select(
            F.col("item").cast("bigint").alias("user_id"),
            "exact_n",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).alias("over_ok"),
        )
    )


# Bloom filter: BL_BITS bits as BL_WORDS x 32-bit words carried in BIGINTs
# (32-bit words keep every set-bit mask positive, dodging engine-specific
# signed-shift edge cases at bit 63). BL_K hash positions per item from the
# same portable md5-nibble arithmetic as the count-min buckets.
BL_BITS = 1024
BL_WORD = 32
BL_WORDS = BL_BITS // BL_WORD
BL_K = 3


def _bl_pos_spark(seed, item):
    """Portable md5-hex → bloom bit position in [0, BL_BITS)."""
    h = F.md5(F.concat(F.lit("bl"), seed.cast("string"), F.lit(":"), item))

    def pos(i: int):
        return F.instr(F.lit(_CM_HEX), F.substring(h, i, 1)) - 1

    return ((pos(1) * 4096 + pos(2) * 256 + pos(3) * 16 + pos(4)) % BL_BITS).cast(
        "int"
    )


def _bl_pos_sql(seed_expr: str, item_expr: str) -> str:
    h = f"md5('bl' || CAST({seed_expr} AS VARCHAR) || ':' || {item_expr})"
    nib = lambda i: f"(strpos('{_CM_HEX}', substr({h}, {i}, 1)) - 1)"
    return (
        f"CAST((({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)})"
        f" % {BL_BITS}) AS INT)"
    )


@register(
    "bloom_membership",
    oracle=f"""
        WITH members AS (
            SELECT DISTINCT CAST(user_id AS VARCHAR) AS item FROM events
        ),
        bloom AS (
            SELECT p // {BL_WORD} AS word,
                   bit_or(CAST(1 AS BIGINT) << (p % {BL_WORD})) AS bits
            FROM (
                SELECT {_bl_pos_sql("t.j", "item")} AS p
                FROM members, unnest(range(0, {BL_K})) AS t(j)
            )
            GROUP BY 1
        ),
        candidates AS (
            SELECT item, 1 AS truth FROM members
            UNION ALL
            SELECT CAST(CAST(item AS BIGINT) + 1000000 AS VARCHAR), 0
            FROM members
        ),
        probes AS (
            SELECT c.item, c.truth, {_bl_pos_sql("t.j", "c.item")} AS p
            FROM candidates c, unnest(range(0, {BL_K})) AS t(j)
        ),
        verdicts AS (
            SELECT item, truth,
                   min(CASE WHEN (coalesce(b.bits, 0)
                                  & (CAST(1 AS BIGINT) << (p % {BL_WORD})))
                                 <> 0
                            THEN 1 ELSE 0 END) AS flagged
            FROM probes LEFT JOIN bloom b ON b.word = p // {BL_WORD}
            GROUP BY item, truth
        )
        SELECT CAST(truth AS INT) AS is_member,
               count(*) AS n_probed,
               CAST(sum(flagged) AS BIGINT) AS n_flagged,
               round(sum(flagged) * 1.0 / count(*), 6) AS flag_rate
        FROM verdicts
        GROUP BY truth
    """,
    doc=f"Mergeable Bloom-filter membership: distinct event users hashed "
        f"into a {BL_BITS}-bit filter ({BL_WORDS} x {BL_WORD}-bit integer "
        f"words built with bit_or aggregation, {BL_K} probes per item), "
        "then a candidate set of all true members plus an equal-sized "
        "known-absent set is tested. Every true member must flag (Bloom "
        "filters cannot false-negative — the oracle proves flag_rate 1.0 "
        "for members) and the absent set's flag_rate IS the measured "
        "false-positive rate. The membership twin of hll (distinct) and "
        "count-min (frequency): the pre-join existence gate.",
    scale_notes="The filter is integer words built by bit_or — "
                "commutative, so per-partition partials merge exactly and "
                "per-day/per-shard blooms union by OR-ing word rows "
                "(KBs regardless of corpus size). At 100 TB the built "
                "filter broadcasts as a scan-side pre-filter (the "
                "engine-level runtime-filter pattern) to skip shuffle "
                "rows that cannot join; sizing follows m/n bits per key "
                "at the target FP rate.",
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    members = e.select(
        F.col("user_id").cast("string").alias("item")
    ).distinct().transform(materialize)  # one distinct pass feeds build AND probes
    seeds = F.explode(F.array(*[F.lit(j) for j in range(BL_K)])).alias("j")
    bloom = (
        members.select("item", seeds)
        .select(_bl_pos_spark(F.col("j"), F.col("item")).alias("p"))
        .select(
            (F.col("p") / BL_WORD).cast("int").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), p % {BL_WORD})").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    candidates = members.select("item", F.lit(1).alias("truth")).unionAll(
        members.select(
            (F.col("item").cast("bigint") + 1_000_000).cast("string").alias("item"),
            F.lit(0).alias("truth"),
        )
    )
    probes = candidates.select("item", "truth", seeds).select(
        "item", "truth", _bl_pos_spark(F.col("j"), F.col("item")).alias("p")
    )
    verdicts = (
        probes.withColumn("word", (F.col("p") / BL_WORD).cast("int"))
        # LEFT join: a probe landing in a word with no set bits is a MISS,
        # not a dropped row — an inner join would misreport absent items.
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "item",
            "truth",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), p % {BL_WORD})")
                )
                != 0,
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("item", "truth")
        .agg(F.min("hit").alias("flagged"))
    )
    return verdicts.groupBy("truth").agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("flagged").alias("n_flagged"),
        F.round(F.sum("flagged") / F.count(F.lit(1)), 6).alias("flag_rate"),
    ).select(
        F.col("truth").cast("int").alias("is_member"),
        "n_probed",
        "n_flagged",
        "flag_rate",
    )
