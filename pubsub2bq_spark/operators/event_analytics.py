"""Event-log analytics over `events`: sessionization, funnel analysis,
cohort retention — the workloads a reference user runs on the delivered
change-event table once it lands in the sink engine (the reference
treats the sink as a general SQL engine, `/root/reference/README.md:199-214`).

All three are window/aggregate compositions keyed on user_id: at 100 TB
they shuffle once on the user key (sessionize, funnel) or twice
(cohort joins back the per-user cohort week), never row-at-a-time.
Gap comparisons use integer microseconds (`unix_micros`) so engine
float epoch conventions can't flip a session boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load, materialize

SESSION_GAP_US = 1800 * 1_000_000  # 30 min in µs


@register(
    "sessionize",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM ordered
        )
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 4) AS total_value
        FROM sess
        GROUP BY user_id, session_id
    """,
    doc="Batch sessionization: split each user's event stream into "
        "sessions at >30-minute inactivity gaps (lag + running sum of "
        "boundary flags — the classic gaps-and-islands window), then "
        "aggregate per session. The batch twin of the streaming "
        "session_window key.",
    scale_notes="One shuffle on user_id serves the lag window, the "
                "running sum, and the final per-session aggregate — "
                "Catalyst plans all three in the same partitioning. "
                "Per-user event counts are bounded, so no skew; the "
                "(ts, event_id) ordering tiebreak makes boundaries "
                "deterministic under equal timestamps.",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = (
        e.withColumn("new_s", new_s)
        .withColumn("session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "funnel_steps",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(ts) AS t_click
            FROM events e JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts > t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(ts) AS t_purchase
            FROM events e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts > t_click
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_view_click,
               (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
    doc="Ordered-funnel analysis: users who viewed, then clicked after "
        "their first view, then purchased after that click — strict "
        "event-order semantics via first-timestamp chaining, not mere "
        "per-type existence.",
    scale_notes="Three user_id-keyed aggregates chained by user_id-keyed "
                "joins: every stage shares one partitioning. Each stage's "
                "user-cardinality output is localCheckpointed because it "
                "has two consumers (the next stage and its own count) — "
                "without that, Spark rebuilt each stage per consumer and "
                "the plan scanned events six times instead of three "
                "(one pushed-down type filter each).",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    ).transform(materialize)
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .transform(materialize)
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .join(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .join(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))))
    )


@register(
    "cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        act AS (
            SELECT e.user_id, cohort_week,
                   CAST(floor(date_diff('day', cohort_week,
                                        date_trunc('day', ts)) / 7.0)
                        AS INTEGER) AS week_offset
            FROM events e JOIN firsts USING (user_id)
        )
        SELECT cohort_week, week_offset,
               count(DISTINCT user_id) AS n_active
        FROM act
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    doc="Cohort retention: bucket users by the ISO week of their first "
        "event, then count distinct active users per (cohort, weeks-since) "
        "cell — the standard retention triangle.",
    scale_notes="The cohort week is a min-over-user window, not an "
                "aggregate-plus-join-back: the join formulation scanned "
                "events twice and shuffled both join sides on user_id "
                "anyway, so the window form does the same one user_id "
                "shuffle over ONE scan. The distinct-user count then "
                "partial-aggregates map-side; cells are week²-"
                "cardinality, tiny at any scale.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cohort_week = F.date_trunc("week", F.min("ts").over(Window.partitionBy("user_id")))
    act = e.select(
        "user_id",
        cohort_week.alias("cohort_week"),
        "ts",
    ).select(
        "user_id",
        "cohort_week",
        F.floor(
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_week")) / 7.0
        )
        .cast("int")
        .alias("week_offset"),
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


_MULTI_GRAIN_SQL = """
    WITH g AS (
        SELECT date_trunc('hour', ts) AS h,
               date_trunc('day',  ts) AS d,
               date_trunc('week', ts) AS wk,
               event_type, value
        FROM events
    )
    SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                WHEN grouping(d) = 0 THEN 'day'
                ELSE 'week' END AS grain,
           coalesce(h, d, wk) AS bucket_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total
    FROM g
    GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (wk, event_type))
"""


@register(
    "multi_grain_rollup",
    # date_trunc grain names and GROUPING() semantics are identical in
    # Spark SQL and DuckDB (both week-truncate to Monday), so one SQL
    # text serves as both implementation and oracle.
    oracle=_MULTI_GRAIN_SQL,
    doc="Hypertable-style continuous aggregate: hourly, daily, and weekly "
        "rollups of the event stream from ONE scan via GROUPING SETS over "
        "pre-truncated grain columns — the time-series rollup pattern "
        "(TimescaleDB continuous aggregates / druid rollup) on Spark.",
    scale_notes="GROUPING SETS expands rows 3x *after* map-side partial "
                "aggregation on the (grain, type) keys, so the shuffle "
                "carries near-aggregate cardinality, not 3x the fact. One "
                "scan replaces three — at 100 TB the scan is the cost, so "
                "this is a ~3x win over per-grain queries; finer-to-"
                "coarser reuse (day from hour) is the documented next "
                "refinement when grains share alignment.",
)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MULTI_GRAIN_SQL)


ANOMALY_BASELINE = 20  # trailing observations forming the baseline
ANOMALY_MIN_OBS = 5    # below this the z-score is undefined (NULL)
ANOMALY_Z = 3.0

ATTRIB_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day attribution window


@register(
    "anomaly_detect",
    oracle=f"""
        WITH scored AS (
            SELECT event_id, user_id, ts, value,
                   avg(value)         OVER w AS mu,
                   stddev_samp(value) OVER w AS sigma,
                   count(*)           OVER w AS n_base
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN {ANOMALY_BASELINE} PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT event_id, user_id,
               CASE WHEN n_base >= {ANOMALY_MIN_OBS}
                    THEN round((value - mu) / nullif(sigma, 0), 6) END AS z_score,
               coalesce(n_base >= {ANOMALY_MIN_OBS}
                        AND abs((value - mu) / nullif(sigma, 0)) > {ANOMALY_Z},
                        false) AS is_anomaly
        FROM scored
    """,
    doc=f"Trailing-baseline anomaly detection: each event's value scored "
        f"against the mean/stddev of the user's previous "
        f"{ANOMALY_BASELINE} events (current row excluded); |z| > "
        f"{ANOMALY_Z} flags an anomaly, fewer than {ANOMALY_MIN_OBS} "
        f"baseline rows yields NULL (cold start).",
    scale_notes="One shuffle on user_id; mean/stddev/count all ride the "
                "same sorted window frame in one pass (no self-join "
                "against the trailing slice). The ROWS frame bounds state "
                "per row at O(baseline), independent of series length — "
                "the streaming twin of this is a bounded-state "
                "applyInPandasWithState.",
)
def anomaly_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-ANOMALY_BASELINE, -1)
    )
    mu = F.avg("value").over(w)
    sigma = F.stddev_samp("value").over(w)
    n_base = F.count(F.lit(1)).over(w)
    z = (F.col("value") - mu) / F.nullif(sigma, F.lit(0.0))
    return e.select(
        "event_id",
        "user_id",
        F.when(n_base >= ANOMALY_MIN_OBS, F.round(z, 6)).alias("z_score"),
        F.coalesce(
            (n_base >= ANOMALY_MIN_OBS) & (F.abs(z) > ANOMALY_Z), F.lit(False)
        ).alias("is_anomaly"),
    )


@register(
    "attribution_last_touch",
    oracle=f"""
        WITH tagged AS (
            SELECT event_id, user_id, ts, event_type, value,
                   last_value(CASE WHEN event_type = 'click' THEN event_id END
                              IGNORE NULLS) OVER w AS last_click_id,
                   last_value(CASE WHEN event_type = 'click' THEN ts END
                              IGNORE NULLS) OVER w AS last_click_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id AS purchase_id, user_id,
               CASE WHEN epoch_us(ts) - epoch_us(last_click_ts)
                         <= {ATTRIB_WINDOW_US}
                    THEN last_click_id END AS attributed_click_id,
               coalesce(epoch_us(ts) - epoch_us(last_click_ts)
                        <= {ATTRIB_WINDOW_US}, false) AS attributed,
               round(value, 4) AS value
        FROM tagged
        WHERE event_type = 'purchase'
    """,
    doc="Last-touch attribution: each purchase is credited to the user's "
        "most recent strictly-preceding click within a 7-day window — "
        "the carry-forward (last_value IGNORE NULLS) formulation, not a "
        "per-purchase as-of self-join.",
    scale_notes="ONE shuffle on user_id and a single forward pass; the "
                "naive per-purchase as-of join against the click stream "
                "is a second shuffle plus a range-join explosion. "
                "Carry-forward state is O(1) per row, so the same window "
                "runs unbounded on a stream. Integer-microsecond gap "
                "arithmetic (epoch_us twin: unix_micros) keeps the "
                "window edge engine-exact.",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    gap_ok = (
        F.unix_micros("ts") - F.unix_micros(F.last(click_ts, ignorenulls=True).over(w))
    ) <= ATTRIB_WINDOW_US
    return (
        e.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .withColumn("gap_ok", gap_ok)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(F.col("gap_ok"), F.col("last_click_id")).alias(
                "attributed_click_id"
            ),
            F.coalesce(F.col("gap_ok"), F.lit(False)).alias("attributed"),
            F.round("value", 4).alias("value"),
        )
    )


@register(
    "snapshot_diff",
    oracle="""
        WITH b AS (
            SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cut_us
            FROM events
        ),
        old_r AS (
            SELECT user_id, value, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events, b
            WHERE epoch_us(ts) <= b.cut_us
        ),
        old_s AS (
            SELECT user_id, round(value, 4) AS old_value
            FROM old_r WHERE rn = 1 AND event_type <> 'error'
        ),
        new_r AS (
            SELECT user_id, value, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ),
        new_s AS (
            SELECT user_id, round(value, 4) AS new_value
            FROM new_r WHERE rn = 1 AND event_type <> 'error'
        )
        SELECT coalesce(o.user_id, n.user_id) AS user_id,
               CASE WHEN o.user_id IS NULL THEN 'added'
                    WHEN n.user_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS change_type,
               o.old_value, n.new_value
        FROM old_s o FULL JOIN new_s n ON o.user_id = n.user_id
        WHERE o.user_id IS NULL OR n.user_id IS NULL
           OR o.old_value <> n.new_value
    """,
    doc="Point-in-time snapshot diff: reconstruct the live CDC state "
        "(latest non-delete row per key, `error` = tombstone per the "
        "envelope convention) at the stream's midpoint and at its end, "
        "and emit added / removed / changed keys with before/after "
        "values — the table-diff a sync-validation job runs against "
        "two reconciled snapshots.",
    scale_notes="Both snapshot reconstructions and the full-outer diff "
                "join share hashpartitioning(user_id): each side "
                "shuffles the fact once for its row_number window and "
                "the join reuses that partitioning (no third exchange). "
                "The cutoff is a broadcast scalar from a min/max agg "
                "(map-side combinable). Single-scan alternative at 100 "
                "TB: conditional max_by aggregation folds both windows "
                "into one user_id shuffle; kept as two windows for plan "
                "clarity since both are the same exchange key.",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cut = e.agg(
        (
            F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")
        ).alias("cut_us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def snapshot(df: DataFrame, value_alias: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", F.round("value", 4).alias(value_alias))
        )

    old_s = snapshot(
        e.crossJoin(F.broadcast(cut)).filter(
            F.unix_micros("ts") <= F.col("cut_us")
        ),
        "old_value",
    )
    new_s = snapshot(e, "new_value")
    o, n = old_s.alias("o"), new_s.alias("n")
    joined = o.join(n, F.col("o.user_id") == F.col("n.user_id"), "full")
    return joined.filter(
        F.col("o.user_id").isNull()
        | F.col("n.user_id").isNull()
        | (F.col("old_value") != F.col("new_value"))
    ).select(
        F.coalesce(F.col("o.user_id"), F.col("n.user_id")).alias("user_id"),
        F.when(F.col("o.user_id").isNull(), "added")
        .when(F.col("n.user_id").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        "old_value",
        "new_value",
    )


@register(
    "markov_transitions",
    oracle="""
        WITH steps AS (
            SELECT user_id, event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        counts AS (
            SELECT cur, nxt, count(*) AS n
            FROM steps WHERE nxt IS NOT NULL
            GROUP BY cur, nxt
        ),
        outs AS (SELECT cur, sum(n) AS tot FROM counts GROUP BY cur)
        SELECT c.cur, c.nxt, c.n,
               round(c.n * 1.0 / o.tot, 6) AS p
        FROM counts c JOIN outs o ON c.cur = o.cur
    """,
    doc="First-order Markov transition matrix over user event sequences: "
        "per (current, next) event-type pair, the transition count and "
        "conditional probability P(next | current) — the sequence-model "
        "prior behind next-action prediction and anomalous-flow "
        "detection (a transition with tiny p is a suspicious hop).",
    scale_notes="One shuffle on user_id orders each user's sequence for "
                "the lead(); the pair counts then reduce to event-type² "
                "rows with map-side partial agg, and the normalizing "
                "out-degree relation is broadcast back. State per row is "
                "O(1) — the same plan holds for billions of events; the "
                "streaming twin maintains counts incrementally per "
                "micro-batch.",
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        e.select("user_id", F.col("event_type").alias("cur"), "ts", "event_id")
        .withColumn("nxt", F.lead("cur").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    counts = steps.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    outs = counts.groupBy("cur").agg(F.sum("n").alias("tot"))
    return counts.join(F.broadcast(outs), "cur").select(
        "cur", "nxt", "n", F.round(F.col("n") / F.col("tot"), 6).alias("p")
    )
