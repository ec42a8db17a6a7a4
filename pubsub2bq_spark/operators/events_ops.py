"""Event-stream operators over the `events` table: SURVEY.md §2.4.

Time semantics (tumbling/sliding/session windows, dedup,
latest-per-key) are implemented so that batch and streaming share the
same column expressions — the streaming variants live in
``pubsub2bq_spark.streaming`` and `watermark_window` below runs a
real Structured Streaming query.

Window bucketing uses explicit epoch arithmetic
(floor(epoch/width)*width) — byte-identical across Spark and the
DuckDB oracle, and equivalent to F.window's epoch-aligned buckets.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load, materialize, scratch_dir, table_path


@register(
    "latest_per_key",
    oracle="""
        SELECT event_id, user_id, ts, event_type, round(value, 4) AS value
        FROM (
            SELECT event_id, user_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    doc="Last-writer-wins per key: the reference's per-PK ordering contract "
        "(ORDERING_KEY {\"id\":…}, /root/reference/README.md:292) realized "
        "as a deterministic latest-event-per-user merge.",
    scale_notes="One shuffle on the key; WindowGroupLimit prunes each "
                "partition to its top row before the sort completes. This is "
                "how CDC upserts compact at 100 TB (arrival order never "
                "matters, only ts).",
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type", F.round("value", 4).alias("value"))
    )


@register(
    "dedup",
    oracle="""
        SELECT event_id, user_id, event_type, ts
        FROM (
            SELECT event_id, user_id, event_type, ts,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    doc="Deterministic dedup: first event per (user_id, event_type) by "
        "(ts, event_id). Batch twin of streaming dropDuplicates (which "
        "keeps an arbitrary row — we pin the earliest for reproducibility).",
    scale_notes="Same single-shuffle profile as latest_per_key; streaming "
                "version bounds state with dropDuplicatesWithinWatermark.",
)
def dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


def _bucket_start(ts_col: F.Column, width_s: int) -> F.Column:
    """Epoch-aligned tumbling bucket start (timestamp)."""
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(ts_col) / width_s) * width_s).cast("bigint")
    )


@register(
    "tumbling_agg",
    oracle="""
        SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)
                   AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS total
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling 5-minute window aggregate per event_type.",
    scale_notes="Bucket expression is a pure projection → standard hash agg; "
                "streaming twin uses F.window + watermark (see streaming/).",
)
def tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("window_start", _bucket_start(F.col("ts"), 300))
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


@register(
    "sliding_agg",
    oracle="""
        SELECT make_timestamp(ws * 1000000) AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS total
        FROM (
            SELECT event_type, value,
                   unnest([b5 - 300, b5]) AS ws
            FROM (
                SELECT event_type, value,
                       CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS b5
                FROM events
            )
        )
        GROUP BY 1, 2
    """,
    doc="Sliding window: 10-minute windows advancing every 5 minutes "
        "(each event lands in exactly 2 windows).",
    scale_notes="Spark's F.window(slide) expands rows by window/slide "
                "(here 2×) before the hash agg — same cost model the oracle "
                "unnest makes explicit.",
)
def sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "session_agg",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC)
                             >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               count(*) AS n_events,
               round(sum(value), 4) AS total
        FROM numbered
        GROUP BY user_id, session_id
    """,
    doc="Session windows: per-user sessions closed by a 30-minute inactivity "
        "gap, via F.session_window (oracle = classic lag+cumsum sessionization).",
    scale_notes="session_window is a native merging-window agg (one shuffle "
                "on user_id); in streaming it bounds state via watermark.",
)
def session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total",
        )
    )


@register(
    "watermark_window",
    # Append mode is deterministic under AvailableNow: after the final
    # batch the watermark settles at max(ts) - 10min, and exactly the
    # windows with end <= watermark have been emitted. That closed set is
    # plain SQL — windows whose end is at least 10 minutes before the
    # stream's max event time (epoch_ms truncation matches Spark's
    # millisecond watermark arithmetic).
    oracle="""
        SELECT make_timestamp(ws * 1000000) AS window_start, event_type,
               count(*) AS n, round(sum(value), 4) AS total
        FROM (
            SELECT event_type, value,
                   CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS ws
            FROM events
        )
        WHERE (ws + 300) * 1000 <= (SELECT epoch_ms(max(ts)) - 600000 FROM events)
        GROUP BY 1, 2
    """,
    doc="Structured Streaming: tumbling 5-minute event-time window with a "
        "10-minute watermark, driven to completion with AvailableNow over "
        "the events parquet (late rows beyond the watermark are dropped); "
        "emitted set = windows the final watermark closed.",
    scale_notes="Watermark bounds keyed state; append mode only emits "
                "finalized windows. The real 100 TB pattern for late data.",
)
def watermark_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # The streaming file source requires a directory; glob-filter to the
    # events table within the sf dir.
    stream = normalize_events(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    sink = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Append mode: the memory sink now holds exactly the windows the final
    # watermark (max ts - 10 min) closed; the last windows stay open and
    # are deliberately absent — the oracle encodes the same closed set.
    return spark.table(sink)


@register(
    "stream_stream_join",
    oracle="""
        SELECT v.event_id AS view_id, p.event_id AS purchase_id,
               v.user_id AS user_id
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 30 MINUTE
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    doc="Stream-stream inner join (J8): views matched to same-user "
        "purchases within the following 30 minutes. Both sides are real "
        "Structured Streaming readers over the events parquet, watermarked "
        "so buffered state expires; AvailableNow drives it to completion. "
        "With a single batch the inner join equals the batch join, so the "
        "full DuckDB oracle applies (not just a rows-only check).",
    scale_notes="Both sides shuffle on user_id; the time-bound in the join "
                "condition plus the watermarks let Spark evict join state "
                "older than bound+watermark — without it, stream-stream "
                "state grows without limit. The 100 TB funnel-attribution "
                "pattern.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            normalize_events(
                spark.readStream.schema(raw_schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    views, purchases = side("view", "v"), side("purchase", "p")
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 30 minutes")),
        "inner",
    ).select(
        F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("v_user").alias("user_id"),
    )
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


# Shared by scd2_history and asof_snapshot (which queries it at a point
# in time).
_SCD2_SQL = """
        SELECT event_id, user_id,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               row_number() OVER w AS version,
               (lead(ts) OVER w IS NULL) AS is_current,
               event_type, round(value, 4) AS value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


@register(
    "scd2_history",
    oracle=_SCD2_SQL,
    doc="Type-2 slowly-changing-dimension materialization of the change "
        "log: every event becomes a versioned validity interval "
        "[valid_from, valid_to) per key, open-ended for the current row — "
        "the history table a warehouse builds downstream of the "
        "reference's CDC feed (complement of latest_per_key, which is the "
        "type-1 compaction).",
    scale_notes="One shuffle on the key, then lead/row_number ride the "
                "same sorted partition — interval assembly is a single "
                "window pass, never a self-join. At 100 TB the win is "
                "exactly that: the naive event-to-next-event range join "
                "this replaces is quadratic per key.",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    valid_to = F.lead("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w).alias("version"),
        valid_to.isNull().alias("is_current"),
        "event_type",
        F.round("value", 4).alias("value"),
    )


@register(
    "time_spine_gapfill",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS t0,
                   date_trunc('hour', max(ts)) AS t1
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_ts
            FROM bounds
        ),
        counts AS (
            SELECT date_trunc('hour', ts) AS hour_ts,
                   count(*) AS n_events, sum(value) AS sv
            FROM events GROUP BY 1
        )
        SELECT s.hour_ts,
               coalesce(n_events, 0) AS n_events,
               round(coalesce(sv, 0), 4) AS sum_value
        FROM spine s LEFT JOIN counts c ON s.hour_ts = c.hour_ts
    """,
    doc="Dense hourly time spine with gap-filling: generate every hour "
        "between the stream's bounds (F.sequence + explode — generated "
        "rows, not scanned ones) and left-join the hourly aggregate, "
        "zero-filling silent hours. The op dashboards and downstream "
        "ML feature pipelines need that plain groupBy can't give them: "
        "absence of data as data.",
    scale_notes="The spine is bounds-derived (two scalar aggregates, no "
                "collect) and hours-sized — broadcast side of the join; "
                "the hourly aggregate partial-combines before its one "
                "shuffle. Spine cardinality grows with time, not volume, "
                "so at 100 TB it is still a few thousand rows.",
)
def time_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    counts = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sv")
    )
    return spine.join(counts, "hour_ts", "left").select(
        "hour_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(F.coalesce("sv", F.lit(0.0)), 4).alias("sum_value"),
    )


@register(
    "stream_upsert",
    # The incremental merge is associative and the (ts desc, event_id
    # desc) order is total, so the final state table equals the one-shot
    # latest-per-key query regardless of how the file source batches the
    # input — which is the correctness claim worth oracle-checking.
    oracle="""
        SELECT event_id, user_id, ts, event_type, round(value, 4) AS value
        FROM (
            SELECT event_id, user_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    doc="Streaming SCD1 upsert: a foreachBatch MERGE that folds each "
        "micro-batch into a keyed state table (latest event per user), "
        "copy-on-write versioned parquet standing in for a lakehouse "
        "MERGE target. The events table is spooled into 4 files and "
        "streamed with maxFilesPerTrigger=1, so the merge really runs "
        "across multiple micro-batches with a checkpoint.",
    scale_notes="Each merge shuffles state∪batch once on user_id. "
                "Copy-on-write rewrites the full state per batch — fine "
                "while state ≪ stream, the honest cost of parquet-as-"
                "sink; at 100 TB the target becomes a transactional "
                "table format (Delta/Iceberg MERGE) or the partitioned "
                "merge writes only touched partitions. Batch order "
                "cannot change the result: the merge is associative "
                "with a total LWW order.",
)
def stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    tmp = scratch_dir("upsert_")
    try:
        spool = os.path.join(tmp, "spool")
        # Spool normalized events (µs timestamps) into 4 files → 4 micro-batches.
        load(spark, sf_dir, "events").repartition(4).write.parquet(spool)
        run_upsert_pipeline(spark, spool, os.path.join(tmp, "ckpt"),
                            os.path.join(tmp, "state"))
        # Eager localCheckpoint so the temp spool/state (a full copy of the
        # input) can be deleted before the caller consumes the result.
        return read_upsert_state(spark, os.path.join(tmp, "state")).select(
            "event_id", "user_id", "ts", "event_type",
            F.round("value", 4).alias("value"),
        ).transform(materialize)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _latest_state_version(state_root: str) -> str | None:
    """Highest committed state version directory, recovered from DISK —
    a restarted driver must find the merge target without any in-memory
    pointer (the T1 persistence contract, like the checkpoint itself)."""
    import os

    if not os.path.isdir(state_root):
        return None
    versions = sorted(
        (int(name[1:]), name)
        for name in os.listdir(state_root)
        if name.startswith("v") and name[1:].isdigit()
        # only versions whose write completed (parquet _SUCCESS marker):
        # a crash mid-write must fall back to the previous version
        and os.path.exists(os.path.join(state_root, name, "_SUCCESS"))
    )
    return os.path.join(state_root, versions[-1][1]) if versions else None


def read_upsert_state(spark: SparkSession, state_root: str) -> DataFrame:
    path = _latest_state_version(state_root)
    if path is None:  # explicit raise — assert is stripped under python -O
        raise RuntimeError(f"no committed upsert state under {state_root}")
    return spark.read.parquet(path)


def run_upsert_pipeline(
    spark: SparkSession, spool: str, checkpoint: str, state_root: str
) -> None:
    """Drive the streaming SCD1 merge to completion over `spool`.
    Restart-safe: offsets live in the checkpoint, the merge target is
    re-discovered from the versioned state directory, so a second call
    (after a crash or with new spool files) resumes instead of
    reprocessing."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        import os

        s = batch.sparkSession
        prev = _latest_state_version(state_root)
        merged = batch if prev is None else s.read.parquet(prev).unionByName(batch)
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # Copy-on-write: each version is a fresh directory; never rewrite
        # the path a lazy reader might still scan.
        latest.write.mode("overwrite").parquet(os.path.join(state_root, f"v{batch_id}"))

    schema = spark.read.parquet(spool).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(spool)
    )
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register(
    "asof_snapshot",
    oracle=f"""
        WITH hist AS ({_SCD2_SQL}),
        snap AS (SELECT date_trunc('day', max(ts)) AS snapshot_ts FROM events)
        SELECT s.snapshot_ts, h.user_id, h.event_id, h.version,
               h.event_type, h.value
        FROM hist h CROSS JOIN snap s
        WHERE h.valid_from <= s.snapshot_ts
          AND (h.valid_to IS NULL OR h.valid_to > s.snapshot_ts)
    """,
    doc="Point-in-time (time-travel) query over the SCD2 history: the "
        "exact per-key state as of a snapshot instant (start of the "
        "stream's last day) — at most one interval per key covers any "
        "instant, so this reconstructs the table the sink held then.",
    scale_notes="Reuses scd2_history's single window pass; the snapshot "
                "instant is a scalar aggregate broadcast via cross join "
                "(no collect), and the interval filter is a map-side "
                "predicate — no extra shuffle beyond the history build. "
                "On a warehouse with interval-partitioned history this is "
                "the query partition pruning serves.",
)
def asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = scd2_history(spark, sf_dir)
    snap = load(spark, sf_dir, "events").agg(
        F.date_trunc("day", F.max("ts")).alias("snapshot_ts")
    )
    return (
        hist.crossJoin(F.broadcast(snap))
        .filter(
            (F.col("valid_from") <= F.col("snapshot_ts"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("snapshot_ts")))
        )
        .select(
            "snapshot_ts", "user_id", "event_id", "version", "event_type", "value"
        )
    )


@register(
    "state_inspect",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents_total
        FROM events
        GROUP BY event_type
    """,
    doc="State-store inspection (Spark 4 statestore data source): run a "
        "stateful streaming aggregation over the events stream, then read "
        "the aggregation STATE back out of the checkpoint with "
        "spark.read.format('statestore') — the operator surface for "
        "answering 'what does the running query currently believe' "
        "without touching its sink. After AvailableNow drains the source, "
        "the state must equal the batch aggregate, which is exactly what "
        "the oracle asserts. Totals accumulate as integer cents so the "
        "state is summation-order-independent and hash-checkable.",
    scale_notes="The state read is partition-parallel over the HDFS-"
                "backed store files (one split per store partition) and "
                "never touches the source data — state size is keyed "
                "cardinality, not stream volume. This is the debugging/"
                "monitoring path for production stateful pipelines "
                "(inspect skew across state partitions, find hot keys, "
                "validate migrations) and it composes with "
                "snapshotStartBatchId time travel over retained "
                "checkpoints.",
)
def state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pubsub2bq_spark.tables import normalize_events, scratch_dir

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = normalize_events(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents_total"),
    )
    cp = os.path.join(scratch_dir("stateq_"), "cp")
    sink = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(cp)
    # State value fields carry the aggregate FUNCTION names (count, sum),
    # not the query aliases — the store schema predates the output projection.
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
        F.col("value.sum").alias("cents_total"),
    )


@register(
    "stream_observe",
    oracle="""
        SELECT count(*) AS n_rows,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               round(sum(value), 4) AS total_value
        FROM events
    """,
    doc="Streaming observability: df.observe() metrics (row count, "
        "purchase count, value sum) attached to a streaming pipeline and "
        "summed across every micro-batch's progress report — the "
        "monitoring surface that tells an operator what a 100 TB stream "
        "is actually delivering without a second scan. The accumulated "
        "metrics must equal the batch aggregate over the same input.",
    scale_notes="observe() metrics are computed inline with the batch "
                "(accumulator-style, no extra pass, no extra shuffle) "
                "and surface per-batch through StreamingQueryProgress — "
                "the zero-cost alternative to aggregating the sink "
                "table for dashboards. Summing across progress events "
                "makes the result trigger-cadence-independent.",
)
def stream_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # recentProgress is a ring buffer (default 100 entries); a run with
    # more micro-batches than the cap would silently undercount the sums
    # below. Raise the cap well past any plausible batch count here and
    # assert we stayed under it after the run.
    progress_cap = 10_000
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(progress_cap))
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = normalize_events(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).observe(
        "delivery",
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.sum("value").alias("sum_value"),
    )
    sink = f"obs_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = q.recentProgress
    # Explicit raise, not assert: assert is stripped under `python -O`,
    # which would revert to silently undercounting the observed totals.
    if len(progresses) >= progress_cap:
        raise RuntimeError(
            f"{len(progresses)} progress events hit the {progress_cap} "
            "buffer cap; totals would undercount"
        )
    totals = {"n_rows": 0, "n_purchase": 0, "sum_value": 0.0}
    for progress in progresses:
        m = (progress.get("observedMetrics") or {}).get("delivery")
        if m:
            totals["n_rows"] += m["n_rows"] or 0
            totals["n_purchase"] += m["n_purchase"] or 0
            # sum(value) over an empty/all-null batch observes as NULL.
            totals["sum_value"] += m["sum_value"] or 0.0
    return spark.createDataFrame(
        [(totals["n_rows"], totals["n_purchase"], round(totals["sum_value"], 4))],
        "n_rows bigint, n_purchase bigint, total_value double",
    )


@register(
    "stream_fanout",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(sum(value), 4) AS total,
               count(CASE WHEN value > 95.0 THEN 1 END) AS n_audit
        FROM events
        GROUP BY event_type
    """,
    doc="Multi-sink fanout from ONE streaming pass: each micro-batch is "
        "persisted, then written to three sinks — the main event log, a "
        "per-type metrics rollup, and a high-value audit sample — the "
        "reference's topology (BQ sink + inspection tap + dead-letter, "
        "terraform/main.tf:352-415) generalized to N consumers without N "
        "source scans. Returns the metrics sink accumulated across "
        "batches, which must equal the batch aggregate.",
    scale_notes="batch.persist() makes the fanout one source scan + three "
                "cheap consumers instead of three full pipelines; at "
                "100 TB this is the difference between 1x and 3x ingest "
                "cost. Each sink appends independently (parquet dirs "
                "here; tables/queues in production) and the rollup is "
                "event-type-cardinality rows per batch — merge-on-read "
                "cheap.",
)
def stream_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pubsub2bq_spark.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = normalize_events(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    base = scratch_dir("fanout_")
    sinks = {name: os.path.join(base, name) for name in ("log", "metrics", "audit")}

    def deliver(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            batch.write.mode("append").parquet(sinks["log"])
            (
                batch.groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("value").alias("total"),
                    F.count(F.when(F.col("value") > 95.0, 1)).alias("n_audit"),
                )
                .write.mode("append")
                .parquet(sinks["metrics"])
            )
            batch.filter(F.col("value") > 95.0).write.mode("append").parquet(
                sinks["audit"]
            )
        finally:
            batch.unpersist()

    try:
        q = (
            stream.writeStream.foreachBatch(deliver)
            .option("checkpointLocation", os.path.join(base, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Metrics accumulated across micro-batches == batch aggregate.
        # localCheckpoint (eager) materializes the tiny per-type rollup so
        # the temp sinks can be deleted before the caller consumes it.
        return (
            spark.read.parquet(sinks["metrics"])
            .groupBy("event_type")
            .agg(
                F.sum("n").alias("n"),
                F.round(F.sum("total"), 4).alias("total"),
                F.sum("n_audit").alias("n_audit"),
            )
            .transform(materialize)
        )
    finally:
        # The log sink holds a full copy of the input; leaking it per
        # bench iteration fills /tmp at sf0.1+.
        shutil.rmtree(base, ignore_errors=True)


@register(
    "transform_with_state",
    # Every emitted metric is monotone per user (counts grow, max rises),
    # so each user's last update-mode row equals the one-shot batch
    # aggregate no matter how the file source batches the input — the
    # same associativity contract stream_upsert pins, now for the typed
    # multi-variable state API.
    oracle="""
        SELECT user_id,
               count(DISTINCT event_type) AS n_event_types,
               count(*) AS total_events,
               round(max(value), 4) AS max_value
        FROM events
        GROUP BY user_id
    """,
    doc="Arbitrary stateful streaming on the Spark 4 transformWithState "
        "API (T8 successor surface): a StatefulProcessor with a typed "
        "ValueState (running count + max) AND a MapState (per-event-type "
        "counts) per user — the multi-variable layout that "
        "applyInPandasWithState (stateful_running) must pack into one "
        "tuple. Input is spooled into 3 files and streamed with "
        "maxFilesPerTrigger=1 so state genuinely carries across "
        "micro-batches. See streaming/stateful.py:UserProfileProcessor. "
        "Gated on transformWithState's protobuf dependency (absent in "
        "this container): without it, the applyInPandasWithState twin "
        "computes the identical contract (same oracle checks both).",
    scale_notes="Requires the RocksDB state store (set per-query here): "
                "state lives off-heap and spills to disk, so per-key "
                "state is bounded by disk not executor memory — the "
                "100 TB-stream configuration. State is O(#event_types) "
                "per user; production adds per-variable TTL "
                "(getValueState(ttlDurationMs=…)) for idle-key eviction.",
)
def transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pubsub2bq_spark.streaming.stateful import (
        transform_with_state_available,
        user_profile_stats,
    )

    tmp = scratch_dir("tws_")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        spool = os.path.join(tmp, "spool")
        load(spark, sf_dir, "events").repartition(3).write.parquet(spool)
        if transform_with_state_available():
            # transformWithState only runs on the RocksDB state store;
            # the fallback twin keeps the session default (HDFS-backed).
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        stream = (
            spark.readStream.schema(spark.read.parquet(spool).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(spool)
        )
        sink = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            user_profile_stats(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        snap = spark.table(sink)
        # Update mode appends one row per (user, batch); the final state
        # is the row with the highest (monotone) total_events.
        return snap.groupBy("user_id").agg(
            F.max_by("n_event_types", "total_events").alias("n_event_types"),
            F.max("total_events").alias("total_events"),
            F.max_by("max_value", "total_events").alias("max_value"),
        ).transform(materialize)
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "stream_static_join",
    oracle="""
        SELECT c.c_nationkey,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(e.value), 4) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    doc="Stream-static (enrichment) join: the streaming event feed "
        "joined to the static customer dimension on user key, then "
        "aggregated per nation — the canonical CDC-enrichment shape "
        "(every delivered change event annotated with slowly-changing "
        "reference data before sinking). AvailableNow drives the stream "
        "to completion, so the full batch oracle applies.",
    scale_notes="The static side is planned ONCE and broadcast per "
                "micro-batch (no state store involvement — unlike "
                "stream-stream, a stream-static join keeps zero join "
                "state, so it cannot grow unboundedly). The streaming "
                "side never shuffles for the join when the dim "
                "broadcasts; the only exchange is the post-join "
                "aggregate on c_nationkey. A dimension too large to "
                "broadcast shuffles both sides per batch — at that "
                "point pre-bucket the dim on the join key or push the "
                "enrichment to a keyed-state transformWithState.",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = normalize_events(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    sink = f"ssj_static_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "stream_dedup_watermark",
    # Deterministic under AvailableNow: the self-union delivers every
    # event exactly twice, dropDuplicatesWithinWatermark keeps ONE row
    # per event_id (all duplicates arrive inside the watermark by
    # construction), so the deduped stream is exactly the events table
    # and the batch-side rollup is plain SQL.
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total
        FROM events
        GROUP BY event_type
    """,
    doc="Structured Streaming exactly-once-per-key ingestion: the events "
        "stream UNIONed with itself (every event delivered twice — the "
        "at-least-once-broker shape) is deduplicated with "
        "dropDuplicatesWithinWatermark on event_id under a 10-minute "
        "event-time watermark, then rolled up per event_type. The "
        "dedup-state API the `dedup` key's batch twin documents, "
        "actually driven end-to-end.",
    scale_notes="dropDuplicatesWithinWatermark is THE bounded-state "
                "streaming dedup: plain dropDuplicates keeps every seen "
                "key forever (state grows with the corpus), the "
                "watermark variant evicts keys older than the delay — "
                "state is bounded by the duplicate-arrival window, not "
                "the stream length. Dedup state shuffles on event_id "
                "(the dedup key), so it scales out with executors; at "
                "100 TB/day the watermark delay is the broker's "
                "redelivery horizon, keeping state at "
                "O(events-per-delay-window).",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import normalize_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema

    def one_stream():
        return normalize_events(
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    doubled = one_stream().unionByName(one_stream())
    deduped = (
        doubled.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sink = f"sdw_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )
