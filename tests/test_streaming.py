"""Structured-Streaming semantics beyond the CDC pipeline: stream-static
join, streaming dedup, watermarked windows, custom stateful operator,
Python UDTF surface."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_events(dir_: str, name: str, rows: list[dict], mtime: int | None = None) -> None:
    os.makedirs(dir_, exist_ok=True)
    tmp = os.path.join(dir_, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    path = os.path.join(dir_, f"{name}.json")
    os.rename(tmp, path)
    if mtime is not None:
        # The file source orders micro-batches by modification time; pin it
        # so multi-batch tests are deterministic.
        os.utime(path, (mtime, mtime))


def run_to_memory(stream_df, output_mode: str, **write_opts):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def test_stream_static_join(spark, tmp_path):
    """J8: stream ⋈ static dimension — no watermark needed, dim is
    broadcast per micro-batch."""
    src = str(tmp_path / "src")
    write_events(
        src,
        "b0",
        [
            {"event_id": 1, "user_id": 10, "ts": "2024-01-01T00:00:00", "value": 1.0},
            {"event_id": 2, "user_id": 20, "ts": "2024-01-01T00:01:00", "value": 2.0},
            {"event_id": 3, "user_id": 99, "ts": "2024-01-01T00:02:00", "value": 3.0},
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "silver")], "user_id long, tier string"
    )
    joined = stream.join(F.broadcast(dim), "user_id", "inner").select(
        "event_id", "tier"
    )
    name = run_to_memory(joined, "append")
    rows = {r["event_id"]: r["tier"] for r in spark.table(name).collect()}
    assert rows == {1: "gold", 2: "silver"}  # 99 has no dim row


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """J8 proper: stream ⋈ stream. Both sides watermarked; the join
    condition carries the time bound Spark needs to expire buffered
    state — an impression matches clicks within the following 10 min."""
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    write_events(
        imp_dir,
        "b0",
        [
            {"event_id": 1, "user_id": 10, "ts": "2024-01-01T00:00:00", "value": 0.0},
            {"event_id": 2, "user_id": 20, "ts": "2024-01-01T00:05:00", "value": 0.0},
            {"event_id": 3, "user_id": 30, "ts": "2024-01-01T01:00:00", "value": 0.0},
        ],
    )
    write_events(
        clk_dir,
        "b0",
        [
            # joins imp 1 (4 min after) — inside the 10-min bound
            {"event_id": 101, "user_id": 10, "ts": "2024-01-01T00:04:00", "value": 1.0},
            # 55 min after imp 2 — outside the bound, must NOT join
            {"event_id": 102, "user_id": 20, "ts": "2024-01-01T01:00:00", "value": 1.0},
        ],
    )
    imps = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(imp_dir)
        .select(
            F.col("event_id").alias("imp_id"),
            F.col("user_id").alias("imp_user"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", "30 minutes")
    )
    clicks = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(clk_dir)
        .select(
            F.col("event_id").alias("clk_id"),
            F.col("user_id").alias("clk_user"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "30 minutes")
    )
    joined = imps.join(
        clicks,
        (F.col("imp_user") == F.col("clk_user"))
        & (F.col("clk_ts") >= F.col("imp_ts"))
        & (F.col("clk_ts") <= F.col("imp_ts") + F.expr("interval 10 minutes")),
        "inner",
    ).select("imp_id", "clk_id")
    name = run_to_memory(joined, "append")
    rows = {(r["imp_id"], r["clk_id"]) for r in spark.table(name).collect()}
    assert rows == {(1, 101)}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """T7: dropDuplicatesWithinWatermark removes re-deliveries across
    micro-batches while bounding state."""
    src = str(tmp_path / "src")
    base = [
        {"event_id": 1, "user_id": 10, "ts": "2024-01-01T00:00:00", "value": 1.0},
        {"event_id": 2, "user_id": 20, "ts": "2024-01-01T00:01:00", "value": 2.0},
    ]
    write_events(src, "b0", base, mtime=1_000)
    write_events(src, "b1", base + [
        {"event_id": 3, "user_id": 30, "ts": "2024-01-01T00:02:00", "value": 3.0},
    ], mtime=2_000)  # re-delivers 1 and 2
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
        .json(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = run_to_memory(stream, "append")
    got = sorted(r["event_id"] for r in spark.table(name).collect())
    assert got == [1, 2, 3]


def test_stateful_running_stats_across_batches(spark, tmp_path):
    """T8: applyInPandasWithState carries per-user state across
    micro-batches."""
    from pubsub2bq_spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "src")
    write_events(src, "b0", [
        {"event_id": 1, "user_id": 10, "ts": "2024-01-01T00:00:00", "value": 1.5},
        {"event_id": 2, "user_id": 10, "ts": "2024-01-01T00:01:00", "value": 2.5},
    ], mtime=1_000)
    write_events(src, "b1", [
        {"event_id": 3, "user_id": 10, "ts": "2024-01-01T00:05:00", "value": 6.0},
    ], mtime=2_000)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    name = run_to_memory(running_user_stats(stream), "update")
    per_batch = sorted(
        (r["batch_events"], r["total_events"], r["total_value"])
        for r in spark.table(name).collect()
    )
    # batch 0: 2 events (sum 4.0); batch 1: 1 more event, state carried → 3 / 10.0
    assert per_batch == [(1, 3, 10.0), (2, 2, 4.0)]


def test_transform_with_state_profile_across_batches(spark, tmp_path):
    """T8 successor surface: the typed-state per-user profile (value +
    map state) carries across micro-batches — new event types grow the
    distinct count, the running max only rises. Runs the real
    transformWithState path when protobuf is importable, else the
    applyInPandasWithState twin with the identical contract."""
    from pubsub2bq_spark.streaming.stateful import user_profile_stats

    schema = T.StructType(
        EVENT_SCHEMA.fields + [T.StructField("event_type", T.StringType())]
    )
    src = str(tmp_path / "src")
    write_events(src, "b0", [
        {"event_id": 1, "user_id": 10, "ts": "2024-01-01T00:00:00",
         "value": 1.5, "event_type": "view"},
        {"event_id": 2, "user_id": 10, "ts": "2024-01-01T00:01:00",
         "value": 9.0, "event_type": "view"},
    ], mtime=1_000)
    write_events(src, "b1", [
        {"event_id": 3, "user_id": 10, "ts": "2024-01-01T00:05:00",
         "value": 6.0, "event_type": "click"},
    ], mtime=2_000)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    name = run_to_memory(user_profile_stats(stream), "update")
    per_batch = sorted(
        (r["total_events"], r["n_event_types"], r["max_value"])
        for r in spark.table(name).collect()
    )
    # batch 0: 2 views, max 9.0; batch 1: +1 click carried on top —
    # 3 events over 2 types, max unchanged (6.0 < 9.0 must not lower it).
    assert per_batch == [(2, 1, 9.0), (3, 2, 9.0)]


def test_watermark_drops_late_rows(spark, tmp_path):
    """T5: a row older than the committed watermark is dropped from the
    aggregation.

    Note Spark's watermark commits with a one-batch lag (it is computed
    from data through batch N and applied to filtering from batch N+2's
    planning onward), so the late row gets its own batch after the
    watermark has propagated — that is the case the engine guarantees.
    """
    src = str(tmp_path / "src")
    write_events(src, "b0", [
        {"event_id": 1, "user_id": 10, "ts": "2024-01-01T10:00:00", "value": 1.0},
    ], mtime=1_000)
    write_events(src, "b1", [
        {"event_id": 3, "user_id": 10, "ts": "2024-01-01T10:30:00", "value": 2.0},
    ], mtime=2_000)
    # Late row: 3 hours behind, watermark delay is 10 minutes → dropped.
    write_events(src, "b2", [
        {"event_id": 2, "user_id": 10, "ts": "2024-01-01T07:00:00", "value": 100.0},
    ], mtime=3_000)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.sum("value").alias("total"))
        .select(F.col("w.start").alias("ws"), "total")
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals = {str(r["ws"]): r["total"] for r in spark.table(name).collect()}
    assert not any("07:00" in k for k in totals)  # late row never surfaced
    assert any("10:00" in k for k in totals) and any("10:30" in k for k in totals)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # the engine itself counted the late-row drop


def test_python_udtf(spark):
    """U4: real Python UDTF (Spark 4) — emits one row per n-gram."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="ngram: string, pos: int")
    class CharNgrams:
        def eval(self, text: str, n: int):
            for i in range(len(text) - n + 1):
                yield text[i : i + n], i

    spark.udtf.register("char_ngrams", CharNgrams)
    rows = spark.sql(
        "SELECT * FROM char_ngrams('spark', 3)"
    ).collect()
    assert [(r["ngram"], r["pos"]) for r in rows] == [("spa", 0), ("par", 1), ("ark", 2)]


def test_python_stream_source_resumes_from_offset(spark, tmp_path):
    """The custom streaming source's offset (segment-name high-water mark)
    must survive a restart: a second run over the same checkpoint reads ONLY
    segments that arrived after the first run committed."""
    import os

    from pubsub2bq_spark.sources import cdc_fixtures as fx
    from pubsub2bq_spark.sources.spool_datasource import (
        register_spool_stream_source,
    )

    register_spool_stream_source(spark)
    spool = str(tmp_path / "spool")
    sink = str(tmp_path / "sink")
    cp = str(tmp_path / "cp")
    os.makedirs(spool)
    fx.write_segment(spool, "000_snapshot", fx.snapshot_events())

    def run_once():
        q = (
            spark.readStream.format("cdcspoolstream")
            .load(spool)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 3  # snapshot only
    fx.write_segment(spool, "001_insert995", fx.insert_995())
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 4  # exactly one new row — no snapshot re-read
    assert out.filter("op = 'c'").count() == 1


def test_python_stream_source_survives_spool_prune(spark, tmp_path):
    """Pruning consumed segments (retention enforcement) must not shift
    the offset: the name-keyed high-water mark keeps the `> mark` slice
    correct after a consumed prefix is deleted — a count-based offset
    would re-read or skip segments here."""
    import os

    from pubsub2bq_spark.sources import cdc_fixtures as fx
    from pubsub2bq_spark.sources.spool_datasource import (
        register_spool_stream_source,
    )

    register_spool_stream_source(spark)
    spool = str(tmp_path / "spool")
    sink = str(tmp_path / "sink")
    cp = str(tmp_path / "cp")
    os.makedirs(spool)
    fx.write_segment(spool, "000_snapshot", fx.snapshot_events())

    def run_once():
        q = (
            spark.readStream.format("cdcspoolstream")
            .load(spool)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 3
    # Retention prunes the already-consumed snapshot segment, then a new
    # segment arrives. The restarted stream must emit ONLY the new rows.
    os.remove(os.path.join(spool, "000_snapshot.json"))
    fx.write_segment(spool, "001_insert995", fx.insert_995())
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 4  # no snapshot replay, no skipped segment
    assert out.filter("op = 'c'").count() == 1


def test_spool_replay_from_offset_without_checkpoint_surgery(spark, tmp_path):
    """REPLAY semantics (the reference subscription UI): after a consumer
    drains the spool and commits its checkpoint, a new attach point with
    replayFrom=<mark> re-delivers everything past the mark — the first
    checkpoint is never touched, and re-running the FIRST query afterwards
    still delivers nothing new (its offsets are intact)."""
    import os

    from pubsub2bq_spark.sources import cdc_fixtures as fx
    from pubsub2bq_spark.sources.spool_datasource import (
        register_spool_stream_source,
    )

    register_spool_stream_source(spark)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    fx.write_segment(spool, "000_snapshot", fx.snapshot_events())
    fx.write_segment(spool, "001_insert995", fx.insert_995())
    fx.write_segment(spool, "002_delete990", fx.delete_990())

    def drain(reader, tag):
        q = (
            reader.writeStream.format("parquet")
            .option("path", str(tmp_path / f"{tag}_sink"))
            .option("checkpointLocation", str(tmp_path / f"{tag}_cp"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(tmp_path / f"{tag}_sink"))

    # First consumer drains everything (3 snapshot + 1 insert + 1 delete).
    first = drain(spark.readStream.format("cdcspoolstream").load(spool), "a")
    assert first.count() == 5
    ckpt_mtime = os.path.getmtime(str(tmp_path / "a_cp"))

    # Replay past segment 000: re-delivers exactly the 2 later segments.
    replayed = drain(
        spark.readStream.format("cdcspoolstream")
        .option("replayFrom", "000_snapshot.json")
        .load(spool),
        "b",
    )
    assert replayed.count() == 2
    assert {r.op for r in replayed.select("op").distinct().toLocalIterator()} == {"c", "d"}

    # replayFrom='' replays the full retained spool.
    full = drain(
        spark.readStream.format("cdcspoolstream")
        .option("replayFrom", "")
        .load(spool),
        "c",
    )
    assert full.count() == 5

    # The first consumer's checkpoint was untouched: re-running it
    # delivers nothing new.
    again = drain(spark.readStream.format("cdcspoolstream").load(spool), "a")
    assert again.count() == 5
    assert os.path.isdir(str(tmp_path / "a_cp"))
    assert ckpt_mtime <= os.path.getmtime(str(tmp_path / "a_cp"))


def test_spool_start_at_latest_skips_backlog(spark, tmp_path):
    """PURGE / seek-to-now: startAt=latest initializes at the current
    high-water mark — the backlog is skipped, only post-attach segments
    deliver."""
    import os

    from pubsub2bq_spark.sources import cdc_fixtures as fx
    from pubsub2bq_spark.sources.spool_datasource import (
        register_spool_stream_source,
    )

    register_spool_stream_source(spark)
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    fx.write_segment(spool, "000_snapshot", fx.snapshot_events())

    def drain(tag):
        q = (
            spark.readStream.format("cdcspoolstream")
            .option("startAt", "latest")
            .load(spool)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "cp"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("first")  # backlog (3 snapshot rows) skipped
    sink = str(tmp_path / "sink")
    n0 = spark.read.parquet(sink).count() if os.path.exists(sink) else 0
    assert n0 == 0 or spark.read.parquet(sink).count() == 0
    fx.write_segment(spool, "001_insert995", fx.insert_995())
    drain("second")
    out = spark.read.parquet(sink)
    assert out.count() == 1
    assert out.first().op == "c"


def test_jdbc_snapshot_leg_is_ranged_parallel(spark, tmp_path):
    """The Derby-backed JDBC snapshot must be a real ranged-parallel read:
    numPartitions ranged chunks on the key column (the Datastream backfill
    pattern), values round-tripping exactly."""
    from pubsub2bq_spark.operators.cdc_pipeline import _derby_url

    url = _derby_url(spark, str(tmp_path))
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    seed = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(100)], "id bigint, name string"
    )
    (seed.write.format("jdbc").option("url", url).option("driver", driver)
     .option("dbtable", "t").mode("overwrite").save())
    back = (
        spark.read.format("jdbc")
        .option("url", url).option("driver", driver).option("dbtable", "t")
        .option("partitionColumn", "id").option("lowerBound", "0")
        .option("upperBound", "100").option("numPartitions", "4")
        .load()
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"id": "sum"}).first()[0] == 4950
