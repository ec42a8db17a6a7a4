"""Bounded-state proof for stream_dedup_watermark (VERDICT r9 #8):
drive the SAME self-unioned at-least-once dedup shape as the registered
operator over a TIME-ORDERED multi-batch spool at a scaled event volume,
and read per-batch state rows from StreamingQueryProgress — showing
dropDuplicatesWithinWatermark's eviction actually bounds memory, vs the
plain dropDuplicates twin whose state grows with the stream.

The spool splits events into N files by event-time range, written in
chronological order, streamed with maxFilesPerTrigger=1 — so the
watermark advances ~(span/N) per batch, far past the 10-minute delay,
and every batch's close should evict (nearly) all prior keys.

Usage: python scripts/stream_state_probe.py [--sf DIR] [--files 8]
Appends a section to docs/SCALING.md with --write.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import uuid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402


def probe(spark, sf_dir: str, n_files: int, bounded: bool) -> dict:
    from pubsub2bq_spark.tables import normalize_events, scratch_dir, table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    spool = os.path.join(scratch_dir("sdw_probe_"), "spool")
    os.makedirs(spool)
    # Time-ordered spool files, one parquet FILE per time bucket, written
    # oldest-first so the file source (oldest-mod-time-first) replays the
    # stream in event-time order and the watermark genuinely advances.
    from pyspark.sql import Window

    bucketed = raw.withColumn(
        "__b", F.ntile(n_files).over(Window.orderBy("ts"))
    )
    for i in range(1, n_files + 1):
        bucketed.filter(F.col("__b") == i).drop("__b").coalesce(1).write.parquet(
            os.path.join(spool, f"t{i:03d}")
        )

    schema = raw.schema

    def one_stream():
        return normalize_events(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(spool)
        )

    doubled = one_stream().unionByName(one_stream())
    wm = doubled.withWatermark("ts", "10 minutes")
    deduped = (
        wm.dropDuplicatesWithinWatermark(["event_id"])
        if bounded
        else wm.dropDuplicates(["event_id"])
    )
    sink = f"sdwp_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = []
    for p in q.recentProgress:
        so = p.get("stateOperators") or []
        if not so or p.get("numInputRows", 0) == 0:
            continue
        batches.append(
            {
                "input_rows": p["numInputRows"],
                "state_rows": so[0]["numRowsTotal"],
                "evicted": so[0]["numRowsRemoved"],
                "batch_ms": p["durationMs"].get("triggerExecution"),
            }
        )
    out_rows = spark.table(sink).count()
    shutil.rmtree(os.path.dirname(spool), ignore_errors=True)
    # triggerExecution may be absent from a progress event (ADVICE r10)
    # — filter Nones before sorting, as streaming/throughput.py does.
    batch_ms = sorted(
        b["batch_ms"] for b in batches if b["batch_ms"] is not None
    )
    return {
        "mode": "withinWatermark" if bounded else "plain dropDuplicates",
        "unique_events": raw.count(),
        "output_rows": out_rows,
        "batches": batches,
        "peak_state_rows": max(b["state_rows"] for b in batches),
        "final_state_rows": batches[-1]["state_rows"],
        "total_evicted": sum(b["evicted"] for b in batches),
        "median_batch_ms": batch_ms[len(batch_ms) // 2]
        if batch_ms
        else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/scale_probe/x32")
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()

    from pubsub2bq_spark.session import get_spark

    spark = get_spark("stream-state-probe")
    for bounded in (True, False):
        r = probe(spark, args.sf, args.files, bounded)
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
