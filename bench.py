#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

Each query is forced through full execution with the noop sink (count()
would let Spark skip projections). Times exclude session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pubsub2bq_spark.registry import all_queries  # noqa: E402
from pubsub2bq_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward the ops that
# dominate real pipelines (scan→filter→join→agg, windows, dedup, ANN).
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "filter_pred",
    "groupby_agg",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "count_distinct",
    "window_rank",
    "topk_per_group",
    "sort_limit",
    "latest_per_key",
    "tumbling_agg",
    "session_agg",
    "json_extract",
    "word_count",
    "text_dedup",
    "minhash_lsh",
    "simhash",
    "similarity_topk",
    "ann_lsh",
    "ann_ivf",
    "multimodal_meta",
    "doc_fingerprint",
    "dedup_clusters",
    "skew_salted_agg",
    "bucketed_join",
    # North-star pipeline at table scale: spool → publish → validate →
    # project → sink, full streaming execution per run.
    "cdc_stream_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("pubsub2bq_spark-bench")

    registry = all_queries()

    def run(key: str) -> float:
        # Time construction AND execution: operators that do eager work
        # while building (bucketed table writes, iterative fixpoints) must
        # not get that work excluded from their measurement.
        t0 = time.perf_counter()
        df = registry[key].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up pass (untimed): first executions are dominated by JIT +
    # codegen compilation, not by the queries. Steady state is what a
    # long-running deployment sees.
    for key in HEADLINE:
        run(key)

    # Settle between phases: the warm-up ends with the streaming pipeline,
    # whose checkpoint/temp-dir teardown otherwise bleeds into the first
    # timed query.
    spark.sql("select 1").collect()
    time.sleep(2)

    # min over two INTERLEAVED rounds: single-JVM timings show multi-second
    # noise spikes (observed: same query 0.5s and 9s in one session), and a
    # spike window is wide enough to cover two back-to-back runs of the
    # same query. Running the full suite twice and taking the per-query min
    # decorrelates the spikes from the queries they land on.
    round1 = {key: run(key) for key in HEADLINE}
    round2 = {key: run(key) for key in HEADLINE}
    timings = {key: round(min(round1[key], round2[key]), 3) for key in HEADLINE}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
