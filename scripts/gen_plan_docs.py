#!/usr/bin/env python
"""Generate docs/PLANS.md: the physical plan for each headline query with
a plan-quality summary (join strategies, exchange count, scan pushdown,
whole-stage-codegen coverage).

This is the evidence artifact for the 100 TB design claims: a reviewer can
see per query that filters reach the parquet scan, small sides broadcast,
and hot paths stay inside codegen — without re-running anything.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubsub2bq_spark.registry import all_queries  # noqa: E402
from pubsub2bq_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Batch headline queries only: streaming keys (cdc_*, watermark_window,
# stream_stream_join) execute eagerly inside their builder, so their final
# DataFrame is just the sink read-back — the interesting plan is asserted
# in tests/test_streaming.py instead.
PLAN_KEYS = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "tpch_q2",
    "tpch_q9",
    "tpch_q13",
    "tpch_q17",
    "tpch_q21",
    "ann_pq",
    "bloom_membership",
    "mixture_temperature",
    "shard_manifest",
    "contamination_check",
    "pii_scrub",
    "repetition_filter",
    "corpus_filter",
    "sessionize",
    "cohort_retention",
    "multi_grain_rollup",
    "window_range_frame",
    "zorder_layout",
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
    "word_count",
    "text_dedup",
    "minhash_lsh",
    "simhash",
    "doc_fingerprint",
    "similarity_topk",
    "ann_lsh",
    "ann_ivf",
    "skew_salted_agg",
    "skew_salted_join",
    "bloom_semi_reduction",
    "tfidf_topterms",
    "unigram_logprob",
    "edit_distance_pairs",
    "hll_mergeable_sketch",
    "embedding_quantize",
    "bucketed_join",
    "partition_pruned_join",
    "incremental_dedup",
    "variant_extract",
    "countmin_sketch",
    "graph_bfs",
    "vocab_coverage",
    "corpus_shuffle",
    "ann_ivf_kmeans",
    "rag_retrieve",
    "dedup_clusters",
    "perplexity_filter",
    "semdedup",
    "bpe_train",
    "bpe_apply",
    "recursive_cte",
    "markov_transitions",
    "canonical_dedup",
    "dataset_card",
    "rolling_corr",
    # Round-4 batch additions (streaming r4 keys — stream_replay,
    # transform_with_state — are plan-asserted in tests/test_streaming.py).
    "feature_binning",
    "simhash_pairs",
    "bm25_topk",
    "hybrid_retrieve",
    "avro_validate",
    "jdbc_snapshot_union",
    "kmeans_parallel_init",
    # Round-8 additions (embedding_pca's corpus-scaled stage is the
    # covariance aggregate; the iteration itself is driver-side over a
    # bounded artifact, so its plan of record is the per-dim result).
    "dsir_select",
    "paragraph_dedup",
    "boilerplate_remove",
    "quality_ensemble",
    "image_resize",
    "audio_feature",
    "selection_funnel",
    "embedding_whiten",
    "join_lateral",      # decorrelated LATERAL -> WindowGroupLimit
    "pipe_syntax",       # pipe SQL lowers to the same plan as ANSI
    "python_datasink",
    "preference_pairs",  # order-encoded argmax: one partial-agg shuffle
    "containment_dedup", # rare-gram blocking + doc-keyed count chain
    "semantic_decontaminate",  # directed cell-pair train x eval probe
    "tokenizer_fertility",     # vocab join + corpus-cell aggregate
    # Round-9 additions (stream_dedup_watermark is streaming — its
    # bounded-state property is asserted in tests/test_streaming.py).
    "image_phash",        # no-shuffle Arrow kernel scan
    "image_phash_pairs",  # banded Hamming self-join over hash rows
    "image_dedup_clusters",  # star contraction over phash edges (r10)
    "audio_frames",       # kernel-side row expansion, no shuffle
    "ann_index_persist",
    "audio_resample",
    "mmr_diversify",      # broadcast relevance scan + K bounded greedy stages
    "compression_ratio",  # pure scan-project, ArrowEvalPython only
    "winnow_fingerprint", # map-side window-min sketch, no shuffle
    "winnow_matches",     # df-capped fingerprint self-join
    "kneser_ney_logprob", # one gram shuffle, stat rollups of the type relation
    "video_frames",       # kernel-side frame expansion, no shuffle
]


def summarize(executed: str, formatted: str) -> dict[str, object]:
    """Join strategies and shuffle-stage counts from the AQE-final executed
    plan; codegen + pushdown from the formatted explain (AQE hides codegen
    ids in the executed-plan string)."""
    return {
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", executed)),
        "sort_merge_joins": executed.count("SortMergeJoin"),
        "shuffle_stages": len(set(re.findall(r"ShuffleQueryStage (\d+)", executed)))
        or len(re.findall(r"Exchange (?:hash|range)partitioning", executed)),
        # Codegen stages appear as "*(N)" prefixes in the finalized plan
        # (the initial-plan section carries no asterisks), falling back to
        # "codegen id" markers for non-AQE plans.
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", executed)))
        or len(set(re.findall(r"codegen id : (\d+)", formatted))),
        "pushed_filters": "PushedFilters: [" in formatted
        and "PushedFilters: []" not in formatted,
    }


def main() -> None:
    spark = get_spark("plan-docs")
    registry = all_queries()
    out = [
        "# Physical plans (generated — do not edit)",
        "",
        f"`scripts/gen_plan_docs.py` over `{SF_DIR}`, AQE final plans "
        "(each query executed once so AQE's runtime re-planning is "
        "reflected).",
        "",
        "| query | broadcast joins | sort-merge joins | shuffle stages | codegen stages | pushed filters |",
        "|---|---|---|---|---|---|",
    ]
    details = []
    import contextlib
    import io

    for key in PLAN_KEYS:
        df = registry[key].spark(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        formatted = buf.getvalue()
        # collect() executes THIS DataFrame's QueryExecution, so the
        # executedPlan below is the AQE-finalized plan (isFinalPlan=true);
        # a .write would execute a copy and leave this plan unfinalized.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # The AQE plan string carries BOTH '== Final Plan ==' and
        # '== Initial Plan ==' sections; counting over the whole string
        # double-counts every operator (and mixes pre-/post-AQE join
        # strategies). Summarize the final section only.
        s = summarize(plan.split("== Initial Plan ==")[0], formatted)
        out.append(
            f"| {key} | {s['broadcast_joins']} | {s['sort_merge_joins']} "
            f"| {s['shuffle_stages']} | {s['codegen_stages']} "
            f"| {'yes' if s['pushed_filters'] else '—'} |"
        )
        details.append(f"## {key}\n\n```\n{plan.strip()}\n```\n")
    out.append("")
    out.extend(details)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
