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
    # Round-2 suite extensions (SURVEY §2.12): the heaviest of the new
    # TPC-H shapes + the corpus-hygiene composites.
    "tpch_q9",
    "tpch_q13",
    "tpch_q21",
    "pii_scrub",
    "corpus_filter",
    "sessionize",
    "multi_grain_rollup",
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
    "ann_ivf_kmeans",
    "ann_pq",
    "multimodal_meta",
    "doc_fingerprint",
    "dedup_clusters",
    "skew_salted_agg",
    "bucketed_join",
    # Training-prep + ML suite (round 2, second half): chunking is the
    # heaviest map-only op, dup_passage the heaviest gram shuffle,
    # kmeans/pagerank the iterative archetypes.
    "doc_chunk",
    "dup_passage",
    "kmeans_lloyd",
    "pagerank",
    # Corpus-stats + graph/diff additions: entropy is the heaviest
    # per-doc aggregation, triangle_count the join-intensive graph op.
    "heavy_hitters",
    "token_entropy",
    "triangle_count",
    "snapshot_diff",
    # Round-2 late additions: incremental dedup is the steady-state
    # corpus-build op, graph_bfs the frontier-iterative archetype,
    # vocab/shuffle the tokenizer-prep passes, variant the semi-
    # structured path, count-min the mergeable-sketch path.
    "incremental_dedup",
    "variant_extract",
    "countmin_sketch",
    "bloom_membership",
    "graph_bfs",
    "vocab_coverage",
    "corpus_shuffle",
    "rag_retrieve",
    "recursive_cte",
    "markov_transitions",
    "canonical_dedup",
    "dataset_card",
    "stream_fanout",
    # North-star pipeline at table scale: spool → publish → validate →
    # project → sink, full streaming execution per run.
    "cdc_stream_events",
    # Round-4 additions: two-phase exact binning, 64-bit simhash +
    # Hamming-band pairs, Avro wire codec, JDBC snapshot leg, replay.
    "feature_binning",
    "simhash_pairs",
    "avro_validate",
    "jdbc_snapshot_union",
    "stream_replay",
    "bm25_topk",
    "hybrid_retrieve",
    "bpe_merges",
    "span_corruption",
    "transform_with_state",
    "kmeans_parallel_init",
    # Round-5 additions: LM-perplexity quality gate, SemDeDup pruning,
    # iterative BPE vocabulary training.
    "perplexity_filter",
    "semdedup",
    "bpe_train",
    "bpe_apply",
    # Round-6 additions: curriculum staging over the perplexity signal,
    # token-exact packing under the learned BPE vocab, cross-encoder-
    # style rerank over the hybrid retriever's candidates.
    "curriculum_order",
    "bpe_pack",
    "rerank_topk",
    # Hierarchical two-level IVF assignment (the corpus-scaled-k path).
    "ann_ivf_hier",
    # Round-8 additions: DSIR importance selection, CCNet paragraph
    # dedup with text rebuild, per-source boilerplate removal.
    "dsir_select",
    "paragraph_dedup",
    "boilerplate_remove",
    "embedding_pca",
    # Late round-8 additions: cross-cell SemDeDup recovery, token-n-gram
    # decontamination under the learned BPE vocab, the mixture×stage
    # training manifest, exact-substring repeat accounting, SFT chat
    # rendering with loss masks.
    "global_semdedup",
    "decontaminate",
    "mixture_curriculum",
    "substring_repeats",
    "chat_template",
    # DPO pair construction (one order-encoded aggregate) and directed
    # n-gram containment (rare-gram-blocked candidate pairs).
    "preference_pairs",
    "containment_dedup",
    # Embedding-space eval decontamination (directed cell-pair probe)
    # and the per-corpus-cell tokenizer-quality rollup.
    "semantic_decontaminate",
    "tokenizer_fertility",
]


REGRESSION_FACTOR = 1.5

# Keys whose headline time is dominated by a FIXED per-op cost, not
# per-row work — the gate compares the VARIABLE component (total −
# fixed) so a noise wiggle in the fixed term can't flag, and a real
# data-dependent regression can't hide under a large fixed term.
#
# * Stream keys (VERDICT r4 #7): micro-batch machinery + Python
#   state-worker spin-up + checkpoint setup. transform_with_state runs
#   a typed-state streaming query end-to-end; stream_replay runs TWO
#   stream queries (initial + seek-to-offset replay) by construction.
#   Values: measured wall-time at sf0.001 (per-batch work ~0, min of 3)
#   — the startup constant a real deployment amortizes over hours.
# * ann_ivf_kmeans (VERDICT r5 #4): the k-means|| seeding chain runs
#   ~15 eager materialize() jobs whose scheduling latency, not data,
#   dominates at bench scale. Measured r6: 5.8–6.9s essentially FLAT
#   from sf0.001 to sf0.1 (100× data) in a session whose calibration
#   showed ~1.2× machine inflation; variable share at sf0.1 ≈
#   (6.87 − 5.83)/6.87 ≈ 15%. Scaling that share onto the r5 driver
#   total (4.703s) puts the driver-machine fixed term at ~4.0s and the
#   variable term at ~0.7s — the value below is that driver-scale
#   estimate so the prior-side variable component stays positive.
FIXED_COST = {
    "transform_with_state": 3.7,  # measured 3.74s at sf0.001 (min of 3)
    "stream_replay": 3.6,         # measured 3.59s at sf0.001 (min of 3)
    "ann_ivf_kmeans": 4.0,        # ~85% fixed of r5's 4.703s (see above)
    # semdedup gained the same seeding chain in r6 (VERDICT r5 #5); its
    # fixed term is the same chain at the same bench scale. The r5
    # baseline (2.39s) predates the chain — the first r6-vs-r5 compare
    # flags it and KNOWN_SEMANTIC_CHANGES carries the explanation; from
    # r7 the gate tracks its variable component like ann_ivf_kmeans's.
    "semdedup": 4.0,
    # Two-level IVF: the k-means|| seeding + supercell-Lloyd chain is
    # ~15 eager bounded jobs — measured 4.48s at sf0.001 vs 5.54s at
    # sf0.1 (min of 3, r8 probe), so ~4.4s is scale-flat.
    "ann_ivf_hier": 4.4,
    # retrieve-then-rerank: hybrid_retrieve's materialize chain (fused
    # candidates + distinct-term relation) — measured 2.02s at sf0.001
    # vs 3.26s at sf0.1 (min of 3, r8 probe).
    "rerank_topk": 2.0,
    # r8 probe, min of 3 at sf0.001 vs sf0.1 — all scale-flat within
    # noise (iterative BPE merge rounds / two-phase staging / k-means||
    # rounds are fixed job chains; the per-row work is absorbed by idle
    # cores at bench scale). Constants set slightly below the sf0.001
    # min so the variable component stays positive.
    "bpe_pack": 2.2,            # 2.319 / 2.412
    "curriculum_order": 1.5,    # 1.632 / 2.045
    "bpe_apply": 2.0,           # 2.106 / 2.305
    "bpe_train": 1.8,           # 2.040 / 1.890
    "kmeans_parallel_init": 1.2,  # 1.275 / 1.593
}

# A flag must be actionable: beyond the ratio, the variable component
# must have grown by more than the harness's observed noise floor —
# ±0.5s for plain batch queries, ±1.0s for decomposed keys (stream
# micro-batch scheduling and many-job seeding chains both jitter ~1s
# run-to-run, and the fixed-cost subtraction makes small absolute
# wiggles look like large ratios).
MIN_ABS_REGRESSION = 0.5
MIN_ABS_REGRESSION_DECOMPOSED = 1.0


def _session_drift(timings: dict[str, float], prior_q: dict[str, float]) -> float:
    """Uniform machine/JVM drift between the two capture sessions: the
    MEDIAN raw now/was over common queries. A code regression is
    localized to the keys whose plan changed; a slow (or fast) session
    inflates every ratio by the same factor — observed r6→r7: 0.82x on
    identical code, and a 1.4x session showed up as two false flags on
    fixed-cost-dominated keys where the variable-component subtraction
    AMPLIFIED the uniform drift ((now-fixed)/(was-fixed) = 8x off a
    1.29x raw ratio). Decomposed keys and sub-0.1s priors are excluded
    from the estimate (amplified / noisy denominators); below 8 samples
    the estimate is unreliable, so no correction. Clamped to [0.5, 3]:
    anything beyond that is not 'drift' and should flag loudly."""
    rs = sorted(
        t / prior_q[k]
        for k, t in timings.items()
        if k not in FIXED_COST and prior_q.get(k, 0.0) > 0.1
    )
    if len(rs) < 8:
        return 1.0
    return min(max(rs[len(rs) // 2], 0.5), 3.0)


def _gate_ratio(key: str, now: float, was: float, drift: float = 1.0) -> float:
    """Regression ratio, on the variable component for decomposed keys.
    The raw observation deflates by the session drift BEFORE the
    fixed-cost subtraction — drift scales the whole measurement (the
    fixed job-scheduling constant included), so subtracting an
    un-drifted FIXED_COST from a drifted total would misattribute
    drift·fixed seconds to the variable component."""
    fixed = FIXED_COST.get(key, 0.0)
    now_v = max(now / drift - fixed, 0.05)
    was_v = max(was - fixed, 0.05)
    return now_v / was_v


def _gate_flags(key: str, now: float, was: float, drift: float = 1.0) -> bool:
    floor = (
        MIN_ABS_REGRESSION_DECOMPOSED
        if key in FIXED_COST
        else MIN_ABS_REGRESSION
    )
    return (
        _gate_ratio(key, now, was, drift) > REGRESSION_FACTOR
        and now / drift - was > floor
    )

# Flags whose cause is a DELIBERATE semantics change (the operator now
# does more work than the prior round's version, so prior-round time is
# not a like-for-like baseline). The flag still renders — the gate stays
# honest — but the compare doc carries the explanation. Remove an entry
# once a new BENCH_r*.json baseline includes the changed operator.
KNOWN_SEMANTIC_CHANGES = {
    # (emptied r6: the r4 simhash widening and the r5 ann_ivf_kmeans
    # seeding are both inside the BENCH_r05 baseline now, so the plain
    # gate is like-for-like again; ann_ivf_kmeans's residual fixed
    # seeding overhead is handled by FIXED_COST decomposition instead.)
    "semdedup": (
        "r5 baseline used a free first-16-by-id quantizer; r6 seeds it "
        "with k-means|| + one corpus Lloyd round (VERDICT r5 #5 — the "
        "production build, balances cells on skewed embeddings) and "
        "salts hot cells. The added time is the same seeding-chain "
        "fixed job overhead ann_ivf_kmeans carries (~15 eager "
        "materialize jobs); the intra-cell pair work is unchanged."
    ),
}


def _parse_bench_tail(tail: str) -> dict | None:
    """Recover the bench result from the driver's raw `tail` capture.

    The driver sometimes truncates the front of the result line (so
    `parsed` lands as null), but the full `"queries": {...}` dict and
    the scalar fields survive in `tail`. Extract the balanced queries
    object plus value/sf by regex so the regression gate never goes
    blind on a truncated capture.
    """
    import re

    start = tail.rfind('"queries"')
    if start < 0:
        return None
    brace = tail.find("{", start)
    if brace < 0:
        return None
    depth = 0
    end = -1
    for i in range(brace, len(tail)):
        c = tail[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    if end < 0:
        return None
    try:
        queries = json.loads(tail[brace:end])
    except ValueError:
        return None
    if not isinstance(queries, dict) or not queries:
        return None
    out: dict = {"queries": queries}
    for field in ("value", "sf", "calibration_range_sum_sec"):
        m = re.search(r'"%s":\s*([0-9.eE+-]+)' % field, tail)
        if m:
            try:
                out[field] = float(m.group(1))
            except ValueError:
                pass
    return out


def load_prior() -> tuple[str, dict] | None:
    """Latest usable BENCH_r*.json (driver-recorded) as (basename, dict).

    Walks backwards from the newest file until one yields a queries
    dict — via the driver's `parsed` wrapper, the bare shape, or the
    tail-string fallback for truncated captures.
    """
    import glob

    root = os.path.dirname(os.path.abspath(__file__))
    priors = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    for prior_path in reversed(priors):
        try:
            with open(prior_path) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            continue
        # The driver wraps bench.py's JSON line under "parsed" (alongside
        # its own run metadata); accept the wrapped and the bare shape.
        # Keep the wrapper: `tail` lives on it, not inside `parsed`, so
        # a parsed-but-queries-less dict must not shadow the fallback.
        wrapper = prior
        if "queries" not in prior and isinstance(prior.get("parsed"), dict):
            prior = prior["parsed"]
        if not prior.get("queries") and isinstance(wrapper.get("tail"), str):
            recovered = _parse_bench_tail(wrapper["tail"])
            if recovered is not None:
                prior = recovered
        if prior.get("queries"):
            return os.path.basename(prior_path), prior
    return None


def flagged_vs_prior(
    timings: dict[str, float], drift: float | None = None
) -> list[str]:
    """Queries slower than REGRESSION_FACTOR x the prior round
    (drift-normalized: see _session_drift). ``drift`` may be pinned by
    the caller so the remeasure pass and the final report use the SAME
    estimate — recomputing it after isolated re-measurements lowered
    some timings would shift the median and could flag a key that never
    got its isolated run."""
    loaded = load_prior()
    if loaded is None:
        return []
    prior_q = loaded[1].get("queries", {})
    if drift is None:
        drift = _session_drift(timings, prior_q)
    return [
        key
        for key, now in timings.items()
        if prior_q.get(key) and _gate_flags(key, now, prior_q[key], drift)
    ]


# Median-vs-calibration disagreement beyond this emits the UNEXPLAINED
# UNIFORM SLOWDOWN warning: a genuine code regression in a shared helper
# slows every operator (median rises) but not the pure-compute probe.
DRIFT_CALIBRATION_TOLERANCE = 0.25


def _drift_warning(
    drift: float,
    calibration: float | None,
    prior_calib: float | None,
) -> str | None:
    """Surface — never silently normalize — a large median drift the
    pure-compute calibration probe does not corroborate. A slow box
    raises the median AND the probe together; a code regression in a
    shared helper (materialize / fan_out / load / session conf) raises
    only the median, because the probe runs no operator code. Returns
    the warning text, or None when the drift is small, corroborated, or
    no calibration pair exists to check against."""
    if not calibration or not prior_calib:
        return None
    calib_ratio = calibration / prior_calib
    if (
        drift <= 1.0 + DRIFT_CALIBRATION_TOLERANCE
        or drift <= calib_ratio * (1.0 + DRIFT_CALIBRATION_TOLERANCE)
    ):
        return None
    return (
        f"**UNEXPLAINED UNIFORM SLOWDOWN**: median query drift is "
        f"{drift:.2f}× but the pure-compute calibration probe moved "
        f"only {calib_ratio:.2f}× ({prior_calib}s → {calibration}s). "
        "A slow box shows up in BOTH numbers; a regression in a shared "
        "helper (materialize / fan_out / load / session conf) shows up "
        "only in the median. Treat this run as suspect: diff the "
        "shared-helper code paths before trusting the per-query "
        "'no flags' verdict below."
    )


def compare_to_prior_rounds(
    timings: dict[str, float],
    total: float,
    remeasured: dict[str, float],
    drift: float | None = None,
    calibration: float | None = None,
) -> None:
    """Regression gate: compare this run against the latest BENCH_r*.json
    and write docs/BENCH_COMPARE.md flagging per-query slowdowns beyond
    REGRESSION_FACTOR — so 'which queries regressed since round N' is a
    mechanical read, not a diff session. ``remeasured`` holds the
    isolated min-of-3 for queries the interleaved rounds flagged, so
    noise spikes can't masquerade as (or hide) a real regression.
    Report only; stdout stays the driver's single JSON line."""
    loaded = load_prior()
    if loaded is None:
        return
    prior_name, prior = loaded
    prior_path = prior_name
    prior_q: dict[str, float] = prior.get("queries", {})
    root = os.path.dirname(os.path.abspath(__file__))

    if drift is None:
        drift = _session_drift(timings, prior_q)
    # Cross-check the timing-derived drift against the pure-compute
    # calibration probe: median drift explains a slow BOX, but a shared-
    # helper code regression ALSO raises the median uniformly — the
    # calibration probe (identical JVM work each round, no operator
    # code) is immune to the latter, so a large median drift the probe
    # does not corroborate must be surfaced, not normalized away.
    drift_warning = _drift_warning(
        drift, calibration, prior.get("calibration_range_sum_sec")
    )
    lines = [
        "# Bench comparison (generated by bench.py — do not edit)",
        "",
        f"Current run vs `{prior_path}` "
        f"(total {prior.get('value', '?')}s → {total}s; session drift "
        f"{drift:.2f}× — the median raw now/prior over common stable "
        "queries, divided out of every ratio below so uniform "
        "machine/JVM speed changes between capture sessions don't "
        "flag). "
        f"Queries slower than {REGRESSION_FACTOR}× prior in the "
        "interleaved rounds get an ISOLATED min-of-3 re-measurement "
        "(the `isolated` column); a flag survives only if the isolated "
        "time still exceeds the factor — noise spikes from JVM overlap "
        "can't hide or fake a regression.",
        "",
    ]
    if drift_warning:
        lines += [drift_warning, ""]
    lines += [
        "| query | prior (s) | now (s) | isolated (s) | ratio | flag |",
        "|---|---|---|---|---|---|",
    ]
    flagged = []
    for key, now in timings.items():
        was = prior_q.get(key)
        iso = remeasured.get(key)
        iso_s = iso if iso is not None else "—"
        if was is None:
            lines.append(f"| {key} | — | {now} | {iso_s} | — | new |")
            continue
        ratio = _gate_ratio(key, now, was, drift) if was > 0 else float("inf")
        flag = (
            "**REGRESSED**"
            if was > 0 and _gate_flags(key, now, was, drift)
            else ""
        )
        if flag:
            flagged.append(key)
        note = (
            f" (variable: {FIXED_COST[key]}s fixed cost excluded)"
            if key in FIXED_COST
            else ""
        )
        lines.append(
            f"| {key} | {was} | {now} | {iso_s} | {ratio:.2f}×{note} | {flag} |"
        )
    lines += ["", f"Flagged: {', '.join(flagged) if flagged else 'none'}", ""]
    if any(k in timings for k in FIXED_COST):
        lines += [
            "Fixed-cost decomposition (ratios above compare the "
            "variable component):",
            "",
        ] + [
            f"- `{k}`: ~{v}s of the headline time is a per-op constant "
            "(stream startup for the streaming keys; eager seeding-"
            "chain job overhead for the k-means||-built indexes — "
            "measured flat across sf0.001→sf0.1); the remainder is "
            "work that scales with data."
            for k, v in FIXED_COST.items()
            if k in timings
        ] + [""]
    explained = [k for k in flagged if k in KNOWN_SEMANTIC_CHANGES]
    if explained:
        lines += ["Known semantic changes behind flags:", ""]
        lines += [
            f"- `{k}`: {KNOWN_SEMANTIC_CHANGES[k]}" for k in explained
        ] + [""]

    out = os.path.join(root, "docs", "BENCH_COMPARE.md")
    try:
        with open(out, "w") as f:
            f.write("\n".join(lines))
        warn = " + UNEXPLAINED UNIFORM SLOWDOWN" if drift_warning else ""
        print(f"bench-compare: {len(flagged)} regression(s){warn} vs "
              f"{os.path.basename(prior_path)} -> {out}", file=sys.stderr)
    except OSError:
        pass


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

    # Isolated min-of-3 for (a) queries the interleaved rounds flagged as
    # regressed vs the prior round and (b) NEW keys with no prior timing
    # at all — a new key must not land with an unexamined cost either.
    # A settle pause + three back-to-back runs of ONLY that query; the
    # min of everything measured is the query's time — a verdict then
    # can't come from a noise spike that covered both interleaved rounds.
    loaded = load_prior()
    prior_queries = loaded[1].get("queries", {}) if loaded else {}
    new_keys = [k for k in timings if k not in prior_queries]
    # Drift is pinned ONCE, from the interleaved timings, and reused by
    # the final report: the isolated re-measurements below lower some
    # timings, and recomputing the median after that could flag a key
    # that never received its isolated run.
    drift = _session_drift(timings, prior_queries)
    remeasured: dict[str, float] = {}
    for key in flagged_vs_prior(timings, drift) + new_keys:
        spark.sql("select 1").collect()
        time.sleep(1)
        iso = round(min(run(key) for _ in range(3)), 3)
        remeasured[key] = iso
        timings[key] = min(timings[key], iso)

    # Environment calibration: a fixed pure-compute JVM query (no IO, no
    # shuffle — one whole-stage-codegen range sum). Identical work every
    # round, so round-over-round drift in THIS number is machine speed,
    # not code: it lets a reader split "the operators regressed" from
    # "the box was slower" when comparing BENCH_r{N} files. (Observed in
    # round 5: a uniform ~1.2x inflation on untouched queries across a
    # whole session.) Measured BEFORE the compare so the report can
    # cross-check the timing-derived median drift against it.
    def _calibrate() -> float:
        t0 = time.perf_counter()
        spark.range(0, 2_000_000_000, 1, 32).agg({"id": "sum"}).collect()
        return time.perf_counter() - t0

    _calibrate()  # warm
    calibration = round(min(_calibrate() for _ in range(3)), 3)

    total = round(sum(timings.values()), 3)
    compare_to_prior_rounds(timings, total, remeasured, drift, calibration)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                "calibration_range_sum_sec": calibration,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
