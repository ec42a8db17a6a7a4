#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (r14, lossless): stdout is a sequence of SMALL JSON
lines — ≤20 query timings per `{"bench_chunk": i, "of": n, "queries":
{...}}` line, then ONE compact final line {"metric", "value", "unit":
"sec", "sf", "run_id", calibration/stream/build scalars...} LAST. Every
line is bounded (BENCH_LINE_MAX_BYTES) so the driver's ~2 KB tail
capture always ends on complete, parseable JSON. The full result
(including the whole queries dict) is appended to docs/bench_runs.jsonl
keyed by run_id; next round's regression gate joins BENCH_r{N}.json back
to it.

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
    # IVF-PQ (r10): residual product quantization inside IVF cells —
    # the FAISS-default serving combination.
    "ann_ivfpq",
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
    # Round-9 additions: the multimodal verbs now decode REAL PNG/WAV
    # payloads inside their kernels (stdlib codecs) — their cost is no
    # longer byte-length arithmetic, so they join the headline set.
    "image_resize",
    "audio_feature",
    "audio_resample",
    # Serve-from-disk IVF: build once (shared cache), persist partitioned
    # by cell, answer the probe query from the reloaded files.
    "ann_index_persist",
    # Image near-dup chain: real decode → aHash → banded Hamming pairs
    # (the image twin of simhash_pairs), plus frame-level audio features.
    "image_phash_pairs",
    "image_dedup_clusters",
    "audio_frames",
    # MMR re-rank (bounded greedy over the relevance pool) and the
    # zlib-compressibility pre-filter (pure scan, Arrow-batched).
    "mmr_diversify",
    "compression_ratio",
    # Winnowing passage-overlap detection (df-capped fingerprint join).
    "winnow_matches",
    # Interpolated Kneser-Ney bigram LM scoring (the KenLM standard).
    "kneser_ney_logprob",
    # Real AVI container parse, one row per decoded frame.
    "video_frames",
    # Round-11 additions: the three pair keys rewritten onto Arrow
    # kernels (Gram-product Jaccard, LSH-bucket cosine, bit-parallel
    # Levenshtein) join the gate so a kernel regression can't hide
    # outside the headline set.
    "ngram_jaccard",
    "embedding_dedup",
    "edit_distance_pairs",
    # Round-12 additions: the composed sketch→verify edit-distance
    # pipeline (LSH candidates → bit-parallel Levenshtein verify) and
    # the real stdlib baseline-JPEG decode path (Huffman + IDCT).
    "edit_verified",
    "jpeg_decode",
    # Round-13 additions: 4:2:0 chroma-subsampled color JPEG decode
    # (MCU-interleaved entropy decode + chroma upsample, the layout of
    # most real-world JPEGs) and Motion-JPEG video frames (per-frame
    # baseline-JPEG entropy decode inside the AVI container walk).
    "jpeg_subsampled",
    "video_frames_mjpeg",
    "audio_mulaw",
    "jpeg_progressive",
    "jpeg_progressive_color",
    # Round-13 late additions: IMA ADPCM (adaptive compressed audio,
    # full step-table recurrence), MS-RLE8 (the first INTER-FRAME
    # video codec: delta opcodes against a persistent canvas) and
    # SOF9 arithmetic JPEG (T.81 Annex D QM-coder + Annex F models —
    # the last JPEG entropy mode behind the gate).
    "audio_adpcm",
    "video_frames_rle",
    "jpeg_arith",
    "jpeg_lossless",
    # Animated GIF: LZW + sub-rectangle inter-frame compositing.
    "gif_frames",
    # FLAC: compressed lossless audio with real CRC/MD5 verification.
    "audio_flac",
    # TIFF: multi-strip early-change LZW (the scanned-document format).
    "tiff_decode",
    # QOI: the modern table-free lossless image format.
    "qoi_decode",
    # Hierarchical JPEG (T.81 Annex J): DHP/EXP pyramid with an SOF5
    # differential frame — the last Huffman JPEG mode.
    "jpeg_hier",
    # G.711 A-law: the second companding law (wFormatTag 6).
    "audio_alaw",
    # MPEG-1 Layer II: the first perceptual audio codec (r14).
    "audio_mp2",
    # Arithmetic progressive JPEG (SOF10): the last T.81 matrix cell.
    "jpeg_arith_progressive",
    # Arithmetic lossless JPEG (SOF11): the matrix is now complete.
    "jpeg_arith_lossless",
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
    # r9 re-measured the k-means||-seeded family AFTER the session-level
    # quantizer/index cache landed (r9 commit 77e8037): the seeding
    # chain now runs once per (session, sf) and min-of-N reflects the
    # CACHED cost. sf0.001/sf0.1 min-of-3, one session: ann_ivf_kmeans
    # 0.66/0.52, semdedup 0.99/1.41, ann_ivf_hier 0.78/1.07. Constants
    # sit slightly below the smallest observation so the variable
    # component stays positive against both the pre-cache r8 priors and
    # the cached r9+ captures.
    "ann_ivf_kmeans": 0.4,
    # semdedup RE-MEASURED r11 after the per-cell Gram kernel (the
    # recalibration discipline — the constant comes DOWN with the fix):
    # min-of-3 one session, sf0.001 0.96 / sf0.1 0.89, warm bench
    # context 0.67-0.81. Constant below the smallest observation.
    "semdedup": 0.6,
    "ann_ivf_hier": 0.6,
    # retrieve-then-rerank: r10 moved the fused candidate set into the
    # session cache (shared with hybrid_retrieve), so rerank pays only
    # its own pair-scoring joins — warm min-of-3 re-measured 0.89s at
    # sf0.001 / 0.98s at sf0.1 (was 2.02/3.26 pre-cache).
    "rerank_topk": 0.7,
    # r10 re-measured the BPE-vocab and bigram-LM consumers AFTER the
    # shared session artifacts landed (cached_vocab_pieces, _doc_nll,
    # _staged_nll — the r8 quantizer-cache pattern): each key now reads
    # the once-per-(session, sf) artifact instead of retraining the
    # merge/scoring chain. Warm min-of-3, sf0.001 / sf0.1:
    # bpe_apply 0.52/0.64, bpe_pack 0.58/0.53, curriculum_order
    # 0.94/0.61 (hash-identical outputs, verified vs the DuckDB oracle).
    # Constants re-set slightly below the smallest observation so a
    # future regression can't hide inside the old subtraction.
    # bpe_train still trains per call BY DESIGN (it IS the training op).
    "bpe_pack": 0.4,
    "curriculum_order": 0.5,
    "bpe_apply": 0.4,
    "bpe_train": 1.8,           # r8: 2.040 / 1.890 (unchanged path)
    "kmeans_parallel_init": 1.2,  # r8: 1.275 / 1.593
    # image_dedup_clusters RE-MEASURED r10 after the large-star/
    # small-star switch (VERDICT r9 #3: the recalibration discipline —
    # the constant must come DOWN with the fix so a future regression
    # can't hide inside the old subtraction): min-of-3 one session,
    # sf0.001 4.43s / sf0.1 6.22s, warm bench context 3.47s (was
    # 10.2/9.2 under the min-label loop). Star rounds + the 2-hop exact finish are ~6 eager jobs
    # total vs min-label's 13 convergence rounds. mmr_diversify r9:
    # 4.3/2.6 (bench 1.9 — K materialize+window stages). Constants
    # below the smallest observed context so the variable term stays
    # positive everywhere.
    # image_dedup_clusters RE-MEASURED r11 after the adaptive selector:
    # sf0.001 2.15 min-of-3 (selector stays on min-label — cheaper than
    # the old constant), sf0.1 3.1-4.6 (probe + star rounds). Constant
    # below the smallest observation so the variable term stays
    # positive everywhere.
    "image_dedup_clusters": 2.0,
    "mmr_diversify": 1.5,
    # r11: the key is fixture-driven (3 seed rows + a bounded spool) —
    # Derby embedded-DB spin-up + one streaming-query startup, with NO
    # input-scale term at all: fresh-session min-of-3 measured 1.32s at
    # sf0.001 vs 1.25s at sf0.1 (sf0.1 is not slower). Constant set
    # just below the smallest observation.
    "jdbc_snapshot_union": 1.2,
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
    "image_dedup_clusters": (
        "r11 replaces the hard-coded star contraction with the adaptive "
        "CC selector (VERDICT r10 #6, llm_dedup.adaptive_components): a "
        "2-round min-label probe measures frontier shrinkage, then "
        "switches to star on the deep sf0.1 image graph. The probe costs "
        "~1.9s of extra eager rounds at sf0.1 (measured 4.75s min-of-3 "
        "vs 2.86s r10) and is the price of never-DNF robustness on ANY "
        "graph shape; at sf0.001 the selector correctly STAYS on "
        "min-label and the key got cheaper (2.28s vs 4.43s r10). Flag "
        "clears when BENCH_r11 becomes the baseline."
    ),
}


# ---------------------------------------------------------------------------
# Lossless bench record (judge r13 task #1).
#
# The driver captures only the LAST ~2000 characters of bench.py's stdout
# ("tail") and records BENCH_r{N}.json with `parsed: null` whenever that
# window slices into the middle of a JSON line. One giant result line
# (126+ queries ≈ 3.5 KB) therefore NEVER survives whole — r12 and r13
# both degraded to a regex harvest over the fragment. Fix at the source:
#   * stdout is emitted as SMALL lines — ≤ BENCH_CHUNK_KEYS query timings
#     per `{"bench_chunk": i, ...}` line, and a compact scalar-totals line
#     LAST, every line bounded to BENCH_LINE_MAX_BYTES < the capture
#     window, so the tail always retains at least one parseable record;
#   * the COMPLETE result is appended to docs/bench_runs.jsonl keyed by a
#     `run_id` also stamped on the stdout lines. The driver's round
#     commit includes files the bench run writes (r13 commit b8ebe74
#     carried docs/BENCH_COMPARE.md), so next round's regression gate can
#     join BENCH_r{N}.json's run_id back to the full per-query record.
# ---------------------------------------------------------------------------

BENCH_LINE_MAX_BYTES = 1900  # driver tail keeps ~2000 chars; stay under
BENCH_CHUNK_KEYS = 20
BENCH_RUNS_BASENAME = os.path.join("docs", "bench_runs.jsonl")
BENCH_RUNS_KEEP = 24  # newest runs kept in the jsonl (≈ several rounds)


def _bench_runs_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), BENCH_RUNS_BASENAME
    )


def _emit_lines(result: dict) -> list[str]:
    """Split the bench result into bounded stdout lines (pure function).

    Query timings go out in ≤ BENCH_CHUNK_KEYS-key `bench_chunk` lines;
    the final line carries every scalar field (metric/value/calibration/
    stream/build legs) plus run_id and chunk accounting — totals LAST so
    the driver's tail capture always ends on a complete JSON record.
    Every line is asserted under BENCH_LINE_MAX_BYTES.
    """
    queries = result.get("queries", {})
    run_id = result.get("run_id", "")
    keys = list(queries)
    chunks = [
        keys[i : i + BENCH_CHUNK_KEYS]
        for i in range(0, len(keys), BENCH_CHUNK_KEYS)
    ]
    lines: list[str] = []
    for i, chunk in enumerate(chunks, 1):
        lines.append(
            json.dumps(
                {
                    "bench_chunk": i,
                    "of": len(chunks),
                    "run_id": run_id,
                    "queries": {k: queries[k] for k in chunk},
                },
                separators=(",", ":"),
            )
        )
    final = {k: v for k, v in result.items() if k != "queries"}
    final["n_queries"] = len(keys)
    final["queries_chunks"] = len(chunks)
    final["full_record"] = BENCH_RUNS_BASENAME
    lines.append(json.dumps(final, separators=(",", ":")))
    for ln in lines:
        if len(ln.encode()) > BENCH_LINE_MAX_BYTES:
            raise AssertionError(
                f"bench stdout line exceeds {BENCH_LINE_MAX_BYTES} bytes "
                f"({len(ln.encode())}): the driver tail capture would "
                f"truncate it — shrink BENCH_CHUNK_KEYS. Line head: "
                f"{ln[:120]}"
            )
    return lines


def _record_full_run(result: dict) -> None:
    """Append the complete result to docs/bench_runs.jsonl (pruned)."""
    path = _bench_runs_path()
    rows: list[str] = []
    try:
        with open(path) as f:
            rows = [ln for ln in f.read().splitlines() if ln.strip()]
    except OSError:
        pass
    rows.append(json.dumps(result, separators=(",", ":")))
    rows = rows[-BENCH_RUNS_KEEP:]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def _load_full_run(run_id: str) -> dict | None:
    """Full bench record for run_id from docs/bench_runs.jsonl, if kept."""
    if not run_id:
        return None
    try:
        with open(_bench_runs_path()) as f:
            text = f.read()
    except OSError:
        return None
    for ln in reversed(text.splitlines()):
        if not ln.strip():
            continue
        try:
            rec = json.loads(ln)
        except ValueError:
            continue
        if isinstance(rec, dict) and rec.get("run_id") == run_id:
            return rec
    return None


def _merge_chunk_lines(text: str) -> dict | None:
    """Reconstruct a bench result from chunked-format stdout text.

    Parses every complete JSON line (a truncated first line is skipped),
    merges `bench_chunk` query dicts, and overlays the final scalar line.
    Marks the result partial when chunks are missing from the capture.
    """
    final: dict | None = None
    chunk_queries: dict[str, float] = {}
    chunks_seen: set[int] = set()
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln.startswith("{") or not ln.endswith("}"):
            continue
        try:
            rec = json.loads(ln)
        except ValueError:
            continue
        if not isinstance(rec, dict):
            continue
        if "bench_chunk" in rec and isinstance(rec.get("queries"), dict):
            chunk_queries.update(rec["queries"])
            chunks_seen.add(int(rec["bench_chunk"]))
        elif "metric" in rec or "run_id" in rec:
            final = rec
    if final is None and not chunk_queries:
        return None
    out = dict(final or {})
    run_id = out.get("run_id", "")
    full = _load_full_run(run_id)
    if full is not None and isinstance(full.get("queries"), dict):
        # The committed jsonl record is authoritative and complete.
        merged = dict(full)
        merged.update({k: v for k, v in out.items() if k not in merged})
        return merged
    out["queries"] = chunk_queries
    expected = out.get("queries_chunks")
    if not isinstance(expected, int) or len(chunks_seen) < expected:
        out["partial_tail"] = True
    return out


def _parse_bench_tail(tail: str) -> dict | None:
    """Recover the bench result from the driver's raw `tail` capture.

    New-format (r14+) captures are chunked small lines — reconstruct via
    `_merge_chunk_lines`, which also joins run_id back to the committed
    docs/bench_runs.jsonl full record. Legacy one-giant-line captures
    fall through to the balanced-brace / regex harvest below so old
    BENCH_r*.json baselines keep working.
    """
    import re

    merged = _merge_chunk_lines(tail)
    if merged is not None and merged.get("queries"):
        return merged

    queries: dict | None = None
    partial = False
    start = tail.rfind('"queries"')
    if start >= 0:
        brace = tail.find("{", start)
        if brace >= 0:
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
            if end > 0:
                try:
                    parsed = json.loads(tail[brace:end])
                    if isinstance(parsed, dict) and parsed:
                        queries = parsed
                except ValueError:
                    pass
    if queries is None:
        # FRONT-truncated capture (r8 postmortem): the tail starts
        # mid-queries-dict, so the '"queries"' key itself is gone and no
        # balanced object exists. The well-formed `"key": number` pairs
        # survive; harvest them up to the dict's closing `}, "sf"` and
        # mark the recovery partial (the first, cut-off pair never
        # matches — its opening quote is lost with the head).
        region = tail
        close = re.search(r'\}\s*,\s*"sf"\s*:', tail)
        if close:
            region = tail[: close.start()]
        pairs = re.findall(r'"([A-Za-z_][A-Za-z0-9_]*)"\s*:\s*(-?\d+(?:\.\d+)?)', region)
        scalar_fields = {"value", "sf", "n", "rc", "cpus"}
        harvested = {
            k: float(v) for k, v in pairs
            if k not in scalar_fields
            and not k.startswith(
                ("calibration_", "stream_throughput_", "build_")
            )
        }
        if len(harvested) < 8:  # too few to be a bench queries dict
            return None
        queries, partial = harvested, True
    out: dict = {"queries": queries}
    if partial:
        out["partial_tail"] = True
    for field in ("value", "sf"):
        m = re.search(r'"%s":\s*([0-9.eE+-]+)' % field, tail)
        if m:
            try:
                out[field] = float(m.group(1))
            except ValueError:
                pass
    for m in re.finditer(
        r'"((?:calibration|stream_throughput|build)_\w+)":\s*([0-9.eE+-]+)',
        tail,
    ):
        try:
            out[m.group(1)] = float(m.group(2))
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
    import re as _re

    root = os.path.dirname(os.path.abspath(__file__))
    # Only round captures count as priors: the driver also drops sibling
    # artifacts that match the loose glob (e.g. BENCH_r14_c8.json, an
    # 8-core concurrency capture) whose timings are not a valid baseline.
    priors = sorted(
        p
        for p in glob.glob(os.path.join(root, "BENCH_r*.json"))
        if _re.search(r"BENCH_r(\d+)\.json$", p)
    )
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
        if not prior.get("queries") and prior.get("run_id"):
            # r14+ compact final line: the driver parsed it whole (it is
            # small by design) but the queries live in the committed
            # docs/bench_runs.jsonl record keyed by run_id.
            full = _load_full_run(prior["run_id"])
            if full is not None and full.get("queries"):
                prior = full
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
    calibrations: dict[str, float] | None,
    prior_calibs: dict[str, float] | None,
) -> str | None:
    """Surface — never silently normalize — a large median drift no
    calibration probe corroborates. A slow box raises the median AND at
    least one probe; a code regression in a shared helper (materialize
    / fan_out / load / session conf) raises only the median, because
    the probes run no operator code. ``calibrations``/``prior_calibs``
    map probe-leg name (``calibration_*_sec``) → seconds; corroboration
    is the MAX leg ratio over legs present in BOTH captures, because
    different environmental causes move different legs (r9 bisect: a
    1.48× same-code session slowdown left the pure-compute leg FLAT —
    only scan/scheduling legs can co-move with real queries there).
    Returns the warning text; when the drift is large but NO common leg
    exists, returns a weaker warning instead of None (ADVICE r8: a
    missing calibration pair must not silently read as corroborated)."""
    if drift <= 1.0 + DRIFT_CALIBRATION_TOLERANCE:
        return None
    common = {
        k: calibrations[k] / prior_calibs[k]
        for k in (calibrations or {})
        if (prior_calibs or {}).get(k)
    }
    if not common:
        return (
            f"**UNVERIFIABLE DRIFT**: median query drift is {drift:.2f}× "
            "but the prior capture carries no calibration probe to check "
            "it against — a box slowdown and a fleet-wide shared-helper "
            "regression are indistinguishable here. The ratios below are "
            "drift-normalized anyway (the alternative mass-flags every "
            "query on a merely-slow box); treat 'no flags' as "
            "conditional and re-run against a calibrated capture."
        )
    best_leg = max(common, key=lambda k: common[k])
    if drift <= common[best_leg] * (1.0 + DRIFT_CALIBRATION_TOLERANCE):
        return None
    legs = ", ".join(
        f"{k}: {common[k]:.2f}× ({prior_calibs[k]}s → {calibrations[k]}s)"
        for k in sorted(common)
    )
    return (
        f"**UNEXPLAINED UNIFORM SLOWDOWN**: median query drift is "
        f"{drift:.2f}× but no calibration probe moved with it ({legs}). "
        "A slow box shows up in the probes too; a regression in a shared "
        "helper (materialize / fan_out / load / session conf) shows up "
        "only in the median. Treat this run as suspect: diff the "
        "shared-helper code paths before trusting the per-query "
        "'no flags' verdict below. The 'suspect (raw)' list under the "
        "table shows the rows the normalization absolved."
    )


# Per-key CAUSE of the fixed term (VERDICT r8 #8: the compare doc's
# footnotes must name each key's actual fixed cost, not repeat one
# boilerplate sentence).
FIXED_COST_CAUSE = {
    "transform_with_state": "streaming-query startup: micro-batch "
        "machinery + Python state-worker spin-up + checkpoint setup "
        "(measured 3.74s at sf0.001 where per-batch work ≈ 0). r10 "
        "isolation (VERDICT r9 #4): min-of-3 one session, sf0.001 "
        "10.98s vs sf0.1 9.50s — the 100× input is NOT slower, so the "
        "r8→r9 variable-term growth was startup jitter (first-run "
        "spread 66s→11s at sf0.001), not data-dependent cost",
    "stream_replay": "TWO streaming-query startups by construction "
        "(initial run, then seek-to-offset replay); measured 3.59s at "
        "sf0.001",
    "ann_ivf_kmeans": "residual post-cache constant: the r9 session "
        "quantizer cache builds the k-means|| seeding once per "
        "(session, sf); min-of-N sees only cached reload + bounded "
        "probe jobs (0.52-0.66s measured)",
    "semdedup": "residual post-cache constant (shared quantizer cache "
        "with ann_ivf_kmeans since r9); intra-cell pair work is the "
        "variable part",
    "ann_ivf_hier": "residual post-cache constant of the two-level "
        "build (0.78s at sf0.001 vs 1.07s at sf0.1, cached)",
    "rerank_topk": "residual post-cache constant (fused candidate "
        "set shared with hybrid_retrieve since r10); the pair-scoring "
        "joins are the variable part",
    "bpe_pack": "residual post-cache constant (shared tokenizer "
        "artifact since r10); per-row packing is the variable part",
    "curriculum_order": "residual post-cache constant (shared "
        "bigram-LM + staging artifacts since r10); the within-stage "
        "shuffle position is the variable part",
    "bpe_apply": "residual post-cache constant (shared tokenizer "
        "artifact since r10); the vocab join is the variable part",
    "bpe_train": "iterative BPE vocabulary-training rounds: one small "
        "job per merge round",
    "kmeans_parallel_init": "k-means|| oversampling init rounds: fixed "
        "chain of small jobs",
    "image_dedup_clusters": "adaptive-selector probe (2 min-label "
        "rounds) + star-contraction rounds + 2-hop exact finish: "
        "a fixed count of eager window/checkpoint jobs regardless of "
        "SF; at sf0.001 the selector stays on min-label entirely "
        "(2.28s min-of-3, cheaper than r10's star-only 4.43s). r12: "
        "the probe's partial labels now CONTRACT the graph star sees "
        "(VERDICT r11 #1) — sf0.1 min-of-3 3.85s seeded vs 4.15s "
        "discard-and-restart, same session",
    "mmr_diversify": "K-1 greedy steps, each an eager materialize + "
        "window stage over the bounded candidate pool; corpus scan "
        "runs once",
    "ann_index_persist": "r12 DELIBERATE: the probe search moved from "
        "a JVM broadcast join scoring every (query, member) pair to "
        "the per-cell cogroup kernel (_ivf_probe_search) — at 64x the "
        "old shape measured 44.6s (ann_ivf) vs 8.0s new; at sf0.1 the "
        "two Arrow stages cost ~0.9s over the r11 figure on this "
        "fixed-cost-dominated serve-from-disk key. The persisted index "
        "is now BUCKETED on the cogroup keys (cid, _f), so the corpus "
        "side reads with no exchange — the production IVF layout",
    "jdbc_snapshot_union": "Derby embedded-DB spin-up + CDC streaming-"
        "query startup over FIXTURE data (3 seed rows + bounded spool) "
        "— the key has no input-scale term by construction: r11 "
        "fresh-session min-of-3, sf0.001 1.32s vs sf0.1 1.25s. The r11 "
        "interleaved capture (2.1-2.7s) was startup jitter on this "
        "constant, the same class the kneser_ney r10 flag resolved to",
}


# Manual, evidence-cited adjudication of a drift warning, keyed to the
# EXACT prior capture it explains (a new prior capture invalidates the
# entry automatically). An entry downgrades the banner from UNEXPLAINED
# to EXPLAINED and keeps the machine-readable output clean — it must
# cite measured evidence, never a theory.
DRIFT_EXPLANATIONS = {
    "BENCH_r08.json": (
        "r9 bisect (VERDICT r8 #1): the EXACT r7-capture code (commit "
        "5a74fde, predating every round-8 change) re-run on this box "
        "measured 119.8s total vs its original 80.9s capture — median "
        "1.25× vs the r8 capture — while its pure-compute probe ran "
        "FLAT (0.166s vs 0.179s). Same code, same probe shape, slower "
        "queries: the drift is environmental (I/O + task-scheduling "
        "contention the range-sum leg is blind to), not a round-8/9 "
        "code regression. Evidence: docs/bench_rebaseline_r7code.json. "
        "The scan_agg + jobs calibration legs added this round make "
        "future environmental drifts self-corroborating."
    ),
}


def _stream_throughput_section(
    prior: dict, stream_metrics: dict, drift: float
) -> tuple[list[str], bool]:
    """BENCH_COMPARE section + flag for the sustained-throughput leg
    (VERDICT r9 #2). Gated on ``stream_throughput_busy_sec`` — total
    busy seconds delivering the fixed sf workload, drift-normalized
    like every other timing, with the decomposed-key 1.0s noise floor
    (micro-batch scheduling jitter). rows/sec and the batch latency
    distribution (p50/p95/p99 — the reference's continuous-delivery
    contract is about WORST-CASE staleness, VERDICT r10 #4) ride along
    as the deployment-sizing figures, compared round-over-round when
    the prior capture carries them."""
    now_busy = stream_metrics.get("stream_throughput_busy_sec")
    if now_busy is None:
        return [], False
    lines = [
        "Streaming throughput (CDC pipeline under processing-time "
        "trigger, full events table):",
        "",
        f"- rows: {stream_metrics.get('stream_throughput_rows')} · "
        f"rows/sec (busy): "
        f"{stream_metrics.get('stream_throughput_rows_per_sec')} · "
        f"batch p50/p95/p99: "
        f"{stream_metrics.get('stream_throughput_batch_p50_sec')}s / "
        f"{stream_metrics.get('stream_throughput_batch_p95_sec')}s / "
        f"{stream_metrics.get('stream_throughput_batch_p99_sec')}s · "
        f"busy total: {now_busy}s",
    ]
    was_busy = prior.get("stream_throughput_busy_sec")
    if was_busy is None:
        lines += ["- no prior capture carries the leg yet — baseline round.", ""]
        return lines, False
    now_v = now_busy / drift
    ratio = now_v / was_busy if was_busy > 0 else float("inf")
    flagged = (
        ratio > REGRESSION_FACTOR
        and now_v - was_busy > MIN_ABS_REGRESSION_DECOMPOSED
    )
    verdict = "**REGRESSED**" if flagged else "ok"
    lines += [
        f"- vs prior: busy {was_busy}s → {now_busy}s "
        f"(drift-normalized ratio {ratio:.2f}×, floor "
        f"{MIN_ABS_REGRESSION_DECOMPOSED}s) — {verdict}",
    ]
    was_rate = prior.get("stream_throughput_rows_per_sec")
    now_rate = stream_metrics.get("stream_throughput_rows_per_sec")
    if was_rate and now_rate:
        lines.append(
            f"- rows/sec: {was_rate} → {now_rate} "
            f"({now_rate / was_rate:.2f}× — informational; the gate is "
            "busy seconds, which drift-normalizes)"
        )
    # p95 batch latency is GATED too (VERDICT r11 #5): the reference's
    # continuous-delivery contract (dataFreshness: 0s) is about
    # worst-case staleness a sink consumer observes, and total busy
    # seconds can stay flat while the tail stretches (fewer, slower
    # batches). Drift-normalized like busy, with the plain-batch 0.5s
    # noise floor — a single micro-batch's scheduling jitter.
    was_p95 = prior.get("stream_throughput_batch_p95_sec")
    now_p95 = stream_metrics.get("stream_throughput_batch_p95_sec")
    if was_p95 and now_p95:
        p95_v = now_p95 / drift
        p95_ratio = p95_v / was_p95 if was_p95 > 0 else float("inf")
        p95_flag = (
            p95_ratio > REGRESSION_FACTOR
            and p95_v - was_p95 > MIN_ABS_REGRESSION
        )
        flagged = flagged or p95_flag
        lines.append(
            f"- batch p95 vs prior: {was_p95}s → {now_p95}s "
            f"(drift-normalized ratio {p95_ratio:.2f}×, floor "
            f"{MIN_ABS_REGRESSION}s) — "
            f"{'**REGRESSED**' if p95_flag else 'ok'}"
        )
    tail_pairs = []
    for q in ("p50", "p99"):
        was_q = prior.get(f"stream_throughput_batch_{q}_sec")
        now_q = stream_metrics.get(f"stream_throughput_batch_{q}_sec")
        if was_q and now_q:
            tail_pairs.append(f"{q} {was_q}s → {now_q}s")
    if tail_pairs:
        lines.append("- batch latency vs prior: " + " · ".join(tail_pairs))
    lines.append("")
    return lines, flagged


# Artifact BUILD-cost legs (VERDICT r10 #2): the r10 session-cache work
# made the registered keys warm-path scans of artifacts built once per
# (session, sf) — the right 100 TB design, but it left the artifact
# BUILD time ungated: a build regression was invisible behind warm
# numbers. Each leg below evicts EXACTLY its own artifact (dependencies
# stay warm, so image_phash_pairs times the band join, not a second
# decode pass) and times the cold rebuild, min-of-3 evict-then-build.
# The builders are eager (materialize() inside session_artifact's build
# lambda), so the call duration IS the build cost.
ARTIFACT_BUILD_LEGS = (
    # (artifact cache key, module, build-trigger attribute)
    ("minhash_lsh_pairs", "pubsub2bq_spark.operators.llm_dedup", "minhash_lsh"),
    ("simhash_bits", "pubsub2bq_spark.operators.llm_dedup", "_sh_bits"),
    ("doc_nll", "pubsub2bq_spark.operators.llm_quality", "_doc_nll"),
    ("staged_nll", "pubsub2bq_spark.operators.llm_quality", "_staged_nll"),
    (
        "semdedup_quantizer",
        "pubsub2bq_spark.operators.llm_quality",
        "_quantizer_build",
    ),
    ("image_phash_table", "pubsub2bq_spark.operators.multimodal", "_phash_table"),
    (
        "image_phash_pairs",
        "pubsub2bq_spark.operators.multimodal",
        "image_phash_pairs",
    ),
    ("hybrid_fused", "pubsub2bq_spark.operators.retrieval", "_fused_candidates"),
    (
        "bpe_vocab_pieces",
        "pubsub2bq_spark.operators.training_prep",
        "cached_vocab_pieces",
    ),
)


def _artifact_build_legs(spark, sf_dir: str) -> dict[str, float]:
    """Cold build cost per shared session artifact, min-of-3 (each
    measurement evicts the artifact first). Published as
    ``build_<name>_sec`` fields and gated in BENCH_COMPARE. A failing
    leg never sinks the bench run but is named on stderr (the missing
    row weakens the gate, so silence is not an option)."""
    import importlib

    from pubsub2bq_spark.tables import drop_session_artifact

    out: dict[str, float] = {}
    for name, module, attr in ARTIFACT_BUILD_LEGS:
        try:
            fn = getattr(importlib.import_module(module), attr)
            times = []
            for _ in range(3):
                drop_session_artifact(spark, name, sf_dir)
                t0 = time.perf_counter()
                fn(spark, sf_dir)
                times.append(time.perf_counter() - t0)
            out[f"build_{name}_sec"] = round(min(times), 3)
        except Exception as ex:
            print(
                f"bench: build leg {name} FAILED ({ex!r}) — "
                "absent from this capture",
                file=sys.stderr,
            )
    return out


def _build_cost_section(
    prior: dict, build_metrics: dict, drift: float
) -> tuple[list[str], list[str]]:
    """BENCH_COMPARE section + flags for the artifact build legs.
    Same discipline as the per-query gate: drift-normalized ratio vs
    the prior capture, decomposed-key noise floor (builds are many-job
    materialize chains — they jitter like the seeding chains do)."""
    if not build_metrics:
        return [], []
    lines = [
        "Artifact build cost (cold, min-of-3 evict-then-rebuild; the "
        "registered keys serve these artifacts warm, so THIS is where "
        "a build regression shows):",
        "",
        "| artifact | prior (s) | now (s) | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    flagged = []
    for field in sorted(build_metrics):
        name = field[len("build_"):-len("_sec")]
        now = build_metrics[field]
        was = prior.get(field)
        if not was:
            lines.append(f"| {name} | — | {now} | — | new |")
            continue
        now_v = now / drift
        ratio = now_v / was if was > 0 else float("inf")
        flag = (
            "**REGRESSED**"
            if ratio > REGRESSION_FACTOR
            and now_v - was > MIN_ABS_REGRESSION_DECOMPOSED
            else ""
        )
        if flag:
            flagged.append(f"build:{name}")
        lines.append(f"| {name} | {was} | {now} | {ratio:.2f}× | {flag} |")
    lines.append("")
    return lines, flagged


def compare_to_prior_rounds(
    timings: dict[str, float],
    total: float,
    remeasured: dict[str, float],
    drift: float | None = None,
    calibrations: dict[str, float] | None = None,
    stream_metrics: dict | None = None,
    build_metrics: dict | None = None,
) -> str | None:
    """Regression gate: compare this run against the latest BENCH_r*.json
    and write docs/BENCH_COMPARE.md flagging per-query slowdowns beyond
    REGRESSION_FACTOR — so 'which queries regressed since round N' is a
    mechanical read, not a diff session. ``remeasured`` holds the
    isolated min-of-3 for queries the interleaved rounds flagged, so
    noise spikes can't masquerade as (or hide) a real regression.
    Report only; stdout stays the driver's single JSON line. Returns
    the drift warning (if any) so the caller can mark the run suspect
    in its machine-readable output."""
    loaded = load_prior()
    if loaded is None:
        return None
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
    prior_calibs = {
        k: v for k, v in prior.items()
        if k.startswith("calibration_") and isinstance(v, (int, float)) and v
    }
    drift_warning = _drift_warning(drift, calibrations, prior_calibs)
    drift_explained = None
    if drift_warning and prior_name in DRIFT_EXPLANATIONS:
        drift_explained = (
            f"**DRIFT EXPLAINED (measured)** — the {drift:.2f}× drift vs "
            f"this capture is adjudicated by evidence, not theory: "
            + DRIFT_EXPLANATIONS[prior_name]
        )
        drift_warning = None
    lines = [
        "# Bench comparison (generated by bench.py — do not edit)",
        "",
        f"Current run vs `{prior_path}`"
        + (
            " (PARTIALLY recovered from a front-truncated tail capture — "
            "per-query timings harvested by regex, scalar totals may be "
            "missing)"
            if prior.get("partial_tail")
            else ""
        )
        + f" (total {prior.get('value', '?')}s → {total}s; session drift "
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
    if drift_explained:
        lines += [drift_explained, ""]
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
    stream_lines, stream_flag = _stream_throughput_section(
        prior, stream_metrics or {}, drift
    )
    if stream_flag:
        flagged.append("stream_throughput(busy/p95)")
    build_lines, build_flags = _build_cost_section(
        prior, build_metrics or {}, drift
    )
    flagged += build_flags
    lines += ["", f"Flagged: {', '.join(flagged) if flagged else 'none'}", ""]
    lines += stream_lines
    lines += build_lines
    if drift_warning:
        # ADVICE r8: an uncorroborated uniform slowdown must not read as
        # a clean verdict. Name the rows the normalization absolved so a
        # reader (or the next round's bisect) starts from the worst raw
        # offenders instead of from "no flags".
        suspects = sorted(
            (
                (now / prior_q[k], k)
                for k, now in timings.items()
                if prior_q.get(k, 0.0) > 0.1
            ),
            reverse=True,
        )[:10]
        lines += [
            "Suspect (raw, un-normalized) — worst now/prior ratios the "
            "drift normalization absolved; bisect from here if the "
            "slowdown turns out to be code:",
            "",
        ] + [f"- `{k}`: {r:.2f}× raw" for r, k in suspects] + [""]
    if any(k in timings for k in FIXED_COST):
        lines += [
            "Fixed-cost decomposition (ratios above compare the "
            "variable component; each key's fixed term and its cause):",
            "",
        ] + [
            f"- `{k}`: ~{v}s fixed — "
            + FIXED_COST_CAUSE.get(
                k, "per-op constant measured flat across sf0.001→sf0.1"
            )
            + "; the remainder is work that scales with data."
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
        warn = " + DRIFT WARNING" if drift_warning else ""
        print(f"bench-compare: {len(flagged)} regression(s){warn} vs "
              f"{os.path.basename(prior_path)} -> {out}", file=sys.stderr)
    except OSError:
        pass
    return drift_warning


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

    # Environment calibration: THREE fixed probes whose round-over-round
    # drift is machine/environment speed, not code — they run no operator
    # code, so they let a reader split "the operators regressed" from
    # "the box was slower" when comparing BENCH_r{N} files. Three legs
    # because different environmental causes move different resources
    # (r9 bisect: re-running the exact r7-capture code on the r8/r9 box
    # reproduced the 1.48× query slowdown while the pure-compute leg was
    # FLAT — the contention was in I/O + task scheduling, which the
    # range-sum leg is blind to):
    #   * range_sum  — whole-stage-codegen compute, no I/O, no shuffle;
    #   * scan_agg   — parquet scan + decode + small shuffle over a FIXED
    #     path (sf0.01 lineitem, independent of SPARK_GRAFT_SF_DIR so the
    #     number is comparable across rounds);
    #   * jobs       — 30 trivial actions: per-job scheduler/py4j
    #     round-trip latency, the term that dominates multi-stage
    #     queries under CPU contention.
    # Measured BEFORE the compare so the report can cross-check the
    # timing-derived median drift against the MAX leg ratio.
    def _calibrate_compute() -> float:
        t0 = time.perf_counter()
        spark.range(0, 2_000_000_000, 1, 32).agg({"id": "sum"}).collect()
        return time.perf_counter() - t0

    _CALIB_SCAN_PATH = "/root/testdata/sf0.01/lineitem.parquet"

    def _calibrate_scan() -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(_CALIB_SCAN_PATH)
            .groupBy("l_returnflag", "l_linestatus")
            .agg({"l_extendedprice": "sum", "l_quantity": "avg", "*": "count"})
            .collect()
        )
        return time.perf_counter() - t0

    def _calibrate_jobs() -> float:
        t0 = time.perf_counter()
        for _ in range(30):
            spark.range(2).count()
        return time.perf_counter() - t0

    calibrations: dict[str, float] = {}
    for name, fn in (
        ("calibration_range_sum_sec", _calibrate_compute),
        ("calibration_scan_agg_sec", _calibrate_scan),
        ("calibration_jobs_sec", _calibrate_jobs),
    ):
        try:
            fn()  # warm
            calibrations[name] = round(min(fn() for _ in range(3)), 3)
        except Exception as ex:  # a probe must never sink the bench run —
            # but a silently missing leg weakens the multi-leg drift
            # corroboration (ADVICE r9): name the casualty.
            print(
                f"bench: calibration leg {name} FAILED ({ex!r}) — "
                "absent from this capture",
                file=sys.stderr,
            )

    # Sustained streaming throughput (VERDICT r9 #2): the CDC pipeline
    # under its production processing-time trigger over the full spooled
    # events table. One warm-up run (stream-startup JIT), then BEST of
    # three measured runs by busy seconds (r12: this was the one
    # single-shot leg in the bench — a lone noisy sample flagged busy
    # 2.16x while fresh-session min-of-3 measured 1.0x; every gated
    # figure must come from the same min-of-N discipline as the query
    # legs). Failure never sinks the bench but is named.
    stream_metrics: dict = {}
    try:
        from pubsub2bq_spark.streaming.throughput import (
            measure_stream_throughput,
        )

        measure_stream_throughput(spark, sf_dir)  # warm
        runs = [measure_stream_throughput(spark, sf_dir) for _ in range(3)]
        m = min(runs, key=lambda r: r["busy_sec"])
        # Each gated metric takes its OWN min across the three runs
        # (ADVICE r12): the busy-optimal run can carry a
        # non-representative p95 tail from scheduling noise, so gating
        # the percentiles off that single run would flag (or miss) on
        # noise rather than regressions — the same per-metric min-of-N
        # discipline every query leg follows.
        stream_metrics = {
            "stream_throughput_rows": m["rows"],
            "stream_throughput_busy_sec": m["busy_sec"],
            "stream_throughput_rows_per_sec": m["rows_per_sec"],
            "stream_throughput_batch_p50_sec": min(
                r["batch_p50_sec"] for r in runs
            ),
            "stream_throughput_batch_p95_sec": min(
                r["batch_p95_sec"] for r in runs
            ),
            "stream_throughput_batch_p99_sec": min(
                r["batch_p99_sec"] for r in runs
            ),
        }
    except Exception as ex:
        print(
            f"bench: stream_throughput leg FAILED ({ex!r}) — "
            "figures absent from this capture",
            file=sys.stderr,
        )

    # Artifact build-cost legs run LAST: every headline query must see
    # the warm artifacts (the registered keys' steady-state), and the
    # evict-rebuild cycles must not perturb the timed rounds.
    build_metrics = _artifact_build_legs(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    drift_warning = compare_to_prior_rounds(
        timings, total, remeasured, drift, calibrations, stream_metrics,
        build_metrics,
    )

    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "run_id": f"{int(time.time())}.{os.getpid()}",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        **calibrations,
        **stream_metrics,
        **build_metrics,
    }
    if drift_warning:
        # ADVICE r8: a run whose uniform slowdown no probe corroborates
        # must not be machine-readable as clean.
        result["drift_unexplained"] = True
    # Lossless record + bounded stdout lines (judge r13 task #1): the
    # complete result goes to docs/bench_runs.jsonl; stdout carries
    # chunked query lines with the compact scalar-totals line LAST so
    # the driver's ~2 KB tail capture always ends on parseable JSON.
    _record_full_run(result)
    for line in _emit_lines(result):
        print(line)
    spark.stop()


if __name__ == "__main__":
    main()
