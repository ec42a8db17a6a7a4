"""Measured recall of the cell-probed semantic ops vs brute-force truth
(VERDICT r8 #5): `ann_recall` set the pattern for the ANN indexes; this
probe extends it to the SemDeDup-family candidate generation, at a 4x
synthetic scale-up so the bound is measured where the cell structure is
denser than base, not just at test SF.

Semantics measured (all against an ALL-PAIRS exact truth):

* semdedup          — recall of the TRUE dropped set {j : exists i<j,
                      cos(i,j) > tau} using in-cell candidates only
                      (the documented SemDeDup blind-spot baseline);
* global_semdedup   — same truth, in-cell + GSEM_NBR neighbor-cell
                      candidates (the recall/cost knob under test);
* semantic_decontaminate — recall of the TRUE contaminated-train set
                      {t in train : exists e in eval, cos(t,e) > tau}
                      via the directed cell-pair probe.

The scale-up replicates embeddings by vec_id offset with vectors
UNCHANGED (the scaling probe's convention): per-replica geometry is
identical, cross-replica exact duplicates add in-cell mass, and the
cell count k = ceil(sqrt(4n)) doubles — so the measurement exercises
the quantizer exactly as a 4x corpus would.

Writes/updates a marker-delimited section in docs/SCALING.md (the
scaling probe preserves it when regenerating) and prints one JSON line.
tests/test_recall_bounds.py asserts the stated bounds at base-SF 4x.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

RECALL_BEGIN = "<!-- recall-probe:begin -->"
RECALL_END = "<!-- recall-probe:end -->"


def build_scaled_embeddings(spark, base_sf: str, scale: int, workdir: str) -> str:
    """Replicate embeddings by vec_id offset, vectors unchanged."""
    from pubsub2bq_spark.tables import load

    base = load(spark, base_sf, "embeddings")
    width = base.agg(F.max("vec_id")).first()[0] + 1
    reps = [
        base.withColumn("vec_id", F.col("vec_id") + F.lit(int(i * width)))
        for i in range(scale)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    sf_dir = os.path.join(workdir, f"x{scale}")
    os.makedirs(sf_dir, exist_ok=True)
    out.write.mode("overwrite").parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def measure_recalls(spark, sf_dir: str) -> dict[str, float | int]:
    """Brute-force truth + per-op recall over one embeddings dir."""
    from pubsub2bq_spark.operators.llm_quality import (
        DECON_EVAL_DENOM,
        SEMDEDUP_TAU,
        global_semdedup,
        semantic_decontaminate,
        semdedup,
    )
    from pubsub2bq_spark.operators.llm_similarity import _cosine, _dvec
    from pubsub2bq_spark.operators.ml_ops import _kpp_u16
    from pubsub2bq_spark.tables import load, materialize

    v = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", _dvec("embedding").alias("v"))
        .transform(materialize)
    )
    a = v.select(F.col("vec_id").alias("ida"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("idb"), F.col("v").alias("vb"))
    # All-pairs EXACT truth — the probe's whole point is to pay the
    # quadratic once, offline, to certify the subquadratic candidates.
    pairs = (
        a.join(b, F.col("ida") < F.col("idb"))
        .filter(_cosine(F.col("va"), F.col("vb")) > SEMDEDUP_TAU)
        .select("ida", "idb")
        .transform(materialize)
    )
    truth_dropped = pairs.select(F.col("idb").alias("vec_id")).distinct()

    got_sd = semdedup(spark, sf_dir).select("vec_id").distinct()
    got_gsd = global_semdedup(spark, sf_dir).select("vec_id").distinct()

    n_truth = truth_dropped.count()
    r_sd = got_sd.join(truth_dropped, "vec_id").count() / n_truth
    r_gsd = got_gsd.join(truth_dropped, "vec_id").count() / n_truth

    # Directed decontamination truth: train vector with ANY eval hit.
    isev = (
        _kpp_u16(F.concat(F.col("vec_id").cast("string"), F.lit(":dec")))
        * F.lit(DECON_EVAL_DENOM)
        < F.lit(65536)
    )
    sp = v.withColumn("isev", isev)
    tr = sp.filter(~F.col("isev")).select(
        F.col("vec_id").alias("tid"), F.col("v").alias("tv")
    )
    ev = sp.filter(F.col("isev")).select(F.col("v").alias("ev"))
    truth_flagged = (
        tr.crossJoin(ev)
        .filter(_cosine(F.col("tv"), F.col("ev")) > SEMDEDUP_TAU)
        .select(F.col("tid").alias("vec_id"))
        .distinct()
    )
    n_truth_dec = truth_flagged.count()
    got_dec = semantic_decontaminate(spark, sf_dir).select("vec_id").distinct()
    r_dec = got_dec.join(truth_flagged, "vec_id").count() / n_truth_dec

    return {
        "n_vectors": v.count(),
        "n_true_dropped": n_truth,
        "recall_semdedup": round(r_sd, 4),
        "recall_global_semdedup": round(r_gsd, 4),
        "n_true_contaminated": n_truth_dec,
        "recall_semantic_decontaminate": round(r_dec, 4),
    }


def update_scaling_md(path: str, stats: dict, base_sf: str, scale: int) -> None:
    from pubsub2bq_spark.operators.llm_quality import GSEM_NBR, SEMDEDUP_TAU

    section = [
        RECALL_BEGIN,
        "",
        "## Measured recall vs brute-force truth (recall_probe.py)",
        "",
        f"Base {base_sf} embeddings replicated {scale}x by vec_id offset "
        f"(vectors unchanged; k = ceil(sqrt({stats['n_vectors']})) cells), "
        f"tau = {SEMDEDUP_TAU}, exact all-pairs truth "
        f"({stats['n_true_dropped']} true duplicates, "
        f"{stats['n_true_contaminated']} true contaminated train vectors):",
        "",
        "| op | candidate scope | recall |",
        "|---|---|---|",
        f"| semdedup | own cell only (documented blind spot) | "
        f"{stats['recall_semdedup']} |",
        f"| global_semdedup | + {GSEM_NBR} neighbor cells | "
        f"{stats['recall_global_semdedup']} |",
        f"| semantic_decontaminate | directed cell pairs, both orientations | "
        f"{stats['recall_semantic_decontaminate']} |",
        "",
        "GSEM_NBR is the recall/cost knob (IVF nprobe analog): each extra "
        "neighbor cell adds ≤ in-cell-work pair volume and recovers more "
        "cross-cell pairs. tests/test_recall_bounds.py pins the bounds at "
        "base-SF 4x so a quantizer regression that silently sheds recall "
        "fails a test instead of shipping.",
        "",
    ]
    if "mmr_objective_vs_exhaustive_min" in stats:
        section += [
            "MMR quality (r10): greedy mmr_diversify vs the exhaustive "
            f"C(16,5)-subset optimum of the MMR set objective over "
            f"{stats['n_mmr_queries']} queries — objective ratio min "
            f"{stats['mmr_objective_vs_exhaustive_min']} / mean "
            f"{stats['mmr_objective_vs_exhaustive_mean']}, relevance "
            f"retention vs plain top-K "
            f"{stats['mmr_relevance_retention_mean']}, max-redundancy "
            f"delta {stats['mmr_max_redundancy_delta_mean']} (≤0 = never "
            "more redundant than top-K). Bounds pinned in "
            "tests/test_recall_bounds.py.",
            "",
        ]
    section.append(RECALL_END)
    text = ""
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    if RECALL_BEGIN in text and RECALL_END in text:
        head = text[: text.index(RECALL_BEGIN)]
        tail = text[text.index(RECALL_END) + len(RECALL_END):]
        text = head + "\n".join(section) + tail
    else:
        text = text.rstrip("\n") + "\n\n" + "\n".join(section) + "\n"
    with open(path, "w") as f:
        f.write(text)




def measure_mmr_quality(spark, sf_dir: str) -> dict[str, float | int]:
    """Greedy-MMR quality vs the exhaustive subset optimum (VERDICT r9
    #7): how much of the diversity/relevance objective does the greedy
    sequential pick (the production operator) actually capture?

    Truth: for each query, enumerate ALL C(MMR_POOL, MMR_K) candidate
    subsets (4368 at 16-choose-5 — the probe pays the combinatorial cost
    once, offline) and maximize the order-insensitive MMR set objective
        F(S) = LAMBDA * sum_{d in S} cos(q,d)
             - MU * sum_{d in S} max_{s in S, s != d} cos(d,s),
    the standard set restatement of Carbonell & Goldstein's sequential
    rule (each pick's redundancy charged against its nearest selected
    neighbor). Also reports the trade the operator makes vs plain
    relevance top-K: retained relevance mass and redundancy reduction.

    Driver-side arrays here are bounded by construction: n_queries x
    MMR_POOL pool rows and n_queries x MMR_K picks — probe-scale only,
    never corpus-sized."""
    import itertools

    import numpy as np

    from pubsub2bq_spark.operators.llm_similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_MU,
        MMR_POOL,
        mmr_diversify,
    )
    from pubsub2bq_spark.tables import load

    emb_rows = (
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    )
    vecs = {int(r.vec_id) for r in emb_rows}
    V = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb_rows}
    unit = {k: v / np.linalg.norm(v) for k, v in V.items()}

    picks: dict[int, list[int]] = {}
    for r in mmr_diversify(spark, sf_dir).collect():
        picks.setdefault(int(r.query_id), []).append((int(r.rank), int(r.vec_id)))
    assert set(picks) == {v for v in vecs if v % 100 == 0}

    def fset(q, S):
        rel = sum(float(unit[q] @ unit[d]) for d in S)
        red = sum(
            max(float(unit[d] @ unit[s]) for s in S if s != d) for d in S
        )
        return MMR_LAMBDA * rel - MMR_MU * red

    ratios, rel_ratios, red_ratios, beats_topk = [], [], [], 0
    for q, ranked in picks.items():
        greedy = [d for _, d in sorted(ranked)]
        # pool: top-MMR_POOL by cos(q, .) excluding q, ties by vec_id asc
        # (cand's exact definition).
        others = sorted(
            (d for d in vecs if d != q),
            key=lambda d: (-float(unit[q] @ unit[d]), d),
        )
        pool = others[:MMR_POOL]
        assert set(greedy) <= set(pool)
        best = max(
            fset(q, list(S)) for S in itertools.combinations(pool, MMR_K)
        )
        topk = pool[:MMR_K]
        g, t = fset(q, greedy), fset(q, topk)
        ratios.append(g / best if best > 0 else 1.0)
        rel_g = sum(float(unit[q] @ unit[d]) for d in greedy)
        rel_t = sum(float(unit[q] @ unit[d]) for d in topk)
        rel_ratios.append(rel_g / rel_t if rel_t > 0 else 1.0)
        red_g = max(
            float(unit[a] @ unit[b]) for a, b in itertools.combinations(greedy, 2)
        )
        red_t = max(
            float(unit[a] @ unit[b]) for a, b in itertools.combinations(topk, 2)
        )
        red_ratios.append(red_g - red_t)
        if g >= t - 1e-12:
            beats_topk += 1

    return {
        "n_mmr_queries": len(picks),
        "mmr_objective_vs_exhaustive_min": round(float(np.min(ratios)), 4),
        "mmr_objective_vs_exhaustive_mean": round(float(np.mean(ratios)), 4),
        "mmr_relevance_retention_mean": round(float(np.mean(rel_ratios)), 4),
        "mmr_max_redundancy_delta_mean": round(float(np.mean(red_ratios)), 4),
        "mmr_objective_geq_topk_frac": round(beats_topk / len(picks), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "SCALING.md"))
    args = ap.parse_args()

    from pubsub2bq_spark.session import get_spark

    spark = get_spark("recall-probe")
    workdir = tempfile.mkdtemp(prefix="recall_probe_")
    try:
        sf_dir = build_scaled_embeddings(spark, args.sf, args.scale, workdir)
        stats = measure_recalls(spark, sf_dir)
        stats.update(measure_mmr_quality(spark, sf_dir))
        update_scaling_md(args.out, stats, args.sf, args.scale)
        print(json.dumps({"base_sf": args.sf, "scale": args.scale, **stats}))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
