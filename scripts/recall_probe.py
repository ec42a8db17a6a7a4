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
        RECALL_END,
    ]
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
        update_scaling_md(args.out, stats, args.sf, args.scale)
        print(json.dumps({"base_sf": args.sf, "scale": args.scale, **stats}))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
