"""Behavior tests for the cross-corpus composition operators
(VERDICT r7 #6): global_semdedup must actually recover cross-cell
duplicate pairs semdedup cannot see, decontaminate must flag only
train-split documents, and mixture_curriculum's cells must reconcile
with both of its parents (curriculum_order stages and
mixture_temperature sampling). Oracle parity is covered by
test_oracle_parity's parametrization."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub2bq_spark.operators.llm_corpus import _split_col
from pubsub2bq_spark.operators.llm_quality import (
    CURR_STAGES,
    SEMDEDUP_TAU,
)
from pubsub2bq_spark.registry import all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def test_global_semdedup_supersets_semdedup(spark):
    g = QUERIES["global_semdedup"].spark(spark, SF_SMOKE)
    s = QUERIES["semdedup"].spark(spark, SF_SMOKE)
    g_vecs = {r["vec_id"] for r in g.select("vec_id").collect()}
    s_vecs = {r["vec_id"] for r in s.select("vec_id").collect()}
    # more candidate pairs can only ADD dup vectors, never remove one
    assert s_vecs <= g_vecs
    # the whole point: the neighbor probe finds dups the cell-local
    # prune is blind to (the synthetic corpus plants near-dup clusters
    # that straddle quantizer cells at this scale)
    assert len(g_vecs) > len(s_vecs)


def test_global_semdedup_pair_invariants(spark):
    g = QUERIES["global_semdedup"].spark(spark, SF_SMOKE)
    agg = g.agg(
        F.sum((F.col("dup_of") >= F.col("vec_id")).cast("int")).alias("bad_ord"),
        F.sum((F.col("cosine") <= SEMDEDUP_TAU).cast("int")).alias("bad_cos"),
        F.sum((~F.col("cross_cell").isin(0, 1)).cast("int")).alias("bad_flag"),
        F.sum("cross_cell").alias("n_cross"),
        F.count_distinct("vec_id").alias("n_distinct"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["bad_ord"] == 0       # canonical is always the lower id
    assert agg["bad_cos"] == 0       # every reported pair clears tau
    assert agg["bad_flag"] == 0
    assert agg["n_cross"] > 0        # cross-cell recoveries exist
    assert agg["n_distinct"] == agg["n"]  # one row per dropped vector


def test_decontaminate_flags_only_train_docs(spark):
    out = QUERIES["decontaminate"].spark(spark, SF_SMOKE)
    joined = out.withColumn("split", _split_col())
    agg = joined.agg(
        F.sum((F.col("split") != "train").cast("int")).alias("non_train"),
        F.sum((F.col("n_hits") < F.col("n_contam_grams")).cast("int")).alias(
            "hits_lt_grams"
        ),
        F.sum((F.col("n_contam_grams") < 1).cast("int")).alias("empty"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["non_train"] == 0     # val/test docs are never flagged
    assert agg["hits_lt_grams"] == 0  # total hits bound distinct grams
    assert agg["empty"] == 0
    # the corpus plants near-duplicates across the hash split, so the
    # token-gram pass must find real contamination
    assert agg["n"] > 0


def test_mixture_curriculum_reconciles_with_parents(spark):
    mc = QUERIES["mixture_curriculum"].spark(spark, SF_SMOKE).cache()
    agg = mc.agg(
        F.sum(
            (~F.col("stage").between(1, CURR_STAGES)).cast("int")
        ).alias("bad_stage"),
        F.sum((F.col("n_sampled") > F.col("n_docs")).cast("int")).alias("over"),
        F.sum("n_docs").alias("total_docs"),
    ).collect()[0]
    assert agg["bad_stage"] == 0
    assert agg["over"] == 0
    # every staged doc lands in exactly one cell
    n_staged = QUERIES["curriculum_order"].spark(spark, SF_SMOKE).count()
    assert agg["total_docs"] == n_staged
    # per-source keep rates and sampled counts reconcile with
    # mixture_temperature (whose counts also cover unstaged docs,
    # hence <=)
    mt = {
        r["source"]: r
        for r in QUERIES["mixture_temperature"].spark(spark, SF_SMOKE).collect()
    }
    for r in (
        mc.groupBy("source")
        .agg(
            F.sum("n_sampled").alias("sampled"),
            F.max("keep_rate").alias("rate"),
            F.min("keep_rate").alias("rate_min"),
        )
        .collect()
    ):
        assert r["rate"] == r["rate_min"] == mt[r["source"]]["keep_rate"]
        assert r["sampled"] <= mt[r["source"]]["n_sampled"]
    mc.unpersist()


def test_substring_repeats_coverage_invariants(spark):
    from pubsub2bq_spark.operators.llm_corpus import SUB_K
    from pubsub2bq_spark.tables import load

    out = QUERIES["substring_repeats"].spark(spark, SF_SMOKE)
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length("text").alias("tlen")
    )
    j = out.join(docs, "doc_id")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("repeat_chars") > F.col("tlen")).cast("int")).alias("over"),
        F.sum(
            (
                (F.col("n_repeat_spans") > 0)
                & (F.col("repeat_chars") < F.col("n_repeat_spans") * SUB_K)
            ).cast("int")
        ).alias("short_span"),
        F.max("repeat_frac").alias("max_frac"),
    ).collect()[0]
    n_docs = docs.count()
    assert agg["n"] == n_docs          # one row per document, always
    assert agg["over"] == 0            # coverage can't exceed the text
    assert agg["short_span"] == 0      # every span is >= K chars
    # the corpus plants exact duplicate documents — their whole text is
    # corpus-repeated, so full coverage must appear
    assert agg["max_frac"] >= 0.999


def test_chat_template_mask_arithmetic(spark):
    out = QUERIES["chat_template"].spark(spark, SF_SMOKE)
    agg = out.agg(
        F.sum(
            (
                F.col("n_masked") + F.col("n_trained")
                != F.col("n_tokens") + 3
            ).cast("int")
        ).alias("bad_sum"),
        F.sum(
            (~F.col("loss_frac").between(0.0, 1.0)).cast("int")
        ).alias("bad_frac"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("render_md5").alias("renders"),
    ).collect()[0]
    # role tags: 2 masked (user+assistant) + 1 trained (end) = +3 total
    assert agg["bad_sum"] == 0
    assert agg["bad_frac"] == 0
    assert agg["n"] > 0
    # distinct documents render distinct examples (duplicate docs share)
    assert agg["renders"] > agg["n"] // 2


def test_containment_dedup_invariants(spark):
    """Directed containment: bounds, tau floor, and the subset guarantee
    for containment == 1.0 (every gram of the contained doc must appear
    in the container — verified by recomputing gram sets)."""
    from pubsub2bq_spark.operators.llm_dedup import CONT_K, CONT_TAU, _tokens
    from pubsub2bq_spark.tables import load

    out = QUERIES["containment_dedup"].spark(spark, SF_SMOKE).cache()
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("doc_id") == F.col("container_doc")).cast("int")).alias(
            "self_pair"
        ),
        F.sum((F.col("n_shared") > F.col("n_grams")).cast("int")).alias("over"),
        F.sum((F.col("containment") < CONT_TAU).cast("int")).alias("below_tau"),
        F.sum((F.col("containment") > 1.0).cast("int")).alias("above_one"),
        F.sum((F.col("containment") == 1.0).cast("int")).alias("exact"),
    ).collect()[0]
    assert agg["n"] > 0
    assert agg["self_pair"] == 0
    assert agg["over"] == 0
    assert agg["below_tau"] == 0 and agg["above_one"] == 0
    # the corpus plants exact duplicate documents: full containment exists
    assert agg["exact"] > 0

    # subset check for the containment == 1.0 pairs, against gram sets
    # rebuilt independently of the operator's join chain
    d = load(spark, SF_SMOKE, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("t")
    )
    n = F.size("t")
    starts = F.when(
        n >= CONT_K, F.sequence(F.lit(1), n - (CONT_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = d.select("doc_id", F.explode(starts).alias("i"), "t").select(
        "doc_id",
        F.array_join(F.slice(F.col("t"), F.col("i"), CONT_K), " ").alias("gram"),
    )
    full = out.filter(F.col("containment") == 1.0).select(
        F.col("doc_id").alias("inner_doc"), "container_doc"
    )
    # grams of the contained side that the container is MISSING: must be 0
    missing = (
        full.join(grams.alias("g"), F.col("inner_doc") == F.col("g.doc_id"))
        .join(
            grams.alias("h"),
            (F.col("container_doc") == F.col("h.doc_id"))
            & (F.col("g.gram") == F.col("h.gram")),
            "left_anti",
        )
        .count()
    )
    assert missing == 0
    out.unpersist()


def test_semantic_decontaminate_flags_only_true_train_hits(spark):
    """Every flagged vector must be (a) in the train split and (b) a
    TRUE contamination per the brute-force all-pairs truth; the reported
    max_cosine can never exceed the true maximum over all eval mates
    (candidates are a subset of all pairs); and the cell+neighbor probe
    must recover a substantial share of the planted leakage."""
    from pubsub2bq_spark.operators.llm_quality import (
        DECON_EVAL_DENOM,
        SEMDEDUP_TAU,
    )
    from pubsub2bq_spark.operators.llm_similarity import _cosine, _dvec
    from pubsub2bq_spark.operators.ml_ops import _kpp_u16
    from pubsub2bq_spark.tables import load

    out = {
        r["vec_id"]: r
        for r in QUERIES["semantic_decontaminate"].spark(spark, SF_SMOKE).collect()
    }
    assert out  # planted near-dup clusters straddle the split

    isev = (
        _kpp_u16(F.concat(F.col("vec_id").cast("string"), F.lit(":dec")))
        * F.lit(DECON_EVAL_DENOM)
        < F.lit(65536)
    )
    v = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v"), isev.alias("isev")
    )
    tr = v.filter(~F.col("isev")).select(
        F.col("vec_id").alias("tid"), F.col("v").alias("tv")
    )
    ev = v.filter(F.col("isev")).select(
        F.col("vec_id").alias("eid"), F.col("v").alias("evv")
    )
    # brute-force truth: fine at test scale, the thing the operator's
    # bounded candidate generation is approximating
    truth = {
        r["tid"]: r
        for r in (
            tr.crossJoin(F.broadcast(ev))
            .select("tid", _cosine(F.col("tv"), F.col("evv")).alias("cos"))
            .filter(F.col("cos") > SEMDEDUP_TAU)
            .groupBy("tid")
            .agg(F.count(F.lit(1)).alias("hits"), F.max("cos").alias("mx"))
            .collect()
        )
    }
    assert set(out) <= set(truth)          # no false positives, train-only
    for vid, r in out.items():
        t = truth[vid]
        assert r["n_eval_hits"] <= t["hits"]
        assert r["max_cosine"] <= round(t["mx"], 6) + 1e-9
    # recall of the nprobe-bounded candidate pass vs the planted truth
    assert len(out) >= 0.5 * len(truth)


class TestWinnowing:
    """Winnowing contracts: the positional guarantee (shared substring of
    >= GRAM+W-1 chars => shared fingerprint) and boilerplate df-capping."""

    def _write_docs(self, spark, tmp_path, docs):
        sf = str(tmp_path)
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{sf}/documents.parquet")
        return sf

    def test_shared_substring_guarantee(self, spark, tmp_path):
        from pubsub2bq_spark.operators.llm_dedup import (
            WIN_GRAM,
            WIN_W,
            _winnow_fps,
        )

        shared = "the quick brown fox jumps over it"  # 33 >= GRAM+W-1 = 23
        assert len(shared) >= WIN_GRAM + WIN_W - 1
        docs = [
            "completely unrelated opening text here " + shared,
            shared + " and then a totally different continuation block",
            "no overlap with anything else in this corpus whatsoever!!",
        ]
        sf = self._write_docs(spark, tmp_path, docs)
        fps = {r["doc_id"]: set(r["fps"]) for r in _winnow_fps(spark, sf).collect()}
        assert fps[0] & fps[1]          # guaranteed common fingerprint
        # the unrelated doc shares nothing with either neighbor
        assert not fps[2] & fps[0]
        assert not fps[2] & fps[1]

    def test_boilerplate_df_cap_drops_universal_fingerprints(self, spark, tmp_path):
        from pubsub2bq_spark.operators.llm_dedup import (
            WIN_DF_CAP,
            winnow_matches,
        )

        # every doc carries the same boilerplate banner; pairwise overlap
        # beyond it does not exist, so after the df cap there are no
        # matches at all.
        banner = "copyright two thousand twenty four all rights reserved "
        docs = [
            banner + f"unique body text number {i} with its own words {i*7}"
            for i in range(WIN_DF_CAP + 4)
        ]
        sf = self._write_docs(spark, tmp_path, docs)
        assert winnow_matches(spark, sf).count() == 0
