"""Semantic invariants for the training-prep suite (doc_chunk,
dup_passage, …) — properties the DuckDB hash parity can't express:
lossless chunk coverage, planted cross-document duplicate passages,
map-only plan shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pubsub2bq_spark.operators.training_prep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    DUP_GRAM,
    doc_chunk,
    dup_passage,
)
from tests.conftest import SF_SMOKE


class TestDocChunk:
    def test_stride_prefixes_reconstruct_document(self, spark):
        """Concatenating each chunk's first STRIDE tokens in chunk order
        must reproduce the document's full token stream (chunking is
        lossless; overlap is exactly CHUNK-STRIDE tokens)."""
        chunks = doc_chunk(spark, SF_SMOKE)
        rebuilt = {
            r.doc_id: r.toks
            for r in (
                chunks.withColumn(
                    "head",
                    F.slice(F.split("chunk_text", r"\s+"), 1, CHUNK_STRIDE),
                )
                .groupBy("doc_id")
                .agg(
                    F.flatten(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_id", "head"))
                        ).getField("head")
                    ).alias("toks")
                )
                .collect()
            )
        }
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        expected = {
            r.doc_id: r.toks
            for r in docs.select(
                "doc_id",
                F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("toks"),
            ).collect()
        }
        assert rebuilt == expected

    def test_chunk_sizes(self, spark):
        """Chunk width is exactly min(CHUNK, n_tokens - chunk_id*STRIDE):
        full-width until the document tail runs out."""
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias(
                "n_tokens"
            ),
        )
        rows = doc_chunk(spark, SF_SMOKE).join(docs, "doc_id").collect()
        assert rows
        for r in rows:
            expected = min(CHUNK_TOKENS, r.n_tokens - r.chunk_id * CHUNK_STRIDE)
            assert r.n_chunk_tokens == max(expected, 0) or (
                r.n_tokens == 0 and r.n_chunk_tokens == 0
            ), (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.n_tokens)
            assert 0 <= r.n_chunk_tokens <= CHUNK_TOKENS

    def test_map_only_plan(self, spark):
        """Chunking must not shuffle: the only allowed exchange is
        fan_out's round-robin scan widening."""
        import contextlib
        import io
        import re

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            doc_chunk(spark, SF_SMOKE).explain("formatted")
        plan = buf.getvalue()
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange <= 1, plan
        assert "Join" not in plan


class TestDupPassage:
    def _sf_with_docs(self, spark, tmp_path, texts: dict[int, str]) -> str:
        sf = str(tmp_path)
        rows = [
            (doc_id, text, "en", "synthetic", len(text))
            for doc_id, text in texts.items()
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{sf}/documents.parquet")
        return sf

    def test_planted_shared_passage_is_flagged(self, spark, tmp_path):
        """Two docs sharing a 12-word passage each get 12-8+1=5 duplicate
        gram positions; an unrelated doc gets zero."""
        passage = " ".join(f"shared{i}" for i in range(12))
        filler_a = " ".join(f"aaa{i}" for i in range(20))
        filler_b = " ".join(f"bbb{i}" for i in range(20))
        filler_c = " ".join(f"ccc{i}" for i in range(40))
        sf = self._sf_with_docs(
            spark,
            tmp_path,
            {
                1: f"{filler_a} {passage}",
                2: f"{passage} {filler_b}",
                3: filler_c,
            },
        )
        got = {r.doc_id: r for r in dup_passage(spark, sf).collect()}
        expected_dup = 12 - DUP_GRAM + 1
        assert got[1].n_dup_grams == expected_dup
        assert got[2].n_dup_grams == expected_dup
        assert got[3].n_dup_grams == 0
        assert not got[3].flagged
        # 32 tokens → 25 grams; 5/25 = 0.2 ⇒ flagged at the threshold
        assert got[1].n_grams == 32 - DUP_GRAM + 1
        assert got[1].flagged

    def test_short_doc_has_zero_grams(self, spark, tmp_path):
        sf = self._sf_with_docs(spark, tmp_path, {1: "only five words right here"})
        row = dup_passage(spark, sf).collect()[0]
        assert (row.n_grams, row.n_dup_grams, row.dup_ratio, row.flagged) == (
            0,
            0,
            0.0,
            False,
        )

    def test_ratio_bounds(self, spark):
        bad = (
            dup_passage(spark, SF_SMOKE)
            .filter(
                (F.col("n_dup_grams") > F.col("n_grams"))
                | (F.col("dup_ratio") < 0)
                | (F.col("dup_ratio") > 1)
            )
            .count()
        )
        assert bad == 0


class TestFeatureHash:
    def test_mass_conservation_and_range(self, spark):
        """Two features per event ⇒ sum(n) == 2·|events|; indices live
        in [0, HASH_FEATURES)."""
        from pubsub2bq_spark.operators.training_prep import (
            HASH_FEATURES,
            feature_hash,
        )

        rows = feature_hash(spark, SF_SMOKE).collect()
        n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
        assert sum(r.n for r in rows) == 2 * n_events
        assert all(0 <= r.feat_idx < HASH_FEATURES for r in rows)


class TestNegativeSample:
    def test_counts_and_no_self_pairs(self, spark):
        from pubsub2bq_spark.operators.training_prep import NEG_K, negative_sample

        rows = negative_sample(spark, SF_SMOKE).collect()
        per_anchor: dict[int, list] = {}
        for r in rows:
            per_anchor.setdefault(r.anchor_doc_id, []).append(r)
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        n_anchors = docs.filter(F.col("doc_id") % 50 == 0).count()
        assert len(per_anchor) == n_anchors
        for anchor, negs in per_anchor.items():
            assert len(negs) == NEG_K, anchor
            assert all(n.neg_doc_id != anchor for n in negs)
            assert len({n.neg_doc_id for n in negs}) == NEG_K  # distinct

    def test_deterministic_across_runs(self, spark):
        from pubsub2bq_spark.operators.training_prep import negative_sample

        a = sorted(map(tuple, negative_sample(spark, SF_SMOKE).collect()))
        b = sorted(map(tuple, negative_sample(spark, SF_SMOKE).collect()))
        assert a == b


class TestBpePack:
    def test_consistent_with_bpe_apply_and_offsets(self, spark):
        """n_tokens must equal bpe_apply's per-doc n_pieces, offsets must
        be the exact prefix sum within (source, doc_id order), and
        pack_offset < PACK_TOKENS always."""
        from pubsub2bq_spark.operators.training_prep import (
            PACK_TOKENS,
            bpe_apply,
            bpe_pack,
        )

        sf = "/root/testdata/sf0.001"
        packed = bpe_pack(spark, sf).toPandas()
        pieces = bpe_apply(spark, sf).toPandas().set_index("doc_id")["n_pieces"]
        assert (packed["pack_offset"] < PACK_TOKENS).all()
        assert (packed["pack_offset"] >= 0).all()
        for _, row in packed.iterrows():
            if row["doc_id"] in pieces.index:
                assert row["n_tokens"] == pieces[row["doc_id"]]
        for _, grp in packed.groupby("source"):
            g = grp.sort_values("doc_id")
            start = (g["pack_id"] * PACK_TOKENS + g["pack_offset"]).tolist()
            expect = 0
            for off, n in zip(start, g["n_tokens"]):
                assert off == expect
                expect += n

    def test_learned_vocab_packs_tighter_than_chars(self, spark):
        """BPE pieces per doc are below character counts, so the learned
        packing uses fewer sequences than a char-level packing would."""
        from pyspark.sql import functions as F

        from pubsub2bq_spark.operators.training_prep import bpe_pack
        from pubsub2bq_spark.tables import load

        sf = "/root/testdata/sf0.001"
        packed = bpe_pack(spark, sf).toPandas()
        d = load(spark, sf, "documents").select(
            "doc_id", F.length("text").alias("n_chars")
        ).toPandas()
        total_tokens = packed["n_tokens"].sum()
        total_chars = d["n_chars"].sum()
        assert 0 < total_tokens < total_chars


class TestPreferencePairs:
    def test_argmax_argmin_match_window_recompute(self, spark):
        """The order-encoded min/max aggregate must agree with the obvious
        window-rank formulation on every emitted group, including the
        lower-doc_id tie-breaks on both sides."""
        from pubsub2bq_spark.operators.training_prep import preference_pairs
        from pubsub2bq_spark.tables import load

        out = {
            (r["lang"], r["source"]): r
            for r in preference_pairs(spark, SF_SMOKE).collect()
        }
        assert out  # preference signal exists in the corpus

        scored = load(spark, SF_SMOKE, "documents").select(
            "doc_id",
            "lang",
            "source",
            F.size(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
                    )
                )
            )
            .cast("bigint")
            .alias("score"),
        )
        wc = Window.partitionBy("lang", "source").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        wr = Window.partitionBy("lang", "source").orderBy(
            F.col("score").asc(), F.col("doc_id").asc()
        )
        ref_rows = (
            scored.withColumn("rc", F.row_number().over(wc))
            .withColumn("rr", F.row_number().over(wr))
            .groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.when(F.col("rc") == 1, F.col("doc_id"))).alias("cd"),
                F.max(F.when(F.col("rc") == 1, F.col("score"))).alias("cs"),
                F.max(F.when(F.col("rr") == 1, F.col("doc_id"))).alias("rd"),
                F.max(F.when(F.col("rr") == 1, F.col("score"))).alias("rs"),
            )
            .collect()
        )
        ref = {
            (r["lang"], r["source"]): r
            for r in ref_rows
            if r["n"] >= 2 and r["cs"] > r["rs"]
        }
        assert set(out) == set(ref)
        for key, r in ref.items():
            o = out[key]
            assert o["chosen_doc"] == r["cd"] and o["chosen_score"] == r["cs"]
            assert o["rejected_doc"] == r["rd"] and o["rejected_score"] == r["rs"]
            assert o["margin"] == r["cs"] - r["rs"] > 0
            assert o["chosen_doc"] != o["rejected_doc"]


class TestTokenizerFertility:
    def test_reconciles_with_bpe_apply(self, spark):
        """Corpus-cell totals must be exactly the per-document bpe_apply
        stats re-aggregated by (lang, source) — one tokenizer, two
        grains."""
        from pubsub2bq_spark.operators.training_prep import (
            bpe_apply,
            tokenizer_fertility,
        )
        from pubsub2bq_spark.tables import load

        cells = tokenizer_fertility(spark, SF_SMOKE)
        dims = load(spark, SF_SMOKE, "documents").select(
            "doc_id", "lang", "source"
        )
        ref = (
            bpe_apply(spark, SF_SMOKE)
            .join(dims, "doc_id")
            .groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_words").alias("n_words"),
                F.sum("n_pieces").alias("n_pieces"),
            )
        )
        ref_rows = {(r["lang"], r["source"]): r for r in ref.collect()}
        cell_rows = {(r["lang"], r["source"]): r for r in cells.collect()}
        assert set(cell_rows) == set(ref_rows)
        for key, c in cell_rows.items():
            r = ref_rows[key]
            assert c["n_docs"] == r["n_docs"]
            assert c["n_words"] == r["n_words"]
            assert c["n_pieces"] == r["n_pieces"]
            # BPE can only split words, never merge across them
            assert c["fertility"] >= 1.0
