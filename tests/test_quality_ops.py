"""Semantic tests for the round-5 quality operators (llm_quality):
planted-outlier detection for perplexity_filter and planted-duplicate
pruning for semdedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub2bq_spark.operators.llm_quality import (
    SEMDEDUP_TAU,
    perplexity_filter,
    semdedup,
)


class TestPerplexityFilter:
    def _write_docs(self, spark, tmp_path):
        normal = (
            "the quick brown fox jumps over the lazy dog and runs back home "
        ) * 6
        gibberish = "zqxj vbkw pfmg hqzt xjwq kvbn mzpl qwgh " * 10
        rows = [(i, normal, "en", "s", len(normal)) for i in range(30)] + [
            (99, gibberish, "en", "s", len(gibberish))
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        df.write.parquet(f"{tmp_path}/documents.parquet")
        return str(tmp_path)

    def test_planted_gibberish_is_flagged(self, spark, tmp_path):
        """A doc of never-repeating rare bigrams must be the z-score
        outlier; the 30 identical natural docs must not be flagged."""
        out = perplexity_filter(spark, self._write_docs(spark, tmp_path))
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[99].flagged
        assert not any(rows[i].flagged for i in range(30))
        assert rows[99].bigram_nll > rows[0].bigram_nll

    def test_short_docs_excluded(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "word", "en", "s", 4), (2, "two words here now ok", "en", "s", 20),
             (3, "more words making bigrams too", "en", "s", 29)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.parquet(f"{tmp_path}/documents.parquet")
        out = perplexity_filter(spark, str(tmp_path))
        ids = {r.doc_id for r in out.collect()}
        assert 1 not in ids  # single token → no bigrams → excluded
        assert ids == {2, 3}

    def test_single_scoreable_doc_is_not_flagged(self, spark, tmp_path):
        """ADVICE r5 #3 regression: with exactly one scoreable doc,
        stddev_samp is NaN on Spark (NULL on DuckDB) — the nanvl guard
        must pin z to NULL and flagged to false, matching the oracle."""
        df = spark.createDataFrame(
            [(1, "only doc with bigrams here", "en", "s", 26),
             (2, "word", "en", "s", 4)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.parquet(f"{tmp_path}/documents.parquet")
        rows = perplexity_filter(spark, str(tmp_path)).collect()
        assert len(rows) == 1 and rows[0].doc_id == 1
        assert rows[0].z is None
        assert rows[0].flagged is False


class TestSemDedup:
    def _write_embeddings(self, spark, tmp_path, dim=8):
        import math

        def unit(seed):
            vals = [math.sin(seed * 37 + j * 13) + 1.5 for j in range(dim)]
            n = math.sqrt(sum(v * v for v in vals))
            return [v / n for v in vals]

        base = unit(1)
        rows = [(0, base)]
        rows += [(i, unit(i * 101)) for i in range(1, 20)]
        rows += [(50, base), (51, base)]  # exact duplicates of vec 0
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        df.write.parquet(f"{tmp_path}/embeddings.parquet")
        return str(tmp_path)

    def test_planted_duplicates_dropped_to_lowest_canonical(self, spark, tmp_path):
        out = semdedup(spark, self._write_embeddings(spark, tmp_path))
        rows = {r.vec_id: r for r in out.collect()}
        # both copies dropped, canonical = the LOWEST id of the group
        assert 50 in rows and rows[50].dup_of == 0
        assert 51 in rows and rows[51].dup_of == 0
        assert abs(rows[50].cosine - 1.0) < 1e-6
        # the original survives (never appears as a dropped vec)
        assert 0 not in rows

    def test_drop_set_respects_threshold(self, spark, tmp_path):
        out = semdedup(spark, self._write_embeddings(spark, tmp_path))
        assert out.filter(F.col("cosine") <= SEMDEDUP_TAU).count() == 0


class TestSemDedupQuantizer:
    """VERDICT r5 #5: on skewed embeddings the learned (k-means||-seeded
    + one-Lloyd-round) quantizer must balance cells where the old
    first-n-by-id quantizer let one cell absorb a whole foreign
    cluster."""

    def _write_skewed(self, spark, tmp_path, n_a=16, n_b=112, dim=8):
        """Cluster A (ids 0..15) tight around e0; cluster B (ids 16..127)
        tight around e1. The first n_a ids are ALL in A, so id-based
        centroids leave every B vector in one cell."""
        import math

        def jittered(base_axis, seed):
            vals = [0.02 * math.sin(seed * 31 + j * 17) for j in range(dim)]
            vals[base_axis] += 1.0
            n = math.sqrt(sum(v * v for v in vals))
            return [v / n for v in vals]

        rows = [(i, jittered(0, i)) for i in range(n_a)]
        rows += [(n_a + i, jittered(1, i)) for i in range(n_b)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        df.write.parquet(f"{tmp_path}/embeddings.parquet")
        return str(tmp_path), n_a + n_b

    def test_learned_cells_balance_skewed_clusters(self, spark, tmp_path):
        from pubsub2bq_spark.operators.llm_quality import (
            SEMDEDUP_CELLS,
        )
        from pubsub2bq_spark.operators.llm_similarity import _dvec
        from pubsub2bq_spark.operators.ml_ops import _assign, _kpp_seeds, _recompute
        from pubsub2bq_spark.tables import load, materialize

        sf, n = self._write_skewed(spark, tmp_path)
        v = (
            load(spark, sf, "embeddings")
            .select("vec_id", _dvec("embedding").alias("v"))
            .transform(materialize)
        )
        # old quantizer: first-16-by-id centroids — all in cluster A
        old_cent = (
            v.orderBy("vec_id").limit(SEMDEDUP_CELLS)
            .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
        )
        old_max = (
            _assign(v, old_cent).groupBy("cid").count()
            .agg(F.max("count")).first()[0]
        )
        # new quantizer: exactly semdedup's build
        seeds = _kpp_seeds(v, k=SEMDEDUP_CELLS, l=2 * SEMDEDUP_CELLS)
        new_cent = _recompute(_assign(v, seeds))
        new_max = (
            _assign(v, new_cent).groupBy("cid").count()
            .agg(F.max("count")).first()[0]
        )
        # id-based centroids put the whole 112-vector B cluster in 1 cell
        assert old_max >= 112
        # learned centroids split it: worst cell under half the corpus
        assert new_max < old_max
        assert new_max <= n / 2


class TestBpeTrain:
    def test_round1_agrees_with_bpe_merges(self, spark):
        """bpe_train's first merged pair must be bpe_merges' rank-1
        candidate (round 1 symbols are single characters, so left||right
        IS that 2-char pair)."""
        from pubsub2bq_spark.operators.training_prep import bpe_merges, bpe_train

        t1 = bpe_train(spark, "/root/testdata/sf0.001").filter("rk = 1").first()
        m1 = bpe_merges(spark, "/root/testdata/sf0.001").filter("rk = 1").first()
        assert t1.left_sym + t1.right_sym == m1.pair
        assert t1.cnt == m1.cnt

    def test_known_merge_sequence_with_overlaps(self, spark, tmp_path):
        """Corpus of 'aaab' words: round 1 merges (a,a) — the overlap case
        'a a a' must fold left-to-right to [aa, a], giving count 2 per
        word occurrence BEFORE merging but selecting (a,a); round 2 sees
        segments [aa, a, b] and merges the lexically-first of the tied
        pairs (a,b) < (aa,a)."""
        from pubsub2bq_spark.operators.training_prep import bpe_train

        text = "aaab " * 7
        df = spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.parquet(f"{tmp_path}/documents.parquet")
        rows = {r.rk: r for r in bpe_train(spark, str(tmp_path)).collect()}
        # 7 occurrences of 'aaab': 2 non-overlapping (a,a) sites x 7
        assert (rows[1].left_sym, rows[1].right_sym) == ("a", "a")
        assert rows[1].cnt == 14
        assert (rows[2].left_sym, rows[2].right_sym) == ("a", "b")
        assert rows[2].cnt == 7
        assert (rows[3].left_sym, rows[3].right_sym) == ("aa", "ab")
        # after round 3 the word is one symbol — no pairs, rounds 4-8 empty
        assert set(rows) == {1, 2, 3}

    def test_suffix_collision_is_not_collapsed(self, spark, tmp_path):
        """ADVICE r5 #1 regression: after merging (x,a), word 'xab' is
        [xa, b]; the later (a,b) merge must NOT collapse it (the 'a' is
        a mid-symbol suffix of 'xa', not a free symbol). Corpus tuned so
        round 1 = (x,a), round 2 = (a,b), round 3 = (xa,b): under the
        unanchored encoding round 2 wrongly folded 'xab' to one symbol,
        which erased round 3's (xa,b) pair."""
        from pubsub2bq_spark.operators.training_prep import bpe_train

        text = " ".join(["xa"] * 6 + ["ab"] * 5 + ["xab"] * 4)
        df = spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.parquet(f"{tmp_path}/documents.parquet")
        rows = {r.rk: r for r in bpe_train(spark, str(tmp_path)).collect()}
        assert (rows[1].left_sym, rows[1].right_sym, rows[1].cnt) == ("x", "a", 10)
        assert (rows[2].left_sym, rows[2].right_sym, rows[2].cnt) == ("a", "b", 5)
        # 'xab' must still be [xa, b] here — 4 live (xa,b) sites
        assert (rows[3].left_sym, rows[3].right_sym, rows[3].cnt) == ("xa", "b", 4)
        # merges exhausted after round 3; sentinel rounds emit nothing
        assert set(rows) == {1, 2, 3}


class TestBpeApply:
    def test_fertility_bounds_and_consistency(self, spark):
        """Fertility is in [1, max word length]: a word is at least one
        piece and at most its character count; n_pieces >= n_words."""
        from pubsub2bq_spark.operators.training_prep import bpe_apply

        rows = bpe_apply(spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            assert r.n_pieces >= r.n_words
            assert 1.0 <= r.fertility

    def test_merged_corpus_has_lower_fertility_than_chars(self, spark):
        """After 8 merges, average fertility must be strictly below the
        character-level baseline (pieces == characters)."""
        from pyspark.sql import functions as F

        from pubsub2bq_spark.operators.training_prep import bpe_apply
        from pubsub2bq_spark.tables import load

        sf = "/root/testdata/sf0.001"
        out = bpe_apply(spark, sf)
        d = load(spark, sf, "documents")
        words = d.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "")
            ).alias("word"),
        )
        char_baseline = (
            words.groupBy("doc_id")
            .agg((F.sum(F.length("word")) / F.count(F.lit(1))).alias("chars_per_word"))
        )
        joined = out.join(char_baseline, "doc_id")
        assert joined.filter(F.col("fertility") >= F.col("chars_per_word")).count() == 0

    def test_exhausted_merge_table_keeps_vocab(self, spark, tmp_path):
        """ADVICE r5 #2 regression: a corpus of single-character words has
        ZERO mergeable pairs, so every training round's merge table is
        empty. The sentinel pad must keep the vocab intact (the old
        crossJoin annihilated it — bpe_apply returned zero rows) and
        every word must score fertility 1.0 under the char-level vocab."""
        from pubsub2bq_spark.operators.training_prep import bpe_apply

        text = "a b c a b c"
        df = spark.createDataFrame(
            [(1, text, "en", "s", len(text)), (2, "c a", "en", "s", 3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.parquet(f"{tmp_path}/documents.parquet")
        rows = {r.doc_id: r for r in bpe_apply(spark, str(tmp_path)).collect()}
        assert set(rows) == {1, 2}
        assert (rows[1].n_words, rows[1].n_pieces, rows[1].fertility) == (6, 6, 1.0)
        assert (rows[2].n_words, rows[2].n_pieces, rows[2].fertility) == (2, 2, 1.0)


class TestCurriculumOrder:
    def test_stages_partition_by_fluency(self, spark, tmp_path):
        """Planted two-level corpus: 30 fluent docs + 10 gibberish docs →
        gibberish must fill the hardest stage(s), and stage-mean NLL must
        increase monotonically."""
        from pubsub2bq_spark.operators.llm_quality import (
            CURR_STAGES,
            curriculum_order,
        )

        import string

        normal = "the quick brown fox jumps over the lazy dog again " * 4
        rows = [(i, normal, "en", "s", len(normal)) for i in range(30)]
        letters = string.ascii_lowercase
        for i in range(10):
            # 24 unique letter-only tokens, disjoint across docs and
            # never repeated — every gibberish bigram has count 1, the
            # highest NLL the add-one-smoothed LM can assign
            gib = " ".join(
                f"{letters[i]}{letters[j]}qx{letters[(i + j) % 26]}"
                for j in range(24)
            )
            rows.append((100 + i, gib, "en", "s", len(gib)))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        out = curriculum_order(spark, str(tmp_path)).toPandas()
        assert len(out) == 40
        # exact ntile sizes: 40 docs / 4 stages = 10 each
        sizes = out.groupby("stage").size()
        assert sorted(sizes.index) == list(range(1, CURR_STAGES + 1))
        assert set(sizes) == {10}
        # all 10 gibberish docs occupy exactly the hardest stage
        assert set(out[out["doc_id"] >= 100]["stage"]) == {CURR_STAGES}
        # mean NLL monotone over stages
        means = out.groupby("stage")["bigram_nll"].mean()
        assert list(means.index) == sorted(means.index)
        assert all(means.iloc[i] <= means.iloc[i + 1] for i in range(len(means) - 1))

    def test_stage_pos_is_a_shuffled_permutation(self, spark):
        from pubsub2bq_spark.operators.llm_quality import curriculum_order

        out = curriculum_order(spark, "/root/testdata/sf0.001").toPandas()
        for _, grp in out.groupby("stage"):
            assert sorted(grp["stage_pos"]) == list(range(len(grp)))
            # the shuffle decorrelates from doc_id order: the md5 key must
            # not leave stage_pos monotone in doc_id (astronomically
            # unlikely unless the shuffle is broken)
            ordered = grp.sort_values("doc_id")["stage_pos"].tolist()
            assert ordered != sorted(ordered)


class TestQualityLogreg:
    def test_learns_beyond_majority(self, spark):
        """The trained classifier must beat the predict-all-negative
        majority baseline on its own training labels — i.e. the GD
        steps actually move the weights off the bias-only solution."""
        from pubsub2bq_spark.operators.llm_quality import quality_logreg

        rows = quality_logreg(spark, "/root/testdata/sf0.001").collect()
        n = len(rows)
        pos = sum(r.label for r in rows)
        acc = sum(int(r.pred) == r.label for r in rows) / n
        majority = max(pos, n - pos) / n
        assert acc > majority, f"acc {acc:.3f} <= majority {majority:.3f}"
        assert 0 < sum(r.pred for r in rows) < n  # non-trivial predictions
        assert all(0.0 <= r.score <= 1.0 for r in rows)

    def test_loss_descends(self, spark):
        """Cross-entropy after training < ln 2 (the w=0 starting loss):
        full-batch GD on a convex objective with standardized features
        must descend."""
        import math

        from pubsub2bq_spark.operators.llm_quality import quality_logreg

        rows = quality_logreg(spark, "/root/testdata/sf0.001").collect()
        eps = 1e-6
        loss = -sum(
            r.label * math.log(max(r.score, eps))
            + (1 - r.label) * math.log(max(1.0 - r.score, eps))
            for r in rows
        ) / len(rows)
        assert loss < math.log(2.0), f"loss {loss:.4f} did not descend"


def test_quality_ensemble_zscores_center_and_flag_tail(spark):
    from pyspark.sql import functions as F

    from pubsub2bq_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    out = all_queries()["quality_ensemble"].spark(spark, SF_SMOKE)
    row = out.agg(
        F.avg("quality_z").alias("mu"),
        F.sum(F.col("flagged").cast("int")).alias("n_flagged"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # standardized signals average ~0 corpus-wide
    assert abs(row["mu"]) < 0.05
    # the gate flags a real but minority tail
    assert 0 < row["n_flagged"] < row["n"] / 2


class TestCompressionRatio:
    """Contracts for the compressibility signal (no SQL engine can
    restate zlib, so the driver oracle is a pinned golden table and the
    orderings the filter relies on are pinned here)."""

    def test_golden_oracle_rederives(self):
        """The committed golden module (the driver oracle for
        compression_ratio) must equal a fresh pure-Python derivation —
        a zlib/container change fails HERE loudly instead of silently
        failing the driver gate."""
        import importlib
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        try:
            gen = importlib.import_module("gen_compression_golden")
        finally:
            sys.path.pop(0)
        from pubsub2bq_spark.operators import _compression_golden as g

        rows = gen.golden_rows()
        assert g.N_ROWS == len(rows)
        import duckdb

        got = duckdb.sql(g.COMPRESSION_GOLDEN_SQL).fetchall()
        assert sorted(got) == [
            (d, nb, nc, r, k) for d, nb, nc, r, k in rows
        ], "golden table drifted from the pure-Python derivation — rerun scripts/gen_compression_golden.py and investigate why"

    def test_orderings_and_determinism(self, spark, tmp_path):
        from pubsub2bq_spark.operators.llm_quality import compression_ratio

        docs = [
            (1, "spam " * 60, "en", "s", 300),            # repetitive
            (2, "the quick brown fox jumps over the lazy dog while "
                "seventy peculiar zebras quietly examined jagged "
                "formations beyond the misty valley floor today", "en", "s", 143),
            (3, "kq7x!Rz@9mWv#2pLc$5nTb&8dHj*4fGs^1aYe~6uIo+3cXw"
                "zR!7qK@x9#vWm2$pL5c&nT8b*dH4j^fG1s~aY6e+uI3oXc", "en", "s", 95),
        ]
        sf = str(tmp_path)
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{sf}/documents.parquet")
        r1 = {r["doc_id"]: r.asDict() for r in compression_ratio(spark, sf).collect()}
        r2 = {r["doc_id"]: r.asDict() for r in compression_ratio(spark, sf).collect()}
        assert r1 == r2  # deterministic
        assert r1[1]["ratio"] < r1[2]["ratio"] < r1[3]["ratio"]  # spam < prose < noise
        assert not r1[1]["keep"]   # repetitive text is dropped
        assert r1[2]["keep"] and r1[3]["keep"]
        for r in r1.values():  # the ratio column restates the two lengths
            assert r["ratio"] == round(r["n_compressed"] / r["n_bytes"], 6)

    def test_real_corpus_rowcount_and_bounds(self, spark):
        from pubsub2bq_spark.operators.llm_quality import compression_ratio

        out = compression_ratio(spark, "/root/testdata/sf0.001").collect()
        import duckdb

        n = duckdb.sql(
            "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchone()[0]
        assert len(out) == n
        assert all(0 < r["ratio"] <= 1.5 for r in out)
