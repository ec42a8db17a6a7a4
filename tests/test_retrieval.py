"""Semantic properties of the retrieval family (retrieval.py) beyond
oracle parity: BM25 must surface lexical near-duplicates, RRF fusion
must respect leg provenance and rank arithmetic."""

from __future__ import annotations

import pytest

from pubsub2bq_spark.operators.retrieval import (
    FUSE_K,
    LEX_K,
    RRF_C,
    bm25_topk,
    hybrid_retrieve,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lex(spark):
    return bm25_topk(spark, SF_SMOKE).toPandas()


@pytest.fixture(scope="module")
def fused(spark):
    return hybrid_retrieve(spark, SF_SMOKE).toPandas()


def test_bm25_shape_and_rank_contract(lex):
    assert not lex.empty
    for qid, grp in lex.groupby("query_id"):
        assert len(grp) <= LEX_K
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
        # ranks follow rounded-score descending with doc_id tiebreak
        ordered = grp.sort_values("rank")
        scores = ordered["bm25"].tolist()
        assert scores == sorted(scores, reverse=True)
        assert (grp["doc_id"] != qid).all()  # query doc never retrieves itself


def test_bm25_beats_random_on_token_overlap(spark, lex):
    """Retrieval quality floor: for EVERY query, the BM25 top-1 doc's
    token-set Jaccard to the query must exceed the query's corpus-mean
    Jaccard — the lexical leg retrieves better than chance even on this
    templated 31-token vocabulary (where df-capping at 0.3 used to blind
    it: all five queries must return results)."""
    from pyspark.sql import functions as F

    from pubsub2bq_spark.operators.retrieval import _tokens
    from pubsub2bq_spark.tables import load

    toks = load(spark, SF_SMOKE, "documents").select(
        "doc_id", F.array_distinct(_tokens(F.col("text"))).alias("tok")
    )
    q, d = toks.alias("q"), toks.alias("d")
    jac = (
        q.join(
            d,
            (F.col("q.doc_id") % 100 == 0)
            & (F.col("q.doc_id") != F.col("d.doc_id")),
        )
        .select(
            F.col("q.doc_id").alias("query_id"),
            F.col("d.doc_id").alias("doc_id"),
            (
                F.size(F.array_intersect("q.tok", "d.tok")).cast("double")
                / F.size(F.array_union("q.tok", "d.tok"))
            ).alias("j"),
        )
        .toPandas()
    )
    assert sorted(lex["query_id"].unique()) == sorted(jac["query_id"].unique())
    for qid, grp in lex.groupby("query_id"):
        top1 = grp.loc[grp["rank"] == 1, "doc_id"].iloc[0]
        jq = jac[jac["query_id"] == qid]
        j_top = jq.loc[jq["doc_id"] == top1, "j"].iloc[0]
        assert j_top > jq["j"].mean(), (
            f"query {qid}: top-1 jaccard {j_top:.3f} <= mean {jq['j'].mean():.3f}"
        )


def test_rrf_score_matches_leg_ranks(spark, lex, fused):
    """rrf must equal 1/(C+lex_rank) + 1/(C+vec_rank) for the legs the
    doc appears in, and the provenance flags must match membership."""
    from pubsub2bq_spark.operators.llm_similarity import similarity_topk

    vec = similarity_topk(spark, SF_SMOKE).toPandas()
    lex_ranks = {(r.query_id, r.doc_id): r.rank for r in lex.itertuples()}
    vec_ranks = {(r.query_id, r.vec_id): r.rank for r in vec.itertuples()}
    assert not fused.empty
    for r in fused.itertuples():
        key = (r.query_id, r.doc_id)
        expect = 0.0
        if key in lex_ranks:
            expect += 1.0 / (RRF_C + lex_ranks[key])
        if key in vec_ranks:
            expect += 1.0 / (RRF_C + vec_ranks[key])
        assert abs(r.rrf - round(expect, 6)) < 1e-9, key
        assert r.in_lexical == (key in lex_ranks)
        assert r.in_vector == (key in vec_ranks)


def test_fused_topk_contract(fused):
    for _, grp in fused.groupby("query_id"):
        assert len(grp) <= FUSE_K
        ordered = grp.sort_values("rank")
        rrfs = ordered["rrf"].tolist()
        assert rrfs == sorted(rrfs, reverse=True)
        # With C=60 and leg depth <= 10, min both-leg rrf = 2/(60+10)
        # > max single-leg rrf = 1/(60+1): every both-leg doc must
        # outrank every single-leg doc.
        both = grp[grp["in_lexical"] & grp["in_vector"]]
        single = grp[~(grp["in_lexical"] & grp["in_vector"])]
        if not both.empty and not single.empty:
            assert both["rank"].max() < single["rank"].min()


class TestRerankTopk:
    @pytest.fixture(scope="class")
    def reranked(self, spark):
        from pubsub2bq_spark.operators.retrieval import rerank_topk

        return rerank_topk(spark, SF_SMOKE).toPandas()

    def test_same_candidate_set_as_hybrid(self, reranked, fused):
        """Rerank re-orders, never adds or drops: per query the (doc)
        candidate set equals hybrid_retrieve's fused top-k."""
        got = {
            (q, frozenset(g["doc_id"]))
            for q, g in reranked.groupby("query_id")
        }
        want = {
            (q, frozenset(g["doc_id"])) for q, g in fused.groupby("query_id")
        }
        assert got == want

    def test_rank_contract_and_score_bounds(self, reranked):
        assert not reranked.empty
        # ce_score = half jaccard + half coverage, each in [0, 1]
        assert (reranked["ce_score"] >= 0).all()
        assert (reranked["ce_score"] <= 1).all()
        for _, grp in reranked.groupby("query_id"):
            assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
            assert sorted(grp["prev_rank"]) == list(range(1, len(grp) + 1))
            ordered = grp.sort_values("rank")
            scores = ordered["ce_score"].tolist()
            assert scores == sorted(scores, reverse=True)

    def test_identical_token_set_scores_one(self, spark, tmp_path):
        """A candidate with the query's exact token set must score
        ce = 0.5*1 + 0.5*1 = 1.0 and take rank 1."""
        from pubsub2bq_spark.operators.retrieval import rerank_topk

        base = "alpha beta gamma delta epsilon zeta"
        rows = [(0, base, "en", "s", len(base)),          # query (id % 100 == 0)
                (1, base + " alpha", "en", "s", 1),       # same token SET
                (2, "alpha beta unrelated words here", "en", "s", 1),
                (3, "totally different content again", "en", "s", 1),
                (4, "gamma delta something else", "en", "s", 1)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        # embeddings table for the vector leg: reuse distinct unit vectors
        import math

        def unit(seed):
            vals = [math.sin(seed * 37 + j * 13) + 1.5 for j in range(8)]
            n = math.sqrt(sum(v * v for v in vals))
            return [v / n for v in vals]

        spark.createDataFrame(
            [(i, unit(i)) for i in range(5)],
            "vec_id long, embedding array<double>",
        ).write.parquet(f"{tmp_path}/embeddings.parquet")
        out = rerank_topk(spark, str(tmp_path)).toPandas()
        top = out[(out["query_id"] == 0) & (out["rank"] == 1)].iloc[0]
        assert top["doc_id"] == 1
        assert abs(top["ce_score"] - 1.0) < 1e-9
