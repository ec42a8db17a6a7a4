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
