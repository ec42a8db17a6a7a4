"""Lexical + hybrid retrieval over `documents`: the search-side
complement of the ANN family (llm_similarity) for a training-data /
RAG pipeline.

* bm25_topk       — classic BM25 (k1=1.2, b=0.75) document ranking
                    against each query document's term set, served by
                    an inverted-index (posting-list) join;
* hybrid_retrieve — Reciprocal Rank Fusion of the BM25 ranking with
                    the embedding-cosine ranking (similarity_topk):
                    the standard lexical+vector hybrid. Fusing on
                    RANKS (1/(C+rank)) keeps the op engine-exact —
                    no cross-engine float-score comparisons, just
                    integer ranks both sides already agree on.

Query set = doc_id % 100 = 0, the same ids similarity_topk uses for
its query vectors (vec_id = doc_id), so the two legs describe the
same queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load, materialize

BM25_K1 = 1.2
BM25_B = 0.75
# Terms in more than this fraction of documents are treated as stopwords
# and their postings skipped. 0.85 targets true function words; the test
# corpus has a ~31-token template vocabulary with median df 0.78, so a
# tighter cap (0.3) would blind the scorer to nearly every term.
DF_CAP_FRAC = 0.85
LEX_K = 10          # lexical top-k per query
RRF_C = 60          # canonical RRF constant
FUSE_K = 5          # fused results per query

_TOKENIZE = "[^a-z]+"


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), _TOKENIZE), lambda x: x != "")


# Shared SQL CTEs: tf per (doc, term), doc lengths, df per term with the
# stopword cap, BM25 scores of every (query doc, candidate doc) pair
# through the posting-list join, and the rounded-score ranking.
_BM25_CTES = f"""
    tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dl AS (
        SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    postings AS (
        SELECT t.term, t.doc_id, t.tf, d.dl,
               ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) AS idf
        FROM tf t
        JOIN dl d USING (doc_id)
        JOIN df f USING (term)
        CROSS JOIN stats s
        WHERE f.df <= s.n_docs * {DF_CAP_FRAC}
    ),
    qterms AS (
        SELECT doc_id AS query_id, term FROM tf
        WHERE doc_id % 100 = 0
    ),
    pair_scores AS (
        SELECT q.query_id, p.doc_id,
               sum(p.idf * (p.tf * ({BM25_K1} + 1.0))
                   / (p.tf + {BM25_K1} * (1.0 - {BM25_B}
                                          + {BM25_B} * p.dl / s.avgdl))) AS score
        FROM qterms q
        JOIN postings p ON p.term = q.term AND p.doc_id <> q.query_id
        CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    ),
    lex_ranked AS (
        SELECT query_id, doc_id, round(score, 6) AS bm25,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY round(score, 6) DESC, doc_id ASC)
                   AS rank
        FROM pair_scores
    )
"""


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, bm25, rank) for rank <= LEX_K — the Spark twin
    of the lex_ranked CTE."""
    from pyspark.sql import Window

    d = fan_out(load(spark, sf_dir, "documents"), spark)
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.transform(materialize)  # feeds postings AND the query-term side
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    postings = (
        tf.join(dl, "doc_id")
        .join(df_t, "term")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") <= F.col("n_docs") * DF_CAP_FRAC)
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            "avgdl",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
        )
    )
    # Explicit aliases: qterms shares tf's lineage, so unaliased
    # postings.term == qterms.term resolves as a trivially-true self
    # reference (Spark warns and guesses; the guess happened to be right).
    po = postings.alias("po")
    qt = tf.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("term").alias("qterm")
    ).alias("qt")
    contrib = F.col("po.idf") * (F.col("po.tf") * (BM25_K1 + 1.0)) / (
        F.col("po.tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("po.dl") / F.col("po.avgdl"))
    )
    pair_scores = (
        po.join(
            F.broadcast(qt),
            (F.col("po.term") == F.col("qt.qterm"))
            & (F.col("po.doc_id") != F.col("qt.query_id")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        pair_scores.select(
            "query_id", "doc_id", F.round("score", 6).alias("bm25")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= LEX_K)
    )


@register(
    "bm25_topk",
    oracle=f"""
        WITH {_BM25_CTES}
        SELECT query_id, doc_id, bm25, CAST(rank AS INT) AS rank
        FROM lex_ranked WHERE rank <= {LEX_K}
    """,
    doc=f"BM25 lexical retrieval (k1={BM25_K1}, b={BM25_B}): each query "
        "document's term set scores the corpus through a posting-list "
        f"join, terms in >{int(DF_CAP_FRAC * 100)}% of docs skipped as "
        f"stopwords; top-{LEX_K} per query ranked on the rounded score "
        "(6 dp) with doc_id tiebreak so ranks are engine-exact.",
    scale_notes="The retrieval shape that serves at corpus scale: tf/df "
                "are one-shuffle aggregates, the score join shuffles on "
                "TERM (posting lists meet query terms where they live, "
                "the inverted_index pattern) and the df cap bounds the "
                "worst posting list — stopword postings, the classic "
                "skew source, never enter the join. Query terms "
                "broadcast; per-query ranking is a windowed top-k over "
                "candidates that matched at least one term, a tiny "
                "fraction of the corpus.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _bm25_ranked(spark, sf_dir)
    return out.select(
        "query_id", "doc_id", "bm25", F.col("rank").cast("int").alias("rank")
    )


def _hybrid_oracle() -> str:
    from pubsub2bq_spark.registry import _REGISTRY

    vec = _REGISTRY["similarity_topk"].oracle
    return f"""
        WITH {_BM25_CTES},
        lex AS (
            SELECT query_id, doc_id, rank FROM lex_ranked WHERE rank <= {LEX_K}
        ),
        vec AS (
            SELECT query_id, vec_id AS doc_id, rank FROM ({vec})
        ),
        fused AS (
            SELECT coalesce(l.query_id, v.query_id) AS query_id,
                   coalesce(l.doc_id, v.doc_id) AS doc_id,
                   round(coalesce(1.0 / ({RRF_C} + l.rank), 0)
                         + coalesce(1.0 / ({RRF_C} + v.rank), 0), 6) AS rrf,
                   (l.rank IS NOT NULL) AS in_lexical,
                   (v.rank IS NOT NULL) AS in_vector
            FROM lex l
            FULL JOIN vec v ON l.query_id = v.query_id AND l.doc_id = v.doc_id
        )
        SELECT query_id, doc_id, rrf, in_lexical, in_vector,
               CAST(rank AS INT) AS rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY rrf DESC, doc_id ASC) AS rank
            FROM fused
        )
        WHERE rank <= {FUSE_K}
    """


@register(
    "hybrid_retrieve",
    oracle=None,  # composed from similarity_topk's oracle below
    doc=f"Hybrid lexical+vector retrieval via Reciprocal Rank Fusion: "
        f"BM25 top-{LEX_K} and cosine top-10 (similarity_topk) full-outer "
        f"join per (query, doc); rrf = Σ 1/({RRF_C}+rank) over the legs a "
        f"doc appears in; top-{FUSE_K} fused per query with provenance "
        "flags. Rank-based fusion sidesteps score-scale mismatch between "
        "the legs — the reason RRF is the default hybrid in production "
        "search.",
    scale_notes="Each leg is already a per-query top-k (queries x k "
                "rows), so the fusion join, scoring, and re-rank all "
                "happen on k-sized relations — the corpus is touched "
                "only inside the legs, each with its own scale path "
                "(posting-list join; ANN index). Legs run independently "
                "and in parallel; fusion adds no corpus-sized shuffle.",
)
def hybrid_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fused_candidates(spark, sf_dir)


def _fused_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached fused top-FUSE_K candidate set (r10, the shared-
    artifact pattern): hybrid_retrieve IS this relation and rerank_topk
    re-scores it, so the BM25 + dense + RRF fusion chain — a
    deterministic function of sf_dir — builds once per (session, sf)
    instead of once per consumer."""
    from pubsub2bq_spark.tables import session_artifact

    return session_artifact(
        spark,
        "hybrid_fused",
        sf_dir,
        lambda: materialize(_fused_candidates_impl(spark, sf_dir)),
    )


def _fused_candidates_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pubsub2bq_spark.operators.llm_similarity import similarity_topk

    lex = _bm25_ranked(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    vec = similarity_topk(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("vec_rank")
    )
    fused = (
        lex.join(vec, ["query_id", "doc_id"], "full")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_C + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_C + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.col("lex_rank").isNotNull().alias("in_lexical"),
            F.col("vec_rank").isNotNull().alias("in_vector"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= FUSE_K)
        .select(
            "query_id", "doc_id", "rrf", "in_lexical", "in_vector",
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "rerank_topk",
    oracle=None,  # composed from hybrid_retrieve's oracle below
    doc=f"Cross-encoder-style rerank over hybrid_retrieve's fused "
        f"top-{FUSE_K}: each (query, candidate) PAIR is re-scored "
        "jointly — ce_score = ½·token-set Jaccard + ½·query-term "
        "coverage, the deterministic stand-in for a cross-encoder's "
        "joint relevance head (the legs score query and doc "
        "separately; this stage sees the pair) — and candidates "
        "re-ranked on (ce_score desc, rrf desc, doc_id). Output keeps "
        "the fused rank as prev_rank so rank movement is auditable.",
    scale_notes="The retrieve-then-rerank shape that makes cross-"
                "encoders affordable in production: the expensive "
                f"pairwise scorer touches only queries × {FUSE_K} "
                "candidate pairs, never the corpus. The candidate list "
                "broadcasts into the term joins (query-term expansion "
                "is |cand| × query length, then one (doc_id, term)-"
                "keyed join against the distinct-term relation); a "
                "learned cross-encoder swaps the lexical formula for a "
                "Pandas-UDF batch over the same bounded pair relation.",
)
def rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cand = _fused_candidates(spark, sf_dir).select(
        "query_id", "doc_id", "rrf", F.col("rank").alias("prev_rank")
    )  # bounded (queries x FUSE_K), already session-materialized
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    tf = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .distinct()
        .transform(materialize)  # distinct (doc, term); 3 consumers
    )
    tsz = tf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    qterms = tf.select(F.col("doc_id").alias("query_id"), "term")
    inter = (
        F.broadcast(cand.select("query_id", "doc_id"))
        .join(qterms, "query_id")
        .join(tf, ["doc_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    ni = F.coalesce(F.col("ni"), F.lit(0)).cast("double")
    ce = F.round(
        F.coalesce(
            F.lit(0.5) * ni / F.nullif(
                F.col("qsz") + F.col("dsz") - ni, F.lit(0.0)
            )
            + F.lit(0.5) * ni / F.nullif(F.col("qsz").cast("double"), F.lit(0.0)),
            F.lit(0.0),
        ),
        6,
    )
    scored = (
        cand.join(
            F.broadcast(
                tsz.select(F.col("doc_id").alias("query_id"), F.col("sz").alias("qsz"))
            ),
            "query_id",
            "left",
        )
        .join(
            F.broadcast(tsz.select("doc_id", F.col("sz").alias("dsz"))),
            "doc_id",
            "left",
        )
        .join(F.broadcast(inter), ["query_id", "doc_id"], "left")
        .select("query_id", "doc_id", "rrf", "prev_rank", ce.alias("ce_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ce_score").desc(), F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return scored.select(
        "query_id",
        "doc_id",
        "ce_score",
        F.col("prev_rank").cast("int").alias("prev_rank"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def _rerank_oracle() -> str:
    return f"""
        WITH cand AS (
            SELECT query_id, doc_id, rrf, rank AS prev_rank
            FROM ({_hybrid_oracle()})
        ),
        dtf AS (
            SELECT DISTINCT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z]+'),
                       x -> x <> '')) AS term
            FROM documents
        ),
        tsz AS (SELECT doc_id, count(*) AS sz FROM dtf GROUP BY doc_id),
        inter AS (
            SELECT c.query_id, c.doc_id, count(*) AS ni
            FROM cand c
            JOIN dtf tq ON tq.doc_id = c.query_id
            JOIN dtf td ON td.doc_id = c.doc_id AND td.term = tq.term
            GROUP BY c.query_id, c.doc_id
        ),
        scored AS (
            SELECT c.query_id, c.doc_id, c.rrf,
                   CAST(c.prev_rank AS INT) AS prev_rank,
                   round(coalesce(
                       0.5 * CAST(coalesce(i.ni, 0) AS DOUBLE)
                           / nullif(q.sz + d.sz
                                    - CAST(coalesce(i.ni, 0) AS DOUBLE), 0)
                       + 0.5 * CAST(coalesce(i.ni, 0) AS DOUBLE)
                           / nullif(CAST(q.sz AS DOUBLE), 0),
                       0.0), 6) AS ce_score
            FROM cand c
            LEFT JOIN tsz q ON q.doc_id = c.query_id
            LEFT JOIN tsz d ON d.doc_id = c.doc_id
            LEFT JOIN inter i ON i.query_id = c.query_id
                             AND i.doc_id = c.doc_id
        )
        SELECT query_id, doc_id, ce_score, prev_rank,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY ce_score DESC, rrf DESC, doc_id ASC) AS INT)
                   AS rank
        FROM scored
    """


def refresh_hybrid_oracle() -> None:
    # Import for registration side-effect: a direct
    # `import ...operators.retrieval` (tests) must not depend on the
    # registry having loaded llm_similarity first.
    from pubsub2bq_spark.operators import llm_similarity  # noqa: F401
    from pubsub2bq_spark.registry import _REGISTRY

    _REGISTRY["hybrid_retrieve"].oracle = _hybrid_oracle()
    _REGISTRY["rerank_topk"].oracle = _rerank_oracle()


refresh_hybrid_oracle()
