"""Corpus indexing and co-occurrence statistics over `documents`:
an inverted index (term → document-frequency + posting sample) and
PMI-scored word co-occurrence — the text-engine artifacts built
downstream of the cleaning funnel (llm_corpus) before retrieval or
embedding training.

Both stages dedupe to (word, doc) pairs FIRST: multiplicity within a
document is irrelevant to document frequency and to document-level
co-occurrence, and dropping it early is what keeps the pair expansion
bounded."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load, materialize

POSTING_SAMPLE = 20  # doc ids retained per term (lowest-id sample)
PMI_MIN_DF = 20      # vocabulary floor for pair expansion
PMI_MAX_DF = 400     # stop-word ceiling (sf0.001: 500 docs)
PMI_MIN_PAIR = 5     # minimum co-occurrence support

# Shared first stage: distinct (word, doc_id) pairs.
_WORD_DOC_SQL = """
    SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS word
        FROM documents
    )
"""


def _word_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
                )
            ).alias("word"),
        )
        .distinct()
    )


@register(
    "inverted_index",
    oracle=f"""
        WITH wd AS ({_WORD_DOC_SQL})
        SELECT word,
               count(*) AS df,
               array_to_string(
                   list_slice(list(doc_id ORDER BY doc_id), 1, {POSTING_SAMPLE}),
                   ',') AS posting_sample
        FROM wd GROUP BY word
    """,
    doc=f"Inverted index: per term, document frequency and the first "
        f"{POSTING_SAMPLE} posting doc_ids — the retrieval-side artifact "
        f"a search layer consumes.",
    scale_notes="Tokens dedupe to (word, doc) map-side-combinable pairs "
                "before the single word-keyed shuffle; the posting list "
                "is capped so hot terms (stop words) cannot produce "
                "multi-GB aggregation values — full postings at scale go "
                "to a bucketed (word → doc segment) layout instead of "
                "one row per term.",
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    wd = _word_doc(spark, sf_dir)
    return wd.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, POSTING_SAMPLE), ","
        ).alias("posting_sample"),
    )


@register(
    "word_pmi",
    oracle=f"""
        WITH wd AS ({_WORD_DOC_SQL}),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        vocab AS (
            SELECT word, count(*) AS df FROM wd GROUP BY word
            HAVING count(*) BETWEEN {PMI_MIN_DF} AND {PMI_MAX_DF}
        ),
        wdv AS (SELECT wd.doc_id, wd.word, v.df FROM wd JOIN vocab v USING (word)),
        pairs AS (
            SELECT a.word AS word_a, b.word AS word_b,
                   max(a.df) AS df_a, max(b.df) AS df_b,
                   count(*) AS n_pair
            FROM wdv a JOIN wdv b
              ON a.doc_id = b.doc_id AND a.word < b.word
            GROUP BY a.word, b.word
            HAVING count(*) >= {PMI_MIN_PAIR}
        )
        SELECT word_a, word_b, n_pair,
               round(ln(n_pair * n.n_docs / (df_a * df_b)), 6) AS pmi
        FROM pairs CROSS JOIN n
    """,
    doc=f"Document-level pointwise mutual information over word pairs: "
        f"PMI = ln(P(a,b) / P(a)P(b)) for vocabulary terms with df in "
        f"[{PMI_MIN_DF}, {PMI_MAX_DF}] co-occurring in >= {PMI_MIN_PAIR} "
        f"documents — the association statistic behind collocation "
        f"mining and embedding evaluation.",
    scale_notes="The pair expansion is the quadratic hazard; it is gated "
                "TWICE before it happens: multiplicity dedup (word,doc) "
                "and a df-band vocabulary filter that drops both the "
                "singleton tail and the stop-word head. The self-join is "
                "doc_id-keyed (co-partitioned, no broadcast of the "
                "corpus); per-doc cost is O(vocab_words_in_doc²) with "
                "the band keeping that bounded. At 100 TB tighten the "
                "band or add per-doc top-k-by-tf truncation.",
)
def word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    wd = _word_doc(spark, sf_dir).transform(materialize)  # feeds vocab + both join sides
    n_docs = (
        load(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    vocab = (
        wd.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(PMI_MIN_DF, PMI_MAX_DF))
    )
    wdv = wd.join(F.broadcast(vocab), "word")
    a = wdv.select(
        "doc_id", F.col("word").alias("word_a"), F.col("df").alias("dfa")
    )
    b = wdv.select(
        "doc_id", F.col("word").alias("word_b"), F.col("df").alias("dfb")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("word_a") < F.col("word_b"))
        .groupBy("word_a", "word_b")
        .agg(
            F.max("dfa").alias("df_a"),
            F.max("dfb").alias("df_b"),
            F.count(F.lit(1)).alias("n_pair"),
        )
        .filter(F.col("n_pair") >= PMI_MIN_PAIR)
    )
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "word_a",
        "word_b",
        "n_pair",
        F.round(
            F.log(
                F.col("n_pair") * F.col("n_docs") / (F.col("df_a") * F.col("df_b"))
            ),
            6,
        ).alias("pmi"),
    )


@register(
    "bigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        bigrams AS (
            SELECT doc_id,
                   t[CAST(i AS INT)]     AS w1,
                   t[CAST(i AS INT) + 1] AS w2
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
                FROM toks
            )
        ),
        pc AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
        hc AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1),
        v  AS (SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS vsz FROM bigrams)
        SELECT b.doc_id,
               count(*) AS n_bigrams,
               round(avg(-ln((pc.c12 + 1) / (hc.c1 + v.vsz))), 6) AS bigram_nll
        FROM bigrams b
        JOIN pc USING (w1, w2)
        JOIN hc USING (w1)
        CROSS JOIN v
        GROUP BY b.doc_id
    """,
    doc="Bigram language-model scoring: per-document mean negative "
        "log-probability under the corpus bigram model with add-1 "
        "smoothing — the sequence-aware upgrade of unigram_logprob's "
        "quality proxy (high NLL = unnatural word order).",
    scale_notes="Bigram rows are localCheckpointed once and feed the "
                "pair-count aggregate, the history-count aggregate, and "
                "the scoring join — three consumers, one tokenization. "
                "All joins are keyed on (w1,w2)/(w1) (sort-merge, "
                "co-partitionable); the vocabulary size rides a broadcast "
                "scalar. Stop-word bigram skew is absorbed by partial "
                "aggs; at 100 TB hash the grams to int64 first.",
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
        ).alias("t"),
    )
    n = F.size("t")
    starts = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = (
        toks.select("doc_id", "t", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
        )
        .transform(materialize)  # one tokenization feeds three consumers
    )
    pc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    hc = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = bigrams.agg(F.countDistinct("w2").cast("double").alias("vsz"))
    return (
        bigrams.join(pc, ["w1", "w2"])
        .join(hc, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(-F.log((F.col("c12") + 1) / (F.col("c1") + F.col("vsz")))), 6
            ).alias("bigram_nll"),
        )
    )


KN_DISCOUNT = 0.75  # Kneser-Ney absolute discount (the KenLM default)


@register(
    "kneser_ney_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        bigrams AS (
            SELECT doc_id,
                   t[CAST(i AS INT)]     AS w1,
                   t[CAST(i AS INT) + 1] AS w2
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
                FROM toks
            )
        ),
        pc   AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
        hc   AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1),
        n1h  AS (SELECT w1, count(*) AS n1h FROM pc GROUP BY w1),
        cont AS (SELECT w2, count(*) AS cont FROM pc GROUP BY w2),
        bt   AS (SELECT CAST(count(*) AS DOUBLE) AS btypes FROM pc)
        SELECT b.doc_id,
               count(*) AS n_bigrams,
               round(avg(-ln((pc.c12 - {KN_DISCOUNT}) / hc.c1
                             + {KN_DISCOUNT} * n1h.n1h / hc.c1
                               * (cont.cont / bt.btypes))), 6) AS kn_nll
        FROM bigrams b
        JOIN pc   USING (w1, w2)
        JOIN hc   USING (w1)
        JOIN n1h  USING (w1)
        JOIN cont USING (w2)
        CROSS JOIN bt
        GROUP BY b.doc_id
    """,
    doc=f"Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; "
        f"the KenLM/CCNet standard, absolute discount D={KN_DISCOUNT}): "
        "P(w2|w1) = max(c12-D,0)/c1 + D·N1+(w1,·)/c1 · "
        "P_cont(w2), with the continuation probability "
        "N1+(·,w2)/N1+(·,·) — 'how many contexts has w2 followed' "
        "instead of raw frequency, the fix for the 'san FRANCISCO' "
        "over-count that add-one smoothing (bigram_logprob) cannot "
        "express. Per-document mean NLL; every LM bigram is observed "
        "in-corpus (the model is trained on the scored corpus), so the "
        "discounted term is always positive and no unseen-history "
        "backoff path is needed.",
    scale_notes="Token-scale data shuffles EXACTLY ONCE (r11, closing "
                "the r10 bench flag): the exploded bigram stream goes "
                "straight from the scan into a map-side-combined "
                "(doc_id, w1, w2) count — never materialized at token "
                "grain — and every KN statistic (pair counts, history "
                "counts as sum-of-c12, continuations, total types) "
                "rolls up from that per-doc TYPE relation or from pc. "
                "Scoring is one small type-level join chain producing "
                "-ln P per (w1, w2), then one join of the per-doc type "
                "counts against it and a weighted per-doc mean — the "
                "instance-grain relation the old plan shuffled four "
                "times no longer exists. Type joins are keyed on w1 / "
                "(w1,w2) / w2 — sort-merge, co-partitionable; the "
                "type-count scalar is a broadcast. At 100 TB hash the "
                "grams to int64 first (same note as bigram_logprob).",
)
def kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
        ).alias("t"),
    )
    n = F.size("t")
    starts = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = toks.select("doc_id", "t", F.explode(starts).alias("i")).select(
        "doc_id",
        F.element_at("t", F.col("i")).alias("w1"),
        F.element_at("t", F.col("i") + 1).alias("w2"),
    )
    # The ONE token-scale shuffle: per-doc bigram-type counts, partial-
    # aggregated map-side. Feeds both the corpus statistics and the
    # final scoring join.
    per_doc = (
        bigrams.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(materialize)
    )
    pc = (
        per_doc.groupBy("w1", "w2")
        .agg(F.sum("c").alias("c12"))
        .transform(materialize)  # the type relation derives all KN stats
    )
    hc = pc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    n1h = pc.groupBy("w1").agg(F.count(F.lit(1)).alias("n1h"))
    cont = pc.groupBy("w2").agg(F.count(F.lit(1)).alias("cont"))
    bt = pc.agg(F.count(F.lit(1)).cast("double").alias("btypes"))
    d_ = F.lit(KN_DISCOUNT)
    p_kn = (F.col("c12") - d_) / F.col("c1") + d_ * F.col("n1h") / F.col(
        "c1"
    ) * (F.col("cont") / F.col("btypes"))
    score = (
        pc.join(hc, ["w1"])
        .join(n1h, ["w1"])
        .join(cont, ["w2"])
        .crossJoin(F.broadcast(bt))
        .select("w1", "w2", (-F.log(p_kn)).alias("t_nll"))
    )
    return (
        per_doc.join(score, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(
                F.sum(F.col("c") * F.col("t_nll")) / F.sum("c"), 6
            ).alias("kn_nll"),
        )
    )
