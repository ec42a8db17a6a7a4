"""Text-analysis operators over `documents`: SURVEY.md §2.10 (U7) +
the training-data-pipeline text suite (lang-ID, quality score, token
count, fingerprinting).

Everything is built-in-function only (split/regexp/aggregate —
JVM-side, codegen'd): at 100 TB these run as pure map stages over the
document scan, with the single shuffle belonging to the final
aggregation where one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load, materialize

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID. Deliberately small + deterministic (no external models).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "las", "una"],
}


@register(
    "word_count",
    oracle="""
        SELECT word, count(*) AS n
        FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    """,
    doc="Tokenize → explode → count: the canonical text aggregation (U7).",
    scale_notes="split+explode are codegen'd; the count shuffles once with "
                "map-side partial aggregation. Word-frequency skew (stop "
                "words) is absorbed by partial aggs.",
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


@register(
    "token_count",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                    AS INTEGER)                                             AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
                    AS INTEGER)                                             AS bpe_ish_tokens,
               n_chars
        FROM documents
    """,
    doc="Token counting: whitespace tokens + a BPE-ish regex segmentation "
        "(letter runs / single digits / single punctuation).",
    scale_notes="regexp_extract_all + size stays in the JVM — no Python "
                "tokenizer in the hot path.",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_ish_tokens"),
        "n_chars",
    )


@register(
    "quality_score",
    oracle="""
        SELECT doc_id,
               length(text)                                                  AS n_chars_exact,
               CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                    AS INTEGER)                                              AS n_tokens,
               round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1), 6)                         AS punct_ratio,
               round(CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1), 6)                         AS vowel_ratio,
               (length(text) BETWEEN 100 AND 20000)                          AS len_ok
        FROM documents
    """,
    doc="Document quality scoring: length, punctuation ratio, vowel ratio, "
        "length-window flag — the cheap heuristics a pretraining filter runs "
        "before expensive model-based scoring.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    n = F.length("text")
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    vowels = F.length(F.regexp_replace(F.lower(F.col("text")), r"[^aeiou]", ""))
    return d.select(
        "doc_id",
        n.alias("n_chars_exact"),
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")).alias("n_tokens"),
        F.round(punct.cast("double") / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(vowels.cast("double") / F.greatest(n, F.lit(1)), 6).alias("vowel_ratio"),
        n.between(100, 20000).alias("len_ok"),
    )


def _marker_count_spark(col, words: list[str]):
    """# of marker-word hits in the token array (JVM-side)."""
    tokens = F.split(F.lower(col), "[^a-z]+")
    return F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in words])))


@register(
    "lang_id",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_intersect(string_split_regex(lower(text), '[^a-z]+'),
                       {_LANG_MARKERS['en']!r})) AS score_en,
                   len(list_intersect(string_split_regex(lower(text), '[^a-z]+'),
                       {_LANG_MARKERS['de']!r})) AS score_de,
                   len(list_intersect(string_split_regex(lower(text), '[^a-z]+'),
                       {_LANG_MARKERS['fr']!r})) AS score_fr,
                   len(list_intersect(string_split_regex(lower(text), '[^a-z]+'),
                       {_LANG_MARKERS['es']!r})) AS score_es
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN score_en >= score_de AND score_en >= score_fr
                         AND score_en >= score_es AND score_en > 0 THEN 'en'
                    WHEN score_de >= score_fr AND score_de >= score_es
                         AND score_de > 0 THEN 'de'
                    WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
                    WHEN score_es > 0 THEN 'es'
                    ELSE 'unknown' END AS pred_lang
        FROM scored
    """,
    doc="Language ID via stopword-marker voting (deterministic n-gram "
        "heuristic; no external model). Output keeps the table's `lang` "
        "column so accuracy is inspectable.",
    scale_notes="array_intersect against tiny literal arrays — map-only; "
                "distinct-token dedup inside intersect keeps scores "
                "set-based on both engines.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    scores = {k: _marker_count_spark(F.col("text"), v) for k, v in _LANG_MARKERS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] > 0),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]) & (scores["de"] > 0), "de")
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] > 0), "fr")
        .when(scores["es"] > 0, "es")
        .otherwise("unknown")
    )
    return d.select("doc_id", "lang", pred.alias("pred_lang"))


# Rolling-fingerprint parameters: 8-char grams sampled every 4th position
# (winnowing-style stride bounds work per document), fingerprint = the 4
# smallest gram hashes.
FP_GRAM = 8
FP_STRIDE = 4
FP_KEEP = 4


@register(
    "doc_fingerprint",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   md5(substr(lower(text), CAST(i AS INT), {FP_GRAM})) AS h
            FROM documents,
                 unnest(range(1, greatest(len(text) - {FP_GRAM} + 2, 2),
                              {FP_STRIDE})) AS t(i)
        )
        SELECT doc_id,
               array_to_string(list_sort(list(h))[1:{FP_KEEP}], '|') AS fingerprint,
               count(*) AS n_grams
        FROM grams
        GROUP BY doc_id
    """,
    doc=f"Document fingerprinting via rolling character {FP_GRAM}-grams "
        f"(stride {FP_STRIDE}): hash every sampled gram, keep the {FP_KEEP} "
        "lexicographically smallest (winnowing-style min-k sketch). Equal "
        "fingerprints ⇒ near-identical documents; md5 keeps the sketch "
        "engine-portable.",
    scale_notes="Entirely map-side: the gram hashes are built per row with "
                "transform() over a position sequence, sorted, and truncated "
                "to the min-k sketch inside one projection — NO explode, NO "
                "shuffle, document bodies never leave the scan task. The "
                "per-document sketch is the textbook embarrassingly-parallel "
                "100 TB pass.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    return fingerprint_sketch(d)


def fingerprint_sketch(d: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *keep, fingerprint, n_grams) min-k gram sketch — the
    shared primitive behind `doc_fingerprint`, `contamination_check`,
    and `corpus_filter`. Map-only: carrying extra columns through the
    projection is free and avoids a doc_id join to recover them."""
    # Project lowered text once so the transform() lambda binds a plain
    # column reference (not a recomputed lower() per element).
    low = d.select("doc_id", *keep, F.lower(F.col("text")).alias("t"))
    positions = F.sequence(
        F.lit(1),
        # DuckDB's range() upper bound is exclusive; sequence() is
        # inclusive, so stop one position earlier: len - (GRAM-1).
        F.greatest(F.length("t") - F.lit(FP_GRAM - 1), F.lit(1)),
        F.lit(FP_STRIDE),
    )
    grams = low.select(
        "doc_id",
        *keep,
        F.transform(
            positions, lambda i: F.md5(F.substr(F.col("t"), i, F.lit(FP_GRAM)))
        ).alias("hs"),
    )
    return grams.select(
        "doc_id",
        *keep,
        F.concat_ws("|", F.slice(F.array_sort(F.col("hs")), 1, FP_KEEP)).alias(
            "fingerprint"
        ),
        F.size("hs").cast("bigint").alias("n_grams"),
    )


@register(
    "hash_split",
    oracle="""
        WITH assigned AS (
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c'
                             THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e'
                             THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT split, count(*) AS n_docs,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM assigned GROUP BY split
    """,
    doc="Deterministic train/val/test assignment by content-independent "
        "hash bucket: first hex nibble of md5(doc_id) → 13/2/1 of 16 "
        "(~81%/12%/6%). Hash-based splitting is how a training pipeline "
        "keeps membership stable across reruns and joins — no RNG state, "
        "no ordering dependence.",
    scale_notes="Map-only assignment (md5 + string compare per row), then "
                "a 3-group aggregate: the shuffle carries three rows per "
                "task. Membership is a pure function of the key, so any "
                "downstream stage can recompute it instead of joining a "
                "split table — at 100 TB that deletes an entire fact-fact "
                "join from the DAG.",
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib <= "c", "train").when(nib <= "e", "val").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "stratified_sample",
    oracle="""
        WITH tagged AS (
            SELECT event_type,
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 1) <=
                       CASE event_type WHEN 'click' THEN '3'
                                       WHEN 'view'  THEN '7'
                                       ELSE 'f' END AS kept
            FROM events
        )
        SELECT event_type,
               count(*) AS n_total,
               CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM tagged GROUP BY event_type
    """,
    doc="Deterministic stratified downsampling: per-class keep rates via "
        "md5 hash-bucket thresholds (clicks ~4/16, views ~8/16, rare "
        "classes kept whole) — how a training pipeline rebalances skewed "
        "event classes without RNG state, reproducibly across reruns.",
    scale_notes="Map-only membership (hash + threshold compare per row), "
                "then a classes-sized aggregate. Like hash_split, "
                "membership is a pure function of the key: downstream "
                "stages recompute the predicate instead of joining a "
                "sample-membership table, and changing a keep rate is a "
                "constant edit, not a re-materialization.",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import load as _load

    e = _load(spark, sf_dir, "events")
    nib = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    threshold = (
        F.when(F.col("event_type") == "click", "3")
        .when(F.col("event_type") == "view", "7")
        .otherwise("f")
    )
    return (
        e.select("event_type", (nib <= threshold).alias("kept"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        )
    )


TFIDF_TOP_K = 3


@register(
    "tfidf_topterms",
    # Scores are rounded to 6dp BEFORE ranking on BOTH engines, with the
    # term as tiebreak — sub-rounding float noise (ln() last-ulp, sum
    # order) can therefore never flip the selected top-k set.
    oracle=f"""
        WITH tf AS (
            SELECT doc_id, word, count(*) AS cnt
            FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                          x -> x <> '')) AS word
                FROM documents
            ) GROUP BY doc_id, word
        ),
        dl AS (SELECT doc_id, sum(cnt) AS doc_len FROM tf GROUP BY doc_id),
        df AS (SELECT word, count(*) AS n_docs FROM tf GROUP BY word),
        -- N = docs with >=1 token (matches the Spark side, which derives
        -- it from the tokenized relation; an all-punctuation doc is
        -- outside the tf-idf universe on both engines)
        n AS (SELECT count(*) AS n_total FROM dl),
        scored AS (
            SELECT tf.doc_id, tf.word,
                   round((CAST(cnt AS DOUBLE) / doc_len)
                         * (ln((n_total + 1.0) / (n_docs + 1.0)) + 1.0), 6)
                       AS tfidf
            FROM tf JOIN dl USING (doc_id) JOIN df USING (word), n
        )
        SELECT doc_id, word, tfidf, CAST(rn AS INTEGER) AS rn
        FROM (
            SELECT doc_id, word, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, word ASC) AS rn
            FROM scored
        )
        WHERE rn <= {TFIDF_TOP_K}
    """,
    doc=f"TF-IDF top-{TFIDF_TOP_K} terms per document (smoothed idf = "
        "ln((N+1)/(df+1))+1): the keyword-extraction pass of a corpus "
        "indexing pipeline.",
    scale_notes="Three keyed aggregates (doc-term counts, doc lengths, "
                "document frequencies) + one term-keyed join back; the "
                "corpus size N is a one-row broadcast. Stop-word df skew "
                "is absorbed by map-side partial counts; the per-doc "
                "top-k is WindowGroupLimit-prunable.",
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("word"),
    )
    # tf has THREE consumers (doc lengths, document frequencies, scoring):
    # materialize it once or Spark re-runs the explode+count per consumer
    # (plan audit: 4 document scans without this, 1 with).
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt")) \
        .transform(materialize)
    dl = tf.groupBy("doc_id").agg(F.sum("cnt").alias("doc_len"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("n_docs"))
    # corpus size from the checkpointed relation — no extra table scan
    n = dl.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tf.join(dl, "doc_id")
        .join(df, "word")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                (F.col("cnt").cast("double") / F.col("doc_len"))
                * (F.log((F.col("n_total") + 1.0) / (F.col("n_docs") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .select("doc_id", "word", "tfidf", "rn")
    )


@register(
    "unigram_logprob",
    oracle="""
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS word
            FROM documents
        ),
        freq AS (SELECT word, count(*) AS cnt FROM words GROUP BY word),
        tot AS (SELECT sum(cnt) AS total FROM freq)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 6) AS avg_neg_logprob
        FROM words JOIN freq USING (word), tot
        GROUP BY doc_id
    """,
    doc="Unigram language-model scoring: each document's average negative "
        "log-probability under the corpus unigram distribution — the "
        "cheap KenLM-style perplexity proxy a pretraining pipeline uses "
        "to rank text quality before model-based filters.",
    scale_notes="The unigram table is a term-keyed aggregate (vocabulary-"
                "cardinality — small); scoring joins it back on the term "
                "key. At 100 TB the frequency table is the artifact you "
                "materialize once and broadcast if vocabulary-sized; the "
                "6dp rounding absorbs summation-order noise in the avg.",
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("word"),
    )
    # vocabulary-cardinality — materialized so its two consumers (the
    # scalar total and the scoring join) don't each re-run the explode
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).transform(materialize)
    tot = freq.agg(F.sum("cnt").alias("total"))
    return (
        words.join(freq, "word")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("cnt").cast("double") / F.col("total"))), 6
            ).alias("avg_neg_logprob"),
        )
    )
