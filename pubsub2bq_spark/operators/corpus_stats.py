"""Corpus-level distribution statistics over `documents`: exact heavy
hitters (frequent terms), per-document token entropy, and per-source
n-gram diversity.

These are the monitoring/quality statistics a pretraining pipeline
computes alongside the cleaning funnel (llm_corpus) and the indexing
stages (text_index): what dominates the token distribution, which
documents are degenerate (low-entropy repetition), and how much lexical
variety each source contributes (reference parity: the pipeline's
query-side aggregation surface, /root/reference/sql/sp_demo_cleanroom.sql,
is GROUP-BY analytics over synced rows — these keys are the same shape
pointed at corpus text).

Everything is built-in-function only: split / explode / two-phase
aggregation; shuffles are keyed on word / doc_id / source, never on
raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load

TOP_K = 25          # heavy_hitters: terms retained
DIVERSITY_GRAM = 3  # ngram_diversity: word-gram width

# Shared tokenization (same split as text_index / unigram_logprob).
_WORDS_SQL = """
    SELECT doc_id, source,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS word
    FROM documents
"""


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    return d.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
            )
        ).alias("word"),
    )


@register(
    "heavy_hitters",
    oracle=f"""
        WITH words AS ({_WORDS_SQL}),
        counts AS (SELECT word, count(*) AS freq FROM words GROUP BY word),
        top AS (
            SELECT word, freq FROM counts
            ORDER BY freq DESC, word LIMIT {TOP_K}
        )
        SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS INT) AS rk,
               word, freq
        FROM top
    """,
    doc=f"Exact heavy hitters: the {TOP_K} most frequent corpus terms with "
        f"rank and count (ties broken lexicographically) — the frequency "
        f"head a tokenizer-vocabulary or stop-word list is built from.",
    scale_notes="Two-phase aggregation: map-side partial counts absorb the "
                "stop-word skew before the single word-keyed shuffle, and "
                "the top-k plans as TakeOrderedAndProject (per-partition "
                "heap + driver merge of k rows), never a global sort. The "
                f"final rank window touches {TOP_K} rows. When even the "
                "exact count map outgrows the cluster (trillions of "
                "distinct terms), the documented relaxation is a count-min "
                "sketch + per-partition heap with identical output schema; "
                "up to billions of terms the exact two-phase agg is the "
                "better plan.",
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), "word").limit(TOP_K)
    # Rank over the TOP_K-row relation via broadcast triangular self-join
    # (rk = 1 + strictly-better rows) — no single-partition WindowExec.
    prior = top.select(F.col("word").alias("pw"), F.col("freq").alias("pf"))
    better = (F.col("pf") > F.col("freq")) | (
        (F.col("pf") == F.col("freq")) & (F.col("pw") < F.col("word"))
    )
    return (
        top.join(F.broadcast(prior), better, "left")
        .groupBy("word", "freq")
        .agg((F.count("pw") + 1).cast("int").alias("rk"))
        .select("rk", "word", "freq")
    )


@register(
    "token_entropy",
    oracle="""
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS word
            FROM documents
        ),
        wc AS (
            SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS c
            FROM words GROUP BY doc_id, word
        ),
        tot AS (
            SELECT doc_id, word, c,
                   sum(c) OVER (PARTITION BY doc_id) AS n
            FROM wc
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT)   AS n_tokens,
               count(*)                 AS n_distinct,
               round(-sum((c / n) * ln(c / n)), 6) AS entropy
        FROM tot
        GROUP BY doc_id
    """,
    doc="Per-document Shannon entropy of the word distribution (nats), "
        "with token and distinct-word counts — the degenerate-repetition "
        "detector: boilerplate and keyword-stuffed documents score far "
        "below natural prose of the same length.",
    scale_notes="groupBy (doc_id, word) then a doc_id window then a doc_id "
                "aggregate: Catalyst plans the window and the final agg in "
                "the SAME hashpartitioning(doc_id) — two exchanges total, "
                "the second moving one row per distinct (doc, word). "
                "Per-document state is bounded by document length, so no "
                "skew hazard; at 100 TB this is a scan + two bounded "
                "shuffles, embarrassingly scalable.",
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = (
        _words(spark, sf_dir)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") / F.col("n")
    return (
        wc.withColumn("n", n)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@register(
    "ngram_diversity",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT source,
                   array_to_string(
                       list_slice(t, CAST(i AS INT),
                                  CAST(i AS INT) + {DIVERSITY_GRAM} - 1),
                       ' ') AS gram
            FROM (
                SELECT source, t,
                       unnest(generate_series(
                           1, greatest(len(t) - {DIVERSITY_GRAM} + 1, 0))) AS i
                FROM toks
            )
        )
        SELECT source,
               count(*)            AS n_grams,
               count(DISTINCT gram) AS n_distinct,
               round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
                   AS diversity
        FROM grams
        GROUP BY source
    """,
    doc=f"Per-source lexical diversity: distinct word {DIVERSITY_GRAM}-grams "
        f"over total {DIVERSITY_GRAM}-gram positions — the corpus-health "
        f"metric that exposes template-generated or self-repeating sources "
        f"(low ratio) before they flood a training mix.",
    scale_notes="Gram generation is a map stage; count-distinct is Spark's "
                "two-phase expand/partial-agg (dedup keyed on (source, "
                "gram) before the source-keyed final shuffle), so the hot "
                "source key never concentrates raw gram traffic on one "
                "reducer. At 100 TB swap gram strings for xxhash64(gram) "
                "so the shuffle moves 8 bytes per position, accepting "
                "hash-collision error ~n²/2⁶⁴.",
)
def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = d.select(
        "source",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
        ).alias("t"),
    )
    n = F.size("t")
    starts = F.when(
        n >= DIVERSITY_GRAM, F.sequence(F.lit(1), n - (DIVERSITY_GRAM - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.array_join(F.slice(F.col("t"), F.col("i"), DIVERSITY_GRAM), " ")
    grams = (
        toks.select("source", "t", F.explode(starts).alias("i"))
        .select("source", gram.alias("gram"))
    )
    return grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("gram").alias("n_distinct"),
        F.round(
            F.countDistinct("gram").cast("double") / F.count(F.lit(1)), 6
        ).alias("diversity"),
    )


VOCAB_SIZE = 1000  # vocab_coverage: retained vocabulary entries


@register(
    "vocab_coverage",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS word
            FROM documents
        ),
        counts AS (SELECT word, count(*) AS freq FROM words GROUP BY word),
        vocab AS (
            SELECT word FROM counts ORDER BY freq DESC, word LIMIT {VOCAB_SIZE}
        ),
        per_doc AS (
            SELECT w.doc_id, w.lang, count(*) AS n_tok,
                   count(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov
            FROM words w LEFT JOIN vocab v USING (word)
            GROUP BY 1, 2
        )
        SELECT lang,
               count(*) AS n_docs,
               round(avg(n_oov * 1.0 / n_tok), 6) AS avg_oov_rate,
               round(max(n_oov * 1.0 / n_tok), 6) AS max_oov_rate
        FROM per_doc GROUP BY lang
    """,
    doc=f"Vocabulary coverage: build the top-{VOCAB_SIZE} corpus vocabulary "
        "(frequency head, lexicographic tiebreak — heavy_hitters at vocab "
        "scale), then score every document's out-of-vocabulary token rate "
        "and aggregate per language. The tokenizer-fit check a pipeline "
        "runs before committing to a vocab: a language whose avg OOV rate "
        "is high is underserved by the proposed vocabulary.",
    scale_notes="Vocab build is the two-phase word count with a "
                "TakeOrderedAndProject head — never a global sort; the "
                "membership probe broadcasts the vocab (KBs) so the OOV "
                "join is map-side with zero extra shuffle. Total "
                "exchanges: word-count agg + per-doc agg + lang agg, each "
                "partial-combined. At 100 TB the vocab build runs once "
                "and persists; scoring new corpus slices is then one "
                "broadcast probe + two aggs.",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
            )
        ).alias("word"),
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    vocab = (
        counts.orderBy(F.col("freq").desc(), "word")
        .limit(VOCAB_SIZE)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )
    oov = F.col("n_oov") / F.col("n_tok")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(oov), 6).alias("avg_oov_rate"),
        F.round(F.max(oov), 6).alias("max_oov_rate"),
    )


@register(
    "dataset_card",
    oracle="""
        WITH hashed AS (
            SELECT lang, source, len(text) AS n_chars,
                   count(*) OVER (PARTITION BY md5(lower(text))) > 1 AS is_dup
            FROM documents
        )
        SELECT coalesce(lang, '<all>') AS lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 4) AS avg_chars,
               round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
               count(DISTINCT source) AS n_sources,
               round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                   AS dup_rate
        FROM hashed
        GROUP BY GROUPING SETS ((lang), ())
    """,
    doc="Dataset card: the per-language + overall corpus report a "
        "pipeline publishes with every release — document counts, "
        "character volume, mean/median length, source diversity, and "
        "exact-duplicate rate — computed in one scan (digest dup flags "
        "ride a window, the report is one GROUPING SETS aggregate).",
    scale_notes="One digest-keyed window shuffle (hashes only) + one "
                "grouping-sets agg emitting languages+1 rows; every "
                "column partial-aggregates except the exact median, "
                "whose 100 TB substitute is percentile_approx "
                "(approx_quantiles documents the bound check). This is "
                "the query that runs after every corpus_filter / "
                "incremental_dedup batch to version the dataset card.",
)
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    w = Window.partitionBy(F.md5(F.lower(F.col("text"))))
    hashed = d.select(
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        (F.count(F.lit(1)).over(w) > 1).alias("is_dup"),
    )
    return (
        hashed.groupingSets([["lang"], []], "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.round(
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n_docs",
            "total_chars",
            "avg_chars",
            "p50_chars",
            "n_sources",
            "dup_rate",
        )
    )
