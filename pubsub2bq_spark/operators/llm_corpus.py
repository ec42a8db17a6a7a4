"""Corpus-hygiene operators for a pretraining data pipeline:
train/test contamination detection, PII scrubbing, repetition
filtering, and the composed C4-style cleaning funnel.

These extend the text suite (`llm_text.py`) with the cross-document
and compliance passes a 100 TB corpus build runs between ingestion
and tokenization. Everything stays JVM-side (split / regexp /
higher-order array functions); the only shuffles are the keyed joins
and aggregates each docstring calls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.operators.llm_text import (
    FP_GRAM,
    FP_KEEP,
    FP_STRIDE,
    fingerprint_sketch,
)
from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load, materialize

# DuckDB twin of llm_text.fingerprint_sketch — shared by the oracles
# below so the sketch definition can't drift between operators.
_FP_CTE = f"""
        grams AS (
            SELECT doc_id,
                   md5(substr(lower(text), CAST(i AS INT), {FP_GRAM})) AS h
            FROM documents,
                 unnest(range(1, greatest(len(text) - {FP_GRAM} + 2, 2),
                              {FP_STRIDE})) AS t(i)
        ),
        fp AS (
            SELECT doc_id,
                   array_to_string(list_sort(list(h))[1:{FP_KEEP}], '|') AS fingerprint
            FROM grams GROUP BY doc_id
        )
"""

# hash_split's deterministic split assignment (first md5 nibble of the
# doc_id: 13/2/1 of 16) — restated here for the contamination check.
_SPLIT_SQL = """
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'e' THEN 'val'
             ELSE 'test' END
"""


def _split_col():
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return F.when(nib <= "c", "train").when(nib <= "e", "val").otherwise("test")


@register(
    "contamination_check",
    oracle=f"""
        WITH {_FP_CTE},
        tagged AS (
            SELECT doc_id, fingerprint, {_SPLIT_SQL} AS split FROM fp
        ),
        train_fp AS (
            SELECT fingerprint, count(*) AS n_train_matches
            FROM tagged WHERE split = 'train' GROUP BY fingerprint
        )
        SELECT doc_id, fingerprint, n_train_matches
        FROM tagged JOIN train_fp USING (fingerprint)
        WHERE split = 'test'
    """,
    doc="Train/test contamination detection: test-split documents whose "
        "min-k gram fingerprint (doc_fingerprint's sketch) also appears in "
        "the train split — the eval-integrity check every pretraining "
        "pipeline runs before publishing a benchmark split.",
    scale_notes="Sketching is map-only; the membership test is an "
                "equi-join keyed on the fingerprint, both sides pre-"
                "aggregated, so the shuffle carries one short hash string "
                "per document — never the text. Near-uniform fingerprints "
                "hash-partition evenly; a degenerate corpus (one dominant "
                "boilerplate fingerprint) surfaces as one hot key and is "
                "exactly the doc group you want flagged anyway.",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    # One sketching pass (gram hashing is the operator's CPU cost) serves
    # both the train and test consumers.
    tagged = fingerprint_sketch(d).select(
        "doc_id", "fingerprint", _split_col().alias("split")
    ).transform(materialize)
    train_fp = (
        tagged.filter(F.col("split") == "train")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_train_matches"))
    )
    return (
        tagged.filter(F.col("split") == "test")
        .join(train_fp, "fingerprint")
        .select("doc_id", "fingerprint", "n_train_matches")
    )


# PII regexes, identical byte-for-byte on both engines (the subset of
# regex syntax Java and RE2/DuckDB agree on: no lookaround, no \d
# shorthand inside classes).
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
_PHONE_RE = r"\+1-555-[0-9][0-9][0-9][0-9]"
_SSN_RE = r"[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]"


@register(
    "pii_scrub",
    oracle=f"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' Contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' SSN 123-45-6789.' AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
               CAST(len(regexp_extract_all(t, '{_SSN_RE}'))   AS INTEGER) AS n_ssns,
               md5(regexp_replace(regexp_replace(regexp_replace(t,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_SSN_RE}', '<SSN>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'))                        AS scrubbed_md5
        FROM injected
    """,
    doc="PII scrubbing: regex redaction of emails / phone numbers / SSNs "
        "to typed placeholders, with per-document redaction counts. The "
        "synthetic corpus contains no PII, so a deterministic PII suffix "
        "derived from doc_id is injected first — the redaction plumbing "
        "(patterns, ordering, counting) is the operator under test; the "
        "scrubbed-text md5 proves byte-exact output parity.",
    scale_notes="Pure map stage: three regexp_replace passes fused into "
                "one codegen'd projection, no Python, no shuffle at all. "
                "At 100 TB this is scan-bound; pattern count grows the "
                "per-row constant, not the data moved. SSN is scrubbed "
                "before phone so the narrower pattern can't be shadowed.",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    t = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" SSN 123-45-6789."),
    )
    injected = d.select("doc_id", t.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _SSN_RE,
            "<SSN>",
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return injected.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_SSN_RE), 0)).alias("n_ssns"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "repetition_filter",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        stats AS (
            SELECT doc_id,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_distinct,
                   list_transform(range(1, len(t)),
                                  i -> t[i] || ' ' || t[i + 1]) AS bigrams
            FROM toks
        )
        SELECT doc_id,
               CAST(n_tokens AS INTEGER)   AS n_tokens,
               CAST(n_distinct AS INTEGER) AS n_distinct,
               round(CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1), 6)
                                           AS distinct_ratio,
               round(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                     / greatest(len(bigrams), 1), 6) AS bigram_dup_ratio,
               (CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1) < 0.45
                OR 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                   / greatest(len(bigrams), 1) > 0.5) AS is_repetitive
        FROM stats
    """,
    doc="Repetition filtering: per-document distinct-token ratio and "
        "duplicate-bigram ratio, flagging boilerplate/degenerate documents "
        "(the 'repeated line' heuristic from C4/Gopher-style cleaning, "
        "adapted to single-line synthetic docs via token n-grams).",
    scale_notes="Map-only: tokenization, bigram construction (transform "
                "over an index sequence — no explode), and both distinct "
                "ratios happen inside one projection per row. Document "
                "text never shuffles; the operator output is a fixed-width "
                "stats row per doc.",
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("t"),
    )
    n = F.size("t")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(F.col("t"), i), F.lit(" "), F.element_at(F.col("t"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = toks.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        bigrams.alias("bigrams"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.greatest(
        F.col("n_tokens"), F.lit(1)
    )
    bigram_dup = 1.0 - F.size(F.array_distinct("bigrams")).cast("double") / F.greatest(
        F.size("bigrams"), F.lit(1)
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(bigram_dup, 6).alias("bigram_dup_ratio"),
        ((distinct_ratio < 0.45) | (bigram_dup > 0.5)).alias("is_repetitive"),
    )


@register(
    "corpus_filter",
    oracle=f"""
        WITH {_FP_CTE},
        flags AS (
            SELECT d.doc_id, lang,
                   (length(text) BETWEEN 100 AND 20000) AND
                   (CAST(len(list_distinct(list_filter(
                        string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x <> ''))) AS DOUBLE)
                    / greatest(len(list_filter(
                        string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x <> '')), 1) >= 0.3) AS quality_ok,
                   fingerprint
            FROM documents d JOIN fp ON d.doc_id = fp.doc_id
        ),
        kept AS (
            SELECT doc_id, lang, quality_ok,
                   quality_ok AND row_number() OVER (
                       PARTITION BY fingerprint, quality_ok ORDER BY doc_id
                   ) = 1 AS is_kept
            FROM flags
        )
        SELECT lang,
               count(*) AS n_raw,
               CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM kept
        GROUP BY lang
        ORDER BY lang
    """,
    doc="The composed C4-style cleaning funnel: length window + "
        "repetition gate (quality), then near-dup removal by fingerprint "
        "keeping the lowest doc_id, reported as a per-language funnel "
        "(raw → quality → kept). One key that chains the text suite the "
        "way a real corpus build does.",
    scale_notes="Quality flags and the sketch are one map pass over the "
                "scan; canonical-member selection is a single window "
                "shuffle keyed on the fingerprint (short hash, not text); "
                "the funnel aggregate reduces to languages-cardinality "
                "rows. Three stages, one data-sized shuffle total.",
)
def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    quality_ok = F.length("text").between(100, 20000) & (
        F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(F.size(toks), F.lit(1))
        >= 0.3
    )
    flags = fingerprint_sketch(
        d.withColumn("quality_ok", quality_ok), keep=("lang", "quality_ok")
    )
    w = Window.partitionBy("fingerprint", "quality_ok").orderBy("doc_id")
    kept = flags.withColumn(
        "is_kept", F.col("quality_ok") & (F.row_number().over(w) == 1)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("quality_ok"), 1).otherwise(0)).alias("n_quality"),
            F.sum(F.when(F.col("is_kept"), 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("lang")
    )


@register(
    "incremental_dedup",
    oracle="""
        WITH hashed AS (
            SELECT doc_id, md5(lower(text)) AS text_hash,
                   (doc_id % 3 = 0) AS is_incoming
            FROM documents
        ),
        index_hashes AS (
            SELECT DISTINCT text_hash FROM hashed WHERE NOT is_incoming
        ),
        batch AS (
            SELECT h.doc_id, h.text_hash,
                   (i.text_hash IS NOT NULL) AS hit_index,
                   row_number() OVER (PARTITION BY h.text_hash
                                      ORDER BY h.doc_id) AS rn
            FROM hashed h
            LEFT JOIN index_hashes i USING (text_hash)
            WHERE h.is_incoming
        )
        SELECT doc_id, text_hash,
               CASE WHEN hit_index THEN 'dup_vs_index'
                    WHEN rn > 1    THEN 'dup_in_batch'
                    ELSE 'new' END AS verdict
        FROM batch
    """,
    doc="Incremental (continuous-ingest) dedup: an incoming batch of "
        "documents (doc_id % 3 = 0) is checked against the digest index "
        "of the already-accepted corpus (the rest) AND against itself — "
        "each batch doc is verdict-tagged new / dup_vs_index / "
        "dup_in_batch (first-wins within the batch). This is the steady-"
        "state shape of corpus dedup after the initial build: batches "
        "arrive forever, the historical index only grows.",
    scale_notes="The corpus side reduces to a distinct-digest index "
                "BEFORE the join, so the big side of the digest-keyed "
                "equi-join carries one 32-char hash per historical "
                "document and no text; the batch side is the small, "
                "arriving increment. In production the index is a "
                "digest-bucketed table maintained as accepted docs land "
                "— the join co-locates on the bucket key with zero "
                "index re-shuffle, and the within-batch window shuffles "
                "only the batch. Nothing ever rescans historical text.",
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    hashed = d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("text_hash"),
        (F.col("doc_id") % 3 == 0).alias("is_incoming"),
    )
    # The historical index: distinct digests only — at scale this is a
    # maintained bucketed table, not a recomputation (see scale_notes).
    index_hashes = (
        hashed.filter(~F.col("is_incoming")).select("text_hash").distinct()
        .withColumn("hit_index", F.lit(True))
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    batch = (
        hashed.filter("is_incoming")
        .join(index_hashes, "text_hash", "left")
        .withColumn("rn", F.row_number().over(w))
    )
    return batch.select(
        "doc_id",
        "text_hash",
        F.when(F.col("hit_index"), "dup_vs_index")
        .when(F.col("rn") > 1, "dup_in_batch")
        .otherwise("new")
        .alias("verdict"),
    )


# --- n-gram decontamination under the learned tokenizer (VERDICT r7 #6b)
# GPT-3 appendix-C / PaLM-style dataset decontamination: a TRAIN-split
# document is contaminated when it shares an N-token n-gram with any
# eval-split document — measured in the tokens the model actually
# consumes (bpe_train's learned vocab), not characters, so a paraphrase
# that re-wraps the same token span is still caught while
# contamination_check's whole-doc fingerprint would miss it.
DECON_GRAM = 5  # tokens per contamination n-gram


def _decontaminate_oracle() -> str:
    from pubsub2bq_spark.operators.training_prep import (
        BPE_TRAIN_ROUNDS,
        _bpe_round_sql,
    )

    rounds = ",".join(_bpe_round_sql(r) for r in range(1, BPE_TRAIN_ROUNDS + 1))
    gram = " || '|' || ".join(
        ["piece"]
        + [f"lead(piece, {k}) OVER w" for k in range(1, DECON_GRAM)]
    )
    return f"""
        WITH docwp AS (
            SELECT doc_id, CAST(t.i AS BIGINT) AS wpos, toks[i] AS word
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                     x -> x <> '') AS toks
                  FROM documents),
                 unnest(range(1, len(toks) + 1)) AS t(i)
        ),
        seg0 AS (
            SELECT regexp_replace(word, '(.)', '/\\1/', 'g') AS seg,
                   count(*) AS n
            FROM (SELECT word FROM docwp)
            GROUP BY 1
        ),
        {rounds},
        vocabp AS (
            SELECT regexp_replace(seg, '/', '', 'g') AS word,
                   string_split(trim(seg, '/'), '//') AS pieces
            FROM seg{BPE_TRAIN_ROUNDS}
        ),
        tokp AS (
            SELECT d.doc_id, d.wpos, CAST(t.i AS BIGINT) AS ppos,
                   v.pieces[i] AS piece
            FROM docwp d JOIN vocabp v USING (word),
                 unnest(range(1, len(v.pieces) + 1)) AS t(i)
        ),
        grams AS (
            SELECT doc_id, gh FROM (
                SELECT doc_id, md5({gram}) AS gh
                FROM tokp
                WINDOW w AS (PARTITION BY doc_id ORDER BY wpos, ppos)
            ) WHERE gh IS NOT NULL
        ),
        tagged AS (
            SELECT doc_id, gh, {_SPLIT_SQL} AS split FROM grams
        ),
        eval_g AS (
            SELECT DISTINCT gh FROM tagged WHERE split = 'test'
        )
        SELECT doc_id,
               CAST(count(DISTINCT gh) AS BIGINT) AS n_contam_grams,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM tagged JOIN eval_g USING (gh)
        WHERE split = 'train'
        GROUP BY doc_id
    """


@register(
    "decontaminate",
    oracle=_decontaminate_oracle(),
    doc=f"Dataset decontamination at token-n-gram scale: train the "
        "BPE merge table (bpe_train's loop), "
        "re-express every document as its learned-token stream "
        "(pieces in word order, crossing word boundaries), and flag "
        f"each TRAIN-split document sharing any {DECON_GRAM}-token "
        "n-gram with the eval split — the GPT-3/PaLM decontamination "
        "pass, composed from contamination_check's split semantics and "
        "bpe_train's vocab. Output: contaminated train docs with "
        "distinct-gram and total-hit counts; the clean train set is "
        "the anti-join of this list.",
    scale_notes="The corpus is touched twice (word stream + the n-gram "
                "window); everything else is bounded: the tokenizer "
                "trains on the VOCAB relation (bpe_train's O(vocab) "
                "rounds), segmentation joins each unique word once and "
                "broadcasts, and the gram window is doc-partitioned "
                "(never global). The contamination join moves one md5 "
                "per gram — never text — keyed on the hash, so it "
                "partitions uniformly; the eval side is pre-DISTINCTed "
                "and, being an eval set, stays orders of magnitude "
                "smaller than train (broadcast candidate at real "
                "scale). A repeated boilerplate gram is ONE hot key "
                "and exactly the contamination you want surfaced.",
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.operators.training_prep import cached_vocab_pieces

    d = fan_out(load(spark, sf_dir, "documents"), spark)
    docwp = (
        d.select(
            "doc_id",
            F.posexplode(
                F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != "")
            ).alias("wpos0", "word"),
        )
        .select("doc_id", (F.col("wpos0") + 1).alias("wpos"), "word")
        .transform(materialize)  # vocab build + the token-stream join
    )
    # Same learned tokenizer as bpe_apply/bpe_pack (the word stream is
    # the identical documents tokenization) — shared via the session
    # cache instead of retraining the merge chain per op.
    vocabp = cached_vocab_pieces(spark, sf_dir)
    tokp = (
        docwp.join(vocabp, "word")
        .select(
            "doc_id",
            "wpos",
            F.posexplode("pieces").alias("ppos0", "piece"),
        )
        .select("doc_id", "wpos", (F.col("ppos0") + 1).alias("ppos"), "piece")
    )
    wg = Window.partitionBy("doc_id").orderBy("wpos", "ppos")
    parts = [F.col("piece")]
    for k in range(1, DECON_GRAM):
        parts += [F.lit("|"), F.lead("piece", k).over(wg)]
    grams = (
        tokp.select("doc_id", F.md5(F.concat(*parts)).alias("gh"))
        .filter(F.col("gh").isNotNull())
    )
    tagged = grams.withColumn("split", _split_col()).transform(materialize)
    eval_g = tagged.filter(F.col("split") == "test").select("gh").distinct()
    return (
        tagged.filter(F.col("split") == "train")
        .join(eval_g, "gh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gh").alias("n_contam_grams"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


# --- corpus-wide exact-substring repeat accounting -----------------------
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") deduplicate EXACT substrings of length >= 50 via a corpus
# suffix array. The same coverage is computable relationally: a
# character position lies inside some repeated substring of length
# >= K iff its K-wide window occurs more than once in the corpus, so
# seed every position's K-gram hash, count corpus-wide, and merge
# overlapping repeated windows per document (gaps-and-islands with
# K-1 tolerance) into maximal repeated spans. Span coverage is EXACT
# for threshold K — not an approximation.
SUB_K = 20  # repeat threshold: substrings >= this many chars


@register(
    "substring_repeats",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
                   substr(md5(substr(lower(text), CAST(t.i AS INT),
                                     {SUB_K})), 1, 16) AS h
            FROM documents,
                 unnest(range(1, greatest(len(text) - {SUB_K} + 2, 1)))
                     AS t(i)
        ),
        rep AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                             OR pos - lag(pos) OVER w > {SUB_K} - 1
                        THEN 1 ELSE 0 END AS brk
            FROM g JOIN rep USING (h)
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        islands AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM flagged
        ),
        spans AS (
            SELECT doc_id, min(pos) AS s, max(pos) + {SUB_K} - 1 AS e
            FROM islands GROUP BY doc_id, grp
        )
        SELECT d.doc_id,
               CAST(count(sp.s) AS BIGINT) AS n_repeat_spans,
               CAST(coalesce(sum(sp.e - sp.s + 1), 0) AS BIGINT)
                   AS repeat_chars,
               round(coalesce(sum(sp.e - sp.s + 1), 0) * 1.0
                     / greatest(length(d.text), 1), 6) AS repeat_frac
        FROM documents d LEFT JOIN spans sp USING (doc_id)
        GROUP BY d.doc_id, d.text
    """,
    doc=f"Exact-substring repeat accounting (Lee et al. 2022's suffix-"
        f"array dedup, relationally): every maximal corpus-repeated "
        f"substring of length >= {SUB_K} chars is located by seeding "
        f"each position's {SUB_K}-gram hash, counting corpus-wide, and "
        "merging overlapping repeated windows per doc into spans — one "
        "row per document with span count, repeated-char coverage, and "
        "the repeat fraction the dedup policy thresholds on. Coverage "
        "is exact for the threshold: a char is counted iff some "
        f">= {SUB_K}-char substring through it repeats.",
    scale_notes="The stride-1 seeding pass is the operator's honest "
                "cost (each text byte ships one 16-hex-char hash — the "
                "same O(n) blow-up a distributed suffix-array build "
                "pays); the repeat test is a count>1 aggregate keyed "
                "on the hash with map-side partials, the island merge "
                "is doc-partitioned windows (never global), and the "
                "output is one row per doc. A corpus-dominant "
                "boilerplate gram is ONE hot aggregate key (combiner "
                "absorbs it map-side) and is exactly the repeated span "
                "being measured. At 100 TB, swap md5 for a 64-bit "
                "xxhash and shard the seeding scan; the plan shape is "
                "unchanged.",
)
def substring_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    npos = F.greatest(F.length("text") - SUB_K + 1, F.lit(0))
    g = (
        d.select(
            "doc_id",
            F.lower("text").alias("lt"),
            F.explode(
                F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.substring(F.md5(F.expr(f"substr(lt, pos, {SUB_K})")), 1, 16).alias("h"),
        )
        .transform(materialize)  # seeds feed the count AND the flag join
    )
    rep = g.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    ).select("h")
    wp = Window.partitionBy("doc_id").orderBy("pos")
    # MERGE hints on the corpus-scaled joins: the repeated-hash set and
    # the per-doc span set both scale with the corpus, but Catalyst's
    # ~20-byte string-width estimate statically sizes them broadcastable
    # (measured: the rep broadcast gathered >1 GiB of task results to
    # the driver at the 32x probe). AQE still downgrades to a runtime
    # broadcast when a side is genuinely small.
    flagged = g.join(rep.hint("merge"), "h").withColumn(
        "brk",
        F.when(
            F.lag("pos").over(wp).isNull()
            | (F.col("pos") - F.lag("pos").over(wp) > SUB_K - 1),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "grp",
        F.sum("brk").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), (F.max("pos") + SUB_K - 1).alias("e")
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("tlen")
    )
    return (
        docs.join(spans.hint("merge"), "doc_id", "left")
        .groupBy("doc_id", "tlen")
        .agg(
            F.count("s").alias("n_repeat_spans"),
            F.coalesce(F.sum(F.col("e") - F.col("s") + 1), F.lit(0)).alias(
                "repeat_chars"
            ),
        )
        .select(
            "doc_id",
            "n_repeat_spans",
            "repeat_chars",
            F.round(
                F.col("repeat_chars") * F.lit(1.0)
                / F.greatest(F.col("tlen"), F.lit(1)),
                6,
            ).alias("repeat_frac"),
        )
    )
