"""Training-data preparation operators over `documents`: context-window
chunking, duplicate-passage detection, hashing-trick featurization, and
deterministic negative sampling.

These extend the LLM-pipeline suite (llm_text / llm_dedup / llm_corpus)
with the remaining prep stages a pretraining corpus runs through before
tokenization: splitting documents into model-context-sized chunks
(reference parity: the pipeline's per-message payload segmentation is the
analogous step, /root/reference/sql/sp_demo_cleanroom.sql is query-side
only — chunking itself is a new first-class capability), and marking
passages duplicated *across* documents (Lee et al. 2022-style substring
dedup, approximated at n-gram granularity so it stays a pure
join/aggregate plan).

All operators are built-in-function only in the hot path (split /
slice / sequence / posexplode — JVM codegen); shuffles are keyed on
gram / doc_id / feature index, never on raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load

# Context-window chunking: 64-token chunks advancing 48 tokens → 16-token
# overlap, the standard "sliding window with overlap" pretraining layout.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

# Duplicate-passage granularity: word 8-grams.
DUP_GRAM = 8


def _ws_tokens(col):
    """Whitespace tokens, empties dropped (same split as token_count)."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


@register(
    "doc_chunk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
            FROM documents
        ),
        st AS (
            SELECT doc_id, t,
                   CAST(unnest(generate_series(1, greatest(len(t), 1),
                                               {CHUNK_STRIDE})) AS INT) AS start
            FROM toks
        )
        SELECT doc_id,
               CAST((start - 1) // {CHUNK_STRIDE} AS INT)                    AS chunk_id,
               CAST(len(list_slice(t, start, start + {CHUNK_TOKENS} - 1))
                    AS INT)                                                  AS n_chunk_tokens,
               array_to_string(list_slice(t, start, start + {CHUNK_TOKENS} - 1),
                               ' ')                                          AS chunk_text
        FROM st
    """,
    doc=f"Context-window chunking: split each document into overlapping "
        f"{CHUNK_TOKENS}-token windows advancing {CHUNK_STRIDE} tokens — the "
        f"layout step before tokenization in a pretraining pipeline.",
    scale_notes="Pure map stage: split + sequence + posexplode + slice are "
                "all codegen'd; no shuffle at all (output partitioning "
                "inherits the scan). Output is ~1.33x the input tokens (the "
                "overlap); at 100 TB the chunker runs as a scan-transform-"
                "write with no exchange, so it scales with input splits.",
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = d.select("doc_id", _ws_tokens(F.col("text")).alias("t"))
    # sequence() with an explicit positive step requires start <= stop;
    # greatest(n, 1) guarantees every doc emits >= 1 chunk (empty text
    # would otherwise infer a descending step — wrong, not empty).
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_TOKENS)
    return (
        toks.select("doc_id", "t", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@register(
    "dup_passage",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   array_to_string(
                       list_slice(t, CAST(i AS INT), CAST(i AS INT) + {DUP_GRAM} - 1),
                       ' ') AS gram
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t) - {DUP_GRAM} + 1, 0)))
                           AS i
                FROM toks
            )
        ),
        dup AS (
            SELECT gram FROM grams GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2
        ),
        per_doc AS (
            SELECT g.doc_id,
                   count(*)       AS n_grams,
                   count(d.gram)  AS n_dup_grams
            FROM grams g LEFT JOIN dup d USING (gram)
            GROUP BY g.doc_id
        )
        SELECT doc.doc_id,
               coalesce(p.n_grams, 0)      AS n_grams,
               coalesce(p.n_dup_grams, 0)  AS n_dup_grams,
               round(CAST(coalesce(p.n_dup_grams, 0) AS DOUBLE)
                     / greatest(coalesce(p.n_grams, 0), 1), 6) AS dup_ratio,
               (round(CAST(coalesce(p.n_dup_grams, 0) AS DOUBLE)
                      / greatest(coalesce(p.n_grams, 0), 1), 6) >= 0.2) AS flagged
        FROM documents doc LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"Duplicate-passage detection: mark word {DUP_GRAM}-gram positions "
        f"whose gram occurs in >= 2 distinct documents; per-document "
        f"duplicated-position ratio (Lee et al. 2022 substring dedup, "
        f"approximated at n-gram granularity).",
    scale_notes="Gram generation is a map stage; the dup set is one "
                "two-phase count-distinct shuffle keyed on gram; the "
                "position-mark join is gram-keyed (sort-merge, both sides "
                "pre-shuffled on the same key). Grams are localCheckpointed "
                "so tokenization runs once for both consumers. At 100 TB, "
                "replace gram strings with xxhash64(gram) so the shuffle "
                "moves 8 bytes/position instead of ~50, and salt stop-gram "
                "hot keys (the count-distinct partial aggs already absorb "
                "most of that skew).",
)
def dup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("t"),
    )
    n = F.size("t")
    # Docs shorter than the gram width contribute no grams. sequence(1, 0)
    # would infer a DESCENDING step (→ [1, 0], and slice rejects start=0),
    # so the short-doc branch must yield an empty array explicitly; explode
    # then drops those rows.
    starts = F.when(
        n >= DUP_GRAM, F.sequence(F.lit(1), n - (DUP_GRAM - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.array_join(F.slice(F.col("t"), F.col("i"), DUP_GRAM), " ")
    grams = (
        toks.select("doc_id", "t", F.explode(starts).alias("i"))
        .select("doc_id", gram.alias("gram"))
        .localCheckpoint()  # one tokenization pass feeds both consumers
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram", F.lit(True).alias("is_dup"))
    )
    per_doc = (
        grams.join(dup, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_dup").alias("n_dup_grams"),
        )
    )
    ratio = F.round(
        F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("double")
        / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)),
        6,
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            ratio.alias("dup_ratio"),
            (ratio >= 0.2).alias("flagged"),
        )
    )
