"""Data-selection operators for a pretraining corpus build: DSIR
importance resampling, CCNet-style paragraph-level exact dedup with
text reconstruction, and per-source boilerplate removal.

These are the selection/cleaning passes that sit between the hygiene
filters (`llm_corpus.py`) and tokenization (`training_prep.py`) in a
100 TB pipeline:

* ``dsir_select`` — Data Selection via Importance Resampling (Xie et
  al. 2023, arXiv:2302.03169): score every raw document by how much
  more likely its hashed-unigram features are under a target-domain
  distribution than under the raw distribution, then take a per-source
  budget of top-weighted docs.
* ``paragraph_dedup`` — CCNet-style (Wenzek et al. 2020,
  arXiv:1911.00359) exact duplicate-paragraph removal: the corpus
  keeps only the FIRST occurrence of every repeated text chunk and
  each document is rebuilt from its surviving chunks.
* ``boilerplate_remove`` — chunks that recur across many documents of
  the SAME source (nav menus, footers, injected banners) are dropped
  from every document of that source.

Everything is built from JVM-side primitives (split / slice /
posexplode / hash aggregates); the only shuffles are the chunk- or
bucket-keyed aggregates and the joins back to documents, each called
out in scale_notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import fan_out, load, materialize

PARA_W = 4        # paragraph_dedup: chunk width (words)
BP_W = 3          # boilerplate_remove: chunk width (words)
BP_MIN_DOCS = 2   # chunk in >= this many docs of one source = boilerplate
DSIR_BUCKETS = 256  # hashed-unigram feature space (md5 first byte pair)
DSIR_KEEP = 8       # per-source selection budget

# Chunk position key: doc_id * 1e5 + chunk idx gives a total order of
# (doc_id, idx) as one BIGINT. Valid while every document has < 1e5
# chunks (a 100k-chunk doc at 4 words/chunk is ~400k words — far above
# any sane pretraining document; re-shard longer blobs upstream).
_POS_STRIDE = 100_000


def _letter_tokens(col):
    """Lower-cased letters-only words, empties dropped (the same split
    as llm_text.unigram_logprob so vocabularies agree across ops)."""
    return F.filter(F.split(F.lower(col), "[^a-z]+"), lambda x: x != "")


def _chunks(d: DataFrame, width: int, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Non-overlapping ``width``-word chunks with their 0-based index.

    Pure map stage (split + sequence + posexplode + slice, all
    codegen'd); every document emits at least one chunk (possibly ''
    for empty text) so downstream left joins can't lose docs.
    """
    cols = ("doc_id", *extra_cols)
    toks = d.select(*cols, _letter_tokens(F.col("text")).alias("t"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(width))
    return toks.select(
        *cols, "t", F.posexplode(starts).alias("idx", "s")
    ).select(
        *cols,
        F.col("idx").cast("int").alias("idx"),
        F.array_join(F.slice(F.col("t"), F.col("s"), width), " ").alias("chunk"),
    )


def _chunk_cte(width: int, extra: str = "", source: str = "documents") -> str:
    """DuckDB twin of :func:`_chunks` (same tokenization, same chunk
    index arithmetic). ``source`` lets composed pipelines chunk a
    filtered relation instead of the raw table."""
    return f"""
        toks AS (
            SELECT doc_id{extra},
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS t
            FROM {source}
        ),
        chunks AS (
            SELECT doc_id{extra},
                   CAST((s - 1) // {width} AS INT) AS idx,
                   -- coalesce: DuckDB's array_to_string([]) is NULL,
                   -- Spark's array_join([]) is '' — empty docs must
                   -- chunk identically on both engines
                   coalesce(array_to_string(list_slice(t, s, s + {width} - 1),
                                            ' '), '') AS chunk
            FROM (
                SELECT doc_id{extra}, t,
                       CAST(unnest(generate_series(1, greatest(len(t), 1),
                                                   {width})) AS INT) AS s
                FROM toks
            )
        )
"""


def _dedup_cte_tail() -> str:
    """First-occurrence election + per-doc rebuild as SQL CTEs over a
    preceding `chunks` relation — the single source of the dedup SQL,
    shared by paragraph_dedup and selection_funnel."""
    return f"""
        firsts AS (
            SELECT chunk,
                   min(doc_id * {_POS_STRIDE} + idx) AS keep_key
            FROM chunks GROUP BY chunk
        ),
        kept AS (
            SELECT c.doc_id, c.idx, c.chunk
            FROM chunks c JOIN firsts f
              ON c.chunk = f.chunk
             AND c.doc_id * {_POS_STRIDE} + c.idx = f.keep_key
        ),
        tot AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
            FROM chunks GROUP BY doc_id
        ),
        reb AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(chunk, ' ' ORDER BY idx) AS clean_text
            FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id,
               t.n_chunks,
               coalesce(r.n_kept, 0) AS n_kept,
               coalesce(r.clean_text, '') AS clean_text
        FROM tot t LEFT JOIN reb r USING (doc_id)
    """


def _first_occurrence_rebuild(chunks: DataFrame) -> DataFrame:
    """Spark twin of :func:`_dedup_cte_tail`: elect the corpus-wide
    first occurrence of every chunk (one map-side-combinable min on the
    chunk key), then rebuild each document from its surviving chunks in
    position order."""
    # Composite-key guard (ADVICE r8): the BIGINT encoding is only a
    # total order of (doc_id, idx) while 0 <= idx < stride and
    # doc_id >= 0 — a 100k-chunk document or a negative id would
    # silently collide keys ACROSS documents and corrupt the election.
    # The branch lives inside the pos expression itself (an unused
    # assert column would be pruned by Catalyst), so violations raise
    # at scan time instead of producing wrong dedup output.
    pos = F.when(
        (F.col("idx") >= 0)
        & (F.col("idx") < _POS_STRIDE)
        & (F.col("doc_id") >= 0),
        F.col("doc_id") * _POS_STRIDE + F.col("idx"),
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("paragraph-dedup position key overflow: (doc_id, idx) ="),
                F.col("doc_id").cast("string"),
                F.col("idx").cast("string"),
                F.lit(f"violates 0 <= idx < {_POS_STRIDE}, doc_id >= 0 — "
                      "re-shard oversized documents upstream"),
            )
        ).cast("bigint")
    )
    firsts = chunks.groupBy("chunk").agg(F.min(pos).alias("keep_key"))
    # MERGE hints: the first-occurrence map and the rebuilt-doc relation
    # both scale with the corpus, but Catalyst's ~20-byte string-width
    # estimate can statically size them broadcastable (the 32x-probe
    # OOM class). AQE still broadcasts at runtime when actually small.
    kept = chunks.join(firsts.hint("merge"), "chunk").filter(
        pos == F.col("keep_key")
    )
    tot = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return tot.join(reb.hint("merge"), "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


@register(
    "paragraph_dedup",
    oracle=f"""
        WITH {_chunk_cte(PARA_W)},
        {_dedup_cte_tail()}
    """,
    doc=f"CCNet-style exact paragraph dedup (Wenzek et al. 2020): split "
        f"every document into {PARA_W}-word chunks, keep only the "
        "corpus-wide FIRST occurrence (smallest (doc_id, position)) of "
        "each repeated chunk, and rebuild each document from its "
        "surviving chunks — the pass that strips mirrored/syndicated "
        "paragraphs before near-dup detection ever runs.",
    scale_notes="Chunking is a no-shuffle map. First-occurrence election "
                "is ONE hash aggregate keyed on the chunk text (min of a "
                "composite position key — map-side combinable, so the "
                "shuffle carries one row per DISTINCT chunk, not per "
                "occurrence); membership is an equi-join back on the same "
                "key, which AQE plans as broadcast when the duplicate set "
                "is small. Reassembly is a doc_id-keyed aggregate — "
                "partition-aligned with the scan. At 100 TB swap the raw "
                "chunk string for its 128-bit hash as the join key so the "
                "shuffle carries 16 bytes per distinct chunk; skewed "
                "boilerplate chunks (one chunk in millions of docs) "
                "combine map-side before the exchange, so no salting is "
                "needed.",
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    chunks = _chunks(d, PARA_W).transform(materialize)
    return _first_occurrence_rebuild(chunks)


@register(
    "boilerplate_remove",
    oracle=f"""
        WITH {_chunk_cte(BP_W, ", source")},
        df AS (
            SELECT source, chunk,
                   count(DISTINCT doc_id) AS dfc
            FROM chunks GROUP BY source, chunk
        )
        SELECT c.doc_id,
               c.source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN d.dfc >= {BP_MIN_DOCS} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boiler,
               coalesce(string_agg(CASE WHEN d.dfc < {BP_MIN_DOCS} THEN c.chunk END,
                                   ' ' ORDER BY c.idx), '') AS clean_text
        FROM chunks c JOIN df d ON c.source = d.source AND c.chunk = d.chunk
        GROUP BY c.doc_id, c.source
    """,
    doc=f"Per-source boilerplate removal: {BP_W}-word chunks that recur "
        f"in >= {BP_MIN_DOCS} distinct documents of the SAME source "
        "(nav menus, footers, cookie banners, injected templates) are "
        "dropped from every document of that source — the jusText/CCNet "
        "cleanup that runs before quality scoring so boilerplate can't "
        "inflate length or n-gram statistics.",
    scale_notes="Document frequency is one (source, chunk)-keyed hash "
                "aggregate; count(DISTINCT doc_id) map-side-combines "
                "after local dedup. The rewrite joins each chunk "
                "occurrence to its df row on the same composite key, so "
                "the exchange is shared (co-partitioned) with the "
                "aggregate's output; final reassembly is doc-keyed. "
                "Sources are natural partitions — a giant source with a "
                "hot chunk still combines map-side. At 100 TB, carry the "
                "chunk hash instead of the text through the df join, and "
                "broadcast the (tiny) boilerplate-only subset of df "
                "instead of the full table.",
)
def boilerplate_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    chunks = _chunks(d, BP_W, ("source",)).transform(materialize)
    df_tbl = chunks.groupBy("source", "chunk").agg(
        F.countDistinct("doc_id").alias("dfc")
    )
    boiler = F.col("dfc") >= BP_MIN_DOCS
    return (
        chunks.join(df_tbl, ["source", "chunk"])
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(boiler.cast("bigint")).alias("n_boiler"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(~boiler, F.struct("idx", "chunk"))
                            )
                        ),
                        lambda x: x["chunk"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("clean_text"),
        )
    )


@register(
    "dsir_select",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, lang, source,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS word
            FROM documents
        ),
        b AS (
            SELECT doc_id, lang, source, substr(md5(word), 1, 2) AS bkt
            FROM words
        ),
        raw AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
        tgt AS (SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bkt),
        tr AS (SELECT sum(cr) AS tot_r FROM raw),
        tt AS (SELECT coalesce(sum(ct), 0) AS tot_t FROM tgt),
        lr AS (
            SELECT r.bkt,
                   ln((coalesce(t.ct, 0) + 1.0) / (tt.tot_t + {DSIR_BUCKETS}))
                 - ln((r.cr + 1.0) / (tr.tot_r + {DSIR_BUCKETS})) AS lr
            FROM raw r LEFT JOIN tgt t USING (bkt), tr, tt
        ),
        lrq AS (
            SELECT bkt, CAST(round(lr * 1000000, 0) AS BIGINT) AS lrq FROM lr
        ),
        scored AS (
            SELECT b.doc_id, b.source,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(CAST(sum(lrq.lrq) AS BIGINT) / 1000000.0, 6) AS weight
            FROM b JOIN lrq USING (bkt)
            GROUP BY b.doc_id, b.source
        )
        SELECT doc_id, source, n_tokens, weight,
               (row_number() OVER (PARTITION BY source
                                   ORDER BY weight DESC, doc_id)
                <= {DSIR_KEEP}) AS selected
        FROM scored
    """,
    doc=f"DSIR — Data Selection via Importance Resampling (Xie et al. "
        "2023, arXiv:2302.03169): hash every word into one of "
        f"{DSIR_BUCKETS} feature buckets, estimate the bucket "
        "distribution of the target domain (lang='en' here) and of the "
        "raw corpus with +1 smoothing, score each document by its "
        "summed log importance ratio, and keep the top "
        f"{DSIR_KEEP} docs per source — the cheap n-gram proxy for "
        "'looks like the target domain' that selects pretraining data "
        "without running a model.",
    scale_notes="Both feature distributions are one bucket-keyed "
                f"aggregate with a FIXED {DSIR_BUCKETS}-row result — the "
                "log-ratio table is bytes, broadcast to every executor, "
                "so scoring is the word-explode map plus one doc-keyed "
                "aggregate (map-side combinable; no join shuffle at "
                "all on the scoring path). Selection is a per-source "
                "window — partitioned, never a global sort; a skewed "
                "giant source ranks inside its own partition. At 100 TB "
                "this is two scans (one if the distributions are "
                "estimated on a sample, as the paper does) and one "
                "top-k-per-group.",
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load(spark, sf_dir, "documents"), spark)
    words = d.select(
        "doc_id",
        "lang",
        "source",
        F.explode(_letter_tokens(F.col("text"))).alias("word"),
    )
    b = words.select(
        "doc_id", "lang", "source",
        F.substring(F.md5(F.col("word")), 1, 2).alias("bkt"),
    ).transform(materialize)
    raw = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("cr"))
    tgt = b.filter(F.col("lang") == "en").groupBy("bkt").agg(
        F.count(F.lit(1)).alias("ct")
    )
    tr = raw.agg(F.sum("cr").alias("tot_r"))
    tt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tot_t"))
    lr = (
        raw.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tt))
        .select(
            "bkt",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("tot_t") + DSIR_BUCKETS)
                )
                - F.log((F.col("cr") + 1.0) / (F.col("tot_r") + DSIR_BUCKETS))
            ).alias("lr"),
        )
        # Quantize the per-bucket log-ratio to a scaled BIGINT (the
        # logreg trick): both engines derive lr from identical exact
        # counts, so lrq is identical, and the per-doc SUM is then an
        # exact integer — order-free across engines/partitions, unlike
        # a raw double sum.
        .select("bkt", F.round(F.col("lr") * 1000000, 0).cast("bigint").alias("lrq"))
    )
    scored = (
        b.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lrq") / F.lit(1000000.0), 6).alias("weight"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("weight"), "doc_id")
    return scored.select(
        "doc_id",
        "source",
        "n_tokens",
        "weight",
        (F.row_number().over(w) <= DSIR_KEEP).alias("selected"),
    )


# --- selection_funnel: the composed pretraining-selection pipeline ---


@register(
    "selection_funnel",
    oracle=None,  # composed from quality_ensemble's oracle below
    doc=f"The composed selection pipeline a pretraining corpus build "
        "runs end-to-end: quality gate (drop quality_ensemble-flagged "
        f"docs) -> CCNet paragraph dedup ({PARA_W}-word chunks, corpus-"
        "wide first occurrence among the survivors) -> rebuilt clean "
        "text with per-doc retention stats. The north-star composition: "
        "each stage is the registered operator's own logic, chained on "
        "one frame.",
    scale_notes="The gate is quality_ensemble's envelope (one moments "
                "aggregate + stateless map); its survivor set joins the "
                "scan doc_id-to-doc_id (AQE picks broadcast when the "
                "reject rate leaves a small side — at typical <20% "
                "rejection it stays a co-partitioned join). Dedup adds "
                "paragraph_dedup's single chunk-keyed min aggregate. "
                "Stages share the scan; nothing is materialized between "
                "them except the bounded moments row.",
)
def selection_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.operators.llm_quality import quality_ensemble

    keep = (
        quality_ensemble(spark, sf_dir)
        .filter(~F.col("flagged"))
        .select("doc_id")
    )
    d = (
        fan_out(load(spark, sf_dir, "documents"), spark)
        .join(keep, "doc_id")
        .select("doc_id", "text")
    )
    chunks = _chunks(d, PARA_W).transform(materialize)
    return _first_occurrence_rebuild(chunks)


def _funnel_oracle() -> str:
    # importing the module registers quality_ensemble (data_selection
    # sits before llm_quality in the registry's import order)
    from pubsub2bq_spark.operators import llm_quality  # noqa: F401
    from pubsub2bq_spark.registry import _REGISTRY

    qe = _REGISTRY["quality_ensemble"].oracle
    return f"""
        WITH docs_kept AS (
            SELECT d.doc_id, d.text
            FROM documents d
            JOIN (SELECT doc_id FROM ({qe}) WHERE NOT flagged) k
              USING (doc_id)
        ),
        {_chunk_cte(PARA_W, source="docs_kept")},
        {_dedup_cte_tail()}
    """


from pubsub2bq_spark.registry import _REGISTRY  # noqa: E402

_REGISTRY["selection_funnel"].oracle = _funnel_oracle()
