"""Semantic checks for the data-selection operators (oracle parity is
covered by test_oracle_parity's parametrization — these assert the
*behavior*: dedup actually drops repeated chunks, boilerplate removal
actually strips recurring chunks, DSIR respects its per-source budget
and favors target-domain docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub2bq_spark.operators.data_selection import (
    BP_MIN_DOCS,
    DSIR_KEEP,
    PARA_W,
    _chunks,
)
from pubsub2bq_spark.registry import all_queries
from pubsub2bq_spark.tables import load
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def test_paragraph_dedup_drops_every_repeat_and_keeps_firsts(spark):
    out = QUERIES["paragraph_dedup"].spark(spark, SF_SMOKE)
    agg = out.agg(
        F.sum("n_chunks").alias("total"),
        F.sum("n_kept").alias("kept"),
        F.sum((F.col("n_kept") > F.col("n_chunks")).cast("int")).alias("over"),
    ).collect()[0]
    assert agg["over"] == 0
    # the corpus has repeated chunks at this width — some must drop
    assert agg["kept"] < agg["total"]
    # global invariant: kept chunks == distinct chunks in the corpus
    docs = load(spark, SF_SMOKE, "documents")
    n_distinct = _chunks(docs, PARA_W).select("chunk").distinct().count()
    assert agg["kept"] == n_distinct


def test_paragraph_dedup_rebuilds_text_in_position_order(spark):
    out = QUERIES["paragraph_dedup"].spark(spark, SF_SMOKE)
    row = (
        out.filter((F.col("n_kept") == F.col("n_chunks")) & (F.col("n_kept") > 1))
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    assert row, "expected at least one fully-kept multi-chunk doc"
    doc_id = row[0]["doc_id"]
    docs = load(spark, SF_SMOKE, "documents")
    original = _chunks(docs.filter(F.col("doc_id") == doc_id), PARA_W)
    expected = " ".join(
        r["chunk"] for r in original.orderBy("idx").collect()
    )
    assert row[0]["clean_text"] == expected


def test_boilerplate_remove_strips_recurring_chunks(spark):
    out = QUERIES["boilerplate_remove"].spark(spark, SF_SMOKE)
    agg = out.agg(
        F.sum("n_boiler").alias("boiler"),
        F.sum((F.col("n_boiler") > F.col("n_chunks")).cast("int")).alias("over"),
    ).collect()[0]
    assert agg["over"] == 0
    assert agg["boiler"] > 0, (
        f"no chunk recurs in >= {BP_MIN_DOCS} docs of one source — "
        "threshold too high for the fixture"
    )
    # a doc with boilerplate must have strictly fewer clean words
    sample = out.filter(F.col("n_boiler") > 0).limit(5).collect()
    for r in sample:
        assert len(r["clean_text"].split()) < r["n_chunks"] * 100  # sanity
        assert r["clean_text"] == "" or r["n_boiler"] < r["n_chunks"]


def test_dsir_select_respects_per_source_budget(spark):
    out = QUERIES["dsir_select"].spark(spark, SF_SMOKE)
    per_src = (
        out.filter("selected")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_src
    assert all(r["n"] <= DSIR_KEEP for r in per_src)


def test_dsir_weights_favor_target_language(spark):
    """lang='en' defines the target distribution, so English docs must
    average a higher importance weight than the rest."""
    out = QUERIES["dsir_select"].spark(spark, SF_SMOKE)
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    j = out.join(docs, "doc_id")
    rows = (
        j.groupBy(F.col("lang") == "en")
        .agg(F.avg("weight").alias("w"))
        .collect()
    )
    by_target = {r[0]: r["w"] for r in rows}
    assert by_target[True] > by_target[False]


def test_selection_funnel_composes_gate_then_dedup(spark):
    from pubsub2bq_spark.operators.llm_quality import quality_ensemble

    funnel = QUERIES["selection_funnel"].spark(spark, SF_SMOKE)
    n_out = funnel.count()
    n_flagged = (
        quality_ensemble(spark, SF_SMOKE).filter("flagged").count()
    )
    n_docs = load(spark, SF_SMOKE, "documents").count()
    # exactly the unflagged docs survive the gate
    assert n_out == n_docs - n_flagged
    # dedup still bites on the survivor corpus
    agg = funnel.agg(
        F.sum("n_chunks").alias("t"), F.sum("n_kept").alias("k")
    ).collect()[0]
    assert agg["k"] < agg["t"]


def test_pos_key_overflow_raises_instead_of_colliding(spark):
    """ADVICE r8: a chunk index >= _POS_STRIDE (or a negative doc_id)
    must fail loudly — the composite BIGINT would otherwise collide
    keys across documents and silently corrupt the election."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from pubsub2bq_spark.operators.data_selection import (
        _POS_STRIDE,
        _first_occurrence_rebuild,
    )

    bad = spark.createDataFrame(
        [(1, 0, "ok"), (1, _POS_STRIDE, "overflow")],
        "doc_id long, idx int, chunk string",
    )
    with pytest.raises(SparkRuntimeException, match="position key overflow"):
        _first_occurrence_rebuild(bad).collect()

    neg = spark.createDataFrame(
        [(-1, 0, "neg")], "doc_id long, idx int, chunk string"
    )
    with pytest.raises(SparkRuntimeException, match="position key overflow"):
        _first_occurrence_rebuild(neg).collect()

    ok = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "a"), (2, 1, "b")],
        "doc_id long, idx int, chunk string",
    )
    rows = {r["doc_id"]: r["n_kept"] for r in _first_occurrence_rebuild(ok).collect()}
    assert rows == {1: 1, 2: 1}  # doc 2 keeps only 'b'; 'a' elected to doc 1
