"""session_artifact cache semantics (VERDICT r8 #4): the k-means||
quantizer/index builds run ONCE per (session, sf_dir), every consumer
gets the identical artifact, and the scaling-probe invalidation hook
really drops the cache (a cached frame whose localCheckpoint blocks
were unpersisted is unrecomputable, not lazily rebuilt)."""

from __future__ import annotations

from pubsub2bq_spark import tables
from tests.conftest import SF_SMOKE


def test_build_runs_once_and_returns_same_object(spark):
    calls = []

    def build():
        calls.append(1)
        return object()

    a = tables.session_artifact(spark, "t_probe", "/some/sf", build)
    b = tables.session_artifact(spark, "t_probe", "/some/sf", build)
    assert a is b
    assert len(calls) == 1
    # a different sf_dir is a different artifact
    c = tables.session_artifact(spark, "t_probe", "/other/sf", build)
    assert c is not a
    assert len(calls) == 2
    tables.clear_session_artifacts()
    d = tables.session_artifact(spark, "t_probe", "/some/sf", build)
    assert d is not a
    assert len(calls) == 3


def test_quantizer_shared_across_consumers(spark):
    """semdedup / global_semdedup / semantic_decontaminate must reuse
    ONE quantizer build — the frames handed back are the same objects."""
    from pubsub2bq_spark.operators.llm_quality import _quantizer_build

    tables.clear_session_artifacts()
    cent1, asgn1 = _quantizer_build(spark, SF_SMOKE)
    cent2, asgn2 = _quantizer_build(spark, SF_SMOKE)
    assert cent1 is cent2
    assert asgn1 is asgn2


def test_clear_hook_makes_rebuild_fresh(spark):
    """After clear_session_artifacts (the scaling-probe discipline), a
    rebuild yields a NEW frame that executes — the probe's
    rebuild-per-measurement contract."""
    from pubsub2bq_spark.operators.llm_quality import _quantizer_build

    tables.clear_session_artifacts()
    cent1, _ = _quantizer_build(spark, SF_SMOKE)
    tables.clear_session_artifacts()
    cent2, _ = _quantizer_build(spark, SF_SMOKE)
    assert cent1 is not cent2
    assert cent2.count() > 0
