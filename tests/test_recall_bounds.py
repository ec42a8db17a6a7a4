"""Recall bounds for the cell-probed semantic ops (VERDICT r8 #5):
brute-force-truth recall at a 4x synthetic scale-up must stay above the
stated bounds — the GSEM_NBR recall/cost knob's contract. Measured by
scripts/recall_probe.py (numbers also in docs/SCALING.md); a quantizer
or candidate-generation regression that silently sheds recall fails
here instead of shipping.

Measured at base sf0.001 x4 (2000 vectors, deterministic build, r13
hierarchical 2-probe quantizer): semdedup 0.8925, global_semdedup
0.9393, semantic_decontaminate 0.7423 (sf0.1 x4: 0.8855 / 0.9355 /
0.7529). The r13 1-probe hierarchical routing measurably shed
decontaminate recall (0.6908 < the 0.70 bound — this test caught it);
SEMDEDUP_ROUTE_PROBES = 2 restored it at n·(s + 2k/s) routing cost.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def recalls(spark, tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from recall_probe import build_scaled_embeddings, measure_recalls

    from pubsub2bq_spark import tables

    # The module-scoped artifact cache may hold quantizers for other
    # sf_dirs; the scaled workdir is unique so no invalidation needed —
    # but clear anyway so this module measures a cold, reproducible build.
    tables.clear_session_artifacts()
    workdir = str(tmp_path_factory.mktemp("recall4x"))
    sf_dir = build_scaled_embeddings(spark, SF_SMOKE, 4, workdir)
    return measure_recalls(spark, sf_dir)


def test_global_semdedup_recall_bound(recalls):
    assert recalls["recall_global_semdedup"] >= 0.92


def test_neighbor_probe_strictly_beats_in_cell_only(recalls):
    """The knob must buy something: probing GSEM_NBR neighbor cells has
    to recover strictly more true duplicates than in-cell-only."""
    assert recalls["recall_global_semdedup"] > recalls["recall_semdedup"]
    assert recalls["recall_semdedup"] >= 0.85  # blind-spot baseline


def test_semantic_decontaminate_recall_bound(recalls):
    assert recalls["recall_semantic_decontaminate"] >= 0.70


def test_truth_sets_nontrivial(recalls):
    """The bounds only mean something if the truth sets are big enough
    to make recall a real fraction, not a 3-sample coin flip."""
    assert recalls["n_true_dropped"] >= 100
    assert recalls["n_true_contaminated"] >= 100


@pytest.fixture(scope="module")
def mmr_quality(spark, tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from recall_probe import build_scaled_embeddings, measure_mmr_quality

    from pubsub2bq_spark import tables

    tables.clear_session_artifacts()
    workdir = str(tmp_path_factory.mktemp("mmr4x"))
    sf_dir = build_scaled_embeddings(spark, SF_SMOKE, 4, workdir)
    return measure_mmr_quality(spark, sf_dir)


def test_mmr_greedy_near_exhaustive_optimum(mmr_quality):
    """VERDICT r9 #7: the greedy pick must capture nearly all of the
    exhaustive C(16,5)-subset optimum of the MMR set objective.
    Measured at base sf0.001 x4: min ratio 1.0 (greedy IS optimal on
    every query); pinned with slack for tie-order sensitivity."""
    assert mmr_quality["mmr_objective_vs_exhaustive_min"] >= 0.97
    assert mmr_quality["mmr_objective_vs_exhaustive_mean"] >= 0.99


def test_mmr_trade_is_bounded_and_directional(mmr_quality):
    """The diversity trade must (a) retain nearly all relevance mass vs
    plain top-K (measured 0.9931) and (b) never score below top-K on
    the very objective it optimizes."""
    assert mmr_quality["mmr_relevance_retention_mean"] >= 0.95
    assert mmr_quality["mmr_objective_geq_topk_frac"] == 1.0
    # redundancy never increases vs top-K (<= 0 delta, measured -0.0)
    assert mmr_quality["mmr_max_redundancy_delta_mean"] <= 1e-9


def test_mmr_query_set_nontrivial(mmr_quality):
    assert mmr_quality["n_mmr_queries"] >= 20
