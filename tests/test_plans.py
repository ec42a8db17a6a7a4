"""Physical-plan quality gates: the 100 TB posture is asserted, not
assumed. Each test renders ``explain("formatted")`` and checks the
property that makes the operator survive a 1000-executor scale-up —
pushdown reaching the scan, broadcasts where a dimension is small,
bucketed joins staying exchange-free, partial aggregation, top-k
avoiding a global sort.
"""

from __future__ import annotations

import contextlib
import io

from pubsub2bq_spark.registry import all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def plan_of(spark, key: str) -> str:
    df = QUERIES[key].spark(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestScanEfficiency:
    def test_filter_pushdown_reaches_parquet(self, spark):
        plan = plan_of(spark, "filter_pred")
        assert "PushedFilters: [" in plan
        # At least one real predicate pushed, not an empty list.
        assert "PushedFilters: []" not in plan

    def test_projection_prunes_scan_columns(self, spark):
        """A query projecting a few columns must not scan all of lineitem
        (16 columns) — ReadSchema is the columns the query needs."""
        plan = plan_of(spark, "filter_pred")
        read_schema = next(
            line for line in plan.splitlines() if "ReadSchema" in line
        )
        struct = read_schema.split("struct<", 1)[1]
        n_read = struct.count(":")
        assert n_read <= 8, f"scan reads too many columns: {read_schema}"


class TestJoinStrategies:
    def test_small_dim_is_broadcast(self, spark):
        plan = plan_of(spark, "join_broadcast")
        assert "BroadcastHashJoin" in plan
        assert "BroadcastExchange" in plan

    def test_bucketed_join_has_no_join_exchange(self, spark):
        """The point of bucketed tables: the custkey join itself runs with
        ZERO shuffles (SelectedBucketsCount on both scans, SMJ directly on
        bucketed output). The only allowed Exchange is the final
        aggregation's shuffle on the *other* key (c_nationkey)."""
        plan = plan_of(spark, "bucketed_join")
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount" in plan
        n_exchange = plan.count("Exchange")
        assert n_exchange <= 2, (  # agg shuffle + single-partition gather
            f"bucketed join should not shuffle its inputs; saw {n_exchange} "
            f"Exchange nodes:\n{plan}"
        )

    def test_partitioned_join_uses_dynamic_pruning(self, spark):
        """The year-partitioned fact scan must carry a dynamicpruning
        expression in PartitionFilters — the dim filter prunes fact
        partitions at runtime, not after the scan."""
        plan = plan_of(spark, "partition_pruned_join")
        assert "dynamicpruning" in plan, plan

    def test_similarity_broadcasts_query_side(self, spark):
        """Brute-force ANN must broadcast the tiny query set so the corpus
        never shuffles for the scoring join."""
        plan = plan_of(spark, "similarity_topk")
        assert "BroadcastExchange" in plan


class TestAggAndSort:
    def test_groupby_has_partial_aggregation(self, spark):
        """Map-side combine: two HashAggregate levels around the exchange."""
        plan = plan_of(spark, "groupby_agg")
        assert plan.count("HashAggregate") >= 2

    def test_sort_limit_uses_topk_not_global_sort(self, spark):
        """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
        top-k + merge), never a full global sort."""
        plan = plan_of(spark, "sort_limit")
        assert "TakeOrderedAndProject" in plan

    def test_whole_stage_codegen_covers_relational_core(self, spark):
        """Scan→filter→project must fuse into one codegen stage. (AQE plans
        hide codegen ids until execution, so assert on a non-AQE query.)"""
        plan = plan_of(spark, "filter_pred")
        assert "codegen id" in plan
