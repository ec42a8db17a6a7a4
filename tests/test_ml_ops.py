"""Semantic invariants for ml_ops (kmeans_lloyd, feature_scale,
ewma_recent) — properties beyond the DuckDB hash parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pubsub2bq_spark.operators.ml_ops import (
    EWMA_SPAN,
    K_CLUSTERS,
    ewma_recent,
    feature_scale,
    kmeans_lloyd,
)
from tests.conftest import SF_SMOKE


class TestKmeans:
    def test_partition_of_corpus(self, spark):
        """Every vector lands in exactly one cluster: member counts sum
        to the corpus size, cluster ids stay within [0, K)."""
        rows = kmeans_lloyd(spark, SF_SMOKE).collect()
        n_corpus = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
        assert sum(r.n_members for r in rows) == n_corpus
        assert all(0 <= r.cluster_id < K_CLUSTERS for r in rows)
        assert len({r.cluster_id for r in rows}) == len(rows)
        assert all(math.isfinite(r.centroid_sum) for r in rows)

    def test_iteration_reduces_objective(self, spark):
        """Lloyd's guarantee: mean squared distance to the assigned
        centroid is non-increasing across the two assignment rounds."""
        from pubsub2bq_spark.operators.llm_similarity import _dvec
        from pubsub2bq_spark.operators.ml_ops import _assign, _recompute, _sqdist
        from pubsub2bq_spark.tables import load

        v = (
            load(spark, SF_SMOKE, "embeddings")
            .select("vec_id", _dvec("embedding").alias("v"))
            .localCheckpoint()
        )
        from pyspark.sql import Window

        c0 = (
            v.orderBy("vec_id")
            .limit(K_CLUSTERS)
            .select(
                (F.row_number().over(Window.orderBy("vec_id")) - 1)
                .cast("int")
                .alias("cid"),
                F.col("v").alias("c"),
            )
        )

        def objective(assigned, cents):
            return (
                assigned.join(cents, "cid")
                .select(_sqdist(F.col("v"), F.col("c")).alias("d"))
                .agg(F.avg("d"))
                .first()[0]
            )

        a1 = _assign(v, c0)
        c1 = _recompute(a1)
        a2 = _assign(v, c1)
        # objective(a2, c1) <= objective(a1, c1) <= objective(a1, c0)
        assert objective(a2, c1) <= objective(a1, c1) + 1e-9
        assert objective(a1, c1) <= objective(a1, c0) + 1e-9


class TestFeatureScale:
    def test_group_moments(self, spark):
        """z-scores have ~0 mean and ~1 sample stddev per group; min-max
        values span exactly [0, 1]."""
        agg = (
            feature_scale(spark, SF_SMOKE)
            .groupBy("event_type")
            .agg(
                F.avg("z_value").alias("mz"),
                F.stddev_samp("z_value").alias("sz"),
                F.min("minmax_value").alias("lo"),
                F.max("minmax_value").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        assert agg
        for r in agg:
            assert abs(r.mz) < 1e-4, r
            # z rounded to 6dp before re-aggregation → loose tolerance
            assert abs(r.sz - 1.0) < 1e-3, r
            assert r.lo == 0.0 and r.hi == 1.0, r


class TestEwmaRecent:
    def test_bounds_and_span(self, spark):
        rows = ewma_recent(spark, SF_SMOKE).collect()
        assert rows
        assert all(1 <= r.n_obs <= EWMA_SPAN for r in rows)
        # EWMA is a convex combination → stays within the observed range
        e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        rng = (
            e.groupBy("user_id")
            .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
            .collect()
        )
        bounds = {r.user_id: (r.lo, r.hi) for r in rng}
        for r in rows:
            lo, hi = bounds[r.user_id]
            assert lo - 1e-6 <= r.ewma <= hi + 1e-6, r


class TestPagerank:
    def test_mass_conservation_and_positivity(self, spark):
        """Damping + dangling redistribution keep total PageRank mass at
        exactly 1; every node keeps at least the teleport floor."""
        from pubsub2bq_spark.operators.ml_ops import pagerank

        rows = pagerank(spark, SF_SMOKE).collect()
        n_nations = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").count()
        assert len(rows) == n_nations
        assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-4
        assert all(r.pagerank >= 0.15 / n_nations - 1e-9 for r in rows)


class TestAsofSnapshot:
    def test_at_most_one_interval_per_key(self, spark):
        from pubsub2bq_spark.operators.events_ops import asof_snapshot

        snap = asof_snapshot(spark, SF_SMOKE)
        dup = snap.groupBy("user_id").count().filter(F.col("count") > 1).count()
        assert dup == 0

    def test_snapshot_matches_manual_replay(self, spark):
        """The snapshot row per user is the latest event at or before the
        snapshot instant."""
        from pubsub2bq_spark.operators.events_ops import asof_snapshot
        from pubsub2bq_spark.tables import load

        snap_rows = asof_snapshot(spark, SF_SMOKE).collect()
        assert snap_rows
        t = snap_rows[0].snapshot_ts
        e = load(spark, SF_SMOKE, "events").filter(F.col("ts") <= t)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        expected = {
            (r.user_id, r.event_id)
            for r in e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id")
            .collect()
        }
        got = {(r.user_id, r.event_id) for r in snap_rows}
        assert got == expected


class TestKmeansParallelInit:
    def test_invariants(self, spark):
        """k-means|| output: dense unique ranks, positive weights that
        partition the corpus, and every center is a real vector id."""
        from pubsub2bq_spark.operators.ml_ops import KPP_K, kmeans_parallel_init
        from pubsub2bq_spark.tables import load

        rows = kmeans_parallel_init(spark, SF_SMOKE).collect()
        n_vecs = load(spark, SF_SMOKE, "embeddings").count()
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(len(rows))) and len(rows) <= KPP_K
        assert all(r.weight > 0 for r in rows)
        # weights of the TOP-K candidates cannot exceed the corpus; the
        # full candidate set's weights partition it exactly.
        assert sum(r.weight for r in rows) <= n_vecs
        vec_ids = {
            r.vec_id for r in load(spark, SF_SMOKE, "embeddings").collect()
        }
        assert all(r.vec_id in vec_ids for r in rows)
        # weights are ranked non-increasing (ties broken by vec_id asc)
        ws = [r.weight for r in sorted(rows, key=lambda r: r.rank)]
        assert ws == sorted(ws, reverse=True)


class TestRetryBackoff:
    def test_timeline_shape(self, spark):
        """Every nacked message gets exactly max_attempts rows; delays
        double from minimum_backoff and never reach the 600s cap, so the
        closed-form cumulative schedule is exact."""
        from pubsub2bq_spark.operators.cdc_pipeline import retry_backoff
        from pubsub2bq_spark.plans.pipeline_spec import RetryPolicy

        policy = RetryPolicy()
        rows = retry_backoff(spark, SF_SMOKE).collect()
        assert rows
        by_msg: dict = {}
        for r in rows:
            by_msg.setdefault(r.event_id, []).append(r)
        for msg_rows in by_msg.values():
            msg_rows.sort(key=lambda r: r.attempt)
            assert [r.attempt for r in msg_rows] == list(
                range(1, policy.max_attempts + 1)
            )
            backoffs = [r.backoff_s for r in msg_rows]
            assert backoffs[0] == 0
            assert backoffs[1:] == [60, 120, 240, 480]
            assert max(backoffs) < 600  # default maximum_backoff never binds
            times = [r.redeliver_ts for r in msg_rows]
            assert times == sorted(times)  # strictly later redeliveries
            assert [r.dead_lettered for r in msg_rows] == [
                False, False, False, False, True,
            ]


class TestMinhashRecallHarness:
    def test_metric_bounds(self, spark):
        """The quality counters are internally consistent: verified and
        hits are subsets, ratios live in [0, 1]."""
        from pubsub2bq_spark.operators.llm_dedup import minhash_recall

        row = minhash_recall(spark, SF_SMOKE).collect()[0]
        assert 0 <= row.n_verified <= row.n_cand
        assert 0 <= row.n_hit_seq <= row.n_truth_seq
        if row.n_cand:
            assert 0.0 <= row.precision_true <= 1.0
        if row.n_truth_seq:
            assert 0.0 <= row.recall_seq <= 1.0


class TestAnnIvfHier:
    def test_partition_and_hierarchy(self, spark):
        """Routing is a partition of the corpus: member counts sum to n,
        each occupied cell appears once and under exactly one supercell,
        and supercell ids stay within the ceil(sqrt(k)) budget."""
        import math

        from pubsub2bq_spark.operators.ml_ops import (
            HIER_CELL_FLOOR,
            ann_ivf_hier,
        )

        rows = ann_ivf_hier(spark, SF_SMOKE).collect()
        n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
        k = max(HIER_CELL_FLOOR, math.ceil(math.sqrt(n)))
        s = math.ceil(math.sqrt(k))
        assert sum(r.n_vecs for r in rows) == n
        assert len({r.cid for r in rows}) == len(rows)  # one row per cell
        assert all(0 <= r.sid < s for r in rows)
        assert all(0 <= r.cid < k for r in rows)
        assert all(r.n_vecs > 0 for r in rows)
        assert all(r.min_vec_id is not None for r in rows)

    def test_flat_agreement(self, spark):
        """Hierarchical (supercell-first) routing lands most vectors in
        the same cell flat argmin over all k cells would pick — the
        routing approximation is a boundary effect, not a rewrite of
        the assignment."""
        from pubsub2bq_spark.operators.llm_similarity import _dvec
        from pubsub2bq_spark.operators.ml_ops import (
            _assign,
            _hier_build,
            _hier_route,
        )
        from pubsub2bq_spark.tables import load, materialize

        v = (
            load(spark, SF_SMOKE, "embeddings")
            .select("vec_id", _dvec("embedding").alias("v"))
            .transform(materialize)
        )
        n = v.count()
        cents, sc1, cmap = _hier_build(v, n)
        flat = _assign(v, cents).select("vec_id", F.col("cid").alias("flat_cid"))
        hier = _hier_route(v, sc1, cmap)
        agree = (
            hier.join(flat, "vec_id")
            .agg(F.avg((F.col("cell_id") == F.col("flat_cid")).cast("double")))
            .first()[0]
        )
        assert agree >= 0.6, f"flat-agreement {agree:.2f} below floor"


def test_embedding_pca_component_is_unit_ish_and_dominant(spark):
    import math

    from pubsub2bq_spark.operators.llm_similarity import DIM
    from pubsub2bq_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    out = all_queries()["embedding_pca"].spark(spark, SF_SMOKE).collect()
    assert len(out) == DIM
    loadings = {r["dim"]: r["loading"] for r in out}
    assert set(loadings) == set(range(DIM))
    # max-abs rescale (not L2) => the largest |loading| is ~1
    mx = max(abs(v) for v in loadings.values())
    assert 0.99 <= mx <= 1.0
    # sign canonicalization: the argmax-|v| dim is positive
    k_star = max(loadings, key=lambda d: (abs(loadings[d]), -d))
    assert loadings[k_star] > 0
    # the eigenvalue estimate is positive (top component of a PSD matrix)
    eig = out[0]["eigval"]
    assert all(abs(r["eigval"] - eig) < 1e-12 for r in out)
    assert eig > 0
    # L2 norm is within [1, sqrt(DIM)] by the max-abs convention
    norm = math.sqrt(sum(v * v for v in loadings.values()))
    assert 1.0 <= norm <= math.sqrt(DIM)


def test_embedding_whiten_residual_nonnegative_and_bounded(spark):
    from pyspark.sql import functions as F

    from pubsub2bq_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    out = all_queries()["embedding_whiten"].spark(spark, SF_SMOKE)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("resid_sq") < -1e-9).cast("int")).alias("neg"),
        F.avg(F.abs(F.col("proj"))).alias("mean_abs_proj"),
    ).collect()[0]
    assert row["n"] > 0 and row["neg"] == 0
    # projection onto the dominant direction captures real variance
    assert row["mean_abs_proj"] > 0


class TestHierRouteEmptySupercell:
    def test_probed_empty_supercell_falls_back(self, spark):
        """A supercell that lost every cell in the cmap reassignment
        must contribute NO candidates (the SQL twin's inner-join
        behavior) — not null-poison the flattened candidate array.
        Constructed directly: sid 0 is nearest to the query vector but
        owns no cells, so routing must fall back to sid 1's cells."""
        from pyspark.sql import functions as SF

        from pubsub2bq_spark.operators.ml_ops import _hier_route

        v = spark.createDataFrame(
            [(1, [0.0, 0.0])], "vec_id long, v array<double>"
        )
        sc1 = spark.createDataFrame(
            [(0, [0.1, 0.0]), (1, [5.0, 0.0])],
            "cid int, c array<double>",
        )
        cmap = spark.createDataFrame(
            [(10, [4.0, 0.0], 1), (11, [6.0, 0.0], 1)],
            "cell_id int, cc array<double>, sid int",
        )
        rows = _hier_route(v, sc1, cmap, probes=2).collect()
        assert len(rows) == 1
        assert (rows[0].sid, rows[0].cell_id) == (1, 10)
