"""Semantic invariants for the round-2 operators — properties the
DuckDB hash parity can't express (bounds, monotonicity, residuals,
synthetic contamination planted across splits)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pubsub2bq_spark.operators.event_analytics import SESSION_GAP_US, sessionize
from pubsub2bq_spark.operators.llm_corpus import (
    _EMAIL_RE,
    _PHONE_RE,
    _SSN_RE,
    contamination_check,
)
from pubsub2bq_spark.operators.llm_similarity import embedding_quantize
from pubsub2bq_spark.registry import all_queries
from tests.conftest import SF_SMOKE


class TestEmbeddingQuantize:
    def test_codes_bounded_and_error_within_half_step(self, spark):
        rows = embedding_quantize(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        for r in rows:
            codes = [int(c) for c in r.codes.split(",")]
            assert all(-127 <= c <= 127 for c in codes), r.vec_id
            # round-to-nearest ⇒ reconstruction error ≤ scale/2 (+ rounding
            # slack from the 6-dp display rounding of scale and max_err)
            assert r.max_err <= r.scale / 2 + 1e-6, (r.vec_id, r.max_err, r.scale)


class TestFunnel:
    def test_funnel_counts_monotone(self, spark):
        row = all_queries()["funnel_steps"].spark(spark, SF_SMOKE).collect()[0]
        assert row.n_view >= row.n_view_click >= row.n_view_click_purchase
        assert row.n_view_click_purchase >= 0


class TestSessionize:
    def test_gap_invariants(self, spark):
        """Consecutive sessions of one user are separated by more than the
        gap; events within a session never straddle a larger gap."""
        sess = sessionize(spark, SF_SMOKE)
        w_us = (
            sess.select(
                "user_id",
                "session_id",
                F.unix_micros("session_start").alias("s"),
                F.unix_micros("session_end").alias("e"),
                "n_events",
            )
            .orderBy("user_id", "session_id")
            .collect()
        )
        by_user: dict[int, list] = {}
        for r in w_us:
            assert r.e >= r.s and r.n_events >= 1
            by_user.setdefault(r.user_id, []).append(r)
        assert by_user, "no sessions produced"
        for rs in by_user.values():
            # session ids are 1..k dense per user
            assert [r.session_id for r in rs] == list(range(1, len(rs) + 1))
            for a, b in zip(rs, rs[1:]):
                assert b.s - a.e > SESSION_GAP_US, (a, b)


class TestPiiScrub:
    def test_no_residual_pii_after_scrub(self, spark):
        """Re-apply the module's own patterns to the scrubbed text: zero
        matches must remain (the invariant the md5 parity can't show)."""
        from pubsub2bq_spark.tables import load

        d = load(spark, SF_SMOKE, "documents")
        t = F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" SSN 123-45-6789."),
        )
        scrubbed = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _SSN_RE, "<SSN>"
            ),
            _PHONE_RE,
            "<PHONE>",
        )
        residual = (
            d.select(
                (
                    F.size(F.regexp_extract_all(scrubbed, F.lit(_EMAIL_RE), 0))
                    + F.size(F.regexp_extract_all(scrubbed, F.lit(_PHONE_RE), 0))
                    + F.size(F.regexp_extract_all(scrubbed, F.lit(_SSN_RE), 0))
                ).alias("n")
            )
            .agg(F.sum("n").alias("total"))
            .collect()[0]
            .total
        )
        assert residual == 0


def _split_of(doc_id: int) -> str:
    nib = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    return "train" if nib <= "c" else ("val" if nib <= "e" else "test")


class TestContamination:
    def test_planted_cross_split_duplicate_is_flagged(self, spark, tmp_path):
        """Plant an exact duplicate across the train/test hash-split in a
        synthetic documents table; the check must flag the test copy."""
        train_id = next(i for i in range(1, 1000) if _split_of(i) == "train")
        test_id = next(i for i in range(1, 1000) if _split_of(i) == "test")
        bystander = next(
            i for i in range(test_id + 1, 2000) if _split_of(i) == "test"
        )
        dup = "the quick brown fox jumps over the lazy dog " * 4
        other = "completely different content with nothing shared here " * 4
        df = spark.createDataFrame(
            [
                (train_id, dup, "en", "src0", len(dup)),
                (test_id, dup, "en", "src0", len(dup)),
                (bystander, other, "en", "src0", len(other)),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sf_dir = str(tmp_path)
        df.write.parquet(f"{sf_dir}/documents.parquet")
        flagged = contamination_check(spark, sf_dir).collect()
        assert [r.doc_id for r in flagged] == [test_id]
        assert flagged[0].n_train_matches == 1


class TestRound2Plans:
    """Plan-quality gates for the round-2 suites (same posture as
    test_plans.py: assert the property that survives a 1000-executor
    scale-up)."""

    def _plan(self, spark, key: str) -> str:
        import contextlib
        import io

        df = all_queries()[key].spark(spark, SF_SMOKE)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    @staticmethod
    def _n_nodes(plan: str, op: str) -> int:
        """Count physical nodes by their detail header '(N) <op>' —
        formatted explain prints every node twice (tree + details)."""
        import re

        return len(re.findall(rf"^\(\d+\) {re.escape(op)}", plan, re.M))

    def test_q19_fact_never_shuffles(self, spark):
        """Q19's OR-of-ANDs must resolve as a broadcast join: no
        sort-merge, no fact-side exchange before the aggregate."""
        plan = self._plan(spark, "tpch_q19")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_q9_prefix_filter_pushed(self, spark):
        """p_name LIKE 'red%' must reach the part scan as a pushed
        StringStartsWith filter."""
        plan = self._plan(spark, "tpch_q9")
        assert "StringStartsWith(p_name,red)" in plan.replace("'", ""), plan

    def test_map_only_corpus_ops_have_no_data_shuffle(self, spark):
        """pii_scrub / repetition_filter are pure map stages: the only
        allowed exchange is fan_out's round-robin scan widening."""
        for key in ("pii_scrub", "repetition_filter"):
            plan = self._plan(spark, key)
            n_exchange = self._n_nodes(plan, "Exchange")
            assert n_exchange <= 1, f"{key}: {n_exchange} exchanges\n{plan}"
            assert "RoundRobinPartitioning" in plan or n_exchange == 0, key
            assert "Join" not in plan, key

    def test_sessionize_single_user_partitioning(self, spark):
        """lag window, running sum, and the session aggregate must all
        plan inside ONE user_id hash partitioning."""
        plan = self._plan(spark, "sessionize")
        assert plan.count("hashpartitioning(user_id") <= 1, plan

    def test_multi_grain_rollup_single_scan(self, spark):
        """GROUPING SETS must expand one events scan, not three."""
        plan = self._plan(spark, "multi_grain_rollup")
        n_scans = self._n_nodes(plan, "Scan parquet")
        assert n_scans == 1, f"expected 1 scan, saw {n_scans}\n{plan}"
        assert "Expand" in plan


class TestStreamUpsertRecovery:
    def test_restart_resumes_from_checkpoint_and_disk_state(self, spark, tmp_path):
        """Kill-and-restart contract (T1 persistence): run the merge over
        2 spool files, 'restart' (fresh call, no in-memory state), add 2
        more files, run again with the SAME checkpoint — the second run
        must process only the new batches and the final state must equal
        the one-shot latest-per-key over all events."""
        import os

        from pubsub2bq_spark.operators.events_ops import (
            read_upsert_state,
            run_upsert_pipeline,
        )
        from pubsub2bq_spark.tables import load

        events = load(spark, SF_SMOKE, "events")
        spool = str(tmp_path / "spool")
        ckpt = str(tmp_path / "ckpt")
        state = str(tmp_path / "state")
        # phase 1: only the first half of the data exists
        half1 = events.filter(F.col("event_id") % 2 == 0)
        half2 = events.filter(F.col("event_id") % 2 == 1)
        half1.repartition(2).write.mode("overwrite").parquet(spool)
        run_upsert_pipeline(spark, spool, ckpt, state)
        n_versions_p1 = len(os.listdir(state))
        got1 = {r.user_id: r.event_id for r in read_upsert_state(spark, state).collect()}
        # phase 2: new files arrive; a FRESH pipeline call (no shared
        # python state) resumes from checkpoint + disk state
        half2.repartition(2).write.mode("append").parquet(spool)
        run_upsert_pipeline(spark, spool, ckpt, state)
        versions = sorted(os.listdir(state))
        # only the new batches produced versions — no reprocessing
        assert len(versions) == n_versions_p1 + 2, versions
        final = read_upsert_state(spark, state)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        expected = (
            events.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        assert {r.user_id: r.event_id for r in final.collect()} == {
            r.user_id: r.event_id for r in expected.collect()
        }
        # and phase-1 state was a genuine prefix (some user's latest changed)
        final_map = {r.user_id: r.event_id for r in final.collect()}
        assert got1 != final_map


class TestEmptyInputs:
    """Operators must degrade to empty results, not crash, when a table
    is empty — the behavior a scheduled 100 TB pipeline needs when a
    partition/day has no data."""

    def _empty_sf_dir(self, spark, tmp_path) -> str:
        from pubsub2bq_spark.tables import TABLE_NAMES, load

        sf = str(tmp_path)
        for t in TABLE_NAMES:
            load(spark, SF_SMOKE, t).limit(0).write.parquet(f"{sf}/{t}.parquet")
        return sf

    def test_corpus_and_event_ops_on_empty_tables(self, spark, tmp_path):
        sf = self._empty_sf_dir(spark, tmp_path)
        reg = all_queries()
        for key in (
            "sessionize",
            "cohort_retention",
            "multi_grain_rollup",
            "repetition_filter",
            "pii_scrub",
            "corpus_filter",
            "contamination_check",
            "embedding_quantize",
        ):
            assert reg[key].spark(spark, sf).count() == 0, key

    def test_funnel_on_empty_events_is_all_zero(self, spark, tmp_path):
        sf = self._empty_sf_dir(spark, tmp_path)
        row = all_queries()["funnel_steps"].spark(spark, sf).collect()[0]
        assert (row.n_view, row.n_view_click, row.n_view_click_purchase) == (0, 0, 0)


class TestBinaryLoadContent:
    def test_md5_matches_hashlib_over_same_files(self, spark):
        """Content-exactness against hashlib (independent of the DuckDB
        read_blob oracle, which only runs at the driver's sf0.01). The
        fingerprint is md5 over the UPPERCASE HEX encoding — DuckDB's
        md5() only accepts VARCHAR, so both engines hash the encoding."""
        import glob
        import os

        got = {
            r.file_name: (r.n_bytes, r.content_md5)
            for r in all_queries()["binary_load"].spark(spark, SF_SMOKE).collect()
        }
        expected = {}
        for p in glob.glob(f"{SF_SMOKE}/*.parquet"):
            raw = open(p, "rb").read()
            expected[os.path.basename(p)] = (
                len(raw),
                hashlib.md5(raw.hex().upper().encode("ascii")).hexdigest(),
            )
        assert got == expected


def test_recursive_cte_equals_graph_bfs(spark):
    """The SQL-native recursion and the DataFrame frontier loop are two
    mechanisms for one semantic — their reachability sets must agree."""
    from pubsub2bq_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    bfs = {
        (r["n_name"], r["hops"]) for r in qs["graph_bfs"].spark(spark, sf).collect()
    }
    rec = {
        (r["n_name"], r["hops"])
        for r in qs["recursive_cte"].spark(spark, sf).collect()
    }
    assert bfs == rec


def test_python_datasink_commit_protocol(spark):
    """The sink's two-phase commit: staged .tmp files are gone after
    commit, committed .json files + _SUCCESS manifest remain, and the
    manifest row count matches the table."""
    import glob
    import json as _json
    import os

    from pubsub2bq_spark.registry import all_queries
    from pubsub2bq_spark.sources.json_sink import register_json_sink
    from pubsub2bq_spark.tables import load, scratch_dir
    from tests.conftest import SF_SMOKE

    register_json_sink(spark)
    out = scratch_dir("pysink_test_")
    nation = load(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    nation.write.format("jsondirsink").mode("append").save(out)
    assert not glob.glob(os.path.join(out, "*.tmp"))
    files = glob.glob(os.path.join(out, "*.json"))
    assert files
    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = _json.load(f)
    assert manifest["rows"] == nation.count()
    assert manifest["files"] == len(files)
    # and the registered operator round-trips (driver-twin covers hash)
    n = all_queries()["python_datasink"].spark(spark, SF_SMOKE).count()
    assert n == nation.count()


def test_python_datasink_commit_idempotent_and_rolls_back(tmp_path):
    """ADVICE r8: commit() must (a) tolerate a retry after a partial
    earlier attempt (already-published files are skipped, not a
    FileNotFoundError), and (b) un-publish this attempt's renames when
    a rename fails midway, leaving only .tmp files for abort()."""
    import json as _json
    import os

    from pubsub2bq_spark.sources.json_sink import JsonDirWriter, _StagedFile

    out = str(tmp_path)
    w = JsonDirWriter({"path": out})

    def stage(name, rows=1):
        p = os.path.join(out, f"{name}.json.tmp")
        with open(p, "w") as f:
            f.write('{"x": 1}\n' * rows)
        return _StagedFile(p, rows)

    # (a) retry shape: file A already published by a prior attempt
    # (staged gone, final present), file B still staged.
    a, b = stage("part-a"), stage("part-b")
    os.rename(a.path, a.path[: -len(".tmp")])
    w.commit([a, b])  # must not raise
    assert os.path.exists(os.path.join(out, "part-a.json"))
    assert os.path.exists(os.path.join(out, "part-b.json"))
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert _json.load(f)["files"] == 2
    for p in os.listdir(out):
        os.remove(os.path.join(out, p))

    # (b) rollback shape: file D's staged copy vanishes (simulated task
    # cleanup race) — commit must fail, but file C must be BACK in
    # staged form and no final/.tmp-manifest files may remain.
    c, d = stage("part-c"), stage("part-d")
    os.remove(d.path)
    try:
        w.commit([c, d])
        raised = False
    except OSError:
        raised = True
    assert raised
    assert os.path.exists(c.path)  # un-published back to .tmp
    assert not os.path.exists(os.path.join(out, "part-c.json"))
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_SUCCESS.tmp"))
    # abort() sweeps the restaged file
    w.abort([c, None])
    assert not os.path.exists(c.path)


def test_python_datasink_retry_then_fail_unpublishes_prior_attempt(tmp_path):
    """ADVICE r9: the retry-then-fail shape — file A was published by a
    prior partial attempt, the RETRY fails on file B's vanished staging
    — must roll A back to .tmp too, so no published-but-unmanifested
    file survives the failed retry."""
    import os

    from pubsub2bq_spark.sources.json_sink import JsonDirWriter, _StagedFile

    out = str(tmp_path)
    w = JsonDirWriter({"path": out})

    def stage(name, rows=1):
        p = os.path.join(out, f"{name}.json.tmp")
        with open(p, "w") as f:
            f.write('{"x": 1}\n' * rows)
        return _StagedFile(p, rows)

    a, b = stage("part-a"), stage("part-b")
    os.rename(a.path, a.path[: -len(".tmp")])  # prior attempt published A
    os.remove(b.path)  # retry will fail at B
    try:
        w.commit([a, b])
        raised = False
    except OSError:
        raised = True
    assert raised
    assert os.path.exists(a.path)  # A un-published back to .tmp
    assert not os.path.exists(os.path.join(out, "part-a.json"))
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_SUCCESS.tmp"))
    w.abort([a, None])
    assert not os.path.exists(a.path)
