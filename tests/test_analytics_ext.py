"""Semantic invariants for batch-E operators: anomaly detection,
attribution, inverted index, PMI, winsorization."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from pubsub2bq_spark.operators.event_analytics import (
    ANOMALY_MIN_OBS,
    anomaly_detect,
    attribution_last_touch,
)
from pubsub2bq_spark.operators.ml_ops import winsorize
from pubsub2bq_spark.operators.text_index import (
    PMI_MAX_DF,
    PMI_MIN_DF,
    PMI_MIN_PAIR,
    POSTING_SAMPLE,
    inverted_index,
    word_pmi,
)
from tests.conftest import SF_SMOKE

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, rows) -> str:
    sf = str(tmp_path)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{sf}/events.parquet")
    return sf


def _t(minutes: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=minutes)


class TestAnomalyDetect:
    def test_planted_outlier_flagged_and_cold_start_null(self, spark, tmp_path):
        """Steady 10.0 baseline then a 1000.0 spike: the spike is the only
        anomaly; the first ANOMALY_MIN_OBS rows have NULL z (cold start)."""
        rows = [
            (i, _t(i), 1, "view", 10.0 + (i % 3) * 0.1, "{}") for i in range(10)
        ] + [(10, _t(10), 1, "view", 1000.0, "{}")]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.event_id: r for r in anomaly_detect(spark, sf).collect()}
        assert got[10].is_anomaly and got[10].z_score > 3
        assert all(not got[i].is_anomaly for i in range(10))
        # rows 0..ANOMALY_MIN_OBS-1 have < MIN_OBS preceding rows → NULL
        for i in range(ANOMALY_MIN_OBS):
            assert got[i].z_score is None, i

    def test_flag_implies_score(self, spark):
        bad = (
            anomaly_detect(spark, SF_SMOKE)
            .filter(F.col("is_anomaly") & (F.abs(F.col("z_score")) <= 3))
            .count()
        )
        assert bad == 0


class TestAttribution:
    def test_known_sequence(self, spark, tmp_path):
        """click(t0) → purchase(t1): attributed. purchase with no prior
        click: not. purchase 8 days after the click: outside window."""
        rows = [
            (1, _t(0), 1, "click", 1.0, "{}"),
            (2, _t(30), 1, "purchase", 50.0, "{}"),
            (3, _t(0), 2, "purchase", 20.0, "{}"),
            (4, _t(0), 3, "click", 1.0, "{}"),
            (5, _t(8 * 24 * 60), 3, "purchase", 30.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r.purchase_id: r for r in attribution_last_touch(spark, sf).collect()}
        assert got[2].attributed and got[2].attributed_click_id == 1
        assert not got[3].attributed and got[3].attributed_click_id is None
        assert not got[5].attributed and got[5].attributed_click_id is None

    def test_purchases_preserved(self, spark):
        from pubsub2bq_spark.tables import load

        n_purch = (
            load(spark, SF_SMOKE, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert attribution_last_touch(spark, SF_SMOKE).count() == n_purch


class TestInvertedIndex:
    def test_df_and_posting_sorted(self, spark):
        rows = inverted_index(spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            posting = [int(x) for x in r.posting_sample.split(",")]
            assert posting == sorted(posting)
            assert len(posting) == min(r.df, POSTING_SAMPLE)
            assert len(set(posting)) == len(posting)


class TestWordPmi:
    def test_support_and_formula(self, spark):
        rows = word_pmi(spark, SF_SMOKE).collect()
        assert rows
        idx = {r.word: r.df for r in inverted_index(spark, SF_SMOKE).collect()}
        n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
        for r in rows:
            df_a, df_b = idx[r.word_a], idx[r.word_b]
            assert PMI_MIN_DF <= df_a <= PMI_MAX_DF
            assert PMI_MIN_DF <= df_b <= PMI_MAX_DF
            assert PMI_MIN_PAIR <= r.n_pair <= min(df_a, df_b)
            expected = math.log(r.n_pair * n_docs / (df_a * df_b))
            assert abs(r.pmi - expected) < 1e-5


class TestWinsorize:
    def test_clamped_range_and_clip_flag(self, spark):
        out = winsorize(spark, SF_SMOKE)
        # winsorized stays within the group's observed (rounded) band
        agg = (
            out.groupBy("event_type")
            .agg(
                F.min("winsorized").alias("wlo"),
                F.max("winsorized").alias("whi"),
                F.sum(F.col("clipped").cast("int")).alias("n_clip"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for r in agg:
            # ~10% of mass sits outside [p5, p95]
            assert 0 < r.n_clip < 0.2 * r.n, r
        bad = out.filter(
            (F.col("winsorized") > F.col("value")) & ~F.col("clipped")
            | (F.col("winsorized") < F.col("value")) & ~F.col("clipped")
        ).count()
        assert bad == 0


class TestIntervalJoinBinned:
    def test_matches_naive_theta_join(self, spark):
        """The binned equi-join must produce exactly the naive
        containment join's aggregate."""
        from pubsub2bq_spark.operators.joins import (
            INTERVAL_LEN_S,
            INTERVAL_STEP_S,
            N_INTERVALS,
            interval_join_binned,
        )
        from pubsub2bq_spark.tables import load

        got = {
            r.interval_id: (r.n_events, r.total)
            for r in interval_join_binned(spark, SF_SMOKE).collect()
        }
        assert len(got) == N_INTERVALS
        e = load(spark, SF_SMOKE, "events").select(
            F.unix_timestamp("ts").alias("ep"), "value"
        )
        t0_row = e.agg(
            (F.floor(F.unix_timestamp(F.min(F.timestamp_seconds("ep"))) / 86400) * 86400)
        ).first()[0]
        pts = [(r.ep, r.value) for r in e.collect()]
        for i in range(N_INTERVALS):
            s = t0_row + i * INTERVAL_STEP_S
            hit = [(ep, v) for ep, v in pts if s <= ep < s + INTERVAL_LEN_S]
            assert got[i][0] == len(hit), i
            assert abs(got[i][1] - round(sum(v for _, v in hit), 4)) < 1e-6, i


class TestBigramLogprob:
    def test_counts_and_positivity(self, spark):
        from pubsub2bq_spark.operators.text_index import bigram_logprob
        from pubsub2bq_spark.tables import load

        rows = bigram_logprob(spark, SF_SMOKE).collect()
        assert rows
        toks = {
            r.doc_id: r.n
            for r in load(spark, SF_SMOKE, "documents")
            .select(
                "doc_id",
                F.size(
                    F.filter(
                        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != ""
                    )
                ).alias("n"),
            )
            .collect()
        }
        for r in rows:
            assert r.n_bigrams == toks[r.doc_id] - 1
            assert r.bigram_nll > 0


class TestDatasetMixture:
    def test_balanced_and_deterministic(self, spark):
        from pubsub2bq_spark.operators.training_prep import dataset_mixture
        from pubsub2bq_spark.tables import load

        out = dataset_mixture(spark, SF_SMOKE)
        counts = {r.source: r.n for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        src_counts = {
            r.source: r.n
            for r in load(spark, SF_SMOKE, "documents")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        m = min(src_counts.values())
        assert set(counts) == set(src_counts)
        assert all(v == m for v in counts.values())
        a = sorted(map(tuple, out.collect()))
        b = sorted(map(tuple, dataset_mixture(spark, SF_SMOKE).collect()))
        assert a == b


def test_kneser_ney_matches_hand_computation(spark, tmp_path):
    """The operator's NLL must equal an independent pure-Python
    interpolated-KN computation (not just the DuckDB restatement), and
    the implied model must normalize: sum_w2 P_KN(w2|w1) == 1."""
    import math
    from collections import Counter

    from pubsub2bq_spark.operators.text_index import (
        KN_DISCOUNT,
        kneser_ney_logprob,
    )

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "a cat and a dog met"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    bigrams = []
    for _i, t in docs:
        w = t.split()
        bigrams += list(zip(w, w[1:]))
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    n1h = Counter(w1 for w1, _ in c12)          # distinct continuations
    cont = Counter(w2 for _, w2 in c12)         # distinct left contexts
    btypes = len(c12)
    D = KN_DISCOUNT

    def p_kn(w1, w2):
        return (c12[(w1, w2)] - D) / c1[w1] + D * n1h[w1] / c1[w1] * (
            cont[w2] / btypes
        )

    # normalization: summing over every w2 in the vocab must give 1
    vocab = set(w2 for _, w2 in bigrams) | set(w1 for w1, _ in bigrams)
    for w1 in c1:
        total = sum(max(c12[(w1, w2)] - D, 0.0) / c1[w1] for w2 in vocab)
        total += D * n1h[w1] / c1[w1] * sum(cont[w2] / btypes for w2 in vocab)
        assert abs(total - 1.0) < 1e-9, (w1, total)

    got = {r["doc_id"]: r for r in kneser_ney_logprob(spark, sf).collect()}
    for i, t in docs:
        w = t.split()
        bs = list(zip(w, w[1:]))
        want = round(sum(-math.log(p_kn(a, b)) for a, b in bs) / len(bs), 6)
        assert got[i]["n_bigrams"] == len(bs)
        assert abs(got[i]["kn_nll"] - want) < 1e-6, (i, got[i]["kn_nll"], want)
