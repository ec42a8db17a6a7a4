"""Property tests for the scale-pattern operators: salting, z-order,
sessionization — each checked against an independent Python reference
on adversarial shapes (hypothesis), not just the fixed testdata."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestZOrderProperties:
    @given(a=st.integers(0, 255), b=st.integers(0, 255))
    @settings(max_examples=50, deadline=None)
    def test_morton_code_is_bijective(self, a, b):
        """Python reference: interleaving then de-interleaving recovers
        both inputs — the property that makes z-range pruning sound."""
        from pubsub2bq_spark.operators.physical_layout import Z_BITS

        z = 0
        for i in range(Z_BITS):
            z += ((a >> i) & 1) << (2 * i + 1)
            z += ((b >> i) & 1) << (2 * i)
        da = sum(((z >> (2 * i + 1)) & 1) << i for i in range(Z_BITS))
        db = sum(((z >> (2 * i)) & 1) << i for i in range(Z_BITS))
        assert (da, db) == (a, b)

    def test_spark_zval_matches_python(self, spark):
        from pubsub2bq_spark.operators.physical_layout import Z_BITS, _zval_col

        rows = [(a, b) for a in (0, 1, 127, 200, 255) for b in (0, 3, 128, 255)]
        df = spark.createDataFrame(rows, "a int, b int")
        got = {
            (r.a, r.b): r.z
            for r in df.select(
                "a", "b", _zval_col(F.col("a"), F.col("b")).alias("z")
            ).collect()
        }
        for a, b in rows:
            z = 0
            for i in range(Z_BITS):
                z += ((a >> i) & 1) << (2 * i + 1)
                z += ((b >> i) & 1) << (2 * i)
            assert got[(a, b)] == z, (a, b)


class TestSaltedJoinProperty:
    @given(
        orders=st.lists(
            st.tuples(st.integers(0, 5), st.integers(1, 1000)),  # (custkey, price)
            min_size=0,
            max_size=30,
        )
    )
    @settings(**SETTINGS)
    def test_salted_equals_plain_join(self, spark, orders):
        """Salting must be invisible in the result, including hot keys
        (every row same custkey) and dangling keys (no matching customer)."""
        from pubsub2bq_spark.operators.joins import N_JOIN_SALT

        cust = [(k, f"seg{k % 2}") for k in range(4)]  # custkeys 0-3 exist
        o = spark.createDataFrame(
            [(i, k, float(p)) for i, (k, p) in enumerate(orders)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        c = spark.createDataFrame(cust, "c_custkey long, c_mktsegment string")
        plain = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("t"))
        )
        salts = spark.range(N_JOIN_SALT).select(F.col("id").cast("int").alias("salt"))
        o_s = o.withColumn(
            "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_JOIN_SALT)).cast("int")
        )
        c_r = c.crossJoin(F.broadcast(salts))
        salted = (
            o_s.join(c_r, (o_s.o_custkey == c_r.c_custkey) & (o_s.salt == c_r.salt))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("t"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


class TestSessionizeProperty:
    @given(
        gaps=st.lists(st.integers(1, 7200), min_size=1, max_size=25),
    )
    @settings(**SETTINGS)
    def test_session_count_matches_python_reference(self, spark, gaps):
        """Random inter-event gaps (1s..2h): the operator's session count
        per user must equal a straight Python scan with the same rule."""
        from pubsub2bq_spark.operators.event_analytics import sessionize

        ts = [0]
        for g in gaps:
            ts.append(ts[-1] + g)
        base = 1_600_000_000
        rows = [
            (i, (base + t) * 1_000_000, 1, "view", 1.0) for i, t in enumerate(ts)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string, value double"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        import tempfile

        sf = tempfile.mkdtemp(prefix="sessprop_")
        df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
        got = sessionize(spark, sf).filter(F.col("user_id") == 1).count()
        expected = 1 + sum(1 for g in gaps if g > 1800)
        assert got == expected, (gaps, got, expected)
