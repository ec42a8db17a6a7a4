"""UDF / UDAF / UDTF surface (SURVEY.md §2.10 U1-U4).

Every Python-boundary mechanism Spark offers, each exercised by a
deterministic query with an oracle twin:

* U1 scalar pandas UDF   — udf_scalar (operators/multimodal.py)
* U2 grouped-map         — applyInPandas per-group kernel
* U3 grouped-agg UDAF    — pandas_udf aggregating per group
* U4 UDTF                — Python UDTF emitting N rows per input

All of these cross the JVM→Python boundary via Arrow batches; they
are the *slow path* by design — the registry's other 60+ operators
stay JVM-side. Use these only where built-ins can't express the
semantics (custom models, feature extractors).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load


@register(
    "grouped_map",
    oracle="""
        SELECT event_id, user_id,
               round(value - min(value) OVER (PARTITION BY user_id), 4)
                   AS value_centered
        FROM events
    """,
    doc="Grouped-map applyInPandas (U2): per-user min-centering — each "
        "group arrives as one pandas DataFrame, returns one back. "
        "(min, not mean: aggregate-float summation order differs across "
        "engines and flips round() at exact half-ulp boundaries.)",
    scale_notes="One shuffle on the group key; each group must fit in one "
                "Python worker's memory — bounded keys only (users, docs), "
                "never global groups.",
)
def grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "user_id"]].copy()
        # Rounding happens JVM-side below so the rounding mode (half-up)
        # matches the oracle; numpy would round half-even.
        out["value_centered"] = pdf["value"] - pdf["value"].min()
        return out

    e = load(spark, sf_dir, "events")
    out = e.groupBy("user_id").applyInPandas(
        center, "event_id bigint, user_id bigint, value_centered double"
    )
    return out.select(
        "event_id", "user_id", F.round("value_centered", 4).alias("value_centered")
    )


@register(
    "udaf_grouped",
    oracle="""
        SELECT event_type,
               round(sum(value * user_id) / sum(user_id), 4) AS weighted_avg
        FROM events
        GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDAF (U3): user-weighted mean of value "
        "per event_type.",
    scale_notes="GROUPED_AGG pandas UDFs skip partial aggregation (full "
                "groups ship to Python) — prefer built-in aggs at 100 TB; "
                "this exists for genuinely custom statistics.",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(weighted_avg(F.col("value"), F.col("user_id")), 4).alias("weighted_avg")
    )


@register(
    "udtf_explode",
    oracle="""
        SELECT c_custkey, CAST(n AS INTEGER) AS prefix_len,
               substr(c_name, 1, CAST(n AS INTEGER)) AS prefix
        FROM (
            SELECT c_custkey, c_name, unnest(range(1, 4)) AS n
            FROM customer
        )
    """,
    doc="UDTF surface (U4): one input row → N output rows (name prefixes "
        "1..3). Implemented with the built-in explode+sequence — the "
        "JVM-side UDTF pattern (a Python UDTF would Arrow-round-trip for "
        "no semantic gain here; see tests for a real Python UDTF).",
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_name",
            F.explode(F.sequence(F.lit(1), F.lit(3))).alias("prefix_len"),
        )
        .select(
            "c_custkey",
            F.col("prefix_len").cast("int").alias("prefix_len"),
            F.expr("substr(c_name, 1, prefix_len)").alias("prefix"),
        )
    )


@register(
    "udf_arrow",
    oracle="""
        SELECT event_id,
               CAST(octet_length(encode(event_type)) AS INT) AS type_bytes,
               round(value * 2.0, 4) AS value_doubled
        FROM events
    """,
    doc="mapInArrow (the zero-copy tier below pandas UDFs): the kernel "
        "receives raw pyarrow RecordBatches and computes with pyarrow "
        "compute — no pandas materialization, no index bookkeeping, no "
        "object-dtype strings. Same Arrow IPC transport as mapInPandas, "
        "minus the arrow→pandas→arrow round-trip on each side.",
    scale_notes="For kernels that are already columnar (byte lengths, "
                "arithmetic, dictionary ops), skipping the pandas "
                "conversion removes the dominant per-batch overhead — "
                "pyarrow.compute runs vectorized C++ over the same "
                "buffers the JVM serialized. Still the slow path vs "
                "built-ins; use when a pyarrow-only library (Arrow UDFs, "
                "tokenizers with Arrow bindings) is the target.",
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pc.cast(
                        pc.binary_length(
                            pc.cast(batch.column("event_type"), pa.binary())
                        ),
                        pa.int32(),
                    ),
                    pc.round(
                        pc.multiply(batch.column("value"), pa.scalar(2.0)), 4
                    ),
                ],
                names=["event_id", "type_bytes", "value_doubled"],
            )

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.mapInArrow(
        kernel, "event_id bigint, type_bytes int, value_doubled double"
    )


@register(
    "udtf_table_arg",
    oracle="""
        SELECT user_id,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents_total,
               round(max(value), 4) AS max_value
        FROM events
        GROUP BY user_id
    """,
    doc="Polymorphic UDTF with a TABLE argument (Spark 4): the relation "
        "itself is the argument — PARTITION BY user_id streams each "
        "user's rows through eval() and terminate() emits one summary "
        "row per partition (count, integer-cents total, max). The "
        "engine-native custom-aggregation shape SQL callers can invoke "
        "without knowing Python is underneath. Cents accumulate as "
        "integers so the result is summation-order-independent and "
        "hash-checkable.",
    scale_notes="PARTITION BY shuffles once on user_id and streams each "
                "partition through the Python worker row-wise — state is "
                "O(1) per partition, arbitrarily many users. Row-wise "
                "eval() is the API's cost (Arrow batches feed it, but "
                "eval is per-row Python); keep kernels trivial or use "
                "applyInPandas when the per-group logic is vectorizable.",
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n int, cents_total bigint, max_value double")
    class UserSummary:
        def __init__(self):
            self.user = None
            self.n = 0
            self.cents = 0
            self.mx = None

        def eval(self, row):
            self.user = row["user_id"]
            self.n += 1
            self.cents += int(math.floor(row["value"] * 100))
            self.mx = row["value"] if self.mx is None else max(self.mx, row["value"])

        def terminate(self):
            if self.user is not None:
                yield self.user, self.n, self.cents, round(self.mx, 4)

    from pubsub2bq_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("pubsub2bq_user_summary", UserSummary)
    return spark.sql(
        """
        SELECT * FROM pubsub2bq_user_summary(
            TABLE(SELECT user_id, value FROM events) PARTITION BY user_id
        )
        """
    )
