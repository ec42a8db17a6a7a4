"""Semi-structured (VARIANT) operators.

Spark 4 made VARIANT a first-class type: ``parse_json`` builds a binary
variant value once, and ``variant_get`` extracts typed paths from it
without re-parsing the JSON text per extraction — the engine-native way
to query schemaless columns (the reference's Pub/Sub ``attributes`` /
untyped JSON payloads; our ``events.props``). This module complements
``json_extract`` (relational.py), which exercises the string-function
path (``get_json_object``): same semantics, different physical plan —
VARIANT parses once into a columnar binary encoding, the string path
re-parses per field.

Reference parity: the reference's messages carry schemaless JSON
attributes alongside typed payloads (README.md:290-295); BigQuery's
analog of this operator is its JSON type + JSON_VALUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load


@register(
    "variant_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               count(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) >= 50
                          THEN 1 END) AS n_high,
               round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k,
               max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    doc="VARIANT-typed semi-structured extraction: parse the schemaless "
        "events.props JSON into a VARIANT value once (parse_json), then "
        "pull typed paths out of it with variant_get — per-type event "
        "counts, high-k counts, and k statistics. The engine-native twin "
        "of json_extract's string-function path: one parse feeding every "
        "extraction instead of one parse per field.",
    scale_notes="parse_json runs map-side exactly once per row and the "
                "variant binary never leaves the map stage — the "
                "aggregate ships only (event_type, k) pairs into one "
                "partial-combined shuffle of event-type cardinality. At "
                "100 TB the win over string re-parsing scales with paths "
                "extracted per row; persisting the VARIANT column in the "
                "sink table (BigQuery-JSON-style) also moves the parse "
                "to ingest time, making every later query shredding-"
                "cheap.",
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # One parse; every path extraction reads the same variant value.
    v = e.withColumn("pv", F.parse_json("props"))
    k = F.variant_get("pv", "$.k", "int")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(k >= 50, 1)).alias("n_high"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
    )
