"""CDC semantics as oracle-checkable batch queries: SURVEY.md §2.2/§2.3.

Each query deterministically synthesizes a Debezium-shaped CDC
envelope FROM the `events` table (so the DuckDB oracle can state the
expected flat result over the same parquet), then applies the real
transform functions from ``pubsub2bq_spark.streaming.reconcile`` —
the same code the streaming pipeline runs. The oracle therefore
checks the transform end-to-end, not a reimplementation.

Deterministic envelope derivation (both sides agree on it):
  op        = 'd' if event_type='error', 'c' if 'signup', else 'u'
  after     = payload struct  (NULL when op='d')
  before    = payload struct  (NULL when op!='d')
  source.db = 'debezium_test' if user_id % 2 = 0 else 'otherdb'
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.streaming.reconcile import (
    include_list_filter,
    project_to_sink_schema,
    rewrite_deletes,
    split_corrupt,
    unwrap_envelope,
)
from pubsub2bq_spark.tables import load

PAYLOAD_COLS = ["event_id", "user_id", "value"]

def _op():
    return (
        F.when(F.col("event_type") == "error", "d")
        .when(F.col("event_type") == "signup", "c")
        .otherwise("u")
    )


def make_envelope(events: DataFrame) -> DataFrame:
    """events → Debezium-shaped envelope {before, after, op, ts_ms, source}."""
    payload = F.struct(*[F.col(c) for c in PAYLOAD_COLS])
    op = _op()
    return events.select(
        F.when(op == "d", payload).alias("before"),
        F.when(op != "d", payload).alias("after"),
        op.alias("op"),
        (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
        F.struct(
            F.when(F.col("user_id") % 2 == 0, "debezium_test")
            .otherwise("otherdb")
            .alias("db"),
            F.lit("people").alias("table"),
        ).alias("source"),
    )


_OP_SQL = """CASE WHEN event_type = 'error' THEN 'd'
                  WHEN event_type = 'signup' THEN 'c'
                  ELSE 'u' END"""


@register(
    "unwrap",
    oracle=f"""
        SELECT event_id, user_id, round(value, 4) AS value, {_OP_SQL} AS op
        FROM events
    """,
    doc="Envelope unwrap (ExtractNewRecordState): flatten "
        "{{before,after,op,ts_ms}} to the new-row state; deletes fall back "
        "to `before` so the full row survives "
        "(/root/reference/conf/debezium.properties:17-18).",
    scale_notes="Pure struct-field projection — codegen'd, no shuffle.",
)
def unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = make_envelope(load(spark, sf_dir, "events"))
    flat = unwrap_envelope(env, PAYLOAD_COLS)
    return flat.select(
        "event_id", "user_id", F.round("value", 4).alias("value"), "op"
    )


@register(
    "deleted_rewrite",
    oracle=f"""
        SELECT event_id, user_id,
               CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
        FROM events
    """,
    doc="Delete rewrite: deletes become normal rows with __deleted='true' "
        "(STRING — the reference's stringly-typed boolean; "
        "/root/reference/conf/debezium.properties:19, README.md:290).",
)
def deleted_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = make_envelope(load(spark, sf_dir, "events"))
    flat = rewrite_deletes(unwrap_envelope(env, PAYLOAD_COLS))
    return flat.select("event_id", "user_id", "__deleted")


@register(
    "include_filter",
    oracle=f"""
        SELECT event_id, user_id, {_OP_SQL} AS op
        FROM events
        WHERE user_id % 2 = 0
    """,
    doc="database/table include-list on envelope source metadata "
        "(/root/reference/conf/debezium.properties:11-12).",
)
def include_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = make_envelope(load(spark, sf_dir, "events"))
    kept = include_list_filter(env, db="debezium_test", table="people")
    return unwrap_envelope(kept, PAYLOAD_COLS).select("event_id", "user_id", "op")


# Topic schema (v1): event_id, user_id, value.  Sink schema: topic cols + a
# sink-only `age` column → NULL-filled.  Payload carries an extra field
# `phone` not in the topic schema → silently dropped.
_TOPIC_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)
_SINK_SCHEMA = T.StructType(
    _TOPIC_SCHEMA.fields + [T.StructField("age", T.LongType())]
)


@register(
    "schema_project",
    oracle="""
        SELECT event_id, user_id, round(value, 4) AS value,
               CAST(NULL AS BIGINT) AS age
        FROM events
    """,
    doc="Sink-schema projection truth table: payload field `phone` not in "
        "the topic schema is silently dropped (use_topic_schema=true wins "
        "over drop_unknown_fields=false; /root/reference/README.md:288-290) "
        "and sink-only `age` is NULL-filled (README.md:363-371).",
)
def schema_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # Payload with an extra field the topic schema doesn't know about.
    payload = e.select(
        "event_id", "user_id", "value", F.lit("555-0100").alias("phone")
    )
    out = project_to_sink_schema(payload, _TOPIC_SCHEMA, _SINK_SCHEMA)
    return out.select("event_id", "user_id", F.round("value", 4).alias("value"), "age")


@register(
    "null_fill",
    oracle="""
        SELECT event_id,
               CAST(NULL AS VARCHAR) AS city,
               CAST(NULL AS BIGINT)  AS age
        FROM events
    """,
    doc="NULL-fill for sink-only columns (`age` lands NULL while delivery "
        "continues; /root/reference/README.md:363-371).",
)
def null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sink = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("city", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    topic = T.StructType([T.StructField("event_id", T.LongType())])
    return project_to_sink_schema(e.select("event_id"), topic, sink)


@register(
    "schema_validate",
    oracle="""
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN NULL
                    ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k,
               (event_id % 10 = 0) AS is_corrupt
        FROM events
    """,
    doc="Topic schema validation: permissive JSON parse splits valid rows "
        "from corrupt ones (corrupt → dead-letter path; every 10th payload "
        "is deterministically truncated to simulate malformed messages).",
    scale_notes="from_json is JVM-side Jackson; the split is two filters on "
                "one parsed column — single pass, no Python.",
)
def schema_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wire = e.select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.substring("props", 1, 3))
        .otherwise(F.col("props"))
        .alias("data"),
    )
    schema = T.StructType([T.StructField("k", T.LongType())])
    valid, corrupt = split_corrupt(wire, "data", schema)
    return valid.select("event_id", "k", F.lit(False).alias("is_corrupt")).unionByName(
        corrupt.select("event_id", F.lit(None).cast("bigint").alias("k"),
                       F.lit(True).alias("is_corrupt"))
    )


@register(
    "schema_revision",
    oracle="""
        SELECT event_id,
               CASE WHEN event_id % 2 = 0 THEN 'r1' ELSE 'r2' END AS revision_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(NULL AS VARCHAR) AS extra
        FROM events
    """,
    doc="Schema-revision registry: messages carry a revision id attribute "
        "(googclient_schemarevisionid, /root/reference/README.md:293-295); "
        "each revision parses with its own StructType, results union with a "
        "stamped revision column.",
)
def schema_revision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.streaming.schema_registry import SchemaRegistry

    e = load(spark, sf_dir, "events")
    reg = SchemaRegistry()
    reg.add("r1", T.StructType([T.StructField("k", T.LongType())]))
    reg.add(
        "r2",
        T.StructType([T.StructField("k", T.LongType()), T.StructField("extra", T.StringType())]),
    )
    wire = e.select(
        "event_id",
        F.col("props").alias("data"),
        F.when(F.col("event_id") % 2 == 0, "r1").otherwise("r2").alias("revision_id"),
    )
    return reg.parse(wire, data_col="data", revision_col="revision_id")


def _compat_fixture_registry():
    """Five revisions of the reference's users topic schema, chosen so
    the pairwise verdicts exercise every compatibility class: r2 adds a
    nullable field (FULL vs r1), r3 adds a REQUIRED field (FORWARD-only
    vs r1), r4 drops required `zipcode` (BACKWARD-only vs r1 — the
    hard-halt evolution, /root/reference/README.md:441-450), r5 changes
    `zipcode`'s type (NONE vs r1)."""
    from pubsub2bq_spark.streaming.schema_registry import SchemaRegistry

    f, L, S, D = T.StructField, T.LongType(), T.StringType(), T.DoubleType()
    base = [f("id", L, False), f("email", S, True), f("zipcode", L, False)]
    reg = SchemaRegistry()
    reg.add("r1", T.StructType(base))
    reg.add("r2", T.StructType(base + [f("age", L, True)]))
    reg.add("r3", T.StructType(base + [f("score", D, False)]))
    reg.add("r4", T.StructType(base[:2]))
    reg.add("r5", T.StructType(base[:2] + [f("zipcode", S, False)]))
    return reg


# The oracle restates the reader/writer resolution RULES in SQL over an
# embedded (rev, field, type, nullable) relation mirroring the fixture
# — an independent derivation of every pair's verdict, not a dump of
# the expected output.
_SCHEMA_COMPAT_SQL = """
    WITH fields(rev, fname, ftype, is_nullable) AS (
        SELECT * FROM (VALUES
            ('r1','id','bigint',false), ('r1','email','varchar',true),
            ('r1','zipcode','bigint',false),
            ('r2','id','bigint',false), ('r2','email','varchar',true),
            ('r2','zipcode','bigint',false), ('r2','age','bigint',true),
            ('r3','id','bigint',false), ('r3','email','varchar',true),
            ('r3','zipcode','bigint',false), ('r3','score','double',false),
            ('r4','id','bigint',false), ('r4','email','varchar',true),
            ('r5','id','bigint',false), ('r5','email','varchar',true),
            ('r5','zipcode','varchar',false)
        ) v
    ),
    revs AS (SELECT DISTINCT rev FROM fields),
    pairs AS (
        SELECT a.rev AS old_rev, b.rev AS new_rev
        FROM revs a JOIN revs b ON a.rev <> b.rev
    ),
    verdicts AS (
        SELECT p.old_rev, p.new_rev,
            NOT EXISTS (
                SELECT 1 FROM fields r WHERE r.rev = p.new_rev AND (
                    (NOT r.is_nullable AND NOT EXISTS (
                        SELECT 1 FROM fields w
                        WHERE w.rev = p.old_rev AND w.fname = r.fname))
                    OR EXISTS (
                        SELECT 1 FROM fields w
                        WHERE w.rev = p.old_rev AND w.fname = r.fname
                          AND (w.ftype <> r.ftype
                               OR (w.is_nullable AND NOT r.is_nullable)))
                )
            ) AS backward,
            NOT EXISTS (
                SELECT 1 FROM fields r WHERE r.rev = p.old_rev AND (
                    (NOT r.is_nullable AND NOT EXISTS (
                        SELECT 1 FROM fields w
                        WHERE w.rev = p.new_rev AND w.fname = r.fname))
                    OR EXISTS (
                        SELECT 1 FROM fields w
                        WHERE w.rev = p.new_rev AND w.fname = r.fname
                          AND (w.ftype <> r.ftype
                               OR (w.is_nullable AND NOT r.is_nullable)))
                )
            ) AS forward
        FROM pairs p
    )
    SELECT old_rev, new_rev, backward, forward,
           CASE WHEN backward AND forward THEN 'FULL'
                WHEN backward THEN 'BACKWARD'
                WHEN forward THEN 'FORWARD'
                ELSE 'NONE' END AS verdict
    FROM verdicts
"""


@register(
    "schema_compat",
    oracle=_SCHEMA_COMPAT_SQL,
    doc="Schema-revision compatibility verdicts (completes D5, VERDICT "
        "r10 #5): classify every ordered revision pair in the registry "
        "as BACKWARD / FORWARD / FULL / NONE per the standard registry "
        "reader-writer rules — the check a schema registry performs "
        "before accepting revision 3afd3cc8 "
        "(/root/reference/README.md:293-295). Add-nullable is FULL, "
        "add-required is FORWARD-only, drop-required is BACKWARD-only "
        "(forward-BREAKING: the zipcode hard-halt, README.md:441-450 — "
        "tests/test_cdc_golden.py ties the forward=false verdict to "
        "mismatch_halt's actual halt), type change is NONE.",
    scale_notes="Control-plane metadata: the registry is KB-sized DDL "
                "history regardless of corpus size, so the pairwise "
                "check is a driver-side verdict over StructTypes — the "
                "one place collect-free discipline does not apply "
                "because there is no data, only schemas.",
)
def schema_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = _compat_fixture_registry()
    rows = []
    for old in reg.revision_ids():
        for new in reg.revision_ids():
            if old == new:
                continue
            backward, forward, verdict = reg.compat(old, new)
            rows.append((old, new, backward, forward, verdict))
    return spark.createDataFrame(
        rows,
        "old_rev string, new_rev string, backward boolean, "
        "forward boolean, verdict string",
    )


AVRO_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)

AVRO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("id", T.IntegerType()),
        T.StructField("email", T.StringType()),
        T.StructField("zipcode", T.IntegerType()),
        T.StructField("deleted", T.StringType()),
        T.StructField("is_corrupt", T.BooleanType()),
    ]
)


def _avro_encode_batches(batches):
    """Arrow-batched encode: (event_id, id, first_name, ..., __deleted)
    → (event_id, data BINARY) — one Avro binary record per row."""
    import pandas as pd

    from pubsub2bq_spark.functions.avro_codec import TOPIC_FIELDS, encode_record

    names = [n for n, _ in TOPIC_FIELDS]
    for pdf in batches:
        recs = pdf[names].to_dict("records")
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "data": [encode_record(r) for r in recs],
            }
        )


def _avro_decode_batches(batches):
    """Arrow-batched decode+validate: corrupt wire bytes (truncation,
    trailing garbage, overlong varints) go down the dead-letter flag, the
    rest unwrap to typed columns."""
    import pandas as pd

    from pubsub2bq_spark.functions.avro_codec import decode_record

    for pdf in batches:
        rows = []
        for eid, data in zip(pdf["event_id"], pdf["data"]):
            try:
                rec = decode_record(bytes(data))
                rows.append(
                    (eid, rec["id"], rec["email"], rec["zipcode"],
                     rec["__deleted"], False)
                )
            except (ValueError, UnicodeDecodeError):
                rows.append((eid, None, None, None, None, True))
        yield pd.DataFrame(
            rows,
            columns=["event_id", "id", "email", "zipcode", "deleted", "is_corrupt"],
        )


@register(
    "avro_validate",
    oracle="""
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN NULL
                    ELSE CAST(event_id % 2147483647 AS INTEGER) END AS id,
               CASE WHEN event_id % 10 = 0 THEN NULL
                    ELSE 'u' || CAST(user_id AS VARCHAR) || '@example.com'
                    END AS email,
               CASE WHEN event_id % 10 = 0 THEN NULL
                    ELSE CAST(user_id % 100000 AS INTEGER) END AS zipcode,
               CASE WHEN event_id % 10 = 0 THEN NULL ELSE 'false' END AS deleted,
               (event_id % 10 = 0) AS is_corrupt
        FROM events
    """,
    doc="Avro wire-format validation — the schema-language twin of "
        "schema_validate: rows are Avro-binary ENCODED (zig-zag varints + "
        "length-prefixed strings, the reference's declared topic schema, "
        "/root/reference/terraform/main.tf:358-374), every 10th record is "
        "truncated on the wire, then a decode kernel splits valid rows "
        "from corrupt ones exactly like the JSON leg's dead-letter path.",
    scale_notes="Both codec hops are mapInPandas over Arrow batches — "
                "bytes cross the Python boundary once per batch. On a "
                "real deployment only the decode leg exists (the producer "
                "encodes); with the spark-avro jar present, from_avro "
                "replaces the Python kernel JVM-side with the same "
                "split-corrupt contract.",
)
def avro_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    rec = e.select(
        "event_id",
        (F.col("event_id") % 2147483647).cast("int").alias("id"),
        F.concat(F.lit("fn_"), F.col("user_id")).alias("first_name"),
        F.concat(F.lit("ln_"), F.col("user_id")).alias("last_name"),
        F.concat(F.lit("u"), F.col("user_id"), F.lit("@example.com")).alias("email"),
        (F.col("user_id") % 100000).cast("int").alias("zipcode"),
        F.concat(F.lit("city_"), F.col("user_id") % 50).alias("city"),
        F.concat(F.lit("C"), F.col("user_id") % 10).alias("country"),
        F.lit("false").alias("__deleted"),
    )
    encoded = rec.mapInPandas(_avro_encode_batches, AVRO_WIRE_SCHEMA)
    # Wire corruption happens JVM-side: every 10th record truncated to its
    # first 3 bytes (mid-varint / mid-string — decode_record must raise).
    wire = encoded.select(
        "event_id",
        F.when(
            F.col("event_id") % 10 == 0, F.expr("substring(data, 1, 3)")
        ).otherwise(F.col("data")).alias("data"),
    )
    return wire.mapInPandas(_avro_decode_batches, AVRO_DECODED_SCHEMA)
