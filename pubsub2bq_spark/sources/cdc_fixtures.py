"""Deterministic CDC fixtures reproducing the reference's golden lab run.

The reference's data story (FIXTURES.md group A, derived from
/root/reference/sql/pubsub2bq.sql:8-13 and README.md sections 4-7):
seed 3 `people` rows → insert id=994 carrying an extra `phone` field →
insert id=995 while the sink has an extra `age` column → delete id=990
→ evolve the sink to a schema missing `zipcode` → insert id=996 →
delivery halts with zero new rows.

Events are spooled as newline-JSON files (one file per "binlog
segment"), which is how we emulate the Debezium→Pub/Sub feed with
Spark's file streaming source: each new file becomes part of the next
micro-batch, preserving arrival order per segment.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

# A1: people source schema (/root/reference/sql/pubsub2bq.sql:5-7).
PEOPLE_FIELDS = [
    ("id", T.LongType()),
    ("first_name", T.StringType()),
    ("last_name", T.StringType()),
    ("email", T.StringType()),
    ("zipcode", T.LongType()),
    ("city", T.StringType()),
    ("country", T.StringType()),
]

PEOPLE_SCHEMA = T.StructType([T.StructField(n, t) for n, t in PEOPLE_FIELDS])

# Payload may carry fields the topic schema doesn't know (the `phone` case);
# parse side keeps them so the projection step can demonstrably drop them.
PEOPLE_WIRE_SCHEMA = T.StructType(
    PEOPLE_SCHEMA.fields + [T.StructField("phone", T.StringType())]
)

# Envelope: Debezium shape pre-unwrap (FIXTURES.md A3).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("before", PEOPLE_WIRE_SCHEMA),
        T.StructField("after", PEOPLE_WIRE_SCHEMA),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField(
            "source",
            T.StructType(
                [T.StructField("db", T.StringType()), T.StructField("table", T.StringType())]
            ),
        ),
    ]
)

# Topic schema v1: people + __deleted (Avro schema at
# /root/reference/terraform/main.tf:358-374 → 8 fields).
TOPIC_SCHEMA_V1 = T.StructType(
    PEOPLE_SCHEMA.fields + [T.StructField("__deleted", T.StringType())]
)

# Sink schema v1 == topic schema (BQ table, /root/reference/terraform/main.tf:305-348).
SINK_SCHEMA_V1 = TOPIC_SCHEMA_V1

# Sink schema with the extra `age` column (README.md:299-373).
SINK_SCHEMA_WITH_AGE = T.StructType(
    TOPIC_SCHEMA_V1.fields + [T.StructField("age", T.LongType())]
)

# Evolved sink schema v2: drops zipcode (sql/bq_schemav2.json) → hard halt.
SINK_SCHEMA_V2 = T.StructType(
    [f for f in SINK_SCHEMA_WITH_AGE.fields if f.name != "zipcode"]
)

SEED_PEOPLE = [
    # Golden seed rows, /root/reference/README.md:172-183.
    dict(id=990, first_name="Tom", last_name="BagofDonuts", email="tom@corp.com",
         zipcode=2174, city="Arlington", country="USA"),
    dict(id=991, first_name="Phil", last_name="BagofDonuts", email="phil@corp.com",
         zipcode=2174, city="Arlington", country="USA"),
    dict(id=992, first_name="Ted", last_name="BagofDonuts", email="ted@corp.com",
         zipcode=2174, city="Arlington", country="USA"),
]


def _event(op: str, row: dict, ts_ms: int, db: str = "debezium_test", table: str = "people") -> dict:
    return {
        "before": row if op == "d" else None,
        "after": None if op == "d" else row,
        "op": op,
        "ts_ms": ts_ms,
        "source": {"db": db, "table": table},
    }


def snapshot_events(ts_ms: int = 1_000) -> list[dict]:
    """Initial snapshot: op='r' rows for the three seed people."""
    return [_event("r", row, ts_ms + i) for i, row in enumerate(SEED_PEOPLE)]


def insert_994_with_phone(ts_ms: int = 2_000) -> list[dict]:
    """Insert carrying an extra `phone` field the topic schema drops
    (observed wire row /root/reference/README.md:290)."""
    row = dict(id=994, first_name="Vijay", last_name="BagofDonuts",
               email="vijay@corp.com", zipcode=2174, city="Arlington",
               country="USA", phone="508-555-1212")
    return [_event("c", row, ts_ms)]


def insert_995(ts_ms: int = 3_000) -> list[dict]:
    row = dict(id=995, first_name="Anna", last_name="BagofDonuts",
               email="anna@corp.com", zipcode=2174, city="Arlington",
               country="USA")
    return [_event("c", row, ts_ms)]


def delete_990(ts_ms: int = 4_000) -> list[dict]:
    return [_event("d", SEED_PEOPLE[0], ts_ms)]


def insert_996(ts_ms: int = 5_000) -> list[dict]:
    row = dict(id=996, first_name="Zoe", last_name="BagofDonuts",
               email="zoe@corp.com", zipcode=2174, city="Arlington",
               country="USA")
    return [_event("c", row, ts_ms)]


def noise_other_table(ts_ms: int = 1_500) -> list[dict]:
    """Events for a table outside the include list — must be filtered out."""
    row = dict(id=1, first_name="Ghost", last_name="Row", email="g@x.com",
               zipcode=0, city="Nowhere", country="ZZ")
    return [_event("c", row, ts_ms, db="otherdb", table="misc")]


def write_segment(spool_dir: str, name: str, events: list[dict]) -> str:
    """Append one binlog segment (newline-JSON file) to the spool dir."""
    os.makedirs(spool_dir, exist_ok=True)
    path = os.path.join(spool_dir, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.rename(tmp, path)  # atomic: the file source never sees partial files
    return path
