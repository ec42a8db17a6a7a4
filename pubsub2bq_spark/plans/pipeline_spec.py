"""CDC pipeline specification.

The reference wires its pipeline out of declarative config —
Debezium .properties (connector, include lists, transforms;
/root/reference/conf/debezium.properties:1-21) and Terraform (topic
schema, subscription, dead-letter policy, sink table;
/root/reference/terraform/main.tf:352-415). This dataclass is the
same idea: a config object a builder turns into a running
StreamingQuery, so pipelines are data, not code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class RetryPolicy:
    """Sink delivery retry (reference: retry_policy minimum_backoff 60s,
    dead_letter_policy max_delivery_attempts 5,
    /root/reference/terraform/main.tf:402-409)."""

    max_attempts: int = 5
    backoff_seconds: float = 60.0


@dataclass
class DeliveryConfig:
    """Subscription delivery surface (reference: sink subscription
    message_retention_duration 604800s + retain_acked_messages,
    /root/reference/terraform/main.tf:400-401; inspection tap
    retention 1200s, ack deadline 60s, TTL 86400s, main.tf:376-387).

    Spark mapping (SURVEY.md §2.4 T3): retention bounds how far back the
    spool keeps replayable segments (`CdcPipeline.prune_spool`), and the
    inspection tap filters to the retention window when asked for "what
    is currently replayable" (`raw_tap_batch(now_ms=...)`). Ack deadline
    and TTL have no Structured-Streaming analog beyond documentation —
    micro-batch commit IS the ack — so they are carried for config
    fidelity and surfaced in describe()."""

    sink_retention_seconds: int = 604_800
    tap_retention_seconds: int = 1_200
    ack_deadline_seconds: int = 60
    tap_ttl_seconds: int = 86_400
    retain_acked: bool = True
    # Sink/DLQ table expiration (reference: the evolved sink table is
    # recreated with a 3600 s expiration, /root/reference/README.md:387-392).
    # None = tables never expire (the safe default); when set,
    # CdcPipeline.enforce_table_retention drops aged fragments after each
    # committed micro-batch.
    table_ttl_seconds: int | None = None


@dataclass
class CdcPipelineSpec:
    # Source: spool directory of newline-JSON binlog segments (the
    # file-based emulation of the Debezium→Pub/Sub feed; SURVEY.md S1).
    spool_dir: str
    # Sink: parquet table (the BigQuery-table analog) + DLQ + checkpoint.
    sink_dir: str
    dlq_dir: str
    checkpoint_dir: str
    # Schemas: declared independently per layer (SURVEY.md §1.3).
    envelope_schema: T.StructType = None  # set by caller (fixtures provide it)
    topic_schema: T.StructType = None
    sink_schema: T.StructType = None
    # Include lists (conf/debezium.properties:11-12).
    db_include: str = "debezium_test"
    table_include: str = "people"
    # Ordering key = primary key (README.md:292).
    ordering_key: tuple[str, ...] = ("id",)
    # Schema revision id stamped on every message (README.md:293-295).
    schema_revision_id: str = "rev1"
    retry: RetryPolicy = field(default_factory=lambda: RetryPolicy(backoff_seconds=0.0))
    delivery: DeliveryConfig = field(default_factory=DeliveryConfig)
    # Micro-batch admission control for the file source (the Pub/Sub
    # flow-control analog: max_outstanding_messages). None = take all
    # available files per trigger (the drain-fast default); set it to
    # force a steady multi-batch cadence, e.g. for sustained-throughput
    # measurement under a processing-time trigger.
    max_files_per_trigger: int | None = None
