"""The CDC pipeline: Structured Streaming re-architecture of
binlog → Debezium → Pub/Sub → BigQuery (SURVEY.md §3.1).

Stage map (reference → here):

  binlog tail (MySqlConnector)      → readStream.json on a spool dir of
                                      newline-JSON segments (S1)
  include lists                     → include_list_filter (S2)
  ExtractNewRecordState + rewrite   → unwrap_envelope + rewrite_deletes (P1,P2)
  publish w/ topic schema + key     → to_json payload + ordering_key +
                                      attributes map w/ revision id (S3)
  BigQuery subscription             → foreachBatch: parse w/ topic schema,
                                      project_to_sink_schema, append parquet (S4)
  dead-letter topic                 → corrupt rows + exhausted retries →
                                      DLQ parquet table (S5)
  inspection pull subscription      → raw_tap(): the pre-parse message
                                      frame (S6)
  offset persistence                → checkpointLocation; a failed batch
                                      never advances it, so a schema halt
                                      is replayable (T1/D6)

At 100 TB the spool dir becomes a Kafka/PubSub-lite connector and the
parquet sink a Delta/Iceberg table; every transform in between is
already partition-parallel and shuffle-free (per-key ordering comes
from last-writer-wins merges downstream, not arrival order).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.plans.pipeline_spec import CdcPipelineSpec
from pubsub2bq_spark.streaming.reconcile import (
    SchemaMismatchError,
    include_list_filter,
    project_to_sink_schema,
    rewrite_deletes,
    split_corrupt,
    unwrap_envelope,
)


class CdcPipeline:
    def __init__(self, spark: SparkSession, spec: CdcPipelineSpec):
        self.spark = spark
        self.spec = spec
        self._halt_error: SchemaMismatchError | None = None

    # ---- source + publisher side -----------------------------------------
    def envelope_stream(self) -> DataFrame:
        return (
            self.spark.readStream.schema(self.spec.envelope_schema)
            .json(self.spec.spool_dir)
        )

    def _publish(self, envelopes: DataFrame) -> DataFrame:
        """Unwrap + rewrite, then encode as Pub/Sub-style messages:
        data (JSON), ordering_key (PK JSON), attributes (schema metadata)
        — the wire shape at /root/reference/README.md:290-295."""
        spec = self.spec
        payload_cols = [f.name for f in spec.envelope_schema["after"].dataType.fields]
        flat = rewrite_deletes(
            unwrap_envelope(
                include_list_filter(envelopes, spec.db_include, spec.table_include),
                payload_cols,
            )
        )
        data_cols = payload_cols + ["__deleted"]
        return flat.select(
            F.to_json(F.struct(*[F.col(c) for c in data_cols])).alias("data"),
            F.to_json(F.struct(*[F.col(k) for k in spec.ordering_key])).alias(
                "ordering_key"
            ),
            F.create_map(
                F.lit("googclient_schemaencoding"), F.lit("JSON"),
                F.lit("googclient_schemaname"), F.lit("pubsub2bq-schema"),
                F.lit("googclient_schemarevisionid"), F.lit(spec.schema_revision_id),
            ).alias("attributes"),
            F.col("ts_ms"),
        )

    def message_stream(self) -> DataFrame:
        return self._publish(self.envelope_stream())

    # ---- subscriber / sink side -------------------------------------------
    def _deliver(self, messages: DataFrame, epoch_id: int) -> None:
        """One micro-batch delivery. Order of operations matters:
        the halt check runs BEFORE any write so a mismatch leaves both
        sink and DLQ untouched and the checkpoint un-advanced."""
        spec = self.spec
        valid, corrupt = split_corrupt(messages, "data", spec.topic_schema)
        projected = project_to_sink_schema(
            valid.drop("data", "ordering_key", "attributes", "ts_ms"),
            spec.topic_schema,
            spec.sink_schema,
        )

        attempts = 0
        while True:
            attempts += 1
            try:
                projected.write.mode("append").parquet(spec.sink_dir)
                break
            except SchemaMismatchError:
                raise  # permanent: halt (never reached — project raises earlier)
            except Exception:
                # Transient delivery failure → retry with backoff, then DLQ
                # the whole batch (reference: >=60s backoff, 5 attempts).
                if attempts >= spec.retry.max_attempts:
                    self._to_dlq(messages, reason="delivery_failed", attempts=attempts)
                    return
                time.sleep(spec.retry.backoff_seconds)

        if corrupt.isStreaming is False and corrupt.limit(1).count() > 0:
            self._to_dlq(
                corrupt.select("data", "ordering_key", "attributes", "ts_ms"),
                reason="schema_validation_failed",
                attempts=1,
            )

    def _to_dlq(self, df: DataFrame, reason: str, attempts: int) -> None:
        (
            df.withColumn("dlq_reason", F.lit(reason))
            .withColumn("delivery_attempts", F.lit(attempts))
            .write.mode("append")
            .parquet(self.spec.dlq_dir)
        )

    # ---- run ---------------------------------------------------------------
    def run_available_now(self) -> None:
        """Process everything currently in the spool and stop — the
        deterministic test trigger (Trigger.AvailableNow)."""
        q = (
            self.message_stream()
            .writeStream.foreachBatch(self._deliver)
            .option("checkpointLocation", self.spec.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception as ex:  # surface the halt as the reference does:
            # subscription state = "table schema mismatch", zero rows delivered.
            if "SchemaMismatchError" in str(ex) or "table schema mismatch" in str(ex):
                raise SchemaMismatchError(str(ex)) from ex
            raise

    # ---- taps ---------------------------------------------------------------
    def read_sink(self) -> DataFrame:
        return self.spark.read.schema(self.spec.sink_schema).parquet(self.spec.sink_dir)

    def read_dlq(self) -> DataFrame:
        return self.spark.read.parquet(self.spec.dlq_dir)

    def raw_tap_batch(self) -> DataFrame:
        """Inspection subscription (S6): the raw message frame, batch mode
        — data / ordering_key / attributes, pre-parse
        (/root/reference/README.md:281-296)."""
        envelopes = self.spark.read.schema(self.spec.envelope_schema).json(
            self.spec.spool_dir
        )
        return self._publish(envelopes)
