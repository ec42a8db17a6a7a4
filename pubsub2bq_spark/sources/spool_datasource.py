"""Custom Python Data Source (Spark 4 API) for the CDC spool.

The reference's source is a managed connector (Debezium tailing a MySQL
binlog, conf/debezium.properties:1-12). Spark 4's Python Data Source
API is the engine-native way to build exactly that kind of connector
when no JVM source exists: ``DataSource.partitions()`` plans one input
split per spool segment, and each executor's ``read(partition)`` parses
only its segment — the connector scales out like any file source
instead of funneling through the driver.

This is the *capability* demo for SURVEY §2.1: the streaming pipeline
itself keeps using the built-in JSON file source (JVM-side, faster);
a Python source is the slot where a real custom protocol (a binlog
client, a queue consumer) would go.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Flat message projection emitted by the reader: envelope metadata +
# the payload columns shared by every fixture revision. A delete event
# carries its payload in `before` (after is null) — same coalesce the
# SMT rewrite applies (conf/debezium.properties:19).
SPOOL_DDL = (
    "op string, ts_ms bigint, db string, tbl string, "
    "id int, first_name string, email string"
)


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CdcSpoolDataSource(DataSource):
    """``spark.read.format("cdcspool").load(spool_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "cdcspool"

    def schema(self) -> str:
        return SPOOL_DDL

    def reader(self, schema) -> "CdcSpoolReader":
        return CdcSpoolReader(self.options)


class CdcSpoolReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdcspool requires a path: .load(spool_dir)")

    def partitions(self):
        # One split per segment file — parallelism = segment count, the
        # same planning a JVM file source does.
        return [
            _SegmentPartition(os.path.join(self.path, name))
            for name in sorted(os.listdir(self.path))
            if name.endswith(".json")
        ]

    def read(self, partition: _SegmentPartition):
        with open(partition.path) as f:
            for line in f:
                if not line.strip():
                    continue
                e = json.loads(line)
                payload = e.get("after") or e.get("before") or {}
                src = e.get("source") or {}
                yield (
                    e.get("op"),
                    e.get("ts_ms"),
                    src.get("db"),
                    src.get("table"),
                    payload.get("id"),
                    payload.get("first_name"),
                    payload.get("email"),
                )


_REGISTERED: set[str] = set()


def register_spool_source(spark) -> None:
    """Register the datasource once per SparkContext (applicationId-keyed,
    same hazard class as the physical_layout caches)."""
    app = spark.sparkContext.applicationId
    if app in _REGISTERED:
        return
    spark.dataSource.register(CdcSpoolDataSource)
    _REGISTERED.add(app)


def _build_stream_source():
    """Build the streaming DataSource class INSIDE a function so
    cloudpickle serializes it by value: the streaming source's planner
    runs in a dedicated driver-side Python worker that does NOT see
    addPyFile paths (unlike executor workers), so a module-level class
    (pickled by reference) dies with ModuleNotFoundError when the driver
    starts outside the repo. Everything the class needs is defined
    locally — no references back into pubsub2bq_spark."""
    import json as _json
    import os as _os

    from pyspark.sql.datasource import (
        DataSource as _DS,
        SimpleDataSourceStreamReader as _SR,
    )

    ddl = SPOOL_DDL  # closure-captured string — pickled by value

    class _Reader(_SR):
        """Offset = lexicographic high-water mark: the NAME of the last
        fully-consumed segment (segments sort by name — the monotonicity
        Debezium gets from binlog positions). A name-keyed offset stays
        correct when consumed prefixes are pruned (CdcPipeline.prune_spool):
        pruned segments all sort <= the mark, so the `> mark` slice is
        unaffected, where a count-based offset would shift and silently
        replay or skip segments. Legacy count offsets ({"n": k}) from
        pre-existing checkpoints are mapped onto the current listing once,
        then re-emitted as marks. read() returns rows past the offset plus
        the advanced offset; readBetweenOffsets() replays committed ranges
        deterministically after restart."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("cdcspoolstream requires a path: .load(spool_dir)")
            # Seek controls — the engine-native mirror of the reference
            # UI's REPLAY / PURGE subscription buttons
            # (/root/reference/README.md:281-296, images/schemaerror.png):
            #   replayFrom=<segment name> — start past that mark
            #     (exclusive; '' replays the whole retained spool), the
            #     seek-to-offset REPLAY. Re-delivery needs no checkpoint
            #     surgery: a new attach point simply initializes here.
            #   startAt=latest — skip the backlog entirely (PURGE /
            #     seek-to-now); startAt=earliest is the default.
            self.replay_from = options.get("replayFrom")
            self.start_at = options.get("startAt", "earliest")
            if self.start_at not in ("earliest", "latest"):
                raise ValueError(
                    f"startAt={self.start_at!r}: expected 'earliest' or 'latest'"
                )
            if self.replay_from is not None and self.start_at != "earliest":
                raise ValueError("replayFrom and startAt=latest are exclusive")

        def initialOffset(self):
            if self.replay_from is not None:
                return {"hwm": self.replay_from}
            if self.start_at == "latest":
                files = self._files()
                return {"hwm": files[-1] if files else ""}
            return {"hwm": ""}

        def _mark(self, offset, files):
            """High-water mark from a new- or legacy-format offset."""
            if "hwm" in offset:
                return offset["hwm"]
            # Legacy count offset: only sound on a never-pruned spool.
            # A pre-upgrade checkpoint over a spool pruned *after* the
            # upgrade can still carry one with k > len(files) — clamp to
            # the newest segment rather than IndexError every micro-batch
            # (the mark is re-emitted name-keyed immediately after).
            k = min(offset.get("n", 0), len(files))
            return files[k - 1] if k else ""

        def _files(self):
            return sorted(
                f for f in _os.listdir(self.path) if f.endswith(".json")
            )

        def _rows(self, files):
            for name in files:
                with open(_os.path.join(self.path, name)) as f:
                    for line in f:
                        if not line.strip():
                            continue
                        e = _json.loads(line)
                        payload = e.get("after") or e.get("before") or {}
                        src = e.get("source") or {}
                        yield (
                            e.get("op"),
                            e.get("ts_ms"),
                            src.get("db"),
                            src.get("table"),
                            payload.get("id"),
                            payload.get("first_name"),
                            payload.get("email"),
                        )

        def read(self, start):
            files = self._files()
            mark = self._mark(start, files)
            fresh = [f for f in files if f > mark]
            rows = list(self._rows(fresh))
            return iter(rows), {"hwm": fresh[-1] if fresh else mark}

        def readBetweenOffsets(self, start, end):
            files = self._files()
            lo = self._mark(start, files)
            hi = self._mark(end, files)
            return iter(list(self._rows([f for f in files if lo < f <= hi])))

    class CdcSpoolStreamDataSource(_DS):
        """``spark.readStream.format("cdcspoolstream").load(spool_dir)``."""

        @classmethod
        def name(cls):
            return "cdcspoolstream"

        def schema(self):
            return ddl

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    return CdcSpoolStreamDataSource


def register_spool_stream_source(spark) -> None:
    app = spark.sparkContext.applicationId
    key = f"stream:{app}"
    if key in _REGISTERED:
        return
    spark.dataSource.register(_build_stream_source())
    _REGISTERED.add(key)
