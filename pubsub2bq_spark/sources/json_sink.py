"""Custom Python Data Source WRITER (Spark 4 API): a JSON-lines
directory sink with the full two-phase commit protocol.

The reference's sink is a managed connector (the BigQuery-writing
Pub/Sub subscription, terraform/main.tf:389-415). Spark 4's Python
Data Source writer is the engine-native slot for that kind of
connector when no JVM sink exists: every task streams its partition
into a staged ``.tmp`` file and returns a ``WriterCommitMessage``;
the driver-side ``commit()`` finalizes the staged files atomically
(rename + manifest) only after EVERY task succeeded, and ``abort()``
discards the stage — the same all-or-nothing delivery contract the
BigQuery subscription gives the reference.

Companion to ``spool_datasource.py`` (reader + stream reader): with
this module the package demonstrates all three Python Data Source
surfaces — batch read, streaming read, batch write.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _StagedFile(WriterCommitMessage):
    """One task's staged output: path + row count (picklable)."""

    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonDirDataSource(DataSource):
    """``df.write.format("jsondirsink").mode("append").save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "jsondirsink"

    def writer(self, schema, overwrite: bool) -> "JsonDirWriter":
        return JsonDirWriter(self.options)


class JsonDirWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")

    def write(self, iterator) -> _StagedFile:
        """Executor-side: stream this partition to a staged temp file.
        Nothing is visible to readers until commit() renames it."""
        staged = os.path.join(self.path, f"part-{uuid.uuid4().hex}.json.tmp")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _StagedFile(staged, n)

    def commit(self, messages) -> None:
        """Driver-side, runs only when every task succeeded: atomically
        publish the staged files and write the manifest."""
        total = 0
        for m in messages:
            os.rename(m.path, m.path[: -len(".tmp")])
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"rows": total, "files": len(messages)}, f)

    def abort(self, messages) -> None:
        # messages is List[Optional[WriterCommitMessage]] — a FAILED
        # task's slot is None (per the DataSourceWriter contract), so
        # skip those and still clean every successfully staged file.
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


_REGISTERED: set[str] = set()


def register_json_sink(spark) -> None:
    """Idempotent per SparkContext (keyed on applicationId — id() values
    can be recycled, the registry.py hazard class)."""
    app = spark.sparkContext.applicationId
    if app in _REGISTERED:
        return
    spark.dataSource.register(JsonDirDataSource)
    _REGISTERED.add(app)
