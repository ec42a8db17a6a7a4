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
        """Driver-side, runs only when every task succeeded: publish the
        staged files, then atomically promote the manifest — `_SUCCESS`
        is THE commit point (readers must treat data files without it as
        uncommitted, exactly like Hadoop committers).

        Idempotent and rollback-safe (ADVICE r8/r9): a retried commit
        skips files already published by the earlier attempt instead of
        raising FileNotFoundError, and a rename failure midway un-
        publishes this attempt's renames AND the prior attempt's
        already-published files (back to `.tmp`, where abort() can clean
        them) and removes the staged manifest — so a partial commit
        never leaves published-but-unmanifested files behind, including
        the retry-then-fail shape.
        """
        total = sum(m.n_rows for m in messages)
        manifest_tmp = os.path.join(self.path, "_SUCCESS.tmp")
        with open(manifest_tmp, "w") as f:
            json.dump(
                {
                    "rows": total,
                    "files": len(messages),
                    "names": sorted(
                        os.path.basename(m.path[: -len(".tmp")])
                        for m in messages
                    ),
                },
                f,
            )
        renamed: list[tuple[str, str]] = []
        try:
            for m in messages:
                final = m.path[: -len(".tmp")]
                if os.path.exists(final) and not os.path.exists(m.path):
                    # Retried commit: already published by the earlier
                    # attempt — still enrolled for rollback so a retry-
                    # then-fail leaves NO published-but-unmanifested
                    # files behind (ADVICE r9).
                    renamed.append((m.path, final))
                    continue
                os.rename(m.path, final)
                renamed.append((m.path, final))
            os.replace(manifest_tmp, os.path.join(self.path, "_SUCCESS"))
        except OSError:
            for staged, final in renamed:
                try:
                    os.rename(final, staged)
                except OSError:
                    pass  # best-effort: abort() still sweeps what's left
            try:
                os.remove(manifest_tmp)
            except OSError:
                pass
            raise

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
