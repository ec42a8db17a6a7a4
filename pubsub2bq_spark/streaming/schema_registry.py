"""Versioned-schema registry (Pub/Sub schema-revision analog).

The reference stamps every message with
``googclient_schemarevisionid`` (/root/reference/README.md:293-295)
and validates against the revisioned topic schema
(/root/reference/terraform/main.tf:358-374). Here: a monotonic map of
revision id → StructType; parsing a wire frame dispatches each row to
its revision's schema and unions the results under the superset
schema (missing fields NULL — consistent with the sink NULL-fill rule).

Persistence (T2): the reference stores Debezium's schema history in a
durable topic (/root/reference/conf/debezium.properties:13-14) so a
connector restart recovers every DDL revision. Here, pass
``persist_dir`` (conventionally ``<checkpoint_dir>/schema_history``):
each ``add`` rewrites a small JSON file of revision → StructType, and
constructing a registry over the same directory after a restart
recovers the full revision map — so old-revision messages still parse.
The file is KB-sized DDL history co-located with the checkpoint, the
same durability domain as the stream's offsets.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HISTORY_FILE = "schema_history.json"


class SchemaRegistry:
    def __init__(self, persist_dir: str | None = None) -> None:
        self._revisions: dict[str, T.StructType] = {}
        self._persist_dir = persist_dir
        if persist_dir:
            path = os.path.join(persist_dir, _HISTORY_FILE)
            if os.path.exists(path):
                with open(path) as f:
                    history = json.load(f)
                for rev, schema_json in history.items():
                    self._revisions[rev] = T.StructType.fromJson(schema_json)

    def _persist(self) -> None:
        if not self._persist_dir:
            return
        os.makedirs(self._persist_dir, exist_ok=True)
        path = os.path.join(self._persist_dir, _HISTORY_FILE)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {rev: s.jsonValue() for rev, s in self._revisions.items()}, f
            )
        os.replace(tmp, path)  # atomic: a crash never truncates history

    def add(self, revision_id: str, schema: T.StructType) -> None:
        if revision_id in self._revisions:
            raise ValueError(f"revision {revision_id!r} already registered")
        self._revisions[revision_id] = schema
        self._persist()

    def superset_fields(self) -> list[T.StructField]:
        seen: dict[str, T.StructField] = {}
        for schema in self._revisions.values():
            for f in schema.fields:
                seen.setdefault(f.name, f)
        return list(seen.values())

    def parse(self, df: DataFrame, data_col: str, revision_col: str) -> DataFrame:
        """Parse each row with its revision's schema; output the superset
        schema + the stamped revision id."""
        superset = self.superset_fields()
        parts: list[DataFrame] = []
        for rev, schema in self._revisions.items():
            names = {f.name for f in schema.fields}
            sub = df.filter(F.col(revision_col) == rev).withColumn(
                "_p", F.from_json(F.col(data_col), schema)
            )
            cols = [
                (F.col(f"_p.{f.name}") if f.name in names else F.lit(None).cast(f.dataType)).alias(
                    f.name
                )
                for f in superset
            ]
            parts.append(sub.select("*", *cols).drop("_p", data_col))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
