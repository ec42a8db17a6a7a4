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

    def revision_ids(self) -> list[str]:
        return list(self._revisions)

    def compat(self, old_id: str, new_id: str) -> tuple[bool, bool, str]:
        """(backward, forward, verdict) between two registered revisions
        — the check a registry performs before accepting a revision
        (see module-level :func:`compatibility`)."""
        return compatibility(self._revisions[old_id], self._revisions[new_id])

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


def _reads(reader: T.StructType, writer: T.StructType) -> bool:
    """Can data written under ``writer`` be consumed by a reader
    expecting ``reader``? The standard registry reader/writer rules
    (Confluent/Avro resolution, with StructType ``nullable`` standing in
    for has-default):

    * a reader field ABSENT from the writer must be nullable (the
      reader fills NULL — the sink NULL-fill rule,
      /root/reference/README.md:363-371);
    * a field present in both must keep its exact type (no promotion
      lattice — the reference's topic schema pins BigQuery-exact types,
      terraform/main.tf:358-374);
    * a reader may not TIGHTEN nullability: if the writer could emit
      NULL, a non-nullable reader field breaks;
    * writer-only fields are ignored by the reader (topic-schema-wins
      projection, README.md:288-290).
    """
    writer_fields = {f.name: f for f in writer.fields}
    for f in reader.fields:
        w = writer_fields.get(f.name)
        if w is None:
            if not f.nullable:
                return False
        elif w.dataType != f.dataType or (w.nullable and not f.nullable):
            return False
    return True


def compatibility(old: T.StructType, new: T.StructType) -> tuple[bool, bool, str]:
    """(backward, forward, verdict) for evolving ``old`` → ``new``,
    per the standard schema-registry compatibility classes:

    * BACKWARD — a NEW reader consumes OLD data (add-nullable evolves
      safely; the class a registry checks before accepting a revision,
      README.md:293-295);
    * FORWARD — an OLD reader consumes NEW data (dropping a required
      field breaks this — EXACTLY the zipcode hard-halt,
      README.md:441-450: the sink still demands the column the new
      revision stopped writing);
    * FULL — both; NONE — neither (e.g. a type change).
    """
    backward = _reads(new, old)
    forward = _reads(old, new)
    verdict = (
        "FULL" if backward and forward
        else "BACKWARD" if backward
        else "FORWARD" if forward
        else "NONE"
    )
    return backward, forward, verdict
