"""Versioned-schema registry (Pub/Sub schema-revision analog).

The reference stamps every message with
``googclient_schemarevisionid`` (/root/reference/README.md:293-295)
and validates against the revisioned topic schema
(/root/reference/terraform/main.tf:358-374). Here: a monotonic map of
revision id → StructType; parsing a wire frame dispatches each row to
its revision's schema and unions the results under the superset
schema (missing fields NULL — consistent with the sink NULL-fill rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaRegistry:
    def __init__(self) -> None:
        self._revisions: dict[str, T.StructType] = {}

    def add(self, revision_id: str, schema: T.StructType) -> None:
        if revision_id in self._revisions:
            raise ValueError(f"revision {revision_id!r} already registered")
        self._revisions[revision_id] = schema

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
