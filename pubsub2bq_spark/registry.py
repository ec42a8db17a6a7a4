"""Query registry: the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 registers here as a :class:`Query`:
a PySpark implementation ``(spark, sf_dir) -> DataFrame`` paired with
the ANSI-SQL oracle string DuckDB runs over the same parquet tables.
``__spark_entry__.py`` is a thin shim over this registry.

Rules enforced by convention (driver contract):

* every computed/aggregate column is aliased identically on both sides;
* double-valued aggregates are rounded to 4 decimals on both sides so
  floating-point summation-order noise cannot flip the value hash;
* queries with non-deterministic or non-SQL-expressible semantics set
  ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import functools
import os
import shutil
import tempfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# Keyed on applicationId, not id(sc): id() values can be recycled after
# the old context is garbage-collected, and a new context must re-ship
# (same hazard class as the physical_layout caches, ADVICE r1).
_SHIPPED_CONTEXTS: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    The driver imports ``__spark_entry__`` from an arbitrary cwd with the
    repo root only on the *driver's* sys.path. Module-level UDF/mapInPandas
    functions are cloudpickled **by reference**, so the Python workers must
    be able to ``import pubsub2bq_spark`` themselves. ``addPyFile`` is the
    cluster-correct mechanism — identical behavior on ``local[N]`` and a
    1000-executor cluster (the zip rides the Spark file server; workers get
    it prepended to sys.path).
    """
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED_CONTEXTS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.mkdtemp(prefix="pubsub2bq_ship_"), "pubsub2bq_spark")
    archive = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir=os.path.basename(pkg_dir)
    )
    sc.addPyFile(archive)
    _SHIPPED_CONTEXTS.add(sc.applicationId)


@dataclass
class Query:
    key: str
    spark: SparkQuery
    oracle: str | None = None
    doc: str = ""
    scale_notes: str = field(default="", repr=False)


def register(
    key: str,
    oracle: str | None = None,
    doc: str = "",
    scale_notes: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query implementation under ``key``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_worker_imports(spark)
            return fn(spark, sf_dir)

        _REGISTRY[key] = Query(key=key, spark=wrapped, oracle=oracle,
                               doc=doc or (fn.__doc__ or ""), scale_notes=scale_notes)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all operator modules (side-effect: registration) and return the registry."""
    # Imports are deferred so `import pubsub2bq_spark` stays cheap.
    from pubsub2bq_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        cdc_pipeline,
        cdc_semantics,
        corpus_stats,
        data_selection,
        ddl_ops,
        event_analytics,
        events_ops,
        joins,
        llm_corpus,
        llm_dedup,
        llm_quality,
        llm_similarity,
        llm_text,
        ml_ops,
        multimodal,
        physical_layout,
        relational,
        relational_ext,
        retrieval,
        semistructured,
        source_formats,
        text_index,
        tpch,
        training_prep,
        udf_surface,
        windows,
    )

    return dict(_REGISTRY)
