"""pubsub2bq_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference lab ``j-f-oleary-bigdata/pubsub2bq``
(a Debezium → Pub/Sub → BigQuery CDC pipeline; see SURVEY.md) as an
idiomatic Spark engine:

* relational operators (scan/filter/project/join/agg/window/sort/set)
  as thin, Catalyst-friendly DataFrame compositions;
* the reference's schema-evolution + delivery semantics
  (envelope unwrap, delete rewrite, sink projection, NULL-fill,
  schema-mismatch hard halt, dead-letter split) re-built on
  Structured Streaming (``pubsub2bq_spark.streaming``);
* LLM-data-pipeline operators (dedup families, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB scale.

Everything is DataFrame/SQL-first: logical plans are declared, and
Catalyst + Tungsten pick physical strategies. Python touches data
only through Arrow-vectorized Pandas UDFs, and only where built-ins
genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
