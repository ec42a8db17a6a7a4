"""Schema-management DDL (SURVEY.md §2.3 D1-D4): catalog database/table
lifecycle with column evolution, mirroring the reference's source-side
DDL (/root/reference/sql/pubsub2bq.sql:3-7, ALTER at README.md:228,
sink recreate at README.md:379-392)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from pubsub2bq_spark.registry import register


@register(
    "ddl_evolution",
    oracle="""
        SELECT * FROM (VALUES
            (990, 'Tom',  2174, NULL),
            (991, 'Phil', 2174, NULL),
            (994, 'Vijay', 2174, '508-555-1212')
        ) AS t(id, first_name, zipcode, phone)
        ORDER BY id
    """,
    doc="DDL lifecycle (D1-D4): CREATE DATABASE + CREATE TABLE with PK-ish "
        "schema, INSERT seed rows, ALTER TABLE ADD COLUMNS (phone — the "
        "reference's evolution trigger), INSERT a row carrying the new "
        "column; old rows read back NULL for it.",
    scale_notes="Pure catalog operations; parquet tables get the new column "
                "lazily (absent in old files → NULL at read), exactly the "
                "cheap-ALTER behavior needed at 100 TB.",
)
def ddl_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="ddlq_")
    # Explicit LOCATION: never depend on a writable ./spark-warehouse in
    # whatever cwd the driver launched from.
    spark.sql(f"CREATE DATABASE IF NOT EXISTS engine_ddl LOCATION '{tmp}/warehouse'")
    spark.sql("DROP TABLE IF EXISTS engine_ddl.people")
    spark.sql(
        f"""
        CREATE TABLE engine_ddl.people
            (id BIGINT, first_name STRING, zipcode BIGINT)
        USING parquet LOCATION '{tmp}/people'
        """
    )
    spark.sql("INSERT INTO engine_ddl.people VALUES (990,'Tom',2174), (991,'Phil',2174)")
    spark.sql("ALTER TABLE engine_ddl.people ADD COLUMNS (phone STRING)")
    spark.sql("INSERT INTO engine_ddl.people VALUES (994,'Vijay',2174,'508-555-1212')")
    return spark.sql(
        "SELECT id, first_name, zipcode, phone FROM engine_ddl.people ORDER BY id"
    )
