"""Schema-management DDL (SURVEY.md §2.3 D1-D4): catalog database/table
lifecycle with column evolution, mirroring the reference's source-side
DDL (/root/reference/sql/pubsub2bq.sql:3-7, ALTER at README.md:228,
sink recreate at README.md:379-392)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import scratch_dir


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
    tmp = scratch_dir("ddlq_")
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


@register(
    "sql_script_proc",
    oracle="""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_units,
               round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY o_orderstatus
        HAVING count(DISTINCT o_custkey) >= 2
    """,
    doc="Stored-procedure shape via Spark 4 SQL scripting (L3): a "
        "BEGIN...END block declares the privacy threshold as a variable "
        "and runs the gated aggregate with it — the engine-native port "
        "of the reference's CREATE PROCEDURE "
        "(/root/reference/sql/sp_demo_cleanroom.sql:1-79), whose body is "
        "exactly this pattern (parameterized clean-room aggregate over "
        "loaded tables). SURVEY §2.11 L3 previously mapped procedures to "
        "Python composition; SQL scripting closes the gap in-dialect.",
    scale_notes="Scripting is control flow on the DRIVER; every statement "
                "inside still compiles to a normal Catalyst plan (this "
                "one: two-phase distinct-agg, no extra cost vs the plain "
                "query). Variables substitute as literals at plan time, "
                "so pruning/pushdown see constants.",
)
def sql_script_proc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE min_units INT DEFAULT 2;
          SELECT o_orderstatus,
                 count(DISTINCT o_custkey) AS n_units,
                 round(sum(o_totalprice), 4) AS total
          FROM orders
          GROUP BY o_orderstatus
          HAVING count(DISTINCT o_custkey) >= min_units;
        END
        """
    )


@register(
    "sql_udf",
    oracle="""
        WITH rates AS (
            SELECT * FROM (VALUES ('A', 0.05), ('N', 0.02), ('R', 0.08))
                AS t(l_returnflag, audit_rate)
        ),
        net AS (
            SELECT l_returnflag,
                   CAST(floor(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax) * 100) AS BIGINT) AS net_cents
            FROM lineitem
        )
        SELECT n.l_returnflag,
               count(*) AS n_items,
               CAST(sum(n.net_cents) AS BIGINT) AS net_cents_total,
               r.audit_rate
        FROM net n JOIN rates r USING (l_returnflag)
        GROUP BY n.l_returnflag, r.audit_rate
        ORDER BY n.l_returnflag
    """,
    doc="SQL-defined UDFs (Spark 4.1 CREATE FUNCTION ... RETURN): a "
        "scalar SQL UDF computes per-item net price in integer cents and "
        "a table-valued SQL UDF serves per-flag audit rates, both "
        "invoked from one query over lineitem — the catalog-resident, "
        "engine-planned function tier below Python UDFs (the reference's "
        "routine surface, sql/sp_demo_cleanroom.sql, minus the "
        "procedural wrapper). Oracle inlines both bodies, proving the "
        "UDF layer adds no semantic drift.",
    scale_notes="SQL UDF bodies INLINE into the calling plan — Catalyst "
                "sees the expression, not a black box, so codegen, "
                "pushdown, and constant folding all apply; zero "
                "serialization boundary (the reason to prefer them over "
                "any Python tier when the logic is expressible). The "
                "table UDF here is constants; a parameterized body over "
                "a real table plans like a view with pushed predicates.",
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pubsub2bq_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents(
            ep DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(floor(ep * (1 - disc) * (1 + tax) * 100) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION audit_rates()
        RETURNS TABLE (l_returnflag STRING, audit_rate DOUBLE)
        RETURN SELECT * FROM VALUES ('A', 0.05), ('N', 0.02), ('R', 0.08)
                   AS t(l_returnflag, audit_rate)
        """
    )
    return spark.sql(
        """
        SELECT l.l_returnflag,
               count(*) AS n_items,
               sum(net_cents(l.l_extendedprice, l.l_discount, l.l_tax))
                   AS net_cents_total,
               r.audit_rate
        FROM lineitem l JOIN audit_rates() r USING (l_returnflag)
        GROUP BY l.l_returnflag, r.audit_rate
        ORDER BY l.l_returnflag
        """
    )
