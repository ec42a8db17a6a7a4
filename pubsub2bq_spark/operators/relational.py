"""Relational core: scan, project, filter, sort/limit, set ops, scalar funcs.

SURVEY.md §2.2 (P5-P7), §2.8 (O1-O4), §2.9. All pure Catalyst
built-ins; filters and projections are written so they push down to
the parquet scan (verify with .explain: PushedFilters / ReadSchema).

Scale posture: every query here is shuffle-free except the global
sort (range-partitioned exchange) and the set ops (hash shuffle on
the full row), which is exactly the minimum Spark requires for those
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pubsub2bq_spark.registry import register
from pubsub2bq_spark.tables import load


# --------------------------------------------------------------------------
# P5: full scan
# --------------------------------------------------------------------------
@register(
    "scan_all",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="Full-table scan + project-all (reference validation pattern: "
        "`select * from people`, /root/reference/README.md:167,201).",
    scale_notes="Vectorized parquet scan, no shuffle; at 100 TB this is a "
                "pure map stage bounded by I/O.",
)
def scan_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "region").select("r_regionkey", "r_name")


# --------------------------------------------------------------------------
# P6: projection / rename / computed columns
# --------------------------------------------------------------------------
@register(
    "project_compute",
    oracle="""
        SELECT
            c_custkey,
            upper(c_name)                       AS name_upper,
            round(c_acctbal * 1.1, 4)           AS bal_uplift,
            c_mktsegment                        AS segment,
            length(c_name)                      AS name_len
        FROM customer
    """,
    doc="SELECT-list projection with renames and computed columns "
        "(BigQuery/MySQL SELECT surface the reference delegates to).",
    scale_notes="Narrow map-only plan; ReadSchema prunes to 4 columns.",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey"),
        F.upper("c_name").alias("name_upper"),
        F.round(F.col("c_acctbal") * 1.1, 4).alias("bal_uplift"),
        F.col("c_mktsegment").alias("segment"),
        F.length("c_name").alias("name_len"),
    )


# --------------------------------------------------------------------------
# P7: row filters (=, <, >, IN, BETWEEN, LIKE, AND/OR/NOT)
# --------------------------------------------------------------------------
@register(
    "filter_pred",
    oracle="""
        SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_returnflag
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_quantity BETWEEN 5 AND 40
          AND l_returnflag IN ('A', 'N')
          AND NOT (l_linestatus = 'O' AND l_discount > 0.05)
          AND l_extendedprice > 1000.0
    """,
    doc="Compound predicate: range + IN + BETWEEN + boolean combinators.",
    scale_notes="All conjuncts are parquet-pushable (PushedFilters); "
                "row-group min/max stats skip most of a 100 TB scan when "
                "data is clustered on l_shipdate.",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_quantity").between(5, 40)
        & F.col("l_returnflag").isin("A", "N")
        & ~((F.col("l_linestatus") == "O") & (F.col("l_discount") > 0.05))
        & (F.col("l_extendedprice") > 1000.0)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag")


# --------------------------------------------------------------------------
# O1+O2: global sort + limit (top-k)
# --------------------------------------------------------------------------
@register(
    "sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    doc="Global ORDER BY + LIMIT; deterministic tie-break on the key.",
    scale_notes="Catalyst compiles sort+limit to TakeOrderedAndProject: "
                "per-partition top-k then a single-reduce merge — no global "
                "range-partitioned sort is materialized, so this stays cheap "
                "at any scale.",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("total"),
                 F.col("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .drop("o_totalprice")
    )


# --------------------------------------------------------------------------
# O3: union all (+ aggregation over the union)
# --------------------------------------------------------------------------
@register(
    "union_all",
    oracle="""
        SELECT nk, count(*) AS n
        FROM (
            SELECT c_nationkey AS nk FROM customer
            UNION ALL
            SELECT s_nationkey AS nk FROM supplier
        )
        GROUP BY nk
    """,
    doc="UNION ALL of two relations + group-count over the union.",
    scale_notes="Union is plan-level concat (no shuffle); the groupBy adds "
                "one hash shuffle with map-side partial aggregation.",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# O4: intersect / except
# --------------------------------------------------------------------------
@register(
    "intersect_except",
    oracle="""
        SELECT nk, 'both' AS tag FROM (
            SELECT c_nationkey AS nk FROM customer
            INTERSECT
            SELECT s_nationkey AS nk FROM supplier
        )
        UNION ALL
        SELECT nk, 'customer_only' AS tag FROM (
            SELECT c_nationkey AS nk FROM customer
            EXCEPT
            SELECT s_nationkey AS nk FROM supplier
        )
    """,
    doc="INTERSECT and EXCEPT (set semantics), tagged and unioned.",
    scale_notes="Each set op is a distinct-style hash shuffle; Catalyst "
                "rewrites them to left-semi/anti joins after aggregation.",
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    cust_only = c.subtract(s).withColumn("tag", F.lit("customer_only"))
    return both.unionByName(cust_only)


# --------------------------------------------------------------------------
# §2.9 scalar function families
# --------------------------------------------------------------------------
@register(
    "string_funcs",
    oracle="""
        SELECT
            c_custkey,
            concat(c_mktsegment, '-', c_name)            AS seg_name,
            substr(c_name, 1, 8)                          AS name_prefix,
            lower(c_mktsegment)                           AS seg_lower,
            trim(c_name)                                  AS name_trim,
            length(c_name)                                AS name_len,
            (c_name LIKE '%1%')                           AS has_one,
            regexp_extract(c_name, '([0-9]+)', 1)         AS name_digits,
            split_part(c_name, '#', 1)                    AS name_stem
        FROM customer
    """,
    doc="String family: concat, substr, upper/lower, trim, LIKE, regexp, split, length.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_name")).alias("seg_name"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim("c_name").alias("name_trim"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.split("c_name", "#").getItem(0).alias("name_stem"),
    )


@register(
    "date_funcs",
    oracle="""
        SELECT
            o_orderkey,
            CAST(year(o_orderdate) AS INTEGER)                    AS o_year,
            CAST(month(o_orderdate) AS INTEGER)                   AS o_month,
            CAST(day(o_orderdate) AS INTEGER)                     AS o_day,
            date_trunc('month', o_orderdate)                      AS month_start,
            CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
                                                                  AS days_since_95,
            CAST(epoch(o_orderdate) AS BIGINT)                    AS unix_ts,
            strftime(o_orderdate, '%Y-%m-%d')                     AS iso_day
        FROM orders
    """,
    doc="Date/time family: extract parts, truncation, diff, unix epoch, format.",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@register(
    "math_funcs",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            round(l_extendedprice * (1 - l_discount), 4)   AS net_price,
            CAST(floor(l_extendedprice) AS BIGINT)         AS price_floor,
            CAST(ceil(l_extendedprice) AS BIGINT)          AS price_ceil,
            abs(l_discount - 0.05)                         AS disc_dev,
            round(ln(l_extendedprice), 6)                  AS price_ln,
            round(pow(l_quantity, 2), 4)                   AS qty_sq,
            CAST(l_quantity AS BIGINT) % 7                 AS qty_mod
        FROM lineitem
        WHERE l_orderkey % 100 = 0
    """,
    doc="Math family: round, floor/ceil, abs, ln, pow, mod.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@register(
    "case_when",
    oracle="""
        SELECT
            o_orderkey,
            CASE WHEN o_totalprice > 300000 THEN 'large'
                 WHEN o_totalprice > 100000 THEN 'medium'
                 ELSE 'small' END                          AS size_band,
            coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_label,
            CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                 THEN TRUE ELSE FALSE END                  AS is_urgent
        FROM orders
    """,
    doc="Conditional family: CASE WHEN, coalesce, nullif.",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        (
            F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%")
        ).alias("is_urgent"),
    )


@register(
    "json_extract",
    oracle="""
        SELECT
            event_id,
            json_extract_string(props, '$.k')                  AS k_str,
            CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_int
        FROM events
    """,
    doc="JSON family: extract a field from the events.props JSON string.",
    scale_notes="get_json_object is JVM-side (Jackson) — no Python; at scale "
                "prefer from_json once per schema to parse all fields in one pass.",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
    )


@register(
    "array_funcs",
    oracle="""
        SELECT
            vec_id,
            CAST(len(embedding) AS INTEGER)                                 AS dim,
            round(CAST(embedding[1] AS DOUBLE), 6)                          AS first_val,
            round(list_sum(CAST(embedding AS DOUBLE[])), 4)                 AS vec_sum,
            CAST(label IN (0, 1, 2) AS BOOLEAN)                             AS label_small
        FROM embeddings
    """,
    doc="Array family: size, element access, aggregate-fold sum over array<float>.",
    scale_notes="F.aggregate folds JVM-side over the array — no explode, no "
                "shuffle, no Python.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.col("label").isin(0, 1, 2).alias("label_small"),
    )


@register(
    "cast_funcs",
    oracle="""
        SELECT
            o_orderkey,
            CAST(o_orderkey AS VARCHAR)                    AS key_str,
            CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)    AS key_roundtrip,
            CAST(o_custkey AS DOUBLE)                      AS cust_dbl,
            strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')     AS ts_str,
            CAST(strftime(o_orderdate, '%Y-%m-%d') AS TIMESTAMP) AS day_ts
        FROM orders
    """,
    doc="Cast family: int↔string, int→double, timestamp↔string (the "
        "reference's three-layer type mapping, SURVEY.md §1.2).",
)
def cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_custkey").cast("double").alias("cust_dbl"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.date_format("o_orderdate", "yyyy-MM-dd").cast("timestamp").alias("day_ts"),
    )


# --------------------------------------------------------------------------
# S7: batch parquet load (LOAD DATA ... FROM FILES equivalent)
# --------------------------------------------------------------------------
@register(
    "parquet_load",
    oracle="""
        SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 4) AS total
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Batch parquet load with wildcard URI → table → query "
        "(reference: LOAD DATA OVERWRITE ... FROM FILES(format='PARQUET', "
        "uris=['gs://…/*']), /root/reference/sql/sp_demo_cleanroom.sql:43-47).",
    scale_notes="Glob-expanded vectorized scan; schema comes from parquet "
                "footers, partition discovery handles directory layouts.",
)
def parquet_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wildcard load, mirroring the reference's uris=['.../*'] pattern.
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df.createOrReplaceTempView("loaded_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 4) AS total
        FROM loaded_lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "map_funcs",
    # Map values surface as scalars (map types don't hash-compare across
    # engines): key lookup, membership, size, and the sorted key list.
    oracle="""
        SELECT event_id,
               event_type                          AS m_type,
               CAST(value >= 50.0 AS VARCHAR)      AS m_high,
               2                                   AS m_size,
               'high,type'                         AS m_keys
        FROM events
    """,
    doc="Map family (§2.9, the attributes model of §1.4): build a "
        "map<string,string> per event (create_map — the Pub/Sub message "
        "attributes shape, README.md:293-295), then element_at lookups, "
        "size, and sorted map_keys — accessed back out as scalars so the "
        "oracle compares engine-portably.",
    scale_notes="Pure projection: map construction and access are "
                "codegen'd per-row expressions, no shuffle, no Python — "
                "the same cost envelope as the attributes map the CDC "
                "publish stage builds (streaming/cdc.py).",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("high"), (F.col("value") >= 50.0).cast("string"),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "high").alias("m_high"),
        F.size(m).alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("m_keys"),
    )


@register(
    "safe_funcs",
    # DuckDB twins: TRY_CAST, and NULL-guarded arithmetic for the
    # division/overflow cases try_* absorbs.
    oracle="""
        SELECT event_id,
               TRY_CAST(event_type AS BIGINT)                       AS bad_cast,
               TRY_CAST(substr(props, 7, 2) AS BIGINT)              AS digit_cast,
               CASE WHEN CAST(floor(value) AS BIGINT) % 7 = 0 THEN NULL
                    ELSE round(value / (CAST(floor(value) AS BIGINT) % 7), 4)
               END                                                  AS safe_div,
               TRY_CAST(concat('20', substr(props, 7, 2), '-13-01') AS DATE)
                                                                    AS bad_date
        FROM events
    """,
    doc="SAFE-function family: Spark's try_cast / try_divide / try_to_* "
        "absorb errors to NULL instead of failing the job — the engine "
        "analog of BigQuery's SAFE.* dialect (the reference's sink "
        "engine). Exercised on guaranteed-bad inputs (alphabetic cast, "
        "month-13 date), a value-dependent division that hits divide-by-"
        "zero, and a valid digit cast as the control.",
    scale_notes="Pure projection, codegen'd; the point at 100 TB is "
                "operational — one malformed row NULLs out instead of "
                "killing a 10-hour job, and the NULL count is the data-"
                "quality metric (dead_letter's batch analog for scalar "
                "expressions).",
)
def safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    digits = F.substring("props", 7, 2)
    return e.select(
        "event_id",
        F.col("event_type").try_cast("bigint").alias("bad_cast"),
        digits.try_cast("bigint").alias("digit_cast"),
        F.round(
            F.try_divide(F.col("value"), F.floor("value").cast("bigint") % 7), 4
        ).alias("safe_div"),
        F.try_to_date(F.concat(F.lit("20"), digits, F.lit("-13-01"))).alias(
            "bad_date"
        ),
    )
