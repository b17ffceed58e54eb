"""Scalar-function surface extensions (SURVEY.md §2.8).

The reference exercises only cast/timezone/to_date/round (F1-F5) and
imports-but-never-calls ``date_format`` (F6, ``stock_harvester.py:24``);
the driver fixtures add arrays (embeddings) worth first-class coverage.
Everything here is built-in Catalyst -- higher-order array functions run
inside codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 + date arithmetic: date_format, quarter/extract, date_add,
    datediff -- aggregated per month so the output stays compact."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.date_format("ts", "yyyy-MM").alias("month_str"),
            F.quarter("ts").alias("qtr"),
            F.to_date("ts").alias("d"),
        )
        .groupBy("month_str", "qtr")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.date_add(F.col("d"), 30)).alias("min_plus_30"),
            F.max(F.datediff(F.col("d"), F.lit("2024-01-01"))).alias("max_day_offset"),
        )
        .orderBy("month_str")
    )


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: size,
    ordered fold (``aggregate``), element-wise ``transform`` fold, min/max.
    Floats are cast to double inside the fold in BOTH engines so the
    left-to-right summation order (and hence the rounded result) matches
    exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(
                F.expr(
                    "aggregate(embedding, CAST(0 AS DOUBLE),"
                    " (acc, x) -> acc + CAST(x AS DOUBLE))"
                ),
                4,
            ).alias("sum_v"),
            F.round(
                F.expr(
                    "aggregate(embedding, CAST(0 AS DOUBLE),"
                    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
                ),
                4,
            ).alias("sum_sq"),
            F.round(F.array_max("embedding").cast("double"), 6).alias("max_v"),
            F.round(F.array_min("embedding").cast("double"), 6).alias("min_v"),
        )
        .orderBy("vec_id")
        .limit(1000)
    )


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (the one complex type the other queries don't touch):
    construct with ``create_map``, probe with ``element_at``, inspect with
    ``map_keys``/``size``. The oracle checks the extracted VALUES (map
    construction round-trips the inputs); map layout itself is
    engine-specific."""
    events = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return (
        events.select("event_id", m.alias("m"))
        .select(
            "event_id",
            F.element_at("m", "type").alias("type_val"),
            F.element_at("m", "uid").alias("uid_val"),
            F.size("m").alias("n_keys"),
            F.array_contains(F.map_keys("m"), "uid").alias("has_uid"),
        )
        .orderBy("event_id")
    )


def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safety surface (Spark 4 runs ANSI mode by default, where
    divide-by-zero / bad casts THROW): ``try_divide`` / ``try_cast`` /
    ``try_to_timestamp`` return NULL instead, making dirty-data pipelines
    total functions. The oracle mirrors with NULLIF / TRY_CAST.

    Per-group sums go through decimal(18,6) so cross-engine double
    summation order cannot perturb the last digit.

    Scale note: ``try_cast(string AS BIGINT)`` is EXCEPTION-driven on
    failure inside the JVM (~8 us/row measured -- 1.2 s over 150k
    always-failing rows, and at 100 TB the dominant cost of the whole
    query). ``try_cast`` is the right tool when dirt is RARE; for a column
    where failure is common, guard-then-cast compiles to branch-only
    codegen with identical NULL-on-failure semantics -- ``status_num``
    below uses that form (the regex mirrors Spark's integral-cast grammar:
    optional surrounding whitespace and sign), while ``prio_num`` keeps
    the ``try_cast`` surface on the always-parsing column."""
    orders = load_table(spark, sf_dir, "orders")
    grp = (F.col("o_custkey") % 3).cast("int")
    status_is_int = F.col("o_orderstatus").rlike(r"^\s*[+-]?[0-9]+\s*$")
    return (
        orders.select(
            grp.alias("grp"),
            F.try_divide(F.col("o_totalprice"), grp).alias("div"),
            F.expr(
                "try_cast(substring(o_orderpriority, 1, 1) as bigint)"
            ).alias("prio_num"),
            F.when(status_is_int, F.col("o_orderstatus").cast("bigint")).alias(
                "status_num"
            ),
            F.try_to_timestamp("o_orderstatus").alias("status_ts"),
        )
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("div").isNull().cast("long")).alias("n_div_null"),
            F.sum(F.col("div").cast("decimal(18,6)")).cast("double").alias("sum_div"),
            F.count("prio_num").alias("n_prio_parsed"),
            F.count("status_num").alias("n_status_parsed"),
            F.count("status_ts").alias("n_ts_parsed"),
        )
        .orderBy("grp")
    )


QUERIES = {
    "fn_try_funcs": try_funcs,
    "fn_date_funcs": date_funcs,
    "fn_array_funcs": array_funcs,
    "fn_map_funcs": map_funcs,
}

ORACLES = {
    "fn_try_funcs": """
        SELECT grp,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN div IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_div_null,
               CAST(SUM(CAST(div AS DECIMAL(18,6))) AS DOUBLE) AS sum_div,
               COUNT(prio_num) AS n_prio_parsed,
               COUNT(status_num) AS n_status_parsed,
               COUNT(status_ts) AS n_ts_parsed
        FROM (
            SELECT CAST(o_custkey % 3 AS INTEGER) AS grp,
                   o_totalprice / NULLIF(CAST(o_custkey % 3 AS INTEGER), 0) AS div,
                   TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
                   CASE WHEN regexp_matches(o_orderstatus,
                                            '^\\s*[+-]?[0-9]+\\s*$')
                        THEN CAST(trim(o_orderstatus) AS BIGINT)
                   END AS status_num,
                   TRY_CAST(o_orderstatus AS TIMESTAMP) AS status_ts
            FROM orders
        )
        GROUP BY grp ORDER BY grp
    """,
    "fn_date_funcs": """
        WITH e AS (
            SELECT strftime(ts, '%Y-%m') AS month_str,
                   EXTRACT(quarter FROM ts)::INT AS qtr,
                   CAST(ts AS DATE) AS d
            FROM events
        )
        SELECT month_str, qtr,
               COUNT(*) AS n_events,
               MIN(d + 30) AS min_plus_30,
               MAX(d - DATE '2024-01-01')::INT AS max_day_offset
        FROM e GROUP BY month_str, qtr ORDER BY month_str
    """,
    "fn_array_funcs": """
        SELECT vec_id,
               len(embedding) AS dim,
               ROUND(list_aggregate(list_transform(embedding, x -> x::DOUBLE), 'sum'), 4) AS sum_v,
               ROUND(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'), 4) AS sum_sq,
               ROUND(list_max(embedding)::DOUBLE, 6) AS max_v,
               ROUND(list_min(embedding)::DOUBLE, 6) AS min_v
        FROM embeddings ORDER BY vec_id LIMIT 1000
    """,
    "fn_map_funcs": """
        SELECT event_id,
               event_type AS type_val,
               CAST(user_id AS VARCHAR) AS uid_val,
               CAST(2 AS INTEGER) AS n_keys,
               TRUE AS has_uid
        FROM events
        ORDER BY event_id
    """,
}
