"""Projections, filters, sorts/limits, set ops, scalar functions.

Covers SURVEY.md SS2.2 (P1-P5 + first-class filters), SS2.6 (O1-O4), SS2.7
(set-op extensions), SS2.8 (F1-F5 scalar functions, JSON extension).

Scale notes:
* Every filter here is a plain Catalyst predicate -- at the parquet scan they
  show up as ``PushedFilters`` (verified with ``.explain("formatted")``), so
  at 100 TB row-groups that cannot match are never decompressed.
* Projections prune the scan (``ReadSchema`` carries only selected columns).
* Top-k compiles to ``TakeOrderedAndProject`` -- per-partition heaps + driver
  merge of k rows, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.temporal import event_date
from ..sources.fixtures import load_table

# --- Projections (P1-P5) ----------------------------------------------------


def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: plain column projection (reference: stock_harvester.py:211)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


def derived_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + F1/F3/F5: extend with derived temporal columns.

    Recasts the reference's epoch-ms -> timestamp -> date chain
    (stock_harvester.py:160-163): here we round-trip ts -> epoch millis ->
    date so the same unit conversions are exercised on the fixtures.
    """
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis("ts").alias("timestamp_ms"),
        event_date("ts").alias("event_date"),
    )


def field_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: rename/cast field-mapping projection (the ingest-shape projection,
    stock_harvester.py:84-95, as a declarative select)."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.col("p_retailprice").cast("double").alias("retail_price"),
        F.col("p_size").cast("bigint").alias("size_big"),
    )


# --- Filters (SS2.2 extension: first-class predicates) ----------------------


def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate; pushed to the parquet scan."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on the derived date (the reference's motivating
    anti-example, DESIGN.md:29-33: filter on a readable date, not epoch math)."""
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("order_date", event_date("o_orderdate"))
        .filter(F.col("order_date").between("1995-01-01", "1996-12-31"))
        .select("o_orderkey", "o_custkey", "order_date", "o_totalprice")
    )


def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction/disjunction of predicates."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 25))
        | (F.col("l_returnflag") == "A")
    ).select("l_orderkey", "l_linenumber", "l_discount", "l_quantity", "l_returnflag")


def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select("event_id", "user_id", "event_type")
    )


def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-predicate filter (the reference's ingest is null-tolerant,
    stock_harvester.py:87-94; here the predicate form)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("props").isNotNull() & F.col("value").isNotNull()).select(
        "event_id", "event_type"
    )


# --- Sorts / limits / top-k (O1-O4) ----------------------------------------


def sort_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: single-key global sort of a small aggregate output."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: multi-key sort (stock_harvester.py:212)."""
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_name", "s_acctbal")
        .orderBy("s_nationkey", F.desc("s_acctbal"))
    )


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: ORDER BY ... DESC LIMIT 5 -> TakeOrderedAndProject.

    Ties broken by key so the top-5 set is deterministic across engines.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(5)
    )


# --- Set operations (SS2.7) --------------------------------------------------


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two disjoint filtered subsets (the Spark-idiomatic form
    of the reference's Python-side accumulation, stock_harvester.py:143)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_id", "event_type")
    b = ev.filter(F.col("event_type") == "error").select("event_id", "event_type")
    return a.unionByName(b)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers that both placed an urgent order and a
    low-priority order."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with orders but none fulfilled ('F')."""
    o = load_table(spark, sf_dir, "orders")
    all_c = o.select("o_custkey")
    fulfilled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_c.subtract(fulfilled)


# --- Scalar functions: JSON (SS2.8 extension) --------------------------------


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over events.props (JSON-in-string, FIXTURES.md)."""
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        )
        .filter(F.col("prop_k").isNotNull())
    )


def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4): ``parse_json`` into the binary semi-structured
    type, ``variant_get`` for typed path extraction -- the engine-native
    upgrade over string probing (``fn_json_extract``'s get_json_object
    re-parses the string per path; a VARIANT column parses once and at
    scale can be shredded columnar at write time)."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.parse_json("props").alias("v"))
        .select(
            "event_id",
            F.try_variant_get(F.col("v"), "$.k", "bigint").alias("prop_k"),
        )
        .filter(F.col("prop_k").isNotNull())
    )


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function battery over part names (SS2.8 extension:
    lower/upper/substring/length/concat/regexp)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


QUERIES = {
    "p1_projection": projection,
    "p4_derived_projection": derived_projection,
    "p5_field_mapping": field_mapping,
    "f_filter_eq": filter_eq,
    "f_filter_range": filter_range,
    "f_filter_compound": filter_compound,
    "f_filter_isin": filter_isin,
    "f_filter_null": filter_null,
    "o1_sort_single": sort_single,
    "o2_sort_multi": sort_multi,
    "o4_topk": topk,
    "u_set_union": set_union,
    "u_set_intersect": set_intersect,
    "u_set_except": set_except,
    "fn_json_extract": json_extract,
    "fn_variant_json": variant_json,
    "fn_string_funcs": string_funcs,
}

ORACLES = {
    "p1_projection": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        FROM lineitem
    """,
    "p4_derived_projection": """
        SELECT event_id,
               epoch_ms(ts) AS timestamp_ms,
               CAST(ts AS DATE) AS event_date
        FROM events
    """,
    "p5_field_mapping": """
        SELECT p_partkey AS part_id,
               p_name AS part_name,
               CAST(p_retailprice AS DOUBLE) AS retail_price,
               CAST(p_size AS BIGINT) AS size_big
        FROM part
    """,
    "f_filter_eq": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem WHERE l_returnflag = 'R'
    """,
    "f_filter_range": """
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice
        FROM orders
        WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    """,
    "f_filter_compound": """
        SELECT l_orderkey, l_linenumber, l_discount, l_quantity, l_returnflag
        FROM lineitem
        WHERE (l_discount >= 0.05 AND l_quantity < 25) OR l_returnflag = 'A'
    """,
    "f_filter_isin": """
        SELECT event_id, user_id, event_type
        FROM events WHERE event_type IN ('purchase', 'signup')
    """,
    "f_filter_null": """
        SELECT event_id, event_type
        FROM events WHERE props IS NOT NULL AND value IS NOT NULL
    """,
    "o1_sort_single": """
        SELECT event_type, COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "o2_sort_multi": """
        SELECT s_suppkey, s_nationkey, s_name, s_acctbal
        FROM supplier ORDER BY s_nationkey, s_acctbal DESC
    """,
    "o4_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
    """,
    "u_set_union": """
        SELECT event_id, event_type FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_type = 'error'
    """,
    "u_set_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    "u_set_except": """
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "fn_json_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    "fn_variant_json": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
    "fn_string_funcs": """
        SELECT p_partkey,
               LOWER(p_name) AS name_lower,
               UPPER(p_brand) AS brand_upper,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               CONCAT_WS('|', p_brand, p_type) AS brand_type
        FROM part
    """,
}
