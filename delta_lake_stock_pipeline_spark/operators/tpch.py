"""Composite analytical queries in the shape of classic TPC-H (Q1, Q3, Q5,
Q6, Q10, Q18) over the driver's TPC-H-ish fixtures.

The reference's query surface is two grouped aggregates over one table
(``external_table.py:105-122``); these are the multi-way-join workloads a
user of a *general* analytics engine runs daily, and the primary bench
stressors at sf0.1. Every query is plain declarative DataFrame API --
Catalyst handles pushdown/pruning/join-order; we only shape what the
optimizer cannot know:

* bounded dims (nation, region) get ``F.broadcast`` hints so fact tables
  never shuffle for them;
* fact-fact joins (orders x lineitem) shuffle on the order key and are
  left to sort-merge/AQE;
* top-k results go through ``orderBy().limit()`` -> TakeOrderedAndProject
  (no global sort), with an explicit key tiebreak so LIMIT is
  deterministic for the oracle comparison.

Filter constants follow the classic TPC-H spec where the fixture value
domains allow (dates span 1995-2001 like real TPC-H).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _revenue_dec() -> F.Column:
    """Per-term decimal(18,6) cast of the revenue expression: summing it is
    exact and order-independent, so a rounded aggregate can never flip a
    cent between Spark's partial-aggregation order and DuckDB's serial sum
    (critical where the rounded value is also the ORDER BY key of a LIMIT,
    as in q3/q10)."""
    return _revenue().cast("decimal(18,6)")


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,6)")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: scan-heavy grouped aggregate with arithmetic between columns.
    One wide pass over lineitem; partial aggregation map-side, 6 groups out."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integer-valued -> double sums exact; money and
            # revenue terms go through exact decimal(18,6) sums (and avgs as
            # exact-sum / count) so no rounded value depends on
            # accumulation order across engines.
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum((_revenue() * (1 + F.col("l_tax"))).cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double")
                / F.count("l_extendedprice"),
                2,
            ).alias("avg_price"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / F.count("l_discount"), 4
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: 3-way join + grouped revenue + top-10. customer filter prunes the
    probe side before the join; the final top-k is TakeOrderedAndProject."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: 6-way join through customer AND supplier both pinned to the same
    nation -- the classic join-graph-with-a-cycle. nation/region broadcast;
    the two fact joins shuffle on their keys."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + global sum -- the pushdown showcase. All three
    predicates reach the parquet scan; no shuffle except the 1-row final agg."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: who returned the most revenue in a quarter -- join + group over a
    wide key tuple + top-20."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: HAVING over a grouped sum feeding a semi-join back into the fact
    tables -- aggregate-as-filter. The qualifying-orders set is tiny, so it
    broadcasts into the final join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        orders.join(
            F.broadcast(big_orders), orders.o_orderkey == big_orders.l_orderkey
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


QUERIES = {
    "h_q1_pricing_summary": q1_pricing_summary,
    "h_q3_shipping_priority": q3_shipping_priority,
    "h_q5_local_supplier_volume": q5_local_supplier_volume,
    "h_q6_forecast_revenue": q6_forecast_revenue,
    "h_q10_returned_items": q10_returned_items,
    "h_q18_large_volume_customer": q18_large_volume_customer,
}

ORACLES = {
    "h_q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_charge,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(l_extendedprice), 2) AS avg_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "h_q3_shipping_priority": """
        SELECT l_orderkey,
               CAST(o_orderdate AS DATE) AS orderdate,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, orderdate, l_orderkey
        LIMIT 10
    """,
    "h_q5_local_supplier_volume": """
        SELECT n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "h_q6_forecast_revenue": """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "h_q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "h_q18_large_volume_customer": """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS orderdate,
               ROUND(o_totalprice, 2) AS totalprice,
               ROUND(total_qty, 2) AS total_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 180
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
    """,
}
