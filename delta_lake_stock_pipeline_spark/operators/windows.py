"""Window-function operators (SURVEY.md SS2.5 -- extension set; the reference
has no windows, but its minute-bar data model is exactly what these serve:
bar-over-bar returns, moving averages, per-key ranking).

Scale note: every window here partitions by a key (user_id / event_type /
group key) -- one shuffle, then per-partition sorted evaluation. Unbounded
ORDER BY over the whole table (a single-partition window) is deliberately
avoided; that is the known 100 TB anti-pattern.

Determinism: window ORDER BY always ends with a unique tiebreak column
(event_id / orderkey) so ranks and frames are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per market segment by account balance;
    keep the top 3 per segment (classic top-k-per-group)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user ordered by time: event-over-event value delta
    (the bar-over-bar-returns pattern for the reference's OHLCV model)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta_prev"),
            F.lead("event_id", 1).over(w).alias("next_event_id"),
        )
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate with an explicit rows frame: trailing-3 average value
    per event_type ordered by time."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.round(F.avg("value").over(w), 4).alias("ma3"),
        )
    )


def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total (unbounded-preceding frame) of order value per customer
    ordered by order date."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
    )


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles of part retail price within brand + first/last value
    in an unbounded frame."""
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.ntile(4).over(w).alias("price_quartile"),
            F.first("p_partkey").over(wfull).alias("cheapest_part"),
            F.last("p_partkey").over(wfull).alias("priciest_part"),
        )
    )


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit full-partition
    frame, plus percent_rank and cume_dist -- the analytic value/distribution
    functions per market segment by balance. One shuffle on the partition
    key; the full-partition frame is explicit because last_value over the
    default (unbounded-preceding..current) frame is the classic silent-wrong
    window."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.first_value("c_custkey").over(wf).alias("richest_key"),
            F.last_value("c_custkey").over(wf).alias("poorest_key"),
            F.nth_value("c_custkey", 2).over(wf).alias("second_key"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("c_custkey") % 10 == 0)
    )


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame (vs the ROWS frames above): per event type, the
    trailing-2-DAY event count and value sum -- the frame is defined by the
    ORDER-BY VALUE (epoch ms), so sparse and dense time regions get the
    same wall-clock lookback, and equal-timestamp rows are peers (included
    wholesale), making the result tiebreak-independent. Per-row decimal
    cast inside the sliding SUM keeps the cents engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-2 * 86_400_000, Window.currentRow)
    )
    return ev.select(
        "event_type",
        "event_id",
        F.count("*").over(w).alias("n_2d"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 2
        ).alias("sum_2d"),
    )


QUERIES = {
    "w_rank": window_rank,
    "w_value_functions": window_value_functions,
    "w_lag_lead": window_lag_lead,
    "w_moving_avg": window_moving_avg,
    "w_cumulative": window_cumulative,
    "w_ntile": window_ntile,
    "w_range_interval": window_range_interval,
}

ORACLES = {
    "w_range_interval": """
        SELECT event_type, event_id,
               COUNT(*) OVER w AS n_2d,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE),
                     2) AS sum_2d
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ms(ts)
                     RANGE BETWEEN 172800000 PRECEDING AND CURRENT ROW)
    """,
    "w_value_functions": """
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   FIRST_VALUE(c_custkey) OVER wf AS richest_key,
                   LAST_VALUE(c_custkey) OVER wf AS poorest_key,
                   NTH_VALUE(c_custkey, 2) OVER wf AS second_key,
                   ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
                   ROUND(CUME_DIST() OVER w, 6) AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey),
                   wf AS (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING)
        ) WHERE c_custkey % 10 = 0
    """,
    "w_rank": """
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER w AS rn,
                   RANK() OVER w AS rnk,
                   DENSE_RANK() OVER w AS drnk
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal DESC, c_custkey)
        ) WHERE rn <= 3
    """,
    "w_lag_lead": """
        SELECT user_id, event_id,
               ROUND(value - LAG(value, 1) OVER w, 4) AS delta_prev,
               LEAD(event_id, 1) OVER w AS next_event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "w_moving_avg": """
        SELECT event_type, event_id,
               ROUND(AVG(value) OVER w, 4) AS ma3
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "w_cumulative": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER w, 2) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "w_ntile": """
        SELECT p_brand, p_partkey,
               NTILE(4) OVER w AS price_quartile,
               FIRST_VALUE(p_partkey) OVER wfull AS cheapest_part,
               LAST_VALUE(p_partkey) OVER wfull AS priciest_part
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey),
               wfull AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
}
