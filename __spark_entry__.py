"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``delta_lake_stock_pipeline_spark``; this module
only adapts them to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from delta_lake_stock_pipeline_spark.operators import all_oracles, all_queries
from delta_lake_stock_pipeline_spark.operators.aggregates import flagship_daily_rollup

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    scan -> derived date -> grouped multi-agg -> top-k: the reference's whole
    query surface in one statement (SURVEY.md §7.1).
    """
    return flagship_daily_rollup(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key; keys omitted here are
    non-SQL-expressible ops checked rows-only by the driver."""
    return all_oracles()
