"""Text-format source/sink round-trips (SURVEY.md SS2.1 scan-surface
extension): the engine's CSV and JSON-lines connectors, proven lossless.

The reference ingests from a REST API and stores Delta/parquet only; a
general engine also has to interchange with the text formats every data
vendor ships. Each key here writes the ``orders`` fixture out through the
format's sink (explicit schema, header on for CSV), reads it back through
the matching source, and aggregates; the DuckDB oracle computes the same
aggregate off the ORIGINAL parquet -- equality proves the round-trip
preserved every value (long, double, date, string with commas/quotes).

Scale notes: both readers are splittable line formats -- at 100 TB the
directory fans out across executors exactly like parquet (minus columnar
pruning: ReadSchema still prunes parsed columns, but every byte is read,
which is WHY the engine's native store is parquet; this surface is for
interchange). Sums are cast DECIMAL(18,6) on both sides: double summation
order differs across engines at the last bit, decimal is exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table

_ORDERS_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)

# (applicationId, sf_dir, fmt) -> written directory
_written: dict[tuple[str, str, str], str] = {}


def clear_roundtrip_dirs() -> None:
    """Delete every round-trip temp directory this process wrote. Call when
    done with a session (tests/conftest does, next to the dedup cache
    clear) -- otherwise each session leaks two orders-table copies under
    the system temp dir."""
    import shutil

    for path in _written.values():
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    _written.clear()


def _roundtrip_path(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write ``orders`` through the ``fmt`` sink once per session+fixture."""
    key = (spark.sparkContext.applicationId, sf_dir, fmt)
    if key not in _written:
        path = os.path.join(tempfile.mkdtemp(prefix=f"spark_{fmt}_rt_"), "orders")
        writer = load_table(spark, sf_dir, "orders").write
        if fmt == "csv":
            writer.option("header", "true").csv(path)
        elif fmt == "orc":
            writer.orc(path)
        else:
            writer.json(path)
        _written[key] = path
    return _written[key]


def _orders_aggregate(df: DataFrame) -> DataFrame:
    """Aggregate touching every round-tripped type: long key, double price
    (decimal-cast for cross-engine exactness), timestamp bounds, strings."""
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_price"),
            F.min("o_orderdate").alias("first_ts"),
            F.max("o_orderdate").alias("last_ts"),
            F.sum("o_orderkey").alias("sum_key"),
            F.sum(F.length("o_orderstatus")).alias("sum_status_len"),
        )
        .orderBy("o_orderpriority")
    )


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> CSV sink -> CSV source (explicit schema; header; quoted
    strings survive embedded commas) -> aggregate."""
    path = _roundtrip_path(spark, sf_dir, "csv")
    df = spark.read.schema(_ORDERS_DDL).option("header", "true").csv(path)
    return _orders_aggregate(df)


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> JSON-lines sink -> JSON source (explicit schema: schema
    inference over 100 TB would be a full extra pass) -> aggregate."""
    path = _roundtrip_path(spark, sf_dir, "json")
    df = spark.read.schema(_ORDERS_DDL).json(path)
    return _orders_aggregate(df)


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC sink -> ORC source -> aggregate. The third columnar
    format next to parquet: typed, splittable, predicate-pushdown-capable;
    schema travels IN the file so no explicit DDL on read."""
    path = _roundtrip_path(spark, sf_dir, "orc")
    return _orders_aggregate(spark.read.orc(path))


QUERIES = {
    "src_csv_roundtrip": csv_roundtrip,
    "src_json_roundtrip": json_roundtrip,
    "src_orc_roundtrip": orc_roundtrip,
}

_AGG_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
           MIN(o_orderdate) AS first_ts,
           MAX(o_orderdate) AS last_ts,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(length(o_orderstatus)) AS BIGINT) AS sum_status_len
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES = {
    "src_csv_roundtrip": _AGG_SQL,
    "src_json_roundtrip": _AGG_SQL,
    "src_orc_roundtrip": _AGG_SQL,
}
