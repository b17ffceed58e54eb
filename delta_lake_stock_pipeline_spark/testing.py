"""Oracle-comparison harness mirroring the driver's correctness gate:
row-count + schema (column names) + order-insensitive value comparison
between a Spark DataFrame and DuckDB SQL over the same parquet fixtures.

Used by tests/ locally so mismatches surface before the driver runs.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import time
from dataclasses import dataclass

import duckdb

from .sources.fixtures import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    # The comparison needs the PROCESS timezone pinned to UTC: PySpark's
    # collect() renders TimestampType as naive datetimes in the OS-local
    # zone, while DuckDB returns naive UTC wall-clock -- on a non-UTC host
    # every timestamp row would "mismatch" despite identical instants.
    # (spark.sql.session.timeZone governs SQL semantics, not collect().)
    if os.environ.get("TZ") not in (None, "UTC", "Etc/UTC"):
        raise RuntimeError(
            f"oracle comparison requires TZ=UTC, got TZ={os.environ['TZ']!r}"
        )
    os.environ.setdefault("TZ", "UTC")
    if hasattr(time, "tzset"):
        time.tzset()
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_value(v) -> str:
    """Engine-neutral stringification for order-insensitive comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            # Negative zero: DuckDB's round(double) preserves the sign bit
            # while Spark's BigDecimal round returns +0.0 -- numerically
            # equal values must not stringify as '-0' vs '0'.
            return "0"
        # 12 significant digits: collapses float-repr noise while still
        # catching real numeric divergence (queries round their outputs).
        return f"{v:.12g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


# Every DuckDB type that stringifies identically to its Spark counterpart
# under _norm_value. Anything else (HUGEINT, DECIMAL, UBIGINT, intervals,
# nested types...) is representation-divergence risk at the driver.
_PORTABLE_DUCKDB_TYPES = frozenset(
    {
        "BIGINT",
        "INTEGER",
        "SMALLINT",
        "TINYINT",
        "DOUBLE",
        "FLOAT",
        "VARCHAR",
        "DATE",
        "TIMESTAMP",
        "TIMESTAMP_NS",
        "BOOLEAN",
    }
)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str

    def __bool__(self) -> bool:
        return self.ok


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    """Order-insensitive comparison of a Spark result vs DuckDB oracle."""
    from pyspark.sql.types import DecimalType

    # The driver's value hash is representation-sensitive: Spark reports a
    # SUM(decimal(18,6)) as decimal(28,6) while DuckDB widens to
    # DECIMAL(38,6), so identical values still hash-mismatch (round-2
    # verdict). Queries must cast any final decimal column to DOUBLE on
    # both sides; fail fast here so it never reaches the driver.
    dec_cols = [
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    if dec_cols:
        return CompareResult(
            name,
            False,
            f"final schema contains DecimalType columns {dec_cols}; cast the "
            "outermost column to DOUBLE on both Spark and oracle sides",
        )
    s_cols = sorted(spark_df.columns)
    s_rows = [
        tuple(_norm_value(row[c]) for c in s_cols) for row in spark_df.collect()
    ]

    rel = con.sql(sql)
    # Mirror of the Spark-side DecimalType fail-fast, on the ORACLE's result
    # types: DuckDB silently widens SUM(BIGINT) / SUM(CASE...) to HUGEINT
    # (int128) and SUM(DECIMAL) to DECIMAL(38,s); the driver's value hash is
    # representation-sensitive, so such columns hash-mismatch even when
    # values are identical (round-2 decimal bug, round-3 HUGEINT bug). Only
    # engine-portable types may reach an oracle's final schema -- wrap
    # integer SUMs in CAST(... AS BIGINT) and decimal SUMs in
    # CAST(... AS DOUBLE).
    bad_types = [
        (c, t)
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if t.split("(")[0].upper() not in _PORTABLE_DUCKDB_TYPES
    ]
    if bad_types:
        return CompareResult(
            name,
            False,
            f"oracle result has non-portable DuckDB types {bad_types}; the "
            "driver's value hash is representation-sensitive -- CAST integer "
            "SUMs to BIGINT and decimal SUMs to DOUBLE in the oracle SQL",
        )
    d_cols_raw = list(rel.columns)
    d_cols = sorted(d_cols_raw)
    idx = [d_cols_raw.index(c) for c in d_cols]
    d_rows = [tuple(_norm_value(r[i]) for i in idx) for r in rel.fetchall()]

    if s_cols != d_cols:
        return CompareResult(name, False, f"schema mismatch: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        return CompareResult(
            name, False, f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
        )
    s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
    if s_sorted != d_sorted:
        diffs = [
            (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
        ][:3]
        return CompareResult(
            name,
            False,
            f"value mismatch on {sum(1 for a, b in zip(s_sorted, d_sorted) if a != b)}"
            f"/{len(s_rows)} rows; first diffs (spark vs duckdb): {diffs}; cols={s_cols}",
        )
    return CompareResult(name, True, f"{len(s_rows)} rows match")
