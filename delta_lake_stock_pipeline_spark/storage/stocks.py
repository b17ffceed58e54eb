"""The reference's stock-bar data model, synthesized in-engine.

Schema parity: ``STOCK_SCHEMA`` mirrors ``stock_harvester.py:51-61`` (9
fields, only ``ticker`` non-nullable); derived columns mirror
``stock_harvester.py:160-163`` (epoch-ms -> UTC ts -> NY ts -> trade_date).

Generation replaces the reference's driver-side REST loop
(``stock_harvester.py:117-143``) with a fully distributed form:
``spark.range`` over bar indices + hash-based deterministic pseudo-random
columns. No row ever exists on the driver, so the same code synthesizes 100
rows or 100 TB; this is the scale-out substitution SURVEY.md §2.1 S1 calls
for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# stock_harvester.py:43 ticker universe; :51-61 schema.
TICKERS = ("AAPL", "MSFT", "GOOGL", "AMZN", "TSLA", "META", "NVDA", "JPM")

STOCK_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("vwap", T.DoubleType(), True),
        T.StructField("timestamp_ms", T.LongType(), True),
        T.StructField("num_transactions", T.IntegerType(), True),
    ]
)

# 6.5 market hours -> 390 minute bars/day (DESIGN.md:18).
BARS_PER_DAY = 390
# Market open 09:30 America/New_York == 14:30 UTC (winter); a fixed Monday.
_FIRST_OPEN_UTC_MS = 1_704_722_400_000  # 2024-01-08T14:30:00Z
_DAY_MS = 86_400_000


def _u01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from hashing the given columns -- the
    distributed substitute for a seeded driver-side RNG."""
    h = F.xxhash64(*cols)
    return (F.abs(h) % F.lit(1_000_000)) / F.lit(1_000_000.0)


def synthesize_bars(
    spark: SparkSession,
    n_tickers: int = len(TICKERS),
    n_days: int = 5,
    bars_per_day: int = BARS_PER_DAY,
    seed: int = 42,
) -> DataFrame:
    """Deterministic minute-bar table matching ``STOCK_SCHEMA`` exactly.

    One ``spark.range`` over (ticker x day x minute) indices; every field is
    a codegen'd column expression seeded by ``xxhash64(seed, bar index)``.
    Invariants mirrored from the reference data (FIXTURES.md §A):
    ``low <= min(open, close)``, ``high >= max(open, close)``,
    ``low <= vwap <= high``, minute-aligned epoch-ms timestamps, and a
    uniform ``bars_per_day * n_days`` row count per ticker
    (``README.md:76-90`` golden invariant).
    """
    tickers = list(TICKERS)[:n_tickers]
    n = len(tickers) * n_days * bars_per_day
    ticker_map = F.array(*[F.lit(t) for t in tickers])

    df = (
        spark.range(n)
        .withColumn("ticker_idx", (F.col("id") / (n_days * bars_per_day)).cast("int"))
        .withColumn("day_idx", ((F.col("id") / bars_per_day) % n_days).cast("int"))
        .withColumn("minute_idx", (F.col("id") % bars_per_day).cast("int"))
        .withColumn("ticker", ticker_map[F.col("ticker_idx")])
        .withColumn(
            "timestamp_ms",
            F.lit(_FIRST_OPEN_UTC_MS)
            + F.col("day_idx").cast("long") * _DAY_MS
            + F.col("minute_idx").cast("long") * 60_000,
        )
    )
    base = 50.0 + 400.0 * _u01(F.lit(seed), F.col("ticker_idx"))  # per-ticker level
    o = base * (1.0 + 0.02 * (_u01(F.lit(seed + 1), F.col("id")) - 0.5))
    c = base * (1.0 + 0.02 * (_u01(F.lit(seed + 2), F.col("id")) - 0.5))
    spread = base * 0.005 * _u01(F.lit(seed + 3), F.col("id"))
    hi = F.greatest(o, c) + spread
    lo = F.least(o, c) - spread
    vw = lo + (hi - lo) * _u01(F.lit(seed + 4), F.col("id"))
    return df.select(
        "ticker",
        F.round(o, 4).alias("open"),
        F.round(hi, 4).alias("high"),
        F.round(lo, 4).alias("low"),
        F.round(c, 4).alias("close"),
        (F.abs(F.xxhash64(F.lit(seed + 5), "id")) % 1_000_000).alias("volume"),
        F.round(vw, 4).alias("vwap"),
        "timestamp_ms",
        (F.abs(F.xxhash64(F.lit(seed + 6), "id")) % 5_000)
        .cast("int")
        .alias("num_transactions"),
    )


def with_derived_columns(df: DataFrame) -> DataFrame:
    """The reference's three derived columns (``stock_harvester.py:160-163``):
    epoch-ms -> UTC timestamp -> America/New_York timestamp -> trade_date.
    The NY shift exists so late-UTC bars land on the correct market date."""
    return (
        df.withColumn("event_time_utc", (F.col("timestamp_ms") / 1000).cast("timestamp"))
        .withColumn(
            "event_time_ny", F.from_utc_timestamp("event_time_utc", "America/New_York")
        )
        .withColumn("trade_date", F.to_date("event_time_ny"))
    )


def daily_ohlc_envelope(bars: DataFrame) -> DataFrame:
    """Reference analytical query 1 (``external_table.py:148-154``):
    bar count + day low/high per (ticker, trade_date)."""
    return (
        bars.groupBy("ticker", "trade_date")
        .agg(
            F.count("*").alias("bar_count"),
            F.min("low").alias("day_low"),
            F.max("high").alias("day_high"),
        )
        .orderBy("ticker", "trade_date")
    )


def top_volume_days(bars: DataFrame, k: int = 5) -> DataFrame:
    """Reference analytical query 2 (``external_table.py:157-165``):
    top-k ticker-days by total volume (TakeOrderedAndProject top-k)."""
    return (
        bars.groupBy("ticker", "trade_date")
        .agg(
            F.sum("volume").alias("total_volume"),
            F.round(F.avg("vwap"), 2).alias("avg_vwap"),
        )
        .orderBy(F.desc("total_volume"))
        .limit(k)
    )
