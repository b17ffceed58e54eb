"""Temporal column expressions.

Re-expresses the reference's derived-column pipeline (F1-F3,
``stock_harvester.py:160-163``): epoch-ms -> UTC timestamp -> market-local
timestamp -> calendar date. These are plain Catalyst expressions -- they stay
inside whole-stage codegen and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column | str) -> Column:
    """F1: epoch milliseconds -> TimestampType.

    ``(x / 1000).cast("timestamp")`` like the reference; the double division
    preserves sub-second precision before the cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c / F.lit(1000)).cast("timestamp")


def to_market_tz(ts: Column | str, tz: str = "America/New_York") -> Column:
    """F2: shift a UTC timestamp into a market timezone so late-day rows land
    on the correct calendar date (rationale: ``stock_harvester.py:155-159``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.from_utc_timestamp(c, tz)


def event_date(ts: Column | str) -> Column:
    """F3: timestamp -> DateType partition/predicate column.

    Materializing the date at write time (instead of computing it per-query)
    is the reference's core optimization (``DESIGN.md:27-33``): readable
    predicates plus partition pruning.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(c)
