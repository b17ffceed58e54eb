"""Custom Python DataSource connector (Spark 4 ``pyspark.sql.datasource``
API): the engine-hosted analog of the reference's REST ingest
(``/root/reference/stock_harvester.py:64-97`` pulls OHLCV bars over HTTP in
a driver-side loop). A Python DataSource inverts that shape: Spark plans
one ``InputPartition`` per ticker and the fetch/synthesis runs IN THE
EXECUTORS -- the 100 TB connector form, where the work distributes and the
driver only plans. No network in this environment, so the "fetch" is a
deterministic arithmetic bar synthesizer; the partition-per-ticker
planning, options plumbing, and executor-side iteration are the real
connector mechanics (a production source swaps the yield body for the
HTTP page loop).

Registered lazily per session (``register_ticks_source``); read via
``spark.read.format("spark_graft_ticks")``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_DEFAULT_TICKERS = "AAPL,MSFT,GOOG,AMZN"
_DEFAULT_N = 250
_MOD = 10007
_MIX = 2654435761  # Knuth multiplicative-hash constant


def tick_row(ticker: str, idx: int, seq: int) -> tuple:
    """The deterministic bar for (ticker partition idx, seq) -- pure
    integer arithmetic then one double division, so any engine reproduces
    it bit-for-bit (the DuckDB oracle recomputes this exact formula)."""
    h = (seq * _MIX + idx * 97) % _MOD
    return (ticker, seq, (10000 + h) / 100.0, h * 13 % 997)


class TickPartition(InputPartition):
    def __init__(self, idx: int, ticker: str, n: int):
        self.idx, self.ticker, self.n = idx, ticker, n


class TickReader(DataSourceReader):
    def __init__(self, options: dict):
        self.tickers = options.get("tickers", _DEFAULT_TICKERS).split(",")
        self.n = int(options.get("n", str(_DEFAULT_N)))

    def partitions(self):
        # One Spark partition per ticker: the fetch parallelizes across
        # executors exactly as a per-symbol REST pager would.
        return [TickPartition(i, t, self.n) for i, t in enumerate(self.tickers)]

    def read(self, part: TickPartition):
        for seq in range(part.n):
            yield tick_row(part.ticker, part.idx, seq)


class TickSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spark_graft_ticks"

    def schema(self) -> str:
        return "ticker string, seq bigint, price double, volume bigint"

    def reader(self, schema):
        return TickReader(self.options)


_registered: set[str] = set()


def register_ticks_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom format."""
    key = spark.sparkContext.applicationId
    if key not in _registered:
        spark.dataSource.register(TickSource)
        _registered.add(key)
