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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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


class TickStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same connector: micro-batches of ``batch``
    bars of one ticker, offset = next seq. ``read`` advances the offset
    (bounded by ``max_seq`` so tests can drain deterministically with
    ``availableNow`` -- one micro-batch per run, resumed exactly from the
    checkpointed offset); ``readBetweenOffsets`` replays a committed range
    after restart -- both produce ``tick_row`` bars, so replay is
    bit-identical to first delivery (the exactly-once contract this API
    asks the source to honor)."""

    def __init__(self, options: dict):
        self.ticker = options.get("ticker", "AAPL")
        self.batch = int(options.get("batch", "5"))
        self.max_seq = int(options.get("max_seq", "1000000"))

    def initialOffset(self):
        return {"seq": 0}

    def _rows(self, start: int, end: int) -> list:
        # A LIST, not a generator: the runner pickles the prefetched rows
        # to replay them in the micro-batch plan, and generators don't
        # pickle.
        return [tick_row(self.ticker, 0, s) for s in range(start, end)]

    def read(self, start):
        s = start["seq"]
        if s >= self.max_seq:
            return [], {"seq": s}
        e = min(s + self.batch, self.max_seq)
        return self._rows(s, e), {"seq": e}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["seq"], end["seq"])


class TickSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "spark_graft_ticks"

    def schema(self) -> str:
        return "ticker string, seq bigint, price double, volume bigint"

    def reader(self, schema):
        return TickReader(self.options)

    def simpleStreamReader(self, schema):
        return TickStreamReader(self.options)


import weakref

_registered: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def register_ticks_source(spark: SparkSession) -> None:
    """Idempotent per-SESSION registration of the custom format.
    DataSource registration lives in the session's DataSourceManager, not
    the SparkContext, so the memo must key on the session object (an
    applicationId key would wrongly skip `spark.newSession()` siblings;
    review finding). Registration costs ~1.8 s (pickled class shipment),
    hence memoized at all; re-registering is a safe replace."""
    if spark not in _registered:
        spark.dataSource.register(TickSource)
        _registered.add(spark)
