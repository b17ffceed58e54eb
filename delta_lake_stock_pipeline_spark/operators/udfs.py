"""UDF surface (SURVEY.md §2.12 "UDF surface"): the four escape hatches out
of pure Catalyst, each demonstrated on a query that ALSO has an exact SQL
oracle -- so the harness proves the Python-side path computes exactly what
the declarative form would.

Scale ladder (slowest to fastest, per pyspark_guide/SNIPPETS patterns):

* row-at-a-time ``F.udf``      -- pickle per row, no codegen. Demonstrated
  once, deliberately on a tiny projection; real pipelines avoid it.
* ``pandas_udf`` (scalar)      -- Arrow-batched, vectorized numpy ops.
* ``applyInPandas``            -- grouped map; one shuffle on the group key,
  whole group as a pandas frame (bounded by group size, not table size).
* ``mapInPandas``              -- partition-wise streaming batches; no
  shuffle at all.

Every function still pushes filters/projections into Spark BEFORE the
Python boundary -- the Arrow transfer should carry only needed columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table


def py_udf_priority_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: extract the word after 'N-' in
    o_orderpriority ('1-URGENT' -> 'URGENT'); count orders per code.

    The UDF is a black box to Catalyst: no pushdown through it, every row
    crosses the JVM->Python pickle boundary. Kept to one narrow string
    column; the oracle proves equivalence to the built-in split form a real
    pipeline would use instead."""

    @F.udf("string")
    def priority_code(p):
        # Second dash-separated segment ONLY -- the oracle indexes
        # string_split(p, '-')[2], so keeping "the rest" after the first
        # dash would diverge on a two-dash priority like '2-HIGH-PRIO'.
        return p.split("-")[1].strip() if p and "-" in p else None

    orders = load_table(spark, sf_dir, "orders")
    return (
        # Filter JVM-side BEFORE the UDF (fewer rows cross the pickle
        # boundary) and mirror the oracle's WHERE contains(...,'-') exactly:
        # without it, a fixture whose priorities lack a dash would emit a
        # NULL code group the oracle filters out.
        orders.filter(F.col("o_orderpriority").contains("-"))
        .select(priority_code("o_orderpriority").alias("code"))
        .groupBy("code")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("code")
    )


def pandas_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: net revenue = extendedprice * (1-discount) *
    (1+tax), vectorized over Arrow batches, then aggregated per returnflag.
    ~10-100x the row-UDF throughput; still slower than the pure-Catalyst
    expression the oracle uses -- the comparison IS the point."""

    @F.pandas_udf("double")
    def net_revenue(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1.0 - discount) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            net_revenue("l_extendedprice", "l_discount", "l_tax").alias("net"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("net").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("net_revenue")
        )
        .orderBy("l_returnflag")
    )


_GROUP_STATS_SCHEMA = (
    "event_type STRING, n BIGINT, mean_value DOUBLE, sd_value DOUBLE, max_abs_z DOUBLE"
)


def _round4(x: float) -> float:
    """Half-away-from-zero to 4 decimals -- Spark's and DuckDB's ROUND mode.
    Python's built-in round() is banker's rounding and diverges on exact
    .00005 boundaries, so operators must never use it for oracle-bound
    values."""
    import math

    return (
        math.floor(x * 1e4 + 0.5) / 1e4
        if x >= 0
        else -math.floor(-x * 1e4 + 0.5) / 1e4
    )


def apply_in_pandas_group_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per event_type, z-score the values inside
    pandas and report (n, mean, sample sd, max |z|). One shuffle on the
    group key; each group materializes as a single pandas frame -- viable
    while the largest group fits an executor (here: 5 event types; at scale
    use a salted pre-agg instead).

    Exactness discipline: values have <= 6 decimals, so everything up to
    the final sqrt/divide is EXACT integer arithmetic on micros (m_i), with
    the same float operation sequence on both engine and oracle sides:

        mean = double(M) / n / 1e6                    M = sum(m_i)
        sd   = sqrt(double(SS) / (n-1)) / (n * 1e6)   SS = sum((m_i*n - M)^2)
        maxz = double(maxdev) / (n * 1e6 * sd)        maxdev = max|m_i*n - M|

    A pandas float mean (pairwise summation) against DuckDB's AVG
    (sequential) is accumulation-order-dependent and flakes at rounding
    boundaries; the integer form is partitioning- and order-independent."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        n = len(pdf)
        # NULL values: mirror the oracle exactly -- n counts every row
        # (COUNT(*)), but sums/devs/max skip NULL terms (DuckDB SUM/MAX
        # semantics). int(NaN) would crash the worker otherwise.
        v = pdf["value"].dropna()
        # Python ints from here: m_i*n - M squared overflows int64 (~1e28).
        # Half-away-from-zero micros, NOT pandas .round() (numpy rounds
        # half-to-even while DuckDB's round(value*1e6) is away-from-zero;
        # exact only while fixture values carry <= 6 decimals -- make the
        # rounding rule identical instead of relying on that).
        micros = [
            int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1) for x in v
        ]
        total = sum(micros)
        mean_out = _round4(float(total) / n / 1e6)
        if n < 2:
            # NULL (not NaN) for a single-row group's sample sd, matching
            # DuckDB's STDDEV_SAMP of one row.
            sd_out, z_out = None, None
        else:
            devs = [m * n - total for m in micros]
            ss = sum(d * d for d in devs)
            sd = (float(ss) / (n - 1)) ** 0.5 / (n * 1e6)
            sd_out = _round4(sd)
            if sd == 0:
                z_out = None
            else:
                z_out = _round4(float(max(abs(d) for d in devs)) / (n * 1e6 * sd))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "mean_value": [mean_out],
                "sd_value": [sd_out],
                "max_abs_z": [z_out],
            }
        )

    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(stats, schema=_GROUP_STATS_SCHEMA)
        .orderBy("event_type")
    )


def map_in_pandas_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise mapInPandas: parse the events.props JSON with pandas
    (streaming Arrow batches, zero shuffle), keep (event_type, k), then
    aggregate k per event_type Spark-side. The JSON never leaves the
    partition; only the 2 projected columns cross the Arrow boundary."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        def safe_k(s):
            # Dirty data yields NULL like the oracle's json_extract, never
            # a task-killing exception.
            if not isinstance(s, str):
                return None
            try:
                obj = json.loads(s)
            except ValueError:
                return None
            return obj.get("k") if isinstance(obj, dict) else None

        for pdf in batches:
            yield pd.DataFrame(
                {"event_type": pdf["event_type"], "k": pdf["props"].map(safe_k)}
            )

    events = load_table(spark, sf_dir, "events")
    parsed = events.select("event_type", "props").mapInPandas(
        parse, schema="event_type STRING, k BIGINT"
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@F.udtf(returnType="word string, pos int")
class _WordSplit:
    """Python UDTF (Spark 4): one input row -> many output rows, applied
    via LATERAL join. The row-generating escape hatch the four map-shaped
    UDFs can't express (explode handles simple splits; a UDTF carries
    arbitrary Python per-row fan-out logic)."""

    def eval(self, text: str):  # noqa: D102 - contract fixed by Spark
        # NULL -> no rows; EMPTY STRING -> one ('', 1) row, matching the
        # oracle's string_split('', ' ') = [''].
        if text is not None:
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1


def py_udtf_word_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF word fan-out over the first 50 documents: (doc_id, word, pos)
    one row per token. Filter is pushed BEFORE the lateral join so only the
    selected rows cross the Python boundary."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("word_split", _WordSplit)
    return spark.sql(
        """
        SELECT doc_id, s.word AS word, s.pos AS pos
        FROM udtf_docs, LATERAL word_split(text) s
        ORDER BY doc_id, pos
        """
    )


@F.udtf(returnType="word string, pos int", useArrow=True)
class _WordSplitArrow:
    """The SAME fan-out as ``_WordSplit`` but Arrow-optimized
    (``useArrow=True``): rows cross the Python boundary in Arrow batches
    instead of pickled one-at-a-time -- the UDTF rung of the ladder's
    pickle-vs-Arrow story (plan-gated: ArrowEvalPythonUDTF, not
    BatchEvalPythonUDTF)."""

    def eval(self, text: str):  # noqa: D102 - contract fixed by Spark
        if text is not None:
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1


def arrow_udtf_word_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow UDTF twin of ``u_py_udtf``: identical semantics and oracle,
    different transport -- completing the UDF ladder's demonstration that
    every Python escape hatch has an Arrow-batched form."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs_arrow")
    spark.udtf.register("word_split_arrow", _WordSplitArrow)
    return spark.sql(
        """
        SELECT doc_id, s.word AS word, s.pos AS pos
        FROM udtf_docs_arrow, LATERAL word_split_arrow(text) s
        ORDER BY doc_id, pos
        """
    )


def pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (a UDAF): quantity-weighted mean price
    per returnflag. The whole group's columns arrive as Series; Spark still
    runs a hash-partial/final pipeline around it (one shuffle on the key).

    Float caution, made exact: prices are 2-decimal values, so the UDAF
    sums integer CENTS (exact in int64) and divides once -- bit-identical
    to the oracle's integer-sum form regardless of summation order."""

    @F.pandas_udf("double")
    def wavg_price(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.astype("int64")
        return float((cents * q).sum()) / float(q.sum()) / 100.0

    # Spark disallows mixing a group-agg pandas UDF with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # second pandas aggregate.
    @F.pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                wavg_price(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("wavg_price"),
            n_rows(F.col("l_quantity")).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


def map_in_arrow_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` (Spark 4): partition-wise transform on RAW Arrow
    record batches -- one abstraction lower than mapInPandas (no pandas
    conversion at all; zero-copy into pyarrow.compute). Doubling is a
    power-of-two scale, so the float math is bit-exact and the oracle can
    mirror it as ``value * 2``."""
    import pyarrow as pa

    def double_value(batches):
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pc.multiply(batch.column(1), pa.scalar(2.0))],
                ["event_type", "value2"],
            )

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    return (
        events.mapInArrow(double_value, "event_type string, value2 double")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value2").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_doubled"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "u_py_udf": py_udf_priority_code,
    "u_pandas_udaf": pandas_udaf_weighted_mean,
    "u_map_in_arrow": map_in_arrow_scaled,
    "u_arrow_udtf": arrow_udtf_word_split,
    "u_pandas_udf": pandas_udf_net_revenue,
    "u_apply_in_pandas": apply_in_pandas_group_zscores,
    "u_map_in_pandas": map_in_pandas_json_props,
    "u_py_udtf": py_udtf_word_split,
}

ORACLES = {
    "u_pandas_udaf": """
        SELECT l_returnflag,
               ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0,
                     4) AS wavg_price,
               COUNT(*) AS n_items
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "u_map_in_arrow": """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value * 2 AS DECIMAL(18,6))) AS DOUBLE) AS sum_doubled
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "u_py_udf": """
        SELECT trim(string_split(o_orderpriority, '-')[2]) AS code,
               COUNT(*) AS n_orders
        FROM orders
        WHERE contains(o_orderpriority, '-')
        GROUP BY 1 ORDER BY 1
    """,
    "u_pandas_udf": """
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS net_revenue
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    # Mirrors the engine's exact-integer micros decomposition (see
    # apply_in_pandas_group_zscores): every sum is exact integer arithmetic
    # (HUGEINT intermediates never reach the final schema), and the float
    # op sequence (double-cast, divide, sqrt) is identical on both sides,
    # so results are accumulation-order-independent.
    "u_apply_in_pandas": """
        WITH m AS (
            SELECT event_type,
                   CAST(round(value * 1000000) AS BIGINT) AS mu
            FROM events
        ), agg AS (
            SELECT event_type, COUNT(*) AS n, SUM(mu) AS total
            FROM m GROUP BY event_type
        ), dev AS (
            SELECT m.event_type, a.n, a.total,
                   SUM((CAST(m.mu AS HUGEINT) * a.n - a.total)
                       * (CAST(m.mu AS HUGEINT) * a.n - a.total)) AS ss,
                   MAX(ABS(CAST(m.mu AS HUGEINT) * a.n - a.total)) AS maxdev
            FROM m JOIN agg a USING (event_type)
            GROUP BY m.event_type, a.n, a.total
        ), stats AS (
            SELECT event_type, n, total, maxdev,
                   CASE WHEN n < 2 THEN NULL
                        ELSE sqrt(CAST(ss AS DOUBLE) / (n - 1))
                             / (n * 1000000.0)
                   END AS sd_raw
            FROM dev
        )
        SELECT event_type,
               n,
               ROUND(CAST(total AS DOUBLE) / n / 1000000.0, 4) AS mean_value,
               ROUND(sd_raw, 4) AS sd_value,
               CASE WHEN sd_raw IS NULL OR sd_raw = 0 THEN NULL
                    ELSE ROUND(CAST(maxdev AS DOUBLE)
                               / (n * 1000000.0 * sd_raw), 4)
               END AS max_abs_z
        FROM stats
        ORDER BY event_type
    """,
    "u_map_in_pandas": """
        SELECT event_type,
               COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
               ROUND(AVG(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "u_arrow_udtf": """
        SELECT doc_id, word, CAST(pos AS INTEGER) AS pos
        FROM (
            SELECT doc_id,
                   UNNEST(string_split(text, ' ')) AS word,
                   UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
            FROM documents WHERE doc_id < 50
        )
        ORDER BY doc_id, pos
    """,
    "u_py_udtf": """
        SELECT doc_id, word, CAST(pos AS INTEGER) AS pos
        FROM (
            SELECT doc_id,
                   UNNEST(string_split(text, ' ')) AS word,
                   UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
            FROM documents WHERE doc_id < 50
        )
        ORDER BY doc_id, pos
    """,
}
