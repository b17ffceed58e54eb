"""Window-function operators (SURVEY.md SS2.5 -- extension set; the reference
has no windows, but its minute-bar data model is exactly what these serve:
bar-over-bar returns, moving averages, per-key ranking).

Scale note: every window here partitions by a key (user_id / event_type /
group key) -- one shuffle, then per-partition sorted evaluation. Unbounded
ORDER BY over the whole table (a single-partition window) is deliberately
avoided; that is the known 100 TB anti-pattern.

Partition-key cardinality: sliding FRAMES over inherently low-cardinality
keys are decomposed so no task holds a key's whole history --
``window_range_interval`` (bucketed two-pass prefix sum) and
``window_moving_avg`` (carry-rows range pids, ``trailing_mean_rows``).
``w_rank`` (top-k-per-group) is already scale-safe on its low-cardinality
key: the rank filter triggers Catalyst's ``WindowGroupLimit`` pushdown
(map-side partial top-k before the shuffle; plan-gated). The unfiltered
demos (``w_ntile``/``w_value_functions``) emit every row per bounded demo
key (5 market segments, 25 brands); when such a key is genuinely
low-cardinality at scale AND the full output is needed, the two-phase
decomposition applies (per-pid ``row_number`` + offsets per (pid, key) --
the ``trailing_mean_rows``/``scale.ranged_with_offsets`` pattern; ranks
are order-determined, so offsets shift them exactly).

Determinism: window ORDER BY always ends with a unique tiebreak column
(event_id / orderkey) so ranks and frames are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per market segment by account balance;
    keep the top 3 per segment (classic top-k-per-group).

    Scale shape: the ``rn <= 3`` filter triggers Catalyst's
    ``WindowGroupLimit`` pushdown (plan-gated) -- each MAP task keeps only
    its local top-3 per segment before the shuffle, so the exchange
    carries ≤ 3 x segments x tasks rows and the final window sorts a tiny
    relation. The low cardinality of the partition key is therefore
    harmless here, unlike an unfiltered sliding frame (see
    ``trailing_mean_rows`` for that case)."""
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


_MA_K = 3
_MA_PARTS = 16

# Hybrid cutover (tools/ma_scaling_bench.py, 32 cores, 3 types): the plain
# type-partitioned window beats scatter-to-frames ~2x at EVERY tested size
# (1M/4M/16M rows -- both forms are linear, so the ratio is
# core-count-dependent, not data-dependent; scatter's k-times multiplier +
# second shuffle only pays once cluster cores per distinct key exceed
# ~20). The threshold below bounds the worst-case SINGLE-TASK work of the
# window path: up to 8M rows per key, one task sorts/scans in a few
# seconds within executor memory; past it, the per-key cap dominates any
# constant-factor advantage and scatter is the only shape that survives
# unbounded per-key growth.
_SCATTER_MIN_ROWS_PER_KEY = 8_000_000


def trailing_mean_rows(
    df: DataFrame,
    k: int = _MA_K,
    n_partitions: int = _MA_PARTS,
    scatter_min_rows_per_key: int = _SCATTER_MIN_ROWS_PER_KEY,
) -> DataFrame:
    """Exact trailing-``k`` ROWS mean of ``micros`` (integer units) per
    ``event_type`` in (ts, event_id) order WITHOUT partitioning the window
    by the type -- the scatter-to-frames decomposition of a sliding ROWS
    frame (round-3 re-plan, same motivation as ``window_range_interval``:
    event_type has a handful of distinct values at ANY data size, so a
    type-partitioned window lands each type's entire history in one task).

    1. Global per-type row index ``rn``: ``repartitionByRange(event_type,
       ts, event_id)`` (pids contiguous in the total order, pinned by
       ``localCheckpoint``), per-(pid, type) ``row_number`` plus a literal
       per-(pid, type) offset map -- because a type's rows are contiguous
       across the range order, there are at most n_partitions + n_types
       (pid, type) groups, so the offset table is driver metadata.
    2. Scatter: each row contributes to the frames of rows ``rn .. rn+k-1``
       of its type (``explode`` of k target indices -- a map-side k-times
       row multiplier, no driver involvement).
    3. One hash aggregate on the HIGH-cardinality key (type, target_rn):
       exact integer sum + frame count; the anchor row's id rides along
       tagged on its j=0 contribution. Targets past a type's last row have
       no anchor and drop out.

    Exact for every partition layout (no carry chaining across thin range
    partitions -- the defect the first version of this re-plan had), and
    order-independent because the frame aggregate is a LONG sum. Returns
    (event_type, event_id, ma) with ``ma = sum/count`` in double.

    HYBRID: when every key's history fits the single-task budget
    (``scatter_min_rows_per_key``), the function takes the plain
    type-partitioned window instead -- identical semantics, measured ~2x
    faster at every size on 32 cores (tools/ma_scaling_bench.py; the
    scatter form only pays once cluster cores per key exceed ~20).

    Decision cost, honestly: the path choice is an EXTRA eager count job
    on every call -- a full input scan that map-side-combines to |types|
    rows before collect. On the small path that makes the total work
    decision-scan + window-shuffle; on the scatter path the job runs in
    ADDITION to the post-checkpoint (pid, type) offset collect, which
    cannot replace it because the offsets only exist after the range
    shuffle the decision is deciding whether to pay. Routing the decision
    through the ranged layout instead would charge the small (measured
    common) path a range shuffle + localCheckpoint materialisation it
    does not need, so the standalone count is the cheaper contract: one
    map-side aggregate vs a full extra shuffle at 100 TB."""
    per_key: dict[str, int] = {
        r["event_type"]: int(r["c"])
        for r in df.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    if not per_key:
        return df.select(
            "event_type", "event_id", F.lit(None).cast("double").alias("ma")
        )
    if max(per_key.values()) <= scatter_min_rows_per_key:
        w_small = (
            Window.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(-(k - 1), 0)
        )
        return df.select(
            "event_type",
            "event_id",
            (
                F.sum("micros").over(w_small).cast("double")
                / F.count("*").over(w_small)
            ).alias("ma"),
        )
    ranged = df.repartitionByRange(n_partitions, "event_type", "ts", "event_id")
    with_pid = ranged.withColumn("pid", F.spark_partition_id()).localCheckpoint()
    groups = sorted(
        (int(r["pid"]), r["event_type"], int(r["c"]))
        for r in with_pid.groupBy("pid", "event_type")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    offsets: dict[tuple[int, str], int] = {}
    running: dict[str, int] = {}
    for pid, etype, c in groups:
        offsets[(pid, etype)] = running.get(etype, 0)
        running[etype] = running.get(etype, 0) + c
    # Nested literal map pid -> (event_type -> offset): collision-proof,
    # unlike a concat_ws('|', pid, etype) string key, which would conflate
    # two distinct (pid, type) pairs whenever a type value contains '|'
    # (the helper is generic and property-tested with arbitrary frames).
    nested: dict[int, dict[str, int]] = {}
    for (pid, etype), off in offsets.items():
        nested.setdefault(pid, {})[etype] = off
    off_map = F.create_map(
        *[
            part
            for pid, by_type in nested.items()
            for part in (
                F.lit(pid),
                F.create_map(
                    *[
                        y
                        for etype, off in by_type.items()
                        for y in (F.lit(etype), F.lit(off))
                    ]
                ),
            )
        ]
    )
    w_rn = Window.partitionBy("pid", "event_type").orderBy("ts", "event_id")
    indexed = with_pid.select(
        "event_type",
        "event_id",
        "micros",
        (
            F.row_number().over(w_rn) + off_map[F.col("pid")][F.col("event_type")]
        ).alias("rn"),
    )
    scattered = indexed.select(
        "event_type",
        "micros",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        (F.col("rn") + F.col("j")).alias("t_rn"),
        F.when(F.col("j") == 0, F.col("event_id")).alias("anchor"),
    )
    return (
        scattered.groupBy("event_type", "t_rn")
        .agg(
            F.sum("micros").alias("s"),
            F.count("*").alias("c"),
            F.max("anchor").alias("event_id"),
        )
        .filter(F.col("event_id").isNotNull())
        .select(
            "event_type",
            "event_id",
            (F.col("s").cast("double") / F.col("c")).alias("ma"),
        )
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate with an explicit rows frame: trailing-3 average value
    per event_type ordered by time -- via the scatter-to-frames
    decomposition (``trailing_mean_rows``), so the window never partitions
    by the low-cardinality type. ``value`` goes through the same
    decimal(18,6) -> integer-micros conversion as ``window_range_interval``
    so frame sums are exact longs; the oracle applies the identical
    conversion."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").alias(
            "micros"
        ),
    )
    return trailing_mean_rows(ev).select(
        "event_type",
        "event_id",
        F.round(F.col("ma") / 1000000.0, 4).alias("ma3"),
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


def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the event-value series -- the classic
    time-series risk metric of the reference's stock domain
    (``/root/reference/external_table.py:105-122`` queries bar extremes;
    drawdown is the running-peak generalization): cumulative running max
    (peak) minus current value, maxed over the series.

    Exact double arithmetic end to end (max / subtract only -- no division
    or accumulation-order sensitivity), so no rounding tolerance is needed.
    The peak window and the final aggregate share the ``user_id`` key: the
    group-by reuses the window's hash partitioning, so the plan has ONE
    hash exchange (plus the presentation sort's range exchange --
    plan-gated in tests). Per the window-staging rule, ``peak`` is
    projected ONCE before the two aggregates that consume it."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.max("value").over(w).alias("peak"),
    )
    return (
        staged.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max(F.col("peak") - F.col("value")).alias("max_drawdown"),
            F.max("peak").alias("max_peak"),
        )
        .orderBy("user_id")
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


#: Trailing lookback of the time-RANGE frame (2 days, epoch ms).
_RANGE_MS = 2 * 86_400_000
#: Coarse time-bucket width for the two-pass prefix-sum plan (1 day). The
#: window partition key is (event_type, bucket), so parallelism is
#: n_types x n_buckets and no partition ever holds more than one bucket's
#: worth of history -- shrink this to add parallelism at higher densities.
_BUCKET_MS = 86_400_000


def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame (vs the ROWS frames above): per event type, the
    trailing-2-DAY event count and value sum -- the frame is defined by the
    ORDER-BY VALUE (epoch ms), so sparse and dense time regions get the
    same wall-clock lookback, and equal-timestamp rows are peers (included
    wholesale), making the result tiebreak-independent.

    Scale plan (round-3 re-plan): a naive
    ``Window.partitionBy("event_type").rangeBetween(-L, 0)`` caps
    parallelism at the handful of distinct event types and lands each
    type's ENTIRE history in one task -- the unbounded-partition
    anti-pattern. Instead, a two-pass bucketed prefix-sum over coarse
    1-day buckets:

      frame(t) = prefix(t, peers-inclusive) - prefix(t - L, strict)

    where each prefix splits into a cumulative total over WHOLE earlier
    buckets (a window over the tiny per-(type, bucket) aggregate table,
    broadcast back) plus a within-bucket running sum (window partitioned
    by (event_type, bucket) -- bounded size, n_types x n_buckets
    parallelism). The strict prefix at t - L is evaluated by injecting a
    zero-weight PROBE row per event: data rows sort at ``2 * ts`` and the
    probe at ``2 * (ts - L) - 1``, so a range frame up to the probe
    includes exactly the data rows with ts < t - L while equal-ts data
    rows stay peers of each other. All frame math is exact long micros
    (value -> decimal(18,6) -> micro-units); the decimal -> double ->
    round conversion happens once at the end, identically to the oracle's
    ``ROUND(CAST(SUM(DECIMAL) AS DOUBLE), 2)``."""
    lookback, bucket_ms = _RANGE_MS, _BUCKET_MS
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        # decimal(18,6) -> integer micro-units: exact, and long sums are
        # mergeable + far cheaper inside the windows than decimal.
        F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").alias(
            "micros"
        ),
    )
    data = ev.select(
        "event_type",
        "event_id",
        F.expr(f"ts_ms DIV {bucket_ms}").alias("bucket"),
        (F.col("ts_ms") * 2).alias("sk"),
        "micros",
        F.lit(1).cast("long").alias("one"),
        F.lit(False).alias("is_probe"),
    )
    probes = ev.select(
        "event_type",
        "event_id",
        F.expr(f"(ts_ms - {lookback}) DIV {bucket_ms}").alias("bucket"),
        ((F.col("ts_ms") - lookback) * 2 - 1).alias("sk"),
        F.lit(0).cast("long").alias("micros"),
        F.lit(0).cast("long").alias("one"),
        F.lit(True).alias("is_probe"),
    )
    w_in = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("sk")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = data.unionByName(probes).select(
        "event_type",
        "event_id",
        "bucket",
        "is_probe",
        "micros",
        "one",
        F.sum("micros").over(w_in).alias("pfx_micros"),
        F.sum("one").over(w_in).alias("pfx_n"),
    )
    # Per-bucket totals -> cumulative total of STRICTLY EARLIER buckets.
    # Aggregated from the WINDOW OUTPUT (raw micros/one carried through)
    # rather than a fresh scan: the union subtree's shuffle is then a
    # ReusedExchange instead of two more parquet scans + exchanges. Probe
    # rows weigh zero but make every bucket a probe lands in (gaps /
    # before first event) surface with a correct cumulative row. This
    # table is tiny (types x buckets): the low-parallelism cumulative
    # window runs over aggregates, never rows, and the join back is a
    # broadcast.
    totals = pref.groupBy("event_type", "bucket").agg(
        F.sum("micros").alias("b_micros"), F.sum("one").alias("b_n")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cums = totals.select(
        "event_type",
        "bucket",
        F.coalesce(F.sum("b_micros").over(w_cum), F.lit(0)).alias("cum_micros"),
        F.coalesce(F.sum("b_n").over(w_cum), F.lit(0)).alias("cum_n"),
    )
    with_cum = pref.join(F.broadcast(cums), ["event_type", "bucket"]).select(
        "event_type",
        "event_id",
        "is_probe",
        (F.col("cum_micros") + F.col("pfx_micros")).alias("g_micros"),
        (F.col("cum_n") + F.col("pfx_n")).alias("g_n"),
    )
    # Each event_id contributes exactly two rows (its data row and its
    # probe), so frame = prefix(data) - prefix(probe) is a signed SUM in
    # ONE groupBy shuffle -- a self-join here would recompute the whole
    # window subtree once per join side.
    sign = F.when(F.col("is_probe"), F.lit(-1)).otherwise(F.lit(1))
    return (
        with_cum.groupBy("event_type", "event_id")
        .agg(
            F.sum(sign * F.col("g_n")).alias("n_2d"),
            F.sum(sign * F.col("g_micros")).alias("d_micros"),
        )
        .select(
            "event_type",
            "event_id",
            "n_2d",
            F.expr(
                "ROUND(CAST(CAST(d_micros AS DECIMAL(38,6)) / 1000000"
                " AS DOUBLE), 2)"
            ).alias("sum_2d"),
        )
    )


# 30-minute inactivity gap closes a session (the classic web/telemetry
# sessionization constant). Compared in exact integer microseconds on both
# engines so the boundary case (gap == 30 min exactly) cannot diverge.
_SESSION_GAP_US = 30 * 60 * 1_000_000


def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions at
    >30-min inactivity gaps, then per-session stats (the batch twin of the
    streaming ``s_session_window``; cf. reference minute-bar gap handling,
    stock_harvester.py "daily bars" grouping -- same segment-then-aggregate
    shape).

    Scale shape: ONE shuffle on ``user_id``; both window passes (lag flag,
    running session index) evaluate on that same sorted partition, and the
    final ``groupBy(user_id, session_idx)`` is satisfied by the existing
    hash(user_id) distribution ({user_id} is a subset of the grouping key),
    so Catalyst plans no second exchange -- plan-gated in
    ``tests/test_plans.py::test_sessionize_single_exchange``. user_id is
    high-cardinality at 100 TB, so the partitioning holds; per-task memory
    is one user's history bounded by the sort spill path, and the aggregate
    is map-side partial within the same partitions.

    Determinism: window order is (ts, event_id) -- event_id is unique -- and
    the running sum uses an explicit ROWS frame, so session indices are
    stable across engines; the value sum follows the repo-wide exact-decimal
    discipline."""
    return sessionize(load_table(spark, sf_dir, "events"), _SESSION_GAP_US)


def sessionize(events: DataFrame, gap_us: int) -> DataFrame:
    """Core of ``window_sessionize``; exposed for the boundary unit test
    (a gap of EXACTLY ``gap_us`` stays in-session -- the split is strict
    ``>``, matching the oracle SQL's comparison)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts", 1).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessions = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(is_new).over(run).cast("bigint").alias("session_idx"),
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("bigint")
            .alias("duration_us"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
        # No final orderBy: the driver compare is row-order-insensitive, and
        # a global sort would add a range-partitioning exchange to what is
        # otherwise a single-shuffle plan.
    )


def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill with LOCF: hourly rollup per event type,
    densified to EVERY hour between each type's first and last event, with
    missing hours carried forward from the last observed total (the
    market-closed-bars problem in the reference's OHLCV model --
    stock_harvester.py's minute bars simply lack rows when no trade
    happened, and downstream consumers want a dense series).

    Scale shape: the only corpus-sized work is the hourly pre-aggregate
    (one shuffle, map-side partial); the spine explode, the left join,
    and the LOCF window all run over ROLLUP-sized data (types x hours --
    thousands of rows per decade of data, regardless of corpus size), so
    the low-cardinality window key is harmless here. LOCF copies values
    without arithmetic, so the exact-decimal-then-round totals stay
    bit-identical through the fill."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _hourly_spine(spark, sf_dir).select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.col("n_events").isNull().alias("is_filled"),
        F.last("total", ignorenulls=True).over(w).alias("total_locf"),
    )


def _hourly_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by ``w_gap_fill`` and ``w_interpolate``: the hourly rollup
    left-joined onto the dense per-type hour spine (``total`` NULL on
    missing hours)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type", "value"
    )
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("total"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hr"),
        )
    )
    return spine.join(hourly, ["event_type", "hr"], "left")


def window_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps: missing hours take the straight
    line between the bracketing observed totals (LOCF's smooth sibling --
    the standard choice for resampled sensor/price series).

    Every gap row has both brackets by construction (the spine spans
    [first, last] observed hour per type). Determinism (the repo's
    integer-scaling discipline -- a naive double ROUND diverged by one
    ulp on 4/3568 fixture rows): brackets are recovered as exact integer
    CENTS and times as exact integer HOUR indexes, the interpolation
    numerator is exact long arithmetic, and the single double step is one
    division of exact-representable values plus a floor(x+0.5)
    half-away-from-zero -- identical on both engines. Same rollup-sized
    window input as ``w_gap_fill``."""
    back = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col("hr"))
    obs_t = F.when(F.col("total").isNotNull(), t)
    base = _hourly_spine(spark, sf_dir).select(
        "event_type",
        "hr",
        "total",
        t.alias("t"),
        F.last("total", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(back).alias("pt"),
        F.first("total", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(fwd).alias("nt"),
    )
    # Exact integer interpolation: cents x hour-index numerator, one
    # deterministic double division, floor(x+0.5) half-away-from-zero.
    pc = F.round(F.col("pv") * 100).cast("long")
    nc = F.round(F.col("nv") * 100).cast("long")
    hp = ((F.col("t") - F.col("pt")) / 3600000000).cast("long")
    hn = ((F.col("nt") - F.col("pt")) / 3600000000).cast("long")
    interp = (
        F.floor((pc * hn + (nc - pc) * hp) * 100.0 / hn + 0.5).cast("long")
        / 10000.0
    )
    return base.select(
        "event_type",
        "hr",
        F.col("total").isNull().alias("is_filled"),
        F.when(F.col("total").isNotNull(), F.col("total"))
        .otherwise(interp)
        .alias("total_interp"),
    )


def window_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict every observed hour's
    total with the value from the SAME HOUR ONE WEEK EARLIER (lag 168 on
    the gap-filled dense series), and score per event type with MAE and
    mean signed bias -- the standard baseline every forecasting pipeline
    must beat, and a composition proof that the densify -> lag -> score
    chain stays exactly oracle-checkable.

    Exactness: actual and forecast are integer CENTS; the error sums are
    exact longs; each final mean is one deterministic double division
    with a floor(x+0.5) half-away-from-zero at 4 decimals. Scale: the
    dense series is rollup-sized (types x hours), so everything after
    the hourly pre-aggregate is metadata-scale."""
    w = Window.partitionBy("event_type").orderBy("hr")
    dense = window_gap_fill(spark, sf_dir).select(
        "event_type",
        "hr",
        "is_filled",
        F.round(F.col("total_locf") * 100).cast("long").alias("cents"),
    )
    scored = dense.select(
        "event_type",
        "is_filled",
        (F.col("cents") - F.lag("cents", 168).over(w)).alias("err_cents"),
    ).filter(~F.col("is_filled") & F.col("err_cents").isNotNull())

    def mean4(sum_col: F.Column, n: F.Column, alias: str) -> F.Column:
        # cents -> value with 4 decimals: one double division, floor+0.5.
        return (
            F.floor(sum_col * 100.0 / n + F.lit(0.5)).cast("long") / 10000.0
        ).alias(alias)

    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_eval"),
        mean4(F.sum(F.abs(F.col("err_cents"))), F.count("*"), "mae"),
        mean4(F.sum(F.col("err_cents")), F.count("*"), "bias"),
    )


# Trailing-EWMA weights: alpha-decay 0.9 over the last 20 observations,
# frozen as exact integer MICROS so both engines multiply identical
# longs (0.9**k is computed ONCE here, half-away-from-zero -- never
# pow() at query time, which IEEE does not pin across libm builds).
_EWMA_K = 20
_EWMA_W = [int(0.9**k * 1_000_000 + 0.5) for k in range(_EWMA_K)]
# PRECONDITION for the bit-identical oracle contract: the numerator
# max(|vm|) * sum(_EWMA_W) must stay below 2^53. Below it, num is exact
# in a double, so Spark's `num * 1.0 / den` and DuckDB's decimal-exact
# `num * 1.0` both see the same value; beyond it DuckDB's exact decimal
# path demonstrably diverges from double division (verified: DuckDB
# floor(num*1.0/den+0.5) != Python double for num=1.23e16). The fixture
# domain (|value| < 1000 => |vm| <= 1e9) satisfies it with ~2.5% margin;
# tests/test_properties.py asserts the bound statically and drives the
# brute-force parity up to vm = 1e9.
_EWMA_WSUM = sum(_EWMA_W)
_EWMA_VM_SAFE_MAX = (2**53 - 1) // _EWMA_WSUM  # |vm| bound, ~1.026e9


def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average of ``value`` per
    event type (decay 0.9, window 20) -- the classic financial smoother
    the reference's minute-bar model calls for (reference
    transform_stock_data.py computes plain daily aggregates; EWMA is the
    bar-over-bar extension every quant pipeline adds first).

    Exactness: the value is integer micros, each of the 20 frame terms is
    ``micros x weight-micros`` in pure long arithmetic (weights are
    frozen literals, see ``_EWMA_W``), missing history contributes to
    neither numerator nor denominator, and the result is ONE double
    division + floor(x+0.5) at 6 decimals -- bit-identical on both
    engines.

    Scale shape: 20 ``lag`` terms over ONE window spec = a single
    partitioned WindowExec pass (one shuffle on event_type, no HOF, no
    self-join); the 100 TB variant partitions by (key, time-bucket) with
    19 carry rows per boundary, exactly the ``trailing_mean_rows``
    decomposition above."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    return trailing_ewma(ev, "event_type", ["ts", "event_id"]).select(
        "event_type", "event_id", "ewma"
    )


def trailing_ewma(
    df: DataFrame, part_col: str, order_cols: list[str], vm_col: str = "vm"
) -> DataFrame:
    """Core of ``w_ewma`` (separated so the hypothesis brute-force test
    can drive it on arbitrary inputs): adds an ``ewma`` column -- the
    weight-decayed mean of the last ``_EWMA_K`` rows' integer-micros
    values within the partition. Rows beyond the partition start and NULL
    values contribute to neither numerator nor denominator; a row whose
    whole frame is NULL gets NULL. Positions are ROW positions: a NULL
    value still occupies its lag slot (its weight is skipped, not
    shifted).

    PRECONDITION: ``max(|vm|) <= _EWMA_VM_SAFE_MAX`` (~1.026e9) so the
    long numerator stays below 2^53 -- see the note at ``_EWMA_W``.
    Callers with a wider value domain must rescale vm first.

    Plan shape (measured round 6, 1M rows): the lags are materialized as
    NAMED COLUMNS first and the num/den/ewma arithmetic references those
    attributes. Inlining the num/den trees into the final
    ``when(den > 0, num/den)`` expression re-expands every
    ``lag() over w`` at each textual use -- ExtractWindowExpressions does
    NOT dedup semantically-equal window expressions -- yielding ~60 frame
    processors instead of 19 and 9.1 s instead of 2.1 s (4.4x). Same
    lesson as the HOF/CollapseProject staging rules: anything consumed
    more than once gets a column."""
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    nlag = len(_EWMA_W) - 1
    staged = df.select(
        "*",
        *[F.lag(vm_col, k).over(w).alias(f"__l{k}") for k in range(1, nlag + 1)],
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k, wt in enumerate(_EWMA_W):
        lv = F.col(vm_col) if k == 0 else F.col(f"__l{k}")
        num = num + F.coalesce(lv * F.lit(wt), F.lit(0))
        den = den + F.when(lv.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    ewma = F.when(
        den > 0,
        F.floor(num * 1.0 / den + F.lit(0.5)).cast("long") / 1_000_000.0,
    )
    return staged.withColumn("ewma", ewma).drop(
        *[f"__l{k}" for k in range(1, nlag + 1)]
    )


# MACD weights: truncated-EMA (1-alpha)^k ladders for spans 12/26 and the
# 9-span signal line, frozen as exact integer weights at 1e5 scale (the
# EWMA discipline: computed ONCE here, never pow() at query time). Scale
# 1e5, not 1e6: the slow 25/27 decay summed over 26 terms at 1e6 would
# push the worst-case numerator (|vm| <= 1e9) past 2^53; at 1e5 every
# numerator stays below ~1.2e15 with the same precondition class as
# _EWMA_W (asserted in tests/test_properties.py).
_MACD_K = 26


def _decay_weights(alpha_num: int, alpha_den: int) -> list[int]:
    r = 1.0 - alpha_num / alpha_den
    return [int(r**j * 100_000 + 0.5) for j in range(_MACD_K)]


_MACD_W12 = _decay_weights(2, 13)
_MACD_W26 = _decay_weights(2, 27)
_MACD_W9 = _decay_weights(2, 10)


def _wavg_micros_expr(weights: list[int], cur: F.Column, lag_col) -> F.Column:
    """Frozen-weight trailing average of an integer-micros column, emitted
    in the SAME integer scale: floor(num/den + 0.5) as a long, NULL when
    the whole frame is NULL. ``lag_col(k)`` must return the k-lagged
    attribute (staged ONCE by the caller -- the window-staging rule)."""
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k, wt in enumerate(weights):
        lv = cur if k == 0 else lag_col(k)
        num = num + F.coalesce(lv * F.lit(wt), F.lit(0))
        den = den + F.when(lv.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return F.when(den > 0, F.floor(num * 1.0 / den + F.lit(0.5)).cast("long"))


def window_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD per event type: truncated-EMA(12) minus truncated-EMA(26) of
    integer-micros value, plus the 9-span signal line (a SECOND truncated
    EMA over the derived MACD series) and the histogram -- the momentum
    indicator completing the family beside EWMA/Bollinger/RSI. The
    textbook EMA recursion has infinite memory; the 26-term truncation
    (matching ``trailing_ewma``'s design) captures >98% of each span's
    mass and is exactly frame-expressible.

    Exactness: frozen integer weights (see ``_MACD_W12``), long
    num/den sums, one double division + floor(x+0.5) per EMA, all three
    emitted columns are integer MICROS (``macd_micro`` etc.) so the
    oracle compares exact longs -- no float columns at all.

    Plan shape: vm's 25 lags staged ONCE and shared by both spans (one
    WindowExec), then the signal's 25 lags over the derived macd column
    (second WindowExec, SAME partition+order => one sort+shuffle total).
    Per the staging rule each lag is a named column consumed by
    attribute, never a re-expanded window call.

    Cost shape (measured r7, sf0.1): ~1.4 s fixed plan/compile + ~3 s
    data cost -- the Window-heavy plan runs interpreted (no
    WholeStageCodegen around WindowExec), and MACD is ~EWMA x 3 weight
    ladders x 2 passes, consistent with w_ewma's per-row cost. Past
    ~1M rows/key the 100 TB path is the same hybrid rule as
    ``trailing_mean_rows``: scatter-to-frames, or an Arrow
    ``applyInPandas`` numpy convolution per key-bucket (one vectorized
    O(n*k) pass) -- the frame decomposition carries 25 boundary rows
    exactly like the EWMA case."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    return macd_catalyst(ev)


def macd_catalyst(ev: DataFrame) -> DataFrame:
    """Core of ``w_macd`` over an (event_type, event_id, ts, vm) relation
    -- separated so the hypothesis test can drive it on arbitrary inputs
    against the Arrow variant below."""
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nlag = _MACD_K - 1
    staged1 = ev.select(
        "*",
        *[F.lag("vm", k).over(wo).alias(f"__v{k}") for k in range(1, nlag + 1)],
    )
    vlag = lambda k: F.col(f"__v{k}")  # noqa: E731
    m = staged1.select(
        "event_type",
        "event_id",
        "ts",
        (
            _wavg_micros_expr(_MACD_W12, F.col("vm"), vlag)
            - _wavg_micros_expr(_MACD_W26, F.col("vm"), vlag)
        ).alias("macd_micro"),
    )
    staged2 = m.select(
        "*",
        *[
            F.lag("macd_micro", k).over(wo).alias(f"__m{k}")
            for k in range(1, nlag + 1)
        ],
    )
    mlag = lambda k: F.col(f"__m{k}")  # noqa: E731
    out = staged2.select(
        "event_type",
        "event_id",
        "macd_micro",
        _wavg_micros_expr(_MACD_W9, F.col("macd_micro"), mlag).alias(
            "signal_micro"
        ),
    )
    return out.select(
        "event_type",
        "event_id",
        "macd_micro",
        "signal_micro",
        (F.col("macd_micro") - F.col("signal_micro")).alias("hist_micro"),
    )


def window_macd_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``w_macd``'s vectorized PHYSICAL variant: the same truncated-EMA
    12/26 + signal-9 semantics computed as exact int64 numpy
    convolutions inside an Arrow ``applyInPandas`` grouped map — the
    scale path ``window_macd``'s docstring names for >1M rows/key, here
    as a first-class key proving the two strategies are bit-identical
    (it shares ``w_macd``'s oracle verbatim).

    Why this is the 100 TB shape: the Catalyst form pays ~50 interpreted
    lag frame processors per row; here each group is ONE
    ``np.convolve`` per weight ladder — a C-speed O(n*k) pass over
    Arrow-transferred int64 arrays. Exactness: values, masks, and
    weights are all int64, so every numerator/denominator is an exact
    integer convolution (NULL slots contribute to neither, exactly the
    frame semantics); the only float steps are the same
    ``floor(num/den + 0.5)`` doubles as the expression form. Grouping is
    by event_type at fixture scale; past memory-bound groups the
    decomposition is the ``trailing_mean_rows`` scatter (25 carry rows
    per bucket boundary). Property-tested against ``window_macd`` on
    random NULL-bearing inputs (tests/test_properties.py)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    return macd_arrow(ev)


def macd_arrow(ev: DataFrame) -> DataFrame:
    """Core of ``w_macd_arrow`` (same (event_type, event_id, ts, vm)
    input contract as ``macd_catalyst``)."""
    import pandas as pd

    def _trailing(vals: "np.ndarray", mask: "np.ndarray", w: "np.ndarray"):
        # Exact int64 convolution numerator/denominator; the float steps
        # are the SAME floor(num/den + 0.5) doubles as the Catalyst form.
        import numpy as np

        n = len(vals)
        num = np.convolve(vals * mask, w)[:n]
        den = np.convolve(mask, w)[:n]
        ok = den > 0
        out = np.zeros(n, dtype="int64")
        out[ok] = np.floor(
            num[ok] * 1.0 / den[ok] + 0.5
        ).astype("int64")
        return out, ok

    def macd_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        mask = (~pdf["vm"].isna()).to_numpy().astype("int64")
        vals = pdf["vm"].fillna(0).to_numpy(dtype="int64")
        e12, _ = _trailing(vals, mask, np.array(_MACD_W12, dtype="int64"))
        e26, ok_m = _trailing(vals, mask, np.array(_MACD_W26, dtype="int64"))
        macd = np.where(ok_m, e12 - e26, 0)
        sig, ok_s = _trailing(
            macd, ok_m.astype("int64"), np.array(_MACD_W9, dtype="int64")
        )

        def ia(v: "np.ndarray", ok: "np.ndarray"):
            return pd.arrays.IntegerArray(v.astype("int64"), mask=~ok)

        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "event_id": pdf["event_id"],
                "macd_micro": ia(macd, ok_m),
                "signal_micro": ia(sig, ok_s),
                "hist_micro": ia(macd - sig, ok_m & ok_s),
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        macd_group,
        schema="event_type string, event_id long, "
        "macd_micro long, signal_micro long, hist_micro long",
    )


def window_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: trailing-20 mean +- 2 standard deviations of
    ``value`` per event type -- with EWMA/drawdown, the third classic
    bar-series indicator of the reference's stock domain (reference
    transform_stock_data.py stops at daily aggregates; bands are the
    volatility envelope every charting stack layers on top).

    Exactness: value is centi-units (``round(value*100)`` -> long), the
    frame's count/sum/sum-of-squares are plain integer window sums --
    order-insensitive, so sliding-frame evaluation (Spark's rolling
    frame, DuckDB's segment tree) cannot drift -- and the variance
    numerator ``n*q - s^2`` is exact long arithmetic. The only inexact
    steps are one IEEE sqrt (correctly rounded, engine-independent) and
    two double divisions, identical on both engines. Domain bound:
    ``n*q <= 20 * (20*vc_max^2)`` and ``s^2 <= (20*vc_max)^2`` both stay
    under 2^53 iff |value| <= ~4.7e4 (vc_max = 4.7e6 centi-units);
    asserted statically in tests/test_properties.py with the fixture max
    (490) at ~1% of the bound. Beyond it the variance numerator needs
    the micros->decimal ladder instead.

    Scale shape: one WindowExec over one shuffle on event_type; the
    three frame aggregates share the frame. Low-cardinality keys follow
    the ``trailing_mean_rows`` hybrid rule (plain window to ~8M
    rows/key, scatter-to-frames past it)."""
    w20 = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    staged = base.select(
        "event_type",
        "event_id",
        F.count("vc").over(w20).alias("n"),
        F.sum("vc").over(w20).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(w20).alias("q"),
    )
    # Emit via floor(x*1e6 + 0.5)/1e6, NOT round(x, 6): Spark's round
    # (BigDecimal HALF_UP on the exact binary value) and DuckDB's
    # (scale-multiply then nearbyint) disagree on last-ulp boundary
    # doubles; the floor form is the same IEEE expression on both
    # engines so it cannot diverge (repo-wide rounding rule).
    ma = F.col("s") / (F.col("n") * 100.0)
    std = F.sqrt(F.col("n") * F.col("q") - F.col("s") * F.col("s")) / (
        F.col("n") * 100.0
    )

    def emit6(x: F.Column, alias: str) -> F.Column:
        return (
            F.when(
                F.col("n") > 0,
                F.floor(x * 1000000.0 + F.lit(0.5)).cast("long") / 1000000.0,
            )
        ).alias(alias)

    return staged.select(
        "event_type",
        "event_id",
        emit6(ma, "ma20"),
        emit6(ma + 2.0 * std, "upper"),
        emit6(ma - 2.0 * std, "lower"),
    )


def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI-14 (simple-moving-average gains/losses) per event
    type. Wilder's original smoothing is RECURSIVE (infinite memory, not
    expressible as a fixed frame); Cutler's published SMA variant is the
    standard non-recursive form and is exactly window-expressible:
    rsi = 100 * sum(gains) / (sum(gains) + sum(losses)) over the last 14
    one-step differences -- algebraically identical to 100 - 100/(1+RS)
    for SMA-based RS but with a SINGLE double division.

    Exactness: diffs/gains/losses are integer micros; the frame sums are
    order-insensitive long window sums; ``100*sg`` stays exact (sg <= 14
    diffs x 2e9 micros = 2.8e10, so 100*sg <= 2.8e12 << 2^53 at the
    fixture bound); one double division + the repo's floor(x*1e4+0.5) emit. A row with no
    prior movement in frame (sg+sl = 0, including the partition's first
    row) is NULL -- RSI is undefined on a flat window.

    Plan: the lag layer and the frame-sum layer share partition+order,
    so Spark plans two Window nodes over ONE sort+shuffle."""
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w14 = wo.rowsBetween(-13, 0)
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    diffs = base.select(
        "event_type",
        "event_id",
        "ts",
        (F.col("vm") - F.lag("vm", 1).over(wo)).alias("d"),
    )
    gl = diffs.select(
        "event_type",
        "event_id",
        "ts",
        F.when(F.col("d") > 0, F.col("d")).otherwise(F.lit(0)).alias("g"),
        F.when(F.col("d") < 0, -F.col("d")).otherwise(F.lit(0)).alias("l"),
    )
    sums = gl.select(
        "event_type",
        "event_id",
        F.sum("g").over(w14).alias("sg"),
        F.sum("l").over(w14).alias("sl"),
    )
    rs = (F.lit(100) * F.col("sg")) * 1.0 / (F.col("sg") + F.col("sl"))
    return sums.select(
        "event_type",
        "event_id",
        F.when(
            F.col("sg") + F.col("sl") > 0,
            F.floor(rs * 10000.0 + F.lit(0.5)).cast("long") / 10000.0,
        ).alias("rsi14"),
    )


def window_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K over the trailing 14 rows per event type:
    100 * (value - min14) / (max14 - min14). Min/max over a sliding frame
    are order-insensitive (no accumulation at all), so the only inexact
    step is one double division; integer micros everywhere else. A flat
    frame (max = min) is NULL -- %K is undefined without a range."""
    w14 = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-13, 0)
    )
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    staged = base.select(
        "event_type",
        "event_id",
        "vm",
        F.min("vm").over(w14).alias("lo"),
        F.max("vm").over(w14).alias("hi"),
    )
    k = (
        (F.lit(100) * (F.col("vm") - F.col("lo")))
        * 1.0
        / (F.col("hi") - F.col("lo"))
    )
    return staged.select(
        "event_type",
        "event_id",
        F.when(
            F.col("hi") > F.col("lo"),
            F.floor(k * 10000.0 + F.lit(0.5)).cast("long") / 10000.0,
        ).alias("pct_k"),
    )


def window_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running VWAP (volume-weighted average price) per supplier over the
    lineitem ship stream: cumulative sum(price*qty)/sum(qty) ordered by
    ship date -- the execution-quality benchmark every trading pipeline
    computes; lineitem is the fixture's (price, quantity, time) stream.

    Exactness: price -> exact integer cents via the established
    DECIMAL(18,2) conversion, quantity -> exact integer (fixture values
    are whole numbers; ROUND guards the double representation), both
    running sums are order-insensitive long window sums, and the emit is
    ONE double division + the floor(x*1e6+0.5) emit. Precision bound: the per-key
    cumulative cents*qty sum must stay below 2^53 -- ~1.8e15, or ~3.4M
    max-priced lineitems per supplier; TPC-H keeps per-supplier rows
    ~600 at every SF (suppliers scale with the corpus), so the bound
    holds at any scale factor.

    Scale shape: one shuffle on l_suppkey, one WindowExec, two shared
    running sums; supplier cardinality grows with data size so
    partitions stay bounded (the per-instrument partitioning a market
    feed has natively)."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("pc"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qn"),
    )
    staged = base.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("pc") * F.col("qn")).over(w).alias("pv"),
        F.sum("qn").over(w).alias("qv"),
    )
    vw = F.col("pv") * 1.0 / (F.col("qv") * 100)
    return staged.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("qv") > 0,
            F.floor(vw * 1000000.0 + F.lit(0.5)).cast("long") / 1000000.0,
        ).alias("vwap"),
    )


def _bar_ord_key():
    """Zero-padded (micros, event_id) close-selection tie-break key --
    ONE definition shared by _daily_ohlc_bars and _daily_close_bars
    (mirrored by the lpad(...)||lpad(...) expression in _OHLC_CTE /
    _CLOSE_BARS_CTE), so the bar families cannot drift apart."""
    return F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )


def _daily_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (high, low, close) per event-type series in exact integer
    micros: max/min commute with the monotone micros conversion, and
    the close is the a9-style max_by over the zero-padded (micros,
    event_id) key. ONE definition shared by ``window_atr`` and
    ``window_donchian``, mirrored verbatim by ``_OHLC_CTE``. One scan,
    one hash-agg shuffle with map-side partials."""
    ord_key = _bar_ord_key()
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.max("vm").alias("hm"),
            F.min("vm").alias("lm"),
            F.max_by("vm", F.col("ord")).alias("cm"),
        )
    )


def window_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATR-14 (average true range) over daily OHLC bars -- the composite
    the reference's bar model exists for: resample ticks to (type, day)
    OHLC exactly like ``a9_ohlc_resample`` (same deterministic
    min_by/max_by ordering key), then TR = greatest(high-low,
    |high-prev_close|, |low-prev_close|) and ATR = trailing-14 simple
    average (Cutler form, like ``w_rsi`` -- Wilder's recursion is not
    frame-expressible). First bar of a series has no prev close: TR
    degrades to high-low, the standard convention.

    Exactness: bars are integer micros (round is monotone, so max/min
    commute with the conversion), TR is pure long min/max/abs
    arithmetic, the ATR numerator/denominator are order-insensitive long
    frame sums, and both emitted columns are integer micros -- the
    oracle compares exact longs, no float columns. ``prev_close`` is
    staged once (the window-staging rule; the TR expression consumes it
    three times).

    Scale shape: one hash-agg shuffle to bars (map-side partial), then
    ONE sort/shuffle on event_type for the lag + frame-sum layers; bar
    count is |types| x |days| -- thousands of rows per instrument-year,
    so the window side is never data-scale."""
    bars = _daily_ohlc_bars(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("day")
    w14 = wo.rowsBetween(-13, 0)
    staged = bars.select(
        "event_type", "day", "hm", "lm", F.lag("cm", 1).over(wo).alias("pc")
    )
    tr = F.when(F.col("pc").isNull(), F.col("hm") - F.col("lm")).otherwise(
        F.greatest(
            F.col("hm") - F.col("lm"),
            F.abs(F.col("hm") - F.col("pc")),
            F.abs(F.col("lm") - F.col("pc")),
        )
    )
    trs = staged.select("event_type", "day", tr.alias("tr_micro"))
    return trs.select(
        "event_type",
        "day",
        "tr_micro",
        F.floor(
            F.sum("tr_micro").over(w14)
            * 1.0
            / F.count("tr_micro").over(w14)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("atr_micro"),
    )


def window_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume per supplier over the lineitem ship stream: the
    running sum of signed quantity, where the sign is the direction of
    the price change versus the previous fill (up -> +qty, down -> -qty,
    flat or first fill -> 0) -- Granville's classic volume-flow
    indicator, the standard companion to VWAP in an execution pipeline
    (the reference's bar model carries volume per bar,
    stock_harvester.py:51-61, exactly so consumers can derive flows like
    this).

    Exactness: price -> exact integer cents (the established
    DECIMAL(18,2) conversion), quantity -> exact integer, the direction
    is pure integer comparison, and OBV is an order-insensitive long
    running sum -- every emitted column is an exact BIGINT, no float
    anywhere. Overflow is impossible: |OBV| <= sum(qty) per supplier
    (~600 rows x qty<=50 at any TPC-H SF).

    Scale shape: ONE sort/shuffle on l_suppkey feeds both window layers
    (the lag stage and the running sum reuse the same sort order, the
    w_macd pattern); supplier cardinality grows with the corpus so
    partitions stay bounded -- the per-instrument partitioning a market
    feed has natively."""
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("pc"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qn"),
    )
    return obv_core(
        base, "l_suppkey", ["l_shipdate", "l_orderkey", "l_linenumber"]
    ).select("l_suppkey", "l_orderkey", "l_linenumber", "obv")


def obv_core(fills: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """OBV over any fill stream: ``fills`` carries ``key``, the
    deterministic ``order_cols``, ``pc`` (price, exact long units) and
    ``qn`` (quantity, long). Appends ``obv``. Two window layers (the
    price-change lag must be staged before the running sum -- nested
    window functions are not expressible in one layer) over ONE
    sort/shuffle: both specs share the same partitioning and ordering,
    so the second WindowExec reuses the first's sort."""
    wo = Window.partitionBy(key).orderBy(*order_cols)
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = fills.select(
        key,
        *order_cols,
        "qn",
        (F.col("pc") - F.lag("pc", 1).over(wo)).alias("d"),
    )
    flows = staged.select(
        key,
        *order_cols,
        F.when(F.col("d").isNull() | (F.col("d") == 0), F.lit(0).cast("long"))
        .when(F.col("d") > 0, F.col("qn"))
        .otherwise(-F.col("qn"))
        .alias("flow"),
    )
    return flows.select(
        key, *order_cols, F.sum("flow").over(wc).alias("obv")
    )


def window_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of daily close-to-close returns
    between every pair of event-type series -- the cross-sectional
    correlation matrix a stock engine computes for portfolio risk, and a
    plan shape nothing else in the registry has: align two series on
    their shared time axis via an equi-self-join, then reduce each pair
    to co-moments.

    Exactness: daily closes are exact integer cents selected by the
    a9-style deterministic ``max_by`` ordering key; returns are cent
    differences (exact longs); the six co-moments (n, Sx, Sy, Sxy, Sxx,
    Syy) are order-insensitive integer sums; and the Pearson numerator
    n*Sxy - Sx*Sy and the two variance radicands are computed in exact
    long arithmetic. The only inexact steps -- one long->double
    conversion per term, two IEEE sqrts, one division, the
    floor(x*1e6+0.5) emit -- are correctly-rounded operations written
    textually identically on both engines. Precision bound
    (static-asserted in tests): |value| <= 2,000 (close cents <= 2e5,
    |return| <= 4e5) and <= 4,000 aligned days keep n*Sxy <= 2.6e18 <
    2^63; the fixture is |value| < ~600 over 30 days.

    Scale shape: the naive form is a self-join of the return series on
    day -- but a DataFrame self-join re-computes the whole
    scan->bars->returns subtree on both sides (verified in the physical
    plan: two parquet scans), which doubles the raw-stream read at
    100 TB. Instead the returns are computed ONCE, grouped per day into
    a bounded |types|-entry array, and the pairs are generated by a
    double explode with the a<b filter -- structurally one scan, no
    reliance on adaptive exchange reuse. The per-day array is |types|
    entries and the pair stream is O(|types|^2) rows per day flowing
    straight into a map-side partial aggregation on (type_a, type_b) --
    that quadratic IS the correlation matrix's own output size. Two
    shuffles to bars+returns, one day-keyed regroup, one pair-keyed
    agg."""
    return corr_from_returns(_daily_returns(spark, sf_dir))


def _daily_close_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic daily close per event-type series in exact integer
    cents: a9-style close selection (max_by over the zero-padded
    (micros, event_id) key). ONE definition shared by ``_daily_returns``
    (hence the whole cross-sectional family) and ``window_roc``,
    mirrored verbatim by ``_CLOSE_BARS_CTE``. One scan, one hash-agg
    shuffle with map-side partials."""
    ord_key = _bar_ord_key()
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cc"),
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "day")
        .agg(F.max_by("cc", F.col("ord")).alias("cc"))
    )


def _daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily close-to-close returns per event-type series, in exact
    integer cents: the shared close bars, then a lag difference per
    series. One scan, two shuffles (bar agg, series window). Shared by
    the cross-sectional family (w_corr_matrix / w_xsec_zscore /
    w_beta / w_sharpe) and mirrored verbatim by each key's oracle
    CTEs."""
    bars = _daily_close_bars(spark, sf_dir)
    wo = Window.partitionBy("event_type").orderBy("day")
    return bars.select(
        "event_type",
        "day",
        (F.col("cc") - F.lag("cc", 1).over(wo)).alias("rc"),
    ).where(F.col("rc").isNotNull())


def corr_from_returns(rets: DataFrame) -> DataFrame:
    """Pairwise Pearson over aligned return series: ``rets`` carries
    (event_type, day, rc) with rc an exact long and at most one row per
    (event_type, day). Emits (type_a, type_b, n_days, corr_ret) for every
    unordered pair, correlating only the days BOTH series cover. See
    window_corr_matrix for the exactness and scale notes."""
    day_rows = rets.groupBy("day").agg(
        F.collect_list(F.struct("event_type", "rc")).alias("xs")
    )
    pairs = (
        day_rows.select("day", "xs", F.explode("xs").alias("a"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("a.rc").alias("ra"),
            F.explode("xs").alias("b"),
        )
        .where(F.col("type_a") < F.col("b.event_type"))
        .select(
            "type_a",
            F.col("b.event_type").alias("type_b"),
            "ra",
            F.col("b.rc").alias("rb"),
        )
    )
    stats = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("ra").alias("sx"),
        F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
    )
    staged = stats.select(
        "type_a",
        "type_b",
        "n_days",
        (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "num"
        ),
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "dx"
        ),
        (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).alias(
            "dy"
        ),
    )
    corr = F.col("num").cast("double") / (
        F.sqrt(F.col("dx").cast("double")) * F.sqrt(F.col("dy").cast("double"))
    )
    return staged.select(
        "type_a",
        "type_b",
        "n_days",
        F.when(
            (F.col("dx") > 0) & (F.col("dy") > 0),
            F.floor(corr * 1000000.0 + F.lit(0.5)).cast("long") / 1000000.0,
        ).alias("corr_ret"),
    )


def window_xsec_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional z-score: each series' daily return standardized
    against THAT DAY's cross-section of all series -- the factor-model
    neutralization every quant pipeline applies before ranking signals,
    and the registry's only window family partitioned by TIME rather
    than by series (the day is the peer group; the instrument is the
    observation).

    Exactness: returns are exact cents (shared ``_daily_returns``); the
    per-day count/sum/sum-of-squares are order-insensitive long window
    sums over the unordered day partition; the z numerator n*rc - s and
    the variance radicand n*q - s*s are exact long arithmetic (the
    Bollinger n*q - s^2 form, cross-sectionally); and the emit is one
    long->double cast each, one IEEE sqrt, one division, the
    floor(x*1e6+0.5) form -- identical text both engines. Degenerate
    days (single series, or all returns equal) emit NULL. Domain bound
    (static-asserted): <= 5,000 series per day at |value| <= 2,000 keeps
    n*q under 2^63; the fixture is 5 series.

    Scale shape: one scan; bars + series-lag as in ``_daily_returns``;
    then ONE extra hash shuffle on day whose partitions hold at most
    |series| rows each -- day cardinality grows with history so the
    shuffle fans out, and no partition ever exceeds the universe size."""
    return zscore_from_returns(_daily_returns(spark, sf_dir))


def zscore_from_returns(rets: DataFrame) -> DataFrame:
    """Cross-sectional z-score over any (event_type, day, rc) panel with
    exact-long rc; see window_xsec_zscore for the contract."""
    wd = Window.partitionBy("day")
    staged = rets.select(
        "event_type",
        "day",
        "rc",
        F.count("rc").over(wd).alias("n"),
        F.sum("rc").over(wd).alias("s"),
        F.sum(F.col("rc") * F.col("rc")).over(wd).alias("q"),
    )
    num = F.col("n") * F.col("rc") - F.col("s")
    den2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    z = num.cast("double") / F.sqrt(den2.cast("double"))
    return staged.select(
        "event_type",
        "day",
        "rc",
        F.when(
            den2 > 0,
            F.floor(z * 1000000.0 + F.lit(0.5)).cast("long") / 1000000.0,
        ).alias("zscore"),
    )


def window_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series market beta and alpha: OLS regression of each series'
    daily return against the cross-sectional mean-return index (the
    equal-weight "market" -- each day's mean return across all series,
    floored to whole cents so the index itself is an exact long). The
    CAPM decomposition a portfolio pipeline runs nightly; the index is
    derived from the SAME single scan via a day-partitioned window, not
    a plan-doubling self-join against a designated benchmark series.

    Exactness: the only non-integer step building the index is
    floor(s/n) on two exact longs cast to double -- IEEE division and
    floor, identical both engines; after that x (index, cents) and y
    (series return, cents) feed exact long co-moments, and beta's
    numerator/denominator are exact long arithmetic cast once to
    double. alpha = (Sy - beta*Sx)/n is staged on the named beta column
    so both engines evaluate the same expression tree. Domain bound
    (static-asserted): |value| <= 2,000 and <= 4,000 days keep every
    product under 2^63.

    Scale shape: one scan; bars + series-lag; one day-keyed window
    shuffle (bounded partitions, as w_xsec_zscore); one final
    series-keyed aggregation with map-side partials."""
    return beta_from_returns(_daily_returns(spark, sf_dir))


def beta_from_returns(rets: DataFrame) -> DataFrame:
    """Beta/alpha vs the per-day mean-cents index over any
    (event_type, day, rc) panel; see window_beta for the contract."""
    wd = Window.partitionBy("day")
    with_index = rets.select(
        "event_type",
        "day",
        "rc",
        F.floor(
            F.sum("rc").over(wd).cast("double")
            / F.count("rc").over(wd).cast("double")
        )
        .cast("long")
        .alias("x"),
    )
    stats = with_index.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("rc").alias("sy"),
        F.sum(F.col("x") * F.col("rc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    staged = stats.select(
        "event_type",
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dx"),
    )
    with_beta = staged.select(
        "event_type",
        "n",
        "sx",
        "sy",
        F.when(
            F.col("dx") > 0, F.col("num").cast("double") / F.col("dx").cast("double")
        ).alias("beta"),
    )
    alpha = (
        F.col("sy").cast("double") - F.col("beta") * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return with_beta.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.when(
            F.col("beta").isNotNull(),
            F.floor(F.col("beta") * 1000000.0 + F.lit(0.5)).cast("long")
            / 1000000.0,
        ).alias("beta"),
        F.when(
            F.col("beta").isNotNull(),
            F.floor(alpha * 1000000.0 + F.lit(0.5)).cast("long") / 1000000.0,
        ).alias("alpha_cents"),
    )


def window_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratio per event-type series over
    daily close-to-close returns (shared ``_daily_returns``) -- the
    risk-adjusted performance summary a stock pipeline computes from
    exactly the bar series the reference materializes
    (stock_harvester.py:51-61). Sharpe = mean/sample-stddev * sqrt(252);
    Sortino replaces the denominator with downside deviation around a
    zero MAR (sqrt of mean squared negative return), the standard form.

    Exactness: the per-series moments (n, sum, sum-of-squares, downside
    sum-of-squares) are order-insensitive exact long sums; the variance
    numerator n*q - s^2 and the scale n*(n-1) are exact longs. The only
    inexact steps -- long->double casts, two IEEE sqrts, divisions, the
    sqrt(252.0) constant, and the floor(x*1e6 + 0.5) emit -- are
    correctly-rounded operations written textually identically on both
    engines, so the comparison is exact. Domain bound (static-asserted
    in tests, same budget as w_corr_matrix): |rc| <= 4e5 cents over
    n <= 4,000 days keeps n*q < 2.6e18 < 2^63.

    Scale shape: one scan, the two bar/window shuffles of
    ``_daily_returns``, then ONE map-side-partial hash-agg to |types|
    rows -- nothing downstream of the raw stream is data-scale."""
    return sharpe_from_returns(_daily_returns(spark, sf_dir))


def sharpe_from_returns(rets: DataFrame) -> DataFrame:
    """Per-series Sharpe/Sortino over an exact-long return panel
    (event_type, day, rc); see window_sharpe for the contract."""
    stats = rets.groupBy("event_type").agg(
        F.count("rc").cast("long").alias("n_days"),
        F.sum("rc").alias("sx"),
        F.sum(F.col("rc") * F.col("rc")).alias("q"),
        F.sum(
            F.when(F.col("rc") < 0, F.col("rc") * F.col("rc")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("dq"),
    )
    staged = stats.select(
        "event_type",
        "n_days",
        F.col("sx").alias("sum_ret_cents"),
        "q",
        "dq",
        (F.col("n_days") * F.col("q") - F.col("sx") * F.col("sx")).alias(
            "var_num"
        ),
    )
    mean = F.col("sum_ret_cents").cast("double") / F.col("n_days").cast(
        "double"
    )
    sd = F.sqrt(
        F.col("var_num").cast("double")
        / (F.col("n_days") * (F.col("n_days") - 1)).cast("double")
    )
    dd = F.sqrt(F.col("dq").cast("double") / F.col("n_days").cast("double"))
    ann = F.sqrt(F.lit(252.0))
    return staged.select(
        "event_type",
        "n_days",
        "sum_ret_cents",
        F.when(
            (F.col("n_days") > 1) & (F.col("var_num") > 0),
            F.floor(mean / sd * ann * 1000000.0 + F.lit(0.5)).cast("long")
            / 1000000.0,
        ).alias("sharpe_ann"),
        F.when(
            F.col("dq") > 0,
            F.floor(mean / dd * ann * 1000000.0 + F.lit(0.5)).cast("long")
            / 1000000.0,
        ).alias("sortino_ann"),
    )


def window_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-day momentum and rate-of-change per event-type series over the
    shared daily close bars (``_daily_close_bars``): mom = close -
    close_5_bars_ago in exact cents, roc = mom / close_5_bars_ago --
    the classic ROC oscillator, the simplest member of the indicator
    family (w_rsi / w_macd measure the same displacement smoothed).

    Exactness: closes and the momentum difference are exact longs; the
    ROC emit is one long->double division and the floor(x*1e6 + 0.5)
    form, written identically on both engines (the prior close is
    nonzero-guarded on both sides; the fixture's value domain is
    strictly positive). Rows without a 5-back predecessor are dropped,
    like ``_daily_returns`` drops the first bar.

    Scale shape: identical to ``_daily_returns`` -- one scan, one bar
    hash-agg shuffle, ONE series sort/shuffle for the lag."""
    return roc_from_bars(_daily_close_bars(spark, sf_dir))


def roc_from_bars(bars: DataFrame, k: int = 5) -> DataFrame:
    """k-bar momentum/ROC over an exact-cents close-bar panel
    (event_type, day, cc); see window_roc for the contract."""
    wo = Window.partitionBy("event_type").orderBy("day")
    staged = bars.select(
        "event_type", "day", "cc", F.lag("cc", k).over(wo).alias("pc")
    ).where(F.col("pc").isNotNull())
    return staged.select(
        "event_type",
        "day",
        F.col("cc").alias("close_cents"),
        (F.col("cc") - F.col("pc")).alias("mom_cents"),
        F.when(
            F.col("pc") != 0,
            F.floor(
                (F.col("cc") - F.col("pc")).cast("double")
                / F.col("pc").cast("double")
                * 1000000.0
                + F.lit(0.5)
            ).cast("long")
            / 1000000.0,
        ).alias("roc"),
    )


def window_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian-20 channel with breakout signal over the shared daily
    OHLC bars (``_daily_ohlc_bars``): upper = max(high) and lower =
    min(low) over the PRIOR 20 bars (20 preceding .. 1 preceding --
    excluding the current bar, so a breakout compares today's close
    against yesterday's channel, the turtle-trading convention), and
    breakout = +1 / -1 / 0 for close above the upper band, below the
    lower band, or inside. The first bar of each series has an empty
    prior frame -> NULL channel, signal 0.

    Exactness: every column is exact integer micros or an integer
    signal -- sliding max/min over longs and pure integer comparisons,
    no float arithmetic anywhere; the oracle compares exact values.

    Scale shape: one bar hash-agg shuffle, then ONE sort/shuffle on
    event_type feeds both frame extrema (same window spec, one
    WindowExec); bar count is |types| x |days|, never data-scale."""
    bars = _daily_ohlc_bars(spark, sf_dir)
    return donchian_core(bars)


def donchian_core(bars: DataFrame) -> DataFrame:
    """Donchian-20 over an exact-micros OHLC panel (event_type, day,
    hm, lm, cm); see window_donchian for the contract."""
    wp = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-20, -1)
    )
    staged = bars.select(
        "event_type",
        "day",
        F.col("cm").alias("close_micro"),
        F.max("hm").over(wp).alias("upper_micro"),
        F.min("lm").over(wp).alias("lower_micro"),
    )
    breakout = (
        F.when(F.col("upper_micro").isNull(), F.lit(0))
        .when(F.col("close_micro") > F.col("upper_micro"), F.lit(1))
        .when(F.col("close_micro") < F.col("lower_micro"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return staged.select(
        "event_type",
        "day",
        "close_micro",
        "upper_micro",
        "lower_micro",
        breakout.cast("int").alias("breakout"),
    )


def _tick_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick stream in exact integer micros -- the (event_type, event_id,
    ts, vm) contract shared by BOTH rolling-median physical strategies
    (ONE definition, mirrored by _ROLLING_MEDIAN_ORACLE's base CTE, so
    the twins cannot diverge from each other or the oracle)."""
    return load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-15 rolling median of the tick value per event-type
    series -- the robust-center companion to w_moving_avg (a sliding
    mean is skew-sensitive; a median filter is the standard despike for
    market data). No window-frame median exists as a built-in on either
    engine, so the frame is materialized explicitly: collect the 15-row
    frame into an array, sort it, and emit the two middle elements'
    SUM -- ``med_x2_micro`` = lower-middle + upper-middle (equal for odd
    frames), i.e. twice the median, kept as an exact BIGINT so the
    comparison never divides.

    Exactness: values are exact integer micros; array sort and middle
    selection are integer operations; both engines compute 1-based
    integer indices (n+1) div 2 and n div 2 + 1 over the same sorted
    long array. No float anywhere.

    Scale shape: one scan, ONE sort/shuffle on event_type; the per-row
    state is a bounded 15-long array (120 bytes), so memory is O(frame)
    per row regardless of partition size -- the explicit-frame cost is
    bounded by construction, unlike a naive collect-whole-partition."""
    return rolling_median_core(_tick_micros(spark, sf_dir))


def rolling_median_core(base: DataFrame) -> DataFrame:
    """Trailing-15 exact median-x2 over (event_type, event_id, ts, vm)
    tick rows; see window_rolling_median for the contract."""
    w15 = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    framed = base.select(
        "event_type",
        "event_id",
        F.sort_array(F.collect_list("vm").over(w15)).alias("l"),
        F.count("vm").over(w15).cast("long").alias("n_win"),
    )
    return framed.select(
        "event_type",
        "event_id",
        "n_win",
        F.expr(
            "element_at(l, CAST((n_win + 1) DIV 2 AS INT))"
            " + element_at(l, CAST(n_win DIV 2 + 1 AS INT))"
        ).alias("med_x2_micro"),
    )


def window_rolling_median_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``w_rolling_median``'s vectorized PHYSICAL variant: the same
    trailing-15 exact median-x2 computed as one batched numpy
    sliding-window sort inside an Arrow ``applyInPandas`` grouped map --
    the w_macd_arrow pattern (one SQL truth, two execution strategies;
    it shares ``w_rolling_median``'s oracle VERBATIM).

    Why this is the 100 TB shape: the Catalyst form re-materializes and
    re-sorts a 15-element array object per row in interpreted window
    code (collect_list + sort_array are CodegenFallback); here each
    group is ONE ``sliding_window_view`` + one C-speed row-wise
    ``np.sort`` over Arrow-transferred int64 arrays -- no per-row object
    churn. Exactness: values are exact int64 micros; missing leading
    slots are filled with an int64-max sentinel that sorts after every
    real value, so the first n_win sorted slots are exactly the frame,
    and the two-middle SUM is the same integer arithmetic as the
    Catalyst form (bit-identity hypothesis-tested on random
    thin-partition inputs). Input contract: non-null vm (events.value
    is non-null; both strategies share the same degenerate all-null
    frame edge otherwise). Grouping is by event_type at fixture scale;
    past memory-bound groups the decomposition is the
    ``trailing_mean_rows`` scatter (14 carry rows per bucket)."""
    return rolling_median_arrow(_tick_micros(spark, sf_dir))


def rolling_median_arrow(base: DataFrame) -> DataFrame:
    """Core of ``window_rolling_median_arrow`` (same (event_type,
    event_id, ts, vm) input contract as ``rolling_median_core``, vm
    non-null)."""
    import pandas as pd

    def med_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        vals = pdf["vm"].to_numpy(dtype="int64")
        n = len(vals)
        sent = np.iinfo(np.int64).max
        padded = np.concatenate(
            [np.full(14, sent, dtype="int64"), vals]
        )
        win = np.sort(
            np.lib.stride_tricks.sliding_window_view(padded, 15), axis=1
        )
        n_win = np.minimum(np.arange(n, dtype="int64") + 1, 15)
        rows = np.arange(n)
        med = (
            win[rows, (n_win + 1) // 2 - 1] + win[rows, n_win // 2]
        )
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "event_id": pdf["event_id"],
                "n_win": n_win,
                "med_x2_micro": med,
            }
        )

    return base.groupBy("event_type").applyInPandas(
        med_group,
        schema="event_type string, event_id long, "
        "n_win long, med_x2_micro long",
    )


# Shared oracle CTE mirroring _daily_close_bars -- ONE definition consumed
# by every close-bar oracle (the cross-sectional rets family plus
# window_roc) so the close selection cannot drift between keys (the
# md5_bucket_sql stance).
_CLOSE_BARS_CTE = """
        bars AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   arg_max(CAST(ROUND(value * 100) AS BIGINT),
                           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                           || lpad(CAST(event_id AS VARCHAR), 20, '0'))
                       AS cc
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        )
"""

_ROLLING_MEDIAN_ORACLE = """
        WITH base AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 1000000) AS BIGINT) AS vm
            FROM events
        ), framed AS (
            SELECT event_type, event_id,
                   list_sort(list(vm) OVER win) AS l,
                   CAST(COUNT(vm) OVER win AS BIGINT) AS n_win
            FROM base
            WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, event_id, n_win,
               l[CAST((n_win + 1) // 2 AS BIGINT)]
               + l[CAST(n_win // 2 + 1 AS BIGINT)] AS med_x2_micro
        FROM framed
    """

# Shared oracle CTE mirroring _daily_ohlc_bars -- ONE definition consumed
# by the OHLC-bar oracles (w_atr, w_donchian).
_OHLC_CTE = """
        bars AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   MAX(CAST(ROUND(value * 1000000) AS BIGINT)) AS hm,
                   MIN(CAST(ROUND(value * 1000000) AS BIGINT)) AS lm,
                   arg_max(CAST(ROUND(value * 1000000) AS BIGINT),
                           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                           || lpad(CAST(event_id AS VARCHAR), 20, '0'))
                       AS cm
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        )
"""

# Shared oracle CTE mirroring _daily_returns, composed over the shared
# close-bar definition.
_RETS_CTE = f"""
        {_CLOSE_BARS_CTE}, rets AS (
            SELECT event_type, day, rc FROM (
                SELECT event_type, day,
                       cc - LAG(cc) OVER (PARTITION BY event_type
                                          ORDER BY day) AS rc
                FROM bars
            ) WHERE rc IS NOT NULL
        )
"""


def _macd_oracle() -> str:
    """Mirror of window_macd: the same frozen weight lists generate the
    LAG-term SQL, so engine and oracle share every constant."""

    def wavg_sql(weights: list[int], cur: str, lag_fmt: str) -> str:
        tn, td = [], []
        for k, wt in enumerate(weights):
            lv = cur if k == 0 else lag_fmt.format(k=k)
            tn.append(f"COALESCE({lv} * {wt}, 0)")
            td.append(f"CASE WHEN {lv} IS NOT NULL THEN {wt} ELSE 0 END")
        num = " + ".join(tn)
        den = " + ".join(td)
        return (
            f"CASE WHEN ({den}) > 0 THEN "
            f"CAST(FLOOR(({num}) * 1.0 / ({den}) + 0.5) AS BIGINT) END"
        )

    e12 = wavg_sql(_MACD_W12, "vm", "LAG(vm, {k}) OVER win")
    e26 = wavg_sql(_MACD_W26, "vm", "LAG(vm, {k}) OVER win")
    sig = wavg_sql(_MACD_W9, "macd_micro", "LAG(macd_micro, {k}) OVER win")
    return f"""
        WITH base AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 1000000) AS BIGINT) AS vm
            FROM events
        ), m AS (
            SELECT event_type, event_id, ts,
                   ({e12}) - ({e26}) AS macd_micro
            FROM base
            WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
        ), s AS (
            SELECT event_type, event_id, macd_micro,
                   ({sig}) AS signal_micro
            FROM m
            WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
        )
        SELECT event_type, event_id, macd_micro, signal_micro,
               macd_micro - signal_micro AS hist_micro
        FROM s
    """


def _ewma_oracle() -> str:
    terms_n, terms_d = [], []
    for k, wt in enumerate(_EWMA_W):
        lv = "vm" if k == 0 else f"LAG(vm, {k}) OVER win"
        terms_n.append(f"COALESCE({lv} * {wt}, 0)")
        terms_d.append(f"CASE WHEN {lv} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms_n)
    den = " + ".join(terms_d)
    return f"""
        WITH base AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 1000000) AS BIGINT) AS vm
            FROM events
        )
        SELECT event_type, event_id,
               CASE WHEN ({den}) > 0 THEN
                   CAST(FLOOR(({num}) * 1.0 / ({den}) + 0.5) AS BIGINT)
                   / 1000000.0
               END AS ewma
        FROM base
        WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
    """


def window_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP (time-weighted average value) per event_type -- the
    time-weighted twin of ``w_vwap``: each observation is weighted by
    how long it REMAINED the latest value (interval to the next event
    in the type's stream), the standard execution benchmark for
    irregularly-spaced series where row-weighted averages over-count
    bursts. The last observation per type carries no interval and is
    excluded (n-1 intervals).

    Exactness: value -> integer milli-units via DECIMAL(18,3) (the
    fixture's values carry 3 decimals), interval -> exact BIGINT
    microseconds from a (ts, event_id)-total-ordered lead; each
    product and both running sums live in DECIMAL(38,0) (a
    milli-value x 90-day-microsecond product already brushes 2^62, so
    LONG sums would overflow at larger spans); the emit is ONE double
    division + round, identical on both engines.

    Scale shape: one shuffle on event_type, one WindowExec for the
    lead, map-side-partial decimal sums. Type cardinality is the
    partition count -- at 100 TB the natural key is the instrument id,
    exactly the per-symbol partitioning a market feed has natively."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("v_milli"),
    )
    stepped = base.select(
        "event_type",
        "v_milli",
        (
            F.unix_micros(F.lead("ts", 1).over(w)) - F.unix_micros(F.col("ts"))
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        stepped.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(F.col("dt_us").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("total_dt_us"),
            F.round(
                F.sum(
                    (F.col("v_milli") * F.col("dt_us")).cast("decimal(38,0)")
                ).cast("double")
                / F.sum(F.col("dt_us").cast("decimal(38,0)")).cast("double")
                / 1000.0,
                6,
            ).alias("twap_value"),
        )
        .orderBy("event_type")
    )


def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-SESSION ordered conversion funnel: for every w_sessionize
    session, how far the user progressed through view -> click ->
    purchase IN ORDER (a click before the first view does not count;
    the product-analytics composition of the sessionize and x_funnel
    keys, which respectively ignore ordering-within-gap and sessions).

    Step times are conditional mins chained through three window passes
    over the SAME (user_id, session_idx) clustering: t_view = min view
    ts; t_click = min click ts strictly after t_view; t_purchase = min
    purchase ts strictly after t_click; reached = how many are set.

    Scale shape: ONE exchange total -- the session index window hashes
    on user_id, and every later window/groupBy keys on (user_id,
    session_idx), whose co-location hash(user_id) already satisfies
    (the subset rule the sessionize docstring documents); the three
    funnel windows add sorts, not shuffles."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts", 1).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
            > _SESSION_GAP_US
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = events.withColumn(
        "session_idx", F.sum(is_new).over(run).cast("bigint")
    )
    p = Window.partitionBy("user_id", "session_idx")
    t_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(p)
    staged = sess.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
            F.col("ts"),
        )
    ).over(p)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(p)
    staged = staged.withColumn("t_purchase", t_purchase)
    return (
        staged.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            (
                F.max("t_view").isNotNull().cast("int")
                + F.max("t_click").isNotNull().cast("int")
                + F.max("t_purchase").isNotNull().cast("int")
            ).alias("reached"),
        )
        .select("user_id", "session_start", "reached")
        .orderBy("user_id", "session_start")
    )



QUERIES = {
    "w_rank": window_rank,
    "w_value_functions": window_value_functions,
    "w_lag_lead": window_lag_lead,
    "w_moving_avg": window_moving_avg,
    "w_cumulative": window_cumulative,
    "w_ntile": window_ntile,
    "w_range_interval": window_range_interval,
    "w_sessionize": window_sessionize,
    "w_twap": window_twap,
    "x_session_funnel": session_funnel,
    "w_gap_fill": window_gap_fill,
    "w_interpolate": window_interpolate,
    "w_backtest_naive": window_backtest_naive,
    "w_ewma": window_ewma,
    "w_max_drawdown": window_max_drawdown,
    "w_bollinger": window_bollinger,
    "w_rsi": window_rsi,
    "w_stochastic": window_stochastic,
    "w_vwap": window_vwap,
    "w_macd": window_macd,
    "w_macd_arrow": window_macd_arrow,
    "w_atr": window_atr,
    "w_obv": window_obv,
    "w_corr_matrix": window_corr_matrix,
    "w_xsec_zscore": window_xsec_zscore,
    "w_beta": window_beta,
    "w_sharpe": window_sharpe,
    "w_roc": window_roc,
    "w_donchian": window_donchian,
    "w_rolling_median": window_rolling_median,
    "w_rolling_median_arrow": window_rolling_median_arrow,
}

ORACLES = {
    # Same milli-unit/derived-interval construction; DECIMAL(38,0) sums
    # on both sides, one double division at the end.
    "w_twap": """
        WITH stepped AS (
            SELECT event_type,
                   CAST(ROUND(value * 1000) AS BIGINT) AS v_milli,
                   CAST(epoch_us(LEAD(ts) OVER (PARTITION BY event_type
                                                ORDER BY ts, event_id))
                        - epoch_us(ts) AS BIGINT) AS dt_us
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(CAST(dt_us AS DECIMAL(38,0))) AS BIGINT)
                   AS total_dt_us,
               ROUND(CAST(SUM(CAST(v_milli * dt_us AS DECIMAL(38,0)))
                          AS DOUBLE)
                     / CAST(SUM(CAST(dt_us AS DECIMAL(38,0))) AS DOUBLE)
                     / 1000.0, 6) AS twap_value
        FROM stepped
        WHERE dt_us IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    # The s_session_window session definition with event_type retained,
    # then the three chained conditional mins (each step strictly after
    # the previous step's time) via per-session grouped passes.
    "x_session_funnel": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, event_type,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        ), s1 AS (
            SELECT user_id, session_idx,
                   MIN(ts) AS session_start,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
            FROM sessions GROUP BY user_id, session_idx
        ), s2 AS (
            SELECT s.user_id, s.session_idx, s.session_start, s.t_view,
                   MIN(CASE WHEN e.event_type = 'click' AND e.ts > s.t_view
                            THEN e.ts END) AS t_click
            FROM s1 s
            JOIN sessions e USING (user_id, session_idx)
            GROUP BY s.user_id, s.session_idx, s.session_start, s.t_view
        ), s3 AS (
            SELECT s.user_id, s.session_idx, s.session_start, s.t_view,
                   s.t_click,
                   MIN(CASE WHEN e.event_type = 'purchase'
                                 AND e.ts > s.t_click
                            THEN e.ts END) AS t_purchase
            FROM s2 s
            JOIN sessions e USING (user_id, session_idx)
            GROUP BY s.user_id, s.session_idx, s.session_start, s.t_view,
                     s.t_click
        )
        SELECT user_id, session_start,
               CAST((CASE WHEN t_view IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN t_click IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END)
                    AS INTEGER) AS reached
        FROM s3 ORDER BY user_id, session_start
    """,

    # Running max minus value is exact double math on both engines (no
    # accumulation-order sensitivity), so the comparison needs no
    # tolerance and no rounding.
    "w_max_drawdown": """
        WITH series AS (
            SELECT user_id, value,
                   MAX(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS peak
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(peak - value) AS max_drawdown,
               MAX(peak) AS max_peak
        FROM series GROUP BY user_id ORDER BY user_id
    """,
    "w_ewma": _ewma_oracle(),
    "w_macd": _macd_oracle(),
    # The Arrow physical variant shares the Catalyst form's oracle
    # VERBATIM: one SQL truth, two execution strategies, both exact.
    "w_macd_arrow": _macd_oracle(),
    # Same a9-style deterministic bar selection, pure long TR/ATR
    # arithmetic, integer-micros output compared exactly.
    "w_atr": f"""
        WITH {_OHLC_CTE}, trs AS (
            SELECT event_type, day,
                   CASE WHEN LAG(cm) OVER win IS NULL THEN hm - lm
                        ELSE GREATEST(hm - lm,
                                      ABS(hm - LAG(cm) OVER win),
                                      ABS(lm - LAG(cm) OVER win))
                   END AS tr_micro
            FROM bars
            WINDOW win AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, day, tr_micro,
               CAST(FLOOR(CAST(SUM(tr_micro) OVER w14 AS BIGINT) * 1.0
                    / CAST(COUNT(tr_micro) OVER w14 AS BIGINT) + 0.5)
                    AS BIGINT) AS atr_micro
        FROM trs
        WINDOW w14 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    # Signed-quantity running sum: every column is an exact BIGINT (no
    # float arithmetic anywhere), compared exactly.
    "w_obv": """
        WITH base AS (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS pc,
                   CAST(ROUND(l_quantity) AS BIGINT) AS qn
            FROM lineitem
        ), staged AS (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, qn,
                   pc - LAG(pc) OVER wo AS d
            FROM base
            WINDOW wo AS (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber)
        ), flows AS (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                   CASE WHEN d IS NULL OR d = 0 THEN CAST(0 AS BIGINT)
                        WHEN d > 0 THEN qn ELSE -qn END AS flow
            FROM staged
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(flow) OVER wc AS BIGINT) AS obv
        FROM flows
        WINDOW wc AS (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    # Exact long co-moments (CASTs keep DuckDB's HUGEINT sums in long
    # arithmetic like Spark's); the Pearson emit's long->double casts,
    # sqrts, division, and floor form are correctly-rounded operations
    # written identically on both engines.
    "w_corr_matrix": f"""
        WITH {_RETS_CTE}, stats AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(a.rc) AS BIGINT) AS sx,
                   CAST(SUM(b.rc) AS BIGINT) AS sy,
                   CAST(SUM(a.rc * b.rc) AS BIGINT) AS sxy,
                   CAST(SUM(a.rc * a.rc) AS BIGINT) AS sxx,
                   CAST(SUM(b.rc * b.rc) AS BIGINT) AS syy
            FROM rets a JOIN rets b
              ON a.day = b.day AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        ), staged AS (
            SELECT type_a, type_b, n_days,
                   n_days * sxy - sx * sy AS num,
                   n_days * sxx - sx * sx AS dx,
                   n_days * syy - sy * sy AS dy
            FROM stats
        )
        SELECT type_a, type_b, n_days,
               CASE WHEN dx > 0 AND dy > 0 THEN
                   CAST(FLOOR(CAST(num AS DOUBLE)
                        / (sqrt(CAST(dx AS DOUBLE))
                           * sqrt(CAST(dy AS DOUBLE)))
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
               END AS corr_ret
        FROM staged
    """,
    # Cross-sectional n*rc - s over sqrt(n*q - s*s): exact long
    # arithmetic until one cast-sqrt-divide-floor emit, identical text.
    "w_xsec_zscore": f"""
        WITH {_RETS_CTE}, staged AS (
            SELECT event_type, day, rc,
                   CAST(COUNT(rc) OVER wd AS BIGINT) AS n,
                   CAST(SUM(rc) OVER wd AS BIGINT) AS s,
                   CAST(SUM(rc * rc) OVER wd AS BIGINT) AS q
            FROM rets
            WINDOW wd AS (PARTITION BY day)
        )
        SELECT event_type, day, rc,
               CASE WHEN n * q - s * s > 0 THEN
                   CAST(FLOOR(CAST(n * rc - s AS DOUBLE)
                        / sqrt(CAST(n * q - s * s AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
               END AS zscore
        FROM staged
    """,
    # The index is floor(Sum/Count) on two exact longs -- IEEE division
    # and floor, identical both engines -- then exact long co-moments;
    # alpha is evaluated over the staged beta column on both sides.
    "w_beta": f"""
        WITH {_RETS_CTE}, wi AS (
            SELECT event_type, day, rc,
                   CAST(FLOOR(CAST(CAST(SUM(rc) OVER wd AS BIGINT) AS DOUBLE)
                        / CAST(CAST(COUNT(rc) OVER wd AS BIGINT) AS DOUBLE))
                        AS BIGINT) AS x
            FROM rets
            WINDOW wd AS (PARTITION BY day)
        ), stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(rc) AS BIGINT) AS sy,
                   CAST(SUM(x * rc) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM wi GROUP BY event_type
        ), staged AS (
            SELECT event_type, n, sx, sy,
                   n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS dx
            FROM stats
        ), wb AS (
            SELECT event_type, n, sx, sy,
                   CASE WHEN dx > 0 THEN
                       CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) END AS beta
            FROM staged
        )
        SELECT event_type, n AS n_days,
               CASE WHEN beta IS NOT NULL THEN
                   CAST(FLOOR(beta * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
               END AS beta,
               CASE WHEN beta IS NOT NULL THEN
                   CAST(FLOOR((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
                        / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0
               END AS alpha_cents
        FROM wb
    """,
    # Exact long moments to |types| rows; the Sharpe/Sortino emits'
    # casts, sqrts, divisions, and floor form are correctly-rounded
    # operations written textually identically on both engines.
    "w_sharpe": f"""
        WITH {_RETS_CTE}, stats AS (
            SELECT event_type,
                   CAST(COUNT(rc) AS BIGINT) AS n_days,
                   CAST(SUM(rc) AS BIGINT) AS sx,
                   CAST(SUM(rc * rc) AS BIGINT) AS q,
                   CAST(SUM(CASE WHEN rc < 0 THEN rc * rc ELSE 0 END)
                        AS BIGINT) AS dq
            FROM rets GROUP BY event_type
        ), staged AS (
            SELECT event_type, n_days, sx AS sum_ret_cents, q, dq,
                   n_days * q - sx * sx AS var_num
            FROM stats
        )
        SELECT event_type, n_days, sum_ret_cents,
               CASE WHEN n_days > 1 AND var_num > 0 THEN
                   CAST(FLOOR(
                        (CAST(sum_ret_cents AS DOUBLE)
                         / CAST(n_days AS DOUBLE))
                        / sqrt(CAST(var_num AS DOUBLE)
                               / CAST(n_days * (n_days - 1) AS DOUBLE))
                        * sqrt(252.0) * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0
               END AS sharpe_ann,
               CASE WHEN dq > 0 THEN
                   CAST(FLOOR(
                        (CAST(sum_ret_cents AS DOUBLE)
                         / CAST(n_days AS DOUBLE))
                        / sqrt(CAST(dq AS DOUBLE) / CAST(n_days AS DOUBLE))
                        * sqrt(252.0) * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0
               END AS sortino_ann
        FROM staged
    """,
    # Exact-cents momentum; the ROC emit is one long->double division
    # and the floor form, identical text both engines.
    "w_roc": f"""
        WITH {_CLOSE_BARS_CTE}, staged AS (
            SELECT event_type, day, cc,
                   LAG(cc, 5) OVER (PARTITION BY event_type
                                    ORDER BY day) AS pc
            FROM bars
        )
        SELECT event_type, day, cc AS close_cents,
               cc - pc AS mom_cents,
               CASE WHEN pc <> 0 THEN
                   CAST(FLOOR(CAST(cc - pc AS DOUBLE) / CAST(pc AS DOUBLE)
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
               END AS roc
        FROM staged WHERE pc IS NOT NULL
    """,
    # Sliding integer extrema over the PRIOR-20 frame plus pure integer
    # comparisons: every column exact, no float anywhere.
    "w_donchian": f"""
        WITH {_OHLC_CTE}, staged AS (
            SELECT event_type, day, cm AS close_micro,
                   MAX(hm) OVER wp AS upper_micro,
                   MIN(lm) OVER wp AS lower_micro
            FROM bars
            WINDOW wp AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, day, close_micro, upper_micro, lower_micro,
               CAST(CASE WHEN upper_micro IS NULL THEN 0
                         WHEN close_micro > upper_micro THEN 1
                         WHEN close_micro < lower_micro THEN -1
                         ELSE 0 END AS INTEGER) AS breakout
        FROM staged
    """,
    # Explicit-frame exact median: both engines sort the same 15-long
    # frame array and sum the two middle elements -- all-BIGINT, the
    # emit never divides.
    "w_rolling_median": _ROLLING_MEDIAN_ORACLE,
    # The Arrow physical variant shares the Catalyst form's oracle
    # VERBATIM: one SQL truth, two execution strategies, both exact.
    "w_rolling_median_arrow": _ROLLING_MEDIAN_ORACLE,
    # Centi-unit integer window sums -> exact n*q - s^2 variance
    # numerator; the only inexact steps (IEEE sqrt, two double
    # divisions) are identical on both engines. CASTs keep DuckDB's
    # windowed SUM(BIGINT) (HUGEINT) in long arithmetic like Spark's.
    "w_bollinger": """
        WITH base AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS vc
            FROM events
        ), staged AS (
            SELECT event_type, event_id,
                   CAST(COUNT(vc) OVER w20 AS BIGINT) AS n,
                   CAST(SUM(vc) OVER w20 AS BIGINT) AS s,
                   CAST(SUM(vc * vc) OVER w20 AS BIGINT) AS q
            FROM base
            WINDOW w20 AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, event_id,
               CASE WHEN n > 0 THEN
                   CAST(FLOOR((s / (n * 100.0)) * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0 END AS ma20,
               CASE WHEN n > 0 THEN
                   CAST(FLOOR((s / (n * 100.0)
                        + 2.0 * (sqrt(n * q - s * s) / (n * 100.0)))
                        * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0 END AS upper,
               CASE WHEN n > 0 THEN
                   CAST(FLOOR((s / (n * 100.0)
                        - 2.0 * (sqrt(n * q - s * s) / (n * 100.0)))
                        * 1000000.0 + 0.5) AS BIGINT)
                   / 1000000.0 END AS lower
        FROM staged
    """,
    # Cutler SMA-14 RSI: integer-micros gains/losses, order-insensitive
    # long frame sums, one double division; flat frames are NULL.
    "w_rsi": """
        WITH base AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 1000000) AS BIGINT) AS vm
            FROM events
        ), diffs AS (
            SELECT event_type, event_id, ts,
                   vm - LAG(vm) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS d
            FROM base
        ), gl AS (
            SELECT event_type, event_id, ts,
                   CASE WHEN d > 0 THEN d ELSE 0 END AS g,
                   CASE WHEN d < 0 THEN -d ELSE 0 END AS l
            FROM diffs
        ), sums AS (
            SELECT event_type, event_id,
                   CAST(SUM(g) OVER w14 AS BIGINT) AS sg,
                   CAST(SUM(l) OVER w14 AS BIGINT) AS sl
            FROM gl
            WINDOW w14 AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, event_id,
               CASE WHEN sg + sl > 0 THEN
                   CAST(FLOOR(((100 * sg) * 1.0 / (sg + sl))
                        * 10000.0 + 0.5) AS BIGINT) / 10000.0
               END AS rsi14
        FROM sums
    """,
    # Sliding min/max have no accumulation at all; one double division.
    "w_stochastic": """
        WITH base AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 1000000) AS BIGINT) AS vm
            FROM events
        ), staged AS (
            SELECT event_type, event_id, vm,
                   MIN(vm) OVER w14 AS lo,
                   MAX(vm) OVER w14 AS hi
            FROM base
            WINDOW w14 AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, event_id,
               CASE WHEN hi > lo THEN
                   CAST(FLOOR(((100 * (vm - lo)) * 1.0 / (hi - lo))
                        * 10000.0 + 0.5) AS BIGINT) / 10000.0
               END AS pct_k
        FROM staged
    """,
    # Exact integer cents * integer quantity running sums; one double
    # division at emit. Same DECIMAL(18,2) price conversion as the
    # engine side.
    "w_vwap": """
        WITH base AS (
            SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS pc,
                   CAST(ROUND(l_quantity) AS BIGINT) AS qn
            FROM lineitem
        ), staged AS (
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   CAST(SUM(pc * qn) OVER w AS BIGINT) AS pv,
                   CAST(SUM(qn) OVER w AS BIGINT) AS qv
            FROM base
            WINDOW w AS (PARTITION BY l_suppkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CASE WHEN qv > 0 THEN
                   CAST(FLOOR((pv * 1.0 / (qv * 100))
                        * 1000000.0 + 0.5) AS BIGINT) / 1000000.0
               END AS vwap
        FROM staged
    """,
    # Same dense-LOCF series as w_gap_fill, same integer-cents error
    # sums, same floor(x+0.5) means -- identical expressions both sides.
    "w_backtest_naive": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
                         2) AS total
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, min(hr) AS h0, max(hr) AS h1
            FROM hourly GROUP BY 1
        ), spine AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        ), dense AS (
            SELECT s.event_type, s.hr,
                   h.n_events IS NULL AS is_filled,
                   CAST(round(LAST_VALUE(h.total IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) * 100) AS BIGINT) AS cents
            FROM spine s LEFT JOIN hourly h USING (event_type, hr)
        ), scored AS (
            SELECT event_type, is_filled,
                   cents - LAG(cents, 168) OVER (
                       PARTITION BY event_type ORDER BY hr) AS err_cents
            FROM dense
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(floor(SUM(abs(err_cents)) * 100.0 / COUNT(*) + 0.5)
                    AS BIGINT) / 10000.0 AS mae,
               CAST(floor(SUM(err_cents) * 100.0 / COUNT(*) + 0.5)
                    AS BIGINT) / 10000.0 AS bias
        FROM scored
        WHERE NOT is_filled AND err_cents IS NOT NULL
        GROUP BY event_type
    """,
    # Identical exact-integer interpolation as the engine: cents x
    # hour-index numerator in long arithmetic, ONE double division of
    # exactly-representable values, floor(x+0.5). A naive double ROUND of
    # the float expression diverges by one ulp on tie rows.
    "w_interpolate": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
                         2) AS total
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, min(hr) AS h0, max(hr) AS h1
            FROM hourly GROUP BY 1
        ), spine AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        ), j AS (
            SELECT s.event_type, s.hr, h.total, epoch_us(s.hr) AS t,
                   LAST_VALUE(h.total IGNORE NULLS) OVER wb AS pv,
                   LAST_VALUE(CASE WHEN h.total IS NOT NULL
                                   THEN epoch_us(s.hr) END IGNORE NULLS)
                       OVER wb AS pt,
                   FIRST_VALUE(h.total IGNORE NULLS) OVER wf AS nv,
                   FIRST_VALUE(CASE WHEN h.total IS NOT NULL
                                    THEN epoch_us(s.hr) END IGNORE NULLS)
                       OVER wf AS nt
            FROM spine s LEFT JOIN hourly h USING (event_type, hr)
            WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.hr
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY s.event_type ORDER BY s.hr
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hr,
               total IS NULL AS is_filled,
               CASE WHEN total IS NOT NULL THEN total
                    ELSE CAST(floor(
                         (CAST(round(pv * 100) AS BIGINT)
                            * CAST((nt - pt) / 3600000000 AS BIGINT)
                          + (CAST(round(nv * 100) AS BIGINT)
                             - CAST(round(pv * 100) AS BIGINT))
                            * CAST((t - pt) / 3600000000 AS BIGINT))
                         * 100.0
                         / CAST((nt - pt) / 3600000000 AS BIGINT)
                         + 0.5) AS BIGINT) / 10000.0
               END AS total_interp
        FROM j
    """,
    # LOCF copies already-rounded doubles (no arithmetic), so the fill is
    # bit-identical on both engines; the spine is generate_series + unnest.
    "w_gap_fill": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
                         2) AS total
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT event_type, min(hr) AS h0, max(hr) AS h1
            FROM hourly GROUP BY 1
        ), spine AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
            FROM bounds
        )
        SELECT s.event_type, s.hr,
               COALESCE(h.n_events, 0) AS n_events,
               h.n_events IS NULL AS is_filled,
               LAST_VALUE(h.total IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS total_locf
        FROM spine s LEFT JOIN hourly h USING (event_type, hr)
    """,
    # Exact-integer-microsecond gap comparison and an explicit ROWS frame on
    # the running session counter keep both engines bit-identical; the value
    # sum follows the exact-decimal discipline (CAST ... DECIMAL(18,6)).
    "w_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN LAG(ts, 1) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w)
                                > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, event_id, value,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
                   AS duration_us,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                   AS sum_value
        FROM sessions
        GROUP BY user_id, session_idx
    """,
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
    # Same integer-micros frame math as the engine ((sum/count)/1e6 in the
    # identical expression order), so the comparison is exact rather than
    # depending on double-AVG accumulation order.
    "w_moving_avg": """
        SELECT event_type, event_id,
               ROUND((CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                                    AS BIGINT)) OVER w AS DOUBLE)
                      / COUNT(*) OVER w) / 1000000.0, 4) AS ma3
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
