"""Aggregation operators (SURVEY.md SS2.4 A1-A7 + SS2.12 multi-dim extensions).

All grouped aggregation here compiles to Catalyst two-phase HashAggregate
(partial map-side combine -> shuffle by group key -> final), which is the
scale-correct shape: the shuffle moves one row per (partition, group), not the
raw data. Verified via ``.explain`` -- every query shows
``HashAggregate(partial) -> Exchange hashpartitioning -> HashAggregate``.

Numeric-parity discipline (SURVEY.md SS5.2): double-valued SUM/AVG outputs are
rounded in BOTH engines so partial-aggregation order cannot flip the
value-hash; integer sums are CAST to BIGINT in DuckDB (its SUM(int) returns
HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.temporal import event_date
from ..sources.fixtures import load_table

# ---------------------------------------------------------------------------
# M0 flagship: the reference's entire query surface in one statement.
# scan -> project/derive (F1-F3 recast) -> grouped multi-agg (A6+A7) ->
# top-k (O4). Reference cites: external_table.py:105-122 (the two analytical
# queries), stock_harvester.py:160-163 (derived date).
# ---------------------------------------------------------------------------


def flagship_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type rollup over ``events`` with top-5 by total value.

    Recasts the reference's daily OHLC envelope + volume summary
    (``external_table.py:105-122``) onto the events fixture: the derived
    calendar date mirrors ``trade_date`` (``stock_harvester.py:160-163``).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("event_date", event_date("ts"))
        .groupBy("event_type", "event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 2).alias("day_low"),
            F.round(F.max("value"), 2).alias("day_high"),
            # exact decimal sum: total_value is the ORDER BY key of the
            # LIMIT below, so a cross-engine accumulation-order cent flip
            # would change the selected row SET, not just a value.
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                2,
            ).alias("avg_value"),
        )
        .orderBy(F.desc("total_value"), "event_type", "event_date")
        .limit(5)
    )


FLAGSHIP_ORACLE = """
SELECT event_type,
       CAST(ts AS DATE) AS event_date,
       COUNT(*) AS n_events,
       ROUND(MIN(value), 2) AS day_low,
       ROUND(MAX(value), 2) AS day_high,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(value), 2) AS avg_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)
ORDER BY total_value DESC, event_type, event_date
LIMIT 5
"""


# ---------------------------------------------------------------------------
# A1/A2: group-count (reference: stock_harvester.py:205,208)
# ---------------------------------------------------------------------------


def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: rows per key -- ``lineitem.groupBy(l_returnflag).count()``."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("l_returnflag")
    )


def group_count_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: rows per derived date -- orders per order-date."""
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("order_date", event_date("o_orderdate"))
        .groupBy("order_date")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("order_date")
    )


# ---------------------------------------------------------------------------
# A3/A5: global count + min/max (stock_harvester.py:200,185-186)
# ---------------------------------------------------------------------------


def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A5: total rows and min/max date range in one global aggregate."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.min(event_date("l_shipdate")).alias("min_shipdate"),
        F.max(event_date("l_shipdate")).alias("max_shipdate"),
    )


# ---------------------------------------------------------------------------
# A4: distinct + count (stock_harvester.py:184)
# ---------------------------------------------------------------------------


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: two-step distinct-then-count, exactly the reference's form."""
    orders = load_table(spark, sf_dir, "orders")
    n = orders.select("o_custkey").distinct().count()
    # Materialize the scalar back into a DataFrame so the contract signature
    # holds; the count itself ran distributed (partial distinct per partition
    # -> shuffle -> final), only the 1-row result touches the driver. The
    # carrier is range(1)+lit, a JVM-local relation -- createDataFrame from
    # a Python list would route the single row through a pickled RDD and a
    # Python worker round-trip (measured 0.4-1.3 s of pure overhead).
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# A6/A7: grouped multi-agg envelopes (external_table.py:105-122)
# ---------------------------------------------------------------------------


def daily_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: COUNT/MIN/MAX envelope per (event_type, event_date)."""
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", event_date("ts"))
        .groupBy("event_type", "event_date")
        .agg(
            F.count("*").alias("bar_count"),
            F.round(F.min("value"), 2).alias("day_low"),
            F.round(F.max("value"), 2).alias("day_high"),
        )
        .orderBy("event_type", "event_date")
    )


def volume_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: SUM + ROUND(AVG, 2) per group (the reference's vwap summary)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
                / F.count("l_discount"),
                4,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# SS2.12 extensions: multi-dimensional aggregation
# ---------------------------------------------------------------------------


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (l_returnflag, l_linestatus): subtotals + grand total."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def percentile_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles (``percentile_approx``, KLL-style): the bounded-
    memory scale path for quantiles -- an exact percentile over 100 TB
    needs a full sort or all values in memory per group; the sketch is one
    pass, fixed size, mergeable across partitions. accuracy=10000 keeps
    rank error ~1e-4. Rows-only check (sketch is engine-specific);
    ``x_percentile`` is the exact anchor on the same column."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile_approx(l_quantity, 0.5, 10000)").alias("p50_qty"),
            F.expr("percentile_approx(l_quantity, 0.9, 10000)").alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: one pass over events
    produces hour-level, day-level, and grand-total aggregates via ROLLUP
    over the (day, hour) time hierarchy -- the continuous-aggregate /
    downsample pattern for time-series tables, generalizing the reference's
    single-granularity daily OHLC envelope (``external_table.py:105-111``).
    At 100 TB this replaces three scans (hourly, daily, total) with one."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.rollup(
            F.to_date("ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("day", "hour")
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority): all grouping combos."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id -- the general form rollup
    and cube desugar to, via the SQL surface over a direct parquet relation
    (``FROM parquet.`path``` -- no view registration needed).

    Two-phase: GROUPING SETS plans through an Expand operator that
    replicates EVERY input row once per grouping set (3x here) before the
    aggregate -- at 100 TB that is 3x the shuffle and 3x the (slow-path)
    decimal aggregation. Since all measures are distributive
    (count -> sum, sum -> sum), pre-aggregating to the FINEST set first
    and expanding only the tiny partial-aggregate relation is exact and
    cuts the Expand input from |rows| to |flag x status| groups. Measured
    (round-4 isolated reruns, sf0.1): 2.4 s -> 0.6 s; the r2->r3 bench
    regression on this key was the exact-decimal SUM (round-3 discipline)
    amplified 3x by the pre-rewrite Expand.

    Empty-input edge (checked, unreachable on fixtures): Spark emits ZERO
    rows for GROUPING SETS over empty input in BOTH the single-phase and
    two-phase forms, while DuckDB emits the () row with count 0 -- an
    engine-level difference predating this rewrite, not introduced by
    it."""
    path = f"{sf_dir}/lineitem.parquet"
    return spark.sql(
        f"""
        WITH base AS (
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS cnt,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS price_sum
            FROM parquet.`{path}`
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               SUM(cnt) AS n_rows,
               CAST(ROUND(SUM(price_sum), 2) AS DOUBLE) AS sum_price
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus
        """
    )


def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT x) per group (absent from reference; SS2.4 note)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("o_orderstatus")
    )


def approx_count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimate. No oracle (engine-specific sketch) --
    rows-only check; the exact twin above is the correctness anchor."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
        .orderBy("l_returnflag")
    )


def hll_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed HLL guarantee (the d_minhash_lsh_anchor pattern):
    per event_type, the EXACT distinct-user count (oracle recomputes it)
    plus a boolean pinning the DataSketches HLL estimate inside its
    documented ~2% relative error (with the same small absolute slack the
    sketch tests use). The oracle emits literal TRUE -- if the sketch
    drifts out of tolerance, the engine-side boolean flips and the driver
    row goes red, instead of the guarantee living only in pytest."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
    )
    tol = F.greatest(F.lit(2.0), F.lit(0.02) * F.col("n_users_exact"))
    return per_type.select(
        "event_type",
        "n_users_exact",
        (F.abs(F.col("est") - F.col("n_users_exact")) <= tol).alias(
            "est_within_tol"
        ),
    ).orderBy("event_type")


def approx_topk_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed heavy-hitters guarantee for Spark 4.1's
    ``approx_top_k`` -- the last sketch family (space-saving top-k)
    without an anchor key. Capacity (10000) exceeds the fixture's user
    cardinality (<=1500 at sf0.1), so the sketch is in its
    EXACT-under-capacity regime -- a theorem of the space-saving
    algorithm, not luck -- and two booleans are honestly pinnable:
    every user STRICTLY above the 10th-highest count boundary appears in
    the sketch's top-10 (boundary-tie-proof: ties at the boundary may
    legitimately resolve either way, so they are excluded), and the
    sketch's count for each such user equals the exact count. At 100 TB
    capacity is sized against estimated cardinality; under-capacity the
    counts become upper bounds and this anchor's booleans are exactly
    what a deployment would re-verify on a sample.

    Scale shape: exact side is one hash-agg; the rank window runs over
    the DISTINCT-user aggregate only (bounded, the x_kll_anchor stance);
    1-row boundary/max legs ride broadcast cross joins (_BNLJ_OK)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    wrk = Window.orderBy(F.desc("n"), "user_id")
    b10 = (
        exact.select("n", F.row_number().over(wrk).alias("rn"))
        .filter(F.col("rn") == 10)
        .select(F.col("n").alias("b10"))
    )
    stats = exact.agg(
        F.count("*").cast("long").alias("n_users"),
        F.max("n").cast("long").alias("max_count"),
    )
    approx = (
        ev.agg(F.expr("approx_top_k(user_id, 10, 10000)").alias("tk"))
        .select(F.explode("tk").alias("s"))
        .select(
            F.col("s.item").alias("user_id"),
            F.col("s.count").cast("long").alias("cnt_approx"),
        )
    )
    above = exact.crossJoin(F.broadcast(b10)).filter(F.col("n") > F.col("b10"))
    checked = above.join(approx, "user_id", "left").agg(
        F.count("*").cast("long").alias("n_above_b10"),
        F.coalesce(
            F.sum(F.when(F.col("cnt_approx").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("n_missed"),
        F.coalesce(
            F.sum(
                F.when(F.col("cnt_approx") != F.col("n"), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_count_mismatch"),
    )
    return stats.crossJoin(F.broadcast(checked)).select(
        "n_users",
        "max_count",
        "n_above_b10",
        (F.col("n_missed") == 0).alias("topk_covers_above_boundary"),
        (F.col("n_count_mismatch") == 0).alias("topk_counts_exact"),
    )


# Count-min sketch geometry: d hash rows x w counters, hashes from the
# engine-portable md5 contract (reshape.md5_bucket's fold, salted with the
# row index). EPS_NUM pins the anchor's overcount bound by integer
# cross-multiplication: max(est - exact) * w <= EPS_NUM * N. With
# E[row overcount] <= N/w (pairwise-uniform hashing), Markov gives
# P(one row's overcount > EPS_NUM*N/w) <= 1/EPS_NUM, so the min over d
# rows violates the bound with probability ~(1/EPS_NUM)^d ~= 1.5e-5 per
# key -- and md5 is deterministic, so on a given fixture the bound either
# holds forever or never (verified at all three SFs before freezing).
_CMS_D, _CMS_W, _CMS_EPS_NUM = 4, 256, 16


def cms_estimates(exact: DataFrame) -> DataFrame:
    """Count-min core, factored for the property test: per-key exact
    counts ``(user_id, n)`` -> ``(user_id, n, est)`` with est = the CMS
    point estimate min over d rows of counter[r][h_r(key)].

    Built from the PRE-AGGREGATED counts, not the raw stream: CMS
    counters are sums, so sketching the (key, partial-count) aggregate
    is algebraically identical to sketching every raw row -- the
    mergeable-summary property that lets 1000 executors sketch their
    partitions independently and merge d*w-cell grids at the driver.
    The counter grid here is d*w = 1024 rows, so the estimate lookup is
    a broadcast join, never a shuffle of the key table."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(_CMS_D)])
    ).alias("r")
    keyed = exact.select("user_id", "n", rows).select(
        "user_id",
        "n",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("r").cast("string"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("col"),
    )
    counters = keyed.groupBy("r", "col").agg(F.sum("n").alias("c"))
    return (
        keyed.join(F.broadcast(counters), ["r", "col"])
        .groupBy("user_id", "n")
        .agg(F.min("c").cast("long").alias("est"))
    )


def cms_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch anchor (Cormode & Muthukrishnan 2005) -- the one
    classic mergeable sketch family without a key beside the HLL/theta/
    KLL/space-saving anchors: per-user frequency estimates with the
    sketch's two guarantees checked against the exact counts. Unlike the
    JVM-sketch anchors, the md5 hash contract makes the WHOLE sketch
    engine-portable, so the DuckDB oracle rebuilds the identical d x w
    grid and recomputes every value -- nothing here is a pinned literal.

    Emits one row: key count, total mass N, the max overcount, the
    (deterministically zero) underestimate count -- CMS never
    under-counts, est >= exact is a theorem -- and the epsilon bound
    ``max_overcount * w <= EPS_NUM * N`` as integer cross-multiplication.
    Scale shape: one hash-agg to per-key counts, a d-way explode of THAT
    aggregate (never the fact table), one 1024-cell grid aggregate, one
    broadcast lookup."""
    exact = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    return cms_estimates(exact).agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_total"),
        F.max(F.col("est") - F.col("n")).cast("long").alias("max_overcount"),
        F.sum(F.when(F.col("est") < F.col("n"), 1).otherwise(0))
        .cast("long")
        .alias("n_underestimates"),
        (
            F.max(F.col("est") - F.col("n")) * _CMS_W
            <= F.lit(_CMS_EPS_NUM) * F.sum("n")
        ).alias("within_eps"),
    )


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of event values per type (10 buckets of 100
    over the [0, 1000) domain) with each bucket's share in basis points --
    the distribution-profiling primitive behind every dashboard histogram
    and data-quality drift check.

    Determinism: the bucket index is ``floor(value / 100)`` -- one IEEE
    expression over the SAME stored double on both engines -- and the
    share is integer basis points via ``floor(n * 10000 / total + 0.5)``,
    so no float comparison or representation ever reaches the oracle.
    Scale: one hash-agg shuffle to (type, bucket); the share window runs
    over the bucketed rollup (types x 10 rows)."""
    bucket = F.floor(F.col("value") / 100).cast("int")
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "bucket",
        "n_events",
        F.floor(
            F.col("n_events") * 10000.0 / F.sum("n_events").over(w) + 0.5
        )
        .cast("bigint")
        .alias("share_bp"),
    )


def rolling_mau_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day active users (MAU) per day, computed BOTH ways: exact
    (each (user, day) pair contributes to the 28 following days -- explode
    + equi-join on the day spine, never a range BNLJ) and via the stored
    daily HLL sketches merged with ``hll_union_agg`` over a sliding
    28-row window -- the metric the mergeable-sketch rollup exists for:
    at 100 TB the exact side reshuffles 28x the (user, day) pairs every
    refresh, while the sketch side window-merges DAYS-sized rows (a few
    KB per day) in milliseconds from the stored rollup.

    The sliding merge window is deliberately unpartitioned: its input is
    one row per calendar DAY (bounded metadata, thousands per decade),
    the same bounded-relation exception as j_theta_binned's bin spine.
    Anchor: |sketch - exact| <= max(2, 2%) pinned TRUE per day."""
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    days = pairs.select("d").distinct()
    contrib = pairs.select(
        "user_id", "d", F.explode(F.expr("sequence(0, 27)")).alias("k")
    ).select("user_id", F.date_add("d", F.col("k")).alias("dd"))
    exact = (
        contrib.join(F.broadcast(days.withColumnRenamed("d", "dd")), "dd")
        .groupBy("dd")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau_exact"))
    )
    # RANGE frame over the integer day ordinal = trailing 28 CALENDAR
    # days. A ROWS frame over observed days would silently widen across
    # zero-event calendar days (outage/backfill) and diverge from the
    # exact side (review finding; the fixture is day-dense, which masked
    # it).
    day_idx = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(day_idx).rangeBetween(-27, 0)
    est = pairs.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk")).select(
        F.col("d").alias("dd"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"),
    )
    tol = F.greatest(F.lit(2.0), F.lit(0.02) * F.col("mau_exact"))
    return exact.join(est, "dd").select(
        F.col("dd").alias("day"),
        "mau_exact",
        (F.abs(F.col("est").cast("double") - F.col("mau_exact")) <= tol).alias(
            "mau_ok"
        ),
    )


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users with a view, a click AT-OR-AFTER
    their first view, and a purchase at-or-after that click -- the
    product-analytics staple where each step must follow the previous one
    in time (a click before any view does not count).

    Semantics are pinned exactly: step k's timestamp is the MIN event time
    >= step k-1's timestamp, compared in integer microseconds, identically
    on both engines. Scale shape: three user-keyed conditional aggregates
    chained by user-keyed joins -- every shuffle is on hash(user_id), the
    join sides arrive co-partitioned from their own aggregations, and each
    stage's relation shrinks (funnels only narrow). Output is three
    step-count rows via a union of scalar aggregates -- no cross join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("t")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("t") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("t") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )

    def step(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("step"),
            F.count("*").cast("bigint").alias("n_users"),
        )

    return (
        step(views, "1_view")
        .unionByName(step(clicks, "2_click_after_view"))
        .unionByName(step(purchases, "3_purchase_after_click"))
    )


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution, linear model -- the ad-tech/warehouse
    staple beside the funnel: every purchase's value is split EVENLY
    across the same user's clicks in the preceding day (the
    s_interval_join window), and each click reports its total credited
    value across all purchases it touched. Exactness: the purchase value
    enters integer micro-units once (same double -> round both engines),
    the even split is integer division with the REMAINDER assigned to the
    earliest touch (first-click bonus -- a deterministic total order, no
    fractional credit ever rounds differently per engine).

    Scale shape: the click-purchase pairing is the interval join's plan
    (one shuffle per side on user_id, range residual); the per-purchase
    touch count and the remainder rank are windows over the pair table
    partitioned by purchase (bounded fan-out: touches per purchase);
    final rollup is one hash-agg on click_id."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("purch_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("value_micro"),
    )
    pairs = clicks.join(
        purchases,
        (F.col("click_user") == F.col("purch_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 DAY")),
    )
    per_purchase = Window.partitionBy("purchase_id")
    first_touch = Window.partitionBy("purchase_id").orderBy(
        "click_ts", "click_id"
    )
    enriched = pairs.select(
        "click_id",
        F.col("click_user").alias("user_id"),
        "value_micro",
        F.count("*").over(per_purchase).alias("n_touches"),
        F.row_number().over(first_touch).alias("rk"),
    )
    # `div` keeps the split in exact integer arithmetic end to end --
    # double division + cast could land one micro-unit off the floor at
    # representation boundaries, and the remainder identity below (base*n
    # + bonus == value) must hold exactly on both engines.
    credited = enriched.select(
        "click_id",
        "user_id",
        F.expr("value_micro div n_touches").alias("base"),
        (
            (F.col("value_micro") % F.col("n_touches"))
            * (F.col("rk") == 1).cast("long")
        ).alias("bonus"),
    )
    return (
        credited.groupBy("click_id", "user_id")
        .agg(
            F.count("*").cast("long").alias("n_purchases_credited"),
            F.sum(F.col("base") + F.col("bonus")).cast("long").alias(
                "credit_micro"
            ),
        )
        .orderBy("click_id")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen ISO week, and
    for each later week how many of that cohort were active -- the classic
    retention triangle every product-analytics pipeline computes.

    Scale shape: NO join -- one ``collect_set(week)`` aggregation per user
    yields both the cohort (``array_min`` of the set) and the activity
    weeks in the same pass, so the naive first-seen⋈activity self-join
    (two scans, one re-shuffle) collapses to a single user-keyed shuffle.
    The per-user week set is bounded by calendar weeks since launch
    (dozens-to-hundreds), the explode emits |users| x active-weeks rows
    into a map-side-partial hash-agg, and the final matrix is
    weeks x weeks."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    return (
        ev.groupBy("user_id")
        .agg(F.collect_set("week").alias("weeks"))
        .select(
            F.array_min("weeks").alias("cohort_week"),
            F.explode("weeks").alias("week"),
        )
        .groupBy("cohort_week", "week")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_idx"),
            "n_users",
        )
    )


def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resample: per (event_type, day), open = first value by time,
    close = last, high/low = max/min -- the canonical downsample of the
    reference's minute-bar OHLCV model (stock_harvester.py:51-61 builds
    minute bars; every consumer re-bars them to coarser grains exactly
    like this).

    open/close use ``min_by``/``max_by`` over a zero-padded
    (micros, event_id) string -- one hash-aggregate selection, NO window
    and NO self-join, with a total deterministic order even under
    timestamp ties. All outputs are selections of stored values (no
    float arithmetic), so the oracle match is exact. One shuffle,
    map-side partial aggregation -- the same plan class as the flagship
    rollup at any corpus size."""
    ord_key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            "value",
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.count("*").cast("bigint").alias("n_bars"),
            F.min_by("value", F.col("ord")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("ord")).alias("close"),
        )
    )


# Theta-sketch nominal entries: 2^15 keeps the sketch in exact mode below
# ~32k distincts, so the anchor booleans are DETERMINISTIC at every test
# scale. At production cardinality the single-sketch and union estimates
# carry RSE ~1/sqrt(2^15) ≈ 0.55% of their own value, but INTERSECTION and
# DIFFERENCE estimate errors scale with the UNION size (the retained-sample
# space both operands share), not the result size -- a small difference of
# two large audiences has error ~sqrt(|result|·(1-θ)/θ), which can dwarf 2%
# of the result. The anchor therefore tolerances ∩ and \ against 2% of the
# union, the quantity their error actually tracks.
_THETA_LGK = 15


def theta_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed theta-sketch SET ALGEBRA (DataSketches via Spark
    4.1 ``theta_*``): distinct customers with completed ('F') vs pending
    ('P') orders, and the sketch-estimated union / intersection /
    difference of the two audiences against exact recomputation.

    Why theta and not HLL: HLL sketches union only; theta sketches
    support intersection and difference -- the audience-overlap query
    ("how many users did both X and Y") that at 100 TB is answered from
    two STORED per-segment sketches in microseconds instead of a
    re-scan + semi-join of the raw events. Both sketch sides here build
    in ONE conditional pass over the filtered table (map-side partial
    sketch merge, one scalar-only shuffle); the exact side is the
    one-shuffle flag rollup. The two 1-row results meet in a broadcast
    cross join (allowlisted BNLJ, the scalar-carrier pattern).

    Oracle emits the exact counts plus literal TRUE for each tolerance
    boolean -- a broken sketch (bad merge, bad intersection math) flips
    an engine-side boolean and the driver row goes red."""
    both = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "P")
    )
    sk = both.agg(
        F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == "F", F.col("o_custkey")),
            _THETA_LGK,
        ).alias("sk_f"),
        F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == "P", F.col("o_custkey")),
            _THETA_LGK,
        ).alias("sk_p"),
    )
    flags = both.groupBy("o_custkey").agg(
        F.max((F.col("o_orderstatus") == "F").cast("int")).alias("in_f"),
        F.max((F.col("o_orderstatus") == "P").cast("int")).alias("in_p"),
    )
    exact = flags.agg(
        F.sum("in_f").cast("bigint").alias("n_f"),
        F.sum("in_p").cast("bigint").alias("n_p"),
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(F.col("in_f") * F.col("in_p")).cast("bigint").alias("n_both"),
        F.sum(F.col("in_f") * (1 - F.col("in_p")))
        .cast("bigint")
        .alias("n_f_only"),
    )

    def _ok(est: F.Column, ex: str, scale: str = None) -> F.Column:
        # Tolerance scales with `scale` (defaults to the compared quantity);
        # intersection/difference pass the union -- see _THETA_LGK note.
        tol = F.greatest(F.lit(2.0), F.lit(0.02) * F.col(scale or ex))
        return (F.abs(est.cast("double") - F.col(ex)) <= tol).alias(f"{ex}_ok")

    return exact.crossJoin(F.broadcast(sk)).select(
        "n_f",
        "n_p",
        "n_union",
        "n_both",
        "n_f_only",
        _ok(F.theta_sketch_estimate("sk_f"), "n_f"),
        _ok(F.theta_sketch_estimate("sk_p"), "n_p"),
        _ok(F.theta_sketch_estimate(F.theta_union("sk_f", "sk_p")), "n_union"),
        _ok(
            F.theta_sketch_estimate(F.theta_intersection("sk_f", "sk_p")),
            "n_both",
            scale="n_union",
        ),
        _ok(
            F.theta_sketch_estimate(F.theta_difference("sk_f", "sk_p")),
            "n_f_only",
            scale="n_union",
        ),
    )


# The ONE definition of the KLL sketch-list fold (Spark 4.1 exposes only a
# two-sketch scalar merge, no merge aggregate): first element seeds the
# accumulator, the rest fold in via kll_sketch_merge_double. Shared by
# kll_rollup_anchor and the mergeability unit test so the test always
# exercises the operator's actual algebra.
KLL_FOLD_EXPR = (
    "aggregate(slice(sks, 2, size(sks)), element_at(sks, 1),"
    " (acc, x) -> kll_sketch_merge_double(acc, x))"
)


def kll_rollup_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed MERGEABLE-QUANTILE rollup (DataSketches KLL via
    Spark 4.1 ``kll_sketch_*``): one KLL sketch per DAY over event values
    -- the storable daily-rollup artifact, the quantile twin of
    ``x_hll_sketch``'s distinct-count story -- folded across the full
    range and queried for p50/p90.

    Spark 4.1 ships no KLL merge AGGREGATE (``kll_sketch_merge_double``
    is a two-sketch scalar), so the fold is ``aggregate()`` over the
    collected per-day sketch list -- bounded at one ~KB sketch per day
    (the partition-cardinality-bounded metadata stance, cf.
    ``storage/table.py`` partition-key collects), never per-row data.

    The anchor tolerance lives in RANK space, where the KLL guarantee is
    stated: the empirical rank of each sketch-estimated quantile must sit
    within 0.04 of the target rank (k=200 gives ~1.65% rank error at 99%
    confidence; 0.04 is ~2.4x that, so the boolean is stable across the
    sketch's internal randomization but flips on any real defect in the
    sketch build, the scalar merge, or the fold). Oracle recomputes the
    exact interpolated percentiles and emits literal TRUEs.

    ``p50_exact``/``p90_exact`` follow the repo's exact-integer
    discipline (cf. ``w_interpolate``): Spark ``percentile`` vs DuckDB
    ``quantile_cont`` interpolate raw doubles in engine-specific op
    order, which can differ by one ulp and flip a 6-decimal ROUND at a
    boundary. Instead both sides recover the two bracketing order
    statistics as exact integer MICROS via a distinct-value cumulative
    count, build the interpolation numerator in pure long arithmetic
    (``lo*d + rem*(hi-lo)`` with denominator d = 2 for p50, 10 for p90),
    and perform ONE identical double division. Scale note: the
    cumulative-rank window runs over DISTINCT micros only, but with NO
    partitionBy it funnels them through one task -- cheaper than the
    built-in exact ``percentile`` only while distinct-value cardinality
    stays well below row count (true for the fixture's 6-decimal micros;
    a near-unique value column would need a two-level per-partition
    rank-sum merge instead). The anchor is fixture-scale evidence for the
    KLL fold; ``percentile_approx``/KLL itself is the 100 TB path."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("day").agg(
        F.kll_sketch_agg_double("value", F.lit(200)).alias("sk")
    )
    merged = (
        daily.agg(F.collect_list("sk").alias("sks"))
        .select(F.expr(KLL_FOLD_EXPR).alias("ska"))
        .select(
            F.kll_sketch_get_quantile_double("ska", F.lit(0.5)).alias("p50k"),
            F.kll_sketch_get_quantile_double("ska", F.lit(0.9)).alias("p90k"),
        )
    )
    vals = ev.where(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 1e6).cast("long").alias("m")
    )
    counts = vals.groupBy("m").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    # One window pass: ExtractWindowExpressions does not dedup equal
    # window expressions (the w_ewma lesson), so prev derives from the
    # cum ATTRIBUTE rather than a second sum-over-window tree.
    cum = counts.select(
        "m", "c", F.sum("c").over(wcum).alias("cum")
    ).select("m", "cum", (F.col("cum") - F.col("c")).alias("prev"))
    nrow = vals.agg(F.count("*").alias("nv"))
    # 1-based interpolation position 1 + (n-1)*q: bracketing ranks and the
    # integer remainder of the fractional part (denominator 2 resp. 10).
    i50 = F.expr("(nv - 1) DIV 2 + 1")
    i90 = F.expr("((nv - 1) * 9) DIV 10 + 1")
    rem2 = F.expr("(nv - 1) % 2")
    rem10 = F.expr("((nv - 1) * 9) % 10")

    def at_rank(rank, name):
        cond = (F.col("prev") < rank) & (F.col("cum") >= rank)
        return F.min(F.when(cond, F.col("m"))).alias(name)

    exact = (
        cum.crossJoin(F.broadcast(nrow))
        .agg(
            at_rank(i50, "lo50"),
            at_rank(i50 + 1, "hi50"),
            at_rank(i90, "lo90"),
            at_rank(i90 + 1, "hi90"),
            F.max(rem2).alias("rem2"),
            F.max(rem10).alias("rem10"),
        )
        .select(
            (
                (
                    F.col("lo50") * 2
                    + F.col("rem2")
                    * (F.coalesce("hi50", "lo50") - F.col("lo50"))
                ).cast("double")
                / 2e6
            ).alias("p50_exact"),
            (
                (
                    F.col("lo90") * 10
                    + F.col("rem10")
                    * (F.coalesce("hi90", "lo90") - F.col("lo90"))
                ).cast("double")
                / 1e7
            ).alias("p90_exact"),
        )
    )
    return (
        ev.crossJoin(F.broadcast(merged))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.avg((F.col("value") <= F.col("p50k")).cast("int")).alias("r50"),
            F.avg((F.col("value") <= F.col("p90k")).cast("int")).alias("r90"),
        )
        .crossJoin(F.broadcast(exact))
        .select(
            "n_events",
            "p50_exact",
            "p90_exact",
            (F.abs(F.col("r50") - 0.5) <= 0.04).alias("r50_ok"),
            (F.abs(F.col("r90") - 0.9) <= 0.04).alias("r90_ok"),
        )
    )


def percentile_approx_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed sketch-percentile guarantee: per return flag, the
    EXACT interpolated p50/p90 (oracled via quantile_cont) plus booleans
    pinning the ``percentile_approx`` (KLL-style, accuracy 10000) estimate
    within 1 quantity unit of the exact value -- generous against the
    sketch's ~1e-4 rank error on this integral column, but tight enough
    that a broken sketch (wrong merge, wrong rank math) flips it. Oracle
    emits literal TRUEs."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_exact"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_exact"),
            F.expr("percentile_approx(l_quantity, 0.5, 10000)").alias("p50a"),
            F.expr("percentile_approx(l_quantity, 0.9, 10000)").alias("p90a"),
        )
    )
    return agg.select(
        "l_returnflag",
        F.col("p50_exact").alias("p50_qty"),
        F.col("p90_exact").alias("p90_qty"),
        (F.abs(F.col("p50a") - F.col("p50_exact")) <= 1.0).alias("p50_within_tol"),
        (F.abs(F.col("p90a") - F.col("p90_exact")) <= 1.0).alias("p90_within_tol"),
    ).orderBy("l_returnflag")


def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL ``percentile``), matching DuckDB
    ``quantile_cont``. ``percentile_approx`` exists too but is sketch-based;
    the exact form is the oracle-checkable one.

    Uses ``l_quantity`` (small integral doubles) so linear interpolation is
    exact in binary in both engines; on continuous doubles the two engines'
    interpolation arithmetic can differ in the last ulp.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates -- stddev/variance (sample),
    correlation, covariance -- per return flag. All are single-pass
    co-moment aggregates (Welford-style partial states merged at the
    final agg), so at scale they cost exactly one shuffle like any
    group-count; nothing is collected or two-passed.

    Rounded to 6 dp (ratios) / 2 dp (covariance) because co-moment
    accumulation order differs across engines in the last few ulps.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+
    ``bitmap_bucket_number`` / ``bitmap_construct_agg`` / ``bitmap_count``):
    per event_type, the number of distinct users.

    Scale shape: the shuffle carries one fixed-size bitmap per
    (group, bucket-of-32768-ids) with map-side partial OR-merging, instead
    of every raw distinct value -- the standard pattern when distinct
    counts are recomputed repeatedly (the bitmaps are also storable as a
    pre-aggregated rollup table and OR-merge across days). Result is
    exact, so the oracle is plain COUNT(DISTINCT).
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


def hll_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counting via MERGEABLE Apache DataSketches HLL
    (Spark 3.5+ ``hll_sketch_agg``/``hll_sketch_estimate``): unlike
    ``approx_count_distinct``'s opaque one-shot sketch, these sketches are
    storable columns -- a daily rollup table keeps one sketch per
    (day, group) and ANY date-range distinct count is ``hll_union_agg`` +
    estimate over the rollup, never a rescan of raw data. That rollup
    algebra is the 100 TB reason this operator exists;
    tests/test_sketches.py proves union-of-partial-sketches == sketch-of-
    whole. Rows-only by contract (sketch estimates are engine-specific);
    the exact anchors are x_count_distinct / x_bitmap_distinct.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n_users_est")
        )
        .orderBy("event_type")
    )


def pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q1-class pricing rollup written in Spark 4's SQL PIPE syntax
    (`FROM ... |> WHERE |> AGGREGATE ... GROUP BY |> EXTEND |> ORDER BY`)
    -- the composable query dialect Spark 4.0 added; each stage feeds the
    next top-to-bottom, and Catalyst plans it identically to the classic
    form (same partial-agg + exchange plan). Exact-decimal sum discipline
    as everywhere; the oracle is the equivalent classic SQL."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe"
    )
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate IS NOT NULL AND l_quantity > 10
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                          AS DOUBLE) AS gross
           GROUP BY l_returnflag, l_linestatus
        |> EXTEND ROUND(gross / n_items, 2) AS avg_price
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: the quantity-weighted median price per
    return flag -- the lower weighted median (first value whose
    cumulative weight reaches half the total), the inventory-weighted
    mid-price question a trading rollup asks that the unweighted
    ``x_percentile`` cannot answer.

    Exactness: prices enter as exact cents via the repo's
    ``FLOOR(x * 100 + 0.5)`` emit, weights as BIGINT, the cumulative
    weight is an integer window sum under a TOTAL order (cents, orderkey,
    linenumber), and the half-total comparison is the integer
    cross-multiplication ``2 * cw >= tw`` -- no division, no float
    accumulation, so both engines pick the identical boundary row. The
    qualifying rows form a SUFFIX of the cumsum order, so MIN(cents)
    over them IS the boundary row's value.

    Scale shape: one shuffle (both window specs share the flag
    partitioning), map-side nothing to pre-aggregate (the window needs
    the full order) -- the classic exact-quantile cost; the approximate
    sibling for 100 TB is ``x_percentile_approx``/KLL."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.expr("CAST(l_quantity AS BIGINT)").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    tot = Window.partitionBy("l_returnflag")
    staged = li.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(cum).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )
    return (
        staged.where(F.expr("2 * cw >= tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").alias("median_price_cents"),
            F.max("tw").cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# (name, engine-side string rendering) per profiled column. The NULLIF
# derivation is the null-path witness: the fixtures carry no NULLs, and a
# profiler whose null counter was never exercised is untested where it
# matters most (profiling exists to find dirty data).
_PROFILE_COLS = (
    ("event_id", "CAST(event_id AS STRING)"),
    ("ts", "CAST(ts AS STRING)"),
    ("user_id", "CAST(user_id AS STRING)"),
    ("event_type", "event_type"),
    ("value", "CAST(value AS STRING)"),
    ("props", "props"),
    ("etype_nonview", "NULLIF(event_type, 'view')"),
)


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-profiling scan -- the first query every ingestion
    pipeline runs on a new feed: row count, NULL count, and exact distinct
    cardinality for every column of ``events`` (plus one derived nullable
    column; see ``_PROFILE_COLS``).

    Shape: ONE scan melted by ``stack`` into (column_name, value) pairs,
    then a single hash-agg -- exactly the row multiplication a multi-column
    ``COUNT(DISTINCT)`` would plan via Expand, but with the per-column
    stats landing as ROWS (the profiling report shape) instead of one
    ever-wider row. Values are compared as strings: both engines render
    bigint/double/timestamp injectively, and only per-engine injectivity
    matters for a COUNT(DISTINCT) -- the rendered strings never cross the
    engine boundary.

    Scale: the melt multiplies the shuffle by |cols|, and partial
    (map-side) aggregation on (column_name, value) collapses it back to
    per-partition distinct values before the exchange. At 100 TB one
    would swap exact distinct for ``approx_count_distinct`` per column in
    a single un-melted pass (no row multiplication at all) -- the
    x_approx_count_distinct / x_hll_sketch keys are that path; this key
    is the exact-report form, priced one shuffle."""
    branches = ", ".join(f"'{n}', {expr}" for n, expr in _PROFILE_COLS)
    melted = load_table(spark, sf_dir, "events").select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {branches}) AS (column_name, v)"
        )
    )
    return (
        melted.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("v")).alias("n_nulls"),
            F.countDistinct("v").alias("n_distinct"),
        )
        .orderBy("column_name")
    )


def outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-sigma outlier detection per event_type -- the value-clipping
    gate a training-data pipeline runs before ingestion. The textbook
    float form (|v - mean| > 3*stddev) is order-dependent and
    sqrt-bearing; here the predicate is cross-multiplied into pure
    integer arithmetic over micro-unit values so the flagged set is
    bit-identical on any engine:

        (n*v - S)^2 > 9 * (n*S2 - S^2)        [population variance]

    with v = floor(value*1e6 + 0.5), S = sum(v), S2 = sum(v^2), all in
    DECIMAL(38,0) (the d_cc_largestar/x_weighted_median idiom; the
    DuckDB mirror computes the same products in HUGEINT). No float ever
    forms, so no rounding tolerance exists to get wrong.

    Scale shape: one hash-agg for the per-group (n, S, S2) triple, the
    1-row-per-group stats broadcast back onto the scan, one map-side
    predicate, one final hash-agg -- two shuffles total, no window, no
    sort; at 100 TB the stats side is KBs however large the fact is."""
    v = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", v.alias("v")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d(F.col("v"))).alias("s"),
        F.sum(d(F.col("v") * F.col("v"))).alias("s2"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    # No pow(): decimal ** goes through double; square by self-multiply
    # to stay exact.
    lhs = (d(F.col("n")) * d(F.col("v")) - F.col("s")) * (
        d(F.col("n")) * d(F.col("v")) - F.col("s")
    )
    rhs = F.lit(9).cast("decimal(38,0)") * (
        d(F.col("n")) * F.col("s2") - F.col("s") * F.col("s")
    )
    return (
        joined.withColumn("is_outlier", (lhs > rhs).cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_outlier").cast("bigint").alias("n_outliers"),
            F.round(F.sum("is_outlier") / F.count("*"), 6).alias(
                "outlier_rate"
            ),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "x_weighted_median": weighted_median,
    "a0_flagship_daily_rollup": flagship_daily_rollup,
    "a1_group_count": group_count,
    "a2_group_count_date": group_count_date,
    "a3_a5_global_stats": global_stats,
    "a4_distinct_count": distinct_count,
    "a6_daily_envelope": daily_envelope,
    "a7_volume_summary": volume_summary,
    "a9_ohlc_resample": ohlc_resample,
    "x_retention_cohorts": retention_cohorts,
    "x_funnel": funnel_steps,
    "x_attribution_linear": attribution_linear,
    "x_rolling_mau_anchor": rolling_mau_anchor,
    "x_histogram": value_histogram,
    "x_rollup": rollup_agg,
    "x_time_rollup": time_rollup,
    "x_pipe_syntax": pipe_syntax_rollup,
    "x_grouping_sets": grouping_sets_agg,
    "x_cube": cube_agg,
    "x_count_distinct": count_distinct_agg,
    "x_bitmap_distinct": bitmap_distinct,
    "x_hll_sketch": hll_sketch_distinct,
    "x_approx_count_distinct": approx_count_distinct_agg,
    "x_percentile": percentile_agg,
    "x_percentile_approx": percentile_approx_agg,
    "x_hll_anchor": hll_anchor,
    "x_theta_anchor": theta_anchor,
    "x_kll_anchor": kll_rollup_anchor,
    "x_percentile_approx_anchor": percentile_approx_anchor,
    "x_approx_topk_anchor": approx_topk_anchor,
    "x_cms_anchor": cms_anchor,
    "x_stats_moments": stats_moments,
    "x_column_profile": column_profile,
    "x_outliers_zscore": outliers_zscore,
}

ORACLES = {
    # Exact weighted (lower) median; every value BIGINT, boundary row
    # picked by integer cross-multiplication under a total order.
    "x_weighted_median": """
        WITH st AS (
            SELECT l_returnflag,
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                   CAST(l_quantity AS BIGINT) AS w,
                   l_orderkey, l_linenumber
            FROM lineitem
        ), c AS (
            SELECT l_returnflag, cents,
                   SUM(w) OVER (PARTITION BY l_returnflag
                                ORDER BY cents, l_orderkey, l_linenumber
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(w) OVER (PARTITION BY l_returnflag) AS tw
            FROM st
        )
        SELECT l_returnflag,
               CAST(MIN(cents) AS BIGINT) AS median_price_cents,
               CAST(MAX(tw) AS BIGINT) AS total_weight
        FROM c WHERE 2 * cw >= tw
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "a0_flagship_daily_rollup": FLAGSHIP_ORACLE,
    "a1_group_count": """
        SELECT l_returnflag, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "a2_group_count_date": """
        SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS n_orders
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "a3_a5_global_stats": """
        SELECT COUNT(*) AS n_rows,
               MIN(CAST(l_shipdate AS DATE)) AS min_shipdate,
               MAX(CAST(l_shipdate AS DATE)) AS max_shipdate
        FROM lineitem
    """,
    "a4_distinct_count": """
        SELECT COUNT(DISTINCT o_custkey) AS n_customers FROM orders
    """,
    # Identical floor(value/100) bucketing over the same stored doubles;
    # share as integer basis points.
    "x_histogram": """
        WITH counts AS (
            SELECT event_type,
                   CAST(floor(value / 100) AS INTEGER) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, bucket, n_events,
               CAST(floor(n_events * 10000.0
                          / SUM(n_events) OVER (PARTITION BY event_type)
                          + 0.5) AS BIGINT) AS share_bp
        FROM counts
    """,
    # Exact trailing-28-day distinct per day; the sketch boolean is a
    # pinned literal TRUE (anchor pattern).
    "x_rolling_mau_anchor": """
        WITH pairs AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), days AS (
            SELECT DISTINCT d FROM pairs
        )
        SELECT dd.d AS day,
               CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS mau_exact,
               TRUE AS mau_ok
        FROM days dd JOIN pairs p ON p.d BETWEEN dd.d - 27 AND dd.d
        GROUP BY dd.d
    """,
    # Linear multi-touch attribution: value enters integer micro-units
    # once (same double multiply + HALF round on both engines), then the
    # even split and first-touch remainder are pure integer arithmetic.
    "x_attribution_linear": """
        WITH pairs AS (
            SELECT c.event_id AS click_id, c.user_id AS user_id,
                   CAST(c.ts AS TIMESTAMP) AS click_ts,
                   p.event_id AS purchase_id,
                   CAST(ROUND(p.value * 1000000) AS BIGINT) AS value_micro
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
             AND CAST(p.ts AS TIMESTAMP)
                 <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 DAY
            WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        ), enr AS (
            SELECT click_id, user_id, value_micro,
                   COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches,
                   ROW_NUMBER() OVER (PARTITION BY purchase_id
                                      ORDER BY click_ts, click_id) AS rk
            FROM pairs
        )
        SELECT click_id, user_id,
               COUNT(*) AS n_purchases_credited,
               CAST(SUM(value_micro // n_touches
                        + CASE WHEN rk = 1 THEN value_micro % n_touches
                               ELSE 0 END) AS BIGINT) AS credit_micro
        FROM enr
        GROUP BY click_id, user_id
        ORDER BY click_id
    """,
    # Step k's time = MIN event time >= step k-1's time, in exact integer
    # microseconds -- identical chained-CTE formulation on both engines.
    "x_funnel": """
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        ), v AS (
            SELECT user_id, min(t) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.t) AS t2
            FROM ev e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.t >= v.t1
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.t) AS t3
            FROM ev e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.t >= c.t2
            GROUP BY e.user_id
        )
        SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    """,
    # Both engines truncate to ISO Monday weeks; counting rows of the
    # deduplicated (user, week) set per cell is exact.
    "x_retention_cohorts": """
        WITH ev AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events
        ), first_seen AS (
            SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, e.week) // 7 AS INTEGER)
                   AS week_idx,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM ev e JOIN first_seen f USING (user_id)
        GROUP BY f.cohort_week, e.week
    """,
    # arg_min/arg_max over the identical zero-padded (micros, event_id)
    # string gives DuckDB the same total order as min_by/max_by.
    "a9_ohlc_resample": """
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_bars,
               arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                              || lpad(CAST(event_id AS VARCHAR), 20, '0'))
                   AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                              || lpad(CAST(event_id AS VARCHAR), 20, '0'))
                   AS close
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    """,
    "a6_daily_envelope": """
        SELECT event_type,
               CAST(ts AS DATE) AS event_date,
               COUNT(*) AS bar_count,
               ROUND(MIN(value), 2) AS day_low,
               ROUND(MAX(value), 2) AS day_high
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "a7_volume_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "x_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag)::INT AS g_flag,
               GROUPING(l_linestatus)::INT AS g_status,
               COUNT(*) AS n_rows,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag, l_linestatus
    """,
    "x_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    # The pipe-syntax rollup's classic-SQL equivalent: same aliases, same
    # exact-decimal sum, same double division before the ROUND.
    "x_pipe_syntax": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS gross,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                          AS DOUBLE) / COUNT(*), 2) AS avg_price
        FROM lineitem
        WHERE l_shipdate IS NOT NULL AND l_quantity > 10
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "x_time_rollup": """
        SELECT CAST(ts AS DATE) AS day,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events
        GROUP BY ROLLUP (CAST(ts AS DATE), CAST(date_trunc('hour', ts) AS TIMESTAMP))
        ORDER BY day, hour
    """,
    "x_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "x_count_distinct": """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "x_bitmap_distinct": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "x_percentile": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50_qty,
               quantile_cont(l_quantity, 0.9) AS p90_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    # Sketch anchors: the exact columns are recomputed from first
    # principles; the tolerance booleans are pinned literal TRUE (the
    # d_minhash_lsh_anchor pattern -- a broken sketch flips the
    # engine-side boolean and the driver row goes red).
    "x_hll_anchor": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users_exact,
               TRUE AS est_within_tol
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # FULL sketch mirror, not pinned literals: the md5 hash contract is
    # engine-portable, so the oracle rebuilds the identical d x w counter
    # grid and recomputes max_overcount / underestimates / the integer
    # cross-multiplied epsilon bound from first principles.
    "x_cms_anchor": f"""
        WITH exact AS (
            SELECT user_id, COUNT(*) AS n FROM events
            WHERE user_id IS NOT NULL GROUP BY user_id
        ), keyed AS (
            SELECT user_id, n, r,
                   CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':'
                                           || CAST(user_id AS VARCHAR)),
                                       1, 8) AS BIGINT) % {_CMS_W} AS col
            FROM exact,
                 (SELECT unnest(range({_CMS_D})) AS r)
        ), counters AS (
            SELECT r, col, SUM(n) AS c FROM keyed GROUP BY r, col
        ), est AS (
            SELECT k.user_id, k.n, MIN(c.c) AS est
            FROM keyed k JOIN counters c USING (r, col)
            GROUP BY k.user_id, k.n
        )
        SELECT COUNT(*) AS n_keys,
               CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(MAX(est - n) AS BIGINT) AS max_overcount,
               CAST(SUM(CASE WHEN est < n THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_underestimates,
               MAX(est - n) * {_CMS_W} <= {_CMS_EPS_NUM} * SUM(n)
                   AS within_eps
        FROM est
    """,
    # Exact population stats recomputed; the two sketch booleans are
    # literal TRUEs (exact-under-capacity regime, see the docstring).
    # Boundary-tie-proof: only users STRICTLY above the 10th count are
    # required in the sketch's list.
    "x_approx_topk_anchor": """
        WITH exact AS (
            SELECT user_id, COUNT(*) AS n FROM events
            WHERE user_id IS NOT NULL GROUP BY user_id
        ), b AS (
            SELECT n AS b10 FROM exact
            ORDER BY n DESC, user_id LIMIT 1 OFFSET 9
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MAX(n) AS BIGINT) AS max_count,
               CAST(SUM(CASE WHEN n > (SELECT b10 FROM b)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above_b10,
               TRUE AS topk_covers_above_boundary,
               TRUE AS topk_counts_exact
        FROM exact
    """,
    # Identical exact-integer interpolation as the engine: bracketing
    # order statistics as integer micros via a distinct-value cumulative
    # count, long-arithmetic numerator, ONE double division. quantile_cont
    # would interpolate raw doubles in a different op order than Spark's
    # percentile and can flip a rounding boundary by one ulp.
    "x_kll_anchor": """
        WITH vals AS (
            SELECT CAST(round(value * 1e6) AS BIGINT) AS m
            FROM events WHERE value IS NOT NULL
        ), counts AS (
            SELECT m, COUNT(*) AS c FROM vals GROUP BY m
        ), cum AS (
            SELECT m,
                   SUM(c) OVER (ORDER BY m) AS cum,
                   SUM(c) OVER (ORDER BY m) - c AS prev
            FROM counts
        ), ranks AS (
            SELECT (COUNT(*) - 1) // 2 + 1 AS i50,
                   (COUNT(*) - 1) % 2 AS rem2,
                   ((COUNT(*) - 1) * 9) // 10 + 1 AS i90,
                   ((COUNT(*) - 1) * 9) % 10 AS rem10
            FROM vals
        ), sel AS (
            SELECT MIN(CASE WHEN prev < i50 AND cum >= i50 THEN m END) AS lo50,
                   MIN(CASE WHEN prev < i50 + 1 AND cum >= i50 + 1 THEN m END)
                       AS hi50,
                   MIN(CASE WHEN prev < i90 AND cum >= i90 THEN m END) AS lo90,
                   MIN(CASE WHEN prev < i90 + 1 AND cum >= i90 + 1 THEN m END)
                       AS hi90,
                   MAX(rem2) AS rem2,
                   MAX(rem10) AS rem10
            FROM cum, ranks
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events,
               CAST(lo50 * 2 + rem2 * (COALESCE(hi50, lo50) - lo50)
                    AS DOUBLE) / 2e6 AS p50_exact,
               CAST(lo90 * 10 + rem10 * (COALESCE(hi90, lo90) - lo90)
                    AS DOUBLE) / 1e7 AS p90_exact,
               TRUE AS r50_ok,
               TRUE AS r90_ok
        FROM sel
    """,
    "x_theta_anchor": """
        WITH flags AS (
            SELECT o_custkey,
                   MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                       AS in_f,
                   MAX(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                       AS in_p
            FROM orders
            WHERE o_orderstatus IN ('F', 'P')
            GROUP BY o_custkey
        )
        SELECT CAST(SUM(in_f) AS BIGINT) AS n_f,
               CAST(SUM(in_p) AS BIGINT) AS n_p,
               CAST(COUNT(*) AS BIGINT) AS n_union,
               CAST(SUM(in_f * in_p) AS BIGINT) AS n_both,
               CAST(SUM(in_f * (1 - in_p)) AS BIGINT) AS n_f_only,
               TRUE AS n_f_ok,
               TRUE AS n_p_ok,
               TRUE AS n_union_ok,
               TRUE AS n_both_ok,
               TRUE AS n_f_only_ok
        FROM flags
    """,
    "x_percentile_approx_anchor": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50_qty,
               quantile_cont(l_quantity, 0.9) AS p90_qty,
               TRUE AS p50_within_tol,
               TRUE AS p90_within_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "x_stats_moments": """
        SELECT l_returnflag,
               ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
               ROUND(var_samp(l_quantity), 6) AS var_qty,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2)
                   AS covar_qty_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    # Same melt, same string renderings (both engines render
    # bigint/double/timestamp injectively, which is all COUNT(DISTINCT)
    # needs); COUNT(*) - COUNT(v) is the null counter on both sides.
    "x_column_profile": """
        WITH m AS (
            SELECT 'event_id' AS column_name, CAST(event_id AS VARCHAR) AS v FROM events
            UNION ALL SELECT 'ts', CAST(ts AS VARCHAR) FROM events
            UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
            UNION ALL SELECT 'event_type', event_type FROM events
            UNION ALL SELECT 'value', CAST(value AS VARCHAR) FROM events
            UNION ALL SELECT 'props', props FROM events
            UNION ALL SELECT 'etype_nonview', NULLIF(event_type, 'view') FROM events
        )
        SELECT column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT(v) AS n_nulls,
               COUNT(DISTINCT v) AS n_distinct
        FROM m GROUP BY column_name ORDER BY column_name
    """,
    # Exact integer mirror of the cross-multiplied 3-sigma predicate:
    # HUGEINT products in DuckDB == DECIMAL(38,0) products in Spark
    # (both exact at these magnitudes); only BIGINT/DOUBLE leave.
    "x_outliers_zscore": """
        WITH mv AS (
            SELECT event_type,
                   CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v
            FROM events
        ), stats AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
                   CAST(SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT))
                        AS HUGEINT) AS s2
            FROM mv GROUP BY event_type
        )
        SELECT mv.event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN
                       (CAST(st.n AS HUGEINT) * CAST(mv.v AS HUGEINT) - st.s)
                     * (CAST(st.n AS HUGEINT) * CAST(mv.v AS HUGEINT) - st.s)
                     > 9 * (CAST(st.n AS HUGEINT) * st.s2 - st.s * st.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               ROUND(SUM(CASE WHEN
                       (CAST(st.n AS HUGEINT) * CAST(mv.v AS HUGEINT) - st.s)
                     * (CAST(st.n AS HUGEINT) * CAST(mv.v AS HUGEINT) - st.s)
                     > 9 * (CAST(st.n AS HUGEINT) * st.s2 - st.s * st.s)
                    THEN 1 ELSE 0 END) / COUNT(*), 6) AS outlier_rate
        FROM mv JOIN stats st ON mv.event_type = st.event_type
        GROUP BY mv.event_type ORDER BY mv.event_type
    """,
    # x_approx_count_distinct / x_percentile_approx: intentionally no
    # oracle (sketch-based); exact twins are the anchors.
}
