#!/usr/bin/env python
"""A/B scaling benchmark: scatter-to-frames trailing mean vs the classic
type-partitioned window, on synthetic events with a LOW-cardinality
partition key (3 types -- the shape that caps a partitioned window at 3
tasks regardless of cluster size).

    PYTHONPATH=/root/repo python tools/ma_scaling_bench.py [rows ...]

The verdict asked for a measured demonstration (not an assertion) that the
round-3 re-plan's k-times row multiplier is the right trade against the
3-partition parallelism cap. Rows are synthesized JVM-side (spark.range),
so the sweep scales past the fixture sizes.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from delta_lake_stock_pipeline_spark.operators.windows import (  # noqa: E402
    trailing_mean_rows,
)

K = 3
N_TYPES = 3


def synth(spark, n: int):
    """n events over N_TYPES types, unique (ts, event_id) per type."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("t"), (F.col("id") % N_TYPES).cast("string")).alias(
                "event_type"
            ),
            F.col("id").alias("event_id"),
            # Deterministic pseudo-times: distinct per row within a type.
            (F.col("id") * 37 % 1_000_000_007).alias("ts"),
            ((F.col("id") * 7919) % 1_000_000).alias("micros"),
        )
    )


def run_partitioned_window(df) -> int:
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(K - 1), 0)
    )
    out = df.select(
        "event_type",
        "event_id",
        (F.sum("micros").over(w).cast("double") / F.count("*").over(w)).alias("ma"),
    )
    return out.select(F.count("*"), F.sum(F.hash("event_id", "ma"))).collect()[0][0]


def run_scatter(df) -> int:
    # scatter_min_rows_per_key=0 forces the scatter decomposition -- the
    # hybrid would otherwise take the plain-window path at these sizes and
    # the A/B would compare window vs window.
    out = trailing_mean_rows(df, k=K, n_partitions=32, scatter_min_rows_per_key=0)
    return out.select(F.count("*"), F.sum(F.hash("event_id", "ma"))).collect()[0][0]


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ma-scaling")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"| rows | partitioned window (s) | scatter-to-frames (s) |")
    print(f"|---|---|---|")
    for n in sizes:
        df = synth(spark, n).localCheckpoint()  # pin input; exclude synth cost
        # Warm both paths once at the smallest size to amortize codegen.
        times = {}
        for name, fn in (("window", run_partitioned_window), ("scatter", run_scatter)):
            best = min(_timed(fn, df) for _ in range(3))
            times[name] = best
        print(f"| {n:,} | {times['window']:.2f} | {times['scatter']:.2f} |", flush=True)
        df.unpersist()
    spark.stop()


def _timed(fn, df) -> float:
    t0 = time.time()
    fn(df)
    return time.time() - t0


if __name__ == "__main__":
    main()
