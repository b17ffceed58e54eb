"""Phase-level timing probe for the executed-streaming replay keys.

Replicates the key's exact flow (tile split -> source-file writes ->
availableNow replay -> read-back) with a wall-clock timer per phase, so
the optimization work targets the measured phase, not a guess. Usage:

    PYTHONPATH=. SPARK_GRAFT_CPUS=32 python tools/stream_phase_probe.py \
        [sf_dir] 2>/dev/null
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from delta_lake_stock_pipeline_spark.session import (  # noqa: E402
    get_spark,
    scratch_mkdtemp,
)
from delta_lake_stock_pipeline_spark.sources.fixtures import load_table  # noqa: E402
from delta_lake_stock_pipeline_spark.streaming import runtime, windows  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stream-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    spark.range(100).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def phase(name, t0):
        t1 = time.time()
        print(f"  {name:30s} {t1 - t0:6.2f}s", flush=True)
        return t1

    for trial, n_part in enumerate([4, 4, 2, 1]):
        print(f"--- s_stream_late replay, shuffle_partitions={n_part} "
              f"(trial {trial}) ---", flush=True)
        scratch = scratch_mkdtemp(prefix="probe_late_")
        src = os.path.join(scratch, "src")
        out = os.path.join(scratch, "out")
        ckpt = os.path.join(scratch, "ckpt")
        t0 = time.time()
        events = load_table(spark, sf_dir, "events")
        b1, b2, b3 = windows._time_tiles(events, ["ts", "event_id"])
        t0 = phase("tile split (ntile+lckpt)", t0)
        min_ts, max_ts = events.agg(F.min("ts"), F.max("ts")).collect()[0]
        b2.agg(F.max("ts")).collect()
        t0 = phase("span collects", t0)
        late = spark.createDataFrame(
            [
                (2 * 10**9 + i, min_ts, 999_000 + i, "purchase", 77.77, "{}")
                for i in range(7)
            ],
            events.schema,
        )
        sentinels = [
            spark.createDataFrame(
                [
                    (
                        10**9 + i,
                        max_ts + datetime.timedelta(days=days),
                        10**9 + i,
                        "click",
                        0.0,
                        "{}",
                    )
                ],
                events.schema,
            )
            for i, days in enumerate([40, 80])
        ]
        windows._write_ordered_files(
            [b1, b2, b3.unionByName(late)] + sentinels, src
        )
        t0 = phase("source-file writes (5)", t0)
        with windows._replay_shuffle_partitions(spark, n_part):
            runtime.run_available_now(
                runtime.tumbling_counts(runtime.events_stream(spark, src)),
                ckpt,
                out,
            )
        t0 = phase("availableNow replay", t0)
        (
            spark.read.parquet(out)
            .filter(F.col("window_start") <= F.lit(max_ts))
            .select("window_start", "event_type", "n_events", "total_value")
            .orderBy("window_start", "event_type")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t0 = phase("read-back + noop", t0)
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
