#!/usr/bin/env python
"""Streaming throughput probe: push N synthetic events (scale_probe's
deterministic generator, written as many files so the file source has
real micro-batches) through three streaming operator classes with
``availableNow`` + checkpoint, and report end-to-end rows/s:

* tumbling watermark agg  (JVM state, the bread-and-butter shape)
* dedup-within-watermark  (JVM keyed state, one row per event_id)
* applyInPandasWithState  (Arrow Python stateful -- the escape hatch tax)

    PYTHONPATH=/root/repo python tools/stream_probe.py [--quick]

The number is end-to-end wall over total rows, INCLUDING micro-batch
scheduling -- the honest sustained-ingest figure a capacity plan needs,
not a per-batch peak. maxFilesPerTrigger is lifted to 8 here (the
operator default of 1 is for deterministic tests; a throughput run wants
fuller micro-batches).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BASE = tempfile.mkdtemp(prefix="stream_probe_")
N = 2_000_000
FILES = 32


def main() -> None:
    from pyspark.sql import SparkSession

    from delta_lake_stock_pipeline_spark.streaming import runtime
    from tools.scale_probe import synth_events

    quick = "--quick" in sys.argv
    n = N // 10 if quick else N
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = f"{BASE}/events.parquet"
    synth_events(spark, n, src)
    # re-write as FILES files so the stream has real micro-batches
    spark.read.parquet(src).repartition(FILES).write.mode("overwrite").parquet(
        f"{BASE}/src"
    )

    def stream():
        return (
            spark.readStream.schema(runtime.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .parquet(f"{BASE}/src")
        )

    cases = [
        ("tumbling watermark agg", lambda: runtime.tumbling_counts(stream()), "append"),
        (
            "dedup within watermark",
            lambda: runtime.dedup_within_watermark(stream()),
            "append",
        ),
        (
            "applyInPandasWithState",
            lambda: runtime.running_user_counts(stream()),
            "update",
        ),
    ]
    try:
        for label, build, mode in cases:
            ckpt = f"{BASE}/ckpt_{label.replace(' ', '_')}"
            t0 = time.time()
            q = (
                build()
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            el = time.time() - t0
            print(
                f"{label:24s} {n:,} rows in {el:6.1f}s -> {n / el / 1e6:.2f}M rows/s",
                flush=True,
            )
    finally:
        shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
