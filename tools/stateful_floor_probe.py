"""applyInPandasWithState API-floor probe (round-11, VERDICT r10 task 7).

Replays the SAME three time-ordered event tiles through four
availableNow streaming queries of decreasing work, isolating where
s_stateful_counts' seconds go:

  A. passthrough   -- file stream -> select -> foreachBatch parquet
                      append (no shuffle, no state): the replay tax.
  B. builtin-agg   -- update-mode groupBy(user_id).count() (JVM state
                      store, no Python): + shuffle + state-store tax.
  C. noop-state    -- applyInPandasWithState whose function returns one
                      CONSTANT row per group without touching state or
                      the input: + per-group Python call + emission tax.
  D. real operator -- runtime.running_user_micros (what the key runs).

C-B is the per-group pandas-call floor the API imposes at this group
cardinality; D-C is the actual state work. Usage:

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/stateful_floor_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from delta_lake_stock_pipeline_spark.session import get_spark, scratch_mkdtemp
    from delta_lake_stock_pipeline_spark.streaming import runtime
    from delta_lake_stock_pipeline_spark.streaming.windows import (
        _replay_shuffle_partitions,
        _tile_files,
        _write_ordered_files,
    )

    spark = get_spark(app_name="stateful-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm python-worker + streaming machinery once so the first variant
    # doesn't carry bring-up.
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def replay(tag, build):
        scratch = scratch_mkdtemp(prefix=f"spark_floor_{tag}_")
        src = os.path.join(scratch, "src")
        out = os.path.join(scratch, "out")
        ckpt = os.path.join(scratch, "ckpt")
        _write_ordered_files(_tile_files(spark, SF_DIR), src)
        t0 = time.time()
        with _replay_shuffle_partitions(spark):
            runtime.run_available_now(
                build(runtime.events_stream(spark, src)),
                ckpt,
                out,
                output_mode="update",
            )
        dt = time.time() - t0
        n = spark.read.parquet(out).count()
        print(f"{tag:<12} {dt:6.2f}s  ({n} rows committed)", flush=True)
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
        return dt

    def passthrough(stream):
        return stream.select("user_id", "event_id")

    def builtin_agg(stream):
        return (
            stream.withWatermark("ts", runtime.WATERMARK_DELAY)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
        )

    def noop_state_fn(key, batches, state):
        for _ in batches:
            pass
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [0]})

    def noop_state(stream):
        return (
            stream.withWatermark("ts", runtime.WATERMARK_DELAY)
            .select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                noop_state_fn,
                outputStructType="user_id LONG, n_events LONG",
                stateStructType="n LONG",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    results = {}
    for trial in range(2):
        print(f"--- trial {trial}")
        results.setdefault("A_passthrough", []).append(
            replay("passthrough", passthrough)
        )
        results.setdefault("B_builtin", []).append(replay("builtin", builtin_agg))
        results.setdefault("C_noopstate", []).append(replay("noopstate", noop_state))
        results.setdefault("D_real", []).append(
            replay("real", runtime.running_user_micros)
        )
    print("\nmedians:")
    for k, v in results.items():
        print(f"  {k}: {sorted(v)[len(v) // 2]:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
