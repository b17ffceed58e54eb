"""Benchmark harness: run every registered query end-to-end and print ONE
JSON line for the driver (BENCH_r{N}.json).

Usage: python bench.py
  * data:    $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  * master:  local[$SPARK_GRAFT_CPUS] (default local[*])

Each query is forced through full execution with the ``noop`` sink (count()
alone would let Catalyst prune projected expressions and under-report).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from delta_lake_stock_pipeline_spark.operators import all_queries
    from delta_lake_stock_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"bench-sf{sf}")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        prefixes = tuple(only.split(","))
        queries = {k: v for k, v in queries.items() if k.startswith(prefixes)}

    # Warm the JVM and the Python-UDF worker pool once so per-query timings
    # measure the query, not session bring-up (~20 s of fork+Arrow init
    # otherwise lands on whichever query first touches mapInPandas).
    spark.range(100).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # Also warm the parquet-scan + shuffle-exchange path (codegen compile,
    # AQE first use) on the smallest table so it doesn't land on the
    # alphabetically-first query.
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").count().write.format(
        "noop"
    ).mode("overwrite").save()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    t_total = time.time()
    for name in sorted(queries):
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            print(f"ok   {name} {timings[name]:.2f}s", file=sys.stderr, flush=True)
        except Exception as exc:  # keep benching; report the failure
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"FAIL {name}: {failures[name]}", file=sys.stderr, flush=True)
    total = round(time.time() - t_total, 3)

    out = {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "n_queries": len(timings),
        "n_failures": len(failures),
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    from delta_lake_stock_pipeline_spark.operators.dedup import clear_posts_cache
    from delta_lake_stock_pipeline_spark.operators.formats import clear_roundtrip_dirs
    from delta_lake_stock_pipeline_spark.operators.storage_lifecycle import (
        clear_lifecycle_dirs,
    )

    clear_roundtrip_dirs()
    clear_lifecycle_dirs()
    clear_posts_cache()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
