#!/usr/bin/env python
"""Measured evidence for OPTIMIZE sort-clustering: writes the same table
in (a) arrival-order layout and (b) the `storage.maintenance.optimize`
shape (`repartitionByRange(col).sortWithinPartitions(col)`), then counts
-- directly from the parquet footers, engine-independent -- how many row
groups a selective range predicate can skip via min/max zone maps.

    PYTHONPATH=/root/repo python tools/cluster_probe.py

Local wall times converge once the page cache is warm (IO is free on
/tmp); the honest 100 TB metric is the MUST-SCAN fraction, which is what
cold object storage charges for. Round-6 measurement: 8M rows, 0.0625%
selectivity -> random layout must scan 32/32 row groups (100%),
clustered 1/32 (3.3%) -- a 30x scan reduction from layout alone.
"""

from __future__ import annotations

import glob
import shutil
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

BASE = "/tmp/cluster_probe"
N = 8_000_000
LO, HI = 50_000.0, 50_500.0


def zone_map(path: str, label: str) -> None:
    total = hit = rows_total = rows_hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        ci = names.index("value")
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = g.column(ci).statistics
            total += 1
            rows_total += g.num_rows
            if st is None or (st.min < HI and st.max >= LO):
                hit += 1
                rows_hit += g.num_rows
    print(
        f"{label}: row-groups {hit}/{total} overlap -> must-scan rows "
        f"{rows_hit:,}/{rows_total:,} ({100 * rows_hit / rows_total:.1f}%)",
        flush=True,
    )


def must_scan(path: str, preds: list[tuple[str, float, float]]):
    """(hit_groups, total_groups, hit_rows, total_rows) for a conjunction
    of range predicates, judged purely from footer min/max."""
    total = hit = rows_total = rows_hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            total += 1
            rows_total += g.num_rows
            keep = True
            for col, lo, hi in preds:
                st = g.column(names.index(col)).statistics
                if st is not None and (st.min >= hi or st.max < lo):
                    keep = False
                    break
            if keep:
                hit += 1
                rows_hit += g.num_rows
    return hit, total, rows_hit, rows_total


def zorder_2d(spark) -> None:
    """2-D variant (``--zorder``): single-column sort vs Morton z-order
    (`storage.maintenance.zorder_key`) under box / single-axis range
    predicates. Round-6 measurement (8M rows, 5%-per-axis ranges):
    x-sorted layout must scan 9.5% for x-predicates but 100% for
    y-predicates; z-order bounds EVERY axis (box 22.6%, y-only 31.7%,
    x-only 59.7%). Single-column sort wins iff queries always filter that
    column; z-order is the insurance policy when predicates vary."""
    from pyspark.sql import functions as F

    from delta_lake_stock_pipeline_spark.storage.maintenance import zorder_key

    base = f"{BASE}/zab"
    df = spark.range(N).select(
        (
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)).cast("double")
            / 1000.0
        ).alias("x"),
        (
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)).cast("double")
            / 1000.0
        ).alias("y"),
    )
    df.repartitionByRange(32, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(f"{base}/xsort")
    zk = zorder_key(df, ["x", "y"], bits=8)
    (
        df.withColumn("__z", zk)
        .repartitionByRange(32, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(f"{base}/zorder")
    )
    box = [("x", 500.0, 550.0), ("y", 500.0, 550.0)]
    for path, label in ((f"{base}/xsort", "x-sorted"), (f"{base}/zorder", "z-order ")):
        for preds, plabel in (
            (box, "box(x,y)"),
            (box[1:], "y-only  "),
            (box[:1], "x-only  "),
        ):
            h, t, rh, rt = must_scan(path, preds)
            print(
                f"{label} {plabel}: row-groups {h}/{t}, "
                f"must-scan {100 * rh / rt:.1f}%",
                flush=True,
            )


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)
    if "--zorder" in sys.argv:
        try:
            zorder_2d(spark)
        finally:
            shutil.rmtree(BASE, ignore_errors=True)
        return
    df = spark.range(N).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double") / 10.0).alias(
            "value"
        ),
    )
    df.write.mode("overwrite").parquet(f"{BASE}/random")
    (
        df.repartitionByRange(32, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(f"{BASE}/clustered")
    )
    try:
        zone_map(f"{BASE}/random", "random layout  ")
        zone_map(f"{BASE}/clustered", "clustered (opt)")
        for sub, label in (("random", "random layout  "), ("clustered", "clustered (opt)")):
            d = spark.read.parquet(f"{BASE}/{sub}").filter(
                (F.col("value") >= LO) & (F.col("value") < HI)
            )
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                d.count()
                best = min(best, time.time() - t0)
            print(f"{label}: best-of-3 filter-count {best:.2f}s", flush=True)
    finally:
        shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
