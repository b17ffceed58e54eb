"""Graph shared-artifact A/B at ~10x scale (round-11, VERDICT r10 task 6).

No sf1 fixture exists on disk (/root/testdata tops out at sf0.1), so the
probe synthesizes the next decade: the sf0.1 orders/lineitem fact join
replicated 10x with disjoint key offsets -- ~5.9M distinct (c, s)
trading pairs vs ~590k at sf0.1. It then measures

  * the distinct trading-pair relation build (the artifact all four
    graph keys share) -- the cost each key re-paid before round 10's
    cache, and
  * one consumer pass over the cached relation (the degree groupBy --
    PageRank's per-iteration shape),

so "4 keys x rebuild" vs "1 build + 4 consumer passes" is arithmetic on
measured numbers. Usage:

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/graph_scale_ab.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("GRAPH_AB_REPLICAS", "10"))


def main() -> None:
    from pyspark.sql import functions as F

    from delta_lake_stock_pipeline_spark.session import get_spark
    from delta_lake_stock_pipeline_spark.sources.fixtures import load_table

    spark = get_spark(app_name="graph-scale-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    rep = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("rep")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.col("l_suppkey").cast("long").alias("s")
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("long").alias("c")
    )

    def build_pairs():
        """The _cs_pairs_cached shape at REPLICASx scale: fact join +
        disjoint key offsets + distinct."""
        lix = li.select(rep, "l_orderkey", "s").select(
            (F.col("l_orderkey") + F.col("rep") * F.lit(10**10)).alias("lo"),
            (F.col("s") + F.col("rep") * F.lit(10**7)).alias("s"),
            "rep",
        )
        ox = orders.select(rep, "o_orderkey", "c").select(
            (F.col("o_orderkey") + F.col("rep") * F.lit(10**10)).alias("oo"),
            (F.col("c") + F.col("rep") * F.lit(10**7)).alias("c"),
        )
        return (
            lix.join(ox, lix.lo == ox.oo).select("c", "s").distinct()
        )

    builds = []
    for i in range(2):
        t0 = time.time()
        cached = build_pairs().localCheckpoint()  # the artifact build
        builds.append(time.time() - t0)
        n = cached.count()
        print(f"build {i}: {builds[-1]:6.2f}s  ({n} distinct pairs)", flush=True)

    consumes = []
    for i in range(3):
        t0 = time.time()
        (
            cached.groupBy("s")
            .agg(F.count("*").alias("deg"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        consumes.append(time.time() - t0)
        print(f"consume {i}: {consumes[-1]:6.2f}s (degree groupBy)", flush=True)

    b = sorted(builds)[len(builds) // 2]
    c = sorted(consumes)[len(consumes) // 2]
    print(
        f"\nat {REPLICAS}x sf0.1: per-key-rebuild family = 4 x {b:.1f}s "
        f"= {4 * b:.1f}s of artifact work; shared = {b:.1f}s + 4 x {c:.1f}s "
        f"consumer passes = {b + 4 * c:.1f}s -> {4 * b / (b + 4 * c):.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
