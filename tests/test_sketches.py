"""Mergeable-sketch algebra: the property that makes sketch columns a
storable rollup primitive at scale -- the union of per-partition sketches
must estimate the same cardinality as one sketch over the whole input (and
at fixture cardinality, HLL is exact, so both must equal COUNT(DISTINCT)).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_stock_pipeline_spark.sources.fixtures import load_table

from conftest import SF_DIR


def test_hll_union_of_partials_equals_whole(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    whole = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n"))
        .collect()
    }
    # Daily-rollup algebra: sketch per (group, shard), union, estimate.
    partials = ev.withColumn("shard", (F.col("event_id") % 4).cast("int")).groupBy(
        "event_type", "shard"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        r["event_type"]: r["n"]
        for r in partials.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()
    }
    # Below the HLL_4 sparse/exact regime the sketch is exact; above it
    # (larger SF_DIR overrides) allow the documented ~2% estimation error.
    for got, label in ((whole, "whole"), (merged, "merged")):
        for et, n_exact in exact.items():
            if n_exact <= 1000:
                assert got[et] == n_exact, (label, et, got[et], n_exact)
            else:
                assert abs(got[et] - n_exact) <= 0.02 * n_exact, (
                    label, et, got[et], n_exact,
                )
