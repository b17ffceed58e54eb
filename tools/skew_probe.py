#!/usr/bin/env python
"""Skew-join A/B at beyond-fixture scale: the fixture's uniform keys never
exercise what salting exists for, so synthesize a join with a genuinely hot
key (50% of fact rows on one user) and measure three physical strategies:

1. plain sort-merge join with AQE skew handling DISABLED -- the straggler
   baseline (one task owns the hot key);
2. plain sort-merge join with AQE skew handling ENABLED -- Spark's built-in
   answer (OptimizeSkewedJoin splits the hot partition);
3. manual salting + SHUFFLE_HASH -- the x_salted_skew_join mechanics, for
   the plans AQE cannot fix (shuffle-hash joins, aggregations over the
   joined key, engines without AQE).

    PYTHONPATH=/root/repo python tools/skew_probe.py [n_rows]

Results recorded in SCALING.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SALT = 8
N_USERS = 100_000


def synth(spark, n: int):
    """Fact: n rows, 50% on user 0, the rest uniform over N_USERS users.
    Dim: one row per user."""
    fact = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(2)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(N_USERS)))
        .alias("user_id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000)).cast("double"))
        .alias("value"),
    )
    dim = spark.range(N_USERS).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 97).cast("double").alias("weight"),
    )
    return fact.localCheckpoint(), dim.localCheckpoint()


def t(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = synth(spark, n)

    def plain():
        return fact.join(dim.hint("MERGE"), "user_id").select(
            F.sum(F.col("value") * F.col("weight")).alias("s")
        )

    def salted():
        sd = dim.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
        )
        sf = fact.withColumn(
            "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
        )
        return sf.join(sd.hint("SHUFFLE_HASH"), ["user_id", "salt"]).select(
            F.sum(F.col("value") * F.col("weight")).alias("s")
        )

    # The default skew threshold (256 MB) may not fire on a ~190 MB hot
    # partition; the "tuned" arm lowers it so AQE actually splits,
    # isolating what AQE can deliver when configured for the data.
    results = {}
    for label, skew_on, thresh, fn in (
        ("smj_aqe_skew_off", "false", None, plain),
        ("smj_aqe_skew_default", "true", None, plain),
        ("smj_aqe_skew_tuned", "true", "32MB", plain),
        ("salted_shuffle_hash", "true", None, salted),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
        if thresh:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                thresh,
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB"
            )
        else:
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        best = min(t(fn()) for _ in range(2))
        results[label] = best
        print(f"{label:>22}  {best:6.2f}s", flush=True)

    base = results["smj_aqe_skew_off"]
    print(f"\nhot-key share: 50% of {n:,} rows; salted spreads it over {SALT} tasks")
    for label, sec in results.items():
        if label != "smj_aqe_skew_off":
            print(f"{label:>22}  {base / sec:4.2f}x vs straggler baseline")


if __name__ == "__main__":
    main()
