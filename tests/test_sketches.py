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
    # DataSketches HLL_4 happens to be exact in its sparse regime today, but
    # that is an implementation detail -- assert only the documented ~2%
    # relative error (with a small absolute slack so tiny cardinalities
    # don't demand bit-exactness across Spark/DataSketches upgrades).
    for got, label in ((whole, "whole"), (merged, "merged")):
        for et, n_exact in exact.items():
            assert abs(got[et] - n_exact) <= max(2, 0.02 * n_exact), (
                label, et, got[et], n_exact,
            )


def test_minhash_lsh_sound_and_recalls_high_jaccard_pairs(spark, sf_dir):
    """MinHash+LSH anchor vs the exact inverted-index query: every verified
    LSH pair must BE an exact near-dup pair (soundness -- candidates are
    verified with the same exact Jaccard), and every exact pair with
    J >= 0.8 must be captured (4 bands x 4 rows give ~0.99 capture there;
    both queries are hash-deterministic so this is stable, not flaky)."""
    from delta_lake_stock_pipeline_spark.operators import dedup

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert lsh <= set(exact), f"unsound LSH pairs: {lsh - set(exact)}"
    high = {p for p, j in exact.items() if j >= 0.8}
    assert high <= lsh, f"missed high-similarity pairs: {high - lsh}"


def test_theta_set_algebra_matches_exact_and_merges(spark):
    """Theta-sketch set algebra on the order-status audiences: (a) sharded
    partials merged with theta_union_agg estimate the same as one-pass
    sketches; (b) union/intersection/difference estimates sit within the
    2% anchor tolerance of exact recomputation (exact mode at this
    cardinality with lgK=15, but assert only the documented tolerance)."""
    from delta_lake_stock_pipeline_spark.operators.aggregates import _THETA_LGK

    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderstatus").isin("F", "P")
    )

    def conditional_sketch(status):
        return F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == status, F.col("o_custkey")),
            _THETA_LGK,
        )

    # Sharded build: per-shard partial sketches, merged with theta_union_agg.
    partials = orders.withColumn(
        "shard", (F.col("o_orderkey") % 4).cast("int")
    ).groupBy("shard").agg(
        conditional_sketch("F").alias("sk_f"), conditional_sketch("P").alias("sk_p")
    )
    merged = partials.agg(
        F.theta_union_agg("sk_f", _THETA_LGK).alias("sk_f"),
        F.theta_union_agg("sk_p", _THETA_LGK).alias("sk_p"),
    )
    ests = merged.select(
        F.theta_sketch_estimate(F.theta_union("sk_f", "sk_p")).alias("e_union"),
        F.theta_sketch_estimate(F.theta_intersection("sk_f", "sk_p")).alias(
            "e_inter"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk_f", "sk_p")).alias(
            "e_diff"
        ),
    ).collect()[0]

    flags = orders.groupBy("o_custkey").agg(
        F.max((F.col("o_orderstatus") == "F").cast("int")).alias("in_f"),
        F.max((F.col("o_orderstatus") == "P").cast("int")).alias("in_p"),
    )
    ex = flags.agg(
        F.count("*").alias("n_union"),
        F.sum(F.col("in_f") * F.col("in_p")).alias("n_both"),
        F.sum(F.col("in_f") * (1 - F.col("in_p"))).alias("n_f_only"),
    ).collect()[0]

    # Intersection/difference tolerance scales with the UNION (their error
    # tracks the shared retained-sample space, not the result size) -- the
    # same rule the x_theta_anchor booleans use.
    for est, exact, scale in (
        (ests["e_union"], ex["n_union"], ex["n_union"]),
        (ests["e_inter"], ex["n_both"], ex["n_union"]),
        (ests["e_diff"], ex["n_f_only"], ex["n_union"]),
    ):
        assert abs(est - exact) <= max(2, 0.02 * scale), (est, exact)


def test_kll_merge_of_daily_partials_tracks_whole(spark):
    """The daily-rollup KLL algebra: quantiles from per-day sketches folded
    with the scalar merge must track both the one-shot sketch and the exact
    quantiles within the rank tolerance the x_kll_anchor pins (0.04)."""
    from delta_lake_stock_pipeline_spark.operators.aggregates import (
        KLL_FOLD_EXPR,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    whole = ev.agg(F.kll_sketch_agg_double("value", F.lit(200)).alias("ska"))
    merged = (
        ev.groupBy("day")
        .agg(F.kll_sketch_agg_double("value", F.lit(200)).alias("sk"))
        .agg(F.collect_list("sk").alias("sks"))
        .select(F.expr(KLL_FOLD_EXPR).alias("ska"))
    )
    vals = sorted(r["value"] for r in ev.select("value").collect())

    def rank(v):
        return sum(1 for x in vals if x <= v) / len(vals)

    for sk_df in (whole, merged):
        est = sk_df.select(
            F.kll_sketch_get_quantile_double("ska", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("ska", F.lit(0.9)).alias("p90"),
        ).collect()[0]
        assert abs(rank(est["p50"]) - 0.5) <= 0.04, est
        assert abs(rank(est["p90"]) - 0.9) <= 0.04, est


def test_rolling_mau_window_is_calendar_days_not_rows(spark, tmp_path):
    """Regression (round-4 review): with a >28-day gap between active days,
    a ROWS(-27,0) window over observed days would still merge the old
    sketch and overcount; the RANGE frame over the day ordinal must not.
    Exercises the real operator against a synthetic events dir."""
    import datetime as dt

    from delta_lake_stock_pipeline_spark.operators.aggregates import (
        rolling_mau_anchor,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1, 12, 0, 0), i, "click", 1.0, "{}")
        for i in range(100)
    ] + [(1000, dt.datetime(2024, 2, 15, 12, 0, 0), 200, "click", 1.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "mau")
    df.write.parquet(f"{d}/events.parquet")
    got = {
        str(r.day): (r.mau_exact, r.mau_ok)
        for r in rolling_mau_anchor(spark, d).collect()
    }
    assert got == {"2024-01-01": (100, True), "2024-02-15": (1, True)}
