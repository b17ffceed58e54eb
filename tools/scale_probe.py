#!/usr/bin/env python
"""Beyond-fixture scale probe: synthesize `events` and `documents` tables at
10-160x the sf0.1 fixture size -- JVM-side (spark.range + hash columns, no
driver loop), written as parquet in the fixture directory layout -- then time
the UNMODIFIED query functions against the synthetic dirs. The point is to
MEASURE the linearity the scale design claims, on the exact code path the
bench and driver run (including the parquet scan), past where the fixtures
stop.

    PYTHONPATH=/root/repo python tools/scale_probe.py            # full sweep
    PYTHONPATH=/root/repo python tools/scale_probe.py --quick    # smallest size only

Synthesis is deterministic (xxhash64-keyed), zipf-ish for tokens (40% of
draws from a 50-word head — residues 0-1 of 5 — the rest over a 1950-word
tail) so the text operators see a realistic frequency skew. Events average
~20 per user so sessionization has real per-user streams.
"""

from __future__ import annotations

import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

BASE = "/tmp/scale_probe"
EVENT_SIZES = [1_000_000, 4_000_000, 16_000_000]
DOC_SIZES = [100_000, 400_000]
DOC_WORDS = 80
# 10x / 40x the sf0.1 embeddings table (2000 vectors, 10 labels). Labels
# scale WITH the corpus so blocks stay ~200 vectors -- the production
# stance (SemDeDup cluster count grows with corpus size); a fixed label
# count would make the blocked pair graph quadratic by construction and
# measure nothing but that choice.
EMB_SIZES = [20_000, 80_000]
EMB_BLOCK = 200
EMB_DIM = 64

_TYPES = ["click", "view", "purchase", "signup", "error"]
_SOURCES = ["wiki", "web", "books", "code", "news"]


def synth_events(spark, n: int, out: str) -> None:
    """n events, ~20 per user, 5 types, 90 days of microsecond timestamps."""
    day_us = 86_400 * 1_000_000
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(90 * day_us))
            ).alias("ts"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(max(n // 20, 1))).alias(
                "user_id"
            ),
            F.element_at(
                F.array(*[F.lit(t) for t in _TYPES]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(5)) + 1).cast(
                    "int"
                ),
            ).alias("event_type"),
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(1_000_000)).cast(
                    "double"
                )
                / 1000.0
            ).alias("value"),
            F.lit('{"synthetic": true}').alias("props"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )


def synth_documents(spark, n: int, out: str) -> None:
    """n documents of DOC_WORDS tokens with a zipf-ish head/tail split."""
    # Per (doc, position) hash drives both the head/tail choice and the
    # word index; all JVM expressions, no Python per row.
    idx = (
        "transform(sequence(1, {w}), i -> "
        " case when pmod(xxhash64(id, i, 5), 5) < 2"
        "      then concat('h', pmod(xxhash64(id, i, 6), 50))"
        "      else concat('t', pmod(xxhash64(id, i, 7), 1950)) end)"
    ).format(w=DOC_WORDS)
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(F.expr(idx), " ").alias("text"),
            F.lit("en").alias("lang"),
            F.element_at(
                F.array(*[F.lit(s) for s in _SOURCES]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(8)), F.lit(5)) + 1).cast(
                    "int"
                ),
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .write.mode("overwrite")
        .parquet(out)
    )


def synth_embeddings(spark, n: int, out: str) -> None:
    """n unit-scale 64-dim float vectors, labels sized for ~EMB_BLOCK-row
    blocks, same schema as the fixture (vec_id BIGINT, embedding FLOAT[],
    label INT)."""
    vec = (
        "transform(sequence(1, {d}), i -> "
        " cast(pmod(xxhash64(id, i, 10), 200001) / 100000.0 - 1.0 as float))"
    ).format(d=EMB_DIM)
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(vec).alias("embedding"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(9)), F.lit(max(n // EMB_BLOCK, 1)))
            .cast("int")
            .alias("label"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )


def time_query(fn, spark, sf_dir: str, n_runs: int = 2, setup=None) -> float:
    """Best-of-n. ``setup`` runs before EVERY timed run (not once per
    call) so a run cannot reuse state the previous run materialized --
    the d-family's persisted posting/signature caches would otherwise
    make run 2 price a cached read instead of the full build."""
    best = float("inf")
    for _ in range(n_runs):
        if setup is not None:
            setup()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    quick = "--quick" in sys.argv
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from delta_lake_stock_pipeline_spark.operators import all_queries

    q = all_queries()
    event_keys = ["a0_flagship_daily_rollup", "w_sessionize", "w_ewma"]
    doc_keys = [
        "t_tfidf",
        "t_bm25",
        "t_winnow",
        "c_contamination",
        "d_exact_summary",
        "d_minhash_lsh",
    ]

    event_sizes = EVENT_SIZES[:1] if quick else EVENT_SIZES
    doc_sizes = DOC_SIZES[:1] if quick else DOC_SIZES

    results: dict[str, list[tuple[int, float]]] = {}
    try:
        for n in event_sizes:
            d = f"{BASE}/events_{n}"
            synth_events(spark, n, f"{d}/events.parquet")
            for k in event_keys:
                sec = time_query(q[k], spark, d)
                results.setdefault(k, []).append((n, sec))
                print(f"{k:>20} n={n:>10,}  {sec:6.2f}s", flush=True)
            shutil.rmtree(d, ignore_errors=True)
        from delta_lake_stock_pipeline_spark.operators import dedup

        for n in doc_sizes:
            d = f"{BASE}/docs_{n}"
            synth_documents(spark, n, f"{d}/documents.parquet")
            for k in doc_keys:
                # The d-family session-caches its posting/signature tables
                # per (session, dir); clearing before EVERY timed run makes
                # each run price the full build, and clearing after each
                # size keeps persisted blocks from occupying executor
                # memory once the size is done.
                sec = time_query(q[k], spark, d, setup=dedup.clear_posts_cache)
                results.setdefault(k, []).append((n, sec))
                print(f"{k:>20} n={n:>10,}  {sec:6.2f}s", flush=True)
            dedup.clear_posts_cache()
            shutil.rmtree(d, ignore_errors=True)

        emb_keys = [
            "v_cosine_topk",
            "v_pairwise_neardup",
            "v_semantic_dedup",
            "v_ann_lsh",
            "v_ann_ivf",
            # PQ caches its codebooks per (session, dir) like IVF: run 1
            # prices train+encode, run 2 the ADC scoring path; best-of-2
            # reports the sustained serving cost.
            "v_ann_pq",
        ]
        emb_sizes = EMB_SIZES[:1] if quick else EMB_SIZES
        for n in emb_sizes:
            d = f"{BASE}/emb_{n}"
            synth_embeddings(spark, n, f"{d}/embeddings.parquet")
            for k in emb_keys:
                # v_ann_ivf caches its trained index per (session, dir), so
                # run 1 prices train+build and run 2 the probe path;
                # best-of-2 therefore reports the sustained-QPS probe cost
                # (the build amortizes at ingest in production).
                sec = time_query(q[k], spark, d)
                results.setdefault(k, []).append((n, sec))
                print(f"{k:>20} n={n:>10,}  {sec:6.2f}s", flush=True)
            shutil.rmtree(d, ignore_errors=True)

        print("\nGrowth ratios (time ratio per size step):")
        for k, rows in results.items():
            parts = []
            for (n0, t0), (n1, t1) in zip(rows, rows[1:]):
                parts.append(f"{n1 // n0}x rows -> {t1 / t0:.2f}x time")
            print(f"{k:>20}  " + ("; ".join(parts) or "(single size)"))
    finally:
        shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
