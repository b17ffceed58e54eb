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

# Host-band reference (VERDICT r9 task 3): five fixed keys re-run 3x at
# sweep START and END in the same process; their per-key medians against
# the pinned reference seconds below land in the output JSON as "band",
# so a slow sweep is mechanically attributable to host drift (band
# factor >> 1 at both ends) vs a code regression (band ~1, individual
# keys slow) without multi-sweep forensics. The keys span the engine's
# hot paths: parquet scan + grouped agg (flagship), shuffle join
# (sort-merge), window, string/token HOFs, embedding arithmetic.
_BAND_KEYS = [
    "a0_flagship_daily_rollup",
    "j_sortmerge",
    "w_rank",
    "t_token_count",
    "v_cosine_topk",
]
# Pinned from two clean solo sf0.1/local[32] sessions (round 10,
# 2026-08-16, median-of-3 probes). The START probe always runs in the
# same state -- fresh JVM after the standard warmups, first touch of the
# big tables -- and reproducibly reads ~1.5x the fully-warm END state,
# so each position gets its own pinned reference. Re-pin only with a
# BENCH_NOTES entry.
_BAND_REF_SF = 0.1
_BAND_REF_SEC_START = {
    "a0_flagship_daily_rollup": 0.49,
    "j_sortmerge": 1.01,
    "w_rank": 0.25,
    "t_token_count": 0.34,
    "v_cosine_topk": 0.64,
}
_BAND_REF_SEC_END = {
    "a0_flagship_daily_rollup": 0.30,
    "j_sortmerge": 0.82,
    "w_rank": 0.18,
    "t_token_count": 0.21,
    "v_cosine_topk": 0.42,
}


def _band_probe(spark, queries, sf_dir: str) -> dict:
    """Median-of-3 wall seconds for each band-reference key, plus the
    band factor (median over keys of measured/pinned) when running at
    the reference SF."""
    med: dict[str, float] = {}
    for k in _BAND_KEYS:
        if k not in queries:
            continue
        runs = []
        for _ in range(3):
            t0 = time.time()
            queries[k](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
        med[k] = round(sorted(runs)[1], 3)
    return med


def _band_factor(med: dict, ref: dict) -> float | None:
    ratios = sorted(med[k] / ref[k] for k in med if k in ref)
    if not ratios:
        return None
    return round(ratios[len(ratios) // 2], 3)


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

    # Ingest-time artifacts, priced as explicit setup lines. The ANN index
    # builds (IVF k-means partitioned write, PQ codebook training, IVF-PQ
    # composite) and the dedup shingle-posting/pair materializations are
    # one-time per-corpus costs -- on a fresh host they would otherwise
    # land on whichever family key runs first (v_ann_ivf read 8.98 s in
    # BENCH_r06 purely because the sandbox /tmp was cold) and read as a
    # per-query regression. Building them here keeps per-key timings
    # meaning "warm query cost" while the build cost stays visible in the
    # JSON under "setup". Totals remain honest: suite wall includes setup.
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    t_total = time.time()
    setup: dict[str, float] = {}

    def _setup(name: str, fn) -> None:
        t0 = time.time()
        try:
            fn()
            setup[name] = round(time.time() - t0, 3)
            print(f"setup {name} {setup[name]:.2f}s", file=sys.stderr, flush=True)
        except Exception as exc:
            failures[f"setup:{name}"] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"SETUP-FAIL {name}: {exc}", file=sys.stderr, flush=True)

    names = set(queries)
    if names & {"v_ann_ivf", "v_ann_ivf_anchor", "v_ann_ivf_batch"}:
        from delta_lake_stock_pipeline_spark.operators.similarity import _ivf_index

        _setup("ann_ivf_index", lambda: _ivf_index(spark, sf_dir))
    if names & {"v_ann_pq", "v_ann_pq_anchor"}:
        from delta_lake_stock_pipeline_spark.operators.similarity import _pq_index

        _setup("ann_pq_index", lambda: _pq_index(spark, sf_dir))
    if names & {"v_ann_ivfpq", "v_ann_ivfpq_anchor"}:
        from delta_lake_stock_pipeline_spark.operators.similarity import _ivfpq_index

        _setup("ann_ivfpq_index", lambda: _ivfpq_index(spark, sf_dir))
    # Gate on the keys that actually CONSUME each artifact (not the d_
    # prefix): an isolated `SPARK_GRAFT_BENCH_ONLY=d_keep_latest` rerun
    # must not pay the posting build for an events-table query.
    posts_keys = {
        "d_ngram_jaccard",
        "d_minhash_lsh",
        "d_minhash_lsh_anchor",
        "d_dup_clusters",
        "d_dup_clusters_sql",
    }
    pairs_keys = {"d_dup_clusters", "d_dup_clusters_sql"}
    if names & posts_keys:
        from delta_lake_stock_pipeline_spark.operators.dedup import _shingle_posts

        _setup("dedup_postings", lambda: _shingle_posts(spark, sf_dir).count())
    if names & pairs_keys:
        from delta_lake_stock_pipeline_spark.operators.dedup import _dup_pairs

        _setup("dedup_pairs", lambda: _dup_pairs(spark, sf_dir))
    # Fingerprint artifact tables first (consumed by the neardup /
    # incremental / consensus keys AND by the cluster builds below, so
    # the mapInPandas decode+hash cost lands here exactly once).
    if names & {
        "m_image_neardup",
        "m_image_incremental",
        "m_av_consensus",
        "m_image_dup_clusters",
        "m_image_keeper",
    }:
        from delta_lake_stock_pipeline_spark.operators.multimodal import (
            _ahash_table,
        )

        _setup("image_fingerprints", lambda: _ahash_table(spark, sf_dir))
    if names & {
        "m_audio_neardup",
        "m_audio_incremental",
        "m_av_consensus",
        "m_audio_dup_clusters",
        "m_audio_keeper",
    }:
        from delta_lake_stock_pipeline_spark.operators.multimodal import (
            _afp_table,
        )

        _setup("audio_fingerprints", lambda: _afp_table(spark, sf_dir))
    if names & {"m_image_dup_clusters", "m_image_keeper"}:
        from delta_lake_stock_pipeline_spark.operators.multimodal import (
            _nd_clusters,
        )

        _setup("image_nd_clusters", lambda: _nd_clusters(spark, sf_dir))
    if names & {"m_audio_dup_clusters", "m_audio_keeper"}:
        from delta_lake_stock_pipeline_spark.operators.multimodal import (
            _and_clusters,
        )

        _setup("audio_nd_clusters", lambda: _and_clusters(spark, sf_dir))
    if names & {
        "m_video_neardup",
        "m_video_incremental",
        "m_video_dup_clusters",
        "m_video_keeper",
    }:
        from delta_lake_stock_pipeline_spark.operators.multimodal import (
            _vframes_table,
        )

        _setup("video_frames", lambda: _vframes_table(spark, sf_dir))
    if names & {"m_video_dup_clusters", "m_video_keeper"}:
        from delta_lake_stock_pipeline_spark.operators.multimodal import (
            _vnd_clusters,
        )

        _setup("video_nd_clusters", lambda: _vnd_clusters(spark, sf_dir))
    # The graph family shares one distinct trading-pair relation (and,
    # for the node-labeled loops, one symmetric edge list) per session
    # (round-10 optimization): price the builds once, here.
    if names & {"g_pagerank", "g_kcore", "g_bfs_hops", "g_common_neighbors"}:
        from delta_lake_stock_pipeline_spark.operators.graph import (
            _cs_pairs_cached,
        )

        _setup("trade_adjacency", lambda: _cs_pairs_cached(spark, sf_dir))
    if names & {"g_pagerank", "g_kcore", "g_bfs_hops"}:
        from delta_lake_stock_pipeline_spark.operators.graph import (
            _trade_edges_cached,
        )

        _setup("trade_edges", lambda: _trade_edges_cached(spark, sf_dir))
    # The executed-streaming replays share one (ts, event_id) tile split
    # of the events fixture per session (round-10 optimization): build it
    # here so the one-time cost doesn't land on whichever replay key runs
    # first (same pricing rationale as the ANN/dedup artifacts above).
    if names & {
        "s_cdc_upsert",
        "s_stream_dedup",
        "s_stream_sessions",
        "s_stream_join",
        "s_stream_late",
        "s_stateful_counts",
        "s_stream_enrich",
        "s_stream_topk",
        "s_stream_restart",
        "s_stream_join_outer",
    }:
        from delta_lake_stock_pipeline_spark.streaming.windows import (
            _tile_files,
        )

        _setup("stream_tiles", lambda: _tile_files(spark, sf_dir))

    band_start = _band_probe(spark, queries, sf_dir)

    t_queries = time.time()
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
    queries_wall = round(time.time() - t_queries, 3)
    band_end = _band_probe(spark, queries, sf_dir)
    total = round(time.time() - t_total, 3)

    band = {
        "start": band_start,
        "end": band_end,
        "start_factor": _band_factor(band_start, _BAND_REF_SEC_START),
        "end_factor": _band_factor(band_end, _BAND_REF_SEC_END),
        "ref_start_sec": _BAND_REF_SEC_START,
        "ref_end_sec": _BAND_REF_SEC_END,
        "ref_sf": _BAND_REF_SF,
        "ref_provenance": "two clean solo sf0.1/local[32] sessions, round 10",
    }
    if abs(sf_num if isinstance(sf_num, float) else -1) != _BAND_REF_SF:
        # Factors are only meaningful at the reference SF; medians still
        # land so any-SF sweeps stay self-describing.
        band["start_factor"] = band["end_factor"] = None

    out = {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "n_queries": len(timings),
        "n_failures": len(failures),
        # One-time ingest artifacts (ANN indexes, dedup postings) priced
        # separately so per-key timings read as warm query cost; included
        # in "value" and broken out in "queries_wall_seconds".
        "setup": setup,
        "setup_wall_seconds": round(sum(setup.values()), 3),
        "queries_wall_seconds": queries_wall,
        # Host-band attribution (VERDICT r9 task 3): see _BAND_KEYS.
        "band": band,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    from delta_lake_stock_pipeline_spark.operators.dedup import clear_posts_cache
    from delta_lake_stock_pipeline_spark.operators.formats import clear_roundtrip_dirs
    from delta_lake_stock_pipeline_spark.operators.multimodal import clear_nd_cache
    from delta_lake_stock_pipeline_spark.operators.similarity import clear_ann_dirs
    from delta_lake_stock_pipeline_spark.operators.storage_lifecycle import (
        clear_lifecycle_dirs,
    )
    from delta_lake_stock_pipeline_spark.streaming.windows import clear_mv_dirs

    clear_roundtrip_dirs()
    clear_lifecycle_dirs()
    clear_posts_cache()
    clear_nd_cache()
    clear_mv_dirs()
    clear_ann_dirs()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
