"""Operator/query registry.

Each operator module exposes:

* public query functions ``(spark: SparkSession, sf_dir: str) -> DataFrame``
* ``QUERIES: dict[str, fn]`` -- registry entries, keyed by SURVEY.md SS2
  inventory ids (``a1_...``, ``o4_...``, ``j_...``)
* ``ORACLES: dict[str, str]`` -- DuckDB-runnable ANSI SQL per key; keys
  missing here are checked rows-only by the driver (non-SQL-expressible ops).

``all_queries()`` / ``all_oracles()`` aggregate every module for
``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import streaming
from . import (
    aggregates,
    curation,
    dedup,
    formats,
    functions_ext,
    graph,
    joins,
    multimodal,
    relational,
    reshape,
    scale,
    similarity,
    storage_lifecycle,
    subqueries,
    text,
    tpch,
    udfs,
    windows,
)

_MODULES = [
    relational,
    aggregates,
    formats,
    functions_ext,
    joins,
    tpch,
    subqueries,
    scale,
    graph,
    reshape,
    windows,
    text,
    dedup,
    curation,
    similarity,
    multimodal,
    storage_lifecycle,
    udfs,
    streaming,
]

QueryFn = Callable[[SparkSession, str], DataFrame]

# How many registry-order keys the external driver verifies per round.
# The ONE definition — the pytest gate and tools/predriver_check.py both
# import it, so the window size cannot drift between the two mirrors.
DRIVER_WINDOW_SIZE = 50

# The external driver verifies only the FIRST 50 keys of queries() in
# registry order (verified round 3: CORRECTNESS_r03's keys == the first 50).
# Rotate the window each round so every key eventually gets a driver-side
# correctness row. Round-8 window (per VERDICT r7 task 1): the 9 oracled
# keys added past round 7's 50 slots (never driver-checked -- the list the
# rotation-policy test named), then g_pagerank (re-proof: its plan changes
# this round, VERDICT r7 task 2 drops the forced |V|-broadcasts), then the
# oldest green rows in ledger order (the r2/r3-era j/p/f/o/u/fn/a/x
# blocks). Round-8 additions displace freshness slots from the tail, per
# the policy below. All 50 are DuckDB-oracled (rows-only keys are excluded
# by policy: their guarantees are driver-witnessed through oracled anchor
# twins). Rotation history: ROUND4_NOTES.md, ROUND6_NOTES.md,
# ROUND7_NOTES.md, ROUND8_NOTES.md.
_DRIVER_WINDOW_ROTATION = [
    # --- 9 round-7 additions past the r7 window: never driver-checked ---
    "g_common_neighbors",
    "g_kcore",
    "g_bfs_hops",
    "t_pii_redaction",
    "t_novelty",
    "v_mmr_select",
    "m_image_ahash",
    "m_audio_fingerprint",
    "x_weighted_median",
    # --- re-proof: pagerank_core loses its forced |V|-broadcasts this
    # round (VERDICT r7 task 2); prove the new plan driver-side ---
    "g_pagerank",
    # --- round-8 additions (each displaced a tail freshness slot, per
    # the rotation policy: never-checked oracled keys outrank re-proofs)
    "d_substring_dedup",
    "d_url_canonical",
    "d_substring_top",
    "s_interval_join_outer",
    "d_containment_pairs",
    "d_cluster_keeper",
    "h_null_aware_anti",
    "d_incremental_neardup",
    # --- freshness re-proofs: oldest green driver rows, ledger order ---
    "j_theta_binned",
    "p1_projection",
    "p4_derived_projection",
    "p5_field_mapping",
    "f_filter_eq",
    "f_filter_range",
    "f_filter_compound",
    "f_filter_isin",
    "f_filter_null",
    "o1_sort_single",
    "o2_sort_multi",
    "o4_topk",
    "u_set_union",
    "u_set_intersect",
    "u_set_except",
    "fn_json_extract",
    "fn_variant_json",
    "fn_string_funcs",
    "a0_flagship_daily_rollup",
    "a1_group_count",
    "a2_group_count_date",
    "a3_a5_global_stats",
    "a4_distinct_count",
    "a6_daily_envelope",
    "a7_volume_summary",
    "x_rollup",
    "x_time_rollup",
    "x_grouping_sets",
    "x_cube",
    "x_count_distinct",
    "x_bitmap_distinct",
    "x_percentile",
]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        dupes = set(out) & set(mod.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query keys {dupes} in {mod.__name__}")
        out.update(mod.QUERIES)
    missing = [k for k in _DRIVER_WINDOW_ROTATION if k not in out]
    if missing:
        raise ValueError(f"rotation names unknown query keys: {missing}")
    rotated = {k: out[k] for k in _DRIVER_WINDOW_ROTATION}
    rotated.update((k, v) for k, v in out.items() if k not in rotated)
    return rotated


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
