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


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        dupes = set(out) & set(mod.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query keys {dupes} in {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
