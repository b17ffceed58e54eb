"""Parse Spark physical plans into checkable features.

Uses ``explainString`` (plan compilation only -- no job runs), so plan
assertions are cheap enough to gate every operator in tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print."""
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


@dataclass
class PlanFeatures:
    """Scale-critical properties extracted from a physical plan."""

    n_exchanges: int
    n_wholestage_codegen: int
    has_broadcast_hash_join: bool
    has_sort_merge_join: bool
    has_take_ordered: bool  # top-k without global sort
    has_partial_aggregate: bool  # map-side combine before the shuffle
    n_python_boundaries: int  # Arrow/pickle crossings (UDF evals)
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)


def plan_features(df: DataFrame) -> PlanFeatures:
    text = plan_string(df, "formatted")
    return PlanFeatures(
        # formatted mode shows each node in the tree AND a "(n) Node" details
        # header -- count only the numbered headers to avoid double counting.
        n_exchanges=len(re.findall(r"\(\d+\) Exchange", text)),
        # formatted mode tags codegen'd nodes "[codegen id : N]" -- count
        # distinct spans, not tagged nodes.
        n_wholestage_codegen=len(set(re.findall(r"codegen id : (\d+)", text))),
        has_broadcast_hash_join="BroadcastHashJoin" in text,
        has_sort_merge_join="SortMergeJoin" in text,
        has_take_ordered="TakeOrderedAndProject" in text,
        has_partial_aggregate="partial_" in text or "Keys: " in text and "Functions [" in text,
        n_python_boundaries=len(
            re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", text)
        ),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        partition_filters=re.findall(r"PartitionFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
    )


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Every needle (column name) must appear inside some PushedFilters list
    -- i.e. the predicate reached the parquet scan."""
    feats = plan_features(df)
    joined = "; ".join(feats.pushed_filters)
    for needle in needles:
        assert needle in joined, (
            f"filter on {needle!r} not pushed to scan; PushedFilters={feats.pushed_filters}"
        )


def assert_read_schema_only(df: DataFrame, allowed: set[str]) -> None:
    """Every scan must read a subset of ``allowed`` columns -- column
    pruning reached the reader (a 2-column projection scanning 16 columns
    is a 100 TB mistake)."""
    feats = plan_features(df)
    assert feats.read_schemas, "no FileScan ReadSchema found in plan"
    for schema in feats.read_schemas:
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        extra = cols - allowed
        assert not extra, f"scan reads unneeded columns {extra}; schema={schema}"


def assert_broadcast_join(df: DataFrame) -> None:
    feats = plan_features(df)
    assert feats.has_broadcast_hash_join, "expected BroadcastHashJoin in plan"


def assert_top_k(df: DataFrame) -> None:
    """ORDER BY ... LIMIT k must compile to TakeOrderedAndProject
    (distributed per-partition top-k), never a global sort."""
    feats = plan_features(df)
    assert feats.has_take_ordered, "expected TakeOrderedAndProject (top-k) in plan"
