"""Emit PLANS.md-format rows for query keys.

Usage: PYTHONPATH=. python tools/plans_probe.py [key ...]
(no args = every registered key, the full-table regen).

Explain-only compilation against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) with AQE disabled -- AdaptiveSparkPlan hides
WholeStageCodegen ids in the static plan, and the table documents the
statically chosen strategy. Columns match PLANS.md: shuffles (Exchange
count), WSCG (distinct codegen spans), join strategy, top-k
(TakeOrderedAndProject), pushed filters, py (Python/Arrow boundary
crossings).

This file exists because its /tmp predecessor was wiped twice by the
sandbox's tmp cleanup (see the build-protocol notes); the calibration
check is that an unchanged key's row must reproduce PLANS.md verbatim.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_stock_pipeline_spark.operators import all_queries  # noqa: E402
from delta_lake_stock_pipeline_spark.session import get_spark  # noqa: E402

_PY_NODES = [
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
    "PythonUDTF",
]


def plan_row(df) -> str:
    p = df._jdf.queryExecution().executedPlan().toString()
    shuffles = p.count("Exchange hashpartitioning") + p.count(
        "Exchange rangepartitioning"
    )
    wscg = len(set(re.findall(r"\*\((\d+)\)", p)))
    if "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p:
        join = "broadcast"
    elif "SortMergeJoin" in p:
        join = "sort-merge"
    elif "ShuffledHashJoin" in p:
        join = "shuffle-hash"
    else:
        join = "—"
    topk = "y" if "TakeOrderedAndProject" in p else "—"
    pushed = (
        "y"
        if p.count("PushedFilters: [") > p.count("PushedFilters: []")
        else "—"
    )
    py = sum(p.count(x) for x in _PY_NODES)
    return f"{shuffles} | {wscg} | {join} | {topk} | {pushed} | {py}"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plans_probe", shuffle_partitions=32)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    keys = sys.argv[1:] or sorted(q)
    for k in keys:
        try:
            row = plan_row(q[k](spark, sf_dir))
            print(f"| {k} | {row} |")
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"| {k} | ERROR {type(e).__name__}: {e} |")


if __name__ == "__main__":
    main()
