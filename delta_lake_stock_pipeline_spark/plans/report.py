"""Generate PLANS.md: physical-plan features for every registered query.

Run: ``python -m delta_lake_stock_pipeline_spark.plans.report [sf_dir]``

Explain-only (no jobs): compiles each query's plan at the given scale dir
and tabulates the properties that decide 100 TB viability -- shuffle count,
codegen coverage, join strategies, pushdown, Python boundaries.
"""

from __future__ import annotations

import sys

from ..operators import all_queries
from ..session import get_spark
from .introspect import plan_features


def generate(sf_dir: str = "/root/testdata/sf0.1", out_path: str = "PLANS.md") -> str:
    spark = get_spark(app_name="plan-report")
    # AQE wraps plans in AdaptiveSparkPlan and defers codegen annotation
    # until execution; compile without it so WSCG spans are visible.
    # (Execution everywhere else keeps AQE on -- this is explain-only.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    lines = [
        "# PLANS — physical-plan features per query",
        "",
        f"Explain-only compilation against `{sf_dir}`. Columns: shuffles "
        "(Exchange count), WSCG (WholeStageCodegen spans), join strategy, "
        "top-k (TakeOrderedAndProject), pushed/partition filters present, "
        "py (Python/Arrow boundary crossings — 0 for pure-Catalyst queries).",
        "",
        "| query | shuffles | WSCG | join | top-k | pushed | py |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, fn in sorted(all_queries().items()):
        try:
            f = plan_features(fn(spark, sf_dir))
            join = (
                "broadcast"
                if f.has_broadcast_hash_join
                else ("sort-merge" if f.has_sort_merge_join else "—")
            )
            lines.append(
                f"| {name} | {f.n_exchanges} | {f.n_wholestage_codegen} | {join} "
                f"| {'y' if f.has_take_ordered else '—'} "
                f"| {'y' if f.pushed_filters and any(f.pushed_filters) else '—'} "
                f"| {f.n_python_boundaries} |"
            )
        except Exception as ex:  # pragma: no cover
            lines.append(f"| {name} | plan failed: {type(ex).__name__} | | | | | |")
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(text)
    return out_path


if __name__ == "__main__":
    path = generate(*(sys.argv[1:2] or []))
    print(f"wrote {path}")
