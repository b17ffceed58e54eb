"""Dump ``.explain("formatted")`` for query keys to files.

Usage: PYTHONPATH=<repo> python tools/explain_dump.py <out_dir> <suffix> [key ...]

Writes ``<out_dir>/<key>_<suffix>.txt`` for each key (default: a fixed
list of the round-10 optimization's touched keys). Explain-only -- no
query executes; executed-streaming keys are skipped unless listed
explicitly (their DataFrame construction RUNS the replay, so their
evidence is job timings in OPTIMIZATION notes, not static plans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "g_pagerank",
    "g_kcore",
    "g_bfs_hops",
    "m_video_neardup",
    "m_video_incremental",
    "m_video_fingerprint",
    "v_ann_ivf",
    "v_ann_pq",
    "v_quantized_cosine",
    "v_cosine_topk",
    "t_quality_classifier",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from delta_lake_stock_pipeline_spark.operators import all_queries
    from delta_lake_stock_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"explain-dump-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        df = queries[k](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{k}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {k}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
