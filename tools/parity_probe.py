"""Targeted oracle-parity runner: compare specific keys (or a prefix)
against their DuckDB oracles at sf0.001 + sf0.01 under a vanilla session
(the predriver_check stage-2 recipe, scoped to the keys under test so an
optimization's parity re-proof takes seconds, not the full 253-key
sweep).

Usage: PYTHONPATH=. python tools/parity_probe.py <key-or-prefix> [...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    from __spark_entry__ import oracle_sql, queries
    from delta_lake_stock_pipeline_spark.testing import compare, duckdb_connection

    want = sys.argv[1:]
    q, o = queries(), oracle_sql()
    keys = [
        k
        for k in q
        if k in o and any(k == w or k.startswith(w) for w in want)
    ]
    if not keys:
        print(f"no oracled keys match {want}")
        return 1
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("parity-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for sf in SF_DIRS:
        con = duckdb_connection(sf)
        for key in keys:
            t0 = time.time()
            try:
                res = compare(key, q[key](spark, sf), con, o[key])
                ok = res.ok
                detail = "" if ok else f": {res.detail}"
            except Exception as exc:  # noqa: BLE001
                ok, detail = False, f": errored: {exc}"
            tag = "ok  " if ok else "FAIL"
            print(
                f"{tag} {key} @ {os.path.basename(sf)}"
                f" {time.time() - t0:.1f}s{detail}",
                flush=True,
            )
            if not ok:
                failures.append(f"{key} @ {sf}{detail}")
        con.close()
    spark.stop()
    if failures:
        print(f"FAIL ({len(failures)})")
        return 1
    print(f"OK: {len(keys)} keys x {len(SF_DIRS)} SFs green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
