"""Versioned partitioned parquet tables with a manifest log.

Re-expresses the reference's Delta lifecycle on plain parquet (SURVEY.md
§7.4 risk 2 fallback): each write lands an immutable version directory
``v0000, v0001, ...`` under the table path and appends one JSONL manifest
entry ``{version, timestamp, operation, operationMetrics}`` -- the shape
``DeltaTable.history()`` exposes (``maintenance.py:87-91``).

Isolation model: readers resolve a version directory once and only ever see
its immutable files; writers only add new directories. That is the essential
snapshot-isolation property of Delta's log, minus multi-writer commit
arbitration (out of scope for a single-driver engine; the seam to swap in
delta-spark is ``session.have_delta()``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.jsonl"

# Reference partition layout: stock_harvester.py:172,180.
DEFAULT_PARTITION_COLS = ("ticker", "trade_date")


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def _read_manifest(path: str) -> list[dict]:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return []
    with open(mp) as f:
        return [json.loads(line) for line in f if line.strip()]


def _append_manifest(path: str, entry: dict) -> None:
    with open(_manifest_path(path), "a") as f:
        f.write(json.dumps(entry) + "\n")


def _version_dir(path: str, version: int) -> str:
    return os.path.join(path, f"v{version:04d}")


def current_version(path: str) -> int | None:
    entries = [e for e in _read_manifest(path) if "version" in e]
    return max((e["version"] for e in entries), default=None)


def _dir_file_stats(root: str) -> tuple[int, int]:
    """(num parquet files, total bytes) -- the reference's local walk
    (``maintenance.py:55-62``)."""
    n, size = 0, 0
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(dirpath, fn))
    return n, size


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = DEFAULT_PARTITION_COLS,
    operation: str = "WRITE",
) -> int:
    """Write a new table version partitioned by ``partition_cols`` (S4/S5,
    ``stock_harvester.py:170-181``) and log it. Returns the new version.

    Row count is captured via ``observe`` so the write job itself produces
    the metric -- no second scan over the data (at 100 TB a metrics
    ``count()`` would double the job)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    cur = current_version(path)
    version = 0 if cur is None else cur + 1
    out = _version_dir(path, version)
    obs = Observation(f"write_v{version}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    observed.write.mode("error").partitionBy(*partition_cols).parquet(out)
    n_files, size = _dir_file_stats(out)
    _append_manifest(
        path,
        {
            "version": version,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "operation": operation,
            "operationMetrics": {
                "numOutputRows": obs.get["rows"],
                "numFiles": n_files,
                "sizeBytes": size,
                "partitionBy": list(partition_cols),
            },
        },
    )
    return version


def read_table(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Scan a table version (S7; default latest). ``version`` is time travel:
    old version dirs are immutable until VACUUM removes them."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versions at {path}")
    return spark.read.parquet(_version_dir(path, v))


def history(spark: SparkSession, path: str) -> DataFrame:
    """Manifest as a DataFrame -- version/timestamp/operation/metrics ordered
    by version (M4, ``maintenance.py:87-91``)."""
    entries = [
        (
            e["version"],
            e["timestamp"],
            e["operation"],
            json.dumps(e.get("operationMetrics", {})),
        )
        for e in _read_manifest(path)
    ]
    return spark.createDataFrame(
        entries, "version INT, timestamp STRING, operation STRING, operationMetrics STRING"
    ).orderBy("version")


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = DEFAULT_PARTITION_COLS,
) -> int:
    """MERGE (upsert): rows in ``updates`` replace current rows with the
    same key; unmatched update rows are inserted. The Delta-class operation
    the reference's storage layer implies but never calls (its writes are
    full overwrites, ``stock_harvester.py:170-181``); here it is the
    copy-on-write rewrite ``MERGE INTO`` performs:

        new snapshot = updates ∪ (current ⟕anti updates on key)

    One left_anti join (key columns only travel through the shuffle build
    side; with few update keys Catalyst broadcasts them) + one partitioned
    write -- no driver-side row handling. At 100 TB the anti join is
    restricted to partitions referenced by ``updates`` (partition-pruned
    copy-on-write): untouched partitions' files would be carried into the
    new snapshot by manifest reference rather than rewritten; this
    single-dir-per-version layout rewrites the full table instead, which
    is the same simplification the reference's overwrite makes.
    """
    current = read_table(spark, path)
    keys = list(key_cols)
    kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = updates.select(*current.columns).unionByName(kept)
    return write_partitioned(merged, path, partition_cols, operation="MERGE")


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    partition_cols: Sequence[str] = DEFAULT_PARTITION_COLS,
) -> int:
    """DELETE: new version containing only rows NOT matching ``condition``
    (Delta ``DELETE FROM``): a predicate-pushdown scan + partitioned write.
    When ``condition`` touches only partition columns, the scan prunes to
    the doomed partitions' complement and the rewrite is metadata-cheap."""
    from pyspark.sql import functions as F

    current = read_table(spark, path)
    remaining = current.filter(~F.expr(condition))
    return write_partitioned(remaining, path, partition_cols, operation="DELETE")


def register_external(
    spark: SparkSession, name: str, path: str, version: int | None = None
) -> str:
    """External-table DDL over a version directory (D1-D3,
    ``external_table.py:135-140``): DROP IF EXISTS then CREATE ... USING
    parquet LOCATION. Dropping later removes only the catalog entry; data
    files are untouched (the external-table ownership semantics the
    reference documents, ``DESIGN.md:69-78``). Falls back to a temp view
    when catalog DDL is unavailable (D4, ``external_table.py:83-86``)."""
    v = current_version(path) if version is None else version
    loc = _version_dir(path, v)
    try:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
        spark.sql(f"MSCK REPAIR TABLE {name}")  # discover partition dirs
        return "table"
    except Exception:
        spark.read.parquet(loc).createOrReplaceTempView(name)
        return "view"


def remove_versions_before(path: str, keep_from: int) -> list[int]:
    """Delete version dirs below ``keep_from``; used by VACUUM (M2)."""
    removed = []
    for e in _read_manifest(path):
        v = e.get("version")
        if v is not None and v < keep_from:
            d = _version_dir(path, v)
            if os.path.exists(d):
                shutil.rmtree(d)
                removed.append(v)
    return removed
