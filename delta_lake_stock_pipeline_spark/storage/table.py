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
# Non-version directory a CLONE of an emptied table uses to carry the
# source schema (hard-linked files read limit(0) only; never table data).
SCHEMA_CARRIER = "_schema"

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


def _partition_rel_dirs(version_root: str) -> list[str]:
    """Relative partition directories (e.g. ``ticker=T00/trade_date=...``)
    that contain parquet files under a version dir; ``""`` for a flat
    (unpartitioned) layout."""
    rels = set()
    for dirpath, _dirs, files in os.walk(version_root):
        if any(f.endswith(".parquet") for f in files):
            rel = os.path.relpath(dirpath, version_root)
            rels.add("" if rel == "." else rel)
    return sorted(rels)


def _entry_for(path: str, version: int) -> dict | None:
    for e in _read_manifest(path):
        if e.get("version") == version:
            return e
    return None


def snapshot_of(path: str, version: int) -> dict[str, int]:
    """The table snapshot at ``version``: map of partition-relative dir ->
    version whose directory physically holds that partition's files. Full
    writes map every partition to their own version; pruned MERGE/DELETE
    snapshots reference untouched partitions from earlier versions (the
    Delta-log model: a commit lists files, most carried over by reference).
    Manifests written before snapshots existed fall back to "everything
    lives in this version's dir"."""
    entry = _entry_for(path, version)
    if entry and "snapshot" in entry:
        return {k: int(v) for k, v in entry["snapshot"].items()}
    return {rel: version for rel in _partition_rel_dirs(_version_dir(path, version))}


def snapshot_dirs(path: str, version: int) -> list[str]:
    """Absolute partition directories making up ``version``'s snapshot."""
    return [
        os.path.join(_version_dir(path, v), rel) if rel else _version_dir(path, v)
        for rel, v in snapshot_of(path, version).items()
    ]


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
    base_snapshot: dict[str, int] | None = None,
    replaced: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    codec: str | None = None,
    distribute_by_partition: bool = False,
) -> int:
    """Write a new table version partitioned by ``partition_cols`` (S4/S5,
    ``stock_harvester.py:170-181``) and log it. Returns the new version.

    Row count is captured via ``observe`` so the write job itself produces
    the metric -- no second scan over the data (at 100 TB a metrics
    ``count()`` would double the job).

    ``max_records_per_file`` is the file-size governor (the "~1 GB not
    1 KB" target the reference motivates, ``DESIGN.md:20``): writers roll
    to a new file at the cap, bounding the other direction of the
    small-file problem -- files too LARGE to parallelize a read over.
    ``codec`` picks the parquet compression (e.g. ``zstd`` for cold data,
    ``snappy``/default for hot).

    ``distribute_by_partition`` is Iceberg's ``write.distribution-mode =
    hash`` (guide §6): shuffle rows onto the partition columns before the
    ``partitionBy`` write so each partition value is written by ONE task
    -- without it, every upstream task holding rows of a partition opens
    its own file there, and a commit fans out to (tasks x partitions)
    small files (measured on the streaming MERGE paths: 92 files per
    150-row commit across 30 day-partitions; 30 after). Opt-in because
    callers that pre-arrange their own layout (OPTIMIZE's
    repartition + sortWithinPartitions z-ordering) must not be
    re-shuffled. The shuffle width follows spark.sql.shuffle.partitions
    + AQE coalescing, so it stays scale-adaptive."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if distribute_by_partition and partition_cols:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    os.makedirs(path, exist_ok=True)
    cur = current_version(path)
    version = 0 if cur is None else cur + 1
    out = _version_dir(path, version)
    obs = Observation(f"write_v{version}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    writer = observed.write.mode("error").partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if codec is not None:
        writer = writer.option("compression", codec)
    writer.parquet(out)
    n_files, size = _dir_file_stats(out)
    own = {rel: version for rel in _partition_rel_dirs(out)}
    if base_snapshot is None:
        snapshot = own
    else:
        # Pruned commit: carry forward unaffected partitions by reference,
        # override/add the partitions this version rewrote, drop the ones
        # it emptied (``replaced`` that produced no output dir).
        snapshot = {
            rel: v
            for rel, v in base_snapshot.items()
            if rel not in set(replaced or ())
        }
        snapshot.update(own)
    metrics = {
        "numOutputRows": obs.get["rows"],
        "numFiles": n_files,
        "sizeBytes": size,
        "partitionBy": list(partition_cols),
        "numRewrittenPartitions": len(own),
        "numReferencedPartitions": len(snapshot) - len(own),
    }
    _append_manifest(
        path,
        {
            "version": version,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "operation": operation,
            "operationMetrics": metrics,
            "snapshot": snapshot,
        },
    )
    return version


def _parse_ts(ts: str):
    """ISO-8601 -> aware datetime (naive inputs assumed UTC). Parsing --
    not string comparison -- so sub-second or no-'Z' inputs resolve
    correctly against the manifest's second-granularity 'Z' format."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(ts.replace("Z", "+00:00"))
    return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)


def version_at_timestamp(path: str, timestamp: str) -> int:
    """Delta ``timestampAsOf`` resolution: the last version committed at or
    before ``timestamp`` (ISO-8601; naive strings are taken as UTC).
    Raises if the table has no version that old."""
    want = _parse_ts(timestamp)
    candidates = [
        e["version"]
        for e in _read_manifest(path)
        if _parse_ts(e["timestamp"]) <= want
    ]
    if not candidates:
        raise ValueError(f"no version at or before {timestamp} in {path}")
    return max(candidates)


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: str | None = None,
) -> DataFrame:
    """Scan a table version (S7; default latest). ``version`` (Delta
    ``versionAsOf``) or ``timestamp`` (``timestampAsOf``, resolved against
    manifest commit times) is time travel: old version dirs are immutable
    until VACUUM removes them.

    Resolves the version's SNAPSHOT: after a pruned MERGE/DELETE the live
    table is a union of partition dirs across version dirs (one read per
    contributing version, each with its own ``basePath`` so partition
    columns materialize; filters on partition columns still prune because
    every listed path carries its partition values). Single-version
    snapshots take the plain whole-dir scan."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(path, timestamp)
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versions at {path}")
    snap = snapshot_of(path, v)
    if not snap:
        # A DELETE can empty every partition: the table is legitimately
        # zero-row, not unreadable. Synthesize the empty frame with the
        # schema of the most recent non-empty snapshot; a clone born from an
        # empty source has no such version and carries its schema in the
        # non-version ``_schema/`` dir instead (see clone_table).
        for pv in range(v - 1, -1, -1):
            if snapshot_of(path, pv):
                return read_table(spark, path, version=pv).limit(0)
        carrier = os.path.join(path, SCHEMA_CARRIER)
        if os.path.isdir(carrier):
            return spark.read.option("basePath", carrier).parquet(carrier).limit(0)
        raise FileNotFoundError(f"no data in any version at {path}")
    by_ver: dict[int, list[str]] = {}
    for rel, sv in snap.items():
        by_ver.setdefault(sv, []).append(rel)
    if len(by_ver) == 1:
        (sv, rels), = by_ver.items()
        vdir = _version_dir(path, sv)
        if set(rels) == set(_partition_rel_dirs(vdir)):
            return spark.read.parquet(vdir)
    parts = []
    for sv, rels in sorted(by_ver.items()):
        vdir = _version_dir(path, sv)
        paths = [os.path.join(vdir, rel) if rel else vdir for rel in sorted(rels)]
        parts.append(spark.read.option("basePath", vdir).parquet(*paths))
    df = parts[0]
    for p in parts[1:]:
        # allowMissingColumns = schema evolution on read: a snapshot can mix
        # versions written before/after an added column (Delta reads such
        # tables the same way -- absent columns are NULL).
        df = df.unionByName(p, allowMissingColumns=True)
    return df


def restore(path: str, version: int) -> int:
    """RESTORE TABLE ... TO VERSION (Delta ``RESTORE``,
    reference maintenance surface extension): roll the LIVE table back to
    ``version``'s snapshot as a NEW commit -- pure manifest metadata, zero
    bytes copied (the old version dirs are immutable until VACUUM), and
    the rolled-back versions stay readable, so a bad restore is itself
    restorable. Returns the new version number."""
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no versions at {path}")
    if _entry_for(path, version) is None and not os.path.isdir(
        _version_dir(path, version)
    ):
        # Without this, snapshot_of falls back to an EMPTY snapshot and the
        # bad restore would commit an unreadable table.
        raise ValueError(f"cannot restore {path} to nonexistent version {version}")
    target = snapshot_of(path, version)
    # A manifest entry can outlive its data (VACUUM removes version dirs,
    # not history): every directory the target snapshot references must
    # still exist, or the restore would commit an unreadable table.
    missing = [
        d
        for rel, sv in target.items()
        if not os.path.isdir(
            d := (os.path.join(_version_dir(path, sv), rel) if rel else _version_dir(path, sv))
        )
    ]
    if missing:
        raise ValueError(
            f"cannot restore {path} to version {version}: "
            f"{len(missing)} referenced dirs were vacuumed (e.g. {missing[0]})"
        )
    new_version = cur + 1
    _append_manifest(
        path,
        {
            "version": new_version,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "operation": "RESTORE",
            "operationMetrics": {
                "restoredVersion": version,
                "numReferencedPartitions": len(target),
                "numRewrittenPartitions": 0,
            },
            "snapshot": target,
        },
    )
    return new_version


def _read_rels(
    spark: SparkSession, path: str, snap: dict[str, int], rels: set[str]
) -> DataFrame | None:
    """Scan only ``rels`` partitions of a snapshot (grouped per contributing
    version dir so partition columns materialize via basePath). None when
    the snapshot holds none of them."""
    by_ver: dict[int, list[str]] = {}
    for rel in rels:
        if rel in snap:
            by_ver.setdefault(snap[rel], []).append(rel)
    if not by_ver:
        return None
    parts = []
    for sv, vrels in sorted(by_ver.items()):
        vdir = _version_dir(path, sv)
        paths = [os.path.join(vdir, rel) if rel else vdir for rel in sorted(vrels)]
        parts.append(spark.read.option("basePath", vdir).parquet(*paths))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change Data Feed emulation (Delta ``table_changes`` /
    ``readChangeFeed``): every row inserted or deleted in versions
    ``[from_version, to_version]`` (both inclusive, Delta CDF's
    semantics), tagged ``_change_type`` in {'insert','delete'} and
    ``_commit_version``. Updates surface as a delete+insert pair --
    exactly how Delta reconstructs changes for commits without per-row
    CDC files (add/remove file diffing).

    Scale shape: the snapshot diff identifies the partitions each commit
    touched (manifest metadata, no data read), and only THOSE partitions
    are scanned -- the analogue of Delta reading just the add/remove files
    of a commit. Row-level changes come from ``exceptAll`` (multiset
    semantics, so duplicate rows diff correctly), one shuffle per changed
    commit over changed partitions only. Snapshots that straddle a MERGE
    schema evolution are NULL-aligned before diffing, mirroring how
    ``read_table`` unions mixed-schema snapshots.
    """
    from pyspark.sql import functions as F

    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"no versions at {path}")
    to_v = cur if to_version is None else to_version
    if to_v > cur:
        raise ValueError(f"to_version {to_v} is beyond latest version {cur}")
    if from_version > to_v:
        # A silent empty feed here would read as "no changes" to a consumer
        # resuming from a stale bookmark -- fail loudly instead.
        raise ValueError(
            f"from_version {from_version} is beyond to_version {to_v}"
        )

    def _align(df: DataFrame, other: DataFrame) -> DataFrame:
        """Add ``other``'s missing columns as typed NULLs (schema evolution
        on read, same contract as read_table's allowMissingColumns)."""
        have = set(df.columns)
        for f in other.schema.fields:
            if f.name not in have:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df

    frames: list[DataFrame] = []
    for v in range(from_version, to_v + 1):
        snap_new = snapshot_of(path, v)
        snap_old = snapshot_of(path, v - 1) if v > 0 else {}
        changed = {
            rel
            for rel in set(snap_old) | set(snap_new)
            if snap_old.get(rel) != snap_new.get(rel)
        }
        if not changed:
            continue
        old_df = _read_rels(spark, path, snap_old, changed)
        new_df = _read_rels(spark, path, snap_new, changed)

        def _tag(df: DataFrame, kind: str) -> DataFrame:
            return df.withColumn("_change_type", F.lit(kind)).withColumn(
                "_commit_version", F.lit(v)
            )

        if old_df is None and new_df is not None:
            frames.append(_tag(new_df, "insert"))
        elif new_df is None and old_df is not None:
            frames.append(_tag(old_df, "delete"))
        elif old_df is not None and new_df is not None:
            old_a = _align(old_df, new_df)
            new_a = _align(new_df, old_df).select(*old_a.columns)
            frames.append(_tag(new_a.exceptAll(old_a), "insert"))
            frames.append(_tag(old_a.exceptAll(new_a), "delete"))
    if not frames:
        empty = read_table(spark, path, version=to_v).limit(0)
        return (
            empty.withColumn("_change_type", F.lit(None).cast("string"))
            .withColumn("_commit_version", F.lit(None).cast("int"))
        )
    df = frames[0]
    for p in frames[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df


def clone_table(src_path: str, dst_path: str) -> int:
    """CREATE TABLE CLONE: materialize the source's CURRENT snapshot as a
    brand-new self-contained table at ``dst_path`` without copying data --
    every parquet file is hard-linked (falling back to copy across
    filesystems). Delta's shallow clone gets zero-copy by referencing the
    source's files in its log; hard links give the same property while
    keeping the clone's metadata self-contained, so the two tables then
    version, MERGE, VACUUM, and RESTORE fully independently (and immutable
    version files make sharing the inodes safe).
    """
    src_cur = current_version(src_path)
    if src_cur is None:
        raise FileNotFoundError(f"no versions at {src_path}")
    if os.path.exists(_manifest_path(dst_path)):
        raise FileExistsError(f"{dst_path} is already a table")
    os.makedirs(dst_path, exist_ok=True)
    n_files = size = 0
    snap = snapshot_of(src_path, src_cur)
    src_empty = not snap
    if src_empty:
        # Cloning a fully-emptied table: its CURRENT snapshot references no
        # files, but the clone must still read back as a ZERO-ROW frame with
        # the source's schema (same contract read_table gives the source).
        # Link the most recent non-empty snapshot into the NON-version
        # ``_schema/`` dir -- read_table's empty-snapshot fallback reads it
        # limit(0) for the schema only, so v0 stays faithfully empty:
        # time travel to v0 returns zero rows, the manifest reports zero
        # files, and VACUUM (which touches only version dirs) leaves the
        # carrier alone.
        carrier = next(
            (pv for pv in range(src_cur - 1, -1, -1) if snapshot_of(src_path, pv)),
            None,
        )
        if carrier is None:
            raise ValueError(
                f"cannot clone {src_path}: no version ever held data, so the "
                "clone would have no schema to read back"
            )
        snap = snapshot_of(src_path, carrier)
        out = os.path.join(dst_path, SCHEMA_CARRIER)
    else:
        out = _version_dir(dst_path, 0)
    for rel, sv in snap.items():
        src_dir = os.path.join(_version_dir(src_path, sv), rel)
        dst_dir = os.path.join(out, rel)
        os.makedirs(dst_dir, exist_ok=True)
        for fn in os.listdir(src_dir):
            if not fn.endswith(".parquet"):
                continue
            s, d = os.path.join(src_dir, fn), os.path.join(dst_dir, fn)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
            n_files += 1
            size += os.path.getsize(s)
    _append_manifest(
        dst_path,
        {
            "version": 0,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "operation": "CLONE",
            "operationMetrics": {
                "sourceTable": src_path,
                "sourceVersion": src_cur,
                # Metrics describe the cloned STATE: zero files for an
                # empty source (the schema carrier is not table data).
                "numFiles": 0 if src_empty else n_files,
                "sizeBytes": 0 if src_empty else size,
            },
            "snapshot": {}
            if src_empty
            else {rel: 0 for rel in _partition_rel_dirs(out)},
        },
    )
    return 0


class ExpectationError(ValueError):
    """Raised when a ``fail``-mode expectation is violated; carries the
    per-rule violation counts."""

    def __init__(self, violations: dict[str, int]):
        super().__init__(f"expectations violated: {violations}")
        self.violations = violations


def write_with_expectations(
    df: DataFrame,
    path: str,
    expectations: dict[str, str],
    on_violation: str = "fail",
    partition_cols: Sequence[str] = DEFAULT_PARTITION_COLS,
    **write_kwargs,
) -> tuple[int | None, dict[str, int]]:
    """Data-quality-gated write (Delta CHECK constraints / DLT
    expectations): each rule is a SQL boolean that every row must satisfy.

    Violation counts are measured with ``observe`` DURING the write job --
    no second scan at any scale. ``on_violation``:

    * ``"fail"``  -- constraint semantics: if any rule is violated the
      just-written version is rolled back (version dir removed, manifest
      entry popped -- the commit never becomes visible) and
      :class:`ExpectationError` raises.
    * ``"track"`` -- DLT-style monitoring: the write commits regardless and
      the counts are returned for the caller's quality dashboard.

    Returns ``(version, violations)``; version is None only on failure.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if on_violation not in ("fail", "track"):
        raise ValueError(f"on_violation must be fail|track, got {on_violation}")
    obs = Observation("expectations")
    observed = df.observe(
        obs,
        *[
            F.sum(F.when(~F.expr(rule), 1).otherwise(0)).alias(name)
            for name, rule in expectations.items()
        ],
    )
    version = write_partitioned(
        observed, path, partition_cols, operation="WRITE", **write_kwargs
    )
    violations = {k: int(v or 0) for k, v in obs.get.items()}
    if on_violation == "fail" and any(violations.values()):
        entries = [e for e in _read_manifest(path) if e["version"] != version]
        with open(_manifest_path(path), "w") as fh:
            for e in entries:
                fh.write(json.dumps(e) + "\n")
        shutil.rmtree(_version_dir(path, version), ignore_errors=True)
        raise ExpectationError({k: v for k, v in violations.items() if v})
    return version, violations


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


def _partition_pred(keys: list[dict]):
    """OR-of-conjunctions predicate selecting the listed partition keys --
    static, so Catalyst prunes non-matching partition dirs at planning."""
    from functools import reduce

    from pyspark.sql import functions as F

    def one(k: dict):
        return reduce(
            lambda a, b: a & b, (F.col(c) == F.lit(v) for c, v in k.items())
        )

    return reduce(lambda a, b: a | b, (one(k) for k in keys))


def _rel_dir(key: dict) -> str:
    """Hive-style relative dir for a partition key, matching what
    ``partitionBy`` writes for the scalar types used here (strings without
    special characters, dates, ints)."""
    return "/".join(f"{c}={v}" for c, v in key.items())


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] = DEFAULT_PARTITION_COLS,
    evolve_schema: bool = False,
) -> int:
    """MERGE (upsert): rows in ``updates`` replace current rows with the
    same key; unmatched update rows are inserted. The Delta-class operation
    the reference's storage layer implies but never calls (its writes are
    full overwrites, ``stock_harvester.py:170-181``).

    Partition-pruned copy-on-write, the shape that survives 100 TB: only
    partitions actually containing update keys are rewritten --

        rewritten = updates ∪ (current ⋂ affected-partitions ⟕anti updates)

    -- and every untouched partition enters the new snapshot by manifest
    REFERENCE, zero bytes moved. The affected-partition list is
    partition-granular metadata (collected to the driver exactly like
    Delta reads its log); the kept-rows scan carries a static partition
    predicate so pruning happens at planning time, and the anti join's
    build side is just the update keys (broadcast when small). Requires
    ``updates`` to carry the partition columns; Delta's MERGE needs the
    same to prune.

    Matching is TABLE-WIDE, like Delta MERGE: the affected set is the
    partitions the updates land in PLUS any partition currently holding a
    matching key -- so an update that moves a key to a new partition value
    (a corrected trade_date) deletes the old row rather than leaving a
    duplicate behind. Finding those partitions costs one column-pruned
    scan of (keys, pcols) semi-joined to the update keys; when the caller
    KNOWS partition values are key-determined, that scan returns nothing
    new and AQE makes it cheap."""
    from pyspark.sql import functions as F

    current = read_table(spark, path)
    keys = list(key_cols)
    pcols = list(partition_cols)
    cur_v = current_version(path)
    upd_keys = updates.select(*keys).distinct()
    # Landing partitions (from the updates) and matching partitions (from
    # the current table, semi-joined to the update keys) are ONE unioned
    # collect: two separate jobs cost a full scheduler round-trip each for
    # a few metadata rows (round-10 optimization; measured ~0.5-1.0 s per
    # MERGE at local[32] -- at cluster scale one job also lists/plans the
    # table read once instead of twice).
    affected_rows = (
        updates.select(*pcols)
        .distinct()
        .unionByName(
            current.join(F.broadcast(upd_keys), keys, "left_semi")
            .select(*pcols)
            .distinct()
        )
        .distinct()
        .collect()
    )
    landing_matching = [r.asDict() for r in affected_rows]
    affected = {tuple(sorted(d.items())): d for d in landing_matching}
    affected = list(affected.values())
    if not affected:
        return cur_v
    pred = _partition_pred(affected)
    kept = current.filter(pred).join(upd_keys, keys, "left_anti")
    if evolve_schema:
        # Delta autoMerge semantics: updates may ADD columns; kept rows
        # (and, via read_table's allowMissingColumns union, every untouched
        # partition) surface NULL for them.
        merged = updates.unionByName(kept, allowMissingColumns=True)
    else:
        merged = updates.select(*current.columns).unionByName(kept)
    return write_partitioned(
        merged,
        path,
        pcols,
        operation="MERGE",
        base_snapshot=snapshot_of(path, cur_v),
        replaced=[_rel_dir(k) for k in affected],
        # One file per rewritten partition instead of (tasks x partitions)
        # -- the incremental MERGE trickle is the commit-amplified path
        # (guide §6 small-files; see write_partitioned).
        distribute_by_partition=True,
    )


def delete_where(
    spark: SparkSession,
    path: str,
    condition: str,
    partition_cols: Sequence[str] = DEFAULT_PARTITION_COLS,
) -> int:
    """DELETE: remove rows matching ``condition`` (Delta ``DELETE FROM``)
    as a partition-pruned copy-on-write commit: only partitions that
    contain at least one matching row are rewritten (minus their matching
    rows; a partition emptied entirely just drops out of the snapshot);
    all other partitions carry over by reference. A condition on partition
    columns only makes the rewrite metadata-cheap -- matching partitions
    vanish without writing a row."""
    from pyspark.sql import functions as F

    current = read_table(spark, path)
    pcols = list(partition_cols)
    cur_v = current_version(path)
    cond = F.expr(condition)
    affected = [
        r.asDict()
        for r in current.filter(cond).select(*pcols).distinct().collect()
    ]
    if not affected:
        return cur_v
    pred = _partition_pred(affected)
    remaining = current.filter(pred).filter(~cond)
    return write_partitioned(
        remaining,
        path,
        pcols,
        operation="DELETE",
        base_snapshot=snapshot_of(path, cur_v),
        replaced=[_rel_dir(k) for k in affected],
        distribute_by_partition=True,
    )


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
    if len(set(snapshot_of(path, v).values())) > 1:
        # Snapshot spans version dirs (pruned MERGE/DELETE since the last
        # full write) -- no single LOCATION exists, so register the view
        # form (D4 fallback, ``external_table.py:83-86``). OPTIMIZE
        # collapses the snapshot back into one dir, re-enabling D3.
        read_table(spark, path, v).createOrReplaceTempView(name)
        return "view"
    loc = _version_dir(path, v)
    try:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{loc}'")
        spark.sql(f"MSCK REPAIR TABLE {name}")  # discover partition dirs
        return "table"
    except Exception:
        spark.read.parquet(loc).createOrReplaceTempView(name)
        return "view"


def analyze_table(
    spark: SparkSession, name: str, columns: Sequence[str] | None = None
) -> dict:
    """ANALYZE TABLE: record table (and optionally column) statistics in
    the catalog for cost-based optimization -- the optimizer-level
    analogue of the reference's ``DESCRIBE DETAIL`` file statistics (D5,
    ``maintenance.py:42-46``). With stats present (and CBO enabled in
    ``session.py``), Catalyst reorders multi-way joins and picks
    broadcast sides from real row counts rather than file-size guesses --
    at 100 TB the difference between a plan that broadcasts a filtered
    dimension and one that shuffles it.

    Returns the recorded statistics parsed back from DESCRIBE EXTENDED
    (``sizeInBytes``, ``rowCount``)."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    stats_line = next(
        (
            r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
            if r["col_name"] == "Statistics"
        ),
        "",
    )
    out: dict = {"raw": stats_line}
    for part in stats_line.split(","):
        part = part.strip()
        if part.endswith("bytes"):
            out["sizeInBytes"] = int(part.split()[0])
        elif part.endswith("rows"):
            out["rowCount"] = int(part.split()[0])
    return out


def remove_versions_before(path: str, keep_from: int) -> list[int]:
    """Delete version dirs below ``keep_from``; used by VACUUM (M2).

    A version dir is retained even below the cutoff while any RETAINED
    version's snapshot still references partitions inside it (the Delta
    VACUUM rule: eligibility is "unreferenced by the retained log", not
    age alone -- deleting by age would tear partitions out from under a
    pruned-merge snapshot)."""
    entries = _read_manifest(path)
    referenced: set[int] = set()
    for e in entries:
        v = e.get("version")
        if v is not None and v >= keep_from:
            referenced.update(snapshot_of(path, v).values())
    removed = []
    for e in entries:
        v = e.get("version")
        if v is not None and v < keep_from and v not in referenced:
            d = _version_dir(path, v)
            if os.path.exists(d):
                shutil.rmtree(d)
                removed.append(v)
    return removed
