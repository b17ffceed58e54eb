"""Scale techniques as first-class, testable operators: key salting for
skew, and (in storage/table.py + tests) bucketed co-located joins.

The reference never joins, so it never hits skew; at 100 TB a single hot
key (one viral document, one dominant customer) turns a shuffle join into
one straggler task. Two standard mitigations, both demonstrated here
against the fixtures:

* **AQE skew-join splitting** -- on by default in session.py
  (``spark.sql.adaptive.skewJoin.enabled``); zero code, handles skew
  detected at runtime from shuffle statistics.
* **Manual salting** (this module) -- for when BOTH sides are too large to
  broadcast and the skew is known: replicate each dim row S ways, scatter
  fact rows across the S sub-keys with a deterministic hash, join on
  ``(key, salt)``. Each hot key's rows spread over S tasks instead of one.
  Salting is semantics-preserving, so the query is DuckDB-oracle-checked
  against the *unsalted* join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table

_SALT = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its user's total event count via a salted
    join on ``user_id`` -- a worst-case-skew key (15 users for the whole
    events table, so every key is hot).

    Mechanics: dim rows explode x S (salt 0..S-1); fact rows get
    ``salt = xxhash64(event_id) % S``; the equi-join key becomes
    ``(user_id, salt)`` giving S-way parallelism per hot key. The dim here
    is small enough to broadcast -- the point is the technique, which the
    oracle proves equivalent to the plain join.
    """
    events = load_table(spark, sf_dir, "events")
    dim = events.groupBy("user_id").agg(F.count("*").alias("user_events"))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
    )
    fact = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT)).cast("int")
    )
    # SHUFFLE_HASH hint: at fixture scale the exploded dim is small enough
    # that Catalyst would broadcast it -- which never shuffles the fact and
    # so never exercises what salting exists for. The hint forces the
    # shuffle-join path (the 100 TB situation where BOTH sides are big),
    # so the (user_id, salt) key really does spread each hot key S ways.
    return (
        fact.join(salted_dim.hint("SHUFFLE_HASH"), ["user_id", "salt"])
        .select("event_id", "user_id", "event_type", "user_events")
        .orderBy("event_id")
    )


def ranged_with_offsets(
    spark: SparkSession,
    df: DataFrame,
    order_col: str,
    weight_col: str,
    n_partitions: int = 16,
) -> DataFrame:
    """The two-phase global-prefix decomposition shared by
    ``global_row_ids`` and ``curation.pack_sequences``: returns ``df`` with
    a ``pid`` (range-partition id ordered by ``order_col``) and an ``off``
    column holding the cumulative sum of ``weight_col`` over all EARLIER
    partitions -- so ``off`` + a per-pid window gives any global running
    aggregate without a single-partition window.

    ``localCheckpoint`` pins the range partitioning: ``repartitionByRange``
    picks boundaries by SAMPLING, so re-evaluating the plan (once for the
    totals collect, once for the final join) could place rows differently
    than they were counted, silently corrupting the offsets. Checkpointing
    makes the counted rows the consumed rows. The per-partition totals are
    the only driver-side data (partition-count rows -- metadata, like
    Delta reading its log). At cluster scale use reliable
    checkpoint/persist(DISK) for the same guarantee."""
    ranged = df.repartitionByRange(n_partitions, F.col(order_col))
    with_pid = ranged.withColumn("pid", F.spark_partition_id()).localCheckpoint()
    totals = sorted(
        (r["pid"], int(r["w"] or 0))
        for r in with_pid.groupBy("pid").agg(F.sum(weight_col).alias("w")).collect()
    )
    offsets, acc = [], 0
    for pid, w in totals:
        offsets.append((pid, acc))
        acc += w
    # Carry the (pid, off) metadata rows JVM-side: createDataFrame on a
    # Python list pays a pickled-RDD Python-worker round-trip (~0.4-1.3 s)
    # for what is a handful of literals. The lists ride as TWO single
    # array Literals zipped (O(1) plan nodes however many partitions --
    # review finding: a per-partition struct-of-lits CreateArray tree
    # would regrow the py4j/codegen tax at cluster partition counts, the
    # same class the PQ ADC tables avoid). An EMPTY offsets list (empty
    # input frame) cannot go through array literals -- F.lit([]) is
    # VOID-typed -- so build the empty relation directly.
    if not offsets:
        offs = spark.range(0).select(
            F.lit(0).cast("int").alias("pid"), F.lit(0).cast("long").alias("off")
        )
        return with_pid.join(F.broadcast(offs), "pid")
    pid_arr = F.lit([int(p) for p, _ in offsets]).alias("pid")
    off_arr = F.lit([int(o) for _, o in offsets]).alias("off")
    offs = (
        spark.range(1)
        .select(F.explode(F.arrays_zip(pid_arr, off_arr)).alias("s"))
        .select(
            F.col("s.pid").cast("int").alias("pid"),
            F.col("s.off").cast("long").alias("off"),
        )
    )
    return with_pid.join(F.broadcast(offs), "pid")


def global_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDERED row ids without a single-partition window.

    ``ROW_NUMBER() OVER (ORDER BY k)`` with no PARTITION BY collapses the
    whole table into ONE task -- the canonical 100 TB anti-pattern. The
    scalable decomposition (``ranged_with_offsets``):

    1. ``repartitionByRange(k)`` -- range-shuffle so partition p holds keys
       entirely below partition p+1;
    2. per-partition counts -> cumulative offsets;
    3. per-partition ``row_number`` (parallel: each window partition is one
       range partition) + broadcast-joined offset.

    The result equals the global window's ids exactly (ids are determined
    by total key order, independent of where range boundaries land), which
    the DuckDB oracle checks."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id").withColumn("__w", F.lit(1).cast("long"))
    w = Window.partitionBy("pid").orderBy("doc_id")
    return (
        ranged_with_offsets(spark, rows, "doc_id", "__w")
        .select(
            "doc_id",
            (F.row_number().over(w) + F.col("off")).alias("seq"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "x_salted_skew_join": salted_skew_join,
    "x_global_row_ids": global_row_ids,
}

ORACLES = {
    "x_salted_skew_join": """
        SELECT event_id, e.user_id AS user_id, event_type, user_events
        FROM events e
        JOIN (
            SELECT user_id, COUNT(*) AS user_events
            FROM events GROUP BY user_id
        ) d ON e.user_id = d.user_id
        ORDER BY event_id
    """,
    "x_global_row_ids": """
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS seq
        FROM documents ORDER BY doc_id
    """,
}
