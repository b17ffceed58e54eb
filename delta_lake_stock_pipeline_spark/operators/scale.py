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
    return (
        fact.join(salted_dim, ["user_id", "salt"])
        .select("event_id", "user_id", "event_type", "user_events")
        .orderBy("event_id")
    )


QUERIES = {
    "x_salted_skew_join": salted_skew_join,
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
}
