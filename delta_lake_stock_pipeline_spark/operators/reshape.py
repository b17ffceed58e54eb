"""Reshaping + sampling operators: pivot, unpivot/melt, and the sampling
surface a training-data pipeline needs (systematic, Bernoulli, stratified).

None of these exist in the reference (single-table aggregate pipeline,
SURVEY.md SS2.12); they are first-class here because data-curation jobs
lean on them constantly (class rebalancing, eval holdouts, wide->long
feature reshaping).

Scale notes: pivot compiles to one hash aggregate with per-value filtered
aggregates (no shuffle beyond the groupBy); unpivot is a zero-shuffle
projection (Expand node); samples are narrow scans -- the systematic
variant is pushdown-friendly and reproducible across engines, the
Bernoulli/stratified variants use Spark's per-partition RNG (seeded,
engine-specific => rows-only check, anchored by their deterministic twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: quantity/count per (returnflag x linestatus). Pivot values
    are enumerated explicitly -- at scale an implicit pivot triggers an extra
    distinct-collect job over the fact table to discover them."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide part attributes into (metric, value) rows, then
    summarize per metric. Compiles to an Expand projection -- no shuffle
    until the final small aggregate."""
    part = load_table(spark, sf_dir, "part")
    long = part.withColumn("p_size_d", F.col("p_size").cast("double")).unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size_d"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count("*").alias("n"),
            # exact-decimal sum / count: money avgs must not depend on
            # accumulation order across engines.
            F.round(
                F.sum(F.col("val").cast("decimal(18,6)")).cast("double")
                / F.count("val"),
                4,
            ).alias("avg_val"),
            F.round(F.min("val"), 4).alias("min_val"),
            F.round(F.max("val"), 4).alias("max_val"),
        )
        .orderBy("metric")
    )


def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample: every 7th order key. Reproducible on
    any engine (pure predicate => full pushdown), the right default for
    eval-holdout splits that must be stable across reruns and engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_orderkey") % 7 == 0)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# Systematic-PPS sample size: the K ticks spread over the cumulative
# weight axis; sum(n_ticks) == K exactly (each of the K grid crossings is
# hit once). Shared engine/oracle.
_PPS_K = 50


def pps_select(
    spark: SparkSession, df: DataFrame, weight_col: str, k: int
) -> DataFrame:
    """Systematic-PPS core, factored so the character-mass sampler
    (``r_sample_pps``) and the classifier-weighted sampler
    (``curation.quality_mix``) share one selection definition: rows with
    a positive integer ``weight_col`` and a ``doc_id`` order -> the rows
    holding at least one of the K grid ticks, with ``cw`` (inclusive
    cumulative weight) and ``n_ticks`` (multiplicity) columns appended.
    Global prefix via the shared two-phase ``ranged_with_offsets``
    decomposition; the weight total rides a 1-row broadcast cross join."""
    from .scale import ranged_with_offsets

    ranged = ranged_with_offsets(spark, df, "doc_id", weight_col)
    win = Window.partitionBy("pid").orderBy("doc_id")
    # Total weight from the CHECKPOINTED ranged frame, not the input plan:
    # aggregating `df` would re-run the whole upstream (for c_quality_mix
    # that is the classifier fold over every token of every document) a
    # second time, while the checkpoint is a cheap materialized scan
    # (round-9 review finding).
    total = ranged.agg(F.sum(weight_col).cast("long").alias("w_total"))
    ticks = F.expr(f"(cw * {k}) div w_total") - F.expr(
        f"((cw - {weight_col}) * {k}) div w_total"
    )
    return (
        ranged.withColumn(
            "cw", (F.col("off") + F.sum(weight_col).over(win)).cast("long")
        )
        .crossJoin(F.broadcast(total))
        .withColumn("n_ticks", ticks.cast("long"))
        .filter(F.col("n_ticks") >= 1)
        .drop("pid", "off", "w_total")
    )


def sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sample: K ticks on the
    cumulative CHARACTER-MASS axis of the corpus in doc_id order -- the
    data-mixing primitive where corpora are sampled by token/byte budget
    rather than document count (a 10x-longer doc is 10x as likely to be
    drawn, with multiplicity ``n_ticks`` when it spans several grid
    cells). Fully deterministic and engine-exact: selection is pure
    integer arithmetic -- doc i is drawn ``(cw*K) div W - (prev*K) div W``
    times -- so unlike the seeded-RNG samplers this one carries a full
    value oracle, and sum(n_ticks) == K is an identity, not a tolerance.

    Scale shape: the global cumulative weight uses the shared two-phase
    prefix decomposition (``scale.ranged_with_offsets``): range-partition
    by doc_id, per-partition totals as driver metadata, per-partition
    window -- never a single-partition global window. The corpus total W
    rides a 1-row broadcast cross join (_BNLJ_OK class)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        pps_select(spark, docs, "n_chars", _PPS_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("cw").alias("cum_weight"),
            "n_ticks",
        )
        .orderBy("doc_id")
    )


def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli row sample (~10%): per-partition RNG, no shuffle.
    Engine-specific RNG stream => rows-only check; the systematic twin above
    anchors correctness of the sampling *surface*."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.sample(fraction=0.1, seed=42)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("l_linestatus")
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with per-class fractions (``sampleBy``) -- the
    class-rebalancing primitive: downsample the majority 'N' flag, keep all
    of 'A'/'R'. Rows-only (seeded engine RNG)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.sampleBy("l_returnflag", {"N": 0.2, "A": 1.0, "R": 1.0}, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("l_returnflag")
    )


def sample_bernoulli_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed guarantees for the seeded Bernoulli sampler (the
    sketch-anchor pattern: the rows-only ``r_sample_bernoulli`` key can
    promise nothing the driver can check; this one pins what the seed
    DOES guarantee as oracle literals):

    * ``binom_within_5sigma`` -- the sampled count sits within 5 standard
      deviations of the p=0.1 binomial expectation, in pure long
      arithmetic: ``(10*n_s - n)^2 <= 225*n`` is exactly
      ``|n_s - 0.1n| <= 5*sqrt(0.09n)`` scaled by 100. A broken sampler
      (wrong fraction, double-sampling, partition loss) flips it; the
      seeded stream never does.
    * ``n_run_diff = 0`` -- two independent plans with the same seed over
      the same files select EXACTLY the same rows (symmetric difference
      via full-outer join on the (l_orderkey, l_linenumber) primary key),
      i.e. the sample is a reproducible holdout, not a fresh RNG draw.

    Scale shape: one narrow scan per leg, scalar-only aggregates, and the
    1-row legs meet in broadcast cross joins (plan-gated in _BNLJ_OK)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber"]
    s1 = lineitem.sample(fraction=0.1, seed=42).select(*key)
    s2 = lineitem.sample(fraction=0.1, seed=42).select(*key)
    tot = lineitem.agg(F.count("*").cast("long").alias("n_total"))
    ns = s1.agg(F.count("*").cast("long").alias("n_s"))
    joined = (
        s1.withColumn("in_a", F.lit(1))
        .join(s2.withColumn("in_b", F.lit(1)), key, "full_outer")
        .agg(
            # coalesce: SUM over ZERO joined rows (an empty sample at tiny
            # inputs) is NULL, and the anchor's pinned literal is 0.
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("in_a").isNull() | F.col("in_b").isNull(), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_run_diff")
        )
    )
    dev = F.lit(10) * F.col("n_s") - F.col("n_total")
    return (
        tot.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(joined))
        .select(
            "n_total",
            (dev * dev <= F.lit(225) * F.col("n_total")).alias(
                "binom_within_5sigma"
            ),
            "n_run_diff",
        )
    )


def sample_stratified_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-witnessed guarantees for the seeded stratified sampler
    (``sampleBy`` with {'N': 0.2, 'A': 1.0, 'R': 1.0}): per-class count
    invariants the fractions guarantee, joined against the exact class
    totals the oracle recomputes.

    * classes sampled at fraction 1.0 ('A', 'R') must keep EVERY row --
      ``count_ok`` is exact equality;
    * the 0.2-class 'N' must land within 5 binomial standard deviations:
      ``(5*n_s - n)^2 <= 100*n`` is ``|n_s - 0.2n| <= 5*sqrt(0.16n)``
      scaled by 25, pure long arithmetic.

    One shuffle per leg on the 3-value class key, counts only."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    samp = lineitem.sampleBy(
        "l_returnflag", {"N": 0.2, "A": 1.0, "R": 1.0}, seed=42
    )
    per = lineitem.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_class")
    )
    sper = samp.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_s")
    )
    dev = F.lit(5) * F.col("n_s") - F.col("n_class")
    return (
        per.join(sper, "l_returnflag")
        .select(
            "l_returnflag",
            "n_class",
            F.when(
                F.col("l_returnflag") == "N",
                dev * dev <= F.lit(100) * F.col("n_class"),
            )
            .otherwise(F.col("n_s") == F.col("n_class"))
            .alias("count_ok"),
        )
        .orderBy("l_returnflag")
    )


def md5_bucket(col: F.Column, n: int) -> F.Column:
    """The engine-portable md5 fold shared by the hashing-trick
    featurizer (`t_feature_hash`) and DSIR (`c_dsir`): first 32 bits of
    md5, mod ``n``. ONE definition on each side (see ``md5_bucket_sql``)
    so the two keys' documented 'same fold' contract cannot silently
    diverge; `hash_split_columns` below is the older mod-100 instance of
    the same idea."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n


def md5_bucket_sql(expr: str, n: int) -> str:
    """DuckDB rendering of ``md5_bucket`` -- interpolate into oracle SQL."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT) % {n}"


def hash_split_columns(key: F.Column) -> tuple[F.Column, F.Column]:
    """The engine's ONE definition of the reproducible 80/10/10 holdout:
    ``(bucket, split_label)`` from md5 of a key column (first 32 bits mod
    100). Shared by r_hash_split and the curation pipeline so the two can
    never silently diverge."""
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "validation")
        .otherwise("test")
    )
    return bucket, split


def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split by CONTENT-INDEPENDENT key
    hash -- the reproducible-holdout primitive of every training-data
    pipeline: md5 of the doc id, first 32 bits mod 100, 80/10/10.

    Unlike the seeded-RNG samples above, this is engine-portable (md5 is
    md5 everywhere), so membership is EXACTLY oracle-checked (sum of doc
    ids per split pins the assignment, not just the counts). Zero shuffle
    before the final 3-group aggregate; at 100 TB the same expression is a
    write-time partition column so each split reads its own files."""
    docs = load_table(spark, sf_dir, "documents")
    _bucket, split = hash_split_columns(F.col("doc_id"))
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum(F.length("text")).alias("sum_len"),
        )
        .orderBy("split")
    )


_EPOCH_SEED = "epoch7:"
_EPOCH_SHARDS = 8


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: a reproducible global permutation of
    the corpus for one training epoch, as HASH ORDERING rather than RNG
    state -- shard = md5(seed || doc_id) mod n_shards, within-shard order
    by the same hash. Changing the seed string re-shuffles the next epoch;
    re-running the same epoch reproduces it bit-for-bit on any engine
    (md5 is md5 everywhere -- same portability argument as
    ``hash_split``). This is the training-data ordering primitive: no
    sampler RNG to checkpoint, resumable mid-epoch at any (shard, rn).

    The result pins the permutation itself, not just membership:
    ``order_fp = SUM(rn * doc_id)`` changes if ANY two documents swap
    positions within a shard, and ``head_doc`` pins each shard's first
    document. Scale shape: at 100 TB this exact expression is
    ``repartitionByRange(shard, h)`` + a sorted write (the epoch
    materialization job); shards scale with the cluster, so the
    per-shard sort is the ordinary write-side sort, never a global
    single-partition ORDER BY."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.concat(F.lit(_EPOCH_SEED), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _EPOCH_SHARDS
    ).cast("int")
    base = docs.select("doc_id", h.alias("h"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    ordered = base.select(
        "shard", "doc_id", F.row_number().over(w).alias("rn")
    )
    return (
        ordered.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("rn") * F.col("doc_id")).cast("long").alias("order_fp"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("long")
            .alias("head_doc"),
        )
        .orderBy("shard")
    )


def sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k-per-group sample: exactly 5 documents per
    source, chosen by md5 rank of the doc id -- the reproducible
    "k examples per domain" primitive (inspection samples, per-domain eval
    slices, balanced few-shot pools). Unlike the seeded-RNG samplers above
    it is engine-portable, so MEMBERSHIP is exactly oracle-checked, and
    unlike a rate sampler it yields exactly k per group regardless of
    group size.

    Scale shape: the ``rn <= k`` filter triggers Catalyst's
    ``WindowGroupLimit`` pushdown (plan-gated, same as ``w_rank``): each
    map task keeps only its local bottom-k per source before the shuffle,
    so the exchange carries <= k x sources x tasks rows -- no full sort,
    no full-group materialization, at any corpus size."""
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


QUERIES = {
    "r_pivot": pivot_wide,
    "r_sample_bottomk": sample_bottomk,
    "r_hash_split": hash_split,
    "r_unpivot": unpivot_long,
    "r_sample_systematic": sample_systematic,
    "r_sample_pps": sample_pps,
    "r_sample_bernoulli": sample_bernoulli,
    "r_sample_stratified": sample_stratified,
    "r_sample_bernoulli_anchor": sample_bernoulli_anchor,
    "r_sample_stratified_anchor": sample_stratified_anchor,
    "r_epoch_shuffle": epoch_shuffle,
}

ORACLES = {
    "r_sample_bottomk": """
        SELECT * FROM (
            SELECT source, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 5
    """,
    "r_hash_split": """
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'validation'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(SUM(length(text)) AS BIGINT) AS sum_len
        FROM (
            SELECT doc_id, text,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 AS b
            FROM documents
        )
        GROUP BY 1 ORDER BY 1
    """,
    "r_pivot": """
        SELECT l_returnflag,
               ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O_qty,
               COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O_n,
               ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F_qty,
               COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F_n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "r_unpivot": """
        WITH long AS (
            SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
            UNION ALL
            SELECT p_partkey, 'p_size_d' AS metric, p_size::DOUBLE AS val FROM part
        )
        SELECT metric, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(val), 4) AS avg_val,
               ROUND(MIN(val), 4) AS min_val,
               ROUND(MAX(val), 4) AS max_val
        FROM long GROUP BY metric ORDER BY metric
    """,
    "r_sample_systematic": """
        SELECT l_returnflag, COUNT(*) AS n_sampled,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_price
        FROM lineitem WHERE l_orderkey % 7 = 0
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    # Pure integer arithmetic end to end: cumulative weight, the K-tick
    # grid, multiplicity -- the one weighted sampler that is exactly
    # reproducible on any engine (vs the seeded-RNG rows-only pair).
    "r_sample_pps": f"""
        WITH c AS (
            SELECT doc_id, source, n_chars,
                   SUM(n_chars) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(n_chars) OVER () AS w_total
            FROM documents
        )
        SELECT doc_id, source, n_chars,
               CAST(cw AS BIGINT) AS cum_weight,
               CAST((cw * {_PPS_K}) // w_total
                    - ((cw - n_chars) * {_PPS_K}) // w_total AS BIGINT)
                   AS n_ticks
        FROM c
        WHERE (cw * {_PPS_K}) // w_total
              - ((cw - n_chars) * {_PPS_K}) // w_total >= 1
        ORDER BY doc_id
    """,
    # The anchors' booleans/zeros are literals: the oracle recomputes the
    # exact population stats and PINS the guarantees; any sampler defect
    # flips the engine side and the driver hash catches it.
    "r_sample_bernoulli_anchor": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               TRUE AS binom_within_5sigma,
               CAST(0 AS BIGINT) AS n_run_diff
        FROM lineitem
    """,
    "r_sample_stratified_anchor": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_class,
               TRUE AS count_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "r_epoch_shuffle": """
        WITH s AS (
            SELECT doc_id, h,
                   CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % 8 AS INT)
                       AS shard
            FROM (
                SELECT doc_id,
                       md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            )
        ), r AS (
            SELECT shard, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY shard ORDER BY h, doc_id
                   ) AS rn
            FROM s
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(rn * doc_id) AS BIGINT) AS order_fp,
               CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
                   AS head_doc
        FROM r GROUP BY shard ORDER BY shard
    """,
}
