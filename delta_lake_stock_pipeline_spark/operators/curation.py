"""Training-corpus curation operators beyond the per-document text family:
benchmark-contamination detection, sequence packing, and domain mixing.

None of these exist in the reference (single-table stock pipeline,
SURVEY.md SS2.12); they are first-class here because every large-scale
LLM data pipeline runs all three between "raw corpus" and "training
batches":

* **Contamination** -- published pretraining pipelines remove training
  documents sharing long n-grams with evaluation benchmarks (the n-gram
  overlap decontamination described in the GPT-3 and subsequent public
  reports). The scale shape is a semi-join of the (huge) train n-gram
  posting table against the (small, broadcastable) benchmark n-gram set.
* **Sequence packing** -- concatenate-and-chunk: documents are laid out
  end-to-end in a deterministic order and cut into fixed token-capacity
  training sequences. Needs a GLOBAL running token offset, which is the
  canonical single-partition-window trap; implemented with the same
  two-phase range-partition + broadcast-offset decomposition as
  ``scale.global_row_ids``.
* **Domain mixing** -- per-source sampling rates (upweight wiki, downweight
  web crawl). Membership must be reproducible across engines and reruns,
  so rates apply to a content-independent md5 key bucket (shared
  definition: ``reshape.hash_split_columns``), never a seeded RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .reshape import hash_split_columns
from .scale import ranged_with_offsets

_NGRAM = 4
_SEQ_CAPACITY = 512
_PACK_RANGE_PARTITIONS = 16


def _gram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, gh) pairs: xxhash64 of each whitespace word 4-gram, distinct
    per doc. All-JVM (split/transform/xxhash64 inside codegen); hashing the
    grams before any join is what keeps the posting table narrow at 100 TB
    -- 8 bytes per gram instead of the gram text. Per-doc dedup happens
    with ``array_distinct`` BEFORE the explode, inside the row: a global
    ``.distinct()`` on the exploded pairs would shuffle the ENTIRE posting
    table just to dedup rows that are already co-located in one array.
    Measured at sf0.1 (warm, best-of-3): 0.85 s -> 0.65 s for the full
    contamination query, and the posting-table shuffle -- the term that
    grows with corpus size -- is gone entirely; isolated cold runs are
    ~4 s either way (JVM/codegen bring-up, the documented transient
    class)."""
    return docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), ' '), x -> x <> '')"
        ).alias("toks"),
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"""case when size(toks) < {_NGRAM} then array()
                        else transform(sequence(1, size(toks) - {_NGRAM - 1}),
                                       i -> xxhash64(array_join(slice(toks, i, {_NGRAM}), ' ')))
                        end"""
                )
            )
        ).alias("gh"),
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: which training documents share at least
    one word 4-gram with the held-out evaluation set (docs with
    ``doc_id % 10 == 0``), and how many distinct grams leak.

    Scale shape: the eval side is a benchmark suite -- thousands of
    documents, not billions -- so its distinct gram-hash set is explicitly
    ``broadcast()`` and the train posting table (the 100 TB side) is
    semi-joined map-side with NO shuffle of train grams. The exact-match
    decision is gram-hash equality (collision probability ~n^2/2^64,
    the same trade the dedup family documents)."""
    # NOT session-cached: unlike the dedup posting table (6+ consumer keys)
    # this relation has exactly one consumer, and persisting it cost more
    # inside the single timed call (4.0 s) than the second scan it saved
    # (2.7 s, measured at sf0.1). One shared gram relation, filtered per
    # side: an A/B against per-side document prefilters showed the shared
    # form wins (one codegen unit, and the eval-side doc filter pushes
    # into the scan anyway).
    grams = _gram_hashes(load_table(spark, sf_dir, "documents"))
    eval_grams = grams.filter(F.col("doc_id") % 10 == 0).select("gh").distinct()
    train_grams = grams.filter(F.col("doc_id") % 10 != 0)
    return (
        train_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


_BPE_NGRAM = 8


def token_gram_hashes(toks: DataFrame, n: int = _BPE_NGRAM) -> DataFrame:
    """Distinct n-gram hashes over a ``(doc_id, toks: array<string>)``
    frame: one posting row per (doc, distinct gram), gram identity =
    xxhash64 of the space-joined token window. Separated from
    ``contamination_check_bpe`` so the property test can drive it with
    arbitrary synthetic token streams against a brute-force mirror."""
    return toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"""case when size(toks) < {n} then array()
                        else transform(sequence(1, size(toks) - {n - 1}),
                                       i -> xxhash64(array_join(slice(toks, i, {n}), ' ')))
                        end"""
                )
            )
        ).alias("gh"),
    )


def contamination_check_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination in frozen-TOKENIZER space: which training
    documents share at least one 8-gram of BPE tokens with the held-out
    eval split (``doc_id % 10 == 0``), and how many distinct token grams
    leak. This is the form the published decontamination recipes actually
    run (GPT-3 appendix C, PaLM: 8-13 TOKEN n-grams, not word n-grams) --
    word-level ``c_contamination`` misses a leak that tokenizes
    identically but differs in whitespace; token-level doesn't.

    The gram stream deliberately crosses word boundaries: the token
    sequence a trained model consumes has no word-boundary privileges,
    so neither does the overlap scan (the ``§`` separator tokens are
    dropped BEFORE gramming on both engines).

    Scale shape: identical to ``c_contamination`` -- the eval side is a
    benchmark suite (thousands of docs), its distinct gram-hash set is
    ``broadcast()``, and the 100 TB train posting table is semi-joined
    map-side with no shuffle of train grams. Tokenization itself is the
    shared codegen'd replace chain (``text.with_bpe_columns``) -- scan
    speed, no UDF."""
    from .text import bpe_token_array_column, with_bpe_columns

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = with_bpe_columns(docs).select(
        "doc_id", bpe_token_array_column().alias("toks")
    )
    grams = token_gram_hashes(toks)
    eval_grams = grams.filter(F.col("doc_id") % 10 == 0).select("gh").distinct()
    train_grams = grams.filter(F.col("doc_id") % 10 != 0)
    return (
        train_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_bpe_grams"))
        .orderBy("doc_id")
    )


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents in doc_id order are laid
    end-to-end and cut into 512-token training sequences; each document
    reports the global token offset where it starts and the sequence ids it
    spans.

    The global running offset is ``SUM(n_tokens) OVER (ORDER BY doc_id)`` --
    which as a single window collapses the corpus into ONE task. Scalable
    decomposition (same as ``scale.global_row_ids``):

    1. ``repartitionByRange(doc_id)`` + ``localCheckpoint`` to pin the
       sampled range boundaries;
    2. per-partition token totals -> cumulative offsets (partition-count
       rows on the driver -- metadata, not data);
    3. per-partition cumulative window + broadcast-joined partition offset.

    Token convention matches ``t_token_count`` (whitespace split)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences(spark, docs)


def pack_sequences(
    spark: SparkSession,
    docs: DataFrame,
    capacity: int = _SEQ_CAPACITY,
) -> DataFrame:
    """Core packing over any ``(doc_id, n_tokens)`` frame (see
    ``sequence_packing`` for the algorithm and scale rationale); separated
    so property tests can drive it with arbitrary synthetic corpora. The
    global running offset comes from the shared two-phase decomposition
    (``scale.ranged_with_offsets``)."""
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = F.lit(capacity).cast("bigint")
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens") + F.col("off")).alias(
        "start_token"
    )
    packed = ranged_with_offsets(
        spark, docs, "doc_id", "n_tokens", _PACK_RANGE_PARTITIONS
    ).select("doc_id", "n_tokens", start)
    return packed.select(
        "doc_id",
        "n_tokens",
        "start_token",
        F.floor(F.col("start_token") / cap).alias("first_seq"),
        F.floor((F.col("start_token") + F.col("n_tokens") - 1) / cap).alias(
            "last_seq"
        ),
        (
            F.floor((F.col("start_token") + F.col("n_tokens") - 1) / cap)
            - F.floor(F.col("start_token") / cap)
            + 1
        ).alias("n_seqs"),
    ).orderBy("doc_id")


def sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``c_seq_packing`` over REAL subword counts: documents are measured
    with the frozen-BPE tokenizer (``t_bpe_tokens``'s 64 trained merges,
    one codegen'd replace-chain projection) instead of the whitespace
    approximation, then packed into 512-token sequences by the same
    two-phase global-offset core (``pack_sequences``). This is the
    production billing/packing contract -- sequence budgets are spent in
    tokenizer units, not words -- and the last missing stage of the
    curation chain (tokenize -> measure -> pack). Token measurement adds
    one map-side projection; the packing cost shape is unchanged."""
    from .text import bpe_token_count_column, with_bpe_columns

    docs = with_bpe_columns(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", bpe_token_count_column().alias("n_tokens"))
    return pack_sequences(spark, docs)


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sample: each source gets its own keep rate
    (``100 - 4 * source_index`` percent -- src0 kept fully, src19 at 24%),
    applied to the md5 key bucket shared with ``r_hash_split`` so
    membership is exact, engine-portable, and stable across reruns --
    resampling a domain never reshuffles the others.

    Pure narrow predicate (no shuffle before the final per-source
    aggregate); at 100 TB the same expression is a pushdown filter.
    ``sum_doc_id`` pins per-row membership, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    bucket, _split = hash_split_columns(F.col("doc_id"))
    rate = 100 - 4 * F.substring("source", 4, 10).cast("int")
    return (
        docs.withColumn("rate_pct", rate)
        .filter(bucket < F.col("rate_pct"))
        .groupBy("source", "rate_pct")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("source")
    )


_BLOCKLIST = ("slow", "big")
_BLOCK_RE = r"\b(" + "|".join(_BLOCKLIST) + r")\b"


def blocklist_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist scrubbing (the C4-style bad-word filter, applied here as
    redaction): per document, count blocklisted-term occurrences and emit
    the md5 of the redacted text -- the hash pins the EXACT redacted bytes,
    so the oracle match proves the rewrite, not just the counts.

    Pure JVM regex (``regexp_count``/``regexp_replace`` inside codegen),
    narrow per-row work, no shuffle before the final sort -- a pushdown-
    friendly scan at 100 TB, where this same expression runs as a
    write-time transform on ingest."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.regexp_count("text", F.lit(_BLOCK_RE)).cast("bigint").alias("n_hits"),
            F.md5(F.regexp_replace("text", _BLOCK_RE, "[BLOCKED]")).alias(
                "redacted_md5"
            ),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


_TEMP_BUCKETS = 1_000_000


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing (the XLM-R / mT5 multilingual
    alpha-sampling recipe, alpha = 0.5): high-resource languages are
    downsampled so sampling shares follow p_i^alpha instead of the raw
    corpus shares. With a fixed corpus the per-language keep rate that
    realizes those shares (scaled so the rarest language keeps
    everything) is ``(n_min / n_lang)^(1 - alpha)`` = ``sqrt(n_min /
    n_lang)`` -- computed with ``sqrt`` specifically because IEEE sqrt is
    correctly rounded on both engines, unlike ``pow``.

    Membership is the engine-portable md5 bucket (mod 1e6 for continuous
    rates), same family as ``domain_mix``/``r_hash_split``: exact,
    reproducible, and resampling one language never reshuffles another.
    Scale: one tiny per-language aggregate broadcasts; the corpus pass is
    a narrow pushdown-friendly filter. ``sum_doc_id`` pins per-row
    membership."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_lang"))
    n_min = counts.agg(F.min("n_lang").alias("n_min"))
    rated = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_lang",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_lang").cast("double")).alias(
            "rate"
        ),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _TEMP_BUCKETS
    )
    return (
        docs.withColumn("b", bucket)
        .join(F.broadcast(rated), "lang")
        .filter(F.col("b") < F.col("rate") * float(_TEMP_BUCKETS))
        .groupBy("lang", "n_lang", "rate")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        )
        .select(
            "lang",
            "n_lang",
            F.round(F.col("rate"), 6).alias("rate"),
            "n_kept",
            "sum_doc_id",
        )
        .orderBy("lang")
    )


def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling", arXiv:2302.03169): score every raw
    document by its importance weight under bag-of-hashed-ngram unigram
    models of a TARGET domain vs the RAW pool, and keep the top-k. The
    target here is ``source = 'src0'`` (the fixture's wiki-like slice);
    features are the same md5 64-bucket fold as ``t_feature_hash``, i.e.
    DSIR's hashed-feature trick: model state is two 64-cell count vectors
    regardless of corpus size.

    log w(x) = sum over tokens of ln(p_target(bucket)/p_raw(bucket)) with
    add-one smoothing. Determinism design (the `unigram_logprob`
    discipline): the per-BUCKET log-ratio is ONE ln of a ratio of exact
    long products, floor-quantized at 1e-6 -- so each doc's score is an
    exact LONG sum, order- and partition-independent, and the emitted
    ``logw_micro`` column is integer micro-nats needing no float compare
    at all. The paper's Gumbel-noise resampling step is rendered as the
    deterministic top-k (seeded Gumbel draws are not engine-portable;
    determinism is what makes the oracle exact).

    Scale shape: one explode + two 64-row count vectors (broadcastable at
    any corpus size -- THE point of hashed features), per-doc scoring is
    a 64-row broadcast join + map-side partial sum, then
    TakeOrderedAndProject. The two 1-row totals ride broadcast cross
    joins (allowlisted BNLJ class, like t_tfidf's)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')")
        ).alias("w"),
    )
    from .reshape import md5_bucket

    bucketed = toks.select(
        "doc_id",
        "source",
        md5_bucket(F.col("w"), 64).alias("b"),
    )
    tgt = bucketed.filter(F.col("source") == "src0")
    raw = bucketed.filter(F.col("source") != "src0")
    ct = tgt.groupBy("b").agg(F.count("*").alias("ct"))
    cr = raw.groupBy("b").agg(F.count("*").alias("cr"))
    # Corpus totals derived from the 64-row count vectors, NOT fresh
    # whole-corpus scans (review finding: the naive nt/nr aggregates
    # re-ran the explode+md5 pipeline twice more for two scalars).
    nt = ct.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    nr = cr.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
    # Full 64-bucket spine: buckets unseen in either corpus still get the
    # smoothed ratio, so scoring never drops a token.
    spine = spark.range(64).select(F.col("id").alias("b"))
    lrq = F.floor(
        F.log(
            ((F.coalesce(F.col("ct"), F.lit(0)) + 1) * (F.col("nr") + 64))
            * 1.0
            / ((F.coalesce(F.col("cr"), F.lit(0)) + 1) * (F.col("nt") + 64))
        )
        * 1000000
    ).cast("long")
    lr = (
        spine.join(F.broadcast(ct), "b", "left")
        .join(F.broadcast(cr), "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select("b", lrq.alias("lrq"))
    )
    return (
        raw.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            F.sum("lrq").cast("bigint").alias("logw_micro"),
        )
        .orderBy(F.desc("logw_micro"), "doc_id")
        .limit(25)
    )


def quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling -- the link that closes the
    curation chain feature-hash -> classifier -> SAMPLER: draw K
    systematic-PPS ticks proportional to each doc's trained-classifier
    quality mass (``text.qc_score_column``, the frozen CCNet/Gopher-style
    scorer), floored at 1 micro-unit so negative-scored docs keep a
    vanishing-but-nonzero draw probability (the standard
    temperature-floor stance, here exact). High-quality docs are drawn
    with multiplicity; sum(n_ticks) == K identically.

    Scale shape: one scan computes the score (constant-folded projection,
    no model broadcast), then the shared ``reshape.pps_select`` core --
    two-phase prefix decomposition, 1-row broadcast weight total. Both
    halves reuse the exact engine/oracle definitions of their parent keys
    (qc_score_sql, the PPS grid), so this key cannot drift from either."""
    from .reshape import _PPS_K, pps_select
    from .text import qc_score_column

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(qc_score_column(), F.lit(1).cast("long")).alias("q_weight"),
    )
    return (
        pps_select(spark, docs, "q_weight", _PPS_K)
        .select(
            "doc_id",
            "source",
            "q_weight",
            F.col("cw").alias("cum_weight"),
            "n_ticks",
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "c_contamination": contamination_check,
    "c_contamination_bpe": contamination_check_bpe,
    "c_seq_packing": sequence_packing,
    "c_seq_packing_bpe": sequence_packing_bpe,
    "c_domain_mix": domain_mix,
    "c_blocklist_redaction": blocklist_redaction,
    "c_temperature_mix": temperature_mix,
    "c_dsir": dsir_selection,
    "c_quality_mix": quality_mix,
}

from .reshape import md5_bucket_sql as _mb_sql

from .reshape import _PPS_K as _K
from .text import bpe_count_sql as _bpe_sql
from .text import bpe_token_list_sql as _bpe_list_sql
from .text import qc_score_sql as _qc_sql

ORACLES = {
    # The c_contamination oracle in BPE-token space: the SHARED frozen
    # tokenizer fragment (text.bpe_token_list_sql -- the same generated
    # replace chain the engine projects) produces the token list, then
    # 8-gram membership by STRING vs xxhash64 engine-side (equality
    # modulo hash collisions, which the match itself verifies). toks is
    # MATERIALIZED: the grams CTE is referenced twice (train + eval
    # sides) and the 64-replace chain is the expensive part.
    "c_contamination_bpe": f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, {_bpe_list_sql("text")} AS w
            FROM documents
        ), grams AS MATERIALIZED (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w) - 7, 0) + 1),
                       i -> array_to_string(w[i:i+7], ' '))) AS g
            FROM toks
        )
        SELECT t.doc_id, COUNT(*) AS n_shared_bpe_grams
        FROM grams t
        WHERE t.doc_id % 10 <> 0
          AND t.g IN (SELECT g FROM grams e WHERE e.doc_id % 10 = 0)
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    # The c_seq_packing oracle with the SHARED frozen-BPE count fragment
    # (text.bpe_count_sql -- the same generated replace chain the engine
    # projects) as the token measure.
    "c_seq_packing_bpe": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST({_bpe_sql("text")} AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS start_token
            FROM t
        )
        SELECT doc_id, n_tokens,
               CAST(start_token AS BIGINT) AS start_token,
               CAST(start_token // 512 AS BIGINT) AS first_seq,
               CAST((start_token + n_tokens - 1) // 512 AS BIGINT) AS last_seq,
               CAST((start_token + n_tokens - 1) // 512
                    - start_token // 512 + 1 AS BIGINT) AS n_seqs
        FROM c ORDER BY doc_id
    """,
    # Composition of the two parent oracles, one definition each: the
    # SHARED qc_score_sql classifier fragment (floored at 1) feeding the
    # r_sample_pps integer tick grid.
    "c_quality_mix": f"""
        WITH w AS (
            SELECT doc_id, source,
                   greatest({_qc_sql()}, 1) AS q_weight
            FROM documents
        ), c AS (
            SELECT doc_id, source, q_weight,
                   SUM(q_weight) OVER (ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(q_weight) OVER () AS w_total
            FROM w
        )
        SELECT doc_id, source, CAST(q_weight AS BIGINT) AS q_weight,
               CAST(cw AS BIGINT) AS cum_weight,
               CAST((cw * {_K}) // w_total
                    - ((cw - q_weight) * {_K}) // w_total AS BIGINT)
                   AS n_ticks
        FROM c
        WHERE (cw * {_K}) // w_total
              - ((cw - q_weight) * {_K}) // w_total >= 1
        ORDER BY doc_id
    """,
    # Same md5 bucket fold (the SHARED md5_bucket_sql fragment) and the
    # single-ln quantization: every logw_micro is an exact integer,
    # compared bit-for-bit.
    "c_dsir": f"""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ), bucketed AS (
            SELECT doc_id, source,
                   {_mb_sql("w", 64)} AS b
            FROM toks
        ), ct AS (
            SELECT b, COUNT(*) AS ct FROM bucketed
            WHERE source = 'src0' GROUP BY b
        ), cr AS (
            SELECT b, COUNT(*) AS cr FROM bucketed
            WHERE source <> 'src0' GROUP BY b
        ), tot AS (
            SELECT (SELECT COUNT(*) FROM bucketed
                    WHERE source = 'src0') AS nt,
                   (SELECT COUNT(*) FROM bucketed
                    WHERE source <> 'src0') AS nr
        ), lr AS (
            SELECT s.b,
                   CAST(FLOOR(ln(
                       ((COALESCE(ct.ct, 0) + 1) * (tot.nr + 64)) * 1.0
                       / ((COALESCE(cr.cr, 0) + 1) * (tot.nt + 64))
                   ) * 1000000) AS BIGINT) AS lrq
            FROM range(64) AS s(b)
            LEFT JOIN ct ON ct.b = s.b
            LEFT JOIN cr ON cr.b = s.b
            CROSS JOIN tot
        )
        SELECT r.doc_id, r.source,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(lr.lrq) AS BIGINT) AS logw_micro
        FROM bucketed r JOIN lr ON lr.b = r.b
        WHERE r.source <> 'src0'
        GROUP BY r.doc_id, r.source
        ORDER BY logw_micro DESC, doc_id
        LIMIT 25
    """,
    # Gram membership by STRING on the oracle side vs xxhash64 on the engine
    # side: equality modulo hash collisions, which the match itself verifies.
    "c_contamination": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
            FROM documents
        ), grams AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w) - 3, 0) + 1),
                       i -> array_to_string(w[i:i+3], ' '))) AS g
            FROM toks
        )
        SELECT t.doc_id, COUNT(*) AS n_shared_grams
        FROM grams t
        WHERE t.doc_id % 10 <> 0
          AND t.g IN (SELECT g FROM grams e WHERE e.doc_id % 10 = 0)
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    "c_seq_packing": """
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS start_token
            FROM t
        )
        SELECT doc_id, n_tokens,
               CAST(start_token AS BIGINT) AS start_token,
               CAST(start_token // 512 AS BIGINT) AS first_seq,
               CAST((start_token + n_tokens - 1) // 512 AS BIGINT) AS last_seq,
               CAST((start_token + n_tokens - 1) // 512
                    - start_token // 512 + 1 AS BIGINT) AS n_seqs
        FROM c ORDER BY doc_id
    """,
    "c_blocklist_redaction": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\b(slow|big)\b'))
                    AS BIGINT) AS n_hits,
               md5(regexp_replace(text, '\b(slow|big)\b', '[BLOCKED]', 'g'))
                   AS redacted_md5
        FROM documents
        WHERE len(regexp_extract_all(text, '\b(slow|big)\b')) > 0
        ORDER BY doc_id
    """,
    # Temperature mixing recomputed relationally: same sqrt rate (IEEE
    # correctly rounded on both engines), same md5 bucket idiom as
    # c_domain_mix, continuous rates via the 1e6 modulus.
    "c_temperature_mix": """
        WITH counts AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
            FROM documents GROUP BY lang
        ), m AS (
            SELECT MIN(n_lang) AS n_min FROM counts
        ), rated AS (
            SELECT lang, n_lang,
                   sqrt(CAST(n_min AS DOUBLE) / CAST(n_lang AS DOUBLE)) AS rate
            FROM counts, m
        ), b AS (
            SELECT doc_id, lang,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 1000000 AS b
            FROM documents
        )
        SELECT r.lang, r.n_lang, ROUND(r.rate, 6) AS rate,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(d.doc_id) AS BIGINT) AS sum_doc_id
        FROM b d JOIN rated r USING (lang)
        WHERE d.b < r.rate * 1000000.0
        GROUP BY r.lang, r.n_lang, r.rate ORDER BY r.lang
    """,
    "c_domain_mix": """
        SELECT source,
               CAST(100 - 4 * CAST(substr(source, 4) AS INTEGER) AS INTEGER)
                   AS rate_pct,
               COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
        FROM (
            SELECT doc_id, source,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 AS b
            FROM documents
        )
        WHERE b < 100 - 4 * CAST(substr(source, 4) AS INTEGER)
        GROUP BY source ORDER BY source
    """,
}
