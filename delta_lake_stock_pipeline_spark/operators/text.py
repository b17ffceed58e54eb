"""Text-analysis operators over ``documents`` (north-star extension set:
language-ID heuristic, quality scoring, token counting, fingerprinting).

All hot-path logic is built-in Catalyst expressions (split / transform /
filter / aggregate higher-order functions) -- no Python UDFs, so everything
stays in whole-stage codegen and scales with executor count, not driver
throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .reshape import hash_split_columns

# Marker stopwords per candidate language for the heuristic language-ID.
# Deliberately tiny + deterministic: the score is the count of marker tokens
# present; argmax with lexicographic tiebreak. (A production system would use
# char n-gram profiles; the *shape* -- per-doc bounded scoring, no shuffle --
# is the same.)
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht", "das"),
    "en": ("the", "a", "and", "of", "is"),
    "es": ("el", "la", "que", "los", "una"),
    "fr": ("le", "la", "et", "les", "des"),
}

_STOPWORDS = ("the", "a", "and", "of", "is", "to", "in")


def _tokens(col: str = "text"):
    return F.split(F.lower(F.col(col)), " ")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting: whitespace tokens + BPE-ish regex word pieces."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-zA-Z]+|[0-9]+")).cast("bigint").alias(
            "n_word_pieces"
        ),
        F.size(F.array_distinct(_tokens())).cast("bigint").alias("n_unique_tokens"),
    )


def word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 token frequency (explode -> two-phase hash-agg ->
    TakeOrderedAndProject)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


def feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009; the Vowpal
    Wabbit / scikit-learn ``HashingVectorizer`` primitive): each doc's
    tokens are folded into a fixed 64-bucket signed-count vector --
    bucket and sign from md5 of the token, weight = sum of signs. The
    point at scale is O(1) featurizer state: NO vocabulary build, no
    fit pass, no broadcast dictionary -- the million-feature corpus
    costs the same plan as the toy one (narrow ops + ONE shuffle on the
    (doc, bucket) hash-agg).

    Engine-portable by the same md5 contract as ``r_hash_split``
    (`operators/reshape.py:211`): md5 is md5 everywhere, so bucket,
    sign, and every weight are EXACT integers the oracle recomputes
    bit-for-bit. Zero-sum buckets are dropped on both sides (the sparse
    vector's natural form). The bucket fold is the SHARED
    ``reshape.md5_bucket`` definition (one contract with ``c_dsir``);
    the two md5 textual uses in one projection are deduplicated by
    codegen subexpression elimination (deterministic expression)."""
    from .reshape import md5_bucket

    docs = load_table(spark, sf_dir, "documents")
    hashed = (
        docs.select("doc_id", F.explode(_tokens()).alias("w"))
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            md5_bucket(F.col("w"), 64).cast("int").alias("bucket"),
            (
                F.lit(1)
                - F.lit(2)
                * (F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("long") % 2)
            ).alias("sign"),
        )
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
        .orderBy("doc_id", "bucket")
    )


# Frozen weights for t_quality_classifier, in integer micro-units: closed-
# form ridge regression (lambda=10, no seed, no iteration order) trained
# offline on the sf0.01 fixture -- labels = t_gopher_filter's keep decision,
# features = t_feature_hash's 64-bucket signed counts. Reproduce bit-for-bit
# with tools/train_quality_classifier.py (train acc 0.906, sf0.1 holdout
# 0.885). This is the bootstrap stage of a CCNet/Gopher-class pipeline:
# the hand rule labels a sample, the learned scorer prices the corpus.
_QC_WEIGHTS = [
    -2664, -52792, 0, 0, 0, 20862, 0, 0, 0, 0, 38813, 0, 38536, -26091,
    -15602, 0, 0, 0, 0, 16732, 0, 0, 18007, 11108, 0, 8948, 0, 14366, 0, 0,
    59136, -59170, -27870, 0, 0, 0, -15407, 0, 0, 11029, 0, 3409, 0, 0, 0,
    -92706, 0, 0, 27907, 33665, 0, 0, 0, 0, 0, 34484, 9516, 102593, -5549,
    0, 0, 41931, 0, 0,
]
_QC_BIAS = -1542155


def qc_score_column() -> F.Column:
    """The frozen classifier as ONE Catalyst expression over a ``text``
    column: exact BIGINT micro-unit score ``bias + sum over tokens of
    sign(token) * weight[bucket(token)]``. Shared by ``t_quality_classifier``
    and the quality-weighted sampler (``curation.quality_mix``) so the two
    keys cannot diverge on the model."""
    # One F.expr parse instead of a py4j round trip per weight (the
    # similarity._lit_vec rationale); SQL integer literals type-coerce
    # exactly as the F.lit ladder did.
    coefs = F.expr(
        "array(" + ", ".join(str(int(w)) for w in _QC_WEIGHTS) + ")"
    )
    return (
        F.aggregate(
            F.filter(_tokens(), lambda t: t != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.element_at(
                coefs,
                (
                    F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
                    % len(_QC_WEIGHTS)
                    + 1
                ).cast("int"),
            ).cast("long")
            * (
                F.lit(1)
                - F.lit(2)
                * (F.conv(F.substring(F.md5(x), 9, 8), 16, 10).cast("long") % 2)
            ),
        )
        + F.lit(_QC_BIAS)
    ).cast("long")


# DuckDB rendering of qc_score_column, interpolated into every consuming
# oracle (one definition, like reshape.md5_bucket_sql).
def qc_score_sql() -> str:
    from .reshape import md5_bucket_sql

    weights = ", ".join(str(w) for w in _QC_WEIGHTS)
    return f"""CAST(COALESCE(list_sum(list_transform(
                   list_filter(string_split(lower(text), ' '), x -> x <> ''),
                   x -> ([{weights}])[{md5_bucket_sql("x", len(_QC_WEIGHTS))} + 1]
                        * (1 - 2 * (CAST('0x' || substr(md5(x), 9, 8)
                                         AS BIGINT) % 2)))), 0)
                    + ({_QC_BIAS}) AS BIGINT)"""


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-quality-classifier scoring (the fasttext/logistic stage of
    CCNet- and Gopher-class curation pipelines): every document priced by
    a frozen linear scorer over its hashing-trick features, emitting the
    EXACT integer micro-unit score ``bias + sum over tokens of
    sign(token) * weight[bucket(token)]`` and the keep prediction.

    Scale shape: the dot product folds inside ONE codegen'd projection --
    ``aggregate`` over the token array with the 64 frozen weights as a
    constant-folded array literal, bucket/sign from the shared
    ``reshape.md5_bucket`` md5 contract -- so scoring is embarrassingly
    parallel with NO shuffle (the only exchange below the sort is the
    scan); a 100 TB corpus scores at scan speed. No vocabulary, no
    broadcast model, no UDF: the model IS an expression. Weights are
    integer micro-units, so engine and oracle scores are bit-identical
    (tools/train_quality_classifier.py regenerates them
    deterministically)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            qc_score_column().alias("score_micro"),
        )
        .withColumn("keep_pred", (F.col("score_micro") > 0).cast("int"))
        .orderBy("doc_id")
    )


def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per (lang, source): count + avg size metrics."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals: length, mean token length, stopword ratio,
    non-alpha char count. Pure columnar expressions per row -- embarrassingly
    parallel at any scale."""
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("bigint").alias("len_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round((F.length("text") - n_tok + 1) / n_tok, 4).alias("avg_token_len"),
        F.round(n_stop / n_tok, 4).alias("stopword_ratio"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("bigint").alias(
            "n_nonalnum"
        ),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: marker-stopword hit count per candidate
    language, argmax with deterministic tiebreak, 'und' (undetermined) when
    no marker hits. Compared against the fixture's labeled ``lang``."""
    toks = F.array_distinct(_tokens())
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(x) for x in markers])
        # single-arg lambda (PySpark dispatches on arity); F.filter invokes it
        # synchronously, so the loop-variable closure is safe
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    df = load_table(spark, sf_dir, "documents")
    for lang, score in scores.items():
        df = df.withColumn(f"score_{lang}", score)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(_LANG_MARKERS):  # lexicographic tiebreak: first max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("bigint").alias("marker_hits"),
    )


def content_fingerprint(col: str = "text") -> F.Column:
    """THE engine definition of a document's content hash: MD5 of
    whitespace-normalized lowercase text. Shared by ``t_fingerprint`` and
    the curation pipeline's exact-dedup keeper so the two can never
    silently diverge (same single-definition rule as
    ``reshape.hash_split_columns``)."""
    return F.md5(F.regexp_replace(F.lower(F.col(col)), "\\s+", " "))


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: MD5 of whitespace-normalized
    lowercase text (content hash for exact dedup) + its 8-hex-char prefix
    (bucketable short fingerprint)."""
    fp = content_fingerprint()
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        fp.alias("content_md5"),
        F.substring(fp, 1, 8).alias("fp8"),
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-style filters for
    boilerplate/spam): unique-token ratio, duplicate-2-gram fraction, and
    the share of the single most-repeated token.

    All three are WITHIN-ROW higher-order array expressions -- zero
    shuffle, zero Python, whole-stage codegen; the most-repeated count is
    a sort + run-length scan, O(N log N) per row instead of the naive
    O(unique x tokens) (measured 4x on the sf0.1 suite), bounded by
    document length (never by corpus size) -- the right place to spend
    the work at 100 TB.
    """
    # Materialize the token array ONCE as a projection column: inlining
    # split() inside the transform lambdas re-evaluates it per element
    # (O(tokens^2) chars split per doc -- measured 8 s vs 1 s at sf0.1).
    n = F.size(F.col("toks"))
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat_ws(' ', toks[i-1], toks[i]))"
    )
    # Longest equal-token run of the sorted token array == count of the
    # most-repeated token: O(N log N) per row, vs the naive
    # O(unique x tokens) transform/filter nest.
    top_cnt = F.expr(
        "aggregate("
        "  array_sort(toks),"
        "  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),"
        "  (a, x) -> named_struct("
        "      'prev', x,"
        "      'run',  if(a.prev is not null and x = a.prev, a.run + 1L, 1L),"
        "      'best', greatest(a.best,"
        "                       if(a.prev is not null and x = a.prev,"
        "                          a.run + 1L, 1L))),"
        "  a -> a.best)"
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .filter(n >= 2)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_tokens"),
            F.round(F.size(F.array_distinct(F.col("toks"))) / n, 4).alias(
                "uniq_ratio"
            ),
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(bigrams)) / F.size(bigrams), 4
            ).alias("dup_bigram_frac"),
            F.round(top_cnt / n, 4).alias("top_token_share"),
        )
        .orderBy("doc_id")
    )


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan -- the composed
    job an LLM-data user actually runs nightly:

    1. quality gate: token count in [10, 1000], unique-token ratio >= 0.3;
    2. exact dedup: one keeper (min doc_id) per normalized-content md5,
       via a window over the fingerprint -- one shuffle, no self-join;
    3. reproducible split: md5 hash bucket 80/10/10 (same expression as
       ``r_hash_split``);
    4. report: kept docs + chars per (lang, split).

    Everything stays in Catalyst: the only shuffles are the dedup window
    and the final small aggregate; at 100 TB both key on well-distributed
    hashes (content fp, lang) so no skew. Exactly oracle-checked."""
    from pyspark.sql import Window

    toks = _tokens()
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    fp = content_fingerprint()
    _bucket, split = hash_split_columns(F.col("doc_id"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .filter(n.between(10, 1000) & (uniq_ratio >= 0.3))
        .withColumn("fp", fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("lang", "split")
    )


def bigram_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigram frequency: adjacent-token pairs built with
    array higher-order functions (zero Python), then the same two-phase
    hash-agg + TakeOrderedAndProject shape as ``word_frequency``.

    Pairs are formed on the RAW token positions (then pairs touching an
    empty token dropped), so the count is position-faithful -- the n-gram
    statistic an LM-data pipeline wants, and exactly what the oracle's
    pos+1 self-join computes.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        "filter("
        "  transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        "            (t, i) -> struct(t AS a, toks[i + 1] AS b)),"
        "  p -> p.a <> '' AND p.b <> '')"
    )
    return (
        docs.select(_tokens().alias("toks"))
        .select(F.explode(pairs).alias("p"))
        .select(F.concat_ws(" ", "p.a", "p.b").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score (the CCNet-style language-model filter,
    reduced to its unigram core): per document, the mean negative log
    probability of its tokens under the corpus unigram distribution --
    low = boilerplate-ish common tokens, high = rare/noisy tokens; real
    pipelines bucket on exactly this signal.

    Determinism design: per-WORD ``floor(ln(c/N) * 1e6)`` is computed once
    in the (deterministic) unigram table, so the per-doc aggregate is a sum
    of LONGS -- order-independent, partitioning-independent -- and the only
    float steps (one division, one round) are identical single expressions
    on both engines. A naive ``avg(ln(p))`` over doubles would depend on
    accumulation order and could not be exactly oracled.

    Scale shape: the unigram table is |vocab| rows (millions at 100 TB --
    broadcastable) built with one explode + hash-agg over the corpus; the
    per-doc pass is a broadcast join on the token, partial-aggregated
    map-side. The corpus total N rides along as a 1-row broadcast cross
    join, never a driver round-trip."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')")
        ).alias("w"),
    )
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("n_corpus"))
    logq = counts.crossJoin(F.broadcast(total)).select(
        "w",
        F.floor(
            F.log(F.col("c").cast("double") / F.col("n_corpus")) * 1000000
        ).cast("long").alias("q"),
    )
    return (
        toks.join(F.broadcast(logq), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            F.round(
                -F.sum("q").cast("double") / (F.count("*") * F.lit(1000000.0)), 4
            ).alias("nats_per_token"),
        )
        .orderBy("doc_id")
    )


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality score -- the KenLM-class filter one
    rung above ``t_unigram_logprob``: per document (>= 2 tokens), the
    mean negative log probability of its bigram transitions under
    ``p(w|prev) = 0.75 * c(prev,w)/c(prev) + 0.25 * c(w)/N`` (fixed-weight
    Jelinek-Mercer interpolation; the unigram backoff term keeps unseen
    continuations finite). Repetitive/boilerplate text scores LOW
    (predictable transitions), noisy text HIGH -- the CCNet-style
    perplexity bucketing signal, at bigram order.

    Determinism design (the ``unigram_logprob`` discipline, one order
    up): the only float steps -- two divisions, one add, one ln -- form a
    SINGLE scalar expression of (c_bigram, c_ctx, c_uni, N) evaluated
    once per distinct bigram in the deterministic LM table, floored to
    integer micro-nats; the per-doc aggregate is then a sum of LONGS,
    accumulation-order-free on any partitioning. The bigram stream
    itself is a zero-shuffle per-row HOF (``transform(sequence(...))``
    over the token array, 1-based ``element_at`` on both engines).

    Scale shape: token explode -> two hash-aggs (bigram counts, context
    counts from the SAME stream, so the definitions cannot drift at
    document boundaries) + the unigram table; the scored join is
    broadcast here (|distinct bigrams| fixture-small). At 100 TB the
    bigram table outgrows broadcast -> plain shuffle join on (prev, w)
    with map-side partial sums; everything else is unchanged. Context
    counts are derived from the bigram stream (NOT the unigram table):
    c(prev) must count non-final positions only, or p would leak mass
    at document ends."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias(
                "toks"
            ),
        )
        .filter(F.size("toks") >= 2)
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(toks)), i -> "
                "struct(element_at(toks, i - 1) as prev, "
                "element_at(toks, i) as w))"
            )
        ).alias("b"),
    ).select("doc_id", "b.prev", "b.w")
    uni = docs.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count("*").alias("cu")
    )
    total = uni.agg(F.sum("cu").alias("n_corpus"))
    cb = bg.groupBy("prev", "w").agg(F.count("*").alias("cb"))
    cc = bg.groupBy("prev").agg(F.count("*").alias("cc"))
    lm = (
        cb.join(cc, "prev")
        .join(uni, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "prev",
            "w",
            F.floor(
                F.log(
                    F.lit(0.75) * F.col("cb") / F.col("cc")
                    + F.lit(0.25) * F.col("cu") / F.col("n_corpus")
                )
                * 1000000
            )
            .cast("long")
            .alias("q"),
        )
    )
    return (
        bg.join(F.broadcast(lm), ["prev", "w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                -F.sum("q").cast("double") / (F.count("*") * F.lit(1000000.0)),
                4,
            ).alias("nats_per_bigram"),
        )
        .orderBy("doc_id")
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: the top-20 (document, term) pairs by term-frequency x
    inverse-document-frequency -- the classic distinctive-term signal that
    curation pipelines use for topic tagging and keyword extraction.

    Determinism design (same discipline as ``unigram_logprob``): the float
    step ``floor(ln(N/df) * 1e6)`` is a pure scalar expression of (N, df)
    -- no accumulation -- so it yields bit-identical idf_q wherever it is
    evaluated, and the per-pair score ``tf * idf_q`` is exact LONG
    arithmetic; ordering and the final round are identical single
    expressions on both engines, with a (doc_id, w) tiebreak.

    Scale shape: the corpus is exploded ONCE -- hash-agg to (doc_id, w)
    term frequencies (one shuffle, map-side partial), then document
    frequency is a window ``count(*) over (partition by w)`` over that
    vocab x docs relation (a second, much smaller shuffle; spill-able
    per-word buffering handles stopword skew), so no self-join and no
    re-read of the text column. A join-based df would either recompute the
    corpus explode (column pruning defeats Catalyst's ReuseExchange on the
    two tf subtrees -- measured) or require broadcasting a vocab-sized
    table. The corpus doc count N rides along as a 1-row broadcast cross
    join (never a driver round-trip); the top-20 is TakeOrderedAndProject
    -- per-task partial top-k, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')")
        ).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").cast("bigint").alias("tf"))
    w_word = Window.partitionBy("w")
    with_df = tf.select(
        "doc_id", "w", "tf", F.count("*").over(w_word).cast("bigint").alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        with_df.crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            "tf",
            "df",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("n_docs").cast("double") / F.col("df")) * 1000000
                ).cast("long")
            ).alias("score_q"),
        )
        .orderBy(F.desc("score_q"), "doc_id", "w")
        .limit(20)
        .select(
            "doc_id",
            "w",
            "tf",
            "df",
            F.round(F.col("score_q").cast("double") / 1000000.0, 6).alias("tfidf"),
        )
    )


# Winnowing parameters (Schleimer/Wilkerson/Aiken, SIGMOD'03): word 4-gram
# hashes, window 5 -- the guarantee is that any shared run of
# k + w - 1 = 8 words leaves at least one shared fingerprint.
_WINNOW_K = 4
_WINNOW_W = 5


def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints per document: hash every word
    4-gram, slide a 5-hash window, keep each window's minimum -- the
    classic local fingerprint whose guarantee (any 8-word shared run
    shares a fingerprint) underlies plagiarism/near-dup index builds.

    Unlike the contamination/dedup posting tables (xxhash64, values never
    compared cross-engine), the fingerprint VALUES here are the output, so
    the gram hash is the repo's engine-portable md5 idiom (first 15 hex
    chars -> 60-bit bigint, ``reshape.hash_split_columns``'s trick); the
    per-doc checksum of the distinct-fingerprint set is an exact integer
    sum, so the oracle pins the full fingerprint SET, not just counts.

    Scale shape: pure per-row higher-order functions inside whole-stage
    codegen -- ZERO shuffles, no joins; the map-only index-build pass a
    100 TB fingerprinting job wants. (Pair finding over the emitted
    fingerprints is the separate inverted-index shape already implemented
    by ``d_span_dedup``.)"""
    return (
        winnow_windows(load_table(spark, sf_dir, "documents"))
        # array_distinct is staged once (same reason the token array is
        # staged in winnow_windows: no common-subexpression elimination
        # across interpreted HOF calls).
        .select(
            "doc_id",
            "n_grams",
            F.size("fps").cast("bigint").alias("n_windows"),
            F.expr("array_min(fps)").cast("bigint").alias("fp_min"),
            F.array_distinct("fps").alias("fps_d"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_windows",
            F.size("fps_d").cast("bigint").alias("n_fp"),
            "fp_min",
            F.expr("aggregate(fps_d, 0L, (acc, x) -> acc + x % 1000000007)")
            .cast("bigint")
            .alias("fp_checksum"),
        )
    )


def winnow_windows(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, fps) -- the raw per-window minimum-hash stream
    (pre-distinct). Exposed so the guarantee test can intersect two
    documents' fingerprint SETS directly."""
    k, w = _WINNOW_K, _WINNOW_W
    # The token array is STAGED as a column before the gram transform:
    # higher-order functions are CodegenFallback with no loop-invariant
    # hoisting, so inlining the tokenize expression inside the lambda
    # re-tokenizes the document once per gram index (O(L^2)) -- measured
    # ~3x slower on the sf0.1 documents table, identical output.
    hashes = (
        f"case when size(tk) < {k} then array()"
        f" else transform(sequence(1, size(tk) - {k - 1}),"
        f" i -> cast(conv(substr(md5(array_join(slice(tk, i, {k}), ' ')),"
        f" 1, 15), 16, 10) as bigint)) end"
    )
    fps = (
        f"case when size(h) = 0 then array()"
        f" when size(h) < {w} then array(array_min(h))"
        f" else transform(sequence(1, size(h) - {w - 1}),"
        f" i -> array_min(slice(h, i, {w}))) end"
    )
    return (
        docs.select(
            "doc_id",
            F.expr("filter(split(lower(text), ' '), x -> x <> '')").alias("tk"),
        )
        .select("doc_id", F.expr(hashes).alias("h"))
        .select(
            "doc_id",
            F.size("h").cast("bigint").alias("n_grams"),
            F.expr(fps).alias("fps"),
        )
    )


def gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (the published rule family from
    the Gopher/MassiveText report, reduced to the rules the fixture can
    express): word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, alphabetic-word fraction, and minimum stopword presence --
    reported per source as pass/fail-breakdown counts (what a curation run
    logs before dropping).

    Exactness: every ratio rule is evaluated by INTEGER cross-
    multiplication (3n <= sum_len <= 10n instead of 3 <= sum/n <= 10), so
    no float ever enters a comparison and the oracle matches exactly.
    Scale: pure per-row Catalyst expressions plus one rollup-sized
    hash-agg -- zero Python, one shuffle."""
    toks = F.expr("filter(split(lower(text), ' '), x -> x <> '')")
    base = load_table(spark, sf_dir, "documents").select(
        "source",
        toks.alias("tk"),
        # Explicit whitespace class, NOT \s: Java regex \s includes
        # U+000B (vertical tab) while DuckDB's RE2 \s excludes it, so the
        # two engines would disagree on symbol counts for text containing
        # one. The literal class is identical on both sides.
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 \\t\\n\\r\\f]", "")).alias(
            "n_sym"
        ),
    )
    n = F.size("tk")
    sum_len = F.expr("aggregate(tk, 0, (a, x) -> a + length(x))")
    n_alpha = F.expr("size(filter(tk, x -> x rlike '[a-zA-Z]'))")
    n_stop = F.size(F.array_intersect(F.col("tk"), F.array(*[F.lit(s) for s in _STOPWORDS])))
    flags = base.select(
        "source",
        n.between(50, 100000).alias("ok_len"),
        ((sum_len >= 3 * n) & (sum_len <= 10 * n)).alias("ok_wordlen"),
        (10 * F.col("n_sym") <= n).alias("ok_symbol"),
        (5 * n_alpha >= 4 * n).alias("ok_alpha"),
        (n_stop >= 2).alias("ok_stop"),
    )
    all_ok = (
        F.col("ok_len")
        & F.col("ok_wordlen")
        & F.col("ok_symbol")
        & F.col("ok_alpha")
        & F.col("ok_stop")
    )

    def n_fail(c: str) -> F.Column:
        return F.sum((~F.col(c)).cast("int")).cast("bigint").alias(f"n_fail_{c[3:]}")

    return flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(all_ok.cast("int")).cast("bigint").alias("n_pass"),
        n_fail("ok_len"),
        n_fail("ok_wordlen"),
        n_fail("ok_symbol"),
        n_fail("ok_alpha"),
        n_fail("ok_stop"),
    )


def bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BM25: the top-20 (document, term) pairs by the Okapi BM25
    score (k1=1.2, b=0.75) -- the standard retrieval scorer, used in
    curation pipelines to rank documents against benchmark/topic probes
    (the retrieval sibling of ``t_tfidf``'s distinctive-term signal).

    Determinism design: the ONLY transcendental -- ``ln`` of the
    (N, df)-scalar Robertson idf -- is quantized ``floor(ln(.)*1e6)/1e6``
    exactly like ``t_tfidf``; every other term (tf, doc length, corpus
    totals) is an exact BIGINT, and the final score is ONE identically-
    parenthesized double expression on both engines, so ordering and the
    rounded emit agree bit-for-bit.

    Scale shape: one corpus explode -> (doc,w) hash-agg; doc length and
    document frequency are two windows over that same relation (no
    re-read, no self-join); corpus totals come from ONE extra docs
    aggregate that counts tokens via size() without exploding, riding as
    a 1-row broadcast; the top-20 is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), x -> x <> '')")
        ).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").cast("bigint").alias("tf"))
    staged = tf.select(
        "doc_id",
        "w",
        "tf",
        F.sum("tf").over(Window.partitionBy("doc_id")).cast("bigint").alias("len_d"),
        F.count("*").over(Window.partitionBy("w")).cast("bigint").alias("df"),
    )
    # ONE 1-row aggregate over docs: total_len counts tokens via size()
    # of the filtered array -- no second explode of the corpus (review
    # finding: a toks.agg here re-ran the tokenize scan end to end).
    totals = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.expr("filter(split(lower(text), ' '), x -> x <> '')")))
        .cast("bigint")
        .alias("total_len"),
    )
    nd = F.col("n_docs").cast("double")
    idf = (
        F.floor(F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0) * 1000000)
        / 1000000.0
    )
    den = (
        F.col("tf")
        + F.lit(0.3)
        + F.lit(0.9)
        * (F.col("len_d") * F.col("n_docs"))
        / F.col("total_len").cast("double")
    )
    score = idf * (F.col("tf") * F.lit(2.2)) / den
    return (
        staged.crossJoin(F.broadcast(totals))
        .select("doc_id", "w", "tf", "df", "len_d", score.alias("score_raw"))
        .orderBy(F.desc("score_raw"), "doc_id", "w")
        .limit(20)
        .select(
            "doc_id",
            "w",
            "tf",
            "df",
            "len_d",
            F.round(F.col("score_raw"), 6).alias("bm25"),
        )
    )


# PII patterns shared verbatim between engine and oracle. Written in the
# RE2 ∩ java.util.regex common dialect: character classes, bounded
# repetition, and [.] instead of escaped dots -- no word boundaries, no
# lookaround, so Spark and DuckDB match identical spans.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_IP = "10[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PII_PHONE = "555-[0-9]{4}"

# The fixture corpus contains no @-signs or digits (verified), so the
# PII to detect is synthesized deterministically from doc_id -- the SAME
# concat/repeat/lpad expression on both engines (the multimodal
# deterministic-fake stance: the detection/redaction machinery is real,
# the sensitive strings are manufactured). Emails repeat 1 + doc_id % 3
# times so the count column actually varies.
_PII_AUG_SQL = """concat(
    coalesce(text, ''),
    repeat(concat(' user', cast(doc_id as string), '@mail',
                  cast(doc_id % 7 as string), '.com'),
           cast(1 + doc_id % 3 as int)),
    ' phone 555-', lpad(cast(doc_id % 10000 as string), 4, '0'),
    ' ip 10.', cast(doc_id % 256 as string),
    '.', cast(doc_id * 7 % 256 as string),
    '.', cast(doc_id * 13 % 256 as string))"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the documents corpus: per document,
    count email / phone / IPv4-literal matches, then mask all three
    (emails first, then IPs, then phones) and pin the redacted text by
    md5 and length -- the compliance scrub every training-data pipeline
    runs before publishing a corpus. The redacted md5 makes the check
    byte-exact: any span drift between engines flips the hash.

    Scale shape: embarrassingly parallel -- one scan, per-row regex
    evaluation inside whole-stage codegen, no shuffle except the
    deterministic final sort."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.expr(_PII_AUG_SQL)
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL, "[EMAIL]"), PII_IP, "[IP]"
        ),
        PII_PHONE,
        "[PHONE]",
    )

    def n(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(aug, F.lit(pat), 0)).cast("long")

    return docs.select(
        "doc_id",
        n(PII_EMAIL).alias("n_email"),
        n(PII_PHONE).alias("n_phone"),
        n(PII_IP).alias("n_ip"),
        F.md5(masked).alias("masked_md5"),
        F.length(masked).cast("long").alias("masked_len"),
    ).orderBy("doc_id")


def _pii_oracle() -> str:
    """Mirror of pii_redaction: the aug expression is the SHARED SQL
    string (valid in both dialects); DuckDB's regexp_replace needs the
    explicit 'g' flag to match Spark's replace-all default."""
    return f"""
        WITH aug AS (
            SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{PII_EMAIL}', 0)) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(t, '{PII_PHONE}', 0)) AS BIGINT)
                   AS n_phone,
               CAST(len(regexp_extract_all(t, '{PII_IP}', 0)) AS BIGINT)
                   AS n_ip,
               md5(regexp_replace(regexp_replace(regexp_replace(
                       t, '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_IP}', '[IP]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g')) AS masked_md5,
               CAST(length(regexp_replace(regexp_replace(regexp_replace(
                       t, '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_IP}', '[IP]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g')) AS BIGINT)
                   AS masked_len
        FROM aug ORDER BY doc_id
    """


def novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: of a document's distinct 3-word
    shingles, how many appear in NO earlier document (first corpus
    occurrence = min doc_id) -- the contribution-scoring signal dedup-
    aware curation uses to rank near-redundant documents by what they
    actually add. Emits (doc_id, n_distinct, n_novel, novelty_bp) with
    the ratio in exact basis points via integer division; documents
    with fewer than 3 tokens have no shingles and are absent on both
    engines.

    Scale shape: one corpus explode -> distinct (doc, gram) hash-agg;
    first-owner is a second hash-agg over the same relation keyed on
    the gram; one gram-keyed join back. Identical shape to the TF-IDF
    document-frequency pass -- no self-joins, no windows over the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            F.expr(
                "filter(split(lower(text), ' '), x -> x <> '')"
            ).alias("tk"),
        )
        .where(F.size("tk") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, size(tk) - 2),"
                    " (t, i) -> concat_ws(' ', t, tk[i + 1], tk[i + 2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_distinct",
            "n_novel",
            F.expr(
                "CAST((10000 * n_novel) DIV n_distinct AS BIGINT)"
            ).alias("novelty_bp"),
        )
        .orderBy("doc_id")
    )


# Mirror of novelty(): trigrams via the bigram oracle's
# generate_subscripts position self-join, extended one position.
_NOVELTY_ORACLE = """
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           x -> x <> '') AS l
        FROM documents
    ),
    toks AS (
        SELECT doc_id, unnest(l) AS tok,
               generate_subscripts(l, 1) AS pos
        FROM tk
    ),
    grams AS (
        SELECT DISTINCT a.doc_id,
               concat(a.tok, ' ', b.tok, ' ', c.tok) AS g
        FROM toks a
        JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    first AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((10000 * SUM(CASE WHEN f.first_doc = gr.doc_id
                                  THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS novelty_bp
    FROM grams gr JOIN first f ON gr.g = f.g
    GROUP BY gr.doc_id ORDER BY gr.doc_id
"""


# --- frozen BPE tokenization (VERDICT r9 task 5) --------------------------
#
# The 64-merge table below is FROZEN output of tools/train_bpe.py --
# classic Sennrich-style BPE trained deterministically on the sf0.01
# corpus (lexicographic tiebreak, sorted iteration; re-running the
# trainer reproduces it bit-for-bit, asserted by
# test_properties.py::test_bpe_trainer_reproduces_frozen_merges).
# Every token is alphanumeric by the trainer's safe-token restriction,
# so the literals below mean the same bytes in Spark SQL and DuckDB.
_BPE_MERGES = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"),
    ("in", "e"),
    ("l", "ine"),
    ("a", "b"),
    ("ab", "l"),
    ("abl", "e"),
    ("at", "a"),
    ("d", "ata"),
    ("t", "able"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("e", "y"),
    ("k", "ey"),
)

# Word separator in the flat token string: outside the corpus alphabet
# (ASCII fixture, asserted by the trainer and the charset probe), never
# part of a merge, so replaces can never cross a word boundary.
_BPE_SEP = "§"


def bpe_merge_chain_sql(inner: str) -> str:
    """The 64 frozen merges as ONE nested chain of plain SQL ``replace``
    calls over a DOUBLE-space-delimited token string (every token is
    rendered ``' tok '``, so neighbors meet on two spaces): merge
    (a, b) -> ab is ``replace(s, ' a  b ', ' ab ')``. The double-space
    rendering is what makes left-to-right non-overlapping replace-all
    EXACTLY one left-to-right BPE merge pass: each match consumes only
    the INNER space of each boundary, so adjacent occurrences
    (``a b a b``, or a run of a repeated token) never overlap -- with
    single spacing the trailing space of one match is the leading space
    of the next and replace silently skips it (caught by the hypothesis
    property test, which pins this chain against the reference per-word
    merge passes). The replacement keeps single edge spaces, so the
    invariant survives every merge inductively. Applying merges in
    training order, each as one full pass, is exact BPE application: a
    merge can never create an adjacency for an EARLIER pair (merging
    never deletes tokens between two others). Shared verbatim by the
    Spark engine and the DuckDB oracle -- ``replace`` is
    dialect-identical, so the generated expression cannot drift."""
    expr = inner
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    return expr


def bpe_token_list_sql(col: str = "text") -> str:
    """DuckDB-side LIST of BPE tokens for ``col``: whitespace runs to
    the separator, every char rendered ``' c '`` (the double-space token
    form), the shared merge chain, then the non-separator tokens (the
    trimmed string splits on the preserved DOUBLE space). Shared by the
    count below and the c_contamination_bpe gram oracle."""
    base = (
        "regexp_replace(regexp_replace("
        f"{col}, '\\s+', '{_BPE_SEP}', 'g'), '(.)', ' \\1 ', 'g')"
    )
    merged = bpe_merge_chain_sql(base)
    return (
        f"list_filter(string_split(trim({merged}), '  '), "
        f"t -> t <> '{_BPE_SEP}' AND t <> '')"
    )


def bpe_count_sql(col: str = "text") -> str:
    """DuckDB-side count of BPE tokens for ``col``. Reused by the
    c_seq_packing_bpe oracle."""
    return f"len({bpe_token_list_sql(col)})"


def bpe_token_array_column() -> F.Column:
    """Engine-side ARRAY of BPE tokens from the ``__bpe_merged`` staging
    column -- the twin of ``bpe_token_list_sql``, shared by the count
    below, ``t_bpe_vocab``, and ``c_contamination_bpe``."""
    return F.filter(
        F.split(F.trim(F.col("__bpe_merged")), "  "),
        lambda t: (t != F.lit(_BPE_SEP)) & (t != F.lit("")),
    )


def bpe_token_count_column() -> F.Column:
    """Exact BIGINT BPE token count for a ``text`` column -- the engine
    twin of ``bpe_count_sql``, shared with ``c_seq_packing_bpe``."""
    return F.size(bpe_token_array_column()).cast("bigint")


def with_bpe_columns(docs: DataFrame) -> DataFrame:
    """Attach ``__bpe_base`` / ``__bpe_merged`` staging columns: the
    merge chain is one codegen'd projection of nested JVM ``replace``
    calls -- scan-speed subword tokenization, no UDF, no Python.

    The input is repartitioned to the cluster's parallelism first: the
    projection is CPU-bound (64 string passes per doc), and a small
    fixture parquet arrives as ONE input split, which would serialize
    the whole tokenizer onto one core (measured: 3.5 s single-task vs
    ~0.5 s spread at sf0.1). At 100 TB the scan's own splits provide the
    parallelism and the repartition collapses to a cheap no-op-shaped
    shuffle of (doc_id, text) -- CPU-heavy map work should be split by
    available cores, not input bytes."""
    base = F.regexp_replace(
        F.regexp_replace(F.col("text"), r"\s+", _BPE_SEP), "(.)", " $1 "
    )
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return docs.withColumn("__bpe_base", base).withColumn(
        "__bpe_merged", F.expr(bpe_merge_chain_sql("__bpe_base"))
    )


def bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-subword (BPE) tokenization -- the production stage between
    raw text and sequence packing that the whitespace ``t_token_count``
    approximates: apply the 64 deterministically trained merges
    (``_BPE_MERGES``; reference: Sennrich et al. 2016) to every document
    and report the exact subword token count plus the md5 of the full
    tokenized string, which pins the EXACT token sequence, not just its
    length, against the oracle's independent application of the same
    merge table.

    Scale shape: the whole tokenizer is one generated projection of
    nested ``replace`` calls over a space-delimited char string --
    whole-stage-codegen'd JVM string work, embarrassingly parallel,
    no shuffle except the deterministic output sort. A 100k-merge
    production table would move the loop into a Pandas-UDF trie walk
    (the w_macd Arrow-twin pattern); 64 merges stay cheaper JVM-side."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        with_bpe_columns(docs)
        .select(
            "doc_id",
            bpe_token_count_column().alias("n_bpe_tokens"),
            F.md5("__bpe_merged").alias("bpe_md5"),
        )
        .orderBy("doc_id")
    )


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 SUBWORD frequency: explode the frozen-BPE token
    stream (same shared tokenizer columns as ``t_bpe_tokens``) into a
    two-phase hash-agg -- the vocabulary-audit query every tokenized
    corpus runs (which subwords dominate the token budget). Deterministic
    top-20 via (count DESC, token) total order. Map-side partial
    aggregation bounds the shuffle at |vocab| per partition."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = with_bpe_columns(docs).select(
        F.explode(bpe_token_array_column()).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


QUERIES = {
    "t_novelty": novelty,
    "t_pii_redaction": pii_redaction,
    "t_token_count": token_count,
    "t_repetition": repetition_stats,
    "t_curation_pipeline": curation_pipeline,
    "t_word_frequency": word_frequency,
    "t_doc_stats": doc_stats,
    "t_quality_score": quality_score,
    "t_lang_id": lang_id,
    "t_fingerprint": fingerprint,
    "t_bigram_frequency": bigram_frequency,
    "t_unigram_logprob": unigram_logprob,
    "t_bigram_logprob": bigram_logprob,
    "t_tfidf": tfidf_top_terms,
    "t_bm25": bm25_top_terms,
    "t_winnow": winnow_fingerprint,
    "t_gopher_filter": gopher_filter,
    "t_feature_hash": feature_hash,
    "t_quality_classifier": quality_classifier,
    "t_bpe_tokens": bpe_tokens,
    "t_bpe_vocab": bpe_vocab,
}

_MARKER_SQL = {
    lang: "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    for lang, markers in _LANG_MARKERS.items()
}
_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"

from .reshape import md5_bucket_sql as _mb_sql

ORACLES = {
    # Independent application of the SAME frozen merge table: the
    # dialect-shared bpe_merge_chain_sql replace chain over DuckDB's own
    # regex staging; the md5 pins the exact token sequence byte-for-byte,
    # so any drift in the chain, the separator handling, or the merge
    # order mismatches the driver hash.
    "t_bpe_tokens": f"""
        WITH s AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(
                       text, '\\s+', '{_BPE_SEP}', 'g'),
                       '(.)', ' \\1 ', 'g') AS b
            FROM documents
        ), m AS (
            SELECT doc_id, {bpe_merge_chain_sql("b")} AS merged FROM s
        )
        SELECT doc_id,
               CAST(len(list_filter(string_split(trim(merged), '  '),
                        t -> t <> '{_BPE_SEP}' AND t <> ''))
                    AS BIGINT) AS n_bpe_tokens,
               md5(merged) AS bpe_md5
        FROM m ORDER BY doc_id
    """,
    # Same staging as t_bpe_tokens, unnested into the corpus-level
    # subword frequency; (n DESC, token) makes the 20-row cut total.
    "t_bpe_vocab": f"""
        WITH s AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(
                       text, '\\s+', '{_BPE_SEP}', 'g'),
                       '(.)', ' \\1 ', 'g') AS b
            FROM documents
        ), m AS (
            SELECT doc_id, {bpe_merge_chain_sql("b")} AS merged FROM s
        ), tok AS (
            SELECT unnest(list_filter(string_split(trim(merged), '  '),
                          t -> t <> '{_BPE_SEP}' AND t <> '')) AS token
            FROM m
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok GROUP BY token
        ORDER BY n DESC, token LIMIT 20
    """,
    # Trigram novelty; every value BIGINT, ratio in exact basis points.
    "t_novelty": _NOVELTY_ORACLE,
    # Shared aug expression + shared regex constants; md5-pinned redaction.
    "t_pii_redaction": _pii_oracle(),
    # Frozen _QC_WEIGHTS interpolated into BOTH engine and oracle via the
    # SHARED qc_score_sql fragment (same md5 bucket/sign fold as
    # t_feature_hash). Its COALESCE covers the token-less doc (Spark's
    # aggregate returns the 0 accumulator; DuckDB's list_sum of an empty
    # list is NULL).
    "t_quality_classifier": f"""
        WITH scored AS (
            SELECT doc_id, {qc_score_sql()} AS score_micro
            FROM documents
        )
        SELECT doc_id, score_micro,
               CAST(score_micro > 0 AS INT) AS keep_pred
        FROM scored
        ORDER BY doc_id
    """,
    # Same md5-derived bucket/sign contract as r_hash_split's oracle;
    # the bucket fragment is the SHARED md5_bucket_sql definition.
    "t_feature_hash": f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ), hashed AS (
            SELECT doc_id,
                   CAST({_mb_sql("w", 64)} AS INT) AS bucket,
                   1 - 2 * (CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) % 2)
                       AS sign
            FROM toks
        )
        SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
        FROM hashed
        GROUP BY doc_id, bucket
        HAVING SUM(sign) <> 0
        ORDER BY doc_id, bucket
    """,
    "t_curation_pipeline": """
        WITH scored AS (
            SELECT doc_id, lang, n_chars,
                   md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
                   len(string_split(lower(text), ' ')) AS n_toks,
                   len(list_distinct(string_split(lower(text), ' ')))
                       / len(string_split(lower(text), ' ')) AS uniq_ratio,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 AS b
            FROM documents
        ),
        kept AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM scored
            WHERE n_toks BETWEEN 10 AND 1000 AND uniq_ratio >= 0.3
        )
        SELECT lang,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'validation'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
        FROM kept WHERE rn = 1
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "t_repetition": """
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(len(list_distinct(toks)) / len(toks), 4) AS uniq_ratio,
               ROUND(1.0 - len(list_distinct(bigrams)) / len(bigrams), 4)
                   AS dup_bigram_frac,
               ROUND(list_max(list_transform(list_distinct(toks),
                         t -> len(list_filter(toks, x -> x = t)))) / len(toks), 4)
                   AS top_token_share
        FROM (
            SELECT doc_id,
                   string_split(lower(text), ' ') AS toks,
                   list_transform(range(1, len(string_split(lower(text), ' '))),
                       i -> string_split(lower(text), ' ')[i] || ' ' ||
                            string_split(lower(text), ' ')[i+1]) AS bigrams
            FROM documents
        )
        WHERE len(toks) >= 2
        ORDER BY doc_id
    """,
    "t_token_count": """
        SELECT doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+')) AS BIGINT)
                   AS n_word_pieces,
               CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT)
                   AS n_unique_tokens
        FROM documents
    """,
    "t_word_frequency": """
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
    "t_bigram_frequency": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS tok,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS pos
            FROM documents
        )
        SELECT concat(a.tok, ' ', b.tok) AS bigram, COUNT(*) AS n
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.tok <> '' AND b.tok <> ''
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
    "t_doc_stats": """
        SELECT lang, source, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               MAX(n_chars) AS max_chars
        FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
    "t_quality_score": f"""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS len_chars,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
               ROUND((LENGTH(text) - len(string_split(lower(text), ' ')) + 1)
                     / len(string_split(lower(text), ' ')), 4) AS avg_token_len,
               ROUND(len(list_filter(string_split(lower(text), ' '),
                                     t -> list_contains({_STOP_SQL}, t)))
                     / len(string_split(lower(text), ' ')), 4) AS stopword_ratio,
               CAST(LENGTH(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT)
                   AS n_nonalnum
        FROM documents
    """,
    "t_lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_filter(list_distinct(string_split(lower(text), ' ')),
                       t -> list_contains({_MARKER_SQL['de']}, t))) AS score_de,
                   len(list_filter(list_distinct(string_split(lower(text), ' ')),
                       t -> list_contains({_MARKER_SQL['en']}, t))) AS score_en,
                   len(list_filter(list_distinct(string_split(lower(text), ' ')),
                       t -> list_contains({_MARKER_SQL['es']}, t))) AS score_es,
                   len(list_filter(list_distinct(string_split(lower(text), ' ')),
                       t -> list_contains({_MARKER_SQL['fr']}, t))) AS score_fr
            FROM documents
        )
        SELECT doc_id, lang AS labeled_lang,
               CASE WHEN GREATEST(score_de, score_en, score_es, score_fr) <= 0
                        THEN 'und'
                    WHEN score_de = GREATEST(score_de, score_en, score_es, score_fr)
                        THEN 'de'
                    WHEN score_en = GREATEST(score_de, score_en, score_es, score_fr)
                        THEN 'en'
                    WHEN score_es = GREATEST(score_de, score_en, score_es, score_fr)
                        THEN 'es'
                    ELSE 'fr' END AS predicted_lang,
               CAST(GREATEST(score_de, score_en, score_es, score_fr) AS BIGINT)
                   AS marker_hits
        FROM scored
    """,
    "t_fingerprint": """
        SELECT doc_id,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_md5,
               SUBSTRING(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 8)
                   AS fp8
        FROM documents
    """,
    # Per-word integer-scaled logs (floor(ln(c/N)*1e6)) make the per-doc
    # aggregate an exact LONG sum; ln is correctly-rounded libm on both
    # engines, and the single final divide+round is the identical
    # expression -- see unigram_logprob's determinism note.
    # Integer cross-multiplied ratio rules -- no float comparisons.
    "t_gopher_filter": """
        WITH f AS (
            SELECT source,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS tk,
                   LENGTH(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]',
                                         '', 'g'))
                       AS n_sym
            FROM documents
        ), flags AS (
            SELECT source,
                   len(tk) BETWEEN 50 AND 100000 AS ok_len,
                   list_sum(list_transform(tk, x -> length(x)))
                       BETWEEN 3 * len(tk) AND 10 * len(tk) AS ok_wordlen,
                   10 * n_sym <= len(tk) AS ok_symbol,
                   5 * len(list_filter(tk,
                           x -> regexp_matches(x, '[a-zA-Z]')))
                       >= 4 * len(tk) AS ok_alpha,
                   len(list_intersect(tk, {stop})) >= 2 AS ok_stop
            FROM f
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN ok_len AND ok_wordlen AND ok_symbol
                              AND ok_alpha AND ok_stop
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_len,
               CAST(SUM(CASE WHEN NOT ok_wordlen THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_fail_wordlen,
               CAST(SUM(CASE WHEN NOT ok_symbol THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_fail_symbol,
               CAST(SUM(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_fail_alpha,
               CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail_stop
        FROM flags
        GROUP BY source
    """.replace("{stop}", _STOP_SQL),
    # The md5-conv gram hash is bit-identical on both engines, so the
    # checksum pins the full distinct-fingerprint SET per document.
    "t_winnow": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS tk
            FROM documents
        ), h AS (
            SELECT doc_id,
                   CASE WHEN len(tk) < 4 THEN []::BIGINT[]
                        ELSE list_transform(
                            range(1, len(tk) - 3 + 1),
                            i -> CAST('0x' || substr(
                                     md5(array_to_string(tk[i:i+3], ' ')),
                                     1, 15) AS BIGINT))
                   END AS hs
            FROM toks
        ), f AS (
            SELECT doc_id,
                   CAST(len(hs) AS BIGINT) AS n_grams,
                   CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                        WHEN len(hs) < 5 THEN [list_min(hs)]
                        ELSE list_transform(
                            range(1, len(hs) - 4 + 1),
                            i -> list_min(hs[i:i+4]))
                   END AS fps
            FROM h
        )
        SELECT doc_id, n_grams,
               CAST(len(fps) AS BIGINT) AS n_windows,
               CAST(len(list_distinct(fps)) AS BIGINT) AS n_fp,
               CAST(list_min(fps) AS BIGINT) AS fp_min,
               CAST(coalesce(list_sum(list_transform(list_distinct(fps),
                                                     x -> x % 1000000007)),
                             0) AS BIGINT) AS fp_checksum
        FROM f
    """,
    # Mirrors the engine exactly: one floor(ln(N/df)*1e6) per word, exact
    # LONG tf*idf_q scoring, (score desc, doc_id, w) deterministic order.
    # BM25: identical parenthesization to the engine expression; the one
    # transcendental (Robertson idf's ln) is floor-quantized at 1e-6 like
    # t_tfidf's; everything else is exact BIGINT feeding one double
    # expression, so ordering and the rounded emit agree bit-for-bit.
    # k1/b literals are CAST(... AS DOUBLE): DuckDB types bare 2.2/0.9/0.3
    # as DECIMAL and would evaluate tf*2.2 decimal-exact, a last-ulp drift
    # vs Spark's double arithmetic at near-tie boundaries.
    "t_bm25": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ), tf AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, w
        ), staged AS (
            SELECT doc_id, w, tf,
                   CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS len_d,
                   CAST(COUNT(*) OVER (PARTITION BY w) AS BIGINT) AS df
            FROM tf
        ), totals AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS total_len
        ), scored AS (
            SELECT doc_id, w, tf, df, len_d,
                   (floor(ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                             / (df + 0.5) + 1.0) * 1000000) / 1000000.0)
                   * (tf * CAST(2.2 AS DOUBLE))
                   / (tf + CAST(0.3 AS DOUBLE)
                      + CAST(0.9 AS DOUBLE) * (len_d * n_docs)
                      / CAST(total_len AS DOUBLE)) AS score_raw
            FROM staged, totals
        )
        SELECT doc_id, w, tf, df, len_d, ROUND(score_raw, 6) AS bm25
        FROM scored
        ORDER BY score_raw DESC, doc_id, w
        LIMIT 20
    """,
    "t_tfidf": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ), tf AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, w
        ), dfreq AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
        ), idf AS (
            SELECT w, df,
                   CAST(floor(ln(CAST((SELECT COUNT(*) FROM documents)
                                      AS DOUBLE) / df) * 1000000)
                        AS BIGINT) AS idf_q
            FROM dfreq
        )
        SELECT doc_id, w, tf, df,
               ROUND(CAST(tf * idf_q AS DOUBLE) / 1000000.0, 6) AS tfidf
        FROM tf JOIN idf USING (w)
        ORDER BY tf * idf_q DESC, doc_id, w
        LIMIT 20
    """,
    "t_unigram_logprob": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents
        ), cnt AS (
            SELECT w, COUNT(*) AS c FROM toks GROUP BY w
        ), lq AS (
            SELECT w,
                   CAST(floor(ln(CAST(c AS DOUBLE)
                                 / (SELECT SUM(c) FROM cnt)) * 1000000)
                        AS BIGINT) AS q
            FROM cnt
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               ROUND(-CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0), 4)
                   AS nats_per_token
        FROM toks t JOIN lq USING (w)
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    # The unigram oracle one order up: bigram stream via the same 1-based
    # element_at/list indexing HOF, context counts FROM the bigram stream,
    # the interpolation + ln + floor as ONE scalar expression per distinct
    # bigram (micro-nat LONGs; same float-determinism discipline).
    "t_bigram_logprob": """
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS toks
            FROM documents
        ), d2 AS (
            SELECT doc_id, toks FROM d WHERE len(toks) >= 2
        ), bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(2, len(toks) + 1),
                                         i -> struct_pack(
                                             prev := toks[i - 1],
                                             w := toks[i]))) AS b
            FROM d2
        ), bgf AS (
            SELECT doc_id, b.prev AS prev, b.w AS w FROM bg
        ), uni AS (
            SELECT w, COUNT(*) AS cu
            FROM (SELECT unnest(toks) AS w FROM d2)
            GROUP BY w
        ), cb AS (
            SELECT prev, w, COUNT(*) AS cb FROM bgf GROUP BY prev, w
        ), cc AS (
            SELECT prev, COUNT(*) AS cc FROM bgf GROUP BY prev
        ), lm AS (
            SELECT cb.prev, cb.w,
                   CAST(floor(ln(0.75 * CAST(cb.cb AS DOUBLE)
                                      / CAST(cc.cc AS DOUBLE)
                                 + 0.25 * CAST(uni.cu AS DOUBLE)
                                        / (SELECT SUM(cu) FROM uni))
                              * 1000000) AS BIGINT) AS q
            FROM cb
            JOIN cc ON cb.prev = cc.prev
            JOIN uni ON cb.w = uni.w
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0), 4)
                   AS nats_per_bigram
        FROM bgf t JOIN lm ON t.prev = lm.prev AND t.w = lm.w
        GROUP BY t.doc_id ORDER BY t.doc_id
    """,
}
