"""Plan-quality gates (SURVEY.md §4): the scale-critical physical-plan
properties asserted per operator class. These run explain-only (no jobs),
so they are cheap and catch plan regressions (a lost pushdown, a broadcast
that became a shuffle) before any benchmark would."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from delta_lake_stock_pipeline_spark import plans
from delta_lake_stock_pipeline_spark.operators import all_queries
from delta_lake_stock_pipeline_spark.sources.fixtures import load_table

_Q = all_queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plans.assert_pushed_filters(_Q["f_filter_eq"](spark, sf_dir), "l_returnflag")
    plans.assert_pushed_filters(_Q["f_filter_range"](spark, sf_dir), "o_orderdate")


def test_projection_prunes_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plans.assert_read_schema_only(df, {"l_orderkey", "l_quantity"})


def test_small_dim_join_broadcasts(spark, sf_dir):
    plans.assert_broadcast_join(_Q["j_broadcast"](spark, sf_dir))


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plans.assert_top_k(_Q["o4_topk"](spark, sf_dir))
    plans.assert_top_k(_Q["v_cosine_topk"](spark, sf_dir))


def test_groupby_has_partial_aggregate(spark, sf_dir):
    feats = plans.plan_features(_Q["a1_group_count"](spark, sf_dir))
    assert feats.has_partial_aggregate, "groupBy.count should partial-agg map-side"


def test_aggregate_query_shuffles_once(spark, sf_dir):
    """flagship: scan -> partial agg -> ONE exchange -> final agg -> top-k.
    More exchanges would mean a redundant repartition crept in."""
    feats = plans.plan_features(_Q["a0_flagship_daily_rollup"](spark, sf_dir))
    assert feats.n_exchanges <= 1, f"expected <=1 shuffle, got {feats.n_exchanges}"
    assert feats.has_take_ordered


def test_pure_catalyst_queries_have_no_python_boundary(spark, sf_dir):
    """Relational/agg/join/window queries must stay JVM-side end to end --
    a stray UDF in the hot path shows up as an Arrow/pickle eval node."""
    for name in ("a0_flagship_daily_rollup", "j_sortmerge", "w_rank", "t_token_count"):
        feats = plans.plan_features(_Q[name](spark, sf_dir))
        assert feats.n_python_boundaries == 0, f"{name} crosses into Python"


def test_udf_queries_use_arrow_not_pickle(spark, sf_dir):
    """The pandas-UDF paths must compile to ArrowEvalPython / *InPandas
    (vectorized), and only the deliberate row-UDF query may use
    BatchEvalPython (pickled rows)."""
    for name in ("u_pandas_udf", "u_apply_in_pandas", "u_map_in_pandas"):
        text = plans.plan_string(_Q[name](spark, sf_dir))
        assert "BatchEvalPython" not in text, f"{name} fell back to pickled rows"
    assert "BatchEvalPython" in plans.plan_string(_Q["u_py_udf"](spark, sf_dir))


def test_partition_filter_prunes_partitioned_table(spark, tmp_path):
    """End-to-end pruning on a partitioned write: predicate on the partition
    column must land in PartitionFilters, not post-scan Filter."""
    from delta_lake_stock_pipeline_spark import storage

    path = str(tmp_path / "t")
    bars = storage.with_derived_columns(
        storage.synthesize_bars(spark, n_tickers=2, n_days=2, bars_per_day=10)
    )
    storage.write_partitioned(bars, path)
    df = storage.read_table(spark, path).filter(F.col("ticker") == "AAPL")
    feats = plans.plan_features(df)
    assert any("ticker" in pf for pf in feats.partition_filters), feats.partition_filters


def test_hint_produces_shuffled_hash_join(spark, sf_dir):
    """The SHUFFLE_HASH hint must actually change the physical strategy."""
    plan = (
        _Q["j_hint_shuffle_hash"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan


def test_q21_decorrelates_to_semi_and_anti(spark, sf_dir):
    """The EXISTS / NOT EXISTS pair must compile to one LeftSemi and one
    LeftAnti join -- not a correlated per-row subquery or a cross product."""
    plan = (
        _Q["h_q21_sole_late_supplier"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q19_pushes_disjunctive_part_filter(spark, sf_dir):
    """The brand disjunction must reach the part scan as a pushed filter
    (Or(...Brand#...)), not be evaluated only post-join."""
    plan = (
        _Q["h_q19_disjunctive_revenue"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # One fragment per scan; which scan prints first is not deterministic
    # across sessions, so accept the Brand disjunction in ANY scan's pushed
    # list (the metadata string is truncated at ~100 chars, but the brand
    # predicate leads the part scan's list).
    fragments = plan.split("PushedFilters: [")[1:]
    assert fragments, "no scan reported pushed filters"
    assert any("Brand#" in frag[:200] for frag in fragments), fragments


def test_q11_having_is_broadcast_not_subquery(spark, sf_dir):
    """Q11's HAVING-vs-global-fraction must compile to a broadcast of the
    1-row total (one scan+shuffle of the fact), never a per-row subquery."""
    feats = plans.plan_features(_Q["h_q11_important_stock"](spark, sf_dir))
    assert feats.has_broadcast_hash_join or "BroadcastNestedLoop" in plans.plan_string(
        _Q["h_q11_important_stock"](spark, sf_dir)
    )
    assert feats.n_python_boundaries == 0


def test_fuzzy_and_pairwise_blocked_joins_stay_jvm_and_parallel(spark, sf_dir):
    """The blocked self-joins (levenshtein, pairwise cosine) must be pure
    JVM and must spread the probe side across partitions (a single-task
    quadratic comparison is the degenerate plan we fixed)."""
    for name in ("d_fuzzy_levenshtein", "v_pairwise_neardup"):
        df = _Q[name](spark, sf_dir)
        feats = plans.plan_features(df)
        assert feats.n_python_boundaries == 0, f"{name} crosses into Python"
        assert "hashpartitioning" in plans.plan_string(df).lower(), (
            f"{name}: probe side is not spread across partitions"
        )


def test_levenshtein_single_eval_in_residual(spark, sf_dir):
    """The banded-threshold levenshtein must appear exactly once in the
    join residual (the two-sided `0 <= d <= 10` form evaluates the DP
    twice per candidate pair)."""
    text = plans.plan_string(_Q["d_fuzzy_levenshtein"](spark, sf_dir))
    join_lines = [l for l in text.splitlines() if "Join" in l and "levenshtein" in l]
    assert join_lines, "levenshtein no longer evaluated as a join residual"
    assert all(l.count("levenshtein") == 1 for l in join_lines), join_lines


def test_theta_binned_has_no_nested_loop_join(spark, sf_dir):
    """The binned theta form exists to kill the O(|S|*|C|)
    BroadcastNestedLoopJoin; its plan must contain none -- the only
    data-scale join is the bin equi-join carrying the `<` residual."""
    text = plans.plan_string(_Q["j_theta_binned"](spark, sf_dir))
    assert "BroadcastNestedLoop" not in text, text
    assert "CartesianProduct" not in text


def test_bloom_filter_injected_into_fact_scan_side(spark, sf_dir):
    """j_bloom_pruned exists to demonstrate Catalyst's runtime bloom-filter
    injection: the optimized plan must build a bloom_filter_agg sketch on
    the selective orders side and pre-filter lineitem with might_contain
    before the shuffle; and the scoped confs must be restored afterwards."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = _Q["j_bloom_pruned"](spark, sf_dir)
    text = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in text, text
    assert "might_contain" in text, text
    # Caller-session confs untouched (the query plans in a child session).
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    # Transforming the returned frame RE-PLANS; the injection must survive
    # because the frame is bound to the scoped child session (r2 advice).
    retext = df.filter("n_items >= 0")._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in retext, retext


def test_lateral_join_decorrelates_to_window(spark, sf_dir):
    """JOIN LATERAL with per-row ORDER BY/LIMIT must decorrelate into a
    windowed rank (one shuffle of orders) -- executing the subquery per
    customer row, or a nested-loop join, would not survive scale."""
    text = plans.plan_string(_Q["j_lateral_topn"](spark, sf_dir))
    assert "Window" in text, text
    assert "BroadcastNestedLoop" not in text, text
    assert "CartesianProduct" not in text


def test_global_row_ids_stable_across_invocations(spark, sf_dir):
    """repartitionByRange samples to pick boundaries; the localCheckpoint
    inside global_row_ids must pin one placement so the counted rows are
    the numbered rows -- repeated runs must give byte-identical ids."""
    a = sorted(map(tuple, _Q["x_global_row_ids"](spark, sf_dir).collect()))
    b = sorted(map(tuple, _Q["x_global_row_ids"](spark, sf_dir).collect()))
    assert a == b


def test_ivf_query_prunes_to_probed_partitions(spark, sf_dir):
    """The IVF query must read ONLY the probed clusters' partition
    directories: `cluster IN (...)` in PartitionFilters, not a post-scan
    Filter over the whole corpus -- that pruning IS the IVF speedup."""
    feats = plans.plan_features(_Q["v_ann_ivf"](spark, sf_dir))
    assert any("cluster" in pf and " IN " in pf for pf in feats.partition_filters), (
        feats.partition_filters
    )


def test_ivf_recall_anchored_to_exact_topk(spark, sf_dir):
    """IVF is approximate by design; recall@10 vs the exact brute-force
    anchor must stay high (nprobe/K = 4/16 trades a bounded recall loss
    for reading 1/4 of the corpus)."""
    exact = {r["vec_id"] for r in _Q["v_cosine_topk"](spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in _Q["v_ann_ivf"](spark, sf_dir).collect()}
    assert len(exact & approx) >= 8, f"recall@10 dropped: {sorted(exact & approx)}"


def test_bucketed_join_rollup_has_no_exchange_below_join(spark, sf_dir):
    """st_bucketed_join_rollup's fact-fact join must consume the bucketed
    layout: SortMergeJoin directly over the sorted bucket scans, ZERO
    Exchange below the join -- the only exchanges allowed are the
    post-join aggregate's and the presentation sort's."""
    plan = plans.plan_string(_Q["st_bucketed_join_rollup"](spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    join_pos = plan.find("SortMergeJoin")
    tree = plan[: plan.find("(1) Scan")]
    # In the formatted tree the join's subtree follows its node; assert no
    # Exchange line appears after the join line within the tree section.
    assert "Exchange" not in tree[join_pos:], plan
    assert plans.plan_features(
        _Q["st_bucketed_join_rollup"](spark, sf_dir)
    ).n_exchanges == 2, plan


def test_max_drawdown_aggregate_reuses_window_partitioning(spark, sf_dir):
    """w_max_drawdown's peak window and final aggregate share user_id; the
    group-by must reuse the window's hash partitioning -- exactly one
    hashpartitioning exchange (the presentation sort's rangepartitioning
    is the only other exchange allowed)."""
    df = _Q["w_max_drawdown"](spark, sf_dir)
    plan = plans.plan_string(df)
    assert plan.count("hashpartitioning") == 1, plan
    assert plans.plan_features(df).n_exchanges <= 2, plan


def test_donchian_extrema_share_one_window_exec(spark, sf_dir):
    """w_donchian's upper/lower bands use the same PRIOR-20 window spec;
    both frame extrema must land in ONE WindowExec over one series
    sort/shuffle (the bar agg's exchange is the only other one)."""
    df = _Q["w_donchian"](spark, sf_dir)
    plan = plans.plan_string(df)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert plans.plan_features(df).n_exchanges == 2, plan


def test_rolling_median_is_single_shuffle_single_window(spark, sf_dir):
    """w_rolling_median materializes the frame explicitly; collect_list
    and count share one window spec -> ONE WindowExec, and the whole
    query is ONE exchange (tick-level, no bar stage)."""
    df = _Q["w_rolling_median"](spark, sf_dir)
    plan = plans.plan_string(df)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert plans.plan_features(df).n_exchanges == 1, plan


def test_sharpe_aggregate_reuses_window_partitioning(spark, sf_dir):
    """w_sharpe's final moment aggregate groups by event_type, the same
    key the returns window partitioned by -- the partial/final agg pair
    must sit directly on the window output with no third exchange."""
    df = _Q["w_sharpe"](spark, sf_dir)
    plan = plans.plan_string(df)
    assert plans.plan_features(df).n_exchanges == 2, plan
    assert "partial_count" in plan, plan  # map-side partials present


def test_ivfpq_recall_anchored_to_exact_topk(spark, sf_dir):
    """IVF-PQ composes two approximations; recall@10 after the shortlist
    rerank must stay high (measured 9/9/9 at sf0.001/0.01/0.1; the anchor
    pins >= 8)."""
    exact = {r["vec_id"] for r in _Q["v_cosine_topk"](spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in _Q["v_ann_ivfpq"](spark, sf_dir).collect()}
    assert len(exact & approx) >= 8, f"recall@10 dropped: {sorted(exact & approx)}"


def test_ivfpq_query_prunes_to_probed_partitions(spark, sf_dir):
    """The IVF-PQ candidate scan must read ONLY the probed clusters'
    partition directories of the CODES artifact -- `cluster IN (...)` in
    PartitionFilters; the pruning multiplying the 64x code compression is
    the whole point of the composition."""
    feats = plans.plan_features(_Q["v_ann_ivfpq"](spark, sf_dir))
    assert any("cluster" in pf and " IN " in pf for pf in feats.partition_filters), (
        feats.partition_filters
    )


def test_pq_recall_anchored_to_exact_topk(spark, sf_dir):
    """PQ+ADC is approximate by design; recall@10 after the 100-row
    shortlist rerank must stay high (measured 10/10/9 at
    sf0.001/0.01/0.1 with the PQ4x8 codebooks -- the anchor pins >= 8)."""
    exact = {r["vec_id"] for r in _Q["v_cosine_topk"](spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in _Q["v_ann_pq"](spark, sf_dir).collect()}
    assert len(exact & approx) >= 8, f"recall@10 dropped: {sorted(exact & approx)}"


def test_pq_scoring_pass_prunes_embedding_column(spark, sf_dir):
    """The ADC scoring scan must NOT shuffle the float vectors: the
    shortlist ordering is TakeOrderedAndProject over (adc_ip, vec_id),
    so only shortlist rows carry the embedding into the exact rerank."""
    text = plans.plan_string(_Q["v_ann_pq"](spark, sf_dir))
    assert "TakeOrderedAndProject" in text, text


def test_pq_encoder_nulls_and_determinism(spark, sf_dir):
    """The Arrow PQ encoder must NULL-out bad rows (NULL / wrong-length
    embeddings) instead of crashing the batch, and encode deterministically
    across invocations."""
    from pyspark.sql import functions as F

    from delta_lake_stock_pipeline_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _pq_codebooks,
        _pq_codes_udf,
    )

    books = _pq_codebooks(spark, sf_dir)
    udf = _pq_codes_udf(books)
    bad = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0]), (3, [0.0] * 64)],
        "id long, embedding array<float>",
    ).select("id", udf(F.col("embedding")).alias("codes"))
    got = {r["id"]: r["codes"] for r in bad.collect()}
    assert got[1] is None and got[2] is None
    assert len(got[3]) == _PQ_M and all(0 <= c < _PQ_K for c in got[3])

    from delta_lake_stock_pipeline_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = sorted(
        (r["vec_id"], tuple(r["c"]))
        for r in emb.select("vec_id", udf(F.col("embedding")).alias("c")).collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["c"]))
        for r in emb.select("vec_id", udf(F.col("embedding")).alias("c")).collect()
    )
    assert a == b


def test_salted_join_actually_shuffles(spark, sf_dir):
    """x_salted_skew_join must take the shuffle-join path: a broadcast of
    the salted dim would never shuffle the fact, so the (user_id, salt)
    spreading it demonstrates would be dead code."""
    text = plans.plan_string(_Q["x_salted_skew_join"](spark, sf_dir))
    assert "ShuffledHashJoin" in text
    assert "BroadcastHashJoin" not in text


def test_anti_join_is_nonempty(spark, sf_dir):
    """j_anti must return rows at fixture scale -- a 0==0 oracle match
    proves nothing about LeftAnti semantics."""
    assert _Q["j_anti"](spark, sf_dir).count() > 0


# Queries ALLOWED to contain a nested-loop join: the 1-row scalar-subquery
# broadcasts (q11's global fraction, q22's avg balance -- a 1-row build side
# is exactly what BNLJ is for) and the deliberate brute-force theta join,
# whose scale twin j_theta_binned is gated to have none.
_BNLJ_OK = {
    "h_q11_important_stock",
    "h_q22_dormant_customers",
    "j_theta",
    # Corpus-total N rides along as a 1-row broadcast cross join.
    "t_unigram_logprob",
    # Same idiom one order up: the 1-row corpus total meets the
    # distinct-bigram LM table.
    "t_bigram_logprob",
    "t_tfidf",
    # Same class: (n_docs x total_len) is a 1-row broadcast cross join.
    "t_bm25",
    # Same class: the 1-row n_min total meets the per-language counts.
    "c_temperature_mix",
    # Two 1-row corpus totals (nt, nr) ride broadcast cross joins into the
    # 64-row log-ratio table.
    "c_dsir",
    # Two 1-row scalar aggregates (exact counts x sketches) meet in a
    # broadcast cross join.
    "x_theta_anchor",
    # The 1-row merged-KLL quantile estimates ride along the exact/rank
    # scan as a broadcast cross join.
    "x_kll_anchor",
    # Three 1-row scalar aggregates (total x sampled x run-diff) meet in
    # broadcast cross joins.
    "r_sample_bernoulli_anchor",
    # The 1-row corpus weight total W meets the cumulative-weight rows.
    "r_sample_pps",
    # Same PPS core: the 1-row quality-mass total rides the cross join.
    "c_quality_mix",
    # The 5-literal-row query batch scores against the corpus via a
    # broadcast nested loop (vec_id != query_id) -- the intended
    # batch-scoring shape: every corpus row meets each of the 5 queries.
    "v_ann_ivf_batch",
    # 1-row boundary/stats legs ride broadcast cross joins.
    "x_approx_topk_anchor",
}
# Queries ALLOWED to cross into Python row-at-a-time (pickled): the two
# deliberate slow-path demos.
_PICKLE_OK = {"u_py_udf", "u_py_udtf"}


def test_contamination_broadcasts_benchmark_gram_set(spark, sf_dir):
    """c_contamination's scale contract: the (small) eval/benchmark n-gram
    set is broadcast so the train posting table -- the 100 TB side -- is
    pre-filtered map-side without shuffling its grams to a join."""
    text = plans.plan_string(_Q["c_contamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in text, text


def test_sequence_packing_has_no_single_partition_exchange(spark, sf_dir):
    """c_seq_packing's global token offsets must come from the two-phase
    range-partition decomposition -- a plan containing a SinglePartition
    exchange (the ORDER-BY-without-PARTITION-BY window shape) would mean
    the whole corpus collapsed into one task."""
    text = plans.plan_string(_Q["c_seq_packing"](spark, sf_dir))
    # The final .orderBy is a range exchange (fine); the WINDOW itself must
    # be partitioned (by pid), never global.
    import re

    specs = re.findall(r"windowspecdefinition\([^)]*", text)
    assert specs, text
    for s in specs:
        assert "pid" in s, s
    assert "Exchange SinglePartition" not in text, text


def test_sessionize_single_exchange(spark, sf_dir):
    """w_sessionize's scale contract: ONE shuffle on user_id serves the lag
    flag, the running session counter, AND the per-session aggregate --
    hash(user_id) satisfies the (user_id, session_idx) grouping, so Catalyst
    must plan no second exchange (and no SinglePartition window)."""
    import re

    text = plans.plan_string(_Q["w_sessionize"](spark, sf_dir))
    # Count numbered node headers, not raw substrings -- the formatted plan
    # names each node twice (tree + detail section).
    exchanges = re.findall(r"\(\d+\) Exchange", text)
    assert len(exchanges) == 1, text
    assert "SinglePartition" not in text, text


def test_rank_topk_gets_window_group_limit_pushdown(spark, sf_dir):
    """w_rank's `rn <= 3` must trigger Catalyst's WindowGroupLimit: each map
    task keeps only its local top-3 per segment BEFORE the shuffle, which
    is what makes top-k-per-group safe on a low-cardinality partition key
    at scale."""
    text = plans.plan_string(_Q["w_rank"](spark, sf_dir))
    assert "WindowGroupLimit" in text, text


def test_bottomk_sample_gets_window_group_limit_pushdown(spark, sf_dir):
    """r_sample_bottomk's `rn <= 5` must likewise map-side-prune to the
    local bottom-5 per source before the shuffle."""
    text = plans.plan_string(_Q["r_sample_bottomk"](spark, sf_dir))
    assert "WindowGroupLimit" in text, text


def test_moving_avg_hybrid_small_path_is_plain_window(spark, sf_dir):
    """At fixture scale every type's history is far below the per-task
    budget, so the round-4 hybrid must take the plain type-partitioned
    window (1/k-th the rows, one fewer shuffle; measured ~2x faster at
    every single-node size -- tools/ma_scaling_bench.py)."""
    import re

    text = plans.plan_string(_Q["w_moving_avg"](spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\([^)]*", text)
    assert specs, text
    for s in specs:
        assert "event_type" in s and "pid" not in s, s


def test_moving_avg_scatter_path_partitions_by_range_pid(spark, sf_dir):
    """Forcing the scatter path (per-key budget 0): every window spec must
    be partitioned by the range pid, never by bare event_type (3 distinct
    values -> single-task history per type at scale)."""
    import re

    from delta_lake_stock_pipeline_spark.operators.windows import (
        trailing_mean_rows,
    )
    from delta_lake_stock_pipeline_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").alias(
            "micros"
        ),
    )
    out = trailing_mean_rows(ev, scatter_min_rows_per_key=0)
    text = plans.plan_string(out)
    specs = re.findall(r"windowspecdefinition\([^)]*", text)
    assert specs, text
    for s in specs:
        assert "pid" in s, s


def test_range_interval_window_partitions_by_time_bucket(spark, sf_dir):
    """The time-RANGE frame must NOT window over bare event_type (a
    handful of distinct values -> single-task partitions holding a type's
    entire history). The round-3 re-plan windows the row-level data by
    (event_type, bucket); the only event_type-alone window allowed is the
    cumulative pass over the tiny per-bucket aggregate table."""
    import re

    text = plans.plan_string(_Q["w_range_interval"](spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\([^)]*", text)
    row_level = [s for s in specs if "bucket" in s and "sk" in s]
    assert row_level, f"no (event_type, bucket)-partitioned window found: {specs}"
    for s in row_level:
        assert "event_type" in s and "bucket" in s, s


def test_no_query_regresses_to_cartesian_nested_loop_or_pickle(spark, sf_dir):
    """Blanket plan audit over EVERY registered query: no cartesian
    product anywhere; nested-loop joins and pickled Python only on the
    explicit allowlists above. Catches a silently-degenerated plan the
    per-operator gates don't cover."""
    for name, fn in sorted(all_queries().items()):
        text = plans.plan_string(fn(spark, sf_dir))
        assert "CartesianProduct" not in text, f"{name} has a cartesian product"
        if name not in _BNLJ_OK:
            assert "BroadcastNestedLoop" not in text, f"{name} grew a BNLJ"
        if name not in _PICKLE_OK:
            assert "BatchEvalPython" not in text, f"{name} fell back to pickle"


def test_dynamic_partition_pruning_on_versioned_table(spark, tmp_path):
    """Joining the partitioned fact to a FILTERED small dim must inject a
    dynamicpruning expression into the fact scan's PartitionFilters -- the
    runtime companion of static pruning: at 100 TB the fact's partition
    list is pruned by the dim filter's result, not read-then-discarded."""
    from delta_lake_stock_pipeline_spark import storage

    path = str(tmp_path / "t")
    bars = storage.with_derived_columns(
        storage.synthesize_bars(spark, n_tickers=4, n_days=3, bars_per_day=30)
    )
    storage.write_partitioned(bars, path)
    fact = storage.read_table(spark, path)
    dim = spark.createDataFrame(
        [("T00", "tech"), ("T01", "tech"), ("T02", "fin"), ("T03", "fin")],
        "ticker string, sector string",
    )
    j = (
        fact.join(dim.filter(F.col("sector") == "tech"), "ticker")
        .groupBy("ticker")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan



def test_null_aware_anti_join_plan_and_semantics(spark, tmp_path):
    """h_null_aware_anti must compile to the dedicated null-aware anti
    join (BroadcastHashJoin ... LeftAnti, BuildRight, true -- the flag is
    isNullAwareAntiJoin), NOT a plain left_anti (wrong under tri-valued
    NOT IN) and NOT the BroadcastNestedLoopJoin fallback. And the
    all-UNKNOWN cliff is pinned on BOTH engines: one NULL in the NOT IN
    set -> zero rows."""
    import duckdb

    from delta_lake_stock_pipeline_spark.operators.subqueries import (
        null_aware_anti_join,
    )

    from conftest import SF_DIR

    df = null_aware_anti_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight, true", plan), plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    # the cliff: a single NULL in the set empties the result identically
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).createOrReplaceTempView("naaj_left")
    spark.createDataFrame(
        [(1,), (None,)], "k long"
    ).createOrReplaceTempView("naaj_right")
    got = spark.sql(
        "SELECT * FROM naaj_left WHERE k NOT IN (SELECT k FROM naaj_right)"
    ).count()
    con = duckdb.connect()
    want = con.execute(
        "SELECT count(*) FROM (VALUES (1), (2)) l(k) "
        "WHERE k NOT IN (SELECT * FROM (VALUES (1), (NULL)) r(k))"
    ).fetchone()[0]
    con.close()
    assert got == want == 0


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's header counts (total / oracled / rows-only query
    keys) must match the live registry -- the round-4 verdict flagged the
    doc drifting two rounds behind; this pins it to the code."""
    import os
    import re

    from delta_lake_stock_pipeline_spark.operators import all_oracles

    q, o = all_queries(), all_oracles()
    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    m = re.search(
        r"(\d+) query\nkeys total; (\d+) DuckDB-oracle-checked, (\d+) rows-only",
        doc,
    )
    assert m, "COVERAGE.md header counts sentence not found"
    assert int(m.group(1)) == len(q), f"doc says {m.group(1)}, registry {len(q)}"
    assert int(m.group(2)) == len(o), f"doc says {m.group(2)}, oracled {len(o)}"
    assert int(m.group(3)) == len(set(q) - set(o)), (
        f"doc says {m.group(3)} rows-only, registry {len(set(q) - set(o))}"
    )


def test_driver_window_rotation_policy():
    """Encodes the rotation POLICY, not just the size (round-6 verdict
    task 6): (a) every rotation key names a real registry entry with no
    duplicates; (b) no window slot re-proves a key that already has a
    cumulative green driver row while any oracled key still lacks one.
    The cumulative ledger is rebuilt from the committed CORRECTNESS_r*.json
    files via tools/driver_ledger.py, so registering a new oracled key
    without giving it a window slot fails this test until a freshness
    re-proof slot is displaced for it."""
    import importlib.util
    import os

    from delta_lake_stock_pipeline_spark.operators import (
        DRIVER_WINDOW_SIZE,
        _DRIVER_WINDOW_ROTATION,
        all_oracles,
    )

    q, o = all_queries(), all_oracles()
    window = _DRIVER_WINDOW_ROTATION
    assert len(window) == DRIVER_WINDOW_SIZE
    assert len(set(window)) == len(window), "duplicate rotation keys"
    unknown = [k for k in window if k not in q]
    assert not unknown, f"rotation names unknown keys: {unknown}"
    unoracled = [k for k in window if k not in o]
    assert not unoracled, f"rotation contains rows-only keys: {unoracled}"

    spec = importlib.util.spec_from_file_location(
        "driver_ledger",
        os.path.join(os.path.dirname(__file__), "..", "tools", "driver_ledger.py"),
    )
    ledger_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ledger_mod)
    ledger = ledger_mod.build_ledger()

    lacking = {
        k for k in q if k in o and ledger.get(k, ("", 0))[0] != "pass"
    }
    missing = sorted(lacking - set(window))
    repeats = sorted(k for k in window if k not in lacking)
    assert not (missing and repeats), (
        f"window re-proves already-green keys {repeats[:5]}... while "
        f"oracled keys still lack a green driver row: {missing}"
    )
