"""Subquery-shaped composite queries: the remaining classic TPC-H plan
shapes (Q2/Q4/Q7/Q8/Q9/Q12/Q14/Q16/Q17/Q19/Q21/Q22) adapted to the
driver fixtures.

The reference has no subqueries at all (its SQL surface is two grouped
aggregates, ``external_table.py:105-122``); these supply the decorrelation
workloads every general engine must handle: scalar subqueries, correlated
EXISTS / NOT EXISTS, aggregate-join-back, disjunctive pushdown, and
conditional aggregation. Fixture adaptations (no partsupp table, no
l_shipmode / l_commitdate / l_receiptdate / c_phone columns) keep each
query's *plan shape* while substituting available columns; "late" is
``l_shipdate > o_orderdate + 60 days`` throughout (~50% of lines).

Spark-first formulation notes (100 TB stance):

* Correlated scalar subqueries (Q2/Q17) become a tiny aggregate +
  broadcast join-back -- one pass over the fact, no per-row subquery.
* EXISTS / NOT EXISTS (Q4/Q21/Q22) become left_semi / left_anti joins;
  Catalyst plans the same decorrelation for the SQL form.
* Global scalar aggregates (Q22's AVG) broadcast-cross-join a 1-row
  DataFrame instead of ``collect()``-ing to the driver.
* Disjunctions of conjunctions (Q19) stay a single declarative filter so
  the parquet scan gets the OR-predicate and AQE sees one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table
from .tpch import _revenue, _revenue_dec


_LATE = "l_shipdate > o_orderdate + INTERVAL 60 DAYS"


def q2_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated scalar subquery (min per group) decorrelated to
    an aggregate + broadcast join-back. The per-type min table is as wide as
    the group domain (6 rows), so it broadcasts; the fact never shuffles."""
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy("p_type").agg(F.min("p_retailprice").alias("min_price"))
    return (
        part.alias("p")
        .join(
            F.broadcast(mins).alias("m"),
            (F.col("p.p_type") == F.col("m.p_type"))
            & (F.col("p.p_retailprice") == F.col("m.min_price")),
        )
        .select(
            F.col("p.p_type").alias("p_type"),
            F.col("p.p_partkey").alias("p_partkey"),
            F.col("p.p_name").alias("p_name"),
            F.round("p.p_retailprice", 2).alias("retailprice"),
        )
        .orderBy("p_type", "p_partkey")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: correlated EXISTS -> left_semi join with a non-equi component
    (late-shipment lines for the same order). Catalyst keeps the equi key
    (orderkey) for the join and evaluates the date comparison as a join
    residual -- no cartesian blowup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey) & F.expr(_LATE),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations -- disjunctive
    nation-pair predicate over a 5-way join, grouped by both nations and
    ship year. Both nation dims broadcast; the pair filter prunes before
    aggregation."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    pair = (
        (F.col("n1.n_name") == "NATION_12") & (F.col("n2.n_name") == "NATION_13")
    ) | ((F.col("n1.n_name") == "NATION_13") & (F.col("n2.n_name") == "NATION_12"))
    return (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of PROMO-part revenue among ASIA-region
    customers per order year -- conditional aggregation as a ratio of two
    sums over the same pass (one scan, no self-join)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _revenue_dec()
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .join(F.broadcast(region), F.col("n2.n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n1.n_name") == "NATION_3", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: LIKE-filtered part dim driving a multi-way join, profit
    grouped by supplier nation and order year. (No partsupp table in the
    fixtures, so profit is discounted revenue.)"""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        # decimal-sum: double accumulation is order-sensitive at the cent
        # boundary across engines; fixing the per-term precision makes the
        # aggregate deterministic (same trick as the DuckDB oracle).
        .agg(
            F.round(F.sum(_revenue().cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts (urgent vs not) per line category for
    one ship year. One join, one pass, two CASE sums."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts -- LEFT OUTER join
    with a join-side filter (so zero-order customers keep count 0), then a
    second aggregation over the first's result (a histogram of counts).
    Two shuffles by construction; the second is over the tiny count domain."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_customer = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue -- an aggregate
    CTE reused twice (per-supplier revenue + its global max) with a scalar
    subquery equality. The max broadcasts as a 1-row cross join; revenue
    sums use exact decimal terms so the equality and the rounded output are
    engine-independent."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue().cast("decimal(18,6)")).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one month -- conditional / total ratio
    in a single aggregate; part dim broadcasts."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    vol = _revenue_dec()
    zero = F.lit(0).cast("decimal(18,6)")
    return lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
            .cast("double")
            / F.sum(vol).cast("double"),
            2,
        ).alias("promo_revenue_pct")
    )


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT supplier) per part attribute tuple, with a
    NOT IN exclusion list -> broadcast left_anti join (the exclusion set is
    tiny; never shuffles the fact)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    )
    lineitem = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(excluded),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: correlated scalar AVG subquery decorrelated to a per-part
    aggregate + join-back. The per-part avg table is part-cardinality (tiny
    vs lineitem), so it broadcasts; classic 0.2 threshold widened to 0.5 for
    fixture quantity uniformity."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # Semi-join the fact to the FILTERED part keys before the per-part
    # aggregate: only Brand#3 parts are ever consulted, so aggregating the
    # whole part domain would waste a full-table aggregation and inflate
    # the broadcast to all-parts cardinality (round-3 review). Identical
    # per-partkey averages on the surviving keys -- oracle unchanged.
    per_part_avg = (
        lineitem.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(per_part_avg),
            F.col("l_partkey") == F.col("ap_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunction of conjunctions mixing part and lineitem attributes.
    Kept as ONE declarative filter after the join so Catalyst can push the
    part-only disjuncts (brand/size) to the part scan and evaluate the rest
    as a join residual."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped value per part restricted to one nation's
    suppliers, kept only when the group's value exceeds a fraction of the
    GLOBAL value -- i.e. HAVING against a global scalar subquery. (No
    partsupp table in the fixtures; "value" is discounted revenue from
    lineitem.)

    Spark-first: the global total is an aggregate of the already-grouped
    per-part table (tiny), broadcast as a 1-row cross join -- the fact is
    scanned and shuffled exactly once, and the HAVING is a post-aggregate
    filter, never a per-row subquery. Cf. reference aggregate surface
    ``external_table.py:105-122`` (grouped SUM), extended with the
    scalar-subquery HAVING the reference lacks."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    national = lineitem.join(
        F.broadcast(
            supplier.join(
                F.broadcast(nation),
                F.col("s_nationkey") == F.col("n_nationkey"),
                "left_semi",
            ).select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    per_part = national.groupBy("l_partkey").agg(
        F.sum(_revenue().cast("decimal(18,6)")).alias("value_exact")
    )
    total = per_part.agg(
        F.sum("value_exact").alias("total_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_exact") > 0.001 * F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value_exact", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in one nation who, on some widget-like part,
    shipped more in 1996 than 40% of their all-time volume of that part --
    the classic nested-IN + correlated scalar threshold, decorrelated to a
    pair-level aggregate compared against a conditional aggregate of the
    same pass (one scan computes both sums), then a semi-join up to
    supplier. (Fixtures lack partsupp, so "stock on hand" is the pair's
    all-time shipped quantity.)"""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    widget_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(widget_parts),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01")) & (
        F.col("l_shipdate") < F.lit("1997-01-01")
    )
    pair = lineitem.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias(
            "qty_1996"
        ),
        F.sum("l_quantity").alias("qty_total"),
    )
    qualifying = (
        pair.filter(F.col("qty_1996") > 0.4 * F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on a finished
    multi-supplier order -- correlated EXISTS (another supplier on the
    order) as left_semi plus correlated NOT EXISTS (another LATE supplier)
    as left_anti, both with non-equi residuals on the order key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    l1 = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.expr(_LATE))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    l1 = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    l1 = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey"))
        & (F.col("x_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: global scalar subquery (avg positive balance) + correlated
    NOT EXISTS. The scalar broadcasts as a 1-row cross join (no collect());
    the NOT EXISTS (no URGENT order) is a left_anti against a pre-filtered
    orders projection."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # avg as exact-decimal sum / count: a double AVG's accumulation order
    # differs across engines, which could flip membership of a customer
    # whose balance sits within an ulp of the mean.
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# NOT IN threshold for the null-aware anti join: selects ~13% of
# customers at every SF. Shared engine/oracle.
_NAAJ_PRICE = 400_000


def null_aware_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a NULLABLE subquery column -- the null-aware anti join
    (NAAJ), a DISTINCT operator from the left_anti the other NOT-IN
    shapes compile to: SQL's tri-valued ``x NOT IN (set)`` is UNKNOWN
    (drops the row) whenever the set contains a single NULL, so the
    plain anti join is wrong the moment the column is nullable. Spark
    plans the single-column broadcast case as
    ``BroadcastHashJoin ... LeftAnti, BuildRight, true`` (the trailing
    flag is isNullAwareAntiJoin; plan-gated in tests) and falls back to
    BroadcastNestedLoopJoin otherwise -- which is why real pipelines
    care: a nullable NOT IN column silently turns a hash join into a
    loop join unless the engine has this operator.

    The subquery column is nullable BY TYPE (the CASE arm) but never
    null in the fixture (no status 'X'), so the query exercises the
    NAAJ plan with a non-degenerate result; the all-UNKNOWN cliff
    (one NULL in the set -> zero rows on BOTH engines) is pinned by
    ``tests/test_plans.py::test_null_aware_anti_join_plan_and_semantics``.
    Expressed through spark.sql -- the DataFrame API has no NOT IN
    subquery form. Scale shape: the exclusion set is an aggregate of a
    filtered fact scan, broadcast; the customer side never shuffles.
    Honest 100 TB caveat: Spark only implements NAAJ for the
    single-column BROADCAST case -- if the exclusion set outgrew the
    broadcast threshold the planner would fall back to
    BroadcastNestedLoopJoin (the blanket plan audit would flag it).
    Past that size the correct rewrite is explicit tri-valued handling:
    one aggregate counting NULLs in the set (any NULL -> empty result),
    else a plain shuffled left_anti on the now-provably-non-null
    column -- the same answer at any scale, without the loop join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "naaj_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "naaj_orders"
    )
    return spark.sql(f"""
        SELECT c_custkey, c_name
        FROM naaj_customer
        WHERE c_custkey NOT IN (
            SELECT CASE WHEN o_orderstatus = 'X' THEN NULL
                        ELSE o_custkey END
            FROM naaj_orders WHERE o_totalprice > {_NAAJ_PRICE}
        )
        ORDER BY c_custkey
    """)


QUERIES = {
    "h_q2_min_price_part": q2_min_price_part,
    "h_q4_order_priority": q4_order_priority,
    "h_q7_volume_shipping": q7_volume_shipping,
    "h_q8_market_share": q8_market_share,
    "h_q9_product_profit": q9_product_profit,
    "h_q12_priority_shipping": q12_priority_shipping,
    "h_q13_customer_distribution": q13_customer_distribution,
    "h_q14_promo_effect": q14_promo_effect,
    "h_q15_top_supplier": q15_top_supplier,
    "h_q16_supplier_variety": q16_supplier_variety,
    "h_q17_small_quantity": q17_small_quantity,
    "h_q19_disjunctive_revenue": q19_disjunctive_revenue,
    "h_q11_important_stock": q11_important_stock,
    "h_q20_potential_promotion": q20_potential_promotion,
    "h_q21_sole_late_supplier": q21_sole_late_supplier,
    "h_q22_dormant_customers": q22_dormant_customers,
    "h_null_aware_anti": null_aware_anti_join,
}

ORACLES = {
    "h_q2_min_price_part": """
        SELECT p_type, p_partkey, p_name, ROUND(p_retailprice, 2) AS retailprice
        FROM part p
        WHERE p_retailprice = (
            SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
        )
        ORDER BY p_type, p_partkey
    """,
    "h_q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "h_q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_13')
            OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_12'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "h_q8_market_share": """
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               ROUND(CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                                   ELSE CAST(0 AS DECIMAL(18,6)) END)
                          AS DOUBLE)
                     / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        GROUP BY o_year
        ORDER BY o_year
    """,
    "h_q9_product_profit": """
        SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, EXTRACT(year FROM o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "h_q12_priority_shipping": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "h_q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "h_q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "h_q14_promo_effect": """
        SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                                           ELSE CAST(0 AS DECIMAL(18,6)) END)
                                  AS DOUBLE)
                     / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "h_q16_supplier_variety": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "h_q17_small_quantity": """
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                          AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < (
              SELECT 0.5 * AVG(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
    """,
    "h_q19_disjunctive_revenue": """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "h_q11_important_stock": """
        WITH per_part AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                       AS value_exact
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_7'
            )
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey,
               CAST(ROUND(value_exact, 2) AS DOUBLE) AS part_value
        FROM per_part
        WHERE value_exact > 0.001 * (SELECT SUM(value_exact) FROM per_part)
        ORDER BY part_value DESC, p_partkey
    """,
    "h_q20_potential_promotion": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5'
        )
        AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
            )
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                             AND l_shipdate < TIMESTAMP '1997-01-01'
                            THEN l_quantity ELSE 0 END) > 0.4 * SUM(l_quantity)
        )
        ORDER BY s_name
    """,
    "h_q21_sole_late_supplier": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    "h_q22_dormant_customers": """
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS totacctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT'
        )
        GROUP BY c_nationkey
        ORDER BY cntrycode
    """,
}


# Mirror of null_aware_anti_join: DuckDB evaluates the same tri-valued
# NOT IN directly.
ORACLES["h_null_aware_anti"] = f"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderstatus = 'X' THEN NULL
                    ELSE o_custkey END
        FROM orders WHERE o_totalprice > {_NAAJ_PRICE}
    )
    ORDER BY c_custkey
"""
