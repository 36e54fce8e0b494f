"""§2.D — aggregations. `agg_pricing_summary` is the flagship (entry()).

Scale notes: every groupBy here is a two-phase hash aggregate (partial
map-side combine, then final after a shuffle on the group keys). Money sums
go through integer cents (conform.money_sum) so the result is independent of
partition count and merge order — a plain double SUM is not reproducible
across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import (
    cents,
    money_avg,
    money_sum,
    rnd,
    sql_cents,
    sql_money_avg,
    sql_money_sum,
    sql_rnd,
)
from ..io import load
from ..registry import register

_CHARGE = "(l_extendedprice * (1 - l_discount)) * (1 + l_tax)"


@register(
    "agg_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_money_sum('l_quantity')} AS sum_qty,
       {sql_money_sum('l_extendedprice')} AS sum_base_price,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_money_sum(_CHARGE)} AS sum_charge,
       {sql_money_avg('l_quantity')} AS avg_qty,
       {sql_money_avg('l_extendedprice')} AS avg_price,
       {sql_money_avg('l_discount')} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    tier="T1",
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style pricing summary over lineitem (the flagship query)."""
    li = load(spark, sf_dir, "lineitem")
    charge = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) * (
        F.lit(1) + F.col("l_tax")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        money_sum(charge).alias("sum_charge"),
        money_avg(F.col("l_quantity")).alias("avg_qty"),
        money_avg(F.col("l_extendedprice")).alias("avg_price"),
        money_avg(F.col("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_global",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       {sql_money_sum('o_totalprice')} AS total_value,
       {sql_money_avg('o_totalprice')} AS avg_value,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
""",
    tier="T1",
)
def agg_global(spark, sf_dir):
    """Global (no GROUP BY) aggregate over orders."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        money_sum(F.col("o_totalprice")).alias("total_value"),
        money_avg(F.col("o_totalprice")).alias("avg_value"),
        # cast NTZ→TIMESTAMP (identity under the pinned UTC session) so the
        # output schema is plain 'timestamp' like every other key
        F.min("o_orderdate").cast("timestamp").alias("first_order"),
        F.max("o_orderdate").cast("timestamp").alias("last_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT c_mktsegment, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tier="T1",
)
def agg_count_distinct(spark, sf_dir):
    """Exact distinct buyers per market segment (distinct-expand + 2-phase)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("n_buyers"))
    )


@register(
    "agg_multi_distinct",
    oracle="""
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
""",
    tier="T2",
)
def agg_multi_distinct(spark, sf_dir):
    """Two COUNT(DISTINCT) in one aggregate (Catalyst expand)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_conditional",
    oracle=f"""
SELECT user_id % 100 AS bucket,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
       {sql_money_sum("CASE WHEN event_type = 'click' THEN value END")} AS click_value,
       {sql_money_sum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id % 100
""",
    tier="T1",
)
def agg_conditional(spark, sf_dir):
    """Pivot-style conditional sums per user bucket."""
    e = load(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", F.col("value"))
    purchase = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.groupBy((F.col("user_id") % 100).alias("bucket")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_clicks"),
        money_sum(click).alias("click_value"),
        money_sum(purchase).alias("purchase_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_having",
    oracle="""
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) > 50
""",
    tier="T1",
)
def agg_having(spark, sf_dir):
    """Post-aggregation filter (HAVING)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .filter(F.col("n_customers") > 50)
    )


@register(
    "agg_minmax_first",
    oracle="""
SELECT p_brand, p_retailprice AS top_price, p_name AS top_name
FROM (
  SELECT p_brand, p_retailprice, p_name,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn = 1
""",
    tier="T2",
)
def agg_minmax_first(spark, sf_dir):
    """max + max_by with deterministic tie-break (lowest partkey wins)."""
    p = load(spark, sf_dir, "part")
    ordkey = F.struct(F.col("p_retailprice"), (-F.col("p_partkey")).alias("neg_key"))
    return p.groupBy("p_brand").agg(
        F.max("p_retailprice").alias("top_price"),
        F.max_by("p_name", ordkey).alias("top_name"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
FROM customer
GROUP BY c_nationkey
""",
    tier="T2",
)
def agg_collect_sorted(spark, sf_dir):
    """Deterministic collect: sorted de-duplicated list per group (§2.0 rule 7),
    serialized '|'-joined — declared outputs carry no ArrayType columns (the
    driver's pandas canonicalizer cannot sort/hash list cells)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias("segments")
    )


@register(
    "agg_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tier="T2",
)
def agg_rollup(spark, sf_dir):
    """ROLLUP subtotals with grouping_id."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "agg_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_money_sum('o_totalprice')} AS total_value,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tier="T2",
)
def agg_cube(spark, sf_dir):
    """CUBE over status × priority with exact money sum."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("o_totalprice")).alias("total_value"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tier="T2",
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via Spark SQL."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_stats",
    oracle=f"""
SELECT l_returnflag,
       {sql_rnd('stddev_samp(l_quantity)', 4)} AS sd_qty,
       {sql_rnd('var_samp(l_quantity)', 4)} AS var_qty,
       {sql_rnd('corr(l_quantity, l_extendedprice)', 4)} AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    tier="T2",
)
def agg_stats(spark, sf_dir):
    """Sample stddev / variance / correlation, rounded to 4dp."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        rnd(F.var_samp("l_quantity"), 4).alias("var_qty"),
        rnd(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@register(
    "agg_percentile_exact",
    oracle=f"""
SELECT o_orderstatus,
       {sql_rnd('quantile_cont(o_totalprice, 0.5)', 4)} AS p50,
       {sql_rnd('quantile_cont(o_totalprice, 0.9)', 4)} AS p90
FROM orders
GROUP BY o_orderstatus
""",
    tier="T2",
)
def agg_percentile_exact(spark, sf_dir):
    """Exact interpolated median + p90 per status."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        rnd(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        rnd(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


@register("agg_approx_distinct", oracle=None, tier="T3")
def agg_approx_distinct(spark, sf_dir):
    """HLL approximate distinct users (rows-only; exact twin: agg_count_distinct).

    Scale note: approx_count_distinct is the 100 TB path — fixed-size sketch,
    single pass, mergeable across partitions.
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


@register("agg_approx_percentile", oracle=None, tier="T3")
def agg_approx_percentile(spark, sf_dir):
    """Approximate p95 of event value (rows-only; exact twin: agg_percentile_exact)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        rnd(F.percentile_approx("value", F.lit(0.95)), 2).alias("p95_value")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS n
FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rk
  FROM events
  GROUP BY user_id, event_type
) t
WHERE rk = 1
""",
    tier="T2",
)
def agg_mode_deterministic(spark, sf_dir):
    """Deterministic MODE: each user's most frequent event type, ties broken
    lexicographically. Library mode() is tie-unstable across engines and
    partitionings, so both sides use the same count-desc/type-asc
    row_number — reproducible under any shuffle order.

    Scale note: the pre-aggregate shrinks input to |user x type| before the
    window; the window partitions by user_id (no global sort)."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").cast("bigint").alias("n"),
        )
    )


@register(
    "agg_listagg",
    oracle="""
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
         AS segments
FROM customer
GROUP BY c_nationkey
""",
    tier="T2",
)
def agg_listagg(spark, sf_dir):
    """LISTAGG / string_agg: pipe-joined sorted distinct segment list per
    nation — Spark spells it array_join(sort_array(collect_set(...))).
    Sorting before joining makes the result partition-order independent."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.sort_array(F.collect_set("c_mktsegment")), "|"
        ).alias("segments")
    )


@register(
    "agg_skew_kurt",
    oracle=f"""
SELECT l_returnflag,
       {sql_rnd('skewness(l_quantity)', 4)} AS skew_qty,
       {sql_rnd('kurtosis(l_quantity)', 4)} AS kurt_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tier="T2",
)
def agg_skew_kurt(spark, sf_dir):
    """Higher statistical moments (skewness, excess kurtosis) per return
    flag, half-up rounded to 4dp — distribution-shape monitoring for data
    drift. Parity verified empirically at sf0.001/0.01/0.1: the engines'
    moment formulas agree within the 4dp canonicalization at these group
    sizes (n >= 600 per flag)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(F.skewness("l_quantity"), 4).alias("skew_qty"),
        rnd(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
    )


@register(
    "agg_weighted_avg",
    oracle=f"""
SELECT l_returnflag,
       {sql_rnd(
           "CAST(SUM(CAST(l_quantity AS BIGINT) * "
           + sql_cents('l_extendedprice')
           + ") AS DOUBLE) / 100 / SUM(CAST(l_quantity AS BIGINT))", 4)}
         AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
    tier="T2",
)
def agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted average price per flag with EXACT integer
    arithmetic: sum(qty * price_cents) and sum(qty) are both integer sums
    (order-independent partial aggregation), divided once at the end —
    reproducible under any partitioning, unlike a floating sum(w*x)/sum(w).
    Scale note: products stay < 2^63 here; at true 100 TB row counts the
    sums widen to DECIMAL(38,0) with the same semantics."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        rnd(
            F.sum(qty * cents(F.col("l_extendedprice"))).cast("double")
            / F.lit(100)
            / F.sum(qty),
            4,
        ).alias("wavg_price")
    )


@register(
    "agg_weighted_median",
    oracle=f"""
WITH w AS (
  SELECT l_returnflag, {sql_cents('l_extendedprice')} AS price_cents,
         l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
cum AS (
  SELECT l_returnflag, price_cents, wt,
         SUM(wt) OVER (PARTITION BY l_returnflag
                       ORDER BY price_cents, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
  FROM w
)
SELECT l_returnflag,
       CAST(MIN(price_cents) AS DOUBLE) / 100 AS weighted_median_price
FROM cum
WHERE cw * 2 >= tw
GROUP BY l_returnflag
""",
    tier="T2",
)
def agg_weighted_median(spark, sf_dir):
    """Exact weighted median (quantity-weighted price per flag): the lowest
    value whose cumulative weight reaches half the total — neither engine
    has a native weighted percentile, so both run the same cumulative-sum
    rewrite. Everything is integer (cent prices, integer weights, one
    total order with orderkey/linenumber tiebreak), so the pick is
    deterministic and the division happens once at the end.

    Scale note: one shuffle on the group key; the running sum is a linear
    per-partition scan (same cost class as any ranking window). No
    collect, no per-group materialization beyond the window frame.
    """
    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        cents(F.col("l_extendedprice")).alias("price_cents"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    cum = w.select(
        "l_returnflag",
        "price_cents",
        F.sum("wt").over(wcum).alias("cw"),
        F.sum("wt").over(wtot).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            (F.min("price_cents").cast("double") / F.lit(100)).alias(
                "weighted_median_price"
            )
        )
    )
