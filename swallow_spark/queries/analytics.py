"""Composite TPC-H-style analytics queries — realistic multi-operator
workloads a user of the reference would run end-to-end (filter + join +
aggregate + top-k in one plan), adapted to the fixture schema.

Scale notes: each is the canonical warehouse shape — facts filtered at the
scan (pushdown), dims broadcast, one shuffle per aggregation, top-k via
TakeOrderedAndProject / rank window.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import money_sum, sql_money_sum
from ..io import load
from ..registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey, {sql_money_sum(_REV)} AS revenue,
       CAST(o_orderdate AS DATE) AS odate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tier="T2",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-style: top-10 unshipped BUILDING orders by revenue."""
    cutoff = "1998-06-30 00:00:00"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            "o_orderpriority",
        )
        .agg(money_sum(F.expr(_REV)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "odate", "o_orderpriority")
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
    tier="T2",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H-Q4-style: Q1-1997 orders with a late line (semi join), counted
    per priority."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q6_revenue_forecast",
    oracle=f"""
SELECT {sql_money_sum('l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tier="T2",
)
def q6_revenue_forecast(spark, sf_dir):
    """TPC-H-Q6-style: map-only pushdown filter + single global aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, {sql_money_sum(_REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    tier="T2",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H-Q15-style: supplier(s) with maximum quarterly revenue
    (scalar-max filter over an aggregated subquery; exact money sum makes
    the max well-defined). The max is a broadcast 1-row aggregate joined
    back as an equi key — a BroadcastHashJoin over the per-supplier
    frame, not a global rank window (which would single-reduce O(|rev|)
    rows at scale)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(money_sum(F.expr(_REV)).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx")).drop("_mx")
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "fn_bitwise",
    oracle="""
SELECT p_partkey,
       p_partkey & 255 AS band,
       p_partkey | 15 AS bor,
       xor(p_partkey, 99) AS bxor,
       p_partkey << 2 AS shl,
       p_partkey >> 2 AS shr,
       CAST(bit_count(p_partkey) AS INT) AS bcnt
FROM part
""",
    tier="T2",
)
def fn_bitwise(spark, sf_dir):
    """Bitwise function pack over integer keys."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(15)).alias("bor"),
        k.bitwiseXOR(F.lit(99)).alias("bxor"),
        F.expr("shiftleft(p_partkey, 2)").alias("shl"),
        F.expr("shiftright(p_partkey, 2)").alias("shr"),
        F.bit_count(k).cast("int").alias("bcnt"),
    )


@register(
    "win_nth_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       nth_value(o_orderkey, 3) OVER w AS third_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tier="T2",
)
def win_nth_value(spark, sf_dir):
    """nth_value over a full frame: each customer's third order (NULL when
    fewer than three)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 3).over(w).alias("third_order"),
    )
