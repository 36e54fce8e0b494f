"""Additional TPC-H-style composites (Q5/Q7/Q10/Q14/Q19 shapes), adapted to
the reduced fixture schema (no partsupp / shipmode / commitdate columns).

These exercise the deep multi-join + selective-predicate plans a reference
user runs daily: 6-table snowflake joins, nation-pair theta conditions,
ratio aggregates, and OR-of-ANDs pushdown.

Scale notes (100 TB): the fact table (lineitem/orders) is always the probe
side; every dimension (region, nation, customer, supplier, part) is
broadcast so no fact shuffle happens for the joins — the only exchange per
query is the final aggregation on its (small) group key, with map-side
partial aggregation of exact integer-cent sums (order-independent merge).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import money_sum, rnd, sql_money_sum, sql_rnd
from ..io import load
from ..registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, {sql_money_sum(_REV)} AS revenue
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation    ON s_nationkey = n_nationkey
JOIN region    ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    tier="T2",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5-style: 1997 revenue per ASIA nation where the customer and
    the supplier share a nation (local fulfilment).

    Plan: lineitem probes broadcast orders-side? No — orders is the larger
    dim here, so lineitem joins orders on the shuffled orderkey once, then
    every true dimension (customer, supplier, nation, region) is broadcast.
    The c_nationkey = s_nationkey equality rides along as a post-broadcast
    filter predicate, never a shuffle key.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(F.expr(_REV)).alias("revenue"))
    )


@register(
    "q7_nation_volume_shipping",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INT) AS l_year,
       {sql_money_sum(_REV)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, CAST(YEAR(l_shipdate) AS INT)
""",
    tier="T2",
)
def q7_nation_volume_shipping(spark, sf_dir):
    """TPC-H-Q7-style: bilateral trade volume between two nations per ship
    year. The nation dim is joined twice under different aliases; the
    disjunctive nation-pair predicate filters after both broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(money_sum(F.expr(_REV)).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {sql_money_sum(_REV)} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tier="T2",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H-Q10-style: top-20 customers by lost (returned) revenue in a
    quarter. TakeOrderedAndProject caps the driver transfer at 20 rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(F.expr(_REV)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "q14_promo_effect",
    oracle=f"""
SELECT {sql_rnd(
    "100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
    "CAST(FLOOR((" + _REV + ") * 100 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100)"
    " / (CAST(SUM(CAST(FLOOR((" + _REV + ") * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100)",
    4,
)} AS promo_pct,
       {sql_money_sum(_REV)} AS total_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    tier="T2",
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H-Q14-style: % of September-1997 revenue from PROMO parts.

    Determinism: both numerator and denominator are exact integer-cent
    sums; the final 100*a/b division is a fixed IEEE sequence identical in
    both engines, then half-up rounded to 4 digits (conform.rnd).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00"))
    )
    p = load(spark, sf_dir, "part")
    rev_cents = F.floor(F.expr(_REV) * F.lit(100) + F.lit(0.5))
    promo_cents = F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo_cents).cast("double").alias("_pc"),
            F.sum(rev_cents).cast("double").alias("_tc"),
        )
        .select(
            rnd(
                F.lit(100.0) * (F.col("_pc") / F.lit(100)) / (F.col("_tc") / F.lit(100)),
                4,
            ).alias("promo_pct"),
            (F.col("_tc") / F.lit(100)).alias("total_revenue"),
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
SELECT {sql_money_sum(_REV)} AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    tier="T2",
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H-Q19-style: OR-of-ANDs predicate spanning both join sides.

    Catalyst extracts the common l_quantity bounds / p_partkey non-null
    conjuncts for pushdown; the disjunction itself evaluates after the
    broadcast join (part is the small side)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#4") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            money_sum(F.expr(_REV)).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
