"""Remaining TPC-H-style composites (Q2/Q8/Q9/Q11/Q12/Q13/Q16/Q17/Q18/Q20/
Q21/Q22 shapes), adapted to the reduced fixture schema (no partsupp /
shipmode / commitdate / phone columns — partsupp relationships are derived
from the distinct (l_partkey, l_suppkey) pairs that actually traded).

Together with tpch_extra.py this completes the 22-query TPC-H pattern
catalogue: correlated scalar subqueries (Q11/Q17/Q22), EXISTS / NOT EXISTS
(Q21), NOT IN (Q16), IN-subquery semi joins (Q18/Q20), left-outer + double
aggregation (Q13), min-per-group (Q2), and ratio-of-sums shares (Q8).

Scale notes (100 TB): lineitem/orders are always the probe side; dimensions
broadcast. Semi/anti joins are expressed as leftsemi/leftanti so Spark never
materializes the subquery result wider than its key. All money math uses
exact integer-cent sums (conform.money_sum) so partial aggregation merges
order-independently across any partition count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..conform import cents, money_sum, rnd, sql_cents, sql_money_sum, sql_rnd
from ..io import load
from ..registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q2_min_cost_supplier",
    oracle="""
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal, s_suppkey) AS rk
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pr
  JOIN part     ON p_partkey = pr.l_partkey
  JOIN supplier ON s_suppkey = pr.l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_type = 'STANDARD' AND p_size <= 10
    AND s_acctbal IS NOT NULL
) t
WHERE rk = 1
ORDER BY s_acctbal DESC, p_partkey
LIMIT 100
""",
    tier="T2",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2-style min-cost supplier: for each small STANDARD part, the
    supplier that actually shipped it with the lowest account balance
    (deterministic tiebreak on s_suppkey). partsupp is reconstructed as the
    distinct traded (partkey, suppkey) pairs. Suppliers with NULL acctbal
    are excluded on both sides — s_acctbal keys both the per-part rank and
    the final ORDER BY ... LIMIT, where Spark and DuckDB disagree on null
    placement (the null-order probe rule).

    Plan: distinct pairs aggregate once on the fact table, then every dim is
    broadcast; min-per-group is a row_number window over the (small) pair
    set, not a self-join back onto lineitem.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal").isNotNull())
    n = load(spark, sf_dir, "nation")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       {sql_rnd(
           "(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN "
           + sql_cents(_REV)
           + " ELSE 0 END) AS DOUBLE) / 100)"
           " / (CAST(SUM(" + sql_cents(_REV) + ") AS DOUBLE) / 100)",
           4,
       )} AS mkt_share
FROM lineitem
JOIN orders    ON o_orderkey = l_orderkey
JOIN customer  ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region    ON r_regionkey = cn.n_regionkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN part      ON p_partkey = l_partkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY CAST(YEAR(o_orderdate) AS INT)
""",
    tier="T2",
)
def q8_market_share(spark, sf_dir):
    """TPC-H-Q8-style national market share: NATION_5's fraction of ECONOMY
    part revenue sold to AMERICA customers, per order year. Numerator and
    denominator are exact cent sums; the share divides two identically
    sequenced doubles then half-up rounds (conform.rnd) — same in DuckDB."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    c = load(spark, sf_dir, "customer")
    cn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    rev_c = cents(F.expr(_REV))
    nat_c = F.when(F.col("supp_nation") == "NATION_5", rev_c).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(nat_c).cast("double").alias("_nc"),
            F.sum(rev_c).cast("double").alias("_tc"),
        )
        .select(
            "o_year",
            rnd(
                (F.col("_nc") / F.lit(100)) / (F.col("_tc") / F.lit(100)), 4
            ).alias("mkt_share"),
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(SUM({sql_cents(_REV)}
                - {sql_cents("p_retailprice * 0.5 * l_quantity")}) AS DOUBLE) / 100
         AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
""",
    tier="T2",
)
def q9_product_profit(spark, sf_dir):
    """TPC-H-Q9-style product-line profit by supplier nation and year.
    ps_supplycost is absent from the fixture, so cost is modeled as
    0.5 * p_retailprice per unit — the per-line profit is an exact
    difference of two cent quantities, summed order-independently."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    profit_c = cents(F.expr(_REV)) - cents(
        F.col("p_retailprice") * F.lit(0.5) * F.col("l_quantity")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit_c).cast("double") / F.lit(100)).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
SELECT l_partkey AS partkey, {sql_money_sum(_REV)} AS part_value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
GROUP BY l_partkey
HAVING CAST(SUM({sql_cents(_REV)}) AS DOUBLE) > 0.001 * (
  SELECT CAST(SUM({sql_cents(_REV)}) AS DOUBLE)
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE')
""",
    tier="T2",
)
def q11_important_stock(spark, sf_dir):
    """TPC-H-Q11-style important stock: parts whose EUROPE-supplied trade
    value exceeds 0.1% of the total — a scalar-subquery threshold.

    Plan: the per-part aggregate is computed ONCE; the global total re-uses
    it (sum of the per-part cent sums), then rides back as a broadcast
    single-row cross join — no second scan of the fact table, unlike the
    literal SQL which Catalyst can't de-duplicate across the subquery."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents(F.expr(_REV))).alias("_vc"))
    )
    total = per_part.agg(F.sum("_vc").alias("_tc"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("_vc").cast("double") > F.lit(0.001) * F.col("_tc").cast("double")
        )
        .select("partkey", (F.col("_vc").cast("double") / F.lit(100)).alias("part_value"))
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
    tier="T2",
)
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H-Q12-style late-shipment priority split. shipmode / commitdate /
    receiptdate are absent, so "late" is l_shipdate more than 30 days after
    o_orderdate, grouped by l_linestatus — the same conditional-count CASE
    aggregation over a fact-fact equi join with a residual date predicate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) t
GROUP BY c_count
""",
    tier="T2",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H-Q13-style customer order-count distribution: left outer join
    with an ON-clause filter (customers keep a 0 count), then a second
    aggregation over the first's output — the histogram-of-histogram shape.

    Scale: the outer join shuffles on custkey; the second groupBy's input is
    one row per customer, already tiny relative to the fact table."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


@register(
    "q16_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pr
JOIN part ON p_partkey = pr.l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    tier="T2",
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H-Q16-style supplier counts per (brand, type, size) excluding
    flagged suppliers (negative balance, the complaints proxy). The NOT IN
    becomes a broadcast left-anti join; the distinct (partkey, suppkey) pair
    set stands in for partsupp."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "leftanti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    oracle=f"""
SELECT {sql_rnd(
    "CAST(SUM(" + sql_cents("l_extendedprice") + ") AS DOUBLE) / 100 / 7.0", 2
)} AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS pk,
         CAST(SUM({sql_cents("l_quantity")}) AS DOUBLE) / 100 / COUNT(*) AS avg_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#12' AND p_type = 'SMALL'
  GROUP BY l_partkey
) pa ON pa.pk = l_partkey
WHERE p_brand = 'Brand#12' AND p_type = 'SMALL'
  AND l_quantity < 0.2 * avg_qty
""",
    tier="T2",
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17-style small-quantity-order revenue: lines below 20% of
    their part's average quantity, annualized (/7). The correlated AVG
    subquery is de-correlated into a per-part aggregate joined back
    (broadcast — it is at most one row per filtered part). The average is
    the deterministic exact-cent sum / count, so the 0.2×avg threshold is
    bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    per = j.groupBy(F.col("p_partkey").alias("pk")).agg(
        (
            F.sum(cents(F.col("l_quantity"))).cast("double")
            / F.lit(100)
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        j.join(F.broadcast(per), F.col("p_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            rnd(
                F.sum(cents(F.col("l_extendedprice"))).cast("double")
                / F.lit(100)
                / F.lit(7.0),
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customer",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(qc AS DOUBLE) / 100 AS sum_qty
FROM (SELECT l_orderkey, SUM({sql_cents("l_quantity")}) AS qc
      FROM lineitem GROUP BY l_orderkey HAVING qc > 15000) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tier="T2",
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H-Q18-style large-volume customers: orders whose total quantity
    exceeds 150 units, top-100 by order value. The IN-subquery of the
    original collapses into aggregating lineitem once and joining the
    surviving (tiny) order set outward — no second lineitem scan.

    Limit determinism: (o_totalprice DESC, o_orderkey) is a total order."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qc"))
        .filter(F.col("qc") > 15000)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("qc").cast("double") / F.lit(100)).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
SELECT s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM({sql_cents("l_quantity")}) > 5000)
""",
    tier="T2",
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H-Q20-style promotion candidates: suppliers who moved more than
    50 units of 'small…' parts in 1997. The IN-subquery is a left-semi join
    from supplier onto the aggregated qualifying-supplier set (which is tiny
    → broadcast), so supplier rows are never duplicated or shuffled."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("qc"))
        .filter(F.col("qc") > 5000)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == qualifying.l_suppkey, "leftsemi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    tier="T2",
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H-Q21-style suppliers who kept orders waiting: in finished ('F')
    multi-supplier orders, the supplier whose lines were the ONLY returned
    ('R') ones. commitdate/receiptdate are absent, so l_returnflag = 'R'
    stands in for "failed to deliver on time".

    Plan: EXISTS → left-semi, NOT EXISTS → left-anti, both equi on
    l_orderkey with the suppkey inequality as the join residual — Spark
    keeps them as shuffled hash joins keyed on orderkey; nothing correlates
    row-at-a-time."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").join(
        o, F.col("l_orderkey") == o.o_orderkey
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "leftsemi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "leftanti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_money_sum("c_acctbal")} AS totacctbal
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7',
                 'NATION_9', 'NATION_11', 'NATION_13')
  AND c_acctbal > (SELECT CAST(SUM({sql_cents("c_acctbal")}) AS DOUBLE)
                          / 100 / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
GROUP BY n_name
""",
    tier="T2",
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H-Q22-style dormant well-funded customers: above-average balance
    (average over positive balances — deterministic cent-sum/count), in a
    target nation set (the phone-country-code proxy), with no orders since
    mid-1999. Scalar subquery → broadcast single-row cross join; NOT EXISTS
    → left-anti on the recent-purchaser key set."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_3", "NATION_5", "NATION_7",
            "NATION_9", "NATION_11", "NATION_13",
        )
    )
    o = load(spark, sf_dir, "orders")
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(cents(F.col("c_acctbal"))).cast("double")
                / F.lit(100)
                / F.count(F.lit(1))
            ).alias("_abar")
        )
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1999-07-01 00:00:00")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("_abar"))
        .join(recent, c.c_custkey == recent.o_custkey, "leftanti")
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
