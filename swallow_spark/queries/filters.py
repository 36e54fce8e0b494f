"""§2.B — projections, filters, predicates, CASE, DISTINCT.

All predicates are plain column comparisons so Catalyst pushes them into the
parquet scan (PushedFilters) — at 100 TB these queries read only matching
row groups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "project_compute",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {sql_rnd('l_extendedprice * (1 - l_discount)', 2)} AS charge,
       l_returnflag || '-' || l_linestatus AS flag
FROM lineitem
""",
    tier="T1",
)
def project_compute(spark, sf_dir):
    """Derived columns: discounted charge + string concat of status flags."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 2).alias("charge"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag"),
    )


@register(
    "filter_simple",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity > 30
""",
    tier="T1",
)
def filter_simple(spark, sf_dir):
    """Single pushed predicate on a numeric column."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'O' AND o_totalprice BETWEEN 1000 AND 50000)
   OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND NOT o_orderstatus = 'F'
       AND NULLIF(o_orderstatus, 'P') IS NOT NULL)
""",
    tier="T1",
)
def filter_compound(spark, sf_dir):
    """AND/OR/NOT + BETWEEN + IN + IS NULL in one predicate tree."""
    o = load(spark, sf_dir, "orders")
    pred = (
        (F.col("o_orderstatus") == "O") & F.col("o_totalprice").between(1000, 50000)
    ) | (
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~(F.col("o_orderstatus") == "F")
        & F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull()
    )
    return o.filter(pred).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_like_regex",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE 'PROMO%'
   OR regexp_matches(p_name, '^(red|green) ')
""",
    tier="T1",
)
def filter_like_regex(spark, sf_dir):
    """LIKE prefix + conservative (RE2-safe) regex predicate."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%") | F.col("p_name").rlike("^(red|green) ")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "case_when",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band
FROM orders
""",
    tier="T1",
)
def case_when(spark, sf_dir):
    """3-arm CASE bucketing of order value."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("band"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tier="T1",
)
def distinct_rows(spark, sf_dir):
    """DISTINCT over a two-column projection (hash aggregate, partial+final)."""
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()
