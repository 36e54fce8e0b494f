"""§2.F — sorts / limits / top-k.

`topk_per_group` from the inventory is covered by win_row_number_topk
(SURVEY.md §2.F marks them identical).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register


@register(
    "sort_multi_nulls",
    oracle="""
SELECT c_custkey, pos_bal, CAST(sort_pos AS BIGINT) AS sort_pos
FROM (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal,
         row_number() OVER (
           ORDER BY (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END)
                    DESC NULLS LAST,
                    c_custkey) AS sort_pos
  FROM customer
)
""",
    tier="T2",
)
def sort_multi_nulls(spark, sf_dir):
    """Multi-key sort with explicit NULLS LAST, frozen into data via
    row_number so the order itself is hash-checked.

    Scale note: a global (unpartitioned) window is a single-reducer sort —
    fine for ranking a dimension, wrong for a 100 TB fact (use partitioned
    windows or sortWithinPartitions there).
    """
    c = load(spark, sf_dir, "customer")
    pos_bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    w = Window.orderBy(F.col("pos_bal").desc_nulls_last(), F.col("c_custkey"))
    return (
        c.withColumn("pos_bal", pos_bal)
        .withColumn("sort_pos", F.row_number().over(w).cast("long"))
        .select("c_custkey", "pos_bal", "sort_pos")
    )


@register(
    "limit_topn",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tier="T1",
)
def limit_topn(spark, sf_dir):
    """Global top-10 orders — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge, no global sort), the right shape at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )
