"""§2.F — sorts / limits / top-k.

`topk_per_group` from the inventory is covered by win_row_number_topk
(SURVEY.md §2.F marks them identical).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..ops.dist_rank import distributed_prefix
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

    Scale note: the rank comes from the distributed two-phase rank
    (ops/dist_rank.py), not a single-reducer global window. DESC NULLS
    LAST maps onto an ASCENDING int bucket key: −cents for non-NULL
    balances (larger balance → smaller key → earlier), NULLs pinned to a
    sentinel above every real value — a monotone coarsening of the
    (pos_bal DESC NULLS LAST, c_custkey) order, so bucket-major order
    equals the sort order.
    """
    c = load(spark, sf_dir, "customer")
    pos_bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    withb = c.withColumn("pos_bal", pos_bal)
    # cents ≤ 999_999 (|acctbal| < 10_000), so 10_000_000 sorts after all
    bucket_key = F.when(F.col("pos_bal").isNull(), F.lit(10_000_000)).otherwise(
        -F.floor(F.col("pos_bal") * 100)
    )
    ranked = distributed_prefix(
        withb,
        bucket_key,
        [F.col("pos_bal").desc_nulls_last(), F.col("c_custkey")],
        rank="sort_pos",
    )
    return ranked.select(
        "c_custkey", "pos_bal", F.col("sort_pos").cast("long").alias("sort_pos")
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
