"""§2.G — set operations.

Distinct-semantics ops use unique-key sets (customers); bag-semantics ops
(`*_all`) use multisets with real duplicates (order customer keys) so ALL vs
DISTINCT actually differ.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ASIA_SQL = """
SELECT c_custkey FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
"""
_RICH_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"


def _asia(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )


def _rich(spark, sf_dir):
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )


@register(
    "set_union_all",
    oracle=f"{_ASIA_SQL} UNION ALL {_RICH_SQL}",
    tier="T1",
)
def set_union_all(spark, sf_dir):
    """UNION ALL of two customer key sets (duplicates preserved)."""
    return _asia(spark, sf_dir).unionByName(_rich(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle=f"{_ASIA_SQL} UNION {_RICH_SQL}",
    tier="T1",
)
def set_union_distinct(spark, sf_dir):
    """UNION (deduplicated)."""
    return _asia(spark, sf_dir).unionByName(_rich(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    oracle=f"{_ASIA_SQL} INTERSECT {_RICH_SQL}",
    tier="T2",
)
def set_intersect(spark, sf_dir):
    """INTERSECT (distinct semantics)."""
    return _asia(spark, sf_dir).intersect(_rich(spark, sf_dir))


@register(
    "set_except",
    oracle=f"{_ASIA_SQL} EXCEPT {_RICH_SQL}",
    tier="T2",
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct semantics): ASIA customers that are not rich."""
    return _asia(spark, sf_dir).subtract(_rich(spark, sf_dir))


@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
    tier="T2",
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics) over duplicate-bearing key multisets."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return urgent.intersectAll(big)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
    tier="T2",
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag-semantics difference): each right-side occurrence
    cancels ONE left-side occurrence of the same key, so a customer with
    3 urgent orders and 1 big order survives twice — the multiset
    subtraction (ledger reconciliation, per-occurrence dedup accounting)
    that the set-semantics EXCEPT collapses to zero-or-one. Completes the
    §2.G bag-semantics row alongside set_intersect_all.

    Scale note: Spark plans exceptAll as an aggregate of signed
    multiplicities (+1 left, −1 right) followed by a generator replaying
    max(count, 0) copies — one shuffle on the key, no join.
    """
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return urgent.exceptAll(big)
