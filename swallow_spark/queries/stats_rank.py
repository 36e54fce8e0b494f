"""Rank-correlation statistics: Spearman's ρ and Kendall's τ-b.

Monotonic-association measures for feature screening and data-quality
monitoring (does spend rise with balance? did the rank order of segments
change after an ETL change?) — the rank-based complements of
agg_regression's Pearson r.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register

# Spearman: ranks with average ties carried as DOUBLED ranks (2·rank stays
# integer when the average rank of a tie block is x.5), built from
# cumulative counts over the DISTINCT-value table — the KS-test recipe that
# bounds the single-reducer sort to |distinct values| rows.
_SPEARMAN_SQL = """
WITH base AS (
  SELECT c.c_custkey,
         CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS xv,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yv
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
gx AS (
  SELECT xv, COUNT(*) AS cnt,
         SUM(COUNT(*)) OVER (ORDER BY xv) AS cum
  FROM base GROUP BY xv
),
gy AS (
  SELECT yv, COUNT(*) AS cnt,
         SUM(COUNT(*)) OVER (ORDER BY yv) AS cum
  FROM base GROUP BY yv
),
r AS (
  SELECT 2 * gx.cum - gx.cnt + 1 AS dx,
         2 * gy.cum - gy.cnt + 1 AS dy
  FROM base JOIN gx USING (xv) JOIN gy USING (yv)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sdx, CAST(SUM(dy) AS BIGINT) AS sdy,
         CAST(SUM(dx * dx) AS BIGINT) AS sdx2,
         CAST(SUM(dy * dy) AS BIGINT) AS sdy2,
         CAST(SUM(dx * dy) AS BIGINT) AS sdxy
  FROM r
)
SELECT n,
       FLOOR((CAST(n AS DOUBLE) * sdxy - CAST(sdx AS DOUBLE) * sdy)
             / sqrt((CAST(n AS DOUBLE) * sdx2 - CAST(sdx AS DOUBLE) * sdx)
                    * (CAST(n AS DOUBLE) * sdy2 - CAST(sdy AS DOUBLE) * sdy))
             * 1000000 + 0.5) / 1000000 AS spearman_rho
FROM s
"""


@register("stats_spearman", oracle=_SPEARMAN_SQL, tier="T2")
def stats_spearman(spark, sf_dir):
    """Spearman rank correlation between customer account balance and
    total order spend (customers with ≥1 order) — Pearson's r computed on
    average-tie ranks, the outlier-robust monotonic-association screen.

    Determinism: ranks come from exact integer cumulative counts over the
    DISTINCT-value tables; a tie block's average rank is cum−cnt+(cnt+1)/2,
    carried DOUBLED (2·cum−cnt+1) so it stays integer. All five moment
    sums are exact int64; ρ is one fixed IEEE expression over them,
    half-up 6dp. Σ(dx·dy) ≤ n·(2n)² — int64-safe to roughly SF 5 (n≈1.5M);
    beyond that, carry the moment sums as DECIMAL(38,0) or demean first.
    Scale note: the rank windows run over distinct-value tables (the KS
    single-reducer bound); the rank join back onto the base is a
    broadcastable value-keyed equi join; everything else is one
    partial+final aggregate of the fact stream.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    base = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("yv")
        )
        .select(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("xv"),
            "yv",
        )
    )
    w = lambda col: Window.orderBy(col).rowsBetween(  # noqa: E731
        Window.unboundedPreceding, Window.currentRow
    )
    gx = (
        base.groupBy("xv")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("xv", "cnt", F.sum("cnt").over(w("xv")).alias("cum"))
        .select("xv", (2 * F.col("cum") - F.col("cnt") + 1).alias("dx"))
    )
    gy = (
        base.groupBy("yv")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("yv", "cnt", F.sum("cnt").over(w("yv")).alias("cum"))
        .select("yv", (2 * F.col("cum") - F.col("cnt") + 1).alias("dy"))
    )
    s = (
        base.join(F.broadcast(gx), "xv")
        .join(F.broadcast(gy), "yv")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dx").cast("long").alias("sdx"),
            F.sum("dy").cast("long").alias("sdy"),
            F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sdx2"),
            F.sum(F.col("dy") * F.col("dy")).cast("long").alias("sdy2"),
            F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sdxy"),
        )
    )
    num = F.col("n").cast("double") * F.col("sdxy") - F.col("sdx").cast("double") * F.col("sdy")
    den = F.sqrt(
        (F.col("n").cast("double") * F.col("sdx2") - F.col("sdx").cast("double") * F.col("sdx"))
        * (F.col("n").cast("double") * F.col("sdy2") - F.col("sdy").cast("double") * F.col("sdy"))
    )
    return s.select(
        "n",
        (F.floor(num / den * 1000000 + F.lit(0.5)) / 1000000).alias("spearman_rho"),
    )


# Kendall τ-b over per-nation aggregates: a BOUNDED pair set (25 nations →
# 300 pairs), so the quadratic pair expansion is deliberate and tiny — the
# exact-statistic twin one computes on grouped data, not raw facts.
_KENDALL_SQL = """
WITH nat AS (
  SELECT c.c_nationkey AS nk,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS xm,
         CAST(COUNT(*) AS BIGINT) AS ym
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey
),
pairs AS (
  SELECT a.xm AS xa, a.ym AS ya, b.xm AS xb, b.ym AS yb
  FROM nat a JOIN nat b ON a.nk < b.nk
),
cnt AS (
  SELECT CAST((SELECT COUNT(*) FROM nat) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pairs
)
SELECT n, n0, c AS concordant, d AS discordant,
       FLOOR((CAST(c AS DOUBLE) - d)
             / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty))
             * 1000000 + 0.5) / 1000000 AS kendall_tau_b
FROM cnt
"""


@register("stats_kendall_tau", oracle=_KENDALL_SQL, tier="T2")
def stats_kendall_tau(spark, sf_dir):
    """Kendall τ-b between per-nation total revenue and order count —
    concordant/discordant pair counting with the tie-corrected τ-b
    denominator. The pair set is BOUNDED by construction (25 nations →
    300 pairs), which is the honest way to run an O(n²) statistic at any
    scale: aggregate the fact stream to group level first, pair the
    groups.

    Determinism: every pair verdict is an integer sign test on exact
    cent/count aggregates ((xa−xb)·(ya−yb) ≤ 25-nation cent sums squared
    ≈ (6e10)² at sf1 — int64-safe to ~SF 15); τ-b is one fixed IEEE
    expression over five exact integers, half-up 6dp. Scale note: the
    nation aggregate is one partial+final pass; the 25×25 self-pairing is
    a deliberately bounded broadcast nested-loop (BNLJ_ALLOWED).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    nat = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("xm"),
            F.count(F.lit(1)).cast("long").alias("ym"),
        )
    )
    a = nat.select(
        F.col("nk").alias("nka"), F.col("xm").alias("xa"), F.col("ym").alias("ya")
    )
    b = nat.select(
        F.col("nk").alias("nkb"), F.col("xm").alias("xb"), F.col("ym").alias("yb")
    )
    pairs = a.join(F.broadcast(b), F.col("nka") < F.col("nkb"))
    nrow = nat.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cnt = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(
            F.when((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0, 1).otherwise(0)
        ).cast("long").alias("c"),
        F.sum(
            F.when((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0, 1).otherwise(0)
        ).cast("long").alias("d"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0)).cast("long").alias("tx"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0)).cast("long").alias("ty"),
    ).crossJoin(F.broadcast(nrow))
    tau = (F.col("c").cast("double") - F.col("d")) / F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double") * (F.col("n0") - F.col("ty"))
    )
    return cnt.select(
        "n",
        "n0",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        (F.floor(tau * 1000000 + F.lit(0.5)) / 1000000).alias("kendall_tau_b"),
    )
