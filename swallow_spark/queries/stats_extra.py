"""Statistical / profiling aggregates beyond the §2.D inventory.

Training-data pipelines lean on these for corpus monitoring: argmin/argmax
audits, per-group regression drift, distribution entropy, Benford digit
profiling (fraud/synthetic-data smell test), concentration indices.

Determinism notes (§2.0): every float that crosses the engine boundary is
either (a) an exact integer ratio computed with ONE division, (b) half-up
rounded via the conform primitives, or (c) an order-fixed fold (sorted
collect + aggregate()/list_reduce), the same recipe ts_ewma established.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register

# Composite ordering key: exact integer cents * 1e10 + orderkey. min_by /
# max_by are tie-unstable on raw doubles; packing the tiebreak into one
# BIGINT makes arg-extraction reproducible in both engines. Headroom: cents
# up to ~9e8 fit beside a 1e10 orderkey range in int64; at 100 TB key space
# switch to max_by over a (price, orderkey) STRUCT (Spark orders structs
# lexicographically) — the packed form is only for oracle parity.
_ORD_KEY = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000000 + o_orderkey"


@register(
    "agg_argminmax",
    oracle=f"""
SELECT o_orderstatus,
       arg_max(o_custkey, {_ORD_KEY}) AS hi_cust,
       arg_max(o_orderkey, {_ORD_KEY}) AS hi_order,
       arg_min(o_custkey, {_ORD_KEY}) AS lo_cust,
       arg_min(o_orderkey, {_ORD_KEY}) AS lo_order
FROM orders
GROUP BY o_orderstatus
""",
    tier="T2",
)
def agg_argminmax(spark, sf_dir):
    """min_by/max_by: who placed the cheapest/priciest order per status.

    Scale note: arg-extraction is a single-pass mergeable aggregate (partial
    keeps one candidate per group) — no sort, no window, shuffle carries
    |groups| rows.
    """
    o = load(spark, sf_dir, "orders").withColumn("ord_key", F.expr(_ORD_KEY))
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_custkey", "ord_key").alias("hi_cust"),
        F.max_by("o_orderkey", "ord_key").alias("hi_order"),
        F.min_by("o_custkey", "ord_key").alias("lo_cust"),
        F.min_by("o_orderkey", "ord_key").alias("lo_order"),
    )


@register(
    "agg_regression",
    oracle=f"""
SELECT l_returnflag,
       {sql_rnd('regr_slope(l_extendedprice, l_quantity)', 4)} AS slope,
       {sql_rnd('regr_intercept(l_extendedprice, l_quantity)', 4)} AS intercept,
       {sql_rnd('regr_r2(l_extendedprice, l_quantity)', 4)} AS r2,
       regr_count(l_extendedprice, l_quantity) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    tier="T2",
)
def agg_regression(spark, sf_dir):
    """Per-group OLS fit (price ~ quantity): slope/intercept/R², 4dp.

    Drift monitoring shape: refit a cheap linear model per segment every
    batch and alert on coefficient movement. Single-pass co-moment
    aggregates — mergeable partials, no second scan.
    """
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        rnd(F.regr_slope(y, x), 4).alias("slope"),
        rnd(F.regr_intercept(y, x), 4).alias("intercept"),
        rnd(F.regr_r2(y, x), 4).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "agg_entropy",
    oracle=f"""
WITH c AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), folded AS (
  SELECT event_type, SUM(n) AS tot,
         list_reduce(
           list_prepend(0.0, LIST(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) ORDER BY h)),
           (acc, v) -> acc + v) AS nlogn
  FROM c GROUP BY event_type
)
SELECT event_type, {sql_rnd('ln(tot) - nlogn / tot', 4)} AS entropy
FROM folded
""",
    tier="T2",
)
def agg_entropy(spark, sf_dir):
    """Shannon entropy of the hour-of-day distribution per event type, 4dp.

    Uniform-over-24h gives ln(24)≈3.178; low entropy flags bot-like or
    clock-skewed traffic. H = ln(tot) - Σ n·ln(n)/tot with the Σ folded in
    hour order (collect_list→aggregate ↔ LIST ORDER BY→list_reduce) so the
    float accumulation order is identical in both engines regardless of
    partitioning.
    """
    e = load(spark, sf_dir, "events")
    c = e.groupBy("event_type", F.hour("ts").alias("h")).count()
    folded = c.groupBy("event_type").agg(
        F.sum("count").alias("tot"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("h"), F.col("count").alias("n")))),
            F.lit(0.0),
            lambda acc, v: acc + v["n"].cast("double") * F.log(v["n"].cast("double")),
        ).alias("nlogn"),
    )
    return folded.select(
        "event_type",
        rnd(F.log(F.col("tot")) - F.col("nlogn") / F.col("tot"), 4).alias("entropy"),
    )


@register(
    "stats_benford",
    oracle="""
WITH d AS (
  SELECT CAST(FLOOR(o_totalprice / POWER(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
)
SELECT digit, COUNT(*) AS cnt,
       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS pct
FROM d GROUP BY digit ORDER BY digit
""",
    tier="T2",
)
def stats_benford(spark, sf_dir):
    """First-significant-digit distribution of order totals (Benford check).

    Synthetic or tampered numeric columns drift from the Benford curve;
    profiling it is a one-scan aggregate. The digit is derived arithmetically
    (floor(x/10^floor(log10 x))) — never via float→string formatting, which
    differs between engines. pct is one exact-int division (deterministic).
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).alias("digit")
    counts = o.select(digit).groupBy("digit").count().withColumnRenamed("count", "cnt")
    from pyspark.sql.window import Window

    return (
        counts.withColumn(
            "pct", F.col("cnt").cast("double") / F.sum("cnt").over(Window.partitionBy())
        )
        .orderBy("digit")
        .select("digit", "cnt", "pct")
    )


@register(
    "agg_hhi",
    oracle="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus,
       CAST(SUM(n * n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)) AS hhi
FROM c GROUP BY o_orderstatus
""",
    tier="T2",
)
def agg_hhi(spark, sf_dir):
    """Herfindahl concentration of priority mix per order status.

    HHI = Σ share² rewritten as Σn² / (Σn)² — both sums are exact integers,
    leaving ONE float division, so the result is bit-identical across
    engines and partitionings with no rounding canonicalization at all.
    """
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").count()
    return c.groupBy("o_orderstatus").agg(
        (
            F.sum(F.col("count") * F.col("count")).cast("double")
            / (F.sum("count").cast("double") * F.sum("count").cast("double"))
        ).alias("hhi")
    )


@register(
    "stats_chisq_independence",
    oracle="""
WITH obs AS (
  SELECT event_type, CAST(FLOOR(date_part('hour', ts) / 6) AS BIGINT) AS hband,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
ct AS (SELECT hband, SUM(o) AS c FROM obs GROUP BY 1),
n AS (SELECT SUM(o) AS n FROM obs),
terms AS (
  SELECT obs.event_type, obs.hband,
         (CAST(obs.o AS DOUBLE)
          - CAST(rt.r AS DOUBLE) * ct.c / n.n) ** 2
           / (CAST(rt.r AS DOUBLE) * ct.c / n.n) AS term
  FROM obs JOIN rt USING (event_type) JOIN ct USING (hband) CROSS JOIN n
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       FLOOR(list_reduce(list(term ORDER BY event_type, hband),
                         (a, b) -> a + b) * 10000 + 0.5) / 10000 AS chi2
FROM terms
""",
    tier="T2",
)
def stats_chisq_independence(spark, sf_dir):
    """Chi-squared independence test: event_type × 6-hour band contingency
    table, χ² = Σ (O−E)²/E with E from exact integer marginals — the drift
    monitor for "did the event mix change with time-of-day?".

    Determinism: every O/R/C/N is an exact integer; each cell's term is one
    fixed IEEE expression; the cross-cell sum is an ORDER-FIXED fold over
    the (type, band)-sorted term list (ts_ewma recipe) — never a float SUM()
    whose partial order varies. Scale: the contingency table is |types|×4
    cells regardless of input size; one aggregate over the fact stream,
    everything after operates on tens of rows.
    """
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.hour("ts") / 6).cast("long").alias("hband")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("hband").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    ex = F.col("r").cast("double") * F.col("c") / F.col("n")
    terms = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hband")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "hband",
            ((F.col("o").cast("double") - ex) ** 2 / ex).alias("term"),
        )
    )
    folded = (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sort_array(
                F.collect_list(F.struct("event_type", "hband", "term"))
            ).alias("s"),
        )
        .withColumn(
            "chi2_raw",
            F.expr(
                "aggregate(s, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
            ),
        )
    )
    return folded.select(
        "n_cells",
        (F.floor(F.col("chi2_raw") * 10000 + F.lit(0.5)) / 10000).alias("chi2"),
    )


_KS_NE = "CAST(n1 * n2 AS DOUBLE) / (n1 + n2)"

_KS_SQL = f"""
WITH s AS (
  SELECT c_acctbal AS v,
         SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c_acctbal
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM s),
cum AS (
  SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
         SUM(c2) OVER (ORDER BY v) AS cum2
  FROM s
),
d AS (
  SELECT MAX(ABS(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2)) AS d_stat
  FROM cum CROSS JOIN tot
)
SELECT CAST(n1 AS BIGINT) AS n1,
       CAST(n2 AS BIGINT) AS n2,
       {sql_rnd('d_stat', 6)} AS d_stat,
       {sql_rnd(f'(sqrt({_KS_NE}) + 0.12 + 0.11 / sqrt({_KS_NE})) * d_stat', 4)} AS ks_lambda
FROM d CROSS JOIN tot
"""


@register("stats_ks_test", oracle=_KS_SQL, tier="T2")
def stats_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov test: D = max |F1 − F2| between the
    account-balance distributions of two market segments, plus the
    scaled statistic λ = (√nₑ + 0.12 + 0.11/√nₑ)·D (the input to the
    asymptotic p-value series) — distribution-drift detection for corpus
    and feature monitoring.

    Determinism: ECDF steps are exact integer cumulative counts divided
    once per row (exact below 2^53), so the max and λ are bit-identical in
    both engines; the only window runs over DISTINCT values pre-aggregated
    per value, which also bounds the single-reducer sort input to
    |distinct values| rows — the 100 TB-safe formulation of a global-sort
    statistic.
    """
    c = load(spark, sf_dir, "customer")
    s = (
        c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(F.col("c_acctbal").alias("v"))
        .agg(
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias("c2"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = s.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = s.select(
        F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ).alias("d_stat")
        )
    )
    ne = F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2"))
    return d.crossJoin(F.broadcast(tot)).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        rnd(F.col("d_stat"), 6).alias("d_stat"),
        rnd((F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * F.col("d_stat"), 4).alias(
            "ks_lambda"
        ),
    )


_MW_SQL = """
WITH s AS (
  SELECT c_acctbal AS v,
         SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS c2
  FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')
  GROUP BY c_acctbal
),
cum AS (
  SELECT c1, c2, (c1 + c2) AS c,
         SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS prev
  FROM s
),
agg AS (
  SELECT SUM(c1) AS n1, SUM(c2) AS n2,
         SUM(c1 * (2 * prev + c + 1)) AS two_r1,
         SUM(c * c * c - c) AS tie_term
  FROM cum
)
SELECT CAST(n1 AS BIGINT) AS n1,
       CAST(n2 AS BIGINT) AS n2,
       (FLOOR((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2) * 100 + 0.5) / 100) AS u1,
       (FLOOR((
          (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2
           - CAST(n1 * n2 AS DOUBLE) / 2)
          / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                 * ((n1 + n2 + 1) - CAST(tie_term AS DOUBLE)
                    / ((n1 + n2) * (n1 + n2 - 1.0))))
        ) * 10000 + 0.5) / 10000) AS z_stat
FROM agg
"""


@register("stats_mann_whitney", oracle=_MW_SQL, tier="T2")
def stats_mann_whitney(spark, sf_dir):
    """Mann–Whitney U (rank-sum) test with tie-corrected normal
    approximation between two market segments' balance distributions —
    the non-parametric complement to stats_ks_test for distribution-shift
    monitoring.

    Determinism: rank sums are computed in doubled integer units
    (2·avg-rank = 2·prev + t + 1 is always an integer), ties contribute
    t³−t exactly, and only the final z divides through doubles — identical
    IEEE sequences in both engines.

    Scale note: like stats_ks_test, the global window runs over the
    per-distinct-value pre-aggregate (|distinct| rows), never the raw
    table; everything else is one map-side-combinable aggregate.
    """
    c = load(spark, sf_dir, "customer")
    s = (
        c.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE"))
        .groupBy(F.col("c_acctbal").alias("v"))
        .agg(
            F.sum(F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("c_mktsegment") == "FURNITURE", 1).otherwise(0)).alias("c2"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = s.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("c"),
        (F.sum(F.col("c1") + F.col("c2")).over(w) - (F.col("c1") + F.col("c2"))).alias(
            "prev"
        ),
    )
    agg = cum.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (F.lit(2) * F.col("prev") + F.col("c") + 1)).alias("two_r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie_term"),
    )
    u1 = (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2
    mean_u = F.col("n1").cast("double") * F.col("n2") / 2
    var_u = (
        F.col("n1").cast("double") * F.col("n2") / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie_term").cast("double")
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - F.lit(1.0)))
        )
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.floor(u1 * 100 + F.lit(0.5)) / 100).alias("u1"),
        (F.floor((u1 - mean_u) / F.sqrt(var_u) * 10000 + F.lit(0.5)) / 10000).alias(
            "z_stat"
        ),
    )


_TT_CENTS = "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"

_TT_SQL = f"""
WITH g AS (
  SELECT
    SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN {_TT_CENTS} ELSE 0 END) AS s1,
    SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN {_TT_CENTS} * {_TT_CENTS} ELSE 0 END) AS q1,
    SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS n2,
    SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN {_TT_CENTS} ELSE 0 END) AS s2,
    SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN {_TT_CENTS} * {_TT_CENTS} ELSE 0 END) AS q2
  FROM customer
  WHERE c_mktsegment IN ('HOUSEHOLD', 'BUILDING')
),
d AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 AS m1,
         CAST(s2 AS DOUBLE) / n2 AS m2,
         (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n1 AS DOUBLE) * (n1 - 1)) AS v1,
         (CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
           / (CAST(n2 AS DOUBLE) * (n2 - 1)) AS v2
  FROM g
),
e AS (
  SELECT n1, n2, m1, m2, v1, v2, v1 / n1 + v2 / n2 AS se2 FROM d
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       {sql_rnd('(m1 - m2) / 100', 4)} AS mean_diff,
       {sql_rnd('(m1 - m2) / sqrt(se2)', 4)} AS t_stat,
       {sql_rnd(
           'se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)'
           ' + (v2 / n2) * (v2 / n2) / (n2 - 1))', 2)} AS df_welch
FROM e
"""


@register("stats_ttest_welch", oracle=_TT_SQL, tier="T2")
def stats_ttest_welch(spark, sf_dir):
    """Welch's two-sample t-test (unequal variances) between the
    HOUSEHOLD and BUILDING segments' account balances: t statistic plus
    the Welch–Satterthwaite degrees of freedom — the parametric member of
    the drift-test family (KS = distribution shape, Mann–Whitney = rank
    shift, Welch = mean shift).

    Determinism: n/Σx/Σx² are exact int64 in integer cents (headroom:
    cents² ≤ ~1.2e12, so Σx² stays < 2^53 — exactly double-representable —
    through sf0.1; beyond that the int64 sums are still exact and the ONE
    int→double conversion rounds identically in both engines), and every
    subsequent double op is spelled identically on both sides, so the IEEE
    sequences match bit-for-bit before the final half-up rounds.

    Scale note: one map-side-combinable aggregate over the filtered scan —
    a single row crosses the shuffle; nothing here grows with data size.
    """
    c = load(spark, sf_dir, "customer")
    cb = F.expr(_TT_CENTS)
    is1 = F.col("c_mktsegment") == "HOUSEHOLD"
    is2 = F.col("c_mktsegment") == "BUILDING"
    g = c.filter(F.col("c_mktsegment").isin("HOUSEHOLD", "BUILDING")).agg(
        F.sum(F.when(is1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(is1, cb).otherwise(0)).alias("s1"),
        F.sum(F.when(is1, cb * cb).otherwise(0)).alias("q1"),
        F.sum(F.when(is2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(is2, cb).otherwise(0)).alias("s2"),
        F.sum(F.when(is2, cb * cb).otherwise(0)).alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (n1.cast("double") * F.col("q1") - F.col("s1").cast("double") * F.col("s1")) / (
        n1.cast("double") * (n1 - 1)
    )
    v2 = (n2.cast("double") * F.col("q2") - F.col("s2").cast("double") * F.col("s2")) / (
        n2.cast("double") * (n2 - 1)
    )
    d = g.select("n1", "n2", m1.alias("m1"), m2.alias("m2"), v1.alias("v1"), v2.alias("v2"))
    e = d.select(
        "n1", "n2", "m1", "m2", "v1", "v2",
        (F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")).alias("se2"),
    )
    vn1 = F.col("v1") / F.col("n1")
    vn2 = F.col("v2") / F.col("n2")
    return e.select(
        "n1",
        "n2",
        rnd((F.col("m1") - F.col("m2")) / 100, 4).alias("mean_diff"),
        rnd((F.col("m1") - F.col("m2")) / F.sqrt(F.col("se2")), 4).alias("t_stat"),
        rnd(
            F.col("se2") * F.col("se2")
            / (vn1 * vn1 / (F.col("n1") - 1) + vn2 * vn2 / (F.col("n2") - 1)),
            2,
        ).alias("df_welch"),
    )


_GINI_SQL = """
WITH s AS (
  SELECT o_orderpriority AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT grp, v, c,
         SUM(c) OVER (PARTITION BY grp ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
  FROM s
),
agg AS (
  SELECT grp,
         SUM(c) AS n,
         SUM(c * v) AS sv,
         -- sum of rank-weighted values with ties collapsed: each of the c
         -- equal values at cumulative position cr takes the average rank
         -- block (2*cr - c + 1)/2, kept in DOUBLED integer units
         SUM(v * c * (2 * cr - c + 1)) AS two_rw
  FROM cum GROUP BY grp
)
SELECT grp AS o_orderpriority,
       CAST(n AS BIGINT) AS n_orders,
       (FLOOR((CAST(two_rw AS DOUBLE) / (CAST(n AS DOUBLE) * sv)
               - (CAST(n AS DOUBLE) + 1) / n) * 1000000 + 0.5) / 1000000) AS gini
FROM agg
"""


@register("agg_gini", oracle=_GINI_SQL, tier="T2")
def agg_gini(spark, sf_dir):
    """Gini coefficient of order value per priority class (the
    concentration complement to agg_hhi): G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx),
    computed tie-correctly from the per-distinct-value pre-aggregate —
    corpus-spend / revenue-inequality monitoring.

    Determinism: rank-weighted sums stay in DOUBLED integer units
    (2·avg-rank of a tie block is always an integer: 2·cr − c + 1 summed
    over the block), exactly the Mann–Whitney recipe; two mirrored double
    divisions at the end, half-up 6dp.

    Scale note: like stats_ks_test, the window runs over DISTINCT values
    per group (not raw rows), so the per-group sort input is |distinct|
    and everything else is map-side combinable.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    s = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = s.withColumn("cr", F.sum("c").over(w))
    agg = cum.groupBy("grp").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("sv"),
        F.sum(F.col("v") * F.col("c") * (2 * F.col("cr") - F.col("c") + 1)).alias(
            "two_rw"
        ),
    )
    return agg.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n_orders"),
        (
            F.floor(
                (
                    F.col("two_rw").cast("double")
                    / (F.col("n").cast("double") * F.col("sv"))
                    - (F.col("n").cast("double") + 1) / F.col("n")
                )
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("gini"),
    )


_ANOVA_CENTS = "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"

_ANOVA_SQL = f"""
WITH g AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({_ANOVA_CENTS}) AS BIGINT) AS s,
         CAST(SUM({_ANOVA_CENTS} * {_ANOVA_CENTS}) AS BIGINT) AS q
  FROM customer GROUP BY c_mktsegment
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS ss,
         CAST(SUM(q) AS BIGINT) AS qq,
         -- per-group S²/n quantized to integer WHOLE-cent² units BEFORE the
         -- cross-group sum (group iteration order differs between engines);
         -- whole cent² (not centi) so the quantized term is bounded by qq
         -- and never the binding int64 constraint
         CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * s / n + 0.5) AS BIGINT))
              AS BIGINT) AS ssn_cent2
  FROM g
),
f AS (
  SELECT k, nn,
         CAST(ssn_cent2 AS DOUBLE) - CAST(ss AS DOUBLE) * ss / nn AS ssb,
         CAST(qq AS DOUBLE) - CAST(ssn_cent2 AS DOUBLE) AS ssw
  FROM t
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_total,
       {sql_rnd('ssb / 10000', 2)} AS ssb_dollars2,
       {sql_rnd('ssw / 10000', 2)} AS ssw_dollars2,
       {sql_rnd('(ssb / (k - 1)) / (ssw / (nn - k))', 4)} AS f_stat
FROM f
"""


@register("stats_anova_oneway", oracle=_ANOVA_SQL, tier="T2")
def stats_anova_oneway(spark, sf_dir):
    """One-way ANOVA across ALL market segments' account balances:
    between/within sums of squares and the F statistic — the k-group
    generalization of stats_ttest_welch for segment-means drift.

    Determinism: per-group n/Σx/Σx² are exact int64 cents; the one
    order-sensitive reduction (Σᵢ Sᵢ²/nᵢ across groups) quantizes each
    group's term to integer whole-cent² units BEFORE the sum, so
    cross-group iteration order cannot move a bit; the remaining
    arithmetic is mirrored IEEE with half-up rounds. Quantization error
    (< k cent² total) is ~6 orders of magnitude below the 2-decimal
    dollar² output resolution.

    int64 headroom: each quantized term Sᵢ²/nᵢ ≤ Σx² (Cauchy–Schwarz), so
    the binding constraint is the exact cent² moment qq ≈ n·(max cents)²
    — overflow at roughly SF 250, the same bound documented for
    stats_ttest_welch / ts_time_weighted_avg.

    Scale note: one map-side-combinable aggregate + a k-row reduction —
    nothing scales with table size.
    """
    c = load(spark, sf_dir, "customer")
    cb = F.expr(_ANOVA_CENTS)
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cb).alias("s"),
        F.sum(cb * cb).alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(
            F.floor(
                F.col("s").cast("double") * F.col("s") / F.col("n") + F.lit(0.5)
            ).cast("long")
        ).alias("ssn_cent2"),
    )
    fdf = t.select(
        "k",
        "nn",
        (
            F.col("ssn_cent2").cast("double")
            - F.col("ss").cast("double") * F.col("ss") / F.col("nn")
        ).alias("ssb"),
        (F.col("qq").cast("double") - F.col("ssn_cent2").cast("double")).alias(
            "ssw"
        ),
    )
    return fdf.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        rnd(F.col("ssb") / 10000, 2).alias("ssb_dollars2"),
        rnd(F.col("ssw") / 10000, 2).alias("ssw_dollars2"),
        rnd(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            4,
        ).alias("f_stat"),
    )


_PARETO_SQL = """
WITH rev AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
cum AS (
  SELECT seg, cust, cents,
         SUM(cents) OVER (PARTITION BY seg ORDER BY cents DESC, cust
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
         SUM(cents) OVER (PARTITION BY seg) AS tot
  FROM rev
)
SELECT seg AS c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       -- a customer is needed while the PRIOR cumulative is below 80% of
       -- total: 5*(cr - cents) < 4*tot — exact integer comparison, no floats
       CAST(SUM(CASE WHEN 5 * (cr - cents) < 4 * tot THEN 1 ELSE 0 END) AS BIGINT)
         AS n_top80,
       (FLOOR(CAST(SUM(CASE WHEN 5 * (cr - cents) < 4 * tot THEN 1 ELSE 0 END)
                   AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000) AS top80_pct
FROM cum
GROUP BY seg
"""


@register("agg_pareto_coverage", oracle=_PARETO_SQL, tier="T2")
def agg_pareto_coverage(spark, sf_dir):
    """Pareto concentration per segment: how many customers (and what
    fraction of the base) cover 80% of segment revenue — the 80/20
    check that complements agg_gini/agg_hhi with an actionable head
    count.

    Determinism: revenue is exact integer cents; the 80% threshold is
    the exact integer comparison 5·cum_prev < 4·total (no float 0.8
    anywhere); one division for the final pct, half-up 6dp.

    Scale note: per-customer revenue reduces the window input to
    |customers| rows; the cumulative and the total share one
    segment-keyed partition/sort.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rev = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents"
            )
        )
    )
    wc = (
        Window.partitionBy("seg")
        .orderBy(F.col("cents").desc(), "cust")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("seg")
    cum = rev.select(
        "seg",
        "cents",
        F.sum("cents").over(wc).alias("cr"),
        F.sum("cents").over(wt).alias("tot"),
    )
    needed = F.when(5 * (F.col("cr") - F.col("cents")) < 4 * F.col("tot"), 1).otherwise(0)
    return cum.groupBy(F.col("seg").alias("c_mktsegment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(needed).cast("long").alias("n_top80"),
        (
            F.floor(
                F.sum(needed).cast("double") / F.count(F.lit(1)) * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias("top80_pct"),
    )


_LEVENE_SQL = f"""
WITH base AS (
  SELECT c_mktsegment, {_ANOVA_CENTS} AS cents FROM customer
),
med AS (
  -- exact median in DOUBLED units: 2*median of ints is always an integer
  SELECT c_mktsegment, CAST(2 * median(cents) AS BIGINT) AS med2
  FROM base GROUP BY c_mktsegment
),
dev AS (
  SELECT b.c_mktsegment, abs(2 * b.cents - m.med2) AS z2
  FROM base b JOIN med m USING (c_mktsegment)
),
g AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z2) AS BIGINT) AS s,
         CAST(SUM(z2 * z2) AS BIGINT) AS q
  FROM dev GROUP BY c_mktsegment
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS BIGINT) AS ss,
         CAST(SUM(q) AS BIGINT) AS qq,
         CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * s / n + 0.5) AS BIGINT))
              AS BIGINT) AS ssn
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_total,
       {sql_rnd('((CAST(ssn AS DOUBLE) - CAST(ss AS DOUBLE) * ss / nn) / (k - 1)) / ((CAST(qq AS DOUBLE) - CAST(ssn AS DOUBLE)) / (nn - k))', 4)} AS w_stat
FROM t
"""


@register("stats_levene", oracle=_LEVENE_SQL, tier="T2")
def stats_levene(spark, sf_dir):
    """Brown–Forsythe (median-centered Levene) test for homogeneity of
    variances across market segments — the standard pre-check before
    trusting stats_anova_oneway's pooled-variance F. W is the one-way
    ANOVA F statistic computed on z = |x − group median|.

    Determinism: group medians in DOUBLED integer units (2·median of ints
    is exact), deviations z2 = |2x − med2| stay integer, per-group
    n/Σz2/Σz2² are exact int64, and the one cross-group reduction
    quantizes each Sᵢ²/nᵢ to whole units before summing (same recipe as
    stats_anova_oneway). W is scale-invariant, so the doubled units
    cancel exactly.

    int64 headroom: Σz2² ≈ n·(2·max|dev|)² ≈ 2.4e18 at sf1 → overflow
    near SF 30; the quantized Σ Sᵢ²/nᵢ term is bounded by Σz2²
    (Cauchy–Schwarz), so it is never the binding constraint.

    Scale note: one median aggregate + one moment aggregate + a k-row
    reduction — medians sort within segment partitions, nothing global.
    """
    c = load(spark, sf_dir, "customer")
    cb = F.expr(_ANOVA_CENTS)
    base = c.select("c_mktsegment", cb.alias("cents"))
    med = base.groupBy("c_mktsegment").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("long").alias("med2")
    )
    dev = base.join(med, "c_mktsegment").select(
        "c_mktsegment", F.abs(2 * F.col("cents") - F.col("med2")).alias("z2")
    )
    g = dev.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z2").alias("s"),
        F.sum(F.col("z2") * F.col("z2")).alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(
            F.floor(
                F.col("s").cast("double") * F.col("s") / F.col("n") + F.lit(0.5)
            ).cast("long")
        ).alias("ssn"),
    )
    ssb = F.col("ssn").cast("double") - F.col("ss").cast("double") * F.col("ss") / F.col("nn")
    ssw = F.col("qq").cast("double") - F.col("ssn").cast("double")
    return t.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        rnd((ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 4).alias(
            "w_stat"
        ),
    )


_JK_FOLDS = 20
_JK_FOLD = f"(((c_custkey % 1000003) * 2654435761) % 1000003) % {_JK_FOLDS}"

_JACKKNIFE_SQL = f"""
WITH base AS (
  SELECT {_JK_FOLD} AS fold, {_ANOVA_CENTS} AS cents FROM customer
),
g AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_i, CAST(SUM(cents) AS BIGINT) AS s_i
  FROM base GROUP BY fold
),
t AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(s_i) AS BIGINT) AS s FROM g
),
mi AS (
  -- leave-one-fold-out mean in exact integer MILLI-cents (per-fold floor)
  SELECT g.fold,
         CAST(FLOOR(CAST(t.s - g.s_i AS DOUBLE) / (t.n - g.n_i) * 1000 + 0.5)
              AS BIGINT) AS mi_m
  FROM g, t
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(mi_m) AS BIGINT) AS sum_mi,
         CAST(SUM(mi_m * mi_m) AS BIGINT) AS sum_mi2
  FROM mi
)
SELECT t.n AS n_total, agg.k AS k_folds,
       {sql_rnd('CAST(t.s AS DOUBLE) / t.n / 100', 4)} AS mean_dollars,
       {sql_rnd('sqrt((CAST(agg.k - 1 AS DOUBLE) / agg.k)'
                ' * (CAST(sum_mi2 AS DOUBLE) - CAST(sum_mi AS DOUBLE) * sum_mi / agg.k))'
                ' / 1000 / 100', 4)} AS jackknife_se_dollars
FROM t, agg
"""


@register("stats_jackknife_se", oracle=_JACKKNIFE_SQL, tier="T2")
def stats_jackknife_se(spark, sf_dir):
    """Delete-a-group jackknife standard error of the mean account balance
    (20 deterministic key-hash folds) — the resampling-based uncertainty
    estimate survey pipelines attach to point estimates when the analytic
    formula is distrusted; hash-fold assignment makes it rerun- and
    partition-stable, unlike RNG bootstrap resamples.

    Determinism: fold assignment is the repo's portable multiplicative
    hash; per-fold leave-out means are floored into exact integer
    milli-cents BEFORE any cross-fold reduction, so Σmᵢ and Σmᵢ² are
    exact int64 (mᵢ ≈ 5e8 milli-cents → mᵢ² ≈ 2.5e17, ×20 folds ≈ 5e18:
    inside int64 at any SF since fold count is fixed and mᵢ is a mean,
    not a sum); the SE is one fixed double expression on those integers.

    Scale note: one map-side-combinable fold aggregate + a 20-row
    reduction — nothing scales beyond the first groupBy.
    """
    c = load(spark, sf_dir, "customer")
    fold = F.expr(_JK_FOLD)
    cb = F.expr(_ANOVA_CENTS)
    g = c.select(fold.alias("fold"), cb.alias("cents")).groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_i"), F.sum("cents").alias("s_i")
    )
    t = g.agg(F.sum("n_i").alias("n"), F.sum("s_i").alias("s"))
    mi = g.crossJoin(F.broadcast(t)).select(
        F.floor(
            (F.col("s") - F.col("s_i")).cast("double")
            / (F.col("n") - F.col("n_i"))
            * 1000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mi_m")
    )
    agg = mi.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("mi_m").alias("sum_mi"),
        F.sum(F.col("mi_m") * F.col("mi_m")).alias("sum_mi2"),
    )
    kd = F.col("k").cast("double")
    var = (kd - 1) / kd * (
        F.col("sum_mi2").cast("double")
        - F.col("sum_mi").cast("double") * F.col("sum_mi") / kd
    )
    return agg.crossJoin(F.broadcast(t)).select(
        F.col("n").cast("long").alias("n_total"),
        F.col("k").cast("long").alias("k_folds"),
        rnd(F.col("s").cast("double") / F.col("n") / 100, 4).alias("mean_dollars"),
        rnd(F.sqrt(var) / 1000 / 100, 4).alias("jackknife_se_dollars"),
    )


# --- deterministic Poisson bootstrap --------------------------------------
# Inverse-CDF thresholds for Poisson(lambda=1) on a 1e4 grid: cumulative
# probabilities e^-1 * (1, 2, 2.5, 2.666.., 2.708..) rounded DOWN to the
# grid so the integer comparison is exact and identical in both engines.
_POIS_THRESH = (3678, 7357, 9196, 9810, 9963)


def _pois_w(u: str) -> str:
    """SQL CASE mapping a uniform 0..9999 draw to a Poisson(1) weight 0-5
    (P(w>5) < 1e-4 is truncated into w=5 — same truncation both engines)."""
    t = _POIS_THRESH
    return (
        f"CASE WHEN {u} < {t[0]} THEN 0 WHEN {u} < {t[1]} THEN 1 "
        f"WHEN {u} < {t[2]} THEN 2 WHEN {u} < {t[3]} THEN 3 "
        f"WHEN {u} < {t[4]} THEN 4 ELSE 5 END"
    )


def _boot_sql() -> str:
    from ..conform import sql_poly_hash_duck

    h = sql_poly_hash_duck("concat(CAST(o_orderkey AS VARCHAR), ':', CAST(b AS VARCHAR))")
    return f"""
WITH grid AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         g.b
  FROM orders CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS b) g
),
weighted AS (
  SELECT b, cents, {_pois_w(f"(({h}) % 10000)")} AS w FROM grid
),
reps AS (
  SELECT b, SUM(w) AS n_b, SUM(w * cents) AS s_b FROM weighted GROUP BY b
),
qm AS (
  SELECT b, CAST(FLOOR(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) + 0.5) AS BIGINT)
              AS mb_cents
  FROM reps
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b_reps,
         SUM(mb_cents) AS s1, SUM(mb_cents * mb_cents) AS s2
  FROM qm
)
SELECT b_reps,
       (FLOOR(CAST(s1 AS DOUBLE) / (8.0 * 100.0) * 10000 + 0.5) / 10000)
         AS boot_mean,
       (FLOOR(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 8.0)
                   / 7.0) / 100.0 * 10000 + 0.5) / 10000) AS boot_se
FROM mom
"""


@register("stats_poisson_bootstrap", oracle=_boot_sql(), tier="T2")
def stats_poisson_bootstrap(spark, sf_dir):
    """Poisson bootstrap standard error of the mean order price — the
    single-pass, shuffle-free resampling scheme used at data scale (each row
    draws an independent Poisson(1) replication weight per replicate, so no
    sampling pass over the data is ever materialized). B=8 replicates.

    Determinism: the 'random' weights are the portable polynomial hash of
    (o_orderkey, replicate) reduced mod 1e4 and mapped through a fixed
    integer inverse-CDF grid — fully reproducible on both engines, any
    partitioning. Replicate means are quantized to int64 cents before the
    cross-replicate moments (cross-group double sums are partition-order
    dependent; int64 sums are not). int64 headroom: mb_cents^2 ~ 2e14, x8
    replicates ~ 2e15 — three orders below overflow, scale-independent
    (the mean does not grow with SF).

    Scale note: the replicate grid is an in-row explode (no join), weights
    are computed map-side, and the whole job is one partial-agg shuffle of
    8 groups; the 8-row moment step is a second trivial aggregate. This is
    the textbook 100 TB bootstrap — one linear scan, O(B) state.
    """
    from ..conform import sql_poly_hash_spark

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    grid = o.select(
        "o_orderkey", "cents", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b")
    )
    h = sql_poly_hash_spark("concat(CAST(o_orderkey AS STRING), ':', CAST(b AS STRING))")
    weighted = grid.withColumn("w", F.expr(_pois_w(f"(({h}) % 10000)")))
    reps = weighted.groupBy("b").agg(
        F.sum("w").alias("n_b"), F.sum(F.col("w") * F.col("cents")).alias("s_b")
    )
    qm = reps.select(
        F.floor(F.col("s_b").cast("double") / F.col("n_b").cast("double") + F.lit(0.5))
        .cast("long")
        .alias("mb_cents")
    )
    mom = qm.agg(
        F.count(F.lit(1)).cast("long").alias("b_reps"),
        F.sum("mb_cents").alias("s1"),
        F.sum(F.col("mb_cents") * F.col("mb_cents")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    return mom.select(
        "b_reps",
        (F.floor(s1d / (F.lit(8.0) * F.lit(100.0)) * 10000 + F.lit(0.5)) / 10000).alias(
            "boot_mean"
        ),
        (
            F.floor(
                F.sqrt((s2d - s1d * s1d / F.lit(8.0)) / F.lit(7.0)) / F.lit(100.0) * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("boot_se"),
    )


@register(
    "stats_crosstab",
    oracle="""
SELECT CAST(user_id % 10 AS VARCHAR) AS user_id_event_type,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY user_id % 10
""",
    tier="T2",
)
def stats_crosstab(spark, sf_dir):
    """Contingency table via df.stat.crosstab (the DataFrameStatFunctions
    surface): user-cohort (user_id mod 10) x event_type counts. The column
    set is data-derived at runtime; the oracle pins the five known event
    types as FILTER aggregates — if the generator ever adds a type, the
    schema mismatch (not a silent wrong count) flags it.

    Determinism: pure integer counts. Columns are sorted by the driver's
    canonicalization, so the dynamic column order is immaterial.

    Scale note: crosstab compiles to a pivot aggregate — one partial-agg
    shuffle of |cohorts| x |types| cells, nothing collected to the driver
    beyond the final tiny table.
    """
    e = load(spark, sf_dir, "events")
    ct = e.withColumn("cohort", (F.col("user_id") % 10)).stat.crosstab(
        "cohort", "event_type"
    )
    # crosstab returns the row-key column as string named 'cohort_event_type'
    return ct.select(
        F.col("cohort_event_type").alias("user_id_event_type"),
        F.col("click").cast("long").alias("click"),
        F.col("error").cast("long").alias("error"),
        F.col("purchase").cast("long").alias("purchase"),
        F.col("signup").cast("long").alias("signup"),
        F.col("view").cast("long").alias("view"),
    )


# ----------------------------------------------------------- Kaplan-Meier
# Subjects: users with a signup event. Event: first purchase AT-OR-AFTER
# the first signup; duration = days from signup day to purchase day.
# Censored: no such purchase; censor duration = days from signup day to the
# global max event date. KM convention: subjects censored at t are still at
# risk at t (n_t counts dur >= t, events and censored alike).
_KM_SQL = """
WITH su AS (
  SELECT user_id, MIN(ts) AS sts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
pu AS (
  SELECT e.user_id, MIN(e.ts) AS pts
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= su.sts
  GROUP BY e.user_id
),
mx AS (SELECT CAST(MAX(ts) AS DATE) AS maxd FROM events),
dur AS (
  SELECT su.user_id,
         CASE WHEN pu.pts IS NOT NULL
              THEN datediff('day', CAST(su.sts AS DATE), CAST(pu.pts AS DATE))
              ELSE datediff('day', CAST(su.sts AS DATE), mx.maxd) END AS dur,
         CASE WHEN pu.pts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM su LEFT JOIN pu ON su.user_id = pu.user_id CROSS JOIN mx
),
hist AS (
  SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(ev) AS BIGINT) AS d
  FROM dur GROUP BY dur
),
risk AS (
  SELECT dur, cnt, d,
         CAST(SUM(cnt) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(cnt) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_at_risk
  FROM hist
),
ev AS (SELECT dur, d, n_at_risk FROM risk WHERE d > 0)
SELECT e1.dur AS t, e1.d AS d_events, e1.n_at_risk,
       FLOOR(list_reduce(
               list_prepend(CAST(1 AS DOUBLE),
                 list(CAST(1 AS DOUBLE)
                      - CAST(e2.d AS DOUBLE) / CAST(e2.n_at_risk AS DOUBLE)
                      ORDER BY e2.dur)),
               (a, f) -> a * f) * 1000000 + 0.5) / 1000000 AS survival
FROM ev e1 JOIN ev e2 ON e2.dur <= e1.dur
GROUP BY e1.dur, e1.d, e1.n_at_risk
"""


@register("stats_survival_km", oracle=_KM_SQL, tier="T2")
def stats_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve for signup→first-purchase conversion:
    S(t) = Π_{u≤t} (1 − d_u/n_u) over distinct event days, with users who
    never purchase right-censored at the end of the observation window —
    THE time-to-event estimator (retention, churn, time-to-label) that
    naive conversion rates get wrong by ignoring censoring.

    Determinism: durations are exact day diffs; the risk table (d_t,
    n_t) is exact integers via a cumulative count over the duration
    histogram (n_t = N − #{dur < t}); each factor is ONE IEEE division
    and the product folds the day-ordered factor list seeded with 1.0 —
    division and multiplication are correctly-rounded in both engines, so
    the fold is bit-identical; the curve is half-up 6dp. KM convention:
    censored-at-t subjects remain in n_t.

    Scale notes: everything reduces on user_id (signup/purchase firsts),
    then the curve lives on the duration histogram — bounded by calendar
    days, not users — so the prefix-product join (e2.dur <= e1.dur) is a
    deliberately bounded O(days²) triangle on a ≤-hundreds-row table; the
    global max date is a broadcast 1-row scalar (audited crossJoin
    pattern).
    """
    e = load(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("sts"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("sts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    mx = e.agg(F.max(F.col("ts")).cast("date").alias("maxd"))
    dur = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("pts").isNotNull(),
                F.datediff(F.col("pts").cast("date"), F.col("sts").cast("date")),
            )
            .otherwise(F.datediff(F.col("maxd"), F.col("sts").cast("date")))
            .cast("long")
            .alias("dur"),
            F.when(F.col("pts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    hist = dur.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("ev").cast("long").alias("d"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_bef = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = hist.select(
        "dur",
        "d",
        (
            F.sum("cnt").over(w_all)
            - F.coalesce(F.sum("cnt").over(w_bef), F.lit(0))
        )
        .cast("long")
        .alias("n_at_risk"),
    )
    ev = risk.filter(F.col("d") > 0)
    e1 = ev.select(
        F.col("dur").alias("t"),
        F.col("d").alias("d_events"),
        F.col("n_at_risk"),
    )
    e2 = ev.select(
        F.col("dur").alias("dur2"),
        (
            F.lit(1).cast("double")
            - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
        ).alias("factor"),
    )
    return (
        e1.join(F.broadcast(e2), F.col("dur2") <= F.col("t"))
        .groupBy("t", "d_events", "n_at_risk")
        .agg(F.sort_array(F.collect_list(F.struct("dur2", "factor"))).alias("fs"))
        .select(
            "t",
            "d_events",
            "n_at_risk",
            (
                F.floor(
                    F.expr(
                        "aggregate(transform(fs, v -> v.factor),"
                        " CAST(1 AS DOUBLE), (a, f) -> a * f)"
                    )
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("survival"),
        )
    )


# ------------------------------------------------- permutation test (A/B)
# Portable replicate assignment: h(event_id, r) = ((event_id * 31 + r) *
# 2654435761) % 1000000007, group = h % 2. Pure int64 (event_id·31·2.65e9
# ≈ 8e15 at sf0.1; overflows ~event_id 1e8 ≈ SF 100 — mod event_id first
# beyond that). Replicate 0 is the OBSERVED split (user parity).
_PERM_R = 8
_PERM_SQL = f"""
WITH obs AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
),
rep AS (
  SELECT r, CASE WHEN r = 0 THEN user_id % 2
                 ELSE ((event_id * 31 + r) * 2654435761) % 1000000007 % 2
            END AS grp, c
  FROM obs CROSS JOIN (SELECT unnest(generate_series(0, {_PERM_R})) AS r)
),
cell AS (
  SELECT r, grp, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM rep GROUP BY r, grp
),
diff AS (
  SELECT r,
         MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         CAST(FLOOR((MAX(CASE WHEN grp = 0 THEN CAST(s AS DOUBLE) END)
                     / MAX(CASE WHEN grp = 0 THEN CAST(n AS DOUBLE) END)
                     - MAX(CASE WHEN grp = 1 THEN CAST(s AS DOUBLE) END)
                       / MAX(CASE WHEN grp = 1 THEN CAST(n AS DOUBLE) END))
                    * 10000 + 0.5) AS BIGINT) AS diff_microcents
  FROM cell GROUP BY r
),
base AS (SELECT ABS(diff_microcents) AS obs_abs FROM diff WHERE r = 0)
SELECT diff.r, diff.n0, diff.n1, diff.diff_microcents,
       ABS(diff.diff_microcents) >= base.obs_abs AS is_extreme
FROM diff CROSS JOIN base
"""


@register("stats_permutation_test", oracle=_PERM_SQL, tier="T2")
def stats_permutation_test(spark, sf_dir):
    """Permutation (randomization) test for an A/B mean difference:
    purchase values split by the observed cohort (user parity) vs 8
    deterministic hash-relabeled pseudo-replicates — the
    distribution-free alternative to ab_test_ztest (no normality
    assumption; the p-value is the share of is_extreme replicates). Real
    deployments run hundreds of replicates; 8 keeps the declared key
    bounded while exercising the full shape.

    Determinism: group labels come from the Knuth-multiplicative portable
    hash (pure int64, identical in both engines); per-cell sums are exact
    cents; each replicate's mean difference is two exact-int divisions and
    one subtraction, quantized to micro-cents BEFORE the cross-replicate
    comparison (the cross-dimension rule).

    Scale notes: the replicate dimension explodes map-side (9×) and
    immediately partial-aggregates to 18 cells — no extra shuffle beyond
    one (r, grp) aggregate; the observed-row scalar joins back as a
    broadcast 1-row aggregate (audited crossJoin pattern).
    """
    e = load(spark, sf_dir, "events")
    obs = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    rep = obs.select(
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_R))).alias("r"),
        "event_id",
        "user_id",
        "c",
    ).select(
        "r",
        F.when(F.col("r") == 0, F.col("user_id") % 2)
        .otherwise(
            ((F.col("event_id") * 31 + F.col("r")) * F.lit(2654435761))
            % F.lit(1000000007)
            % 2
        )
        .alias("grp"),
        "c",
    )
    cell = rep.groupBy("r", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    diff = cell.groupBy("r").agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.floor(
            (
                F.max(F.when(F.col("grp") == 0, F.col("s").cast("double")))
                / F.max(F.when(F.col("grp") == 0, F.col("n").cast("double")))
                - F.max(F.when(F.col("grp") == 1, F.col("s").cast("double")))
                / F.max(F.when(F.col("grp") == 1, F.col("n").cast("double")))
            )
            * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("diff_microcents"),
    )
    base = diff.filter(F.col("r") == 0).select(
        F.abs(F.col("diff_microcents")).alias("obs_abs")
    )
    return diff.crossJoin(F.broadcast(base)).select(
        "r",
        "n0",
        "n1",
        "diff_microcents",
        (F.abs(F.col("diff_microcents")) >= F.col("obs_abs")).alias("is_extreme"),
    )


# ------------------------------------------------------------ QQ deciles
_QQ_SQL = """
WITH obs AS (
  SELECT user_id % 2 AS grp, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
ranked AS (
  SELECT grp, v,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v, event_id) AS rk
  FROM obs
),
cnt AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM obs GROUP BY grp),
dec AS (
  SELECT cnt.grp, cnt.n, d.d, (d.d * cnt.n + 9) // 10 AS k
  FROM cnt CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
)
SELECT dec.grp, CAST(dec.d AS BIGINT) AS decile, dec.n,
       CAST(dec.k AS BIGINT) AS k, ranked.v AS value_cents
FROM dec JOIN ranked ON ranked.grp = dec.grp AND ranked.rk = dec.k
"""


@register("stats_qq_deciles", oracle=_QQ_SQL, tier="T2")
def stats_qq_deciles(spark, sf_dir):
    """Quantile-quantile decile table for two cohorts (user parity) of
    purchase values — the distribution-drift diagnostic behind QQ plots:
    if the cohorts' per-decile order statistics diverge, the change moved
    the SHAPE, not just the mean (which ab_test_ztest/permutation tests
    would miss). Exact lower order statistics, not interpolated quantiles:
    decile d = the value at rank ceil(d·n/10) under the total order
    (value, event_id) — integer arithmetic ((d·n + 9) DIV 10), so both
    engines pick the identical row even through ties. NULL-valued
    purchases are excluded EXPLICITLY on both sides — the engines disagree
    on default NULL sort placement (Spark NULLS FIRST asc, DuckDB NULLS
    LAST), so NULL measures must never reach a rank order.

    Scale note: one shuffle partitions each cohort for the rank window;
    the 9-row decile table per cohort joins back on (grp, rank) — a
    broadcast of 18 rows against the ranked stream. At extreme n swap the
    full rank window for the two-pass histogram rank (the KS-test
    distinct-value recipe) so no single partition sorts a whole cohort.
    """
    e = load(spark, sf_dir, "events")
    obs = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 2).alias("grp"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    w = Window.partitionBy("grp").orderBy("v", "event_id")
    ranked = obs.withColumn("rk", F.row_number().over(w))
    cnt = obs.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    dec = cnt.select(
        "grp",
        "n",
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
    ).select(
        "grp",
        "n",
        "d",
        ((F.col("d") * F.col("n") + 9) / 10).cast("long").alias("k"),
    )
    dec = dec.select(
        F.col("grp").alias("dgrp"), "n", "d", "k"
    )
    return (
        ranked.join(
            F.broadcast(dec),
            (F.col("grp") == F.col("dgrp")) & (F.col("rk") == F.col("k")),
        )
        .select(
            "grp",
            F.col("d").cast("long").alias("decile"),
            "n",
            "k",
            F.col("v").alias("value_cents"),
        )
    )


# -------------------------------------------------- chi-square GOF (dow)
# dow from (epoch_days + 4) % 7 — 1970-01-01 was a Thursday, so +4 makes
# 0=Sunday in BOTH engines (their native dayofweek numberings disagree).
_GOF_SQL = """
WITH dows AS (
  SELECT (CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) + 4) % 7 AS dow
  FROM events WHERE event_type = 'purchase'
),
o AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS obs FROM dows GROUP BY dow
),
n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o)
SELECT o.dow, o.obs, n.n,
       CAST((7 * o.obs - n.n) * (7 * o.obs - n.n) AS BIGINT) AS dev_num,
       FLOOR(CAST((7 * o.obs - n.n) * (7 * o.obs - n.n) AS DOUBLE)
             / (CAST(7 AS DOUBLE) * n.n) * 10000 + 0.5) / 10000
         AS chi2_term
FROM o CROSS JOIN n
"""


@register("stats_chisq_gof", oracle=_GOF_SQL, tier="T2")
def stats_chisq_gof(spark, sf_dir):
    """Chi-square goodness-of-fit of purchases against a uniform
    day-of-week null — the seasonality smell test (a flat χ² says volume
    is day-independent; a big Monday term says weekly structure) and the
    GOF complement of stats_chisq_independence. Per-dow terms are emitted
    so the diagnosis (WHICH day deviates) ships with the statistic;
    Σ chi2_term is the χ² (6 df).

    Determinism: (O − E)²/E is carried as the exact integer identity
    (7·O − n)²/(7n) — no float E=n/7 ever materializes; each term is ONE
    IEEE division of exact int64s, half-up 4dp. dow uses the portable
    (epoch_days + 4) % 7 form because the engines' native dayofweek
    numberings differ (Spark 1=Sunday, DuckDB 0=Sunday). Headroom:
    (7O−n)² ≤ 49n² — int64-safe to n ≈ 4e8 purchases (~SF 200).

    Scale note: one partial+final aggregate to 7 rows; n broadcasts back
    as the audited 1-row scalar.
    """
    e = load(spark, sf_dir, "events")
    dows = e.filter(F.col("event_type") == "purchase").select(
        (
            (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) + 4)
            % 7
        )
        .cast("long")
        .alias("dow")
    )
    o = dows.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    n = o.agg(F.sum("obs").cast("long").alias("n"))
    dev = 7 * F.col("obs") - F.col("n")
    return (
        o.crossJoin(F.broadcast(n))
        .select(
            "dow",
            "obs",
            "n",
            (dev * dev).cast("long").alias("dev_num"),
            (
                F.floor(
                    (dev * dev).cast("double")
                    / (F.lit(7).cast("double") * F.col("n"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("chi2_term"),
        )
    )


# ------------------------------------------------------------ Ljung-Box
_LB_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY CAST(ts AS DATE)
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
        FROM daily),
dev AS (
  SELECT day, CAST(tot.n * x - tot.sx AS BIGINT) AS d
  FROM daily CROSS JOIN tot
),
c0 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS c0 FROM dev),
ck AS (
  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(a.d * b.d) AS BIGINT) AS ckn
  FROM (SELECT unnest(generate_series(1, 7)) AS k) k
  JOIN dev a ON TRUE
  JOIN dev b ON b.day = a.day + CAST(k.k AS INT)
  GROUP BY k.k
),
r AS (
  SELECT CAST(ck.k AS BIGINT) AS lag, ck.n_pairs,
         FLOOR(CAST(ck.ckn AS DOUBLE) / c0.c0 * 1000000 + 0.5) / 1000000
           AS r_k,
         CAST(FLOOR(CAST(ck.ckn AS DOUBLE) * ck.ckn / (CAST(c0.c0 AS DOUBLE) * c0.c0)
                    / (tot.n - ck.k) * 1000000000 + 0.5) AS BIGINT) AS term_u
  FROM ck CROSS JOIN c0 CROSS JOIN tot
),
q AS (
  SELECT CAST(SUM(term_u) AS BIGINT) AS sum_u FROM r
)
SELECT r.lag, r.n_pairs, r.r_k,
       FLOOR(CAST(tot.n AS DOUBLE) * (tot.n + 2) * q.sum_u / 1000000000 * 10000
             + 0.5) / 10000 AS ljung_box_q
FROM r CROSS JOIN q CROSS JOIN tot
"""


@register("stats_ljung_box", oracle=_LB_SQL, tier="T2")
def stats_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau test on the daily purchase-revenue series:
    Q = n(n+2)·Σ_{k≤7} r_k²/(n−k) — the is-this-white-noise test run on
    forecast residuals and on metrics before trusting an i.i.d. assumption
    (big Q ⇒ autocorrelation structure remains). Emits each lag's ACF r_k
    alongside the pooled Q (χ²₇ under the null).

    Determinism: deviations use the exact-integer identity n·x − Σx (no
    float mean); c_k and c₀ are exact int64 sums of deviation products;
    each r_k and each Q term is a fixed IEEE expression over exact ints,
    with terms quantized to 1e-9 units BEFORE the cross-lag sum (the
    cross-dimension rule). Headroom: Σ(n·x − Σx)² ≤ n³·max_cents² —
    int64-safe to ~SF 1 for this fixture's daily grain; beyond that carry
    deviations in whole-dollar units.

    Scale note: the series is the daily aggregate (calendar-bounded); lag
    pairs come from a 7× fan-out self-join on day arithmetic — O(7·days),
    never touching the event stream; n/Σx/c₀ broadcast as audited 1-row
    scalars.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("x"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day", (F.col("n") * F.col("x") - F.col("sx")).cast("long").alias("d")
    )
    c0 = dev.agg(F.sum(F.col("d") * F.col("d")).cast("long").alias("c0"))
    a = dev.select("day", "d", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"))
    b = dev.select(F.col("day").alias("bday"), F.col("d").alias("bd"))
    ck = (
        a.join(b, F.date_add(F.col("day"), F.col("k").cast("int")) == F.col("bday"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("d") * F.col("bd")).cast("long").alias("ckn"),
        )
    )
    r = (
        ck.crossJoin(F.broadcast(c0))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("lag"),
            "n_pairs",
            (
                F.floor(F.col("ckn").cast("double") / F.col("c0") * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("r_k"),
            F.floor(
                F.col("ckn").cast("double")
                * F.col("ckn")
                / (F.col("c0").cast("double") * F.col("c0"))
                / (F.col("n") - F.col("k"))
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_u"),
        )
    )
    q = r.agg(F.sum("term_u").cast("long").alias("sum_u"))
    return (
        r.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(tot))
        .select(
            "lag",
            "n_pairs",
            "r_k",
            (
                F.floor(
                    F.col("n").cast("double")
                    * (F.col("n") + 2)
                    * F.col("sum_u")
                    / 1000000000
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("ljung_box_q"),
        )
    )


# ------------------------------------------------ capture-recapture (LP)
_CR_SQL = """
WITH marks AS (
  SELECT o_custkey,
         (o_custkey * 2654435761) % 1000000007 % 10 < 3 AS in_a,
         (o_custkey * 40503 + 7) % 1000000007 % 10 < 3 AS in_b
  FROM orders
),
dis AS (
  SELECT o_custkey, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM marks GROUP BY o_custkey
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM dis
)
SELECT n_true, n1, n2, m,
       CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS chapman_estimate
FROM c
"""


@register("stats_capture_recapture", oracle=_CR_SQL, tier="T2")
def stats_capture_recapture(spark, sf_dir):
    """Capture-recapture population estimate (Chapman's bias-corrected
    Lincoln-Petersen): two independent deterministic-hash 'samples' of the
    customer key space are drawn, and the overlap estimates the TRUE
    distinct-customer count without ever counting it — the trick for
    estimating unique-entity counts (distinct users, near-dup clusters)
    when full deduplication across shards is too expensive, and for
    auditing whether an incremental dedup pipeline is missing mass
    (estimate ≫ observed distinct ⇒ under-merging). n_true ships
    alongside so the estimate's accuracy is visible in the same row.

    Determinism: membership is pure int64 hash arithmetic (two
    independent Knuth-style mixers); Chapman's N̂ = (n1+1)(n2+1)/(m+1) − 1
    is exact integer floor division. Scale note: one distinct-key
    aggregate (the only shuffle) then a 1-row reduction — the estimate
    itself needs only the two sample counts and the overlap, which at
    100 TB you'd compute from two cheap Bloom/sketch passes instead of
    the exact distinct used here as ground truth.
    """
    o = load(spark, sf_dir, "orders")
    marks = o.select(
        "o_custkey",
        ((F.col("o_custkey") * F.lit(2654435761)) % F.lit(1000000007) % 10 < 3).alias(
            "in_a"
        ),
        ((F.col("o_custkey") * 40503 + 7) % F.lit(1000000007) % 10 < 3).alias("in_b"),
    )
    dis = marks.groupBy("o_custkey").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    c = dis.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .cast("long")
        .alias("m"),
    )
    return c.select(
        "n_true",
        "n1",
        "n2",
        "m",
        (
            F.floor(
                ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
                / (F.col("m") + 1)
            )
            - 1
        )
        .cast("long")
        .alias("chapman_estimate"),
    )


# ------------------------------------------------------------- Theil-Sen
_TS_SLOPE_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id, CAST(ts AS DATE)
),
ser AS (
  SELECT user_id,
         list(CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
              ORDER BY day) AS ds,
         list(c ORDER BY day) AS cs
  FROM daily GROUP BY user_id
),
sl AS (
  SELECT user_id, CAST(len(ds) AS BIGINT) AS n_days,
         list_sort(flatten(list_transform(
           generate_series(1, len(ds) - 1),
           i -> list_transform(generate_series(i + 1, len(ds)),
                  j -> CAST(cs[j] - cs[i] AS DOUBLE) / (ds[j] - ds[i])))))
           AS slopes
  FROM ser WHERE len(ds) >= 2
)
SELECT user_id, n_days,
       CAST(len(slopes) AS BIGINT) AS n_pairs,
       FLOOR(slopes[CAST((len(slopes) + 1) // 2 AS INT)] * 1000000 + 0.5)
         / 1000000 AS theil_slope
FROM sl
"""


@register("stats_theil_sen", oracle=_TS_SLOPE_SQL, tier="T2")
def stats_theil_sen(spark, sf_dir):
    """Theil-Sen robust slope per user: the MEDIAN of all pairwise
    day-to-day slopes of the daily purchase series — the
    breakdown-point-29% trend estimator that one outlier day cannot move
    (the robust twin of ts_theta_forecast's OLS slope, the robust
    complement of ts_mann_kendall's trend TEST). Calendar-aware: slopes
    divide by actual day gaps, not row offsets.

    Determinism: each slope is ONE exact-int division (correctly rounded,
    bit-identical both engines); the in-row sort of the slope array is a
    total order on doubles; the lower median picks index (m+1) DIV 2.
    The O(days²) pair expansion stays IN-ROW on the calendar-bounded
    per-user array (30 days → 435 slopes), the ts_mann_kendall shape.

    Scale note: one user_id shuffle; cost linear in users.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("c"))
    )
    ser = (
        daily.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
                        .cast("long")
                        .alias("d"),
                        F.col("c"),
                    )
                )
            ).alias("s")
        )
        .withColumn("ds", F.expr("transform(s, v -> v.d)"))
        .withColumn("cs", F.expr("transform(s, v -> v.c)"))
        .filter(F.size("ds") >= 2)
    )
    sl = ser.select(
        "user_id",
        F.size("ds").cast("long").alias("n_days"),
        F.expr(
            "array_sort(flatten(transform(sequence(1, size(ds) - 1),"
            " i -> transform(sequence(i + 1, size(ds)),"
            " j -> CAST(element_at(cs, j) - element_at(cs, i) AS DOUBLE)"
            " / (element_at(ds, j) - element_at(ds, i))))))"
        ).alias("slopes"),
    )
    return sl.select(
        "user_id",
        "n_days",
        F.size("slopes").cast("long").alias("n_pairs"),
        (
            F.floor(
                F.expr(
                    "element_at(slopes, CAST((size(slopes) + 1) DIV 2 AS INT))"
                )
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("theil_slope"),
    )


# ---------------------------------------------------------- trimmed mean
_TRIM_SQL = """
WITH v AS (
  SELECT c_mktsegment AS seg, c_custkey,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
rk AS (
  SELECT seg, cents,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, c_custkey) AS r,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM v
),
kept AS (
  SELECT seg, cents, n FROM rk
  WHERE r > n // 20 AND r <= n - n // 20
)
SELECT seg, CAST(MAX(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*) + 0.5) / 100
         AS trimmed_mean
FROM kept GROUP BY seg
"""


@register("stats_trimmed_mean", oracle=_TRIM_SQL, tier="T2")
def stats_trimmed_mean(spark, sf_dir):
    """5%-trimmed mean of account balance per segment: drop the bottom and
    top n/20 observations BY EXACT RANK, average the rest — the robust
    location estimate that outliers can't drag (the drop-don't-clamp
    counterpart of etl_winsorize). Trim counts use integer floor division
    so both engines cut identical rank ranges even at awkward n.

    Determinism: ranks order by (cents, custkey) — total; the kept-set
    sum is exact int64 with ONE trailing division, half-up to cents.
    Scale note: one segment-partitioned rank window (swap for the
    histogram-cumulative rank recipe at extreme group sizes), then a
    partial+final aggregate.
    """
    c = load(spark, sf_dir, "customer")
    v = c.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = Window.partitionBy("seg").orderBy("cents", "c_custkey")
    wn = Window.partitionBy("seg")
    rk = v.select(
        "seg",
        "cents",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = rk.filter(
        (F.col("r") > (F.col("n") / 20).cast("long"))
        & (F.col("r") <= F.col("n") - (F.col("n") / 20).cast("long"))
    )
    return kept.groupBy("seg").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        (
            F.floor(F.sum("cents").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
            / 100
        ).alias("trimmed_mean"),
    )


# --------------------------------------------------------- geometric mean
_GEO_SQL = """
WITH v AS (
  SELECT o_orderpriority AS prio,
         CAST(FLOOR(ln(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    * 1000000) AS BIGINT) AS ln_u
  FROM orders WHERE o_totalprice > 0
)
SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ln_u) AS BIGINT) AS ln_sum_u,
       FLOOR(exp(CAST(SUM(ln_u) AS DOUBLE) / 1000000 / COUNT(*)) + 0.5) / 100
         AS geomean
FROM v GROUP BY prio
"""


@register("stats_geomean", oracle=_GEO_SQL, tier="T2")
def stats_geomean(spark, sf_dir):
    """Geometric mean of order value per priority — the right average for
    multiplicative/skewed quantities (growth factors, latencies, prices):
    exp(mean(ln x)), immune to the arithmetic mean's domination by large
    orders. Exact int64 ln-sum ships alongside so consumers can re-derive
    at full precision or merge across shards (ln-sums just add — the
    geometric mean is partial-aggregable in log space).

    Determinism: each row's ln(cents) is quantized to 1e-6 units BEFORE
    the sum (the text_unigram_logprob ln recipe — cross-row double sums
    of raw lns would be partition-order dependent); the mean is one exact
    division and one exp, half-up to cents. Headroom: ln(cents) ≤ ~21 →
    2.1e7 units/row — int64-safe past 4e11 rows.

    Scale note: map-side ln + one partial+final aggregate; nothing else.
    """
    o = load(spark, sf_dir, "orders")
    v = o.filter(F.col("o_totalprice") > 0).select(
        F.col("o_orderpriority").alias("prio"),
        F.floor(
            F.log(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            * 1000000
        )
        .cast("long")
        .alias("ln_u"),
    )
    return v.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ln_u").cast("long").alias("ln_sum_u"),
        (
            F.floor(
                F.exp(F.sum("ln_u").cast("double") / 1000000 / F.count(F.lit(1)))
                + F.lit(0.5)
            )
            / 100
        ).alias("geomean"),
    )


# -------------------------------------------------------------- runs test
_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY CAST(ts AS DATE)
),
ser AS (SELECT list(c ORDER BY day) AS xs FROM daily),
sg AS (
  SELECT list_filter(list_transform(generate_series(1, len(xs) - 1),
           i -> CASE WHEN xs[i + 1] > xs[i] THEN 1
                     WHEN xs[i + 1] < xs[i] THEN -1 ELSE 0 END),
           s -> s != 0) AS signs
  FROM ser
),
cnt AS (
  SELECT CAST(len(signs) AS BIGINT) AS n,
         CAST(len(list_filter(signs, s -> s = 1)) AS BIGINT) AS n_plus,
         CAST(1 + list_sum(list_transform(generate_series(1, len(signs) - 1),
                i -> CASE WHEN signs[i + 1] != signs[i] THEN 1 ELSE 0 END))
              AS BIGINT) AS runs
  FROM sg WHERE len(signs) >= 2
)
SELECT n, n_plus, n - n_plus AS n_minus, runs,
       FLOOR((CAST(2 AS DOUBLE) * n_plus * (n - n_plus) / n + 1) * 10000
             + 0.5) / 10000 AS expected_runs
FROM cnt
"""


@register("stats_runs_test", oracle=_RUNS_SQL, tier="T2")
def stats_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test inputs over the daily-revenue up/down
    sequence: the number of RUNS (maximal same-sign streaks) vs the
    expected 2·n₊·n₋/n + 1 under randomness — too few runs ⇒ momentum /
    positive autocorrelation, too many ⇒ mean-reverting zig-zag. The
    randomness complement of ts_mann_kendall (trend) and stats_ljung_box
    (autocorrelation), computed on signs so it is distribution-free.

    Determinism: signs, run counts and n₊/n₋ are exact integers from the
    day-ordered series (zero deltas dropped, the standard treatment);
    expected runs is ONE IEEE expression, half-up 4dp. Scale note: the
    global daily series is calendar-bounded; everything happens in-row
    after one daily aggregate (same shape as every global ts_* key).
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("c"))
    )
    ser = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "c"))).alias("s")
    ).withColumn("xs", F.expr("transform(s, v -> v.c)"))
    sg = ser.select(
        F.expr(
            "filter(transform(sequence(1, size(xs) - 1),"
            " i -> CASE WHEN element_at(xs, i + 1) > element_at(xs, i) THEN 1"
            "           WHEN element_at(xs, i + 1) < element_at(xs, i) THEN -1"
            "           ELSE 0 END), s -> s != 0)"
        ).alias("signs")
    )
    cnt = sg.filter(F.size("signs") >= 2).select(
        F.size("signs").cast("long").alias("n"),
        F.expr("size(filter(signs, s -> s = 1))").cast("long").alias("n_plus"),
        (
            1
            + F.expr(
                "aggregate(transform(sequence(1, size(signs) - 1),"
                " i -> CASE WHEN element_at(signs, i + 1) != element_at(signs, i)"
                " THEN 1 ELSE 0 END), 0L, (a, x) -> a + x)"
            )
        )
        .cast("long")
        .alias("runs"),
    )
    return cnt.select(
        "n",
        "n_plus",
        (F.col("n") - F.col("n_plus")).alias("n_minus"),
        "runs",
        (
            F.floor(
                (
                    F.lit(2).cast("double")
                    * F.col("n_plus")
                    * (F.col("n") - F.col("n_plus"))
                    / F.col("n")
                    + 1
                )
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("expected_runs"),
    )


@register(
    "stats_psi_drift",
    oracle="""
WITH ev AS (
  SELECT epoch_us(ts) AS tus,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT MIN(tus) AS tlo, MAX(tus) AS thi, MIN(c) AS clo, MAX(c) AS chi
  FROM ev
),
binned AS (
  SELECT LEAST(9, ((e.c - b.clo) * 10) // (b.chi - b.clo + 1)) AS bin,
         CASE WHEN e.tus <= b.tlo + (b.thi - b.tlo) // 2 THEN 1 ELSE 0 END
           AS in_ref
  FROM ev e, bounds b
),
bc AS (
  SELECT bin,
         SUM(in_ref) AS n_ref,
         SUM(1 - in_ref) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (
  SELECT bin, n_ref, n_cur,
         SUM(n_ref) OVER () AS nr, SUM(n_cur) OVER () AS nc,
         COUNT(*) OVER () AS nb
  FROM bc
),
terms AS (
  SELECT bin, n_ref, n_cur,
         CAST(FLOOR(
           (CAST(n_cur + 1 AS DOUBLE) / (nc + nb)
            - CAST(n_ref + 1 AS DOUBLE) / (nr + nb))
           * ln((CAST(n_cur + 1 AS DOUBLE) / (nc + nb))
                / (CAST(n_ref + 1 AS DOUBLE) / (nr + nb)))
           * 1000000000) AS BIGINT) AS term_units
  FROM tot
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       term_units,
       (FLOOR(CAST(SUM(term_units) OVER () AS DOUBLE) / 1000000000
              * 1000000 + 0.5) / 1000000) AS psi_total
FROM terms
""",
    tier="T2",
)
def stats_psi_drift(spark, sf_dir):
    """Population Stability Index between the first and second half of the
    event stream — THE production drift monitor for training-data
    pipelines (is this week's corpus distributed like the reference
    window?). The timeline splits at the integer midpoint watermark (the
    etl_incremental_high_watermark convention), `value` bins into 10
    fixed-width integer-cent buckets over the GLOBAL range, and
    PSI = Σ (qᵢ−pᵢ)·ln(qᵢ/pᵢ) with add-1 smoothing so empty bins stay
    finite (bins empty in BOTH halves never materialize — consistent in
    both engines since the bin exists iff a row landed there).

    Determinism: bin ids are pure integer arithmetic (floor-div on
    non-negative offsets); p and q are single IEEE divides of exact int64
    counts; each PSI term quantizes to integer 1e-9 units BEFORE the
    cross-bin sum (the conform trick — cross-group double sums are
    partition-order dependent, the vec_centroid_drift hazard), and the
    total does ONE further rounded divide. NULL values are excluded
    explicitly on both sides (NULLS FIRST/LAST rank hazard class).

    Scale note: one map-side-combinable groupBy(bin) over the whole
    stream after a broadcast 1-row bounds crossjoin (audited scalar
    pattern); the window totals run over ≤ 10 bin rows. At 100 TB the
    reference histogram would be a persisted 10-row table instead of a
    same-scan split — same join shape.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.unix_micros("ts").alias("tus"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
    )
    bounds = ev.agg(
        F.min("tus").alias("tlo"),
        F.max("tus").alias("thi"),
        F.min("c").alias("clo"),
        F.max("c").alias("chi"),
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(9),
            F.expr("((c - clo) * 10) DIV (chi - clo + 1)"),
        ).alias("bin"),
        F.when(F.expr("tus <= tlo + (thi - tlo) DIV 2"), 1).otherwise(0).alias(
            "in_ref"
        ),
    )
    bc = binned.groupBy("bin").agg(
        F.sum("in_ref").alias("n_ref"),
        F.sum(1 - F.col("in_ref")).alias("n_cur"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = bc.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w_all).alias("nr"),
        F.sum("n_cur").over(w_all).alias("nc"),
        F.count(F.lit(1)).over(w_all).alias("nb"),
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("nr") + F.col("nb"))
    q = (F.col("n_cur") + 1).cast("double") / (F.col("nc") + F.col("nb"))
    terms = tot.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.floor((q - p) * F.log(q / p) * 1000000000).cast("long").alias("term_units"),
    )
    return terms.select(
        "bin",
        "n_ref",
        "n_cur",
        "term_units",
        (
            F.floor(
                F.sum("term_units").over(w_all).cast("double")
                / 1000000000
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("psi_total"),
    )


@register(
    "stats_variance_merge",
    oracle="""
WITH ev AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sum_cents,
         CAST(SUM(c * c) AS BIGINT) AS sumsq_cents
  FROM ev GROUP BY event_type
)
SELECT event_type, n, sum_cents, sumsq_cents,
       (FLOOR((CAST(sum_cents AS DOUBLE) / n / 100) * 10000 + 0.5) / 10000)
         AS mean_value,
       (FLOOR((CAST(sumsq_cents AS DOUBLE) / n / 10000
               - (CAST(sum_cents AS DOUBLE) / n / 100)
                 * (CAST(sum_cents AS DOUBLE) / n / 100)) * 10000 + 0.5)
        / 10000) AS var_value
FROM m
""",
    tier="T2",
)
def stats_variance_merge(spark, sf_dir):
    """Second-moment mergeability, proven in-key: per event type the
    stream splits at the integer midpoint watermark into two independent
    "shards", each shard aggregates the algebraic moment triple
    (n, Σc, Σc²) in EXACT int64 cents, the triples merge by component-wise
    addition (the Chan/Welford parallel-variance identity reduces to plain
    sums when the moments are raw, not centered), and the merge is
    ASSERTED ≡ the one-shot aggregate (exceptAll both ways empty) before
    returning. This is why incremental pipelines can maintain variance at
    100 TB without re-scanning history — and why they must carry raw
    integer moments, not per-shard means (centered M2 merges need the
    float correction term; raw sums need nothing).

    Determinism: the only floats are the final mean/variance reads —
    divides and one subtraction of identically-spelled IEEE operations on
    exact int64s, half-up rounded to 4dp. Overflow headroom: c ≤ 10⁵
    cents, c² ≤ 10¹⁰, ×10⁶ rows/type ≪ 2⁶³; the n·Σc² spelling is
    deliberately avoided (that product DOES overflow), dividing by n
    first instead. NULL values excluded on both sides.

    Scale note: each shard is one map-side-combinable groupBy; the merge
    is a 5-row union+sum. The in-key exceptAll assertion is test-scale
    scaffolding only.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.unix_micros("ts").alias("tus"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
    )
    bounds = ev.agg(F.min("tus").alias("tlo"), F.max("tus").alias("thi"))
    wm = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "in_run1", F.expr("tus <= tlo + (thi - tlo) DIV 2")
    )

    def moments(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("sum_cents"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sumsq_cents"),
        )

    merged = (
        moments(wm.filter(F.col("in_run1")))
        .unionByName(moments(wm.filter(~F.col("in_run1"))))
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.sum("sumsq_cents").cast("long").alias("sumsq_cents"),
        )
    )
    direct = moments(ev)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    mean = F.col("sum_cents").cast("double") / F.col("n") / 100
    return merged.select(
        "event_type",
        "n",
        "sum_cents",
        "sumsq_cents",
        rnd(mean, 4).alias("mean_value"),
        rnd(
            F.col("sumsq_cents").cast("double") / F.col("n") / 10000 - mean * mean,
            4,
        ).alias("var_value"),
    )


# ----------------------------------------------------------- Cramér's V

_CRAMERS_SQL = """
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
rt AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY seg),
ct AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY pri),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT pri) AS BIGINT) AS nc
        FROM obs),
terms AS (
  SELECT CAST(FLOOR(
           (CAST(obs.o AS DOUBLE)
              - CAST(rt.r AS DOUBLE) * ct.c / tot.n)
           * (CAST(obs.o AS DOUBLE)
              - CAST(rt.r AS DOUBLE) * ct.c / tot.n)
           / (CAST(rt.r AS DOUBLE) * ct.c / tot.n)
           * 1000000000) AS BIGINT) AS t_nano,
         tot.n, tot.nr, tot.nc
  FROM obs JOIN rt USING (seg) JOIN ct USING (pri), tot
)
SELECT MAX(n) AS n,
       CAST(SUM(t_nano) AS BIGINT) AS chisq_nano,
       CAST(FLOOR(sqrt(CAST(SUM(t_nano) AS DOUBLE) / 1000000000
                       / (MAX(n) * LEAST(MAX(nr) - 1, MAX(nc) - 1)))
                  * 1000000) AS BIGINT) AS cramers_v_micro
FROM terms
"""


@register("stats_cramers_v", oracle=_CRAMERS_SQL, tier="T2")
def stats_cramers_v(spark, sf_dir):
    """Cramér's V — the [0,1] effect size for a contingency table
    (segment × order priority): V = √(χ²/(n·min(r−1, c−1))). The chi-square
    family's missing third leg: [[stats_chisq_independence]] answers "is
    there association?", this answers "how strong?" on a scale comparable
    across tables.

    Determinism: marginals are exact int64; each cell's (O−E)²/E term is
    one identically-spelled IEEE expression floored to int64 NANO-units
    BEFORE the cross-cell sum (the stats_psi_drift rule — never sum raw
    doubles across cells), and the final sqrt is the single IEEE
    exact-rounded call on an identical double.

    Scale: the contingency table is |segments|×|priorities| cells (25)
    regardless of input size; one aggregate over the broadcast-joined
    scan, then driver-scale arithmetic.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rt = obs.groupBy("seg").agg(F.sum("o").cast("long").alias("r"))
    ct = obs.groupBy("pri").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("seg").cast("long").alias("nr"),
        F.count_distinct("pri").cast("long").alias("nc"),
    )
    e_expr = "CAST(r AS DOUBLE) * c / n"
    terms = (
        obs.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                f"""CAST(FLOOR(
                      (CAST(o AS DOUBLE) - {e_expr})
                      * (CAST(o AS DOUBLE) - {e_expr})
                      / ({e_expr}) * 1000000000) AS BIGINT)"""
            ).alias("t_nano"),
            "n",
            "nr",
            "nc",
        )
    )
    return terms.agg(
        F.max("n").alias("n"),
        F.sum("t_nano").cast("long").alias("chisq_nano"),
        F.expr(
            """CAST(FLOOR(sqrt(CAST(SUM(t_nano) AS DOUBLE) / 1000000000
                               / (MAX(n) * LEAST(MAX(nr) - 1, MAX(nc) - 1)))
                          * 1000000) AS BIGINT)"""
        ).alias("cramers_v_micro"),
    )


# ------------------------------------------------- difference-in-differences

_DID_SQL = """
WITH cells AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
         CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
           AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT
  CAST(MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS BIGINT) AS n11,
  CAST(MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS BIGINT) AS n10,
  CAST(MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS BIGINT) AS n01,
  CAST(MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS BIGINT) AS n00,
  CAST(FLOOR(
    ( CAST(MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS DOUBLE)
        / MAX(CASE WHEN treat = 1 AND post = 1 THEN n END)
    - CAST(MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS DOUBLE)
        / MAX(CASE WHEN treat = 1 AND post = 0 THEN n END)
    - CAST(MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS DOUBLE)
        / MAX(CASE WHEN treat = 0 AND post = 1 THEN n END)
    + CAST(MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS DOUBLE)
        / MAX(CASE WHEN treat = 0 AND post = 0 THEN n END)
    ) * 1000) AS BIGINT) AS did_millicents
FROM cells
"""


@register("stats_diff_in_diff", oracle=_DID_SQL, tier="T2")
def stats_diff_in_diff(spark, sf_dir):
    """Difference-in-differences estimator on order prices: treatment =
    BUILDING segment, post-period = orders from 1998 on; DiD =
    (m̄₁₁−m̄₁₀) − (m̄₀₁−m̄₀₀) — the parallel-trends causal contrast that
    removes both the group baseline and the common time shock.

    Determinism: the four cell (n, Σcents) pairs are exact int64
    (Σ ≤ ~7.5e12 < 2^53, so the int→double casts are exact); the four
    divides and three adds are spelled in ONE identical expression order
    in both engines, then floored to milli-cents. Pivoting via
    MAX(CASE...) keeps it a single 4-row aggregate — no join, no window.

    Scale: one partial+final aggregate over the broadcast-joined scan;
    exactly 4 rows cross the shuffle.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("treat"),
            F.when(
                F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("s"),
        )
    )
    m = lambda t, p, col: f"MAX(CASE WHEN treat = {t} AND post = {p} THEN {col} END)"
    return cells.agg(
        F.expr(f"CAST({m(1,1,'n')} AS BIGINT)").alias("n11"),
        F.expr(f"CAST({m(1,0,'n')} AS BIGINT)").alias("n10"),
        F.expr(f"CAST({m(0,1,'n')} AS BIGINT)").alias("n01"),
        F.expr(f"CAST({m(0,0,'n')} AS BIGINT)").alias("n00"),
        F.expr(
            f"""CAST(FLOOR(
              ( CAST({m(1,1,'s')} AS DOUBLE) / {m(1,1,'n')}
              - CAST({m(1,0,'s')} AS DOUBLE) / {m(1,0,'n')}
              - CAST({m(0,1,'s')} AS DOUBLE) / {m(0,1,'n')}
              + CAST({m(0,0,'s')} AS DOUBLE) / {m(0,0,'n')}
              ) * 1000) AS BIGINT)"""
        ).alias("did_millicents"),
    )


# ------------------------------------------------------- best split (ID3)

_SPLIT_LNQ = "CAST(FLOOR(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"


def _imp(n: str, p: str) -> str:
    """n-scaled entropy impurity in micro-nat units:
    imp = n·lnq(n) − p·lnq(p) − (n−p)·lnq(n−p), with 0·ln0 := 0."""
    lq = _SPLIT_LNQ
    return (
        f"(CASE WHEN {n} <= 0 THEN 0 ELSE {n} * {lq.format(x=n)} END"
        f" - CASE WHEN {p} <= 0 THEN 0 ELSE {p} * {lq.format(x=p)} END"
        f" - CASE WHEN {n} - {p} <= 0 THEN 0"
        f"   ELSE ({n} - {p}) * {lq.format(x=f'{n} - {p}')} END)"
    )


_BEST_SPLIT_SQL = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS s,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
g AS (
  SELECT segment, s, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS pc
  FROM base GROUP BY segment, s
),
cum AS (
  SELECT segment, s,
         CAST(SUM(cnt) OVER (PARTITION BY segment ORDER BY s) AS BIGINT) AS nl,
         CAST(SUM(pc) OVER (PARTITION BY segment ORDER BY s) AS BIGINT) AS pl,
         CAST(SUM(cnt) OVER (PARTITION BY segment) AS BIGINT) AS n,
         CAST(SUM(pc) OVER (PARTITION BY segment) AS BIGINT) AS p
  FROM g
),
gains AS (
  SELECT segment, s, nl, pl, n, p,
         {_imp('n', 'p')} - {_imp('nl', 'pl')}
           - {_imp('(n - nl)', '(p - pl)')} AS gain_u
  FROM cum WHERE nl < n
),
best AS (
  SELECT segment, s, nl, pl, n, p, gain_u,
         row_number() OVER (PARTITION BY segment
                            ORDER BY gain_u DESC, s) AS rk
  FROM gains
)
SELECT segment, s AS threshold_cents, gain_u, nl AS n_left, pl AS pos_left,
       n, p AS pos_total
FROM best WHERE rk = 1
ORDER BY segment
"""


@register("stats_best_split", oracle=_BEST_SPLIT_SQL, tier="T2")
def stats_best_split(spark, sf_dir):
    """Optimal decision-stump split per segment: the price threshold that
    maximizes information gain for predicting order status — the inner
    loop of every tree learner (ID3/C4.5/GBDT), run as a single SQL sweep
    over the cumulative class counts instead of a per-threshold rescan.

    Determinism: impurity is carried N-SCALED in micro-nat units —
    imp(n,p) = n·lnq(n) − p·lnq(p) − (n−p)·lnq(n−p) with lnq = floor(1e6·ln)
    and 0·ln0 := 0 — so gain = imp(parent) − imp(L) − imp(R) is exact
    integer arithmetic after the quantized log calls (the text_char_entropy
    recipe, avoiding every rational p·log p). Tie-break: lowest threshold
    (gain DESC, s). Degenerate right side excluded (nl < n). Headroom:
    n·lnq(n) ≤ 1.5e5·1.2e7 ≈ 2e12.

    Scale: cumulative counts are windows over the per-segment DISTINCT-
    price table (the stats_auc_roc shape — bounded by |distinct prices|,
    not rows); the argmax is a per-segment top-1 window, pushed down as
    WindowGroupLimit.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("s"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    g = base.groupBy("segment", "s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("pc"),
    )
    wasc = Window.partitionBy("segment").orderBy("s")
    wall = Window.partitionBy("segment")
    cum = g.select(
        "segment",
        "s",
        F.sum("cnt").over(wasc).cast("long").alias("nl"),
        F.sum("pc").over(wasc).cast("long").alias("pl"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
        F.sum("pc").over(wall).cast("long").alias("p"),
    )
    gains = cum.filter(F.col("nl") < F.col("n")).select(
        "segment",
        "s",
        "nl",
        "pl",
        "n",
        "p",
        F.expr(
            f"{_imp('n', 'p')} - {_imp('nl', 'pl')}"
            f" - {_imp('(n - nl)', '(p - pl)')}"
        ).alias("gain_u"),
    )
    wrk = Window.partitionBy("segment").orderBy(F.col("gain_u").desc(), "s")
    return (
        gains.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "segment",
            F.col("s").alias("threshold_cents"),
            "gain_u",
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            "n",
            F.col("p").alias("pos_total"),
        )
        .orderBy("segment")
    )


# ------------------------------------------------------------- SPRT

# Wald SPRT for Bernoulli H0: p=0.3 vs H1: p=0.4, alpha=beta=0.05.
# Per-trial log-likelihood-ratio increments and the decision boundary
# ln(19), pre-quantized to integer MICRO-NATS in Python and inlined as
# literals — the key is zero-float end to end.
_SPRT_LPOS = 287682    # floor(ln(0.4/0.3) * 1e6)
_SPRT_LNEG = -154151   # floor(ln(0.6/0.7) * 1e6)
_SPRT_BOUND = 2944438  # floor(ln(19) * 1e6)

_SPRT_SQL = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CASE WHEN o.o_orderstatus = 'F'
              THEN {_SPRT_LPOS} ELSE {_SPRT_LNEG} END AS llr
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
cum AS (
  SELECT segment, o_orderkey,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(SUM(llr) OVER w AS BIGINT) AS cum_llr
  FROM base
  WINDOW w AS (PARTITION BY segment ORDER BY o_orderkey)
),
stop AS (
  SELECT segment,
         MIN(CASE WHEN cum_llr >= {_SPRT_BOUND}
                    OR cum_llr <= -{_SPRT_BOUND} THEN rn END) AS stop_rn,
         CAST(MAX(rn) AS BIGINT) AS n_total
  FROM cum GROUP BY segment
)
SELECT s.segment,
       CAST(COALESCE(s.stop_rn, s.n_total) AS BIGINT) AS n_observed,
       CAST(c.cum_llr AS BIGINT) AS llr_micro,
       CASE WHEN s.stop_rn IS NULL THEN 'continue'
            WHEN c.cum_llr >= {_SPRT_BOUND} THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision
FROM stop s
JOIN cum c ON c.segment = s.segment
          AND c.rn = COALESCE(s.stop_rn, s.n_total)
ORDER BY s.segment
"""


@register("stats_sprt_stopping", oracle=_SPRT_SQL, tier="T2")
def stats_sprt_stopping(spark, sf_dir):
    """Wald's sequential probability ratio test replayed over each
    segment's order stream (H0: P(finished)=0.3 vs H1: 0.4, α=β=0.05):
    walk the orders in key order accumulating the log-likelihood ratio and
    stop at the FIRST boundary crossing — the sequential A/B machinery
    that answers "when could this experiment have stopped?" instead of
    fixing n in advance.

    Determinism: ZERO floats — the per-trial LLR increments and the ln(19)
    boundary are pre-quantized to integer micro-nats in Python and inlined
    as literals; the cumulative sum, the first-crossing argmin, and the
    boundary compares are all exact int64. The stopped row is re-joined by
    (segment, rn), a total-order key.

    Scale: one window per segment over the order stream plus a broadcast
    join of the 5-row stop table back onto it. At 100 TB the scan is the
    cost — the window is partitioned and the state is one running int per
    partition (the streaming applyInPandasWithState twin would carry it
    incrementally).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.lit(_SPRT_LPOS))
        .otherwise(F.lit(_SPRT_LNEG))
        .alias("llr"),
    )
    w = Window.partitionBy("segment").orderBy("o_orderkey")
    cum = base.select(
        "segment",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("llr").over(w).cast("long").alias("cum_llr"),
    )
    stop = (
        cum.groupBy("segment")
        .agg(
            F.min(
                F.when(
                    (F.col("cum_llr") >= _SPRT_BOUND)
                    | (F.col("cum_llr") <= -_SPRT_BOUND),
                    F.col("rn"),
                )
            ).alias("stop_rn"),
            F.max("rn").cast("long").alias("n_total"),
        )
        .select(
            F.col("segment").alias("seg2"),
            "stop_rn",
            "n_total",
            F.coalesce("stop_rn", "n_total").alias("pick_rn"),
        )
    )
    j = cum.join(
        F.broadcast(stop),
        (F.col("segment") == F.col("seg2")) & (F.col("rn") == F.col("pick_rn")),
    )
    return j.select(
        "segment",
        F.col("pick_rn").cast("long").alias("n_observed"),
        F.col("cum_llr").cast("long").alias("llr_micro"),
        F.when(F.col("stop_rn").isNull(), "continue")
        .when(F.col("cum_llr") >= _SPRT_BOUND, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    ).orderBy("segment")


# ------------------------------------------------------- lead-lag xcorr

_XCORR_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
x AS (SELECT day, v FROM daily WHERE event_type = 'click'),
y AS (SELECT day, v FROM daily WHERE event_type = 'purchase'),
pairs AS (
  SELECT l.lag, x.v AS xv, y.v AS yv
  FROM (SELECT unnest(generate_series(-7, 7)) AS lag) l
  JOIN x ON TRUE
  JOIN y ON y.day = x.day + CAST(l.lag AS INT)
),
s AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
         CAST(SUM(xv * yv) AS BIGINT) AS sxy,
         CAST(SUM(xv * xv) AS BIGINT) AS sxx,
         CAST(SUM(yv * yv) AS BIGINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL
            ELSE CAST(FLOOR(
              (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
              * 1000000) AS BIGINT) END AS r_micro
FROM s
ORDER BY lag
"""


@register("ts_xcorr_lags", oracle=_XCORR_SQL, tier="T2")
def ts_xcorr_lags(spark, sf_dir):
    """Lead-lag cross-correlation between the click and purchase daily
    value series at lags −7..+7 days: Pearson r of (click_t, purchase_{t+L})
    over the overlapping days — the lag whose |r| peaks says which series
    LEADS, the question behind every "does engagement predict revenue next
    week?" analysis ([[ts_autocorrelation]] is the self-paired special
    case).

    Determinism: all six correlation sums are exact int64 over exact cent
    totals; the Pearson assembly is ONE identically-spelled double
    expression (three exact int→double casts — the sums stay < 2^53 at
    sf0.1 — two multiplies, one IEEE sqrt, one divide) floored to micro.
    Degenerate overlaps (zero variance) yield NULL on both sides. Lag
    alignment is DATE arithmetic (y.day = x.day + L), immune to row-index
    gaps on missing days.

    Scale: the daily rollup is one partial+final aggregate; the 15-lag
    expansion joins two |days|-row tables — driver-scale forever. For
    thousands of series pairs, block by (pair, lag) and reuse the same
    integer-sum shape.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    x = daily.filter(F.col("event_type") == "click").select(
        F.col("day").alias("xday"), F.col("v").alias("xv")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("v").alias("yv")
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.expr("yday = date_add(xday, lag)"))
        .select("lag", "xv", "yv")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xv").cast("long").alias("sx"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).cast("long").alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).cast("long").alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syy"),
    )
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        "n",
        F.expr(
            """CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                    THEN NULL
                    ELSE CAST(FLOOR(
                      (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                             * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                      * 1000000) AS BIGINT) END"""
        ).alias("r_micro"),
    ).orderBy("lag")


# ---------------------------------------------------------------- ICC

_ICC_SQL = """
WITH g AS (
  SELECT c_nationkey AS grp,
         CAST(COUNT(*) AS BIGINT) AS ni,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS si,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                  * CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS qi
  FROM customer GROUP BY c_nationkey
),
terms AS (
  SELECT grp, ni, si, qi,
         CAST(FLOOR((CAST(qi AS DOUBLE)
                     - CAST(si AS DOUBLE) * si / ni) * 1000) AS BIGINT)
           AS ssw_milli,
         CAST(FLOOR((CAST(si AS DOUBLE) * si / ni) * 1000) AS BIGINT)
           AS sb_milli
  FROM g
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ni) AS BIGINT) AS n,
         CAST(SUM(si) AS BIGINT) AS stot,
         CAST(SUM(ni * ni) AS BIGINT) AS sn2,
         CAST(SUM(ssw_milli) AS BIGINT) AS ssw_m,
         CAST(SUM(sb_milli) AS BIGINT) AS sb_m
  FROM terms
)
SELECT k, n,
       CAST(FLOOR(
         ((CAST(sb_m AS DOUBLE) / 1000
            - CAST(stot AS DOUBLE) * stot / n) / (k - 1)
          - (CAST(ssw_m AS DOUBLE) / 1000) / (n - k))
         / ((CAST(sb_m AS DOUBLE) / 1000
             - CAST(stot AS DOUBLE) * stot / n) / (k - 1)
            + ((CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / n) / (k - 1) - 1)
              * (CAST(ssw_m AS DOUBLE) / 1000) / (n - k))
         * 1000000) AS BIGINT) AS icc_micro
FROM s
"""


@register("stats_icc", oracle=_ICC_SQL, tier="T2")
def stats_icc(spark, sf_dir):
    """Intraclass correlation ICC(1,1) of account balances within nation
    clusters — the variance fraction attributable to cluster membership,
    and the number that drives the design effect (1 + (m̄−1)·ICC) when an
    A/B test must randomize whole clusters instead of individuals.

    Determinism: per-group (n, Σ, Σ²) are exact int64 cents; the two
    per-group sum-of-squares terms are floored to MILLI-units BEFORE the
    cross-group sum (the vec_centroid_drift rule), and the final
    MSB/MSW/ANOVA assembly is one identically-spelled double expression
    with the unbiased group-size correction n₀ = (N − Σnᵢ²/N)/(k−1).

    Scale: one partial+final aggregate per group, then a 25-row fold —
    nothing grows with data size.
    """
    c = load(spark, sf_dir, "customer")
    cb = F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)")
    g = c.groupBy(F.col("c_nationkey").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum(cb).cast("long").alias("si"),
        F.sum(cb * cb).cast("long").alias("qi"),
    )
    terms = g.select(
        "ni",
        "si",
        "qi",
        F.expr(
            """CAST(FLOOR((CAST(qi AS DOUBLE)
                           - CAST(si AS DOUBLE) * si / ni) * 1000) AS BIGINT)"""
        ).alias("ssw_milli"),
        F.expr(
            "CAST(FLOOR((CAST(si AS DOUBLE) * si / ni) * 1000) AS BIGINT)"
        ).alias("sb_milli"),
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("si").cast("long").alias("stot"),
        F.sum(F.col("ni") * F.col("ni")).cast("long").alias("sn2"),
        F.sum("ssw_milli").cast("long").alias("ssw_m"),
        F.sum("sb_milli").cast("long").alias("sb_m"),
    )
    return s.select(
        "k",
        "n",
        F.expr(
            """CAST(FLOOR(
                 ((CAST(sb_m AS DOUBLE) / 1000
                    - CAST(stot AS DOUBLE) * stot / n) / (k - 1)
                  - (CAST(ssw_m AS DOUBLE) / 1000) / (n - k))
                 / ((CAST(sb_m AS DOUBLE) / 1000
                     - CAST(stot AS DOUBLE) * stot / n) / (k - 1)
                    + ((CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / n) / (k - 1) - 1)
                      * (CAST(ssw_m AS DOUBLE) / 1000) / (n - k))
                 * 1000000) AS BIGINT)"""
        ).alias("icc_micro"),
    )


# ------------------------------------------------------------ McNemar

_MCNEMAR_SQL = """
WITH paired AS (
  SELECT o_custkey,
         MAX(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pre_f,
         MAX(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                   AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS post_f
  FROM orders
  GROUP BY o_custkey
  HAVING MAX(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END) = 1
     AND MAX(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END) = 1
)
SELECT CAST(SUM(CASE WHEN pre_f = 1 AND post_f = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n11,
       CAST(SUM(CASE WHEN pre_f = 1 AND post_f = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n10,
       CAST(SUM(CASE WHEN pre_f = 0 AND post_f = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n01,
       CAST(SUM(CASE WHEN pre_f = 0 AND post_f = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n00,
       CASE WHEN SUM(CASE WHEN pre_f + post_f = 1 THEN 1 ELSE 0 END) = 0
            THEN NULL
            ELSE CAST((
              (SUM(CASE WHEN pre_f = 1 AND post_f = 0 THEN 1 ELSE 0 END)
               - SUM(CASE WHEN pre_f = 0 AND post_f = 1 THEN 1 ELSE 0 END))
              * (SUM(CASE WHEN pre_f = 1 AND post_f = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN pre_f = 0 AND post_f = 1 THEN 1 ELSE 0 END))
              * 1000000
            ) // SUM(CASE WHEN pre_f + post_f = 1 THEN 1 ELSE 0 END)
            AS BIGINT)
       END AS chisq_micro
FROM paired
"""


@register("stats_mcnemar", oracle=_MCNEMAR_SQL, tier="T2")
def stats_mcnemar(spark, sf_dir):
    """McNemar's test for PAIRED binary outcomes: each customer active in
    both halves of the timeline is their own control — did they have a
    finished order before 1998 vs after? — and the test uses ONLY the
    discordant pairs: χ² = (n10−n01)²/(n10+n01). The within-subject
    before/after test that an unpaired z-test gets wrong when customers
    differ wildly in baseline.

    Determinism: PURE int64 — the 2×2 paired cells are exact counts and
    χ²_micro = (n10−n01)²·1e6 DIV (n10+n01); the numerator is a square so
    the DIV operands are non-negative (÷ ≡ //); zero discordant pairs →
    NULL on both sides. Customers present in only one period are excluded
    by the HAVING — the pairing requirement, stated explicitly rather than
    left to NULL logic.

    Scale: one partial+final aggregate per customer, then a 4-cell fold —
    nothing grows with data size.
    """
    o = load(spark, sf_dir, "orders")
    pre = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    paired = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.when(pre & (F.col("o_orderstatus") == "F"), 1).otherwise(0)
            ).alias("pre_f"),
            F.max(
                F.when(~pre & (F.col("o_orderstatus") == "F"), 1).otherwise(0)
            ).alias("post_f"),
            F.max(F.when(pre, 1).otherwise(0)).alias("has_pre"),
            F.max(F.when(~pre, 1).otherwise(0)).alias("has_post"),
        )
        .filter((F.col("has_pre") == 1) & (F.col("has_post") == 1))
    )
    cell = lambda a, b: F.sum(
        F.when((F.col("pre_f") == a) & (F.col("post_f") == b), 1).otherwise(0)
    ).cast("long")
    agg = paired.agg(
        cell(1, 1).alias("n11"),
        cell(1, 0).alias("n10"),
        cell(0, 1).alias("n01"),
        cell(0, 0).alias("n00"),
    )
    return agg.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            """CASE WHEN n10 + n01 = 0 THEN NULL
                    ELSE ((n10 - n01) * (n10 - n01) * 1000000) DIV (n10 + n01)
               END"""
        ).alias("chisq_micro"),
    )


# ------------------------------------------------------------ Brier score

_BRIER_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS s,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL
),
ranked AS (
  SELECT segment, y,
         CAST(rank() OVER (PARTITION BY segment ORDER BY s) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
  FROM base
),
terms AS (
  SELECT segment, n,
         ((r * 1000) // n - y * 1000)
           * ((r * 1000) // n - y * 1000) AS t
  FROM ranked
)
SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(t) AS BIGINT) // MAX(n) AS brier_micro
FROM terms GROUP BY segment
ORDER BY segment
"""


@register("stats_brier_score", oracle=_BRIER_SQL, tier="T2")
def stats_brier_score(spark, sf_dir):
    """Brier score per segment for the rank-calibrated price "model":
    predicted probability = within-segment percentile rank of the order's
    price, outcome = finished status; Brier = mean (p − y)² — the proper
    scoring rule that penalizes BOTH miscalibration and lack of sharpness,
    completing the eval battery ([[stats_auc_roc]] ranks,
    [[stats_calibration_ece]] bins, Brier scores).

    Determinism: p is quantized to MILLI-probability as the integer
    (rank·1000) DIV n BEFORE squaring (ties share a rank() value, so tied
    prices get identical p in both engines), each squared term is exact
    int64, and the mean is one truncating DIV on non-negative operands.
    Headroom: terms ≤ 1e6, Σ ≤ ~3e10 per segment.

    Scale: one rank window per segment over the broadcast-joined scan,
    then a partial+final aggregate — the stats_auc_roc shape.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer")
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("s"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    wr = Window.partitionBy("segment").orderBy("s")
    wn = Window.partitionBy("segment")
    ranked = base.select(
        "segment",
        "y",
        F.rank().over(wr).cast("long").alias("r"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    terms = ranked.select(
        "segment",
        "n",
        F.expr(
            "((r * 1000) DIV n - y * 1000) * ((r * 1000) DIV n - y * 1000)"
        ).alias("t"),
    )
    return (
        terms.groupBy("segment")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.expr("CAST(SUM(t) AS BIGINT) DIV MAX(n)").alias("brier_micro"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------- Chatterjee's xi

_XI_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL AND c.c_acctbal IS NOT NULL
),
ranked AS (
  SELECT segment, o_orderkey, x,
         CAST(COUNT(*) OVER (PARTITION BY segment ORDER BY y
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY segment ORDER BY y
                             RANGE BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING) AS BIGINT) AS l,
         CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
  FROM base
),
seq AS (
  SELECT segment, n, r, l,
         lead(r) OVER (PARTITION BY segment ORDER BY x, o_orderkey) AS r_next
  FROM ranked
),
s AS (
  SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN r_next IS NULL THEN 0
                       ELSE abs(r_next - r) END) AS BIGINT) AS s_sum,
         CAST(SUM(l * (n - l)) AS BIGINT) AS t_sum
  FROM seq
  GROUP BY segment
)
SELECT segment, n, s_sum, t_sum,
       CASE WHEN n < 2 OR (2 * t_sum) // n = 0 THEN NULL
            ELSE 1000000 - (s_sum * 1000000) // ((2 * t_sum) // n)
       END AS xi_micro
FROM s
ORDER BY segment
"""


@register("stats_xi_correlation", oracle=_XI_SQL, tier="T2")
def stats_xi_correlation(spark, sf_dir):
    """Chatterjee's ξ correlation (2020) between order price and the
    customer's account balance, per segment, with the TIE-CORRECTED
    normalization: sort by X, take the Y-ranks' adjacent variation —
    ξ = 1 − n·Σ|r_{i+1}−r_i| / (2·Σ l_i(n−l_i)), where r_i = #{y_j ≤ y_i}
    and l_i = #{y_j ≥ y_i} — the rank coefficient that detects ARBITRARY
    functional dependence (not just monotone like
    [[stats_spearman]]/[[stats_kendall_tau]]): ξ≈0 for independence, →1 as
    Y becomes a function of X, even a sine. With distinct Y the
    denominator collapses to (n³−n)/3, recovering the tie-free
    1 − 3S/(n²−1); with dense Y-ties (cents vs cents here) the tie-free
    form is biased low and cannot reach 1 — the correction restores the
    →1 contract (property-tested).

    Determinism: PURE int64 — both Y-counts are RANGE-frame COUNTs (ties
    share them exactly in both engines), the X-order is the total order
    (x, orderkey) (Chatterjee's random tie-breaking replaced by a
    deterministic one — documented variant), and the division is assembled
    as 1e6 − (S·1e6) // ((2T) DIV n): folding n into the denominator first
    keeps every operand under 2^63 (n·S·1e6 would overflow at sf≥0.1),
    at a documented quantization cost of ≤ n/(2T) ≈ 2/n² relative — far
    below micro resolution for n ≥ 100. Both // operands are non-negative
    (negation-guard rule): ξ's possible negativity under independence
    lives in the integer subtraction, never in a division. T = 0 (constant
    Y) ⇒ ξ undefined ⇒ NULL.

    Scale: three windows per segment (two value-range counts sharing one
    sort and an ordered lead), then a partial+final aggregate — shuffles
    only on segment.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("x"),
        F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").alias("y"),
    )
    wy = (
        Window.partitionBy("segment")
        .orderBy("y")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = (
        Window.partitionBy("segment")
        .orderBy("y")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    wn = Window.partitionBy("segment")
    ranked = base.select(
        "segment",
        "o_orderkey",
        "x",
        F.count(F.lit(1)).over(wy).cast("long").alias("r"),
        F.count(F.lit(1)).over(wl).cast("long").alias("l"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    wx = Window.partitionBy("segment").orderBy("x", "o_orderkey")
    seq = ranked.select(
        "segment", "n", "r", "l", F.lead("r").over(wx).alias("r_next")
    )
    s = seq.groupBy("segment").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.when(F.col("r_next").isNull(), F.lit(0)).otherwise(
                F.abs(F.col("r_next") - F.col("r"))
            )
        )
        .cast("long")
        .alias("s_sum"),
        F.sum(F.col("l") * (F.col("n") - F.col("l")))
        .cast("long")
        .alias("t_sum"),
    )
    return s.select(
        "segment",
        "n",
        "s_sum",
        "t_sum",
        F.expr(
            """CASE WHEN n < 2 OR (2 * t_sum) DIV n = 0 THEN NULL
                    ELSE 1000000 - (s_sum * 1000000)
                                   DIV ((2 * t_sum) DIV n)
               END"""
        ).alias("xi_micro"),
    ).orderBy("segment")


# ------------------------------------------------------------ Cohen's kappa

_KAPPA_SQL = """
WITH rated AS (
  SELECT CASE WHEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   >= 25000000 THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS b
  FROM orders WHERE o_totalprice IS NOT NULL
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         CAST(SUM(a) AS BIGINT) AS a1,
         CAST(SUM(b) AS BIGINT) AS b1
  FROM rated
)
SELECT n, agree, a1, b1,
       CASE WHEN n * n - (a1 * b1 + (n - a1) * (n - b1)) = 0 THEN NULL
            WHEN n * agree - (a1 * b1 + (n - a1) * (n - b1)) >= 0
              THEN CAST(((n * agree - (a1 * b1 + (n - a1) * (n - b1)))
                         * 1000000)
                        // (n * n - (a1 * b1 + (n - a1) * (n - b1)))
                        AS BIGINT)
            ELSE CAST(-(((a1 * b1 + (n - a1) * (n - b1)) - n * agree)
                        * 1000000
                        // (n * n - (a1 * b1 + (n - a1) * (n - b1))))
                      AS BIGINT)
       END AS kappa_micro
FROM s
"""


@register("stats_cohens_kappa", oracle=_KAPPA_SQL, tier="T2")
def stats_cohens_kappa(spark, sf_dir):
    """Cohen's κ agreement between two deterministic binary "raters" on
    each order — rater A: price ≥ $250k, rater B: finished status — the
    chance-corrected agreement used to validate labelers and weak
    supervisors: κ = (p_o − p_e)/(1 − p_e), where p_e comes from the
    raters' marginals.

    Determinism: PURE int64 — clearing denominators gives
    κ = (n·agree − E) / (n² − E) with E = a₁b₁ + (n−a₁)(n−b₁), all exact
    integer products (n ≤ 1.5e5 ⇒ n² ≤ 2.3e10; ·1e6 ≤ 2.3e16 < 2^63); the
    single division is negation-guarded because κ < 0 means
    worse-than-chance (the Spark-DIV/DuckDB-// negative divergence).
    NULL prices are excluded up front (the null-order probe rule).

    Scale: one partial+final aggregate; four longs cross the shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    rated = o.select(
        F.expr(
            """CASE WHEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                    >= 25000000 THEN 1 ELSE 0 END"""
        ).alias("a"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("b"),
    )
    s = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
        F.sum("a").cast("long").alias("a1"),
        F.sum("b").cast("long").alias("b1"),
    )
    return s.select(
        "n",
        "agree",
        "a1",
        "b1",
        F.expr(
            """CASE WHEN n * n - (a1 * b1 + (n - a1) * (n - b1)) = 0 THEN NULL
                    WHEN n * agree - (a1 * b1 + (n - a1) * (n - b1)) >= 0
                      THEN CAST(((n * agree - (a1 * b1 + (n - a1) * (n - b1)))
                                 * 1000000)
                                DIV (n * n - (a1 * b1 + (n - a1) * (n - b1)))
                                AS BIGINT)
                    ELSE CAST(-(((a1 * b1 + (n - a1) * (n - b1)) - n * agree)
                                * 1000000
                                DIV (n * n - (a1 * b1 + (n - a1) * (n - b1))))
                              AS BIGINT)
               END"""
        ).alias("kappa_micro"),
    )


# ------------------------------------------------------------ Theil index

_THEIL_SQL = """
WITH v AS (
  SELECT o_orderpriority AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
),
s AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * CAST(FLOOR(ln(CAST(x AS DOUBLE)) * 1000) AS BIGINT))
              AS BIGINT) AS sxl
  FROM v GROUP BY grp
)
SELECT grp AS o_orderpriority, n,
       (sxl // sx)
         - CAST(FLOOR(ln(CAST(sx AS DOUBLE)) * 1000) AS BIGINT)
         + CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT)
         AS theil_milli
FROM s
ORDER BY grp
"""


@register("stats_theil_index", oracle=_THEIL_SQL, tier="T2")
def stats_theil_index(spark, sf_dir):
    """Theil T inequality index of order value per priority class — the
    entropy-based inequality measure that, unlike [[agg_gini]], decomposes
    exactly into within-group + between-group terms (the reason economists
    carry both): T = Σ(x/μ)ln(x/μ)/n = (Σ x·ln x)/S − ln S + ln n.

    Determinism: each x's log is floored to int64 MILLI-nats BEFORE the
    x-weighted sum (micro would overflow: Σ x·lnq_µ(x) ≈ 1.4e20 at sf0.1;
    milli keeps it ≤ 1.4e17), the normalization is one truncating DIV on
    non-negative operands, and the two corrective logs are single
    quantized calls. Zero/NULL values excluded explicitly (ln domain).

    Scale: one partial+final aggregate per group; three longs per group
    cross the shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & (F.col("o_totalprice") > 0)
    )
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("x"),
    )
    s = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(
            F.col("x")
            * F.floor(F.log(F.col("x").cast("double")) * 1000).cast("long")
        )
        .cast("long")
        .alias("sxl"),
    )
    return s.select(
        F.col("grp").alias("o_orderpriority"),
        "n",
        F.expr(
            """(sxl DIV sx)
               - CAST(FLOOR(ln(CAST(sx AS DOUBLE)) * 1000) AS BIGINT)
               + CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000) AS BIGINT)"""
        ).alias("theil_milli"),
    ).orderBy("o_orderpriority")


# ------------------------------------------------------------ log-rank test

_LOGRANK_SQL = """
WITH subj AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        DATE '2001-08-01') AS BIGINT) AS t,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS e
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderdate IS NOT NULL
),
per_t AS (
  SELECT t,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN g = 1 AND e = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS d1,
         CAST(SUM(e) AS BIGINT) AS d
  FROM subj GROUP BY t
),
risk AS (
  SELECT t, d1, d,
         CAST(SUM(c1) OVER (ORDER BY t DESC) AS BIGINT) AS n1,
         CAST(SUM(ct) OVER (ORDER BY t DESC) AS BIGINT) AS n
  FROM per_t
),
terms AS (
  SELECT d1,
         CAST(FLOOR(CAST(d AS DOUBLE) * n1 / n * 1000000000) AS BIGINT)
           AS e1_nano,
         CASE WHEN n <= 1 THEN 0
              ELSE CAST(FLOOR(CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)
                              / (CAST(n AS DOUBLE) * n * (n - 1))
                              * 1000000000) AS BIGINT) END AS v_nano
  FROM risk WHERE d > 0
)
SELECT CAST(SUM(d1) AS BIGINT) AS o1,
       CAST(SUM(e1_nano) AS BIGINT) AS e1_nano,
       CAST(SUM(v_nano) AS BIGINT) AS v_nano,
       CASE WHEN SUM(v_nano) = 0 THEN NULL
            ELSE CAST(FLOOR(
              (CAST(SUM(d1) AS DOUBLE) - CAST(SUM(e1_nano) AS DOUBLE) / 1000000000)
              * (CAST(SUM(d1) AS DOUBLE) - CAST(SUM(e1_nano) AS DOUBLE) / 1000000000)
              / (CAST(SUM(v_nano) AS DOUBLE) / 1000000000)
              * 1000000) AS BIGINT) END AS chisq_micro
FROM terms
"""


@register("stats_log_rank_test", oracle=_LOGRANK_SQL, tier="T2")
def stats_log_rank_test(spark, sf_dir):
    """Log-rank (Mantel-Cox) test comparing the BUILDING segment's
    time-to-completion curve against everyone else's: at each event time
    the observed group-1 completions are compared to the hypergeometric
    expectation given the at-risk sets, χ² = (ΣO−ΣE)²/ΣV — the standard
    two-curve companion to [[stats_survival_km]] (duration = days from
    order date to the fixture horizon; event = finished status).

    Determinism: at-risk sets are exact descending cumulative int64
    counts over the distinct-time table; each time's E and V terms are
    ONE identically-spelled double expression floored to NANO-units
    BEFORE the cross-time sums (the stats_psi_drift rule — V's exact
    rational would need ~2^90); the final χ² assembly is one identical
    double expression. Single-subject times (n ≤ 1) contribute V = 0 on
    both sides.

    Scale: one partial+final aggregate onto the distinct-time table
    (|days| rows — driver-scale), two descending windows, a 1-row fold.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    c = load(spark, sf_dir, "customer")
    subj = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("g"),
        F.expr(
            "CAST(datediff(DATE '2001-08-01', CAST(o_orderdate AS DATE))"
            " AS BIGINT)"
        ).alias("t"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("e"),
    )
    per_t = subj.groupBy("t").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("ct"),
        F.sum(F.when((F.col("g") == 1) & (F.col("e") == 1), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("e").cast("long").alias("d"),
    )
    wdesc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t",
        "d1",
        "d",
        F.sum("c1").over(wdesc).cast("long").alias("n1"),
        F.sum("ct").over(wdesc).cast("long").alias("n"),
    )
    terms = risk.filter(F.col("d") > 0).select(
        "d1",
        F.expr(
            "CAST(FLOOR(CAST(d AS DOUBLE) * n1 / n * 1000000000) AS BIGINT)"
        ).alias("e1_nano"),
        F.expr(
            """CASE WHEN n <= 1 THEN 0
                    ELSE CAST(FLOOR(CAST(d AS DOUBLE) * n1 * (n - n1) * (n - d)
                                    / (CAST(n AS DOUBLE) * n * (n - 1))
                                    * 1000000000) AS BIGINT) END"""
        ).alias("v_nano"),
    )
    return terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_nano").cast("long").alias("e1_nano"),
        F.sum("v_nano").cast("long").alias("v_nano"),
        F.expr(
            """CASE WHEN SUM(v_nano) = 0 THEN NULL
                    ELSE CAST(FLOOR(
                      (CAST(SUM(d1) AS DOUBLE)
                         - CAST(SUM(e1_nano) AS DOUBLE) / 1000000000)
                      * (CAST(SUM(d1) AS DOUBLE)
                         - CAST(SUM(e1_nano) AS DOUBLE) / 1000000000)
                      / (CAST(SUM(v_nano) AS DOUBLE) / 1000000000)
                      * 1000000) AS BIGINT) END"""
        ).alias("chisq_micro"),
    )


_KW_CENTS = "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"

_KW_SQL = f"""
WITH base AS (
  SELECT c_mktsegment AS seg, {_KW_CENTS} AS v
  FROM customer WHERE c_acctbal IS NOT NULL
),
vt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY v),
vtp AS (
  SELECT v, c,
         SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) - c AS prev
  FROM vt
),
sv AS (SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS cg FROM base GROUP BY 1, 2),
per AS (
  SELECT sv.seg,
         CAST(SUM(sv.cg * (2 * vtp.prev + vtp.c + 1)) AS BIGINT) AS two_r,
         CAST(SUM(sv.cg) AS BIGINT) AS n_g
  FROM sv JOIN vtp USING (v)
  GROUP BY sv.seg
),
terms AS (
  SELECT seg, n_g,
         CAST(FLOOR(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)
                    / CAST(n_g AS DOUBLE)) AS BIGINT) AS term_units
  FROM per
),
main AS (
  SELECT CAST(SUM(term_units) AS BIGINT) AS s_units,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM terms
),
ties AS (SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term FROM vtp)
SELECT main.k, main.n, ties.tie_term,
       FLOOR((CAST(3 * main.s_units AS DOUBLE)
              / CAST(main.n * (main.n + 1) AS DOUBLE)
              - 3 * (main.n + 1)) * 10000 + 0.5) / 10000 AS h_stat,
       FLOOR(((CAST(3 * main.s_units AS DOUBLE)
               / CAST(main.n * (main.n + 1) AS DOUBLE)
               - 3 * (main.n + 1))
              / (1 - CAST(ties.tie_term AS DOUBLE)
                     / CAST(main.n * main.n * main.n - main.n AS DOUBLE)))
             * 10000 + 0.5) / 10000 AS h_corrected
FROM main CROSS JOIN ties
"""


@register("stats_kruskal_wallis", oracle=_KW_SQL, tier="T2")
def stats_kruskal_wallis(spark, sf_dir):
    """Kruskal–Wallis H test across all five market segments' balance
    distributions — the k-group generalization of [[stats_mann_whitney]]
    (one-way ANOVA on ranks), with the standard tie correction
    H' = H / (1 − Σ(t³−t)/(n³−n)).

    Determinism: the doubled rank sums 2R_g = Σ c_gv·(2·prev + c + 1) are
    exact int64 (the mann_whitney recipe); each segment's (2R_g)²/n_g is
    floored to integer units BEFORE the cross-segment sum (the
    order-independence rule for cross-group DOUBLE folds — the two IEEE
    ops square/divide are correctly rounded from exact int64 inputs, so
    the floor input is bit-identical in both engines); ties contribute
    t³−t exactly. Only the final H expressions divide through doubles,
    with one 1e-4 round each. Int64 headroom: 3·S ≤ ~2.5e17 at sf0.1
    (documented; beyond ~4M rows per segment carry terms as
    DECIMAL(38,0)).

    Scale note: the global rank window runs over the per-distinct-value
    pre-aggregate (|distinct cents| rows), never the raw table; the
    (segment, value) table shuffles once on v for the prev join; ties and
    H are 1-row broadcast scalar crossjoins.
    """
    base = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.expr(_KW_CENTS).alias("v"),
        )
    )
    vt = base.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vtp = vt.select(
        "v", "c", (F.sum("c").over(wv) - F.col("c")).alias("prev")
    )
    sv = base.groupBy("seg", "v").agg(F.count(F.lit(1)).cast("long").alias("cg"))
    per = (
        sv.join(vtp, "v")
        .groupBy("seg")
        .agg(
            F.sum(F.col("cg") * (F.lit(2) * F.col("prev") + F.col("c") + 1))
            .cast("long")
            .alias("two_r"),
            F.sum("cg").cast("long").alias("n_g"),
        )
    )
    terms = per.select(
        "n_g",
        F.expr(
            """CAST(FLOOR(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)
                          / CAST(n_g AS DOUBLE)) AS BIGINT)"""
        ).alias("term_units"),
    )
    main = terms.agg(
        F.sum("term_units").cast("long").alias("s_units"),
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ties = vtp.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_term")
    )
    return main.crossJoin(F.broadcast(ties)).select(
        "k",
        "n",
        "tie_term",
        F.expr(
            """FLOOR((CAST(3 * s_units AS DOUBLE)
                      / CAST(n * (n + 1) AS DOUBLE)
                      - 3 * (n + 1)) * 10000 + 0.5) / 10000"""
        ).alias("h_stat"),
        F.expr(
            """FLOOR(((CAST(3 * s_units AS DOUBLE)
                       / CAST(n * (n + 1) AS DOUBLE)
                       - 3 * (n + 1))
                      / (1 - CAST(tie_term AS DOUBLE)
                             / CAST(n * n * n - n AS DOUBLE)))
                     * 10000 + 0.5) / 10000"""
        ).alias("h_corrected"),
    )


# pk uniquely orders a customer's orders: epoch-day * 1e10 + orderkey
# (orderkey < 1e10 at any SF this repo targets; headroom documented below)
_WSR_PK = (
    "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) "
    "* 10000000000 + o_orderkey"
)
_WSR_PK_SPARK = (
    "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') "
    "* 10000000000 + o_orderkey"
)
_WSR_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"

_WSR_SQL = f"""
WITH pairs AS (
  SELECT o_custkey,
         min_by({_WSR_CENTS}, {_WSR_PK}) AS f,
         max_by({_WSR_CENTS}, {_WSR_PK}) AS l
  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
  GROUP BY o_custkey
  HAVING COUNT(*) >= 2
),
diffs AS (
  SELECT l - f AS d, abs(l - f) AS ad FROM pairs WHERE l - f <> 0
),
vt AS (
  SELECT ad,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_pos
  FROM diffs GROUP BY ad
),
vtp AS (
  SELECT ad, c, c_pos,
         SUM(c) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) - c AS prev
  FROM vt
),
agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_pos * (2 * prev + c + 1)) AS BIGINT) AS two_wplus,
         CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term
  FROM vtp
)
SELECT n, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg, two_wplus, tie_term,
       FLOOR((CAST(two_wplus - n * (n + 1) // 2 AS DOUBLE)
              / (2 * sqrt((CAST(2 * n * (n + 1) * (2 * n + 1) - tie_term
                                AS DOUBLE)) / 48)))
             * 10000 + 0.5) / 10000 AS z_stat
FROM agg
"""


@register("stats_wilcoxon_signed_rank", oracle=_WSR_SQL, tier="T2")
def stats_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test on paired observations — each customer's
    FIRST vs LAST order total (customers with ≥2 orders; zero differences
    dropped per the standard procedure): the non-parametric paired
    complement to [[stats_mann_whitney]]'s independent two-sample test,
    with tie-corrected normal approximation.

    Determinism: first/last are min_by/max_by over the UNIQUE packed key
    epoch_day·1e10 + orderkey (no date-tie ambiguity; orderkey < 1e10 at
    any targeted SF — beyond that widen the pack), differences are exact
    cents, the doubled signed-rank sum 2W⁺ = Σ c_pos·(2·prev + c + 1) is
    exact int64 over the distinct-|d| pre-aggregate (the mann_whitney
    recipe), ties contribute t³−t exactly, and only the final z divides
    through doubles with one 1e-4 round. Variance carried as the exact
    integer 2n(n+1)(2n+1) − tie_term over 48 (≈1.3e13 at sf0.1 — int64
    headroom documented).

    Scale note: one customer-hash aggregate builds the pairs, the rank
    window runs over the per-distinct-|d| pre-aggregate (|distinct| rows,
    never the raw table), everything else map-side combines.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    pairs = (
        o.groupBy("o_custkey")
        .agg(
            F.expr(f"min_by({_WSR_CENTS}, {_WSR_PK_SPARK})").alias("f"),
            F.expr(f"max_by({_WSR_CENTS}, {_WSR_PK_SPARK})").alias("l"),
            F.count(F.lit(1)).alias("n_ord"),
        )
        .filter(F.col("n_ord") >= 2)
    )
    diffs = pairs.select(
        (F.col("l") - F.col("f")).alias("d"),
        F.abs(F.col("l") - F.col("f")).alias("ad"),
    ).filter(F.col("d") != 0)
    vt = diffs.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("c_pos"),
    )
    wv = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vtp = vt.select(
        "c", "c_pos", (F.sum("c").over(wv) - F.col("c")).alias("prev")
    )
    agg = vtp.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum(F.col("c_pos") * (F.lit(2) * F.col("prev") + F.col("c") + 1))
        .cast("long")
        .alias("two_wplus"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_term"),
    )
    return agg.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        "two_wplus",
        "tie_term",
        F.expr(
            """FLOOR((CAST(two_wplus - n * (n + 1) DIV 2 AS DOUBLE)
                      / (2 * sqrt((CAST(2 * n * (n + 1) * (2 * n + 1) - tie_term
                                        AS DOUBLE)) / 48)))
                     * 10000 + 0.5) / 10000"""
        ).alias("z_stat"),
    )


_FRIEDMAN_CELLS_SQL = """
cells AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS block,
         c.c_mktsegment AS seg,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_totalprice IS NOT NULL AND o.o_orderdate IS NOT NULL
  GROUP BY 1, 2
),
k AS (SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS k FROM cells),
full_blocks AS (
  SELECT block FROM cells CROSS JOIN k
  GROUP BY block, k.k HAVING COUNT(*) = MAX(k.k)
),
ranked AS (
  SELECT c.seg,
         2 * (rank() OVER (PARTITION BY c.block ORDER BY c.v) - 1)
           + COUNT(*) OVER (PARTITION BY c.block, c.v) + 1 AS two_rank
  FROM cells c JOIN full_blocks USING (block)
)
"""

_FRIEDMAN_SQL = f"""
WITH {_FRIEDMAN_CELLS_SQL},
rj AS (
  SELECT seg, CAST(SUM(two_rank) AS BIGINT) AS two_rj,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked GROUP BY seg
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n,
         CAST(SUM(two_rj * two_rj) AS BIGINT) AS s
  FROM rj
)
SELECT k, n AS n_blocks,
       FLOOR((CAST(3 * s AS DOUBLE) / (n * k * (k + 1)) - 3 * n * (k + 1))
             * 10000 + 0.5) / 10000 AS chi2_stat
FROM agg
"""


@register("stats_friedman", oracle=_FRIEDMAN_SQL, tier="T2")
def stats_friedman(spark, sf_dir):
    """Friedman test — k related samples over repeated blocks: monthly
    revenue cells ranked WITHIN each calendar month across the five
    market segments (blocks = complete months only), χ² = 12/(n·k·(k+1))
    Σ R_j² − 3·n·(k+1). The repeated-measures complement to
    [[stats_kruskal_wallis]]'s independent k-group test.

    Determinism: within-block doubled average ranks are exact ints
    (2·(min_rank−1) + peer_count + 1 — identical rank()/peer-count
    semantics in both engines), Σ(2R_j)² is exact int64 (so χ² = 3S/(n·k·
    (k+1)) − 3n(k+1) with one double divide + one 1e-4 round). Exact-cent
    cell ties across segments within a month are handled by the average
    rank; the untied variance normalization is the standard reported
    form (documented).

    Scale note: one (month, segment) aggregate, a broadcast
    complete-block semi-join, a window over 5-row blocks, then two tiny
    aggregates — everything map-side combinable before the month shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("block"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("v")
        )
    )
    kdf = cells.agg(F.countDistinct("seg").cast("long").alias("k"))
    full_blocks = (
        cells.crossJoin(F.broadcast(kdf))
        .groupBy("block", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == F.col("k"))
        .select("block")
    )
    wr = Window.partitionBy("block").orderBy("v")
    wp = Window.partitionBy("block", "v")
    ranked = (
        cells.join(F.broadcast(full_blocks), "block")
        .select(
            "seg",
            (
                F.lit(2) * (F.rank().over(wr) - 1)
                + F.count(F.lit(1)).over(wp)
                + 1
            ).alias("two_rank"),
        )
    )
    rj = ranked.groupBy("seg").agg(
        F.sum("two_rank").cast("long").alias("two_rj"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    agg = rj.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n").alias("n"),
        F.sum(F.col("two_rj") * F.col("two_rj")).cast("long").alias("s"),
    )
    return agg.select(
        "k",
        F.col("n").alias("n_blocks"),
        F.expr(
            """FLOOR((CAST(3 * s AS DOUBLE) / (n * k * (k + 1))
                      - 3 * n * (k + 1)) * 10000 + 0.5) / 10000"""
        ).alias("chi2_stat"),
    )


# shared Wilson-interval expression strings (identical characters in both
# engines — the ts_pacf rule): z = 1.96 enters as the exact literal 1.96
_WILSON_CENTER = "(p_hat + 1.96 * 1.96 / (2 * n)) / (1 + 1.96 * 1.96 / n)"
_WILSON_HALF = (
    "(1.96 * sqrt(p_hat * (1 - p_hat) / n"
    " + 1.96 * 1.96 / (4 * n * n))) / (1 + 1.96 * 1.96 / n)"
)

_WILSON_SQL = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
),
p AS (SELECT segment, n, x, CAST(x AS DOUBLE) / n AS p_hat FROM base)
SELECT segment, n, x,
       FLOOR(p_hat * 1000000 + 0.5) / 1000000 AS p_hat,
       FLOOR(({_WILSON_CENTER} - {_WILSON_HALF}) * 1000000 + 0.5) / 1000000
         AS ci_lo,
       FLOOR(({_WILSON_CENTER} + {_WILSON_HALF}) * 1000000 + 0.5) / 1000000
         AS ci_hi
FROM p
"""


@register("stats_proportion_ci_wilson", oracle=_WILSON_SQL, tier="T2")
def stats_proportion_ci_wilson(spark, sf_dir):
    """Wilson 95% score interval for a per-segment proportion (share of
    fulfilled orders) — the interval that stays inside [0,1] and behaves
    at small n where the Wald interval collapses; the per-variant readout
    an experimentation stack reports next to [[ab_test_ztest]].

    Determinism: x and n are exact counts; p̂, the center and half-width
    are CHARACTER-IDENTICAL expression strings in both engines (the
    ts_pacf rule — same parse, same IEEE sequence; the one sqrt is the
    same libm-correctly-rounded call on identical input), each output
    rounded once to 1e-6.

    Scale note: one broadcast dim join + one segment aggregate —
    map-side combinable, bounded output.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    p = base.select(
        "segment", "n", "x", F.expr("CAST(x AS DOUBLE) / n").alias("p_hat")
    )
    return p.select(
        "segment",
        "n",
        "x",
        F.expr("FLOOR(p_hat * 1000000 + 0.5) / 1000000").alias("p_hat"),
        F.expr(
            f"FLOOR(({_WILSON_CENTER} - {_WILSON_HALF}) * 1000000 + 0.5) / 1000000"
        ).alias("ci_lo"),
        F.expr(
            f"FLOOR(({_WILSON_CENTER} + {_WILSON_HALF}) * 1000000 + 0.5) / 1000000"
        ).alias("ci_hi"),
    )


_MI_SQL = """
WITH base AS (
  SELECT c.c_mktsegment AS x, o.o_orderstatus AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
nxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
nx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM nxy GROUP BY x),
ny AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM nxy GROUP BY y),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM nxy),
terms AS (
  SELECT nxy.c *
         (CAST(FLOOR(ln(CAST(nxy.c AS DOUBLE) * tot.n) * 1000000) AS BIGINT)
          - CAST(FLOOR(ln(CAST(nx.cx AS DOUBLE) * ny.cy) * 1000000) AS BIGINT))
           AS t
  FROM nxy JOIN nx USING (x) JOIN ny USING (y) CROSS JOIN tot
),
hx AS (
  SELECT CAST(FLOOR(ln(CAST(tot.n AS DOUBLE)) * 1000000) AS BIGINT)
         - CAST(SUM(cx * CAST(FLOOR(ln(CAST(cx AS DOUBLE)) * 1000000)
                              AS BIGINT)) AS BIGINT) // tot.n AS h
  FROM nx CROSS JOIN tot GROUP BY tot.n
),
hy AS (
  SELECT CAST(FLOOR(ln(CAST(tot.n AS DOUBLE)) * 1000000) AS BIGINT)
         - CAST(SUM(cy * CAST(FLOOR(ln(CAST(cy AS DOUBLE)) * 1000000)
                              AS BIGINT)) AS BIGINT) // tot.n AS h
  FROM ny CROSS JOIN tot GROUP BY tot.n
)
SELECT tot.n,
       CASE WHEN CAST(SUM(terms.t) AS BIGINT) >= 0
            THEN CAST(SUM(terms.t) AS BIGINT) // tot.n
            ELSE -((-CAST(SUM(terms.t) AS BIGINT)) // tot.n)
       END AS mi_micronats,
       hx.h AS h_x_micronats,
       hy.h AS h_y_micronats,
       CASE WHEN least(hx.h, hy.h) <= 0
                 OR CAST(SUM(terms.t) AS BIGINT) < 0 THEN NULL
            ELSE CAST((CAST(SUM(terms.t) AS BIGINT) // tot.n) * 1000000
                      // least(hx.h, hy.h) AS BIGINT) END AS nmi_micro
FROM terms CROSS JOIN tot CROSS JOIN hx CROSS JOIN hy
GROUP BY tot.n, hx.h, hy.h
"""


@register("stats_mutual_information", oracle=_MI_SQL, tier="T2")
def stats_mutual_information(spark, sf_dir):
    """Mutual information between market segment and order status (with
    marginal entropies and min-normalized NMI) — the feature-selection /
    label-leakage screen ML pipelines run over candidate categorical
    features; [[stats_chisq_independence]] tests the same table's
    independence, MI measures its strength in nats.

    Determinism: MI = Σ c_xy·[ln(c_xy·n) − ln(c_x·c_y)] / n with EACH ln
    floored to int64 micro-nats BEFORE the weighted sum (the
    [[text_char_entropy]] identity, applied to the ratio's numerator and
    denominator separately so every term is an exact integer product);
    marginal entropies use the same identity; NMI is one micro `//` of
    two int64s. Log arguments c·n ≤ ~2.3e10 are int64→double exact.
    MI ≥ 0 holds for true logs, but per-term quantization can leave the
    SUM a few micro-nats NEGATIVE on near-independent tables, where
    Spark's truncating DIV and DuckDB's flooring // diverge — so the
    division is negation-guarded on BOTH sides (the text_perplexity
    hazard class), and NMI reports NULL for a (quantization-)negative
    MI instead of a sign-dependent ratio.

    Scale note: the contingency table is |X|·|Y| rows after one
    map-side-combinable aggregate; everything downstream is broadcast
    1-row scalar joins (BNLJ-audited).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("x"), F.col("o_orderstatus").alias("y")
    )
    nxy = base.groupBy("x", "y").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nx = nxy.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    ny = nxy.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    tot = nxy.agg(F.sum("c").cast("long").alias("n"))
    qln = lambda e: F.floor(F.log(e) * 1000000).cast("long")  # noqa: E731
    terms = (
        nxy.join(F.broadcast(nx), "x")
        .join(F.broadcast(ny), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("c")
                * (
                    qln(F.col("c").cast("double") * F.col("n"))
                    - qln(F.col("cx").cast("double") * F.col("cy"))
                )
            ).alias("t")
        )
    )
    hx = nx.crossJoin(F.broadcast(tot)).groupBy("n").agg(
        (
            qln(F.col("n").cast("double"))
            - F.expr(
                """CAST(SUM(cx * CAST(FLOOR(ln(CAST(cx AS DOUBLE)) * 1000000)
                                      AS BIGINT)) AS BIGINT) DIV n"""
            )
        ).alias("h")
    ).select(F.col("h").alias("h_x"))
    hy = ny.crossJoin(F.broadcast(tot)).groupBy("n").agg(
        (
            qln(F.col("n").cast("double"))
            - F.expr(
                """CAST(SUM(cy * CAST(FLOOR(ln(CAST(cy AS DOUBLE)) * 1000000)
                                      AS BIGINT)) AS BIGINT) DIV n"""
            )
        ).alias("h")
    ).select(F.col("h").alias("h_y"))
    mi = terms.crossJoin(F.broadcast(tot)).groupBy("n").agg(
        F.expr(
            """CASE WHEN CAST(SUM(t) AS BIGINT) >= 0
                    THEN CAST(SUM(t) AS BIGINT) DIV n
                    ELSE -((-CAST(SUM(t) AS BIGINT)) DIV n)
               END"""
        ).alias("mi_micronats")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            "mi_micronats",
            F.col("h_x").alias("h_x_micronats"),
            F.col("h_y").alias("h_y_micronats"),
            F.expr(
                """CASE WHEN least(h_x, h_y) <= 0 OR mi_micronats < 0 THEN NULL
                        ELSE CAST(mi_micronats * 1000000 DIV least(h_x, h_y)
                                  AS BIGINT) END"""
            ).alias("nmi_micro"),
        )
    )
