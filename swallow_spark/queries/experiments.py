"""Experimentation & market-basket analytics: association rules over
co-purchases, two-proportion z-tests over hash-split cohorts, exact decimal
money accounting, and period-over-period growth.

Determinism: counts are exact ints; every derived float is an explicitly
ordered expression (single divisions, one sqrt) identical in both engines,
then half-up rounded where the op sequence exceeds a few flops.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "basket_association_rules",
    oracle="""
WITH n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
item AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cnt AS (SELECT l_partkey, COUNT(*) AS c FROM item GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS xy
  FROM item a JOIN item b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT x, y, xy,
       CAST(xy AS DOUBLE) / cx.c AS confidence,
       CAST(xy AS DOUBLE) * n / (CAST(cx.c AS DOUBLE) * cy.c) AS lift
FROM pair
JOIN cnt cx ON pair.x = cx.l_partkey
JOIN cnt cy ON pair.y = cy.l_partkey
CROSS JOIN n_orders
ORDER BY xy DESC, x, y LIMIT 100
""",
    tier="T2",
)
def basket_association_rules(spark, sf_dir):
    """Association rules x→y over order baskets: support count, confidence
    P(y|x), lift P(x,y)/(P(x)P(y)) for pairs co-occurring ≥3 times —
    top-100 by (count, x, y). Confidence/lift are ratios of exact integers
    (one or two float ops, bit-identical).

    Scale note: the pair generation is the same orderkey self-join as the
    co-purchase graph (cap basket size at 100 TB); item counts broadcast
    back onto pairs. The HAVING prunes the pair table before the joins.
    """
    li = load(spark, sf_dir, "lineitem")
    item = li.select("l_orderkey", "l_partkey").distinct()
    n = item.select(F.count_distinct("l_orderkey").alias("n"))
    cnt = item.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = item.alias("a"), item.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .agg(F.count(F.lit(1)).alias("xy"))
        .filter(F.col("xy") >= 3)
    )
    cx = cnt.withColumnRenamed("l_partkey", "x").withColumnRenamed("c", "cx")
    cy = cnt.withColumnRenamed("l_partkey", "y").withColumnRenamed("c", "cy")
    return (
        pair.join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            "xy",
            (F.col("xy").cast("double") / F.col("cx")).alias("confidence"),
            (
                F.col("xy").cast("double") * F.col("n")
                / (F.col("cx").cast("double") * F.col("cy"))
            ).alias("lift"),
        )
        .orderBy(F.col("xy").desc(), "x", "y")
        .limit(100)
    )


@register(
    "ab_test_ztest",
    oracle=f"""
WITH assign AS (
  SELECT user_id, user_id % 2 AS grp,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), g AS (
  SELECT grp, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM assign GROUP BY grp
), wide AS (
  SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN conv END) AS c0,
         MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN conv END) AS c1
  FROM g
)
SELECT n0, c0, n1, c1,
       {sql_rnd('CAST(c0 AS DOUBLE) / n0', 6)} AS p0,
       {sql_rnd('CAST(c1 AS DOUBLE) / n1', 6)} AS p1,
       {sql_rnd('''(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
         / NULLIF(sqrt( (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
               * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
               * (1.0 / n0 + 1.0 / n1) ), 0)''', 4)} AS z
FROM wide
""",
    tier="T2",
)
def ab_test_ztest(spark, sf_dir):
    """Two-proportion z-test on a deterministic hash split (user_id parity):
    does cohort 1 convert (any 'purchase') at a different rate than cohort
    0? Counts are exact; p0/p1/z are explicitly-sequenced float expressions
    (pooled-variance z), half-up rounded.

    Scale note: one aggregation to per-user flags, one to per-cohort
    counts, then scalar math on a 1-row frame — the event stream is
    scanned once regardless of cohort count.
    """
    e = load(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted")
    ).withColumn("grp", F.col("user_id") % 2)
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pool = F.col("c0").cast("double") + F.col("c1")
    ptot = pool / (F.col("n0") + F.col("n1"))
    # try_divide: when every user converts (pooled p = 1, e.g. sf0.01) the
    # pooled-variance denominator is 0 — z is NULL, not an ANSI DIVIDE_BY_ZERO.
    z = F.try_divide(
        p1 - p0,
        F.sqrt(ptot * (1 - ptot) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))),
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        rnd(p0, 6).alias("p0"),
        rnd(p1, 6).alias("p1"),
        rnd(z, 4).alias("z"),
    )


@register(
    "agg_decimal_exact",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DECIMAL(38,2))) AS DOUBLE)
         AS total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
""",
    tier="T2",
)
def agg_decimal_exact(spark, sf_dir):
    """Money aggregation through the DECIMAL type system: cast 2-dec prices
    to DECIMAL(14,2), sum losslessly in DECIMAL(38,2) (no float drift at
    ANY row count), cast the final total once to double for transport.
    The typed alternative to the integer-cents recipe — same exactness,
    but the engine enforces scale/precision.

    Scale note: decimal sums are mergeable JVM unsafe-row aggregates;
    precision 38 holds ~1e36 cents — no overflow at 100 TB.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "ts_mom_growth",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT CAST(month AS DATE) AS month,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       CAST(cents - LAG(cents) OVER (ORDER BY month) AS DOUBLE)
         / LAG(cents) OVER (ORDER BY month) AS mom_growth
FROM m
""",
    tier="T2",
)
def ts_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth: exact cent sums per month, lag
    window, growth = Δcents/prev_cents in ONE float division (NULL for the
    first month). The period-over-period reporting primitive.

    Scale note: |months| rows after the first aggregate — the lag window's
    single-partition sort is over a tiny frame, not the fact table.
    """
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("month")
    prev = F.lag("cents").over(w)
    return m.select(
        F.col("month").cast("date").alias("month"),
        (F.col("cents").cast("double") / 100).alias("revenue"),
        ((F.col("cents") - prev).cast("double") / prev).alias("mom_growth"),
    )


_CUPED_SQL = """
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo FROM events
),
per_user AS (
  SELECT e.user_id, e.user_id % 2 AS grp,
         CAST(SUM(CASE WHEN CAST(e.ts AS DATE) < lo + 15
                       THEN CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(e.ts AS DATE) >= lo + 15
                       THEN CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events e CROSS JOIN bounds
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
  GROUP BY e.user_id
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_user
),
theta AS (
  SELECT n, sx, sy,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS th,
         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * n) AS var_y,
         CAST(sx AS DOUBLE) / n AS mean_x
  FROM mom
),
adj AS (
  SELECT p.grp, p.y, t.th, t.var_y,
         CAST(FLOOR((CAST(p.y AS DOUBLE)
                     - t.th * (CAST(p.x AS DOUBLE) - t.mean_x)) * 10000 + 0.5)
              AS BIGINT) AS y_adj_u
  FROM per_user p CROSS JOIN theta t
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       FLOOR(AVG(CAST(y AS DOUBLE)) * 100 + 0.5) / 100 AS mean_y_cents,
       FLOOR(CAST(SUM(y_adj_u) AS DOUBLE) / 10000 / COUNT(*) * 100 + 0.5) / 100
         AS mean_y_cuped_cents,
       FLOOR(MAX(th) * 1000000 + 0.5) / 1000000 AS theta
FROM adj GROUP BY grp
"""


@register("stats_cuped", oracle=_CUPED_SQL, tier="T2")
def stats_cuped(spark, sf_dir):
    """CUPED variance reduction for experiment metrics (Deng et al. 2013):
    adjust each user's experiment-period revenue Y by their PRE-period
    revenue X — Y' = Y − θ·(X − mean(X)), θ = cov(X,Y)/var(X) — so cohort
    means keep their expectation but lose the variance X explains; the
    standard trick that cuts A/B test duration severalfold. Pre-period =
    first 15 days of the fixture window, experiment period = the rest;
    cohorts by user parity.

    Determinism: X/Y are exact per-user cent sums; θ comes from exact
    int64 cross-moments with ONE fixed IEEE expression; each user's
    adjusted value is floored to int64 1e-4-cent units BEFORE the
    cross-user SUM (the stats_anova cross-dimension rule — a raw double
    sum would be partition-order dependent), so the cohort aggregate is
    exact integer arithmetic with one final division. AVG(y) is safe
    as-is: y is integer-valued, and integer-double sums are exact to 2^53.
    Headroom: |y_adj_u| ≤ ~1e9 per user at sf1 → int64 sums safe past
    SF 1000.

    Scale notes: one user_id aggregate builds (x, y); moments are one
    partial+final pass; θ and mean_x broadcast as a 1-row scalar (audited
    crossJoin); the adjusted aggregate is another single pass — three
    shuffles total, all narrow.
    """
    e = load(spark, sf_dir, "events")
    bounds = e.agg(F.min(F.col("ts").cast("date")).alias("lo"))
    per_user = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts").cast("date") < F.date_add(F.col("lo"), 15),
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    F.col("ts").cast("date") >= F.date_add(F.col("lo"), 15),
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("y"),
        )
        .select((F.col("user_id") % 2).alias("grp"), "user_id", "x", "y")
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    theta = mom.select(
        (
            (F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        ).alias("th"),
        (F.col("sx").cast("double") / F.col("n")).alias("mean_x"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "grp",
        "y",
        "th",
        F.floor(
            (
                F.col("y").cast("double")
                - F.col("th") * (F.col("x").cast("double") - F.col("mean_x"))
            )
            * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("y_adj_u"),
    )
    return adj.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (F.floor(F.avg(F.col("y").cast("double")) * 100 + F.lit(0.5)) / 100).alias(
            "mean_y_cents"
        ),
        (
            F.floor(
                F.sum("y_adj_u").cast("double") / 10000 / F.count(F.lit(1)) * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("mean_y_cuped_cents"),
        (F.floor(F.max("th") * 1000000 + F.lit(0.5)) / 1000000).alias("theta"),
    )


_ECE_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted,
         (user_id * 2654435761) % 1000000007 % 1000 AS score_milli
  FROM events GROUP BY user_id
),
binned AS (
  SELECT score_milli // 100 AS bin, converted, score_milli
  FROM per_user
),
b AS (
  SELECT CAST(bin AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv,
         CAST(SUM(score_milli) AS BIGINT) AS score_sum_milli
  FROM binned GROUP BY bin
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM b),
terms AS (
  SELECT b.bin, b.n, b.conv,
         FLOOR(CAST(b.score_sum_milli AS DOUBLE) / b.n / 1000 * 10000 + 0.5)
           / 10000 AS mean_score,
         FLOOR(CAST(b.conv AS DOUBLE) / b.n * 10000 + 0.5) / 10000 AS rate,
         CAST(FLOOR(ABS(CAST(b.score_sum_milli AS DOUBLE) / b.n / 1000
                        - CAST(b.conv AS DOUBLE) / b.n)
                    * b.n * 1000000 + 0.5) AS BIGINT) AS w_gap_u
  FROM b
),
ece AS (SELECT CAST(SUM(w_gap_u) AS BIGINT) AS gap_u FROM terms)
SELECT t.bin, t.n, t.conv, t.mean_score, t.rate,
       FLOOR(CAST(ece.gap_u AS DOUBLE) / 1000000 / tot.nt * 1000000 + 0.5)
         / 1000000 AS ece
FROM terms t CROSS JOIN ece CROSS JOIN tot
"""


@register("stats_calibration_ece", oracle=_ECE_SQL, tier="T2")
def stats_calibration_ece(spark, sf_dir):
    """Expected Calibration Error over 10 score deciles: per bin, the gap
    between mean predicted score and observed conversion rate, weighted
    by bin size — THE model-calibration audit ("a 0.7 score should
    convert 70% of the time"); a big ECE means probabilities can't be
    thresholded or averaged. Scores here are deterministic hash
    pseudo-probabilities (the fixtures carry no model output — the
    PLUMBING is the product: swap the score expression for a real model
    column and nothing else changes).

    Determinism: scores are pure int64 hash milli-units; per-bin
    aggregates exact; each bin's |gap|·n term is ONE IEEE chain floored
    to 1e-6 units BEFORE the cross-bin sum (the cross-dimension rule);
    ECE is one final division, half-up 6dp. Scale note: one user
    aggregate + one 10-key bin aggregate + scalar broadcasts (audited).
    """
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted")
    ).select(
        "converted",
        ((F.col("user_id") * F.lit(2654435761)) % F.lit(1000000007) % 1000).alias(
            "score_milli"
        ),
    )
    b = per_user.groupBy((F.col("score_milli") / 100).cast("long").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
        F.sum("score_milli").cast("long").alias("score_sum_milli"),
    )
    tot = b.agg(F.sum("n").cast("long").alias("nt"))
    mean_score_raw = F.col("score_sum_milli").cast("double") / F.col("n") / 1000
    rate_raw = F.col("conv").cast("double") / F.col("n")
    terms = b.select(
        "bin",
        "n",
        "conv",
        (F.floor(mean_score_raw * 10000 + F.lit(0.5)) / 10000).alias("mean_score"),
        (F.floor(rate_raw * 10000 + F.lit(0.5)) / 10000).alias("rate"),
        F.floor(
            F.abs(mean_score_raw - rate_raw) * F.col("n") * 1000000 + F.lit(0.5)
        )
        .cast("long")
        .alias("w_gap_u"),
    )
    ece = terms.agg(F.sum("w_gap_u").cast("long").alias("gap_u"))
    return (
        terms.crossJoin(F.broadcast(ece))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "conv",
            "mean_score",
            "rate",
            (
                F.floor(
                    F.col("gap_u").cast("double") / 1000000 / F.col("nt") * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("ece"),
        )
    )


# ------------------------------------------------ power analysis (round 9)
# The planning half of the experiment battery: ab_test_ztest / stats_cuped
# / stats_sprt_stopping ANALYZE a finished experiment; this key sizes the
# NEXT one. Standard two-proportion power formula (alpha=0.05 two-sided,
# power=0.80):
#   n/arm = (z_a*sqrt(2*pbar*qbar) + z_b*sqrt(p1*q1 + p2*q2))^2 / delta^2
# with p1 the observed per-segment baseline conversion. The whole float
# expression is emitted by ONE helper for both engines (short
# decimal-exact literals only), so the IEEE sequence is shared.


def _power_expr(d: str) -> str:
    """n-per-arm for absolute MDE ``d`` (a short decimal literal string),
    over a column conv_micro holding baseline conversion in micro-units.
    Identical text runs in Spark SQL and DuckDB."""
    p1 = "(CAST(conv_micro AS DOUBLE) / 1000000)"
    p2 = f"LEAST({p1} + {d}, 0.999999)"
    pbar = f"(({p1} + {p2}) / 2)"
    a = (
        f"(1.96 * sqrt(2 * {pbar} * (1 - {pbar})) + "
        f"0.84 * sqrt({p1} * (1 - {p1}) + {p2} * (1 - {p2})))"
    )
    return f"(({a}) * ({a}) / ({d} * {d}))"


_POWER_DELTAS = ((10, "0.01"), (20, "0.02"), (50, "0.05"))

_POWER_SQL = f"""
WITH flags AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)
              THEN 1 ELSE 0 END AS conv
  FROM customer c
),
per AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(conv) AS BIGINT) AS conv
  FROM flags GROUP BY 1
),
base AS (
  SELECT segment, total,
         CAST(conv * 1000000 // total AS BIGINT) AS conv_micro
  FROM per
),
stacked AS (
  {" UNION ALL ".join(
      f"SELECT segment, total, conv_micro, {dm} AS delta_milli, "
      f"{_power_expr(ds)} AS raw FROM base"
      for dm, ds in _POWER_DELTAS
  )}
)
SELECT segment,
       CAST(delta_milli AS BIGINT) AS delta_milli,
       total AS n_customers,
       conv_micro,
       {sql_rnd('raw', 2)} AS n_per_arm
FROM stacked
"""


@register("stats_power_twoprop", oracle=_POWER_SQL, tier="T2")
def stats_power_twoprop(spark, sf_dir):
    """Two-proportion sample-size (power) analysis per market segment: the
    observed baseline conversion (customer has >= 1 order) in micro-units
    and the required n per arm to detect absolute MDEs of 1/2/5 points at
    alpha=0.05 (two-sided), power=0.80 — the table an experimentation
    platform shows before any traffic is assigned.

    Determinism: counts and conv_micro are exact int64; the float power
    formula is ONE shared expression string (_power_expr) evaluated by
    both engines with short decimal-exact z literals (1.96 / 0.84), then
    half-up rounded to 2 decimals; p2 is clamped below 1 so the variance
    sqrt never sees a negative.

    Scale: the conversion flag is a left-semi-shaped join against the
    distinct order keys (no order rows shuffled beyond the key), one
    partial+final aggregate on the bounded segment dimension, then
    constant-time math on k x 3 rows.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    ok = o.select(F.col("o_custkey").alias("ck")).distinct()
    flags = c.join(ok, c.c_custkey == ok.ck, "left").select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("ck").isNotNull(), 1).otherwise(0).alias("conv"),
    )
    base = (
        flags.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum("conv").cast("long").alias("conv"),
        )
        .select(
            "segment",
            "total",
            F.expr("CAST(conv * 1000000 DIV total AS BIGINT)").alias(
                "conv_micro"
            ),
        )
    )
    stacked = (
        base.select(
            "segment",
            "total",
            "conv_micro",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(dm).cast("long").alias("delta_milli"),
                            F.expr(_power_expr(ds)).alias("raw"),
                        )
                        for dm, ds in _POWER_DELTAS
                    ]
                )
            ).alias("s"),
        )
    )
    return stacked.select(
        "segment",
        F.col("s.delta_milli").alias("delta_milli"),
        F.col("total").alias("n_customers"),
        "conv_micro",
        rnd(F.col("s.raw"), 2).alias("n_per_arm"),
    )
