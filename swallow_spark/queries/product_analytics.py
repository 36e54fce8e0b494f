"""Product-analytics operators over the event stream: conversion funnel and
cohort retention — the aggregate shapes every event warehouse runs daily.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..ops.dist_rank import distributed_prefix, ntile_from_rank
from ..registry import register


@register(
    "funnel_conversion",
    oracle="""
WITH stage1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
stage2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN stage1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t1
  GROUP BY e.user_id
),
stage3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN stage2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t2
  GROUP BY e.user_id
)
SELECT 'view' AS stage, CAST((SELECT COUNT(*) FROM stage1) AS BIGINT) AS n_users
UNION ALL
SELECT 'view>click', CAST((SELECT COUNT(*) FROM stage2) AS BIGINT)
UNION ALL
SELECT 'view>click>purchase', CAST((SELECT COUNT(*) FROM stage3) AS BIGINT)
""",
    tier="T2",
)
def funnel_conversion(spark, sf_dir):
    """Ordered 3-stage funnel (view → click → purchase): users whose first
    click follows their first view, and first purchase follows that click.

    Scale note: each stage is a keyed MIN aggregate + broadcast-join of the
    (small) qualifying-user set onto the stream — never a per-user sort.
    """
    e = load(spark, sf_dir, "events")

    def first_after(etype, prev):
        cond = e.filter(F.col("event_type") == etype)
        if prev is None:
            return cond.groupBy("user_id").agg(F.min("ts").alias("t"))
        joined = cond.join(F.broadcast(prev), "user_id").filter(
            F.col("ts") > F.col("t")
        )
        return joined.groupBy("user_id").agg(F.min("ts").alias("t"))

    s1 = first_after("view", None)
    s2 = first_after("click", s1)
    s3 = first_after("purchase", s2)
    out = None
    for name, s in [("view", s1), ("view>click", s2), ("view>click>purchase", s3)]:
        d = s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )
        out = d if out is None else out.unionByName(d)
    return out


@register(
    "cohort_retention",
    oracle="""
WITH cohorts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, c.cohort_day,
         date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN cohorts c ON e.user_id = c.user_id
)
SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
WHERE day_offset IN (0, 1, 7, 14)
GROUP BY cohort_day, day_offset
""",
    tier="T2",
)
def cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, counted active at
    day offsets 0/1/7/14 — the classic retention triangle.

    Scale note: cohort table is per-user (small), broadcast back onto the
    stream; the distinct is keyed by (user, offset) so it partial-aggregates.
    """
    e = load(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        e.join(F.broadcast(cohorts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").isin(0, 1, 7, 14))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "seq_pattern_match",
    oracle="""
WITH j AS (
  SELECT user_id,
         STRING_AGG(UPPER(SUBSTR(event_type, 1, 1)), '' ORDER BY ts, event_id)
           AS journey
  FROM events GROUP BY user_id
)
SELECT user_id, LENGTH(journey) AS journey_len,
       LENGTH(REGEXP_EXTRACT(journey, 'VC*P', 0)) > 0 AS converted,
       LEN(REGEXP_EXTRACT_ALL(journey, 'VC*P')) AS n_conversions
FROM j
""",
    tier="T2",
)
def seq_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-lite: encode each user's event stream as a character
    journey (V=view C=click P=purchase S=signup E=error, ordered by ts with
    event_id tiebreak) and regex-match behavioural patterns — here
    'VC*P' = view, any clicks, purchase.

    Scale note: sequence analysis collapses to ONE groupBy + string ops —
    no self-joins per step (compare funnel_conversion's 3 joins). Journeys
    are bounded per user; for power users cap with slice() before joining.
    The regex runs identically under Java regex and RE2 (no backrefs).
    """
    e = load(spark, sf_dir, "events")
    chr1 = F.upper(F.substring("event_type", 1, 1))
    j = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ts"), F.col("event_id"), chr1.alias("c")))
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("journey")
    )
    return j.select(
        "user_id",
        F.length("journey").alias("journey_len"),
        (F.length(F.regexp_extract("journey", "VC*P", 0)) > 0).alias("converted"),
        F.size(F.expr("regexp_extract_all(journey, 'VC*P', 0)")).cast("bigint").alias(
            "n_conversions"
        ),
    )


@register(
    "win_activity_streaks",
    oracle="""
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
runs AS (
  SELECT user_id, day,
         date_diff('day', DATE '2024-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM daily
),
streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM runs GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY user_id
""",
    tier="T2",
)
def win_activity_streaks(spark, sf_dir):
    """Longest consecutive-active-day streak per user — the canonical
    gaps-and-islands shape (day index minus row_number is constant within a
    run). Pure integer output, so parity is exact.

    Scale note: one distinct + two aggregations, all partitioned by
    user_id — a single shuffle key end-to-end; no self-joins, no windows
    wider than the per-user day list.
    """
    e = load(spark, sf_dir, "events")
    daily = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = daily.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = runs.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


_ATTRIB_SQL = """
WITH t AS (
  SELECT user_id, ts, event_type AS channel,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type IN ('click', 'view')
),
td AS (SELECT user_id, ts, channel FROM t WHERE rn = 1),
p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
a AS (
  SELECT p.user_id, p.value, td.channel
  FROM p ASOF LEFT JOIN td ON p.user_id = td.user_id AND p.ts >= td.ts
)
SELECT COALESCE(channel, 'none') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM a GROUP BY 1
"""


@register("funnel_attribution_last_touch", oracle=_ATTRIB_SQL, tier="T2")
def funnel_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: every purchase is credited to the
    user's latest click/view AT-OR-BEFORE it (no prior touch → 'none'),
    then revenue rolls up per channel — the conversion-credit report every
    product-analytics stack ships. The DuckDB oracle uses its NATIVE
    `ASOF LEFT JOIN`; the Spark side is the union-tag running-window asof
    (Spark has no native asof) — the hash match proves the two engines'
    asof semantics line up, including purchases exactly AT a touch
    timestamp (touch wins: at-or-before inclusive).

    Determinism: touches dedupe to one per (user, ts) (max event_id), so
    equal-ts tie-breaks are pinned on both sides; revenue sums exact
    integer cents (NULL purchase values counted but not summed, both
    engines).

    Scale notes: one shuffle on user_id for the tagged union + window,
    one partial+final aggregate on the (tiny-cardinality) channel key —
    the event stream is scanned once, no join fan-out.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    wdup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    touches = (
        e.filter(F.col("event_type").isin("click", "view"))
        .withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("event_type").alias("channel"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    tagged = purchases.select(
        "user_id", "ts", "value", F.lit(1).alias("is_p"), F.lit(None).cast("string").alias("ch")
    ).unionByName(
        touches.select(
            "user_id", "ts", F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_p"), F.col("channel").alias("ch"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        tagged.withColumn("channel", F.last("ch", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select(F.coalesce(F.col("channel"), F.lit("none")).alias("channel"), "value")
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "revenue_cents"
        ),
    )


@register(
    "seq_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
FROM pairs
""",
    tier="T2",
)
def seq_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the event stream: for each
    (prev_type -> next_type) bigram of a user's time-ordered events, the
    transition count and row-normalized probability — the input to
    next-action prediction and anomalous-flow detection.

    Determinism: prob is an exact-integer ratio (two BIGINT counts cast to
    DOUBLE, one IEEE division) — no float accumulation, so any partitioning
    gives bit-identical output in both engines.

    Scale note: one shuffle on user_id feeds the lag window (per-user
    sequences are independent); the bigram aggregate then reduces to at most
    |event_types|^2 rows, so the second window (row normalization) runs on a
    trivially small table. At 100 TB the transition matrix is still tiny —
    partial aggregation does all the work map-side.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wn).cast("double")).alias("prob"),
    )


_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', (SELECT MIN(CAST(ts AS DATE)) FROM events),
                       CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
  FROM events
),
firsts AS (SELECT user_id, MIN(wk) AS first_wk FROM uw GROUP BY user_id),
lagged AS (
  SELECT uw.user_id, uw.wk, f.first_wk,
         EXISTS (SELECT 1 FROM uw p
                 WHERE p.user_id = uw.user_id AND p.wk = uw.wk - 1)
           AS active_prev
  FROM uw JOIN firsts f ON f.user_id = uw.user_id
),
status AS (
  SELECT wk,
         CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(SUM(CASE WHEN wk > first_wk AND active_prev THEN 1 ELSE 0 END)
              AS BIGINT) AS retained,
         CAST(SUM(CASE WHEN wk > first_wk AND NOT active_prev THEN 1 ELSE 0
                  END) AS BIGINT) AS resurrected
  FROM lagged GROUP BY wk
),
churn AS (
  SELECT uw.wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS churned
  FROM uw
  WHERE NOT EXISTS (SELECT 1 FROM uw n
                    WHERE n.user_id = uw.user_id AND n.wk = uw.wk + 1)
  GROUP BY uw.wk + 1
)
SELECT s.wk, s.new_users, s.retained, s.resurrected,
       COALESCE(c.churned, 0) AS churned_from_prev
FROM status s LEFT JOIN churn c ON c.wk = s.wk
"""


@register("seq_growth_accounting", oracle=_GROWTH_SQL, tier="T2")
def seq_growth_accounting(spark, sf_dir):
    """Weekly growth accounting — the canonical DAU/MAU decomposition
    (Social Capital framing): each week's active users split into NEW
    (first-ever week), RETAINED (active last week too) and RESURRECTED
    (returning after a gap), plus CHURNED-from-previous-week (active in
    w−1, absent in w) — the identity active_w = new + retained +
    resurrected and active_{w-1} = retained + churned that every growth
    dashboard reconciles against.

    Determinism: weeks are integer 7-day buckets from the corpus min date
    (engine-independent day arithmetic, not ISO weeks — Spark and DuckDB
    disagree on week-of-year numbering); all outputs exact counts. The
    prev-week flag is a self-join on (user, wk−1) over the DISTINCT
    user-week table, which Catalyst plans as a left-semi hash join — not
    a window, since weeks with gaps break frame adjacency.

    Scale note: everything keys on user_id (distinct user-weeks, firsts,
    the wk−1 semi join) — one shuffle family; per-week sums are tiny.
    """
    e = load(spark, sf_dir, "events")
    lo = e.agg(F.min(F.col("ts").cast("date")).alias("lo"))
    uw = (
        e.crossJoin(F.broadcast(lo))
        .select(
            "user_id",
            (F.datediff(F.col("ts").cast("date"), F.col("lo")) / 7)
            .cast("long")
            .alias("wk"),
        )
        .distinct()
    )
    firsts = uw.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = uw.select("user_id", (F.col("wk") + 1).alias("wk"), F.lit(1).alias("was_prev"))
    lagged = (
        uw.join(firsts, "user_id")
        .join(prev, ["user_id", "wk"], "left")
        .select(
            "user_id",
            "wk",
            "first_wk",
            F.col("was_prev").isNotNull().alias("active_prev"),
        )
    )
    status = lagged.groupBy("wk").agg(
        F.sum(F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(
            F.when((F.col("wk") > F.col("first_wk")) & F.col("active_prev"), 1).otherwise(0)
        )
        .cast("long")
        .alias("retained"),
        F.sum(
            F.when(
                (F.col("wk") > F.col("first_wk")) & ~F.col("active_prev"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("resurrected"),
    )
    nxt = uw.select("user_id", (F.col("wk") - 1).alias("wk"), F.lit(1).alias("has_next"))
    churn = (
        uw.join(nxt, ["user_id", "wk"], "left")
        .filter(F.col("has_next").isNull())
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    return (
        status.join(churn, "wk", "left")
        .select(
            "wk",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).cast("long").alias("churned_from_prev"),
        )
    )


_LTV_SQL = """
WITH lo AS (SELECT MIN(CAST(ts AS DATE)) AS lo FROM events),
firsts AS (
  SELECT user_id,
         CAST(datediff('day', lo.lo, MIN(CAST(ts AS DATE))) // 7 AS BIGINT)
           AS cohort_wk
  FROM events CROSS JOIN lo
  WHERE event_type = 'signup' GROUP BY user_id, lo.lo
),
rev AS (
  SELECT e.user_id,
         CAST(datediff('day', lo.lo, CAST(e.ts AS DATE)) // 7 AS BIGINT) AS wk,
         CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events e CROSS JOIN lo
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
  GROUP BY e.user_id, 2
),
cohort_rev AS (
  SELECT f.cohort_wk, r.wk - f.cohort_wk AS age_wk,
         CAST(SUM(r.c) AS BIGINT) AS wk_cents
  FROM firsts f JOIN rev r ON r.user_id = f.user_id
  WHERE r.wk >= f.cohort_wk
  GROUP BY f.cohort_wk, r.wk - f.cohort_wk
),
sizes AS (
  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM firsts GROUP BY cohort_wk
)
SELECT cr.cohort_wk, cr.age_wk, s.cohort_users,
       CAST(SUM(cr.wk_cents) OVER (PARTITION BY cr.cohort_wk
                                   ORDER BY cr.age_wk
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS BIGINT)
         AS cum_cents,
       FLOOR(CAST(SUM(cr.wk_cents) OVER (PARTITION BY cr.cohort_wk
                                         ORDER BY cr.age_wk
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW) AS DOUBLE)
             / s.cohort_users + 0.5) / 100 AS ltv_per_user
FROM cohort_rev cr JOIN sizes s ON s.cohort_wk = cr.cohort_wk
"""


@register("seq_cohort_ltv", oracle=_LTV_SQL, tier="T2")
def seq_cohort_ltv(spark, sf_dir):
    """Cohort LTV curves: cumulative purchase revenue per signup-week
    cohort by weeks-since-signup, normalized per cohort user — the
    payback-period table (which week does a cohort's LTV cross
    acquisition cost?) that pairs with cohort_retention's activity view.
    Post-signup revenue only (r.wk ≥ cohort week), so pre-signup
    purchases never pollute the curve.

    Determinism: integer 7-day buckets from the corpus min date (the
    growth-accounting convention); weekly cents are exact; the cumulative
    sum runs over a total (cohort, age) order; LTV-per-user is ONE
    division of exact ints, half-up to cents.

    Scale note: firsts and weekly revenue both reduce on user_id (one
    shuffle family), the cohort join is user-keyed, and the running sum
    partitions by cohort — no global window; cohort×age output is
    calendar-bounded.
    """
    e = load(spark, sf_dir, "events")
    lo = e.agg(F.min(F.col("ts").cast("date")).alias("lo"))
    firsts = (
        e.filter(F.col("event_type") == "signup")
        .crossJoin(F.broadcast(lo))
        .groupBy("user_id")
        .agg(
            (F.datediff(F.min(F.col("ts").cast("date")), F.first("lo")) / 7)
            .cast("long")
            .alias("cohort_wk")
        )
    )
    rev = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .crossJoin(F.broadcast(lo))
        .groupBy(
            "user_id",
            (F.datediff(F.col("ts").cast("date"), F.col("lo")) / 7)
            .cast("long")
            .alias("wk"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("c"))
    )
    cohort_rev = (
        firsts.join(rev, "user_id")
        .filter(F.col("wk") >= F.col("cohort_wk"))
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_wk"))
        .agg(F.sum("c").cast("long").alias("wk_cents"))
    )
    sizes = firsts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_wk")
        .orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cohort_rev.join(F.broadcast(sizes), "cohort_wk")
        .select(
            "cohort_wk",
            "age_wk",
            "cohort_users",
            F.sum("wk_cents").over(w).cast("long").alias("cum_cents"),
        )
        .select(
            "cohort_wk",
            "age_wk",
            "cohort_users",
            "cum_cents",
            (
                F.floor(
                    F.col("cum_cents").cast("double") / F.col("cohort_users")
                    + F.lit(0.5)
                )
                / 100
            ).alias("ltv_per_user"),
        )
    )


_RFM_SQL = """
WITH mx AS (SELECT MAX(ts) AS now FROM events),
per_user AS (
  SELECT e.user_id,
         CAST(datediff('day', MAX(e.ts), mx.now) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events e CROSS JOIN mx
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
  GROUP BY e.user_id, mx.now
),
scored AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY recency_days DESC, user_id) AS r,
         NTILE(5) OVER (ORDER BY frequency, user_id) AS f,
         NTILE(5) OVER (ORDER BY monetary_cents, user_id) AS m
  FROM per_user
)
SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS example_user
FROM scored GROUP BY r, f, m
"""


@register("seq_rfm_scores", oracle=_RFM_SQL, tier="T2")
def seq_rfm_scores(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary quintiles) — the
    classic CRM scoring grid: each purchasing user gets 1-5 quintile
    scores on days-since-last-purchase (5 = most recent), purchase count
    and lifetime cents, and the key reports the populated (r, f, m) cells
    with sizes — champions are (5,5,5), at-risk big spenders (1,·,5),
    etc. Anchored on the corpus max timestamp so the scores are
    snapshot-reproducible.

    Determinism: NTILE is deterministic because every ORDER BY carries
    user_id as a total-order tiebreak (bare metric ordering would be
    partition-dependent under ties); metrics are exact ints. Scale note:
    one user_id aggregate, then three DISTRIBUTED two-phase ranks over
    the per-user table (ops/dist_rank.py — bucket keys −recency /
    frequency / monetary coarsen each total order; quintile =
    ntile_from_rank, bit-identical to NTILE) — never an unpartitioned
    O(users) window; the user count is one broadcast scalar and cell
    aggregation is tiny (≤125 rows).
    """
    e = load(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("now"))
    per_user = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.first("now").cast("date"), F.max(F.col("ts")).cast("date")
            )
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    n1 = per_user.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = per_user.crossJoin(F.broadcast(n1))
    for rank_col, bucket_key, order_cols in (
        ("_rr", -F.col("recency_days"), [F.col("recency_days").desc(), "user_id"]),
        ("_rf", F.col("frequency"), ["frequency", "user_id"]),
        ("_rm", F.col("monetary_cents"), ["monetary_cents", "user_id"]),
    ):
        ranked = distributed_prefix(ranked, bucket_key, order_cols, rank=rank_col)
    scored = ranked.select(
        "user_id",
        ntile_from_rank(F.col("_rr"), F.col("_n"), 5).alias("r"),
        ntile_from_rank(F.col("_rf"), F.col("_n"), 5).alias("f"),
        ntile_from_rank(F.col("_rm"), F.col("_n"), 5).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("user_id").cast("long").alias("example_user"),
    )


_PATHS_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(CASE WHEN pts IS NULL
                  OR datediff('second', pts, ts) > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM ordered
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) FILTER (
           WHERE rn <= 5) AS path
  FROM (
    SELECT user_id, sid, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, sid
                              ORDER BY ts, event_id) AS rn
    FROM sess
  )
  GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 10
"""


@register("seq_top_paths", oracle=_PATHS_SQL, tier="T2")
def seq_top_paths(spark, sf_dir):
    """Top user-journey paths: sessionize (30-min inactivity gap), take
    each session's first 5 event types in order as its PATH signature,
    and rank the ten most common journeys — the navigation-flow /
    funnel-discovery query (the tabular core of a Sankey diagram).

    Determinism: session ids come from the gaps-and-islands cumulative
    sum over the total (ts, event_id) order; the path string aggregates
    in that same order (Spark spells the ordered string_agg as
    array_join(collect-sorted)); the top-10 cut is the total
    (count DESC, path) order. Scale note: one user_id shuffle serves the
    lag, the island sum and the rank; path aggregation shuffles
    (user, session); the final top-10 is a TakeOrderedAndProject.
    """
    e = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("pts", F.lag("ts").over(w_u))
        .withColumn(
            "new_s",
            F.when(
                F.col("pts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("pts") > 1800),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    w_s = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    paths = (
        sess.withColumn("rn", F.row_number().over(w_s))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(ts, event_id,"
                    " event_type))), v -> v.event_type)"
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


_FIRST_TOUCH_SQL = """
WITH base AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS es,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
         CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 END AS code,
         value
  FROM events WHERE event_type IN ('purchase', 'click', 'view')
),
w AS (
  SELECT user_id, es, is_p, value,
         MIN(CASE WHEN is_p = 0 THEN es * 4 + code END)
           OVER (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS packed
  FROM base
)
SELECT COALESCE(CASE packed % 4 WHEN 1 THEN 'click' WHEN 2 THEN 'view' END,
                'none') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM w WHERE is_p = 1
GROUP BY 1
"""


@register("funnel_attribution_first_touch", oracle=_FIRST_TOUCH_SQL, tier="T2")
def funnel_attribution_first_touch(spark, sf_dir):
    """First-touch attribution with a 7-day lookback: every purchase is
    credited to the user's EARLIEST click/view in the preceding week —
    the discovery-credit counterpart of funnel_attribution_last_touch
    (the two bracket the multi-touch debate; comparing their channel
    totals is the classic MMM sanity check). The lookback bound is what
    makes first-touch meaningful at scale: an unbounded first touch is
    just 'the oldest event ever'.

    Determinism: implemented as a VALUE-BASED range frame (epoch seconds,
    7-day RANGE preceding) over the tagged event union — range frames
    include ALL equal-timestamp peers in both engines, so purchase/touch
    ties need no row-order pin; the earliest touch is the MIN of a packed
    (epoch·4 + channel-code) int64, which also pins equal-second channel
    ties (click < view). Revenue is exact cents.

    Scale note: one user_id shuffle for the range window over the event
    stream, one channel-key aggregate — the same single-pass shape as
    last-touch, no join.
    """
    e = load(spark, sf_dir, "events")
    base = e.filter(
        F.col("event_type").isin("purchase", "click", "view")
    ).select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .alias("code"),
        "value",
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-604800, 0)
    )
    w = base.withColumn(
        "packed",
        F.min(
            F.when(F.col("is_p") == 0, F.col("es") * 4 + F.col("code"))
        ).over(wr),
    )
    return (
        w.filter(F.col("is_p") == 1)
        .select(
            F.coalesce(
                F.when(F.col("packed") % 4 == 1, "click").when(
                    F.col("packed") % 4 == 2, "view"
                ),
                F.lit("none"),
            ).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


@register(
    "seq_time_to_convert",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT user_id,
         (epoch_us(first_purchase) - epoch_us(first_signup)) // 60000000 AS delay_min
  FROM firsts
  WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_signup
)
SELECT CAST(delay_min // 60 AS BIGINT) AS delay_hours,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(delay_min) AS BIGINT) AS min_delay_min,
       CAST(MAX(delay_min) AS BIGINT) AS max_delay_min
FROM conv GROUP BY delay_min // 60
""",
    tier="T2",
)
def seq_time_to_convert(spark, sf_dir):
    """Signup→purchase conversion-latency histogram: per user the delay
    from first signup to first purchase at-or-after it, whole minutes by
    integer epoch-microsecond floor division (never float), bucketed into
    hours. The funnel-analytics staple for "how long does activation
    take" — and the integer-exact spelling of it.

    Scale note: one groupBy(user_id) with conditional MIN aggregates (the
    two firsts come from the same partial-aggregated pass — no self-join,
    no window), then a tiny hour-bucket aggregate. At 100 TB this is two
    map-side-combinable shuffles, the second over at most a few thousand
    buckets.
    """
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("fs"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    conv = firsts.filter(
        F.col("fs").isNotNull() & F.col("fp").isNotNull() & (F.col("fp") >= F.col("fs"))
    ).select(
        F.expr("(unix_micros(fp) - unix_micros(fs)) DIV 60000000")
        .cast("long")
        .alias("delay_min")
    )
    return (
        conv.groupBy(F.expr("delay_min DIV 60").cast("long").alias("delay_hours"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("delay_min").cast("long").alias("min_delay_min"),
            F.max("delay_min").cast("long").alias("max_delay_min"),
        )
    )


# ------------------------------------------------------- DAU/MAU stickiness

_STICKY_SQL = """
WITH dau AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
mau AS (
  SELECT date_trunc('month', CAST(ts AS DATE)) AS month,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
monthly AS (
  SELECT date_trunc('month', day) AS month,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM dau GROUP BY 1
)
SELECT CAST(m.month AS DATE) AS month, m.n_days, u.mau,
       sum_dau // m.n_days AS avg_dau,
       (sum_dau * 1000000) // (m.n_days * u.mau) AS stickiness_micro
FROM monthly m JOIN mau u USING (month)
ORDER BY month
"""


@register("seq_user_stickiness", oracle=_STICKY_SQL, tier="T2")
def seq_user_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per calendar month: mean daily-active over
    monthly-active users — the engagement ratio product teams track (1.0 =
    every monthly user shows up every day). Reported with the observed day
    count so partial first/last months read honestly.

    Determinism: PURE int64 — stickiness_micro = Σdau·1e6 DIV (days·mau),
    all operands non-negative (DIV ≡ //). Months come from date_trunc on
    DATE values (identical bucketing in both engines; the dayofweek-class
    hazard does not apply to month boundaries).

    Scale: two COUNT(DISTINCT) rollups (day grain, month grain) — each one
    shuffle on user hash then a cheap re-agg; the month join is a
    broadcast of ≤ a few hundred rows at any horizon.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    dau = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    mau = e.groupBy(
        F.date_trunc("month", F.col("ts").cast("date")).cast("date").alias("month")
    ).agg(F.count_distinct("user_id").cast("long").alias("mau"))
    monthly = dau.groupBy(
        F.date_trunc("month", F.col("day")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    return (
        monthly.join(F.broadcast(mau), "month")
        .select(
            "month",
            "n_days",
            "mau",
            F.expr("sum_dau DIV n_days").alias("avg_dau"),
            F.expr("(sum_dau * 1000000) DIV (n_days * mau)").alias(
                "stickiness_micro"
            ),
        )
        .orderBy("month")
    )


# ------------------------------------------------- inter-arrival histogram

_INTERARRIVAL_SQL = """
WITH es AS (
  SELECT user_id, event_type, event_id,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS es
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
gaps AS (
  SELECT event_type,
         es - lag(es) OVER (PARTITION BY user_id, event_type
                            ORDER BY es, event_id) AS gap_s
  FROM es
),
b AS (
  SELECT event_type,
         CASE WHEN gap_s <= 0 THEN -1
              ELSE CAST(length(bin(gap_s)) - 1 AS BIGINT) END AS bucket,
         gap_s
  FROM gaps WHERE gap_s IS NOT NULL
)
SELECT event_type, bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM b
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


@register("seq_interarrival_hist", oracle=_INTERARRIVAL_SQL, tier="T2")
def seq_interarrival_hist(spark, sf_dir):
    """Inter-arrival-time distribution per event type: the gap in seconds
    between a user's consecutive events of the same type, bucketed into
    power-of-two bins — the log-scale histogram that separates burst
    behaviour (sub-minute bins) from periodic return visits (hour/day
    bins) and feeds session-timeout tuning.

    Determinism: gaps are exact integer epoch-second differences over the
    total order (es, event_id); the log2 bucket is the INTEGER floor-log2
    `length(bin(gap)) − 1` (the sketch_hll_portable recipe — never
    floor(ln/ln2), whose 1-ulp libm divergence flips exact powers of two);
    zero gaps (same-second repeats) get their own −1 bin explicitly.

    Scale: one shuffle on (user, type) for the lag window, then a
    partial+final aggregate on ~5·64 (type, bucket) cells.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    es = e.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    gaps = es.select(
        "event_type", (F.col("es") - F.lag("es").over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    b = gaps.select(
        "event_type",
        F.expr(
            """CASE WHEN gap_s <= 0 THEN -1
                    ELSE CAST(length(bin(gap_s)) - 1 AS BIGINT) END"""
        ).alias("bucket"),
        "gap_s",
    )
    return (
        b.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("event_type", "bucket")
    )


_GAPS_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS eday
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
isl AS (
  SELECT user_id, eday,
         eday - row_number() OVER (PARTITION BY user_id ORDER BY eday) AS grp
  FROM days
)
SELECT user_id,
       CAST(MIN(eday) AS BIGINT) AS start_eday,
       CAST(MAX(eday) AS BIGINT) AS end_eday,
       CAST(COUNT(*) AS BIGINT) AS len_days,
       CAST(MIN(eday) - lag(MAX(eday)) OVER (PARTITION BY user_id
                                             ORDER BY MIN(eday)) - 1
            AS BIGINT) AS gap_before_days
FROM isl
GROUP BY user_id, grp
"""


@register("win_gaps_islands", oracle=_GAPS_ISLANDS_SQL, tier="T2")
def win_gaps_islands(spark, sf_dir):
    """Gaps-and-islands DETAIL table: one row per consecutive-day activity
    run (island) per user — start/end epoch day, length, and the gap that
    preceded it — via the classic eday − row_number() constant-group key.
    [[win_activity_streaks]] is this relation's per-user rollup; the
    island grain is what re-engagement analysis actually joins against
    (which campaigns landed inside the gap before a user came back?).

    Determinism: PURE int64 — epoch days (NTZ-safe date cast), integer
    group keys, and gap_before = this island's start − previous island's
    end − 1 via a lag window over the per-user island sequence (NULL for
    each user's first island in both engines). NULL user/ts rows are
    excluded before any window (the null_event probe class).

    Scale: one (user, day) distinct shuffle, then windows and aggregates
    all partitioned by user — a single shuffle key end-to-end, AQE
    coalesces the rest.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    days = e.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("eday"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("eday")
    isl = days.withColumn("grp", F.col("eday") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(
        F.min("eday").cast("long").alias("start_eday"),
        F.max("eday").cast("long").alias("end_eday"),
        F.count(F.lit(1)).cast("long").alias("len_days"),
    )
    wseq = Window.partitionBy("user_id").orderBy("start_eday")
    return runs.select(
        "user_id",
        "start_eday",
        "end_eday",
        "len_days",
        (F.col("start_eday") - F.lag("end_eday").over(wseq) - 1)
        .cast("long")
        .alias("gap_before_days"),
    )


_SESSION_ENTROPY_SQL = """
WITH cnts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
              AS BIGINT) AS sum_u
  FROM cnts GROUP BY user_id
)
SELECT user_id, n, n_types,
       CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) - sum_u // n
         AS ent_micronats
FROM per_user
"""


@register("seq_session_entropy", oracle=_SESSION_ENTROPY_SQL, tier="T2")
def seq_session_entropy(spark, sf_dir):
    """Per-user Shannon entropy (micro-nats) of the event-type mix — the
    behavioral-diversity score: 0 means a single-action user (bot-like or
    dormant), high entropy means the user exercises the whole product
    surface. The user-behavior sibling of [[text_char_entropy]].

    Determinism: H = ln(n) − (Σ c·ln c)/n with each ln floored to int64
    micro-nat units BEFORE the per-user sum (exact integer arithmetic
    after the quantized log calls, aggregation-order independent); ent ≥ 0
    structurally so the single DIV is non-negative. NULL user/event_type
    rows are excluded on both sides (the null_event probe class).

    Scale: one map-side-combinable (user, type) count, one hash aggregate
    on user — the shuffle is O(users·|event types|), not O(events).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    cnts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_user = cnts.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(
            F.col("c")
            * F.floor(F.log(F.col("c").cast("double")) * 1000000).cast("long")
        )
        .cast("long")
        .alias("sum_u"),
    )
    return per_user.select(
        "user_id",
        "n",
        "n_types",
        (
            F.floor(F.log(F.col("n").cast("double")) * 1000000).cast("long")
            - F.expr("sum_u DIV n")
        ).alias("ent_micronats"),
    )


_CHURN_HAZARD_SQL = """
WITH spans AS (
  SELECT user_id,
         (MAX(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
          - MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))) // 7
           AS last_week
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
),
per_week AS (
  SELECT last_week AS week, CAST(COUNT(*) AS BIGINT) AS churned
  FROM spans GROUP BY last_week
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM spans),
haz AS (
  SELECT week, churned,
         tot.n_users
           - (SUM(churned) OVER (ORDER BY week ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) - churned)
           AS at_risk
  FROM per_week CROSS JOIN tot
)
SELECT CAST(week AS BIGINT) AS week, churned,
       CAST(at_risk AS BIGINT) AS at_risk,
       CAST(churned * 1000000 // at_risk AS BIGINT) AS hazard_micro
FROM haz
"""


@register("seq_churn_hazard", oracle=_CHURN_HAZARD_SQL, tier="T2")
def seq_churn_hazard(spark, sf_dir):
    """Discrete-time churn hazard by tenure week: a user's tenure is
    (last activity − first activity) in weeks, "churn at week k" = last
    seen in tenure week k; hazard(k) = churned(k) / at-risk(k) where
    at-risk is everyone whose final week is ≥ k — the life-table view of
    retention that [[stats_survival_km]] computes at the event grain,
    here at the product-analytics user grain.

    Determinism: PURE int64 — tenure weeks from epoch-day arithmetic
    (DIV 7 on a non-negative span), at-risk via one cumulative-sum window
    (total − churned-before), hazards one non-negative micro `//`.
    NULL user/ts excluded on both sides.

    Scale: one user-hash aggregate (map-side combinable min/max), a
    |weeks|-row window, and a 1-row total broadcast — the life table is
    O(max tenure) rows regardless of corpus size.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    eday = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    # integer DIV, not float /7 — the seq_time_to_convert x.9999 hazard
    spans = e.groupBy("user_id").agg(
        ((F.max(eday) - F.min(eday)).cast("long")).alias("span_days")
    ).select("user_id", F.expr("span_days DIV 7").alias("last_week"))
    per_week = spans.groupBy(F.col("last_week").alias("week")).agg(
        F.count(F.lit(1)).cast("long").alias("churned")
    )
    tot = spans.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    wcum = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    haz = per_week.crossJoin(F.broadcast(tot)).select(
        "week",
        "churned",
        (
            F.col("n_users")
            - (F.sum("churned").over(wcum) - F.col("churned"))
        ).alias("at_risk"),
    )
    return haz.select(
        F.col("week").cast("long").alias("week"),
        "churned",
        F.col("at_risk").cast("long").alias("at_risk"),
        F.expr("CAST(churned * 1000000 DIV at_risk AS BIGINT)").alias(
            "hazard_micro"
        ),
    )
