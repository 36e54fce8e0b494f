"""§2.E — window functions. Every window orders by a total key (§2.0 r4/5).

Scale notes: windows partitioned by user/customer/brand shuffle once on the
partition key and sort within partitions — the same plan shape at any scale.
Global-order keys (win_ntile, win_percent_rank here; sort_multi_nulls in
sorts.py) use the distributed two-phase rank (ops/dist_rank.py), never an
unpartitioned window (guarded registry-wide by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import cents, rnd, sql_cents, sql_rnd
from ..io import load
from ..ops.dist_rank import distributed_prefix, ntile_from_rank
from ..registry import register


@register(
    "win_row_number_topk",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    tier="T1",
)
def win_row_number_topk(spark, sf_dir):
    """Top-3 orders per customer by (totalprice desc, orderkey) — the
    canonical per-group top-k (also covers the `topk_per_group` key)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_dense",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
""",
    tier="T1",
)
def win_rank_dense(spark, sf_dir):
    """rank + dense_rank of suppliers by balance within nation (rank values
    are deterministic under ties)."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "win_ntile",
    oracle="""
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
FROM customer
""",
    tier="T2",
)
def win_ntile(spark, sf_dir):
    """Quartile bucketing of customers by balance (total order).

    Spelled as NTILE(rank, n) over the distributed two-phase rank
    (ops/dist_rank.py) rather than a global-window ntile: an
    unpartitioned `Window.orderBy` pushes the whole table through one
    reducer, while the rank form is bucket-parallel and bit-identical
    (ntile_from_rank reproduces NTILE's first-(n mod b)-tiles-get-one-
    extra rule in pure int64 arithmetic). Bucket key floor(bal·100) is a
    monotone coarsening of the (c_acctbal, c_custkey) order. The count
    is a broadcast 1-row crossjoin (audited scalar pattern)."""
    c = load(spark, sf_dir, "customer")
    n1 = c.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = distributed_prefix(
        c.crossJoin(F.broadcast(n1)),
        F.floor(F.col("c_acctbal") * 100),
        ["c_acctbal", "c_custkey"],
        rank="_r",
    )
    return ranked.select(
        "c_custkey", ntile_from_rank(F.col("_r"), F.col("_n"), 4).alias("quartile")
    )


@register(
    "win_lag_lead",
    oracle=f"""
SELECT event_id, user_id,
       {sql_rnd('value - lag(value) OVER w', 2)} AS delta_value,
       epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tier="T1",
)
def win_lag_lead(spark, sf_dir):
    """Per-user event-over-event value delta and gap to next event (µs)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        rnd(F.col("value") - F.lag("value").over(w), 2).alias("delta_value"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("gap_us"),
    )


@register(
    "win_running_sum",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM({sql_cents('o_totalprice')}) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
         AS cum_spend
FROM orders
""",
    tier="T1",
)
def win_running_sum(spark, sf_dir):
    """Cumulative customer spend in order-date order (exact integer cents)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(cents(F.col("o_totalprice"))).over(w).cast("double") / F.lit(100)
    return o.select("o_custkey", "o_orderkey", cum.alias("cum_spend"))


@register(
    "win_moving_avg",
    oracle=f"""
SELECT event_id, user_id,
       {sql_rnd(f"CAST(SUM({sql_cents('value')}) OVER w AS DOUBLE) / 100 / COUNT(*) OVER w", 4)}
         AS mavg_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tier="T2",
)
def win_moving_avg(spark, sf_dir):
    """3-row moving average of event value per user (deterministic cents)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    mavg = rnd(
        F.sum(cents(F.col("value"))).over(w).cast("double")
        / F.lit(100)
        / F.count(F.lit(1)).over(w),
        4,
    )
    return e.select("event_id", "user_id", mavg.alias("mavg_value"))


@register(
    "win_range_time",
    oracle=f"""
SELECT event_id, user_id,
       CAST(SUM({sql_cents('value')}) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
         AS trailing_1h_value
FROM events
""",
    tier="T2",
)
def win_range_time(spark, sf_dir):
    """Trailing-1-hour per-user value sum — RANGE frame over epoch-µs."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    tot = F.sum(cents(F.col("value"))).over(w).cast("double") / F.lit(100)
    return e.select("event_id", "user_id", tot.alias("trailing_1h_value"))


@register(
    "win_first_last",
    oracle="""
SELECT event_id, user_id, CAST(ts AS DATE) AS day,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tier="T2",
)
def win_first_last(spark, sf_dir):
    """First/last event type within each user-day (explicit full frame)."""
    e = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    w = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        "day",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@register(
    "win_percent_rank",
    oracle=f"""
SELECT p_partkey,
       {sql_rnd('percent_rank() OVER w', 4)} AS pr,
       {sql_rnd('cume_dist() OVER w', 4)} AS cd
FROM part
WHERE p_size IS NOT NULL
WINDOW w AS (ORDER BY p_size, p_partkey)
""",
    tier="T2",
)
def win_percent_rank(spark, sf_dir):
    """percent_rank + cume_dist over part sizes (total order, 4dp).
    NULL sizes are excluded on both sides — the null-order probe rule: a
    NULL measure must never reach a rank/sort path (Spark NULLS-FIRST-asc
    vs DuckDB NULLS-LAST would shift every rank below it).

    Spelled over the distributed two-phase rank (ops/dist_rank.py)
    instead of a single-reducer global window: the (p_size, p_partkey)
    order is TOTAL (partkey unique), so rank == row_number and the
    closed forms pr = (r−1)/(n−1), cd = r/n are exactly the window
    functions' values (pr = 0 when n = 1, both engines' convention).
    Bucket key p_size coarsens the order; n is a broadcast 1-row
    crossjoin (audited scalar pattern)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size").isNotNull())
    n1 = p.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = distributed_prefix(
        p.crossJoin(F.broadcast(n1)),
        F.col("p_size"),
        ["p_size", "p_partkey"],
        rank="_r",
    )
    n = F.col("_n")
    r = F.col("_r")
    return ranked.select(
        "p_partkey",
        F.when(n > 1, rnd((r - 1).cast("double") / (n - 1), 4))
        .otherwise(F.lit(0.0))
        .alias("pr"),
        rnd(r.cast("double") / n, 4).alias("cd"),
    )


@register(
    "win_running_distinct",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS distinct_types_so_far
FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rk
  FROM events
) t
""",
    tier="T2",
)
def win_running_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) over a window — an operator Spark (and most
    engines) lack natively — rewritten as a composition: mark each row that
    is the FIRST occurrence of its (user, event_type), then running-sum the
    markers in event order. Both engines run the identical rewrite.

    Scale note: two windows, both partitioned by user_id → one shuffle; no
    per-row set state, which is what makes the naive version impossible on
    a 100 TB stream."""
    e = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("rk", F.row_number().over(w_first))
        .withColumn(
            "distinct_types_so_far",
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).over(w_run),
        )
        .select("user_id", "event_id", "distinct_types_so_far")
    )


@register(
    "win_pct_of_total",
    oracle="""
SELECT c_custkey,
       (FLOOR((CAST(cust_c AS DOUBLE) / CAST(seg_c AS DOUBLE)) * 1000000 + 0.5)
        / 1000000) AS pct_of_segment
FROM (
  SELECT c_custkey, c_mktsegment,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cust_c,
         SUM(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)))
           OVER (PARTITION BY c_mktsegment) AS seg_c
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
) t
""",
    tier="T2",
)
def win_pct_of_total(spark, sf_dir):
    """Ratio-to-report: each customer's share of their market segment's
    total spend — an aggregate windowed over the aggregation's own output
    (SUM(SUM(..)) OVER). Both sums are exact integer cents; one division
    per row, half-up to 6dp.

    Scale note: the window partitions by segment over the already-reduced
    per-customer rows — the shuffle input is |customers|, never |orders|."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum(F.floor(F.col("o_totalprice") * F.lit(100) + F.lit(0.5))).alias("cust_c"))
    )
    return per_cust.select(
        "c_custkey",
        (
            F.floor(
                (F.col("cust_c").cast("double") / F.sum("cust_c").over(w).cast("double"))
                * F.lit(1000000)
                + F.lit(0.5)
            )
            / F.lit(1000000)
        ).alias("pct_of_segment"),
    )


@register(
    "win_cume_dist",
    oracle="""
SELECT o_custkey, o_orderkey,
       cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
FROM orders WHERE o_custkey < 100 AND o_totalprice IS NOT NULL
""",
    tier="T2",
)
def win_cume_dist(spark, sf_dir):
    """cume_dist: fraction of partition rows with ORDER BY key <= current —
    the empirical CDF position of every order's price inside its priority
    class. Exact rational k/n in one division, so values are bit-identical
    across engines; ties share a value by definition (no tiebreak needed).

    Scale note: same single sort-per-partition as rank(); the custkey
    filter is pushed to the scan so the window input is already pruned.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") < 100) & F.col("o_totalprice").isNotNull()
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_custkey", "o_orderkey", F.cume_dist().over(w).alias("cd")
    )


@register(
    "win_rolling_distinct_7d",
    oracle="""
WITH daily AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT event_type, day FROM daily
)
SELECT d.event_type, d.day, COUNT(DISTINCT u.user_id) AS users_7d
FROM days d JOIN daily u
  ON d.event_type = u.event_type
 AND u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.event_type, d.day
""",
    tier="T2",
)
def win_rolling_distinct_7d(spark, sf_dir):
    """Trailing-7-day distinct active users per event type and day — the
    rolling-uniques KPI. COUNT(DISTINCT) over a RANGE window is unsupported
    natively; instead of a collect_set window (per-row set state — memory
    blow-up when |users/day| is large, flagged weak-for-scale in VERDICT
    r1), dedup to (type, day, user), explode each row to the ≤7 target
    days it contributes to, and run one two-phase COUNT(DISTINCT). The
    oracle states the same thing as a range self-join.

    Scale note: bounded everywhere — 7× row expansion map-side, shuffle
    keyed (type, target_day), no window state. For approximate needs at
    100 TB the re-aggregable HLL ladder (agg_hll_reaggregate) is cheaper
    still.
    """
    e = load(spark, sf_dir, "events")
    daily = e.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    # Contribution expansion: each (type, day, user) activity row counts
    # toward the trailing-7d distinct of target days day..day+6. Explode to
    # those target days (×7 map-side, no join, no per-row set state), one
    # two-phase COUNT(DISTINCT) keyed (type, target_day) — shuffle is evenly
    # keyed by day, so no event_type hot key.
    contrib = daily.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
    )
    counts = contrib.groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("users_7d")
    )
    # Keep only observed (type, day) combos — the oracle's `days` driver
    # table. Tiny (|types| × |calendar days|): broadcast semi-join.
    days = daily.select("event_type", "day").distinct()
    return counts.join(F.broadcast(days), ["event_type", "day"], "left_semi")


@register(
    "win_rolling_median",
    oracle=f"""
SELECT event_id, user_id,
       median({sql_cents('value')}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100 AS med7_value
FROM events
""",
    tier="T2",
)
def win_rolling_median(spark, sf_dir):
    """Exact 7-row rolling median of event value per user — the
    outlier-robust complement to win_moving_avg. Spark has no exact median
    window function, so the frame is materialized as a sorted integer-cent
    array (collect_list over the ROWS frame + array_sort) and the median
    read positionally: odd count → middle element, even count → mean of
    the two middle elements, mirroring DuckDB's median interpolation
    exactly (both halves are x.0 or x.5 — exact doubles).

    Scale note: same shuffle/sort shape as every keyed window (one
    exchange on user_id); the collected frame is bounded at 7 elements per
    row, so memory is O(frame), not O(partition). For frames of thousands
    of rows you'd switch to the two-heap streaming algorithm inside
    applyInPandas instead of per-row arrays.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    a = F.array_sort(F.collect_list(cents(F.col("value"))).over(w))
    n = F.size(a)
    mid_hi = ((n + 1) / F.lit(2)).cast("int")  # exact: n+1 even when n odd
    lo = (n / F.lit(2)).cast("int")
    # collect_list drops NULLs, so an all-NULL frame is an EMPTY array:
    # guard n = 0 into NULL (DuckDB's median of an all-NULL frame) before
    # any element_at — index 0 is a runtime error, even in Spark
    med_cents = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(a, mid_hi).cast("double"))
        .otherwise((F.element_at(a, lo) + F.element_at(a, lo + 1)) / F.lit(2.0))
    )
    return e.select(
        "event_id", "user_id", (med_cents / F.lit(100)).alias("med7_value")
    )


_ROLLCORR_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS px,
         CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS cy
  FROM events GROUP BY 1
),
f AS (
  SELECT day, COALESCE(px, 0) AS x, COALESCE(cy, 0) AS y FROM daily
),
w AS (
  SELECT day, x, y,
         CAST(COUNT(*) OVER win AS BIGINT) AS n,
         CAST(SUM(x) OVER win AS BIGINT) AS sx,
         CAST(SUM(y) OVER win AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER win AS BIGINT) AS syy
  FROM f
  WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT day, n,
       CASE WHEN n >= 10
             AND (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
             AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
            THEN (FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                        * 10000 + 0.5) / 10000)
       END AS corr30
FROM w
"""


@register("win_rolling_corr", oracle=_ROLLCORR_SQL, tier="T2")
def win_rolling_corr(spark, sf_dir):
    """30-day rolling Pearson correlation between the daily purchase and
    click revenue series — the co-movement monitor a metrics stack uses to
    detect funnel decoupling. NULL until 10 observations or when either
    variance is zero (corr undefined).

    Determinism: the five window moments (Σx, Σy, Σxy, Σx², Σy², n) are
    EXACT int64 sums over integer cents inside one shared ROWS frame —
    partition/order effects cannot move a bit — and the correlation is a
    fixed double expression on those integers with a shared half-up round.
    int64 headroom: daily cents ~1e8 at sf1 → x·y ~1e16 × 30 rows ≈ 3e17
    (~30× headroom at sf1; overflow near SF 5 — quantize x/y to whole
    dollars to extend, same recipe as siblings).

    Scale note: the window runs over the DAILY table (|days| rows — one
    partition is fine and explicitly bounded); the event stream is
    reduced map-side first.
    """
    e = load(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", cent)), F.lit(0)).alias("x"),
        F.coalesce(F.sum(F.when(F.col("event_type") == "click", cent)), F.lit(0)).alias("y"),
    )
    win = Window.orderBy("day").rowsBetween(-29, 0)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    cov = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    corr = F.when(
        (F.col("n") >= 10) & (vx > 0) & (vy > 0),
        F.floor(cov / F.sqrt(vx) / F.sqrt(vy) * 10000 + F.lit(0.5)) / 10000,
    )
    return w.select("day", F.col("n").cast("long").alias("n"), corr.alias("corr30"))


@register(
    "win_skyline_dominance",
    oracle="""
WITH pts AS (
  SELECT p_brand, p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
)
SELECT p.p_brand, p.p_partkey, p.price_cents, p.size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.p_brand = p.p_brand
    AND q.price_cents <= p.price_cents AND q.size >= p.size
    AND (q.price_cents < p.price_cents OR q.size > p.size)
)
""",
    tier="T2",
)
def win_skyline_dominance(spark, sf_dir):
    """Skyline / 2-D Pareto frontier per brand: the parts not DOMINATED by
    any same-brand part that is both cheaper-or-equal and larger-or-equal
    (with at least one strict) — the multi-objective shortlist operator
    (best price-size tradeoffs) that plain top-k cannot express. Spark has
    no skyline primitive; for 2-D it reduces to ONE window pass, and the
    oracle keeps the quadratic NOT EXISTS dominance definition — the hash
    match proves the O(n log n) rewrite implements exactly that semantics.

    Rewrite: sort each brand by price; p is dominated iff (a) some
    strictly-cheaper part has size ≥ p.size — max(size) over the RANGE
    frame ending 1 cent before p — or (b) an equal-priced part has size >
    p.size — max(size) over the (brand, price) partition. Equal
    (price, size) duplicates dominate neither way and all stay on the
    frontier, which the strictness clause pins in both engines.

    Determinism: prices are exact int64 cents (the RANGE frame needs the
    integer key), sizes exact ints — no floats anywhere; NULL price/size
    points are excluded on both sides (a NULL coordinate can neither
    dominate nor be dominated under SQL three-valued logic, but it would
    reach Spark's RANGE-frame sort where the engines' null order differs —
    the null-order probe rule). Scale note: one
    shuffle on p_brand serves both windows (same partition key; the
    equal-price max is a window over a finer key of the same sort order,
    no second exchange), vs the oracle's O(n²)-per-brand self-join —
    the classic skyline result that sorted order makes 2-D dominance a
    running max.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
        )
        .select(
            "p_brand",
            "p_partkey",
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
            F.col("p_size").cast("long").alias("size"),
        )
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy("p_brand", "price_cents")
    return (
        p.withColumn("max_sz_cheaper", F.max("size").over(w_cheaper))
        .withColumn("max_sz_equal", F.max("size").over(w_equal))
        .filter(
            ~(
                (
                    F.col("max_sz_cheaper").isNotNull()
                    & (F.col("max_sz_cheaper") >= F.col("size"))
                )
                | (F.col("max_sz_equal") > F.col("size"))
            )
        )
        .select("p_brand", "p_partkey", "price_cents", "size")
    )


@register(
    "win_anchored_vwap",
    oracle="""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS pv_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem WHERE l_partkey < 200
  GROUP BY l_partkey, CAST(l_shipdate AS DATE)
)
SELECT l_partkey, day,
       CAST(SUM(pv_cents) OVER w AS BIGINT) AS cum_pv_cents,
       CAST(SUM(qty) OVER w AS BIGINT) AS cum_qty,
       FLOOR(CAST(SUM(pv_cents) OVER w AS DOUBLE)
             / CAST(SUM(qty) OVER w AS DOUBLE) + 0.5) / 100 AS vwap
FROM daily
WINDOW w AS (PARTITION BY l_partkey ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tier="T2",
)
def win_anchored_vwap(spark, sf_dir):
    """Anchored VWAP per part: the running volume-weighted average price
    Σ(price)/Σ(qty) from the first shipment onward — the
    execution-quality benchmark (did later shipments price above or below
    the running average?) and the canonical RUNNING-RATIO window: both
    cumulative sums share one frame, and the ratio divides exact
    integers, so the ratio-of-sums never drifts the way a
    running-average-of-ratios would.

    Determinism: both numerator and denominator are exact int64 running
    sums over the total (part, day) order; vwap is ONE division per row,
    half-up to cents. Scale note: one l_partkey shuffle serves the daily
    aggregate and the shared window frame (single Window node); the
    partkey bound is pushed to the scan.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    daily = li.groupBy(
        "l_partkey", F.col("l_shipdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("pv_cents"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "l_partkey",
        "day",
        F.sum("pv_cents").over(w).cast("long").alias("cum_pv_cents"),
        F.sum("qty").over(w).cast("long").alias("cum_qty"),
        (
            F.floor(
                F.sum("pv_cents").over(w).cast("double")
                / F.sum("qty").over(w).cast("double")
                + F.lit(0.5)
            )
            / 100
        ).alias("vwap"),
    )


# -------------------------------------------------------- rolling slope

_RSLOPE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS x
  FROM daily
),
fr AS (
  SELECT event_type, day,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM idx
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       CASE WHEN n * sxy - sx * sy >= 0
              THEN ((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx)
            ELSE -(((sx * sy - n * sxy) * 1000) // (n * sxx - sx * sx))
       END AS slope_milli
FROM fr WHERE n = 14
ORDER BY event_type, day
"""


@register("win_rolling_slope", oracle=_RSLOPE_SQL, tier="T2")
def win_rolling_slope(spark, sf_dir):
    """Rolling 14-day least-squares trend slope (cents/day, milli-units) of
    each event type's daily value total — the windowed regression that turns
    a noisy daily series into a trend signal (positive = growing, the
    magnitude is the daily run rate change). Emitted only for full windows.

    Determinism: x is the per-type day index, y exact int64 daily cents;
    all five frame sums are exact integers (rows-frame, no float), and the
    one divide is negation-guarded (slope can be negative — Spark DIV
    truncates, DuckDB // floors; the text_perplexity_buckets hazard).
    MILLI units keep the worst product n·sxy·1e3 ≈ 1e15 at sf0.1 with
    int64 headroom to ~1000× larger daily totals.

    Scale: one partial+final daily aggregate off the event scan, then two
    windows partitioned BY TYPE over the |types|·|days| table — no
    unpartitioned window, no shuffle beyond the daily rollup. The frame
    sums are O(1) per row (Spark's sliding-frame aggregation), not O(w).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("y")
    )
    idx = daily.select(
        "event_type",
        "day",
        "y",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("x"),
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, Window.currentRow)
    )
    fr = idx.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(wf).cast("long").alias("n"),
        F.sum("x").over(wf).cast("long").alias("sx"),
        F.sum("y").over(wf).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wf).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).cast("long").alias("sxx"),
    )
    return (
        fr.filter(F.col("n") == 14)
        .select(
            "event_type",
            "day",
            F.expr(
                """CASE WHEN n * sxy - sx * sy >= 0
                        THEN ((n * sxy - sx * sy) * 1000) DIV (n * sxx - sx * sx)
                        ELSE -(((sx * sy - n * sxy) * 1000) DIV (n * sxx - sx * sx))
                   END"""
            ).alias("slope_milli"),
        )
        .orderBy("event_type", "day")
    )


# -------------------------------------------------------- decayed sum

_DECAY_SQL = """
WITH mx AS (
  SELECT CAST(MAX(CAST(ts AS DATE)) AS DATE) AS max_day
  FROM events WHERE ts IS NOT NULL
),
aged AS (
  SELECT e.user_id,
         CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS cents,
         LEAST(date_diff('day', CAST(e.ts AS DATE), mx.max_day) // 7, 62)
           AS half_lives
  FROM events e, mx
  WHERE e.value IS NOT NULL AND e.ts IS NOT NULL AND e.user_id IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents >> CAST(half_lives AS INT)) AS BIGINT) AS decayed_cents,
       CAST(SUM(cents) AS BIGINT) AS raw_cents
FROM aged
GROUP BY user_id
ORDER BY decayed_cents DESC, user_id
LIMIT 20
"""


@register("win_decayed_sum", oracle=_DECAY_SQL, tier="T2")
def win_decayed_sum(spark, sf_dir):
    """Exponentially-decayed engagement value per user (half-life = 7
    days): each event contributes value·2^(−⌊age/7⌋) relative to the
    corpus's latest day — the recency-weighted score behind decayed LTV
    and trending-content ranking, where last week counts double vs the
    week before. Top-20 users by decayed value, raw total alongside.

    Determinism: ZERO floats — the decay is a RIGHT SHIFT of exact int64
    cents by the integer half-life count (shift ≡ floor-divide by 2^k on
    non-negative operands, identical in both engines), capped at 62 to
    stay in-range at any horizon. The continuous-decay variant (e^{−λt})
    is [[ts_ewma]]'s fold; the shift spelling keeps the key
    aggregate-only.

    Scale: the global max day is the audited broadcast 1-row scalar
    crossjoin (seq_rfm_scores' shape); everything else is one
    partial+final aggregate on user — the decayed contribution is
    computed IN the map side, so re-aggregation over time windows stays
    mergeable.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    mx = e.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    aged = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(
            "LEAST(datediff(max_day, CAST(ts AS DATE)) DIV 7, 62)"
        ).alias("half_lives"),
    )
    return (
        aged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("shiftright(cents, CAST(half_lives AS INT))"))
            .cast("long")
            .alias("decayed_cents"),
            F.sum("cents").cast("long").alias("raw_cents"),
        )
        .orderBy(F.col("decayed_cents").desc(), "user_id")
        .limit(20)
    )
