"""Time-series operators: multi-granularity rollup (hypertable-style),
forward as-of, and gap-filling resample.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf resolves stringified hints here

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import cents, money_sum, sql_money_sum
from ..io import load
from ..ops.materialize import materialize
from ..registry import register


@register(
    "rollup_time_hierarchy",
    oracle=f"""
SELECT CAST(ts AS DATE) AS day,
       CAST(date_part('hour', ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_money_sum('value')} AS val,
       CAST(GROUPING(CAST(ts AS DATE), date_part('hour', ts)) AS BIGINT) AS gid
FROM events
GROUP BY ROLLUP (CAST(ts AS DATE), date_part('hour', ts))
""",
    tier="T2",
)
def rollup_time_hierarchy(spark, sf_dir):
    """Hypertable-style continuous-aggregate hierarchy: one ROLLUP pass
    produces hourly, daily, and grand-total rollups of the event stream.

    Scale note: a single shuffle feeds all three granularities (Catalyst's
    Expand), exactly how a time-series store maintains its rollup ladder.
    """
    e = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    hour = F.hour("ts").cast("long")
    return (
        e.rollup(day.alias("day"), hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value")).alias("val"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@register(
    "join_asof_forward",
    oracle="""
SELECT event_id, user_id,
       first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_value
FROM events
""",
    tier="T2",
)
def join_asof_forward(spark, sf_dir):
    """Forward as-of: each event picks the user's NEXT purchase value
    at-or-after its timestamp (the time-to-conversion building block;
    mirror of join_asof's backward window)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nv = F.first(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return e.select("event_id", "user_id", nv.alias("next_purchase_value"))


@register(
    "ts_gap_fill",
    oracle=f"""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u,
       LATERAL (SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                              INTERVAL 1 DAY)) AS day
                FROM bounds) g
),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n, {sql_money_sum('value')} AS val
  FROM events WHERE user_id < 50
  GROUP BY 1, 2
)
SELECT grid.user_id, CAST(grid.day AS DATE) AS day,
       COALESCE(daily.n, 0) AS n,
       COALESCE(daily.val, 0.0) AS val
FROM grid LEFT JOIN daily ON grid.user_id = daily.user_id AND CAST(grid.day AS DATE) = daily.day
""",
    tier="T2",
)
def ts_gap_fill(spark, sf_dir):
    """Resample/gap-fill: dense (user × day) grid over the stream's date
    range, missing days filled with zeros (bounded to user_id < 50).

    Scale note: the grid is sequence()+explode — generated, never stored;
    the left join keys on (user, day) so fills shuffle once.
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    bounds = load(spark, sf_dir, "events").agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    users = e.select("user_id").distinct()
    grid = (
        users.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("val"))
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("val", F.lit(0.0)).alias("val"),
    )


@register(
    "ts_ewma",
    oracle="""
SELECT user_id,
       (FLOOR(list_reduce(list(dval ORDER BY day),
                          (acc, x) -> acc * CAST(0.7 AS DOUBLE)
                                      + x * CAST(0.3 AS DOUBLE)) * 10000 + 0.5)
        / 10000) AS ewma
FROM (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
           AS dval
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
) t
GROUP BY user_id
""",
    tier="T2",
)
def ts_ewma(spark, sf_dir):
    """Exponentially weighted moving average (alpha = 0.3) of each user's
    daily value series — the standard smoothing primitive for metric
    monitoring and drift detection over training-data throughput.

    EWMA is a left fold (y_n = 0.7*y_{n-1} + 0.3*x_n), which has no
    closed-form window rewrite that is numerically stable, so both engines
    fold the same day-ordered list: Spark `aggregate()` seeded with the
    first element mirrors DuckDB `list_reduce`, giving the identical IEEE
    operation sequence (determinism per SURVEY.md §2.0).

    Scale note: the fold is per-user over the *daily* aggregate (≤ a few
    thousand elements even for years of history), never the raw events; the
    daily aggregate itself is an exact-cent partial-aggregable sum. One
    shuffle on user_id covers both the collect_list and the groupBy.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(money_sum(F.col("value")).alias("dval"))
    from ..conform import rnd

    return (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "dval"))).alias("s"))
        .withColumn("xs", F.expr("transform(s, v -> v.dval)"))
        .select(
            "user_id",
            rnd(
                F.expr(
                    "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),"
                    " element_at(xs, 1),"
                    " (acc, x) -> acc * CAST(0.7 AS DOUBLE)"
                    " + x * CAST(0.3 AS DOUBLE))"
                ),
                4,
            ).alias("ewma"),
        )
    )


@register(
    "ts_locf",
    oracle=f"""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u,
       LATERAL (SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                              INTERVAL 1 DAY)) AS day
                FROM bounds) g
),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, {sql_money_sum('value')} AS val
  FROM events WHERE user_id < 50
  GROUP BY 1, 2
)
SELECT user_id, day,
       COALESCE(
         LAST_VALUE(val IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         0.0) AS val_ff
FROM (
  SELECT grid.user_id, CAST(grid.day AS DATE) AS day, daily.val
  FROM grid LEFT JOIN daily
    ON grid.user_id = daily.user_id AND CAST(grid.day AS DATE) = daily.day
) t
""",
    tier="T2",
)
def ts_locf(spark, sf_dir):
    """Forward-fill (last observation carried forward) over the dense
    user×day grid: missing days inherit the most recent observed daily
    value instead of zero — the resampling rule for state-like metrics
    (balance, inventory, model-loss) as opposed to flow metrics
    (ts_gap_fill's zero-fill).

    Scale note: LOCF is last(ignorenulls) over a running row frame — one
    shuffle on user_id, linear scan per partition, no self-join. Values are
    exact cent sums so the fill carries bit-identical doubles.
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    bounds = load(spark, sf_dir, "events").agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    grid = (
        e.select("user_id").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        money_sum(F.col("value")).alias("val")
    )
    sparse = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "user_id",
        "day",
        F.coalesce(F.last("val", ignorenulls=True).over(w), F.lit(0.0)).alias("val_ff"),
    )


@register(
    "ts_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, COUNT(*) AS days, SUM(n) AS s1, SUM(n * n) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.n,
       FLOOR((CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.days)
             / NULLIF(sqrt(GREATEST((CAST(s.s2 AS DOUBLE)
                     - CAST(s.s1 AS DOUBLE) * s.s1 / s.days)
                     / NULLIF(s.days - 1, 0), 0)), 0)
             * 10000 + 0.5) / 10000 AS z
FROM daily d JOIN stats s ON d.event_type = s.event_type
WHERE abs((CAST(d.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.days)
          / NULLIF(sqrt(GREATEST((CAST(s.s2 AS DOUBLE)
                  - CAST(s.s1 AS DOUBLE) * s.s1 / s.days)
                  / NULLIF(s.days - 1, 0), 0)), 0)) > 1.5
""",
    tier="T2",
)
def ts_anomaly_zscore(spark, sf_dir):
    """Volume-anomaly detection: days whose per-type event count sits more
    than 1.5 sample standard deviations from that type's mean.

    Determinism: mean and variance are built from EXACT integer sums
    (Σn, Σn², N) with an explicitly-ordered float expression — identical
    IEEE sequence in both engines, unlike the engines' native streaming
    stddev_samp whose partial-merge order varies. z is half-up 4dp.

    Scale note: two cheap aggregations (daily counts, then per-type moment
    sums) + a broadcast join of the tiny stats table back onto daily —
    the fact stream is scanned once.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("s1").cast("double") / F.col("days")
    # try_divide guards: a single-day type (days-1 = 0) or a perfectly flat
    # count series (var = 0) yields NULL z — the row drops out of the >1.5
    # filter in BOTH engines instead of an ANSI DIVIDE_BY_ZERO here and an
    # inf on the DuckDB side.
    var = F.try_divide(
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("days"),
        (F.col("days") - 1).cast("double"),
    )
    # clamp: float cancellation on a near-flat series can make var a tiny
    # negative; unclamped, Spark's sqrt→NaN drops the row while DuckDB sorts
    # NaN above every number and keeps it. GREATEST(var, 0) on both sides
    # collapses that case into the existing var=0 → NULL path.
    z_raw = F.try_divide(
        F.col("n").cast("double") - mean, F.sqrt(F.greatest(var, F.lit(0.0)))
    )
    return (
        j.filter(F.abs(z_raw) > 1.5)
        .select(
            "event_type",
            "day",
            "n",
            (F.floor(z_raw * 10000 + F.lit(0.5)) / 10000).alias("z"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, epoch(ts) AS t,
         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bv,
         last_value(CASE WHEN event_type = 'purchase' THEN epoch(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bt,
         first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fv,
         first_value(CASE WHEN event_type = 'purchase' THEN epoch(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ft
  FROM events
)
SELECT event_id, user_id,
       CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
            WHEN ft IS NULL THEN bv
            WHEN bt IS NULL THEN fv
            WHEN t - bt <= ft - t THEN bv ELSE fv END AS nearest_purchase_value,
       CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
            WHEN ft IS NULL THEN 'b'
            WHEN bt IS NULL THEN 'f'
            WHEN t - bt <= ft - t THEN 'b' ELSE 'f' END AS direction
FROM w
""",
    tier="T2",
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of: each event picks the user's purchase value closest in
    time in EITHER direction (tie → backward), completing the asof family
    (backward join_asof, forward join_asof_forward).

    Same scalable shape as both siblings: one shuffle on the partition key
    and two running windows — no row-multiplying join, no candidate blowup.
    Timestamps compare as epoch seconds (identical in both engines under the
    pinned UTC session).
    """
    e = load(spark, sf_dir, "events")
    t = F.col("ts").cast("long")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    pt = F.when(F.col("event_type") == "purchase", t)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    d = e.select(
        "event_id",
        "user_id",
        t.alias("t"),
        F.last(pv, ignorenulls=True).over(wb).alias("bv"),
        F.last(pt, ignorenulls=True).over(wb).alias("bt"),
        F.first(pv, ignorenulls=True).over(wf).alias("fv"),
        F.first(pt, ignorenulls=True).over(wf).alias("ft"),
    )
    back = (F.col("t") - F.col("bt")) <= (F.col("ft") - F.col("t"))
    val = (
        F.when(F.col("bt").isNull() & F.col("ft").isNull(), F.lit(None))
        .when(F.col("ft").isNull(), F.col("bv"))
        .when(F.col("bt").isNull(), F.col("fv"))
        .when(back, F.col("bv"))
        .otherwise(F.col("fv"))
    )
    dirn = (
        F.when(F.col("bt").isNull() & F.col("ft").isNull(), F.lit(None))
        .when(F.col("ft").isNull(), F.lit("b"))
        .when(F.col("bt").isNull(), F.lit("f"))
        .when(back, F.lit("b"))
        .otherwise(F.lit("f"))
    )
    return d.select(
        "event_id",
        "user_id",
        val.alias("nearest_purchase_value"),
        dirn.alias("direction"),
    )


@register(
    "ts_resample_interp",
    oracle=f"""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
),
grid AS (
  SELECT u.user_id, g.day
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u,
       LATERAL (SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                              INTERVAL 1 DAY)) AS day
                FROM bounds) g
),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, {sql_money_sum('value')} AS val
  FROM events WHERE user_id < 50
  GROUP BY 1, 2
),
sparse AS (
  SELECT grid.user_id, CAST(grid.day AS DATE) AS day, daily.val
  FROM grid LEFT JOIN daily
    ON grid.user_id = daily.user_id AND CAST(grid.day AS DATE) = daily.day
),
ctx AS (
  SELECT user_id, day, val,
         last_value(val IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bv,
         last_value(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bd,
         first_value(val IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fv,
         first_value(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fd
  FROM sparse
)
SELECT user_id, day,
       FLOOR((CASE WHEN val IS NOT NULL THEN val
                   WHEN bv IS NOT NULL AND fv IS NOT NULL THEN
                     bv + (fv - bv) * (CAST(date_diff('day', bd, day) AS DOUBLE)
                                       / CAST(date_diff('day', bd, fd) AS DOUBLE))
                   WHEN bv IS NOT NULL THEN bv
                   WHEN fv IS NOT NULL THEN fv
                   ELSE 0.0 END) * 10000 + 0.5) / 10000 AS val_interp
FROM ctx
""",
    tier="T2",
)
def ts_resample_interp(spark, sf_dir):
    """Linear-interpolation resampling over the dense user×day grid: missing
    days take the straight line between the surrounding observed daily
    values (edges extend the nearest observation; all-null series fill 0) —
    completing the resampling family: zeros (ts_gap_fill), LOCF (ts_locf),
    linear (here).

    Scale note: identical shape to ts_locf — one shuffle on user_id, two
    running window passes (backward + forward context), no self-join. The
    interpolation arithmetic is one fixed IEEE expression over exact-cent
    endpoint values, so both engines emit bit-identical doubles before the
    shared half-up 4dp round.
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    bounds = load(spark, sf_dir, "events").agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    grid = (
        e.select("user_id").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        money_sum(F.col("value")).alias("val")
    )
    sparse = grid.join(daily, ["user_id", "day"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("val").isNotNull(), F.col("day"))
    ctx = sparse.select(
        "user_id",
        "day",
        "val",
        F.last("val", ignorenulls=True).over(wb).alias("bv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("bd"),
        F.first("val", ignorenulls=True).over(wf).alias("fv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("fd"),
    )
    interp = F.col("bv") + (F.col("fv") - F.col("bv")) * (
        F.datediff("day", "bd").cast("double")
        / F.datediff("fd", "bd").cast("double")
    )
    filled = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(F.col("bv").isNotNull() & F.col("fv").isNotNull(), interp)
        .when(F.col("bv").isNotNull(), F.col("bv"))
        .when(F.col("fv").isNotNull(), F.col("fv"))
        .otherwise(F.lit(0.0))
    )
    return ctx.select(
        "user_id",
        "day",
        (F.floor(filled * 10000 + F.lit(0.5)) / 10000).alias("val_interp"),
    )


_DECOMP_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS val
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
tr AS (
  SELECT day, val,
         CASE WHEN COUNT(*) OVER w = 7
              THEN (FLOOR((AVG(val) OVER w) * 10000 + 0.5) / 10000)
         END AS trend,
         dayofweek(day) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT *, CAST(FLOOR((val - trend) * 10000 + 0.5) AS BIGINT) AS det_u
  FROM tr
),
seas AS (
  SELECT dow,
         (FLOOR((CAST(SUM(det_u) AS DOUBLE) / COUNT(det_u) / 10000) * 10000 + 0.5)
          / 10000) AS seasonal
  FROM det WHERE det_u IS NOT NULL
  GROUP BY dow
)
SELECT det.day, det.val, det.trend, seas.seasonal,
       CASE WHEN det.trend IS NOT NULL
            THEN (FLOOR((det.val - det.trend - seas.seasonal) * 10000 + 0.5) / 10000)
       END AS remainder
FROM det JOIN seas ON det.dow = seas.dow
"""


@register("ts_classical_decompose", oracle=_DECOMP_SQL, tier="T2")
def ts_classical_decompose(spark, sf_dir):
    """Classical additive time-series decomposition of the daily value
    series: trend = centered 7-day moving average (full windows only),
    seasonal = per-weekday mean of the detrended series, remainder =
    val − trend − seasonal — the standard pre-STL decomposition for
    seasonality-aware monitoring.

    Determinism: daily values are exact cent sums; the detrended series is
    rounded into integer 1e-4 units BEFORE the per-weekday mean so the
    cross-row sum is order-independent; every emitted float is one fixed
    divide-then-round sequence shared with the oracle.

    Scale note: one shuffle to daily grain (map-side combinable), one
    |days|-row window, one 7-row seasonal broadcast join — the raw event
    stream is scanned once.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).cast("double") / 100).alias(
            "val"
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "val",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.floor(F.avg("val").over(w) * 10000 + F.lit(0.5)) / 10000,
        ).alias("trend"),
        F.dayofweek("day").alias("dow"),
    )
    det = tr.withColumn(
        "det_u",
        F.floor((F.col("val") - F.col("trend")) * 10000 + F.lit(0.5)).cast("long"),
    )
    seas = (
        det.filter(F.col("det_u").isNotNull())
        .groupBy("dow")
        .agg(
            (
                F.floor(
                    (F.sum("det_u").cast("double") / F.count("det_u") / 10000) * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("seasonal")
        )
    )
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        "val",
        "trend",
        "seasonal",
        F.when(
            F.col("trend").isNotNull(),
            F.floor(
                (F.col("val") - F.col("trend") - F.col("seasonal")) * 10000 + F.lit(0.5)
            )
            / 10000,
        ).alias("remainder"),
    )


_ACF_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS u
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
lagged AS (
  -- CALENDAR lag (day + k), not row lag: identical to the Spark join even
  -- if the daily series ever has gap days
  SELECT k.lag, d1.u AS a, d2.u AS b
  FROM daily d1, unnest(generate_series(CAST(1 AS BIGINT), 7)) AS k(lag)
  JOIN daily d2 ON d2.day = d1.day + CAST(k.lag AS INT)
),
s AS (
  SELECT lag, COUNT(*) AS n,
         SUM(a) AS sa, SUM(b) AS sb, SUM(a * b) AS sab,
         SUM(a * a) AS saa, SUM(b * b) AS sbb
  FROM lagged
  GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
       (FLOOR(((n * sab - sa * sb)
               / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                      * CAST(n * sbb - sb * sb AS DOUBLE))) * 10000 + 0.5)
        / 10000) AS acf
FROM s
ORDER BY lag
"""


@register("ts_autocorrelation", oracle=_ACF_SQL, tier="T2")
def ts_autocorrelation(spark, sf_dir):
    """Lag-1..7 autocorrelation of the daily value series (Pearson corr of
    the series against its k-day lead over overlapping days) — the
    seasonality detector feeding ts_classical_decompose's period choice.

    Determinism: all six sufficient statistics (n, Σa, Σb, Σab, Σa², Σb²)
    are exact int64 sums of cent units, then ONE closed-form double
    expression — no float accumulation anywhere, so partitioning cannot
    change a bit (built-in corr() aggregates floats and cannot promise
    that). Scale note: one daily-grain shuffle; the lag fan-out is 7× the
    |days|-row series, not the event stream.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).cast("long").alias("u"))
    lagged = daily.select(
        "day", "u", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag")
    )
    # lead with a column offset isn't supported; calendar lag = self-join
    # on day + lag (also gap-day-correct, unlike a row-based lead)
    shifted = daily.select(
        F.col("day").alias("bday"), F.col("u").alias("b")
    )
    pairs = lagged.join(
        shifted, F.date_add(F.col("day"), F.col("lag").cast("int")) == F.col("bday")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("u") * F.col("b")).alias("sab"),
        F.sum(F.col("u") * F.col("u")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    acf = (
        (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
        / F.sqrt(
            (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
            * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
        )
    )
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n"),
        (F.floor(acf * 10000 + F.lit(0.5)) / 10000).alias("acf"),
    ).orderBy("lag")


# Holt's linear-trend smoothing constants (mirrored literals in both folds)
_HOLT_A = "0.3"  # level alpha
_HOLT_B = "0.2"  # trend beta


def _holt_l(acc1: str, acc2: str, x1: str) -> str:
    """New-level expression — built from each engine's accessor spellings so
    the arithmetic is literally identical; duplicated where the trend update
    needs it (no let-bindings in either lambda dialect)."""
    return f"({_HOLT_A} * {x1} + (1.0 - {_HOLT_A}) * ({acc1} + {acc2}))"


def _holt_step(acc1: str, acc2: str, x1: str) -> tuple[str, str]:
    nl = _holt_l(acc1, acc2, x1)
    nb = f"({_HOLT_B} * ({nl} - {acc1}) + (1.0 - {_HOLT_B}) * {acc2})"
    return nl, nb


_DK_NL, _DK_NB = _holt_step("acc[1]", "acc[2]", "x[1]")

# State is a 2-element DOUBLE list [level, trend], NOT a struct: DuckDB
# v1.0's list_reduce evaluates struct fields sequentially against an
# in-place-updated accumulator (a later field referencing acc.l reads the
# NEW level — measured, see tests/test_timeseries_holt.py), while list
# elements all read the pre-step accumulator like Spark's named_struct
# does. Lists behave identically in both engines; structs do not.
_HOLT_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS dval
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
),
srt AS (
  SELECT user_id,
         list_transform(list(dval ORDER BY day),
                        v -> [v, CAST(0.0 AS DOUBLE)]) AS lst
  FROM daily GROUP BY user_id
),
fold AS (
  SELECT user_id, len(lst) AS n_days,
         list_reduce(lst, (acc, x) -> [{_DK_NL}, {_DK_NB}]) AS st
  FROM srt
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       (FLOOR(st[1] * 10000 + 0.5) / 10000) AS level,
       (FLOOR(st[2] * 10000 + 0.5) / 10000) AS trend,
       (FLOOR((st[1] + st[2]) * 10000 + 0.5) / 10000) AS forecast_next
FROM fold
"""


@register("ts_holt_linear", oracle=_HOLT_SQL, tier="T2")
def ts_holt_linear(spark, sf_dir):
    """Holt double-exponential smoothing (level α=0.3, trend β=0.2,
    b₁=0 init) of each user's daily value series: final level, trend, and
    the one-step-ahead forecast — the trend-aware upgrade of ts_ewma for
    metric forecasting.

    Determinism: like ts_ewma, a left fold over the day-ordered daily
    aggregate with the same arithmetic in both engines. The fold state is
    a 2-element double ARRAY [level, trend] rather than a struct — DuckDB
    v1.0's list_reduce mutates a struct accumulator field-by-field within
    one step (a later field reads the new level), while array-element
    accumulators read pre-step values in both engines, keeping the IEEE
    sequences identical. The new-level expression is duplicated inside the
    trend update (no let-bindings in either lambda dialect).

    Scale note: per-user fold over the DAILY aggregate (bounded by
    calendar days, not events); one shuffle on user_id covers the
    collect_list and the groupBy, the same shape as ts_ewma.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        money_sum(F.col("value")).alias("dval")
    )
    nl, nb = _holt_step("element_at(acc, 1)", "element_at(acc, 2)", "element_at(x, 1)")
    return (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "dval"))).alias("s"))
        .withColumn(
            "lst", F.expr("transform(s, v -> array(v.dval, CAST(0.0 AS DOUBLE)))")
        )
        .withColumn(
            "st",
            F.expr(
                f"aggregate(slice(lst, 2, greatest(size(lst) - 1, 0)),"
                f" element_at(lst, 1), (acc, x) -> array({nl}, {nb}))"
            ),
        )
        .select(
            "user_id",
            F.size("lst").cast("long").alias("n_days"),
            (F.floor(F.expr("element_at(st, 1)") * 10000 + F.lit(0.5)) / 10000).alias(
                "level"
            ),
            (F.floor(F.expr("element_at(st, 2)") * 10000 + F.lit(0.5)) / 10000).alias(
                "trend"
            ),
            (
                F.floor(
                    (F.expr("element_at(st, 1)") + F.expr("element_at(st, 2)")) * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("forecast_next"),
        )
    )


# CUSUM control chart: slack k and alarm threshold h in dollars; the fold
# state is [s_plus, s_minus, n_alarms] (array, not struct — see ts_holt_linear)
_CUSUM_K = "0.5"
_CUSUM_H = "50.0"


def _cusum_step(acc1: str, acc2: str, acc3: str, x1: str, x2: str) -> tuple[str, str, str]:
    """x carries [deviation d = dval - mean, 0, 0]; state updates:
    s⁺ = max(0, s⁺ + d - k), s⁻ = max(0, s⁻ - d - k),
    n_alarms += (s⁺' > h OR s⁻' > h). The alarm test re-spells the two
    updates (no let-bindings in either lambda dialect)."""
    sp = f"GREATEST(0.0, {acc1} + {x1} - {_CUSUM_K})"
    sm = f"GREATEST(0.0, {acc2} - {x1} - {_CUSUM_K})"
    na = f"({acc3} + (CASE WHEN {sp} > {_CUSUM_H} OR {sm} > {_CUSUM_H} THEN 1.0 ELSE 0.0 END))"
    return sp, sm, na


_CU_SP, _CU_SM, _CU_NA = _cusum_step("acc[1]", "acc[2]", "acc[3]", "x[1]", "x[2]")

_CUSUM_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
),
m AS (
  SELECT user_id,
         CAST(SUM(cents) AS DOUBLE) / 100 / COUNT(*) AS mean_val
  FROM daily GROUP BY user_id
),
srt AS (
  SELECT d.user_id,
         list_transform(list(CAST(d.cents AS DOUBLE) / 100 - m.mean_val ORDER BY d.day),
                        v -> [v, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]) AS lst
  FROM daily d JOIN m ON d.user_id = m.user_id
  GROUP BY d.user_id
),
fold AS (
  SELECT user_id, len(lst) AS n_days,
         list_reduce(list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                                   CAST(0.0 AS DOUBLE)], lst),
                     (acc, x) -> [{_CU_SP}, {_CU_SM}, {_CU_NA}]) AS st
  FROM srt
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       (FLOOR(st[1] * 10000 + 0.5) / 10000) AS cusum_pos,
       (FLOOR(st[2] * 10000 + 0.5) / 10000) AS cusum_neg,
       CAST(st[3] AS BIGINT) AS n_alarms
FROM fold
"""


@register("ts_cusum", oracle=_CUSUM_SQL, tier="T2")
def ts_cusum(spark, sf_dir):
    """Two-sided CUSUM control chart per user (slack k=$0.5, alarm
    threshold h=$50) over the daily value series centered on the user's
    own mean: final S⁺/S⁻ and how many days tripped an alarm — the
    change-point screen that catches slow drifts a z-score test misses
    (complements ts_anomaly_zscore).

    Determinism: deviations are exact-cent daily sums minus a
    once-divided mean (identical IEEE sequence both sides); the fold is
    seeded with an explicit zero state (Spark aggregate() zero ↔ DuckDB
    list_prepend) over the day-ordered deviation list, with array state
    per the ts_holt_linear rule; the alarm counter lives in the state as
    a double and casts to BIGINT once at the end.

    Scale note: identical shape to ts_ewma/ts_holt_linear — per-user fold
    over the bounded daily aggregate, one shuffle on user_id.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    m = daily.groupBy("user_id").agg(
        (F.sum("cents").cast("double") / 100 / F.count(F.lit(1))).alias("mean_val")
    )
    sp, sm, na = _cusum_step(
        "element_at(acc, 1)", "element_at(acc, 2)", "element_at(acc, 3)",
        "element_at(x, 1)", "element_at(x, 2)",
    )
    return (
        daily.join(m, "user_id")
        .select(
            "user_id",
            "day",
            (F.col("cents").cast("double") / 100 - F.col("mean_val")).alias("d"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "d"))).alias("s"))
        .withColumn(
            "lst",
            F.expr(
                "transform(s, v -> array(v.d, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))"
            ),
        )
        .withColumn(
            "st",
            F.expr(
                f"aggregate(lst, array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),"
                f" CAST(0.0 AS DOUBLE)), (acc, x) -> array({sp}, {sm}, {na}))"
            ),
        )
        .select(
            "user_id",
            F.size("lst").cast("long").alias("n_days"),
            (F.floor(F.expr("element_at(st, 1)") * 10000 + F.lit(0.5)) / 10000).alias(
                "cusum_pos"
            ),
            (F.floor(F.expr("element_at(st, 2)") * 10000 + F.lit(0.5)) / 10000).alias(
                "cusum_neg"
            ),
            F.expr("CAST(element_at(st, 3) AS BIGINT)").alias("n_alarms"),
        )
    )


@register(
    "ts_time_weighted_avg",
    oracle="""
WITH seg AS (
  SELECT user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS t_next
  FROM events
),
w AS (
  SELECT user_id, SUM(cents * (t_next - t)) AS wsum, SUM(t_next - t) AS dur
  FROM seg WHERE t_next IS NOT NULL
  GROUP BY user_id
)
SELECT user_id,
       CAST(dur AS BIGINT) AS observed_us,
       (FLOOR(CAST(wsum AS DOUBLE) / dur / 100 * 10000 + 0.5) / 10000) AS twap
FROM w
""",
    tier="T2",
)
def ts_time_weighted_avg(spark, sf_dir):
    """Time-weighted average value per user (TWAP): each event's value
    holds until the next event (step interpolation), weighted by its
    holding duration in epoch-µs — the right average for irregularly
    sampled series where a plain AVG over-weights bursts.

    Determinism: weights are exact integer µs durations × integer cents
    (headroom: cents ≤ 1e6 × duration ≤ ~3e13 µs/year ≈ 3e19 … per-TERM;
    at year-long gaps drop to ms units — here gaps are minutes, terms
    ≤ ~1e12, sums « 2^63), ONE division at the end, half-up 4dp.

    Scale note: one keyed window (lead) sharing its exchange with the
    groupBy on the same key — single shuffle; the weighted sum is
    map-side combinable.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr("unix_micros(ts)"), "event_id")
    seg = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.expr("unix_micros(ts)").alias("t"),
        F.lead(F.expr("unix_micros(ts)")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum(F.col("cents") * (F.col("t_next") - F.col("t"))).alias("wsum"),
        F.sum(F.col("t_next") - F.col("t")).alias("dur"),
    )
    return agg.select(
        "user_id",
        F.col("dur").cast("long").alias("observed_us"),
        (
            F.floor(
                F.col("wsum").cast("double") / F.col("dur") / 100 * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("twap"),
    )


@register(
    "ts_backtest_snaive",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
),
fc AS (
  SELECT user_id, day, cents,
         lag(cents, 7) OVER (PARTITION BY user_id ORDER BY day) AS pred
  FROM daily
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       (FLOOR(CAST(SUM(ABS(cents - pred)) AS DOUBLE) / COUNT(*) / 100 * 10000 + 0.5)
        / 10000) AS mae,
       (FLOOR(CAST(SUM(CASE WHEN cents - pred > 0 THEN cents - pred
                            ELSE pred - cents END) AS DOUBLE)
              / SUM(cents + pred) * 1000000 + 0.5) / 1000000) AS smape_half
FROM fc WHERE pred IS NOT NULL
GROUP BY user_id
""",
    tier="T2",
)
def ts_backtest_snaive(spark, sf_dir):
    """Forecast backtest of the seasonal-naive model (ŷ_t = y_{t-7 obs}):
    per-user MAE in dollars and aggregate ½-sMAPE (Σ|err| / Σ(y+ŷ)) — the
    baseline every fancier forecaster (ts_holt_linear, ts_ewma) must beat
    before it ships. Scoring starts once 7 prior observations exist.

    Determinism: errors are exact integer-cent differences; each reported
    metric divides once and half-up rounds.

    Scale note: the keyed lag window and the per-user aggregate share one
    user_id exchange; everything is map-side combinable after the lag.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    fc = daily.withColumn("pred", F.lag("cents", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    err = F.abs(F.col("cents") - F.col("pred"))
    return fc.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        (
            F.floor(
                F.sum(err).cast("double") / F.count(F.lit(1)) / 100 * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("mae"),
        (
            F.floor(
                F.sum(err).cast("double")
                / F.sum(F.col("cents") + F.col("pred"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("smape_half"),
    )


_MAD_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
med AS (
  -- exact median in DOUBLED units: 2*median of ints is always an integer
  -- (odd n: 2x the middle; even n: the sum of the two middles)
  SELECT user_id,
         CAST(2 * median(cents) AS BIGINT) AS med2
  FROM daily GROUP BY user_id
),
dev AS (
  SELECT d.user_id, d.day, d.cents, m.med2,
         ABS(2 * d.cents - m.med2) AS adev2
  FROM daily d JOIN med m ON d.user_id = m.user_id
),
mad AS (
  SELECT user_id, CAST(2 * median(adev2) AS BIGINT) AS mad4
  FROM dev GROUP BY user_id
)
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       -- |x - med| > 3*MAD in exact ints: 4*|2x - med2| = 8|x-med| vs
       -- 3*2*mad4 = 24*MAD ... both sides scaled by 8: |x-med|*8 > MAD*24
       CAST(SUM(CASE WHEN 4 * v.adev2 > 3 * m.mad4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       (FLOOR(CAST(m.mad4 AS DOUBLE) / 4 / 100 * 10000 + 0.5) / 10000) AS mad_value
FROM dev v JOIN mad m ON v.user_id = m.user_id
GROUP BY v.user_id, m.mad4
"""


@register("ts_outlier_mad", oracle=_MAD_SQL, tier="T2")
def ts_outlier_mad(spark, sf_dir):
    """Robust outlier screen per user: days whose daily value deviates
    from the user's MEDIAN by more than 3× the median absolute deviation
    — the heavy-tail-safe complement to ts_anomaly_zscore (mean/std are
    themselves dragged by the outliers they hunt; median/MAD are not).

    Determinism: medians of integers are computed in DOUBLED units
    (2·median is always an exact integer — odd n: twice the middle, even
    n: the sum of the two middles), the deviation |2x − med2| stays
    integer, the MAD doubles again (mad4 = 4·MAD), and the 3×MAD
    comparison is the exact integer inequality 4·adev2 > 3·mad4 — no
    float enters until the one reported MAD value.

    Scale note: two keyed exact-median aggregates + one join, all on the
    bounded daily table; percentile_disc-style medians per user sort
    |days|-sized groups, never raw events.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    med = daily.groupBy("user_id").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("long").alias("med2")
    )
    dev = daily.join(med, "user_id").select(
        "user_id",
        "cents",
        "med2",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("adev2"),
    )
    mad = dev.groupBy("user_id").agg(
        (2 * F.expr("percentile(adev2, 0.5)")).cast("long").alias("mad4")
    )
    v = dev.join(mad, "user_id")
    return v.groupBy("user_id", "mad4").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.when(4 * F.col("adev2") > 3 * F.col("mad4"), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
        (
            F.floor(F.col("mad4").cast("double") / 4 / 100 * 10000 + F.lit(0.5))
            / 10000
        ).alias("mad_value"),
    ).select("user_id", "n_days", "n_outliers", "mad_value")


_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
cum AS (
  SELECT user_id, day,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS eq
  FROM daily
),
dd AS (
  SELECT user_id, day, eq,
         MAX(eq) OVER (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM cum
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak - eq) AS DOUBLE) / 100 AS max_drawdown,
       CAST(MAX(eq) AS DOUBLE) / 100 AS peak_equity,
       CAST(SUM(CASE WHEN eq < peak THEN 1 ELSE 0 END) AS BIGINT)
         AS days_under_water
FROM dd
GROUP BY user_id
"""


@register("ts_max_drawdown", oracle=_DRAWDOWN_SQL, tier="T2")
def ts_max_drawdown(spark, sf_dir):
    """Maximum drawdown of each user's cumulative daily value curve
    (peak-to-trough decline of the running equity), plus peak equity and
    days spent below a prior peak — the risk-profile summary for any
    cumulative metric (spend, revenue, token budget burn-down).

    Determinism: the equity curve is an exact integer-cent running sum;
    running max, drawdown and the under-water flag are all integer
    comparisons; division by 100 is the only float op.

    Scale note: the running sum and running max share one (user_id)
    partition/sort; the final aggregate is map-side combinable over the
    bounded daily table.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # peak uses the SAME day-ordered frame as the running sum — the two
    # windows share one partition/sort in the physical plan
    dd = daily.select("user_id", "day", F.sum("cents").over(w).alias("eq")).select(
        "user_id",
        "eq",
        F.max("eq").over(w).alias("peak"),
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.max(F.col("peak") - F.col("eq")).cast("double") / 100).alias("max_drawdown"),
        (F.max("eq").cast("double") / 100).alias("peak_equity"),
        F.sum(F.when(F.col("eq") < F.col("peak"), 1).otherwise(0))
        .cast("long")
        .alias("days_under_water"),
    )


_SEAS_STRENGTH_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS val
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
tr AS (
  SELECT day, val,
         CASE WHEN COUNT(*) OVER w = 7
              THEN (FLOOR((AVG(val) OVER w) * 10000 + 0.5) / 10000)
         END AS trend,
         dayofweek(day) AS dow
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT *, CAST(FLOOR((val - trend) * 10000 + 0.5) AS BIGINT) AS det_u
  FROM tr
),
seas AS (
  SELECT dow,
         CAST(FLOOR((FLOOR((CAST(SUM(det_u) AS DOUBLE) / COUNT(det_u) / 10000)
                            * 10000 + 0.5) / 10000) * 10000 + 0.5) AS BIGINT)
           AS seas_u
  FROM det WHERE det_u IS NOT NULL
  GROUP BY dow
),
resid AS (
  -- residual series in WHOLE-CENT units (floor of 1e-4 units / 100):
  -- coarser units keep the exact squared sums inside int64 (~SF 100)
  SELECT CAST(FLOOR(CAST(det.det_u AS DOUBLE) / 100) AS BIGINT) AS det_c,
         CAST(FLOOR(CAST(det.det_u - seas.seas_u AS DOUBLE) / 100) AS BIGINT) AS rem_c
  FROM det JOIN seas ON det.dow = seas.dow
  WHERE det.det_u IS NOT NULL
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(det_c) AS BIGINT) AS sd, CAST(SUM(det_c * det_c) AS BIGINT) AS qd,
         CAST(SUM(rem_c) AS BIGINT) AS sr, CAST(SUM(rem_c * rem_c) AS BIGINT) AS qr
  FROM resid
)
SELECT n AS n_days,
       (FLOOR(((CAST(qd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n) / n) / 10000 * 100 + 0.5) / 100) AS var_detrended_d2,
       (FLOOR(((CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n) / n) / 10000 * 100 + 0.5) / 100) AS var_remainder_d2,
       (FLOOR(GREATEST(0.0, 1.0 - ((CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n) / n)
                              / ((CAST(qd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n) / n))
              * 10000 + 0.5) / 10000) AS strength_seasonal
FROM m
"""


@register("ts_seasonal_strength", oracle=_SEAS_STRENGTH_SQL, tier="T2")
def ts_seasonal_strength(spark, sf_dir):
    """Seasonality-strength metric (Hyndman's FS = max(0, 1 −
    Var(remainder)/Var(detrended))) on the classical decomposition of the
    daily series — the scalar a monitoring stack thresholds to decide
    whether weekday-aware baselines are warranted.

    Determinism: reuses ts_classical_decompose's integer-unit pipeline
    (exact cent sums → 1e-4-unit detrended → 4dp seasonal means), then
    quantizes both residual series to WHOLE CENTS before the variance
    moments, so Σx and Σx² are exact int64 (headroom to ~SF 100 — the
    1e-4-unit squares would overflow near SF 1) and the variance ratio is
    a fixed double expression on exact integers.

    Scale note: everything after the daily aggregate operates on
    |days|-sized series; one window, one 7-row join, one global moment
    reduction.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).cast("double") / 100).alias("val")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "val",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.floor(F.avg("val").over(w) * 10000 + F.lit(0.5)) / 10000,
        ).alias("trend"),
        F.dayofweek("day").alias("dow"),
    )
    det = tr.withColumn(
        "det_u", F.floor((F.col("val") - F.col("trend")) * 10000 + F.lit(0.5)).cast("long")
    )
    seas = (
        det.filter(F.col("det_u").isNotNull())
        .groupBy("dow")
        .agg(
            F.floor(
                (
                    F.floor(
                        (F.sum("det_u").cast("double") / F.count("det_u") / 10000)
                        * 10000
                        + F.lit(0.5)
                    )
                    / 10000
                )
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("seas_u")
        )
    )
    resid = (
        det.filter(F.col("det_u").isNotNull())
        .join(seas, "dow")
        .select(
            F.floor(F.col("det_u").cast("double") / 100).cast("long").alias("det_c"),
            F.floor((F.col("det_u") - F.col("seas_u")).cast("double") / 100)
            .cast("long")
            .alias("rem_c"),
        )
    )
    m = resid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("det_c").alias("sd"),
        F.sum(F.col("det_c") * F.col("det_c")).alias("qd"),
        F.sum("rem_c").alias("sr"),
        F.sum(F.col("rem_c") * F.col("rem_c")).alias("qr"),
    )
    var_d = (F.col("qd").cast("double") - F.col("sd").cast("double") * F.col("sd") / F.col("n")) / F.col("n")
    var_r = (F.col("qr").cast("double") - F.col("sr").cast("double") * F.col("sr") / F.col("n")) / F.col("n")
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        (F.floor(var_d / 10000 * 100 + F.lit(0.5)) / 100).alias("var_detrended_d2"),
        (F.floor(var_r / 10000 * 100 + F.lit(0.5)) / 100).alias("var_remainder_d2"),
        (
            F.floor(
                F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_d) * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("strength_seasonal"),
    )


_HW_A, _HW_B, _HW_G = "0.3", "0.2", "0.1"  # level / trend / seasonal


def _hw_step(acc, x1):
    """Holt-Winters additive step expressions over a 9-element array state
    [level, trend, s_head..s_tail] (seasonal queue rotates left each step,
    so the head s-slot always applies to the CURRENT observation). No
    let-bindings in either lambda dialect, so nl is duplicated inside nb
    and ns — identical IEEE sequences in both engines."""
    a, b, g = _HW_A, _HW_B, _HW_G
    nl = f"({a} * ({x1} - {acc}[3]) + (1.0 - {a}) * ({acc}[1] + {acc}[2]))"
    nb = f"({b} * ({nl} - {acc}[1]) + (1.0 - {b}) * {acc}[2])"
    ns = f"({g} * ({x1} - {nl}) + (1.0 - {g}) * {acc}[3])"
    return nl, nb, ns


_HW_NL, _HW_NB, _HW_NS = _hw_step("acc", "x[1]")
_HW_STEP_DUCK = (
    f"[{_HW_NL}, {_HW_NB}, acc[4], acc[5], acc[6], acc[7], acc[8], acc[9], {_HW_NS}]"
)

_HW_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS dval
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
),
srt AS (
  SELECT user_id,
         list_transform(list(dval ORDER BY day),
                        v -> [v, CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                              0.0]) AS lst
  FROM daily GROUP BY user_id
),
fold AS (
  SELECT user_id, len(lst) AS n_days,
         list_reduce(lst, (acc, x) -> {_HW_STEP_DUCK}) AS st
  FROM srt
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       (FLOOR(st[1] * 10000 + 0.5) / 10000) AS level,
       (FLOOR(st[2] * 10000 + 0.5) / 10000) AS trend,
       (FLOOR(st[3] * 10000 + 0.5) / 10000) AS seasonal_next,
       (FLOOR((st[1] + st[2] + st[3]) * 10000 + 0.5) / 10000) AS forecast_next
FROM fold
"""


@register("ts_holt_winters", oracle=_HW_SQL, tier="T2")
def ts_holt_winters(spark, sf_dir):
    """Holt-Winters ADDITIVE triple-exponential smoothing (α=0.3, β=0.2,
    γ=0.1, weekly period m=7) of each user's daily value series — the
    seasonal upgrade of ts_holt_linear for weekday-patterned metrics.
    Emits final level, trend, next-step seasonal component, and the
    one-step-ahead forecast l + b + s.

    State is a 9-element double ARRAY [level, trend, s₁..s₇] where the
    seasonal queue rotates left each step (head slot applies to the
    current observation), so the step lambda is pure element arithmetic —
    the same array-state discipline as ts_holt_linear (struct accumulators
    alias in-place in DuckDB's list_reduce; array elements read pre-step
    values in both engines). Init: l₁ = x₁, b₁ = 0, seasonals 0 (additive
    zero-init — the standard cold-start; a production fit would seed
    seasonals from the first full period).

    Scale note: identical shape to ts_holt_linear — one user_id shuffle
    covers the day-ordered collect and the fold; series length is bounded
    by calendar days, not events.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        money_sum(F.col("value")).alias("dval")
    )
    nl, nb, ns = _hw_step("acc", "element_at(x, 1)")
    nl = nl.replace("acc[1]", "element_at(acc, 1)").replace(
        "acc[2]", "element_at(acc, 2)"
    ).replace("acc[3]", "element_at(acc, 3)")
    nb = nb.replace("acc[1]", "element_at(acc, 1)").replace(
        "acc[2]", "element_at(acc, 2)"
    ).replace("acc[3]", "element_at(acc, 3)")
    ns = ns.replace("acc[1]", "element_at(acc, 1)").replace(
        "acc[2]", "element_at(acc, 2)"
    ).replace("acc[3]", "element_at(acc, 3)")
    step = (
        f"array({nl}, {nb}, element_at(acc, 4), element_at(acc, 5),"
        f" element_at(acc, 6), element_at(acc, 7), element_at(acc, 8),"
        f" element_at(acc, 9), {ns})"
    )
    return (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "dval"))).alias("s"))
        .withColumn(
            "lst",
            F.expr(
                "transform(s, v -> array(v.dval, CAST(0.0 AS DOUBLE), 0.0D, 0.0D,"
                " 0.0D, 0.0D, 0.0D, 0.0D, 0.0D))"
            ),
        )
        .withColumn(
            "st",
            F.expr(
                f"aggregate(slice(lst, 2, greatest(size(lst) - 1, 0)),"
                f" element_at(lst, 1), (acc, x) -> {step})"
            ),
        )
        .select(
            "user_id",
            F.size("lst").cast("long").alias("n_days"),
            (F.floor(F.expr("element_at(st, 1)") * 10000 + F.lit(0.5)) / 10000).alias("level"),
            (F.floor(F.expr("element_at(st, 2)") * 10000 + F.lit(0.5)) / 10000).alias("trend"),
            (F.floor(F.expr("element_at(st, 3)") * 10000 + F.lit(0.5)) / 10000).alias("seasonal_next"),
            (
                F.floor(
                    (
                        F.expr("element_at(st, 1)")
                        + F.expr("element_at(st, 2)")
                        + F.expr("element_at(st, 3)")
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("forecast_next"),
        )
    )


# ---------------------------------------------------------------------------
# Croston's method (intermittent demand): two coupled EWMAs over the SPARSE
# demand sequence — smoothed demand size z and smoothed inter-demand
# interval p; forecast rate = z / p. State is a 2-element DOUBLE array
# [z, p] (array, not struct — see the _HOLT_SQL note), each element
# x = [demand, gap_days]. First element initializes the state (DuckDB
# list_reduce and Spark aggregate(slice(..,2,..), first, ..) agree).
_CROSTON_A = "0.3"


def _croston_step(acc1: str, acc2: str, x1: str, x2: str) -> tuple[str, str]:
    nz = f"({acc1} + {_CROSTON_A} * ({x1} - {acc1}))"
    np_ = f"({acc2} + {_CROSTON_A} * ({x2} - {acc2}))"
    return nz, np_


_CR_NZ, _CR_NP = _croston_step("acc[1]", "acc[2]", "x[1]", "x[2]")

_CROSTON_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
           AS dval
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
),
gapped AS (
  SELECT user_id, day, dval,
         CAST(COALESCE(day - lag(day) OVER (PARTITION BY user_id ORDER BY day),
                       1) AS DOUBLE) AS gap
  FROM daily
),
srt AS (
  SELECT user_id, list(CAST([dval, gap] AS DOUBLE[]) ORDER BY day) AS lst
  FROM gapped GROUP BY user_id
),
fold AS (
  SELECT user_id, len(lst) AS n_demand_days,
         list_reduce(lst, (acc, x) -> [{_CR_NZ}, {_CR_NP}]) AS st
  FROM srt
)
SELECT user_id, CAST(n_demand_days AS BIGINT) AS n_demand_days,
       (FLOOR(st[1] * 10000 + 0.5) / 10000) AS demand_level,
       (FLOOR(st[2] * 10000 + 0.5) / 10000) AS interval_level,
       (FLOOR((st[1] / st[2]) * 10000 + 0.5) / 10000) AS croston_rate
FROM fold
"""


@register("ts_croston", oracle=_CROSTON_SQL, tier="T2")
def ts_croston(spark, sf_dir):
    """Croston's intermittent-demand forecast per user: EWMA of nonzero
    daily purchase totals (z) and of the gaps between purchase days (p),
    alpha=0.3, forecast rate z/p — the standard sparse-demand upgrade of
    ts_ewma (plain EWMA decays toward zero on quiet days; Croston folds
    only over DEMAND days and models the spacing separately).

    Determinism: same fold recipe as ts_holt_linear — array state, the
    first (day-ordered) element initializes [z, p], identical IEEE step
    arithmetic in both engines, 1e-4 quantization only at output. The
    first gap is pinned to 1.0 on both sides (no lag available).

    Scale note: the fold runs over each user's PURCHASE-day aggregate
    (sparse by construction — no calendar densification), so the shuffle
    carries only demand days; one user_id exchange feeds the daily
    aggregate, the lag window, and the collect_list.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(money_sum(F.col("value")).alias("dval"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    gapped = daily.withColumn(
        "gap",
        F.coalesce(F.datediff("day", F.lag("day").over(w)), F.lit(1)).cast("double"),
    )
    nz, np_ = _croston_step(
        "element_at(acc, 1)", "element_at(acc, 2)", "element_at(x, 1)", "element_at(x, 2)"
    )
    return (
        gapped.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "dval", "gap"))).alias("s"))
        .withColumn("lst", F.expr("transform(s, v -> array(v.dval, v.gap))"))
        .withColumn(
            "st",
            F.expr(
                f"aggregate(slice(lst, 2, greatest(size(lst) - 1, 0)),"
                f" element_at(lst, 1), (acc, x) -> array({nz}, {np_}))"
            ),
        )
        .select(
            "user_id",
            F.size("lst").cast("long").alias("n_demand_days"),
            (F.floor(F.expr("element_at(st, 1)") * 10000 + F.lit(0.5)) / 10000).alias(
                "demand_level"
            ),
            (F.floor(F.expr("element_at(st, 2)") * 10000 + F.lit(0.5)) / 10000).alias(
                "interval_level"
            ),
            (
                F.floor(
                    F.expr("element_at(st, 1) / element_at(st, 2)") * 10000 + F.lit(0.5)
                )
                / 10000
            ).alias("croston_rate"),
        )
    )


@register(
    "ts_ohlc_bars",
    oracle="""
WITH wk AS (
  SELECT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
win AS (
  SELECT user_id, week, cents,
         first_value(cents) OVER w AS open_c,
         last_value(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS close_c
  FROM wk
  WINDOW w AS (PARTITION BY user_id, week ORDER BY ts, event_id)
)
SELECT user_id, week,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(open_c) AS BIGINT) AS open_c,
       CAST(MAX(cents) AS BIGINT) AS high_c,
       CAST(MIN(cents) AS BIGINT) AS low_c,
       CAST(MIN(close_c) AS BIGINT) AS close_c
FROM win GROUP BY user_id, week
""",
    tier="T2",
)
def ts_ohlc_bars(spark, sf_dir):
    """Weekly OHLC candlestick bars per user: open/high/low/close of the
    event value plus tick count — the financial-rollup shape (open/close
    need ORDER-AWARE extraction, high/low are plain MIN/MAX).

    Determinism: values are exact integer cents before any aggregate;
    open/close tie-break on (ts, event_id) is total, so first_value /
    last_value pick a unique row in both engines.

    Scale note: one shuffle on (user_id, week) serves both the window
    (open/close) and the group-by (the window's partition key equals the
    aggregation key, so Catalyst reuses the exchange); bars are bounded by
    users x weeks, far below event cardinality.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wk = e.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wbase = Window.partitionBy("user_id", "week").orderBy("ts", "event_id")
    win = wk.select(
        "user_id",
        "week",
        "cents",
        F.first("cents").over(wbase).alias("open_c"),
        F.last("cents")
        .over(wbase.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("close_c"),
    )
    return win.groupBy("user_id", "week").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("open_c").alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.min("close_c").alias("close_c"),
    )


_BOLL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, cents,
         COUNT(*)      OVER win AS wn,
         SUM(cents)    OVER win AS s1,
         SUM(cents * cents) OVER win AS s2
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
b AS (
  SELECT event_type, day, cents,
         FLOOR((CAST(s1 AS DOUBLE) / 7 / 100) * 10000 + 0.5) / 10000 AS ma,
         FLOOR((CAST(s1 AS DOUBLE) / 7
                + 2 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / 7) / 6))
               / 100 * 10000 + 0.5) / 10000 AS upper_band,
         FLOOR((CAST(s1 AS DOUBLE) / 7
                - 2 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / 7) / 6))
               / 100 * 10000 + 0.5) / 10000 AS lower_band
  FROM w WHERE wn = 7
)
SELECT event_type, day, CAST(cents AS DOUBLE) / 100 AS revenue, ma,
       upper_band, lower_band,
       CASE WHEN CAST(cents AS DOUBLE) / 100 > upper_band THEN 'H'
            WHEN CAST(cents AS DOUBLE) / 100 < lower_band THEN 'L'
            ELSE '-' END AS breakout
FROM b
"""


@register("ts_bollinger_bands", oracle=_BOLL_SQL, tier="T2")
def ts_bollinger_bands(spark, sf_dir):
    """Bollinger bands over per-type daily revenue: 7-day rolling mean
    ± 2 rolling sample standard deviations, with H/L breakout flags —
    the rolling-volatility channel (vs ts_anomaly_zscore's GLOBAL
    per-type stats). Only complete 7-row frames emit a band.

    Determinism: the frame carries exact integer-cent sums (Σc, Σc²) —
    rolling mean and variance derive from integers in one fixed IEEE
    expression per row, then quantize half-up 4dp BEFORE the breakout
    comparison, so both engines compare identical quantized bands
    against integer cents. Scale note: daily pre-aggregation shrinks the
    fact stream to |types|×|days| rows; the rolling window partitions by
    event_type — no global sort. Σc² of 7 daily-cent values ≈ 7·(3e6)²
    ≈ 6e13 at sf0.1, int64-safe to ~SF 3000.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    w = daily.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(win).alias("wn"),
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("s2"),
    ).where(F.col("wn") == 7)
    mean_c = F.col("s1").cast("double") / 7
    sd_c = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / 7) / 6
    )
    q = lambda c: F.floor(c / 100 * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    b = w.select(
        "event_type",
        "day",
        "cents",
        q(mean_c).alias("ma"),
        q(mean_c + 2 * sd_c).alias("upper_band"),
        q(mean_c - 2 * sd_c).alias("lower_band"),
    )
    rev = F.col("cents").cast("double") / 100
    return b.select(
        "event_type",
        "day",
        rev.alias("revenue"),
        "ma",
        "upper_band",
        "lower_band",
        F.when(rev > F.col("upper_band"), "H")
        .when(rev < F.col("lower_band"), "L")
        .otherwise("-")
        .alias("breakout"),
    )


_RSI_STEP_SPARK = (
    "array((element_at(acc, 1) * CAST(13 AS DOUBLE)"
    " + greatest(element_at(x, 1), CAST(0 AS DOUBLE))) / CAST(14 AS DOUBLE),"
    " (element_at(acc, 2) * CAST(13 AS DOUBLE)"
    " + greatest(-element_at(x, 1), CAST(0 AS DOUBLE))) / CAST(14 AS DOUBLE))"
)

_RSI_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
),
ser AS (
  SELECT user_id, list(c ORDER BY day) AS xs
  FROM daily GROUP BY user_id
),
del AS (
  SELECT user_id,
         list_transform(generate_series(1, len(xs) - 1),
                        i -> CAST(xs[i + 1] - xs[i] AS DOUBLE)) AS ds
  FROM ser WHERE len(xs) >= 2
),
st AS (
  SELECT user_id, CAST(len(ds) AS BIGINT) AS n_deltas,
         list_reduce(
           list_prepend(
             [greatest(ds[1], CAST(0 AS DOUBLE)),
              greatest(-ds[1], CAST(0 AS DOUBLE))],
             list_transform(ds[2:], d -> [d, CAST(0 AS DOUBLE)])),
           (acc, x) -> [(acc[1] * CAST(13 AS DOUBLE)
                         + greatest(x[1], CAST(0 AS DOUBLE)))
                        / CAST(14 AS DOUBLE),
                        (acc[2] * CAST(13 AS DOUBLE)
                         + greatest(-x[1], CAST(0 AS DOUBLE)))
                        / CAST(14 AS DOUBLE)]) AS s
  FROM del
)
SELECT user_id, n_deltas,
       CASE WHEN s[1] + s[2] > 0
            THEN FLOOR((CAST(100 AS DOUBLE) * s[1]) / (s[1] + s[2]) * 10000
                       + 0.5) / 10000
       END AS rsi
FROM st
"""


@register("ts_rsi", oracle=_RSI_SQL, tier="T2")
def ts_rsi(spark, sf_dir):
    """Wilder's Relative Strength Index (period 14) of each user's daily
    purchase-revenue series — the bounded-oscillator momentum screen
    (RSI > 70 overbought / < 30 oversold in the finance reading; here a
    drift detector for per-entity metric streams). Day-over-day deltas
    split into gain/loss streams, each smoothed by the Wilder recursion
    avg' = (13·avg + v)/14 (an EWMA with α = 1/14), RSI = 100·g/(g+l).

    Determinism: the day series is the exact int64-cent daily aggregate;
    deltas are exact integer differences cast to double once; both engines
    fold the identical day-ordered list with a 2-element double ARRAY
    state [avg_gain, avg_loss] seeded from the first delta (array-element
    accumulators read pre-step values identically in Spark aggregate() and
    DuckDB list_reduce — the ts_holt_winters discipline), and +,·,/ are
    IEEE-exact in both engines. Final RSI is half-up 4dp; all-zero delta
    series emit NULL (0/0 guard).

    Scale note: one user_id shuffle covers the daily aggregate, the
    day-ordered collect and the fold; series length is bounded by calendar
    days, not events — the same shape as every ts_* fold key.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(cents(F.col("value"))).cast("long").alias("c"))
    )
    return (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "c"))).alias("s"))
        .withColumn("xs", F.expr("transform(s, v -> v.c)"))
        .filter(F.size("xs") >= 2)
        .withColumn(
            "ds",
            F.expr(
                "transform(sequence(1, size(xs) - 1),"
                " i -> CAST(element_at(xs, i + 1) - element_at(xs, i) AS DOUBLE))"
            ),
        )
        .withColumn(
            "st",
            F.expr(
                "aggregate(slice(ds, 2, greatest(size(ds) - 1, 0)),"
                " array(greatest(element_at(ds, 1), CAST(0 AS DOUBLE)),"
                "       greatest(-element_at(ds, 1), CAST(0 AS DOUBLE))),"
                f" (acc, x) -> {_RSI_STEP_SPARK.replace('element_at(x, 1)', 'x')})"
            ),
        )
        .select(
            "user_id",
            F.size("ds").cast("long").alias("n_deltas"),
            F.when(
                F.expr("element_at(st, 1) + element_at(st, 2)") > 0,
                F.floor(
                    F.expr(
                        "(CAST(100 AS DOUBLE) * element_at(st, 1))"
                        " / (element_at(st, 1) + element_at(st, 2))"
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000,
            ).alias("rsi"),
        )
    )


_MK_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id, CAST(ts AS DATE)
),
ser AS (
  SELECT user_id, list(c ORDER BY day) AS xs
  FROM daily GROUP BY user_id
)
SELECT user_id, CAST(len(xs) AS BIGINT) AS n_days,
       CAST(list_sum(flatten(list_transform(
              generate_series(1, len(xs) - 1),
              i -> list_transform(generate_series(i + 1, len(xs)),
                     j -> CASE WHEN xs[j] > xs[i] THEN 1
                               WHEN xs[j] < xs[i] THEN -1 ELSE 0 END))))
            AS BIGINT) AS s_stat,
       CAST(len(xs) * (len(xs) - 1) // 2 AS BIGINT) AS n_pairs
FROM ser WHERE len(xs) >= 2
"""


@register("ts_mann_kendall", oracle=_MK_SQL, tier="T2")
def ts_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend statistic S per user: Σ_{i<j} sign(x_j − x_i)
    over the daily purchase-revenue series — the nonparametric
    is-this-metric-trending test (robust to outliers and any monotone
    transform; S near ±n_pairs means a strong monotone trend, near 0
    none). The classic monitoring complement to the parametric
    agg_regression slope.

    Determinism: pure integers end to end — daily totals are exact cents,
    every pair verdict is an integer sign, S is an exact integer sum. The
    O(n²) pair expansion happens IN-ROW on the per-user day array
    (calendar-bounded: 30 days → 435 array elements), never as a join;
    NULL-valued purchases are excluded on both sides before aggregation.

    Scale note: one user_id shuffle for the daily aggregate + ordered
    collect; the quadratic stays bounded by days-per-user, so cost is
    linear in users. For year-scale series (~365d → 66k pairs/user) the
    in-row form still beats a pair join; beyond that use the O(n log n)
    inversion-count formulation.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(cents(F.col("value"))).cast("long").alias("c"))
    )
    return (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "c"))).alias("s"))
        .withColumn("xs", F.expr("transform(s, v -> v.c)"))
        .filter(F.size("xs") >= 2)
        .select(
            "user_id",
            F.size("xs").cast("long").alias("n_days"),
            F.expr(
                "aggregate(flatten(transform(sequence(1, size(xs) - 1),"
                " i -> transform(sequence(i + 1, size(xs)),"
                " j -> CASE WHEN element_at(xs, j) > element_at(xs, i) THEN 1"
                "           WHEN element_at(xs, j) < element_at(xs, i) THEN -1"
                "           ELSE 0 END))), 0L, (a, x) -> a + x)"
            )
            .cast("long")
            .alias("s_stat"),
            (F.size("xs").cast("long") * (F.size("xs") - 1) / 2)
            .cast("long")
            .alias("n_pairs"),
        )
    )


_THETA_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id, CAST(ts AS DATE)
),
ser AS (
  SELECT user_id, list(c ORDER BY day) AS xs FROM daily GROUP BY user_id
),
mom AS (
  SELECT user_id, xs, CAST(len(xs) AS BIGINT) AS n,
         CAST(list_sum(xs) AS BIGINT) AS sx,
         CAST(list_sum(list_transform(generate_series(1, len(xs)),
                                      i -> i * xs[i])) AS BIGINT) AS stx
  FROM ser WHERE len(xs) >= 3
),
ols AS (
  SELECT user_id, xs, n, sx,
         CAST(n * stx - (n * (n + 1) // 2) * sx AS DOUBLE)
           / (n * (n * (n + 1) * (2 * n + 1) // 6)
              - (n * (n + 1) // 2) * (n * (n + 1) // 2)) AS b
  FROM mom
),
th AS (
  SELECT user_id, n, b,
         (CAST(sx AS DOUBLE) - b * (n * (n + 1) // 2)) / n AS a,
         list_transform(generate_series(1, len(xs)),
           i -> CAST(2 AS DOUBLE) * xs[i]
                - ((CAST(sx AS DOUBLE) - b * (n * (n + 1) // 2)) / n + b * i))
           AS t2
  FROM ols
),
fold AS (
  SELECT user_id, n, a, b,
         list_reduce(t2,
           (acc, x) -> acc * CAST(0.7 AS DOUBLE) + x * CAST(0.3 AS DOUBLE))
           AS ses
  FROM th
)
SELECT user_id, n AS n_days,
       FLOOR(b * 10000 + 0.5) / 10000 AS slope_cents,
       FLOOR(ses * 10000 + 0.5) / 10000 AS ses_theta2,
       FLOOR((CAST(5 AS DOUBLE) / 10 * (a + b * (n + 1))
              + CAST(5 AS DOUBLE) / 10 * ses) * 10000 + 0.5) / 10000
         AS forecast_cents
FROM fold
"""


@register("ts_theta_forecast", oracle=_THETA_SQL, tier="T2")
def ts_theta_forecast(spark, sf_dir):
    """Theta-method forecast (Assimakopoulos & Nikolopoulos, the M3
    benchmark winner): per user, the one-step-ahead forecast is the
    average of (a) the OLS trendline extrapolated to t = n+1 and (b) an
    SES (α = 0.3) of the theta-2 line 2x_t − trend_t — the
    double-the-curvature trick that makes SES trend-aware without Holt's
    second smoothing constant.

    Determinism: OLS moments are exact int64 (Σt, Σt² by closed form,
    Σx, Σtx from the day-ordered list); slope/intercept are ONE fixed
    IEEE expression; the theta-2 series and its SES fold are identical
    double chains in both engines (DuckDB list_reduce seeds with the
    first element, matching the EWMA discipline). Outputs half-up 4dp.
    Headroom: n·Σtx ≤ n²·days·cents ≈ 1e13 at sf1 — int64-safe past
    SF 100.

    Scale note: identical shape to every ts_* fold — one user_id shuffle,
    series bounded by calendar days.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(cents(F.col("value"))).cast("long").alias("c"))
    )
    ser = (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "c"))).alias("s"))
        .withColumn("xs", F.expr("transform(s, v -> v.c)"))
        .filter(F.size("xs") >= 3)
    )
    mom = ser.select(
        "user_id",
        "xs",
        F.size("xs").cast("long").alias("n"),
        F.expr("aggregate(xs, 0L, (a, x) -> a + x)").alias("sx"),
        F.expr(
            "aggregate(transform(sequence(1, size(xs)), i -> CAST(i AS BIGINT)"
            " * element_at(xs, i)), 0L, (a, x) -> a + x)"
        ).alias("stx"),
    )
    st = F.col("n") * (F.col("n") + 1) / 2  # integer (n(n+1) even)
    st2 = F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1) / 6
    b = (F.col("n") * F.col("stx") - st * F.col("sx")).cast("double") / (
        F.col("n") * st2 - st * st
    )
    ols = mom.select("user_id", "xs", "n", "sx", b.alias("b"))
    a_expr = (F.col("sx").cast("double") - F.col("b") * (F.col("n") * (F.col("n") + 1) / 2)) / F.col("n")
    th = ols.select(
        "user_id",
        "n",
        "b",
        a_expr.alias("a"),
        F.expr(
            "transform(sequence(1, size(xs)), i -> CAST(2 AS DOUBLE)"
            " * element_at(xs, i) - (((CAST(sx AS DOUBLE) - b *"
            " (CAST(n AS DOUBLE) * (n + 1) / 2)) / n) + b * i))"
        ).alias("t2"),
    )
    fold = th.select(
        "user_id",
        "n",
        "a",
        "b",
        F.expr(
            "aggregate(slice(t2, 2, greatest(size(t2) - 1, 0)), element_at(t2, 1),"
            " (acc, x) -> acc * CAST(0.7 AS DOUBLE) + x * CAST(0.3 AS DOUBLE))"
        ).alias("ses"),
    )
    half = F.lit(5).cast("double") / 10
    return fold.select(
        "user_id",
        F.col("n").alias("n_days"),
        (F.floor(F.col("b") * 10000 + F.lit(0.5)) / 10000).alias("slope_cents"),
        (F.floor(F.col("ses") * 10000 + F.lit(0.5)) / 10000).alias("ses_theta2"),
        (
            F.floor(
                (half * (F.col("a") + F.col("b") * (F.col("n") + 1)) + half * F.col("ses"))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("forecast_cents"),
    )


_SMAX_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY CAST(ts AS DATE)
),
w AS (
  SELECT day, c,
         CAST(SUM(c) OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS s5,
         CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 4 PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n5,
         CAST(SUM(c) OVER (ORDER BY day ROWS BETWEEN 19 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS s20,
         CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 19 PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n20,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM daily
),
sig AS (
  SELECT day, c, s5, s20,
         CASE WHEN s5 * n20 > s20 * n5 THEN 1 ELSE 0 END AS fast_above,
         LAG(CASE WHEN s5 * n20 > s20 * n5 THEN 1 ELSE 0 END)
           OVER (ORDER BY day) AS prev_above
  FROM w WHERE rn >= 20
)
SELECT day, c AS day_cents, s5 AS sum5_cents, s20 AS sum20_cents,
       CASE WHEN fast_above = 1 AND prev_above = 0 THEN 'golden_cross'
            WHEN fast_above = 0 AND prev_above = 1 THEN 'death_cross'
       END AS signal
FROM sig WHERE prev_above IS NOT NULL AND fast_above != prev_above
"""


@register("ts_sma_crossover", oracle=_SMAX_SQL, tier="T2")
def ts_sma_crossover(spark, sf_dir):
    """SMA crossover signals on daily revenue: days where the 5-day moving
    average crosses the 20-day one (golden cross up / death cross down) —
    the classic regime-change detector, also the shape of every
    short-vs-long-baseline drift alert. Warmup rows (rank < 20) are
    excluded so both averages are full-window.

    Determinism: the mean comparison is the EXACT integer cross product
    s5·n20 > s20·n5 — no division, so no float ever decides a crossing;
    signal days come from an integer lag flip over the total day order.
    Scale note: both frames share one global-ordered window pass over the
    calendar-bounded daily table (the sorts.py global-window note
    applies); cross-multiplication bound s·n ≤ 20·Σcents — int64-safe
    past SF 1000.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("c"))
    )
    w5 = Window.orderBy("day").rowsBetween(-4, 0)
    w20 = Window.orderBy("day").rowsBetween(-19, 0)
    wo = Window.orderBy("day")
    w = daily.select(
        "day",
        "c",
        F.sum("c").over(w5).cast("long").alias("s5"),
        F.count(F.lit(1)).over(w5).cast("long").alias("n5"),
        F.sum("c").over(w20).cast("long").alias("s20"),
        F.count(F.lit(1)).over(w20).cast("long").alias("n20"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= 20)
    above = F.when(
        F.col("s5") * F.col("n20") > F.col("s20") * F.col("n5"), 1
    ).otherwise(0)
    sig = w.select(
        "day",
        "c",
        "s5",
        "s20",
        above.alias("fast_above"),
        F.lag(above).over(Window.orderBy("day")).alias("prev_above"),
    )
    return sig.filter(
        F.col("prev_above").isNotNull() & (F.col("fast_above") != F.col("prev_above"))
    ).select(
        "day",
        F.col("c").alias("day_cents"),
        F.col("s5").alias("sum5_cents"),
        F.col("s20").alias("sum20_cents"),
        F.when(
            (F.col("fast_above") == 1) & (F.col("prev_above") == 0), "golden_cross"
        )
        .when((F.col("fast_above") == 0) & (F.col("prev_above") == 1), "death_cross")
        .alias("signal"),
    )


# 1D Kalman filter (random-walk state, noisy observation) constants:
# process noise Q and observation noise R in dollars^2. State is a
# 2-element DOUBLE array [x, P] (array, not struct — see ts_holt_linear).
_KAL_Q = "1.0"
_KAL_R = "25.0"


def _kalman_step(acc1: str, acc2: str, x1: str) -> tuple[str, str]:
    """One predict+update: P_pred = P + Q; K = P_pred/(P_pred + R);
    x' = x + K*(z - x); P' = (1 - K) * P_pred. The gain K is re-spelled
    wherever needed (no let-bindings in either lambda dialect)."""
    ppred = f"({acc2} + {_KAL_Q})"
    gain = f"({ppred} / ({ppred} + {_KAL_R}))"
    nx = f"({acc1} + {gain} * ({x1} - {acc1}))"
    np_ = f"((1.0 - {gain}) * {ppred})"
    return nx, np_


_KF_NX, _KF_NP = _kalman_step("acc[1]", "acc[2]", "x[1]")

_KALMAN_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS dval
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
),
srt AS (
  SELECT user_id,
         list_transform(list(dval ORDER BY day),
                        v -> [v, CAST(1.0 AS DOUBLE)]) AS lst
  FROM daily GROUP BY user_id
),
fold AS (
  SELECT user_id, len(lst) AS n_days,
         list_reduce(lst, (acc, x) -> [{_KF_NX}, {_KF_NP}]) AS st
  FROM srt
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       (FLOOR(st[1] * 10000 + 0.5) / 10000) AS filt_level,
       (FLOOR(st[2] * 1000000 + 0.5) / 1000000) AS err_var
FROM fold
"""


@register("ts_kalman_filter", oracle=_KALMAN_SQL, tier="T2")
def ts_kalman_filter(spark, sf_dir):
    """1D Kalman filter over each user's daily value series — random-walk
    state with process noise Q=1, observation noise R=25: the optimal
    (under the model) online smoother whose gain ADAPTS per step, unlike
    the fixed-alpha ts_ewma; P converges to the steady-state Riccati value
    (observable in err_var), at which point Kalman IS an EWMA with the
    optimal alpha — the two keys bracket that theory. Initialized at the
    first observation with P₀=1.

    Determinism: the ts_holt_linear fold discipline — day-ordered left
    fold, 2-element double ARRAY state [x, P] (struct accumulators are
    field-sequential in DuckDB's list_reduce), the gain expression
    duplicated into both state updates so both engines execute the
    identical IEEE sequence (two adds, one divide, multiply/subtract per
    step), outputs half-up rounded.

    Scale note: per-user fold over the DAILY aggregate — one user_id
    shuffle for collect_list + groupBy, state O(1) per user; the
    streaming twin is applyInPandasWithState carrying [x, P].
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        money_sum(F.col("value")).alias("dval")
    )
    nx, np_ = _kalman_step(
        "element_at(acc, 1)", "element_at(acc, 2)", "element_at(x, 1)"
    )
    return (
        daily.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "dval"))).alias("s"))
        .withColumn(
            "lst", F.expr("transform(s, v -> array(v.dval, CAST(1.0 AS DOUBLE)))")
        )
        .withColumn(
            "st",
            F.expr(
                f"aggregate(slice(lst, 2, greatest(size(lst) - 1, 0)),"
                f" element_at(lst, 1), (acc, x) -> array({nx}, {np_}))"
            ),
        )
        .select(
            "user_id",
            F.size("lst").cast("long").alias("n_days"),
            (F.floor(F.expr("element_at(st, 1)") * 10000 + F.lit(0.5)) / 10000).alias(
                "filt_level"
            ),
            (
                F.floor(F.expr("element_at(st, 2)") * 1000000 + F.lit(0.5)) / 1000000
            ).alias("err_var"),
        )
    )


@register(
    "ts_dtw_profile",
    oracle="""
WITH RECURSIVE
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id, CAST(ts AS DATE)
),
refs AS (
  SELECT day, SUM(c) // COUNT(*) AS rc FROM daily GROUP BY day
),
r AS (SELECT list(rc ORDER BY day) AS rl FROM refs),
s AS (
  SELECT user_id, list(c ORDER BY day) AS al FROM daily GROUP BY user_id
),
walk(user_id, i, row) AS (
  SELECT s.user_id, 1,
         list_reduce(
           [CAST([] AS BIGINT[])]
             || list_transform(generate_series(1, len(r.rl)), j -> [j]),
           (acc, x) -> acc || [abs(s.al[1] - r.rl[x[1]])
             + CASE WHEN len(acc) = 0 THEN 0 ELSE acc[len(acc)] END]
         )
  FROM s, r
  UNION ALL
  SELECT w.user_id, w.i + 1,
         list_reduce(
           [CAST([] AS BIGINT[])]
             || list_transform(generate_series(1, len(r.rl)), j -> [j]),
           (acc, x) -> acc || [abs(s.al[w.i + 1] - r.rl[x[1]])
             + least(w.row[x[1]],
                     CASE WHEN x[1] = 1 THEN w.row[1]
                          ELSE least(w.row[x[1] - 1], acc[len(acc)]) END)]
         )
  FROM walk w JOIN s ON s.user_id = w.user_id, r
  WHERE w.i < len(s.al)
)
SELECT w.user_id,
       CAST(len(s.al) AS BIGINT) AS n_days,
       CAST(w.row[len(w.row)] AS BIGINT) AS dtw_units
FROM walk w JOIN s ON s.user_id = w.user_id
WHERE w.i = len(s.al)
""",
    tier="T2",
)
def ts_dtw_profile(spark, sf_dir):
    """Dynamic Time Warping distance from each user's daily-spend series to
    the corpus-average daily profile — the alignment-tolerant anomaly
    score (a user whose pattern matches the corpus but shifted two days
    scores near zero, where Euclidean distance would explode): the
    classic DP over the (user-series × reference-series) grid,
    D[i][j] = |aᵢ−rⱼ| + min(D[i−1][j], D[i][j−1], D[i−1][j−1]). The cost
    model is EXACT INT64 cents end-to-end — no float enters the
    recurrence — which is what makes a nontrivial DP oracle-checkable:
    the DuckDB twin replays the identical DP as a recursive CTE over DP
    rows, each row built by a left list-fold (the [[]] || [[j]…] empty-
    accumulator trick) that resolves the in-row D[i][j−1] dependency.

    Scale note: the reference profile is a ≤ |days| array broadcast to
    every executor (audited 1-row crossjoin); per-user work is one
    groupBy(user) collect + an O(days²) Arrow-batched numpy DP — bounded
    by the calendar, not the event count, so 100 TB of events still
    yields 30×30 grids. The genuinely-pairwise DTW variant would block
    pairs first (the dedup recipe) — this profile-anchored form is the
    linear-scan version pipelines prefer at scale.
    """
    import numpy as np

    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("c"))
    ref = (
        daily.groupBy("day")
        .agg(F.expr("sum(c) DIV count(*)").alias("rc"))
        .agg(F.sort_array(F.collect_list(F.struct("day", "rc"))).alias("rs"))
        .select(F.expr("transform(rs, v -> v.rc)").alias("rl"))
    )
    ser = daily.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "c"))).alias("s")
    ).select("user_id", F.expr("transform(s, v -> v.c)").alias("al"))

    @F.pandas_udf("long")
    def dtw(al: pd.Series, rl: pd.Series) -> pd.Series:
        out = []
        for a, r in zip(al, rl):
            a = np.asarray(a, dtype=np.int64)
            r = np.asarray(r, dtype=np.int64)
            n, m = len(a), len(r)
            cost = np.abs(a[:, None] - r[None, :])
            D = np.empty((n, m), dtype=np.int64)
            D[0, :] = np.cumsum(cost[0, :])
            for i in range(1, n):
                D[i, 0] = cost[i, 0] + D[i - 1, 0]
                for j in range(1, m):
                    D[i, j] = cost[i, j] + min(
                        D[i - 1, j], D[i - 1, j - 1], D[i, j - 1]
                    )
            out.append(int(D[n - 1, m - 1]))
        return pd.Series(out)

    return (
        ser.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.size("al").cast("long").alias("n_days"),
            dtw("al", "rl").alias("dtw_units"),
        )
    )


# ----------------------------------------------------------------- SAX

_SAX_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY CAST(ts AS DATE)
),
wk AS (
  SELECT date_diff('day', DATE '1970-01-01', day) // 7 AS week_id,
         CAST(SUM(cents) AS BIGINT) AS week_cents,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
),
sym AS (
  SELECT week_id, week_cents, n_days,
         ntile(4) OVER (ORDER BY week_cents, week_id) AS q
  FROM wk
)
SELECT week_id, week_cents, n_days,
       CASE q WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' ELSE 'd' END
         AS symbol
FROM sym
ORDER BY week_id
"""


@register("ts_sax_symbols", oracle=_SAX_SQL, tier="T2")
def ts_sax_symbols(spark, sf_dir):
    """SAX-style symbolization of the corpus event-value series: PAA over
    fixed 7-epoch-day blocks (weekly exact cent totals), then each block
    discretized to one of 4 symbols by its empirical quartile — the
    symbolic-sequence reduction used for motif discovery and cheap
    whole-series indexing (Lin et al.'s SAX, with rank quartiles instead of
    Gaussian breakpoints so the alphabet needs no float thresholds).

    Determinism: block totals are exact int64 cents; the quartile cut is
    ntile(4) over the TOTAL order (week_cents, week_id), so symbol
    assignment is unique and identical in both engines (remainders fill the
    leading quartiles in both). Weeks are epoch_days DIV 7 blocks, not ISO
    weeks — immune to the engines' week-numbering differences (the
    dayofweek hazard class).
    Scale: two partial+final aggregates (day, then week); the ntile runs
    over the |weeks| block table, which is ~5 000 rows per decade of data —
    driver-scale regardless of event volume.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    wk = daily.groupBy(
        F.expr("datediff(day, DATE '1970-01-01') DIV 7").alias("week_id")
    ).agg(
        F.sum("cents").cast("long").alias("week_cents"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    sym = wk.withColumn(
        "q", F.ntile(4).over(Window.orderBy("week_cents", "week_id"))
    )
    return sym.select(
        "week_id",
        "week_cents",
        "n_days",
        F.when(F.col("q") == 1, "a")
        .when(F.col("q") == 2, "b")
        .when(F.col("q") == 3, "c")
        .otherwise("d")
        .alias("symbol"),
    ).orderBy("week_id")


# --------------------------------------------------------------- Hurst R/S

_HURST_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) AS i, v FROM daily
),
sized AS (
  SELECT m.m, (i - 1) // m.m AS b, (i - 1) % m.m + 1 AS j, v
  FROM idx, (SELECT unnest([8, 16, 32, 64]) AS m) m
),
dev AS (
  SELECT m, b, j, v,
         m * CAST(SUM(v) OVER (PARTITION BY m, b ORDER BY j) AS BIGINT)
           - j * CAST(SUM(v) OVER (PARTITION BY m, b) AS BIGINT) AS c,
         CAST(SUM(v) OVER (PARTITION BY m, b) AS BIGINT) AS s,
         CAST(COUNT(*) OVER (PARTITION BY m, b) AS BIGINT) AS nb
  FROM sized
),
blocks AS (
  SELECT m, b,
         MAX(c) - MIN(c) AS r_scaled,
         m * CAST(SUM(v * v) AS BIGINT) - MAX(s) * MAX(s) AS ss
  FROM dev WHERE nb = m
  GROUP BY m, b
),
rs AS (
  SELECT m,
         CAST(FLOOR(CAST(r_scaled AS DOUBLE) / sqrt(CAST(ss AS DOUBLE))
                    * 1000000) AS BIGINT) AS rs_micro
  FROM blocks WHERE ss > 0 AND r_scaled > 0
),
per_size AS (
  SELECT m AS size,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(rs_micro) AS BIGINT) // COUNT(*) AS mean_rs_micro
  FROM rs GROUP BY m
),
pts AS (
  SELECT size, n_blocks, mean_rs_micro,
         CAST(FLOOR(ln(CAST(size AS DOUBLE)) * 1000) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(mean_rs_micro AS DOUBLE)) * 1000) AS BIGINT) AS y
  FROM per_size
),
reg AS (
  SELECT size, n_blocks, mean_rs_micro,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(x) OVER () AS BIGINT) AS sx,
         CAST(SUM(y) OVER () AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER () AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER () AS BIGINT) AS sxx
  FROM pts
)
SELECT size, n_blocks, mean_rs_micro,
       CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
            WHEN n * sxy - sx * sy >= 0
              THEN ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
            ELSE -(((sx * sy - n * sxy) * 1000000) // (n * sxx - sx * sx))
       END AS hurst_micro
FROM reg
ORDER BY size
"""


@register("ts_hurst_exponent", oracle=_HURST_SQL, tier="T2")
def ts_hurst_exponent(spark, sf_dir):
    """Hurst exponent of the daily event-value series via rescaled-range
    (R/S) analysis: split the day-indexed series into blocks of 8/16/32/64,
    per block take R = range of cumulative mean-deviations and S = the
    population std, average R/S per size, and the Hurst estimate is the
    log-log slope of mean(R/S) vs block size — H≈0.5 random walk, >0.5
    trending, <0.5 mean-reverting.

    Determinism: deviations are carried in m-scaled int64 units
    (C_j = m·Σ_{k≤j}v − j·S, exact, no division) so R_scaled and
    SS = m·Σv² − S² are exact integers; R/S = R_scaled/√SS needs ONE sqrt
    (IEEE exact-rounded) and is floored to micro-units PER BLOCK before the
    cross-block mean (the vec_centroid_drift rule). The final slope reuses
    the text_zipf_slope negation-guarded integer regression. Degenerate
    blocks (flat ⇒ SS=0 or R=0) drop on both sides. Int64 headroom:
    m·Q ≤ 64·(daily cents)²·64 — safe while daily totals stay under ~4e7
    cents; beyond, move v to dollar units (documented cliff).

    Scale: the day table is one partial+final aggregate off the event scan
    (days = driver-scale forever after); the ×4 size explode and block
    windows run over |days|·4 rows. The unpartitioned regression window
    touches exactly 4 rows.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "v"
    )
    sized = idx.select(
        F.explode(F.array(F.lit(8), F.lit(16), F.lit(32), F.lit(64))).alias("m"),
        "i",
        "v",
    ).select(
        "m",
        F.expr("(i - 1) DIV m").alias("b"),
        F.expr("(i - 1) % m + 1").alias("j"),
        "v",
    )
    wrun = Window.partitionBy("m", "b").orderBy("j")
    wall = Window.partitionBy("m", "b")
    dev = sized.select(
        "m",
        "b",
        "j",
        "v",
        (
            F.col("m") * F.sum("v").over(wrun).cast("long")
            - F.col("j") * F.sum("v").over(wall).cast("long")
        ).alias("c"),
        F.sum("v").over(wall).cast("long").alias("s"),
        F.count(F.lit(1)).over(wall).cast("long").alias("nb"),
    )
    blocks = (
        dev.filter(F.col("nb") == F.col("m"))
        .groupBy("m", "b")
        .agg(
            (F.max("c") - F.min("c")).alias("r_scaled"),
            (
                F.first("m") * F.sum(F.col("v") * F.col("v")).cast("long")
                - F.max("s") * F.max("s")
            ).alias("ss"),
        )
    )
    rs = blocks.filter((F.col("ss") > 0) & (F.col("r_scaled") > 0)).select(
        "m",
        F.floor(
            F.col("r_scaled").cast("double")
            / F.sqrt(F.col("ss").cast("double"))
            * 1000000
        )
        .cast("long")
        .alias("rs_micro"),
    )
    per_size = rs.groupBy(F.col("m").alias("size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.expr("CAST(SUM(rs_micro) AS BIGINT) DIV COUNT(*)").alias(
            "mean_rs_micro"
        ),
    )
    pts = per_size.select(
        "size",
        "n_blocks",
        "mean_rs_micro",
        F.floor(F.log(F.col("size").cast("double")) * 1000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("mean_rs_micro").cast("double")) * 1000)
        .cast("long")
        .alias("y"),
    )
    wglob = Window.partitionBy()
    reg = pts.select(
        "size",
        "n_blocks",
        "mean_rs_micro",
        F.count(F.lit(1)).over(wglob).cast("long").alias("n"),
        F.sum("x").over(wglob).cast("long").alias("sx"),
        F.sum("y").over(wglob).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wglob).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wglob).cast("long").alias("sxx"),
    )
    return reg.select(
        "size",
        "n_blocks",
        "mean_rs_micro",
        F.expr(
            """CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
                    WHEN n * sxy - sx * sy >= 0
                      THEN ((n * sxy - sx * sy) * 1000000) DIV (n * sxx - sx * sx)
                    ELSE -(((sx * sy - n * sxy) * 1000000) DIV (n * sxx - sx * sx))
               END"""
        ).alias("hurst_micro"),
    ).orderBy("size")


# -------------------------------------------------------- peak detection

_PEAK_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
ctx AS (
  SELECT day, v,
         lag(v) OVER (ORDER BY day) AS prev,
         lead(v) OVER (ORDER BY day) AS nxt,
         CAST(SUM(v) OVER w AS BIGINT) AS s7,
         CAST(COUNT(*) OVER w AS BIGINT) AS n7
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT day, v, prev, nxt, s7
FROM ctx
WHERE n7 = 7 AND prev IS NOT NULL AND nxt IS NOT NULL
  AND v > prev AND v > nxt AND 35 * v > 6 * s7
ORDER BY day
"""


@register("ts_peak_detection", oracle=_PEAK_SQL, tier="T2")
def ts_peak_detection(spark, sf_dir):
    """Prominent-peak detection on the daily event-value series: a day is a
    peak iff it STRICTLY exceeds both neighbours AND clears 1.2× the
    centered 7-day mean — the two-condition rule (local max + prominence)
    that separates real spikes from sawtooth noise.

    Determinism: daily totals are exact int64 cents; the prominence test
    is the integer cross-multiplication 35·v > 6·Σ₇ (v > 1.2·S/7 without
    any division); strictness makes tie plateaus drop identically in both
    engines. Edge days (incomplete 7-frame or missing neighbour) are
    excluded explicitly rather than left to engine NULL-comparison
    defaults.

    Scale: the day table is driver-scale after one partial+final
    aggregate; the single ordered window over |days| rows is the
    deliberate small-side step (at 100 TB the series is still one row per
    day — partition by series id when there are many series, as
    win_rolling_slope does).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    wo = Window.orderBy("day")
    wf = Window.orderBy("day").rowsBetween(-3, 3)
    ctx = daily.select(
        "day",
        "v",
        F.lag("v").over(wo).alias("prev"),
        F.lead("v").over(wo).alias("nxt"),
        F.sum("v").over(wf).cast("long").alias("s7"),
        F.count(F.lit(1)).over(wf).cast("long").alias("n7"),
    )
    return (
        ctx.filter(
            (F.col("n7") == 7)
            & F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("v") > F.col("prev"))
            & (F.col("v") > F.col("nxt"))
            & (35 * F.col("v") > 6 * F.col("s7"))
        )
        .select("day", "v", "prev", "nxt", "s7")
        .orderBy("day")
    )


# ------------------------------------------------------------ Haar energy

_HAAR_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) - 1 AS i, v FROM daily
),
lv AS (
  SELECT l.lvl, (i.i) // (CASE l.lvl WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)
           AS blk,
         CASE WHEN (i.i // (CASE l.lvl WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 4 END))
                   % 2 = 0
              THEN i.v ELSE -i.v END AS sv,
         i.v
  FROM idx i, (SELECT unnest([1, 2, 3]) AS lvl) l
),
blocks AS (
  SELECT lvl, blk,
         CAST(SUM(sv) AS BIGINT) AS detail,
         CAST(COUNT(*) AS BIGINT) AS nb
  FROM lv GROUP BY lvl, blk
),
full_blocks AS (
  SELECT lvl, detail FROM blocks
  WHERE nb = CASE lvl WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END
)
SELECT CAST(lvl AS BIGINT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(detail * detail) AS BIGINT)
         // (CASE lvl WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END) AS energy
FROM full_blocks
GROUP BY lvl
ORDER BY lvl
"""


@register("ts_haar_energy", oracle=_HAAR_SQL, tier="T2")
def ts_haar_energy(spark, sf_dir):
    """Haar wavelet energy spectrum of the daily event-value series at
    scales 2/4/8 days: each level-ℓ block's detail coefficient is
    (sum of first half) − (sum of second half), and the per-level energy
    Σ detail²/2^ℓ says WHERE the variance lives — day-to-day noise
    (level 1) vs weekly structure (level 3) — the multi-resolution
    companion to [[ts_seasonal_strength]].

    Determinism: ZERO floats — the half-block sign is the parity of
    i DIV 2^(ℓ−1) (pure integer), details are exact int64 cent sums, and
    the energy normalization is one truncating DIV on non-negative
    operands (details squared). Partial trailing blocks are excluded
    explicitly (nb = 2^ℓ). Headroom: detail ≤ 8·daily-cents ≈ 6e7,
    squared 3.6e15, summed over ~90 blocks ≈ 3e17 < 2^63.

    Scale: the day table is driver-scale after one partial+final
    aggregate; the 3-level expansion is a ×3 explode over |days| rows
    with one aggregate on (lvl, blk) — the classic map-side-combinable
    wavelet shape (each finer level could also fold from the coarser,
    but the direct form keeps the oracle flat).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("i"), "v"
    )
    lv = idx.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("lvl"),
        "i",
        "v",
    ).select(
        "lvl",
        F.expr(
            "i DIV (CASE lvl WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)"
        ).alias("blk"),
        F.expr(
            """CASE WHEN (i DIV (CASE lvl WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 4 END))
                     % 2 = 0
                    THEN v ELSE -v END"""
        ).alias("sv"),
    )
    blocks = lv.groupBy("lvl", "blk").agg(
        F.sum("sv").cast("long").alias("detail"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    full = blocks.filter(
        F.col("nb") == F.expr("CASE lvl WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END")
    )
    return (
        full.groupBy("lvl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.expr(
                """CAST(SUM(detail * detail) AS BIGINT)
                   DIV (CASE lvl WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)"""
            ).alias("energy"),
        )
        .select(F.col("lvl").cast("long").alias("lvl"), "n_blocks", "energy")
        .orderBy("lvl")
    )


# -------------------------------------------------------- sample entropy

_SAMPEN_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) AS i, v,
         lead(v, 1) OVER (ORDER BY day) AS v1,
         lead(v, 2) OVER (ORDER BY day) AS v2
  FROM daily
),
r AS (
  SELECT (MAX(v) - MIN(v)) // 10 AS tol FROM daily
),
tpl AS (
  SELECT i, v, v1, v2 FROM idx WHERE v2 IS NOT NULL
),
pairs AS (
  SELECT CASE WHEN GREATEST(abs(a.v - b.v), abs(a.v1 - b.v1)) <= r.tol
              THEN 1 ELSE 0 END AS mb,
         CASE WHEN GREATEST(abs(a.v - b.v), abs(a.v1 - b.v1),
                            abs(a.v2 - b.v2)) <= r.tol
              THEN 1 ELSE 0 END AS ma
  FROM tpl a JOIN tpl b ON a.i < b.i, r
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MAX(r.tol) AS BIGINT) AS tol,
       CAST(SUM(mb) AS BIGINT) AS b_matches,
       CAST(SUM(ma) AS BIGINT) AS a_matches,
       CASE WHEN SUM(ma) = 0 OR SUM(mb) = 0 THEN NULL
            ELSE CAST(FLOOR(ln(CAST(SUM(mb) AS DOUBLE)) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(CAST(SUM(ma) AS DOUBLE)) * 1000000) AS BIGINT)
       END AS sampen_micro
FROM pairs, r
GROUP BY r.tol
"""


@register("ts_sample_entropy", oracle=_SAMPEN_SQL, tier="T2")
def ts_sample_entropy(spark, sf_dir):
    """Sample entropy (SampEn, m=2) of the daily event-value series:
    −ln(A/B) where B counts template pairs of length 2 within Chebyshev
    tolerance r and A the same pairs still matching at length 3 — the
    regularity measure from physiology (low SampEn = predictable,
    high = complex) that [[ts_hurst_exponent]]'s long-memory view doesn't
    capture. Tolerance r = range/10 in exact cents (data-driven yet
    integer-deterministic).

    Determinism: matches are pure integer Chebyshev comparisons; SampEn
    is ln(B) − ln(A) with each log independently floored to micro-nats
    (the quantized-log recipe), zero-match degenerates to NULL on both
    sides.

    Scale: the template table is driver-scale (one row per DAY); the
    all-pairs match is the deliberate bounded O(days²) triangle — ~250k
    comparisons per decade, the stats_survival_km precedent — with the
    tolerance broadcast as a 1-row scalar. For per-entity series at
    100 TB, partition by entity and the triangle stays per-entity-bounded.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    wo = Window.orderBy("day")
    idx = daily.select(
        F.row_number().over(wo).alias("i"),
        "v",
        F.lead("v", 1).over(wo).alias("v1"),
        F.lead("v", 2).over(wo).alias("v2"),
    )
    r = daily.agg(F.expr("(MAX(v) - MIN(v)) DIV 10").alias("tol"))
    tpl = idx.filter(F.col("v2").isNotNull())
    a = tpl.select(
        F.col("i").alias("ia"),
        F.col("v").alias("av"),
        F.col("v1").alias("av1"),
        F.col("v2").alias("av2"),
    )
    b = tpl.select(
        F.col("i").alias("ib"),
        F.col("v").alias("bv"),
        F.col("v1").alias("bv1"),
        F.col("v2").alias("bv2"),
    )
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .crossJoin(F.broadcast(r))
        .select(
            F.expr(
                """CASE WHEN GREATEST(abs(av - bv), abs(av1 - bv1)) <= tol
                        THEN 1 ELSE 0 END"""
            ).alias("mb"),
            F.expr(
                """CASE WHEN GREATEST(abs(av - bv), abs(av1 - bv1),
                                      abs(av2 - bv2)) <= tol
                        THEN 1 ELSE 0 END"""
            ).alias("ma"),
            "tol",
        )
    )
    return pairs.groupBy("tol").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.max("tol").cast("long").alias("tol2"),
        F.sum("mb").cast("long").alias("b_matches"),
        F.sum("ma").cast("long").alias("a_matches"),
        F.expr(
            """CASE WHEN SUM(ma) = 0 OR SUM(mb) = 0 THEN NULL
                    ELSE CAST(FLOOR(ln(CAST(SUM(mb) AS DOUBLE)) * 1000000) AS BIGINT)
                       - CAST(FLOOR(ln(CAST(SUM(ma) AS DOUBLE)) * 1000000) AS BIGINT)
               END"""
        ).alias("sampen_micro"),
    ).select(
        "n_pairs",
        F.col("tol2").alias("tol"),
        "b_matches",
        "a_matches",
        "sampen_micro",
    )


# ---------------------------------------------------------- record highs

_RECORDS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
run AS (
  SELECT day, v,
         CAST(MAX(v) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT) AS prev_max
  FROM daily
)
SELECT day, v, prev_max,
       CASE WHEN prev_max IS NULL OR v > prev_max THEN 1 ELSE 0 END
         AS is_record,
       CAST(SUM(CASE WHEN prev_max IS NULL OR v > prev_max THEN 1 ELSE 0 END)
            OVER (ORDER BY day) AS BIGINT) AS records_to_date
FROM run
WHERE prev_max IS NULL OR v > prev_max
ORDER BY day
"""


@register("ts_record_highs", oracle=_RECORDS_SQL, tier="T2")
def ts_record_highs(spark, sf_dir):
    """Record-breaking days: each day whose total strictly exceeds every
    previous day's, with the running record count — the "new all-time
    high" stream behind alerting and trend narratives. Under an i.i.d.
    series the expected count is harmonic (~ln n), so a surplus of records
    IS the trend signal ([[ts_mann_kendall]]'s cousin via record
    statistics).

    Determinism: pure int64 — the prior peak is a rows-frame running MAX
    ending 1 PRECEDING (so ties are NOT records — strictness spelled the
    same both sides), day one is a record by convention on both sides.

    Scale: the day table is driver-scale after one partial+final
    aggregate; the single ordered window is over |days| rows (partition by
    series id for many series, as win_rolling_slope does).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    wrun = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = daily.select(
        "day", "v", F.max("v").over(wprev).cast("long").alias("prev_max")
    )
    flagged = run.select(
        "day",
        "v",
        "prev_max",
        F.when(
            F.col("prev_max").isNull() | (F.col("v") > F.col("prev_max")), 1
        )
        .otherwise(0)
        .alias("is_record"),
    ).withColumn(
        "records_to_date", F.sum("is_record").over(wrun).cast("long")
    )
    return flagged.filter(F.col("is_record") == 1).orderBy("day")


# -------------------------------------------------------- turning points

_TURNS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
ctx AS (
  SELECT v,
         lag(v) OVER (ORDER BY day) AS p,
         lead(v) OVER (ORDER BY day) AS nx
  FROM daily
),
t AS (
  SELECT CASE WHEN (v > p AND v > nx) OR (v < p AND v < nx)
              THEN 1 ELSE 0 END AS turn
  FROM ctx WHERE p IS NOT NULL AND nx IS NOT NULL
)
SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n_days,
       CAST(SUM(turn) AS BIGINT) AS n_turns,
       (2 * (COUNT(*) + 2 - 2) * 1000000) // 3 AS expected_micro,
       CASE WHEN 16 * (COUNT(*) + 2) - 29 <= 0 THEN NULL
            ELSE CAST(FLOOR(
              (CAST(SUM(turn) AS DOUBLE)
                 - 2.0 * (COUNT(*) + 2 - 2) / 3.0)
              / sqrt((16.0 * (COUNT(*) + 2) - 29.0) / 90.0)
              * 1000000) AS BIGINT) END AS z_micro
FROM t
"""


@register("ts_turning_points", oracle=_TURNS_SQL, tier="T2")
def ts_turning_points(spark, sf_dir):
    """Turning-point test of the daily event-value series: count strict
    local extrema; an i.i.d. series has E[T] = 2(n−2)/3 and
    Var[T] = (16n−29)/90, so the standardized excess is a quick
    randomness-vs-smoothness check — too few turns means trend/momentum
    (cf. [[ts_mann_kendall]]), too many means oscillation. Strictness makes
    tie plateaus contribute nothing, identically in both engines.

    Determinism: turns are pure integer comparisons; the expectation is
    exact integer micro-units; the z-score is ONE identically-spelled
    double expression (subtract, divide, IEEE sqrt) floored to micro.

    Scale: day table is driver-scale after one partial+final aggregate;
    one ordered window over |days| rows.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("v")
    )
    wo = Window.orderBy("day")
    ctx = daily.select(
        "v", F.lag("v").over(wo).alias("p"), F.lead("v").over(wo).alias("nx")
    ).filter(F.col("p").isNotNull() & F.col("nx").isNotNull())
    t = ctx.select(
        F.expr(
            """CASE WHEN (v > p AND v > nx) OR (v < p AND v < nx)
                    THEN 1 ELSE 0 END"""
        ).alias("turn")
    )
    return t.agg(
        (F.count(F.lit(1)) + 2).cast("long").alias("n_days"),
        F.sum("turn").cast("long").alias("n_turns"),
        F.expr("(2 * (COUNT(*) + 2 - 2) * 1000000) DIV 3").alias(
            "expected_micro"
        ),
        F.expr(
            """CASE WHEN 16 * (COUNT(*) + 2) - 29 <= 0 THEN NULL
                    ELSE CAST(FLOOR(
                      (CAST(SUM(turn) AS DOUBLE)
                         - 2.0 * (COUNT(*) + 2 - 2) / 3.0)
                      / sqrt((16.0 * (COUNT(*) + 2) - 29.0) / 90.0)
                      * 1000000) AS BIGINT) END"""
        ).alias("z_micro"),
    )


# ---------------------------------------------------------------- PACF
# Durbin–Levinson unrolled ALGEBRAICALLY over the 5 quantized lag
# autocorrelations — both engines evaluate the CHARACTER-IDENTICAL
# expression strings below on identical double inputs (micro-int rho / 1e6),
# so every intermediate is the same IEEE value by construction.

_PACF_M = 5


def _dl_exprs() -> list[tuple[str, str]]:
    """(name, expr) pairs of the Durbin–Levinson recursion over r1..r5.

    Level k: phi_kk = (r_k − Σ_{j<k} phi_{k-1,j}·r_{k-j})
                      / (1 − Σ_{j<k} phi_{k-1,j}·r_j),
             phi_kj = phi_{k-1,j} − phi_kk·phi_{k-1,k-j}.
    Emitted in dependency order; each name is unique so the pairs can be
    applied as successive projection layers in either engine.
    """
    out: list[tuple[str, str]] = [("p1_1", "r1")]
    prev = {1: "p1_1"}
    for k in range(2, _PACF_M + 1):
        num = " + ".join(f"{prev[j]} * r{k - j}" for j in range(1, k))
        den = " + ".join(f"{prev[j]} * r{j}" for j in range(1, k))
        kk = f"p{k}_{k}"
        out.append((kk, f"(r{k} - ({num})) / (1 - ({den}))"))
        cur = {k: kk}
        for j in range(1, k):
            nm = f"p{k}_{j}"
            out.append((nm, f"{prev[j]} - {kk} * {prev[k - j]}"))
            cur[j] = nm
        prev = cur
    return out


_PACF_RHO_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
lagged AS (
  SELECT l.lag, a.u AS a, b.u AS b
  FROM (SELECT unnest([1, 2, 3, 4, 5]) AS lag) l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
),
s AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(a) AS sa, SUM(b) AS sb, SUM(a * b) AS sab,
         SUM(a * a) AS saa, SUM(b * b) AS sbb
  FROM lagged GROUP BY lag
),
rho AS (
  SELECT lag,
         CAST(FLOOR(((n * sab - sa * sb)
                     / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                            * CAST(n * sbb - sb * sb AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT) AS rho_micro
  FROM s
)
"""


def _pacf_oracle() -> str:
    layers = "SELECT " + ", ".join(
        f"CAST(SUM(CASE WHEN lag = {k} THEN rho_micro END) AS DOUBLE) / 1000000"
        f" AS r{k}"
        for k in range(1, _PACF_M + 1)
    ) + " FROM rho"
    src = f"({layers})"
    for name, expr in _dl_exprs():
        src = f"(SELECT *, {expr} AS {name} FROM {src})"
    finals = ", ".join(
        f"FLOOR(p{k}_{k} * 10000 + 0.5) / 10000 AS pacf{k}"
        for k in range(1, _PACF_M + 1)
    )
    rs = ", ".join(
        f"CAST(FLOOR(r{k} * 1000000 + 0.5) AS BIGINT) AS r{k}_micro"
        for k in range(1, _PACF_M + 1)
    )
    return f"{_PACF_RHO_SQL} SELECT {rs}, {finals} FROM {src}"


@register("ts_pacf", oracle=_pacf_oracle(), tier="T2")
def ts_pacf(spark, sf_dir):
    """Partial autocorrelation (lags 1..5) of the daily value series via the
    Durbin–Levinson recursion — the AR-order diagnostic that separates
    direct lag-k dependence from what lower lags already explain
    ([[ts_autocorrelation]] gives the raw ACF this consumes).

    Determinism: the five lag autocorrelations come from exact int64
    sufficient statistics (the ts_autocorrelation recipe) and are
    quantized to 1e-6 micro-ints BEFORE entering the recursion; the DL
    recursion itself is unrolled ALGEBRAICALLY into character-identical
    expression strings evaluated by both engines on those identical double
    inputs (same parse → same IEEE op sequence → bit-equal intermediates),
    with one 1e-4 round at the end. No fold state, no libm beyond the one
    shared sqrt in rho.

    Scale note: one daily-grain shuffle + a 5× |days| lag fan-out; the
    recursion runs on a SINGLE one-row projection chain (pure expression
    layers, zero exchanges).
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).cast("long").alias("u"))
    lagged = daily.select(
        "day", "u", F.explode(F.sequence(F.lit(1), F.lit(_PACF_M))).alias("lag")
    )
    shifted = daily.select(F.col("day").alias("bday"), F.col("u").alias("b"))
    pairs = lagged.join(
        shifted, F.date_add(F.col("day"), F.col("lag").cast("int")) == F.col("bday")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("u") * F.col("b")).alias("sab"),
        F.sum(F.col("u") * F.col("u")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    rho = s.select(
        "lag",
        F.expr(
            """CAST(FLOOR(((n * sab - sa * sb)
                           / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                                  * CAST(n * sbb - sb * sb AS DOUBLE)))
                          * 1000000 + 0.5) AS BIGINT)"""
        ).alias("rho_micro"),
    )
    row = rho.agg(
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN lag = {k} THEN rho_micro END) AS DOUBLE)"
                f" / 1000000"
            ).alias(f"r{k}")
            for k in range(1, _PACF_M + 1)
        ]
    )
    for name, expr in _dl_exprs():
        row = row.select("*", F.expr(expr).alias(name))
    return row.select(
        *[
            F.expr(f"CAST(FLOOR(r{k} * 1000000 + 0.5) AS BIGINT)").alias(
                f"r{k}_micro"
            )
            for k in range(1, _PACF_M + 1)
        ],
        *[
            F.expr(f"FLOOR(p{k}_{k} * 10000 + 0.5) / 10000").alias(f"pacf{k}")
            for k in range(1, _PACF_M + 1)
        ],
    )


# ------------------------------------------------- Granger causality (1 lag)
# Shared closed-form OLS expressions over exact int64 sufficient statistics:
# both engines evaluate CHARACTER-IDENTICAL strings on identical inputs.

_GRANGER_STATS = [
    "n", "sa", "sb", "st", "saa", "sbb", "stt", "sab", "sat", "sbt",
]

# restricted model  t = d0 + d1*a :
#   RSS_r = (Stt - St*St/n) - (Sat - Sa*St/n)^2 / (Saa - Sa*Sa/n)
_GRANGER_RSS_R = (
    "((stt - CAST(st AS DOUBLE) * st / n)"
    " - (sat - CAST(sa AS DOUBLE) * st / n) * (sat - CAST(sa AS DOUBLE) * st / n)"
    "   / (saa - CAST(sa AS DOUBLE) * sa / n))"
)

# full model t = c0 + c1*a + c2*b via Cramer on the 3x3 normal equations.
_GRANGER_DETS = [
    (
        "det_m",
        "(CAST(n AS DOUBLE) * (CAST(saa AS DOUBLE) * sbb - CAST(sab AS DOUBLE) * sab)"
        " - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) * sbb - CAST(sab AS DOUBLE) * sb)"
        " + CAST(sb AS DOUBLE) * (CAST(sa AS DOUBLE) * sab - CAST(saa AS DOUBLE) * sb))",
    ),
    (
        "det_0",
        "(CAST(st AS DOUBLE) * (CAST(saa AS DOUBLE) * sbb - CAST(sab AS DOUBLE) * sab)"
        " - CAST(sa AS DOUBLE) * (CAST(sat AS DOUBLE) * sbb - CAST(sab AS DOUBLE) * sbt)"
        " + CAST(sb AS DOUBLE) * (CAST(sat AS DOUBLE) * sab - CAST(saa AS DOUBLE) * sbt))",
    ),
    (
        "det_1",
        "(CAST(n AS DOUBLE) * (CAST(sat AS DOUBLE) * sbb - CAST(sbt AS DOUBLE) * sab)"
        " - CAST(st AS DOUBLE) * (CAST(sa AS DOUBLE) * sbb - CAST(sab AS DOUBLE) * sb)"
        " + CAST(sb AS DOUBLE) * (CAST(sa AS DOUBLE) * sbt - CAST(sat AS DOUBLE) * sb))",
    ),
    (
        "det_2",
        "(CAST(n AS DOUBLE) * (CAST(saa AS DOUBLE) * sbt - CAST(sab AS DOUBLE) * sat)"
        " - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) * sbt - CAST(sat AS DOUBLE) * sb)"
        " + CAST(st AS DOUBLE) * (CAST(sa AS DOUBLE) * sab - CAST(saa AS DOUBLE) * sb))",
    ),
]

_GRANGER_LAYER2 = [
    ("c0", "det_0 / det_m"),
    ("c1", "det_1 / det_m"),
    ("c2", "det_2 / det_m"),
    ("rss_r", _GRANGER_RSS_R),
]

_GRANGER_LAYER3 = [
    ("rss_f", "stt - (c0 * st + c1 * sat + c2 * sbt)"),
]

_GRANGER_FINAL = [
    ("n_days", "CAST(n AS BIGINT)"),
    ("rss_r_rnd", "FLOOR(rss_r * 100 + 0.5) / 100"),
    ("rss_f_rnd", "FLOOR(rss_f * 100 + 0.5) / 100"),
    (
        "f_stat",
        "FLOOR(((rss_r - rss_f) * (n - 3) / rss_f) * 10000 + 0.5) / 10000",
    ),
]

_GRANGER_DAILY_SQL = """
daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ux,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS uy
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
rows_ AS (
  SELECT cur.uy AS t, prv.uy AS a, prv.ux AS b
  FROM daily cur JOIN daily prv ON cur.day = prv.day + 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(a * a) AS BIGINT) AS saa, CAST(SUM(b * b) AS BIGINT) AS sbb,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         CAST(SUM(a * b) AS BIGINT) AS sab, CAST(SUM(a * t) AS BIGINT) AS sat,
         CAST(SUM(b * t) AS BIGINT) AS sbt
  FROM rows_
)
"""


def _granger_oracle() -> str:
    src = "(SELECT * FROM s)"
    for layer in (_GRANGER_DETS, _GRANGER_LAYER2, _GRANGER_LAYER3):
        adds = ", ".join(f"{e} AS {nm}" for nm, e in layer)
        src = f"(SELECT *, {adds} FROM {src})"
    finals = ", ".join(f"{e} AS {nm}" for nm, e in _GRANGER_FINAL)
    return f"WITH {_GRANGER_DAILY_SQL} SELECT {finals} FROM {src}"


@register("ts_granger_1lag", oracle=_granger_oracle(), tier="T2")
def ts_granger_1lag(spark, sf_dir):
    """One-lag Granger causality test: does yesterday's PURCHASE volume
    improve predicting today's VIEW volume beyond yesterday's views alone?
    F = ((RSS_r − RSS_f)/1) / (RSS_f/(n−3)) comparing the restricted AR(1)
    to the full model with the cross-lag regressor — the lead-lag
    screening test a metrics pipeline runs before trusting a driver metric
    ([[ts_xcorr_lags]] finds the lag; this tests its predictive value).

    Determinism: all ten sufficient statistics are exact int64 sums of
    cent units; the 2-regressor OLS is solved closed-form via Cramer
    determinants with both engines evaluating CHARACTER-IDENTICAL
    expression strings on those identical inputs (the ts_pacf rule —
    same parse, same IEEE sequence); RSS and F round once at the end.

    Scale note: one daily-grain shuffle, a consecutive-day self-join on
    the |days|-row aggregate, then a single 1-row projection chain.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    cents_ = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(
            F.expr(f"CASE WHEN event_type = 'purchase' THEN {cents_} ELSE 0 END")
        ).cast("long").alias("ux"),
        F.sum(
            F.expr(f"CASE WHEN event_type = 'view' THEN {cents_} ELSE 0 END")
        ).cast("long").alias("uy"),
    )
    prv = daily.select(
        F.col("day").alias("pday"), F.col("uy").alias("a"), F.col("ux").alias("b")
    )
    rows = daily.join(
        prv, daily["day"] == F.date_add(F.col("pday"), 1)
    ).select(F.col("uy").alias("t"), "a", "b")
    s = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
        F.sum(F.col("a") * F.col("t")).cast("long").alias("sat"),
        F.sum(F.col("b") * F.col("t")).cast("long").alias("sbt"),
    )
    row = s
    for layer in (_GRANGER_DETS, _GRANGER_LAYER2, _GRANGER_LAYER3):
        row = row.select("*", *[F.expr(e).alias(nm) for nm, e in layer])
    return row.select(*[F.expr(e).alias(nm) for nm, e in _GRANGER_FINAL])


_VEL_ACC_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
           AS eday,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
)
SELECT CAST(cur.eday AS BIGINT) AS eday, cur.u,
       CAST(cur.u - p1.u AS BIGINT) AS velocity,
       CAST(cur.u - 2 * p1.u + p2.u AS BIGINT) AS acceleration
FROM daily cur
JOIN daily p1 ON p1.eday = cur.eday - 1
JOIN daily p2 ON p2.eday = cur.eday - 2
"""


@register("ts_velocity_accel", oracle=_VEL_ACC_SQL, tier="T2")
def ts_velocity_accel(spark, sf_dir):
    """First and second discrete derivatives (velocity / acceleration) of
    the daily value series — the monitoring primitives behind "is the
    metric still growing, and is the growth itself slowing?" Emitted only
    for days with BOTH prior calendar days present, so gaps yield no
    fabricated derivatives (the calendar-join discipline of
    [[ts_autocorrelation]], not a row-based lag that silently spans
    gaps).

    Determinism: PURE int64 — epoch-day keys, exact cent sums, integer
    differences.

    Scale: one daily-grain aggregate, two self-equi-joins on the
    |days|-row table (broadcastable at any horizon).
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("eday")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("u")
    )
    p1 = daily.select(F.col("eday").alias("e1"), F.col("u").alias("u1"))
    p2 = daily.select(F.col("eday").alias("e2"), F.col("u").alias("u2"))
    return (
        daily.join(p1, F.col("e1") == F.col("eday") - 1)
        .join(p2, F.col("e2") == F.col("eday") - 2)
        .select(
            F.col("eday").cast("long").alias("eday"),
            "u",
            (F.col("u") - F.col("u1")).cast("long").alias("velocity"),
            (F.col("u") - 2 * F.col("u1") + F.col("u2"))
            .cast("long")
            .alias("acceleration"),
        )
    )


_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
           AS eday,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
idx AS (
  SELECT eday, u,
         row_number() OVER (ORDER BY eday) AS i,
         SUM(u) OVER (ORDER BY eday ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS pre
  FROM daily
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(u) AS BIGINT) AS s
        FROM daily),
-- between-segment sum of squares at split after row i (1 <= i < n):
-- BSS(i) = pre_i^2/i + (s-pre_i)^2/(n-i) - s^2/n; maximize the first two
-- terms. Carried as exact int64 floor units (the kruskal per-term rule),
-- computed on DOLLAR prefixes (// 100) so the squares stay inside int64
-- even for a pathological all-mass-on-one-day series.
scored AS (
  SELECT idx.eday, idx.i, idx.pre, tot.n, tot.s,
         CAST(FLOOR(CAST(idx.pre // 100 AS DOUBLE)
                    * CAST(idx.pre // 100 AS DOUBLE)
                    / CAST(idx.i AS DOUBLE)) AS BIGINT)
         + CAST(FLOOR(CAST((tot.s - idx.pre) // 100 AS DOUBLE)
                      * CAST((tot.s - idx.pre) // 100 AS DOUBLE)
                      / CAST(tot.n - idx.i AS DOUBLE)) AS BIGINT) AS bss_units
  FROM idx CROSS JOIN tot
  WHERE idx.i < tot.n
),
best AS (
  SELECT eday, i, pre, n, s, bss_units
  FROM (SELECT *, row_number() OVER (ORDER BY bss_units DESC, eday) AS rk
        FROM scored)
  WHERE rk = 1
)
SELECT CAST(eday AS BIGINT) AS split_after_eday,
       CAST(i AS BIGINT) AS n_left,
       CAST(n - i AS BIGINT) AS n_right,
       CAST(pre // i AS BIGINT) AS mean_left_cents,
       CAST((s - pre) // (n - i) AS BIGINT) AS mean_right_cents,
       bss_units
FROM best
"""


@register("ts_changepoint_split", oracle=_CHANGEPOINT_SQL, tier="T2")
def ts_changepoint_split(spark, sf_dir):
    """Single change-point estimate for the daily value series: the split
    that maximizes the between-segment sum of squares (the binary-
    segmentation step every changepoint algorithm iterates; [[ts_cusum]]
    monitors drift online, this localizes WHERE the level shifted).

    Determinism: prefix sums and counts are exact int64; each split's
    BSS contribution pre²/i + (s−pre)²/(n−i) is floored to integer units
    per term (the kruskal rule — two correctly-rounded IEEE ops from
    exact int64 inputs, so the floor input is bit-identical in both
    engines — computed on DOLLAR (// 100) prefixes so even an
    all-mass-on-one-day series keeps the squares inside int64); the
    argmax tie-breaks on earliest day; segment means are non-negative
    `//` cents. Note pre ≥ 0 so Spark DIV ≡ DuckDB // on both scalings.

    Scale note: one daily-grain aggregate, one |days|-row prefix window,
    one TakeOrderedAndProject argmax — the candidate-split scan is
    O(days) with no self-join (prefix sums make BSS(i) closed-form).
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("eday")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("u")
    )
    wo = Window.orderBy("eday")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = daily.select(
        "eday",
        F.row_number().over(wo).alias("i"),
        F.sum("u").over(wc).alias("pre"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("u").cast("long").alias("s"),
    )
    scored = (
        idx.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            "eday",
            "i",
            "pre",
            "n",
            "s",
            F.expr(
                """CAST(FLOOR(CAST(pre DIV 100 AS DOUBLE)
                              * CAST(pre DIV 100 AS DOUBLE)
                              / CAST(i AS DOUBLE)) AS BIGINT)
                   + CAST(FLOOR(CAST((s - pre) DIV 100 AS DOUBLE)
                                * CAST((s - pre) DIV 100 AS DOUBLE)
                                / CAST(n - i AS DOUBLE)) AS BIGINT)"""
            ).alias("bss_units"),
        )
    )
    best = (
        scored.orderBy(F.col("bss_units").desc(), "eday")
        .limit(1)
    )
    return best.select(
        F.col("eday").cast("long").alias("split_after_eday"),
        F.col("i").cast("long").alias("n_left"),
        (F.col("n") - F.col("i")).cast("long").alias("n_right"),
        F.expr("CAST(pre DIV i AS BIGINT)").alias("mean_left_cents"),
        F.expr("CAST((s - pre) DIV (n - i) AS BIGINT)").alias(
            "mean_right_cents"
        ),
        "bss_units",
    )


# ---------------------------------------------------------------- KPSS
# Level-stationarity test. All sufficient statistics are exact int64 in
# DAILY-DOLLAR units (cents overflow the squared partial sums at sf0.1);
# the statistic is then one shared closed-form expression chain (the
# ts_pacf rule). Bartlett window l = 4.

_KPSS_L = 4

_KPSS_DAILY = """
daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
           AS eday,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) // 100 AS BIGINT)
           AS u
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
idx AS (
  SELECT u, row_number() OVER (ORDER BY eday) AS t,
         SUM(u) OVER (ORDER BY eday ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS pre
  FROM daily
)
"""

# shared final expressions over the exact int64 stats (identical strings
# in both engines). xb = s/n; eta = (A - 2*xb*B + xb*xb*C) / (n*n);
# g_j = (P_j - xb*(H_j + T_j) + (n - j)*xb*xb) / n;
# lrv = g0 + 2 * sum_j (1 - j/5) * g_j; kpss = eta / lrv.
_KPSS_G = {
    j: (
        f"((CAST(p{j} AS DOUBLE) - (CAST(s AS DOUBLE) / n) * (h{j} + t{j})"
        f" + (n - {j}) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
        f" / n)"
    )
    for j in range(0, _KPSS_L + 1)
}
_KPSS_ETA = (
    "((CAST(a AS DOUBLE) - 2 * (CAST(s AS DOUBLE) / n) * b"
    " + (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) * c)"
    " / (CAST(n AS DOUBLE) * n))"
)
_KPSS_LRV = (
    f"({_KPSS_G[0]} + 2 * (0.8 * {_KPSS_G[1]} + 0.6 * {_KPSS_G[2]}"
    f" + 0.4 * {_KPSS_G[3]} + 0.2 * {_KPSS_G[4]}))"
)

_KPSS_SQL = f"""
WITH {_KPSS_DAILY},
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(u) AS BIGINT) AS s,
         CAST(SUM(pre * pre) AS BIGINT) AS a,
         CAST(SUM(t * pre) AS BIGINT) AS b,
         CAST(SUM(t * t) AS BIGINT) AS c
  FROM idx
),
lags AS (
  SELECT j.j,
         CAST(SUM(cur.u * prv.u) AS BIGINT) AS p,
         CAST(SUM(cur.u) AS BIGINT) AS h,
         CAST(SUM(prv.u) AS BIGINT) AS t
  FROM (SELECT unnest([0, 1, 2, 3, 4]) AS j) j
  JOIN idx cur ON TRUE
  JOIN idx prv ON prv.t = cur.t - j.j
  GROUP BY j.j
),
wide AS (
  SELECT base.n, base.s, base.a, base.b, base.c,
         {", ".join(f"SUM(CASE WHEN j = {j} THEN p END) AS p{j}, "
                    f"SUM(CASE WHEN j = {j} THEN h END) AS h{j}, "
                    f"SUM(CASE WHEN j = {j} THEN t END) AS t{j}"
                    for j in range(0, _KPSS_L + 1))}
  FROM lags CROSS JOIN base
  GROUP BY base.n, base.s, base.a, base.b, base.c
)
SELECT n,
       FLOOR({_KPSS_ETA} * 100 + 0.5) / 100 AS eta,
       FLOOR({_KPSS_LRV} * 100 + 0.5) / 100 AS lrv,
       FLOOR(({_KPSS_ETA} / {_KPSS_LRV}) * 10000 + 0.5) / 10000 AS kpss_stat
FROM wide
"""


@register("ts_kpss_stationarity", oracle=_KPSS_SQL, tier="T2")
def ts_kpss_stationarity(spark, sf_dir):
    """KPSS level-stationarity statistic of the daily value series
    (Bartlett long-run variance, window l = 4): η = Σ S_t²/n² over
    demeaned partial sums against the lag-weighted long-run variance —
    the stationarity screen that pairs with [[ts_mann_kendall]] (trend
    direction) and [[ts_hurst_exponent]] (long-memory) before any
    forecasting key is trusted.

    Determinism: every sufficient statistic (Σpre², Σt·pre, Σt², lag
    products Σu_t·u_{t−j}, head/tail lag sums) is an exact int64 in
    DAILY-DOLLAR units — cents would push Σpre² past int64 at sf0.1
    (headroom documented: at sf≈10 move these five stats to
    DECIMAL(38,0)); the statistic is then a single shared closed-form
    expression chain evaluated character-identically by both engines
    (the ts_pacf rule), with one rounding per output.

    Scale note: one daily-grain aggregate, one |days|-row prefix window,
    a 5× lag fan-out join on the |days|-row table, then a 1-row
    projection — same cost envelope as ts_autocorrelation.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("eday")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) DIV 100 AS BIGINT)"
        ).alias("u")
    )
    wo = Window.orderBy("eday")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = daily.select(
        "u",
        F.row_number().over(wo).alias("t"),
        F.sum("u").over(wc).alias("pre"),
    ).persist()
    base = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("u").cast("long").alias("s"),
        F.sum(F.col("pre") * F.col("pre")).cast("long").alias("a"),
        F.sum(F.col("t") * F.col("pre")).cast("long").alias("b"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("c"),
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(0, _KPSS_L + 1)])).alias("j")
    cur = idx.select(js, "u", "t")
    prv = idx.select(F.col("t").alias("pt"), F.col("u").alias("pu"))
    lags = (
        cur.join(prv, F.col("pt") == F.col("t") - F.col("j"))
        .groupBy("j")
        .agg(
            F.sum(F.col("u") * F.col("pu")).cast("long").alias("p"),
            F.sum("u").cast("long").alias("h"),
            F.sum("pu").cast("long").alias("t_"),
        )
    )
    wide = lags.crossJoin(F.broadcast(base)).groupBy("n", "s", "a", "b", "c").agg(
        *[
            agg
            for j in range(0, _KPSS_L + 1)
            for agg in (
                F.sum(F.expr(f"CASE WHEN j = {j} THEN p END")).alias(f"p{j}"),
                F.sum(F.expr(f"CASE WHEN j = {j} THEN h END")).alias(f"h{j}"),
                F.sum(F.expr(f"CASE WHEN j = {j} THEN t_ END")).alias(f"t{j}"),
            )
        ]
    )
    out = wide.select(
        "n",
        F.expr(f"FLOOR({_KPSS_ETA} * 100 + 0.5) / 100").alias("eta"),
        F.expr(f"FLOOR({_KPSS_LRV} * 100 + 0.5) / 100").alias("lrv"),
        F.expr(
            f"FLOOR(({_KPSS_ETA} / {_KPSS_LRV}) * 10000 + 0.5) / 10000"
        ).alias("kpss_stat"),
    )
    out = out.transform(materialize)
    idx.unpersist()
    return out


# ------------------------------------------------- Dickey–Fuller (lag 0)
# Shared closed-form simple-regression expressions (identical strings both
# engines): beta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx); t = beta / SE(beta).

_DF_BETA = (
    "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
)
_DF_SYY = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)"
_DF_SXY = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)"
_DF_SXX = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)"
_DF_T = (
    f"({_DF_BETA} / sqrt((({_DF_SYY} - {_DF_BETA} * {_DF_SXY}) / (n - 2))"
    f" / {_DF_SXX}))"
)

_DF_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
           AS eday,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
rows_ AS (
  SELECT prv.u AS x, cur.u - prv.u AS y
  FROM daily cur JOIN daily prv ON cur.eday = prv.eday + 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM rows_
)
SELECT n,
       FLOOR({_DF_BETA} * 1000000 + 0.5) / 1000000 AS beta,
       FLOOR({_DF_T} * 10000 + 0.5) / 10000 AS t_stat
FROM s
"""


@register("ts_dickey_fuller", oracle=_DF_SQL, tier="T2")
def ts_dickey_fuller(spark, sf_dir):
    """Dickey–Fuller unit-root regression (lag 0, with intercept):
    Δu_t = α + β·u_{t−1} + ε over calendar-consecutive days; β near 0
    (t_stat above the DF critical values) means a unit root. The
    complement of [[ts_kpss_stationarity]] — the classic double screen:
    KPSS rejects stationarity, DF rejects the unit root, and a series
    should fail exactly one of them.

    Determinism: six exact int64 sufficient statistics in cents (Σx² ≈
    7e16 at sf0.1 — headroom documented), then β and its t-statistic as
    CHARACTER-IDENTICAL closed-form expression strings in both engines
    (the ts_pacf rule; the one sqrt is the same correctly-rounded libm
    call on identical input), one rounding per output.

    Scale note: one daily-grain aggregate, one consecutive-day
    self-equi-join on the |days|-row table, one 1-row projection.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("eday")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("u")
    )
    prv = daily.select(F.col("eday").alias("pday"), F.col("u").alias("pu"))
    rows = daily.join(prv, F.col("eday") == F.col("pday") + 1).select(
        F.col("pu").alias("x"), (F.col("u") - F.col("pu")).alias("y")
    )
    s = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return s.select(
        "n",
        F.expr(f"FLOOR({_DF_BETA} * 1000000 + 0.5) / 1000000").alias("beta"),
        F.expr(f"FLOOR({_DF_T} * 10000 + 0.5) / 10000").alias("t_stat"),
    )
