"""Time-series operators: multi-granularity rollup (hypertable-style),
forward as-of, and gap-filling resample.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import money_sum, sql_money_sum
from ..io import load
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
