"""§2.I — event-time window semantics, batch-checkable form.

`window()` / `session_window()` work on batch DataFrames, so tumbling /
sliding / session aggregations are oracle-checked here; watermark & late-data
behavior exists only in streaming → demos/streaming (T3, not driver-graded).

Scale note: these are the Structured-Streaming operator shapes — groupBy
(window, key) is a hash aggregate keyed by (bucket, key); session windows
shuffle once on user_id then merge sorted runs. Identical plans at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conform import money_sum, sql_money_sum
from ..io import load
from ..registry import register


@register(
    "stream_tumbling_batch",
    oracle=f"""
SELECT date_trunc('hour', ts) AS wstart, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_money_sum('value')} AS val
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    tier="T1",
)
def stream_tumbling_batch(spark, sf_dir):
    """1-hour tumbling windows × event_type: count + exact value sum."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value")).alias("val"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "val")
    )


@register(
    "stream_sliding_batch",
    oracle=f"""
SELECT make_timestamp(((epoch_us(ts) // 1000000 // 900) * 900 - g.j * 900) * 1000000) AS wstart,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_money_sum('value')} AS val
FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) g
GROUP BY 1, 2
""",
    tier="T2",
)
def stream_sliding_batch(spark, sf_dir):
    """1-hour windows sliding every 15 min (each event in exactly 4 windows).

    Oracle reconstructs Spark's epoch-aligned window starts by enumerating
    the 4 slide offsets per event (SURVEY.md §2.I / §7.3 item 4).
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value")).alias("val"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "val")
    )


@register(
    "stream_session_batch",
    oracle=f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_money_sum('value')} AS val
FROM numbered
GROUP BY user_id, sid
""",
    tier="T2",
)
def stream_session_batch(spark, sf_dir):
    """Per-user session windows with a 30-minute gap.

    Spark session semantics (MEASURED by the round-7 property suite, which
    falsified the previous `>= gap` oracle with the two-event
    exactly-1800s case): per-event windows [t, t+gap) touching at the
    boundary COALESCE, so an event exactly gap after the previous one
    CONTINUES the session; a new session starts strictly after the gap —
    the oracle's gaps-and-islands uses `> gap` to match. Only robust
    columns (start = min ts, count, sum) are emitted (SURVEY.md §7.3
    item 3).
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("val"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "val"
        )
    )


@register(
    "stream_dedup_batch",
    oracle="SELECT DISTINCT user_id, event_id FROM events",
    tier="T2",
)
def stream_dedup_batch(spark, sf_dir):
    """dropDuplicates on the natural key — the batch analog of streaming
    deduplication (deterministic because the key set is projected first)."""
    e = load(spark, sf_dir, "events")
    return e.select("user_id", "event_id").dropDuplicates(["user_id", "event_id"])


_THROTTLE_US = 300_000_000  # 5-minute per-user throttle window


@register(
    "win_throttle_events",
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
walk AS (
  SELECT user_id, event_id, tus, rn,
         TRUE AS kept, tus AS last_kept, 1 AS kept_seq
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.tus, b.rn,
         b.tus - w.last_kept >= {_THROTTLE_US} AS kept,
         CASE WHEN b.tus - w.last_kept >= {_THROTTLE_US} THEN b.tus
              ELSE w.last_kept END AS last_kept,
         CASE WHEN b.tus - w.last_kept >= {_THROTTLE_US} THEN w.kept_seq + 1
              ELSE w.kept_seq END AS kept_seq
  FROM base b JOIN walk w ON b.user_id = w.user_id AND b.rn = w.rn + 1
)
SELECT user_id, event_id, CAST(kept_seq AS BIGINT) AS kept_seq
FROM walk WHERE kept
""",
    tier="T2",
)
def win_throttle_events(spark, sf_dir):
    """Greedy per-user event throttling (rate limiting / burst dedup): walk
    each user's timeline in (ts, event_id) order and KEEP an event only if
    ≥ 5 minutes passed since the last KEPT one — the reset-on-keep state
    makes this inexpressible as a plain window (the frame would need to
    reference its own output), so it is the canonical custom-stateful-
    operator shape: applyInPandas with one sequential fold per user,
    against a DuckDB WITH RECURSIVE oracle that advances every user one
    row per recursion step (depth = max events/user, ≈100 on these
    fixtures). Timestamps compare as integer epoch microseconds; the
    boundary is inclusive (gap == 300 s keeps).

    Scale note (round-7 rework): the shuffle key is a 256-way hash
    SUPER-GROUP pmod(xxhash64(user_id), 256) — 256 Python calls instead of
    one per user (the udf_cogrouped_merge recipe) — and each batch
    regroups per-user with pandas groupby(dropna=False) so NULL users stay
    one group, as Spark's own grouping would have them. Inside each user,
    the fold JUMPS along the kept chain with np.searchsorted (the next
    kept event is the first with ts ≥ last_kept + 300 s; 'left' side picks
    the first of a ts-tie run, exactly the greedy (ts, event_id) order) —
    O(kept · log n) instead of a per-row Python loop, which is what the
    skew stress-test's 200k-event hot user needs. Output is the kept
    events with their per-user keep rank, so the unchanged recursive
    oracle pins every keep/drop decision of the rewrite.
    """
    import numpy as np
    import pandas as pd

    # Explicit hash repartition on the super-group (round-11, guide §2):
    # the exchange is byte-light but the fold stage is CPU-dense Python, so
    # AQE's byte-based coalescing would shrink it to a couple of tasks; a
    # user repartition count is exempt and keeps defaultParallelism tasks
    # (capped by the 256 buckets) at any scale.
    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("tus"))
        .withColumn("b", F.pmod(F.xxhash64("user_id"), F.lit(256)))
        .repartition(spark.sparkContext.defaultParallelism, "b")
    )

    def throttle(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "tus", "event_id"])
        out_u: list = []
        out_e: list = []
        out_s: list = []
        for uid, g in pdf.groupby("user_id", sort=False, dropna=False):
            tus = g["tus"].to_numpy()
            eids = g["event_id"].to_numpy()
            n = len(tus)
            i = 0
            seq = 0
            while i < n:
                seq += 1
                out_u.append(uid)
                out_e.append(eids[i])
                out_s.append(seq)
                # first index with tus >= last_kept + window; ties at the
                # target share (tus, event_id) sort order, 'left' keeps the
                # first — identical to the row-by-row greedy walk
                i = int(
                    np.searchsorted(tus, tus[i] + _THROTTLE_US, side="left")
                )
        return pd.DataFrame(
            {
                "user_id": pd.array(out_u, dtype="Int64"),
                "event_id": pd.array(out_e, dtype="int64"),
                "kept_seq": pd.array(out_s, dtype="int64"),
            }
        )

    return e.groupBy("b").applyInPandas(
        throttle, "user_id long, event_id long, kept_seq long"
    )


_SESSION_US = 300_000_000  # each event opens a 5-minute activity interval


@register(
    "win_concurrency_sweep",
    oracle=f"""
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s, epoch_us(ts) + {_SESSION_US} AS e
  FROM events
),
pts AS (
  SELECT event_type, s AS tus, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT event_type, e AS tus, CAST(-1 AS BIGINT) AS delta FROM iv
),
run AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type
                          ORDER BY tus, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS conc
  FROM pts
)
SELECT event_type,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
FROM run GROUP BY event_type
""",
    tier="T2",
)
def win_concurrency_sweep(spark, sf_dir):
    """Maximum interval concurrency per event type via the classic
    sweep-line: every event opens a half-open [ts, ts+300 s) activity
    interval; endpoints become ±1 deltas; the peak of the running sum over
    (time, delta)-ordered points is the max number of simultaneously open
    intervals — the capacity-planning primitive (peak concurrent sessions,
    max in-flight requests) that a plain groupBy cannot express.

    Boundary semantics pinned by the ORDER BY (tus, delta): at an instant
    where one interval ends exactly as another starts, the −1 sorts first
    (delta −1 < +1), so half-open intervals never double-count. Tie groups
    share a single delta sign, so the running-sum PEAK is order-independent
    within ties (prefix values of k equal deltas form the same set under
    any permutation) — deterministic without a full tiebreak.

    Scale note: one shuffle on event_type, then a sorted within-partition
    running sum. For a single GLOBAL timeline at 100 TB, range-partition
    the time axis and two-phase the prefix sum (per-partition partials +
    broadcast cumulative offsets) — the standard distributed scan shape;
    the per-type spelling here is already that layout with event_type as
    the range key.
    """
    e = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("s")
    )
    pts = e.select(
        "event_type", F.col("s").alias("tus"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        e.select(
            "event_type",
            (F.col("s") + F.lit(_SESSION_US)).alias("tus"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("tus", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("conc"))
    return run.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )
