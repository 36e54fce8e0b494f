"""Generic relational operator helpers (E2 surface).

Each helper is a DataFrame→DataFrame function with the scale-relevant plan
shape baked in (deterministic tie-breaks, partitioned windows, broadcast
hints) so callers get the right 100 TB plan by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Deterministic per-group top-k (order must be a total order)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def dedup_keep_first(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Deterministic deduplication: keep the first row per key under `order`
    (dropDuplicates keeps an arbitrary row — this variant is reproducible)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_minutes: int
) -> DataFrame:
    """Assign a session id per (user, gap)-separated run of events.

    Gaps-and-islands: one shuffle on user_col; semantics match Spark's
    native session_window, which MERGES an event arriving exactly `gap`
    after the previous one (windows [t, t+gap) touching at the boundary
    coalesce) — measured, not assumed: the session-window property suite
    falsified the previous `>= gap` spelling with the two-event
    exactly-1800s case. A new session therefore starts strictly AFTER the
    gap (`> gap`).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(ts_col).over(w)
    new_s = (
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_us
        )
    ).cast("int")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_s).over(wcum))


def salted_join(
    big: DataFrame, skewed: DataFrame, key: str, n_salts: int = 16, how: str = "inner"
) -> DataFrame:
    """Skew-mitigating equi join: salt the big side's hot keys, replicate the
    small side across salts. Use when AQE skew splitting isn't enough.

    Scale note: replicates `skewed` n_salts× — only for genuinely small-ish
    right sides; otherwise rely on spark.sql.adaptive.skewJoin.
    """
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_small = skewed.select("*", salts)
    out = salted_big.join(
        salted_small,
        (salted_big[key] == salted_small[key]) & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop(salted_small[key]).drop("__salt")
