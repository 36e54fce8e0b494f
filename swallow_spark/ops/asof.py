"""Generic as-of (backward) join — no native Spark SQL ASOF (SURVEY.md §4.3).

Union-tag + running `last(..., ignorenulls)` window: O(n log n) within each
key partition, ONE shuffle on the key, no row-multiplying join and no range
blow-up — the scalable pattern for "latest right-side value at-or-before each
left timestamp" on a 100 TB event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row's value_cols with
    right.ts <= left.ts (per `on` key).

    Ties (right.ts == left.ts): the right row wins (at-or-before inclusive) —
    right rows sort before left rows at equal timestamps.
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols, F.lit(1).alias("__is_left"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols]
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__is_left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
