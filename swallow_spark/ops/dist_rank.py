"""Distributed global rank / prefix sums — the two-phase replacement for
an unpartitioned ``Window.orderBy`` (which serializes the whole input
through ONE reducer task: the classic 100 TB cliff, visible locally as
Spark's ``WARN WindowExec: No Partition Defined``).

Algebra (the DataFrame spelling of RDD ``zipWithIndex``):

1. bucket every row by a PURE KEY EXPRESSION — ``(bucket_key - min) DIV
   ceil(span / B)`` ∈ [0, B) from a broadcast 1-row (min, width) aggregate.
   A pure column function of the row (unlike ``spark_partition_id()``,
   whose value can diverge between plan branches under AQE shuffle
   coalescing) is what makes every branch, retry and partitioning agree.
2. per-bucket counts / subtotals (≤ B rows) → EXCLUSIVE prefix offsets via
   a window over that bounded frame (O(B), not O(n)).
3. within-bucket ``row_number`` / running sums (shuffle partitioned by
   bucket — distributed, heaviest task ≈ n/B for dense keys) plus the
   broadcast-joined bucket offset = the exact global value.

Bucket-major order equals the total order because buckets are contiguous
ranges of ``bucket_key`` and ``bucket_key``'s ascending order is a
coarsening (prefix) of ``order_cols``. For pathologically clustered keys
substitute sampled range boundaries for the DIV rule — the offset algebra
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["distributed_prefix", "ntile_from_rank"]


def distributed_prefix(
    df: DataFrame,
    bucket_key: Column,
    order_cols,
    *,
    buckets: int | None = None,
    rank: str | None = None,
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Attach a distributed global ``row_number`` (``rank=<name>``) and/or
    inclusive running sums (``sums={out_name: input_col}``) over the total
    order ``order_cols`` without a global window.

    Requirements: ``bucket_key`` is a non-NULL int64-castable Column whose
    ascending order coarsens ``order_cols``, and whose SPAN (``max - min``)
    fits in int64 — a span at the ±2^63 extremes would wrap the width
    aggregate (ANSI off); a runtime guard fails loudly (``_w <= 0``)
    instead of mis-bucketing. ``sums`` inputs should be pre-coalesced (an
    all-NULL leading run inside one bucket yields NULL + offset = NULL,
    where a single global window would carry earlier buckets' values).

    ``buckets`` (B) bounds the widest within-bucket task at ~n/B rows for
    dense keys. The default derives B from ``spark.sql.shuffle.partitions``
    (floor 64) so the within-bucket phase keeps pace with however the job
    is sized — a fixed 64 would mean ~1.5 TB tasks at 100 TB; a cluster
    sized at thousands of shuffle partitions gets that many rank tasks.
    Corpus-scale callers may still pass an explicit B.
    """
    sums = sums or {}
    if buckets is None:
        try:
            buckets = max(
                64, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            )
        except Exception:  # non-numeric (e.g. "auto" on some runtimes)
            buckets = 64
    b = df.withColumn("_bk", bucket_key.cast("long"))
    bounds = b.agg(
        F.min("_bk").alias("_lo"),
        # ceil(span / B): width of each contiguous key range
        F.ceil((F.max("_bk") - F.min("_bk") + 1) / F.lit(buckets))
        .cast("long")
        .alias("_w"),
    ).select(
        "_lo",
        # span-overflow guard: a wrapped (negative/zero) width means the
        # precondition was violated — fail on the 1-row bounds frame (free)
        # rather than return silently wrong ranks. NULL _w (empty input) is
        # legitimate: the crossJoin below is empty anyway.
        F.when(F.col("_w").isNull() | (F.col("_w") > 0), F.col("_w"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "distributed_prefix: bucket_key span overflowed int64 "
                    "(width <= 0) — see the span precondition in the docstring"
                )
            )
        )
        .alias("_w"),
    )
    b = b.crossJoin(F.broadcast(bounds)).withColumn(
        # true integer DIV — exact for any int64 operands (no double
        # round-trip; a plain `/` + cast can cross an integer boundary for
        # quotients near 2^53, the hazard _idiv's docstring names)
        "_bkt",
        F.expr("(_bk - _lo) DIV _w"),
    )
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.sum(src).alias(f"_s_{out}") for out, src in sums.items()
    ]
    per_bucket = b.groupBy("_bkt").agg(*aggs)
    # bounded frame: ≤ `buckets` post-aggregate rows, so this global window
    # is O(B) — the one place a frame this small is the right tool
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    sel = ["_bkt", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")]
    for out in sums:
        sel.append(
            F.coalesce(F.sum(f"_s_{out}").over(w_off), F.lit(0)).alias(f"_o_{out}")
        )
    offsets = per_bucket.select(*sel)
    w_in = Window.partitionBy("_bkt").orderBy(*order_cols)
    w_run = w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out_df = b.join(F.broadcast(offsets), "_bkt")
    if rank is not None:
        out_df = out_df.withColumn(rank, F.col("_off") + F.row_number().over(w_in))
    for out, src in sums.items():
        out_df = out_df.withColumn(out, F.col(f"_o_{out}") + F.sum(src).over(w_run))
    drops = ["_bk", "_bkt", "_lo", "_w", "_off"] + [f"_o_{o}" for o in sums]
    return out_df.drop(*drops)


def ntile_from_rank(r: Column, n: Column, tiles: int) -> Column:
    """SQL NTILE(tiles) from a total-order rank ``r`` (1-based) and total
    count ``n`` — pure int64 arithmetic, bit-identical to Spark/DuckDB
    NTILE: the first ``n % tiles`` tiles get ``n DIV tiles + 1`` rows,
    the rest ``n DIV tiles``.
    """
    q = _idiv(n, F.lit(tiles))  # n DIV tiles (both non-negative)
    rem = n - q * tiles
    big = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(r <= big, _idiv(r - 1, q + 1) + 1)
        .otherwise(rem + _idiv(r - big - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("long")
    )


def _idiv(a: Column, b: Column) -> Column:
    """a DIV b for non-negative int64 columns: (a - a % b) / b divides an
    EXACT multiple, so the double quotient is the exact integer for any
    quotient < 2^53 (no truncation-rounding hazard near integer
    boundaries, unlike a plain cast of a / b)."""
    return ((a - a % b) / b).cast("long")
