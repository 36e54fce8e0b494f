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
    buckets: int = 64,
    rank: str | None = None,
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Attach a distributed global ``row_number`` (``rank=<name>``) and/or
    inclusive running sums (``sums={out_name: input_col}``) over the total
    order ``order_cols`` without a global window.

    Requirements: ``bucket_key`` is a non-NULL int64-castable Column whose
    ascending order coarsens ``order_cols``; ``sums`` inputs should be
    pre-coalesced (an all-NULL leading run inside one bucket yields NULL +
    offset = NULL, where a single global window would carry earlier
    buckets' values).
    """
    sums = sums or {}
    b = df.withColumn("_bk", bucket_key.cast("long"))
    bounds = b.agg(
        F.min("_bk").alias("_lo"),
        # ceil(span / B): width of each contiguous key range
        F.ceil((F.max("_bk") - F.min("_bk") + 1) / F.lit(buckets))
        .cast("long")
        .alias("_w"),
    )
    b = b.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt", ((F.col("_bk") - F.col("_lo")) / F.col("_w")).cast("long")
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
