"""Scale-adaptive scan fan-out (optimization round 11, guide §2.5/§4).

The bench inputs are single-row-group parquet files, so every scan is ONE
split regardless of ``spark.sql.files.maxPartitionBytes`` — and any heavy
per-row work that precedes the first exchange (mapInPandas passes, shingle
explodes, permutation fan-outs) runs on a single core / a single Python
worker. The same failure mode exists at cluster scale whenever an input is
one unsplittable file (gzip, single-row-group parquet) or one hot partition:
guide §2.5 calls it input skew and prescribes "repartition immediately after
the read".

``fan_out`` is that prescription made scale-adaptive: it round-robin
repartitions ONLY when the frame currently has fewer partitions than the
session's default parallelism, to exactly that parallelism. On a real
cluster a 100 TB scan already yields thousands of splits, so the helper is
a structural no-op there (returns the frame unchanged — no exchange is
added to the plan); it never hard-codes a local core count.

Determinism: round-robin repartition is safe under retries because Spark
sorts before repartitioning (``spark.sql.execution.sortBeforeRepartition``,
on by default — SPARK-23207), and every call site feeds partition-order-
independent downstream logic (exact-integer aggregates, key-based joins,
per-row map bodies, or per-batch PARTIAL rows that re-aggregate) — the
repo-wide determinism rule this engine already enforces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff it has
    fewer partitions than that (single-split scans at bench scale); a
    structural no-op — frame returned unchanged — when the source already
    provides enough splits (any real cluster scan).

    ``SWALLOW_FAN_OUT=0`` disables the helper globally (checked at plan
    construction, so an interleaved A/B can flip it per query inside one
    session — how every call site below was measured — and an operator
    whose input layout makes the extra exchange a loss can opt out without
    a code change)."""
    if os.environ.get("SWALLOW_FAN_OUT", "1") == "0":
        return df
    try:
        target = min_parts or df.sparkSession.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        return df  # Connect-style session without an RDD view: leave as-is
    if current >= target:
        return df
    return df.repartition(target)
