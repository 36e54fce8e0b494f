"""ops.parallel.fan_out — the scale-adaptive scan fan-out (round 11).

Contract under test:
- a frame with fewer partitions than the session default parallelism is
  round-robin repartitioned to exactly that parallelism (the single-split
  bench-scan case, guide §2.5 input skew);
- a frame that already has >= defaultParallelism partitions is returned
  UNCHANGED — same object, no exchange added (the cluster-scan case);
- rows are preserved exactly (repartition moves, never drops/duplicates);
- SWALLOW_FAN_OUT=0 disables the helper globally (the interleaved-A/B and
  operator opt-out seam).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from swallow_spark.ops.parallel import fan_out


def test_single_partition_frame_fans_out(spark):
    df = spark.range(0, 1000, 1, 1).withColumn("v", F.col("id") * 2)
    assert df.rdd.getNumPartitions() == 1
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # content preserved exactly
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_enough_partitions_is_structural_noop(spark):
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n)
    out = fan_out(df)
    assert out is df  # no wrapper, no exchange in any consumer's plan


def test_min_parts_override(spark):
    df = spark.range(0, 100, 1, 1)
    assert fan_out(df, min_parts=3).rdd.getNumPartitions() == 3


def test_env_kill_switch(spark):
    df = spark.range(0, 100, 1, 1)
    os.environ["SWALLOW_FAN_OUT"] = "0"
    try:
        assert fan_out(df) is df
    finally:
        os.environ.pop("SWALLOW_FAN_OUT", None)
