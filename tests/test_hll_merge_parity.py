"""HLL re-aggregation contract (VERDICT r9 item 6): building sketches on
ANY deterministic split of the input and unioning them must give exactly
the same outcome as one single-pass sketch — for BOTH the Spark-native
Datasketches path (hll_sketch_agg / hll_union_agg, the rows-only
agg_hll_reaggregate) and the portable register table (sketch_hll_portable's
MAX(rho) registers, whose mergeability the docstring claims). Three
deterministic splits each, chosen to produce different part sizes and
cross-part duplicate keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swallow_spark.io import load
from swallow_spark.queries.sketches import _HLL_M, _HLL_WBITS

SF = "/root/testdata/sf0.001"

# split expressions: column -> part id (deterministic, engine-independent);
# thunks because Column construction needs an active session
SPLITS = {
    "day_parity": lambda: F.dayofmonth(F.col("ts").cast("date")) % 2,
    "user_mod3": lambda: F.col("user_id") % 3,
    "event_mod5": lambda: F.col("event_id") % 5,
}


@pytest.mark.parametrize("split", sorted(SPLITS))
def test_native_hll_union_equals_single_pass(spark, split):
    """hll_union_agg over per-part hll_sketch_agg sketches must estimate
    EXACTLY what one hll_sketch_agg over the unsplit input estimates —
    the estimate is a pure function of the register state, and register
    merge is an element-wise max, so any re-aggregation must be a no-op
    on the result (not merely 'close')."""
    e = load(spark, SF, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    merged = (
        e.withColumn("part", SPLITS[split]())
        .groupBy("event_type", "part")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    d = {r["event_type"]: r["est"] for r in direct.collect()}
    m = {r["event_type"]: r["est"] for r in merged.collect()}
    assert d == m
    assert len(d) > 0


def _portable_registers(df, part_col=None):
    """sketch_hll_portable's register table: MAX(rho) per (grp, bucket),
    optionally with an intermediate per-part aggregate first."""
    hv = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    h = df.select(
        "grp",
        *( [part_col.alias("part")] if part_col is not None else [] ),
        (hv % _HLL_M).alias("bucket"),
        ((hv / _HLL_M).cast("long") % (1 << _HLL_WBITS)).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS) - (F.length(F.bin("w")) - 1)
    )
    h = h.withColumn("rho", rho)
    if part_col is not None:
        partial = h.groupBy("grp", "part", "bucket").agg(F.max("rho").alias("r"))
        return partial.groupBy("grp", "bucket").agg(F.max("r").alias("r"))
    return h.groupBy("grp", "bucket").agg(F.max("rho").alias("r"))


PSPLITS = {
    "custkey_mod2": lambda: F.col("k") % 2,
    "orderkey_mod7": lambda: F.col("ok") % 7,
    "priority_char": lambda: F.length(F.col("grp")) % 3,  # coarse, unbalanced
}


@pytest.mark.parametrize("split", sorted(PSPLITS))
def test_portable_register_merge_is_exact(spark, split):
    """The portable register table must be bit-identical whether built in
    one pass or as per-part partials merged by element-wise MAX — the
    exact property the two-phase HashAggregate relies on, pinned here on
    planted splits (including an unbalanced one)."""
    o = load(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("ok"),
    )
    one_pass = _portable_registers(o)
    merged = _portable_registers(o, part_col=PSPLITS[split]())
    a = sorted(tuple(r) for r in one_pass.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b
    assert len(a) > 0
