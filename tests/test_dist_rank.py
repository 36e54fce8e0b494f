"""ops/dist_rank: the distributed two-phase rank / prefix sums must be
bit-identical to the single-reducer global window it replaces, and
ntile_from_rank must reproduce NTILE exactly — including the
first-(n mod b)-tiles-get-one-extra boundary rule — for every (n, b)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swallow_spark.ops.dist_rank import distributed_prefix, ntile_from_rank


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("buckets", [1, 3, 64])
def test_rank_matches_global_window(spark, buckets):
    # keys deliberately clustered (two dense runs + a gap) so several DIV
    # buckets are empty and one holds a run boundary
    keys = list(range(100, 160)) + list(range(5000, 5040))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = distributed_prefix(df, F.col("k"), ["k"], buckets=buckets, rank="r")
    want = df.withColumn("r", F.row_number().over(Window.orderBy("k")))
    assert _rows(got, "k", "r") == _rows(want, "k", "r")


def test_rank_with_ties_and_desc_order(spark):
    # bucket key coarsens a DESC order with a tiebreak — the
    # sort_multi_nulls shape (equal values must stay in one bucket)
    data = [(i, (i * 7) % 5) for i in range(200)]
    df = spark.createDataFrame(data, "id long, v long")
    got = distributed_prefix(
        df, -F.col("v"), [F.col("v").desc(), "id"], buckets=8, rank="r"
    )
    want = df.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("v").desc(), "id"))
    )
    assert _rows(got, "id", "r") == _rows(want, "id", "r")


def test_prefix_sums_match_global_window(spark):
    data = [(i, i % 7, (i * 3) % 11) for i in range(150)]
    df = spark.createDataFrame(data, "k long, a long, b long")
    got = distributed_prefix(
        df, F.col("k"), ["k"], buckets=16, sums={"ca": "a", "cb": "b"}
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "k", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    assert _rows(got, "k", "ca", "cb") == _rows(want, "k", "ca", "cb")


def test_rank_and_sums_together(spark):
    df = spark.createDataFrame([(i, 1) for i in range(40)], "k long, one long")
    got = distributed_prefix(
        df, F.col("k"), ["k"], buckets=4, rank="r", sums={"c": "one"}
    )
    # with a constant-1 sum column, the inclusive cumsum IS the rank
    assert _rows(got, "k", "r") == _rows(got, "k", "c")


def test_single_row_and_empty(spark):
    one = spark.createDataFrame([(42,)], "k long")
    got = distributed_prefix(one, F.col("k"), ["k"], rank="r")
    assert _rows(got, "k", "r") == [(42, 1)]
    empty = one.filter(F.col("k") < 0)
    assert distributed_prefix(empty, F.col("k"), ["k"], rank="r").count() == 0


def test_rank_derived_buckets_default(spark):
    # buckets=None derives B = max(64, spark.sql.shuffle.partitions) — the
    # corpus-scale sizing path (VERDICT r10 item 4). Results must be
    # invariant to B; here the derived B exceeds both the key span and the
    # row count, so most buckets are empty.
    keys = [3 * i + 1 for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = distributed_prefix(df, F.col("k"), ["k"], rank="r")
    want = df.withColumn("r", F.row_number().over(Window.orderBy("k")))
    assert _rows(got, "k", "r") == _rows(want, "k", "r")


def test_rank_extreme_key_magnitudes(spark):
    # keys near ±2^62: the bucket assignment is a true integer DIV, so the
    # double-rounding hazard of `cast(a / b as long)` near 2^53-quotient
    # boundaries cannot mis-bucket. Span here is ~2^62 (fits int64).
    lo, hi = -(2**61), 2**61
    keys = [lo, lo + 1, lo + 2, -5, 0, 7, hi - 2, hi - 1, hi]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = distributed_prefix(df, F.col("k"), ["k"], buckets=64, rank="r")
    want = df.withColumn("r", F.row_number().over(Window.orderBy("k")))
    assert _rows(got, "k", "r") == _rows(want, "k", "r")


def test_span_overflow_fails_loudly(spark):
    # a span beyond int64 must raise, never silently mis-bucket (ADVICE
    # r10). Under ANSI (Spark 4 default) the subtraction itself raises
    # ARITHMETIC_OVERFLOW; with ANSI off it wraps negative and the module's
    # own _w <= 0 guard raises — loud either way.
    df = spark.createDataFrame([(-(2**62),), (2**62,)], "k long")
    with pytest.raises(Exception, match="span overflowed|OVERFLOW|overflow"):
        distributed_prefix(df, F.col("k"), ["k"], buckets=64, rank="r").collect()


@pytest.mark.parametrize("tiles", [2, 3, 4, 5, 7])
@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7, 12, 13, 100])
def test_ntile_from_rank_matches_ntile(spark, tiles, n):
    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "k long")
    want = df.select(
        "k", F.ntile(tiles).over(Window.orderBy("k")).cast("long").alias("t")
    )
    got = df.select(
        "k", ntile_from_rank(F.col("k"), F.lit(n).cast("long"), tiles).alias("t")
    )
    assert _rows(got, "k", "t") == _rows(want, "k", "t")


# ---------------------------------------------------------------- hypothesis

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=100),
)
def test_rank_and_sums_random_keys(spark, keys, buckets):
    # random (possibly duplicated, arbitrarily clustered) bucket keys and
    # bucket counts: rank and running sum must match the single-reducer
    # global window bit-for-bit. uid breaks ties so the order is total and
    # the bucket key is a genuine coarsening of it.
    rows = [(k, i, (k % 97) + i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k long, uid long, v long")
    got = distributed_prefix(
        df, F.col("k"), ["k", "uid"], buckets=buckets, rank="r", sums={"cv": "v"}
    )
    w = Window.orderBy("k", "uid")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "uid",
        F.row_number().over(w).alias("r"),
        F.sum("v").over(wr).alias("cv"),
    )
    assert _rows(got, "uid", "r", "cv") == _rows(want, "uid", "r", "cv")
