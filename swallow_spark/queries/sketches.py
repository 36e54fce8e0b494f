"""Sketch-based approximate counting: a count-min sketch built and probed
entirely with DataFrame ops (no Python in the hot path).

Complements the existing approximate family (agg_approx_distinct = HLL,
agg_approx_percentile = KLL): the CMS answers point frequency queries
("how often does token X occur?") in O(d*w) memory regardless of
cardinality — the backbone of heavy-hitter detection over a 100 TB token
stream where an exact groupBy(token) shuffle would be dominated by the
long tail.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_D, _W = 4, 1024  # depth (hash functions) x width (buckets per row)


def _bucketed(col_df, token_col="token"):
    """Explode each token into its _D (seed, bucket) sketch coordinates."""
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("seed"),
                F.pmod(F.xxhash64(token_col, F.lit(i)), F.lit(_W)).alias("bucket"),
            )
            for i in range(_D)
        ]
    )
    return col_df.select(*col_df.columns, F.explode(coords).alias("sb")).select(
        *col_df.columns, F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket")
    )


@register("sketch_count_min", oracle=None, tier="T3")
def sketch_count_min(spark, sf_dir):
    """Count-min sketch frequency estimation for the corpus's top-20 tokens.

    Build: one explode (token -> d coordinate rows) + one groupBy
    (seed, bucket) count — map-side combinable, producing at most d*w
    (= 4096) cells no matter how many distinct tokens exist. Probe: the
    candidate tokens join the (broadcast) sketch on their coordinates and
    take min() across the d rows — the classic CMS upper-bound estimate
    (est >= exact always; collisions only inflate).

    Rows-only: the estimate depends on xxhash64 seeds, which DuckDB cannot
    reproduce; tests/test_sketches.py asserts the CMS bound against the
    exact counts instead. Deterministic across runs (fixed seeds, exact
    integer counters).
    """
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token"))
        .filter(F.col("token") != "")
    )
    sketch = (
        _bucketed(tok)
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact_top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(20)
    )
    return (
        _bucketed(exact_top)
        .join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


@register("agg_hll_reaggregate", oracle=None, tier="T3")
def agg_hll_reaggregate(spark, sf_dir):
    """Re-aggregable distinct counting: per (event_type, day) HLL sketches
    built once, then UNIONED across days per type — the pattern for rolling
    / incremental distinct-user counts at 100 TB, where re-scanning history
    for every window is impossible but sketch union is a few KB per group.

    Output carries the exact countDistinct alongside the estimate; the
    relative-error bound (lgConfigK=12 → ~1.6% typical) is asserted in
    tests/test_sketches.py. Rows-only: DuckDB has no Datasketches HLL.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return est.join(exact, "event_type").orderBy("event_type")


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
""",
    tier="T2",
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT re-aggregable distinct counting via bitmaps (the exact
    complement of agg_hll_reaggregate): each user_id maps to a (bucket,
    bit-position); bitmap_construct_agg builds one bitmap per (group,
    bucket) and popcounts sum to the exact distinct count. Bitmaps OR-merge
    associatively, so incremental/rollup re-aggregation stays exact — the
    pattern for precise distinct-user ladders where HLL error is
    unacceptable. Oracle: plain COUNT(DISTINCT)."""
    e = load(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    per_bucket = b.groupBy("event_type", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users")
    )
