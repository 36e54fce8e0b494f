"""Count-min sketch property tests + EWMA cross-check vs pandas."""

from __future__ import annotations

from swallow_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_cms_upper_bound_property(spark):
    """CMS estimates can only overcount: est >= exact for every candidate,
    and with w=1024 buckets the top-20 tokens should be nearly collision
    free on the smoke fixture."""
    rows = all_queries()["sketch_count_min"].fn(spark, SF).collect()
    assert len(rows) == 20
    assert all(r.est_cnt >= r.exact_cnt for r in rows)
    exact_hits = sum(1 for r in rows if r.est_cnt == r.exact_cnt)
    assert exact_hits >= 10  # deterministic hashes -> stable on the fixture


def test_ewma_matches_pandas(spark):
    """The Spark fold must equal pandas' ewm(alpha=.3, adjust=False) on the
    same per-user daily series (modulo the 4-digit half-up canonicalize)."""
    import math

    from pyspark.sql import functions as F

    from swallow_spark.conform import money_sum
    from swallow_spark.io import load

    got = {
        r.user_id: r.ewma
        for r in all_queries()["ts_ewma"].fn(spark, SF).collect()
    }
    daily = (
        load(spark, SF, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(money_sum(F.col("value")).alias("dval"))
        .orderBy("user_id", "day")
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.user_id, []).append(r.dval)
    for uid, xs in series.items():
        y = xs[0]
        for x in xs[1:]:
            y = y * 0.7 + x * 0.3
        y = math.floor(y * 10000 + 0.5) / 10000
        assert abs(got[uid] - y) < 1e-9, uid


def test_hll_reaggregate_error_bound(spark):
    """Daily-sketch union must estimate distinct users within 5% of exact
    (lgConfigK=12 typical error ~1.6%)."""
    rows = all_queries()["agg_hll_reaggregate"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert abs(r.est_users - r.exact_users) / r.exact_users < 0.05
