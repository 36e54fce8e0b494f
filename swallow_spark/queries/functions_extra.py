"""Late-wave additions: boolean aggregates and trigonometry pack."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "agg_bool",
    oracle="""
SELECT event_type,
       bool_and(value > 0) AS all_positive,
       bool_or(value > 400) AS any_large,
       CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
FROM events
GROUP BY event_type
""",
    tier="T2",
)
def agg_bool(spark, sf_dir):
    """Boolean aggregates: bool_and / bool_or per group."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 400).alias("any_large"),
        F.sum(F.when(F.col("value") > 400, 1).otherwise(0)).cast("long").alias("n_large"),
    )


@register(
    "fn_trig",
    oracle=f"""
SELECT p_partkey,
       {sql_rnd('sin(p_size / 10.0)', 4)} AS sn,
       {sql_rnd('cos(p_size / 10.0)', 4)} AS cs,
       {sql_rnd('atan2(p_size, 10)', 4)} AS at2,
       {sql_rnd('degrees(atan2(p_size, 10))', 4)} AS at2_deg,
       {sql_rnd('pi()', 4)} AS pi_const
FROM part
""",
    tier="T2",
)
def fn_trig(spark, sf_dir):
    """Trig pack (libm results rounded to 4dp; parity-verified like exp/ln)."""
    p = load(spark, sf_dir, "part")
    x = F.col("p_size") / 10.0
    return p.select(
        "p_partkey",
        rnd(F.sin(x), 4).alias("sn"),
        rnd(F.cos(x), 4).alias("cs"),
        rnd(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 4).alias("at2"),
        rnd(
            F.degrees(F.atan2(F.col("p_size").cast("double"), F.lit(10.0))), 4
        ).alias("at2_deg"),
        rnd(F.lit(3.141592653589793), 4).alias("pi_const"),
    )
