"""SparkSession factory + per-session conformance (SURVEY.md §7.1 M0).

The driver supplies its own SparkSession to ``queries()`` callables, so every
query must *conform* whatever session it receives (UTC timezone is the
determinism-critical bit, SURVEY.md §2.0 rule 2). ``get_spark`` is used by our
own tests/bench/tools.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session we touch (driver's included).
_RUNTIME_CONFS = {
    # Determinism: fixtures store naive timestamps; DuckDB is TZ-naive.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle coalescing + skew-join splitting (on by default in
    # Spark 4; pinned here so the plan shape is stable).
    "spark.sql.adaptive.enabled": "true",
}


def conform_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable determinism confs; idempotent and cheap."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    return spark


def get_spark(app_name: str = "swallow_spark", cpus: int | None = None) -> SparkSession:
    """Local session for tests/bench.

    Scale note (SURVEY.md §7.4): on a real cluster these builder confs move to
    spark-submit; nothing in the engine assumes local mode.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    shuffle = max(8, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "4g"))
        .config("spark.ui.enabled", "false")
    )
    return conform_session(builder.getOrCreate())
