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
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``swallow_spark`` importable on executor Python workers.

    Closures shipped through mapInPandas / pandas UDFs reference module-level
    functions (e.g. the injectable decoders in queries/multimodal.py), which
    cloudpickle serializes BY REFERENCE — the worker must be able to
    ``import swallow_spark``. That holds only if the driver process happened
    to run from the repo root; the grading driver (and any spark-submit user)
    may not. So on first contact with a SparkContext, zip the package and
    ``addPyFile`` it: workers zipimport it from their fetched-files dir,
    independent of anyone's cwd. Idempotent per context; a no-op on sessions
    without a local JVM context (Spark Connect).
    """
    try:
        sc = spark.sparkContext
    except Exception:
        return
    if getattr(sc, "_swallow_spark_shipped", False):
        return
    import pathlib
    import tempfile
    import zipfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    zpath = os.path.join(
        tempfile.gettempdir(), f"swallow_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for p in sorted(pkg_dir.rglob("*.py")):
                z.write(p, "swallow_spark/" + str(p.relative_to(pkg_dir)))
        os.replace(tmp, zpath)
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already added (same-name re-add) — workers have it
    sc._swallow_spark_shipped = True


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
