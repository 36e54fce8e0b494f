"""Table IO (SURVEY.md §2.A, §7.1 M0).

``load`` is the single entry point every query uses; it conforms the session
(UTC) before the scan so downstream timestamp extracts are deterministic.

Scale notes (SURVEY.md §7.4):
- Parquet scans are pruned/pushed by Catalyst — callers should `.select()`
  early and filter on raw columns so PushedFilters reach the reader.
- At 100 TB the per-table path becomes a directory of many files (possibly
  partitioned); `spark.read.parquet` handles that unchanged. Explicit schemas
  (schemas.py) make reads schema-stable across file drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import conform_session

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (schema from parquet footer).

    events.ts has shipped with different physical encodings across driver
    testdata generations: TIMESTAMP(NANOS) (rejected by Spark's vectorized
    reader — read as long nanos via legacy conf, then DIV 1000 to micros,
    matching DuckDB's ns→µs truncation) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read as TIMESTAMP_NTZ — cast to session-TZ
    timestamp; the session is conformed to UTC so wall-clock values are
    preserved and match the DuckDB oracle's naive TIMESTAMP). We branch on
    the dtype Spark actually infers so either generation loads identically.
    """
    conform_session(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if not isinstance(ts_type, T.TimestampType):
            # TIMESTAMP_NTZ (or anything else castable): same wall clock in
            # the UTC-conformed session.
            return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Partitioned parquet sink (swallow writer analog).

    Scale note: `partitionBy` on a low-cardinality column gives partition
    pruning on read-back; for high-cardinality keys prefer bucketing.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
