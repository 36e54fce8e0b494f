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
    """Load one fixture table, normalized to the declared schema's temporal
    types.

    The driver regenerates /root/testdata between rounds and the physical
    parquet encoding drifts (observed: events.ts was TIMESTAMP(NANOS) in r1
    — rejected by Spark's vectorized reader — and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) → TIMESTAMP_NTZ in r2). So for every column the
    declared schema (schemas.ALL) says is a timestamp, normalize whatever
    arrived:

    - long (nanosAsLong legacy read of TIMESTAMP(NANOS)): epoch-nanos DIV
      1000 → timestamp_micros — exactly DuckDB's ns→µs truncation, no
      double round-trip (2024 epoch-nanos ≈ 1.7e18 > 2^53);
    - TIMESTAMP_NTZ / DATE / string: cast — same wall clock in the
      UTC-conformed session, matching the DuckDB oracle's naive TIMESTAMP.
    """
    conform_session(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from . import schemas

    declared = schemas.ALL.get(name)
    if declared is None:
        return df
    for fld in declared.fields:
        if fld.name not in df.columns:
            continue
        want, got = fld.dataType, df.schema[fld.name].dataType
        if isinstance(want, T.TimestampType) and not isinstance(got, T.TimestampType):
            if isinstance(got, T.LongType):
                df = df.withColumn(
                    fld.name, F.timestamp_micros(F.expr(f"{fld.name} DIV 1000"))
                )
            else:
                df = df.withColumn(fld.name, F.col(fld.name).cast(T.TimestampType()))
        elif isinstance(want, T.DoubleType) and isinstance(got, T.DecimalType):
            df = df.withColumn(fld.name, F.col(fld.name).cast(T.DoubleType()))
    return df


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Partitioned parquet sink (swallow writer analog).

    Scale note: `partitionBy` on a low-cardinality column gives partition
    pruning on read-back; for high-cardinality keys prefer bucketing.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
