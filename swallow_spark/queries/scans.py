"""§2.A — scans / sources. Sinks & round-trips live in sources_sinks.py.

Scale notes: counts are metadata-cheap on parquet; projected scans rely on
Catalyst column pruning (ReadSchema shows only the two columns) so a 100 TB
lineitem scan reads two columns' pages, not sixteen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import TABLES
from ..io import load
from ..registry import register

_SCAN_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {t}" for t in TABLES
)


@register("scan_parquet", oracle=_SCAN_ORACLE, tier="T1")
def scan_parquet(spark, sf_dir):
    """Full-scan row count of every fixture table (one row per table)."""
    out = None
    for t in TABLES:
        d = (
            load(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
        out = d if out is None else out.unionByName(d)
    return out


@register(
    "scan_projected",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
    tier="T1",
)
def scan_projected(spark, sf_dir):
    """Column-pruned scan: 2 of lineitem's 11 columns (pass-through values)."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
