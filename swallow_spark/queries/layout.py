"""Data-layout engineering: Z-order curve values (multi-dimensional
clustering for data skipping) and small-file compaction — the physical-layout
side of a 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


def _interleave_sql(a: str, b: str, bits: int = 16) -> str:
    """SQL expression interleaving the low `bits` of a (even positions) and
    b (odd positions) into one Z-value — identical integer ops both engines."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "fn_zorder",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST({_interleave_sql('l_partkey', 'l_suppkey')} AS BIGINT) AS zval
FROM lineitem
""",
    tier="T2",
)
def fn_zorder(spark, sf_dir):
    """Z-order (Morton) curve value over (partkey, suppkey): bit-interleave
    the two keys so sorting by zval co-locates rows that are close in BOTH
    dimensions.

    Scale note: writing a 100 TB fact sorted by zval gives parquet min/max
    row-group skipping on either key — the poor-man's Z-ORDER OPTIMIZE,
    entirely with engine-portable integer bit math.
    """
    li = load(spark, sf_dir, "lineitem")
    # same expression as the oracle, via expr (bitwise ops on longs)
    zexpr = F.expr(_interleave_sql("l_partkey", "l_suppkey")).cast("long")
    return li.select("l_orderkey", "l_linenumber", zexpr.alias("zval"))


@register("etl_compact_files", oracle=None, tier="T3")
def etl_compact_files(spark, sf_dir):
    """Small-file compaction: fragment documents into many tiny files, then
    rewrite to a target file count (the nightly compaction job every big
    table needs). Returns (phase, n_files, n_rows) proving row preservation.

    Scale note: real compaction sizes partitions by bytes
    (spark.sql.files.maxPartitionBytes on read + repartition(target) on
    write); the coalesce path avoids a shuffle when only merging.
    """
    import glob

    base = f"/tmp/swallow_spark_io/{sf_dir.rstrip('/').rsplit('/', 1)[-1]}"
    frag, compact = f"{base}/frag_docs", f"{base}/compact_docs"
    d = load(spark, sf_dir, "documents")
    d.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(2).write.mode("overwrite").parquet(compact)

    def stats(path, phase):
        n_files = len(glob.glob(f"{path}/part-*.parquet"))
        n_rows = spark.read.parquet(path).count()
        return spark.createDataFrame(
            [(phase, n_files, n_rows)], "phase string, n_files int, n_rows long"
        )

    return stats(frag, "fragmented").unionByName(stats(compact, "compacted"))
