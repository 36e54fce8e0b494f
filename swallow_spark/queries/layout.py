"""Data-layout engineering: Z-order curve values (multi-dimensional
clustering for data skipping) and small-file compaction — the physical-layout
side of a 100 TB table.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..io import load
from ..ops.materialize import materialize
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


@register(
    "etl_compact_files",
    oracle="""
SELECT 'fragmented' AS phase, 64 AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents
UNION ALL
SELECT 'compacted', 2, CAST(COUNT(*) AS BIGINT) FROM documents
""",
    tier="T3",
)
def etl_compact_files(spark, sf_dir):
    """Small-file compaction: fragment documents into many tiny files, then
    rewrite to a target file count (the nightly compaction job every big
    table needs). Returns (phase, n_files, n_rows) proving row preservation.

    ORACLE (promoted from rows-only in round 7): the output is a
    deterministic function of the fixture — round-robin repartition(64)
    yields exactly 64 non-empty partitions whenever |documents| ≥ 64
    (smallest SF: 500 docs), coalesce(2) exactly 2 files, and both phases
    must preserve COUNT(*). The hash gate now pins row preservation and
    the file-count contract, not just "returns rows".

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


@register(
    "join_bucketed_colocate",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS sum_qty
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""",
    tier="T2",
)
def join_bucketed_colocate(spark, sf_dir):
    """Shuffle-free co-located join via bucketing: both fact tables are
    written bucketBy(8, orderkey).sortBy(orderkey), so the SortMergeJoin
    consumes the bucketed scans DIRECTLY — zero Exchange on either join
    input (asserted in tests/test_plans.py; `Bucketed: true`,
    SelectedBucketsCount in the scan).

    Scale note: this is THE pattern for a repeatedly-joined 100 TB
    fact-fact pair — pay the bucketed write once, join with no shuffle
    forever after. Result is bucketing-invariant, so the plain-join oracle
    checks it exactly."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/swallow_spark_io/{tag}/bucketed"
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", f"{base}/orders_b").mode("overwrite")
     .saveAsTable(f"swallow_orders_b_{tag}"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", f"{base}/lineitem_b").mode("overwrite")
     .saveAsTable(f"swallow_lineitem_b_{tag}"))
    ob = spark.table(f"swallow_orders_b_{tag}")
    lb = spark.table(f"swallow_lineitem_b_{tag}")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            (F.sum(F.floor(F.col("l_quantity") * F.lit(100) + F.lit(0.5)))
             .cast("double") / F.lit(100)).alias("sum_qty"),
        )
    )


@register(
    "etl_range_partition_write",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
       CAST(0 AS BIGINT) AS n_overlapping_file_pairs
FROM lineitem
""",
    tier="T3",
)
def etl_range_partition_write(spark, sf_dir):
    """Range-partitioned sorted write: repartitionByRange(8, l_orderkey) +
    sortWithinPartitions before the parquet write gives every output file a
    DISJOINT [min, max] orderkey range — so any key-range predicate prunes
    to one file via parquet footer min/max at read time. The standard
    layout for a 100 TB fact keyed by time or id.

    Returns (total_rows, n_overlapping_file_pairs) read back via
    input_file_name. ORACLE (promoted from rows-only in round 7): though
    repartitionByRange samples its boundaries (file CONTENTS vary
    run-to-run), the DECLARED output is deterministic — total rows must
    equal COUNT(*) (row preservation) and the overlap count must be
    exactly 0, because range partitions are half-open [b_i, b_{i+1})
    intervals and equal keys never split across partitions. The hash gate
    now pins the disjointness contract itself."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/swallow_spark_io/{tag}/lineitem_ranged"
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).withColumn("f", F.input_file_name())
    stats = back.groupBy("f").agg(
        F.min("l_orderkey").alias("mn"),
        F.max("l_orderkey").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    a, b = stats.alias("a"), stats.alias("b")
    overlaps = a.join(
        b,
        (F.col("a.f") < F.col("b.f"))
        & (F.col("a.mn") <= F.col("b.mx"))
        & (F.col("a.mx") >= F.col("b.mn")),
    ).count()
    total = back.count()
    return spark.createDataFrame(
        [(int(total), int(overlaps))],
        "total_rows bigint, n_overlapping_file_pairs bigint",
    )


# how many reducer buckets to simulate for the skew probe
_SKEW_BUCKETS = 32

_SKEW_SQL = f"""
WITH keys AS (
  SELECT 'o_custkey' AS key_name, o_custkey % {_SKEW_BUCKETS} AS bucket FROM orders
  UNION ALL
  SELECT 'o_orderkey', o_orderkey % {_SKEW_BUCKETS} FROM orders
),
bc AS (
  SELECT key_name, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM keys GROUP BY key_name, bucket
)
SELECT key_name,
       CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
       CAST(MAX(n) AS BIGINT) AS max_bucket_rows,
       CAST(MIN(n) AS BIGINT) AS min_bucket_rows,
       (FLOOR(CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / {_SKEW_BUCKETS})
              * 10000 + 0.5) / 10000) AS skew_factor
FROM bc
GROUP BY key_name
""".strip()


@register("etl_partition_skew", oracle=_SKEW_SQL, tier="T2")
def etl_partition_skew(spark, sf_dir):
    """Pre-flight shuffle-skew probe: simulate hash partitioning of
    candidate join/partition keys into 32 reducer buckets and report the
    max/min bucket loads and the skew factor (max bucket ÷ ideal even
    share) — the measurement you run BEFORE a 100 TB join to decide
    whether a key needs salting or AQE skew handling. Modulo stands in
    for the hash so both engines (and the reader) see the same buckets;
    real skew comes from key-value distribution, which modulo preserves.

    Determinism: pure integer counts; the one ratio divides twice in the
    same order both sides, half-up 4dp.

    Scale note: this probe is itself skew-proof — the per-(key, bucket)
    count is a map-side-combinable aggregate whose shuffle carries at
    most 2·32 rows, regardless of how skewed the DATA is.
    """
    o = load(spark, sf_dir, "orders")
    keys = o.select(
        F.lit("o_custkey").alias("key_name"),
        (F.col("o_custkey") % _SKEW_BUCKETS).alias("bucket"),
    ).unionByName(
        o.select(
            F.lit("o_orderkey").alias("key_name"),
            (F.col("o_orderkey") % _SKEW_BUCKETS).alias("bucket"),
        )
    )
    bc = keys.groupBy("key_name", "bucket").agg(F.count(F.lit(1)).alias("n"))
    return bc.groupBy("key_name").agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        F.max("n").alias("max_bucket_rows"),
        F.min("n").alias("min_bucket_rows"),
        (
            F.floor(
                F.max("n").cast("double")
                / (F.sum("n").cast("double") / _SKEW_BUCKETS)
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("skew_factor"),
    )


# ------------------------------------ layout skipping report (round 9)
# etl_range_partition_write pins that a range layout's files are DISJOINT;
# this key measures what that buys: the fraction of files a one-month
# predicate can SKIP under a time-organized layout vs a hash-organized one
# — the number that justifies re-clustering a 100 TB fact table. Both
# layouts are physically written and read back (the stats survive the
# parquet round trip); the DuckDB oracle derives the identical per-file
# stats from the logical grouping, which is exact because each layout maps
# rows to files by a deterministic key (one month dir = one file via
# repartition on the partition column; one hash bucket = one file).
_LAYOUT_TARGET_YM = 199506


@register(
    "etl_layout_skipping_report",
    oracle=f"""
WITH keyed AS (
  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
         l_orderkey % 8 AS b
  FROM lineitem
),
files AS (
  SELECT 'range' AS layout, ym AS fkey,
         CAST(MIN(ym) AS BIGINT) AS mn, CAST(MAX(ym) AS BIGINT) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM keyed GROUP BY ym
  UNION ALL
  SELECT 'hash', b,
         CAST(MIN(ym) AS BIGINT), CAST(MAX(ym) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM keyed GROUP BY b
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN mn <= {_LAYOUT_TARGET_YM}
                      AND mx >= {_LAYOUT_TARGET_YM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       CAST((COUNT(*) - SUM(CASE WHEN mn <= {_LAYOUT_TARGET_YM}
                                  AND mx >= {_LAYOUT_TARGET_YM}
                                 THEN 1 ELSE 0 END)) * 1000000
            // COUNT(*) AS BIGINT) AS skip_micro,
       CAST(SUM(n) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN mn <= {_LAYOUT_TARGET_YM}
                      AND mx >= {_LAYOUT_TARGET_YM}
                     THEN n ELSE 0 END) AS BIGINT) AS rows_in_hit_files
FROM files GROUP BY layout ORDER BY layout
""",
    tier="T2",
)
def etl_layout_skipping_report(spark, sf_dir):
    """File-skipping effectiveness of a time-organized layout vs a
    hash-organized one, measured on physically written files: lineitem is
    written twice (partitioned by ship month; partitioned by
    l_orderkey % 8), read back through parquet, and a one-month predicate
    (1995-06) is tested against each file's [min, max] ship-month
    footer-style stats. Range layout: one file hit, ~99% skipped; hash
    layout: every file hit, 0% skipped — the table that justifies
    re-clustering a 100 TB fact by its query key.

    Determinism: the file key IS the partition value (repartition on the
    partition column before partitionBy gives one file per directory), so
    per-file stats equal the logical per-key grouping the oracle
    computes — exact integer month keys and counts throughout; no file
    paths or task ids leak into the output.

    Scale note: both writes are one-shuffle repartitions; the read-back
    aggregates per partition value with partition pruning available; the
    report itself is |files| rows. At 100 TB the same report runs from
    the metastore/manifest min-max stats without touching data files.
    """
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/swallow_spark_io/{tag}/layout_skip"
    li = load(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym"),
        (F.col("l_orderkey") % 8).alias("b"),
    )
    li.repartition("ym").write.mode("overwrite").partitionBy("ym").parquet(
        f"{base}/range"
    )
    li.repartition("b").write.mode("overwrite").partitionBy("b").parquet(
        f"{base}/hash"
    )
    rng = (
        spark.read.parquet(f"{base}/range")
        .groupBy("ym")
        .agg(
            F.min("ym").cast("long").alias("mn"),
            F.max("ym").cast("long").alias("mx"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(F.lit("range").alias("layout"), "mn", "mx", "n")
    )
    hsh = (
        spark.read.parquet(f"{base}/hash")
        .groupBy("b")
        .agg(
            F.min("ym").cast("long").alias("mn"),
            F.max("ym").cast("long").alias("mx"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(F.lit("hash").alias("layout"), "mn", "mx", "n")
    )
    hit = (F.col("mn") <= _LAYOUT_TARGET_YM) & (
        F.col("mx") >= _LAYOUT_TARGET_YM
    )
    return (
        rng.unionAll(hsh)
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("files_hit"),
            F.expr(
                f"""CAST((COUNT(*) - SUM(CASE WHEN mn <= {_LAYOUT_TARGET_YM}
                                          AND mx >= {_LAYOUT_TARGET_YM}
                                         THEN 1 ELSE 0 END)) * 1000000
                    DIV COUNT(*) AS BIGINT)"""
            ).alias("skip_micro"),
            F.sum("n").cast("long").alias("rows_total"),
            F.sum(F.when(hit, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_in_hit_files"),
        )
        .orderBy("layout")
    )


# --- Z-order layout skipping (round 10) ---------------------------------------
# etl_layout_skipping_report proved single-key range clustering: great on its
# key, useless on any other. This key measures the MULTI-dimensional answer —
# Z-ORDER clustering (Delta/Iceberg OPTIMIZE ZORDER) — on physically written
# files: the Morton interleave of two 4-bit bucket keys splits into 16 files
# that are 4x4 tiles in (month, part) space, so a point predicate on EITHER
# dimension hits only the ~sqrt fraction of files whose tile row/column
# contains it, where the linear month layout hits 1/16 on month and EVERY
# file on part.
_Z_TILES = 16  # buckets per dimension AND files per layout (4x4 tiles)
_Z_TARGET_MB = 7  # point predicate: month bucket 7 (one sixteenth of range)
_Z_TARGET_PB = 5  # point predicate: part bucket 5


def _zorder_oracle() -> str:
    z = _interleave_sql("mb", "pb", 4)
    return f"""
WITH m AS (
  SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS mo,
         l_partkey % {_Z_TILES} AS pb
  FROM lineitem
),
b AS (SELECT MIN(mo) AS lo, MAX(mo) - MIN(mo) + 1 AS span FROM m),
d AS (
  SELECT CAST(((m.mo - b.lo) * {_Z_TILES}) // b.span AS BIGINT) AS mb, pb
  FROM m CROSS JOIN b
),
files AS (
  SELECT 'zorder' AS layout, ({z}) // {_Z_TILES} AS fid,
         MIN(mb) AS mn_mb, MAX(mb) AS mx_mb,
         MIN(pb) AS mn_pb, MAX(pb) AS mx_pb, COUNT(*) AS n
  FROM d GROUP BY fid
  UNION ALL
  SELECT 'linear', mb, MIN(mb), MAX(mb), MIN(pb), MAX(pb), COUNT(*)
  FROM d GROUP BY mb
),
dims AS (
  SELECT layout,
         'month' AS dim,
         (mn_mb <= {_Z_TARGET_MB} AND mx_mb >= {_Z_TARGET_MB}) AS hit, n
  FROM files
  UNION ALL
  SELECT layout, 'part',
         (mn_pb <= {_Z_TARGET_PB} AND mx_pb >= {_Z_TARGET_PB}), n
  FROM files
)
SELECT layout, dim,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       CAST((COUNT(*) - SUM(CASE WHEN hit THEN 1 ELSE 0 END)) * 1000000
            // COUNT(*) AS BIGINT) AS skip_micro,
       CAST(SUM(n) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN hit THEN n ELSE 0 END) AS BIGINT)
         AS rows_in_hit_files
FROM dims GROUP BY layout, dim
ORDER BY layout, dim
"""


@register("etl_zorder_layout", oracle=_zorder_oracle(), tier="T2")
def etl_zorder_layout(spark, sf_dir):
    """Z-order vs linear clustering, measured on PHYSICALLY written files:
    lineitem is bucketed to 4-bit (month, part) keys, written twice — 16
    files clustered by month alone, 16 files clustered by the Morton
    interleave (fid = z DIV 16: each file a 4x4 tile in key space) — read
    back, and point predicates on EACH dimension are tested against every
    file's min/max footer-style stats. Expected shape: linear skips 15/16
    on month and 0/16 on part; z-order skips ~12/16 on BOTH — the table
    that justifies OPTIMIZE ZORDER for a fact queried on two keys.

    Determinism: the file key IS the partition value (repartition on it
    before partitionBy → one file per directory), so per-file stats equal
    the logical per-key grouping the oracle computes; bucket arithmetic,
    the interleave (fn_zorder's _interleave_sql, 4 bits), and all outputs
    are exact integers. Month buckets derive from broadcast (min, span)
    scalars — engine-identical integer DIV.

    Scale note: each layout is one shuffle on its file key; the read-back
    aggregates per partition value with pruning available; the report is
    |files| rows. At 100 TB the identical report runs from manifest
    min-max stats without touching data files, and the 4-bit demo keys
    become real row-group zone maps.
    """
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/swallow_spark_io/{tag}/zorder_layout"
    m = load(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mo"),
        (F.col("l_partkey") % _Z_TILES).alias("pb"),
    )
    b = m.agg(
        F.min("mo").alias("lo"), (F.max("mo") - F.min("mo") + 1).alias("span")
    )
    # Round-11 optimization (guide §1.2): both layout writes consume the
    # same bucketed frame; materializing it once halves the scan +
    # bounds-crossjoin + bucket passes (the lineage previously re-ran per
    # write). Identical rows reach both writers — the oracle is unchanged.
    d = materialize(
        m.crossJoin(F.broadcast(b)).select(
            F.expr(
                f"CAST(((mo - lo) * {_Z_TILES}) DIV span AS BIGINT)"
            ).alias("mb"),
            "pb",
        )
    )
    zfid = F.expr(
        f"CAST(({_interleave_sql('mb', 'pb', 4)}) DIV {_Z_TILES} AS BIGINT)"
    )
    # Round-11 (guide §2.6 "overlap independent jobs"): the two layout
    # writes are independent actions over the SAME materialized frame and
    # different output paths — submitting them from two driver threads lets
    # the second job's tasks back-fill executors freed by the first job's
    # tail instead of serializing two 16-small-file writes (interleaved A/B
    # at sf0.1: 2.98/3.26 vs 3.89/3.57 s medians — a steady ~10-25% win).
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _write(df, path):
        df.repartition("fid").write.mode("overwrite").partitionBy(
            "fid"
        ).parquet(path)

    with _TPE(max_workers=2) as pool:
        futs = [
            pool.submit(_write, d.withColumn("fid", zfid), f"{base}/zorder"),
            pool.submit(
                _write, d.withColumn("fid", F.col("mb")), f"{base}/linear"
            ),
        ]
        for f in futs:
            f.result()

    def _stats(path: str, layout: str):
        return (
            spark.read.parquet(path)
            .groupBy("fid")
            .agg(
                F.min("mb").cast("long").alias("mn_mb"),
                F.max("mb").cast("long").alias("mx_mb"),
                F.min("pb").cast("long").alias("mn_pb"),
                F.max("pb").cast("long").alias("mx_pb"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .select(F.lit(layout).alias("layout"), "mn_mb", "mx_mb", "mn_pb", "mx_pb", "n")
        )

    files = _stats(f"{base}/zorder", "zorder").unionAll(
        _stats(f"{base}/linear", "linear")
    )
    dims = files.select(
        "layout",
        "n",
        F.explode(
            F.array(
                F.struct(
                    F.lit("month").alias("dim"),
                    (
                        (F.col("mn_mb") <= _Z_TARGET_MB)
                        & (F.col("mx_mb") >= _Z_TARGET_MB)
                    ).alias("hit"),
                ),
                F.struct(
                    F.lit("part").alias("dim"),
                    (
                        (F.col("mn_pb") <= _Z_TARGET_PB)
                        & (F.col("mx_pb") >= _Z_TARGET_PB)
                    ).alias("hit"),
                ),
            )
        ).alias("dh"),
    ).select("layout", F.col("dh.dim").alias("dim"), "n", F.col("dh.hit").alias("hit"))
    return (
        dims.groupBy("layout", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("files_hit"),
            F.expr(
                """CAST((COUNT(*) - SUM(CASE WHEN hit THEN 1 ELSE 0 END))
                   * 1000000 DIV COUNT(*) AS BIGINT)"""
            ).alias("skip_micro"),
            F.sum("n").cast("long").alias("rows_total"),
            F.sum(F.when(F.col("hit"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_in_hit_files"),
        )
        .orderBy("layout", "dim")
    )
